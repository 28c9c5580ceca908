"""Z-order / Hilbert clustering — the one deliberate all-to-all shuffle.

The reference's ``OPTIMIZE ... ZORDER BY (series_id, date)``
(``/root/reference/ofl/transform/spark/silver.py:368-374``) re-expressed as
a Ray Data pipeline (SURVEY.md §7.1 step 3):

    read_parquet(manifest paths)
      → map_batches(add 63-bit interleave key)      # zero-copy Arrow, vectorized
      → Dataset.sort(_zkey)                         # Ray's distributed sort
      → map_batches(stats writer)                   # one file per sorted block
      → commit (replace-all)

The key interleaves ``(hash64(conv_id) top bits, turn_idx, ts)`` — ts is
normalized over the manifest-global [min, max] so the key is a
deterministic function of the table, not of this run. Per-file
``z_range`` lands in the manifest and drives scan pruning.

Granularity note: :func:`zorder`'s global ``Dataset.sort`` has no
per-partition resume (the in-memory shuffle is all-or-nothing), so its
job checkpoint is the commit itself — fastest when the table fits the
cluster's object store and failures are rare. :func:`zorder_ranged` is
the 100-TB path: the same clustering expressed as a DURABLE two-phase
range shuffle (map files → range row-groups → per-range sorted outputs)
where every map file and every range is individually checkpointed and a
killed job resumes without redoing completed work.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import ray.data as rd

from open_finance_lakehouse_ray.functions.hashing import hash64_strings
from open_finance_lakehouse_ray.functions.zorder import (
    BITS,
    DIM_MAX,
    hilbert3,
    morton3,
    normalize_to_bits,
)
from open_finance_lakehouse_ray.stages.writer import make_stats_writer, meta_rows_to_entries
from open_finance_lakehouse_ray.state.commit_actor import commit_via_actor_or_direct
from open_finance_lakehouse_ray.state.txlog import (
    CommitConflict,
    FileEntry,
    Snapshot,
    TableLog,
)

ZKEY = "_zkey"


def ts_range_from_entries(entries) -> tuple[int, int]:
    los = [e.stats["ts"][0] for e in entries if "ts" in e.stats]
    his = [e.stats["ts"][1] for e in entries if "ts" in e.stats]
    if not los:
        return (0, 1)
    return (min(los), max(his))


def make_zkey_stage(
    ts_lo: int,
    ts_hi: int,
    curve: str = "morton",
    conv_boundaries: np.ndarray | None = None,
):
    """Vectorized map_batches stage: append the 63-bit interleave key.

    d0 = the conv_id dimension. With ``conv_boundaries`` (sampled
    equal-frequency quantiles of conv_id) it is ORDER-PRESERVING:
    ``searchsorted(boundaries, conv) << 9 | hash(conv) & 511`` — monotone
    bucket in the high bits (so post-zorder files carry TIGHT raw conv_id
    min/max stats and MERGE/scan pruning on conv_id works), hash spread in
    the low bits (intra-bucket balance). Equal-frequency buckets absorb
    Zipf skew the way a plain hash would. Without boundaries it falls back
    to the pure hash (adversarial key distributions).
    d1 = turn_idx clamped to 21 bits; d2 = ts scaled into 21 bits over the
    table-global range — all deterministic functions of the table, not of
    this run.
    """
    interleave = morton3 if curve == "morton" else hilbert3

    def _add(batch: pa.Table) -> pa.Table:
        h_full = hash64_strings(batch["conv_id"])
        if conv_boundaries is not None and len(conv_boundaries) > 0:
            conv_np = np.asarray(
                batch["conv_id"].to_pylist() if batch["conv_id"].null_count else
                batch["conv_id"].to_numpy(zero_copy_only=False),
                dtype="U64",
            )
            bucket = np.searchsorted(conv_boundaries, conv_np, side="right").astype(
                np.uint64
            )
            h = ((bucket << np.uint64(9)) | (h_full & np.uint64(511))) & np.uint64(
                DIM_MAX
            )
        else:
            h = h_full >> np.uint64(64 - BITS)
        turn = (
            batch["turn_idx"].to_numpy(zero_copy_only=False).astype(np.int64)
        )
        turn = np.clip(turn, 0, DIM_MAX).astype(np.uint64)
        ts = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        tsq = normalize_to_bits(ts, float(ts_lo), float(ts_hi))
        z = interleave(h, turn, tsq).astype(np.int64)  # int64 for Arrow sort
        return batch.append_column(ZKEY, pa.array(z, type=pa.int64()))

    return _add


def sample_conv_boundaries(
    ds: rd.Dataset,
    *,
    n_buckets: int = 4096,
    n_sample: int = 16384,
    seed: int = 5,
    total_rows: int | None = None,
) -> np.ndarray:
    """Equal-frequency conv_id bucket boundaries from a cheap sample —
    the same sample-then-range-partition idea as a distributed sort's
    boundary pass, reused so the cluster key is monotone in conv_id."""
    total = total_rows if total_rows is not None else ds.count()
    frac = min(1.0, (4.0 * n_sample) / max(1, total))
    # take_all, not take(n): take(n) returns the LEADING rows of the
    # sample stream, biasing boundaries toward the first files (fatal on a
    # previously clustered table where file order correlates with key
    # order); the Bernoulli sample is already sized to ~4x n_sample and
    # the equal-frequency cut below subsamples it uniformly
    frac_rows = [
        r["conv_id"]
        for r in ds.select_columns(["conv_id"])
        .random_sample(frac, seed=seed)
        .take_all()
    ]
    if not frac_rows:
        return np.array([], dtype="U64")
    s = np.sort(np.asarray(frac_rows, dtype="U64"))
    idx = np.linspace(0, len(s) - 1, min(n_buckets, len(s)) + 1)[1:-1].astype(int)
    return np.unique(s[idx])


def zorder(
    root: str,
    *,
    job_id: str,
    curve: str = "morton",
    target_rows_per_file: int | None = None,
    _retries: int = 3,
) -> Snapshot | None:
    """Rewrite the whole table clustered by the space-filling curve.
    On a commit conflict (a concurrent compact/merge rewrote an input
    file) the job replans from the new head — the same replan contract
    as ``compact()`` / ``merge_into()``."""
    log = TableLog(root)
    existing = log.find_commit(job_id)
    if existing is not None:
        return existing
    base_version = log.current_version()
    if base_version is None:
        return None
    entries = log.files(base_version)
    if not entries:
        return None
    ts_lo, ts_hi = ts_range_from_entries(entries)

    paths = [f"{root}/{e.path}" for e in entries]
    ds = rd.read_parquet(paths)
    # boundary sample from a SUBSET of files (conv column only) — cheap
    # regardless of table size; per-file manifest conv ranges tell us
    # nothing pre-clustering, so a data sample it is
    stride = max(1, len(paths) // 16)
    sampled_rows = sum(e.rows for e in entries[::stride])
    boundaries = sample_conv_boundaries(
        rd.read_parquet(paths[::stride], columns=["conv_id"]),
        total_rows=sampled_rows,
    )
    ds = ds.map_batches(
        make_zkey_stage(ts_lo, ts_hi, curve, conv_boundaries=boundaries),
        batch_format="pyarrow",
    )
    # one sorted block = one output file, so the block count serves two
    # masters: (a) sort-exchange overhead wants FEW large blocks, (b) scan
    # and MERGE pruning want MANY — a contiguous z-slice covers a conv
    # extent ~ (1/n)^(1/3) (Morton is a cube fill), so fewer files means
    # wider per-file conv ranges and fatter rewrite sets. Floor at 64
    # (tight conv stats even for small tables), grow toward ~96 MB files
    # with TABLE BYTES — never cluster CPUs, so the physical plan is
    # identical at every parallelism level (the scaling-bench invariant).
    # Past ~8192 blocks the in-memory sort's O(blocks²) exchange dominates:
    # that scale belongs to zorder_ranged's durable range shuffle.
    total_bytes = sum(e.bytes for e in entries)
    nblocks = int(np.clip(total_bytes // (96 * 1024 * 1024), 64, 8192))
    ds = ds.repartition(nblocks)
    ds = ds.sort(ZKEY)
    if target_rows_per_file:
        total = sum(e.rows for e in entries)
        nfiles = max(1, total // target_rows_per_file)
        ds = ds.repartition(nfiles)  # order-preserving split/coalesce
    meta = ds.map_batches(
        # globally sorted upstream: the writer only stats+writes (presort off)
        make_stats_writer(root, zkey_col=ZKEY, prefix="zorder", presorted=True),
        batch_size=None,
        batch_format="pyarrow",
    )
    added = meta_rows_to_entries(meta.take_all())
    removed = {e.path for e in entries}
    try:
        snap = commit_via_actor_or_direct(
            log,
            operation="zorder",
            job_id=job_id,
            added=added,
            removed_paths=removed,
            read_paths=removed,
            base_version=base_version,
            summary={
                "cdc": {},  # logical no-change: empty CDC marker
                "curve": curve,
                "files_in": len(entries),
                "files_out": len(added),
                "ts_range": [ts_lo, ts_hi],
                "keys_unique": log.keys_unique(base_version),
            },
        )
    except CommitConflict:
        if _retries <= 0:
            raise
        # a concurrent commit rewrote an input: this rewrite is built on
        # stale data (its orphaned outputs fall to the sweep) — replan
        return zorder(
            root, job_id=job_id, curve=curve,
            target_rows_per_file=target_rows_per_file, _retries=_retries - 1,
        )
    log.clear_job(job_id)  # the snapshot is the durable lineage record
    return snap


def clustering_quality(entries) -> float:
    """Mean pairwise z-range overlap fraction across files — 0 is perfectly
    clustered (disjoint ranges), higher is worse. Used by tests/bench to
    show Z-ordering measurably tightened per-file ranges."""
    ranged = [e.z_range for e in entries if e.z_range]
    if len(ranged) < 2:
        return 0.0
    overlaps = 0
    pairs = 0
    for i in range(len(ranged)):
        for j in range(i + 1, len(ranged)):
            a, b = ranged[i], ranged[j]
            pairs += 1
            if a[0] <= b[1] and b[0] <= a[1]:
                overlaps += 1
    return overlaps / pairs


# ---------------------------------------------------------------------------
# range-partitioned, per-range-resumable Z-order (the 100-TB path)
# ---------------------------------------------------------------------------

DEFAULT_RANGE_BYTES = 128 * 1024 * 1024


def _shuffle_dir(root: str, job_id: str) -> str:
    return os.path.join(root, "_shuffle", job_id.replace("/", "_"))


def _sample_zkey_boundaries(
    root: str,
    entries,
    *,
    ts_lo: int,
    ts_hi: int,
    curve: str,
    conv_boundaries: np.ndarray,
    n_ranges: int,
    seed: int = 17,
    n_sample: int = 65536,
) -> list[int]:
    """Equal-frequency Z-key cut points from a strided file sample — the
    boundary pass of a distributed range-partitioned sort."""
    paths = [os.path.join(root, e.path) for e in entries]
    stride = max(1, len(paths) // 16)
    sub = paths[::stride]
    est_rows = max(1, sum(e.rows for e in entries[::stride]))
    frac = min(1.0, (4.0 * n_sample) / est_rows)
    ds = rd.read_parquet(sub, columns=["conv_id", "turn_idx", "ts"]).map_batches(
        make_zkey_stage(ts_lo, ts_hi, curve, conv_boundaries=conv_boundaries),
        batch_format="pyarrow",
    ).select_columns([ZKEY])
    vals = np.array(
        [r[ZKEY] for r in ds.random_sample(frac, seed=seed).take(n_sample)],
        dtype=np.int64,
    )
    if len(vals) == 0 or n_ranges <= 1:
        return []
    vals.sort()
    idx = np.linspace(0, len(vals) - 1, n_ranges + 1)[1:-1].astype(int)
    return sorted(set(int(v) for v in vals[idx]))


def _zr_map_one(
    root: str, job_id: str, file_idx: int, path: str, plan: dict
) -> dict:
    """Phase-1 map task for one input file: compute Z-keys, partition rows
    by the plan's key ranges, write ONE intermediate parquet with one ROW
    GROUP per non-empty range (the shuffle-file-with-index layout), record
    the range→row-group map. Idempotent per (inputs, plan_base)."""
    import pyarrow.parquet as pq

    log = TableLog(root)
    part_id = f"map-{file_idx:06d}"
    done = log.get_partition(job_id, part_id)
    if done is not None and (
        done.get("inputs") == [path]
        and done.get("plan_base") == plan["plan_base"]
        and os.path.exists(os.path.join(root, done["intermediate"]))
    ):
        return done
    from open_finance_lakehouse_ray.stages.arrowpool import capped_arrow_threads

    with capped_arrow_threads():
        table = pq.read_table(os.path.join(root, path))
    add = make_zkey_stage(
        plan["ts_range"][0], plan["ts_range"][1], plan["curve"],
        conv_boundaries=np.asarray(plan["conv_boundaries"], dtype="U64"),
    )
    table = add(table)
    zb = np.asarray(plan["zb"], dtype=np.int64)
    z = table[ZKEY].to_numpy(zero_copy_only=False)
    order = np.argsort(z, kind="stable")
    table = table.take(pa.array(order))
    rid = np.searchsorted(zb, z[order], side="right")
    sdir = _shuffle_dir(root, job_id)
    os.makedirs(sdir, exist_ok=True)
    rel = os.path.join(
        "_shuffle", job_id.replace("/", "_"), f"map-{file_idx:06d}.parquet"
    )
    tmp = os.path.join(sdir, f".tmp-{file_idx:06d}.parquet")
    row_groups: dict[str, int] = {}
    # ranges are contiguous after the zkey sort: slice per distinct rid
    bounds = np.searchsorted(rid, np.arange(len(zb) + 2))
    with capped_arrow_threads():
        writer = pq.ParquetWriter(tmp, table.schema, compression="zstd")
        rg = 0
        for r in range(len(zb) + 1):
            lo, hi = bounds[r], bounds[r + 1]
            if hi > lo:
                writer.write_table(
                    table.slice(lo, hi - lo), row_group_size=hi - lo
                )
                row_groups[str(r)] = rg
                rg += 1
        writer.close()
    os.replace(tmp, os.path.join(root, rel))
    done = {
        "inputs": [path],
        "intermediate": rel,
        "row_groups": row_groups,
        "rows": table.num_rows,
        "plan_base": plan["plan_base"],
    }
    log.record_partition(job_id, part_id, done)
    return done


def _zr_reduce_one(
    root: str, job_id: str, range_idx: int, sources: list, plan_base
) -> dict:
    """Phase-2 reduce task for one key range: read its row group from each
    map intermediate, sort, write the final clustered file + lineage
    record. Idempotent per (sources, plan_base) — a resumed job skips
    completed ranges entirely."""
    import pyarrow.parquet as pq

    from open_finance_lakehouse_ray.stages.writer import write_table_file

    log = TableLog(root)
    part_id = f"range-{range_idx:06d}"
    done = log.get_partition(job_id, part_id)
    if done is not None and (
        done.get("inputs") == [s[0] for s in sources]
        and done.get("plan_base") == plan_base
        and all(
            os.path.exists(os.path.join(root, o["path"]))
            for o in done.get("outputs", [])
        )
    ):
        # outputs-exist check: an orphan sweep may have removed a crashed
        # job's uncommitted range files after the grace window
        return done
    slow = os.environ.get("HARNESS_SLOW_RANGE_S")
    if slow:  # kill-resume harness hook: env vars reach Ray workers
        import time

        time.sleep(float(slow))
    from open_finance_lakehouse_ray.stages.arrowpool import capped_arrow_threads

    outputs = []
    rows = 0
    # one range = one 1-CPU task: cap Arrow's pools for the read/sort/
    # write (stages/arrowpool.py — the round-4 compact variance finding)
    with capped_arrow_threads():
        tables = [
            pq.ParquetFile(os.path.join(root, p)).read_row_group(rg)
            for p, rg in sources
        ]
        if tables:
            t = pa.concat_tables(tables).sort_by(
                [(ZKEY, "ascending"), ("conv_id", "ascending"), ("turn_idx", "ascending")]
            )
            entry = write_table_file(
                root, t, zkey_col=ZKEY, presorted=True, prefix="zorder"
            )
            outputs = [entry.to_json()]
            rows = entry.rows
    done = {
        "inputs": [s[0] for s in sources],
        "outputs": outputs,
        "rows": rows,
        "plan_base": plan_base,
    }
    log.record_partition(job_id, part_id, done)
    return done


def zorder_ranged(
    root: str,
    *,
    job_id: str,
    curve: str = "morton",
    target_bytes: int = DEFAULT_RANGE_BYTES,
    n_ranges: int | None = None,
    _retries: int = 3,
) -> Snapshot | None:
    """Range-partitioned Z-order rewrite with PER-RANGE resume — the scale
    path that replaces :func:`zorder`'s all-or-nothing global sort.

    The shuffle is made durable: sampled Z-key boundaries split the key
    space into ~``total_bytes/target_bytes`` ranges (persisted in a plan
    record so a resumed job partitions identically); each input file is
    mapped ONCE into an intermediate parquet holding one row group per
    range (M map files total, never M×R — the shuffle-file-with-index
    layout); each range is reduced ONCE into its final clustered file. A
    killed job re-runs only the map files / ranges with no lineage record;
    a record from a different plan base is recomputed, never resumed. At
    100 TB this bounds both the blast radius of a failure (one range) and
    driver metadata (O(files + ranges))."""
    import shutil

    log = TableLog(root)
    existing = log.find_commit(job_id)
    if existing is not None:
        log.clear_job(job_id)
        shutil.rmtree(_shuffle_dir(root, job_id), ignore_errors=True)
        return existing
    base_version = log.current_version()
    if base_version is None:
        return None
    entries = log.files(base_version)
    if not entries:
        return None

    plan = log.get_partition(job_id, "_plan")
    if plan is None or plan.get("plan_base") != base_version:
        ts_lo, ts_hi = ts_range_from_entries(entries)
        paths = [f"{root}/{e.path}" for e in entries]
        stride = max(1, len(paths) // 16)
        conv_b = sample_conv_boundaries(
            rd.read_parquet(paths[::stride], columns=["conv_id"]),
            total_rows=sum(e.rows for e in entries[::stride]),
        )
        total_bytes = sum(e.bytes for e in entries)
        nr = n_ranges or int(np.clip(total_bytes // target_bytes + 1, 1, 4096))
        zb = _sample_zkey_boundaries(
            root, entries, ts_lo=ts_lo, ts_hi=ts_hi, curve=curve,
            conv_boundaries=conv_b, n_ranges=nr,
        )
        plan = {
            "plan_base": base_version,
            "files": [e.path for e in entries],
            "ts_range": [ts_lo, ts_hi],
            "conv_boundaries": [str(c) for c in conv_b],
            "zb": zb,
            "curve": curve,
        }
        log.record_partition(job_id, "_plan", plan)

    # ---- phase 1: map every input file into range row-groups ----
    map_rows = [
        {"file_idx": i, "path": p} for i, p in enumerate(plan["files"])
    ]

    def run_map(batch: pa.Table) -> pa.Table:
        out = []
        for row in batch.to_pylist():
            rec = _zr_map_one(root, job_id, row["file_idx"], row["path"], plan)
            out.append({"file_idx": row["file_idx"], "rows": rec["rows"]})
        return pa.Table.from_pylist(out)

    rd.from_items(map_rows, override_num_blocks=len(map_rows)).map_batches(
        run_map, batch_size=1, batch_format="pyarrow"
    ).take_all()

    # ---- phase 2: reduce every range from the recorded intermediates ----
    parts = log.committed_partitions(job_id)
    maps = sorted(
        (r for pid, r in parts.items()
         if pid.startswith("map-") and r.get("plan_base") == base_version),
        key=lambda r: r["intermediate"],
    )
    n_ranges_total = len(plan["zb"]) + 1
    reduce_rows = []
    for j in range(n_ranges_total):
        sources = [
            [m["intermediate"], m["row_groups"][str(j)]]
            for m in maps
            if str(j) in m["row_groups"]
        ]
        reduce_rows.append({"range_idx": j, "sources_json": json.dumps(sources)})

    def run_reduce(batch: pa.Table) -> pa.Table:
        out = []
        for row in batch.to_pylist():
            rec = _zr_reduce_one(
                root, job_id, row["range_idx"],
                [tuple(s) for s in json.loads(row["sources_json"])],
                base_version,
            )
            out.append({"range_idx": row["range_idx"], "rows": rec["rows"]})
        return pa.Table.from_pylist(out)

    rd.from_items(reduce_rows, override_num_blocks=len(reduce_rows)).map_batches(
        run_reduce, batch_size=1, batch_format="pyarrow"
    ).take_all()

    parts = log.committed_partitions(job_id)
    added = [
        FileEntry.from_json(o)
        for pid, r in sorted(parts.items())
        if pid.startswith("range-") and r.get("plan_base") == base_version
        for o in r["outputs"]
    ]
    removed = set(plan["files"])
    try:
        snap = commit_via_actor_or_direct(
            log,
            operation="zorder",
            job_id=job_id,
            added=added,
            removed_paths=removed,
            read_paths=removed,
            base_version=base_version,
            summary={
                "cdc": {},  # logical no-change: empty CDC marker
                "curve": curve,
                "strategy": "ranged",
                "files_in": len(removed),
                "files_out": len(added),
                "ranges": n_ranges_total,
                "ts_range": plan["ts_range"],
                "keys_unique": log.keys_unique(base_version),
            },
        )
    except CommitConflict:
        # a concurrent commit rewrote an input file: the whole plan is
        # stale (records are keyed to plan_base, so nothing can leak into
        # a future attempt) — clear and replan from the new head rather
        # than dying after both phases of work
        log.clear_job(job_id)
        shutil.rmtree(_shuffle_dir(root, job_id), ignore_errors=True)
        if _retries <= 0:
            raise
        return zorder_ranged(
            root, job_id=job_id, curve=curve, target_bytes=target_bytes,
            n_ranges=n_ranges, _retries=_retries - 1,
        )
    log.clear_job(job_id)
    shutil.rmtree(_shuffle_dir(root, job_id), ignore_errors=True)
    try:
        os.rmdir(os.path.join(root, "_shuffle"))  # drop the parent if empty
    except OSError:
        pass
    return snap
