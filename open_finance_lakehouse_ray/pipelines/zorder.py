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

Granularity note: a global sort has no per-partition resume (the shuffle
is all-or-nothing), so the job checkpoint is the commit itself —
re-running a killed job redoes the sort; re-running a COMMITTED job
no-ops on ``job_id``. This is the documented trade against compaction's
bin-level resume.
"""

from __future__ import annotations

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
from open_finance_lakehouse_ray.state.txlog import Snapshot, TableLog

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
    frac_rows = [
        r["conv_id"]
        for r in ds.select_columns(["conv_id"])
        .random_sample(frac, seed=seed)
        .take(n_sample)
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
) -> Snapshot | None:
    """Rewrite the whole table clustered by the space-filling curve."""
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
    # coarsen block count ahead of the sort: the all-to-all exchange costs
    # O(blocks^2) object transfers — fewer, larger partitions beat many
    # tiny ones; 64 keeps every CPU of a 4-node-equivalent busy
    ds = ds.repartition(64)
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
    snap = commit_via_actor_or_direct(
        log,
        operation="zorder",
        job_id=job_id,
        added=added,
        removed_paths=removed,
        read_paths=removed,
        base_version=base_version,
        summary={
            "curve": curve,
            "files_in": len(entries),
            "files_out": len(added),
            "ts_range": [ts_lo, ts_hi],
            "keys_unique": log.keys_unique(base_version),
        },
    )
    # per-output-file lineage records (audit + parity with compaction)
    for i, e in enumerate(added):
        log.record_partition(
            job_id, f"{i:06d}", {"inputs": sorted(removed), "outputs": [e.to_json()],
                                 "rows": e.rows, "z_range": e.z_range},
        )
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
