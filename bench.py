"""Headline benchmark: end-to-end maintenance throughput (turns/sec) for
compaction + Z-order + MERGE on the transcript table, plus per-stage and
representative query timings.

  python bench.py              # one JSON line; env GRAFT_SF_DIR, RAY_GRAFT_CPUS
  python bench.py --scaling    # run twice in fresh processes (8 vs 32 CPUs)
                               # and report throughput scaling efficiency

The transcript table is derived deterministically from the sf dir's
lineitem (the same construction the driver's correctness gate checks), so
bench input scales with sf and needs no external data.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
# input replication factor: the sf0.1 table alone is too small for 32-way
# parallelism to dominate fixed overheads; bench works on REPLICATE copies
# with distinct conv-id prefixes (~14.7M turns at sf0.1 with the default 32)
REPLICATE = int(os.environ.get("GRAFT_BENCH_REPLICATE", "32"))


def cpu_probe() -> dict:
    """Fixed-work host-speed calibration, reported alongside every bench
    sample so a single JSON line carries its own variance evidence: the
    same code and input have measured 16.4–49.3 s on this shared VM
    purely with host state (BASELINE.md "Late-round-5 bench samples"),
    and /proc/stat steal stays 0 while it happens — per-instruction
    slowdown is invisible to load metrics. ``matmul_sec`` exercises the
    BLAS pool (the whole-host view the bench itself sees) and
    ``scalar_sec`` a single core; compare across samples, lower = faster
    host."""
    import numpy as np

    a = np.random.default_rng(0).standard_normal((1024, 1024))
    a @ a  # warm the BLAS pool + caches: first-touch cost is not host speed
    t0 = time.perf_counter()
    for _ in range(3):
        a @ a
    matmul = time.perf_counter() - t0
    x = np.random.default_rng(1).standard_normal(2_000_000)
    np.sqrt(np.abs(x) + 1.0)  # warm allocator + pages
    t0 = time.perf_counter()
    for _ in range(5):
        x = np.sqrt(np.abs(x) + 1.0)
    scalar = time.perf_counter() - t0
    # disk write throughput: the second independent host axis. Measured
    # 2026-08-19: CPU probes FAST (matmul 0.51 / scalar 0.024) while the
    # bench ran 30 s — /tmp writes were throttled to ~128 MB/s (vs a
    # multi-GB/s cached read), and compact, the write-heaviest stage, sat
    # at 10x its quiet-disk trial band. A slow sample with a fast CPU
    # probe and a slow disk probe is the disk, not the code.
    import tempfile

    buf = b"\x5a" * (8 << 20)
    # probe the SAME tmp area the bench trials write to (tempfile honors
    # TMPDIR) — probing a different device would misattribute slowness
    with tempfile.NamedTemporaryFile(dir=tempfile.gettempdir(), delete=True) as f:
        t0 = time.perf_counter()
        for _ in range(16):  # 128 MiB
            f.write(buf)
        f.flush()
        os.fsync(f.fileno())
        disk = time.perf_counter() - t0
    return {
        "matmul_sec": round(matmul, 4),
        "scalar_sec": round(scalar, 4),
        "disk_write_mbps": round(128 / disk, 1),
    }


def run_bench() -> dict:
    import ray

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    import pyarrow.parquet as pq

    from open_finance_lakehouse_ray.pipelines.compact import compact
    from open_finance_lakehouse_ray.pipelines.ingest import ingest_dataset
    from open_finance_lakehouse_ray.pipelines.merge import dedup_exact, merge_into  # noqa: F401
    from open_finance_lakehouse_ray.pipelines.metrics import manifest_report
    from open_finance_lakehouse_ray.pipelines.queries import (
        _merge_updates,
        q_doc_near_dup_pairs,
        q_ev_ohlc_1m,
        q_li_pricing_summary,
        transcripts_from_lineitem,
    )
    from open_finance_lakehouse_ray.pipelines.zorder import zorder
    from open_finance_lakehouse_ray.state.txlog import TableLog

    # warm the OS page cache so we measure compute+shuffle, not first disk read
    pq.read_table(os.path.join(SF_DIR, "lineitem.parquet"))
    # warm the worker pool so timing excludes Python worker startup
    import ray.data as rd

    rd.range(NUM_CPUS * 8, override_num_blocks=NUM_CPUS * 8).map_batches(
        lambda b: b, batch_format="pyarrow"
    ).count()
    # warm the shuffle machinery too (sort path, object-store transfer
    # buffers): the first all-to-all in a fresh Ray session otherwise pays
    # one-time plasma/exchange init that is runtime setup, not pipeline work
    rd.range(512_000, override_num_blocks=NUM_CPUS).repartition(NUM_CPUS).groupby(
        "id"
    ).count().count()

    import pyarrow as pa
    import pyarrow.compute as pc

    def replicate(t: pa.Table) -> pa.Table:
        if REPLICATE <= 1:
            return t
        idx = t.column_names.index("conv_id")
        parts = []
        for r in range(REPLICATE):
            conv = pc.binary_join_element_wise(f"r{r}-", t["conv_id"], "")
            parts.append(t.set_column(idx, "conv_id", conv))
        return pa.concat_tables(parts)

    # --- maintenance lane (the headline) ---
    # plan constants are FIXED (independent of NUM_CPUS) so the two
    # parallelism levels of --scaling run the identical physical plan
    n_files = 128
    n_buckets = 64
    # best-of-N trials: the sandbox's shared host fluctuates ~2x in CPU
    # throughput minute to minute; a single cold trial measures the host,
    # not the engine. Each trial builds its own fresh table root.
    n_trials = int(os.environ.get("GRAFT_BENCH_TRIALS", "2"))

    best: dict | None = None
    all_trials: list[dict] = []
    for _trial in range(n_trials):
        root = tempfile.mkdtemp(prefix="oflr-bench-")
        timings: dict[str, float] = {}

        def timed(name: str, fn):
            t0 = time.perf_counter()
            out = fn()
            timings[name] = round(time.perf_counter() - t0, 3)
            return out

        # the trailing repartition(n_files) costs ~1.2 s of the ~7.6 s
        # ingest stage (profiled r4: source+replicate 1.9 s, +dedup
        # shuffle 5.9 s, +repartition 7.99 s) and COULD be dropped by
        # emitting files straight from the dedup groupby — but the
        # groupby's output block count is a Ray internal that varies
        # with parallelism (128 buckets emitted 64 blocks at 32 cpus),
        # which would break the fixed-physical-plan invariant the
        # --scaling evidence depends on. Determinism wins the 1.2 s.
        timed(
            "ingest",
            lambda: ingest_dataset(
                dedup_exact(
                    transcripts_from_lineitem(SF_DIR).map_batches(
                        replicate, batch_format="pyarrow"
                    ),
                    num_buckets=n_buckets,
                ).repartition(n_files),
                root,
                job_id="bench-ingest",
                summary={"keys_unique": True, "key_cols": ["conv_id", "turn_idx"]},
            ),
        )
        timed("compact", lambda: compact(root, job_id="bench-compact",
                                         target_bytes=64 * 1024 * 1024))
        timed("zorder", lambda: zorder(root, job_id="bench-zorder"))
        # derive late-turn updates from a NARROW conv slice of the table
        # (the realistic late-arrival shape); after the order-preserving
        # Z-order, manifest conv-range pruning keeps the other replicas'
        # files untouched
        from open_finance_lakehouse_ray.pipelines.scan import scan

        if REPLICATE > 1:
            rm_ = min(3, REPLICATE - 1)
            upd_src = scan(root, conv_id_range=(f"r{rm_}-", f"r{rm_}-~"))
        else:
            upd_src = scan(root)
        upd = _merge_updates(upd_src)
        timed("merge", lambda: merge_into(root, upd, job_id="bench-merge",
                                          num_buckets=n_buckets))
        report = manifest_report(root)
        total = (timings["ingest"] + timings["compact"]
                 + timings["zorder"] + timings["merge"])
        snap_version = TableLog(root).current_version()
        import shutil

        if _trial < n_trials - 1:
            shutil.rmtree(root, ignore_errors=True)
        # every trial's per-stage walls ship in the JSON line so a single
        # driver sample carries its own variance evidence (round-4 verdict:
        # compact swung 1.1↔9.7 s with host load and one cold sample read
        # as a regression)
        all_trials.append({"total": round(total, 3), "timings": dict(timings)})
        if best is None or total < best["total"]:
            best = {"total": total, "timings": timings, "report": report,
                    "version": snap_version}

    root_last = root
    timings = dict(best["timings"])
    report = best["report"]
    rows = report["rows"]
    maintenance_sec = best["total"]
    # turns processed = table rows touched per maintenance stage (ingest
    # writes all, compact rewrites all, zorder rewrites all, merge applies
    # updates against affected partitions) — headline normalizes by table
    # rows per stage, matching the reference's rows/sec derivation
    # (ofl/streaming/metrics.py:56-61)
    turns_per_sec = round(3 * rows / maintenance_sec, 1)

    # --- representative query lane ---
    timed("q_ohlc_1m", lambda: q_ev_ohlc_1m(SF_DIR))
    timed("q_pricing_summary", lambda: q_li_pricing_summary(SF_DIR))
    timed("q_near_dup", lambda: q_doc_near_dup_pairs(SF_DIR))

    # --- table-verb lane: DELETE / UPDATE / recorded-CDC replay on the
    # just-built table (regressions here were previously visible only in
    # tools/table_verbs_bench.py evidence, not the per-round driver bench)
    from open_finance_lakehouse_ray.pipelines.cdf import change_feed
    from open_finance_lakehouse_ray.pipelines.delete import (
        delete_where,
        update_where,
    )

    ents = TableLog(root_last).files()
    if REPLICATE > 1:  # one replica's conv-prefix slice each (~1/REPLICATE);
        # prefixes derived from REPLICATE so any factor >1 hits real rows
        rd_, ru_ = min(5, REPLICATE - 1), min(7, REPLICATE - 1)
        if ru_ == rd_:
            ru_ = max(0, rd_ - 1)
        del_rng = (f"r{rd_}-", f"r{rd_}-~")
        upd_rng = (f"r{ru_}-", f"r{ru_}-~")
    else:
        del_rng = tuple(ents[0].stats["conv_id"])
        upd_rng = tuple(ents[-1].stats["conv_id"])
    v_before_verbs = TableLog(root_last).current_version()
    timed("verb_delete", lambda: delete_where(
        root_last, job_id="bench-del", conv_id_range=del_rng))
    timed("verb_update", lambda: update_where(
        root_last, job_id="bench-upd", conv_id_range=upd_rng,
        assign={"tool": "scrubbed"}))
    timed("verb_cdc_replay", lambda: change_feed(
        root_last, from_version=v_before_verbs, granularity="commits"
    ).count())

    snapshot_version = best["version"]
    import shutil

    shutil.rmtree(root_last, ignore_errors=True)
    ray.shutdown()

    return {
        "metric": "maintenance_total_sec (ingest+compact+zorder+merge over "
        "lineitem-derived transcripts)",
        "value": round(maintenance_sec, 3),
        "unit": "sec",
        "queries": timings,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "rows": rows,
        "turns_per_sec": turns_per_sec,
        "files_after": report["files"],
        "snapshot_version": snapshot_version,
        "trials": all_trials,
        "cpu_probe": cpu_probe(),
    }


def run_scaling() -> dict:
    """Fresh-process runs at two parallelism levels — the sandbox evidence
    for the north rule's N vs 4N cluster-scaling criterion."""

    # each subprocess is already best-of-GRAFT_BENCH_TRIALS internally, so
    # one subprocess per level suffices by default
    trials = int(os.environ.get("GRAFT_SCALING_TRIALS", "1"))

    def run_once(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    def run(ncpu: int) -> dict:
        # best-of-N: sequential runs on a shared sandbox see large
        # run-order variance (page cache, shm cleanup); min wall time is
        # the machine's capability at that parallelism
        return min((run_once(ncpu) for _ in range(trials)), key=lambda r: r["value"])

    lo_cpus, hi_cpus = 8, 32
    lo = run(lo_cpus)
    hi = run(hi_cpus)
    eff = (lo["value"] / hi["value"]) / (hi_cpus / lo_cpus)
    return {
        "metric": "scaling_efficiency (maintenance throughput, "
        f"{lo_cpus} vs {hi_cpus} cpus, fresh processes)",
        "value": round(eff, 3),
        "unit": "ratio",
        "sec_lo": lo["value"],
        "sec_hi": hi["value"],
        "turns_per_sec_lo": lo["turns_per_sec"],
        "turns_per_sec_hi": hi["turns_per_sec"],
        "cpus": [lo_cpus, hi_cpus],
        "sf": SF_DIR,
        "queries": {"lo": lo["queries"], "hi": hi["queries"]},
    }


if __name__ == "__main__":
    result = run_scaling() if "--scaling" in sys.argv else run_bench()
    print(json.dumps(result))
