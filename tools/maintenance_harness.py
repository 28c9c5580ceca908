"""Two-process idempotence / kill-resume / concurrency harness.

Modeled on the reference's measured-not-asserted evidence discipline
(``/root/reference/tools/streaming_idempotence.py:57-92,109-183``): each
scenario runs maintenance jobs in SEPARATE OS processes, the verdict is
TABLE STATE read back by an independent reader (DuckDB over our Parquet —
"the writer is not the witness"), and the script exits non-zero on any
mismatch.

Scenarios (FIXTURES.md F5):
  double-run   — the same compaction/merge job runs twice in two fresh
                 processes; run 2 must be a no-op (same snapshot version,
                 identical table metrics).
  kill-resume  — a compaction is SIGKILLed mid-run; the resumed process
                 re-executes only uncommitted bins; the final state equals
                 an uninterrupted run's state.
  zorder-kill-resume — a range-partitioned Z-order is SIGKILLed
                 mid-reduce; the resume redoes ONLY unfinished ranges
                 (completed ranges' files verified reused by mtime).
  merge-kill-resume — a shuffle MERGE is SIGKILLed mid-bucket-apply;
                 the resume reuses committed bucket records (files
                 verified by mtime) and matches an uninterrupted run.
  delete-kill-resume — a predicate DELETE is SIGKILLed mid-rewrite;
                 the resume skips completed per-file records and matches
                 an uninterrupted run.
  update-kill-resume — same discipline for UPDATE WHERE (records must
                 be CDC-complete to be reused).
  concurrent   — a compaction and a MERGE race from the same base
                 snapshot; overlapping file sets must conflict-and-replan,
                 and the final scan must equal the serial execution.
  overwrite-race — an append commits inside an overwrite's plan->commit
                 window (deterministic via a file gate); the overwrite
                 must serialize it first and replace it (REPLACE
                 isolation), verified by an independent DuckDB read.
  stream-kill-resume — the DISTRIBUTED streaming drain is SIGKILLed
                 mid-batch; the resume converges to an uninterrupted
                 reference (bronze/dead/silver/metrics all equal).
  delete-merge-race — a slowed DELETE races a MERGE from the same
                 base (retried until a conflict-replan is OBSERVED —
                 never a vacuous pass); the loser replans and the scan
                 equals the serial merge-then-delete reference.
  restore-merge-race — a MERGE commits inside a RESTORE's plan->commit
                 window (deterministic commit gate); the restore must
                 serialize it first and land EXACTLY the target's live
                 set (the racer's files removed, never coexisting with
                 the resurrected originals), and a post-restore merge
                 must still apply cleanly.
  index-kill-resume — the incremental identity-index screen is
                 SIGKILLed between bucket-delta publishes; the resume
                 re-runs the same shard tag and must land exactly the
                 uninterrupted run's survivors and index digests (the
                 own-delta exclusion proven under a real kill).

Usage:  python tools/maintenance_harness.py [--scenario all]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import signal
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


# ----------------------------------------------------------------- workers
# Each worker runs in a fresh process with its own Ray session.

WORKER_SRC = r"""
import json, os, sys, time
sys.path.insert(0, os.environ['HARNESS_REPO'])
import ray

ray.init(address="local", num_cpus=4, include_dashboard=False,
         ignore_reinit_error=True, logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False

cmd = sys.argv[1]
root = sys.argv[2]

if cmd == "ingest":
    import ray.data as rd
    from open_finance_lakehouse_ray.sources.transcripts import build_transcripts
    from open_finance_lakehouse_ray.pipelines.ingest import ingest_dataset
    tab = build_transcripts(seed=42, n_convs=int(sys.argv[3]))
    ds = rd.from_arrow(tab).repartition(32)
    snap = ingest_dataset(ds, root, job_id="harness-ingest", summary={"keys_unique": True, "key_cols": ["conv_id", "turn_idx"]})
    print(json.dumps({"version": snap.version, "rows": snap.summary["rows"]}))
elif cmd == "compact":
    from open_finance_lakehouse_ray.pipelines.compact import compact
    slow = os.environ.get("HARNESS_SLOW_BIN_S")
    if slow:  # make each bin slow so a SIGKILL lands mid-job
        import open_finance_lakehouse_ray.pipelines.compact as cp
        orig = cp._compact_bin
        def slow_bin(*a, **k):
            time.sleep(float(slow))
            return orig(*a, **k)
        cp._compact_bin = slow_bin
        # ... and hold the FINAL commit open: at harness scale the plan can
        # be a single bin, and the gap between its record landing and
        # clear_job after the commit is ~0.1-0.3 s — the scenario's poll
        # can miss it entirely and the kill lands post-completion (vacuous,
        # which the verdict rightly refuses to pass; observed round 5 after
        # the Arrow-pool cap sped compact up). Records-exist-but-commit-
        # absent is exactly the mid-run state the scenario must freeze.
        orig_commit = cp.commit_via_actor_or_direct
        def slow_commit(log, **kw):
            time.sleep(float(slow) * 6)
            return orig_commit(log, **kw)
        cp.commit_via_actor_or_direct = slow_commit
    snap = compact(root, job_id=sys.argv[3], target_bytes=1 * 1024 * 1024)
    print(json.dumps({"version": None if snap is None else snap.version}))
elif cmd == "ingest-job":
    # parameterized ingest: root, job_id, seed, n_convs, mode
    # HARNESS_COMMIT_GATE=<path>: block just before the commit until the
    # file appears — lets a scenario interleave another writer's commit
    # into the plan->commit window deterministically.
    import ray.data as rd
    from open_finance_lakehouse_ray.sources.transcripts import build_transcripts
    from open_finance_lakehouse_ray.pipelines.ingest import ingest_dataset
    gate = os.environ.get("HARNESS_COMMIT_GATE")
    if gate:
        import open_finance_lakehouse_ray.pipelines.ingest as ing
        orig_commit = ing.commit_via_actor_or_direct
        def gated(log, **kw):
            t0 = time.time()
            while not os.path.exists(gate) and time.time() - t0 < 120:
                time.sleep(0.1)
            return orig_commit(log, **kw)
        ing.commit_via_actor_or_direct = gated
    job_id, seed, n_convs, mode = sys.argv[3], int(sys.argv[4]), int(sys.argv[5]), sys.argv[6]
    tab = build_transcripts(seed=seed, n_convs=n_convs)
    snap = ingest_dataset(rd.from_arrow(tab).repartition(8), root, job_id=job_id, mode=mode)
    print(json.dumps({"version": snap.version, "rows": snap.summary["rows"],
                      "added": snap.added_paths, "removed": snap.removed_paths}))
elif cmd == "zorder-ranged":
    from open_finance_lakehouse_ray.pipelines.zorder import zorder_ranged
    snap = zorder_ranged(root, job_id=sys.argv[3], n_ranges=8)
    print(json.dumps({"version": None if snap is None else snap.version}))
elif cmd == "delete":
    import pyarrow.compute as pc
    from open_finance_lakehouse_ray.pipelines.delete import delete_where
    slow = os.environ.get("HARNESS_SLOW_DELETE_S")
    if slow:  # slow each rewrite batch so a SIGKILL lands mid-delete
        import open_finance_lakehouse_ray.pipelines.delete as dl
        orig_make = dl._make_rewrite_runner
        def slow_make(*a, **k):
            inner = orig_make(*a, **k)
            def slowed(b):
                time.sleep(float(slow))
                return inner(b)
            return slowed
        dl._make_rewrite_runner = slow_make
    snap = delete_where(root, job_id=sys.argv[3],
                        match=lambda t: pc.equal(t["role"], "tool"))
    print(json.dumps({"version": None if snap is None else snap.version,
                      "deleted": 0 if snap is None else snap.summary["deleted_rows"]}))
elif cmd == "update":
    import pyarrow.compute as pc
    from open_finance_lakehouse_ray.pipelines.delete import update_where
    slow = os.environ.get("HARNESS_SLOW_UPDATE_S")
    if slow:
        import open_finance_lakehouse_ray.pipelines.delete as dl
        orig_make = dl._make_update_runner
        def slow_make(*a, **k):
            inner = orig_make(*a, **k)
            def slowed(b):
                time.sleep(float(slow))
                return inner(b)
            return slowed
        dl._make_update_runner = slow_make
    snap = update_where(root, job_id=sys.argv[3],
                        match=lambda t: pc.equal(t["role"], "user"),
                        assign={"tool": "scrubbed"})
    print(json.dumps({"version": None if snap is None else snap.version,
                      "updated": 0 if snap is None else snap.summary["updated_rows"]}))
elif cmd == "stream":
    # deterministic micro-batch streaming drain over a generated source
    # dir (files are pure functions of their index, so a reference run
    # and a killed+resumed run see identical input). Exercises the
    # DISTRIBUTED lane (the round-3 default).
    import pyarrow as pa
    import pyarrow.parquet as pq
    from open_finance_lakehouse_ray.pipelines.streaming import StreamProcessor
    MINUTE = 60_000_000
    BASE_TS = 1_700_000_000_000_000
    n_files = int(sys.argv[3])
    src_dir = os.path.join(root, "src")
    os.makedirs(src_dir, exist_ok=True)
    for i in range(n_files):
        p = os.path.join(src_dir, f"f{i:03d}.parquet")
        if os.path.exists(p):
            continue
        ids = list(range(i * 10, i * 10 + 10)) + ([i * 10 - 3] if i else [])
        # every column a pure function of event_id -> a cross-file dup id
        # is an exact duplicate event (same key, ts, value)
        tab = pa.table({
            "event_id": pa.array(ids, pa.int64()),
            "ts": pa.array([BASE_TS + e * (MINUTE // 2) for e in ids], pa.timestamp("us")),
            "user_id": pa.array([e % 5 for e in ids], pa.int64()),
            "event_type": pa.array(["click" if e % 3 else "view" for e in ids]),
            "value": pa.array([None if e % 17 == 0 else float(e) for e in ids], pa.float64()),
            "props": pa.array(["{}"] * len(ids)),
        })
        pq.write_table(tab, p)
    proc = StreamProcessor(
        src_dir, os.path.join(root, "bronze"), os.path.join(root, "silver"),
        os.path.join(root, "ckpt"), window_us=MINUTE, delay_us=2 * MINUTE,
        max_files_per_trigger=1, distributed=True,
    )
    slow = os.environ.get("HARNESS_SLOW_STREAM_S")
    if slow:
        orig = proc._process_batch_distributed
        def slowed(state, files):
            time.sleep(float(slow))
            return orig(state, files)
        proc._process_batch_distributed = slowed
    m = proc.run_available_now()
    print(json.dumps({"metrics": m}))
elif cmd == "restore":
    # RESTORE VERSION AS OF; HARNESS_COMMIT_GATE parks it between plan
    # (head read + target resolution) and commit, so another writer's
    # commit can land deterministically inside the window.
    import open_finance_lakehouse_ray.pipelines.restore as rs
    gate = os.environ.get("HARNESS_COMMIT_GATE")
    if gate:
        orig_commit = rs.commit_via_actor_or_direct
        def gated(log, **kw):
            t0 = time.time()
            while not os.path.exists(gate) and time.time() - t0 < 120:
                time.sleep(0.1)
            return orig_commit(log, **kw)
        rs.commit_via_actor_or_direct = gated
    snap = rs.restore(root, to_version=int(sys.argv[4]), job_id=sys.argv[3])
    print(json.dumps({"version": snap.version,
                      "added": snap.added_paths,
                      "removed": snap.removed_paths}))
elif cmd == "merge":
    from open_finance_lakehouse_ray.sources.transcripts import build_transcripts, late_turns
    from open_finance_lakehouse_ray.pipelines.merge import merge_into
    slow = os.environ.get("HARNESS_SLOW_BUCKET_S")
    if slow:  # slow each bucket apply so a SIGKILL lands mid-merge
        import open_finance_lakehouse_ray.pipelines.merge as mg
        orig_make = mg._make_bucket_apply
        def slow_make(*a, **k):
            inner = orig_make(*a, **k)
            def slowed(g):
                time.sleep(float(slow))
                return inner(g)
            return slowed
        mg._make_bucket_apply = slow_make
    base = build_transcripts(seed=42, n_convs=int(sys.argv[4]))
    late = late_turns(base, n_updates=30, n_inserts=15, n_stale=10)
    strategy = sys.argv[5] if len(sys.argv) > 5 else "auto"
    snap = merge_into(root, late, job_id=sys.argv[3], num_buckets=8,
                      strategy=strategy)
    print(json.dumps({"version": snap.version, "op": snap.operation}))
elif cmd == "idx-build":
    import numpy as np
    import pyarrow as pa, pyarrow.parquet as pq
    import ray.data as rd
    from open_finance_lakehouse_ray.pipelines.dedup import build_hash_index
    rng = np.random.default_rng(17)
    vocab = [f"w{i}" for i in range(50)]
    hist_texts = [" ".join(rng.choice(vocab, size=6)) + f" h{i}"
                  for i in range(400)]
    shard_ids, shard_texts, nxt = [], [], 10_000
    for i in range(100):  # novel docs, half with a within-shard duplicate
        t = " ".join(rng.choice(vocab, size=6)) + f" n{i}"
        shard_ids.append(nxt); shard_texts.append(t); nxt += 1
        if i < 50:
            shard_ids.append(nxt); shard_texts.append(t); nxt += 1
    for t in hist_texts[:100]:  # verbatim history copies: must all drop
        shard_ids.append(nxt); shard_texts.append(t); nxt += 1
    os.makedirs(root, exist_ok=True)
    pq.write_table(pa.table({"doc_id": pa.array(range(400), pa.int64()),
                             "text": pa.array(hist_texts)}),
                   os.path.join(root, "corpus.parquet"))
    pq.write_table(pa.table({"doc_id": pa.array(shard_ids, pa.int64()),
                             "text": pa.array(shard_texts)}),
                   os.path.join(root, "shard.parquet"))
    n = build_hash_index(rd.read_parquet(os.path.join(root, "corpus.parquet")),
                         os.path.join(root, "index"))
    print(json.dumps({"index_entries": n}))
elif cmd == "idx-screen":
    import pyarrow as pa, pyarrow.parquet as pq
    import ray.data as rd
    from open_finance_lakehouse_ray.pipelines.dedup import incremental_dedup
    shard = rd.read_parquet(os.path.join(root, "shard.parquet")).repartition(8)
    kept = (incremental_dedup(shard, os.path.join(root, "index"), shard="s1")
            .to_pandas().sort_values("doc_id"))
    tmp = os.path.join(root, "kept.parquet.tmp")
    pq.write_table(pa.Table.from_pandas(kept.reset_index(drop=True),
                                        preserve_index=False), tmp)
    os.replace(tmp, os.path.join(root, "kept.parquet"))
    print(json.dumps({"kept": int(len(kept))}))
ray.shutdown()
"""


def run_worker(args: list[str], env: dict | None = None, timeout: float = 600.0):
    full_env = dict(os.environ, HARNESS_REPO=REPO)
    if env:
        full_env.update(env)
    p = subprocess.run(
        [sys.executable, "-c", WORKER_SRC, *args],
        capture_output=True,
        text=True,
        env=full_env,
        timeout=timeout,
    )
    if p.returncode != 0:
        raise RuntimeError(f"worker {args} failed:\n{p.stdout}\n{p.stderr}")
    return json.loads(p.stdout.strip().splitlines()[-1])


def independent_state(root: str) -> dict:
    """Read table state with DuckDB — never through the engine under test."""
    import duckdb

    sys.path.insert(0, REPO)
    from open_finance_lakehouse_ray.state.txlog import TableLog

    log = TableLog(root)
    con = duckdb.connect()
    row = con.execute(
        "select count(*), count(distinct conv_id || '#' || turn_idx), "
        "       sum(hash(conv_id || '#' || turn_idx || '#' || text)) "
        "from read_parquet($1)",
        [log.file_paths()],
    ).fetchone()
    con.close()
    return {
        "version": log.current_version(),
        "rows": row[0],
        "distinct_keys": row[1],
        "content_hash": str(row[2]),
        "files": len(log.files()),
    }


def scenario_double_run(scratch: str) -> dict:
    root = os.path.join(scratch, "double")
    run_worker(["ingest", root, "40"])
    r1 = run_worker(["compact", root, "compact-A"])
    s1 = independent_state(root)
    r2 = run_worker(["compact", root, "compact-A"])  # fresh process, same job
    s2 = independent_state(root)
    ok = r1["version"] == r2["version"] and s1 == s2
    return {"ok": ok, "run1": r1, "run2": r2, "state1": s1, "state2": s2}


def scenario_kill_resume(scratch: str) -> dict:
    root = os.path.join(scratch, "kill")
    ref_root = os.path.join(scratch, "kill-ref")
    run_worker(["ingest", root, "40"])
    shutil.copytree(root, ref_root)

    # uninterrupted reference run
    run_worker(["compact", ref_root, "compact-K"])
    ref_state = independent_state(ref_root)

    # killed run: slow bins, SIGKILL mid-flight
    p = subprocess.Popen(
        [sys.executable, "-c", WORKER_SRC, "compact", root, "compact-K"],
        env={**os.environ, "HARNESS_REPO": REPO, "HARNESS_SLOW_BIN_S": "1.5"},
        stdout=subprocess.PIPE,
        stderr=subprocess.PIPE,
    )
    # kill as soon as SOME bin records have committed — polling beats a
    # fixed sleep on a noisy sandbox, and the verdict below PROVES the
    # kill landed mid-run (records exist, final commit absent)
    from open_finance_lakehouse_ray.state.txlog import TableLog

    deadline = time.time() + 120
    while time.time() < deadline and p.poll() is None:
        if len(TableLog(root).committed_partitions("compact-K")) >= 1:
            break
        time.sleep(0.25)
    p.send_signal(signal.SIGKILL)
    p.wait()

    partial = len(TableLog(root).committed_partitions("compact-K"))
    mid_run = partial > 0 and TableLog(root).find_commit("compact-K") is None

    # resumed run (fresh process, no slowdown)
    run_worker(["compact", root, "compact-K"])
    got_state = independent_state(root)

    comparable = {k: ref_state[k] for k in ("rows", "distinct_keys", "content_hash")}
    got_comp = {k: got_state[k] for k in ("rows", "distinct_keys", "content_hash")}
    return {
        "ok": comparable == got_comp and mid_run,
        "killed_mid_run": mid_run,
        "bins_committed_before_kill": partial,
        "reference": ref_state,
        "resumed": got_state,
    }


def scenario_zorder_kill_resume(scratch: str) -> dict:
    """A range-partitioned Z-order is SIGKILLed mid-reduce; the resumed
    process must redo ONLY unfinished ranges — completed ranges' output
    files are reused byte-for-byte (mtimes unchanged) and the final scan
    equals an uninterrupted run's."""
    root = os.path.join(scratch, "zkill")
    ref_root = os.path.join(scratch, "zkill-ref")
    run_worker(["ingest", root, "40"])
    shutil.copytree(root, ref_root)

    run_worker(["zorder-ranged", ref_root, "zorder-K"])
    ref_state = independent_state(ref_root)

    p = subprocess.Popen(
        [sys.executable, "-c", WORKER_SRC, "zorder-ranged", root, "zorder-K"],
        env={**os.environ, "HARNESS_REPO": REPO, "HARNESS_SLOW_RANGE_S": "2.5"},
        stdout=subprocess.PIPE,
        stderr=subprocess.PIPE,
    )
    # kill as soon as SOME (but not all 8) ranges have committed records —
    # polling beats a fixed sleep on a noisy sandbox
    from open_finance_lakehouse_ray.state.txlog import TableLog

    deadline = time.time() + 120
    while time.time() < deadline:
        done = [
            pid for pid, r in TableLog(root).committed_partitions("zorder-K").items()
            if pid.startswith("range-") and r.get("outputs")
        ]
        if len(done) >= 2:
            break
        time.sleep(0.25)
    p.send_signal(signal.SIGKILL)
    p.wait()

    parts = TableLog(root).committed_partitions("zorder-K")
    done_ranges = {
        pid: r for pid, r in parts.items()
        if pid.startswith("range-") and r.get("outputs")
    }
    pre_mtimes = {
        r["outputs"][0]["path"]: os.path.getmtime(
            os.path.join(root, r["outputs"][0]["path"])
        )
        for r in done_ranges.values()
    }

    run_worker(["zorder-ranged", root, "zorder-K"])
    got_state = independent_state(root)

    from open_finance_lakehouse_ray.state.txlog import TableLog as TL

    final_paths = set(TL(root).snapshot().added_paths)
    reused = all(
        p_ in final_paths
        and os.path.getmtime(os.path.join(root, p_)) == m
        for p_, m in pre_mtimes.items()
    )
    comparable = {k: ref_state[k] for k in ("rows", "distinct_keys", "content_hash")}
    got_comp = {k: got_state[k] for k in ("rows", "distinct_keys", "content_hash")}
    return {
        "ok": comparable == got_comp and reused and len(done_ranges) > 0,
        "ranges_committed_before_kill": len(done_ranges),
        "completed_ranges_reused": reused,
        "reference": ref_state,
        "resumed": got_state,
    }


def scenario_merge_kill_resume(scratch: str) -> dict:
    """A shuffle MERGE is SIGKILLed mid-bucket-apply; the resumed process
    reuses committed bucket records (their output files verified by
    mtime) and the final state equals an uninterrupted merge's."""
    root = os.path.join(scratch, "mkill")
    ref_root = os.path.join(scratch, "mkill-ref")
    run_worker(["ingest", root, "40"])
    shutil.copytree(root, ref_root)

    run_worker(["merge", ref_root, "merge-K", "40", "shuffle"])
    ref_state = independent_state(ref_root)

    p = subprocess.Popen(
        [sys.executable, "-c", WORKER_SRC, "merge", root, "merge-K", "40",
         "shuffle"],
        env={**os.environ, "HARNESS_REPO": REPO, "HARNESS_SLOW_BUCKET_S": "2.0"},
        stdout=subprocess.PIPE,
        stderr=subprocess.PIPE,
    )
    from open_finance_lakehouse_ray.state.txlog import TableLog

    deadline = time.time() + 120
    while time.time() < deadline:
        done = [
            pid for pid, r in TableLog(root).committed_partitions("merge-K").items()
            if r.get("outputs")
        ]
        if len(done) >= 2:
            break
        time.sleep(0.25)
    p.send_signal(signal.SIGKILL)
    p.wait()

    parts = {
        pid: r for pid, r in TableLog(root).committed_partitions("merge-K").items()
        if r.get("outputs")
    }
    pre_mtimes = {
        r["outputs"][0]["path"]: os.path.getmtime(
            os.path.join(root, r["outputs"][0]["path"])
        )
        for r in parts.values()
    }

    run_worker(["merge", root, "merge-K", "40", "shuffle"])
    got_state = independent_state(root)

    final_paths = set(TableLog(root).snapshot().added_paths)
    reused = all(
        p_ in final_paths
        and os.path.getmtime(os.path.join(root, p_)) == m
        for p_, m in pre_mtimes.items()
    )
    comparable = {k: ref_state[k] for k in ("rows", "distinct_keys", "content_hash")}
    got_comp = {k: got_state[k] for k in ("rows", "distinct_keys", "content_hash")}
    return {
        "ok": comparable == got_comp and reused and len(parts) > 0,
        "buckets_committed_before_kill": len(parts),
        "completed_buckets_reused": reused,
        "reference": ref_state,
        "resumed": got_state,
    }


def scenario_delete_kill_resume(scratch: str) -> dict:
    """A predicate DELETE is SIGKILLed mid-rewrite; the resumed process
    must converge to the uninterrupted reference (per-file lineage
    records skip completed rewrites, stale debris is never committed)."""
    root = os.path.join(scratch, "del")
    ref_root = os.path.join(scratch, "del-ref")
    run_worker(["ingest", root, "40"])
    shutil.copytree(root, ref_root)

    run_worker(["delete", ref_root, "del-K"])
    ref_state = independent_state(ref_root)

    p = subprocess.Popen(
        [sys.executable, "-c", WORKER_SRC, "delete", root, "del-K"],
        env={**os.environ, "HARNESS_REPO": REPO, "HARNESS_SLOW_DELETE_S": "1.5"},
        stdout=subprocess.PIPE,
        stderr=subprocess.PIPE,
    )
    from open_finance_lakehouse_ray.state.txlog import TableLog

    deadline = time.time() + 120
    while time.time() < deadline and p.poll() is None:
        if len(TableLog(root).committed_partitions("del-K")) >= 1:
            break
        time.sleep(0.25)
    p.send_signal(signal.SIGKILL)
    p.wait()

    partial = len(TableLog(root).committed_partitions("del-K"))
    mid_run = partial > 0 and TableLog(root).find_commit("del-K") is None

    run_worker(["delete", root, "del-K"])
    got_state = independent_state(root)

    comparable = {k: ref_state[k] for k in ("rows", "distinct_keys", "content_hash")}
    got_comp = {k: got_state[k] for k in ("rows", "distinct_keys", "content_hash")}
    return {
        "ok": comparable == got_comp and mid_run,
        "killed_mid_run": mid_run,
        "parts_committed_before_kill": partial,
        "reference": ref_state,
        "resumed": got_state,
    }


def scenario_update_kill_resume(scratch: str) -> dict:
    """An UPDATE is SIGKILLed mid-rewrite; the resume must reuse only
    CDC-complete per-file records and converge to the uninterrupted
    reference state (verified by an independent DuckDB read)."""
    root = os.path.join(scratch, "upd")
    ref_root = os.path.join(scratch, "upd-ref")
    run_worker(["ingest", root, "40"])
    shutil.copytree(root, ref_root)

    run_worker(["update", ref_root, "upd-K"])
    ref_state = independent_state(ref_root)

    p = subprocess.Popen(
        [sys.executable, "-c", WORKER_SRC, "update", root, "upd-K"],
        env={**os.environ, "HARNESS_REPO": REPO, "HARNESS_SLOW_UPDATE_S": "1.5"},
        stdout=subprocess.PIPE,
        stderr=subprocess.PIPE,
    )
    from open_finance_lakehouse_ray.state.txlog import TableLog

    deadline = time.time() + 120
    while time.time() < deadline and p.poll() is None:
        if len(TableLog(root).committed_partitions("upd-K")) >= 1:
            break
        time.sleep(0.25)
    p.send_signal(signal.SIGKILL)
    p.wait()

    partial = len(TableLog(root).committed_partitions("upd-K"))
    mid_run = partial > 0 and TableLog(root).find_commit("upd-K") is None

    run_worker(["update", root, "upd-K"])
    got_state = independent_state(root)

    comparable = {k: ref_state[k] for k in ("rows", "distinct_keys", "content_hash")}
    got_comp = {k: got_state[k] for k in ("rows", "distinct_keys", "content_hash")}
    return {
        "ok": comparable == got_comp and mid_run,
        "killed_mid_run": mid_run,
        "parts_committed_before_kill": partial,
        "reference": ref_state,
        "resumed": got_state,
    }


def scenario_stream_kill_resume(scratch: str) -> dict:
    """The DISTRIBUTED streaming lane is SIGKILLed mid-drain; the resumed
    process must converge to the uninterrupted reference — bronze, dead
    letters, silver bars and checkpoint metrics all equal under an
    independent DuckDB read (offsets claimed with state, appends
    idempotent on the batch id)."""
    import duckdb

    sys.path.insert(0, REPO)
    from open_finance_lakehouse_ray.state.txlog import TableLog

    def stream_state(base: str) -> dict:
        con = duckdb.connect()
        out = {}
        for name, sub in (("bronze", "bronze"), ("silver", "silver"),
                          ("dead", os.path.join("bronze", "_dead_letter"))):
            log = TableLog(os.path.join(base, sub))
            if log.current_version() is None:
                out[name] = {"rows": 0, "hash": "0"}
                continue
            cols = "*" if name != "silver" else \
                "event_type, window_start, open, close, high, low, volume, n_events"
            row = con.execute(
                f"select count(*), sum(hash(concat_ws('#', {cols.replace('*', 'event_id, ts, value')}))) "
                f"from (select {cols} from read_parquet($1))",
                [log.file_paths()],
            ).fetchone()
            out[name] = {"rows": row[0], "hash": str(row[1])}
        con.close()
        return out

    base = os.path.join(scratch, "stream")
    ref = os.path.join(scratch, "stream-ref")
    n = "10"
    ref_metrics = run_worker(["stream", ref, n])["metrics"]
    ref_state = stream_state(ref)

    p = subprocess.Popen(
        [sys.executable, "-c", WORKER_SRC, "stream", base, n],
        env={**os.environ, "HARNESS_REPO": REPO, "HARNESS_SLOW_STREAM_S": "0.8"},
        stdout=subprocess.PIPE,
        stderr=subprocess.PIPE,
    )
    ckpt = os.path.join(base, "ckpt", "stream.json")
    deadline = time.time() + 120
    batches_done = 0
    while time.time() < deadline and p.poll() is None:
        try:
            with open(ckpt) as f:
                batches_done = json.load(f)["batch_id"]
        except (OSError, json.JSONDecodeError):
            batches_done = 0
        if batches_done >= 3:
            break
        time.sleep(0.1)
    p.send_signal(signal.SIGKILL)
    p.wait()
    mid_run = 0 < batches_done < int(n)

    got_metrics = run_worker(["stream", base, n])["metrics"]
    got_state = stream_state(base)
    return {
        "ok": mid_run and ref_state == got_state and ref_metrics == got_metrics,
        "killed_mid_run": mid_run,
        "batches_before_kill": batches_done,
        "reference": {"state": ref_state, "metrics": ref_metrics},
        "resumed": {"state": got_state, "metrics": got_metrics},
    }


def scenario_concurrent(scratch: str) -> dict:
    root = os.path.join(scratch, "concurrent")
    run_worker(["ingest", root, "40"])
    # launch compaction (slowed) and merge simultaneously from the same base
    pc_ = subprocess.Popen(
        [sys.executable, "-c", WORKER_SRC, "compact", root, "compact-C"],
        env={**os.environ, "HARNESS_REPO": REPO, "HARNESS_SLOW_BIN_S": "0.5"},
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
    )
    pm = subprocess.Popen(
        [sys.executable, "-c", WORKER_SRC, "merge", root, "merge-C", "40"],
        env={**os.environ, "HARNESS_REPO": REPO},
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
    )
    out_c, err_c = pc_.communicate(timeout=900)
    out_m, err_m = pm.communicate(timeout=900)
    if pc_.returncode != 0 or pm.returncode != 0:
        return {"ok": False, "compact_err": err_c[-2000:], "merge_err": err_m[-2000:]}
    state = independent_state(root)

    # serial reference: ingest -> merge -> compact on a fresh copy
    ref_root = os.path.join(scratch, "concurrent-ref")
    run_worker(["ingest", ref_root, "40"])
    run_worker(["merge", ref_root, "merge-C", "40"])
    run_worker(["compact", ref_root, "compact-C2"])
    ref = independent_state(ref_root)

    comparable = {k: ref[k] for k in ("rows", "distinct_keys", "content_hash")}
    got = {k: state[k] for k in ("rows", "distinct_keys", "content_hash")}
    from open_finance_lakehouse_ray.state.txlog import TableLog

    ops = [TableLog(root).snapshot(v).operation for v in TableLog(root).versions()]
    return {"ok": comparable == got, "ops": ops, "concurrent": state, "serial": ref}


def scenario_delete_merge_race(scratch: str) -> dict:
    """A slowed predicate DELETE races a MERGE from the same base: the
    loser must detect the overlap (CommitConflict on files both touched),
    replan against the new head, and converge to the serial
    delete-after-merge reference — serializable isolation across the two
    verbs that both REWRITE files (compact+merge only move rows; this
    pair changes them)."""
    # retry until the race ACTUALLY happens (a conflict-replan observed):
    # on a loaded host one verb can finish before the other plans, which
    # proves nothing — the scenario must never pass vacuously
    from open_finance_lakehouse_ray.state.txlog import TableLog

    replanned = False
    for attempt in range(4):
        root = os.path.join(scratch, f"delmerge{attempt}")
        run_worker(["ingest", root, "40"])
        pd_ = subprocess.Popen(
            [sys.executable, "-c", WORKER_SRC, "delete", root, "del-R"],
            env={**os.environ, "HARNESS_REPO": REPO,
                 "HARNESS_SLOW_DELETE_S": "0.7"},
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        pm = subprocess.Popen(
            [sys.executable, "-c", WORKER_SRC, "merge", root, "merge-R", "40"],
            env={**os.environ, "HARNESS_REPO": REPO},
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        out_d, err_d = pd_.communicate(timeout=900)
        out_m, err_m = pm.communicate(timeout=900)
        if pd_.returncode != 0 or pm.returncode != 0:
            return {"ok": False, "delete_err": err_d[-2000:],
                    "merge_err": err_m[-2000:]}
        log_try = TableLog(root)
        replanned = any(
            "~replan" in log_try.snapshot(v).job_id for v in log_try.versions()
        )
        if replanned:
            break
    state = independent_state(root)

    # serial reference: merge first, then the same delete
    ref_root = os.path.join(scratch, "delmerge-ref")
    run_worker(["ingest", ref_root, "40"])
    run_worker(["merge", ref_root, "merge-R", "40"])
    run_worker(["delete", ref_root, "del-R"])
    ref = independent_state(ref_root)

    log = TableLog(root)
    ops = [(v, log.snapshot(v).operation, log.snapshot(v).job_id)
           for v in log.versions()]
    order_serialized = [o for _, o, _ in ops]
    # equality holds whichever order the log serialized them in ONLY when
    # delete ran after merge (merge's late turns include 'tool'-role rows
    # the delete predicate matches); if delete won the race, the merge
    # re-inserts rows the reference deletes — then rows may differ but
    # KEYS must still be unique and both verbs' commits present.
    comparable = {k: ref[k] for k in ("rows", "distinct_keys", "content_hash")}
    got = {k: state[k] for k in ("rows", "distinct_keys", "content_hash")}
    delete_after_merge = order_serialized.index("merge") < order_serialized.index("delete") \
        if "delete" in order_serialized and "merge" in order_serialized else False
    if delete_after_merge:
        ok = replanned and comparable == got
    else:
        ok = (replanned and "delete" in order_serialized
              and "merge" in order_serialized
              and state["rows"] == state["distinct_keys"])
    return {
        "ok": bool(ok),
        "ops": order_serialized,
        "replanned_on_conflict": replanned,
        "delete_after_merge": delete_after_merge,
        "concurrent": state,
        "serial": ref,
    }


def scenario_restore_merge_race(scratch: str) -> dict:
    """RESTORE isolation under an ACTUAL race (round-4 serialized restore
    via overwrite-live removal; this proves it the way overwrite-race
    does): a MERGE commits inside the restore's plan->commit window
    (deterministic via the commit gate). The restore must serialize the
    merge BEFORE itself and still land its documented postcondition — the
    live set is EXACTLY the target version's, the racer's files removed —
    never the racer's rewrites surviving beside resurrected originals
    (the row-duplication class). A post-restore merge then proves the
    restored head is fully functional."""
    root = os.path.join(scratch, "restore-race")
    run_worker(["ingest", root, "40"])  # v1
    from open_finance_lakehouse_ray.state.txlog import TableLog

    log = TableLog(root)
    v1 = log.current_version()
    v1_state = independent_state(root)
    run_worker(["delete", root, "del-RR"])  # v2 — diverge the history

    gate = os.path.join(scratch, "restore-race.gate")
    p_rs = subprocess.Popen(
        [sys.executable, "-c", WORKER_SRC, "restore", root, "restore-RR",
         str(v1)],
        env={**os.environ, "HARNESS_REPO": REPO, "HARNESS_COMMIT_GATE": gate},
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
    )
    # the racer MERGE commits fully while the restore is parked pre-commit
    racer = run_worker(["merge", root, "merge-RR", "40"])
    with open(gate, "w") as f:
        f.write("go")
    out, err = p_rs.communicate(timeout=900)
    if p_rs.returncode != 0:
        return {"ok": False, "restore_err": err[-2000:]}
    rs = json.loads(out.strip().splitlines()[-1])

    state = independent_state(root)
    head = log.snapshot()
    merge_added = set(log.snapshot(racer["version"]).added_paths)
    target_files = sorted(e.path for e in log.files(v1))
    live = sorted(e.path for e in log.files())
    comparable = ("rows", "distinct_keys", "content_hash")
    checks = {
        "merge_serialized_first": racer["version"] < rs["version"],
        "live_is_target_exactly": live == target_files,
        "state_equals_v1": {k: state[k] for k in comparable}
        == {k: v1_state[k] for k in comparable},
        "merge_files_removed": merge_added <= set(head.removed_paths),
    }
    # the restored head stays fully functional: a fresh merge applies
    # (late_turns: 30 updates + 15 inserts over the v1 base)
    run_worker(["merge", root, "merge-RR2", "40"])
    after = independent_state(root)
    checks["post_restore_merge_applies"] = (
        after["rows"] == v1_state["rows"] + 15
        and after["rows"] == after["distinct_keys"]
    )
    return {"ok": all(checks.values()), **checks,
            "versions": {"merge": racer["version"], "restore": rs["version"]},
            "state": state, "after_merge": after}


def scenario_overwrite_race(scratch: str) -> dict:
    """REPLACE isolation: an append that commits inside an overwrite's
    plan->commit window must be serialized BEFORE the overwrite and
    replaced by it — never left alive beside the replacement data."""
    root = os.path.join(scratch, "ow-race")
    run_worker(["ingest-job", root, "base", "42", "40", "append"])  # v1
    gate = os.path.join(scratch, "ow-race.gate")
    p_ow = subprocess.Popen(
        [sys.executable, "-c", WORKER_SRC,
         "ingest-job", root, "ow", "7", "25", "overwrite"],
        env={**os.environ, "HARNESS_REPO": REPO, "HARNESS_COMMIT_GATE": gate},
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
    )
    # the racer commits fully while the overwrite is parked pre-commit
    racer = run_worker(["ingest-job", root, "racer", "99", "5", "append"])
    with open(gate, "w") as f:
        f.write("go")
    out, err = p_ow.communicate(timeout=900)
    if p_ow.returncode != 0:
        return {"ok": False, "overwrite_err": err[-2000:]}
    ow = json.loads(out.strip().splitlines()[-1])

    state = independent_state(root)
    from open_finance_lakehouse_ray.state.txlog import TableLog

    log = TableLog(root)
    head = log.snapshot()
    live = sorted(e.path for e in log.files())
    checks = {
        # the racer committed BEFORE the overwrite in the version order
        "racer_serialized_first": racer["version"] < ow["version"],
        # final table is EXACTLY the overwrite's file set / rows
        "live_is_overwrite_only": live == sorted(ow["added"]),
        "rows_match_overwrite": state["rows"] == ow["rows"],
        # the racer's files were replaced by the overwrite commit
        "racer_files_removed": set(racer["added"]) <= set(head.removed_paths),
        "mode_recorded": head.summary.get("mode") == "overwrite",
    }
    return {"ok": all(checks.values()), **checks,
            "versions": {"racer": racer["version"], "overwrite": ow["version"]},
            "state": state}


def independent_index_state(root: str) -> dict:
    """Read the screen's outcome with DuckDB — survivors AND the index's
    distinct digest set, never through the engine under test."""
    import duckdb

    con = duckdb.connect()
    kept = con.execute(
        "select count(*), sum(hash(doc_id || '#' || text)) "
        "from read_parquet($1)",
        [os.path.join(root, "kept.parquet")],
    ).fetchone()
    idx = con.execute(
        "select count(distinct h16) from read_parquet($1)",
        [os.path.join(root, "index", "bucket=*", "*.parquet")],
    ).fetchone()
    con.close()
    return {
        "kept_rows": kept[0],
        "kept_hash": str(kept[1]),
        "idx_distinct_digests": idx[0],
    }


def scenario_index_kill_resume(scratch: str) -> dict:
    """The incremental identity-index screen (incremental_dedup with
    update_index) is SIGKILLed between bucket-delta publishes; the resume
    re-runs the SAME shard tag and must land exactly the uninterrupted
    run's survivors and index digest set — the own-delta exclusion proven
    under a real kill (the first attempt's partial deltas must not mark
    the retry's own rows as historical, which would silently drop every
    novel doc the killed attempt had already published)."""
    import glob

    root = os.path.join(scratch, "idx")
    ref = os.path.join(scratch, "idx-ref")
    run_worker(["idx-build", root])
    shutil.copytree(root, ref)
    run_worker(["idx-screen", ref])  # uninterrupted reference
    ref_state = independent_index_state(ref)

    p = subprocess.Popen(
        [sys.executable, "-c", WORKER_SRC, "idx-screen", root],
        env={**os.environ, "HARNESS_REPO": REPO,
             "OFLR_INDEX_DELTA_SLEEP_S": "0.8"},
        # DEVNULL, not PIPE: nobody drains these, and a chatty Ray startup
        # filling the 64 KB pipe buffer would block the child BEFORE any
        # delta publishes — the watcher would then SIGKILL an idle process
        # and the scenario would flake as a vacuous mid_run=False
        stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL,
    )
    pattern = os.path.join(root, "index", "bucket=*", "s1.parquet")
    deadline = time.time() + 120
    while time.time() < deadline and p.poll() is None:
        if len(glob.glob(pattern)) >= 1:
            break
        time.sleep(0.1)
    p.send_signal(signal.SIGKILL)
    p.wait()
    partial = len(glob.glob(pattern))
    mid_run = partial >= 1 and not os.path.exists(
        os.path.join(root, "kept.parquet")
    )

    run_worker(["idx-screen", root])  # resume: fresh process, same tag
    got_state = independent_index_state(root)
    return {
        "ok": mid_run and ref_state == got_state,
        "killed_mid_run": mid_run,
        "deltas_before_kill": partial,
        "reference": ref_state,
        "resumed": got_state,
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenario", default="all",
                    choices=["all", "double-run", "kill-resume",
                             "zorder-kill-resume", "merge-kill-resume",
                             "delete-kill-resume", "update-kill-resume",
                             "concurrent", "overwrite-race", "stream-kill-resume",
                             "delete-merge-race", "restore-merge-race",
                             "index-kill-resume"])
    args = ap.parse_args()
    scratch = tempfile.mkdtemp(prefix="ofl-harness-")
    scenarios = {
        "double-run": scenario_double_run,
        "kill-resume": scenario_kill_resume,
        "zorder-kill-resume": scenario_zorder_kill_resume,
        "merge-kill-resume": scenario_merge_kill_resume,
        "delete-kill-resume": scenario_delete_kill_resume,
        "update-kill-resume": scenario_update_kill_resume,
        "stream-kill-resume": scenario_stream_kill_resume,
        "delete-merge-race": scenario_delete_merge_race,
        "concurrent": scenario_concurrent,
        "overwrite-race": scenario_overwrite_race,
        "restore-merge-race": scenario_restore_merge_race,
        "index-kill-resume": scenario_index_kill_resume,
    }
    todo = list(scenarios) if args.scenario == "all" else [args.scenario]
    failed = False
    results = {}
    for name in todo:
        t0 = time.time()
        try:
            res = scenarios[name](scratch)
        except Exception as e:  # noqa: BLE001
            res = {"ok": False, "error": str(e)[-2000:]}
        res["elapsed_s"] = round(time.time() - t0, 1)
        results[name] = res
        print(f"[{name}] {'PASS' if res['ok'] else 'FAIL'} ({res['elapsed_s']}s)")
        if not res["ok"]:
            failed = True
    print(json.dumps(results, indent=2, default=str))
    shutil.rmtree(scratch, ignore_errors=True)
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
