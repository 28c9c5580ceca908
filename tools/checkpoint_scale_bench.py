"""Evidence for the round-4 sharded StreamCheckpoint: checkpoint WRITE cost
stays flat as dedup-key cardinality grows 10x.

The old single-JSON checkpoint rewrote the entire ``seen_keys`` map every
batch, so write bytes grew linearly with key cardinality.  The sharded
store bucket-izes state by event time: a steady-state batch inserts keys
into the newest bucket(s) and the watermark prune deletes whole old shard
files, so per-batch write I/O is proportional to the BATCH, not the state.

Protocol: hold batch size fixed (10k new keys/batch), run 8 batches at
total retained-state cardinalities N and 10N (watermark window scaled so
the retained state is ~N keys), measure bytes written + files rewritten +
wall time per save.  No Ray needed — this is pure checkpoint I/O.

Usage: python tools/checkpoint_scale_bench.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from open_finance_lakehouse_ray.pipelines.streaming import StreamCheckpoint

MIN = 60_000_000
BASE = 1_700_000_000_000_000
BATCH_KEYS = 10_000


def run(retained_buckets: int, *, hints: bool) -> dict:
    """Simulate steady state: each batch adds BATCH_KEYS keys in a fresh
    minute bucket and prunes buckets older than ``retained_buckets``
    (watermark semantics). Retained cardinality ~= retained_buckets *
    BATCH_KEYS.  ``hints=True`` exercises the processor's dirty-hint path
    (O(batch) save CPU); ``hints=False`` the full canonical compare any
    external caller gets (O(state) CPU, still flat write bytes)."""
    root = tempfile.mkdtemp(prefix="ckpt-bench-")
    ck = StreamCheckpoint(os.path.join(root, "stream.json"), bucket_us=MIN)
    state = ck.load()
    # pre-fill to steady-state cardinality
    for b in range(retained_buckets):
        t0 = BASE + b * MIN
        for i in range(BATCH_KEYS):
            state["seen_keys"][f"click:{b}:{i}"] = t0 + i
    state["batch_id"] = 1
    ck.save(state)

    bytes_written = []
    files_rewritten = []
    wall = []
    for step in range(8):
        state = ck.load()
        before = {n: os.path.getmtime(os.path.join(ck.shard_dir, n))
                  for n in os.listdir(ck.shard_dir)}
        b = retained_buckets + step
        t0 = BASE + b * MIN
        inserted = []
        for i in range(BATCH_KEYS):
            state["seen_keys"][f"click:{b}:{i}"] = t0 + i
            inserted.append(t0 + i)
        watermark = BASE + (b - retained_buckets + 1) * MIN
        state["seen_keys"] = {
            k: t for k, t in state["seen_keys"].items() if t >= watermark
        }
        state["batch_id"] += 1
        t_start = time.perf_counter()
        if hints:
            ck.save(state, dirty_key_ts=inserted, dirty_window_keys=[],
                    watermark_us=watermark)
        else:
            ck.save(state)
        wall.append(time.perf_counter() - t_start)
        new = 0
        nbytes = 0
        for n in os.listdir(ck.shard_dir):
            p = os.path.join(ck.shard_dir, n)
            if n not in before or os.path.getmtime(p) > before[n]:
                new += 1
                nbytes += os.path.getsize(p)
        bytes_written.append(nbytes)
        files_rewritten.append(new)
    total_keys = sum(1 for _ in state["seen_keys"])
    shutil.rmtree(root, ignore_errors=True)
    return {
        "retained_keys": total_keys,
        "avg_bytes_written_per_batch": sum(bytes_written) / len(bytes_written),
        "avg_files_rewritten_per_batch": sum(files_rewritten) / len(files_rewritten),
        "avg_save_sec": sum(wall) / len(wall),
    }


def main() -> None:
    small = run(retained_buckets=4, hints=True)  # ~40k retained keys
    large = run(retained_buckets=40, hints=True)  # ~400k retained keys (10x)
    small_nh = run(retained_buckets=4, hints=False)
    large_nh = run(retained_buckets=40, hints=False)
    ratio = (large["avg_bytes_written_per_batch"]
             / small["avg_bytes_written_per_batch"])
    cpu_ratio = large["avg_save_sec"] / max(small["avg_save_sec"], 1e-9)
    print(json.dumps({
        "small": small,
        "large_10x": large,
        "write_bytes_ratio_10x_cardinality": round(ratio, 3),
        "save_cpu_ratio_10x_cardinality_hinted": round(cpu_ratio, 3),
        "save_cpu_ratio_10x_cardinality_unhinted": round(
            large_nh["avg_save_sec"] / max(small_nh["avg_save_sec"], 1e-9), 3
        ),
        "flat_if_close_to_1": ratio < 1.5,
    }, indent=2))


if __name__ == "__main__":
    main()
