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


def run(retained_buckets: int, *, mode: str) -> dict:
    """Simulate steady state: each batch adds BATCH_KEYS keys in a fresh
    minute bucket and prunes buckets older than ``retained_buckets``
    (watermark semantics). Retained cardinality ~= retained_buckets *
    BATCH_KEYS.

    ``mode``:
    - ``"mirror"`` — the processor lane (``record_inserts`` +
      ``prune_keys``): save AND prune are O(batch), no state scan at all.
    - ``"hinted"`` — external caller with dirty-ts hints: one O(state)
      bucketize scan per save, hinted-clean buckets skip serialization.
    - ``"scan"`` — no hints: O(state) canonical-JSON compare per save.
    The prune+save pair is timed together: the mirror lane's win includes
    replacing the O(state) watermark dict-comprehension."""
    root = tempfile.mkdtemp(prefix="ckpt-bench-")
    ck = StreamCheckpoint(os.path.join(root, "stream.json"), bucket_us=MIN)
    state = ck.load()
    # pre-fill to steady-state cardinality (external-style bulk fill, then
    # reload so the mirror is rebuilt from the shards like a real resume)
    for b in range(retained_buckets):
        t0 = BASE + b * MIN
        for i in range(BATCH_KEYS):
            state["seen_keys"][f"click:{b}:{i}"] = t0 + i
    state["batch_id"] = 1
    ck.save(state)

    bytes_written = []
    files_rewritten = []
    wall = []
    state = ck.load()  # one load per drain, like the processor
    for step in range(8):
        before = {n: os.path.getmtime(os.path.join(ck.shard_dir, n))
                  for n in os.listdir(ck.shard_dir)}
        b = retained_buckets + step
        t0 = BASE + b * MIN
        pairs = [(f"click:{b}:{i}", t0 + i) for i in range(BATCH_KEYS)]
        watermark = BASE + (b - retained_buckets + 1) * MIN
        state["batch_id"] += 1
        t_start = time.perf_counter()
        if mode == "mirror":
            state["seen_keys"].update(pairs)
            ck.record_inserts(pairs)
            ck.prune_keys(state, watermark)
            ck.save(state, dirty_key_ts=[t for _, t in pairs],
                    dirty_window_keys=[], watermark_us=watermark)
        else:
            for k, t in pairs:
                state["seen_keys"][k] = t
            state["seen_keys"] = {
                k: t for k, t in state["seen_keys"].items() if t >= watermark
            }
            if mode == "hinted":
                ck.save(state, dirty_key_ts=[t for _, t in pairs],
                        dirty_window_keys=[], watermark_us=watermark)
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
    out: dict = {}
    ratios: dict = {}
    for mode in ("mirror", "hinted", "scan"):
        small = run(retained_buckets=4, mode=mode)  # ~40k retained keys
        large = run(retained_buckets=40, mode=mode)  # ~400k (10x)
        out[mode] = {"small": small, "large_10x": large}
        ratios[f"save_cpu_ratio_10x_{mode}"] = round(
            large["avg_save_sec"] / max(small["avg_save_sec"], 1e-9), 3
        )
    bytes_ratio = (
        out["mirror"]["large_10x"]["avg_bytes_written_per_batch"]
        / out["mirror"]["small"]["avg_bytes_written_per_batch"]
    )
    print(json.dumps({
        **out,
        "write_bytes_ratio_10x_cardinality": round(bytes_ratio, 3),
        **ratios,
        "flat_if_close_to_1": bytes_ratio < 1.5,
        "mirror_cpu_flat": ratios["save_cpu_ratio_10x_mirror"] < 1.5,
    }, indent=2))


if __name__ == "__main__":
    main()
