"""Memory-pressure probe: run a full lane under a deliberately tiny Ray
object store so data >> memory and the streaming executor must spill.
Usage: python /tmp/memtest.py maintenance|dedup <object_store_bytes>
Prints one JSON line with wall times, output checks and spill stats."""
import json
import os
import sys
import time

sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
MODE = sys.argv[1]
STORE = int(sys.argv[2])
SF_DIR = "/root/testdata/sf0.1"
NCPU = 32

import ray

ray.init(address="local", num_cpus=NCPU, include_dashboard=False,
         object_store_memory=STORE, logging_level="ERROR")
from ray.data import DataContext

DataContext.get_current().enable_progress_bars = False

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data as rd

out = {"mode": MODE, "object_store_bytes": STORE, "num_cpus": NCPU}

if MODE == "maintenance":
    import tempfile

    from open_finance_lakehouse_ray.pipelines.compact import compact
    from open_finance_lakehouse_ray.pipelines.ingest import ingest_dataset
    from open_finance_lakehouse_ray.pipelines.merge import dedup_exact, merge_into
    from open_finance_lakehouse_ray.pipelines.metrics import manifest_report
    from open_finance_lakehouse_ray.pipelines.queries import (
        _merge_updates,
        transcripts_from_lineitem,
    )
    from open_finance_lakehouse_ray.pipelines.scan import scan
    from open_finance_lakehouse_ray.pipelines.zorder import zorder

    REPLICATE = 32

    def replicate(t: pa.Table) -> pa.Table:
        idx = t.column_names.index("conv_id")
        parts = []
        for r in range(REPLICATE):
            conv = pc.binary_join_element_wise(f"r{r}-", t["conv_id"], "")
            parts.append(t.set_column(idx, "conv_id", conv))
        return pa.concat_tables(parts)

    root = tempfile.mkdtemp(prefix="oflr-memtest-")
    t0 = time.perf_counter()
    ingest_dataset(
        dedup_exact(
            transcripts_from_lineitem(SF_DIR).map_batches(
                replicate, batch_format="pyarrow"),
            num_buckets=64,
        ).repartition(128),
        root, job_id="mt-ingest",
        summary={"keys_unique": True, "key_cols": ["conv_id", "turn_idx"]},
    )
    out["ingest_sec"] = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    compact(root, job_id="mt-compact", target_bytes=64 * 1024 * 1024)
    out["compact_sec"] = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    zorder(root, job_id="mt-zorder")
    out["zorder_sec"] = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    upd = _merge_updates(scan(root, conv_id_range=("r3-", "r3-~")))
    merge_into(root, upd, job_id="mt-merge", num_buckets=64)
    out["merge_sec"] = round(time.perf_counter() - t0, 2)
    rep = manifest_report(root)
    out["rows"] = rep["rows"]
    out["files"] = rep["files"]
    out["total_sec"] = round(
        out["ingest_sec"] + out["compact_sec"] + out["zorder_sec"]
        + out["merge_sec"], 2)
    import shutil

    shutil.rmtree(root, ignore_errors=True)
elif MODE == "dedup":
    os.environ["OFLR_FORCE_SCALE_PATHS"] = "1"
    from open_finance_lakehouse_ray.pipelines.dedup import minhash_near_dup_pairs

    # the training_scale_bench corpus construction verbatim (every 3rd
    # token a per-(replica, doc) salt -> no shingles shared across
    # replicas OR across base docs; 100.5k docs, 500 seeded twins)
    base = pq.read_table(os.path.join(SF_DIR, "documents.parquet"),
                         columns=["doc_id", "text"])
    base_ids = base["doc_id"].to_pylist()
    base_texts = base["text"].to_pylist()
    rows_id, rows_tx, twin_pairs = [], [], []
    nxt = 0
    for r in range(20):
        for bid, t in zip(base_ids, base_texts):
            w = (t or "x").split()
            for j in range(0, len(w), 3):
                w[j] = f"s{r}d{bid}j{j}"
            my_id = nxt
            rows_id.append(my_id)
            rows_tx.append(" ".join(w))
            nxt += 1
            if r == 0 and bid % 10 == 0:
                w2 = list(w)
                w2[-1] = "twintail"
                rows_id.append(nxt)
                rows_tx.append(" ".join(w2))
                twin_pairs.append((my_id, nxt))
                nxt += 1
    corpus = pa.table({"doc_id": pa.array(rows_id, pa.int64()),
                       "text": pa.array(rows_tx)})
    scratch = "/tmp/oflr-memtest-docs.parquet"
    pq.write_table(corpus, scratch)
    docs = rd.read_parquet(scratch).repartition(NCPU)
    out["n_docs"] = corpus.num_rows
    t0 = time.perf_counter()
    pairs = minhash_near_dup_pairs(docs, threshold=0.6, broadcast_max_bytes=0)
    out["minhash_sec"] = round(time.perf_counter() - t0, 2)
    got = set(zip(pairs["id_a"].to_pylist(), pairs["id_b"].to_pylist()))
    out["pairs"] = len(got)
    out["subset_of_seeded"] = got <= set(twin_pairs)
    out["recall"] = round(len(got & set(twin_pairs)) / len(twin_pairs), 4)
    os.unlink(scratch)
else:
    raise SystemExit(f"unknown mode {MODE}")

# spill evidence: walk the live session dir for the object-spilling area
# (measured BEFORE shutdown — teardown may clean it)
try:
    sess = ray._private.worker._global_node.get_session_dir_path()
    spill_bytes = 0
    spill_files = 0
    for dirpath, _dirs, files in os.walk(sess):
        if "spill" not in os.path.basename(dirpath).lower():
            continue
        for f in files:
            try:
                spill_bytes += os.path.getsize(os.path.join(dirpath, f))
                spill_files += 1
            except OSError:
                pass
    out["spill_files"] = spill_files
    out["spill_bytes"] = spill_bytes
    out["session_dir"] = sess
    # the raylet logs cumulative spill totals ("Spilled N MiB, M objects")
    # even after the spilled copies are restored/freed
    import re as _re

    last = None
    for logname in ("raylet.out", "raylet.err"):
        p = os.path.join(sess, "logs", logname)
        if not os.path.exists(p):
            continue
        with open(p, errors="replace") as f:
            for ln in f:
                if "Spilled" in ln:
                    m = _re.search(r"Spilled (\d+) MiB, (\d+) objects", ln)
                    if m:
                        last = (int(m.group(1)), int(m.group(2)))
    if last:
        out["spilled_mib_cumulative"], out["spilled_objects"] = last
except Exception as e:  # noqa: BLE001
    out["spill_probe"] = f"unavailable: {e}"
ray.shutdown()
print(json.dumps(out))
