"""Time the table verbs (DELETE / UPDATE / change feed) at 14.6M turns.

Builds the bench-scale table (lineitem-derived transcripts replicated
x32 with distinct conv prefixes, same as bench.py), Z-orders it so file
stats are tight, then runs each verb once and reports wall seconds plus
the work actually done (rows deleted/updated, files rewritten vs total)
— the point being that a verb's cost tracks MATCHING data and touched
FILES, not table size.

    python tools/table_verbs_bench.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
from datetime import date

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import ray  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import pyarrow.compute as pc

    from open_finance_lakehouse_ray.pipelines.cdf import change_feed
    from open_finance_lakehouse_ray.pipelines.delete import (
        delete_where,
        update_where,
    )
    from open_finance_lakehouse_ray.pipelines.ingest import ingest_dataset
    from open_finance_lakehouse_ray.pipelines.merge import dedup_exact
    from open_finance_lakehouse_ray.pipelines.queries import (
        transcripts_from_lineitem,
    )
    from open_finance_lakehouse_ray.state.txlog import TableLog

    import pyarrow as pa

    from open_finance_lakehouse_ray.pipelines.zorder import zorder

    replicate_n = int(os.environ.get("GRAFT_BENCH_REPLICATE", "32"))

    def replicate(t: pa.Table) -> pa.Table:
        if replicate_n <= 1:
            return t
        idx = t.column_names.index("conv_id")
        parts = []
        for r in range(replicate_n):
            conv = pc.binary_join_element_wise(f"r{r}-", t["conv_id"], "")
            parts.append(t.set_column(idx, "conv_id", conv))
        return pa.concat_tables(parts)

    root = tempfile.mkdtemp(prefix="verbs-bench-")
    out: dict = {"sf": sf_dir, "num_cpus": num_cpus}
    try:
        t0 = time.perf_counter()
        tx = dedup_exact(
            transcripts_from_lineitem(sf_dir).map_batches(
                replicate, batch_format="pyarrow"
            ),
            num_buckets=64,
        )
        snap = ingest_dataset(
            tx.repartition(128), root, job_id="vb-ingest",
            summary={"keys_unique": True, "key_cols": ["conv_id", "turn_idx"]},
        )
        out["ingest_sec"] = round(time.perf_counter() - t0, 3)
        out["rows"] = snap.summary.get("rows")
        t0 = time.perf_counter()
        zorder(root, job_id="vb-zorder")
        out["zorder_sec"] = round(time.perf_counter() - t0, 3)
        log = TableLog(root)
        out["files"] = len(log.files())
        # CDC cursor AFTER maintenance: the feed then reads only the
        # files the verbs below actually touch (a cursor parked before a
        # full rewrite like Z-order degrades to a full-table diff by
        # construction — every file changed)
        v0 = log.current_version()

        epoch = date(1970, 1, 1)
        day_us = 86_400_000_000
        t0 = time.perf_counter()
        s = delete_where(
            root, job_id="vb-del",
            ts_range=((date(1996, 1, 1) - epoch).days * day_us,
                      (date(1996, 6, 30) - epoch).days * day_us),
            match=lambda t: pc.equal(t["role"], "assistant"),
        )
        out["delete_sec"] = round(time.perf_counter() - t0, 3)
        out["delete"] = {k: s.summary[k] for k in
                         ("deleted_rows", "files_dropped_whole", "files_rewritten")}

        t0 = time.perf_counter()
        s = update_where(
            root, job_id="vb-upd",
            conv_id_range=("r3-conv-0000000001", "r3-conv-9999999999"),
            match=lambda t: pc.equal(t["role"], "user"),
            assign={"tool": "scrubbed"},
        )
        out["update_sec"] = round(time.perf_counter() - t0, 3)
        out["update"] = {k: s.summary[k] for k in ("updated_rows", "files_rewritten")}

        t0 = time.perf_counter()
        n = change_feed(root, from_version=v0).count()
        out["cdf_sec"] = round(time.perf_counter() - t0, 3)
        out["cdf_rows"] = int(n)

        # write-time CDC replay: recorded artifacts, zero recompute
        t0 = time.perf_counter()
        n2 = change_feed(root, from_version=v0, granularity="commits").count()
        out["cdc_recorded_sec"] = round(time.perf_counter() - t0, 3)
        out["cdc_recorded_rows"] = int(n2)
        print(json.dumps(out))
        return 0
    finally:
        shutil.rmtree(root, ignore_errors=True)
        ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
