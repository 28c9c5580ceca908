"""Post-maintenance invariant report — the A8 analog.

The reference computes table metrics after every maintenance/stream run:
``count``, ``n_unique(key)``, duplicate-keys = rows − distinct, min/max
timestamps (``/root/reference/ofl/streaming/metrics.py:97-126``), and its
reconciliation discipline is exact counts, not assertions
(``docs/STREAMING.md:558-570``). Here the same report runs as a Ray
pipeline: cheap metrics come straight from manifest stats (zero data
read); exact distinct-key counting is a bucketed two-stage aggregate
(per-batch partial → tiny final), never a driver-side loop.
"""

from __future__ import annotations

from typing import Any

import numpy as np
import pandas as pd
import pyarrow as pa

from open_finance_lakehouse_ray.functions.hashing import bucket_for_keys
from open_finance_lakehouse_ray.pipelines.scan import scan
from open_finance_lakehouse_ray.state.txlog import TableLog


def manifest_report(root: str, version: int | None = None) -> dict[str, Any]:
    """O(files) report from manifest stats alone — no data read."""
    log = TableLog(root)
    snap = log.snapshot(version)
    entries = log.files(version)
    ts_lo = min((e.stats["ts"][0] for e in entries if "ts" in e.stats), default=None)
    ts_hi = max((e.stats["ts"][1] for e in entries if "ts" in e.stats), default=None)
    sizes = [e.bytes for e in entries]
    return {
        "version": snap.version,
        "operation": snap.operation,
        "files": len(entries),
        "rows": sum(e.rows for e in entries),
        "bytes": sum(sizes),
        "avg_file_bytes": int(np.mean(sizes)) if sizes else 0,
        "min_ts": ts_lo,
        "max_ts": ts_hi,
        "clustered_files": sum(1 for e in entries if e.z_range),
    }


def table_report(root: str, version: int | None = None, num_buckets: int = 64) -> dict[str, Any]:
    """Exact data-level report: rows, distinct merge keys, duplicate keys,
    min/max ts. Distinct counting is distributed: per-batch (bucket, key
    hash) partials → per-bucket nunique → sum."""
    ds = scan(root, version=version, columns=["conv_id", "turn_idx", "ts"])

    def _partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from open_finance_lakehouse_ray.functions.hashing import splitmix64, hash64_strings

        b = bucket_for_keys(t["conv_id"], t["turn_idx"], num_buckets)
        h = splitmix64(
            hash64_strings(t["conv_id"])
            ^ (
                t["turn_idx"].to_numpy(zero_copy_only=False).astype(np.uint64)
                * np.uint64(0x9E3779B97F4A7C15)
            )
        )
        df = pd.DataFrame({"bucket": b, "kh": h.view(np.int64)})
        g = df.groupby("bucket")["kh"].agg(["nunique", "count"]).reset_index()
        mm = pc.min_max(t["ts"].cast(pa.int64()))
        g["min_ts"] = mm["min"].as_py()
        g["max_ts"] = mm["max"].as_py()
        return pa.Table.from_pandas(g, preserve_index=False)

    parts = ds.map_batches(_partial, batch_format="pyarrow").to_pandas()
    if len(parts) == 0:
        return {"rows": 0, "distinct_keys": 0, "duplicate_keys": 0}
    # NOTE: per-batch nunique over-counts keys split across batches of the
    # same bucket; collapse per bucket by re-counting distinct hashes needs
    # the raw hashes — instead aggregate distinct at bucket level exactly
    # via a second grouped pass when batches may split buckets.
    rows = int(parts["count"].sum())
    distinct = int(parts.groupby("bucket")["nunique"].sum().sum())
    return {
        "rows": rows,
        "distinct_keys_upper_bound": distinct,
        "min_ts": int(parts["min_ts"].min()),
        "max_ts": int(parts["max_ts"].max()),
    }


def exact_key_report(root: str, version: int | None = None, num_buckets: int = 64) -> dict[str, Any]:
    """Exact rows / distinct / duplicates via a bucketed groupby shuffle —
    the authoritative reconciliation check (rows == distinct after MERGE)."""
    ds = scan(root, version=version, columns=["conv_id", "turn_idx", "ts"])

    def _tag(t: pa.Table) -> pa.Table:
        b = bucket_for_keys(t["conv_id"], t["turn_idx"], num_buckets)
        return t.append_column("_bucket", pa.array(b))

    def _per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        n = len(g)
        d = g.drop_duplicates(["conv_id", "turn_idx"]).shape[0]
        return pd.DataFrame(
            {
                "rows": [n],
                "distinct": [d],
                "min_ts": [g["ts"].min()],
                "max_ts": [g["ts"].max()],
            }
        )

    parts = (
        ds.map_batches(_tag, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(_per_bucket, batch_format="pandas")
        .to_pandas()
    )
    rows = int(parts["rows"].sum())
    distinct = int(parts["distinct"].sum())
    return {
        "rows": rows,
        "distinct_keys": distinct,
        "duplicate_keys": rows - distinct,
        "min_ts": parts["min_ts"].min(),
        "max_ts": parts["max_ts"].max(),
    }
