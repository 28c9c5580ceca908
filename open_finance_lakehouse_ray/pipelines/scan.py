"""Scan: manifest-driven reads with file pruning, and the validation scan.

Scan pruning is WHY the manifest carries per-file stats and z-ranges:
a point/range lookup on ``(conv_id, turn_idx, ts)`` skips every file
whose min/max can't contain the predicate — after Z-ordering, ranges are
tight and a conversation's turns live in O(1) files instead of all of
them. The validation scan re-sorts globally by ``(conv_id, turn_idx)``
and is the basis of the per-turn text-equality invariant (maintenance
must never change query results — the reconciliation discipline of
``docs/STREAMING.md:558-570``).
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from open_finance_lakehouse_ray.state.txlog import FileEntry, TableLog


def prune_files(
    entries: list[FileEntry],
    *,
    conv_id: str | None = None,
    conv_id_range: tuple[str, str] | None = None,
    ts_range: tuple[int, int] | None = None,
) -> list[FileEntry]:
    """Keep only files whose stats can contain the predicate. Files without
    the needed stats are conservatively kept."""
    if conv_id is not None:
        conv_id_range = (conv_id, conv_id)
    out = []
    for e in entries:
        keep = True
        if conv_id_range is not None:
            c = e.stats.get("conv_id")
            if c is not None and (c[0] > conv_id_range[1] or c[1] < conv_id_range[0]):
                keep = False
        if keep and ts_range is not None:
            t = e.stats.get("ts")
            if t is not None and (t[0] > ts_range[1] or t[1] < ts_range[0]):
                keep = False
        if keep:
            out.append(e)
    return out


def scan(
    root: str,
    *,
    version: int | None = None,
    columns: list[str] | None = None,
    conv_id: str | None = None,
    conv_id_range: tuple[str, str] | None = None,
    ts_range: tuple[int, int] | None = None,
) -> rd.Dataset:
    """Dataset over the table's live files at a snapshot, manifest-pruned.
    Residual predicates are applied vectorized post-read (pruning is
    necessary-not-sufficient)."""
    log = TableLog(root)
    # evolved tables: files are heterogeneous (an appended column is
    # absent from pre-evolution files), so column pushdown would fault on
    # old files — read full, conform every batch to the snapshot schema,
    # then project. Un-evolved tables keep the pushdown fast path.
    evolved_schema = log.table_schema(version) if log.schema_is_evolved(version) else None
    entries = prune_files(
        log.files(version),
        conv_id=conv_id,
        conv_id_range=conv_id_range,
        ts_range=ts_range,
    )
    if not entries:
        if evolved_schema is None:
            from open_finance_lakehouse_ray.sources.transcripts import TRANSCRIPT_SCHEMA

            empty = TRANSCRIPT_SCHEMA.empty_table()
        else:
            empty = evolved_schema.empty_table()
        if columns:
            empty = empty.select(columns)
        return rd.from_arrow(empty)
    paths = [os.path.join(root, e.path) for e in entries]
    if evolved_schema is not None:
        from open_finance_lakehouse_ray.stages.evolution import make_conformer

        ds = rd.read_parquet(paths).map_batches(
            make_conformer(evolved_schema), batch_format="pyarrow"
        )
        if columns:
            ds = ds.select_columns(columns)
    else:
        ds = rd.read_parquet(paths, columns=columns)
    if conv_id is not None:
        ds = ds.map_batches(
            lambda t, c=conv_id: t.filter(pc.equal(t["conv_id"], c)),
            batch_format="pyarrow",
        )
    elif conv_id_range is not None:
        lo, hi = conv_id_range
        ds = ds.map_batches(
            lambda t: t.filter(
                pc.and_(
                    pc.greater_equal(t["conv_id"], lo), pc.less_equal(t["conv_id"], hi)
                )
            ),
            batch_format="pyarrow",
        )
    if ts_range is not None:
        lo_ts, hi_ts = ts_range
        ds = ds.map_batches(
            lambda t: t.filter(
                pc.and_(
                    pc.greater_equal(t["ts"].cast(pa.int64()), lo_ts),
                    pc.less_equal(t["ts"].cast(pa.int64()), hi_ts),
                )
            ),
            batch_format="pyarrow",
        )
    return ds


def validation_scan(root: str, *, version: int | None = None) -> pa.Table:
    """Full table sorted by ``(conv_id, turn_idx)`` as one Arrow table —
    the canonical order for byte-equality checks. Test/validation-scale
    only (it materializes); large-scale equality uses
    :func:`scan_equality_report`."""
    ds = scan(root, version=version).sort(["conv_id", "turn_idx"])
    batches = []
    for b in ds.iter_batches(batch_size=65536, batch_format="pyarrow"):
        batches.extend(b.to_batches() if isinstance(b, pa.Table) else [b])
    if not batches:
        from open_finance_lakehouse_ray.sources.transcripts import TRANSCRIPT_SCHEMA

        return TRANSCRIPT_SCHEMA.empty_table()
    return pa.Table.from_batches(batches)


def scan_equality_report(root_a: str, root_b: str, num_buckets: int = 32) -> dict:
    """Distributed equality check between two tables: bucket both by merge
    key, per-bucket content hash over (conv_id, turn_idx, text), compare
    bucket digests — no driver-side materialization of either table."""
    from open_finance_lakehouse_ray.functions.hashing import (
        add_bucket_column,
        content_hash_column,
    )

    def digest(root: str):
        ds = scan(root, columns=["conv_id", "turn_idx", "text"])

        def _h(t: pa.Table) -> pa.Table:
            t = add_bucket_column(t, num_buckets)
            t = content_hash_column(t, ["conv_id", "turn_idx", "text"])
            return t.select(["_bucket", "_chash"])

        hashed = ds.map_batches(_h, batch_format="pyarrow")
        import numpy as np

        def _partial(t: pa.Table) -> pa.Table:
            import pandas as pd

            df = t.to_pandas()
            g = df.groupby("_bucket")["_chash"].agg(
                xor=lambda s: int(np.bitwise_xor.reduce(s.to_numpy(dtype=np.int64))),
                n="count",
                s=lambda s: int(s.to_numpy(dtype=np.int64).sum()),
            )
            g = g.reset_index()
            return pa.Table.from_pandas(g, preserve_index=False)

        parts = hashed.map_batches(_partial, batch_format="pyarrow").to_pandas()
        agg = parts.groupby("_bucket").agg(
            xor=("xor", lambda s: int(np.bitwise_xor.reduce(s.to_numpy(dtype=np.int64)))),
            n=("n", "sum"),
            s=("s", "sum"),
        )
        return agg

    a, b = digest(root_a), digest(root_b)
    joined = a.join(b, how="outer", lsuffix="_a", rsuffix="_b")
    mismatched = joined[
        (joined["xor_a"] != joined["xor_b"])
        | (joined["n_a"] != joined["n_b"])
        | (joined["s_a"] != joined["s_b"])
    ]
    return {
        "equal": len(mismatched) == 0,
        "buckets": len(joined),
        "mismatched_buckets": mismatched.index.tolist(),
        "rows_a": int(a["n"].sum()),
        "rows_b": int(b["n"].sum()),
    }
