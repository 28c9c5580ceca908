"""Stats-collecting Parquet file writer — the sink stage of every pipeline.

Each invocation writes ONE immutable data file under ``<root>/data/`` with a
uuid name (visible only once a manifest references it — the staged-visibility
pattern of the reference's producer, ``ofl/streaming/producer.py:96-112``)
and returns a one-row Arrow table of file metadata (path, rows, bytes,
per-column min/max stats, z-range). The driver collects these small metadata
rows and commits them as :class:`FileEntry` records — data never flows back
to the driver.

Every file is internally sorted by ``sort_by`` before writing so that task
scheduling order can never leak into scan output (the reference's
``min_by``-not-``first()`` determinism lesson, ``ofl/streaming/silver.py:39-44``).
"""

from __future__ import annotations

import json
import os
import uuid
from typing import Any

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from open_finance_lakehouse_ray.state.txlog import FileEntry

META_SCHEMA = pa.schema(
    [
        ("path", pa.string()),
        ("rows", pa.int64()),
        ("bytes", pa.int64()),
        ("stats_json", pa.string()),
        ("z_min", pa.int64()),
        ("z_max", pa.int64()),
        ("sorted_by_json", pa.string()),
        ("null_counts_json", pa.string()),
        # the written file's Arrow schema (b64 IPC): the driver unions
        # these per-file schemas at commit time instead of re-reading
        # every footer serially (round-4 review)
        ("schema_b64", pa.string()),
    ]
)


def column_stats(table: pa.Table, cols: list[str]) -> dict[str, list[Any]]:
    """Per-column [min, max]; timestamps serialized as epoch ints in the
    COLUMN'S NATIVE unit (us for transcript tables) so stats stay
    JSON-native in the manifest and compare consistently with native-unit
    range predicates. Consumers that need wall-clock seconds must scale by
    the schema's recorded unit (``registry.freshness_report`` does)."""
    out: dict[str, list[Any]] = {}
    for c in cols:
        if c not in table.column_names or table.num_rows == 0:
            continue
        col = table[c]
        if pa.types.is_timestamp(col.type):
            col = col.cast(pa.int64())
        mm = pc.min_max(col)
        lo, hi = mm["min"].as_py(), mm["max"].as_py()
        if lo is not None:
            out[c] = [lo, hi]
    return out


def write_table_file(
    root: str,
    table: pa.Table,
    *,
    stats_cols: tuple[str, ...] = ("conv_id", "turn_idx", "ts"),
    sort_by: tuple[str, ...] = ("conv_id", "turn_idx"),
    zkey_col: str | None = None,
    prefix: str = "part",
    row_group_rows: int = 128 * 1024,
    presorted: bool = False,
) -> FileEntry:
    """Sort (unless ``presorted`` upstream, e.g. after a global
    ``Dataset.sort``), stat, write one zstd Parquet file; return its
    manifest entry."""
    z_range = None
    if zkey_col is not None and zkey_col in table.column_names:
        mm = pc.min_max(table[zkey_col])
        if mm["min"].as_py() is not None:
            z_range = [int(mm["min"].as_py()), int(mm["max"].as_py())]
        if not presorted:
            sort_keys = [(zkey_col, "ascending")] + [(c, "ascending") for c in sort_by]
            table = table.sort_by(sort_keys)
        table = table.drop_columns([zkey_col])
    elif sort_by and not presorted:
        table = table.sort_by([(c, "ascending") for c in sort_by])
    stats = column_stats(table, list(stats_cols))
    # Arrow tracks null counts per column for free; a recorded 0 is the
    # null-free attestation DELETE's whole-file drop requires (min/max
    # alone cannot prove NULL-predicate rows absent)
    null_counts = {
        c: int(table[c].null_count)
        for c in stats_cols
        if c in table.column_names
    }
    rel = os.path.join("data", f"{prefix}-{uuid.uuid4().hex}.parquet")
    full = os.path.join(root, rel)
    pq.write_table(
        table, full, row_group_size=row_group_rows,
        compression="zstd", compression_level=3,
    )
    return FileEntry(
        path=rel,
        rows=table.num_rows,
        bytes=os.path.getsize(full),
        stats=stats,
        z_range=z_range,
        sorted_by=list(sort_by) if zkey_col is None else [zkey_col, *sort_by],
        null_counts=null_counts,
    )


def entry_to_meta_row(entry: FileEntry, schema_b64: str | None = None) -> pa.Table:
    return pa.table(
        {
            "path": [entry.path],
            "rows": [entry.rows],
            "bytes": [entry.bytes],
            "stats_json": [json.dumps(entry.stats)],
            "z_min": [entry.z_range[0] if entry.z_range else None],
            "z_max": [entry.z_range[1] if entry.z_range else None],
            "sorted_by_json": [json.dumps(entry.sorted_by)],
            "null_counts_json": [json.dumps(entry.null_counts)],
            "schema_b64": [schema_b64],
        },
        schema=META_SCHEMA,
    )


def meta_rows_to_entries(rows: list[dict[str, Any]]) -> list[FileEntry]:
    out = []
    for r in rows:
        z = None
        if r.get("z_min") is not None:
            z = [int(r["z_min"]), int(r["z_max"])]
        out.append(
            FileEntry(
                path=r["path"],
                rows=int(r["rows"]),
                bytes=int(r["bytes"]),
                stats=json.loads(r["stats_json"]),
                z_range=z,
                sorted_by=json.loads(r["sorted_by_json"]),
                null_counts=json.loads(r.get("null_counts_json") or "{}"),
            )
        )
    return out


def make_stats_writer(
    root: str,
    *,
    stats_cols: tuple[str, ...] = ("conv_id", "turn_idx", "ts"),
    sort_by: tuple[str, ...] = ("conv_id", "turn_idx"),
    zkey_col: str | None = None,
    prefix: str = "part",
    presorted: bool = False,
):
    """A ``map_batches`` sink: one input block -> one data file -> one
    metadata row. Use with ``batch_size=None, batch_format="pyarrow"`` so
    blocks map 1:1 to files (block size = file size, set upstream via
    ``DataContext.target_max_block_size`` / ``repartition``)."""

    def _write(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return META_SCHEMA.empty_table()
        from open_finance_lakehouse_ray.stages.arrowpool import (
            capped_arrow_threads,
        )

        # this sink always runs task-side (one block per 1-CPU task); cap
        # Arrow's pools so N concurrent file writes don't oversubscribe
        # the host N×hardware_concurrency-fold (stages/arrowpool.py)
        with capped_arrow_threads():
            entry = write_table_file(
                root,
                batch,
                stats_cols=stats_cols,
                sort_by=sort_by,
                zkey_col=zkey_col,
                prefix=prefix,
                presorted=presorted,
            )
        from open_finance_lakehouse_ray.stages.evolution import schema_to_b64

        written = batch.schema
        if zkey_col is not None and zkey_col in batch.column_names:
            written = batch.drop_columns([zkey_col]).schema
        return entry_to_meta_row(entry, schema_b64=schema_to_b64(written))

    return _write
