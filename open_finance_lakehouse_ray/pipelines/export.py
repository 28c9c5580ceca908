"""Gold export — publish a read-only, consumer-facing copy of a snapshot.

The reference ships gold tables out of the lake with a read-only copy plus
an ``_export_manifest`` status table consumers can trust
(``/root/reference/tools/export_gold_duckdb.py:61-118``). Same contract
here, transaction-log-aware:

- files are exported with STABLE names (``part-00000.parquet`` … in
  manifest order) so downstream references don't churn across re-exports;
- each file is hard-linked when the destination allows it (zero-copy on
  the same filesystem), else copied;
- the ``_export_manifest.json`` (source root, snapshot version, per-file
  status rows, row/byte totals) is written LAST and atomically — its
  presence IS the completion signal, so a killed export is never mistaken
  for a finished one, and re-running skips files already present with the
  right size (resumable).
"""

from __future__ import annotations

import json
import os
import shutil
import uuid
from typing import Any

from open_finance_lakehouse_ray.state.txlog import TableLog

EXPORT_MANIFEST = "_export_manifest.json"


def export_table(
    root: str,
    dest: str,
    *,
    version: int | None = None,
    link: bool = True,
) -> dict[str, Any]:
    """Export the table at ``root`` (snapshot ``version`` or head) into
    ``dest``. Returns the export manifest dict (also written to
    ``dest/_export_manifest.json``)."""
    log = TableLog(root)
    snap = log.snapshot(version)
    entries = log.files(snap.version)
    os.makedirs(dest, exist_ok=True)
    # drop the completion signal BEFORE touching any part file: a killed
    # re-export must not leave the previous manifest claiming "complete"
    # over a mixed old/new file set (same order as the partitioned export)
    old_manifest = os.path.join(dest, EXPORT_MANIFEST)
    if os.path.exists(old_manifest):
        os.unlink(old_manifest)

    files = []
    for i, e in enumerate(entries):
        name = f"part-{i:05d}.parquet"
        src = os.path.join(root, e.path)
        dst = os.path.join(dest, name)
        if os.path.exists(dst) and os.path.getsize(dst) == e.bytes:
            status = "skipped"  # resumable: already exported
        else:
            if os.path.exists(dst):
                os.unlink(dst)
            tmp = os.path.join(dest, f".tmp-{uuid.uuid4().hex}")
            if link:
                try:
                    os.link(src, tmp)
                except OSError:
                    shutil.copyfile(src, tmp)
            else:
                shutil.copyfile(src, tmp)
            os.replace(tmp, dst)
            status = "exported"
        files.append(
            {
                "file": name,
                "source": e.path,
                "rows": e.rows,
                "bytes": e.bytes,
                "status": status,
            }
        )

    # drop stale parts from a previous, larger export
    valid = {f["file"] for f in files}
    for name in os.listdir(dest):
        if name.startswith("part-") and name.endswith(".parquet") and name not in valid:
            os.unlink(os.path.join(dest, name))

    manifest = {
        "source_root": os.path.abspath(root),
        "snapshot_version": snap.version,
        "operation": snap.operation,
        "job_id": snap.job_id,
        "rows": sum(e.rows for e in entries),
        "bytes": sum(e.bytes for e in entries),
        "files": files,
        "status": "complete",
    }
    tmp = os.path.join(dest, f".tmp-{uuid.uuid4().hex}.json")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, os.path.join(dest, EXPORT_MANIFEST))
    return manifest


def read_export_manifest(dest: str) -> dict[str, Any] | None:
    try:
        with open(os.path.join(dest, EXPORT_MANIFEST)) as f:
            return json.load(f)
    except FileNotFoundError:
        return None


def export_table_partitioned(
    root: str,
    dest: str,
    *,
    by: str,
    version: int | None = None,
) -> dict[str, Any]:
    """Hive-partitioned consumer export: ``dest/<by>=<value>/part-*.parquet``
    — the partitioned-output layout a downstream training job shards on
    (one directory per key value; readers prune by directory).

    The data move is one streaming ``write_parquet(partition_cols=...)``
    pass; per-partition row counts come from the written files' parquet
    footers (O(files) metadata reads, never a second data scan) and land
    in the manifest, which is written LAST and atomically — its presence is the
    completion signal (a killed export is never mistaken for finished),
    and consumers can validate each partition against its recorded count.
    """
    from open_finance_lakehouse_ray.pipelines.scan import scan

    log = TableLog(root)
    snap = log.snapshot(version)
    ds = scan(root, version=snap.version)
    os.makedirs(dest, exist_ok=True)
    # re-export: drop the completion signal FIRST (an interrupted re-run
    # must not be mistaken for the previous finished export), then clear
    # the previous partition directories — write_parquet appends uniquely
    # named files, so stale parts would otherwise double-count rows
    # against the new manifest
    old_manifest = os.path.join(dest, EXPORT_MANIFEST)
    if os.path.exists(old_manifest):
        os.unlink(old_manifest)
    prefix = f"{by}="
    for name in os.listdir(dest):
        if name.startswith(prefix):
            shutil.rmtree(os.path.join(dest, name), ignore_errors=True)
    ds.write_parquet(dest, partition_cols=[by])
    # per-partition counts from the WRITTEN files' parquet footers — pure
    # metadata reads, instead of a second full execution of the scan
    # pipeline (the lazy ``ds`` would re-read every source file)
    import pyarrow.parquet as pq

    partitions = []
    total = 0
    for name in sorted(os.listdir(dest)):
        if not name.startswith(prefix):
            continue
        pdir = os.path.join(dest, name)
        rows = sum(
            pq.ParquetFile(os.path.join(pdir, fn)).metadata.num_rows
            for fn in os.listdir(pdir)
            if fn.endswith(".parquet")
        )
        partitions.append({by: name[len(prefix):], "rows": rows})
        total += rows

    manifest = {
        "source_root": os.path.abspath(root),
        "snapshot_version": snap.version,
        "partitioned_by": by,
        "partitions": partitions,
        "total_rows": total,
    }
    tmp = os.path.join(dest, f".tmp-{uuid.uuid4().hex}")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, os.path.join(dest, EXPORT_MANIFEST))
    return manifest
