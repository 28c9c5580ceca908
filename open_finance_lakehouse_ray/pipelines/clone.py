"""Shallow clone — a zero-copy writable table from a source snapshot.

Delta's ``CREATE TABLE ... SHALLOW CLONE`` analog: experimentation and
what-if maintenance on a real table without copying data. The clone gets
its own transaction log whose first snapshot references the SAME bytes
as the source snapshot, materialized as HARD LINKS under the clone's
``data/`` dir (on one filesystem a link is a metadata op — O(files),
zero data movement; data files are immutable by construction, so shared
inodes can never see a write). Because links keep inodes alive, the
source expiring/vacuuming its snapshot never corrupts the clone — the
failure mode that makes path-reference shallow clones fragile. Falls
back to copies across filesystem boundaries.

After cloning, the two tables diverge freely: each has its own commit
chain, job records, checks and retention; a clone's DELETE/UPDATE/
compact rewrites allocate new files in the clone only. ``keys_unique``
and the table schema carry over from the source snapshot.
"""

from __future__ import annotations

import os
import shutil
from typing import Any

from open_finance_lakehouse_ray.state.txlog import FileEntry, Snapshot, TableLog


def clone_table(
    src_root: str,
    dst_root: str,
    *,
    version: int | None = None,
    job_id: str = "clone",
) -> Snapshot:
    """Create a writable shallow clone of ``src_root`` at snapshot
    ``version`` (default head) under ``dst_root``. Idempotent on
    ``job_id`` within the clone's log; refuses a non-empty existing
    table at ``dst_root``."""
    src = TableLog(src_root)
    snap = src.snapshot(version)
    dst = TableLog(dst_root)
    if dst.exists():
        existing = dst.find_commit(job_id)
        if existing is not None:
            return existing
        if dst.current_version() is not None:
            raise ValueError(f"refusing to clone into non-empty table {dst_root}")
    dst.create()

    entries: list[FileEntry] = []
    for e in src.files(snap.version):
        s = os.path.join(src_root, e.path)
        d = os.path.join(dst_root, e.path)
        os.makedirs(os.path.dirname(d), exist_ok=True)
        if not os.path.exists(d):
            try:
                os.link(s, d)
            except OSError:  # cross-device: degrade to a copy
                shutil.copy2(s, d)
        entries.append(e)

    summary: dict[str, Any] = {
        "cloned_from": os.path.abspath(src_root),
        "cloned_version": snap.version,
        "keys_unique": src.keys_unique(snap.version),
    }
    cons = src.table_constraints(snap.version)
    if cons:
        # table metadata travels with the clone: the source's active
        # constraints bind the clone's ingests too
        summary["constraints"] = cons
    b64 = None
    sch = src.table_schema(snap.version)
    if sch is not None:
        from open_finance_lakehouse_ray.stages.evolution import schema_to_b64

        b64 = schema_to_b64(sch)
        summary["schema_b64"] = b64
        summary["schema_evolved"] = src.schema_is_evolved(snap.version)
    return dst.commit(
        operation="clone",
        job_id=job_id,
        added=entries,
        base_version=None,
        summary=summary,
    )
