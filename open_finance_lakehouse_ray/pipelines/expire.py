"""Snapshot expire + orphan sweep — the VACUUM of this engine.

Thin pipeline wrapper over :meth:`TableLog.expire_snapshots`
(reference-counted liveness) with the safety posture of Delta's
``VACUUM ... RETAIN n HOURS`` (``/root/reference/ofl/transform/spark/
silver.py:372-373``): the current snapshot is always retained, a
retention floor protects concurrent readers, and overriding the floor is
an explicit opt-in. Driver/metadata-only — no data shuffle (SURVEY.md
§7.3)."""

from __future__ import annotations

from typing import Any

from open_finance_lakehouse_ray.state.txlog import TableLog

DEFAULT_RETAIN_SECONDS = 7 * 24 * 3600.0


def expire(
    root: str,
    *,
    keep_last: int = 1,
    retain_seconds: float = DEFAULT_RETAIN_SECONDS,
    force: bool = False,
    sweep_orphans: bool = True,
    orphan_grace_seconds: float = 3600.0,
    force_orphans: bool = False,
    dry_run: bool = False,
) -> dict[str, Any]:
    """Expire snapshots older than the retention floor; optionally sweep
    never-committed orphan data files. ``force=True`` drops the SNAPSHOT
    retention floor to zero (the explicit VACUUM guard override) but keeps
    the orphan grace window — files just written by an in-flight,
    not-yet-committed compact/merge must survive a concurrent force-expire.
    Zeroing the orphan grace is its own opt-in, ``force_orphans=True``."""
    log = TableLog(root)
    retain = 0.0 if force else retain_seconds
    result = log.expire_snapshots(
        keep_last=keep_last, retain_seconds=retain, dry_run=dry_run
    )
    result["orphans_swept"] = (
        log.sweep_orphans(
            grace_seconds=0.0 if force_orphans else orphan_grace_seconds,
            dry_run=dry_run,
        )
        if sweep_orphans
        else []
    )
    result["live_version"] = log.current_version()
    return result
