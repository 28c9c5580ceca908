"""maintain() — the combined housekeeping entry point.

The reference exposes exactly this surface:
``maintain()`` = ``OPTIMIZE`` + ``ZORDER BY (series_id, date)`` +
``VACUUM ... RETAIN n HOURS`` in one call
(``/root/reference/ofl/transform/spark/silver.py:368-374``). Here:
compact → zorder (when the table is dirty enough to warrant the sort) →
checks gate → expire. Each stage is individually idempotent; the job id
namespaces the sub-jobs so a replayed maintain() no-ops stage by stage.
"""

from __future__ import annotations

from typing import Any

from open_finance_lakehouse_ray.pipelines.checks import CheckError, run_checks
from open_finance_lakehouse_ray.pipelines.compact import DEFAULT_TARGET_BYTES, compact
from open_finance_lakehouse_ray.pipelines.expire import DEFAULT_RETAIN_SECONDS, expire
from open_finance_lakehouse_ray.pipelines.metrics import manifest_report
from open_finance_lakehouse_ray.pipelines.zorder import clustering_quality, zorder
from open_finance_lakehouse_ray.state.txlog import TableLog


def maintain(
    root: str,
    *,
    job_id: str,
    target_bytes: int = DEFAULT_TARGET_BYTES,
    curve: str = "morton",
    recluster_overlap_threshold: float = 0.2,
    retain_seconds: float = DEFAULT_RETAIN_SECONDS,
    keep_last: int = 1,
    force_expire: bool = False,
    with_checks: bool = True,
    checks: dict[str, Any] | None = None,
) -> dict[str, Any]:
    """Compact + (conditionally) re-cluster + validate + expire.

    Re-clustering is skipped when per-file z-ranges are already mostly
    disjoint (``clustering_quality`` under the threshold) — a table that
    stays clustered shouldn't pay the global sort every run.

    The check gate enforces the 'violations WITHHOLD publication' contract
    end to end: snapshots published by compact/zorder are provisional until
    the suite passes — on a breach the maintenance output is WITHDRAWN by a
    time-travel :func:`~open_finance_lakehouse_ray.pipelines.restore.restore`
    back to the pre-maintenance version, then :class:`CheckError` is
    re-raised (and expire never runs, so the restored files are intact).
    """
    log = TableLog(root)
    out: dict[str, Any] = {"job_id": job_id}
    pre_version = log.current_version()

    snap = compact(root, job_id=f"{job_id}/compact", target_bytes=target_bytes)
    out["compacted"] = None if snap is None else snap.version

    entries = log.files()
    quality = clustering_quality(entries)
    unclustered = sum(1 for e in entries if e.z_range is None)
    out["cluster_overlap"] = round(quality, 3)
    out["unclustered_files"] = unclustered
    if unclustered > 0 or quality > recluster_overlap_threshold:
        zsnap = zorder(root, job_id=f"{job_id}/zorder", curve=curve)
        out["reclustered"] = None if zsnap is None else zsnap.version
    else:
        out["reclustered"] = None

    if with_checks or checks:
        try:
            out["checks"] = run_checks(root, checks=checks)
        except CheckError:
            # withdraw this run's maintenance snapshots: the table head
            # must never be left in a state the check suite rejects
            if pre_version is not None and log.current_version() != pre_version:
                from open_finance_lakehouse_ray.pipelines.restore import restore

                restore(root, to_version=pre_version, job_id=f"{job_id}/rollback")
            raise

    out["expire"] = expire(
        root,
        keep_last=keep_last,
        retain_seconds=retain_seconds,
        force=force_expire,
    )
    out["report"] = manifest_report(root)
    return out
