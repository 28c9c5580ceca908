"""CommitActor — a single Ray actor that serializes a job's commits and
accumulates its metrics.

The reference serializes writers by scheduling (silver is a singleton DAG,
``orchestration/airflow/dags/ofl_dags.py:176``) and leans on the Delta log
for transactional appends. Here the on-disk log (:class:`TableLog`) already
gives CAS + conflict detection across *processes*; the actor adds (a) a
single serialization point within one job run so concurrent Ray tasks never
race on commit retries, and (b) a metrics sink (the analog of the
reference's per-run DQ/freshness gauges, ``ofl/platform/metrics.py:74-120``)
flushed into the snapshot summary at commit time.
"""

from __future__ import annotations

from typing import Any

import ray

from .txlog import FileEntry, Snapshot, TableLog


@ray.remote(num_cpus=0)
class CommitActor:
    def __init__(self, root: str):
        self.log = TableLog(root)
        self.metrics: dict[str, float] = {}

    def incr(self, name: str, value: float = 1.0) -> None:
        self.metrics[name] = self.metrics.get(name, 0.0) + value

    def get_metrics(self) -> dict[str, float]:
        return dict(self.metrics)

    def commit(
        self,
        *,
        operation: str,
        job_id: str,
        added: list[dict[str, Any]],
        removed_paths: list[str] | None = None,
        read_paths: list[str] | None = None,
        base_version: int | None = None,
        summary: dict[str, Any] | None = None,
        overwrite_live: bool = False,
    ) -> dict[str, Any]:
        snap = self.log.commit(
            operation=operation,
            job_id=job_id,
            added=[FileEntry.from_json(e) for e in added],
            removed_paths=set(removed_paths or ()),
            read_paths=set(read_paths or ()),
            base_version=base_version,
            summary={**(summary or {}), **({"metrics": self.metrics} if self.metrics else {})},
            overwrite_live=overwrite_live,
        )
        return snap.to_json()


_ACTOR_CACHE: dict[str, "ray.actor.ActorHandle"] = {}


def _get_actor(root: str):
    a = _ACTOR_CACHE.get(root)
    if a is None:
        a = CommitActor.remote(root)
        _ACTOR_CACHE[root] = a
    return a


def commit_via_actor_or_direct(
    log: TableLog,
    *,
    operation: str,
    job_id: str,
    added: list[FileEntry],
    removed_paths: set[str] | None = None,
    read_paths: set[str] | None = None,
    base_version: int | None = None,
    summary: dict[str, Any] | None = None,
    overwrite_live: bool = False,
) -> Snapshot:
    """Commit through a short-lived CommitActor when a Ray session exists
    (the actor-pool bookkeeping stage of the north rule), else directly."""
    if ray.is_initialized():
        from .txlog import CommitConflict

        actor = _get_actor(log.root)
        try:
            d = ray.get(
                actor.commit.remote(
                    operation=operation,
                    job_id=job_id,
                    added=[e.to_json() for e in added],
                    removed_paths=sorted(removed_paths or ()),
                    read_paths=sorted(read_paths or ()),
                    base_version=base_version,
                    summary=summary,
                    overwrite_live=overwrite_live,
                )
            )
            return Snapshot.from_json(d)
        except ray.exceptions.RayTaskError as e:  # unwrap the actor's exception
            if isinstance(e.cause, CommitConflict):
                raise e.cause from None
            raise
        except ray.exceptions.RayActorError:
            _ACTOR_CACHE.pop(log.root, None)  # died actor: fall back direct
            return log.commit(
                operation=operation, job_id=job_id, added=added,
                removed_paths=removed_paths, read_paths=read_paths,
                base_version=base_version, summary=summary,
            )
    return log.commit(
        operation=operation,
        job_id=job_id,
        added=added,
        removed_paths=removed_paths,
        read_paths=read_paths,
        base_version=base_version,
        summary=summary,
    )
