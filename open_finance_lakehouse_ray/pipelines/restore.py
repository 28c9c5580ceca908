"""RESTORE VERSION AS OF — time-travel rollback as a forward commit.

The analog of Delta's ``RESTORE`` (the reference's tables keep history for
exactly this recovery story — ``/root/reference/ofl/platform/io.py:14-31``
stores every table as versioned Delta): a NEW snapshot whose live file set
equals a previous version's. Metadata-only — no data file is read, copied
or rewritten; files re-enter the table by manifest reference, which is why
restore is only valid while the target version's files are still retained
(the expire retention floor protects exactly this window).

Used by :func:`~open_finance_lakehouse_ray.pipelines.maintain.maintain` to
withdraw maintenance output when the post-maintenance check suite finds a
violation: the gate's contract is that a breach never leaves the breached
state as the table head.
"""

from __future__ import annotations

from open_finance_lakehouse_ray.state.commit_actor import commit_via_actor_or_direct
from open_finance_lakehouse_ray.state.txlog import Snapshot, TableLog


def restore(root: str, *, to_version: int, job_id: str) -> Snapshot:
    """Commit a snapshot that restores the file set of ``to_version``.

    Idempotent on ``job_id``. Raises ``StaleTableError`` if the target
    version (or any of its manifests) has been expired — a restore past
    the retention window is impossible by design.
    """
    log = TableLog(root)
    existing = log.find_commit(job_id)
    if existing is not None:
        return existing
    head = log.current_version()
    target_key_cols = log.table_key_cols(to_version)
    target_schema = log.table_schema(to_version)
    target_evolved = log.schema_is_evolved(to_version)
    target = list(log.files(to_version))
    # overwrite_live: the removed set re-resolves to EVERYTHING live at
    # the head each commit attempt, so a concurrent append/compaction
    # landing between the head read and the CAS is serialized BEFORE the
    # restore instead of silently surviving beside the resurrected files
    # (a concurrent compaction's rewrite coexisting with the restored
    # originals would duplicate every row it rewrote — round-4 review).
    # Shared paths are removed from the carried manifests and re-added in
    # the restore's own manifest; the final live set is exactly the
    # target's, which is the documented postcondition.
    return commit_via_actor_or_direct(
        log,
        operation="restore",
        job_id=job_id,
        added=target,
        removed_paths=set(),
        read_paths=set(),
        base_version=head,
        overwrite_live=True,
        summary={
            "restored_to": to_version,
            "keys_unique": log.keys_unique(to_version),
            # mirror the target's key identity like keys_unique: the live
            # data IS to_version's, so consumers must not resolve key_cols
            # from commits between to_version and head (a re-keying
            # overwrite there would win the walk) — review finding, round 4.
            # When the target has no identity the walker's restore barrier
            # (txlog.table_key_cols) keeps the answer None.
            **(
                {"key_cols": list(target_key_cols)}
                if target_key_cols is not None
                else {}
            ),
            # mirror the target's SCHEMA identity too: without it the
            # schema walkers resolve the bypassed commits' evolved schema
            # and a restored pre-evolution table surfaces columns its
            # version never had (round-4 review). Like key_cols, the
            # walkers treat a restore without a record as a barrier.
            **(
                {
                    "schema_b64": _schema_to_b64(target_schema),
                    "schema_evolved": bool(target_evolved),
                }
                if target_schema is not None
                else {}
            ),
        },
    )


def _schema_to_b64(schema):
    from open_finance_lakehouse_ray.stages.evolution import schema_to_b64

    return schema_to_b64(schema)
