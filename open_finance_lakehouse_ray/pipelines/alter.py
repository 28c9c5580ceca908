"""ALTER TABLE ADD/DROP CONSTRAINT — invariants carried in the log.

Delta's table constraints (``ALTER TABLE .. ADD CONSTRAINT .. CHECK``)
re-expressed for this log: the active constraint set travels in commit
summaries (``constraints``, latest commit carrying the key wins — the
same chain-walk as the table schema), and EVERY subsequent ingest
validates incoming batches against it before any file can be committed
(``stages/contracts.py:make_invariant_validator``). Unlike the
registry's per-table contracts (an orchestration-layer gate), a log
constraint binds the table itself — any writer through
``ingest_dataset`` enforces it, config or not.

Adding a constraint validates EXISTING data first (the Delta behavior):
a streaming scan runs the same validator over the live snapshot and the
ALTER commit is withheld on any breach.
"""

from __future__ import annotations

from typing import Any

from open_finance_lakehouse_ray.state.txlog import Snapshot, TableLog


def alter_constraints(
    root: str,
    *,
    job_id: str,
    add: dict[str, dict[str, Any]] | None = None,
    drop: list[str] | None = None,
    validate_existing: bool = True,
) -> Snapshot:
    """Commit a new active constraint set (no data files change).

    ``add`` maps constraint name -> spec (``required_non_null`` /
    ``allowed_values`` / ``bounds``); ``drop`` removes by name.
    """
    from open_finance_lakehouse_ray.stages.contracts import (
        make_invariant_validator,
    )

    log = TableLog(root)
    existing = log.find_commit(job_id)
    if existing is not None:
        return existing
    current = dict(log.table_constraints())
    for name in drop or ():
        current.pop(name, None)
    new = dict(add or {})
    current.update(new)

    validated_version: int | None = None
    if validate_existing and new and log.current_version() is not None:
        from open_finance_lakehouse_ray.pipelines.scan import scan

        # validate-until-quiescent: a concurrent ingest that lands
        # between our scan and our commit was gated by the OLD
        # constraint set, so its rows were never checked — re-validate
        # any snapshot that appears before we publish. The residual
        # window (head moves during the commit call itself) is the
        # same WriteSerializable caveat Delta carries; a breach there
        # is caught by the next `run_checks`/ALTER, not silently lost.
        for _ in range(10):
            head = log.current_version()
            if head == validated_version:
                break
            ds = scan(root, version=head)
            for name in sorted(new):
                ds = ds.map_batches(
                    make_invariant_validator(name, new[name]),
                    batch_format="pyarrow",
                )
            # drain the stream; a breach raises out of the executor and
            # the ALTER below never commits
            ds.count()
            validated_version = head

    return log.commit(
        operation="alter",
        job_id=job_id,
        added=[],
        base_version=log.current_version(),
        summary={"constraints": current,
                 "cdc": {}},  # metadata-only: CDC spans ALTERs freely
    )
