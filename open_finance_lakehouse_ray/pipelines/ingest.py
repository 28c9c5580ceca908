"""Ingest: land a Dataset into a transcript table with a real commit.

The end-to-end slice of SURVEY.md §7.1 step 1 — the Ray analog of
``land_bronze`` (``/root/reference/ofl/ingestion/landing.py:36-85``):
contract gate → stats-collecting file writes → snapshot commit. Lineage
lives in the commit record (job_id = the reference's per-run ``load_id``,
``landing.py:45``) rather than per-row columns.
"""

from __future__ import annotations

from typing import Any

import ray.data as rd

from open_finance_lakehouse_ray.stages.validate import validate_batch
from open_finance_lakehouse_ray.stages.writer import make_stats_writer, meta_rows_to_entries
from open_finance_lakehouse_ray.state.commit_actor import commit_via_actor_or_direct
from open_finance_lakehouse_ray.state.txlog import Snapshot, TableLog


def ingest_dataset(
    ds: rd.Dataset,
    root: str,
    *,
    job_id: str,
    mode: str = "append",
    validate: bool = True,
    sort_within_files: tuple[str, ...] = ("conv_id", "turn_idx"),
    summary: dict[str, Any] | None = None,
    merge_schema: bool = False,
) -> Snapshot:
    """Write ``ds`` into the table at ``root`` and commit one snapshot.

    ``mode="append"`` adds files; ``mode="overwrite"`` replaces the live
    file set (the reference's per-source landing modes,
    ``landing.py:38-41``). Streaming end to end: blocks flow from the
    source through validation into per-block file writes; only tiny
    metadata rows ever reach the driver.

    ``merge_schema=True`` is Delta's ``mergeSchema``: the incoming file
    schema unions-by-name into the table schema (widening casts only,
    ``stages/evolution.py``); existing files are NOT rewritten — the
    scan conforms old batches (null-fill / cast up) at read time. An
    incompatible change raises ``SchemaEvolutionError`` BEFORE the
    commit. ``mode="overwrite"`` resets the schema to the incoming one
    (the ``overwriteSchema`` analog). Without ``merge_schema``, an
    append that would change a recorded schema is rejected.
    """
    if mode not in ("append", "overwrite"):
        # a typo'd mode must not silently degrade to append (round-4
        # review: every branch below compares literally)
        raise ValueError(f"unknown mode={mode!r} (append|overwrite)")
    log = TableLog(root)
    log.create()
    existing = log.find_commit(job_id)
    if existing is not None:
        return existing  # idempotent replay before any work

    if validate:
        if merge_schema:
            # validation conforms to the fixed transcript schema, which
            # would silently DROP the very columns merge_schema exists to
            # evolve (round-4 review) — validate the core, carry extras
            def validate_keep_extras(t):
                core = validate_batch(t)
                for c in t.column_names:
                    if c not in core.column_names:
                        core = core.append_column(c, t[c])
                return core

            ds = ds.map_batches(validate_keep_extras, batch_format="pyarrow")
        else:
            ds = ds.map_batches(validate_batch, batch_format="pyarrow")
    # log-carried constraints bind EVERY writer, validate flag or not —
    # the table's own invariants, not the orchestration layer's
    constraints = log.table_constraints()
    if constraints:
        from open_finance_lakehouse_ray.stages.contracts import (
            make_invariant_validator,
        )

        for cname in sorted(constraints):
            ds = ds.map_batches(
                make_invariant_validator(cname, constraints[cname]),
                batch_format="pyarrow",
            )
    meta = ds.map_batches(
        make_stats_writer(root, sort_by=sort_within_files, prefix="ingest"),
        batch_size=None,
        batch_format="pyarrow",
    )
    try:
        meta_rows = meta.take_all()
    except Exception as e:  # unwrap a contract breach from Ray's task-error
        from open_finance_lakehouse_ray.stages.validate import ContractViolation

        if isinstance(e, ContractViolation):
            raise
        # Ray Data wraps user exceptions (RayTaskError -> UserCodeException)
        # and keeps the original only in the rendered traceback — surface
        # the breach as the typed error callers gate on
        msg = str(e)
        if "ContractViolation" in msg:
            reason = next(
                (ln.strip() for ln in msg.splitlines() if "ContractViolation" in ln),
                "contract violation",
            )
            raise ContractViolation(reason) from e
        raise
    entries = meta_rows_to_entries(meta_rows)

    removed: set[str] = set()
    base_version = log.current_version()
    if mode == "overwrite" and base_version is not None:
        removed = {e.path for e in log.files(base_version)}

    schema_summary: dict[str, Any] = {}
    if entries:
        import os

        import pyarrow.parquet as pq

        from open_finance_lakehouse_ray.stages.evolution import (
            SchemaEvolutionError,
            evolve_schema,
            schema_to_b64,
        )

        # per-file schemas travel in the writer's meta rows — the driver
        # unions them here with ZERO extra I/O (round-4 review: one
        # footer proves nothing for heterogeneous blocks, and a serial
        # all-footer sweep costs N round trips; note the keep-extras
        # validation path can itself produce heterogeneous files, so
        # this check runs for EVERY ingest, validated or not)
        from open_finance_lakehouse_ray.stages.evolution import schema_from_b64

        b64s = sorted(
            {r["schema_b64"] for r in meta_rows if r.get("schema_b64")}
        )
        hetero = len(b64s) > 1
        if hetero and not merge_schema:
            raise SchemaEvolutionError(
                f"ingest blocks carry {len(b64s)} differing schemas; pass "
                "merge_schema=True to union them or validate=True to "
                "conform them"
            )
        if b64s:
            incoming = schema_from_b64(b64s[0])
            for b in b64s[1:]:
                incoming = evolve_schema(incoming, schema_from_b64(b))
        else:  # meta rows from a pre-schema writer: one footer read
            incoming = pq.read_schema(os.path.join(root, entries[0].path))
        current = log.table_schema(base_version)
        if mode == "overwrite" or current is None:
            schema_summary["schema_b64"] = schema_to_b64(incoming)
            if mode == "overwrite":
                # the live file set is homogeneous again (unless THIS
                # ingest's own blocks differ) — shadow any earlier evolved
                # flag so scans regain column pushdown
                schema_summary["schema_evolved"] = hetero
            elif hetero:
                # heterogeneous blocks in a fresh table: scans must conform
                schema_summary["schema_evolved"] = True
        elif not current.equals(incoming):
            if not merge_schema:
                raise SchemaEvolutionError(
                    f"append schema differs from table schema at {root} "
                    "(pass merge_schema=True to evolve)"
                )
            unified = evolve_schema(current, incoming)
            schema_summary["schema_b64"] = schema_to_b64(unified)
            schema_summary["schema_evolved"] = True
        elif hetero:
            schema_summary["schema_evolved"] = True

    return commit_via_actor_or_direct(
        log,
        operation="ingest",
        job_id=job_id,
        added=entries,
        removed_paths=removed,
        read_paths=set(),
        base_version=base_version,
        summary={
            "mode": mode,
            # write-time CDC: an APPEND's change image is its own added
            # files (derived from the snapshot's added paths — no extra
            # IO, nothing extra retained). An OVERWRITE is deliberately
            # unmarked: recording it would pin every replaced file for
            # the commit's whole retention; the computed net diff covers
            # it exactly while the old snapshot lives.
            **({"cdc": {"derive": "commit-paths"}} if mode == "append" else {}),
            **schema_summary,
            **(summary or {}),
        },
        # REPLACE semantics under concurrency: re-resolve the removed set
        # at commit time so an append landing between plan and commit is
        # serialized before the overwrite, not left alive beside it
        overwrite_live=(mode == "overwrite"),
    )
