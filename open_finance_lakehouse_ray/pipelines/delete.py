"""DELETE WHERE — predicate delete as a pruned, file-granular rewrite.

The reference's tables live on Delta, where ``DELETE FROM`` is a core
maintenance verb (the Delta log rewrites only files containing matching
rows). This engine owns that verb: the driver plans from MANIFEST STATS
only, and every file falls into one of three classes — no data is read
for two of them:

- **untouched**: stats prove no row can match (the same overlap test as
  scan pruning, ``pipelines/scan.py:prune_files``) — not read, not
  rewritten, not even mentioned in the commit;
- **dropped whole**: stats prove EVERY row matches (file range fully
  inside the predicate ranges, and no residual predicate) — removed from
  the manifest without reading a byte, Delta's file-level delete;
- **rewritten**: the file may contain a mix — one Ray task reads it,
  filters matching rows out vectorized, writes the survivor file.

SQL NULL semantics: a row whose predicate evaluates NULL is NOT deleted
(``DELETE WHERE p`` removes only ``p IS TRUE`` rows).

Scale shape: O(files) driver metadata, rewrites fan out as a Dataset of
plan rows with per-file lineage records (resume skips completed files;
records are validated against the plan's inputs so a record from a
crashed attempt at an older head is recomputed, never committed —
``tests/test_resume_safety.py`` discipline). A delete can never create
duplicate keys, so the ``keys_unique`` attestation propagates
(``state/txlog.py:keys_unique``).
"""

from __future__ import annotations

import os
from typing import Any, Callable

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data as rd

from open_finance_lakehouse_ray.stages.arrowpool import capped_task
from open_finance_lakehouse_ray.stages.writer import write_table_file
from open_finance_lakehouse_ray.state.commit_actor import commit_via_actor_or_direct
from open_finance_lakehouse_ray.state.txlog import (
    FileEntry,
    Snapshot,
    TableLog,
)

Residual = Callable[[pa.Table], pa.BooleanArray]


def _overlaps(e: FileEntry, col: str, rng: tuple | None) -> bool:
    """Can this file contain a row inside ``rng``? Missing stats → maybe."""
    if rng is None:
        return True
    st = e.stats.get(col)
    if st is None or st[0] is None:
        return True
    return not (st[0] > rng[1] or st[1] < rng[0])


def _contained(e: FileEntry, col: str, rng: tuple | None) -> bool:
    """Do the stats PROVE every row lies inside ``rng``? Missing stats → no.

    Containment needs a recorded null count of ZERO besides min/max:
    stats ignore nulls, and a NULL-predicate row must SURVIVE the delete
    (``_match_mask`` fill_null False), so a file with (possible) nulls in
    the predicate column can never be dropped whole — it rewrites instead
    (round-4 review). Entries written before ``null_counts`` existed have
    no count recorded → unknown → conservative rewrite."""
    if rng is None:
        return True
    st = e.stats.get(col)
    if st is None or st[0] is None:
        return False
    if e.null_counts.get(col) != 0:
        return False
    return rng[0] <= st[0] and st[1] <= rng[1]


def plan_delete(
    entries: list[FileEntry],
    *,
    conv_id_range: tuple[str, str] | None,
    ts_range: tuple[int, int] | None,
    has_residual: bool,
) -> tuple[list[FileEntry], list[FileEntry]]:
    """(drop_whole, rewrite) — untouched files are simply absent. The
    predicate is a conjunction, so non-overlap on ANY given range clears
    the file, and whole-file drop needs containment on ALL of them plus
    no residual term."""
    drop, rewrite = [], []
    for e in entries:
        if not (
            _overlaps(e, "conv_id", conv_id_range) and _overlaps(e, "ts", ts_range)
        ):
            continue
        if (
            not has_residual
            and (conv_id_range is not None or ts_range is not None)
            and _contained(e, "conv_id", conv_id_range)
            and _contained(e, "ts", ts_range)
        ):
            drop.append(e)
        else:
            rewrite.append(e)
    return drop, rewrite


def _match_mask(
    t: pa.Table,
    conv_id_range: tuple[str, str] | None,
    ts_range: tuple[int, int] | None,
    match: Residual | None,
) -> pa.ChunkedArray | pa.Array:
    mask = None

    def _and(a, b):
        return b if a is None else pc.and_kleene(a, b)

    if conv_id_range is not None:
        c = t["conv_id"]
        mask = _and(
            mask,
            pc.and_(
                pc.greater_equal(c, conv_id_range[0]),
                pc.less_equal(c, conv_id_range[1]),
            ),
        )
    if ts_range is not None:
        ts = t["ts"].cast(pa.int64())
        mask = _and(
            mask,
            pc.and_(
                pc.greater_equal(ts, ts_range[0]), pc.less_equal(ts, ts_range[1])
            ),
        )
    if match is not None:
        mask = _and(mask, match(t))
    if mask is None:
        raise ValueError("delete_where needs at least one predicate term")
    # SQL DELETE: NULL predicate rows survive
    return pc.fill_null(mask, False)


def _write_cdc_file(root: str, parts: list[tuple[pa.Table, str]]) -> dict | None:
    """Write one write-time CDC artifact (rows + ``_change_type``) under
    ``data/cdc-*.parquet``. Not in any manifest — scans never see it; its
    lifecycle is tied to its commit's snapshot (``txlog.sweep_orphans`` /
    ``expire_snapshots`` read the ``cdc`` summary)."""
    import uuid

    tagged = [
        t.append_column("_change_type", pa.array([ct] * t.num_rows, pa.string()))
        for t, ct in parts
        if t.num_rows
    ]
    if not tagged:
        return None
    out = pa.concat_tables(tagged)
    rel = os.path.join("data", f"cdc-{uuid.uuid4().hex}.parquet")
    pq.write_table(
        out, os.path.join(root, rel), compression="zstd", compression_level=3
    )
    return {"path": rel, "rows": out.num_rows}


def _cdc_record_ok(root: str, rec: dict) -> bool:
    if "cdc" not in rec:
        return False  # pre-CDC record: resuming it would lose the image
    c = rec["cdc"]
    return c is None or os.path.exists(os.path.join(root, c["path"]))


def _read_conformed(root: str, path: str, schema_b64: str | None) -> pa.Table:
    """Read one data file, null-filled/cast to the snapshot schema when the
    table is schema-evolved — files written BEFORE an evolution lack the
    appended columns, and a residual predicate or an assignment that
    references one would otherwise KeyError mid-job (ADVICE r2,
    ``delete.py:396``). Un-evolved tables skip the conform entirely."""
    t = pq.read_table(os.path.join(root, path))
    if schema_b64 is not None:
        from open_finance_lakehouse_ray.stages.evolution import (
            conform_table,
            schema_from_b64,
        )

        t = conform_table(t, schema_from_b64(schema_b64))
    return t


def _make_rewrite_runner(
    root: str,
    job_id: str,
    conv_id_range,
    ts_range,
    match: Residual | None,
    schema_b64: str | None = None,
):
    @capped_task
    def _run(batch: pa.Table) -> pa.Table:
        import dataclasses
        import json as _json

        log = TableLog(root)
        out_rows = []
        for row in batch.to_pylist():
            path = row["path"]
            part_id = row["part_id"]
            done = log.get_partition(job_id, part_id)
            if (
                done is not None
                and done.get("inputs") == [path]
                and all(
                    os.path.exists(os.path.join(root, o["path"]))
                    for o in done.get("outputs", [])
                )
                and _cdc_record_ok(root, done)
            ):
                out_rows.append({"part_id": part_id, "record": _json.dumps(done)})
                continue
            t = _read_conformed(root, path, schema_b64)
            mask = _match_mask(t, conv_id_range, ts_range, match)
            kept = t.filter(pc.invert(mask))
            deleted = t.num_rows - kept.num_rows
            if deleted == 0:
                # stats overlap was necessary-not-sufficient: nothing
                # matches, so leave the original file in place — no
                # rewrite I/O and no needless conflict surface against
                # concurrent compaction/merge
                record = {"inputs": [path], "noop": True, "outputs": [],
                          "deleted": 0, "kept": int(t.num_rows), "cdc": None}
                log.record_partition(job_id, part_id, record)
                out_rows.append({"part_id": part_id, "record": _json.dumps(record)})
                continue
            outputs = []
            if kept.num_rows:
                # filter preserves the file's row order, so the input's
                # sort (and any z-clustering) survives; the recorded
                # z_range stays a valid — merely non-shrunk — bound
                entry = write_table_file(
                    root, kept, sort_by=(), prefix="delete", presorted=True
                )
                src = FileEntry.from_json(row_entry_json(row))
                entry = dataclasses.replace(
                    entry, z_range=src.z_range, sorted_by=src.sorted_by
                )
                outputs.append(entry.to_json())
            record = {
                "inputs": [path],
                "outputs": outputs,
                "deleted": int(deleted),
                "kept": int(kept.num_rows),
                "cdc": _write_cdc_file(root, [(t.filter(mask), "delete")]),
            }
            log.record_partition(job_id, part_id, record)
            out_rows.append({"part_id": part_id, "record": _json.dumps(record)})
        return pa.Table.from_pylist(out_rows)

    return _run


def row_entry_json(row: dict) -> dict:
    import json as _json

    return _json.loads(row["entry_json"])


def _evolved_schema_b64(log: TableLog, base_version: int | None) -> str | None:
    """The snapshot schema, IPC-b64-serialized for the runner closures —
    only when the table is actually evolved (un-evolved tables pay no
    conform stage)."""
    if base_version is None or not log.schema_is_evolved(base_version):
        return None
    from open_finance_lakehouse_ray.stages.evolution import schema_to_b64

    sch = log.table_schema(base_version)
    return schema_to_b64(sch) if sch is not None else None


def delete_where(
    root: str,
    *,
    job_id: str,
    conv_id_range: tuple[str, str] | None = None,
    ts_range: tuple[int, int] | None = None,
    match: Residual | None = None,
    max_retries_on_conflict: int = 3,
) -> Snapshot | None:
    """Delete every row where the conjunction of the given terms is TRUE.

    ``match`` is a residual predicate (``pa.Table -> BooleanArray``) for
    terms the manifest can't prune on; range terms both prune untouched
    files and prove whole-file drops. Returns the new snapshot, or None
    when the predicate provably touches nothing (no commit at all).
    Idempotent on ``job_id``; on :class:`CommitConflict` the job replans
    against the new head under an attempt-scoped job id (the rebase rule
    compaction uses, ``pipelines/compact.py``).
    """
    from open_finance_lakehouse_ray.state.txlog import CommitConflict

    if conv_id_range is None and ts_range is None and match is None:
        raise ValueError("delete_where needs at least one predicate term")
    log = TableLog(root)
    # replay check scans EVERY attempt-scoped id up front: a prior run may
    # have committed under ``job~replanN`` after conflicts — re-executing
    # under the bare id would apply the delete a second time against the
    # new head, breaking the idempotency contract (round-4 review)
    for a in range(max_retries_on_conflict + 1):
        jid = job_id if a == 0 else f"{job_id}~replan{a}"
        prior = log.find_commit(jid)
        if prior is not None:
            log.clear_job(jid)
            return prior
    for attempt in range(max_retries_on_conflict + 1):
        attempt_job = job_id if attempt == 0 else f"{job_id}~replan{attempt}"
        base_version = log.current_version()
        sch_b64 = _evolved_schema_b64(log, base_version)
        drop, rewrite = plan_delete(
            log.files(base_version),
            conv_id_range=conv_id_range,
            ts_range=ts_range,
            has_residual=match is not None,
        )
        if not drop and not rewrite:
            return None

        added: list[FileEntry] = []
        untouched: set[str] = set()
        cdc_files: list[dict] = []
        deleted_rows = sum(e.rows for e in drop)
        if rewrite:
            import json as _json

            plan_rows = [
                {
                    "part_id": f"{i:06d}",
                    "path": e.path,
                    "entry_json": _json.dumps(e.to_json()),
                }
                for i, e in enumerate(rewrite)
            ]
            (
                rd.from_items(plan_rows, override_num_blocks=len(plan_rows))
                .map_batches(
                    _make_rewrite_runner(
                        root, attempt_job, conv_id_range, ts_range, match,
                        schema_b64=sch_b64,
                    ),
                    batch_size=4,
                    batch_format="pyarrow",
                )
                .materialize()
            )
            parts = log.committed_partitions(attempt_job)
            for row in plan_rows:
                rec = parts.get(row["part_id"])
                if rec is None or rec.get("inputs") != [row["path"]]:
                    raise RuntimeError(
                        f"delete part {row['part_id']}: missing or stale record"
                    )
                if rec.get("noop"):
                    untouched.add(row["path"])
                else:
                    added.extend(FileEntry.from_json(o) for o in rec["outputs"])
                    deleted_rows += rec["deleted"]
                    if rec.get("cdc"):
                        cdc_files.append(rec["cdc"])
        removed = ({e.path for e in drop} | {e.path for e in rewrite}) - untouched
        if not removed and not added:
            log.clear_job(attempt_job)
            return None  # predicate matched nothing anywhere
        try:
            snap = commit_via_actor_or_direct(
                log,
                operation="delete",
                job_id=attempt_job,
                added=added,
                removed_paths=removed,
                # noop files were READ — the "nothing matches" verdict is
                # a function of their content, so a concurrent
                # content-CHANGING rewrite (merge/update) of one must
                # conflict and replan here, or rows it made match would
                # silently survive (write skew — round-4 review).
                # Compaction rewrites are content-preserving, so the
                # replan this costs in that race is rare and cheap.
                read_paths=removed | untouched,
                base_version=base_version,
                summary={
                    "deleted_rows": int(deleted_rows),
                    "files_dropped_whole": len(drop),
                    "files_rewritten": len(rewrite) - len(untouched),
                    # write-time CDC: rewritten files' deleted rows are
                    # recorded; whole-dropped files ARE their own delete
                    # image (readable until their snapshot expires)
                    "cdc": {
                        "files": cdc_files,
                        "delete_whole": [e.path for e in drop],
                    },
                },
            )
        except CommitConflict:
            if attempt == max_retries_on_conflict:
                raise
            continue
        log.clear_job(attempt_job)
        return snap
    raise AssertionError("unreachable")


def _make_update_runner(
    root: str,
    job_id: str,
    conv_id_range,
    ts_range,
    match: Residual | None,
    assign: dict,
    constraints: dict | None = None,
    schema_b64: str | None = None,
):
    @capped_task
    def _run(batch: pa.Table) -> pa.Table:
        import dataclasses
        import json as _json

        log = TableLog(root)
        out_rows = []
        for row in batch.to_pylist():
            path = row["path"]
            part_id = row["part_id"]
            done = log.get_partition(job_id, part_id)
            if (
                done is not None
                and done.get("inputs") == [path]
                and all(
                    os.path.exists(os.path.join(root, o["path"]))
                    for o in done.get("outputs", [])
                )
                and _cdc_record_ok(root, done)
            ):
                out_rows.append({"part_id": part_id, "record": _json.dumps(done)})
                continue
            t = _read_conformed(root, path, schema_b64)
            mask = _match_mask(t, conv_id_range, ts_range, match)
            n_upd = int(pc.sum(pc.cast(mask, pa.int64())).as_py() or 0)
            if n_upd == 0:
                # overlap was necessary-not-sufficient: leave the file
                record = {"inputs": [path], "noop": True, "outputs": [],
                          "updated": 0, "cdc": None}
                log.record_partition(job_id, part_id, record)
                out_rows.append({"part_id": part_id, "record": _json.dumps(record)})
                continue
            out = t
            for col, new in assign.items():
                vals = (
                    new(t)
                    if callable(new)
                    else pa.array([new] * t.num_rows, type=t[col].type)
                )
                old = out[col]
                if hasattr(vals, "cast") and not vals.type.equals(old.type):
                    vals = vals.cast(old.type)
                i = out.column_names.index(col)
                out = out.set_column(i, col, pc.if_else(mask, vals, old))
            if constraints:
                # the table's own invariants bind every writer — an
                # UPDATE must not smuggle in values an ingest would reject
                from open_finance_lakehouse_ray.stages.contracts import (
                    make_invariant_validator,
                )

                for cname in sorted(constraints):
                    make_invariant_validator(cname, constraints[cname])(out)
            entry = write_table_file(
                root, out, sort_by=(), prefix="update", presorted=True
            )
            src = FileEntry.from_json(row_entry_json(row))
            if "ts" in assign:
                # ts feeds the Z-key: the source's clustering metadata is
                # no longer true of these rows — record nothing rather
                # than a fabricated range (the file stays physically
                # ordered, just no longer attested as z-clustered)
                entry = dataclasses.replace(entry, z_range=None, sorted_by=[])
            else:
                entry = dataclasses.replace(
                    entry, z_range=src.z_range, sorted_by=src.sorted_by
                )
            record = {
                "inputs": [path],
                "outputs": [entry.to_json()],
                "updated": n_upd,
                "cdc": _write_cdc_file(
                    root,
                    [
                        (t.filter(mask), "update_preimage"),
                        (out.filter(mask), "update_postimage"),
                    ],
                ),
            }
            log.record_partition(job_id, part_id, record)
            out_rows.append({"part_id": part_id, "record": _json.dumps(record)})
        return pa.Table.from_pylist(out_rows)

    return _run


def update_where(
    root: str,
    *,
    job_id: str,
    assign: dict,
    conv_id_range: tuple[str, str] | None = None,
    ts_range: tuple[int, int] | None = None,
    match: Residual | None = None,
    max_retries_on_conflict: int = 3,
) -> Snapshot | None:
    """UPDATE ... SET — rewrite only files that can contain matching rows,
    applying ``assign`` (column -> vectorized callable ``pa.Table ->
    Array``, or a scalar constant) to rows where the predicate is TRUE
    (SQL NULL semantics: NULL-predicate rows keep their values).

    The planner is DELETE's: stats-pruned untouched files are never read,
    and an overlapping file with zero matching rows is left in place (a
    noop record — no rewrite, no conflict surface). Sort keys may not be
    assigned — an UPDATE that moved a row's key would silently break
    file ordering; MERGE is the verb for that. Assigning ``ts`` is
    allowed but clears the file's z-clustering attestation (ts feeds the
    Z-key, so the recorded range would be fabricated). Log-carried
    constraints (``pipelines/alter.py``) are validated on every rewritten
    file — an UPDATE cannot smuggle in values an ingest would reject.
    Idempotent on ``job_id``; replans on conflict.
    """
    from open_finance_lakehouse_ray.state.txlog import CommitConflict

    if not assign:
        raise ValueError("update_where needs at least one assignment")
    forbidden = {"conv_id", "turn_idx"} & set(assign)
    if forbidden:
        raise ValueError(
            f"cannot assign sort/cluster keys {sorted(forbidden)}; use MERGE"
        )
    if conv_id_range is None and ts_range is None and match is None:
        raise ValueError("update_where needs at least one predicate term")
    log = TableLog(root)
    # scan every attempt-scoped id up front — see delete_where (a prior
    # run that committed under ``job~replanN`` must replay as a no-op)
    for a in range(max_retries_on_conflict + 1):
        jid = job_id if a == 0 else f"{job_id}~replan{a}"
        prior = log.find_commit(jid)
        if prior is not None:
            log.clear_job(jid)
            return prior
    for attempt in range(max_retries_on_conflict + 1):
        attempt_job = job_id if attempt == 0 else f"{job_id}~replan{attempt}"
        base_version = log.current_version()
        sch_b64 = _evolved_schema_b64(log, base_version)
        # every overlapping file rewrites (no whole-drop class for UPDATE;
        # plan_delete's drop list is provably empty under has_residual)
        _, rewrite = plan_delete(
            log.files(base_version),
            conv_id_range=conv_id_range,
            ts_range=ts_range,
            has_residual=True,
        )
        if not rewrite:
            return None
        import json as _json

        plan_rows = [
            {
                "part_id": f"{i:06d}",
                "path": e.path,
                "entry_json": _json.dumps(e.to_json()),
            }
            for i, e in enumerate(rewrite)
        ]
        (
            rd.from_items(plan_rows, override_num_blocks=len(plan_rows))
            .map_batches(
                _make_update_runner(
                    root, attempt_job, conv_id_range, ts_range, match, assign,
                    constraints=log.table_constraints(base_version),
                    schema_b64=sch_b64,
                ),
                batch_size=4,
                batch_format="pyarrow",
            )
            .materialize()
        )
        parts = log.committed_partitions(attempt_job)
        added: list[FileEntry] = []
        untouched: set[str] = set()
        cdc_files: list[dict] = []
        updated_rows = 0
        for row in plan_rows:
            rec = parts.get(row["part_id"])
            if rec is None or rec.get("inputs") != [row["path"]]:
                raise RuntimeError(
                    f"update part {row['part_id']}: missing or stale record"
                )
            if rec.get("noop"):
                untouched.add(row["path"])
            else:
                added.extend(FileEntry.from_json(o) for o in rec["outputs"])
                updated_rows += rec["updated"]
                if rec.get("cdc"):
                    cdc_files.append(rec["cdc"])
        removed = {e.path for e in rewrite} - untouched
        if not removed and not added:
            log.clear_job(attempt_job)
            return None  # predicate matched nothing anywhere
        try:
            snap = commit_via_actor_or_direct(
                log,
                operation="update",
                job_id=attempt_job,
                added=added,
                removed_paths=removed,
                # noop files were read — see delete_where's read_paths note
                read_paths=removed | untouched,
                base_version=base_version,
                summary={
                    "updated_rows": int(updated_rows),
                    "files_rewritten": len(rewrite) - len(untouched),
                    "cdc": {"files": cdc_files},
                },
            )
        except CommitConflict:
            if attempt == max_retries_on_conflict:
                raise
            continue
        log.clear_job(attempt_job)
        return snap
    raise AssertionError("unreachable")
