"""MERGE INTO — hash-partitioned, latest-ts-wins upsert of late turns.

The reference's Delta MERGE on the natural key with
latest-ingestion-wins dedup (``/root/reference/ofl/transform/spark/
silver.py:64-101``: window ``row_number() ... ORDER BY ingested_at DESC``
then ``whenMatchedUpdateAll().whenNotMatchedInsertAll()``), re-expressed
Ray-Data-first (SURVEY.md §7.1 step 5):

1. **Prune**: manifest min/max ``conv_id`` stats select only target files
   whose key range can contain an update key — untouched files are
   carried by reference, never rewritten or even read.
2. **Shuffle**: both sides get a deterministic ``_bucket`` from
   ``hash(conv_id, turn_idx)`` — mixing ``turn_idx`` in IS the salt that
   breaks hot-conversation (Zipf) skew, and because the full merge key is
   hashed, one key can never span two buckets, so per-bucket dedup is
   globally correct.
3. **Apply**: ``groupby(_bucket).map_groups``: stable-sort by
   ``(conv_id, turn_idx, ts, _src, text)`` and keep the last row per key
   — max-``ts`` wins; on an exact ``ts`` tie the update side wins
   (``_src=1``), matching MERGE's whenMatchedUpdateAll; a final ``text``
   tie-break keeps the result deterministic under any scheduling order
   (never ``first()`` on a shuffle — ``ofl/streaming/silver.py:39-44``).
   Each bucket writes its own file + lineage record (bucket-granular
   resume, same checkpoint discipline as compaction).
4. **Commit**: remove affected files, add bucket outputs; conflicts with
   a concurrent compaction are detected on file-set overlap.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from open_finance_lakehouse_ray.functions.hashing import add_bucket_column
from open_finance_lakehouse_ray.stages.arrowpool import capped_task
from open_finance_lakehouse_ray.stages.validate import TRANSCRIPT_SCHEMA, conform_batch
from open_finance_lakehouse_ray.stages.writer import write_table_file
from open_finance_lakehouse_ray.state.commit_actor import commit_via_actor_or_direct
from open_finance_lakehouse_ray.state.txlog import FileEntry, Snapshot, TableLog

MERGE_KEY = ("conv_id", "turn_idx")


def default_num_buckets() -> int:
    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    return max(8, 2 * cpus)


def prune_affected(
    entries: list[FileEntry], upd_lo: str, upd_hi: str
) -> tuple[list[FileEntry], list[FileEntry]]:
    """Split target files into (affected, untouched) by conv_id range
    overlap with the update key range. A file with no conv_id stats is
    conservatively affected."""
    affected, untouched = [], []
    for e in entries:
        c = e.stats.get("conv_id")
        if c is None:
            affected.append(e)
        elif c[0] <= upd_hi and upd_lo <= c[1]:
            affected.append(e)
        else:
            untouched.append(e)
    return affected, untouched



def _merge_change_parts(
    old_df: pd.DataFrame,
    new_df: pd.DataFrame,
    schema: pa.Schema = TRANSCRIPT_SCHEMA,
) -> list[tuple[pa.Table, str]]:
    """Write-time CDC for a merge unit: diff the unit's pre-merge rows
    against its post-merge rows keyed on MERGE_KEY. Emits only REAL
    changes — a stale update that lost latest-wins produces no event.
    Returns (table, change_type) parts for ``delete._write_cdc_file``.

    Sibling logic: ``cdf._diff_partition``'s unique-key fast path does
    the same keyed outer merge + ``_eq_nansafe`` fold over pandas frames
    (interleaved with its multiset fallback, which is why it is not
    extracted); equality/dtype fixes must land in BOTH."""
    from open_finance_lakehouse_ray.pipelines.cdf import _eq_nansafe, _protect_ints
    from open_finance_lakehouse_ray.stages.validate import conform_batch

    key = list(MERGE_KEY)
    cols = [c for c in new_df.columns]
    other = [c for c in cols if c not in key]
    old_df = _protect_ints(old_df[cols].copy())
    new_df = _protect_ints(new_df[cols].copy())
    m = old_df.merge(
        new_df, on=key, how="outer", suffixes=("__o", ""), indicator=True
    )
    parts: list[tuple[pa.Table, str]] = []
    ins = m[m["_merge"] == "right_only"]
    if len(ins):
        parts.append(
            (conform_batch(
                pa.Table.from_pandas(ins[cols], preserve_index=False), schema
            ), "insert")
        )
    both = m[m["_merge"] == "both"]
    if len(both):
        eq = pd.Series(True, index=both.index)
        for c in other:
            eq &= _eq_nansafe(both[c], both[c + "__o"])
        chg = both[~eq]
        if len(chg):
            pre = chg[key + [c + "__o" for c in other]].rename(
                columns={c + "__o": c for c in other}
            )[cols]
            parts.append(
                (conform_batch(
                    pa.Table.from_pandas(pre, preserve_index=False), schema
                ), "update_preimage")
            )
            parts.append(
                (conform_batch(
                    pa.Table.from_pandas(chg[cols], preserve_index=False), schema
                ), "update_postimage")
            )
    return parts


def _make_bucket_apply(
    root: str, job_id: str, plan_base: int | None, num_buckets: int,
    record_cdc: bool = False, schema: pa.Schema = TRANSCRIPT_SCHEMA,
):
    """Per-bucket upsert: dedup latest-wins, write one file + lineage
    record. Idempotent on resume via the record file — but ONLY records
    from the same plan: same ``plan_base`` (table version the bucket's
    inputs were read at), same ``kind`` (a crashed BROADCAST attempt's
    file records share part-id shapes), same ``num_buckets`` (a record
    partitioned hash%32 reused by a hash%16 plan would silently drop the
    rows outside its bucket), and outputs still on disk (an orphan sweep
    may have removed a crashed job's uncommitted files)."""

    @capped_task
    def _apply(group: pd.DataFrame) -> pd.DataFrame:
        if len(group) == 0:
            return pd.DataFrame({"bucket": [], "rows": []})
        bucket = int(group["_bucket"].iloc[0])
        part_id = f"{bucket:06d}"
        log = TableLog(root)
        done = log.get_partition(job_id, part_id)
        if done is not None and not (
            done.get("plan_base") == plan_base
            and done.get("kind") == "bucket"
            and done.get("num_buckets") == num_buckets
            and all(
                os.path.exists(os.path.join(root, o["path"]))
                for o in done.get("outputs", [])
            )
            # when recording CDC, the record must itself CARRY the key (a
            # record from a pre-CDC crashed run would silently omit its
            # unit's changes from the commit image) and its artifact must
            # still exist
            and (not record_cdc or (
                "cdc" in done
                and (done["cdc"] is None
                     or os.path.exists(os.path.join(root, done["cdc"]["path"])))
            ))
        ):
            done = None  # stale/incompatible/swept record: recompute
        if done is None:
            from open_finance_lakehouse_ray.pipelines.delete import _write_cdc_file

            g = group.sort_values(
                ["conv_id", "turn_idx", "ts", "_src", "text"], kind="mergesort"
            )
            g = g.drop_duplicates(list(MERGE_KEY), keep="last")
            g = g.drop(columns=["_bucket", "_src"])
            table = conform_batch(
                pa.Table.from_pandas(g, preserve_index=False), schema
            )
            # g is already mergesorted by (conv_id, turn_idx, ...) and
            # drop_duplicates/conform preserve row order — skip the
            # writer's redundant O(n log n) re-sort on the hot path
            entry = write_table_file(root, table, prefix="merge", presorted=True)
            done = {
                "kind": "bucket",
                "bucket": bucket,
                "num_buckets": num_buckets,
                "outputs": [entry.to_json()],
                "rows": entry.rows,
                "z_range": entry.z_range,
                "plan_base": plan_base,
            }
            if record_cdc:
                # diff ONLY keys present on the update side — on the
                # attested-unique tables CDC records for, every other
                # bucket row is rewrite noise by construction
                ukeys = pd.MultiIndex.from_frame(
                    group.loc[group["_src"] == 1, list(MERGE_KEY)]
                )
                old = group.loc[group["_src"] == 0].drop(
                    columns=["_bucket", "_src"]
                )
                old = old[pd.MultiIndex.from_frame(old[list(MERGE_KEY)]).isin(ukeys)]
                new = g[pd.MultiIndex.from_frame(g[list(MERGE_KEY)]).isin(ukeys)]
                done["cdc"] = _write_cdc_file(
                    root, _merge_change_parts(old, new, schema)
                )
            log.record_partition(job_id, part_id, done)
        return pd.DataFrame({"bucket": [bucket], "rows": [done["rows"]]})

    return _apply


BROADCAST_MAX_BYTES = 512 * 1024 * 1024


def merge_into(
    root: str,
    updates: rd.Dataset | pa.Table,
    *,
    job_id: str,
    num_buckets: int | None = None,
    strategy: str = "auto",
    max_retries_on_conflict: int = 3,
) -> Snapshot:
    """Upsert ``updates`` (transcript schema) into the table at ``root``.

    Strategies:

    - ``"broadcast"`` — the late-arrival fast path. Updates are put in the
      object store ONCE; each affected target file is rewritten by an
      independent task (read file → latest-wins apply of the update keys
      that land in it → write); unmatched keys become one insert file in a
      driver-side phase 2. NO target-row shuffle: data volume moved =
      affected files once (map-parallel) + |updates|. Requires updates to
      fit the object store (``BROADCAST_MAX_BYTES``) and the table to hold
      unique keys (the post-MERGE invariant — each key lives in exactly
      one file, so per-file apply is globally correct).
    - ``"shuffle"`` — the general path (works on tables with duplicate
      keys and arbitrarily large updates): hash-bucket both sides on the
      full merge key and dedup per bucket.
    - ``"auto"`` — broadcast when the updates fit, else shuffle.

    On :class:`CommitConflict` (a concurrent compaction rewrote an affected
    target file between our plan and our commit) the merge REPLANS against
    the new head under an attempt-scoped job id — the updates are re-applied
    to the rewritten files; correctness holds because the merge is a pure
    function of (head state, updates).
    """
    from open_finance_lakehouse_ray.state.txlog import CommitConflict

    # replay check scans EVERY attempt-scoped id up front: a prior run may
    # have committed under ``job~replan N`` after conflicts — re-executing
    # under the bare id would apply the merge a second time against the
    # new head (resurrecting rows a later delete removed), breaking the
    # idempotency contract (round-4 review)
    _log = TableLog(root)
    for a in range(max_retries_on_conflict + 1):
        jid = job_id if a == 0 else f"{job_id}~replan{a}"
        prior = _log.find_commit(jid)
        if prior is not None:
            _log.clear_job(jid)
            return prior

    last: CommitConflict | None = None
    for attempt in range(max_retries_on_conflict + 1):
        attempt_job = job_id if attempt == 0 else f"{job_id}~replan{attempt}"
        try:
            return _merge_attempt(
                root, updates, job_id=attempt_job, num_buckets=num_buckets,
                strategy=strategy,
            )
        except CommitConflict as e:
            last = e
            continue
    raise last  # type: ignore[misc]


def _merge_attempt(
    root: str,
    updates: rd.Dataset | pa.Table,
    *,
    job_id: str,
    num_buckets: int | None = None,
    strategy: str = "auto",
) -> Snapshot:
    log = TableLog(root)
    existing = log.find_commit(job_id)
    if existing is not None:
        log.clear_job(job_id)  # replayed commit: lineage records are stale
        return existing
    base_version = log.current_version()
    entries = log.files(base_version)
    num_buckets = num_buckets or default_num_buckets()

    # MERGE must preserve the table's EFFECTIVE schema, not the fixed
    # transcript one (round-4 review: the pinned conform silently dropped
    # evolved-column values from every rewritten file). The recorded
    # schema is used UNCONDITIONALLY — not gated on schema_is_evolved —
    # because a table can carry a non-transcript recorded schema without
    # the evolved flag (e.g. ingest mode="overwrite" with homogeneous
    # extra-column blocks records schema_b64 with extras but
    # schema_evolved=False); gating would conform every rewrite to the
    # transcript schema and drop those columns (round-5 advice).
    # conform_batch is a no-op when the schema already matches.
    eff_schema = log.table_schema(base_version) or TRANSCRIPT_SCHEMA

    if isinstance(updates, pa.Table):
        updates = rd.from_arrow(updates)
    updates = updates.map_batches(
        lambda t: conform_batch(t, eff_schema), batch_format="pyarrow"
    )

    # the broadcast path's per-file apply is only globally correct when
    # each merge key lives in exactly ONE file — i.e. the table's keys are
    # unique. ``auto`` must PROVE that (via the propagated snapshot
    # attestation) before picking broadcast; on a plain-append table with
    # duplicate keys spanning files, broadcast would update every copy and
    # keep both, diverging from latest-wins MERGE. Forcing
    # ``strategy="broadcast"`` is the caller attesting uniqueness.
    if strategy == "auto" and not log.keys_unique(base_version):
        strategy = "shuffle"

    if strategy in ("auto", "broadcast"):
        # materialize the updates IN THE OBJECT STORE (blocks never touch
        # the driver heap); size/shape come from block metadata, and the
        # dedup + broadcast payload is prepared by a task whose result
        # stays in the store — the driver only ever holds tiny key stats
        mat = updates.materialize()
        nbytes = mat.size_bytes() or 0
        if strategy == "broadcast" or nbytes <= BROADCAST_MAX_BYTES:
            meta_ref, upd_ref = _prep_broadcast_updates.options(
                num_returns=2
            ).remote(mat.to_arrow_refs())
            meta = ray.get(meta_ref)
            if meta["n"] == 0:
                return log.snapshot(base_version)
            affected, _ = prune_affected(entries, meta["lo"], meta["hi"])
            return _merge_broadcast(
                log, upd_ref, affected, base_version=base_version, job_id=job_id,
                n_updates=meta["n"], schema=eff_schema,
            )
        updates = mat

    # ---- shuffle path (updates too large to broadcast, or forced) ----
    updates = updates.materialize()
    rng = updates.map_batches(
        lambda t: pa.table(
            {
                "lo": [pc.min(t["conv_id"]).as_py()],
                "hi": [pc.max(t["conv_id"]).as_py()],
                "n": [t.num_rows],
            }
        ),
        batch_format="pyarrow",
    ).take_all()
    lows = [r["lo"] for r in rng if r["lo"] is not None]
    if not lows:
        return log.snapshot(base_version)  # empty update set: no-op
    upd_lo, upd_hi = min(lows), max(r["hi"] for r in rng if r["hi"] is not None)
    n_updates = sum(r["n"] for r in rng)

    affected, _ = prune_affected(entries, upd_lo, upd_hi)
    affected_paths = {e.path for e in affected}

    def tag(src: int):
        def _t(batch: pa.Table) -> pa.Table:
            batch = add_bucket_column(batch, num_buckets)
            return batch.append_column(
                "_src", pa.array([src] * batch.num_rows, type=pa.int8())
            )

        return _t

    sides = [updates.map_batches(tag(1), batch_format="pyarrow")]
    if affected:
        target = rd.read_parquet([os.path.join(root, e.path) for e in affected])
        sides.append(target.map_batches(tag(0), batch_format="pyarrow"))
    unioned = sides[0].union(*sides[1:]) if len(sides) > 1 else sides[0]

    # recorded CDC is only well-defined when each key has ONE old row
    # (the attested-unique invariant); duplicate-key tables stay
    # unmarked and the computed net diff covers them exactly
    record_cdc = log.keys_unique(base_version)
    unioned.groupby("_bucket").map_groups(
        _make_bucket_apply(root, job_id, base_version, num_buckets,
                           record_cdc=record_cdc, schema=eff_schema),
        batch_format="pandas",
    ).take_all()

    # assemble from THIS plan's records only (a crashed prior attempt may
    # have left records for other plans; their files fall to orphan sweep)
    bucket_records = [
        r
        for r in log.committed_partitions(job_id).values()
        if r.get("plan_base") == base_version
        and r.get("kind") == "bucket"
        and r.get("num_buckets") == num_buckets
    ]
    added = [
        FileEntry.from_json(o) for r in bucket_records for o in r["outputs"]
    ]
    cdc_files = [r["cdc"] for r in bucket_records if r.get("cdc")]
    snap = commit_via_actor_or_direct(
        log,
        operation="merge",
        job_id=job_id,
        added=added,
        removed_paths=affected_paths,
        read_paths=affected_paths,
        base_version=base_version,
        summary={
            "updates": int(n_updates),
            "buckets": num_buckets,
            "files_affected": len(affected),
            "files_untouched": len(entries) - len(affected),
            "keys_unique": log.keys_unique(base_version),
            "key_cols": list(MERGE_KEY),
            **({"cdc": {"files": cdc_files}} if record_cdc else {}),
        },
    )
    log.clear_job(job_id)  # snapshot is the durable record now
    return snap


@ray.remote
def _prep_broadcast_updates(refs: list) -> tuple[dict, pd.DataFrame | None]:
    """Task-side broadcast prep: concat the update blocks, latest-wins
    dedup WITHIN the updates, return (key stats, deduped frame). Runs in a
    worker so the driver heap is never the payload ceiling (the payload
    ref is handed straight to the apply tasks)."""
    tables = [t for t in ray.get(list(refs)) if t.num_rows > 0]
    if not tables:
        return {"n": 0, "lo": None, "hi": None}, None
    t = pa.concat_tables(tables)
    updf = (
        t.to_pandas()
        .sort_values(["conv_id", "turn_idx", "ts", "text"], kind="mergesort")
        .drop_duplicates(list(MERGE_KEY), keep="last")
    )
    meta = {
        "n": int(len(updf)),
        "lo": str(updf["conv_id"].min()),
        "hi": str(updf["conv_id"].max()),
    }
    return meta, updf


def _merge_broadcast(
    log: TableLog,
    upd_ref,
    affected: list[FileEntry],
    *,
    base_version: int | None,
    job_id: str,
    n_updates: int,
    schema: pa.Schema = TRANSCRIPT_SCHEMA,
) -> Snapshot:
    """Broadcast merge: per-affected-file read-modify-write tasks + one
    insert pass for unmatched keys. See :func:`merge_into` docstring.
    ``upd_ref`` is an object-store ref to the deduped update frame."""
    import ray

    root = log.root

    plan_rows = [
        {"file_id": f"{i:06d}", "path": e.path}
        for i, e in enumerate(affected)
    ]

    @capped_task
    def apply_file(batch: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq

        from open_finance_lakehouse_ray.stages.writer import write_table_file

        upd = ray.get(upd_ref)
        out = []
        for row in batch.to_pylist():
            part_id = row["file_id"]
            done = log.get_partition(job_id, part_id)
            if done is not None and not (
                done.get("inputs") == [row["path"]]
                and done.get("plan_base") == base_version
                and done.get("kind") == "file"
                and all(
                    os.path.exists(os.path.join(root, o["path"]))
                    for o in done.get("outputs", [])
                )
                and "cdc" in done  # pre-CDC record: image would be lost
                and (done["cdc"] is None
                     or os.path.exists(os.path.join(root, done["cdc"]["path"])))
            ):
                done = None  # stale/incompatible/swept record: recompute
            if done is None:
                from open_finance_lakehouse_ray.stages.validate import (
                    conform_batch,
                )

                # conform the raw file to the table's effective schema
                # BEFORE diffing: a pre-evolution file lacks the evolved
                # columns the conformed update frame carries, and the CDC
                # diff indexes the old side by the new side's columns
                # (round-4 review repro: KeyError "['score'] not in
                # index"). Null-filled preimages match the computed-diff
                # semantics for pre-evolution rows.
                target = conform_batch(
                    pq.read_table(os.path.join(root, row["path"])), schema
                ).to_pandas()
                # update rows whose KEY exists in this file (each key lives
                # in exactly one file — table invariant)
                tkeys = pd.MultiIndex.from_frame(target[list(MERGE_KEY)])
                ukeys = pd.MultiIndex.from_frame(upd[list(MERGE_KEY)])
                hit = ukeys.isin(tkeys)
                matched = upd[hit]
                if len(matched) == 0:
                    done = {"kind": "file", "matched_keys": [], "outputs": [],
                            "rows": len(target), "cdc": None,
                            "unchanged": True, "inputs": [row["path"]],
                            "plan_base": base_version}
                else:
                    target["_src"] = np.int8(0)
                    matched = matched.copy()
                    matched["_src"] = np.int8(1)
                    g = pd.concat([target, matched], ignore_index=True).sort_values(
                        ["conv_id", "turn_idx", "ts", "_src", "text"], kind="mergesort"
                    ).drop_duplicates(list(MERGE_KEY), keep="last").drop(columns=["_src"])
                    from open_finance_lakehouse_ray.pipelines.delete import (
                        _write_cdc_file,
                    )

                    # g is already mergesorted by the writer's sort key
                    entry = write_table_file(
                        root,
                        conform_batch(
                            pa.Table.from_pandas(g, preserve_index=False), schema
                        ),
                        prefix="merge",
                        presorted=True,
                    )
                    # CDC over the matched keys only (everything else in
                    # the file is rewrite noise by construction)
                    mk = pd.MultiIndex.from_frame(matched[list(MERGE_KEY)])
                    old_m = target[tkeys.isin(mk)].drop(columns=["_src"])
                    new_m = g[pd.MultiIndex.from_frame(g[list(MERGE_KEY)]).isin(mk)]
                    cdc_rec = _write_cdc_file(
                        root, _merge_change_parts(old_m, new_m, schema)
                    )
                    done = {
                        "kind": "file",
                        "cdc": cdc_rec,
                        "matched_keys": [
                            [str(c), int(t)]
                            for c, t in zip(matched["conv_id"], matched["turn_idx"])
                        ],
                        "outputs": [entry.to_json()],
                        "rows": entry.rows,
                        "unchanged": False,
                        "inputs": [row["path"]],
                        "plan_base": base_version,
                    }
                log.record_partition(job_id, part_id, done)
            out.append({"file_id": part_id, "rows": done["rows"]})
        return pa.Table.from_pylist(out) if out else pa.table({"file_id": [], "rows": []})

    if plan_rows:
        rd.from_items(plan_rows, override_num_blocks=len(plan_rows)).map_batches(
            apply_file, batch_size=1, batch_format="pyarrow"
        ).take_all()

    # phase 2: keys matched nowhere -> the insert file (exactly once);
    # runs in a task so the update payload never lands on the driver
    ray.get(_insert_pass.remote(root, job_id, upd_ref, base_version, schema))

    records = log.committed_partitions(job_id)
    added, removed = [], set()
    cdc_files: list[dict] = []
    insert_files: list[str] = []
    for r in records.values():
        if r.get("plan_base") != base_version:
            continue  # stale record from a crashed prior plan
        if r.get("kind") not in ("file", "inserts"):
            continue  # e.g. bucket records from a crashed shuffle attempt
        if r.get("unchanged"):
            continue
        for o in r.get("outputs", []):
            added.append(FileEntry.from_json(o))
            if r.get("kind") == "inserts":
                # the insert pass's outputs contain EXACTLY the inserted
                # rows — they double as the commit's insert change image
                insert_files.append(o["path"])
        removed.update(p for p in r.get("inputs", []))
        if r.get("cdc"):
            cdc_files.append(r["cdc"])

    snap = commit_via_actor_or_direct(
        log,
        operation="merge",
        job_id=job_id,
        added=added,
        removed_paths=removed,
        read_paths={e.path for e in affected},
        base_version=base_version,
        summary={
            "updates": n_updates,
            "strategy": "broadcast",
            "files_affected": len(affected),
            "files_rewritten": len(removed),
            "keys_unique": log.keys_unique(base_version),
            "key_cols": list(MERGE_KEY),
            "cdc": {"files": cdc_files, "insert_files": insert_files},
        },
    )
    log.clear_job(job_id)  # snapshot is the durable record now
    return snap


@ray.remote
def _insert_pass(
    root: str, job_id: str, updf, plan_base: int | None,
    schema: pa.Schema = TRANSCRIPT_SCHEMA,
) -> int:
    """Write the one insert file for update keys matched by NO affected
    file (exactly once: idempotent on the 'inserts' record). Task-side so
    the deduped update frame stays in the object store (the ref passed as
    a task arg is dereferenced straight into this worker)."""
    from open_finance_lakehouse_ray.stages.validate import conform_batch
    from open_finance_lakehouse_ray.stages.writer import write_table_file

    log = TableLog(root)
    records = log.committed_partitions(job_id)
    ins_rec = records.get("inserts")
    if (
        ins_rec is not None
        and ins_rec.get("plan_base") == plan_base
        and all(
            os.path.exists(os.path.join(root, o["path"]))
            for o in ins_rec.get("outputs", [])
        )
    ):
        return int(ins_rec["rows"])
    matched_all = {
        tuple(k) for pid, r in records.items()
        if r.get("kind") == "file" and r.get("plan_base") == plan_base
        for k in r.get("matched_keys", [])
    }
    ukeys = [(str(c), int(t)) for c, t in zip(updf["conv_id"], updf["turn_idx"])]
    ins_mask = [k not in matched_all for k in ukeys]
    inserts = updf[np.array(ins_mask, dtype=bool)] if any(ins_mask) else updf.iloc[:0]
    outputs = []
    if len(inserts):
        # updf is sorted by (conv_id, turn_idx, ...) and the insert mask
        # preserves order
        entry = write_table_file(
            root,
            conform_batch(
                pa.Table.from_pandas(inserts, preserve_index=False), schema
            ),
            prefix="merge-ins",
            presorted=True,
        )
        outputs = [entry.to_json()]
    ins_rec = {"kind": "inserts", "outputs": outputs, "rows": int(len(inserts)),
               "inputs": [], "plan_base": plan_base}
    log.record_partition(job_id, "inserts", ins_rec)
    return int(ins_rec["rows"])


def _keep_last_arrow(t: pa.Table) -> pa.Table:
    """Latest-wins dedup of one table on the merge key: Arrow-native sort
    by (conv_id, turn_idx, ts, text) + a vectorized group-boundary mask
    keeping each key's LAST row. ~5× faster than the equivalent pandas
    sort_values/drop_duplicates (Arrow's string sort beats pandas' object
    mergesort) — this is the ingest lane's hottest kernel."""
    if t.num_rows == 0:
        return t
    idx = pc.sort_indices(
        t,
        sort_keys=[("conv_id", "ascending"), ("turn_idx", "ascending"),
                   ("ts", "ascending"), ("text", "ascending")],
    )
    t = t.take(idx)
    conv = t["conv_id"].to_numpy(zero_copy_only=False)
    turn = t["turn_idx"].to_numpy(zero_copy_only=False)
    last = np.ones(t.num_rows, dtype=bool)
    last[:-1] = (conv[:-1] != conv[1:]) | (turn[:-1] != turn[1:])
    return t.filter(pa.array(last))


def dedup_exact(ds: rd.Dataset, num_buckets: int | None = None) -> rd.Dataset:
    """Standalone exact dedup on the merge key, latest-``ts`` wins — the
    in-batch flavor of the reference's
    ``row_number() OVER (PARTITION BY key ORDER BY ingested_at DESC) = 1``
    (``silver.py:64-72``). Same bucketing as MERGE; returns a Dataset."""
    num_buckets = num_buckets or default_num_buckets()

    def _local(t: pa.Table) -> pa.Table:
        # map-side combiner: drop batch-local duplicates BEFORE the bucket
        # shuffle (keep-last under the same ordering is associative, so
        # local-then-global dedup equals global dedup) — shrinks the
        # all-to-all volume by the local duplicate fraction
        return add_bucket_column(_keep_last_arrow(t), num_buckets)

    tagged = ds.map_batches(_local, batch_format="pyarrow")

    def _dedup(group: pa.Table) -> pa.Table:
        return _keep_last_arrow(group).drop_columns(["_bucket"])

    # NOT capped_task-wrapped (unlike the file-I/O kernels): these are
    # pure Arrow sort kernels, and an A/B bench showed capping them is
    # neutral-to-slightly-worse (18.3-18.8 s vs 16.4-17.7 s total) — the
    # oversubscription win is specific to the zstd/footer file stages
    return tagged.groupby("_bucket").map_groups(_dedup, batch_format="pyarrow")
