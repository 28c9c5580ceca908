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
from typing import Any

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from open_finance_lakehouse_ray.functions.hashing import add_bucket_column
from open_finance_lakehouse_ray.sources.transcripts import TRANSCRIPT_SCHEMA
from open_finance_lakehouse_ray.stages.validate import conform_batch
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


def _make_bucket_apply(root: str, job_id: str):
    """Per-bucket upsert: dedup latest-wins, write one file + lineage
    record. Idempotent on resume via the record file."""

    def _apply(group: pd.DataFrame) -> pd.DataFrame:
        if len(group) == 0:
            return pd.DataFrame({"bucket": [], "rows": []})
        bucket = int(group["_bucket"].iloc[0])
        part_id = f"{bucket:06d}"
        log = TableLog(root)
        done = log.get_partition(job_id, part_id)
        if done is None:
            g = group.sort_values(
                ["conv_id", "turn_idx", "ts", "_src", "text"], kind="mergesort"
            )
            g = g.drop_duplicates(list(MERGE_KEY), keep="last")
            g = g.drop(columns=["_bucket", "_src"])
            table = conform_batch(pa.Table.from_pandas(g, preserve_index=False))
            entry = write_table_file(root, table, prefix="merge")
            done = {
                "bucket": bucket,
                "outputs": [entry.to_json()],
                "rows": entry.rows,
                "z_range": entry.z_range,
            }
            log.record_partition(job_id, part_id, done)
        return pd.DataFrame({"bucket": [bucket], "rows": [done["rows"]]})

    return _apply


def merge_into(
    root: str,
    updates: rd.Dataset | pa.Table,
    *,
    job_id: str,
    num_buckets: int | None = None,
    max_retries_on_conflict: int = 3,
) -> Snapshot:
    """Upsert ``updates`` (transcript schema) into the table at ``root``.

    On :class:`CommitConflict` (a concurrent compaction rewrote an affected
    target file between our plan and our commit) the merge REPLANS against
    the new head under an attempt-scoped job id — the updates are re-applied
    to the rewritten files; correctness holds because the merge is a pure
    function of (head state, updates).
    """
    from open_finance_lakehouse_ray.state.txlog import CommitConflict

    last: CommitConflict | None = None
    for attempt in range(max_retries_on_conflict + 1):
        attempt_job = job_id if attempt == 0 else f"{job_id}~replan{attempt}"
        try:
            return _merge_attempt(root, updates, job_id=attempt_job, num_buckets=num_buckets)
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
) -> Snapshot:
    log = TableLog(root)
    existing = log.find_commit(job_id)
    if existing is not None:
        return existing
    base_version = log.current_version()
    entries = log.files(base_version)
    num_buckets = num_buckets or default_num_buckets()

    if isinstance(updates, pa.Table):
        updates = rd.from_arrow(updates)
    updates = updates.map_batches(conform_batch, batch_format="pyarrow")

    # update-side key range (tiny aggregate — updates << table)
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

    unioned.groupby("_bucket").map_groups(
        _make_bucket_apply(root, job_id), batch_format="pandas"
    ).take_all()

    added = [
        FileEntry.from_json(o)
        for r in log.committed_partitions(job_id).values()
        for o in r["outputs"]
    ]
    return commit_via_actor_or_direct(
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
        },
    )


def dedup_exact(ds: rd.Dataset, num_buckets: int | None = None) -> rd.Dataset:
    """Standalone exact dedup on the merge key, latest-``ts`` wins — the
    in-batch flavor of the reference's
    ``row_number() OVER (PARTITION BY key ORDER BY ingested_at DESC) = 1``
    (``silver.py:64-72``). Same bucketing as MERGE; returns a Dataset."""
    num_buckets = num_buckets or default_num_buckets()
    tagged = ds.map_batches(
        lambda t: add_bucket_column(t, num_buckets), batch_format="pyarrow"
    )

    def _dedup(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["conv_id", "turn_idx", "ts", "text"], kind="mergesort")
        return g.drop_duplicates(list(MERGE_KEY), keep="last").drop(columns=["_bucket"])

    return tagged.groupby("_bucket").map_groups(_dedup, batch_format="pandas")
