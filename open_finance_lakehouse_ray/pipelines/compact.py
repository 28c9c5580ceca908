"""Bin-packing small-file compaction — file-granular, shuffle-free.

The reference's ``OPTIMIZE`` (Delta compaction,
``/root/reference/ofl/transform/spark/silver.py:368-374``) re-expressed
Ray-Data-first (SURVEY.md §7.1 step 2):

- The DRIVER plans bins purely from manifest stats (no data read): files
  ordered by their min sort-key so bins preserve locality, greedily packed
  to a target output size.
- Each bin is an independent, idempotent, retry-safe task: read its files
  (pyarrow, column-complete), sort, write ONE file, record a lineage
  record ``{inputs → outputs, rows, z_range}`` in the job's checkpoint
  dir. Bins are fanned out as a Dataset of plan rows
  (``from_items(bins) → map_batches``) so Ray schedules them with
  backpressure like any other stage.
- Resume: a killed run re-executes only bins with no lineage record
  (streaming-checkpoint semantics, ``docs/STREAMING.md:120-129``); the
  final commit is assembled FROM the records, so the records are the
  source of truth, and a replayed commit no-ops on ``job_id``.

At 100 TB the plan is O(files) driver-side metadata (~1e6 entries for 100MB
files) and every byte of data moves exactly once, bin-local, with no
all-to-all exchange.
"""

from __future__ import annotations

import json
import os
from typing import Any

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

from open_finance_lakehouse_ray.stages.writer import write_table_file
from open_finance_lakehouse_ray.state.commit_actor import commit_via_actor_or_direct
from open_finance_lakehouse_ray.state.txlog import FileEntry, Snapshot, TableLog

DEFAULT_TARGET_BYTES = 96 * 1024 * 1024


DEFAULT_MAX_ROWS_PER_BIN = 768 * 1024


def plan_bins(
    entries: list[FileEntry],
    *,
    target_bytes: int = DEFAULT_TARGET_BYTES,
    max_rows: int = DEFAULT_MAX_ROWS_PER_BIN,
    min_files_per_bin: int = 2,
) -> list[list[FileEntry]]:
    """Greedy locality-preserving bin-packing over manifest stats.

    Files are ordered by (z_range.min if clustered else min conv_id) so a
    bin's output file covers a tight key range; files already at/above the
    target are left alone. Only bins that actually merge ≥2 files are
    returned — compacting a lone small file is wasted I/O unless it is
    being re-sorted.
    """

    def order_key(e: FileEntry):
        if e.z_range:
            return (0, e.z_range[0], 0)
        # non-clustered files: min conv_id first (the docstring contract and
        # the files' own (conv_id, turn_idx) sort order) so bins keep
        # conv_id locality and compacted files carry tight prune stats
        c = e.stats.get("conv_id")
        t = e.stats.get("turn_idx")
        return (1, c[0] if c else "", t[0] if t else 0)

    small = sorted((e for e in entries if e.bytes < target_bytes), key=order_key)
    # z-ranges of the EXCLUDED (already-at-target) files: a bin must not
    # straddle one. Two small files that are z-adjacent only among the
    # small set can flank a large file (S1 [5,8], big B [10,20], S2
    # [25,30]); merging them yields z_range [5,30] overlapping B, so every
    # compaction cycle would WORSEN clustering and widen scan/MERGE
    # pruning sets. Close the bin at any such gap instead.
    large_ranges = sorted(
        e.z_range for e in entries
        if e.bytes >= target_bytes and e.z_range
    )

    def straddles_large(lo: int, hi: int) -> bool:
        return any(lo < lr[0] and lr[1] < hi for lr in large_ranges)

    bins: list[list[FileEntry]] = []
    cur: list[FileEntry] = []
    cur_bytes = 0
    cur_rows = 0
    for e in small:
        # cap on BYTES (output file size) and on ROWS (task memory/latency
        # — compressed bytes understate decompressed work on text-heavy
        # tables, and a bin is one task's unit of read+sort+write)
        z_break = (
            cur
            and e.z_range
            and cur[-1].z_range
            and straddles_large(cur[-1].z_range[1], e.z_range[0])
        )
        if cur and (
            cur_bytes + e.bytes > target_bytes
            or cur_rows + e.rows > max_rows
            or z_break
        ):
            bins.append(cur)
            cur, cur_bytes, cur_rows = [], 0, 0
        cur.append(e)
        cur_bytes += e.bytes
        cur_rows += e.rows
    if cur:
        bins.append(cur)
    return [b for b in bins if len(b) >= min_files_per_bin]


def _compact_bin(
    root: str,
    job_id: str,
    bin_id: str,
    paths: list[str],
    sort_by: tuple[str, ...],
    z_ranges: list[list[int] | None] | None = None,
) -> dict[str, Any]:
    """Rewrite one bin (runs inside a Ray task). Idempotent: if the lineage
    record already exists (resume) AND was built from the same inputs, the
    recorded outputs are reused. A record whose ``inputs`` differ from the
    current plan (crash → concurrent commit → replan with the same job_id)
    is stale and MUST be recomputed — resuming it would commit outputs
    derived from files no longer at the table head.

    CLUSTERING-PRESERVING path: when every input is Z-clustered and their
    z-ranges are pairwise disjoint (the invariant of a range-partitioned
    sort's output), the bin's files — already ordered by z-range min in
    the plan — concatenate into a still-perfectly-z-sorted file with NO
    re-sort, and the output keeps the merged z_range. Without this,
    compacting small clustered files would silently de-cluster the table
    and force ``maintain()`` to pay the global sort every cycle."""
    import dataclasses

    log = TableLog(root)
    done = log.get_partition(job_id, bin_id)
    if (
        done is not None
        and done.get("inputs") == paths
        and all(
            os.path.exists(os.path.join(root, o["path"]))
            for o in done.get("outputs", [])
        )
    ):
        # reuse only if the recorded outputs still exist — a crashed job's
        # uncommitted files may have been orphan-swept after the grace window
        return done
    tables = [pq.read_table(os.path.join(root, p)) for p in paths]
    if log.schema_is_evolved():
        # post-evolution bins mix pre/post-evolution files: conform each
        # to the table schema (null-fill / cast up) before the concat
        from open_finance_lakehouse_ray.stages.evolution import conform_table

        sch = log.table_schema()
        if sch is not None:
            tables = [conform_table(t, sch) for t in tables]
    table = pa.concat_tables(tables).combine_chunks()

    clustered = (
        z_ranges is not None
        and len(z_ranges) == len(paths)
        and all(z is not None for z in z_ranges)
        and all(
            # non-overlapping in plan order (adjacent sort blocks may share
            # a boundary VALUE — concatenation stays non-decreasing)
            z_ranges[i][1] <= z_ranges[i + 1][0]
            for i in range(len(z_ranges) - 1)
        )
    )
    if clustered:
        entry = write_table_file(
            root, table, sort_by=(), prefix="compact", presorted=True
        )
        entry = dataclasses.replace(
            entry,
            z_range=[int(z_ranges[0][0]), int(z_ranges[-1][1])],
            sorted_by=["_zkey", *sort_by],
        )
    else:
        entry = write_table_file(root, table, sort_by=sort_by, prefix="compact")
    record = {
        "inputs": paths,
        "outputs": [entry.to_json()],
        "rows": entry.rows,
        "z_range": entry.z_range,
    }
    log.record_partition(job_id, bin_id, record)
    return record


def compact(
    root: str,
    *,
    job_id: str,
    target_bytes: int = DEFAULT_TARGET_BYTES,
    sort_by: tuple[str, ...] = ("conv_id", "turn_idx"),
    max_retries_on_conflict: int = 3,
) -> Snapshot | None:
    """Compact the table's small files. Returns the new snapshot, or None
    when there is nothing to compact. On :class:`CommitConflict` (a
    concurrent MERGE rewrote a planned input) the job REPLANS against the
    new head — the rebase rule of SURVEY.md §7.4.1 — under a fresh
    attempt-scoped job id so stale lineage records are never reused."""
    from open_finance_lakehouse_ray.state.txlog import CommitConflict

    log = TableLog(root)
    for attempt in range(max_retries_on_conflict + 1):
        attempt_job = job_id if attempt == 0 else f"{job_id}~replan{attempt}"
        existing = log.find_commit(attempt_job)
        if existing is not None:
            log.clear_job(attempt_job)  # replayed commit: records are stale
            return existing
        base_version = log.current_version()
        entries = log.files(base_version)
        bins = plan_bins(entries, target_bytes=target_bytes)
        if not bins:
            return None

        plan_rows = [
            {
                "bin_id": f"{i:06d}",
                "paths": [e.path for e in b],
                "z_ranges_json": json.dumps([e.z_range for e in b]),
            }
            for i, b in enumerate(bins)
        ]
        records = (
            rd.from_items(plan_rows, override_num_blocks=len(plan_rows))
            .map_batches(
                _make_bin_runner(root, attempt_job, sort_by),
                batch_size=1,
                batch_format="pyarrow",
            )
            .take_all()
        )
        removed = {p for b in bins for p in (e.path for e in b)}
        # assemble the commit from THIS plan's records only: a crashed prior
        # attempt may have left records for bin ids not in this plan (or
        # built from different inputs) — those are stale debris, never
        # committed (their data files fall to the orphan sweep)
        parts = log.committed_partitions(attempt_job)
        added = []
        for row in plan_rows:
            rec = parts.get(row["bin_id"])
            if rec is None or rec.get("inputs") != row["paths"]:
                raise RuntimeError(
                    f"bin {row['bin_id']}: missing or stale lineage record"
                )
            added.extend(FileEntry.from_json(o) for o in rec["outputs"])
        if len(records) != len(bins):
            raise RuntimeError(
                f"bin runner returned {len(records)} records for {len(bins)} bins"
            )
        try:
            snap = commit_via_actor_or_direct(
                log,
                operation="compact",
                job_id=attempt_job,
                added=added,
                removed_paths=removed,
                read_paths=removed,
                base_version=base_version,
                summary={
                    "cdc": {},  # logical no-change: empty CDC marker
                    "bins": len(bins),
                    "files_in": len(removed),
                    "files_out": len(added),
                    "keys_unique": log.keys_unique(base_version),
                },
            )
            # the snapshot is now the durable record; stale per-partition
            # records must not survive to be "resumed" by a future job that
            # reuses this job id after the snapshot expires
            log.clear_job(attempt_job)
            return snap
        except CommitConflict:
            if attempt == max_retries_on_conflict:
                raise
            continue
    return None


def _make_bin_runner(root: str, job_id: str, sort_by: tuple[str, ...]):
    def _run(batch: pa.Table) -> pa.Table:
        from open_finance_lakehouse_ray.stages.arrowpool import (
            capped_arrow_threads,
        )

        out = []
        # one bin = one task = one CPU: cap Arrow's pools so 32 concurrent
        # bins don't run ~1000 threads (see stages/arrowpool.py — the
        # round-4 compact variance finding)
        with capped_arrow_threads():
            for row in batch.to_pylist():
                rec = _compact_bin(
                    root, job_id, row["bin_id"], row["paths"], sort_by,
                    z_ranges=json.loads(row["z_ranges_json"]),
                )
                out.append({"bin_id": row["bin_id"], "rows": rec["rows"]})
        return pa.Table.from_pylist(out)

    return _run
