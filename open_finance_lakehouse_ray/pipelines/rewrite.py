"""Manifest rewrite: compact many small manifests into few, backfilling
per-file min/max stats from Parquet footers where missing.

The third core maintenance operator of the north rule (the reference
delegates this bookkeeping to the Delta log; we own it). No data moves:
stats backfill reads only file FOOTERS, fanned out as a Dataset of file
paths → ``map_batches`` (metadata-scale work, parallel, no shuffle).
Committing a rewrite removes nothing and adds nothing — it swaps the
manifest *list* only, so it can never conflict with a concurrent MERGE
or compaction on file sets.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

from open_finance_lakehouse_ray.state.txlog import FileEntry, Snapshot, TableLog

STATS_COLS = ("conv_id", "turn_idx", "ts")


def footer_stats(path: str, cols=STATS_COLS) -> dict[str, list]:
    """Per-file min/max from Parquet row-group metadata (footer only)."""
    md = pq.read_metadata(path)
    schema = md.schema.to_arrow_schema()
    idx = {name: i for i, name in enumerate(md.schema.names)}
    out: dict[str, list] = {}
    for c in cols:
        if c not in idx:
            continue
        lo = hi = None
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx[c]).statistics
            if st is None or not st.has_min_max:
                lo = hi = None
                break
            mn, mx = st.min, st.max
            lo = mn if lo is None or mn < lo else lo
            hi = mx if hi is None or mx > hi else hi
        if lo is None:
            continue
        f = schema.field(c)
        if pa.types.is_timestamp(f.type):
            lo = int(pa.scalar(lo, type=f.type).cast(pa.int64()).as_py())
            hi = int(pa.scalar(hi, type=f.type).cast(pa.int64()).as_py())
        out[c] = [lo, hi]
    return out


def footer_null_counts(path: str, cols=STATS_COLS) -> dict[str, int]:
    """Per-file null counts from row-group metadata. A column whose row
    groups don't all record one gets the sentinel ``-1`` (checked, but
    unknowable — never a whole-drop proof, and never re-read on the next
    backfill run; round-4 review). A 0 is the null-free attestation
    DELETE's whole-file drop requires."""
    md = pq.read_metadata(path)
    idx = {name: i for i, name in enumerate(md.schema.names)}
    out: dict[str, int] = {}
    for c in cols:
        if c not in idx:
            continue
        total = 0
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx[c]).statistics
            if st is None or not st.has_null_count:
                total = -1
                break
            total += int(st.null_count)
        out[c] = total
    return out


def rewrite_manifests(
    root: str,
    *,
    job_id: str,
    backfill_stats: bool = True,
    target_entries_per_manifest: int = 100_000,
) -> Snapshot:
    """Rebuild the manifest list for the current snapshot: backfill missing
    stats (parallel footer scan) and re-chunk entries into
    ``target_entries_per_manifest``-sized manifests."""
    log = TableLog(root)
    existing = log.find_commit(job_id)
    if existing is not None:
        return existing
    base_version = log.current_version()
    entries = log.files(base_version)

    missing = [
        e for e in entries
        if backfill_stats and (not e.stats or not e.null_counts)
    ]
    filled: dict[str, dict] = {}
    filled_nc: dict[str, dict] = {}
    if missing:
        rows = (
            rd.from_items(
                [{"path": e.path} for e in missing],
                override_num_blocks=max(1, min(len(missing), 64)),
            )
            .map_batches(
                _make_footer_reader(root), batch_format="pyarrow"
            )
            .take_all()
        )
        filled = {r["path"]: json.loads(r["stats_json"]) for r in rows}
        filled_nc = {r["path"]: json.loads(r["nulls_json"]) for r in rows}

    new_entries = [
        FileEntry(
            path=e.path,
            rows=e.rows,
            bytes=e.bytes,
            stats=e.stats or filled.get(e.path, {}),
            z_range=e.z_range,
            sorted_by=e.sorted_by,
            null_counts=e.null_counts or filled_nc.get(e.path, {}),
        )
        for e in entries
    ]

    # write fresh manifests in chunks, then publish a snapshot that swaps
    # the manifest list without touching the data file set
    chunks = [
        new_entries[i : i + target_entries_per_manifest]
        for i in range(0, len(new_entries), target_entries_per_manifest)
    ] or [[]]
    manifest_names = [log.write_manifest(c) for c in chunks if c]

    import time

    base_snap = log.snapshot(base_version)
    new_version = base_version + 1
    from open_finance_lakehouse_ray.state.txlog import Snapshot as Snap
    from open_finance_lakehouse_ray.state.txlog import _atomic_create_json

    snap = Snap(
        version=new_version,
        parent=base_version,
        operation="rewrite-manifests",
        job_id=job_id,
        manifests=manifest_names,
        removed_paths=[],
        added_paths=[],
        summary={
            "cdc": {},  # logical no-change: empty CDC marker
            "files": len(new_entries),
            "rows": sum(e.rows for e in new_entries),
            "bytes": sum(e.bytes for e in new_entries),
            "manifests_in": len(base_snap.manifests),
            "manifests_out": len(manifest_names),
            "stats_backfilled": len(filled),
        },
        committed_at=time.time(),
    )
    if _atomic_create_json(
        log.staging, log._snapshot_path(snap.version), snap.to_json()
    ):
        log._write_txn_marker(snap)
        return snap
    else:
        # a concurrent commit advanced the head; manifest rewrite touches no
        # data files, so rebasing is re-running against the new head
        return rewrite_manifests(
            root,
            job_id=job_id,
            backfill_stats=backfill_stats,
            target_entries_per_manifest=target_entries_per_manifest,
        )


def _make_footer_reader(root: str):
    def _read(batch: pa.Table) -> pa.Table:
        paths = batch["path"].to_pylist()
        return pa.table(
            {
                "path": paths,
                "stats_json": [
                    json.dumps(footer_stats(os.path.join(root, p))) for p in paths
                ],
                "nulls_json": [
                    json.dumps(footer_null_counts(os.path.join(root, p)))
                    for p in paths
                ],
            }
        )

    return _read
