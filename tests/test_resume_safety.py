"""Crash-resume lineage safety + strategy gating + check-gate rollback.

These pin the failure modes of a killed job resumed AFTER a concurrent
writer moved the table head: stale per-partition lineage records must
never be committed (they would silently revert the table), MERGE's auto
strategy must not pick the broadcast fast path on a table whose merge
keys aren't attested unique, a check breach must withdraw maintenance
output, and force-expire must not eat a concurrent writer's fresh files.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc
import pytest

from open_finance_lakehouse_ray.pipelines.compact import compact
from open_finance_lakehouse_ray.pipelines.expire import expire
from open_finance_lakehouse_ray.pipelines.ingest import ingest_dataset
from open_finance_lakehouse_ray.pipelines.merge import merge_into
from open_finance_lakehouse_ray.pipelines.scan import validation_scan
from open_finance_lakehouse_ray.sources.transcripts import build_transcripts
from open_finance_lakehouse_ray.state import TableLog


def _ingest(root: str, table: pa.Table, *, job_id: str = "ingest", n_files: int = 8,
            unique: bool = True):
    import ray.data as rd

    summary = {"keys_unique": True, "key_cols": ["conv_id", "turn_idx"]} if unique else None
    return ingest_dataset(
        rd.from_arrow(table).repartition(n_files), root, job_id=job_id,
        summary=summary,
    )


def test_stale_compact_record_is_recomputed(ray_session, table_root):
    """The ADVICE repro: a lineage record whose inputs differ from the
    current plan (crash → concurrent commit → same job_id re-run) must be
    recomputed, not resumed — else the commit reverts the table."""
    tab = build_transcripts(seed=1, n_convs=40)
    _ingest(table_root, tab, n_files=12)
    log = TableLog(table_root)

    # forge the crashed attempt's record: same job id + bin id a fresh
    # plan will also use, but pointing at bogus inputs and a bogus output
    bogus = {
        "inputs": ["data/does-not-exist-1.parquet", "data/does-not-exist-2.parquet"],
        "outputs": [{
            "path": "data/bogus-output.parquet", "rows": 999, "bytes": 1,
            "stats": {}, "z_range": None, "sorted_by": None,
        }],
        "rows": 999,
        "z_range": None,
    }
    log.record_partition("cjob", "000000", bogus)

    snap = compact(table_root, job_id="cjob", target_bytes=64 * 1024 * 1024)
    assert snap is not None
    assert "data/bogus-output.parquet" not in snap.added_paths
    got = validation_scan(table_root)
    exp = tab.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    assert got["text"].to_pylist() == exp["text"].to_pylist()


def test_stale_merge_bucket_record_is_recomputed(ray_session, table_root):
    """Merge bucket records are keyed by bucket id, which repeats across
    plans — a record from a different plan base must be ignored."""
    tab = build_transcripts(seed=2, n_convs=30)
    _ingest(table_root, tab, n_files=6)
    log = TableLog(table_root)

    log.record_partition("mjob", "000000", {
        "bucket": 0,
        "outputs": [{
            "path": "data/stale-bucket.parquet", "rows": 5, "bytes": 1,
            "stats": {}, "z_range": None, "sorted_by": None,
        }],
        "rows": 5,
        "plan_base": 12345,  # a different plan
    })

    upd = pa.table({
        "conv_id": [tab["conv_id"][0].as_py()],
        "turn_idx": [tab["turn_idx"][0].as_py()],
        "role": ["user"],
        "text": ["UPDATED"],
        "tool": pa.array([None], pa.string()),
        "ts": [pc.max(tab["ts"]).as_py()],
    })
    snap = merge_into(table_root, upd, job_id="mjob", strategy="shuffle",
                      num_buckets=8)
    assert "data/stale-bucket.parquet" not in snap.added_paths
    got = validation_scan(table_root)
    texts = dict(zip(
        zip(got["conv_id"].to_pylist(), got["turn_idx"].to_pylist()),
        got["text"].to_pylist(),
    ))
    key = (tab["conv_id"][0].as_py(), tab["turn_idx"][0].as_py())
    assert texts[key] == "UPDATED"
    assert got.num_rows == tab.num_rows


def test_auto_merge_falls_back_to_shuffle_on_dup_key_table(ray_session, table_root):
    """A plain-append table with duplicate keys spanning files: auto must
    NOT broadcast (per-file apply would keep both copies); the shuffle
    path's latest-wins dedup must leave exactly one row for the key."""
    tab = build_transcripts(seed=3, n_convs=20)
    # land twice WITHOUT attestation: every key now exists in two files
    _ingest(table_root, tab, job_id="a1", n_files=4, unique=False)
    _ingest(table_root, tab, job_id="a2", n_files=4, unique=False)
    log = TableLog(table_root)
    assert not log.keys_unique()

    cid = tab["conv_id"][0].as_py()
    tix = tab["turn_idx"][0].as_py()
    upd = pa.table({
        "conv_id": [cid], "turn_idx": [tix], "role": ["user"],
        "text": ["WINNER"], "tool": pa.array([None], pa.string()),
        "ts": [pc.max(tab["ts"]).as_py()],
    })
    snap = merge_into(table_root, upd, job_id="auto-merge", strategy="auto")
    assert snap.summary.get("strategy") != "broadcast"
    got = validation_scan(table_root)
    keys = list(zip(got["conv_id"].to_pylist(), got["turn_idx"].to_pylist()))
    hits = [i for i, k in enumerate(keys) if k == (cid, tix)]
    assert len(hits) == 1
    assert got["text"][hits[0]].as_py() == "WINNER"


def test_auto_merge_broadcasts_on_attested_table(ray_session, table_root):
    tab = build_transcripts(seed=4, n_convs=20)
    _ingest(table_root, tab, n_files=4, unique=True)
    log = TableLog(table_root)
    assert log.keys_unique()
    upd = pa.table({
        "conv_id": [tab["conv_id"][0].as_py()],
        "turn_idx": [tab["turn_idx"][0].as_py()],
        "role": ["user"], "text": ["B"], "tool": pa.array([None], pa.string()),
        "ts": [pc.max(tab["ts"]).as_py()],
    })
    snap = merge_into(table_root, upd, job_id="bc-merge", strategy="auto")
    assert snap.summary.get("strategy") == "broadcast"
    assert log.keys_unique()  # bit survives the merge


def test_keys_unique_propagates_through_maintenance(ray_session, table_root):
    from open_finance_lakehouse_ray.pipelines.zorder import zorder

    tab = build_transcripts(seed=5, n_convs=30)
    _ingest(table_root, tab, n_files=10, unique=True)
    compact(table_root, job_id="c", target_bytes=64 * 1024 * 1024)
    zorder(table_root, job_id="z")
    assert TableLog(table_root).keys_unique()


def test_check_breach_rolls_back_maintenance(ray_session, table_root):
    """maintain(): a failing check must withdraw this run's compaction /
    re-cluster snapshots (restore to the pre-maintenance version) and
    never run expire."""
    from open_finance_lakehouse_ray.pipelines.checks import CheckError
    from open_finance_lakehouse_ray.pipelines.maintain import maintain

    tab = build_transcripts(seed=6, n_convs=30)
    # duplicate keys -> check_unique_keys must fail
    _ingest(table_root, tab, job_id="d1", n_files=6, unique=False)
    _ingest(table_root, tab, job_id="d2", n_files=6, unique=False)
    log = TableLog(table_root)
    pre_version = log.current_version()
    pre_paths = {e.path for e in log.files()}

    with pytest.raises(CheckError):
        maintain(table_root, job_id="mnt")

    head = log.snapshot()
    assert head.operation == "restore"
    assert {e.path for e in log.files()} == pre_paths
    assert head.summary["restored_to"] == pre_version
    # the withdrawn state is still time-travelable, and all restored files exist
    for p in pre_paths:
        assert os.path.exists(os.path.join(table_root, p))


def test_force_expire_keeps_orphan_grace(ray_session, table_root):
    """force=True drops the snapshot floor but must NOT sweep a freshly
    written (in-flight, uncommitted) data file; force_orphans=True is the
    separate opt-in that does."""
    tab = build_transcripts(seed=7, n_convs=10)
    _ingest(table_root, tab, job_id="e1", n_files=2)
    compact(table_root, job_id="e-c", target_bytes=64 * 1024 * 1024)
    inflight = os.path.join(table_root, "data", "inflight-uncommitted.parquet")
    with open(inflight, "wb") as f:
        f.write(b"x")

    res = expire(table_root, keep_last=1, force=True)
    assert os.path.exists(inflight)
    assert "data/inflight-uncommitted.parquet" not in res["orphans_swept"]

    res2 = expire(table_root, keep_last=1, force=True, force_orphans=True)
    assert not os.path.exists(inflight)
    assert "data/inflight-uncommitted.parquet" in res2["orphans_swept"]


def test_bucket_record_with_wrong_num_buckets_is_recomputed(ray_session, table_root):
    """A crashed shuffle merge's bucket record partitioned rows by hash%N;
    a resume running hash%M (different cluster sizing) must NOT reuse it —
    the record covers a different row subset and reuse would drop rows."""
    from open_finance_lakehouse_ray.sources.transcripts import late_turns

    base = build_transcripts(seed=6, n_convs=25)
    _ingest(table_root, base, job_id="nb-ingest")
    log = TableLog(table_root)
    v = log.current_version()

    # plant a record that claims bucket 0 under num_buckets=32
    log.record_partition("nb-merge", "000000", {
        "kind": "bucket", "bucket": 0, "num_buckets": 32,
        "outputs": [], "rows": 0, "z_range": None, "plan_base": v,
    })
    late = late_turns(base, seed=7, n_updates=20, n_inserts=10, n_stale=5)
    merge_into(table_root, late, job_id="nb-merge", num_buckets=8,
               strategy="shuffle")

    # every base + update key must be present exactly once
    import duckdb

    log = TableLog(table_root)
    con = duckdb.connect()
    n, d = con.execute(
        "SELECT COUNT(*), COUNT(DISTINCT conv_id || '#' || turn_idx) "
        "FROM read_parquet($1)", [log.file_paths()]
    ).fetchone()
    assert n == d
    assert n == base.num_rows + 10  # inserts added, updates/stales keyed


def test_sweep_spares_live_job_outputs(ray_session, table_root):
    """Orphan sweep must not delete files recorded by a crashed-but-
    resumable job's lineage, even past the grace window."""
    _ingest(table_root, build_transcripts(seed=8, n_convs=10), job_id="sw-ingest")
    log = TableLog(table_root)

    # simulate a crashed job: an uncommitted data file + a lineage record
    import pyarrow.parquet as pq

    orphan_rel = os.path.join("data", "crashed-part.parquet")
    orphan = os.path.join(table_root, orphan_rel)
    pq.write_table(pa.table({"x": [1]}), orphan)
    os.utime(orphan, (1, 1))  # ancient mtime: normally sweepable
    debris_rel = os.path.join("data", "true-debris.parquet")
    debris = os.path.join(table_root, debris_rel)
    pq.write_table(pa.table({"x": [2]}), debris)
    os.utime(debris, (1, 1))

    log.record_partition("crashed-job", "000000", {
        "kind": "bucket", "outputs": [{"path": orphan_rel, "rows": 1,
                                       "bytes": 1, "stats": {}, "z_range": None}],
        "rows": 1, "plan_base": log.current_version(),
    })
    swept = log.sweep_orphans(grace_seconds=3600)
    assert debris_rel in swept
    assert orphan_rel not in swept and os.path.exists(orphan)
    # job finishes -> protection released
    log.clear_job("crashed-job")
    swept2 = log.sweep_orphans(grace_seconds=3600)
    assert orphan_rel in swept2


def test_conflict_check_on_expired_snapshot_is_replannable(ray_session, table_root):
    """If an intervening snapshot was expired before the conflict walk,
    commit must raise CommitConflict (replannable), not StaleTableError."""
    from open_finance_lakehouse_ray.state.txlog import CommitConflict

    _ingest(table_root, build_transcripts(seed=9, n_convs=8), job_id="cx-ingest")
    log = TableLog(table_root)
    v1 = log.current_version()
    # two more commits; expire everything but the head
    compact(table_root, job_id="cx-compact", target_bytes=1 << 20)
    _ingest(table_root, build_transcripts(seed=10, n_convs=2),
            job_id="cx-ingest-2")
    log.expire_snapshots(keep_last=1, retain_seconds=0.0)

    with pytest.raises(CommitConflict):
        log.commit(
            operation="test", job_id="cx-stale",
            added=[], removed_paths={"data/whatever.parquet"},
            base_version=v1,
        )


def test_rebase_downgrades_stale_keys_unique(ray_session, table_root):
    """A keys_unique=True summary computed at the old base must not survive
    a rebase over an un-attested commit."""
    _ingest(table_root, build_transcripts(seed=11, n_convs=6), job_id="ku-a")
    log = TableLog(table_root)
    v1 = log.current_version()
    assert log.keys_unique(v1)

    # concurrent un-attested ingest moves the head (keys_unique -> False)
    _ingest(table_root, build_transcripts(seed=12, n_convs=2),
            job_id="ku-b", unique=False)
    assert not log.keys_unique(log.current_version())

    snap = log.commit(
        operation="test", job_id="ku-c", added=[],
        base_version=v1, summary={"keys_unique": True, "key_cols": ["conv_id", "turn_idx"]},
    )
    assert snap.summary["keys_unique"] is False
