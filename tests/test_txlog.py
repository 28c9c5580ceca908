"""Transaction-log unit tests: CAS commits, idempotent replay, conflict
detection, manifest reuse, reference-counted expire, orphan sweep.

Mirrors the reference's measured-idempotence discipline
(tools/streaming_idempotence.py) at the unit level; the two-process
variant lives in tools/maintenance_harness.py.
"""

from __future__ import annotations

import json
import os

import pytest

from open_finance_lakehouse_ray.state import (
    CommitConflict,
    FileEntry,
    TableLog,
)


def fe(path: str, rows: int = 10) -> FileEntry:
    return FileEntry(path=path, rows=rows, bytes=rows * 100, stats={"turn_idx": [0, rows - 1]})


def touch_data(log: TableLog, name: str) -> str:
    rel = os.path.join("data", name)
    with open(os.path.join(log.root, rel), "w") as f:
        f.write("x")
    return rel


def test_commit_and_read_back(table_root):
    log = TableLog(table_root)
    log.create()
    s1 = log.commit(operation="ingest", job_id="j1", added=[fe("data/a.parquet")])
    assert s1.version == 1 and s1.parent is None
    assert [e.path for e in log.files()] == ["data/a.parquet"]
    assert log.snapshot().summary["rows"] == 10

    s2 = log.commit(operation="ingest", job_id="j2", added=[fe("data/b.parquet", 5)])
    assert s2.version == 2 and s2.parent == 1
    assert sorted(e.path for e in log.files()) == ["data/a.parquet", "data/b.parquet"]
    # time travel: v1 still readable
    assert [e.path for e in log.files(1)] == ["data/a.parquet"]


def test_idempotent_replay_same_job_id(table_root):
    log = TableLog(table_root)
    log.create()
    s1 = log.commit(operation="ingest", job_id="once", added=[fe("data/a.parquet")])
    s2 = log.commit(operation="ingest", job_id="once", added=[fe("data/DIFFERENT.parquet")])
    assert s2.version == s1.version  # replayed commit is a no-op
    assert log.current_version() == 1
    assert [e.path for e in log.files()] == ["data/a.parquet"]


def test_remove_rewrites_only_touched_manifests(table_root):
    log = TableLog(table_root)
    log.create()
    log.commit(operation="ingest", job_id="j1", added=[fe("data/a.parquet")])
    log.commit(operation="ingest", job_id="j2", added=[fe("data/b.parquet")])
    m_before = log.snapshot().manifests
    s3 = log.commit(
        operation="compact",
        job_id="j3",
        added=[fe("data/ab.parquet", 20)],
        removed_paths={"data/a.parquet"},
        read_paths={"data/a.parquet"},
        base_version=2,
    )
    # manifest holding b.parquet is carried BY NAME (structural sharing)
    assert m_before[1] in s3.manifests
    assert sorted(e.path for e in log.files()) == ["data/ab.parquet", "data/b.parquet"]


def test_safe_rebase_vs_true_conflict(table_root):
    log = TableLog(table_root)
    log.create()
    log.commit(operation="ingest", job_id="j1", added=[fe("data/a.parquet")])
    log.commit(operation="ingest", job_id="j2", added=[fe("data/b.parquet")])
    base = log.current_version()

    # concurrent commit that only ADDS: our commit rebases silently
    log.commit(operation="ingest", job_id="j3", added=[fe("data/c.parquet")])
    s = log.commit(
        operation="compact",
        job_id="j4",
        added=[fe("data/a2.parquet")],
        removed_paths={"data/a.parquet"},
        read_paths={"data/a.parquet"},
        base_version=base,
    )
    assert s.version == 4
    assert "data/c.parquet" in [e.path for e in log.files()]

    # concurrent commit REMOVED a file we depend on: true conflict
    base = log.current_version()
    log.commit(
        operation="merge",
        job_id="j5",
        added=[fe("data/b2.parquet")],
        removed_paths={"data/b.parquet"},
        read_paths={"data/b.parquet"},
        base_version=base,
    )
    with pytest.raises(CommitConflict):
        log.commit(
            operation="compact",
            job_id="j6",
            added=[fe("data/bc.parquet")],
            removed_paths={"data/b.parquet"},
            read_paths={"data/b.parquet"},
            base_version=base,
        )
    # disjoint file sets: both commit fine (compaction ⟂ merge commute)
    s = log.commit(
        operation="compact",
        job_id="j7",
        added=[fe("data/c2.parquet")],
        removed_paths={"data/c.parquet"},
        read_paths={"data/c.parquet"},
        base_version=base,
    )
    assert s.operation == "compact"


def test_expire_refcounted(table_root):
    log = TableLog(table_root)
    log.create()
    a = touch_data(log, "a.parquet")
    b = touch_data(log, "b.parquet")
    c = touch_data(log, "c.parquet")
    log.commit(operation="ingest", job_id="j1", added=[fe(a)])
    log.commit(operation="ingest", job_id="j2", added=[fe(b)])
    # compact replaces a+b with c
    log.commit(
        operation="compact",
        job_id="j3",
        added=[fe(c, 20)],
        removed_paths={a, b},
        read_paths={a, b},
        base_version=2,
    )
    res = log.expire_snapshots(keep_last=1, retain_seconds=0.0)
    assert sorted(res["expired_snapshots"]) == [1, 2]
    # a and b are dead (only referenced by expired snapshots); c survives
    assert sorted(res["deleted_files"]) == sorted([a, b])
    assert not os.path.exists(os.path.join(log.root, a))
    assert os.path.exists(os.path.join(log.root, c))
    # current snapshot still scans
    assert [e.path for e in log.files()] == [c]
    # second expire is a no-op
    res2 = log.expire_snapshots(keep_last=1, retain_seconds=0.0)
    assert res2["expired_snapshots"] == []


def test_expire_retention_floor(table_root):
    log = TableLog(table_root)
    log.create()
    a = touch_data(log, "a.parquet")
    log.commit(operation="ingest", job_id="j1", added=[fe(a)])
    log.commit(operation="ingest", job_id="j2", added=[fe(touch_data(log, "b.parquet"))])
    # retain window covers everything -> nothing expires
    res = log.expire_snapshots(keep_last=1, retain_seconds=3600.0)
    assert res["expired_snapshots"] == []
    assert os.path.exists(os.path.join(log.root, a))


def test_never_delete_file_shared_with_live_snapshot(table_root):
    log = TableLog(table_root)
    log.create()
    a = touch_data(log, "a.parquet")
    b = touch_data(log, "b.parquet")
    log.commit(operation="ingest", job_id="j1", added=[fe(a)])
    log.commit(operation="ingest", job_id="j2", added=[fe(b)])  # head references a AND b
    res = log.expire_snapshots(keep_last=1, retain_seconds=0.0)
    assert res["expired_snapshots"] == [1]
    assert res["deleted_files"] == []  # a is shared with the live head
    assert os.path.exists(os.path.join(log.root, a))


def test_partition_lineage_checkpoint(table_root):
    log = TableLog(table_root)
    log.create()
    log.record_partition("job9", "0003", {"inputs": ["x"], "outputs": ["y"], "rows": 7})
    log.record_partition("job9", "0001", {"inputs": ["a"], "outputs": ["b"], "rows": 3})
    got = log.committed_partitions("job9")
    assert set(got) == {"0001", "0003"}
    assert got["0003"]["rows"] == 7
    # idempotent overwrite
    log.record_partition("job9", "0003", {"inputs": ["x"], "outputs": ["y"], "rows": 7})
    assert len(log.committed_partitions("job9")) == 2
    log.clear_job("job9")
    assert log.committed_partitions("job9") == {}


def test_orphan_sweep(table_root):
    log = TableLog(table_root)
    log.create()
    a = touch_data(log, "a.parquet")
    orphan = touch_data(log, "orphan.parquet")
    log.commit(operation="ingest", job_id="j1", added=[fe(a)])
    os.utime(os.path.join(log.root, orphan), (0, 0))  # make it old
    swept = log.sweep_orphans(grace_seconds=60.0)
    assert swept == [orphan]
    assert os.path.exists(os.path.join(log.root, a))


def test_snapshot_json_roundtrip(table_root):
    log = TableLog(table_root)
    log.create()
    s = log.commit(
        operation="ingest",
        job_id="j1",
        added=[fe("data/a.parquet")],
        summary={"note": "hello"},
    )
    with open(os.path.join(log.txdir, f"snapshot-{s.version:010d}.json")) as f:
        d = json.load(f)
    assert d["summary"]["note"] == "hello"
    assert d["summary"]["rows"] == 10


def test_txn_marker_survives_expire(table_root):
    """Replay protection survives VACUUM — the Delta txnAppId ledger
    semantics: after the committing snapshot is expired, the same job_id
    still no-ops (tombstone), and its stale lineage records are gone."""
    log = TableLog(table_root)
    log.create()
    a = touch_data(log, "a.parquet")
    b = touch_data(log, "b.parquet")
    log.commit(operation="ingest", job_id="jA", added=[fe(a)])
    log.commit(operation="ingest", job_id="jB", added=[fe(b)])
    res = log.expire_snapshots(keep_last=1, retain_seconds=0.0)
    assert res["expired_snapshots"] == [1]
    found = log.find_commit("jA")
    assert found is not None
    assert found.operation == "expired"  # tombstone, not a live snapshot
    assert found.version == 1
    # live snapshot still resolves normally
    assert log.find_commit("jB").operation == "ingest"


def test_overwrite_live_serializes_concurrent_append(table_root):
    """REPLACE semantics: an append landing between an overwrite's plan and
    its commit is removed by the overwrite, not left alive beside it."""
    log = TableLog(table_root)
    log.create()
    log.commit(operation="ingest", job_id="j1", added=[fe("data/a.parquet")])
    # overwrite planned at v1: removed={a}, base_version=1
    planned_removed = {"data/a.parquet"}
    # ...then a concurrent append lands at v2
    log.commit(operation="ingest", job_id="j2", added=[fe("data/b.parquet")])
    s = log.commit(
        operation="ingest",
        job_id="ow",
        added=[fe("data/c.parquet")],
        removed_paths=planned_removed,
        base_version=1,
        overwrite_live=True,
    )
    assert s.version == 3
    # b.parquet was serialized BEFORE the overwrite and replaced too
    assert [e.path for e in log.files()] == ["data/c.parquet"]
    assert sorted(s.removed_paths) == ["data/a.parquet", "data/b.parquet"]


def test_overwrite_live_idempotent_replay(table_root):
    log = TableLog(table_root)
    log.create()
    log.commit(operation="ingest", job_id="j1", added=[fe("data/a.parquet")])
    s1 = log.commit(operation="ingest", job_id="ow", added=[fe("data/b.parquet")],
                    overwrite_live=True)
    s2 = log.commit(operation="ingest", job_id="ow", added=[fe("data/z.parquet")],
                    overwrite_live=True)
    assert s2.version == s1.version  # replay is a no-op
    assert [e.path for e in log.files()] == ["data/b.parquet"]


def test_overwrite_live_on_empty_table_is_plain_create(table_root):
    log = TableLog(table_root)
    log.create()
    s = log.commit(operation="ingest", job_id="ow", added=[fe("data/a.parquet")],
                   overwrite_live=True)
    assert s.version == 1 and s.removed_paths == []


def test_rebase_remerges_concurrent_schema_evolutions(table_root):
    """Two evolving appends race: the loser's rebase must re-merge its
    schema with the winner's head schema instead of republishing a schema
    computed against the old base (which would silently drop the winner's
    evolved column from every subsequent scan)."""
    import pyarrow as pa

    from open_finance_lakehouse_ray.stages.evolution import schema_to_b64

    base = pa.schema([("k", pa.int64()), ("v", pa.string())])
    with_a = pa.schema([("k", pa.int64()), ("v", pa.string()), ("a", pa.float64())])
    with_b = pa.schema([("k", pa.int64()), ("v", pa.string()), ("b", pa.int32())])

    log = TableLog(table_root)
    log.create()
    log.commit(
        operation="ingest", job_id="j0", added=[fe("data/a.parquet")],
        summary={"schema_b64": schema_to_b64(base), "schema_evolved": False},
    )
    # writer A evolves against v1 and wins the race
    log.commit(
        operation="ingest", job_id="jA", added=[fe("data/b.parquet")],
        base_version=1,
        summary={"schema_b64": schema_to_b64(with_a), "schema_evolved": True},
    )
    # writer B also planned against v1; its commit rebases onto v2
    log.commit(
        operation="ingest", job_id="jB", added=[fe("data/c.parquet")],
        base_version=1,
        summary={"schema_b64": schema_to_b64(with_b), "schema_evolved": True},
    )
    final = log.table_schema()
    assert final.names == ["k", "v", "a", "b"]  # NEITHER column lost
    assert log.schema_is_evolved()


def test_rebase_remerges_concurrent_constraints(table_root):
    """Two concurrent ALTERs: the rebase 3-way-merges constraint sets so
    the winner's add survives the loser's commit — including the loser's
    own DROP of a third constraint."""
    log = TableLog(table_root)
    log.create()
    log.commit(
        operation="ingest", job_id="j0", added=[fe("data/a.parquet")],
        summary={"constraints": {"c1": {"required_non_null": ["k"]}}},
    )
    # ALTER X plans against v1: drops c1, adds c2 ... but loses the race
    # ALTER Y wins first: keeps c1, adds c3
    log.commit(
        operation="alter", job_id="alterY", added=[], base_version=1,
        summary={"constraints": {"c1": {"required_non_null": ["k"]},
                                 "c3": {"required_non_null": ["v"]}}},
    )
    log.commit(
        operation="alter", job_id="alterX", added=[], base_version=1,
        summary={"constraints": {"c2": {"required_non_null": ["w"]}}},
    )
    final = log.table_constraints()
    assert set(final) == {"c2", "c3"}  # c1 dropped by X, c3 kept from Y


def test_rebase_incompatible_schema_is_a_conflict(table_root):
    import pyarrow as pa

    from open_finance_lakehouse_ray.stages.evolution import schema_to_b64

    log = TableLog(table_root)
    log.create()
    log.commit(
        operation="ingest", job_id="j0", added=[fe("data/a.parquet")],
        summary={"schema_b64": schema_to_b64(pa.schema([("k", pa.int64())]))},
    )
    log.commit(
        operation="ingest", job_id="jA", added=[fe("data/b.parquet")],
        base_version=1,
        summary={"schema_b64": schema_to_b64(
            pa.schema([("k", pa.int64()), ("x", pa.string())]))},
    )
    with pytest.raises(CommitConflict):
        log.commit(
            operation="ingest", job_id="jB", added=[fe("data/c.parquet")],
            base_version=1,
            summary={"schema_b64": schema_to_b64(
                pa.schema([("k", pa.int64()), ("x", pa.int64())]))},
        )


def test_rebase_does_not_resurrect_concurrent_drop(table_root):
    """A commit that did NOT touch constraint c1 must not re-add it when
    rebasing over a concurrent commit that DROPPED c1."""
    log = TableLog(table_root)
    log.create()
    log.commit(
        operation="ingest", job_id="j0", added=[fe("data/a.parquet")],
        summary={"constraints": {"c1": {"required_non_null": ["k"]}}},
    )
    # ALTER A wins: drops c1
    log.commit(operation="alter", job_id="dropA", added=[], base_version=1,
               summary={"constraints": {}})
    # ALTER B (planned against v1, c1 untouched, adds c2) rebases onto A
    log.commit(
        operation="alter", job_id="addB", added=[], base_version=1,
        summary={"constraints": {"c1": {"required_non_null": ["k"]},
                                 "c2": {"required_non_null": ["v"]}}},
    )
    assert set(log.table_constraints()) == {"c2"}  # c1 stays dropped


def test_retry_rebase_starts_from_pristine_summary(table_root, monkeypatch):
    """A commit that loses the CAS twice must rebase its ORIGINAL summary
    each attempt: re-rebasing the attempt-1 result would misattribute the
    first concurrent commit's constraint add as ours and resurrect it
    after a later concurrent commit drops it."""
    log = TableLog(table_root)
    log.create()
    log.commit(
        operation="ingest", job_id="j0", added=[fe("data/a.parquet")],
        summary={"constraints": {"Y0": {"required_non_null": ["k"]}}},
    )
    # interleave: before OUR first CAS attempt, v2 adds X; before our
    # second, v3 drops X — simulated by committing from inside a patched
    # _atomic_create_json that fails our first two attempts
    from open_finance_lakehouse_ray.state import txlog as txmod

    orig_cas = txmod._atomic_create_json
    state = {"n": 0}

    def interfering_cas(staging, final_path, payload):
        if payload.get("job_id") == "ours":
            state["n"] += 1
            if state["n"] == 1:
                log2 = TableLog(table_root)
                orig = txmod._atomic_create_json
                txmod._atomic_create_json = orig_cas  # let theirs through
                try:
                    log2.commit(operation="alter", job_id="addX", added=[],
                                base_version=1,
                                summary={"constraints": {
                                    "Y0": {"required_non_null": ["k"]},
                                    "X": {"required_non_null": ["v"]}}})
                finally:
                    txmod._atomic_create_json = interfering_cas
                return False  # we lose the race
            if state["n"] == 2:
                txmod._atomic_create_json = orig_cas
                try:
                    TableLog(table_root).commit(
                        operation="alter", job_id="dropX", added=[],
                        base_version=2,
                        summary={"constraints": {
                            "Y0": {"required_non_null": ["k"]}}})
                finally:
                    txmod._atomic_create_json = interfering_cas
                return False
        return orig_cas(staging, final_path, payload)

    monkeypatch.setattr(txmod, "_atomic_create_json", interfering_cas)
    # ours: planned against v1, adds Y1, never touched X
    TableLog(table_root).commit(
        operation="alter", job_id="ours", added=[], base_version=1,
        summary={"constraints": {"Y0": {"required_non_null": ["k"]},
                                 "Y1": {"required_non_null": ["w"]}}},
    )
    monkeypatch.setattr(txmod, "_atomic_create_json", orig_cas)
    final = TableLog(table_root).table_constraints()
    assert set(final) == {"Y0", "Y1"}  # X stays dropped
