"""Range-partitioned resumable Z-order: scan invariance, clustering
quality, per-range resume (completed work is never redone), and stale-plan
recomputation."""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pytest

from open_finance_lakehouse_ray.pipelines.ingest import ingest_dataset
from open_finance_lakehouse_ray.pipelines.scan import validation_scan
from open_finance_lakehouse_ray.pipelines.zorder import (
    _zr_map_one,
    _zr_reduce_one,
    clustering_quality,
    zorder,
    zorder_ranged,
)
from open_finance_lakehouse_ray.sources.transcripts import build_transcripts
from open_finance_lakehouse_ray.state import TableLog


@pytest.fixture()
def small_table(ray_session, table_root):
    import ray.data as rd

    tab = build_transcripts(seed=21, n_convs=60)
    ingest_dataset(
        rd.from_arrow(tab).repartition(12), table_root, job_id="zr-ingest",
        summary={"keys_unique": True, "key_cols": ["conv_id", "turn_idx"]},
    )
    return table_root, tab


def _sorted_texts(tab: pa.Table):
    return tab.sort_by(
        [("conv_id", "ascending"), ("turn_idx", "ascending")]
    )["text"].to_pylist()


def test_ranged_zorder_preserves_scan(small_table):
    root, tab = small_table
    snap = zorder_ranged(root, job_id="zr", n_ranges=5)
    assert snap is not None
    assert snap.summary["strategy"] == "ranged"
    assert snap.summary["ranges"] == 5
    got = validation_scan(root)
    assert got["text"].to_pylist() == _sorted_texts(tab)
    # shuffle intermediates are cleaned after commit
    assert not os.path.isdir(os.path.join(root, "_shuffle"))
    # output files carry z-ranges and they are near-disjoint
    entries = TableLog(root).files()
    assert all(e.z_range is not None for e in entries)
    assert clustering_quality(entries) <= 0.35


def test_ranged_equals_global_sort_clustering(ray_session, tmp_path):
    """The ranged rewrite and the in-memory global sort must produce the
    SAME row order (both are a total order on the same deterministic key)."""
    import ray.data as rd

    tab = build_transcripts(seed=22, n_convs=40)
    roots = []
    for i, fn in enumerate((zorder, zorder_ranged)):
        root = str(tmp_path / f"t{i}")
        ingest_dataset(rd.from_arrow(tab).repartition(8), root, job_id="i",
                       summary={"keys_unique": True, "key_cols": ["conv_id", "turn_idx"]})
        fn(root, job_id="z")
        roots.append(root)
    a = validation_scan(roots[0])
    b = validation_scan(roots[1])
    assert a["text"].to_pylist() == b["text"].to_pylist()


def test_per_range_resume_skips_completed_work(small_table):
    """Pre-complete the plan + all map records + the first reduce range by
    hand, then run the full job: the completed range's record (and its
    written output file) must be REUSED, not recomputed."""
    root, tab = small_table
    log = TableLog(root)
    base = log.current_version()
    entries = log.files(base)

    # build the same plan the job would (persist it under the job id)
    from open_finance_lakehouse_ray.pipelines.zorder import (
        _sample_zkey_boundaries,
        sample_conv_boundaries,
        ts_range_from_entries,
    )
    import ray.data as rd

    ts_lo, ts_hi = ts_range_from_entries(entries)
    conv_b = sample_conv_boundaries(
        rd.read_parquet([os.path.join(root, e.path) for e in entries],
                        columns=["conv_id"]),
        total_rows=sum(e.rows for e in entries),
    )
    zb = _sample_zkey_boundaries(
        root, entries, ts_lo=ts_lo, ts_hi=ts_hi, curve="morton",
        conv_boundaries=conv_b, n_ranges=4,
    )
    plan = {
        "plan_base": base,
        "files": [e.path for e in entries],
        "ts_range": [ts_lo, ts_hi],
        "conv_boundaries": [str(c) for c in conv_b],
        "zb": zb,
        "curve": "morton",
    }
    log.record_partition("zr2", "_plan", plan)

    # run phase 1 for every file and phase 2 for range 0 only (in-process)
    maps = [
        _zr_map_one(root, "zr2", i, e.path, plan)
        for i, e in enumerate(entries)
    ]
    sources0 = [
        (m["intermediate"], m["row_groups"]["0"])
        for m in maps if "0" in m["row_groups"]
    ]
    rec0 = _zr_reduce_one(root, "zr2", 0, sources0, base)
    assert rec0["outputs"], "range 0 must have produced a file"
    out_path = rec0["outputs"][0]["path"]
    mtime_before = os.path.getmtime(os.path.join(root, out_path))

    snap = zorder_ranged(root, job_id="zr2", n_ranges=4)
    assert snap is not None
    # the pre-completed range's output is in the commit, file untouched
    assert out_path in snap.added_paths
    assert os.path.getmtime(os.path.join(root, out_path)) == mtime_before
    got = validation_scan(root)
    assert got["text"].to_pylist() == _sorted_texts(tab)


def test_stale_plan_records_are_recomputed(small_table):
    """Records (plan, map, reduce) left by a crashed attempt against an
    OLDER base version must be replanned/recomputed, never resumed."""
    root, tab = small_table
    log = TableLog(root)

    log.record_partition("zr3", "_plan", {
        "plan_base": 999, "files": ["data/gone.parquet"],
        "ts_range": [0, 1], "conv_boundaries": [], "zb": [], "curve": "morton",
    })
    log.record_partition("zr3", "range-000000", {
        "inputs": ["_shuffle/x/map-0.parquet"],
        "outputs": [{"path": "data/stale-z.parquet", "rows": 1, "bytes": 1,
                     "stats": {}, "z_range": [0, 1], "sorted_by": None}],
        "rows": 1, "plan_base": 999,
    })

    snap = zorder_ranged(root, job_id="zr3", n_ranges=3)
    assert snap is not None
    assert "data/stale-z.parquet" not in snap.added_paths
    got = validation_scan(root)
    assert got["text"].to_pylist() == _sorted_texts(tab)


def test_orphan_sweep_cleans_crashed_shuffle_dir(small_table):
    root, _ = small_table
    sdir = os.path.join(root, "_shuffle", "dead-job")
    os.makedirs(sdir)
    f = os.path.join(sdir, "map-000000.parquet")
    with open(f, "wb") as fh:
        fh.write(b"x")
    old = 1_000_000.0
    os.utime(f, (old, old))
    log = TableLog(root)
    swept = log.sweep_orphans(grace_seconds=3600)
    assert os.path.join("_shuffle", "dead-job") in swept
    assert not os.path.exists(sdir)


def test_compact_preserves_clustering(ray_session, table_root):
    """Compacting small Z-clustered files must NOT de-cluster the table:
    disjoint-range inputs concatenate without a re-sort, the outputs keep
    a merged z_range, and a follow-up maintain() skips the global sort."""
    import ray.data as rd

    from open_finance_lakehouse_ray.pipelines.compact import compact
    from open_finance_lakehouse_ray.pipelines.maintain import maintain

    tab = build_transcripts(seed=33, n_convs=80)
    ingest_dataset(rd.from_arrow(tab).repartition(10), table_root,
                   job_id="i", summary={"keys_unique": True, "key_cols": ["conv_id", "turn_idx"]})
    zorder(table_root, job_id="z")  # many small clustered files
    log = TableLog(table_root)
    assert all(e.z_range is not None for e in log.files())
    pre_quality = clustering_quality(log.files())

    snap = compact(table_root, job_id="c", target_bytes=64 * 1024 * 1024)
    assert snap is not None
    entries = log.files()
    assert len(entries) < 64  # files actually merged
    assert all(e.z_range is not None for e in entries), "clustering lost"
    assert clustering_quality(entries) <= max(pre_quality, 0.05)

    got = validation_scan(table_root)
    exp = tab.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    assert got["text"].to_pylist() == exp["text"].to_pylist()

    # the maintain cycle no longer pays a global sort: already clustered
    out = maintain(table_root, job_id="m", force_expire=False)
    assert out["reclustered"] is None
    assert out["unclustered_files"] == 0
