"""maintain() composition, the Hilbert curve variant, and the remaining
dedup variants (embedding near-dup)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from open_finance_lakehouse_ray.pipelines.maintain import maintain
from open_finance_lakehouse_ray.sources.transcripts import build_transcripts
from open_finance_lakehouse_ray.state import TableLog

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def small_table(ray_session, table_root):
    import ray.data as rd

    from open_finance_lakehouse_ray.pipelines.ingest import ingest_dataset

    tab = build_transcripts(seed=42, n_convs=25)
    ingest_dataset(rd.from_arrow(tab).repartition(20), table_root, job_id="mt-ingest")
    return table_root, tab


def test_maintain_full_cycle_and_replay(small_table):
    root, tab = small_table
    out = maintain(root, job_id="mt-1", target_bytes=4 * 1024 * 1024,
                   force_expire=True)
    assert out["compacted"] is not None
    assert out["reclustered"] is not None  # freshly ingested -> unclustered
    assert out["checks"]["unique_keys"] == 0
    assert out["report"]["rows"] == tab.num_rows
    v = TableLog(root).current_version()

    # replayed maintain: every sub-job no-ops, no new snapshots beyond the
    # (metadata-only) expire bookkeeping
    out2 = maintain(root, job_id="mt-1", target_bytes=4 * 1024 * 1024,
                    force_expire=True)
    assert TableLog(root).current_version() == v
    assert out2["report"]["rows"] == tab.num_rows
    # second run skips the re-sort: table is already clustered & disjoint
    assert out2["reclustered"] is None


def test_hilbert_variant_preserves_scan(small_table):
    root, tab = small_table
    from open_finance_lakehouse_ray.pipelines.zorder import zorder
    from open_finance_lakehouse_ray.pipelines.scan import validation_scan

    snap = zorder(root, job_id="hil-1", curve="hilbert")
    assert snap.summary["curve"] == "hilbert"
    got = validation_scan(root)
    exp = tab.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    assert got["text"].to_pylist() == exp["text"].to_pylist()
    entries = TableLog(root).files()
    assert all(e.z_range is not None for e in entries)


def test_embedding_near_dup_pairs(ray_session):
    import ray.data as rd

    from open_finance_lakehouse_ray.pipelines.dedup import embedding_near_dup_pairs

    # seed two exact-duplicate vectors into the testdata embeddings
    base = rd.read_parquet(f"{SF}/embeddings.parquet").to_pandas()
    dup = base.iloc[[0]].copy()
    dup["vec_id"] = 9_999
    import pandas as pd

    df = pd.concat([base, dup], ignore_index=True)
    ds = rd.from_pandas(df)
    pairs = embedding_near_dup_pairs(ds, threshold=0.999).to_pandas()
    assert ((pairs["id_a"] == base.iloc[0]["vec_id"]) & (pairs["id_b"] == 9_999)).any()
    assert (pairs["cosine"] >= 0.999).all()


def test_scan_equality_report_distributed(ray_session, tmp_path):
    """The distributed bucket-digest equality check: equal tables match,
    a one-byte text difference is caught, and no driver materialization
    of either table is needed."""
    import ray.data as rd

    from open_finance_lakehouse_ray.pipelines.ingest import ingest_dataset
    from open_finance_lakehouse_ray.pipelines.scan import scan_equality_report

    tab = build_transcripts(seed=42, n_convs=12)
    root_a = str(tmp_path / "a")
    root_b = str(tmp_path / "b")
    ingest_dataset(rd.from_arrow(tab).repartition(5), root_a, job_id="eq-a")
    ingest_dataset(rd.from_arrow(tab).repartition(9), root_b, job_id="eq-b")
    rep = scan_equality_report(root_a, root_b, num_buckets=8)
    assert rep["equal"] and rep["rows_a"] == rep["rows_b"] == tab.num_rows

    # tamper one byte in one file of b
    import os

    import pyarrow.parquet as pq
    import pyarrow as pa

    log = TableLog(root_b)
    entry = log.files()[0]
    path = os.path.join(root_b, entry.path)
    t = pq.read_table(path)
    texts = t["text"].to_pylist()
    texts[0] = texts[0] + "!"
    pq.write_table(
        t.set_column(t.column_names.index("text"), "text", pa.array(texts)), path
    )
    rep2 = scan_equality_report(root_a, root_b, num_buckets=8)
    assert not rep2["equal"]
    assert len(rep2["mismatched_buckets"]) >= 1


def test_time_travel_scan(small_table):
    """Snapshot isolation for readers: scanning the PRE-merge version
    after a merge returns the original content (old files are retained
    until expire)."""
    import ray.data as rd

    from open_finance_lakehouse_ray.pipelines.merge import merge_into
    from open_finance_lakehouse_ray.pipelines.scan import validation_scan
    from open_finance_lakehouse_ray.sources.transcripts import late_turns

    root, tab = small_table
    v1 = TableLog(root).current_version()
    late = late_turns(tab, n_updates=8, n_inserts=6, n_stale=4)
    merge_into(root, late, job_id="tt-merge", num_buckets=4)
    assert TableLog(root).current_version() == v1 + 1

    old = validation_scan(root, version=v1)
    exp = tab.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    assert old["text"].to_pylist() == exp["text"].to_pylist()
    new = validation_scan(root)
    assert new.num_rows == tab.num_rows + 6  # inserts visible only at head
