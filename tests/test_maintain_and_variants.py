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
