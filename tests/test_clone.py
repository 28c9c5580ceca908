"""Shallow clone: zero-copy link semantics, divergence isolation, and
survival of the source's vacuum."""

from __future__ import annotations

import os

import pyarrow.compute as pc
import pytest
import ray.data as rd

from open_finance_lakehouse_ray.pipelines.clone import clone_table
from open_finance_lakehouse_ray.pipelines.compact import compact
from open_finance_lakehouse_ray.pipelines.delete import delete_where
from open_finance_lakehouse_ray.pipelines.expire import expire
from open_finance_lakehouse_ray.pipelines.ingest import ingest_dataset
from open_finance_lakehouse_ray.pipelines.scan import validation_scan
from open_finance_lakehouse_ray.sources.transcripts import build_transcripts
from open_finance_lakehouse_ray.state.txlog import TableLog


@pytest.fixture()
def seeded(ray_session, tmp_path):
    src = str(tmp_path / "src")
    tx = build_transcripts(n_convs=40)
    ingest_dataset(
        rd.from_arrow(tx).repartition(6), src, job_id="cl-base",
        summary={"keys_unique": True, "key_cols": ["conv_id", "turn_idx"]},
    )
    return src, tx, str(tmp_path / "dst")


def test_clone_is_zero_copy_and_equal(seeded):
    src, tx, dst = seeded
    snap = clone_table(src, dst, job_id="cl-1")
    assert snap.summary["cloned_version"] == TableLog(src).current_version()
    # same bytes via hard links (same inode), not copies
    e = TableLog(dst).files()[0]
    s_ino = os.stat(os.path.join(src, e.path)).st_ino
    d_ino = os.stat(os.path.join(dst, e.path)).st_ino
    assert s_ino == d_ino
    got = validation_scan(dst)
    assert got.num_rows == tx.num_rows
    assert TableLog(dst).keys_unique()
    # idempotent on job_id
    assert clone_table(src, dst, job_id="cl-1").version == snap.version


def test_clone_diverges_without_touching_source(seeded):
    src, tx, dst = seeded
    clone_table(src, dst, job_id="cl-2")
    f0 = TableLog(dst).files()[0].stats["conv_id"]
    delete_where(dst, job_id="cl-del", conv_id_range=(f0[0], f0[1]))
    compact(dst, job_id="cl-compact", target_bytes=64 * 1024 * 1024)
    assert validation_scan(src).num_rows == tx.num_rows  # source untouched
    assert validation_scan(dst).num_rows < tx.num_rows


def test_clone_survives_source_vacuum(seeded):
    src, tx, dst = seeded
    clone_table(src, dst, job_id="cl-3")
    # source compacts then force-expires its history: original files gone
    compact(src, job_id="cl-src-compact", target_bytes=64 * 1024 * 1024)
    expire(src, keep_last=1, force=True)
    got = validation_scan(dst)  # links keep the clone's inodes alive
    assert got.num_rows == tx.num_rows
    assert pc.sum(pc.utf8_length(got["text"])).as_py() == pc.sum(
        pc.utf8_length(tx["text"])
    ).as_py()


def test_clone_refuses_nonempty_target(seeded):
    src, tx, dst = seeded
    clone_table(src, dst, job_id="cl-4")
    with pytest.raises(ValueError):
        clone_table(src, dst, job_id="cl-5")
