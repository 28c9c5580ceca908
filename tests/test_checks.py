"""Checks-that-can-fail (FIXTURES.md F4): every invariant check is fed
deliberately corrupted data and must flag exactly the breach — the
reference's discipline in tests/test_gold_marts.py:331-402."""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from open_finance_lakehouse_ray.pipelines.checks import (
    CheckError,
    check_manifest_stats,
    check_text_equality,
    check_turn_contiguity,
    check_unique_keys,
    run_checks,
)
from open_finance_lakehouse_ray.pipelines.ingest import ingest_dataset
from open_finance_lakehouse_ray.sources.transcripts import build_transcripts, turn_text
from open_finance_lakehouse_ray.state import TableLog


@pytest.fixture()
def clean_table(ray_session, table_root):
    import ray.data as rd

    tab = build_transcripts(seed=42, n_convs=15)
    ingest_dataset(rd.from_arrow(tab).repartition(6), table_root, job_id="chk-ingest")
    return table_root


def test_clean_table_passes_all(clean_table):
    report = run_checks(
        clean_table,
        {
            "unique_keys": check_unique_keys,
            "manifest_stats": check_manifest_stats,
            "turn_contiguity": check_turn_contiguity,
        },
    )
    assert all(v == 0 for v in report.values())
    eq = check_text_equality(clean_table, turn_text)
    assert eq.num_rows == 0


def _rewrite_one_file(root: str, mutate):
    """Corrupt the first data file in place (bypassing the engine)."""
    log = TableLog(root)
    entry = log.files()[0]
    path = os.path.join(root, entry.path)
    t = pq.read_table(path)
    pq.write_table(mutate(t), path)
    return entry


def test_gap_fixture_flags_missing_turn(clean_table):
    # drop one mid-conversation turn -> contiguity check must flag that conv
    def mutate(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        cid = t["conv_id"][0].as_py()
        conv_rows = t.filter(pc.equal(t["conv_id"], cid))
        victim_turn = sorted(conv_rows["turn_idx"].to_pylist())[
            len(conv_rows) // 2
        ]
        keep = pc.invert(
            pc.and_(pc.equal(t["conv_id"], cid), pc.equal(t["turn_idx"], victim_turn))
        )
        return t.filter(keep)

    _rewrite_one_file(clean_table, mutate)
    # the gap only shows if the conv had >2 turns in this file and the turn
    # was interior — with Zipf sizes the first file's first conv qualifies
    bad = check_turn_contiguity(clean_table)
    assert bad.num_rows >= 1


def test_tampered_text_flagged_at_exact_key(clean_table):
    victim = {}

    def mutate(t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        victim["conv_id"] = t["conv_id"][3].as_py()
        victim["turn_idx"] = t["turn_idx"][3].as_py()
        texts[3] = texts[3] + "X"  # one byte
        return t.set_column(
            t.column_names.index("text"), "text", pa.array(texts, pa.string())
        )

    _rewrite_one_file(clean_table, mutate)
    bad = check_text_equality(clean_table, turn_text, sample=10_000).to_pylist()
    assert {"conv_id": victim["conv_id"], "turn_idx": victim["turn_idx"]} in bad
    assert len(bad) == 1  # exactly that key, nothing else


def test_duplicate_key_after_double_commit(clean_table):
    # simulate a double-commit: re-add an existing file under a new name
    log = TableLog(clean_table)
    entry = log.files()[0]
    import shutil

    dup_rel = entry.path.replace(".parquet", "-dup.parquet")
    shutil.copy(os.path.join(clean_table, entry.path), os.path.join(clean_table, dup_rel))
    from open_finance_lakehouse_ray.state.txlog import FileEntry

    log.commit(
        operation="ingest",
        job_id="evil-double",
        added=[FileEntry(dup_rel, entry.rows, entry.bytes, entry.stats)],
    )
    bad = check_unique_keys(clean_table)
    assert bad.num_rows == entry.rows  # every key in that file is now doubled
    with pytest.raises(CheckError) as err:
        run_checks(clean_table, {"unique_keys": check_unique_keys})
    assert err.value.name == "unique_keys"


def test_zrange_lie_flagged(clean_table):
    # manifest entry claiming a narrower range than the file's data
    log = TableLog(clean_table)
    snap = log.snapshot()
    mpath = os.path.join(log.txdir, snap.manifests[0])
    with open(mpath) as f:
        m = json.load(f)
    m["entries"][0]["stats"]["turn_idx"] = [5, 6]  # lie: file covers more
    with open(mpath, "w") as f:
        json.dump(m, f)
    bad = check_manifest_stats(clean_table).to_pylist()
    assert any(b["column"] == "turn_idx" for b in bad)
