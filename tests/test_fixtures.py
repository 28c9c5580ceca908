"""Fixture-generator tests (FIXTURES.md F1/F2): determinism, the scalar
text mirror vs the vectorized generator, skew, and MERGE-source slices."""

from __future__ import annotations

import numpy as np
import pyarrow.compute as pc

from open_finance_lakehouse_ray.sources import transcripts as tr


def test_deterministic_rebuild():
    a = tr.build_transcripts(seed=42, n_convs=20)
    b = tr.build_transcripts(seed=42, n_convs=20)
    assert a.equals(b)
    c = tr.build_transcripts(seed=43, n_convs=20)
    assert not a.equals(c)


def test_schema_matches_input_hint():
    t = tr.build_transcripts(n_convs=5)
    assert t.schema.equals(tr.TRANSCRIPT_SCHEMA)
    assert [f.name for f in t.schema] == [
        "conv_id", "turn_idx", "role", "text", "tool", "ts",
    ]


def test_text_mirror_agrees_with_vectorized():
    t = tr.build_transcripts(n_convs=10)
    idx = np.linspace(0, t.num_rows - 1, 25).astype(int)
    for i in idx:
        cid = t["conv_id"][int(i)].as_py()
        tix = t["turn_idx"][int(i)].as_py()
        assert t["text"][int(i)].as_py() == tr.turn_text(cid, tix)


def test_keys_unique_and_ts_increasing_within_conversation():
    t = tr.build_transcripts(n_convs=20)
    import pandas as pd

    df = t.select(["conv_id", "turn_idx", "ts"]).to_pandas()
    assert not df.duplicated(["conv_id", "turn_idx"]).any()
    g = df.sort_values(["conv_id", "turn_idx"]).groupby("conv_id")["ts"]
    assert g.apply(lambda s: s.is_monotonic_increasing).all()


def test_skew_is_present():
    sizes = tr.conversation_sizes(42, 500)
    assert sizes.max() >= 20 * np.median(sizes)  # hot conversations exist
    assert sizes.min() >= 1 and sizes.max() <= 2000


def test_late_turns_slices():
    base = tr.build_transcripts(n_convs=20)
    late = tr.late_turns(base, n_updates=10, n_inserts=9, n_stale=5)
    assert late.num_rows == 24
    assert late.schema.equals(tr.TRANSCRIPT_SCHEMA)
    stale = late.filter(pc.equal(late["text"], "STALE-MUST-NOT-APPEAR"))
    assert stale.num_rows == 5
    # v2 texts mark the updates
    v2 = late.filter(pc.match_substring_regex(late["text"], r":v2:"))
    assert v2.num_rows == 10
    # inserts include brand-new conversations
    new_convs = late.filter(pc.match_substring_regex(late["conv_id"], r"^conv-9"))
    assert new_convs.num_rows >= 1


def test_small_files_layout(tmp_path):
    base = tr.build_transcripts(n_convs=10)
    paths = tr.write_small_files(base, str(tmp_path / "raw"), rows_per_file=200)
    assert len(paths) == -(-base.num_rows // 200)
    import pyarrow.parquet as pq

    total = sum(pq.read_metadata(p).num_rows for p in paths)
    assert total == base.num_rows
