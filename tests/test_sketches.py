"""HyperLogLog sketch: accuracy, mergeability, serialization, and the
batch-sketch-then-merge Dataset pattern."""

from __future__ import annotations

import numpy as np
import pytest

from open_finance_lakehouse_ray.functions.sketches import HyperLogLog, approx_distinct


def _hashes(n: int, seed: int = 0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.integers(0, 2**63, n, dtype=np.uint64) * np.uint64(2) + np.uint64(1)


@pytest.mark.parametrize("n", [100, 10_000, 200_000])
def test_hll_accuracy(n):
    h = HyperLogLog(p=12).add_hashed(_hashes(n))
    est = h.estimate()
    assert abs(est - n) / n < 0.05  # p=12 -> ~1.6% std error


def test_hll_merge_equals_union():
    a_h = _hashes(5000, seed=1)
    b_h = _hashes(5000, seed=2)
    a = HyperLogLog(p=12).add_hashed(a_h)
    b = HyperLogLog(p=12).add_hashed(b_h)
    merged = a.merge(b)
    both = HyperLogLog(p=12).add_hashed(np.concatenate([a_h, b_h]))
    assert merged.estimate() == both.estimate()  # register-exact merge


def test_hll_duplicates_dont_inflate():
    h = _hashes(1000)
    once = HyperLogLog(p=12).add_hashed(h)
    thrice = HyperLogLog(p=12).add_hashed(np.tile(h, 3))
    assert once.estimate() == thrice.estimate()


def test_hll_serialization_roundtrip():
    h = HyperLogLog(p=10).add_hashed(_hashes(777))
    back = HyperLogLog.from_bytes(h.to_bytes())
    assert back.p == 10
    assert back.estimate() == h.estimate()


def test_approx_distinct_over_dataset(ray_session):
    import duckdb
    import ray.data as rd

    ds = rd.read_parquet("/root/testdata/sf0.001/events.parquet", columns=["user_id"])
    est = approx_distinct(ds, "user_id")
    exact = duckdb.sql(
        "select count(distinct user_id) from '/root/testdata/sf0.001/events.parquet'"
    ).fetchone()[0]
    assert abs(est - exact) / exact < 0.1


def test_shingle_tokenization_matches_sql_single_space_contract():
    """Texts with consecutive spaces / tabs / newlines must shingle
    identically to the oracles' string_split(text, ' ') — the round-4
    advice: any-whitespace split silently collapsed runs on the Python
    side only."""
    import duckdb
    import numpy as np
    import pandas as pd

    from open_finance_lakehouse_ray.pipelines.dedup import _shingle_hashes

    texts = [
        "alpha  beta gamma delta",        # double space
        "alpha\tbeta gamma delta",        # tab is NOT a separator
        "alpha beta\ngamma delta",        # newline is NOT a separator
        "plain single space text here",
    ]
    con = duckdb.connect()
    for t in texts:
        sql_shingles = con.execute(
            "SELECT list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2] "
            "for i in range(1, len(w) - 1)]) FROM "
            "(SELECT string_split($1, ' ') w)", [t]
        ).fetchone()[0]
        got = _shingle_hashes([t], k=3)[0]
        exp = (
            np.sort(pd.util.hash_array(np.asarray(sorted(set(sql_shingles)),
                                                  dtype=object)))
            if sql_shingles else np.empty(0, dtype=np.uint64)
        )
        assert np.array_equal(np.sort(got), exp), t
    con.close()
