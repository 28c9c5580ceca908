"""First-class equi-join operator: broadcast ≡ shuffle ≡ pandas oracle
across join types, plus the auto size guard."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _mk(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(11)
    left = pd.DataFrame(
        {
            "k": rng.integers(0, 50, 200),
            "v": rng.integers(0, 1000, 200),
            "name": [f"l{i}" for i in range(200)],
        }
    )
    right = pd.DataFrame(
        {
            "rk": np.arange(0, 60, 2),  # half the key space, incl. keys absent on left
            "w": np.arange(0, 60, 2) * 10,
            "name": [f"r{i}" for i in range(30)],  # collides with left's 'name'
        }
    )
    return (
        rd.from_pandas(left).repartition(5),
        rd.from_pandas(right).repartition(3),
        left,
        right,
    )


def _norm(df: pd.DataFrame, cols) -> pd.DataFrame:
    out = df[cols].copy()
    for c in cols:
        if out[c].dtype == object or str(out[c].dtype).startswith("float"):
            out[c] = out[c].astype("object").where(out[c].notna(), None)
    return out.sort_values(cols, key=lambda s: s.map(lambda v: (v is None, v))).reset_index(
        drop=True
    )


@pytest.mark.parametrize("strategy", ["broadcast", "shuffle"])
@pytest.mark.parametrize("how", ["inner", "left", "semi", "anti"])
def test_join_matches_pandas(ray_session, how, strategy):
    from open_finance_lakehouse_ray.pipelines.join import join

    lds, rds, left, right = _mk(ray_session)
    got = join(
        lds, rds, on="k", right_on="rk", how=how, strategy=strategy,
        num_buckets=7,
    ).to_pandas()

    if how in ("semi", "anti"):
        m = left.merge(
            right[["rk"]].drop_duplicates(), how="left", left_on="k",
            right_on="rk", indicator=True,
        )
        mask = m["_merge"] == "both" if how == "semi" else m["_merge"] == "left_only"
        exp = m[mask][["k", "v", "name"]]
        cols = ["k", "v", "name"]
    else:
        exp = left.merge(right, how=how, left_on="k", right_on="rk",
                         suffixes=("", "_r"))
        exp = exp.drop(columns=["rk"])
        cols = ["k", "v", "name", "w", "name_r"]
    pd.testing.assert_frame_equal(_norm(got, cols), _norm(exp, cols))


def test_outer_join_shuffle(ray_session):
    from open_finance_lakehouse_ray.pipelines.join import join

    lds, rds, left, right = _mk(ray_session)
    got = join(lds, rds, on="k", right_on="rk", how="outer",
               strategy="shuffle", num_buckets=7).to_pandas()
    exp = left.merge(right, how="outer", left_on="k", right_on="rk",
                     suffixes=("", "_r"))
    # the operator carries the right key onto the left key column
    exp["k"] = exp["k"].fillna(exp["rk"]).astype("int64")
    exp = exp.drop(columns=["rk"])
    cols = ["k", "v", "name", "w", "name_r"]
    pd.testing.assert_frame_equal(_norm(got, cols), _norm(exp, cols))


def test_auto_size_guard_picks_shuffle(ray_session):
    """A right side above the byte cap must take the bucketed path (auto
    never materializes it onto one worker)."""
    from open_finance_lakehouse_ray.pipelines import join as jmod

    lds, rds, left, right = _mk(ray_session)
    got = jmod.join(
        lds, rds, on="k", right_on="rk", how="inner", strategy="auto",
        broadcast_max_bytes=1,  # force the guard
        num_buckets=7,
    ).to_pandas()
    exp = left.merge(right, how="inner", left_on="k", right_on="rk",
                     suffixes=("", "_r")).drop(columns=["rk"])
    cols = ["k", "v", "name", "w", "name_r"]
    pd.testing.assert_frame_equal(_norm(got, cols), _norm(exp, cols))


def test_multi_key_join(ray_session):
    import ray.data as rd

    from open_finance_lakehouse_ray.pipelines.join import join

    left = pd.DataFrame({"a": [1, 1, 2, 2, 3], "b": ["x", "y", "x", "y", "x"],
                         "v": [10, 20, 30, 40, 50]})
    right = pd.DataFrame({"a": [1, 2, 3], "b": ["x", "y", "z"], "w": [7, 8, 9]})
    got = join(rd.from_pandas(left), rd.from_pandas(right), on=["a", "b"],
               how="inner", strategy="shuffle", num_buckets=4).to_pandas()
    exp = left.merge(right, how="inner", on=["a", "b"])
    cols = ["a", "b", "v", "w"]
    pd.testing.assert_frame_equal(_norm(got, cols), _norm(exp, cols))


def test_empty_right_side(ray_session):
    import ray.data as rd

    from open_finance_lakehouse_ray.pipelines.join import join

    left = pd.DataFrame({"k": [1, 2], "v": [1, 2]})
    right = pd.DataFrame({"k": pd.array([], dtype="int64"),
                          "w": pd.array([], dtype="int64")})
    for strategy in ("broadcast", "shuffle"):
        got = join(rd.from_pandas(left), rd.from_pandas(right), on="k",
                   how="left", strategy=strategy, num_buckets=4).to_pandas()
        assert sorted(got["k"].tolist()) == [1, 2]
        assert got["w"].isna().all()


def test_join_property_random_frames(ray_session):
    """Property test: on random key distributions (dups, misses, skew),
    both strategies must equal the pandas merge for every join type."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    import ray.data as rd

    from open_finance_lakehouse_ray.pipelines.join import join

    @settings(max_examples=6, deadline=None,
              suppress_health_check=list(HealthCheck))
    @given(
        lkeys=st.lists(st.integers(0, 8), min_size=0, max_size=30),
        rkeys=st.lists(st.integers(0, 8), min_size=1, max_size=15),
        how=st.sampled_from(["inner", "left", "outer", "semi", "anti"]),
    )
    def check(lkeys, rkeys, how):
        left = pd.DataFrame({"k": lkeys, "v": range(len(lkeys))})
        right = pd.DataFrame({"k": rkeys, "w": [k * 10 for k in rkeys]})
        strategy = "shuffle" if how == "outer" else "broadcast"
        got = join(
            rd.from_pandas(left).repartition(3),
            rd.from_pandas(right).repartition(2),
            on="k", how=how, strategy=strategy, num_buckets=4,
        ).to_pandas()
        if how in ("semi", "anti"):
            m = left.merge(right[["k"]].drop_duplicates(), on="k",
                           how="left", indicator=True)
            mask = m["_merge"] == ("both" if how == "semi" else "left_only")
            exp = m[mask][["k", "v"]]
            cols = ["k", "v"]
        else:
            exp = left.merge(right, on="k", how=how)
            cols = ["k", "v", "w"]
        if len(lkeys) == 0 and how == "outer":
            # empty-side degradation (schema unknowable): left-only
            # columns are absent from the output — compare the knowable
            cols = ["k", "w"]
        if len(got) == 0 and len(exp) == 0:
            return
        gl = got[cols].fillna(-1).sort_values(cols).values.tolist()
        el = exp[cols].fillna(-1).sort_values(cols).values.tolist()
        assert gl == el, (how, gl[:5], el[:5])

    check()


def test_empty_sides(ray_session):
    """Empty-side joins degrade per semantics instead of crashing (Ray
    reports schema()=None for an empty reshuffled Dataset, so the empty
    side's non-key columns are unknowable)."""
    import ray.data as rd

    from open_finance_lakehouse_ray.pipelines.join import join

    left = rd.from_pandas(pd.DataFrame({"k": [], "v": []})).repartition(3)
    right = rd.from_pandas(pd.DataFrame({"k": [1, 2], "w": [10, 20]}))

    for how in ("inner", "left", "semi", "anti"):
        assert join(left, right, on="k", how=how, strategy="shuffle").count() == 0
    out = join(left, right, on="k", how="outer", strategy="shuffle").to_pandas()
    assert sorted(out["k"].tolist()) == [1, 2]

    full = rd.from_pandas(pd.DataFrame({"k": [1, 2], "v": [5, 6]}))
    empty_r = rd.from_pandas(pd.DataFrame({"k": [], "w": []})).repartition(2)
    assert join(full, empty_r, on="k", how="inner", strategy="shuffle").count() == 0
    assert join(full, empty_r, on="k", how="left", strategy="shuffle").count() == 2
    assert join(full, empty_r, on="k", how="anti", strategy="shuffle").count() == 2


@pytest.mark.parametrize("strategy", ["broadcast", "shuffle"])
def test_mixed_key_dtypes_still_match(ray_session, strategy):
    """int64 keys on one side, float64 on the other: the same key value
    must co-locate and match (review finding: the bucket hash is
    dtype-sensitive, so un-promoted sides silently joined to nothing)."""
    import ray.data as rd

    from open_finance_lakehouse_ray.pipelines.join import join

    left = pd.DataFrame({"k": np.array([1, 2, 3, 5], dtype=np.int64), "v": [10, 20, 30, 50]})
    right = pd.DataFrame({"k": np.array([2.0, 5.0, 9.0]), "w": ["b", "e", "x"]})
    out = (
        join(rd.from_pandas(left), rd.from_pandas(right), on="k",
             how="inner", strategy=strategy, num_buckets=8)
        .to_pandas()
        .sort_values("k")
    )
    assert out["k"].astype("int64").tolist() == [2, 5]
    assert out["w"].tolist() == ["b", "e"]


@pytest.mark.parametrize("strategy", ["broadcast", "shuffle"])
def test_null_keys_never_match(ray_session, strategy):
    """SQL equi-join semantics: NULL keys match nothing (pandas merge
    would match NaN with NaN — review finding)."""
    import ray.data as rd

    from open_finance_lakehouse_ray.pipelines.join import join

    left = pd.DataFrame({"k": [1.0, None, 3.0], "v": [10, 20, 30]})
    right = pd.DataFrame({"k": [1.0, None], "w": ["a", "NULLROW"]})
    inner = join(rd.from_pandas(left), rd.from_pandas(right), on="k",
                 how="inner", strategy=strategy, num_buckets=4).to_pandas()
    assert inner["k"].tolist() == [1.0]

    lj = join(rd.from_pandas(left), rd.from_pandas(right), on="k",
              how="left", strategy=strategy, num_buckets=4).to_pandas()
    assert len(lj) == 3  # null-key left row kept, unmatched
    assert lj.loc[lj["k"].isna(), "w"].isna().all()


def test_null_keys_outer_unmatched_survive(ray_session):
    """FULL OUTER: null-key rows from BOTH sides are emitted exactly once
    as unmatched — never matched with each other."""
    import ray.data as rd

    from open_finance_lakehouse_ray.pipelines.join import join

    left = pd.DataFrame({"k": [1.0, None], "v": [10, 20]})
    right = pd.DataFrame({"k": [None, 4.0], "w": ["rnull", "r4"]})
    out = join(rd.from_pandas(left), rd.from_pandas(right), on="k",
               how="outer", strategy="shuffle", num_buckets=4).to_pandas()
    assert len(out) == 4  # 1-match-nothing, null-left, null-right, 4-match-nothing
    # the two null-key rows are distinct unmatched rows
    nulls = out[out["k"].isna()]
    assert len(nulls) == 2
    assert sorted(nulls["w"].fillna("~").tolist()) == ["rnull", "~"]


# ------------------------------------------------------------ as-of join


def _asof_frames():
    left = pd.DataFrame(
        {
            "g": ["a", "a", "a", "b", "b", "c"],
            "t": [10, 25, 40, 15, 30, 5],
            "lv": [1, 2, 3, 4, 5, 6],
        }
    )
    right = pd.DataFrame(
        {
            "g": ["a", "a", "b", "b", "x"],
            "t": [8, 25, 20, 35, 1],
            "rv": [100, 200, 300, 400, 500],
        }
    )
    return left, right


@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
def test_asof_join_matches_pandas(ray_session, direction):
    """Distributed as-of equals single-frame pandas merge_asof across
    every direction (bucketing must not change semantics)."""
    import ray.data as rd

    from open_finance_lakehouse_ray.pipelines.join import asof_join

    left, right = _asof_frames()
    got = (
        asof_join(rd.from_pandas(left), rd.from_pandas(right),
                  on="t", by="g", direction=direction, num_buckets=4)
        .to_pandas()
        .sort_values(["g", "t"])
        .reset_index(drop=True)
    )
    want = pd.merge_asof(
        left.sort_values("t"), right.sort_values("t"),
        on="t", by="g", direction=direction,
    ).sort_values(["g", "t"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["g", "t", "lv", "rv"]], want[["g", "t", "lv", "rv"]]
    )


def test_asof_join_strict_and_tolerance(ray_session):
    import ray.data as rd

    from open_finance_lakehouse_ray.pipelines.join import asof_join

    left, right = _asof_frames()
    # strict: the a@25 click must NOT take the a@25 view, falls back to a@8
    strict = (
        asof_join(rd.from_pandas(left), rd.from_pandas(right), on="t",
                  by="g", allow_exact_matches=False, num_buckets=4)
        .to_pandas().set_index(["g", "t"])
    )
    assert strict.loc[("a", 25), "rv"] == 100
    # tolerance: a@40 is 15 past a@25 -> with tolerance 10 it matches nothing
    tol = (
        asof_join(rd.from_pandas(left), rd.from_pandas(right), on="t",
                  by="g", tolerance=10, num_buckets=4)
        .to_pandas().set_index(["g", "t"])
    )
    assert pd.isna(tol.loc[("a", 40), "rv"])
    assert tol.loc[("a", 25), "rv"] == 200


def test_asof_join_null_keys_and_tiebreak(ray_session):
    import ray.data as rd

    from open_finance_lakehouse_ray.pipelines.join import asof_join

    left = pd.DataFrame({"g": ["a", None], "t": [10.0, 10.0], "lv": [1, 2]})
    right = pd.DataFrame(
        {"g": ["a", "a", None], "t": [5.0, 5.0, 5.0], "rv": [7, 9, 11]}
    )
    out = (
        asof_join(rd.from_pandas(left), rd.from_pandas(right), on="t",
                  by="g", right_tiebreak=["rv"], num_buckets=4)
        .to_pandas()
    )
    # null-by left row survives unmatched; null-by right row matches nothing
    assert len(out) == 2
    assert pd.isna(out.loc[out["g"].isna(), "rv"]).all()
    # equal-t right rows: tiebreak picks the LAST under (t, rv) sort -> 9
    assert out.loc[out["g"] == "a", "rv"].iloc[0] == 9
