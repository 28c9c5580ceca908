"""Edge cases the sf-testdata oracle gate cannot reach: empty results
(schema loss in Ray ``map_groups``), tie-breaking on equal timestamps,
and degenerate quantile inputs — each pinned against a DuckDB oracle on
a purpose-built tiny table."""

from __future__ import annotations

import os

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write_events(tmp_path, rows: list[tuple]) -> str:
    df = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value"]
    )
    df["ts"] = pd.to_datetime(df["ts"]).astype("datetime64[us]")
    df["props"] = "{}"
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   os.path.join(tmp_path, "events.parquet"))
    return str(tmp_path)


def _write_lineitem(tmp_path, pairs: list[tuple[int, int]]) -> str:
    df = pd.DataFrame(pairs, columns=["l_orderkey", "l_linenumber"])
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   os.path.join(tmp_path, "lineitem.parquet"))
    return str(tmp_path)


def test_gap_check_no_violations_returns_empty(ray_session, tmp_path):
    """All orders contiguous 1..max: every map_groups output is empty and
    Ray loses the schema — the query must still return a typed 0-row
    table, not crash (review finding)."""
    from open_finance_lakehouse_ray.pipelines.queries import q_li_gap_check

    sf = _write_lineitem(tmp_path, [(1, 1), (1, 2), (1, 3), (2, 1), (7, 1), (7, 2)])
    out = q_li_gap_check(sf)
    assert out.num_rows == 0
    assert out.column_names == ["l_orderkey", "n_lines", "max_line"]


def test_gap_check_finds_gap(ray_session, tmp_path):
    from open_finance_lakehouse_ray.pipelines.queries import q_li_gap_check

    sf = _write_lineitem(tmp_path, [(1, 1), (1, 3), (2, 1)])
    out = q_li_gap_check(sf).to_pandas()
    assert out["l_orderkey"].tolist() == [1]
    assert out["max_line"].tolist() == [3]


def test_interp_tie_on_equal_ts_matches_oracle(ray_session, tmp_path):
    """Two views share one timestamp around a purchase: the engine
    (bfill/ffill in (ts, event_id) order) and the SQL oracle
    (MIN/MAX over ROW(t, event_id, v)) must pick the SAME bracket
    (review finding: the old oracle tie-broke on value)."""
    from open_finance_lakehouse_ray.pipelines.queries import (
        Q_EV_INTERP_SQL,
        q_ev_interp_purchase,
    )

    t0 = "2025-01-01 00:00:00"
    t1 = "2025-01-01 00:01:00"
    t2 = "2025-01-01 00:02:00"
    sf = _write_events(
        tmp_path,
        [
            # below bracket: two views at the SAME ts, values ordered so
            # value-order and event_id-order disagree
            (10, t0, 1, "view", 5.0),
            (11, t0, 1, "view", 3.0),
            (20, t1, 1, "purchase", 0.0),
            # above bracket: same trick
            (30, t2, 1, "view", 9.0),
            (31, t2, 1, "view", 1.0),
        ],
    )
    got = q_ev_interp_purchase(sf).to_pandas()
    con = duckdb.connect()
    con.execute(
        f"create view events as select * from read_parquet('{sf}/events.parquet')"
    )
    want = con.execute(Q_EV_INTERP_SQL).df()
    con.close()
    assert len(got) == 1 and len(want) == 1
    # engine: below = event_id 11 (last at t0), above = event_id 30
    # (first at t2) → interp midpoint of 3.0 and 9.0
    assert got["interp_value"].iloc[0] == pytest.approx(6.0)
    assert got["interp_value"].iloc[0] == want["interp_value"].iloc[0]


def test_type_quantiles_constant_value(ray_session, tmp_path):
    """A type whose every value is identical: single pure bin, all
    quantiles equal that value (vmax == vmin degenerate grid)."""
    from open_finance_lakehouse_ray.pipelines.queries import q_ev_type_quantiles

    t0 = "2025-01-01 00:00:00"
    sf = _write_events(
        tmp_path,
        [(i, t0, 1, "flat", 7.5) for i in range(10)]
        + [(100 + i, t0, 2, "ramp", float(i)) for i in range(1, 101)],
    )
    out = q_ev_type_quantiles(sf).to_pandas().set_index("event_type")
    assert (out.loc["flat"] == 7.5).all()
    # percentile_disc over 1..100: rank ceil(q*100)
    assert out.loc["ramp", "p25"] == 25.0
    assert out.loc["ramp", "p50"] == 50.0
    assert out.loc["ramp", "p90"] == 90.0


def test_ohlc_open_close_are_physical_rows_incl_null(ray_session, tmp_path):
    """A window whose EARLIEST row carries a NULL value must report a NULL
    open (the SQL rn=1 semantics) — pandas groupby first() would silently
    skip to the first non-null and diverge from the oracle."""
    import duckdb
    import pyarrow.parquet as pq_

    from open_finance_lakehouse_ray.pipelines.queries import (
        Q_EV_OHLC_SQL,
        q_ev_ohlc_1m,
    )

    t = pa.table({
        "event_id": pa.array([1, 2, 3, 4], pa.int64()),
        "ts": pa.array([1_700_000_000_000_000 + i * 1_000_000 for i in range(4)],
                       pa.timestamp("us")),
        "user_id": pa.array([0] * 4, pa.int64()),
        "event_type": pa.array(["click"] * 4),
        "value": pa.array([None, 2.0, 3.0, None], pa.float64()),
        "props": pa.array(["{}"] * 4),
    })
    d = tmp_path / "sf"
    d.mkdir()
    pq_.write_table(t, d / "events.parquet")
    got = q_ev_ohlc_1m(str(d)).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{d}/events.parquet'")
    exp = con.execute(Q_EV_OHLC_SQL).df()
    con.close()
    assert got["open"].isna().tolist() == exp["open"].isna().tolist()
    assert got["close"].isna().tolist() == exp["close"].isna().tolist()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), exp[got.columns].reset_index(drop=True),
        check_dtype=False, atol=1e-9,
    )
    # the one 1-minute window holds all 4 events: open IS NULL, close IS NULL
    assert len(got) == 1 and pd.isna(got["open"][0]) and pd.isna(got["close"][0])
