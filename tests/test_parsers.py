"""Parser tests against synthetic bytes — the reference's technique #4
(tests/test_b3_arquivos.py:22-30: handcrafted records with real layouts)."""

from __future__ import annotations

import pyarrow as pa

from open_finance_lakehouse_ray.functions import parsers as p


def test_decimal_comma():
    arr = pa.array(["12,34", "-0,5", "7", "abc", None])
    out = p.parse_decimal_comma(arr).to_pylist()
    assert out == [12.34, -0.5, 7.0, None, None]


def test_decimal_comma_thousands_dots():
    arr = pa.array(["1.234,56", "10.000.000,99", "2,5"])
    out = p.parse_decimal_comma(arr, thousands_dot=True).to_pylist()
    assert out == [1234.56, 10000000.99, 2.5]


def test_br_and_iso_dates_mixed():
    arr = pa.array(["29/02/2024", "2024-01-31", "31/02/2024", "garbage", None])
    out = p.parse_br_or_iso_date(arr).to_pylist()
    assert out[0].isoformat() == "2024-02-29T00:00:00"  # leap day parses
    assert out[1].isoformat() == "2024-01-31T00:00:00"
    assert out[2] is None  # impossible BR date -> null, not error
    assert out[3] is None and out[4] is None


def test_fixed_width_slicer_with_implied_decimals():
    # 24-byte synthetic layout: ticker[0:8] price[8:16] qty[16:24]
    lines = pa.array(
        [
            "PETR4   0001234500000100",
            "VALE3   0005432100000250",
        ]
    )
    out = p.slice_fixed_width(
        lines,
        {"ticker": (0, 8), "price": (8, 8), "qty": (16, 8)},
        implied_decimals={"price": 2},
    )
    assert out["ticker"].to_pylist() == ["PETR4", "VALE3"]
    assert out["price"].to_pylist() == [123.45, 543.21]
    assert out["qty"].to_pylist() == ["00000100", "00000250"]


def test_json_lines_tag_then_split():
    lines = pa.array(
        [
            '{"sym": "BTC", "px": 42}',
            'not json at all',
            '{"sym": "ETH"}',  # missing px
        ]
    )
    out = p.parse_json_lines(
        lines,
        {
            "sym": r'"sym": "(?P<sym>\w+)"',
            "px": r'"px": (?P<px>\d+)',
        },
    )
    assert out["_valid"].to_pylist() == [True, False, False]
    assert out["_reason"].to_pylist() == [
        None, "unparseable_json", "missing_required_fields",
    ]
    assert out["sym"].to_pylist() == ["BTC", None, "ETH"]


def test_jsonl_pinned_schema_and_routing(ray_session, tmp_path):
    """JSONL source: good lines land at the pinned schema (extra fields
    ignored, missing null-filled, ISO and epoch timestamps both accepted);
    malformed lines — bad JSON, non-object, type mismatch — route verbatim
    with a reason instead of failing the batch."""
    import json

    import pyarrow as pa

    from open_finance_lakehouse_ray.sources.jsonl import read_jsonl, split_valid

    schema = pa.schema([
        ("event_id", pa.int64()), ("ts", pa.timestamp("us")),
        ("event_type", pa.string()), ("value", pa.float64()),
    ])
    lines = [
        json.dumps({"event_id": 1, "ts": 1_700_000_000_000_000,
                    "event_type": "click", "value": 1.5, "extra": "ignored"}),
        json.dumps({"event_id": 2, "ts": "2023-11-14T22:13:20+00:00",
                    "event_type": "view"}),            # value missing -> null
        '{"event_id": 3, "ts": 17',                    # truncated JSON
        json.dumps([1, 2, 3]),                          # not an object
        json.dumps({"event_id": "four", "ts": 0,
                    "event_type": "x", "value": 0.0}),  # type mismatch
        json.dumps({"event_id": 5, "ts": True,
                    "event_type": "x", "value": 2.0}),  # bool is not epoch
    ]
    p = tmp_path / "in.jsonl"
    p.write_text("\n".join(lines) + "\n")
    good, dead = split_valid(read_jsonl(str(p), schema))
    g = good.to_pandas().sort_values("event_id").reset_index(drop=True)
    assert list(g["event_id"]) == [1, 2]
    assert g["value"].isna().tolist() == [False, True]
    # ISO string coerced to the same epoch as the int form
    assert int(g["ts"][1].value // 1000) == 1_700_000_000_000_000
    d = dead.to_pandas()
    assert len(d) == 4 and d["_reason"].str.startswith("jsonl:").all()
    # verbatim raw lines ride along for replay-after-fix
    assert '{"event_id": 3, "ts": 17' in set(d["_raw"])


def test_jsonl_routes_bigints_and_surrogates_per_line(ray_session, tmp_path):
    """Values that pass JSON parsing but would crash BATCH-level Arrow
    conversion (int64 overflow, lone-surrogate strings) must route their
    own line, never fail the batch; naive ISO timestamps are UTC."""
    import json

    import pyarrow as pa

    from open_finance_lakehouse_ray.sources.jsonl import read_jsonl, split_valid

    schema = pa.schema([("event_id", pa.int64()), ("ts", pa.timestamp("us")),
                        ("event_type", pa.string())])
    lines = [
        json.dumps({"event_id": 1, "ts": 0, "event_type": "ok"}),
        json.dumps({"event_id": 99999999999999999999999, "ts": 0,
                    "event_type": "big"}),          # > int64
        '{"event_id": 2, "ts": 0, "event_type": "\\ud800"}',  # lone surrogate
        json.dumps({"event_id": 3, "ts": "2023-11-14T22:13:20",  # naive ISO
                    "event_type": "naive"}),
    ]
    p = tmp_path / "edge.jsonl"
    p.write_text("\n".join(lines) + "\n")
    good, dead = split_valid(read_jsonl(str(p), schema))
    g = good.to_pandas().sort_values("event_id").reset_index(drop=True)
    assert list(g["event_id"]) == [1, 3]
    # naive ISO interpreted as UTC, integer-exact epoch
    assert int(g["ts"][1].value // 1000) == 1_700_000_000_000_000
    assert dead.count() == 2
