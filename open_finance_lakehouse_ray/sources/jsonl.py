"""JSONL source — newline-delimited JSON with a PINNED schema and
malformed-line routing.

The reference's text sources parse semi-structured feeds into a pinned
frame and route rejects instead of failing the batch
(``/root/reference/ofl/streaming/bronze.py:142-182`` — the S11 pattern;
``functions/parsers.py`` implements it for fixed-width COTAHIST). This is
the same contract for JSONL, the interchange format most training-data
drops arrive in:

- the file is read as RAW LINES (``ray.data.read_text`` — streaming,
  splittable), never trusted as valid JSON;
- each batch parses and coerces to the caller's Arrow schema; a line that
  fails to parse, or a field that fails coercion, routes the WHOLE line
  verbatim with a reason (``_valid=false``, ``_reason``, ``_raw``) — the
  dead-letter discipline, replayable after a producer fix;
- JSON parsing is inherently per-record; the per-line loop runs inside
  ``map_batches`` (C-speed ``json.loads``), so it parallelizes across
  blocks like every other stage.

Coercions per Arrow type: ints/floats from JSON numbers (bool rejected —
JSON ``true`` is not ``1``), strings from strings, timestamps from epoch
integers in the column's unit or ISO-8601 strings. Missing fields
null-fill; EXTRA fields are ignored (forward-compatible producers).
"""

from __future__ import annotations

import json
from typing import Any

import pyarrow as pa
import ray.data as rd


def _int_bounds(typ: pa.DataType) -> tuple[int, int]:
    bw = typ.bit_width
    if pa.types.is_signed_integer(typ):
        return -(2 ** (bw - 1)), 2 ** (bw - 1) - 1
    return 0, 2**bw - 1


def _check_int(value: int, typ: pa.DataType, what: str) -> int:
    # JSON ints are arbitrary-precision; an unchecked out-of-range value
    # would crash the whole batch later at pa.array() (OverflowError /
    # ArrowInvalid) instead of routing the one line. Bounds come from the
    # PINNED column type — int32 rejects 2**40, uint64 accepts 2**63.
    lo, hi = _int_bounds(typ)
    if not (lo <= value <= hi):
        raise ValueError(f"{what} out of {typ} range: {value}")
    return value


def _coerce(value: Any, typ: pa.DataType):
    """One field to one Arrow type; raises ValueError on mismatch. Every
    check that could otherwise explode at BATCH-level Arrow conversion
    (bigints, lone-surrogate strings) happens here, per line — the
    routing contract is per-line, never per-batch."""
    if value is None:
        return None
    if pa.types.is_integer(typ):
        if isinstance(value, bool) or not isinstance(value, int):
            raise ValueError(f"expected integer, got {type(value).__name__}")
        return _check_int(value, typ, "integer")
    if pa.types.is_floating(typ):
        if isinstance(value, bool) or not isinstance(value, (int, float)):
            raise ValueError(f"expected number, got {type(value).__name__}")
        return float(value)
    if pa.types.is_string(typ) or pa.types.is_large_string(typ):
        if not isinstance(value, str):
            raise ValueError(f"expected string, got {type(value).__name__}")
        try:
            value.encode("utf-8")  # lone surrogates crash pa.array later
        except UnicodeEncodeError as e:
            raise ValueError(f"non-UTF-8 string: {e}") from e
        return value
    if pa.types.is_timestamp(typ):
        if isinstance(value, bool):
            raise ValueError("expected epoch int or ISO string, got bool")
        if isinstance(value, int):
            return _check_int(value, pa.int64(), "epoch")  # column-unit epoch
        if isinstance(value, str):
            import datetime as _dt

            try:
                dt = _dt.datetime.fromisoformat(value)
            except ValueError as e:
                raise ValueError(f"bad ISO timestamp: {value!r}") from e
            # a NAIVE ISO timestamp is UTC by contract — interpreting it
            # in the reader host's local zone would make the pinned output
            # host-dependent; epoch math is integer microseconds end to
            # end (float seconds lose precision at us/ns units)
            if dt.tzinfo is None:
                dt = dt.replace(tzinfo=_dt.timezone.utc)
            us = (dt - _dt.datetime(1970, 1, 1, tzinfo=_dt.timezone.utc)) \
                // _dt.timedelta(microseconds=1)
            unit = typ.unit
            if unit == "ns":
                value = us * 1000
            elif unit == "us":
                value = us
            elif unit == "ms":
                value = us // 1000
            else:  # "s"
                value = us // 10**6
            return _check_int(value, pa.int64(), "epoch")
        raise ValueError(f"expected epoch int or ISO string, got {type(value).__name__}")
    if pa.types.is_boolean(typ):
        if not isinstance(value, bool):
            raise ValueError(f"expected bool, got {type(value).__name__}")
        return value
    raise ValueError(f"unsupported pinned type {typ}")


def make_jsonl_parser(schema: pa.Schema):
    """``map_batches`` fn: raw-line batches → pinned-schema rows tagged
    ``_valid`` / ``_reason`` / ``_raw`` (malformed lines null-fill their
    data columns and carry the verbatim line for replay)."""

    names = list(schema.names)
    types = [schema.field(n).type for n in names]

    def parse(batch: pa.Table) -> pa.Table:
        lines = batch["text"].to_pylist()
        cols: dict[str, list] = {n: [] for n in names}
        valid: list[bool] = []
        reason: list[str | None] = []
        raw: list[str | None] = []
        for line in lines:
            row_reason = None
            values: dict[str, Any] = {}
            try:
                obj = json.loads(line)
                if not isinstance(obj, dict):
                    raise ValueError("line is not a JSON object")
                for n, t in zip(names, types):
                    values[n] = _coerce(obj.get(n), t)
            except (ValueError, json.JSONDecodeError) as e:
                row_reason = f"jsonl:{e}"
                values = {}
            ok = row_reason is None
            valid.append(ok)
            reason.append(row_reason)
            raw.append(None if ok else line)
            for n in names:
                cols[n].append(values.get(n))
        arrays = [
            pa.array(cols[n], type=t) for n, t in zip(names, types)
        ]
        out = pa.Table.from_arrays(arrays, names=names)
        return (
            out.append_column("_valid", pa.array(valid, pa.bool_()))
            .append_column("_reason", pa.array(reason, pa.string()))
            .append_column("_raw", pa.array(raw, pa.string()))
        )

    return parse


def read_jsonl(paths: str | list[str], schema: pa.Schema) -> rd.Dataset:
    """Streaming JSONL read at a pinned schema: one tagged Dataset —
    filter ``_valid`` for the good rows (then drop the tag columns), keep
    the complement as the routable dead-letter set."""
    return rd.read_text(paths).map_batches(
        make_jsonl_parser(schema), batch_format="pyarrow"
    )


def split_valid(ds: rd.Dataset) -> tuple[rd.Dataset, rd.Dataset]:
    """(good rows at the pinned schema, dead rows with reason+raw)."""
    import pyarrow.compute as pc

    def good(t: pa.Table) -> pa.Table:
        return t.filter(t["_valid"]).drop_columns(["_valid", "_reason", "_raw"])

    def bad(t: pa.Table) -> pa.Table:
        return t.filter(pc.invert(t["_valid"]))

    return (
        ds.map_batches(good, batch_format="pyarrow"),
        ds.map_batches(bad, batch_format="pyarrow"),
    )
