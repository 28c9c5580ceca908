"""Parser/normalizer family (SURVEY.md §2.2 M2–M4, §2.1 S9/S11): the
vectorized Arrow re-expressions of the reference's ingestion parsers.

All pure functions over Arrow arrays/tables — usable directly inside
``map_batches(batch_format="pyarrow")`` stages.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def parse_decimal_comma(arr: pa.Array | pa.ChunkedArray, *, thousands_dot: bool = False):
    """Brazilian decimal-comma strings -> float64 (M2).

    ``"1.234,56" -> 1234.56`` with ``thousands_dot=True`` (Tesouro CSVs,
    ``/root/reference/ofl/ingestion/tesouro.py:46``: strip thousands dots
    first); plain ``"12,34" -> 12.34`` otherwise
    (``ofl/ingestion/b3_arquivos.py:111-114``). Unparseable -> null.
    """
    s = pc.cast(arr, pa.string())
    if thousands_dot:
        s = pc.replace_substring(s, ".", "")
    s = pc.replace_substring(s, ",", ".")
    # strict=False analog: regex-validate then cast, nulls elsewhere
    ok = pc.match_substring_regex(s, r"^-?\d+(\.\d+)?$")
    return pc.if_else(ok, s, pa.scalar(None, pa.string())).cast(pa.float64())


def parse_br_or_iso_date(arr: pa.Array | pa.ChunkedArray) -> pa.Array:
    """``%d/%m/%Y`` or ``%Y-%m-%d`` -> timestamp[us]; bad rows -> null
    (M3 — the ``strict=False`` null-on-failure behavior of
    ``ofl/ingestion/bacen.py:126``, ``tesouro.py:42-43``)."""
    s = pc.cast(arr, pa.string())
    br = pc.match_substring_regex(s, r"^\d{2}/\d{2}/\d{4}$")
    iso = pc.match_substring_regex(s, r"^\d{4}-\d{2}-\d{2}$")

    def parse_strict(mask, fmt):
        cand = pc.strptime(
            pc.if_else(mask, s, pa.scalar(None, pa.string())), fmt, "us",
            error_is_null=True,
        )
        # Arrow's strptime ROLLS invalid dates over (31/02 -> 02/03);
        # a strftime round-trip catches them
        roundtrip = pc.strftime(cand, fmt)
        return pc.if_else(pc.equal(roundtrip, s), cand, pa.scalar(None, pa.timestamp("us")))

    out_br = parse_strict(br, "%d/%m/%Y")
    out_iso = parse_strict(iso, "%Y-%m-%d")
    return pc.if_else(pc.is_valid(out_br), out_br, out_iso)


def slice_fixed_width(
    lines: pa.Array | pa.ChunkedArray,
    fields: dict[str, tuple[int, int]],
    *,
    implied_decimals: dict[str, int] | None = None,
) -> pa.Table:
    """Fixed-width record parser (M4 — the COTAHIST 245-byte layout,
    ``ofl/ingestion/b3_cotahist.py:66-88``): ``fields`` maps column name ->
    (offset, length); ``implied_decimals`` divides a numeric field by
    10^d (the exchange's implied 2-decimal prices)."""
    s = pc.cast(lines, pa.string())
    cols = {}
    for name, (off, ln) in fields.items():
        piece = pc.utf8_trim_whitespace(pc.utf8_slice_codeunits(s, off, off + ln))
        d = (implied_decimals or {}).get(name)
        if d is not None:
            ok = pc.match_substring_regex(piece, r"^-?\d+$")
            num = pc.if_else(ok, piece, pa.scalar(None, pa.string())).cast(pa.float64())
            piece = pc.divide(num, float(10**d))
        cols[name] = piece
    return pa.table(cols)


def parse_json_lines(
    lines: pa.Array | pa.ChunkedArray, fields: dict[str, str]
) -> pa.Table:
    """Explicit-schema JSON-line parse with tag-then-split semantics
    (S11 — ``from_json`` with a pinned DDL so malformed lines become
    routable rows, ``ofl/streaming/bronze.py:109-142``): ``fields`` maps
    column -> regex capture for ``"key": value``. Emits ``_valid`` and
    ``_reason`` columns instead of raising."""
    s = pc.cast(lines, pa.string())
    shape_ok = pc.match_substring_regex(s, r"^\s*\{.*\}\s*$")
    cols: dict[str, pa.Array] = {}
    missing_any = None
    for name, pattern in fields.items():
        ext = pc.extract_regex(s, pattern)
        val = pc.struct_field(ext, name)
        cols[name] = val
        miss = pc.is_null(val)
        missing_any = miss if missing_any is None else pc.or_(missing_any, miss)
    valid = pc.and_(shape_ok, pc.invert(missing_any))
    reason = pc.if_else(
        pc.invert(shape_ok),
        pa.scalar("unparseable_json"),
        pc.if_else(missing_any, pa.scalar("missing_required_fields"), pa.scalar(None, pa.string())),
    )
    return pa.table({**cols, "_valid": valid, "_reason": reason})
