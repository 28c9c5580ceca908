"""Declarative TABLE-SCALE expectation suites — the Great-Expectations
analog, evaluated distributed.

The reference keeps GX expectation-suite JSONs next to its notebooks
(``/root/reference/notebooks/gx/expectations/``) and enforces the same
shapes at publish time through per-mart SQL checks
(``ofl/transform/gold/runner.py:82-107``). The mart runner here already
covers small aggregates (:func:`..marts.parse_check` runs on a collected
Arrow table); this module is the BIG-table counterpart: the whole suite is
compiled into ONE streaming ``map_batches`` pass that emits per-batch
partial counters (O(batches × expectations) tiny rows — never the data),
which a driver-side fold turns into a verdict. Uniqueness is the one
expectation that genuinely needs co-location, so it runs as its own
bucketed shuffle (the same bounded-bucket pattern as
:func:`..checks.check_unique_keys`).

Spec strings (YAML-friendly, the registry's ``expectations:`` list):

- ``no_nulls:c1,c2``             — columns contain no NULLs
- ``non_null_fraction:col,frac`` — at least ``frac`` of rows non-null
- ``in_range:col,lo,hi``         — numeric column within [lo, hi]
- ``accepted_values:col,a|b|c``  — column values drawn from the set
- ``min_rows:N`` / ``max_rows:N``— table row-count bounds
- ``unique:c1,c2``               — no duplicate (c1, c2) key

At 100 TB the scalar suite is a single pruned-column read (only columns
any expectation references leave storage) with no shuffle; ``unique`` adds
one hash-bucket exchange over just its key columns.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from open_finance_lakehouse_ray.pipelines.checks import CheckError


@dataclass(frozen=True)
class _Expectation:
    spec: str
    kind: str
    columns: tuple[str, ...]
    # batch -> (bad_count, rows_seen_for_frac) partial
    partial: Callable[[pa.Table], tuple[int, int]] | None
    # (total_bad, total_rows) -> violation detail string or None
    verdict: Callable[[int, int], str | None]


def parse_expectation(spec: str) -> _Expectation:
    head, _, arg = spec.partition(":")

    if head == "no_nulls":
        cols = tuple(c.strip() for c in arg.split(","))

        def partial(t: pa.Table) -> tuple[int, int]:
            bad = 0
            for c in cols:
                bad += pc.sum(pc.is_null(t[c]).cast(pa.int64())).as_py() or 0
            return bad, t.num_rows

        return _Expectation(
            spec, head, cols, partial,
            lambda bad, rows: f"null_rows:{bad}" if bad else None,
        )

    if head == "non_null_fraction":
        col, frac_s = (x.strip() for x in arg.split(","))
        frac = float(frac_s)

        def partial(t: pa.Table) -> tuple[int, int]:
            nulls = pc.sum(pc.is_null(t[col]).cast(pa.int64())).as_py() or 0
            return nulls, t.num_rows

        def verdict(nulls: int, rows: int) -> str | None:
            got = (rows - nulls) / rows if rows else 1.0
            return f"non_null_fraction:{got:.6f}<{frac}" if got < frac else None

        return _Expectation(spec, head, (col,), partial, verdict)

    if head == "in_range":
        col, lo_s, hi_s = (x.strip() for x in arg.split(","))
        lo, hi = float(lo_s), float(hi_s)

        def partial(t: pa.Table) -> tuple[int, int]:
            v = pc.cast(t[col], pa.float64())
            out = pc.or_(pc.less(v, lo), pc.greater(v, hi))
            bad = pc.sum(pc.cast(out, pa.int64())).as_py() or 0  # null-safe: null -> not counted
            return bad, t.num_rows

        return _Expectation(
            spec, head, (col,), partial,
            lambda bad, rows: f"out_of_range_rows:{bad}" if bad else None,
        )

    if head == "accepted_values":
        col, vals_s = arg.split(",", 1)
        col = col.strip()
        vals = pa.array([v.strip() for v in vals_s.split("|")])

        def partial(t: pa.Table) -> tuple[int, int]:
            v = pc.drop_null(t[col])
            if len(v) == 0:
                return 0, t.num_rows
            if not v.type.equals(vals.type):
                v = pc.cast(v, vals.type)
            bad = pc.sum(
                pc.invert(pc.is_in(v, value_set=vals)).cast(pa.int64())
            ).as_py() or 0
            return bad, t.num_rows

        return _Expectation(
            spec, head, (col,), partial,
            lambda bad, rows: f"disallowed_rows:{bad}" if bad else None,
        )

    if head in ("min_rows", "max_rows"):
        n = int(arg)
        lo = head == "min_rows"
        return _Expectation(
            spec, head, (),
            lambda t: (0, t.num_rows),
            lambda bad, rows: (
                f"rows:{rows}{'<' if lo else '>'}{n}"
                if ((rows < n) if lo else (rows > n))
                else None
            ),
        )

    if head == "unique":
        cols = tuple(c.strip() for c in arg.split(","))
        return _Expectation(spec, head, cols, None, lambda bad, rows: None)

    raise ValueError(f"unknown expectation: {spec!r}")


def _unique_violation(
    ds: rd.Dataset, cols: tuple[str, ...], num_buckets: int
) -> str | None:
    """Duplicate-key count via one bounded hash-bucket shuffle over only
    the key columns (vectorized within each bucket)."""

    def tag(t: pa.Table) -> pa.Table:
        df = t.select(list(cols)).to_pandas()
        h = pd.util.hash_pandas_object(df.set_axis(range(len(df))), index=False)
        b = (h.to_numpy() % np.uint64(num_buckets)).astype(np.int64)
        return t.append_column("_xb", pa.array(b))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        c = g.groupby(list(cols), sort=False).size()
        return pd.DataFrame({"dups": [int((c > 1).sum())]})

    parts = (
        ds.select_columns(list(cols))
        .map_batches(tag, batch_format="pyarrow")
        .groupby("_xb")
        .map_groups(per_bucket, batch_format="pandas")
        .to_pandas()
    )
    dups = int(parts["dups"].sum()) if "dups" in parts.columns else 0
    return f"duplicate_keys:{dups}" if dups else None


def run_expectations(
    target: "str | rd.Dataset",
    specs: list[str],
    *,
    version: int | None = None,
    num_buckets: int = 32,
    raise_on_failure: bool = True,
) -> dict[str, Any]:
    """Evaluate a suite against a table root (pruned-column scan) or an
    existing Dataset. Returns ``{spec: "ok" | <violation detail>}`` plus
    ``_rows``; raises :class:`CheckError` listing EVERY failed
    expectation (a GX-style suite result, not first-failure) unless
    ``raise_on_failure=False``."""
    exps = [parse_expectation(s) for s in specs]

    if isinstance(target, str):
        from open_finance_lakehouse_ray.pipelines.scan import scan

        cols = sorted({c for e in exps for c in e.columns})
        ds = scan(target, version=version, columns=cols or None)
    else:
        ds = target

    scalar = [e for e in exps if e.partial is not None]
    report: dict[str, Any] = {}
    total_rows = 0
    if scalar:
        idxs = list(range(len(scalar)))

        def partials(t: pa.Table) -> pa.Table:
            bads, rows = [], []
            for e in scalar:
                b, r = e.partial(t)
                bads.append(b)
                rows.append(r)
            return pa.table(
                {
                    "_i": pa.array(idxs, pa.int64()),
                    "_bad": pa.array(bads, pa.int64()),
                    "_rows": pa.array(rows, pa.int64()),
                }
            )

        agg = (
            ds.map_batches(partials, batch_format="pyarrow")
            .groupby("_i")
            .sum(["_bad", "_rows"])
            .to_pandas()
        )
        sums = {
            int(r["_i"]): (int(r["sum(_bad)"]), int(r["sum(_rows)"]))
            for _, r in agg.iterrows()
        }
        for i, e in enumerate(scalar):
            bad, rows = sums.get(i, (0, 0))
            total_rows = max(total_rows, rows)
            report[e.spec] = e.verdict(bad, rows) or "ok"

    for e in exps:
        if e.kind == "unique":
            v = _unique_violation(ds, e.columns, num_buckets)
            report[e.spec] = v or "ok"

    report["_rows"] = total_rows
    failures = [
        {"expectation": s, "detail": d}
        for s, d in report.items()
        if s != "_rows" and d != "ok"
    ]
    if failures and raise_on_failure:
        raise CheckError("expectations", pa.Table.from_pylist(failures))
    return report


def expectation_check(specs: list[str], num_buckets: int = 32):
    """Adapt a suite into the ``run_checks`` / ``maintain`` check-function
    shape (``fn(root) -> violations table``) so a registry table's
    expectations gate publication exactly like the named checks."""

    def _check(root: str) -> pa.Table:
        try:
            run_expectations(root, specs, num_buckets=num_buckets)
        except CheckError as e:
            return e.violations
        return pa.table(
            {"expectation": pa.array([], pa.string()),
             "detail": pa.array([], pa.string())}
        )

    _check.__name__ = "expectations"
    return _check
