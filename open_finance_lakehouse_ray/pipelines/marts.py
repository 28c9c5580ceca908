"""Persisted mart runner — compute, CHECK, then publish, with lineage.

The reference's gold layer builds 12 SQL marts where per-mart checks run
between compute and publish and any violating row withholds the swap
(``/root/reference/ofl/transform/gold/runner.py:31-54,82-107``), and its
streaming lane records an ``nrt_build`` lineage row per publication
(``ofl/streaming/mart.py:60-123``). Same discipline here:

1. compute the mart (a query callable or a prepared table),
2. run the mart's checks against the CANDIDATE result — a breach raises
   before any commit, so the previously published version stays readable,
3. publish by overwrite-commit into the mart's own transaction-logged
   table, with the lineage (mart name, source, source versions, row count)
   in the snapshot summary — the ``nrt_build`` row, but transactional.

Marts are aggregates (small by construction); the checks run on the
collected Arrow table.
"""

from __future__ import annotations

import os
from typing import Any, Callable, Iterable

import pyarrow as pa
import pyarrow.parquet as pq

from open_finance_lakehouse_ray.pipelines.checks import CheckError
from open_finance_lakehouse_ray.state.txlog import Snapshot, TableLog

MartCheck = Callable[[pa.Table], pa.Table]  # returns violations


# ----------------------------------------------------- named check parsing

def parse_check(spec: str) -> MartCheck:
    """Compile a registry check string into a violations function.

    Supported: ``non_empty`` | ``min_rows:N`` | ``unique:c1,c2`` |
    ``no_nulls:c1,c2`` | ``in_range:col,lo,hi`` — the same shapes the
    reference's gold checks take (non-empty frame, key uniqueness, value
    bounds; ``runner.py:82-107``)."""
    import pyarrow.compute as pc

    head, _, arg = spec.partition(":")

    if head == "non_empty":
        def _ne(t: pa.Table) -> pa.Table:
            if t.num_rows > 0:
                return pa.table({"reason": pa.array([], pa.string())})
            return pa.table({"reason": ["empty_mart"]})
        return _ne

    if head == "min_rows":
        n = int(arg)

        def _mr(t: pa.Table) -> pa.Table:
            if t.num_rows >= n:
                return pa.table({"reason": pa.array([], pa.string())})
            return pa.table({"reason": [f"rows:{t.num_rows}<min:{n}"]})
        return _mr

    if head == "unique":
        cols = [c.strip() for c in arg.split(",")]

        def _uq(t: pa.Table) -> pa.Table:
            df = t.select(cols).to_pandas()
            dup = df[df.duplicated(cols, keep=False)].drop_duplicates()
            return pa.Table.from_pandas(dup, preserve_index=False)
        return _uq

    if head == "no_nulls":
        cols = [c.strip() for c in arg.split(",")]

        def _nn(t: pa.Table) -> pa.Table:
            bad = []
            for c in cols:
                n = pc.sum(pc.is_null(t[c]).cast(pa.int64())).as_py() or 0
                if n:
                    bad.append({"column": c, "nulls": n})
            return pa.Table.from_pylist(bad) if bad else pa.table(
                {"column": pa.array([], pa.string()),
                 "nulls": pa.array([], pa.int64())}
            )
        return _nn

    if head == "in_range":
        col, lo, hi = (x.strip() for x in arg.split(","))
        lo_f, hi_f = float(lo), float(hi)

        def _ir(t: pa.Table) -> pa.Table:
            mm = pc.min_max(pc.cast(t[col], pa.float64()))
            cmin, cmax = mm["min"].as_py(), mm["max"].as_py()
            bad = []
            if cmin is not None and (cmin < lo_f or cmax > hi_f):
                bad.append({"column": col, "min": cmin, "max": cmax})
            return pa.Table.from_pylist(bad) if bad else pa.table(
                {"column": pa.array([], pa.string()),
                 "min": pa.array([], pa.float64()),
                 "max": pa.array([], pa.float64())}
            )
        return _ir

    raise ValueError(f"unknown mart check: {spec!r}")


# ------------------------------------------------------------- build/read

def build_mart(
    mart_root: str,
    result: "pa.Table | Any",
    *,
    name: str,
    job_id: str,
    checks: Iterable[str | MartCheck] = ("non_empty",),
    sort_by: tuple[str, ...] = (),
    lineage: dict[str, Any] | None = None,
) -> Snapshot:
    """Check-then-publish one mart build. ``result`` is the computed mart
    (Arrow table, or a Ray Dataset that is collected — marts are small).
    Raises :class:`CheckError` WITHOUT committing on any violation: the
    previous mart version remains the head and stays readable."""
    import ray.data as rd

    if isinstance(result, rd.Dataset):
        import ray

        result = pa.concat_tables(
            [t for t in ray.get(result.materialize().to_arrow_refs())
             if t.num_rows > 0]
            or [pa.table({})]
        )

    for spec in checks:
        fn = parse_check(spec) if isinstance(spec, str) else spec
        violations = fn(result)
        if violations.num_rows:
            label = spec if isinstance(spec, str) else getattr(spec, "__name__", "check")
            raise CheckError(f"{name}:{label}", violations)

    from open_finance_lakehouse_ray.pipelines.ingest import ingest_dataset

    return ingest_dataset(
        rd.from_arrow(result),
        mart_root,
        job_id=job_id,
        mode="overwrite",
        validate=False,
        sort_within_files=sort_by,
        summary={
            "mart": name,
            "build": "mart_build",
            "mart_rows": result.num_rows,
            **({"lineage": lineage} if lineage else {}),
        },
    )


def read_mart(mart_root: str, version: int | None = None) -> pa.Table:
    """Read a mart at a version (time travel) — plain parquet reads over
    the manifest's file list."""
    log = TableLog(mart_root)
    paths = [os.path.join(log.root, e.path) for e in log.files(version)]
    if not paths:
        return pa.table({})
    return pa.concat_tables([pq.read_table(p) for p in paths])
