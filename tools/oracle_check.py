"""Local mirror of the driver's correctness gate: run every ``queries()``
entry AND its ``oracle_sql()`` twin over the same sf dir, compare
row-count + schema + order-insensitive values (columns sorted by name).

Usage: python tools/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def to_pandas(result) -> pd.DataFrame:
    import pyarrow as pa
    import ray
    import ray.data as rd

    if isinstance(result, rd.Dataset):
        refs = result.to_arrow_refs()
        got = [t for t in ray.get(refs) if t.num_rows] if refs else []
        if got:
            result = pa.concat_tables(got, promote_options="default")
        elif refs:  # non-empty plan, zero rows: keep the real schema
            result = ray.get(refs[0])
        else:  # zero blocks: synthesize the empty table from the schema
            sch = result.schema()
            result = pa.schema(
                list(zip(sch.names, sch.types))
            ).empty_table()
    if isinstance(result, pa.Table):
        # keep native timestamp resolution — the default ns coercion would
        # hide exactly the unit drift this mirror exists to catch
        return result.to_pandas(coerce_temporal_nanoseconds=False)
    return result


# Queries whose float columns may legitimately differ in the last ulp
# between numpy and DuckDB arithmetic.  EMPTY by default: the driver's gate
# hashes exact values, so the mirror must too.  Add a name here only with a
# written justification — every entry weakens the mirror for that query.
FLOAT_ATOL: dict[str, float] = {}


def canon(df: pd.DataFrame) -> pd.DataFrame:
    """Canonicalize for a DRIVER-STRICT compare.

    Deliberately does NOT coerce datetime resolution (a timestamp[s] vs
    timestamp[us] drift must fail here like it fails the driver's
    epoch-integer value hash — round-3's ``ev_ohlc_daily_rollup`` bug) and
    does NOT round floats.  Integer width and tz-naive object-NaN noise are
    normalized because the driver hashes values, not physical widths.
    """
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            pass  # keep native resolution — unit drift MUST mismatch
        elif df[c].dtype == object:
            df[c] = df[c].where(pd.notna(df[c]), None)
        elif pd.api.types.is_bool_dtype(df[c]):
            df[c] = df[c].astype(bool)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(name: str, got: pd.DataFrame, exp: pd.DataFrame) -> list[str]:
    """Return a list of mismatch descriptions (empty == pass)."""
    problems: list[str] = []
    if len(got) != len(exp):
        problems.append(f"rows ray={len(got)} sql={len(exp)}")
    if list(got.columns) != list(exp.columns):
        problems.append(f"cols ray={list(got.columns)} sql={list(exp.columns)}")
    if problems:
        return problems
    for c in got.columns:
        g, x = got[c], exp[c]
        if str(g.dtype) != str(x.dtype):
            # the driver hashes values; dtype drift matters when it changes
            # the hashed value (datetime unit) — flag ALL dtype drift so the
            # mirror is strictly stronger, not weaker, than the driver
            problems.append(f"dtype[{c}] ray={g.dtype} sql={x.dtype}")
            continue
        atol = FLOAT_ATOL.get(name, 0.0)
        try:
            if pd.api.types.is_float_dtype(g) and atol > 0.0:
                pd.testing.assert_series_equal(
                    g, x, check_exact=False, atol=atol, rtol=0.0
                )
            else:
                pd.testing.assert_series_equal(g, x, check_exact=True)
        except AssertionError as ex:
            problems.append(f"values[{c}]: " + str(ex).splitlines()[-1])
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    ray.init(address="local", num_cpus=8, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as e

    qs = e.queries()
    oracles = e.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    failed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = canon(to_pandas(fn(sf_dir)))
        except Exception as ex:  # noqa: BLE001
            print(f"[{name}] RAY ERROR: {ex}")
            failed.append(name)
            continue
        elapsed = time.time() - t0
        if name not in oracles:
            print(f"[{name}] rows-only: {len(got)} rows ({elapsed:.1f}s)")
            continue
        try:
            exp = canon(con.execute(oracles[name]).df())
        except Exception as ex:  # noqa: BLE001
            print(f"[{name}] ORACLE SQL ERROR: {ex}")
            failed.append(name)
            continue
        problems = compare(name, got, exp)
        if problems:
            failed.append(name)
            print(f"[{name}] FAIL ({elapsed:.1f}s): " + " | ".join(problems))
        else:
            print(f"[{name}] OK ({len(got)} rows, {elapsed:.1f}s)")
    ray.shutdown()
    print("FAILED:", failed if failed else "none")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
