"""Post-maintenance invariant checks — violations WITHHOLD publication.

The reference's gold checks return the violating rows and any row fails
the build before the previous mart is replaced
(``/root/reference/ofl/transform/gold/runner.py:82-107``); its fixtures
prove every check can actually fail (``tests/test_gold_marts.py:331-402``).
Same posture here: each check returns a (possibly empty) violations table;
:func:`run_checks` raises :class:`CheckError` on any non-empty result so a
caller can gate a snapshot publish on it.
"""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from open_finance_lakehouse_ray.functions.hashing import add_bucket_column
from open_finance_lakehouse_ray.pipelines.scan import scan
from open_finance_lakehouse_ray.state.txlog import TableLog


class CheckError(Exception):
    def __init__(self, name: str, violations: pa.Table):
        super().__init__(f"check '{name}' failed with {violations.num_rows} violation(s)")
        self.name = name
        self.violations = violations


def check_turn_contiguity(root: str, num_buckets: int = 32) -> pa.Table:
    """Conversations whose turn_idx set is not contiguous 0..max (the
    dense-grid assertion, ``checks/assert_macro_panel_has_no_month_gaps``
    analog). Distributed: bucket by conv hash, vectorized within."""
    ds = scan(root, columns=["conv_id", "turn_idx"])

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("conv_id")["turn_idx"].agg(["nunique", "max", "min"])
        bad = agg[
            (agg["nunique"] != agg["max"] - agg["min"] + 1) | (agg["min"] != 0)
        ].reset_index()
        return bad.rename(columns={"nunique": "n_turns", "max": "max_turn", "min": "min_turn"})

    # bucket on conv only (all turns of a conv must co-locate): reuse the
    # key bucketer with turn forced to 0
    def tag_conv(t: pa.Table) -> pa.Table:
        zero = pa.array([0] * t.num_rows, type=pa.int32())
        tagged = add_bucket_column(
            pa.table({"conv_id": t["conv_id"], "turn_idx": zero}), num_buckets
        )
        return t.append_column("_bucket", tagged["_bucket"])

    out = (
        ds.map_batches(tag_conv, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .to_pandas()
    )
    if "conv_id" not in out.columns:  # all buckets clean -> schemaless empty
        out = pd.DataFrame({"conv_id": [], "n_turns": [], "max_turn": [], "min_turn": []})
    out = out.sort_values("conv_id")
    return pa.Table.from_pandas(out.reset_index(drop=True), preserve_index=False)


def check_unique_keys(root: str, num_buckets: int = 32) -> pa.Table:
    """rows == distinct merge keys (the post-MERGE reconciliation
    invariant, ``ofl/streaming/metrics.py:109-117``): returns duplicated
    keys."""
    ds = scan(root, columns=["conv_id", "turn_idx"])

    def tag(t: pa.Table) -> pa.Table:
        return add_bucket_column(t, num_buckets)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        c = g.groupby(["conv_id", "turn_idx"]).size()
        bad = c[c > 1].rename("n").reset_index()
        return bad

    out = (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .to_pandas()
    )
    if "conv_id" not in out.columns:  # all buckets clean
        out = pd.DataFrame({"conv_id": [], "turn_idx": [], "n": []})
    return pa.Table.from_pandas(out.reset_index(drop=True), preserve_index=False)


def check_manifest_stats(root: str, version: int | None = None) -> pa.Table:
    """Every manifest entry's min/max must COVER its file's actual data
    (a lying z-range/stat would silently corrupt scan pruning — the
    bounds-check analog of ``assert_di_curve_points_are_bracketed``).
    Footer-only scan, parallelizable; driver-side here (metadata scale)."""
    log = TableLog(root)
    from open_finance_lakehouse_ray.pipelines.rewrite import footer_stats

    bad = []
    for e in log.files(version):
        actual = footer_stats(os.path.join(root, e.path))
        for col, (lo, hi) in ((c, v) for c, v in actual.items()):
            claimed = e.stats.get(col)
            if claimed is None:
                continue
            if claimed[0] > lo or claimed[1] < hi:
                bad.append(
                    {
                        "path": e.path,
                        "column": col,
                        "claimed_min": str(claimed[0]),
                        "claimed_max": str(claimed[1]),
                        "actual_min": str(lo),
                        "actual_max": str(hi),
                    }
                )
    return pa.Table.from_pylist(bad) if bad else pa.table(
        {"path": pa.array([], pa.string()), "column": pa.array([], pa.string()),
         "claimed_min": pa.array([], pa.string()), "claimed_max": pa.array([], pa.string()),
         "actual_min": pa.array([], pa.string()), "actual_max": pa.array([], pa.string())}
    )


def check_text_equality(root: str, oracle_fn, sample: int = 256, seed: int = 3) -> pa.Table:
    """Per-turn text equality against a pure-function oracle
    ``oracle_fn(conv_id, turn_idx) -> str`` on a seeded sample — the scan
    invariant that maintenance must never change query results. Returns
    mismatching (conv_id, turn_idx)."""
    import numpy as np

    log = TableLog(root)
    entries = log.files()
    rng = np.random.default_rng(seed)
    # sample a few files, then rows within (no full-table read)
    pick = rng.choice(len(entries), size=min(8, len(entries)), replace=False)
    bad = []
    per_file = max(1, sample // max(1, len(pick)))
    for i in pick:
        t = pq.read_table(
            os.path.join(root, entries[int(i)].path),
            columns=["conv_id", "turn_idx", "text"],
        )
        if t.num_rows == 0:
            continue
        rows = rng.choice(t.num_rows, size=min(per_file, t.num_rows), replace=False)
        for r in rows:
            cid = t["conv_id"][int(r)].as_py()
            tix = t["turn_idx"][int(r)].as_py()
            txt = t["text"][int(r)].as_py()
            expected = oracle_fn(cid, tix)
            if expected is not None and txt != expected:
                bad.append({"conv_id": cid, "turn_idx": tix})
    return pa.Table.from_pylist(bad) if bad else pa.table(
        {"conv_id": pa.array([], pa.string()), "turn_idx": pa.array([], pa.int32())}
    )


def check_log_constraints(root: str) -> pa.Table:
    """Validate the live snapshot against the table's ACTIVE log-carried
    constraints (``pipelines/alter.py``). Normally writers enforce these
    on the way in; this closes the alter/ingest race's residual window
    (rows committed concurrently with the ALTER that added the rule) and
    catches any out-of-band writer. Returns one row per breached
    constraint (name + reason) — empty when clean or unconstrained."""
    log = TableLog(root)
    constraints = log.table_constraints()
    empty = pa.table({"constraint": pa.array([], pa.string()),
                      "reason": pa.array([], pa.string())})
    if not constraints or log.current_version() is None:
        return empty
    from open_finance_lakehouse_ray.stages.contracts import (
        make_invariant_validator,
    )
    from open_finance_lakehouse_ray.stages.validate import ContractViolation

    # ONE scan with every validator chained — each raises with its own
    # constraint's name, so attribution survives the fused pipeline
    # (O(constraints) scans would multiply the maintenance gate's cost)
    ds = scan(root)
    for name in sorted(constraints):
        ds = ds.map_batches(
            make_invariant_validator(name, constraints[name]),
            batch_format="pyarrow",
        )
    try:
        ds.count()
    except ContractViolation as e:
        msg = str(e)
        return pa.Table.from_pylist(
            [{"constraint": msg.split(":", 1)[0].strip(), "reason": msg}]
        )
    except Exception as e:  # Ray wraps user exceptions
        msg = str(e)
        if "ContractViolation" not in msg:
            raise
        # take the RENDERED exception line ("...ContractViolation: <name>:
        # <detail>"), not the raise statement the traceback also quotes
        lines = [ln for ln in msg.splitlines() if "ContractViolation: " in ln]
        reason = (lines[-1] if lines else msg).split(
            "ContractViolation: ", 1
        )[-1].strip()
        return pa.Table.from_pylist(
            [{"constraint": reason.split(":", 1)[0].strip(), "reason": reason}]
        )
    return empty


def run_checks(root: str, checks: dict[str, object] | None = None) -> dict[str, int]:
    """Run the standard check suite; raise CheckError on the FIRST breach
    (publication is withheld before any snapshot swap)."""
    suite = checks or {
        "unique_keys": check_unique_keys,
        "manifest_stats": check_manifest_stats,
        "log_constraints": check_log_constraints,
    }
    report = {}
    for name, fn in suite.items():
        violations = fn(root)
        report[name] = violations.num_rows
        if violations.num_rows:
            raise CheckError(name, violations)
    return report
