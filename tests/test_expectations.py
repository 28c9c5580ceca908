"""Table-scale expectation suites: one streaming pass for the scalar
expectations, bucketed shuffle for uniqueness, GX-style all-failures
reporting, and registry-driven gating of maintenance publication."""

from __future__ import annotations

import os
import textwrap

import pyarrow as pa
import pytest
import ray.data as rd

from open_finance_lakehouse_ray.pipelines.checks import CheckError
from open_finance_lakehouse_ray.pipelines.expectations import (
    expectation_check,
    parse_expectation,
    run_expectations,
)


def _events_ds():
    return rd.from_arrow(
        pa.table(
            {
                "event_id": pa.array([1, 2, 3, 4, 4], pa.int64()),
                "kind": pa.array(["click", "view", "click", "buy", None]),
                "value": pa.array([1.0, 2.5, None, 99.0, 3.0]),
            }
        )
    )


def test_passing_suite(ray_session):
    report = run_expectations(
        _events_ds(),
        [
            "no_nulls:event_id",
            "in_range:value,0,100",
            "accepted_values:kind,click|view|buy",
            "min_rows:3",
            "max_rows:10",
            "non_null_fraction:value,0.7",
        ],
    )
    assert all(v == "ok" for k, v in report.items() if k != "_rows")
    assert report["_rows"] == 5


def test_failing_suite_reports_all_failures(ray_session):
    with pytest.raises(CheckError) as ei:
        run_expectations(
            _events_ds(),
            [
                "no_nulls:value",          # 1 null
                "in_range:value,0,50",     # 99.0 out of range
                "min_rows:100",            # only 5 rows
                "unique:event_id",         # 4 duplicated
                "accepted_values:kind,click|view",  # 'buy' disallowed
            ],
        )
    v = ei.value.violations.to_pylist()
    failed = {r["expectation"] for r in v}
    assert failed == {
        "no_nulls:value", "in_range:value,0,50", "min_rows:100",
        "unique:event_id", "accepted_values:kind,click|view",
    }
    details = {r["expectation"]: r["detail"] for r in v}
    assert details["unique:event_id"] == "duplicate_keys:1"
    assert details["in_range:value,0,50"] == "out_of_range_rows:1"


def test_no_raise_mode_returns_report(ray_session):
    report = run_expectations(
        _events_ds(), ["min_rows:100"], raise_on_failure=False
    )
    assert report["min_rows:100"].startswith("rows:5<")


def test_unknown_spec_rejected():
    with pytest.raises(ValueError):
        parse_expectation("frobnicate:x")


def test_suite_over_table_root_prunes_columns(ray_session, tmp_path):
    """Root-based evaluation scans only the referenced columns and reads
    the committed table."""
    from open_finance_lakehouse_ray.pipelines.ingest import ingest_dataset
    from open_finance_lakehouse_ray.sources.transcripts import build_transcripts

    root = str(tmp_path / "t")
    ingest_dataset(
        rd.from_arrow(build_transcripts(seed=5, n_convs=40)), root, job_id="i1"
    )
    report = run_expectations(
        root,
        ["no_nulls:conv_id,turn_idx", "in_range:turn_idx,0,100000",
         "unique:conv_id,turn_idx"],
    )
    assert all(v == "ok" for k, v in report.items() if k != "_rows")
    assert report["_rows"] > 0


def test_expectation_check_adapts_to_check_shape(ray_session, tmp_path):
    from open_finance_lakehouse_ray.pipelines.ingest import ingest_dataset
    from open_finance_lakehouse_ray.sources.transcripts import build_transcripts

    root = str(tmp_path / "t")
    ingest_dataset(
        rd.from_arrow(build_transcripts(seed=5, n_convs=10)), root, job_id="i1"
    )
    ok = expectation_check(["no_nulls:conv_id"])(root)
    assert ok.num_rows == 0
    bad = expectation_check(["min_rows:10000000"])(root)
    assert bad.num_rows == 1


def test_registry_expectations_gate_maintenance(ray_session, tmp_path):
    """A registered table's YAML expectations run with its check suite:
    a breach raises CheckError out of maintain_table and the head stays
    at the pre-breach version (maintain's rollback contract)."""
    from open_finance_lakehouse_ray.registry import (
        ingest_table,
        load_registry,
        maintain_table,
    )
    from open_finance_lakehouse_ray.sources.transcripts import build_transcripts
    from open_finance_lakehouse_ray.state import TableLog

    path = tmp_path / "r.yml"
    path.write_text(textwrap.dedent(f"""
        base: {tmp_path}
        tables:
          ok_table:
            root: "{{base}}/ok"
            contract: builtin
            expectations: ["no_nulls:conv_id", "min_rows:1"]
          bad_table:
            root: "{{base}}/bad"
            contract: builtin
            expectations: ["min_rows:10000000"]
    """))
    reg = load_registry(str(path))
    src = rd.from_arrow(build_transcripts(seed=9, n_convs=20))
    ingest_table(reg, "ok_table", src, job_id="i1")
    out = maintain_table(reg, "ok_table", job_id="m1")
    assert out["checks"]["expectations"] == 0

    ingest_table(reg, "bad_table", src, job_id="i1")
    bad_log = TableLog(os.path.join(str(tmp_path), "bad"))
    pre_files = {e.path for e in bad_log.files()}
    with pytest.raises(CheckError):
        maintain_table(reg, "bad_table", job_id="m1")
    # maintenance snapshots were WITHDRAWN: head restored to the
    # pre-maintenance file set by the rollback inside maintain()
    assert bad_log.snapshot().operation == "restore"
    assert {e.path for e in bad_log.files()} == pre_files
