"""Log-carried constraints: enforcement on every ingest, existing-data
validation gating the ALTER, drop, and idempotent replay."""

from __future__ import annotations

import pytest
import ray.data as rd

from open_finance_lakehouse_ray.pipelines.alter import alter_constraints
from open_finance_lakehouse_ray.pipelines.ingest import ingest_dataset
from open_finance_lakehouse_ray.sources.transcripts import build_transcripts
from open_finance_lakehouse_ray.stages.validate import ContractViolation
from open_finance_lakehouse_ray.state.txlog import TableLog


def _bad_roles(tx):
    import pyarrow.compute as pc

    return tx.set_column(
        tx.column_names.index("role"), "role",
        pc.replace_substring(tx["role"], "user", "intruder"),
    )


def test_constraint_binds_every_ingest(ray_session, table_root):
    tx = build_transcripts(n_convs=20)
    ingest_dataset(rd.from_arrow(tx), table_root, job_id="al-base")
    log = TableLog(table_root)
    alter_constraints(
        table_root, job_id="al-add",
        add={"role_domain": {"allowed_values": {"role": ["user", "assistant", "tool"]}}},
    )
    assert "role_domain" in log.table_constraints()
    assert log.keys_unique() is False  # un-attested, but alter must not break the walk

    v = log.current_version()
    with pytest.raises(ContractViolation):
        ingest_dataset(
            rd.from_arrow(_bad_roles(build_transcripts(seed=3, n_convs=5))),
            table_root, job_id="al-bad", validate=False,
        )
    assert log.current_version() == v  # breach withheld the commit
    # clean data still lands
    ingest_dataset(
        rd.from_arrow(build_transcripts(seed=4, n_convs=5)),
        table_root, job_id="al-good", validate=False,
    )
    assert log.current_version() == v + 1


def test_alter_validates_existing_and_withholds(ray_session, table_root):
    tx = _bad_roles(build_transcripts(n_convs=10))
    ingest_dataset(rd.from_arrow(tx), table_root, job_id="al2-base", validate=False)
    log = TableLog(table_root)
    v = log.current_version()
    with pytest.raises(Exception) as ei:
        alter_constraints(
            table_root, job_id="al2-add",
            add={"role_domain": {
                "allowed_values": {"role": ["user", "assistant", "tool"]}}},
        )
    assert "ContractViolation" in str(ei.value) or isinstance(
        ei.value, ContractViolation
    )
    assert log.current_version() == v
    assert log.table_constraints() == {}


def test_drop_and_replay(ray_session, table_root):
    tx = build_transcripts(n_convs=10)
    ingest_dataset(rd.from_arrow(tx), table_root, job_id="al3-base")
    s1 = alter_constraints(
        table_root, job_id="al3-add",
        add={"ts_floor": {"bounds": {"turn_idx": [0, None]}}},
    )
    s2 = alter_constraints(
        table_root, job_id="al3-add",
        add={"ts_floor": {"bounds": {"turn_idx": [0, None]}}},
    )
    assert s1.version == s2.version
    alter_constraints(table_root, job_id="al3-drop", drop=["ts_floor"])
    assert TableLog(table_root).table_constraints() == {}


def test_run_checks_catches_constraint_breach(ray_session, table_root):
    """A table whose data violates its ACTIVE constraints (e.g. rows that
    slipped through the alter/ingest race window) fails run_checks."""
    from open_finance_lakehouse_ray.pipelines.checks import (
        CheckError,
        check_log_constraints,
        run_checks,
    )

    tx = build_transcripts(n_convs=8)
    ingest_dataset(rd.from_arrow(tx), table_root, job_id="rc-base",
                   summary={"keys_unique": True, "key_cols": ["conv_id", "turn_idx"]})
    # plant the constraint WITHOUT validating, simulating the race
    alter_constraints(
        table_root, job_id="rc-add", validate_existing=False,
        add={"no_tool_rows": {"allowed_values": {"role": ["user", "assistant"]}}},
    )
    v = check_log_constraints(table_root)
    assert v.num_rows == 1 and v["constraint"][0].as_py() == "no_tool_rows"
    with pytest.raises(CheckError):
        run_checks(table_root)
