"""Registry-driven tables/marts/contracts: adding a table or mart is a
YAML-only change; a failing mart check withholds publication and the
previous mart version remains readable."""

from __future__ import annotations

import os
import textwrap

import pyarrow as pa
import pytest

from open_finance_lakehouse_ray.pipelines.checks import CheckError
from open_finance_lakehouse_ray.pipelines.marts import build_mart, read_mart
from open_finance_lakehouse_ray.registry import (
    build_registry_marts,
    ingest_table,
    load_registry,
    maintain_table,
)
from open_finance_lakehouse_ray.sources.transcripts import build_transcripts
from open_finance_lakehouse_ray.state import TableLog

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def registry_file(tmp_path):
    path = tmp_path / "registry.yml"
    path.write_text(textwrap.dedent(f"""
        base: {tmp_path}
        tables:
          transcripts_a:
            root: "{{base}}/ta"
            contract: builtin
            maintenance: {{target_bytes: 8388608, keep_last: 1}}
            checks: [unique_keys, manifest_stats]
          transcripts_b:
            root: "{{base}}/tb"
            contract: builtin
            maintenance: {{target_bytes: 4194304}}
            checks: [manifest_stats]
          events:
            root: "{{base}}/ev"
            contract: events
            sort_by: []
        marts:
          pricing:
            root: "{{base}}/marts/pricing"
            query: li_pricing_summary
            checks: ["non_empty", "min_rows:2"]
        contracts:
          events:
            columns:
              event_id: int64
              ts: "timestamp[us]"
              value: double
            required_non_null: [event_id]
            bounds:
              value: [0, 1000000]
    """))
    return str(path)


def _land(reg, table, seed, ray_session):
    import ray.data as rd

    tab = build_transcripts(seed=seed, n_convs=30)
    ingest_table(
        reg, table, rd.from_arrow(tab).repartition(8),
        job_id=f"land-{table}", keys_unique=True,
    )
    return tab


def test_registry_maintenance_two_tables(ray_session, registry_file):
    """Two tables maintained purely from YAML config — adding the second
    was a YAML-only change (no code)."""
    reg = load_registry(registry_file)
    _land(reg, "transcripts_a", 31, ray_session)
    _land(reg, "transcripts_b", 32, ray_session)
    out_a = maintain_table(reg, "transcripts_a", job_id="m-a")
    out_b = maintain_table(reg, "transcripts_b", job_id="m-b")
    assert out_a["checks"]["unique_keys"] == 0
    assert "unique_keys" not in out_b["checks"]  # per-table suite differs
    assert TableLog(reg.table_root("transcripts_a")).snapshot().version >= 2


def test_registry_contract_enforced(ray_session, registry_file):
    import ray.data as rd

    from open_finance_lakehouse_ray.stages.validate import ContractViolation

    reg = load_registry(registry_file)
    good = pa.table({
        "event_id": pa.array([1, 2], pa.int64()),
        "ts": pa.array([1, 2], pa.timestamp("us")),
        "value": pa.array([1.0, 2.0]),
        "extra": ["x", "y"],  # dropped by conform
    })
    ingest_table(reg, "events", rd.from_arrow(good), job_id="ev-good")
    got = read_mart(reg.table_root("events"))
    assert got.column_names == ["event_id", "ts", "value"]

    bad = pa.table({
        "event_id": pa.array([3], pa.int64()),
        "ts": pa.array([3], pa.timestamp("us")),
        "value": pa.array([2_000_000.0]),  # above bound
    })
    with pytest.raises(ContractViolation):
        ingest_table(reg, "events", rd.from_arrow(bad), job_id="ev-bad")
    # failed ingest published nothing
    assert read_mart(reg.table_root("events")).num_rows == 2


def test_registry_marts_build_and_lineage(ray_session, registry_file):
    reg = load_registry(registry_file)
    out = build_registry_marts(reg, SF, job_prefix="mb")
    assert out["pricing"] == 1
    root = reg.marts["pricing"]["root"]
    snap = TableLog(root).snapshot()
    assert snap.summary["mart"] == "pricing"
    assert snap.summary["lineage"]["query"] == "li_pricing_summary"
    assert read_mart(root).num_rows >= 2


def test_failing_mart_check_withholds_publication(ray_session, tmp_path):
    root = str(tmp_path / "mart")
    v1 = pa.table({"k": [1, 2], "v": [10.0, 20.0]})
    snap1 = build_mart(root, v1, name="m", job_id="b1",
                       checks=("non_empty", "unique:k"))
    assert snap1.version == 1

    # candidate with duplicate keys: must NOT be published
    v2 = pa.table({"k": [1, 1], "v": [1.0, 2.0]})
    with pytest.raises(CheckError):
        build_mart(root, v2, name="m", job_id="b2",
                   checks=("non_empty", "unique:k"))
    log = TableLog(root)
    assert log.current_version() == 1  # previous version still the head
    assert read_mart(root)["v"].to_pylist() == [10.0, 20.0]

    # a passing rebuild publishes v2 as an overwrite
    v3 = pa.table({"k": [1, 2, 3], "v": [1.0, 2.0, 3.0]})
    snap3 = build_mart(root, v3, name="m", job_id="b3",
                       checks=("non_empty", "unique:k"))
    assert snap3.version == 2
    assert read_mart(root).num_rows == 3
    # time travel back to the first build
    assert read_mart(root, version=1).num_rows == 2


def test_mart_check_parsers():
    from open_finance_lakehouse_ray.pipelines.marts import parse_check

    t = pa.table({"a": [1, 2, 2], "b": [0.5, 1.5, 9.9]})
    assert parse_check("non_empty")(t).num_rows == 0
    assert parse_check("min_rows:4")(t).num_rows == 1
    assert parse_check("unique:a")(t).num_rows == 1
    assert parse_check("no_nulls:a,b")(t).num_rows == 0
    assert parse_check("in_range:b,0,10")(t).num_rows == 0
    assert parse_check("in_range:b,0,5")(t).num_rows == 1
    with pytest.raises(ValueError):
        parse_check("bogus")


def test_export_table_roundtrip(ray_session, tmp_path):
    """Gold export: stable part names, complete-last manifest, resumable
    re-export, and a DuckDB read of the export equals the source scan."""
    import duckdb
    import ray.data as rd

    from open_finance_lakehouse_ray.pipelines.export import (
        export_table,
        read_export_manifest,
    )
    from open_finance_lakehouse_ray.pipelines.ingest import ingest_dataset

    root = str(tmp_path / "src")
    dest = str(tmp_path / "out")
    tab = build_transcripts(seed=41, n_convs=20)
    ingest_dataset(rd.from_arrow(tab).repartition(4), root, job_id="i",
                   summary={"keys_unique": True, "key_cols": ["conv_id", "turn_idx"]})

    m1 = export_table(root, dest)
    assert m1["status"] == "complete"
    assert all(f["status"] == "exported" for f in m1["files"])
    assert read_export_manifest(dest)["snapshot_version"] == 1

    con = duckdb.connect()
    n = con.execute(
        "SELECT COUNT(*) FROM read_parquet($1)", [os.path.join(dest, "part-*.parquet")]
    ).fetchone()[0]
    assert n == tab.num_rows

    # re-export: everything skips (resumable)
    m2 = export_table(root, dest)
    assert all(f["status"] == "skipped" for f in m2["files"])


def test_resilient_read_skips_bad_files(ray_session, tmp_path):
    """S8 retry/skip-not-fail: corrupt + missing files are retried then
    routed to the skip report; readable files land normally; on_error=fail
    raises after retries."""
    import pyarrow.parquet as pq
    import ray.data as rd  # noqa: F401

    from open_finance_lakehouse_ray.sources.resilient import read_parquet_resilient

    good1 = str(tmp_path / "g1.parquet")
    good2 = str(tmp_path / "g2.parquet")
    corrupt = str(tmp_path / "bad.parquet")
    missing = str(tmp_path / "gone.parquet")
    pq.write_table(pa.table({"x": [1, 2]}), good1)
    pq.write_table(pa.table({"x": [3]}), good2)
    with open(corrupt, "wb") as f:
        f.write(b"not a parquet file")

    rr = read_parquet_resilient(
        [good1, corrupt, good2, missing], max_retries=1, backoff_s=0.01
    )
    assert sorted(rr.dataset.to_pandas()["x"].tolist()) == [1, 2, 3]
    rep = rr.report().to_pandas()
    assert sorted(os.path.basename(p) for p in rep["path"]) == [
        "bad.parquet", "gone.parquet"
    ]
    assert (rep["attempts"] == 2).all()

    with pytest.raises(IOError):
        read_parquet_resilient(
            [good1, corrupt], max_retries=0, on_error="fail"
        )


def test_partitioned_export_roundtrip(ray_session, tmp_path):
    """Hive-partitioned export: per-role directories readable by DuckDB,
    per-partition counts recorded, manifest written last."""
    import duckdb
    import ray.data as rd

    from open_finance_lakehouse_ray.pipelines.export import (
        export_table_partitioned,
        read_export_manifest,
    )
    from open_finance_lakehouse_ray.pipelines.ingest import ingest_dataset
    from open_finance_lakehouse_ray.sources.transcripts import build_transcripts

    root = str(tmp_path / "tbl")
    dest = str(tmp_path / "gold")
    tab = build_transcripts(seed=11, n_convs=20)
    ingest_dataset(rd.from_arrow(tab).repartition(4), root, job_id="pe-ingest")

    man = export_table_partitioned(root, dest, by="role")
    assert man == read_export_manifest(dest)
    assert man["total_rows"] == tab.num_rows

    con = duckdb.connect()
    for p in man["partitions"]:
        n = con.execute(
            f"SELECT COUNT(*) FROM '{dest}/role={p['role']}/*.parquet'"
        ).fetchone()[0]
        assert n == p["rows"]

    # re-export after the table changes: stale parts must be cleared so
    # per-partition counts still match exactly
    tab2 = build_transcripts(seed=12, n_convs=9)
    ingest_dataset(rd.from_arrow(tab2).repartition(2), root,
                   job_id="pe-ingest-2", mode="overwrite")
    man2 = export_table_partitioned(root, dest, by="role")
    assert man2["total_rows"] == tab2.num_rows
    for p in man2["partitions"]:
        n = con.execute(
            f"SELECT COUNT(*) FROM '{dest}/role={p['role']}/*.parquet'"
        ).fetchone()[0]
        assert n == p["rows"]
    con.close()


def test_non_transcript_table_without_sort_by(ray_session, tmp_path):
    """A registered table whose YAML omits sort_by must ingest unsorted —
    not crash on the transcript default (review finding: the implicit
    ('conv_id','turn_idx') default broke any non-transcript schema)."""
    import ray.data as rd

    path = tmp_path / "r.yml"
    path.write_text(textwrap.dedent(f"""
        base: {tmp_path}
        tables:
          metrics:
            root: "{{base}}/metrics"
            contract: metrics
        contracts:
          metrics:
            columns:
              event_id: int64
              value: double
    """))
    reg = load_registry(str(path))
    tbl = pa.table({"event_id": pa.array([3, 1, 2], pa.int64()),
                    "value": pa.array([0.3, 0.1, 0.2])})
    snap = ingest_table(reg, "metrics", rd.from_arrow(tbl), job_id="m1")
    assert snap.summary["rows"] == 3
    log = TableLog(os.path.join(str(tmp_path), "metrics"))
    assert log.current_version() == snap.version


def test_registry_scrubs_are_declarative_and_idempotent(ray_session, tmp_path):
    """Adding a retention delete / redaction update is a YAML-only change;
    re-running the same job prefix no-ops at the log level."""
    import pyarrow.compute as pc
    import ray.data as rd
    import yaml

    from open_finance_lakehouse_ray.pipelines.ingest import ingest_dataset
    from open_finance_lakehouse_ray.pipelines.scan import validation_scan
    from open_finance_lakehouse_ray.registry import load_registry, run_scrubs
    from open_finance_lakehouse_ray.sources.transcripts import build_transcripts
    from open_finance_lakehouse_ray.state.txlog import TableLog

    root = str(tmp_path / "t")
    tx = build_transcripts(n_convs=20)
    # several conv-contiguous files so the purge range leaves rows behind
    ingest_dataset(rd.from_arrow(tx).repartition(4), root, job_id="sc-base",
                   summary={"keys_unique": True, "key_cols": ["conv_id", "turn_idx"]})
    log = TableLog(root)
    f0 = log.files()[0].stats["conv_id"]
    reg_path = str(tmp_path / "reg.yml")
    with open(reg_path, "w") as f:
        yaml.safe_dump(
            {
                "tables": {
                    "t": {
                        "root": root,
                        "scrubs": {
                            "purge": {"action": "delete",
                                      "conv_id_range": list(f0)},
                            "redact": {"action": "update",
                                       "conv_id_range": ["conv-0", "conv-~"],
                                       "set": {"tool": "x"}},
                        },
                    }
                }
            },
            f,
        )
    reg = load_registry(reg_path)
    r1 = run_scrubs(reg, "t", job_prefix="scrub-run")
    assert r1["purge"]["deleted_rows"] > 0
    assert r1["redact"]["updated_rows"] > 0
    v = log.current_version()
    got = validation_scan(root)
    assert got.num_rows == tx.num_rows - r1["purge"]["deleted_rows"]
    n_tools = pc.sum(pc.cast(pc.fill_null(
        pc.equal(got["tool"], "x"), False), "int64")).as_py()
    assert n_tools == r1["redact"]["updated_rows"]
    # replay: both scrubs no-op on their job ids
    r2 = run_scrubs(reg, "t", job_prefix="scrub-run")
    assert log.current_version() == v
    assert r2["purge"]["version"] == r1["purge"]["version"]


def test_freshness_report_trips_on_stale_table(ray_session, tmp_path):
    """A table whose newest DATA timestamp is older than its declared
    freshness_sla reads stale; a fresh one doesn't; a declared-but-unlanded
    table is a breach (missing); no SLA -> unconfigured, age still
    reported. Data date, not run wall-clock, is the basis
    (ofl/ingestion/landing.py:22-33 semantics)."""
    import textwrap as tw
    import time

    import ray.data as rd

    from open_finance_lakehouse_ray.registry import (
        freshness_report,
        load_registry,
    )

    path = tmp_path / "registry.yml"
    path.write_text(tw.dedent(f"""
        base: {tmp_path}
        tables:
          fresh_t:
            root: "{{base}}/fresh"
            freshness_sla: 1d
          stale_t:
            root: "{{base}}/stale"
            freshness_sla: 30m
          missing_t:
            root: "{{base}}/missing"
            freshness_sla: 1h
          nosla_t:
            root: "{{base}}/nosla"
    """))
    reg = load_registry(str(path))

    from open_finance_lakehouse_ray.pipelines.ingest import ingest_dataset

    now = time.time()

    def with_ts(age_s: float) -> pa.Table:
        t = build_transcripts(n_convs=4)
        us = int((now - age_s) * 1e6)
        return t.set_column(
            t.column_names.index("ts"), "ts",
            pa.array([us] * t.num_rows, pa.timestamp("us")),
        )

    ingest_dataset(rd.from_arrow(with_ts(60.0)), reg.table_root("fresh_t"),
                   job_id="fr-a")
    ingest_dataset(rd.from_arrow(with_ts(7200.0)), reg.table_root("stale_t"),
                   job_id="fr-b")
    ingest_dataset(rd.from_arrow(with_ts(7200.0)), reg.table_root("nosla_t"),
                   job_id="fr-c")

    rep = freshness_report(reg, now=now)
    assert rep["fresh_t"]["status"] == "fresh"
    assert rep["fresh_t"]["basis"] == "data"
    assert rep["stale_t"]["status"] == "stale"
    assert rep["stale_t"]["age_s"] > 1800
    assert rep["missing_t"]["status"] == "missing"
    assert rep["nosla_t"]["status"] == "unconfigured"
    assert rep["nosla_t"]["age_s"] is not None


def test_freshness_falls_back_to_commit_basis_for_non_timestamp_ts(
    ray_session, tmp_path
):
    """A raw int64 epoch-SECONDS ts column has no recorded unit: assuming
    microseconds would misread age by ~1e6x and flip the verdict (round-4
    advice). The report must use the commit basis instead — and a
    just-committed table therefore reads fresh."""
    import textwrap as tw
    import time

    import ray.data as rd

    from open_finance_lakehouse_ray.pipelines.ingest import ingest_dataset
    from open_finance_lakehouse_ray.registry import (
        freshness_report,
        load_registry,
    )

    path = tmp_path / "registry.yml"
    path.write_text(tw.dedent(f"""
        base: {tmp_path}
        tables:
          rawts_t:
            root: "{{base}}/rawts"
            freshness_sla: 1h
    """))
    reg = load_registry(str(path))

    now = time.time()
    t = build_transcripts(n_convs=4)
    # epoch SECONDS as plain int64 — "old" if misread as microseconds
    t = t.set_column(
        t.column_names.index("ts"), "ts",
        pa.array([int(now - 60)] * t.num_rows, pa.int64()),
    )
    # validate=False keeps the raw int64 ts (the conforming cast would
    # canonicalize it to timestamp[us] and defeat the scenario)
    ingest_dataset(rd.from_arrow(t), reg.table_root("rawts_t"),
                   job_id="fr-raw", validate=False)

    rep = freshness_report(reg, now=time.time())
    assert rep["rawts_t"]["basis"] == "commit"
    assert rep["rawts_t"]["status"] == "fresh"

def test_emit_schedule_spec(tmp_path):
    """The registry-driven DAG emission (the reference's ofl_dags.py
    factory as a scheduler-agnostic JSON spec): per-table isolation,
    asset-any mart trigger, scrubs downstream of their maintain, hourly
    off-minute freshness DAG only when an SLA exists, runnable commands."""
    import json as _json
    import textwrap as tw

    from open_finance_lakehouse_ray.registry import emit_schedule

    path = tmp_path / "registry.yml"
    path.write_text(tw.dedent(f"""
        base: {tmp_path}
        tables:
          ta:
            root: "{{base}}/ta"
            freshness_sla: "36h"
            scrubs:
              drop_old: {{action: delete, ts_range: [0, 100]}}
          tb:
            root: "{{base}}/tb"
            schedule: "@hourly"
        marts:
          m1:
            root: "{{base}}/m1"
            query: ev_ohlc_daily_rollup
    """))
    reg = load_registry(str(path))
    spec = emit_schedule(reg, registry_path=str(path))
    assert _json.loads(_json.dumps(spec)) == spec  # JSON-serializable
    by_id = {d["dag_id"]: d for d in spec["dags"]}
    # one isolated DAG per table; YAML schedule override respected
    assert by_id["oflr_maintain_ta"]["schedule"] == "@daily"
    assert by_id["oflr_maintain_tb"]["schedule"] == "@hourly"
    ta = by_id["oflr_maintain_ta"]
    assert [t["task_id"] for t in ta["tasks"]] == ["maintain_ta", "scrubs_ta"]
    assert ta["tasks"][1]["upstream"] == ["maintain_ta"]
    assert all(d["max_active_runs"] == 1 for d in spec["dags"])
    # marts trigger on ANY table asset, never an all-tables barrier
    marts = by_id["oflr_marts"]
    assert marts["schedule"] == {"asset_any": ["table:ta", "table:tb"]}
    assert marts["tasks"][0]["task_id"] == "mart_m1"
    # SLA DAG present (ta declares one), off the :00 herd
    fresh = by_id["oflr_freshness"]
    assert fresh["schedule"].split()[0] != "0"
    assert fresh["tasks"][0]["retries"] == 0  # a breach pages, not retries
    # every command is this engine's own CLI with the registry path
    for d in spec["dags"]:
        for t in d["tasks"]:
            assert t["command"][:3] == ["python", "-m",
                                        "open_finance_lakehouse_ray.cli"]
            assert str(path) in t["command"]
    # without sf_dir, the one non-verbatim token is DECLARED in params
    assert spec["params"]["sf_dir"]["placeholder"] == "{sf_dir}"
    # with sf_dir + base, every command is verbatim-runnable and carries
    # the base override (round-5 review: scheduled runs must resolve the
    # same roots as the emitting invocation)
    spec_v = emit_schedule(reg, registry_path=str(path),
                           base="/mnt/prod", sf_dir="/data/sf")
    assert spec_v["params"] == {}
    mt = {d["dag_id"]: d for d in spec_v["dags"]}["oflr_marts"]["tasks"][0]
    assert "/data/sf" in mt["command"] and "{sf_dir}" not in mt["command"]
    for d in spec_v["dags"]:
        for t in d["tasks"]:
            i = t["command"].index("--base")
            assert t["command"][i + 1] == "/mnt/prod"
    # no tables without SLA -> no freshness DAG
    path2 = tmp_path / "r2.yml"
    path2.write_text(tw.dedent(f"""
        base: {tmp_path}
        tables:
          tc: {{root: "{{base}}/tc"}}
    """))
    spec2 = emit_schedule(load_registry(str(path2)), registry_path=str(path2))
    assert [d["dag_id"] for d in spec2["dags"]] == ["oflr_maintain_tc"]
