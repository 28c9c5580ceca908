"""Observability seam: env-gated metric push + lineage run events around
maintain/marts/CLI — no-ops locally, real payloads when the env points at a
gateway (stubbed here by monkeypatching the one transport function)."""

from __future__ import annotations

import textwrap

import pyarrow as pa
import pytest

from open_finance_lakehouse_ray import observability as obs
from open_finance_lakehouse_ray.sources.transcripts import build_transcripts


@pytest.fixture()
def captured(monkeypatch):
    calls: list[tuple[str, str, dict]] = []

    def fake_post(url, body, headers):
        calls.append((url, body.decode("utf-8"), headers))

    monkeypatch.setattr(obs, "_http_post", fake_post)
    return calls


def test_noop_without_env(captured, monkeypatch):
    monkeypatch.delenv("OFLR_PUSHGATEWAY_URL", raising=False)
    monkeypatch.delenv("OFLR_OPENLINEAGE_URL", raising=False)
    assert obs.push_table_metrics("t", rows=1) is False
    with obs.emit_run("job/x"):
        pass
    assert captured == []


def test_metric_push_payload(captured, monkeypatch):
    monkeypatch.setenv("OFLR_PUSHGATEWAY_URL", "http://gw:9091")
    ok = obs.push_table_metrics(
        "transcripts_a",
        labels={"table": "transcripts_a", "job_id": "m-1"},
        rows=123,
        files=4,
        dq_passed=True,
        last_data_epoch=1700000000.0,
    )
    assert ok is True
    (url, body, headers), = captured
    assert url == "http://gw:9091/metrics/job/oflr_maintenance/table/transcripts_a"
    assert headers["Content-Type"].startswith("text/plain")
    assert 'oflr_dq_passed{job_id="m-1",table="transcripts_a"} 1' in body
    assert 'oflr_dq_failed{job_id="m-1",table="transcripts_a"} 0' in body
    assert 'oflr_run_failed{job_id="m-1",table="transcripts_a"} 0' in body
    assert 'oflr_table_rows{job_id="m-1",table="transcripts_a"} 123' in body
    assert "oflr_table_last_success_timestamp_seconds" in body


def test_grouping_segment_base64_for_slash_and_empty(captured, monkeypatch):
    """A '/' in a grouping value must use the Pushgateway @base64 segment
    form (percent-encoding is un-escaped by Go's router); empty value
    encodes as a lone '=' (round-4 review)."""
    monkeypatch.setenv("OFLR_PUSHGATEWAY_URL", "http://gw:9091")
    assert obs.push_table_metrics("gold/daily", rows=1) is True
    (url, _, _), = captured
    assert url == ("http://gw:9091/metrics/job/oflr_maintenance/"
                   "table@base64/Z29sZC9kYWlseQ")
    assert obs._group_segment("table", "") == "table@base64/="
    # '.'/'..' would survive quote() un-escaped and be collapsed by Go's
    # path cleaning — they must take the base64 form too
    assert obs._group_segment("table", ".") == "table@base64/Lg"
    assert obs._group_segment("table", "..") == "table@base64/Li4"
    # plain values keep the readable percent-encoded form
    assert obs._group_segment("table", "a b") == "table/a%20b"


def test_metric_push_survives_gateway_error(monkeypatch):
    monkeypatch.setenv("OFLR_PUSHGATEWAY_URL", "http://gw:9091")

    def boom(url, body, headers):
        raise OSError("connection refused")

    monkeypatch.setattr(obs, "_http_post", boom)
    assert obs.push_table_metrics("t", rows=1) is False  # never raises


def test_lineage_events_start_complete_and_fail(captured, monkeypatch):
    import json

    monkeypatch.setenv("OFLR_OPENLINEAGE_URL", "http://ol:5000/api/v1/lineage")
    with obs.emit_run("maintain/transcripts_a"):
        pass
    states = [json.loads(b)["eventType"] for _, b, _ in captured]
    assert states == ["START", "COMPLETE"]
    ev = json.loads(captured[0][1])
    assert ev["job"] == {"namespace": "oflr", "name": "maintain/transcripts_a"}
    assert ev["run"]["runId"]

    captured.clear()
    with pytest.raises(RuntimeError):
        with obs.emit_run("maintain/x"):
            raise RuntimeError("boom")
    states = [json.loads(b)["eventType"] for _, b, _ in captured]
    assert states == ["START", "FAIL"]
    # both events carry the SAME runId
    assert (json.loads(captured[0][1])["run"]["runId"]
            == json.loads(captured[1][1])["run"]["runId"])


def test_maintain_table_emits_metrics_and_lineage(
    ray_session, tmp_path, captured, monkeypatch
):
    """The seam the verdict asked for: a maintain run pushes the table's
    gauge group AND the run-event pair (gateway stubbed)."""
    import json

    import ray.data as rd

    from open_finance_lakehouse_ray.registry import (
        ingest_table,
        load_registry,
        maintain_table,
    )

    monkeypatch.setenv("OFLR_PUSHGATEWAY_URL", "http://gw:9091")
    monkeypatch.setenv("OFLR_OPENLINEAGE_URL", "http://ol:5000/lineage")
    path = tmp_path / "registry.yml"
    path.write_text(textwrap.dedent(f"""
        base: {tmp_path}
        tables:
          t1:
            root: "{{base}}/t1"
            contract: builtin
            checks: [unique_keys, manifest_stats]
    """))
    reg = load_registry(str(path))
    tab = build_transcripts(seed=7, n_convs=20)
    ingest_table(reg, "t1", rd.from_arrow(tab).repartition(4),
                 job_id="obs-land", keys_unique=True)
    out = maintain_table(reg, "t1", job_id="obs-m")
    assert out["checks"]["unique_keys"] == 0

    lineage = [json.loads(b) for u, b, _ in captured if u.endswith("lineage")]
    assert [e["eventType"] for e in lineage] == ["START", "COMPLETE"]
    assert lineage[0]["job"]["name"] == "maintain/t1"

    pushes = [(u, b) for u, b, _ in captured if "metrics/job" in u]
    assert len(pushes) == 1
    url, body = pushes[0]
    assert url.endswith("/table/t1")
    assert f"oflr_table_rows" in body
    assert 'oflr_dq_passed{job_id="obs-m",table="t1"} 1' in body
    assert "oflr_table_last_success_timestamp_seconds" in body
    assert "oflr_run_failed" in body and "} 0" in body


def test_mart_check_failure_pushes_dq_gauge(ray_session, tmp_path, captured,
                                            monkeypatch):
    import json

    from open_finance_lakehouse_ray.pipelines.checks import CheckError
    from open_finance_lakehouse_ray.registry import (
        build_registry_marts,
        load_registry,
    )

    monkeypatch.setenv("OFLR_PUSHGATEWAY_URL", "http://gw:9091")
    path = tmp_path / "registry.yml"
    path.write_text(textwrap.dedent(f"""
        base: {tmp_path}
        tables: {{}}
        marts:
          pricing:
            root: "{{base}}/marts/pricing"
            query: li_pricing_summary
            checks: ["min_rows:999999"]
    """))
    reg = load_registry(str(path))
    with pytest.raises(CheckError):
        build_registry_marts(reg, "/root/testdata/sf0.001", job_prefix="obs")
    (url, body, _), = captured
    assert url.endswith("/table/pricing")
    assert 'oflr_dq_failed{mart="pricing",query="li_pricing_summary"} 1' in body
    assert "oflr_run_failed" in body


def test_mart_infra_failure_pushes_run_failed(tmp_path, captured, monkeypatch):
    """A non-CheckError mart failure (typo'd query name) must still push
    run_failed=1 — WITHOUT touching the dq gauges — or the gateway keeps
    serving the last success forever (round-4 review)."""
    from open_finance_lakehouse_ray.registry import (
        build_registry_marts,
        load_registry,
    )

    monkeypatch.setenv("OFLR_PUSHGATEWAY_URL", "http://gw:9091")
    path = tmp_path / "registry.yml"
    path.write_text(textwrap.dedent(f"""
        base: {tmp_path}
        tables: {{}}
        marts:
          broken:
            root: "{{base}}/marts/broken"
            query: no_such_query
    """))
    reg = load_registry(str(path))
    with pytest.raises(KeyError):
        build_registry_marts(reg, "/root/testdata/sf0.001", job_prefix="obs")
    (url, body, _), = captured
    assert url.endswith("/table/broken")
    assert "oflr_run_failed" in body and "} 1" in body
    assert "oflr_dq" not in body  # infra failure is not a DQ breach


def test_structured_logger_json_lines(capsys):
    log = obs.get_logger("oflr.test")
    log.info("compact_done", extra={"fields": {"files": 3, "table": "t1"}})
    err = capsys.readouterr().err.strip().splitlines()[-1]
    import json

    rec = json.loads(err)
    assert rec["event"] == "compact_done"
    assert rec["files"] == 3 and rec["table"] == "t1"
    assert rec["level"] == "info"


def test_emit_run_exit_code_semantics(captured, monkeypatch):
    """SystemExit(0) (--help / clean exit) is COMPLETE; a run body that
    flags status['failed'] (nonzero CLI rc) is FAIL (round-4 review)."""
    import json

    monkeypatch.setenv("OFLR_OPENLINEAGE_URL", "http://ol:5000/lineage")
    with pytest.raises(SystemExit):
        with obs.emit_run("cli/help"):
            raise SystemExit(0)
    assert [json.loads(b)["eventType"] for _, b, _ in captured] == [
        "START", "COMPLETE"]

    captured.clear()
    with pytest.raises(SystemExit):
        with obs.emit_run("cli/bad"):
            raise SystemExit(2)
    assert [json.loads(b)["eventType"] for _, b, _ in captured] == [
        "START", "FAIL"]

    captured.clear()
    with obs.emit_run("cli/check") as status:
        status["failed"] = True  # nonzero rc path
    assert [json.loads(b)["eventType"] for _, b, _ in captured] == [
        "START", "FAIL"]


def test_metrics_enabled_gates_expensive_payload_inputs(monkeypatch):
    """metrics_enabled() mirrors the push env guard so callers (e.g.
    registry.maintain_table's snapshot-chain ts-unit probe) can skip
    building payload inputs that push_table_metrics would discard
    (round-4 review finding)."""
    monkeypatch.delenv("OFLR_PUSHGATEWAY_URL", raising=False)
    assert obs.metrics_enabled() is False
    monkeypatch.setenv("OFLR_PUSHGATEWAY_URL", "http://gw:9091")
    assert obs.metrics_enabled() is True
