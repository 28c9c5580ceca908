"""Declarative table / mart / contract registry — one YAML drives the engine.

The reference's whole extension surface is a single YAML registry
(``/root/reference/sources/registry.yml``) dispatched by handler name
(``ofl/ingestion/__init__.py:25-36``): adding a series, its schedule, its
contract and its marts is a config change. Same surface here:

.. code-block:: yaml

    base: /data/lake                # "{base}" substitutes into roots
    tables:
      transcripts:
        root: "{base}/transcripts"
        contract: transcript        # name under contracts:, or builtin
        maintenance:                # knobs forwarded to maintain()
          target_bytes: 100663296
          curve: morton
          recluster_overlap_threshold: 0.2
          retain_hours: 168
          keep_last: 1
        checks: [unique_keys, manifest_stats]
        expectations:               # table-scale GX-style suite
          - "no_nulls:conv_id"
          - "in_range:turn_idx,0,100000"
    marts:
      daily_ohlc:
        root: "{base}/marts/daily_ohlc"
        query: ev_ohlc_daily_rollup   # a pipelines.queries.QUERIES name
        checks: ["non_empty", "unique:event_type,day"]
    contracts:
      events:
        columns: {event_id: int64, ts: "timestamp[us]", value: double}
        required_non_null: [event_id, ts]

``maintain_table`` / ``build_registry_marts`` consume it; the CLI's
``registry`` subcommand is the thin driver. Adding a table or a mart is a
YAML-only change (covered by ``tests/test_registry.py``).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Any

import yaml

from open_finance_lakehouse_ray.stages.contracts import TableContract

TABLE_CHECKS = {
    "unique_keys": "check_unique_keys",
    "manifest_stats": "check_manifest_stats",
    "turn_contiguity": "check_turn_contiguity",
}


@dataclass(frozen=True)
class Registry:
    tables: dict[str, dict[str, Any]] = field(default_factory=dict)
    marts: dict[str, dict[str, Any]] = field(default_factory=dict)
    contracts: dict[str, TableContract] = field(default_factory=dict)

    def table_root(self, name: str) -> str:
        return self.tables[name]["root"]

    def contract_for(self, table: str) -> TableContract | None:
        cname = self.tables[table].get("contract")
        if cname is None or cname == "builtin":
            return None
        return self.contracts[cname]


def load_registry(path: str, *, base: str | None = None) -> Registry:
    """Parse the YAML registry; ``{base}`` in roots substitutes from the
    ``base:`` key (or the override argument)."""
    with open(path) as f:
        doc = yaml.safe_load(f) or {}
    base = base or doc.get("base") or os.path.dirname(os.path.abspath(path))

    def sub(root: str) -> str:
        return root.replace("{base}", base)

    tables = {}
    for name, cfg in (doc.get("tables") or {}).items():
        cfg = dict(cfg or {})
        cfg["root"] = sub(cfg["root"])
        tables[name] = cfg
    marts = {}
    for name, cfg in (doc.get("marts") or {}).items():
        cfg = dict(cfg or {})
        cfg["root"] = sub(cfg["root"])
        marts[name] = cfg
    contracts = {
        name: TableContract.from_dict(name, d)
        for name, d in (doc.get("contracts") or {}).items()
    }
    return Registry(tables=tables, marts=marts, contracts=contracts)


def _check_suite(names: list[str] | None) -> dict | None:
    if not names:
        return None
    from open_finance_lakehouse_ray.pipelines import checks as checks_mod

    suite = {}
    for n in names:
        try:
            suite[n] = getattr(checks_mod, TABLE_CHECKS[n])
        except KeyError:
            raise ValueError(f"unknown table check {n!r}") from None
    return suite


def maintain_table(reg: Registry, table: str, *, job_id: str) -> dict[str, Any]:
    """Run maintain() on one registered table with its YAML knobs and its
    named check suite (the per-table config of §2.10).

    Wrapped in the observability seam: an OpenLineage run event pair and a
    per-table gauge push (rows / files / dq verdict / freshness), both
    env-gated no-ops locally — the analog of the reference's Pushgateway +
    OL emission (``ofl/platform/metrics.py:58-117``, ``lineage.py:19-45``).
    """
    from open_finance_lakehouse_ray import observability as obs
    from open_finance_lakehouse_ray.pipelines.maintain import maintain

    cfg = reg.tables[table]
    m = cfg.get("maintenance") or {}
    suite = _check_suite(cfg.get("checks"))
    exp_specs = cfg.get("expectations")
    if exp_specs:
        from open_finance_lakehouse_ray.pipelines.expectations import (
            expectation_check,
        )

        suite = dict(suite or {})
        suite["expectations"] = expectation_check(list(exp_specs))
    # label name `job_id`, NOT `job`: the Pushgateway grouping key already
    # carries job=<group>, and grouping labels override (or 400-reject)
    # conflicting body labels — a `job` body label would silently vanish
    # (review finding, round 4)
    labels = {"table": table, "job_id": job_id}
    try:
        with obs.emit_run(f"maintain/{table}"):
            out = maintain(
                cfg["root"],
                job_id=job_id,
                target_bytes=int(m.get("target_bytes", 96 * 1024 * 1024)),
                curve=m.get("curve", "morton"),
                recluster_overlap_threshold=float(
                    m.get("recluster_overlap_threshold", 0.2)
                ),
                retain_seconds=float(m.get("retain_hours", 168.0)) * 3600.0,
                keep_last=int(m.get("keep_last", 1)),
                # the custom suite (named checks + YAML expectations) runs
                # INSIDE maintain(), so its rollback-on-breach contract
                # covers it: a violated expectation withdraws this run's
                # maintenance snapshots
                with_checks=suite is None,
                checks=suite,
            )
    except Exception as e:
        # only a DATA-QUALITY breach sets the dq gauges — an infrastructure
        # failure (disk full, worker OOM, stale log) must not page the DQ
        # alert route (review finding, round 4)
        from open_finance_lakehouse_ray.pipelines.checks import CheckError
        from open_finance_lakehouse_ray.stages.validate import ContractViolation

        is_dq = isinstance(e, (CheckError, ContractViolation))
        obs.push_table_metrics(table, labels=labels, failed=True,
                               dq_passed=False if is_dq else None)
        raise
    checks_out = out.get("checks") or {}
    report = out.get("report") or {}
    max_ts = report.get("max_ts")
    # the unit probe walks the snapshot chain + parses the schema — only
    # worth it when a gateway will actually receive the payload
    div = _ts_unit_div(cfg["root"]) if obs.metrics_enabled() else None
    obs.push_table_metrics(
        table,
        labels=labels,
        rows=report.get("rows"),
        files=report.get("files"),
        dq_passed=all(v == 0 for v in checks_out.values()) if checks_out else None,
        # freshness on the DATA date when the ts unit is provable (same
        # rule as freshness_report); omitted otherwise
        last_data_epoch=(
            max_ts / div if max_ts is not None and div is not None else None
        ),
        extra_gauges={
            "oflr_cluster_overlap": float(out.get("cluster_overlap") or 0.0)
        },
    )
    return out


def ingest_table(
    reg: Registry, table: str, source, *, job_id: str, mode: str = "append",
    keys_unique: bool | None = None,
) -> Any:
    """Land a Dataset into a registered table, enforcing its declared
    contract (a declarative contract replaces the builtin transcript
    validator when the YAML names one)."""
    from open_finance_lakehouse_ray.pipelines.ingest import ingest_dataset
    from open_finance_lakehouse_ray.stages.contracts import make_contract_validator

    cfg = reg.tables[table]
    contract = reg.contract_for(table)
    validate = True
    if contract is not None:
        source = source.map_batches(
            make_contract_validator(contract), batch_format="pyarrow"
        )
        validate = False
    summary = {}
    if keys_unique is not None:
        summary["keys_unique"] = keys_unique
    # record the table's merge-key names (YAML `key_cols`) so key-pairing
    # consumers (ChangeStream net fold) resolve from the log instead of
    # assuming a transcript default; an attested-unique ingest of the
    # builtin transcript contract implies the transcript key
    key_cols = cfg.get("key_cols")
    # an OMITTED contract key takes the same builtin-validation path as the
    # literal "builtin" (contract_for returns None, validate=True) — both
    # imply the transcript key (review finding, round 4)
    if key_cols is None and keys_unique and cfg.get("contract") in (None, "builtin"):
        key_cols = ["conv_id", "turn_idx"]
    if key_cols:
        summary["key_cols"] = list(key_cols)
    return ingest_dataset(
        source, cfg["root"], job_id=job_id, mode=mode, validate=validate,
        # no implicit transcript sort: a YAML without sort_by means the
        # table's columns are unknown here, and sorting by conv_id would
        # crash any non-transcript schema (same default as the mart path)
        sort_within_files=tuple(cfg.get("sort_by") or ()),
        summary=summary,
    )


def build_registry_marts(
    reg: Registry,
    sf_dir: str,
    *,
    job_prefix: str,
    names: list[str] | None = None,
) -> dict[str, Any]:
    """Build every registered mart (or the named subset) from the query
    registry, check-gated, with per-mart lineage."""
    from open_finance_lakehouse_ray import observability as obs
    from open_finance_lakehouse_ray.pipelines.checks import CheckError
    from open_finance_lakehouse_ray.pipelines.marts import build_mart
    from open_finance_lakehouse_ray.pipelines.queries import QUERIES

    out: dict[str, Any] = {}
    for name in names or list(reg.marts):
        cfg = reg.marts[name]
        labels = {"mart": name, "query": cfg["query"]}
        try:
            with obs.emit_run(f"mart/{name}"):
                result = QUERIES[cfg["query"]](sf_dir)
                snap = build_mart(
                    cfg["root"],
                    result,
                    name=name,
                    job_id=f"{job_prefix}/{name}",
                    checks=tuple(cfg.get("checks") or ("non_empty",)),
                    sort_by=tuple(cfg.get("sort_by") or ()),
                    lineage={"query": cfg["query"], "source": sf_dir},
                )
        except CheckError:
            # the reference's gold-check failure gauge
            # (metrics.py:record_gold_check_failure): publication withheld,
            # the breach pushed, the error still raised
            obs.push_table_metrics(name, labels=labels, dq_passed=False,
                                   failed=True)
            raise
        except Exception:
            # infra failure (typo'd query name, disk full, worker OOM): push
            # run_failed WITHOUT touching the dq gauges, mirroring
            # maintain_table — otherwise the gateway serves the last
            # success's gauges forever while the mart silently stops
            # updating (review finding, round 4)
            obs.push_table_metrics(name, labels=labels, failed=True)
            raise
        obs.push_table_metrics(name, labels=labels, dq_passed=True)
        out[name] = snap.version
    return out


def run_scrubs(
    reg: Registry, table: str, *, job_prefix: str, only: list[str] | None = None
) -> dict[str, Any]:
    """Run a table's declared ``scrubs:`` — retention deletes and
    redaction updates as CONFIG, not code (the §2.10 extension surface
    applied to the table verbs). Each scrub is idempotent on its derived
    job id, so a re-run (same prefix) no-ops at the log level.

    Spec per scrub: ``action: delete|update``, optional ``conv_id_range``
    / ``ts_range`` (two-element lists; ts in epoch units of the column),
    and for updates ``set: {column: scalar}``.
    """
    from open_finance_lakehouse_ray.pipelines.delete import (
        delete_where,
        update_where,
    )

    cfg = reg.tables[table]
    scrubs = cfg.get("scrubs") or {}
    report: dict[str, Any] = {}
    for name, spec in scrubs.items():
        if only and name not in only:
            continue
        action = spec.get("action")
        kw: dict[str, Any] = {"job_id": f"{job_prefix}/{name}"}
        if spec.get("conv_id_range"):
            kw["conv_id_range"] = tuple(spec["conv_id_range"])
        if spec.get("ts_range"):
            kw["ts_range"] = tuple(int(x) for x in spec["ts_range"])
        if action == "delete":
            snap = delete_where(cfg["root"], **kw)
        elif action == "update":
            assign = dict(spec.get("set") or {})
            if not assign:
                raise ValueError(f"scrub {name!r}: update needs a 'set' map")
            snap = update_where(cfg["root"], assign=assign, **kw)
        else:
            raise ValueError(f"scrub {name!r}: unknown action {action!r}")
        report[name] = (
            None if snap is None else {"version": snap.version, **{
                k: v for k, v in snap.summary.items()
                if k in ("deleted_rows", "updated_rows", "files_rewritten",
                         "files_dropped_whole")
            }}
        )
    return report


def _parse_sla_seconds(spec) -> float:
    """``freshness_sla`` values: plain seconds, or ``"10d"``/``"36h"``/
    ``"45m"``/``"90s"``/``"2w"`` (the reference's registry uses day
    strings, ``sources/registry.yml:392``)."""
    if isinstance(spec, (int, float)):
        return float(spec)
    s = str(spec).strip().lower()
    units = {"s": 1.0, "m": 60.0, "h": 3600.0, "d": 86400.0, "w": 604800.0}
    if s and s[-1] in units:
        return float(s[:-1]) * units[s[-1]]
    return float(s)


def _ts_unit_div(root: str) -> float | None:
    """Epoch divisor for the table's ``ts`` manifest stats, or None when
    the schema cannot PROVE the unit (no schema, no ts field, or a raw
    int/float epoch column) — callers must then fall back to the commit
    basis rather than guess (round-4 advice)."""
    from open_finance_lakehouse_ray.state.txlog import TableLog

    sch = TableLog(root).table_schema()
    if sch is not None and "ts" in sch.names:
        import pyarrow as _pa

        t = sch.field("ts").type
        if _pa.types.is_timestamp(t):
            return {"s": 1.0, "ms": 1e3, "us": 1e6, "ns": 1e9}[t.unit]
    return None


def freshness_report(reg: Registry, *, now: float | None = None) -> dict[str, Any]:
    """Per-table freshness-vs-SLA gauge from manifest stats alone — the
    analog of the reference's per-series freshness metric
    (``ofl/ingestion/landing.py:22-33``: freshness is asserted on the
    DATA date — the max event timestamp — not the run wall-clock, so
    quiet periods on slow tables don't read as stale; the commit time is
    the fallback basis for tables without ts stats).

    Status per table: ``fresh`` / ``stale`` (age > ``freshness_sla``),
    ``unconfigured`` (no SLA declared — age still reported), ``missing``
    (no snapshot yet — always a breach when an SLA is declared).
    """
    import time as _time

    from open_finance_lakehouse_ray.pipelines.metrics import manifest_report
    from open_finance_lakehouse_ray.state.txlog import TableLog

    now = _time.time() if now is None else now
    out: dict[str, Any] = {}
    for name, cfg in reg.tables.items():
        sla = cfg.get("freshness_sla")
        sla_s = _parse_sla_seconds(sla) if sla is not None else None
        log = TableLog(cfg["root"])
        if log.current_version() is None:
            out[name] = {
                "status": "missing" if sla_s is not None else "unconfigured",
                "age_s": None, "sla_s": sla_s, "basis": None,
            }
            continue
        rep = manifest_report(cfg["root"])
        # manifest ts stats are epoch ints in the COLUMN'S native unit
        # (stages/writer.py:column_stats) — the data basis is only sound
        # when the schema PROVES that unit (ts is an Arrow timestamp).  A
        # raw int64/float epoch column has no recorded unit: guessing 1e6
        # would misread an epoch-seconds table by orders of magnitude and
        # silently flip the fresh/stale verdict (round-4 advice) — fall
        # back to the commit basis instead.
        div = _ts_unit_div(cfg["root"])
        if rep["max_ts"] is not None and div is not None:
            age = now - rep["max_ts"] / div
            basis = "data"
        else:
            age = now - log.snapshot().committed_at
            basis = "commit"
        status = (
            "unconfigured" if sla_s is None
            else ("stale" if age > sla_s else "fresh")
        )
        out[name] = {
            "status": status,
            "age_s": round(age, 3),
            "sla_s": sla_s,
            "basis": basis,
            "version": rep["version"],
            "rows": rep["rows"],
        }
    return out

def emit_schedule(
    reg: Registry,
    *,
    registry_path: str,
    base: str | None = None,
    sf_dir: str | None = None,
) -> dict[str, Any]:
    """Generate the orchestration schedule FROM the registry — the analog
    of the reference's registry-driven Airflow DAG factory
    (``orchestration/airflow/dags/ofl_dags.py:144-186``), emitted as a
    scheduler-agnostic JSON spec instead of Airflow objects (no Airflow in
    this engine's environment; the spec carries everything that factory
    encodes: schedules, asset-triggered dependencies, pools,
    ``max_active_runs=1`` serialization, per-task failure isolation).

    Topology (mirrors the reference's lessons):

    - one maintenance DAG per TABLE, tasks independent — a failure on one
      table leaves the others untouched (the reference's per-series
      isolation, ofl_dags.py:161-166); each maintain task emits asset
      ``table:<name>``, scrubs run downstream of their table's maintain;
    - ONE marts DAG triggered by ANY table asset (the reference's
      ``AssetAny`` no-all-series-barrier lesson, ofl_dags.py:171) with
      ``max_active_runs=1`` to coalesce an asset burst into one idempotent
      build; one independent task per mart;
    - an hourly freshness-SLA DAG (exits nonzero on breach — the alerting
      hook), scheduled off the :00 mark so a fleet of deployments doesn't
      thundering-herd the scheduler.

    Every task's ``command`` is this engine's own CLI, so any scheduler
    that can run a subprocess (Airflow, cron, systemd timers) can execute
    the spec verbatim; ``max_active_runs=1`` is advisory for schedulers —
    the CommitActor + idempotent job ids keep correctness even without it.

    ``base`` mirrors the CLI's ``--base`` override into every emitted
    command (round-5 review: without it, scheduled runs would re-resolve
    ``{base}`` from the YAML and maintain different roots than the
    emitting invocation). Mart commands need a source dir: pass
    ``sf_dir`` for verbatim-runnable commands; when omitted, the command
    carries the literal ``{sf_dir}`` placeholder and the spec's
    ``params`` section says so — a consumer must substitute it.
    """
    cli = ["python", "-m", "open_finance_lakehouse_ray.cli"]
    base_extra = ["--base", base] if base else []

    def regcmd(action: str, *extra: str) -> list[str]:
        return [*cli, "registry", "--registry", registry_path,
                "--action", action, *base_extra, *extra]

    dags: list[dict[str, Any]] = []
    table_assets = []
    for t, cfg in reg.tables.items():
        asset = f"table:{t}"
        table_assets.append(asset)
        tasks = [{
            "task_id": f"maintain_{t}",
            "command": regcmd("maintain", "--table", t),
            "pool": "oflr-maintenance",
            "outlets": [asset],
            "retries": 2,
        }]
        if cfg.get("scrubs"):
            tasks.append({
                "task_id": f"scrubs_{t}",
                "command": regcmd("scrubs", "--table", t),
                "pool": "oflr-maintenance",
                "upstream": [f"maintain_{t}"],
                "outlets": [asset],
                "retries": 2,
            })
        dags.append({
            "dag_id": f"oflr_maintain_{t}",
            "schedule": cfg.get("schedule", "@daily"),
            "max_active_runs": 1,
            "tags": ["oflr", "maintenance", t],
            "tasks": tasks,
        })
    if reg.marts:
        dags.append({
            "dag_id": "oflr_marts",
            # any table refresh triggers; never an all-tables barrier
            "schedule": {"asset_any": sorted(table_assets)},
            "max_active_runs": 1,  # coalesce bursts into one idempotent build
            "tags": ["oflr", "marts"],
            "tasks": [
                {
                    "task_id": f"mart_{m}",
                    "command": regcmd("marts", "--mart", m,
                                      "--sf-dir", sf_dir or "{sf_dir}"),
                    "pool": "oflr-marts",
                    "outlets": [f"mart:{m}"],
                    "retries": 2,
                }
                for m in reg.marts
            ],
        })
    if any(cfg.get("freshness_sla") for cfg in reg.tables.values()):
        dags.append({
            "dag_id": "oflr_freshness",
            "schedule": "43 * * * *",  # hourly, off the :00 herd
            "max_active_runs": 1,
            "tags": ["oflr", "sla"],
            "tasks": [{
                "task_id": "freshness_slas",
                "command": regcmd("freshness"),
                "pool": "oflr-maintenance",
                "retries": 0,  # a breach must page, not retry-mask
            }],
        })
    params: dict[str, Any] = {}
    if reg.marts and sf_dir is None:
        # the one non-verbatim token in the spec, declared explicitly so
        # a consumer cannot miss it (round-5 review: the docstring
        # promised verbatim-runnable while mart commands carried an
        # undocumented placeholder)
        params["sf_dir"] = {
            "placeholder": "{sf_dir}",
            "description": "source data dir for mart queries; substitute "
                           "before running mart commands, or re-emit with "
                           "--sf-dir",
        }
    return {
        "version": 1,
        "registry": registry_path,
        "params": params,
        "pools": {"oflr-maintenance": 2, "oflr-marts": 4},
        "dags": dags,
    }
