"""Run-level observability: structured logs, metric push, lineage events.

The analog of the reference's platform layer — per-job data-quality /
freshness gauges pushed to a Prometheus-style gateway
(``ofl/platform/metrics.py:58-117``), OpenLineage START/COMPLETE/FAIL run
events (``ofl/platform/lineage.py:19-45``) and structlog JSON logging
(``ofl/platform/logging.py``) — rebuilt on the stdlib only:

- Everything is ENV-GATED and best-effort: with ``OFLR_PUSHGATEWAY_URL`` /
  ``OFLR_OPENLINEAGE_URL`` unset (local dev, tests, this sandbox) every
  call is a no-op, so pipelines never depend on an observability backend.
- The wire formats are the public ones — Prometheus text exposition 0.0.4
  and OpenLineage ``RunEvent`` JSON — so a real deployment points the env
  vars at its gateway/endpoint and the seam lights up unchanged.
- Transport is a single module-level ``_http_post`` so tests stub the
  gateway by monkeypatching one function.
"""

from __future__ import annotations

import contextlib
import json
import logging
import os
import time
import urllib.request
import uuid
from typing import Any

_PUSH_ENV = "OFLR_PUSHGATEWAY_URL"
_LINEAGE_ENV = "OFLR_OPENLINEAGE_URL"
_JOB = "oflr_maintenance"


# --------------------------------------------------------------- logging

class _JsonFormatter(logging.Formatter):
    """JSON-lines records (timestamp, level, logger, event, extras) — the
    structlog-processor output shape without the dependency."""

    def format(self, record: logging.LogRecord) -> str:
        out = {
            "ts": self.formatTime(record, "%Y-%m-%dT%H:%M:%S%z"),
            "level": record.levelname.lower(),
            "logger": record.name,
            "event": record.getMessage(),
        }
        extra = getattr(record, "fields", None)
        if isinstance(extra, dict):
            out.update(extra)
        return json.dumps(out, default=str)


def metrics_enabled() -> bool:
    """True when a Pushgateway is configured — callers use this to skip
    building EXPENSIVE payload inputs (e.g. the snapshot-chain walk behind
    ``last_data_epoch``) that :func:`push_table_metrics` would immediately
    discard (round-4 review finding)."""
    return bool(os.environ.get(_PUSH_ENV))


def get_logger(name: str = "oflr") -> logging.Logger:
    """Structured logger: ``log.info("compact_done", extra={"fields":
    {...}})`` renders one JSON line. Configured once, stderr, INFO."""
    logger = logging.getLogger(name)
    if not logger.handlers:
        h = logging.StreamHandler()
        h.setFormatter(_JsonFormatter())
        logger.addHandler(h)
        logger.setLevel(os.environ.get("OFLR_LOG_LEVEL", "INFO").upper())
        logger.propagate = False
    return logger


log = get_logger(__name__)


# ------------------------------------------------------------- transport

def _http_post(url: str, body: bytes, headers: dict[str, str]) -> None:
    req = urllib.request.Request(url, data=body, method="POST", headers=headers)
    urllib.request.urlopen(req, timeout=5).close()  # noqa: S310 — operator-configured endpoint


# ---------------------------------------------------------- metric push

def _escape_label(v: str) -> str:
    """Prometheus exposition label-value escaping (backslash, quote,
    newline) — label values come from user YAML names and job ids."""
    return str(v).replace("\\", "\\\\").replace('"', '\\"').replace("\n", "\\n")


def _render(name: str, value: float, labels: dict[str, str]) -> str:
    rendered = ",".join(
        f'{k}="{_escape_label(v)}"' for k, v in sorted(labels.items())
    )
    return f"{name}{{{rendered}}} {value}\n"


def _group_segment(label: str, value: str) -> str:
    """One Pushgateway grouping-key path segment (``<label>/<value>``).

    Values containing ``/`` — and empty values — must use the gateway's
    documented ``<label>@base64/<urlsafe-b64>`` form: percent-encoding a
    slash is NOT enough because Go's HTTP router un-escapes and cleans the
    path before route matching, splitting the value into extra segments
    (review finding, round 4). ``.`` / ``..`` values take the base64 form
    too — quote() leaves dots un-escaped and Go's path cleaning collapses
    dot segments. An empty value encodes as a single ``=``."""
    if value and "/" not in value and value not in (".", ".."):
        from urllib.parse import quote

        return f"{label}/{quote(value, safe='')}"
    import base64

    b64 = base64.urlsafe_b64encode(value.encode("utf-8")).decode().rstrip("=")
    return f"{label}@base64/{b64 or '='}"


def push_table_metrics(
    table_key: str,
    *,
    labels: dict[str, str] | None = None,
    rows: int | None = None,
    files: int | None = None,
    dq_passed: bool | None = None,
    failed: bool = False,
    last_data_epoch: float | None = None,
    extra_gauges: dict[str, float] | None = None,
) -> bool:
    """Push one table's run gauges to the gateway group ``table=<key>``.

    Same model as the reference: a later success POST resets the failure /
    dq gauges without clobbering the freshness timestamp. Returns True when
    a push happened (False = env unset or push failed — always best-effort).
    """
    base = os.environ.get(_PUSH_ENV)
    if not base:
        return False
    lbl = dict(labels or {})
    body = ""
    if dq_passed is not None:
        body += _render("oflr_dq_passed", 1 if dq_passed else 0, lbl)
        body += _render("oflr_dq_failed", 0 if dq_passed else 1, lbl)
    body += _render("oflr_run_failed", 1 if failed else 0, lbl)
    if rows is not None:
        body += _render("oflr_table_rows", rows, lbl)
    if files is not None:
        body += _render("oflr_table_files", files, lbl)
    if last_data_epoch is not None:
        body += _render(
            "oflr_table_last_success_timestamp_seconds", last_data_epoch, lbl
        )
    for k, v in (extra_gauges or {}).items():
        body += _render(k, v, lbl)
    url = (f"{base.rstrip('/')}/metrics/job/{_JOB}/"
           f"{_group_segment('table', table_key)}")
    try:
        _http_post(url, body.encode("utf-8"),
                   {"Content-Type": "text/plain; version=0.0.4"})
        return True
    except Exception as exc:  # noqa: BLE001 — metrics are best-effort
        log.warning("pushgateway_push_failed",
                    extra={"fields": {"table": table_key, "error": str(exc)}})
        return False


# -------------------------------------------------------- lineage events

def _run_event(state: str, run_id: str, job: str, namespace: str) -> dict[str, Any]:
    """OpenLineage RunEvent JSON (public spec shape) — no client library in
    this image, so the event is emitted as a plain JSON POST."""
    return {
        "eventType": state,
        "eventTime": time.strftime("%Y-%m-%dT%H:%M:%S+00:00", time.gmtime()),
        "run": {"runId": run_id},
        "job": {"namespace": namespace, "name": job},
        "producer": "open_finance_lakehouse_ray",
        "schemaURL": "https://openlineage.io/spec/2-0-2/OpenLineage.json#/definitions/RunEvent",
    }


@contextlib.contextmanager
def emit_run(job: str, *, namespace: str = "oflr"):
    """START/COMPLETE/FAIL run events around a job body — env-gated on
    ``OFLR_OPENLINEAGE_URL``; a no-op without it; never fails the job.

    Yields a status dict: set ``status["failed"] = True`` for a run that
    ends via a nonzero return code rather than an exception (the CLI check
    verbs), so the terminal event is FAIL, not COMPLETE.
    """
    status: dict[str, Any] = {"failed": False}
    url = os.environ.get(_LINEAGE_ENV)
    if not url:
        yield status
        return
    run_id = str(uuid.uuid4())

    def emit(state: str) -> None:
        try:
            _http_post(
                url,
                json.dumps(_run_event(state, run_id, job, namespace)).encode(),
                {"Content-Type": "application/json"},
            )
        except Exception as exc:  # noqa: BLE001 — lineage is best-effort
            log.warning("openlineage_emit_failed",
                        extra={"fields": {"job": job, "error": str(exc)}})

    emit("START")
    try:
        yield status
    except BaseException as e:
        # BaseException: SystemExit and KeyboardInterrupt must still
        # terminate the run — a START with no terminal event shows RUNNING
        # forever in the lineage UI.  A CLEAN SystemExit (--help, exit 0)
        # is a success, not a failure (review findings, round 4).
        clean_exit = isinstance(e, SystemExit) and e.code in (0, None)
        emit("COMPLETE" if clean_exit else "FAIL")
        raise
    emit("FAIL" if status.get("failed") else "COMPLETE")
