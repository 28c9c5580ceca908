"""Resilient source: per-partition retry, skip-not-fail, dead-file report.

The reference's portal downloads retry transient failures and SKIP a
persistently failing unit instead of failing the whole batch run, with
the skip recorded for the ops report
(``/root/reference/ofl/ingestion/b3_cotahist.py:33-56`` retry loop;
``ofl/ingestion/landing.py:77-85`` skip-and-continue). Network fetch is
N/A in this engine, but the OPERATOR is not: a 100-TB backfill over ~1e6
files WILL meet corrupt footers, truncated objects and transient storage
errors, and "one bad file kills the job" is the wrong failure mode.

``read_parquet_resilient`` reads a file list as one task per file (fanned
out as a Dataset of paths, so Ray schedules with backpressure), retries
each file with exponential backoff, and routes files that still fail to a
SKIP report instead of raising. The report is a first-class output: the
caller decides whether a non-empty skip list fails the run (the checks
posture) or lands with lineage noting the gap.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass

import pyarrow as pa
import ray
import ray.data as rd


@dataclass
class ResilientRead:
    """Handle pairing the data Dataset with its skip report."""

    dataset: rd.Dataset
    skipped: list[dict]

    def report(self) -> pa.Table:
        if not self.skipped:
            return pa.table({"path": pa.array([], pa.string()),
                             "error": pa.array([], pa.string()),
                             "attempts": pa.array([], pa.int64())})
        return pa.Table.from_pylist(self.skipped)


def _read_one(
    path: str,
    columns: list[str] | None,
    max_retries: int,
    backoff_s: float,
) -> tuple[pa.Table | None, dict | None]:
    import pyarrow.parquet as pq

    err = None
    for attempt in range(max_retries + 1):
        try:
            return pq.read_table(path, columns=columns), None
        except (FileNotFoundError, PermissionError, pa.ArrowInvalid, OSError) as e:
            err = e
            if attempt < max_retries:
                time.sleep(backoff_s * (2 ** attempt))
    return None, {
        "path": path,
        "error": f"{type(err).__name__}: {err}",
        "attempts": max_retries + 1,
    }


@ray.remote
def _probe(path: str, columns, max_retries: int, backoff_s: float):
    """Task-side probe: returns ('ok', schema) or ('skip', report_row)."""
    t, skip = _read_one(path, columns, max_retries, backoff_s)
    if skip is not None:
        return "skip", skip
    return "ok", None


def read_parquet_resilient(
    paths: list[str],
    *,
    columns: list[str] | None = None,
    max_retries: int = 2,
    backoff_s: float = 0.1,
    on_error: str = "skip",
) -> ResilientRead:
    """Read a parquet file list, retrying each file independently and
    skipping (with a report) the ones that still fail.

    ``on_error="skip"`` (default) returns the readable subset + the skip
    report; ``on_error="fail"`` raises on the first unreadable file AFTER
    its retries (retry-then-fail, for sources where a gap is not
    acceptable). The probe pass is task-parallel and footer-only in the
    common case; the surviving list then goes through the normal
    ``read_parquet`` streaming source (predicate/column pushdown intact).
    """
    if on_error not in ("skip", "fail"):
        raise ValueError(f"on_error must be skip|fail, got {on_error!r}")
    probes = ray.get([
        _probe.remote(p, columns, max_retries, backoff_s) for p in paths
    ])
    skipped = [row for status, row in probes if status == "skip"]
    good = [p for p, (status, _) in zip(paths, probes) if status == "ok"]
    if skipped and on_error == "fail":
        raise IOError(
            f"{len(skipped)} unreadable file(s) after {max_retries + 1} "
            f"attempts, e.g. {skipped[0]['path']}: {skipped[0]['error']}"
        )
    if not good:
        ds = rd.from_items([])
    else:
        ds = rd.read_parquet(good, columns=columns)
    return ResilientRead(dataset=ds, skipped=skipped)


def existing_subset(paths: list[str]) -> tuple[list[str], list[str]]:
    """Cheap driver-side split of a path list into (present, missing)."""
    present, missing = [], []
    for p in paths:
        (present if os.path.exists(p) else missing).append(p)
    return present, missing
