"""Transaction log: manifests + snapshots + optimistic-concurrency commits.

This is the piece the reference gets for free from the Delta Lake
transaction log (``/root/reference/ofl/platform/io.py:14-31`` stores every
table as Delta; ``ofl/streaming/bronze.py:185-194`` leans on Delta's
``txnAppId``/``txnVersion`` ledger for idempotent replay) and that we must
build from scratch — the north rule forbids reusing Delta.

Design (Avro-free, JSON, atomic-rename; the atomic ``os.replace`` staged
publication pattern is taken from the reference's producer,
``ofl/streaming/producer.py:96-112``):

table_root/
  data/<uuid>.parquet              -- immutable data files, visible only via manifests
  txlog/
    manifest-<uuid>.json           -- immutable list of FileEntry (per-file min/max stats)
    snapshot-<version 10d>.json    -- snapshot: ordered manifest list + commit metadata
    _staging/                      -- temp files, renamed/linked into place atomically
    jobs/<job_id>/part-<k>.json    -- per-partition lineage records (checkpoint/resume)

Commit protocol (optimistic concurrency, serializable at file granularity):

1. A commit declares ``base_version``, the set of data-file paths it
   *removes*, the set it *read* (content its outputs depend on), and the
   new ``FileEntry`` rows it *adds*.
2. The new snapshot's manifest list = parent's manifests with removed
   entries dropped (manifests containing removed files are rewritten,
   untouched manifests are carried **by name** — shared structurally, as
   in Iceberg) + one fresh manifest holding the added entries.
3. Publication is a hard-link CAS: ``os.link(staged, snapshot-<v+1>)``
   fails with ``FileExistsError`` iff another writer won the race. On
   loss we reload the log; if any intervening commit removed a file we
   read or planned to remove, that is a true conflict
   (:class:`CommitConflict`) and the caller must replan (the analog of
   the reference serializing writers via ``max_active_runs=1``,
   ``orchestration/airflow/dags/ofl_dags.py:176`` — we allow concurrency
   and detect the overlap instead). Otherwise the commit rebases
   automatically: compaction of files untouched by a concurrent MERGE
   commutes.
4. Idempotency: a commit carries a ``job_id``; if a snapshot with that
   job_id already exists the commit is a no-op returning the existing
   snapshot — the Delta ``txnAppId/txnVersion`` replay-guard semantics
   (``ofl/streaming/bronze.py:185-194``, measured in
   ``tools/streaming_idempotence.py:57-92``).

Everything here is pure Python (no Ray): property-testable offline, the
same discipline as the reference's JVM-free window-arithmetic mirror
(``ofl/streaming/windows.py:1-28``).
"""

from __future__ import annotations

import json
import os
import time
import uuid
from dataclasses import dataclass, field
from typing import Any, Iterable

SNAPSHOT_PREFIX = "snapshot-"
MANIFEST_PREFIX = "manifest-"


class CommitConflict(Exception):
    """A concurrent commit removed files this commit read or removes.

    The loser must replan against the new head (re-read inputs that were
    rewritten) — rebasing blindly would commit results derived from
    files that no longer exist in the table.
    """


class StaleTableError(Exception):
    """The table has no snapshot yet / a referenced snapshot is missing."""


@dataclass(frozen=True)
class FileEntry:
    """One immutable data file plus its scan-pruning stats.

    ``stats`` maps column name -> [min, max] with JSON-native values
    (timestamps as int epoch-microseconds). ``z_range`` is the [min, max]
    of the 64-bit Z/Hilbert key when the file was written clustered.
    """

    path: str  # relative to table root, e.g. "data/<uuid>.parquet"
    rows: int
    bytes: int
    stats: dict[str, list[Any]] = field(default_factory=dict)
    z_range: list[int] | None = None
    sorted_by: list[str] | None = None
    # per-column null counts for the stats columns. Separate from
    # ``stats`` (whose [min, max] shape is compared verbatim by the
    # stats-attestation check) and OPTIONAL: entries written before the
    # field existed simply lack it, and consumers must treat a missing
    # count as "unknown — may contain nulls". A recorded 0 is the
    # attestation DELETE's whole-file drop needs: min/max ignore nulls,
    # so containment alone cannot prove a NULL-predicate row (which the
    # SQL semantics keep) is absent (round-4 review). ``-1`` = checked
    # but unknowable from the footer (keeps backfill from re-reading).
    null_counts: dict[str, int] = field(default_factory=dict)

    def to_json(self) -> dict[str, Any]:
        return {
            "path": self.path,
            "rows": self.rows,
            "bytes": self.bytes,
            "stats": self.stats,
            "z_range": self.z_range,
            "sorted_by": self.sorted_by,
            **({"null_counts": self.null_counts} if self.null_counts else {}),
        }

    @staticmethod
    def from_json(d: dict[str, Any]) -> "FileEntry":
        return FileEntry(
            path=d["path"],
            rows=int(d["rows"]),
            bytes=int(d["bytes"]),
            stats=d.get("stats") or {},
            z_range=d.get("z_range"),
            sorted_by=d.get("sorted_by"),
            null_counts=d.get("null_counts") or {},
        )


@dataclass(frozen=True)
class Snapshot:
    version: int
    parent: int | None
    operation: str  # ingest | compact | zorder | merge | rewrite-manifests | expire
    job_id: str
    manifests: list[str]  # manifest file names, order = table order
    removed_paths: list[str]  # data files removed by THIS commit (conflict detection)
    added_paths: list[str]
    summary: dict[str, Any]  # rows / bytes / files after this commit + op metrics
    committed_at: float

    def to_json(self) -> dict[str, Any]:
        return {
            "version": self.version,
            "parent": self.parent,
            "operation": self.operation,
            "job_id": self.job_id,
            "manifests": self.manifests,
            "removed_paths": self.removed_paths,
            "added_paths": self.added_paths,
            "summary": self.summary,
            "committed_at": self.committed_at,
        }

    @staticmethod
    def from_json(d: dict[str, Any]) -> "Snapshot":
        return Snapshot(
            version=int(d["version"]),
            parent=d["parent"],
            operation=d["operation"],
            job_id=d["job_id"],
            manifests=list(d["manifests"]),
            removed_paths=list(d.get("removed_paths") or []),
            added_paths=list(d.get("added_paths") or []),
            summary=d.get("summary") or {},
            committed_at=float(d.get("committed_at") or 0.0),
        )


def _atomic_write_json(staging_dir: str, final_path: str, payload: dict[str, Any]) -> None:
    """Write JSON to staging then ``os.replace`` into place (last-wins)."""
    os.makedirs(staging_dir, exist_ok=True)
    tmp = os.path.join(staging_dir, f"tmp-{uuid.uuid4().hex}.json")
    with open(tmp, "w") as f:
        json.dump(payload, f, separators=(",", ":"))
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, final_path)


def _atomic_create_json(staging_dir: str, final_path: str, payload: dict[str, Any]) -> bool:
    """Create-if-absent via hard-link CAS. True iff this writer won."""
    os.makedirs(staging_dir, exist_ok=True)
    tmp = os.path.join(staging_dir, f"tmp-{uuid.uuid4().hex}.json")
    with open(tmp, "w") as f:
        json.dump(payload, f, separators=(",", ":"))
        f.flush()
        os.fsync(f.fileno())
    try:
        os.link(tmp, final_path)
        return True
    except FileExistsError:
        return False
    finally:
        os.unlink(tmp)


class TableLog:
    """Reader/writer for one table's transaction log. Stateless between calls
    (all state is on disk), so any number of processes may hold one."""

    def __init__(self, root: str):
        self.root = root
        self.txdir = os.path.join(root, "txlog")
        self.datadir = os.path.join(root, "data")
        self.staging = os.path.join(self.txdir, "_staging")
        self.jobsdir = os.path.join(self.txdir, "jobs")

    # ---------- bootstrap ----------

    def create(self) -> None:
        os.makedirs(self.datadir, exist_ok=True)
        os.makedirs(self.txdir, exist_ok=True)
        os.makedirs(self.staging, exist_ok=True)
        os.makedirs(self.jobsdir, exist_ok=True)

    def exists(self) -> bool:
        return os.path.isdir(self.txdir)

    # ---------- reads ----------

    def versions(self) -> list[int]:
        if not os.path.isdir(self.txdir):
            return []
        out = []
        for name in os.listdir(self.txdir):
            if name.startswith(SNAPSHOT_PREFIX) and name.endswith(".json"):
                try:
                    out.append(int(name[len(SNAPSHOT_PREFIX) : -5]))
                except ValueError:
                    continue
        return sorted(out)

    def current_version(self) -> int | None:
        vs = self.versions()
        return vs[-1] if vs else None

    def _snapshot_path(self, version: int) -> str:
        return os.path.join(self.txdir, f"{SNAPSHOT_PREFIX}{version:010d}.json")

    def snapshot(self, version: int | None = None) -> Snapshot:
        if version is None:
            version = self.current_version()
            if version is None:
                raise StaleTableError(f"no snapshot in {self.txdir}")
        path = self._snapshot_path(version)
        if not os.path.exists(path):
            raise StaleTableError(f"missing snapshot {version} in {self.txdir}")
        with open(path) as f:
            return Snapshot.from_json(json.load(f))

    def read_manifest(self, name: str) -> list[FileEntry]:
        with open(os.path.join(self.txdir, name)) as f:
            d = json.load(f)
        return [FileEntry.from_json(e) for e in d["entries"]]

    def files(self, version: int | None = None) -> list[FileEntry]:
        """The table's live data files at a snapshot, in manifest order."""
        snap = self.snapshot(version)
        out: list[FileEntry] = []
        for m in snap.manifests:
            out.extend(self.read_manifest(m))
        return out

    def file_paths(self, version: int | None = None) -> list[str]:
        return [os.path.join(self.root, e.path) for e in self.files(version)]

    def keys_unique(self, version: int | None = None) -> bool:
        """True iff merge-key uniqueness is ATTESTED at this snapshot.

        The bit lives in each commit's summary: ingest writes the caller's
        attestation (a deduped source landing into a fresh table), the
        maintenance ops propagate their base's bit forward, and anything
        un-attested defaults to False. For logs written before the bit
        existed we walk the parent chain through uniqueness-preserving
        operations; an expired (unwalkable) chain is conservatively False.
        Used by MERGE's ``auto`` strategy: the broadcast fast path is only
        correct on unique-key tables.
        """
        preserving = {"compact", "zorder", "merge", "rewrite-manifests",
                      "restore", "expire", "delete", "update", "alter"}
        try:
            snap = self.snapshot(version)
        except StaleTableError:
            return False
        while True:
            ku = snap.summary.get("keys_unique")
            if ku is not None:
                return bool(ku)
            if snap.operation not in preserving or snap.parent is None:
                return False
            try:
                snap = self.snapshot(snap.parent)
            except StaleTableError:
                return False

    def table_schema(self, version: int | None = None):
        """The table's canonical Arrow schema at a snapshot, or None for
        tables whose commits never recorded one (pre-evolution logs).
        The schema travels in commit summaries (``schema_b64``); the
        latest commit that recorded one wins — maintenance ops don't
        re-record it, so this walks the parent chain."""
        from open_finance_lakehouse_ray.stages.evolution import schema_from_b64

        try:
            snap = self.snapshot(version)
        except (StaleTableError, FileNotFoundError):
            return None
        while True:
            b64 = snap.summary.get("schema_b64")
            if b64 is not None:
                return schema_from_b64(b64)
            if snap.operation == "restore":
                # a restore swaps the live content wholesale and mirrors
                # the target's schema_b64 when known (restore.py); never
                # inherit the bypassed commits' (round 4). For commits
                # WITHOUT the mirror — logs written before the mirror
                # existed, or targets with no recorded schema — resolve
                # from the restored-to version itself (round-5 advice:
                # the hard barrier made legacy restores of evolved tables
                # stop conforming a genuinely mixed file set). The target
                # version is always < this one, so the walk terminates.
                to = snap.summary.get("restored_to")
                return self.table_schema(to) if to is not None else None
            if snap.parent is None:
                return None
            try:
                snap = self.snapshot(snap.parent)
            except StaleTableError:
                return None

    def table_key_cols(self, version: int | None = None) -> tuple[str, ...] | None:
        """The table's recorded merge-key column names, or None for tables
        whose commits never recorded them.

        The names travel in commit summaries (``key_cols``) — MERGE writes
        its key, ingest callers write theirs alongside the ``keys_unique``
        attestation; the latest commit that recorded one wins (walks the
        parent chain like :meth:`table_schema`).  Consumers that must pair
        rows on the table's key (the change feed's net fold) resolve here
        instead of assuming a transcript-specific default (round-4 advice:
        a table that merely CARRIES conv_id/turn_idx but is keyed
        differently would silently fold on the wrong key)."""
        try:
            snap = self.snapshot(version)
        except (StaleTableError, FileNotFoundError):
            return None
        while True:
            kc = snap.summary.get("key_cols")
            if kc is not None:
                return tuple(kc)
            if snap.operation == "restore":
                # a restore swaps the live content wholesale; it mirrors
                # the target's key_cols when known (restore.py). Without
                # the mirror (legacy log, or target with no identity),
                # resolve from the restored-to version itself — see
                # table_schema's restore fallback (round-5 advice).
                to = snap.summary.get("restored_to")
                return self.table_key_cols(to) if to is not None else None
            if snap.summary.get("mode") == "overwrite":
                # an overwrite REPLACES the table: key identity recorded
                # below it belongs to the old data — never inherit across
                # it (review finding, round 4).
                return None
            if snap.parent is None:
                return None
            try:
                snap = self.snapshot(snap.parent)
            except StaleTableError:
                return None

    def schema_is_evolved(self, version: int | None = None) -> bool:
        """True iff any commit in the chain actually CHANGED the schema
        (``schema_evolved`` summary flag) — the scan only pays the
        conform stage (and loses column pushdown) on such tables."""
        try:
            snap = self.snapshot(version)
        except (StaleTableError, FileNotFoundError):
            return False
        while True:
            ev = snap.summary.get("schema_evolved")
            if ev is not None:
                return bool(ev)
            if snap.operation == "restore":
                # restore barrier with restored-to fallback — see
                # table_schema (the mirrored flag, when present, was
                # consumed above; reaching here means no mirror)
                to = snap.summary.get("restored_to")
                return self.schema_is_evolved(to) if to is not None else False
            if snap.parent is None:
                return False
            try:
                snap = self.snapshot(snap.parent)
            except StaleTableError:
                return False

    def table_constraints(self, version: int | None = None) -> dict:
        """The ACTIVE constraint set at a snapshot ({name: spec}, see
        ``pipelines/alter.py``) — the latest commit carrying a
        ``constraints`` summary wins; tables that never ALTERed have
        none."""
        try:
            snap = self.snapshot(version)
        except (StaleTableError, FileNotFoundError):
            return {}
        while True:
            cons = snap.summary.get("constraints")
            if cons is not None:
                return dict(cons)
            if snap.parent is None:
                return {}
            try:
                snap = self.snapshot(snap.parent)
            except StaleTableError:
                return {}

    def _txn_marker_path(self, job_id: str) -> str:
        return os.path.join(self.txdir, "txns", f"{job_id}.json")

    def find_commit(self, job_id: str) -> Snapshot | None:
        """Look up a committed job. The durable txn marker (written at
        commit, NEVER expired — the Delta ``txnAppId`` ledger surviving
        VACUUM) is the fast path; scanning snapshots is the fallback for
        logs written before markers existed. If the marker's snapshot has
        been expired, a tombstone Snapshot (operation ``"expired"``) is
        returned so a replay still no-ops."""
        try:
            with open(self._txn_marker_path(job_id)) as f:
                d = json.load(f)
            try:
                return self.snapshot(int(d["version"]))
            except StaleTableError:
                return Snapshot(
                    version=int(d["version"]), parent=None, operation="expired",
                    job_id=job_id, manifests=[], removed_paths=[], added_paths=[],
                    summary={}, committed_at=float(d.get("committed_at") or 0.0),
                )
        except FileNotFoundError:
            pass
        for v in self.versions():
            s = self.snapshot(v)
            if s.job_id == job_id:
                return s
        return None

    def _write_txn_marker(self, snap: Snapshot) -> None:
        path = self._txn_marker_path(snap.job_id)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        _atomic_write_json(
            self.staging, path,
            {"version": snap.version, "committed_at": snap.committed_at},
        )

    # ---------- writes ----------

    def write_manifest(self, entries: Iterable[FileEntry]) -> str:
        name = f"{MANIFEST_PREFIX}{uuid.uuid4().hex}.json"
        _atomic_write_json(
            self.staging,
            os.path.join(self.txdir, name),
            {"entries": [e.to_json() for e in entries]},
        )
        return name

    def commit(
        self,
        *,
        operation: str,
        job_id: str,
        added: list[FileEntry],
        removed_paths: set[str] | None = None,
        read_paths: set[str] | None = None,
        base_version: int | None = None,
        summary: dict[str, Any] | None = None,
        max_retries: int = 20,
        overwrite_live: bool = False,
    ) -> Snapshot:
        """Commit a change; returns the published (or pre-existing) snapshot.

        ``removed_paths``/``read_paths`` are table-relative data paths.
        ``base_version=None`` means "create the table" (parent = current
        head if one exists, with nothing removed).

        ``overwrite_live=True`` gives REPLACE-the-table semantics under
        concurrency: the removed set is re-resolved to every file live at
        the CURRENT head on each attempt, so a concurrent append that
        lands between plan and commit is removed too (serialized before
        the overwrite) instead of silently surviving beside it.
        """
        removed = set(removed_paths or ())
        read = set(read_paths or ())
        plan_base = base_version  # the base the SUMMARY was computed against
        orig_summary = summary  # pristine: every retry rebases from THIS —
        # re-rebasing an already-rebased summary would misattribute a
        # concurrent commit's adds as ours (and resurrect what a later
        # concurrent commit dropped)
        for _ in range(max_retries):
            summary = orig_summary
            existing = self.find_commit(job_id)
            if existing is not None:
                return existing  # idempotent replay: no-op (ST2 semantics)

            head = self.current_version()
            if overwrite_live and head is not None:
                removed = {e.path for e in self.files(head)}
                base_version = head  # deps derived FROM head: nothing stale
            if base_version is not None and head is not None and head != base_version:
                # someone committed since we planned: check true conflicts
                self._check_conflicts(base_version, head, removed | read)
                # a keys_unique attestation was computed against the OLD
                # base; intervening commits may have added un-deduped keys.
                # AND it with the head's state (conservative: a False bit
                # only downgrades the broadcast-MERGE fast path to shuffle)
                if summary and summary.get("keys_unique"):
                    summary = {**summary,
                               "keys_unique": bool(self.keys_unique(head))}
                # schema/constraints in the summary were also computed
                # against the OLD base: republishing them as-is would
                # silently drop a concurrent commit's evolved column or
                # ALTERed constraint (the latest-commit-wins chain walk
                # reads only the newest record). Re-merge against the head.
                if summary and ("schema_b64" in summary or "constraints" in summary):
                    summary = self._rebase_summary(summary, plan_base, head)
                base_version = head  # safe rebase
            parent = head
            new_version = (head or 0) + 1 if head is not None else 1

            # build manifest list: rewrite manifests containing removed
            # entries, carry the rest by name, append one for added files
            manifests: list[str] = []
            written_this_try: list[str] = []
            live: list[FileEntry] = []
            if parent is not None:
                parent_snap = self.snapshot(parent)
                for m in parent_snap.manifests:
                    entries = self.read_manifest(m)
                    if removed and any(e.path in removed for e in entries):
                        kept = [e for e in entries if e.path not in removed]
                        if kept:
                            nm = self.write_manifest(kept)
                            manifests.append(nm)
                            written_this_try.append(nm)
                            live.extend(kept)
                    else:
                        manifests.append(m)
                        live.extend(entries)
            if added:
                nm = self.write_manifest(added)
                manifests.append(nm)
                written_this_try.append(nm)
                live.extend(added)
            snap = Snapshot(
                version=new_version,
                parent=parent,
                operation=operation,
                job_id=job_id,
                manifests=manifests,
                removed_paths=sorted(removed),
                added_paths=sorted(e.path for e in added),
                summary={
                    "files": len(live),
                    "rows": sum(e.rows for e in live),
                    "bytes": sum(e.bytes for e in live),
                    **(summary or {}),
                },
                committed_at=time.time(),
            )
            if _atomic_create_json(self.staging, self._snapshot_path(new_version), snap.to_json()):
                self._write_txn_marker(snap)
                return snap
            # lost the CAS: drop this iteration's manifests (no snapshot
            # references them — they would otherwise leak forever) and
            # loop; the next pass re-checks conflicts vs the new head
            for nm in written_this_try:
                try:
                    os.unlink(os.path.join(self.root, nm))
                except OSError:
                    pass
            if base_version is None:
                base_version = self.current_version()
        raise RuntimeError(f"commit contention: gave up after {max_retries} retries")

    def _rebase_summary(
        self, summary: dict[str, Any], plan_base: int | None, head: int
    ) -> dict[str, Any]:
        """Re-derive schema/constraints summary entries against the new
        head at commit rebase.

        Schema evolution is a join-semilattice (union-by-name, widening
        only, no drop verb), so merging OUR published schema with the
        HEAD's schema yields exactly the state both evolutions together
        produce — commutative and associative, order of concurrent
        commits doesn't matter. An incompatible concurrent widening
        (``SchemaEvolutionError``) is a true conflict: the caller must
        replan with an explicit cast.

        Constraints DO have a drop verb, so a plain union is wrong; the
        3-way merge reconstructs our adds/drops against the plan base and
        replays them on the head's active set (concurrent add+drop of the
        SAME name resolves latest-wins by commit order, i.e. ours).
        """
        out = dict(summary)
        if "schema_b64" in out and out["schema_b64"] is not None:
            from open_finance_lakehouse_ray.stages.evolution import (
                SchemaEvolutionError,
                evolve_schema,
                schema_from_b64,
                schema_to_b64,
            )

            head_schema = self.table_schema(head)
            ours = schema_from_b64(out["schema_b64"])
            if head_schema is not None and not head_schema.equals(ours):
                try:
                    merged = evolve_schema(head_schema, ours)
                except SchemaEvolutionError as e:
                    raise CommitConflict(
                        f"concurrent schema evolutions are incompatible: {e}"
                    ) from e
                out["schema_b64"] = schema_to_b64(merged)
                if "schema_evolved" in out:
                    out["schema_evolved"] = bool(
                        out.get("schema_evolved")
                        or self.schema_is_evolved(head)
                        or not merged.equals(head_schema)
                    )
        if "constraints" in out and out["constraints"] is not None:
            base_cons = (
                self.table_constraints(plan_base) if plan_base is not None else {}
            )
            ours_cons = dict(out["constraints"])
            head_cons = dict(self.table_constraints(head))
            # our drops: names active at plan base but absent from ours
            for name in base_cons:
                if name not in ours_cons:
                    head_cons.pop(name, None)
            # our adds/updates: names new or changed relative to plan base.
            # Names we did NOT touch keep the HEAD's state — re-adding an
            # unchanged name would resurrect a constraint a concurrent
            # commit dropped (review finding, round 3)
            for name, spec in ours_cons.items():
                if name not in base_cons or base_cons[name] != spec:
                    head_cons[name] = spec
            out["constraints"] = head_cons
        return out

    def _check_conflicts(self, base: int, head: int, depends_on: set[str]) -> None:
        """Raise CommitConflict iff a commit in (base, head] removed any
        file in ``depends_on`` (files we read or plan to remove)."""
        if not depends_on:
            return
        for v in range(base + 1, head + 1):
            try:
                s = self.snapshot(v)
            except StaleTableError as e:
                # an intervening snapshot was expired before we could
                # inspect it: conflicts cannot be ruled out — surface the
                # replannable signal, not a hard failure
                raise CommitConflict(
                    f"cannot verify conflicts: intervening snapshot v{v} "
                    f"already expired"
                ) from e
            overlap = depends_on.intersection(s.removed_paths)
            if overlap:
                raise CommitConflict(
                    f"commit v{v} ({s.operation}, job={s.job_id}) removed "
                    f"{len(overlap)} file(s) this commit depends on, e.g. "
                    f"{sorted(overlap)[:3]}"
                )

    # ---------- per-job partition lineage (checkpoint / resume) ----------
    # The analog of the reference's streaming checkpoints: offsets claimed
    # before work, commits recorded after, restart resumes at the next id
    # (docs/STREAMING.md:120-129). Here the unit is a partition (bin /
    # merge bucket), and the record is its lineage: inputs -> outputs.

    def job_dir(self, job_id: str) -> str:
        return os.path.join(self.jobsdir, job_id)

    def record_partition(self, job_id: str, part_id: str, record: dict[str, Any]) -> None:
        """Atomically persist one partition's lineage record. Overwrites are
        harmless: the record is a deterministic function of the plan."""
        jdir = self.job_dir(job_id)
        os.makedirs(jdir, exist_ok=True)
        _atomic_write_json(self.staging, os.path.join(jdir, f"part-{part_id}.json"), record)

    def get_partition(self, job_id: str, part_id: str) -> dict[str, Any] | None:
        path = os.path.join(self.job_dir(job_id), f"part-{part_id}.json")
        try:
            with open(path) as f:
                return json.load(f)
        except FileNotFoundError:
            return None

    def committed_partitions(self, job_id: str) -> dict[str, dict[str, Any]]:
        jdir = self.job_dir(job_id)
        if not os.path.isdir(jdir):
            return {}
        out: dict[str, dict[str, Any]] = {}
        for name in os.listdir(jdir):
            if name.startswith("part-") and name.endswith(".json"):
                with open(os.path.join(jdir, name)) as f:
                    out[name[len("part-") : -5]] = json.load(f)
        return out

    def clear_job(self, job_id: str) -> None:
        jdir = self.job_dir(job_id)
        if os.path.isdir(jdir):
            for name in os.listdir(jdir):
                os.unlink(os.path.join(jdir, name))
            os.rmdir(jdir)

    # ---------- expire (reference-counted vacuum) ----------

    def expire_snapshots(
        self,
        *,
        keep_last: int = 1,
        retain_seconds: float = 0.0,
        now: float | None = None,
        dry_run: bool = False,
    ) -> dict[str, Any]:
        """Expire old snapshots and delete data files / manifests no longer
        referenced by any retained snapshot.

        Semantics of Delta ``VACUUM ... RETAIN n HOURS``
        (``ofl/transform/spark/silver.py:372-373``): the current snapshot is
        always retained; a snapshot is expirable only if it is not among the
        newest ``keep_last`` AND is older than ``retain_seconds``. Liveness
        is reference-counted: a data file dies only when its refcount over
        retained snapshots' manifests reaches zero.
        """
        now = time.time() if now is None else now
        versions = self.versions()
        if not versions:
            return {"expired_snapshots": [], "deleted_files": [], "deleted_manifests": []}
        keep_last = max(1, keep_last)
        retained: list[int] = []
        expired: list[int] = []
        cutoff = now - retain_seconds
        for i, v in enumerate(versions):
            s = self.snapshot(v)
            is_newest = i >= len(versions) - keep_last
            if is_newest or s.committed_at > cutoff:
                retained.append(v)
            else:
                expired.append(v)
        if not expired:
            return {"expired_snapshots": [], "deleted_files": [], "deleted_manifests": []}

        # refcounts over retained snapshots
        live_manifests: set[str] = set()
        for v in retained:
            live_manifests.update(self.snapshot(v).manifests)
        live_files: set[str] = set()
        for m in live_manifests:
            live_files.update(e.path for e in self.read_manifest(m))

        def _cdc_paths(s: "Snapshot") -> set[str]:
            cdc = s.summary.get("cdc") or {}
            return {
                f["path"] for f in cdc.get("files", [])
                if isinstance(f, dict) and f.get("path")
            }

        def _cdc_deps(s: "Snapshot") -> set[str]:
            """Removed data files a retained commit's CDC image still
            reads (whole-file deletes / ingest commit-paths) — they must
            outlive the snapshots that carried them in a manifest."""
            cdc = s.summary.get("cdc") or {}
            deps = set(cdc.get("delete_whole", []))
            deps.update(cdc.get("insert_files", []))
            if cdc.get("derive") == "commit-paths":
                deps.update(s.removed_paths)
                deps.update(s.added_paths)
            return deps

        live_cdc: set[str] = set()
        for v in retained:
            s = self.snapshot(v)
            live_cdc.update(_cdc_paths(s))
            live_files.update(_cdc_deps(s))

        dead_manifests: set[str] = set()
        dead_files: set[str] = set()
        for v in expired:
            s = self.snapshot(v)
            for m in s.manifests:
                if m not in live_manifests:
                    dead_manifests.add(m)
            # a snapshot's CDC artifacts die with it (they are per-commit,
            # but guard against aliasing with any retained reference), and
            # so do its CDC dep files — kept alive past their own
            # manifests' expiry solely for this commit's change image
            dead_files.update(_cdc_paths(s) - live_cdc - live_files)
            dead_files.update(_cdc_deps(s) - live_files)
        for m in dead_manifests:
            for e in self.read_manifest(m):
                if e.path not in live_files:
                    dead_files.add(e.path)

        if not dry_run:
            # carry table-identity metadata forward before the chain below
            # the oldest retained snapshot is cut: the walkers
            # (table_key_cols / keys_unique / table_schema / constraints)
            # resolve through parent links, and expiry would otherwise
            # erase metadata recorded only by an old ingest/merge commit
            # (round 4: ChangeStream key resolution must survive VACUUM).
            self._carry_forward_metadata(min(retained))
            for p in sorted(dead_files):
                try:
                    os.unlink(os.path.join(self.root, p))
                except FileNotFoundError:
                    pass
            for m in sorted(dead_manifests):
                try:
                    os.unlink(os.path.join(self.txdir, m))
                except FileNotFoundError:
                    pass
            for v in expired:
                try:
                    os.unlink(self._snapshot_path(v))
                except FileNotFoundError:
                    pass
        return {
            "expired_snapshots": expired,
            "deleted_files": sorted(dead_files),
            "deleted_manifests": sorted(dead_manifests),
        }

    def _carry_forward_metadata(self, oldest_retained: int) -> None:
        """Stamp inherited table metadata into the oldest retained snapshot
        before its parent chain is expired.

        Each value is computed by its own SEMANTIC walker while the chain is
        still intact (``keys_unique`` respects its preserving-operation
        rule; a blind copy from below a non-preserving commit would
        overclaim), then written into the snapshot's summary so the walkers
        keep resolving after the parents are gone.  Rewrites only summary
        metadata — no data/manifest references change."""
        try:
            snap = self.snapshot(oldest_retained)
        except (StaleTableError, FileNotFoundError):
            return
        found: dict[str, Any] = {}
        if "key_cols" not in snap.summary:
            kc = self.table_key_cols(oldest_retained)
            if kc is not None:
                found["key_cols"] = list(kc)
        if "keys_unique" not in snap.summary and self.keys_unique(oldest_retained):
            found["keys_unique"] = True
        if "schema_b64" not in snap.summary:
            cur = snap
            while cur.parent is not None and "schema_b64" not in cur.summary:
                try:
                    cur = self.snapshot(cur.parent)
                except (StaleTableError, FileNotFoundError):
                    break
            if "schema_b64" in cur.summary:
                found["schema_b64"] = cur.summary["schema_b64"]
        if "schema_evolved" not in snap.summary and self.schema_is_evolved(
            oldest_retained
        ):
            found["schema_evolved"] = True
        if "constraints" not in snap.summary:
            cons = self.table_constraints(oldest_retained)
            if cons:
                found["constraints"] = cons
        if not found:
            return
        snap.summary.update(found)
        path = self._snapshot_path(oldest_retained)
        _atomic_write_json(os.path.dirname(path), path, snap.to_json())

    def sweep_orphans(self, *, grace_seconds: float = 3600.0, dry_run: bool = False) -> list[str]:
        """Delete data files not referenced by ANY snapshot's manifests and
        older than ``grace_seconds`` (debris from killed, never-committed
        partitions). The grace window protects in-flight writers."""
        referenced: set[str] = set()
        for v in self.versions():
            snap = self.snapshot(v)
            for m in snap.manifests:
                referenced.update(e.path for e in self.read_manifest(m))
            # write-time CDC artifacts live in the commit summary, not a
            # manifest — they (and the removed files a commit's CDC image
            # derives from) are referenced for as long as their snapshot is
            cdc = snap.summary.get("cdc") or {}
            referenced.update(
                f.get("path") for f in cdc.get("files", []) if isinstance(f, dict)
            )
            referenced.update(cdc.get("delete_whole", []))
            referenced.update(cdc.get("insert_files", []))
            if cdc.get("derive") == "commit-paths":
                referenced.update(snap.removed_paths)
                referenced.update(snap.added_paths)
        # outputs recorded by LIVE job lineage (jobs/<id>/*.json) belong to
        # a crashed-but-resumable run: the resume will commit them, so they
        # are not orphans no matter how old they are. A finished job clears
        # its records (clear_job), releasing the protection.
        if os.path.isdir(self.jobsdir):
            for dirpath, _dirs, fnames in os.walk(self.jobsdir):
                for f in fnames:
                    if not f.endswith(".json"):
                        continue
                    try:
                        with open(os.path.join(dirpath, f)) as fh:
                            rec = json.load(fh)
                    except (OSError, json.JSONDecodeError):
                        continue
                    if isinstance(rec, dict):
                        referenced.update(
                            o.get("path") for o in rec.get("outputs", [])
                            if isinstance(o, dict)
                        )
                        cdc_rec = rec.get("cdc")
                        if isinstance(cdc_rec, dict) and cdc_rec.get("path"):
                            referenced.add(cdc_rec["path"])
        cutoff = time.time() - grace_seconds
        orphans: list[str] = []
        if os.path.isdir(self.datadir):
            for name in os.listdir(self.datadir):
                rel = os.path.join("data", name)
                full = os.path.join(self.root, rel)
                if rel not in referenced and os.path.getmtime(full) < cutoff:
                    orphans.append(rel)
                    if not dry_run:
                        os.unlink(full)
        # shuffle intermediates (zorder_ranged) from crashed jobs: a
        # committed job removes its own dir; anything past the grace
        # window with no commit in sight is debris
        shuffle_root = os.path.join(self.root, "_shuffle")
        if os.path.isdir(shuffle_root):
            live_jobs: set[str] = set()
            if os.path.isdir(self.jobsdir):
                # job ids may be nested ("run1/zorder"): reconstruct every
                # record-bearing dir's id in the shuffle-dir naming scheme
                for dirpath, _dirs, fnames in os.walk(self.jobsdir):
                    if any(f.endswith(".json") for f in fnames):
                        rel = os.path.relpath(dirpath, self.jobsdir)
                        live_jobs.add(rel.replace(os.sep, "_"))
            for d in os.listdir(shuffle_root):
                if d in live_jobs:
                    continue  # a resumable job still owns these intermediates
                jdir = os.path.join(shuffle_root, d)
                files = [os.path.join(jdir, f) for f in os.listdir(jdir)]
                if files and all(os.path.getmtime(f) < cutoff for f in files):
                    orphans.append(os.path.join("_shuffle", d))
                    if not dry_run:
                        for f in files:
                            os.unlink(f)
                        os.rmdir(jdir)
        return sorted(orphans)
