"""Thin CLI + maintenance-job registry.

The reference drives everything through a registry + thin CLI
(``/root/reference/ofl/cli.py:159-219``; the YAML series registry,
``ofl/registry.py:95-111``, where adding a unit of work is one entry).
Here the registry maps maintenance job names to pipeline entry points with
per-table config from a JSON file or flags.

    python -m open_finance_lakehouse_ray.cli ingest  --root T --source S
    python -m open_finance_lakehouse_ray.cli compact --root T
    python -m open_finance_lakehouse_ray.cli zorder  --root T [--curve hilbert]
    python -m open_finance_lakehouse_ray.cli merge   --root T --updates U
    python -m open_finance_lakehouse_ray.cli rewrite-manifests --root T
    python -m open_finance_lakehouse_ray.cli delete  --root T --conv-range LO HI
    python -m open_finance_lakehouse_ray.cli update  --root T --conv-range LO HI --set tool=redacted
    python -m open_finance_lakehouse_ray.cli changes --root T --from-version N [--dest D]
    python -m open_finance_lakehouse_ray.cli expire  --root T [--force]
    python -m open_finance_lakehouse_ray.cli report  --root T
    python -m open_finance_lakehouse_ray.cli check   --root T

Owns its Ray session (scripts do; library code never does).
"""

from __future__ import annotations

import argparse
import json
import sys
import uuid


def _ray_session(num_cpus: int | None):
    import ray

    if not ray.is_initialized():
        kwargs = dict(
            address="local", include_dashboard=False, ignore_reinit_error=True,
            logging_level="ERROR",
        )
        if num_cpus:
            kwargs["num_cpus"] = num_cpus
        ray.init(**kwargs)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


# pre-command options that TAKE A VALUE, with their argparse kwargs — the
# single source of truth for both the argparse definition in _main (which
# registers every entry) and the lineage job-name scanner below (round-4
# review finding: maintaining the inventory in two places silently
# reintroduces the "cli/<value>" mislabeling when a new option is added
# to only one of them)
_PRE_COMMAND_VALUE_OPTS: dict[str, dict] = {
    "--num-cpus": {"type": int, "default": None},
}


def _command_name(av: list[str]) -> str:
    """First non-option token = the subcommand, for the lineage job name.

    argparse accepts unambiguous prefix abbreviations ("--num 4") and the
    attached form ("--num-cpus=4"); any prefix of a value-taking
    pre-command option consumes the NEXT token unless the value came via
    "=" (round-4 review finding: "--num 4" made the job "cli/4")."""
    skip = False
    for a in av:
        if skip:
            skip = False
            continue
        if a.startswith("--"):
            opt = a.split("=", 1)[0]
            if "=" not in a and len(opt) > 2 and any(
                o.startswith(opt) for o in _PRE_COMMAND_VALUE_OPTS
            ):
                skip = True
            continue
        if not a.startswith("-"):
            return a
    return "unknown"


def main(argv: list[str] | None = None) -> int:
    """Entry point, wrapped in the observability run seam: every CLI verb
    (ingest/compact/zorder/merge/delete/update/maintain/…) emits
    START/COMPLETE/FAIL OpenLineage events when ``OFLR_OPENLINEAGE_URL``
    is set — a no-op otherwise (``ofl/platform/lineage.py:19-45``)."""
    import sys as _sys

    from open_finance_lakehouse_ray import observability as obs

    av = list(_sys.argv[1:] if argv is None else argv)
    with obs.emit_run(f"cli/{_command_name(av)}") as status:
        rc = _main(av)
        if rc:  # nonzero exit (failed check / stale freshness) is a FAIL
            status["failed"] = True
        return rc


def _main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="ofl-ray")
    for _opt, _kw in _PRE_COMMAND_VALUE_OPTS.items():
        p.add_argument(_opt, **_kw)
    sub = p.add_subparsers(dest="cmd", required=True)

    def add(name, **flags):
        sp = sub.add_parser(name)
        sp.add_argument("--root", required=True)
        sp.add_argument("--job-id", default=None)
        for f, kw in flags.items():
            sp.add_argument(f, **kw)
        return sp

    add("ingest", **{"--source": {"required": True},
                     "--mode": {"default": "append", "choices": ["append", "overwrite"]}})
    add("compact", **{"--target-bytes": {"type": int, "default": 96 * 1024 * 1024}})
    add("zorder", **{"--curve": {"default": "morton", "choices": ["morton", "hilbert"]},
                     "--strategy": {"default": "sort", "choices": ["sort", "ranged"],
                                    "help": "ranged = durable per-range-resumable shuffle"}})
    add("merge", **{"--updates": {"required": True},
                    "--strategy": {"default": "auto",
                                   "choices": ["auto", "broadcast", "shuffle"]}})
    add("rewrite-manifests")
    add("delete", **{"--conv-range": {"nargs": 2, "default": None,
                                      "metavar": ("LO", "HI")},
                     "--ts-range": {"nargs": 2, "type": int, "default": None,
                                    "metavar": ("LO", "HI")}})
    add("update", **{"--conv-range": {"nargs": 2, "default": None,
                                      "metavar": ("LO", "HI")},
                     "--ts-range": {"nargs": 2, "type": int, "default": None,
                                    "metavar": ("LO", "HI")},
                     "--set": {"action": "append", "required": True,
                               "metavar": "COL=VALUE",
                               "help": "scalar assignment, repeatable"}})
    add("changes", **{"--from-version": {"type": int, "required": True},
                      "--to-version": {"type": int, "default": None},
                      "--granularity": {"default": "net",
                                        "choices": ["net", "commits", "auto"]},
                      "--key-cols": {"nargs": "+", "default": None,
                                     "help": "merge key for the net fold "
                                             "(default: the log's recorded "
                                             "key metadata)"},
                      "--dest": {"default": None,
                                 "help": "write the feed as parquet here"}})
    add("maintain", **{"--target-bytes": {"type": int, "default": 96 * 1024 * 1024},
                       "--curve": {"default": "morton", "choices": ["morton", "hilbert"]},
                       "--retain-hours": {"type": float, "default": 168.0},
                       "--force-expire": {"action": "store_true"}})
    add("expire", **{"--keep-last": {"type": int, "default": 1},
                     "--retain-hours": {"type": float, "default": 168.0},
                     "--force": {"action": "store_true"},
                     "--dry-run": {"action": "store_true"}})
    add("report")
    add("check")
    add("clone", **{"--dest": {"required": True},
                    "--version": {"type": int, "default": None}})
    add("alter", **{"--add-json": {"default": None,
                                   "help": 'e.g. {"c1": {"bounds": {"ts": [0, null]}}}'},
                    "--drop": {"action": "append", "default": None}})
    add("export", **{"--dest": {"required": True},
                     "--version": {"type": int, "default": None},
                     "--copy": {"action": "store_true",
                                "help": "copy instead of hard-link"}})
    ip = sub.add_parser("index")
    ip.add_argument("--root", required=True, help="index directory")
    ip.add_argument("--action", required=True,
                    choices=["build", "screen", "compact"])
    ip.add_argument("--docs", default=None,
                    help="documents parquet (build / screen)")
    ip.add_argument("--id-col", default="doc_id")
    ip.add_argument("--text-col", default="text")
    ip.add_argument("--shard", default=None,
                    help="shard tag (default: base for build; for screen "
                         "the JOB ID, so two default-flag screens can "
                         "never overwrite each other's published digests "
                         "— pass the same --shard to RESUME a killed "
                         "screen)")
    ip.add_argument("--dest", default=None,
                    help="screen: write the surviving (novel) rows here")
    ip.add_argument("--no-update-index", action="store_true",
                    help="screen without publishing the survivors' digests")
    ip.add_argument("--job-id", default=None)

    rp = sub.add_parser("registry")
    rp.add_argument("--registry", required=True, help="path to registry.yml")
    rp.add_argument("--action", default="maintain",
                    choices=["maintain", "marts", "report", "scrubs",
                             "freshness", "emit-dag"])
    rp.add_argument("--out", default=None,
                    help="emit-dag: write the schedule spec here "
                         "(default: stdout)")
    rp.add_argument("--table", default=None, help="one table (default: all)")
    rp.add_argument("--mart", default=None, help="one mart (default: all)")
    rp.add_argument("--sf-dir", default=None, help="source dir for mart queries")
    rp.add_argument("--base", default=None, help="override {base} substitution")
    rp.add_argument("--job-id", default=None)
    args = p.parse_args(argv)

    job_id = args.job_id or f"{args.cmd}-{uuid.uuid4().hex[:12]}"
    out: dict = {"cmd": args.cmd, "job_id": job_id}

    # registry actions that only read log/manifest metadata (freshness,
    # report) or emit config (emit-dag) never touch Ray — the emitted
    # hourly freshness task must not pay a Ray session boot per SLA check
    # (round-5 review)
    _REGISTRY_RAY_ACTIONS = ("maintain", "scrubs", "marts")
    needs_ray = args.cmd in (
        "ingest", "compact", "zorder", "merge", "rewrite-manifests", "check",
        "maintain", "delete", "update", "changes", "alter", "index",
    ) or (args.cmd == "registry" and args.action in _REGISTRY_RAY_ACTIONS)
    if needs_ray:
        _ray_session(args.num_cpus)

    if args.cmd == "ingest":
        import ray.data as rd

        from open_finance_lakehouse_ray.pipelines.ingest import ingest_dataset

        snap = ingest_dataset(
            rd.read_parquet(args.source), args.root, job_id=job_id, mode=args.mode
        )
        out["snapshot"] = snap.version
    elif args.cmd == "compact":
        from open_finance_lakehouse_ray.pipelines.compact import compact

        snap = compact(args.root, job_id=job_id, target_bytes=args.target_bytes)
        out["snapshot"] = None if snap is None else snap.version
    elif args.cmd == "zorder":
        from open_finance_lakehouse_ray.pipelines.zorder import zorder, zorder_ranged

        fn = zorder_ranged if args.strategy == "ranged" else zorder
        snap = fn(args.root, job_id=job_id, curve=args.curve)
        out["snapshot"] = None if snap is None else snap.version
    elif args.cmd == "merge":
        import ray.data as rd

        from open_finance_lakehouse_ray.pipelines.merge import merge_into

        snap = merge_into(
            args.root, rd.read_parquet(args.updates), job_id=job_id,
            strategy=args.strategy,
        )
        out["snapshot"] = snap.version
    elif args.cmd == "delete":
        from open_finance_lakehouse_ray.pipelines.delete import delete_where

        snap = delete_where(
            args.root, job_id=job_id,
            conv_id_range=tuple(args.conv_range) if args.conv_range else None,
            ts_range=tuple(args.ts_range) if args.ts_range else None,
        )
        out["snapshot"] = None if snap is None else snap.version
        if snap is not None:
            out["summary"] = snap.summary
    elif args.cmd == "update":
        import pyarrow as pa
        import pyarrow.parquet as pq

        from open_finance_lakehouse_ray.pipelines.delete import update_where
        from open_finance_lakehouse_ray.state.txlog import TableLog

        # coerce CLI strings to the column's type (schema from the log,
        # else a live file footer) — pa.array([str], type=float64) raises
        log = TableLog(args.root)
        sch = log.table_schema()
        if sch is None:
            files = log.files()
            if files:
                import os as _os

                sch = pq.read_schema(_os.path.join(args.root, files[0].path))
        assign = {}
        for kv in args.set:
            col, _, val = kv.partition("=")
            v: object = val
            if sch is not None and col in sch.names:
                t = sch.field(col).type
                try:
                    if pa.types.is_integer(t):
                        v = int(val)
                    elif pa.types.is_floating(t):
                        v = float(val)
                    elif pa.types.is_boolean(t):
                        v = val.lower() in ("1", "true", "t", "yes")
                except ValueError:
                    raise SystemExit(f"--set {col}: {val!r} is not a {t}")
            assign[col] = v
        snap = update_where(
            args.root, job_id=job_id, assign=assign,
            conv_id_range=tuple(args.conv_range) if args.conv_range else None,
            ts_range=tuple(args.ts_range) if args.ts_range else None,
        )
        out["snapshot"] = None if snap is None else snap.version
        if snap is not None:
            out["summary"] = snap.summary
    elif args.cmd == "changes":
        from open_finance_lakehouse_ray.pipelines.cdf import change_feed

        feed = change_feed(
            args.root, from_version=args.from_version,
            to_version=args.to_version, granularity=args.granularity,
            key_cols=tuple(args.key_cols) if args.key_cols else None,
        )
        if args.dest:
            feed.write_parquet(args.dest)
            out["dest"] = args.dest
        else:
            out["changes"] = feed.count()
    elif args.cmd == "maintain":
        from open_finance_lakehouse_ray.pipelines.maintain import maintain

        out.update(
            maintain(
                args.root,
                job_id=job_id,
                target_bytes=args.target_bytes,
                curve=args.curve,
                retain_seconds=args.retain_hours * 3600.0,
                force_expire=args.force_expire,
            )
        )
    elif args.cmd == "rewrite-manifests":
        from open_finance_lakehouse_ray.pipelines.rewrite import rewrite_manifests

        snap = rewrite_manifests(args.root, job_id=job_id)
        out["snapshot"] = snap.version
        out["summary"] = snap.summary
    elif args.cmd == "expire":
        from open_finance_lakehouse_ray.pipelines.expire import expire

        out.update(
            expire(
                args.root,
                keep_last=args.keep_last,
                retain_seconds=args.retain_hours * 3600.0,
                force=args.force,
                dry_run=args.dry_run,
            )
        )
    elif args.cmd == "alter":
        from open_finance_lakehouse_ray.pipelines.alter import alter_constraints

        snap = alter_constraints(
            args.root, job_id=job_id,
            add=json.loads(args.add_json) if args.add_json else None,
            drop=args.drop,
        )
        out["snapshot"] = snap.version
        out["constraints"] = sorted(snap.summary.get("constraints", {}))
    elif args.cmd == "clone":
        from open_finance_lakehouse_ray.pipelines.clone import clone_table

        snap = clone_table(args.root, args.dest, version=args.version, job_id=job_id)
        out["snapshot"] = snap.version
        out["summary"] = snap.summary
    elif args.cmd == "export":
        from open_finance_lakehouse_ray.pipelines.export import export_table

        m = export_table(args.root, args.dest, version=args.version,
                         link=not args.copy)
        out["export"] = {k: m[k] for k in ("snapshot_version", "rows", "status")}
        out["files"] = len(m["files"])
    elif args.cmd == "index":
        # the daily-ingest dedup flow from the CLI: build the corpus
        # identity index once, screen each arriving shard against it
        # (survivors publish their digests so the NEXT shard sees them),
        # compact the accumulated per-shard deltas periodically
        from open_finance_lakehouse_ray.pipelines import dedup as dd

        if args.action == "compact":
            out.update(dd.compact_index(args.root))
        else:
            if not args.docs:
                p.error("--docs is required for index build/screen")
            import ray.data as rd

            docs = rd.read_parquet(args.docs)
            if args.action == "build":
                out["entries"] = dd.build_hash_index(
                    docs, args.root, key_col=args.text_col,
                    shard=args.shard or "base",
                )
            else:  # screen
                # default shard tag = the job id: unique per invocation,
                # so consecutive default-flag screens never os.replace
                # each other's published digests out of the index (the
                # round-5 third-review finding); a killed screen resumes
                # by passing the SAME --shard (or --job-id) again
                shard = args.shard or job_id
                out["shard"] = shard
                kept = dd.incremental_dedup(
                    docs, args.root,
                    key_col=args.text_col, id_col=args.id_col,
                    shard=shard,
                    update_index=not args.no_update_index,
                ).materialize()  # one execution drives BOTH the index
                # update and the sink below
                out["kept_rows"] = kept.count()
                if args.dest:
                    kept.write_parquet(args.dest)
                    out["dest"] = args.dest
                if not args.no_update_index:
                    # the screen fully consumed: its deltas may now fold
                    dd.mark_shard_complete(args.root, shard)
    elif args.cmd == "registry":
        from open_finance_lakehouse_ray.registry import (
            build_registry_marts,
            load_registry,
            maintain_table,
        )

        reg = load_registry(args.registry, base=args.base)
        if args.action == "maintain":
            targets = [args.table] if args.table else list(reg.tables)
            out["maintained"] = {
                t: maintain_table(reg, t, job_id=f"{job_id}/{t}") for t in targets
            }
        elif args.action == "scrubs":
            from open_finance_lakehouse_ray.registry import run_scrubs

            targets = [args.table] if args.table else list(reg.tables)
            out["scrubs"] = {
                t: run_scrubs(reg, t, job_prefix=f"{job_id}/{t}")
                for t in targets
            }
        elif args.action == "freshness":
            from open_finance_lakehouse_ray.registry import freshness_report

            rep = freshness_report(reg)
            out["freshness"] = rep
            if any(v["status"] in ("stale", "missing")
                   for v in rep.values()
                   if v["sla_s"] is not None):
                print(json.dumps(out, default=str))
                return 1
        elif args.action == "marts":
            if not args.sf_dir:
                raise SystemExit("--sf-dir is required for --action marts")
            out["marts"] = build_registry_marts(
                reg, args.sf_dir, job_prefix=job_id,
                names=[args.mart] if args.mart else None,
            )
        elif args.action == "emit-dag":
            from open_finance_lakehouse_ray.registry import emit_schedule

            spec = emit_schedule(reg, registry_path=args.registry,
                                 base=args.base, sf_dir=args.sf_dir)
            if args.out:
                with open(args.out, "w") as f:
                    json.dump(spec, f, indent=2)
                out["dag_spec"] = args.out
                out["dags"] = [d["dag_id"] for d in spec["dags"]]
            else:
                out["schedule"] = spec
        else:
            from open_finance_lakehouse_ray.pipelines.metrics import manifest_report

            out["tables"] = {
                t: manifest_report(reg.table_root(t)) for t in reg.tables
            }
    elif args.cmd == "report":
        from open_finance_lakehouse_ray.pipelines.metrics import manifest_report

        out.update(manifest_report(args.root))
    elif args.cmd == "check":
        from open_finance_lakehouse_ray.pipelines.checks import CheckError, run_checks

        try:
            out["checks"] = run_checks(args.root)
        except CheckError as e:
            out["failed_check"] = e.name
            out["violations"] = e.violations.num_rows
            print(json.dumps(out, default=str))
            return 1

    print(json.dumps(out, default=str))
    if needs_ray:
        import ray

        ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
