"""DELETE WHERE: plan classes (untouched / dropped-whole / rewritten),
SQL NULL semantics, idempotent replay, no-op commits, and the
keys_unique attestation surviving a delete."""

from __future__ import annotations

import pyarrow.compute as pc
import pytest

from open_finance_lakehouse_ray.pipelines.delete import delete_where, plan_delete
from open_finance_lakehouse_ray.pipelines.scan import validation_scan
from open_finance_lakehouse_ray.sources.transcripts import build_transcripts
from open_finance_lakehouse_ray.stages.writer import write_table_file
from open_finance_lakehouse_ray.state.txlog import TableLog


def _seed_table(root: str, n_files: int = 3):
    """Three files with DISJOINT conv_id ranges so the planner's three
    classes are individually addressable."""
    log = TableLog(root)
    log.create()
    tx = build_transcripts(n_convs=90).sort_by(
        [("conv_id", "ascending"), ("turn_idx", "ascending")]
    )
    entries = []
    for i in range(n_files):
        # cut on conversation boundaries so file conv ranges are disjoint
        lo, hi = f"conv-{i * 30:08d}", f"conv-{i * 30 + 29:08d}"
        chunk = tx.filter(
            pc.and_(
                pc.greater_equal(tx["conv_id"], lo),
                pc.less_equal(tx["conv_id"], hi),
            )
        )
        entries.append(write_table_file(root, chunk, presorted=True))
    log.commit(
        operation="ingest", job_id="seed", added=entries,
        summary={"keys_unique": True, "key_cols": ["conv_id", "turn_idx"]},
    )
    return log, tx, entries


def test_plan_classes(table_root):
    log, tx, entries = _seed_table(table_root)
    # predicate covers ALL of file 1 and nothing else
    f1 = entries[1].stats["conv_id"]
    drop, rewrite = plan_delete(
        log.files(), conv_id_range=(f1[0], f1[1]), ts_range=None,
        has_residual=False,
    )
    assert [e.path for e in drop] == [entries[1].path]
    assert rewrite == []  # files 0/2 pruned as untouched
    # a residual term forbids whole-file drops
    drop, rewrite = plan_delete(
        log.files(), conv_id_range=(f1[0], f1[1]), ts_range=None,
        has_residual=True,
    )
    assert drop == [] and [e.path for e in rewrite] == [entries[1].path]


def test_delete_range_and_residual(ray_session, table_root):
    log, tx, entries = _seed_table(table_root)
    f1 = entries[1].stats["conv_id"]
    snap = delete_where(
        table_root, job_id="del-1", conv_id_range=(f1[0], f1[1])
    )
    assert snap.summary["files_dropped_whole"] == 1
    assert snap.summary["files_rewritten"] == 0
    # untouched files keep their original paths (no needless rewrite)
    live = {e.path for e in log.files()}
    assert entries[0].path in live and entries[2].path in live

    # second delete: residual on role inside file 0's range only
    f0 = entries[0].stats["conv_id"]
    snap2 = delete_where(
        table_root, job_id="del-2", conv_id_range=(f0[0], f0[1]),
        match=lambda t: pc.equal(t["role"], "assistant"),
    )
    assert snap2.summary["files_dropped_whole"] == 0
    assert snap2.summary["files_rewritten"] == 1

    got = validation_scan(table_root)
    mask = pc.and_(
        pc.greater_equal(tx["conv_id"], f1[0]), pc.less_equal(tx["conv_id"], f1[1])
    )
    mask2 = pc.and_(
        pc.and_(
            pc.greater_equal(tx["conv_id"], f0[0]),
            pc.less_equal(tx["conv_id"], f0[1]),
        ),
        pc.equal(tx["role"], "assistant"),
    )
    want = tx.filter(pc.invert(pc.or_(mask, mask2)))
    assert got.num_rows == want.num_rows
    assert snap.summary["deleted_rows"] == int(pc.sum(pc.cast(mask, "int64")).as_py())
    assert got.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")]).equals(
        want.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    )


def test_null_predicate_rows_survive(ray_session, table_root):
    """DELETE WHERE tool = X must keep rows whose tool IS NULL."""
    log, tx, _ = _seed_table(table_root)
    tool0 = next(t for t in tx["tool"].to_pylist() if t is not None)
    delete_where(
        table_root, job_id="del-null",
        match=lambda t, v=tool0: pc.equal(t["tool"], v),
    )
    got = validation_scan(table_root)
    n_null = tx.num_rows - pc.count(tx["tool"]).as_py()  # count() skips nulls
    assert got.num_rows == tx.num_rows - pc.sum(
        pc.cast(pc.fill_null(pc.equal(tx["tool"], tool0), False), "int64")
    ).as_py()
    got_nulls = got.num_rows - pc.count(got["tool"]).as_py()
    assert got_nulls == n_null


def test_idempotent_replay_and_noop(ray_session, table_root):
    log, tx, entries = _seed_table(table_root)
    f1 = entries[1].stats["conv_id"]
    s1 = delete_where(table_root, job_id="del-x", conv_id_range=(f1[0], f1[1]))
    s2 = delete_where(table_root, job_id="del-x", conv_id_range=(f1[0], f1[1]))
    assert s1.version == s2.version  # replay no-ops on job_id
    # a predicate provably touching nothing commits nothing
    before = log.current_version()
    assert delete_where(
        table_root, job_id="del-none", conv_id_range=("zzz-0", "zzz-9")
    ) is None
    assert log.current_version() == before


def test_keys_unique_survives_delete(ray_session, table_root):
    log, tx, entries = _seed_table(table_root)
    assert log.keys_unique()
    f1 = entries[1].stats["conv_id"]
    delete_where(table_root, job_id="del-ku", conv_id_range=(f1[0], f1[1]))
    assert log.keys_unique()


def test_delete_needs_a_predicate(ray_session, table_root):
    _seed_table(table_root)
    with pytest.raises(Exception):
        delete_where(table_root, job_id="del-empty")


# ----------------------------------------------------------- UPDATE WHERE


def test_update_where_case_semantics(ray_session, table_root):
    import pyarrow as pa

    from open_finance_lakehouse_ray.pipelines.delete import update_where

    log, tx, entries = _seed_table(table_root)
    f0 = entries[0].stats["conv_id"]
    snap = update_where(
        table_root,
        job_id="up-1",
        conv_id_range=(f0[0], f0[1]),
        match=lambda t: pc.equal(t["role"], "user"),
        assign={"text": lambda t: pc.binary_join_element_wise("U:", t["text"], "")},
    )
    # only the overlapping file rewrites; the others keep their paths
    assert snap.summary["files_rewritten"] == 1
    live = {e.path for e in log.files()}
    assert entries[1].path in live and entries[2].path in live

    got = validation_scan(table_root)
    mask = pc.and_(
        pc.and_(
            pc.greater_equal(tx["conv_id"], f0[0]),
            pc.less_equal(tx["conv_id"], f0[1]),
        ),
        pc.equal(tx["role"], "user"),
    )
    want_text = pc.if_else(
        mask, pc.binary_join_element_wise("U:", tx["text"], ""), tx["text"]
    )
    want = tx.set_column(tx.column_names.index("text"), "text", want_text)
    key = [("conv_id", "ascending"), ("turn_idx", "ascending")]
    assert got.sort_by(key).equals(want.sort_by(key))
    assert snap.summary["updated_rows"] == pc.sum(pc.cast(mask, pa.int64())).as_py()
    # row count unchanged, uniqueness attested through the update
    assert got.num_rows == tx.num_rows


def test_update_where_guards(ray_session, table_root):
    from open_finance_lakehouse_ray.pipelines.delete import update_where

    _seed_table(table_root)
    with pytest.raises(ValueError):
        update_where(table_root, job_id="up-k", match=lambda t: None,
                     assign={"conv_id": "x"})
    with pytest.raises(ValueError):
        update_where(table_root, job_id="up-p", assign={"text": "x"})


def test_update_where_scalar_and_replay(ray_session, table_root):
    from open_finance_lakehouse_ray.pipelines.delete import update_where

    log, tx, _ = _seed_table(table_root)
    s1 = update_where(
        table_root, job_id="up-s",
        match=lambda t: pc.equal(t["role"], "tool"),
        assign={"tool": "redacted"},
    )
    s2 = update_where(
        table_root, job_id="up-s",
        match=lambda t: pc.equal(t["role"], "tool"),
        assign={"tool": "redacted"},
    )
    assert s1.version == s2.version
    got = validation_scan(table_root)
    n_tool = pc.sum(
        pc.cast(pc.fill_null(pc.equal(tx["role"], "tool"), False), "int64")
    ).as_py()
    n_red = pc.sum(
        pc.cast(pc.fill_null(pc.equal(got["tool"], "redacted"), False), "int64")
    ).as_py()
    assert n_red == n_tool and s1.summary["updated_rows"] == n_tool


def test_nomatch_overlapping_files_left_untouched(ray_session, table_root):
    """Stats overlap is necessary-not-sufficient: a residual predicate
    matching rows only in file 0 must leave files 1/2 physically in
    place (noop records, no remove+add conflict surface)."""
    from open_finance_lakehouse_ray.pipelines.delete import update_where

    log, tx, entries = _seed_table(table_root)
    f0_hi = entries[0].stats["conv_id"][1]
    snap = delete_where(
        table_root, job_id="noop-del",
        match=lambda t, hi=f0_hi: pc.less_equal(t["conv_id"], hi),
    )
    # file 0 is processed (all rows match -> zero survivors = pure
    # remove); files 1/2 are noop and not counted
    assert snap.summary["files_rewritten"] == 1
    live = {e.path for e in log.files()}
    assert entries[1].path in live and entries[2].path in live
    assert entries[0].path not in live

    # UPDATE: matching rows only in file 1 -> files 0',2 stay by path
    f1 = entries[1].stats["conv_id"]
    live_before = {e.path for e in log.files()}
    snap2 = update_where(
        table_root, job_id="noop-upd",
        match=lambda t, lo=f1[0], hi=f1[1]: pc.and_(
            pc.greater_equal(t["conv_id"], lo), pc.less_equal(t["conv_id"], hi)
        ),
        assign={"tool": "x"},
    )
    assert snap2.summary["files_rewritten"] == 1
    assert entries[2].path in {e.path for e in log.files()}


def test_update_ts_clears_clustering_metadata(ray_session, table_root):
    from open_finance_lakehouse_ray.pipelines.delete import update_where

    log, tx, entries = _seed_table(table_root)
    assert entries[0].sorted_by  # seeded files claim a sort
    update_where(
        table_root, job_id="ts-upd",
        match=lambda t: pc.equal(t["role"], "user"),
        assign={"ts": lambda t: t["ts"]},
    )
    for e in log.files():
        assert e.z_range is None and e.sorted_by == []


def test_update_cannot_violate_log_constraint(ray_session, table_root):
    from open_finance_lakehouse_ray.pipelines.alter import alter_constraints
    from open_finance_lakehouse_ray.pipelines.delete import update_where

    log, tx, entries = _seed_table(table_root)
    alter_constraints(
        table_root, job_id="c-add",
        add={"role_domain": {
            "allowed_values": {"role": ["user", "assistant", "tool"]}}},
    )
    v = log.current_version()
    with pytest.raises(Exception) as ei:
        update_where(
            table_root, job_id="c-upd",
            match=lambda t: pc.equal(t["role"], "user"),
            assign={"role": "intruder"},
        )
    assert "ContractViolation" in str(ei.value) or "disallowed" in str(ei.value)
    assert log.current_version() == v  # breach withheld the commit


def test_whole_file_drop_spares_null_predicate_rows(ray_session, table_root):
    """Min/max stats ignore nulls, and a NULL-predicate row must SURVIVE a
    delete (SQL semantics: NULL BETWEEN ... is not true). Containment may
    only prove a whole-file drop when the recorded null count is zero
    (round-4 review)."""
    import pyarrow as pa

    from open_finance_lakehouse_ray.pipelines.ingest import ingest_dataset

    tx = build_transcripts(n_convs=6).to_pandas()
    # null out ts on a few rows; every non-null ts stays in range
    tx.loc[tx.index[:4], "ts"] = None
    t = pa.Table.from_pandas(tx, preserve_index=False)
    import ray.data as rd

    ingest_dataset(
        rd.from_arrow(t), table_root, job_id="nw-base", validate=False
    )
    log = TableLog(table_root)
    ts = [e.stats["ts"] for e in log.files() if "ts" in e.stats]
    lo = min(s[0] for s in ts)
    hi = max(s[1] for s in ts)
    snap = delete_where(table_root, job_id="nw-del", ts_range=(lo, hi))
    assert snap.summary["deleted_rows"] == t.num_rows - 4
    out = validation_scan(table_root).to_pandas()
    assert len(out) == 4 and out["ts"].isna().all()


def test_null_free_files_still_drop_whole(ray_session, table_root):
    """The common case keeps its fast path: a validated ingest records
    null_counts of 0 and a fully-contained file drops without a rewrite."""
    import ray.data as rd

    from open_finance_lakehouse_ray.pipelines.ingest import ingest_dataset

    tx = build_transcripts(n_convs=6)
    ingest_dataset(rd.from_arrow(tx), table_root, job_id="nf-base")
    log = TableLog(table_root)
    assert all(e.null_counts.get("ts") == 0 for e in log.files())
    ts = [e.stats["ts"] for e in log.files()]
    snap = delete_where(
        table_root, job_id="nf-del",
        ts_range=(min(s[0] for s in ts), max(s[1] for s in ts)),
    )
    assert snap.summary["files_dropped_whole"] >= 1
    assert validation_scan(table_root).num_rows == 0


def test_replay_after_replan_commit_is_noop(ray_session, table_root, monkeypatch):
    """A run that committed under an attempt-scoped ``job~replanN`` id must
    make a later replay under the BARE id a no-op — re-executing would
    apply the verb a second time against the new head (round-4 review)."""
    import ray.data as rd

    from open_finance_lakehouse_ray.pipelines import delete as delete_mod
    from open_finance_lakehouse_ray.pipelines.ingest import ingest_dataset
    from open_finance_lakehouse_ray.state.txlog import CommitConflict

    tx = build_transcripts(n_convs=8)
    ingest_dataset(rd.from_arrow(tx), table_root, job_id="rp-base")

    real_commit = delete_mod.commit_via_actor_or_direct
    fails = {"left": 1}

    def flaky_commit(log_arg, **kw):
        if fails["left"] and kw["job_id"] == "rp-del":
            fails["left"] -= 1
            raise CommitConflict("synthetic: concurrent commit")
        return real_commit(log_arg, **kw)

    monkeypatch.setattr(delete_mod, "commit_via_actor_or_direct", flaky_commit)
    log = TableLog(table_root)
    f0 = log.files()[0]
    snap = delete_where(
        table_root, job_id="rp-del",
        conv_id_range=tuple(f0.stats["conv_id"]),
    )
    assert snap.job_id == "rp-del~replan1"
    rows_after = validation_scan(table_root).num_rows

    # replay under the BARE id: must return the replan commit, not
    # re-execute (which would delete the same range from the new head)
    snap2 = delete_where(
        table_root, job_id="rp-del",
        conv_id_range=tuple(f0.stats["conv_id"]),
    )
    assert snap2.version == snap.version
    assert TableLog(table_root).current_version() == snap.version
    assert validation_scan(table_root).num_rows == rows_after
