"""Change data feed tests: rewrite cancellation, append/delete classification,
update pre/post pairing, and duplicate-key surplus handling."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pytest
import ray.data as rd

from open_finance_lakehouse_ray.pipelines.cdf import change_feed
from open_finance_lakehouse_ray.pipelines.compact import compact
from open_finance_lakehouse_ray.pipelines.delete import delete_where
from open_finance_lakehouse_ray.pipelines.ingest import ingest_dataset
from open_finance_lakehouse_ray.sources.transcripts import build_transcripts
from open_finance_lakehouse_ray.stages.writer import write_table_file
from open_finance_lakehouse_ray.state.txlog import TableLog


def test_rewrite_noise_cancels(ray_session, table_root):
    """Compaction moves every row to new files; the feed must be empty."""
    tx = build_transcripts(n_convs=30)
    ingest_dataset(rd.from_arrow(tx).repartition(8), table_root, job_id="c-base", summary={"key_cols": ["conv_id", "turn_idx"]})
    log = TableLog(table_root)
    v0 = log.current_version()
    assert compact(table_root, job_id="c-compact", target_bytes=64 * 1024 * 1024)
    feed = change_feed(table_root, from_version=v0).to_pandas()
    assert len(feed) == 0


def test_append_and_delete_classify(ray_session, table_root):
    tx = build_transcripts(n_convs=30)
    ingest_dataset(rd.from_arrow(tx), table_root, job_id="a-base", summary={"key_cols": ["conv_id", "turn_idx"]})
    log = TableLog(table_root)
    v0 = log.current_version()
    import pyarrow.compute as pc

    extra = build_transcripts(seed=5, n_convs=6)
    # disjoint key space ("convE-…" sorts above every "conv-…") so the
    # delete below provably touches only base files
    extra = extra.set_column(
        0, "conv_id", pc.utf8_replace_slice(extra["conv_id"], 0, 4, "convE")
    )
    n_extra = extra.num_rows
    ingest_dataset(rd.from_arrow(extra), table_root, job_id="a-extra", validate=False)

    f0 = log.files()[0]
    c = f0.stats["conv_id"]
    snap = delete_where(table_root, job_id="a-del", conv_id_range=(c[0], c[1]))
    n_del = snap.summary["deleted_rows"]

    feed = change_feed(table_root, from_version=v0).to_pandas()
    counts = feed["_change_type"].value_counts().to_dict()
    assert counts == {"insert": n_extra, "delete": n_del}


def test_update_pairing_and_dup_surplus(ray_session, table_root):
    log = TableLog(table_root)
    log.create()

    def row(text):
        return pa.table(
            {
                "conv_id": ["conv-1"],
                "turn_idx": pa.array([0], pa.int32()),
                "role": ["user"],
                "text": [text],
                "tool": pa.array([None], pa.string()),
                "ts": pa.array([1000], pa.timestamp("us")),
            }
        )

    e0 = write_table_file(table_root, row("a"), presorted=True)
    log.commit(operation="ingest", job_id="v0", added=[e0],
               summary={"key_cols": ["conv_id", "turn_idx"]})
    v0 = log.current_version()
    e1 = write_table_file(
        table_root, pa.concat_tables([row("b"), row("c")]), presorted=True
    )
    log.commit(
        operation="merge", job_id="v1", added=[e1], removed_paths={e0.path},
        read_paths={e0.path},
    )

    feed = (
        change_feed(table_root, from_version=v0)
        .to_pandas()
        .sort_values(["_change_type", "text"])
    )
    counts = feed["_change_type"].value_counts().to_dict()
    # one old copy pairs with the FIRST new copy (sorted) as an update;
    # the surplus new copy is an insert
    assert counts == {"insert": 1, "update_preimage": 1, "update_postimage": 1}
    assert feed.loc[feed["_change_type"] == "update_preimage", "text"].iloc[0] == "a"
    assert feed.loc[feed["_change_type"] == "update_postimage", "text"].iloc[0] == "b"
    assert feed.loc[feed["_change_type"] == "insert", "text"].iloc[0] == "c"


def test_change_stream_incremental(ray_session, table_root, tmp_path):
    from open_finance_lakehouse_ray.pipelines.cdf import ChangeStream

    tx = build_transcripts(n_convs=20)
    ingest_dataset(rd.from_arrow(tx), table_root, job_id="cs-base", summary={"key_cols": ["conv_id", "turn_idx"]})
    ckpt = str(tmp_path / "cdc.json")
    cs = ChangeStream(table_root, ckpt)
    assert cs.poll() is None  # caught up at creation

    extra = build_transcripts(seed=8, n_convs=4)
    ingest_dataset(rd.from_arrow(extra), table_root, job_id="cs-a", validate=False)
    feed, to_v = cs.poll()
    df = feed.to_pandas()
    assert set(df["_change_type"]) == {"insert"} and len(df) == extra.num_rows
    # crash before commit: the same feed is re-served
    cs2 = ChangeStream(table_root, ckpt)
    feed2, to_v2 = cs2.poll()
    assert to_v2 == to_v and feed2.count() == len(df)
    cs2.commit(to_v2)
    assert cs2.poll() is None

    log = TableLog(table_root)
    f0 = log.files()[0]
    delete_where(
        table_root, job_id="cs-del",
        conv_id_range=tuple(f0.stats["conv_id"]),
    )
    feed3, to_v3 = cs2.poll()
    df3 = feed3.to_pandas()
    assert set(df3["_change_type"]) <= {"delete"} and len(df3) > 0
    cs2.commit(to_v3)
    assert cs2.poll() is None


def test_feed_preserves_dtypes_and_relative_root(ray_session, tmp_path):
    """The outer-merge pairing must not upcast int columns to float, and
    a relative table root must not double-prefix paths."""
    import os

    from open_finance_lakehouse_ray.pipelines.cdf import change_feed

    # build with an absolute root (Ray WRITE tasks can't resolve a
    # relative root against the driver cwd), then READ the feed through
    # the relative root — the double-prefix bug lived in the read plan
    abs_root = str(tmp_path / "rel-table")
    tx = build_transcripts(n_convs=10)
    ingest_dataset(rd.from_arrow(tx), abs_root, job_id="rr-base", summary={"key_cols": ["conv_id", "turn_idx"]})
    log = TableLog(abs_root)
    v0 = log.current_version()
    f0 = log.files()[0]
    delete_where(abs_root, job_id="rr-del", conv_id_range=tuple(f0.stats["conv_id"]))
    extra = build_transcripts(seed=11, n_convs=2)
    ingest_dataset(rd.from_arrow(extra), abs_root, job_id="rr-add", validate=False)
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        feed = change_feed("rel-table", from_version=v0).to_pandas()
        assert len(feed) > 0
        assert str(feed["turn_idx"].dtype) == "int32"  # no float upcast
        # re-inserted convs pair with deleted ones as updates — all four
        # classes are legal here; inserts and deletes must both be present
        assert {"insert", "delete"} <= set(feed["_change_type"])
    finally:
        os.chdir(cwd)


def test_hash_payload_parity(ray_session, table_root):
    """The hash-reduced two-phase diff must emit exactly the full-payload
    feed (unique-key table, deletes + updates)."""
    import pyarrow.compute as pc

    from open_finance_lakehouse_ray.pipelines.cdf import change_feed
    from open_finance_lakehouse_ray.pipelines.delete import update_where

    tx = build_transcripts(n_convs=40)
    ingest_dataset(
        rd.from_arrow(tx).repartition(8), table_root, job_id="hp-base",
        summary={"keys_unique": True, "key_cols": ["conv_id", "turn_idx"]},
    )
    log = TableLog(table_root)
    v0 = log.current_version()
    f0 = log.files()[0]
    delete_where(
        table_root, job_id="hp-del", conv_id_range=tuple(f0.stats["conv_id"])
    )
    update_where(
        table_root, job_id="hp-upd",
        match=lambda t: pc.equal(t["role"], "tool"),
        assign={"tool": "scrubbed"},
    )
    assert log.keys_unique()

    def fetch(payload):
        return (
            change_feed(table_root, from_version=v0, payload=payload)
            .to_pandas()
            .sort_values(["conv_id", "turn_idx", "_change_type"], kind="mergesort")
            .reset_index(drop=True)
        )

    full, hashed = fetch("full"), fetch("hash")
    assert len(full) > 0
    pd.testing.assert_frame_equal(full, hashed[full.columns])


# ------------------------------------------------------- write-time CDC


def test_commit_granularity_matches_net(ray_session, table_root):
    """commits-granularity (recorded CDC, zero recompute) concatenated
    over a delete+update+compact span equals the computed net diff when
    keys are touched once — and spans maintenance via empty markers."""
    import pyarrow.compute as pc

    from open_finance_lakehouse_ray.pipelines.delete import update_where

    tx = build_transcripts(n_convs=40)
    ingest_dataset(
        rd.from_arrow(tx).repartition(6), table_root, job_id="wc-base",
        summary={"keys_unique": True, "key_cols": ["conv_id", "turn_idx"]},
    )
    log = TableLog(table_root)
    v0 = log.current_version()
    f0 = log.files()[0]
    delete_where(table_root, job_id="wc-del", conv_id_range=tuple(f0.stats["conv_id"]))
    update_where(
        table_root, job_id="wc-upd",
        match=lambda t: pc.equal(t["role"], "tool"),
        assign={"tool": "scrubbed"},
    )
    assert compact(table_root, job_id="wc-compact", target_bytes=64 * 1024 * 1024)

    def norm(df):
        return (
            df.drop(columns=[c for c in ("_commit_version",) if c in df])
            .sort_values(["conv_id", "turn_idx", "_change_type", "tool"],
                         kind="mergesort")
            .reset_index(drop=True)
        )

    net = norm(change_feed(table_root, from_version=v0, granularity="net").to_pandas())
    rec = norm(
        change_feed(table_root, from_version=v0, granularity="commits").to_pandas()
    )
    assert len(net) > 0
    pd.testing.assert_frame_equal(net, rec[net.columns])


def test_commits_granularity_covers_ingest_and_falls_back(ray_session, table_root):
    tx = build_transcripts(n_convs=10)
    ingest_dataset(rd.from_arrow(tx), table_root, job_id="wf-base", summary={"key_cols": ["conv_id", "turn_idx"]})
    log = TableLog(table_root)
    v0 = log.current_version()
    extra = build_transcripts(seed=13, n_convs=3)
    ingest_dataset(rd.from_arrow(extra), table_root, job_id="wf-a", validate=False)
    rec = change_feed(
        table_root, from_version=v0, granularity="commits"
    ).to_pandas()
    assert set(rec["_change_type"]) == {"insert"} and len(rec) == extra.num_rows
    assert set(rec["_commit_version"]) == {log.current_version()}

    # a commit with no marker (raw log.commit) blocks commits-granularity
    import pytest as _pytest

    from open_finance_lakehouse_ray.stages.writer import write_table_file

    e = write_table_file(table_root, build_transcripts(seed=14, n_convs=1))
    log.commit(operation="merge", job_id="wf-raw", added=[e])
    with _pytest.raises(ValueError):
        change_feed(table_root, from_version=v0, granularity="commits")
    auto = change_feed(table_root, from_version=v0, granularity="auto").to_pandas()
    assert len(auto) > 0  # falls back to the computed net diff


def test_cdc_artifact_and_dependency_lifecycle(ray_session, table_root):
    """CDC artifacts survive the orphan sweep; whole-file-delete deps
    outlive the snapshot that carried them in a manifest; both die when
    the CDC commit itself expires."""
    import os

    tx = build_transcripts(n_convs=30)
    ingest_dataset(
        rd.from_arrow(tx).repartition(3), table_root, job_id="lc-base",
        summary={"keys_unique": True, "key_cols": ["conv_id", "turn_idx"]},
    )
    log = TableLog(table_root)
    f1 = log.files()[1]
    snap_del = delete_where(
        table_root, job_id="lc-del", conv_id_range=tuple(f1.stats["conv_id"])
    )
    assert snap_del.summary["cdc"]["delete_whole"] == [f1.path]
    extra = build_transcripts(seed=15, n_convs=2)
    ingest_dataset(rd.from_arrow(extra), table_root, job_id="lc-a", validate=False)

    # sweep spares the delete_whole dependency (it is manifest-referenced
    # by v1 AND cdc-referenced by the delete commit)
    swept = log.sweep_orphans(grace_seconds=0.0, dry_run=True)
    assert f1.path not in swept

    # expire v1: the dep file must SURVIVE (the retained delete commit's
    # CDC still reads it) and its commit image stays readable
    r = log.expire_snapshots(keep_last=2, retain_seconds=0.0)
    assert log.versions()[0] == snap_del.version
    assert os.path.exists(os.path.join(table_root, f1.path))
    from open_finance_lakehouse_ray.pipelines.cdf import commit_changes

    img = commit_changes(table_root, snap_del.version).to_pandas()
    # image = whole-dropped f1 rows + the rewritten neighbors' recorded
    # deletions (file conv ranges overlap under a random repartition)
    assert set(img["_change_type"]) == {"delete"}
    assert len(img) == snap_del.summary["deleted_rows"]

    # expire the delete commit itself: dep + artifacts die
    log.expire_snapshots(keep_last=1, retain_seconds=0.0)
    assert not os.path.exists(os.path.join(table_root, f1.path))


def test_expired_span_raises_not_silently_truncates(ray_session, table_root, tmp_path):
    """A consumer whose cursor predates expired commits must get
    StaleTableError from commits/auto granularity — never a feed missing
    the expired commits' changes."""
    import pytest as _pytest

    from open_finance_lakehouse_ray.pipelines.cdf import ChangeStream
    from open_finance_lakehouse_ray.state.txlog import StaleTableError

    tx = build_transcripts(n_convs=12)
    ingest_dataset(rd.from_arrow(tx), table_root, job_id="ex-base",
                   summary={"keys_unique": True, "key_cols": ["conv_id", "turn_idx"]})
    log = TableLog(table_root)
    cs = ChangeStream(table_root, str(tmp_path / "c.json"))  # cursor = v1
    f0 = log.files()[0]
    delete_where(table_root, job_id="ex-del", conv_id_range=tuple(f0.stats["conv_id"]))
    ingest_dataset(
        rd.from_arrow(build_transcripts(seed=21, n_convs=2)), table_root,
        job_id="ex-a", validate=False,
    )
    log.expire_snapshots(keep_last=1, retain_seconds=0.0)
    with _pytest.raises(StaleTableError):
        cs.poll(granularity="commits")
    with _pytest.raises(StaleTableError):
        cs.poll(granularity="auto")


def test_cdc_replica_replay_converges(ray_session, table_root, tmp_path):
    """The consumer contract end to end: applying each poll's per-commit
    feed to a replica (delete by key, upsert postimages/inserts)
    reproduces the table exactly — across appends, deletes and updates."""
    import pyarrow.compute as pc

    from open_finance_lakehouse_ray.pipelines.cdf import ChangeStream
    from open_finance_lakehouse_ray.pipelines.delete import update_where
    from open_finance_lakehouse_ray.pipelines.scan import validation_scan

    tx = build_transcripts(n_convs=25)
    ingest_dataset(
        rd.from_arrow(tx).repartition(4), table_root, job_id="rp-base",
        summary={"keys_unique": True, "key_cols": ["conv_id", "turn_idx"]},
    )
    log = TableLog(table_root)
    replica = tx.to_pandas().set_index(["conv_id", "turn_idx"])  # snapshot at cursor
    cs = ChangeStream(table_root, str(tmp_path / "rp.json"))

    f0 = log.files()[0]
    delete_where(table_root, job_id="rp-del", conv_id_range=tuple(f0.stats["conv_id"]))
    update_where(
        table_root, job_id="rp-upd",
        match=lambda t: pc.equal(t["role"], "tool"), assign={"tool": "x"},
    )
    ingest_dataset(
        rd.from_arrow(build_transcripts(seed=23, n_convs=3)), table_root,
        job_id="rp-a", validate=False,
    )

    while (polled := cs.poll(granularity="commits")) is not None:
        feed, to_v = polled
        df = feed.to_pandas().sort_values("_commit_version", kind="mergesort")
        for _, grp in df.groupby("_commit_version", sort=True):
            gone = grp[grp["_change_type"].isin(["delete", "update_preimage"])]
            replica = replica.drop(
                index=[t for t in zip(gone["conv_id"], gone["turn_idx"])
                       if t in replica.index]
            )
            put = grp[grp["_change_type"].isin(["insert", "update_postimage"])]
            if len(put):
                put = put.drop(columns=["_change_type", "_commit_version"])
                replica = pd.concat(
                    [replica, put.set_index(["conv_id", "turn_idx"])]
                )
        cs.commit(to_v)

    want = validation_scan(table_root).to_pandas().set_index(["conv_id", "turn_idx"])
    replica = replica.sort_index()
    want = want.sort_index()
    pd.testing.assert_frame_equal(replica, want[replica.columns])


def test_merge_records_cdc_both_strategies(ray_session, table_root, tmp_path):
    """MERGE commits now carry write-time CDC on both strategies; the
    recorded per-commit feed equals the computed net diff, and stale
    losers emit nothing."""
    from open_finance_lakehouse_ray.pipelines.merge import merge_into
    from open_finance_lakehouse_ray.sources.transcripts import late_turns

    for strategy in ("broadcast", "shuffle"):
        root = str(tmp_path / f"m-{strategy}")
        tx = build_transcripts(n_convs=25)
        ingest_dataset(
            rd.from_arrow(tx).repartition(4), root, job_id="mb-base",
            summary={"keys_unique": True, "key_cols": ["conv_id", "turn_idx"]},
        )
        log = TableLog(root)
        v0 = log.current_version()
        late = late_turns(tx, n_updates=20, n_inserts=10, n_stale=8)
        merge_into(root, late, job_id="mb-merge", num_buckets=8,
                   strategy=strategy)

        def norm(df):
            cols = [c for c in df.columns if c != "_commit_version"]
            return (
                df[cols]
                .sort_values(["conv_id", "turn_idx", "_change_type"],
                             kind="mergesort")
                .reset_index(drop=True)
            )

        net = norm(
            change_feed(root, from_version=v0, granularity="net").to_pandas()
        )
        rec = norm(
            change_feed(root, from_version=v0, granularity="commits").to_pandas()
        )
        counts = rec["_change_type"].value_counts().to_dict()
        assert counts.get("insert") == 10, (strategy, counts)
        assert counts.get("update_postimage") == counts.get("update_preimage")
        assert "STALE-MUST-NOT-APPEAR" not in set(
            rec["text"]
        )  # stale losers emit nothing
        pd.testing.assert_frame_equal(net, rec[net.columns], check_dtype=False)


def test_auto_multi_touch_reduces_to_net(ray_session, table_root):
    """auto granularity folds recorded per-commit events into a TRUE net
    diff: a key updated in two commits emits ONE pre/post pair (first
    preimage, last postimage); rows inserted then deleted inside the span
    cancel entirely; a value updated away and back cancels. The fold must
    match the computed net diff bit for bit (ADVICE r2, cdf.py:346)."""
    import pyarrow.compute as pc

    from open_finance_lakehouse_ray.pipelines.delete import update_where

    tx = build_transcripts(n_convs=30)
    ingest_dataset(
        rd.from_arrow(tx).repartition(4), table_root, job_id="mt-base",
        summary={"keys_unique": True, "key_cols": ["conv_id", "turn_idx"]},
    )
    log = TableLog(table_root)
    v0 = log.current_version()

    # same keys touched TWICE: tool -> "x" then tool -> "y"
    sel = lambda t: pc.equal(t["role"], "tool")  # noqa: E731
    update_where(table_root, job_id="mt-u1", match=sel, assign={"tool": "x"})
    update_where(table_root, job_id="mt-u2", match=sel, assign={"tool": "y"})
    # insert-then-delete inside the span: must cancel to nothing
    extra = build_transcripts(seed=21, n_convs=3)
    extra = extra.set_column(
        0, "conv_id", pc.utf8_replace_slice(extra["conv_id"], 0, 4, "convT")
    )
    ingest_dataset(rd.from_arrow(extra), table_root, job_id="mt-extra", validate=False)
    delete_where(table_root, job_id="mt-del", conv_id_range=("convT", "convT~"))

    def norm(df):
        return (
            df.sort_values(["conv_id", "turn_idx", "_change_type"], kind="mergesort")
            .reset_index(drop=True)
        )

    auto = norm(change_feed(table_root, from_version=v0, granularity="auto").to_pandas())
    net = norm(change_feed(table_root, from_version=v0, granularity="net").to_pandas())
    pd.testing.assert_frame_equal(auto, net[auto.columns])
    # no intermediate state leaks: every postimage shows the FINAL value
    posts = auto[auto["_change_type"] == "update_postimage"]
    assert len(posts) > 0 and set(posts["tool"]) == {"y"}
    # the transient convT rows are gone entirely
    assert not auto["conv_id"].str.startswith("convT").any()
    # the span's commits all carry recorded CDC (the fold path actually ran)
    head = log.current_version()
    from open_finance_lakehouse_ray.pipelines.cdf import commit_changes

    assert all(
        commit_changes(table_root, v) is not None for v in range(v0 + 1, head + 1)
    )


def test_auto_update_roundtrip_cancels(ray_session, table_root):
    """tool -> 'x' then back to its original value: net is EMPTY."""
    import pyarrow.compute as pc

    from open_finance_lakehouse_ray.pipelines.delete import update_where

    log = TableLog(table_root)
    log.create()
    t = pa.table(
        {
            "conv_id": ["c1", "c2"],
            "turn_idx": pa.array([0, 0], pa.int32()),
            "role": ["user", "user"],
            "text": ["hello", "world"],
            "tool": ["orig", "orig"],
            "ts": pa.array([1000, 2000], pa.timestamp("us")),
        }
    )
    e = write_table_file(table_root, t)
    log.commit(operation="ingest", job_id="rt-base", added=[e],
               summary={"keys_unique": True, "key_cols": ["conv_id", "turn_idx"], "cdc": {"derive": "commit-paths"}})
    v0 = log.current_version()
    update_where(table_root, job_id="rt-u1",
                 match=lambda b: pc.equal(b["conv_id"], "c1"),
                 assign={"tool": "x"})
    update_where(table_root, job_id="rt-u2",
                 match=lambda b: pc.equal(b["conv_id"], "c1"),
                 assign={"tool": "orig"})
    auto = change_feed(table_root, from_version=v0, granularity="auto").to_pandas()
    assert len(auto) == 0


def test_change_stream_non_default_keys(ray_session, table_root, tmp_path):
    """ChangeStream over a table NOT keyed by (conv_id, turn_idx): the
    auto-granularity net fold must pair on the stream's declared key_cols
    instead of KeyErroring on the transcript default."""
    from open_finance_lakehouse_ray.pipelines.cdf import ChangeStream

    log = TableLog(table_root)
    log.create()
    t = pa.table({"event_id": pa.array([1, 2, 3], pa.int64()),
                  "v": ["a", "b", "c"]})
    e = write_table_file(table_root, t, sort_by=())
    log.commit(operation="ingest", job_id="ks-base", added=[e],
               summary={"cdc": {"derive": "commit-paths"}})
    cs = ChangeStream(table_root, str(tmp_path / "ck.json"),
                      key_cols=("event_id",))
    t2 = pa.table({"event_id": pa.array([4], pa.int64()), "v": ["d"]})
    e2 = write_table_file(table_root, t2, sort_by=())
    log.commit(operation="ingest", job_id="ks-a", added=[e2],
               summary={"cdc": {"derive": "commit-paths"}})
    got = cs.poll()
    assert got is not None
    feed = got[0].to_pandas()
    assert list(feed["event_id"]) == [4]
    assert set(feed["_change_type"]) == {"insert"}


def test_key_resolution_from_log_and_strictness(ray_session, table_root, tmp_path):
    """Round-4 advice: the net fold must never assume a transcript key.
    (a) a table with recorded key metadata resolves automatically;
    (b) a table without metadata raises for net/auto instead of silently
    pairing on conv_id/turn_idx; (c) commits granularity stays usable."""
    from open_finance_lakehouse_ray.pipelines.cdf import ChangeStream

    tx = build_transcripts(n_convs=12)
    ingest_dataset(rd.from_arrow(tx), table_root, job_id="kr-base",
                   summary={"key_cols": ["conv_id", "turn_idx"]})
    log = TableLog(table_root)
    assert log.table_key_cols() == ("conv_id", "turn_idx")
    v0 = log.current_version()
    extra = build_transcripts(seed=9, n_convs=2)
    extra = extra.set_column(
        0, "conv_id", pc.utf8_replace_slice(extra["conv_id"], 0, 4, "convQ")
    )
    ingest_dataset(rd.from_arrow(extra), table_root, job_id="kr-a",
                   validate=False)
    # (a) no key_cols passed anywhere: resolves from the log
    feed = change_feed(table_root, from_version=v0).to_pandas()
    assert set(feed["_change_type"]) == {"insert"}
    cs = ChangeStream(table_root, str(tmp_path / "kr.json"), start_version=v0)
    polled = cs.poll()
    assert polled is not None

    # (b)/(c) a metadata-less table: net raises, commits still works
    root2 = str(tmp_path / "nometa")
    ingest_dataset(rd.from_arrow(tx), root2, job_id="n-base")
    v0b = TableLog(root2).current_version()
    ingest_dataset(rd.from_arrow(extra), root2, job_id="n-a", validate=False)
    with pytest.raises(ValueError, match="key_cols"):
        change_feed(root2, from_version=v0b).to_pandas()
    # explicit key always accepted
    ok = change_feed(root2, from_version=v0b,
                     key_cols=("conv_id", "turn_idx")).to_pandas()
    assert set(ok["_change_type"]) == {"insert"}


def test_key_metadata_survives_expire(ray_session, table_root):
    """VACUUM cuts the parent chain; the oldest retained snapshot must
    inherit key/schema metadata so ChangeStream keeps resolving."""
    tx = build_transcripts(n_convs=10)
    ingest_dataset(
        rd.from_arrow(tx), table_root, job_id="me-base",
        summary={"keys_unique": True, "key_cols": ["conv_id", "turn_idx"]},
    )
    ingest_dataset(
        rd.from_arrow(build_transcripts(seed=13, n_convs=2)), table_root,
        job_id="me-a", validate=False,
    )
    log = TableLog(table_root)
    from open_finance_lakehouse_ray.pipelines.compact import compact

    compact(table_root, job_id="me-c", target_bytes=64 * 1024 * 1024)
    log.expire_snapshots(keep_last=1, retain_seconds=0.0)
    log2 = TableLog(table_root)
    assert len(log2.versions()) == 1
    assert log2.table_key_cols() == ("conv_id", "turn_idx")
    assert log2.table_schema() is not None


def test_overwrite_is_a_key_identity_barrier(ray_session, table_root):
    """A re-keying OVERWRITE resets table identity: key metadata recorded
    below it must not leak through the walker, and a historical span still
    resolves its own (pre-overwrite) key (round-4 review)."""
    tx = build_transcripts(n_convs=8)
    ingest_dataset(rd.from_arrow(tx), table_root, job_id="ob-base",
                   summary={"key_cols": ["conv_id", "turn_idx"]})
    log = TableLog(table_root)
    v1 = log.current_version()
    ingest_dataset(rd.from_arrow(build_transcripts(seed=3, n_convs=2)),
                   table_root, job_id="ob-a", validate=False)
    v2 = TableLog(table_root).current_version()
    # overwrite WITHOUT key metadata: identity unknown from here up
    ingest_dataset(rd.from_arrow(build_transcripts(seed=4, n_convs=3)),
                   table_root, job_id="ob-ow", mode="overwrite",
                   validate=False)
    log = TableLog(table_root)
    assert log.table_key_cols() is None  # barrier: no inheritance
    assert log.table_key_cols(v2) == ("conv_id", "turn_idx")  # history intact
    # historical span (v1, v2] resolves at the SPAN END, so it still folds
    feed = change_feed(table_root, from_version=v1, to_version=v2).to_pandas()
    assert set(feed["_change_type"]) == {"insert"}
    # head span has no key identity: net/auto must refuse
    with pytest.raises(ValueError, match="key_cols"):
        change_feed(table_root, from_version=v2).to_pandas()


def test_restore_mirrors_key_identity(ray_session, table_root):
    """RESTORE swaps live content wholesale: it must mirror the target's
    key_cols (like keys_unique) so the walker never resolves a key recorded
    by commits between the target and the old head (round-4 review)."""
    from open_finance_lakehouse_ray.pipelines.restore import restore

    ingest_dataset(rd.from_arrow(build_transcripts(n_convs=6)), table_root,
                   job_id="rs-base",
                   summary={"key_cols": ["conv_id", "turn_idx"]})
    v1 = TableLog(table_root).current_version()
    # a later re-keying overwrite records a DIFFERENT key
    ingest_dataset(rd.from_arrow(build_transcripts(seed=5, n_convs=2)),
                   table_root, job_id="rs-ow", mode="overwrite",
                   validate=False, summary={"key_cols": ["turn_id"]})
    assert TableLog(table_root).table_key_cols() == ("turn_id",)
    restore(table_root, to_version=v1, job_id="rs-undo")
    # live data is v1's again: identity must be v1's, not the overwrite's
    assert TableLog(table_root).table_key_cols() == ("conv_id", "turn_idx")

    # restore to a version with NO identity acts as a barrier (never walks
    # past itself into the overwrite's turn_id)
    ingest_dataset(rd.from_arrow(build_transcripts(seed=6, n_convs=2)),
                   table_root, job_id="rs-ow2", mode="overwrite",
                   validate=False)
    v_noid = TableLog(table_root).current_version()
    assert TableLog(table_root).table_key_cols() is None
    ingest_dataset(rd.from_arrow(build_transcripts(seed=7, n_convs=2)),
                   table_root, job_id="rs-app", validate=False,
                   summary={"key_cols": ["other_key"]})
    restore(table_root, to_version=v_noid, job_id="rs-undo2")
    assert TableLog(table_root).table_key_cols() is None


def test_diff_partition_list_columns(ray_session):
    """Arrow list columns reach the diff kernel as ndarray cells —
    unhashable and ambiguous under ``==`` (round-4 review). Both the
    unique-key fast path and the duplicate-key multiset path must
    classify them, and values must survive the token round-trip."""
    import numpy as np

    from open_finance_lakehouse_ray.pipelines.cdf import _diff_partition

    df = pd.DataFrame(
        {
            "k": [1, 1, 2, 3],
            "v": [
                np.array([1.0, 2.0]),
                np.array([1.0, 2.5]),
                np.array([3.0]),
                np.array([4.0]),
            ],
            "_side": [0, 1, 0, 1],
            "_pk": [0, 0, 0, 0],
        }
    )
    out = _diff_partition(["k"])(df)
    assert sorted(out["_change_type"]) == [
        "delete", "insert", "update_postimage", "update_preimage",
    ]
    post = out.loc[out["_change_type"] == "update_postimage", "v"].iloc[0]
    assert np.array_equal(post, np.array([1.0, 2.5]))

    # unchanged list rows must cancel
    same = pd.DataFrame(
        {
            "k": [1, 1],
            "v": [np.array([1.0, 2.0]), np.array([1.0, 2.0])],
            "_side": [0, 1],
            "_pk": [0, 0],
        }
    )
    assert len(_diff_partition(["k"])(same)) == 0

    # duplicate-key surplus pairing over list payloads
    dup = pd.DataFrame(
        {
            "k": [1, 1, 1, 1, 1],
            "v": [np.array([x]) for x in (1.0, 2.0, 1.0, 2.0, 9.0)],
            "_side": [0, 0, 1, 1, 1],
            "_pk": [0] * 5,
        }
    )
    out3 = _diff_partition(["k"])(dup)
    assert list(out3["_change_type"]) == ["insert"]
    assert np.array_equal(out3["v"].iloc[0], np.array([9.0]))


def test_commits_span_across_schema_evolution(ray_session, table_root):
    """A commits/auto span crossing a schema-evolution commit must conform
    every per-commit feed to the SPAN END's schema — pre-evolution events
    surface NULL in evolved columns instead of a heterogeneous union
    (round-4 review)."""
    tx = build_transcripts(n_convs=10)
    ingest_dataset(
        rd.from_arrow(tx), table_root, job_id="se-base",
        summary={"keys_unique": True, "key_cols": ["conv_id", "turn_idx"]},
    )
    log = TableLog(table_root)
    v0 = log.current_version()

    pre = build_transcripts(seed=3, n_convs=4)
    pre = pre.set_column(
        0, "conv_id", pc.utf8_replace_slice(pre["conv_id"], 0, 4, "convP")
    )
    ingest_dataset(rd.from_arrow(pre), table_root, job_id="se-pre", validate=False)

    ext = build_transcripts(seed=7, n_convs=4)
    ext = ext.set_column(
        0, "conv_id", pc.utf8_replace_slice(ext["conv_id"], 0, 4, "convX")
    )
    ext = ext.append_column(
        "score", pa.array([1.5] * ext.num_rows, pa.float64())
    )
    ingest_dataset(
        rd.from_arrow(ext), table_root, job_id="se-ext",
        validate=False, merge_schema=True,
    )

    # commits granularity: union of per-commit feeds at a single schema
    feed = change_feed(
        table_root, from_version=v0, granularity="commits"
    ).to_pandas()
    assert "score" in feed.columns
    old_rows = feed[feed["conv_id"].str.startswith("convP")]
    new_rows = feed[feed["conv_id"].str.startswith("convX")]
    assert len(old_rows) == pre.num_rows and old_rows["score"].isna().all()
    assert len(new_rows) == ext.num_rows and (new_rows["score"] == 1.5).all()

    # auto granularity: the net fold consumes the same conformed union
    net = change_feed(
        table_root, from_version=v0, granularity="auto"
    ).to_pandas()
    assert set(net["_change_type"]) == {"insert"}
    assert len(net) == pre.num_rows + ext.num_rows
    assert net.loc[
        net["conv_id"].str.startswith("convP"), "score"
    ].isna().all()


def test_change_stream_checkpoint_durable_write(ray_session, table_root, tmp_path):
    """The stream cursor uses the txlog staged-fsync-rename protocol —
    no fixed '.tmp' sibling is ever left behind (round-4 review)."""
    import os

    from open_finance_lakehouse_ray.pipelines.cdf import ChangeStream

    tx = build_transcripts(n_convs=5)
    ingest_dataset(
        rd.from_arrow(tx), table_root, job_id="dw-base",
        summary={"key_cols": ["conv_id", "turn_idx"]},
    )
    ckpt = str(tmp_path / "cursor.json")
    cs = ChangeStream(table_root, ckpt)
    v = TableLog(table_root).current_version()
    cs.commit(v)
    assert cs.last_version == v
    assert not os.path.exists(ckpt + ".tmp")
    assert not [p for p in os.listdir(tmp_path) if p.startswith("tmp-")]


def test_restore_serializes_concurrent_commit(ray_session, table_root, monkeypatch):
    """A commit landing between restore's head read and its CAS must be
    serialized BEFORE the restore, not survive beside the resurrected
    files — the restored live set equals the target's exactly (round-4
    review: a concurrent compaction's rewrite coexisting with the
    restored originals would duplicate every row it rewrote)."""
    from open_finance_lakehouse_ray.pipelines import restore as restore_mod
    from open_finance_lakehouse_ray.pipelines.restore import restore

    ingest_dataset(
        rd.from_arrow(build_transcripts(n_convs=6)), table_root,
        job_id="rc-base", summary={"key_cols": ["conv_id", "turn_idx"]},
    )
    log = TableLog(table_root)
    v1 = log.current_version()
    target_paths = set(log.file_paths(v1))
    delete_where(
        table_root, job_id="rc-del",
        conv_id_range=tuple(log.files()[0].stats["conv_id"]),
    )

    real_commit = restore_mod.commit_via_actor_or_direct

    def racing_commit(log_arg, **kw):
        # a concurrent append lands AFTER restore read the head but
        # BEFORE its commit attempt
        extra = build_transcripts(seed=9, n_convs=2)
        extra = extra.set_column(
            0, "conv_id",
            pc.utf8_replace_slice(extra["conv_id"], 0, 4, "convR"),
        )
        e = write_table_file(table_root, extra, presorted=True)
        log_arg.commit(
            operation="ingest", job_id="rc-race", added=[e],
            base_version=log_arg.current_version(),
        )
        return real_commit(log_arg, **kw)

    monkeypatch.setattr(
        restore_mod, "commit_via_actor_or_direct", racing_commit
    )
    restore(table_root, to_version=v1, job_id="rc-undo")
    assert set(TableLog(table_root).file_paths()) == target_paths
