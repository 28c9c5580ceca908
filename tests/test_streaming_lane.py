"""Streaming lane tests: checkpoint resume, idempotent replay, late-drop
accounting, dead-letter split, exact reconciliation — the behaviors the
reference measures in docs/STREAMING.md:236-300,546-570."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from open_finance_lakehouse_ray.pipelines.streaming import StreamProcessor
from open_finance_lakehouse_ray.state.txlog import TableLog

MIN = 60_000_000
BASE = 1_700_000_000_000_000


def make_events(
    ids, minutes, etype="click", value=1.0, nulls=False
) -> pa.Table:
    n = len(ids)
    return pa.table(
        {
            "event_id": pa.array(ids, pa.int64()),
            "ts": pa.array(
                [BASE + int(m * MIN) for m in minutes], pa.timestamp("us")
            ),
            "user_id": pa.array([7] * n, pa.int64()),
            "event_type": pa.array([etype] * n),
            "value": pa.array(
                [None if nulls and i % 2 == 0 else value + i for i in range(n)],
                pa.float64(),
            ),
            "props": pa.array(["{}"] * n),
        }
    )


@pytest.fixture(params=["single", "distributed"])
def lane(tmp_path, request, ray_session):
    """The WHOLE behavior matrix runs against BOTH execution paths: the
    single-process semantics mirror and the Ray-Data distributed default."""
    src = tmp_path / "src"
    src.mkdir()

    def write(name: str, table: pa.Table):
        pq.write_table(table, src / name)

    proc = StreamProcessor(
        str(src),
        str(tmp_path / "bronze"),
        str(tmp_path / "silver"),
        str(tmp_path / "ckpt"),
        window_us=MIN,
        delay_us=2 * MIN,
        max_files_per_trigger=1,
        distributed=(request.param == "distributed"),
    )
    return src, write, proc, tmp_path


def silver_bars(tmp_path) -> pd.DataFrame:
    log = TableLog(str(tmp_path / "silver"))
    if log.current_version() is None:
        return pd.DataFrame()
    return pa.concat_tables(
        [pq.read_table(p) for p in log.file_paths()]
    ).to_pandas()


def test_windows_finalize_once_watermark_passes(lane):
    src, write, proc, tmp = lane
    write("a.parquet", make_events([1, 2], [0.1, 0.5]))  # window 0
    write("b.parquet", make_events([3], [5.0]))  # pushes max event to minute 5
    write("c.parquet", make_events([4], [6.0]))  # watermark -> 5-2=3 > end(0)
    proc.run_available_now()
    bars = silver_bars(tmp)
    assert len(bars) == 1  # only window 0 finalized (1 and 5 still open)
    row = bars.iloc[0]
    assert row["n_events"] == 2
    assert row["open"] == 1.0 and row["close"] == 2.0
    m = proc.ckpt.load()["metrics"]
    assert m["bars_emitted"] == 1 and m["dropped_late"] == 0


def test_late_rows_dropped_and_counted_on_watermark_survives(lane):
    src, write, proc, tmp = lane
    write("a.parquet", make_events([1], [10.0]))  # max=10
    write("b.parquet", make_events([2], [10.5]))
    # batch c sees the watermark established THROUGH batch b (one-batch
    # lag): 10.5 - 2 = 8.5. Strictly-before (7.0) drops; ON it survives.
    write("c.parquet", make_events([3, 4], [7.0, 8.5]))
    proc.run_available_now()
    m = proc.ckpt.load()["metrics"]
    assert m["dropped_late"] == 1
    assert m["rows_valid"] == 4


def test_exact_dedup_before_aggregate(lane):
    src, write, proc, tmp = lane
    write("a.parquet", make_events([1, 1], [0.1, 0.2]))  # same event_key twice
    write("b.parquet", make_events([1], [0.3]))  # and again in a later batch
    write("c.parquet", make_events([9], [9.0]))
    write("d.parquet", make_events([10], [9.5]))
    proc.run_available_now()
    m = proc.ckpt.load()["metrics"]
    assert m["dropped_dup"] == 2
    bars = silver_bars(tmp)
    w0_start = (BASE + int(0.1 * MIN)) // MIN * MIN  # epoch-floored window
    w0 = bars[bars["window_start"] == pd.Timestamp(w0_start, unit="us")]
    assert len(w0) == 1 and w0.iloc[0]["n_events"] == 1  # a sum is not idempotent


def test_dead_letter_split(lane):
    src, write, proc, tmp = lane
    write("a.parquet", make_events([1, 2, 3, 4], [0.1, 0.2, 0.3, 0.4], nulls=True))
    proc.run_available_now()
    dead = TableLog(str(tmp / "bronze" / "_dead_letter"))
    assert dead.current_version() is not None
    t = pa.concat_tables([pq.read_table(p) for p in dead.file_paths()])
    assert t.num_rows == 2
    assert set(t["_reason"].to_pylist()) == {"missing_required_fields:value_or_ts"}
    m = proc.ckpt.load()["metrics"]
    assert m["rows_in"] == 4 and m["rows_valid"] == 2


def test_checkpoint_resume_and_idempotent_replay(lane, tmp_path):
    src, write, proc, tmp = lane
    for i in range(6):
        write(f"f{i}.parquet", make_events([i], [float(i)]))
    proc.run_available_now()
    state1 = proc.ckpt.load()
    bronze_v1 = TableLog(str(tmp / "bronze")).current_version()
    bars1 = silver_bars(tmp)

    # drain again with nothing new: a fresh processor must no-op entirely
    proc2 = StreamProcessor(
        str(src), str(tmp / "bronze"), str(tmp / "silver"), str(tmp / "ckpt"),
        window_us=MIN, delay_us=2 * MIN, max_files_per_trigger=1,
        distributed=proc.distributed,
    )
    proc2.run_available_now()
    assert TableLog(str(tmp / "bronze")).current_version() == bronze_v1
    assert proc2.ckpt.load()["batch_id"] == state1["batch_id"]
    pd.testing.assert_frame_equal(silver_bars(tmp), bars1)

    # new file arrives: resume processes exactly the new one
    write("g9.parquet", make_events([99], [9.0]))
    proc2.run_available_now()
    assert proc2.ckpt.load()["batch_id"] == state1["batch_id"] + 1


def test_replayed_batch_is_log_level_noop(lane):
    """Simulate 'append done, checkpoint lost': replaying the batch with
    the same batch id must not double-append (txn guard)."""
    src, write, proc, tmp = lane
    write("a.parquet", make_events([1], [0.1]))
    proc.run_available_now()
    state = proc.ckpt.load()
    bronze = TableLog(str(tmp / "bronze"))
    v = bronze.current_version()
    rows_before = sum(e.rows for e in bronze.files())
    # roll the checkpoint back one batch (as if the save was lost)
    state["batch_id"] -= 1
    state["processed"] = []
    proc.ckpt.save(state)
    proc.run_available_now()
    assert bronze.current_version() == v  # replay appended nothing
    assert sum(e.rows for e in bronze.files()) == rows_before


def test_distributed_lane_matches_single_process(ray_session, tmp_path):
    """distributed=True must produce the identical silver table, metrics
    and checkpoint-visible state as the single-process semantics mirror on
    the same source — only the execution is Ray-Data-distributed."""
    src = tmp_path / "src2"
    src.mkdir()
    tabs = [
        make_events([1, 2, 3], [0.1, 0.5, 1.2]),
        make_events([4, 5, 2], [2.2, 3.4, 0.5]),     # dup id 2 + late-ish
        make_events([6, 7], [5.5, 6.1], etype="view"),
        make_events([8, 9], [8.0, 9.0], nulls=True),  # dead-letter rows
        make_events([10], [12.0]),
    ]
    for i, t in enumerate(tabs):
        pq.write_table(t, src / f"f{i:03d}.parquet")

    results = {}
    for mode, dist in (("single", False), ("dist", True)):
        proc = StreamProcessor(
            str(src),
            str(tmp_path / f"bronze-{mode}"),
            str(tmp_path / f"silver-{mode}"),
            str(tmp_path / f"ckpt-{mode}"),
            window_us=MIN,
            delay_us=2 * MIN,
            max_files_per_trigger=1,
            distributed=dist,
        )
        metrics = proc.run_available_now()
        log = TableLog(str(tmp_path / f"silver-{mode}"))
        bars = (
            pa.concat_tables([pq.read_table(p) for p in log.file_paths()])
            .to_pandas()
            .sort_values(["event_type", "window_start"])
            .reset_index(drop=True)
            if log.current_version() is not None
            else pd.DataFrame()
        )
        state = proc.ckpt.load()
        results[mode] = (metrics, bars, state["seen_keys"],
                         state["open_windows"], state["max_event_us"])

    m1, b1, k1, w1, wm1 = results["single"]
    m2, b2, k2, w2, wm2 = results["dist"]
    assert m1 == m2
    pd.testing.assert_frame_equal(b1, b2)
    assert k1 == k2
    assert w1 == w2
    assert wm1 == wm2


def test_dead_letter_replay_reconciles(ray_session, tmp_path):
    """reject -> fix -> replay: fixed rows land in bronze through the same
    validity gate, unfixable rows stay dead-lettered with their reason,
    accounting reconciles exactly, and a replay re-run no-ops."""
    import pyarrow.compute as pc

    from open_finance_lakehouse_ray.pipelines.streaming import (
        replay_dead_letters,
    )

    src = tmp_path / "src3"
    src.mkdir()
    # 4 rows with null value (dead), 2 of them also null ts (unfixable)
    t = make_events([1, 2, 3, 4, 5, 6], [0.1, 0.5, 1.0, 1.5, 2.0, 2.5],
                    nulls=True)  # ids at even positions get null value
    ts = t["ts"].to_pylist()
    ts[0] = None  # id 1: null value AND null ts -> unfixable by value-fill
    t = t.set_column(1, "ts", pa.array(ts, pa.timestamp("us")))
    pq.write_table(t, src / "a.parquet")

    proc = StreamProcessor(
        str(src), str(tmp_path / "bronze3"), str(tmp_path / "silver3"),
        str(tmp_path / "ckpt3"), window_us=MIN, delay_us=2 * MIN,
    )
    m = proc.run_available_now()
    dead_log = TableLog(str(tmp_path / "bronze3" / "_dead_letter"))
    n_dead = sum(e.rows for e in dead_log.files())
    assert n_dead == 3  # ids 1, 3, 5 (null value); id 1 also null ts
    bronze_rows_before = sum(
        e.rows for e in TableLog(str(tmp_path / "bronze3")).files()
    )

    def fix(batch: pa.Table) -> pa.Table:
        # producer fix: missing values default to 0.0; null ts stays broken
        i = batch.column_names.index("value")
        return batch.set_column(i, "value", pc.fill_null(batch["value"], 0.0))

    rep = replay_dead_letters(
        str(tmp_path / "bronze3"), fix, job_id="replay-1"
    )
    assert rep["reconciled"]
    assert rep["replayed"] == 2 and rep["still_dead"] == 1
    bronze_rows = sum(
        e.rows for e in TableLog(str(tmp_path / "bronze3")).files()
    )
    assert bronze_rows == bronze_rows_before + 2
    # surviving dead row keeps its verbatim reason column
    left = pq.read_table(dead_log.file_paths()[0])
    assert left.num_rows == 1
    assert left["_reason"][0].as_py().startswith("missing_required_fields")

    # idempotent re-run: nothing moves
    rep2 = replay_dead_letters(
        str(tmp_path / "bronze3"), fix, job_id="replay-1"
    )
    assert rep2["replayed"] == 2 and rep2["still_dead"] == 1
    assert sum(
        e.rows for e in TableLog(str(tmp_path / "bronze3")).files()
    ) == bronze_rows


def test_replay_crash_between_halves_preserves_new_dead_rows(
    ray_session, tmp_path, monkeypatch
):
    """Crash after the replay's bronze append but before the dead-letter
    prune, with NEW rows dead-lettered in between: the resumed replay must
    prune only the PINNED version's files — the new dead rows survive for
    the next replay instead of being silently destroyed."""
    import pyarrow.compute as pc

    from open_finance_lakehouse_ray.pipelines.streaming import (
        replay_dead_letters,
    )

    src = tmp_path / "src4"
    src.mkdir()
    t = make_events([1, 2, 3, 4], [0.1, 0.5, 1.0, 1.5], nulls=True)
    pq.write_table(t, src / "a.parquet")
    proc = StreamProcessor(
        str(src), str(tmp_path / "bronze4"), str(tmp_path / "silver4"),
        str(tmp_path / "ckpt4"), window_us=MIN, delay_us=2 * MIN,
    )
    proc.run_available_now()
    dead_log = TableLog(str(tmp_path / "bronze4" / "_dead_letter"))
    assert sum(e.rows for e in dead_log.files()) == 2  # ids 1, 3

    def fix(batch: pa.Table) -> pa.Table:
        i = batch.column_names.index("value")
        return batch.set_column(i, "value", pc.fill_null(batch["value"], 0.0))

    # simulate the crash: the prune commit dies
    orig_commit = TableLog.commit

    def boom(self, **kw):
        if kw.get("job_id", "").endswith("/prune"):
            raise RuntimeError("simulated crash before prune")
        return orig_commit(self, **kw)

    monkeypatch.setattr(TableLog, "commit", boom)
    with pytest.raises(RuntimeError, match="simulated crash"):
        replay_dead_letters(str(tmp_path / "bronze4"), fix, job_id="rp")
    monkeypatch.setattr(TableLog, "commit", orig_commit)

    # new fixable rows dead-letter AFTER the half-applied replay
    pq.write_table(make_events([11, 12], [2.0, 2.5], nulls=True),
                   src / "b.parquet")
    proc.run_available_now()  # id 11 dead-letters

    rep = replay_dead_letters(str(tmp_path / "bronze4"), fix, job_id="rp")
    assert rep["reconciled"] and rep["replayed"] == 2 and rep["dead_before"] == 2
    # the post-crash dead row (id 11) SURVIVED the resumed prune
    left = pa.concat_tables([pq.read_table(p) for p in dead_log.file_paths()])
    assert sorted(left["event_id"].to_pylist()) == [11]
    # ...and a second replay under a new job id picks it up
    rep2 = replay_dead_letters(str(tmp_path / "bronze4"), fix, job_id="rp2")
    assert rep2["reconciled"] and rep2["replayed"] == 1


def test_distributed_replayed_batch_metrics_match_clean_run(
    ray_session, tmp_path
):
    """Crash-replay of a micro-batch containing dead rows (commits landed,
    checkpoint lost) must re-derive the SAME metrics as an uninterrupted
    run — the old fallback counted dead rows as valid on replay."""
    srcs = {}
    for mode in ("clean", "replay"):
        src = tmp_path / f"src5-{mode}"
        src.mkdir()
        pq.write_table(
            make_events([1, 2, 3, 4, 5], [0.1, 0.2, 0.3, 0.4, 0.5], nulls=True),
            src / "a.parquet",
        )
        srcs[mode] = src

    metrics = {}
    for mode, src in srcs.items():
        proc = StreamProcessor(
            str(src), str(tmp_path / f"bz5-{mode}"),
            str(tmp_path / f"sv5-{mode}"), str(tmp_path / f"ck5-{mode}"),
            window_us=MIN, delay_us=2 * MIN, distributed=True,
        )
        proc.run_available_now()
        if mode == "replay":  # lose the checkpoint save, replay the batch
            state = proc.ckpt.load()
            state["batch_id"] = 0
            state["processed"] = []
            state["metrics"] = {k: 0 for k in state["metrics"]}
            state["seen_keys"] = {}
            state["open_windows"] = {}
            state["max_event_us"] = None
            proc.ckpt.save(state)
            proc.run_available_now()
        metrics[mode] = proc.ckpt.load()["metrics"]
    assert metrics["clean"] == metrics["replay"]


# ---------------------------------------------------------------------------
# sharded checkpoint (round 4): dirty-only rewrites, whole-bucket prune,
# legacy migration, crash consistency
# ---------------------------------------------------------------------------


def _shard_files(ckpt):
    return sorted(os.listdir(ckpt.shard_dir))


def test_sharded_checkpoint_roundtrip_and_dirty_only_rewrites(tmp_path):
    from open_finance_lakehouse_ray.pipelines.streaming import StreamCheckpoint

    ck = StreamCheckpoint(str(tmp_path / "stream.json"), bucket_us=MIN)
    st = ck.load()
    # two time buckets of keys + one open window
    st["seen_keys"] = {"click:1": BASE, "click:2": BASE + MIN}
    st["open_windows"] = {f"click|{BASE}": {"open": 1.0, "close": 1.0,
                                            "high": 1.0, "low": 1.0,
                                            "volume": 1.0, "n_events": 1,
                                            "_first_key": [BASE, 1],
                                            "_last_key": [BASE, 1]}}
    st["batch_id"] = 1
    ck.save(st)
    files_v1 = _shard_files(ck)
    assert len(files_v1) == 3  # 2 key buckets + 1 window bucket

    # reload from disk: merged dicts identical
    ck2 = StreamCheckpoint(str(tmp_path / "stream.json"), bucket_us=MIN)
    st2 = ck2.load()
    assert st2["seen_keys"] == st["seen_keys"]
    assert st2["open_windows"] == st["open_windows"]

    # insert into ONLY the second bucket: first key bucket + window shard
    # must be referenced unchanged (same filename), not rewritten
    st2["seen_keys"]["click:3"] = BASE + MIN + 1
    st2["batch_id"] = 2
    ck2.save(st2)
    files_v2 = _shard_files(ck2)
    stable = [f for f in files_v1 if f.startswith(("keys-28333333", "windows-"))]
    # the untouched bucket-0 key shard and the window shard survive by name
    untouched = set(files_v1) & set(files_v2)
    assert any(f.startswith("keys-") for f in untouched)
    assert any(f.startswith("windows-") for f in untouched)
    del stable

    # watermark prune: dropping the old bucket's keys deletes its file
    st3 = ck2.load()
    st3["seen_keys"] = {k: t for k, t in st3["seen_keys"].items()
                        if t >= BASE + MIN}
    st3["batch_id"] = 3
    ck2.save(st3)
    files_v3 = _shard_files(ck2)
    assert not any(f.startswith(f"keys-{BASE // MIN}-") for f in files_v3)
    assert StreamCheckpoint(str(tmp_path / "stream.json"),
                            bucket_us=MIN).load()["seen_keys"] == st3["seen_keys"]


def test_sharded_checkpoint_migrates_legacy_single_file(tmp_path):
    import json

    from open_finance_lakehouse_ray.pipelines.streaming import StreamCheckpoint

    legacy = {
        "batch_id": 5, "processed": ["a.parquet"], "max_event_us": BASE,
        "seen_keys": {"click:9": BASE},
        "open_windows": {},
        "metrics": {"rows_in": 1, "rows_valid": 1, "dropped_late": 0,
                    "dropped_dup": 0, "bars_emitted": 0},
    }
    p = tmp_path / "stream.json"
    p.write_text(json.dumps(legacy))
    ck = StreamCheckpoint(str(p), bucket_us=MIN)
    st = ck.load()
    assert st["seen_keys"] == {"click:9": BASE}
    ck.save(st)  # rewrites as sharded core
    core = json.loads(p.read_text())
    assert "seen_keys" not in core and core["key_shards"]
    assert StreamCheckpoint(str(p), bucket_us=MIN).load()["seen_keys"] == {
        "click:9": BASE
    }


def test_sharded_checkpoint_crash_before_core_write_is_consistent(tmp_path):
    """Shard files written but the core not yet replaced == the OLD state:
    a restart must load the old state exactly (orphans are ignored and
    pruned by the next successful save)."""
    from open_finance_lakehouse_ray.pipelines.streaming import StreamCheckpoint

    ck = StreamCheckpoint(str(tmp_path / "stream.json"), bucket_us=MIN)
    st = ck.load()
    st["seen_keys"] = {"click:1": BASE}
    st["batch_id"] = 1
    ck.save(st)

    # simulate the crash: write a NEW shard file but leave the core alone
    orphan = os.path.join(ck.shard_dir, f"keys-{(BASE + MIN) // MIN}-2.json")
    with open(orphan, "w") as f:
        f.write('{"click:999": 1}')

    st2 = StreamCheckpoint(str(tmp_path / "stream.json"), bucket_us=MIN).load()
    assert st2["seen_keys"] == {"click:1": BASE}  # orphan invisible
    st2["batch_id"] = 2
    ck3 = StreamCheckpoint(str(tmp_path / "stream.json"), bucket_us=MIN)
    st3 = ck3.load()
    st3["batch_id"] = 2
    ck3.save(st3)
    assert not os.path.exists(orphan)  # pruned by the successful save


def test_sharded_checkpoint_detects_in_place_mutation(tmp_path):
    """Dirty detection must compare against the PERSISTED payload, not a
    live reference: a bar mutated in place between saves is dirty (round-4
    review: an aliased dict cache compared the mutated state to itself and
    skipped the rewrite)."""
    from open_finance_lakehouse_ray.pipelines.streaming import StreamCheckpoint

    ck = StreamCheckpoint(str(tmp_path / "stream.json"), bucket_us=MIN)
    st = ck.load()
    bar = {"open": 1.0, "close": 1.0, "high": 1.0, "low": 1.0,
           "volume": 1.0, "n_events": 1,
           "_first_key": [BASE, 1], "_last_key": [BASE, 1]}
    st["open_windows"] = {f"click|{BASE}": bar}
    st["batch_id"] = 1
    ck.save(st)
    bar["high"] = 99.0  # in-place mutation of the SAME dict object
    st["batch_id"] = 2
    ck.save(st)
    st2 = StreamCheckpoint(str(tmp_path / "stream.json"), bucket_us=MIN).load()
    assert st2["open_windows"][f"click|{BASE}"]["high"] == 99.0


def test_two_checkpoints_share_a_directory_without_pruning_each_other(tmp_path):
    """One checkpoint per query in ONE directory (bronze.json +
    silver.json): a save on one must never delete the other's live shards
    (round-4 review: the prune swept every unreferenced .json in a shared
    shards/ dir)."""
    from open_finance_lakehouse_ray.pipelines.streaming import StreamCheckpoint

    a = StreamCheckpoint(str(tmp_path / "bronze.json"), bucket_us=MIN)
    b = StreamCheckpoint(str(tmp_path / "silver.json"), bucket_us=MIN)
    sa = a.load()
    sa["seen_keys"] = {"click:1": BASE}
    sa["batch_id"] = 1
    a.save(sa)
    sb = b.load()
    sb["seen_keys"] = {"view:7": BASE}
    sb["batch_id"] = 1
    b.save(sb)
    # a second save on A prunes only A's namespace
    sa2 = a.load()
    sa2["seen_keys"]["click:2"] = BASE + 1
    sa2["batch_id"] = 2
    a.save(sa2)
    assert StreamCheckpoint(str(tmp_path / "silver.json"),
                            bucket_us=MIN).load()["seen_keys"] == {"view:7": BASE}


def test_checkpoint_incremental_mirror_equivalence(tmp_path):
    """The processor lane (record_inserts + prune_keys) must persist
    byte-identical state to the external scan lane, with bucket-wise prune
    semantics identical to the flat `t >= watermark` comprehension, and
    fall back safely when an external mutation desyncs the mirror
    (round-4 review: mirror makes save+prune O(batch))."""
    from open_finance_lakehouse_ray.pipelines.streaming import StreamCheckpoint

    def run(lane: str) -> dict:
        ck = StreamCheckpoint(str(tmp_path / f"{lane}.json"), bucket_us=MIN)
        st = ck.load()
        for step in range(5):
            t0 = BASE + step * MIN
            pairs = [(f"k:{step}:{i}", t0 + i) for i in range(100)]
            wm = BASE + max(0, step - 1) * MIN + 30  # mid-bucket boundary
            if lane == "mirror":
                st["seen_keys"].update(pairs)
                ck.record_inserts(pairs)
                ck.prune_keys(st, wm)
            else:
                for k, t in pairs:
                    st["seen_keys"][k] = t
                st["seen_keys"] = {k: t for k, t in st["seen_keys"].items()
                                   if t >= wm}
            st["batch_id"] += 1
            ck.save(st)
        return StreamCheckpoint(str(tmp_path / f"{lane}.json"),
                                bucket_us=MIN).load()

    mirror, scan = run("mirror"), run("scan")
    assert mirror["seen_keys"] == scan["seen_keys"]
    assert len(mirror["seen_keys"]) > 0

    # desync fallback: external rebind of seen_keys after record_inserts —
    # prune_keys must fall back to the flat comprehension and the next
    # save must still persist the truth (scan path)
    ck = StreamCheckpoint(str(tmp_path / "desync.json"), bucket_us=MIN)
    st = ck.load()
    ck.record_inserts([("a", BASE)])
    st["seen_keys"] = {"a": BASE, "b": BASE + MIN}  # external rebind
    ck.prune_keys(st, BASE + 1)  # mirror len (1) != flat len (2) -> fallback
    assert st["seen_keys"] == {"b": BASE + MIN}
    st["batch_id"] += 1
    ck.save(st)
    assert StreamCheckpoint(str(tmp_path / "desync.json"),
                            bucket_us=MIN).load()["seen_keys"] == {
        "b": BASE + MIN}


def test_checkpoint_fallback_voids_mirror_and_keeps_dirty(tmp_path):
    """A save that detects an outside mutation must (a) persist the truth
    via the scan path and (b) permanently void the mirror — a later
    coincidental size match must never resurrect stale shard references
    (round-4 review)."""
    from open_finance_lakehouse_ray.pipelines.streaming import StreamCheckpoint

    ck = StreamCheckpoint(str(tmp_path / "s.json"), bucket_us=MIN)
    st = ck.load()
    st["seen_keys"]["a"] = BASE
    ck.record_inserts([("a", BASE)])
    st["batch_id"] += 1
    ck.save(st)

    # outside mutation: add one key directly, then remove another — the
    # FIRST save sees a size mismatch and must void the mirror
    st["seen_keys"]["b"] = BASE + 1
    st["batch_id"] += 1
    ck.save(st)  # fallback save (scan)
    assert ck._kbuckets is None and not ck._incremental
    # size returns to the mirror's last-known sum — without the voiding,
    # a stale-mirror save would reference the pre-'c' shard
    del st["seen_keys"]["b"]
    st["seen_keys"]["c"] = BASE + 2
    st["batch_id"] += 1
    ck.save(st)
    reloaded = StreamCheckpoint(str(tmp_path / "s.json"), bucket_us=MIN).load()
    assert reloaded["seen_keys"] == {"a": BASE, "c": BASE + 2}


def test_checkpoint_reopen_with_different_bucket_unit(tmp_path):
    """Reopening a checkpoint with a different bucket_us must not mix
    shard-bucket units (round-4 review finding: prune under the new unit
    against mirror entries keyed under the old unit wholesale-dropped
    retained keys — or never pruned them)."""
    import json

    from open_finance_lakehouse_ray.pipelines.streaming import StreamCheckpoint

    ck = StreamCheckpoint(str(tmp_path / "s.json"), bucket_us=5 * MIN)
    st = ck.load()
    st["seen_keys"] = {"a": BASE, "b": BASE + MIN, "c": BASE + 10 * MIN}
    st["batch_id"] = 1
    ck.save(st)

    # reopen at the default 1-minute unit (e.g. the window shrank)
    ck2 = StreamCheckpoint(str(tmp_path / "s.json"), bucket_us=MIN)
    st2 = ck2.load()
    assert st2["seen_keys"] == st["seen_keys"]
    # prune at a watermark that retains b and c: under the old mixed-unit
    # bug EVERY bucket id (computed at 5-min granularity) sat below the
    # 1-min watermark bucket and the whole state was evicted
    ck2.prune_keys(st2, BASE + MIN)
    assert st2["seen_keys"] == {"b": BASE + MIN, "c": BASE + 10 * MIN}
    st2["batch_id"] = 2
    ck2.save(st2)
    core = json.loads((tmp_path / "s.json").read_text())
    assert core["bucket_us"] == MIN  # rewritten under the current unit
    st3 = StreamCheckpoint(str(tmp_path / "s.json"), bucket_us=MIN).load()
    assert st3["seen_keys"] == {"b": BASE + MIN, "c": BASE + 10 * MIN}


def test_checkpoint_same_batch_resave_never_overwrites_referenced_shard(
    tmp_path,
):
    """Two save() calls with the SAME batch_id and a changed payload must
    write the dirty shard to a fresh file (round-4 review finding: the
    (kind, bucket, batch) name collided, so the second save overwrote a
    file the committed core still referenced — a crash between the shard
    replace and the core replace broke crash consistency)."""
    import json

    from open_finance_lakehouse_ray.pipelines.streaming import StreamCheckpoint

    ck = StreamCheckpoint(str(tmp_path / "s.json"), bucket_us=MIN)
    st = ck.load()
    st["seen_keys"] = {"a": BASE}
    st["batch_id"] = 1
    ck.save(st)
    core1 = json.loads((tmp_path / "s.json").read_text())
    (bucket, fname1), = core1["key_shards"].items()
    payload1 = json.loads((tmp_path / "s.shards" / fname1).read_text())

    # same batch_id, mutated bucket payload (public-API caller pattern)
    st["seen_keys"]["b"] = BASE + 1
    ck.save(st)
    core2 = json.loads((tmp_path / "s.json").read_text())
    fname2 = core2["key_shards"][bucket]
    assert fname2 != fname1  # fresh file, not an in-place overwrite
    # had the first core survived a crash mid-save, its shard content is
    # exactly what it referenced at commit time
    assert payload1 == {"a": BASE}
    assert core2["save_seq"] > core1["save_seq"]

    # a NEW instance that saves WITHOUT a prior load() must also not reuse
    # names: the counter seeds lazily from the existing core on first save
    # (no load() call here — that would re-seed it and mask a regression)
    ck3 = StreamCheckpoint(str(tmp_path / "s.json"), bucket_us=MIN)
    st3 = dict(st)
    st3["seen_keys"] = {"a": BASE, "b": BASE + 1, "c": BASE + 2}
    ck3.save(st3)
    core3 = json.loads((tmp_path / "s.json").read_text())
    assert core3["save_seq"] > core2["save_seq"]
    assert core3["key_shards"][bucket] not in (fname1, fname2)
    # and a corrupt/foreign core must degrade to seq 0, not crash the save
    (tmp_path / "x.json").write_text("null")
    ck4 = StreamCheckpoint(str(tmp_path / "x.json"), bucket_us=MIN)
    st4 = ck4._empty_state()
    st4["seen_keys"] = {"z": BASE}
    ck4.save(st4)
    assert json.loads((tmp_path / "x.json").read_text())["save_seq"] == 1


def test_checkpoint_lazy_seed_propagates_io_errors(tmp_path):
    """The lazy save-seq seed degrades to 0 only for a MISSING or
    unparseable core; a genuine I/O error on the core path must propagate
    (review finding: swallowing it resets the counter and can overwrite a
    shard the committed core references)."""
    from open_finance_lakehouse_ray.pipelines.streaming import StreamCheckpoint

    # IsADirectoryError (an OSError) stands in for the transient-EIO class
    bad = tmp_path / "core.json"
    bad.mkdir()
    ck = StreamCheckpoint(str(bad), bucket_us=MIN)
    st = ck._empty_state()
    st["seen_keys"] = {"a": BASE}
    with pytest.raises(OSError):
        ck.save(st)

    # foreign save_seq values degrade, never crash
    assert StreamCheckpoint._core_save_seq({"save_seq": "x"}) == 0
    assert StreamCheckpoint._core_save_seq(None) == 0
    assert StreamCheckpoint._core_save_seq({"save_seq": 7}) == 7
    assert StreamCheckpoint._core_save_seq({}) == 0


def test_core_save_seq_floors_at_referenced_shard_names():
    """A core whose save_seq field is absent or garbage but whose shard
    references are intact must seed the counter at the largest integer
    embedded in those names — never 0, which could overwrite a referenced
    file (review finding)."""
    from open_finance_lakehouse_ray.pipelines.streaming import StreamCheckpoint

    core = {
        "key_shards": {"5": "keys-5-7.json", "6": "keys-6-3.json"},
        "window_shards": {"5": "windows-5-9.json"},
    }
    assert StreamCheckpoint._core_save_seq(core) == 9
    core["save_seq"] = "x"  # garbage field, usable references
    assert StreamCheckpoint._core_save_seq(core) == 9
    core["save_seq"] = 12  # a valid field above the floor wins
    assert StreamCheckpoint._core_save_seq(core) == 12
    # a valid-but-STALE field (externally reset) must not bypass the
    # floor — seq must never fall below a referenced name (review
    # finding: 'valid field wins' re-armed the overwrite hazard)
    core["save_seq"] = 2
    assert StreamCheckpoint._core_save_seq(core) == 9
    # one malformed manifest must not discard the floor accumulated
    # from the other (review finding: wholesale `return 0`)
    assert StreamCheckpoint._core_save_seq(
        {"save_seq": "x", "key_shards": {"5": "keys-5-7.json"},
         "window_shards": ["not", "a", "dict"]}
    ) == 7
    # isdigit()-but-not-int()-parseable tails (superscripts) are skipped,
    # not crashed on, and don't mask valid tails elsewhere
    assert StreamCheckpoint._core_save_seq(
        {"key_shards": {"5": "keys-5-².json", "6": "keys-6-4.json"}}
    ) == 4
    # no references at all -> 0
    assert StreamCheckpoint._core_save_seq({"save_seq": None}) == 0
    assert StreamCheckpoint._core_save_seq(None) == 0
    assert StreamCheckpoint._core_save_seq(["not", "a", "dict"]) == 0


def test_checkpoint_property_random_op_interleavings():
    """Property test (hypothesis): ANY interleaving of batch inserts
    (mirror-lane or external-dict), watermark prunes, saves, and reopens
    with a changed bucket unit must (a) persist exactly the flat-dict
    model state and (b) never mutate a shard file the previously
    committed core references — the crash-consistency invariant the
    monotone save counter exists for. The scenario tests above pin the
    individual behaviors; this covers their interleavings."""
    import json
    import shutil
    import tempfile

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from open_finance_lakehouse_ray.pipelines.streaming import StreamCheckpoint

    op = st.one_of(
        st.tuples(
            st.just("insert"),
            st.lists(st.integers(min_value=0, max_value=600), min_size=1,
                     max_size=20),
            st.booleans(),  # True = mirror lane (record_inserts)
        ),
        st.tuples(st.just("prune"),
                  st.integers(min_value=0, max_value=700)),
        st.tuples(st.just("save")),
        st.tuples(st.just("reopen"),
                  st.sampled_from([7, 13, 60])),  # bucket_us (scaled)
    )

    @settings(
        max_examples=40,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(ops=st.lists(op, min_size=1, max_size=30))
    def run(ops):
        tmp = tempfile.mkdtemp(prefix="ckprop-")
        try:
            path = os.path.join(tmp, "s.json")
            ck = StreamCheckpoint(path, bucket_us=13)
            state = ck.load()
            model: dict[str, int] = {}
            next_key = 0

            def referenced() -> dict[str, bytes]:
                try:
                    with open(path) as f:
                        core = json.load(f)
                except FileNotFoundError:
                    return {}
                out = {}
                for man in ("key_shards", "window_shards"):
                    for fname in core.get(man, {}).values():
                        p = os.path.join(ck.shard_dir, fname)
                        with open(p, "rb") as f:
                            out[fname] = f.read()
                return out

            for step in ops:
                if step[0] == "insert":
                    _, ts_list, mirror = step
                    pairs = []
                    for t in ts_list:
                        k = f"k{next_key}"
                        next_key += 1
                        pairs.append((k, t))
                        model[k] = t
                    state["seen_keys"].update(pairs)
                    if mirror:
                        ck.record_inserts(pairs)
                elif step[0] == "prune":
                    wm = step[1]
                    ck.prune_keys(state, wm)
                    model = {k: t for k, t in model.items() if t >= wm}
                    assert state["seen_keys"] == model
                elif step[0] == "save":
                    before = referenced()
                    state["batch_id"] += 1
                    ck.save(state)
                    # no save may MUTATE a file the prior core referenced
                    # (deleting after the new core lands is fine)
                    for fname, payload in before.items():
                        p = os.path.join(ck.shard_dir, fname)
                        if os.path.exists(p):
                            with open(p, "rb") as f:
                                assert f.read() == payload, fname
                elif step[0] == "reopen":
                    ck = StreamCheckpoint(path, bucket_us=step[1])
                    state = ck.load()
                    # disk holds the state as of the LAST save; the model
                    # tracks unsaved mutations too, so only check when the
                    # previous ops ended in a save — instead, simplest
                    # sound check: reload must equal what a plain
                    # fresh-reader sees (same class, same unit)
                    again = StreamCheckpoint(path, bucket_us=step[1]).load()
                    assert state["seen_keys"] == again["seen_keys"]
                    model = dict(state["seen_keys"])
                    next_key += 0

            # final: a fresh save + reload matches the model exactly
            state["batch_id"] += 1
            ck.save(state)
            final = StreamCheckpoint(path, bucket_us=ck.bucket_us).load()
            assert final["seen_keys"] == model
        finally:
            shutil.rmtree(tmp, ignore_errors=True)

    run()


def test_processed_set_stays_bounded():
    """The checkpoint core must not grow O(all files ever seen): older
    processed names compress into processed_floor, and _pending_files
    treats names at/below the floor as done (round-4 review)."""
    from open_finance_lakehouse_ray.pipelines.streaming import (
        PROCESSED_TRACKED_MAX,
        StreamCheckpoint,
        _record_processed,
    )

    state = StreamCheckpoint._empty_state()
    total = PROCESSED_TRACKED_MAX + 500
    for i in range(0, total, 100):
        _record_processed(
            state, [f"f-{j:08d}.parquet" for j in range(i, i + 100)]
        )
    assert len(state["processed"]) <= PROCESSED_TRACKED_MAX
    floor = state["processed_floor"]
    assert floor is not None
    # every name is accounted for: at/below the floor or tracked
    tracked = set(state["processed"])
    for j in range(total):
        n = f"f-{j:08d}.parquet"
        assert n <= floor or n in tracked
    # the newest names are the tracked ones
    assert f"f-{total - 1:08d}.parquet" in tracked
    # floor never regresses (it may advance: the new name re-overflows)
    _record_processed(state, ["zzz-late.parquet"])
    assert state["processed_floor"] >= floor
    assert len(state["processed"]) <= PROCESSED_TRACKED_MAX

def test_below_floor_arrival_surfaces_metric(tmp_path, monkeypatch):
    """Once the tracked processed set compresses into processed_floor, a
    file landing AT OR BELOW the floor is (by the name-order contract)
    never processed — that breach must surface as a metric/warning, not
    as quietly missing rows (round-5 advice, streaming.py)."""
    import open_finance_lakehouse_ray.pipelines.streaming as st

    monkeypatch.setattr(st, "PROCESSED_TRACKED_MAX", 4)
    src = tmp_path / "src"
    src.mkdir()
    proc = StreamProcessor(
        str(src), str(tmp_path / "bronze"), str(tmp_path / "silver"),
        str(tmp_path / "ckpt"), window_us=MIN, delay_us=2 * MIN,
        max_files_per_trigger=1,
    )
    state = st.StreamCheckpoint._empty_state()
    for i in range(8):
        name = f"f-{i:04d}.parquet"
        (src / name).write_bytes(b"")
        st._record_processed(state, [name])
    floor = state["processed_floor"]
    assert floor is not None
    # first listing establishes the per-floor baseline: no false positive
    # from the already-processed below-floor files still on disk
    assert proc._pending_files(state) == []
    assert state["metrics"].get("skipped_below_floor", 0) == 0
    # a producer breaks the contract: a NEW name at/below the floor
    late = "f-0001-late.parquet"
    assert late <= floor
    (src / late).write_bytes(b"")
    pending = proc._pending_files(state)
    assert late not in pending  # still skipped (the documented semantics)
    assert state["metrics"]["skipped_below_floor"] == 1
    # re-listing without new arrivals does not double-count
    proc._pending_files(state)
    assert state["metrics"]["skipped_below_floor"] == 1
    # the baseline SURVIVES a checkpoint save/load round-trip — most real
    # breaches land BETWEEN drains, and a re-baselined mark would absorb
    # the late file silently (round-5 review)
    proc.ckpt.save(state)
    state2 = proc.ckpt.load()
    assert state2["below_floor_mark"] == state["below_floor_mark"]
    late2 = "f-0002-late.parquet"
    assert late2 <= floor
    (src / late2).write_bytes(b"")
    assert late2 not in proc._pending_files(state2)
    assert state2["metrics"]["skipped_below_floor"] == 2
