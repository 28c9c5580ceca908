"""Micro-batch streaming lane: checkpointed, exactly-once, event-time
windowed aggregation — the reference's streaming architecture
(``/root/reference/ofl/streaming/bronze.py:197-292`` +
``silver.py:143-262``) re-expressed as Ray-Data micro-batches.

Semantics preserved (SURVEY.md §2.9):

- **Source**: a watched directory of files, processed in name order, at
  most ``max_files_per_trigger`` per micro-batch (backpressure,
  ``ofl/config.py:55-58``); ``run_available_now`` drains then exits
  (``Trigger.AvailableNow``, ``bronze.py:88-106``).
- **Bronze**: parse + validity tagging; bad rows go to a dead-letter
  table verbatim with a reason, replayable (``bronze.py:171-182``);
  appends are idempotent — the batch id is the txn version
  (``txnAppId``/``txnVersion``, ``bronze.py:185-194``): a replayed batch
  commits as a no-op.
- **Silver**: watermark (max event time − delay, one-batch lag) →
  exact dedup on ``event_key`` with state bounded by the watermark
  ("a sum is not idempotent" — dedup BEFORE aggregation,
  ``silver.py:103-105``) → tumbling event-time windows; a window is
  appended once the watermark passes its end; late rows are dropped
  silently but COUNTED (``dropped_late``, ``silver.py:265-291``).
- **Checkpoint**: offsets (processed files) claimed before work, state
  persisted after each batch; restart resumes at the next batch id
  (``docs/STREAMING.md:120-141``). One checkpoint per query — bronze and
  silver each own theirs (``paths.py:33-37``).
"""

from __future__ import annotations

import json
import logging
import os
from typing import Any

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from open_finance_lakehouse_ray.functions.windows import WatermarkState, window_end
from open_finance_lakehouse_ray.state.txlog import (
    StaleTableError,
    TableLog,
    _atomic_write_json,
)


class StreamCheckpoint:
    """SHARDED checkpoint: a small core JSON (offsets, watermark, metrics,
    shard manifest) plus time-bucketed state shard files.

    Round-3 verdict: persisting ``seen_keys`` + ``open_windows`` as ONE
    JSON per batch is the lane's 100-TB scale-killer — at high key
    cardinality every batch rewrites the whole state.  The analog of the
    reference's per-query checkpoint dirs (``ofl/streaming/paths.py:33-37``)
    is a sharded state store:

    - ``seen_keys`` shard = ``ts_us // bucket_us``; ``open_windows`` shard
      = ``wstart // bucket_us``.  Event-time bucketing (not key hashing)
      means the watermark prune DELETES whole shard files instead of
      rewriting every shard, and in-order arrivals only dirty the most
      recent buckets — checkpoint write I/O stays flat as key cardinality
      grows (see ``tools/checkpoint_scale_bench.py``).
    - Per batch, only shards whose payload changed are rewritten (to a NEW
      ``<kind>-<bucket>-<seq>.json`` name — ``seq`` is a monotone save
      counter persisted in the core, so no save can ever overwrite a file
      an earlier committed core references), then the core manifest is
      atomically replaced; a crash between the two leaves the old core
      pointing at the old files — consistent, and the idempotent appends
      make the batch replay a no-op.  Unreferenced shard files are pruned
      best-effort after the core points away.
    - Retained-key semantics are IDENTICAL to the unsharded checkpoint
      (per-key ``ts >= watermark``): the watermark's own boundary bucket is
      filtered and rewritten; only strictly-older buckets drop wholesale.

    ``load()`` still returns the merged ``seen_keys`` / ``open_windows``
    dicts, so the processor code is layout-agnostic.
    """

    def __init__(self, path: str, *, bucket_us: int = 60_000_000):
        self.path = path
        self.bucket_us = int(bucket_us)
        # shard dir is NAMESPACED by the checkpoint name: two checkpoints
        # sharing one directory ("one checkpoint per query" — bronze.json +
        # silver.json) must never prune each other's live shards
        stem = os.path.splitext(os.path.basename(path))[0]
        self.shard_dir = os.path.join(
            os.path.dirname(path) or ".", f"{stem}.shards"
        )
        os.makedirs(self.shard_dir, exist_ok=True)
        # bucket -> (filename, canonical-JSON payload) of the shards the
        # core references.  The SERIALIZED form is cached (not the dict):
        # load()/save() hand out live references to the same bar dicts the
        # processor mutates, so an object-identity or dict-equality cache
        # would compare the mutated state against itself and skip the
        # rewrite (review finding, round 4).
        self._cache: dict[str, dict[int, tuple[str, str]]] = {
            "keys": {}, "windows": {},
        }
        # incremental per-bucket mirror of seen_keys, maintained by
        # record_inserts / prune_keys: dedup semantics guarantee a seen key
        # is never re-inserted, so bucket membership is stable and the
        # mirror makes save() and the watermark prune O(batch), not
        # O(retained keys) (round-4 review: even with dirty hints, the
        # per-save _bucketize scan kept checkpoint CPU linear in state).
        # None = mirror unavailable; save() then falls back to the scan.
        self._kbuckets: dict[int, dict[str, int]] | None = None
        self._kdirty: set[int] = set()
        self._incremental = False
        # monotone save counter, embedded in shard filenames so a re-save
        # of the same batch_id never overwrites a shard file the on-disk
        # core still references (round-4 review finding: (kind, bucket,
        # batch) alone collides when a public-API caller saves twice
        # without bumping batch_id).  None = not yet seeded; load() seeds
        # it from the core, and a save() WITHOUT a prior load() seeds it
        # lazily — never in the constructor, which would re-parse the
        # whole core (O(retained state) on a legacy single-file layout)
        # just to read one integer that load() parses again anyway.
        self._save_seq: int | None = None

    @staticmethod
    def _core_save_seq(core: Any) -> int:
        """Seed value from a parsed core — shared by load() and the lazy
        save() seed so the two paths can't drift.

        The seed is the MAX of the ``save_seq`` field and the largest
        integer embedded in the referenced shard names
        (``<kind>-<bucket>-<seq>.json``; legacy batch-id-named shards
        embed an integer in the same position).  Flooring at the names
        even when the field parses means a valid-but-stale counter (an
        externally reset field — the adjacent corruption class to the
        garbage-field one) can still never make the next saves reuse a
        referenced name.  Each manifest and each entry is guarded
        independently so one malformed manifest can't discard the floor
        already accumulated from the other (review findings).  Only a
        core with no parseable field and no parseable references
        degrades to 0."""
        seq = 0
        try:
            seq = int(core["save_seq"])
        except (KeyError, IndexError, TypeError, ValueError):
            pass
        for man in ("key_shards", "window_shards"):
            try:
                entries = list((core.get(man) or {}).values())
            except (AttributeError, TypeError):
                continue
            for fname in entries:
                tail = str(fname).rsplit(".", 1)[0].rsplit("-", 1)[-1]
                # isdecimal() is exactly the charset int() accepts —
                # isdigit() also admits super/subscripts int() rejects
                if tail.isdecimal():
                    seq = max(seq, int(tail))
        return seq

    @staticmethod
    def _empty_state() -> dict[str, Any]:
        return {
            "batch_id": 0,
            "processed": [],
            "processed_floor": None,
            "max_event_us": None,
            "seen_keys": {},  # key -> ts_us (pruned below watermark)
            "open_windows": {},  # "key|wstart" -> partial agg
            "metrics": {"rows_in": 0, "rows_valid": 0, "dropped_late": 0,
                        "dropped_dup": 0, "bars_emitted": 0},
        }

    def load(self) -> dict[str, Any]:
        self._cache = {"keys": {}, "windows": {}}
        self._kbuckets, self._kdirty, self._incremental = {}, set(), False
        try:
            with open(self.path) as f:
                core = json.load(f)
        except FileNotFoundError:
            self._save_seq = 0
            return self._empty_state()
        self._save_seq = self._core_save_seq(core)
        if "seen_keys" in core:  # legacy single-file layout: read-through
            self._kbuckets = self._bucketize(core)["keys"]
            return core
        # shard bucket ids on disk were computed under the unit the core
        # records; reopening with a different bucket_us must not mix units
        # (round-4 review finding: prune/save under the new unit against
        # cache/mirror entries keyed under the old unit wholesale-drops or
        # never prunes retained keys).  The merged flat state is
        # unit-agnostic, so on mismatch we leave the shard cache empty and
        # rebucketize the mirror below — the next save() rewrites every
        # shard under the current unit.
        unit_match = int(core.get("bucket_us", self.bucket_us)) == self.bucket_us
        state = {
            "batch_id": core["batch_id"],
            "processed": core["processed"],
            "processed_floor": core.get("processed_floor"),
            "below_floor_mark": core.get("below_floor_mark"),
            "max_event_us": core["max_event_us"],
            "metrics": core["metrics"],
            "seen_keys": {},
            "open_windows": {},
        }
        for kind, target in (("keys", "seen_keys"), ("windows", "open_windows")):
            for b_str, fname in core.get(f"{kind[:-1]}_shards", {}).items():
                with open(os.path.join(self.shard_dir, fname)) as f:
                    payload = json.load(f)
                state[target].update(payload)
                if not unit_match:
                    continue
                self._cache[kind][int(b_str)] = (
                    fname, json.dumps(payload, sort_keys=True),
                )
                if kind == "keys":
                    # the freshly-parsed payload dict seeds the mirror (a
                    # distinct object from state["seen_keys"]; values are
                    # immutable ints, so sharing them is safe)
                    self._kbuckets[int(b_str)] = payload
        if not unit_match:
            self._kbuckets = self._bucketize(state)["keys"]
        return state

    # ------------------------------------------------- incremental mirror

    def record_inserts(self, pairs: "list[tuple[str, int]]") -> None:
        """Mirror this batch's newly-seen dedup keys into the per-bucket
        index. Only NEW keys may be recorded (the processor's dedup drops
        re-occurrences before insert), so a key never changes bucket."""
        if self._kbuckets is None:
            return  # mirror was invalidated: stay on the scan path
        self._incremental = True
        bu = self.bucket_us
        for k, t in pairs:
            b = int(t) // bu
            self._kbuckets.setdefault(b, {})[k] = int(t)
            self._kdirty.add(b)

    def prune_keys(self, state: dict[str, Any], watermark_us: int | None) -> None:
        """Drop ``seen_keys`` entries below the watermark — from the flat
        dict AND the mirror, bucket-wise: whole buckets strictly below the
        boundary drop wholesale (O(pruned), amortized O(inserted)); only
        the boundary bucket is filtered key-by-key. Falls back to the flat
        O(state) comprehension when the mirror is out of sync (an external
        caller mutated seen_keys directly)."""
        if watermark_us is None:
            return
        seen = state["seen_keys"]
        kb = self._kbuckets
        if kb is None or sum(map(len, kb.values())) != len(seen):
            state["seen_keys"] = {
                k: t for k, t in seen.items() if t >= watermark_us
            }
            self._kbuckets = None  # mirror unusable until the next load()
            return
        self._incremental = True
        wb = int(watermark_us) // self.bucket_us
        for b in [b for b in kb if b < wb]:
            for k in kb.pop(b):
                seen.pop(k, None)
            self._kdirty.discard(b)
        boundary = kb.get(wb)
        if boundary is not None:
            drop = [k for k, t in boundary.items() if t < watermark_us]
            if drop:
                for k in drop:
                    del boundary[k]
                    seen.pop(k, None)
                self._kdirty.add(wb)
            if not boundary:
                del kb[wb]
                self._kdirty.discard(wb)

    def _bucketize(self, state: dict[str, Any]) -> dict[str, dict[int, dict]]:
        bucket_us = self.bucket_us
        keys: dict[int, dict] = {}
        for k, t in state["seen_keys"].items():
            keys.setdefault(int(t) // bucket_us, {})[k] = t
        windows: dict[int, dict] = {}
        for key, bar in state["open_windows"].items():
            ws = int(key.rsplit("|", 1)[1])
            windows.setdefault(ws // bucket_us, {})[key] = bar
        return {"keys": keys, "windows": windows}

    def save(
        self,
        state: dict[str, Any],
        *,
        dirty_key_ts: "list[int] | None" = None,
        dirty_window_keys: "list[str] | None" = None,
        watermark_us: int | None = None,
    ) -> None:
        """Persist ``state``; rewrite only dirty shards.

        Three regimes, cheapest first:

        - The processor lane (record_inserts / prune_keys): the key shards
          serialize straight from the incremental bucket mirror and the
          mirror's own dirty set — no scan of seen_keys at all, so per-batch
          checkpoint CPU is O(batch inserts + open windows).
        - Hinted external callers (this batch's inserted key timestamps,
          touched/finalized window keys, the watermark whose prune may have
          filtered the boundary bucket): one O(state) bucketize scan, but
          hinted-clean buckets skip re-serialization.
        - No hints: O(state) canonical-JSON compare per bucket — sound for
          any caller (review finding, round 4: write BYTES were already
          flat at 10x cardinality, but save CPU grew with retained state).

        Mirror contract: once the processor lane is active (record_inserts
        called), EVERY seen_keys mutation must go through record_inserts /
        prune_keys.  A size-changing outside mutation is detected (the
        save falls back to the scan AND permanently voids the mirror until
        the next load()); an equal-size swap is not detectable in O(1) —
        it would persist stale state — which is why the mirror methods are
        the only supported mutation path on this lane.
        """
        mirror_ok = (
            self._incremental
            and self._kbuckets is not None
            and sum(map(len, self._kbuckets.values())) == len(state["seen_keys"])
        )
        if self._incremental and not mirror_ok:
            # outside mutation detected after the lane went incremental:
            # the mirror (and its dirty set) can no longer be trusted —
            # void it so no later coincidental size match resurrects it
            # (review finding, round 4)
            self._kbuckets = None
            self._kdirty.clear()
            self._incremental = False
        # windows are always bucketized by scan: open_windows holds only
        # the not-yet-finalized windows (watermark-bounded, tiny), unlike
        # the retained dedup-key set
        win_buckets: dict[int, dict] = {}
        for key, bar in state["open_windows"].items():
            ws = int(key.rsplit("|", 1)[1])
            win_buckets.setdefault(ws // self.bucket_us, {})[key] = bar
        wm_bucket = (
            None if watermark_us is None else int(watermark_us) // self.bucket_us
        )
        if mirror_ok:
            key_buckets: dict[int, dict] = self._kbuckets
            key_hints: set[int] | None = set(self._kdirty)
        else:
            key_buckets = self._bucketize(state)["keys"]
            key_hints = None
            if dirty_key_ts is not None:
                key_hints = {int(t) // self.bucket_us for t in dirty_key_ts}
                if wm_bucket is not None:
                    # the prune `t >= watermark` may have filtered the
                    # watermark's own (boundary) bucket without any insert
                    key_hints.add(wm_bucket)
        win_hints: set[int] | None = None
        if dirty_window_keys is not None:
            win_hints = {
                int(k.rsplit("|", 1)[1]) // self.bucket_us
                for k in dirty_window_keys
            }
            if wm_bucket is not None:
                win_hints.add(wm_bucket)
        buckets = {"keys": key_buckets, "windows": win_buckets}
        hints = {"keys": key_hints, "windows": win_hints}
        if self._save_seq is None:
            # save without a prior load(): seed the counter from the
            # existing core.  Only a MISSING file or unparseable/foreign
            # content degrades to 0 — a transient I/O error on a valid
            # core must propagate (review finding: swallowing it would
            # reset the counter and let this save overwrite a shard file
            # the committed core still references, the exact invariant
            # the counter protects)
            try:
                with open(self.path) as f:
                    self._save_seq = self._core_save_seq(json.load(f))
            except FileNotFoundError:
                self._save_seq = 0
            except ValueError:
                # any unparseable content (JSONDecodeError and the
                # UnicodeDecodeError a binary core raises are both
                # ValueError subclasses): no references to collide with
                self._save_seq = 0
        self._save_seq += 1
        core: dict[str, Any] = {
            "batch_id": state["batch_id"],
            "processed": state["processed"],
            "processed_floor": state.get("processed_floor"),
            # the below-floor baseline must SURVIVE restarts: most real
            # publication-contract breaches land between drains, and a
            # re-baselined mark would silently absorb the late file
            # (round-5 review)
            "below_floor_mark": state.get("below_floor_mark"),
            "max_event_us": state["max_event_us"],
            "metrics": state["metrics"],
            "bucket_us": self.bucket_us,
            "save_seq": self._save_seq,
            "key_shards": {},
            "window_shards": {},
        }
        new_cache: dict[str, dict[int, tuple[str, str]]] = {
            "keys": {}, "windows": {},
        }
        for kind, manifest in (("keys", "key_shards"), ("windows", "window_shards")):
            kind_hints = hints[kind]
            for b, payload in buckets[kind].items():
                cached = self._cache.get(kind, {}).get(b)
                if cached is not None and kind_hints is not None and b not in kind_hints:
                    fname, canon = cached  # hinted clean: no serialization
                else:
                    canon = json.dumps(payload, sort_keys=True)
                    if cached is not None and cached[1] == canon:
                        fname = cached[0]  # clean shard: reference only
                    else:
                        # the save counter (not batch_id) makes the name
                        # unique per save: a dirty shard is always written
                        # to a FRESH file, never over one the committed
                        # core still references
                        fname = f"{kind}-{b}-{self._save_seq}.json"
                        _atomic_write_json(
                            self.shard_dir,
                            os.path.join(self.shard_dir, fname),
                            payload,
                        )
                core[manifest][str(b)] = fname
                new_cache[kind][b] = (fname, canon)
        _atomic_write_json(
            os.path.dirname(self.path) or ".", self.path, core
        )
        self._cache = new_cache
        if mirror_ok:
            # only a mirror-lane save consumes the dirty set; a fallback
            # save must not discard pending dirty marks (review finding)
            self._kdirty.clear()
        # prune shard files the new core no longer references (best-effort;
        # a crash before this point only leaves harmless orphans)
        live = set(core["key_shards"].values()) | set(core["window_shards"].values())
        for name in os.listdir(self.shard_dir):
            if name.endswith(".json") and name not in live:
                try:
                    os.remove(os.path.join(self.shard_dir, name))
                except OSError:
                    pass


PROCESSED_TRACKED_MAX = 4096


def _record_processed(state: dict[str, Any], files: list[str]) -> None:
    """Claim this batch's source files, keeping the tracked set BOUNDED.

    Only the newest ``PROCESSED_TRACKED_MAX`` names stay listed in the
    checkpoint core; older names compress into ``processed_floor`` (every
    name <= floor counts as processed). Without the bound the core rewrite
    — and the ``_pending_files`` listdir diff — grows O(all files ever
    seen) per batch, the exact unbounded-state class the sharded store
    eliminated for keys/windows (round-4 review). Sound under the source
    contract (module docstring: files are published by atomic rename in
    name order): a producer never lands a NEW file named below ~4k
    already-processed names — the bounded-late-by-NAME analog of the
    watermark's bounded-late-by-time; a pathological older arrival is
    skipped, never double-processed."""
    names = sorted(set(state["processed"]) | set(files))
    floor = state.get("processed_floor")
    if len(names) > PROCESSED_TRACKED_MAX:
        cut = names[len(names) - PROCESSED_TRACKED_MAX - 1]
        if floor is None or cut > floor:
            floor = cut
        names = [n for n in names if n > floor]
    state["processed"] = names
    state["processed_floor"] = floor


def _bar_from_group(g: pd.DataFrame) -> dict:
    """Partial bar from a (sorted) slice of one window's rows —
    deterministic open/close via (ts, event_id) min/max keys (never
    ``first()`` on undefined order, ``ofl/streaming/silver.py:39-44``)."""
    first = g.iloc[0]
    last = g.iloc[-1]
    return {
        "open": float(first["value"]),
        "close": float(last["value"]),
        "high": float(g["value"].max()),
        "low": float(g["value"].min()),
        "volume": float(g["value"].sum()),
        "n_events": int(len(g)),
        "_first_key": [int(first["ts_us"]), int(first["event_id"])],
        "_last_key": [int(last["ts_us"]), int(last["event_id"])],
    }


def _combine_bars(bar: dict | None, upd: dict) -> dict:
    """Associative, commutative partial-bar combine — the property that
    lets window folds run as a distributed ``map_groups`` with only tiny
    partial bars returning to the state holder."""
    if bar is None:
        return dict(upd)
    out = dict(bar)
    if upd["_first_key"] < bar["_first_key"]:
        out["open"], out["_first_key"] = upd["open"], upd["_first_key"]
    if upd["_last_key"] > bar["_last_key"]:
        out["close"], out["_last_key"] = upd["close"], upd["_last_key"]
    out["high"] = max(bar["high"], upd["high"])
    out["low"] = min(bar["low"], upd["low"])
    out["volume"] = bar["volume"] + upd["volume"]
    out["n_events"] = bar["n_events"] + upd["n_events"]
    return out


def _merge_bar(bar: dict | None, g: pd.DataFrame) -> dict:
    return _combine_bars(bar, _bar_from_group(g))


class StreamProcessor:
    """Drives the bronze→silver lane over a directory of event Parquet
    files (schema: event_id, ts, user_id, event_type, value, props)."""

    def __init__(
        self,
        source_dir: str,
        bronze_root: str,
        silver_root: str,
        checkpoint_dir: str,
        *,
        window_us: int = 60_000_000,
        delay_us: int = 120_000_000,
        max_files_per_trigger: int = 64,
        distributed: bool = True,
    ):
        self.source_dir = source_dir
        self.bronze = TableLog(bronze_root)
        self.bronze.create()
        self.dead = TableLog(os.path.join(bronze_root, "_dead_letter"))
        self.dead.create()
        self.silver = TableLog(silver_root)
        self.silver.create()
        self.ckpt = StreamCheckpoint(
            os.path.join(checkpoint_dir, "stream.json"),
            # shard granularity: at least one window per state shard — the
            # watermark prune then drops whole shard FILES as it advances
            bucket_us=max(window_us, 60_000_000),
        )
        self.window_us = window_us
        self.delay_us = delay_us
        self.max_files = max_files_per_trigger
        # distributed=True (the DEFAULT since round 3) runs each
        # micro-batch's ROW work (parse, tag, late-filter, dedup, window
        # partials) as Ray Data stages; only the watermark-BOUNDED state
        # (seen keys, open windows, metrics) lives in the checkpoint.
        # Semantics are identical to the single-process mirror
        # (distributed=False, kept as the offline-testable reference) —
        # the whole tests/test_streaming_lane.py matrix runs against BOTH
        # paths, the fold is associative (_combine_bars) and the dedup
        # first-wins order is (ts_us, event_id), batch-order-free.
        self.distributed = distributed

    # ------------------------------------------------------------------

    def _pending_files(self, state: dict[str, Any]) -> list[str]:
        done = set(state["processed"])
        floor = state.get("processed_floor")
        listing = [
            n for n in os.listdir(self.source_dir) if n.endswith(".parquet")
        ]
        if floor is not None:
            # detectability for the name-order publication contract
            # (round-5 advice): once the tracked set compresses into the
            # floor, a file LANDING at or below it is silently never
            # processed. Processed-below-floor files are indistinguishable
            # from skipped arrivals by name alone, so track the below-floor
            # on-disk COUNT per floor value — growth at a constant floor
            # can only be a late arrival. Blind exactly at the batch that
            # advances the floor (count re-baselines), best-effort by
            # design; the metric turns a contract breach from "quietly
            # missing rows" into a visible counter.
            below = sum(1 for n in listing if n <= floor)
            mark = state.get("below_floor_mark")
            if mark is not None and mark[0] == floor and below > mark[1]:
                skipped = below - mark[1]
                state["metrics"]["skipped_below_floor"] = (
                    state["metrics"].get("skipped_below_floor", 0) + skipped
                )
                logging.getLogger(__name__).warning(
                    "stream source %s: %d file(s) landed at or below the "
                    "processed floor %r and will never be processed "
                    "(producer broke the name-ordered publication "
                    "contract)", self.source_dir, skipped, floor,
                )
            if mark is None or mark[0] != floor or below > mark[1]:
                state["below_floor_mark"] = [floor, below]
        names = sorted(
            n for n in listing
            if n not in done and (floor is None or n > floor)
        )
        return names[: self.max_files]

    def run_available_now(self) -> dict[str, Any]:
        """Drain-then-exit: process micro-batches until no new files.

        State is loaded ONCE per drain and carried through the loop —
        after a successful save the in-memory dict equals the persisted
        one, so a per-batch reload would be an O(retained state) read for
        nothing (a crash resumes from the last save either way)."""
        state = self.ckpt.load()
        while True:
            files = self._pending_files(state)
            if not files:
                break
            self._process_batch(state, files)
        return state["metrics"]

    # ------------------------------------------------------------------

    def _process_batch(self, state: dict[str, Any], files: list[str]) -> None:
        if self.distributed:
            return self._process_batch_distributed(state, files)
        batch_id = state["batch_id"]
        tables = [
            pq.read_table(os.path.join(self.source_dir, f)) for f in files
        ]
        raw = pa.concat_tables(tables)
        df = raw.to_pandas()
        df["ts_us"] = df["ts"].astype("int64")
        df["event_key"] = df["event_type"].astype(str) + ":" + df["event_id"].astype(str)
        state["metrics"]["rows_in"] += len(df)

        # --- bronze: validity tag + dead-letter split (M8/S15) ---
        valid_mask = df["value"].notna() & df["ts"].notna()
        dead = df[~valid_mask].copy()
        good = df[valid_mask]
        state["metrics"]["rows_valid"] += len(good)
        if len(dead):
            dead["_reason"] = "missing_required_fields:value_or_ts"
            self._append(self.dead, dead.drop(columns=["ts_us", "event_key"]),
                         f"dead-{batch_id}", ("event_id",))
        self._append(self.bronze, good.drop(columns=["ts_us", "event_key"]),
                     f"bronze-{batch_id}", ("event_id",))

        # --- silver: watermark -> dedup -> window fold -> finalize ---
        wm = WatermarkState(self.delay_us, state["max_event_us"])
        wm.advance(int(good["ts_us"].max()) if len(good) else None)
        watermark = wm.current  # one-batch lag: last batch's max - delay

        if watermark is not None:
            late = good["ts_us"] < watermark  # strictly-before is late
            state["metrics"]["dropped_late"] += int(late.sum())
            good = good[~late]

        # exact dedup with state bounded by the watermark
        seen = state["seen_keys"]
        # duplicates against state AND within the batch (first occurrence
        # in deterministic (ts, event_id) order wins)
        good = good.sort_values(["ts_us", "event_id"], kind="mergesort")
        dup = (
            good["event_key"].isin(seen.keys())
            | good["event_key"].duplicated(keep="first")
        )
        state["metrics"]["dropped_dup"] += int(dup.sum())
        good = good[~dup.to_numpy()]
        inserted = [(k, int(t)) for k, t in zip(good["event_key"], good["ts_us"])]
        seen.update(inserted)
        # mirror inserts + bucket-wise prune: keeps checkpoint save AND the
        # watermark prune O(batch), not O(retained keys)
        self.ckpt.record_inserts(inserted)
        self.ckpt.prune_keys(state, watermark)

        # fold into open windows
        touched_windows: list[str] = []
        if len(good):
            g = good.copy()
            g["wstart"] = (g["ts_us"] // self.window_us) * self.window_us
            g = g.sort_values(["ts_us", "event_id"], kind="mergesort")
            for (etype, ws), grp in g.groupby(["event_type", "wstart"], sort=False):
                key = f"{etype}|{int(ws)}"
                state["open_windows"][key] = _merge_bar(
                    state["open_windows"].get(key), grp
                )
                touched_windows.append(key)

        # finalize windows whose end the watermark passed (append-once)
        emitted = []
        for key in sorted(state["open_windows"]):
            etype, ws = key.rsplit("|", 1)
            wend = window_end(int(ws), self.window_us)
            if watermark is not None and watermark >= wend:
                bar = state["open_windows"].pop(key)
                touched_windows.append(key)
                emitted.append(
                    {
                        "event_type": etype,
                        "window_start": int(ws),
                        **{k: v for k, v in bar.items() if not k.startswith("_")},
                    }
                )
        if emitted:
            bars = pd.DataFrame(emitted)
            bars["window_start"] = pd.to_datetime(bars["window_start"], unit="us")
            self._append(self.silver, bars, f"silver-{batch_id}",
                         ("event_type", "window_start"))
            state["metrics"]["bars_emitted"] += len(emitted)

        # checkpoint: claim offsets + state AFTER the idempotent writes;
        # dirty hints = exactly the buckets this batch's loops mutated
        _record_processed(state, files)
        state["batch_id"] = batch_id + 1
        state["max_event_us"] = wm.max_event_us
        self.ckpt.save(
            state,
            dirty_key_ts=[int(t) for t in good["ts_us"]],
            dirty_window_keys=touched_windows,
            watermark_us=watermark,
        )

    def _process_batch_distributed(self, state: dict[str, Any], files: list[str]) -> None:
        """Ray-Data micro-batch: the same pipeline as the single-process
        mirror, with every O(rows) step a distributed stage and only
        O(bounded-state) results returning to the driver."""
        import numpy as np
        import pyarrow.compute as pc
        import ray
        import ray.data as rd

        batch_id = state["batch_id"]
        paths = [os.path.join(self.source_dir, f) for f in files]
        ds = rd.read_parquet(paths)

        def enrich(t: pa.Table) -> pa.Table:
            t = t.append_column("ts_us", t["ts"].cast(pa.int64()))
            key = pc.binary_join_element_wise(
                pc.cast(t["event_type"], pa.string()), ":",
                pc.cast(t["event_id"], pa.string()), "",
            )
            return t.append_column("event_key", key)

        ds = ds.map_batches(enrich, batch_format="pyarrow").materialize()

        # --- bronze: validity tag + dead-letter split (distributed writes) ---
        def split(valid: bool):
            def _f(t: pa.Table) -> pa.Table:
                mask = pc.and_(pc.is_valid(t["value"]), pc.is_valid(t["ts"]))
                t2 = t.filter(mask if valid else pc.invert(mask))
                t2 = t2.drop_columns(["ts_us", "event_key"])
                if not valid and t2.num_rows:
                    t2 = t2.append_column(
                        "_reason",
                        pa.array(["missing_required_fields:value_or_ts"] * t2.num_rows),
                    )
                return t2
            return _f

        # rows_in from parquet footers — no pipeline execution
        rows_in = sum(
            pq.ParquetFile(p).metadata.num_rows for p in paths
        )
        state["metrics"]["rows_in"] += rows_in
        # (return value unused: dead rows don't feed a metric — the write
        # and its idempotent commit are the point; strict_replay=False so
        # an expired-tombstone replay can't wedge the stream over a count
        # nobody reads)
        self._append_ds(
            self.dead, ds.map_batches(split(False), batch_format="pyarrow"),
            f"dead-{batch_id}", ("event_id",), strict_replay=False,
        )
        n_valid = self._append_ds(
            self.bronze, ds.map_batches(split(True), batch_format="pyarrow"),
            f"bronze-{batch_id}", ("event_id",),
        )
        state["metrics"]["rows_valid"] += n_valid

        # --- watermark (one-batch lag); late-drop count derived, not an
        # extra full filter+count pass ---
        wm = WatermarkState(self.delay_us, state["max_event_us"])

        def only_valid(t: pa.Table) -> pa.Table:
            return t.filter(pc.and_(pc.is_valid(t["value"]), pc.is_valid(t["ts"])))

        good = ds.map_batches(only_valid, batch_format="pyarrow")
        maxes = good.map_batches(
            lambda t: pa.table({"m": [pc.max(t["ts_us"]).as_py()]}),
            batch_format="pyarrow",
        ).take_all()
        batch_max = max((r["m"] for r in maxes if r["m"] is not None), default=None)
        wm.advance(batch_max)
        watermark = wm.current

        if watermark is not None:
            good = good.map_batches(
                lambda t: t.filter(
                    pc.greater_equal(t["ts_us"], pa.scalar(watermark, pa.int64()))
                ),
                batch_format="pyarrow",
            )

        # --- dedup (vs bounded state + within-batch first-wins) FUSED with
        # the window partial fold: one groupby execution yields the new
        # keys, the partial bars AND the survivor count ---
        seen_ref = ray.put(set(state["seen_keys"]))
        window_us = self.window_us

        def drop_seen_bucket(t: pa.Table) -> pa.Table:
            seen = ray.get(seen_ref)
            keys = pd.Series(t["event_key"].to_numpy(zero_copy_only=False))
            t = t.filter(pa.array((~keys.isin(seen)).to_numpy()))
            h = pd.util.hash_array(
                t["event_key"].to_numpy(zero_copy_only=False)
            ) % np.uint64(32)
            return t.append_column("_kb", pa.array(h.astype(np.int64)))

        def dedup_and_fold(g: pd.DataFrame) -> pd.DataFrame:
            g = g.sort_values(["ts_us", "event_id"], kind="mergesort")
            g = g.drop_duplicates("event_key", keep="first")
            g["wstart"] = (g["ts_us"] // window_us) * window_us
            out = []
            for (etype, ws), grp in g.groupby(["event_type", "wstart"], sort=False):
                out.append({
                    "event_type": etype,
                    "wstart": int(ws),
                    "bar_json": json.dumps(_bar_from_group(grp)),
                    "keys_json": json.dumps(
                        [[k, int(t)] for k, t in zip(grp["event_key"], grp["ts_us"])]
                    ),
                })
            return pd.DataFrame(out, columns=["event_type", "wstart",
                                              "bar_json", "keys_json"])

        partials = (
            good.map_batches(drop_seen_bucket, batch_format="pyarrow")
            .groupby("_kb")
            .map_groups(dedup_and_fold, batch_format="pandas")
            .take_all()
        )
        seen = state["seen_keys"]
        inserted: list[tuple[str, int]] = []
        for row in partials:
            for k, t_us in json.loads(row["keys_json"]):
                inserted.append((k, int(t_us)))
        n_survivors = len(inserted)
        seen.update(inserted)
        self.ckpt.record_inserts(inserted)
        # late-filtered count = valid minus (survivors + dups); dups are the
        # keys that fell to state/batch dedup AFTER the late filter — derive
        # both metrics from ONE pipeline execution:
        n_ontime = n_valid if watermark is None else None
        if n_ontime is None:
            # recompute cheaply from footers is impossible post-filter; use
            # the late-row count embedded in the watermark semantics: rows
            # strictly before the watermark among valid rows
            n_late = sum(
                r["c"] for r in ds.map_batches(
                    lambda t: pa.table({"c": [int(pc.sum(pc.and_(
                        pc.and_(pc.is_valid(t["value"]), pc.is_valid(t["ts"])),
                        pc.less(t["ts_us"], pa.scalar(watermark, pa.int64()))
                    ).cast(pa.int64())).as_py() or 0)]}),
                    batch_format="pyarrow",
                ).take_all()
            )
            state["metrics"]["dropped_late"] += n_late
            n_ontime = n_valid - n_late
        state["metrics"]["dropped_dup"] += n_ontime - n_survivors
        self.ckpt.prune_keys(state, watermark)
        touched_windows: list[str] = []
        for row in partials:
            key = f"{row['event_type']}|{row['wstart']}"
            state["open_windows"][key] = _combine_bars(
                state["open_windows"].get(key), json.loads(row["bar_json"])
            )
            touched_windows.append(key)

        # --- finalize + checkpoint: identical to the single-process path ---
        emitted = []
        for key in sorted(state["open_windows"]):
            etype, ws = key.rsplit("|", 1)
            wend = window_end(int(ws), self.window_us)
            if watermark is not None and watermark >= wend:
                bar = state["open_windows"].pop(key)
                touched_windows.append(key)
                emitted.append({
                    "event_type": etype,
                    "window_start": int(ws),
                    **{k: v for k, v in bar.items() if not k.startswith("_")},
                })
        if emitted:
            bars = pd.DataFrame(emitted)
            bars["window_start"] = pd.to_datetime(bars["window_start"], unit="us")
            self._append(self.silver, bars, f"silver-{batch_id}",
                         ("event_type", "window_start"))
            state["metrics"]["bars_emitted"] += len(emitted)

        _record_processed(state, files)
        state["batch_id"] = batch_id + 1
        state["max_event_us"] = wm.max_event_us
        self.ckpt.save(
            state,
            dirty_key_ts=[t for _, t in inserted],
            dirty_window_keys=touched_windows,
            watermark_us=watermark,
        )

    def _append_ds(
        self, log: TableLog, ds, job_id: str, sort_by: tuple[str, ...],
        strict_replay: bool = True,
    ) -> int:
        """Idempotent DISTRIBUTED micro-batch append: per-block stats
        writer + one commit under the batch's job id. Always returns the
        rows this batch's commit holds — on a crash-replayed batch (commit
        exists, checkpoint lost) the count is recovered from the commit's
        own manifests so the re-derived metrics match an uninterrupted run
        exactly (review finding, round 3: the old ``None`` fallback
        counted dead rows as valid on replay)."""
        existing = log.find_commit(job_id)
        if existing is not None:
            if existing.operation == "expired":
                if not strict_replay:
                    return 0  # caller discards the count; idempotence holds
                # the commit's snapshot was vacuumed while its txn marker
                # survived: the row count is unrecoverable — fail loudly
                # rather than silently under-counting rows_valid
                raise StaleTableError(
                    f"replayed batch {job_id!r}: commit snapshot expired; "
                    "metrics cannot be re-derived exactly"
                )
            added = set(existing.added_paths)
            if not added:
                return 0
            rows = 0
            for m in existing.manifests:
                for e in log.read_manifest(m):
                    if e.path in added:
                        rows += e.rows
            return rows
        from open_finance_lakehouse_ray.stages.writer import (
            make_stats_writer,
            meta_rows_to_entries,
        )

        meta = ds.map_batches(
            make_stats_writer(log.root, stats_cols=(), sort_by=sort_by,
                              prefix="stream"),
            batch_size=None,
            batch_format="pyarrow",
        )
        entries = meta_rows_to_entries(meta.take_all())
        if not entries:  # nothing to land (e.g. no dead rows): no commit
            return 0
        log.commit(
            operation="stream-append", job_id=job_id, added=entries,
            # append-only: the added files ARE the commit's insert image
            summary={"cdc": {"derive": "commit-paths"}},
        )
        return sum(e.rows for e in entries)

    def _append(
        self, log: TableLog, df: pd.DataFrame, job_id: str, sort_by: tuple[str, ...]
    ) -> None:
        """Idempotent micro-batch append: job_id carries the batch id, so a
        replayed batch (checkpoint written but process died before...) is a
        log-level no-op — the txnAppId/txnVersion guard."""
        if log.find_commit(job_id) is not None:
            return
        from open_finance_lakehouse_ray.stages.writer import write_table_file

        table = pa.Table.from_pandas(df, preserve_index=False)
        entry = write_table_file(
            log.root, table, stats_cols=(), sort_by=sort_by, prefix="stream"
        )
        log.commit(
            operation="stream-append", job_id=job_id, added=[entry],
            summary={"cdc": {"derive": "commit-paths"}},
        )


def replay_dead_letters(
    bronze_root: str,
    fix_fn,
    *,
    job_id: str,
) -> dict[str, Any]:
    """Re-ingest dead-lettered rows after a fix — the replayability the
    reference promises for its reject table
    (``/root/reference/ofl/streaming/bronze.py:171-182``: rejects are
    written verbatim with a reason so they can be REPLAYED once the
    producer bug is fixed).

    ``fix_fn`` is a ``pa.Table -> pa.Table`` batch repair (applied as a
    streaming ``map_batches`` over the dead-letter table, ``_reason``
    column included so a fix can dispatch on it). Rows that pass the
    bronze validity gate after the fix (non-null ``value`` AND ``ts`` —
    the same rule the lane splits on) append to bronze; rows still
    invalid stay dead-lettered (with their original reason). Accounting
    reconciles exactly: ``replayed + still_dead == dead_before``.

    Crash-safe and idempotent on ``job_id``. The fix-set is pinned to ONE
    dead-table version: the bronze append commits under ``{job_id}/append``
    recording ``replay_of_dead_version``, and the prune commit
    (``{job_id}/prune``) removes EXACTLY that version's files — never an
    overwrite of the live head, so rows dead-lettered between the two
    halves (or between crash and resume) survive untouched for the next
    replay. A resume after a crash between the halves reads the pinned
    version back from the append commit; a re-run after full completion
    reports straight from the recorded summaries with zero I/O.
    """
    import pyarrow.compute as pc
    import ray.data as rd

    from open_finance_lakehouse_ray.stages.writer import (
        make_stats_writer,
        meta_rows_to_entries,
    )

    bronze = TableLog(bronze_root)
    dead = TableLog(os.path.join(bronze_root, "_dead_letter"))
    append_job, prune_job = f"{job_id}/append", f"{job_id}/prune"
    existing_append = bronze.find_commit(append_job)
    existing_prune = dead.find_commit(prune_job)

    def _report(n_good: int, still: int, dead_before: int) -> dict[str, Any]:
        return {
            "replayed": int(n_good),
            "still_dead": int(still),
            "dead_before": int(dead_before),
            "reconciled": int(n_good) + int(still) == int(dead_before),
        }

    if existing_prune is not None:
        # fully committed replay: report from the recorded summaries.
        # An EXPIRED commit comes back as a tombstone with an empty
        # summary — reporting zeros from it would look like a clean
        # "reconciled" run; be loud instead (the replay itself remains
        # applied — txn markers survive expire, so a re-run still no-ops)
        if existing_prune.operation == "expired" or (
            existing_append is not None
            and existing_append.operation == "expired"
        ):
            raise StaleTableError(
                f"replay {job_id!r} completed but its commit snapshots "
                "have expired; the recorded counts are unrecoverable "
                "(the replayed rows themselves are safely in bronze)"
            )
        s = existing_prune.summary
        n_good = (
            int(existing_append.summary.get("replayed_rows", 0))
            if existing_append is not None else 0
        )
        return _report(
            n_good, s.get("still_dead", 0),
            s.get("dead_before", n_good + int(s.get("still_dead", 0))),
        )

    if existing_append is not None:
        s = existing_append.summary
        if "replay_of_dead_version" not in s:
            raise StaleTableError(
                f"replay {job_id!r}: the append commit's snapshot expired "
                "before the prune committed; the pinned fix-set version is "
                "unrecoverable — rerun under a NEW job_id"
            )
        dead_v = int(s["replay_of_dead_version"])
        n_good: int | None = int(s["replayed_rows"])
        n_dead = int(s["dead_before"])
    else:
        dead_v = dead.current_version()
        if dead_v is None:
            return _report(0, 0, 0)
        n_dead = sum(e.rows for e in dead.files(dead_v))
        if n_dead == 0:
            return _report(0, 0, 0)
        n_good = None  # computed below

    # fix once, split once — the materialization is reject-scale (the
    # dead-letter table at the PINNED version), never corpus-scale
    dead_files_v = dead.files(dead_v)
    fixed = (
        rd.read_parquet([os.path.join(dead.root, e.path) for e in dead_files_v])
        .map_batches(fix_fn, batch_format="pyarrow")
        .materialize()
    )

    def _mask(t: pa.Table):
        return pc.and_(pc.is_valid(t["value"]), pc.is_valid(t["ts"]))

    def good_part(t: pa.Table) -> pa.Table:
        out = t.filter(_mask(t))
        return out.drop_columns(["_reason"])

    def bad_part(t: pa.Table) -> pa.Table:
        return t.filter(pc.invert(_mask(t)))

    # --- bronze append (idempotent on the job id, pins the fix-set) ---
    if n_good is None:
        meta = fixed.map_batches(good_part, batch_format="pyarrow").map_batches(
            make_stats_writer(bronze.root, stats_cols=(), sort_by=("event_id",),
                              prefix="replay"),
            batch_size=None,
            batch_format="pyarrow",
        )
        entries = meta_rows_to_entries(meta.take_all())
        n_good = sum(e.rows for e in entries)
        if entries:
            bronze.commit(
                operation="stream-append", job_id=append_job, added=entries,
                summary={
                    "replayed_rows": n_good,
                    "replay_of_dead_version": dead_v,
                    "dead_before": n_dead,
                    "cdc": {"derive": "commit-paths"},
                },
            )

    # --- dead-letter prune: still-bad rows REPLACE the pinned version's
    # files only; dead rows landed since dead_v stay for the next replay
    meta = fixed.map_batches(bad_part, batch_format="pyarrow").map_batches(
        make_stats_writer(dead.root, stats_cols=(), sort_by=("event_id",),
                          prefix="replay-dead"),
        batch_size=None,
        batch_format="pyarrow",
    )
    entries_bad = meta_rows_to_entries(meta.take_all())
    still = sum(e.rows for e in entries_bad)
    pinned_paths = {e.path for e in dead_files_v}
    dead.commit(
        operation="ingest", job_id=prune_job, added=entries_bad,
        removed_paths=pinned_paths, read_paths=pinned_paths,
        base_version=dead.current_version(),
        summary={
            "still_dead": still,
            "dead_before": n_dead,
            "replay_of_dead_version": dead_v,
            "cdc": {"derive": "commit-paths"},
        },
    )
    return _report(n_good, still, n_dead)
