"""Change data feed — row-level diff between two table versions.

The reference's Delta tables expose CDF (``table_changes``) so consumers
can ingest only what changed. This engine derives the feed from the
snapshots themselves, with the file-set optimization that makes it cheap:
between ``from_version`` and ``to_version`` only files REMOVED or ADDED
can contribute changes — files present in both snapshots are byte-equal
and never read. Maintenance rewrites (compaction, Z-order, MERGE's
untouched survivors) move rows between files without changing them, so
those rows cancel in the multiset diff and emit nothing.

Shape: read old-only files tagged side=0 and new-only files side=1 →
bounded hash partitions on the merge key (``dedup._pk_tagger``
discipline — never one Python group per key) → per-partition vectorized
multiset cancel + key pairing:

- full rows equal on both sides cancel (rewrite noise);
- a surviving new-side row whose key also survives on the old side pairs
  into ``update_preimage``/``update_postimage`` (Delta CDF naming);
- unpaired new-side rows are ``insert``; unpaired old-side ``delete``.

Duplicate-key tables degrade gracefully: surplus copies pair by sorted
order within the key, leftovers classify as insert/delete.

Requires both snapshots readable (not expired) — expiring ``from_version``
raises the normal ``StaleTableError`` at planning time.
"""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa
import ray.data as rd

from open_finance_lakehouse_ray.state.txlog import TableLog

CHANGE_COL = "_change_type"


def _diff_partition(key_cols: list[str]):
    def diff(df: pd.DataFrame) -> pd.DataFrame:
        data_cols = [c for c in df.columns if c not in ("_pk", "_side")]
        # multiset cancel: count each FULL row per side, keep the surplus
        grp = df.groupby(data_cols, dropna=False, sort=False)["_side"]
        cnt = grp.sum().reset_index(name="n_new")
        cnt["n_tot"] = grp.count().to_numpy()
        net = cnt["n_new"] - (cnt["n_tot"] - cnt["n_new"])

        ins = cnt.loc[cnt.index.repeat(net.clip(lower=0))][data_cols]
        del_ = cnt.loc[cnt.index.repeat((-net).clip(lower=0))][data_cols]
        if ins.empty and del_.empty:
            out = pd.DataFrame(columns=data_cols + [CHANGE_COL])
            return out

        # pair surplus rows key-wise in deterministic sorted order
        other = [c for c in data_cols if c not in key_cols]
        ins = ins.sort_values(data_cols, kind="mergesort").reset_index(drop=True)
        del_ = del_.sort_values(data_cols, kind="mergesort").reset_index(drop=True)
        ins["_ci"] = ins.groupby(key_cols, dropna=False, sort=False).cumcount()
        del_["_ci"] = del_.groupby(key_cols, dropna=False, sort=False).cumcount()
        m = ins.merge(
            del_, on=key_cols + ["_ci"], how="outer",
            suffixes=("", "__old"), indicator=True,
        )
        frames = []
        both = m[m["_merge"] == "both"]
        if len(both):
            pre = both[key_cols + [c + "__old" for c in other]].rename(
                columns={c + "__old": c for c in other}
            )
            pre[CHANGE_COL] = "update_preimage"
            post = both[data_cols].copy()
            post[CHANGE_COL] = "update_postimage"
            frames += [pre[data_cols + [CHANGE_COL]], post]
        ionly = m[m["_merge"] == "left_only"]
        if len(ionly):
            i = ionly[data_cols].copy()
            i[CHANGE_COL] = "insert"
            frames.append(i)
        donly = m[m["_merge"] == "right_only"]
        if len(donly):
            d = donly[key_cols + [c + "__old" for c in other]].rename(
                columns={c + "__old": c for c in other}
            )
            d[CHANGE_COL] = "delete"
            frames.append(d[data_cols + [CHANGE_COL]])
        out = pd.concat(frames, ignore_index=True)
        # the outer merge NaN-upcasts complementary columns (int64 ->
        # float64); the emitted rows themselves are complete, so restore
        # the input dtypes — a CDC consumer must see the table's schema
        for c, dt in df[data_cols].dtypes.items():
            if out[c].dtype != dt:
                try:
                    out[c] = out[c].astype(dt)
                except (TypeError, ValueError):
                    pass
        return out

    return diff


def change_feed(
    root: str,
    *,
    from_version: int,
    to_version: int | None = None,
    key_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
    num_partitions: int = 64,
) -> rd.Dataset:
    """Dataset of row-level changes between two snapshots, one row per
    change with a Delta-CDF ``_change_type`` column (insert / delete /
    update_preimage / update_postimage)."""
    from open_finance_lakehouse_ray.pipelines.dedup import _pk_tagger

    # resolve against the DRIVER's cwd: read tasks run with their own
    # cwd, so a relative root must be absolutized before it enters the
    # plan (and manifest paths are table-relative — join exactly once)
    root = os.path.abspath(root)
    log = TableLog(root)
    # table-RELATIVE paths (file_paths() would pre-join root; joining
    # again below would double-prefix under a relative root)
    old_paths = {e.path for e in log.files(from_version)}
    new_paths = {e.path for e in log.files(to_version)}
    old_only = sorted(old_paths - new_paths)
    new_only = sorted(new_paths - old_paths)

    sch = (
        log.table_schema(to_version)
        if log.schema_is_evolved(to_version)
        else None
    )

    def side_reader(paths: list[str], side: int) -> rd.Dataset | None:
        if not paths:
            return None
        ds = rd.read_parquet([os.path.join(root, p) for p in paths])

        def tag(t: pa.Table) -> pa.Table:
            if sch is not None:
                from open_finance_lakehouse_ray.stages.evolution import conform_table

                t = conform_table(t, sch)
            return t.append_column(
                "_side", pa.array([side] * t.num_rows, pa.int64())
            )

        return ds.map_batches(tag, batch_format="pyarrow")

    olds = side_reader(old_only, 0)
    news = side_reader(new_only, 1)
    if olds is None and news is None:
        empty = (sch or log.table_schema(to_version) or pa.schema([])).empty_table()
        empty = empty.append_column(CHANGE_COL, pa.array([], pa.string()))
        return rd.from_arrow(empty)
    unioned = olds.union(news) if olds and news else (olds or news)

    tagged = unioned.map_batches(
        _pk_tagger(tuple(key_cols), num_partitions), batch_format="pyarrow"
    )
    return tagged.groupby("_pk").map_groups(
        _diff_partition(list(key_cols)), batch_format="pandas"
    )


class ChangeStream:
    """Incremental change-feed consumer — the table-as-a-CDC-stream.

    The streaming lane's table-as-stream source (``pipelines/streaming.py``)
    replays APPENDED files; this replays row-level CHANGES, so a
    downstream consumer (an incremental mart, a search index, a replica)
    can apply deletes and updates too. Checkpoint protocol mirrors the
    stream checkpoints: ``poll()`` returns the feed from the last
    committed version to the current head (or None when caught up);
    ``commit(to_version)`` durably advances the cursor only after the
    consumer has applied the batch — crash between poll and commit →
    the same feed is re-served (at-least-once; the feed is deterministic,
    so idempotent apply gives exactly-once).
    """

    def __init__(self, root: str, checkpoint_path: str, *, start_version: int | None = None):
        import json as _json

        self.root = root
        self.path = checkpoint_path
        self._json = _json
        if not os.path.exists(checkpoint_path):
            if start_version is None:
                start_version = TableLog(root).current_version()
                if start_version is None:
                    raise ValueError(f"no table at {root} and no start_version")
            self._save(start_version)

    def _save(self, version: int) -> None:
        os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            f.write(self._json.dumps({"last_version": version}))
        os.replace(tmp, self.path)

    @property
    def last_version(self) -> int:
        with open(self.path) as f:
            return int(self._json.load(f)["last_version"])

    def poll(self):
        """(feed Dataset, to_version) when the table moved, else None."""
        head = TableLog(self.root).current_version()
        last = self.last_version
        if head is None or head <= last:
            return None
        return change_feed(self.root, from_version=last, to_version=head), head

    def commit(self, to_version: int) -> None:
        if to_version < self.last_version:
            raise ValueError("checkpoint cannot move backwards")
        self._save(to_version)
