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
import pickle

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

from open_finance_lakehouse_ray.state.txlog import TableLog

CHANGE_COL = "_change_type"


_NULLABLE_INTS = {
    "int8": "Int8", "int16": "Int16", "int32": "Int32", "int64": "Int64",
    "uint8": "UInt8", "uint16": "UInt16", "uint32": "UInt32",
    "uint64": "UInt64",
}


def _protect_ints(df: pd.DataFrame) -> pd.DataFrame:
    """Cast numpy int columns to pandas NULLABLE ints so the outer
    merges below introduce NA instead of upcasting to float64 — a
    float round-trip silently corrupts int64 values beyond 2^53 (row
    hashes, large ids)."""
    for c in df.columns:
        m = _NULLABLE_INTS.get(str(df[c].dtype))
        if m:
            df[c] = df[c].astype(m)
    return df


def _eq_nansafe(a: pd.Series, b: pd.Series) -> pd.Series:
    eq = a == b
    if eq.dtype != bool:  # nullable compare yields NA where either is NA
        eq = eq.fillna(False).astype(bool)
    return eq | (a.isna() & b.isna())


def _unhashable_cols(df: pd.DataFrame, cols: list[str]) -> list[str]:
    """Columns whose object cells hold Arrow list/struct values
    (ndarray / list / dict) — unusable as groupby/merge/sort keys and
    ambiguous under ``==``. Blocks arrive via Arrow, so object columns
    are homogeneously typed: probing the first non-null cell is sound."""
    out = []
    for c in cols:
        s = df[c]
        if s.dtype != object:
            continue
        nn = s.dropna()
        if len(nn) and isinstance(
            nn.iloc[0], (np.ndarray, list, dict, set, tuple)
        ):
            out.append(c)
    return out


def _diff_partition(key_cols: list[str]):
    def diff(df: pd.DataFrame) -> pd.DataFrame:
        data_cols = [c for c in df.columns if c not in ("_pk", "_side")]
        other = [c for c in data_cols if c not in key_cols]
        dtypes = df[data_cols].dtypes  # originals, restored at the end
        df = _protect_ints(df)
        # Arrow list/struct cells are unhashable and ambiguous under == —
        # swap them for canonical pickle tokens (equal values <=> equal
        # bytes) so every merge/groupby/sort/compare below just works;
        # _finish maps tokens back so the consumer sees real values
        tok2val: dict[bytes, object] = {}
        tok_cols = _unhashable_cols(df, data_cols)
        for c in tok_cols:

            def _tok(v):
                if v is None:
                    return None
                b = pickle.dumps(v, protocol=4)
                tok2val.setdefault(b, v)
                return b

            df[c] = df[c].map(_tok)

        def _finish(frames: list[pd.DataFrame]) -> pd.DataFrame:
            if frames:
                out = pd.concat(frames, ignore_index=True)
            else:
                out = pd.DataFrame(columns=data_cols + [CHANGE_COL])
            for c in tok_cols:
                out[c] = out[c].map(
                    lambda v: tok2val[v] if isinstance(v, bytes) else None
                )
            # outer merges NaN-upcast complementary columns (int64 ->
            # float64); the emitted rows themselves are complete, so
            # restore the input dtypes — a CDC consumer must see the
            # table's schema
            for c, dt in dtypes.items():
                if out[c].dtype != dt:
                    try:
                        out[c] = out[c].astype(dt)
                    except (TypeError, ValueError):
                        pass
            return out

        # FAST PATH for keys with at most one row per side (every row of a
        # unique-key table): one keyed outer merge + vectorized column
        # compares — no full-row groupby over wide text columns. Keys with
        # surplus copies fall through to the exact multiset path below.
        cnt = df.groupby(key_cols, dropna=False, sort=False)["_side"].agg(
            ["count", "sum"]
        )
        cnt["_multi"] = (cnt["count"] - cnt["sum"] > 1) | (cnt["sum"] > 1)
        df = df.merge(
            cnt[["_multi"]].reset_index(), on=key_cols, how="left", copy=False
        )
        simple = df[~df["_multi"]]
        df = df[df["_multi"]]
        fast_frames = []
        if len(simple):
            old = simple.loc[simple["_side"] == 0, data_cols]
            new = simple.loc[simple["_side"] == 1, data_cols]
            m = old.merge(
                new, on=key_cols, how="outer", suffixes=("__o", ""),
                indicator=True, copy=False,
            )
            ins = m[m["_merge"] == "right_only"]
            if len(ins):
                i = ins[data_cols].copy()
                i[CHANGE_COL] = "insert"
                fast_frames.append(i)
            dele = m[m["_merge"] == "left_only"]
            if len(dele):
                d = dele[key_cols + [c + "__o" for c in other]].rename(
                    columns={c + "__o": c for c in other}
                )
                d[CHANGE_COL] = "delete"
                fast_frames.append(d[data_cols + [CHANGE_COL]])
            both = m[m["_merge"] == "both"]
            if len(both):
                eq = pd.Series(True, index=both.index)
                for c in other:
                    eq &= _eq_nansafe(both[c], both[c + "__o"])
                chg = both[~eq]
                if len(chg):
                    pre = chg[key_cols + [c + "__o" for c in other]].rename(
                        columns={c + "__o": c for c in other}
                    )
                    pre[CHANGE_COL] = "update_preimage"
                    post = chg[data_cols].copy()
                    post[CHANGE_COL] = "update_postimage"
                    fast_frames += [pre[data_cols + [CHANGE_COL]], post]
        if not len(df):
            return _finish(fast_frames)

        # multiset cancel: count each FULL row per side, keep the surplus
        grp = df.groupby(data_cols, dropna=False, sort=False)["_side"]
        cnt = grp.sum().reset_index(name="n_new")
        cnt["n_tot"] = grp.count().to_numpy()
        net = cnt["n_new"] - (cnt["n_tot"] - cnt["n_new"])

        ins = cnt.loc[cnt.index.repeat(net.clip(lower=0))][data_cols]
        del_ = cnt.loc[cnt.index.repeat((-net).clip(lower=0))][data_cols]
        if ins.empty and del_.empty:
            return _finish(fast_frames)

        # pair surplus rows key-wise in deterministic sorted order
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
        return _finish(fast_frames + frames)

    return diff


def _net_reduce_events(
    events: rd.Dataset,
    table_schema,
    key_cols: list[str],
    num_partitions: int,
) -> rd.Dataset:
    """Collapse a span of recorded per-commit CDC events into the true net
    diff between the span's endpoints.

    Old-side rows (state at from_version) are the ``delete`` /
    ``update_preimage`` events; new-side rows (state at to_version) are
    ``insert`` / ``update_postimage``. Intermediate states appear on BOTH
    sides (a v2-inserted, v3-updated row contributes insert(A), pre(A),
    post(B) — A cancels) so the multiset pairing of
    :func:`_diff_partition` yields exactly what the computed net path
    would: per key the first preimage / last postimage, no-op update
    round-trips cancelled, duplicate-key tables handled by the same
    surplus pairing.
    """
    from open_finance_lakehouse_ray.pipelines.dedup import _pk_tagger

    if table_schema is not None:
        missing = [k for k in key_cols if k not in table_schema.names]
        if missing:
            raise ValueError(
                f"auto-granularity net fold needs key_cols present in the "
                f"table schema; {missing} not in {table_schema.names} — "
                "pass the table's actual merge key (key_cols=...)"
            )

    def to_sides(t: pa.Table) -> pa.Table:
        ct = t[CHANGE_COL]
        import pyarrow.compute as pc

        side = pc.cast(
            pc.is_in(ct, value_set=pa.array(["insert", "update_postimage"])),
            pa.int64(),
        )
        drop = [c for c in (CHANGE_COL, "_commit_version") if c in t.column_names]
        return t.drop_columns(drop).append_column("_side", side)

    tagged = events.map_batches(to_sides, batch_format="pyarrow").map_batches(
        _pk_tagger(tuple(key_cols), num_partitions), batch_format="pyarrow"
    )
    # materialized: change-scale (O(changes) rows), and the empty-result
    # schema probe below must not re-execute the shuffle on consumption
    out = tagged.groupby("_pk").map_groups(
        _diff_partition(key_cols), batch_format="pandas"
    ).materialize()
    # an all-cancelling (or maintenance-only) span loses its schema through
    # the empty groupby — pin the net-diff shape for cross-poll unions
    if out.count() == 0 and table_schema is not None:
        empty = table_schema.empty_table()
        empty = empty.append_column(CHANGE_COL, pa.array([], pa.string()))
        return rd.from_arrow(empty)
    return out


HASH_PAYLOAD_MIN_BYTES = 256 * 1024 * 1024


def commit_changes(root: str, version: int) -> rd.Dataset | None:
    """The WRITE-TIME CDC image of one commit (Delta's ``_change_data``
    analog), or None when the commit carries no CDC marker (e.g. MERGE,
    RESTORE — use the computed diff for those ranges).

    Sources, zero recompute: typed ``cdc-*.parquet`` artifacts recorded
    by DELETE/UPDATE; an ingest's own added/removed file sets (inserts /
    whole-file deletes — those files stay readable until their snapshot
    expires); maintenance commits carry an EMPTY marker (logical
    no-change). Rows gain ``_commit_version``.
    """
    root = os.path.abspath(root)
    log = TableLog(root)
    snap = log.snapshot(version)
    cdc = snap.summary.get("cdc")
    if cdc is None:
        return None

    typed_paths = [f["path"] for f in cdc.get("files", []) if f]
    if cdc.get("derive") == "commit-paths":
        insert_paths = list(snap.added_paths)
        delete_paths = list(snap.removed_paths)
    else:
        # e.g. MERGE's insert-pass outputs: data files whose rows are
        # ALL inserts, doubling as the change image
        insert_paths = list(cdc.get("insert_files", []))
        delete_paths = list(cdc.get("delete_whole", []))

    sch = (
        log.table_schema(version) if log.schema_is_evolved(version) else None
    )

    def reader(paths: list[str], fixed_type: str | None) -> rd.Dataset | None:
        if not paths:
            return None
        ds = rd.read_parquet([os.path.join(root, p) for p in paths])

        def tag(t: pa.Table) -> pa.Table:
            if fixed_type is None:
                types = t[CHANGE_COL]
                t = t.drop_columns([CHANGE_COL])
            else:
                types = pa.array([fixed_type] * t.num_rows, pa.string())
            if sch is not None:
                from open_finance_lakehouse_ray.stages.evolution import conform_table

                t = conform_table(t, sch)
            t = t.append_column(CHANGE_COL, types)
            return t.append_column(
                "_commit_version", pa.array([version] * t.num_rows, pa.int64())
            )

        return ds.map_batches(tag, batch_format="pyarrow")

    parts = [
        d
        for d in (
            reader(typed_paths, None),
            reader(insert_paths, "insert"),
            reader(delete_paths, "delete"),
        )
        if d is not None
    ]
    if not parts:
        empty = (sch or log.table_schema(version) or pa.schema([])).empty_table()
        empty = empty.append_column(CHANGE_COL, pa.array([], pa.string()))
        empty = empty.append_column("_commit_version", pa.array([], pa.int64()))
        return rd.from_arrow(empty)
    out = parts[0]
    for d in parts[1:]:
        out = out.union(d)
    return out


def change_feed(
    root: str,
    *,
    from_version: int,
    to_version: int | None = None,
    key_cols: tuple[str, ...] | None = None,
    num_partitions: int = 64,
    payload: str = "auto",
    granularity: str = "net",
) -> rd.Dataset:
    """Dataset of row-level changes between two snapshots, one row per
    change with a Delta-CDF ``_change_type`` column (insert / delete /
    update_preimage / update_postimage).

    ``payload`` picks the diff's shuffle content: ``"full"`` ships whole
    rows (exact for any table, including duplicate keys); ``"hash"``
    ships (key, row-hash, side) through the all-to-all — ~5x fewer
    shuffle bytes and an integer groupby instead of a text one — then a
    second semi-join pass decorates only the CHANGED keys with their
    values. The hash path requires attested-unique keys and carries a
    ~2^-64-per-pair row-hash collision bound (a collision can only mask
    a change, never invent one). ``"auto"`` (default) uses hash when the
    diff file set exceeds ``HASH_PAYLOAD_MIN_BYTES`` and the table is
    attested unique; env ``OFLR_CDF_PAYLOAD`` overrides for parity
    testing."""
    from open_finance_lakehouse_ray.pipelines.dedup import _pk_tagger

    # resolve against the DRIVER's cwd: read tasks run with their own
    # cwd, so a relative root must be absolutized before it enters the
    # plan (and manifest paths are table-relative — join exactly once)
    root = os.path.abspath(root)
    log = TableLog(root)

    if granularity not in ("net", "commits", "auto"):
        raise ValueError(f"unknown granularity={granularity!r}")

    # pin the span end ONCE: with to_version=None every accessor below
    # (table_key_cols / files / table_schema / keys_unique) would resolve
    # the live head at ITS OWN instant, so a commit landing mid-call could
    # hand the fold a different key/schema/file set than the span it
    # diffs — the exact "later re-keying overwrite leaks into a
    # historical span" case the lazy key resolution guards against
    if to_version is None:
        to_version = log.current_version()

    def resolve_keys() -> tuple[str, ...]:
        # the net fold PAIRS rows on the table's merge key — resolve from
        # the log's recorded key metadata rather than assuming a transcript
        # default (round-4 advice: a table that merely carries
        # conv_id/turn_idx but is keyed differently would fold on the wrong
        # key, misclassifying updates as insert+delete pairs). Resolved
        # LAZILY at the point of need so an expired-span StaleTableError is
        # never masked; granularity="commits" never pairs and stays usable
        # on tables without key metadata.
        if key_cols is not None:
            return tuple(key_cols)
        # resolve at the SPAN END, not the current head — a later
        # re-keying overwrite must not leak its key into a historical
        # span's fold (review finding, round 4)
        kc = log.table_key_cols(to_version)
        if kc is None:
            raise ValueError(
                f"table at {root} records no key_cols metadata; pass the "
                "table's actual merge key (key_cols=...) for net/auto "
                "granularity, or use granularity='commits'"
            )
        return kc
    if granularity in ("commits", "auto"):
        from open_finance_lakehouse_ray.state.txlog import StaleTableError

        head = to_version  # pinned above
        span = [v for v in log.versions() if from_version < v <= head]
        # versions are dense integers; a gap means an EXPIRED commit whose
        # changes are unrecoverable — an incomplete feed must never be
        # returned silently (the net path raises the same way via
        # log.files(from_version))
        if head is not None and span != list(range(from_version + 1, head + 1)):
            raise StaleTableError(
                f"change span ({from_version}, {head}] has expired commits: "
                f"have {span}"
            )
        feeds = [commit_changes(root, v) for v in span]
        if all(f is not None for f in feeds):
            if not feeds:
                empty = (log.table_schema(head) or pa.schema([])).empty_table()
                empty = empty.append_column(CHANGE_COL, pa.array([], pa.string()))
                if granularity == "commits":
                    empty = empty.append_column(
                        "_commit_version", pa.array([], pa.int64())
                    )
                return rd.from_arrow(empty)
            out = feeds[0]
            for f in feeds[1:]:
                out = out.union(f)
            if log.schema_is_evolved(head):
                # commit_changes conforms each feed to its OWN version's
                # schema (pre-evolution commits to none at all), so a span
                # crossing an evolution commit unions heterogeneous blocks;
                # conform every event to the SPAN END's schema — exactly
                # what the computed net path does to both sides
                head_sch = log.table_schema(head)

                def conform_feed(t: pa.Table) -> pa.Table:
                    from open_finance_lakehouse_ray.stages.evolution import (
                        conform_table,
                    )

                    extras = [
                        c
                        for c in (CHANGE_COL, "_commit_version")
                        if c in t.column_names
                    ]
                    kept = {c: t[c] for c in extras}
                    t = conform_table(t.drop_columns(extras), head_sch)
                    for c in extras:
                        t = t.append_column(c, kept[c])
                    return t

                out = out.map_batches(conform_feed, batch_format="pyarrow")
            if granularity == "auto":
                # auto promises NET-DIFF semantics (schema stability: it
                # may serve either source across a consumer's polls), but
                # a key touched in several commits of the span produces
                # multiple pre/post pairs — or contradictory insert+delete
                # rows — that a net-apply consumer would mis-converge on.
                # Each commit's events are an exact multiset delta
                # (state_v = state_{v-1} − preimages/deletes +
                # postimages/inserts), so summing over the span and
                # cancelling gives the true net diff — the SAME pairing
                # problem the computed path solves, reusing its kernel
                # over the event set (O(changes) shuffle, zero file reads).
                return _net_reduce_events(
                    out, log.table_schema(head), list(resolve_keys()),
                    num_partitions,
                )
            return out
        if granularity == "commits":
            missing = [v for v, f in zip(span, feeds) if f is None]
            raise ValueError(
                f"commits granularity unavailable: versions {missing} carry "
                "no CDC marker (use granularity='net')"
            )
        # auto: fall through to the computed net diff
    # table-RELATIVE paths (file_paths() would pre-join root; joining
    # again below would double-prefix under a relative root). Manifests
    # parsed ONCE per side — path sets, the byte gate and the hashed
    # path's entry lookup all derive from these two lists.
    old_entries = log.files(from_version)
    new_entries = log.files(to_version)
    old_paths = {e.path for e in old_entries}
    new_paths = {e.path for e in new_entries}
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
    if olds is not None or news is not None:
        # resolved here — after the span/staleness checks (which must win)
        # and never for an empty diff, which pairs nothing
        key_cols = resolve_keys()
    if olds is None and news is None:
        empty = (sch or log.table_schema(to_version) or pa.schema([])).empty_table()
        empty = empty.append_column(CHANGE_COL, pa.array([], pa.string()))
        return rd.from_arrow(empty)

    payload = os.environ.get("OFLR_CDF_PAYLOAD", payload)
    if payload not in ("auto", "full", "hash"):
        raise ValueError(f"unknown payload={payload!r}")
    if payload == "hash" and not log.keys_unique(to_version):
        # an EXPLICIT hash request on an ineligible table must be loud —
        # a silent downgrade would make a forced parity run compare the
        # full path against itself
        raise ValueError(
            "payload='hash' requires an attested-unique-key table "
            "(keys_unique); this table is not attested"
        )
    if payload == "auto":
        by_path = {e.path: e.bytes for e in (*old_entries, *new_entries)}
        diff_bytes = sum(by_path.get(p, 0) for p in (*old_only, *new_only))
        payload = (
            "hash"
            if diff_bytes > HASH_PAYLOAD_MIN_BYTES and log.keys_unique(to_version)
            else "full"
        )
    if payload == "hash":
        ent = {e.path: e for e in (*old_entries, *new_entries)}
        return _change_feed_hashed(
            root,
            [ent[p] for p in old_only],
            [ent[p] for p in new_only],
            sch,
            list(key_cols),
            num_partitions,
        )

    unioned = olds.union(news) if olds and news else (olds or news)
    tagged = unioned.map_batches(
        _pk_tagger(tuple(key_cols), num_partitions), batch_format="pyarrow"
    )
    return tagged.groupby("_pk").map_groups(
        _diff_partition(list(key_cols)), batch_format="pandas"
    )


def _row_hash(t: pa.Table, data_cols: list[str]) -> pa.Array:
    """Deterministic 64-bit per-row digest over all data columns
    (pandas' SipHash with its fixed default key — stable across
    processes and machines). List/struct cells are pickled to bytes
    first — ``hash_pandas_object`` raises on unhashable cells."""
    df = t.select(data_cols).to_pandas()
    for c in _unhashable_cols(df, list(df.columns)):
        df[c] = df[c].map(
            lambda v: None if v is None else pickle.dumps(v, protocol=4)
        )
    h = pd.util.hash_pandas_object(df, index=False).to_numpy()
    return pa.array(h.view("int64"))


def _change_feed_hashed(
    root: str,
    old_entries: list,
    new_entries: list,
    sch,
    key_cols: list[str],
    num_partitions: int,
) -> rd.Dataset:
    """Two-phase hash-reduced diff (unique-key tables):

    1. ship only (key, row_hash, side) through the bounded shuffle and
       run the same pairing logic — output is the changed KEYS with
       their change types and row hashes (small: O(changes));
    2. broadcast that verdict table (`ray.put`, size-guard inherited
       from the caller's byte gate) and semi-join each side's files
       against its half (old side decorates delete/update_preimage,
       new side insert/update_postimage) to attach full row values —
       reading ONLY files whose manifest key range contains a changed
       key (on a z-clustered table the second pass touches the few
       files the changes live in, not the whole diff set).

    Every stage streams; the only driver materialization is the verdict
    table, which is proportional to the CHANGES, not the table.
    """
    import numpy as np
    import ray

    from open_finance_lakehouse_ray.pipelines.dedup import _pk_tagger

    def hash_reader(paths: list[str], side: int) -> rd.Dataset | None:
        if not paths:
            return None
        ds = rd.read_parquet([os.path.join(root, p) for p in paths])

        def slim(t: pa.Table) -> pa.Table:
            if sch is not None:
                from open_finance_lakehouse_ray.stages.evolution import conform_table

                t = conform_table(t, sch)
            data_cols = list(t.column_names)
            out = t.select(key_cols)
            out = out.append_column("_rh", _row_hash(t, data_cols))
            return out.append_column(
                "_side", pa.array([side] * t.num_rows, pa.int64())
            )

        return ds.map_batches(slim, batch_format="pyarrow")

    old_only = [e.path for e in old_entries]
    new_only = [e.path for e in new_entries]
    o = hash_reader(old_only, 0)
    n = hash_reader(new_only, 1)
    unioned = o.union(n) if o and n else (o or n)
    tagged = unioned.map_batches(
        _pk_tagger(tuple(key_cols), num_partitions), batch_format="pyarrow"
    )
    verdicts = (
        tagged.groupby("_pk")
        .map_groups(_diff_partition(key_cols), batch_format="pandas")
        .to_pandas()
    )
    # verdict halves: which (key, rh) pairs each SIDE must decorate
    old_v = verdicts[verdicts[CHANGE_COL].isin(["delete", "update_preimage"])]
    new_v = verdicts[verdicts[CHANGE_COL].isin(["insert", "update_postimage"])]
    old_ref = ray.put(old_v.reset_index(drop=True))
    new_ref = ray.put(new_v.reset_index(drop=True))

    lead = key_cols[0]

    def prune(entries: list, v: pd.DataFrame) -> list[str]:
        """Phase-2 read set: only files whose lead-key stats can contain
        one of this half's changed keys (missing stats → keep)."""
        if not len(v):
            return []
        keys = np.sort(v[lead].to_numpy())
        out = []
        for e in entries:
            st = e.stats.get(lead)
            if st is None or st[0] is None:
                out.append(e.path)
                continue
            i = np.searchsorted(keys, st[0])
            if i < len(keys) and keys[i] <= st[1]:
                out.append(e.path)
        return out

    def decorate(ref, v: pd.DataFrame, entries: list) -> rd.Dataset | None:
        paths = prune(entries, v)
        if not paths:
            return None
        ds = rd.read_parquet([os.path.join(root, p) for p in paths])

        def join(t: pa.Table) -> pa.Table:
            if sch is not None:
                from open_finance_lakehouse_ray.stages.evolution import conform_table

                t = conform_table(t, sch)
            v = ray.get(ref)
            if not len(v):
                out = t.slice(0, 0)
                return out.append_column(CHANGE_COL, pa.array([], pa.string()))
            df = t.to_pandas()
            df["_rh"] = pd.util.hash_pandas_object(df, index=False).to_numpy().view(
                "int64"
            )
            m = df.merge(v, on=key_cols + ["_rh"], how="inner", copy=False)
            m = m.drop(columns=["_rh"])
            return pa.Table.from_pandas(m, preserve_index=False)

        return ds.map_batches(join, batch_format="pyarrow")

    outs = [
        d
        for d in (
            decorate(old_ref, old_v, old_entries),
            decorate(new_ref, new_v, new_entries),
        )
        if d
    ]
    if len(outs) == 2:
        return outs[0].union(outs[1])
    if not outs:
        # real table schema for the empty feed (a fabricated one would
        # schema-mismatch consumers that union feeds across polls): the
        # snapshot schema when recorded, else any diff file's footer
        schema = sch
        if schema is None:
            src = (old_entries or new_entries)[0]
            schema = pq.read_schema(os.path.join(root, src.path))
        empty = schema.empty_table()
        return rd.from_arrow(
            empty.append_column(CHANGE_COL, pa.array([], pa.string()))
        )
    return outs[0]


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

    def __init__(
        self,
        root: str,
        checkpoint_path: str,
        *,
        start_version: int | None = None,
        key_cols: tuple[str, ...] | None = None,
    ):
        import json as _json

        self.root = root
        self.path = checkpoint_path
        # the merge key the auto-granularity net fold pairs on — MUST match
        # the table's actual key columns (a stream bronze table is keyed by
        # event_id, not a transcript default). None = resolve from the
        # table log's recorded key metadata at poll time; change_feed
        # raises if the table records none (round-4 advice: never default
        # to a transcript-specific key).
        self.key_cols = tuple(key_cols) if key_cols is not None else None
        self._json = _json
        if not os.path.exists(checkpoint_path):
            if start_version is None:
                start_version = TableLog(root).current_version()
                if start_version is None:
                    raise ValueError(f"no table at {root} and no start_version")
            self._save(start_version)

    def _save(self, version: int) -> None:
        # fsync + unique staging name (txlog's commit pattern): commit()
        # promises a DURABLE cursor, and a fixed ".tmp" would let two
        # processes sharing a checkpoint publish each other's bytes
        from open_finance_lakehouse_ray.state.txlog import _atomic_write_json

        d = os.path.dirname(self.path) or "."
        _atomic_write_json(d, self.path, {"last_version": version})

    @property
    def last_version(self) -> int:
        with open(self.path) as f:
            return int(self._json.load(f)["last_version"])

    def poll(self, granularity: str = "auto"):
        """(feed Dataset, to_version) when the table moved, else None.
        Default ``auto`` always has NET-DIFF semantics: when every commit
        in the span recorded write-time CDC the feed is folded from those
        events (no data-file reads, an O(changes) shuffle), else it is the
        computed net diff. ``granularity="commits"`` returns the raw
        per-commit events with ``_commit_version`` for ordered apply."""
        head = TableLog(self.root).current_version()
        last = self.last_version
        if head is None or head <= last:
            return None
        feed = change_feed(
            self.root, from_version=last, to_version=head,
            granularity=granularity, key_cols=self.key_cols,
        )
        return feed, head

    def commit(self, to_version: int) -> None:
        if to_version < self.last_version:
            raise ValueError("checkpoint cannot move backwards")
        self._save(to_version)
