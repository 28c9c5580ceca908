"""First-class equi-join operator — broadcast or hash-bucket, size-guarded.

The reference joins mid-size relations in SQL (quotes × instrument
registry, ``/root/reference/ofl/transform/gold/mart_di_curve_points.sql:38-42``;
quotes × OI, ``mart_futures_curve.sql:42``). Ray Data has no first-class
join at this API level, so this module provides one, Ray-Data-first:

- ``strategy="broadcast"`` — the small side is materialized IN THE OBJECT
  STORE (block refs, never the driver heap), concatenated + key-indexed by
  ONE prep task, and read by an actor pool that builds its hash index ONCE
  per actor in ``__init__`` (the stateful-stage rule); the big side then
  streams through ``map_batches`` with zero shuffle.
- ``strategy="shuffle"`` — both sides get a deterministic key-hash bucket,
  are unioned under a null-filled superset schema (union-by-name), and
  each bucket is joined independently by ``groupby(_jb).map_groups`` with
  pandas' C merge. Because the bucket is a pure function of the FULL join
  key, no key spans two buckets and per-bucket joins are globally correct
  — including FULL OUTER.
- ``strategy="auto"`` — broadcast when the right side fits
  ``broadcast_max_bytes`` (size from block metadata, no pull) and the join
  type allows it; else shuffle. ``outer`` always shuffles (an unmatched
  right row must be emitted exactly once globally, which a per-batch
  broadcast probe cannot decide).

At 100 TB: the broadcast side is shipped once per node via the object
store (tasks read it zero-copy), and the shuffle path's volume is exactly
|left| + |right| moved once — the minimum for a general equi-join.
"""

from __future__ import annotations

from typing import Iterable

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

BROADCAST_MAX_BYTES = 512 * 1024 * 1024

_JB = "_jb"
_JSRC = "_jsrc"


def _as_list(x: str | Iterable[str]) -> list[str]:
    return [x] if isinstance(x, str) else list(x)


def _key_buckets(df: pd.DataFrame, keys: list[str], num_buckets: int) -> np.ndarray:
    """Deterministic bucket per row from the full join key (pandas'
    C-implemented siphash with its fixed default key — stable across
    processes and runs, the resume/scaling determinism contract).
    Callers must present BOTH sides' keys at one common dtype first:
    hash_pandas_object is dtype-sensitive (int64 5 and float64 5.0 hash
    differently), so un-promoted sides would never co-locate."""
    h = pd.util.hash_pandas_object(df[keys].set_axis(range(len(df))), index=False)
    return (h.to_numpy() % np.uint64(num_buckets)).astype(np.int64)


def _promote_key_type(lt: pa.DataType, rt: pa.DataType) -> pa.DataType:
    """Common comparison type for one join-key column (SQL-style numeric
    promotion). Equal types pass through; mixed ints widen to int64;
    int × float compares as float64; anything else must match exactly."""
    if lt.equals(rt):
        return lt
    num = lambda t: pa.types.is_integer(t) or pa.types.is_floating(t)  # noqa: E731
    if pa.types.is_integer(lt) and pa.types.is_integer(rt):
        return pa.int64()
    if num(lt) and num(rt):
        return pa.float64()
    raise TypeError(f"incompatible join key types: {lt} vs {rt}")


def _default_num_buckets() -> int:
    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    return max(8, 2 * cpus)


@ray.remote
def _prep_right(refs: list, right_on: list[str], columns: list[str] | None):
    """Concat the broadcast side's blocks in a task (driver never holds
    the payload); returns the pandas frame that the joiner actors index."""
    tables = [t for t in ray.get(list(refs)) if t.num_rows > 0]
    if not tables:
        return None
    t = pa.concat_tables(tables)
    if columns:
        keep = list(dict.fromkeys(right_on + columns))
        t = t.select([c for c in keep if c in t.column_names])
    return t.to_pandas()


class _BroadcastJoiner:
    """Actor-pool stage: fetch + index the broadcast side ONCE per actor
    (``__init__``), then stream left batches through pandas' hash join."""

    def __init__(self, right_ref, left_on, right_on, how, suffix, r_names):
        rdf = ray.get(right_ref)
        if rdf is None:
            rdf = pd.DataFrame({c: [] for c in r_names})
        elif len(rdf):
            # SQL semantics: NULL keys never match (pandas would NaN==NaN)
            rdf = rdf[~rdf[right_on].isna().any(axis=1)]
        self.right = rdf
        self.left_on = left_on
        self.right_on = right_on
        self.how = how
        self.suffix = suffix

    def __call__(self, batch: pa.Table) -> pd.DataFrame:
        ldf = batch.to_pandas()
        if self.how in ("semi", "anti"):
            rk = self.right[self.right_on].drop_duplicates()
            m = ldf.merge(
                rk, how="left", left_on=self.left_on, right_on=self.right_on,
                indicator=True, suffixes=("", self.suffix),
            )
            mask = m["_merge"] == "both" if self.how == "semi" else m["_merge"] == "left_only"
            return m[mask][ldf.columns.tolist()]
        return ldf.merge(
            self.right, how=self.how, left_on=self.left_on,
            right_on=self.right_on, suffixes=("", self.suffix),
        )


def join(
    left: rd.Dataset,
    right: rd.Dataset,
    on: str | list[str],
    *,
    right_on: str | list[str] | None = None,
    how: str = "inner",
    right_columns: list[str] | None = None,
    strategy: str = "auto",
    num_buckets: int | None = None,
    broadcast_max_bytes: int = BROADCAST_MAX_BYTES,
    suffix: str = "_r",
) -> rd.Dataset:
    """Equi-join two Datasets on key columns. ``how`` ∈ inner | left |
    outer | semi | anti (semi/anti return left columns only). Overlapping
    non-key right columns get ``suffix``. Returns a streaming Dataset."""
    left_on = _as_list(on)
    r_on = _as_list(right_on) if right_on is not None else left_on
    if how not in ("inner", "left", "outer", "semi", "anti"):
        raise ValueError(f"unsupported how={how!r}")

    if strategy == "auto":
        if how == "outer":
            strategy = "shuffle"
        else:
            mat = right.materialize()
            strategy = (
                "broadcast"
                if (mat.size_bytes() or 0) <= broadcast_max_bytes
                else "shuffle"
            )
            right = mat

    if strategy == "broadcast":
        if how == "outer":
            raise ValueError("outer join requires the shuffle strategy")
        mat = right.materialize()  # no-op if auto already materialized it
        right_ref = _prep_right.remote(mat.to_arrow_refs(), r_on, right_columns)
        schema = mat.schema()
        r_names = list(schema.names) if schema is not None else list(r_on)
        if right_columns:
            keep = set(r_on) | set(right_columns)
            r_names = [c for c in r_names if c in keep]
        return left.map_batches(
            _BroadcastJoiner,
            fn_constructor_args=(right_ref, left_on, r_on, how, suffix, r_names),
            batch_format="pyarrow",
            concurrency=(1, 8),
        )

    # ---------------- shuffle: hash-bucket both sides, join per bucket
    nb = num_buckets or _default_num_buckets()
    if right_columns is not None:
        right = right.select_columns(list(dict.fromkeys(r_on + right_columns)))

    l_schema = left.schema()
    r_schema = right.schema()
    # Ray drops the schema of an EMPTY dataset entirely (an empty
    # pandas-sourced Dataset reports schema()=None after any reshuffle),
    # so an empty side's non-key columns are unknowable here. Degrade per
    # join semantics instead of crashing: the empty side contributes no
    # rows, and for the one case whose output still has rows (outer with
    # the OTHER side live) the unknowable columns are omitted —
    # documented, pinned by tests/test_join.py::test_empty_sides. The
    # guard lives HERE (shuffle path only) because the schema fetch is
    # mandatory for the plan anyway; the broadcast path handles empty
    # sides naturally (no batches / empty lookup) with zero extra probes.
    if l_schema is None:
        if how == "outer":
            ren_keys = dict(zip(r_on, left_on))
            return right.map_batches(
                lambda t: t.rename_columns(
                    [ren_keys.get(c, c) for c in t.column_names]
                ),
                batch_format="pyarrow",
            )
        return left  # inner/left/semi/anti of an empty left are empty
    if r_schema is None:
        if how in ("inner", "semi"):
            return right  # empty
        return left  # left/anti/outer keep every left row unchanged
    l_cols = list(l_schema.names)
    r_cols = [c for c in r_schema.names]
    # right key columns are renamed onto the left key names; the remaining
    # right columns keep their names unless they collide (then suffixed)
    ren = dict(zip(r_on, left_on))
    for c in r_cols:
        if c not in ren:
            ren[c] = c + suffix if c in l_cols else c
    def _arrow_type(t) -> pa.DataType:
        # ray.data Schema.types mixes pyarrow types (arrow-backed blocks)
        # with numpy dtypes / python classes (pandas-backed blocks)
        if isinstance(t, pa.DataType):
            return t
        try:
            return pa.from_numpy_dtype(t)
        except (pa.ArrowNotImplementedError, TypeError):
            return pa.string()

    r_out = [ren[c] for c in r_cols]
    r_types = {ren[c]: _arrow_type(t) for c, t in zip(r_schema.names, r_schema.types)}
    l_types = {c: _arrow_type(t) for c, t in zip(l_schema.names, l_schema.types)}
    all_cols = l_cols + [c for c in r_out if c not in l_cols]
    all_types = {**r_types, **l_types}  # left wins for shared key columns
    # join keys compare at ONE promoted type on both sides — the bucket
    # hash and pandas merge are both dtype-sensitive
    for k in left_on:
        all_types[k] = _promote_key_type(l_types[k], r_types.get(k, l_types[k]))

    def widen(src: int):
        def _w(t: pa.Table) -> pa.Table:
            if src == 1:
                t = t.rename_columns([ren[c] for c in t.column_names])
            for k in left_on:  # cast keys to the promoted comparison type
                i = t.column_names.index(k)
                if not t.schema.field(i).type.equals(all_types[k]):
                    t = t.set_column(i, k, t[i].cast(all_types[k]))
            b = _key_buckets(t.select(left_on).to_pandas(), left_on, nb)
            cols = {}
            for c in all_cols:
                cols[c] = (
                    t[t.column_names.index(c)] if c in t.column_names
                    else pa.nulls(t.num_rows, all_types[c])
                )
            out = pa.table(cols)
            out = out.append_column(_JB, pa.array(b, pa.int64()))
            return out.append_column(
                _JSRC, pa.array(np.full(t.num_rows, src, dtype=np.int8))
            )

        return _w

    unioned = left.map_batches(widen(0), batch_format="pyarrow").union(
        right.map_batches(widen(1), batch_format="pyarrow")
    )

    r_only = [c for c in r_out if c not in l_cols]
    l_only = [c for c in l_cols if c not in left_on]

    # the union's null-fill widens pandas dtypes (int64+null -> float64);
    # each side is null-free in ITS OWN columns, so cast back before the
    # merge — only legitimate join nulls remain in the output
    def _pd_casts(cols: list[str]) -> dict:
        out = {}
        for c in cols:
            try:
                out[c] = all_types[c].to_pandas_dtype()
            except (NotImplementedError, TypeError):
                pass
        return out

    l_cast = _pd_casts(left_on + l_only)
    r_cast = _pd_casts(left_on + r_only)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        lg = g[g[_JSRC] == 0][left_on + l_only].astype(l_cast, copy=False)
        rg = g[g[_JSRC] == 1][left_on + r_only].astype(r_cast, copy=False)
        # SQL equi-join semantics: a NULL key never matches anything —
        # pandas merge would match NaN with NaN. Null-key right rows can
        # only ever surface as OUTER unmatched; null-key left rows flow
        # through left/anti/outer as unmatched naturally once the right
        # nulls are gone.
        rg_null = rg[rg[left_on].isna().any(axis=1)] if len(rg) else rg
        rg = rg.drop(rg_null.index)
        if how in ("semi", "anti"):
            m = lg.merge(
                rg[left_on].drop_duplicates(), how="left", on=left_on,
                indicator=True,
            )
            mask = m["_merge"] == "both" if how == "semi" else m["_merge"] == "left_only"
            return m[mask][left_on + l_only]
        if how == "outer":
            lg_null = lg[lg[left_on].isna().any(axis=1)] if len(lg) else lg
            out = lg.drop(lg_null.index).merge(rg, how="outer", on=left_on)
            return pd.concat([out, lg_null, rg_null], ignore_index=True)
        return lg.merge(rg, how=how, on=left_on)

    return unioned.groupby(_JB).map_groups(per_bucket, batch_format="pandas")


def asof_join(
    left: rd.Dataset,
    right: rd.Dataset,
    *,
    on: str,
    by: str | list[str],
    direction: str = "backward",
    tolerance=None,
    allow_exact_matches: bool = True,
    right_tiebreak: list[str] | None = None,
    suffix: str = "_r",
    num_buckets: int | None = None,
) -> rd.Dataset:
    """First-class as-of join (J4's bracketing lookup,
    ``/root/reference/ofl/transform/gold/mart_di_curve_points.sql:47-115``,
    generalized): for every left row, the nearest right row in the same
    ``by`` group whose ``on`` value is at-or-before (``backward``),
    at-or-after (``forward``) or closest (``nearest``) — optionally within
    ``tolerance`` and optionally excluding exact ties
    (``allow_exact_matches=False``).

    Distributed shape: both sides hash-bucket on the ``by`` key only (the
    ``on`` ordering column must NOT enter the bucket hash — a group's rows
    co-locate as a unit), union under a null-filled superset schema, and
    each bucket runs pandas' C ``merge_asof`` after an in-partition sort.
    The partitioning assumption (documented per the custom-operator rule):
    one ``by`` group must fit in a task partition — the same bound every
    keyed ``map_groups`` in this engine carries.

    Semantics: left rows always survive (LEFT as-of); right rows with a
    NULL ``by`` or ``on`` key can never match; left rows with a NULL key
    survive unmatched. Equal-``on`` right rows are an engine-dependent
    pick unless ``right_tiebreak`` names columns — then the LAST row under
    a stable ``[on] + right_tiebreak`` sort wins deterministically.
    """
    by = _as_list(by)
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unsupported direction={direction!r}")
    nb = num_buckets or _default_num_buckets()
    keys = by + [on]

    l_schema = left.schema()
    r_schema = right.schema()
    if l_schema is None:  # empty left: as-of is left-shaped -> empty
        return left
    if r_schema is None:  # empty right: every left row unmatched
        return left
    l_cols = list(l_schema.names)
    r_cols = list(r_schema.names)
    ren = {
        c: (c if c in keys else (c + suffix if c in l_cols else c))
        for c in r_cols
    }
    r_out = [ren[c] for c in r_cols]

    def _arrow_type(t) -> pa.DataType:
        if isinstance(t, pa.DataType):
            return t
        try:
            return pa.from_numpy_dtype(t)
        except (pa.ArrowNotImplementedError, TypeError):
            return pa.string()

    r_types = {ren[c]: _arrow_type(t) for c, t in zip(r_schema.names, r_schema.types)}
    l_types = {c: _arrow_type(t) for c, t in zip(l_schema.names, l_schema.types)}
    all_cols = l_cols + [c for c in r_out if c not in l_cols]
    all_types = {**r_types, **l_types}
    for k in keys:
        all_types[k] = _promote_key_type(l_types[k], r_types.get(k, l_types[k]))

    def widen(src: int):
        def _w(t: pa.Table) -> pa.Table:
            if src == 1:
                t = t.rename_columns([ren[c] for c in t.column_names])
            for k in keys:
                i = t.column_names.index(k)
                if not t.schema.field(i).type.equals(all_types[k]):
                    t = t.set_column(i, k, t[i].cast(all_types[k]))
            b = _key_buckets(t.select(by).to_pandas(), by, nb)
            cols = {
                c: (t[t.column_names.index(c)] if c in t.column_names
                    else pa.nulls(t.num_rows, all_types[c]))
                for c in all_cols
            }
            out = pa.table(cols).append_column(_JB, pa.array(b, pa.int64()))
            return out.append_column(
                _JSRC, pa.array(np.full(t.num_rows, src, dtype=np.int8))
            )

        return _w

    unioned = left.map_batches(widen(0), batch_format="pyarrow").union(
        right.map_batches(widen(1), batch_format="pyarrow")
    )

    r_val = [c for c in r_out if c not in keys]
    l_only = [c for c in l_cols if c not in keys]
    tiebreak = [ren.get(c, c) for c in (right_tiebreak or [])]

    def _pd_casts(cols: list[str]) -> dict:
        out = {}
        for c in cols:
            try:
                out[c] = all_types[c].to_pandas_dtype()
            except (NotImplementedError, TypeError):
                pass
        return out

    l_cast = _pd_casts(keys + l_only)
    r_cast = _pd_casts(keys + r_val)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        lg = g[g[_JSRC] == 0][l_cols].astype(l_cast, copy=False)
        rg = g[g[_JSRC] == 1][keys + r_val].astype(r_cast, copy=False)
        rg = rg.dropna(subset=keys)  # unmatchable by definition
        lg_null = lg[lg[keys].isna().any(axis=1)] if len(lg) else lg
        lg_ok = lg.drop(lg_null.index)
        if len(lg_ok) and len(rg):
            m = pd.merge_asof(
                lg_ok.sort_values(on, kind="mergesort"),
                rg.sort_values([on] + tiebreak, kind="mergesort"),
                on=on,
                by=by,
                direction=direction,
                tolerance=tolerance,
                allow_exact_matches=allow_exact_matches,
            )
        else:
            m = lg_ok
        return pd.concat([m, lg_null], ignore_index=True).reindex(
            columns=all_cols
        )

    return unioned.groupby(_JB).map_groups(per_bucket, batch_format="pandas")
