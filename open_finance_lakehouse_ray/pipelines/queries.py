"""Driver-facing query registry: every implemented operator/pipeline from
SURVEY.md §2 as a callable over the testdata tables, paired (where the
semantics are SQL-expressible) with a DuckDB oracle string computing the
same result with the same column names — the correctness gate.

The transcript-maintenance queries derive a transcript table from
``lineitem`` deterministically (both in Ray and in SQL), then run REAL
maintenance — ingest as small files, compact, Z-order, MERGE, expire —
against a scratch table under /tmp and return the post-maintenance scan.
The SQL oracle computes the expected scan straight from the parquet, so
"maintenance never changes query results" is machine-checked by the
driver at sf=0.01.
"""

from __future__ import annotations

import os
import tempfile

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

# --------------------------------------------------------------------------
# transcript construction from lineitem (deterministic, mirrored in SQL)
# --------------------------------------------------------------------------

TX_CONSTRUCT_SQL = """
    SELECT 'conv-' || lpad(CAST(l_orderkey AS VARCHAR), 10, '0') AS conv_id,
           CAST(l_linenumber AS INTEGER) AS turn_idx,
           CASE WHEN l_linenumber % 2 = 1 THEN 'user' ELSE 'assistant' END AS role,
           'conv-' || lpad(CAST(l_orderkey AS VARCHAR), 10, '0') || ':' ||
               CAST(l_linenumber AS VARCHAR) || ':' || l_returnflag || ':' ||
               CAST(CAST(l_quantity AS BIGINT) AS VARCHAR) AS text,
           CAST(NULL AS VARCHAR) AS tool,
           l_shipdate AS ts
    FROM lineitem
"""

# latest-wins dedup (keys are NOT unique in lineitem): max ts, then max text
TX_DEDUP_SQL = f"""
    SELECT conv_id, turn_idx, role, text, tool, ts FROM ({TX_CONSTRUCT_SQL})
    QUALIFY row_number() OVER (
        PARTITION BY conv_id, turn_idx ORDER BY ts DESC, text DESC) = 1
"""


def _round_half_away(x, n: int):
    """DuckDB-compatible ROUND (half away from zero) for pandas/numpy —
    numpy/pandas .round is half-even and diverges on .5 boundaries."""
    f = 10.0 ** n
    return np.sign(x) * np.floor(np.abs(x) * f + 0.5) / f


def _keyed_partitions(ds, key_cols, part_fn, num_partitions: int = 64):
    """Hash-partition by ``key_cols`` into a BOUNDED group count and run
    ``part_fn`` once per PARTITION — vectorized pandas over all the keys
    that landed there — instead of once per distinct key. A raw
    ``groupby(key).map_groups`` is one Python call per key: at millions
    of users that per-group overhead dominates (the measured finding in
    docs/PERF.md #4; same partition trick as ``dedup._collision_groups``)."""
    from open_finance_lakehouse_ray.pipelines.dedup import _pk_tagger

    tagged = ds.map_batches(
        _pk_tagger(tuple(key_cols), num_partitions), batch_format="pyarrow"
    )

    def run(df: pd.DataFrame) -> pd.DataFrame:
        return part_fn(df.drop(columns=["_pk"]))

    return tagged.groupby("_pk").map_groups(run, batch_format="pandas")


def _mod(arr: pa.Array | pa.ChunkedArray, m: int) -> pa.Array:
    """Arrow has no modulo kernel (pyarrow 16) — hop through numpy."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    return pa.array(arr.to_numpy(zero_copy_only=False).astype(np.int64) % m)


def transcripts_from_lineitem(sf_dir: str) -> rd.Dataset:
    """Ray mirror of TX_CONSTRUCT_SQL — vectorized Arrow kernels only."""
    ds = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_linenumber", "l_returnflag", "l_quantity", "l_shipdate"],
    )

    def build(t: pa.Table) -> pa.Table:
        okey = pc.utf8_lpad(pc.cast(t["l_orderkey"], pa.string()), 10, "0")
        conv = pc.binary_join_element_wise("conv-", okey, "")
        turn = pc.cast(t["l_linenumber"], pa.int32())
        role = pc.if_else(
            pc.equal(_mod(t["l_linenumber"], 2), 1),
            pa.scalar("user"),
            pa.scalar("assistant"),
        )
        text = pc.binary_join_element_wise(
            conv,
            pc.cast(turn, pa.string()),
            t["l_returnflag"],
            pc.cast(pc.cast(t["l_quantity"], pa.int64()), pa.string()),
            ":",
        )
        return pa.table(
            {
                "conv_id": conv,
                "turn_idx": turn,
                "role": role,
                "text": text,
                "tool": pa.nulls(t.num_rows, pa.string()),
                "ts": t["l_shipdate"],
            }
        )

    return ds.map_batches(build, batch_format="pyarrow")


def _scratch_root(tag: str) -> str:
    return tempfile.mkdtemp(prefix=f"oflr-{tag}-")


def _scan_sorted(root: str) -> pa.Table:
    from open_finance_lakehouse_ray.pipelines.scan import validation_scan

    return validation_scan(root)


def _scan_and_cleanup(root: str) -> pa.Table:
    """Materialize the validation scan, then remove the scratch table so
    repeated gate runs don't accumulate /tmp debris."""
    import shutil

    try:
        return _scan_sorted(root)
    finally:
        shutil.rmtree(root, ignore_errors=True)


# --------------------------------------------------------------------------
# flagship maintenance queries
# --------------------------------------------------------------------------


def q_tx_maintenance_roundtrip(sf_dir: str) -> pa.Table:
    """ingest(dedup'd, small files) → compact → zorder → scan. The scan
    must equal the oracle construction — maintenance changes nothing."""
    from open_finance_lakehouse_ray.pipelines.compact import compact
    from open_finance_lakehouse_ray.pipelines.ingest import ingest_dataset
    from open_finance_lakehouse_ray.pipelines.merge import dedup_exact
    from open_finance_lakehouse_ray.pipelines.zorder import zorder

    root = _scratch_root("roundtrip")
    tx = dedup_exact(transcripts_from_lineitem(sf_dir), num_buckets=16)
    ingest_dataset(tx.repartition(24), root, job_id="rt-ingest", summary={"keys_unique": True, "key_cols": ["conv_id", "turn_idx"]})
    compact(root, job_id="rt-compact", target_bytes=8 * 1024 * 1024)
    zorder(root, job_id="rt-zorder")
    return _scan_and_cleanup(root)


Q_TX_ROUNDTRIP_SQL = f"SELECT * FROM ({TX_DEDUP_SQL}) ORDER BY conv_id, turn_idx"


MERGE_UPDATES_SQL = f"""
    SELECT conv_id, turn_idx, role,
           'UPD:' || conv_id || ':' || CAST(turn_idx AS VARCHAR) AS text,
           tool, ts + INTERVAL 40 DAY AS ts
    FROM ({TX_DEDUP_SQL}) WHERE CAST(substr(conv_id, 6) AS BIGINT) % 7 = 0 AND turn_idx <= 2
"""
MERGE_INSERTS_SQL = f"""
    SELECT conv_id, 900 + turn_idx AS turn_idx, role,
           'INS:' || conv_id || ':' || CAST(900 + turn_idx AS VARCHAR) AS text,
           tool, ts + INTERVAL 40 DAY AS ts
    FROM ({TX_DEDUP_SQL}) WHERE CAST(substr(conv_id, 6) AS BIGINT) % 13 = 0
"""
MERGE_STALE_SQL = f"""
    SELECT conv_id, turn_idx, role, 'STALE-MUST-NOT-APPEAR' AS text,
           tool, ts - INTERVAL 40 DAY AS ts
    FROM ({TX_DEDUP_SQL}) WHERE CAST(substr(conv_id, 6) AS BIGINT) % 11 = 0 AND turn_idx = 1
"""


def _merge_updates(tx: rd.Dataset) -> rd.Dataset:
    """Ray mirror of the three MERGE source slices above."""

    def build(t: pa.Table) -> pa.Table:
        # trailing digits of conv_id = the order key (robust to replica
        # prefixes like "r3-conv-…" used by bench scaling)
        okey = pc.cast(
            pc.struct_field(
                pc.extract_regex(t["conv_id"], r"(?P<okey>[0-9]+)$"), "okey"
            ),
            pa.int64(),
        )
        turn = t["turn_idx"]
        day40 = 40 * 86_400_000_000

        def shift(ts, us):
            return pc.cast(pc.add(pc.cast(ts, pa.int64()), us), pa.timestamp("us"))

        upd_mask = pc.and_(pc.equal(_mod(okey, 7), 0), pc.less_equal(turn, 2))
        upd = t.filter(upd_mask)
        upd_text = pc.binary_join_element_wise(
            "UPD:", upd["conv_id"], ":", pc.cast(upd["turn_idx"], pa.string()), ""
        )
        upd_t = pa.table(
            {
                "conv_id": upd["conv_id"],
                "turn_idx": upd["turn_idx"],
                "role": upd["role"],
                "text": upd_text,
                "tool": upd["tool"],
                "ts": shift(upd["ts"], day40),
            }
        )

        ins = t.filter(pc.equal(_mod(okey, 13), 0))
        ins_turn = pc.cast(pc.add(ins["turn_idx"], 900), pa.int32())
        ins_text = pc.binary_join_element_wise(
            "INS:", ins["conv_id"], ":", pc.cast(ins_turn, pa.string()), ""
        )
        ins_t = pa.table(
            {
                "conv_id": ins["conv_id"],
                "turn_idx": ins_turn,
                "role": ins["role"],
                "text": ins_text,
                "tool": ins["tool"],
                "ts": shift(ins["ts"], day40),
            }
        )

        stale = t.filter(pc.and_(pc.equal(_mod(okey, 11), 0), pc.equal(turn, 1)))
        stale_t = pa.table(
            {
                "conv_id": stale["conv_id"],
                "turn_idx": stale["turn_idx"],
                "role": stale["role"],
                "text": pa.array(
                    ["STALE-MUST-NOT-APPEAR"] * stale.num_rows, type=pa.string()
                ),
                "tool": stale["tool"],
                "ts": shift(stale["ts"], -day40),
            }
        )
        return pa.concat_tables([upd_t, ins_t, stale_t])

    return tx.map_batches(build, batch_format="pyarrow")


def q_tx_merge_upsert(sf_dir: str) -> pa.Table:
    """Full MERGE INTO: base table on disk, late-turn updates/inserts/
    stale-duplicates upserted, post-merge scan returned."""
    from open_finance_lakehouse_ray.pipelines.ingest import ingest_dataset
    from open_finance_lakehouse_ray.pipelines.merge import dedup_exact, merge_into

    root = _scratch_root("merge")
    tx = dedup_exact(transcripts_from_lineitem(sf_dir), num_buckets=16)
    ingest_dataset(tx.repartition(24), root, job_id="mg-ingest", summary={"keys_unique": True, "key_cols": ["conv_id", "turn_idx"]})
    updates = _merge_updates(dedup_exact(transcripts_from_lineitem(sf_dir), num_buckets=16))
    merge_into(root, updates, job_id="mg-merge", num_buckets=16)
    return _scan_and_cleanup(root)


Q_TX_MERGE_SQL = f"""
    WITH base AS ({TX_DEDUP_SQL}),
    unioned AS (
        SELECT *, 0 AS _src FROM base
        UNION ALL SELECT *, 1 AS _src FROM ({MERGE_UPDATES_SQL})
        UNION ALL SELECT *, 1 AS _src FROM ({MERGE_INSERTS_SQL})
        UNION ALL SELECT *, 1 AS _src FROM ({MERGE_STALE_SQL})
    )
    SELECT conv_id, turn_idx, role, text, tool, ts FROM unioned
    QUALIFY row_number() OVER (
        PARTITION BY conv_id, turn_idx
        ORDER BY ts DESC, _src DESC, text DESC) = 1
    ORDER BY conv_id, turn_idx
"""


def q_tx_expire_invariance(sf_dir: str) -> pa.Table:
    """ingest → compact → expire(force) → scan: vacuuming history must not
    change the scan (and the deleted pre-compaction files must not be
    needed)."""
    from open_finance_lakehouse_ray.pipelines.compact import compact
    from open_finance_lakehouse_ray.pipelines.expire import expire
    from open_finance_lakehouse_ray.pipelines.ingest import ingest_dataset
    from open_finance_lakehouse_ray.pipelines.merge import dedup_exact

    root = _scratch_root("expire")
    tx = dedup_exact(transcripts_from_lineitem(sf_dir), num_buckets=16)
    ingest_dataset(tx.repartition(24), root, job_id="ex-ingest", summary={"keys_unique": True, "key_cols": ["conv_id", "turn_idx"]})
    compact(root, job_id="ex-compact", target_bytes=8 * 1024 * 1024)
    expire(root, keep_last=1, force=True)
    return _scan_and_cleanup(root)


def q_tx_key_metrics(sf_dir: str) -> pa.Table:
    """A8 reconciliation report over the RAW constructed transcripts
    (duplicate keys present by construction): rows, distinct keys,
    duplicates, ts range — distributed bucketed exact count."""
    from open_finance_lakehouse_ray.functions.hashing import add_bucket_column

    tx = transcripts_from_lineitem(sf_dir)
    tagged = tx.map_batches(
        lambda t: add_bucket_column(t, 16), batch_format="pyarrow"
    )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "r": [len(g)],
                "d": [g.drop_duplicates(["conv_id", "turn_idx"]).shape[0]],
                "lo": [g["ts"].min()],
                "hi": [g["ts"].max()],
            }
        )

    parts = (
        tagged.groupby("_bucket").map_groups(per_bucket, batch_format="pandas").to_pandas()
    )
    return pa.table(
        {
            "n_rows": [int(parts["r"].sum())],
            "distinct_keys": [int(parts["d"].sum())],
            "duplicate_keys": [int(parts["r"].sum() - parts["d"].sum())],
            "min_ts": [parts["lo"].min().to_pydatetime()],
            "max_ts": [parts["hi"].max().to_pydatetime()],
        }
    )


Q_TX_METRICS_SQL = f"""
    SELECT COUNT(*) AS n_rows,
           COUNT(DISTINCT conv_id || '#' || CAST(turn_idx AS VARCHAR)) AS distinct_keys,
           COUNT(*) - COUNT(DISTINCT conv_id || '#' || CAST(turn_idx AS VARCHAR)) AS duplicate_keys,
           MIN(ts) AS min_ts, MAX(ts) AS max_ts
    FROM ({TX_CONSTRUCT_SQL})
"""


# --------------------------------------------------------------------------
# events-table operators (A1/A3/A4/A5/A6, J4, M8, A8 analogs)
# --------------------------------------------------------------------------

MINUTE_US = 60_000_000


def _events(sf_dir: str, columns=None) -> rd.Dataset:
    return rd.read_parquet(os.path.join(sf_dir, "events.parquet"), columns=columns)


def _ohlc_partial_df(df: "pd.DataFrame", *, presorted: bool = False) -> "pd.DataFrame":
    """Per-batch PARTIAL bars over a frame that already carries
    ``window_start`` (epoch-us int) — shared by the tumbling and hopping
    OHLC queries so the deterministic open/close rule lives once.

    open/close are the PHYSICAL first/last row's value (drop_duplicates
    on the sorted frame), matching the SQL oracle's
    ``rn=1``-row semantics exactly — pandas groupby ``first()``/``last()``
    would silently skip a NULL value and diverge from the oracle on
    nullable data."""
    keys = ["event_type", "window_start"]
    if not presorted:
        df = df.sort_values(["ts", "event_id"], kind="mergesort")
    first = (
        df.drop_duplicates(keys, keep="first")
        .set_index(keys)[["value", "ts", "event_id"]]
        .rename(columns={"value": "open", "ts": "_first_key",
                         "event_id": "_first_id"})
    )
    last = (
        df.drop_duplicates(keys, keep="last")
        .set_index(keys)[["value", "ts", "event_id"]]
        .rename(columns={"value": "close", "ts": "_last_key",
                         "event_id": "_last_id"})
    )
    agg = df.groupby(keys, sort=False).agg(
        high=("value", "max"),
        low=("value", "min"),
        volume=("value", "sum"),
        n_events=("value", "size"),
    )
    out = agg.join(first).join(last).reset_index()
    return out[keys + ["open", "close", "high", "low", "volume", "n_events",
                       "_first_key", "_last_key", "_first_id", "_last_id"]]


def _ohlc_add_coarse_bucket(t: pa.Table) -> pa.Table:
    # many tiny (type, window) groups → Python-per-group map_groups is
    # the slow shape; shuffle on a COARSE bucket instead and merge all
    # of a bucket's windows vectorized in one pandas pass
    wb = (
        t["window_start"].to_numpy(zero_copy_only=False).astype(np.int64)
        // MINUTE_US
        % 32
    )
    return t.append_column("_wb", pa.array(wb))


def _ohlc_final_merge(g: "pd.DataFrame") -> "pd.DataFrame":
    keys = ["event_type", "window_start"]
    # physical first/last partial (drop_duplicates), NOT groupby
    # first()/last() — those skip NaN and would diverge from the SQL
    # oracle when a window's earliest/latest value is NULL
    opn = (
        g.sort_values(["_first_key", "_first_id"], kind="mergesort")
        .drop_duplicates(keys, keep="first")
        .set_index(keys)["open"]
    )
    cls = (
        g.sort_values(["_last_key", "_last_id"], kind="mergesort")
        .drop_duplicates(keys, keep="last")
        .set_index(keys)["close"]
    )
    agg = g.groupby(keys, sort=False).agg(
        high=("high", "max"),
        low=("low", "min"),
        volume=("volume", "sum"),
        n_events=("n_events", "sum"),
    )
    out = (
        agg.join(opn.rename("open"))
        .join(cls.rename("close"))
        .reset_index()
    )
    out["volume"] = _round_half_away(out["volume"], 2)
    out["n_events"] = out["n_events"].astype("int64")
    return out[
        ["event_type", "window_start", "open", "high", "low", "close",
         "volume", "n_events"]
    ]


def q_ev_ohlc_1m(sf_dir: str) -> pa.Table:
    """Event-time 1-minute OHLC bars per event_type — the A1 windowed
    aggregate (``ofl/streaming/silver.py:107-140``) with deterministic
    open/close via (ts, event_id) min_by/max_by. Scalable shape:
    per-batch PARTIAL bars (shrinks the shuffle to one row per
    (type, window) per batch), then a small grouped merge."""
    ds = _events(sf_dir, ["event_id", "ts", "event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df["window_start"] = (
            df["ts"].astype("int64") // MINUTE_US * MINUTE_US
        )
        return pa.Table.from_pandas(_ohlc_partial_df(df), preserve_index=False)

    bars = (
        ds.map_batches(partial, batch_format="pyarrow")
        .map_batches(_ohlc_add_coarse_bucket, batch_format="pyarrow")
        .groupby("_wb")
        .map_groups(_ohlc_final_merge, batch_format="pandas")
        .to_pandas()
    )
    bars["window_start"] = pd.to_datetime(bars["window_start"], unit="us")
    bars = bars.sort_values(["event_type", "window_start"])
    return pa.Table.from_pandas(bars, preserve_index=False)


Q_EV_OHLC_SQL = """
    WITH w AS (
        SELECT *, make_timestamp(epoch_us(ts) // 60000000 * 60000000) AS window_start,
               row_number() OVER (PARTITION BY event_type,
                   epoch_us(ts) // 60000000 ORDER BY ts, event_id) AS rn_a,
               row_number() OVER (PARTITION BY event_type,
                   epoch_us(ts) // 60000000 ORDER BY ts DESC, event_id DESC) AS rn_d
        FROM events
    )
    SELECT event_type, window_start,
           MAX(CASE WHEN rn_a = 1 THEN value END) AS open,
           MAX(value) AS high, MIN(value) AS low,
           MAX(CASE WHEN rn_d = 1 THEN value END) AS close,
           ROUND(SUM(value), 2) AS volume,
           COUNT(*) AS n_events
    FROM w GROUP BY event_type, window_start
    ORDER BY event_type, window_start
"""


def q_ev_ohlc_hopping(sf_dir: str) -> pa.Table:
    """HOPPING-window OHLC: 5-minute windows advancing every minute (each
    event belongs to 5 overlapping windows) — the sliding/hopping member
    of the windowed-aggregate family the tumbling A1 bars don't cover.
    Distributed shape: a vectorized 5× expansion inside ``map_batches``
    (np.repeat + tiled offsets, no per-row Python) feeds the SAME shared
    partial-bar / coarse-bucket / vectorized-merge kernels as the
    tumbling query."""
    HOP = 5
    ds = _events(sf_dir, ["event_id", "ts", "event_type", "value"])

    def expand_partial(t: pa.Table) -> pa.Table:
        # sort BEFORE the 5x repeat: index.repeat preserves row order and
        # each window holds at most one copy per event, so the expanded
        # frame is already (ts, event_id)-sorted — one n-row sort instead
        # of a 5n-row sort in the hot path
        df = t.to_pandas().sort_values(["ts", "event_id"], kind="mergesort")
        m = (df["ts"].astype("int64") // MINUTE_US).to_numpy()
        rep = df.loc[df.index.repeat(HOP)].reset_index(drop=True)
        offs = np.tile(np.arange(HOP, dtype=np.int64), len(df))
        rep["window_start"] = (np.repeat(m, HOP) - offs) * MINUTE_US
        return pa.Table.from_pandas(
            _ohlc_partial_df(rep, presorted=True), preserve_index=False
        )

    bars = (
        ds.map_batches(expand_partial, batch_format="pyarrow")
        .map_batches(_ohlc_add_coarse_bucket, batch_format="pyarrow")
        .groupby("_wb")
        .map_groups(_ohlc_final_merge, batch_format="pandas")
        .to_pandas()
    )
    bars["window_start"] = pd.to_datetime(bars["window_start"], unit="us")
    bars = bars.sort_values(["event_type", "window_start"])
    return pa.Table.from_pandas(
        bars.reset_index(drop=True), preserve_index=False
    )


Q_EV_OHLC_HOPPING_SQL = """
    WITH base AS (
        SELECT e.*,
               (epoch_us(e.ts) // 60000000 - j.j) * 60000000 AS ws
        FROM events e CROSS JOIN generate_series(0, 4) AS j(j)
    ), w AS (
        SELECT *, make_timestamp(ws) AS window_start,
               row_number() OVER (PARTITION BY event_type, ws
                   ORDER BY ts, event_id) AS rn_a,
               row_number() OVER (PARTITION BY event_type, ws
                   ORDER BY ts DESC, event_id DESC) AS rn_d
        FROM base
    )
    SELECT event_type, window_start,
           MAX(CASE WHEN rn_a = 1 THEN value END) AS open,
           MAX(value) AS high, MIN(value) AS low,
           MAX(CASE WHEN rn_d = 1 THEN value END) AS close,
           ROUND(SUM(value), 2) AS volume,
           COUNT(*) AS n_events
    FROM w GROUP BY event_type, window_start
    ORDER BY event_type, window_start
"""


def q_ev_latest_per_user(sf_dir: str) -> pa.Table:
    """Top-1-per-group (the reference's month-end snapshot / latest-wins
    pattern, A3): each user's latest event by (ts, event_id)."""
    ds = _events(sf_dir, ["event_id", "ts", "user_id", "event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas().sort_values(["ts", "event_id"], kind="mergesort")
        return pa.Table.from_pandas(
            df.groupby("user_id", sort=False).tail(1), preserve_index=False
        )

    def final_part(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["ts", "event_id"], kind="mergesort")
        return df.groupby("user_id", sort=False).tail(1)

    out = (
        _keyed_partitions(
            ds.map_batches(partial, batch_format="pyarrow"),
            ["user_id"], final_part,
        )
        .to_pandas()
        .sort_values("user_id")
    )
    return pa.Table.from_pandas(
        out[["user_id", "event_id", "event_type", "value", "ts"]], preserve_index=False
    )


Q_EV_LATEST_SQL = """
    SELECT user_id, event_id, event_type, value, ts FROM events
    QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
    ORDER BY user_id
"""


def q_ev_monthly_type_mean(sf_dir: str) -> pa.Table:
    """A5 monthly mean: avg(value) by (month, event_type), distributed as
    per-batch (sum, count) partials + tiny final — never a raw-row shuffle."""
    ds = _events(sf_dir, ["ts", "event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df["month"] = df["ts"].values.astype("datetime64[M]")
        g = df.groupby(["month", "event_type"]).agg(
            s=("value", "sum"), n=("value", "size")
        ).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    g = parts.groupby(["month", "event_type"], sort=True).agg(
        s=("s", "sum"), n=("n", "sum")
    )
    out = g.reset_index()
    out["avg_value"] = _round_half_away(out["s"] / out["n"], 4)
    out["n_events"] = out["n"].astype("int64")
    out["month"] = pd.to_datetime(out["month"])
    return pa.Table.from_pandas(
        out[["month", "event_type", "avg_value", "n_events"]], preserve_index=False
    )


Q_EV_MONTHLY_SQL = """
    SELECT date_trunc('month', ts) AS month, event_type,
           ROUND(AVG(value), 4) AS avg_value, COUNT(*) AS n_events
    FROM events GROUP BY 1, 2 ORDER BY 1, 2
"""


def q_ev_pivot_daily(sf_dir: str) -> pa.Table:
    """A4 pivot-by-filter: per day, max(value) FILTER (WHERE type=k) for a
    fixed set of event types."""
    types = ["click", "view", "purchase", "signup", "error"]
    ds = _events(sf_dir, ["ts", "event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df["day"] = df["ts"].values.astype("datetime64[D]")
        g = df.pivot_table(
            index="day", columns="event_type", values="value", aggfunc="max"
        )
        g = g.reindex(columns=types)
        g.columns = [f"max_{c}" for c in types]
        return pa.Table.from_pandas(g.reset_index(), preserve_index=False)

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    out = parts.groupby("day", sort=True).max().reset_index()
    out["day"] = pd.to_datetime(out["day"])
    return pa.Table.from_pandas(out, preserve_index=False)


Q_EV_PIVOT_SQL = """
    SELECT date_trunc('day', ts) AS day,
           MAX(value) FILTER (WHERE event_type = 'click') AS max_click,
           MAX(value) FILTER (WHERE event_type = 'view') AS max_view,
           MAX(value) FILTER (WHERE event_type = 'purchase') AS max_purchase,
           MAX(value) FILTER (WHERE event_type = 'signup') AS max_signup,
           MAX(value) FILTER (WHERE event_type = 'error') AS max_error
    FROM events GROUP BY 1 ORDER BY 1
"""


def q_ev_rolling_avg(sf_dir: str) -> pa.Table:
    """A6 rolling window: per user, mean of the last 5 values ordered by
    (ts, event_id) — sort-within-group ``map_groups``."""
    ds = _events(sf_dir, ["event_id", "ts", "user_id", "value"])

    def roll_part(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        r = (
            df.groupby("user_id", sort=False)["value"]
            .rolling(5, min_periods=1)
            .mean()
            .reset_index(level=0, drop=True)
        )
        df["rolling_avg"] = _round_half_away(r, 4)
        return df[["event_id", "user_id", "rolling_avg"]]

    out = (
        _keyed_partitions(ds, ["user_id"], roll_part)
        .to_pandas()
        .sort_values("event_id")
    )
    return pa.Table.from_pandas(out, preserve_index=False)


Q_EV_ROLLING_SQL = """
    SELECT event_id, user_id,
           ROUND(AVG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 4) AS rolling_avg
    FROM events ORDER BY event_id
"""


def q_ev_asof_last_view(sf_dir: str) -> pa.Table:
    """J4 as-of lookup: for every click, the same user's latest 'view'
    at-or-before it — per-group sorted as-of search in map_groups."""
    ds = _events(sf_dir, ["event_id", "ts", "user_id", "event_type"])

    def asof_part(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        view_ts = df["ts"].where(df["event_type"] == "view")
        df["last_view_ts"] = view_ts.groupby(df["user_id"], sort=False).ffill()
        clicks = df[df["event_type"] == "click"]
        return clicks[["event_id", "user_id", "last_view_ts"]]

    out = (
        _keyed_partitions(ds, ["user_id"], asof_part)
        .to_pandas()
        .sort_values("event_id")
    )
    return pa.Table.from_pandas(out, preserve_index=False)


Q_EV_ASOF_SQL = """
    WITH t AS (
        SELECT event_id, user_id, event_type,
               MAX(CASE WHEN event_type = 'view' THEN ts END) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING) AS last_view_ts
        FROM events
    )
    SELECT event_id, user_id, last_view_ts FROM t
    WHERE event_type = 'click' ORDER BY event_id
"""


def q_ev_validity_tag(sf_dir: str) -> pa.Table:
    """M8 validity tagging: parse the JSON-ish props column; malformed rows
    survive with _valid=false instead of failing the job (tag-then-split,
    ``ofl/streaming/bronze.py:109-142``)."""
    ds = _events(sf_dir, ["event_id", "props"])

    def tag(t: pa.Table) -> pa.Table:
        ext = pc.extract_regex(t["props"], r'"k": (?P<k>\d+)')
        k = pc.struct_field(ext, "k")
        valid = pc.is_valid(k)
        return pa.table(
            {
                "event_id": t["event_id"],
                "k": pc.cast(k, pa.int64()),
                "_valid": valid,
            }
        )

    out = ds.map_batches(tag, batch_format="pyarrow").to_pandas().sort_values("event_id")
    return pa.Table.from_pandas(out, preserve_index=False)


Q_EV_VALIDITY_SQL = """
    SELECT event_id,
           CAST(regexp_extract(props, '"k": (\\d+)', 1) AS BIGINT) AS k,
           regexp_extract(props, '"k": (\\d+)', 1) IS NOT NULL
               AND regexp_extract(props, '"k": (\\d+)', 1) != '' AS _valid
    FROM events ORDER BY event_id
"""


def q_ev_table_metrics(sf_dir: str) -> pa.Table:
    """A8 single-row table metrics from per-batch partials."""
    ds = _events(sf_dir, ["event_id", "user_id", "ts", "value"])

    def partial(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "n": [t.num_rows],
                "sv": [pc.sum(t["value"]).as_py()],
                "lo": [pc.min(t["ts"]).as_py()],
                "hi": [pc.max(t["ts"]).as_py()],
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    users = ds.unique("user_id")
    return pa.table(
        {
            "n_rows": [int(parts["n"].sum())],
            "n_users": [len(users)],
            "total_value": [round(float(parts["sv"].sum()), 2)],
            "min_ts": [parts["lo"].min().to_pydatetime()],
            "max_ts": [parts["hi"].max().to_pydatetime()],
        }
    )


Q_EV_METRICS_SQL = """
    SELECT COUNT(*) AS n_rows, COUNT(DISTINCT user_id) AS n_users,
           ROUND(SUM(value), 2) AS total_value,
           MIN(ts) AS min_ts, MAX(ts) AS max_ts
    FROM events
"""


# --------------------------------------------------------------------------
# TPC-H-ish relational operators (M5/M7/M11, J2/J3, A2, A9, §2.7 union)
# --------------------------------------------------------------------------


def q_li_pricing_summary(sf_dir: str) -> pa.Table:
    """The canonical grouped aggregate (reference A2/A5 family): lineitem
    summary by (returnflag, linestatus) via ray.data native aggregates."""
    from ray.data.aggregate import Count, Mean, Sum

    ds = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=[
            "l_returnflag", "l_linestatus", "l_quantity",
            "l_extendedprice", "l_discount",
        ],
    )

    def revenue(t: pa.Table) -> pa.Table:
        rev = pc.multiply(t["l_extendedprice"], pc.subtract(1.0, t["l_discount"]))
        return t.append_column("revenue", rev)

    out = (
        ds.map_batches(revenue, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("l_quantity", alias_name="sum_qty"),
            Sum("revenue", alias_name="sum_revenue"),
            Mean("l_discount", alias_name="avg_disc"),
            Count(alias_name="n"),
        )
        .to_pandas()
        .sort_values(["l_returnflag", "l_linestatus"])
    )
    out["sum_qty"] = _round_half_away(out["sum_qty"], 0).astype("int64")
    out["sum_revenue"] = _round_half_away(out["sum_revenue"], 2)
    out["avg_disc"] = _round_half_away(out["avg_disc"], 4)
    return pa.Table.from_pandas(out, preserve_index=False)


Q_LI_PRICING_SQL = """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(l_quantity) AS BIGINT) AS sum_qty,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_revenue,
           ROUND(AVG(l_discount), 4) AS avg_disc,
           COUNT(*) AS n
    FROM lineitem GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
"""


def q_ord_revenue_by_nation(sf_dir: str) -> pa.Table:
    """J2 dim join through the first-class join operator: ``auto`` picks
    the broadcast strategy for the small customer→nation side (right side
    materialized in the object store once, size-guarded — above the byte
    cap it would fall back to the bucketed shuffle join automatically)."""
    from open_finance_lakehouse_ray.pipelines.join import join

    nat = rd.read_parquet(
        os.path.join(sf_dir, "nation.parquet"), columns=["n_nationkey", "n_name"]
    )
    cust = rd.read_parquet(
        os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey", "c_nationkey"]
    )
    cust_nat = join(
        cust, nat, on="c_nationkey", right_on="n_nationkey",
        right_columns=["n_name"], strategy="auto",
    )
    orders = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"), columns=["o_custkey", "o_totalprice"]
    )
    joined = join(
        orders, cust_nat, on="o_custkey", right_on="c_custkey",
        right_columns=["n_name"], strategy="auto",
    )

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        g = df.groupby("n_name").agg(
            s=("o_totalprice", "sum"), n=("o_totalprice", "size")
        ).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    parts = joined.map_batches(partial, batch_format="pyarrow").to_pandas()
    out = parts.groupby("n_name", sort=True).agg(s=("s", "sum"), n=("n", "sum")).reset_index()
    out["revenue"] = _round_half_away(out["s"], 2)
    out["n_orders"] = out["n"].astype("int64")
    return pa.Table.from_pandas(out[["n_name", "revenue", "n_orders"]], preserve_index=False)


Q_ORD_REVENUE_SQL = """
    SELECT n_name, ROUND(SUM(o_totalprice), 2) AS revenue, COUNT(*) AS n_orders
    FROM orders JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name ORDER BY n_name
"""


def q_li_order_priority_revenue(sf_dir: str) -> pa.Table:
    """J3 general equi-join, BOTH sides large (lineitem × orders on the
    order key) through the first-class operator's hash-bucket shuffle path
    — the reference's quotes × instrument-registry join shape
    (``ofl/transform/gold/mart_di_curve_points.sql:38-42``) at a size where
    no side can be broadcast. Revenue by order priority."""
    from open_finance_lakehouse_ray.pipelines.join import join

    li = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
    )
    orders = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_orderpriority"],
    )
    joined = join(
        li, orders, on="l_orderkey", right_on="o_orderkey",
        right_columns=["o_orderpriority"], strategy="shuffle",
    )

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df["rev"] = df["l_extendedprice"] * (1.0 - df["l_discount"])
        g = df.groupby("o_orderpriority").agg(
            s=("rev", "sum"), n=("rev", "size")
        ).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    parts = joined.map_batches(partial, batch_format="pyarrow").to_pandas()
    out = (
        parts.groupby("o_orderpriority", sort=True)
        .agg(s=("s", "sum"), n=("n", "sum"))
        .reset_index()
    )
    out["revenue"] = _round_half_away(out["s"], 2)
    out["n_items"] = out["n"].astype("int64")
    return pa.Table.from_pandas(
        out[["o_orderpriority", "revenue", "n_items"]], preserve_index=False
    )


Q_LI_ORD_JOIN_SQL = """
    SELECT o_orderpriority,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


def q_li_gap_check(sf_dir: str) -> pa.Table:
    """A9 dense-grid assertion analog: orders whose distinct line numbers
    don't form a contiguous 1..max run."""
    ds = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"), columns=["l_orderkey", "l_linenumber"]
    )

    def distinct_pairs(t: pa.Table) -> pa.Table:
        # shrink the shuffle: batch-local distinct (duplicates ACROSS
        # batches are handled by the exact per-group pass below)
        return pa.Table.from_pandas(
            t.to_pandas().drop_duplicates(), preserve_index=False
        )

    def add_coarse_bucket(t: pa.Table) -> pa.Table:
        b = t["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64) % 64
        return t.append_column("_ob", pa.array(b))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # vectorized over ALL of this bucket's orders in one pandas pass
        g = g.drop_duplicates(["l_orderkey", "l_linenumber"])
        agg = g.groupby("l_orderkey").agg(
            n_lines=("l_linenumber", "nunique"), max_line=("l_linenumber", "max")
        )
        bad = agg[agg["n_lines"] != agg["max_line"]].reset_index()
        return bad

    bad = (
        ds.map_batches(distinct_pairs, batch_format="pyarrow")
        .map_batches(add_coarse_bucket, batch_format="pyarrow")
        .groupby("_ob")
        .map_groups(per_bucket, batch_format="pandas")
        .to_pandas()
    )
    if "l_orderkey" not in bad.columns:  # no violations anywhere: schema lost
        bad = pd.DataFrame(columns=["l_orderkey", "n_lines", "max_line"])
    bad = bad.sort_values("l_orderkey")
    bad = bad.astype({"l_orderkey": "int64", "n_lines": "int64", "max_line": "int64"})
    return pa.Table.from_pandas(bad.reset_index(drop=True), preserve_index=False)


Q_LI_GAP_SQL = """
    SELECT l_orderkey, COUNT(DISTINCT l_linenumber) AS n_lines,
           MAX(l_linenumber) AS max_line
    FROM lineitem GROUP BY l_orderkey
    HAVING COUNT(DISTINCT l_linenumber) != MAX(l_linenumber)
    ORDER BY l_orderkey
"""


def q_party_union(sf_dir: str) -> pa.Table:
    """§2.7 union-by-name with null-filled missing columns (M6):
    customer ∪ supplier into one 'party' relation."""
    cust = rd.read_parquet(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_name", "c_acctbal"],
    ).map_batches(
        lambda t: pa.table(
            {
                "party_key": t["c_custkey"],
                "name": t["c_name"],
                "acctbal": pc.round(t["c_acctbal"], 2, round_mode="half_towards_infinity"),
                "kind": pa.array(["customer"] * t.num_rows),
            }
        ),
        batch_format="pyarrow",
    )
    supp = rd.read_parquet(
        os.path.join(sf_dir, "supplier.parquet"), columns=["s_suppkey", "s_name"]
    ).map_batches(
        lambda t: pa.table(
            {
                "party_key": t["s_suppkey"],
                "name": t["s_name"],
                "acctbal": pa.nulls(t.num_rows, pa.float64()),
                "kind": pa.array(["supplier"] * t.num_rows),
            }
        ),
        batch_format="pyarrow",
    )
    out = cust.union(supp).to_pandas().sort_values(["kind", "party_key"])
    return pa.Table.from_pandas(out.reset_index(drop=True), preserve_index=False)


Q_PARTY_UNION_SQL = """
    SELECT c_custkey AS party_key, c_name AS name,
           ROUND(c_acctbal, 2) AS acctbal, 'customer' AS kind FROM customer
    UNION ALL
    SELECT s_suppkey, s_name, CAST(NULL AS DOUBLE), 'supplier' FROM supplier
    ORDER BY kind, party_key
"""


# --------------------------------------------------------------------------
# documents / embeddings (training-data operators)
# --------------------------------------------------------------------------


def _docs(sf_dir: str, columns=None) -> rd.Dataset:
    return rd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=columns)


def q_doc_near_dup_pairs(sf_dir: str) -> pa.Table:
    """MinHash+LSH near-dup candidates verified by exact 3-shingle Jaccard
    (threshold 0.8)."""
    from open_finance_lakehouse_ray.pipelines.dedup import minhash_near_dup_pairs

    out = minhash_near_dup_pairs(
        _docs(sf_dir, ["doc_id", "text"]), threshold=0.8
    ).to_pandas()
    out["jaccard"] = _round_half_away(out["jaccard"], 3)
    return pa.Table.from_pandas(out, preserve_index=False)


Q_DOC_NEAR_DUP_SQL = """
    WITH toks AS (SELECT doc_id, string_split(text, ' ') w FROM documents),
    sh AS (SELECT doc_id,
                  list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                                 for i in range(1, len(w) - 1)]) s
           FROM toks)
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           ROUND(len(list_intersect(a.s, b.s))::DOUBLE /
                 len(list_distinct(list_concat(a.s, b.s))), 3) AS jaccard
    FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    WHERE len(list_intersect(a.s, b.s))::DOUBLE /
          len(list_distinct(list_concat(a.s, b.s))) >= 0.8
    ORDER BY id_a, id_b
"""


def q_doc_unigram_logprob(sf_dir: str) -> pa.Table:
    """Unigram-LM perplexity-proxy quality scores — the CCNet-style
    quality filter (corpus unigram counts, token-bucketed; DF attached by
    the bucketed join; per-doc fold in bounded hash partitions)."""
    from open_finance_lakehouse_ray.pipelines.textpipe import unigram_logprob

    return unigram_logprob(_docs(sf_dir, ["doc_id", "text"]))


Q_DOC_UNIGRAM_SQL = """
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    cnt AS (SELECT tok, count(*)::DOUBLE AS c FROM toks GROUP BY tok),
    tot AS (SELECT count(*)::DOUBLE AS n FROM toks)
    SELECT t.doc_id,
           ROUND(SUM(-ln(c.c / tot.n)) / COUNT(*), 4) AS avg_neg_logprob,
           COUNT(*) AS n_tokens
    FROM toks t JOIN cnt c ON t.tok = c.tok CROSS JOIN tot
    GROUP BY t.doc_id
    ORDER BY t.doc_id
"""


def q_ev_jsonl_roundtrip(sf_dir: str) -> pa.Table:
    """JSONL source through the gate: the events table is re-serialized
    as newline-delimited JSON with deterministic corruption (lines for
    ``event_id % 97 == 0`` truncated mid-object), read back through the
    pinned-schema JSONL source (``sources/jsonl.py`` — malformed lines
    route, never fail the batch), and the GOOD rows' aggregate must equal
    the SQL mirror over the uncorrupted complement."""
    import shutil
    import tempfile

    import pyarrow.parquet as pq

    from open_finance_lakehouse_ray.sources.jsonl import read_jsonl, split_valid

    scratch = tempfile.mkdtemp(prefix="oflr-jsonl-")
    try:
        ev = pq.read_table(
            os.path.join(sf_dir, "events.parquet"),
            columns=["event_id", "ts", "user_id", "event_type", "value"],
        )
        ids = ev["event_id"].to_pylist()
        ts_us = ev["ts"].cast(pa.int64()).to_pylist()
        users = ev["user_id"].to_pylist()
        types_ = ev["event_type"].to_pylist()
        vals = ev["value"].to_pylist()
        import json as _json

        n_files, rows = 4, ev.num_rows
        step = (rows + n_files - 1) // n_files
        n_bad = 0
        for i in range(n_files):
            with open(os.path.join(scratch, f"ev-{i:03d}.jsonl"), "w") as f:
                for j in range(i * step, min((i + 1) * step, rows)):
                    line = _json.dumps(
                        {"event_id": ids[j], "ts": ts_us[j], "user_id": users[j],
                         "event_type": types_[j], "value": vals[j]}
                    )
                    if ids[j] % 97 == 0:  # producer bug: truncated record
                        line = line[: max(1, len(line) // 2)]
                        n_bad += 1
                    f.write(line + "\n")

        schema = pa.schema(
            [("event_id", pa.int64()), ("ts", pa.timestamp("us")),
             ("user_id", pa.int64()), ("event_type", pa.string()),
             ("value", pa.float64())]
        )
        good, dead = split_valid(
            read_jsonl([os.path.join(scratch, f"ev-{i:03d}.jsonl")
                        for i in range(n_files)], schema)
        )
        assert dead.count() == n_bad  # every corrupted line routed, none lost

        def partial(t: pa.Table) -> pa.Table:
            df = t.to_pandas()
            # size, not count: the oracle's COUNT(*) counts ROWS — pandas
            # count would exclude null values (valid rows can carry them)
            g = df.groupby("event_type").agg(
                count=("value", "size"), sum=("value", "sum")
            ).reset_index()
            return pa.Table.from_pandas(g, preserve_index=False)

        parts = good.map_batches(partial, batch_format="pyarrow").to_pandas()
        out = parts.groupby("event_type").agg(
            n_rows=("count", "sum"), total_value=("sum", "sum")
        ).reset_index().sort_values("event_type")
        out["n_rows"] = out["n_rows"].astype("int64")
        out["total_value"] = _round_half_away(out["total_value"], 2)
        return pa.Table.from_pandas(out.reset_index(drop=True), preserve_index=False)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


Q_EV_JSONL_SQL = """
    SELECT event_type, COUNT(*) AS n_rows,
           ROUND(SUM(value), 2) AS total_value
    FROM events
    WHERE event_id % 97 <> 0
    GROUP BY event_type
    ORDER BY event_type
"""


def q_doc_decontaminate(sf_dir: str) -> pa.Table:
    """Benchmark decontamination through the gate: documents with
    ``doc_id % 50 == 0`` act as the EVAL set; every other document sharing
    at least one 3-word shingle with any eval doc is flagged. Exact
    (recall 1.0), so the DuckDB all-pairs shingle join reproduces the set
    bit for bit."""
    import pyarrow.compute as pc_

    from open_finance_lakehouse_ray.pipelines.dedup import decontaminate

    docs = _docs(sf_dir, ["doc_id", "text"])

    def side(is_eval: bool):
        def f(t: pa.Table) -> pa.Table:
            m = pc_.equal(pc_.mod(t["doc_id"], 50), 0) if hasattr(pc_, "mod") \
                else pa.array(
                    t["doc_id"].to_numpy(zero_copy_only=False) % 50 == 0
                )
            return t.filter(m if is_eval else pc_.invert(m))
        return f

    return decontaminate(
        docs.map_batches(side(False), batch_format="pyarrow"),
        docs.map_batches(side(True), batch_format="pyarrow"),
    )


Q_DOC_DECONTAMINATE_SQL = """
    WITH toks AS (SELECT doc_id, string_split(text, ' ') w FROM documents),
    sh AS (SELECT doc_id,
                  unnest(list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                                        for i in range(1, len(w) - 1)])) s
           FROM toks),
    ev AS (SELECT DISTINCT s FROM sh WHERE doc_id % 50 = 0)
    SELECT DISTINCT t.doc_id
    FROM sh t JOIN ev ON t.s = ev.s
    WHERE t.doc_id % 50 <> 0
    ORDER BY doc_id
"""


def q_emb_pq_knn(sf_dir: str) -> pa.Table:
    """Product-quantization ANN top-3 for the first 8 vectors, driven to
    EXACTNESS like ``emb_knn_ivf``: ``rerank`` covers every batch
    ("probe-all"), so each query's ADC shortlist is the whole batch and
    the exact re-rank provably reproduces brute force — the full PQ
    machinery (sampled codebooks, encode, ADC scan) runs and the result
    is hash-checkable against the brute SQL oracle. The scale bench keeps
    ``rerank=None`` (pure ADC, recall gated in pytest)."""
    import pyarrow.parquet as pq

    from open_finance_lakehouse_ray.pipelines.similarity import pq_topk

    qt = pq.read_table(os.path.join(sf_dir, "embeddings.parquet")).slice(0, 8)
    queries = np.stack(qt["embedding"].to_pandas().to_numpy())
    qids = qt["vec_id"].to_numpy()
    out = pq_topk(_emb(sf_dir), queries, qids, k=3, rerank=2**31).to_pandas()
    return pa.Table.from_pandas(
        out[["query_id", "neighbor_id", "rank"]], preserve_index=False
    )


def q_doc_token_stats(sf_dir: str) -> pa.Table:
    from open_finance_lakehouse_ray.pipelines.textpipe import token_stats

    out = (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(token_stats, batch_format="pyarrow")
        .select_columns(["doc_id", "n_tokens", "n_chars", "avg_token_len"])
        .to_pandas()
        .sort_values("doc_id")
    )
    return pa.Table.from_pandas(out.reset_index(drop=True), preserve_index=False)


Q_DOC_TOKEN_SQL = r"""
    SELECT doc_id,
           len(regexp_extract_all(text, '\S+')) AS n_tokens,
           length(text) AS n_chars,
           ROUND((length(text) - (length(text) - length(replace(text, ' ', ''))))::DOUBLE
                 / GREATEST(len(regexp_extract_all(text, '\S+')), 1), 4) AS avg_token_len
    FROM documents ORDER BY doc_id
"""


def q_doc_quality(sf_dir: str) -> pa.Table:
    from open_finance_lakehouse_ray.pipelines.textpipe import QualityScorer

    out = (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(QualityScorer, batch_format="pyarrow", concurrency=2)
        .select_columns(["doc_id", "stop_ratio"])
        .to_pandas()
        .sort_values("doc_id")
    )
    return pa.Table.from_pandas(out.reset_index(drop=True), preserve_index=False)


Q_DOC_QUALITY_SQL = r"""
    SELECT doc_id,
           ROUND((len(regexp_extract_all(text, '\b(a|and|in|is|it|of|the|to)\b'))
                 )::DOUBLE / GREATEST(len(regexp_extract_all(text, '\S+')), 1), 4)
               AS stop_ratio
    FROM documents ORDER BY doc_id
"""


def q_doc_fingerprint(sf_dir: str) -> pa.Table:
    from open_finance_lakehouse_ray.pipelines.textpipe import fingerprints

    out = (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(fingerprints, batch_format="pyarrow")
        .select_columns(["doc_id", "md5"])
        .to_pandas()
        .sort_values("doc_id")
    )
    return pa.Table.from_pandas(out.reset_index(drop=True), preserve_index=False)


Q_DOC_FINGERPRINT_SQL = """
    SELECT doc_id, md5(text) AS md5 FROM documents ORDER BY doc_id
"""


def q_doc_langid(sf_dir: str) -> pa.Table:
    """Language-ID heuristic: per-language stopword-regex vote, argmax with
    alphabetical tie-break, confidence = top/total — SQL-expressible as a
    CASE over summed ``regexp_extract_all`` counts, so hash-checked."""
    from open_finance_lakehouse_ray.pipelines.textpipe import LangId

    out = (
        _docs(sf_dir, ["doc_id", "text", "lang"])
        .map_batches(LangId, batch_format="pyarrow", concurrency=2)
        .select_columns(["doc_id", "lang", "pred_lang", "lang_conf"])
        .to_pandas()
        .sort_values("doc_id")
    )
    return pa.Table.from_pandas(out.reset_index(drop=True), preserve_index=False)


def _stopword_count_expr(lang: str) -> str:
    from open_finance_lakehouse_ray.pipelines.textpipe import STOPWORDS

    return " + ".join(
        rf"len(regexp_extract_all(text, '\b{w}\b'))" for w in sorted(STOPWORDS[lang])
    )


def _langid_sql() -> str:
    return f"""
    WITH s AS (
        SELECT doc_id, lang,
               {_stopword_count_expr("en")} AS s_en,
               {_stopword_count_expr("es")} AS s_es,
               {_stopword_count_expr("pt")} AS s_pt
        FROM documents
    )
    SELECT doc_id, lang,
           CASE WHEN s_en >= s_es AND s_en >= s_pt THEN 'en'
                WHEN s_es >= s_pt THEN 'es' ELSE 'pt' END AS pred_lang,
           ROUND(CAST(GREATEST(s_en, s_es, s_pt) AS DOUBLE)
                 / GREATEST(s_en + s_es + s_pt, 1), 4) AS lang_conf
    FROM s ORDER BY doc_id
    """


Q_DOC_LANGID_SQL = _langid_sql()


def q_doc_simhash_pairs(sf_dir: str) -> pa.Table:
    """SimHash near-dup pairs (hamming ≤ 3), distributed block-banded.
    Hash-checked: the signature hash is DuckDB's ``hash()``, so the oracle
    rebuilds the full 64-bit signatures and the hamming join in SQL."""
    from open_finance_lakehouse_ray.pipelines.dedup import simhash_near_dup_pairs

    return simhash_near_dup_pairs(_docs(sf_dir, ["doc_id", "text"]))


# the oracle recomputes SimHash end to end: k=3 word shingles (every
# position, multiplicity kept), per-bit ±1 votes over hash(s), bit set iff
# vote > 0, then an exact hamming≤3 self-join on bit_count(xor(...))
Q_DOC_SIMHASH_SQL = """
    WITH w AS (
        SELECT doc_id, string_split(text, ' ') AS words FROM documents
    ),
    sh AS (
        SELECT doc_id, hash(array_to_string(words[i:i+2], ' ')) AS h
        FROM w, LATERAL unnest(range(1, len(words) - 1)) AS t(i)
    ),
    bits AS (
        SELECT doc_id, j,
               SUM(CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE -1 END) AS vote
        FROM sh CROSS JOIN range(0, 64) AS r(j)
        GROUP BY doc_id, j
    ),
    sig AS (
        SELECT doc_id,
               CAST(SUM(CASE WHEN vote > 0
                        THEN (1::UBIGINT << j)::HUGEINT ELSE 0 END) AS UBIGINT)
                   AS sim
        FROM bits GROUP BY doc_id
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.sim, b.sim)) AS BIGINT) AS hamming
    FROM sig a JOIN sig b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.sim, b.sim)) <= 3
    ORDER BY id_a, id_b
"""


def q_doc_multimodal(sf_dir: str) -> pa.Table:
    """Binary-payload plumbing: text→bytes→actor-pool decode→features.
    n_bytes and checksum are SQL-checkable; features are engine-side."""
    from open_finance_lakehouse_ray.pipelines.multimodal import multimodal_pipeline

    out = (
        multimodal_pipeline(_docs(sf_dir, ["doc_id", "text"]))
        .select_columns(["doc_id", "n_bytes", "checksum"])
        .to_pandas()
        .sort_values("doc_id")
    )
    return pa.Table.from_pandas(out.reset_index(drop=True), preserve_index=False)


# checksum oracle sums codepoints == UTF-8 byte values for ASCII corpora
Q_DOC_MULTIMODAL_SQL = """
    SELECT doc_id, octet_length(encode(text)) AS n_bytes,
           CAST(list_sum(list_transform(string_split(text, ''),
                x -> ascii(x))) AS BIGINT) AS checksum
    FROM documents ORDER BY doc_id
"""


def _emb(sf_dir: str) -> rd.Dataset:
    return rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))


def q_emb_knn(sf_dir: str) -> pa.Table:
    """Brute-force cosine top-3 for the first 8 vectors as queries."""
    import pyarrow.parquet as pq

    from open_finance_lakehouse_ray.pipelines.similarity import brute_force_topk

    qt = pq.read_table(os.path.join(sf_dir, "embeddings.parquet")).slice(0, 8)
    queries = np.stack(qt["embedding"].to_pandas().to_numpy())
    qids = qt["vec_id"].to_numpy()
    out = brute_force_topk(_emb(sf_dir), queries, qids, k=3).to_pandas()
    return pa.Table.from_pandas(
        out[["query_id", "neighbor_id", "rank"]], preserve_index=False
    )


Q_EMB_KNN_SQL = """
    WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings
               WHERE vec_id < 8),
    scored AS (
        SELECT q.query_id, e.vec_id AS neighbor_id,
               list_cosine_similarity(q.qv, e.embedding) AS cos,
               row_number() OVER (PARTITION BY q.query_id
                   ORDER BY list_cosine_similarity(q.qv, e.embedding) DESC,
                            e.vec_id) AS rank
        FROM q JOIN embeddings e ON e.vec_id != q.query_id
    )
    SELECT query_id, neighbor_id, rank FROM scored WHERE rank <= 3
    ORDER BY query_id, rank
"""


def q_emb_label_centroids(sf_dir: str) -> pa.Table:
    from open_finance_lakehouse_ray.pipelines.similarity import label_centroid_report

    return label_centroid_report(_emb(sf_dir))


Q_EMB_CENTROID_SQL = """
    SELECT label, COUNT(*) AS n,
           ROUND(AVG(embedding[1]), 4) AS mean_dim0,
           ROUND(AVG(sqrt(list_sum(list_transform(embedding, x -> x * x)))), 4)
               AS mean_norm
    FROM embeddings GROUP BY label ORDER BY label
"""


# --------------------------------------------------------------------------
# registry
# --------------------------------------------------------------------------

QUERIES = {
    "tx_maintenance_roundtrip": q_tx_maintenance_roundtrip,
    "tx_merge_upsert": q_tx_merge_upsert,
    "tx_expire_invariance": q_tx_expire_invariance,
    "tx_key_metrics": q_tx_key_metrics,
    "ev_ohlc_1m": q_ev_ohlc_1m,
    "ev_ohlc_hopping": q_ev_ohlc_hopping,
    "ev_latest_per_user": q_ev_latest_per_user,
    "ev_monthly_type_mean": q_ev_monthly_type_mean,
    "ev_pivot_daily": q_ev_pivot_daily,
    "ev_rolling_avg": q_ev_rolling_avg,
    "ev_asof_last_view": q_ev_asof_last_view,
    "ev_validity_tag": q_ev_validity_tag,
    "ev_table_metrics": q_ev_table_metrics,
    "li_pricing_summary": q_li_pricing_summary,
    "ord_revenue_by_nation": q_ord_revenue_by_nation,
    "li_order_priority_revenue": q_li_order_priority_revenue,
    "li_gap_check": q_li_gap_check,
    "party_union": q_party_union,
    "doc_near_dup_pairs": q_doc_near_dup_pairs,
    "doc_token_stats": q_doc_token_stats,
    "doc_unigram_logprob": q_doc_unigram_logprob,
    "ev_jsonl_roundtrip": q_ev_jsonl_roundtrip,
    "doc_decontaminate": q_doc_decontaminate,
    "emb_pq_knn": q_emb_pq_knn,
    "doc_quality": q_doc_quality,
    "doc_fingerprint": q_doc_fingerprint,
    "doc_langid": q_doc_langid,
    "doc_simhash_pairs": q_doc_simhash_pairs,
    "doc_multimodal": q_doc_multimodal,
    "emb_knn": q_emb_knn,
    "emb_label_centroids": q_emb_label_centroids,
}

ORACLES = {
    "tx_maintenance_roundtrip": Q_TX_ROUNDTRIP_SQL,
    "tx_merge_upsert": Q_TX_MERGE_SQL,
    "tx_expire_invariance": Q_TX_ROUNDTRIP_SQL,
    "tx_key_metrics": Q_TX_METRICS_SQL,
    "ev_ohlc_1m": Q_EV_OHLC_SQL,
    "ev_ohlc_hopping": Q_EV_OHLC_HOPPING_SQL,
    "ev_latest_per_user": Q_EV_LATEST_SQL,
    "ev_monthly_type_mean": Q_EV_MONTHLY_SQL,
    "ev_pivot_daily": Q_EV_PIVOT_SQL,
    "ev_rolling_avg": Q_EV_ROLLING_SQL,
    "ev_asof_last_view": Q_EV_ASOF_SQL,
    "ev_validity_tag": Q_EV_VALIDITY_SQL,
    "ev_table_metrics": Q_EV_METRICS_SQL,
    "li_pricing_summary": Q_LI_PRICING_SQL,
    "ord_revenue_by_nation": Q_ORD_REVENUE_SQL,
    "li_order_priority_revenue": Q_LI_ORD_JOIN_SQL,
    "li_gap_check": Q_LI_GAP_SQL,
    "party_union": Q_PARTY_UNION_SQL,
    "doc_near_dup_pairs": Q_DOC_NEAR_DUP_SQL,
    "doc_token_stats": Q_DOC_TOKEN_SQL,
    "doc_unigram_logprob": Q_DOC_UNIGRAM_SQL,
    "ev_jsonl_roundtrip": Q_EV_JSONL_SQL,
    "doc_decontaminate": Q_DOC_DECONTAMINATE_SQL,
    "doc_quality": Q_DOC_QUALITY_SQL,
    "doc_fingerprint": Q_DOC_FINGERPRINT_SQL,
    "doc_langid": Q_DOC_LANGID_SQL,
    "doc_simhash_pairs": Q_DOC_SIMHASH_SQL,
    "doc_multimodal": Q_DOC_MULTIMODAL_SQL,
    "emb_knn": Q_EMB_KNN_SQL,
    # PQ runs in probe-all + exact-rerank mode at gate scale, so brute-force
    # SQL is its exact oracle (the emb_knn_ivf n_probe=n_lists precedent)
    "emb_pq_knn": Q_EMB_KNN_SQL,
    "emb_label_centroids": Q_EMB_CENTROID_SQL,
}


# --------------------------------------------------------------------------
# second wave: the reference's distinctive mart shapes (A3/A6, J4/J5/J7, M12)
# --------------------------------------------------------------------------


def q_ord_month_end_snapshot(sf_dir: str) -> pa.Table:
    """A3 month-end snapshot: each customer's LAST order per month
    (row_number over (customer, month) order by date desc, key desc = 1 —
    ``mart_macro_dashboard.sql:3-13``)."""
    ds = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
    )

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df["month"] = df["o_orderdate"].values.astype("datetime64[M]")
        df = df.sort_values(["o_orderdate", "o_orderkey"], kind="mergesort")
        return pa.Table.from_pandas(
            df.groupby(["o_custkey", "month"], sort=False).tail(1),
            preserve_index=False,
        )

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["o_orderdate", "o_orderkey"], kind="mergesort")
        return g.groupby(["o_custkey", "month"], sort=False).tail(1)

    def bucket(t: pa.Table) -> pa.Table:
        b = t["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64) % 32
        return t.append_column("_b", pa.array(b))

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .map_batches(bucket, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(final, batch_format="pandas")
        .to_pandas()
        .drop(columns=["_b"])
        .sort_values(["o_custkey", "month"])
    )
    out["month"] = pd.to_datetime(out["month"])
    out["o_totalprice"] = _round_half_away(out["o_totalprice"], 2)
    return pa.Table.from_pandas(
        out[["o_custkey", "month", "o_orderkey", "o_totalprice"]].reset_index(drop=True),
        preserve_index=False,
    )


Q_ORD_SNAPSHOT_SQL = """
    SELECT o_custkey, date_trunc('month', o_orderdate) AS month,
           o_orderkey, ROUND(o_totalprice, 2) AS o_totalprice
    FROM orders
    QUALIFY row_number() OVER (
        PARTITION BY o_custkey, date_trunc('month', o_orderdate)
        ORDER BY o_orderdate DESC, o_orderkey DESC) = 1
    ORDER BY o_custkey, month
"""


def q_ev_compound_growth(sf_dir: str) -> pa.Table:
    """A6 geometric compounding over a rolling window: each DAY's mean
    'purchase' value scaled to a rate r=avg/1000; 12-day compound
    ``exp(sum(ln(1+r)))-1`` (``mart_inflation_panel.sql:12-13``); only
    full 12-day windows (``mart_real_interest.sql:28-30``; days because
    the events table spans one month)."""
    ds = _events(sf_dir, ["ts", "event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df = df[df["event_type"] == "purchase"]
        if len(df) == 0:
            return pa.table({"day": pa.array([], pa.timestamp("us")),
                             "s": pa.array([], pa.float64()),
                             "n": pa.array([], pa.int64())})
        df["day"] = df["ts"].values.astype("datetime64[D]")
        g = df.groupby("day").agg(s=("value", "sum"), n=("value", "size")).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    m = parts.groupby("day", sort=True).agg(s=("s", "sum"), n=("n", "sum"))
    rate = (m["s"] / m["n"]) / 1000.0
    lg = np.log1p(rate)
    roll = lg.rolling(12).sum()
    out = pd.DataFrame(
        {
            "day": pd.to_datetime(m.index),
            "compound_12d": _round_half_away(np.expm1(roll), 6),
        }
    ).dropna()
    return pa.Table.from_pandas(out.reset_index(drop=True), preserve_index=False)


Q_EV_COMPOUND_SQL = """
    WITH m AS (
        SELECT date_trunc('day', ts) AS day, AVG(value) / 1000.0 AS r
        FROM events WHERE event_type = 'purchase' GROUP BY 1
    ), w AS (
        SELECT day,
               SUM(ln(1 + r)) OVER (ORDER BY day
                   ROWS BETWEEN 11 PRECEDING AND CURRENT ROW) AS s,
               COUNT(*) OVER (ORDER BY day
                   ROWS BETWEEN 11 PRECEDING AND CURRENT ROW) AS k
        FROM m
    )
    SELECT day, ROUND(exp(s) - 1, 6) AS compound_12d
    FROM w WHERE k = 12 ORDER BY day
"""


def q_ev_monthly_real_diff(sf_dir: str) -> pa.Table:
    """J5 co-grouped monthly join (SELIC × IPCA analog): monthly mean of
    'purchase' joined to monthly mean of 'click' on month; the 'real'
    spread (1+a)/(1+b)-1 with rates scaled by /1000."""
    ds = _events(sf_dir, ["ts", "event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df = df[df["event_type"].isin(["purchase", "click"])]
        df["month"] = df["ts"].values.astype("datetime64[M]")
        g = df.groupby(["month", "event_type"]).agg(
            s=("value", "sum"), n=("value", "size")
        ).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    g = parts.groupby(["month", "event_type"], sort=True).agg(
        s=("s", "sum"), n=("n", "sum")
    )
    means = (g["s"] / g["n"]).unstack("event_type") / 1000.0
    means = means.dropna(subset=["purchase", "click"])
    out = pd.DataFrame(
        {
            "month": pd.to_datetime(means.index),
            "real_diff": _round_half_away(
                (1 + means["purchase"]) / (1 + means["click"]) - 1, 6
            ).values,
        }
    )
    return pa.Table.from_pandas(out.reset_index(drop=True), preserve_index=False)


Q_EV_REALDIFF_SQL = """
    WITH p AS (SELECT date_trunc('month', ts) AS month, AVG(value)/1000.0 AS r
               FROM events WHERE event_type = 'purchase' GROUP BY 1),
         c AS (SELECT date_trunc('month', ts) AS month, AVG(value)/1000.0 AS r
               FROM events WHERE event_type = 'click' GROUP BY 1)
    SELECT p.month, ROUND((1 + p.r) / (1 + c.r) - 1, 6) AS real_diff
    FROM p JOIN c USING (month) ORDER BY p.month
"""


def q_reconcile_customers(sf_dir: str) -> pa.Table:
    """J7 FULL OUTER reconciliation: coverage must agree both ways —
    customers with no orders and order-custkeys missing from the customer
    dim are each their own violation reason
    (``checks/assert_real_interest_ipca_recomputes.sql:51-64``)."""
    from open_finance_lakehouse_ray.pipelines.join import join

    orders = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"), columns=["o_custkey"]
    ).map_batches(
        # batch-local distinct + side marker (cross-batch dups collapse in
        # the final tiny violations frame)
        lambda t: pa.table(
            {
                "custkey": pc.unique(t["o_custkey"]),
                "has_order": pa.array([True] * len(pc.unique(t["o_custkey"]))),
            }
        ),
        batch_format="pyarrow",
    )
    cust = rd.read_parquet(
        os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey"]
    ).map_batches(
        lambda t: pa.table(
            {"c_custkey": t["c_custkey"], "in_dim": pa.array([True] * t.num_rows)}
        ),
        batch_format="pyarrow",
    )
    full = join(
        orders, cust, on="custkey", right_on="c_custkey",
        how="outer", strategy="shuffle",
    )

    def violations(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        bad = df[df["has_order"].isna() | df["in_dim"].isna()]
        return pa.table(
            {
                "custkey": pa.array(bad["custkey"].astype("int64")),
                "reason": pa.array(
                    np.where(
                        bad["in_dim"].isna(),
                        "order_without_customer",
                        "customer_without_orders",
                    )
                ),
            }
        )

    out = full.map_batches(violations, batch_format="pyarrow").to_pandas()
    if "custkey" not in out.columns:  # no violations anywhere -> schemaless empty
        return pa.table({"custkey": pa.array([], pa.int64()),
                         "reason": pa.array([], pa.string())})
    out = out.drop_duplicates(["custkey", "reason"]).sort_values(["reason", "custkey"])
    return pa.Table.from_pandas(out.reset_index(drop=True), preserve_index=False)


Q_RECONCILE_SQL = """
    WITH o AS (SELECT DISTINCT o_custkey FROM orders)
    SELECT COALESCE(o.o_custkey, c.c_custkey) AS custkey,
           CASE WHEN c.c_custkey IS NULL THEN 'order_without_customer'
                ELSE 'customer_without_orders' END AS reason
    FROM o FULL OUTER JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE o.o_custkey IS NULL OR c.c_custkey IS NULL
    ORDER BY reason, custkey
"""


def q_ev_value_bands(sf_dir: str) -> pa.Table:
    """M12 scalar CASE classifier (curve-shape / bond-type analog):
    band events by value and count per (event_type, band)."""
    ds = _events(sf_dir, ["event_type", "value"])

    def classify(t: pa.Table) -> pa.Table:
        v = t["value"]
        band = pc.if_else(
            pc.less(v, 10.0),
            pa.scalar("small"),
            pc.if_else(
                pc.less(v, 100.0), pa.scalar("medium"), pa.scalar("large")
            ),
        )
        return pa.table({"event_type": t["event_type"], "band": band})

    from ray.data.aggregate import Count

    out = (
        ds.map_batches(classify, batch_format="pyarrow")
        .groupby(["event_type", "band"])
        .aggregate(Count(alias_name="n"))
        .to_pandas()
        .sort_values(["event_type", "band"])
    )
    return pa.Table.from_pandas(out.reset_index(drop=True), preserve_index=False)


Q_EV_BANDS_SQL = """
    SELECT event_type,
           CASE WHEN value < 10 THEN 'small'
                WHEN value < 100 THEN 'medium'
                ELSE 'large' END AS band,
           COUNT(*) AS n
    FROM events GROUP BY 1, 2 ORDER BY event_type, band
"""


def q_ev_interp_purchase(sf_dir: str) -> pa.Table:
    """J4 bracketing interpolation (the DI-curve point build,
    ``mart_di_curve_points.sql:47-115``): each purchase's value linearly
    interpolated between the user's nearest view strictly-before and
    strictly-after; NO extrapolation — unbracketed purchases are dropped.
    Per-group sorted as-of search in map_groups."""
    ds = _events(sf_dir, ["event_id", "ts", "user_id", "event_type", "value"])

    def interp(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"], kind="mergesort")
        is_view = g["event_type"] == "view"
        ts_us = g["ts"].astype("int64")
        below_v = g["value"].where(is_view).shift().ffill()
        below_t = ts_us.where(is_view).shift().ffill()
        rev = slice(None, None, -1)
        above_v = g["value"].where(is_view)[rev].shift()[rev].bfill()
        above_t = ts_us.where(is_view)[rev].shift()[rev].bfill()
        p = g[g["event_type"] == "purchase"].index
        out = pd.DataFrame(
            {
                "event_id": g.loc[p, "event_id"],
                "user_id": g.loc[p, "user_id"],
                "interp_value": below_v[p]
                + (above_v[p] - below_v[p])
                * (ts_us[p] - below_t[p])
                / (above_t[p] - below_t[p]),
            }
        ).dropna()
        out["interp_value"] = _round_half_away(out["interp_value"], 4)
        return out

    def interp_part(df: pd.DataFrame) -> pd.DataFrame:
        # in-process per-user apply inside a BOUNDED partition: the group
        # loop costs a pandas call, not a Ray map_groups task, per user
        out = [interp(g) for _, g in df.groupby("user_id", sort=False)]
        out = [o for o in out if len(o)]
        if not out:
            return pd.DataFrame(
                {
                    "event_id": pd.Series([], dtype="int64"),
                    "user_id": pd.Series([], dtype="int64"),
                    "interp_value": pd.Series([], dtype="float64"),
                }
            )
        return pd.concat(out, ignore_index=True)

    out = _keyed_partitions(ds, ["user_id"], interp_part).to_pandas()
    if "event_id" not in out.columns:  # all partitions empty: schema lost
        out = pd.DataFrame(
            {
                "event_id": pd.Series([], dtype="int64"),
                "user_id": pd.Series([], dtype="int64"),
                "interp_value": pd.Series([], dtype="float64"),
            }
        )
    out = out.sort_values("event_id")
    return pa.Table.from_pandas(out.reset_index(drop=True), preserve_index=False)


Q_EV_INTERP_SQL = """
    WITH t AS (
        SELECT event_id, user_id, event_type, value, ts,
               -- event_id inside the struct: MAX/MIN tie-break on equal ts
               -- matches the engine's (ts, event_id) row order exactly
               MAX(CASE WHEN event_type = 'view' THEN
                   CAST(ROW(epoch_us(ts), event_id, value)
                        AS ROW(t BIGINT, i BIGINT, v DOUBLE)) END) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS below,
               MIN(CASE WHEN event_type = 'view' THEN
                   CAST(ROW(epoch_us(ts), event_id, value)
                        AS ROW(t BIGINT, i BIGINT, v DOUBLE)) END) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS above
        FROM events
    )
    SELECT event_id, user_id,
           ROUND(below.v + (above.v - below.v) *
                 (epoch_us(ts) - below.t)::DOUBLE / (above.t - below.t), 4)
               AS interp_value
    FROM t
    WHERE event_type = 'purchase' AND below IS NOT NULL AND above IS NOT NULL
    ORDER BY event_id
"""


QUERIES.update(
    {
        "ord_month_end_snapshot": q_ord_month_end_snapshot,
        "ev_compound_growth": q_ev_compound_growth,
        "ev_monthly_real_diff": q_ev_monthly_real_diff,
        "reconcile_customers": q_reconcile_customers,
        "ev_value_bands": q_ev_value_bands,
        "ev_interp_purchase": q_ev_interp_purchase,
    }
)
ORACLES.update(
    {
        "ord_month_end_snapshot": Q_ORD_SNAPSHOT_SQL,
        "ev_compound_growth": Q_EV_COMPOUND_SQL,
        "ev_monthly_real_diff": Q_EV_REALDIFF_SQL,
        "reconcile_customers": Q_RECONCILE_SQL,
        "ev_value_bands": Q_EV_BANDS_SQL,
        "ev_interp_purchase": Q_EV_INTERP_SQL,
    }
)


def q_dim_date(sf_dir: str) -> pa.Table:
    """The generated calendar dimension (``dimensions.py:96-106``:
    ``explode(sequence(...))`` 1980–2035; here one year at daily grain with
    the usual derived parts, incl. last_day and ISO day-of-week)."""
    days = pd.date_range("2024-01-01", "2024-12-31", freq="D")
    out = pd.DataFrame(
        {
            "date": days,
            "year": days.year.astype("int64"),
            "quarter": days.quarter.astype("int64"),
            "month": days.month.astype("int64"),
            "dow": days.dayofweek.astype("int64") + 1,  # ISO 1=Mon
            "month_end": days + pd.offsets.MonthEnd(0),
        }
    )
    # a generated dimension is driver-side by nature (tiny), then becomes a
    # broadcastable Dataset; return the table for the gate
    return pa.Table.from_pandas(out, preserve_index=False)


Q_DIM_DATE_SQL = """
    SELECT d AS date,
           CAST(EXTRACT(year FROM d) AS BIGINT) AS year,
           CAST(EXTRACT(quarter FROM d) AS BIGINT) AS quarter,
           CAST(EXTRACT(month FROM d) AS BIGINT) AS month,
           CAST(isodow(d) AS BIGINT) AS dow,
           CAST(last_day(d) AS TIMESTAMP) AS month_end
    FROM generate_series(TIMESTAMP '2024-01-01', TIMESTAMP '2024-12-31',
                         INTERVAL 1 DAY) t(d)
    ORDER BY d
"""


def q_ev_ohlc_daily_rollup(sf_dir: str) -> pa.Table:
    """J8 mart-on-mart: the daily rollup READS the 1-minute bars mart
    (the one inter-mart edge, ``mart_di_curve_slope`` over
    ``mart_di_curve_points``) — avg per-bar volume and bar count per
    (event_type, day) computed FROM q_ev_ohlc_1m's result."""
    bars = q_ev_ohlc_1m(sf_dir).to_pandas()  # the upstream mart
    bars["day"] = bars["window_start"].values.astype("datetime64[D]")
    # bar volume is already 2-decimal rounded upstream, so integer
    # centi-units are exact: summing int64 is order-independent, where a
    # float mean's last ulp depends on summation order and can cross a
    # ROUND(.,4) half-boundary between numpy and DuckDB (round-3/4 red row)
    bars["vol_c"] = np.floor(bars["volume"].to_numpy() * 100.0 + 0.5).astype(
        "int64"
    )
    g = bars.groupby(["event_type", "day"], sort=True).agg(
        n_bars=("n_events", "size"),
        vol_c=("vol_c", "sum"),
        day_high=("high", "max"),
        day_low=("low", "min"),
    ).reset_index()
    g["avg_bar_volume"] = _round_half_away(
        g["vol_c"] / (100.0 * g["n_bars"]), 4
    )
    # pandas 2.x keeps the coarse datetime64[D]->[s] unit through
    # to_datetime; the oracle emits timestamp[us], so force the unit or the
    # driver's epoch-integer value hash differs by 1e6 (round-3 red row).
    g["day"] = pd.to_datetime(g["day"]).astype("datetime64[us]")
    g["n_bars"] = g["n_bars"].astype("int64")
    return pa.Table.from_pandas(
        g[["event_type", "day", "n_bars", "avg_bar_volume", "day_high",
           "day_low"]],
        preserve_index=False,
    )


Q_EV_OHLC_DAILY_SQL = f"""
    WITH bars AS ({Q_EV_OHLC_SQL.replace("ORDER BY event_type, window_start", "")})
    SELECT event_type, date_trunc('day', window_start) AS day,
           COUNT(*) AS n_bars,
           ROUND(SUM(CAST(FLOOR(volume * 100 + 0.5) AS BIGINT))::DOUBLE
                 / (COUNT(*) * 100), 4) AS avg_bar_volume,
           MAX(high) AS day_high, MIN(low) AS day_low
    FROM bars GROUP BY 1, 2 ORDER BY event_type, day
"""


QUERIES.update(
    {
        "dim_date": q_dim_date,
        "ev_ohlc_daily_rollup": q_ev_ohlc_daily_rollup,
    }
)
ORACLES.update(
    {
        "dim_date": Q_DIM_DATE_SQL,
        "ev_ohlc_daily_rollup": Q_EV_OHLC_DAILY_SQL,
    }
)


def q_doc_dedup_exact(sf_dir: str) -> pa.Table:
    """Exact dedup (hash-partition + per-group first): the documents table
    unioned with a shifted copy of itself (seeded duplicates by
    construction), deduped on content hash keeping the smallest doc_id —
    returns the keeper ids."""
    from open_finance_lakehouse_ray.functions.hashing import content_hash_column

    docs = _docs(sf_dir, ["doc_id", "text"])
    copy = docs.map_batches(
        lambda t: pa.table(
            {"doc_id": pc.add(t["doc_id"], 10_000), "text": t["text"]}
        ),
        batch_format="pyarrow",
    )
    unioned = docs.union(copy).map_batches(
        lambda t: content_hash_column(t, ["text"]), batch_format="pyarrow"
    )

    def keep_first(g: pd.DataFrame) -> pd.DataFrame:
        return (
            g.sort_values("doc_id")
            .drop_duplicates("text", keep="first")[["doc_id"]]
        )

    def bucket(t: pa.Table) -> pa.Table:
        b = t["_chash"].to_numpy(zero_copy_only=False).astype(np.int64) % 32
        return t.append_column("_b", pa.array(np.abs(b)))

    out = (
        unioned.map_batches(bucket, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(keep_first, batch_format="pandas")
        .to_pandas()
        .sort_values("doc_id")
    )
    out["doc_id"] = out["doc_id"].astype("int64")
    return pa.Table.from_pandas(out.reset_index(drop=True), preserve_index=False)


Q_DOC_DEDUP_SQL = """
    WITH unioned AS (
        SELECT doc_id, text FROM documents
        UNION ALL SELECT doc_id + 10000, text FROM documents
    )
    SELECT doc_id FROM unioned
    QUALIFY row_number() OVER (PARTITION BY text ORDER BY doc_id) = 1
    ORDER BY doc_id
"""


def q_emb_near_dup(sf_dir: str) -> pa.Table:
    """Embedding-cosine near-duplicate pairs (threshold 0.50) — the
    brute-force broadcast path of `embedding_near_dup_pairs`; ids only
    (float similarity stays engine-side to avoid f32/f64 hash skew)."""
    from open_finance_lakehouse_ray.pipelines.dedup import embedding_near_dup_pairs

    out = embedding_near_dup_pairs(_emb(sf_dir), threshold=0.50).to_pandas()
    return pa.Table.from_pandas(
        out[["id_a", "id_b"]].reset_index(drop=True), preserve_index=False
    )


Q_EMB_NEAR_DUP_SQL = """
    SELECT a.vec_id AS id_a, b.vec_id AS id_b
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.50
    ORDER BY id_a, id_b
"""


def q_doc_dedup_clusters(sf_dir: str) -> pa.Table:
    """Near-dup CLUSTERS: MinHash pairs → connected components → every
    clustered doc mapped to its canonical (min-id) keeper — the final
    collapse step of a training-data dedup pipeline."""
    from open_finance_lakehouse_ray.pipelines.dedup import (
        dedup_clusters,
        minhash_near_dup_pairs,
    )

    pairs = minhash_near_dup_pairs(_docs(sf_dir, ["doc_id", "text"]), threshold=0.8)
    return dedup_clusters(pairs)


# connected components in SQL: bidirectional edges + recursive reachability,
# then MIN over everything reachable = the component's canonical id
Q_DOC_CLUSTERS_SQL = """
    WITH RECURSIVE toks AS (
        SELECT doc_id, string_split(text, ' ') w FROM documents
    ),
    sh AS (SELECT doc_id,
                  list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                                 for i in range(1, len(w) - 1)]) s
           FROM toks),
    pairs AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        WHERE len(list_intersect(a.s, b.s))::DOUBLE /
              len(list_distinct(list_concat(a.s, b.s))) >= 0.8
    ),
    edges AS (
        SELECT id_a AS u, id_b AS v FROM pairs
        UNION ALL SELECT id_b, id_a FROM pairs
    ),
    reach(node, root) AS (
        SELECT u, u FROM (SELECT DISTINCT u FROM edges)
        UNION
        SELECT e.v, r.root FROM reach r JOIN edges e ON e.u = r.node
    )
    SELECT node AS doc_id, MIN(root) AS canonical_id
    FROM reach GROUP BY node ORDER BY doc_id
"""


def q_ord_top_spenders(sf_dir: str) -> pa.Table:
    """Distributed top-k OVER an aggregate: total order value per customer
    (map-side partial sums → hash-bucketed exact sums → per-bucket local
    top-k → tiny k-sized final merge on the driver). §2.6 top-k at scale:
    only num_buckets × k candidate rows ever leave the shuffle."""
    k = 10
    ds = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"), columns=["o_custkey", "o_totalprice"]
    )

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        g = df.groupby("o_custkey").agg(s=("o_totalprice", "sum")).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    def bucket(t: pa.Table) -> pa.Table:
        b = t["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64) % 32
        return t.append_column("_b", pa.array(b))

    def per_bucket_topk(g: pd.DataFrame) -> pd.DataFrame:
        full = g.groupby("o_custkey").agg(s=("s", "sum")).reset_index()
        return full.sort_values(
            ["s", "o_custkey"], ascending=[False, True]
        ).head(k)

    cand = (
        ds.map_batches(partial, batch_format="pyarrow")
        .map_batches(bucket, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(per_bucket_topk, batch_format="pandas")
        .to_pandas()
    )
    top = cand.sort_values(["s", "o_custkey"], ascending=[False, True]).head(k)
    out = pd.DataFrame(
        {
            "o_custkey": top["o_custkey"].astype("int64"),
            "total_spent": _round_half_away(top["s"], 2),
        }
    )
    return pa.Table.from_pandas(out.reset_index(drop=True), preserve_index=False)


Q_ORD_TOP_SPENDERS_SQL = """
    SELECT o_custkey, ROUND(SUM(o_totalprice), 2) AS total_spent
    FROM orders GROUP BY o_custkey
    ORDER BY SUM(o_totalprice) DESC, o_custkey LIMIT 10
"""


def q_cust_urgent_segments(sf_dir: str) -> pa.Table:
    """SEMI-join through the first-class operator: customers with at
    least one URGENT-priority order, counted per market segment (EXISTS
    semantics — each customer counts once no matter how many urgent
    orders). Exercises the join operator's semi/anti path in the gate."""
    from open_finance_lakehouse_ray.pipelines.join import join

    cust = rd.read_parquet(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_mktsegment"],
    )
    urgent = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_custkey", "o_orderpriority"],
    ).map_batches(
        # vectorized Arrow filter (never a per-row Python predicate)
        lambda t: t.filter(pc.equal(t["o_orderpriority"], "1-URGENT")).select(
            ["o_custkey"]
        ),
        batch_format="pyarrow",
    )
    hits = join(
        cust, urgent, on="c_custkey", right_on="o_custkey", how="semi",
        strategy="shuffle",
    )

    def partial(t: pa.Table) -> pa.Table:
        if "c_mktsegment" not in t.column_names:  # schemaless empty block
            return pa.table({"c_mktsegment": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        df = t.to_pandas()
        g = df.groupby("c_mktsegment").size().rename("n").reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    parts = hits.map_batches(partial, batch_format="pyarrow").to_pandas()
    out = (
        parts.groupby("c_mktsegment", sort=True).agg(n=("n", "sum")).reset_index()
    )
    out["n_customers"] = out["n"].astype("int64")
    return pa.Table.from_pandas(
        out[["c_mktsegment", "n_customers"]], preserve_index=False
    )


Q_CUST_URGENT_SQL = """
    SELECT c_mktsegment, COUNT(*) AS n_customers
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
    GROUP BY c_mktsegment ORDER BY c_mktsegment
"""


def q_emb_knn_ivf(sf_dir: str) -> pa.Table:
    """IVF ANN driven to EXACTNESS: probing every list (n_probe = n_lists)
    makes the inverted-file search scan the full corpus, so the result
    must equal brute force — which makes the IVF machinery (sampled
    k-means coarse quantizer, broadcast centroids, streaming probe)
    hash-checkable against the exact SQL oracle."""
    import pyarrow.parquet as pq

    from open_finance_lakehouse_ray.pipelines.similarity import ivf_topk

    qt = pq.read_table(os.path.join(sf_dir, "embeddings.parquet")).slice(0, 8)
    queries = np.stack(qt["embedding"].to_pandas().to_numpy())
    qids = qt["vec_id"].to_numpy()
    out = ivf_topk(
        _emb(sf_dir), queries, qids, k=3, n_lists=8, n_probe=8
    ).to_pandas()
    return pa.Table.from_pandas(
        out[["query_id", "neighbor_id", "rank"]], preserve_index=False
    )


def q_ev_stream_ohlc(sf_dir: str) -> pa.Table:
    """The STREAMING lane through the gate: the events table is replayed
    as time-ordered micro-batch files through the distributed
    bronze→silver processor (watermark, dedup, tumbling windows,
    append-once finalize), and the PUBLISHED silver table is compared to
    a pure-SQL recomputation. A far-future sentinel batch advances the
    one-batch-lag watermark so every window with
    ``end <= max(ts) - delay`` finalizes — exactly the SQL cutoff."""
    import shutil
    import tempfile

    import pyarrow.parquet as pq

    from open_finance_lakehouse_ray.pipelines.streaming import StreamProcessor
    from open_finance_lakehouse_ray.state.txlog import TableLog

    scratch = tempfile.mkdtemp(prefix="oflr-stream-")
    try:
        src = os.path.join(scratch, "src")
        os.makedirs(src)
        ev = pq.read_table(
            os.path.join(sf_dir, "events.parquet"),
            columns=["event_id", "ts", "user_id", "event_type", "value"],
        )
        ev = ev.append_column("props", pa.array(["{}"] * ev.num_rows))
        ev = ev.sort_by([("ts", "ascending"), ("event_id", "ascending")])
        n_files = 3
        rows = ev.num_rows
        step = (rows + n_files - 1) // n_files
        for i in range(n_files):
            chunk = ev.slice(i * step, step)
            if chunk.num_rows:
                pq.write_table(chunk, os.path.join(src, f"f{i:03d}.parquet"))
        # sentinel: far-future single event advancing the watermark past
        # every real window's end (its own window stays open forever)
        max_us = pc.max(ev["ts"]).as_py()
        sentinel = pa.table(
            {
                "event_id": pa.array([10_000_000], pa.int64()),
                "ts": pa.array(
                    [max_us + pd.Timedelta(minutes=10)], pa.timestamp("us")
                ),
                "user_id": pa.array([0], pa.int64()),
                "event_type": pa.array(["__sentinel"]),
                "value": pa.array([0.0]),
                "props": pa.array(["{}"]),
            }
        )
        pq.write_table(sentinel, os.path.join(src, "f999.parquet"))

        proc = StreamProcessor(
            src,
            os.path.join(scratch, "bronze"),
            os.path.join(scratch, "silver"),
            os.path.join(scratch, "ckpt"),
            window_us=60_000_000,
            delay_us=120_000_000,
            max_files_per_trigger=1,
            distributed=True,
        )
        proc.run_available_now()
        log = TableLog(os.path.join(scratch, "silver"))
        bars = (
            pa.concat_tables([pq.read_table(p) for p in log.file_paths()])
            .to_pandas()
        )
        bars = bars[bars["event_type"] != "__sentinel"]
        bars["volume"] = _round_half_away(bars["volume"], 2)
        bars["n_events"] = bars["n_events"].astype("int64")
        bars = bars.sort_values(["event_type", "window_start"])
        return pa.Table.from_pandas(
            bars[["event_type", "window_start", "open", "high", "low",
                  "close", "volume", "n_events"]].reset_index(drop=True),
            preserve_index=False,
        )
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


# the streaming cutoff in SQL: a window is published iff its END is at or
# before the final watermark = max event time - delay (one-batch lag is
# satisfied by the sentinel batch)
Q_EV_STREAM_OHLC_SQL = """
    WITH w AS (
        SELECT *, make_timestamp(epoch_us(ts) // 60000000 * 60000000) AS window_start,
               row_number() OVER (PARTITION BY event_type,
                   epoch_us(ts) // 60000000 ORDER BY ts, event_id) AS rn_a,
               row_number() OVER (PARTITION BY event_type,
                   epoch_us(ts) // 60000000 ORDER BY ts DESC, event_id DESC) AS rn_d
        FROM events
    )
    SELECT event_type, window_start,
           MAX(CASE WHEN rn_a = 1 THEN value END) AS open,
           MAX(value) AS high, MIN(value) AS low,
           MAX(CASE WHEN rn_d = 1 THEN value END) AS close,
           ROUND(SUM(value), 2) AS volume,
           COUNT(*) AS n_events
    FROM w
    GROUP BY event_type, window_start
    HAVING epoch_us(MIN(window_start)) + 60000000 <=
           (SELECT MAX(epoch_us(ts)) FROM events) - 120000000
    ORDER BY event_type, window_start
"""


def q_ev_dead_letter_replay(sf_dir: str) -> pa.Table:
    """Dead-letter REPLAY lifecycle through the gate: the events table is
    streamed with deterministic corruption injected (value nulled where
    ``event_id % 7 == 0``; ts ALSO nulled where ``% 21 == 0``), the lane
    dead-letters the invalid rows, then ``replay_dead_letters`` re-ingests
    them after a value-fill fix. The PUBLISHED bronze table (original
    landings + replay commit) must equal the SQL mirror: every row whose
    ts survives, with filled values — the reject→fix→replay accounting
    reconciling exactly (``ofl/streaming/bronze.py:171-182`` promise)."""
    import shutil
    import tempfile

    import pyarrow.parquet as pq

    from open_finance_lakehouse_ray.pipelines.streaming import (
        StreamProcessor,
        replay_dead_letters,
    )
    from open_finance_lakehouse_ray.state.txlog import TableLog

    scratch = tempfile.mkdtemp(prefix="oflr-replay-")
    try:
        src = os.path.join(scratch, "src")
        os.makedirs(src)
        ev = pq.read_table(
            os.path.join(sf_dir, "events.parquet"),
            columns=["event_id", "ts", "user_id", "event_type", "value"],
        )
        ev = ev.append_column("props", pa.array(["{}"] * ev.num_rows))
        ev = ev.sort_by([("ts", "ascending"), ("event_id", "ascending")])
        eid = ev["event_id"]
        import numpy as _np

        eid_np = eid.to_numpy(zero_copy_only=False)
        bad_val = pa.array(eid_np % 7 == 0)
        bad_ts = pa.array(eid_np % 21 == 0)
        ev = ev.set_column(
            ev.column_names.index("value"), "value",
            pc.if_else(bad_val, pa.nulls(ev.num_rows, pa.float64()), ev["value"]),
        )
        ev = ev.set_column(
            ev.column_names.index("ts"), "ts",
            pc.if_else(bad_ts, pa.nulls(ev.num_rows, pa.timestamp("us")), ev["ts"]),
        )
        n_files = 2
        step = (ev.num_rows + n_files - 1) // n_files
        for i in range(n_files):
            chunk = ev.slice(i * step, step)
            if chunk.num_rows:
                pq.write_table(chunk, os.path.join(src, f"f{i:03d}.parquet"))

        bronze_root = os.path.join(scratch, "bronze")
        proc = StreamProcessor(
            src, bronze_root, os.path.join(scratch, "silver"),
            os.path.join(scratch, "ckpt"),
            window_us=60_000_000, delay_us=120_000_000,
            max_files_per_trigger=1,
        )
        proc.run_available_now()

        def fix(batch: pa.Table) -> pa.Table:
            i = batch.column_names.index("value")
            return batch.set_column(
                i, "value", pc.fill_null(batch["value"], 0.0)
            )

        rep = replay_dead_letters(bronze_root, fix, job_id="gate-replay")
        assert rep["reconciled"], rep

        # aggregate the PUBLISHED bronze per event_type (engine-side)
        import ray.data as rd

        def partial(t: pa.Table) -> pa.Table:
            df = t.to_pandas()
            # size, not count: the oracle's COUNT(*) counts ROWS — pandas
            # count would exclude null values (valid rows can carry them)
            g = df.groupby("event_type").agg(
                count=("value", "size"), sum=("value", "sum")
            ).reset_index()
            return pa.Table.from_pandas(g, preserve_index=False)

        parts = (
            rd.read_parquet(TableLog(bronze_root).file_paths())
            .map_batches(partial, batch_format="pyarrow")
            .to_pandas()
        )
        out = parts.groupby("event_type").agg(
            n_rows=("count", "sum"), total_value=("sum", "sum")
        ).reset_index().sort_values("event_type")
        out["n_rows"] = out["n_rows"].astype("int64")
        out["total_value"] = _round_half_away(out["total_value"], 2)
        return pa.Table.from_pandas(out.reset_index(drop=True), preserve_index=False)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


# bronze after replay = every event whose ts survived corruption, with the
# fix's value fill applied to the value-corrupted rows
Q_EV_DEAD_LETTER_REPLAY_SQL = """
    SELECT event_type,
           COUNT(*) AS n_rows,
           ROUND(SUM(CASE WHEN event_id % 7 = 0 THEN 0.0 ELSE value END), 2)
               AS total_value
    FROM events
    WHERE event_id % 21 <> 0
    GROUP BY event_type
    ORDER BY event_type
"""


def q_mart_pricing_lifecycle(sf_dir: str) -> pa.Table:
    """Persisted-mart lifecycle through the gate: compute the pricing
    summary, publish it check-gated into a transaction-logged mart table
    (``build_mart``: compute → per-mart checks → overwrite commit with
    lineage), then read the PUBLISHED mart back — the scan of the mart,
    not the in-memory result, must equal the oracle."""
    import shutil

    from open_finance_lakehouse_ray.pipelines.marts import build_mart, read_mart

    root = _scratch_root("mart")
    try:
        build_mart(
            root,
            q_li_pricing_summary(sf_dir),
            name="pricing",
            job_id="mart-pricing",
            checks=("non_empty", "unique:l_returnflag,l_linestatus"),
            lineage={"query": "li_pricing_summary", "source": sf_dir},
        )
        out = read_mart(root).to_pandas().sort_values(
            ["l_returnflag", "l_linestatus"]
        )
        return pa.Table.from_pandas(out.reset_index(drop=True), preserve_index=False)
    finally:
        shutil.rmtree(root, ignore_errors=True)


QUERIES.update(
    {
        "doc_dedup_exact": q_doc_dedup_exact,
        "emb_near_dup": q_emb_near_dup,
        "mart_pricing_lifecycle": q_mart_pricing_lifecycle,
        "doc_dedup_clusters": q_doc_dedup_clusters,
        "ord_top_spenders": q_ord_top_spenders,
        "cust_urgent_segments": q_cust_urgent_segments,
        "emb_knn_ivf": q_emb_knn_ivf,
        "ev_stream_ohlc": q_ev_stream_ohlc,
        "ev_dead_letter_replay": q_ev_dead_letter_replay,
    }
)
ORACLES.update(
    {
        "doc_dedup_exact": Q_DOC_DEDUP_SQL,
        "emb_near_dup": Q_EMB_NEAR_DUP_SQL,
        "mart_pricing_lifecycle": Q_LI_PRICING_SQL,
        "doc_dedup_clusters": Q_DOC_CLUSTERS_SQL,
        "ord_top_spenders": Q_ORD_TOP_SPENDERS_SQL,
        "cust_urgent_segments": Q_CUST_URGENT_SQL,
        "emb_knn_ivf": Q_EMB_KNN_SQL,
        "ev_stream_ohlc": Q_EV_STREAM_OHLC_SQL,
        "ev_dead_letter_replay": Q_EV_DEAD_LETTER_REPLAY_SQL,
    }
)


# --------------------------------------------------------------------------
# third wave: exact n-gram Jaccard dedup, sessionization, corpus prep
# --------------------------------------------------------------------------


def q_doc_jaccard_pairs(sf_dir: str) -> pa.Table:
    """EXACT n-gram Jaccard near-dup pairs (threshold 0.6) via the
    prefix-filtered inverted index — recall 1.0, so unlike MinHash the
    DuckDB all-pairs oracle hash-checks this operator end to end."""
    from open_finance_lakehouse_ray.pipelines.dedup import ngram_jaccard_pairs

    out = ngram_jaccard_pairs(
        _docs(sf_dir, ["doc_id", "text"]), threshold=0.6
    ).to_pandas()
    out["jaccard"] = _round_half_away(out["jaccard"], 3)
    return pa.Table.from_pandas(out, preserve_index=False)


Q_DOC_JACCARD_SQL = """
    WITH toks AS (SELECT doc_id, string_split(text, ' ') w FROM documents),
    sh AS (SELECT doc_id,
                  list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                                 for i in range(1, len(w) - 1)]) s
           FROM toks)
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           ROUND(len(list_intersect(a.s, b.s))::DOUBLE /
                 len(list_distinct(list_concat(a.s, b.s))), 3) AS jaccard
    FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    WHERE len(list_intersect(a.s, b.s))::DOUBLE /
          len(list_distinct(list_concat(a.s, b.s))) >= 0.6
    ORDER BY id_a, id_b
"""


SESSION_GAP_SECONDS = 8 * 3600


def q_ev_sessionize(sf_dir: str) -> pa.Table:
    """Gap-based session windows (gaps-and-islands): a silence longer than
    8 h starts a new session for that user. ``groupby(user_id)`` co-locates
    each user's events (the one shuffle; users are independent so the key
    parallelism is perfect and skew is bounded by the hottest user); the
    per-group fold is vectorized pandas diff/cumsum — the windowed-
    aggregate shape Ray Data has no native operator for (SURVEY.md §2.9's
    session analog; the reference's windows are fixed 1-min tumbles,
    ``ofl/streaming/silver.py:107-112``)."""
    ds = _events(sf_dir, ["event_id", "ts", "user_id", "value"])

    def sessions_part(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        new_user = df["user_id"].ne(df["user_id"].shift())
        gap = df["ts"].diff().dt.total_seconds()
        brk = ((gap > SESSION_GAP_SECONDS) & ~new_user).astype("int64")
        df = df.assign(
            session_idx=brk.groupby(df["user_id"], sort=False).cumsum()
        )
        agg = (
            df.groupby(["user_id", "session_idx"], sort=False)
            .agg(
                session_start=("ts", "min"),
                session_end=("ts", "max"),
                n_events=("event_id", "count"),
                total_value=("value", "sum"),
            )
            .reset_index()
        )
        agg["total_value"] = _round_half_away(agg["total_value"], 4)
        agg["n_events"] = agg["n_events"].astype("int64")
        return agg

    out = (
        _keyed_partitions(ds, ["user_id"], sessions_part)
        .to_pandas()
        .sort_values(["user_id", "session_idx"])
    )
    return pa.Table.from_pandas(out.reset_index(drop=True), preserve_index=False)


Q_EV_SESSIONIZE_SQL = """
    WITH e AS (
        SELECT user_id, ts, event_id, value,
               CASE WHEN epoch(ts - LAG(ts) OVER (
                        PARTITION BY user_id ORDER BY ts, event_id)) > 28800
                    THEN 1 ELSE 0 END AS brk
        FROM events),
    s AS (SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING) AS session_idx
          FROM e)
    SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
           MIN(ts) AS session_start, MAX(ts) AS session_end,
           COUNT(*) AS n_events, ROUND(SUM(value), 4) AS total_value
    FROM s GROUP BY user_id, session_idx ORDER BY user_id, session_idx
"""


def q_doc_corpus_prep(sf_dir: str) -> pa.Table:
    """Flagship corpus-preparation chain: quality gate → exact dedup →
    prefix-filtered Jaccard near-dup drop → distributed token-budget cap
    (see :func:`..textpipe.corpus_prep` for the per-stage scale story)."""
    from open_finance_lakehouse_ray.pipelines.textpipe import corpus_prep

    return corpus_prep(_docs(sf_dir, ["doc_id", "text"]))


Q_DOC_CORPUS_PREP_SQL = r"""
    WITH st AS (
        SELECT doc_id, text,
               len(regexp_extract_all(text, '\S+')) AS n_tokens,
               ROUND(len(regexp_extract_all(text,
                         '\b(a|and|in|is|it|of|the|to)\b'))::DOUBLE
                     / GREATEST(len(regexp_extract_all(text, '\S+')), 1), 4)
                   AS stop_ratio,
               md5(text) AS m
        FROM documents),
    q AS (SELECT * FROM st WHERE n_tokens >= 20 AND stop_ratio >= 0.02),
    d AS (SELECT * FROM q
          QUALIFY row_number() OVER (PARTITION BY m ORDER BY doc_id) = 1),
    toks AS (SELECT doc_id, string_split(text, ' ') w FROM d),
    sh AS (SELECT doc_id,
                  list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                                 for i in range(1, len(w) - 1)]) s
           FROM toks),
    dropped AS (
        SELECT DISTINCT b.doc_id AS id_b
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        WHERE len(list_intersect(a.s, b.s))::DOUBLE /
              len(list_distinct(list_concat(a.s, b.s))) >= 0.6),
    nd AS (SELECT doc_id, n_tokens FROM d
           WHERE doc_id NOT IN (SELECT id_b FROM dropped)),
    c AS (SELECT doc_id, n_tokens,
                 SUM(n_tokens) OVER (ORDER BY doc_id
                                     ROWS UNBOUNDED PRECEDING) AS cum_tokens
          FROM nd)
    SELECT doc_id, n_tokens, CAST(cum_tokens AS BIGINT) AS cum_tokens
    FROM c WHERE cum_tokens <= 15000 ORDER BY doc_id
"""


QUERIES.update(
    {
        "doc_jaccard_pairs": q_doc_jaccard_pairs,
        "ev_sessionize": q_ev_sessionize,
        "doc_corpus_prep": q_doc_corpus_prep,
    }
)
ORACLES.update(
    {
        "doc_jaccard_pairs": Q_DOC_JACCARD_SQL,
        "ev_sessionize": Q_EV_SESSIONIZE_SQL,
        "doc_corpus_prep": Q_DOC_CORPUS_PREP_SQL,
    }
)


def q_doc_train_split(sf_dir: str) -> pa.Table:
    """Content-hash train/heldout split: bucket = first 32 md5 bits of the
    TEXT mod 100 (<90 → train). Hashing content, not doc_id, keeps exact
    duplicates on the same side of the split — the leakage-safe assignment
    a training pipeline needs; pure map, no shuffle, reproducible from any
    engine (the oracle recomputes it in SQL)."""
    import hashlib

    def split(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        b = [int(hashlib.md5(t.encode("utf-8")).hexdigest()[:8], 16) % 100
             for t in texts]
        lab = ["train" if x < 90 else "heldout" for x in b]
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "bucket": pa.array(b, pa.int64()),
                "split": pa.array(lab, pa.string()),
            }
        )

    out = (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(split, batch_format="pyarrow")
        .to_pandas()
        .sort_values("doc_id")
    )
    return pa.Table.from_pandas(out.reset_index(drop=True), preserve_index=False)


Q_DOC_TRAIN_SPLIT_SQL = """
    SELECT doc_id,
           CAST(CAST('0x' || substr(md5(text), 1, 8) AS UBIGINT) % 100
                AS BIGINT) AS bucket,
           CASE WHEN CAST('0x' || substr(md5(text), 1, 8) AS UBIGINT) % 100 < 90
                THEN 'train' ELSE 'heldout' END AS split
    FROM documents ORDER BY doc_id
"""


def q_doc_vocab_df(sf_dir: str) -> pa.Table:
    """Top-50 vocabulary by document frequency (combiner-first shuffle +
    per-bucket top-k — see :func:`..textpipe.vocab_df_topk`)."""
    from open_finance_lakehouse_ray.pipelines.textpipe import vocab_df_topk

    return vocab_df_topk(_docs(sf_dir, ["doc_id", "text"]), k=50)


Q_DOC_VOCAB_DF_SQL = r"""
    WITH tok AS (
        SELECT DISTINCT doc_id, UNNEST(regexp_extract_all(text, '\S+')) AS token
        FROM documents),
    df AS (SELECT token, COUNT(*) AS df FROM tok GROUP BY token)
    SELECT token, CAST(df AS BIGINT) AS df
    FROM df ORDER BY df DESC, token LIMIT 50
"""


QUERIES.update(
    {
        "doc_train_split": q_doc_train_split,
        "doc_vocab_df": q_doc_vocab_df,
    }
)
ORACLES.update(
    {
        "doc_train_split": Q_DOC_TRAIN_SPLIT_SQL,
        "doc_vocab_df": Q_DOC_VOCAB_DF_SQL,
    }
)


def q_doc_tfidf_top(sf_dir: str) -> pa.Table:
    """Top-3 TF-IDF terms per document (broadcast-DF pattern — see
    :func:`..textpipe.tfidf_top_terms`)."""
    from open_finance_lakehouse_ray.pipelines.textpipe import tfidf_top_terms

    return tfidf_top_terms(_docs(sf_dir, ["doc_id", "text"]), k=3)


Q_DOC_TFIDF_SQL = r"""
    WITH tok AS (
        SELECT doc_id, UNNEST(regexp_extract_all(text, '\S+')) AS token
        FROM documents),
    tf AS (SELECT doc_id, token, COUNT(*) AS cnt FROM tok
           GROUP BY doc_id, token),
    dlen AS (SELECT doc_id, SUM(cnt) AS n FROM tf GROUP BY doc_id),
    df AS (SELECT token, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY token),
    nn AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
        SELECT tf.doc_id, tf.token,
               ROUND((tf.cnt::DOUBLE / dlen.n) * ln(nn.n_docs::DOUBLE / df.df),
                     6) AS tfidf
        FROM tf
        JOIN dlen USING (doc_id)
        JOIN df USING (token)
        CROSS JOIN nn),
    r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
                        ORDER BY tfidf DESC, token) AS rk
          FROM scored)
    SELECT doc_id, token, tfidf FROM r WHERE rk <= 3
    ORDER BY doc_id, tfidf DESC, token
"""


QUERIES.update({"doc_tfidf_top": q_doc_tfidf_top})
ORACLES.update({"doc_tfidf_top": Q_DOC_TFIDF_SQL})


def q_mm_frame_sample(sf_dir: str) -> pa.Table:
    """Frame-sampling over binary payloads: every 4th 64-byte frame,
    per-frame byte checksum — the explode-shaped multimodal stage (see
    :class:`..multimodal.FrameSampler`)."""
    from open_finance_lakehouse_ray.pipelines.multimodal import frame_sample_pipeline

    out = (
        frame_sample_pipeline(_docs(sf_dir, ["doc_id", "text"]))
        .to_pandas()
        .sort_values(["doc_id", "frame_idx"])
    )
    return pa.Table.from_pandas(out.reset_index(drop=True), preserve_index=False)


# ASCII corpus: byte values == codepoints, so the oracle rebuilds frame
# checksums from substr + ascii (same trick as the doc_multimodal oracle)
Q_MM_FRAME_SAMPLE_SQL = """
    WITH f AS (SELECT doc_id, text, octet_length(encode(text)) AS nb
               FROM documents),
    idx AS (SELECT doc_id, text,
                   UNNEST(range(0, CAST(nb // 64 AS BIGINT), 4)) AS frame_idx
            FROM f)
    SELECT doc_id, frame_idx,
           CAST(list_sum(list_transform(
                    string_split(substr(text, CAST(frame_idx * 64 + 1 AS BIGINT), 64), ''),
                    x -> ascii(x))) AS BIGINT) AS frame_checksum
    FROM idx ORDER BY doc_id, frame_idx
"""


QUERIES.update({"mm_frame_sample": q_mm_frame_sample})
ORACLES.update({"mm_frame_sample": Q_MM_FRAME_SAMPLE_SQL})


def q_emb_kmeans_assign(sf_dir: str) -> pa.Table:
    """One distributed Lloyd's assignment+update step: nearest of the k=8
    lowest-id centroids per vector (Euclidean, ties to the lower centroid
    id), then per-cluster count and mean of dim 0 — the gate-checkable
    body of the iterative k-means loop (full multi-iteration version:
    :func:`..similarity.kmeans_distributed`)."""
    from open_finance_lakehouse_ray.pipelines.similarity import (
        _det_head,
        assign_partials,
    )

    k = 8
    mat = _emb(sf_dir).select_columns(["vec_id", "embedding"]).materialize()
    cent = _det_head(mat, "vec_id", "embedding", k)
    parts = assign_partials(mat, cent)
    rows = []
    for c, grp in parts.groupby("cluster", sort=True):
        n = int(grp["n"].sum())
        dim0 = float(np.sum(np.stack(grp["vec_sum"].to_numpy()), axis=0)[0])
        rows.append(
            {
                "cluster": int(c),
                "n": n,
                "mean_dim0": float(_round_half_away(pd.Series([dim0 / n]), 4).iloc[0]),
            }
        )
    return pa.Table.from_pandas(pd.DataFrame(rows), preserve_index=False)


Q_EMB_KMEANS_SQL = """
    WITH c AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings
               WHERE vec_id < 8),
    d AS (SELECT e.vec_id, c.cid,
                 list_distance(CAST(e.embedding AS DOUBLE[]),
                               CAST(c.cv AS DOUBLE[])) AS dist,
                 CAST(e.embedding[1] AS DOUBLE) AS dim0
          FROM embeddings e CROSS JOIN c),
    a AS (SELECT vec_id, cid, dim0,
                 row_number() OVER (PARTITION BY vec_id
                                    ORDER BY dist, cid) AS rk
          FROM d)
    SELECT cid AS cluster, COUNT(*) AS n, ROUND(AVG(dim0), 4) AS mean_dim0
    FROM a WHERE rk = 1 GROUP BY cid ORDER BY cluster
"""


QUERIES.update({"emb_kmeans_assign": q_emb_kmeans_assign})
ORACLES.update({"emb_kmeans_assign": Q_EMB_KMEANS_SQL})


def q_doc_seq_pack(sf_dir: str) -> pa.Table:
    """Concat-and-chunk packing into 512-token sequences (distributed
    prefix sum — see :func:`..textpipe.sequence_pack`)."""
    from open_finance_lakehouse_ray.pipelines.textpipe import sequence_pack

    return sequence_pack(_docs(sf_dir, ["doc_id", "text"]), seq_len=512)


Q_DOC_SEQ_PACK_SQL = r"""
    WITH st AS (SELECT doc_id,
                       len(regexp_extract_all(text, '\S+')) AS n_tokens
                FROM documents),
    c AS (SELECT doc_id, n_tokens,
                 SUM(n_tokens) OVER (ORDER BY doc_id
                                     ROWS UNBOUNDED PRECEDING) - n_tokens
                     AS start_offset
          FROM st)
    SELECT doc_id, n_tokens, CAST(start_offset AS BIGINT) AS start_offset,
           CAST(start_offset // 512 AS BIGINT) AS seq_id
    FROM c ORDER BY doc_id
"""


def q_doc_stratified_sample(sf_dir: str) -> pa.Table:
    """Deterministic stratified sample: 3 docs per language, ranked by
    (md5(text), doc_id) — a content-hash order both engines can
    reproduce. The per-stratum top-k runs inside bounded hash
    partitions (strata co-located, heads vectorized)."""
    import hashlib

    ds = _docs(sf_dir, ["doc_id", "text", "lang"])

    def add_md5(batch: pa.Table) -> pa.Table:
        md5s = [hashlib.md5(t.encode("utf-8")).hexdigest()
                for t in batch["text"].to_pylist()]
        return batch.append_column("m", pa.array(md5s)).drop_columns(["text"])

    def heads(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["lang", "m", "doc_id"], kind="mergesort")
        return df.groupby("lang", sort=False).head(3)

    out = (
        _keyed_partitions(
            ds.map_batches(add_md5, batch_format="pyarrow"), ["lang"], heads
        )
        .to_pandas()
        .sort_values(["lang", "m", "doc_id"])
    )
    out = out.rename(columns={"m": "rank_hash"})
    return pa.Table.from_pandas(
        out[["lang", "doc_id", "rank_hash"]].reset_index(drop=True),
        preserve_index=False,
    )


Q_DOC_STRATIFIED_SQL = """
    SELECT lang, doc_id, md5(text) AS rank_hash
    FROM documents
    QUALIFY row_number() OVER (PARTITION BY lang
                               ORDER BY md5(text), doc_id) <= 3
    ORDER BY lang, rank_hash, doc_id
"""


QUERIES.update(
    {
        "doc_seq_pack": q_doc_seq_pack,
        "doc_stratified_sample": q_doc_stratified_sample,
    }
)
ORACLES.update(
    {
        "doc_seq_pack": Q_DOC_SEQ_PACK_SQL,
        "doc_stratified_sample": Q_DOC_STRATIFIED_SQL,
    }
)


def q_doc_bpe_tokens(sf_dir: str) -> pa.Table:
    """Whitespace + BPE-ish token counts (GPT-2-style pre-tokenizer
    regex, RE2 subset) — see :func:`..textpipe.bpe_token_stats`."""
    from open_finance_lakehouse_ray.pipelines.textpipe import bpe_token_stats

    out = (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(bpe_token_stats, batch_format="pyarrow")
        .select_columns(["doc_id", "n_ws_tokens", "n_bpe_tokens", "bpe_per_ws"])
        .to_pandas()
        .sort_values("doc_id")
    )
    return pa.Table.from_pandas(out.reset_index(drop=True), preserve_index=False)


Q_DOC_BPE_SQL = r"""
    SELECT doc_id,
           len(regexp_extract_all(text, '\S+')) AS n_ws_tokens,
           len(regexp_extract_all(text,
               '''[a-z]+|[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+')) AS n_bpe_tokens,
           ROUND(len(regexp_extract_all(text,
               '''[a-z]+|[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+'))::DOUBLE
                 / GREATEST(len(regexp_extract_all(text, '\S+')), 1), 4)
               AS bpe_per_ws
    FROM documents ORDER BY doc_id
"""


QUERIES.update({"doc_bpe_tokens": q_doc_bpe_tokens})
ORACLES.update({"doc_bpe_tokens": Q_DOC_BPE_SQL})


# --------------------------------------------- window rank / order statistics


def q_ev_user_rank(sf_dir: str) -> pa.Table:
    """Per-key window ranking (ROW_NUMBER): each user's top-3 events by
    (value DESC, event_id) — the window-function family over a
    high-cardinality partition key. Bounded shuffle via
    ``_keyed_partitions`` (64 hash partitions, one vectorized
    sort+cumcount per partition) — never one Python call per user."""
    ds = _events(sf_dir, ["event_id", "user_id", "value"])

    def rank_part(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            ["user_id", "value", "event_id"],
            ascending=[True, False, True],
            kind="mergesort",
        )
        df["rn"] = df.groupby("user_id", sort=False).cumcount() + 1
        return df.loc[df["rn"] <= 3, ["user_id", "event_id", "value", "rn"]]

    out = (
        _keyed_partitions(ds, ["user_id"], rank_part)
        .to_pandas()
        .sort_values(["user_id", "rn"])
    )
    return pa.Table.from_pandas(out.reset_index(drop=True), preserve_index=False)


Q_EV_USER_RANK_SQL = """
    SELECT user_id, event_id, value, rn FROM (
        SELECT user_id, event_id, value,
               ROW_NUMBER() OVER (PARTITION BY user_id
                   ORDER BY value DESC, event_id) AS rn
        FROM events)
    WHERE rn <= 3 ORDER BY user_id, rn
"""


_QUANTILES = (0.25, 0.50, 0.75, 0.90)
_N_QBINS = 1024


def _qbin(values: np.ndarray, vmin: float, vmax: float) -> np.ndarray:
    """Deterministic bin assignment shared by the histogram and collect
    passes — identical linspace edges + searchsorted in both places."""
    if vmax <= vmin:
        return np.zeros(len(values), dtype=np.int64)
    edges = np.linspace(vmin, vmax, _N_QBINS + 1)
    return np.clip(
        np.searchsorted(edges, values, side="right") - 1, 0, _N_QBINS - 1
    )


def q_ev_type_quantiles(sf_dir: str) -> pa.Table:
    """Distributed EXACT order statistics (SQL ``percentile_disc``:
    sorted rank ``ceil(q*n)``) per group WITHOUT a global sort:

    1. per-type (count, min, max) from map-side partials;
    2. per-(type, bin) histogram (count, bin-min, bin-max) over a
       broadcast 1024-bin grid, combined by a tiny groupby shuffle —
       at most types×1024 metadata rows ever move;
    3. rank arithmetic finds each quantile's bin; a PURE bin
       (min == max) answers immediately, otherwise one filtered pass
       collects only the needed bins' values (~n/1024 each) and picks
       the exact rank with ``np.sort``.

    Driver traffic is bounded by histogram metadata plus the few
    selected bins — never the data. The same two-pass binned-selection
    kernel is how exact medians stay feasible at 100 TB."""
    from ray.data.aggregate import Max, Min, Sum

    ds = _events(sf_dir, ["event_type", "value"])

    def stats_partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas().dropna(subset=["value"])
        agg = df.groupby("event_type")["value"].agg(["count", "min", "max"])
        return pa.Table.from_pandas(
            agg.rename(columns={"count": "cnt", "min": "vmin", "max": "vmax"})
            .reset_index(),
            preserve_index=False,
        )

    stats = (
        ds.map_batches(stats_partial, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            Sum("cnt", alias_name="cnt"),
            Min("vmin", alias_name="vmin"),
            Max("vmax", alias_name="vmax"),
        )
        .to_pandas()
    )
    if stats.empty:
        return pa.table(
            {"event_type": pa.array([], pa.string())}
            | {f"p{int(q * 100)}": pa.array([], pa.float64()) for q in _QUANTILES}
        )
    ranges = {
        r.event_type: (float(r.vmin), float(r.vmax), int(r.cnt))
        for r in stats.itertuples()
    }

    def hist_partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas().dropna(subset=["value"])
        outs = []
        for etype, g in df.groupby("event_type"):
            vmin, vmax, _ = ranges[etype]
            vals = g["value"].to_numpy()
            sub = pd.DataFrame({"bin": _qbin(vals, vmin, vmax), "value": vals})
            agg = sub.groupby("bin")["value"].agg(["count", "min", "max"]).reset_index()
            outs.append(
                pd.DataFrame(
                    {
                        "event_type": etype,
                        "bin": agg["bin"],
                        "cnt": agg["count"],
                        "bmin": agg["min"],
                        "bmax": agg["max"],
                    }
                )
            )
        if not outs:
            return pa.table(
                {
                    "event_type": pa.array([], pa.string()),
                    "bin": pa.array([], pa.int64()),
                    "cnt": pa.array([], pa.int64()),
                    "bmin": pa.array([], pa.float64()),
                    "bmax": pa.array([], pa.float64()),
                }
            )
        return pa.Table.from_pandas(pd.concat(outs), preserve_index=False)

    hist = (
        ds.map_batches(hist_partial, batch_format="pyarrow")
        .groupby(["event_type", "bin"])
        .aggregate(
            Sum("cnt", alias_name="cnt"),
            Min("bmin", alias_name="bmin"),
            Max("bmax", alias_name="bmax"),
        )
        .to_pandas()
        .sort_values(["event_type", "bin"])
    )

    # rank arithmetic on the driver: locate each target's bin
    answers: dict[tuple[str, float], float] = {}
    needed: dict[tuple[str, int], list[tuple[float, int]]] = {}
    for etype, g in hist.groupby("event_type"):
        n = ranges[etype][2]
        cum_before = 0
        targets = [(q, int(np.ceil(q * n)) or 1) for q in _QUANTILES]
        ti = 0
        for row in g.itertuples():
            hi = cum_before + int(row.cnt)
            while ti < len(targets) and targets[ti][1] <= hi:
                q, k = targets[ti]
                if row.bmin == row.bmax:  # pure bin: the value is known
                    answers[(etype, q)] = float(row.bmin)
                else:
                    needed.setdefault((etype, int(row.bin)), []).append(
                        (q, k - cum_before)
                    )
                ti += 1
            cum_before = hi

    if needed:
        _bins: dict[str, list[int]] = {}
        for etype, bn in needed:
            _bins.setdefault(etype, []).append(bn)
        bins_by_type = {k: np.asarray(v, dtype=np.int64) for k, v in _bins.items()}

        def collect(t: pa.Table) -> pa.Table:
            df = t.to_pandas().dropna(subset=["value"])
            outs = []
            for etype, g in df.groupby("event_type"):
                want = bins_by_type.get(etype)
                if want is None:
                    continue
                vmin, vmax, _ = ranges[etype]
                vals = g["value"].to_numpy()
                b = _qbin(vals, vmin, vmax)
                mask = np.isin(b, want)
                if mask.any():
                    outs.append(
                        pd.DataFrame(
                            {"event_type": etype, "bin": b[mask], "value": vals[mask]}
                        )
                    )
            if not outs:
                return pa.table(
                    {
                        "event_type": pa.array([], pa.string()),
                        "bin": pa.array([], pa.int64()),
                        "value": pa.array([], pa.float64()),
                    }
                )
            return pa.Table.from_pandas(pd.concat(outs), preserve_index=False)

        got = ds.map_batches(collect, batch_format="pyarrow").to_pandas()
        for (etype, bn), wants in needed.items():
            vals = np.sort(
                got.loc[
                    (got["event_type"] == etype) & (got["bin"] == bn), "value"
                ].to_numpy()
            )
            for q, r in wants:
                answers[(etype, q)] = float(vals[r - 1])

    types = sorted(ranges)
    return pa.table(
        {"event_type": pa.array(types, pa.string())}
        | {
            f"p{int(q * 100)}": pa.array(
                [answers[(t, q)] for t in types], pa.float64()
            )
            for q in _QUANTILES
        }
    )


Q_EV_TYPE_QUANTILES_SQL = """
    SELECT event_type,
           quantile_disc(value, 0.25) AS p25,
           quantile_disc(value, 0.50) AS p50,
           quantile_disc(value, 0.75) AS p75,
           quantile_disc(value, 0.90) AS p90
    FROM events GROUP BY event_type ORDER BY event_type
"""


QUERIES.update(
    {
        "ev_user_rank": q_ev_user_rank,
        "ev_type_quantiles": q_ev_type_quantiles,
    }
)
ORACLES.update(
    {
        "ev_user_rank": Q_EV_USER_RANK_SQL,
        "ev_type_quantiles": Q_EV_TYPE_QUANTILES_SQL,
    }
)


# ------------------------------------------ repetition + contamination scrub


def q_doc_repetition(sf_dir: str) -> pa.Table:
    """Gopher-style repetition/diversity metrics per document — the
    quality signals a pretraining filter thresholds on (distinct-token
    ratio, top-token count, top-bigram count). One embarrassingly
    parallel ``map_batches`` pass; see :func:`..textpipe.repetition_stats`."""
    from open_finance_lakehouse_ray.pipelines.textpipe import repetition_stats

    out = (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(repetition_stats, batch_format="pyarrow")
        .to_pandas()
        .sort_values("doc_id")
    )
    return pa.Table.from_pandas(out.reset_index(drop=True), preserve_index=False)


Q_DOC_REPETITION_SQL = r"""
    WITH l AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
    toks AS (SELECT doc_id, unnest(ws) AS w FROM l),
    cnt AS (SELECT doc_id, w, count(*) AS c FROM toks GROUP BY doc_id, w),
    base AS (
        SELECT doc_id, sum(c)::BIGINT AS n_tokens,
               count(*)::BIGINT AS n_distinct, max(c)::BIGINT AS top_count
        FROM cnt GROUP BY doc_id
    ),
    big AS (
        SELECT doc_id,
               unnest(list_transform(range(1, len(ws)),
                                     i -> ws[i] || ' ' || ws[i + 1])) AS bg
        FROM l WHERE len(ws) > 1
    ),
    bcnt AS (SELECT doc_id, bg, count(*) AS c FROM big GROUP BY doc_id, bg),
    btop AS (
        SELECT doc_id, max(c)::BIGINT AS top_bigram_count
        FROM bcnt GROUP BY doc_id
    )
    SELECT b.doc_id, n_tokens, n_distinct, top_count,
           COALESCE(top_bigram_count, 0)::BIGINT AS top_bigram_count,
           ROUND(n_distinct::DOUBLE / n_tokens, 4) AS distinct_ratio
    FROM base b LEFT JOIN btop USING (doc_id) ORDER BY doc_id
"""


def q_doc_term_scrub(sf_dir: str) -> pa.Table:
    """Denylist-term redaction (benchmark-contamination / PII scrub) —
    actor-pool compiled-regex stage, two Arrow RE2 kernels per batch; see
    :class:`..textpipe.TermScrubber`."""
    from open_finance_lakehouse_ray.pipelines.textpipe import TermScrubber

    out = (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(TermScrubber, batch_format="pyarrow", concurrency=2)
        .select_columns(["doc_id", "scrubbed", "n_hits"])
        .to_pandas()
        .sort_values("doc_id")
    )
    return pa.Table.from_pandas(out.reset_index(drop=True), preserve_index=False)


Q_DOC_TERM_SCRUB_SQL = r"""
    SELECT doc_id,
           regexp_replace(text, '\b(hash|key|spark)\b', '[SCRUBBED]', 'g')
               AS scrubbed,
           len(regexp_extract_all(text, '\b(hash|key|spark)\b'))::BIGINT
               AS n_hits
    FROM documents ORDER BY doc_id
"""


QUERIES.update(
    {
        "doc_repetition": q_doc_repetition,
        "doc_term_scrub": q_doc_term_scrub,
    }
)
ORACLES.update(
    {
        "doc_repetition": Q_DOC_REPETITION_SQL,
        "doc_term_scrub": Q_DOC_TERM_SCRUB_SQL,
    }
)


# ----------------------------------------------- first-class as-of operator


def q_ev_asof_view_value(sf_dir: str) -> pa.Table:
    """J4 through the FIRST-CLASS operator: every click joined to the same
    user's latest strictly-earlier view (its ts AND value) via
    :func:`..join.asof_join` — checked against DuckDB's native
    ``ASOF LEFT JOIN``. The right side is deduped per (user_id, ts) keep
    max event_id first, so the as-of pick is deterministic in both
    engines."""
    from open_finance_lakehouse_ray.pipelines.join import asof_join

    ev = _events(sf_dir, ["event_id", "ts", "user_id", "event_type", "value"])
    clicks = ev.filter(expr="event_type == 'click'").select_columns(
        ["event_id", "user_id", "ts"]
    )

    def dedup_views(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        df = df.drop_duplicates(["user_id", "ts"], keep="last")
        out = df[["user_id", "ts"]].copy()
        out["view_ts"] = df["ts"]
        out["view_value"] = df["value"]
        return out

    views = _keyed_partitions(
        ev.filter(expr="event_type == 'view'").select_columns(
            ["event_id", "user_id", "ts", "value"]
        ),
        ["user_id"],
        dedup_views,
    )
    out = (
        asof_join(
            clicks, views, on="ts", by="user_id",
            direction="backward", allow_exact_matches=False,
        )
        .select_columns(["event_id", "user_id", "view_ts", "view_value"])
        .to_pandas()
        .sort_values("event_id")
    )
    return pa.Table.from_pandas(out.reset_index(drop=True), preserve_index=False)


Q_EV_ASOF_VIEW_VALUE_SQL = """
    WITH clicks AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
    ),
    views AS (
        SELECT user_id, ts, value FROM events WHERE event_type = 'view'
        QUALIFY row_number() OVER (
            PARTITION BY user_id, ts ORDER BY event_id DESC) = 1
    )
    SELECT c.event_id, c.user_id, v.ts AS view_ts, v.value AS view_value
    FROM clicks c ASOF LEFT JOIN views v
      ON c.user_id = v.user_id AND c.ts > v.ts
    ORDER BY c.event_id
"""


QUERIES.update({"ev_asof_view_value": q_ev_asof_view_value})
ORACLES.update({"ev_asof_view_value": Q_EV_ASOF_VIEW_VALUE_SQL})


# ------------------------------------------------------------- DELETE WHERE


def q_tx_delete_where(sf_dir: str) -> pa.Table:
    """Delta-DELETE analog end to end: ingest → a pure range delete (stats
    pruning + whole-file drops where provable) → a residual delete
    (assistant turns shipped in 1996) → scan. The oracle is the complement
    WHERE clause over the same deduped construction."""
    from datetime import date

    from open_finance_lakehouse_ray.pipelines.delete import delete_where
    from open_finance_lakehouse_ray.pipelines.ingest import ingest_dataset
    from open_finance_lakehouse_ray.pipelines.merge import dedup_exact

    root = _scratch_root("delete")
    tx = dedup_exact(transcripts_from_lineitem(sf_dir), num_buckets=16)
    ingest_dataset(
        tx.repartition(24), root, job_id="dl-ingest", summary={"keys_unique": True, "key_cols": ["conv_id", "turn_idx"]}
    )
    delete_where(
        root,
        job_id="dl-range",
        conv_id_range=("conv-0000000001", "conv-0000000400"),
    )
    epoch = date(1970, 1, 1)
    day_us = 86_400_000_000  # ts is timestamp[us]; stats/mask compare epoch-µs
    delete_where(
        root,
        job_id="dl-resid",
        ts_range=(
            (date(1996, 1, 1) - epoch).days * day_us,
            (date(1996, 12, 31) - epoch).days * day_us,
        ),
        match=lambda t: pc.equal(t["role"], "assistant"),
    )
    return _scan_and_cleanup(root)


Q_TX_DELETE_SQL = f"""
    WITH base AS ({TX_DEDUP_SQL})
    SELECT conv_id, turn_idx, role, text, tool, ts FROM base
    WHERE NOT (conv_id BETWEEN 'conv-0000000001' AND 'conv-0000000400')
      AND NOT (role = 'assistant'
               AND ts BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                          AND TIMESTAMP '1996-12-31 00:00:00')
    ORDER BY conv_id, turn_idx
"""


QUERIES.update({"tx_delete_where": q_tx_delete_where})
ORACLES.update({"tx_delete_where": Q_TX_DELETE_SQL})


# --------------------------------------------------------- schema evolution


def q_tx_schema_evolution(sf_dir: str) -> pa.Table:
    """Delta-mergeSchema analog end to end: ingest the transcript base
    (schema recorded in the commit), append a second corpus carrying an
    extra ``score`` column with ``merge_schema=True`` (no rewrite of old
    files), compact across the evolution boundary (mixed-schema bins),
    then scan — pre-evolution rows surface NULL scores at the evolved
    schema. Oracle: UNION ALL with an explicit NULL column."""
    from open_finance_lakehouse_ray.pipelines.compact import compact
    from open_finance_lakehouse_ray.pipelines.ingest import ingest_dataset
    from open_finance_lakehouse_ray.pipelines.merge import dedup_exact

    root = _scratch_root("evolve")
    base = dedup_exact(transcripts_from_lineitem(sf_dir), num_buckets=16)
    ingest_dataset(
        base.repartition(16), root, job_id="sv-base", summary={"keys_unique": True, "key_cols": ["conv_id", "turn_idx"]}
    )

    def to_ext(t: pa.Table) -> pa.Table:
        conv = pc.utf8_replace_slice(t["conv_id"], 0, 4, "convx")
        score = pc.cast(
            pc.list_element(pc.split_pattern(t["text"], ":"), 3), pa.float64()
        )
        return pa.table(
            {
                "conv_id": conv,
                "turn_idx": t["turn_idx"],
                "role": t["role"],
                "text": t["text"],
                "tool": t["tool"],
                "ts": t["ts"],
                "score": score,
            }
        )

    ext = base.map_batches(to_ext, batch_format="pyarrow")
    ingest_dataset(
        ext.repartition(16), root, job_id="sv-ext", validate=False, merge_schema=True
    )
    compact(root, job_id="sv-compact", target_bytes=32 * 1024 * 1024)
    return _scan_and_cleanup(root)


Q_TX_SCHEMA_EVOLUTION_SQL = f"""
    WITH base AS ({TX_DEDUP_SQL}),
    ext AS (
        SELECT 'convx' || substr(conv_id, 5) AS conv_id, turn_idx, role,
               text, tool, ts,
               CAST(split_part(text, ':', 4) AS DOUBLE) AS score
        FROM base
    )
    SELECT conv_id, turn_idx, role, text, tool, ts,
           CAST(NULL AS DOUBLE) AS score
    FROM base
    UNION ALL
    SELECT * FROM ext
    ORDER BY conv_id, turn_idx
"""


QUERIES.update({"tx_schema_evolution": q_tx_schema_evolution})
ORACLES.update({"tx_schema_evolution": Q_TX_SCHEMA_EVOLUTION_SQL})


# --------------------------------------------------------- change data feed


def q_tx_change_feed(sf_dir: str) -> pa.Table:
    """Delta CDF analog: ingest → MERGE (updates/inserts/stale) → DELETE a
    conv range → ``change_feed`` between the post-ingest snapshot and the
    head. Only files removed/added between the versions are read; rows
    merely moved by rewrites cancel. Oracle: FULL OUTER JOIN of the two
    reconstructed states keyed on (conv_id, turn_idx)."""
    import shutil

    from open_finance_lakehouse_ray.pipelines.cdf import change_feed
    from open_finance_lakehouse_ray.pipelines.delete import delete_where
    from open_finance_lakehouse_ray.pipelines.ingest import ingest_dataset
    from open_finance_lakehouse_ray.pipelines.merge import dedup_exact, merge_into
    from open_finance_lakehouse_ray.state.txlog import TableLog

    root = _scratch_root("cdf")
    try:
        tx = dedup_exact(transcripts_from_lineitem(sf_dir), num_buckets=16)
        ingest_dataset(
            tx.repartition(24), root, job_id="cf-ingest",
            summary={"keys_unique": True, "key_cols": ["conv_id", "turn_idx"]},
        )
        v0 = TableLog(root).current_version()
        updates = _merge_updates(
            dedup_exact(transcripts_from_lineitem(sf_dir), num_buckets=16)
        )
        merge_into(root, updates, job_id="cf-merge", num_buckets=16)
        delete_where(
            root, job_id="cf-del",
            conv_id_range=("conv-0000000001", "conv-0000000500"),
        )
        out = (
            change_feed(root, from_version=v0)
            .to_pandas()
            .sort_values(["conv_id", "turn_idx", "_change_type"], kind="mergesort")
            .reset_index(drop=True)
        )
        return pa.Table.from_pandas(out, preserve_index=False)
    finally:
        shutil.rmtree(root, ignore_errors=True)


Q_TX_CHANGE_FEED_SQL = f"""
    WITH oldt AS ({TX_DEDUP_SQL}),
    newt AS (
        SELECT * FROM ({Q_TX_MERGE_SQL})
        WHERE NOT (conv_id BETWEEN 'conv-0000000001' AND 'conv-0000000500')
    ),
    j AS (
        SELECT o.conv_id AS o_conv, o.turn_idx AS o_turn, o.role AS o_role,
               o.text AS o_text, o.tool AS o_tool, o.ts AS o_ts,
               n.conv_id AS n_conv, n.turn_idx AS n_turn, n.role AS n_role,
               n.text AS n_text, n.tool AS n_tool, n.ts AS n_ts
        FROM oldt o FULL OUTER JOIN newt n
          ON o.conv_id = n.conv_id AND o.turn_idx = n.turn_idx
    ),
    changed AS (
        SELECT * FROM j
        WHERE o_conv IS NOT NULL AND n_conv IS NOT NULL
          AND (o_text IS DISTINCT FROM n_text OR o_ts IS DISTINCT FROM n_ts
               OR o_role IS DISTINCT FROM n_role
               OR o_tool IS DISTINCT FROM n_tool)
    )
    SELECT conv_id, turn_idx, role, text, tool, ts, _change_type FROM (
        SELECT n_conv AS conv_id, n_turn AS turn_idx, n_role AS role,
               n_text AS text, n_tool AS tool, n_ts AS ts,
               'insert' AS _change_type
        FROM j WHERE o_conv IS NULL
        UNION ALL
        SELECT o_conv, o_turn, o_role, o_text, o_tool, o_ts, 'delete'
        FROM j WHERE n_conv IS NULL
        UNION ALL
        SELECT o_conv, o_turn, o_role, o_text, o_tool, o_ts, 'update_preimage'
        FROM changed
        UNION ALL
        SELECT n_conv, n_turn, n_role, n_text, n_tool, n_ts, 'update_postimage'
        FROM changed
    )
    ORDER BY conv_id, turn_idx, _change_type
"""


QUERIES.update({"tx_change_feed": q_tx_change_feed})
ORACLES.update({"tx_change_feed": Q_TX_CHANGE_FEED_SQL})


# ------------------------------------------------------------- UPDATE WHERE


def q_tx_update_where(sf_dir: str) -> pa.Table:
    """Delta-UPDATE analog: ingest → UPDATE a conv range's user turns
    (prefix the text, re-tag the tool) through the stats-pruned rewrite →
    scan. Oracle: the same assignments as CASE expressions."""
    from open_finance_lakehouse_ray.pipelines.delete import update_where
    from open_finance_lakehouse_ray.pipelines.ingest import ingest_dataset
    from open_finance_lakehouse_ray.pipelines.merge import dedup_exact

    root = _scratch_root("update")
    tx = dedup_exact(transcripts_from_lineitem(sf_dir), num_buckets=16)
    ingest_dataset(
        tx.repartition(24), root, job_id="up-ingest", summary={"keys_unique": True, "key_cols": ["conv_id", "turn_idx"]}
    )
    update_where(
        root,
        job_id="up-range",
        conv_id_range=("conv-0000000001", "conv-0000003000"),
        match=lambda t: pc.equal(t["role"], "user"),
        assign={
            "text": lambda t: pc.binary_join_element_wise("EDIT:", t["text"], ""),
            "tool": "editor",
        },
    )
    return _scan_and_cleanup(root)


Q_TX_UPDATE_SQL = f"""
    WITH base AS ({TX_DEDUP_SQL})
    SELECT conv_id, turn_idx, role,
           CASE WHEN conv_id BETWEEN 'conv-0000000001' AND 'conv-0000003000'
                     AND role = 'user'
                THEN 'EDIT:' || text ELSE text END AS text,
           CASE WHEN conv_id BETWEEN 'conv-0000000001' AND 'conv-0000003000'
                     AND role = 'user'
                THEN 'editor' ELSE tool END AS tool,
           ts
    FROM base
    ORDER BY conv_id, turn_idx
"""


QUERIES.update({"tx_update_where": q_tx_update_where})
ORACLES.update({"tx_update_where": Q_TX_UPDATE_SQL})


def q_ev_asof_next_purchase(sf_dir: str) -> pa.Table:
    """Forward as-of through the first-class operator: every click joined
    to the same user's earliest at-or-after purchase — checked against
    DuckDB's native forward ASOF (``l.ts <= r.ts``). Right side deduped
    per (user_id, ts) keep max event_id for a deterministic pick."""
    from open_finance_lakehouse_ray.pipelines.join import asof_join

    ev = _events(sf_dir, ["event_id", "ts", "user_id", "event_type", "value"])
    clicks = ev.filter(expr="event_type == 'click'").select_columns(
        ["event_id", "user_id", "ts"]
    )

    def dedup_purchases(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        df = df.drop_duplicates(["user_id", "ts"], keep="last")
        out = df[["user_id", "ts"]].copy()
        out["purchase_ts"] = df["ts"]
        out["purchase_value"] = df["value"]
        return out

    purchases = _keyed_partitions(
        ev.filter(expr="event_type == 'purchase'").select_columns(
            ["event_id", "user_id", "ts", "value"]
        ),
        ["user_id"],
        dedup_purchases,
    )
    out = (
        asof_join(
            clicks, purchases, on="ts", by="user_id", direction="forward",
        )
        .select_columns(["event_id", "user_id", "purchase_ts", "purchase_value"])
        .to_pandas()
        .sort_values("event_id")
    )
    return pa.Table.from_pandas(out.reset_index(drop=True), preserve_index=False)


Q_EV_ASOF_NEXT_PURCHASE_SQL = """
    WITH clicks AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
    ),
    purch AS (
        SELECT user_id, ts, value FROM events WHERE event_type = 'purchase'
        QUALIFY row_number() OVER (
            PARTITION BY user_id, ts ORDER BY event_id DESC) = 1
    )
    SELECT c.event_id, c.user_id, p.ts AS purchase_ts,
           p.value AS purchase_value
    FROM clicks c ASOF LEFT JOIN purch p
      ON c.user_id = p.user_id AND c.ts <= p.ts
    ORDER BY c.event_id
"""


QUERIES.update({"ev_asof_next_purchase": q_ev_asof_next_purchase})
ORACLES.update({"ev_asof_next_purchase": Q_EV_ASOF_NEXT_PURCHASE_SQL})


def q_tx_clone_divergence(sf_dir: str) -> pa.Table:
    """Shallow clone end to end: ingest → zero-copy clone → DELETE on the
    clone only → scan BOTH tables tagged by side. The oracle rebuilds the
    source once and derives the clone as its complement — proving the
    clone diverged AND the source stayed byte-identical."""
    import shutil

    from open_finance_lakehouse_ray.pipelines.clone import clone_table
    from open_finance_lakehouse_ray.pipelines.delete import delete_where
    from open_finance_lakehouse_ray.pipelines.ingest import ingest_dataset
    from open_finance_lakehouse_ray.pipelines.merge import dedup_exact

    root = _scratch_root("clonesrc")
    dst = root + "-clone"
    try:
        tx = dedup_exact(transcripts_from_lineitem(sf_dir), num_buckets=16)
        ingest_dataset(
            tx.repartition(16), root, job_id="cl-ingest",
            summary={"keys_unique": True, "key_cols": ["conv_id", "turn_idx"]},
        )
        clone_table(root, dst, job_id="cl-clone")
        delete_where(
            dst, job_id="cl-del",
            conv_id_range=("conv-0000000001", "conv-0000000500"),
        )
        frames = []
        for side, r in (("source", root), ("clone", dst)):
            t = _scan_sorted(r)
            frames.append(
                t.add_column(0, "side", pa.array([side] * t.num_rows, pa.string()))
            )
        out = pa.concat_tables(frames)
        return out.sort_by(
            [("side", "descending"), ("conv_id", "ascending"),
             ("turn_idx", "ascending")]
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
        shutil.rmtree(dst, ignore_errors=True)


Q_TX_CLONE_DIVERGENCE_SQL = f"""
    WITH base AS ({TX_DEDUP_SQL})
    SELECT * FROM (
        SELECT 'source' AS side, conv_id, turn_idx, role, text, tool, ts
        FROM base
        UNION ALL
        SELECT 'clone', conv_id, turn_idx, role, text, tool, ts FROM base
        WHERE NOT (conv_id BETWEEN 'conv-0000000001' AND 'conv-0000000500')
    )
    ORDER BY side DESC, conv_id, turn_idx
"""


QUERIES.update({"tx_clone_divergence": q_tx_clone_divergence})
ORACLES.update({"tx_clone_divergence": Q_TX_CLONE_DIVERGENCE_SQL})


# ---------------------------------------------------------- write-time CDC


def q_tx_cdc_commits(sf_dir: str) -> pa.Table:
    """Write-time CDC end to end: ingest (v1) → DELETE a conv range (v2)
    → UPDATE user turns in a later range (v3) → replay the RECORDED
    per-commit feed (zero recompute, ``granularity="commits"``). The
    oracle reconstructs each commit's image independently, including the
    exact ``_commit_version`` stamps."""
    import shutil

    from open_finance_lakehouse_ray.pipelines.cdf import change_feed
    from open_finance_lakehouse_ray.pipelines.delete import delete_where, update_where
    from open_finance_lakehouse_ray.pipelines.ingest import ingest_dataset
    from open_finance_lakehouse_ray.pipelines.merge import dedup_exact
    from open_finance_lakehouse_ray.state.txlog import TableLog

    root = _scratch_root("cdc")
    try:
        tx = dedup_exact(transcripts_from_lineitem(sf_dir), num_buckets=16)
        ingest_dataset(
            tx.repartition(24), root, job_id="cc-ingest",
            summary={"keys_unique": True, "key_cols": ["conv_id", "turn_idx"]},
        )
        v0 = TableLog(root).current_version()
        delete_where(
            root, job_id="cc-del",
            conv_id_range=("conv-0000000001", "conv-0000020000"),
        )
        update_where(
            root, job_id="cc-upd",
            conv_id_range=("conv-0000050000", "conv-0000090000"),
            match=lambda t: pc.equal(t["role"], "user"),
            assign={"tool": "editor"},
        )
        out = (
            change_feed(root, from_version=v0, granularity="commits")
            .to_pandas()
            .sort_values(
                ["conv_id", "turn_idx", "_change_type"], kind="mergesort"
            )
            .reset_index(drop=True)
        )
        return pa.Table.from_pandas(out, preserve_index=False)
    finally:
        shutil.rmtree(root, ignore_errors=True)


Q_TX_CDC_COMMITS_SQL = f"""
    WITH base AS ({TX_DEDUP_SQL}),
    deleted AS (
        SELECT * FROM base
        WHERE conv_id BETWEEN 'conv-0000000001' AND 'conv-0000020000'
    ),
    updated AS (
        SELECT * FROM base
        WHERE conv_id BETWEEN 'conv-0000050000' AND 'conv-0000090000'
          AND role = 'user'
    )
    SELECT conv_id, turn_idx, role, text, tool, ts, _change_type,
           _commit_version
    FROM (
        SELECT conv_id, turn_idx, role, text, tool, ts,
               'delete' AS _change_type, {{v_del}} AS _commit_version
        FROM deleted
        UNION ALL
        SELECT conv_id, turn_idx, role, text, tool, ts,
               'update_preimage', {{v_upd}}
        FROM updated
        UNION ALL
        SELECT conv_id, turn_idx, role, text, 'editor', ts,
               'update_postimage', {{v_upd}}
        FROM updated
    )
    ORDER BY conv_id, turn_idx, _change_type
""".format(v_del=2, v_upd=3)


QUERIES.update({"tx_cdc_commits": q_tx_cdc_commits})
ORACLES.update({"tx_cdc_commits": Q_TX_CDC_COMMITS_SQL})


# --------------------------------------------------------------------------
# round-4 additions: span-level exact dedup, RAG chunking, RESTORE rewind
# --------------------------------------------------------------------------


def q_doc_dup_spans(sf_dir: str) -> pa.Table:
    """Exact duplicated-substring spans (>= 15 tokens shared by >= 2 docs)
    — the span-level dedup of Lee et al. 2022, distributed as positional
    k-gram matching (see :func:`..dedup.dup_spans` for the scale shape).
    Recall 1.0 by construction, so the DuckDB all-grams oracle
    hash-checks it end to end."""
    from open_finance_lakehouse_ray.pipelines.dedup import dup_spans

    return dup_spans(_docs(sf_dir, ["doc_id", "text"]), k=15)


Q_DOC_DUP_SPANS_SQL = """
    WITH toks AS (SELECT doc_id, string_split(text, ' ') w FROM documents),
    gl AS (SELECT doc_id,
                  [array_to_string(w[i:i+14], ' ')
                   for i in range(1, len(w) - 13)] g
           FROM toks WHERE len(w) >= 15),
    grams AS (SELECT doc_id, unnest(g) AS gram,
                     generate_subscripts(g, 1) AS pos
              FROM gl),
    dup AS (SELECT gram FROM grams
            GROUP BY gram HAVING count(DISTINCT doc_id) >= 2),
    m AS (SELECT doc_id, pos FROM grams
          WHERE gram IN (SELECT gram FROM dup)),
    isl AS (SELECT doc_id, pos,
                   pos - row_number() OVER (
                       PARTITION BY doc_id ORDER BY pos) AS grp
            FROM m)
    SELECT doc_id, CAST(min(pos) AS BIGINT) AS span_start,
           CAST(count(*) + 14 AS BIGINT) AS span_len
    FROM isl GROUP BY doc_id, grp ORDER BY doc_id, span_start
"""


def q_doc_chunks(sf_dir: str) -> pa.Table:
    """Overlapping token-window chunking (window 32, stride 24) — the RAG
    retrieval-corpus prep; pure row-expansion map, no shuffle."""
    from open_finance_lakehouse_ray.pipelines.textpipe import chunk_documents

    out = (
        chunk_documents(_docs(sf_dir, ["doc_id", "text"]))
        .to_pandas()
        .sort_values(["doc_id", "chunk_idx"])
    )
    return pa.Table.from_pandas(out.reset_index(drop=True), preserve_index=False)


Q_DOC_CHUNKS_SQL = """
    WITH toks AS (SELECT doc_id, string_split(text, ' ') w FROM documents),
    st AS (SELECT doc_id, w,
                  [s for s in range(1, len(w) + 1, 24)] starts
           FROM toks),
    ch AS (SELECT doc_id, w,
                  unnest(starts) AS chunk_start,
                  generate_subscripts(starts, 1) - 1 AS chunk_idx
           FROM st)
    SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
           CAST(chunk_start AS BIGINT) AS chunk_start,
           CAST(len(w[chunk_start:chunk_start + 31]) AS BIGINT) AS n_tokens,
           array_to_string(w[chunk_start:chunk_start + 31], ' ') AS chunk_text
    FROM ch ORDER BY doc_id, chunk_idx
"""


def q_tx_restore_rewind(sf_dir: str) -> pa.Table:
    """RESTORE VERSION AS OF end to end (Delta RESTORE analog): ingest →
    destructive delete → compact (the delete's rewrite output is itself
    rewritten, so restore must resurrect files two generations back) →
    restore to the post-ingest version → a post-restore delete proving
    the restored head is fully functional (stats pruning intact). Oracle:
    the base construction minus only the post-restore delete."""
    from open_finance_lakehouse_ray.pipelines.compact import compact
    from open_finance_lakehouse_ray.pipelines.delete import delete_where
    from open_finance_lakehouse_ray.pipelines.ingest import ingest_dataset
    from open_finance_lakehouse_ray.pipelines.merge import dedup_exact
    from open_finance_lakehouse_ray.pipelines.restore import restore

    root = _scratch_root("restore")
    tx = dedup_exact(transcripts_from_lineitem(sf_dir), num_buckets=16)
    snap = ingest_dataset(
        tx.repartition(16),
        root,
        job_id="rs-ingest",
        summary={"keys_unique": True, "key_cols": ["conv_id", "turn_idx"]},
    )
    delete_where(
        root,
        job_id="rs-del-wide",
        conv_id_range=("conv-0000000001", "conv-0000003000"),
    )
    compact(root, job_id="rs-compact", target_bytes=32 * 1024 * 1024)
    restore(root, to_version=snap.version, job_id="rs-restore")
    delete_where(
        root,
        job_id="rs-del-post",
        conv_id_range=("conv-0000000100", "conv-0000000150"),
    )
    return _scan_and_cleanup(root)


Q_TX_RESTORE_SQL = f"""
    WITH base AS ({TX_DEDUP_SQL})
    SELECT conv_id, turn_idx, role, text, tool, ts FROM base
    WHERE NOT (conv_id BETWEEN 'conv-0000000100' AND 'conv-0000000150')
    ORDER BY conv_id, turn_idx
"""


QUERIES.update(
    {
        "doc_dup_spans": q_doc_dup_spans,
        "doc_chunks": q_doc_chunks,
        "tx_restore_rewind": q_tx_restore_rewind,
    }
)
ORACLES.update(
    {
        "doc_dup_spans": Q_DOC_DUP_SPANS_SQL,
        "doc_chunks": Q_DOC_CHUNKS_SQL,
        "tx_restore_rewind": Q_TX_RESTORE_SQL,
    }
)

# --------------------------------------------------------------------------
# round-5 additions: span-cut corpus rewrite, semantic (embedding-cluster)
# dedup
# --------------------------------------------------------------------------


def q_doc_span_scrub(sf_dir: str) -> pa.Table:
    """Span-CUT corpus rewrite — the removal step of Lee et al. 2022's
    exact-substring dedup: every token covered by a duplicated span of
    length >= 40 is cut and the corpus re-emits (see
    :func:`..dedup.span_scrub` for the two-bounded-shuffle scale shape).
    Threshold 40 sits inside the sf0.01 span-length population (23–93),
    so both the cut and the below-threshold-kept paths execute."""
    from open_finance_lakehouse_ray.pipelines.dedup import span_scrub

    out = (
        span_scrub(_docs(sf_dir, ["doc_id", "text"]), k=15, min_span=40)
        .to_pandas()
        .sort_values("doc_id")
    )
    return pa.Table.from_pandas(out.reset_index(drop=True), preserve_index=False)


Q_DOC_SPAN_SCRUB_SQL = """
    WITH toks AS (SELECT doc_id, string_split(text, ' ') w FROM documents),
    gl AS (SELECT doc_id,
                  [array_to_string(w[i:i+14], ' ')
                   for i in range(1, len(w) - 13)] g
           FROM toks WHERE len(w) >= 15),
    grams AS (SELECT doc_id, unnest(g) AS gram,
                     generate_subscripts(g, 1) AS pos
              FROM gl),
    dup AS (SELECT gram FROM grams
            GROUP BY gram HAVING count(DISTINCT doc_id) >= 2),
    m AS (SELECT doc_id, pos FROM grams
          WHERE gram IN (SELECT gram FROM dup)),
    isl AS (SELECT doc_id, pos,
                   pos - row_number() OVER (
                       PARTITION BY doc_id ORDER BY pos) AS grp
            FROM m),
    spans AS (SELECT doc_id, min(pos) AS s, count(*) + 14 AS l
              FROM isl GROUP BY doc_id, grp
              HAVING count(*) + 14 >= 40),
    cov AS (SELECT DISTINCT doc_id, p FROM
                (SELECT doc_id, unnest(range(s, s + l)) AS p FROM spans)),
    tok_rows AS (SELECT doc_id, unnest(w) AS tok,
                        generate_subscripts(w, 1) AS p
                 FROM toks),
    j AS (SELECT t.doc_id, t.tok, t.p, (c.p IS NOT NULL) AS covered
          FROM tok_rows t LEFT JOIN cov c
          ON t.doc_id = c.doc_id AND t.p = c.p)
    SELECT doc_id,
           coalesce(string_agg(tok, ' ' ORDER BY p)
                    FILTER (WHERE NOT covered), '') AS text_scrubbed,
           CAST(count(*) FILTER (WHERE covered) AS BIGINT) AS n_removed
    FROM j GROUP BY doc_id ORDER BY doc_id
"""


QUERIES.update({"doc_span_scrub": q_doc_span_scrub})
ORACLES.update({"doc_span_scrub": Q_DOC_SPAN_SCRUB_SQL})

def q_emb_semantic_dup(sf_dir: str) -> pa.Table:
    """SemDeDup-style semantic dedup: deterministic k=8 cluster assignment
    (the emb_kmeans_assign body) + in-cluster cosine prune at 0.35,
    lowest-id witness wins (see :func:`..dedup.semantic_dedup` for the
    bounded per-cluster scale shape). Ids only in the output — cosine
    floats stay engine-side to avoid f32/f64 hash skew."""
    from open_finance_lakehouse_ray.pipelines.dedup import semantic_dedup

    return semantic_dedup(_emb(sf_dir), k=8, threshold=0.35)


Q_EMB_SEMANTIC_DUP_SQL = """
    WITH c AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings
               WHERE vec_id < 8),
    d AS (SELECT e.vec_id, c.cid,
                 list_distance(CAST(e.embedding AS DOUBLE[]),
                               CAST(c.cv AS DOUBLE[])) AS dist
          FROM embeddings e CROSS JOIN c),
    a AS (SELECT vec_id, cid,
                 row_number() OVER (PARTITION BY vec_id
                                    ORDER BY dist, cid) AS rk
          FROM d),
    asg AS (SELECT vec_id, cid AS cluster FROM a WHERE rk = 1),
    dup AS (SELECT x.vec_id, min(y.vec_id) AS dup_of
            FROM asg x
            JOIN asg y ON x.cluster = y.cluster AND y.vec_id < x.vec_id
            JOIN embeddings ex ON ex.vec_id = x.vec_id
            JOIN embeddings ey ON ey.vec_id = y.vec_id
            WHERE list_cosine_similarity(ex.embedding, ey.embedding) >= 0.35
            GROUP BY x.vec_id)
    SELECT asg.vec_id, CAST(asg.cluster AS BIGINT) AS cluster,
           CAST(dup.dup_of AS BIGINT) AS dup_of
    FROM asg LEFT JOIN dup USING (vec_id)
    ORDER BY asg.vec_id
"""


QUERIES.update({"emb_semantic_dup": q_emb_semantic_dup})
ORACLES.update({"emb_semantic_dup": Q_EMB_SEMANTIC_DUP_SQL})


def _mod_id_filter(id_col: str, mod: int, rem: int, flip: bool = False):
    """``map_batches`` fn keeping rows where ``id % mod == rem`` (or its
    complement) — the history/incoming split used by the incremental-index
    gate queries, defined once so the three gates stay in sync."""

    def f(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        m = (ids % mod) == rem
        return t.filter(pa.array(~m if flip else m))

    return f


def q_doc_incremental_dedup(sf_dir: str) -> pa.Table:
    """Incremental dedup of an incoming shard against a PERSISTED corpus
    identity index (the daily-ingest pattern: O(new shard) work +
    16 B/doc index reads, never a rescan of historical text — see
    :func:`..dedup.incremental_dedup` for the bucketed shape). History =
    docs with ``doc_id % 3 != 0`` builds the index; the incoming shard is
    the remaining docs UNION a ``+20000``-shifted copy of every
    ``doc_id % 5 == 1`` doc, seeding both cross-shard duplicates (copies
    of history docs must drop) and within-shard duplicates (a copy whose
    original is also incoming keeps the smaller id). Novel-keeper ids
    return; identity is ``md5(text)``, mirrored exactly by the oracle's
    ``md5()``."""
    import shutil

    from open_finance_lakehouse_ray.pipelines.dedup import (
        build_hash_index,
        incremental_dedup,
    )

    docs = _docs(sf_dir, ["doc_id", "text"])

    history = docs.map_batches(_mod_id_filter("doc_id", 3, 0, flip=True), batch_format="pyarrow")
    incoming = docs.map_batches(_mod_id_filter("doc_id", 3, 0), batch_format="pyarrow").union(
        docs.map_batches(_mod_id_filter("doc_id", 5, 1), batch_format="pyarrow").map_batches(
            lambda t: pa.table(
                {"doc_id": pc.add(t["doc_id"], 20_000), "text": t["text"]}
            ),
            batch_format="pyarrow",
        )
    )
    root = _scratch_root("incdedup")
    try:
        build_hash_index(history, root)
        out = (
            incremental_dedup(incoming, root, update_index=False)
            .select_columns(["doc_id"])
            .to_pandas()
            .sort_values("doc_id")
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
    out["doc_id"] = out["doc_id"].astype("int64")
    return pa.Table.from_pandas(out.reset_index(drop=True), preserve_index=False)


Q_DOC_INC_DEDUP_SQL = """
    WITH history AS (SELECT text FROM documents WHERE doc_id % 3 <> 0),
    incoming AS (
        SELECT doc_id, text FROM documents WHERE doc_id % 3 = 0
        UNION ALL
        SELECT doc_id + 20000 AS doc_id, text FROM documents
        WHERE doc_id % 5 = 1
    )
    SELECT doc_id FROM incoming i
    WHERE NOT EXISTS (SELECT 1 FROM history h
                      WHERE md5(h.text) = md5(i.text))
    QUALIFY row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) = 1
    ORDER BY doc_id
"""


QUERIES.update({"doc_incremental_dedup": q_doc_incremental_dedup})
ORACLES.update({"doc_incremental_dedup": Q_DOC_INC_DEDUP_SQL})


def q_doc_incremental_near_dup(sf_dir: str) -> pa.Table:
    """Incremental NEAR-dup screening of an incoming shard against a
    persisted MinHash band index (the fuzzy analog of
    `doc_incremental_dedup`: O(shard) candidate generation, historical
    text touched only for candidate partners). History = docs with
    ``doc_id % 3 != 0``; the incoming shard is the remaining docs UNION a
    last-word-edited variant (``+30000``-shifted id, last token →
    'freshtail') of every ``doc_id % 10 == 1`` doc — long variants land
    above the 0.8 exact-Jaccard threshold, short ones legitimately fall
    below it, and both sides compute the same exact Jaccard so the gate
    is hash-exact (LSH recall is the only approximation, ~1.0 at these
    thresholds). Returns (id_a=incoming, id_b=history, jaccard)."""
    import shutil

    from open_finance_lakehouse_ray.pipelines.dedup import (
        build_band_index,
        incremental_near_dup,
    )

    docs = _docs(sf_dir, ["doc_id", "text"])

    def _variant(t: pa.Table) -> pa.Table:
        texts = []
        for s in t["text"].to_pylist():
            w = s.split(" ")
            w[-1] = "freshtail"
            texts.append(" ".join(w))
        return pa.table(
            {
                "doc_id": pc.add(t["doc_id"], 30_000),
                "text": pa.array(texts, pa.string()),
            }
        )

    history = docs.map_batches(_mod_id_filter("doc_id", 3, 0, flip=True), batch_format="pyarrow")
    incoming = docs.map_batches(_mod_id_filter("doc_id", 3, 0), batch_format="pyarrow").union(
        docs.map_batches(_mod_id_filter("doc_id", 10, 1), batch_format="pyarrow").map_batches(
            _variant, batch_format="pyarrow"
        )
    )
    root = _scratch_root("incnd")
    try:
        build_band_index(history, root)
        out = incremental_near_dup(
            incoming, root, history, threshold=0.8
        ).to_pandas()
    finally:
        shutil.rmtree(root, ignore_errors=True)
    out["jaccard"] = _round_half_away(out["jaccard"], 3)
    out = out.sort_values(["id_a", "id_b"]).reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


Q_DOC_INC_NEAR_DUP_SQL = """
    WITH history AS (SELECT doc_id, text FROM documents WHERE doc_id % 3 <> 0),
    variants AS (
        SELECT doc_id + 30000 AS doc_id,
               array_to_string(list_append(w[1:len(w)-1], 'freshtail'), ' ')
                   AS text
        FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents
              WHERE doc_id % 10 = 1)
    ),
    incoming AS (
        SELECT doc_id, text FROM documents WHERE doc_id % 3 = 0
        UNION ALL SELECT doc_id, text FROM variants
    ),
    shn AS (SELECT doc_id,
                   list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                                  for i in range(1, len(w) - 1)]) s
            FROM (SELECT doc_id, string_split(text, ' ') w FROM incoming)),
    shh AS (SELECT doc_id,
                   list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                                  for i in range(1, len(w) - 1)]) s
            FROM (SELECT doc_id, string_split(text, ' ') w FROM history))
    SELECT n.doc_id AS id_a, h.doc_id AS id_b,
           ROUND(len(list_intersect(n.s, h.s))::DOUBLE /
                 len(list_distinct(list_concat(n.s, h.s))), 3) AS jaccard
    FROM shn n JOIN shh h
      ON len(list_intersect(n.s, h.s))::DOUBLE /
         len(list_distinct(list_concat(n.s, h.s))) >= 0.8
    ORDER BY id_a, id_b
"""


QUERIES.update({"doc_incremental_near_dup": q_doc_incremental_near_dup})
ORACLES.update({"doc_incremental_near_dup": Q_DOC_INC_NEAR_DUP_SQL})


def q_emb_incremental_semantic(sf_dir: str) -> pa.Table:
    """Incremental SEMANTIC dedup of an arriving embedding shard against a
    persisted cluster-bucketed vector index — the third modality of the
    incremental family (see `doc_incremental_dedup` /
    `doc_incremental_near_dup`). History = vectors with
    ``vec_id % 3 != 0`` builds the index (deterministic k=8 lowest-id
    centroids, the SQL-replicable default); the incoming shard is the
    remaining vectors UNION a ×2-scaled copy (``+40000``-shifted id) of
    every history vector with ``vec_id % 7 == 2`` — scaling by a power of
    two is EXACT in float32, and cosine is scale-invariant, so each copy
    is cosine-1.0 to its original (caught iff they co-cluster, which a
    scaled copy need not: its squared-distance argmin can differ — both
    sides compute the same assignment, so the gate stays hash-exact).
    Returns (vec_id, cluster, dup_of) per incoming vector at threshold
    0.35."""
    import shutil

    from open_finance_lakehouse_ray.pipelines.dedup import (
        build_vector_index,
        incremental_semantic_dup,
    )

    emb = _emb(sf_dir).select_columns(["vec_id", "embedding"])

    def _variant(t: pa.Table) -> pa.Table:
        arr = t["embedding"].combine_chunks()
        scaled = pa.ListArray.from_arrays(
            arr.offsets, pc.multiply(arr.values, pa.scalar(2.0, pa.float32()))
        )
        return pa.table(
            {"vec_id": pc.add(t["vec_id"], 40_000), "embedding": scaled}
        )

    history = emb.map_batches(_mod_id_filter("vec_id", 3, 0, flip=True), batch_format="pyarrow")
    incoming = emb.map_batches(_mod_id_filter("vec_id", 3, 0), batch_format="pyarrow").union(
        emb.map_batches(_mod_id_filter("vec_id", 3, 0, flip=True), batch_format="pyarrow")
        .map_batches(_mod_id_filter("vec_id", 7, 2), batch_format="pyarrow")
        .map_batches(_variant, batch_format="pyarrow")
    )
    root = _scratch_root("incsem")
    try:
        build_vector_index(history, root, k=8)
        out = incremental_semantic_dup(incoming, root, threshold=0.35)
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return out


Q_EMB_INC_SEMANTIC_SQL = """
    WITH history AS (SELECT vec_id, embedding FROM embeddings
                     WHERE vec_id % 3 <> 0),
    cent AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid,
                    CAST(embedding AS DOUBLE[]) AS cv
             FROM (SELECT * FROM history ORDER BY vec_id LIMIT 8)),
    incoming AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        FROM embeddings WHERE vec_id % 3 = 0
        UNION ALL
        SELECT vec_id + 40000,
               list_transform(CAST(embedding AS DOUBLE[]), x -> x * 2.0)
        FROM embeddings WHERE vec_id % 3 <> 0 AND vec_id % 7 = 2
    ),
    iassign AS (
        SELECT vec_id, v, cid AS cluster FROM (
            SELECT i.vec_id, i.v, c.cid,
                   row_number() OVER (
                       PARTITION BY i.vec_id
                       ORDER BY list_distance(i.v, c.cv), c.cid) AS rk
            FROM incoming i CROSS JOIN cent c)
        WHERE rk = 1
    ),
    hassign AS (
        SELECT vec_id, v, cid AS cluster FROM (
            SELECT h.vec_id, CAST(h.embedding AS DOUBLE[]) AS v, c.cid,
                   row_number() OVER (
                       PARTITION BY h.vec_id
                       ORDER BY list_distance(CAST(h.embedding AS DOUBLE[]),
                                              c.cv), c.cid) AS rk
            FROM history h CROSS JOIN cent c)
        WHERE rk = 1
    ),
    dup AS (
        SELECT i.vec_id, min(h.vec_id) AS dup_of
        FROM iassign i JOIN hassign h ON i.cluster = h.cluster
        WHERE list_cosine_similarity(i.v, h.v) >= 0.35
        GROUP BY i.vec_id
    )
    SELECT i.vec_id, CAST(i.cluster AS BIGINT) AS cluster,
           CAST(dup.dup_of AS BIGINT) AS dup_of
    FROM iassign i LEFT JOIN dup ON i.vec_id = dup.vec_id
    ORDER BY i.vec_id
"""


QUERIES.update({"emb_incremental_semantic": q_emb_incremental_semantic})
ORACLES.update({"emb_incremental_semantic": Q_EMB_INC_SEMANTIC_SQL})
