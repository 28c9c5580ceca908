"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the DRIVER before this module is imported: nothing
here (or in the library code these callables use) calls ``ray.init`` /
``ray.shutdown``.

- ``entry()``  — flagship pipeline on /root/testdata/sf0.001: build the
  transcript table from lineitem, run real maintenance (ingest as small
  files → compact → Z-order) on a scratch table, return the
  post-maintenance scan.
- ``queries()`` — one callable per implemented operator/pipeline from
  SURVEY.md §2 (see ``open_finance_lakehouse_ray/pipelines/queries.py``).
- ``oracle_sql()`` — matching DuckDB SQL per query (same column names).
  As of round 2 EVERY query is oracle-paired: the language-ID vote is a
  CASE over summed regexp counts, and SimHash signatures are rebuilt in
  SQL bit arithmetic from DuckDB's own ``hash()``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    from open_finance_lakehouse_ray.pipelines.queries import q_tx_maintenance_roundtrip

    return q_tx_maintenance_roundtrip("/root/testdata/sf0.001")


# The driver's correctness gate samples the FIRST 50 ``queries()`` entries
# in dict order.  Registration order in ``pipelines/queries.py`` follows the
# build history, which left the table verbs and late-round text ops past the
# window for three rounds (VERDICT r3 item 2).  The PRIMARY ordering is now
# self-balancing from the recorded gate history (``_gate_history``): a
# static list would permanently park whatever lands past position 50
# (round-4 review).  The lists below survive as the cold-start order (no
# CORRECTNESS files yet) and the tie-break preference within equal history.
_GATE_FRONT = [
    # all six table verbs (the engine's signature surface), never gated r1-r3
    "tx_delete_where",
    "tx_update_where",
    "tx_change_feed",
    "tx_cdc_commits",
    "tx_schema_evolution",
    "tx_clone_divergence",
    # never-gated query surface from rounds 2-3
    "ev_asof_view_value",
    "ev_asof_next_purchase",
    "doc_seq_pack",
    "doc_stratified_sample",
    "doc_repetition",
    "doc_term_scrub",
    "doc_bpe_tokens",
    "ev_user_rank",
    "ev_type_quantiles",
    # gated r2 but fell past the window in r3
    "doc_corpus_prep",
    "doc_train_split",
    "doc_vocab_df",
    "doc_tfidf_top",
    "mm_frame_sample",
    "emb_kmeans_assign",
    # red/weak rows fixed this round
    "ev_ohlc_daily_rollup",
    "emb_pq_knn",
    # new round-4 operators: span-level exact dedup, RAG chunking, RESTORE
    "doc_dup_spans",
    "doc_chunks",
    "tx_restore_rewind",
]
_GATE_KEEP = [
    # long-green but load-bearing: keep one per family in the window
    "tx_maintenance_roundtrip",
    "tx_merge_upsert",
    "tx_expire_invariance",
    "tx_key_metrics",
    "ev_ohlc_1m",
    "ev_ohlc_hopping",
    "ev_stream_ohlc",
    "ev_dead_letter_replay",
    "ev_jsonl_roundtrip",
    "ev_sessionize",
    "ev_asof_last_view",
    "ev_interp_purchase",
    "li_pricing_summary",
    "ord_revenue_by_nation",
    "li_order_priority_revenue",
    "doc_near_dup_pairs",
    "doc_jaccard_pairs",
    "doc_simhash_pairs",
    "doc_dedup_exact",
    "doc_dedup_clusters",
    "doc_decontaminate",
    "emb_near_dup",
    "emb_knn",
    "emb_knn_ivf",
    "emb_label_centroids",
    "doc_multimodal",
    "mart_pricing_lifecycle",
]
_GATE_TAIL = [
    # long-green trivial entries rotated past the 50-entry window; each
    # family above still keeps a representative inside it
    "dim_date",
    "ev_monthly_real_diff",
    "reconcile_customers",
    "ev_value_bands",
    "ev_compound_growth",
    "ord_top_spenders",
    "cust_urgent_segments",
    "ev_monthly_type_mean",
    "ev_pivot_daily",
    "ev_rolling_avg",
    "ev_latest_per_user",
    "ev_validity_tag",
    "ev_table_metrics",
    "party_union",
    "li_gap_check",
    "ord_month_end_snapshot",
    "doc_token_stats",
    "doc_quality",
    "doc_fingerprint",
    "doc_langid",
    "doc_unigram_logprob",
]


def _gate_history() -> "dict[str, tuple[int, int, bool]]":
    """Per-query driver-gate history from the recorded ``CORRECTNESS_r*.json``
    files: name -> (last_round_gated, times_gated, last_row_green).

    A row is green when the exact value hash matched (or, for the weaker
    rows-only checks, when a row count came back without error)."""
    import glob
    import json
    import os
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    hist: dict[str, tuple[int, int, bool]] = {}
    for path in sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))):
        m = re.search(r"_r(\d+)\.json$", path)
        if m is None:
            continue
        rnd = int(m.group(1))
        try:
            with open(path, encoding="utf-8") as f:
                rows = json.load(f)
        except Exception:  # noqa: BLE001 — a corrupt record never breaks the gate
            continue
        if not isinstance(rows, dict):
            continue
        for name, row in rows.items():
            if not isinstance(row, dict):
                continue
            green = bool(row.get("hash_match")) or (
                row.get("hash_match") is None
                and row.get("err") == "no_oracle"
                and row.get("spark_rows") is not None
            )
            last, n, last_green = hist.get(name, (-1, 0, True))
            if rnd >= last:
                last, last_green = rnd, green
            hist[name] = (last, n + 1, last_green)
    return hist


def _gate_order(keys: list[str]) -> list[str]:
    """Order the gate view so the driver's 50-entry window self-balances.

    Sort key per query, ascending: (last row red?, never/least-recently
    gated, fewest total driver rows, cold-start list position).  A query
    whose most recent driver row was RED — or which has never had one —
    always enters the window; otherwise the least-recently-gated rotate in,
    so over rounds every query keeps collecting driver evidence instead of
    a static tail parking 21 entries forever (round-4 review)."""
    hist = _gate_history()
    static = _GATE_FRONT + _GATE_KEEP + _GATE_TAIL
    static_pos = {k: i for i, k in enumerate(static)}

    def key(name: str) -> tuple:
        last, n, green = hist.get(name, (-1, 0, False))
        needs_row = last < 0 or not green
        return (0 if needs_row else 1, last, n,
                static_pos.get(name, -1), name)

    return sorted(keys, key=key)


def _ts_us(result: Any) -> Any:
    """Normalize every timestamp column of a gate result to microsecond
    resolution — the unit DuckDB emits for the oracle side.

    Round 3's one red row (``ev_ohlc_daily_rollup``) was a value-identical
    frame whose ``day`` column carried ``timestamp[s]``: the driver's value
    hash works on epoch integers, so a resolution drift is a silent 1e6
    factor.  Casting at the ``queries()`` boundary removes the whole bug
    class for every current and future query (windows here are >= 1 s, so
    s/ns -> us is always exact).
    """
    import pandas as pd
    import pyarrow as pa

    def cast_table(t: pa.Table) -> pa.Table:
        fields, changed = [], False
        for f in t.schema:
            if pa.types.is_timestamp(f.type) and f.type.unit != "us":
                fields.append(pa.field(f.name, pa.timestamp("us", tz=f.type.tz)))
                changed = True
            else:
                fields.append(f)
        return t.cast(pa.schema(fields)) if changed else t

    if isinstance(result, pa.Table):
        return cast_table(result)
    if isinstance(result, pd.DataFrame):
        out = result.copy()
        for c in out.columns:
            if pd.api.types.is_datetime64_any_dtype(out[c]):
                tz = getattr(out[c].dtype, "tz", None)
                out[c] = out[c].astype(
                    f"datetime64[us, {tz}]" if tz is not None else "datetime64[us]"
                )
        return out
    try:  # ray.data.Dataset — lazy cast, no materialization
        import ray.data as rd

        if isinstance(result, rd.Dataset):
            return result.map_batches(cast_table, batch_format="pyarrow")
    except ImportError:
        pass
    return result


def queries() -> dict[str, Callable[[str], Any]]:
    from open_finance_lakehouse_ray.pipelines.queries import QUERIES

    def wrap(fn: Callable[[str], Any]) -> Callable[[str], Any]:
        def run(sf_dir: str) -> Any:
            return _ts_us(fn(sf_dir))

        run.__name__ = getattr(fn, "__name__", "query")
        run.__doc__ = fn.__doc__
        return run

    return {k: wrap(QUERIES[k]) for k in _gate_order(list(QUERIES))}


def oracle_sql() -> dict[str, str]:
    from open_finance_lakehouse_ray.pipelines.queries import ORACLES

    return dict(ORACLES)
