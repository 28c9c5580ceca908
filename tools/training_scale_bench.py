"""Scale stress for the training-data operators: the gate corpus is 500-5k
docs, so this bench replicates sf0.1's documents into a ~100k-doc corpus
(per-replica salting kills accidental similarity) with 500 SEEDED
near-dup twins, then runs the dedup family with the SCALE paths FORCED
(``broadcast_max_bytes=0`` — bucketed joins, no corpus broadcast) and
verifies the seeded structure is recovered exactly:

- ngram_jaccard_pairs (prefix-filtered, recall 1.0): found pairs must be
  EXACTLY the 500 seeded twins;
- minhash_near_dup_pairs: found ⊆ seeded (exact-Jaccard verify kills
  false positives); recall printed (LSH recall is the only approximation);
- vocab_df_topk over the full corpus.

Prints one JSON line with timings + invariant verdicts.

Usage: python tools/training_scale_bench.py  (env GRAFT_SF_DIR, RAY_GRAFT_CPUS,
GRAFT_DOC_REPLICATE)
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
REPLICATE = int(os.environ.get("GRAFT_DOC_REPLICATE", "20"))


def main() -> int:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from open_finance_lakehouse_ray.pipelines.dedup import (
        minhash_near_dup_pairs,
        ngram_jaccard_pairs,
    )
    from open_finance_lakehouse_ray.pipelines.textpipe import vocab_df_topk

    base = pq.read_table(os.path.join(SF_DIR, "documents.parquet"),
                         columns=["doc_id", "text"])
    n_base = base.num_rows

    # --- corpus construction (driver-side is fine: construction is not
    # what is being measured) ---------------------------------------
    # every 3rd token replaced by a per-(replica, doc) salt → every
    # 3-shingle of every replica touches a salt token, so NO shingles are
    # shared across replicas of the same base doc (no accidental pairs)
    ids, texts = [], []
    twin_pairs = []
    next_id = 0
    base_ids = base["doc_id"].to_pylist()
    base_texts = base["text"].to_pylist()
    for r in range(REPLICATE):
        for bid, t in zip(base_ids, base_texts):
            w = t.split()
            for j in range(0, len(w), 3):
                w[j] = f"s{r}d{bid}j{j}"
            ids.append(next_id)
            texts.append(" ".join(w))
            my_id = next_id
            next_id += 1
            # seeded twin: one word changed → J well above 0.6
            if r == 0 and bid % 10 == 0:
                w2 = list(w)
                w2[-1] = "twintail"
                ids.append(next_id)
                texts.append(" ".join(w2))
                twin_pairs.append((my_id, next_id))
                next_id += 1

    corpus = pa.table({"doc_id": pa.array(ids, pa.int64()),
                       "text": pa.array(texts, pa.string())})
    scratch = "/tmp/oflr-docscale.parquet"
    pq.write_table(corpus, scratch)
    docs = rd.read_parquet(scratch).repartition(NUM_CPUS * 2)
    expected = set(twin_pairs)

    out = {"n_docs": corpus.num_rows, "n_seeded_twins": len(expected),
           "num_cpus": NUM_CPUS}

    t0 = time.perf_counter()
    jac = ngram_jaccard_pairs(docs, threshold=0.6, broadcast_max_bytes=0)
    out["ngram_jaccard_sec"] = round(time.perf_counter() - t0, 2)
    got = set(zip(jac["id_a"].to_pylist(), jac["id_b"].to_pylist()))
    out["ngram_jaccard_pairs"] = len(got)
    out["ngram_jaccard_exact_match"] = got == expected

    t0 = time.perf_counter()
    mh = minhash_near_dup_pairs(docs, threshold=0.6, broadcast_max_bytes=0)
    out["minhash_sec"] = round(time.perf_counter() - t0, 2)
    mgot = set(zip(mh["id_a"].to_pylist(), mh["id_b"].to_pylist()))
    out["minhash_pairs"] = len(mgot)
    out["minhash_subset_of_seeded"] = mgot <= expected
    out["minhash_recall"] = round(len(mgot & expected) / max(len(expected), 1), 4)

    t0 = time.perf_counter()
    vocab = vocab_df_topk(docs, k=50)
    out["vocab_df_sec"] = round(time.perf_counter() - t0, 2)
    out["vocab_df_rows"] = vocab.num_rows

    # --- SimHash at scale: pigeonhole banding guarantees recall 1.0 for
    # hamming <= 3, so the found set must EQUAL the set of seeded twins
    # whose true signature hamming is <= 3 (computed directly from the
    # 500 twin signatures — cheap) ----------------------------------
    from open_finance_lakehouse_ray.pipelines.dedup import (
        _popcount64,
        simhash64,
        simhash_near_dup_pairs,
    )

    t0 = time.perf_counter()
    sh = simhash_near_dup_pairs(docs, max_hamming=3)
    out["simhash_sec"] = round(time.perf_counter() - t0, 2)
    sh_got = set(zip(sh["id_a"].to_pylist(), sh["id_b"].to_pylist()))
    by_id = dict(zip(ids, texts))
    sh_expected = set()
    for a, b in twin_pairs:
        sa, sb = simhash64([by_id[a], by_id[b]])
        if int(_popcount64(np.array([sa ^ sb], dtype=np.uint64))[0]) <= 3:
            sh_expected.add((a, b))
    out["simhash_pairs"] = len(sh_got)
    out["simhash_expected_twins"] = len(sh_expected)
    out["simhash_exact_match"] = sh_got == sh_expected

    # --- embedding near-dup at scale: replicate embeddings to ~64k
    # vectors with heavy per-replica noise (kills accidental cosine
    # pairs) + tiny-noise twins for 1-in-40 vectors -------------------
    from open_finance_lakehouse_ray.pipelines.dedup import embedding_near_dup_pairs

    et = pq.read_table(os.path.join(SF_DIR, "embeddings.parquet"),
                       columns=["vec_id", "embedding"])
    base_vec = np.stack(et["embedding"].to_pandas().to_numpy()).astype(np.float64)
    rng = np.random.default_rng(29)
    vecs, vids, emb_twins = [], [], []
    nxt = 0
    for r in range(32):
        noise = rng.normal(scale=2.0, size=base_vec.shape)
        block = base_vec + noise
        for i in range(len(block)):
            vids.append(nxt)
            vecs.append(block[i])
            me = nxt
            nxt += 1
            if r == 0 and i % 40 == 0:
                vids.append(nxt)
                vecs.append(block[i] + rng.normal(scale=0.005, size=block.shape[1]))
                emb_twins.append((me, nxt))
                nxt += 1
    emb_tab = pa.table({
        "vec_id": pa.array(vids, pa.int64()),
        "embedding": pa.array([v.astype(np.float32) for v in vecs]),
    })
    emb_scratch = "/tmp/oflr-embscale.parquet"
    pq.write_table(emb_tab, emb_scratch)
    emb_ds = rd.read_parquet(emb_scratch).repartition(NUM_CPUS)
    out["n_vectors"] = emb_tab.num_rows

    t0 = time.perf_counter()
    ep = embedding_near_dup_pairs(emb_ds, threshold=0.99, strategy="lsh")
    out["emb_lsh_sec"] = round(time.perf_counter() - t0, 2)
    ep_got = set(zip(ep["id_a"].to_pylist(), ep["id_b"].to_pylist()))
    exp_emb = set(emb_twins)
    out["emb_pairs"] = len(ep_got)
    out["emb_subset_of_seeded"] = ep_got <= exp_emb
    out["emb_recall"] = round(len(ep_got & exp_emb) / max(len(exp_emb), 1), 4)

    # --- SemDeDup-style semantic dedup at scale (round 5): k=64 clusters
    # over the same 64k vectors, in-cluster cosine prune at 0.99. A twin
    # is caught iff both members co-cluster (near-identical vectors almost
    # always do — that residual miss probability is the method's published
    # tradeoff, hence >= 0.95 rather than exact); heavy replica noise
    # kills every non-seeded pair at 0.99, so found ⊆ seeded is exact.
    from open_finance_lakehouse_ray.pipelines.dedup import semantic_dedup

    t0 = time.perf_counter()
    sd = semantic_dedup(emb_ds, k=64, threshold=0.99)
    out["semantic_dedup_sec"] = round(time.perf_counter() - t0, 2)
    sd_found = {
        (int(d), int(v))
        for v, d in zip(sd["vec_id"].to_pylist(), sd["dup_of"].to_pylist())
        if d is not None
    }
    out["semantic_pairs"] = len(sd_found)
    out["semantic_subset_of_seeded"] = sd_found <= exp_emb
    out["semantic_recall"] = round(
        len(sd_found & exp_emb) / max(len(exp_emb), 1), 4
    )
    # emb_scratch stays on disk: emb_ds re-reads it lazily in the
    # incremental-semantic section below; unlinked there.

    # --- sessionization at scale: replicate events 32x (disjoint users),
    # verify the bounded-partition sessionizer against DuckDB's own
    # gaps-and-islands over the SAME parquet -------------------------
    import duckdb

    ev = pq.read_table(os.path.join(SF_DIR, "events.parquet"),
                       columns=["event_id", "ts", "user_id", "value"])
    n_ev = ev.num_rows
    reps = []
    for r in range(32):
        reps.append(pa.table({
            "event_id": pa.array(
                np.asarray(ev["event_id"]) + r * 10_000_000),
            "ts": ev["ts"],
            "user_id": pa.array(np.asarray(ev["user_id"]) + r * 1_000_000),
            "value": ev["value"],
        }))
    big = pa.concat_tables(reps)
    ev_scratch = "/tmp/oflr-evscale.parquet"
    pq.write_table(big, ev_scratch)
    out["n_events"] = big.num_rows

    from open_finance_lakehouse_ray.pipelines.queries import (
        SESSION_GAP_SECONDS,
        q_ev_sessionize,
    )

    evdir = "/tmp/oflr-evscale-dir"
    os.makedirs(evdir, exist_ok=True)
    os.replace(ev_scratch, os.path.join(evdir, "events.parquet"))
    t0 = time.perf_counter()
    sessions = q_ev_sessionize(evdir)
    out["sessionize_sec"] = round(time.perf_counter() - t0, 2)
    out["n_sessions"] = sessions.num_rows

    con = duckdb.connect()
    ref_n, ref_ev, ref_val = con.execute(f"""
        WITH e AS (
          SELECT user_id, ts, event_id, value,
                 CASE WHEN epoch(ts - LAG(ts) OVER (
                     PARTITION BY user_id ORDER BY ts, event_id))
                      > {SESSION_GAP_SECONDS} THEN 1 ELSE 0 END AS brk
          FROM '{evdir}/events.parquet'),
        s AS (SELECT *, SUM(brk) OVER (PARTITION BY user_id
                  ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sid
              FROM e)
        SELECT COUNT(*), SUM(n), ROUND(SUM(v), 2) FROM (
          SELECT user_id, sid, COUNT(*) AS n, SUM(value) AS v
          FROM s GROUP BY user_id, sid)""").fetchone()
    got_df = sessions.to_pandas()
    out["sessionize_matches_duckdb"] = bool(
        ref_n == len(got_df)
        and int(ref_ev) == int(got_df["n_events"].sum())
        and abs(float(ref_val) - round(float(got_df["total_value"].sum()), 2)) < 1.0
    )

    # --- decontamination at scale: the TWIN docs act as the eval set;
    # exact n-gram overlap must flag every twin's partner (recall 1.0 by
    # construction) — the benchmark-overlap scrub at 100k docs ------------
    t0 = time.perf_counter()
    from open_finance_lakehouse_ray.pipelines.dedup import decontaminate

    eval_ids = {b for _, b in twin_pairs}
    eval_arr = pa.array(sorted(eval_ids), pa.int64())

    def _side(is_eval: bool):
        def f(t):
            import pyarrow.compute as _pc

            m = _pc.is_in(t["doc_id"], value_set=eval_arr)
            return t.filter(m if is_eval else _pc.invert(m))
        return f

    cont = decontaminate(
        docs.map_batches(_side(False), batch_format="pyarrow"),
        docs.map_batches(_side(True), batch_format="pyarrow"),
    )
    out["decontaminate_sec"] = round(time.perf_counter() - t0, 2)
    flagged = set(cont["doc_id"].to_pylist())
    partners = {a for a, _ in twin_pairs}
    out["decontaminate_flagged"] = len(flagged)
    out["decontaminate_recall"] = round(
        len(flagged & partners) / max(len(partners), 1), 4
    )
    # the salted construction shares NO shingles across replicas, so the
    # flagged set must EQUAL the twin partners exactly — asserting recall
    # alone would let a flag-everything regression pass silently
    out["decontaminate_exact_match"] = flagged == partners

    # --- span-level exact substring dedup at scale: each twin pair shares
    # exactly its first n-1 tokens (only the last word differs), so the
    # expected span set is computable in closed form — (doc, start=1,
    # len=n-1) for both members of every twin pair with n >= k+1 tokens;
    # salts kill every cross-replica gram, so the found set must EQUAL it
    t0 = time.perf_counter()
    from open_finance_lakehouse_ray.pipelines.dedup import dup_spans

    spans = dup_spans(docs, k=15)
    out["dup_spans_sec"] = round(time.perf_counter() - t0, 2)
    got_spans = set(
        zip(
            spans["doc_id"].to_pylist(),
            spans["span_start"].to_pylist(),
            spans["span_len"].to_pylist(),
        )
    )
    exp_spans = set()
    for a, b in twin_pairs:
        n = len(by_id[a].split(" "))
        if n >= 16:
            exp_spans.add((a, 1, n - 1))
            exp_spans.add((b, 1, n - 1))
    out["dup_spans_found"] = len(got_spans)
    out["dup_spans_expected"] = len(exp_spans)
    out["dup_spans_exact_match"] = got_spans == exp_spans

    # --- span-CUT rewrite at scale (round 5): with min_span = k every
    # detected span is cut, so the expectation is closed-form — each twin
    # member keeps exactly its LAST token (span covers tokens 1..n-1),
    # every other doc is untouched. Only (doc_id, n_removed, n_chars)
    # rows return to the driver; the text itself is checked through the
    # kept-length equality.
    t0 = time.perf_counter()
    from open_finance_lakehouse_ray.pipelines.dedup import span_scrub

    def _meta(t):
        import pyarrow.compute as _pc

        return t.select(["doc_id", "n_removed"]).append_column(
            "n_chars", _pc.utf8_length(t["text_scrubbed"])
        )

    sc = (
        span_scrub(docs, k=15)
        .map_batches(_meta, batch_format="pyarrow")
        .to_pandas()
    )
    out["span_scrub_sec"] = round(time.perf_counter() - t0, 2)
    scm = sc.set_index("doc_id")
    twin_members = {d for pair in twin_pairs for d in pair}
    scrub_ok = bool((scm.loc[~scm.index.isin(twin_members), "n_removed"] == 0).all())
    for a, b in twin_pairs:
        toks_a, toks_b = by_id[a].split(" "), by_id[b].split(" ")
        for d, toks in ((a, toks_a), (b, toks_b)):
            if len(toks) >= 16:
                scrub_ok = scrub_ok and (
                    int(scm.loc[d, "n_removed"]) == len(toks) - 1
                    and int(scm.loc[d, "n_chars"]) == len(toks[-1])
                )
            else:
                scrub_ok = scrub_ok and int(scm.loc[d, "n_removed"]) == 0
    out["span_scrub_rows"] = int(len(sc))
    out["span_scrub_exact_match"] = scrub_ok and len(sc) == corpus.num_rows

    # --- incremental dedup at scale (round 5): persist the 100k-corpus
    # identity index (16 B/doc), then dedup a mixed incoming shard against
    # it WITHOUT rescanning corpus text. Closed-form expectation: exact
    # copies of corpus docs drop (cross-shard), each novel doc's shifted
    # duplicate drops to the smaller id (within-shard), and exactly the
    # n_base re-salted novel docs survive.
    import shutil
    import tempfile

    from open_finance_lakehouse_ray.pipelines.dedup import (
        build_hash_index,
        incremental_dedup,
    )

    idx_dir = tempfile.mkdtemp(prefix="oflr-incidx-")
    t0 = time.perf_counter()
    n_idx = build_hash_index(docs, idx_dir)
    out["index_build_sec"] = round(time.perf_counter() - t0, 2)
    out["index_entries"] = n_idx

    inc_ids, inc_texts = [], []
    nxt2 = 10_000_000
    novel_expect = []
    for bid, t in zip(base_ids, base_texts):
        w = t.split()
        for j in range(0, len(w), 3):
            w[j] = f"s{REPLICATE}d{bid}j{j}"  # unseen replica salt -> novel
        inc_ids.append(nxt2)
        inc_texts.append(" ".join(w))
        novel_expect.append(nxt2)
        nxt2 += 1
        inc_ids.append(nxt2)  # within-shard duplicate of the novel doc
        inc_texts.append(" ".join(w))
        nxt2 += 1
    for txt in texts[:n_base]:  # corpus members verbatim -> must all drop
        inc_ids.append(nxt2)
        inc_texts.append(txt)
        nxt2 += 1
    inc_tab = pa.table({"doc_id": pa.array(inc_ids, pa.int64()),
                        "text": pa.array(inc_texts, pa.string())})
    inc_scratch = "/tmp/oflr-incshard.parquet"
    pq.write_table(inc_tab, inc_scratch)
    inc_ds = rd.read_parquet(inc_scratch).repartition(NUM_CPUS)
    t0 = time.perf_counter()
    kept = (
        incremental_dedup(inc_ds, idx_dir, shard="s1")
        .select_columns(["doc_id"])
        .to_pandas()
    )
    out["incremental_dedup_sec"] = round(time.perf_counter() - t0, 2)
    out["incremental_shard_rows"] = inc_tab.num_rows
    out["incremental_kept"] = int(len(kept))
    out["incremental_exact_match"] = set(kept["doc_id"]) == set(novel_expect)
    shutil.rmtree(idx_dir, ignore_errors=True)
    os.unlink(inc_scratch)

    # --- incremental NEAR-dup at scale (late round 5): persist the MinHash
    # band index of the full 100k corpus, then screen a mixed shard —
    # last-word variants of every 13th corpus doc (expected partners
    # computable in closed form: the doc itself, plus its twin when one
    # exists, whichever clear exact-Jaccard 0.8) and 500 freshly-salted
    # novel docs that must flag NOTHING (salts kill every shared shingle).
    from open_finance_lakehouse_ray.pipelines.dedup import (
        build_band_index,
        exact_jaccard,
        incremental_near_dup,
    )

    bidx = tempfile.mkdtemp(prefix="oflr-bandidx-")
    t0 = time.perf_counter()
    n_band_rows = build_band_index(docs, bidx)
    out["band_index_build_sec"] = round(time.perf_counter() - t0, 2)
    out["band_index_rows"] = n_band_rows

    twin_of = {}
    for a, b in twin_pairs:
        twin_of[a] = b
        twin_of[b] = a
    nd_ids, nd_texts, exp_nd = [], [], set()
    nxt3 = 20_000_000
    for i in range(0, len(ids), 13):
        cid, t = ids[i], texts[i]
        w = t.split(" ")
        w[-1] = "freshtail"
        v = " ".join(w)
        nd_ids.append(nxt3)
        nd_texts.append(v)
        for partner in [cid] + ([twin_of[cid]] if cid in twin_of else []):
            if exact_jaccard(v, by_id[partner]) >= 0.8:
                exp_nd.add((nxt3, partner))
        nxt3 += 1
    for bid, t in list(zip(base_ids, base_texts))[:500]:
        w = t.split()
        for j in range(0, len(w), 3):
            w[j] = f"s{REPLICATE + 1}d{bid}j{j}"  # unseen salt: no shingles shared
        nd_ids.append(nxt3)
        nd_texts.append(" ".join(w))
        nxt3 += 1
    nd_tab = pa.table({"doc_id": pa.array(nd_ids, pa.int64()),
                       "text": pa.array(nd_texts, pa.string())})
    nd_scratch = "/tmp/oflr-ndshard.parquet"
    pq.write_table(nd_tab, nd_scratch)
    nd_ds = rd.read_parquet(nd_scratch).repartition(NUM_CPUS)
    t0 = time.perf_counter()
    got_nd = incremental_near_dup(nd_ds, bidx, docs, threshold=0.8)
    out["incremental_near_dup_sec"] = round(time.perf_counter() - t0, 2)
    got_set = set(zip(got_nd["id_a"].to_pylist(), got_nd["id_b"].to_pylist()))
    out["incnd_shard_rows"] = nd_tab.num_rows
    out["incnd_expected"] = len(exp_nd)
    out["incnd_found"] = len(got_set)
    out["incnd_exact_match"] = got_set == exp_nd
    shutil.rmtree(bidx, ignore_errors=True)
    os.unlink(nd_scratch)

    # --- incremental SEMANTIC dedup at scale (late round 5): persist the
    # cluster-bucketed vector index of the 64k corpus (k=64 deterministic
    # centroids), then screen a shard of tiny-noise copies of every 40th
    # corpus vector (must flag, partner = the original or its seeded twin
    # — the only cosine >= 0.99 candidates under the heavy replica noise)
    # plus 500 fresh heavy-noise vectors (must flag nothing). Recall < 1
    # only via cluster-boundary straddles, SemDeDup's documented tradeoff.
    from open_finance_lakehouse_ray.pipelines.dedup import (
        build_vector_index,
        incremental_semantic_dup,
    )

    vidx = tempfile.mkdtemp(prefix="oflr-vecidx-")
    t0 = time.perf_counter()
    n_vec_rows = build_vector_index(emb_ds, vidx, k=64)
    out["vector_index_build_sec"] = round(time.perf_counter() - t0, 2)
    out["vector_index_rows"] = n_vec_rows

    emb_twin_of = {}
    for a, b in emb_twins:
        emb_twin_of[a] = b
        emb_twin_of[b] = a
    all_vecs = {i: v for i, v in zip(vids, vecs)}
    sv_ids, sv_vecs, sv_partner = [], [], {}
    nxt4 = 30_000_000
    rng2 = np.random.default_rng(31)
    for i in range(0, len(vids), 40):
        cid = vids[i]
        sv_ids.append(nxt4)
        sv_vecs.append(all_vecs[cid] + rng2.normal(scale=0.005,
                                                   size=len(all_vecs[cid])))
        sv_partner[nxt4] = {cid} | ({emb_twin_of[cid]}
                                    if cid in emb_twin_of else set())
        nxt4 += 1
    novel_lo = nxt4
    for _ in range(500):
        sv_ids.append(nxt4)
        sv_vecs.append(rng2.normal(scale=2.0, size=len(vecs[0])))
        nxt4 += 1
    sv_tab = pa.table({
        "vec_id": pa.array(sv_ids, pa.int64()),
        "embedding": pa.array([np.asarray(v, np.float32) for v in sv_vecs]),
    })
    sv_scratch = "/tmp/oflr-svshard.parquet"
    pq.write_table(sv_tab, sv_scratch)
    sv_ds = rd.read_parquet(sv_scratch).repartition(NUM_CPUS)
    t0 = time.perf_counter()
    got_sv = incremental_semantic_dup(sv_ds, vidx, threshold=0.99).to_pandas()
    out["incremental_semantic_sec"] = round(time.perf_counter() - t0, 2)
    got_sv = got_sv.set_index("vec_id")["dup_of"]
    copies = [i for i in sv_ids if i < novel_lo]
    flagged = {i: got_sv[i] for i in copies if not np.isnan(got_sv[i])}
    out["incsem_shard_rows"] = sv_tab.num_rows
    out["incsem_copies"] = len(copies)
    out["incsem_flagged"] = len(flagged)
    out["incsem_subset_of_expected"] = all(
        int(d) in sv_partner[i] for i, d in flagged.items()
    )
    out["incsem_recall"] = round(len(flagged) / max(len(copies), 1), 4)
    out["incsem_novel_clean"] = bool(
        got_sv.loc[[i for i in sv_ids if i >= novel_lo]].isna().all()
    )
    shutil.rmtree(vidx, ignore_errors=True)
    os.unlink(sv_scratch)
    os.unlink(emb_scratch)

    out["ok"] = bool(
        out["ngram_jaccard_exact_match"]
        and out["minhash_subset_of_seeded"]
        and out["minhash_recall"] >= 0.95
        and out["simhash_exact_match"]
        and out["emb_subset_of_seeded"]
        and out["emb_recall"] >= 0.95
        and out["sessionize_matches_duckdb"]
        and out["decontaminate_exact_match"]
        and out["dup_spans_exact_match"]
        and out["semantic_subset_of_seeded"]
        and out["semantic_recall"] >= 0.95
        and out["span_scrub_exact_match"]
        and out["index_entries"] == corpus.num_rows
        and out["incremental_exact_match"]
        and out["incnd_exact_match"]
        and out["incsem_subset_of_expected"]
        and out["incsem_recall"] >= 0.95
        and out["incsem_novel_clean"]
    )
    ray.shutdown()
    os.unlink(scratch)
    os.unlink(os.path.join(evdir, "events.parquet"))
    print(json.dumps(out))
    return 0 if out["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
