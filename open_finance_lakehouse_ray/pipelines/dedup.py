"""Deduplication family: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup — the large-scale training-data operators the
reference lacks (its only dedups are keyed exact dedups,
``/root/reference/ofl/transform/spark/silver.py:64-72``; no near-dedup
exists there — SURVEY.md §2.7), built Ray-Data-first:

- shingle/minhash/simhash computation is vectorized numpy inside
  ``map_batches`` (no Python loop over rows in the hot path);
- candidate generation is a ``groupby`` on (band_id, band_hash) — the
  classic LSH bucket shuffle; buckets emit pairs, pairs are verified by
  EXACT similarity so LSH recall is the only approximation;
- verification broadcasts the document corpus via ``ray.put`` when it
  fits (one object-store copy read by every task, never re-shipped per
  batch); at larger scale swap in the bucketed join (see
  ``doc_features_for`` callers).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

MERSENNE = np.uint64((1 << 61) - 1)


def _shingle_hashes(texts: list[str], k: int = 3) -> list[np.ndarray]:
    """Per-doc array of distinct k-word shingle hashes (uint64).

    The per-doc Python loop is over DOCS, not tokens; token hashing is
    pandas' C siphash over the flattened shingle list.
    """
    all_shingles: list[str] = []
    offsets = [0]
    for t in texts:
        w = t.split()
        sh = {" ".join(w[i : i + k]) for i in range(max(0, len(w) - k + 1))}
        all_shingles.extend(sh)
        offsets.append(len(all_shingles))
    if not all_shingles:
        return [np.empty(0, dtype=np.uint64) for _ in texts]
    flat = pd.util.hash_array(np.asarray(all_shingles, dtype=object))
    return [flat[offsets[i] : offsets[i + 1]] for i in range(len(texts))]


def minhash_signatures(
    texts: list[str], num_perm: int = 128, k: int = 3, seed: int = 7
) -> np.ndarray:
    """(n_docs, num_perm) uint64 MinHash signatures. Permutations are the
    standard universal-hash family h_i(x) = (a_i x + b_i) mod p.

    Fully vectorized across the BATCH: one (num_perm × total_shingles)
    matrix + ``np.minimum.reduceat`` at doc offsets — no per-doc numpy
    dispatch (the per-doc loop was the hot-path overhead at bench scale).
    """
    rng = np.random.default_rng(seed)
    # odd multiplier => x -> a*x + b is a BIJECTION mod 2^64: a true
    # permutation family with no modular reduction in the hot loop
    a = rng.integers(1, 2**63, num_perm, dtype=np.uint64) | np.uint64(1)
    b = rng.integers(0, 2**63, num_perm, dtype=np.uint64)
    sigs = np.full((len(texts), num_perm), np.iinfo(np.uint64).max, dtype=np.uint64)
    per_doc = _shingle_hashes(texts, k)
    lengths = np.array([len(h) for h in per_doc], dtype=np.int64)
    nonempty = np.where(lengths > 0)[0]
    if len(nonempty) == 0:
        return sigs
    flat = np.concatenate([per_doc[i] for i in nonempty])
    offsets = np.zeros(len(nonempty), dtype=np.int64)
    np.cumsum(lengths[nonempty][:-1], out=offsets[1:])
    # (num_perm, total_shingles) permuted hashes, reduced per doc segment
    m = a[:, None] * flat[None, :] + b[:, None]  # uint64 wraparound
    mins = np.minimum.reduceat(m, offsets, axis=1)  # (num_perm, n_nonempty)
    sigs[nonempty] = mins.T
    return sigs


def band_rows(
    ids: np.ndarray, sigs: np.ndarray, bands: int = 32
) -> pa.Table:
    """Explode signatures into (band_id, band_hash, doc_id) rows — the LSH
    bucket key for the groupby shuffle."""
    n, num_perm = sigs.shape
    rows_per_band = num_perm // bands
    out_band, out_hash, out_id = [], [], []
    for bnd in range(bands):
        chunk = sigs[:, bnd * rows_per_band : (bnd + 1) * rows_per_band]
        # hash the band slice row-wise, vectorized
        h = np.zeros(n, dtype=np.uint64)
        for r in range(rows_per_band):
            h = h * np.uint64(1099511628211) + chunk[:, r]
        out_band.append(np.full(n, bnd, dtype=np.int64))
        out_hash.append(h.view(np.int64))
        out_id.append(ids)
    return pa.table(
        {
            "band_id": np.concatenate(out_band),
            "band_hash": np.concatenate(out_hash),
            "doc_id": np.concatenate(out_id),
        }
    )


def exact_jaccard(a: str, b: str, k: int = 3) -> float:
    wa, wb = a.split(), b.split()
    sa = {" ".join(wa[i : i + k]) for i in range(max(0, len(wa) - k + 1))}
    sb = {" ".join(wb[i : i + k]) for i in range(max(0, len(wb) - k + 1))}
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


def minhash_near_dup_pairs(
    docs: rd.Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    num_perm: int = 128,
    bands: int = 32,
    shingle_k: int = 3,
) -> pa.Table:
    """MinHash+LSH candidate pairs verified by exact k-shingle Jaccard.

    Returns (id_a, id_b, jaccard) with id_a < id_b, jaccard >= threshold.
    Verification broadcasts the text corpus (``ray.put`` once) — right for
    corpora whose TEXT fits the object store; the signature/bucket stages
    stream regardless.
    """

    def sig_stage(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        sigs = minhash_signatures(
            batch[text_col].to_pylist(), num_perm=num_perm, k=shingle_k
        )
        return band_rows(ids, sigs, bands=bands)

    buckets = docs.map_batches(sig_stage, batch_format="pyarrow")

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(g["doc_id"].to_numpy())
        if len(ids) < 2:
            return pd.DataFrame({"id_a": [], "id_b": []})
        ii, jj = np.triu_indices(len(ids), k=1)
        return pd.DataFrame({"id_a": ids[ii], "id_b": ids[jj]})

    cand = (
        buckets.groupby(["band_id", "band_hash"])
        .map_groups(bucket_pairs, batch_format="pandas")
    )
    cand_df = cand.to_pandas()
    if len(cand_df) == 0:
        return pa.table({"id_a": pa.array([], pa.int64()),
                         "id_b": pa.array([], pa.int64()),
                         "jaccard": pa.array([], pa.float64())})
    cand_df = cand_df.drop_duplicates(["id_a", "id_b"])

    texts_ref = ray.put(
        dict(
            zip(
                docs.select_columns([id_col]).to_pandas()[id_col].tolist(),
                docs.select_columns([text_col]).to_pandas()[text_col].tolist(),
            )
        )
    )

    def verify(batch: pa.Table) -> pa.Table:
        texts = ray.get(texts_ref)
        ia = batch["id_a"].to_pylist()
        ib = batch["id_b"].to_pylist()
        j = [exact_jaccard(texts[a], texts[b], k=shingle_k) for a, b in zip(ia, ib)]
        out = pa.table({"id_a": ia, "id_b": ib, "jaccard": j})
        import pyarrow.compute as pc

        return out.filter(pc.greater_equal(out["jaccard"], threshold))

    verified = (
        rd.from_arrow(pa.Table.from_pandas(cand_df, preserve_index=False))
        .map_batches(verify, batch_format="pyarrow")
        .to_pandas()
        .sort_values(["id_a", "id_b"])
    )
    return pa.Table.from_pandas(verified, preserve_index=False)


# --------------------------------------------------------------- simhash

def simhash64(texts: list[str], k: int = 3) -> np.ndarray:
    """64-bit SimHash per text over k-word shingles (vectorized bit
    counting). Shingles, not unigrams: on small-vocabulary corpora
    unigram SimHash saturates (every doc shares the common tokens and
    collides at hamming ~0); k-shingles keep the feature space
    distinctive — the same reason MinHash shingles."""
    out = np.zeros(len(texts), dtype=np.uint64)
    all_tokens: list[str] = []
    offsets = [0]
    for t in texts:
        w = t.split()
        all_tokens.extend(
            " ".join(w[i : i + k]) for i in range(max(0, len(w) - k + 1))
        )
        offsets.append(len(all_tokens))
    if not all_tokens:
        return out
    th = pd.util.hash_array(np.asarray(all_tokens, dtype=object))
    bits = np.unpackbits(th.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little")
    for i in range(len(texts)):
        seg = bits[offsets[i] : offsets[i + 1]]
        if len(seg) == 0:
            continue
        # signed! uint8 sums promote unsigned and negative votes would wrap
        votes = seg.sum(axis=0, dtype=np.int64) * 2 - len(seg)
        v = np.packbits((votes > 0).astype(np.uint8), bitorder="little")
        out[i] = v.view(np.uint64)[0]
    return out


def simhash_near_dup_pairs(
    docs: rd.Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
) -> pa.Table:
    """SimHash pairs within ``max_hamming`` bits, found via 4×16-bit block
    banding (a pair within hamming 3 of a 64-bit hash must agree exactly on
    at least one of 4 blocks — pigeonhole), verified by exact popcount."""

    def sig_stage(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        h = simhash64(batch[text_col].to_pylist())
        blocks = {
            f"b{k}": ((h >> np.uint64(16 * k)) & np.uint64(0xFFFF)).astype(np.int64)
            for k in range(4)
        }
        return pa.table({"doc_id": ids, "sim": h.view(np.int64), **blocks})

    sigs = docs.map_batches(sig_stage, batch_format="pyarrow")
    sig_df = sigs.to_pandas()

    pairs = set()
    for k in range(4):
        for _, g in sig_df.groupby(f"b{k}"):
            ids = np.sort(g["doc_id"].to_numpy())
            if len(ids) < 2:
                continue
            ii, jj = np.triu_indices(len(ids), k=1)
            pairs.update(zip(ids[ii].tolist(), ids[jj].tolist()))
    if not pairs:
        return pa.table({"id_a": pa.array([], pa.int64()),
                         "id_b": pa.array([], pa.int64()),
                         "hamming": pa.array([], pa.int64())})
    sim = dict(zip(sig_df["doc_id"], sig_df["sim"].astype(np.int64)))
    ia, ib, hd = [], [], []
    for a, b in sorted(pairs):
        d = int(bin(int(np.uint64(sim[a] ^ sim[b]))).count("1"))
        if d <= max_hamming:
            ia.append(a)
            ib.append(b)
            hd.append(d)
    return pa.table({"id_a": ia, "id_b": ib, "hamming": hd})


# ------------------------------------------------- embedding near-dup

def embedding_near_dup_pairs(
    emb: rd.Dataset,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
) -> pa.Table:
    """Cosine near-duplicate pairs: every batch multiplies against the
    broadcast normalized matrix (numpy matmul) — brute-force baseline; the
    LSH-bucketed scale path reuses the minhash banding machinery over
    random-hyperplane sign bits."""
    pdf = emb.select_columns([id_col, vec_col]).to_pandas()
    ids = pdf[id_col].to_numpy().astype(np.int64)
    m = np.stack(pdf[vec_col].to_numpy())
    m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
    m_ref = ray.put((ids, m))

    def stage(batch: pa.Table) -> pa.Table:
        all_ids, mat = ray.get(m_ref)
        bids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        bv = np.stack(batch[vec_col].to_pandas().to_numpy())
        bv = bv / np.maximum(np.linalg.norm(bv, axis=1, keepdims=True), 1e-12)
        sims = bv @ mat.T
        ia, ib, s = [], [], []
        for r in range(len(bids)):
            hits = np.where(sims[r] >= threshold)[0]
            for h in hits:
                if bids[r] < all_ids[h]:
                    ia.append(int(bids[r]))
                    ib.append(int(all_ids[h]))
                    s.append(float(sims[r, h]))
        return pa.table({"id_a": ia, "id_b": ib, "cosine": s})

    out = emb.map_batches(stage, batch_format="pyarrow").to_pandas()
    if "id_a" not in out.columns:  # no pairs anywhere -> schemaless empty
        return pa.table({"id_a": pa.array([], pa.int64()),
                         "id_b": pa.array([], pa.int64()),
                         "cosine": pa.array([], pa.float64())})
    out = out.sort_values(["id_a", "id_b"])
    return pa.Table.from_pandas(out, preserve_index=False)
