"""Similarity search over an embedding column (``list<float>``):
brute-force cosine top-k baseline + LSH-bucketed scale path.

Pattern: the QUERY matrix is broadcast once (``ray.put``), every data
batch does one numpy matmul against it and emits its local top-k
candidates; a final tiny per-query merge keeps the global top-k. The
corpus streams — nothing materializes but (num_queries × k) rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd


def _normalize(m: np.ndarray) -> np.ndarray:
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)



def _merge_topk(cand: "pd.DataFrame", k: int, exclude_self: bool) -> pa.Table:
    """Shared candidate-merge tail for every top-k searcher (brute / LSH /
    IVF / PQ): self-filter, quantize-before-rank (BLAS matmul low bits
    depend on batch SHAPE, and Ray may split blocks differently run to
    run — round(12) + neighbor_id tie-break keeps the order
    batch-partitioning-invariant), per-query head(k), dense rank. ONE
    definition so the tie-break rule can never diverge between engines."""
    if exclude_self:
        cand = cand[cand["query_id"] != cand["neighbor_id"]]
    if len(cand) == 0:
        return pa.table({"query_id": pa.array([], pa.int64()),
                         "neighbor_id": pa.array([], pa.int64()),
                         "rank": pa.array([], pa.int64()),
                         "cosine": pa.array([], pa.float64())})
    cand = cand.copy()
    cand["cosine"] = cand["cosine"].round(12)
    cand = cand.sort_values(
        ["query_id", "cosine", "neighbor_id"], ascending=[True, False, True]
    )
    top = cand.groupby("query_id", sort=True).head(k).copy()
    top["rank"] = top.groupby("query_id").cumcount() + 1
    top["cosine"] = top["cosine"].round(4)
    return pa.Table.from_pandas(
        top[["query_id", "neighbor_id", "rank", "cosine"]], preserve_index=False
    )


def brute_force_topk(
    emb: rd.Dataset,
    queries: np.ndarray,
    query_ids: np.ndarray,
    *,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
) -> pa.Table:
    """Exact cosine top-k: (query_id, neighbor_id, rank, cosine).

    Deterministic tie-break: on equal cosine, the smaller neighbor id
    ranks first (never ``first()`` on undefined order)."""
    q = _normalize(np.asarray(queries, dtype=np.float64))
    q_ref = ray.put((np.asarray(query_ids, dtype=np.int64), q))

    def stage(batch: pa.Table) -> pa.Table:
        qids, qm = ray.get(q_ref)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        m = _normalize(np.stack(batch[vec_col].to_pandas().to_numpy()).astype(np.float64))
        sims = qm @ m.T  # (nq, nbatch)
        rows = {"query_id": [], "neighbor_id": [], "cosine": []}
        kk = min(k + (1 if exclude_self else 0), sims.shape[1])
        for qi in range(len(qids)):
            part = np.argpartition(-sims[qi], kk - 1)[:kk]
            for j in part:
                rows["query_id"].append(int(qids[qi]))
                rows["neighbor_id"].append(int(ids[j]))
                rows["cosine"].append(float(sims[qi, j]))
        return pa.table(rows)

    cand = emb.map_batches(stage, batch_format="pyarrow").to_pandas()
    return _merge_topk(cand, k, exclude_self)


def lsh_bucketed_topk(
    emb: rd.Dataset,
    queries: np.ndarray,
    query_ids: np.ndarray,
    *,
    k: int = 3,
    n_planes: int = 6,
    n_tables: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 11,
) -> pa.Table:
    """Approximate top-k: multi-table random-hyperplane LSH. Each of
    ``n_tables`` independent tables assigns a ``n_planes``-bit bucket; a
    batch row is scored for a query iff they share a bucket in ANY table
    (the standard recall amplifier: per-table collision p^n_planes, miss
    probability (1-p^n_planes)^n_tables). Same output schema as
    :func:`brute_force_topk`; recall < 1 by design — this is the 100 TB
    path where the full matmul is unaffordable."""
    rng = np.random.default_rng(seed)
    q = _normalize(np.asarray(queries, dtype=np.float64))
    planes = rng.standard_normal((n_tables, n_planes, q.shape[1]))

    def signatures(m: np.ndarray) -> np.ndarray:
        """(n_rows, n_tables) bucket ids."""
        out = np.zeros((m.shape[0], n_tables), dtype=np.int64)
        for t in range(n_tables):
            bits = (m @ planes[t].T) > 0
            out[:, t] = bits @ (1 << np.arange(n_planes))
        return out

    q_sigs = signatures(q)
    q_ref = ray.put((np.asarray(query_ids, dtype=np.int64), q, q_sigs))

    def stage(batch: pa.Table) -> pa.Table:
        qids, qm, qsig = ray.get(q_ref)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        m = _normalize(np.stack(batch[vec_col].to_pandas().to_numpy()).astype(np.float64))
        sigs = signatures(m)
        rows = {"query_id": [], "neighbor_id": [], "cosine": []}
        for qi, qid in enumerate(qids):
            mask = (sigs == qsig[qi][None, :]).any(axis=1)
            if not mask.any():
                continue
            sims = qm[qi] @ m[mask].T
            sub_ids = ids[mask]
            kk = min(k + 1, len(sub_ids))
            part = np.argpartition(-sims, kk - 1)[:kk]
            for j in part:
                rows["query_id"].append(int(qid))
                rows["neighbor_id"].append(int(sub_ids[j]))
                rows["cosine"].append(float(sims[j]))
        return pa.table(rows)

    cand = emb.map_batches(stage, batch_format="pyarrow").to_pandas()
    return _merge_topk(cand, k, exclude_self=True)


def _kmeans(sample: np.ndarray, k: int, iters: int = 10, seed: int = 13) -> np.ndarray:
    """Tiny deterministic k-means on a driver-side sample (the coarse
    quantizer trainer). Sample scale only — the full corpus never
    materializes."""
    rng = np.random.default_rng(seed)
    centroids = sample[rng.choice(len(sample), size=min(k, len(sample)), replace=False)]
    for _ in range(iters):
        sims = sample @ centroids.T
        assign = sims.argmax(axis=1)
        for c in range(len(centroids)):
            members = sample[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
        centroids = _normalize(centroids)
    return centroids


def ivf_topk(
    emb: rd.Dataset,
    queries: np.ndarray,
    query_ids: np.ndarray,
    *,
    k: int = 3,
    n_lists: int = 16,
    n_probe: int = 4,
    train_sample: int = 2048,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 13,
) -> pa.Table:
    """IVF approximate top-k: a k-means coarse quantizer (trained on a
    driver-side sample) assigns every vector an inverted list; a query
    scores only batch rows whose list is among its ``n_probe`` nearest
    centroids. The FAISS-IVF shape, Ray-Data-first: train once, broadcast
    centroids, stream the corpus through one map_batches.

    The training sample is VALUE-based (every ``stride``-th id, collected
    in id order), never ``limit()`` over blocks: Ray's block layout can
    change run to run under memory pressure, and a layout-dependent
    sample would make the quantizer — and thus the probe sets —
    nondeterministic."""
    n_rows = emb.count()
    stride = max(1, n_rows // train_sample)

    def pick(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.filter(pa.array(ids % stride == 0)).select([id_col, vec_col])

    pdf = (
        emb.map_batches(pick, batch_format="pyarrow")
        .to_pandas()
        .sort_values(id_col)
        .head(train_sample)
    )
    sample = _normalize(np.stack(pdf[vec_col].to_numpy()).astype(np.float64))
    centroids = _kmeans(sample, n_lists, seed=seed)
    q = _normalize(np.asarray(queries, dtype=np.float64))
    q_probes = np.argsort(-(q @ centroids.T), axis=1)[:, :n_probe]
    ref = ray.put((np.asarray(query_ids, dtype=np.int64), q, centroids, q_probes))

    def stage(batch: pa.Table) -> pa.Table:
        qids, qm, cents, probes = ray.get(ref)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        m = _normalize(np.stack(batch[vec_col].to_pandas().to_numpy()).astype(np.float64))
        assign = (m @ cents.T).argmax(axis=1)
        rows = {"query_id": [], "neighbor_id": [], "cosine": []}
        for qi, qid in enumerate(qids):
            mask = np.isin(assign, probes[qi])
            if not mask.any():
                continue
            sims = qm[qi] @ m[mask].T
            sub_ids = ids[mask]
            kk = min(k + 1, len(sub_ids))
            part = np.argpartition(-sims, kk - 1)[:kk]
            for j in part:
                rows["query_id"].append(int(qid))
                rows["neighbor_id"].append(int(sub_ids[j]))
                rows["cosine"].append(float(sims[j]))
        return pa.table(rows)

    cand = emb.map_batches(stage, batch_format="pyarrow").to_pandas()
    return _merge_topk(cand, k, exclude_self=True)


def label_centroid_report(emb: rd.Dataset) -> pa.Table:
    """Per-label aggregate over embeddings: count, mean of dim0, mean L2
    norm — partial sums per batch, tiny final merge (the pre-aggregate
    pattern; no full-vector shuffle)."""

    def partial(batch: pa.Table) -> pa.Table:
        labels = batch["label"].to_numpy(zero_copy_only=False)
        m = np.stack(batch["embedding"].to_pandas().to_numpy()).astype(np.float64)
        df = pd.DataFrame(
            {
                "label": labels,
                "dim0": m[:, 0],
                "norm": np.linalg.norm(m, axis=1),
            }
        )
        g = df.groupby("label").agg(
            n=("dim0", "size"), s_dim0=("dim0", "sum"), s_norm=("norm", "sum")
        ).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    parts = emb.map_batches(partial, batch_format="pyarrow").to_pandas()
    g = parts.groupby("label", sort=True).agg(
        n=("n", "sum"), s_dim0=("s_dim0", "sum"), s_norm=("s_norm", "sum")
    )
    out = pd.DataFrame(
        {
            "label": g.index.astype("int32"),
            "n": g["n"].astype("int64"),
            "mean_dim0": (g["s_dim0"] / g["n"]).round(4),
            "mean_norm": (g["s_norm"] / g["n"]).round(4),
        }
    ).reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


def _det_head(mat: rd.Dataset, id_col: str, vec_col: str, k: int) -> np.ndarray:
    """First k vectors by id, found WITHOUT a global sort: each batch
    offers its local k smallest ids, the driver merges num_batches × k
    candidate rows — deterministic and O(batches·k), not O(n log n)."""

    def head_partial(t: pa.Table) -> pa.Table:
        df = t.select([id_col, vec_col]).to_pandas().nsmallest(k, id_col)
        return pa.Table.from_pandas(df, preserve_index=False)

    heads = (
        mat.map_batches(head_partial, batch_format="pyarrow")
        .to_pandas()
        .nsmallest(k, id_col)
        .sort_values(id_col)
    )
    return np.stack(heads[vec_col].to_numpy()).astype(np.float64)


def assign_partials(
    mat: rd.Dataset,
    centroids: np.ndarray,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pd.DataFrame:
    """One distributed assignment pass: nearest centroid per vector
    (Euclidean, ties to the lower centroid id — numpy argmin's first-hit
    IS that order), returning per-(batch, cluster) partial sums
    (count, per-dim vector sum, batch key). Only k×(d+2) floats per batch
    leave the cluster. Reduction happens at the caller SORTED BY batch
    key so the float accumulation order is deterministic run to run."""
    cent_ref = ray.put(np.asarray(centroids, dtype=np.float64))

    def stage(batch: pa.Table) -> pa.Table:
        cent = ray.get(cent_ref)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        x = np.stack(batch[vec_col].to_pandas().to_numpy()).astype(np.float64)
        # |x-c|^2 = |x|^2 - 2 x·c + |c|^2 ; the x·c matmul is the hot op
        d2 = (
            (x * x).sum(1, keepdims=True)
            - 2.0 * (x @ cent.T)
            + (cent * cent).sum(1)[None, :]
        )
        a = d2.argmin(axis=1)
        counts = np.bincount(a, minlength=len(cent))
        sums = np.zeros_like(cent)
        np.add.at(sums, a, x)
        live = np.where(counts > 0)[0]
        return pa.table(
            {
                "cluster": pa.array(live.astype(np.int64)),
                "n": pa.array(counts[live].astype(np.int64)),
                "vec_sum": pa.array(list(sums[live])),
                "batch_key": pa.array(
                    np.full(len(live), ids.min(), dtype=np.int64)
                ),
            }
        )

    return (
        mat.map_batches(stage, batch_format="pyarrow")
        .to_pandas()
        .sort_values(["batch_key", "cluster"], kind="mergesort")
    )


def kmeans_distributed(
    emb: rd.Dataset,
    *,
    k: int = 8,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[np.ndarray, pa.Table]:
    """Distributed Lloyd's k-means over the FULL embedding column — the
    iterative broadcast-refine pattern (the brief's "iterative
    algorithms" class; :func:`_kmeans` above trains the IVF quantizer on
    a driver-side SAMPLE, this streams every vector every iteration):

    - init: the k lowest-id vectors (deterministic, no global sort);
    - per iteration, the k×d centroid matrix ships ONCE (``ray.put``)
      and each batch returns only k×(d+2) partial floats;
    - the driver reduces partials in sorted batch order (deterministic
      float accumulation) and refreshes centroids; an empty cluster
      keeps its previous centroid;
    - a final pass emits (vec_id, cluster) assignments.

    Returns (centroids, assignments table sorted by vec_id).
    """
    mat = emb.select_columns([id_col, vec_col]).materialize()
    cent = _det_head(mat, id_col, vec_col, k)

    for _ in range(iters):
        parts = assign_partials(mat, cent, id_col=id_col, vec_col=vec_col)
        new = cent.copy()
        for c, grp in parts.groupby("cluster", sort=True):
            n = int(grp["n"].sum())
            if n > 0:
                new[c] = np.sum(np.stack(grp["vec_sum"].to_numpy()), axis=0) / n
        cent = new

    cent_ref = ray.put(cent)

    def assign(batch: pa.Table) -> pa.Table:
        c = ray.get(cent_ref)
        x = np.stack(batch[vec_col].to_pandas().to_numpy()).astype(np.float64)
        d2 = (
            (x * x).sum(1, keepdims=True)
            - 2.0 * (x @ c.T)
            + (c * c).sum(1)[None, :]
        )
        return pa.table(
            {
                id_col: batch[id_col],
                "cluster": pa.array(d2.argmin(axis=1).astype(np.int64)),
            }
        )

    out = (
        mat.map_batches(assign, batch_format="pyarrow")
        .to_pandas()
        .sort_values(id_col)
    )
    return cent, pa.Table.from_pandas(out.reset_index(drop=True), preserve_index=False)


def train_pq_codebooks(
    sample: np.ndarray,
    *,
    n_subspaces: int = 8,
    n_centroids: int = 16,
    iters: int = 10,
    seed: int = 5,
) -> np.ndarray:
    """(M, K, d/M) product-quantization codebooks: per-subspace Lloyd
    k-means over a SAMPLE (Jégou et al., "Product Quantization for
    Nearest Neighbor Search", TPAMI 2011 — public literature). Training
    is sample-scale on the driver by design — the codebooks are tiny
    (M·K·d/M floats) and broadcast once; only encoding/scanning is
    corpus-scale."""
    n, d = sample.shape
    if d % n_subspaces:
        raise ValueError(f"dim {d} not divisible by n_subspaces {n_subspaces}")
    dsub = d // n_subspaces
    rng = np.random.default_rng(seed)
    k_eff = min(n_centroids, n)
    books = np.zeros((n_subspaces, n_centroids, dsub))
    for m in range(n_subspaces):
        x = sample[:, m * dsub : (m + 1) * dsub]
        c = x[rng.choice(n, size=k_eff, replace=False)].copy()
        for _ in range(iters):
            d2 = ((x[:, None, :] - c[None, :, :]) ** 2).sum(-1)
            assign = d2.argmin(1)
            for j in range(k_eff):
                sel = x[assign == j]
                if len(sel):
                    c[j] = sel.mean(0)
        books[m, :k_eff] = c
        if k_eff < n_centroids:  # degenerate tiny sample: repeat last
            books[m, k_eff:] = c[-1]
    return books


def pq_topk(
    emb: rd.Dataset,
    queries: np.ndarray,
    query_ids: np.ndarray,
    *,
    k: int = 3,
    n_subspaces: int = 8,
    n_centroids: int = 16,
    max_train: int = 2048,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
    seed: int = 5,
    rerank: int | None = None,
) -> pa.Table:
    """Product-quantization ANN top-k — the memory-compression scale path
    (a 128-dim float32 vector becomes ``n_subspaces`` uint8 codes: 64×
    smaller, so a 100-TB embedding corpus's codes fit cluster RAM and a
    scan touches no raw vectors).

    Distributed shape: codebooks train on a hash-strided driver sample
    (bounded by ``max_train``), broadcast once; every corpus batch
    encodes itself and scores ALL queries via asymmetric distance
    computation — per-query (M × K) inner-product tables indexed by the
    batch's codes, one ``take``+sum per subspace, no per-row Python.
    Output schema matches :func:`brute_force_topk`
    (query_id, neighbor_id, rank, cosine≈); recall < 1 by design with
    ``rerank=None`` — the pytest recall gate covers that mode.

    ``rerank=R`` is the standard ADC-shortlist + exact-rerank design
    (Jégou et al. §V): per batch, each query's top-R ADC candidates get
    their TRUE cosine computed from the batch's raw vectors, and the
    merge ranks on exact scores.  With R >= batch rows ("probe-all", the
    :func:`ivf_topk` n_probe=n_lists analog) the result provably equals
    :func:`brute_force_topk`, which makes the gate query hash-checkable
    against the brute SQL oracle while still exercising the full PQ
    train/encode/ADC machinery; the scale bench keeps rerank None/small.
    """
    n_corpus = emb.count()
    stride = max(1, n_corpus // max_train)

    def pick(t: pa.Table) -> pa.Table:
        from open_finance_lakehouse_ray.functions.hashing import splitmix64

        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        # HASH-strided, id-distribution-proof (plain `id % stride` returns
        # nothing for e.g. all-odd ids); the collect is id-SORTED before
        # head() — never `limit()` over blocks, whose layout (and thus the
        # codebooks) would vary run to run (ivf_topk's determinism rule)
        h = splitmix64(ids.view(np.uint64))
        return t.filter(pa.array(h % np.uint64(stride) == 0))

    train_tab = (
        emb.select_columns([id_col, vec_col])
        .map_batches(pick, batch_format="pyarrow")
        .to_pandas()
    )
    if len(train_tab) == 0:  # pathological stride miss: tiny corpus anyway
        train_tab = emb.select_columns([id_col, vec_col]).to_pandas()
    train_tab = train_tab.sort_values(id_col).head(max_train)
    sample = _normalize(np.stack(train_tab[vec_col].to_numpy()).astype(np.float64))
    books = train_pq_codebooks(
        sample, n_subspaces=n_subspaces, n_centroids=n_centroids, seed=seed
    )

    q = _normalize(np.asarray(queries, dtype=np.float64))
    dsub = q.shape[1] // n_subspaces
    # per-query ADC tables: table[qi, m, j] = <q_sub, centroid_j>
    tables = np.einsum(
        "qmd,mkd->qmk", q.reshape(len(q), n_subspaces, dsub), books
    )
    if rerank is not None and rerank < k + (1 if exclude_self else 0):
        raise ValueError(f"rerank={rerank} must cover k={k} (+self exclusion)")
    b_ref = ray.put((books, np.asarray(query_ids, dtype=np.int64), tables, q))

    def stage(batch: pa.Table) -> pa.Table:
        books_, qids, tabs, qm = ray.get(b_ref)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        m = _normalize(
            np.stack(batch[vec_col].to_pandas().to_numpy()).astype(np.float64)
        )
        n = len(ids)
        xs = m.reshape(n, n_subspaces, dsub)
        # encode: nearest centroid per subspace (K is small; (n, K) per m)
        codes = np.empty((n, n_subspaces), dtype=np.int64)
        for sm in range(n_subspaces):
            d2 = (
                (xs[:, sm, None, :] - books_[sm][None, :, :]) ** 2
            ).sum(-1)
            codes[:, sm] = d2.argmin(1)
        # ADC: approx <q, x> = sum_m tabs[q, m, code[x, m]]
        sims = np.zeros((len(qids), n))
        for sm in range(n_subspaces):
            sims += tabs[:, sm, :][:, codes[:, sm]]
        rows = {"query_id": [], "neighbor_id": [], "cosine": []}
        if rerank is None:
            kk = min(k + (1 if exclude_self else 0), n)
            for qi in range(len(qids)):
                part = np.argpartition(-sims[qi], kk - 1)[:kk]
                for j in part:
                    rows["query_id"].append(int(qids[qi]))
                    rows["neighbor_id"].append(int(ids[j]))
                    rows["cosine"].append(float(sims[qi, j]))
        else:
            rr = min(rerank, n)
            kk = min(k + (1 if exclude_self else 0), rr)
            for qi in range(len(qids)):
                cand_idx = (
                    np.arange(n)
                    if rr == n
                    else np.argpartition(-sims[qi], rr - 1)[:rr]
                )
                exact = m[cand_idx] @ qm[qi]  # TRUE cosine for the shortlist
                # only the batch-local exact top-k leaves the task
                keep = np.argpartition(-exact, kk - 1)[:kk]
                for j in keep:
                    rows["query_id"].append(int(qids[qi]))
                    rows["neighbor_id"].append(int(ids[cand_idx[j]]))
                    rows["cosine"].append(float(exact[j]))
        return pa.table(rows)

    cand = emb.map_batches(stage, batch_format="pyarrow").to_pandas()
    return _merge_topk(cand, k, exclude_self)
