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
  batch); above the size guard it switches to hash-bucketed joins
  (``_verified_pairs``) — no stage materializes the corpus on one node;
- bucket keys are never fed to a raw ``groupby`` (one Python call per
  distinct key): ``_collision_groups`` hash-partitions them into a
  bounded group count first — see docs/PERF.md finding 4.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

MERSENNE = np.uint64((1 << 61) - 1)


def _force_scale() -> bool:
    """``OFLR_FORCE_SCALE_PATHS=1`` disables every small-corpus broadcast
    fast path so the bucketed-join scale paths run end to end — used to
    prove BOTH execution paths produce oracle-identical results."""
    return os.environ.get("OFLR_FORCE_SCALE_PATHS", "") not in ("", "0")


def _shingle_hashes(texts: list[str], k: int = 3) -> list[np.ndarray]:
    """Per-doc array of distinct k-word shingle hashes (uint64).

    TOKENIZATION CONTRACT (round-4 advice): the whole shingle family —
    MinHash, n-gram Jaccard, cluster collapse, decontamination — splits on
    a LITERAL SINGLE SPACE, bit-for-bit the ``string_split(text, ' ')``
    the SQL oracles use (consecutive spaces/tabs/newlines produce empty
    tokens on BOTH sides, never silently collapse on one side only).

    The per-doc Python loop is over DOCS, not tokens; token hashing is
    pandas' C siphash over the flattened shingle list.
    """
    all_shingles: list[str] = []
    offsets = [0]
    for t in texts:
        w = t.split(" ")
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
    # single-space split: the _shingle_hashes tokenization contract
    wa, wb = a.split(" "), b.split(" ")
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
    broadcast_max_bytes: int = 64 * 1024 * 1024,
) -> pa.Table:
    """MinHash+LSH candidate pairs verified by exact k-shingle Jaccard.

    Returns (id_a, id_b, jaccard) with id_a < id_b, jaccard >= threshold.
    The signature/bucket stages stream regardless of corpus size. The
    verify stage is size-guarded: a corpus whose (id, text) columns fit
    ``broadcast_max_bytes`` is broadcast ONCE (``ray.put``, zero extra
    shuffles — the small-corpus fast path); above the guard the texts are
    attached by a hash-bucketed join on doc_id and the candidate-pair
    dedup runs as a distributed groupby — no stage ever materializes the
    corpus on one node.
    """

    def sig_stage(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        sigs = minhash_signatures(
            batch[text_col].to_pylist(), num_perm=num_perm, k=shingle_k
        )
        return band_rows(ids, sigs, bands=bands)

    # the (id, text) projection feeds the signature stage AND the verify
    # stage: pinned once when small (no second source read), streamed with
    # per-stage re-reads above the guard (_maybe_pin)
    texts, tsize, _ = _maybe_pin(docs.select_columns([id_col, text_col]),
                                 estimate_from=docs)
    small = (not _force_scale()) and (
        tsize is not None and tsize <= broadcast_max_bytes
    )

    buckets = texts.map_batches(sig_stage, batch_format="pyarrow")

    cand = _collision_groups(buckets, ("band_id", "band_hash"), _bucket_pairs)
    return _verified_pairs(
        cand, texts, small,
        id_col=id_col, text_col=text_col,
        threshold=threshold, shingle_k=shingle_k,
    )


def _bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
    """All (id_a < id_b) pairs within one candidate bucket."""
    ids = np.sort(g["doc_id"].to_numpy())
    if len(ids) < 2:
        return pd.DataFrame({"id_a": np.array([], dtype=np.int64),
                             "id_b": np.array([], dtype=np.int64)})
    ii, jj = np.triu_indices(len(ids), k=1)
    return pd.DataFrame({"id_a": ids[ii], "id_b": ids[jj]})


NUM_SHUFFLE_PARTITIONS = 64

# Pinning guard for the multi-consumer corpus projections (round-3 verdict):
# a small (id, text) projection is materialized once and feeds two stages
# (no second source read), but pinning a 100-TB corpus in the object store
# just forces spill — above this bound the LAZY dataset is returned and each
# consumer re-reads the pruned columns from the source instead.
PIN_MAX_BYTES = int(os.environ.get("OFLR_PIN_MAX_BYTES", str(4 << 30)))


def _plan_kind(ds: rd.Dataset) -> str:
    """Classify a dataset's logical plan for the pin decision.

    - ``"cheap"``: pure ``Read`` (optionally under ``RandomizeBlocks``) —
      ``size_bytes()`` answers from parquet metadata without executing
      anything (verified on Ray 2.49; a union, by contrast, EXECUTES).
    - ``"source"``: every leaf is a ``Read`` but the probe would execute
      (e.g. ``Union`` of reads) — re-readable from the source, so the
      lazy per-consumer re-read scale path works; just no free estimate.
    - ``"derived"``: contains a computing op — there is NO source to
      re-read, so laziness means re-executing the upstream pipeline once
      per consumer.

    Unknown shapes and moved Ray internals classify as ``"source"`` — the
    conservative failure mode (round-4 review finding): never an
    unbounded materialize, never a hidden full execution in the probe.
    """
    try:
        from ray.data._internal.logical.operators.all_to_all_operator import (
            RandomizeBlocks,
        )
        from ray.data._internal.logical.operators.n_ary_operator import Union
        from ray.data._internal.logical.operators.read_operator import Read

        def walk(op) -> str:
            if isinstance(op, Read):
                return "cheap"
            if isinstance(op, (RandomizeBlocks, Union)):
                kinds = {walk(d) for d in op.input_dependencies}
                if "derived" in kinds:
                    return "derived"
                if isinstance(op, Union):
                    return "source"
                return "cheap" if kinds == {"cheap"} else "source"
            return "derived"

        return walk(ds._logical_plan.dag)
    except Exception:  # noqa: BLE001 — internals moved: conservative
        return "source"


def _maybe_pin(
    projected: rd.Dataset, estimate_from: rd.Dataset | None = None
) -> tuple[rd.Dataset, int | None, bool]:
    """(dataset, size-estimate, pinned) — projection pinned only when small.

    The pin decision is RETURNED, never re-derived by callers from the
    size estimate (round-4 review finding: the derived-input path pins at
    any size, so ``est <= PIN_MAX_BYTES`` is not equivalent and a caller's
    copy of the guard silently drifts).

    Read-backed corpus (``estimate_from`` is a bare source read): the size
    probe answers from parquet metadata without executing anything.
    Probing the ``select_columns`` projection itself would be wrong twice
    over (review finding, round 4, verified on Ray 2.49): select_columns
    is a map op, so its ``size_bytes()`` EXECUTES the full pipeline — a
    wasted corpus pass on the too-big-to-pin path, and a doubled read
    below the guard.  The raw estimate over-counts (all columns, not just
    the projection), which only errs toward streaming — never toward
    pinning too much.

    Source-backed but not metadata-cheap (e.g. a union of reads, or any
    unrecognized/future plan shape): the probe would silently execute, so
    no probe runs and no pin happens — every consumer re-reads from the
    source, which is exactly the documented scale path.  PIN_MAX_BYTES is
    therefore a TRUE bound: nothing can materialize above it by
    misclassification (round-4 review finding).

    Derived corpus (a computing op in the plan): there is no free
    metadata probe AND no source to re-read, so the lazy "scale path"
    would re-execute the whole upstream pipeline once per consumer.  The
    projection is materialized once — shared by every consumer, with Ray
    spilling past memory — and the ACTUAL materialized size is returned
    (free on a materialized dataset).  This is the round-4 review fix for
    probing a derived input: the probe itself was a full hidden execution.

    ``None`` means unknown and is treated as big.
    ``OFLR_FORCE_SCALE_PATHS=1`` skips the pin unconditionally so the
    re-read scale path is testable end to end.
    """
    if _force_scale():
        return projected, None, False
    src = estimate_from if estimate_from is not None else projected
    kind = _plan_kind(src)
    if kind == "source":
        return projected, None, False
    if kind == "derived":
        pinned = projected.materialize()
        try:
            est = pinned.size_bytes()
        except Exception:  # noqa: BLE001
            est = None
        return pinned, est, True
    try:
        est = src.size_bytes()
    except Exception:  # noqa: BLE001 — unknown size: stream, don't pin
        est = None
    if est is not None and est <= PIN_MAX_BYTES:
        return projected.materialize(), est, True
    return projected, est, False


def _pk_tagger(key_cols: tuple[str, ...], num_partitions: int):
    """map_batches fn appending ``_pk`` = stable hash of key_cols mod
    num_partitions. The point: a Ray ``groupby`` over RAW bucket keys
    creates one ``map_groups`` invocation per distinct key — at corpus
    scale that is millions of tiny Python calls (measured: a 100k-doc
    LSH banding stalled for minutes on per-group overhead alone).
    Hash-partitioning to a BOUNDED group count keeps equal keys
    co-located while the per-key work happens vectorized INSIDE the
    partition."""
    from open_finance_lakehouse_ray.functions.hashing import splitmix64

    def tag(t: pa.Table) -> pa.Table:
        h = np.zeros(t.num_rows, dtype=np.uint64)
        for c in key_cols:
            col = t[c]
            if pa.types.is_integer(col.type):
                a = col.to_numpy(zero_copy_only=False).astype(np.int64).view(np.uint64)
            else:
                a = pd.util.hash_array(np.asarray(col.to_pylist(), dtype=object))
            h = splitmix64(h ^ a)
        return t.append_column(
            "_pk", pa.array((h % np.uint64(num_partitions)).astype(np.int64))
        )

    return tag


def _collision_groups(
    ds: rd.Dataset,
    key_cols: tuple[str, ...],
    per_group_fn,
    *,
    num_partitions: int = NUM_SHUFFLE_PARTITIONS,
):
    """Apply ``per_group_fn`` to every key group of size ≥ 2 (an actual
    collision — singletons can never pair) via the bounded hash-partition
    shuffle. Group-size filtering is a vectorized ``transform("size")``;
    the Python loop runs only over colliding groups in one partition."""
    tagged = ds.map_batches(
        _pk_tagger(key_cols, num_partitions), batch_format="pyarrow"
    )

    def part(df: pd.DataFrame) -> pd.DataFrame:
        keys = list(key_cols)
        sz = df.groupby(keys, sort=False)[keys[0]].transform("size")
        coll = df[sz >= 2]
        frames = [
            per_group_fn(g) for _, g in coll.groupby(keys, sort=False)
        ]
        frames = [f for f in frames if len(f)]
        if not frames:
            return per_group_fn(df.iloc[0:0])
        return pd.concat(frames, ignore_index=True)

    return tagged.groupby("_pk").map_groups(part, batch_format="pandas")


def _dedup_pairs(
    pairs: rd.Dataset, *, num_partitions: int = NUM_SHUFFLE_PARTITIONS
) -> rd.Dataset:
    """Distributed exact dedup of candidate (id_a, id_b) rows — equal
    pairs co-locate by hash partition, dedup is one vectorized
    ``drop_duplicates`` per partition (globally correct; any extra
    per-pair columns are identical across duplicates of a pair, so
    keep-first is deterministic)."""
    tagged = pairs.map_batches(
        _pk_tagger(("id_a", "id_b"), num_partitions), batch_format="pyarrow"
    )

    def dd(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.sort_values(["id_a", "id_b"], kind="mergesort")
            .drop_duplicates(["id_a", "id_b"])
            .drop(columns=["_pk"])
        )

    return tagged.groupby("_pk").map_groups(dd, batch_format="pandas")


def _verified_pairs(
    cand: rd.Dataset,
    texts: rd.Dataset,
    small: bool,
    *,
    id_col: str,
    text_col: str,
    threshold: float,
    shingle_k: int,
    pre_deduped: bool = False,
) -> pa.Table:
    """Shared tail of the shingle-based near-dup family: dedup candidate
    (id_a, id_b) pairs, attach texts, verify by EXACT k-shingle Jaccard.

    ``small=True`` (size-guarded by the caller) broadcasts the corpus
    ONCE via the object store; otherwise the texts are attached by two
    hash-bucketed shuffle joins and dedup runs as a distributed groupby —
    no stage ever materializes the corpus on one node.
    """
    if small:
        # fast path (size-guarded): candidates collapse to one verify
        # block and the texts ship as ONE object-store dict — zero extra
        # shuffles; the whole set is bounded by the guard
        @ray.remote
        def _texts_dict(refs):
            t = pa.concat_tables([x for x in ray.get(list(refs)) if x.num_rows])
            return dict(zip(t[id_col].to_pylist(), t[text_col].to_pylist()))

        texts_ref = _texts_dict.remote(texts.to_arrow_refs())
        cand_df = cand.to_pandas()
        if len(cand_df) == 0:
            return pa.table({"id_a": pa.array([], pa.int64()),
                             "id_b": pa.array([], pa.int64()),
                             "jaccard": pa.array([], pa.float64())})
        if not pre_deduped:
            cand_df = cand_df.drop_duplicates(["id_a", "id_b"])

        def verify_small(batch: pa.Table) -> pa.Table:
            lookup = ray.get(texts_ref)
            ia, ib, j = [], [], []
            for a, b in zip(batch["id_a"].to_pylist(),
                            batch["id_b"].to_pylist()):
                ta, tb = lookup.get(a), lookup.get(b)
                if ta is None or tb is None:
                    # a candidate id with no surviving text row (e.g. an
                    # index entry whose source doc was deleted) — the
                    # scale path drops such pairs via its inner joins;
                    # match that, don't crash
                    continue
                ia.append(a)
                ib.append(b)
                j.append(exact_jaccard(ta, tb, k=shingle_k))
            out = pa.table({"id_a": pa.array(ia, pa.int64()),
                            "id_b": pa.array(ib, pa.int64()),
                            "jaccard": pa.array(j, pa.float64())})
            import pyarrow.compute as pc

            return out.filter(pc.greater_equal(out["jaccard"], threshold))

        verified = (
            rd.from_arrow(pa.Table.from_pandas(cand_df, preserve_index=False))
            .map_batches(verify_small, batch_format="pyarrow", batch_size=8192)
            .to_pandas()
        )
    else:
        # scale path: distributed pair dedup + bucketed text joins
        if not pre_deduped:
            cand = _dedup_pairs(cand)

        from open_finance_lakehouse_ray.pipelines.join import join as ds_join

        cand = ds_join(cand, texts, on="id_a", right_on=id_col,
                       right_columns=[text_col], suffix="_ta",
                       strategy="shuffle")
        cand = cand.map_batches(
            lambda t: t.rename_columns(
                ["text_a" if c == text_col else c for c in t.column_names]
            ),
            batch_format="pyarrow",
        )
        cand = ds_join(cand, texts, on="id_b", right_on=id_col,
                       right_columns=[text_col], suffix="_tb",
                       strategy="shuffle")

        def verify(batch: pa.Table) -> pa.Table:
            ia = batch["id_a"].to_pylist()
            ib = batch["id_b"].to_pylist()
            ta = batch["text_a"].to_pylist()
            tb = batch[text_col].to_pylist()
            j = [exact_jaccard(a, b, k=shingle_k) for a, b in zip(ta, tb)]
            out = pa.table({"id_a": ia, "id_b": ib, "jaccard": j})
            import pyarrow.compute as pc

            return out.filter(pc.greater_equal(out["jaccard"], threshold))

        verified = cand.map_batches(verify, batch_format="pyarrow").to_pandas()
    if "id_a" not in verified.columns or len(verified) == 0:
        return pa.table({"id_a": pa.array([], pa.int64()),
                         "id_b": pa.array([], pa.int64()),
                         "jaccard": pa.array([], pa.float64())})
    verified = verified.sort_values(["id_a", "id_b"]).astype(
        {"id_a": "int64", "id_b": "int64"}
    )
    return pa.Table.from_pandas(verified.reset_index(drop=True), preserve_index=False)


def ngram_jaccard_pairs(
    docs: rd.Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.6,
    shingle_k: int = 3,
    broadcast_max_bytes: int = 64 * 1024 * 1024,
) -> pa.Table:
    """EXACT n-gram Jaccard near-dup pairs — recall 1.0, no MinHash
    approximation (reference has no near-dedup at all, SURVEY.md §2.7).

    Candidate generation is PREFIX FILTERING (the All-Pairs/PPJoin family,
    Bayardo et al. WWW'07 / Xiao et al. WWW'08 — public literature): under
    ONE global total order over shingles (the 64-bit shingle hash value —
    any shared total order preserves the guarantee), a pair with
    ``J(A,B) >= t`` must share at least one shingle within each side's
    prefix of length ``|S| - ceil(t*|S|) + 1``. Only prefix shingles are
    emitted as (shingle_hash, doc_id) inverted-index rows, so:

    - the index groupby shuffle carries ~(1-t)·Σ|S| rows, not Σ|S|;
    - a shingle shared only by pairs that cannot reach the threshold
      never creates candidates — unlike a plain inverted index, hot
      common shingles don't explode into quadratic buckets;
    - recall is still exactly 1.0, so the DuckDB all-pairs oracle can
      hash-check this operator end to end.

    Verification reuses the size-guarded broadcast / bucketed-join tail
    shared with :func:`minhash_near_dup_pairs`.
    """

    def prefix_index(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        hashes = _shingle_hashes(batch[text_col].to_pylist(), k=shingle_k)
        out_hash: list[np.ndarray] = []
        out_id: list[np.ndarray] = []
        for i, h in enumerate(hashes):
            if len(h) == 0:
                continue
            h = np.sort(h)
            # exact overlap bound: ceil(t*n) computed with a 1e-9 slack so
            # float representation error NEVER rounds the bound UP (e.g.
            # 0.55*100 = 55.000000000000007 -> ceil 56 would shorten the
            # prefix by one and silently break the recall-1.0 guarantee);
            # erring low only lengthens the prefix (more candidates, never
            # fewer)
            bound = int(np.ceil(threshold * len(h) - 1e-9))
            p = len(h) - bound + 1
            pref = h[: max(1, p)]
            out_hash.append(pref.view(np.int64))
            out_id.append(np.full(len(pref), ids[i], dtype=np.int64))
        if not out_hash:
            return pa.table({"shingle": pa.array([], pa.int64()),
                             "doc_id": pa.array([], pa.int64())})
        return pa.table({"shingle": np.concatenate(out_hash),
                         "doc_id": np.concatenate(out_id)})

    texts, tsize, _ = _maybe_pin(docs.select_columns([id_col, text_col]),
                                 estimate_from=docs)
    small = (not _force_scale()) and (
        tsize is not None and tsize <= broadcast_max_bytes
    )

    cand = _collision_groups(
        texts.map_batches(prefix_index, batch_format="pyarrow"),
        ("shingle",),
        _bucket_pairs,
    )
    return _verified_pairs(
        cand, texts, small,
        id_col=id_col, text_col=text_col,
        threshold=threshold, shingle_k=shingle_k,
    )


# --------------------------------------------------------------- simhash

def _hash_tokens_sql(tokens: list[str]) -> np.ndarray:
    """Stable 64-bit token hashes via DuckDB's ``hash()`` (vectorized in
    its engine over a zero-copy Arrow registration). Using a hash an
    independent SQL engine can recompute makes the whole SimHash pipeline
    oracle-checkable end to end — the driver's DuckDB gate can rebuild the
    signatures bit for bit."""
    import duckdb

    tab = pa.table(
        {
            "i": np.arange(len(tokens), dtype=np.int64),
            "s": pa.array(tokens, pa.string()),
        }
    )
    con = duckdb.connect()
    try:
        con.register("toks", tab)
        out = con.execute("SELECT hash(s) AS h FROM toks ORDER BY i").arrow()
    finally:
        con.close()
    return out["h"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.uint64)


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
        w = t.split(" ")  # the _shingle_hashes tokenization contract
        all_tokens.extend(
            " ".join(w[i : i + k]) for i in range(max(0, len(w) - k + 1))
        )
        offsets.append(len(all_tokens))
    if not all_tokens:
        return out
    th = _hash_tokens_sql(all_tokens)
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


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized popcount of a uint64 array."""
    if hasattr(np, "bitwise_count"):
        return np.bitwise_count(x).astype(np.int64)
    b = np.unpackbits(np.ascontiguousarray(x).view(np.uint8))
    return b.reshape(len(x), 8 * 8).sum(axis=1).astype(np.int64)


def simhash_near_dup_pairs(
    docs: rd.Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
) -> pa.Table:
    """SimHash pairs within ``max_hamming`` bits, found via 4×16-bit block
    banding (a pair within hamming 3 of a 64-bit hash must agree exactly
    on at least one of 4 blocks — pigeonhole), verified by exact popcount.

    Fully distributed: signatures are a ``map_batches`` stage, candidate
    generation is a ``groupby(block_id, block_value)`` shuffle with a
    vectorized XOR-popcount verify inside each bucket, and cross-block
    pair dedup is its own ``groupby`` — the signature set is never pulled
    to the driver (the round-1 driver loop this replaces is the exact
    anti-pattern VERDICT.md flagged)."""

    def sig_stage(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        h = simhash64(batch[text_col].to_pylist())
        blk, val, oid, sim = [], [], [], []
        for b in range(4):
            blk.append(np.full(len(ids), b, dtype=np.int64))
            val.append(((h >> np.uint64(16 * b)) & np.uint64(0xFFFF)).astype(np.int64))
            oid.append(ids)
            sim.append(h.view(np.int64))
        return pa.table(
            {
                "block_id": np.concatenate(blk),
                "block_val": np.concatenate(val),
                "doc_id": np.concatenate(oid),
                "sim": np.concatenate(sim),
            }
        )

    rows = docs.map_batches(sig_stage, batch_format="pyarrow")

    def block_pairs(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"id_a": np.array([], dtype=np.int64),
             "id_b": np.array([], dtype=np.int64),
             "hamming": np.array([], dtype=np.int64)}
        )
        if len(g) < 2:
            return empty
        order = np.argsort(g["doc_id"].to_numpy())
        ids = g["doc_id"].to_numpy()[order]
        sim = g["sim"].to_numpy()[order].astype(np.int64).view(np.uint64)
        ii, jj = np.triu_indices(len(ids), k=1)
        d = _popcount64(sim[ii] ^ sim[jj])
        keep = d <= max_hamming
        if not keep.any():
            return empty
        return pd.DataFrame(
            {"id_a": ids[ii[keep]], "id_b": ids[jj[keep]], "hamming": d[keep]}
        )

    pairs = _collision_groups(rows, ("block_id", "block_val"), block_pairs)

    out = _dedup_pairs(pairs).to_pandas()
    if "id_a" not in out.columns or len(out) == 0:
        return pa.table({"id_a": pa.array([], pa.int64()),
                         "id_b": pa.array([], pa.int64()),
                         "hamming": pa.array([], pa.int64())})
    out = out.sort_values(["id_a", "id_b"]).astype(
        {"id_a": "int64", "id_b": "int64", "hamming": "int64"}
    )
    return pa.Table.from_pandas(out.reset_index(drop=True), preserve_index=False)


# ------------------------------------------------- embedding near-dup

def _hyperplane_band_params(threshold: float, n_planes: int) -> tuple[int, int]:
    """(rows_per_band, bands) tuned to the threshold. For random
    hyperplanes P[bit agrees] = 1 - arccos(s)/π at cosine s; pick the band
    width r so a true pair matches a band with probability ~0.5, then use
    every plane: recall at s = 1-(1-p^r)^bands ≈ 1 for any sane n_planes.
    Low thresholds ⇒ small r ⇒ few, large buckets (the verify cost honestly
    approaches a scan — inherent to LSH); high thresholds ⇒ selective
    buckets and the real 100-TB win: no node ever holds the whole matrix."""
    p = 1.0 - np.arccos(np.clip(threshold, -1.0, 1.0)) / np.pi
    # band width so a TRUE pair matches each band with prob ~0.35: with
    # b = n_planes/r bands, recall = 1-(1-0.35)^b ≈ 1 while random pairs
    # (p≈0.5/bit) collide per band at only 0.5^r
    r = max(1, int(round(np.log(0.35) / np.log(max(min(p, 0.999), 1e-9)))))
    r = min(r, 16, n_planes)
    return r, max(1, n_planes // r)


def _pack_nvec(m: np.ndarray) -> pa.Array:
    """Row-normalized float64 vectors as PLAIN BINARY (float64-LE bytes):
    a list<double> column gets auto-cast to Ray's tensor extension, which
    cannot survive a shuffle's sliced blocks (to_pandas buffer error).
    One serialization contract for every vector-shipping stage —
    :func:`_unpack_nvec` is the only reader (round-5 review: two private
    copies of the pack/unpack pair had already appeared)."""
    return pa.array([row.tobytes() for row in m], pa.binary())


def _unpack_nvec(bufs: "list[bytes]") -> np.ndarray:
    return np.frombuffer(b"".join(bufs), dtype=np.float64).reshape(
        len(bufs), -1
    )


def _normalize_rows(x: np.ndarray) -> np.ndarray:
    return x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)


def semantic_dedup(
    emb: rd.Dataset,
    *,
    k: int = 8,
    threshold: float = 0.5,
    centroids: "np.ndarray | None" = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_partitions: int = NUM_SHUFFLE_PARTITIONS,
) -> pa.Table:
    """Embedding-CLUSTER near-dedup — SemDeDup (Abbas et al. 2023,
    "SemDeDup: Data-efficient learning at web-scale through semantic
    deduplication", arXiv:2303.09540, public literature): k-means the
    embeddings, then prune near-duplicates ONLY within each cluster, so
    the quadratic pairwise work is O(Σ cᵢ²) over cluster sizes instead of
    all-pairs over the corpus. At 100 TB, k scales with the corpus
    (SemDeDup uses 10⁴–10⁵ clusters) to bound every cᵢ.

    Keep rule (deterministic): within a cluster, a vector is a duplicate
    iff some LOWER-id vector of the same cluster has cosine >=
    ``threshold`` to it; ``dup_of`` is the lowest such id (NULL = kept).
    Like the published greedy scan, the lower-id witness need not itself
    survive (A~B, B~C, A≁C drops both B and C) — chain semantics are
    :func:`dedup_clusters`'s job.

    Clustering: ``centroids`` from :func:`..similarity.kmeans_distributed`
    in production; the default (None) is ONE deterministic assignment step
    against the k lowest-id vectors — the same gate-checkable body as the
    ``emb_kmeans_assign`` query, which is what lets the SQL oracle
    replicate the clustering exactly.

    Distributed shape: centroid matrix broadcast once (``ray.put``) →
    assignment ``map_batches`` (the |x|²−2x·c+|c|² expansion, one matmul
    per batch) → ONE bounded hash-partition shuffle on cluster id (vectors
    ride as plain float64-LE binary — the list<double> tensor-extension
    cast does not survive sliced shuffle blocks) → per-cluster normalized
    matmul + lower-triangle threshold scan, vectorized. Only (id, cluster,
    dup_of) int rows return to the driver.
    """
    import ray as _ray

    from open_finance_lakehouse_ray.pipelines.similarity import _det_head

    mat = emb.select_columns([id_col, vec_col])
    if centroids is None:
        # _det_head streams (per-batch k-smallest partials) — no
        # materialize: the corpus is read twice (head + assign), pinned
        # never
        cent = _det_head(mat, id_col, vec_col, k)
    else:
        cent = np.asarray(centroids, dtype=np.float64)
    cent_ref = _ray.put(cent)

    empty_assign = pa.table(
        {
            "vec_id": pa.array([], pa.int64()),
            "cluster": pa.array([], pa.int64()),
            "nvec": pa.array([], pa.binary()),
        }
    )

    def assign(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:  # np.stack raises on an empty block
            return empty_assign
        c = _ray.get(cent_ref)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        x = np.stack(batch[vec_col].to_pandas().to_numpy()).astype(np.float64)
        d2 = (
            (x * x).sum(1, keepdims=True)
            - 2.0 * (x @ c.T)
            + (c * c).sum(1)[None, :]
        )
        return pa.table(
            {
                "vec_id": ids,
                "cluster": pa.array(d2.argmin(axis=1).astype(np.int64)),
                "nvec": _pack_nvec(_normalize_rows(x)),
            }
        )

    def prune(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for cl, grp in df.groupby("cluster", sort=False):
            grp = grp.sort_values("vec_id", kind="mergesort")
            ids = grp["vec_id"].to_numpy()
            x = _unpack_nvec(list(grp["nvec"]))
            sims = x @ x.T
            # lower triangle only: candidate witnesses are LOWER ids (rows
            # sorted ascending), first hit per row = lowest witness id
            hit = np.tril(sims >= threshold, k=-1)
            any_hit = hit.any(axis=1)
            first = hit.argmax(axis=1)  # valid only where any_hit
            dup_of = np.where(any_hit, ids[first], -1)
            out.append(
                pd.DataFrame(
                    {"vec_id": ids, "cluster": int(cl), "dup_of": dup_of}
                )
            )
        res = pd.concat(out, ignore_index=True)
        res["dup_of"] = res["dup_of"].astype("int64")
        return res

    got = (
        mat.map_batches(assign, batch_format="pyarrow")
        .map_batches(_pk_tagger(("cluster",), num_partitions), batch_format="pyarrow")
        .groupby("_pk")
        .map_groups(
            lambda df: prune(df.drop(columns=["_pk"])), batch_format="pandas"
        )
        .to_pandas()
    )
    if "vec_id" not in got.columns:  # empty corpus: schema-less empty frame
        got = pd.DataFrame(
            {
                "vec_id": pd.array([], dtype="int64"),
                "cluster": pd.array([], dtype="int64"),
                "dup_of": pd.array([], dtype="int64"),
            }
        )
    got = got.sort_values("vec_id")
    t = pa.Table.from_pandas(got.reset_index(drop=True), preserve_index=False)
    # -1 sentinel -> NULL (ints stay exact through the gate's value hash)
    dup = t["dup_of"]
    import pyarrow.compute as _pc

    t = t.set_column(
        t.column_names.index("dup_of"),
        "dup_of",
        _pc.if_else(_pc.equal(dup, -1), pa.nulls(t.num_rows, pa.int64()), dup),
    )
    return t


def embedding_near_dup_pairs(
    emb: rd.Dataset,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    strategy: str = "lsh",
    n_planes: int = 128,
    seed: int = 13,
    brute_max_rows: int = 10_000,
) -> pa.Table:
    """Cosine near-duplicate pairs (id_a < id_b, cosine ≥ threshold).

    ``strategy="lsh"`` (default, the scale path): normalize once →
    random-hyperplane sign bits → band signatures per batch (vectorized
    matmul + bit-pack) → ``groupby(band_id, band_hash)`` bucket shuffle
    over (band_id, band_hash, vid) rows ONLY — the vector payload never
    rides the band shuffle (round 2 shipped ``nvec`` on every band row,
    a bands× (~8-16×) amplification of the dominant shuffle cost;
    VERDICT r2 finding 3) → distributed pair dedup across bands → vectors
    attach ONCE per side via the size-guarded bucketed ``join()`` →
    exact per-pair cosine verify. No stage materializes the corpus on one
    node: the hyperplane matrix (d × n_planes floats) is the only
    per-actor state. Verification is exact, so LSH recall (≈1 at the
    tuned band width, see :func:`_hyperplane_band_params`) is the only
    approximation.

    ``strategy="brute"``: all-pairs matmul against a broadcast normalized
    matrix — exact, simple, and only for corpora that fit one node's
    memory; ``"auto"`` picks brute under ``brute_max_rows`` rows.
    """
    if strategy == "auto":
        strategy = "brute" if emb.count() <= brute_max_rows else "lsh"
    if strategy == "brute":
        return _embedding_near_dup_brute(
            emb, id_col=id_col, vec_col=vec_col, threshold=threshold
        )

    r_bits, bands = _hyperplane_band_params(threshold, n_planes)

    def normalize(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        m = np.stack(batch[vec_col].to_pandas().to_numpy()).astype(np.float64)
        # binary-packed (see _pack_nvec: the tensor-extension workaround)
        return pa.table({"vid": ids, "nvec": _pack_nvec(_normalize_rows(m))})

    def _decode(col) -> np.ndarray:
        return _unpack_nvec(col.to_pylist())

    # normalized once; feeds BOTH the banding stage and the verify joins
    nvecs = (
        emb.select_columns([id_col, vec_col])
        .map_batches(normalize, batch_format="pyarrow")
        .materialize()
    )

    # in-bucket prefilter: the FULL n_planes sign sketch travels with each
    # band row (n_planes/8 bytes — vs the 8·d-byte vector it replaces), so
    # a hot bucket can discard its sub-threshold pairs locally by sketch
    # hamming distance instead of shipping O(m²) candidates through the
    # dedup + join shuffles (review finding, round 3). The cutoff is
    # derived in SIGMA units of the sketch's hamming noise (round-4
    # advice: a fixed cosine margin was only ~1.8σ at threshold 0.5, so a
    # true at-threshold pair could be dropped before the exact verify
    # with ~1-3% probability over plane draws): a true pair at cosine
    # exactly `threshold` has expected hamming n·p, p = acos(t)/π, std
    # sqrt(n·p·(1−p)); keep everything within C=6σ above the mean, so
    # the prefilter's false-drop probability is ~1e-9 — beneath LSH band
    # recall itself. Exact verify still decides every surviving pair.
    p_mis = np.arccos(np.clip(threshold, -1.0, 1.0)) / np.pi
    ham_cut = min(
        n_planes,
        int(np.ceil(
            n_planes * p_mis + 6.0 * np.sqrt(n_planes * p_mis * (1.0 - p_mis))
        )),
    )
    sig_words = (n_planes + 63) // 64

    class SignBander:
        """Actor-pool stage: the hyperplane matrix is drawn ONCE per actor
        in ``__init__`` (deterministic seed — every actor draws the same
        planes), then each batch is one matmul + bit-pack. Emits
        (band_id, band_hash, vid, sig) — sig is the packed full-plane
        sketch (n_planes/8 bytes), NOT the vector."""

        def __init__(self):
            self.planes: np.ndarray | None = None

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch["vid"].to_numpy(zero_copy_only=False)
            m = _decode(batch["nvec"])
            if self.planes is None:
                rng = np.random.default_rng(seed)
                self.planes = rng.standard_normal((m.shape[1], n_planes))
            bits = (m @ self.planes) >= 0.0  # (n, n_planes) sign bits
            packed = np.packbits(bits, axis=1)
            pad = sig_words * 8 - packed.shape[1]
            if pad:
                packed = np.pad(packed, ((0, 0), (0, pad)))
            sig = pa.array([row.tobytes() for row in packed], pa.binary())
            out_band, out_hash, out_id = [], [], []
            for b in range(bands):
                seg = bits[:, b * r_bits : (b + 1) * r_bits]
                h = np.zeros(len(ids), dtype=np.int64)
                for j in range(seg.shape[1]):
                    h = (h << 1) | seg[:, j].astype(np.int64)
                out_band.append(np.full(len(ids), b, dtype=np.int64))
                out_hash.append(h)
                out_id.append(ids)
            n = len(ids)
            return pa.table(
                {
                    "band_id": np.concatenate(out_band),
                    "band_hash": np.concatenate(out_hash),
                    "vid": np.concatenate(out_id),
                    "sig": pa.concat_arrays([sig] * bands) if n else sig,
                }
            )

    buckets = nvecs.map_batches(
        SignBander, batch_format="pyarrow", concurrency=(1, 8)
    )

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"id_a": np.array([], dtype=np.int64),
                              "id_b": np.array([], dtype=np.int64)})
        m = len(g)
        if m < 2:
            return empty
        order = np.argsort(g["vid"].to_numpy())
        ids = g["vid"].to_numpy()[order]
        sig = np.frombuffer(
            b"".join(g["sig"].to_numpy()[order]), dtype=np.uint64
        ).reshape(m, sig_words)
        # row-at-a-time pair generation: peak memory is O(m·words) — a
        # hot bucket never allocates the O(m²) triu index arrays (which
        # at m=50k would be ~20 GB before any filtering could run); the
        # per-row numpy dispatch is negligible against the O(m²) XOR work
        out_a, out_b = [], []
        for i in range(m - 1):
            x = sig[i] ^ sig[i + 1 :]
            if hasattr(np, "bitwise_count"):
                h = np.bitwise_count(x).sum(axis=1).astype(np.int64)
            else:
                h = (
                    np.unpackbits(
                        np.ascontiguousarray(x).view(np.uint8), axis=1
                    ).sum(axis=1).astype(np.int64)
                )
            keep = h <= ham_cut
            k = int(keep.sum())
            if k:
                out_a.append(np.full(k, ids[i], dtype=np.int64))
                out_b.append(ids[i + 1 :][keep])
        if not out_a:
            return empty
        return pd.DataFrame({"id_a": np.concatenate(out_a),
                             "id_b": np.concatenate(out_b)})

    cand = _collision_groups(buckets, ("band_id", "band_hash"), bucket_pairs)
    # a true pair collides in many bands: dedup distributed, THEN attach
    # each side's vector exactly once through the bucketed join
    cand = _dedup_pairs(cand)

    from open_finance_lakehouse_ray.pipelines.join import join as ds_join

    jstrategy = "shuffle" if _force_scale() else "auto"
    cand = ds_join(cand, nvecs, on="id_a", right_on="vid",
                   right_columns=["nvec"], strategy=jstrategy)
    cand = cand.map_batches(
        lambda t: t.rename_columns(
            ["nvec_a" if c == "nvec" else c for c in t.column_names]
        ),
        batch_format="pyarrow",
    )
    cand = ds_join(cand, nvecs, on="id_b", right_on="vid",
                   right_columns=["nvec"], strategy=jstrategy)

    def verify(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"id_a": pa.array([], pa.int64()),
                             "id_b": pa.array([], pa.int64()),
                             "cosine": pa.array([], pa.float64())})
        a = _decode(batch["nvec_a"])
        b = _decode(batch["nvec"])
        cos = np.einsum("ij,ij->i", a, b)
        keep = cos >= threshold
        return pa.table(
            {
                "id_a": batch["id_a"].to_numpy(zero_copy_only=False)[keep],
                "id_b": batch["id_b"].to_numpy(zero_copy_only=False)[keep],
                "cosine": cos[keep],
            }
        )

    out = cand.map_batches(verify, batch_format="pyarrow").to_pandas()
    if "id_a" not in out.columns or len(out) == 0:
        return pa.table({"id_a": pa.array([], pa.int64()),
                         "id_b": pa.array([], pa.int64()),
                         "cosine": pa.array([], pa.float64())})
    out = out.sort_values(["id_a", "id_b"]).astype(
        {"id_a": "int64", "id_b": "int64"}
    )
    return pa.Table.from_pandas(out.reset_index(drop=True), preserve_index=False)


def _embedding_near_dup_brute(
    emb: rd.Dataset, *, id_col: str, vec_col: str, threshold: float
) -> pa.Table:
    """All-pairs baseline: corpus normalized into ONE object-store copy
    (prepared by a task, not the driver), every batch matmuls against it."""
    mat_ds = emb.select_columns([id_col, vec_col]).materialize()

    @ray.remote
    def prep(refs):
        tables = [t for t in ray.get(list(refs)) if t.num_rows]
        t = pa.concat_tables(tables)
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        m = np.stack(t[vec_col].to_pandas().to_numpy()).astype(np.float64)
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        return ids, m

    m_ref = prep.remote(mat_ds.to_arrow_refs())

    def stage(batch: pa.Table) -> pa.Table:
        all_ids, mat = ray.get(m_ref)
        bids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        bv = np.stack(batch[vec_col].to_pandas().to_numpy()).astype(np.float64)
        bv = bv / np.maximum(np.linalg.norm(bv, axis=1, keepdims=True), 1e-12)
        sims = bv @ mat.T
        rr, cc = np.where(sims >= threshold)
        keep = bids[rr] < all_ids[cc]
        return pa.table(
            {"id_a": bids[rr[keep]], "id_b": all_ids[cc[keep]],
             "cosine": sims[rr[keep], cc[keep]]}
        )

    out = mat_ds.map_batches(stage, batch_format="pyarrow").to_pandas()
    if "id_a" not in out.columns or len(out) == 0:
        return pa.table({"id_a": pa.array([], pa.int64()),
                         "id_b": pa.array([], pa.int64()),
                         "cosine": pa.array([], pa.float64())})
    out = out.sort_values(["id_a", "id_b"])
    return pa.Table.from_pandas(out.reset_index(drop=True), preserve_index=False)


# ------------------------------------------------- dedup clusters

DRIVER_UNION_FIND_MAX_EDGES = 50_000_000


def dedup_clusters(
    pairs: pa.Table | rd.Dataset,
    *,
    max_driver_edges: int = DRIVER_UNION_FIND_MAX_EDGES,
) -> pa.Table:
    """Connected components over near-dup pairs → (doc_id, canonical_id)
    with canonical = the component's min id — the final step of a
    training-data dedup: every document in a cluster maps to one keeper.

    Two execution paths, size-guarded like the rest of the dedup family:
    union-find on the driver for pair sets up to ``max_driver_edges``
    (the pair set is output-scale — the near-dup graph, not the corpus —
    so this covers all but pathological thresholds), and DISTRIBUTED
    iterated min-label propagation above the guard (or under
    ``OFLR_FORCE_SCALE_PATHS=1``): seed label=doc_id, repeat
    ``join(edges, labels) → groupby(node).min(label)`` to fixpoint —
    O(component diameter) rounds of bounded hash-partition shuffles, no
    driver state beyond the per-round converged flag
    (:func:`_dedup_clusters_distributed`).

    ``pairs`` may be a ``rd.Dataset`` — the TRUE scale path: a
    beyond-guard edge set routes to the distributed propagation straight
    from its object-store blocks without ever concatenating on the driver
    (a ``pa.Table`` argument has by definition already been
    driver-materialized by the caller; the guard then only bounds what we
    re-ship).
    """
    if isinstance(pairs, rd.Dataset):
        mat = pairs.materialize()
        if _force_scale() or mat.count() > max_driver_edges:
            return _dedup_clusters_distributed(mat)
        tabs = [t for t in ray.get(mat.to_arrow_refs()) if t.num_rows]
        pairs = (
            pa.concat_tables(tabs) if tabs
            else pa.table({"id_a": pa.array([], pa.int64()),
                           "id_b": pa.array([], pa.int64())})
        )
    elif _force_scale() or pairs.num_rows > max_driver_edges:
        return _dedup_clusters_distributed(rd.from_arrow(pairs))
    ia = pairs["id_a"].to_pylist()
    ib = pairs["id_b"].to_pylist()
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent.setdefault(r, r) != r:
            r = parent[r]
        while parent[x] != r:  # path compression
            parent[x], x = r, parent[x]
        return r

    for a, b in zip(ia, ib):
        ra, rb = find(a), find(b)
        if ra != rb:
            # union by MIN id so the root IS the canonical id
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo

    nodes = sorted(parent)
    return pa.table(
        {
            "doc_id": pa.array(nodes, pa.int64()),
            "canonical_id": pa.array([find(n) for n in nodes], pa.int64()),
        }
    )


def _cc_hash(a: np.ndarray, num_partitions: int) -> np.ndarray:
    """Stable partition id for node/label values (same splitmix64 family
    as ``_pk_tagger`` — deterministic across processes)."""
    from open_finance_lakehouse_ray.functions.hashing import splitmix64

    h = splitmix64(a.astype(np.int64).view(np.uint64))
    return (h % np.uint64(num_partitions)).astype(np.int64)


def _dedup_clusters_distributed(
    pairs: rd.Dataset,
    *,
    num_partitions: int = 32,
    max_rounds: int = 64,
) -> pa.Table:
    """Distributed connected components: iterated min-label propagation
    with pointer doubling, as an EXPLICIT task-based hash exchange.

    Why raw Ray tasks (the brief's last-resort clause): the fixpoint loop
    re-shuffles a small, shrinking label table dozens of times; driving
    each round through ``Dataset.groupby``/``join`` was measured at
    minutes per round on thousand-edge graphs (plan/stats re-planning
    dominates — see docs/PERF.md). Here each round is 5×P tiny tasks over
    pinned object-store partitions; the exchange is the same bounded hash
    shuffle discipline, hand-rolled.

    Topology (all tables partitioned by ``splitmix64(key) % P``):

    - ``edges[p]``   — symmetric (node, nbr) rows with hash(nbr) == p,
                       built once from the pair Dataset's blocks;
    - ``labels[q]``  — (node, label) with hash(node) == q, seeded
                       label = node.

    Per round: (1) hop — task p joins edges[p] with labels[p] on nbr and
    scatters (node, nbr_label) candidates by hash(node); (2) min — task q
    folds candidates into labels[q]; (3) doubling — labels chase their
    label's label through one more request/answer exchange, collapsing
    chains in O(log diameter) rounds. Labels are monotone non-increasing
    and bounded below by the component min, so the fixpoint (per-round
    label sum unchanged) is exact; only P scalar sums reach the driver.
    """
    P = num_partitions
    empty_pair = pa.table({"node": pa.array([], pa.int64()),
                           "label": pa.array([], pa.int64())})

    def _split(df: pd.DataFrame, key: str) -> tuple:
        if not len(df):
            return tuple(
                pa.Table.from_pandas(df, preserve_index=False) for _ in range(P)
            )
        h = _cc_hash(df[key].to_numpy(), P)
        return tuple(
            pa.Table.from_pandas(df[h == p], preserve_index=False)
            for p in range(P)
        )

    @ray.remote
    def split_block(t: pa.Table):
        """One input block → P edge splits (by hash(nbr)) + P node splits
        (by hash(node), for seeding)."""
        a = t["id_a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t["id_b"].to_numpy(zero_copy_only=False).astype(np.int64)
        df = pd.DataFrame({"node": np.concatenate([a, b]),
                           "nbr": np.concatenate([b, a])})
        return _split(df, "nbr") + _split(df, "node")

    @ray.remote
    def seed_task(*node_parts):
        parts = [t for t in node_parts if t.num_rows]
        if not parts:
            return empty_pair
        u = np.unique(pa.concat_tables(parts)["node"].to_numpy(zero_copy_only=False))
        return pa.table({"node": pa.array(u, pa.int64()),
                         "label": pa.array(u, pa.int64())})

    @ray.remote
    def concat_task(*parts):
        live = [t for t in parts if t.num_rows]
        return pa.concat_tables(live) if live else parts[0]

    @ray.remote
    def hop_map(label_t: pa.Table, edges_t: pa.Table):
        """Join this partition's edges (hash(nbr)==p) with its labels
        (hash(node)==p): every nbr's label is local. Scatter candidates."""
        if not edges_t.num_rows or not label_t.num_rows:
            return tuple(empty_pair for _ in range(P))
        e = edges_t.to_pandas()
        l = label_t.to_pandas()
        m = e.merge(l, left_on="nbr", right_on="node", suffixes=("", "_l"))
        return _split(m[["node", "label"]], "node")

    @ray.remote
    def min_fold(label_t: pa.Table, *cands):
        frames = [label_t.to_pandas()] + [
            c.to_pandas() for c in cands if c.num_rows
        ]
        df = pd.concat(frames, ignore_index=True)
        out = df.groupby("node", sort=False)["label"].min().reset_index()
        return pa.Table.from_pandas(out, preserve_index=False)

    @ray.remote
    def jump_request(label_t: pa.Table):
        """Scatter (node, label) rows by hash(label) to ask the label's
        own partition for label(label)."""
        return _split(label_t.to_pandas(), "label")

    @ray.remote
    def jump_answer(label_t: pa.Table, *reqs):
        live = [r.to_pandas() for r in reqs if r.num_rows]
        if not live or not label_t.num_rows:
            return tuple(empty_pair for _ in range(P))
        rq = pd.concat(live, ignore_index=True)
        l = label_t.to_pandas()
        m = rq.merge(l, left_on="label", right_on="node", suffixes=("", "_t"))
        ans = m[["node", "label_t"]].rename(columns={"label_t": "label"})
        return _split(ans, "node")

    @ray.remote(num_returns=2)
    def jump_min(label_t: pa.Table, *answers):
        frames = [label_t.to_pandas()] + [
            a.to_pandas() for a in answers if a.num_rows
        ]
        df = pd.concat(frames, ignore_index=True)
        out = df.groupby("node", sort=False)["label"].min().reset_index()
        return (
            pa.Table.from_pandas(out, preserve_index=False),
            int(out["label"].sum()),
        )

    blocks = pairs.materialize().to_arrow_refs()
    if not blocks:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "canonical_id": pa.array([], pa.int64())})
    splits = [
        split_block.options(num_returns=2 * P).remote(b) for b in blocks
    ]
    edges = [
        concat_task.remote(*[s[p] for s in splits]) for p in range(P)
    ]
    labels = [
        seed_task.remote(*[s[P + q] for s in splits]) for q in range(P)
    ]

    prev = None
    for _ in range(max_rounds):
        cand = [
            hop_map.options(num_returns=P).remote(labels[p], edges[p])
            for p in range(P)
        ]
        labels = [
            min_fold.remote(labels[q], *[cand[p][q] for p in range(P)])
            for q in range(P)
        ]
        reqs = [
            jump_request.options(num_returns=P).remote(labels[q])
            for q in range(P)
        ]
        answers = [
            jump_answer.options(num_returns=P).remote(
                labels[r], *[reqs[q][r] for q in range(P)]
            )
            for r in range(P)
        ]
        outs = [
            jump_min.remote(labels[q], *[answers[r][q] for r in range(P)])
            for q in range(P)
        ]
        labels = [o[0] for o in outs]
        total = sum(ray.get([o[1] for o in outs]))
        if total == prev:
            break
        prev = total
    else:
        raise RuntimeError(
            f"label propagation did not converge in {max_rounds} rounds"
        )

    parts = [t for t in ray.get(labels) if t.num_rows]
    if not parts:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "canonical_id": pa.array([], pa.int64())})
    out = (
        pa.concat_tables(parts)
        .rename_columns(["doc_id", "canonical_id"])
        .sort_by("doc_id")
    )
    return out.combine_chunks()


def decontaminate(
    train: rd.Dataset,
    eval_ds: rd.Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 3,
    num_partitions: int = NUM_SHUFFLE_PARTITIONS,
) -> pa.Table:
    """Exact n-gram decontamination — flag every TRAIN document sharing at
    least one k-word shingle with ANY eval document (the benchmark-overlap
    scrub every open LLM pipeline runs before pretraining; e.g. the
    13-gram overlap checks of GPT-3/The Pile, public literature).
    Recall 1.0 by construction — a genuinely contaminated document can
    never be missed. The match key is the 64-bit shingle hash, so a hash
    collision can only ADD a false flag (birthday bound ~n^2/2^65 over
    distinct shingles — negligible at gate scale, where the DuckDB
    string-join oracle confirms exact equality, and a conservative
    over-flag at corpus scales where it isn't).

    Distributed shape: both sides emit (shingle_hash, doc_id, is_eval)
    rows — the same vectorized shingling as the MinHash family — then ONE
    bounded hash-partition shuffle on the shingle key; inside each
    partition a vectorized ``transform("max")`` marks shingle groups
    containing an eval row and collects their train doc ids; a second
    bounded shuffle dedups doc ids across partitions. No driver-side set,
    no broadcast of the eval corpus.

    Returns (doc_id,) of contaminated train documents, sorted.
    """

    def rows(is_eval: int):
        def f(batch: pa.Table) -> pa.Table:
            ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
            hashes = _shingle_hashes(batch[text_col].to_pylist(), k=shingle_k)
            out_h, out_id = [], []
            for i, h in enumerate(hashes):
                if len(h):
                    out_h.append(h.view(np.int64))
                    out_id.append(np.full(len(h), ids[i], dtype=np.int64))
            if not out_h:
                return pa.table(
                    {"shingle": pa.array([], pa.int64()),
                     "doc_id": pa.array([], pa.int64()),
                     "is_eval": pa.array([], pa.int64())}
                )
            hh = np.concatenate(out_h)
            return pa.table(
                {"shingle": hh,
                 "doc_id": np.concatenate(out_id),
                 "is_eval": np.full(len(hh), is_eval, dtype=np.int64)}
            )

        return f

    unioned = train.map_batches(rows(0), batch_format="pyarrow").union(
        eval_ds.map_batches(rows(1), batch_format="pyarrow")
    )
    tagged = unioned.map_batches(
        _pk_tagger(("shingle",), num_partitions), batch_format="pyarrow"
    )

    def hits(g: pd.DataFrame) -> pd.DataFrame:
        # vectorized: mark shingle groups containing any eval row, keep
        # the train doc ids in them (no Python loop over shingle groups)
        flag = g.groupby("shingle", sort=False)["is_eval"].transform("max")
        c = g[(flag == 1) & (g["is_eval"] == 0)]
        return c[["doc_id"]].drop_duplicates()

    ids = tagged.groupby("_pk").map_groups(hits, batch_format="pandas")

    def dd(df: pd.DataFrame) -> pd.DataFrame:
        return df[["doc_id"]].drop_duplicates()

    out = (
        ids.map_batches(_pk_tagger(("doc_id",), num_partitions),
                        batch_format="pyarrow")
        .groupby("_pk")
        .map_groups(dd, batch_format="pandas")
        .to_pandas()
    )
    if "doc_id" not in out.columns or len(out) == 0:
        return pa.table({"doc_id": pa.array([], pa.int64())})
    out = out.sort_values("doc_id").astype({"doc_id": "int64"})
    return pa.Table.from_pandas(out.reset_index(drop=True), preserve_index=False)


def _marked_positions(
    docs: rd.Dataset,
    *,
    k: int,
    id_col: str,
    text_col: str,
    num_partitions: int,
) -> rd.Dataset:
    """Stage 1 of the span-level exact-substring family (shared by
    :func:`dup_spans` and :func:`span_scrub`): the (doc_id, pos) rows of
    every k-gram START whose gram occurs in >= 2 distinct documents.
    One bounded hash-partition shuffle on the 64-bit gram hash; only
    fixed-width int64 rows move. See :func:`dup_spans` for the method."""

    empty = pa.table(
        {
            "gram": pa.array([], pa.int64()),
            "doc_id": pa.array([], pa.int64()),
            "pos": pa.array([], pa.int64()),
        }
    )

    def gram_rows(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        texts = batch[text_col].to_pylist()
        all_tokens: list[str] = []
        out_id, out_pos, starts = [], [], []
        tok_off = 0
        for i, t in enumerate(texts):
            w = t.split(" ")
            all_tokens.extend(w)
            n = len(w) - k + 1
            if n > 0:
                # valid window starts within this doc's flat-token segment
                starts.append(np.arange(tok_off, tok_off + n, dtype=np.int64))
                out_id.append(np.full(n, ids[i], dtype=np.int64))
                out_pos.append(np.arange(1, n + 1, dtype=np.int64))
            tok_off += len(w)
        if not starts:
            return empty
        # one hash per TOKEN (O(text) memory), then a k-step polynomial
        # shift-combine gives every window's gram hash in k vector ops —
        # identical token runs yield identical gram hashes by construction
        th = pd.util.hash_array(np.asarray(all_tokens, dtype=object))
        g = np.zeros(len(th) - k + 1, dtype=np.uint64)
        mult = np.uint64(1099511628211)  # FNV prime, uint64 wraparound
        for r in range(k):
            g = g * mult + th[r : r + len(g)]
        valid = np.concatenate(starts)
        return pa.table(
            {
                "gram": g[valid].view(np.int64),
                "doc_id": np.concatenate(out_id),
                "pos": np.concatenate(out_pos),
            }
        )

    tagged = docs.map_batches(gram_rows, batch_format="pyarrow").map_batches(
        _pk_tagger(("gram",), num_partitions), batch_format="pyarrow"
    )

    def shared_positions(g: pd.DataFrame) -> pd.DataFrame:
        # vectorized over the whole partition: a position survives iff its
        # gram group spans >= 2 distinct documents
        nun = g.groupby("gram", sort=False)["doc_id"].transform("nunique")
        return g.loc[nun >= 2, ["doc_id", "pos"]]

    return tagged.groupby("_pk").map_groups(
        shared_positions, batch_format="pandas"
    )


def dup_spans(
    docs: rd.Dataset,
    *,
    k: int = 15,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_partitions: int = NUM_SHUFFLE_PARTITIONS,
) -> pa.Table:
    """Exact duplicated-SUBSTRING spans: maximal token runs in which every
    position lies inside some >= ``k``-token run shared verbatim with at
    least one other document. (A merged span whose halves match DIFFERENT
    partner documents need not appear verbatim in any single partner —
    the chimera case; the SQL oracle merges identically.)

    This is the span-level member of the dedup family (the public
    suffix-array "exact substring" method of Lee et al. 2022,
    *Deduplicating Training Data Makes Language Models Better*): document-
    level dedup keeps a doc that merely EMBEDS a big copied block, span
    detection finds the block itself so a pipeline can cut or down-weight
    it. A suffix array is inherently single-machine; the distributed
    equivalent used here is positional k-gram matching — a token position
    lies inside a duplicated span of length >= k iff some k-gram starting
    within the last k-1 positions is shared with another document, so
    merging consecutive duplicated k-gram starts reconstructs exactly the
    maximal duplicated spans.

    Tokenization is the `_shingle_hashes` contract (literal single-space
    split, the SQL oracle's ``string_split(text, ' ')``). The shuffle key
    is a 64-bit gram hash — each token hashed ONCE, then a k-step
    polynomial shift-combine over the flat hash array, so map-stage memory
    stays O(text bytes) and no gram string is ever materialized. A
    collision can only ADD a marked position (same conservative bound as
    :func:`decontaminate`); only fixed-width int64 rows move.

    Distributed shape: map (positional gram hash rows, one row per token
    position — O(corpus tokens) rows, the cost every published k-gram
    method pays) → ONE bounded hash-partition shuffle on the gram key
    (vectorized ``transform("nunique")`` keeps positions whose gram occurs
    in >= 2 docs) → second bounded shuffle on doc id merges consecutive
    positions into maximal spans (vectorized cumcount islands). Returns
    (doc_id, span_start, span_len) — span_start is the 1-based token
    index, span_len in tokens — sorted.
    """

    marked = _marked_positions(
        docs, k=k, id_col=id_col, text_col=text_col,
        num_partitions=num_partitions,
    )

    def merge_spans(df: pd.DataFrame) -> pd.DataFrame:
        # each (doc_id, pos) exists exactly once globally (one gram per
        # position, one partition per gram), so no dedup pass is needed
        df = df.sort_values(["doc_id", "pos"], kind="mergesort")
        island = (
            df["pos"] - df.groupby("doc_id", sort=False).cumcount()
        ).rename("island")
        agg = (
            df.groupby([df["doc_id"], island], sort=False)["pos"]
            .agg(["min", "count"])
            .reset_index()
        )
        return pd.DataFrame(
            {
                "doc_id": agg["doc_id"].astype("int64"),
                "span_start": agg["min"].astype("int64"),
                "span_len": (agg["count"] + k - 1).astype("int64"),
            }
        )

    out = (
        marked.map_batches(
            _pk_tagger(("doc_id",), num_partitions), batch_format="pyarrow"
        )
        .groupby("_pk")
        .map_groups(
            lambda df: merge_spans(df.drop(columns=["_pk"])),
            batch_format="pandas",
        )
        .to_pandas()
    )
    if len(out) == 0:
        return pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "span_start": pa.array([], pa.int64()),
                "span_len": pa.array([], pa.int64()),
            }
        )
    out = out.sort_values(["doc_id", "span_start"]).astype(
        {"doc_id": "int64", "span_start": "int64", "span_len": "int64"}
    )
    return pa.Table.from_pandas(out.reset_index(drop=True), preserve_index=False)


def span_scrub(
    docs: rd.Dataset,
    *,
    k: int = 15,
    min_span: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_partitions: int = NUM_SHUFFLE_PARTITIONS,
) -> rd.Dataset:
    """Span-CUT corpus rewrite — the removal step of the exact-substring
    dedup method (Lee et al. 2022 remove the duplicated spans themselves,
    not whole documents): every token covered by a detected duplicated
    span of length >= ``min_span`` (default ``k``, i.e. everything
    :func:`dup_spans` reports) is cut, and the corpus re-emits as
    (doc_id, text_scrubbed, n_removed). Documents shorter than ``k``
    tokens or with no qualifying span pass through verbatim with
    ``n_removed = 0``.

    Span semantics are exactly :func:`dup_spans`'s (same ``k``-gram
    islands, same chimera-merge behavior, mirrored by the SQL oracle);
    spans from DIFFERENT islands may overlap as token ranges (two marked
    starts separated by one unmarked position), so coverage is the UNION
    of the qualifying spans' ranges — a vectorized difference-array
    accumulation per document, never a per-token loop.

    Distributed shape: the stage-1 marked positions (ONE bounded int64
    shuffle on the gram hash) union with the docs themselves under a
    shared (doc_id, text, pos) schema — doc rows carry ``pos = -1`` —
    then ONE bounded hash-partition shuffle on doc_id co-locates each
    document with its marked starts and the cut happens vectorized inside
    the partition. Text bytes move through exactly one exchange, the
    minimum for a keyed rewrite; returns a streaming Dataset (write it
    with ``write_parquet`` at scale).
    """
    cut_below = int(min_span if min_span is not None else k)

    marked = _marked_positions(
        docs, k=k, id_col=id_col, text_col=text_col,
        num_partitions=num_partitions,
    )

    def as_doc_rows(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch[id_col].cast(pa.int64()),
                "text": batch[text_col].cast(pa.large_string()),
                "pos": pa.nulls(batch.num_rows, pa.int64()).fill_null(-1),
            }
        )

    def as_pos_rows(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch["doc_id"].cast(pa.int64()),
                "text": pa.nulls(batch.num_rows, pa.large_string()).fill_null(""),
                "pos": batch["pos"].cast(pa.int64()),
            }
        )

    unioned = docs.map_batches(as_doc_rows, batch_format="pyarrow").union(
        marked.map_batches(as_pos_rows, batch_format="pyarrow")
    )

    def cut(df: pd.DataFrame) -> pd.DataFrame:
        doc_rows = df[df["pos"] < 0]
        starts_by_doc = {
            did: grp["pos"].to_numpy()
            for did, grp in df[df["pos"] >= 0].groupby("doc_id", sort=False)
        }
        out_id, out_text, out_removed = [], [], []
        for did, text in zip(doc_rows["doc_id"], doc_rows["text"]):
            toks = text.split(" ")
            starts = starts_by_doc.get(did)
            removed = 0
            if starts is not None and len(starts):
                starts = np.sort(starts)
                # maximal islands of consecutive marked starts (the
                # dup_spans span reconstruction), vectorized
                island = starts - np.arange(len(starts), dtype=starts.dtype)
                _, first_idx, counts = np.unique(
                    island, return_index=True, return_counts=True
                )
                span_start = starts[first_idx]  # 1-based token index
                span_len = counts + k - 1
                keep = span_len >= cut_below
                if keep.any():
                    # union of covered ranges via a difference array —
                    # add.at handles overlapping spans from distinct islands
                    diff = np.zeros(len(toks) + 1, dtype=np.int64)
                    np.add.at(diff, span_start[keep] - 1, 1)
                    np.add.at(diff, span_start[keep] - 1 + span_len[keep], -1)
                    covered = np.cumsum(diff[:-1]) > 0
                    removed = int(covered.sum())
                    if removed:
                        arr = np.asarray(toks, dtype=object)
                        toks = arr[~covered].tolist()
            out_id.append(did)
            out_text.append(" ".join(toks))
            out_removed.append(removed)
        return pd.DataFrame(
            {
                "doc_id": pd.array(out_id, dtype="int64"),
                "text_scrubbed": pd.array(out_text, dtype="object"),
                "n_removed": pd.array(out_removed, dtype="int64"),
            }
        )

    return (
        unioned.map_batches(
            _pk_tagger(("doc_id",), num_partitions), batch_format="pyarrow"
        )
        .groupby("_pk")
        .map_groups(
            lambda df: cut(df.drop(columns=["_pk"])),
            batch_format="pandas",
        )
    )


# --------------------------------------------------------------------------
# incremental dedup against a persisted corpus identity index
# --------------------------------------------------------------------------

INDEX_BUCKETS = 64


def _md5_identity(t: pa.Table, key_col: str, num_buckets: int) -> pa.Table:
    """Append the md5 identity (``h16``, binary16) of ``key_col`` and its
    hash bucket (``_bucket``, first 8 digest bytes mod ``num_buckets`` —
    md5 is uniform, so buckets are skew-free by construction).

    md5 has no vectorized Arrow kernel; the loop calls C ``hashlib`` per
    value while the per-byte work (the real cost for document-length
    strings) stays in C — the same tradeoff :func:`hash64_strings`
    documents, without the dictionary encode (dedup inputs are
    mostly-unique long texts). md5 (not the 64-bit content hash) is the
    index identity because a persisted corpus index must not shrink the
    key space: at 100 TB (~10^11 docs) 64-bit collisions are expected
    (birthday bound ~2^32 docs) and each one silently DROPS a novel
    document; 128 bits keeps the index at 16 B/doc with collision odds
    ~2^-64 per pair. DuckDB's ``md5()`` mirrors it exactly for the oracle.
    """
    import hashlib

    import pyarrow.compute as pc

    arr = t[key_col]
    if not pa.types.is_string(arr.type):
        arr = pc.cast(arr, pa.string())
    vals = pc.fill_null(arr, "").to_pylist()
    digs = [hashlib.md5(v.encode("utf-8")).digest() for v in vals]
    bucket = np.fromiter(
        (int.from_bytes(d[:8], "big") % num_buckets for d in digs),
        dtype=np.int64,
        count=len(digs),
    )
    return t.append_column("h16", pa.array(digs, type=pa.binary(16))).append_column(
        "_bucket", pa.array(bucket)
    )


def _bucket_delta_path(index_dir: str, bucket: int, shard: str) -> str:
    return os.path.join(index_dir, f"bucket={bucket:04d}", f"{shard}.parquet")


def _write_bucket_delta(index_dir: str, bucket: int, shard: str, h16: "pd.Series") -> None:
    """Atomically publish one bucket's digest delta. The file name is
    DETERMINISTIC in (shard, bucket): a killed-and-resumed run overwrites
    its own partial file instead of double-counting (same
    tmp-write-then-rename pattern as state/txlog's manifest publish)."""
    slow = os.environ.get("OFLR_INDEX_DELTA_SLEEP_S")
    if slow:  # harness seam (index-kill-resume): stretch the window
        # between bucket publishes so a SIGKILL provably lands mid-screen
        import time

        time.sleep(float(slow))
    _atomic_write_parquet(
        _bucket_delta_path(index_dir, bucket, shard),
        pa.table({"h16": pa.array(list(h16), type=pa.binary(16))}),
    )


def _index_meta(index_dir: str, meta: dict) -> None:
    """Persist the index's layout parameters (`_meta.json`) at build and
    enforce them on every later build into the same dir. The bucket count
    (and for the band index num_perm/bands/shingle_k) is as load-bearing
    as the vector index's centroids: a lookup or extension run with a
    different value computes different bucket/band keys, misses every
    stored row, and historical duplicates silently survive as novels."""
    import json

    path = os.path.join(index_dir, "_meta.json")
    if os.path.exists(path):
        import warnings

        with open(path) as fh:
            prior = json.load(fh)
        p_layout, p_cols = _split_meta(prior)
        m_layout, m_cols = _split_meta(meta)
        if p_layout != m_layout:
            raise ValueError(
                f"index at {index_dir!r} was built with {p_layout}; "
                f"this call uses {m_layout} — pass the original "
                "parameters or build a new index dir"
            )
        if p_cols != m_cols:
            warnings.warn(
                f"index at {index_dir!r} was built from columns "
                f"{p_cols}; this build reads {m_cols} — fine for a "
                "renamed view of the same content, silent key-space "
                "divergence otherwise",
                stacklevel=3,
            )
        return
    if any(d.startswith("bucket=") for d in os.listdir(index_dir)):
        # bucket dirs but no meta: a pre-contract (or foreign) index —
        # ADOPTING this call's parameters would re-enable the silent
        # false-novel failure the contract exists to prevent (the
        # existing rows may be keyed under a different layout)
        raise ValueError(
            f"{index_dir!r} has bucket data but no _meta.json — rebuild "
            "it into a fresh dir (or write _meta.json by hand if the "
            "original layout parameters are known)"
        )
    tmp = f"{path}.tmp-{os.getpid()}"
    with open(tmp, "w") as fh:
        json.dump(meta, fh)
    os.replace(tmp, path)


# meta keys that name source COLUMNS rather than defining the key layout:
# a mismatch is surfaced loudly but not fatal — the stored rows are
# schema-normalized, so a renamed view of the same content is a valid
# lookup, while a genuinely wrong column silently misses every stored row
# (two review passes pulled in opposite directions here; warn-not-raise
# serves both).
_META_COLUMN_KEYS = ("key_col", "id_col", "text_col", "vec_col")


def _split_meta(meta: dict) -> tuple[dict, dict]:
    layout = {k: v for k, v in meta.items() if k not in _META_COLUMN_KEYS}
    cols = {k: v for k, v in meta.items() if k in _META_COLUMN_KEYS}
    return layout, cols


def _check_index_meta(index_dir: str, expect: dict) -> None:
    """Lookup-side twin of :func:`_index_meta`: LAYOUT parameters
    (family, bucket count, band geometry) must match the persisted
    contract exactly — a mismatch means every stored row silently misses.
    Column NAMES are compared too but only warn (see _META_COLUMN_KEYS).
    A missing `_meta.json` means the dir is not one of these indexes."""
    import json
    import warnings

    path = os.path.join(index_dir, "_meta.json")
    if not os.path.exists(path):
        raise ValueError(
            f"{index_dir!r} has no _meta.json — not an index built by "
            "build_hash_index/build_band_index/build_vector_index"
        )
    with open(path) as fh:
        prior = json.load(fh)
    p_layout, p_cols = _split_meta(prior)
    e_layout, e_cols = _split_meta(expect)
    if p_layout != e_layout:
        raise ValueError(
            f"index at {index_dir!r} was built with {p_layout}; this "
            f"lookup uses {e_layout} — bucket/band keys would not match "
            "and every stored row would silently miss"
        )
    if p_cols != e_cols:
        warnings.warn(
            f"index at {index_dir!r} was built from columns {p_cols}; "
            f"this lookup reads {e_cols} — fine for a renamed view of "
            "the same content, a silent full miss otherwise",
            stacklevel=3,
        )


def mark_shard_complete(index_dir: str, shard: str) -> None:
    """Record that ``shard``'s screen/build has fully consumed its
    results — the gate :func:`compact_index` requires before folding that
    shard's deltas into a generation file. Folding an IN-FLIGHT shard's
    partial deltas would break its same-tag resume: the own-delta
    exclusion matches the exact ``<shard>.parquet`` name, so digests
    moved into a generation file read as history and the retry drops its
    own rows as duplicates. The builders mark their shard themselves
    (they are eager); after consuming :func:`incremental_dedup`'s lazy
    result, the CALLER marks the shard (the CLI ``index --action screen``
    does)."""
    d = os.path.join(index_dir, "_shards")
    os.makedirs(d, exist_ok=True)
    tmp = os.path.join(d, f".{shard}.tmp-{os.getpid()}")
    with open(tmp, "w") as fh:
        fh.write("done")
    os.replace(tmp, os.path.join(d, f"{shard}.done"))


def _completed_shards(index_dir: str) -> set[str]:
    d = os.path.join(index_dir, "_shards")
    if not os.path.isdir(d):
        return set()
    return {f[: -len(".done")] for f in os.listdir(d) if f.endswith(".done")}


def _read_bucket_tables(
    bucket_dir: str, *, exclude: str | None = None, columns=None
) -> list:
    """List-and-read one bucket's parquet files with a re-list retry.
    :func:`compact_index` unlinks delta files only AFTER publishing their
    merged generation file, so a FileNotFoundError here means THIS task's
    listing went stale mid-read — re-listing sees the generation file (a
    superset of the vanished deltas) and the set semantics of every
    lookup make the duplicate rows harmless."""
    import pyarrow.parquet as pq

    for _ in range(5):
        if not os.path.isdir(bucket_dir):
            return []
        files = sorted(
            f
            for f in os.listdir(bucket_dir)
            if f.endswith(".parquet") and f != exclude
        )
        try:
            return [
                pq.read_table(os.path.join(bucket_dir, f), columns=columns)
                for f in files
            ]
        except FileNotFoundError:
            continue
    raise RuntimeError(
        f"bucket {bucket_dir!r} kept changing under the reader after 5 "
        "re-lists — is something other than compact_index mutating it?"
    )


def build_hash_index(
    docs: rd.Dataset,
    index_dir: str,
    *,
    key_col: str = "text",
    num_buckets: int = INDEX_BUCKETS,
    shard: str = "base",
) -> int:
    """Persist the md5 identity index of a corpus, hash-partitioned into
    ``num_buckets`` directories (``bucket=NNNN/<shard>.parquet``), and
    return the number of distinct identities written.

    The index is 16 bytes per distinct document — the artifact that makes
    daily-ingest dedup O(new shard), not O(corpus): subsequent
    :func:`incremental_dedup` calls read only the 16 B/doc digests, never
    historical text. ONE bounded shuffle (hash partition on the digest)
    groups each bucket; the group task dedups within the bucket and
    publishes its own file, so no stage materializes the index on the
    driver and a re-run with the same ``shard`` tag overwrites rather
    than appends.
    """

    def _hash_batch(t: pa.Table) -> pa.Table:
        out = _md5_identity(t.select([key_col]), key_col, num_buckets)
        return out.select(["h16", "_bucket"])

    def _writer(df: pd.DataFrame) -> pd.DataFrame:
        # map_groups co-locates whole groups but one call CAN carry rows
        # of several bucket values (sort + per-block batching) — never
        # assume a single key per call; split explicitly.
        rows = []
        for b, g in df.groupby("_bucket", sort=True):
            uniq = g["h16"].drop_duplicates()
            _write_bucket_delta(index_dir, int(b), shard, uniq)
            rows.append((int(b), len(uniq)))
        return pd.DataFrame(rows, columns=["bucket", "n"])

    os.makedirs(index_dir, exist_ok=True)
    _index_meta(
        index_dir,
        {"family": "identity", "num_buckets": num_buckets, "key_col": key_col},
    )
    counts = (
        docs.map_batches(_hash_batch, batch_format="pyarrow")
        # bucket ids are bounded (<= num_buckets), so a direct groupby is
        # safe — the one-Python-call-per-distinct-key concern
        # (_collision_groups) only applies to unbounded key spaces
        .groupby("_bucket")
        .map_groups(_writer, batch_format="pandas")
        .to_pandas()
    )
    # an empty corpus produces an empty frame with no columns at all
    mark_shard_complete(index_dir, shard)
    return int(counts["n"].sum()) if "n" in counts.columns else 0


def incremental_dedup(
    new_docs: rd.Dataset,
    index_dir: str,
    *,
    key_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int = INDEX_BUCKETS,
    update_index: bool = True,
    shard: str = "delta",
) -> rd.Dataset:
    """Dedup an incoming shard against a persisted corpus identity index
    WITHOUT rescanning historical text — the daily-ingest pattern at
    100 TB (the reference's only dedups are whole-table keyed passes,
    ``/root/reference/ofl/transform/spark/silver.py:64-72``; re-running
    one over the full corpus per arriving shard is O(corpus) per day).

    Semantics (identity = ``md5(key_col)``, the index contract):

    - within-shard duplicates keep the smallest ``id_col``;
    - a document whose identity already exists in the index is dropped;
    - survivors return with the shard's original columns, and (when
      ``update_index``) each bucket task publishes the survivors' digests
      as ``bucket=NNNN/<shard>.parquet`` so the NEXT shard sees them.

    Distributed shape: ONE bounded hash-partition shuffle of the incoming
    shard on the digest; each bucket task then reads only its own bucket's
    digest files (16 B per historical doc — task-side I/O, the index never
    touches the driver and unreferenced buckets are never read). A task
    reading ``seen`` EXCLUDES its own ``<shard>.parquet`` delta, so
    re-running a killed shard is idempotent instead of self-cancelling
    (its first attempt's partial deltas would otherwise mark its own rows
    as historical). The returned Dataset is lazy — consume it (write /
    count / collect) to drive the index update.
    """
    _check_index_meta(
        index_dir,
        {"family": "identity", "num_buckets": num_buckets, "key_col": key_col},
    )
    own_delta = f"{shard}.parquet"

    def _anti(df: pd.DataFrame) -> pd.DataFrame:
        # one call CAN carry several bucket values (see _writer) — split
        # explicitly; a row anti-joined against the wrong bucket's digest
        # files silently survives as a false novel.
        out = []
        for b, g in df.groupby("_bucket", sort=True):
            g = g.sort_values(id_col, kind="stable").drop_duplicates(
                "h16", keep="first"
            )
            bucket_dir = os.path.join(index_dir, f"bucket={int(b):04d}")
            seen: set[bytes] = set()
            for tab in _read_bucket_tables(
                bucket_dir, exclude=own_delta, columns=["h16"]
            ):
                seen.update(tab["h16"].to_pylist())
            if seen:
                # NOT Series.isin: pandas coerces a bytes value_set through
                # a numpy |S16 array, which STRIPS trailing NUL bytes — any
                # digest ending in 0x00 (1 in 256) silently misses and the
                # historical doc survives as a false novel. Per-row set
                # membership is a C hash probe on intact bytes objects.
                mask = np.fromiter(
                    (x not in seen for x in g["h16"].to_numpy()),
                    dtype=bool,
                    count=len(g),
                )
                g = g[mask]
            if update_index:
                _write_bucket_delta(index_dir, int(b), shard, g["h16"])
            out.append(g)
        return pd.concat(out, ignore_index=True).drop(columns=["_bucket", "h16"])

    return (
        new_docs.map_batches(
            lambda t: _md5_identity(t, key_col, num_buckets),
            batch_format="pyarrow",
        )
        .groupby("_bucket")
        .map_groups(_anti, batch_format="pandas")
    )


# --------------------------------------------------------------------------
# incremental near-dup against a persisted MinHash band index
# --------------------------------------------------------------------------


def _atomic_write_parquet(path: str, table: pa.Table) -> None:
    """tmp-write-then-rename publish (same pattern as the txlog manifests
    and :func:`_write_bucket_delta`) — readers only ever see complete
    files, and the deterministic FINAL name means a retry overwrites.
    The tmp name is per-writer unique: a straggler Ray worker surviving a
    SIGKILLed driver for a few seconds can otherwise interleave bytes
    into a resumed run's tmp file and the rename publishes corrupt
    parquet. Orphaned tmps from kills don't end in ``.parquet`` so every
    reader ignores them."""
    import pyarrow.parquet as pq

    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = f"{path}.tmp-{os.getpid()}-{id(table) & 0xFFFF:04x}"
    pq.write_table(table, tmp)
    os.replace(tmp, path)


def _band_bucket(t: pa.Table, num_buckets: int) -> pa.Table:
    """Append ``_bucket`` = stable hash of (band_id, band_hash) mod
    ``num_buckets`` — MUST be identical between index build and lookup,
    so it is defined once (splitmix64 of the combined key, the repo's
    stable vectorized mix)."""
    from open_finance_lakehouse_ray.functions.hashing import splitmix64

    bh = (
        t["band_hash"].to_numpy(zero_copy_only=False).astype(np.int64).view(np.uint64)
    )
    bid = t["band_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
    key = splitmix64(bh + bid * np.uint64(0x9E3779B97F4A7C15))
    return t.append_column(
        "_bucket", pa.array((key % np.uint64(num_buckets)).astype(np.int64))
    )


def _band_meta(num_buckets: int, num_perm: int, bands: int, shingle_k: int,
               id_col: str, text_col: str) -> dict:
    return {
        "family": "band",
        "num_buckets": num_buckets,
        "num_perm": num_perm,
        "bands": bands,
        "shingle_k": shingle_k,
        "id_col": id_col,
        "text_col": text_col,
    }


def _band_sig_stage(
    id_col: str, text_col: str, num_perm: int, bands: int, shingle_k: int,
    num_buckets: int,
):
    """``map_batches`` fn: signatures → band rows → bucket tag. Defined
    once so the index build and the shard lookup compute IDENTICAL band
    keys (the parameters are also pinned in `_meta.json`)."""

    def sig_stage(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        sigs = minhash_signatures(
            batch[text_col].to_pylist(), num_perm=num_perm, k=shingle_k
        )
        return _band_bucket(band_rows(ids, sigs, bands=bands), num_buckets)

    return sig_stage


def build_band_index(
    docs: rd.Dataset,
    index_dir: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 128,
    bands: int = 32,
    shingle_k: int = 3,
    num_buckets: int = INDEX_BUCKETS,
    shard: str = "base",
) -> int:
    """Persist the MinHash LSH band index of a corpus — the near-dup
    analog of :func:`build_hash_index`. One (band_id, band_hash, doc_id)
    row per band per doc (24 B × ``bands`` per doc; signatures themselves
    are NOT stored — candidate generation only needs the band keys),
    hash-partitioned by the band key into ``bucket=NNNN/<shard>.parquet``
    files with deterministic names (retry overwrites). Corpus growth is
    incremental: index each accepted shard under its own ``shard`` tag
    AFTER screening it with :func:`incremental_near_dup` (indexing it
    first would self-match). Returns the number of band rows written.
    """

    def _writer(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for b, g in df.groupby("_bucket", sort=True):
            g = g.drop_duplicates(["band_id", "band_hash", "doc_id"])
            _atomic_write_parquet(
                _bucket_delta_path(index_dir, int(b), shard),
                pa.table(
                    {
                        "band_id": pa.array(g["band_id"], pa.int64()),
                        "band_hash": pa.array(g["band_hash"], pa.int64()),
                        "doc_id": pa.array(g["doc_id"], pa.int64()),
                    }
                ),
            )
            rows.append((int(b), len(g)))
        return pd.DataFrame(rows, columns=["bucket", "n"])

    os.makedirs(index_dir, exist_ok=True)
    _index_meta(
        index_dir,
        _band_meta(num_buckets, num_perm, bands, shingle_k, id_col, text_col),
    )
    counts = (
        docs.map_batches(
            _band_sig_stage(id_col, text_col, num_perm, bands, shingle_k,
                            num_buckets),
            batch_format="pyarrow",
        )
        .groupby("_bucket")
        .map_groups(_writer, batch_format="pandas")
        .to_pandas()
    )
    mark_shard_complete(index_dir, shard)
    return int(counts["n"].sum()) if "n" in counts.columns else 0


def incremental_near_dup(
    new_docs: rd.Dataset,
    index_dir: str,
    history_docs: rd.Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    num_perm: int = 128,
    bands: int = 32,
    shingle_k: int = 3,
    num_buckets: int = INDEX_BUCKETS,
    broadcast_max_bytes: int = 64 * 1024 * 1024,
) -> pa.Table:
    """Flag arriving documents that are near-duplicates of the PERSISTED
    corpus without rescanning it — the fuzzy analog of
    :func:`incremental_dedup` (same daily-ingest pattern; same O(shard)
    candidate cost). Verification first collects the CANDIDATE ID SET
    (int64 pairs, bounded by the shard's LSH matches) and filters both
    sides' (id, text) projections to it map-side, so while the pruned
    history columns are scanned once, only O(candidates) text rows enter
    the verify joins — history never shuffles wholesale.

    Returns (id_a, id_b, jaccard): ``id_a`` = incoming doc, ``id_b`` =
    historical partner, EXACT k-shingle Jaccard >= ``threshold`` —
    verification is exact, so LSH recall is the only approximation
    (identical contract to :func:`minhash_near_dup_pairs`). Incoming ×
    incoming pairs are out of scope by construction (candidates only
    cross the index). Requires id spaces disjoint between shard and
    corpus; equal-id matches are dropped defensively. ``num_perm`` /
    ``bands`` / ``shingle_k`` / ``num_buckets`` must match the index
    build — they define the band keys, and `_meta.json` enforces it.

    Distributed shape: ONE band-key shuffle of the incoming shard's band
    rows (``bands`` rows per doc); each bucket task reads only its own
    bucket's persisted band files and emits cross-side candidates via a
    vectorized merge. Verification reuses :func:`_verified_pairs` — pair
    dedup + text attach, size-guarded broadcast vs bucketed joins.
    """
    _check_index_meta(
        index_dir,
        _band_meta(num_buckets, num_perm, bands, shingle_k, id_col, text_col),
    )

    def _match(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "id_a": pd.array([], dtype="int64"),
                "id_b": pd.array([], dtype="int64"),
            }
        )
        out = []
        for b, g in df.groupby("_bucket", sort=True):
            bucket_dir = os.path.join(index_dir, f"bucket={int(b):04d}")
            parts = _read_bucket_tables(bucket_dir)
            if not parts:
                continue
            hist = pa.concat_tables(parts).to_pandas()
            m = g[["band_id", "band_hash", "doc_id"]].merge(
                hist, on=["band_id", "band_hash"], suffixes=("_new", "_hist")
            )
            m = m[m["doc_id_new"] != m["doc_id_hist"]]
            if len(m):
                out.append(
                    pd.DataFrame(
                        {
                            "id_a": m["doc_id_new"].astype("int64"),
                            "id_b": m["doc_id_hist"].astype("int64"),
                        }
                    ).drop_duplicates()
                )
        if not out:
            return empty
        return pd.concat(out, ignore_index=True)

    cand = (
        new_docs.map_batches(
            _band_sig_stage(id_col, text_col, num_perm, bands, shingle_k,
                            num_buckets),
            batch_format="pyarrow",
        )
        .groupby("_bucket")
        .map_groups(_match, batch_format="pandas")
    )
    # distributed pair dedup, then materialize: the PAIRS stay in the
    # object store (skewed corpora can produce far more pairs than docs —
    # a driver collect here was the round-5 review's scalability finding);
    # only the DISTINCT candidate ids stream to the driver, a set bounded
    # by shard size + matched partners, to build the text filter
    cand = _dedup_pairs(cand).materialize()
    n_pairs = cand.count()
    if n_pairs == 0:
        return pa.table({"id_a": pa.array([], pa.int64()),
                         "id_b": pa.array([], pa.int64()),
                         "jaccard": pa.array([], pa.float64())})
    id_set: set[int] = set()
    for b in cand.select_columns(["id_a", "id_b"]).iter_batches(
        batch_format="pyarrow"
    ):
        id_set.update(b["id_a"].to_pylist())
        id_set.update(b["id_b"].to_pylist())
    cand_ids_ref = ray.put(
        pa.array(np.fromiter(sorted(id_set), dtype=np.int64,
                             count=len(id_set)))
    )

    def _only_candidates(t: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc

        return t.filter(
            _pc.is_in(t[id_col], value_set=ray.get(cand_ids_ref))
        )

    texts_all = (
        history_docs.select_columns([id_col, text_col])
        .map_batches(_only_candidates, batch_format="pyarrow")
        .union(
            new_docs.select_columns([id_col, text_col]).map_batches(
                _only_candidates, batch_format="pyarrow"
            )
        )
    )
    # the filtered projection is a derived plan: _maybe_pin materializes
    # it once (it is O(candidates) rows by construction) and returns the
    # ACTUAL size, so the broadcast guard decides on real bytes
    texts, tsize, _ = _maybe_pin(texts_all, estimate_from=texts_all)
    # the broadcast verify also collects the PAIRS to the driver, so it
    # additionally requires a bounded pair count — skew can blow up pairs
    # while the distinct-id text set stays small
    small = (
        (not _force_scale())
        and tsize is not None
        and tsize <= broadcast_max_bytes
        and n_pairs <= 2_000_000
    )
    return _verified_pairs(
        cand,
        texts,
        small,
        id_col=id_col,
        text_col=text_col,
        threshold=threshold,
        shingle_k=shingle_k,
        pre_deduped=True,  # _dedup_pairs already ran on the materialized set
    )


# --------------------------------------------------------------------------
# incremental semantic dedup against a persisted cluster-bucketed vector index
# --------------------------------------------------------------------------


def _cluster_assign_fn(cent_ref, id_col: str, vec_col: str, num_buckets: int):
    """``map_batches`` fn: nearest-centroid assignment (the |x|²−2x·c+|c|²
    expansion, one matmul per batch — :func:`semantic_dedup`'s kernel)
    emitting (vec_id, cluster, nvec, _bucket) rows. Defined once so the
    index build and the shard lookup use the IDENTICAL assignment."""
    empty = pa.table(
        {
            "vec_id": pa.array([], pa.int64()),
            "cluster": pa.array([], pa.int64()),
            "nvec": pa.array([], pa.binary()),
            "_bucket": pa.array([], pa.int64()),
        }
    )

    def assign(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return empty
        c = ray.get(cent_ref)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        x = np.stack(batch[vec_col].to_pandas().to_numpy()).astype(np.float64)
        d2 = (
            (x * x).sum(1, keepdims=True)
            - 2.0 * (x @ c.T)
            + (c * c).sum(1)[None, :]
        )
        cl = d2.argmin(axis=1).astype(np.int64)
        return pa.table(
            {
                "vec_id": ids,
                "cluster": pa.array(cl),
                "nvec": _pack_nvec(_normalize_rows(x)),
                "_bucket": pa.array(cl % np.int64(num_buckets)),
            }
        )

    return assign


def build_vector_index(
    emb: rd.Dataset,
    index_dir: str,
    *,
    k: int = 8,
    centroids: "np.ndarray | None" = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_buckets: int = INDEX_BUCKETS,
    shard: str = "base",
) -> int:
    """Persist the cluster-bucketed vector index of an embedding corpus —
    the semantic analog of :func:`build_hash_index` / `build_band_index`.
    Stores the centroids (``_centroids.parquet``, the assignment contract
    every later lookup MUST reuse) plus per-bucket (cluster, vec_id, nvec)
    rows — normalized float64 vectors, so screening needs no re-read of
    the corpus. Default centroids are :func:`semantic_dedup`'s
    deterministic k-lowest-id head (SQL-replicable); production passes
    ``kmeans_distributed`` centroids with k sized to bound cluster
    populations (SemDeDup's published scale knob — the per-bucket matmul
    at lookup is O(shard_cluster × hist_cluster)). Returns rows written.
    """
    from open_finance_lakehouse_ray.pipelines.similarity import _det_head

    mat = emb.select_columns([id_col, vec_col])
    if centroids is None:
        cent = _det_head(mat, id_col, vec_col, k)
    else:
        cent = np.asarray(centroids, dtype=np.float64)
    os.makedirs(index_dir, exist_ok=True)
    _index_meta(
        index_dir,
        {"family": "vector", "num_buckets": num_buckets,
         "id_col": id_col, "vec_col": vec_col},
    )
    cent_path = os.path.join(index_dir, "_centroids.parquet")
    if os.path.exists(cent_path):
        # an index's centroids ARE its assignment contract: silently
        # replacing them would leave already-stored vectors bucketed
        # under an assignment later lookups no longer reproduce
        import pyarrow.parquet as pq

        prior = np.stack(
            [
                np.frombuffer(b, dtype=np.float64)
                for b in pq.read_table(cent_path)["cvec"].to_pylist()
            ]
        )
        if prior.shape != cent.shape or not np.array_equal(prior, cent):
            raise ValueError(
                "build_vector_index: index at %r already has different "
                "centroids; index later shards with the PERSISTED "
                "centroids (read _centroids.parquet), or build a new "
                "index dir" % index_dir
            )
    else:
        _atomic_write_parquet(
            cent_path,
            pa.table(
                {
                    "cluster": pa.array(range(len(cent)), pa.int64()),
                    "cvec": pa.array([c.tobytes() for c in cent], pa.binary()),
                }
            ),
        )
    cent_ref = ray.put(cent)

    def _writer(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for b, g in df.groupby("_bucket", sort=True):
            _atomic_write_parquet(
                _bucket_delta_path(index_dir, int(b), shard),
                pa.table(
                    {
                        "cluster": pa.array(g["cluster"], pa.int64()),
                        "vec_id": pa.array(g["vec_id"], pa.int64()),
                        "nvec": pa.array(list(g["nvec"]), pa.binary()),
                    }
                ),
            )
            rows.append((int(b), len(g)))
        return pd.DataFrame(rows, columns=["bucket", "n"])

    counts = (
        mat.map_batches(
            _cluster_assign_fn(cent_ref, id_col, vec_col, num_buckets),
            batch_format="pyarrow",
        )
        .groupby("_bucket")
        .map_groups(_writer, batch_format="pandas")
        .to_pandas()
    )
    mark_shard_complete(index_dir, shard)
    return int(counts["n"].sum()) if "n" in counts.columns else 0


def incremental_semantic_dup(
    new_emb: rd.Dataset,
    index_dir: str,
    *,
    threshold: float = 0.5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_buckets: int = INDEX_BUCKETS,
) -> pa.Table:
    """Screen an arriving embedding shard against the persisted semantic
    index — the third modality of the incremental family (exact identity,
    MinHash text near-dup, embedding-cosine near-dup), same O(shard)
    contract: assignment is one matmul per batch against the PERSISTED
    centroids, ONE bounded cluster shuffle, and each bucket task reads
    only its own bucket's stored vectors. Returns (vec_id, cluster,
    dup_of) for EVERY incoming vector — ``dup_of`` = lowest historical id
    in the same cluster with cosine >= ``threshold`` (NULL = novel; the
    SemDeDup keep rule against history). Incoming × incoming pairs are
    out of scope, matching the rest of the incremental family; cluster
    growth is per-shard via ``build_vector_index(..., shard=...)`` after
    screening."""
    import pyarrow.compute as _pc
    import pyarrow.parquet as pq

    _check_index_meta(
        index_dir,
        {"family": "vector", "num_buckets": num_buckets,
         "id_col": id_col, "vec_col": vec_col},
    )
    ct = pq.read_table(os.path.join(index_dir, "_centroids.parquet"))
    cent = np.stack(
        [np.frombuffer(b, dtype=np.float64) for b in ct["cvec"].to_pylist()]
    )
    cent_ref = ray.put(cent)

    def _match(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for b, g in df.groupby("_bucket", sort=True):
            bucket_dir = os.path.join(index_dir, f"bucket={int(b):04d}")
            parts = _read_bucket_tables(bucket_dir)
            hist = pa.concat_tables(parts).to_pandas() if parts else None
            for cl, grp in g.groupby("cluster", sort=False):
                ids = grp["vec_id"].to_numpy()
                dup = np.full(len(grp), -1, dtype=np.int64)
                h = (
                    hist[hist["cluster"] == cl]
                    if hist is not None
                    else None
                )
                if h is not None and len(h):
                    x = _unpack_nvec(list(grp["nvec"]))
                    hv = _unpack_nvec(list(h["nvec"]))
                    hid = h["vec_id"].to_numpy()
                    order = np.argsort(hid, kind="stable")
                    sims = x @ hv[order].T
                    # a shard wrongly indexed before screening would match
                    # itself at cosine 1.0 and flag every row — drop
                    # equal-id matches, like incremental_near_dup does
                    sims[hid[order][None, :] == ids[:, None]] = -2.0
                    hit = sims >= threshold
                    any_hit = hit.any(axis=1)
                    first = hit.argmax(axis=1)
                    dup = np.where(any_hit, hid[order][first], -1)
                out.append(
                    pd.DataFrame(
                        {"vec_id": ids, "cluster": int(cl), "dup_of": dup}
                    )
                )
        if not out:
            return pd.DataFrame(
                {
                    "vec_id": pd.array([], dtype="int64"),
                    "cluster": pd.array([], dtype="int64"),
                    "dup_of": pd.array([], dtype="int64"),
                }
            )
        res = pd.concat(out, ignore_index=True)
        res["dup_of"] = res["dup_of"].astype("int64")
        return res

    got = (
        new_emb.select_columns([id_col, vec_col])
        .map_batches(
            _cluster_assign_fn(cent_ref, id_col, vec_col, num_buckets),
            batch_format="pyarrow",
        )
        .groupby("_bucket")
        .map_groups(_match, batch_format="pandas")
        .to_pandas()
    )
    if "vec_id" not in got.columns:  # empty shard: schema-less empty frame
        got = pd.DataFrame(
            {
                "vec_id": pd.array([], dtype="int64"),
                "cluster": pd.array([], dtype="int64"),
                "dup_of": pd.array([], dtype="int64"),
            }
        )
    got = got.sort_values("vec_id")
    t = pa.Table.from_pandas(got.reset_index(drop=True), preserve_index=False)
    dup = t["dup_of"]
    t = t.set_column(
        t.column_names.index("dup_of"),
        "dup_of",
        _pc.if_else(_pc.equal(dup, -1), pa.nulls(t.num_rows, pa.int64()), dup),
    )
    return t


def compact_index(index_dir: str, *, keep_name: str = "compacted") -> dict:
    """Merge each bucket's accumulated per-shard delta files into one —
    the maintenance verb for all three persisted index families (identity
    digests, MinHash band rows, cluster-bucketed vectors; the layout is
    shared: ``bucket=NNNN/<shard>.parquet``).

    Safe under concurrent lookups and kills WITHOUT any locking, via two
    halves of one protocol: (a) every lookup treats index rows as a SET
    (digest membership, band-key match, per-cluster min-id witness —
    duplicated rows change nothing) and the merged file publishes FIRST
    (tmp + rename, new generation name) with old deltas unlinked only
    after, so a completed listing never under-reads; (b) a lookup whose
    listing went stale mid-read (listdir saw a delta, compaction unlinked
    it before the read) hits FileNotFoundError and RE-LISTS
    (:func:`_read_bucket_tables`) — the generation file it then sees is a
    superset of the vanished delta. A kill between publish and unlink
    leaves duplicates — re-running compaction converges.

    The one contract this relies on — :func:`incremental_dedup`'s
    own-delta exclusion matches the exact ``<shard>.parquet`` name, so
    folding an IN-FLIGHT shard's deltas would make a same-tag resume see
    its own rows as history — is ENFORCED, not advisory: only shards
    with a `_shards/<shard>.done` marker (written by the builders on
    completion, and by callers via :func:`mark_shard_complete` after
    consuming a screen) fold; unmarked deltas are left in place, so a
    compaction racing a killed screen's resume is safe by construction
    (the round-5 third-review finding).

    Distributed shape: one Ray task per non-empty bucket (bounded by the
    bucket count); each task touches only its own directory. Returns
    {"buckets": n, "files_before": n, "files_after": n, "rows": n,
    "skipped_incomplete": n}.
    """
    import pyarrow.parquet as pq

    done = _completed_shards(index_dir)

    @ray.remote
    def _compact_bucket(bucket_dir: str) -> tuple[int, int, int, int]:
        files = sorted(
            f for f in os.listdir(bucket_dir) if f.endswith(".parquet")
        )

        def _foldable(f: str) -> bool:
            if f.startswith(keep_name + "-"):
                return True
            return f[: -len(".parquet")] in done

        fold = [f for f in files if _foldable(f)]
        skipped = len(files) - len(fold)
        if len(fold) <= 1:
            return (len(files), len(files), 0, skipped)
        gen = 0
        for f in fold:
            if f.startswith(keep_name + "-"):
                try:
                    gen = max(gen, int(f[len(keep_name) + 1 : -len(".parquet")]))
                except ValueError:
                    pass
        tabs = [pq.read_table(os.path.join(bucket_dir, f)) for f in fold]
        merged = pa.concat_tables(tabs).to_pandas().drop_duplicates()
        out_name = f"{keep_name}-{gen + 1}.parquet"
        # the pandas round-trip widens fixed-width types (binary(16) ->
        # binary); cast back so generations keep the shard files' schema
        _atomic_write_parquet(
            os.path.join(bucket_dir, out_name),
            pa.Table.from_pandas(merged, preserve_index=False)
            .select(tabs[0].schema.names)
            .cast(tabs[0].schema),
        )
        for f in fold:  # only after the merged generation is visible
            os.unlink(os.path.join(bucket_dir, f))
        return (len(files), len(files) - len(fold) + 1, len(merged), skipped)

    buckets = [
        os.path.join(index_dir, d)
        for d in sorted(os.listdir(index_dir))
        if d.startswith("bucket=") and os.path.isdir(os.path.join(index_dir, d))
    ]
    results = ray.get([_compact_bucket.remote(b) for b in buckets])
    return {
        "buckets": len(buckets),
        "files_before": sum(r[0] for r in results),
        "files_after": sum(r[1] for r in results),
        "rows": sum(r[2] for r in results),
        "skipped_incomplete": sum(r[3] for r in results),
    }
