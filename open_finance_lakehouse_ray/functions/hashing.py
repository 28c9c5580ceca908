"""Stable hashing for conversation ids and merge keys.

Determinism contract: every hash here is a pure function of the value —
stable across processes, runs and machines (unlike Python's salted
``hash``). This matters because Z-keys, bucket assignments and commit ids
derived from hashes must agree between a killed run and its resume
(SURVEY.md §7, resume correctness) and between the two parallelism levels
of the scaling benchmark.

Vectorization strategy for string columns: dictionary-encode the Arrow
array (conversations repeat heavily within a batch), hash only the unique
values in Python (blake2b, 8-byte digest), then ``np.take`` back to row
order — the per-row hot path stays in C.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public-domain constant mix).

    Pure function of the input — used wherever a cheap, stable,
    vectorizable PRN is needed (bucket salting, fixture text derivation).
    """
    x = x.astype(np.uint64)
    x = (x + np.uint64(0x9E3779B97F4A7C15))
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


def splitmix64_py(x: int) -> int:
    """Scalar mirror of :func:`splitmix64` (uint64 wraparound semantics)."""
    mask = (1 << 64) - 1
    x = (x + 0x9E3779B97F4A7C15) & mask
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & mask
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & mask
    return x ^ (x >> 31)


def hash64_py(value: str) -> int:
    """Stable 64-bit hash of a string (blake2b/8). Pure-Python reference."""
    return int.from_bytes(
        hashlib.blake2b(value.encode("utf-8"), digest_size=8).digest(), "big"
    )


def hash64_strings(arr: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """Vectorized stable hash of a string column -> uint64 ndarray."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    arr = pc.fill_null(arr, "")
    dic = arr.dictionary_encode()
    uniques = dic.dictionary.to_pylist()
    table = np.fromiter(
        (hash64_py(u if u is not None else "") for u in uniques),
        dtype=np.uint64,
        count=len(uniques),
    )
    indices = dic.indices.to_numpy(zero_copy_only=False)
    if len(table) == 0:
        return np.zeros(len(arr), dtype=np.uint64)
    return table.take(indices.astype(np.int64))


def bucket_for_keys(
    conv_id: pa.Array | pa.ChunkedArray,
    turn_idx: pa.Array | pa.ChunkedArray,
    num_buckets: int,
) -> np.ndarray:
    """Deterministic bucket id for the MERGE key ``(conv_id, turn_idx)``.

    Mixing ``turn_idx`` into the bucket breaks hot-conversation skew (the
    north rule's conv_id salting): a Zipf-hot conversation's turns spread
    across buckets, yet any given key always lands in exactly one bucket,
    so latest-wins dedup per key is correct within a single group. The
    'salt' is ``turn_idx`` itself — a key can never span two groups (the
    pitfall called out in SURVEY.md §7.4.3).
    """
    h = hash64_strings(conv_id)
    if isinstance(turn_idx, pa.ChunkedArray):
        turn_idx = turn_idx.combine_chunks()
    t = turn_idx.to_numpy(zero_copy_only=False).astype(np.uint64)
    x = splitmix64(h ^ (t * np.uint64(0x9E3779B97F4A7C15)))
    return (x % np.uint64(num_buckets)).astype(np.int64)


def add_bucket_column(batch: pa.Table, num_buckets: int, col: str = "_bucket") -> pa.Table:
    b = bucket_for_keys(batch["conv_id"], batch["turn_idx"], num_buckets)
    return batch.append_column(col, pa.array(b, type=pa.int64()))


def content_hash_column(batch: pa.Table, columns: list[str], col: str = "_chash") -> pa.Table:
    """64-bit content hash over the concatenation of ``columns`` (used by
    exact dedup). Vectorized: one Arrow string concat + pandas'
    C-implemented ``hash_array`` (siphash, fixed key → run-stable).
    Unlike :func:`hash64_strings` this does NOT dictionary-encode — dedup
    inputs are mostly-unique long texts, where per-unique Python hashing
    would degenerate to a row loop."""
    import pandas as pd

    parts = []
    for c in columns:
        arr = batch[c]
        if not pa.types.is_string(arr.type):
            arr = pc.cast(arr, pa.string())
        parts.append(pc.fill_null(arr, "\x00"))
        parts.append(pa.array(["\x1f"] * len(batch), type=pa.string()))
    joined = pc.binary_join_element_wise(*parts, "")
    h = pd.util.hash_array(joined.to_numpy(zero_copy_only=False))
    return batch.append_column(col, pa.array(h.view(np.int64)))
