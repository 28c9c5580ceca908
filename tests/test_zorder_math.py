"""Bit-level tests for the Z-order / Hilbert interleave — the pure-Python
mirror pins the vectorized numpy implementation, the same JVM-free-mirror
discipline as the reference's window arithmetic tests
(tests/test_streaming_windows.py over ofl/streaming/windows.py)."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from open_finance_lakehouse_ray.functions import zorder as z

DIM = st.integers(min_value=0, max_value=z.DIM_MAX)


def test_spread_known_values():
    assert z.spread_bits_py(0) == 0
    assert z.spread_bits_py(1) == 1
    assert z.spread_bits_py(0b11) == 0b1001
    assert z.spread_bits_py(z.DIM_MAX) == int("001" * 21, 2)


def test_morton_boundary():
    assert z.morton3_py(0, 0, 0) == 0
    assert z.morton3_py(z.DIM_MAX, z.DIM_MAX, z.DIM_MAX) == (1 << 63) - 1
    # d0 occupies the most significant slot
    assert z.morton3_py(1, 0, 0) == 0b100
    assert z.morton3_py(0, 1, 0) == 0b010
    assert z.morton3_py(0, 0, 1) == 0b001


@given(DIM, DIM, DIM)
@settings(max_examples=200, deadline=None)
def test_morton_roundtrip(a, b, c):
    assert z.morton3_inverse_py(z.morton3_py(a, b, c)) == (a, b, c)


@given(st.lists(st.tuples(DIM, DIM, DIM), min_size=1, max_size=50))
@settings(max_examples=50, deadline=None)
def test_morton_vectorized_matches_mirror(points):
    a = np.array([p[0] for p in points], dtype=np.uint64)
    b = np.array([p[1] for p in points], dtype=np.uint64)
    c = np.array([p[2] for p in points], dtype=np.uint64)
    vec = z.morton3(a, b, c)
    ref = [z.morton3_py(*p) for p in points]
    assert vec.tolist() == ref


def test_morton_locality_monotone_in_each_dim():
    # increasing one dimension (others fixed) increases the key
    base = z.morton3_py(100, 100, 100)
    assert z.morton3_py(101, 100, 100) > base
    assert z.morton3_py(100, 101, 100) > base
    assert z.morton3_py(100, 100, 101) > base


@given(st.lists(st.tuples(DIM, DIM, DIM), min_size=1, max_size=30))
@settings(max_examples=30, deadline=None)
def test_hilbert_vectorized_matches_mirror(points):
    a = np.array([p[0] for p in points], dtype=np.uint64)
    b = np.array([p[1] for p in points], dtype=np.uint64)
    c = np.array([p[2] for p in points], dtype=np.uint64)
    vec = z.hilbert3(a, b, c)
    ref = [z.hilbert3_py(*p) for p in points]
    assert vec.tolist() == ref


def test_hilbert_is_a_bijection_on_small_cube():
    # 3 bits per dim -> 512 cells; hilbert must visit each exactly once,
    # with consecutive indices adjacent in space (unit-step curve)
    bits = 3
    seen = {}
    for x in range(8):
        for y in range(8):
            for zz in range(8):
                h = z.hilbert3_py(x, y, zz, bits=bits)
                assert h not in seen
                seen[h] = (x, y, zz)
    assert len(seen) == 512
    pts = [seen[i] for i in range(512)]
    for p, q in zip(pts, pts[1:]):
        dist = sum(abs(a - b) for a, b in zip(p, q))
        assert dist == 1, f"hilbert step {p}->{q} is not a unit move"


def test_normalize_to_bits():
    vals = np.array([0.0, 50.0, 100.0])
    out = z.normalize_to_bits(vals, 0.0, 100.0)
    assert out[0] == 0
    assert out[2] == z.DIM_MAX
    assert 0 < out[1] < z.DIM_MAX
    # degenerate range -> all zeros
    assert z.normalize_to_bits(vals, 5.0, 5.0).tolist() == [0, 0, 0]


def test_hash64_stable_and_vectorized():
    from open_finance_lakehouse_ray.functions import hashing as hsh
    import pyarrow as pa

    assert hsh.hash64_py("conv-0001") == hsh.hash64_py("conv-0001")
    assert hsh.hash64_py("conv-0001") != hsh.hash64_py("conv-0002")
    arr = pa.array(["a", "b", "a", None, "c"])
    out = hsh.hash64_strings(arr)
    assert out[0] == out[2] == hsh.hash64_py("a")
    assert out[3] == hsh.hash64_py("")


def test_bucket_for_keys_spreads_hot_conversation():
    """A hot conversation's turns land in many buckets (skew broken), but
    a single (conv_id, turn_idx) key is always in exactly one bucket."""
    import pyarrow as pa
    from open_finance_lakehouse_ray.functions.hashing import bucket_for_keys

    conv = pa.array(["conv-hot"] * 1000)
    turns = pa.array(np.arange(1000, dtype=np.int32), type=pa.int32())
    b = bucket_for_keys(conv, turns, 16)
    assert len(np.unique(b)) == 16  # spread across all buckets
    b2 = bucket_for_keys(conv, turns, 16)
    assert (b == b2).all()  # deterministic


@pytest.mark.parametrize("curve", ["morton", "hilbert"])
def test_curves_cover_distinct_keys(curve):
    rng = np.random.default_rng(7)
    a = rng.integers(0, z.DIM_MAX, 1000).astype(np.uint64)
    b = rng.integers(0, z.DIM_MAX, 1000).astype(np.uint64)
    c = rng.integers(0, z.DIM_MAX, 1000).astype(np.uint64)
    fn = z.morton3 if curve == "morton" else z.hilbert3
    keys = fn(a, b, c)
    assert len(np.unique(keys)) == 1000  # no collisions on random points
