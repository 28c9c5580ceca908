"""Mergeable sketches: HyperLogLog distinct counting.

The reference has no approximate aggregates (SURVEY.md §2.5 — everything
is exact), but at 10^12-turn scale exact distinct-key counting is an
all-to-all shuffle; the sketch pattern is the scale path: each batch
emits ONE serialized sketch, sketches merge associatively in a tiny final
stage — shuffle volume collapses from O(rows) to O(batches × 2^p).

Standard HLL (Flajolet et al. 2007) with the usual small-range
(linear-counting) correction; pure numpy, serializable as bytes.
"""

from __future__ import annotations

import numpy as np


class HyperLogLog:
    def __init__(self, p: int = 12, registers: np.ndarray | None = None):
        self.p = p
        self.m = 1 << p
        self.registers = (
            registers if registers is not None else np.zeros(self.m, dtype=np.uint8)
        )

    @staticmethod
    def _alpha(m: int) -> float:
        if m == 16:
            return 0.673
        if m == 32:
            return 0.697
        if m == 64:
            return 0.709
        return 0.7213 / (1 + 1.079 / m)

    def add_hashed(self, h: np.ndarray) -> "HyperLogLog":
        """Fold pre-hashed uint64 values in, vectorized."""
        h = h.astype(np.uint64)
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        # sentinel bit guarantees rest > 0 and caps the rank at 64 - p + 1
        rest = (h << np.uint64(self.p)) | (np.uint64(1) << np.uint64(self.p - 1))
        # vectorized leading-zero count: 63 - floor(log2(x))
        lz = 63 - np.floor(np.log2(rest.astype(np.float64))).astype(np.int64)
        rank = np.clip(lz + 1, 1, 64).astype(np.uint8)
        np.maximum.at(self.registers, idx, rank)
        return self

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        assert self.p == other.p
        return HyperLogLog(self.p, np.maximum(self.registers, other.registers))

    def estimate(self) -> float:
        m = self.m
        est = self._alpha(m) * m * m / np.sum(np.exp2(-self.registers.astype(np.float64)))
        zeros = int(np.sum(self.registers == 0))
        if est <= 2.5 * m and zeros > 0:
            est = m * np.log(m / zeros)  # linear counting for small ranges
        return float(est)

    def to_bytes(self) -> bytes:
        return bytes([self.p]) + self.registers.tobytes()

    @staticmethod
    def from_bytes(b: bytes) -> "HyperLogLog":
        p = b[0]
        return HyperLogLog(p, np.frombuffer(b[1:], dtype=np.uint8).copy())


def approx_distinct(ds, column: str, p: int = 12) -> float:
    """Approximate distinct count of a column over a Dataset — the
    pre-aggregate pattern: one sketch per batch, merged at the driver."""
    import pyarrow as pa

    from open_finance_lakehouse_ray.functions.hashing import hash64_strings

    def sketch_batch(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        col = t[column]
        if not pa.types.is_string(col.type):
            col = pc.cast(col, pa.string())
        h = hash64_strings(col)
        hll = HyperLogLog(p).add_hashed(h)
        return pa.table({"sketch": pa.array([hll.to_bytes()], pa.binary())})

    parts = ds.map_batches(sketch_batch, batch_format="pyarrow").take_all()
    merged = HyperLogLog(p)
    for r in parts:
        merged = merged.merge(HyperLogLog.from_bytes(r["sketch"]))
    return merged.estimate()
