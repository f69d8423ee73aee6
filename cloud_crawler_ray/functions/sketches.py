"""Mergeable sketches for distributed aggregation (HyperLogLog).

The reference has no approximate aggregates (SURVEY.md §2.6); at 100 TB a
count-distinct over a shuffle is an all-to-all the engine should not pay.
HLL gives it in one `map_batches` pass: one small register array per batch,
merged associatively in a tiny reduce (the "emit one serialized sketch per
batch, merge in a second stage" pattern).
"""

from __future__ import annotations

import numpy as np

from .hashing import splitmix64


class HyperLogLog:
    """Standard HLL with 2^p registers (p=12 → ~1.6% relative error, 4 KiB)."""

    def __init__(self, p: int = 12, registers: np.ndarray | None = None):
        self.p = p
        self.m = 1 << p
        self.registers = registers if registers is not None else np.zeros(self.m, np.uint8)

    def add_many(self, keys: np.ndarray) -> "HyperLogLog":
        h = splitmix64(np.asarray(keys, np.uint64))
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        rest = (h << np.uint64(self.p)) | np.uint64((1 << self.p) - 1)  # sentinel bits
        # rank = leading zeros of the remaining 64-p bits, + 1
        rank = np.zeros(len(h), np.uint8)
        mask = np.uint64(1) << np.uint64(63)
        cur = rest.copy()
        live = np.ones(len(h), bool)
        for r in range(1, 64 - self.p + 2):
            top = (cur & mask) != 0
            newly = live & top
            rank[newly] = r
            live &= ~top
            if not live.any():
                break
            cur = cur << np.uint64(1)
        np.maximum.at(self.registers, idx, rank)
        return self

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        assert self.p == other.p
        return HyperLogLog(self.p, np.maximum(self.registers, other.registers))

    def estimate(self) -> float:
        m = float(self.m)
        alpha = 0.7213 / (1 + 1.079 / m)
        z = 1.0 / np.sum(2.0 ** (-self.registers.astype(np.float64)))
        e = alpha * m * m * z
        zeros = int((self.registers == 0).sum())
        if e <= 2.5 * m and zeros:
            return m * np.log(m / zeros)  # linear counting for small cardinalities
        return float(e)

    def serialize(self) -> bytes:
        return bytes([self.p]) + self.registers.tobytes()

    @classmethod
    def deserialize(cls, data: bytes) -> "HyperLogLog":
        return cls(data[0], np.frombuffer(data[1:], np.uint8).copy())
