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


class QuantileSketch:
    """Mergeable approximate-quantile sketch — a deterministic MRL/KLL-style
    multi-level compactor (no RNG, so results are identical across runs and
    cluster sizes for the same per-batch input multisets).

    Level h holds at most ``k`` values, each standing for 2^h originals.
    A full level is sorted and every other element promoted (the selection
    parity alternates per compaction, so dropped ranks are not
    systematically biased); promoted values carry doubled weight. Rank
    error grows O(2^h) per compaction at level h — with k=256 the observed
    rank error is well under 1% at 10^6 inserts (pinned by the unit test).
    ~k·log2(n/k) float64s of state; serialize/merge like the HLL above:
    one sketch per map_batches batch, associative merge in a reduce task.
    """

    def __init__(self, k: int = 256, levels: list[np.ndarray] | None = None, parity: int = 0):
        self.k = int(k)
        self.levels: list[np.ndarray] = levels if levels is not None else [np.empty(0, np.float64)]
        self.parity = parity

    def _compact_level(self, h: int) -> None:
        arr = np.sort(self.levels[h], kind="stable")
        keep = arr[self.parity :: 2]
        self.parity ^= 1
        self.levels[h] = np.empty(0, np.float64)
        if h + 1 == len(self.levels):
            self.levels.append(np.empty(0, np.float64))
        self.levels[h + 1] = np.concatenate([self.levels[h + 1], keep])

    def _compress(self) -> None:
        h = 0
        while h < len(self.levels):
            if len(self.levels[h]) > self.k:
                self._compact_level(h)
            h += 1

    def add_many(self, values: np.ndarray) -> "QuantileSketch":
        v = np.asarray(values, np.float64)
        v = v[~np.isnan(v)]
        # feed in k-sized slices so level 0 never balloons past 2k
        for i in range(0, len(v), self.k):
            self.levels[0] = np.concatenate([self.levels[0], v[i : i + self.k]])
            self._compress()
        return self

    def merge(self, other: "QuantileSketch") -> "QuantileSketch":
        assert self.k == other.k
        n = max(len(self.levels), len(other.levels))
        levels = []
        for h in range(n):
            a = self.levels[h] if h < len(self.levels) else np.empty(0, np.float64)
            b = other.levels[h] if h < len(other.levels) else np.empty(0, np.float64)
            levels.append(np.concatenate([a, b]))
        out = QuantileSketch(self.k, levels, self.parity ^ other.parity)
        out._compress()
        return out

    def count(self) -> int:
        return int(sum(len(lv) << h for h, lv in enumerate(self.levels)))

    def quantile(self, q: float) -> float:
        """Nearest-rank weighted quantile over the sketch's (value, 2^h) pairs."""
        vals = np.concatenate(self.levels)
        if not len(vals):
            return float("nan")
        wts = np.concatenate(
            [np.full(len(lv), 1 << h, np.int64) for h, lv in enumerate(self.levels)]
        )
        order = np.argsort(vals, kind="stable")
        vals, wts = vals[order], wts[order]
        cum = np.cumsum(wts)
        target = max(1, int(np.ceil(q * cum[-1])))
        return float(vals[np.searchsorted(cum, target)])

    def serialize(self) -> bytes:
        import struct

        head = struct.pack("<iii", self.k, self.parity, len(self.levels))
        parts = [head]
        for lv in self.levels:
            parts.append(struct.pack("<i", len(lv)))
            parts.append(lv.tobytes())
        return b"".join(parts)

    @classmethod
    def deserialize(cls, data: bytes) -> "QuantileSketch":
        import struct

        k, parity, n = struct.unpack_from("<iii", data, 0)
        off = 12
        levels = []
        for _ in range(n):
            (ln,) = struct.unpack_from("<i", data, off)
            off += 4
            levels.append(np.frombuffer(data, np.float64, ln, off).copy())
            off += 8 * ln
        return cls(k, levels, parity)
