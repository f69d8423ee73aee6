"""Vectorized Bloom filter over uint64 keys (numpy bit array).

Used as the cheap negative pre-filter in front of the cuckoo filter in each
dedup shard (north_rule: "sharded cuckoo-filter URL-seen set with a bloom
pre-filter"). The reference's exact-membership semantics come from the exact
seen-set confirm (state/seen.py); bloom/cuckoo only accelerate.

Sizing: bits = n * bits_per_key. 10 bits/key ≈ 1% FP at k=7. A 10^10-URL
frontier at 10 bits/key is 12.5 GB total — sharded over S dedup actors
(e.g. S=256 → 49 MB/shard), which is the point of sharding by url_hash.
"""

from __future__ import annotations

import numpy as np

from ..functions.hashing import splitmix64

_U64 = np.uint64


class BloomFilter:
    def __init__(self, capacity: int, bits_per_key: int = 10, num_hashes: int = 7, seed: int = 0):
        self.num_bits = max(64, int(capacity) * bits_per_key)
        self.num_bits = 1 << int(np.ceil(np.log2(self.num_bits)))  # power of 2 → mask not mod
        self.mask = _U64(self.num_bits - 1)
        self.num_hashes = num_hashes
        self.seed = seed
        self.words = np.zeros(self.num_bits // 64, _U64)
        self.count = 0

    def _positions(self, keys: np.ndarray) -> np.ndarray:
        """(num_hashes, n) bit positions via double hashing h1 + i*h2."""
        k = keys.astype(_U64)
        h1 = splitmix64(k ^ _U64(self.seed))
        h2 = splitmix64(h1) | _U64(1)
        i = np.arange(self.num_hashes, dtype=_U64)[:, None]
        return (h1[None, :] + i * h2[None, :]) & self.mask

    def add_many(self, keys: np.ndarray) -> None:
        pos = self._positions(keys).ravel()
        np.bitwise_or.at(self.words, (pos >> _U64(6)).astype(np.int64), _U64(1) << (pos & _U64(63)))
        self.count += len(keys)

    def contains_many(self, keys: np.ndarray) -> np.ndarray:
        """bool[n] — False is definite, True is probable."""
        if len(keys) == 0:
            return np.zeros(0, bool)
        pos = self._positions(keys)
        bits = (self.words[(pos >> _U64(6)).astype(np.int64)] >> (pos & _U64(63))) & _U64(1)
        return bits.all(axis=0)

    # ---- checkpoint snapshot/restore (wave-boundary only)
    def snapshot(self) -> dict:
        return {"words": self.words.copy(), "count": self.count, "seed": self.seed, "num_hashes": self.num_hashes}

    @classmethod
    def restore(cls, snap: dict) -> "BloomFilter":
        bf = cls.__new__(cls)
        bf.words = snap["words"].copy()
        bf.num_bits = len(bf.words) * 64
        bf.mask = _U64(bf.num_bits - 1)
        bf.num_hashes = snap["num_hashes"]
        bf.seed = snap["seed"]
        bf.count = snap["count"]
        return bf
