"""Cuckoo filter over uint64 keys — approximate membership with deletion.

The reference's URL-seen set is the SQL table itself (anti-join insert,
SqlQueueTaskProvider.scala:56-78). At 10^10 URLs a DB anti-join per wave is
the bottleneck the north_rule removes: each dedup shard actor holds a cuckoo
filter (fast approximate membership, supports delete for requeue compaction)
behind a bloom pre-filter, with an exact confirm (state/seen.py) so engine
semantics stay *exactly* first-discovery-wins.

Layout: ``buckets[num_buckets, 4]`` uint16 fingerprints (0 = empty slot).
16-bit fingerprints at 4 slots/bucket ≈ 0.02% FP at 95% load. Lookup is
fully vectorized per batch; insert is amortized (vectorized fast-path for
bucket-1 placement, per-item eviction walk only on collision).
"""

from __future__ import annotations

import numpy as np

from ..functions.hashing import splitmix64

_U64 = np.uint64
_MAX_KICKS = 500


class CuckooFilter:
    def __init__(self, capacity: int, seed: int = 0):
        nb = max(8, int(capacity / 4 / 0.90))
        self.num_buckets = 1 << int(np.ceil(np.log2(nb)))
        self.mask = _U64(self.num_buckets - 1)
        self.seed = seed
        self.buckets = np.zeros((self.num_buckets, 4), np.uint16)
        self.count = 0
        self._rng = np.random.Generator(np.random.PCG64(seed ^ 0xC0C0))

    # ---- key → (fingerprint, bucket1, bucket2)
    def _fp_idx(self, keys: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        k = keys.astype(_U64)
        h = splitmix64(k ^ _U64(self.seed))
        fp = ((h >> _U64(48)) & _U64(0xFFFF)).astype(np.uint16)
        fp = np.where(fp == 0, np.uint16(1), fp)  # 0 means empty
        i1 = (h & self.mask).astype(np.int64)
        i2 = self._alt_index(i1, fp)
        return fp, i1, i2

    def _alt_index(self, idx: np.ndarray, fp: np.ndarray) -> np.ndarray:
        return (idx.astype(_U64) ^ (splitmix64(fp.astype(_U64)) & self.mask)).astype(np.int64)

    def contains_many(self, keys: np.ndarray) -> np.ndarray:
        if len(keys) == 0:
            return np.zeros(0, bool)
        fp, i1, i2 = self._fp_idx(keys)
        m1 = (self.buckets[i1] == fp[:, None]).any(axis=1)
        m2 = (self.buckets[i2] == fp[:, None]).any(axis=1)
        return m1 | m2

    def add_many(self, keys: np.ndarray) -> int:
        """Insert all keys (idempotence NOT checked — callers dedup first).

        Returns number inserted; raises if the filter is critically full.
        """
        if len(keys) == 0:
            return 0
        fp, i1, i2 = self._fp_idx(keys)
        for j in range(len(keys)):  # bucket collisions make this inherently sequential
            self._insert_one(int(i1[j]), int(i2[j]), fp[j])
        self.count += len(keys)
        return len(keys)

    def _insert_one(self, i1: int, i2: int, fp: np.uint16) -> None:
        for idx in (i1, i2):
            row = self.buckets[idx]
            empty = np.flatnonzero(row == 0)
            if len(empty):
                row[empty[0]] = fp
                return
        # eviction walk
        idx = i1 if (self._rng.integers(0, 2)) else i2
        for _ in range(_MAX_KICKS):
            slot = int(self._rng.integers(0, 4))
            fp, self.buckets[idx, slot] = self.buckets[idx, slot], fp
            idx = int(self._alt_index(np.array([idx]), np.array([fp]))[0])
            row = self.buckets[idx]
            empty = np.flatnonzero(row == 0)
            if len(empty):
                row[empty[0]] = fp
                return
        raise RuntimeError("cuckoo filter full — resize shard or raise capacity")

    def delete_many(self, keys: np.ndarray) -> int:
        removed = 0
        fp, i1, i2 = self._fp_idx(keys)
        for j in range(len(keys)):
            for idx in (int(i1[j]), int(i2[j])):
                row = self.buckets[idx]
                hit = np.flatnonzero(row == fp[j])
                if len(hit):
                    row[hit[0]] = 0
                    removed += 1
                    self.count -= 1
                    break
        return removed

    def load_factor(self) -> float:
        return self.count / (self.num_buckets * 4)

    def snapshot(self) -> dict:
        return {"buckets": self.buckets.copy(), "count": self.count, "seed": self.seed,
                "rng_state": self._rng.bit_generator.state}

    @classmethod
    def restore(cls, snap: dict) -> "CuckooFilter":
        cf = cls.__new__(cls)
        cf.buckets = snap["buckets"].copy()
        cf.num_buckets = cf.buckets.shape[0]
        cf.mask = _U64(cf.num_buckets - 1)
        cf.seed = snap["seed"]
        cf.count = snap["count"]
        cf._rng = np.random.Generator(np.random.PCG64())
        cf._rng.bit_generator.state = snap["rng_state"]
        return cf
