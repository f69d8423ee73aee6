"""Exact URL-seen set per dedup shard — sorted uint64 array + pending buffer.

The authority for first-discovery-wins dedup. The reference's semantics are
an *exact* anti-join against all previously enqueued URLs
(SqlQueueTaskProvider.scala:58-68); bloom/cuckoo only pre-filter. Membership
is ``np.searchsorted`` over a sorted base array (O(log n), vectorized) plus
an ``np.isin`` over a small unsorted pending buffer that is merged into the
base when it grows past ``merge_threshold``.

Memory: 8 bytes/key → a 10^10-URL frontier is 80 GB total, 312 MB per shard
at S=256 — the sharding math the design relies on (SURVEY.md §4.4).
"""

from __future__ import annotations

import numpy as np

_U64 = np.uint64


class SeenSet:
    def __init__(self, merge_threshold: int = 262_144):
        self.base = np.zeros(0, _U64)  # sorted
        self.pending = np.zeros(0, _U64)  # small, unsorted
        self.merge_threshold = merge_threshold

    def __len__(self) -> int:
        return len(self.base) + len(self.pending)

    def contains_many(self, keys: np.ndarray) -> np.ndarray:
        keys = keys.astype(_U64)
        if len(keys) == 0:
            return np.zeros(0, bool)
        out = np.zeros(len(keys), bool)
        if len(self.base):
            idx = np.searchsorted(self.base, keys)
            idx_c = np.minimum(idx, len(self.base) - 1)
            out |= self.base[idx_c] == keys
        if len(self.pending):
            out |= np.isin(keys, self.pending)
        return out

    def add_many(self, keys: np.ndarray) -> None:
        """Add keys (caller guarantees they are new and unique)."""
        if len(keys) == 0:
            return
        self.pending = np.concatenate([self.pending, keys.astype(_U64)])
        if len(self.pending) >= self.merge_threshold:
            self._merge()

    def _merge(self) -> None:
        self.base = np.unique(np.concatenate([self.base, self.pending]))
        self.pending = np.zeros(0, _U64)

    def check_and_add(self, keys: np.ndarray) -> np.ndarray:
        """bool[n]: True = newly added (first discovery), False = already seen.

        Duplicates *within* ``keys`` keep only the first occurrence — mirrors
        the reference's distinct-before-insert (SqlQueueTaskProvider.scala:68).
        """
        keys = keys.astype(_U64)
        seen = self.contains_many(keys)
        # first-occurrence mask within the batch
        _, first_idx = np.unique(keys, return_index=True)
        first = np.zeros(len(keys), bool)
        first[first_idx] = True
        new = ~seen & first
        self.add_many(keys[new])
        return new

    def snapshot(self) -> dict:
        self._merge()
        return {"base": self.base.copy()}

    @classmethod
    def restore(cls, snap: dict, merge_threshold: int = 262_144) -> "SeenSet":
        s = cls(merge_threshold)
        s.base = snap["base"].copy()
        return s
