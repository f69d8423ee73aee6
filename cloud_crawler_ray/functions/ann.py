"""Approximate nearest neighbor over embedding columns.

Baseline: brute-force cosine top-k (numpy matmul per batch against a
broadcast query matrix — queries.py::q_embedding_topk). Scale path here:
IVF (inverted-file) — k-means-style coarse centroids, vectors bucketed by
nearest centroid, queries probe only the ``nprobe`` nearest buckets. The
index is small (centroids + bucket ids) and is broadcast via ``ray.put``;
each ``map_batches`` task scores only its rows that fall in probed buckets.

Deterministic: centroids come from seeded k-means++-style init + a fixed
number of Lloyd iterations — no RNG state dependence across runs.
"""

from __future__ import annotations

import numpy as np


def _normalize(x: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(x, axis=-1, keepdims=True)
    return x / np.where(n == 0, 1, n)


class IVFIndex:
    """Coarse quantizer for cosine similarity (normalized vectors)."""

    def __init__(self, centroids: np.ndarray):
        self.centroids = _normalize(centroids.astype(np.float64))

    @classmethod
    def build(cls, vectors: np.ndarray, n_lists: int, seed: int = 13, iters: int = 8) -> "IVFIndex":
        x = _normalize(vectors.astype(np.float64))
        rng = np.random.Generator(np.random.PCG64(seed))
        # k-means++-style seeding
        idx = [int(rng.integers(len(x)))]
        for _ in range(n_lists - 1):
            sims = np.max(x @ x[idx].T, axis=1)
            d2 = np.maximum(0, 1 - sims)
            p = d2 / d2.sum() if d2.sum() > 0 else np.full(len(x), 1 / len(x))
            idx.append(int(rng.choice(len(x), p=p)))
        c = x[idx]
        for _ in range(iters):  # Lloyd iterations (fixed count → deterministic)
            assign = np.argmax(x @ c.T, axis=1)
            for j in range(n_lists):
                m = assign == j
                if m.any():
                    c[j] = x[m].mean(axis=0)
            c = _normalize(c)
        return cls(c)

    def assign(self, vectors: np.ndarray) -> np.ndarray:
        """Nearest-centroid list id per vector."""
        return np.argmax(_normalize(vectors.astype(np.float64)) @ self.centroids.T, axis=1)

    def probe_lists(self, query: np.ndarray, nprobe: int) -> np.ndarray:
        sims = _normalize(query.astype(np.float64)) @ self.centroids.T
        return np.argsort(-sims)[:nprobe]


def brute_topk(query: np.ndarray, vectors: np.ndarray, ids: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
    """Exact cosine top-k: (ids, sims) sorted by (-sim, id)."""
    q = _normalize(query.astype(np.float64))
    sims = _normalize(vectors.astype(np.float64)) @ q
    order = np.lexsort((ids, -sims))[:k]
    return ids[order], sims[order]
