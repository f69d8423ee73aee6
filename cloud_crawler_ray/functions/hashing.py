"""Deterministic vectorized 64-bit hashing over Arrow string/binary arrays.

The engine's URL-seen set, dedup shards, frontier partitioning and golden
crawl-order files all key on a 64-bit hash. The reference keeps raw URL
strings and relies on DB uniqueness (SqlQueueTaskProvider.scala:56-78); a
columnar engine wants a fixed-width key. The hash must be

* deterministic across runs/processes/versions (checkpoints + golden files),
* vectorized (no per-byte Python loop in the hot path).

Implementation: pad each string to a whole number of 8-byte words, view as a
``(n, n_words)`` uint64 matrix, and fold word-columns through a splitmix64
compression function (a short Python loop over *columns*, each step fully
vectorized over the batch). Collision quality is ample for 10^10 keys at
64 bits given splitmix64's avalanche behavior.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_U64 = np.uint64
_GOLDEN = _U64(0x9E3779B97F4A7C15)
_M1 = _U64(0xBF58476D1CE4E5B9)
_M2 = _U64(0x94D049BB133111EB)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public-domain constants).

    uint64 wraparound is the point — suppress numpy's scalar-overflow warning
    (arrays wrap silently; 0-d/scalar inputs would warn).
    """
    with np.errstate(over="ignore"):
        z = (x + _GOLDEN).astype(_U64)
        z = (z ^ (z >> _U64(30))) * _M1
        z = (z ^ (z >> _U64(27))) * _M2
        return z ^ (z >> _U64(31))


def _string_buffers(arr: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """Return (offsets:int64[n+1], data:uint8[...]) for a string/binary array."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    t = arr.type
    if pa.types.is_large_string(t) or pa.types.is_large_binary(t):
        odt = np.int64
    elif pa.types.is_string(t) or pa.types.is_binary(t):
        odt = np.int32
    else:  # cast anything else (e.g. dictionary) to string
        arr = arr.cast(pa.string())
        odt = np.int32
    bufs = arr.buffers()
    offsets = np.frombuffer(bufs[1], dtype=odt)[arr.offset : arr.offset + len(arr) + 1]
    data = np.frombuffer(bufs[2], dtype=np.uint8) if bufs[2] is not None else np.zeros(0, np.uint8)
    return offsets.astype(np.int64), data


def hash64(arr: pa.Array | pa.ChunkedArray | np.ndarray | list, seed: int = 0) -> np.ndarray:
    """64-bit hash of each string/binary element → uint64 ndarray.

    Nulls hash to 0 (the engine never hashes nulls in the hot path).
    """
    if isinstance(arr, (list, np.ndarray)):
        arr = pa.array(arr)
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    if n == 0:
        return np.zeros(0, _U64)
    null_mask = None
    if arr.null_count:
        null_mask = np.asarray(arr.is_null())
        arr = arr.fill_null("" if pa.types.is_string(arr.type) or pa.types.is_large_string(arr.type) else b"")
    offsets, data = _string_buffers(arr)
    lengths = offsets[1:] - offsets[:-1]
    maxlen = int(lengths.max()) if n else 0
    n_words = max(1, (maxlen + 7) // 8)
    padded = np.zeros((n, n_words * 8), np.uint8)
    if maxlen > 0:
        pos = np.arange(maxlen, dtype=np.int64)
        idx = offsets[:-1, None] + pos[None, :]
        mask = pos[None, :] < lengths[:, None]
        # clip so gather stays in-bounds for masked-out cells
        np.clip(idx, 0, max(0, len(data) - 1), out=idx)
        gathered = data[idx] if len(data) else np.zeros_like(idx, np.uint8)
        padded[:, :maxlen] = np.where(mask, gathered, 0)
    words = padded.view("<u8").reshape(n, n_words)
    words_needed = (lengths + 7) // 8  # fold only this string's own words
    h = np.full(n, _U64(seed) ^ _GOLDEN, _U64)
    for j in range(n_words):
        h = np.where(j < words_needed, splitmix64(h ^ words[:, j]), h)
    h = splitmix64(h ^ lengths.astype(_U64))
    if null_mask is not None:
        h[null_mask] = 0
    return h


def hash64_scalar(s: str | bytes, seed: int = 0) -> int:
    """Scalar convenience wrapper (oracle simulator / tests)."""
    return int(hash64([s], seed=seed)[0])


def combine_hashes(*cols: np.ndarray) -> np.ndarray:
    """Combine several uint64 hash columns into one (order-sensitive)."""
    h = np.full(len(cols[0]), _GOLDEN, _U64)
    for c in cols:
        h = splitmix64(h ^ c.astype(_U64))
    return h
