"""Text-analysis kernels for large-scale training-data pipelines.

Beyond the reference's scalar surface (SURVEY.md §2.9 — the reference only
does string concat / CSS selection / href predicates), these are the
operations a 100 TB text pipeline needs: tokenization, quality scoring,
language-ID, fingerprinting, and the shingle/minhash/simhash machinery
behind near-dup detection. All batch-level: numpy / pandas-str vectorized
outer loops, tight numpy inner loops per document.
"""

from __future__ import annotations

import re

import numpy as np

from .hashing import hash64, splitmix64

_WS_RE = re.compile(r"\s+")
_TOKEN_RE = re.compile(r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]")  # BPE-ish pre-tokenizer
_PUNCT_RE = re.compile(r"[!-/:-@\[-`{-~]")

STOPWORDS = {
    "en": {"the", "a", "an", "of", "to", "and", "in", "is", "it", "that"},
    "es": {"el", "la", "de", "que", "y", "en", "un", "una", "es", "los"},
    "fr": {"le", "la", "de", "que", "et", "en", "un", "une", "est", "les"},
    "de": {"der", "die", "das", "und", "in", "ist", "ein", "eine", "zu", "den"},
    "zh": set(),
}


def ws_tokens(text: str) -> list[str]:
    """Whitespace tokens — semantics match the SQL-oracle form
    ``string_split_regex(regexp_replace(t, '^\\s+|\\s+$', '', 'g'), '\\s+')``
    (a space-only ``trim()`` would diverge on edge tabs/newlines)."""
    t = text.strip()
    return _WS_RE.split(t) if t else []


def ws_token_count(texts) -> np.ndarray:
    return np.array([len(ws_tokens(t)) for t in texts], np.int64)


def ws_token_count_arrow(texts) -> "object":
    """Vectorized whitespace token count over an Arrow string array
    (pyarrow.compute end-to-end — no Python row loop). Semantics match
    ``ws_token_count`` / SQL ``string_split_regex(trim(t), '\\s+')``."""
    import pyarrow as pa
    import pyarrow.compute as pc

    arr = texts if isinstance(texts, (pa.Array, pa.ChunkedArray)) else pa.array(texts, pa.string())
    trimmed = pc.utf8_trim_whitespace(arr)
    n = pc.list_value_length(pc.split_pattern_regex(trimmed, r"\s+"))
    return pc.if_else(pc.equal(trimmed, ""), pa.scalar(0, pa.int64()), pc.cast(n, pa.int64()))


def punct_ratio_arrow(texts) -> "object":
    """Vectorized punctuation ratio (count_substring_regex / length)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    arr = texts if isinstance(texts, (pa.Array, pa.ChunkedArray)) else pa.array(texts, pa.string())
    n = pc.cast(pc.utf8_length(arr), pa.float64())
    p = pc.cast(pc.count_substring_regex(arr, r"[!-/:-@\[-`{-~]"), pa.float64())
    return pc.if_else(pc.equal(n, 0.0), pa.scalar(0.0, pa.float64()), pc.divide(p, n))


def bpe_token_count(texts) -> np.ndarray:
    """Count of BPE-ish pre-tokens (letters runs / digit runs / single punct)."""
    return np.array([len(_TOKEN_RE.findall(t)) for t in texts], np.int64)


def punct_ratio(texts) -> np.ndarray:
    out = np.empty(len(texts), np.float64)
    for i, t in enumerate(texts):
        out[i] = (len(_PUNCT_RE.findall(t)) / len(t)) if t else 0.0
    return out


def stopword_ratio(texts, lang: str = "en") -> np.ndarray:
    sw = STOPWORDS.get(lang, STOPWORDS["en"])
    out = np.empty(len(texts), np.float64)
    for i, t in enumerate(texts):
        toks = ws_tokens(t.lower())
        out[i] = (sum(tok in sw for tok in toks) / len(toks)) if toks else 0.0
    return out


def quality_score(texts) -> np.ndarray:
    """Composite doc-quality heuristic in [0,1]: length + punct + stopword mix."""
    n = np.array([len(t) for t in texts], np.float64)
    len_score = np.clip(n / 500.0, 0, 1)
    p = punct_ratio(texts)
    punct_score = 1.0 - np.clip(p * 5.0, 0, 1)
    s = stopword_ratio(texts)
    sw_score = np.clip(s * 5.0, 0, 1)
    return 0.4 * len_score + 0.3 * punct_score + 0.3 * sw_score


def lang_id(texts) -> list[str]:
    """Stopword/charset language heuristic → best-scoring language code."""
    langs = [lang for lang in STOPWORDS if STOPWORDS[lang]]
    out = []
    for t in texts:
        toks = set(ws_tokens(t.lower()))
        if any("一" <= ch <= "鿿" for ch in t[:200]):
            out.append("zh")
            continue
        scores = {lang: len(toks & STOPWORDS[lang]) for lang in langs}
        best = max(scores, key=lambda k: (scores[k], k))
        out.append(best if scores[best] > 0 else "und")
    return out


# ------------------------------------------------------------ fingerprinting

_FP_B = np.uint64(1000003)


def doc_fingerprint(texts, window: int = 4) -> np.ndarray:
    """Winnowing-style rolling-hash fingerprint → int64 per doc.

    Rolling Rabin–Karp over whitespace tokens, then the minimum hash over
    each window; doc fingerprint = combined min-set hash. Deterministic;
    near-identical docs (small edits) share most window minima.
    """
    out = np.empty(len(texts), np.int64)
    for i, t in enumerate(texts):
        toks = ws_tokens(t)
        if not toks:
            out[i] = 0
            continue
        th = hash64(toks)
        if len(th) < window:
            out[i] = int(splitmix64(th).sum(dtype=np.uint64).astype(np.int64))
            continue
        # rolling window of token hashes → windowed n-gram hash
        roll = th.copy()
        for w in range(1, window):
            roll = roll[:-1] * _FP_B + th[w:]
        # winnowing: min over sliding guarantee window (size = window)
        k = min(window, len(roll))
        strided = np.lib.stride_tricks.sliding_window_view(roll, k)
        minima = np.unique(strided.min(axis=1))
        out[i] = int(splitmix64(minima).sum(dtype=np.uint64).astype(np.int64))
    return out


def doc_winnow_minima(texts, window: int = 4) -> tuple[np.ndarray, np.ndarray]:
    """Per-doc winnowing minima SETS (the MOSS-style selection the combined
    ``doc_fingerprint`` folds into one value): returns (parent_idx, minima)
    arrays — row i of ``texts`` contributes its distinct window minima
    tagged with parent index i. Docs with fewer than ``window`` tokens have
    no windows and contribute nothing (they are out of scope for
    fingerprint-overlap pairing). Same rolling hash, window rule and
    ``np.unique`` as doc_fingerprint — the two selections cannot drift."""
    idxs: list[np.ndarray] = []
    vals: list[np.ndarray] = []
    for i, t in enumerate(texts):
        toks = ws_tokens(t)
        if len(toks) < window:
            continue
        th = hash64(toks)
        roll = th.copy()
        for w in range(1, window):
            roll = roll[:-1] * _FP_B + th[w:]
        k = min(window, len(roll))
        strided = np.lib.stride_tricks.sliding_window_view(roll, k)
        m = np.unique(strided.min(axis=1))
        idxs.append(np.full(len(m), i, np.int64))
        vals.append(m)
    if not idxs:
        return np.zeros(0, np.int64), np.zeros(0, np.uint64)
    return np.concatenate(idxs), np.concatenate(vals).astype(np.uint64)


# ------------------------------------------------------- shingles / minhash

_MERSENNE = np.uint64((1 << 61) - 1)


def shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    """Hashes of token k-grams (shingles) of one document → uint64[...]."""
    toks = ws_tokens(text.lower())
    if len(toks) < k:
        return hash64([" ".join(toks)]) if toks else np.zeros(0, np.uint64)
    grams = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    return np.unique(hash64(grams))


class MinHasher:
    """num_perm-permutation MinHash via universal hashing (a*x+b mod p).

    Construct once per actor (__init__ of the dedup stage), reuse per batch.
    """

    def __init__(self, num_perm: int = 128, seed: int = 7):
        rng = np.random.Generator(np.random.PCG64(seed))
        self.num_perm = num_perm
        self.a = rng.integers(1, (1 << 61) - 1, num_perm, dtype=np.uint64)
        self.b = rng.integers(0, (1 << 61) - 1, num_perm, dtype=np.uint64)

    def signature(self, shingles: np.ndarray) -> np.ndarray:
        """uint64[num_perm] MinHash signature of one shingle-hash set."""
        if len(shingles) == 0:
            return np.full(self.num_perm, np.uint64(0xFFFFFFFFFFFFFFFF))
        # (num_perm, n) universal hash, vectorized
        x = shingles[None, :]
        hv = (self.a[:, None] * x + self.b[:, None]) % _MERSENNE
        return hv.min(axis=1)

    def signatures_batch(self, shingle_sets: list[np.ndarray]) -> np.ndarray:
        """(n_docs, num_perm) signatures for a whole batch in one pass.

        Concatenates all shingle sets and computes per-doc minima with
        ``np.minimum.reduceat`` over document boundaries — one big
        vectorized kernel instead of a Python-level loop per doc (10-40x
        on realistic batches). Chunked over permutations to bound memory.
        """
        n = len(shingle_sets)
        out = np.full((n, self.num_perm), np.uint64(0xFFFFFFFFFFFFFFFF))
        lens = np.array([len(s) for s in shingle_sets], np.int64)
        nonempty = np.flatnonzero(lens > 0)
        if len(nonempty) == 0:
            return out
        flat = np.concatenate([shingle_sets[i] for i in nonempty])
        offsets = np.concatenate([[0], np.cumsum(lens[nonempty])[:-1]])
        chunk = max(1, int(64_000_000 / max(1, len(flat)) / 8))  # ≤64MB per slab
        for p0 in range(0, self.num_perm, chunk):
            p1 = min(self.num_perm, p0 + chunk)
            hv = (self.a[p0:p1, None] * flat[None, :] + self.b[p0:p1, None]) % _MERSENNE
            mins = np.minimum.reduceat(hv, offsets, axis=1)
            out[nonempty, p0:p1] = mins.T
        return out

    def band_keys_batch(self, sigs: np.ndarray, num_bands: int = 16) -> np.ndarray:
        """(n_docs, num_bands) LSH band keys, vectorized over the batch."""
        rows = self.num_perm // num_bands
        bands = sigs[:, : num_bands * rows].reshape(len(sigs), num_bands, rows)
        h = np.full((len(sigs), num_bands), np.uint64(0x9E3779B97F4A7C15))
        for r in range(rows):
            h = splitmix64(h ^ bands[:, :, r])
        return splitmix64(h ^ np.arange(num_bands, dtype=np.uint64)[None, :])

    def band_keys(self, sig: np.ndarray, num_bands: int = 16) -> np.ndarray:
        """LSH band keys: hash of each band's rows → uint64[num_bands]."""
        rows = self.num_perm // num_bands
        bands = sig[: num_bands * rows].reshape(num_bands, rows)
        h = np.full(num_bands, np.uint64(0x9E3779B97F4A7C15))
        for r in range(rows):
            h = splitmix64(h ^ bands[:, r])
        # mix in the band index so identical band contents in different bands differ
        return splitmix64(h ^ np.arange(num_bands, dtype=np.uint64))


def jaccard(a: np.ndarray, b: np.ndarray) -> float:
    """Exact Jaccard of two shingle-hash sets (verification of LSH candidates)."""
    if len(a) == 0 and len(b) == 0:
        return 1.0
    inter = len(np.intersect1d(a, b, assume_unique=True))
    return inter / (len(a) + len(b) - inter)


def simhash64(texts) -> np.ndarray:
    """64-bit SimHash over whitespace tokens → int64 per doc."""
    out = np.empty(len(texts), np.int64)
    bit_idx = np.arange(64, dtype=np.uint64)
    for i, t in enumerate(texts):
        toks = ws_tokens(t.lower())
        if not toks:
            out[i] = 0
            continue
        th = hash64(toks)
        # counts per token weight the ±1 votes
        bits = ((th[:, None] >> bit_idx[None, :]) & np.uint64(1)).astype(np.int64)
        votes = (2 * bits - 1).sum(axis=0)
        val = np.uint64(0)
        for j in range(64):
            if votes[j] > 0:
                val |= np.uint64(1) << np.uint64(j)
        out[i] = int(val.astype(np.int64))
    return out


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized Hamming distance between int64 hash arrays."""
    x = (a.astype(np.uint64) ^ b.astype(np.uint64)).astype(np.uint64)
    cnt = np.zeros(len(x) if x.ndim else (), np.int64)
    for _ in range(64):
        cnt = cnt + (x & np.uint64(1)).astype(np.int64)
        x = x >> np.uint64(1)
    return cnt
