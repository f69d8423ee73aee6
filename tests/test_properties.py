"""Property-based tests (hypothesis) for the core kernels."""

import numpy as np
from hypothesis import given, settings, strategies as st

from cloud_crawler_ray.functions import hashing, imaging, urls
from cloud_crawler_ray.state.seen import SeenSet

url_path = st.text(alphabet="abcdefghijklmnopqrstuvwxyz0123456789/._-", min_size=0, max_size=40)
host = st.from_regex(r"[a-z][a-z0-9]{0,10}(\.[a-z]{2,5}){1,2}", fullmatch=True)


class TestHashProperties:
    @given(st.lists(st.text(min_size=0, max_size=200), min_size=1, max_size=50))
    @settings(max_examples=50, deadline=None)
    def test_batch_matches_scalar(self, strs):
        h = hashing.hash64(strs)
        for i in (0, len(strs) - 1):
            assert int(h[i]) == hashing.hash64_scalar(strs[i])

    @given(st.text(min_size=0, max_size=100), st.text(min_size=0, max_size=100))
    @settings(max_examples=100, deadline=None)
    def test_equal_iff_same(self, a, b):
        ha, hb = hashing.hash64_scalar(a), hashing.hash64_scalar(b)
        if a == b:
            assert ha == hb
        else:
            assert ha != hb  # 64-bit collision in 100 examples ≈ impossible


class TestUrlProperties:
    @given(st.builds(lambda s, h, p: f"{s}://{h}/{p}", st.sampled_from(["http", "https", "HTTP", "Https"]), host, url_path))
    @settings(max_examples=100, deadline=None)
    def test_canonicalize_idempotent(self, url):
        once = urls.canonicalize([url])[0].as_py()
        assert once is not None
        twice = urls.canonicalize([once])[0].as_py()
        assert once == twice

    @given(host, url_path)
    @settings(max_examples=50, deadline=None)
    def test_resolve_then_canonicalize_host_preserved(self, h, p):
        resolved = urls.resolve_links([f"/{p}"], "http", h)[0].as_py()
        canon = urls.canonicalize([resolved])[0].as_py()
        assert urls.extract_host([canon])[0].as_py() == h


class TestImagingProperties:
    @given(st.integers(0, 2**32 - 1), st.integers(16, 40), st.integers(16, 40))
    @settings(max_examples=20, deadline=None)
    def test_png_roundtrip_any_size(self, seed, w, h):
        img = imaging.synth_image(seed, w, h)
        assert np.array_equal(imaging.decode_png(imaging.encode_png(img)), img)

    @given(st.integers(0, 2**32 - 1))
    @settings(max_examples=20, deadline=None)
    def test_q6_psnr_bound(self, seed):
        img = imaging.synth_image(seed, 24, 24)
        rec = imaging.decode_q6(imaging.encode_q6(img), 24, 24)
        assert imaging.psnr(img, rec) >= 40.0


class TestSeenSetProperties:
    @given(st.lists(st.lists(st.integers(0, 300), min_size=0, max_size=50), min_size=1, max_size=10))
    @settings(max_examples=30, deadline=None)
    def test_matches_python_set(self, batches):
        s = SeenSet(merge_threshold=16)
        ref: set[int] = set()
        for batch in batches:
            arr = np.array(batch, np.uint64) if batch else np.zeros(0, np.uint64)
            new = s.check_and_add(arr)
            for j, k in enumerate(batch):
                expected = k not in ref and k not in batch[:j]
                assert bool(new[j]) == expected
                ref.add(k)
        assert len(s) == len(ref)


class TestPrefixFilterExactness:
    """The AllPairs/PPJoin prefix principle behind q_ngram_jaccard_dedup:
    any pair with Jaccard >= t MUST share a hash within both docs' prefixes
    (length |X| - ceil(t*|X|) + 1 over the ascending hash order) — the
    deterministic no-false-negative guarantee the SQL oracle relies on."""

    @given(
        st.lists(
            st.lists(st.integers(min_value=1, max_value=60), min_size=0, max_size=25),
            min_size=2,
            max_size=12,
        )
    )
    @settings(max_examples=200, deadline=None)
    def test_threshold_pairs_always_share_a_prefix_hash(self, docs):
        import numpy as np

        from cloud_crawler_ray.functions.text import jaccard

        t = 0.5
        sets = [np.unique(np.array(d, np.uint64)) for d in docs]

        def prefix(s):
            if len(s) == 0:
                return {0}
            p = len(s) - int(np.ceil(t * len(s))) + 1
            return set(np.sort(s)[:p].tolist())

        for i in range(len(sets)):
            for j in range(i + 1, len(sets)):
                if jaccard(sets[i], sets[j]) >= t:
                    assert prefix(sets[i]) & prefix(sets[j]), (
                        f"prefix filter missed a true pair: {sets[i]} vs {sets[j]}"
                    )


class TestNeardupBlockingCompleteness:
    """The spherical-k-means candidate blocking in neardup_pairs_block is
    COMPLETE: on any input, the blocked path emits exactly the pair set of
    the brute-force all-pairs scan (no false negatives by the triangle
    inequality; no false positives by exact verify)."""

    def _brute(self, ids, emb, tau=0.3):
        x = emb / np.where(np.linalg.norm(emb, axis=1, keepdims=True) == 0, 1,
                           np.linalg.norm(emb, axis=1, keepdims=True))
        sims = x @ x.T
        a, b = np.nonzero(sims >= tau)
        keep = a < b
        return {
            (int(ids[i]), int(ids[j]), round(float(sims[i, j]), 6))
            for i, j in zip(a[keep], b[keep])
        }

    def _check(self, emb, tau=0.3):
        from cloud_crawler_ray.queries import neardup_pairs_block

        ids = np.arange(len(emb)) * 3 + 7
        a, b, s = neardup_pairs_block(ids, emb, tau=tau, direct_below=16)  # force blocked path
        got = {(int(x), int(y), round(float(v), 6)) for x, y, v in zip(a, b, s)}
        want = self._brute(ids, emb, tau)
        missing = {(x, y) for x, y, _ in want} - {(x, y) for x, y, _ in got}
        extra = {(x, y) for x, y, _ in got} - {(x, y) for x, y, _ in want}
        assert not missing, f"blocking dropped {len(missing)} true pairs: {sorted(missing)[:5]}"
        assert not extra, f"blocking invented {len(extra)} pairs"
        assert got == want  # sims agree after rounding too

    def test_clustered_neardups(self):
        rng = np.random.default_rng(11)
        base = rng.normal(size=(40, 12))
        emb = np.concatenate([base[rng.integers(0, 40, 1200)] + rng.normal(scale=0.05, size=(1200, 12))])
        self._check(emb)

    def test_uniform_vectors(self):
        rng = np.random.default_rng(7)
        self._check(rng.normal(size=(700, 8)))

    def test_with_zero_vectors_and_duplicates(self):
        rng = np.random.default_rng(3)
        emb = rng.normal(size=(300, 6))
        emb[10] = 0.0
        emb[200] = emb[100]  # exact duplicate -> sim 1.0
        self._check(emb)

    def test_high_threshold(self):
        rng = np.random.default_rng(5)
        base = rng.normal(size=(25, 10))
        emb = base[rng.integers(0, 25, 600)] + rng.normal(scale=0.02, size=(600, 10))
        self._check(emb, tau=0.9)


class TestHistogramQuantileSketch:
    """The r5 approx-quantile redesign rests on ORDER-INVARIANCE: bucket
    counts add under any partitioning/merge order, so the distributed
    result equals a single-pass recompute bit-for-bit. Pin that property
    plus the rank-exactness bound."""

    @given(
        st.lists(st.floats(min_value=-1e3, max_value=1e3, allow_nan=False), min_size=1, max_size=400),
        st.integers(min_value=0, max_value=2**32 - 1),
        st.integers(min_value=1, max_value=7),
    )
    @settings(max_examples=60, deadline=None)
    def test_partition_invariance_and_rank_exactness(self, values, seed, n_parts):
        import numpy as np

        from cloud_crawler_ray.queries import _QSKETCH_SCALE, _hist_bucketize, _hist_quantile_pick

        vals = np.asarray(values, np.float64)
        rng = np.random.default_rng(seed)
        perm = rng.permutation(len(vals))
        # "distributed": bucketize shuffled partitions independently, merge counts
        merged: dict[int, int] = {}
        for part in np.array_split(vals[perm], n_parts):
            if not len(part):
                continue
            ub, cnt = np.unique(_hist_bucketize(part), return_counts=True)
            for b, c in zip(ub.tolist(), cnt.tolist()):
                merged[b] = merged.get(b, 0) + int(c)
        # single-pass reference
        ub, cnt = np.unique(_hist_bucketize(vals), return_counts=True)
        assert merged == dict(zip(ub.tolist(), cnt.tolist()))
        bk = np.array(sorted(merged), np.int64)
        cum = np.cumsum([merged[b] for b in bk.tolist()])
        total = int(cum[-1])
        srt = np.sort(vals)
        for pct in (50, 90, 99):
            est = _hist_quantile_pick(bk, cum, total, pct)
            true = srt[(pct * (total - 1)) // 100]  # nearest-rank exact value
            # rank-exact: the estimate is the true quantile's bucket floor
            assert est <= true and true - est <= 1.0 / _QSKETCH_SCALE + 1e-12
