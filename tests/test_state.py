"""Unit tests for stateful structures (no Ray needed)."""

import numpy as np
import pytest

from cloud_crawler_ray.state.bloom import BloomFilter
from cloud_crawler_ray.state.cuckoo import CuckooFilter
from cloud_crawler_ray.state.seen import SeenSet
from cloud_crawler_ray.state.tokenbucket import TokenBucket, politeness_delays

RNG = np.random.Generator(np.random.PCG64(1))


class TestBloom:
    def test_no_false_negatives(self):
        bf = BloomFilter(10_000)
        keys = RNG.integers(0, 2**63, 10_000, dtype=np.uint64)
        bf.add_many(keys)
        assert bf.contains_many(keys).all()

    def test_false_positive_rate(self):
        bf = BloomFilter(10_000)
        keys = RNG.integers(0, 2**63, 10_000, dtype=np.uint64)
        bf.add_many(keys)
        probe = RNG.integers(2**63, 2**64 - 1, 20_000, dtype=np.uint64)
        fp = bf.contains_many(probe).mean()
        assert fp < 0.02, fp

    def test_snapshot_restore(self):
        bf = BloomFilter(1000)
        keys = np.arange(100, dtype=np.uint64) * 7919
        bf.add_many(keys)
        bf2 = BloomFilter.restore(bf.snapshot())
        assert bf2.contains_many(keys).all()
        assert np.array_equal(bf.words, bf2.words)


class TestCuckoo:
    def test_membership(self):
        cf = CuckooFilter(50_000)
        keys = RNG.integers(0, 2**63, 40_000, dtype=np.uint64)
        keys = np.unique(keys)
        cf.add_many(keys)
        assert cf.contains_many(keys).all()
        probe = RNG.integers(2**63, 2**64 - 1, 40_000, dtype=np.uint64)
        fp = cf.contains_many(probe).mean()
        assert fp < 0.005, fp

    def test_delete(self):
        cf = CuckooFilter(1000)
        keys = np.unique(RNG.integers(0, 2**63, 500, dtype=np.uint64))
        cf.add_many(keys)
        removed = cf.delete_many(keys[:100])
        assert removed == 100
        assert not cf.contains_many(keys[:100]).any() or cf.contains_many(keys[:100]).mean() < 0.05
        assert cf.contains_many(keys[100:]).all()

    def test_snapshot_restore(self):
        cf = CuckooFilter(1000)
        keys = np.unique(RNG.integers(0, 2**63, 500, dtype=np.uint64))
        cf.add_many(keys)
        cf2 = CuckooFilter.restore(cf.snapshot())
        assert cf2.contains_many(keys).all()

    def test_full_raises(self):
        cf = CuckooFilter(32)
        with pytest.raises(RuntimeError):
            cf.add_many(np.unique(RNG.integers(0, 2**64 - 1, 4000, dtype=np.uint64)))


class TestSeenSet:
    def test_exactness_vs_python_set(self):
        s = SeenSet(merge_threshold=64)
        oracle: set[int] = set()
        for _ in range(30):
            batch = RNG.integers(0, 500, 200, dtype=np.uint64)
            new = s.check_and_add(batch)
            for j, k in enumerate(batch.tolist()):
                expect_new = k not in oracle and k not in batch[:j].tolist()
                assert new[j] == expect_new, (j, k)
                oracle.add(k)
        assert len(s) == len(oracle)

    def test_within_batch_first_wins(self):
        s = SeenSet()
        new = s.check_and_add(np.array([5, 5, 7, 5, 7], dtype=np.uint64))
        assert new.tolist() == [True, False, True, False, False]

    def test_snapshot_restore(self):
        s = SeenSet()
        s.check_and_add(np.arange(1000, dtype=np.uint64))
        s2 = SeenSet.restore(s.snapshot())
        assert s2.contains_many(np.arange(1000, dtype=np.uint64)).all()
        assert not s2.contains_many(np.array([5000], dtype=np.uint64))[0]


class TestTokenBucket:
    def test_deterministic_schedule(self):
        b1 = TokenBucket(123, 0, 1000, 200)
        b2 = TokenBucket(123, 0, 1000, 200)
        assert np.array_equal(b1.schedule(10), b2.schedule(10))

    def test_rate_bound(self):
        b = TokenBucket(9, 1, 1000, 200, capacity=1)
        t = b.schedule(100)
        gaps = np.diff(t)
        assert (gaps >= 800).all() and (gaps <= 1200).all()
        assert t[0] == 0

    def test_capacity_parallelism(self):
        b1 = TokenBucket(9, 1, 1000, 0, capacity=1)
        b4 = TokenBucket(9, 1, 1000, 0, capacity=4)
        t1, t4 = b1.schedule(40), b4.schedule(40)
        assert t4.max() < t1.max()  # 4 slots finish ~4x sooner

    def test_wave_changes_schedule(self):
        d0 = politeness_delays(7, 0, 5, 100, 50)
        d1 = politeness_delays(7, 1, 5, 100, 50)
        assert not np.array_equal(d0, d1)
