"""HLL accuracy + merge associativity."""

import numpy as np

from cloud_crawler_ray.functions.sketches import HyperLogLog

RNG = np.random.Generator(np.random.PCG64(5))


def test_accuracy_bands():
    for n in (100, 5_000, 200_000):
        keys = RNG.integers(0, 2**63, n, dtype=np.uint64)
        exact = len(np.unique(keys))
        est = HyperLogLog().add_many(keys).estimate()
        assert abs(est - exact) / exact < 0.05, (n, est, exact)


def test_merge_equals_union():
    a_keys = RNG.integers(0, 2**62, 50_000, dtype=np.uint64)
    b_keys = RNG.integers(2**61, 2**63, 50_000, dtype=np.uint64)
    merged = HyperLogLog().add_many(a_keys).merge(HyperLogLog().add_many(b_keys))
    both = HyperLogLog().add_many(np.concatenate([a_keys, b_keys]))
    assert np.array_equal(merged.registers, both.registers)


def test_serialize_roundtrip():
    h = HyperLogLog().add_many(np.arange(1000, dtype=np.uint64))
    h2 = HyperLogLog.deserialize(h.serialize())
    assert h2.estimate() == h.estimate()
