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


class TestQuantileSketch:
    def test_rank_error_band_under_distributed_merge(self):
        import numpy as np

        from cloud_crawler_ray.functions.sketches import QuantileSketch

        rng = np.random.default_rng(0)
        for data in (
            rng.uniform(0, 1, 200_000),
            rng.lognormal(0, 2, 200_000),
            np.arange(150_000, dtype=float),          # sorted adversary
            np.arange(150_000, dtype=float)[::-1].copy(),
        ):
            parts = np.array_split(data, 64)  # the per-batch sketch shape
            merged = None
            for p in parts:
                s = QuantileSketch().add_many(p)
                s = QuantileSketch.deserialize(s.serialize())  # wire round-trip
                merged = s if merged is None else merged.merge(s)
            srt = np.sort(data)
            for q in (0.01, 0.1, 0.5, 0.9, 0.99):
                est = merged.quantile(q)
                rank = np.searchsorted(srt, est, side="right") / len(srt)
                assert abs(rank - q) < 0.01, f"rank error {abs(rank-q):.4f} at q={q}"
            assert abs(merged.count() - len(data)) / len(data) < 0.01

    def test_deterministic_across_runs(self):
        import numpy as np

        from cloud_crawler_ray.functions.sketches import QuantileSketch

        rng = np.random.default_rng(7)
        data = rng.normal(size=100_000)
        a = QuantileSketch().add_many(data)
        b = QuantileSketch().add_many(data)
        assert a.serialize() == b.serialize()

    def test_approx_quantiles_query(self, ray_session):
        import duckdb
        import numpy as np

        from cloud_crawler_ray import queries as q

        sf = "/root/testdata/sf0.001"
        t = q.QUERIES["approx_quantiles"](sf)
        con = duckdb.connect()
        exact = con.execute(
            f"SELECT quantile_disc(value, [0.5, 0.9, 0.99]) FROM read_parquet('{sf}/events.parquet')"
        ).fetchone()[0]
        vals = con.execute(
            f"SELECT value FROM read_parquet('{sf}/events.parquet') ORDER BY value"
        ).df()["value"].to_numpy()
        for col, qq, ex in zip(("p50", "p90", "p99"), (0.5, 0.9, 0.99), exact):
            est = t[col][0].as_py()
            rank = np.searchsorted(vals, est, side="right") / len(vals)
            assert abs(rank - qq) < 0.02, f"{col}: rank {rank:.3f} vs {qq}"

    def test_grouped_quantiles_query(self, ray_session):
        import duckdb
        import numpy as np

        from cloud_crawler_ray import queries as q

        sf = "/root/testdata/sf0.001"
        t = q.QUERIES["grouped_quantiles"](sf).to_pandas().set_index("event_type")
        con = duckdb.connect()
        df = con.execute(
            f"SELECT event_type, value FROM read_parquet('{sf}/events.parquet')"
        ).df()
        for etype, g in df.groupby("event_type"):
            vals = np.sort(g["value"].to_numpy())
            for col, qq in (("p50", 0.5), ("p95", 0.95)):
                est = t.loc[etype, col]
                rank = np.searchsorted(vals, est, side="right") / len(vals)
                assert abs(rank - qq) < 0.02, f"{etype}/{col}: rank {rank:.3f}"
            assert abs(t.loc[etype, "n"] - len(vals)) / len(vals) < 0.01


class TestKMV:
    """q_approx_distinct_users' k-minimum-values sketch: order-invariant,
    mergeable, and inside its ~1/sqrt(k-2) error band."""

    def test_error_band_and_exact_small(self):
        import numpy as np

        from cloud_crawler_ray.functions.hashing import splitmix64

        K = 64
        rng = np.random.default_rng(3)

        def kmv(ids):
            u = np.sort(np.unique(splitmix64(ids.astype(np.uint64))))[:K]
            if len(u) < K:
                return len(u)
            return int(np.floor((K - 1) * (18446744073709551616.0 / float(u[K - 1]))))

        small = np.arange(40, dtype=np.uint64)
        assert kmv(np.concatenate([small, small])) == 40  # exact under k
        for n in (1_000, 100_000):
            ids = rng.integers(0, 10**12, n, dtype=np.uint64)
            true = len(np.unique(splitmix64(ids)))
            est = kmv(ids)
            assert abs(est - true) / true < 4 / np.sqrt(K - 2), (n, est, true)

    def test_merge_order_invariant(self):
        import numpy as np

        from cloud_crawler_ray.functions.hashing import splitmix64

        K = 64
        rng = np.random.default_rng(5)
        ids = rng.integers(0, 10**9, 50_000, dtype=np.uint64)
        h = splitmix64(ids)
        # k-smallest of the union == k-smallest over any partition merge order
        whole = np.sort(np.unique(h))[:K]
        for seed in (0, 1, 2):
            perm = np.random.default_rng(seed).permutation(len(h))
            parts = np.array_split(h[perm], 17)
            partials = [np.sort(np.unique(p))[:K] for p in parts]
            merged = np.sort(np.unique(np.concatenate(partials)))[:K]
            assert (merged == whole).all()
