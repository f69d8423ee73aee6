"""Conformance gates: distributed engine vs single-process oracle simulator.

SURVEY.md §5 engine test plan items 3 (conformance: identical final URL-seen
set + crawl order), 4 (per-row image invariant: decoded-pixel exactness /
PSNR≥40dB + caption equality) and 5 (kill/resume → identical tables).
"""

import shutil

import numpy as np
import pyarrow.compute as pc
import pytest

from cloud_crawler_ray.functions.imaging import decode_image, psnr, synth_image
from cloud_crawler_ray.pipelines import oracle, synthweb as sw
from cloud_crawler_ray.pipelines import semantics as sem

CFG = sw.WebConfig(n_hosts=10, pages_per_host=100, n_seed_hosts=5)
P, S, K, WAVES = 4, 2, 25, 4


@pytest.fixture(scope="module")
def oracle_result():
    return oracle.run_oracle(CFG, num_partitions=P, wave_cap_per_partition=K, max_waves=WAVES)


@pytest.fixture(scope="module")
def engine_result(ray_session, tmp_path_factory):
    from cloud_crawler_ray.pipelines.wave import CrawlEngine

    root = str(tmp_path_factory.mktemp("crawl") / "engine")
    eng = CrawlEngine.start(root, CFG, num_partitions=P, num_shards=S, wave_cap_per_partition=K, fetch_buckets=4)
    eng.run(max_waves=WAVES)
    yield eng
    eng.shutdown_shards()


def _sorted_frontier(t):
    return t.take(pc.sort_indices(t, sort_keys=[("url_hash", "ascending")]))


class TestConformance:
    def test_seen_set_identical(self, engine_result, oracle_result):
        eng_seen = np.sort(engine_result.frontier.to_arrow(columns=["url_hash"])["url_hash"].to_numpy())
        assert np.array_equal(eng_seen, oracle_result.seen)

    def test_frontier_rows_identical(self, engine_result, oracle_result):
        ef = _sorted_frontier(engine_result.frontier.to_arrow())
        of = oracle_result.frontier
        assert ef.num_rows == of.num_rows
        for col in ["url", "host", "depth", "status", "attempt", "discovered_at", "parent_hash", "link_index", "partition_id"]:
            assert np.array_equal(ef[col].to_numpy(zero_copy_only=False), of[col].to_numpy(zero_copy_only=False)), col

    def test_crawl_order_identical(self, engine_result, oracle_result):
        eo = engine_result.crawl_order()
        oo = oracle_result.order
        assert eo.num_rows == oo.num_rows
        for col in ["fetch_seq", "wave", "vtime", "url_hash", "host", "proxy_id"]:
            assert np.array_equal(eo[col].to_numpy(zero_copy_only=False), oo[col].to_numpy(zero_copy_only=False)), col
        assert eo["ua"].to_pylist() == oo["ua"].to_pylist()  # UA threaded identically
        assert len(set(eo["proxy_id"].to_pylist())) > 1  # rotation actually spreads

    def test_all_outcome_classes_exercised(self, oracle_result):
        statuses = set(oracle_result.frontier["status"].to_pylist())
        assert {sem.DONE, sem.SKIPPED} <= statuses  # richer classes need bigger graphs


class TestImageInvariant:
    def test_images_match_oracle(self, engine_result, oracle_result):
        ei = engine_result.images.to_arrow()
        ei = ei.take(pc.sort_indices(ei, sort_keys=[("image_id", "ascending")]))
        oi = oracle_result.images
        assert ei.num_rows == oi.num_rows
        for col in ["image_id", "caption", "w", "h", "fmt", "phash"]:
            assert np.array_equal(ei[col].to_numpy(zero_copy_only=False), oi[col].to_numpy(zero_copy_only=False)), col
        assert ei["bytes"].to_pylist() == oi["bytes"].to_pylist()

    def test_decoded_pixel_invariant(self, engine_result):
        """Per-row invariant (input_hint): lossless → exact, lossy → PSNR≥40dB."""
        t = engine_result.images.to_arrow()
        n_lossy = 0
        for i in range(min(t.num_rows, 60)):
            row = {c: t[c][i].as_py() for c in ("image_id", "bytes", "w", "h", "fmt")}
            uh = int(row["image_id"], 16)
            p = sw.image_payload(uh, CFG)
            truth_src = sw._mix(uh, 3, CFG.seed)
            dec = decode_image(row["bytes"], row["w"], row["h"], row["fmt"])
            ref = synth_image(int(truth_src) >> 24, row["w"], row["h"])
            if row["fmt"] in ("raw", "png"):
                assert np.array_equal(dec, ref), row["image_id"]
            else:
                n_lossy += 1
                assert psnr(ref, dec) >= 40.0, row["image_id"]
        assert n_lossy > 0  # the PSNR path was actually exercised


class TestResume:
    def test_kill_restart_identical_tables(self, ray_session, oracle_result, tmp_path_factory):
        from cloud_crawler_ray.pipelines.wave import CrawlEngine

        root = str(tmp_path_factory.mktemp("crawl") / "resumed")
        eng1 = CrawlEngine.start(root, CFG, num_partitions=P, num_shards=S, wave_cap_per_partition=K, fetch_buckets=4)
        eng1.run(max_waves=2)  # "crash" after wave 1's commit
        eng1.shutdown_shards()

        eng2 = CrawlEngine.resume(root)
        assert eng2.frontier.latest_wave() == 1
        eng2.run(max_waves=WAVES)
        try:
            ef = _sorted_frontier(eng2.frontier.to_arrow())
            of = oracle_result.frontier
            assert ef.num_rows == of.num_rows
            for col in ["status", "attempt", "discovered_at", "parent_hash"]:
                assert np.array_equal(ef[col].to_numpy(), of[col].to_numpy()), col
            eo = eng2.crawl_order()
            assert np.array_equal(eo["url_hash"].to_numpy(), oracle_result.order["url_hash"].to_numpy())
            assert eng2.images.count_rows() == oracle_result.images.num_rows
        finally:
            eng2.shutdown_shards()


class TestCrashWindow:
    """Crash AFTER the images/order manifests committed but BEFORE the
    frontier manifest (the authoritative wave commit): the re-run must not
    double-register image rows and must still match the oracle."""

    def test_partial_commit_rerun(self, ray_session, oracle_result, tmp_path_factory):
        import os

        from cloud_crawler_ray.pipelines.wave import CrawlEngine

        root = str(tmp_path_factory.mktemp("crawl") / "crash")
        eng = CrawlEngine.start(root, CFG, num_partitions=P, num_shards=S, wave_cap_per_partition=K, fetch_buckets=4)
        eng.run(max_waves=2)  # waves 0..1 committed
        eng.shutdown_shards()

        # run wave 2, then simulate the crash window by deleting ONLY the
        # frontier manifest (images/order manifests stay committed)
        eng2 = CrawlEngine.resume(root)
        eng2.run_wave(2)
        eng2.shutdown_shards()
        os.remove(os.path.join(root, "frontier", "manifest-w00002.json"))

        eng3 = CrawlEngine.resume(root)
        assert eng3.frontier.latest_wave() == 1  # wave 2 looks uncommitted
        eng3.run(max_waves=WAVES)  # re-runs wave 2, then 3
        try:
            import numpy as np
            import pyarrow.compute as pc

            eng_seen = np.sort(eng3.frontier.to_arrow(columns=["url_hash"])["url_hash"].to_numpy())
            assert np.array_equal(eng_seen, oracle_result.seen)
            ei = eng3.images.to_arrow(columns=["image_id"])
            ids = ei["image_id"].to_pylist()
            assert len(ids) == len(set(ids)), "duplicate image rows after crash re-run"
            assert len(ids) == oracle_result.images.num_rows
            eo = eng3.crawl_order()
            assert np.array_equal(eo["url_hash"].to_numpy(), oracle_result.order["url_hash"].to_numpy())
        finally:
            eng3.shutdown_shards()


def test_dedup_shard_grows_past_initial_capacity(ray_session):
    """A shard started with a tiny filter capacity must resize itself as the
    seen set grows (ADVICE r1: fixed-at-bootstrap cuckoo capacity crashed the
    wave with "cuckoo filter full" once the crawl outgrew the seed frontier)."""
    import ray

    from cloud_crawler_ray.stages.crawl import DedupShard

    shard = DedupShard.remote(0, capacity=1024, seed=1)
    try:
        rng = np.random.Generator(np.random.PCG64(5))
        keys = rng.integers(1, 2**63, 50_000, dtype=np.uint64)
        ray.get(shard.bootstrap.remote(keys[:25_000]))
        ray.get(shard.add_seen.remote(keys[25_000:]))  # 50x the bootstrap capacity
        uniq = np.unique(keys)
        new = ray.get(shard.check_and_add.remote(uniq))
        assert not new.any(), "keys added before the resize were forgotten"
        stats = ray.get(shard.stats.remote())
        assert stats["exact"] == len(uniq)
        assert stats["cuckoo_load"] < 0.9
    finally:
        ray.kill(shard)


def test_crawl_order_ds_streams_sorted_with_preserve_order(engine_result):
    """Pins the crawl_order_ds consumption contract (wave.py docstring +
    bench.py's digest loop): with ``preserve_order = True`` the streamed
    batches arrive in the global (wave, vtime, url_hash) order, i.e.
    concatenating them reproduces driver-side crawl_order() exactly, with
    fetch_seq implied by stream position."""
    import pyarrow as pa
    import ray

    ctx = ray.data.DataContext.get_current()
    saved = ctx.execution_options.preserve_order
    ctx.execution_options.preserve_order = True
    try:
        cols = ["wave", "vtime", "url_hash"]
        batches = list(
            engine_result.crawl_order_ds(columns=cols).iter_batches(
                batch_size=64, batch_format="pyarrow"
            )
        )
    finally:
        ctx.execution_options.preserve_order = saved
    streamed = pa.concat_tables([b.select(cols) for b in batches])
    expect = engine_result.crawl_order().select(cols)
    assert streamed.num_rows == expect.num_rows
    assert streamed.equals(expect)


def test_checkrouter_bloom_precheck_skips_rpc(ray_session):
    """Rows whose shipped bloom snapshot says definitely-new must keep
    WITHOUT any shard RPC; maybe-seen rows still get the exact confirm
    (VERDICT r4 #7). Output must equal the RPC-only router's."""
    import numpy as np
    import pyarrow as pa
    import ray

    from cloud_crawler_ray.stages.crawl import CheckRouter, DedupShard
    from cloud_crawler_ray.state.bloom import BloomFilter

    n_shards = 2
    shards = [DedupShard.remote(s, capacity=1 << 12, seed=0) for s in range(n_shards)]
    seen = np.arange(0, 2000, 2, dtype=np.uint64)  # even keys are seen
    sid = seen % np.uint64(n_shards)
    ray.get([shards[s].bootstrap.remote(seen[sid == s]) for s in range(n_shards)])

    # counting proxy: forward contains() through a wrapper actor per shard
    @ray.remote
    class Counting:
        def __init__(self, inner):
            self.inner = inner
            self.calls = 0
            self.rows = 0

        def contains(self, h):
            self.calls += 1
            self.rows += len(h)
            return ray.get(self.inner.contains.remote(h))

        def counts(self):
            return self.calls, self.rows

    wrapped = [Counting.remote(s) for s in shards]
    snaps = ray.get([s.bloom_snapshot.remote(8 << 20) for s in shards])
    assert all(s is not None for s in snaps)
    bloom_ref = ray.put(snaps)

    probe = np.arange(0, 4000, 1, dtype=np.uint64)  # half seen, half new
    batch = pa.table({"url_hash": pa.array(probe, pa.uint64())})
    out_fast = CheckRouter(wrapped, bloom_ref)(batch)
    out_slow = CheckRouter(shards)(batch)
    assert out_fast.equals(out_slow)
    # kept = everything except the bootstrapped-seen keys
    kept = out_fast["url_hash"].to_numpy().astype(np.uint64)
    assert set(kept) == set(probe.tolist()) - set(seen.tolist())
    # the RPC only carried the maybe-seen fraction, not the whole batch
    rpc_rows = sum(ray.get(w.counts.remote())[1] for w in wrapped)
    assert len(seen) <= rpc_rows < len(probe), rpc_rows
    for s in shards:
        ray.kill(s)
