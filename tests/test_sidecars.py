"""Round-3 partition sidecars (VERDICT r2 #1-#4): the WAIT-backlog sidecar
that bounds the claim scan, the sorted-keys sidecar behind insert/push
anti-join confirms and hash→row lookups, and the O(wave) wave_done_urls.

Every test checks the sidecar-derived answer against the ground truth
recomputed by a full partition fold — the invariant the incremental
maintenance must preserve across waves, compactions, inserts and pushes.
"""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from cloud_crawler_ray.pipelines import semantics as sem, synthweb as sw
from cloud_crawler_ray.pipelines.wave import CrawlEngine
from cloud_crawler_ray.sources import frontier as fsrc

CFG = sw.WebConfig(n_hosts=10, pages_per_host=80, n_seed_hosts=6, max_links=4, seed=5)
P, S, K = 4, 2, 25


@pytest.fixture(scope="module")
def crawl(ray_session, tmp_path_factory):
    """A crawl long enough to trigger compaction (compact_files=3) so both
    the incremental and the rebuild sidecar paths are exercised."""
    root = str(tmp_path_factory.mktemp("sidecars") / "job")
    eng = CrawlEngine.start(
        root, CFG, num_partitions=P, num_shards=S, wave_cap_per_partition=K, compact_files=3
    )
    eng.run(max_waves=6)
    eng.push_tasks([f"http://host{i:03d}.example/p{70 + i}" for i in range(8)])
    yield eng
    eng.shutdown_shards()


class TestWaitSidecar:
    def test_wait_sidecar_matches_folded_wait_rows(self, crawl):
        """Per partition: the sidecar-loaded claim candidates, restricted to
        WAIT, must equal the WAIT rows of a full delta fold — same hashes,
        priorities, attempts AND row indices."""
        for pid, paths in crawl.frontier.partition_files().items():
            info = fsrc.load_wait_candidates(paths)
            assert info is not None, f"partition {pid} lost its wait sidecar"
            cand, covered, n_rows = info
            full = fsrc.fold_paths(paths, columns=["url_hash", "priority", "status", "attempt"])
            assert n_rows == full.num_rows
            st = cand["status"].to_numpy()
            cuh = cand["url_hash"].to_numpy().astype(np.uint64)[st == sem.WAIT]
            catt = cand["attempt"].to_numpy()[st == sem.WAIT]
            cidx = cand["row_idx"].to_numpy()[st == sem.WAIT]
            fst = full["status"].to_numpy()
            fidx = np.flatnonzero(fst == sem.WAIT)
            fuh = full["url_hash"].to_numpy().astype(np.uint64)[fidx]
            fatt = full["attempt"].to_numpy()[fidx]
            o_c, o_f = np.argsort(cidx), np.argsort(fidx)
            assert np.array_equal(cidx[o_c], fidx[o_f])
            assert np.array_equal(cuh[o_c], fuh[o_f])
            assert np.array_equal(catt[o_c], fatt[o_f])

    def test_claim_bytes_reported_and_bounded(self, crawl):
        """The per-wave claim_bytes metric exists and, once the crawl is
        deep, is smaller than a full light-column scan of the frontier
        (the O(backlog) evidence the bench records)."""
        ms = crawl.metrics_table().to_pylist()
        assert all("claim_bytes" in m for m in ms)
        assert all(m["claim_bytes"] > 0 for m in ms)
        total_base = sum(
            pq.read_metadata(p).num_rows
            for paths in crawl.frontier.partition_files().values()
            for p in fsrc.base_paths(paths)
        )
        # the final backlog is far smaller than the frontier: so must be the
        # next claim's scan bytes vs the full base bytes
        full_bytes = sum(
            fsrc.file_size(crawl.frontier.fs, p)
            for paths in crawl.frontier.partition_files().values()
            for p in fsrc.base_paths(paths)
        )
        assert crawl.frontier.claim_scan_bytes() < full_bytes
        assert total_base > 0


class TestKeysSidecar:
    def test_seen_mask_matches_full_scan(self, crawl):
        rng = np.random.default_rng(3)
        for pid, paths in crawl.frontier.partition_files().items():
            full = np.concatenate(
                [
                    pq.read_table(p, columns=["url_hash"])["url_hash"].to_numpy()
                    for p in fsrc.base_paths(paths)
                ]
            ).astype(np.uint64)
            if not len(full):
                continue
            present = rng.choice(full, size=min(50, len(full)), replace=False)
            absent = rng.integers(0, 2**63, 50).astype(np.uint64) * np.uint64(2) + np.uint64(1)
            absent = absent[~np.isin(absent, full)]
            probe = np.concatenate([present, absent])
            got = fsrc.seen_mask(paths, probe)
            want = np.isin(probe, full)
            assert np.array_equal(got, want)

    def test_keys_lookup_row_idx_addresses_the_right_rows(self, crawl):
        for pid, paths in crawl.frontier.partition_files().items():
            bases = fsrc.base_paths(paths)
            full = np.concatenate(
                [pq.read_table(p, columns=["url_hash"])["url_hash"].to_numpy() for p in bases]
            ).astype(np.uint64)
            if not len(full):
                continue
            probe = full[:: max(1, len(full) // 40)]
            found, ridx, uncovered = fsrc.keys_lookup(paths, probe)
            if not found.any():
                continue  # partition never compacted and keys only covers seeds
            idx = np.sort(ridx[found])
            t = fsrc.take_rows(bases, idx, ["url_hash"])
            assert np.array_equal(
                np.sort(t["url_hash"].to_numpy().astype(np.uint64)),
                np.sort(probe[found]),
            )

    def test_push_tasks_idempotent_via_sidecar_confirm(self, crawl):
        """A re-push of already-inserted URLs must insert 0 (anti-join
        semantics unchanged by the zone-map confirm path)."""
        urls = [f"http://host{i:03d}.example/p{70 + i}" for i in range(8)]
        assert crawl.push_tasks(urls) == 0
        uh = crawl.frontier.to_arrow(columns=["url_hash"])["url_hash"].to_numpy()
        assert len(uh) == len(np.unique(uh))


class TestWaveDoneUrls:
    def test_matches_full_fold_reference(self, crawl):
        """The sidecar-driven wave_done_urls equals the brute-force answer
        (delta DONE hashes ∩ full url fold) for every committed wave."""
        for wave in range(crawl.frontier.latest_wave() + 1):
            got = crawl.wave_done_urls(wave)
            want = []
            import os

            for pid, paths in crawl.frontier.partition_files(wave).items():
                dp = os.path.join(crawl.frontier.path, f"p{pid:04d}", f"del{wave + 1:05d}.parquet")
                if not os.path.exists(dp):
                    continue
                d = pq.read_table(dp)
                hashes = d.filter(pa.compute.equal(d["status"], sem.DONE))["url_hash"].to_numpy()
                if not len(hashes):
                    continue
                t = fsrc.fold_paths(paths, columns=["url", "url_hash"])
                m = np.isin(t["url_hash"].to_numpy().astype(np.uint64), hashes.astype(np.uint64))
                want.extend(t.filter(pa.array(m))["url"].to_pylist())
            assert got == sorted(want)
            if wave <= 1:
                assert got, f"wave {wave} produced no DONE urls — degenerate fixture"


class TestIoPathSidecars:
    """The io path maintains the same sidecar invariant: CommitPartition
    (not the claim task) writes the status commit there, reloading the
    previous sidecar instead of receiving the claim's candidate load."""

    def test_io_crawl_wait_sidecar_matches_fold(self, ray_session, tmp_path):
        import pyarrow as pa

        from cloud_crawler_ray.pipelines.api import build_pipeline

        def make_io_pipeline():
            class IoFetcher:  # not light: drives FetchHostGroup + CommitPartition
                def __call__(self, url, url_hash, attempt, try_idx, ua):
                    return ("ok", b"B") if url_hash % 5 else ("io_error", None)

            class IoParser:
                def __init__(self, cfg):
                    self.cfg = cfg

                def __call__(self, url, url_hash, body):
                    return sw.out_links(url, int(url_hash), self.cfg), None

            def sink(t: pa.Table) -> pa.Table:
                return pa.table({"url_hash": t["url_hash"]})

            return build_pipeline("io-side", IoFetcher(), parser=IoParser(CFG), save_parsed=sink)

        eng = CrawlEngine.start(
            str(tmp_path / "io"), CFG, num_partitions=P, num_shards=S,
            wave_cap_per_partition=K, compact_files=3, pipeline=make_io_pipeline(),
        )
        try:
            eng.run(max_waves=5)
            for pid, paths in eng.frontier.partition_files().items():
                info = fsrc.load_wait_candidates(paths)
                assert info is not None
                cand, _, n_rows = info
                full = fsrc.fold_paths(paths, columns=["url_hash", "status", "attempt"])
                assert n_rows == full.num_rows
                st = cand["status"].to_numpy()
                cuh = np.sort(cand["url_hash"].to_numpy().astype(np.uint64)[st == sem.WAIT])
                fuh = np.sort(
                    full.filter(pa.compute.equal(full["status"], sem.WAIT))["url_hash"]
                    .to_numpy().astype(np.uint64)
                )
                assert np.array_equal(cuh, fuh)
        finally:
            eng.shutdown_shards()


class TestSidecarFallbacks:
    def test_store_without_sidecars_crawls_identically_and_heals(self, ray_session, tmp_path):
        """Deleting every wait*/keys* file (a pre-round-3 store, or sidecar
        loss) must not change ANY crawl result: claims fall back to the full
        light-column fold, confirms to the full hash scan, and the next
        compaction rewrites both sidecars (self-healing)."""
        import glob
        import os

        cfg = sw.WebConfig(n_hosts=8, pages_per_host=50, n_seed_hosts=5, max_links=3, seed=9)
        ra, rb = str(tmp_path / "a"), str(tmp_path / "b")
        ea = CrawlEngine.start(ra, cfg, num_partitions=2, num_shards=1,
                               wave_cap_per_partition=15, compact_files=3)
        eb = CrawlEngine.start(rb, cfg, num_partitions=2, num_shards=1,
                               wave_cap_per_partition=15, compact_files=3)
        try:
            ea.run(max_waves=2)
            eb.run(max_waves=2)
            ea.shutdown_shards()
            # simulate sidecar loss on A only
            lost = glob.glob(os.path.join(ra, "frontier", "p*", "wait*.parquet")) + glob.glob(
                os.path.join(ra, "frontier", "p*", "keys*.parquet")
            )
            assert lost, "fixture produced no sidecars"
            for f in lost:
                os.remove(f)
            ea2 = CrawlEngine.resume(ra)
            ea2.run(max_waves=6)
            eb.run(max_waves=6)
            fa = ea2.frontier.to_arrow().sort_by("url_hash")
            fb = eb.frontier.to_arrow().sort_by("url_hash")
            assert fa.equals(fb)
            assert ea2.crawl_order().equals(eb.crawl_order())
            # compaction (compact_files=3 over 6 waves) re-wrote the sidecars
            healed = glob.glob(os.path.join(ra, "frontier", "p*", "wait*.parquet"))
            assert healed, "compaction did not heal the wait sidecars"
            ea2.shutdown_shards()
        finally:
            eb.shutdown_shards()


class TestSidecarCorruption:
    def test_present_sidecar_without_metadata_raises(self, tmp_path):
        """ADVICE r3: only a genuinely ABSENT sidecar may degrade to the
        full-scan fallback — a present file lacking the sidecar schema
        metadata is corrupt/foreign and must fail loudly."""
        import os

        import pyarrow as pa
        import pyarrow.parquet as pq
        import pytest

        from cloud_crawler_ray.sources import frontier as fsrc

        base = pa.table(
            {
                "url_hash": pa.array([10, 20], pa.uint64()),
                "priority": pa.array([0.1, 0.2], pa.float32()),
                "status": pa.array([0, 0], pa.int8()),
                "attempt": pa.array([0, 0], pa.int32()),
            }
        )
        bp = str(tmp_path / "v00001.parquet")
        pq.write_table(base, bp)
        # a metadata-less file squatting on both sidecar names
        for prefix in ("wait", "keys"):
            pq.write_table(base, str(tmp_path / f"{prefix}00001.parquet"))
        with pytest.raises(ValueError, match="no sidecar schema metadata"):
            fsrc.load_wait_candidates([bp])
        with pytest.raises(ValueError, match="no sidecar schema metadata"):
            fsrc.keys_lookup([bp], np.array([10], np.uint64))
        # genuinely absent → graceful fallback (None / all-uncovered)
        for prefix in ("wait", "keys"):
            os.remove(str(tmp_path / f"{prefix}00001.parquet"))
        assert fsrc.load_wait_candidates([bp]) is None
        found, _, uncovered = fsrc.keys_lookup([bp], np.array([10], np.uint64))
        assert not found.any() and uncovered == [bp]

    def test_compaction_raises_on_duplicate_base_hash(self, tmp_path):
        """ADVICE r3: a push_tasks racing a live wave can insert a url_hash
        twice; compaction holds the whole partition and must fail loudly on
        the broken at-most-once invariant instead of compacting twins."""
        import pyarrow as pa
        import pytest

        from cloud_crawler_ray.sources.frontier import FrontierStore
        from cloud_crawler_ray.stages.crawl import commit_status_files
        from cloud_crawler_ray.pipelines import synthweb as sw

        def frontier_rows(hashes):
            n = len(hashes)
            return pa.table(
                {
                    "url": pa.array([f"http://h/{h}" for h in hashes], pa.string()),
                    "url_hash": pa.array(hashes, pa.uint64()),
                    "host": pa.array(["h"] * n, pa.string()),
                    "depth": pa.array([0] * n, pa.int32()),
                    "priority": pa.array([0.5] * n, pa.float32()),
                    "status": pa.array([0] * n, pa.int8()),
                    "attempt": pa.array([0] * n, pa.int32()),
                    "discovered_at": pa.array([0] * n, pa.int32()),
                    "parent_hash": pa.array([0] * n, pa.uint64()),
                    "link_index": pa.array(list(range(n)), pa.int32()),
                    "partition_id": pa.array([0] * n, pa.int32()),
                }
            )

        store = FrontierStore(str(tmp_path / "frontier"), 1)
        import os

        rel_main = store.write_main(0, frontier_rows([10, 20, 30]), wave=-2)
        rel_push = store.write_push(0, frontier_rows([20]), tag="race")  # the twin
        paths = [os.path.join(store.path, r) for r in (rel_main, rel_push)]
        flips = pa.table(
            {
                "url_hash": pa.array([10], pa.uint64()),
                "status": pa.array([2], pa.int8()),
                "attempt": pa.array([0], pa.int32()),
                "fetched": pa.array([False], pa.bool_()),
            }
        )
        with pytest.raises(ValueError, match="duplicate url_hash"):
            commit_status_files(
                store, 0, paths, flips, wave=1, order_path=str(tmp_path / "order"),
                compact_files=2, cfg=sw.WebConfig(),
            )


class TestSoakResume:
    def test_resume_across_compactions_and_pushes_matches_uninterrupted(self, ray_session, tmp_path):
        """8 waves with compact_files=3, an external push after wave 3, and a
        kill+resume at the same point on one side: frontier and crawl order
        must be byte-identical to the uninterrupted run (sidecars, dels,
        pushes and compactions all replay/fold to the same state)."""
        cfg = sw.WebConfig(n_hosts=9, pages_per_host=60, n_seed_hosts=5, max_links=3, seed=21)
        pushed = [f"http://host{i:03d}.example/p{40 + i}" for i in range(6)]
        ra, rb = str(tmp_path / "straight"), str(tmp_path / "resumed")
        ea = CrawlEngine.start(ra, cfg, num_partitions=3, num_shards=2,
                               wave_cap_per_partition=12, compact_files=3)
        eb = CrawlEngine.start(rb, cfg, num_partitions=3, num_shards=2,
                               wave_cap_per_partition=12, compact_files=3)
        try:
            ea.run(max_waves=3)
            eb.run(max_waves=3)
            assert ea.push_tasks(pushed) == eb.push_tasks(pushed)
            eb.shutdown_shards()  # kill: actors gone, engine object dropped
            eb = CrawlEngine.resume(rb)
            ea.run(max_waves=8)
            eb.run(max_waves=8)
            fa = ea.frontier.to_arrow().sort_by("url_hash")
            fb = eb.frontier.to_arrow().sort_by("url_hash")
            assert fa.equals(fb)
            assert ea.crawl_order().equals(eb.crawl_order())
            assert any(m.get("compacted", 0) > 0 for m in ea.metrics_table().to_pylist())
        finally:
            ea.shutdown_shards()
            eb.shutdown_shards()


def test_storage_wait_constant_pinned_to_semantics():
    """frontier.STATUS_WAIT deliberately duplicates semantics.WAIT so the
    storage layer never imports upward — this assert keeps them in lockstep."""
    assert fsrc.STATUS_WAIT == sem.WAIT


def test_manifest_carries_per_partition_metrics(crawl):
    """north_star: per-partition checkpoints carry fetch/dedup metrics —
    each wave manifest's meta maps partition id → selected/fetched/new."""
    m = crawl.frontier.manifest(0)["meta"]
    assert "partitions" in m and m["partitions"]
    total_sel = sum(p.get("selected", 0) for p in m["partitions"].values())
    assert total_sel == m["selected"]
