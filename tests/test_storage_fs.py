"""Path-agnostic storage: both stores driven through an explicit
``pyarrow.fs.FileSystem`` handle (SubTreeFileSystem over a temp dir — the
same code path an ``s3://`` root takes), manifest-last semantics preserved.
Reference parity: S3SaveRawProvider.scala:27-37 / LocalFileSystem raw sink
collapse into one backend-agnostic store."""

import numpy as np
import pyarrow as pa
import pytest
from pyarrow import fs as pafs

from cloud_crawler_ray.sources.frontier import FRONTIER_SCHEMA, FrontierStore, fold_paths, take_rows
from cloud_crawler_ray.sources.lancelike import LanceLikeTable


@pytest.fixture()
def subtree(tmp_path):
    return pafs.SubTreeFileSystem(str(tmp_path), pafs.LocalFileSystem())


def _frontier_rows(n, pid=0):
    uh = np.arange(1, n + 1, dtype=np.uint64) * np.uint64(7919)
    return pa.table(
        {
            "url": [f"http://h/p{i}" for i in range(n)],
            "url_hash": pa.array(uh, pa.uint64()),
            "host": ["h"] * n,
            "depth": pa.array(np.zeros(n, np.int32)),
            "priority": pa.array(np.zeros(n, np.float32)),
            "status": pa.array(np.zeros(n, np.int8)),
            "attempt": pa.array(np.zeros(n, np.int32)),
            "discovered_at": pa.array(np.zeros(n, np.int32)),
            "parent_hash": pa.array(np.zeros(n, np.uint64), pa.uint64()),
            "link_index": pa.array(np.zeros(n, np.int32)),
            "partition_id": pa.array(np.full(n, pid, np.int32)),
        }
    ).cast(FRONTIER_SCHEMA)


class TestLanceLikeOnFsHandle:
    def test_roundtrip_and_manifest_last(self, subtree):
        t = LanceLikeTable.create("tbl", filesystem=subtree)
        rel = t.write_fragment(pa.table({"x": [1, 2, 3]}), name="a")
        # fragment written but NOT committed → invisible (manifest-last)
        assert t.count_rows() == 0
        t.commit([rel], meta={"wave": 0})
        assert t.count_rows() == 3
        assert t.to_arrow()["x"].to_pylist() == [1, 2, 3]
        # append-only versioning + time travel
        rel2 = t.write_fragment(pa.table({"x": [4]}), name="b")
        v = t.commit([rel2])
        assert t.count_rows(v) == 4 and t.count_rows(v - 1) == 3
        # idempotent re-commit of the same fragment name
        t.commit([rel2])
        assert t.count_rows() == 4

    def test_reopen_by_handle(self, subtree):
        t = LanceLikeTable.create("tbl2", filesystem=subtree)
        t.commit([t.write_fragment(pa.table({"y": ["a"]}))])
        again = LanceLikeTable("tbl2", filesystem=subtree)
        assert again.to_arrow()["y"].to_pylist() == ["a"]


class TestCrawlOnLatencyFs:
    def test_conformance_crawl_on_latency_fs_digest_identical(self, ray_session, tmp_path):
        """VERDICT r3 task #6: a whole crawl driven end-to-end through a
        non-local pyarrow.fs — a latency-injecting wrapper standing in for
        an object store — must produce byte-identical tables to the same
        crawl on the local filesystem (every store and remote task reads
        and writes through the job's fs handle)."""
        import numpy as np

        from cloud_crawler_ray.pipelines import synthweb as sw
        from cloud_crawler_ray.pipelines.wave import CrawlEngine
        from cloud_crawler_ray.sources.storage import LatencyFileSystemHandler

        cfg = sw.WebConfig(n_hosts=8, pages_per_host=40, n_seed_hosts=4)
        P, S, K, WAVES = 2, 1, 15, 3

        def run(root, filesystem=None):
            eng = CrawlEngine.start(
                root, cfg, num_partitions=P, num_shards=S, wave_cap_per_partition=K,
                filesystem=filesystem,
            )
            eng.run(max_waves=WAVES)
            eng.shutdown_shards()
            return eng

        # latency wrapper over a SubTree root + a RELATIVE engine root: any
        # code path that silently fell back to a bare LocalFileSystem would
        # resolve 'lat_eng' against the cwd instead of the subtree and the
        # run (or the digest compare) would fail — so this also proves every
        # read/write goes through the job's handle
        (tmp_path / "lat").mkdir()
        lat_fs = pafs.PyFileSystem(
            LatencyFileSystemHandler(
                pafs.SubTreeFileSystem(str(tmp_path / "lat"), pafs.LocalFileSystem()), delay_ms=2.0
            )
        )
        eng_lat = run("lat_eng", filesystem=lat_fs)
        eng_loc = run(str(tmp_path / "loc" / "eng"))

        cols = ["url_hash", "status", "depth", "attempt"]
        fl = eng_lat.frontier.to_arrow(columns=cols)
        fo = eng_loc.frontier.to_arrow(columns=cols)
        order = np.argsort(fl["url_hash"].to_numpy(), kind="stable")
        order2 = np.argsort(fo["url_hash"].to_numpy(), kind="stable")
        for c in cols:
            assert np.array_equal(fl[c].to_numpy()[order], fo[c].to_numpy()[order2]), c

        ol, oo = eng_lat.crawl_order(), eng_loc.crawl_order()
        assert ol.num_rows == oo.num_rows > 0
        for c in ol.column_names:
            assert ol[c].to_pylist() == oo[c].to_pylist(), c

        il = eng_lat.images.to_arrow(columns=["image_id", "phash", "caption"])
        io = eng_loc.images.to_arrow(columns=["image_id", "phash", "caption"])
        sl = il.sort_by("image_id")
        so = io.sort_by("image_id")
        assert sl.equals(so)
        assert sl.num_rows > 0

    def test_resume_on_latency_fs(self, ray_session, tmp_path):
        """Kill-resume through the non-local handle: reopening with the same
        filesystem continues from the committed wave."""
        from cloud_crawler_ray.pipelines import synthweb as sw
        from cloud_crawler_ray.pipelines.wave import CrawlEngine
        from cloud_crawler_ray.sources.storage import LatencyFileSystemHandler

        cfg = sw.WebConfig(n_hosts=6, pages_per_host=30, n_seed_hosts=3)
        fs = pafs.PyFileSystem(LatencyFileSystemHandler(pafs.LocalFileSystem(), delay_ms=1.0))
        root = str(tmp_path / "eng")
        eng = CrawlEngine.start(root, cfg, num_partitions=2, num_shards=1, wave_cap_per_partition=10, filesystem=fs)
        eng.run(max_waves=1)
        eng.shutdown_shards()
        eng2 = CrawlEngine.resume(root, filesystem=fs)
        assert eng2.frontier.latest_wave() == 0
        eng2.run(max_waves=2)
        eng2.shutdown_shards()
        assert eng2.frontier.latest_wave() == 1


class TestFrontierStoreOnFsHandle:
    def test_initialize_delta_fold_take(self, subtree):
        seeds = _frontier_rows(10)
        store = FrontierStore.initialize("front", seeds, num_partitions=1, filesystem=subtree)
        assert store.latest_wave() == -1
        assert store.base_row_count() == 10
        paths = store.partition_files()[0]
        # delta flips two rows' status; fold applies it
        uh = seeds["url_hash"].to_numpy()
        delta = pa.table(
            {
                "url_hash": pa.array(uh[[2, 5]], pa.uint64()),
                "status": pa.array(np.array([2, 4], np.int8)),
                "attempt": pa.array(np.array([1, 1], np.int32)),
            }
        )
        rel = store.write_delta(0, delta, wave=0)
        store.commit(0, {0: [*store.manifest()["partitions"]["0"], rel]}, {})
        folded = fold_paths(store.partition_files()[0], filesystem=store.fs)
        st = folded["status"].to_numpy()
        assert st[2] == 2 and st[5] == 4 and (np.delete(st, [2, 5]) == 0).all()
        # pruned row take through the handle
        got = take_rows(paths, np.array([1, 7]), ["url", "host"], filesystem=store.fs)
        assert got["url"].to_pylist() == ["http://h/p1", "http://h/p7"]

    def test_manifest_last_commit(self, subtree):
        seeds = _frontier_rows(4)
        store = FrontierStore.initialize("front2", seeds, num_partitions=1, filesystem=subtree)
        # a data file written without a manifest commit stays invisible
        store.write_delta(0, pa.table({"url_hash": pa.array([seeds["url_hash"][0].as_py()], pa.uint64()),
                                       "status": pa.array([2], pa.int8()),
                                       "attempt": pa.array([0], pa.int32())}), wave=0)
        assert store.latest_wave() == -1
        folded = fold_paths(store.partition_files()[0], filesystem=store.fs)
        assert (folded["status"].to_numpy() == 0).all()


class TestUriRoot:
    def test_engine_accepts_uri_root(self, ray_session, tmp_path):
        """A URI root (file://...) resolves ONCE at the engine boundary:
        start, run, and resume all work with the scheme-ful form, and
        every child store/config access uses the normalized path (the
        s3://bucket/... case follows the identical resolve_fs path)."""
        from cloud_crawler_ray.pipelines import synthweb as sw
        from cloud_crawler_ray.pipelines.wave import CrawlEngine

        plain = str(tmp_path / "job_uri")
        root = "file://" + plain
        cfg = sw.WebConfig(n_hosts=6, pages_per_host=30, n_seed_hosts=3)
        eng = CrawlEngine.start(root, cfg, num_partitions=2, num_shards=1, wave_cap_per_partition=10)
        assert eng.root == plain  # normalized, not the URI
        eng.run(max_waves=1)
        eng.shutdown_shards()
        eng2 = CrawlEngine.resume(root)
        assert eng2.root == plain
        assert eng2.frontier.to_arrow().num_rows > 0
        eng2.shutdown_shards()
