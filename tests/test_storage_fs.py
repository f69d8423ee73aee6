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
