"""Round-3 reference-parity additions: per-failure notifier hook
(BaseNotification.scala:3-5, fired from TasksBatchController.scala:147-153),
straggler/batch execution timeouts (worker.conf:15-16 + WorkerManager.scala:
85-96 → returnToQueue), resume pipeline validation, and the ADVICE r2 fixes
(light-mode parser PARSE_FAILED routing, fold_paths corruption detection,
overflow-free sample_split key).
"""

import os
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from cloud_crawler_ray.pipelines import semantics as sem, synthweb as sw
from cloud_crawler_ray.pipelines.api import build_pipeline
from cloud_crawler_ray.pipelines.wave import CrawlEngine

CFG = sw.WebConfig(n_hosts=6, pages_per_host=40, n_seed_hosts=4, seeds_per_host=6, max_links=3, seed=11)


def make_flaky_pipeline(notifier=None):
    """Hooks defined locally so cloudpickle ships them by value to Ray
    workers (same convention as test_pipeline_hooks)."""

    class LightOkFetcher:
        """Light custom fetcher: every page fetches ok with a deterministic body."""

        light = True

        def __call__(self, url, url_hash, attempt, try_idx, ua):
            return "ok", f"BODY:{url}".encode()

    class ThirdFailsParser:
        """Raises for url_hash % 3 == 0 — the planted parse failures."""

        def __call__(self, url, url_hash, body):
            assert body is not None and body.startswith(b"BODY:")
            if url_hash % 3 == 0:
                raise ValueError("planted parse failure")
            return [], {"url": url}

    def record_sink(t: pa.Table) -> pa.Table:
        return pa.table({"url": t["url"], "url_hash": t["url_hash"]})

    return build_pipeline(
        "light-flaky", LightOkFetcher(), parser=ThirdFailsParser(), save_parsed=record_sink,
        notifier=notifier,
    )


def make_light_fetcher_pipeline(task_type="other-type"):
    class LightOkFetcher:
        light = True

        def __call__(self, url, url_hash, attempt, try_idx, ua):
            return "ok", None

    return build_pipeline(task_type, LightOkFetcher())


class TestLightParserRouting:
    """ADVICE r2 (medium): a raising parser on a LIGHT pipeline must route
    its row to PARSE_FAILED (pre-commit), not crash the wave."""

    @pytest.fixture(scope="class")
    def run(self, ray_session, tmp_path_factory):
        root = str(tmp_path_factory.mktemp("lightpf") / "job")
        pl = make_flaky_pipeline()
        eng = CrawlEngine.start(root, CFG, num_partitions=2, num_shards=2,
                                wave_cap_per_partition=20, pipeline=pl)
        eng.run(max_waves=3)
        yield eng
        eng.shutdown_shards()

    def test_planted_failures_marked_parse_failed(self, run):
        f = run.frontier.to_arrow(columns=["url_hash", "status"])
        uh = f["url_hash"].to_numpy().astype(np.uint64)
        st = f["status"].to_numpy()
        fetched = st != sem.WAIT
        assert fetched.any()
        planted = (uh % 3 == 0) & fetched
        assert planted.any(), "no planted failure was ever fetched"
        assert (st[planted] == sem.PARSE_FAILED).all()
        ok = (uh % 3 != 0) & fetched
        assert (st[ok] == sem.DONE).all()

    def test_parse_failed_rows_not_in_parsed_sink(self, run):
        parsed = run.images.to_arrow()
        assert parsed.num_rows > 0
        assert all(int(h) % 3 != 0 for h in parsed["url_hash"].to_numpy())


class TestNotifier:
    def test_notifier_fires_exactly_for_parse_failures(self, ray_session, tmp_path):
        root = str(tmp_path / "job")
        out_dir = str(tmp_path / "notified")
        os.makedirs(out_dir)

        class FileNotifier:
            """Writes one file per notified batch (runs inside Ray tasks)."""

            def __init__(self, out):
                self.out = out

            def __call__(self, t: pa.Table):
                import uuid

                assert {"url", "url_hash", "host", "status", "attempt"} <= set(t.column_names)
                with open(os.path.join(self.out, uuid.uuid4().hex), "w") as f:
                    f.write("\n".join(t["url"].to_pylist()))

        pl = make_flaky_pipeline(notifier=FileNotifier(out_dir))
        eng = CrawlEngine.start(root, CFG, num_partitions=2, num_shards=2,
                                wave_cap_per_partition=20, pipeline=pl)
        try:
            eng.run(max_waves=3)
            notified = set()
            for name in os.listdir(out_dir):
                with open(os.path.join(out_dir, name)) as f:
                    notified.update(u for u in f.read().splitlines() if u)
            f = eng.frontier.to_arrow(columns=["url", "status"])
            expected = {
                u
                for u, s in zip(f["url"].to_pylist(), f["status"].to_pylist())
                if s == sem.PARSE_FAILED
            }
            assert expected, "crawl planted no parse failures"
            assert notified == expected
        finally:
            eng.shutdown_shards()


class TestTimeouts:
    def test_hung_fetcher_is_killed_and_retried(self, ray_session, tmp_path):
        """A fetcher call that HANGS is abandoned after fetch_timeout_sec and
        routed as io_error; rule (e) ends the host's wave (the abandoned
        request may still be in flight), so the row completes on a LATER
        wave's retry (WorkerManager.scala:85-96 straggler kill)."""

        class HangsOnceFetcher:
            light = True

            def __call__(self, url, url_hash, attempt, try_idx, ua):
                if attempt == 0 and try_idx == 0:
                    time.sleep(30)  # a hung HTTP call
                return "ok", b"BODY:x"

        cfg = sw.WebConfig(n_hosts=1, pages_per_host=10, n_seed_hosts=1, seeds_per_host=3,
                           fetch_timeout_sec=0.2)
        root = str(tmp_path / "hang")
        pl = build_pipeline("hang", HangsOnceFetcher())
        eng = CrawlEngine.start(root, cfg, num_partitions=1, num_shards=1,
                                wave_cap_per_partition=10, pipeline=pl)
        try:
            t0 = time.monotonic()
            # rule (e): each wave abandons at most one first-call hang per
            # host, so 3 seed rows need up to 2·3 waves to all reach DONE
            eng.run(max_waves=7)
            assert time.monotonic() - t0 < 40, "wave stalled behind the hung fetcher"
            f = eng.frontier.to_arrow(columns=["status"])
            assert (f["status"].to_numpy() == sem.DONE).all()
        finally:
            eng.shutdown_shards()

    def test_batch_budget_alone_interrupts_hung_call(self, ray_session, tmp_path):
        """With ONLY batch_timeout_sec set (no per-call fetch timeout), a
        fetcher that hangs mid-flight is still abandoned when the host
        budget expires, and its row returns to the queue untouched — the
        budget must not depend on the call returning."""
        marks = str(tmp_path / "marks")
        os.makedirs(marks)

        class HangsFirstCallFetcher:
            light = True

            def __init__(self, out):
                self.out = out

            def __call__(self, url, url_hash, attempt, try_idx, ua):
                mark = os.path.join(self.out, str(url_hash))
                if not os.path.exists(mark):
                    open(mark, "w").close()
                    time.sleep(30)  # hung on the first-ever call for this URL
                return "ok", None

        cfg = sw.WebConfig(n_hosts=1, pages_per_host=10, n_seed_hosts=1, seeds_per_host=2,
                           batch_timeout_sec=0.4)
        root = str(tmp_path / "hungbudget")
        pl = build_pipeline("hungslow", HangsFirstCallFetcher(marks))
        eng = CrawlEngine.start(root, cfg, num_partitions=1, num_shards=1,
                                wave_cap_per_partition=10, pipeline=pl)
        try:
            t0 = time.monotonic()
            eng.run(max_waves=6)
            assert time.monotonic() - t0 < 25, "budget did not interrupt the hung call"
            f = eng.frontier.to_arrow(columns=["status", "attempt"])
            assert (f["status"].to_numpy() == sem.DONE).all()
            assert (f["attempt"].to_numpy() == 0).all()  # returnToQueue, not a failure
        finally:
            eng.shutdown_shards()

    def test_batch_budget_returns_remaining_rows_to_queue(self, ray_session, tmp_path):
        """batch_timeout_sec expiry — including MID-FLIGHT (the in-progress
        call is abandoned, its row returns to the queue untouched): rows
        complete across later waves with attempt unchanged — forcedStop →
        returnToQueue parity; no row is lost."""
        calls_path = str(tmp_path / "calls")
        os.makedirs(calls_path)

        class SlowFetcher:
            light = True

            def __init__(self, out):
                self.out = out

            def __call__(self, url, url_hash, attempt, try_idx, ua):
                import uuid

                open(os.path.join(self.out, f"{url_hash}-{uuid.uuid4().hex}"), "w").close()
                time.sleep(0.3)
                return "ok", None

        cfg = sw.WebConfig(n_hosts=1, pages_per_host=10, n_seed_hosts=1, seeds_per_host=4,
                           batch_timeout_sec=0.5)
        root = str(tmp_path / "budget")
        pl = build_pipeline("slow", SlowFetcher(calls_path))
        eng = CrawlEngine.start(root, cfg, num_partitions=1, num_shards=1,
                                wave_cap_per_partition=10, pipeline=pl)
        try:
            res = eng.run(max_waves=10)
            f = eng.frontier.to_arrow(columns=["url_hash", "status", "attempt"])
            assert (f["status"].to_numpy() == sem.DONE).all()
            assert (f["attempt"].to_numpy() == 0).all()  # budget expiry is not a failure
            assert res["waves_run"] >= 2, "budget never split the host across waves"
            # every row eventually fetched; budget-killed attempts re-call
            hashes = {name.split("-")[0] for name in os.listdir(calls_path)}
            assert hashes == {str(h) for h in f["url_hash"].to_numpy()}
        finally:
            eng.shutdown_shards()


class TestResumeValidation:
    def test_resume_with_wrong_pipeline_raises(self, ray_session, tmp_path):
        root = str(tmp_path / "job")
        eng = CrawlEngine.start(root, CFG, num_partitions=2, num_shards=1)
        eng.shutdown_shards()
        with pytest.raises(ValueError, match="task_type"):
            CrawlEngine.resume(root, pipeline=make_light_fetcher_pipeline("other-type"))
        # the matching pipeline (None → synthetic) resumes fine
        CrawlEngine.resume(root)


class TestFoldCorruptionDetection:
    def test_foreign_delta_hash_raises(self, tmp_path):
        from cloud_crawler_ray.sources.frontier import fold_paths

        base = pa.table(
            {
                "url_hash": pa.array([10, 20, 30], pa.uint64()),
                "status": pa.array([0, 0, 0], pa.int8()),
                "attempt": pa.array([0, 0, 0], pa.int32()),
            }
        )
        good = pa.table(
            {"url_hash": pa.array([20], pa.uint64()), "status": pa.array([2], pa.int8()),
             "attempt": pa.array([1], pa.int32())}
        )
        bad = pa.table(
            {"url_hash": pa.array([25], pa.uint64()), "status": pa.array([2], pa.int8()),
             "attempt": pa.array([1], pa.int32())}
        )
        bp = str(tmp_path / "v00001.parquet")
        pq.write_table(base, bp)
        pq.write_table(good, str(tmp_path / "del00002.parquet"))
        pq.write_table(bad, str(tmp_path / "del00003.parquet"))
        t = fold_paths([bp, str(tmp_path / "del00002.parquet")])
        assert t["status"].to_pylist() == [0, 2, 0]
        with pytest.raises(ValueError, match="corruption"):
            fold_paths([bp, str(tmp_path / "del00003.parquet")])
        # past-the-end insertion point must also raise, not IndexError
        past = pa.table(
            {"url_hash": pa.array([99], pa.uint64()), "status": pa.array([2], pa.int8()),
             "attempt": pa.array([1], pa.int32())}
        )
        pq.write_table(past, str(tmp_path / "del00004.parquet"))
        with pytest.raises(ValueError, match="corruption"):
            fold_paths([bp, str(tmp_path / "del00004.parquet")])


class TestSampleSplitOverflow:
    def test_split_key_matches_duckdb_beyond_int32(self):
        """ADVICE r2: the Knuth split key must agree with the SQL oracle for
        doc_ids past 2^32 (where a naive int64 multiply wraps)."""
        import duckdb

        ids = np.array([0, 1, 2**31, 2**32 - 1, 2**32, 2**33 + 5, 10**13], np.uint64)
        key = ((ids % np.uint64(2**32)) * np.uint64(2654435761)) % np.uint64(2**32)
        con = duckdb.connect()
        vals = ",".join(f"({int(i)})" for i in ids)
        sql = (
            "SELECT ((CAST(d % 4294967296 AS UBIGINT) * CAST(2654435761 AS UBIGINT))"
            f" % 4294967296) FROM (VALUES {vals}) t(d)"
        )
        oracle = [r[0] for r in con.execute(sql).fetchall()]
        assert key.tolist() == oracle
