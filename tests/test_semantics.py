"""State-machine parity (table-driven, mirroring the reference's actor tests
TasksBatchControllerTest.scala:103-261) + hot-host skew conformance."""

import numpy as np
import pytest

from cloud_crawler_ray.functions.hashing import hash64
from cloud_crawler_ray.pipelines import oracle, semantics as sem, synthweb as sw


def _host_rows(cfg, outcome_urls):
    """Fetch a synthetic host whose rows have known outcome categories."""
    urls = list(outcome_urls)
    uh = hash64(urls)
    return urls, uh, np.zeros(len(urls), np.int32)


def _urls_with_outcome(cfg, host_id, category, n, avoid_robots=True):
    """Find n page urls of a host with the given outcome category."""
    host = cfg.host_name(host_id)
    found = []
    for p in range(cfg.n_pages(host_id)):
        url = cfg.page_url(host_id, p)
        h = hash64([url])
        if avoid_robots and sw.robots_disallowed(host, np.array([p]), cfg)[0]:
            continue
        if sw.outcome_for(h, cfg)[0] == category:
            found.append(url)
            if len(found) == n:
                break
    if len(found) < n:
        pytest.skip(f"not enough {category} pages on {host}")
    return found


CFG = sw.WebConfig(n_hosts=4, pages_per_host=4000)


class TestOutcomeRouting:
    """(outcome, attempt) → expected (status, attempt') — reference parity:
    success/skip/parse-fail/ban/io-retry-cap routing of
    TasksBatchController.scala:138-176 + QueueTaskServiceImpl.scala:101-115."""

    @pytest.mark.parametrize(
        "category,attempt,exp_status,exp_attempt",
        [
            (sw.OUTCOME_OK, 0, sem.DONE, 0),
            (sw.OUTCOME_NOT_FOUND, 0, sem.SKIPPED, 0),
            (sw.OUTCOME_PARSE_ERROR, 0, sem.PARSE_FAILED, 0),
            (sw.OUTCOME_FLAKY, 0, sem.DONE, 0),  # io on try 0, ok on in-wave retry
            (sw.OUTCOME_IO_ALWAYS, 0, sem.WAIT, 1),  # in-wave tries exhausted → requeue
            (sw.OUTCOME_IO_ALWAYS, 2, sem.FAILED, 3),  # cross-wave cap 3 → failed
            (sw.OUTCOME_BANNED, 0, sem.BANNED, 0),  # terminal; master drops banned ids
        ],
    )
    def test_routing(self, category, attempt, exp_status, exp_attempt):
        host_id = 1
        urls = _urls_with_outcome(CFG, host_id, category, 1)
        uh = hash64(urls)
        res = sem.fetch_host_wave(
            CFG.host_name(host_id), 0, urls, uh, np.array([attempt], np.int32), CFG
        )
        assert res.status[0] == exp_status
        assert res.attempt[0] == exp_attempt
        assert res.fetched[0]

    def test_ban_freezes_rest_of_host(self):
        host_id = 1
        banned = _urls_with_outcome(CFG, host_id, sw.OUTCOME_BANNED, 1)
        oks = _urls_with_outcome(CFG, host_id, sw.OUTCOME_OK, 3)
        urls = banned + oks
        uh = hash64(urls)
        res = sem.fetch_host_wave(CFG.host_name(host_id), 0, urls, uh, np.zeros(4, np.int32), CFG)
        assert res.status[0] == sem.BANNED
        assert (res.status[1:] == sem.WAIT).all()  # frozen, untouched
        assert not res.fetched[1:].any()  # no politeness budget consumed

    def test_circuit_breaker_trips_after_three(self):
        host_id = 1
        ios = _urls_with_outcome(CFG, host_id, sw.OUTCOME_IO_ALWAYS, 3)
        oks = _urls_with_outcome(CFG, host_id, sw.OUTCOME_OK, 2)
        urls = ios + oks
        uh = hash64(urls)
        res = sem.fetch_host_wave(CFG.host_name(host_id), 0, urls, uh, np.zeros(5, np.int32), CFG)
        assert (res.status[:3] == sem.WAIT).all() and (res.attempt[:3] == 1).all()
        assert (res.status[3:] == sem.WAIT).all() and not res.fetched[3:].any()  # forcedStop

    def test_fetch_timeout_ends_host_wave(self):
        """Rule (e) — ADVICE r3: after a per-call fetch timeout the abandoned
        daemon thread may still hold a request to the host in flight, so the
        host's remaining rows must NOT be fetched this wave (politeness
        serialization). The timed-out row routes io_error (attempt+1); the
        rest stay WAIT untouched, like a circuit-breaker trip."""
        import time

        def fetcher(url, url_hash, attempt, try_idx, ua):
            if url.endswith("/p1"):
                time.sleep(30)  # hung call — abandoned at fetch_timeout_sec
            return "ok", None

        cfg = sw.WebConfig(n_hosts=1, pages_per_host=10, fetch_timeout_sec=0.2)
        urls = ["http://h0.example/p0", "http://h0.example/p1", "http://h0.example/p2"]
        uh = hash64(urls)
        t0 = time.monotonic()
        res = sem.fetch_host_wave(
            "h0.example", 0, urls, uh, np.zeros(3, np.int32), cfg,
            fetcher=fetcher, collect_links=False,
        )
        assert time.monotonic() - t0 < 10
        assert res.status[0] == sem.DONE and res.fetched[0]
        assert res.status[1] == sem.WAIT and res.attempt[1] == 1 and res.fetched[1]
        assert res.status[2] == sem.WAIT and res.attempt[2] == 0 and not res.fetched[2]

    def test_robots_skip_consumes_no_budget(self):
        host_id = 2
        host = CFG.host_name(host_id)
        dis = [p for p in range(200) if sw.robots_disallowed(host, np.array([p]), CFG)[0]][:1]
        urls = [CFG.page_url(host_id, dis[0])]
        res = sem.fetch_host_wave(host, 0, urls, hash64(urls), np.zeros(1, np.int32), CFG)
        assert res.status[0] == sem.SKIPPED and not res.fetched[0]


class TestHotHostSkew:
    """Engine ≡ oracle with one 8x hot host (the skew scenario the
    hostname-hash partitioning must survive)."""

    def test_conformance_with_hot_host(self, ray_session, tmp_path):
        from cloud_crawler_ray.pipelines.wave import CrawlEngine

        cfg = sw.WebConfig(
            n_hosts=6, pages_per_host=60, n_seed_hosts=6, hot_hosts=(sw.WebConfig().host_name(0),), max_links=4
        )
        ores = oracle.run_oracle(cfg, num_partitions=4, wave_cap_per_partition=40, max_waves=4)
        eng = CrawlEngine.start(str(tmp_path / "hot"), cfg, num_partitions=4, num_shards=2, wave_cap_per_partition=40)
        eng.run(max_waves=4)
        try:
            eng_seen = np.sort(eng.frontier.to_arrow(columns=["url_hash"])["url_hash"].to_numpy())
            assert np.array_equal(eng_seen, ores.seen)
            eo, oo = eng.crawl_order(), ores.order
            assert eo.num_rows == oo.num_rows
            assert np.array_equal(eo["url_hash"].to_numpy(), oo["url_hash"].to_numpy())
            # the hot host actually dominated (skew was real)
            hosts = oo["host"].to_pylist()
            hot = cfg.host_name(0)
            assert hosts.count(hot) > len(hosts) / 6
        finally:
            eng.shutdown_shards()
