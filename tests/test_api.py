"""Pipeline-builder validation parity + UA determinism + run_crawl resume."""

import numpy as np
import pytest

from cloud_crawler_ray.functions.hashing import hash64
from cloud_crawler_ray.functions.useragent import user_agents
from cloud_crawler_ray.pipelines import synthweb as sw
from cloud_crawler_ray.pipelines.api import CrawlJobConfig, build_pipeline, run_crawl


def _fetch(batch):
    return batch


class TestPipelineBuilder:
    def test_minimal_ok(self):
        p = build_pipeline("t", _fetch)
        assert p.task_type == "t"

    def test_fetcher_required(self):
        with pytest.raises(ValueError, match="required"):
            build_pipeline("t", None)

    def test_parser_requires_sink(self):
        # PipelineBuilder.scala:56-68: parser ⇔ saveParsedProvider
        with pytest.raises(ValueError, match="together"):
            build_pipeline("t", _fetch, parser=_fetch)
        with pytest.raises(ValueError, match="together"):
            build_pipeline("t", _fetch, save_parsed=_fetch)
        build_pipeline("t", _fetch, parser=_fetch, save_parsed=_fetch)  # ok


class TestUserAgents:
    def test_deterministic_and_varied(self):
        h = hash64([f"http://h{i}.com/" for i in range(200)])
        ua1, ua2 = user_agents(h), user_agents(h)
        assert ua1 == ua2
        assert len(set(ua1)) > 20  # matrix actually exercised
        assert all(u.startswith("Mozilla/5.0") for u in ua1)


class TestRunCrawl:
    def test_run_and_implicit_resume(self, ray_session, tmp_path):
        cfg = CrawlJobConfig(
            web=sw.WebConfig(n_hosts=4, pages_per_host=10, n_seed_hosts=2, max_links=2),
            num_partitions=2,
            num_shards=1,
            wave_cap_per_partition=10,
        )
        root = str(tmp_path / "job")
        r1 = run_crawl(root, cfg, max_waves=2)
        assert r1["waves_run"] >= 1
        r2 = run_crawl(root, cfg, max_waves=4)  # resumes past wave 2
        assert all(m["wave"] >= 2 for m in r2["metrics"])
