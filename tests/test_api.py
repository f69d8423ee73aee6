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


class TestJobCLI:
    def test_job_cli_runs_and_resumes(self, tmp_path):
        import json
        import subprocess
        import sys

        root = str(tmp_path / "job_cli")
        cmd = [sys.executable, "-m", "cloud_crawler_ray.job", "--root", root,
               "--hosts", "4", "--pages", "20", "--seed-hosts", "2", "--waves", "2",
               "--partitions", "2", "--shards", "1", "--wave-cap", "8", "--num-cpus", "4"]
        out = subprocess.run(cmd, capture_output=True, text=True, cwd="/root/repo", check=True).stdout
        events = [json.loads(line) for line in out.strip().splitlines()]
        assert events[-1]["event"] == "summary" and events[-1]["waves_run"] >= 1
        # resume continues past wave 2
        cmd[cmd.index("--waves") + 1] = "3"
        out2 = subprocess.run(cmd, capture_output=True, text=True, cwd="/root/repo", check=True).stdout
        waves = [json.loads(line)["wave"] for line in out2.strip().splitlines() if '"wave"' in line and '"event": "wave"' in line]
        assert all(w >= 2 for w in waves)

    def test_job_cli_curate_mode_writes_then_skips(self, tmp_path):
        import json
        import subprocess
        import sys

        root = str(tmp_path / "corpus")
        cmd = [sys.executable, "-m", "cloud_crawler_ray.job", "--root", root,
               "--curate", "--sf-dir", "/root/testdata/sf0.001", "--buckets", "4",
               "--format", "jsonl", "--num-cpus", "4"]
        out = subprocess.run(cmd, capture_output=True, text=True, cwd="/root/repo", check=True).stdout
        s1 = json.loads(out.strip().splitlines()[-1])
        assert s1["mode"] == "curate" and s1["written"] == 4 and s1["skipped"] == 0
        assert s1["docs_out"] > 0
        # a re-submitted job skips every committed bucket
        out2 = subprocess.run(cmd, capture_output=True, text=True, cwd="/root/repo", check=True).stdout
        s2 = json.loads(out2.strip().splitlines()[-1])
        assert s2["written"] == 0 and s2["skipped"] == 4 and s2["docs_out"] == s1["docs_out"]


class TestMultiTaskType:
    """Multi task-type dispatch (QueueTaskServiceImpl.scala:32-66 analog):
    several pipelines round-robin in one job, each with its own frontier."""

    def _specs(self):
        def cfg(seed):
            return CrawlJobConfig(
                web=sw.WebConfig(seed=seed, n_hosts=5, pages_per_host=20, n_seed_hosts=3, max_links=3),
                num_partitions=2,
                num_shards=1,
                wave_cap_per_partition=8,
                max_waves=3,
            )

        return {"imagesA": (None, cfg(42)), "imagesB": (None, cfg(43))}

    def test_both_frontiers_progress_deterministically(self, ray_session, tmp_path):
        from cloud_crawler_ray.pipelines.api import run_multi_crawl
        from cloud_crawler_ray.pipelines.wave import CrawlEngine

        r1 = run_multi_crawl(str(tmp_path / "job1"), self._specs())
        assert r1["task_types"] == ["imagesA", "imagesB"]
        assert all(n >= 1 for n in r1["waves_run"].values())
        # different seeds → genuinely different webs
        a = CrawlEngine.resume(str(tmp_path / "job1" / "imagesA"))
        b = CrawlEngine.resume(str(tmp_path / "job1" / "imagesB"))
        ha = np.sort(a.frontier.to_arrow(columns=["url_hash"])["url_hash"].to_numpy())
        hb = np.sort(b.frontier.to_arrow(columns=["url_hash"])["url_hash"].to_numpy())
        assert not np.array_equal(ha, hb)
        # a second identical job produces identical outputs (determinism)
        run_multi_crawl(str(tmp_path / "job2"), self._specs())
        a2 = CrawlEngine.resume(str(tmp_path / "job2" / "imagesA"))
        assert np.array_equal(ha, np.sort(a2.frontier.to_arrow(columns=["url_hash"])["url_hash"].to_numpy()))
        assert a.crawl_order().equals(a2.crawl_order())

    def test_resume_continues_both(self, ray_session, tmp_path):
        from cloud_crawler_ray.pipelines.api import run_multi_crawl

        root = str(tmp_path / "jobr")
        r1 = run_multi_crawl(root, self._specs(), max_rounds=1)
        assert all(n == 1 for n in r1["waves_run"].values())
        r2 = run_multi_crawl(root, self._specs(), max_rounds=3)
        for name, ms in r2["metrics"].items():
            assert all(m["wave"] >= 1 for m in ms), name


class TestPushTasksAndChaining:
    """pushTasks RPC analog + projectId→nextProjectId chaining
    (task.proto:7-17; QueueTaskService.pushTasks; anti-join dedup
    SqlQueueTaskProvider.scala:58-68)."""

    def test_push_tasks_dedup_and_idempotence(self, ray_session, tmp_path):
        from cloud_crawler_ray.pipelines.wave import CrawlEngine

        cfg = sw.WebConfig(n_hosts=4, pages_per_host=30, n_seed_hosts=2, max_links=2)
        eng = CrawlEngine.start(str(tmp_path / "push"), cfg, num_partitions=2, num_shards=1,
                                wave_cap_per_partition=10)
        eng.run(max_waves=2)
        try:
            before = eng.frontier.base_row_count()
            existing = eng.frontier.to_arrow(columns=["url"])["url"].to_pylist()[0]
            new_urls = [cfg.page_url(3, 25), cfg.page_url(3, 26), cfg.page_url(3, 25), existing]
            n = eng.push_tasks(new_urls)
            assert n == 2  # in-batch dup + already-known url filtered out
            assert eng.frontier.base_row_count() == before + 2
            assert eng.push_tasks(new_urls) == 0  # idempotent re-push
            assert eng.frontier.base_row_count() == before + 2
            # pushed rows are crawlable: the next wave picks them up
            r = eng.run(max_waves=6)
            uh = eng.frontier.to_arrow(columns=["url_hash"])["url_hash"].to_numpy()
            assert len(uh) == len(np.unique(uh))
        finally:
            eng.shutdown_shards()

    def test_chained_task_types(self, ray_session, tmp_path):
        from cloud_crawler_ray.functions.hashing import hash64
        from cloud_crawler_ray.pipelines.api import run_multi_crawl
        from cloud_crawler_ray.pipelines.wave import CrawlEngine
        from cloud_crawler_ray.pipelines import semantics as sem

        def cfg(seed, seeds):
            return CrawlJobConfig(
                web=sw.WebConfig(seed=seed, n_hosts=4, pages_per_host=20, n_seed_hosts=seeds, max_links=2),
                num_partitions=2, num_shards=1, wave_cap_per_partition=8, max_waves=3,
            )

        specs = {"alpha": (None, cfg(42, 2)), "beta": (None, cfg(43, 0))}  # beta starts empty
        root = str(tmp_path / "chain")
        r = run_multi_crawl(root, specs, chains={"alpha": "beta"})
        assert any(m.get("chained_pushed", 0) > 0 for m in r["metrics"]["alpha"])
        assert r["waves_run"]["beta"] >= 1  # beta revived by alpha's pushes
        a = CrawlEngine.resume(root + "/alpha")
        b = CrawlEngine.resume(root + "/beta")
        af = a.frontier.to_arrow(columns=["url", "status"])
        done_urls = [u for u, s in zip(af["url"].to_pylist(), af["status"].to_pylist()) if s == sem.DONE]
        b_hashes = set(b.frontier.to_arrow(columns=["url_hash"])["url_hash"].to_pylist())
        missing = [u for u in done_urls if int(hash64([u])[0]) not in b_hashes]
        assert not missing, f"alpha DONE urls absent from beta frontier: {missing[:3]}"
