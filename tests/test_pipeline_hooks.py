"""Executable user-extension surface (VERDICT r1 top item): a custom
fetcher + parser + validator + sinks pipeline crawls end-to-end, and the
io fetch path (per-host fetch tasks) is byte-identical to the light path.

Reference parity targets: Pipeline.scala:10-18, PipelineBuilder.scala:56-68,
skip path TasksBatchController.scala:115-120, consumer
simple-worker/.../App.scala:12-32.
"""

import json

import numpy as np
import pyarrow as pa
import pytest

from cloud_crawler_ray.pipelines import semantics as sem, synthweb as sw
from cloud_crawler_ray.pipelines.api import build_pipeline

# non-default seed + proxy pool so io-vs-light identity catches any stage
# falling back to a default WebConfig (e.g. for proxy rotation)
CFG = sw.WebConfig(n_hosts=8, pages_per_host=60, n_seed_hosts=5, max_links=4, seed=7, n_proxies=3)
P, S, K, WAVES = 4, 2, 20, 3


def make_custom_pipeline(cfg):
    """Custom hooks defined locally so cloudpickle ships them by value to
    Ray workers (a real user's module would be importable instead)."""

    class IoSyntheticFetcher:
        """A NON-light fetcher that fetches the same synthetic web — drives
        the io path (FetchHostGroup per-host tasks) with known outcomes."""

        def __init__(self, cfg):
            self.cfg = cfg

        def __call__(self, url, url_hash, attempt, try_idx, ua):
            assert ua.startswith("Mozilla/5.0")  # UA is threaded into the fetch path
            kind = sw.try_result(sw.outcome_for_scalar(url_hash, self.cfg), try_idx)
            body = f"BODY:{url}".encode() if kind == "ok" else None
            return kind, body

    class IoSyntheticParser:
        """Custom parser: same out-links as the synthetic web, plus a record
        proving the parser saw the fetcher's body."""

        def __init__(self, cfg):
            self.cfg = cfg

        def __call__(self, url, url_hash, body):
            assert body is not None and body.startswith(b"BODY:")
            links = sw.out_links(url, int(url_hash), self.cfg)
            return links, {"url": url, "n_links": len(links), "body_len": len(body)}

    def validate(t: pa.Table) -> np.ndarray:
        # reproduces the synthetic robots rules (the io path has no built-in
        # robots — pre-fetch skipping is the validator hook's job)
        keep = np.ones(t.num_rows, bool)
        for i, (u, h) in enumerate(zip(t["url"].to_pylist(), t["host"].to_pylist())):
            pid = sw.page_id_of([u])[0]
            keep[i] = not sw.robots_disallowed(h, np.array([pid]), cfg)[0]
        return keep

    def record_sink(t: pa.Table) -> pa.Table:
        recs = [json.loads(r) for r in t["record"].to_pylist()]
        return pa.table(
            {
                "url": pa.array([r["url"] for r in recs], pa.string()),
                "url_hash": t["url_hash"],
                "n_links": pa.array([r["n_links"] for r in recs], pa.int64()),
            }
        )

    def raw_sink(t: pa.Table) -> pa.Table:
        return pa.table({"url_hash": t["url_hash"], "body": t["body"]})

    return build_pipeline(
        "custom-io",
        IoSyntheticFetcher(cfg),
        parser=IoSyntheticParser(cfg),
        save_parsed=record_sink,
        save_raw=raw_sink,
        validator=validate,
    )


@pytest.fixture(scope="module")
def light_run(ray_session, tmp_path_factory):
    from cloud_crawler_ray.pipelines.wave import CrawlEngine

    root = str(tmp_path_factory.mktemp("hooks") / "light")
    eng = CrawlEngine.start(root, CFG, num_partitions=P, num_shards=S, wave_cap_per_partition=K)
    eng.run(max_waves=WAVES)
    yield eng
    eng.shutdown_shards()


@pytest.fixture(scope="module")
def io_run(ray_session, tmp_path_factory):
    from cloud_crawler_ray.pipelines.wave import CrawlEngine

    pipeline = make_custom_pipeline(CFG)
    root = str(tmp_path_factory.mktemp("hooks") / "io")
    eng = CrawlEngine.start(
        root, CFG, num_partitions=P, num_shards=S, wave_cap_per_partition=K, pipeline=pipeline
    )
    eng.run(max_waves=WAVES)
    yield eng
    eng.shutdown_shards()


class TestCustomPipeline:
    def test_io_path_matches_light_path(self, light_run, io_run):
        """Same web, same rules → identical frontier and crawl order whether
        fetched in-claim (light) or via per-host fetch tasks (io) — the
        validator reproduces robots, so every status transition matches."""
        lf = light_run.frontier.to_arrow().sort_by("url_hash")
        iof = io_run.frontier.to_arrow().sort_by("url_hash")
        assert lf.equals(iof)
        lo, io_ = light_run.crawl_order(), io_run.crawl_order()
        assert lo.equals(io_)
        assert "ua" in lo.column_names  # UA recorded in the order table

    def test_validator_rows_marked_skipped(self, io_run):
        f = io_run.frontier.to_arrow(columns=["url", "host", "status"])
        robots_rows = [
            s
            for u, h, s in zip(f["url"].to_pylist(), f["host"].to_pylist(), f["status"].to_pylist())
            if sw.robots_disallowed(h, np.array([sw.page_id_of([u])[0]]), CFG)[0]
        ]
        # a robots row is either never claimed (WAIT) or validator-skipped —
        # it must never have been fetched
        assert robots_rows and all(s in (sem.WAIT, sem.SKIPPED) for s in robots_rows)
        assert any(s == sem.SKIPPED for s in robots_rows)

    def test_custom_parser_records_saved(self, io_run):
        parsed = io_run.images.to_arrow()
        assert parsed.num_rows > 0
        assert set(parsed.column_names) == {"url", "url_hash", "n_links"}
        # every DONE row produced exactly one parsed record
        f = io_run.frontier.to_arrow(columns=["status"])
        n_done = int((f["status"].to_numpy() == sem.DONE).sum())
        assert parsed.num_rows == n_done
        assert sorted(parsed["url"].to_pylist()) == sorted(set(parsed["url"].to_pylist()))

    def test_raw_bodies_saved(self, io_run):
        raw = io_run.raw.to_arrow()
        assert raw.num_rows > 0
        assert all(b.startswith(b"BODY:") for b in raw["body"].to_pylist())

    def test_save_raw_requires_io_fetcher(self):
        with pytest.raises(ValueError, match="non-light"):
            build_pipeline("t", sw.SyntheticWebFetcher(CFG), save_raw=lambda t: t)


class TestDeltaCommits:
    def test_status_deltas_not_frontier_rewrites(self, light_run):
        """A wave's frontier commit is O(wave): del* files bounded by the
        wave cap, not a rewrite of every partition file (VERDICT r1 #1)."""
        import pyarrow.parquet as pq

        from cloud_crawler_ray.sources import frontier as fsrc

        files = light_run.frontier.partition_files()
        deltas = [p for paths in files.values() for p in paths if fsrc.is_delta(p)]
        assert deltas, "no delta files — waves are still rewriting partitions"
        for d in deltas:
            assert pq.read_metadata(d).num_rows <= K
        meta = light_run.frontier.manifest()["meta"]
        assert meta["selected"] <= P * K  # commit scope is wave-capped, not frontier-sized
        assert meta["frontier_bytes"] > 0

    def test_compaction_bounds_file_lists(self, ray_session, tmp_path):
        from cloud_crawler_ray.pipelines.wave import CrawlEngine

        eng = CrawlEngine.start(
            str(tmp_path / "compact"),
            CFG,
            num_partitions=P,
            num_shards=S,
            wave_cap_per_partition=K,
            compact_files=3,
        )
        eng.run(max_waves=6)
        try:
            files = eng.frontier.partition_files()
            assert all(len(paths) <= 3 for paths in files.values())
            assert any(m.get("compacted", 0) > 0 for m in eng.metrics_table().to_pylist())
            # compaction preserved the seen set vs the oracle-free invariant:
            # every url_hash unique
            uh = eng.frontier.to_arrow(columns=["url_hash"])["url_hash"].to_numpy()
            assert len(uh) == len(np.unique(uh))
        finally:
            eng.shutdown_shards()


class TestFetchFanOut:
    def test_io_fetch_groups_exceed_partition_count(self, io_run):
        """The io fetch exchange fans out one task per (partition, host):
        the number of distinct fetch groups a wave schedules exceeds P, so a
        hot or slow host cannot serialize its whole partition behind one
        task (VERDICT r1 'what's wrong' #3 — salting evidence)."""
        import pyarrow as pa

        from cloud_crawler_ray.stages.crawl import ClaimStage

        eng = io_run
        part_files = eng.frontier.partition_files(wave=-1)  # the seed frontier
        stage = ClaimStage(CFG, eng.pipeline, wave=0, k=K)
        rows = []
        for pid, paths in sorted(part_files.items()):
            t = stage(pa.table({"pid": pa.array([pid]), "paths": pa.array([paths])}))
            if t.num_rows:
                rows.append(t)
        claim = pa.concat_tables(rows)
        groups = set(claim["fetch_group"].to_pylist())
        assert len(groups) > P, f"only {len(groups)} fetch groups for P={P}"
        # every group maps to exactly one (partition, host)
        import collections

        seen = collections.defaultdict(set)
        for g, h, p in zip(
            claim["fetch_group"].to_pylist(), claim["host"].to_pylist(), claim["partition_id"].to_pylist()
        ):
            seen[g].add((p, h))
        assert all(len(v) == 1 for v in seen.values())
