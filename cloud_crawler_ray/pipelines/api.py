"""User-facing pipeline API — the reference's extension surface, Ray-native.

Maps the reference hooks (SURVEY.md §2.11):

  Pipeline[T] {taskType, crawler, parser?, saveRawProvider?,
               saveParsedProvider?, batchTasksValidator}   → CrawlPipeline
  PipelineBuilder (validation: crawler required; parser ⇔ saveParsed
               both-or-neither, PipelineBuilder.scala:56-68) → build()
  ConfigurablePipeline {batchSize, resourceType, ...}       → CrawlJobConfig
  WorkerApp.addWarmUpPipeline(...).run()                    → run_crawl()

Unlike round 1, the hooks are EXECUTED: CrawlEngine threads them through the
claim/fetch/commit stages (pipelines/wave.py), so a user registers a custom
fetcher + parser + validator + sinks and the engine crawls with them — the
worker-library contract of the reference (consumer example
simple-worker/.../App.scala:12-32).

Hook contracts
--------------
fetcher(url, url_hash, attempt, try_idx, ua) -> (kind, body)
    kind ∈ {"ok","not_found","parse_error","io_error","banned"}; body is an
    arbitrary bytes/str payload (or None). Called inside the politeness
    state machine (semantics.fetch_host_wave) — one call per try, rate-
    limited by the host token bucket, ban/circuit-breaker routing applied.
    A fetcher with a truthy ``light`` attribute declares its outcome a pure
    function of (url, url_hash): the engine then runs the state machine in
    the claim task and spreads parse/decode work over uniform batches (the
    hot-host salting path); bodies are NOT retained in light mode.
parser(url, url_hash, body) -> (links, record)
    links: raw hrefs for frontier expansion; record: anything picklable to
    hand to save_parsed (or None). Raising → status PARSE_FAILED
    (ParsingException → taskParsingFailed) on BOTH paths: a custom parser
    in light mode runs at fetch time inside the claim task (receiving the
    light fetcher's body, which is not retained afterwards), so the
    PARSE_FAILED status lands in the same wave's delta exactly as on the
    io path. Only the built-in synthetic parser defers link generation to
    uniform downstream batches.
validator(table: pa.Table) -> bool mask (True = crawl)
    Batch predicate over the claimed rows (columns url, url_hash, host,
    depth, attempt, ...). Rejected rows are marked SKIPPED without fetching
    (BatchTasksValidator.scala:5-7; skip path TasksBatchController.scala:
    115-120) — they consume wave slots but no politeness budget.
save_parsed(table: pa.Table) -> pa.Table
    Row-shaper for the parsed-output table: receives the wave's DONE rows
    (with a ``record`` column for user parsers), returns the rows to append
    to the job's parsed table (root/images). The engine owns fragment
    writes + manifest commits (SaveParsedProvider analog — persistence is
    the engine's LanceLikeTable; pluggable filesystems cover the S3/Mongo
    sink variants).
save_raw(table: pa.Table) -> pa.Table
    Same, for raw fetch bodies (root/raw; SaveRawProvider analog). Requires
    a non-light fetcher (bodies are only retained on the io path).
notifier(table: pa.Table) -> None
    Per-failure notification hook (BaseNotification.scala:3-5, fired from
    TasksBatchController.scala:147-153): invoked once per batch of
    PARSE_FAILED rows each wave (columns url, url_hash, host, status,
    attempt), inside a Ray task. A user observes individual parse failures
    without scanning frontier statuses. Failures in the notifier itself
    never fail the wave (reference parity: notifications are best-effort).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from . import synthweb as sw


@dataclass(frozen=True)
class CrawlPipeline:
    """The user-extension bundle (Pipeline.scala:10-18 analog)."""

    task_type: str
    fetcher: Callable
    parser: Callable | None = None
    save_parsed: Callable | None = None
    save_raw: Callable | None = None
    validator: Callable | None = None
    notifier: Callable | None = None

    def __post_init__(self):
        # PipelineBuilder.scala:56-68 validation parity
        if self.fetcher is None:
            raise ValueError("crawler/fetcher is required")
        if (self.parser is None) != (self.save_parsed is None):
            raise ValueError("parser and save_parsed must be provided together (both or neither)")
        if self.save_raw is not None and self.light:
            raise ValueError("save_raw requires a non-light fetcher (bodies are not retained in light mode)")

    @property
    def light(self) -> bool:
        """True → claim-task state machine + uniform downstream parse/decode."""
        return bool(getattr(self.fetcher, "light", False))

    @property
    def user_parser(self) -> bool:
        """True → a custom (non-synthetic) parser. In light mode such a
        parser runs at fetch time inside the claim task (with the fetcher's
        body), so a raising parser routes its row to PARSE_FAILED *before*
        the status delta is committed — the same ParsingException →
        taskParsingFailed contract as the io path
        (TasksBatchController.scala:152-158). Exact-type check: a SUBCLASS
        of SyntheticWebParser is user code and gets the user contract."""
        return self.parser is not None and type(self.parser) is not sw.SyntheticWebParser


def synthetic_pipeline(cfg: sw.WebConfig) -> CrawlPipeline:
    """The default pipeline: synthetic-web crawler + parser + image sink
    (what simple-worker's HabrPipeline is to the reference library)."""
    from ..stages.crawl import make_image_sink

    return CrawlPipeline(
        task_type="synthweb-images",
        fetcher=sw.SyntheticWebFetcher(cfg),
        parser=sw.SyntheticWebParser(cfg),
        save_parsed=make_image_sink(cfg),
    )


@dataclass(frozen=True)
class CrawlJobConfig:
    """Runtime half (ConfigurablePipeline.scala:5-10 + worker.conf analogs)."""

    web: sw.WebConfig = field(default_factory=sw.WebConfig)
    num_partitions: int = 8
    num_shards: int = 4
    wave_cap_per_partition: int = 50  # workerBatchSize analog
    max_waves: int = 20
    decode_batch_size: int = 64
    compact_files: int = 8  # consolidate a partition when its file list reaches this


def build_pipeline(task_type: str, fetcher: Callable, **hooks) -> CrawlPipeline:
    """Builder entry (PipelineBuilder analog; validation in __post_init__)."""
    return CrawlPipeline(task_type=task_type, fetcher=fetcher, **hooks)


def run_multi_crawl(
    root: str,
    specs: dict[str, tuple[CrawlPipeline | None, CrawlJobConfig]],
    max_rounds: int | None = None,
    chains: dict[str, str] | None = None,
) -> dict:
    """Multi task-type job: several pipelines in one job, dispatched
    round-robin (QueueTaskServiceImpl.scala:32-66 — the master serves each
    advertised task type in turn; TaskTypeWithBatchSize advertisement).

    Each task type owns its frontier/images/order tables under
    ``root/<task_type>``; every round runs one wave of each non-drained
    task type in deterministic (sorted task_type) order, so output is a
    pure function of the specs — independent of scheduling. Resumable per
    task type (each sub-job keeps its own wave manifests).

    ``chains={"a": "b"}`` is the projectId → nextProjectId chaining of the
    reference (task.proto:7-17; SqlQueueTaskProvider joins next_project_id):
    URLs that reach DONE in a wave of task type "a" are pushed onto "b"'s
    frontier (pushTasks analog — anti-join dedup, idempotent), reviving "b"
    if it had drained.
    """
    import os

    from .wave import CrawlEngine

    engines: dict[str, CrawlEngine] = {}
    for name in sorted(specs):
        pipeline, config = specs[name]
        sub = os.path.join(root, name)
        if os.path.exists(os.path.join(sub, "config.json")):
            engines[name] = CrawlEngine.resume(sub, pipeline=pipeline)
        else:
            engines[name] = CrawlEngine.start(
                sub,
                config.web,
                num_partitions=config.num_partitions,
                num_shards=config.num_shards,
                wave_cap_per_partition=config.wave_cap_per_partition,
                decode_batch_size=config.decode_batch_size,
                compact_files=config.compact_files,
                pipeline=pipeline,
            )
    caps = {name: (max_rounds if max_rounds is not None else specs[name][1].max_waves) for name in specs}
    chains = chains or {}
    for src, dst in chains.items():
        if src not in engines or dst not in engines:
            raise ValueError(f"chain {src!r} -> {dst!r} references unknown task type")
    metrics: dict[str, list] = {name: [] for name in engines}
    active = set(engines)
    try:
        while active:
            for name in sorted(active.copy()):
                eng = engines[name]
                wave = eng.frontier.latest_wave() + 1
                if wave >= caps[name]:
                    active.discard(name)
                    continue
                m = eng.run_wave(wave)
                if m is None:
                    active.discard(name)  # this task type's frontier drained
                    continue
                metrics[name].append(m)
                dst = chains.get(name)
                if dst is not None:
                    done_urls = eng.wave_done_urls(wave)
                    if done_urls:
                        pushed = engines[dst].push_tasks(done_urls)
                        m["chained_to"] = dst
                        m["chained_pushed"] = pushed
                        if pushed and dst not in active and engines[dst].frontier.latest_wave() + 1 < caps[dst]:
                            active.add(dst)  # revived by new work
        return {
            "task_types": sorted(engines),
            "waves_run": {name: len(ms) for name, ms in metrics.items()},
            "metrics": metrics,
        }
    finally:
        for eng in engines.values():
            eng.shutdown_shards()


def run_crawl(
    root: str,
    config: CrawlJobConfig,
    max_waves: int | None = None,
    pipeline: CrawlPipeline | None = None,
) -> dict:
    """WorkerApp.run analog: start (or resume) a crawl job at ``root``.

    Ray must already be initialised by the caller (driver/bench/test owns
    the session). Resumes from the last committed wave if ``root`` holds a
    previous run. ``pipeline=None`` → the synthetic default; a resumed job
    must be given the same pipeline it started with (hooks are code, not
    state — only the config is persisted).
    """
    import os

    from .wave import CrawlEngine

    if os.path.exists(os.path.join(root, "config.json")):
        eng = CrawlEngine.resume(root, pipeline=pipeline)
    else:
        eng = CrawlEngine.start(
            root,
            config.web,
            num_partitions=config.num_partitions,
            num_shards=config.num_shards,
            wave_cap_per_partition=config.wave_cap_per_partition,
            decode_batch_size=config.decode_batch_size,
            compact_files=config.compact_files,
            pipeline=pipeline,
        )
    try:
        return eng.run(max_waves=max_waves if max_waves is not None else config.max_waves)
    finally:
        eng.shutdown_shards()
