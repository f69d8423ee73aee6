"""User-facing pipeline API — the reference's extension surface, Ray-native.

Maps the reference hooks (SURVEY.md §2.11):

  Pipeline[T] {taskType, crawler, parser?, saveRawProvider?,
               saveParsedProvider?, batchTasksValidator}   → CrawlPipeline
  PipelineBuilder (validation: crawler required; parser ⇔ saveParsed
               both-or-neither, PipelineBuilder.scala:56-68) → build()
  ConfigurablePipeline {batchSize, resourceType, ...}       → CrawlJobConfig
  WorkerApp.addWarmUpPipeline(...).run()                    → run_crawl()

Each hook is a *batch-level* callable (Arrow table in/out) instead of the
reference's per-record trait methods; the defaults are the synthetic-web
stages, and a user swaps in their own fetcher/parser/sinks.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from . import synthweb as sw


@dataclass(frozen=True)
class CrawlPipeline:
    """The user-extension bundle (Pipeline.scala:10-18 analog).

    fetcher     — batch fetch fn (url rows → body/outcome rows); required
    parser      — batch parse fn (body rows → parsed rows + out-links)
    save_parsed — sink for parsed rows (required iff parser given)
    save_raw    — sink for raw payload rows (optional)
    validator   — batch predicate marking rows to skip pre-fetch (optional;
                  BatchTasksValidator.scala:5-7 analog)
    task_type   — pipeline name (routing key)
    """

    task_type: str
    fetcher: Callable
    parser: Callable | None = None
    save_parsed: Callable | None = None
    save_raw: Callable | None = None
    validator: Callable | None = None

    def __post_init__(self):
        # PipelineBuilder.scala:56-68 validation parity
        if self.fetcher is None:
            raise ValueError("crawler/fetcher is required")
        if (self.parser is None) != (self.save_parsed is None):
            raise ValueError("parser and save_parsed must be provided together (both or neither)")


@dataclass(frozen=True)
class CrawlJobConfig:
    """Runtime half (ConfigurablePipeline.scala:5-10 + worker.conf analogs)."""

    web: sw.WebConfig = field(default_factory=sw.WebConfig)
    num_partitions: int = 8
    num_shards: int = 4
    wave_cap_per_partition: int = 50  # workerBatchSize analog
    max_waves: int = 20
    decode_batch_size: int = 64


def build_pipeline(task_type: str, fetcher: Callable, **hooks) -> CrawlPipeline:
    """Builder entry (PipelineBuilder analog; validation in __post_init__)."""
    return CrawlPipeline(task_type=task_type, fetcher=fetcher, **hooks)


def run_crawl(root: str, config: CrawlJobConfig, max_waves: int | None = None) -> dict:
    """WorkerApp.run analog: start (or resume) a crawl job at ``root``.

    Ray must already be initialised by the caller (driver/bench/test owns
    the session). Resumes from the last committed wave if ``root`` holds a
    previous run.
    """
    import os

    from .wave import CrawlEngine

    if os.path.exists(os.path.join(root, "config.json")):
        eng = CrawlEngine.resume(root)
    else:
        eng = CrawlEngine.start(
            root,
            config.web,
            num_partitions=config.num_partitions,
            num_shards=config.num_shards,
            wave_cap_per_partition=config.wave_cap_per_partition,
            decode_batch_size=config.decode_batch_size,
        )
    try:
        return eng.run(max_waves=max_waves if max_waves is not None else config.max_waves)
    finally:
        eng.shutdown_shards()
