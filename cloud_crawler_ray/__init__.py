"""cloud_crawler_ray — a Ray-Data-native crawl / data-processing engine.

Built from scratch with the capabilities of the reference crawler
(jaitl/cloud-crawler — Scala/Akka task-queue + worker pipeline; see SURVEY.md):
a URL frontier with exact first-discovery-wins dedup, politeness-gated fetching,
parse/decode stages, retry & outcome routing, and checkpointed resumable
execution — re-expressed as ``ray.data.Dataset`` pipelines of ``map_batches``
over zero-copy Arrow batches with actor pools for stateful stages.

Layout:
    functions/  stateless vectorized kernels (hashing, urls, text, imaging)
    state/      stateful structures (bloom, cuckoo, token buckets, checkpoints)
    sources/    table storage (Lance-style versioned parquet fragments, frontier)
    stages/     Ray Data stage callables (canonicalize, dedup, fetch, decode)
    pipelines/  wave driver, oracle simulator, synthetic web graph
    queries.py  operator inventory exposed over /root/testdata (driver gate)
"""

__version__ = "0.1.0"
