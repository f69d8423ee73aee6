"""Job entry point — what ``ray job submit`` runs on a cluster.

    ray job submit -- python -m cloud_crawler_ray.job \
        --root /data/crawl1 --hosts 2000 --pages 400 --waves 3 \
        --partitions 64 --shards 8 --wave-cap 2000

Owns the Ray session (``address="auto"`` inside a cluster, local
otherwise — the ONLY library-adjacent place that calls ``ray.init``).
Resumes automatically if ``--root`` holds a previous run (crashed jobs are
re-submitted with the same command). Prints one JSON line per wave and a
final summary (the WorkerApp.run / notification analog: metrics rows, no
push channel — SURVEY.md §2.11).
"""

from __future__ import annotations

import argparse
import json
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="cloud_crawler_ray.job", description="Run a crawl job (resumable)")
    p.add_argument("--root", required=True, help="job directory (frontier/images/order tables live here)")
    p.add_argument("--hosts", type=int, default=100)
    p.add_argument("--pages", type=int, default=400)
    p.add_argument("--seed-hosts", type=int, default=None, help="default: all hosts")
    p.add_argument("--seeds-per-host", type=int, default=1)
    p.add_argument("--max-links", type=int, default=5)
    p.add_argument("--waves", type=int, default=10)
    p.add_argument("--partitions", type=int, default=32)
    p.add_argument("--shards", type=int, default=8)
    p.add_argument("--wave-cap", type=int, default=500, help="claim cap per partition per wave")
    p.add_argument("--img-min", type=int, default=16)
    p.add_argument("--img-max", type=int, default=64)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--num-cpus", type=int, default=None, help="local-mode CPU cap (ignored on a cluster)")
    p.add_argument(
        "--curate",
        action="store_true",
        help="run the curation flagship (filter→dedup→split) over --sf-dir "
        "instead of a crawl, writing the corpus under --root via the "
        "resumable partitioned sink (re-running skips committed buckets)",
    )
    p.add_argument("--sf-dir", default="/root/testdata/sf0.001", help="--curate input tables dir")
    p.add_argument("--buckets", type=int, default=16, help="--curate output hash buckets")
    p.add_argument("--format", default="parquet", choices=("parquet", "jsonl"), help="--curate shard format")
    p.add_argument(
        "--task-types",
        default=None,
        help="comma-separated task-type names → one sub-job per type under --root, "
        "waves dispatched round-robin (multi-project master analog); each type "
        "crawls its own synthetic web (seed = --seed + index in sorted order)",
    )
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    import ray

    if not ray.is_initialized():
        try:  # inside a cluster (ray job submit) this attaches to it
            ray.init(address="auto", ignore_reinit_error=True, logging_level="ERROR")
        except ConnectionError:
            ray.init(
                address="local",
                num_cpus=args.num_cpus,
                include_dashboard=False,
                ignore_reinit_error=True,
                logging_level="ERROR",
            )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    try:
        if args.curate:
            from . import queries as q
            from .sources.output import resumable_write

            make_ds, curated = q.curation_bucket_writer(args.sf_dir, args.buckets)
            res = resumable_write(
                make_ds, args.root, range(args.buckets), file_format=args.format
            )
            print(
                json.dumps(
                    {
                        "event": "summary",
                        "mode": "curate",
                        "out": args.root,
                        "format": args.format,
                        "buckets": args.buckets,
                        "written": len(res["written"]),
                        "skipped": len(res["skipped"]),
                        "docs_out": curated.count(),
                    }
                )
            )
            return 0

        from .pipelines import synthweb as sw
        from .pipelines.api import CrawlJobConfig, run_crawl, run_multi_crawl

        def mk_config(seed: int) -> CrawlJobConfig:
            return CrawlJobConfig(
                web=sw.WebConfig(
                    seed=seed,
                    n_hosts=args.hosts,
                    pages_per_host=args.pages,
                    n_seed_hosts=args.seed_hosts if args.seed_hosts is not None else args.hosts,
                    seeds_per_host=args.seeds_per_host,
                    max_links=args.max_links,
                    img_min=args.img_min,
                    img_max=args.img_max,
                ),
                num_partitions=args.partitions,
                num_shards=args.shards,
                wave_cap_per_partition=args.wave_cap,
                max_waves=args.waves,
            )

        if args.task_types:
            names = sorted(n.strip() for n in args.task_types.split(",") if n.strip())
            specs = {name: (None, mk_config(args.seed + i)) for i, name in enumerate(names)}
            result = run_multi_crawl(args.root, specs)
            for name in result["task_types"]:
                for m in result["metrics"][name]:
                    print(json.dumps({"event": "wave", "task_type": name, **m}))
            print(json.dumps({"event": "summary", "waves_run": result["waves_run"]}))
            return 0
        result = run_crawl(args.root, mk_config(args.seed))
        for m in result["metrics"]:
            print(json.dumps({"event": "wave", **m}))
        totals = {
            k: sum(m[k] for m in result["metrics"]) for k in ("selected", "fetched", "done", "new")
        } if result["metrics"] else {}
        print(json.dumps({"event": "summary", "waves_run": result["waves_run"], **totals}))
        return 0
    finally:
        ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
