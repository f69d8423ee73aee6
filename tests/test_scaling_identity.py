"""Two-parallelism-level identity: the same crawl at num_cpus=2 and
num_cpus=8 (fresh Ray sessions via the job CLI) must produce byte-identical
frontier, crawl order and image tables — the in-pytest half of the
north_rule's N vs 4N criterion (bench.py --scaling measures the throughput
half)."""

import json
import subprocess
import sys

import numpy as np
import pyarrow.compute as pc


def _run_job(root: str, ncpu: int) -> list[dict]:
    cmd = [
        sys.executable, "-m", "cloud_crawler_ray.job", "--root", root,
        "--hosts", "8", "--pages", "60", "--seed-hosts", "4", "--waves", "3",
        "--partitions", "4", "--shards", "2", "--wave-cap", "20",
        "--max-links", "4", "--num-cpus", str(ncpu),
    ]
    out = subprocess.run(cmd, capture_output=True, text=True, cwd="/root/repo", check=True).stdout
    return [json.loads(line) for line in out.strip().splitlines()]


def test_outputs_identical_across_parallelism(tmp_path):
    from cloud_crawler_ray.pipelines.wave import CrawlEngine

    roots = {n: str(tmp_path / f"cpus{n}") for n in (2, 8)}
    summaries = {}
    for n, root in roots.items():
        events = _run_job(root, n)
        summaries[n] = events[-1]
    assert summaries[2]["fetched"] == summaries[8]["fetched"] > 0

    engines = {n: CrawlEngine.resume(r) for n, r in roots.items()}
    f2 = engines[2].frontier.to_arrow()
    f8 = engines[8].frontier.to_arrow()
    f2 = f2.take(pc.sort_indices(f2, sort_keys=[("url_hash", "ascending")]))
    f8 = f8.take(pc.sort_indices(f8, sort_keys=[("url_hash", "ascending")]))
    assert f2.num_rows == f8.num_rows
    for col in f2.column_names:
        assert np.array_equal(
            f2[col].to_numpy(zero_copy_only=False), f8[col].to_numpy(zero_copy_only=False)
        ), col

    o2, o8 = engines[2].crawl_order(), engines[8].crawl_order()
    assert o2.equals(o8)

    i2 = engines[2].images.to_arrow()
    i8 = engines[8].images.to_arrow()
    i2 = i2.take(pc.sort_indices(i2, sort_keys=[("image_id", "ascending")]))
    i8 = i8.take(pc.sort_indices(i8, sort_keys=[("image_id", "ascending")]))
    assert i2.num_rows == i8.num_rows
    assert i2["bytes"].to_pylist() == i8["bytes"].to_pylist()
    assert np.array_equal(i2["phash"].to_numpy(), i8["phash"].to_numpy())
