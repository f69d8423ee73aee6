"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash →
CORRECTNESS_r{N}.json).

Ray is initialised by the driver BEFORE this module is imported: neither
this module nor the ``cloud_crawler_ray`` library calls ``ray.init()`` /
``ray.shutdown()`` — only ``bench.py`` and the pytest session fixture own
a Ray session.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001 (driver checks rows>=0).

    Runs the crawl-engine flagship when available, else the document
    quality+dedup pipeline.
    """
    from cloud_crawler_ray import queries as q

    return q.flagship("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2."""
    from cloud_crawler_ray import queries as q

    return dict(q.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query (same column names)."""
    from cloud_crawler_ray import queries as q

    # the crawl_* oracles read a parquet dump of the single-process oracle
    # simulator; write it now so the SQL side works whichever side of the
    # compare the driver runs first
    q.ensure_crawl_oracle_dump()
    q.ensure_phash_oracle_dump()
    q.ensure_image_oracle_dump()
    q.ensure_audio_oracle_dump()
    # per-input dump: the driver's correctness gate runs at sf=0.01; the
    # SQL side selects the dump file by input fingerprint, so a different
    # sf simply yields a loud 0-row mismatch instead of stale data
    q.ensure_ivf_oracle_dump("/root/testdata/sf0.01")
    return dict(q.ORACLE_SQL)
