"""Single-process oracle simulator — the conformance anchor (SURVEY.md §5.3).

Implements the reference crawl-loop semantics (SURVEY.md §3.3, pinned by
pipelines/semantics.py) in plain Python/numpy: frontier dict, first-discovery
-wins dedup, per-partition top-k selection, per-host politeness-ordered
fetch, outcome routing, attempt caps. The distributed Ray engine
(pipelines/wave.py) must reproduce this oracle's final URL-seen set, per-row
statuses and global crawl order exactly.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa

from ..functions.hashing import hash64
from ..functions.urls import canonicalize, extract_host, host_partition, resolve_links
from . import semantics as sem
from . import synthweb as sw


@dataclass
class OracleResult:
    frontier: pa.Table  # final frontier with statuses
    order: pa.Table  # (fetch_seq, wave, vtime, url_hash, host)
    images: pa.Table  # input_hint schema
    seen: np.ndarray  # sorted uint64
    metrics: list[dict] = field(default_factory=list)


def _canon_candidates(parent_url: str, parent_hash: int, parent_depth: int, hrefs: list[str]):
    """Canonicalize one page's hrefs → (canon_url, link_index) keeping order."""
    scheme = parent_url.split("://", 1)[0]
    host = extract_host([parent_url])[0].as_py()
    resolved = resolve_links(hrefs, scheme, host)
    canon = canonicalize(resolved.fill_null(""))
    out = []
    for idx, u in enumerate(canon.to_pylist()):
        if u:
            out.append((u, idx))
    return out


def run_oracle(
    cfg: sw.WebConfig,
    num_partitions: int = 8,
    wave_cap_per_partition: int = 50,
    max_waves: int = 20,
) -> OracleResult:
    rows: dict[int, dict] = {}  # url_hash -> frontier row
    metrics: list[dict] = []

    def insert(url: str, depth: int, discovered_at: int, parent_hash: int, link_index: int) -> None:
        h = int(hash64([url])[0])
        if h in rows:
            return  # first discovery wins
        host = extract_host([url])[0].as_py()
        rows[h] = {
            "url": url,
            "url_hash": h,
            "host": host,
            "depth": depth,
            "priority": float(sw.priority_of(np.array([h], np.uint64), np.array([depth]))[0]),
            "status": sem.WAIT,
            "attempt": 0,
            "discovered_at": discovered_at,
            "parent_hash": parent_hash,
            "link_index": link_index,
            "partition_id": int(host_partition([host], num_partitions, seed=cfg.seed)[0]),
        }

    for i, u in enumerate(canonicalize(cfg.seed_urls()).to_pylist()):
        insert(u, 0, 0, 0, i)

    fetch_log: list[tuple[int, int, int, str]] = []  # (wave, vtime, url_hash, host)
    images: list[dict] = []

    for wave in range(max_waves):
        # --- rule (a): per-partition top-k selection
        selected: list[dict] = []
        by_part: dict[int, list[dict]] = {}
        for r in rows.values():
            if r["status"] == sem.WAIT and r["attempt"] < cfg.max_attempts:
                by_part.setdefault(r["partition_id"], []).append(r)
        for part_rows in by_part.values():
            part_rows.sort(key=lambda r: (r["priority"], r["url_hash"]))
            selected.extend(part_rows[:wave_cap_per_partition])
        if not selected:
            break

        # --- rule (b)+(c)+(d): per-host ordered fetch
        by_host: dict[str, list[dict]] = {}
        for r in selected:
            by_host.setdefault(r["host"], []).append(r)

        candidates: list[tuple[str, int, int, int, int]] = []  # url, parent_hash, link_index, depth, child_hash
        n_done = 0
        for host, hrows in by_host.items():
            hrows.sort(key=lambda r: (r["discovered_at"], r["priority"], r["url_hash"]))
            res = sem.fetch_host_wave(
                host,
                wave,
                [r["url"] for r in hrows],
                np.array([r["url_hash"] for r in hrows], np.uint64),
                np.array([r["attempt"] for r in hrows], np.int32),
                cfg,
            )
            for i, r in enumerate(hrows):
                r["status"] = int(res.status[i])
                r["attempt"] = int(res.attempt[i])
                if res.fetched[i]:
                    fetch_log.append((wave, int(res.vtime[i]), r["url_hash"], host))
                if res.status[i] == sem.DONE:
                    n_done += 1
                    payload = sw.image_payload(r["url_hash"], cfg)
                    payload["phash"] = sw.decode_and_phash(payload)
                    images.append(payload)
                    for u, idx in _canon_candidates(r["url"], r["url_hash"], r["depth"], res.links[i] or []):
                        candidates.append((u, r["url_hash"], idx, r["depth"] + 1, int(hash64([u])[0])))

        # --- within-wave dedup: keep min (parent_hash, link_index) per child
        best: dict[int, tuple] = {}
        for u, ph, idx, depth, ch in candidates:
            cur = best.get(ch)
            if cur is None or (ph, idx) < (cur[1], cur[2]):
                best[ch] = (u, ph, idx, depth, ch)
        # --- cross-wave dedup + insert (discovered_at = wave + 1)
        n_new = 0
        for u, ph, idx, depth, ch in sorted(best.values(), key=lambda t: t[4]):
            if ch not in rows:
                insert(u, depth, wave + 1, ph, idx)
                n_new += 1

        metrics.append(
            {"wave": wave, "selected": len(selected), "done": n_done, "candidates": len(candidates), "new": n_new}
        )

    # ---- outputs
    ordered = sorted(fetch_log, key=lambda t: (t[0], t[1], t[2]))
    from ..functions.useragent import user_agents

    order = pa.table(
        {
            "fetch_seq": pa.array(range(len(ordered)), pa.int64()),
            "wave": pa.array([t[0] for t in ordered], pa.int32()),
            "vtime": pa.array([t[1] for t in ordered], pa.int64()),
            "url_hash": pa.array([t[2] for t in ordered], pa.uint64()),
            "host": pa.array([t[3] for t in ordered], pa.string()),
            # deterministic per-request UA (UserAgentGenerator analog) — the
            # engine records the identical column in its order fragments
            "ua": pa.array(user_agents(np.array([t[2] for t in ordered], np.uint64)), pa.string()),
            # deterministic proxy rotation (least-used-resource analog)
            "proxy_id": pa.array(
                [int(sw.proxy_for(np.array([t[2]], np.uint64), t[0], cfg)[0]) for t in ordered],
                pa.int32(),
            ),
        }
    )
    rl = sorted(rows.values(), key=lambda r: r["url_hash"])
    frontier = pa.table(
        {
            "url": pa.array([r["url"] for r in rl], pa.string()),
            "url_hash": pa.array([r["url_hash"] for r in rl], pa.uint64()),
            "host": pa.array([r["host"] for r in rl], pa.string()),
            "depth": pa.array([r["depth"] for r in rl], pa.int32()),
            "priority": pa.array([r["priority"] for r in rl], pa.float32()),
            "status": pa.array([r["status"] for r in rl], pa.int8()),
            "attempt": pa.array([r["attempt"] for r in rl], pa.int32()),
            "discovered_at": pa.array([r["discovered_at"] for r in rl], pa.int32()),
            "parent_hash": pa.array([r["parent_hash"] for r in rl], pa.uint64()),
            "link_index": pa.array([r["link_index"] for r in rl], pa.int32()),
            "partition_id": pa.array([r["partition_id"] for r in rl], pa.int32()),
        }
    )
    images.sort(key=lambda d: d["image_id"])
    img = pa.table(
        {
            "image_id": pa.array([d["image_id"] for d in images], pa.string()),
            "bytes": pa.array([d["bytes"] for d in images], pa.binary()),
            "w": pa.array([d["w"] for d in images], pa.int32()),
            "h": pa.array([d["h"] for d in images], pa.int32()),
            "fmt": pa.array([d["fmt"] for d in images], pa.string()),
            "caption": pa.array([d["caption"] for d in images], pa.string()),
            "phash": pa.array([d["phash"] for d in images], pa.int64()),
        }
    )
    seen = np.sort(np.array(list(rows.keys()), np.uint64))
    return OracleResult(frontier, order, img, seen, metrics)
