"""Deterministic synthetic web: pages, links, outcomes, images — PRF(url).

The sandbox has no network, so the "web" is a pure function of the URL: any
process (oracle simulator, distributed fetch actors, tests) computes the
same page without shared state. This replaces the reference's live HTTP
fetch (HabrCrawler.scala:12-24) and its fixture HTML (1k_post.html).

Outcome categories mirror the reference's failure routing
(TasksBatchController.scala:138-176):
  ok          → page body + links            (CrawlSuccessResult)
  not_found   → skipped, terminal            (PageNotFound → SkippedTask)
  parse_error → parse failure, terminal      (ParsingException → ParsingFailedTask)
  flaky       → io error on try 0, ok after  (IOException → in-batch requeue)
  io_always   → io error every try           (retry cap → FailedTask)
  banned      → terminal + host freeze       (BotBanned; master drops banned ids,
                                              QueueTaskServiceImpl.scala:78-167)

Every property derives from ``splitmix64(url_hash ^ salt)`` — no RNG state.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..functions.hashing import hash64, hash64_scalar, splitmix64
from ..functions.imaging import encode_image, phash64, synth_image

_U64 = np.uint64

OUTCOME_OK = "ok"
OUTCOME_NOT_FOUND = "not_found"
OUTCOME_PARSE_ERROR = "parse_error"
OUTCOME_FLAKY = "flaky"
OUTCOME_IO_ALWAYS = "io_always"
OUTCOME_BANNED = "banned"


@dataclass(frozen=True)
class WebConfig:
    """Shape of the synthetic web + crawl policy (shared by oracle & engine)."""

    seed: int = 42
    n_hosts: int = 24
    pages_per_host: int = 400
    n_seed_hosts: int = 8
    max_links: int = 5
    cross_host_ratio: int = 3  # 1 in N links is cross-host
    # politeness (reference RandomTimeout analog; per-host derived)
    base_center_ms: int = 100
    # crawl policy (reference parity: 3 in-batch tries, 3 cross-wave attempts)
    in_wave_tries: int = 3
    max_attempts: int = 3
    circuit_break_after: int = 3
    robots_modulus: int = 13  # pages with page_id % modulus == r(host) are disallowed
    n_proxies: int = 4  # proxy/Tor identity pool size (resource-rotation analog)
    # straggler control (worker.conf:15-16 batchExecutionTimeout = 1 h;
    # WorkerManager.scala:85-96 kills the batch controller and returns
    # incomplete tasks to the queue). None → no wall-clock limits (the
    # deterministic default: conformance/oracle runs never set these).
    batch_timeout_sec: float | None = None  # per host-group wall budget; expiry → rows stay WAIT
    fetch_timeout_sec: float | None = None  # per fetcher call (custom fetchers); expiry → io_error
    hot_hosts: tuple = ()  # hosts given pages_per_host * 8 pages (skew testing)
    seeds_per_host: int = 1  # seed pages 0..N-1 of each seed host
    img_min: int = 16  # image side lengths drawn from [img_min, img_max]
    img_max: int = 64

    def host_name(self, i: int) -> str:
        return f"host{i:03d}.example"

    def page_url(self, host_id: int, page_id: int) -> str:
        return f"http://{self.host_name(host_id)}/p{page_id}"

    def n_pages(self, host_id: int) -> int:
        n = self.pages_per_host
        if self.host_name(host_id) in self.hot_hosts:
            n *= 8
        return n

    def seed_urls(self) -> list[str]:
        return [
            self.page_url(i, j)
            for i in range(self.n_seed_hosts)
            for j in range(min(self.seeds_per_host, self.n_pages(i)))
        ]


def _mix(url_hash: np.ndarray | int, salt: int, seed: int) -> np.ndarray:
    h = np.asarray(url_hash, _U64)
    return splitmix64(h ^ _U64(salt * 0x9E3779B97F4A7C15 & 0xFFFFFFFFFFFFFFFF) ^ _U64(seed))


def outcome_for(url_hash, cfg: WebConfig) -> np.ndarray:
    """Outcome category per url (vectorized) — stable across waves/attempts."""
    h = _mix(url_hash, 1, cfg.seed) % _U64(100)
    out = np.full(np.shape(h), OUTCOME_OK, object)
    out[(h >= 86) & (h < 90)] = OUTCOME_NOT_FOUND
    out[(h >= 90) & (h < 93)] = OUTCOME_PARSE_ERROR
    out[(h >= 93) & (h < 96)] = OUTCOME_FLAKY
    out[(h >= 96) & (h < 98)] = OUTCOME_IO_ALWAYS
    out[h >= 98] = OUTCOME_BANNED
    return out


def try_result(outcome: str, try_idx: int) -> str:
    """Result of one fetch attempt: 'ok' | 'io_error' | terminal outcome."""
    if outcome == OUTCOME_FLAKY:
        return "io_error" if try_idx == 0 else "ok"
    if outcome == OUTCOME_IO_ALWAYS:
        return "io_error"
    return outcome


def outcome_for_scalar(url_hash: int, cfg: WebConfig) -> str:
    return str(outcome_for(np.array([url_hash], _U64), cfg)[0])


class SyntheticWebFetcher:
    """The default pipeline's crawler (HabrCrawler.scala:12-24 analog) as a
    per-call fetcher hook. ``light = True`` declares that outcomes are a pure
    function of (url, url_hash) — the engine may then run the politeness
    state machine inside the claim task and regenerate bodies downstream
    (semantics.fetch_host_wave takes its vectorized fast path)."""

    light = True

    def __init__(self, cfg: WebConfig):
        self.cfg = cfg

    def __call__(self, url: str, url_hash: int, attempt: int, try_idx: int, ua: str):
        return try_result(outcome_for_scalar(url_hash, self.cfg), try_idx), None


class SyntheticWebParser:
    """The default pipeline's parser (HabrParser.scala:16-29 analog): page →
    out-links, no separate parsed record (the image payload is regenerated
    from url_hash by the image sink). Accepts body=None (light contract)."""

    def __init__(self, cfg: WebConfig):
        self.cfg = cfg

    def __call__(self, url: str, url_hash: int, body):
        return out_links(url, int(url_hash), self.cfg), None


def host_politeness(host: str, cfg: WebConfig) -> tuple[int, int, int]:
    """(center_ms, radius_ms, capacity) for a host — RandomTimeout analog."""
    h = hash64_scalar(host, seed=cfg.seed ^ 0xB0)
    center = cfg.base_center_ms + h % 400
    radius = max(1, center // 4)
    capacity = 1 + h % 3
    return int(center), int(radius), int(capacity)


def proxy_for(url_hash: np.ndarray, wave: int, cfg: WebConfig) -> np.ndarray:
    """Proxy identity per request — the deterministic analog of the
    reference's least-used resource rotation (TorResourceController /
    ProxyResourceController pick a slot per request). Randomized rotation
    breaks replay, so the slot is a PRF of (url_hash, wave): usage spreads
    uniformly over the pool AND a retried URL rotates identity across waves
    (the NEWNYM-after-ban behavior), while staying a pure function of data.
    """
    h = splitmix64(_mix(url_hash, 5, cfg.seed) ^ _U64(wave))
    return (h % _U64(max(1, cfg.n_proxies))).astype(np.int32)


def robots_disallowed(host: str, page_ids: np.ndarray, cfg: WebConfig) -> np.ndarray:
    """Synthetic robots.txt: each host disallows one residue class of pages."""
    r = hash64_scalar(host, seed=cfg.seed ^ 0xB07) % cfg.robots_modulus
    return (np.asarray(page_ids) % cfg.robots_modulus) == r


def page_id_of(urls) -> np.ndarray:
    """Extract the /p{N} page id from our synthetic URLs (vectorized-enough)."""
    return np.array([int(u.rsplit("/p", 1)[1]) for u in urls], np.int64)


def host_id_of(url: str) -> int:
    return int(url.split("host")[1][:3])


def out_links(url: str, url_hash: int, cfg: WebConfig) -> list[str]:
    """Raw hrefs on a page — relative for same-host, absolute for cross-host,
    plus occasional junk links (dropped later by canonicalize).

    Mirrors the reference's link extraction with its keep-predicate
    (HabrParser.scala:22-28: hrefs startsWith("/") or contains(baseDomain)).
    """
    hid = host_id_of(url)
    h = int(_mix(url_hash, 2, cfg.seed))
    n = h % (cfg.max_links + 1)
    links: list[str] = []
    for j in range(n):
        hj = int(_mix(url_hash, 100 + j, cfg.seed))
        if hj % 17 == 0:
            links.append("mailto:junk@example.com")
            continue
        if hj % cfg.cross_host_ratio == 0:
            target_host = hj % cfg.n_hosts
            target_page = (hj >> 8) % cfg.n_pages(target_host)
            links.append(cfg.page_url(target_host, target_page))
        else:
            target_page = (hj >> 8) % cfg.n_pages(hid)
            links.append(f"/p{target_page}")
    return links


def image_payload(url_hash: int, cfg: WebConfig) -> dict:
    """The page's image+caption payload (input_hint schema, minus phash)."""
    h = int(_mix(url_hash, 3, cfg.seed))
    span = cfg.img_max - cfg.img_min + 1
    w = cfg.img_min + (h % span)
    hh = cfg.img_min + ((h >> 8) % span)
    fmt = ("raw", "png", "q6")[(h >> 16) % 3]
    img = synth_image(h >> 24, w, hh)
    return {
        "image_id": f"{int(url_hash):016x}",
        "bytes": encode_image(img, fmt),
        "w": w,
        "h": hh,
        "fmt": fmt,
        "caption": f"caption-{int(url_hash):016x} w{w} h{hh} {fmt}",
    }


def decode_and_phash(payload: dict) -> int:
    from ..functions.imaging import decode_image

    img = decode_image(payload["bytes"], payload["w"], payload["h"], payload["fmt"])
    return phash64(img)


def priority_of(url_hash, depth) -> np.ndarray:
    """priority = depth + freshness jitter (north_star: depth + freshness)."""
    jitter = (_mix(url_hash, 4, 0) % _U64(256)).astype(np.float32) / np.float32(1024.0)
    return depth.astype(np.float32) + jitter if hasattr(depth, "astype") else np.float32(depth) + jitter
