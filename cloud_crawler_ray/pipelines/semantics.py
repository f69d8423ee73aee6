"""Crawl-wave semantics: the per-host fetch state machine (the spec).

This is the table-driven restatement of the reference worker's outcome
routing (TasksBatchController.scala:138-176 + retry caps worker.conf:29-31 /
master.conf:60-62) plus the politeness/ban model (TorResourceController.scala
:80-121) — pure data logic shared by the single-process oracle simulator and
the distributed engine's fetch stage, so ordering is a function of data,
never of scheduling (SURVEY.md §4.3).

Rules pinned here:
(a) wave selection: per frontier partition, WAIT rows with attempt <
    max_attempts ranked by (priority asc, url_hash asc), first K;
(b) per-host fetch order within a wave: (discovered_at, priority, url_hash);
(c) each fetch try consumes one politeness token; virtual fetch time =
    first try's token time; global order = (wave, vtime, url_hash);
(d) outcome routing: ok→DONE, not_found→SKIPPED, parse_error→PARSE_FAILED,
    banned→BANNED + host frozen for the rest of the wave (remaining rows
    stay WAIT, attempt unchanged — the 30-min slot ban analog),
    io_error→ in-wave retries (in_wave_tries) then attempt+1 and
    WAIT/FAILED by the cross-wave cap; 3 consecutive io-failed rows trip
    the circuit breaker (maxFailCount=3 analog) — remaining host rows
    stay WAIT untouched (forcedStop → returnToQueue,
    TasksBatchController.scala:183-198).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..functions.hashing import hash64_scalar
from ..state.tokenbucket import TokenBucket
from . import synthweb as sw

# frontier status codes (TaskStatus.scala:3-10 analog, dictionary-encoded)
WAIT = 0
IN_PROGRESS = 1
DONE = 2
FAILED = 3
SKIPPED = 4
PARSE_FAILED = 5
BANNED = 6

STATUS_NAMES = {
    WAIT: "wait",
    IN_PROGRESS: "in_progress",
    DONE: "done",
    FAILED: "failed",
    SKIPPED: "skipped",
    PARSE_FAILED: "parse_failed",
    BANNED: "banned",
}


@dataclass
class HostWaveResult:
    """Outcome of fetching one host's selected rows in one wave (row-aligned
    with the input order, which must be rule-(b) sorted)."""

    url_hash: np.ndarray  # uint64
    status: np.ndarray  # int8
    attempt: np.ndarray  # int32 (new value)
    vtime: np.ndarray  # int64 virtual ms, -1 if never fetched
    fetched: np.ndarray  # bool — consumed politeness budget
    links: list[list[str] | None]  # raw hrefs per row (None unless DONE)


def domain_sort_key(discovered_at: np.ndarray, priority: np.ndarray, url_hash: np.ndarray) -> np.ndarray:
    """Lexicographic argsort for rule (b)."""
    return np.lexsort((url_hash, priority, discovered_at))


def select_wave_indices(
    priority: np.ndarray, url_hash: np.ndarray, status: np.ndarray, attempt: np.ndarray, k: int, max_attempts: int
) -> np.ndarray:
    """Rule (a): indices of the partition's wave selection."""
    eligible = np.flatnonzero((status == WAIT) & (attempt < max_attempts))
    if len(eligible) == 0:
        return eligible
    order = np.lexsort((url_hash[eligible], priority[eligible]))
    return eligible[order[:k]]


def fetch_host_wave(
    host: str,
    wave: int,
    url: list[str],
    url_hash: np.ndarray,
    attempt: np.ndarray,
    cfg: sw.WebConfig,
) -> HostWaveResult:
    """Run one host's wave fetch. Inputs MUST already be rule-(b) sorted."""
    n = len(url)
    host_h = hash64_scalar(host, seed=cfg.seed)
    center, radius, capacity = sw.host_politeness(host, cfg)
    bucket = TokenBucket(host_h, wave, center, radius, capacity)

    status = np.full(n, WAIT, np.int8)
    new_attempt = attempt.astype(np.int32).copy()
    vtime = np.full(n, -1, np.int64)
    fetched = np.zeros(n, bool)
    links: list[list[str] | None] = [None] * n

    page_ids = sw.page_id_of(url)
    disallowed = sw.robots_disallowed(host, page_ids, cfg)
    outcomes = sw.outcome_for(url_hash, cfg)

    frozen = False  # ban freeze (slot ban analog)
    tripped = False  # circuit breaker (NoResourcesAvailable analog)
    consec_io = 0

    for i in range(n):  # host rows are politeness-serialized by design
        if frozen or tripped:
            continue  # stays WAIT, attempt unchanged
        if disallowed[i]:
            status[i] = SKIPPED  # robots: no fetch, no budget consumed
            continue
        outcome = outcomes[i]
        first_t = -1
        res = "io_error"
        for try_idx in range(cfg.in_wave_tries):
            t = int(bucket.schedule(1)[0])
            if first_t < 0:
                first_t = t
            res = sw.try_result(outcome, try_idx)
            if res != "io_error":
                break
        vtime[i] = first_t
        fetched[i] = True
        if res == "ok":
            status[i] = DONE
            consec_io = 0
            links[i] = sw.out_links(url[i], int(url_hash[i]), cfg)
        elif res == sw.OUTCOME_NOT_FOUND:
            status[i] = SKIPPED
            consec_io = 0
        elif res == sw.OUTCOME_PARSE_ERROR:
            status[i] = PARSE_FAILED
            consec_io = 0
        elif res == sw.OUTCOME_BANNED:
            status[i] = BANNED
            frozen = True
        else:  # io_error after all in-wave tries
            new_attempt[i] = attempt[i] + 1
            status[i] = FAILED if new_attempt[i] >= cfg.max_attempts else WAIT
            consec_io += 1
            if consec_io >= cfg.circuit_break_after:
                tripped = True

    return HostWaveResult(url_hash, status, new_attempt, vtime, fetched, links)
