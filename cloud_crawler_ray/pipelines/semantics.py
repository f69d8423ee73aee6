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
    TasksBatchController.scala:183-198);
(e) a per-call fetch_timeout expiry routes the abandoned row as io_error
    AND ends the host's wave — the abandoned daemon thread may still hold
    a request to this host in flight, so fetching the next row in the SAME
    wave would put two concurrent requests on one host. This is an
    intra-wave guarantee only: the abandoned thread can outlive the wave,
    so the next wave's first fetch to that host may still overlap it —
    the same envelope as the reference, which kills the whole batch
    controller on its execution timeout and re-queues the host for the
    next batch (WorkerManager.scala:85-96). Remaining rows stay WAIT
    untouched, exactly like a circuit-breaker trip.
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
    records: list | None = None  # user-parser records per row (save_parsed path)
    bodies: list | None = None  # raw fetch bodies per row (save_raw path)


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
    fetcher=None,
    parser=None,
    collect_links: bool = True,
    collect_records: bool = False,
    collect_bodies: bool = False,
) -> HostWaveResult:
    """Run one host's wave fetch. Inputs MUST already be rule-(b) sorted.

    Extension surface (the reference's BaseCrawler / BaseParser layering,
    Pipeline.scala:10-18):

    * ``fetcher(url, url_hash, attempt, try_idx, ua) -> (kind, body)`` with
      kind in {"ok","not_found","parse_error","io_error","banned"}. ``None``
      — or the built-in SyntheticWebFetcher — selects the synthetic-web
      fast path (vectorized outcome precompute + synthetic robots,
      SURVEY.md §3.3). Custom fetchers get no robots
      handling: pre-fetch skipping is the validator hook's job
      (BatchTasksValidator analog).
    * ``parser(url, url_hash, body) -> (links, record)``; raising routes the
      row to PARSE_FAILED exactly like the reference's ParsingException →
      taskParsingFailed (TasksBatchController.scala:152-158). ``None`` with
      the synthetic path falls back to the synthetic out-links.
    * ``collect_links=False`` skips link/parse work entirely (statuses and
      the politeness schedule only) — the claim-task "light" mode: per-row
      parse/decode work then runs in uniform downstream batches, which is
      what keeps a hot host from serializing a whole wave behind one task.
    """
    n = len(url)
    host_h = hash64_scalar(host, seed=cfg.seed)
    center, radius, capacity = sw.host_politeness(host, cfg)
    bucket = TokenBucket(host_h, wave, center, radius, capacity)

    status = np.full(n, WAIT, np.int8)
    new_attempt = attempt.astype(np.int32).copy()
    vtime = np.full(n, -1, np.int64)
    fetched = np.zeros(n, bool)
    links: list[list[str] | None] = [None] * n
    records: list = [None] * n
    bodies: list = [None] * n

    # only the built-in synthetic fetcher takes the vectorized fast path; a
    # custom fetcher (even a light one) must actually be invoked per try
    synthetic = fetcher is None or isinstance(fetcher, sw.SyntheticWebFetcher)
    if synthetic:
        page_ids = sw.page_id_of(url)
        disallowed = sw.robots_disallowed(host, page_ids, cfg)
        outcomes = sw.outcome_for(url_hash, cfg)

        def try_fetch(i: int, try_idx: int):
            return sw.try_result(outcomes[i], try_idx), None

    else:
        from ..functions.useragent import user_agents

        disallowed = np.zeros(n, bool)
        uas = user_agents(url_hash)

        def try_fetch(i: int, try_idx: int):
            return fetcher(url[i], int(url_hash[i]), int(attempt[i]), try_idx, uas[i])

    if parser is not None:

        def parse_row(i: int, body):
            return parser(url[i], int(url_hash[i]), body)

    elif synthetic and collect_links:

        def parse_row(i: int, body):
            return sw.out_links(url[i], int(url_hash[i]), cfg), None

    else:
        parse_row = None

    frozen = False  # ban freeze (slot ban analog)
    tripped = False  # circuit breaker (NoResourcesAvailable analog)
    consec_io = 0
    budget = cfg.batch_timeout_sec
    # straggler kill (WorkerManager.scala:85-96 batchExecutionTimeout):
    # custom fetcher calls run under a wall-clock limit whenever EITHER knob
    # is set — per-call fetch_timeout_sec, clamped by the host-group
    # budget's remaining time, so batch_timeout_sec alone still interrupts
    # a call that hangs mid-flight (not just between rows)
    use_call_timeout = not synthetic and (cfg.fetch_timeout_sec is not None or budget is not None)
    if budget is not None or use_call_timeout:
        import time as _time

        t_start = _time.monotonic()
    if use_call_timeout:
        import threading

        def timed_fetch(i: int, try_idx: int, limit: float | None):
            """(kind, body, timed_out) — runs the user fetcher in a daemon
            thread and abandons it past ``limit`` (the thread is leaked by
            design; a fetch-timeout ends the whole host's wave — rule (e) —
            bounding leaks to one thread per host group per wave)."""
            if limit is not None and limit <= 0:
                return "io_error", None, True
            out: dict = {}

            def run():
                try:
                    out["r"] = try_fetch(i, try_idx)
                except Exception as e:  # propagate user errors unchanged
                    out["e"] = e

            th = threading.Thread(target=run, daemon=True)
            th.start()
            th.join(limit)
            if th.is_alive():
                return "io_error", None, True
            if "e" in out:
                raise out["e"]
            kind, body = out["r"]
            return kind, body, False

    for i in range(n):  # host rows are politeness-serialized by design
        if budget is not None and _time.monotonic() - t_start >= budget:
            # wall-clock budget expired: remaining rows return to the queue
            # untouched (forcedStop → returnToQueue,
            # WorkerManager.scala:85-96 + TasksBatchController.scala:183-198)
            break
        if frozen or tripped:
            continue  # stays WAIT, attempt unchanged
        if disallowed[i]:
            status[i] = SKIPPED  # robots: no fetch, no budget consumed
            continue
        first_t = -1
        res, body = "io_error", None
        budget_killed = False
        abandoned = False  # per-call fetch timeout expired for this row
        for try_idx in range(cfg.in_wave_tries):
            t = int(bucket.schedule(1)[0])
            if first_t < 0:
                first_t = t
            if use_call_timeout:
                # binding limit: per-call fetch timeout, clamped by the host
                # group's remaining wall budget
                limit = cfg.fetch_timeout_sec
                budget_bound = False
                if budget is not None:
                    remaining = budget - (_time.monotonic() - t_start)
                    if limit is None or remaining < limit:
                        limit, budget_bound = remaining, True
                res, body, timed_out = timed_fetch(i, try_idx, limit)
                if timed_out:
                    # fetch-timeout expiry → io_error routing (request
                    # timeout); budget expiry → forcedStop: the in-flight
                    # row returns to the queue untouched. Either way stop
                    # retrying (don't re-hang / leak more threads).
                    budget_killed = budget_bound
                    abandoned = not budget_bound
                    break
            else:
                res, body = try_fetch(i, try_idx)
            if res != "io_error":
                break
        if budget_killed:
            break  # returnToQueue: row stays WAIT, attempt/vtime untouched
        vtime[i] = first_t
        fetched[i] = True
        if res == "ok":
            consec_io = 0
            status[i] = DONE
            if parse_row is not None and (collect_links or collect_records):
                try:
                    lk, rec = parse_row(i, body)
                    if collect_links:
                        links[i] = lk if lk is not None else []
                    if collect_records:
                        records[i] = rec
                except Exception:
                    status[i] = PARSE_FAILED  # ParsingException → taskParsingFailed
            if collect_bodies:
                bodies[i] = body
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
        if abandoned:
            # rule (e): the abandoned thread may still hold a request to
            # this host in flight — stop the host's wave here so this wave
            # issues no further request to the host (intra-wave exclusion
            # only; see module docstring). Remaining rows stay WAIT
            # untouched, like a breaker trip.
            break

    return HostWaveResult(
        url_hash,
        status,
        new_attempt,
        vtime,
        fetched,
        links,
        records if collect_records else None,
        bodies if collect_bodies else None,
    )
