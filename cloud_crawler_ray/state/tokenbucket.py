"""Per-domain politeness token buckets with a deterministic virtual clock.

The reference's politeness is per-HTTP-slot: after every request a slot
sleeps ``RandomTimeout = uniform(center±radius)`` (RandomTimeout.scala:7-15,
TorResourceController.scala:80-84), and the pool has ``limit`` slots, so the
aggregate rate ≈ limit / mean(timeout). This engine generalizes to
per-domain buckets (north_rule) with a *virtual* clock:

* fetch i of host h in wave w is scheduled at
  ``t[i] = t[i-1] + delay(h, w, i)`` where ``delay`` is uniform in
  ``center ± radius`` drawn from a PRNG seeded by ``(host_hash, wave)`` —
  the seeded-schedule rule of SURVEY.md §4.3(d), so any actor (or the
  oracle simulator) computes the identical schedule;
* ``capacity`` tokens may fire at the same virtual time before delays apply
  (the reference's ``limit`` slots analog);
* a ban freezes the bucket (``banned_until``) — the 30-min slot freeze of
  TorResourceController.scala:113-121.

No wall-clock sleeping: virtual times give the deterministic fetch *order*
(sorted by virtual time) that the conformance gate checks; a real crawl
deployment would sleep to them.
"""

from __future__ import annotations

import numpy as np


def politeness_delays(host_hash: int, wave: int, n: int, center_ms: int, radius_ms: int) -> np.ndarray:
    """n politeness delays (ms), seeded by (host_hash, wave) — reproducible."""
    seed = (int(host_hash) ^ (int(wave) * 0x9E3779B97F4A7C15)) & 0xFFFFFFFFFFFFFFFF
    rng = np.random.Generator(np.random.PCG64(seed))
    lo, hi = center_ms - radius_ms, center_ms + radius_ms
    return rng.integers(lo, hi + 1, size=n).astype(np.int64)


class TokenBucket:
    """Virtual-time schedule for one host within one wave."""

    def __init__(self, host_hash: int, wave: int, center_ms: int, radius_ms: int, capacity: int = 1):
        self.host_hash = host_hash
        self.wave = wave
        self.center_ms = center_ms
        self.radius_ms = radius_ms
        self.capacity = max(1, capacity)
        self.clock_ms = 0
        self.banned = False

    def schedule(self, n: int) -> np.ndarray:
        """Virtual fetch times (ms) for the next n requests of this host.

        With capacity c, requests are spread over c parallel slots, each slot
        serial with its own politeness delays — aggregate rate = c / mean.
        """
        if n == 0:
            return np.zeros(0, np.int64)
        delays = politeness_delays(self.host_hash, self.wave, n, self.center_ms, self.radius_ms)
        times = np.empty(n, np.int64)
        slot_clock = np.full(self.capacity, self.clock_ms, np.int64)
        for i in range(n):  # n is per-host per-wave (small); slots rotate round-robin
            s = i % self.capacity
            times[i] = slot_clock[s]
            slot_clock[s] += delays[i]
        self.clock_ms = int(slot_clock.max())
        return times

    def freeze(self) -> None:
        """Ban: host fetches stop for the rest of the wave."""
        self.banned = True
