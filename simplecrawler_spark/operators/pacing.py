"""W3 — wall-clock pacing.

Reference: ``interval`` (default 250 ms) starts at most one fetch per tick
(``lib/crawler.js:≈L660``, the ``crawlIntervalID`` timer), which structurally
caps the reference at ≤ 1000/interval fetch-starts/s; robots ``Crawl-delay``
additionally spaces requests per host (the engine's J6 budget translation,
operators/scheduler.py). This module gives that cap a real wall-clock analog
in both execution modes:

* **batch (BSP) mode**: one round == ``n_batch`` ticks (Appendix C), so a
  round representing ``n_batch`` fetch-starts must take at least
  ``n_batch × interval`` wall seconds — :class:`RoundPacer` sleeps the
  remainder after the round's real work. Off by default (``interval_ms=0``):
  the engine's benchmark posture is throughput, the reference's is
  politeness; the knob makes the reference's posture available.
* **real-fetch seam** (:func:`~simplecrawler_spark.operators.fetch.http_fetch`
  on a cluster): :func:`request_start_offsets` computes per-request start
  times inside one executor's batch — global interval ticks AND per-host
  crawl-delay spacing — as a pure, unit-tested function; the seam sleeps to
  each offset before issuing the GET.
"""

from __future__ import annotations

import time


def request_start_offsets(hosts: list[str], crawl_delays: dict[str, float],
                          interval_s: float = 0.0) -> list[float]:
    """Start offset (seconds from batch start) for each request of a batch,
    issued in order: request i starts no earlier than

    * the previous request's start (issue order is preserved),
    * ``i × interval_s`` (the reference's one-start-per-tick timer),
    * the host's previous start + its robots ``Crawl-delay``.

    Pure function — the http_fetch seam sleeps to these offsets; tests pin
    the math without a network or a clock."""
    out: list[float] = []
    last_host: dict[str, float] = {}
    prev = 0.0
    for i, h in enumerate(hosts):
        t = max(prev, i * interval_s)
        if h in last_host:
            t = max(t, last_host[h] + crawl_delays.get(h, 0.0))
        out.append(t)
        last_host[h] = t
        prev = t
    return out


class RoundPacer:
    """BSP-mode pacing: after each round, sleep so the round's wall time is
    at least ``n_batch × interval``. Injectable clock/sleep for tests."""

    def __init__(self, interval_ms: float, clock=time.monotonic, sleep=time.sleep):
        self.interval_s = interval_ms / 1000.0
        self._clock = clock
        self._sleep = sleep
        self._round_start: float | None = None

    def round_started(self) -> None:
        self._round_start = self._clock()

    def required_sleep(self, n_batch: int) -> float:
        if self.interval_s <= 0 or self._round_start is None:
            return 0.0
        elapsed = self._clock() - self._round_start
        return max(0.0, n_batch * self.interval_s - elapsed)

    def pace(self, n_batch: int) -> float:
        """Sleep the remainder; returns the seconds actually slept."""
        s = self.required_sleep(n_batch)
        if s > 0:
            self._sleep(s)
        return s
