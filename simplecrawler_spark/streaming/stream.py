"""§2.9 — Structured Streaming wrapper around the BSP round.

The reference is a continuous event loop: a 250 ms ``setInterval`` tick
spools the next batch (``lib/crawler.js:≈L660``). The streaming analog
drives the same round function from a rate source via ``foreachBatch`` —
one micro-batch == one tick == one BSP round, with the engine's snapshot
manifests as the exactly-once state (idempotent per-round writes + atomic
commit make replayed micro-batches harmless).

Reference-semantics map (SURVEY.md §2.9):

- ticks (W3) ≈ micro-batches — ``trigger(processingTime=interval)``;
- completion detection (A4, Appendix B ``complete``) ≈ query
  termination — a tick that drains the frontier writes the same
  ``complete`` metrics row the batch path writes (``run()``,
  plans/crawl.py) and flags the handle, so ``await_completion`` stops
  the query and the warehouse is byte-identical to a batch run;
- ``wait()``/``listenerTTL`` (``lib/crawler.js:≈L1770–1830``, handlers
  holding the loop open) ≈ backpressure — ``pause()`` makes ticks no-ops
  until ``resume()``, exactly the reference's handler-held pause (the
  interval keeps firing; work is skipped);
- restart supervision: all crawl state lives in the warehouse snapshots,
  so a killed query restarted on the SAME warehouse resumes from the last
  committed manifest (S5 defrost — orphan rounds dropped, sidecars
  rebuilt) and the final tables are byte-identical to a never-killed run.

The batch BSP loop remains the primary, deterministic path; this wrapper
exists for deployments that want continuous operation, trigger-based pacing
(the ``interval`` analog), and Structured Streaming's restart supervision.
"""

from __future__ import annotations

import threading
import time

from pyspark.sql import SparkSession

from simplecrawler_spark.plans.crawl import CrawlEngine, CrawlResult


class CrawlStream:
    """Handle over a running streaming crawl: the StreamingQuery plus the
    reference's loop controls (pause/resume ≈ ``wait()``/listener TTL,
    completion ≈ A4). ``stop()`` delegates to the query, so callers that
    treated the old return value as a bare StreamingQuery still work."""

    def __init__(self, query, engine: CrawlEngine, state: dict,
                 pause_evt: threading.Event):
        self.query = query
        self.engine = engine
        self._state = state
        self._pause = pause_evt

    # -- reference loop controls --
    def pause(self, ttl: float | None = None) -> None:
        """Backpressure analog: subsequent ticks become no-ops (the
        reference's handler holding the event loop open). ``ttl`` is the
        ``listenerTTL`` analog (crawler.js:≈L1770–1830 — the reference
        garbage-collects wait() handles older than listenerTTL so a leaked
        handle can't stall the crawl forever): after ``ttl`` seconds the
        next tick auto-resumes with a logged expiry. ``None`` = hold until
        an explicit :meth:`resume`."""
        self._state["pause_deadline"] = (
            None if ttl is None else time.time() + float(ttl))
        self._pause.set()

    def resume(self) -> None:
        self._state["pause_deadline"] = None
        self._pause.clear()

    @property
    def paused(self) -> bool:
        return self._pause.is_set()

    @property
    def rounds_done(self) -> int:
        return self._state["rounds_done"]

    @property
    def complete(self) -> bool:
        """A4: the frontier drained on some tick (fixpoint reached)."""
        return self._state["complete"]

    def stop(self) -> None:
        self.query.stop()

    def await_completion(self, timeout: float = 600.0,
                         poll: float = 0.25) -> CrawlResult:
        """Block until the crawl reaches its fixpoint (or the query dies),
        then stop the query and return the same ``CrawlResult`` the batch
        path returns. Raises TimeoutError if the crawl is still running
        (and unpaused progress is still possible) at the deadline."""
        deadline = time.time() + timeout
        while time.time() < deadline:
            if self._state["complete"] or not self.query.isActive:
                break
            time.sleep(poll)
        else:
            self.query.stop()
            raise TimeoutError("streaming crawl did not complete in time")
        self.query.stop()
        if self._state["error"] is not None:
            raise self._state["error"]
        rnd = self.engine.wh.latest_round() or 0
        return CrawlResult(self.engine.wh, rnd,
                           self._state["next_seq"] or 0,
                           dict(self.engine.events))


def stream_crawl(spark: SparkSession, engine: CrawlEngine,
                 tick_seconds: float = 0.25,
                 max_rounds: int | None = None) -> CrawlStream:
    """Start a streaming crawl: one crawl round per micro-batch.

    ``tick_seconds`` mirrors the reference's ``interval`` default (250 ms);
    a tick that finds an empty frontier marks completion (A4) and writes
    the batch path's ``complete`` metrics row; later ticks are idle no-ops
    (the reference's idle tick), so the query keeps running until stopped —
    ``CrawlStream.await_completion`` supervises that. Restarting on a
    warehouse with committed rounds resumes (S5) instead of reseeding.
    """
    state = {"rnd": None, "next_seq": None, "watermark": None, "n_left": None,
             "rounds_done": 0, "complete": False, "error": None,
             "pause_deadline": None}
    pause_evt = threading.Event()

    def tick(_batch_df, _batch_id: int) -> None:
        if pause_evt.is_set():
            ddl = state["pause_deadline"]
            if ddl is None or time.time() < ddl:
                return
            # listenerTTL expiry: a leaked pause handle must not stall the
            # crawl forever (reference GC of stale wait() handlers)
            import logging
            logging.getLogger(__name__).warning(
                "pause TTL expired after deadline — auto-resuming crawl")
            state["pause_deadline"] = None
            pause_evt.clear()
        if state["complete"] or state["error"]:
            return
        if max_rounds is not None and state["rounds_done"] >= max_rounds:
            return
        try:
            if state["rnd"] is None:
                last = engine.wh.latest_round()
                if last is None:
                    n = engine.seed()[0]
                    state.update(rnd=0, next_seq=n, watermark=0, n_left=n)
                else:
                    r, ns, wm, nl = engine.resume_state()
                    state.update(rnd=r, next_seq=ns, watermark=wm, n_left=nl)
            if state["n_left"] and state["n_left"] > 0:
                res = engine.run_rounds(
                    state["rnd"], state["next_seq"], state["watermark"],
                    state["n_left"], n_rounds=1)
                state.update(rnd=res[0], next_seq=res[1], watermark=res[2],
                             n_left=res[3])
                state["rounds_done"] += 1
            if state["n_left"] == 0 and not state["complete"]:
                # A4 / Appendix B `complete` — identical to the batch
                # path's fixpoint epilogue so the metrics table matches a
                # batch run byte-for-byte (idempotent: fixed filename)
                engine._bump("complete", 1)
                engine._write_metrics(state["rnd"], [("complete", 1)],
                                      filename="part-complete.parquet")
                state["complete"] = True
        except Exception as e:  # surfaced by await_completion
            state["error"] = e
            raise

    ticks = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", max(int(1.0 / tick_seconds), 1))
        .load()
    )
    query = (
        ticks.writeStream.foreachBatch(tick)
        # W3 wall-clock pacing — the `interval` analog (crawler.js:≈L660):
        # micro-batch starts align to the trigger clock; a round that
        # overruns its tick starts the next round immediately (the
        # reference's lagging-setInterval behavior)
        .trigger(processingTime=f"{int(tick_seconds * 1000)} milliseconds")
        .option("checkpointLocation", f"{engine.wh.root}/_stream_checkpoint")
        .start()
    )
    return CrawlStream(query, engine, state, pause_evt)
