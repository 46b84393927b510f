"""§2.9 — Structured Streaming wrapper around the BSP round.

The reference is a continuous event loop: a 250 ms ``setInterval`` tick
spools the next batch (``lib/crawler.js:≈L660``). The streaming analog
drives the same round function from a rate source via ``foreachBatch`` —
one micro-batch == one tick == one BSP round, with the engine's snapshot
manifests as the exactly-once state (idempotent per-round writes + atomic
commit make replayed micro-batches harmless).

The batch BSP loop remains the primary, deterministic path; this wrapper
exists for deployments that want continuous operation, trigger-based pacing
(the ``interval`` analog), and Structured Streaming's restart supervision.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from simplecrawler_spark.plans.crawl import CrawlEngine


def stream_crawl(spark: SparkSession, engine: CrawlEngine,
                 tick_seconds: float = 0.25, max_rounds: int | None = None):
    """Returns a StreamingQuery running one crawl round per micro-batch.

    ``tick_seconds`` mirrors the reference's ``interval`` default (250 ms);
    rounds that find an empty frontier are no-ops (the reference's idle
    tick), so the query keeps running until stopped — matching the
    reference's ``wait()``/continuous semantics rather than ``complete``.
    """
    state = {"rnd": None, "next_seq": None, "watermark": None, "n_left": None,
             "rounds_done": 0}

    def tick(_batch_df, _batch_id: int) -> None:
        if max_rounds is not None and state["rounds_done"] >= max_rounds:
            return
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
            state.update(rnd=res[0], next_seq=res[1], watermark=res[2], n_left=res[3])
            state["rounds_done"] += 1

    ticks = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", max(int(1.0 / tick_seconds), 1))
        .load()
    )
    return (
        ticks.writeStream.foreachBatch(tick)
        # W3 wall-clock pacing — the `interval` analog (crawler.js:≈L660):
        # micro-batch starts align to the trigger clock; a round that
        # overruns its tick starts the next round immediately (the
        # reference's lagging-setInterval behavior)
        .trigger(processingTime=f"{int(tick_seconds * 1000)} milliseconds")
        .option("checkpointLocation", f"{engine.wh.root}/_stream_checkpoint")
        .start()
    )
