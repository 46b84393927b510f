"""§2.9 streaming wrapper: one micro-batch == one BSP round, with the
reference's loop semantics — completion ≈ query termination (A4), pause ≈
``wait()``/listener backpressure, restart supervision ≈ resume from the
snapshot manifests. Every case compares the durable warehouse tables
against the batch path (same engine, same snapshots)."""

from __future__ import annotations

import time

import pytest

from simplecrawler_spark.config import CrawlConfig
from simplecrawler_spark.corpus import CorpusParams, write_corpus
from simplecrawler_spark.plans.crawl import CrawlEngine, CrawlResult
from simplecrawler_spark.streaming.stream import stream_crawl


def _cfg(wh: str, max_rounds: int = 500) -> CrawlConfig:
    return CrawlConfig(seeds=["http://host0.example/p/0"], budget=64,
                       filter_by_domain=False, dedupe_mode="exact",
                       max_rounds=max_rounds, warehouse=wh)


def _fetched_key(res: CrawlResult, spark):
    return sorted((r["round_fetched"], r["seq"], r["url_norm"], r["status"])
                  for r in res.fetched_log(spark)
                  .select("round_fetched", "seq", "url_norm", "status").collect())


def _event_totals(res: CrawlResult, spark) -> dict[str, int]:
    rows = res.metrics(spark).groupBy("event").sum("count").collect()
    return {r["event"]: r["sum(count)"] for r in rows if r["event"] != "noop"}


@pytest.fixture(scope="module")
def small_corpus(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("stream_corpus") / "c")
    write_corpus(spark, d, CorpusParams(n_urls=150, n_hosts=2, seed=46))
    return d


def test_stream_rounds_match_batch(spark, small_corpus, tmp_path):
    web = spark.read.parquet(f"{small_corpus}/web")

    batch_res = CrawlEngine(
        spark, _cfg(str(tmp_path / "wh_batch"), max_rounds=3), web).run()

    eng = CrawlEngine(spark, _cfg(str(tmp_path / "wh_stream")), web)
    q = stream_crawl(spark, eng, tick_seconds=0.2, max_rounds=3)
    deadline = time.time() + 300
    while time.time() < deadline:
        if eng.wh.latest_round() is not None and eng.wh.latest_round() >= 3:
            break
        time.sleep(1)
    q.stop()
    assert eng.wh.latest_round() >= 3
    stream_res = CrawlResult(eng.wh, 3, 0)
    assert _fetched_key(batch_res, spark) == _fetched_key(stream_res, spark)


def test_stream_completion_matches_batch_fixpoint(spark, small_corpus, tmp_path):
    """A4 analog: the stream detects the drained frontier, writes the same
    `complete` metrics row the batch epilogue writes, and await_completion
    terminates the query — final fetched log AND event totals identical."""
    web = spark.read.parquet(f"{small_corpus}/web")

    batch_res = CrawlEngine(spark, _cfg(str(tmp_path / "wh_b")), web).run()

    eng = CrawlEngine(spark, _cfg(str(tmp_path / "wh_s")), web)
    h = stream_crawl(spark, eng, tick_seconds=0.2)
    stream_res = h.await_completion(timeout=300)
    assert h.complete and not h.query.isActive

    assert _fetched_key(batch_res, spark) == _fetched_key(stream_res, spark)
    ev_b, ev_s = _event_totals(batch_res, spark), _event_totals(stream_res, spark)
    assert ev_b == ev_s
    assert ev_s.get("complete") == 1


def test_stream_restart_resumes_from_snapshot(spark, small_corpus, tmp_path):
    """Restart supervision: kill the query after a couple of rounds, start a
    NEW query + engine on the same warehouse — it defrosts (S5) instead of
    reseeding, and the completed crawl is byte-identical to the batch run."""
    web = spark.read.parquet(f"{small_corpus}/web")
    wh = str(tmp_path / "wh_restart")

    batch_res = CrawlEngine(spark, _cfg(str(tmp_path / "wh_b2")), web).run()

    eng1 = CrawlEngine(spark, _cfg(wh), web)
    h1 = stream_crawl(spark, eng1, tick_seconds=0.2, max_rounds=2)
    deadline = time.time() + 300
    while time.time() < deadline and h1.rounds_done < 2:
        time.sleep(0.5)
    h1.stop()  # killed mid-crawl: frontier not drained
    assert not h1.complete
    first_leg = eng1.wh.latest_round()
    assert first_leg is not None and first_leg >= 1

    eng2 = CrawlEngine(spark, _cfg(wh), web)  # fresh engine, same warehouse
    h2 = stream_crawl(spark, eng2, tick_seconds=0.2)
    stream_res = h2.await_completion(timeout=300)
    assert stream_res.rounds > first_leg  # it resumed, not restarted

    assert _fetched_key(batch_res, spark) == _fetched_key(stream_res, spark)
    # crawlstart must appear exactly once (seeding never re-ran)
    assert _event_totals(stream_res, spark).get("crawlstart") == 1
    assert _event_totals(stream_res, spark) == _event_totals(batch_res, spark)


def test_stream_pause_resume(spark, small_corpus, tmp_path):
    """Backpressure analog of `wait()`/listenerTTL: while paused the interval
    keeps firing but ticks are no-ops; resume continues to completion."""
    web = spark.read.parquet(f"{small_corpus}/web")
    eng = CrawlEngine(spark, _cfg(str(tmp_path / "wh_p")), web)
    h = stream_crawl(spark, eng, tick_seconds=0.2)
    h.pause()
    assert h.paused
    # a tick already in flight at pause() time may still land its round —
    # wait for rounds_done to go quiet first, then prove the firing ticks
    # are no-ops over a further window
    last, quiet_since, deadline = h.rounds_done, time.time(), time.time() + 120
    while time.time() < deadline and time.time() - quiet_since < 6:
        if h.rounds_done != last:
            last, quiet_since = h.rounds_done, time.time()
        time.sleep(0.2)
    done_at_pause = h.rounds_done
    time.sleep(4)  # ≥20 ticks fire; all must be no-ops
    assert h.rounds_done == done_at_pause
    assert not h.complete
    h.resume()
    stream_res = h.await_completion(timeout=300)
    assert stream_res.rounds >= 1
    assert _event_totals(stream_res, spark).get("complete") == 1


def test_stream_pause_ttl_auto_resumes(spark, small_corpus, tmp_path):
    """listenerTTL analog (crawler.js:≈L1770–1830): a pause with a TTL
    expires on its own — a leaked handle can't stall the crawl forever. The
    crawl must reach its normal fixpoint WITHOUT any explicit resume()."""
    web = spark.read.parquet(f"{small_corpus}/web")
    eng = CrawlEngine(spark, _cfg(str(tmp_path / "wh_ttl")), web)
    h = stream_crawl(spark, eng, tick_seconds=0.2)
    h.pause(ttl=3.0)
    assert h.paused
    # no resume() call anywhere past this point
    stream_res = h.await_completion(timeout=300)
    assert stream_res.rounds >= 1
    assert _event_totals(stream_res, spark).get("complete") == 1
