"""Streaming wrapper smoke: one micro-batch == one BSP round; results match
the batch path (same engine, same snapshots)."""

from __future__ import annotations

import time

import pytest

from simplecrawler_spark.config import CrawlConfig
from simplecrawler_spark.corpus import CorpusParams, write_corpus
from simplecrawler_spark.plans.crawl import CrawlEngine, CrawlResult
from simplecrawler_spark.streaming.stream import stream_crawl


def test_stream_rounds_match_batch(spark, tmp_path):
    d = str(tmp_path / "c")
    write_corpus(spark, d, CorpusParams(n_urls=150, n_hosts=2, seed=46))
    web = spark.read.parquet(f"{d}/web")

    cfg_b = CrawlConfig(seeds=["http://host0.example/p/0"], budget=64,
                        filter_by_domain=False, dedupe_mode="exact",
                        max_rounds=3, warehouse=str(tmp_path / "wh_batch"))
    batch_res = CrawlEngine(spark, cfg_b, web).run()

    cfg_s = CrawlConfig(seeds=["http://host0.example/p/0"], budget=64,
                        filter_by_domain=False, dedupe_mode="exact",
                        max_rounds=500, warehouse=str(tmp_path / "wh_stream"))
    eng = CrawlEngine(spark, cfg_s, web)
    q = stream_crawl(spark, eng, tick_seconds=0.2, max_rounds=3)
    deadline = time.time() + 300
    while time.time() < deadline:
        if eng.wh.latest_round() is not None and eng.wh.latest_round() >= 3:
            break
        time.sleep(1)
    q.stop()
    assert eng.wh.latest_round() >= 3
    stream_res = CrawlResult(eng.wh, 3, 0)

    a = sorted((r["round_fetched"], r["seq"], r["url_norm"], r["status"]) for r in
               batch_res.fetched_log(spark).select("round_fetched", "seq", "url_norm", "status").collect())
    b = sorted((r["round_fetched"], r["seq"], r["url_norm"], r["status"]) for r in
               stream_res.fetched_log(spark).select("round_fetched", "seq", "url_norm", "status").collect())
    assert a == b
