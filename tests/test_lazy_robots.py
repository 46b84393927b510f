"""S3 — lazy per-host robots.txt fetch+parse must yield exactly the same
crawl as pre-parsed rule tables (rules are identical; only acquisition
differs — reference ``getRobotsTxt`` laziness)."""

from __future__ import annotations

import pytest

from simplecrawler_spark.config import CrawlConfig
from simplecrawler_spark.corpus import CorpusParams, write_corpus
from simplecrawler_spark.plans.crawl import CrawlEngine


def test_lazy_robots_matches_table_mode(spark, tmp_path):
    d = str(tmp_path / "c")
    write_corpus(spark, d, CorpusParams(n_urls=250, n_hosts=4, seed=47))
    web = spark.read.parquet(f"{d}/web")
    robots = spark.read.parquet(f"{d}/robots")
    robots_txt = spark.read.parquet(f"{d}/robots_txt")

    base = dict(seeds=["http://host0.example/p/0"], budget=48,
                filter_by_domain=False, dedupe_mode="exact", max_rounds=200)
    table_res = CrawlEngine(
        spark, CrawlConfig(**base, warehouse=str(tmp_path / "wa")), web, robots=robots
    ).run()
    lazy_res = CrawlEngine(
        spark, CrawlConfig(**base, robots_mode="lazy", warehouse=str(tmp_path / "wb")),
        web, robots_txt=robots_txt,
    ).run()

    def log(res):
        return sorted((r["round_fetched"], r["seq"], r["url_norm"], r["status"]) for r in
                      res.fetched_log(spark)
                      .select("round_fetched", "seq", "url_norm", "status").collect())

    assert log(table_res) == log(lazy_res)
    assert lazy_res.events.get("robotstxtfetched", 0) > 0
    assert lazy_res.events.get("fetchdisallowed", 0) == table_res.events.get("fetchdisallowed", 0)
