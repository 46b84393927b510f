"""Engine-vs-oracle parity (SURVEY.md §5.2 item 2): exact match of crawl
order, final URL-seen set, per-item status, and event counters on seeded
synthetic webs — including redirects, cycles, duplicate links, robots
denials, depth limits, domain filters, and per-host politeness budgets."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from simplecrawler_spark.config import CrawlConfig
from simplecrawler_spark.corpus import CorpusParams, write_corpus
from simplecrawler_spark.plans.crawl import CrawlEngine

from tests.oracle import OracleCrawler


@pytest.fixture(scope="module")
def corpus(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("corpus"))
    p = CorpusParams(n_urls=500, n_hosts=6, seed=42)
    write_corpus(spark, d, p)
    return d, p


def _load_oracle_inputs(spark, corpus_dir):
    web_rows = [r.asDict() for r in spark.read.parquet(f"{corpus_dir}/web").collect()]
    robots_rows = [r.asDict() for r in spark.read.parquet(f"{corpus_dir}/robots").collect()]
    return web_rows, robots_rows


def _run_both(spark, corpus_dir, cfg, tmp_path, fetch_conditions=None,
              download_conditions=None, with_images=False):
    cfg.warehouse = str(tmp_path / "wh")
    web = spark.read.parquet(f"{corpus_dir}/web")
    robots = spark.read.parquet(f"{corpus_dir}/robots")
    eng = CrawlEngine(spark, cfg, web, robots=robots,
                      fetch_conditions=fetch_conditions,
                      download_conditions=download_conditions)
    result = eng.run()
    web_rows, robots_rows = _load_oracle_inputs(spark, corpus_dir)
    oc = OracleCrawler(web_rows, robots_rows, cfg,
                       fetch_conditions=fetch_conditions,
                       download_conditions=download_conditions)
    oresult = oc.run()
    return result, oresult


def _assert_parity(spark, result, oresult):
    log = [
        (r["round_fetched"], r["seq"], r["url_norm"], r["depth"], r["status"])
        for r in result.fetched_log(spark)
        .select("round_fetched", "seq", "url_norm", "depth", "status")
        .orderBy("round_fetched", "seq")
        .collect()
    ]
    assert log == sorted(oresult.fetched_log), (
        f"crawl order diverged: engine {len(log)} rows vs oracle "
        f"{len(oresult.fetched_log)}; first diff: "
        f"{next((a, b) for a, b in zip(log, sorted(oresult.fetched_log)) if a != b) if log and oresult.fetched_log else 'len'}"
    )
    seen = {
        r["url_norm"]: r["seq"]
        for r in result.url_seen(spark).select("url_norm", "seq").collect()
    }
    assert seen == oresult.seen
    eng_ev = {k: v for k, v in result.events.items() if v}
    ora_ev = {k: v for k, v in oresult.events.items() if v}
    assert eng_ev == ora_ev


def test_parity_default_config(spark, corpus, tmp_path):
    d, p = corpus
    cfg = CrawlConfig(seeds=["http://host0.example/p/0"], budget=96,
                      dedupe_mode="exact", max_rounds=500)
    result, oresult = _run_both(spark, d, cfg, tmp_path)
    assert len(oresult.fetched_log) > 20  # crawl actually expanded
    _assert_parity(spark, result, oresult)


def test_parity_tiered_dedupe_identical_to_exact(spark, corpus, tmp_path):
    d, p = corpus
    cfg = CrawlConfig(seeds=["http://host0.example/p/0"], budget=96,
                      dedupe_mode="tiered", seen_capacity=100_000,
                      n_buckets=8, max_rounds=500)
    result, oresult = _run_both(spark, d, cfg, tmp_path)
    _assert_parity(spark, result, oresult)


def test_parity_cross_domain_with_subdomains_and_whitelist(spark, corpus, tmp_path):
    d, p = corpus
    cfg = CrawlConfig(seeds=["http://host0.example/p/0"], budget=96,
                      filter_by_domain=True, scan_subdomains=True,
                      domain_whitelist=["host1.example", "host2.example"],
                      dedupe_mode="exact", max_rounds=500)
    result, oresult = _run_both(spark, d, cfg, tmp_path)
    _assert_parity(spark, result, oresult)


def test_parity_no_domain_filter_max_depth(spark, corpus, tmp_path):
    d, p = corpus
    cfg = CrawlConfig(seeds=["http://host0.example/p/0"], budget=96,
                      filter_by_domain=False, max_depth=3,
                      dedupe_mode="exact", max_rounds=500)
    result, oresult = _run_both(spark, d, cfg, tmp_path)
    _assert_parity(spark, result, oresult)
    assert result.fetched_log(spark).agg(F.max("depth")).collect()[0][0] <= 3


def test_parity_host_budget_politeness(spark, corpus, tmp_path):
    d, p = corpus
    cfg = CrawlConfig(seeds=["http://host0.example/p/0"], budget=40,
                      filter_by_domain=False, host_budget=5, n_salts=4,
                      dedupe_mode="exact", max_rounds=500)
    result, oresult = _run_both(spark, d, cfg, tmp_path)
    _assert_parity(spark, result, oresult)
    # politeness invariant: ≤ host_budget fetches per host per round
    per = (result.fetched_log(spark).groupBy("round_fetched", "host")
           .count().agg(F.max("count")).collect()[0][0])
    assert per <= 5


def test_parity_fetch_and_download_conditions(spark, corpus, tmp_path):
    d, p = corpus
    fc = [{"field": "url_norm", "op": "not_contains", "value": "/p/7"}]
    # prevented downloads must not strangle discovery: images carry no links
    dc = [{"field": "content_type", "op": "ne", "value": "image/png"}]
    cfg = CrawlConfig(seeds=["http://host0.example/p/0"], budget=96,
                      filter_by_domain=False, dedupe_mode="exact", max_rounds=500)
    result, oresult = _run_both(spark, d, cfg, tmp_path,
                                fetch_conditions=fc, download_conditions=dc)
    _assert_parity(spark, result, oresult)
    assert oresult.events.get("fetchprevented", 0) > 0
    assert oresult.events.get("downloadprevented", 0) > 0
