"""Physical-plan guardrails: the plans we want at 100 TB, asserted so a
regression (lost pushdown, broadcast flipped to SMJ, top-k become full sort)
fails CI — the `.explain("formatted")` loop, made permanent."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

import __spark_entry__ as entry_mod

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _formatted(df) -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    return buf.getvalue()


def test_fifo_topk_is_take_ordered_not_full_sort(spark):
    df = entry_mod.queries()["w1_fifo_topk"](spark, SF)
    plan = _plan(df)
    assert "TakeOrderedAndProject" in plan  # per-partition heap + driver merge


def test_filter_pushdown_reaches_parquet_scan(spark):
    df = entry_mod.queries()["p5_depth_gate"](spark, SF)
    f = _formatted(df)
    assert "PushedFilters: [" in f and "l_linenumber" in f.split("PushedFilters")[1][:200]


def test_column_pruning_reaches_scan(spark):
    df = entry_mod.queries()["p1_domain_filter"](spark, SF)
    f = _formatted(df)
    # scan must read only the 3 needed columns, not the whole customer table
    read = f.split("ReadSchema")[1][:300]
    assert "c_custkey" in read and "c_mktsegment" in read
    assert "c_acctbal" not in read and "c_nationkey" not in read


def test_small_dim_join_is_broadcast(spark):
    df = entry_mod.queries()["j2_broadcast_lookup"](spark, SF)
    assert "BroadcastHashJoin" in _plan(df)


def test_fetch_join_broadcasts_batch_side_not_corpus(spark, tmp_path):
    from simplecrawler_spark.corpus import CorpusParams, write_corpus
    from simplecrawler_spark.operators.fetch import fetch_batch

    d = str(tmp_path / "c")
    write_corpus(spark, d, CorpusParams(n_urls=200, n_hosts=3, seed=45))
    web = spark.read.parquet(f"{d}/web")
    batch = web.limit(10).select("url_norm", F.lit(0).alias("seq"),
                                 F.lit(1).alias("depth"))
    plan = _plan(fetch_batch(batch, web))
    assert "BroadcastHashJoin" in plan


def test_fetch_join_large_batch_is_bucket_local_left_outer(spark, tmp_path):
    """Large batches (> broadcast cutoff) must fetch-join the bucketed web
    table with (a) ONE left-outer join — not the inner+anti shape that scans
    and shuffles the corpus twice — and (b) no exchange and no sort on the
    corpus side (url_norm-bucketed, per-bucket-sorted, one file per bucket)."""
    from simplecrawler_spark.corpus import CorpusParams, read_web, write_corpus
    from simplecrawler_spark.operators.fetch import fetch_batch

    d = str(tmp_path / "c")
    write_corpus(spark, d, CorpusParams(n_urls=300, n_hosts=3, seed=45))
    web = read_web(spark, d)
    batch = web.select("url_norm").limit(10).select(
        "url_norm", F.lit(0).cast("long").alias("seq"), F.lit(1).alias("depth"))
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _plan(fetch_batch(batch, web, batch_rows=200_000))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert "SortMergeJoin" in plan and "LeftOuter" in plan
    assert plan.count("Scan parquet") == 2  # batch source + web, never a 3rd
    # corpus side: bucketed scan feeds the merge join directly — the ONLY
    # exchange in the plan belongs to the (small) batch side, and the only
    # sorts are the two merge-join inputs minus the web side's (elided via
    # the single-file-per-bucket sorted layout)
    assert "Bucketed: true" in plan
    assert plan.count("Exchange hashpartitioning") == 1
    # exactly ONE sort — the batch side's; the web side's is elided by the
    # sorted single-file-per-bucket layout (session.py legacy outputOrdering)
    assert plan.count(" Sort [") == 1


def test_tiered_probe_adds_no_exchange(spark, tmp_path):
    """filter_new(tiered) must ride the upstream dedupe aggregation's
    exchange — the probe only reads sidecars, so it needs no bucket-exclusive
    shuffle of its own (bucket ids are aligned to Spark's shuffle hash)."""
    from simplecrawler_spark.operators import dedupe as dd

    cands = (spark.range(200)
             .select(F.concat(F.lit("http://h/"), F.col("id")).alias("url_norm"),
                     F.xxhash64(F.concat(F.lit("http://h/"), F.col("id"))).alias("url_hash"),
                     F.lit(0).cast("long").alias("parent_seq"),
                     F.col("id").cast("int").alias("link_idx")))
    first = (cands.groupBy("url_hash", "url_norm")
             .agg(F.min_by(F.struct("parent_seq", "link_idx"),
                           F.struct("parent_seq", "link_idx")).alias("_s"))
             .select("url_hash", "url_norm", "_s.*"))
    new = dd.filter_new(first, str(tmp_path), [], 8, seen_capacity=10_000,
                        bits_per_key=10, mode="tiered", spark=spark)
    plan = _plan(new)
    assert plan.count("Exchange hashpartitioning") == 1  # the agg's own


def test_anti_join_no_cartesian(spark):
    df = entry_mod.queries()["j1_seen_antijoin"](spark, SF)
    plan = _plan(df)
    assert "LeftAnti" in plan and "Cartesian" not in plan


def test_whole_stage_codegen_covers_agg(spark):
    df = entry_mod.queries()["j4_fetch_join"](spark, SF)
    df.collect()  # finalize the adaptive plan
    plan = _plan(df)
    # codegen stages appear as "*(n)" spans in the executed-plan string
    assert "*(3)" in plan or "WholeStageCodegen" in plan
    # and the agg is map-side partial before the exchange
    assert "partial_count" in plan


def test_simhash_pairs_plan_is_equijoin_not_cross(spark):
    from simplecrawler_spark.pipeline.dedup import simhash_pairs
    fps = spark.createDataFrame([(1, 5), (2, 5)], "doc_id long, simhash long")
    plan = _plan(simhash_pairs(fps))
    assert "Cartesian" not in plan and "BroadcastNestedLoop" not in plan


def test_request_start_offsets_math():
    # W3 pacing math (pure): interval ticks + per-host crawl-delay spacing
    from simplecrawler_spark.operators.pacing import request_start_offsets

    # interval only: one start per tick
    assert request_start_offsets(["a", "b", "c"], {}, 0.25) == [0.0, 0.25, 0.5]
    # crawl-delay dominates interval for the repeated host
    got = request_start_offsets(["h", "h", "h"], {"h": 1.0}, 0.25)
    assert got == [0.0, 1.0, 2.0]
    # mixed: other hosts fill the ticks while a slow host waits
    got = request_start_offsets(["h", "x", "h", "x"], {"h": 1.0}, 0.25)
    assert got == [0.0, 0.25, 1.0, 1.0]  # monotonic, h spaced by 1.0
    # no interval, no delays: all immediate
    assert request_start_offsets(["a", "b"], {}, 0.0) == [0.0, 0.0]
    # offsets never decrease (issue order preserved)
    got = request_start_offsets(["h", "h", "x"], {"h": 2.0}, 0.1)
    assert got == sorted(got)


def test_round_pacer_sleeps_remainder():
    from simplecrawler_spark.operators.pacing import RoundPacer

    now = [100.0]
    slept = []
    p = RoundPacer(250.0, clock=lambda: now[0], sleep=slept.append)
    p.round_started()
    now[0] += 0.5                      # round took 0.5 s of real work
    assert p.required_sleep(4) == 0.5  # 4 ticks * 0.25 = 1.0 → sleep 0.5
    p.pace(4)
    assert slept == [0.5]
    # a slow round needs no sleep
    p.round_started()
    now[0] += 3.0
    assert p.pace(4) == 0.0
    # disabled pacer is inert
    p0 = RoundPacer(0.0, clock=lambda: now[0], sleep=slept.append)
    p0.round_started()
    assert p0.pace(100) == 0.0


def test_robots_simple_gate_is_pure_jvm(spark):
    """P2 with wildcard-free rules must compile to JVM expressions — no
    Python eval node in the plan. The gate runs over every discovered
    candidate each round (the engine's widest row stream); a regression
    back to the pandas-UDF path re-adds an Arrow round trip per round."""
    from simplecrawler_spark.config import CrawlConfig
    from simplecrawler_spark.operators.admission import robots_allowed_col

    cfg = CrawlConfig(seeds=["http://a/"])
    robots = spark.createDataFrame(
        [("a", ["/private/"], ["/private/p/0"], None)],
        "host string, disallow array<string>, allow array<string>, crawl_delay double")
    cands = spark.createDataFrame(
        [("http://a/p/1", "a"), ("http://b/x", "b")],
        "url_norm string, host string")
    jvm_plan = _plan(robots_allowed_col(cands, robots, cfg, rules_simple=True))
    assert "ArrowEvalPython" not in jvm_plan and "BatchEvalPython" not in jvm_plan
    assert "BroadcastHashJoin" in jvm_plan
    udf_plan = _plan(robots_allowed_col(cands, robots, cfg, rules_simple=False))
    assert "ArrowEvalPython" in udf_plan  # the wildcard fallback stays Python
