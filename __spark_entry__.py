"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes the engine's operator inventory (SURVEY.md §2) over the
driver's relational testdata, plus the training-data pipeline operators
(dedup / similarity / text analysis) over ``documents``/``embeddings``.
``oracle_sql()`` gives the DuckDB twin for EVERY entry — same column names,
same rounding, deterministic ordering — so the driver's row-count + schema +
value-hash comparison is exact for all 27 queries. Entries whose natural
hash family is seeded-numpy (Gaussian hyperplanes, xxhash shingles) expose
an md5-derived deterministic family here instead (rademacher_planes /
simhash_md5 mode="word") with the SQL replaying the identical arithmetic;
the tunable numpy variants stay pytest-pinned (tests/test_entry_oracle.py,
tests/test_pipeline.py).

The crawl engine itself (frontier/BSP loop) runs on its own generated corpus
— covered by tests/test_crawl_parity.py and bench.py, not by these oracles.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

SF_DEFAULT = "/root/testdata/sf0.001"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --------------------------------------------------------------------------
# flagship: the scheduler composite — per-host politeness window (W2) over an
# orders-as-frontier, anti-join dedupe (J1), fetch join (J4), outcome agg (A5)
# --------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    orders = _t(spark, SF_DEFAULT, "orders")
    customer = _t(spark, SF_DEFAULT, "customer")
    nation = _t(spark, SF_DEFAULT, "nation")
    w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
    batch = (
        orders.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)                     # W2 host budget
        .orderBy("o_orderkey").limit(500)            # W1 FIFO budget
    )
    seen = orders.where(F.col("o_orderstatus") == "F").select("o_orderkey")
    fresh = batch.join(seen, "o_orderkey", "left_anti")  # J1 anti-join
    return (
        fresh.join(customer, fresh.o_custkey == customer.c_custkey)  # J4
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_fetched"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("bytes_analog"),
        )
        .orderBy("n_name")
    )


# --------------------------------------------------------------------------
# operator queries (SURVEY.md §2 ids in the keys)
# --------------------------------------------------------------------------

def _w1_fifo_topk(spark, sf):
    return (_t(spark, sf, "orders")
            .select(F.col("o_orderkey").alias("seq"), F.col("o_custkey").alias("host"))
            .orderBy("seq").limit(100))


def _w2_host_budget(spark, sf):
    w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
    return (_t(spark, sf, "orders")
            .withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= 3)
            .select(F.col("o_orderkey").alias("seq"), F.col("o_custkey").alias("host")))


def _j1_seen_antijoin(spark, sf):
    # the "seen" side excludes custkeys ≡ 0 (mod 3), so every such customer
    # with orders survives the anti-join — the result is GUARANTEED non-empty
    # at every sf (plain customers-without-orders is empty at small sf, which
    # made round 1–2's check vacuously green: 0 rows proves only schema)
    c, o = _t(spark, sf, "customer"), _t(spark, sf, "orders")
    seen = (o.where(F.col("o_custkey") % 3 != 0)
            .select(F.col("o_custkey").alias("c_custkey")))
    return c.join(seen, "c_custkey", "left_anti").select("c_custkey")


def _u3_first_wins(spark, sf):
    w = Window.partitionBy("l_partkey").orderBy("l_orderkey", "l_linenumber")
    return (_t(spark, sf, "lineitem")
            .withColumn("rn", F.row_number().over(w)).where(F.col("rn") == 1)
            .select("l_partkey", "l_orderkey", "l_linenumber"))


def _a1_queue_stats(spark, sf):
    return _t(spark, sf, "lineitem").agg(
        F.max("l_quantity").alias("max_q"),
        F.min("l_quantity").alias("min_q"),
        F.round(F.avg("l_quantity"), 6).alias("avg_q"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double").alias("sum_price"),
    )


def _a2_count_items(spark, sf):
    return (_t(spark, sf, "events")
            .where((F.col("event_type") == "error") & (F.col("value") > 5))
            .agg(F.count(F.lit(1)).alias("n")))


def _a5_status_counts(spark, sf):
    return (_t(spark, sf, "orders").groupBy(F.col("o_orderstatus").alias("status"))
            .agg(F.count(F.lit(1)).alias("n")))


def _a6_distinct(spark, sf):
    return _t(spark, sf, "lineitem").agg(
        F.countDistinct("l_partkey").alias("n_distinct"))


def _p1_domain_filter(spark, sf):
    return (_t(spark, sf, "customer")
            .where(F.col("c_mktsegment").isin("BUILDING", "AUTOMOBILE"))
            .select("c_custkey", "c_name"))


def _p5_depth_gate(spark, sf):
    return (_t(spark, sf, "lineitem").where(F.col("l_linenumber") <= 3)
            .groupBy("l_returnflag").agg(F.count(F.lit(1)).alias("n")))


def _j4_fetch_join(spark, sf):
    o, c, n = _t(spark, sf, "orders"), _t(spark, sf, "customer"), _t(spark, sf, "nation")
    return (o.join(c, o.o_custkey == c.c_custkey)
            .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
            .groupBy("n_name")
            .agg(F.count(F.lit(1)).alias("n_orders"),
                 F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("revenue")))


def _j2_broadcast_lookup(spark, sf):
    n, r = _t(spark, sf, "nation"), _t(spark, sf, "region")
    return (n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
            .select("n_name", "r_name"))


# ---- training-data pipeline ops ----

def _j3_cache_lookup(spark, sf):
    """J3/S6 — conditional-GET cache lookup: derive the cache VIEW from a
    fetched-log-shaped relation (operators/cache.cache_from_fetched_log),
    then annotate a fetch batch with the latest cached etag / payload ref
    (with_conditional_headers — semi-join prune, latest-entry window, no
    full-cache shuffle). Reference: getRequestOptions If-None-Match
    (crawler.js:≈L1160–1200) over cacheindex.json (cache-backend-fs.js:≈L60).
    The fetched log is synthesized from `orders` so URLs collide across
    rounds (window exercised) and some batch URLs have no downloaded entry
    (null-miss path exercised)."""
    from simplecrawler_spark.operators.cache import (cache_from_fetched_log,
                                                     with_conditional_headers)
    o = _t(spark, sf, "orders")
    fetched = (o.select(
        F.concat(F.lit("http://h"), (F.col("o_custkey") % 50).cast("string"),
                 F.lit(".example/p/"),
                 (F.col("o_orderkey") % 1000).cast("string")).alias("url_norm"),
        F.col("o_orderkey").cast("int").alias("round_fetched"),
        F.when(F.col("o_orderkey") % 3 == 0,
               F.concat(F.lit("img"), F.col("o_orderkey").cast("string"))
               ).alias("image_id"),
        ((F.col("o_orderkey") * 37) % 100000).cast("long").alias("body_size"),
        F.when(F.col("o_orderkey") % 2 == 0, F.lit("downloaded"))
        .otherwise(F.lit("failed")).alias("status"),
        "o_orderkey")
        .withColumn("url_hash", F.md5("url_norm")))
    cache = cache_from_fetched_log(fetched)
    batch = (fetched.where(F.col("o_orderkey") % 5 == 0)
             .select("url_hash").distinct())
    out = with_conditional_headers(batch, cache)
    # cache misses surface as '' (not NULL): mixed None/str rows break the
    # comparator's row sort, and the miss path stays value-checked
    return out.select(
        "url_hash",
        F.coalesce("cached_etag", F.lit("")).alias("cached_etag"),
        F.coalesce("cached_ref", F.lit("")).alias("cached_ref"),
    ).orderBy("url_hash")


def _dedup_exact(spark, sf):
    from simplecrawler_spark.pipeline.dedup import exact_dupes
    return exact_dupes(_t(spark, sf, "documents"))


def _text_tokens(spark, sf):
    from simplecrawler_spark.pipeline.text import token_counts
    d = token_counts(_t(spark, sf, "documents"))
    return d.select("doc_id", F.col("ws_tokens").cast("int").alias("ws_tokens"),
                    F.col("bpe_tokens").cast("int").alias("bpe_tokens"))


def _text_quality(spark, sf):
    from simplecrawler_spark.pipeline.text import quality_scores
    q = quality_scores(_t(spark, sf, "documents"))
    return q.select("doc_id", F.col("n_chars").cast("long").alias("n_chars"),
                    F.col("n_words").cast("int").alias("n_words"),
                    "punct_ratio", "stopword_ratio", "mean_word_len")


def _lang_id(spark, sf):
    from simplecrawler_spark.pipeline.text import language_id
    return language_id(_t(spark, sf, "documents"))


def _fingerprints(spark, sf):
    # md5-based 60-bit fingerprint: exactly DuckDB-checkable (the rolling-hash
    # variant pipeline.text.fingerprints stays pytest-pinned — mod-2^64
    # polynomial arithmetic is not ANSI-SQL-expressible)
    from simplecrawler_spark.pipeline.dedup import fingerprint_md5
    return fingerprint_md5(_t(spark, sf, "documents"))


def _ngram_jaccard(spark, sf):
    from simplecrawler_spark.pipeline.dedup import ngram_jaccard_pairs
    return ngram_jaccard_pairs(_t(spark, sf, "documents"), threshold=0.3)


def _simhash_md5_near_dup(spark, sf):
    from simplecrawler_spark.pipeline.dedup import simhash_md5_pairs
    return simhash_md5_pairs(_t(spark, sf, "documents"), max_hamming=3)


def _ann_cosine_topk(spark, sf):
    from simplecrawler_spark.pipeline.similarity import cosine_topk
    emb = _t(spark, sf, "embeddings")
    qvec = emb.where(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    return cosine_topk(emb.where(F.col("vec_id") != 0), [float(x) for x in qvec], k=10)


def _ann_lsh_topk(spark, sf):
    # md5-derived Rademacher hyperplanes (similarity.rademacher_planes):
    # exactly DuckDB-oracled — the SQL twin replays the same literal ±sums in
    # the same term order. The seeded-Gaussian variant (ann_topk_lsh) stays
    # pytest-pinned (tests/test_entry_oracle.py) as the tunable path.
    from simplecrawler_spark.pipeline.similarity import ann_topk_lsh_md5
    emb = _t(spark, sf, "embeddings")
    qvec = emb.where(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    return ann_topk_lsh_md5(emb.where(F.col("vec_id") != 0), [float(x) for x in qvec],
                            k=10, n_bits=8, probe_hamming=1)


def _ann_ivf_topk(spark, sf):
    from simplecrawler_spark.pipeline.similarity import ivf_flat_topk
    emb = _t(spark, sf, "embeddings")
    qvec = emb.where(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    return ivf_flat_topk(emb.where(F.col("vec_id") != 0), [float(x) for x in qvec],
                         k=10, n_centroids=16, nprobe=4)


def _ann_axis_topk(spark, sf):
    from simplecrawler_spark.pipeline.similarity import ann_topk_axis
    emb = _t(spark, sf, "embeddings")
    qvec = emb.where(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    return ann_topk_axis(emb.where(F.col("vec_id") != 0), [float(x) for x in qvec],
                         k=10, n_bits=10, probe_hamming=1)


def _minhash_near_dup(spark, sf):
    # one-permutation-hashing variant (md5 gram hashes, pure built-ins):
    # exactly DuckDB-oracled. The seeded-numpy k-permutation banded variant
    # (minhash_signatures→minhash_pairs→jaccard_verify) stays pytest-pinned
    # (tests/test_pipeline.py) — its xxhash-family gram hash has no SQL twin.
    from simplecrawler_spark.pipeline.dedup import minhash_oph_pairs
    return minhash_oph_pairs(_t(spark, sf, "documents"), threshold=0.5)


def _simhash_near_dup(spark, sf):
    # word-token md5 SimHash (mode="word", dedup.simhash_md5): exactly
    # DuckDB-oracled (brute-force O(n²) SQL twin; the Spark side's 4×16-bit
    # pigeonhole blocking is lossless for hamming ≤ 3). Distinct operator
    # from simhash_md5_near_dup (char 5-grams): token votes are robust to
    # reordering, char shingles to layout edits. The xxhash rolling-shingle
    # variant (simhash_fingerprints→simhash_pairs) stays pytest-pinned.
    from simplecrawler_spark.pipeline.dedup import simhash_md5_pairs
    return simhash_md5_pairs(_t(spark, sf, "documents"), max_hamming=3, mode="word")


def _embed_near_dup(spark, sf):
    # axis-aligned sign-LSH variant: deterministic bucket key ⇒ exactly
    # DuckDB-oracled. The Gaussian-hyperplane variant (embedding_near_dupes)
    # stays pytest-pinned — seeded-numpy hyperplanes have no SQL twin.
    from simplecrawler_spark.pipeline.similarity import axis_sign_near_dupes
    # threshold 0.3: the driver's embeddings are near-isotropic (max pairwise
    # cosine ≈ 0.51, no planted dups), so 0.98 returned ZERO pairs at every
    # sf — a vacuously-green oracle. 0.3 yields pairs at sf0.001 AND sf0.01,
    # so bucketing + cosine + threshold are all value-checked on real rows.
    return axis_sign_near_dupes(_t(spark, sf, "embeddings"), threshold=0.3, n_bits=10)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "w1_fifo_topk": _w1_fifo_topk,
        "w2_host_budget": _w2_host_budget,
        "j1_seen_antijoin": _j1_seen_antijoin,
        "j2_broadcast_lookup": _j2_broadcast_lookup,
        "j3_cache_lookup": _j3_cache_lookup,
        "j4_fetch_join": _j4_fetch_join,
        "u3_first_wins": _u3_first_wins,
        "a1_queue_stats": _a1_queue_stats,
        "a2_count_items": _a2_count_items,
        "a5_status_counts": _a5_status_counts,
        "a6_distinct": _a6_distinct,
        "p1_domain_filter": _p1_domain_filter,
        "p5_depth_gate": _p5_depth_gate,
        "dedup_exact": _dedup_exact,
        "ngram_jaccard": _ngram_jaccard,
        "simhash_md5_near_dup": _simhash_md5_near_dup,
        "text_tokens": _text_tokens,
        "text_quality": _text_quality,
        "lang_id": _lang_id,
        "fingerprints": _fingerprints,
        "ann_cosine_topk": _ann_cosine_topk,
        "ann_lsh_topk": _ann_lsh_topk,
        "ann_ivf_topk": _ann_ivf_topk,
        "ann_axis_topk": _ann_axis_topk,
        "minhash_near_dup": _minhash_near_dup,
        "simhash_near_dup": _simhash_near_dup,
        "embed_near_dup": _embed_near_dup,
    }


def _signed_sum(arr: str, signs: list[int]) -> str:
    """±element_at sum as SQL, in the SAME left-to-right term order as the
    Spark expression built by similarity.ann_topk_lsh_md5 — identical IEEE
    float64 fold, so the >= 0 sign bit agrees at every boundary."""
    parts = []
    for j, s in enumerate(signs):
        term = f"{arr}[{j + 1}]"
        parts.append((term if s > 0 else f"-{term}") if not parts
                     else f" {'+' if s > 0 else '-'} {term}")
    return "".join(parts)


def _ann_lsh_md5_sql(n_bits: int = 8, dim: int = 64, seed: int = 42,
                     probe_hamming: int = 1, k: int = 10) -> str:
    """DuckDB twin of similarity.ann_topk_lsh_md5: the md5-derived ±1
    hyperplanes are regenerated here (same pure function of (seed, i, j))
    and embedded as literal signed sums; Hamming(sig(v), sig(q)) ≤ probe,
    exact cosine re-rank (4 dp, id tie-break) — same as ann_cosine_topk."""
    from simplecrawler_spark.pipeline.similarity import rademacher_planes

    planes = rademacher_planes(n_bits, dim, seed)
    ham = " + ".join(
        f"CASE WHEN (({_signed_sum('e.v', row)}) >= 0)"
        f" <> (({_signed_sum('q.qv', row)}) >= 0) THEN 1 ELSE 0 END"
        for row in planes)
    return (
        "WITH q AS (SELECT embedding::DOUBLE[] AS qv, embedding AS qe"
        " FROM embeddings WHERE vec_id = 0),"
        " e AS (SELECT vec_id, embedding, embedding::DOUBLE[] AS v"
        " FROM embeddings WHERE vec_id <> 0)"
        " SELECT e.vec_id, ROUND(CAST(list_cosine_similarity(e.embedding, q.qe)"
        " AS DOUBLE), 4) AS cosine"
        f" FROM e, q WHERE ({ham}) <= {probe_hamming}"
        f" ORDER BY cosine DESC, e.vec_id LIMIT {k}"
    )


_STOP_EN = r"\b(the|a|and|of|to|in|is|it)\b"
_STOP_DE = r"\b(der|die|das|und|ist|nicht|ein)\b"
_STOP_FR = r"\b(le|la|les|et|est|une|pas)\b"
_WORD_RE = r"[A-Za-z0-9]+|[^A-Za-z0-9\s]"


def oracle_sql() -> dict[str, str]:
    return {
        "w1_fifo_topk": (
            "SELECT o_orderkey AS seq, o_custkey AS host FROM orders "
            "ORDER BY seq LIMIT 100"
        ),
        "w2_host_budget": (
            "SELECT o_orderkey AS seq, o_custkey AS host FROM ("
            " SELECT o_orderkey, o_custkey,"
            "  ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS rn"
            " FROM orders) t WHERE rn <= 3"
        ),
        "j1_seen_antijoin": (
            "SELECT c_custkey FROM customer c WHERE NOT EXISTS "
            "(SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey"
            " AND o.o_custkey % 3 <> 0)"
        ),
        "j2_broadcast_lookup": (
            "SELECT n_name, r_name FROM nation JOIN region ON n_regionkey = r_regionkey"
        ),
        "j3_cache_lookup": (
            "WITH fetched AS ("
            " SELECT 'http://h' || CAST(o_custkey % 50 AS VARCHAR) ||"
            "  '.example/p/' || CAST(o_orderkey % 1000 AS VARCHAR) AS url_norm,"
            "  CAST(o_orderkey AS INT) AS round_fetched,"
            "  CASE WHEN o_orderkey % 3 = 0 THEN 'img' || CAST(o_orderkey AS VARCHAR) END AS image_id,"
            "  (o_orderkey * 37) % 100000 AS body_size,"
            "  CASE WHEN o_orderkey % 2 = 0 THEN 'downloaded' ELSE 'failed' END AS status,"
            "  o_orderkey"
            " FROM orders), hashed AS ("
            " SELECT *, md5(url_norm) AS url_hash FROM fetched), cache AS ("
            " SELECT url_hash,"
            "  md5(url_norm || '|' || COALESCE(image_id, '') || '|' || CAST(body_size AS VARCHAR)) AS etag,"
            "  COALESCE(image_id, url_norm) AS payload_ref, round_fetched AS round_cached"
            " FROM hashed WHERE status = 'downloaded'), latest AS ("
            " SELECT url_hash, etag, payload_ref FROM ("
            "  SELECT url_hash, etag, payload_ref,"
            "   ROW_NUMBER() OVER (PARTITION BY url_hash ORDER BY round_cached DESC) AS rn"
            "  FROM cache) t WHERE rn = 1), batch AS ("
            " SELECT DISTINCT url_hash FROM hashed WHERE o_orderkey % 5 = 0)"
            " SELECT b.url_hash, COALESCE(l.etag, '') AS cached_etag,"
            "  COALESCE(l.payload_ref, '') AS cached_ref"
            " FROM batch b LEFT JOIN latest l USING (url_hash) ORDER BY url_hash"
        ),
        "j4_fetch_join": (
            "SELECT n_name, COUNT(*) AS n_orders,"
            " CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue"
            " FROM orders JOIN customer ON o_custkey = c_custkey"
            " JOIN nation ON c_nationkey = n_nationkey GROUP BY n_name"
        ),
        "u3_first_wins": (
            "SELECT l_partkey, l_orderkey, l_linenumber FROM ("
            " SELECT l_partkey, l_orderkey, l_linenumber,"
            "  ROW_NUMBER() OVER (PARTITION BY l_partkey ORDER BY l_orderkey, l_linenumber) AS rn"
            " FROM lineitem) t WHERE rn = 1"
        ),
        "a1_queue_stats": (
            "SELECT MAX(l_quantity) AS max_q, MIN(l_quantity) AS min_q,"
            " ROUND(AVG(l_quantity), 6) AS avg_q,"
            " CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price"
            " FROM lineitem"
        ),
        "a2_count_items": (
            "SELECT COUNT(*) AS n FROM events WHERE event_type = 'error' AND value > 5"
        ),
        "a5_status_counts": (
            "SELECT o_orderstatus AS status, COUNT(*) AS n FROM orders GROUP BY o_orderstatus"
        ),
        "a6_distinct": (
            "SELECT COUNT(DISTINCT l_partkey) AS n_distinct FROM lineitem"
        ),
        "p1_domain_filter": (
            "SELECT c_custkey, c_name FROM customer "
            "WHERE c_mktsegment IN ('BUILDING','AUTOMOBILE')"
        ),
        "p5_depth_gate": (
            "SELECT l_returnflag, COUNT(*) AS n FROM lineitem "
            "WHERE l_linenumber <= 3 GROUP BY l_returnflag"
        ),
        "dedup_exact": (
            "SELECT md5(text) AS content_hash, MIN(doc_id) AS keep_id,"
            " COUNT(*) AS n_copies FROM documents GROUP BY md5(text)"
        ),
        "fingerprints": (
            "SELECT doc_id, CAST(list_sum(list_transform(range(1, 16),"
            " i -> CAST(strpos('0123456789abcdef',"
            "   substr(md5(lower(coalesce(text, ''))), CAST(i AS INT), 1)) - 1 AS BIGINT)"
            "  * (CAST(1 AS BIGINT) << CAST(4 * (15 - i) AS INT)))) AS BIGINT) AS fp64"
            " FROM documents"
        ),
        "ngram_jaccard": (
            "WITH raw AS ("
            " SELECT doc_id, unnest(list_transform("
            "  range(1, greatest(length(lower(coalesce(text, ''))) - 4, 1) + 1),"
            "  i -> substr(lower(coalesce(text, '')), CAST(i AS INT), 5))) AS gg"
            " FROM documents),"
            " grams AS (SELECT DISTINCT doc_id, gg FROM raw),"
            " keep AS (SELECT gg FROM grams GROUP BY gg HAVING count(*) <= 10000),"
            " bl AS (SELECT doc_id, gg FROM grams WHERE gg IN (SELECT gg FROM keep)),"
            " cnt AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY doc_id),"
            " inter AS (SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS i"
            "  FROM bl x JOIN bl y ON x.gg = y.gg AND x.doc_id < y.doc_id GROUP BY 1, 2)"
            " SELECT a, b, ROUND(i * 1.0 / (ca.n + cb.n - i), 6) AS jaccard"
            " FROM inter JOIN cnt ca ON ca.doc_id = a JOIN cnt cb ON cb.doc_id = b"
            " WHERE ROUND(i * 1.0 / (ca.n + cb.n - i), 6) >= 0.3"
        ),
        "simhash_md5_near_dup": (
            # brute-force O(n²) oracle over the same md5-gram simhash bits;
            # the Spark side's 4x16-bit pigeonhole blocking is LOSSLESS for
            # hamming <= 3, so the outputs must match exactly
            "WITH raw AS ("
            " SELECT doc_id, unnest(list_distinct(list_transform("
            "  range(1, greatest(length(lower(coalesce(text, ''))) - 4, 1) + 1),"
            "  i -> substr(lower(coalesce(text, '')), CAST(i AS INT), 5)))) AS gr"
            " FROM documents),"
            " hx AS (SELECT doc_id, md5(gr) AS h FROM raw),"
            " votes AS (SELECT doc_id, j,"
            "  SUM((2 * ((CAST(strpos('0123456789abcdef',"
            "    substr(h, CAST(j // 4 AS INT) + 1, 1)) - 1 AS INT)"
            "    >> CAST(3 - (j % 4) AS INT)) & 1)) - 1) AS v"
            "  FROM hx CROSS JOIN (SELECT unnest(range(0, 64)) AS j) bits"
            "  GROUP BY doc_id, j),"
            " sh AS (SELECT doc_id, list(CASE WHEN v > 0 THEN 1 ELSE 0 END ORDER BY j)"
            "   AS bits FROM votes GROUP BY doc_id)"
            " SELECT a, b, hamming FROM ("
            "  SELECT x.doc_id AS a, y.doc_id AS b,"
            "   CAST(list_sum(list_transform(range(1, 65),"
            "    k -> abs(x.bits[CAST(k AS INT)] - y.bits[CAST(k AS INT)]))) AS INT)"
            "   AS hamming"
            "  FROM sh x JOIN sh y ON x.doc_id < y.doc_id) p"
            " WHERE hamming <= 3"
        ),
        "text_tokens": (
            "SELECT doc_id,"
            " CAST(CASE WHEN trim(text) = '' THEN 0"
            "  ELSE len(string_split_regex(trim(text), '\\s+')) END AS INTEGER) AS ws_tokens,"
            f" CAST(len(regexp_extract_all(trim(text), '{_WORD_RE}')) AS INTEGER) AS bpe_tokens"
            " FROM documents"
        ),
        "text_quality": (
            "SELECT doc_id,"
            " CAST(length(text) AS BIGINT) AS n_chars,"
            " CAST(CASE WHEN trim(text) = '' THEN 0"
            "  ELSE len(string_split_regex(trim(text), '\\s+')) END AS INTEGER) AS n_words,"
            " ROUND(len(regexp_extract_all(text, '[.,!?;:]'))"
            "   / GREATEST(length(text), 1), 6) AS punct_ratio,"
            f" ROUND(len(regexp_extract_all(lower(text), '{_STOP_EN}'))"
            "   / GREATEST(CASE WHEN trim(text) = '' THEN 0"
            "      ELSE len(string_split_regex(trim(text), '\\s+')) END, 1), 6) AS stopword_ratio,"
            " ROUND(length(text) / GREATEST(CASE WHEN trim(text) = '' THEN 0"
            "   ELSE len(string_split_regex(trim(text), '\\s+')) END, 1), 6) AS mean_word_len"
            " FROM documents"
        ),
        "lang_id": (
            "SELECT doc_id, CASE"
            f" WHEN en >= de AND en >= fr AND en > 0 THEN 'en'"
            f" WHEN de >= fr AND de > 0 THEN 'de'"
            f" WHEN fr > 0 THEN 'fr'"
            " ELSE 'unknown' END AS lang_pred FROM ("
            f" SELECT doc_id, len(regexp_extract_all(lower(text), '{_STOP_EN}')) AS en,"
            f" len(regexp_extract_all(lower(text), '{_STOP_DE}')) AS de,"
            f" len(regexp_extract_all(lower(text), '{_STOP_FR}')) AS fr FROM documents) t"
        ),
        "minhash_near_dup": (
            # one-permutation hashing (OPH): one md5-low-60-bit hash per
            # distinct 5-gram, bucket = h % 64, signature component = min per
            # bucket, band key = 4 consecutive (bucket:minhash) components,
            # candidate pairs share a band (buckets capped at 4096 like the
            # engine), verified by exact distinct-gram Jaccard >= 0.5.
            "WITH raw AS ("
            " SELECT doc_id, unnest(list_transform("
            "  range(1, greatest(length(lower(coalesce(text, ''))) - 4, 1) + 1),"
            "  i -> substr(lower(coalesce(text, '')), CAST(i AS INT), 5))) AS g"
            " FROM documents),"
            " grams AS (SELECT DISTINCT doc_id, g FROM raw),"
            " hashed AS (SELECT doc_id, CAST(list_sum(list_transform(range(1, 16),"
            "  i -> CAST(strpos('0123456789abcdef',"
            "    substr(md5(g), CAST(i AS INT), 1)) - 1 AS BIGINT)"
            "   * (CAST(1 AS BIGINT) << CAST(4 * (15 - i) AS INT)))) AS BIGINT) AS h"
            "  FROM grams),"
            " comps AS (SELECT doc_id, h % 64 AS bkt, MIN(h) AS mh"
            "  FROM hashed GROUP BY doc_id, h % 64),"
            " keys AS (SELECT doc_id, CAST(bkt // 4 AS INT) AS band,"
            "   string_agg(bkt || ':' || mh, ',' ORDER BY bkt) AS bkey"
            "  FROM comps GROUP BY doc_id, bkt // 4),"
            " ok AS (SELECT band, bkey FROM keys GROUP BY band, bkey"
            "  HAVING count(*) <= 4096),"
            " kk AS (SELECT k.* FROM keys k JOIN ok USING (band, bkey)),"
            " cand AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b FROM kk x"
            "  JOIN kk y ON x.band = y.band AND x.bkey = y.bkey AND x.doc_id < y.doc_id),"
            " cnt AS (SELECT doc_id, count(*) AS ng FROM hashed GROUP BY doc_id),"
            " inter AS (SELECT c.a, c.b, count(*) AS i FROM cand c"
            "  JOIN hashed ga ON ga.doc_id = c.a"
            "  JOIN hashed gb ON gb.doc_id = c.b AND gb.h = ga.h GROUP BY c.a, c.b)"
            " SELECT a, b, ROUND(i * 1.0 / (ca.ng + cb.ng - i), 6) AS jaccard"
            " FROM inter JOIN cnt ca ON ca.doc_id = a JOIN cnt cb ON cb.doc_id = b"
            " WHERE ROUND(i * 1.0 / (ca.ng + cb.ng - i), 6) >= 0.5"
        ),
        "embed_near_dup": (
            # axis-aligned sign LSH: bit i = sign(embedding[1 + 6*i]) for
            # i in 0..9 (64-dim vectors), bucket = 10-char bit string capped
            # at 4096 members; exact float64 cosine >= 0.3 inside buckets
            # (see _embed_near_dup for why 0.3: guaranteed-non-empty check),
            # rounded to 4 decimals before the compare on both engines.
            "WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v,"
            "  concat(" + ", ".join(
                f"CASE WHEN embedding[{1 + 6 * i}] >= 0 THEN '1' ELSE '0' END"
                for i in range(10)) + ") AS bucket"
            " FROM embeddings),"
            " ok AS (SELECT bucket FROM e GROUP BY bucket HAVING count(*) <= 4096),"
            " ee AS (SELECT e.* FROM e JOIN ok USING (bucket))"
            " SELECT a, b, cosine FROM ("
            "  SELECT x.vec_id AS a, y.vec_id AS b,"
            "   ROUND(CAST(list_cosine_similarity(x.v, y.v) AS DOUBLE), 4) AS cosine"
            "  FROM ee x JOIN ee y ON x.bucket = y.bucket AND x.vec_id < y.vec_id) p"
            " WHERE cosine >= 0.3"
        ),
        "ann_axis_topk": (
            # axis-aligned sign-LSH top-k: signature bit i = sign of
            # coordinate 1+6i (i in 0..9); candidates within Hamming 1 of
            # the query signature, exact cosine re-rank (4 dp, id tie-break)
            "WITH q AS (SELECT embedding::DOUBLE[] AS qe, embedding AS qraw"
            "  FROM embeddings WHERE vec_id = 0)"
            " SELECT e.vec_id, ROUND(CAST(list_cosine_similarity(e.embedding::DOUBLE[], q.qe) AS DOUBLE), 4) AS cosine"
            " FROM embeddings e, q WHERE e.vec_id <> 0 AND ("
            + " + ".join(
                f"CASE WHEN (e.embedding[{1 + 6 * i}] >= 0) <> (q.qraw[{1 + 6 * i}] >= 0)"
                " THEN 1 ELSE 0 END"
                for i in range(10))
            + ") <= 1"
            " ORDER BY cosine DESC, e.vec_id LIMIT 10"
        ),
        "ann_lsh_topk": _ann_lsh_md5_sql(n_bits=8, dim=64, seed=42,
                                         probe_hamming=1, k=10),
        "simhash_near_dup": (
            # word-token md5 SimHash, brute-force O(n²) oracle (the Spark
            # side's pigeonhole blocking is lossless for hamming <= 3);
            # token extraction mirrors dedup._words_sql exactly
            "WITH raw AS ("
            " SELECT doc_id, unnest(list_distinct(string_split_regex("
            "  trim(lower(coalesce(text, ''))), '\\s+'))) AS gr"
            " FROM documents),"
            " hx AS (SELECT doc_id, md5(gr) AS h FROM raw),"
            " votes AS (SELECT doc_id, j,"
            "  SUM((2 * ((CAST(strpos('0123456789abcdef',"
            "    substr(h, CAST(j // 4 AS INT) + 1, 1)) - 1 AS INT)"
            "    >> CAST(3 - (j % 4) AS INT)) & 1)) - 1) AS v"
            "  FROM hx CROSS JOIN (SELECT unnest(range(0, 64)) AS j) bits"
            "  GROUP BY doc_id, j),"
            " sh AS (SELECT doc_id, list(CASE WHEN v > 0 THEN 1 ELSE 0 END ORDER BY j)"
            "   AS bits FROM votes GROUP BY doc_id)"
            " SELECT a, b, hamming FROM ("
            "  SELECT x.doc_id AS a, y.doc_id AS b,"
            "   CAST(list_sum(list_transform(range(1, 65),"
            "    k -> abs(x.bits[CAST(k AS INT)] - y.bits[CAST(k AS INT)]))) AS INT)"
            "   AS hamming"
            "  FROM sh x JOIN sh y ON x.doc_id < y.doc_id) p"
            " WHERE hamming <= 3"
        ),
        "ann_cosine_topk": (
            "WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)"
            " SELECT e.vec_id, ROUND(CAST(list_cosine_similarity(e.embedding, q.qe) AS DOUBLE), 4) AS cosine"
            " FROM embeddings e, q WHERE e.vec_id <> 0"
            " ORDER BY cosine DESC, e.vec_id LIMIT 10"
        ),
        "ann_ivf_topk": (
            # IVF-Flat: codebook = 16 lowest-id vectors; assign each vector
            # to its nearest centroid (ROUND(cos,6) DESC, cid tie-break —
            # mirrors the engine's array_max struct ordering); probe the 4
            # cells nearest the query; exact re-rank inside them.
            "WITH q AS (SELECT embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id = 0),"
            " c AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS cvec FROM embeddings"
            "       WHERE vec_id <> 0 ORDER BY vec_id LIMIT 16),"
            " probe AS (SELECT cid FROM c, q"
            "           ORDER BY ROUND(CAST(list_cosine_similarity(cvec, qe) AS DOUBLE), 6) DESC, cid"
            "           LIMIT 4),"
            " assign AS (SELECT vec_id, cid FROM ("
            "   SELECT e.vec_id, c.cid, ROW_NUMBER() OVER (PARTITION BY e.vec_id"
            "     ORDER BY ROUND(CAST(list_cosine_similarity(e.embedding::DOUBLE[], c.cvec) AS DOUBLE), 6) DESC, c.cid) AS rn"
            "   FROM embeddings e, c WHERE e.vec_id <> 0) WHERE rn = 1)"
            " SELECT e.vec_id, ROUND(CAST(list_cosine_similarity(e.embedding::DOUBLE[], q.qe) AS DOUBLE), 4) AS cosine"
            " FROM embeddings e JOIN assign a ON e.vec_id = a.vec_id, q"
            " WHERE a.cid IN (SELECT cid FROM probe)"
            " ORDER BY cosine DESC, e.vec_id LIMIT 10"
        ),
    }
