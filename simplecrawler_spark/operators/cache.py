"""S6/J3 — fetch cache + conditional GET.

Reference: FS cache backend mirrors bodies to URL-derived paths with a
``cacheindex.json`` (``lib/cache-backend-fs.js:≈L40–320``); on refetch,
``getRequestOptions`` adds If-None-Match / If-Modified-Since from the cached
entry (``lib/crawler.js:≈L1160–1200``) and a 304 serves the cached body as
status ``notmodified`` (``:≈L1360``).

Table model: ``fetch_cache(url_hash, etag, last_modified, payload_ref,
round_cached)`` — the conditional-GET probe is a **left join of the (small,
broadcast) fetch batch against the cache**, carrying ``etag`` into the fetch
seam; a 304-equivalent outcome reuses ``payload_ref`` instead of new bytes.
In-sandbox the ``web`` table's ``status_code=304`` rows stand in for servers
answering Not-Modified; these helpers maintain and consume the cache table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

CACHE_COLS = ["url_hash", "etag", "last_modified", "payload_ref", "round_cached"]


def cache_delta_from_fetched(fetched: DataFrame, rnd: int) -> DataFrame:
    """Downloaded rows → cache entries. ETag is modeled deterministically as
    the payload identity (md5 of url + content identity columns) — the
    reference stores the server's header verbatim; the table shape is what
    matters for the join."""
    d = fetched.where(F.col("status") == "downloaded")
    return d.select(
        "url_hash",
        F.md5(F.concat_ws("|", "url_norm", F.coalesce(F.col("image_id"), F.lit("")),
                          F.col("body_size").cast("string"))).alias("etag"),
        F.col("round_fetched").cast("long").alias("last_modified"),
        F.coalesce(F.col("image_id"), F.col("url_norm")).alias("payload_ref"),
        F.lit(rnd).alias("round_cached"),
    )


def with_conditional_headers(batch: DataFrame, cache: DataFrame | None) -> DataFrame:
    """J3 — annotate a fetch batch with cached etag/last_modified (the
    If-None-Match analog). The (huge) cache side is FIRST semi-joined down to
    the batch's url_hashes (broadcast of the small batch keys — one pruned
    scan, no shuffle of the cache), THEN the latest-entry window runs on the
    batch-sized survivor set, THEN the result broadcasts back onto the
    batch. At no point does the full cache shuffle."""
    if cache is None:
        return (batch.withColumn("cached_etag", F.lit(None).cast("string"))
                .withColumn("cached_ref", F.lit(None).cast("string")))
    from pyspark.sql import Window
    cand = cache.join(F.broadcast(batch.select("url_hash").distinct()), "url_hash")
    w = Window.partitionBy("url_hash").orderBy(F.desc("round_cached"))
    latest = (cand.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") == 1)
              .select("url_hash", F.col("etag").alias("cached_etag"),
                      F.col("payload_ref").alias("cached_ref")))
    return batch.join(F.broadcast(latest), "url_hash", "left")


def cache_from_fetched_log(fetched: DataFrame) -> DataFrame:
    """Derive the conditional-GET cache relation from the fetched log itself
    — the cache is a VIEW, not a second table: every downloaded row is a
    cache entry whose ETag is the deterministic payload identity (table-mode
    stand-in for the server's header; the reference stores it verbatim in
    ``cacheindex.json``, lib/cache-backend-fs.js:≈L60). No extra write path,
    no extra consistency surface; compaction bounds the read set.

    ``fetch_mode="http"`` deltas carry the server's REAL ``ETag`` header in
    an ``etag`` column (operators/http_fetch.py) — stored verbatim, exactly
    like the reference's ``cacheindex.json``; rows without one (table-mode
    crawls, servers that sent no ETag) fall back to the deterministic
    identity."""
    d = fetched.where(F.col("status") == "downloaded")
    synthetic = F.md5(F.concat_ws(
        "|", "url_norm", F.coalesce(F.col("image_id"), F.lit("")),
        F.col("body_size").cast("string")))
    return d.select(
        "url_hash",
        (F.coalesce(F.col("etag"), synthetic) if "etag" in d.columns
         else synthetic).alias("etag"),
        F.col("round_fetched").cast("long").alias("last_modified"),
        F.coalesce(F.col("image_id"), F.col("url_norm")).alias("payload_ref"),
        F.col("round_fetched").cast("int").alias("round_cached"),
    )


def resolve_not_modified(outcomes: DataFrame) -> DataFrame:
    """304 rows with a cache hit keep the cached payload ref (the reference
    emits ``notmodified`` and serves ``cache.getCacheData``); without a
    cached entry the row stays ``notmodified`` with null payload — same as
    the reference's cache-miss-on-304 corner."""
    return outcomes.withColumn(
        "payload_ref",
        F.when(F.col("status") == "notmodified", F.col("cached_ref")),
    )
