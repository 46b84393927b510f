"""Public API facade mirroring the reference ``Crawler`` + ``FetchQueue``
surface (simplecrawler v1.1.9 README "Crawler options" / "Queue items").

Reference → here:
  ``new Crawler(url)`` + option props          → ``Crawler(spark, seed_urls, **options)``
  ``crawler.start()``                           → ``start()`` (runs BSP loop to fixpoint)
  ``crawler.queueURL(url, referrer, force)``    → ``queue_url(...)`` (pre-start enqueue)
  ``crawler.addFetchCondition(fn)`` → id        → ``add_fetch_condition(spec)`` → id
  ``crawler.removeFetchCondition(id)``          → ``remove_fetch_condition(id)``
  ``addDownloadCondition``/``remove...``        → same, download variants
  ``queue.max/min/avg(stat)``                   → ``queue_max/queue_min/queue_avg``
    (whitelist {actualDataSize, contentLength, downloadTime, requestLatency,
     requestTime} — "Invalid statistic" otherwise; ``lib/queue.js:≈L180–260``)
  ``queue.countItems(comparator)``              → ``count_items(dict)`` (A2)
  ``queue.getLength()``                         → ``queue_length()``
  ``queue.freeze``/``defrost``                  → snapshot manifests (automatic,
    every round); ``resume()`` = defrost + start (``lib/queue.js:≈L330–425``)

Conditions use the declarative spec from operators/admission.py — the
vectorizable analog of the reference's user callbacks (input_hint: no
per-row Python).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from simplecrawler_spark.config import CrawlConfig
from simplecrawler_spark.plans.crawl import CrawlEngine, CrawlResult

# queue.js whitelist (maps to fetched_log stateData columns — D2 telemetry
# rides on every fetched row; see corpus.py request_latency_ms et al.)
_STATS = {
    "actualDataSize": "body_size",
    "contentLength": "content_length",
    "downloadTime": "download_time_ms",
    "requestLatency": "request_latency_ms",
    "requestTime": "request_time_ms",
}


class InvalidStatisticError(ValueError):
    pass


class Crawler:
    def __init__(self, spark: SparkSession, seeds: list[str] | str,
                 corpus_dir: str | None = None, web: DataFrame | None = None,
                 images: DataFrame | None = None, robots: DataFrame | None = None,
                 **options):
        self.spark = spark
        if isinstance(seeds, str):
            seeds = [seeds]
        self.cfg = CrawlConfig(seeds=list(seeds), **options)
        if corpus_dir is not None:
            from simplecrawler_spark.corpus import read_web
            web = read_web(spark, corpus_dir)
            import os
            if os.path.isdir(f"{corpus_dir}/robots"):
                robots = spark.read.parquet(f"{corpus_dir}/robots")
            if os.path.isdir(f"{corpus_dir}/images"):
                images = spark.read.parquet(f"{corpus_dir}/images")
        self._web, self._images, self._robots = web, images, robots
        self._fetch_conditions: dict[int, dict] = {}
        self._download_conditions: dict[int, dict] = {}
        self._next_cond_id = 1
        self._extra_seeds: list[str] = []
        self._force_seeds: list[str] = []
        self.result: CrawlResult | None = None

    # --- conditions (P3/P4; crawler.js:≈L1900–2000) ---
    def add_fetch_condition(self, spec: dict) -> int:
        cid = self._next_cond_id
        self._next_cond_id += 1
        self._fetch_conditions[cid] = spec
        return cid

    def remove_fetch_condition(self, cid: int) -> None:
        if cid not in self._fetch_conditions:
            raise ValueError("no such fetch condition")  # reference throws
        del self._fetch_conditions[cid]

    def add_download_condition(self, spec: dict) -> int:
        cid = self._next_cond_id
        self._next_cond_id += 1
        self._download_conditions[cid] = spec
        return cid

    def remove_download_condition(self, cid: int) -> None:
        if cid not in self._download_conditions:
            raise ValueError("no such download condition")
        del self._download_conditions[cid]

    # --- enqueue (S1/§3.2) ---
    def queue_url(self, url: str, force: bool = False) -> None:
        """Pre-start enqueue; joins the seed admission round (force bypasses
        the seen-check, reference ``queue.add(item, force)``)."""
        (self._force_seeds if force else self._extra_seeds).append(url)

    # --- lifecycle ---
    def _engine(self) -> CrawlEngine:
        cfg = self.cfg
        # force=true (lib/queue.js:≈L90): forced URLs skip the seen-check and
        # enqueue as TRUE duplicates — a second queue entry with its own seq
        # (re-fetched), while the scan-index view (url → first seq) is
        # unchanged. Admission gates still apply, exactly like the reference
        # (queueURL gates run before queue.add).
        cfg.seeds = list(cfg.seeds) + self._extra_seeds
        cfg.force_seeds = list(cfg.force_seeds) + self._force_seeds
        return CrawlEngine(
            self.spark, cfg, self._web, self._images, self._robots,
            fetch_conditions=list(self._fetch_conditions.values()),
            download_conditions=list(self._download_conditions.values()),
        )

    def start(self) -> CrawlResult:
        self.result = self._engine().run()
        return self.result

    def resume(self) -> CrawlResult:
        self.result = self._engine().run(resume=True)
        return self.result

    # --- queue stats (A1–A3) ---
    def _fetched(self) -> DataFrame:
        assert self.result is not None, "crawl has not run"
        return self.result.fetched_log(self.spark)

    def _stat_col(self, statistic: str) -> str:
        if statistic not in _STATS:
            raise InvalidStatisticError("Invalid statistic")  # queue.js error string
        col = _STATS[statistic]
        if col is None:
            raise InvalidStatisticError(
                f"statistic {statistic!r} undefined in table-fetch mode")
        return col

    def _all_stats(self) -> dict:
        """max/min/avg for every whitelisted statistic in ONE job (the
        reference answers these from an in-memory array; three jobs per call
        would be gratuitous). Cached per crawl result."""
        assert self.result is not None, "crawl has not run"
        cached = getattr(self, "_stats_cache", None)
        if cached is not None and cached[0] is self.result:
            return cached[1]
        cols = sorted({c for c in _STATS.values()})
        row = self._fetched().agg(
            *[f(c).alias(f"{n}_{c}") for c in cols
              for n, f in (("max", F.max), ("min", F.min), ("avg", F.avg))]
        ).collect()[0].asDict()
        self._stats_cache = (self.result, row)
        return row

    def queue_max(self, statistic: str) -> float:
        return self._all_stats()[f"max_{self._stat_col(statistic)}"]

    def queue_min(self, statistic: str) -> float:
        return self._all_stats()[f"min_{self._stat_col(statistic)}"]

    def queue_avg(self, statistic: str) -> float:
        return self._all_stats()[f"avg_{self._stat_col(statistic)}"]

    def queue_length(self) -> int:
        assert self.result is not None
        m = self.result.warehouse.load_manifest(self.result.rounds)
        return int(m["queued"]) + self._fetched().count()

    @staticmethod
    def _apply_comparator(df: DataFrame, comparator: dict) -> DataFrame:
        """A2 — recursive subset-match comparator → conjunctive equality
        filter. Nested ``stateData`` fields map to top-level state columns;
        a doubly-nested dict (``{"stateData": {"headers": {"content-type":
        ...}}}``) indexes into the MapType ``headers`` column (D2;
        ``queue.js:≈L265–330`` compares into received headers the same
        way)."""
        for k, v in comparator.items():
            if isinstance(v, dict):
                for k2, v2 in v.items():
                    if isinstance(v2, dict):
                        for k3, v3 in v2.items():
                            df = df.where(F.col(k2)[k3] == v3)
                    else:
                        df = df.where(F.col(k2) == v2)
            else:
                df = df.where(F.col(k) == v)
        return df

    def count_items(self, comparator: dict) -> int:
        return self._apply_comparator(self._fetched(), comparator).count()

    def filter_items(self, comparator: dict) -> DataFrame:
        return self._apply_comparator(self._fetched(), comparator)
