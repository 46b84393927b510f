"""W1/W2 — round scheduling: FIFO batch selection + per-host politeness with
skew-safe top-k, and the deterministic global ``seq`` assignment rule
(SURVEY.md Appendix C) that makes crawl order a pure function of the data.

Reference: ``oldestUnfetchedItem`` (``lib/queue.js:≈L150–175``) — insertion
order consumed FIFO, one spool per 250 ms tick, ≤ ``maxConcurrency`` in
flight (``lib/crawler.js:≈L660, ≈L1705``). BSP equivalence: round R fetches
the B lowest-``seq`` queued items; new admissions get ``seq`` in
(parent_seq, link_idx) lexicographic order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


_NO_CAP = 1 << 30  # effectively unlimited per-host cap


def select_batch(remaining: DataFrame, budget: int, host_budget: int = 0,
                 hot_host_threshold: int = 100_000, n_salts: int = 8,
                 host_caps: DataFrame | None = None) -> DataFrame:
    """Pick this round's fetch batch.

    * Global FIFO (reference parity, ``host_budget=0``): lowest-B ``seq`` —
      ``orderBy(seq).limit(B)`` compiles to TakeOrderedAndProject (per-
      partition heap + driver merge, no full sort, no shuffle).
    * Per-host politeness (north_rule): two-stage skew-safe top-k — stage 1
      ranks within (host, salt) so one hot host's rows split across
      ``n_salts`` tasks instead of one giant window partition, keeping at
      most the per-host cap per salt; stage 2 ranks the survivors (≤
      n_salts × cap per host) exactly. Then global FIFO limit.
    * ``host_caps`` (host, cap): robots Crawl-delay budgets (J6) — a small
      relation broadcast onto the frontier; the effective per-host cap is
      ``least(host_budget, cap)`` with absent values unlimited. Stays fully
      distributed — no driver-side host list at any scale.
    """
    if host_budget <= 0 and host_caps is None:
        return remaining.orderBy("seq").limit(budget)
    hb = F.lit(host_budget if host_budget > 0 else _NO_CAP)
    if host_caps is not None:
        remaining = remaining.join(F.broadcast(host_caps), "host", "left")
        cap = F.least(hb, F.coalesce(F.col("cap"), F.lit(_NO_CAP)))
    else:
        cap = hb
    salted = remaining.withColumn(
        "_salt", F.pmod(F.xxhash64("url_hash"), F.lit(n_salts)).cast("int")
    )
    w1 = Window.partitionBy("host", "_salt").orderBy("seq")
    stage1 = salted.withColumn("_r1", F.row_number().over(w1)).where(
        F.col("_r1") <= cap
    )
    w2 = Window.partitionBy("host").orderBy("seq")
    stage2 = stage1.withColumn("_r2", F.row_number().over(w2)).where(
        F.col("_r2") <= cap
    )
    out = stage2.drop("_salt", "_r1", "_r2")
    if host_caps is not None:
        out = out.drop("cap")
    return out.orderBy("seq").limit(budget)


def assign_seq(cands: DataFrame, next_seq: int, n_parts: int = 32,
               bounds: tuple[int, int] | None = None) -> tuple[DataFrame, int]:
    """Deterministic global ``seq`` for admitted candidates, ordered by
    (parent_seq, link_idx) — Appendix C rule. Returns (df, n_assigned).

    Scale path (no single global window): candidates are bucketed into
    deterministic ``parent_seq`` ranges (NOT sampled range partitioning —
    task retries must reproduce bit-identical buckets); one count pass per
    bucket yields prefix offsets (this collect doubles as the round's
    terminal action, materializing the persisted upstream); then
    ``seq = next_seq + bucket_offset + row_number() - 1`` via a per-bucket
    window — pure JVM whole-stage work, no Python stage (the round-2
    profile showed the old applyInPandas numbering pass costing ~5 s of
    per-round serial floor at 8 cores). All determinism comes from the data
    ((parent_seq, link_idx) is unique per candidate), never from row
    arrival order.

    ``bounds`` = (min_parent_seq, max_parent_seq) if the caller already knows
    them (the crawl loop does: candidates' parents are the fetch batch) —
    passing them saves one aggregation job per round.
    """
    if bounds is None:
        stats = cands.agg(
            F.min("parent_seq").alias("lo"), F.max("parent_seq").alias("hi"),
        ).collect()[0]
        if stats["lo"] is None:
            return cands.withColumn("seq", F.lit(0).cast("long")).limit(0), 0
        bounds = (int(stats["lo"]), int(stats["hi"]))
    lo, hi = bounds
    span = max(hi - lo + 1, 1)
    nb = min(n_parts, span)
    b = cands.withColumn(
        "_bkt",
        (((F.col("parent_seq") - F.lit(lo)) * nb) / F.lit(span)).cast("int"),
    )
    counts = {
        r["_bkt"]: r["cnt"]
        for r in b.groupBy("_bkt").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    if not counts:
        return b.drop("_bkt").withColumn("seq", F.lit(0).cast("long")).limit(0), 0
    offsets: dict[int, int] = {}
    acc = 0
    for k in sorted(counts):
        offsets[k] = acc
        acc += counts[k]

    # bucket offset as a literal CASE chain (≤ n_parts arms — config scale);
    # rank via a per-bucket window: shuffle by _bkt + in-partition sort, all
    # inside whole-stage codegen
    off = F.lit(0)
    for k, v in offsets.items():
        off = F.when(F.col("_bkt") == k, F.lit(v)).otherwise(off)
    w = Window.partitionBy("_bkt").orderBy("parent_seq", "link_idx")
    numbered = b.withColumn(
        "seq",
        (F.lit(next_seq) + off + F.row_number().over(w) - 1).cast("long"),
    ).drop("_bkt")
    return numbered, acc
