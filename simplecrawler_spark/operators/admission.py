"""Admission pipeline — F4 protocol, P1 domain, P2 robots, P5 depth, P3
fetch conditions, evaluated in the reference's order (A.2: protocol →
domain → robots → conditions; dedupe last, in operators/dedupe.py).

Reference: ``queueURL`` (``lib/crawler.js:≈L950–1000``) calling
``protocolSupported`` (≈L700), ``domainValid`` (≈L1000–1060),
``urlIsAllowed`` (≈L1060), fetch-condition evaluation via ``async``.

Everything is a Column expression except robots matching (P2), which is a
bucket-free pandas batch UDF over the broadcast-joined per-host rule arrays.
The first failing gate is recorded in a ``reject`` column → event counters
(Appendix B: invaliddomain / fetchdisallowed / fetchprevented) come from one
aggregation over the same DataFrame — a single pass, no per-gate jobs.

Conditions (P3/P4) use a declarative spec so the Spark engine and the
Python oracle evaluate *the same* predicate: a list of
``{"field": <col>, "op": <op>, "value": v}`` with op ∈ {contains,
not_contains, eq, ne, lt, le, gt, ge, matches} — the analog of the
reference's user callbacks, restricted to data-expressible form (per
input_hint: no per-row Python).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import BooleanType

from simplecrawler_spark.config import CrawlConfig
from simplecrawler_spark.functions.robots import robots_allows_batch


def seed_host_set(seed_hosts: list[str], cfg: CrawlConfig) -> list[str]:
    hosts = list(seed_hosts)
    if cfg.ignore_www_domain:
        hosts = [h[4:] if h.startswith("www.") else h for h in hosts]
    return sorted(set(hosts))


def domain_valid_col(host: F.col, cfg: CrawlConfig, seed_hosts: list[str]):
    """P1 — domainValid as a pure Column expression."""
    if not cfg.filter_by_domain:
        return F.lit(True)
    hosts = seed_host_set(seed_hosts, cfg)
    h = F.regexp_replace(host, r"^www\.", "") if cfg.ignore_www_domain else host
    ok = h.isin(hosts)
    for w in cfg.domain_whitelist:
        ok = ok | (h == w.lower())
    if cfg.scan_subdomains:
        for s in hosts:
            ok = ok | h.endswith("." + s)
    return ok


def protocol_col(url: F.col, cfg: CrawlConfig):
    """F4 — scheme ∈ allowedProtocols (regex list, reference default
    ``[/^http(s)?$/i]``)."""
    scheme = F.lower(F.split(url, "://", 2).getItem(0))
    ok = F.lit(False)
    for pat in cfg.allowed_protocols:
        ok = ok | scheme.rlike(pat)
    return ok


def condition_col(df_cols, spec: list[dict]):
    """P3/P4 — declarative condition list → conjunctive Column."""
    ok = F.lit(True)
    for c in spec:
        col = F.col(c["field"])
        op, v = c["op"], c.get("value")
        if op == "contains":
            term = col.contains(v)
        elif op == "not_contains":
            term = ~col.contains(v)
        elif op == "eq":
            term = col == v
        elif op == "ne":
            term = col != v
        elif op == "lt":
            term = col < v
        elif op == "le":
            term = col <= v
        elif op == "gt":
            term = col > v
        elif op == "ge":
            term = col >= v
        elif op == "matches":
            term = col.rlike(v)
        else:
            raise ValueError(f"unknown condition op {op!r}")
        ok = ok & term
    return ok


def eval_condition_py(item: dict, spec: list[dict]) -> bool:
    """Oracle-side evaluation of the same spec (shared semantics)."""
    import re as _re

    for c in spec:
        x, op, v = item.get(c["field"]), c["op"], c.get("value")
        if x is None:
            return False
        if op == "contains" and v not in x:
            return False
        if op == "not_contains" and v in x:
            return False
        if op == "eq" and not x == v:
            return False
        if op == "ne" and not x != v:
            return False
        if op == "lt" and not x < v:
            return False
        if op == "le" and not x <= v:
            return False
        if op == "gt" and not x > v:
            return False
        if op == "ge" and not x >= v:
            return False
        if op == "matches" and not _re.search(v, x):
            return False
    return True


def sanitize_robots_rules(robots: DataFrame) -> DataFrame:
    """Drop null ELEMENTS from the disallow/allow rule arrays. The pure-JVM
    gate would silently skip them (``startswith(null)`` → null → filtered
    out) while the pandas path raises, and ``F.exists``'s ternary-null logic
    would let :func:`robots_rules_simple` classify such rulesets as simple —
    sanitizing once at the relation boundary makes every evaluation path see
    identical rule arrays (malformed corpus rows degrade identically instead
    of diverging)."""
    keep = lambda c: F.when(  # noqa: E731
        F.col(c).isNotNull(), F.filter(F.col(c), lambda r: r.isNotNull()))
    out = robots
    for c in ("disallow", "allow"):
        if c in robots.columns:
            out = out.withColumn(c, keep(c))
    return out


def robots_rules_simple(robots: DataFrame | None) -> bool:
    """True iff no rule in the relation uses ``*``/``$`` — i.e. every rule
    is a plain path prefix and longest-match is expressible with JVM
    built-ins. One tiny job over the (broadcast-sized) rules relation;
    the engine caches the answer per robots load."""
    if robots is None:
        return True
    robots = sanitize_robots_rules(robots)
    wild = (lambda c: F.exists(
        F.coalesce(F.col(c), F.array().cast("array<string>")),
        lambda r: r.contains("*") | r.contains("$")))
    row = robots.select(
        F.max(F.when(wild("disallow") | wild("allow"), 1).otherwise(0)).alias("w")
    ).collect()
    return not row or row[0]["w"] != 1


def robots_allowed_col(cands: DataFrame, robots: DataFrame, cfg: CrawlConfig,
                       rules_simple: bool = False) -> DataFrame:
    """P2 — broadcast-join per-host rules, longest-match evaluation.
    Adds a boolean ``robots_ok`` column. Hosts absent from the robots table
    are allowed (reference: no robots.txt → allow).

    Two evaluation paths, same pinned semantics (robots_allows):

    * ``rules_simple=True`` (caller proved no rule contains ``*``/``$`` —
      :func:`robots_rules_simple`): pure-JVM whole-stage-codegen expression
      — a matching rule is a ``startswith`` prefix and its specificity is
      its length, so RFC 9309 longest-match folds into two
      ``aggregate(filter(...))`` calls. No Python stage, no Arrow transfer
      of the per-row rule arrays — this gate runs over EVERY discovered
      candidate each round (the engine's widest row stream).
    * otherwise: the vectorized pandas UDF (per-rule × per-host-group regex
      passes) that handles wildcard rules.
    """
    if not cfg.respect_robots_txt or robots is None:
        return cands.withColumn("robots_ok", F.lit(True))
    joined = cands.join(F.broadcast(sanitize_robots_rules(robots)), "host", "left")
    path = F.regexp_replace(joined.url_norm, r"^https?://[^/]+", "")
    if rules_simple:
        empty = F.array().cast("array<string>")
        dis = F.coalesce(F.col("disallow"), empty)
        alw = F.coalesce(F.col("allow"), empty)
        best = lambda arr: F.aggregate(  # noqa: E731
            F.filter(arr, lambda r: path.startswith(r)),
            F.lit(-1), lambda acc, r: F.greatest(acc, F.length(r)))
        # allow wins ties; no matching rule (-1 vs -1) → allowed
        ok = best(alw) >= best(dis)
        return joined.withColumn("robots_ok", ok).drop(
            "disallow", "allow", "crawl_delay")

    @F.pandas_udf(BooleanType())
    def allowed(path: pd.Series, host: pd.Series, disallow: pd.Series, allow: pd.Series) -> pd.Series:
        return robots_allows_batch(path, host, disallow, allow)

    return (
        joined.withColumn("robots_ok", allowed(path, F.col("host"), F.col("disallow"), F.col("allow")))
        .drop("disallow", "allow", "crawl_delay")
    )


def admit(cands: DataFrame, robots: DataFrame, cfg: CrawlConfig, seed_hosts: list[str],
          fetch_conditions: list[dict] | None = None,
          robots_simple: bool = False) -> DataFrame:
    """Gate in A.2 order; adds ``reject`` = first failing gate (null = pass).

    Expected candidate columns: url_norm, host, depth (already canonical).
    ``robots_simple``: caller-proved "no wildcard rules" flag
    (:func:`robots_rules_simple`) enabling the pure-JVM robots gate.
    """
    df = robots_allowed_col(cands, robots, cfg, rules_simple=robots_simple)
    depth_ok = (
        F.lit(True)
        if cfg.max_depth <= 0
        else (F.col("depth") <= cfg.max_depth)
    )
    allow = cfg.fetch_whitelisted_mime_below_max_depth
    if cfg.max_depth > 0 and allow:
        # P5 allowance (depthAllowed, crawler.js:≈L980–1000): URLs whose
        # extension implies a whitelisted MIME may exceed maxDepth — without
        # bound (True) or by at most `allow` extra levels (int)
        from simplecrawler_spark.functions.mime import EXT_MIME, EXT_PATTERN

        ext = F.lower(F.regexp_extract(F.col("url_norm"), EXT_PATTERN, 1))
        pairs = [x for kv in EXT_MIME.items() for x in kv]
        mime_guess = F.element_at(F.create_map(*[F.lit(x) for x in pairs]), ext)
        guessed_ok = F.lit(False)
        for pat in cfg.supported_mime_types:
            guessed_ok = guessed_ok | mime_guess.rlike(pat)
        within = (F.lit(True) if allow is True
                  else F.col("depth") <= cfg.max_depth + int(allow))
        depth_ok = depth_ok | (mime_guess.isNotNull() & guessed_ok & within)
    cond_ok = condition_col(df.columns, fetch_conditions or [])
    return df.withColumn(
        "reject",
        F.when(~protocol_col(F.col("url_norm"), cfg), F.lit("protocol"))
        .when(~domain_valid_col(F.col("host"), cfg, seed_hosts), F.lit("invaliddomain"))
        .when(~F.col("robots_ok"), F.lit("fetchdisallowed"))
        .when(~depth_ok, F.lit("depth"))
        .when(~cond_ok, F.lit("fetchprevented"))
        .otherwise(F.lit(None)),
    ).drop("robots_ok")
