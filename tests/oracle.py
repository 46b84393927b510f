"""Single-threaded reference simulator (SURVEY.md §5.2 item 1).

Plays the role of simplecrawler-under-its-test-server: a direct, sequential
implementation of the reference semantics (FIFO queue + ``_scanIndex`` dict,
``lib/queue.js``; admission pipeline and response handling,
``lib/crawler.js``) over the same corpus tables, with BSP tick-batches per
SURVEY.md Appendix C. The Spark engine must match it row-for-row on
(crawl order, URL-seen set, per-item status, event counters).

Deliberately shares the *pure functions* (canonicalizer, link cleanup,
robots matcher, condition spec evaluator) with the engine — parity of those
is by construction; what this file independently re-implements is the
*orchestration*: ordering, batching, state machine, dedupe.
"""

from __future__ import annotations

import re
from collections import Counter
from dataclasses import dataclass, field

from simplecrawler_spark.config import CrawlConfig
from simplecrawler_spark.functions.canonicalize import canonicalize_one, split_host
from simplecrawler_spark.functions.cookies import CookieJar
from simplecrawler_spark.functions.links import _clean_raw
from simplecrawler_spark.functions.mime import guess_mime
from simplecrawler_spark.functions.robots import robots_allows
from simplecrawler_spark.operators.admission import eval_condition_py, seed_host_set


@dataclass
class OracleResult:
    fetched_log: list = field(default_factory=list)  # (round, seq, url, depth, status)
    seen: dict = field(default_factory=dict)         # url -> seq
    events: Counter = field(default_factory=Counter)
    rounds: int = 0
    cookie_hdrs: dict = field(default_factory=dict)  # seq -> outbound Cookie header|None
    jar: CookieJar | None = None                     # final jar state (cookies_on only)


class OracleCrawler:
    def __init__(self, web_rows: list[dict], robots_rows: list[dict], cfg: CrawlConfig,
                 fetch_conditions=None, download_conditions=None):
        self.web = {r["url_norm"]: r for r in web_rows}
        self.robots = {r["host"]: (list(r["disallow"] or []), list(r["allow"] or []))
                       for r in robots_rows or []}
        self.cfg = cfg
        # J6 — robots Crawl-delay → per-host per-round cap (same rule as
        # CrawlEngine._host_caps)
        self.host_caps: dict[str, int] = {}
        if cfg.honor_crawl_delay:
            for r in robots_rows or []:
                cd = r.get("crawl_delay")
                if cd is not None:
                    self.host_caps[r["host"]] = max(1, int(cfg.round_seconds // cd))
        self.fc = fetch_conditions or []
        self.dc = download_conditions or []
        self.queue: list[dict] = []      # items, index == seq
        self.seen: dict[str, int] = {}
        self.events: Counter = Counter()
        self.seed_hosts: list[str] = []
        # S6/J3 conditional-GET cache: url -> (etag, payload_ref); mirrors
        # operators/cache.cache_from_fetched_log's ETag formula
        self.cache: dict[str, tuple[str, str]] = {}
        # D8 acceptCookies: responses' Set-Cookie headers accumulate in the
        # jar at END of round (BSP — a round's requests all start before any
        # response lands, same deferral as round_cache); active iff the knob
        # is on AND the corpus carries the column (mirrors CrawlEngine)
        self.jar = CookieJar()
        self.cookies_on = bool(cfg.accept_cookies) and any(
            "set_cookie" in r for r in web_rows)

    # --- shared-semantics helpers ---
    def _canon(self, raw, base):
        return canonicalize_one(
            raw, base,
            strip_querystring=self.cfg.strip_querystring,
            sort_query_parameters=self.cfg.sort_query_parameters,
            strip_www_domain=self.cfg.strip_www_domain)

    def _protocol_ok(self, url: str) -> bool:
        scheme = url.split("://", 1)[0].lower()
        return any(re.search(p, scheme) for p in self.cfg.allowed_protocols)

    def _domain_ok(self, host: str) -> bool:
        cfg = self.cfg
        if not cfg.filter_by_domain:
            return True
        hosts = seed_host_set(self.seed_hosts, cfg)
        h = host[4:] if cfg.ignore_www_domain and host.startswith("www.") else host
        if h in hosts or h in [w.lower() for w in cfg.domain_whitelist]:
            return True
        if cfg.scan_subdomains and any(h.endswith("." + s) for s in hosts):
            return True
        return False

    def _robots_ok(self, url: str, host: str) -> bool:
        if not self.cfg.respect_robots_txt or host not in self.robots:
            return True
        path = re.sub(r"^https?://[^/]+", "", url)
        d, a = self.robots[host]
        return robots_allows(path, d, a)

    def _mime_supported(self, ct) -> bool:
        return ct is not None and any(re.search(p, ct) for p in self.cfg.supported_mime_types)

    # --- admission (A.2 order), one candidate ---
    def _admit(self, url: str, depth: int, referrer, rnd: int,
               force: bool = False) -> None:
        host = split_host(url)
        if not self._protocol_ok(url):
            self.events["protocol"] += 1
            return
        if not self._domain_ok(host):
            self.events["invaliddomain"] += 1
            return
        if not self._robots_ok(url, host):
            self.events["fetchdisallowed"] += 1
            return
        if self.cfg.max_depth > 0 and depth > self.cfg.max_depth:
            allow = self.cfg.fetch_whitelisted_mime_below_max_depth
            mg = guess_mime(url) if allow else None
            allowed_past = (
                mg is not None
                and any(re.search(p, mg) for p in self.cfg.supported_mime_types)
                and (allow is True or depth <= self.cfg.max_depth + int(allow))
            )
            if not allowed_past:
                self.events["depth"] += 1
                return
        item = {"url_norm": url, "host": host, "depth": depth, "referrer": referrer}
        if self.fc and not eval_condition_py(item, self.fc):
            self.events["fetchprevented"] += 1
            return
        if url in self.seen and not force:
            self.events["queueduplicate"] += 1
            return
        # force=true (queue.js:≈L90): skip the scan-index check, enqueue a
        # true duplicate; the index keeps the FIRST seq for the URL
        seq = len(self.queue)
        self.seen.setdefault(url, seq)
        self.queue.append({**item, "seq": seq, "status": "queued", "round_queued": rnd})
        self.events["queueadd"] += 1

    # --- fetch outcome (mirrors operators/fetch.classify order exactly) ---
    @staticmethod
    def _etag(row: dict) -> str:
        import hashlib
        s = f"{row['url_norm']}|{row.get('image_id') or ''}|{row['body_size']}"
        return hashlib.md5(s.encode()).hexdigest()

    def _classify(self, item: dict):
        row = self.web.get(item["url_norm"])
        if row is None:
            return "failed", "fetcherror", None
        # transport failures precede any response attribute (classify order)
        if row.get("failure") == "timeout":
            return "failed", "fetchtimeout", row
        if row.get("failure") == "clienterror":
            return "failed", "fetchclienterror", row
        code = row["status_code"]
        if code == 304:
            return "notmodified", "notmodified", row
        if (self.cfg.use_cache and 200 <= code <= 299
                and item["url_norm"] in self.cache
                and self.cache[item["url_norm"]][0] == self._etag(row)):
            # If-None-Match matched the current payload identity → the
            # server answers 304 (crawler.js:≈L1160–1200)
            return "notmodified", "notmodified", row
        if 300 <= code <= 399 and row.get("redirect_to"):
            return "redirected", "fetchredirect", row
        if code in (404, 410):
            return "notfound", "fetch410" if code == 410 else "fetch404", row
        if not 200 <= code <= 299:
            return "failed", "fetcherror", row
        # header check precedes the streamed-size abort (crawler.js:≈L1470)
        cl = row.get("content_length")
        if cl is not None and cl > self.cfg.max_resource_size:
            return "dataerror", "fetchdataerror", row
        if row["body_size"] is not None and row["body_size"] > self.cfg.max_resource_size:
            return "dataerror", "fetchdataerror", row
        if self.dc and not eval_condition_py({**item, **{k: row[k] for k in
                ("content_type", "body_size", "status_code")}}, self.dc):
            return "downloadprevented", "downloadprevented", row
        if not self._mime_supported(row["content_type"]) and not self.cfg.download_unsupported:
            return "downloadprevented", "downloadprevented", row
        return "downloaded", "fetchcomplete", row

    def run(self) -> OracleResult:
        cfg = self.cfg
        seeds = [u for u in (self._canon(s, None) for s in cfg.seeds) if u is not None]
        forced = [u for u in (self._canon(s, None) for s in cfg.force_seeds)
                  if u is not None]
        self.seed_hosts = [split_host(u) for u in seeds + forced]
        self.events["crawlstart"] += 1
        for u in seeds:
            self._admit(u, 1, None, 0)
        for u in forced:
            self._admit(u, 1, None, 0, force=True)
        res = OracleResult()
        rnd = 0
        while rnd < cfg.max_rounds:
            rnd += 1
            remaining = [it for it in self.queue if it["status"] == "queued"]
            if cfg.host_budget > 0 or self.host_caps:
                no_cap = 1 << 30
                hb = cfg.host_budget if cfg.host_budget > 0 else no_cap
                rank: Counter = Counter()
                batch = []
                for it in remaining:  # queue order == seq order
                    rank[it["host"]] += 1
                    if rank[it["host"]] <= min(hb, self.host_caps.get(it["host"], no_cap)):
                        batch.append(it)
                batch = batch[: cfg.budget]
            else:
                batch = remaining[: cfg.budget]
            if not batch:
                rnd -= 1
                break
            candidates = []  # (parent_seq, link_idx, url, depth, referrer)
            round_cache: list[tuple[str, tuple[str, str]]] = []
            round_cookies: list[tuple[str, list]] = []
            for it in batch:
                if self.cookies_on:
                    # outbound Cookie header from the jar as of round start
                    # (getRequestOptions → getAsHeader, crawler.js:≈L1140)
                    path = re.sub(r"^[a-z]+://[^/]+", "", it["url_norm"]) or "/"
                    res.cookie_hdrs[it["seq"]] = (
                        self.jar.outbound_header(it["host"], path) or None)
                status, event, row = self._classify(it)
                it["status"] = status
                # lifecycle events: fetchstart per attempt; fetchheaders once
                # the response headers arrive (request completed — no
                # transport failure; crawler.js:≈L1240, ≈L1330)
                self.events["fetchstart"] += 1
                if row is not None and not row.get("failure"):
                    self.events["fetchheaders"] += 1
                    if self.cookies_on and row.get("set_cookie"):
                        # any completed response contributes its Set-Cookie
                        # headers (cookies.addFromHeaders, crawler.js:≈L1350)
                        round_cookies.append((it["host"], row["set_cookie"]))
                self.events[event] += 1
                if self.cfg.use_cache and status == "downloaded":
                    # deferred to end-of-round: the engine's cache view reads
                    # fetched rounds ≤ R-1, so a same-round duplicate fetch
                    # must NOT see this round's entries
                    round_cache.append((it["url_norm"], (
                        self._etag(row), row.get("image_id") or it["url_norm"])))
                res.fetched_log.append((rnd, it["seq"], it["url_norm"], it["depth"], status))
                if status == "redirected":
                    u = self._canon(row["redirect_to"], it["url_norm"])
                    if (cfg.allow_initial_domain_change and cfg.filter_by_domain
                            and rnd == 1 and it["seq"] == 0 and u is not None):
                        # allowInitialDomainChange: the initial URL's redirect
                        # moves the crawl domain (crawler.js:≈L1000–1060)
                        nh = split_host(u)
                        if nh and self.seed_hosts and nh != self.seed_hosts[0]:
                            self.seed_hosts = [nh] + self.seed_hosts[1:]
                    if u is not None:
                        candidates.append((it["seq"], 0, u, it["depth"] + 1, it["url_norm"]))
                elif status == "downloaded" and self._mime_supported(row["content_type"]):
                    self.events["discoverycomplete"] += 1
                    if self.cfg.discovery_mode == "html":
                        # F7→F6→F2 over the raw body — mirrors the engine's
                        # _discover_udf (and the reference response pipeline)
                        from simplecrawler_spark.functions.body import (
                            decode_one, decompress_one)
                        from simplecrawler_spark.functions.links import discover_resources
                        body, ok = decompress_one(row.get("body"),
                                                  row.get("content_encoding"))
                        if not ok:
                            self.events["gziperror"] += 1
                        text = decode_one(body, row["content_type"])
                        raw_links = discover_resources(text) if text else []
                    else:
                        raw_links = row["links"] or []
                    page_seen: set[str] = set()
                    idx = 0
                    for raw in raw_links:
                        cleaned = _clean_raw(raw) if raw is not None else None
                        if cleaned is None:
                            continue
                        u = self._canon(cleaned, it["url_norm"])
                        if u is None or u in page_seen:
                            continue
                        page_seen.add(u)
                        idx += 1
                        candidates.append((it["seq"], idx, u, it["depth"] + 1, it["url_norm"]))
            candidates.sort(key=lambda c: (c[0], c[1]))
            for _, _, url, depth, ref in candidates:
                self._admit(url, depth, ref, rnd)
            for url, entry in round_cache:
                self.cache[url] = entry
            for host, scs in round_cookies:
                self.jar.add_from_headers(list(scs), host)
        if not any(it["status"] == "queued" for it in self.queue):
            self.events["complete"] += 1  # fixpoint reached (frontier drained)
        res.seen = dict(self.seen)
        res.events = self.events
        res.rounds = rnd
        if self.cookies_on:
            res.jar = self.jar
        return res
