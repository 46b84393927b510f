"""Crawler API facade, cookie jar semantics, fetch-cache table, streaming
wrapper state-step."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from simplecrawler_spark.api import Crawler, InvalidStatisticError
from simplecrawler_spark.corpus import CorpusParams, write_corpus
from simplecrawler_spark.functions.cookies import Cookie, CookieJar
from simplecrawler_spark.operators.cache import cache_delta_from_fetched


@pytest.fixture(scope="module")
def corpus(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("corpus_api"))
    write_corpus(spark, d, CorpusParams(n_urls=300, n_hosts=3, seed=44))
    return d


def test_crawler_facade_end_to_end(spark, corpus, tmp_path):
    c = Crawler(spark, "http://host0.example/p/0", corpus_dir=corpus,
                filter_by_domain=False, budget=64, max_rounds=100,
                dedupe_mode="exact", warehouse=str(tmp_path / "wh"))
    cid = c.add_fetch_condition({"field": "url_norm", "op": "not_contains", "value": "/p/9"})
    c.queue_url("http://host1.example/p/1")
    res = c.start()
    assert res.rounds >= 1
    assert c.queue_max("actualDataSize") >= c.queue_min("actualDataSize")
    assert c.queue_avg("contentLength") > 0
    # D2 stateData telemetry: the full queue.js statistics whitelist works
    # and matches a driver-side recomputation over the fetched log
    import math
    fetched = res.fetched_log(spark).select("request_latency_ms").toPandas()
    assert math.isclose(c.queue_avg("requestLatency"),
                        float(fetched["request_latency_ms"].mean()), rel_tol=1e-9)
    assert c.queue_max("requestTime") >= c.queue_max("requestLatency")
    assert c.queue_min("downloadTime") >= 0.0
    with pytest.raises(InvalidStatisticError):
        c.queue_max("nonsense")
    n404 = c.count_items({"status": "notfound"})
    assert n404 == res.events.get("fetch404", 0) + res.events.get("fetch410", 0)
    assert c.queue_length() >= c._fetched().count()
    assert res.events.get("fetchprevented", 0) > 0  # the condition bit
    c.remove_fetch_condition(cid)
    with pytest.raises(ValueError):
        c.remove_fetch_condition(cid)


def test_cookie_parse_match_expiry_header():
    c = Cookie.from_set_cookie(
        "sid=abc123; Domain=.Example.com; Path=/app; Max-Age=100; HttpOnly; Secure",
        "www.example.com")
    assert c.name == "sid" and c.value == "abc123"
    assert c.domain == "example.com" and c.path == "/app"
    assert c.httponly and c.secure and not c.expired()
    assert c.matches_domain("sub.example.com") and c.matches_domain("example.com")
    assert not c.matches_domain("notexample.com")
    assert c.matches_path("/app") and c.matches_path("/app/x")
    assert not c.matches_path("/application")

    jar = CookieJar()
    jar.add_from_headers(["a=1; Path=/", "b=2; Path=/x"], "h.example")
    jar.add_from_headers("a=9; Path=/", "h.example")  # replaces a=1
    assert jar.outbound_header("h.example", "/x") == "b=2; a=9"  # longer path first (RFC 6265 §5.4)
    assert jar.outbound_header("h.example", "/") == "a=9"

    expired = Cookie.from_set_cookie("old=1; Expires=Thu, 01 Jan 1970 00:00:00 GMT", "h")
    jar.add(expired)
    assert "old" not in jar.outbound_header("h", "/")

    jar2 = CookieJar.from_rows(jar.to_rows())
    assert jar2.outbound_header("h.example", "/x") == jar.outbound_header("h.example", "/x")


def test_outbound_header_series_matches_scalar():
    """Vectorized fetch-seam Cookie header ≡ scalar CookieJar.outbound_header
    on a grid of hosts/paths incl. domain suffixes, path boundaries, expiry."""
    import pandas as pd

    from simplecrawler_spark.functions.cookies import outbound_header_series

    jar = CookieJar()
    jar.add_from_headers([
        "a=1; Path=/", "b=2; Path=/x", "c=3; Domain=example.com; Path=/x/y",
        "d=4; Domain=sub.example.com", "e=5; Path=/xy",
        "old=9; Expires=Thu, 01 Jan 1970 00:00:00 GMT",
    ], "h.example")
    hosts = ["h.example", "sub.example.com", "deep.sub.example.com",
             "example.com", "notexample.com", "h.example", "h.example", ""]
    paths = ["/x", "/x/y", "/x/y/z", "/", "/x", "/xy", "/x2", None]
    got = outbound_header_series(pd.Series(hosts), pd.Series(paths), jar.cookies)
    for i, (h, p) in enumerate(zip(hosts, paths)):
        want = jar.outbound_header(h, p or "/")
        assert (got.iat[i] or "") == want, (h, p, got.iat[i], want)


def test_last_per_cookie_identity_matches_sequential_replay(spark):
    """The executor-side identity reduction (pure-JVM expressions) must yield
    a jar BIT-IDENTICAL to sequentially replaying every Set-Cookie header in
    (seq, idx) order — over a matrix of nasty headers: repeated Domain/Path
    attributes (last wins), leading dots, mixed case, attrs without '=',
    missing '=', whitespace, per-response unique values, expiry attrs."""
    from simplecrawler_spark.functions.cookies import last_per_cookie_identity

    responses = [
        ("a.example", ["sid=v1; Path=/"]),
        ("a.example", ["sid=v2; Path=/"]),                      # replaces
        ("b.example", ["sid=v3; Path=/"]),                      # other host
        ("a.example", ["t = spaced ; Domain=.A.Example ; Path=/p"]),
        ("a.example", ["t=x; domain=a.example; path=/p; HttpOnly"]),
        ("a.example", ["u=1; Domain=x.example; Domain=.Y.Example; Path=/a; Path=/b"]),
        ("c.example", ["nov", "k=v; Path"]),                    # no '=' cases
        ("a.example", ["exp=1; Expires=Thu, 01 Jan 1970 00:00:00 GMT"]),
        ("a.example", ["sid=v4; Path=/other"]),                 # distinct path
        ("b.example", ["m=1; Max-Age=100; Secure"]),
        # tab/newline whitespace: Python str.strip() strips ALL whitespace,
        # F.trim only spaces — the JVM mirror must match (tab after ';'
        # would otherwise read '\tdomain', miss the attr, and collapse this
        # d.example cookie into the host-identity group)
        ("a.example", ["tw=1;\tDomain=d.example ;\tPath=/t"]),
        ("a.example", ["\ttw2\t=x;\tHttpOnly"]),
    ] + [("d.example", [f"sess={i}; Path=/"]) for i in range(50)]
    rows = [(seq, host, idx, sc)
            for seq, (host, hdrs) in enumerate(responses)
            for idx, sc in enumerate(hdrs)]
    df = spark.createDataFrame(rows, "seq long, host string, idx int, sc string")

    seq_jar = CookieJar()
    for _, host, _, sc in rows:
        seq_jar.add_from_headers(sc, host)

    got = last_per_cookie_identity(df).collect()
    # bounded by distinct identities, never O(responses)
    assert len(got) == len(seq_jar.cookies)
    got.sort(key=lambda r: (r["o"]["seq"], r["o"]["idx"]))
    red_jar = CookieJar()
    for r in got:
        red_jar.add_from_headers(r["o"]["sc"], r["o"]["host"])
    # values AND jar order identical; `expires` from Max-Age is parse-time
    # relative (time.time()+N), so compare it approximately
    assert len(red_jar.cookies) == len(seq_jar.cookies)
    for a, b in zip(red_jar.to_rows(), seq_jar.to_rows()):
        assert a[:4] == b[:4] and a[5:] == b[5:], (a, b)
        assert (a[4] is None) == (b[4] is None)
        if a[4] is not None:
            assert abs(a[4] - b[4]) < 120.0
    # the JVM identity extraction == the Python parser's identity
    for r in got:
        c = Cookie.from_set_cookie(r["o"]["sc"], r["o"]["host"])
        assert (r["c_name"], r["c_domain"], r["c_path"]) == (
            c.name, c.domain, c.path), r["o"]["sc"]


def test_cookie_fold_collect_bounded_by_jar(spark, tmp_path):
    """Round-4 verdict scale risk #1: a server minting a UNIQUE cookie VALUE
    per response (sid=<random>) must NOT make the fold's driver collect
    O(responses) — 10^4 responses with unique values reduce to the jar-size
    row count, and the engine's fold produces the sequential-replay jar."""
    from simplecrawler_spark.functions.cookies import last_per_cookie_identity

    n = 10_000
    df = spark.createDataFrame(
        [(i, f"h{i % 3}.example", 0, f"sid=v{i}; Path=/") for i in range(n)],
        "seq long, host string, idx int, sc string")
    got = last_per_cookie_identity(df).collect()
    assert len(got) == 3  # one identity per host — the jar's size
    # and the winners are each host's LAST response
    last = {f"h{k}.example": max(i for i in range(n) if i % 3 == k)
            for k in range(3)}
    for r in got:
        assert r["o"]["seq"] == last[r["o"]["host"]]
        assert r["o"]["sc"] == f"sid=v{r['o']['seq']}; Path=/"


def test_cookie_fold_cap_drops_oldest(spark, tmp_path):
    """cookie_jar_cap: when one round sets more distinct identities than the
    cap, the fold keeps the MOST RECENTLY set ones (by seq, idx) and logs
    the drop count — exercised through the engine's in-crawl fold path."""
    import logging

    from simplecrawler_spark.config import CrawlConfig
    from simplecrawler_spark.corpus import WEB_SCHEMA
    from simplecrawler_spark.plans.crawl import CrawlEngine

    host = "h.example"
    rows = [{
        "url_id": i, "url_norm": f"http://{host}/p{i}", "host": host,
        "status_code": 200, "redirect_to": None, "content_type": "text/html",
        "links": [], "image_id": None, "caption": None,
        "robots_group": "open", "body_size": 10, "content_length": 10,
        "request_latency_ms": None, "download_time_ms": None,
        "request_time_ms": None, "failure": None, "body": None,
        "content_encoding": None, "set_cookie": [f"c{i}=v{i}; Path=/"],
    } for i in range(6)]
    web = spark.createDataFrame(rows, WEB_SCHEMA + ", set_cookie array<string>")
    cfg = CrawlConfig(seeds=[f"http://{host}/p{i}" for i in range(6)],
                      budget=6, max_rounds=3, respect_robots_txt=False,
                      accept_cookies=True, cookie_jar_cap=2,
                      dedupe_mode="exact", warehouse=str(tmp_path / "wh_cap"))
    eng = CrawlEngine(spark, cfg, web)
    records: list = []
    h = logging.Handler()
    h.emit = records.append
    logger = logging.getLogger("simplecrawler_spark.plans.crawl")
    logger.addHandler(h)
    try:
        eng.run()
    finally:
        logger.removeHandler(h)
    # all 6 fetched in ONE round (seeds, budget=6) → cap keeps the last two
    assert [c.name for c in eng.jar.cookies] == ["c4", "c5"]
    msgs = [r.getMessage() for r in records]
    assert any("cookie fold dropped 4 of 6" in m for m in msgs), msgs


def test_build_request_headers_join(spark, corpus, tmp_path):
    """Fetch-seam header construction (getRequestOptions analog): UA constant,
    Cookie from the jar, If-None-Match from the cache table, Referer from the
    discovering page, Accept-Encoding iff decompressing, Basic auth/proxy
    auth from config, customHeaders carried as a map."""
    import base64

    from simplecrawler_spark.config import CrawlConfig
    from simplecrawler_spark.operators.fetch import build_request_headers

    batch = spark.createDataFrame(
        [(1, "http://host0.example/p/0", "host0.example", None),
         (2, "http://host1.example/x/1", "host1.example", "http://host0.example/p/0")],
        "url_hash long, url_norm string, host string, referrer string")
    cache = spark.createDataFrame(
        [(1, "etag-1", 0, "ref-1", 0)],
        "url_hash long, etag string, last_modified long, payload_ref string, round_cached int")
    jar = CookieJar()
    jar.add_from_headers("sid=abc; Path=/x", "host1.example")
    cfg = CrawlConfig(user_agent="ua-test/1.0",
                      auth_user="bob", auth_pass="pw",
                      proxy_user="prx", proxy_pass="",
                      custom_headers={"X-Trace": "t1", "User-Agent": "override/2"})
    out = {r["url_hash"]: r for r in
           build_request_headers(batch, cfg, jar.to_rows(), cache).collect()}
    assert out[1]["hdr_user_agent"] == "ua-test/1.0"
    assert out[1]["hdr_if_none_match"] == "etag-1" and out[2]["hdr_if_none_match"] is None
    assert out[2]["hdr_cookie"] == "sid=abc" and out[1]["hdr_cookie"] is None
    # Referer: null for seeds, the discovering page otherwise
    assert out[1]["hdr_referer"] is None
    assert out[2]["hdr_referer"] == "http://host0.example/p/0"
    # Accept-Encoding advertised iff decompress_responses (default True)
    assert out[1]["hdr_accept_encoding"] == "gzip, deflate"
    # Basic auth is RFC 7617 base64(user:pass)
    assert out[1]["hdr_authorization"] == \
        "Basic " + base64.b64encode(b"bob:pw").decode()
    assert out[1]["hdr_proxy_authorization"] == \
        "Basic " + base64.b64encode(b"prx:").decode()
    # customHeaders ride as a map (merged last by the seam => may override UA)
    assert out[2]["hdr_custom"] == {"X-Trace": "t1", "User-Agent": "override/2"}

    # knobs off => headers absent (null), no Authorization sent
    plain = {r["url_hash"]: r for r in
             build_request_headers(batch, CrawlConfig(decompress_responses=False),
                                   None, cache).collect()}
    assert plain[1]["hdr_authorization"] is None
    assert plain[1]["hdr_proxy_authorization"] is None
    assert plain[1]["hdr_accept_encoding"] is None
    assert plain[1]["hdr_custom"] is None


def test_cache_delta_shape(spark, corpus, tmp_path):
    c = Crawler(spark, "http://host0.example/p/0", corpus_dir=corpus,
                filter_by_domain=False, budget=64, max_rounds=2,
                dedupe_mode="exact", warehouse=str(tmp_path / "whc"))
    res = c.start()
    fetched = res.fetched_log(spark)
    delta = cache_delta_from_fetched(fetched, res.rounds)
    rows = delta.collect()
    assert len(rows) == fetched.where(F.col("status") == "downloaded").count()
    assert all(r["etag"] and r["payload_ref"] for r in rows)


def test_headers_column_and_nested_count_items(spark, corpus, tmp_path):
    """D2 `stateData.headers` as a MapType column + countItems indexing into
    it (queue.js:≈L265–330): the count through the comparator must equal a
    direct recomputation over the fetched log, and the map must carry the
    response's content-type/content-length (and location on redirects)."""
    c = Crawler(spark, "http://host0.example/p/0", corpus_dir=corpus,
                filter_by_domain=False, budget=64, max_rounds=100,
                dedupe_mode="exact", warehouse=str(tmp_path / "wh_hdr"))
    res = c.start()
    log = res.fetched_log(spark)

    # headers present exactly when a response arrived (no transport failure)
    rows = log.select("status", "failure", "content_type", "content_length",
                      "headers").collect()
    want = 0
    for r in rows:
        h = r["headers"]
        if r["failure"] is not None:
            assert h is None
            continue
        if h is None:
            continue
        if r["content_type"] is not None:
            assert h.get("content-type") == r["content_type"]
        if r["content_length"] is not None:
            assert h.get("content-length") == str(r["content_length"])
        if r["status"] == "redirected":
            assert h.get("location")  # Location header rode into the map
        if h.get("content-type") == "text/html":
            want += 1

    got = c.count_items({"stateData": {"headers": {"content-type": "text/html"}}})
    assert got == want and want > 0
    # fetchstart == total attempts; fetchheaders == responses that arrived
    assert res.events["fetchstart"] == log.count()
    n_resp = sum(1 for r in rows if r["headers"] is not None)
    assert res.events["fetchheaders"] == n_resp
