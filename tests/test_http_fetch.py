"""S2 real-network fetch seam (``fetch_mode="http"``) against a loopback
HTTP server — as much network as this sandbox has.

Two layers:

* unit: one batch through ``build_request_headers`` → ``http_fetch`` →
  ``classify``, pinning the full outcome matrix (downloaded, redirect not
  followed, 404/410, oversize header pre-check, streamed-size abort,
  timeout, clienterror, real If-None-Match → 304) and the outbound header
  contract (UA, custom override, Basic auth, Referer, Accept-Encoding);
* end-to-end: the SAME site crawled in ``fetch_mode="http"`` (real GETs,
  lazy robots.txt over HTTP, Set-Cookie folding) and in table mode over a
  corpus mirroring the server byte-for-byte — fetched log, crawl order,
  url_seen, outbound Cookie headers and event counters must be identical.
  Reference behaviors exercised: fetchQueueItem/handleResponse
  (crawler.js:≈L1230–1700), getRobotsTxt (≈L1080), cookies.addFromHeaders
  (≈L1350), redirect re-entry (≈L1390–1430).
"""

from __future__ import annotations

import gzip
import http.server
import threading

import pytest

from pyspark.sql import functions as F

from simplecrawler_spark.config import CrawlConfig
from simplecrawler_spark.functions.canonicalize import canonicalize_one
from simplecrawler_spark.operators.fetch import build_request_headers, classify
from simplecrawler_spark.operators.http_fetch import http_fetch
from simplecrawler_spark.plans.crawl import CrawlEngine


class _Handler(http.server.BaseHTTPRequestHandler):
    protocol_version = "HTTP/1.1"
    spec: dict = {}
    log: list = []
    lock = threading.Lock()

    def log_message(self, *a):  # quiet
        pass

    def do_GET(self):
        with self.lock:
            self.log.append((self.path, dict(self.headers.items())))
        s = self.spec.get(self.path)
        if s is None:
            body = b"not found"
            self.send_response(404)
            self.send_header("Content-Type", "text/plain")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
            return
        if s.get("sleep"):
            import time
            time.sleep(s["sleep"])
        etag = s.get("etag")
        if etag and self.headers.get("If-None-Match") == etag:
            self.send_response(304)
            self.send_header("Content-Length", "0")
            self.end_headers()
            return
        body = s.get("body", b"")
        self.send_response(s.get("status", 200))
        if s.get("ctype"):
            self.send_header("Content-Type", s["ctype"])
        if s.get("location"):
            self.send_header("Location", s["location"])
        if s.get("encoding"):
            self.send_header("Content-Encoding", s["encoding"])
        if etag:
            self.send_header("ETag", etag)
        for sc in s.get("set_cookie", []):
            self.send_header("Set-Cookie", sc)
        if s.get("lie_length") is not None:
            self.send_header("Content-Length", str(s["lie_length"]))
            self.end_headers()
            self.wfile.write(body)
        elif s.get("no_length"):
            # no Content-Length, close-delimited body (HTTP/1.0 style):
            # the client must stream-count (P6 streamed-size abort)
            self.send_header("Connection", "close")
            self.end_headers()
            self.wfile.write(body)
            self.close_connection = True
        else:
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            if body:
                self.wfile.write(body)


def _serve(spec: dict):
    handler = type("H", (_Handler,), {"spec": spec, "log": [],
                                      "lock": threading.Lock()})
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return srv, handler, f"127.0.0.1:{srv.server_address[1]}"


@pytest.fixture(scope="module")
def tls_cert(tmp_path_factory):
    """Self-signed localhost cert (CN=localhost, SAN DNS:localhost +
    IP:127.0.0.1) — the reference's own test server runs HTTPS on :3001 with
    exactly such a cert to exercise ``ignoreInvalidSSL`` (SURVEY §5.1
    testserver.js). Returns (certfile, keyfile); the cert doubles as its own
    trust anchor for the ``ssl_ca_file`` "valid" leg of the parity matrix."""
    import subprocess

    d = tmp_path_factory.mktemp("tls")
    cert, key = str(d / "cert.pem"), str(d / "key.pem")
    subprocess.run(
        ["openssl", "req", "-x509", "-newkey", "rsa:2048", "-keyout", key,
         "-out", cert, "-days", "3650", "-nodes", "-subj", "/CN=localhost",
         "-addext", "subjectAltName=DNS:localhost,IP:127.0.0.1"],
        check=True, capture_output=True)
    return cert, key


def _serve_tls(spec: dict, certfile: str, keyfile: str):
    """Loopback HTTPS server (testserver.js :3001 analog)."""
    import ssl

    handler = type("H", (_Handler,), {"spec": spec, "log": [],
                                      "lock": threading.Lock()})
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), handler)
    ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_SERVER)
    ctx.load_cert_chain(certfile, keyfile)
    srv.socket = ctx.wrap_socket(srv.socket, server_side=True)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return srv, handler, f"127.0.0.1:{srv.server_address[1]}"


def _batch(spark, urls):
    rows = [(i, u, i + 1000, u.split("://")[1].split("/")[0], 0, None)
            for i, u in enumerate(urls)]
    return spark.createDataFrame(
        rows, "seq long, url_norm string, url_hash long, host string, "
              "depth int, referrer string")


HTML = b"<html><body><a href='/a'>a</a></body></html>"


def test_http_fetch_outcome_matrix(spark):
    spec = {
        "/ok": dict(body=HTML, ctype="text/html; charset=utf-8",
                    etag='"v1"', set_cookie=["sid=s1; Path=/"]),
        "/redir": dict(status=302, location="/target", body=b"",
                       ctype="text/plain"),
        "/gone": dict(status=410, body=b"", ctype="text/plain"),
        "/big": dict(body=b"x", ctype="text/plain", lie_length=10_000_000),
        "/huge": dict(body=b"y" * 5000, ctype="text/plain", no_length=True),
        "/slow": dict(body=b"z", ctype="text/plain", sleep=2.0),
    }
    srv, handler, host = _serve(spec)
    try:
        cfg = CrawlConfig(fetch_mode="http", fetch_timeout_ms=500.0,
                          max_resource_size=4096)
        urls = [f"http://{host}{p}" for p in
                ["/ok", "/redir", "/nosuch", "/gone", "/big", "/huge", "/slow"]]
        urls.append("http://127.0.0.1:9/refused")  # closed port
        req = build_request_headers(_batch(spark, urls), cfg)
        out = classify(http_fetch(req, cfg,
                                  extra_cols=["body", "content_encoding",
                                              "set_cookie", "etag"]),
                       cfg).collect()
        by = {r["url_norm"].rsplit("/", 1)[-1]: r for r in out}

        ok = by["ok"]
        assert (ok["status"], ok["event"]) == ("downloaded", "fetchcomplete")
        assert ok["status_code"] == 200 and ok["found"]
        assert bytes(ok["body"]) == HTML and ok["body_size"] == len(HTML)
        assert ok["etag"] == '"v1"' and ok["set_cookie"] == ["sid=s1; Path=/"]
        assert ok["mime_supported"]

        rd = by["redir"]  # 3xx surfaced, never followed (J5 is the plan's)
        assert (rd["status"], rd["event"]) == ("redirected", "fetchredirect")
        assert rd["status_code"] == 302 and rd["redirect_to"] == "/target"

        assert (by["nosuch"]["status"], by["nosuch"]["event"]) == (
            "notfound", "fetch404")
        assert (by["gone"]["status"], by["gone"]["event"]) == (
            "notfound", "fetch410")

        big = by["big"]  # oversize header → abort BEFORE body download
        assert (big["status"], big["event"]) == ("dataerror", "fetchdataerror")
        assert big["content_length"] == 10_000_000 and big["body_size"] == 0

        huge = by["huge"]  # close-delimited stream over the cap
        assert (huge["status"], huge["event"]) == ("dataerror", "fetchdataerror")
        assert huge["content_length"] is None
        assert huge["body_size"] == 4097 and huge["body"] is None  # cap + 1

        slow = by["slow"]
        assert (slow["status"], slow["event"], slow["failure"]) == (
            "failed", "fetchtimeout", "timeout")
        assert slow["status_code"] is None and not slow["found"]

        refused = by["refused"]
        assert (refused["status"], refused["event"], refused["failure"]) == (
            "failed", "fetchclienterror", "clienterror")
    finally:
        srv.shutdown()


def test_http_fetch_outbound_headers_and_304(spark):
    spec = {"/echo": dict(body=HTML, ctype="text/html", etag='"e99"')}
    srv, handler, host = _serve(spec)
    try:
        cfg = CrawlConfig(fetch_mode="http", fetch_timeout_ms=2000.0,
                          auth_user="u", auth_pass="p",
                          custom_headers={"X-Test": "1",
                                          "User-Agent": "custom-ua/2"})
        url = f"http://{host}/echo"
        batch = _batch(spark, [url]).withColumn(
            "referrer", F.lit(f"http://{host}/parent"))
        # a cache entry whose etag matches the server's → real 304
        cache = spark.createDataFrame(
            [(1000, '"e99"', 1, "cached-ref-1", 1)],
            "url_hash long, etag string, last_modified long, "
            "payload_ref string, round_cached int")
        req = build_request_headers(batch, cfg, cache=cache)
        out = classify(http_fetch(req, cfg, extra_cols=["etag"]), cfg).collect()
        assert len(out) == 1
        r = out[0]
        # the server honored If-None-Match; the cached payload is served (S6)
        assert (r["status"], r["event"]) == ("notmodified", "notmodified")
        assert r["status_code"] == 304 and r["payload_ref"] == "cached-ref-1"
        path, hdrs = handler.log[-1]
        assert path == "/echo"
        assert hdrs["User-Agent"] == "custom-ua/2"  # customHeaders merged LAST
        assert hdrs["X-Test"] == "1"
        assert hdrs["Authorization"] == "Basic dTpw"
        assert hdrs["Referer"] == f"http://{host}/parent"
        assert hdrs["If-None-Match"] == '"e99"'
        assert hdrs["Accept-Encoding"] == "gzip, deflate"
    finally:
        srv.shutdown()


def test_http_fetch_crawl_delay_spacing(spark):
    """W3/J6 in the seam: with an explicit per-host crawl_delay the GETs for
    one host are spaced by at least the delay (request_start_offsets pinned
    separately; this checks the seam actually sleeps to them)."""
    import time

    spec = {f"/p{i}": dict(body=b"x", ctype="text/plain") for i in range(4)}
    srv, handler, host = _serve(spec)
    # timestamp each arrival
    times: list[float] = []
    orig = handler.do_GET

    def timed(self):
        times.append(time.perf_counter())
        orig(self)
    handler.do_GET = timed
    try:
        cfg = CrawlConfig(fetch_mode="http", fetch_timeout_ms=5000.0)
        urls = [f"http://{host}/p{i}" for i in range(4)]
        req = build_request_headers(
            _batch(spark, urls).coalesce(1), cfg)  # one task: in-task spacing
        out = http_fetch(req, cfg, crawl_delays={host: 0.3}).collect()
        assert len(out) == 4 and all(r["found"] for r in out)
        gaps = [b - a for a, b in zip(sorted(times), sorted(times)[1:])]
        assert len(gaps) == 3 and all(g >= 0.2 for g in gaps), gaps
    finally:
        srv.shutdown()


def test_http_fetch_image_payload_invariant(spark):
    """Image payloads over the wire (the graft's image axis on the real
    seam): real GETs return the encoded bytes for all three corpus formats,
    and an Arrow-batched decode recomputes the perceptual hash and true PSNR
    vs the deterministically regenerated original — the BASELINE per-row
    invariant (exact pixels for lossless png/ppm, PSNR ≥ 40 dB for lossy
    qpng), with the decode in a batched kernel, no per-row Python outside
    it."""
    import pandas as pd

    from simplecrawler_spark import codec
    from simplecrawler_spark.corpus import CorpusParams, gen_image_array

    p = CorpusParams()
    ids, want = [], {"png", "qpng", "ppm"}
    i = 0
    while want:
        _, fmt = gen_image_array(i, p)
        if fmt in want:
            want.discard(fmt)
            ids.append((i, fmt))
        i += 1
    spec = {}
    for i, fmt in ids:
        img, _ = gen_image_array(i, p)
        spec[f"/img{i}.{fmt}"] = dict(body=codec.encode(img, fmt),
                                      ctype=f"image/{fmt}")
    srv, handler, host = _serve(spec)
    try:
        cfg = CrawlConfig(fetch_mode="http", fetch_timeout_ms=5000.0)
        urls = [f"http://{host}{path}" for path in sorted(spec)]
        req = build_request_headers(_batch(spark, urls), cfg)
        fetched = classify(http_fetch(req, cfg, extra_cols=["body"]), cfg)

        def decode_verify(batches):
            for pdf in batches:
                out = []
                for url, body in zip(pdf["url_norm"], pdf["body"]):
                    img_id = int(url.rsplit("img", 1)[1].split(".")[0])
                    fmt = url.rsplit(".", 1)[1]
                    orig, _ = gen_image_array(img_id, p)
                    dec = codec.decode(bytes(body), fmt)
                    ok = (codec.psnr(orig, dec) >= 40.0 if fmt == "qpng"
                          else bool((orig == dec).all()))
                    out.append((url, ok))
                yield pd.DataFrame(out, columns=["url_norm", "payload_ok"])

        rows = fetched.mapInPandas(
            decode_verify, schema="url_norm string, payload_ok boolean").collect()
        assert len(rows) == 3 and all(r["payload_ok"] for r in rows)
        # images are downloaded (downloadUnsupported default) but never
        # discovery-scanned (MIME not whitelisted)
        st = fetched.select("status", "mime_supported").collect()
        assert all(r["status"] == "downloaded" and not r["mime_supported"]
                   for r in st)
    finally:
        srv.shutdown()


def test_https_ssl_parity_matrix(spark, tls_cert):
    """HTTPS × cert-trust matrix (``ignoreInvalidSSL``, crawler.js:≈L310):

    * self-signed cert, knob OFF, no CA → verification fails →
      ``clienterror`` (the reference's fetchclienterror path);
    * self-signed cert, ``ignore_invalid_ssl=True`` → downloaded;
    * same cert TRUSTED via ``ssl_ca_file``, knob OFF → downloaded (the
      valid-cert leg: verification including hostname/IP-SAN passes)."""
    cert, key = tls_cert
    srv, handler, host = _serve_tls(
        {"/ok": dict(body=HTML, ctype="text/html; charset=utf-8")}, cert, key)
    try:
        url = f"https://{host}/ok"

        def run(**kw):
            cfg = CrawlConfig(fetch_mode="http", fetch_timeout_ms=5000.0, **kw)
            req = build_request_headers(_batch(spark, [url]), cfg)
            rows = classify(http_fetch(req, cfg, extra_cols=["body"]),
                            cfg).collect()
            assert len(rows) == 1
            return rows[0]

        r = run()  # untrusted, verification on
        assert (r["status"], r["event"], r["failure"]) == (
            "failed", "fetchclienterror", "clienterror")
        assert not r["found"]

        r = run(ignore_invalid_ssl=True)
        assert (r["status"], r["event"]) == ("downloaded", "fetchcomplete")
        assert bytes(r["body"]) == HTML

        r = run(ssl_ca_file=cert)  # trusted → verification passes, knob off
        assert (r["status"], r["event"]) == ("downloaded", "fetchcomplete")
        assert bytes(r["body"]) == HTML
    finally:
        srv.shutdown()


def test_ssl_ca_file_is_additive_to_system_cas(tls_cert):
    """``ssl_ca_file`` must EXTEND the system trust store, not replace it:
    ``ssl.create_default_context(cafile=X)`` loads ONLY X (CPython skips
    ``load_default_certs`` when cafile is given), which would silently fail
    every public-CA https fetch on a cluster that adds an internal CA.
    Pin the additive behavior by inspecting the opener's SSL context."""
    import urllib.request

    from simplecrawler_spark.config import CrawlConfig
    from simplecrawler_spark.operators.http_fetch import _build_opener

    cert, _ = tls_cert

    def ctx_of(cfg):
        opener = _build_opener(cfg)
        for h in opener.handlers:
            if isinstance(h, urllib.request.HTTPSHandler):
                return h._context
        raise AssertionError("no HTTPSHandler on the opener")

    base = ctx_of(CrawlConfig(fetch_mode="http"))
    with_ca = ctx_of(CrawlConfig(fetch_mode="http", ssl_ca_file=cert))
    n_base = with_ca.cert_store_stats()["x509_ca"] - 1  # minus our bundle
    # the custom-bundle context still carries every system CA the default
    # context has (additive), plus exactly our one extra CA cert
    assert n_base == base.cert_store_stats()["x509_ca"]
    assert with_ca.verify_mode == base.verify_mode  # still CERT_REQUIRED


def _page(links):
    return ("<html><body>" + "".join(f'<a href="{x}">x</a>' for x in links)
            + "</body></html>").encode()


def _e2e_site(host, scheme="http"):
    """One site, two representations: the live server spec and the
    byte-identical table-mode corpus rows."""
    gz_body = gzip.compress(_page(["/target"]))
    spec = {
        "/robots.txt": dict(body=b"User-agent: *\nDisallow: /private\n",
                            ctype="text/plain"),
        "/": dict(body=_page(["/a", "/b", "/redir", "/missing", "/private/x"]),
                  ctype="text/html; charset=utf-8",
                  set_cookie=["sid=abc123; Path=/"]),
        "/a": dict(body=_page(["/b", "/gone", "/gzipped"]),
                   ctype="text/html; charset=utf-8"),
        "/b": dict(body=_page([]), ctype="text/html; charset=utf-8"),
        "/redir": dict(status=302, location="/target", body=b"",
                       ctype="text/plain"),
        "/target": dict(body=_page([]), ctype="text/html; charset=utf-8"),
        "/gone": dict(status=410, body=b"", ctype="text/plain"),
        "/gzipped": dict(body=gz_body, ctype="text/html; charset=utf-8",
                         encoding="gzip"),
        # /missing is NOT in the spec → live 404; /private/x is robots-gated
    }
    rows = []
    for i, (path, s) in enumerate(sorted(spec.items())):
        if path == "/robots.txt":
            continue
        body = s.get("body", b"")
        rows.append({
            "url_id": i, "url_norm": f"{scheme}://{host}{path}", "host": host,
            "status_code": s.get("status", 200),
            "redirect_to": s.get("location"), "content_type": s.get("ctype"),
            "links": None, "image_id": None, "caption": None,
            "robots_group": "open", "body_size": len(body),
            "content_length": len(body), "request_latency_ms": None,
            "download_time_ms": None, "request_time_ms": None, "failure": None,
            "body": bytearray(body), "content_encoding": s.get("encoding"),
            "set_cookie": s.get("set_cookie"),
        })
    nf = b"not found"  # the live server's default 404 for /missing
    rows.append({
        "url_id": 99, "url_norm": f"{scheme}://{host}/missing", "host": host,
        "status_code": 404, "redirect_to": None, "content_type": "text/plain",
        "links": None, "image_id": None, "caption": None,
        "robots_group": "open", "body_size": len(nf), "content_length": len(nf),
        "request_latency_ms": None, "download_time_ms": None,
        "request_time_ms": None, "failure": None, "body": bytearray(nf),
        "content_encoding": None, "set_cookie": None,
    })
    return spec, rows


_CMP_COLS = ["seq", "url_norm", "depth", "referrer", "status", "event",
             "status_code", "round_fetched", "hdr_cookie"]


def test_http_crawl_matches_table_crawl(spark, tmp_path):
    """Flagship S2 parity: the SAME site crawled over real HTTP (lazy
    robots.txt over HTTP, real Set-Cookie folding, html discovery over the
    wire) and in table mode over a corpus mirroring the server — crawl
    order, url_seen, statuses, outbound Cookie headers and event counters
    all byte-identical."""
    from simplecrawler_spark.corpus import WEB_SCHEMA

    srv, handler, host = _serve({})
    try:
        spec, rows = _e2e_site(host)
        handler.spec = spec  # late-bind: rows needed the port
        seed = f"http://{host}/"
        common = dict(seeds=[seed], budget=2, max_rounds=50,
                      discovery_mode="html", robots_mode="lazy",
                      respect_robots_txt=True, accept_cookies=True,
                      dedupe_mode="exact", fetch_timeout_ms=5000.0)
        cfg_http = CrawlConfig(fetch_mode="http",
                               warehouse=str(tmp_path / "wh_http"), **common)
        res_http = CrawlEngine(spark, cfg_http, web=None).run()

        web = spark.createDataFrame(rows, WEB_SCHEMA + ", set_cookie array<string>")
        robots_txt = spark.createDataFrame(
            [(host, spec["/robots.txt"]["body"].decode())], "host string, body string")
        cfg_tab = CrawlConfig(warehouse=str(tmp_path / "wh_tab"), **common)
        res_tab = CrawlEngine(spark, cfg_tab, web,
                              robots_txt=robots_txt).run()

        f_http = sorted(map(tuple, res_http.fetched_log(spark)
                            .select(*_CMP_COLS).collect()))
        f_tab = sorted(map(tuple, res_tab.fetched_log(spark)
                           .select(*_CMP_COLS).collect()))
        assert f_http == f_tab
        assert res_http.events == res_tab.events
        seen_http = sorted(r["url_norm"] for r in
                           res_http.url_seen(spark).collect())
        seen_tab = sorted(r["url_norm"] for r in
                          res_tab.url_seen(spark).collect())
        assert seen_http == seen_tab

        # robots actually enforced over the wire: /private/x never requested
        paths = [p for p, _ in handler.log]
        assert "/private/x" not in paths
        assert "/robots.txt" in paths  # lazy S3 fetched it over HTTP
        # D8 over the wire: some round-2+ request carried the cookie the
        # seed's response set
        cookied = [h for p, h in handler.log
                   if p != "/robots.txt" and h.get("Cookie")]
        assert cookied and all(h["Cookie"] == "sid=abc123" for h in cookied)
        # and the canonical seed really was fetched over HTTP
        assert canonicalize_one(seed, None) == seed
    finally:
        srv.shutdown()


def test_https_crawl_matches_table_crawl(spark, tmp_path, tls_cert):
    """S2 over TLS: the e2e byte-identity parity extended to an https crawl —
    the live side is an HTTPS-ONLY server with a self-signed cert crawled
    behind ``ignore_invalid_ssl`` (the reference's own suite shape:
    testserver.js :3001 + ignoreInvalidSSL), the table side mirrors it with
    https URLs. Also proves the robots URL is derived from the URL's own
    scheme (S3): the server speaks ONLY TLS, so the recorded /robots.txt hit
    — and the enforced /private gate — are impossible with a hardcoded
    http:// robots fetch."""
    from simplecrawler_spark.corpus import WEB_SCHEMA

    cert, key = tls_cert
    srv, handler, host = _serve_tls({}, cert, key)
    try:
        spec, rows = _e2e_site(host, scheme="https")
        handler.spec = spec
        seed = f"https://{host}/"
        common = dict(seeds=[seed], budget=2, max_rounds=50,
                      discovery_mode="html", robots_mode="lazy",
                      respect_robots_txt=True, accept_cookies=True,
                      dedupe_mode="exact", fetch_timeout_ms=5000.0)
        cfg_http = CrawlConfig(fetch_mode="http", ignore_invalid_ssl=True,
                               warehouse=str(tmp_path / "wh_https"), **common)
        res_http = CrawlEngine(spark, cfg_http, web=None).run()

        web = spark.createDataFrame(rows, WEB_SCHEMA + ", set_cookie array<string>")
        robots_txt = spark.createDataFrame(
            [(host, spec["/robots.txt"]["body"].decode())], "host string, body string")
        cfg_tab = CrawlConfig(warehouse=str(tmp_path / "wh_tabs"), **common)
        res_tab = CrawlEngine(spark, cfg_tab, web,
                              robots_txt=robots_txt).run()

        f_http = sorted(map(tuple, res_http.fetched_log(spark)
                            .select(*_CMP_COLS).collect()))
        f_tab = sorted(map(tuple, res_tab.fetched_log(spark)
                           .select(*_CMP_COLS).collect()))
        assert f_http == f_tab
        assert res_http.events == res_tab.events
        assert (sorted(r["url_norm"] for r in res_http.url_seen(spark).collect())
                == sorted(r["url_norm"] for r in res_tab.url_seen(spark).collect()))
        paths = [p for p, _ in handler.log]
        assert "/robots.txt" in paths       # fetched over the URL's OWN scheme
        assert "/private/x" not in paths    # and actually enforced
    finally:
        srv.shutdown()


def test_http_stream_matches_http_batch(spark, tmp_path):
    """§2.9 × S2: the Structured-Streaming wrapper (one micro-batch == one
    BSP round) drives the REAL seam too — the streamed http crawl's durable
    tables match the batch http crawl's."""
    import time

    from simplecrawler_spark.plans.crawl import CrawlResult
    from simplecrawler_spark.streaming.stream import stream_crawl

    srv, handler, host = _serve({})
    try:
        spec, _ = _e2e_site(host)
        handler.spec = spec
        common = dict(seeds=[f"http://{host}/"], budget=2, max_rounds=3,
                      discovery_mode="html", fetch_mode="http",
                      robots_mode="lazy", respect_robots_txt=True,
                      dedupe_mode="exact", fetch_timeout_ms=5000.0)
        batch_res = CrawlEngine(
            spark, CrawlConfig(warehouse=str(tmp_path / "wh_hb"), **common),
            web=None).run()
        eng = CrawlEngine(
            spark, CrawlConfig(warehouse=str(tmp_path / "wh_hs"),
                               **{**common, "max_rounds": 500}), web=None)
        q = stream_crawl(spark, eng, tick_seconds=0.2, max_rounds=3)
        deadline = time.time() + 300
        while time.time() < deadline:
            if eng.wh.latest_round() is not None and eng.wh.latest_round() >= 3:
                break
            time.sleep(0.5)
        q.stop()
        assert eng.wh.latest_round() >= 3
        stream_res = CrawlResult(eng.wh, 3, 0)
        key = ["round_fetched", "seq", "url_norm", "status"]
        assert (sorted(map(tuple, batch_res.fetched_log(spark).select(*key).collect()))
                == sorted(map(tuple, stream_res.fetched_log(spark).select(*key)
                              .where(F.col("round_fetched") <= batch_res.rounds)
                              .collect())))
    finally:
        srv.shutdown()


def test_http_crawl_conditional_get_roundtrip(spark, tmp_path):
    """S6 over the wire: re-crawling with use_cache sends If-None-Match with
    the REAL server ETag from the first crawl's delta; the server answers
    304 and the engine serves the cached payload ref (notmodified)."""
    srv, handler, host = _serve({
        "/": dict(body=_page([]), ctype="text/html", etag='"stable-1"'),
    })
    try:
        seed = f"http://{host}/"
        # the forced duplicate (queue.js:≈L90) fetches one round after the
        # seed (budget=1), by which time the seed's delta IS the cache —
        # same shape as the table-mode parity test (test_crawl_parity.py)
        cfg = CrawlConfig(seeds=[seed], force_seeds=[seed], budget=1,
                          max_rounds=10, fetch_mode="http",
                          discovery_mode="html", respect_robots_txt=False,
                          use_cache=True, fetch_timeout_ms=5000.0,
                          dedupe_mode="exact",
                          warehouse=str(tmp_path / "wh_cget"))
        res = CrawlEngine(spark, cfg, web=None).run()
        log = sorted(res.fetched_log(spark).collect(), key=lambda r: r["seq"])
        assert [r["status"] for r in log] == ["downloaded", "notmodified"]
        assert log[1]["status_code"] == 304
        assert log[1]["payload_ref"] == seed  # cached ref (url-keyed payload)
        last = [h for p, h in handler.log if p == "/"][-1]
        assert last.get("If-None-Match") == '"stable-1"'
    finally:
        srv.shutdown()
