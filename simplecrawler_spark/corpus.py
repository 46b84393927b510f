"""Deterministic synthetic corpus: ``web`` graph + ``images`` payloads +
``robots`` policies (FIXTURES.md §1–3). Plays the role of the reference's
fixture server (``test/lib/routes.js`` — a small known page graph with
links, redirects, 404s and cycles served on localhost); here "the internet"
is a table, which is what makes crawls deterministic and testable (J4).

Scale design: every row is a pure function of ``(seed, url_id)`` via
``np.random.Generator(PCG64(seed*P + id))`` — generation runs distributed
through ``mapInPandas`` over a ``spark.range`` id space, so a 10^10-row
corpus is as generatable as a 10^3-row one (no driver-side materialization,
no cross-row dependency). Host assignment is Zipf(s≈1.1) over H hosts ⇒
hot-host skew is built in (W2 skew-split tests rely on it).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np
import pandas as pd

from simplecrawler_spark import codec

_ADJ = ["amber", "bold", "calm", "deep", "eager", "fuzzy", "grand", "hazy", "icy", "jolly"]
_NOUN = ["atlas", "brook", "cliff", "dune", "ember", "fjord", "grove", "harbor", "isle", "jungle"]

ROBOTS_GROUPS = ["open", "deny_private", "deny_all", "delay"]


@dataclass
class CorpusParams:
    n_urls: int = 1000
    n_hosts: int = 10
    seed: int = 42
    zipf_s: float = 1.1
    frac_image: float = 0.15       # leaf image pages
    mean_degree: float = 6.0       # lognormal out-degree for HTML pages
    frac_private: float = 0.08     # URLs under /private/ (robots-denied on deny_private hosts)
    img_sizes: tuple = (16, 32, 64)
    web_buckets: int = 32          # url_norm bucketing of the web table (fetch-join locality)
    # D8 acceptCookies fodder: ~15% of responses carry Set-Cookie headers
    # (host-default, path-scoped, Domain-attributed, multi-cookie, expired).
    # Derived from url_id by integer hash — NO rng draws, so corpora stay
    # draw-identical to cookie-less rounds; off by default so older fixtures
    # and benches are bit-identical.
    with_cookies: bool = False

    def host_bounds(self) -> np.ndarray:
        w = 1.0 / np.power(np.arange(1, self.n_hosts + 1), self.zipf_s)
        cum = np.cumsum(w) / w.sum()
        return np.floor(cum * self.n_urls).astype(np.int64)


def host_of(ids: np.ndarray, bounds: np.ndarray) -> np.ndarray:
    return np.searchsorted(bounds, ids, side="right")


def host_name(h: int) -> str:
    return f"host{h}.example"


def robots_group_of(h: int) -> str:
    # host0 (the hottest) stays open so crawls actually expand
    return ROBOTS_GROUPS[h % len(ROBOTS_GROUPS)] if h > 0 else "open"


def url_of(h: int, j: int, private: bool) -> str:
    return f"http://{host_name(h)}/{'private/p' if private else 'p'}/{j}"


def _caption(rng: np.random.Generator, i: int) -> str:
    return f"{_ADJ[rng.integers(10)]} {_NOUN[rng.integers(10)]} {i}"


def render_html_body(i: int, links: list[str], charset: str = "utf-8") -> bytes:
    """Render a page's link list into a real HTML body for the HTML-discovery
    path (F2 over raw bodies, ``discoverResources`` crawler.js:≈L900–950).
    Wrapper styles rotate deterministically from (url_id, link_idx) — NOT
    from the rng stream, so corpora stay draw-identical to body-less rounds.
    The regex discovery pipeline recovers these links (plus benign duplicate
    matches across regexes that in-page first-wins dedupe collapses)."""
    title = "páge" if charset != "utf-8" else "page"
    parts = [f'<html><head><meta charset="{charset}"><title>{title} {i}</title>'
             "</head><body>"]
    for k, u in enumerate(links):
        st = (i * 31 + k * 7) % 6
        if st == 0:
            parts.append(f'<a href="{u}">link{k}</a>')
        elif st == 1:
            parts.append(f"<img src='{u}'>")
        elif st == 2:
            parts.append(f'<div style="background:url({u})"></div>')
        elif st == 3 and u and " " not in u:
            parts.append(f"<a href={u}>x</a>")  # unquoted attribute
        elif st == 4:
            parts.append(f'<!-- todo <a href="{u}">c</a> -->')  # comment link
        else:
            parts.append(f'<a href="{u}">y</a>')
    parts.append("<script>var x = 1;</script></body></html>")
    return "\n".join(parts).encode(charset, errors="replace")


def body_encoding_of(i: int) -> tuple[str | None, bool, str]:
    """(content_encoding, corrupt, charset) for url_id ``i`` — deterministic
    integer hash, no rng draws. ~5% of gzip bodies are truncated mid-stream
    (the reference's ``gziperror`` path, crawler.js:≈L1560)."""
    h = (i * 2654435761) % 100
    charset = "iso-8859-1" if (i * 40503) % 17 == 0 else "utf-8"
    if h < 55:
        return None, False, charset
    if h < 80:
        return "gzip", False, charset
    if h < 90:
        return "deflate", False, charset
    if h < 93:
        return "gzip", True, charset
    return None, False, charset


def make_body(i: int, links: list[str]) -> tuple[bytes | None, str | None]:
    """(body, content_encoding) for an HTML page — compressed per
    :func:`body_encoding_of`; corrupt rows get a truncated gzip stream."""
    import zlib

    enc, corrupt, charset = body_encoding_of(i)
    raw = render_html_body(i, links, charset)
    if enc == "gzip":
        co = zlib.compressobj(wbits=zlib.MAX_WBITS | 16)
        data = co.compress(raw) + co.flush()
        if corrupt:
            data = data[: max(len(data) // 2, 4)]
        return data, "gzip"
    if enc == "deflate":
        return zlib.compress(raw), "deflate"
    return raw, None


def gen_rows(ids: np.ndarray, p: CorpusParams) -> pd.DataFrame:
    """Pure function (seed, ids) → web rows. Shared by the pandas unit path
    and the Spark mapInPandas path."""
    bounds = p.host_bounds()
    starts = np.concatenate([[0], bounds[:-1]])
    sizes = np.maximum(bounds - starts, 1)
    rows = []
    for i in ids:
        i = int(i)
        rng = np.random.Generator(np.random.PCG64(p.seed * 1_000_003 + i))
        h = int(host_of(np.array([i]), bounds)[0])
        h = min(h, p.n_hosts - 1)
        j = i - int(starts[h])
        private = rng.random() < p.frac_private and j > 0
        url = url_of(h, j, private)
        grp = robots_group_of(h)
        r = rng.random()
        is_image = rng.random() < p.frac_image and j > 0
        if r < 0.84:
            code = 200
        elif r < 0.92:
            # full 3xx family the reference's handleResponse covers
            code = [301, 302, 303, 307, 308][int(rng.integers(5))]
        elif r < 0.955:
            code = 404
        elif r < 0.965:
            code = 410
        elif r < 0.975:
            code = 304
        elif r < 0.99:
            code = 403  # non-special 4xx → fetcherror
        else:
            code = 500  # 5xx → fetcherror
        redirect_to = None
        if 300 <= code <= 399 and code != 304:
            # redirect within host (chains up to ~4 arise naturally; self-loop
            # avoided; occasional cycle pairs by construction of rng)
            tj = int(rng.integers(int(sizes[h])))
            redirect_to = url_of(h, tj, False)
            is_image = False
        content_type = "image/png" if is_image and code == 200 else "text/html"
        if content_type == "text/html" and rng.random() < 0.05:
            content_type = "Text/HTML"  # exercises the reference's /i MIME flag
        image_id = f"img-{i:08d}" if content_type.startswith("image/") else None
        caption = _caption(rng, i) if image_id else None
        links: list[str] = []
        if code == 200 and content_type.lower() == "text/html":
            deg = int(min(np.ceil(rng.lognormal(np.log(max(p.mean_degree, 1.1)), 0.6)), 40))
            for k in range(deg):
                rr = rng.random()
                if rr < 0.55:  # same-host relative link
                    tj = int(rng.integers(int(sizes[h])))
                    links.append(f"/p/{tj}")
                elif rr < 0.65:  # relative with dot segments / fragment noise
                    tj = int(rng.integers(int(sizes[h])))
                    links.append(f"../p/./{tj}#frag{k}")
                elif rr < 0.73:  # private (robots-gated) same-host
                    tj = int(rng.integers(int(sizes[h])))
                    links.append(f"/private/p/{tj}")
                elif rr < 0.85:  # cross-host absolute (domain-filter fodder)
                    th = int(rng.integers(p.n_hosts))
                    tj = int(rng.integers(int(sizes[th])))
                    links.append(f"http://{host_name(th)}/p/{tj}")
                elif rr < 0.90:  # protocol-relative
                    th = int(rng.integers(p.n_hosts))
                    tj = int(rng.integers(int(sizes[th])))
                    links.append(f"//{host_name(th)}/p/{tj}")
                elif rr < 0.94:  # non-canonical absolute (canonicalizer fodder)
                    tj = int(rng.integers(int(sizes[h])))
                    links.append(f"HTTP://{host_name(h).upper()}:80/p/../p/{tj}?b=2&a=1")
                elif rr < 0.97:  # duplicate of first link (in-page dedupe)
                    if links:
                        links.append(links[0])
                else:  # junk (dropped by cleanup)
                    links.append(rng.choice(["mailto:x@y.z", "javascript:void(0)", "#top", ""]))
        body_size = int(rng.integers(500, 50_000)) if not image_id else int(rng.integers(800, 8_000))
        if rng.random() < 0.001:
            body_size = 20 * 1024 * 1024  # exercises maxResourceSize gate
        # Content-Length header (P6, crawler.js:≈L1470–1560): usually honest,
        # sometimes absent (chunked transfer), sometimes lying — a mismatch
        # with the streamed size sets `sentIncorrectSize`; an oversize header
        # aborts pre-download (fetchdataerror before any body bytes).
        # Derived from url_id (Knuth multiplicative hash), NOT from the rng
        # stream, so corpora stay draw-identical to pre-content_length rounds.
        clh = (i * 2654435761) % 1000
        if clh < 20:
            content_length = None
        elif clh < 30:
            content_length = int(body_size * 0.7) + 1
        elif clh < 33:
            content_length = 32 * 1024 * 1024
        else:
            content_length = body_size
        # transport-level failures (reference: request timeout → `fetchtimeout`,
        # socket/DNS error → `fetchclienterror`, crawler.js:≈L1250–1320): the
        # response row exists in "the internet" but the request never completes
        failure = None
        fr2 = rng.random()
        if fr2 < 0.008:
            failure = "timeout"
        elif fr2 < 0.015:
            failure = "clienterror"
        # stateData telemetry (D2, queue.js:≈L180–260 statistics whitelist):
        # deterministic per-URL latencies — what a real fetch would time
        request_latency = round(float(rng.uniform(5.0, 400.0)), 3)
        download_time = round(body_size / 1024.0 / float(rng.uniform(2.0, 20.0)), 3)
        # raw HTML body + transfer coding for the HTML-discovery mode (F2/F6/
        # F7 in the hot path); derived without rng draws — table-mode corpora
        # are unchanged, and column pruning keeps table-mode scans body-free
        if code == 200 and content_type.lower() == "text/html":
            body, content_encoding = make_body(i, links)
        else:
            body, content_encoding = None, None
        # Set-Cookie headers (D8 acceptCookies): integer-hash derived (no rng
        # draws — draw-identical corpora). Variants cover the jar semantics:
        # host-default, path-scoped+HttpOnly, explicit Domain + far Expires,
        # two-cookies-one-response, and an already-expired cookie (stored in
        # the jar, excluded from outbound headers).
        set_cookie = None
        if p.with_cookies:
            ch = (i * 1140071481) % 100
            if ch < 8:
                set_cookie = [f"sid={i % 5}; Path=/"]
            elif ch < 12:
                set_cookie = [f"pref=p{i % 3}; Path=/private/; HttpOnly"]
            elif ch < 14:
                set_cookie = [
                    f"track=t{i % 7}; Domain={host_name(h)}; "
                    "Expires=Wed, 01 Jan 2031 00:00:00 GMT",
                    f"sess=s{i % 2}; Path=/",
                ]
            elif ch < 15:
                set_cookie = ["old=1; Expires=Thu, 01 Jan 1970 00:00:00 GMT"]
        rows.append(
            (i, url, host_name(h), code, redirect_to, content_type, links,
             image_id, caption, grp, body_size, content_length,
             request_latency, download_time, round(request_latency + download_time, 3),
             failure, body, content_encoding)
            + ((set_cookie,) if p.with_cookies else ())
        )
    cols = ["url_id", "url_norm", "host", "status_code", "redirect_to",
            "content_type", "links", "image_id", "caption", "robots_group", "body_size",
            "content_length",
            "request_latency_ms", "download_time_ms", "request_time_ms", "failure",
            "body", "content_encoding"]
    if p.with_cookies:
        cols.append("set_cookie")
    return pd.DataFrame(rows, columns=cols)


def gen_image_array(i: int, p: CorpusParams) -> tuple[np.ndarray, str]:
    """(original pixels, fmt) for image url_id ``i`` — pure function of
    (seed, i); also used by the payload verifier to recompute true PSNR."""
    rng = np.random.Generator(np.random.PCG64(p.seed * 7_000_003 + i))
    w = int(rng.choice(p.img_sizes))
    hh = int(rng.choice(p.img_sizes))
    fr = rng.random()
    fmt = "png" if fr < 0.7 else ("qpng" if fr < 0.9 else "ppm")
    # gradient + seeded noise pattern
    gx = np.linspace(0, 255, w, dtype=np.float32)[None, :]
    gy = np.linspace(0, 255, hh, dtype=np.float32)[:, None]
    base = np.stack([gx + 0 * gy, 0 * gx + gy, (gx + gy) / 2], axis=-1)
    noise = rng.integers(0, 40, size=(hh, w, 3))
    img = np.clip(base + noise, 0, 255).astype(np.uint8)
    return img, fmt


def gen_image_rows(ids: np.ndarray, p: CorpusParams) -> pd.DataFrame:
    """Payload rows for image url_ids — exact input_hint shape
    (image_id, bytes, w, h, fmt, caption, phash), BASELINE.json:15."""
    rows = []
    for i in ids:
        i = int(i)
        img, fmt = gen_image_array(i, p)
        hh, w, _ = img.shape
        data = codec.encode(img, fmt)
        decoded = codec.decode(data, fmt)  # phash of exactly what decode returns
        rows.append((f"img-{i:08d}", data, w, hh, fmt, None, codec.average_hash(decoded)))
    return pd.DataFrame(
        rows, columns=["image_id", "bytes", "w", "h", "fmt", "caption", "phash"]
    )


def render_robots_txt(disallow: list[str], allow: list[str], crawl_delay) -> str:
    """Rules → a real robots.txt body (for the lazy-fetch path, S3)."""
    lines = ["User-agent: *"]
    lines += [f"Disallow: {d}" for d in disallow]
    lines += [f"Allow: {a}" for a in allow]
    if crawl_delay is not None:
        lines.append(f"Crawl-delay: {crawl_delay}")
    return "\n".join(lines) + "\n"


def robots_table(p: CorpusParams) -> pd.DataFrame:
    rows = []
    for h in range(p.n_hosts):
        grp = robots_group_of(h)
        if grp == "open":
            d, a, cd = [], [], None
        elif grp == "deny_private":
            d, a, cd = ["/private/"], ["/private/p/0"], None
        elif grp == "deny_all":
            d, a, cd = ["/"], [], None
        else:  # delay
            d, a, cd = ["/private/"], [], 0.5
        rows.append((host_name(h), d, a, cd))
    return pd.DataFrame(rows, columns=["host", "disallow", "allow", "crawl_delay"])


WEB_SCHEMA = (
    "url_id long, url_norm string, host string, status_code int, redirect_to string, "
    "content_type string, links array<string>, image_id string, caption string, "
    "robots_group string, body_size long, content_length long, "
    "request_latency_ms double, download_time_ms double, request_time_ms double, "
    "failure string, body binary, content_encoding string"
)
# appended iff CorpusParams.with_cookies — cookie-less corpora keep their
# exact historical schema (and crawls over them pay zero for D8)
COOKIE_COL = ", set_cookie array<string>"


def web_schema(p: "CorpusParams") -> str:
    return WEB_SCHEMA + (COOKIE_COL if p.with_cookies else "")
IMAGES_SCHEMA = "image_id string, bytes binary, w int, h int, fmt string, caption string, phash long"


def read_web(spark, corpus_dir: str):
    """Read the corpus web table WITH its bucket metadata when present.

    ``write_corpus`` lays the web table out as plain parquet files bucketed
    by ``url_norm`` and records the spec in ``web/_BUCKET_SPEC.json``. A
    fresh session can't know the layout from the files alone, so this
    re-registers an external table with the matching ``CLUSTERED BY`` DDL —
    the fetch join (operators/fetch.py) then reads the corpus bucket-locally
    with no exchange on the corpus side. Falls back to a plain parquet read
    for corpora without the spec (hand-built fixtures, older corpora)."""
    import hashlib
    import json as _json

    d = os.path.abspath(os.path.join(corpus_dir, "web"))
    spec_path = os.path.join(d, "_BUCKET_SPEC.json")
    if not os.path.exists(spec_path):
        return spark.read.parquet(d)
    with open(spec_path) as f:
        spec = _json.load(f)
    name = "web_bkt_" + hashlib.md5(d.encode()).hexdigest()[:12]
    if not spark.catalog.tableExists(name):
        spark.sql(
            f"CREATE TABLE {name} ({spec['schema']}) USING PARQUET "
            f"CLUSTERED BY ({spec['key']}) SORTED BY ({spec['key']}) "
            f"INTO {spec['buckets']} BUCKETS LOCATION '{d}'")
    # same path may have been rewritten within this session (tests): drop
    # any cached file listing before handing the relation out
    spark.catalog.refreshTable(name)
    return spark.table(name)


def write_corpus(spark, out_dir: str, p: CorpusParams, partitions: int | None = None) -> None:
    """Distributed generation → parquet at ``out_dir``/{web,images,robots}."""
    nparts = partitions or max(1, min(64, p.n_urls // 2000 + 1))

    def gen_web(batches):
        for pdf in batches:
            yield gen_rows(pdf["id"].to_numpy(), p)

    web = (
        spark.range(0, p.n_urls, 1, nparts)
        .mapInPandas(gen_web, schema=web_schema(p))
    )
    # The web table is BUCKETED by the fetch-join key (url_norm): every crawl
    # round equi-joins its batch against this table, and a bucketed corpus
    # side makes that join bucket-local — only the (much smaller) batch side
    # shuffles, the corpus never does. At the 100 TB design point this is the
    # difference between re-shuffling the whole snapshot every round and a
    # one-time layout cost at ingest. repartition on the SAME hash expression
    # bucketBy uses (pmod(murmur3, n)) → exactly one file per bucket, which
    # also lets Spark trust the per-bucket sort (no sort before the merge
    # join). Files remain plain parquet — spark.read.parquet works unchanged;
    # read_web() recreates the bucket metadata from _BUCKET_SPEC.json.
    import json as _json
    import uuid as _uuid
    tmp_tbl = f"web_bucketed_tmp_{_uuid.uuid4().hex[:8]}"
    (web.repartition(p.web_buckets, "url_norm")
        .write.mode("overwrite").format("parquet")
        .bucketBy(p.web_buckets, "url_norm").sortBy("url_norm")
        .option("path", os.path.abspath(f"{out_dir}/web"))
        .saveAsTable(tmp_tbl))
    spark.sql(f"DROP TABLE {tmp_tbl}")  # external: data files stay
    with open(f"{out_dir}/web/_BUCKET_SPEC.json", "w") as f:
        _json.dump({"buckets": p.web_buckets, "key": "url_norm",
                    "schema": web_schema(p)}, f)
    web = spark.read.parquet(f"{out_dir}/web")

    def gen_images(batches):
        # chunk output so Arrow batches stay ~10-25 MB even with large
        # payloads (one 8k-row batch of 128px PNGs would be ~250 MB)
        for pdf in batches:
            ids = pdf["url_id"].to_numpy()
            for i in range(0, len(ids), 512):
                yield gen_image_rows(ids[i : i + 512], p)

    img_ids = web.where(web.image_id.isNotNull()).select("url_id", "caption")
    images = img_ids.select("url_id").mapInPandas(gen_images, schema=IMAGES_SCHEMA)
    # caption lives on the web row (single rng stream); join it onto the
    # payload. The captions side is explicitly broadcast — the images side
    # carries multi-KB binary rows and its size estimate (inherited from the
    # tiny pre-UDF child) would otherwise tempt AQE into broadcasting IT.
    from pyspark.sql import functions as F
    images = (
        images.drop("caption")
        .join(
            F.broadcast(web.where(web.image_id.isNotNull()).select("image_id", "caption")),
            "image_id",
        )
        .select("image_id", "bytes", "w", "h", "fmt", "caption", "phash")
    )
    images.write.mode("overwrite").parquet(f"{out_dir}/images")
    rt = robots_table(p)
    spark.createDataFrame(rt).write.mode("overwrite").parquet(f"{out_dir}/robots")
    # raw-body twin for the lazy per-host robots *fetch* path (S3): what a
    # real crawl would GET from http://host/robots.txt
    bodies = pd.DataFrame({
        "host": rt["host"],
        "body": [render_robots_txt(d, a, cd)
                 for d, a, cd in zip(rt["disallow"], rt["allow"], rt["crawl_delay"])],
    })
    spark.createDataFrame(bodies).write.mode("overwrite").parquet(f"{out_dir}/robots_txt")
