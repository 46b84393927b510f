"""D8 — cookie jar (reference: ``lib/cookies.js``, ≈570 LoC: ``Cookie``
parse/match/serialize + ``CookieJar`` add/get/outbound-header).

Off the hot path (only needed to construct real-fetch request headers), so
this is a faithful pure-Python port of the *semantics*: ``Set-Cookie``
parsing, domain/path matching (RFC 6265 §5.1.3/§5.1.4), expiry, and the
outbound ``Cookie:`` header. The jar also round-trips through a DataFrame
(``cookies`` table) for snapshot/restore alongside the crawl state.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from email.utils import parsedate_to_datetime


@dataclass
class Cookie:
    name: str
    value: str = ""
    domain: str = "*"
    path: str = "/"
    expires: float | None = None     # epoch seconds; None = session cookie
    httponly: bool = False
    secure: bool = False

    @classmethod
    def from_set_cookie(cls, header: str, request_host: str = "*") -> "Cookie":
        parts = [p.strip() for p in header.split(";")]
        name, _, value = parts[0].partition("=")
        c = cls(name=name.strip(), value=value.strip(), domain=request_host)
        for p in parts[1:]:
            k, _, v = p.partition("=")
            k, v = k.strip().lower(), v.strip()
            if k == "domain" and v:
                c.domain = v.lstrip(".").lower()
            elif k == "path" and v:
                c.path = v
            elif k == "expires" and v:
                try:
                    c.expires = parsedate_to_datetime(v).timestamp()
                except (TypeError, ValueError):
                    pass
            elif k == "max-age" and v:
                try:
                    c.expires = time.time() + float(v)
                except ValueError:
                    pass
            elif k == "httponly":
                c.httponly = True
            elif k == "secure":
                c.secure = True
        return c

    def matches_domain(self, host: str) -> bool:
        if self.domain == "*":
            return True
        host = host.lower().rstrip(".")
        return host == self.domain or host.endswith("." + self.domain)

    def matches_path(self, path: str) -> bool:
        if not path.startswith(self.path):
            return False
        return (self.path.endswith("/") or len(path) == len(self.path)
                or path[len(self.path)] == "/")

    def expired(self, now: float | None = None) -> bool:
        return self.expires is not None and self.expires <= (now or time.time())

    def header_pair(self) -> str:
        return f"{self.name}={self.value}"


@dataclass
class CookieJar:
    cookies: list[Cookie] = field(default_factory=list)

    def add_from_headers(self, set_cookie_headers: list[str] | str, host: str = "*") -> None:
        if isinstance(set_cookie_headers, str):
            set_cookie_headers = [set_cookie_headers]
        for h in set_cookie_headers:
            self.add(Cookie.from_set_cookie(h, host))

    def add(self, cookie: Cookie) -> None:
        # same (name, domain, path) replaces — reference CookieJar.add
        self.cookies = [
            c for c in self.cookies
            if not (c.name == cookie.name and c.domain == cookie.domain and c.path == cookie.path)
        ]
        self.cookies.append(cookie)

    def get(self, host: str, path: str = "/", now: float | None = None) -> list[Cookie]:
        matched = [c for c in self.cookies
                   if c.matches_domain(host) and c.matches_path(path) and not c.expired(now)]
        # RFC 6265 §5.4 order: longer paths first; stable (creation order) ties
        return sorted(matched, key=lambda c: -len(c.path))

    def outbound_header(self, host: str, path: str = "/", now: float | None = None) -> str:
        """The ``Cookie:`` request header (reference ``getAsHeader``,
        ``lib/cookies.js:≈L420``)."""
        return "; ".join(c.header_pair() for c in self.get(host, path, now))

    # --- table round-trip (snapshot alongside crawl state) ---
    def to_rows(self) -> list[tuple]:
        return [(c.name, c.value, c.domain, c.path, c.expires, c.httponly, c.secure)
                for c in self.cookies]

    SCHEMA = ("name string, value string, domain string, path string, "
              "expires double, httponly boolean, secure boolean")

    @classmethod
    def from_rows(cls, rows) -> "CookieJar":
        jar = cls()
        for r in rows:
            jar.cookies.append(Cookie(r[0], r[1], r[2], r[3], r[4], bool(r[5]), bool(r[6])))
        return jar


def last_per_cookie_identity(df):
    """Executor-side reduction of exploded ``Set-Cookie`` rows — columns
    ``(seq, idx, host, sc)`` — to ONE row per cookie IDENTITY (name, domain,
    path), keeping each identity's LAST occurrence by (seq, idx) as a struct
    column ``o = (seq, idx, sc, host)``.

    This is the jar's own memory model: ``CookieJar.add`` is
    remove-then-append (reference ``cookies.js:≈L360``), so replaying ONLY
    the last header per identity — ascending by its (seq, idx) — yields a
    jar bit-identical to replaying every response's headers sequentially:
    per identity, both the final value AND the jar position come from the
    key's last add. The reduction is pure JVM expressions (the identity
    extraction mirrors :meth:`Cookie.from_set_cookie` exactly — crosscheck
    pinned in tests), map-side combinable (max), one shuffle on the
    identity — so the driver-side collect is bounded by DISTINCT IDENTITIES
    (jar size), never O(responses): a web that mints per-session cookie
    VALUES (``sid=<random>`` per response) still reduces to one row.

    Identity semantics (``Cookie.from_set_cookie``):
      * name  — first ``;`` part, before the first ``=``, trimmed;
      * domain — LAST nonempty (case-insensitive) ``Domain`` attribute,
        leading dots stripped, lowercased; default = the request host;
      * path  — LAST nonempty ``Path`` attribute; default ``/``.
    """
    from pyspark.sql import functions as F

    # whitespace trim matching Python str.strip() — F.trim strips ONLY
    # spaces, so a tab after ';' would make '\tdomain' miss the attribute
    # and compute a different identity than the jar parser
    def wt(c):
        return F.regexp_replace(c, r"^\s+|\s+$", "")

    parts = F.split(F.col("sc"), ";")
    attrs = F.slice(parts, 2, F.greatest(F.size(parts) - 1, F.lit(0)))
    kv = F.transform(attrs, lambda p: F.struct(
        F.lower(wt(F.substring_index(p, "=", 1))).alias("k"),
        F.when(F.instr(p, "=") > 0,
               wt(F.substr(p, F.instr(p, "=") + F.lit(1))))
        .otherwise(F.lit("")).alias("v")))

    def last_attr(key):
        return F.try_element_at(
            F.filter(kv, lambda x: (x["k"] == key) & (x["v"] != "")),
            F.lit(-1))["v"]

    dom = last_attr("domain")
    return (df.select(
        wt(F.substring_index(F.try_element_at(parts, F.lit(1)), "=", 1))
        .alias("c_name"),
        F.when(dom.isNotNull(),
               F.lower(F.regexp_replace(dom, r"^\.+", "")))
        .otherwise(F.col("host")).alias("c_domain"),
        F.coalesce(last_attr("path"), F.lit("/")).alias("c_path"),
        "seq", "idx", "sc", "host")
        .groupBy("c_name", "c_domain", "c_path")
        .agg(F.max(F.struct("seq", "idx", "sc", "host")).alias("o")))


def outbound_header_series(hosts, paths, cookies: list[Cookie], now: float | None = None):
    """Vectorized ``Cookie:`` header for a whole Arrow batch of (host, path)
    rows — the fetch-seam fast path (``getRequestOptions`` builds this header
    per queue item, ``lib/crawler.js:≈L1140–1230``). Semantics identical to
    ``CookieJar.outbound_header`` (crosscheck-tested); the loop is over the
    (config-scale, tiny) cookie list, never over rows."""
    import numpy as np
    import pandas as pd

    now = now or time.time()
    hl = hosts.fillna("").astype(str).str.lower().str.rstrip(".")
    pl = paths.fillna("/").astype(str)
    pl = pl.where(pl != "", "/")
    n = len(hl)
    out = np.full(n, "", dtype=object)
    # RFC 6265 §5.4 order: longer paths first, stable creation order on ties
    for c in sorted(cookies, key=lambda c: -len(c.path)):
        if c.expired(now):
            continue
        if c.domain == "*":
            dm = np.ones(n, dtype=bool)
        else:
            dm = ((hl == c.domain) | hl.str.endswith("." + c.domain)).to_numpy()
        sw = pl.str.startswith(c.path)
        if c.path.endswith("/"):
            pm = sw.to_numpy()
        else:
            nxt = pl.str[len(c.path)]
            pm = (sw & ((pl.str.len() == len(c.path)) | (nxt == "/"))).to_numpy()
        m = dm & pm
        if m.any():
            sep = np.where(out[m] == "", "", "; ")
            out[m] = out[m] + sep + c.header_pair()
    return pd.Series(out, index=hosts.index, dtype=object)
