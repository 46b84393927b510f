"""F1 — RFC-3986 URL canonicalization (reference: ``processURL``,
``lib/crawler.js:≈L740–820``, built on urijs ``absoluteTo().normalize()``).

Semantics implemented (urijs ``normalize()`` documented behavior):
  * resolve relative reference against the referrer URL (RFC 3986 §5)
  * lowercase scheme and host
  * strip default ports (http:80 / https:443)
  * remove dot-segments from the path
  * percent-decode unreserved characters; uppercase remaining %XX hex
  * drop the fragment (A.4: net effect identical whether stripped at cleanup
    or normalize stage)
  * empty path → "/"
  * optional ``stripQuerystring`` / ``sortQueryParameters`` / ``stripWWWDomain``

One pure-Python implementation (:func:`canonicalize_one`) is shared by the
single-threaded oracle and the Spark engine, so parity is by construction.
On the Spark side it runs inside an Arrow-batched pandas UDF
(:func:`canonicalize_series`) with a fully vectorized fast path: URLs that
are already canonical-shaped (regex test, the overwhelming majority in a real
crawl where links repeat site templates) skip the per-string slow path.

``url_hash`` is NOT computed here — the engine derives it JVM-side with the
built-in ``F.xxhash64(url_norm)`` so the hash never crosses into Python.
"""

from __future__ import annotations

import re
from urllib.parse import urljoin, urlsplit

import numpy as np
import pandas as pd

_UNRESERVED = set("ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789-._~")
_DEFAULT_PORT = {"http": 80, "https": 443}
_PCT_RE = re.compile(r"%([0-9A-Fa-f]{2})")

# Already-canonical shape: lowercase scheme+host, no default port, no %, no
# dot-segments, no fragment, non-empty path. Covers template-generated links.
_FAST_RE = re.compile(
    r"^(http|https)://[a-z0-9][a-z0-9.\-]*/(?:[A-Za-z0-9/_\-,;=&]|\.(?!\.?/|\.?$))*$"
)
# Simple absolute-path relative reference ("/a/b") — resolves to base origin
# + path with no normalization needed. The majority of real in-site links.
_FAST_ABSPATH_RE = re.compile(r"^/(?!/)(?:[A-Za-z0-9/_\-,;=&]|\.(?!\.?/|\.?$))*$")
_ORIGIN_RE = re.compile(r"^(https?://[a-z0-9][a-z0-9.\-]*)(?::(\d+))?(?=/|$)")
# Plain relative-path reference: no scheme/netloc/query/fragment/percent —
# RFC 3986 §5.3 merge reduces to basedir + ref (dot segments handled after).
# "//" inside a relative ref is excluded: urljoin (the slow-path authority)
# collapses empty segments there. ";" is fine: the scalar path shields it
# from urlparse's legacy params-splitting, so both paths keep it verbatim.
_REL_PATH_RE = re.compile(r"^(?!/)(?:[A-Za-z0-9_\-,;=&.]|/(?!/))+$")


def _pct_normalize(s: str) -> str:
    if "%" not in s:
        return s

    def repl(m: re.Match) -> str:
        ch = chr(int(m.group(1), 16))
        return ch if ch in _UNRESERVED else "%" + m.group(1).upper()

    return _PCT_RE.sub(repl, s)


def _remove_dot_segments(path: str) -> str:
    # RFC 3986 §5.2.4
    out: list[str] = []
    for seg in path.split("/"):
        if seg == ".":
            continue
        if seg == "..":
            if len(out) > 1:
                out.pop()
            continue
        out.append(seg)
    # preserve trailing slash for trailing "." / ".."
    if path.endswith(("/.", "/..")) and (not out or out[-1] != ""):
        out.append("")
    res = "/".join(out)
    if not res.startswith("/"):
        res = "/" + res
    return res


def _sort_query(q: str) -> str:
    if not q:
        return q
    return "&".join(sorted(q.split("&")))


def canonicalize_one(
    raw: str,
    base: str | None,
    strip_querystring: bool = False,
    sort_query_parameters: bool = False,
    strip_www_domain: bool = False,
) -> str | None:
    """Canonicalize one URL; returns None on parse failure (reference:
    ``processURL`` returns ``false``, A.7: silent)."""
    if raw is None:
        return None
    raw = raw.strip()
    if not raw:
        return None
    try:
        if base:
            # urljoin rides on urlparse, whose legacy params-splitting DROPS
            # a ";params" suffix on the reference's last path segment
            # ("/;" → "/"). RFC 3986 (and the reference's urijs absoluteTo())
            # treat ";" as an ordinary path character, so shield it with a
            # sentinel that cannot occur in a valid URL and restore it after
            # resolution. (Private-use codepoint: C0 controls are stripped by
            # urlsplit's WHATWG-style trim, so "\x01" would vanish.)
            _S = "\ue000"
            if (";" in base or ";" in raw) and _S not in base and _S not in raw:
                absolute = urljoin(base.replace(";", _S), raw.replace(";", _S))
                absolute = absolute.replace(_S, ";")
            else:
                # no ';' to shield \u2014 or the input genuinely contains the
                # sentinel codepoint, where shielding would corrupt it
                absolute = urljoin(base, raw)
        else:
            absolute = raw
        parts = urlsplit(absolute)
    except ValueError:
        return None
    scheme = parts.scheme.lower()
    if not scheme or not parts.netloc:
        return None
    host = (parts.hostname or "").lower()
    if not host:
        return None
    if strip_www_domain and host.startswith("www."):
        host = host[4:]
    try:
        port = parts.port
    except ValueError:
        return None
    netloc = host
    if port is not None and port != _DEFAULT_PORT.get(scheme):
        netloc = f"{host}:{port}"
    path = _pct_normalize(_remove_dot_segments(parts.path or "/"))
    query = "" if strip_querystring else _pct_normalize(parts.query)
    if query and sort_query_parameters:
        query = _sort_query(query)
    url = f"{scheme}://{netloc}{path}"
    if query:
        url += f"?{query}"
    return url


def split_host(url_norm: str) -> str:
    """Host (incl. non-default port) of a canonical URL — cheap split, no
    full parse needed post-canonicalization."""
    rest = url_norm.split("://", 1)[1]
    return rest.split("/", 1)[0]


def canonicalize_series(
    raw: pd.Series,
    base: pd.Series | None,
    strip_querystring: bool = False,
    sort_query_parameters: bool = False,
    strip_www_domain: bool = False,
) -> pd.Series:
    """Arrow-batch canonicalization: vectorized fast path + slow fallback.

    The fast path (regex, C-speed in pandas) accepts URLs already in
    canonical form — identity transform. Only the residue walks the pure-
    Python normalizer. Absolute-URL detection means ``base`` is only
    consulted on the slow path.
    """
    raw = raw.reset_index(drop=True).astype("object")
    if base is not None:
        base = base.reset_index(drop=True)
    n = len(raw)
    out = np.empty(n, dtype=object)
    notnull = raw.notna().to_numpy()
    fast = np.zeros(n, dtype=bool)
    if not strip_www_domain:
        fc = raw.fillna("")
        # step 0 — vectorized fragment strip: a canonical URL never keeps its
        # fragment, so dropping it up front is semantics-preserving and lets
        # "…#frag" links take the fast paths ("" residue falls to slow:
        # an all-fragment ref resolves to the base, which needs the full rule)
        if fc.str.contains("#", regex=False).any():
            fc = fc.str.replace(r"#.*$", "", regex=True)
        fast = fc.str.match(_FAST_RE).to_numpy() & notnull
        out[fast] = fc[fast].to_numpy()
        if base is not None:
            bstr = base.fillna("")
            origins = bstr.str.extract(r"^(https?://[^/]+)", expand=False)
            has_origin = origins.notna().to_numpy()
            # fast path 2: "/abs/path" against a canonical base → origin +
            # path (the referrer is always already canonical in-engine)
            rel = fc.str.match(_FAST_ABSPATH_RE).to_numpy() & notnull & ~fast
            ok = rel & has_origin
            if ok.any():
                out[ok] = (origins[ok] + fc[ok]).to_numpy()
                fast = fast | ok
            # fast path 3: protocol-relative "//host/path" + base scheme
            pr = fc.str.startswith("//").to_numpy() & notnull & ~fast & has_origin
            if pr.any():
                scheme = bstr.str.extract(r"^(https?)://", expand=False)
                cand = scheme[pr].fillna("") + ":" + fc[pr]
                okc = cand.str.match(_FAST_RE).to_numpy()
                idx = np.flatnonzero(pr)[okc]
                out[idx] = cand[okc].to_numpy()
                fast[idx] = True
            # fast path 4: plain relative path ("b/c", "../c", "./c") against
            # a canonical, query-less base — RFC 3986 §5.3 merge is a string
            # concat; dot segments (the only Python residue) are removed with
            # the exact shared _remove_dot_segments on the dotted subset only
            relm = (fc.str.match(_REL_PATH_RE).to_numpy() & notnull & ~fast
                    & has_origin
                    & bstr.str.match(r"^https?://[^/?#]+/").to_numpy()
                    & ~bstr.str.contains("?", regex=False).to_numpy())
            if relm.any():
                basedir = bstr[relm].str.replace(r"[^/]*$", "", regex=True)
                res_s = basedir + fc[relm]
                ridx = np.flatnonzero(relm)
                # basedir always ends "/", so dot segments can only appear as
                # a "/." substring — the dotted residue walks the exact shared
                # _remove_dot_segments; everything else is the concat itself
                dotted = res_s.str.contains("/.", regex=False).to_numpy()
                out[ridx[~dotted]] = res_s.to_numpy()[~dotted]
                resolved = res_s.to_numpy()
                for k in np.flatnonzero(dotted):
                    r = resolved[k]
                    o_end = r.index("/", r.index("://") + 3)
                    out[ridx[k]] = r[:o_end] + _remove_dot_segments(r[o_end:])
                fast[ridx] = True
    slow_idx = np.flatnonzero(notnull & ~fast)
    if len(slow_idx):
        rawv = raw.to_numpy()
        basev = base.to_numpy() if base is not None else None
        for i in slow_idx:
            out[i] = canonicalize_one(
                rawv[i],
                basev[i] if basev is not None else None,
                strip_querystring=strip_querystring,
                sort_query_parameters=sort_query_parameters,
                strip_www_domain=strip_www_domain,
            )
    return pd.Series(out)
