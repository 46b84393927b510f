"""F2/F3 — link extraction + cleanup (reference: ``discoverResources``
``lib/crawler.js:≈L900–950``, defaults ``:≈L400–440``;
``cleanExpandResources`` ``:≈L830–900``).

Two modes:
  * **table mode** (in-sandbox default): the synthetic ``web`` table already
    carries raw link lists; only cleanup applies (:func:`clean_expand_series`).
  * **HTML mode**: :func:`discover_resources` applies the reference's six
    default regexes to body text (user-overridable, same extension point as
    the reference's documented ``discoverResources`` override).

Cleanup semantics (F3): strip ``href=``/``src=``/``url(`` wrappers and
quotes, decode HTML entities, fix protocol-relative ``//host`` with the
parent scheme, drop empties / ``mailto:`` / bare ``javascript:``, resolve +
canonicalize against the page URL (F1), and **order-preserving first-wins
in-page dedupe** (matches the reference's array scan order — crawl-order
parity depends on this).

Vectorization: link arrays for a whole Arrow batch are flattened to one flat
string series, canonicalized with the F1 fast path, then regrouped by
offsets — no per-page Python in the common case.
"""

from __future__ import annotations

import html
import re

import numpy as np
import pandas as pd

from simplecrawler_spark.functions.canonicalize import canonicalize_series

# The six default discoverRegex patterns (crawler.js:≈L400–440), re-flavored.
DISCOVER_REGEXES: list[re.Pattern] = [
    re.compile(r"""\s(?:href|src)\s?=\s?(["']).*?\1""", re.I),
    re.compile(r"""\s(?:href|src)\s?=\s?[^"'\s][^\s>]+""", re.I),
    re.compile(r"""\s?url\((["']).*?\1\)""", re.I),
    re.compile(r"""\s?url\([^"')]*\)""", re.I),
    re.compile(r"""https?://[^?\s><'"]+"""),
    re.compile(r"""url\(["']?([^"')]*)["']?\)""", re.I),
]

_COMMENT_RE = re.compile(r"<!--.*?-->", re.S)
_SCRIPT_RE = re.compile(r"<script\b.*?</script\s*>", re.S | re.I)
_WRAPPER_RE = re.compile(r"""^\s*(?:href|src)\s?=\s?|^\s*url\(|\)$""", re.I)
_QUOTE_RE = re.compile(r"""^["']|["']$""")


def discover_resources(
    body: str,
    regexes: list[re.Pattern] | None = None,
    parse_html_comments: bool = True,
    parse_script_tags: bool = True,
) -> list[str]:
    """Raw match list per the reference's regex-over-body strategy."""
    if not parse_html_comments:
        body = _COMMENT_RE.sub("", body)
    if not parse_script_tags:
        body = _SCRIPT_RE.sub("", body)
    found: list[str] = []
    for rx in regexes or DISCOVER_REGEXES:
        for m in rx.finditer(body):
            found.append(m.group(0))
    return found


def _strip_wrapper(s: str) -> str:
    s = _WRAPPER_RE.sub("", s.strip())
    return _QUOTE_RE.sub("", s.strip())


_AMP_ONLY = re.compile(r"&(amp|lt|gt|quot|#\d+|#x[0-9a-fA-F]+);")


def _clean_raw(s: str) -> str | None:
    """Wrapper-strip + entity-decode + cheap drops; returns None to discard."""
    s = _strip_wrapper(s)
    if "&" in s and _AMP_ONLY.search(s):
        s = html.unescape(s)
    if not s or s.startswith("#"):
        return None
    low = s[:12].lower()
    if low.startswith(("mailto:", "javascript:", "data:", "tel:")):
        return None
    return s


def clean_expand_series(
    links: pd.Series,
    base: pd.Series,
    strip_querystring: bool = False,
    sort_query_parameters: bool = False,
    strip_www_domain: bool = False,
) -> pd.Series:
    """Per-page raw link arrays → canonical, in-page-deduped link arrays.

    Flatten → vectorized canonicalize (F1 fast path) → regroup → first-wins
    dedupe per page. Returns a Series of list[str].
    """
    lists = [l if l is not None else [] for l in links]
    lens = np.fromiter((len(l) for l in lists), dtype=np.int64, count=len(lists))
    if lens.sum() == 0:
        return pd.Series([[] for _ in lists])
    flat_raw: list[str | None] = []
    flat_base: list[str] = []
    basev = base.to_numpy()
    for i, l in enumerate(lists):
        for s in l:
            flat_raw.append(_clean_raw(s) if s is not None else None)
            flat_base.append(basev[i])
    canon = canonicalize_series(
        pd.Series(flat_raw, dtype=object),
        pd.Series(flat_base, dtype=object),
        strip_querystring=strip_querystring,
        sort_query_parameters=sort_query_parameters,
        strip_www_domain=strip_www_domain,
    ).to_numpy()
    out, pos = [], 0
    for n in lens:
        seen: set[str] = set()
        page: list[str] = []
        for u in canon[pos : pos + n]:
            if u is not None and u not in seen:
                seen.add(u)
                page.append(u)
        out.append(page)
        pos += int(n)
    return pd.Series(out)
