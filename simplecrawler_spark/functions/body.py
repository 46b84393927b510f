"""F7 decompression + F6 charset decode — the response-body half of the
fetch seam.

Reference: ``decompressResponses`` (zlib ``unzip`` of gzip/deflate bodies,
``gziperror`` event on failure, ``lib/crawler.js:≈L1560–1600``) and
``decodeResponses`` (iconv-lite decode using the charset from Content-Type
or a sniffed ``<meta charset>``, ``lib/crawler.js:≈L1600–1660``). In table
mode the corpus stores decoded bodies, so these run only on the real-fetch
path (``http_fetch``) and in HTML discovery mode — but they are REAL,
tested implementations here (Python stdlib zlib + codecs), not stubs: on a
cluster the seam calls them unchanged.

Both are pandas-Series batch functions (the per-row work is C-level zlib /
codecs calls on bytes; no per-row *Python logic* beyond dispatch), shaped
for use inside ``mapInPandas`` alongside the link-discovery pass.
"""

from __future__ import annotations

import codecs
import re
import zlib

import pandas as pd

# charset=... parameter in a Content-Type header (RFC 9110 §8.3)
_HDR_CHARSET = re.compile(r"charset\s*=\s*[\"']?([\w.-]+)", re.I)
# sniffed from the first bytes of the body, in the reference's order:
# <meta charset=...>, <meta http-equiv=content-type ... charset=...>,
# then an XML declaration encoding
_META_SNIFF = [
    re.compile(rb"<meta[^>]+charset\s*=\s*[\"']?([\w.-]+)", re.I),
    re.compile(rb"<\?xml[^>]+encoding\s*=\s*[\"']([\w.-]+)[\"']", re.I),
]
_SNIFF_WINDOW = 1024


def decompress_one(data: bytes | None, content_encoding: str | None) -> tuple[bytes | None, bool]:
    """(body, ok). gzip / deflate (zlib-wrapped or raw) / identity.
    ``ok=False`` ⇒ the reference's ``gziperror`` event (body passed through
    untouched, as the reference does after emitting)."""
    if data is None:
        return None, True
    enc = (content_encoding or "").strip().lower()
    if enc in ("", "identity", "none"):
        return data, True
    try:
        if enc == "gzip" or enc == "x-gzip":
            return zlib.decompress(data, wbits=zlib.MAX_WBITS | 16), True
        if enc == "deflate":
            try:
                return zlib.decompress(data), True  # zlib-wrapped (RFC 9110)
            except zlib.error:
                return zlib.decompress(data, wbits=-zlib.MAX_WBITS), True  # raw
    except zlib.error:
        return data, False
    return data, False  # unknown coding (br, zstd: no lib in-sandbox)


def sniff_charset(data: bytes | None, content_type: str | None) -> str:
    """Charset resolution in the reference's order: Content-Type header
    param → sniffed ``<meta charset>`` / XML declaration → utf-8."""
    if content_type:
        m = _HDR_CHARSET.search(content_type)
        if m:
            return m.group(1).lower()
    if data:
        head = data[:_SNIFF_WINDOW]
        for rx in _META_SNIFF:
            m = rx.search(head)
            if m:
                return m.group(1).decode("ascii", "ignore").lower()
    return "utf-8"


def decode_one(data: bytes | None, content_type: str | None) -> str | None:
    """F6 — bytes → str using the sniffed charset; unknown charsets fall
    back to utf-8; undecodable bytes are replaced (the iconv-lite lenient
    default)."""
    if data is None:
        return None
    cs = sniff_charset(data, content_type)
    try:
        codecs.lookup(cs)
    except LookupError:
        cs = "utf-8"
    return data.decode(cs, errors="replace")


def decompress_series(data: pd.Series, content_encoding: pd.Series) -> tuple[pd.Series, pd.Series]:
    """Vectorized F7 over an Arrow batch: returns (bodies, gzip_ok).
    Rows with ``ok=False`` count toward the ``gziperror`` event."""
    out, ok = [], []
    for d, e in zip(data, content_encoding):
        b, good = decompress_one(d, e)
        out.append(b)
        ok.append(good)
    return (pd.Series(out, index=data.index, dtype="object"),
            pd.Series(ok, index=data.index, dtype="bool"))


def decode_series(data: pd.Series, content_type: pd.Series) -> pd.Series:
    """Vectorized F6 over an Arrow batch: bytes → decoded text."""
    return pd.Series(
        [decode_one(d, ct) for d, ct in zip(data, content_type)],
        index=data.index, dtype="object")
