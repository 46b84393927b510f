"""Extension-implied MIME type — the queue-time guess behind the reference's
``fetchWhitelistedMimeTypesBelowMaxDepth`` depth allowance (``depthAllowed``,
``lib/crawler.js:≈L980–1000``): at admission time no Content-Type exists yet,
so the URL path's extension decides whether the resource *looks* whitelisted.

Shared by the Spark admission gate (as a Column expression built from the
same table) and the single-threaded oracle (``guess_mime``) — parity by
construction.
"""

from __future__ import annotations

import re

# deliberately small + deterministic (the node `mime` package's common web
# subset); unknown extensions → None (treated as HTML-ish, i.e. NOT granted
# the allowance unless text/html is whitelisted — matches the reference,
# which only extends depth for URLs that positively look whitelisted)
EXT_MIME: dict[str, str] = {
    "html": "text/html", "htm": "text/html", "txt": "text/plain",
    "css": "text/css", "csv": "text/csv", "md": "text/markdown",
    "xml": "application/xml", "rss": "application/rss+xml",
    "js": "application/javascript", "json": "application/json",
    "pdf": "application/pdf", "zip": "application/zip",
    "png": "image/png", "jpg": "image/jpeg", "jpeg": "image/jpeg",
    "gif": "image/gif", "webp": "image/webp", "svg": "image/svg+xml",
    "ico": "image/x-icon", "bmp": "image/bmp",
    "mp3": "audio/mpeg", "wav": "audio/wav", "ogg": "audio/ogg",
    "mp4": "video/mp4", "webm": "video/webm", "avi": "video/x-msvideo",
}

# extension = last dot-segment of the path (before any ?query/#fragment);
# one pattern string shared verbatim by Python re and Spark regexp_extract
EXT_PATTERN = r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+[^?#]*\.([A-Za-z0-9]{1,8})(?:[?#]|$)"
_EXT_RE = re.compile(EXT_PATTERN)


def guess_ext(url: str) -> str | None:
    m = _EXT_RE.match(url)
    return m.group(1).lower() if m else None


def guess_mime(url: str) -> str | None:
    """URL → extension-implied MIME type, or None if no/unknown extension."""
    ext = guess_ext(url)
    return EXT_MIME.get(ext) if ext else None
