"""Content-type detection for raw page payloads (S2, SURVEY.md §2.1).

The reference gates on filename extension plus the ``filetype`` magic-byte
library (/root/reference/app/main.py:221-236; requirements.txt:22). At
Common-Crawl scale urls lie, so we sniff payload bytes first and fall back to
the url extension. Pure Python; mirrored by a Catalyst expression in
``functions.expressions.sniff_content_type_expr`` for the DataFrame path.
"""

from __future__ import annotations

import re

_EXT_RE = re.compile(r"\.([A-Za-z0-9]+)(?:[?#].*)?$")

HTML_MARKERS = (b"<!doctype html", b"<html", b"<head", b"<body")


def sniff_content_type(payload: bytes, url: str = "") -> str:
    """Return one of: ``html``, ``pdf``, ``docx``, ``unknown``."""
    head = payload[:512].lstrip()[:256]
    low = head.lower()
    if low.startswith(b"%pdf-"):
        return "pdf"
    if payload[:4] == b"PK\x03\x04":
        # OOXML container; fixtures only produce docx-flavored zips.
        return "docx"
    # an explicit XML declaration routes to the crawl-metadata path
    # (sitemaps, feeds) — XML is structural data for operators/sitemap.py,
    # never page content for the extractor. Checked BEFORE the generic
    # '<' markup heuristic, which would otherwise claim it as html.
    if low.startswith(b"<?xml"):
        return "xml"
    if any(m in low for m in HTML_MARKERS) or low.startswith(b"<"):
        return "html"
    # BOM-prefixed markup (urls lie; UTF-16 bytes defeat the ASCII
    # marker scan above). Mirrored in sniff_content_type_expr.
    if payload[:4] in (b"\xff\xfe<\x00", b"\xfe\xff\x00<"):
        return "html"
    if payload[:4] == b"\xef\xbb\xbf<":
        return "html"
    m = _EXT_RE.search(url or "")
    ext = m.group(1).lower() if m else ""
    if ext in ("html", "htm", "xhtml"):
        return "html"
    if ext == "pdf":
        return "pdf"
    if ext == "docx":
        return "docx"
    return "unknown"
