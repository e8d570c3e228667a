"""Extraction core: per-document dispatch (U1) over HTML/PDF/DOCX payloads.

This is the single-process reference extractor (SURVEY.md §5.2.1): the golden
fixtures are produced by calling :func:`extract_document` directly, and the
Spark ``mapInArrow`` stage (operators/extract.py) wraps the *same function*,
so byte-identity per url between the distributed pipeline and the goldens is
the Arrow/transport-fidelity property under test — not a reimplementation
diff.

Mirrors the reference conversion entry (/root/reference/app/main.py:383-391):
convert → ``.text_content``; failures are captured, never raised
(app/main.py:438-441 — a failed doc must not kill the job).
"""

from __future__ import annotations

from dataclasses import dataclass

from .docx import docx_to_markdown
from .markdown import html_to_markdown
from .pdf import PdfEncryptedError, PdfNeedsOcrError, pdf_to_text
from .sniff import sniff_content_type


@dataclass
class ExtractResult:
    markdown: str | None
    error: str | None


def decode_payload(payload: bytes) -> str:
    """Bytes → text for HTML payloads: utf-8 with latin-1 fallback (never
    fails; Common-Crawl reality)."""
    try:
        return payload.decode("utf-8")
    except UnicodeDecodeError:
        return payload.decode("latin-1")


def extract_document(payload: bytes, url: str = "",
                     content_type: str | None = None) -> ExtractResult:
    """U1 dispatch: route by sniffed content type, extract, capture errors."""
    try:
        ctype = content_type or sniff_content_type(payload, url)
        if ctype == "html":
            return ExtractResult(html_to_markdown(decode_payload(payload)), None)
        if ctype == "pdf":
            return ExtractResult(pdf_to_text(payload), None)
        if ctype == "docx":
            return ExtractResult(docx_to_markdown(payload), None)
        return ExtractResult(None, f"unsupported_content_type:{ctype}")
    except PdfNeedsOcrError:
        # detected-and-tagged reject (stable code, filterable downstream) —
        # the reference OCRs these via tesseract, unavailable in-sandbox
        return ExtractResult(None, "needs_ocr")
    except PdfEncryptedError:
        # the reference decrypts via qpdf; we tag instead of garbling
        return ExtractResult(None, "encrypted")
    except Exception as exc:  # noqa: BLE001 — doc failure must not kill the job
        return ExtractResult(None, f"{type(exc).__name__}: {exc}"[:500])
