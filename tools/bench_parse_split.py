"""Per-class parse-cost split over the bench corpus (round-4 bench
hygiene, VERDICT r3 item 9).

Round 3 saw parse-core CPU roughly double (21.0 s -> 49.7 s per corpus
pass) when the corpus simultaneously gained (a) inline-decrypted PDFs and
(b) the legacy-charset/head-extras HTML content. This tool attributes the
cost: it times ``extract_document`` single-threaded over each payload
class separately, so the BENCH/BASELINE.md optimization log can state how
much is decryption vs charset-tier vs baseline parsing.

Usage: python tools/bench_parse_split.py [pages_parquet] [--limit N]
Prints one JSON line: per-class {docs, total_s, ms_per_doc}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow.parquet as pq  # noqa: E402

from document_converter_api_spark.extraction.core import (  # noqa: E402
    extract_document,
)


def classify(url: str, payload: bytes) -> str:
    if url.endswith(".pdf"):
        if b"/Encrypt" not in payload:
            return "pdf_plain"
        if b"/AESV3" in payload:
            return "pdf_aesv3"
        if b"/AESV2" in payload:
            return "pdf_aesv2"
        return "pdf_rc4"
    if url.endswith(".htm"):
        return "html_legacy_charset"
    if url.endswith(".html"):
        return "html_utf8"
    if url.endswith(".docx"):
        return "docx"
    return "other"


def main() -> None:
    path = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith(
        "--") else os.path.join("fixtures", "data", "pages_bench.parquet")
    limit = None
    if "--limit" in sys.argv:
        limit = int(sys.argv[sys.argv.index("--limit") + 1])
    tab = pq.read_table(path, columns=["url", "html"])
    rows = list(zip(tab["url"].to_pylist(), tab["html"].to_pylist()))
    if limit:
        rows = rows[:limit]
    by_class: dict[str, list] = {}
    for url, payload in rows:
        by_class.setdefault(classify(url, payload), []).append((url, payload))
    out = {}
    for cls in sorted(by_class):
        docs = by_class[cls]
        t0 = time.perf_counter()
        for url, payload in docs:
            extract_document(payload, url)
        dt = time.perf_counter() - t0
        out[cls] = {"docs": len(docs), "total_s": round(dt, 3),
                    "ms_per_doc": round(dt * 1000 / len(docs), 3)}
    print(json.dumps({"corpus": path, "classes": out}))


if __name__ == "__main__":
    main()
