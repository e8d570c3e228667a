"""Per-document wall-clock budget (round-4 verdict item 5).

The reference declared CONVERSION_TIMEOUT=300 but never enforced it
(/root/reference/app/main.py:208, dead config per SURVEY.md §2.11); the
engine enforces its budget cooperatively (extraction/deadline.py). These
tests pin the contract:

* a doc whose parse exceeds the budget flows through as a tagged
  ``error='timeout'`` row — per-doc failure, never a raised exception or
  a hung/killed task — on both the HTML and PDF paths;
* the budget is per-document: a timeout disarms cleanly and the next doc
  extracts normally;
* an unarmed or generous budget changes nothing byte-identical;
* the Spark stage surfaces timeouts in the `timeouts` accumulator and
  the lineage `timeout_count`.

Timing margins are ~1000x (a multi-second parse against a millisecond
budget and vice versa), so the assertions are stable under any load.
"""

from __future__ import annotations

import pytest

from document_converter_api_spark.extraction.core import extract_document
from document_converter_api_spark.extraction.deadline import (
    DocTimeBudgetError,
    arm,
    check,
    disarm,
)
from fixtures.genpages import build_minimal_pdf

# ~6 MB, ~1M tags: parses in seconds, far beyond a millisecond budget;
# well past the 4096-token check stride within the first millisecond.
SLOW_HTML = (b"<html><body><main>"
             + b"<p>word</p>" * 500_000
             + b"</main></body></html>")

FAST_HTML = b"<html><body><main><p>quick page</p></main></body></html>"


def test_html_timeout_is_tagged():
    res = extract_document(SLOW_HTML, "https://h.example/slow.html",
                           time_budget_s=0.005)
    assert res.error == "timeout"
    assert res.markdown is None


def test_budget_is_per_document():
    # a blown budget must disarm: the next doc starts a fresh budget
    res = extract_document(SLOW_HTML, "https://h.example/slow.html",
                           time_budget_s=0.005)
    assert res.error == "timeout"
    ok = extract_document(FAST_HTML, "https://h.example/fast.html",
                          time_budget_s=0.005)
    assert ok.error is None
    assert "quick page" in ok.markdown


def test_generous_budget_changes_nothing():
    unarmed = extract_document(FAST_HTML, "https://h.example/f.html")
    armed = extract_document(FAST_HTML, "https://h.example/f.html",
                             time_budget_s=300.0)
    assert unarmed.markdown == armed.markdown
    assert unarmed.error is None and armed.error is None


def test_pdf_timeout_is_tagged():
    # one page, ~200k content-stream tokens: the _iter_strings_and_ops
    # loop trips the strided check long before the parse completes
    lines = ["line %d" % i for i in range(40_000)]
    pdf = build_minimal_pdf([lines], [False])
    slow = extract_document(pdf, "https://h.example/slow.pdf",
                            time_budget_s=0.002)
    assert slow.error == "timeout"
    ok = extract_document(pdf, "https://h.example/slow.pdf",
                          time_budget_s=300.0)
    assert ok.error is None
    assert "line 39999" in ok.markdown


def test_deadline_primitives():
    # unarmed check is a no-op even when called a full stride's worth
    disarm()
    for _ in range(10_000):
        check()
    # nested arm keeps the outer deadline and reports not-armed
    assert arm(100.0) is True
    assert arm(0.0) is False  # would already be expired if it won
    for _ in range(10_000):
        check()  # outer 100 s budget — must not raise
    disarm()
    # an expired armed deadline raises at the stride boundary
    assert arm(-1.0) is True
    with pytest.raises(DocTimeBudgetError):
        for _ in range(10_000):
            check()
    disarm()


def test_spark_stage_counts_timeouts(spark):
    from document_converter_api_spark.operators.extract import run_extract
    from document_converter_api_spark.operators.metrics import (
        ExtractionMetrics,
    )
    from document_converter_api_spark.plans.pipeline import partition_metrics

    rows = [("https://h.example/slow.html", bytearray(SLOW_HTML), "en")]
    rows += [(f"https://h.example/fast{i}.html", bytearray(FAST_HTML), "en")
             for i in range(8)]
    pages = spark.createDataFrame(rows, "url string, html binary, lang string")
    valid = (pages
             .withColumn("content_type", pages.url.substr(0, 0).isNull()
                         .cast("string"))  # placeholder, replaced below
             )
    # go through the real gate so salt/content_type match production shape
    from document_converter_api_spark.operators.extract import prepare_pages
    valid, rejects = prepare_pages(pages)
    assert rejects.count() == 0
    metrics = ExtractionMetrics(spark)
    # 0.25 s budget: the 6 MB page parses in seconds, the tiny ones in
    # microseconds — three orders of magnitude on each side
    results = run_extract(valid, shuffle_partitions=4, metrics=metrics,
                          doc_time_budget_s=0.25).cache()
    try:
        out = {r["url"]: r["error"] for r in results.collect()}
        assert out["https://h.example/slow.html"] == "timeout"
        assert all(v is None for u, v in out.items() if u != "https://h.example/slow.html")
        assert metrics.timeouts.value == 1
        assert metrics.snapshot()["timeouts"] == 1
        lineage = partition_metrics(results)
        assert sum(r["timeout_count"] for r in lineage.collect()) == 1
    finally:
        results.unpersist()
