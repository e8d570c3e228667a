"""End-to-end crawl→training-corpus job: crawl-control gate effects,
extraction feed-through, curation composition, and rerun determinism.

Also unit-pins ``headtags.crawl_gate``'s keep rules on a synthetic
mini-crawl where every rule fires exactly once.
"""

from __future__ import annotations

import os
import re
import sys

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from document_converter_api_spark.operators.headtags import crawl_gate  # noqa: E402
from document_converter_api_spark.operators.linkgraph import pages_path  # noqa: E402
from jobs.webcorpus import run_webcorpus_job  # noqa: E402

PAGES = pages_path()


def _mini_pages(spark):
    def html(head: str) -> bytes:
        return f"<html><head>{head}</head><body><p>x</p></body></html>".encode()

    rows = [
        # plain page — keeps
        ("https://a.ex/p1.html", html("")),
        # noindex — drops
        ("https://a.ex/p2.html",
         html('<meta name="robots" content="noindex, follow">')),
        # self-canonical — keeps
        ("https://a.ex/p3.html",
         html('<link rel="canonical" href="https://a.ex/p3.html">')),
        # cross-canonical to a CRAWLED target — drops (p1 survives)
        ("https://a.ex/p4.html",
         html('<link rel="canonical" href="https://a.ex/p1.html">')),
        # cross-canonical cluster, UNCRAWLED target — exactly one keeps
        ("https://a.ex/p5.html",
         html('<link rel="canonical" href="https://a.ex/c1">')),
        ("https://a.ex/p6.html",
         html('<link rel="canonical" href="https://a.ex/c1">')),
        # nofollow alone never costs the page — keeps
        ("https://a.ex/p7.html",
         html('<meta name="robots" content="index, nofollow">')),
        # cross-canonical to a CRAWLED-but-DROPPED target (p9 is
        # noindex): the cluster must keep a representative — p8
        ("https://a.ex/p8.html",
         html('<link rel="canonical" href="https://a.ex/p9.html">')),
        ("https://a.ex/p9.html",
         html('<meta name="robots" content="noindex">')),
    ]
    return spark.createDataFrame(rows, "url string, html binary")


class TestCrawlGate:
    def test_every_rule_fires(self, spark):
        kept = {r.url for r in crawl_gate(_mini_pages(spark)).collect()}
        assert kept == {
            "https://a.ex/p1.html",   # plain
            "https://a.ex/p3.html",   # self-canonical
            "https://a.ex/p5.html",   # min-url cluster representative
            "https://a.ex/p7.html",   # nofollow-only
            "https://a.ex/p8.html",   # target crawled but noindex —
                                      # cluster keeps a representative
        }

    def test_chain_collapses_to_one_survivor(self, spark):
        """A→B→C with C plain: the whole canonical chain is ONE
        duplicate cluster — only C survives (the round-3 single-hop
        rule kept B as rep-of-C and A as rep-of-B: three near-dup
        survivors where the site declared one document)."""
        def html(head: str) -> bytes:
            return f"<html><head>{head}</head><body><p>x</p></body></html>".encode()

        rows = [
            ("https://c.ex/a.html",
             html('<link rel="canonical" href="https://c.ex/b.html">')),
            ("https://c.ex/b.html",
             html('<link rel="canonical" href="https://c.ex/c.html">')),
            ("https://c.ex/c.html", html("")),
        ]
        pages = spark.createDataFrame(rows, "url string, html binary")
        kept = {r.url for r in crawl_gate(pages).collect()}
        assert kept == {"https://c.ex/c.html"}

    def test_chain_to_uncrawled_keeps_exactly_one(self, spark):
        """A→B→C with C never crawled: one representative for the whole
        component (min crawled url), not one per hop."""
        def html(head: str) -> bytes:
            return f"<html><head>{head}</head><body><p>x</p></body></html>".encode()

        rows = [
            ("https://c.ex/a.html",
             html('<link rel="canonical" href="https://c.ex/b.html">')),
            ("https://c.ex/b.html",
             html('<link rel="canonical" href="https://c.ex/zz-uncrawled">')),
        ]
        pages = spark.createDataFrame(rows, "url string, html binary")
        kept = {r.url for r in crawl_gate(pages).collect()}
        assert kept == {"https://c.ex/a.html"}

    def test_canonical_cycle_never_vanishes(self, spark):
        """A→B and B→A (a canonical cycle, common misconfiguration):
        the component has no self-survivor, so exactly one
        representative is kept — the cluster must not vanish."""
        def html(head: str) -> bytes:
            return f"<html><head>{head}</head><body><p>x</p></body></html>".encode()

        rows = [
            ("https://c.ex/a.html",
             html('<link rel="canonical" href="https://c.ex/b.html">')),
            ("https://c.ex/b.html",
             html('<link rel="canonical" href="https://c.ex/a.html">')),
        ]
        pages = spark.createDataFrame(rows, "url string, html binary")
        kept = {r.url for r in crawl_gate(pages).collect()}
        assert kept == {"https://c.ex/a.html"}

    def test_legacy_bytes_never_error_the_gate(self, spark):
        """UTF-16/cp1252 payloads flow through the ISO-8859-1 flag scan
        (the fixture .htm rows all reach the gate's output or drop by
        rule, never by exception)."""
        pages = spark.read.parquet(PAGES)
        out = crawl_gate(pages)
        n = out.count()
        assert 0 < n <= pages.count()
        # binary rows (pdf/jpg/zip) pass through untouched
        exts = {r.url.rsplit(".", 1)[1]
                for r in out.select("url").collect()}
        assert "pdf" in exts and "htm" in exts

    def test_schema_preserved(self, spark):
        pages = spark.read.parquet(PAGES)
        assert crawl_gate(pages).columns == pages.columns

    def test_plan_shape(self, spark):
        """Anti for the orphan-cluster pick, semi to re-admit the
        representatives; no Python, no nested-loop — the majority path
        is a pure scan filter."""
        plan = (crawl_gate(spark.read.parquet(PAGES))
                ._jdf.queryExecution().executedPlan().toString())
        assert "LeftAnti" in plan and "LeftSemi" in plan
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


class TestWebcorpusJob:
    @pytest.fixture(scope="class")
    def result(self, spark, tmp_path_factory):
        root = str(tmp_path_factory.mktemp("webcorpus"))
        stats = run_webcorpus_job(spark, PAGES, root, langs=("en",))
        return root, stats

    def test_stage_counts_chain(self, result):
        root, stats = result
        ex = stats["extraction"]
        gated = ex["docs"] + ex["failures"]
        assert 0 < gated < stats["input_pages"]   # the gate really drops
        assert 0 < stats["extracted_docs"] <= ex["docs"]
        assert stats["curated_docs"] > 0
        assert stats["curated_docs"] <= stats["extracted_docs"]
        assert ex["resumed"] is False and ex["skipped_partitions"] == 0

    def test_gate_ran_before_extraction(self, spark, result):
        """No noindex page's url appears in the extracted table."""
        root, _ = result
        t = pq.read_table(PAGES)
        noindex = {u for u, h in zip(t["url"].to_pylist(),
                                     t["html"].to_pylist())
                   if u.endswith(".html")
                   and b'content="noindex' in h}
        assert noindex
        extracted = {r.url for r in spark.read.parquet(
            os.path.join(root, "extracted")).select("url").collect()}
        assert not (noindex & extracted)

    def test_legacy_pages_reach_the_corpus(self, spark, result):
        """Charset tier end to end: surviving .htm pages extract and
        carry their restored accents into the corpus text."""
        root, _ = result
        rows = (spark.read.parquet(os.path.join(root, "extracted"))
                .filter(F.col("url").endswith(".htm")).collect())
        assert rows, "no legacy page survived the gate — fixture drift?"
        assert any(re.search("[üáéíö]", r.text) for r in rows)

    def test_rerun_is_deterministic(self, spark, result, tmp_path):
        root1, stats1 = result
        root2 = str(tmp_path / "again")
        stats2 = run_webcorpus_job(spark, PAGES, root2, langs=("en",))
        assert stats1 == stats2

    def test_resume_skips_extraction(self, spark, result):
        """Re-submitting with the SAME output root resumes: every
        extraction partition skips, and the curated corpus is
        byte-stable (idempotent per-split replace)."""
        root, stats1 = result
        stats2 = run_webcorpus_job(spark, PAGES, root, langs=("en",))
        ex = stats2["extraction"]
        assert ex["resumed"] is True
        assert ex["skipped_partitions"] == 64
        assert ex["processed_partitions"] == 0
        assert stats2["extracted_docs"] == stats1["extracted_docs"]
        assert stats2["splits"] == stats1["splits"]
