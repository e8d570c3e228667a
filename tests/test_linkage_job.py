"""Cross-crawl linkage job: exact/near/fresh verdict correctness, one
verdict row per new doc, threshold behavior, and idempotent reruns."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from jobs.linkage import link_crawl, run_linkage_job  # noqa: E402

_BODY = ("the quick brown fox jumps over the lazy dog while data "
         "pipelines shuffle partitions across a large spark cluster "
         "extracting markdown from crawled web pages at scale today")


def _frames(spark):
    hist = spark.createDataFrame(
        [(i, f"{_BODY} variant{i} " + " ".join(
            f"hw{i}x{j}" for j in range(10))) for i in range(10)],
        "doc_id long, text string")
    new = spark.createDataFrame(
        [
            # exact copy of history doc 3
            (100, f"{_BODY} variant3 " + " ".join(
                f"hw3x{j}" for j in range(10))),
            # near-dup of history doc 5: one word appended
            (101, f"{_BODY} variant5 " + " ".join(
                f"hw5x{j}" for j in range(10)) + " extraword"),
            # fresh: disjoint vocabulary
            (102, " ".join(f"zq{j}brand new{j} tokens only" for j in
                           range(12))),
        ],
        "doc_id long, text string")
    return hist, new


class TestLinkCrawl:
    def test_verdicts(self, spark):
        hist, new = _frames(spark)
        out = {r.doc_id: r for r in link_crawl(spark, hist, new).collect()}
        assert len(out) == 3
        assert out[100].verdict == "exact_dup"
        assert out[101].verdict == "near_dup"
        assert out[101].match_id == 5
        assert out[101].sig_agree >= 4
        assert out[102].verdict == "fresh"
        assert out[102].n_candidates == 0 and out[102].sig_agree == 0

    def test_min_agree_threshold_reclassifies(self, spark):
        """With an unreachable threshold the near-dup degrades to fresh —
        but keeps its candidate metadata for offline tuning."""
        hist, new = _frames(spark)
        out = {r.doc_id: r
               for r in link_crawl(spark, hist, new, min_agree=9).collect()}
        assert out[100].verdict == "exact_dup"   # exact unaffected
        assert out[101].verdict == "fresh"
        assert out[101].match_id == 5            # metadata preserved


class TestLinkageJob:
    def test_job_writes_and_reruns_idempotently(self, spark, tmp_path):
        hist, new = _frames(spark)
        hp, np_ = str(tmp_path / "hist.parquet"), str(tmp_path / "new.parquet")
        hist.write.parquet(hp)
        new.write.parquet(np_)
        root = str(tmp_path / "out")
        stats = run_linkage_job(spark, hp, np_, root, crawl_id="c1")
        assert stats["new_docs"] == 3
        assert stats["verdicts"] == {"exact_dup": 1, "near_dup": 1,
                                     "fresh": 1}
        from document_converter_api_spark.sources.tableio import (
            ManifestTable,
        )
        table = ManifestTable(os.path.join(root, "linkage"))
        rows1 = sorted(map(tuple, table.read(spark).collect()))
        # rerun with the same crawl id REPLACES, never duplicates
        run_linkage_job(spark, hp, np_, root, crawl_id="c1")
        rows2 = sorted(map(tuple, table.read(spark).collect()))
        assert rows1 == rows2
        # a second crawl id appends its own group
        run_linkage_job(spark, hp, np_, root, crawl_id="c2")
        assert table.read(spark).count() == 6
