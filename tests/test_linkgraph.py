"""WAT-tier link extraction: resolution semantics, oracle-constant pins,
plan shape, and PageRank invariants.

The reference service (/root/reference/app/main.py) has no link stage;
this tier is the Common Crawl WAT product (outlinks + host graph +
domain ranking) the SURVEY's webtext scope calls for.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from document_converter_api_spark.operators import linkgraph as L


@pytest.fixture(scope="module")
def pages(spark):
    return L._pages_df(spark)


class TestLinkExtract:
    def test_every_link_resolves_to_a_host(self, spark, pages):
        links = L.extract_links(pages)
        bad = links.filter((F.col("dst_host") == "")
                           | F.col("dst_host").isNull()).count()
        assert bad == 0

    def test_relative_links_resolve_to_own_host(self, spark, pages):
        links = L.extract_links(pages)
        rel = links.filter(~F.col("link").startswith("http"))
        mismatch = rel.filter(F.col("dst_host") != F.col("src_host")).count()
        assert mismatch == 0
        assert rel.count() > 0

    def test_absolute_links_hit_ref_example_or_self(self, spark, pages):
        """Absolute targets are the content citation (ref.example) or
        the page's own self-permalink (src host) — nothing else."""
        links = L.extract_links(pages)
        ext = links.filter(F.col("link").startswith("http"))
        cross = ext.filter(F.col("dst_host") != F.col("src_host"))
        hosts = {r.dst_host
                 for r in cross.select("dst_host").distinct().collect()}
        assert hosts == {"ref.example"}
        # self-permalinks exist and resolve internal
        assert ext.filter(F.col("dst_host") == F.col("src_host")).count() > 0

    def test_internal_flag_matches_host_equality(self, spark, pages):
        links = L.extract_links(pages)
        bad = links.filter(F.col("internal")
                           != (F.col("src_host") == F.col("dst_host"))).count()
        assert bad == 0

    def test_only_html_rows_contribute(self, spark, pages):
        links = L.extract_links(pages)
        non_html = links.filter(~F.col("url").endswith(".html")).count()
        assert non_html == 0

    def test_extraction_is_pure_catalyst(self, spark, pages):
        """The extract stage must be a codegen'd scan projection — no
        Python eval nodes, no shuffle before the explode."""
        plan = L.extract_links(pages)._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan
        assert "Exchange" not in plan


class TestAnchorZip:
    def test_href_and_anchor_captures_align(self, spark, pages):
        """Both capture groups come from the SAME pattern, so the two
        extract_all arrays must have identical lengths on every page —
        the precondition that makes positional arrays_zip sound."""
        page = F.decode("html", "UTF-8")
        n_bad = (pages
                 .select(F.size(F.regexp_extract_all(
                             page, F.lit(L.ANCHOR_RE), 1)).alias("a"),
                         F.size(F.regexp_extract_all(
                             page, F.lit(L.ANCHOR_RE), 2)).alias("b"))
                 .filter(F.col("a") != F.col("b")).count())
        assert n_bad == 0

    def test_anchor_counts_positive(self, spark, sf_dir="/root/testdata/sf0.01"):
        out = L.q_anchor_stats(spark, sf_dir)
        assert out.filter(F.col("n_links") < 3).count() == 0
        assert out.count() > 0


class TestHostGraph:
    def test_edge_counts_cover_all_links(self, spark, pages):
        links = L.extract_links(pages)
        edges = L.host_linkgraph(pages)
        total_links = links.count()
        agg = edges.agg(F.sum("n_links").alias("s")).collect()[0].s
        assert agg == total_links

    def test_n_pages_bounded_by_n_links(self, spark, pages):
        edges = L.host_linkgraph(pages)
        assert edges.filter(F.col("n_pages") > F.col("n_links")).count() == 0


class TestLinkPagerank:
    def test_node_count_matches_oracle_constant(self, spark, pages):
        """The DuckDB oracle interpolates n_nodes=16 (see
        __spark_entry__.oracle_sql). If the fixture corpus is ever
        regenerated this pin catches the drift before the oracle does."""
        edges = (L.extract_links(pages)
                 .select("src_host", "dst_host")
                 .filter(F.col("src_host") != F.col("dst_host"))
                 .distinct())
        nodes = (edges.select(F.col("src_host").alias("id"))
                 .unionAll(edges.select(F.col("dst_host").alias("id")))
                 .distinct())
        assert nodes.count() == 16

    def test_rank_mass_and_dangling(self, spark):
        out = L.q_link_pagerank(spark, "/root/testdata/sf0.01")
        rows = out.collect()
        assert len(rows) == 16
        total = sum(r.pagerank for r in rows)
        # dangling mass evaporates: sum < 1 but > bare teleport mass
        assert L.LPR_TELEPORT - 0.01 < total < 1.0 + 1e-9
        assert all(r.pagerank > 0 for r in rows)
        # ref.example is the dangling sink with the most in-links — it
        # must hold the highest rank and out_deg 0
        top = max(rows, key=lambda r: r.pagerank)
        assert top.host == "ref.example"
        assert top.out_deg == 0


class TestFrontierDiscovery:
    @pytest.fixture(scope="class")
    def frontier(self, spark):
        return L.q_frontier_discovery(spark, "/root/testdata/sf0.01").collect()

    def test_antijoin_removes_crawled_permalinks(self, spark, frontier):
        """~60% of fixture pages carry a self-permalink anchor that IS a
        crawled url — the anti-join must remove every one of them."""
        pages = L._pages_df(spark)
        crawled = {r.url for r in pages.select("url").collect()}
        # the raw resolved-target set genuinely overlaps the crawl...
        raw = L.extract_links(pages).select("link").collect()
        overlap = sum(1 for r in raw if r.link in crawled)
        assert overlap > 0
        # ...and nothing in the frontier is already crawled
        for r in frontier:
            assert r.first_url not in crawled

    def test_counts_are_consistent(self, frontier):
        assert len(frontier) > 0
        for r in frontier:
            assert r.n_urls >= 1 and r.n_sources >= 1
        sizes = [r.n_urls for r in frontier]
        assert sizes == sorted(sizes, reverse=True)

    def test_plan_is_distributed_anti_join(self, spark):
        plan = (L.q_frontier_discovery(spark, "/root/testdata/sf0.01")
                ._jdf.queryExecution().executedPlan().toString())
        assert "LeftAnti" in plan
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
