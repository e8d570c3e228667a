"""Head-tags tier: index-eligibility gate semantics, canonical-URL
cluster invariants, structured-data consistency, and plan purity.

The reference service (/root/reference/app/main.py) converts single
uploads and has no crawl-control metadata; this tier is the robots /
canonical / OpenGraph / JSON-LD surface a Common-Crawl-scale pipeline
consults before any content processing (see operators/headtags.py).
Ground truth is recomputed in pure Python from the fixture bytes so
the Spark regexp chain is pinned against an independent reading.
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from document_converter_api_spark.operators import headtags as H
from document_converter_api_spark.operators.linkgraph import _pages_df

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def raw_pages(spark):
    """(url, html-bytes) for every html fixture page."""
    return [(r.url, bytes(r.html))
            for r in _pages_df(spark).select("url", "html").collect()]


@pytest.fixture(scope="module")
def gate(spark):
    return H.q_index_gate(spark, SF).collect()


@pytest.fixture(scope="module")
def clusters(spark):
    return H.q_canonical_clusters(spark, SF).collect()


@pytest.fixture(scope="module")
def sdata(spark):
    return H.q_structured_data(spark, SF).collect()


def _py_flags(url: str, html: bytes):
    page = html.decode("utf-8")
    robots = re.search(r'<meta name="robots" content="([^"]+)">', page)
    canon = re.search(r'<link rel="canonical" href="([^"]+)">', page)
    robots = robots.group(1) if robots else ""
    canon = canon.group(1) if canon else ""
    noindex = "noindex" in robots
    cross = canon != "" and canon != url
    return robots, canon, noindex, cross


class TestIndexGate:
    def test_counts_match_python_recompute(self, raw_pages, gate):
        """Host-level counts equal an independent pure-Python pass."""
        exp: dict[str, list[int]] = {}
        for url, html in raw_pages:
            host = re.match(r"^https?://([^/]+)", url).group(1)
            robots, canon, noindex, cross = _py_flags(url, html)
            row = exp.setdefault(host, [0, 0, 0, 0])
            row[0] += 1
            row[1] += int(noindex)
            row[2] += int(cross)
            row[3] += int(not noindex and not cross)
        got = {r.host: [r.n_pages, r.n_noindex, r.n_cross_canon,
                        r.n_indexable] for r in gate}
        assert got == exp

    def test_gate_partitions_the_corpus(self, gate):
        """The fixture mixes all three robots variants: every host has
        indexable pages, and the corpus has a real excluded residue."""
        assert sum(r.n_pages for r in gate) > 0
        # the bulk of the corpus stays indexable (tiny tail hosts can
        # land all-noindex by chance; the corpus-level rate cannot)
        total = sum(r.n_pages for r in gate)
        idx = sum(r.n_indexable for r in gate)
        assert 0.5 < idx / total < 1.0
        assert sum(r.n_noindex for r in gate) > 0
        assert sum(r.n_cross_canon for r in gate) > 0
        for r in gate:
            assert 0.0 <= r.indexable_rate <= 1.0
            assert r.n_indexable <= r.n_pages

    def test_noindex_and_canonical_are_independent_signals(self, gate):
        # nofollow alone never costs indexability
        assert all(r.n_indexable >= r.n_pages - r.n_noindex - r.n_cross_canon
                   for r in gate)


class TestCanonicalClusters:
    def test_every_cluster_is_real(self, raw_pages, clusters):
        """Cluster sizes equal the number of fixture pages declaring
        that canonical target; representative is the min member url."""
        by_target: dict[str, list[str]] = {}
        for url, html in raw_pages:
            _, canon, _, _ = _py_flags(url, html)
            if canon:
                by_target.setdefault(canon, []).append(url)
        exp = {t: us for t, us in by_target.items() if len(us) >= 2}
        got = {r.canonical: r for r in clusters}
        assert set(got) == set(exp)
        for t, us in exp.items():
            assert got[t].cluster_size == len(us)
            assert got[t].representative == min(us)

    def test_clusters_exist_and_are_sorted(self, clusters):
        assert len(clusters) >= 1
        sizes = [r.cluster_size for r in clusters]
        assert sizes == sorted(sizes, reverse=True)
        assert all(s >= 2 for s in sizes)

    def test_url_dedup_never_reads_body_bytes(self, spark):
        """The cluster plan projects only url+html-head regexps — the
        aggregate carries (canonical, url), never the payload column."""
        plan = (H.q_canonical_clusters(spark, SF)
                ._jdf.queryExecution().executedPlan().toString())
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan


class TestStructuredData:
    def test_publisher_title_consistency(self, sdata):
        """The fixture writes og:title from the real <title>, so the
        consistency flag is True wherever OpenGraph is present."""
        assert len(sdata) > 0
        og_rows = [r for r in sdata if r.og_title != ""]
        assert len(og_rows) > 0
        assert all(r.og_matches_title is True for r in og_rows)
        assert all(r.og_matches_title is None
                   for r in sdata if r.og_title == "")

    def test_jsonld_fields_are_typed(self, sdata):
        jl = [r for r in sdata if r.jsonld_type != ""]
        assert len(jl) > 0
        assert all(r.jsonld_type in
                   ("Article", "NewsArticle", "BlogPosting") for r in jl)
        assert all(r.jsonld_wordcount is None or
                   100 <= r.jsonld_wordcount <= 2000 for r in sdata)

    def test_og_types_are_bounded(self, sdata):
        assert {r.og_type for r in sdata if r.og_type != ""} <= {
            "article", "website"}


class TestPlans:
    def test_extraction_is_pure_catalyst(self, spark):
        for q in (H.q_index_gate, H.q_structured_data):
            plan = (q(spark, SF)
                    ._jdf.queryExecution().executedPlan().toString())
            assert "BatchEvalPython" not in plan
            assert "ArrowEvalPython" not in plan
            assert "Join" not in plan

    def test_gate_is_one_partial_aggregate(self, spark):
        """One groupBy(host): exactly one Exchange, map-side combined."""
        plan = (H.q_index_gate(spark, SF)
                ._jdf.queryExecution().executedPlan().toString())
        body = plan.split("AdaptiveSparkPlan")[-1]
        # sort for the orderBy + hash for the groupBy — nothing else
        assert body.count("Exchange") <= 2


class TestCharsetAudit:
    @pytest.fixture(scope="class")
    def audit(self, spark):
        return H.q_charset_audit(spark, SF).collect()

    def test_matches_python_recompute(self, spark, audit):
        """BOM + first-declared-charset agree with a byte-level Python
        pass applying decode_payload's exact precedence."""
        import pyarrow.parquet as pq
        from document_converter_api_spark.operators.linkgraph import pages_path
        t = pq.read_table(pages_path())
        exp = {}
        for url, html in zip(t["url"].to_pylist(), t["html"].to_pylist()):
            if not (url.endswith(".html") or url.endswith(".htm")):
                continue
            if html.startswith(b"\xef\xbb\xbf"):
                bom = "utf8"
            elif html.startswith(b"\xff\xfe"):
                bom = "utf16le"
            elif html.startswith(b"\xfe\xff"):
                bom = "utf16be"
            else:
                bom = "none"
            head = html[:1024]
            w = head.find(b'charset="windows-1252"')
            u = head.find(b'charset="utf-8"')
            if bom != "none":
                declared = "none"   # BOM wins — decode_payload never
                                    # reads a declaration under a BOM
            elif w >= 0 and (u < 0 or w < u):
                declared = "windows-1252"
            elif u >= 0:
                declared = "utf-8"
            else:
                declared = "none"
            exp[url] = (bom, declared,
                        bom in ("utf16le", "utf16be")
                        or declared == "windows-1252")
        got = {r.url: (r.bom, r.declared, r.needs_transcode) for r in audit}
        assert got == exp

    def test_finds_the_legacy_rows(self, audit):
        """The .htm rows are exactly the transcode set; .html rows are
        utf-8-clean (no BOM, never windows-1252)."""
        htm = [r for r in audit if r.url.endswith(".htm")]
        html = [r for r in audit if r.url.endswith(".html")]
        assert len(htm) >= 5 and len(html) > len(htm)
        assert all(r.needs_transcode for r in htm)
        assert all(not r.needs_transcode for r in html)
        assert {r.bom for r in htm} == {"none", "utf16le"}
        assert all(r.declared == "windows-1252"
                   for r in htm if r.bom == "none")
        assert all(r.bom == "none" for r in html)

    def test_never_decodes_the_payload(self, spark):
        """The audit exists to FIND undecodable pages — its plan must
        not contain a utf-8 decode of html (hex() only)."""
        plan = (H.q_charset_audit(spark, SF)
                ._jdf.queryExecution().analyzed().toString())
        assert "decode(" not in plan.lower().replace("hex(", "")
        ex = (H.q_charset_audit(spark, SF)
              ._jdf.queryExecution().executedPlan().toString())
        assert "BatchEvalPython" not in ex
        assert "ArrowEvalPython" not in ex
        assert "Join" not in ex
