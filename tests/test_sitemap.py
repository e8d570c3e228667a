"""Sitemap tier (operators/sitemap.py): urlset parsing checked against
an independent Python XML re-parse, coverage/freshness invariants, and
the sniffer's XML routing that keeps sitemaps out of the extractor."""

from __future__ import annotations

import re
from datetime import datetime

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from document_converter_api_spark.extraction.sniff import sniff_content_type
from document_converter_api_spark.operators.linkgraph import pages_path
from document_converter_api_spark.operators.sitemap import (
    q_sitemap_coverage,
    q_sitemap_freshness,
    q_sitemap_urls,
)

PAGES = pages_path()


@pytest.fixture(scope="module")
def corpus():
    return pq.read_table(PAGES).to_pylist()


@pytest.fixture(scope="module")
def expected(corpus):
    """Independent re-parse: python re over the raw XML bytes."""
    rows = []
    for r in corpus:
        if not r["url"].endswith("/sitemap.xml"):
            continue
        host = re.match(r"^https?://([^/]+)", r["url"]).group(1)
        for block in re.findall(rb"<url>(.*?)</url>", r["html"]):
            def tag(t):
                m = re.search(rb"<" + t + rb">([^<]*)</" + t + rb">",
                              block)
                return m.group(1).decode() if m else None
            lm = tag(b"lastmod")
            if lm is None:
                parsed_lm = None
            else:
                try:
                    parsed_lm = datetime.strptime(lm, "%Y-%m-%dT%H:%M:%SZ")
                except ValueError:
                    parsed_lm = datetime.strptime(lm, "%Y-%m-%d")
            rows.append({
                "host": host, "loc": tag(b"loc"),
                "lastmod": parsed_lm,
                "changefreq": tag(b"changefreq"),
                "priority": (float(tag(b"priority"))
                             if tag(b"priority") else None)})
    return rows


def test_parse_matches_python(spark, expected):
    got = [r.asDict() for r in q_sitemap_urls(spark, "").collect()]
    key = lambda d: (d["host"], d["loc"])  # noqa: E731
    assert sorted(got, key=key) == sorted(expected, key=key)
    assert len(got) >= 20
    # optional fields: the planted discovery locs carry no lastmod
    assert any(d["lastmod"] is None for d in got)
    assert any(d["lastmod"] is not None for d in got)


def test_coverage_invariants(spark, corpus, expected):
    crawled = {(re.match(r"^https?://([^/]+)", r["url"]).group(1),
                r["url"])
               for r in corpus if r["url"].endswith(".html")}
    html_per_host = {}
    for h, _ in crawled:
        html_per_host[h] = html_per_host.get(h, 0) + 1
    declared_hosts = {d["host"] for d in expected}
    rows = {r.host: r for r in q_sitemap_coverage(spark, "").collect()}
    assert set(rows) == declared_hosts
    for host, r in rows.items():
        declared = [d for d in expected if d["host"] == host]
        n_hit = sum((host, d["loc"]) in crawled for d in declared)
        assert r.n_declared == len(declared)
        assert r.n_crawled == n_hit
        assert r.n_to_discover == len(declared) - n_hit
        assert r.n_orphans == html_per_host.get(host, 0) - n_hit
        assert r.n_to_discover >= 1, "planted discovery locs"


def test_freshness_matches_lastmod_vs_fetch_time(spark, corpus, expected):
    ts_by_url = {r["url"]: r["warc_ts"] for r in corpus}
    rows = q_sitemap_freshness(spark, "").collect()
    declared_crawled = [d for d in expected if d["loc"] in ts_by_url]
    assert len(rows) == len(declared_crawled)
    assert rows, "fixture must list crawled pages"
    due = 0
    for r in rows:
        want = (r.lastmod is not None
                and r.lastmod > ts_by_url[r.loc])
        assert r.recrawl_due == want
        assert r.warc_ts == ts_by_url[r.loc]
        due += r.recrawl_due
    assert 0 < due < len(rows), "both fresh and stale pages planted"


def test_sniffer_routes_xml_to_metadata_path(spark):
    xml = b'<?xml version="1.0" encoding="UTF-8"?>\n<urlset></urlset>'
    assert sniff_content_type(xml, "https://h/sitemap.xml") == "xml"
    assert sniff_content_type(b"  \n<?xml ?>", "") == "xml"
    # html is untouched by the new branch
    assert sniff_content_type(b"<!doctype html><html>", "") == "html"
    assert sniff_content_type(b"<div>x</div>", "") == "html"
    from document_converter_api_spark.functions.expressions import (
        sniff_content_type_expr,
    )
    df = spark.createDataFrame(
        [(xml, "https://h/sitemap.xml"),
         (b"<html></html>", "https://h/p.html")],
        "html binary, url string")
    got = [r.t for r in df.select(
        sniff_content_type_expr(F.col("html"), F.col("url"))
        .alias("t")).collect()]
    assert got == ["xml", "html"]


def test_gate_rejects_sitemaps_from_extraction(spark):
    from document_converter_api_spark.operators.extract import (
        extract_pipeline,
    )
    pages = spark.read.parquet(PAGES)
    _, rejects = extract_pipeline(pages, num_partitions=4,
                                  shuffle_partitions=4)
    sm = (rejects.filter(F.col("url").endswith("/sitemap.xml"))
          .select("error").distinct().collect())
    assert [r.error for r in sm] == ["unsupported_content_type:xml"]


def test_parse_never_raises_on_adversarial_xml(spark):
    """Arbitrary bytes in sitemap payloads (truncated tags, non-UTF-8,
    unparseable lastmod/priority, loc-less blocks) must yield rows or
    nothing — never a task failure, even under Spark 4 ANSI mode."""
    import random

    from document_converter_api_spark.operators.sitemap import (
        parse_sitemaps,
    )

    rng = random.Random(0x51F)
    blocks = [
        b"<url><loc>https://h/x</loc><lastmod>2026-01-05</lastmod></url>",
        b"<url><loc>https://h/y</loc><lastmod>not a date</lastmod></url>",
        b"<url><loc>https://h/z</loc><priority>high</priority></url>",
        b"<url><lastmod>2026-01-05T00:00:00Z</lastmod></url>",  # no loc
        b"<url><loc></loc></url>",
        b"<url><loc>https://h/q</loc>",                        # truncated
        bytes(rng.getrandbits(8) for _ in range(40)),           # junk
    ]
    rows = []
    from datetime import datetime
    for i in range(120):
        body = b"<?xml?><urlset>" + b"\n".join(
            rng.choice(blocks) for _ in range(rng.randint(0, 6))
        ) + b"</urlset>"
        rows.append((f"https://host{i % 7}.example/sitemap.xml",
                     datetime(2025, 6, 1), body))
    df = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary")
    got = parse_sitemaps(df).collect()
    for r in got:
        assert r.loc is not None, "loc-less blocks must drop at parse"
        assert r.loc.startswith("https://h/")
    # date-only lastmod parses; junk lastmod/priority null out
    assert any(r.lastmod is not None for r in got)
    assert all(r.priority is None or 0 <= r.priority <= 1 for r in got)
