"""WAT/WET derivation job: the Common Crawl product composition —
metadata+outlinks records for every raw page, extracted-plain-text
conversion records for every surviving page, both readable back through
the repo's own WARC parser."""

from __future__ import annotations

import glob
import json
import os
import re
import sys

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from document_converter_api_spark.operators.linkgraph import pages_path  # noqa: E402
from document_converter_api_spark.sources.warc import read_warc  # noqa: E402
from jobs.watwet import run_watwet_job  # noqa: E402

PAGES = pages_path()


@pytest.fixture(scope="module")
def derived(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("watwet"))
    stats = run_watwet_job(spark, PAGES, root, shards=3)
    return root, stats


class TestWat:
    def test_one_record_per_raw_page(self, derived):
        root, stats = derived
        assert stats["wat_records"] == stats["input_pages"]
        assert stats["wat_shards"] == 3

    def test_json_metadata_matches_fixture(self, spark, derived):
        root, _ = derived
        rows = read_warc(spark, os.path.join(root, "wat", "*.warc.gz"),
                         types=("metadata",))
        recs = rows.collect()
        assert recs and all(r.warc_type == "metadata" for r in recs)
        tab = pq.read_table(PAGES, columns=["url", "html"])
        raw = dict(zip(tab["url"].to_pylist(), tab["html"].to_pylist()))
        seen = set()
        for r in recs:
            meta = json.loads(bytes(r.html).decode("utf-8"))
            assert meta["url"] == r.url
            seen.add(meta["url"])
            assert meta["n_bytes"] == len(raw[meta["url"]])
            if meta["url"].endswith((".html", ".htm")):
                # same lenient ISO-8859-1 read the Spark projection uses
                # (UTF-16 legacy payloads yield no latin-1 matches — the
                # twin must agree, not second-guess)
                want = re.findall(r'<a href="([^"]+)"',
                                  raw[meta["url"]].decode("latin-1"))
                assert meta["outlinks"] == want
            else:
                assert meta["outlinks"] == []
        assert seen == set(raw)

    def test_wat_records_are_metadata_type(self, spark, derived):
        root, _ = derived
        # parse one shard raw to check the record type header survives
        path = sorted(glob.glob(os.path.join(root, "wat", "*.warc.gz")))[0]
        import gzip
        data = gzip.decompress(open(path, "rb").read())
        assert data.startswith(b"WARC/1.0\r\nWARC-Type: metadata\r\n")
        assert b"Content-Type: application/json" in data[:400]


class TestWet:
    def test_text_matches_extraction_goldens(self, spark, derived):
        """Every WET conversion record's payload equals the committed
        golden plain text for its url — the WET product is byte-pinned
        end to end."""
        root, stats = derived
        rows = read_warc(spark,
                         os.path.join(root, "wet", "*.warc.gz")).collect()
        assert len(rows) == stats["wet_records"] > 0
        gold = pq.read_table(PAGES.replace("pages_", "goldens_"),
                             columns=["url", "plain_text"])
        gold = dict(zip(gold["url"].to_pylist(),
                        gold["plain_text"].to_pylist()))
        for r in rows:
            assert gold.get(r.url) is not None, r.url
            assert bytes(r.html).decode("utf-8") == gold[r.url], r.url

    def test_gate_and_errors_excluded(self, spark, derived):
        """noindex pages and per-doc failures (passworded PDFs) never
        reach the WET output; the raw WAT still carries them."""
        root, stats = derived
        assert 0 < stats["wet_records"] < stats["input_pages"]
        wet_urls = {r.url for r in read_warc(
            spark, os.path.join(root, "wet", "*.warc.gz"))
            .select("url").collect()}
        tab = pq.read_table(PAGES, columns=["url", "html"])
        noindex = {u for u, h in zip(tab["url"].to_pylist(),
                                     tab["html"].to_pylist())
                   if u.endswith(".html") and b'content="noindex' in h}
        assert noindex and not (noindex & wet_urls)

    def test_rerun_is_deterministic(self, spark, derived, tmp_path):
        """Range partitioning on url makes shard contents byte-stable
        across reruns."""
        root, _ = derived
        root2 = str(tmp_path / "again")
        run_watwet_job(spark, PAGES, root2, shards=3)
        for sub in ("wat", "wet"):
            a = sorted(glob.glob(os.path.join(root, sub, "*.warc.gz")))
            b = sorted(glob.glob(os.path.join(root2, sub, "*.warc.gz")))
            assert [os.path.basename(p) for p in a] == \
                   [os.path.basename(p) for p in b]
            for pa_, pb in zip(a, b):
                assert open(pa_, "rb").read() == open(pb, "rb").read(), pa_
