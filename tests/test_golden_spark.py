"""Golden byte-identity: the distributed pipeline must reproduce the committed
golden fixtures exactly, per url (SURVEY.md §5.2.1; north rule
/root/repo/BASELINE.json:16 "byte-identical extracted text per url").

What this pins: Arrow round-trip fidelity (utf-8, large_string, no pandas
dtype coercion), shuffle/repartition not reordering or corrupting payloads,
and the gate expressions agreeing with the Python sniffing the goldens used.
"""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from document_converter_api_spark.functions.expressions import (
    markdown_to_gdocs_expr,
    markdown_to_plain_expr,
)
from document_converter_api_spark.operators.extract import extract_pipeline

from .conftest import TEST_MAX_BYTES


@pytest.fixture(scope="module")
def extracted(spark, smoke_paths):
    pages_path, goldens_path = smoke_paths
    pages = spark.read.parquet(pages_path)
    results, rejects = extract_pipeline(pages, max_bytes=TEST_MAX_BYTES,
                                        num_partitions=16)
    res = {r.url: r for r in results.collect()}
    rej = {r.url: r for r in rejects.collect()}
    gold = pq.read_table(goldens_path)
    golden = {
        u: (m, p, g, e)
        for u, m, p, g, e in zip(
            gold.column("url").to_pylist(),
            gold.column("markdown").to_pylist(),
            gold.column("plain_text").to_pylist(),
            gold.column("google_docs").to_pylist(),
            gold.column("error").to_pylist(),
        )
    }
    return res, rej, golden


def test_every_url_accounted_for(extracted):
    res, rej, golden = extracted
    assert set(res) | set(rej) == set(golden)
    assert not set(res) & set(rej)


def test_markdown_byte_identical(extracted):
    res, _, golden = extracted
    mismatches = [u for u, r in res.items() if golden[u][0] != r.markdown]
    assert mismatches == [], f"{len(mismatches)} docs differ, e.g. {mismatches[:3]}"


def test_rejects_have_reasons(extracted):
    _, rej, golden = extracted
    for u, r in rej.items():
        assert r.error is not None
        gold_err = golden[u][3]
        # oversize rows were extracted fine in goldens (no size gate there)
        assert r.error == "too_large" or gold_err is not None


def test_encrypted_pdfs_flow_through_pipeline(smoke_paths, extracted):
    """The corpus must carry Standard-handler-encrypted PDFs (round 3):
    empty-user-password files extract byte-identically to their planted
    truth through the SPARK pipeline; real-password files pass the format
    gate but carry ``error='encrypted'`` in the results (per-doc failures
    never raise — SURVEY §2.11). Pins corpus composition so a fixture
    regression that drops the encrypted rows fails loudly."""
    pages_path, _ = smoke_paths
    res, rej, golden = extracted
    tab = pq.read_table(pages_path, columns=["url", "html"])
    enc_urls = [u for u, p in zip(tab.column("url").to_pylist(),
                                  tab.column("html").to_pylist())
                if u.endswith(".pdf") and b"/Encrypt" in p]
    readable = [u for u in enc_urls if golden[u][3] is None]
    passworded = [u for u in enc_urls if golden[u][3] == "encrypted"]
    assert len(readable) >= 5, "fixture lost its decryptable encrypted PDFs"
    assert len(passworded) >= 1, "fixture lost its passworded PDFs"
    for u in readable:
        assert u in res and res[u].markdown == golden[u][0]
    for u in passworded:
        assert u in res and res[u].error == "encrypted" \
            and res[u].markdown is None


def test_bytes_out_matches_markdown(extracted):
    res, _, _ = extracted
    for r in res.values():
        expected = len(r.markdown.encode("utf-8")) if r.markdown is not None else 0
        assert r.bytes_out == expected


def test_plain_and_gdocs_expressions_match_python_goldens(spark, smoke_paths, extracted):
    """F2/F3 Catalyst expressions vs the Python-formatted goldens, over every
    markdown the pipeline produced (property-style parity, SURVEY.md §5.2.3)."""
    res, _, golden = extracted
    rows = [(u, r.markdown) for u, r in res.items() if r.markdown is not None]
    df = spark.createDataFrame(rows, "url string, markdown string")
    out = df.select(
        "url",
        markdown_to_plain_expr(F.col("markdown")).alias("plain"),
        markdown_to_gdocs_expr(F.col("markdown")).alias("gdocs"),
    ).collect()
    bad_plain = [r.url for r in out if r.plain != golden[r.url][1]]
    bad_gdocs = [r.url for r in out if r.gdocs != golden[r.url][2]]
    assert bad_plain == [], bad_plain[:3]
    assert bad_gdocs == [], bad_gdocs[:3]


def test_deterministic_across_runs(spark, smoke_paths):
    pages_path, _ = smoke_paths
    pages = spark.read.parquet(pages_path)
    r1, _ = extract_pipeline(pages, max_bytes=TEST_MAX_BYTES, num_partitions=16)
    r2, _ = extract_pipeline(pages, max_bytes=TEST_MAX_BYTES, num_partitions=16)
    h1 = sorted((r.url, r.markdown) for r in r1.collect())
    h2 = sorted((r.url, r.markdown) for r in r2.collect())
    assert h1 == h2
