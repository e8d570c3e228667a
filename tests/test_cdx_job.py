"""CDX index job (jobs/cdxindex.py): SURT-ordered CDXJ shards +
cluster.idx, checked for global order, lookup-layer consistency,
payload fidelity against independent Python, and byte-stable reruns."""

from __future__ import annotations

import binascii
import gzip
import hashlib
import json
import os
import sys

import pyarrow.parquet as pq
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from document_converter_api_spark.operators.linkgraph import pages_path  # noqa: E402
from jobs.cdxindex import run_cdx_job  # noqa: E402

PAGES = pages_path()


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("cdx"))
    stats = run_cdx_job(spark, PAGES, root, shards=3)
    return root, stats


def _read_lines(root, stats):
    lines = []
    for name in sorted(os.listdir(os.path.join(root, "indexes"))):
        with gzip.open(os.path.join(root, "indexes", name), "rt",
                       encoding="utf-8") as f:
            lines.append((name, f.read().splitlines()))
    return lines


def test_every_capture_indexed_once(built):
    root, stats = built
    assert stats["index_records"] == stats["input_pages"]
    assert stats["index_shards"] == 3
    total = sum(len(ls) for _, ls in _read_lines(root, stats))
    assert total == stats["index_records"]


def test_global_surt_order_across_shards(built):
    root, stats = built
    keys = []
    for _, ls in _read_lines(root, stats):
        keys.extend(tuple(line.split(" ", 2)[:2]) for line in ls)
    assert keys == sorted(keys)


def test_cluster_idx_is_a_correct_lookup_layer(built):
    root, stats = built
    with open(os.path.join(root, "cluster.idx"), encoding="utf-8") as f:
        entries = [line.rstrip("\n").split("\t") for line in f]
    shards = _read_lines(root, stats)
    assert len(entries) == len(shards)
    for i, ((keyts, fname, n, ordinal), (name, ls)) in enumerate(
            zip(entries, shards)):
        assert fname == name
        assert int(n) == len(ls)
        assert int(ordinal) == i
        first_key, first_ts = ls[0].split(" ", 2)[:2]
        assert keyts == f"{first_key} {first_ts}"


def test_payload_fidelity_vs_python(built):
    root, stats = built
    table = pq.read_table(PAGES).to_pylist()
    by_url = {r["url"]: r for r in table}
    checked = 0
    for _, ls in _read_lines(root, stats):
        for line in ls[::37]:
            rec = json.loads(line.split(" ", 2)[2])
            row = by_url[rec["url"]]
            assert rec["length"] == len(row["html"])
            want = hashlib.md5(
                binascii.hexlify(row["html"]).upper()).hexdigest()
            assert rec["digest"] == want
            ts14 = line.split(" ", 2)[1]
            assert ts14 == row["warc_ts"].strftime("%Y%m%d%H%M%S")
            checked += 1
    assert checked >= 10


def test_rerun_is_byte_identical(spark, built, tmp_path_factory):
    root, stats = built
    root2 = str(tmp_path_factory.mktemp("cdx2"))
    stats2 = run_cdx_job(spark, PAGES, root2, shards=3)
    assert stats2["index_records"] == stats["index_records"]
    for name in os.listdir(os.path.join(root, "indexes")):
        a = open(os.path.join(root, "indexes", name), "rb").read()
        b = open(os.path.join(root2, "indexes", name), "rb").read()
        assert a == b, f"{name} differs between reruns"
    ca = open(os.path.join(root, "cluster.idx")).read()
    cb = open(os.path.join(root2, "cluster.idx")).read()
    assert ca == cb


def test_warc_input_round_trip(spark, tmp_path):
    from document_converter_api_spark.sources.warc import write_warc
    rows = [(r["url"], r["warc_ts"], r["html"])
            for r in pq.read_table(PAGES).to_pylist()[:60]]
    seg = str(tmp_path / "seg-00000.warc.gz")
    write_warc(rows, seg, compress=True)
    root = str(tmp_path / "out")
    stats = run_cdx_job(spark, seg, root, input_format="warc", shards=2)
    assert stats["input_pages"] == 60
    assert stats["index_records"] == 60


def test_warc_index_locations_fetch_one_record(spark, tmp_path):
    """The full archive-lookup contract: cluster.idx → shard → CDXJ
    record → (filename, offset, rlen) → ONE record sliced out of the
    WARC store re-parses to the original capture."""
    from document_converter_api_spark.sources.warc import (
        parse_warc_bytes, write_warc,
    )
    originals = {r["url"]: r for r in pq.read_table(PAGES).to_pylist()[:50]}
    rows = [(r["url"], r["warc_ts"], r["html"]) for r in originals.values()]
    seg = str(tmp_path / "seg-00000.warc")
    write_warc(rows, seg, compress=False)
    root = str(tmp_path / "out")
    run_cdx_job(spark, seg, root, input_format="warc", shards=2)

    store = open(seg, "rb").read()
    checked = 0
    for _, ls in _read_lines(root, {}):
        for line in ls[::9]:
            rec = json.loads(line.split(" ", 2)[2])
            assert rec["filename"] == "seg-00000.warc"
            sliced = store[rec["offset"]:rec["offset"] + rec["rlen"]]
            parsed = parse_warc_bytes(sliced)
            assert len(parsed) == 1
            got = parsed[0]
            want = originals[rec["url"]]
            assert got["url"] == want["url"]
            assert bytes(got["html"]) == want["html"]
            checked += 1
    assert checked >= 5
