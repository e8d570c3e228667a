"""Streaming CDX maintenance: per-segment index runs drained with
AvailableNow must union to EXACTLY the batch index over the same pages,
regardless of micro-batch chopping; re-triggers index only new files."""

from __future__ import annotations

import os

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from document_converter_api_spark.operators.cdx import cdx_records
from document_converter_api_spark.operators.linkgraph import pages_path
from document_converter_api_spark.streaming.cdx_stream import (
    run_cdx_available_now,
)

PAGES = pages_path()


def _split_corpus(indir: str, n_files: int, take: int) -> None:
    os.makedirs(indir, exist_ok=True)
    t = pq.read_table(PAGES).slice(0, take)
    per = (t.num_rows + n_files - 1) // n_files
    for i in range(n_files):
        chunk = t.slice(i * per, per)
        if chunk.num_rows:
            pq.write_table(chunk, os.path.join(indir,
                                               f"seg-{i:03d}.parquet"))


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_union_of_batches_equals_batch_index(spark, tmp_path):
    indir, outdir = str(tmp_path / "in"), str(tmp_path / "out")
    _split_corpus(indir, n_files=3, take=240)
    n = run_cdx_available_now(spark, indir, outdir)
    assert n >= 1

    streamed = (spark.read.parquet(os.path.join(outdir, "records"))
                .drop("batch_id"))
    batch = cdx_records(spark.read.parquet(indir))
    assert _rows(streamed) == _rows(batch)
    assert streamed.count() == 240


def test_retrigger_indexes_only_new_segments(spark, tmp_path):
    indir, outdir = str(tmp_path / "in"), str(tmp_path / "out")
    _split_corpus(indir, n_files=2, take=120)
    run_cdx_available_now(spark, indir, outdir)
    recdir = os.path.join(outdir, "records")
    before = {d for d in os.listdir(recdir) if d.startswith("batch_id=")}
    n_before = spark.read.parquet(recdir).count()

    # a new crawl segment drops; the re-trigger drains ONLY it
    extra = pq.read_table(PAGES).slice(300, 40)
    pq.write_table(extra, os.path.join(indir, "seg-900.parquet"))
    run_cdx_available_now(spark, indir, outdir)

    after = spark.read.parquet(recdir)
    assert after.count() == n_before + 40
    new_parts = {d for d in os.listdir(recdir)
                 if d.startswith("batch_id=")} - before
    assert new_parts, "re-trigger must land in a fresh epoch partition"
    new_rows = after.filter(
        F.col("batch_id").isin([int(p.split("=")[1]) for p in new_parts]))
    want = cdx_records(spark.read.parquet(
        os.path.join(indir, "seg-900.parquet")))
    assert _rows(new_rows.drop("batch_id")) == _rows(want)


def test_compaction_equals_batch_index_byte_for_byte(spark, tmp_path):
    """The LSM contract end to end: drain 3 segment drops, compact the
    per-batch runs, and the shard files + cluster.idx are BYTE-identical
    to the batch job run over the same pages in one shot."""
    import gzip

    from jobs.cdxindex import compact_cdx_runs, run_cdx_job

    indir = str(tmp_path / "in")
    _split_corpus(indir, n_files=3, take=240)
    stream_out = str(tmp_path / "stream")
    run_cdx_available_now(spark, indir, stream_out)

    compacted = str(tmp_path / "compacted")
    cstats = compact_cdx_runs(
        spark, os.path.join(stream_out, "records"), compacted, shards=3)
    batch = str(tmp_path / "batch")
    bstats = run_cdx_job(spark, indir, batch, shards=3)

    assert cstats["index_records"] == bstats["index_records"] == 240
    names_c = sorted(os.listdir(os.path.join(compacted, "indexes")))
    names_b = sorted(os.listdir(os.path.join(batch, "indexes")))
    assert names_c == names_b
    for name in names_c:
        a = gzip.decompress(open(
            os.path.join(compacted, "indexes", name), "rb").read())
        b = gzip.decompress(open(
            os.path.join(batch, "indexes", name), "rb").read())
        assert a == b, f"{name} differs between compaction and batch"
    assert (open(os.path.join(compacted, "cluster.idx")).read()
            == open(os.path.join(batch, "cluster.idx")).read())
