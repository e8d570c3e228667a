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


def test_compact_stream_state_retires_runs_and_plateaus(spark, tmp_path):
    """Round-4 verdict item 7: the maintenance compactor must bound the
    runs directory. Three drain→compact cycles: after every compaction
    the records/ directory holds ZERO un-retired runs (it plateaus at
    whatever arrived since the last pass, not at crawl lifetime), the
    manifest generation advances, exactly one L1 generation survives,
    and the final published index is byte-identical to one batch
    run_cdx_job over everything ever drained."""
    import gzip
    import json

    from jobs.cdxindex import compact_stream_state, run_cdx_job

    indir = str(tmp_path / "in")
    stream_out = str(tmp_path / "stream")
    index_out = str(tmp_path / "index")
    recdir = os.path.join(stream_out, "records")
    l1dir = os.path.join(stream_out, "l1")

    slices = [(0, 100), (100, 80), (180, 60)]
    total = 0
    for i, (start, n) in enumerate(slices):
        seg = pq.read_table(PAGES).slice(start, n)
        os.makedirs(indir, exist_ok=True)
        pq.write_table(seg, os.path.join(indir, f"seg-{i:03d}.parquet"))
        total += n
        run_cdx_available_now(spark, indir, stream_out)
        stats = compact_stream_state(spark, stream_out, index_out,
                                     shards=3)
        assert stats["gen"] == i
        assert stats["level_records"] == total
        # every run retired: the records dir plateaus at zero between
        # segment drops instead of growing with crawl lifetime
        leftover = [d for d in os.listdir(recdir)
                    if d.startswith("batch_id=")]
        assert leftover == [], leftover
        gens = [d for d in os.listdir(l1dir) if d.startswith("gen=")]
        assert gens == [f"gen={i}"], gens
        manifest = json.load(open(os.path.join(l1dir, "MANIFEST.json")))
        assert manifest["gen"] == i

    # a compaction with NOTHING new is a no-op on content
    again = compact_stream_state(spark, stream_out, index_out, shards=3)
    assert again["level_records"] == total
    assert again["folded_runs"] == 0

    batch = str(tmp_path / "batch")
    bstats = run_cdx_job(spark, indir, batch, shards=3)
    assert bstats["index_records"] == total
    names_s = sorted(os.listdir(os.path.join(index_out, "indexes")))
    names_b = sorted(os.listdir(os.path.join(batch, "indexes")))
    assert names_s == names_b
    for name in names_s:
        a = gzip.decompress(open(
            os.path.join(index_out, "indexes", name), "rb").read())
        b = gzip.decompress(open(
            os.path.join(batch, "indexes", name), "rb").read())
        assert a == b, f"{name} differs between stream+compact and batch"
    assert (open(os.path.join(index_out, "cluster.idx")).read()
            == open(os.path.join(batch, "cluster.idx")).read())


def test_compact_stream_state_recovers_from_crashed_delete(spark,
                                                           tmp_path):
    """Crash-safety: a run directory that survives past the manifest
    commit (simulated stale delete) is never re-folded — its batch_id
    is <= folded_through, so the next pass prunes it without reading."""
    import json
    import shutil

    from jobs.cdxindex import compact_stream_state

    indir = str(tmp_path / "in")
    stream_out = str(tmp_path / "stream")
    index_out = str(tmp_path / "index")
    recdir = os.path.join(stream_out, "records")
    _split_corpus(indir, n_files=1, take=50)
    run_cdx_available_now(spark, indir, stream_out)

    # preserve a copy of the run, compact, then "un-delete" it
    run_dirs = [d for d in os.listdir(recdir) if d.startswith("batch_id=")]
    saved = str(tmp_path / "saved")
    shutil.copytree(os.path.join(recdir, run_dirs[0]),
                    os.path.join(saved, run_dirs[0]))
    s1 = compact_stream_state(spark, stream_out, index_out, shards=2)
    assert s1["level_records"] == 50
    shutil.copytree(os.path.join(saved, run_dirs[0]),
                    os.path.join(recdir, run_dirs[0]))

    s2 = compact_stream_state(spark, stream_out, index_out, shards=2)
    assert s2["folded_runs"] == 0          # stale run never re-read
    assert s2["level_records"] == 50       # no duplicate records
    assert not os.path.exists(os.path.join(recdir, run_dirs[0]))
    manifest = json.load(open(
        os.path.join(stream_out, "l1", "MANIFEST.json")))
    assert manifest["gen"] == s2["gen"]
