"""Watermarked windowed crawl-rate stream: the streaming aggregation must
agree with its batch twin on the same files, and records arriving later
than the watermark horizon must be dropped on the next trigger (bounded
state — the late-data contract)."""

from __future__ import annotations

import datetime
import os

import pyarrow as pa
import pyarrow.parquet as pq

from document_converter_api_spark.streaming.windowed import (
    crawl_rate,
    run_crawl_rate_available_now,
)

BASE = datetime.datetime(2025, 7, 1, 10, 0, 0)


def _pages_file(path: str, rows: list[tuple[str, datetime.datetime, str]]) -> None:
    pq.write_table(pa.table({
        "url": pa.array([r[0] for r in rows], pa.string()),
        "warc_ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "html": pa.array([b"<html><body><p>x</p></body></html>"] * len(rows),
                         pa.binary()),
        "text": pa.array([""] * len(rows), pa.string()),
        "lang": pa.array([r[2] for r in rows], pa.string()),
    }), path)


def test_stream_agg_matches_batch_twin_and_drops_late(spark, tmp_path):
    indir = str(tmp_path / "in")
    outdir = str(tmp_path / "out")
    os.makedirs(indir)

    fresh = [(f"https://a.example/{i}", BASE + datetime.timedelta(minutes=10 * i),
              "en" if i % 2 == 0 else "de") for i in range(12)]  # 10:00-11:50
    _pages_file(os.path.join(indir, "part-000.parquet"), fresh)

    n = run_crawl_rate_available_now(spark, indir, outdir,
                                     watermark="30 minutes", window="1 hour")
    assert n >= 1

    got = {(r.window_start, r.lang): (r.n_docs, r.bytes_in)
           for r in spark.read.parquet(os.path.join(outdir, "crawl_rate")).collect()}
    batch = spark.createDataFrame(
        [(u, ts, b"<html><body><p>x</p></body></html>", "", lang)
         for u, ts, lang in fresh],
        "url string, warc_ts timestamp, html binary, text string, lang string")
    want = {(r.window_start, r.lang): (r.n_docs, r.bytes_in)
            for r in crawl_rate(batch).collect()}
    assert got == want

    # a record 4 hours older than everything seen is far beyond the 30-min
    # watermark: the next drain must NOT add rows for its window
    late = [("https://late.example/0", BASE - datetime.timedelta(hours=4), "en")]
    _pages_file(os.path.join(indir, "part-001.parquet"), late)
    run_crawl_rate_available_now(spark, indir, outdir,
                                 watermark="30 minutes", window="1 hour")
    after = spark.read.parquet(os.path.join(outdir, "crawl_rate"))
    late_window = [r for r in after.collect()
                   if r.window_start <= BASE - datetime.timedelta(hours=4)]
    assert late_window == [], "late record beyond watermark must be dropped"
