"""Watermarked windowed aggregation over the incoming page stream.

The reference has no streaming (SURVEY.md §2.10), so like
``availablenow.py`` this is the §7.6 extension tier: crawl-rate monitoring —
per-(event-time window, lang) doc counts and byte volumes over ``warc_ts``
— as a Structured Streaming aggregation with a watermark bounding state for
late WARC records. On a crawl pipeline this is the live dashboard feed next
to the batch lineage table.

Scale notes: state is keyed by (window, lang) — cardinality = windows
retained x languages, bounded by the watermark horizon, so the state store
stays small no matter the input rate; the aggregation is a standard partial
+ final hash agg per micro-batch.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .availablenow import PAGES_SCHEMA


def crawl_rate(pages: DataFrame, window: str = "1 hour",
               slide: str | None = None) -> DataFrame:
    """The aggregation itself — applied identically to a batch or a
    streaming DataFrame (the test uses the batch form as the oracle)."""
    win = (F.window("warc_ts", window, slide) if slide
           else F.window("warc_ts", window))
    return (pages.groupBy(win.alias("win"), F.col("lang"))
            .agg(F.count("*").alias("n_docs"),
                 F.sum(F.length("html")).alias("bytes_in"))
            .select(F.col("win.start").alias("window_start"),
                    F.col("win.end").alias("window_end"),
                    "lang", "n_docs", "bytes_in"))


def run_crawl_rate_available_now(spark: SparkSession, input_dir: str,
                                 output_dir: str,
                                 watermark: str = "30 minutes",
                                 window: str = "1 hour",
                                 checkpoint_dir: str | None = None,
                                 timeout_sec: int = 600) -> int:
    """Drain available page files through the watermarked windowed agg in
    update mode, appending finalized/updated window rows to parquet via
    foreachBatch. The watermark bounds both state and how late a WARC
    record may arrive and still count; re-triggering after new files land
    continues from the streaming checkpoint."""
    from .availablenow import drain_available_now

    stream_pages = (spark.readStream.schema(PAGES_SCHEMA).parquet(input_dir)
                    .withWatermark("warc_ts", watermark))
    return drain_available_now(
        crawl_rate(stream_pages, window), output_dir,
        lambda batch_df: {"crawl_rate": batch_df},
        checkpoint_dir=checkpoint_dir, output_mode="update",
        timeout_sec=timeout_sec, label="crawl-rate drain")
