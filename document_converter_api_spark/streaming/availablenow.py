"""Structured Streaming wrapper: incremental extraction with
Trigger.AvailableNow over a file-source pages directory.

The reference has no streaming (SURVEY.md §2.10 — its "async" path is a
request-scoped task queue), so this is the §7.6 extension: the same
extraction stage run incrementally. ``AvailableNow`` drains whatever files
exist and stops — the batch pipeline's semantics with streaming's file-level
bookkeeping (checkpointLocation tracks processed files, complementing the
partition-granular lineage of the batch path; new crawl drops are picked up
by simply re-triggering).

foreachBatch reuses the exact batch operators, so results are byte-identical
to the batch pipeline over the same files.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BinaryType, StringType, StructField, StructType, TimestampType,
)

from ..operators.extract import extract_pipeline

PAGES_SCHEMA = StructType([
    StructField("url", StringType()),
    StructField("warc_ts", TimestampType()),
    StructField("html", BinaryType()),
    StructField("text", StringType()),
    StructField("lang", StringType()),
])


def run_available_now(spark: SparkSession, input_dir: str, output_dir: str,
                      checkpoint_dir: str | None = None,
                      max_bytes: int | None = None,
                      timeout_sec: int = 600) -> int:
    """Drain all currently-available page files through the extraction
    stage; returns number of micro-batches processed. Re-invoking after new
    files land processes only the new files (streaming file-source log)."""
    checkpoint = checkpoint_dir or os.path.join(output_dir, "_checkpoint")
    batches = {"n": 0}

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        kwargs = {"max_bytes": max_bytes} if max_bytes else {}
        results, rejects = extract_pipeline(batch_df, num_partitions=16,
                                            shuffle_partitions=16, **kwargs)
        (results.write.mode("append")
         .parquet(os.path.join(output_dir, "results")))
        (rejects.write.mode("append")
         .parquet(os.path.join(output_dir, "rejects")))
        batches["n"] += 1

    stream = (spark.readStream.schema(PAGES_SCHEMA).parquet(input_dir)
              .writeStream
              .foreachBatch(process_batch)
              .option("checkpointLocation", checkpoint)
              .trigger(availableNow=True)
              .start())
    if not stream.awaitTermination(timeout_sec):
        stream.stop()
        raise TimeoutError(
            f"incremental drain exceeded {timeout_sec}s; query stopped — "
            "rerun to resume from the checkpoint")
    return batches["n"]
