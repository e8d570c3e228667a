"""Streaming CDX maintenance — index crawl segments AS THEY ARRIVE.

Extension tier like the rest of ``streaming/`` (the reference has no
streaming, SURVEY.md §2.10): ``jobs/cdxindex.py`` builds the URL index
for a FINISHED crawl; this drain appends index records for every
arriving segment, which is how a production cc-index actually grows —
per-segment sorted runs land incrementally, and the periodic compaction
job (the batch ``run_cdx_job`` over the accumulated corpus) rewrites
the totally-ordered shard set + ``cluster.idx``. LSM shape: streaming
appends runs, batch compacts.

``operators/cdx.cdx_records`` is a pure per-row projection, so the
union of per-batch outputs equals the one-shot batch output REGARDLESS
of how the crawl is chopped into micro-batches — the same strongest-
form stream==batch pin the linkage drain carries, pinned in
``tests/test_streaming_cdx.py``. Each epoch owns its ``batch_id=N``
partition (data rows, not folded state — no epoch pruning), so replays
after a crash overwrite their own partition and nothing else.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .availablenow import PAGES_SCHEMA, drain_available_now


def run_cdx_available_now(spark: SparkSession, input_dir: str,
                          output_dir: str,
                          checkpoint_dir: str | None = None,
                          timeout_sec: int = 600) -> int:
    """Drain available pages files, writing one CDX record per capture
    under ``<output>/records/batch_id=N``. Returns micro-batches
    processed; re-triggering after new segment drops resumes from the
    checkpoint and indexes only the new files."""
    from ..operators.cdx import cdx_records

    def outputs(batch_df: DataFrame) -> dict[str, DataFrame]:
        return {"records": cdx_records(
            batch_df.select("url", "warc_ts", "html"))}

    stream = (spark.readStream.schema(PAGES_SCHEMA)
              .parquet(input_dir))
    return drain_available_now(stream, output_dir, outputs,
                               checkpoint_dir=checkpoint_dir,
                               timeout_sec=timeout_sec,
                               label="cdx drain")
