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
partition (data rows, not folded state — ``keep_state_epochs`` pruning
would DELETE index records, so it is deliberately not used here), so
replays after a crash overwrite their own partition and nothing else.

Run retention (round-4 verdict item 7): runs are retired by the
maintenance compactor, not by epoch age — ``jobs/cdxindex.
compact_stream_state`` folds accumulated runs plus the current L1
parquet level into a new L1 generation, rewrites the published shard
set + ``cluster.idx``, commits a manifest atomically, and only then
deletes the folded ``batch_id=N`` directories. The records directory
therefore plateaus at "runs since last compaction" instead of growing
for the crawl's lifetime; byte-identity with the one-shot batch index
and crash-safety of the retire step are both pinned in
``tests/test_streaming_cdx.py``.
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
