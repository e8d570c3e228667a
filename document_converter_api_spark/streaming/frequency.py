"""Streaming heavy-hitters monitor: incremental count-min counter merge.

The crawl-ops twin of the cardinality monitor (streaming/cardinality.py):
"which hosts are we fetching most" over an unbounded stream. An exact
per-host count needs per-key state that grows with the key space; the
count-min counter table (operators/sketch.py) is the right state object —
EXACTLY d×w rows forever, and the merge is counter ADDITION: associative,
commutative, and (written per-epoch to its own ``batch_id=N`` partition)
idempotent under foreachBatch's at-least-once replay, because epoch N's
merged state is a pure function of the prior state and batch N.

Unlike the HLL monitor there is no float question anywhere: counters are
integers, so the streamed state after ANY micro-batch split equals the
batch sketch over the union of the inputs EXACTLY — pinned by the
stream==batch parity test in tests/test_streaming_dedup.py. The batch
twin registered with the driver is ``cms_topk``.
"""

from __future__ import annotations


from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.sketch import CMS_D, _CMS_COL, _CMS_H, cms_table
from .availablenow import PAGES_SCHEMA, drain_available_now, latest_state

_SUBDIR = "counters"
_COLS = ["r", "col", "counter"]


def _latest_state(spark: SparkSession, output_dir: str,
                  before_batch: int | None = None) -> DataFrame | None:
    return latest_state(spark, output_dir, _SUBDIR, _COLS,
                        before_batch=before_batch)


def merge_counters(a: DataFrame, b: DataFrame) -> DataFrame:
    """Counter-wise sum — the CMS union. d×w-row inputs and output."""
    return (a.unionByName(b)
            .groupBy("r", "col").agg(F.sum("counter").alias("counter")))


def fold_batch(spark: SparkSession, output_dir: str, batch_df: DataFrame,
               batch_id: int, key: str = "url") -> DataFrame:
    """Epoch ``batch_id``'s merged state: prior state (strictly BEFORE
    this epoch — counter addition is NOT idempotent, so a replayed epoch
    must re-fold from state N-1, never from its own partially-committed
    output; see ``availablenow.latest_state``) plus this batch's
    counters. A pure function of (prior state, batch), so replay
    overwrites an identical ``batch_id=N`` partition."""
    batch_cms = cms_table(batch_df.select(key), key=key)
    prev = _latest_state(spark, output_dir, before_batch=batch_id)
    return batch_cms if prev is None else merge_counters(prev, batch_cms)


def run_frequency_monitor(spark: SparkSession, input_dir: str,
                          output_dir: str, key: str = "url",
                          checkpoint_dir: str | None = None,
                          timeout_sec: int = 600) -> int:
    """Drain available page files, folding each micro-batch's count-min
    counters into the running state. Returns micro-batches processed."""

    def outputs(batch_df: DataFrame, batch_id: int) -> dict[str, DataFrame]:
        return {_SUBDIR: fold_batch(spark, output_dir, batch_df,
                                    batch_id, key=key)}

    stream = (spark.readStream.schema(PAGES_SCHEMA).parquet(input_dir)
              .select(key))
    # each epoch partition is a COMPLETE merged sketch — older epochs are
    # pure history, so prune them or a long-running monitor's state dir
    # grows one d×w copy per micro-batch forever (keep 3 for replay)
    return drain_available_now(stream, output_dir, outputs,
                               checkpoint_dir=checkpoint_dir,
                               timeout_sec=timeout_sec,
                               label="frequency monitor",
                               keep_state_epochs=3)


def estimate_from_state(spark: SparkSession, output_dir: str,
                        probes: DataFrame, key: str = "url") -> DataFrame:
    """CMS point estimates (min over the d hashed counters) for the given
    probe keys against the merged state. Missing counters count as 0 (an
    empty cell just never collided)."""
    state = _latest_state(spark, output_dir)
    hr = _CMS_H.replace("user_id", key)
    probed = (probes.select(key, F.explode(
                  F.array(*[F.lit(i) for i in range(CMS_D)])).alias("r"))
              .withColumn("hr", F.expr(hr))
              .select(key, "r", F.expr(_CMS_COL).alias("col")))
    if state is None:
        return probed.groupBy(key).agg(F.lit(0).cast("long").alias("cms_estimate"))
    return (probed.join(state, ["r", "col"], "left")
            .groupBy(key)
            .agg(F.min(F.coalesce("counter", F.lit(0)))
                 .cast("long").alias("cms_estimate")))
