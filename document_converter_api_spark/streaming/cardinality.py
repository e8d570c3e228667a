"""Streaming distinct-URL monitor: incremental HyperLogLog register merge.

The crawl-ops question "how many distinct urls have we seen so far" needs
an answer that survives unbounded streams.  ``dropDuplicates`` state grows
with the true cardinality (10^12 keys of state at corpus scale);
``dropDuplicatesWithinWatermark`` (streaming/dedup_stream.py) bounds state
but answers a different, horizon-limited question.  The HLL register table
(operators/sketch.py) is the right state object: EXACTLY 256 rows forever,
and the merge is a register-wise max — associative, commutative,
idempotent-under-replay when each epoch's merged state is written to its
own ``batch_id=N`` partition (epoch N's output is a pure function of the
prior state and batch N, so foreachBatch's at-least-once replay rewrites
the identical rows).

Because the register merge is exact (not an approximation of a merge), the
streamed state after ANY number of micro-batches equals the batch sketch
over the union of the inputs — pinned byte-for-byte by the stream==batch
parity test, the same discipline as sessionize's batch twin.  The batch
twin registered with the driver is ``hll_distinct`` itself.
"""

from __future__ import annotations


from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.sketch import M_REGISTERS, _ALPHA_M2, hll_register_table
from .availablenow import PAGES_SCHEMA, drain_available_now, latest_state

_SUBDIR = "registers"
_COLS = ["register", "rho_max"]


def _latest_state(spark: SparkSession, output_dir: str,
                  before_batch: int | None = None) -> DataFrame | None:
    return latest_state(spark, output_dir, _SUBDIR, _COLS,
                        before_batch=before_batch)


def merge_registers(a: DataFrame, b: DataFrame) -> DataFrame:
    """Register-wise max — the HLL union. 256-row inputs, 256-row output."""
    return (a.unionByName(b)
            .groupBy("register").agg(F.max("rho_max").alias("rho_max")))


def run_cardinality_monitor(spark: SparkSession, input_dir: str,
                            output_dir: str, key: str = "url",
                            checkpoint_dir: str | None = None,
                            timeout_sec: int = 600) -> int:
    """Drain available page files, folding each micro-batch's HLL
    registers into the running state.  Returns micro-batches processed;
    re-triggering after new files land merges only the new files."""

    def outputs(batch_df: DataFrame, batch_id: int) -> dict[str, DataFrame]:
        # register-wise max is idempotent, so folding from max(batch_id)
        # would survive replay too — reading strictly-before state anyway
        # keeps both monitors on the one replay-safe contract
        batch_regs = hll_register_table(batch_df.select(key), key=key)
        prev = _latest_state(spark, output_dir, before_batch=batch_id)
        merged = batch_regs if prev is None else merge_registers(prev, batch_regs)
        return {_SUBDIR: merged}

    stream = (spark.readStream.schema(PAGES_SCHEMA).parquet(input_dir)
              .select(key))
    # each epoch partition is a COMPLETE merged register table — prune
    # old epochs so state stays O(256 rows × keep), not O(epochs)
    return drain_available_now(stream, output_dir, outputs,
                               checkpoint_dir=checkpoint_dir,
                               timeout_sec=timeout_sec,
                               label="cardinality monitor",
                               keep_state_epochs=3)


def estimate_from_state(spark: SparkSession, output_dir: str) -> float:
    """HLL estimate (with linear-counting branch) from the merged state."""
    state = _latest_state(spark, output_dir)
    if state is None:
        return 0.0
    row = (state.agg(F.count("*").alias("hit"),
                     F.sum(F.expr("power(2.0, -rho_max)")).alias("sum_hit"))
           .select(F.expr(
               f"CASE WHEN {_ALPHA_M2} / (sum_hit + ({M_REGISTERS} - hit) * 1.0)"
               f" <= 2.5 * {M_REGISTERS} AND ({M_REGISTERS} - hit) > 0 "
               f"THEN {M_REGISTERS}.0 * ln({M_REGISTERS}.0 / ({M_REGISTERS} - hit)) "
               f"ELSE {_ALPHA_M2} / (sum_hit + ({M_REGISTERS} - hit) * 1.0) END")
               .alias("est"))
           .collect()[0])
    return float(row.est)
