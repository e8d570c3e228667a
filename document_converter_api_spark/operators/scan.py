"""Scan-shape helpers shared by the operator modules."""

from __future__ import annotations

from pyspark.sql import DataFrame


def widen(df: DataFrame) -> DataFrame:
    """Round-robin repartition a NARROW scan up to cluster width before
    CPU-heavy per-row work (higher-order expressions, Arrow-batched Python
    stages — both compute-bound).

    A small parquet file is often a single row group → a single input split
    → the whole stage runs on one task regardless of cores (measured 3
    tasks on 32 cores at sf0.1 → ~10x underutilization). No-op when the
    input already spans ≥ cluster-width files — i.e. at real corpus scale
    this never reshuffles the input.

    Width is probed via ``df.inputFiles()`` (a listing pulled from the
    logical plan's file indexes), NOT ``df.rdd.getNumPartitions()``: the
    RDD conversion forces a second full physical planning of the subtree
    on every call just to count partitions. File count is a conservative
    proxy for scan splits — many tiny files can coalesce into fewer splits
    (openCostInBytes packing), but a corpus wide in files is wide enough
    that skipping the shuffle is the right call either way."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    try:
        n_files = len(df.inputFiles())
    except Exception:  # plans with no file source (in-memory, streaming)
        n_files = 0
    if n_files >= target:
        return df
    return df.repartition(target)
