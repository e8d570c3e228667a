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
    scan already has ≥ cluster-width partitions — i.e. at real corpus scale
    this never reshuffles the input."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
