"""Accumulator metrics channel (north rule: throughput + skew via Spark
accumulators). The counters must agree with the materialized output, and the
per-task skew reduction must reflect the salted distribution."""

from __future__ import annotations

from pyspark.sql import functions as F

from document_converter_api_spark.operators.extract import extract_pipeline
from document_converter_api_spark.operators.metrics import ExtractionMetrics

from .conftest import PAGES_SMOKE, TEST_MAX_BYTES


def test_accumulators_match_materialized_output(spark):
    pages = spark.read.parquet(PAGES_SMOKE)
    m = ExtractionMetrics(spark)
    results, _rejects = extract_pipeline(pages, max_bytes=TEST_MAX_BYTES,
                                         num_partitions=8,
                                         shuffle_partitions=8, metrics=m)
    agg = results.agg(
        F.count("*").alias("n"),
        F.sum(F.when(F.col("error").isNotNull(), 1).otherwise(0)).alias("f"),
        F.sum(F.when(F.col("error") == "encrypted", 1).otherwise(0))
        .alias("enc"),
        F.sum(F.when(F.col("error") == "needs_ocr", 1).otherwise(0))
        .alias("ocr"),
        F.sum("bytes_in").alias("bi"),
        F.sum("bytes_out").alias("bo")).collect()[0]
    snap = m.snapshot()
    assert snap["docs"] == agg["n"]
    assert snap["failures"] == agg["f"]
    # degradation channel (round-3 verdict item 10): the corpus plants
    # genuinely passworded PDFs, so the encrypted counter must be live
    assert snap["encrypted"] == agg["enc"] and snap["encrypted"] > 0
    assert snap["needs_ocr"] == agg["ocr"]
    assert snap["bytes_in"] == agg["bi"]
    assert snap["bytes_out"] == agg["bo"]
    assert snap["n_tasks"] >= 1
    assert snap["docs_per_sec"] > 0
    assert snap["parse_core_seconds"] >= 0
    assert snap["skew_max_over_median"] is not None
    assert snap["task_ms_max"] >= snap["task_ms_median"]


def test_metrics_accumulate_across_reruns(spark):
    pages = spark.read.parquet(PAGES_SMOKE).limit(50)
    m = ExtractionMetrics(spark)
    per_run = 0
    for _ in range(2):
        results, _ = extract_pipeline(pages, max_bytes=TEST_MAX_BYTES,
                                      num_partitions=4,
                                      shuffle_partitions=4, metrics=m)
        per_run = results.count()
    # live channel counts every processed doc, including reruns — the
    # lineage table, not this, is the correctness record
    assert m.snapshot()["docs"] == 2 * per_run
