"""Transport fidelity across Arrow batch geometries.

Byte-identity must not depend on how rows are sliced into RecordBatches:
pathological maxRecordsPerBatch values (1-row batches, giant batches) and
the UDF's own byte-based re-slicing must all produce the identical markdown
per url. This pins the `_slice_batches` logic and large_string handling
independently of the default test configuration (512)."""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest

from document_converter_api_spark.operators.extract import (
    prepare_pages,
    run_extract,
)

from .conftest import GOLDENS_SMOKE, PAGES_SMOKE, TEST_MAX_BYTES


@pytest.mark.parametrize("batch_rows,max_batch_bytes", [
    (1, 64 * 1024 * 1024),       # one-row batches from the JVM side
    (10000, 64 * 1024 * 1024),   # giant JVM batches
    (10000, 64 * 1024),          # tiny byte budget → heavy UDF re-slicing
])
def test_markdown_identical_across_batch_geometry(spark, batch_rows,
                                                  max_batch_bytes):
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch",
                   str(batch_rows))
    try:
        pages = spark.read.parquet(PAGES_SMOKE).limit(120)
        valid, _ = prepare_pages(pages, max_bytes=TEST_MAX_BYTES,
                                 num_partitions=8)
        results = run_extract(valid, shuffle_partitions=8,
                              max_batch_bytes=max_batch_bytes)
        got = {r.url: r.markdown for r in results.collect()}
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    gold = pq.read_table(GOLDENS_SMOKE)
    golden = dict(zip(gold.column("url").to_pylist(),
                      gold.column("markdown").to_pylist()))
    diffs = [u for u, md in got.items() if golden.get(u) != md]
    assert diffs == [], f"{len(diffs)} docs differ under batch geometry " \
                        f"({batch_rows} rows, {max_batch_bytes} bytes)"
