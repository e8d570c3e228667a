"""spark-submit entry point for the full crawl→training-corpus build.

The end-to-end composition the webtext scope exists for — every tier in
one resumable job::

    spark-submit --master yarn --py-files dist/pipeline.zip \
        jobs/webcorpus.py --input s3://bucket/pages \
        --output s3://bucket/corpus --langs en,es

Stages (each a tier this repo ships and oracle-checks separately):

1. **crawl-control gate** (``operators/headtags.crawl_gate``) — drop
   robots-``noindex`` pages and collapse canonical-URL duplicate
   clusters BEFORE extraction: every gated page is Arrow-stage compute
   saved. URL-level dedup needs no content bytes at all.
2. **extraction** (``plans/pipeline.run_extraction_job`` with
   ``gate=True``) — the salted, Arrow-batched HTML/PDF/DOCX →
   markdown core with the charset tier (BOM / declared windows-1252 /
   UTF-16 legacy pages decode inline), size gate, format gate,
   per-doc error capture, AND per-partition lineage: a killed build
   re-submitted with the same output root resumes at partition
   granularity, never re-paying completed Arrow work.
3. **materialize** the extracted docs table (plain parquet under
   ``<output>/extracted``) — the curation checkpoint boundary: a
   re-run of curation never re-pays extraction.
4. **curation** (``jobs/curate.run_curation_job``) — exact dedup,
   Gopher gate, language-ID filter, PII redaction, deterministic
   splits; optional shard packing / repetition strip / perplexity cut.

Deterministic end to end: stats for the same input are identical
across reruns (verified by ``tests/test_webcorpus_job.py``).
"""

from __future__ import annotations

import argparse
import json
import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def run_webcorpus_job(spark: SparkSession, input_path: str,
                      output_root: str,
                      langs: tuple[str, ...] = ("en",),
                      max_bytes: int | None = None,
                      partitions: int = 64,
                      pack_budget: int | None = None,
                      strip_lines: bool = False,
                      drop_ppl_tail: bool = False) -> dict:
    """Crawl → gate → extract → curate, with the extraction stage on
    the lineage-resumable pipeline (``plans/pipeline.run_extraction_job``
    with ``gate=True``): a killed build re-submitted with the same
    ``output_root`` skips completed partition granules instead of
    re-paying the Arrow stage — the north-rule checkpoint contract
    carried into the end-to-end job."""
    from document_converter_api_spark.operators.extract import MAX_FILE_SIZE
    from document_converter_api_spark.plans.pipeline import (
        run_extraction_job,
    )
    from document_converter_api_spark.sources.tableio import ManifestTable
    from jobs.curate import run_curation_job

    n_pages = spark.read.parquet(input_path).count()
    ex_root = os.path.join(output_root, "extraction")
    ex_stats = run_extraction_job(
        spark, input_path, ex_root,
        num_partitions=partitions,
        max_bytes=max_bytes or MAX_FILE_SIZE,
        gate=True)

    results = ManifestTable(os.path.join(ex_root, "results")).read(spark)
    ok = results.filter(F.col("error").isNull()
                        & F.col("markdown").isNotNull())
    # doc_id is the url hash — stable across reruns, and the
    # (doc_id, url) map rides along so corpus rows stay traceable to
    # their source pages
    extracted = ok.select(
        F.xxhash64("url").alias("doc_id"),
        "url", "lang",
        F.col("markdown").alias("text"))
    extracted_path = os.path.join(output_root, "extracted")
    extracted.write.mode("overwrite").parquet(extracted_path)
    n_extracted = spark.read.parquet(extracted_path).count()

    stats = run_curation_job(
        spark, extracted_path, output_root, langs,
        pack_budget=pack_budget, strip_lines=strip_lines,
        drop_ppl_tail=drop_ppl_tail)
    stats.update({
        "input_pages": n_pages,
        "extracted_docs": n_extracted,
        "extraction": {k: ex_stats.get(k) for k in
                       ("resumed", "skipped_partitions",
                        "processed_partitions", "docs", "failures",
                        "bytes_in", "bytes_out")},
    })
    return stats


def main() -> None:  # pragma: no cover - CLI
    ap = argparse.ArgumentParser(description="crawl → training corpus job")
    ap.add_argument("--input", required=True, help="pages parquet path")
    ap.add_argument("--output", required=True, help="output root")
    ap.add_argument("--langs", default="en")
    ap.add_argument("--max-bytes", type=int, default=None)
    ap.add_argument("--partitions", type=int, default=64,
                    help="lineage granules for the resumable extraction")
    ap.add_argument("--pack-budget", type=int, default=None)
    ap.add_argument("--strip-repeated-lines", action="store_true")
    ap.add_argument("--drop-ppl-tail", action="store_true")
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    args = ap.parse_args()

    builder = (SparkSession.builder.appName("webcorpus")
               .config("spark.sql.adaptive.enabled", "true")
               .config("spark.sql.session.timeZone", "UTC"))
    if args.shuffle_partitions:
        builder = builder.config("spark.sql.shuffle.partitions",
                                 str(args.shuffle_partitions))
    spark = builder.getOrCreate()
    stats = run_webcorpus_job(
        spark, args.input, args.output,
        tuple(args.langs.split(",")),
        max_bytes=args.max_bytes, partitions=args.partitions,
        pack_budget=args.pack_budget,
        strip_lines=args.strip_repeated_lines,
        drop_ppl_tail=args.drop_ppl_tail)
    print(json.dumps(stats))


if __name__ == "__main__":  # pragma: no cover
    main()
