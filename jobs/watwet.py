"""spark-submit entry point deriving the WAT + WET products from a crawl.

Common Crawl publishes three artifacts per segment: the raw WARC, the
WAT (per-page metadata + outlinks as JSON in ``metadata`` records) and
the WET (extracted plain text in ``conversion`` records). The reference
service (``/root/reference/app/main.py``) converts one uploaded document
at a time; this job is the batch equivalent that produces the standard
crawl-ecosystem products from the whole corpus in one pass::

    spark-submit --master yarn --py-files dist/pipeline.zip \
        jobs/watwet.py --input s3://bucket/segments/'*.warc.gz' \
        --input-format warc --output /mnt/warehouse/derived

(Input paths go through Spark's Hadoop readers — object-store URLs
work; the WARC shard sink writes with plain file APIs, so ``--output``
must be a SHARED mounted filesystem, see ``write_warc_shards``.)

Stages:

1. **read** — native WARC segments (``sources/warc.read_warc``: one
   task per file, file-grain error capture) or a pages parquet table.
2. **WAT** — a pure scan projection over the RAW pages: outlink hrefs
   (the same anchor regex the linkgraph tier oracle-checks), head
   title, payload byte length, serialized with Catalyst ``to_json`` —
   no Python, no shuffle; written as ``metadata`` records.
3. **gate + extract** — ``headtags.crawl_gate`` then the Arrow
   extraction core; per-doc failures flow as error rows, never raise.
4. **WET** — surviving pages' PLAIN TEXT (markdown post-processed by
   the same expression the oracles pin), joined back to the crawl
   timestamps on url (both sides keyed on url: one co-partitioned
   Exchange pair at corpus scale), written as ``conversion`` records.

Sharding: both sinks are ``sources/warc.write_warc_shards`` — one WARC
member file per partition, the shape CC itself publishes. Shard
contents are made deterministic by a range partition on url.
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def wat_records(pages: DataFrame) -> DataFrame:
    """(url, warc_ts, payload JSON-bytes) — WAT is metadata of the RAW
    crawl (pre-gate: a WAT consumer sees every fetched page)."""
    from document_converter_api_spark.operators.linkgraph import HREF_RE

    body = F.decode("html", "ISO-8859-1")
    meta = F.struct(
        F.col("url").alias("url"),
        F.date_format("warc_ts", "yyyy-MM-dd'T'HH:mm:ss'Z'").alias("ts"),
        F.octet_length("html").alias("n_bytes"),
        F.regexp_extract(body, "<title>([^<]*)</title>", 1).alias("title"),
        F.when(F.col("url").endswith(".html")
               | F.col("url").endswith(".htm"),
               F.regexp_extract_all(body, F.lit(HREF_RE), 1))
        .otherwise(F.array().cast("array<string>")).alias("outlinks"),
    )
    return pages.select(
        "url", "warc_ts",
        F.encode(F.to_json(meta), "utf-8").alias("payload"))


def wet_records(results: DataFrame, pages: DataFrame) -> DataFrame:
    """(url, warc_ts, payload text-bytes) for every successfully
    extracted page — the WET product. ``results`` must carry
    ``plain_text`` (``plans/pipeline.postprocess_results``)."""
    ok = (results.filter(F.col("error").isNull()
                         & F.col("plain_text").isNotNull())
          .select("url", "plain_text"))
    ts = pages.select("url", "warc_ts")
    return (ok.join(ts, "url")
            .select("url", "warc_ts",
                    F.encode("plain_text", "utf-8").alias("payload")))


def run_watwet_job(spark: SparkSession, input_path: str, output_root: str,
                   input_format: str = "parquet",
                   num_partitions: int = 8,
                   shards: int = 4) -> dict:
    import os

    from document_converter_api_spark.operators.extract import (
        extract_pipeline,
    )
    from document_converter_api_spark.operators.headtags import crawl_gate
    from document_converter_api_spark.plans.pipeline import (
        postprocess_results,
    )
    from document_converter_api_spark.sources.warc import (
        read_warc, write_warc_shards,
    )

    if input_format == "warc":
        pages = (read_warc(spark, input_path)
                 .filter(F.col("warc_type") != "error")
                 .select("url", "warc_ts", "html")
                 .withColumn("lang", F.lit(None).cast("string")))
    else:
        pages = spark.read.parquet(input_path)
        if "lang" not in pages.columns:
            pages = pages.withColumn("lang", F.lit(None).cast("string"))
        pages = pages.select("url", "warc_ts", "html", "lang")

    # deterministic shard BYTES: range-partition every sink input on url
    # (shard k holds the same url interval on every rerun) AND sort
    # within partitions — repartitionByRange alone plans a bare Exchange
    # with no local Sort, so in-shard record order would follow
    # nondeterministic shuffle-fetch order on a real cluster
    wat = (wat_records(pages).repartitionByRange(shards, "url")
           .sortWithinPartitions("url"))
    wat_stats = write_warc_shards(
        wat, os.path.join(output_root, "wat"), record_type="metadata",
        content_type="application/json").collect()

    gated = crawl_gate(pages)
    results, _rejects = extract_pipeline(
        gated, num_partitions=num_partitions,
        shuffle_partitions=num_partitions)
    wet = (wet_records(postprocess_results(results), pages)
           .repartitionByRange(shards, "url")
           .sortWithinPartitions("url"))
    wet_stats = write_warc_shards(
        wet, os.path.join(output_root, "wet"), record_type="conversion",
        content_type="text/plain").collect()

    return {
        "input_pages": pages.count(),
        "wat_records": int(sum(r.n_records for r in wat_stats)),
        "wat_shards": len(wat_stats),
        "wat_bytes": int(sum(r.n_bytes for r in wat_stats)),
        "wet_records": int(sum(r.n_records for r in wet_stats)),
        "wet_shards": len(wet_stats),
        "wet_bytes": int(sum(r.n_bytes for r in wet_stats)),
    }


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True)
    ap.add_argument("--input-format", default="parquet",
                    choices=("parquet", "warc"))
    ap.add_argument("--output", required=True)
    ap.add_argument("--partitions", type=int, default=8)
    ap.add_argument("--shards", type=int, default=4)
    args = ap.parse_args()
    spark = (SparkSession.builder.appName("watwet")
             .config("spark.sql.session.timeZone", "UTC").getOrCreate())
    stats = run_watwet_job(spark, args.input, args.output,
                           input_format=args.input_format,
                           num_partitions=args.partitions,
                           shards=args.shards)
    print(json.dumps(stats))


if __name__ == "__main__":
    main()
