"""One executor-JVM of the multi-executor scaling fleet: processes the
url-hash shard ``pmod(xxhash64(url), num_shards) == shard`` of the corpus
through the full extraction stage. Prints {"docs": N, "secs": S}."""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument("--shard", type=int, required=True)
    ap.add_argument("--num-shards", type=int, required=True)
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from document_converter_api_spark.operators.extract import extract_pipeline

    spark = (
        SparkSession.builder.master(f"local[{args.cores}]")
        .appName(f"exec-shard-{args.shard}")
        .config("spark.driver.memory", "8g")
        .config("spark.sql.files.maxPartitionBytes", "4m")
        .config("spark.sql.shuffle.partitions", str(args.cores * 2))
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "512")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    pages = (spark.read.parquet(args.input)
             .filter(F.pmod(F.xxhash64("url"), F.lit(args.num_shards))
                     == args.shard))
    t0 = time.time()
    results, _ = extract_pipeline(pages, num_partitions=args.cores * 2,
                                  shuffle_partitions=args.cores * 2)
    docs = results.count()
    print(json.dumps({"docs": docs, "secs": round(time.time() - t0, 2)}))
    spark.stop()


if __name__ == "__main__":
    main()
