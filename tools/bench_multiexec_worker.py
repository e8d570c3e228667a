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
    ap.add_argument("--sync-dir", default=None,
                    help="barrier dir: write ready_<shard>, wait for 'go' "
                         "so every worker's timed window starts together "
                         "(steady state, not overlapped with siblings' JVM "
                         "startup/JIT)")
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from document_converter_api_spark.operators.extract import extract_pipeline

    # Cap JVM service threads to the executor's core budget: each JVM sizes
    # GC/JIT pools for the whole 32-core host by default, so a 4-executor
    # fleet would run 4x32 service threads against 8 task cores — the same
    # -XX caps a real multi-executor-per-host deployment sets.
    jvm_opts = (f"-XX:ParallelGCThreads={max(2, args.cores)} "
                f"-XX:ConcGCThreads=1 -XX:CICompilerCount=2 "
                f"-XX:ActiveProcessorCount={args.cores}")
    spark = (
        SparkSession.builder.master(f"local[{args.cores}]")
        .appName(f"exec-shard-{args.shard}")
        .config("spark.driver.memory", "8g")
        .config("spark.driver.extraJavaOptions", jvm_opts)
        .config("spark.sql.files.maxPartitionBytes", "4m")
        .config("spark.sql.shuffle.partitions", str(args.cores * 2))
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    pages = spark.read.parquet(args.input)
    if args.num_shards > 1:
        # fallback path: shard by filtering the shared corpus (forces every
        # worker to scan the full file — prefer pre-split shard files, which
        # is what a cluster's shuffle hands each executor)
        pages = pages.filter(
            F.pmod(F.xxhash64("url"), F.lit(args.num_shards)) == args.shard)
    # warm the Python worker pool + JIT before the timed window, full width;
    # 2000 docs ≈ enough invocations for C2 to compile the hot paths (a
    # 64-doc warmup left fleet workers measuring mostly-interpreted code)
    warm, _ = extract_pipeline(pages.limit(2000),
                               num_partitions=args.cores * 2,
                               shuffle_partitions=args.cores * 2)
    warm.count()
    if args.sync_dir:
        with open(os.path.join(args.sync_dir, f"ready_{args.shard}"), "w"):
            pass
        go = os.path.join(args.sync_dir, "go")
        deadline = time.time() + 300
        while not os.path.exists(go) and time.time() < deadline:
            time.sleep(0.05)
    t0 = time.time()
    results, _ = extract_pipeline(pages, num_partitions=args.cores * 2,
                                  shuffle_partitions=args.cores * 2)
    docs = results.count()
    print(json.dumps({"docs": docs, "secs": round(time.time() - t0, 2)}))
    spark.stop()


if __name__ == "__main__":
    main()
