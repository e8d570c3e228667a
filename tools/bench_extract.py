"""Extraction-throughput probe at a given parallelism, for the N-vs-4N
scaling-efficiency evidence (BASELINE.md §2; sandbox substitute for two
cluster sizes per the driver instruction).

Prints one JSON line: {"cores": K, "docs": N, "secs": S, "docs_per_sec": R,
"busy_cores": C, "steal_cores": T}.

Timing covers the extraction stage action only (warm session, full-
parallelism warmup) so JVM startup doesn't pollute the scaling ratio.
``busy_cores``/``steal_cores`` are sampled from /proc/stat during the timed
window: this sandbox is a VM with hypervisor steal up to ~10 vCPUs (measured),
so BENCH/BASELINE.md reports both raw efficiency (thr ratio / core ratio) and
CPU-normalized efficiency (thr ratio / busy-core ratio) — the latter isolates
the pipeline's scaling from the neighbors'.
"""

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
    ap.add_argument("--cores", type=int, required=True)
    ap.add_argument("--input", required=True)
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    ap.add_argument("--arrow-batch", type=int, default=2048)
    ap.add_argument("--replicate", type=int, default=1,
                    help="union R url-suffixed copies so the measured window "
                         "is compute-dominated, not startup-dominated")
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from document_converter_api_spark.operators.extract import extract_pipeline

    n_shuffle = args.shuffle_partitions or args.cores
    spark = (
        SparkSession.builder.master(f"local[{args.cores}]")
        .appName(f"bench-extract-{args.cores}")
        # local mode runs executors inside the driver JVM: the default 1g
        # heap GC-thrashes above ~8 concurrent tasks (measured 2.5x slowdown)
        .config("spark.driver.memory", "16g")
        # single-file corpus: split the scan fine enough to parallelize the
        # sniff+shuffle-write map stage (100 TB inputs have many files and
        # keep the 128m default)
        .config("spark.sql.files.maxPartitionBytes", "4m")
        .config("spark.sql.shuffle.partitions", str(n_shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch",
                str(args.arrow_batch))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    pages = spark.read.parquet(args.input)
    # Warmup at FULL parallelism: spawns every Python worker + JIT before the
    # timed window (a cores/4-wide warmup leaves 3/4 of the workers paying
    # import cost inside the measurement — measured ~1.5 s each).
    warm, _ = extract_pipeline(pages.limit(args.cores * 32),
                               num_partitions=n_shuffle,
                               shuffle_partitions=n_shuffle)
    warm.count()
    if args.replicate > 1:
        base = pages
        copies = [base.withColumn(
            "url", F.concat(F.col("url"), F.lit(f"?rep={k}")))
            for k in range(args.replicate)]
        pages = copies[0]
        for c in copies[1:]:
            pages = pages.unionAll(c)
    sampler = _CpuSampler()
    sampler.start()
    t0 = time.time()
    results, rejects = extract_pipeline(pages, num_partitions=n_shuffle,
                                        shuffle_partitions=n_shuffle)
    docs = results.count()
    secs = time.time() - t0
    busy, steal = sampler.stop()
    print(json.dumps({"cores": args.cores, "docs": docs,
                      "secs": round(secs, 3),
                      "docs_per_sec": round(docs / secs, 2),
                      "busy_cores": busy, "steal_cores": steal}))
    spark.stop()


class _CpuSampler:
    """Mean busy (user+nice+sys) and stolen cores over the sampled window."""

    def __init__(self) -> None:
        self._stop = False
        self._thread = None
        self._samples: list[tuple[float, float]] = []

    @staticmethod
    def _read() -> list[int]:
        with open("/proc/stat") as f:
            return list(map(int, f.readline().split()[1:9]))

    def _loop(self) -> None:
        import multiprocessing
        ncpu = multiprocessing.cpu_count()
        prev = self._read()
        while not self._stop:
            time.sleep(1)
            cur = self._read()
            d = [c - p for c, p in zip(cur, prev)]
            tot = sum(d)
            if tot > 0:
                self._samples.append((ncpu * (d[0] + d[1] + d[2]) / tot,
                                      ncpu * d[7] / tot))
            prev = cur

    def start(self) -> None:
        import threading
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def stop(self) -> tuple[float, float]:
        self._stop = True
        if self._thread:
            self._thread.join()
        if not self._samples:
            return 0.0, 0.0
        busy = sum(s[0] for s in self._samples) / len(self._samples)
        steal = sum(s[1] for s in self._samples) / len(self._samples)
        return round(busy, 2), round(steal, 2)


if __name__ == "__main__":
    main()
