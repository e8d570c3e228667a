"""spark-submit entry point for cross-crawl dedup/linkage.

The production composition of the incremental-dedup tier — what
``__spark_entry__``'s ``incremental_dedup`` and ``incremental_minhash``
queries report on, turned into a job that classifies a NEW crawl against
the HISTORICAL corpus and WRITES the verdicts::

    spark-submit --master yarn --py-files dist/pipeline.zip \
        jobs/linkage.py --history s3://bucket/corpus \
        --new s3://bucket/crawl-2026-08-18 \
        --output s3://bucket/linkage --crawl-id 2026-08-18

Per new document, one verdict row:

* ``exact_dup`` — byte-identical text already in history. Bloom filter
  over the historical md5 fingerprints (32 ``bit_or`` words) BROADCAST
  to the new side; only Bloom-positive candidates enter the exact
  semi-join, so the daily crawl never pays a shuffle proportional to
  history (the ``incremental_dedup`` shape).
* ``near_dup`` — shares a MinHash band with a historical doc AND the
  best match's signature agreement clears ``--min-agree`` (default 4 of
  8 slots ≈ Jaccard 0.5). Candidates come from a band equi-join against
  the historical banded index — write-once, bucketable by band key
  (sources/bucketed.py), so recurring crawls shuffle only themselves
  (the ``incremental_minhash`` shape). Exact dups are excluded from the
  fuzzy stage: their linkage is already stronger.
* ``fresh`` — neither.

Output: ManifestTable under ``<output>/linkage`` with idempotent
replace-on-rerun per ``--crawl-id``, plus a JSON stats line on stdout.
Deterministic end to end (md5/MinHash only — no rand(), no uuid), so a
killed run reruns to the identical table.
"""

from __future__ import annotations

import argparse
import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_MIN_AGREE = 4  # of N_MINHASH=8 slots; unbiased Jaccard >= 0.5


class HistoryIndex:
    """The crawl-invariant history artifacts: persisted md5 fingerprints,
    the (tiny) Bloom word table derived from them, and persisted MinHash
    signatures. Build ONCE per history and reuse across crawls /
    micro-batches — rebuilding it per batch re-scans and re-hashes the
    full historical corpus every time. Call :meth:`release` when done;
    Spark's CacheManager never garbage-collects DataFrame caches."""

    def __init__(self, fp: DataFrame, bloom: DataFrame, sigs: DataFrame):
        self.fp, self.bloom, self.sigs = fp, bloom, sigs

    def release(self) -> None:
        for df in (self.fp, self.sigs):
            try:
                df.unpersist()
            except Exception:
                pass


def build_history_index(spark: SparkSession,
                        history: DataFrame) -> HistoryIndex:
    from document_converter_api_spark.operators.dedup import _sig_frame
    from document_converter_api_spark.operators.scan import widen
    from document_converter_api_spark.operators.sketch import bloom_words

    history = widen(history).select("doc_id", "text")
    # fingerprints feed the Bloom build AND the exact semi-join; at a
    # 10^12-doc history where even md5-only rows strain the cache tier,
    # swap the persist for a write-once fingerprint table
    # (sources/bucketed.py) — the two-consumer shape is unchanged
    fp = history.select(F.md5("text").alias("fp")).persist()
    return HistoryIndex(fp=fp, bloom=bloom_words(fp, key="fp"),
                        sigs=_sig_frame(history).persist())


def link_crawl(spark: SparkSession, history: DataFrame | None,
               new: DataFrame, min_agree: int = DEFAULT_MIN_AGREE,
               index: HistoryIndex | None = None) -> DataFrame:
    """Verdicts for every row of ``new`` against ``history`` (both
    ``(doc_id, text)``): ``(doc_id, verdict, match_id, sig_agree,
    n_candidates)``. ``match_id``/``sig_agree`` are populated for every
    banded candidate (even sub-threshold ones — callers tune the cut
    without rerunning), NULL/0 when no band matched.

    Pass a prebuilt ``index`` (see :func:`build_history_index`) to reuse
    the history artifacts across calls — the streaming drain does this
    per micro-batch. Without one, the index is held in a process-wide
    keyed-swap cache (``_persist_swap``): bounded at one live copy per
    key, so repeated calls never pile caches, and the previous call's
    lazy verdicts stay correct (they recompute if collected late)."""
    from document_converter_api_spark.operators.dedup import (
        _persist_swap, _sig_frame, best_band_match,
    )
    from document_converter_api_spark.operators.scan import widen
    from document_converter_api_spark.operators.sketch import (
        bloom_probe_cells, bloom_words,
    )

    new = widen(new).select("doc_id", "text")
    if index is not None:
        old_fp, filt, old_sigs = index.fp, index.bloom, index.sigs
    else:
        history = widen(history).select("doc_id", "text")
        old_fp = _persist_swap(
            "linkage_old_fp", history.select(F.md5("text").alias("fp")))
        filt = bloom_words(old_fp, key="fp")
        old_sigs = _persist_swap("linkage_old_sigs", _sig_frame(history))

    # --- exact tier: Bloom prefilter broadcast, exact semi-join on hits
    new_fp = new.select("doc_id", F.md5("text").alias("fp"))
    probes = bloom_probe_cells(new_fp, key="fp")
    cand = (probes.join(F.broadcast(filt), "word", "left")
            .select("doc_id", "fp",
                    ((F.coalesce(F.col("bits"), F.lit(0))
                      .bitwiseAND(F.col("mask"))) == F.col("mask"))
                    .alias("hit"))
            .groupBy("doc_id", "fp")
            .agg(F.bool_and("hit").alias("is_candidate")))
    exact = (cand.filter(F.col("is_candidate"))
             .join(old_fp.distinct(), "fp", "left_semi")
             .select("doc_id", F.lit(1).alias("is_exact")))

    # --- fuzzy tier over the non-exact remainder only, via the SAME
    # best-match core the oracle-checked incremental_minhash query uses
    fuzz_in = new.join(exact, "doc_id", "left_anti")
    new_sigs = _persist_swap("linkage_new_sigs", _sig_frame(fuzz_in))
    near = (best_band_match(new_sigs, old_sigs)
            .withColumnRenamed("new_id", "doc_id"))

    verdict = (F.when(F.col("is_exact") == 1, F.lit("exact_dup"))
               .when(F.col("sig_agree") >= min_agree, F.lit("near_dup"))
               .otherwise(F.lit("fresh")))
    return (new.select("doc_id")
            .join(exact, "doc_id", "left")
            .join(near, "doc_id", "left")
            .select("doc_id", verdict.alias("verdict"), "match_id",
                    F.coalesce("sig_agree", F.lit(0)).cast("int")
                    .alias("sig_agree"),
                    F.coalesce("n_candidates", F.lit(0)).cast("long")
                    .alias("n_candidates")))


def run_linkage_job(spark: SparkSession, history_path: str, new_path: str,
                    output_root: str, crawl_id: str,
                    min_agree: int = DEFAULT_MIN_AGREE) -> dict:
    from document_converter_api_spark.sources.tableio import ManifestTable

    history = spark.read.parquet(history_path).select("doc_id", "text")
    new = spark.read.parquet(new_path).select("doc_id", "text")
    verdicts = link_crawl(spark, history, new, min_agree=min_agree)
    verdicts = verdicts.withColumn("crawl_id", F.lit(crawl_id)).persist()
    try:
        table = ManifestTable(os.path.join(output_root, "linkage"))
        # commit_key = crawl_id: reruns REPLACE this crawl's verdicts
        # atomically instead of appending a second copy
        table.replace_group(verdicts, commit_key=crawl_id)
        stats = {"crawl_id": crawl_id, "min_agree": min_agree,
                 "verdicts": {r.verdict: r.n for r in
                              verdicts.groupBy("verdict")
                              .agg(F.count("*").alias("n")).collect()}}
    finally:
        verdicts.unpersist()
    stats["new_docs"] = sum(stats["verdicts"].values())
    return stats


def main() -> None:
    ap = argparse.ArgumentParser(description="cross-crawl linkage job")
    ap.add_argument("--history", required=True,
                    help="historical corpus parquet path")
    ap.add_argument("--new", required=True, dest="new_path",
                    help="new crawl parquet path")
    ap.add_argument("--output", required=True, help="output root")
    ap.add_argument("--crawl-id", required=True,
                    help="idempotency key; reruns replace this crawl's rows")
    ap.add_argument("--min-agree", type=int, default=DEFAULT_MIN_AGREE,
                    help="MinHash slots (of 8) the best match must agree "
                         "on to call near_dup")
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    args = ap.parse_args()

    builder = (SparkSession.builder.appName("crawl-linkage")
               .config("spark.sql.adaptive.enabled", "true")
               .config("spark.sql.session.timeZone", "UTC"))
    if args.shuffle_partitions:
        builder = builder.config("spark.sql.shuffle.partitions",
                                 str(args.shuffle_partitions))
    spark = builder.getOrCreate()
    stats = run_linkage_job(spark, args.history, args.new_path,
                            args.output, args.crawl_id,
                            min_agree=args.min_agree)
    print(json.dumps(stats))
    spark.stop()


if __name__ == "__main__":
    main()
