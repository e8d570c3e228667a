"""spark-submit entry point for the corpus-curation pipeline.

The production composition of the curation tier — what
``__spark_entry__``'s ``corpus_curation`` query reports on, turned into
a job that actually WRITES the curated corpus::

    spark-submit --master yarn --py-files dist/pipeline.zip \
        jobs/curate.py --input s3://bucket/documents \
        --output s3://bucket/curated --langs en,es

Stages, all single-pass Catalyst over one dedup shuffle:

1. exact dedup — canonical (min doc_id) document per md5(text); lang and
   text ride the struct-min, so no join-back;
2. Gopher quality gate (word-count / word-length / alpha-fraction /
   duplicate-2-gram bounds);
3. language-ID filter — keep documents whose PREDICTED language is in
   ``--langs`` (the upstream label is not trusted);
4. PII redaction (email / NANP phone / IPv4 → placeholders);
5. deterministic train/val/test split assignment (salted md5 draw — the
   same row lands in the same split on every rerun/retry);
6. write: ManifestTable per split under ``<output>/curated/<split>``
   plus a JSON stats line on stdout.

Deterministic end to end: a pure function of the input table, verified
by the rerun test in ``tests/test_curate_job.py``.
"""

from __future__ import annotations

import argparse
import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def curate(docs: DataFrame, langs: tuple[str, ...],
           strip_lines: bool = False,
           drop_ppl_tail: bool = False) -> DataFrame:
    """The curation DAG over a (doc_id, lang, text) table; returns the
    curated rows with ``split`` and ``redacted`` columns.

    ``strip_lines`` runs RefinedWeb within-document repetition removal
    BEFORE exact dedup (so near-copies differing only in repeated
    boilerplate lines canonicalize together); ``drop_ppl_tail`` drops the
    least-fluent per-language tercile of the bigram LM score (CCNet's
    tail cut) after the quality/lang gates. Both reuse the ORACLED
    operator expressions (q_doc_line_dedup / q_perplexity_buckets)."""
    from document_converter_api_spark.operators.curation import (
        redact_expr, strip_repeated_lines, with_perplexity_bucket,
    )
    from document_converter_api_spark.operators.sampling import split_expr
    from document_converter_api_spark.operators.scan import widen
    from document_converter_api_spark.operators.text_analysis import (
        with_gopher_signals, with_lang_pred,
    )

    docs = widen(docs)
    if strip_lines:
        docs = strip_repeated_lines(docs).drop("n_kept")
    canon = (docs
             .groupBy(F.md5("text").alias("h"))
             .agg(F.min(F.struct("doc_id", "lang", "text")).alias("s"))
             .select("s.doc_id", "s.lang", "s.text"))
    sig = with_lang_pred(with_gopher_signals(canon))
    kept = (sig.filter((F.col("keep") == 1)
                       & F.col("pred_lang").isin(*langs)))
    if drop_ppl_tail:
        # persist: with_perplexity_bucket references its input ~4x (the
        # LM's token/pair/unigram branches plus the join-back), and
        # `kept` sits on top of the dedup shuffle + HOF-heavy signal
        # projections — ReuseExchange would recover only the shuffle,
        # not the post-exchange projections, so cache the boundary.
        # Keyed swap, not bare persist: CacheManager never GCs, so a
        # long-lived session calling curate() repeatedly would pile one
        # corpus-sized cache per call (round-3 review finding).
        from document_converter_api_spark.operators.dedup import (
            _persist_swap,
        )
        kept = _persist_swap("curate_kept", kept)
        kept = (with_perplexity_bucket(kept, lang_col="pred_lang")
                .filter(F.col("ppl_bucket") != "tail")
                .drop("avg_logp", "ppl_bucket"))
    # redaction and split come from the SAME oracled expressions the
    # operator tier checks (q_pii_redact / q_split_assign) — a diverging
    # copy here would silently re-split or under-redact the corpus
    _, split = split_expr(F.col("doc_id"))
    return kept.select(
        "doc_id", "lang", "pred_lang", "n_words",
        redact_expr(F.col("text")).alias("redacted"),
        split.alias("split"))


def run_curation_job(spark: SparkSession, input_path: str,
                     output_root: str,
                     langs: tuple[str, ...] = ("en",),
                     pack_budget: int | None = None,
                     strip_lines: bool = False,
                     drop_ppl_tail: bool = False) -> dict:
    """``pack_budget`` additionally assigns the TRAIN split to
    fixed-token-budget shards (the oracled ``token_pack`` two-phase
    prefix sum via the shared ``assign_shards``) and writes ``shard_id``
    with the rows — the layout a training loader reads directly."""
    from document_converter_api_spark.operators.curation import assign_shards
    from document_converter_api_spark.sources.tableio import ManifestTable

    docs = (spark.read.parquet(input_path)
            .select("doc_id", "lang", "text"))
    n_input = docs.count()
    # persist: the DAG below it (dedup shuffle + HOF-heavy signal
    # projections) would otherwise re-execute for every per-split write
    # and stats pass — 4 recomputations of the dominant shuffle
    curated = curate(docs, langs, strip_lines=strip_lines,
                     drop_ppl_tail=drop_ppl_tail).persist()
    stats = {"input_docs": n_input, "langs": list(langs), "splits": {}}
    try:
        for split_name in ("train", "validation", "test"):
            part = curated.filter(F.col("split") == split_name).drop("split")
            if pack_budget and split_name == "train":
                # persist=False: 'curated' above is already cached — a
                # second persist here would pin a full extra copy of the
                # train rows (with text) that the finally never releases
                part = (assign_shards(
                    part.withColumn("n_toks", F.col("n_words")),
                    budget=pack_budget, persist=False)
                    .drop("n_toks", "cum_toks"))
            table = ManifestTable(
                os.path.join(output_root, "curated", split_name))
            # commit_key fixed per split: reruns REPLACE the split
            # atomically instead of appending a second copy
            table.replace_group(part, commit_key=split_name)
            stats["splits"][split_name] = {"docs": 0, "words": 0}
        # one stats pass over the persisted result, not one agg per split
        for r in (curated.groupBy("split")
                  .agg(F.count("*").alias("n"),
                       F.sum("n_words").alias("w")).collect()):
            stats["splits"][r.split] = {"docs": r.n, "words": int(r.w)}
    finally:
        curated.unpersist()
    stats["curated_docs"] = sum(s["docs"] for s in stats["splits"].values())
    return stats


def main() -> None:
    ap = argparse.ArgumentParser(description="corpus curation job")
    ap.add_argument("--input", required=True, help="documents parquet path")
    ap.add_argument("--output", required=True, help="output root")
    ap.add_argument("--langs", default="en",
                    help="comma-separated predicted languages to keep")
    ap.add_argument("--pack-budget", type=int, default=None,
                    help="tokens per training shard; assigns shard_id on "
                         "the train split via the token_pack prefix sum")
    ap.add_argument("--strip-repeated-lines", action="store_true",
                    help="RefinedWeb within-doc repetition removal before "
                         "dedup")
    ap.add_argument("--drop-ppl-tail", action="store_true",
                    help="drop the least-fluent per-language tercile of "
                         "the bigram LM score (CCNet tail cut)")
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    args = ap.parse_args()

    builder = (SparkSession.builder.appName("corpus-curate")
               .config("spark.sql.adaptive.enabled", "true")
               .config("spark.sql.session.timeZone", "UTC"))
    if args.shuffle_partitions:
        builder = builder.config("spark.sql.shuffle.partitions",
                                 str(args.shuffle_partitions))
    spark = builder.getOrCreate()
    stats = run_curation_job(
        spark, args.input, args.output,
        tuple(s.strip() for s in args.langs.split(",") if s.strip()),
        pack_budget=args.pack_budget,
        strip_lines=args.strip_repeated_lines,
        drop_ppl_tail=args.drop_ppl_tail)
    print(json.dumps(stats))
    spark.stop()


if __name__ == "__main__":
    main()
