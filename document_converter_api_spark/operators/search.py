"""Relevance-scoring operators over ``documents``: BM25 keyword search and
a hashed-feature linear quality classifier.

Reference parity note: the reference service (``/root/reference/app/
main.py``) converts and stores documents but offers no ranking over them;
these are the retrieval/scoring stages a 100 TB webtext corpus needs for
corpus QA ("which pages match this probe query") and model-based quality
filtering (the fastText/DCLM-classifier shape: hashed bag-of-words ->
linear score -> sigmoid -> keep/drop).

Scale notes per operator:

* ``bm25_search`` — the query's terms are LITERALS, so per-document term
  frequency is a codegen'd array-filter count inside the scan stage: the
  corpus is never exploded into a (doc, term) table and never shuffled on
  a term key (a posting-list build for 3 probe terms over 10^12 docs
  would be the classic accidental-quadratic). The only aggregation is the
  1-row corpus-stats row (N, avgdl, per-term document frequency) — map-
  side combinable, broadcast back via crossJoin — and the final top-k is
  ``TakeOrderedAndProject`` (per-partition heaps, driver merges k rows).
* ``quality_classifier`` — ZERO-shuffle scoring: weights are a pure hash
  of the token (no weights table to distribute), and the per-document sum
  runs as a higher-order ``aggregate(transform(tokens, w), ...)`` inside
  the row — the 10^12-doc plan is a scan-stage projection, nothing else.
  Cross-engine exactness: each weight keeps only the top 20 bits of the
  token's md5, i.e. it is a multiple of 2^-20 bounded by 0.5, so per-doc
  sums stay exactly representable (< 2^33 ulps of 2^-20 needed, double
  has 2^53) and are therefore addition-ORDER-INDEPENDENT — the same
  argument that makes the HLL estimate exact (``operators/sketch.py``).
  The sigmoid is a single exp+divide on bit-identical inputs.

Both have DuckDB twins with identical constants in ``SEARCH_ORACLES``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .scan import widen

# ---------------------------------------------------------------------------
# BM25 probe-query search
# ---------------------------------------------------------------------------

BM25_K1 = 1.2
BM25_B = 0.75
QUERY_TERMS = ("vector", "merge", "customer")
BM25_TOP_K = 15


def q_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k documents for a fixed probe query under BM25 (Robertson
    k1/b form, the idf variant ``ln(1 + (N - df + .5)/(df + .5))``).

    Term frequencies are per-row array-filter counts (no explode, no
    term-keyed shuffle); corpus stats are one broadcast row; the sum over
    query terms is written term-by-term in fixed order so both engines
    add the same doubles in the same sequence."""
    docs = (widen(spark.read.parquet(f"{sf_dir}/documents.parquet"))
            .select("doc_id", F.split("text", " ", -1).alias("toks")))
    for i, t in enumerate(QUERY_TERMS):
        docs = docs.withColumn(
            f"tf_{t}",
            F.size(F.filter("toks", lambda x: x == F.lit(t))).cast("long"))
    docs = docs.withColumn("dl", F.size("toks").cast("long")).drop("toks")

    stats = docs.agg(
        F.count("*").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count("*")).alias("avgdl"),
        *[F.sum((F.col(f"tf_{t}") > 0).cast("long")).alias(f"df_{t}")
          for t in QUERY_TERMS])

    scored = docs.crossJoin(F.broadcast(stats))
    norm = (F.lit(BM25_K1)
            * (F.lit(1.0 - BM25_B)
               + F.lit(BM25_B) * F.col("dl") / F.col("avgdl")))
    score = None
    for t in QUERY_TERMS:
        idf = F.log(
            F.lit(1.0)
            + (F.col("n_docs") - F.col(f"df_{t}") + F.lit(0.5))
            / (F.col(f"df_{t}") + F.lit(0.5)))
        term = (idf * F.col(f"tf_{t}") * F.lit(BM25_K1 + 1.0)
                / (F.col(f"tf_{t}") + norm))
        score = term if score is None else score + term
    return (scored.select(
        "doc_id", "dl",
        *[F.col(f"tf_{t}") for t in QUERY_TERMS],
        F.round(score, 6).alias("bm25"))
        .orderBy(F.col("bm25").desc(), "doc_id")
        .limit(BM25_TOP_K))


# ---------------------------------------------------------------------------
# Hashed-feature linear quality classifier
# ---------------------------------------------------------------------------

# Per-token weight: top 20 bits of md5(token) mapped to [-0.5, 0.5).
# Shared SQL fragment — evaluated by BOTH engines verbatim (same
# instr-on-nibble-alphabet idiom as operators/sketch.py).
_NIB = "'0123456789abcdef'"


def _w_of(var: str) -> str:
    """Weight expression for a token bound to SQL variable ``var``."""
    b20 = " + ".join(
        f"(instr({_NIB}, substring(md5({var}), {i + 1}, 1)) - 1)"
        f" * {16 ** (4 - i)}"
        for i in range(5))
    return f"(CAST({b20} AS DOUBLE) / 1048576.0 - 0.5)"


SIGMOID_GAIN = 4.0  # mean weight in [-.5,.5) -> logit in [-2, 2)


def q_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Score every document with a hashed linear model: mean over tokens
    of ``w(token)``, squashed by a sigmoid; ``keep`` = score >= 0.5.

    The weights are pseudo-random-by-hash — the PLUMBING (hashed feature
    lookup, per-row fold, zero shuffle) is the production shape; swapping
    in trained weights means replacing ``_w_of`` with a broadcast map
    lookup, nothing else moves."""
    w_sum = F.expr(
        "aggregate(transform(toks, t -> " + _w_of("t") + "), "
        "CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)")
    docs = (widen(spark.read.parquet(f"{sf_dir}/documents.parquet"))
            .select("doc_id", F.split("text", " ", -1).alias("toks"))
            .withColumn("n_toks", F.size("toks").cast("long"))
            .withColumn("w_sum", w_sum))
    mean_w = F.col("w_sum") / F.col("n_toks")
    score = F.lit(1.0) / (F.lit(1.0)
                          + F.exp(-F.lit(SIGMOID_GAIN) * mean_w))
    return (docs.select(
        "doc_id", "n_toks",
        F.round(mean_w, 9).alias("mean_w"),
        F.round(score, 9).alias("quality_p"),
        (score >= 0.5).cast("int").alias("keep"))
        .orderBy("doc_id"))


# ---------------------------------------------------------------------------
# DuckDB twins
# ---------------------------------------------------------------------------

def _bm25_oracle() -> str:
    tf_cols = ",\n                 ".join(
        f"CAST(len(list_filter(toks, x -> x = '{t}')) AS BIGINT) AS tf_{t}"
        for t in QUERY_TERMS)
    df_cols = ",\n                 ".join(
        f"CAST(sum(CASE WHEN tf_{t} > 0 THEN 1 ELSE 0 END) AS BIGINT)"
        f" AS df_{t}" for t in QUERY_TERMS)
    score = " + ".join(
        f"(ln(1.0 + (n_docs - df_{t} + 0.5) / (df_{t} + 0.5))"
        f" * tf_{t} * {BM25_K1 + 1.0}"
        f" / (tf_{t} + {BM25_K1} * ({1.0 - BM25_B}"
        f" + {BM25_B} * dl / avgdl)))"
        for t in QUERY_TERMS)
    tf_list = ", ".join(f"tf_{t}" for t in QUERY_TERMS)
    return f"""
        WITH d AS (
          SELECT doc_id, str_split(text, ' ') AS toks FROM documents),
        t AS (
          SELECT doc_id,
                 CAST(len(toks) AS BIGINT) AS dl,
                 {tf_cols}
          FROM d),
        s AS (
          SELECT count(*) AS n_docs,
                 CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl,
                 {df_cols}
          FROM t)
        SELECT doc_id, dl, {tf_list}, round({score}, 6) AS bm25
        FROM t, s
        -- order by the ROUNDED score exactly as the Spark side does:
        -- ordering one engine by raw and the other by rounded could pick
        -- different members when near-ties straddle the LIMIT boundary
        ORDER BY round({score}, 6) DESC, doc_id
        LIMIT {BM25_TOP_K}
    """


SEARCH_ORACLES = {
    "bm25_search": _bm25_oracle(),
    "quality_classifier": f"""
        WITH d AS (
          SELECT doc_id, str_split(text, ' ') AS toks FROM documents),
        folded AS (
          SELECT doc_id,
                 CAST(len(toks) AS BIGINT) AS n_toks,
                 list_sum(list_transform(toks, t -> {_w_of('t')})) AS w_sum
          FROM d)
        SELECT doc_id, n_toks,
               round(w_sum / n_toks, 9) AS mean_w,
               round(1.0 / (1.0 + exp(-{SIGMOID_GAIN} * (w_sum / n_toks))), 9)
                   AS quality_p,
               CASE WHEN 1.0 / (1.0 + exp(-{SIGMOID_GAIN} * (w_sum / n_toks)))
                         >= 0.5
                    THEN 1 ELSE 0 END AS keep
        FROM folded ORDER BY doc_id
    """,
}
