"""Head-metadata tier: per-page metadata extraction, a declared-vs-
detected language audit, and crawl-frontier (recrawl) prioritization.

Reference parity note: the reference service (``/root/reference/app/
main.py``) converts one uploaded document at a time and keeps no notion
of a page's head metadata, its declared language, or when to fetch it
again. A crawl-scale webtext pipeline needs all three: Common Crawl's
WAT records carry exactly this head metadata (title + metas) next to the
outlinks ``operators/linkgraph.py`` extracts, CCNet/CC-MAIN pipelines
audit the HTML ``lang`` attribute against content-detected language
(declared lang is wrong on a noticeable fraction of the web), and a
production crawler schedules refetches by authority x staleness. All
three stages here are single codegen'd projections or one small keyed
aggregation — no Python anywhere.

* ``q_page_metadata`` — title / h1 / declared ``lang`` plus heading,
  paragraph and script counts per page (the WAT head-metadata record),
  one ``regexp_extract``/``regexp_extract_all`` projection.
* ``q_lang_audit`` — stopword-hit language ID (same stopword tables and
  argmax tie-break as ``operators/text_analysis.q_lang_id``) over the
  page's VISIBLE text (script/style bodies then all tags stripped),
  compared against the declared ``<html lang>``. Tokens and hit counts
  are materialized columns first — HOF lambdas get no codegen/CSE, so
  an inline subtree would re-strip the page per reference.
* ``q_frontier_priority`` — per-host recrawl priority: extracted-graph
  PageRank (``linkgraph.host_ranks``) x ``ln(1 + hours_stale)`` where
  staleness is measured in integer microseconds against the corpus'
  newest fetch (exact cross-engine, same trick as ``operators/
  temporal.py``). Hosts whose pages only link internally have no graph
  edge and coalesce to rank 0 — they never outrank a linked host.

Scale notes (10^12 pages):

* metadata + audit are shuffle-free scan projections; the audit's only
  wide op is the caller's own aggregation if they want a mismatch rate.
* the frontier agg is one ``groupBy(host)`` — map-side combined,
  ~10^8 host rows out of 10^12 pages; the rank join is a broadcast of
  the (tiny) host-rank table. The corpus-max timestamp is a 1-row agg
  broadcast back via crossJoin (the ``operators/search.py`` BM25
  corpus-stats shape).
* ``ln`` is bit-identical Spark vs DuckDB on this box (proved by the
  bm25/classifier/unigram oracles); the PageRank factor reuses the
  exact recurrence via ``linkgraph.pagerank_cte`` so ``priority`` is
  hash-comparable without tolerance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .linkgraph import (
    HOST_RE,
    LPR_ITERS,
    _pages_df,
    host_ranks,
    pages_path,
    pagerank_cte,
)
from .text_analysis import LANG_ORDER, STOPWORDS

DECLARED_RE = '<html lang="([a-z]+)"'
TITLE_RE = "<title>([^<]*)</title>"
H1_RE = "<h1>([^<]*)</h1>"
# script/style bodies vanish BEFORE the tag strip; RE2 (DuckDB) has no
# backreferences, so the pair is an explicit alternation, non-greedy.
SCRIPT_STYLE_RE = ("(?s)<script[^>]*>.*?</script>"
                   "|(?s)<style[^>]*>.*?</style>")
TAG_RE = "<[^>]*>"
US_PER_HOUR = 3_600_000_000


def _page(col: str = "html"):
    return F.decode(col, "UTF-8")


def q_page_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WAT-style head metadata per page: one codegen'd projection."""
    page = _page()

    def n_of(pat: str):
        return F.size(F.regexp_extract_all(page, F.lit(pat), 0)).cast("long")

    return (_pages_df(spark)
            .select(
                "url",
                F.regexp_extract(page, DECLARED_RE, 1).alias("declared_lang"),
                F.regexp_extract(page, TITLE_RE, 1).alias("title"),
                F.regexp_extract(page, H1_RE, 1).alias("h1"),
                n_of("<h2>").alias("n_h2"),
                n_of("<p>").alias("n_paragraphs"),
                n_of("<script").alias("n_scripts"),
                n_of('<a href="').alias("n_links"))
            .orderBy("url"))


def visible_text(page):
    """Tag-stripped page text: script/style bodies first, then tags."""
    return F.regexp_replace(
        F.regexp_replace(page, SCRIPT_STYLE_RE, " "), TAG_RE, " ")


def q_lang_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declared ``<html lang>`` vs stopword-detected language of the
    visible text — the CCNet-style label audit. Same stopword tables
    and (en, es, de) argmax tie-break as ``text_analysis.q_lang_id``."""
    docs = (_pages_df(spark)
            .select("url",
                    F.regexp_extract(_page(), DECLARED_RE, 1)
                    .alias("declared_lang"),
                    F.split(F.lower(visible_text(_page())), "[^a-z]+", -1)
                    .alias("toks")))
    # bind the loop var via a factory — a default-arg lambda would have
    # TWO Python params and pyspark would silently treat it as the
    # (element, index) HOF form (see memory: round-3 session-3 pitfalls)
    def _hits(lang: str):
        return F.size(F.filter(
            "toks", lambda t: t.isin(*STOPWORDS[lang]))).cast("long")

    for lang in LANG_ORDER:
        docs = docs.withColumn(f"hits_{lang}", _hits(lang))
    pred = (F.when((F.col("hits_en") >= F.col("hits_es"))
                   & (F.col("hits_en") >= F.col("hits_de")), "en")
            .when(F.col("hits_es") >= F.col("hits_de"), "es")
            .otherwise("de"))
    return (docs
            .withColumn("pred_lang", pred)
            .withColumn("match",
                        (F.col("pred_lang") == F.col("declared_lang"))
                        .cast("int"))
            .select("url", "declared_lang", "hits_en", "hits_es", "hits_de",
                    "pred_lang", "match")
            .orderBy("url"))


def q_frontier_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recrawl schedule: priority = PageRank x ln(1 + hours stale).

    Staleness is exact integer-microsecond math against the corpus'
    newest fetch; the hour floor is a double division of exactly-
    representable integers (diffs << 2^53), identical IEEE results in
    both engines. Freshly-crawled hosts get priority 0 regardless of
    rank — the scheduler only queues what has aged."""
    pages = _pages_df(spark)
    hosts = (pages
             .select(F.regexp_extract("url", HOST_RE, 1).alias("host"),
                     F.unix_micros(F.col("warc_ts").cast("timestamp"))
                     .alias("us"))
             .groupBy("host")
             .agg(F.max("us").alias("last_us"),
                  F.count("*").cast("long").alias("n_pages")))
    corpus = hosts.agg(F.max("last_us").alias("corpus_us"))
    ranks, _ = host_ranks(pages)
    stale = F.floor((F.col("corpus_us") - F.col("last_us"))
                    / F.lit(float(US_PER_HOUR))).cast("long")
    pr = F.coalesce(F.col("pr"), F.lit(0.0))
    return (hosts.crossJoin(F.broadcast(corpus))
            .join(F.broadcast(ranks), hosts.host == ranks.id, "left")
            .withColumn("hours_stale", stale)
            .select("host", "n_pages", "hours_stale",
                    F.round(pr, 9).alias("pagerank"),
                    F.round(pr * F.log(F.lit(1.0) + F.col("hours_stale")), 9)
                    .alias("priority"))
            .orderBy(F.desc("priority"), "host"))


# ---------------------------------------------------------------------------
# DuckDB oracles — identical regexes, stopword lists, argmax CASE, and the
# shared PageRank CTE chain from linkgraph.pagerank_cte.
# ---------------------------------------------------------------------------

def _in_list(words) -> str:
    return ", ".join(f"'{w}'" for w in words)


_META_SQL = """
    SELECT url,
           regexp_extract(decode(html), '<html lang="([a-z]+)"', 1)
             AS declared_lang,
           regexp_extract(decode(html), '<title>([^<]*)</title>', 1)
             AS title,
           regexp_extract(decode(html), '<h1>([^<]*)</h1>', 1) AS h1,
           CAST(len(regexp_extract_all(decode(html), '<h2>')) AS BIGINT)
             AS n_h2,
           CAST(len(regexp_extract_all(decode(html), '<p>')) AS BIGINT)
             AS n_paragraphs,
           CAST(len(regexp_extract_all(decode(html), '<script')) AS BIGINT)
             AS n_scripts,
           CAST(len(regexp_extract_all(decode(html), '<a href="')) AS BIGINT)
             AS n_links
    FROM '__PAGES_PARQUET__' WHERE url LIKE '%.html'
    ORDER BY url
"""

_AUDIT_SQL = f"""
    WITH toks AS (
      SELECT url,
             regexp_extract(decode(html), '<html lang="([a-z]+)"', 1)
               AS declared_lang,
             string_split_regex(lower(regexp_replace(regexp_replace(
                 decode(html),
                 '(?s)<script[^>]*>.*?</script>|(?s)<style[^>]*>.*?</style>',
                 ' ', 'g'), '<[^>]*>', ' ', 'g')), '[^a-z]+') AS t
      FROM '__PAGES_PARQUET__' WHERE url LIKE '%.html'),
    hits AS (
      SELECT url, declared_lang,
             CAST(len(list_filter(t, x -> x IN
                 ({_in_list(STOPWORDS['en'])}))) AS BIGINT) AS hits_en,
             CAST(len(list_filter(t, x -> x IN
                 ({_in_list(STOPWORDS['es'])}))) AS BIGINT) AS hits_es,
             CAST(len(list_filter(t, x -> x IN
                 ({_in_list(STOPWORDS['de'])}))) AS BIGINT) AS hits_de
      FROM toks)
    SELECT url, declared_lang, hits_en, hits_es, hits_de,
           CASE WHEN hits_en >= hits_es AND hits_en >= hits_de THEN 'en'
                WHEN hits_es >= hits_de THEN 'es' ELSE 'de' END AS pred_lang,
           CAST(CASE WHEN (CASE WHEN hits_en >= hits_es AND hits_en >= hits_de
                                THEN 'en' WHEN hits_es >= hits_de THEN 'es'
                                ELSE 'de' END) = declared_lang
                     THEN 1 ELSE 0 END AS INT) AS match
    FROM hits ORDER BY url
"""


def _frontier_oracle(n_nodes: int) -> str:
    return pagerank_cte(n_nodes) + f""",
        hosts AS (
          SELECT regexp_extract(url, '^https?://([^/]+)', 1) AS host,
                 max(epoch_us(warc_ts)) AS last_us,
                 CAST(count(*) AS BIGINT) AS n_pages
          FROM '__PAGES_PARQUET__' WHERE url LIKE '%.html'
          GROUP BY 1),
        corpus AS (SELECT max(last_us) AS corpus_us FROM hosts)
        SELECT h.host, h.n_pages,
               CAST(floor((c.corpus_us - h.last_us)
                          / {float(US_PER_HOUR)!r}) AS BIGINT) AS hours_stale,
               round(coalesce(r.pr, 0.0), 9) AS pagerank,
               round(coalesce(r.pr, 0.0)
                     * ln(1.0 + CAST(floor((c.corpus_us - h.last_us)
                           / {float(US_PER_HOUR)!r}) AS BIGINT)), 9)
                 AS priority
        FROM hosts h
        CROSS JOIN corpus c
        LEFT JOIN pr{LPR_ITERS} r ON r.id = h.host
        ORDER BY priority DESC, h.host
    """


PAGEMETA_ORACLES = {
    "page_metadata": _META_SQL,
    "lang_audit": _AUDIT_SQL,
}


def oracle_sql_for_pagemeta(repo_root: str, n_nodes: int) -> dict[str, str]:
    path = pages_path(repo_root)
    out = {k: v.replace("__PAGES_PARQUET__", path)
           for k, v in PAGEMETA_ORACLES.items()}
    out["frontier_priority"] = (_frontier_oracle(n_nodes)
                                .replace("__PAGES_PARQUET__", path))
    return out
