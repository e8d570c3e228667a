"""CDX/SURT URL-index tier: the capture index a web archive builds over
its WARC store, keyed by the Sort-friendly URI Reordering Transform.

Reference parity note: the reference service (``/root/reference/app/
main.py``) indexes jobs by uuid in a Python dict (``jobs_store``,
``app/main.py:81``) — a point-lookup registry for a handful of uploads.
A crawl-scale corpus needs the web-archive equivalent: Common Crawl's
third ecosystem product (after WAT — ``operators/linkgraph.py`` — and
WET — ``jobs/watwet.py``) is the **CDX URL index** plus its
``cluster.idx`` secondary index, which together let a client locate any
capture of any URL inside petabytes of WARC without scanning them.
This module builds both, plus the digest-based revisit audit that CDX
enables, as pure DataFrame programs over the same pages corpus every
other webtext tier reads.

The three oracled queries:

* ``q_cdx_index`` — one index record per capture: SURT key, 14-digit
  timestamp, original url, mime (from the url extension, as CC's
  indexer does for the canonical type), payload md5 digest, byte
  length.  SURT canonicalization (the ``surt`` library's default
  rules, re-expressed as codegen'd expressions): lowercase authority,
  strip a leading ``www.`` label, strip default ports ``:80``/``:443``,
  reverse the host labels and join with commas, ``)`` separator,
  lowercase path (empty path → ``/``), drop the fragment, sort query
  parameters.  The fixture corpus is already canonical, so the query
  PLANTS three deterministic variants per selected page (mixed-case
  ``WWW.`` authority, unsorted query string + fragment, ``http://…:80``
  form) at +1h/+2h/+3h fetch times; the first and third collapse onto
  the base url's SURT key as extra captures, the second sorts its
  params into a new key — exactly what a revisit-aware index must show.
* ``q_cdx_shards`` — the ``cluster.idx`` analogue: contiguous SURT-range
  shards of the index with (start_key, end_key, record/host counts).
  Sharding is HOST-granular: per-host record counts (one map-side-
  combined agg), a distributed running offset over the host table
  (the token-pack fan-in-4096 prefix-sum tree,
  ``curation.ordered_prefix_sum``), and
  ``shard = floor(offset * NSHARDS / total)`` — never a window over the
  page rows themselves, and never an unpartitioned window over the
  host rows either.
* ``q_cdx_revisits`` — the WARC ``revisit``-record audit: group captures
  by payload digest; every capture after the temporal first is a
  revisit whose body a deduplicating archive would not store again.
  Reports per-digest capture counts and the bytes a revisit-aware
  writer saves.

Scale notes (10^12 captures):

* The SURT/mime/digest projection is per-row, JVM-side, whole-stage-
  codegen'd — shuffle-free until the caller's own sort or agg.
* The index file itself is the ``orderBy(surt_key, ts)`` output: Spark's
  sort is a RangePartitioning exchange (sampled boundaries) + per-
  partition sort — the distributed total order CC's indexer computes
  with a Hadoop total-order partitioner. Each output partition is one
  ``cdx-NNNNN.gz`` part; ``q_cdx_shards``'s ranges are the read-side
  complement.
* ``q_cdx_shards`` aggregates to host granularity BEFORE its running
  sum (10^12 captures reduce to ~10^8 hosts), and the running sum
  itself is the token-pack fan-in-4096 prefix-sum tree
  (``curation.ordered_prefix_sum``) — no unpartitioned window anywhere
  in the tier.
* ``q_cdx_revisits`` shuffles (digest, 16B) pairs once, partial-
  aggregated map-side; payload bytes never move.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from document_converter_api_spark.operators.curation import (
    ordered_prefix_sum,
)
from document_converter_api_spark.operators.linkgraph import (
    all_pages_df,
    pages_path,
)

NSHARDS = 8

_AUTH_RE = "^https?://([^/?#]+)"
_REST_RE = "^https?://[^/?#]+"

_MIME = {
    ".html": "text/html",
    ".htm": "text/html",
    ".pdf": "application/pdf",
    ".docx": ("application/vnd.openxmlformats-officedocument"
              ".wordprocessingml.document"),
    ".zip": "application/zip",
    ".jpg": "image/jpeg",
    "robots.txt": "text/plain",
}


def surt_host(host_col):
    """Reversed, comma-joined, canonical authority: lowercase, default
    ports and one leading ``www.`` label stripped."""
    h = F.regexp_replace(
        F.regexp_replace(F.lower(host_col), ":(80|443)$", ""),
        "^www\\.", "")
    port = F.regexp_extract(h, ":(\\d+)$", 1)
    name = F.regexp_replace(h, ":\\d+$", "")
    rev = F.array_join(F.reverse(F.split(name, "\\.")), ",")
    # a surviving non-default port trails the REVERSED authority
    return F.concat(rev, F.when(port != "",
                                F.concat(F.lit(":"), port))
                    .otherwise(F.lit("")))


def surt_key(url_col):
    """Full SURT key for a url column (see module docstring for rules)."""
    base = F.regexp_replace(url_col, "#.*$", "")
    host = F.regexp_extract(base, _AUTH_RE, 1)
    path = F.lower(F.regexp_extract(base, "^https?://[^/?#]+([^?#]*)", 1))
    path = F.when(path == "", F.lit("/")).otherwise(path)
    qstr = F.regexp_extract(base, "\\?(.*)$", 1)
    params = F.array_sort(F.filter(F.split(qstr, "&"), lambda p: p != ""))
    return F.concat(
        surt_host(host), F.lit(")"), path,
        F.when(F.size(params) > 0,
               F.concat(F.lit("?"), F.array_join(params, "&")))
        .otherwise(F.lit("")))


def _mime_expr(url_col):
    expr = F.lit("application/octet-stream")
    for suffix, mime in reversed(_MIME.items()):
        expr = F.when(F.col(url_col).endswith(suffix),
                      F.lit(mime)).otherwise(expr)
    return expr


def _captures(spark: SparkSession) -> DataFrame:
    """Corpus rows + the three planted variants (module docstring)."""
    raw = all_pages_df(spark).select("url", "warc_ts", "html")
    # ~1/4 of pages, selected by a hash prefix both engines compute
    # identically (url LENGTHS cluster mod k in the fixture, so a
    # length-mod selector would pick almost nothing)
    sel = raw.filter(F.substring(F.md5("url"), 1, 1).isin("0", "1", "2", "3"))
    host = F.regexp_extract("url", _AUTH_RE, 1)
    rest = F.regexp_replace("url", _REST_RE, "")
    v1 = sel.select(
        F.concat(F.lit("https://WWW."), F.upper(host), rest).alias("url"),
        F.expr("warc_ts + INTERVAL 1 HOUR").alias("warc_ts"), "html")
    v2 = sel.select(
        F.concat(F.col("url"), F.lit("?b=2&a=1#frag")).alias("url"),
        F.expr("warc_ts + INTERVAL 2 HOUR").alias("warc_ts"), "html")
    v3 = sel.select(
        F.concat(F.lit("http://"), host, F.lit(":80"), rest).alias("url"),
        F.expr("warc_ts + INTERVAL 3 HOUR").alias("warc_ts"), "html")
    return raw.unionAll(v1).unionAll(v2).unionAll(v3)


def cdx_records(pages: DataFrame,
                passthrough: tuple[str, ...] = ()) -> DataFrame:
    """(surt_key, ts14, orig_url, mime, digest, length) per capture —
    one codegen'd projection, no shuffle. ``passthrough`` appends input
    columns unchanged (the WARC store location triple
    ``source_file/warc_offset/warc_len`` when indexing an archive)."""
    return pages.select(
        surt_key(F.col("url")).alias("surt_key"),
        F.date_format("warc_ts", "yyyyMMddHHmmss").alias("ts14"),
        F.col("url").alias("orig_url"),
        _mime_expr("url").alias("mime"),
        F.md5(F.hex("html")).alias("digest"),
        F.length("html").cast("long").alias("length"),
        *[F.col(c) for c in passthrough])


def q_cdx_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CDX index file body: every capture, totally ordered by
    (SURT key, timestamp) — the distributed range sort IS the index."""
    return (cdx_records(_captures(spark))
            .orderBy("surt_key", "ts14", "orig_url"))


def q_cdx_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """cluster.idx: contiguous host-granular SURT-range shards.

    The running offset over the host table is ``ordered_prefix_sum``
    (operators/curation.py) — range-partition by host_key, tree-fold the
    per-partition totals with fan-in 4096, per-partition window cumsum —
    never an unpartitioned ``Window.orderBy`` (which would plan
    ``Exchange SinglePartition``: at 10^8 hosts a multi-GB single-task
    sort; ``tests/test_plans.py`` pins its absence)."""
    recs = cdx_records(_captures(spark))
    host_key = F.regexp_extract("surt_key", "^([^)]*)\\)", 1)
    hosts = (recs.groupBy(host_key.alias("host_key"))
             .agg(F.count("*").cast("long").alias("n_recs")))
    total = hosts.agg(F.sum("n_recs").alias("total"))
    sharded = (ordered_prefix_sum(hosts, "host_key", "n_recs")
               .crossJoin(F.broadcast(total))
               .withColumn("shard_id",
                           F.floor(F.col("cum_before") * NSHARDS
                                   / F.col("total"))))
    return (sharded.groupBy("shard_id")
            .agg(F.min("host_key").alias("start_key"),
                 F.max("host_key").alias("end_key"),
                 F.sum("n_recs").cast("long").alias("n_records"),
                 F.count("*").cast("long").alias("n_hosts"))
            .orderBy("shard_id"))


def q_cdx_revisits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Digest-based revisit audit: captures after the temporal first of
    each payload digest are revisits; their bodies need not be stored."""
    recs = cdx_records(_captures(spark))
    return (recs.groupBy("digest")
            .agg(F.count("*").cast("long").alias("n_captures"),
                 (F.count("*") - 1).cast("long").alias("n_revisits"),
                 F.min(F.concat("ts14", F.lit("|"), "orig_url"))
                 .alias("first_capture"),
                 ((F.count("*") - 1) * F.max("length")).cast("long")
                 .alias("bytes_saved"))
            .filter(F.col("n_captures") > 1)
            .orderBy("digest"))


def q_cdx_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed index lookup, the read path the tier exists for:
    a query-url batch (a deterministic corpus sample plus planted
    misses with an extra query param — different SURT key, so they
    route but match nothing) is SURT-canonicalized, ROUTED through the
    cluster.idx host ranges (a range join against the tiny shard
    table — the distributed analog of binary-searching cluster.idx),
    then probed against the index by surt-key equality within the
    routed shard. Output per query url: owning shard, capture count,
    earliest capture timestamp.

    Scale shape: the shard table is thousands of rows → broadcast
    range join (BroadcastNestedLoop over ~10^3 rows, trivial); the
    probe is a plain equi-join on surt_key, co-partitioned with the
    index — a 10^6-url batch lookup costs one skinny shuffle, never a
    scan of the page corpus bytes."""
    recs = cdx_records(_captures(spark))
    host_key = F.regexp_extract("surt_key", "^([^)]*)\\)", 1)
    shards = q_cdx_shards(spark, sf_dir)
    base = (all_pages_df(spark).select("url")
            .filter(F.substring(F.md5("url"), 1, 1).isin("4", "5")))
    queries = base.unionAll(
        base.select(F.concat("url", F.lit("?nocache=1")).alias("url")))
    q = queries.select(
        F.col("url").alias("query_url"),
        surt_key(F.col("url")).alias("qk"),
    ).withColumn("q_host", F.regexp_extract("qk", "^([^)]*)\\)", 1))
    routed = q.join(
        F.broadcast(shards),
        (F.col("q_host") >= F.col("start_key"))
        & (F.col("q_host") <= F.col("end_key")), "left")
    hits = (recs.groupBy(F.col("surt_key").alias("qk"))
            .agg(F.count("*").cast("long").alias("n_captures"),
                 F.min("ts14").alias("first_ts")))
    return (routed.join(hits, "qk", "left")
            .select("query_url", "shard_id",
                    F.coalesce("n_captures", F.lit(0)).cast("long")
                    .alias("n_captures"),
                    F.col("first_ts"))
            .orderBy("query_url"))


# shared SURT fragments (DuckDB): h/p/ps derive from a column named
# `url`; _SURT_SQL composes them — the same decomposition the Spark
# surt_key() expression uses, so the two stay reviewable side by side.
_H_SQL = """regexp_replace(regexp_replace(lower(regexp_extract(
            regexp_replace(url, '#.*$', ''),
            '^https?://([^/?#]+)', 1)), ':(80|443)$', ''),
          '^www\\.', '')"""
_P_SQL = """lower(regexp_extract(regexp_replace(url, '#.*$', ''),
              '^https?://[^/?#]+([^?#]*)', 1))"""
_PS_SQL = """list_sort(list_filter(
          str_split(regexp_extract(regexp_replace(url, '#.*$', ''),
                    '\\?(.*)$', 1), '&'), x -> x <> ''))"""
_SURT_SQL = """array_to_string(list_reverse(string_split(
          regexp_replace(h, ':\\d+$', ''), '.')), ',')
        || CASE WHEN regexp_extract(h, ':(\\d+)$', 1) <> ''
                THEN ':' || regexp_extract(h, ':(\\d+)$', 1) ELSE '' END
        || ')'
        || CASE WHEN p = '' THEN '/' ELSE p END
        || CASE WHEN len(ps) > 0
                THEN '?' || array_to_string(ps, '&') ELSE '' END"""

_CAPTURES_CTE = f"""
  base AS (SELECT url, warc_ts, html FROM '__PAGES_PARQUET__'),
  sel AS (SELECT * FROM base
          WHERE substr(md5(url), 1, 1) IN ('0', '1', '2', '3')),
  captures AS (
    SELECT url, warc_ts, html FROM base
    UNION ALL
    SELECT 'https://WWW.'
             || upper(regexp_extract(url, '^https?://([^/?#]+)', 1))
             || regexp_replace(url, '^https?://[^/?#]+', ''),
           warc_ts + INTERVAL 1 HOUR, html FROM sel
    UNION ALL
    SELECT url || '?b=2&a=1#frag', warc_ts + INTERVAL 2 HOUR, html
    FROM sel
    UNION ALL
    SELECT 'http://' || regexp_extract(url, '^https?://([^/?#]+)', 1)
             || ':80' || regexp_replace(url, '^https?://[^/?#]+', ''),
           warc_ts + INTERVAL 3 HOUR, html FROM sel),
  recs AS (
    SELECT
      {_SURT_SQL} AS surt_key,
      strftime(warc_ts, '%Y%m%d%H%M%S') AS ts14,
      url AS orig_url,
      CASE WHEN url LIKE '%.html' OR url LIKE '%.htm' THEN 'text/html'
           WHEN url LIKE '%.pdf' THEN 'application/pdf'
           WHEN url LIKE '%.docx' THEN
             'application/vnd.openxmlformats-officedocument'
               || '.wordprocessingml.document'
           WHEN url LIKE '%.zip' THEN 'application/zip'
           WHEN url LIKE '%.jpg' THEN 'image/jpeg'
           WHEN url LIKE '%robots.txt' THEN 'text/plain'
           ELSE 'application/octet-stream' END AS mime,
      md5(hex(html)) AS digest,
      CAST(octet_length(html) AS BIGINT) AS length
    FROM (
      SELECT url, warc_ts, html,
        {_H_SQL} AS h,
        {_P_SQL} AS p,
        {_PS_SQL} AS ps
      FROM captures))
"""

CDX_ORACLES = {
    "cdx_index": f"""
        WITH {_CAPTURES_CTE}
        SELECT surt_key, ts14, orig_url, mime, digest, length
        FROM recs ORDER BY surt_key, ts14, orig_url
    """,
    "cdx_shards": f"""
        WITH {_CAPTURES_CTE},
        hosts AS (
          SELECT regexp_extract(surt_key, '^([^)]*)\\)', 1) AS host_key,
                 CAST(count(*) AS BIGINT) AS n_recs
          FROM recs GROUP BY 1),
        offs AS (
          SELECT host_key, n_recs,
                 CAST(coalesce(sum(n_recs) OVER (ORDER BY host_key
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS BIGINT) AS cum_before,
                 CAST(sum(n_recs) OVER () AS BIGINT) AS total
          FROM hosts)
        SELECT CAST(floor(cum_before * {NSHARDS} / total) AS BIGINT)
                 AS shard_id,
               min(host_key) AS start_key,
               max(host_key) AS end_key,
               CAST(sum(n_recs) AS BIGINT) AS n_records,
               CAST(count(*) AS BIGINT) AS n_hosts
        FROM offs GROUP BY 1 ORDER BY shard_id
    """,
    "cdx_lookup": f"""
        WITH {_CAPTURES_CTE},
        hosts AS (
          SELECT regexp_extract(surt_key, '^([^)]*)\\)', 1) AS host_key,
                 CAST(count(*) AS BIGINT) AS n_recs
          FROM recs GROUP BY 1),
        offs AS (
          SELECT host_key, n_recs,
                 CAST(coalesce(sum(n_recs) OVER (ORDER BY host_key
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS BIGINT) AS cum_before,
                 CAST(sum(n_recs) OVER () AS BIGINT) AS total
          FROM hosts),
        shards AS (
          SELECT CAST(floor(cum_before * {NSHARDS} / total) AS BIGINT)
                   AS shard_id,
                 min(host_key) AS start_key,
                 max(host_key) AS end_key
          FROM offs GROUP BY 1),
        qbase AS (SELECT url FROM base
                  WHERE substr(md5(url), 1, 1) IN ('4', '5')),
        qurls AS (SELECT url FROM qbase
                  UNION ALL SELECT url || '?nocache=1' FROM qbase),
        q AS (
          SELECT url AS query_url, {_SURT_SQL} AS qk
          FROM (SELECT url,
                  {_H_SQL} AS h,
                  {_P_SQL} AS p,
                  {_PS_SQL} AS ps
                FROM qurls)),
        routed AS (
          SELECT q.query_url, q.qk, s.shard_id
          FROM q LEFT JOIN shards s
            ON regexp_extract(q.qk, '^([^)]*)\\)', 1)
                 BETWEEN s.start_key AND s.end_key),
        hits AS (
          SELECT surt_key AS qk,
                 CAST(count(*) AS BIGINT) AS n_captures,
                 min(ts14) AS first_ts
          FROM recs GROUP BY 1)
        SELECT r.query_url, r.shard_id,
               CAST(coalesce(h.n_captures, 0) AS BIGINT) AS n_captures,
               h.first_ts
        FROM routed r LEFT JOIN hits h ON r.qk = h.qk
        ORDER BY r.query_url
    """,
    "cdx_revisits": f"""
        WITH {_CAPTURES_CTE}
        SELECT digest,
               CAST(count(*) AS BIGINT) AS n_captures,
               CAST(count(*) - 1 AS BIGINT) AS n_revisits,
               min(ts14 || '|' || orig_url) AS first_capture,
               CAST((count(*) - 1) * max(length) AS BIGINT) AS bytes_saved
        FROM recs GROUP BY digest HAVING count(*) > 1
        ORDER BY digest
    """,
}


def oracle_sql_for_cdx(repo_root: str | None = None) -> dict[str, str]:
    path = pages_path(repo_root)
    return {k: v.replace("__PAGES_PARQUET__", path)
            for k, v in CDX_ORACLES.items()}
