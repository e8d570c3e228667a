"""Skew-aware aggregation: salted two-phase groupBy for hot-key domains.

North rule: "partitioning / shuffle / skew handled explicitly". The pages
corpus is Zipf-skewed by host (one host owns ~40% of rows — fixtures/
genpages.py HOSTS weighting, mirroring real Common-Crawl domain skew). A
naive ``groupBy(host)`` sends the hot host to one reducer; at 10^12 rows
that reducer runs for hours while the rest idle.

The salted plan (SURVEY.md §4.2.1, EUROSYS'11 skew-handling pattern):

1. *detect*: cheap sampled pre-pass → hosts above a row-share threshold;
2. *spread*: ``salt = pmod(xxhash64(url), S)`` for hot hosts, 0 otherwise;
3. *partial*: groupBy(host, salt) — hot host's rows land on S reducers;
4. *final*:   groupBy(host) over S partial rows per hot host.

The final shuffle moves only S rows per hot host, so the plan is balanced
regardless of key skew. AQE's skew-join handling covers joins; salted
aggregation like this is still the explicit pattern for hot-key groupBys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HOST_RE = r"^[a-z]+://([^/]+)"
DEFAULT_SALT_BUCKETS = 16
DEFAULT_HOT_SHARE = 0.05  # host is "hot" above 5% of sampled rows


def host_expr(url):
    return F.regexp_extract(url, HOST_RE, 1)


def detect_hot_hosts(pages: DataFrame, sample_fraction: float = 0.1,
                     hot_share: float = DEFAULT_HOT_SHARE) -> list[str]:
    """Sampled heavy-hitter pre-pass (metadata-only: reads just ``url``).
    At 10^12 rows this is a sample over a single pruned column, not a full
    scan — the sample is seeded so reruns agree."""
    sample = pages.select(host_expr(F.col("url")).alias("host")) \
        .sample(fraction=sample_fraction, seed=42)
    total = sample.count()
    if total == 0:
        return []
    rows = (sample.groupBy("host").count()
            .filter(F.col("count") > int(total * hot_share))
            .collect())
    return sorted(r["host"] for r in rows)


def salted_host_agg(pages: DataFrame, hot_hosts: list[str],
                    salt_buckets: int = DEFAULT_SALT_BUCKETS) -> DataFrame:
    """Two-phase salted aggregation: per-host doc count + payload bytes.
    Result is identical to a naive groupBy(host) — only the shuffle shape
    changes (verified against a straight GROUP BY oracle)."""
    with_host = pages.select(
        host_expr(F.col("url")).alias("host"),
        F.length("html").cast("long").alias("nbytes"),
        F.col("url"))
    salt = (F.when(F.col("host").isin(*hot_hosts) if hot_hosts else F.lit(False),
                   F.pmod(F.xxhash64("url"), F.lit(salt_buckets)))
            .otherwise(F.lit(0)))
    partial = (with_host
               .withColumn("salt", salt)
               .groupBy("host", "salt")
               .agg(F.count("*").alias("pc"), F.sum("nbytes").alias("pb")))
    return (partial.groupBy("host")
            .agg(F.sum("pc").alias("n_docs"), F.sum("pb").alias("total_bytes"))
            .orderBy("host"))


def q_host_stats_salted(spark, sf_dir: str) -> DataFrame:
    """Salted host aggregation over the committed smoke pages corpus;
    oracle = naive GROUP BY host (same numbers, skew-safe plan)."""
    import os
    repo = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    path = os.path.join(repo, "fixtures", "data", "pages_smoke.parquet")
    pages = spark.read.parquet(path)
    hot = detect_hot_hosts(pages)
    return salted_host_agg(pages, hot)


HOST_CAP = 50


def q_host_cap_sample(spark, sf_dir: str):
    """Domain balancing: cap every host at HOST_CAP documents, choosing
    survivors by md5(url) order (deterministic in any engine — a seeded
    uniform draw, since the hash is independent of crawl order). The
    standard pre-training downsampling step for Zipf-skewed crawls: without
    it one hot host dominates the training mix.

    Plan: one shuffle to (host)-partitioned windows; row_number + filter.
    The hot host's rows DO pass through one window partition — rows, not
    arrays, so WindowExec spills rather than OOMs; for corpora where even
    that serialization hurts, pre-filter with a sampled heavy-hitter pass
    (detect_hot_hosts above) and exact-rank only the hot hosts.
    Output is per-host survivor stats so the check is order-insensitive."""
    import os
    from pyspark.sql import Window

    repo = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    path = os.path.join(repo, "fixtures", "data", "pages_smoke.parquet")
    pages = spark.read.parquet(path).select("url")
    w = Window.partitionBy("host").orderBy(F.md5("url"), F.col("url"))
    ranked = (pages
              .withColumn("host", host_expr(F.col("url")))
              .withColumn("rn", F.row_number().over(w)))
    kept = ranked.filter(F.col("rn") <= HOST_CAP)
    return (kept.groupBy("host")
            .agg(F.count("*").alias("n_kept"),
                 F.min(F.md5("url")).alias("first_pick"),
                 F.max(F.md5("url")).alias("last_pick"))
            .orderBy("host"))


def host_cap_oracle(repo_root: str) -> str:
    import os
    path = os.path.join(repo_root, "fixtures", "data", "pages_smoke.parquet")
    return f"""
        WITH ranked AS (
          SELECT regexp_extract(url, '^[a-z]+://([^/]+)', 1) AS host,
                 md5(url) AS h,
                 row_number() OVER (
                     PARTITION BY regexp_extract(url, '^[a-z]+://([^/]+)', 1)
                     ORDER BY md5(url), url) AS rn
          FROM '{path}')
        SELECT host, count(*) AS n_kept,
               min(h) AS first_pick, max(h) AS last_pick
        FROM ranked WHERE rn <= {HOST_CAP}
        GROUP BY host ORDER BY host
    """


def host_stats_oracle(repo_root: str) -> str:
    import os
    path = os.path.join(repo_root, "fixtures", "data", "pages_smoke.parquet")
    return f"""
        SELECT regexp_extract(url, '^[a-z]+://([^/]+)', 1) AS host,
               count(*) AS n_docs,
               CAST(sum(octet_length(html)) AS BIGINT) AS total_bytes
        FROM '{path}'
        GROUP BY host ORDER BY host
    """
