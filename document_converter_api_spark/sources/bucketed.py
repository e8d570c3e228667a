"""Bucketed (co-located) tables — shuffle elimination for repeated joins.

The reference has no joins at all (SURVEY.md §2.3 — its only join-like op is
a dict point-probe, ``/root/reference/app/main.py:601-604``), so this module
is scale infrastructure, not parity: on a 100 TB corpus every query that
joins results back to pages/embeddings/lineage on the same key would
otherwise re-shuffle the fact table. Writing both sides **bucketed by the
join key** moves that shuffle into the write, once; every later equi-join or
aggregation on the key is then exchange-free (Spark reads bucket i of table
A and bucket i of table B on the same task).

On a real cluster this is the Iceberg ``bucket(N, key)`` partition transform
(or Hive-style bucketed tables, as here); the sandbox uses
``DataFrameWriter.bucketBy`` + ``saveAsTable`` with an explicit ``path`` so
data lands in a caller-owned directory while the in-memory catalog carries
the bucket metadata. ``tests/test_plans.py`` pins the physical-plan
property: SortMergeJoin over two bucketed scans with **zero Exchange**, and
a groupBy on the bucket key with zero Exchange.

Sizing note for 10^12 rows: pick ``nbuckets`` so one bucket of the largest
table fits an executor's scan budget (~bucket_bytes = table_bytes /
nbuckets ≲ a few GB); bucket counts must match across tables to co-locate
(Spark joins N-bucket with N-bucket; with AQE, k*N works in newer versions
but same-N is the portable contract).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_BUCKETS = 8


def write_bucketed(df: DataFrame, name: str, path: str, key: str,
                   nbuckets: int = DEFAULT_BUCKETS) -> None:
    """Materialize ``df`` as a bucketed external parquet table.

    ``repartition(nbuckets, key)`` first so each bucket is a single file —
    that lets Spark trust the ``sortBy`` order and skip the per-bucket sort
    in later sort-merge joins (multi-file buckets would only skip the
    exchange, not the sort).
    """
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    (df.repartition(nbuckets, F.col(key))
       .write.mode("overwrite")
       .option("path", path)
       .bucketBy(nbuckets, key)
       .sortBy(key)
       .format("parquet")
       .saveAsTable(name))


def bucketed_pair(spark: SparkSession, left: DataFrame, right: DataFrame,
                  left_key: str, right_key: str,
                  nbuckets: int = DEFAULT_BUCKETS,
                  base_dir: str | None = None,
                  names: tuple[str, str] = ("b_left", "b_right"),
                  ) -> tuple[DataFrame, DataFrame]:
    """Write both sides bucketed on their join keys and return the bucketed
    scans. One shuffle each at write time; joins/aggs on the keys afterwards
    are exchange-free."""
    base = base_dir or tempfile.mkdtemp(prefix="bucketed_")
    write_bucketed(left, names[0], os.path.join(base, names[0]),
                   left_key, nbuckets)
    write_bucketed(right, names[1], os.path.join(base, names[1]),
                   right_key, nbuckets)
    return spark.table(names[0]), spark.table(names[1])


def q_bucketed_doc_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents ⋈ embeddings on doc_id==vec_id through bucketed tables —
    results are identical to the plain join (the DuckDB oracle); the plan
    property (no Exchange) is pinned in tests/test_plans.py.

    The bucketed copies land in a temp dir scoped by ``spark.app.id`` (and
    table names likewise): re-running within one session overwrites rather
    than accumulating copies, while two concurrent sessions (e.g.
    check_oracle alongside the bench) can no longer interleave each other's
    DROP TABLE/overwrite with a bucketed scan and read partial files."""
    app = "".join(c if c.isalnum() else "_"
                  for c in spark.sparkContext.applicationId)
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    embs = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    bdocs, bembs = bucketed_pair(
        spark,
        docs.select("doc_id", "lang", "n_chars"),
        embs.select("vec_id", "label"),
        "doc_id", "vec_id",
        base_dir=os.path.join(tempfile.gettempdir(),
                              f"dcas_bucketed_join_{app}"),
        names=(f"b_documents_{app}", f"b_embeddings_{app}"))
    return (bdocs.join(bembs, bdocs.doc_id == bembs.vec_id)
            .select("doc_id", "lang", "n_chars", "label"))


BUCKETED_JOIN_ORACLE_SQL = """
    SELECT d.doc_id, d.lang, d.n_chars, e.label
    FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
"""
