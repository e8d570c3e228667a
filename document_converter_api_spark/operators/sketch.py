"""Mergeable distinct-count sketches: HyperLogLog and KMV (bottom-k).

Reference parity note: the reference service (``/root/reference/app/
main.py``) has no sketches — these are the cardinality estimators a
100 TB pipeline needs where ``count(DISTINCT url)`` is too expensive:
HLL's registers and KMV's bottom-k set are both MERGEABLE states, so
each executor builds a partial sketch map-side and the shuffle moves
O(m) registers / O(k) hashes per partition instead of every distinct
key.  Spark ships ``approx_count_distinct`` (its own HLL++); these
re-derive the sketch from first principles so the estimator itself is
oracle-checkable: every hash/register/estimate step is the SAME pure
SQL expression on both engines (shared fragments, evaluated via
``F.expr`` under Catalyst and verbatim in DuckDB), making an
*approximate* operator EXACTLY cross-checkable — identical registers,
identical estimate, engine to engine.

Determinism argument for the float math: each register contributes
``2^-rho`` — a single-bit-mantissa power of two — and with rho in
[1, 65) plus empty registers at ``2^0`` the terms span fewer than 53
bits at fixture cardinalities, so the sum is EXACT and therefore
addition-order-independent (Spark's arbitrary partition order vs
DuckDB's scan order cannot diverge).  The final division and ``ln``
are single IEEE ops on identical inputs.  The comparator additionally
rounds floats to 9 decimals.

Scale notes:

* ``hll_distinct`` — groupBy(register) -> max(rho) is a 256-group
  aggregation with map-side partial combine: the shuffle carries at
  most m=256 rows per map task no matter the corpus size.  That IS
  the HLL merge (max of registers), so the plan is the distributed
  sketch-union a 1000-executor run would use.
* ``kmv_distinct`` — bottom-k of the distinct hash values plans as
  TakeOrderedAndProject over a partial-distinct: each partition keeps
  its own k smallest, the driver merges k-sized heaps.  Estimate is
  the classic (k-1)/h_(k) over hashes mapped into [0,1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

M_REGISTERS = 256          # HLL registers (b = 8 index bits)
KMV_K = 128                # bottom-k size

# ---------------------------------------------------------------------------
# Shared SQL fragments — evaluated by BOTH engines verbatim.
# ---------------------------------------------------------------------------

# md5 hex of the key's decimal string rendering; both engines agree.
_H = "md5(CAST(user_id AS STRING))"

# Register index from the first two hex nibbles (0..255), via instr on the
# nibble alphabet (portable; Spark lacks DuckDB's from_hex, DuckDB lacks conv).
_NIBBLES = "'0123456789abcdef'"
_REG = (f"CAST((instr({_NIBBLES}, substring(h, 1, 1)) - 1) * 16 + "
        f"(instr({_NIBBLES}, substring(h, 2, 1)) - 1) AS INT)")

# rho = 1 + leading zero BITS of the 64-bit value in hex chars 3..18:
# 4 bits per leading '0' nibble, plus the first non-zero nibble's own
# leading zeros (1xxx->0, 01xx->1, 001x->2, 0001->3).
_RHO = """CASE WHEN z = '' THEN 65
          ELSE (16 - length(z)) * 4
               + CASE WHEN instr('0123456789abcdef', substring(z, 1, 1)) - 1 >= 8 THEN 0
                      WHEN instr('0123456789abcdef', substring(z, 1, 1)) - 1 >= 4 THEN 1
                      WHEN instr('0123456789abcdef', substring(z, 1, 1)) - 1 >= 2 THEN 2
                      ELSE 3 END
               + 1 END"""

# alpha_m * m^2 for m = 256 (standard HLL bias constant, kept as the same
# literal arithmetic so both engines evaluate the identical double).
_ALPHA_M2 = "(0.7213 / (1.0 + 1.079 / 256.0)) * 256.0 * 256.0"

# KMV: first 13 hex chars = 52 bits -> an exactly-representable double in
# [0, 1).  Horner over nibbles, all integer until the final division.
_KMV_U = (
    "CAST(" + " + ".join(
        f"CAST((instr({_NIBBLES}, substring(h, {i + 1}, 1)) - 1) AS BIGINT)"
        f" * {16 ** (12 - i)}"
        for i in range(13)
    ) + " AS DOUBLE) / 4503599627370496.0"
)


def hll_register_table(df: DataFrame) -> DataFrame:
    """(register, rho_max) for every HIT register — the mergeable sketch
    state.  Map-side combine caps the shuffle at m rows per task."""
    return (df.select(F.expr(_H).alias("h"))
            .select(F.expr(_REG).alias("register"),
                    F.regexp_replace(F.substring("h", 3, 16), "^0+", "").alias("z"))
            .select("register", F.expr(_RHO).alias("rho"))
            .groupBy("register").agg(F.max("rho").alias("rho_max")))


def q_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL estimate of distinct ``user_id`` over events vs the exact
    count, with the raw/linear-counting branch applied.  Single row."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select("user_id")
    regs = hll_register_table(ev)
    agg = regs.agg(
        F.count("*").alias("hit"),
        F.sum(F.expr("power(2.0, -rho_max)")).alias("sum_hit"))
    est = agg.select(
        F.lit(M_REGISTERS).alias("m"),
        F.col("hit").cast("long").alias("registers_hit"),
        F.expr(f"{_ALPHA_M2} / (sum_hit + (256 - hit) * 1.0)").alias("raw"),
        (F.lit(M_REGISTERS) - F.col("hit")).cast("double").alias("zeros"))
    est = est.select(
        "m", "registers_hit",
        F.round(F.expr(
            "CASE WHEN raw <= 2.5 * 256 AND zeros > 0 "
            "THEN 256.0 * ln(256.0 / zeros) ELSE raw END"), 4)
        .alias("hll_estimate"))
    exact = (ev.agg(F.count_distinct("user_id").alias("n_exact"))
             .withColumn("m", F.lit(M_REGISTERS)))
    return (est.join(exact, "m")
            .select("m", "registers_hit", "hll_estimate", "n_exact",
                    F.round((F.col("hll_estimate") - F.col("n_exact"))
                            * 100.0 / F.col("n_exact"), 2).alias("err_pct")))


def q_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (k minimum values) estimate of distinct ``user_id``: keep the
    k smallest distinct hash points in [0,1), estimate (k-1)/h_(k)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select("user_id")
    pts = (ev.select(F.expr(_H).alias("h"))
           .select(F.expr(_KMV_U).alias("u"))
           .distinct()
           .orderBy("u").limit(KMV_K))
    est = pts.agg(F.count("*").alias("k"), F.max("u").alias("hk"))
    exact = (ev.agg(F.count_distinct("user_id").alias("n_exact"))
             .withColumn("one", F.lit(1)))
    return (est.withColumn("one", F.lit(1)).join(exact, "one")
            .select(F.col("k").cast("long").alias("k"),
                    F.round("hk", 9).alias("kth_min"),
                    F.round((F.col("k") - 1) / F.col("hk"), 4)
                    .alias("kmv_estimate"),
                    "n_exact",
                    F.round((F.round((F.col("k") - 1) / F.col("hk"), 4)
                             - F.col("n_exact")) * 100.0 / F.col("n_exact"), 2)
                    .alias("err_pct")))


SKETCH_ORACLES = {
    "hll_distinct": f"""
        WITH hashed AS (
          SELECT {_H} AS h FROM events),
        nz AS (
          SELECT {_REG} AS register,
                 regexp_replace(substring(h, 3, 16), '^0+', '') AS z
          FROM hashed),
        regs AS (
          SELECT register, max({_RHO}) AS rho_max
          FROM nz GROUP BY register),
        agg AS (
          SELECT count(*) AS hit, sum(power(2.0, -rho_max)) AS sum_hit
          FROM regs),
        est AS (
          SELECT 256 AS m, CAST(hit AS BIGINT) AS registers_hit,
                 {_ALPHA_M2} / (sum_hit + (256 - hit) * 1.0) AS raw,
                 CAST(256 - hit AS DOUBLE) AS zeros
          FROM agg)
        SELECT m, registers_hit,
               round(CASE WHEN raw <= 2.5 * 256 AND zeros > 0
                          THEN 256.0 * ln(256.0 / zeros) ELSE raw END, 4)
                 AS hll_estimate,
               (SELECT count(DISTINCT user_id) FROM events) AS n_exact,
               round((round(CASE WHEN raw <= 2.5 * 256 AND zeros > 0
                            THEN 256.0 * ln(256.0 / zeros) ELSE raw END, 4)
                      - (SELECT count(DISTINCT user_id) FROM events)) * 100.0
                     / (SELECT count(DISTINCT user_id) FROM events), 2)
                 AS err_pct
        FROM est
    """,
    "kmv_distinct": f"""
        WITH pts AS (
          SELECT DISTINCT {_KMV_U} AS u
          FROM (SELECT {_H} AS h FROM events)
          ORDER BY u LIMIT {KMV_K}),
        est AS (
          SELECT count(*) AS k, max(u) AS hk FROM pts)
        SELECT CAST(k AS BIGINT) AS k, round(hk, 9) AS kth_min,
               round((k - 1) / hk, 4) AS kmv_estimate,
               (SELECT count(DISTINCT user_id) FROM events) AS n_exact,
               round((round((k - 1) / hk, 4)
                      - (SELECT count(DISTINCT user_id) FROM events)) * 100.0
                     / (SELECT count(DISTINCT user_id) FROM events), 2)
                 AS err_pct
        FROM est
    """,
}
