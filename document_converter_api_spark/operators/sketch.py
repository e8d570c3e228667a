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


def hll_register_table(df: DataFrame, key: str = "user_id") -> DataFrame:
    """(register, rho_max) for every HIT register — the mergeable sketch
    state.  Map-side combine caps the shuffle at m rows per task."""
    return (df.select(F.expr(f"md5(CAST({key} AS STRING))").alias("h"))
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
    k smallest distinct hash points in [0,1), estimate (k-1)/h_(k).
    When fewer than KMV_K distinct keys exist the bottom-k set IS the
    whole population and (k-1)/h_k is biased — the estimate there is
    exactly k (same guard in the oracle)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select("user_id")
    pts = (ev.select(F.expr(_H).alias("h"))
           .select(F.expr(_KMV_U).alias("u"))
           .distinct()
           .orderBy("u").limit(KMV_K))
    est = pts.agg(F.count("*").alias("k"), F.max("u").alias("hk"))
    exact = (ev.agg(F.count_distinct("user_id").alias("n_exact"))
             .withColumn("one", F.lit(1)))
    kmv_est = F.round(
        F.when(F.col("k") < KMV_K, F.col("k").cast("double"))
        .otherwise((F.col("k") - 1) / F.col("hk")), 4)
    return (est.withColumn("one", F.lit(1)).join(exact, "one")
            .select(F.col("k").cast("long").alias("k"),
                    F.round("hk", 9).alias("kth_min"),
                    kmv_est.alias("kmv_estimate"),
                    "n_exact",
                    F.round((kmv_est - F.col("n_exact")) * 100.0
                            / F.col("n_exact"), 2)
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
               round(CASE WHEN k < {KMV_K} THEN CAST(k AS DOUBLE)
                          ELSE (k - 1) / hk END, 4) AS kmv_estimate,
               (SELECT count(DISTINCT user_id) FROM events) AS n_exact,
               round((round(CASE WHEN k < {KMV_K} THEN CAST(k AS DOUBLE)
                                 ELSE (k - 1) / hk END, 4)
                      - (SELECT count(DISTINCT user_id) FROM events)) * 100.0
                     / (SELECT count(DISTINCT user_id) FROM events), 2)
                 AS err_pct
        FROM est
    """,
}


# ---------------------------------------------------------------------------
# Count-min sketch (frequency) and Bloom filter (membership) — both with
# INTEGER/BIT-exact cross-engine parity: counters are plain sums and the
# filter words plain bit_or folds, so there is no float question at all.
# ---------------------------------------------------------------------------

CMS_D = 4         # count-min hash rows
CMS_W = 256       # counters per row
BLOOM_BITS = 1024  # 32 words x 32 bits
BLOOM_K = 4        # hash functions
# Oracles word-index with `pos // 32` (floor), never `CAST(pos / 32 AS INT)`:
# DuckDB's float->int cast rounds HALF-TO-EVEN, so tie positions (pos%32==16)
# would collapse into the wrong word while Spark's cast truncates.
_BLOOM_WORD_BITS = 32

# Column index for count-min row r: first two nibbles of a per-row keyed md5.
_CMS_COL = (f"CAST((instr({_NIBBLES}, substring(hr, 1, 1)) - 1) * 16 + "
            f"(instr({_NIBBLES}, substring(hr, 2, 1)) - 1) AS INT)")
_CMS_H = "md5(CAST(user_id AS STRING) || ':' || CAST(r AS STRING))"

# Bloom bit position for hash j: first three nibbles (0..4095) mod 1024.
_BLOOM_H = "md5(CAST(user_id AS STRING) || '#' || CAST(j AS STRING))"
_BLOOM_POS = (f"CAST(((instr({_NIBBLES}, substring(hj, 1, 1)) - 1) * 256 + "
              f"(instr({_NIBBLES}, substring(hj, 2, 1)) - 1) * 16 + "
              f"(instr({_NIBBLES}, substring(hj, 3, 1)) - 1)) % {BLOOM_BITS} "
              "AS INT)")


def cms_table(df: DataFrame, key: str = "user_id") -> DataFrame:
    """The (r, col, counter) count-min state: d×w counters, each a plain
    SUM — map-side combinable, mergeable across corpora by addition, and
    the shuffle is bounded at d·w rows per task regardless of input."""
    hr = _CMS_H.replace("user_id", key)
    return (df.select(key, F.explode(
                F.array(*[F.lit(i) for i in range(CMS_D)])).alias("r"))
            .withColumn("hr", F.expr(hr))
            .select("r", F.expr(_CMS_COL).alias("col"))
            .groupBy("r", "col").agg(F.count("*").alias("counter")))


def q_cms_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min frequency estimates for the exact top-10 users by event
    count: estimate = min over the d rows of the hashed counter.  The
    CMS guarantee (estimate >= truth, overestimate only) is visible in
    the output as a non-negative ``overcount`` column."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select("user_id")
    sketch = cms_table(ev)
    top = (ev.groupBy("user_id").agg(F.count("*").alias("true_n"))
           .orderBy(F.desc("true_n"), F.asc("user_id")).limit(10))
    probes = (top.select("user_id", "true_n", F.explode(
                  F.array(*[F.lit(i) for i in range(CMS_D)])).alias("r"))
              .withColumn("hr", F.expr(_CMS_H))
              .select("user_id", "true_n", "r", F.expr(_CMS_COL).alias("col")))
    return (probes.join(sketch, ["r", "col"])
            .groupBy("user_id", "true_n")
            .agg(F.min("counter").cast("long").alias("cms_estimate"))
            .select("user_id", "true_n", "cms_estimate",
                    (F.col("cms_estimate") - F.col("true_n"))
                    .cast("long").alias("overcount"))
            .orderBy("user_id"))


def bloom_words(df: DataFrame, key: str = "user_id") -> DataFrame:
    """The (word, bits) Bloom state: BLOOM_BITS bits as 32-bit-word
    ``bit_or`` folds — at most 32 rows leave each map task, and two
    filters merge by OR-ing words."""
    hj = _BLOOM_H.replace("user_id", key)
    return (df.select(key, F.explode(
                F.array(*[F.lit(i) for i in range(BLOOM_K)])).alias("j"))
            .withColumn("hj", F.expr(hj))
            .select(F.expr(_BLOOM_POS).alias("pos"))
            .select((F.col("pos") / _BLOOM_WORD_BITS).cast("int").alias("word"),
                    F.expr(f"CAST(power(2, pos % {_BLOOM_WORD_BITS}) AS BIGINT)")
                    .alias("mask"))
            .groupBy("word").agg(F.bit_or("mask").alias("bits")))


def bloom_probe_cells(df: DataFrame, key: str = "user_id") -> DataFrame:
    """Per-key probe cells: each key explodes into its BLOOM_K (word,
    mask) positions. The single source of the probe-side hash scheme —
    a filter built by :func:`bloom_words` answers a probe iff every one
    of these cells has its bit set, and keeping build and probe in one
    module is what makes the no-false-negative invariant a structural
    property rather than a convention."""
    hj = _BLOOM_H.replace("user_id", key)
    return (df.select("*", F.explode(
                F.array(*[F.lit(i) for i in range(BLOOM_K)])).alias("j"))
            .withColumn("hj", F.expr(hj))
            .withColumn("pos", F.expr(_BLOOM_POS))
            .withColumn("word", (F.col("pos") / _BLOOM_WORD_BITS).cast("int"))
            .withColumn("mask", F.expr(
                f"CAST(power(2, pos % {_BLOOM_WORD_BITS}) AS BIGINT)"))
            .drop("j", "hj", "pos"))


def q_bloom_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build a Bloom filter over the EVEN user ids, probe every distinct
    user: no false negatives (pinned as ``n_false_neg`` must be 0) and a
    measured false-positive count against the ground truth.  The filter
    is 32 rows — Spark broadcasts it to the probe join."""
    users = (spark.read.parquet(f"{sf_dir}/events.parquet")
             .select("user_id").distinct())
    members = users.filter(F.col("user_id") % 2 == 0)
    filt = bloom_words(members)
    probes = bloom_probe_cells(users)
    hits = (probes.join(F.broadcast(filt), "word", "left")
            .select("user_id",
                    ((F.coalesce(F.col("bits"), F.lit(0))
                      .bitwiseAND(F.col("mask"))) == F.col("mask")).alias("hit"))
            .groupBy("user_id").agg(F.bool_and("hit").alias("positive")))
    return (hits.withColumn("is_member", F.col("user_id") % 2 == 0)
            .agg(F.count("*").cast("long").alias("n_probes"),
                 F.sum(F.when(F.col("is_member"), 1).otherwise(0))
                 .cast("long").alias("n_members"),
                 F.sum(F.when(F.col("positive"), 1).otherwise(0))
                 .cast("long").alias("n_positive"),
                 F.sum(F.when(F.col("positive") & ~F.col("is_member"), 1)
                       .otherwise(0)).cast("long").alias("n_false_pos"),
                 F.sum(F.when(~F.col("positive") & F.col("is_member"), 1)
                       .otherwise(0)).cast("long").alias("n_false_neg")))


SKETCH_ORACLES["cms_topk"] = f"""
    WITH r AS (SELECT unnest([0, 1, 2, 3]) AS r),
    rows_ AS (
      SELECT user_id, r, {_CMS_H} AS hr FROM events CROSS JOIN r),
    cells AS (
      SELECT r, {_CMS_COL} AS col FROM rows_),
    sketch AS (
      SELECT r, col, count(*) AS counter FROM cells GROUP BY r, col),
    top AS (
      SELECT user_id, count(*) AS true_n FROM events GROUP BY user_id
      ORDER BY true_n DESC, user_id ASC LIMIT 10),
    probes AS (
      SELECT t.user_id, t.true_n, r.r,
             md5(CAST(t.user_id AS STRING) || ':' || CAST(r.r AS STRING)) AS hr
      FROM top t CROSS JOIN r),
    pcells AS (
      SELECT user_id, true_n, r, {_CMS_COL} AS col FROM probes)
    SELECT p.user_id, p.true_n,
           CAST(min(s.counter) AS BIGINT) AS cms_estimate,
           CAST(min(s.counter) - p.true_n AS BIGINT) AS overcount
    FROM pcells p JOIN sketch s ON p.r = s.r AND p.col = s.col
    GROUP BY p.user_id, p.true_n
    ORDER BY p.user_id
"""

SKETCH_ORACLES["bloom_filter"] = f"""
    WITH j AS (SELECT unnest([0, 1, 2, 3]) AS j),
    users AS (SELECT DISTINCT user_id FROM events),
    mrows AS (
      SELECT user_id, j, {_BLOOM_H} AS hj
      FROM (SELECT user_id FROM users WHERE user_id % 2 = 0) CROSS JOIN j),
    mpos AS (SELECT {_BLOOM_POS} AS pos FROM mrows),
    filt AS (
      SELECT CAST(pos // {_BLOOM_WORD_BITS} AS INT) AS word,
             bit_or(CAST(power(2, pos % {_BLOOM_WORD_BITS}) AS BIGINT)) AS bits
      FROM mpos GROUP BY 1),
    prows AS (
      SELECT user_id, j, {_BLOOM_H} AS hj FROM users CROSS JOIN j),
    ppos AS (SELECT user_id, {_BLOOM_POS} AS pos FROM prows),
    pcell AS (
      SELECT user_id, CAST(pos // {_BLOOM_WORD_BITS} AS INT) AS word,
             CAST(power(2, pos % {_BLOOM_WORD_BITS}) AS BIGINT) AS mask
      FROM ppos),
    hits AS (
      SELECT p.user_id,
             bool_and((COALESCE(f.bits, 0) & p.mask) = p.mask) AS positive
      FROM pcell p LEFT JOIN filt f ON p.word = f.word
      GROUP BY p.user_id)
    SELECT CAST(count(*) AS BIGINT) AS n_probes,
           CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_members,
           CAST(sum(CASE WHEN positive THEN 1 ELSE 0 END) AS BIGINT)
             AS n_positive,
           CAST(sum(CASE WHEN positive AND user_id % 2 <> 0 THEN 1 ELSE 0 END)
             AS BIGINT) AS n_false_pos,
           CAST(sum(CASE WHEN NOT positive AND user_id % 2 = 0 THEN 1 ELSE 0 END)
             AS BIGINT) AS n_false_neg
    FROM hits
"""


# ---------------------------------------------------------------------------
# Mergeable equi-width histogram + interpolated quantiles
# ---------------------------------------------------------------------------

HIST_BINS = 64


def q_histogram_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate p50/p95 of ``value`` per event_type from a 64-bin
    equi-width histogram with linear interpolation inside the hit bin.

    This is the SCALE path next to ``value_percentiles``' exact per-group
    sort: bin counts are plain sums — map-side combinable and mergeable
    across partitions/corpora by addition, so the shuffle carries at most
    groups×64 rows per task regardless of input size.  Exact percentiles
    need the whole group's values co-located and sorted; the histogram
    needs neither.  Spark's own ``percentile_approx`` (KLL-ish) cannot be
    oracle-checked across engines; this estimator CAN — binning, cumsum
    and interpolation are the same arithmetic on both sides.

    Determinism: bin edges derive from the group's exact min/max (both
    engines agree bit-for-bit), ``floor((value-min)/width)`` is a single
    IEEE divide on identical doubles, and the interpolation is a couple
    more — the comparator's 9-decimal rounding absorbs nothing here
    because every input double is identical by construction."""
    from pyspark.sql.window import Window

    ev = (spark.read.parquet(f"{sf_dir}/events.parquet")
          .select("event_type", "value"))
    stats = ev.groupBy("event_type").agg(
        F.min("value").alias("lo"), F.max("value").alias("hi"),
        F.count("*").alias("n"))
    binned = (ev.join(F.broadcast(stats), "event_type")
              .select("event_type",
                      F.least(F.floor((F.col("value") - F.col("lo"))
                                      / ((F.col("hi") - F.col("lo"))
                                         / HIST_BINS)),
                              F.lit(HIST_BINS - 1)).cast("int").alias("bin"))
              .groupBy("event_type", "bin").agg(F.count("*").alias("c")))
    w = (Window.partitionBy("event_type").orderBy("bin")
         .rowsBetween(Window.unboundedPreceding, 0))
    cum = (binned.withColumn("cum", F.sum("c").over(w))
           .withColumn("prev", F.col("cum") - F.col("c")))
    qs = spark.createDataFrame([(0.5,), (0.95,)], "q double")
    hit = (cum.crossJoin(F.broadcast(qs))
           .join(F.broadcast(stats), "event_type")
           .filter((F.col("cum") >= F.col("q") * F.col("n"))
                   & (F.col("prev") < F.col("q") * F.col("n")))
           .select("event_type", "q", "n",
                   F.round(F.col("lo")
                           + ((F.col("hi") - F.col("lo")) / HIST_BINS)
                           * (F.col("bin")
                              + (F.col("q") * F.col("n") - F.col("prev"))
                              / F.col("c")), 4).alias("estimate")))
    return hit.orderBy("event_type", "q")


SKETCH_ORACLES["histogram_quantiles"] = f"""
    WITH stats AS (
      SELECT event_type, min(value) AS lo, max(value) AS hi,
             count(*) AS n
      FROM events GROUP BY event_type),
    binned AS (
      SELECT e.event_type,
             CAST(least(floor((e.value - s.lo) / ((s.hi - s.lo) / {HIST_BINS})),
                        {HIST_BINS - 1}) AS INT) AS bin,
             count(*) AS c
      FROM events e JOIN stats s USING (event_type)
      GROUP BY 1, 2),
    cum AS (
      SELECT event_type, bin, c,
             sum(c) OVER (PARTITION BY event_type ORDER BY bin
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum
      FROM binned),
    qs AS (SELECT unnest([0.5, 0.95]) AS q)
    SELECT c.event_type, qs.q, s.n,
           round(s.lo + ((s.hi - s.lo) / {HIST_BINS})
                 * (c.bin + (qs.q * s.n - (c.cum - c.c)) / c.c), 4)
             AS estimate
    FROM cum c
    CROSS JOIN qs
    JOIN stats s USING (event_type)
    WHERE c.cum >= qs.q * s.n AND (c.cum - c.c) < qs.q * s.n
    ORDER BY c.event_type, qs.q
"""
