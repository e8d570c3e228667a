"""Deduplication operators for training-data pipelines over ``documents``.

Four tiers, all shuffle-conscious and oracle-checked against DuckDB:

* **exact**      — hash-groupBy on md5(text): one shuffle on a 32-byte key,
  never on the text payload itself (at 100 TB you shuffle digests, not docs).
* **n-gram Jaccard** — 3-word shingles → explode → group by shingle →
  in-posting-list pair expansion → pair-count → Jaccard ≥ τ. Bucket-then-
  expand rather than a shingle⋈shingle self-join: one shuffle on the shingle
  key, and the scan→shingle subtree runs once (a self-join plans it twice).
* **MinHash + LSH** — K=8 signatures from 2 keyed md5s per shingle (each
  128-bit digest yields four 32-bit pieces; string-min over lowercase hex ==
  numeric min, and md5 — unlike xxhash64 — is reproducible in any engine),
  banded 4×2; candidates = band-bucket group + in-bucket pairs. At 10^12
  docs this is the only tier that avoids the quadratic shingle blowup:
  cost is O(docs × bands) with bucket-local pairs.
* **SimHash**    — 16-bit signature from per-token digest bit-majorities;
  near-dup = Hamming distance ≤ 3. Banding on the high byte bounds the
  pair space.

The fixture corpus has no natural duplicates, so every query derives a
deterministic corpus: documents ∪ exact copies (doc_id+10000 for doc_id%5=0)
∪ near copies with one appended token (doc_id+20000 for doc_id%7=0). Both
engines build the same derivation, so the oracle checks the operator, not
the data generator.

Lowercasing caveat: the Arrow fast paths use Python ``str.lower`` (simple
Unicode mapping), which matches DuckDB's utf8proc ``lower`` — i.e. the
ORACLE — everywhere, while the JVM HOF twins inherit Java's
context-sensitive special casing (word-final Greek Σ→ς). The
Python↔JVM parity tests therefore hold on text where simple and
context-sensitive lowercasing agree (all ASCII and most scripts); on
final-sigma Greek the Python path is the one that matches the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .scan import widen

N_MINHASH = 8
N_BANDS = 4  # rows-per-band = 2
JACCARD_THRESHOLD = 0.5
SIMHASH_BITS = 16
HAMMING_MAX = 3


def _corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    exact = (docs.filter(F.col("doc_id") % 5 == 0)
             .select((F.col("doc_id") + 10000).alias("doc_id"), "text"))
    near = (docs.filter(F.col("doc_id") % 7 == 0)
            .select((F.col("doc_id") + 20000).alias("doc_id"),
                    F.concat(F.col("text"), F.lit(" extraword")).alias("text")))
    return docs.unionAll(exact).unionAll(near)

_CORPUS_SQL = """
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT doc_id + 10000 AS doc_id, text FROM documents WHERE doc_id % 5 = 0
    UNION ALL
    SELECT doc_id + 20000 AS doc_id, text || ' extraword' AS text
    FROM documents WHERE doc_id % 7 = 0
"""


def _shingles_of_words(words):
    """Distinct 3-word shingles from a materialized words ARRAY column.

    ``words`` MUST be a real column (see with_shingles), never an inline
    ``split(lower(text))`` subtree: higher-order lambdas are evaluated
    interpreted (no codegen, no common-subexpression elimination), so an
    inline subtree would re-split the WHOLE text once per produced shingle —
    O(words²) per document. Measured 5x on the sf0.1 corpus."""
    n = F.greatest(F.size(words) - F.lit(2), F.lit(0))
    grams = F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.concat_ws(" ", F.element_at(words, i),
                              F.element_at(words, i + 1),
                              F.element_at(words, i + 2)),
    )
    return F.array_distinct(F.when(n > 0, grams).otherwise(F.array()))


def with_shingles(df: DataFrame, text_col: str = "text") -> DataFrame:
    """df + ``sh`` column. ``words`` goes through a projection boundary so
    CollapseProject keeps it materialized (multi-use non-cheap alias)."""
    return (widen(df)
            .withColumn("words", F.split(F.lower(F.col(text_col)), " ", -1))
            .withColumn("sh", _shingles_of_words(F.col("words")))
            .drop("words"))

_SHINGLES_SQL = """
    list_distinct(CASE WHEN len(str_split(lower(text), ' ')) >= 3 THEN
      list_transform(range(1, len(str_split(lower(text), ' ')) - 1),
        i -> str_split(lower(text), ' ')[i] || ' ' ||
             str_split(lower(text), ' ')[i+1] || ' ' ||
             str_split(lower(text), ' ')[i+2])
      ELSE [] END)
"""


# ---------------------------------------------------------------------------
# 1. Exact dedup
# ---------------------------------------------------------------------------

def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicate groups: shuffle on md5 digest, not document bytes."""
    corpus = _corpus(spark, sf_dir)
    return (corpus
            .groupBy(F.md5(F.col("text")).alias("text_hash"))
            .agg(F.min("doc_id").alias("canonical_id"),
                 F.count("*").alias("dup_count"))
            .filter(F.col("dup_count") > 1)
            .select("canonical_id", "dup_count")
            .orderBy("canonical_id"))


# ---------------------------------------------------------------------------
# 2. N-gram Jaccard
# ---------------------------------------------------------------------------

def _shingle_rows_batches(it):
    """Arrow-batched shingle emitter: (doc_id, n_sh, shingle) per DISTINCT
    3-gram — the exploded form the posting-list groupBy consumes, produced
    in one Python pass instead of the JVM higher-order transform + Explode
    (HOFs run interpreted with no codegen; measured ~3x at sf0.1)."""
    import pandas as pd

    for pdf in it:
        ids: list[int] = []
        ns: list[int] = []
        shingles: list[str] = []
        for doc_id, text in zip(pdf["doc_id"].values, pdf["text"].values):
            if not isinstance(text, str):
                continue  # NULL text: JVM/oracle twins drop via len(sh)>0
            words = text.lower().split(" ")
            if len(words) < 3:
                continue
            seen = {words[i] + " " + words[i + 1] + " " + words[i + 2]
                    for i in range(len(words) - 2)}
            n = len(seen)
            ids.extend([doc_id] * n)
            ns.extend([n] * n)
            shingles.extend(seen)
        yield pd.DataFrame({"doc_id": ids, "n_sh": ns, "shingle": shingles})


def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairs with 3-gram Jaccard ≥ 0.5 (a < b). Explode-join candidate
    generation; Jaccard from |∩| and set sizes only — text never re-read."""
    ex = widen(_corpus(spark, sf_dir)).mapInPandas(
        _shingle_rows_batches, "doc_id long, n_sh int, shingle string")
    # bucket-then-expand (see q_dedup_minhash_lsh): a shingle⋈shingle
    # self-join would run the scan→shingle subtree twice; grouping by
    # shingle computes it once and pairs expand within each posting list
    buckets = (ex.groupBy("shingle")
               .agg(F.collect_list(F.struct("doc_id", "n_sh")).alias("ds"))
               .filter(F.size("ds") > 1))
    pairs = (buckets
             .select(F.explode("ds").alias("a"), F.col("ds"))
             .select("a", F.explode("ds").alias("b"))
             .filter(F.col("a.doc_id") < F.col("b.doc_id"))
             .groupBy(F.col("a.doc_id").alias("id_a"),
                      F.col("b.doc_id").alias("id_b"),
                      F.col("a.n_sh").alias("na"),
                      F.col("b.n_sh").alias("nb"))
             .agg(F.count("*").alias("common")))
    return (pairs
            .withColumn("jaccard",
                        F.round(F.col("common") /
                                (F.col("na") + F.col("nb") - F.col("common")), 4))
            .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
            .select("id_a", "id_b", "jaccard")
            .orderBy("id_a", "id_b"))


# ---------------------------------------------------------------------------
# 3. MinHash + LSH
# ---------------------------------------------------------------------------

def _minhash_sig(sh):
    """K=8 minima over the shingle set from TWO md5 evaluations per shingle
    (not K): each 128-bit digest yields four independent 32-bit pieces
    (8 hex chars), and lowercase hex is lexicographically monotonic in the
    integer value, so string-min == numeric min. The fold is a single
    ``F.aggregate`` pass referencing the hash array exactly once — writing
    K separate ``array_min(transform(...))`` expressions would duplicate
    the md5 subtree K times in the plan (higher-order functions are outside
    whole-stage codegen, so common-subexpression elimination cannot be
    relied on). Measured ~3x faster at sf0.1. Init 'g' sorts after every
    hex char, i.e. acts as +infinity.

    NB: lambdas must be unary — F.transform treats a 2-arg lambda as
    (element, index), which would silently replace the hash key with the
    array position."""
    hashes = F.transform(sh, lambda s: F.concat(
        F.md5(F.concat(F.lit("0|"), s)), F.md5(F.concat(F.lit("1|"), s))))
    init = F.array(*[F.lit("g") for _ in range(N_MINHASH)])
    return F.aggregate(
        hashes, init,
        lambda acc, h: F.array(*[
            F.least(F.element_at(acc, k + 1), F.substring(h, k * 8 + 1, 8))
            for k in range(N_MINHASH)]))


def _minhash_sig_batches(it):
    """Arrow-batched MinHash signatures: same algorithm/bytes as
    :func:`_minhash_sig` (two keyed md5s per distinct shingle, string-min
    over 8-hex-char pieces) but computed with ``hashlib`` in one Python pass
    per batch. The JVM fold runs interpreted (no whole-stage codegen for
    higher-order lambdas) and re-allocates the 8-slot accumulator array per
    shingle; measured 5x faster here at sf0.1 with byte-identical output
    (pinned by tests/test_operators.py)."""
    from hashlib import md5

    import pandas as pd

    for pdf in it:
        out_ids: list[int] = []
        out_sigs: list[list[str]] = []
        for doc_id, text in zip(pdf["doc_id"].values, pdf["text"].values):
            if not isinstance(text, str):
                continue  # NULL text: JVM/oracle twins drop via len(sh)>0
            words = text.lower().split(" ")
            if len(words) < 3:
                continue
            seen: set[str] = set()
            mins = ["g" * 8] * N_MINHASH
            for i in range(len(words) - 2):
                s = words[i] + " " + words[i + 1] + " " + words[i + 2]
                if s in seen:
                    continue
                seen.add(s)
                b = s.encode()
                h = md5(b"0|" + b).hexdigest() + md5(b"1|" + b).hexdigest()
                for k in range(N_MINHASH):
                    piece = h[k * 8:k * 8 + 8]
                    if piece < mins[k]:
                        mins[k] = piece
            out_ids.append(doc_id)
            out_sigs.append(mins)
        yield pd.DataFrame({"doc_id": out_ids, "sig": out_sigs})


def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH candidate pairs: equal (band_id, band_value) bucket → distinct
    pairs (a < b). Shuffle cost O(docs × N_BANDS) on short digest strings —
    the 10^12-doc-scale near-dup plan."""
    sigs = widen(_corpus(spark, sf_dir)).mapInPandas(
        _minhash_sig_batches, "doc_id long, sig array<string>")
    bands = sigs.select(
        "doc_id",
        F.explode(F.array(*[
            F.struct(F.lit(j).alias("band"),
                     F.concat_ws("|", *[F.element_at("sig", j * 2 + r + 1)
                                        for r in range(2)]).alias("bval"))
            for j in range(N_BANDS)
        ])).alias("bb")
    ).select("doc_id", "bb.band", "bb.bval")
    # Bucket-then-expand instead of a bands⋈bands self-join: the self-join
    # would execute the whole scan→shingle→md5→signature subtree TWICE
    # (Spark plans both join children independently; ReuseExchange does not
    # fire across the a/b aliases — verified in the formatted plan). Here
    # signatures are computed once, one shuffle groups band buckets, and
    # pairs expand JVM-side inside each bucket — the canonical LSH plan at
    # 10^12 docs, where recomputing signatures is the dominant cost.
    buckets = (bands.groupBy("band", "bval")
               .agg(F.collect_set("doc_id").alias("ids"))
               .filter(F.size("ids") > 1))
    return (buckets
            .select(F.explode("ids").alias("id_a"), F.col("ids"))
            .select("id_a", F.explode("ids").alias("id_b"))
            .filter(F.col("id_a") < F.col("id_b"))
            .distinct()
            .orderBy("id_a", "id_b"))


# ---------------------------------------------------------------------------
# 4. SimHash
# ---------------------------------------------------------------------------

def _simhash_from_hashes(hh):
    """16-bit simhash: bit b = majority over tokens of md5-nibble-b high bit.
    Integer-only (+1/-1 sums; ties → bit set) for cross-engine determinism.

    ``hh`` MUST be a materialized column of per-token md5 hex strings:
    hashing inline here would recompute md5 per token per BIT (16x), since
    the 16 bit_sum folds each reference the array independently and
    higher-order lambdas get no codegen/CSE."""
    def bit_sum(b):
        return F.aggregate(
            hh, F.lit(0),
            lambda acc, h: acc + F.when(
                F.substring(h, b + 1, 1).isin(
                    "8", "9", "a", "b", "c", "d", "e", "f"), 1).otherwise(-1))
    val = F.lit(0)
    for b in range(SIMHASH_BITS):
        val = val + F.when(bit_sum(b) >= 0, F.lit(1 << b)).otherwise(F.lit(0))
    return val


def _simhash_batches(it):
    """Arrow-batched simhash: same bit-majority semantics as
    :func:`_simhash_from_hashes` (every token OCCURRENCE votes ±1 per
    nibble-bit, ties set the bit) with a per-batch token→digest memo —
    tokens repeat heavily, and the JVM version cannot share the md5 across
    its 16 per-bit folds (pinned equal in tests/test_operators.py)."""
    from hashlib import md5

    import pandas as pd

    high = set("89abcdef")
    for pdf in it:
        memo: dict[str, str] = {}
        out_ids: list[int] = []
        out_sigs: list[int] = []
        for doc_id, text in zip(pdf["doc_id"].values, pdf["text"].values):
            if not isinstance(text, str):
                # NULL text: both twins KEEP the row with simhash 0 (every
                # per-bit vote folds over a NULL array → CASE falls through)
                out_ids.append(doc_id)
                out_sigs.append(0)
                continue
            counts = [0] * SIMHASH_BITS
            for t in text.lower().split(" "):
                h = memo.get(t)
                if h is None:
                    h = memo[t] = md5(t.encode()).hexdigest()
                for b in range(SIMHASH_BITS):
                    counts[b] += 1 if h[b] in high else -1
            out_ids.append(doc_id)
            out_sigs.append(sum(1 << b for b in range(SIMHASH_BITS)
                                if counts[b] >= 0))
        yield pd.DataFrame({"doc_id": out_ids, "simhash": out_sigs})


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs with Hamming(simhash) ≤ 3 among derived corpus docs.
    Banding on the signature high byte bounds the join (same-byte buckets)."""
    sigs = (widen(_corpus(spark, sf_dir))
            .mapInPandas(_simhash_batches, "doc_id long, simhash int")
            .withColumn("band", F.floor(F.col("simhash") / 256).cast("int")))
    # Deliberately a self-join, NOT minhash's bucket-then-expand: simhash
    # bands have only 256 values, so collect_list would centralize a whole
    # band in one row (single-task k² expansion, memory hazard at scale)
    # while the sort-merge join generates pairs inside codegen — measured
    # 2.2x faster at sf0.1 (3.98s vs 8.85s) even though the join plans the
    # (cheap, Arrow-batched) signature stage for both children.
    a, b = sigs.alias("a"), sigs.alias("b")
    pairs = (a.join(b, (F.col("a.band") == F.col("b.band"))
                    & (F.col("a.doc_id") < F.col("b.doc_id")))
             .select(F.col("a.doc_id").alias("id_a"),
                     F.col("b.doc_id").alias("id_b"),
                     F.bit_count(F.col("a.simhash")
                                 .bitwiseXOR(F.col("b.simhash")))
                     .alias("hamming")))
    return (pairs.filter(F.col("hamming") <= HAMMING_MAX)
            .orderBy("id_a", "id_b"))


_SIMHASH_SQL = """
    (SELECT doc_id,
       {bits} AS simhash
     FROM corpus)
""".format(bits=" + ".join(
    f"""(CASE WHEN list_sum(list_transform(str_split(lower(text), ' '),
            t -> CASE WHEN substring(md5(t), {b + 1}, 1)
                 IN ('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END)) >= 0
          THEN {1 << b} ELSE 0 END)"""
    for b in range(SIMHASH_BITS)))


# ---------------------------------------------------------------------------
# 5. Embedding-cosine near-dup
# ---------------------------------------------------------------------------

COSINE_DUP_THRESHOLD = 0.99


def q_dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space near-dup: derived corpus = embeddings ∪ slightly
    perturbed copies (vec_id+10000, dim-1 += 0.01, every 10th vector);
    candidates bucketed by the same md5-derived hyperplane LSH as the ANN
    operator (the 10^12-vector plan: bucket equi-join, then exact cosine
    ≥ 0.99 re-check inside buckets only)."""
    from .similarity import _bucket_expr, _dot, _norm

    emb = (spark.read.parquet(f"{sf_dir}/embeddings.parquet")
           .select("vec_id",
                   F.transform(F.col("embedding"),
                               lambda x: x.cast("double")).alias("embedding")))
    # All math in float64 on both engines (float32→float64 is exact; adding
    # 0.01 in mixed precision would double-round and diverge cross-engine).
    perturbed = (emb.filter(F.col("vec_id") % 10 == 0)
                 .select((F.col("vec_id") + 10000).alias("vec_id"),
                         F.transform(
                             F.col("embedding"),
                             lambda x, i: F.when(i == 0, x + F.lit(0.01))
                             .otherwise(x)).alias("embedding")))
    corpus = (emb.unionAll(perturbed)
              .withColumn("bucket", _bucket_expr(F.col("embedding"))))
    a, b = corpus.alias("a"), corpus.alias("b")
    return (a.join(b, (F.col("a.bucket") == F.col("b.bucket"))
                   & (F.col("a.vec_id") < F.col("b.vec_id")))
            .select(F.col("a.vec_id").alias("id_a"),
                    F.col("b.vec_id").alias("id_b"),
                    F.round(_dot(F.col("a.embedding"), F.col("b.embedding")) /
                            (_norm(F.col("a.embedding")) * _norm(F.col("b.embedding"))),
                            6).alias("cosine"))
            .filter(F.col("cosine") >= COSINE_DUP_THRESHOLD)
            .orderBy("id_a", "id_b"))


def _embedding_cosine_oracle() -> str:
    from .similarity import DIM, _bucket_sql, _dot_sql, _norm_sql
    perturb = (f"list_transform(range(1, {DIM + 1}), "
               f"i -> CASE WHEN i = 1 THEN CAST(embedding[i] AS DOUBLE) + 0.01 "
               f"ELSE CAST(embedding[i] AS DOUBLE) END)")
    return f"""
        WITH corpus AS (
          SELECT vec_id, embedding::DOUBLE[] AS embedding FROM embeddings
          UNION ALL
          SELECT vec_id + 10000 AS vec_id, {perturb}::DOUBLE[] AS embedding
          FROM embeddings WHERE vec_id % 10 = 0),
        b AS (SELECT vec_id, embedding, {_bucket_sql('embedding')} AS bucket
              FROM corpus),
        pairs AS (
          SELECT a.vec_id AS id_a, b2.vec_id AS id_b,
                 round({_dot_sql('a.embedding', 'b2.embedding')} /
                       ({_norm_sql('a.embedding')} * {_norm_sql('b2.embedding')}), 6)
                 AS cosine
          FROM b a JOIN b b2
            ON a.bucket = b2.bucket AND a.vec_id < b2.vec_id)
        SELECT id_a, id_b, cosine FROM pairs
        WHERE cosine >= {COSINE_DUP_THRESHOLD}
        ORDER BY id_a, id_b
    """


DEDUP_ORACLES = {
    "dedup_exact": f"""
        WITH corpus AS ({_CORPUS_SQL})
        SELECT min(doc_id) AS canonical_id, count(*) AS dup_count
        FROM corpus GROUP BY md5(text) HAVING count(*) > 1
        ORDER BY canonical_id
    """,
    "dedup_ngram_jaccard": f"""
        WITH corpus AS ({_CORPUS_SQL}),
        sh AS (SELECT doc_id, {_SHINGLES_SQL} AS shingles FROM corpus),
        sized AS (SELECT doc_id, shingles, len(shingles) AS n_sh
                  FROM sh WHERE len(shingles) > 0),
        ex AS (SELECT doc_id, n_sh, unnest(shingles) AS shingle FROM sized),
        pairs AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                 a.n_sh AS na, b.n_sh AS nb, count(*) AS common
          FROM ex a JOIN ex b
            ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY 1, 2, 3, 4)
        SELECT id_a, id_b,
               round(common / (na + nb - common), 4) AS jaccard
        FROM pairs
        WHERE round(common / (na + nb - common), 4) >= {JACCARD_THRESHOLD}
        ORDER BY id_a, id_b
    """,
    "dedup_minhash_lsh": f"""
        WITH corpus AS ({_CORPUS_SQL}),
        sh AS (SELECT doc_id, {_SHINGLES_SQL} AS shingles FROM corpus),
        sized AS (SELECT doc_id, shingles FROM sh WHERE len(shingles) > 0),
        hh AS (SELECT doc_id,
                      list_transform(shingles,
                                     s -> md5('0|' || s) || md5('1|' || s)) AS hs
               FROM sized),
        sigs AS (SELECT doc_id,
            [{", ".join(
                f"list_aggregate(list_transform(hs, x -> x[{k * 8 + 1}:{k * 8 + 8}]), 'min')"
                for k in range(N_MINHASH))}] AS sig
          FROM hh),
        bands AS (
          {" UNION ALL ".join(
              f"SELECT doc_id, {j} AS band, sig[{j * 2 + 1}] || '|' || sig[{j * 2 + 2}] AS bval FROM sigs"
              for j in range(N_BANDS))}
        )
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.bval = b.bval AND a.doc_id < b.doc_id
        ORDER BY id_a, id_b
    """,
    "dedup_simhash": f"""
        WITH corpus AS ({_CORPUS_SQL}),
        sigs AS (SELECT doc_id, simhash, CAST(floor(simhash / 256.0) AS INT) AS band
                 FROM {_SIMHASH_SQL} s),
        pairs AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                 bit_count(xor(a.simhash::BIGINT, b.simhash::BIGINT)) AS hamming
          FROM sigs a JOIN sigs b
            ON a.band = b.band AND a.doc_id < b.doc_id)
        SELECT id_a, id_b, hamming FROM pairs
        WHERE hamming <= {HAMMING_MAX}
        ORDER BY id_a, id_b
    """,
}
