"""Interleaved A/B: lang_audit r4 (three F.filter over a token array) vs
the shipped r5 form (one (?i) regexp_extract_all + aggregate + inline).

Round-4 verdict items 3 and 9: lang_audit was the slowest bench query every
round (7.1-18.1 s across r4 windows at the bench fixture), and the final
BENCH_r04.json snapshot showed 2.1x outliers for lang_audit / logreg_train /
link_pagerank that cross-window evidence attributed to hypervisor noise.
This script settles both: it interleaves A (the old 3-pass form, reproduced
inline) with B (the shipped q_lang_audit) per repetition so window noise
hits both arms equally, then takes one quiet-window standalone measurement
of logreg_train and link_pagerank.

Usage: python tools/ab_lang_audit.py [reps]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from document_converter_api_spark.operators.pagemeta import (  # noqa: E402
    DECLARED_RE,
    LANG_ORDER,
    STOPWORDS,
    _page,
    _pages_df,
    q_lang_audit,
    visible_text,
)


def lang_audit_r4(spark):
    """The round-4 form: three sibling F.filter columns over `toks`."""
    docs = (_pages_df(spark)
            .select("url",
                    F.regexp_extract(_page(), DECLARED_RE, 1)
                    .alias("declared_lang"),
                    F.split(F.lower(visible_text(_page())), "[^a-z]+", -1)
                    .alias("toks")))

    def _hits(lang):
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


def timed(df):
    """noop-write materialization — what bench.py measures. count() is
    NOT equivalent: Catalyst prunes every unused column under a count,
    which hid the real cost profile in the first round-5 A/B."""
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0, df.columns


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    spark = (SparkSession.builder.master(f"local[{os.cpu_count()}]")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.driver.memory", "8g")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    # warm the JVM + file cache on both arms once, unmeasured
    timed(lang_audit_r4(spark))
    timed(q_lang_audit(spark, sf))

    a_times, b_times = [], []
    for i in range(reps):
        ta, na = timed(lang_audit_r4(spark))
        tb, nb = timed(q_lang_audit(spark, sf))
        assert na == nb, (na, nb)
        a_times.append(ta)
        b_times.append(tb)
        print(f"rep {i}: A(r4 3-filter)={ta:.2f}s  "
              f"B(r5 extract_all+inline)={tb:.2f}s", flush=True)

    med = lambda xs: sorted(xs)[len(xs) // 2]  # noqa: E731
    print(f"\nmedian A={med(a_times):.2f}s  median B={med(b_times):.2f}s  "
          f"speedup={med(a_times) / med(b_times):.2f}x")

    # quiet-window standalone: the other two r4 outliers
    import __spark_entry__ as entry
    q = entry.queries()
    for name in ("logreg_train", "link_pagerank"):
        t, _ = timed(q[name](spark, sf))
        t2, _ = timed(q[name](spark, sf))
        print(f"{name}: cold={t:.2f}s warm={t2:.2f}s")


if __name__ == "__main__":
    main()
