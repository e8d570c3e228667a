"""Corpus-curation job: stage effects (dedup, gate, lang filter,
redaction, split), idempotent reruns, and determinism."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from jobs.curate import run_curation_job  # noqa: E402

SF = "/root/testdata/sf0.001"


def _read_all(spark, root):
    from document_converter_api_spark.sources.tableio import ManifestTable
    out = {}
    for split in ("train", "validation", "test"):
        t = ManifestTable(os.path.join(root, "curated", split))
        out[split] = ([] if t.is_empty()
                      else t.read(spark).collect())
    return out


class TestCurationJob:
    def test_stages_apply_and_stats_consistent(self, spark, tmp_path):
        root = str(tmp_path / "out")
        stats = run_curation_job(
            spark, f"{SF}/documents.parquet", root, langs=("en",))
        assert stats["curated_docs"] > 0
        assert stats["curated_docs"] <= stats["input_docs"]
        rows = _read_all(spark, root)
        n = sum(len(v) for v in rows.values())
        assert n == stats["curated_docs"]
        allrows = [r for v in rows.values() for r in v]
        # lang filter: only predicted-en documents survive
        assert all(r.pred_lang == "en" for r in allrows)
        # dedup: at most one row per redacted-text digest is NOT quite
        # provable post-redaction; doc_id uniqueness is (dedup keeps the
        # min doc_id per text, ids were unique upstream)
        ids = [r.doc_id for r in allrows]
        assert len(ids) == len(set(ids))
        # redaction: no raw emails survive in any curated text
        import re
        from document_converter_api_spark.operators.curation import EMAIL_RE
        assert not any(re.search(EMAIL_RE, r.redacted) for r in allrows)

    def test_rerun_is_idempotent_and_deterministic(self, spark, tmp_path):
        root = str(tmp_path / "out2")
        s1 = run_curation_job(
            spark, f"{SF}/documents.parquet", root, langs=("en", "es"))
        rows1 = {s: sorted((r.doc_id, r.redacted) for r in v)
                 for s, v in _read_all(spark, root).items()}
        s2 = run_curation_job(
            spark, f"{SF}/documents.parquet", root, langs=("en", "es"))
        rows2 = {s: sorted((r.doc_id, r.redacted) for r in v)
                 for s, v in _read_all(spark, root).items()}
        assert s1["splits"] == s2["splits"]
        # replace_group semantics: the rerun REPLACES each split, so the
        # table holds one copy, byte-identical to the first run
        assert rows1 == rows2


class TestRefinedWebStages:
    def test_strip_lines_canonicalizes_boilerplate_variants(self, spark):
        """Two docs identical except one repeats a line must dedup to ONE
        row when strip_lines=True (and to two rows without it)."""
        from jobs.curate import curate
        body = ("the quick brown fox jumps over the lazy dog again today\n"
                "data pipeline spark cluster partition shuffle extract now")
        rows = [
            (1, "en", body),
            (2, "en", body + "\n" + body.split("\n")[0]),  # repeated line 1
        ]
        docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
        plain = curate(docs, ("en",)).collect()
        stripped = curate(docs, ("en",), strip_lines=True).collect()
        assert len(plain) == 2
        assert len(stripped) == 1 and stripped[0].doc_id == 1

    def test_drop_ppl_tail_removes_a_third_per_language(self, spark):
        """With the tail tercile cut, each predicted language keeps ~2/3
        of its gate-surviving docs, and exactly the lowest-score third
        disappears."""
        from pyspark.sql import functions as F

        from jobs.curate import curate
        docs = (spark.read.parquet(f"{SF}/documents.parquet")
                .select("doc_id", "lang", "text"))
        full = curate(docs, ("en",)).select("doc_id").collect()
        cut = curate(docs, ("en",), drop_ppl_tail=True).select("doc_id").collect()
        n_full, n_cut = len(full), len(cut)
        assert 0 < n_cut < n_full
        # terciles: kept = n - ntile-tail size (n//3, first buckets padded)
        assert n_cut == n_full - (n_full // 3)
        assert {r.doc_id for r in cut} <= {r.doc_id for r in full}

    def test_unscoreable_docs_always_land_in_tail(self, spark):
        """Docs with <2 tokens (NULL bigram score) must be bucketed
        'tail' even when they outnumber a third of the language — the
        ntile terciles must split only the scoreable population."""
        from document_converter_api_spark.operators.curation import (
            with_perplexity_bucket,
        )
        body = "the quick brown fox jumps over the lazy dog today"
        rows = ([(i, "en", "solo") for i in range(3)]      # unscoreable
                + [(10, "en", body), (11, "en", body + " again")])
        docs = spark.createDataFrame(
            rows, "doc_id long, lang string, text string")
        out = {r.doc_id: r.ppl_bucket
               for r in with_perplexity_bucket(docs).collect()}
        for i in range(3):
            assert out[i] == "tail", out
        # the two scoreable docs split head/middle — never displaced by
        # the NULL majority
        assert {out[10], out[11]} == {"head", "middle"}, out


class TestFullChain:
    def test_warc_to_extraction_to_curation(self, spark, tmp_path):
        """The whole production path in one pass: raw WARC segments →
        extraction job (gates, salting, lineage) → curation job (dedup,
        quality gate, lang filter, redaction, split) — raw crawl bytes in,
        per-split curated tables out."""
        import pyarrow.parquet as pq
        from pyspark.sql import functions as F

        from document_converter_api_spark.plans.pipeline import (
            run_extraction_job,
        )
        from document_converter_api_spark.sources.tableio import (
            ManifestTable,
        )
        from document_converter_api_spark.sources.warc import write_warc

        fixtures = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "fixtures", "data", "pages_smoke.parquet")
        t = pq.read_table(fixtures)
        rows = list(zip(t.column("url").to_pylist(),
                        t.column("warc_ts").to_pylist(),
                        t.column("html").to_pylist()))
        indir = tmp_path / "warc"
        indir.mkdir()
        write_warc(rows, str(indir / "seg-00000.warc.gz"), compress=True)

        exdir = str(tmp_path / "extracted")
        stats = run_extraction_job(spark, str(indir) + "/*", exdir,
                                   num_partitions=8, partitions_per_commit=8,
                                   input_format="warc")
        assert stats["docs"] > 0

        # extraction results -> the curation job's documents shape
        docs = (ManifestTable(os.path.join(exdir, "results")).read(spark)
                .select(F.xxhash64("url").alias("doc_id"),
                        F.lit("en").alias("lang"),
                        F.col("markdown").alias("text")))
        docsdir = str(tmp_path / "docs.parquet")
        docs.write.mode("overwrite").parquet(docsdir)

        from jobs.curate import run_curation_job
        cstats = run_curation_job(spark, docsdir, str(tmp_path / "curated"),
                                  langs=("en",))
        assert cstats["input_docs"] == stats["docs"]
        assert 0 < cstats["curated_docs"] <= cstats["input_docs"]


class TestPackedTrainSplit:
    def test_shard_assignment_matches_reference_cumsum(self, spark,
                                                       tmp_path):
        """--pack-budget writes shard_id on the train split; the
        assignment must equal the reference doc_id-ordered cumulative-sum
        rule exactly (floor(tokens_before / budget))."""
        from document_converter_api_spark.sources.tableio import (
            ManifestTable,
        )
        root = str(tmp_path / "out")
        budget = 500
        run_curation_job(spark, f"{SF}/documents.parquet", root,
                         langs=("en", "es", "de"), pack_budget=budget)
        rows = sorted(
            ManifestTable(os.path.join(root, "curated", "train"))
            .read(spark).collect(), key=lambda r: r.doc_id)
        assert rows and "shard_id" in rows[0].asDict()
        acc = 0
        for r in rows:
            assert r.shard_id == acc // budget, (r.doc_id, r.shard_id, acc)
            acc += r.n_words
        # shard ids are dense and non-decreasing in doc order
        assert rows[0].shard_id == 0
