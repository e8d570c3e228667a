"""Driver contract for the spark-graft builder (PySpark target).

``entry``   — flagship extraction query at sf0.001 (UDF stage + relational
              tail, SURVEY.md §7.5).
``queries`` — one entry per implemented operator from SURVEY.md §2 plus the
              training-data operators (dedup / similarity / text analysis).
``oracle_sql`` — DuckDB-runnable ANSI-SQL twins; aliases match exactly.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def entry(spark: SparkSession) -> DataFrame:
    """Flagship (SURVEY.md §7.5): synthesize page payloads from sf0.001
    documents, run the full gated mapInArrow extraction pipeline, and report
    per-language doc counts + extracted bytes."""
    from document_converter_api_spark.operators.extract import extract_pipeline

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    pages = docs.select(
        F.concat(F.lit("https://docs.example/"), F.col("source"), F.lit("/"),
                 F.col("doc_id").cast("string"), F.lit(".html")).alias("url"),
        F.encode(
            F.concat(F.lit("<html><body><main><h1>Doc </h1><p>"),
                     F.col("text"),
                     F.lit("</p></main></body></html>")),
            "utf-8").alias("html"),
        F.col("lang"),
    )
    results, _rejects = extract_pipeline(pages, num_partitions=8,
                                         shuffle_partitions=8)
    return (results.filter(F.col("error").isNull())
            .groupBy("lang")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("bytes_out").alias("md_bytes"))
            .orderBy("lang"))


# The round driver's correctness gate covers only the FIRST 50 entries of
# queries(). Round-5 rotation (VERDICT r4 item 6): every query now has a
# green driver row, so the window is (a) everything round 5 CHANGED —
# the CDX tier (surt pct-normalization changed its RESULTS: +8 planted
# captures), lang_audit (one-scan rewrite), the robots/sitemap-directive
# tier (RFC 9309 case-insensitive regexes in both engines), token_pack
# (same file as the new ordered_prefix_sum) — then (b) the two queries
# whose only green row is r1 (sessionize, bucketed_join), then (c) the
# oldest-evidence backfill: the last-green-r2 cohort in registry order.
# 12 of that cohort don't fit slot 50 and are deliberately left out —
# the long-stable TPC-H-style relational extensions (orders_join,
# region_revenue, part_type_share, shipping_priority, big_orders,
# top_revenue_orders, tpch_q1, rollup_stats, distinct_users,
# except_users, value_percentiles, preview): unchanged since r1/r2,
# core-Spark-only surfaces, still locally oracle-checked every round by
# tools/check_oracle.py. Everything last-green r3/r4 keeps evidence at
# most two rounds old without a slot.
_GATE_WINDOW_FIRST = [
    "cdx_index", "cdx_shards", "cdx_revisits",
    "cdx_lookup", "lang_audit", "robots_rules",
    "robots_compliance", "robots_precedence", "delay_compliance",
    "sitemap_directives", "token_pack", "sessionize",
    "bucketed_join", "status_counts", "stats_conditional",
    "jobs_listing", "retention_filter", "point_lookup",
    "resume_antijoin", "window_rank", "plain_text_format",
    "gdocs_format", "chunk_text", "sanitize_names",
    "url_extension", "iso_timestamps", "json_props",
    "element_at_chunk", "download_names", "result_json",
    "dedup_exact", "dedup_ngram_jaccard", "dedup_minhash_lsh",
    "dedup_simhash", "dedup_embedding_cosine", "line_dedup",
    "span_dedup", "incremental_dedup", "ann_cosine_topk",
    "ann_lsh_bucketed", "ann_ivf", "ann_pq",
    "lang_id", "quality_score", "token_count",
    "fingerprint", "gopher_rules", "url_normalize",
    "corpus_curation", "pii_redact",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from document_converter_api_spark.plans import queries as Q
    from document_converter_api_spark.operators import curation as C
    from document_converter_api_spark.operators import dedup as D
    from document_converter_api_spark.operators import multimodal as M
    from document_converter_api_spark.operators import skew as K
    from document_converter_api_spark.operators import sampling as SA
    from document_converter_api_spark.operators import similarity as S
    from document_converter_api_spark.operators import text_analysis as T

    reg = {
        # aggregations (A1/A2)
        "status_counts": Q.q_status_counts,
        "stats_conditional": Q.q_stats_conditional,
        # filter/project/sort/limit (P1/P2/O1/O2)
        "jobs_listing": Q.q_jobs_listing,
        "retention_filter": Q.q_retention_filter,
        # joins (J1/J3 + TPC-H-style)
        "point_lookup": Q.q_point_lookup,
        "resume_antijoin": Q.q_resume_antijoin,
        "orders_join": Q.q_orders_join,
        "tpch_q1": Q.q_tpch_q1,
        # window (§2.5)
        "window_rank": Q.q_window_rank,
        # scalar expression layer (F1-F14, O3/O4)
        "plain_text_format": Q.q_plain_text_format,
        "gdocs_format": Q.q_gdocs_format,
        "chunk_text": Q.q_chunk_text,
        "sanitize_names": Q.q_sanitize_names,
        "url_extension": Q.q_url_extension,
        "preview": Q.q_preview,
        "iso_timestamps": Q.q_iso_timestamps,
        "json_props": Q.q_json_props,
        "element_at_chunk": Q.q_element_at_chunk,
        "download_names": Q.q_download_names,
        "result_json": Q.q_result_json,
        # S8 webhook payload assembly (sources/webhook.py), byte-exact
        "webhook_payloads": Q.q_webhook_payloads,
        # rollup / distinct / set-op / top-k (§2.4, §2.6, §2.7)
        "rollup_stats": Q.q_rollup_stats,
        "distinct_users": Q.q_distinct_users,
        "except_users": Q.q_except_users,
        "top_revenue_orders": Q.q_top_revenue_orders,
        "region_revenue": Q.q_region_revenue,
        "part_type_share": Q.q_part_type_share,
        "shipping_priority": Q.q_shipping_priority,
        "big_orders": Q.q_big_orders,
        "value_percentiles": Q.q_value_percentiles,
        # deduplication suite
        "dedup_exact": D.q_dedup_exact,
        "dedup_ngram_jaccard": D.q_dedup_ngram_jaccard,
        "dedup_minhash_lsh": D.q_dedup_minhash_lsh,
        "dedup_simhash": D.q_dedup_simhash,
        "dedup_embedding_cosine": D.q_dedup_embedding_cosine,
        # SemDeDup-style semantic dedup: coarse-quantizer clusters, then
        # intra-cluster cosine prune keeping the lowest vec_id
        "semantic_dedup": D.q_semantic_dedup,
        # duplicate-cluster resolution: connected components (iterative
        # min-label propagation) over the LSH pairs; DuckDB twin is a
        # recursive CTE — the one genuinely iterative algorithm in the repo
        "dedup_clusters": D.q_dedup_clusters,
        # C4-style line-level dedup: distinct lines survive only in their
        # lowest-doc_id document; docs rebuilt in order (md5-compared)
        "line_dedup": D.q_line_dedup,
        # ExactSubstr-style duplicated-span marking: substring-granularity
        # dedup (window-count mark on one digest shuffle, gaps-and-islands
        # span merge — no pair expansion anywhere)
        "span_dedup": D.q_span_dedup,
        # incremental cross-crawl dedup: Bloom filter over historical
        # fingerprints broadcast to the new crawl; only Bloom-positive
        # candidates enter the exact semi-join (no-false-negative pinned)
        "incremental_dedup": D.q_incremental_dedup,
        # incremental cross-crawl NEAR-dup: new crawl MinHash-banded
        # against the historical index; best match via deterministic
        # max(struct(agree, -old_id)) — history is never re-shuffled
        "incremental_minhash": D.q_incremental_minhash,
        # soft dedup: weight 1/|cluster| instead of deletion (SlimPajama/
        # Dolma reweighting) — CC labels + one size agg + two id joins
        "dedup_weights": D.q_dedup_weights,
        # similarity search
        "ann_cosine_topk": S.q_ann_cosine_topk,
        "ann_lsh_bucketed": S.q_ann_lsh_bucketed,
        "ann_ivf": S.q_ann_ivf,
        # product quantization: 2-byte codes + ADC lookup-table distances
        "ann_pq": S.q_ann_pq,
        # text analysis
        "lang_id": T.q_lang_id,
        "quality_score": T.q_quality_score,
        "token_count": T.q_token_count,
        "fingerprint": T.q_fingerprint,
        "gopher_rules": T.q_gopher_rules,
        "url_normalize": T.q_url_normalize,
        # the full curation recipe as ONE plan: exact dedup -> Gopher gate
        # -> lang-ID -> per-language mix report
        "corpus_curation": T.q_corpus_curation,
        # curation tier (operators/curation.py): PII redaction (pure
        # Catalyst regexp chain), GPT-3-style 13-gram benchmark
        # decontamination (broadcast bench set), token-budget shard
        # packing (two-phase scalable prefix sum — no SinglePartition
        # window), NFC normalization (Arrow batch; DuckDB nfc_normalize
        # twin), CCNet-style unigram-LM quality scoring
        "pii_redact": C.q_pii_redact,
        "decontaminate": C.q_decontaminate,
        "token_pack": C.q_token_pack,
        "unicode_normalize": C.q_unicode_normalize,
        "unigram_logprob": C.q_unigram_logprob,
        # interpolated bigram LM (CCNet-style perplexity, order 2)
        "bigram_logprob": C.q_bigram_logprob,
        # RefinedWeb-style within-document repeated-line strip
        "doc_line_dedup": C.q_doc_line_dedup,
        # CCNet head/middle/tail split on the bigram LM score
        "perplexity_buckets": C.q_perplexity_buckets,
        # crawl-over-crawl change classification: ONE full-outer shuffle
        # join on doc_id carrying md5 digests, never the text payload
        "snapshot_diff": C.q_snapshot_diff,
        # mojibake (double-encoded UTF-8) detect + repair: literal
        # alternation regexp_count + fixed replace chain, all codegen,
        # zero shuffle
        "mojibake_repair": C.q_mojibake_repair,
        # Gopher line-grain repetition: duplicate-line + duplicate-char
        # fractions; integer counts, two final divisions — exact parity
        "doc_repetition": T.q_doc_repetition,
        # Gopher word-gram repetition gate: top-{2,3,4}-gram and
        # dup-{5..10}-gram character fractions + paper-threshold pass
        # flag; one explode, (doc_id,n,gram)-keyed count — no hot keys
        "ngram_repetition": T.q_ngram_repetition,
        # BPE-training inner loop: adjacent-pair corpus counts + doc
        # frequency, vocabulary-sized shuffle, top-k
        "bpe_pair_stats": T.q_bpe_pair_stats,
        # token-distribution Shannon entropy (+normalized): the language-
        # agnostic keyword-stuffing / gibberish signal
        "token_entropy": T.q_token_entropy,
        # RAG-prep sliding-window chunking with overlap (stride < width);
        # chunk build is O(words) per doc, all JVM-side
        "chunk_overlap": C.q_chunk_overlap,
        # corpus selection (operators/sampling.py): deterministic
        # hash-thresholded stratified sampling (reproducible under task
        # retry/resume — no rand()), registered-domain deny-list as a
        # broadcast LEFT ANTI join, per-source distinctive terms with
        # integer tf*(n_sources-df) weights (exact cross-engine ranking)
        "mix_sample": SA.q_mix_sample,
        # DSIR (Xie et al. 2023): hashed-unigram importance weights toward
        # a target domain, quantized to an integer 2^-20 grid (exact
        # cross-engine dot product), Gumbel-top-K selection via
        # TakeOrderedAndProject — no global window
        "dsir_select": SA.q_dsir_select,
        "blocklist_filter": SA.q_blocklist_filter,
        "source_terms": SA.q_source_terms,
        # deterministic train/val/test split: salted-hash draw as a
        # scan-stage projection; per-split sizes via 3-row broadcast (not
        # a 3-partition window)
        "split_assign": SA.q_split_assign,
        # quality-weighted importance sampling: keep probability a pure
        # function of (doc_id, n_chars), 52-bit exact draw — bit-identical
        # keep decisions cross-engine
        "weighted_sample": SA.q_weighted_sample,
        # context-length bucketing: padded-waste report per training bin;
        # <=5 partial rows per map task through the shuffle
        "length_buckets": C.q_length_buckets,
        # relevance scoring (operators/search.py): BM25 with literal probe
        # terms (tf = codegen'd array-filter count — corpus never exploded
        # or shuffled on a term key) and a hashed-feature linear quality
        # classifier (zero-shuffle per-row HOF fold; exact cross-engine
        # sums via 20-bit weights)
        "bm25_search": _q_bm25_search,
        "quality_classifier": _q_quality_classifier,
        # classifier TRAINING: 3 unrolled full-batch LR gradient rounds,
        # integer-grid gradients (order-independent sums), exact 1/N step
        "logreg_train": _q_logreg_train,
        # graph analytics (operators/graph.py): domain-level PageRank —
        # 5 iterative rounds of join+groupBy(dst) with localCheckpoint
        # lineage truncation; oracle unrolls the same rounds as a CTE chain
        "domain_pagerank": _q_domain_pagerank,
        # multimodal binary columns — all three oracle-checked against
        # ground truth the fixture generator plants in meta (dimensions for
        # decode, frame digests for sampling, PCM stats for audio)
        "multimodal_decode": M.q_multimodal_decode,
        "multimodal_frame_sample": M.q_multimodal_frame_sample,
        "multimodal_audio_features": M.q_multimodal_audio_features,
        # temporal joins (operators/temporal.py): as-of join via the
        # union+carry-forward window (one Exchange, no row expansion) and
        # fixed-width interval join via bucket-explode equi-join; DuckDB
        # twins use DIFFERENT algorithms (native ASOF JOIN / inequality
        # join) so agreement cross-validates the plan, not just the code
        "asof_join": _q_asof_join,
        "range_join": _q_range_join,
        # variable-width interval join: sequence bucket explode keeps the
        # plan a plain equi-join even when widths vary row to row
        "range_join_variable": _q_range_join_variable,
        # crawl-politeness audit: per-host lag-window fetch gaps in integer
        # microseconds (exact parity), window + re-agg share one shuffle
        "politeness_audit": _q_politeness_audit,
        # mergeable cardinality sketches (operators/sketch.py): HLL
        # registers + KMV bottom-k, every hash/register/estimate step the
        # SAME SQL fragment on both engines — an approximate operator
        # checked EXACTLY (identical registers, identical estimate)
        "hll_distinct": _q_hll_distinct,
        "kmv_distinct": _q_kmv_distinct,
        # frequency + membership sketches: count-min (integer sums — exact
        # parity by construction) and a Bloom filter (bit_or word folds;
        # no-false-negative invariant surfaced as a checked column)
        "cms_topk": _q_cms_topk,
        "bloom_filter": _q_bloom_filter,
        # mergeable 64-bin histogram + interpolated p50/p95 — the scale
        # path next to value_percentiles' exact per-group sort, and an
        # approximate percentile that IS cross-engine checkable
        "histogram_quantiles": _q_histogram_quantiles,
        # skew: salted two-phase hot-host aggregation (== naive GROUP BY)
        "host_stats_salted": K.q_host_stats_salted,
        # domain balancing: deterministic per-host document cap (md5 order)
        "host_cap_sample": K.q_host_cap_sample,
        # stateful sessionization — batch twin of the
        # applyInPandasWithState streaming operator (streaming/sessionize.py)
        "sessionize": _q_sessionize,
        # windowed event-time aggregation — batch twin of the watermarked
        # streaming crawl-rate monitor (streaming/windowed.py)
        "crawl_rate": _q_crawl_rate,
        # bucketed co-located join (sources/bucketed.py) — results == plain
        # join; the zero-Exchange plan property is pinned in test_plans.py
        "bucketed_join": _q_bucketed_join,
        # WAT tier (operators/linkgraph.py): outlink extraction from the
        # real fixture HTML (codegen'd regex scan), the aggregated host
        # link graph, anchor-text stats, and PageRank over the EXTRACTED
        # graph — crawl -> WAT -> domain ranking pinned end to end
        # Head-metadata tier (operators/pagemeta.py): WAT-style title/
        # heading metadata, declared-vs-detected language audit, and
        # PageRank x staleness recrawl prioritization
        "page_metadata": _q_page_metadata,
        "lang_audit": _q_lang_audit,
        "frontier_priority": _q_frontier_priority,
        "host_quality": _q_host_quality,
        "crawl_budget": _q_crawl_budget,
        "template_detect": _q_template_detect,
        "link_extract": _q_link_extract,
        # RFC-3986 url normalization + alias clustering (frontier dedup)
        "url_aliases": _q_url_aliases,
        "host_linkgraph": _q_host_linkgraph,
        "anchor_stats": _q_anchor_stats,
        "link_pagerank": _q_link_pagerank,
        "frontier_discovery": _q_frontier_discovery,
        # Head-tags tier (operators/headtags.py): robots noindex/
        # canonical index-eligibility gate, canonical-URL dup clusters,
        # OpenGraph/JSON-LD structured-data extraction
        "index_gate": _q_index_gate,
        "canonical_clusters": _q_canonical_clusters,
        "structured_data": _q_structured_data,
        # Flesch reading-ease over the extracted main text
        "readability": _q_readability,
        # raw-byte BOM/declared-charset audit (includes .htm legacy rows)
        "charset_audit": _q_charset_audit,
        # robots-exclusion tier (operators/robots.py)
        "robots_rules": _q_robots_rules,
        "robots_compliance": _q_robots_compliance,
        # RFC 9309 longest-match Allow/Disallow precedence + Sitemap
        # directive extraction (frontier seeding)
        "robots_precedence": _q_robots_precedence,
        "sitemap_directives": _q_sitemap_directives,
        # declared Crawl-delay vs actual fetch spacing (robots x temporal)
        "delay_compliance": _q_delay_compliance,
        # CDX/SURT URL-index tier (operators/cdx.py): capture index,
        # cluster.idx range shards, digest-based revisit audit
        "cdx_index": _q_cdx_index,
        "cdx_shards": _q_cdx_shards,
        "cdx_revisits": _q_cdx_revisits,
        "cdx_lookup": _q_cdx_lookup,
        # Sitemap tier (operators/sitemap.py): urlset parsing,
        # declared-vs-crawled coverage, lastmod recrawl freshness
        "sitemap_urls": _q_sitemap_urls,
        "sitemap_coverage": _q_sitemap_coverage,
        "sitemap_freshness": _q_sitemap_freshness,
    }
    front = {k: reg[k] for k in _GATE_WINDOW_FIRST}
    front.update((k, v) for k, v in reg.items() if k not in front)
    return front


def _q_sitemap_urls(spark: SparkSession, sf_dir: str) -> DataFrame:
    from document_converter_api_spark.operators.sitemap import q_sitemap_urls
    return q_sitemap_urls(spark, sf_dir)


def _q_sitemap_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from document_converter_api_spark.operators.sitemap import (
        q_sitemap_coverage,
    )
    return q_sitemap_coverage(spark, sf_dir)


def _q_sitemap_freshness(spark: SparkSession, sf_dir: str) -> DataFrame:
    from document_converter_api_spark.operators.sitemap import (
        q_sitemap_freshness,
    )
    return q_sitemap_freshness(spark, sf_dir)


def _q_cdx_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    from document_converter_api_spark.operators.cdx import q_cdx_index
    return q_cdx_index(spark, sf_dir)


def _q_cdx_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    from document_converter_api_spark.operators.cdx import q_cdx_shards
    return q_cdx_shards(spark, sf_dir)


def _q_cdx_revisits(spark: SparkSession, sf_dir: str) -> DataFrame:
    from document_converter_api_spark.operators.cdx import q_cdx_revisits
    return q_cdx_revisits(spark, sf_dir)


def _q_cdx_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from document_converter_api_spark.operators.cdx import q_cdx_lookup
    return q_cdx_lookup(spark, sf_dir)


def _q_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from document_converter_api_spark.operators.sketch import q_hll_distinct
    return q_hll_distinct(spark, sf_dir)


def _q_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from document_converter_api_spark.operators.sketch import q_kmv_distinct
    return q_kmv_distinct(spark, sf_dir)


def _q_cms_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from document_converter_api_spark.operators.sketch import q_cms_topk
    return q_cms_topk(spark, sf_dir)


def _q_bloom_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from document_converter_api_spark.operators.sketch import q_bloom_filter
    return q_bloom_filter(spark, sf_dir)


def _q_histogram_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from document_converter_api_spark.operators.sketch import (
        q_histogram_quantiles,
    )
    return q_histogram_quantiles(spark, sf_dir)


def _q_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    from document_converter_api_spark.operators.search import q_bm25_search
    return q_bm25_search(spark, sf_dir)


def _q_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from document_converter_api_spark.operators.search import (
        q_quality_classifier,
    )
    return q_quality_classifier(spark, sf_dir)


def _q_logreg_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    from document_converter_api_spark.operators.search import q_logreg_train
    return q_logreg_train(spark, sf_dir)


def _q_domain_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from document_converter_api_spark.operators.graph import q_domain_pagerank
    return q_domain_pagerank(spark, sf_dir)


def _q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from document_converter_api_spark.operators.temporal import q_asof_join
    return q_asof_join(spark, sf_dir)


def _q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from document_converter_api_spark.operators.temporal import q_range_join
    return q_range_join(spark, sf_dir)


def _q_range_join_variable(spark: SparkSession, sf_dir: str) -> DataFrame:
    from document_converter_api_spark.operators.temporal import (
        q_range_join_variable,
    )
    return q_range_join_variable(spark, sf_dir)


def _q_politeness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from document_converter_api_spark.operators.temporal import (
        q_politeness_audit,
    )
    return q_politeness_audit(spark, sf_dir)


def _q_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from document_converter_api_spark.sources.bucketed import q_bucketed_doc_join
    return q_bucketed_doc_join(spark, sf_dir)


def _q_link_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    from document_converter_api_spark.operators.linkgraph import q_link_extract
    return q_link_extract(spark, sf_dir)


def _q_url_aliases(spark: SparkSession, sf_dir: str) -> DataFrame:
    from document_converter_api_spark.operators.linkgraph import q_url_aliases
    return q_url_aliases(spark, sf_dir)


def _q_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    from document_converter_api_spark.operators.pagemeta import q_readability
    return q_readability(spark, sf_dir)


def _q_index_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from document_converter_api_spark.operators.headtags import q_index_gate
    return q_index_gate(spark, sf_dir)


def _q_charset_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from document_converter_api_spark.operators.headtags import q_charset_audit
    return q_charset_audit(spark, sf_dir)


def _q_robots_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    from document_converter_api_spark.operators.robots import q_robots_rules
    return q_robots_rules(spark, sf_dir)


def _q_delay_compliance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from document_converter_api_spark.operators.robots import (
        q_delay_compliance,
    )
    return q_delay_compliance(spark, sf_dir)


def _q_robots_compliance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from document_converter_api_spark.operators.robots import (
        q_robots_compliance,
    )
    return q_robots_compliance(spark, sf_dir)


def _q_robots_precedence(spark: SparkSession, sf_dir: str) -> DataFrame:
    from document_converter_api_spark.operators.robots import (
        q_robots_precedence,
    )
    return q_robots_precedence(spark, sf_dir)


def _q_sitemap_directives(spark: SparkSession, sf_dir: str) -> DataFrame:
    from document_converter_api_spark.operators.robots import (
        q_sitemap_directives,
    )
    return q_sitemap_directives(spark, sf_dir)


def _q_canonical_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from document_converter_api_spark.operators.headtags import (
        q_canonical_clusters,
    )
    return q_canonical_clusters(spark, sf_dir)


def _q_structured_data(spark: SparkSession, sf_dir: str) -> DataFrame:
    from document_converter_api_spark.operators.headtags import (
        q_structured_data,
    )
    return q_structured_data(spark, sf_dir)


def _q_page_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    from document_converter_api_spark.operators.pagemeta import q_page_metadata
    return q_page_metadata(spark, sf_dir)


def _q_lang_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from document_converter_api_spark.operators.pagemeta import q_lang_audit
    return q_lang_audit(spark, sf_dir)


def _q_frontier_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    from document_converter_api_spark.operators.pagemeta import (
        q_frontier_priority,
    )
    return q_frontier_priority(spark, sf_dir)


def _q_host_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from document_converter_api_spark.operators.pagemeta import q_host_quality
    return q_host_quality(spark, sf_dir)


def _q_crawl_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    from document_converter_api_spark.operators.pagemeta import q_crawl_budget
    return q_crawl_budget(spark, sf_dir)


def _q_template_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    from document_converter_api_spark.operators.pagemeta import (
        q_template_detect,
    )
    return q_template_detect(spark, sf_dir)


def _q_host_linkgraph(spark: SparkSession, sf_dir: str) -> DataFrame:
    from document_converter_api_spark.operators.linkgraph import (
        q_host_linkgraph,
    )
    return q_host_linkgraph(spark, sf_dir)


def _q_anchor_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from document_converter_api_spark.operators.linkgraph import q_anchor_stats
    return q_anchor_stats(spark, sf_dir)


def _q_link_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from document_converter_api_spark.operators.linkgraph import (
        q_link_pagerank,
    )
    return q_link_pagerank(spark, sf_dir)


def _q_frontier_discovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    from document_converter_api_spark.operators.linkgraph import (
        q_frontier_discovery,
    )
    return q_frontier_discovery(spark, sf_dir)


def _q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from document_converter_api_spark.streaming.sessionize import q_sessionize
    return q_sessionize(spark, sf_dir)


def _q_crawl_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from document_converter_api_spark.streaming.windowed import q_crawl_rate
    return q_crawl_rate(spark, sf_dir)


def oracle_sql() -> dict[str, str]:
    from document_converter_api_spark.operators.dedup import DEDUP_ORACLES
    from document_converter_api_spark.operators.similarity import SIMILARITY_ORACLES
    from document_converter_api_spark.operators.text_analysis import TEXT_ORACLES

    sql = {
        "status_counts": """
            SELECT event_type, count(*) AS n
            FROM events GROUP BY event_type ORDER BY event_type
        """,
        "stats_conditional": """
            SELECT count(*) AS total,
                   CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
                   CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
                   round(sum(value), 2) AS sum_value,
                   round(avg(value), 4) AS avg_value
            FROM events
        """,
        "jobs_listing": """
            SELECT event_id, user_id, ts, round(value, 2) AS value
            FROM events WHERE event_type = 'purchase'
            ORDER BY ts DESC, event_id ASC LIMIT 50
        """,
        "retention_filter": """
            WITH mx AS (SELECT max(ts) AS m FROM events)
            SELECT count(*) AS n_expired,
                   count(DISTINCT user_id) AS n_users
            FROM events, mx WHERE ts < m - INTERVAL 24 HOURS
        """,
        "point_lookup": """
            SELECT doc_id, lang, source, n_chars FROM documents
            WHERE doc_id % 10 = 0 AND doc_id < 500
            ORDER BY doc_id
        """,
        "resume_antijoin": """
            SELECT count(*) AS n_pending,
                   CAST(sum(n_chars) AS BIGINT) AS chars_pending
            FROM documents WHERE doc_id % 3 <> 0
        """,
        "orders_join": """
            SELECT n.n_name AS nation,
                   round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
                   count(*) AS n_items
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            WHERE o.o_orderstatus = 'O'
            GROUP BY n.n_name ORDER BY nation
        """,
        "tpch_q1": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty,
                   round(sum(l_extendedprice), 2) AS sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                   round(avg(l_quantity), 4) AS avg_qty,
                   round(avg(l_discount), 4) AS avg_disc,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02'
            GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus
        """,
        "window_rank": """
            SELECT user_id, event_id, rn FROM (
                SELECT user_id, event_id,
                       row_number() OVER (PARTITION BY user_id
                                          ORDER BY ts DESC, event_id ASC) AS rn
                FROM events) t
            WHERE rn <= 3 AND user_id < 100
            ORDER BY user_id, rn, event_id
        """,
        "plain_text_format": r"""
            WITH f AS (
              SELECT doc_id,
                regexp_replace(
                  regexp_replace(
                    regexp_replace(
                      regexp_replace(
                        regexp_replace(text, '#{1,6}\s+', '', 'g'),
                      '\*\*(.*?)\*\*', '\1', 'g'),
                    '\*(.*?)\*', '\1', 'g'),
                  '\[([^\]]+)\]\([^\)]+\)', '\1', 'g'),
                '`([^`]+)`', '\1', 'g') AS plain
              FROM documents)
            SELECT doc_id, substring(plain, 1, 200) AS plain_prefix,
                   length(plain) AS plain_len
            FROM f ORDER BY doc_id
        """,
        "gdocs_format": """
            WITH f AS (
              SELECT doc_id,
                replace(replace(replace(replace(replace(
                  text, '# ', ''), '## ', ''), '### ', ''), '**', ''), '*', '')
                AS gd
              FROM documents)
            SELECT doc_id, substring(gd, 1, 200) AS gdocs_prefix,
                   length(gd) AS gdocs_len
            FROM f ORDER BY doc_id
        """,
        "chunk_text": """
            WITH c AS (
              SELECT doc_id, text, str_split(text, chr(10)) AS lines,
                     CAST(ceil(len(str_split(text, chr(10))) / 3.0) AS INT) AS nc
              FROM documents)
            SELECT doc_id,
                   CASE WHEN length(text) > 200 THEN nc ELSE 1 END AS total_chunks,
                   CASE WHEN length(text) > 200
                        THEN length(array_to_string(lines[1:3], chr(10)))
                        ELSE length(text) END AS first_chunk_len,
                   CASE WHEN length(text) > 200
                        THEN length(array_to_string(lines[(nc-1)*3+1:nc*3], chr(10)))
                        ELSE length(text) END AS last_chunk_len
            FROM c ORDER BY doc_id
        """,
        "sanitize_names": r"""
            SELECT doc_id,
              regexp_replace(
                regexp_replace(
                  regexp_replace(
                    source || ' doc (' || doc_id || ')',
                  '[^\w\s-]', '', 'g'),
                '[-\s]+', '-', 'g'),
              '^-+|-+$', '', 'g') AS safe_name
            FROM documents ORDER BY doc_id LIMIT 100
        """,
        "url_extension": r"""
            SELECT doc_id,
              lower(regexp_extract(
                'https://x.example/' || source || '/f' || doc_id ||
                  (CASE WHEN doc_id % 2 = 0 THEN '.pdf' ELSE '.docx' END),
                '(\.[^./?#]+)([?#].*)?$', 1)) AS ext,
              greatest(1, CAST(floor(n_chars * 1024 / 1048576.0) AS BIGINT)) AS est_minutes,
              round(n_chars * 1024 / 1048576.0, 2) AS mb
            FROM documents ORDER BY doc_id LIMIT 200
        """,
        "preview": """
            SELECT doc_id,
                   CASE WHEN length(text) > 100
                        THEN substring(text, 1, 100) || '...'
                        ELSE text END AS preview
            FROM documents ORDER BY doc_id LIMIT 200
        """,
        "iso_timestamps": """
            WITH w AS (
              SELECT event_id, ts,
                     lead(ts) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS next_ts
              FROM events)
            SELECT event_id,
                   strftime(ts, '%Y-%m-%dT%H:%M:%S.%f') AS ts_iso,
                   round(date_diff('microsecond', ts, next_ts) / 1e6, 3) AS gap_seconds
            FROM w WHERE next_ts IS NOT NULL
            ORDER BY event_id LIMIT 500
        """,
        "json_props": """
            SELECT json_extract_string(props, '$.k') AS k_bucket,
                   count(*) AS n
            FROM events
            WHERE json_extract_string(props, '$.k') IS NOT NULL
            GROUP BY k_bucket ORDER BY k_bucket
        """,
        "element_at_chunk": """
            WITH c AS (
              SELECT doc_id, str_split(text, chr(10)) AS lines,
                     CAST(ceil(len(str_split(text, chr(10))) / 2.0) AS INT) AS nc
              FROM documents)
            SELECT doc_id,
                   CASE WHEN nc >= 2
                        THEN length(array_to_string(lines[3:4], chr(10)))
                        ELSE NULL END AS second_chunk_len,
                   (99 > nc) AS oob_is_null
            FROM c ORDER BY doc_id LIMIT 200
        """,
        "download_names": r"""
            SELECT doc_id,
                   regexp_extract('uploads/' || source || '/report_' || doc_id || '.docx',
                                  '([^/]+?)(\.[^./]*)?$', 1) AS stem,
                   regexp_extract('uploads/' || source || '/report_' || doc_id || '.docx',
                                  '([^/]+?)(\.[^./]*)?$', 1)
                     || '_converted'
                     || (CASE WHEN doc_id % 2 = 0 THEN '.md' ELSE '.txt' END)
                     AS download_name
            FROM documents ORDER BY doc_id LIMIT 200
        """,
        "result_json": """
            SELECT doc_id,
                   '{"id":' || doc_id
                     || ',"lang":"' || lang
                     || '","content_length":' || length(text)
                     || ',"source":"' || source || '"}' AS result_json
            FROM documents ORDER BY doc_id LIMIT 200
        """,
        "rollup_stats": """
            SELECT source, lang, count(*) AS n_docs,
                   CAST(sum(n_chars) AS BIGINT) AS sum_chars
            FROM documents
            GROUP BY ROLLUP (source, lang)
            ORDER BY source ASC NULLS FIRST, lang ASC NULLS FIRST
        """,
        "distinct_users": """
            SELECT event_type,
                   count(DISTINCT user_id) AS n_users,
                   count(*) AS n_events
            FROM events GROUP BY event_type ORDER BY event_type
        """,
        "except_users": """
            WITH v AS (SELECT user_id FROM events WHERE event_type = 'view'
                       EXCEPT
                       SELECT user_id FROM events WHERE event_type = 'purchase')
            SELECT count(*) AS n_view_only,
                   CAST(sum(user_id) AS BIGINT) AS sum_ids FROM v
        """,
        "top_revenue_orders": """
            SELECT l_orderkey,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
                   count(*) AS n_items
            FROM lineitem GROUP BY l_orderkey
            ORDER BY revenue DESC, l_orderkey ASC LIMIT 10
        """,
        "region_revenue": """
            SELECT r.r_name AS region,
                   round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
                   count(*) AS n_items
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN supplier s ON l.l_suppkey = s.s_suppkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            JOIN region r ON n.n_regionkey = r.r_regionkey
            WHERE c.c_nationkey = s.s_nationkey AND o.o_orderstatus = 'O'
            GROUP BY region ORDER BY region
        """,
        "part_type_share": """
            SELECT p.p_brand AS brand,
                   round(sum(CASE WHEN p.p_type = 'ECONOMY'
                             THEN l.l_extendedprice * (1 - l.l_discount)
                             ELSE 0.0 END), 2) AS economy_rev,
                   round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS total_rev,
                   count(*) AS n_items,
                   round(round(sum(CASE WHEN p.p_type = 'ECONOMY'
                               THEN l.l_extendedprice * (1 - l.l_discount)
                               ELSE 0.0 END), 2)
                         / round(sum(l.l_extendedprice * (1 - l.l_discount)), 2),
                         4) AS economy_share
            FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
            GROUP BY brand ORDER BY brand
        """,
        "shipping_priority": """
            SELECT l.l_orderkey, o.o_orderdate, o.o_orderpriority,
                   round(sum(l.l_extendedprice * (1 - l.l_discount)), 2)
                       AS revenue
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            WHERE c.c_mktsegment = 'BUILDING'
              AND CAST(o.o_orderdate AS DATE) < DATE '1998-01-01'
              AND CAST(l.l_shipdate AS DATE) > DATE '1998-01-01'
            GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
            ORDER BY revenue DESC, o.o_orderdate, l.l_orderkey
            LIMIT 10
        """,
        "big_orders": """
            SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
                   o.o_totalprice, q.sum_qty
            FROM orders o
            JOIN (SELECT l_orderkey, round(sum(l_quantity), 1) AS sum_qty
                  FROM lineitem GROUP BY l_orderkey
                  HAVING round(sum(l_quantity), 1) > 300) q
              ON o.o_orderkey = q.l_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            ORDER BY o.o_totalprice DESC, o.o_orderkey
            LIMIT 10
        """,
        "value_percentiles": """
            SELECT event_type,
                   round(quantile_cont(value, 0.5), 4) AS p50,
                   round(quantile_cont(value, 0.95), 4) AS p95,
                   round(quantile_cont(value, 0.99), 4) AS p99,
                   count(*) AS n
            FROM events GROUP BY event_type ORDER BY event_type
        """,
    }
    from document_converter_api_spark.operators.curation import CURATION_ORACLES
    from document_converter_api_spark.operators.sampling import SAMPLING_ORACLES
    sql.update(CURATION_ORACLES)
    sql.update(SAMPLING_ORACLES)
    sql.update(DEDUP_ORACLES)
    sql.update(SIMILARITY_ORACLES)
    sql.update(TEXT_ORACLES)

    import os
    from document_converter_api_spark.operators.dedup import _embedding_cosine_oracle
    from document_converter_api_spark.operators.multimodal import oracle_sql_for_media
    sql["dedup_embedding_cosine"] = _embedding_cosine_oracle()
    from document_converter_api_spark.operators.dedup import _semantic_dedup_oracle
    sql["semantic_dedup"] = _semantic_dedup_oracle()
    from document_converter_api_spark.plans.queries import (
        WEBHOOK_PAYLOADS_ORACLE,
    )
    sql["webhook_payloads"] = WEBHOOK_PAYLOADS_ORACLE
    from document_converter_api_spark.operators.similarity import (
        ann_pq_oracle_sql,
    )
    sql["ann_pq"] = ann_pq_oracle_sql()
    repo_root = os.path.dirname(os.path.abspath(__file__))
    sql.update(oracle_sql_for_media(repo_root))
    from document_converter_api_spark.operators.linkgraph import (
        oracle_sql_for_links,
    )
    # n_nodes=15 is the smoke host-graph node count; pinned by
    # tests/test_linkgraph.py so the Spark-side runtime count and this
    # oracle constant cannot drift apart.
    sql.update(oracle_sql_for_links(repo_root, n_nodes=15))
    from document_converter_api_spark.operators.pagemeta import (
        oracle_sql_for_pagemeta,
    )
    sql.update(oracle_sql_for_pagemeta(repo_root, n_nodes=15))
    from document_converter_api_spark.operators.headtags import (
        oracle_sql_for_headtags,
    )
    sql.update(oracle_sql_for_headtags(repo_root))
    from document_converter_api_spark.operators.robots import (
        oracle_sql_for_robots,
    )
    sql.update(oracle_sql_for_robots(repo_root))
    from document_converter_api_spark.operators.skew import (
        host_cap_oracle, host_stats_oracle,
    )
    sql["host_stats_salted"] = host_stats_oracle(repo_root)
    sql["host_cap_sample"] = host_cap_oracle(repo_root)
    from document_converter_api_spark.streaming.sessionize import (
        SESSIONIZE_ORACLE_SQL,
    )
    sql["sessionize"] = SESSIONIZE_ORACLE_SQL
    from document_converter_api_spark.streaming.windowed import (
        crawl_rate_oracle,
    )
    sql["crawl_rate"] = crawl_rate_oracle(repo_root)
    from document_converter_api_spark.sources.bucketed import (
        BUCKETED_JOIN_ORACLE_SQL,
    )
    sql["bucketed_join"] = BUCKETED_JOIN_ORACLE_SQL
    from document_converter_api_spark.operators.temporal import TEMPORAL_ORACLES
    sql.update(TEMPORAL_ORACLES)
    from document_converter_api_spark.operators.sketch import SKETCH_ORACLES
    sql.update(SKETCH_ORACLES)
    from document_converter_api_spark.operators.search import SEARCH_ORACLES
    sql.update(SEARCH_ORACLES)
    from document_converter_api_spark.operators.graph import GRAPH_ORACLES
    sql.update(GRAPH_ORACLES)
    from document_converter_api_spark.operators.cdx import oracle_sql_for_cdx
    sql.update(oracle_sql_for_cdx(repo_root))
    from document_converter_api_spark.operators.sitemap import (
        oracle_sql_for_sitemap,
    )
    sql.update(oracle_sql_for_sitemap(repo_root))
    return sql
