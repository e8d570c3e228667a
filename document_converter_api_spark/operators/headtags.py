"""Head-tags tier: index-eligibility gating, canonical-URL clustering,
and structured-data (OpenGraph / JSON-LD) extraction.

Reference parity note: the reference service (``/root/reference/app/
main.py``) converts single uploaded documents and has no concept of a
page's crawl-control metadata. A crawl-scale webtext pipeline consults
it constantly: ``<meta name="robots">`` decides whether a fetched page
may enter the corpus at all (CC respects noindex downstream), ``<link
rel="canonical">`` is the cheapest dedup signal on the web — the site
itself declares which URL is the real one, collapsing parameter/mirror
variants BEFORE any content hashing — and OpenGraph / JSON-LD blocks
carry publisher-declared titles and types that feed document metadata
and quality audits. All three stages are single codegen'd regexp
projections over the decoded payload; the only wide ops are one
map-side-combined ``groupBy(host)`` (gate report) and one
``groupBy(canonical)`` (clusters).

* ``q_index_gate`` — per-host index-eligibility report: robots
  noindex/nofollow counts, cross-canonicalized counts, and the
  indexable rate. A page is indexable iff it does not declare
  ``noindex`` AND is not canonicalized away to a different URL — the
  standard search-engine eligibility rule.
* ``q_canonical_clusters`` — group pages by their declared canonical
  target; clusters of ≥2 are URL-level duplicate sets the crawler can
  collapse to one representative (min url — deterministic) without
  reading a byte of body content.
* ``q_structured_data`` — OpenGraph title/type/description plus
  JSON-LD ``@type``/``wordCount`` per page, with a publisher-consistency
  flag (``og:title`` == ``<title>``).

Scale notes (10^12 pages):

* every extraction is a scan-stage projection — predicate pushdown and
  column pruning reach the parquet scan; no Python anywhere.
* the gate's ``groupBy(host)`` partial-aggregates map-side: the shuffle
  carries one row per (task, host), ~10^8 hosts from 10^12 pages.
* canonical clustering shuffles one SMALL row (canonical, url) per
  canonicalized page — no body bytes ever move; a mega-cluster
  (every page of a mirror farm pointing at one target) is a hot key the
  same way a hot host is: AQE skew-split handles the reducer, and the
  ``min(url)`` representative is an order-free aggregate so partial
  combine still applies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .linkgraph import HOST_RE, _pages_df, all_pages_df, pages_path

# one capture group each; identical strings are interpolated into the
# DuckDB oracles below so both engines run the same pattern
CANON_RE = '<link rel="canonical" href="([^"]+)">'
ROBOTS_RE = '<meta name="robots" content="([^"]+)">'
OG_TITLE_RE = '<meta property="og:title" content="([^"]+)">'
OG_TYPE_RE = '<meta property="og:type" content="([^"]+)">'
JSONLD_TYPE_RE = '"@type": "([^"]+)"'
JSONLD_WC_RE = '"wordCount": ([0-9]+)'
TITLE_RE = "<title>([^<]*)</title>"


def _page_flags(pages: DataFrame) -> DataFrame:
    """(url, host, robots, canonical, noindex, nofollow, self_canon,
    cross_canon, indexable) — one codegen'd projection, no shuffle."""
    page = F.decode("html", "UTF-8")
    flagged = pages.select(
        "url",
        F.regexp_extract("url", HOST_RE, 1).alias("host"),
        F.regexp_extract(page, ROBOTS_RE, 1).alias("robots"),
        F.regexp_extract(page, CANON_RE, 1).alias("canonical"),
    )
    noindex = F.col("robots").contains("noindex")
    nofollow = F.col("robots").contains("nofollow")
    self_canon = (F.col("canonical") != "") & (F.col("canonical") == F.col("url"))
    cross_canon = (F.col("canonical") != "") & (F.col("canonical") != F.col("url"))
    return flagged.select(
        "url", "host", "robots", "canonical",
        noindex.alias("noindex"),
        nofollow.alias("nofollow"),
        self_canon.alias("self_canon"),
        cross_canon.alias("cross_canon"),
        (~noindex & ~cross_canon).alias("indexable"),
    )


def q_index_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host index-eligibility report over the crawl."""
    flags = _page_flags(_pages_df(spark))
    b2l = lambda c: F.sum(F.col(c).cast("long"))  # noqa: E731
    agg = (flags.groupBy("host")
           .agg(F.count("*").alias("n_pages"),
                b2l("noindex").alias("n_noindex"),
                b2l("nofollow").alias("n_nofollow"),
                b2l("self_canon").alias("n_self_canon"),
                b2l("cross_canon").alias("n_cross_canon"),
                b2l("indexable").alias("n_indexable")))
    return (agg.select(
        "host", "n_pages", "n_noindex", "n_nofollow",
        "n_self_canon", "n_cross_canon", "n_indexable",
        F.round(F.col("n_indexable") / F.col("n_pages"), 6)
        .alias("indexable_rate"))
        .orderBy("host"))


def q_canonical_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-level duplicate sets from declared canonicals (size ≥ 2).

    The representative is ``min(url)`` — deterministic, order-free, so
    map-side combine applies and re-runs pick the same survivor."""
    flags = _page_flags(_pages_df(spark))
    return (flags.filter(F.col("canonical") != "")
            .groupBy("canonical")
            .agg(F.count("*").cast("long").alias("cluster_size"),
                 F.min("url").alias("representative"),
                 F.countDistinct("host").cast("long").alias("n_hosts"))
            .filter(F.col("cluster_size") >= 2)
            .orderBy(F.desc("cluster_size"), "canonical"))


def q_structured_data(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Publisher-declared metadata per page (OpenGraph + JSON-LD)."""
    page = F.decode("html", "UTF-8")
    raw = _pages_df(spark).select(
        "url",
        F.regexp_extract(page, TITLE_RE, 1).alias("title"),
        F.regexp_extract(page, OG_TITLE_RE, 1).alias("og_title"),
        F.regexp_extract(page, OG_TYPE_RE, 1).alias("og_type"),
        F.regexp_extract(page, JSONLD_TYPE_RE, 1).alias("jsonld_type"),
        F.regexp_extract(page, JSONLD_WC_RE, 1).alias("wc_raw"),
    )
    return (raw
            .filter((F.col("og_title") != "") | (F.col("jsonld_type") != ""))
            .select(
                "url", "title", "og_title", "og_type", "jsonld_type",
                F.expr("CAST(nullif(wc_raw, '') AS BIGINT)")
                .alias("jsonld_wordcount"),
                F.when(F.col("og_title") == "", F.lit(None).cast("boolean"))
                .otherwise(F.col("og_title") == F.col("title"))
                .alias("og_matches_title"))
            .orderBy("url"))


def crawl_gate(pages: DataFrame) -> DataFrame:
    """Pre-extraction crawl-control gate — the production composition
    of ``q_index_gate``/``q_canonical_clusters`` (jobs/webcorpus.py
    runs it BEFORE the Arrow extraction stage, because every page it
    drops is extraction compute saved).

    Keep rules:
    * ``noindex`` pages drop (robots meta);
    * no canonical or self-canonical → keep;
    * cross-canonicalized pages resolve by CONNECTED COMPONENT over
      the (url → canonical) edges — canonical declarations are
      duplicate declarations, so they compose transitively (A→B→C is
      one duplicate cluster, not two): a component containing any
      plain survivor keeps only that survivor; a component with none
      (uncrawled or noindex canonical targets, canonical CYCLES)
      keeps exactly one representative (min crawled url), like a
      search engine canonicalizing a mirror farm whose canonical form
      it never saw — a cluster must never vanish with no survivor.
      (The round-3 single-hop rule over-kept chains: with A→B→C both
      A and B survived; round-3 advice.)

    The flag scan decodes ISO-8859-1 (maps every byte — legacy-charset
    or binary rows can never error the gate; the patterns are pure
    ASCII so windows-1252 heads still match, and UTF-16 heads simply
    match nothing → default-allow, the crawl-polite choice).

    Scale shape (10^12 pages): the noindex/self-canonical majority
    passes in the SCAN projection — no shuffle, no join, payload bytes
    never move. Only the cross-canonical minority (a few % of a real
    crawl) reaches the component resolution, as skinny xxhash64 edge
    rows — the same min-label propagation ``dedup.cc_min_labels`` runs
    for LSH clusters (loud on diameter > max_iters; canonical chains
    that deep are pathological). Production note: widen the node ids
    to 128 bits (md5-derived) at 10^12 urls — a 64-bit birthday
    collision would merge two unrelated clusters and over-drop. The
    payloads of the minority re-enter via one semi-join keyed on url
    (AQE broadcasts the tiny keeper set)."""
    from .dedup import cc_min_labels

    page = F.decode("html", "ISO-8859-1")
    flagged = pages.withColumn(
        "_robots", F.regexp_extract(page, ROBOTS_RE, 1)).withColumn(
        "_canon", F.regexp_extract(page, CANON_RE, 1))
    ok = flagged.filter(~F.col("_robots").contains("noindex"))
    cross = (F.col("_canon") != "") & (F.col("_canon") != F.col("url"))
    plain = ok.filter(~cross).drop("_robots", "_canon")
    crossed = ok.filter(cross)
    # component per canonical cluster: nodes are urls AND canonical
    # targets (crawled or not), edges the declarations themselves
    # checkpoint the edge list (as q_dedup_clusters does) so the page
    # scan + regexp subtree runs once, not once per propagation round
    members = cc_min_labels(
        crossed.select(F.xxhash64("url").alias("id_a"),
                       F.xxhash64("_canon").alias("id_b"))
        .localCheckpoint(eager=True))
    # a component that contains a page that PASSES the gate as itself
    # already has its survivor — every crossed member drops
    doomed = (members
              .join(plain.select(F.xxhash64("url").alias("id")),
                    "id", "left_semi")
              .select("label").distinct())
    # survivor-less components (uncrawled / noindex / cyclic canonical
    # targets) keep one representative: the min CRAWLED crossed url —
    # content must never vanish with no survivor (round-3 review)
    keepers = (members.join(doomed, "label", "left_anti")
               .join(crossed.select(F.xxhash64("url").alias("id"), "url"),
                     "id")
               .groupBy("label").agg(F.min("url").alias("url"))
               .select("url"))
    crossed_kept = (crossed.drop("_robots", "_canon")
                    .join(keepers, "url", "left_semi"))
    return plain.unionByName(crossed_kept)


_W1252_HEX = 'charset="windows-1252"'.encode().hex().upper()
_UTF8_HEX = 'charset="utf-8"'.encode().hex().upper()
# first 1024 payload bytes = 2048 hex chars: the HTML5 pre-scan window
_HEAD_HEX_LEN = 2048


def q_charset_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-page encoding audit over the RAW bytes — BOM detection plus
    first-declared ``charset=`` in the HTML5 pre-scan window (1024
    bytes), the exact precedence ``extraction/core.decode_payload``
    applies, so this query measures how much of a crawl needs the
    transcode path before UTF-8-only processing can touch it.

    Both engines read the bytes through the SAME ``substr(hex(html),
    1, 2048)`` fragment — neither ever utf-8-decodes the payload, so
    legacy-encoded pages can't error the audit that exists to find
    them. Declared-charset detection is a closed-set position compare
    (windows-1252 vs utf-8, first occurrence wins — matching the
    decoder's first-match rule); production would regexp a leniently
    decoded prefix for the open set, and would hex only a sliced
    prefix rather than the whole payload.

    Scale note: pure scan projection; includes ``.htm`` legacy rows
    the utf-8-only pages-tier queries exclude."""
    markup = all_pages_df(spark).filter(F.col("url").endswith(".html")
                          | F.col("url").endswith(".htm"))
    head_hex = F.substring(F.hex(F.col("html")), 1, _HEAD_HEX_LEN)
    base = markup.select(
        "url",
        F.octet_length("html").cast("long").alias("n_bytes"),
        head_hex.alias("head_hex"))
    bom = (F.when(F.substring("head_hex", 1, 6) == "EFBBBF", "utf8")
           .when(F.substring("head_hex", 1, 4) == "FFFE", "utf16le")
           .when(F.substring("head_hex", 1, 4) == "FEFF", "utf16be")
           .otherwise("none"))
    # byte-aligned match only: a 1-based locate() over hex text lands on
    # a byte boundary iff the position is ODD — without the check a
    # payload whose bytes encode the pattern shifted by half a byte
    # would flag a declaration no byte-level reader sees (round-3
    # review). Declared is only consulted when there is NO BOM —
    # decode_payload's precedence exactly.
    w_raw = F.expr(f"locate('{_W1252_HEX}', head_hex)")
    u_raw = F.expr(f"locate('{_UTF8_HEX}', head_hex)")
    w_pos = F.when(w_raw % 2 == 1, w_raw).otherwise(F.lit(0))
    u_pos = F.when(u_raw % 2 == 1, u_raw).otherwise(F.lit(0))
    declared = (F.when(F.col("bom") != "none", "none")
                .when((w_pos > 0) & ((u_pos == 0) | (w_pos < u_pos)),
                      "windows-1252")
                .when(u_pos > 0, "utf-8")
                .otherwise("none"))
    return (base
            .withColumn("bom", bom)
            .withColumn("declared", declared)
            .withColumn("needs_transcode",
                        F.col("bom").isin("utf16le", "utf16be")
                        | (F.col("declared") == "windows-1252"))
            .select("url", "n_bytes", "bom", "declared", "needs_transcode")
            .orderBy("url"))


# ---------------------------------------------------------------------------
# DuckDB oracles — identical regexes and eligibility CASE logic.
# ---------------------------------------------------------------------------

_FLAGS_CTE = f"""
        flags AS (
          SELECT url,
                 regexp_extract(url, '{HOST_RE}', 1) AS host,
                 regexp_extract(decode(html), '{ROBOTS_RE}', 1) AS robots,
                 regexp_extract(decode(html), '{CANON_RE}', 1) AS canonical
          FROM '__PAGES_PARQUET__' WHERE url LIKE '%.html'),
        flagged AS (
          SELECT url, host, robots, canonical,
                 robots LIKE '%noindex%' AS noindex,
                 robots LIKE '%nofollow%' AS nofollow,
                 canonical <> '' AND canonical = url AS self_canon,
                 canonical <> '' AND canonical <> url AS cross_canon
          FROM flags)"""

HEADTAGS_ORACLES = {
    "index_gate": f"""
        WITH {_FLAGS_CTE}
        SELECT host,
               CAST(count(*) AS BIGINT) AS n_pages,
               CAST(sum(CASE WHEN noindex THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_noindex,
               CAST(sum(CASE WHEN nofollow THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_nofollow,
               CAST(sum(CASE WHEN self_canon THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_self_canon,
               CAST(sum(CASE WHEN cross_canon THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_cross_canon,
               CAST(sum(CASE WHEN NOT noindex AND NOT cross_canon
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_indexable,
               round(sum(CASE WHEN NOT noindex AND NOT cross_canon
                              THEN 1 ELSE 0 END) / count(*), 6)
                 AS indexable_rate
        FROM flagged
        GROUP BY host
        ORDER BY host
    """,
    "canonical_clusters": f"""
        WITH {_FLAGS_CTE}
        SELECT canonical,
               CAST(count(*) AS BIGINT) AS cluster_size,
               min(url) AS representative,
               CAST(count(DISTINCT host) AS BIGINT) AS n_hosts
        FROM flagged
        WHERE canonical <> ''
        GROUP BY canonical
        HAVING count(*) >= 2
        ORDER BY cluster_size DESC, canonical
    """,
    "charset_audit": f"""
        WITH base AS (
          SELECT url,
                 CAST(octet_length(html) AS BIGINT) AS n_bytes,
                 substr(hex(html), 1, {_HEAD_HEX_LEN}) AS head_hex
          FROM '__PAGES_PARQUET__'
          WHERE url LIKE '%.html' OR url LIKE '%.htm'),
        raw AS (
          SELECT url, n_bytes,
                 CASE WHEN substr(head_hex, 1, 6) = 'EFBBBF' THEN 'utf8'
                      WHEN substr(head_hex, 1, 4) = 'FFFE' THEN 'utf16le'
                      WHEN substr(head_hex, 1, 4) = 'FEFF' THEN 'utf16be'
                      ELSE 'none' END AS bom,
                 strpos(head_hex, '{_W1252_HEX}') AS w_raw,
                 strpos(head_hex, '{_UTF8_HEX}') AS u_raw
          FROM base),
        flagged AS (
          SELECT url, n_bytes, bom,
                 CASE WHEN w_raw % 2 = 1 THEN w_raw ELSE 0 END AS w_pos,
                 CASE WHEN u_raw % 2 = 1 THEN u_raw ELSE 0 END AS u_pos
          FROM raw),
        decided AS (
          SELECT url, n_bytes, bom,
                 CASE WHEN bom <> 'none' THEN 'none'
                      WHEN w_pos > 0 AND (u_pos = 0 OR w_pos < u_pos)
                        THEN 'windows-1252'
                      WHEN u_pos > 0 THEN 'utf-8'
                      ELSE 'none' END AS declared
          FROM flagged)
        SELECT url, n_bytes, bom, declared,
               bom IN ('utf16le', 'utf16be')
                 OR declared = 'windows-1252' AS needs_transcode
        FROM decided
        ORDER BY url
    """,
    "structured_data": f"""
        SELECT url,
               regexp_extract(decode(html), '{TITLE_RE}', 1) AS title,
               regexp_extract(decode(html), '{OG_TITLE_RE}', 1) AS og_title,
               regexp_extract(decode(html), '{OG_TYPE_RE}', 1) AS og_type,
               regexp_extract(decode(html), '{JSONLD_TYPE_RE}', 1)
                 AS jsonld_type,
               CAST(nullif(regexp_extract(decode(html), '{JSONLD_WC_RE}', 1),
                           '') AS BIGINT) AS jsonld_wordcount,
               CASE WHEN regexp_extract(decode(html), '{OG_TITLE_RE}', 1) = ''
                    THEN NULL
                    ELSE regexp_extract(decode(html), '{OG_TITLE_RE}', 1)
                         = regexp_extract(decode(html), '{TITLE_RE}', 1)
               END AS og_matches_title
        FROM '__PAGES_PARQUET__'
        WHERE url LIKE '%.html'
          AND (regexp_extract(decode(html), '{OG_TITLE_RE}', 1) <> ''
               OR regexp_extract(decode(html), '{JSONLD_TYPE_RE}', 1) <> '')
        ORDER BY url
    """,
}


def oracle_sql_for_headtags(repo_root: str) -> dict[str, str]:
    path = pages_path(repo_root)
    return {k: v.replace("__PAGES_PARQUET__", path)
            for k, v in HEADTAGS_ORACLES.items()}
