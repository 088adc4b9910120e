"""Frontier/scheduler-shaped queries — the north-rule operators expressed
over the driver testdata so the DuckDB oracle can check them.

URLs are synthesized deterministically from integer keys (no external
data): both engines build the identical strings, so canonicalization,
validity/relevance filtering, dedupe, priority assignment, per-host top-k
and politeness are all value-checked end to end.

The real engine (crawler_spark.operators.*) runs these same operators over
its own frontier tables; this module is the oracle-checkable projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..sources.testdata import load_table
from .registry import register

# ---------------------------------------------------------------------------
# Shared URL synthesis (both engines build identical strings).
# ---------------------------------------------------------------------------

# page id = o_orderkey % 4000: multiple orders map to the SAME URL, so
# the dedupe stage genuinely removes rows (a vacuous dedupe input would
# let a broken first-discovery window pass the oracle unnoticed).
URLS_SQL = (
    "SELECT o_orderkey, "
    "'https://host' || CAST((o_orderkey % 4000) % 50 AS VARCHAR) "
    "|| '.example.com/page/' || CAST(o_orderkey % 4000 AS VARCHAR) AS url, "
    "'host' || CAST((o_orderkey % 4000) % 50 AS VARCHAR) || '.example.com' AS host, "
    "CAST(o_orderkey % 4000 % 5 + 1 AS INT) AS priority "
    "FROM orders"
)


def _urls(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    page = F.col("o_orderkey") % 4000
    host = F.concat(F.lit("host"), (page % 50).cast("string"),
                    F.lit(".example.com"))
    return o.select(
        "o_orderkey",
        F.concat(F.lit("https://"), host, F.lit("/page/"),
                 page.cast("string")).alias("url"),
        host.alias("host"),
        (page % 5 + 1).cast("int").alias("priority"),
    )


# ---------------------------------------------------------------------------
# FLAGSHIP — one full scheduling round (SURVEY.md §3.2 Spark equivalent):
# synthesize frontier -> first-discovery-wins dedupe -> per-host top-k by
# priority (E4) -> deterministic fetch order (round, priority, host, seq).
# This is the composite the north rule calls "a pure DataFrame job".
# ---------------------------------------------------------------------------
FLAGSHIP_ORACLE = """
WITH frontier AS ({urls}),
dedup AS (
  SELECT * FROM (
    SELECT url, host, priority, o_orderkey,
           ROW_NUMBER() OVER (PARTITION BY url ORDER BY o_orderkey) AS rn
    FROM frontier
  ) WHERE rn = 1
),
batch AS (
  SELECT host, url, priority,
         ROW_NUMBER() OVER (PARTITION BY host
                            ORDER BY priority, o_orderkey) AS seq
  FROM dedup
)
SELECT host, url, CAST(priority AS INT) AS priority, CAST(seq AS INT) AS seq
FROM batch WHERE seq <= 3
""".format(urls=URLS_SQL)


@register("frontier_round_schedule", oracle=FLAGSHIP_ORACLE)
def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    fr = _urls(spark, sf_dir)
    # first-discovery-wins dedupe (D1/D4 semantics, worker.py:362,441)
    w_dedup = W.partitionBy("url").orderBy("o_orderkey")
    dedup = (
        fr.withColumn("rn", F.row_number().over(w_dedup))
        .where(F.col("rn") == 1)
        .drop("rn")
    )
    # per-host top-k fetch batch (E4; politeness budget k=3 per host/round)
    w_host = W.partitionBy("host").orderBy("priority", "o_orderkey")
    return (
        dedup.withColumn("seq", F.row_number().over(w_host).cast("int"))
        .where(F.col("seq") <= 3)
        .select("host", "url", F.col("priority").cast("int").alias("priority"), "seq")
    )


# ---------------------------------------------------------------------------
# C1 (native subset) — URL canonicalization: strip fragment, lowercase
# scheme+host, strip trailing slash (link_extractor.py:85-120). The full
# RFC-3986 form (urljoin, private-IP checks) is the pandas UDF in
# functions/urls.py; this query is the Catalyst-native subset.
# ---------------------------------------------------------------------------
MESSY_SQL = (
    "SELECT doc_id, "
    "'HTTPS://Host' || CAST(doc_id % 20 AS VARCHAR) || '.Example.COM/Path/' "
    "|| CAST(doc_id AS VARCHAR) "
    "|| (CASE WHEN doc_id % 3 = 0 THEN '/' ELSE '' END) "
    "|| (CASE WHEN doc_id % 4 = 0 THEN '#frag' ELSE '' END) AS url "
    "FROM documents"
)


@register(
    "url_canonicalize",
    oracle="""
    WITH messy AS ({messy}),
    stripped AS (
      SELECT doc_id, regexp_replace(url, '#.*$', '') AS u FROM messy
    )
    SELECT doc_id,
           lower(regexp_extract(u, '^([A-Za-z]+)://', 1)) || '://' ||
           lower(regexp_extract(u, '^[A-Za-z]+://([^/]+)', 1)) ||
           regexp_replace(regexp_replace(u, '^[A-Za-z]+://[^/]+', ''), '/$', '')
           AS canon_url
    FROM stripped
    """.format(messy=MESSY_SQL),
)
def url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("HTTPS://Host"), (F.col("doc_id") % 20).cast("string"),
        F.lit(".Example.COM/Path/"), F.col("doc_id").cast("string"),
        F.when(F.col("doc_id") % 3 == 0, "/").otherwise(""),
        F.when(F.col("doc_id") % 4 == 0, "#frag").otherwise(""),
    )
    u = F.regexp_replace(url, r"#.*$", "")
    canon = F.concat(
        F.lower(F.regexp_extract(u, r"^([A-Za-z]+)://", 1)),
        F.lit("://"),
        F.lower(F.regexp_extract(u, r"^[A-Za-z]+://([^/]+)", 1)),
        F.regexp_replace(F.regexp_replace(u, r"^[A-Za-z]+://[^/]+", ""), r"/$", ""),
    )
    return d.select("doc_id", canon.alias("canon_url"))


# ---------------------------------------------------------------------------
# B1/B2 — URL validity filters (html_downloader.py:292-318,
# link_extractor.py:122-160): scheme allowlist, no dot-dot traversal, no
# skipped file extensions, bounded length.
# ---------------------------------------------------------------------------
NOISY_SQL = (
    "SELECT doc_id, "
    "(CASE WHEN doc_id % 5 = 0 THEN 'javascript' ELSE 'https' END) || "
    "'://site' || CAST(doc_id % 9 AS VARCHAR) || '.example.com/' || "
    "(CASE WHEN doc_id % 11 = 0 THEN '../' ELSE '' END) || "
    "'doc/' || CAST(doc_id AS VARCHAR) || "
    "(CASE WHEN doc_id % 7 = 0 THEN '.pdf' ELSE '.html' END) AS url "
    "FROM documents"
)


from ..frontier import spec as _spec  # single source of the validity rule


@register(
    "filter_validity",
    oracle="""
    WITH noisy AS ({noisy})
    SELECT doc_id, url FROM noisy
    WHERE regexp_matches(url, '^https?://')
      AND NOT regexp_matches(url, '\\.\\.')
      AND NOT regexp_matches(lower(url), '{skip_ext}')
      AND length(url) <= {max_len}
    """.format(noisy=NOISY_SQL, skip_ext=_spec.SKIP_EXT_RE,
               max_len=_spec.MAX_URL_LEN),
)
def filter_validity(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    url = F.concat(
        F.when(F.col("doc_id") % 5 == 0, "javascript").otherwise("https"),
        F.lit("://site"), (F.col("doc_id") % 9).cast("string"),
        F.lit(".example.com/"),
        F.when(F.col("doc_id") % 11 == 0, "../").otherwise(""),
        F.lit("doc/"), F.col("doc_id").cast("string"),
        F.when(F.col("doc_id") % 7 == 0, ".pdf").otherwise(".html"),
    )
    df = d.select("doc_id", url.alias("url"))
    return df.where(
        F.col("url").rlike(r"^https?://")
        & ~F.col("url").rlike(r"\.\.")
        & ~F.lower(F.col("url")).rlike(_spec.SKIP_EXT_RE)
        & (F.length("url") <= _spec.MAX_URL_LEN)
    )


# ---------------------------------------------------------------------------
# B3/B4 — relevance regexes (property_matcher.py:17-26): listing-page vs
# property-page URL classes; off-target domains dropped.
# ---------------------------------------------------------------------------
CLASSY_SQL = (
    "SELECT doc_id, "
    "CASE WHEN doc_id % 4 = 0 THEN "
    "  'https://city' || CAST(doc_id % 6 AS VARCHAR) || '.craigslist.org/search/apa?p=' || CAST(doc_id AS VARCHAR) "
    "WHEN doc_id % 4 = 1 THEN "
    "  'https://city' || CAST(doc_id % 6 AS VARCHAR) || '.craigslist.org/apa/d/listing-slug/' || CAST(doc_id AS VARCHAR) || '.html' "
    "ELSE 'https://other' || CAST(doc_id AS VARCHAR) || '.example.com/x' END AS url "
    "FROM documents"
)
LISTING_RE = r"^https://[a-z0-9-]+\.craigslist\.org/search/apa(\?.*)?$"
PROPERTY_RE = r"^https://[a-z0-9-]+\.craigslist\.org/apa/d/[a-z0-9-]+/[0-9]+\.html$"


@register(
    "relevance_filter",
    oracle="""
    WITH classy AS ({classy})
    SELECT doc_id, url,
           CASE WHEN regexp_matches(url, '{listing}') THEN 'listing'
                ELSE 'property' END AS kind
    FROM classy
    WHERE regexp_matches(url, '{listing}') OR regexp_matches(url, '{prop}')
    """.format(classy=CLASSY_SQL, listing=LISTING_RE, prop=PROPERTY_RE),
)
def relevance_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    city = (F.col("doc_id") % 6).cast("string")
    url = (
        F.when(
            F.col("doc_id") % 4 == 0,
            F.concat(F.lit("https://city"), city,
                     F.lit(".craigslist.org/search/apa?p="),
                     F.col("doc_id").cast("string")),
        )
        .when(
            F.col("doc_id") % 4 == 1,
            F.concat(F.lit("https://city"), city,
                     F.lit(".craigslist.org/apa/d/listing-slug/"),
                     F.col("doc_id").cast("string"), F.lit(".html")),
        )
        .otherwise(
            F.concat(F.lit("https://other"), F.col("doc_id").cast("string"),
                     F.lit(".example.com/x"))
        )
    )
    df = d.select("doc_id", url.alias("url"))
    is_listing = F.col("url").rlike(LISTING_RE)
    is_property = F.col("url").rlike(PROPERTY_RE)
    return df.where(is_listing | is_property).withColumn(
        "kind", F.when(is_listing, "listing").otherwise("property")
    )


# ---------------------------------------------------------------------------
# I — seed ∪ manual ∪ extracted merge (master.py/queue_manager.py/worker.py
# all feed the same topics): unionByName + distinct + per-source counts.
# ---------------------------------------------------------------------------
@register(
    "union_merge_sources",
    oracle="""
    WITH seeds AS (
      SELECT 'https://h' || CAST(o_orderkey % 97 AS VARCHAR) || '.example.com' AS url,
             'seed' AS source
      FROM orders WHERE o_orderkey <= 400
    ), manual AS (
      SELECT 'https://h' || CAST(c_custkey % 97 AS VARCHAR) || '.example.com' AS url,
             'manual' AS source
      FROM customer WHERE c_custkey <= 200
    ), merged AS (
      SELECT DISTINCT url, source FROM (
        SELECT * FROM seeds UNION ALL SELECT * FROM manual
      )
    )
    SELECT source, COUNT(*) AS n_urls FROM merged GROUP BY source
    """,
)
def union_merge_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    seeds = o.where(F.col("o_orderkey") <= 400).select(
        F.concat(F.lit("https://h"), (F.col("o_orderkey") % 97).cast("string"),
                 F.lit(".example.com")).alias("url"),
        F.lit("seed").alias("source"),
    )
    manual = c.where(F.col("c_custkey") <= 200).select(
        F.concat(F.lit("https://h"), (F.col("c_custkey") % 97).cast("string"),
                 F.lit(".example.com")).alias("url"),
        F.lit("manual").alias("source"),
    )
    return (
        seeds.unionByName(manual)
        .distinct()
        .groupBy("source")
        .agg(F.count("*").alias("n_urls"))
    )


# ---------------------------------------------------------------------------
# A13/E5/B11 — DLQ routing + exponential backoff (worker.py:219-231,
# html_downloader.py:172-193, transaction.py:132-146).
# ---------------------------------------------------------------------------
@register(
    "dlq_routing",
    oracle="""
    SELECT event_id,
           CASE WHEN event_type = 'error' THEN 'dlq'
                WHEN value < 50 THEN 'retry'
                ELSE 'fetched' END AS state,
           CASE WHEN event_type = 'error' OR value < 50
                THEN CAST(pow(2, CAST(FLOOR(value) AS BIGINT) % 4) AS INT)
                ELSE 0 END AS backoff_rounds
    FROM events
    """,
)
def dlq_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    state = (
        F.when(F.col("event_type") == "error", "dlq")
        .when(F.col("value") < 50, "retry")
        .otherwise("fetched")
    )
    backoff = F.when(
        (F.col("event_type") == "error") | (F.col("value") < 50),
        F.pow(F.lit(2), F.floor("value").cast("bigint") % 4).cast("int"),
    ).otherwise(0)
    return e.select(
        "event_id", state.alias("state"), backoff.alias("backoff_rounds")
    )


# ---------------------------------------------------------------------------
# B6/J6 — robots gate: left join frontier vs a small robots dimension on
# host; missing rows => allowed (robots_checker.py:118-120 allow-by-default).
# ---------------------------------------------------------------------------
@register(
    "robots_gate",
    oracle="""
    WITH robots AS (
      SELECT n_nationkey AS host_key,
             (n_nationkey % 3 <> 0) AS allowed
      FROM nation
    )
    SELECT c.c_custkey
    FROM customer c LEFT JOIN robots r ON c.c_nationkey = r.host_key
    WHERE r.allowed IS NULL OR r.allowed
    """,
)
def robots_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    robots = n.select(
        F.col("n_nationkey").alias("host_key"),
        (F.col("n_nationkey") % 3 != 0).alias("allowed"),
    )
    return (
        c.join(F.broadcast(robots), c.c_nationkey == robots.host_key, "left")
        .where(F.col("allowed").isNull() | F.col("allowed"))
        .select("c_custkey")
    )


# ---------------------------------------------------------------------------
# B8/D2 — content-change gate (worker.py:172-174, cache_service.py:65-70):
# keep a doc only when its content hash differs from the previous snapshot
# (modeled as the previous doc_id within the same source).
# ---------------------------------------------------------------------------
@register(
    "content_change_gate",
    oracle="""
    SELECT doc_id, source FROM (
      SELECT doc_id, source, md5(text) AS h,
             LAG(md5(text)) OVER (PARTITION BY source ORDER BY doc_id) AS prev_h
      FROM documents
    ) WHERE prev_h IS NULL OR h <> prev_h
    """,
)
def content_change_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    w = W.partitionBy("source").orderBy("doc_id")
    return (
        d.select("doc_id", "source", F.md5("text").alias("h"))
        .withColumn("prev_h", F.lag("h").over(w))
        .where(F.col("prev_h").isNull() | (F.col("h") != F.col("prev_h")))
        .select("doc_id", "source")
    )


# ---------------------------------------------------------------------------
# G3/E3 — FIFO sequencing per partition (worker.py:485-500): deterministic
# seq per (partition=event_type) in arrival order.
# ---------------------------------------------------------------------------
@register(
    "fifo_sequence",
    oracle="""
    SELECT event_type, event_id, CAST(seq AS INT) AS seq FROM (
      SELECT event_type, event_id,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY ts, event_id) AS seq
      FROM events
    ) WHERE seq <= 5
    """,
)
def fifo_sequence(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("event_type").orderBy("ts", "event_id")
    return (
        e.withColumn("seq", F.row_number().over(w).cast("int"))
        .where(F.col("seq") <= 5)
        .select("event_type", "event_id", "seq")
    )


# ---------------------------------------------------------------------------
# C4-C8/C11 — parser field extraction (craigslist_parser.py:58-169):
# regexp_extract + try-cast over deterministic listing-like text.
# ---------------------------------------------------------------------------
LISTING_TEXT_SQL = (
    "SELECT doc_id, "
    "'$' || CAST(doc_id * 13 % 9000 + 1000 AS VARCHAR) || ' ' "
    "|| CAST(doc_id % 5 + 1 AS VARCHAR) || 'br ' "
    "|| CAST(doc_id % 3 + 1 AS VARCHAR) || 'ba ' "
    "|| CAST(doc_id * 7 % 2000 + 400 AS VARCHAR) || 'ft2 in city' "
    "|| CAST(doc_id % 12 AS VARCHAR) AS listing "
    "FROM documents"
)


@register(
    "parse_listing_fields",
    oracle="""
    WITH t AS ({t})
    SELECT doc_id,
           CAST(regexp_extract(listing, '\\$([0-9]+)', 1) AS INT) AS price,
           CAST(regexp_extract(listing, '([0-9]+)br', 1) AS INT) AS beds,
           CAST(regexp_extract(listing, '([0-9]+)ba', 1) AS INT) AS baths,
           CAST(regexp_extract(listing, '([0-9]+)ft2', 1) AS INT) AS sqft,
           regexp_extract(listing, 'in (city[0-9]+)', 1) AS city
    FROM t
    """.format(t=LISTING_TEXT_SQL),
)
def parse_listing_fields(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    listing = F.concat(
        F.lit("$"), (F.col("doc_id") * 13 % 9000 + 1000).cast("string"),
        F.lit(" "), (F.col("doc_id") % 5 + 1).cast("string"), F.lit("br "),
        (F.col("doc_id") % 3 + 1).cast("string"), F.lit("ba "),
        (F.col("doc_id") * 7 % 2000 + 400).cast("string"), F.lit("ft2 in city"),
        (F.col("doc_id") % 12).cast("string"),
    )
    t = d.select("doc_id", listing.alias("listing"))
    return t.select(
        "doc_id",
        F.regexp_extract("listing", r"\$([0-9]+)", 1).cast("int").alias("price"),
        F.regexp_extract("listing", r"([0-9]+)br", 1).cast("int").alias("beds"),
        F.regexp_extract("listing", r"([0-9]+)ba", 1).cast("int").alias("baths"),
        F.regexp_extract("listing", r"([0-9]+)ft2", 1).cast("int").alias("sqft"),
        F.regexp_extract("listing", r"in (city[0-9]+)", 1).alias("city"),
    )


# ---------------------------------------------------------------------------
# Freshness-driven re-crawl scheduling (Cho & Garcia-Molina): the events
# stream models a fetch history — one row per fetch of url `user_id` at
# `ts`, with event_type in (purchase, error) as the content-changed
# observation.  Integer cross-multiplied tier cuts + exact timestamp
# arithmetic keep every output column engine-exact.  Extends the
# reference's after-the-fetch change gate (SURVEY.md A14/B8/D2,
# crawler_service change detection) into a before-the-fetch scheduler —
# see frontier/freshness.py for the 100 TB shape.
# ---------------------------------------------------------------------------


@register(
    "recrawl_schedule",
    oracle="""
    WITH per_url AS (
      SELECT user_id,
             CAST(COUNT(*) AS BIGINT) AS n_fetches,
             CAST(SUM(CASE WHEN event_type IN ('purchase', 'error')
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_changes,
             MAX(ts) AS last_fetch
      FROM events GROUP BY user_id
    ), tiered AS (
      SELECT user_id, n_fetches, n_changes,
             CASE WHEN n_changes * 2 >= n_fetches * 1 THEN 'hot'
                  WHEN n_changes * 5 >= n_fetches * 1 THEN 'warm'
                  ELSE 'cold' END AS tier,
             CAST(CASE WHEN n_changes * 2 >= n_fetches * 1 THEN 6
                       WHEN n_changes * 5 >= n_fetches * 1 THEN 24
                       ELSE 72 END AS INT) AS revisit_hours,
             last_fetch
      FROM per_url
    )
    SELECT user_id, n_fetches, n_changes, tier, revisit_hours,
           last_fetch + to_hours(CAST(revisit_hours AS BIGINT)) AS next_due
    FROM tiered
    """,
)
def recrawl_schedule_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..frontier.freshness import recrawl_schedule

    e = load_table(spark, sf_dir, "events")
    return recrawl_schedule(
        e, "user_id", "ts",
        F.col("event_type").isin("purchase", "error"),
    )


# ---------------------------------------------------------------------------
# Link-graph mass ranking (OPIC/PageRank-lite, frontier/linkrank.py): the
# crawl-prioritization popularity signal, over a deterministic synthetic
# link graph derived from documents ids — 3 modular outlinks per page
# plus a link to one of 10 hub pages (the Zipf-hot head every real link
# graph has), self-loops dropped.  Integer-only mass propagation: the
# oracle replays both iterations in SQL and every intermediate matches
# bit-for-bit (Spark `div` == DuckDB `//` on non-negative ints).
# ---------------------------------------------------------------------------

_LINK_EDGES_SQL = """
  SELECT src, dst FROM (
    SELECT doc_id AS src,
           (doc_id * 3 + 0) % (SELECT COUNT(*) FROM documents) AS dst
    FROM documents
    UNION ALL
    SELECT doc_id,
           (doc_id * 5 + 1) % (SELECT COUNT(*) FROM documents)
    FROM documents
    UNION ALL
    SELECT doc_id,
           (doc_id * 7 + 2) % (SELECT COUNT(*) FROM documents)
    FROM documents
    UNION ALL
    SELECT doc_id, doc_id % 10 FROM documents
  ) WHERE dst <> src
"""


# the two-iteration mass recurrence as reusable CTEs (m2 = final mass)
_LINK_MASS_CTES = """
    e AS ({edges}),
    nodes AS (SELECT DISTINCT src AS node FROM e
              UNION SELECT DISTINCT dst FROM e),
    outdeg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS outdeg
               FROM e GROUP BY src),
    indeg AS (SELECT dst, CAST(COUNT(*) AS BIGINT) AS indeg
              FROM e GROUP BY dst),
    m0 AS (SELECT node, CAST(1000000 AS BIGINT) AS mass FROM nodes),
    c1 AS (SELECT e.dst AS node,
                  CAST(SUM(m.mass // o.outdeg) AS BIGINT) AS inc
           FROM e JOIN m0 m ON m.node = e.src
                  JOIN outdeg o ON o.src = e.src
           GROUP BY e.dst),
    m1 AS (SELECT n.node,
                  CAST(150000 + (85 * COALESCE(c.inc, 0)) // 100
                       AS BIGINT) AS mass
           FROM nodes n LEFT JOIN c1 c USING (node)),
    c2 AS (SELECT e.dst AS node,
                  CAST(SUM(m.mass // o.outdeg) AS BIGINT) AS inc
           FROM e JOIN m1 m ON m.node = e.src
                  JOIN outdeg o ON o.src = e.src
           GROUP BY e.dst),
    m2 AS (SELECT n.node,
                  CAST(150000 + (85 * COALESCE(c.inc, 0)) // 100
                       AS BIGINT) AS mass
           FROM nodes n LEFT JOIN c2 c USING (node))
""".format(edges=_LINK_EDGES_SQL)


def _link_graph(d: DataFrame, n: int) -> DataFrame:
    """The synthetic link graph (Spark side of _LINK_EDGES_SQL)."""
    dsts = F.array(
        (F.col("doc_id") * 3 + 0) % n,
        (F.col("doc_id") * 5 + 1) % n,
        (F.col("doc_id") * 7 + 2) % n,
        F.col("doc_id") % 10,
    )
    return (
        d.select("doc_id", F.explode(dsts).alias("dst"))
        .where(F.col("dst") != F.col("doc_id"))
        .select(F.col("doc_id").alias("src"), "dst")
    )


@register(
    "link_mass_rank",
    oracle="""
    WITH {ctes}
    SELECT m2.node,
           CAST(COALESCE(i.indeg, 0) AS BIGINT) AS indegree,
           CAST(COALESCE(o.outdeg, 0) AS BIGINT) AS outdegree,
           m2.mass
    FROM m2 LEFT JOIN indeg i ON i.dst = m2.node
            LEFT JOIN outdeg o ON o.src = m2.node
    """.format(ctes=_LINK_MASS_CTES),
)
def link_mass_rank_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..frontier.linkrank import link_mass_rank

    d = load_table(spark, sf_dir, "documents")
    n = d.count()  # bounded driver-side scalar (graph modulus)
    return link_mass_rank(_link_graph(d, n), "src", "dst", iterations=2)


# ---------------------------------------------------------------------------
# Popularity-boosted frontier ordering: the E2/E4 per-host ranked fetch
# order with link mass as the within-priority tiebreak — the integration
# that makes linkrank a frontier SIGNAL rather than a standalone stat.
# Per-host window (never a global sort), top-5 per host; pages the graph
# never references take the damping-floor mass on both engines.
# ---------------------------------------------------------------------------


@register(
    "linkmass_frontier_order",
    oracle="""
    WITH {ctes},
    pages AS (
      SELECT doc_id, doc_id % 20 AS host,
             CAST(doc_id % 5 AS INT) AS base_priority
      FROM documents
    ), joined AS (
      SELECT p.doc_id, p.host, p.base_priority,
             CAST(COALESCE(m.mass, 150000) AS BIGINT) AS mass
      FROM pages p LEFT JOIN m2 m ON m.node = p.doc_id
    ), ranked AS (
      SELECT doc_id, host, base_priority, mass,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY host
               ORDER BY base_priority ASC, mass DESC, doc_id ASC
             ) AS INT) AS fetch_rank
      FROM joined
    )
    SELECT doc_id, host, base_priority, mass, fetch_rank
    FROM ranked WHERE fetch_rank <= 5
    """.format(ctes=_LINK_MASS_CTES),
)
def linkmass_frontier_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..frontier.linkrank import link_mass_rank

    d = load_table(spark, sf_dir, "documents")
    n = d.count()
    mass = link_mass_rank(
        _link_graph(d, n), "src", "dst", iterations=2
    ).select(F.col("node").alias("doc_id"), "mass")
    pages = d.select(
        "doc_id",
        (F.col("doc_id") % 20).alias("host"),
        (F.col("doc_id") % 5).cast("int").alias("base_priority"),
    )
    joined = pages.join(mass, "doc_id", "left").select(
        "doc_id", "host", "base_priority",
        F.coalesce("mass", F.lit(150000)).cast("long").alias("mass"),
    )
    w = W.partitionBy("host").orderBy(
        F.col("base_priority").asc(), F.col("mass").desc(),
        F.col("doc_id").asc())
    return (
        joined.withColumn(
            "fetch_rank", F.row_number().over(w).cast("int"))
        .where(F.col("fetch_rank") <= 5)
    )
