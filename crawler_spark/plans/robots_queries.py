"""Driver queries for the robots.txt parse stage (SURVEY.md A15/B6/J6).

The reference parses live robots.txt text through RobotFileParser
(master/src/crawler/robots_checker.py:41-138). Here the engine SYNTHESIZES
deterministic robots.txt documents from the nation table, genuinely parses
them with the vectorized mapInPandas stage (functions/robots.py), and
decides per-URL fetchability with the broadcast-join rule evaluator. The
DuckDB oracles never see the text: they reconstruct the expected rules /
decisions directly from the same generating arithmetic, so any parser or
evaluator deviation — group selection, rule ordering, default-allow —
surfaces as a value mismatch.

Document shape per host h = n_nationkey (0..24):

    [h odd]    User-agent: badbot        # must be skipped for UA=crawler
               Disallow: /

               User-agent: *
    [h%3==0]   Allow: /blocked{h%5}/ok   # first-match ordering exercised
               Disallow: /blocked{h%5}
    [h%4==0]   Crawl-delay: {h%7+2}

    [h%6==0]   User-agent: crawler       # specific group AFTER the star
               Disallow: /only{h}        # group still wins (stdlib: '*'
                                         # is the default, consulted last)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.robots import can_fetch_df, parse_robots
from ..sources.testdata import load_table
from .registry import register


def _robots_hosts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(host_id, robots_txt) synthesized from nation keys — the text the
    parser must genuinely walk."""
    n = load_table(spark, sf_dir, "nation")
    h = F.col("n_nationkey").cast("int")
    blocked = F.concat(F.lit("/blocked"), (h % 5).cast("string"))
    star_group = F.concat(
        F.lit("User-agent: *\n"),
        F.when(
            h % 3 == 0,
            F.concat(F.lit("Allow: "), blocked, F.lit("/ok\n")),
        ).otherwise(F.lit("")),
        F.lit("Disallow: "), blocked, F.lit("\n"),
        F.when(
            h % 4 == 0,
            F.concat(
                F.lit("Crawl-delay: "), (h % 7 + 2).cast("string"), F.lit("\n")
            ),
        ).otherwise(F.lit("")),
    )
    txt = F.concat(
        F.when(h % 2 == 1, F.lit("User-agent: badbot\nDisallow: /\n\n"))
        .otherwise(F.lit("")),
        star_group,
        F.when(
            h % 6 == 0,
            F.concat(
                F.lit("\nUser-agent: crawler\nDisallow: /only"),
                h.cast("string"), F.lit("\n"),
            ),
        ).otherwise(F.lit("")),
    )
    return n.select(h.alias("host_id"), txt.alias("robots_txt"))


@register(
    "robots_txt_parse",
    oracle="""
    WITH h AS (SELECT CAST(n_nationkey AS INT) AS host FROM nation),
    specific AS (     -- h%6==0: the crawler group shadows the star group
      SELECT host, 0 AS seq, FALSE AS allow,
             '/only' || host AS path, CAST(NULL AS INT) AS crawl_delay
      FROM h WHERE host % 6 = 0
    ), star_allow AS ( -- h%3==0 (and not shadowed): Allow line first
      SELECT host, 0 AS seq, TRUE AS allow,
             '/blocked' || (host % 5) || '/ok' AS path,
             CASE WHEN host % 4 = 0 THEN host % 7 + 2 END AS crawl_delay
      FROM h WHERE host % 6 <> 0 AND host % 3 = 0
    ), star_dis AS (   -- every non-shadowed host: the Disallow line
      SELECT host,
             CASE WHEN host % 3 = 0 THEN 1 ELSE 0 END AS seq, FALSE AS allow,
             '/blocked' || (host % 5) AS path,
             CASE WHEN host % 4 = 0 THEN host % 7 + 2 END AS crawl_delay
      FROM h WHERE host % 6 <> 0
    )
    SELECT CAST(host AS INT) AS host_id, CAST(seq AS INT) AS seq, allow,
           path, CAST(crawl_delay AS INT) AS crawl_delay
    FROM (SELECT * FROM specific UNION ALL
          SELECT * FROM star_allow UNION ALL
          SELECT * FROM star_dis)
    """,
)
def robots_txt_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parse the synthesized robots.txt corpus for UA 'crawler'."""
    return parse_robots(_robots_hosts(spark, sf_dir), user_agent="crawler")


@register(
    "robots_can_fetch",
    oracle="""
    WITH u AS (
      SELECT c_custkey,
             CAST(c_custkey % 25 AS INT) AS host_id,
             c_custkey % 4 AS v
      FROM customer
    )
    SELECT c_custkey, host_id,
           CASE
             WHEN host_id % 6 = 0 THEN (v <> 2)    -- only /only{h}/* blocked
             WHEN v = 0 THEN FALSE                 -- /blocked{h%5}/page
             WHEN v = 1 THEN host_id % 3 = 0       -- /ok allowed iff Allow line
             ELSE TRUE                             -- v=2 /only, v=3 /open
           END AS allowed
    FROM u
    """,
)
def robots_can_fetch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-URL decision through parse + broadcast rule join; URL paths hit
    every branch: the Disallow prefix, the Allow carve-out, the shadowed
    specific group, and the default-allow fallthrough."""
    rules = parse_robots(_robots_hosts(spark, sf_dir), user_agent="crawler")
    c = load_table(spark, sf_dir, "customer")
    h = (F.col("c_custkey") % 25).cast("int")
    v = F.col("c_custkey") % 4
    path = (
        F.when(v == 0, F.concat(F.lit("/blocked"), (h % 5).cast("string"),
                                F.lit("/page")))
        .when(v == 1, F.concat(F.lit("/blocked"), (h % 5).cast("string"),
                               F.lit("/ok/x")))
        .when(v == 2, F.concat(F.lit("/only"), h.cast("string"), F.lit("/x")))
        .otherwise(F.lit("/open/x"))
    )
    urls = c.select(
        "c_custkey",
        h.alias("host_id"),
        F.concat(F.lit("http://host"), h.cast("string"),
                 F.lit(".example.com"), path).alias("url"),
    )
    return can_fetch_df(urls, rules).select("c_custkey", "host_id", "allowed")


# ---------------------------------------------------------------------------
# Sitemap discovery (sitemaps.org extension; functions/robots.py::
# extract_sitemaps).  The corpus is synthesized here — every host gets a
# canonical `Sitemap:` line, h%3==0 hosts add a lowercase-key second
# sitemap (case-insensitivity), h%4==1 hosts an indented line with a
# trailing comment (whitespace + comment stripping), h%5==2 hosts a fully
# commented-OUT line that must NOT extract.  As everywhere in this file,
# the oracle never sees the text: it reconstructs the expected URL set
# from the generating arithmetic, so any extractor deviation surfaces as
# a value mismatch.
# ---------------------------------------------------------------------------


@register(
    "robots_sitemaps",
    oracle="""
    WITH h AS (SELECT CAST(n_nationkey AS INT) AS hid FROM nation)
    SELECT hid AS host_id,
           'https://host' || hid || '.example/sitemap.xml' AS sitemap_url
    FROM h
    UNION ALL
    SELECT hid, 'https://host' || hid || '.example/sitemap-news.xml'
    FROM h WHERE hid % 3 = 0
    UNION ALL
    SELECT hid, 'https://host' || hid || '.example/extra.xml'
    FROM h WHERE hid % 4 = 1
    """,
)
def robots_sitemaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.robots import extract_sitemaps

    n = load_table(spark, sf_dir, "nation")
    h = F.col("n_nationkey").cast("int")
    base = F.concat(F.lit("https://host"), h.cast("string"),
                    F.lit(".example/"))
    txt = F.concat(
        F.lit("User-agent: *\nDisallow: /private\n"),
        F.lit("Sitemap: "), base, F.lit("sitemap.xml\n"),
        F.when(h % 3 == 0, F.concat(
            F.lit("sitemap: "), base, F.lit("sitemap-news.xml\n"))
        ).otherwise(F.lit("")),
        F.when(h % 4 == 1, F.concat(
            F.lit("  Sitemap:   "), base,
            F.lit("extra.xml  # discovered via robots\n"))
        ).otherwise(F.lit("")),
        F.when(h % 5 == 2, F.concat(
            F.lit("# Sitemap: "), base, F.lit("ghost.xml\n"))
        ).otherwise(F.lit("")),
    )
    bodies = n.select(h.alias("host_id"), txt.alias("robots_txt"))
    return extract_sitemaps(bodies, "host_id", "robots_txt")
