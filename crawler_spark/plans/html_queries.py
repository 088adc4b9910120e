"""Oracle-checked HTML pipeline queries: deterministic HTML synthesized
identically in Spark and DuckDB; the Spark side goes through the REAL
Arrow UDFs (extract_links / parse_page), the oracle re-derives the same
values with SQL regexps — so the vectorized-UDF layer itself is
value-checked, not just unit-tested."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..functions.html import extract_image_urls, extract_links, parse_page
from ..sources.testdata import load_table
from .registry import register

# HTML template: title, a price block (absent when doc_id%5=0), beds/baths/
# sqft, and two anchors (one relative, one absolute, one junk).
_HTML_SQL = (
    "SELECT doc_id, "
    "'<html><title>Unit ' || doc_id || '</title>' "
    "|| CASE WHEN doc_id % 5 = 0 THEN '' "
    "        ELSE '<b>$' || CAST(doc_id % 9 + 1 AS VARCHAR) || ',' "
    "             || lpad(CAST(doc_id % 900 + 100 AS VARCHAR), 3, '0') || '</b>' END "
    "|| ' ' || CAST(doc_id % 4 + 1 AS VARCHAR) || 'br ' "
    "|| CAST(doc_id % 2 + 1 AS VARCHAR) "
    "|| CASE WHEN doc_id % 2 = 0 THEN '.5' ELSE '' END || 'ba ' "
    "|| CAST(doc_id % 1500 + 300 AS VARCHAR) || 'ft2 ' "
    "|| CASE WHEN doc_id % 7 = 0 THEN '' "
    "        ELSE '<time class=\"date timeago\" datetime=\"2024-01-' "
    "             || lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0') || 'T' "
    "             || lpad(CAST(doc_id % 24 AS VARCHAR), 2, '0') "
    "             || ':30:00Z\">d</time>' END "
    "|| CASE WHEN doc_id % 6 = 0 THEN '' "
    "        ELSE '<img src=\"/img/' || doc_id || '.jpg\">"
    "<img src=\"https://CDN.Example.COM/pic/' || doc_id || '/\">' END "
    "|| '<a href=\"/apa/d/u/' || doc_id || '.html\">r</a>' "
    "|| '<a href=\"https://Other.Example.COM/x/' || doc_id || '/\">a</a>' "
    "|| '<a href=\"javascript:void(0)\">j</a></html>' AS html, "
    "'https://h' || CAST(doc_id % 7 AS VARCHAR) || '.example.com/search/apa' AS base "
    "FROM documents"
)


def _html_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    i = F.col("doc_id")
    price = F.when(i % 5 == 0, "").otherwise(
        F.concat(F.lit("<b>$"), (i % 9 + 1).cast("string"), F.lit(","),
                 F.lpad((i % 900 + 100).cast("string"), 3, "0"), F.lit("</b>"))
    )
    baths = F.concat((i % 2 + 1).cast("string"),
                     F.when(i % 2 == 0, ".5").otherwise(""))
    imgs = F.when(i % 6 == 0, "").otherwise(
        F.concat(
            F.lit('<img src="/img/'), i.cast("string"), F.lit('.jpg">'),
            F.lit('<img src="https://CDN.Example.COM/pic/'),
            i.cast("string"), F.lit('/">'),
        )
    )
    posted = F.when(i % 7 == 0, "").otherwise(
        F.concat(
            F.lit('<time class="date timeago" datetime="2024-01-'),
            F.lpad((i % 28 + 1).cast("string"), 2, "0"), F.lit("T"),
            F.lpad((i % 24).cast("string"), 2, "0"),
            F.lit(':30:00Z">d</time>'),
        )
    )
    html = F.concat(
        F.lit("<html><title>Unit "), i.cast("string"), F.lit("</title>"),
        price,
        F.lit(" "), (i % 4 + 1).cast("string"), F.lit("br "),
        baths, F.lit("ba "),
        (i % 1500 + 300).cast("string"), F.lit("ft2 "),
        posted,
        imgs,
        F.lit('<a href="/apa/d/u/'), i.cast("string"), F.lit('.html">r</a>'),
        F.lit('<a href="https://Other.Example.COM/x/'), i.cast("string"),
        F.lit('/">a</a>'),
        F.lit('<a href="javascript:void(0)">j</a></html>'),
    )
    base = F.concat(F.lit("https://h"), (i % 7).cast("string"),
                    F.lit(".example.com/search/apa"))
    return d.select("doc_id", html.alias("html"), base.alias("base"))


@register(
    "html_parse_fields_udf",
    oracle="""
    WITH t AS ({html})
    SELECT doc_id,
           regexp_extract(html, '<title[^>]*>([^<]*)</title>', 1) AS title,
           TRY_CAST(NULLIF(replace(
               regexp_extract(html, '\\$\\s*([0-9][0-9,]*)', 1), ',', ''), '')
                AS DOUBLE) AS price,
           CAST(regexp_extract(html, '(\\d+)\\s*br\\b', 1) AS INT) AS beds,
           CAST(regexp_extract(html, '(\\d+(?:\\.\\d+)?)\\s*ba\\b', 1) AS DOUBLE) AS baths,
           CASE WHEN doc_id % 7 = 0 THEN NULL
                ELSE 1704067200000
                     + (doc_id % 28) * 86400000
                     + (doc_id % 24) * 3600000 + 1800000
           END AS posted_ms
    FROM t
    """.format(html=_HTML_SQL),
)
def html_parse_fields_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """parse_page Arrow UDF vs SQL-regexp oracle. NULL price rows (no $
    block) check the C15 null-on-fail contract; posted_ms checks the C10
    ISO-8601 'Z'->+00:00 parse (absent <time> element => NULL), emitted
    as epoch millis so no timestamp formatting is hashed."""
    t = _html_df(spark, sf_dir)
    p = t.select("doc_id", parse_page("html", "base").alias("p"))
    return p.select(
        "doc_id",
        F.col("p.title").alias("title"),
        F.col("p.price").alias("price"),
        F.col("p.beds").alias("beds"),
        F.col("p.baths").alias("baths"),
        F.unix_millis(F.col("p.posted_ts")).alias("posted_ms"),
    )


@register(
    "html_extract_links_udf",
    oracle="""
    WITH t AS ({html}),
    expect AS (
      SELECT doc_id,
             'https://h' || CAST(doc_id % 7 AS VARCHAR)
               || '.example.com/apa/d/u/' || doc_id || '.html' AS url
      FROM t
      UNION ALL
      SELECT doc_id,
             'https://other.example.com/x/' || doc_id AS url
      FROM t
    )
    SELECT doc_id, url FROM expect
    """.format(html=_HTML_SQL),
)
def html_extract_links_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """extract_links UDF (urljoin + host-lowercase + trailing-slash strip
    + javascript: rejection) -> explode; oracle constructs the canonical
    URLs it must produce."""
    t = _html_df(spark, sf_dir)
    return t.select(
        "doc_id", F.explode(extract_links("html", "base")).alias("url")
    )


@register(
    "html_extract_images_udf",
    oracle="""
    WITH t AS ({html}),
    expect AS (
      SELECT doc_id,
             'https://h' || CAST(doc_id % 7 AS VARCHAR)
               || '.example.com/img/' || doc_id || '.jpg' AS image_url
      FROM t WHERE doc_id % 6 <> 0
      UNION ALL
      SELECT doc_id,
             'https://cdn.example.com/pic/' || doc_id AS image_url
      FROM t WHERE doc_id % 6 <> 0
    )
    SELECT doc_id, image_url FROM expect
    """.format(html=_HTML_SQL),
)
def html_extract_images_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H2 (file_storage.py:266-276): <img src> extraction -> canonical
    absolute URLs (relative resolved against base, host lowercased,
    trailing slash stripped) -> explode into page_images rows; pages
    without img tags (doc_id%6==0) contribute nothing."""
    t = _html_df(spark, sf_dir)
    return t.select(
        "doc_id",
        F.explode(extract_image_urls("html", "base")).alias("image_url"),
    )


# ---------------------------------------------------------------------------
# Visible-text extraction (functions/html.py::html_to_text).  The page
# synthesized here carries every boilerplate hazard the operator's
# contract names: a style block, a script block whose BODY CONTAINS
# MARKUP that must never surface (`<div>hidden N</div>`), an HTML
# comment, entities that decode to literal markup (`&lt;tag&gt;` must
# stay text), and whitespace runs.  The oracle reconstructs the expected
# visible text purely from the generating arithmetic — it never applies
# the regexp chain — so any extraction deviation (ordering bugs,
# double-decode, glued words) is a value mismatch.
# ---------------------------------------------------------------------------


@register(
    "html_to_text",
    oracle="""
    SELECT doc_id,
           'Doc ' || doc_id || ' Heading ' || doc_id
           || ' Para one & two <tag> "q" ''s'' end tail '
           || CAST(doc_id % 7 AS VARCHAR) AS text,
           CAST(LENGTH(
             'Doc ' || doc_id || ' Heading ' || doc_id
             || ' Para one & two <tag> "q" ''s'' end tail '
             || CAST(doc_id % 7 AS VARCHAR)) AS BIGINT) AS n_chars
    FROM documents
    """,
)
def html_to_text_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.html import html_to_text

    d = load_table(spark, sf_dir, "documents")
    i = F.col("doc_id").cast("string")
    page = F.concat(
        F.lit("<html><head><title>Doc "), i, F.lit("</title>\n"),
        F.lit("<style>body { color: red; }</style>\n"),
        F.lit('<script type="text/javascript">var x = '), i,
        F.lit("; document.write('<div>hidden "), i,
        F.lit("</div>');</script>\n"),
        F.lit("</head><body>\n<!-- build "), i, F.lit(" -->\n"),
        F.lit("<h1>Heading "), i, F.lit("</h1>\n"),
        F.lit("<p>Para   one &amp; two &lt;tag&gt; &quot;q&quot; "
              "&#39;s&#39;&nbsp;end</p>\n"),
        F.lit("<div>tail "), (F.col("doc_id") % 7).cast("string"),
        F.lit("</div>\n</body></html>"),
    )
    return d.select(
        "doc_id",
        html_to_text(page).alias("text"),
    ).withColumn("n_chars", F.length("text").cast("long"))


# ---------------------------------------------------------------------------
# Anchor-text aggregation per target (functions/html.py::
# anchor_text_pairs): each synthesized page carries three anchors — two
# modular targets (one with a generic "click here" on even pages) and a
# hub link — and the query aggregates the classic ranking signal per
# TARGET: how many pages link here, with how many distinct anchor
# texts, and which text dominates (count desc, text asc — exact
# integer/string ordering).  The oracle reconstructs the (dst, text)
# tuples arithmetically and aggregates in SQL — the regexp extraction
# and zip alignment are what the hash check proves.
# ---------------------------------------------------------------------------


@register(
    "anchor_text_agg",
    oracle="""
    WITH n AS (SELECT COUNT(*) AS n FROM documents),
    pairs AS (
      SELECT (doc_id * 3 + 1) % (SELECT n FROM n) AS dst,
             'unit ' || CAST((doc_id * 3 + 1) % (SELECT n FROM n)
                             AS VARCHAR) AS text
      FROM documents
      UNION ALL
      SELECT (doc_id * 5 + 2) % (SELECT n FROM n),
             CASE WHEN doc_id % 2 = 0 THEN 'click here'
                  ELSE 'unit ' || CAST((doc_id * 5 + 2) % (SELECT n FROM n)
                                       AS VARCHAR) END
      FROM documents
      UNION ALL
      SELECT doc_id % 50, 'home' FROM documents
    ), agg AS (
      SELECT dst, text, CAST(COUNT(*) AS BIGINT) AS c
      FROM pairs GROUP BY dst, text
    ), ranked AS (
      SELECT dst, text, c,
             ROW_NUMBER() OVER (PARTITION BY dst
                                ORDER BY c DESC, text ASC) AS rn,
             CAST(SUM(c) OVER (PARTITION BY dst) AS BIGINT) AS n_anchors,
             CAST(COUNT(*) OVER (PARTITION BY dst) AS BIGINT)
               AS n_unique_texts
      FROM agg
    )
    SELECT '/p/' || CAST(dst AS VARCHAR) AS target,
           n_anchors, n_unique_texts, text AS top_text
    FROM ranked WHERE rn = 1
    """,
)
def anchor_text_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.html import anchor_text_pairs

    d = load_table(spark, sf_dir, "documents")
    n = d.count()  # bounded driver-side scalar (link-target modulus)
    i = F.col("doc_id")
    d1 = (i * 3 + 1) % n
    d2 = (i * 5 + 2) % n
    t2 = F.when(i % 2 == 0, F.lit("click here")).otherwise(
        F.concat(F.lit("unit "), d2.cast("string")))
    page = F.concat(
        F.lit('<html><body><p>See <a class="l" href="/p/'),
        d1.cast("string"), F.lit('">unit '), d1.cast("string"),
        F.lit('</a> and <A HREF="/p/'), d2.cast("string"),
        F.lit('" rel="x">'), t2, F.lit("</a>.</p>"),
        F.lit('<a href="/p/'), (i % 50).cast("string"),
        F.lit('">home</a></body></html>'),
    )
    pairs = d.select(
        F.explode(anchor_text_pairs(page)).alias("pr")
    ).select(F.col("pr.href").alias("href"), F.col("pr.text").alias("text"))
    agg = pairs.groupBy("href", "text").agg(
        F.count("*").cast("long").alias("c"))
    w = W.partitionBy("href")
    ranked = agg.select(
        "href", "text", "c",
        F.row_number().over(
            w.orderBy(F.col("c").desc(), F.col("text").asc())).alias("rn"),
        F.sum("c").over(w).cast("long").alias("n_anchors"),
        F.count("*").over(w).cast("long").alias("n_unique_texts"),
    )
    return ranked.where(F.col("rn") == 1).select(
        F.col("href").alias("target"),
        "n_anchors", "n_unique_texts",
        F.col("text").alias("top_text"),
    )
