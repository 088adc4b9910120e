"""HTML extraction/parse UDFs: link/image extraction with canonicalization
and per-page set semantics; 8-field property parse with null-on-fail."""

from __future__ import annotations

from pyspark.sql import functions as F

from crawler_spark.functions.html import (
    extract_links,
    extract_image_urls,
    parse_page,
)

PAGE = """
<html><head><title> 2br Sunny Flat </title></head><body>
<a href="/apa/d/x/111.html">one</a>
<a HREF='https://SF.Craigslist.ORG/apa/d/y/222.html#pic'>two</a>
<a href="/apa/d/x/111.html">dup</a>
<a href="javascript:void(0)">bad</a>
<a href="mailto:a@b.c">bad2</a>
<img src="/img/a.jpg"><img src='https://cdn.x.com/b.png'><img src="/img/a.jpg">
<span>$1,250 2br 1.5ba 850ft2</span>
<div data-latitude="37.77" data-longitude="-122.42"></div>
</body></html>
"""
BASE = "https://sf.craigslist.org/search/apa"


def test_extract_links_canonical_set(spark):
    df = spark.createDataFrame([(PAGE, BASE)], "html string, base string")
    links = df.select(extract_links("html", "base").alias("ls")).collect()[0]["ls"]
    assert links == [
        "https://sf.craigslist.org/apa/d/x/111.html",
        "https://sf.craigslist.org/apa/d/y/222.html",
    ]


def test_extract_images(spark):
    df = spark.createDataFrame([(PAGE, BASE)], "html string, base string")
    imgs = df.select(extract_image_urls("html", "base").alias("im")).collect()[0]["im"]
    assert imgs == [
        "https://sf.craigslist.org/img/a.jpg",
        "https://cdn.x.com/b.png",
    ]


def test_parse_page_fields(spark):
    df = spark.createDataFrame(
        [(PAGE, "https://sf.craigslist.org/apa/d/x/111.html"),
         ("<html>no fields</html>", "https://x.org/rea/1.html"),
         (None, None)],
        "html string, url string",
    )
    rows = df.select(parse_page("html", "url").alias("p")).select("p.*").collect()
    r = rows[0]
    assert r["title"] == "2br Sunny Flat"
    assert r["price"] == 1250.0
    assert r["beds"] == 2 and r["baths"] == 1.5 and r["sqft"] == 850
    assert r["latitude"] == 37.77 and r["longitude"] == -122.42
    assert r["property_type"] == "apartment"
    assert rows[1]["price"] is None and rows[1]["property_type"] == "real estate"
    assert all(v is None for v in rows[2].asDict().values())


def test_parse_page_posted_date(spark):
    """C10: ISO-8601 posted date, 'Z'->+00:00 (craigslist_parser.py:171-186);
    offset forms, invalid strings (null-on-fail), and absence."""
    cases = [
        ('<html><time class="date timeago" datetime="2024-03-05T14:30:00Z">x</time></html>',
         "2024-03-05 14:30:00"),
        ('<html><time datetime="2024-03-05T14:30:00+02:00">x</time></html>',
         "2024-03-05 12:30:00"),  # normalized to UTC
        ('<html><time datetime="not-a-date">x</time></html>', None),
        ("<html>no time element</html>", None),
    ]
    df = spark.createDataFrame(
        [(h, "https://x.org/apa/1.html") for h, _ in cases],
        "html string, url string",
    )
    rows = (
        df.select(parse_page("html", "url").alias("p"))
        .select(F.date_format("p.posted_ts", "yyyy-MM-dd HH:mm:ss").alias("t"))
        .collect()
    )
    assert [r["t"] for r in rows] == [want for _, want in cases]


def test_explode_pipeline_shape(spark):
    """H1 UDTF shape: UDF -> explode -> dropDuplicates, all lazily planned."""
    df = spark.createDataFrame([(PAGE, BASE), (PAGE, BASE)],
                               "html string, base string")
    out = (
        df.select(F.explode(extract_links("html", "base")).alias("url"))
        .dropDuplicates(["url"])
    )
    assert out.count() == 2


def test_html_to_text_edges(spark):
    from crawler_spark.functions.html import html_to_text

    rows = spark.createDataFrame(
        [
            # double-encoded entity stays ONE level decoded (no
            # double-decode: &amp;lt; -> &lt;, never <)
            (1, "a &amp;lt;b&amp;gt; c"),
            # script body markup never surfaces; style stripped;
            # tags become spaces so words don't glue
            (2, "<p>x</p><script>y = '<div>no</div>';</script>"
                "<style>.a{}</style><b>z</b>"),
            # comment with markup inside; whitespace runs collapse
            (3, "a <!-- <b>gone</b> -->   b\n\tc"),
            # entity-decoded markup stays literal text
            (4, "&lt;script&gt;alert(1)&lt;/script&gt;"),
        ],
        "id int, html string",
    )
    out = {r["id"]: r["t"] for r in rows.select(
        "id", html_to_text(F.col("html")).alias("t")).collect()}
    assert out[1] == "a &lt;b&gt; c"
    assert out[2] == "x z"
    assert out[3] == "a b c"
    assert out[4] == "<script>alert(1)</script>"


def test_html_to_text_plan_native(spark):
    from crawler_spark.functions.html import html_to_text

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    df = d.select(html_to_text(F.col("text")).alias("t"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Exchange" not in plan


def test_anchor_text_pairs_edges(spark):
    from crawler_spark.functions.html import anchor_text_pairs

    rows = spark.createDataFrame(
        [
            # mixed case, attr after href, empty text, nested-markup
            # anchor excluded (text has a tag)
            (1, '<A HREF="/a" rel="x">T</a><a href="/b"></a>'
                '<a href="/c"><b>no</b></a>'),
            (2, "no anchors here"),
        ],
        "id int, html string",
    )
    out = rows.select(
        "id", anchor_text_pairs(F.col("html")).alias("p")).collect()
    byid = {r["id"]: [(e["href"], e["text"]) for e in r["p"]] for r in out}
    assert byid[1] == [("/a", "T"), ("/b", "")]
    assert byid[2] == []


# ---------------------------------------------------------------------------
# Property: html_to_text (Java regex, codegen) agrees with a pure-Python
# reference of the SAME chain over adversarial markup soup.  Alphabet is
# ASCII (+ \t\n): the operator's contract is Java \s semantics — exotic
# Unicode whitespace classes differ between engines and are out of
# contract (the oracle reconstructs expected text, it never regexes).
# ---------------------------------------------------------------------------

import re as _re

from hypothesis import given, settings, strategies as st

_FRAGS = st.sampled_from([
    "<script>", "</script>", "<script a='b'>", "<style>", "</style>",
    "<!--", "-->", "<b>", "</b>", "<", ">", "&amp;", "&lt;", "&gt;",
    "&quot;", "&#39;", "&nbsp;", "&amp;lt;", "word", "x y", " ", "\n",
    "\t", "a<b", "4>3", "<a href=\"u\">t</a>", "scripty", "=",
])
_SOUP = st.lists(_FRAGS, min_size=0, max_size=30).map("".join)


def _ref_html_to_text(h: str) -> str:
    t = _re.sub(r"(?is)<script\b[^>]*>.*?</script>", " ", h)
    t = _re.sub(r"(?is)<style\b[^>]*>.*?</style>", " ", t)
    t = _re.sub(r"(?s)<!--.*?-->", " ", t)
    t = _re.sub(r"<[^>]+>", " ", t)
    for ent, ch in (("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
                    ("&#39;", "'"), ("&nbsp;", " "), ("&amp;", "&")):
        t = t.replace(ent, ch)
    return _re.sub(r"\s+", " ", t).strip(" ")


@settings(max_examples=10, deadline=None)
@given(soups=st.lists(_SOUP, min_size=5, max_size=20))
def test_html_to_text_matches_python_reference(spark, soups):
    from crawler_spark.functions.html import html_to_text

    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(soups)], "id int, html string")
    got = {r["id"]: r["t"] for r in df.select(
        "id", html_to_text(F.col("html")).alias("t")).collect()}
    for i, s in enumerate(soups):
        assert got[i] == _ref_html_to_text(s), repr(s)
