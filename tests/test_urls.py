"""Canonicalizer semantics vs the reference's link_extractor.py:85-120 /
html_downloader.py:292-327 behavior: urljoin resolution, fragment drop,
host lowercasing, trailing-slash strip, scheme/IP/length rejection."""

from __future__ import annotations

from pyspark.sql import functions as F

from crawler_spark.functions.urls import (
    _canon_one,
    canonicalize,
    canonicalize_native,
    url_hash64,
)

BASE = "https://sf.craigslist.org/search/apa?page=2"

CASES = [
    # (base, href, expected)
    (BASE, "/apa/d/x/123.html", "https://sf.craigslist.org/apa/d/x/123.html"),
    (BASE, "https://SF.Craigslist.ORG/About/", "https://sf.craigslist.org/About"),
    (BASE, "item.html#photos", "https://sf.craigslist.org/search/item.html"),
    (BASE, "//cdn.example.com/a", "https://cdn.example.com/a"),
    (BASE, "relative/path/", "https://sf.craigslist.org/search/relative/path"),
    (BASE, "https://example.com:443/x", "https://example.com/x"),
    (BASE, "http://example.com:80/x", "http://example.com/x"),
    (BASE, "https://example.com:8443/x", "https://example.com:8443/x"),
    (BASE, "https://example.com/", "https://example.com/"),
    (None, "https://example.com/a?q=1#frag", "https://example.com/a?q=1"),
    # rejects
    (BASE, "javascript:alert(1)", None),
    (BASE, "data:text/html;base64,AAAA", None),
    (BASE, "mailto:x@example.com", None),
    (BASE, "ftp://example.com/f", None),
    (BASE, "https://192.168.1.1/admin", None),
    (BASE, "https://127.0.0.1/x", None),
    (BASE, "https://10.0.0.5:8080/x", None),
    (BASE, "https://169.254.1.1/x", None),
    (BASE, "https://8.8.8.8/x", "https://8.8.8.8/x"),  # public IP ok
    (BASE, "https://example.com/../../etc/passwd", None),
    (BASE, "x" * 3000, None),
    (BASE, "", None),
    (BASE, None, None),
]


def test_canon_one_cases():
    for base, href, want in CASES:
        assert _canon_one(base, href) == want, (base, href)


def test_pandas_udf_matches_scalar(spark):
    rows = [(b, h) for b, h, _ in CASES]
    df = spark.createDataFrame(rows, "base string, href string")
    got = [
        r["c"] for r in
        df.select(canonicalize("base", "href").alias("c")).collect()
    ]
    assert got == [w for _, _, w in CASES]


def test_native_subset_agrees_with_udf(spark):
    """For absolute http(s) URLs without dot-dot, the native expression and
    the UDF produce the same canonical form."""
    urls = [
        "HTTPS://Example.COM/Path/Sub/",
        "https://example.com/a#frag",
        "https://example.com/a//",
        "https://h3.synth.test/apa/d/item-7/7.html",
        "https://example.com/x?q=1#f",
        # ADVICE round-1 divergence cases: all-slash path, and a
        # trailing-slash path followed by a query
        "https://example.com//",
        "https://example.com///",
        "https://example.com/",
        "https://example.com/p/?q=1",
        "https://example.com/p//?q=1&r=2",
        "http://example.com",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    both = df.select(
        canonicalize_native(F.col("url")).alias("native"),
        canonicalize(F.lit(None), F.col("url")).alias("udf"),
    ).collect()
    for r in both:
        assert r["native"] == r["udf"], r


def test_url_hash64_is_native_and_stable(spark):
    df = spark.createDataFrame([("https://a.example/x",)], "url string")
    v1 = df.select(url_hash64(F.col("url")).alias("h")).collect()[0]["h"]
    v2 = df.select(F.xxhash64("url").alias("h")).collect()[0]["h"]
    assert v1 == v2 and isinstance(v1, int)


def test_canonicalize_rejects_bad_ports():
    assert _canon_one(None, "https://example.com:99999/x") is None
    assert _canon_one(None, "https://example.com:8o8/x") is None


def test_property_id_from_url(spark):
    """file_storage.py:244 semantics: last numeric token before .html;
    NULL (not an exception) when absent."""
    from pyspark.sql import functions as F

    from crawler_spark.functions.urls import property_id_from_url

    rows = spark.createDataFrame(
        [("https://h3.synth.test/apa/d/item-42/42.html",),
         ("https://h3.synth.test/apa/d/item-42/9001.html",),
         ("https://h0.synth.test/search/apa?p=7",),
         # unanchored like the reference: '.htmlx' still matches
         # (re.search(r"/(\\d+)\\.html", ...) has no '$')
         ("https://x.test/a/123.htmlx",)],
        "url string",
    )
    got = [r["pid"] for r in rows.select(
        property_id_from_url(F.col("url")).alias("pid")).collect()]
    assert got == [42, 9001, None, 123]
