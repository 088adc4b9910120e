"""HTML parsing — vectorized Arrow UDFs (SURVEY.md H1/H2/H3, C6-C11).

Reference: link_extractor.py:22-83 (anchor extraction + normalization),
file_storage.py:266-276 (image URLs), craigslist_parser.py:11-197 (the
11-field property parse). The reference walks BeautifulSoup per row; here
each UDF is one Python call per Arrow batch, regex-compiled once, and the
array<string> results feed native ``explode`` + ``dropDuplicates`` —
the UDTF shape of SURVEY.md M.
"""

from __future__ import annotations

import re
from datetime import datetime, timezone

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from .urls import _canon_one

_A_HREF = re.compile(r"""<a\s[^>]*?href\s*=\s*["']([^"'>]+)["']""", re.I)
_IMG_SRC = re.compile(r"""<img\s[^>]*?src\s*=\s*["']([^"'>]+)["']""", re.I)

_TITLE = re.compile(r"<title[^>]*>([^<]*)</title>", re.I)
_PRICE = re.compile(r"\$\s*([0-9][0-9,]*)")
_BEDS = re.compile(r"(\d+)\s*br\b", re.I)
_BATHS = re.compile(r"(\d+(?:\.\d+)?)\s*ba\b", re.I)
_SQFT = re.compile(r"([0-9][0-9,]*)\s*ft[²2]", re.I)
_LAT = re.compile(r'data-latitude="([^"]+)"')
_LON = re.compile(r'data-longitude="([^"]+)"')
_POSTED = re.compile(r'<time[^>]*datetime="([^"]+)"', re.I)

PARSE_SCHEMA = (
    "title string, price double, beds int, baths double, sqft int, "
    "latitude double, longitude double, property_type string, "
    "posted_ts timestamp"
)  # price: double here, cast('decimal(12,2)') natively at the sink (§1.2)


def _posted_date(html: str):
    """ISO-8601 posted date with 'Z' -> '+00:00' (C10, reference
    craigslist_parser.py:171-186), null-on-fail; returned as naive UTC
    (session tz is pinned UTC, so the epoch is exact)."""
    m = _POSTED.search(html)
    if not m:
        return None
    try:
        dt = datetime.fromisoformat(m.group(1).replace("Z", "+00:00"))
    except ValueError:
        return None
    if dt.tzinfo is not None:
        dt = dt.astimezone(timezone.utc).replace(tzinfo=None)
    return dt


def _links_of(html: str | None, base: str | None, pattern: re.Pattern) -> list[str]:
    if not html:
        return []
    out: list[str] = []
    seen: set[str] = set()
    for href in pattern.findall(html):
        u = _canon_one(base, href)
        if u is not None and u not in seen:   # per-page set() semantics (D4)
            seen.add(u)
            out.append(u)
    return out


def _mk_array_udf(pattern: re.Pattern):
    def fn(html: pd.Series, base: pd.Series) -> pd.Series:
        return pd.Series(
            [_links_of(h, b, pattern) for h, b in zip(html, base)],
            dtype="object",
        )
    return fn


_extract_links_udf = None
_extract_images_udf = None
_parse_page_udf = None


def extract_links(html, base) -> Column:
    """HTML -> array of canonical absolute <a href> URLs (H1)."""
    global _extract_links_udf
    if _extract_links_udf is None:
        _extract_links_udf = pandas_udf(_mk_array_udf(_A_HREF), "array<string>")
    return _extract_links_udf(html, base)


def extract_image_urls(html, base) -> Column:
    """HTML -> deduped absolute <img src> URLs (H2)."""
    global _extract_images_udf
    if _extract_images_udf is None:
        _extract_images_udf = pandas_udf(_mk_array_udf(_IMG_SRC), "array<string>")
    return _extract_images_udf(html, base)


def _num(pattern: re.Pattern, s: str, cast, strip_commas: bool = False):
    m = pattern.search(s)
    if not m:
        return None
    try:
        v = m.group(1)
        return cast(v.replace(",", "") if strip_commas else v)
    except (ValueError, ArithmeticError):
        return None  # C15 null-on-fail cast semantics


def _parse_one(html: str | None, url: str | None) -> tuple:
    if not html:
        return (None,) * 9
    t = _TITLE.search(html)
    ptype = None
    if url:
        if "apa" in url:
            ptype = "apartment"
        elif "rea" in url:
            ptype = "real estate"
    return (
        t.group(1).strip() if t else None,
        _num(_PRICE, html, float, strip_commas=True),
        _num(_BEDS, html, int),
        _num(_BATHS, html, float),
        _num(_SQFT, html, int, strip_commas=True),
        _num(_LAT, html, float),
        _num(_LON, html, float),
        ptype,
        _posted_date(html),
    )


def parse_page(html, url) -> Column:
    """One vectorized parser for the 11-field property struct (H3/C6-C11);
    returns a struct column — select("p.*") to flatten."""
    global _parse_page_udf
    if _parse_page_udf is None:
        def fn(h: pd.Series, u: pd.Series) -> pd.DataFrame:
            rows = [_parse_one(a, b) for a, b in zip(h, u)]
            return pd.DataFrame(
                rows,
                columns=["title", "price", "beds", "baths", "sqft",
                         "latitude", "longitude", "property_type",
                         "posted_ts"],
            )
        _parse_page_udf = pandas_udf(fn, PARSE_SCHEMA)
    return _parse_page_udf(html, url)


def html_to_text(html: Column) -> Column:
    """Visible-text extraction from raw HTML (the boilerplate-removal
    step every training-data pipeline runs between crawl and curation;
    trafilatura/jusText do this with DOM heuristics — this is the exact,
    deterministic core: script/style/comment removal, tag stripping,
    minimal entity decoding, whitespace collapse).

    Pure native regexp_replace chain — codegen'd, zero Python, zero
    shuffles: scan-speed over 10^10 pages.  Order matters and is part of
    the contract:

    1. ``<script>``/``<style>`` blocks go FIRST (their contents are not
       text, and may contain markup that must never surface);
    2. comments, then all remaining tags, each replaced by a space
       (block boundaries must not glue words together);
    3. entities decode AFTER tag stripping so a decoded ``&lt;tag&gt;``
       stays literal text (decoding first would re-introduce strippable
       markup — the classic double-decode bug); ``&amp;`` decodes last
       for the same reason;
    4. whitespace-run collapse + trim.

    Reference analogue: the crawler stores raw HTML and parses fields
    only (file_storage/parsers); it has no text-extraction surface.
    """
    t = F.regexp_replace(html, r"(?is)<script\b[^>]*>.*?</script>", " ")
    t = F.regexp_replace(t, r"(?is)<style\b[^>]*>.*?</style>", " ")
    t = F.regexp_replace(t, r"(?s)<!--.*?-->", " ")
    t = F.regexp_replace(t, r"<[^>]+>", " ")
    for ent, ch in (("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
                    ("&#39;", "'"), ("&nbsp;", " "), ("&amp;", "&")):
        t = F.replace(t, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(t, r"\s+", " "))


def anchor_text_pairs(html: Column) -> Column:
    """(href, anchor_text) pairs from raw HTML as a zipped array — the
    anchor-text signal search/crawl rankers aggregate per TARGET page
    (it describes the target, not the page it sits on).

    Native trick: ``regexp_extract_all`` returns one group per call, so
    the same pattern runs twice (group 1 = href, group 2 = text) and
    ``arrays_zip`` aligns them — identical pattern, identical match
    order, so the zip is positionally exact.  Zero Python; explode the
    result and aggregate per href.  Matches only simple textual anchors
    (``<a ... href="X" ...>TEXT</a>`` with tag-free TEXT) — nested
    markup anchors are the UDF extractor's job (extract_links); rankers
    want the plain-text ones anyway.
    """
    pat = r'(?is)<a\s[^>]*href="([^"]*)"[^>]*>([^<]*)</a>'
    return F.arrays_zip(
        F.regexp_extract_all(html, F.lit(pat), F.lit(1)).alias("href"),
        F.regexp_extract_all(html, F.lit(pat), F.lit(2)).alias("text"),
    )
