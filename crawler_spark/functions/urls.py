"""URL canonicalization + hashing — the vectorized Arrow UDF surface
(SURVEY.md C1/C2/M; reference semantics: link_extractor.py:85-120 resolve/
normalize, html_downloader.py:292-327 validity incl. private-IP rejection).

`canonicalize(base, href)` is a scalar pandas UDF: Arrow-batched, one
Python call per ~10k rows, urllib.parse inside (RFC 3986). Everything that
CAN be native stays native (`canonicalize_native` covers already-absolute
URLs with regexp/lower only — whole-stage codegen) — the UDF is for the
relative-href resolution the reference needs at parse time.
"""

from __future__ import annotations

import ipaddress
from urllib.parse import urljoin, urlsplit, urlunsplit

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

MAX_LEN = 2048
_BAD_SCHEMES = ("javascript", "data", "file", "mailto", "vbscript")
_DEFAULT_PORTS = {"http": 80, "https": 443}


def _canon_one(base: str | None, href: str | None) -> str | None:
    if href is None:
        return None
    href = href.strip()
    if not href or len(href) > MAX_LEN:
        return None
    low = href.lower()
    for s in _BAD_SCHEMES:
        if low.startswith(s + ":"):
            return None
    try:
        absolute = urljoin(base, href) if base else href
        parts = urlsplit(absolute)
        port = parts.port  # raises ValueError on ':99999' / ':8o8' ports
    except ValueError:
        return None
    scheme = parts.scheme.lower()
    if scheme not in ("http", "https"):
        return None
    host = (parts.hostname or "").lower()
    if not host or ".." in absolute:
        return None
    # private / loopback / link-local IP rejection (html_downloader.py:320-327)
    try:
        ip = ipaddress.ip_address(host)
        if ip.is_private or ip.is_loopback or ip.is_link_local:
            return None
    except ValueError:
        pass  # not an IP literal
    netloc = host
    if port is not None and port != _DEFAULT_PORTS.get(scheme):
        netloc = f"{host}:{port}"
    path = parts.path or ""
    if path.endswith("/") and path != "/":
        path = path.rstrip("/")
    out = urlunsplit((scheme, netloc, path, parts.query, ""))  # fragment dropped
    return out if len(out) <= MAX_LEN else None


def _canon_series(base: pd.Series, href: pd.Series) -> pd.Series:
    return pd.Series(
        [_canon_one(b, h) for b, h in zip(base, href)], dtype="object"
    )


_canon_udf = None  # created lazily: pandas_udf needs an active session


def canonicalize(base, href) -> Column:
    """Vectorized canonicalizer: resolve href against base, normalize,
    return null for invalid/blocked URLs (null filters downstream)."""
    global _canon_udf
    if _canon_udf is None:
        _canon_udf = pandas_udf(_canon_series, "string")
    return _canon_udf(base, href)


def canonicalize_native(url: Column) -> Column:
    """Catalyst-native subset for already-absolute URLs: drop fragment,
    lowercase scheme+host, strip ALL trailing slashes off a non-root path
    (matching `_canon_one`'s rstrip). NOT handled here (use the UDF when
    these can occur): base-href resolution, default-port stripping,
    userinfo, private-IP / scheme rejection — mixing the two paths on such
    URLs would defeat dedupe, so route any one corpus through one path."""
    u = F.regexp_replace(url, r"#.*$", "")
    rest = F.regexp_replace(u, r"^[A-Za-z]+://[^/?#]+", "")
    path = F.regexp_extract(rest, r"^([^?]*)", 1)
    query = F.regexp_extract(rest, r"(\?.*)$", 1)  # '' when absent
    # rstrip('/') on the PATH only, keeping a bare root '/' — exactly
    # _canon_one's rule (so 'https://x.com//' -> 'https://x.com' and
    # '/p/?q' -> '/p?q', both of which a whole-rest regex got wrong).
    path = F.when(path == "/", F.lit("/")).otherwise(
        F.regexp_replace(path, r"/+$", "")
    )
    return F.concat(
        F.lower(F.regexp_extract(u, r"^([A-Za-z]+)://", 1)),
        F.lit("://"),
        F.lower(F.regexp_extract(u, r"^[A-Za-z]+://([^/?#]+)", 1)),
        path,
        query,
    )


def url_hash64(url: Column) -> Column:
    """64-bit frontier key (C2): xxhash64 — native, codegen, seed 42."""
    return F.xxhash64(url)


def property_id_from_url(url: Column) -> Column:
    """The trailing numeric token of a property-page URL
    (file_storage.py:244-251: ``re.search(r"/(\\d+)\\.html", url)``),
    used by the reference to key the content-store directory layout.
    Native regexp, codegen; NULL when absent (C15 null-on-fail — the
    reference raises, which in a DataFrame pipeline is a poison row)."""
    v = F.regexp_extract(url, r"/(\d+)\.html", 1)
    return F.when(v == "", None).otherwise(v.cast("long"))
