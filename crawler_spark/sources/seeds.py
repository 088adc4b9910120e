"""Seed-list sources: every format a crawl operator hands us.

The reference takes seeds from ``config.json`` (``master.py:66``,
``config.json:2-3``) and a generator script (``add_seeds.py:44-47``);
operationally seed lists also arrive as plain-text URL files, CSV
exports, or JSON lines. This module normalizes all of them to the one
shape the engine's enqueue path takes — ``(url string)`` rows — with
the same hygiene regardless of format: comment/blank stripping (text),
whitespace trim, in-file dedupe. Parsing stays JVM-native
(``spark.read`` + column ops); at 10^8 seed URLs the read is
partition-parallel and nothing touches the driver.

Formats:
  text    one URL per line; '#' comments and blank lines ignored
  csv     header row with a ``url`` column (extra columns ignored)
  json    JSON-lines with a ``url`` field (extra fields ignored)
  parquet a ``url`` column (the streaming seed-inbox format, rounds.py)

``read_seed_files(..., fmt=None)`` infers from the file suffix.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_SUFFIX = {
    ".txt": "text", ".urls": "text", ".lst": "text",
    ".csv": "csv",
    ".json": "json", ".jsonl": "json", ".ndjson": "json",
    ".parquet": "parquet",
}


def _infer(path: str) -> str:
    ext = os.path.splitext(path.rstrip("/"))[1].lower()
    if ext in _SUFFIX:
        return _SUFFIX[ext]
    raise ValueError(
        f"cannot infer seed format from {path!r}; pass fmt= one of "
        "text|csv|json|parquet")


def read_seed_files(
    spark: SparkSession, path: str, fmt: str | None = None
) -> DataFrame:
    """Read a seed list (file or directory) into deduplicated
    ``(url string)`` rows, ready for ``enqueue``/``init_crawl``."""
    fmt = fmt or _infer(path)
    if fmt == "text":
        raw = spark.read.text(path)
        urls = (
            raw.select(F.trim(F.col("value")).alias("url"))
            .where((F.col("url") != "") & ~F.col("url").startswith("#"))
        )
    elif fmt == "csv":
        urls = spark.read.option("header", "true").csv(path).select(
            F.trim(F.col("url")).alias("url"))
    elif fmt == "json":
        urls = spark.read.json(path).select(
            F.trim(F.col("url")).alias("url"))
    elif fmt == "parquet":
        urls = spark.read.parquet(path).select(
            F.trim(F.col("url")).alias("url"))
    else:
        raise ValueError(f"unknown seed format {fmt!r}")
    return urls.where(F.col("url").isNotNull()).dropDuplicates(["url"])


def seeds_from_sitemaps(robots_bodies: DataFrame,
                        txt_col: str = "robots_txt") -> DataFrame:
    """Sitemap URLs discovered in robots.txt bodies, normalized to the
    same deduplicated ``(url string)`` seed shape as every other source
    — union with ``read_seed_files`` output and feed ``enqueue``.  The
    standard crawl bootstrap: fetch robots first, seed the frontier
    with the sitemaps it advertises (functions/robots.py::
    extract_sitemaps does the extraction natively)."""
    from ..functions.robots import extract_sitemaps

    if "host_id" not in robots_bodies.columns:
        robots_bodies = robots_bodies.withColumn(
            "host_id", F.monotonically_increasing_id())
    return (
        extract_sitemaps(robots_bodies, "host_id", txt_col)
        .select(F.trim(F.col("sitemap_url")).alias("url"))
        .where(F.col("url") != "")
        .distinct()
    )
