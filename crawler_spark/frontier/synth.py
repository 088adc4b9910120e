"""Deterministic synthetic web graph — built entirely from ``spark.range``
with native expressions (no RNG, no driver-side materialization), so the
same generator that makes a 5k-page test web makes a 10^10-page one: cost
is linear in N and fully partition-parallel.

Formulas are frozen in spec.py; the pure-Python simulator and the DuckDB
oracle SQL rebuild identical values from the same integer page ids.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import spec


def web_graph(
    spark: SparkSession,
    n_pages: int,
    n_hosts: int = spec.N_HOSTS,
    partitions: int | None = None,
) -> DataFrame:
    """The synthetic web: one row per page.

    Columns: page_id long, host_id int, kind string, url string,
    status int, outlinks array<string>, image_id long,
    headers map<string,string>.

    Replaces the reference's live HTTP fetch (html_downloader.py:135-253):
    a fetch is a join against this table (SURVEY.md J7). ``headers``
    models the response-header metadata the reference persists as JSONB /
    nested document (database_service.py:62, content_storage.py:102-119)
    — deterministic values so oracles can reconstruct them.
    """
    df = spark.range(0, n_pages, numPartitions=partitions or spark.sparkContext.defaultParallelism)
    p = F.col("id")
    is_listing = p % 10 == 0
    host = spec.host_id_of_page(p, n_hosts)
    url = spec.url_of(p, host, is_listing)
    status = F.when(p % spec.FAIL_MOD == spec.FAIL_REM, 503).otherwise(200).cast("int")

    # outlinks: child(p,i) = (p*31 + i*17 + 1) % N, i < outdegree(kind)
    outdeg = F.when(is_listing, spec.LISTING_OUTDEG).otherwise(spec.PROPERTY_OUTDEG)
    child = lambda i: (p * 31 + i * 17 + 1) % n_pages  # noqa: E731
    child_url = lambda i: spec.url_of(  # noqa: E731
        child(i),
        spec.host_id_of_page(child(i), n_hosts),
        child(i) % 10 == 0,
    )
    outlinks = F.transform(F.sequence(F.lit(0), outdeg - 1), lambda i: child_url(i))

    headers = F.create_map(
        F.lit("content-type"),
        F.when(is_listing, "text/html").otherwise("text/html; charset=utf-8"),
        F.lit("server"),
        F.concat(F.lit("synth/"), (host % 3).cast("string")),
        F.lit("content-length"),
        (1000 + p % 5000).cast("string"),
    )

    return df.select(
        p.alias("page_id"),
        host.alias("host_id"),
        F.when(is_listing, "listing").otherwise("property").alias("kind"),
        url.alias("url"),
        status.alias("status"),
        outlinks.alias("outlinks"),
        F.when(~is_listing, p).alias("image_id"),
        headers.alias("headers"),
    )


def robots_dim(spark: SparkSession, n_hosts: int = spec.N_HOSTS) -> DataFrame:
    """Robots dimension: one row per host WITH a rule (missing => allowed
    at full budget, matching robots_checker.py:118-120 allow-by-default).
    Carries the disallow substring and the crawl_delay. Tiny — always
    broadcast at join sites."""
    h = F.col("id").cast("int")
    disallow = F.when(
        h % spec.ROBOTS_MOD == spec.ROBOTS_REM, spec.ROBOTS_DISALLOW
    )
    delay = (
        F.when(h % spec.DELAY_MOD == spec.DELAY2_REM, 2)
        .when(h % spec.DELAY_MOD == spec.DELAY4_REM, 4)
        .otherwise(1)
        .cast("int")
    )
    return (
        spark.range(0, n_hosts)
        .select(h.alias("host_id"), disallow.alias("disallow"),
                delay.alias("crawl_delay"))
        .where(F.col("disallow").isNotNull() | (F.col("crawl_delay") > 1))
    )


def seed_urls(
    spark: SparkSession,
    n_pages: int,
    n_seeds: int,
    n_hosts: int = spec.N_HOSTS,
) -> DataFrame:
    """Seed list: the first ``n_seeds`` listing pages (page ids 0,10,20,...).

    Mirrors master.py:66 seed dispatch; returns bare (url) rows — the
    engine's enqueue path assigns priority and applies robots/dedupe.
    """
    df = spark.range(0, n_seeds).select((F.col("id") * 10 % n_pages).alias("p"))
    p = F.col("p")
    host = spec.host_id_of_page(p, n_hosts)
    # kind derives from the wrapped page id: when n_pages is not a
    # multiple of 10 a seed can land on a property page, and the URL must
    # be that page's real URL (else it joins nothing in the web table and
    # diverges from the simulator/oracle).
    return df.select(spec.url_of(p, host, p % 10 == 0).alias("url")).distinct()
