"""Bucketed-table fetch join — the shuffle-free production path when the
fetch batch outgrows broadcast (10^6+ active hosts at high k).

``run_round`` broadcasts the bounded batch against the web/content table
(engine.py step 3). That is the right plan while the batch fits in memory;
past that, the documented fallback is co-located bucketing: persist BOTH
the content table and the frontier state bucketed by ``url`` with the same
bucket count, and every round's fetch join (and the seen anti-join, which
shares the key) runs as a zero-Exchange sort-merge join — each task reads
bucket i of both sides. On Iceberg this is ``bucket(N, url)`` partition
transforms + storage-partitioned joins; offline it is Spark's native
bucketed tables, which is what this module implements and the plan test
asserts (tests/test_bucketed_join.py: no Exchange above either scan).

One-time cost: one shuffle each to lay the tables out. Amortization: every
subsequent round joins shuffle-free — at 10^10 URLs the web table never
moves again.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

DEFAULT_BUCKETS = 64


def write_bucketed(
    df: DataFrame,
    table: str,
    buckets: int = DEFAULT_BUCKETS,
    key: str = "url",
) -> None:
    """Persist ``df`` as a managed table bucketed+sorted by ``key``.
    Sorting within buckets lets the sort-merge join skip its sort too."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    # a previous session may have left the managed location behind without
    # its metastore entry; saveAsTable refuses to adopt it
    import shutil
    from urllib.parse import urlparse

    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir", "")).path
    if wh:
        shutil.rmtree(f"{wh.rstrip('/')}/{table.lower()}", ignore_errors=True)
    (
        df.write.mode("overwrite")
        .bucketBy(buckets, key)
        .sortBy(key)
        .format("parquet")
        .saveAsTable(table)
    )


def bucketed_fetch_join(
    spark: SparkSession,
    batch_table: str,
    web_table: str,
) -> DataFrame:
    """The fetch join over two co-bucketed tables: equi-join on url with
    NO Exchange on either side (asserted in tests). Column roles mirror
    engine.run_round step 3."""
    batch = spark.table(batch_table)
    web = spark.table(web_table)
    return web.join(batch, "url", "inner")


def bucketed_seen_anti_join(
    spark: SparkSession,
    candidates_table: str,
    seen_table: str,
) -> DataFrame:
    """First-discovery-wins dedupe (D1) over co-bucketed tables: the
    left_anti join also runs Exchange-free when both sides share the
    url bucketing."""
    cand = spark.table(candidates_table)
    seen = spark.table(seen_table)
    return cand.join(seen.select("url"), "url", "left_anti")


