"""Bloom sidecar: no false negatives ever, fpp in range, exact-equality of
filter_new vs a plain anti-join."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crawler_spark.frontier.bloom import BloomSeen


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("bloom"))
    seen = spark.range(0, 50_000).select(
        F.concat(F.lit("https://h"), (F.col("id") % 37).cast("string"),
                 F.lit(".synth.test/p/"), F.col("id").cast("string")).alias("url")
    )
    bs = BloomSeen.build(seen, path, capacity_per_bucket=2000,
                         n_buckets=32, fpp=0.01)
    return bs, seen.localCheckpoint()


def test_no_false_negatives(spark, built):
    bs, seen = built
    flagged = bs.with_flag(seen)
    misses = flagged.where(~F.col("bloom_maybe")).count()
    assert misses == 0  # every true member must flag maybe


def test_fpp_bounded(spark, built):
    bs, _ = built
    fresh = spark.range(1_000_000, 1_020_000).select(
        F.concat(F.lit("https://h"), (F.col("id") % 37).cast("string"),
                 F.lit(".synth.test/p/"), F.col("id").cast("string")).alias("url")
    )
    fp = bs.with_flag(fresh).where(F.col("bloom_maybe")).count()
    assert fp / 20_000 < 0.05  # target fpp 0.01, generous bound


def test_filter_new_exact(spark, built):
    bs, seen = built
    mixed = spark.range(40_000, 70_000).select(
        F.concat(F.lit("https://h"), (F.col("id") % 37).cast("string"),
                 F.lit(".synth.test/p/"), F.col("id").cast("string")).alias("url")
    )
    got = {r["url"] for r in bs.filter_new(mixed, seen).collect()}
    want = {r["url"] for r in mixed.join(seen, "url", "left_anti").collect()}
    assert got == want
    assert len(want) == 20_000
