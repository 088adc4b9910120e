"""Deterministic sampling invariants: the properties that make
hash-threshold selection usable for a durable train/val/test split at
100 TB — stability under repartitioning, cross-table agreement on the
same key, seed independence, and rate accuracy."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crawler_spark.operators.sampling import (
    hash_sample,
    hex_threshold,
    stratified_sample,
    train_val_test_split,
)

N = 20_000


@pytest.fixture(scope="module")
def keyed(spark):
    return spark.range(N).select(F.col("id").alias("k")).localCheckpoint()


def test_hex_threshold_edges():
    assert hex_threshold(0.0) == "00000000"
    assert hex_threshold(1.0) == "g"          # > every hex char
    assert hex_threshold(0.25) == "40000000"
    assert hex_threshold(0.5) == "80000000"


def test_rate_accuracy(spark, keyed):
    for frac in (0.1, 0.5, 0.9):
        got = hash_sample(keyed, "k", frac).count() / N
        assert abs(got - frac) < 0.02, (frac, got)
    assert hash_sample(keyed, "k", 0.0).count() == 0
    assert hash_sample(keyed, "k", 1.0).count() == N


def test_membership_invariant_under_repartitioning(spark, keyed):
    a = set(r.k for r in hash_sample(keyed, "k", 0.3).collect())
    b = set(r.k for r in
            hash_sample(keyed.repartition(17), "k", 0.3).collect())
    c = set(r.k for r in
            hash_sample(keyed.coalesce(1), "k", 0.3).collect())
    assert a == b == c and 0 < len(a) < N


def test_cross_table_agreement(spark, keyed):
    """Two different tables keyed the same select the same keys — the
    property that lets a split propagate through a join graph."""
    other = keyed.withColumn("payload", F.col("k") * 7)
    a = set(r.k for r in hash_sample(keyed, "k", 0.2).collect())
    b = set(r.k for r in hash_sample(other, "k", 0.2).collect())
    assert a == b


def test_split_total_and_disjoint(spark, keyed):
    lab = train_val_test_split(keyed, "k", 0.1, 0.1).localCheckpoint()
    counts = {r.split: r.n for r in
              lab.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == N          # total
    assert set(counts) == {"train", "val", "test"}
    assert abs(counts["val"] / N - 0.1) < 0.02
    assert abs(counts["test"] / N - 0.1) < 0.02
    # disjoint by construction (single CASE); seed changes the draw
    lab2 = train_val_test_split(keyed, "k", 0.1, 0.1, seed="other")
    moved = lab.alias("a").join(lab2.alias("b"), "k") \
        .where(F.col("a.split") != F.col("b.split")).count()
    assert moved > 0


def test_stratified_rates(spark):
    df = spark.range(N).select(
        F.col("id").alias("k"),
        F.when(F.col("id") % 4 == 0, "en").otherwise("de").alias("lang"))
    out = stratified_sample(df, "k", "lang", {"en": 0.5},
                            default_rate=0.1)
    got = {r.lang: r.n for r in
           out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert abs(got["en"] / (N / 4) - 0.5) < 0.04
    assert abs(got["de"] / (3 * N / 4) - 0.1) < 0.04


def test_null_keys_match_oracle_semantics(spark):
    """NULL keys must behave identically to the DuckDB restatement
    (NULL-propagating concat): excluded from every hash sample, and
    labeled 'train' by the split's otherwise-branch — never all lumped
    into one shared pseudo-key bucket."""
    df = spark.createDataFrame(
        [(1,), (2,), (None,)], "k: long"
    )
    assert hash_sample(df, "k", 1.0).where(F.col("k").isNull()).count() == 0
    split = train_val_test_split(df, "k")
    got = {(r.k, r.split) for r in split.collect() if r.k is None}
    assert got == {(None, "train")}
