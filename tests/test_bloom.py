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


def test_incremental_update_equals_rebuild(spark, tmp_path_factory):
    """update(delta) on an existing sidecar == build(seen ∪ delta) from
    scratch: bit-identical bucket files, so the incremental per-round
    store path (store._bloom_for_round) can never change crawl results."""
    import numpy as np
    import os

    def urls(lo, hi):
        return spark.range(lo, hi).select(
            F.concat(F.lit("https://h"), (F.col("id") % 37).cast("string"),
                     F.lit(".synth.test/p/"),
                     F.col("id").cast("string")).alias("url"))

    base, delta, full = urls(0, 30_000), urls(30_000, 33_000), urls(0, 33_000)
    p_inc = str(tmp_path_factory.mktemp("bloom_inc"))
    p_full = str(tmp_path_factory.mktemp("bloom_full"))
    inc = BloomSeen.build(base, p_inc, capacity_per_bucket=2000,
                          n_buckets=16, fpp=0.01)
    inc.update(delta)
    BloomSeen.build(full, p_full, capacity_per_bucket=2000,
                    n_buckets=16, fpp=0.01)
    for b in range(16):
        fa = os.path.join(p_inc, f"bucket_{b:05d}.npy")
        fb = os.path.join(p_full, f"bucket_{b:05d}.npy")
        assert os.path.exists(fa) == os.path.exists(fb), b
        if os.path.exists(fa):
            assert np.array_equal(np.load(fa), np.load(fb)), b


def test_update_touches_only_delta_buckets(spark, tmp_path_factory):
    """The incremental path's point: a small delta rewrites only the
    buckets its URLs hash into (mtimes of the rest are untouched)."""
    import os
    import time

    def urls(lo, hi):
        return spark.range(lo, hi).select(
            F.concat(F.lit("https://x/"), F.col("id").cast("string"))
            .alias("url"))

    p = str(tmp_path_factory.mktemp("bloom_touch"))
    bs = BloomSeen.build(urls(0, 10_000), p, capacity_per_bucket=2000,
                         n_buckets=64, fpp=0.01)
    before = {f: os.path.getmtime(os.path.join(p, f))
              for f in os.listdir(p)}
    time.sleep(0.05)
    bs.update(urls(10_000, 10_003))  # 3 URLs -> at most 3 buckets
    changed = [f for f in os.listdir(p)
               if os.path.getmtime(os.path.join(p, f)) != before.get(f)]
    assert 1 <= len(changed) <= 3, changed
