"""Sequence-packing invariants: deterministic shard-local bin layout."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crawler_spark.operators.packing import pack_sequences


@pytest.fixture(scope="module")
def docs(spark):
    # one bucket (n_buckets=1 below) with token counts 3,4,5,600,2:
    # capacity 10 -> exclusive prefix sums 0,3,7,12,612.
    rows = [(i, " ".join(["w"] * n))
            for i, n in enumerate([3, 4, 5, 600, 2])]
    return spark.createDataFrame(rows, "doc_id: long, text: string")


def _pack(df, capacity, n_buckets):
    return pack_sequences(
        df, "doc_id", F.size(F.split(F.col("text"), " ")),
        capacity=capacity, n_buckets=n_buckets,
    )


def test_bin_layout_single_bucket(spark, docs):
    got = {(r.doc_id, r.bin_id, r.bin_offset)
           for r in _pack(docs, 10, 1).collect()}
    # prefix 0 -> bin 0 off 0; 3 -> bin 0 off 3; 7 -> bin 0 off 7;
    # 12 -> bin 1 off 2; 612 (after the 600-token doc spans bins) ->
    # bin 61 off 2.
    assert got == {(0, 0, 0), (1, 0, 3), (2, 0, 7), (3, 1, 2), (4, 61, 2)}


def test_bucketing_is_id_mod(spark, docs):
    rows = _pack(docs, 10, 2).collect()
    assert all(r.bucket == r.doc_id % 2 for r in rows)
    # buckets pack independently: doc 2 (bucket 0) starts after doc 0's
    # 3 tokens, not after docs 0 and 1.
    by_id = {r.doc_id: r for r in rows}
    assert (by_id[2].bin_id, by_id[2].bin_offset) == (0, 3)
    assert (by_id[1].bin_id, by_id[1].bin_offset) == (0, 0)


def test_repartition_invariance(spark, docs):
    a = sorted(map(tuple, _pack(docs, 10, 2).collect()))
    b = sorted(map(tuple, _pack(docs.repartition(7), 10, 2).collect()))
    c = sorted(map(tuple, _pack(docs.coalesce(1), 10, 2).collect()))
    assert a == b == c


def test_offsets_stay_in_capacity(spark, docs):
    rows = _pack(docs, 10, 2).collect()
    assert all(0 <= r.bin_offset < 10 for r in rows)
    assert all(r.n_tokens >= 1 for r in rows)
