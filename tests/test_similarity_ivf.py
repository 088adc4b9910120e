"""IVF ANN: determinism and recall@k against the exact brute-force top-k."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crawler_spark.operators.similarity import cosine_topk, ivf_topk

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    df = spark.read.parquet(f"{SF}/embeddings.parquet")
    return df.localCheckpoint()


def test_ivf_recall_vs_brute(spark, emb):
    queries = emb.where(F.col("vec_id") < 20)
    exact = cosine_topk(emb, queries, "vec_id", "embedding", k=5)
    approx = ivf_topk(emb, queries, "vec_id", "embedding", k=5,
                      n_cells=16, nprobe=6)
    want = {(r["q_id"], r["n_id"]) for r in exact.collect()}
    got = {(r["q_id"], r["n_id"]) for r in approx.collect()}
    recall = len(want & got) / len(want)
    assert recall >= 0.6, recall


def test_ivf_deterministic(spark, emb):
    queries = emb.where(F.col("vec_id") < 10)
    a = sorted(map(tuple, ivf_topk(emb, queries, "vec_id", "embedding").collect()))
    b = sorted(map(tuple, ivf_topk(emb, queries, "vec_id", "embedding").collect()))
    assert a == b
