"""Unit tests for corpus mixing (quota_cap), chunk-level dedup, and
k-means assignment — the round-5 curation additions."""

import os
import sys

import numpy as np
from pyspark.sql import Window as W
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crawler_spark.operators.dedup import chunk_dedup  # noqa: E402
from crawler_spark.operators.mixing import quota_cap  # noqa: E402
from crawler_spark.operators.similarity import kmeans_assign  # noqa: E402

SF = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.001")


def test_quota_cap_equals_single_window(spark):
    """The salted two-phase cap must be bit-identical to the plain
    row_number window — including under quality ties (doc_id tiebreak)."""
    d = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "source", (F.col("n_chars") % 5).alias("q")
    )
    order = [F.col("q").desc(), F.col("doc_id")]
    got = quota_cap(d, "source", order, cap=7).select(
        "doc_id", "source", "q", "quota_rank"
    )
    w = W.partitionBy("source").orderBy(*order)
    want = (
        d.withColumn("quota_rank", F.row_number().over(w).cast("int"))
        .where(F.col("quota_rank") <= 7)
    )
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_quota_cap_respects_cap_per_key(spark):
    d = spark.read.parquet(f"{SF}/documents.parquet")
    got = quota_cap(d, "source", [F.col("doc_id")], cap=3)
    per_key = got.groupBy("source").count().collect()
    assert all(r["count"] <= 3 for r in per_key)
    # ranks are exactly 1..count within each key
    ranks = got.groupBy("source").agg(
        F.min("quota_rank").alias("lo"), F.max("quota_rank").alias("hi"),
        F.count("*").alias("n")
    ).collect()
    assert all(r["lo"] == 1 and r["hi"] == r["n"] for r in ranks)


def test_chunk_dedup_planted(spark):
    """Doc 2 repeats doc 1's first chunk verbatim: that chunk must drop
    from doc 2 (first occurrence by (id, pos) wins) and survive in doc 1;
    reassembly preserves chunk order; a whole-duplicate doc goes NULL."""
    a = "a b c d e f g h"          # exactly one 8-token chunk
    rows = [
        (1, a + " i j k l m n o p"),   # chunks: [a..h], [i..p]
        (2, a + " q r s t u v w x"),   # first chunk duplicates doc 1's
        (3, a),                        # whole doc duplicates doc 1 chunk 0
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in chunk_dedup(df, "doc_id", "text").collect()}
    assert out[1]["n_chunks"] == 2 and out[1]["n_kept"] == 2
    assert out[1]["text_kept"] == rows[0][1]
    assert out[2]["n_chunks"] == 2 and out[2]["n_kept"] == 1
    assert out[2]["text_kept"] == "q r s t u v w x"
    assert out[3]["n_chunks"] == 1 and out[3]["n_kept"] == 0
    assert out[3]["text_kept"] is None


def test_chunk_dedup_whitespace_and_partial(spark):
    """Whitespace runs normalize away and a trailing partial chunk is
    kept as its own unit."""
    df = spark.createDataFrame(
        [(1, "a  b\tc d e f g h  tail1 tail2")],
        "doc_id long, text string",
    )
    r = chunk_dedup(df, "doc_id", "text").collect()[0]
    assert r["n_chunks"] == 2 and r["n_kept"] == 2
    assert r["text_kept"] == "a b c d e f g h tail1 tail2"


def test_kmeans_assign_matches_bruteforce(spark):
    """Arrow-batched assignment == numpy brute-force argmax cosine over
    the same centroids; assignment deterministic across invocations."""
    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    asg, cent = kmeans_assign(
        e, "vec_id", "embedding", n_cells=10, lloyd_iters=1,
        order_hash=lambda c: F.md5(c.cast("string")),
    )
    got = {r["vec_id"]: r["cell"] for r in asg.collect()}
    rows = e.select("vec_id", "embedding").collect()
    cn = cent / np.linalg.norm(cent, axis=1, keepdims=True)
    for r in rows:
        v = np.asarray(r["embedding"], dtype=np.float64)
        v = v / max(np.linalg.norm(v), 1e-12)
        sims = v @ cn.T
        order = np.argsort(-sims, kind="stable")
        assert got[r["vec_id"]] == int(order[0])
    # determinism: a second run reproduces centroids exactly
    _, cent2 = kmeans_assign(
        e, "vec_id", "embedding", n_cells=10, lloyd_iters=1,
        order_hash=lambda c: F.md5(c.cast("string")),
    )
    assert np.array_equal(cent, cent2)


def test_quota_cap_rejects_sortorder_columns(spark):
    """A SortOrder as the LAST order column would reach the salt hash
    and die deep in codegen ([INTERNAL_ERROR] Cannot generate code) —
    the guard turns it into a contract error at plan-build time.
    Earlier columns may carry .desc() freely (the equality test does)."""
    import pytest
    from pyspark.sql import functions as F

    from crawler_spark.operators.mixing import quota_cap

    df = spark.range(10).select(
        F.lit(1).alias("k"), F.col("id"), (F.col("id") * 7 % 5).alias("q"))
    with pytest.raises(ValueError, match="plain Column"):
        quota_cap(df, "k", [F.col("q").desc(), F.col("id").asc()], cap=3)
    # non-last SortOrder stays legal
    assert quota_cap(
        df, "k", [F.col("q").desc(), F.col("id")], cap=3).count() == 3
