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


@pytest.mark.parametrize("n_corpus", [120, 500])
def test_ivf_recall_vs_brute(spark, emb, n_corpus):
    """Recall at two corpus sizes with NO manual n_cells: the sqrt(N)
    default must hold the recall floor as the corpus grows (round-2
    verdict #9 — a fixed 16 cells was a silent scale parameter)."""
    corpus = emb.where(F.col("vec_id") < n_corpus)
    queries = corpus.where(F.col("vec_id") < 20)
    exact = cosine_topk(corpus, queries, "vec_id", "embedding", k=5)
    approx = ivf_topk(corpus, queries, "vec_id", "embedding", k=5,
                      nprobe=6)
    want = {(r["q_id"], r["n_id"]) for r in exact.collect()}
    got = {(r["q_id"], r["n_id"]) for r in approx.collect()}
    recall = len(want & got) / len(want)
    assert recall >= 0.6, (n_corpus, recall)


def test_near_dup_ann_recall_on_noisy_dups(spark, emb):
    """The wired scale path (LSH candidates -> cosine verify -> min-id rep)
    on *noisy* duplicates — direction actually changes, so recall is the
    OR-of-bands probability, not the provable-1.0 scaled-dup case the
    oracle query uses. Planted noise keeps cos ~0.999 (p_bit ~0.986);
    6 tables x 8 planes -> expected per-pair recall > 0.999."""
    from crawler_spark.operators.similarity import near_dup_ann

    base = emb.where(F.col("vec_id") < 150).select("vec_id", "embedding")
    noisy = base.select(
        (F.col("vec_id") + 10000).alias("vec_id"),
        F.transform(
            "embedding",
            lambda x, i: x
            * (1 + ((F.col("vec_id") * 31 + i) % 7 - 3) / 64.0).cast("float"),
        ).alias("embedding"),
    )
    aug = base.unionByName(noisy)
    out = near_dup_ann(aug, "vec_id", "embedding", threshold=0.9,
                       n_tables=6, n_planes=8)
    got = {(r["kept_id"], r["dup_id"]) for r in out.collect()}
    want = {(i, i + 10000) for i in range(150)}
    recall = len(got & want) / len(want)
    assert recall >= 0.9, recall
    assert got <= want  # no false positives at this threshold


def test_ivf_deterministic(spark, emb):
    queries = emb.where(F.col("vec_id") < 10)
    a = sorted(map(tuple, ivf_topk(emb, queries, "vec_id", "embedding").collect()))
    b = sorted(map(tuple, ivf_topk(emb, queries, "vec_id", "embedding").collect()))
    assert a == b


def test_pruned_scoring_equals_fold_scoring(spark, emb):
    """The r04 two-phase candidate scoring (einsum prune per Arrow batch
    + exact fold on <= max(k+4,2k) survivors) must be row-identical to
    the fold-per-pair form it replaces — including on a near-degenerate
    augmentation (x2-scaled dups) where many candidates tie within float
    error and the prune margin is what preserves the exact set."""
    from pyspark.sql import functions as F

    from crawler_spark.operators.similarity import lsh_ann_topk, ivf_topk

    base = emb.where(F.col("vec_id") < 200).select("vec_id", "embedding")
    dups = base.where(F.col("vec_id") < 40).select(
        (F.col("vec_id") + 10000).alias("vec_id"),
        F.transform(
            "embedding", lambda x: x * F.lit(2.0).cast("float")
        ).alias("embedding"),
    )
    aug = base.unionByName(dups).localCheckpoint()
    q = aug.where(F.col("vec_id") >= 10000)

    for k in (1, 5):
        a = sorted(map(tuple, lsh_ann_topk(
            aug, q, "vec_id", "embedding", k=k, prune=True).collect()))
        b = sorted(map(tuple, lsh_ann_topk(
            aug, q, "vec_id", "embedding", k=k, prune=False).collect()))
        assert a == b and len(a) > 0, ("lsh", k, len(a))
        a = sorted(map(tuple, ivf_topk(
            aug, q, "vec_id", "embedding", k=k, n_cells=14, nprobe=4,
            prune=True).collect()))
        b = sorted(map(tuple, ivf_topk(
            aug, q, "vec_id", "embedding", k=k, n_cells=14, nprobe=4,
            prune=False).collect()))
        assert a == b and len(a) > 0, ("ivf", k, len(a))


def test_batch_udfs_survive_empty_partitions(spark):
    """Arrow batch UDFs must not np.stack an empty batch (ValueError):
    a filter that empties some partitions — routine at scale — exercises
    every vectorized UDF family over a frame with mostly-empty splits."""
    from pyspark.sql import functions as F

    from crawler_spark.operators.similarity import (
        cosine_rowwise_udf, cosine_topk_matmul, ivf_topk, lsh_ann_topk,
        near_dup_ann,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    # 40 partitions, ~30 surviving rows: most partitions come up empty
    sparse = emb.repartition(40).where(F.col("vec_id") < 30)
    q = sparse.where(F.col("vec_id") < 3)

    assert cosine_topk_matmul(sparse, q, "vec_id", "embedding", k=2).count() > 0
    assert lsh_ann_topk(sparse, q, "vec_id", "embedding", k=1).count() >= 0
    assert ivf_topk(sparse, q, "vec_id", "embedding", k=1,
                    n_cells=4, nprobe=2).count() >= 0
    assert near_dup_ann(sparse, "vec_id", "embedding",
                        threshold=0.99).count() >= 0
    pair = sparse.select(
        F.col("embedding").alias("va"), F.col("embedding").alias("vb"))
    cos = cosine_rowwise_udf()
    n_one = pair.withColumn("c", cos(F.col("va"), F.col("vb"))) \
        .where(F.col("c") > 0.999999).count()
    assert n_one == 30


def test_pruned_scoring_epsilon_cut_on_tie_cluster(spark):
    """More candidates than kk tie within float error of the k-th score:
    the fixed-count cut alone could drop a true top-k member on
    BLAS-vs-fold reordering; the epsilon-widened cut keeps the whole tie
    cluster and the exact fold decides. 30 near-identical vectors
    (coordinate perturbations ~1e-10, cosine gaps << EPS) plus distant
    background; pruned must equal unpruned at k=1 and k=3."""
    import numpy as np
    from pyspark.sql import functions as F

    from crawler_spark.operators.similarity import lsh_ann_topk

    rng = np.random.RandomState(11)
    base = rng.randn(64)
    rows = []
    for i in range(30):
        v = base.copy()
        v[i % 64] += 1e-10 * (i + 1)       # cosine gap ~1e-13 < EPS
        rows.append((i, [float(x) for x in v]))
    for i in range(30, 60):                # distant background
        rows.append((i, [float(x) for x in rng.randn(64)]))
    df = spark.createDataFrame(rows, "vec_id: long, embedding: array<float>")
    df = df.withColumn("embedding",
                       F.col("embedding").cast("array<float>")).localCheckpoint()
    q = df.where(F.col("vec_id") == 0)
    for k in (1, 3):
        a = sorted(map(tuple, lsh_ann_topk(
            df, q, "vec_id", "embedding", k=k, prune=True).collect()))
        b = sorted(map(tuple, lsh_ann_topk(
            df, q, "vec_id", "embedding", k=k, prune=False).collect()))
        assert a == b and len(a) == k, (k, a, b)
