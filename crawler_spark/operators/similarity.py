"""Similarity search over embedding columns (array<float>).

Two tiers, as a 100 TB pipeline needs:

* ``cosine_topk`` — exact brute-force top-k: a broadcast of the (small)
  query set against the full corpus, dot products computed JVM-side with
  ``zip_with`` + ``aggregate`` (left fold, deterministic), ranked with one
  window per query. Baseline and oracle-checkable.
* ``lsh_ann_topk`` — approximate: random-hyperplane LSH signatures bucket
  the corpus (signatures via a seeded, deterministic numpy pandas UDF —
  Arrow-batched, no per-row Python), then exact re-ranking *within* the
  candidate bucket only. The bucket join replaces the full cross product:
  at 1000 executors the corpus never shuffles more than once.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W
from pyspark.sql.types import LongType


def dot_fold(a: Column, b: Column) -> Column:
    """Deterministic left-fold dot product of two numeric arrays (double)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot_fold(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot_fold(a, b) / (l2_norm(a) * l2_norm(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
) -> DataFrame:
    """Exact top-k cosine neighbors per query row.

    ``queries`` is broadcast (it is the small side by construction); the
    corpus streams through one stage; ranking is one shuffle keyed by the
    query id — the partition count scales with |queries|, independent of
    corpus size.
    """
    q = queries.select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec")
    )
    c = corpus.select(
        F.col(id_col).alias("n_id"), F.col(vec_col).alias("n_vec")
    )
    scored = (
        c.join(F.broadcast(q), F.col("q_id") != F.col("n_id"))
        .withColumn("cos", cosine(F.col("q_vec"), F.col("n_vec")))
    )
    w = W.partitionBy("q_id").orderBy(F.desc("cos"), "n_id")
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= k)
        .select("q_id", "n_id", "rank", F.round("cos", 4).alias("cos_sim"))
    )


def _hyperplanes(n_planes: int, dim: int, seed: int = 42) -> np.ndarray:
    """Deterministic random hyperplanes (seeded — no wall-clock, no env)."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).astype(np.float64)


def lsh_bucket_udf(n_planes: int, dim: int, seed: int = 42):
    """pandas UDF: embedding -> signed-projection bucket id (int64).

    Vectorized: one matmul per Arrow batch. The planes matrix is captured
    in the closure and shipped once per task via the broadcast-safe
    closure serializer (it is tiny: n_planes x dim doubles).
    """
    planes = _hyperplanes(n_planes, dim, seed)

    @F.pandas_udf(LongType())
    def bucket(vecs: pd.Series) -> pd.Series:
        m = np.stack(vecs.to_numpy())  # (batch, dim) float32
        signs = (m.astype(np.float64) @ planes.T) > 0  # (batch, n_planes)
        weights = (1 << np.arange(n_planes)).astype(np.int64)
        return pd.Series(signs @ weights)

    return bucket


def lsh_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    n_planes: int = 8,
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: bucket by hyperplane LSH, exact cosine within
    the shared bucket only. One equi-join on the bucket id — the scale
    path when the query set is itself large (query x corpus would
    otherwise be quadratic)."""
    bucket = lsh_bucket_udf(n_planes, dim, seed)
    q = queries.select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("q_vec"),
        bucket(F.col(vec_col)).alias("bucket"),
    )
    c = corpus.select(
        F.col(id_col).alias("n_id"),
        F.col(vec_col).alias("n_vec"),
        bucket(F.col(vec_col)).alias("bucket"),
    )
    scored = (
        c.join(q, "bucket")
        .where(F.col("q_id") != F.col("n_id"))
        .withColumn("cos", cosine(F.col("q_vec"), F.col("n_vec")))
    )
    w = W.partitionBy("q_id").orderBy(F.desc("cos"), "n_id")
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= k)
        .select("q_id", "n_id", "rank", F.round("cos", 4).alias("cos_sim"))
    )
