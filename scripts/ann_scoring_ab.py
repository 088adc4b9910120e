"""A/B bench: ANN candidate scoring — einsum prune + exact-fold re-rank
(r04, ``prune=True``) vs the interpreted fold per candidate pair it
replaced (``prune=False``).

Corpus is intentionally near-degenerate (all vectors near-parallel, the
measured failure mode of the synthetic image features): LSH buckets and
IVF cells collapse, so the candidate set approaches |queries| x |corpus|
— the regime where fold-per-pair scoring dominates the whole job (the
16x HOF trap, operators/dedup.py). Both paths must return identical rows.

Prints one JSON line:
  {"corpus": N, "queries": Q, "k": K,
   "lsh": {"fold_sec": ..., "prune_sec": ..., "speedup": ...},
   "ivf": {...}}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from crawler_spark.operators.similarity import ivf_topk, lsh_ann_topk  # noqa: E402
from crawler_spark.session import clear_persistent_state, get_spark  # noqa: E402

N_CORPUS = int(os.environ.get("AB_CORPUS", "4000"))
N_QUERIES = int(os.environ.get("AB_QUERIES", "100"))
DIM = 64
K = 5
NPROBE = int(os.environ.get("AB_NPROBE", "4"))


def near_parallel_corpus(spark, n: int):
    """n near-parallel unit-ish vectors: a shared smooth base + a tiny
    deterministic per-id perturbation (cos >= 0.999 for every pair)."""
    base = spark.range(n).select(
        F.col("id").cast("long").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(DIM - 1)),
            lambda i: (
                F.cos(i.cast("double") / 7.0)
                + ((F.col("id") * 131 + i) % 17 - 8).cast("double") / 4000.0
            ).cast("float"),
        ).alias("embedding"),
    )
    return base.localCheckpoint(eager=True)


def timed(fn, spark):
    best = float("inf")
    n = -1
    for _ in range(2):
        clear_persistent_state(spark)
        t0 = time.perf_counter()
        n = fn().count()
        best = min(best, time.perf_counter() - t0)
    return best, n


def main() -> None:
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("ann_scoring_ab", cores=cores)
    corpus = near_parallel_corpus(spark, N_CORPUS)
    queries = corpus.where(F.col("vec_id") < N_QUERIES).localCheckpoint(
        eager=True
    )

    out: dict = {"corpus": N_CORPUS, "queries": N_QUERIES, "k": K, "nprobe": NPROBE}

    # --- end-to-end A/B (index build included; shared by both paths) ---
    for name, call in (
        (
            "lsh",
            lambda p: lsh_ann_topk(
                corpus, queries, "vec_id", "embedding", k=K, prune=p
            ),
        ),
        (
            "ivf",
            lambda p: ivf_topk(
                corpus, queries, "vec_id", "embedding", k=K,
                n_cells=max(4, int(N_CORPUS**0.5)), nprobe=NPROBE, prune=p,
            ),
        ),
    ):
        rows_p = sorted(map(tuple, call(True).collect()))
        rows_f = sorted(map(tuple, call(False).collect()))
        assert rows_p == rows_f, f"{name}: pruned != fold rows"
        prune_sec, n = timed(lambda: call(True), spark)
        fold_sec, _ = timed(lambda: call(False), spark)
        out[name] = {
            "fold_sec": round(fold_sec, 3),
            "prune_sec": round(prune_sec, 3),
            "speedup": round(fold_sec / prune_sec, 2),
            "rows": n,
        }
        print(f"[ab] {name}: {out[name]}", file=sys.stderr)

    # --- scoring-stage-only A/B: index (bucket/cell assignment) frames
    # are checkpointed, so the timings isolate candidate scoring + final
    # top-k — the stage the r04 change targets. ---
    from crawler_spark.operators.similarity import (  # noqa: E402
        _exact_rerank, _grouped_candidate_topk, _salted, cell_assign_udf,
        lsh_bucket_udf, sample_centroids,
    )

    bucket = lsh_bucket_udf(8, DIM, 42)
    lsh_c = corpus.select(
        F.col("vec_id").alias("n_id"), F.col("embedding").alias("n_vec"),
        bucket(F.col("embedding")).alias("key"),
    ).localCheckpoint(eager=True)
    lsh_q = queries.select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec"),
        bucket(F.col("embedding")).alias("key"),
    ).localCheckpoint(eager=True)

    cent = sample_centroids(
        corpus, "vec_id", "embedding", max(4, int(N_CORPUS**0.5))
    )
    ivf_c = corpus.select(
        F.col("vec_id").alias("n_id"), F.col("embedding").alias("n_vec"),
        F.explode(cell_assign_udf(cent, 1)(F.col("embedding"))).alias("key"),
    ).localCheckpoint(eager=True)
    ivf_q = queries.select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec"),
        F.explode(cell_assign_udf(cent, NPROBE)(F.col("embedding"))).alias("key"),
    ).localCheckpoint(eager=True)

    for name, ckpt_c, ckpt_q, salts in (
        ("lsh_scoring", lsh_c, lsh_q, 8),
        ("ivf_scoring", ivf_c, ivf_q, 1),
    ):
        def pruned():
            cs, qs = _salted(ckpt_c, ckpt_q, n_salts=salts)
            pairs = _grouped_candidate_topk(cs, qs, ["key", "salt"], K)
            return _exact_rerank(pairs.dropDuplicates(["q_id", "n_id"]), K)

        def fold():
            pairs = (
                ckpt_c.join(ckpt_q, "key")
                .where(F.col("q_id") != F.col("n_id"))
                .select("q_id", "q_vec", "n_id", "n_vec")
            )
            return _exact_rerank(pairs.dropDuplicates(["q_id", "n_id"]), K)

        assert sorted(map(tuple, pruned().collect())) == sorted(
            map(tuple, fold().collect())
        ), f"{name}: pruned != fold rows"
        prune_sec, n = timed(pruned, spark)
        fold_sec, _ = timed(fold, spark)
        out[name] = {
            "fold_sec": round(fold_sec, 3),
            "prune_sec": round(prune_sec, 3),
            "speedup": round(fold_sec / prune_sec, 2),
            "rows": n,
        }
        print(f"[ab] {name}: {out[name]}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
