"""Scale probes for the round-5 curation additions:

1. quota_cap under a mega-key: Zipf-style key distribution where the
   head key holds ~half of all rows. Measures the salted two-phase cap
   against the plain single-window form on the same input and asserts
   result identity — windows get NO AQE skew splitting (that's
   join-only), so the plain form serializes the mega-key into one task;
   the salted form spreads it over salt_buckets tasks. This is the
   measured justification for the operator's extra exchange.
2. chunk_dedup at volume: docs synthesized arithmetically with a
   planted 10% whole-doc duplication rate; inputs localCheckpointed so
   the probe times the dedup, not the generator. Reports chunks/s.
3. kmeans_assign at volume: 64-dim vectors, C = sqrt(N)-ish cells,
   1 Lloyd pass. Reports vectors/s through init + refine + assign.

All inputs derive from spark.range (no data files). One JSON line.

Usage: python scripts/mixing_scale_probe.py [quota_m] [chunk_docs_m] [kmeans_m]
(defaults 20, 2, 1)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window as W  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from crawler_spark.session import get_spark  # noqa: E402


def probe_quota_cap(spark, n_rows: int) -> dict:
    from crawler_spark.operators.mixing import quota_cap

    # key = n // r for uniform r in 1..n: P(key = 1) ~ 1/2 — one mega-key
    # holding half the corpus, a long tail of small keys.
    rows = (
        spark.range(n_rows)
        .select(
            F.col("id"),
            (F.floor(
                F.lit(n_rows)
                / (F.pmod(F.xxhash64("id"), F.lit(n_rows)) + 1)
            )).alias("key"),
            F.pmod(F.xxhash64(F.col("id") + 1), F.lit(1000)).alias("score"),
        )
        .localCheckpoint(eager=True)
    )
    order = [F.col("score").desc(), F.col("id")]
    out = {"n_rows": n_rows}

    t0 = time.perf_counter()
    n_salted = quota_cap(rows, "key", order, cap=64).count()
    out["salted_sec"] = round(time.perf_counter() - t0, 2)

    w = W.partitionBy("key").orderBy(*order)
    t0 = time.perf_counter()
    plain = (
        rows.withColumn("quota_rank", F.row_number().over(w).cast("int"))
        .where(F.col("quota_rank") <= 64)
    )
    n_plain = plain.count()
    out["plain_window_sec"] = round(time.perf_counter() - t0, 2)
    assert n_salted == n_plain, (n_salted, n_plain)
    out["kept_rows"] = n_salted
    out["speedup_x"] = round(out["plain_window_sec"] / out["salted_sec"], 2)
    return out


def _docs(spark, n_docs: int):
    """~64-token docs; every 10th doc duplicates the text of the doc
    9 below it (planted whole-doc dups -> chunk-level drops)."""
    base = F.when(
        (F.col("id") % 10 == 9) & (F.col("id") >= 9), F.col("id") - 9
    ).otherwise(F.col("id"))
    toks = F.transform(
        F.sequence(F.lit(0), F.lit(63)),
        lambda i: F.conv(
            F.pmod(F.xxhash64(base * 64 + i), F.lit(40_000_000))
            .cast("string"), 10, 36),
    )
    return spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.array_join(toks, " ").alias("text"),
    )


def probe_chunk_dedup(spark, n_docs: int) -> dict:
    from crawler_spark.operators.dedup import chunk_dedup

    docs = _docs(spark, n_docs).localCheckpoint(eager=True)
    t0 = time.perf_counter()
    agg = (
        chunk_dedup(docs, "doc_id", "text", chunk_tokens=8)
        .agg(F.sum("n_chunks").alias("nc"), F.sum("n_kept").alias("nk"))
        .collect()[0]
    )
    wall = round(time.perf_counter() - t0, 2)
    return {
        "n_docs": n_docs,
        "n_chunks": int(agg["nc"]),
        "n_kept": int(agg["nk"]),
        "wall_sec": wall,
        "chunks_per_sec": round(agg["nc"] / wall),
    }


def probe_kmeans(spark, n_vecs: int) -> dict:
    from crawler_spark.operators.similarity import kmeans_assign

    vecs = (
        spark.range(n_vecs)
        .select(
            F.col("id").alias("vec_id"),
            F.transform(
                F.sequence(F.lit(0), F.lit(63)),
                lambda i: (
                    F.pmod(F.xxhash64(F.col("id") * 64 + i), F.lit(2001))
                    / 1000.0 - 1.0),
            ).alias("embedding"),
        )
        .localCheckpoint(eager=True)
    )
    n_cells = max(64, int(n_vecs ** 0.5))
    t0 = time.perf_counter()
    asg, _cent = kmeans_assign(vecs, "vec_id", "embedding",
                               n_cells=n_cells, lloyd_iters=1)
    n_assigned = asg.count()
    wall = round(time.perf_counter() - t0, 2)
    return {
        "n_vecs": n_assigned,
        "n_cells": n_cells,
        "wall_sec": wall,
        "vecs_per_sec": round(n_assigned / wall),
    }


def main() -> None:
    quota_m = float(sys.argv[1]) if len(sys.argv) > 1 else 20.0
    chunk_m = float(sys.argv[2]) if len(sys.argv) > 2 else 2.0
    km_m = float(sys.argv[3]) if len(sys.argv) > 3 else 1.0
    spark = get_spark("mixing_scale_probe", cores=32)
    spark.range(10).count()  # JVM warm-up out of the timings
    result = {
        "quota_cap": probe_quota_cap(spark, int(quota_m * 1e6)),
        "chunk_dedup": probe_chunk_dedup(spark, int(chunk_m * 1e6)),
        "kmeans": probe_kmeans(spark, int(km_m * 1e6)),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
