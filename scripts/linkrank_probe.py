"""Volume probes for the late-round-5 operators:

* link_mass_rank over a 10M-edge Zipf-headed graph (hub nodes receive
  ~30% of all edges) — per-iteration wall and total, verifying the
  fixed-iteration groupBy+join shape holds under hot-node skew with no
  driver-synchronized convergence loop;
* importance_weights over 2M synthetic docs x 8 tokens (16M token
  rows) — one explode + tiny stats agg + broadcast join + keyed sum.

Usage: python scripts/linkrank_probe.py [n_edges] [n_docs]
Prints one JSON line per probe.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from crawler_spark.session import get_spark  # noqa: E402


def probe_linkrank(spark, n_edges: int) -> dict:
    from crawler_spark.frontier.linkrank import link_mass_rank

    n_nodes = n_edges // 10
    base = spark.range(n_edges)
    # 30% of edges point at one of 100 hub nodes (the Zipf head every
    # real link graph has); the rest spread via a Knuth-multiplier hash
    edges = base.select(
        (F.col("id") % n_nodes).alias("src"),
        F.when(F.col("id") % 10 < 3, F.col("id") % 100)
        .otherwise((F.col("id") * 2654435761) % n_nodes)
        .alias("dst"),
    ).where(F.col("src") != F.col("dst"))
    edges = edges.localCheckpoint()  # freeze inputs out of the timing
    n = edges.count()

    t0 = time.time()
    out = link_mass_rank(edges, "src", "dst", iterations=2)
    rows = out.count()
    total = time.time() - t0
    return {
        "probe": "link_mass_rank", "n_edges": n, "n_nodes_out": rows,
        "iterations": 2, "total_sec": round(total, 2),
        "edges_per_sec_per_iter": int(n * 2 / total),
    }


def probe_importance(spark, n_docs: int, bucket_family: str) -> dict:
    from crawler_spark.operators.importance import importance_weights

    toks = F.concat_ws(
        " ",
        *[F.concat(F.lit("tok"),
                   ((F.col("id") * (2 * j + 3) + j) % 50_000).cast("string"))
          for j in range(8)],
    )
    docs = spark.range(n_docs).select(
        F.col("id").alias("doc_id"), toks.alias("text"))
    docs = docs.localCheckpoint()
    n = docs.count()

    best = None
    for _ in range(2):  # best-of-2 (first run pays codegen warm-up)
        t0 = time.time()
        out = importance_weights(
            docs, "doc_id", "text", F.col("doc_id") % 17 == 3,
            bucket_family=bucket_family)
        rows = out.count()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    return {
        "probe": "importance_weights", "bucket_family": bucket_family,
        "n_docs": n, "rows_out": rows, "best_sec": round(best, 2),
        "token_rows_per_sec": int(n * 8 / best),
    }


def main() -> None:
    n_edges = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000_000
    spark = get_spark("linkrank_probe", cores=32)
    print(json.dumps(probe_linkrank(spark, n_edges)), flush=True)
    for fam in ("md5", "xxhash64"):
        print(json.dumps(probe_importance(spark, n_docs, fam)), flush=True)


if __name__ == "__main__":
    main()
