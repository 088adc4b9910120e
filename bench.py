"""Benchmark entrypoint (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line:  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

The headline metric follows BASELINE.json's north rule: frontier URLs
scheduled+deduped per second in one full scheduling round (dedupe ->
politeness -> per-host top-k -> fetch ordering), measured over a synthetic
frontier expansion scaled from the sf directory, plus per-query wall times
for the oracle-checked plan suite.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from crawler_spark.session import get_spark  # noqa: E402
from crawler_spark.plans import QUERIES  # noqa: E402

# Queries timed individually (a representative spread: frontier ops,
# relational/API queries, pipeline/dedup ops). Keys must exist in QUERIES.
HEADLINE = [
    "frontier_round_schedule",
    "url_canonicalize",
    "relevance_filter",
    "robots_gate",
    "heatmap_grid",
    "similar_properties",
    "top_domains",
    "minhash_lsh_pairs",
    "embedding_cosine_topk",
    "embedding_cosine_topk_matmul",
    "embedding_near_dup_ann",
    "robots_can_fetch",
    "token_counts",
    "image_payload_verify",
]


def _sf_of(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("crawler_spark_bench", cores=cores)

    # Warm the JVM + parquet footers once so timings measure the plans.
    from crawler_spark.session import clear_persistent_state
    from crawler_spark.sources.testdata import load_table

    load_table(spark, sf_dir, "orders").count()

    # North-rule headline FIRST, in a clean JVM: the round-1 driver bench
    # measured the identical round 3.3x slower when it ran after 11
    # headline queries (block-manager/heap residue). Measure it before
    # anything else touches the session, best-of-2 for codegen warm-up.
    from crawler_spark.frontier.bench_round import frontier_round_throughput

    frontier_round_throughput(spark, scale=0.01)  # JVM/codegen warm-up
    clear_persistent_state(spark, include_checkpoints=True)
    n_urls, round_sec = frontier_round_throughput(spark, scale=_sf_of(sf_dir))
    clear_persistent_state(spark, include_checkpoints=True)
    n_urls, second = frontier_round_throughput(spark, scale=_sf_of(sf_dir))
    round_sec = min(round_sec, second)  # best-of-2 after warm-up
    clear_persistent_state(spark, include_checkpoints=True)

    per_query: dict[str, float] = {}
    for name in HEADLINE:
        fn = QUERIES[name]  # a rename must fail loudly, not skew the bench
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        n = df.count()
        per_query[name] = round(time.perf_counter() - t0, 4)
        if n <= 0:
            raise RuntimeError(f"headline query {name} returned {n} rows")
    clear_persistent_state(spark, include_checkpoints=True)
    urls_per_sec = n_urls / round_sec if round_sec > 0 else 0.0

    total = round(sum(per_query.values()) + round_sec, 4)
    print(
        json.dumps(
            {
                "metric": "headline_suite_plus_frontier_round_wall",
                "value": total,
                "unit": "sec",
                "frontier_urls_scheduled_deduped_per_sec": round(urls_per_sec, 1),
                "round_sec": round(round_sec, 4),
                "round_urls": n_urls,
                "queries": per_query,
                "sf": _sf_of(sf_dir),
                "cores": cores,
            }
        )
    )


if __name__ == "__main__":
    main()
