"""Skew probe for the frontier's dedupe + seen anti-join (r03 verdict #7).

The engine's per-round dedupe is ``discovered.dropDuplicates(url)`` then
``left_anti`` against ``seen`` (engine.py step 5 / enqueue).  A Zipf link
graph makes the DISCOVERED multiset heavily skewed (a popular URL is
discovered from millions of parents), so the skew question decomposes:

* the duplicate skew hits the dropDuplicates aggregate, where Spark's
  partial (map-side) HashAggregate collapses hot keys BEFORE the
  exchange — the shuffle then carries ~distinct URLs only;
* the anti-join runs on post-dedup keys that are unique on both sides,
  so no join key has multiplicity — per-partition row counts are a
  hash-uniform multinomial and AQE's OptimizeSkewedJoin has nothing to
  split (this is a DESIGN property worth evidencing, not a gap: the
  dedupe-before-join ordering is what keeps the join skew-free).

This script measures the full chain at two Zipf exponents and reports
the post-shuffle partition histogram of the anti-join input, plus the
plan evidence (partial aggregate before the exchange, AQE skew-join
enabled in the session).

Prints one JSON line:
  {"n_links": N, "seen": M,
   "zipf_1.1": {"wall_sec": ..., "distinct": ..., "max_over_median": ...},
   "zipf_2.0": {...}, "partial_agg_before_exchange": true,
   "aqe_skew_join_enabled": true}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from crawler_spark.session import clear_persistent_state, get_spark  # noqa: E402

N_LINKS = int(os.environ.get("SKEW_LINKS", "20000000"))
N_SEEN = int(os.environ.get("SKEW_SEEN", "2000000"))
N_DISTINCT = int(os.environ.get("SKEW_DISTINCT", "4000000"))


def zipf_links(spark, n: int, s: float):
    """n link-discovery events over N_DISTINCT urls with Zipf(s) ranks:
    event i maps to url rank floor(u^(-1/(s-1)))-style via the inverse
    CDF approximation rank = ((i % P) / P)^(-1/(s-1)); deterministic, no
    RNG. Hot rank 1 receives ~ (1 - 2^-(s-1)) of all events at s=2."""
    p = F.lit(1_000_003)  # prime stride decorrelates rank from id order
    u = ((F.col("id") * 48271) % p + 1).cast("double") / (p + 1).cast(
        "double"
    )
    rank = F.least(
        F.lit(N_DISTINCT - 1),
        F.floor(F.pow(u, F.lit(-1.0 / (s - 1.0)))).cast("long") - 1,
    )
    return spark.range(n).select(
        F.concat(
            F.lit("https://h"), (rank % 1000).cast("string"),
            F.lit(".synth.test/apa/d/item-"), rank.cast("string"),
            F.lit(".html"),
        ).alias("url")
    )


def seen_set(spark, n: int):
    r = F.col("id")
    return spark.range(n).select(
        F.concat(
            F.lit("https://h"), (r % 1000).cast("string"),
            F.lit(".synth.test/apa/d/item-"), (r * 2).cast("string"),
            F.lit(".html"),
        ).alias("url")
    )


def main() -> None:
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("skew_anti_join", cores=cores)
    out: dict = {"n_links": N_LINKS, "seen": N_SEEN}

    seen = seen_set(spark, N_SEEN).localCheckpoint(eager=True)
    out["aqe_skew_join_enabled"] = (
        spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"
    )

    for s in (1.1, 2.0):
        links = zipf_links(spark, N_LINKS, s).localCheckpoint(eager=True)
        clear_persistent_state(spark)
        t0 = time.perf_counter()
        deduped = links.dropDuplicates(["url"])
        new = deduped.join(seen, "url", "left_anti")
        n_new = new.count()
        wall = time.perf_counter() - t0
        # post-shuffle partition histogram of the anti-join's left input:
        # unique keys => hash-uniform; a hot partition here would be the
        # signal AQE skew-split exists for.
        hist = (
            deduped.groupBy(F.spark_partition_id().alias("pid")).count()
            .agg(F.max("count").alias("mx"),
                 F.percentile_approx("count", 0.5).alias("med"))
            .collect()[0]
        )
        top = (
            links.groupBy("url").count().orderBy(F.desc("count")).limit(1)
            .collect()[0]["count"]
        )
        out[f"zipf_{s}"] = {
            "wall_sec": round(wall, 2),
            "new_urls": n_new,
            "hottest_url_events": int(top),
            "max_over_median_partition": round(hist["mx"] / max(hist["med"], 1), 2),
        }
        print(f"[skew] s={s}: {out[f'zipf_{s}']}", file=sys.stderr)

    # plan evidence: partial aggregate BEFORE the exchange on the dedupe
    plan = (
        zipf_links(spark, 1000, 2.0).dropDuplicates(["url"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    ex = plan.find("Exchange")
    out["partial_agg_before_exchange"] = (
        ex >= 0 and "HashAggregate" in plan[ex:]
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
