"""Frontier-size sweep: full-window vs incremental head scheduling.

The incremental scheduler's claim (frontier/incremental.py) is that the
per-round scheduling cost stops depending on FRONTIER size: the full
mode windows the whole eligible frontier every round, the incremental
mode touches only the head index (<= cap x hosts rows) plus the round's
insert wave. At the 1M-page crawl scale the frontier is ~6k rows and
the window is free — fixed job overhead dominates and incremental is
strictly extra jobs (BENCH.md records that honestly). This probe is the
regime the feature exists for: a frontier of N >> batch rows, read from
parquet (the lake model), N swept over decades.

Timed, per mode:
  full         schedule_batch(frontier) -> batch count
  incremental  schedule_incremental(head, frontier) -> batch count,
               then update_head(inserts of ~4x batch size) written back
               to parquet — i.e. the WHOLE per-round incremental cost
               including state maintenance; head build is untimed
               (amortized once over the crawl, like the store's
               bucketed layout).

Run:  python scripts/incremental_bench.py 2e6 2e7 [--hosts 1000 --k 64]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def synth_frontier(spark, n: int, n_hosts: int, rnd: int = 0,
                   zipf: bool = False):
    """``rnd`` > 0 offsets page ids by rnd*10^12 so an insert wave is
    URL-DISJOINT from any swept frontier size (review finding r05: an
    offset of rnd*n aliased ~75% of insert urls/hosts/priorities onto
    existing frontier rows, so update_head was timed merging duplicate
    urls — a state real crawls exclude via the seen anti-join)."""
    from pyspark.sql import functions as F

    from crawler_spark.frontier import spec

    p = F.col("id") + rnd * 1_000_000_000_000
    if zipf:
        # heavy-head host distribution: u^3 density puts ~10% of rows on
        # host 0 at n_hosts=1000 (the hot-domain regime the salted
        # window and the head cap both exist for)
        u = F.pmod(F.xxhash64(p), F.lit(1_000_000)) / 1_000_000.0
        host = F.floor(F.lit(n_hosts) * F.pow(u, F.lit(3.0))).cast("int")
    else:
        host = spec.host_id_of_page(p, n_hosts)
    return spark.range(n).select(
        spec.url_of(p, host, p % 10 == 0).alias("url"),
        host.alias("host_id"),
        (1 + F.pmod(F.xxhash64(p), F.lit(5))).cast("int").alias("priority"),
        F.lit(rnd).cast("int").alias("disc_round"),
        F.lit(0).cast("int").alias("retry_count"),
        F.lit(rnd).cast("int").alias("eligible_round"),
    )


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("sizes", nargs="+", type=float,
                    help="frontier row counts to sweep (e.g. 2e6 2e7)")
    ap.add_argument("--hosts", type=int, default=1000)
    ap.add_argument("--k", type=int, default=64)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--zipf", action="store_true",
                    help="heavy-head host distribution (~10%% of rows on "
                         "the hottest host at 1000 hosts)")
    args = ap.parse_args()

    from crawler_spark.session import get_spark

    spark = get_spark(app_name="incremental_bench")
    from crawler_spark.frontier.engine import FRONTIER_COLS, schedule_batch
    from crawler_spark.frontier.incremental import (
        build_head,
        schedule_incremental,
        update_head,
    )

    rows = []
    for size in args.sizes:
        n = int(size)
        base = os.path.join(os.getcwd(), "spark-warehouse",
                            f"inc_bench_{n}")
        shutil.rmtree(base, ignore_errors=True)
        synth_frontier(spark, n, args.hosts, zipf=args.zipf) \
            .write.parquet(f"{base}/fr")
        fr = spark.read.parquet(f"{base}/fr")
        build_head(fr, args.k).write.parquet(f"{base}/head")  # untimed
        head = spark.read.parquet(f"{base}/head")
        # realistic per-round insert wave: ~4 links per fetched page
        inserts = (synth_frontier(spark, 4 * args.k * args.hosts,
                                  args.hosts, rnd=1, zipf=args.zipf)
                   .localCheckpoint(eager=True))

        best = {"full": float("inf"), "incremental": float("inf")}
        n_batch = 0
        for _ in range(args.reps):
            t0 = time.perf_counter()
            n_batch = schedule_batch(fr, 1, args.k).count()
            best["full"] = min(best["full"], time.perf_counter() - t0)

            t0 = time.perf_counter()
            batch, fb = schedule_incremental(head, fr, 1, args.k)
            batch = batch.localCheckpoint(eager=True)
            assert batch.count() == n_batch
            fb = fb.localCheckpoint(eager=True)
            # the honest post-round frontier (batch removed, wave added);
            # only rebuild hosts ever scan it — none in steady state
            fr_next = (
                fr.join(batch.select("url"), "url", "left_anti")
                .select(*FRONTIER_COLS)
                .unionByName(inserts.select(*FRONTIER_COLS))
            )
            shutil.rmtree(f"{base}/head2", ignore_errors=True)
            update_head(head, fr_next, batch, inserts, fb, args.k) \
                .write.parquet(f"{base}/head2")
            best["incremental"] = min(best["incremental"],
                                      time.perf_counter() - t0)

        rows.append({"n_frontier": n, "batch": n_batch,
                     "full_s": round(best["full"], 2),
                     "incremental_s": round(best["incremental"], 2)})
        print(json.dumps(rows[-1]), flush=True)
        shutil.rmtree(base, ignore_errors=True)
    print(json.dumps({"sweep": rows, "hosts": args.hosts, "k": args.k,
                      "zipf": args.zipf}))


if __name__ == "__main__":
    main()
