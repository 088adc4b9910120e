"""Image-leg operator throughput probe (BENCH.md evidence).

Measures the round-5 image-curation operators over a CHECKPOINTED
mixed-dimensions payload corpus (input materialized first, so timings
are the operator, not the synth — the analogue of reading payloads from
storage). Mixed corpus: (w, h) in {16..48}x{16..64} per id
(images.mixed_dims_of), ~3.9 KB/row mean payload.

* align   — caption<->image alignment gate (anchor_colors decode +
            native regex/tolerance compare): rows/s and payload MB/s in;
            shuffle-free scan (plan-asserted in tests).
* aspect  — LAION gate + aspect-bucket argmin + (bucket, shard) batch
            window: rows/s through the ONE window exchange.
* dedup   — md5(bytes) first-wins exact dedup (digest shuffle + min-agg
            + join back): rows/s and payload MB/s hashed.

Usage: python scripts/image_leg_bench.py [cores] [n_images]
Prints one JSON line — run at two cores levels for a scaling pair.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from crawler_spark.frontier import images as I  # noqa: E402
from crawler_spark.session import get_spark  # noqa: E402

_BUCKETS = [(1, 2), (3, 4), (1, 1), (4, 3), (2, 1)]


def _align(df):
    iid = F.col("image_id").cast("long")
    probe = df.select(iid.alias("image_id"), "fmt", "bytes", "caption")
    anchored = I.anchor_colors(probe)
    pat = r"rgb \((\d+),(\d+),(\d+)\)"
    claim = [F.regexp_extract("caption", pat, i + 1).cast("int").alias(n)
             for i, n in enumerate(["cr", "cg", "cb"])]
    p = anchored.select("image_id", "r0", "g0", "b0", *claim)
    delta = F.greatest(F.abs(F.col("r0") - F.col("cr")),
                       F.abs(F.col("g0") - F.col("cg")),
                       F.abs(F.col("b0") - F.col("cb")))
    return p.where(delta <= 2)


def _aspect(df):
    w, h = F.col("w"), F.col("h")
    gated = df.select(F.col("image_id").cast("long").alias("image_id"),
                      "w", "h").where(
        (F.least(w, h) >= 24) & (2 * w >= h) & (2 * h >= w))
    scores = [(F.abs(w * bh - h * bw) * (12 // bh)).alias(f"s{i}")
              for i, (bw, bh) in enumerate(_BUCKETS)]
    scored = gated.select("image_id", "w", "h", *scores)
    m = F.least(*[F.col(f"s{i}") for i in range(len(_BUCKETS))])
    idx = F.when(F.col("s0") == m, 0)
    for i in range(1, len(_BUCKETS)):
        idx = idx.when(F.col(f"s{i}") == m, i)
    bkt = scored.select("image_id", idx.alias("b"),
                        (F.col("image_id") % 64).alias("shard"))
    win = Window.partitionBy("b", "shard").orderBy("image_id")
    return bkt.withColumn("rn", F.row_number().over(win))


def _dedup(df):
    d = df.select(F.col("image_id").cast("long").alias("image_id"),
                  F.md5("bytes").alias("k"))
    reps = d.groupBy("k").agg(F.min("image_id").alias("kept_id"))
    return (d.join(reps, "k")
             .where(F.col("image_id") > F.col("kept_id")))


def main() -> None:
    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
    spark = get_spark("image_leg_bench", cores=cores)

    imgs = I.images_table_mixed(spark, n).localCheckpoint(eager=True)
    payload_mb = (imgs.select(F.sum(F.length("bytes")))
                  .collect()[0][0]) / 1e6
    # warm every python daemon worker (one per task slot), not just one
    I.anchor_colors(I.images_table_mixed(spark, cores * 64)).count()

    out = {"cores": cores, "n_images": n,
           "payload_mb": round(payload_mb, 1)}
    for name, fn in [("align", _align), ("aspect", _aspect),
                     ("dedup", _dedup)]:
        best = None
        for _ in range(2):
            t0 = time.time()
            rows = fn(imgs).count()
            best = min(best or 1e9, time.time() - t0)
        out[name] = {
            "sec": round(best, 3),
            "rows_out": rows,
            "rows_per_sec": round(n / best),
            "payload_mb_per_sec": round(payload_mb / best, 1),
        }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
