"""Scale probes for the round-4 curation operators (r04 verdict #6):

1. near_dup_clusters machinery (connected_components) on a 10M-edge
   Zipf-hot graph + a planted long chain — verify O(log diameter)
   iterations hold and the per-iteration driver barrier stays
   sub-second-ish at this volume.
2. sequence_packing at 100M rows — one window exchange; report wall and
   rows/s (token counts synthesized arithmetically; the probe measures
   the WINDOW, not tokenization).
3. decontaminate with a ~10^6-gram eval set — broadcast vs shuffle wall
   at the same input, evidencing the seam and the ceiling's direction.

All inputs are deterministic column algebra over spark.range (no data
files).  Prints one JSON line.

Usage: python scripts/curation_scale_probe.py [edges_m] [pack_m] [eval_docs]
(defaults 10, 100, 20000)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from crawler_spark.session import get_spark  # noqa: E402


def probe_components(spark, n_edges: int) -> dict:
    """Zipf-hot random graph (node = N // rank, rank uniform — frequency
    of node n falls off ~1/n^2, a heavy hub head) over N = n_edges nodes,
    plus a planted 4,096-node path so the diameter is KNOWN large: the
    O(log d) claim then predicts ~log2(4096)=12-ish iterations, not the
    2-3 a hub graph alone would converge in."""
    from crawler_spark.operators.dedup import connected_components

    n = n_edges
    chain_len = 4096
    rnd = (
        spark.range(n - chain_len)
        .select(
            (F.floor(n / (F.pmod(F.xxhash64(F.col("id") * 2 + 1), n - 1) + 1))
             ).alias("id_a"),
            F.pmod(F.xxhash64(F.col("id") * 2 + 2), F.lit(n)).alias("id_b"),
        )
        .where(F.col("id_a") != F.col("id_b"))
    )
    # the planted path lives on its own id range so the hub graph can't
    # short-circuit it: nodes n*2 .. n*2+chain_len
    chain = spark.range(chain_len - 1).select(
        (F.col("id") + 2 * n).alias("id_a"),
        (F.col("id") + 2 * n + 1).alias("id_b"),
    )
    edges = rnd.union(chain).localCheckpoint(eager=True)
    n_edges_actual = edges.count()
    stats: dict = {}
    t0 = time.perf_counter()
    comp = connected_components(edges, max_iters=60, stats=stats)
    n_nodes = comp.count()
    wall = round(time.perf_counter() - t0, 2)
    # sanity: the planted chain must be ONE component with the min label
    chain_reps = (
        comp.where((F.col("node") >= 2 * n))
        .agg(F.countDistinct("rep").alias("r"),
             F.min("rep").alias("m")).collect()[0]
    )
    assert chain_reps["r"] == 1 and chain_reps["m"] == 2 * n, chain_reps
    return {
        "n_edges": n_edges_actual,
        "n_nodes": n_nodes,
        "iters": stats["iters"],
        "iter_secs": stats["iter_secs"],
        "max_iter_sec": max(stats["iter_secs"]),
        "wall_sec": wall,
        "planted_chain_len": chain_len,
        "log2_chain": 12,
    }


def probe_packing(spark, n_rows: int) -> dict:
    from crawler_spark.operators.packing import pack_sequences

    docs = spark.range(n_rows).select(
        F.col("id").alias("doc_id"),
        (F.pmod(F.xxhash64("id"), F.lit(900)) + 100).alias("n_tok"),
    )
    # n_buckets >> cores so each bucket's window is partition-local
    t0 = time.perf_counter()
    out = pack_sequences(docs, "doc_id", F.col("n_tok"),
                         capacity=2048, n_buckets=4096)
    agg = out.agg(F.count("*").alias("n"),
                  F.max("bin_id").alias("max_bin")).collect()[0]
    wall = round(time.perf_counter() - t0, 2)
    return {"n_rows": int(agg["n"]), "max_bin": int(agg["max_bin"]),
            "wall_sec": wall,
            "rows_per_sec": round(agg["n"] / wall)}


def probe_decontaminate(spark, n_eval_docs: int) -> dict:
    """Eval docs of ~60 tokens -> ~57 distinct 4-grams each: 20k docs
    ~= 1.1M grams (the 10^6-gram ceiling probe). Corpus = 200k docs of
    the same shape, 10% of them seeded with eval text (real overlap)."""
    from crawler_spark.operators.dedup import decontaminate

    def mk(nm, n, seed):
        toks = F.transform(
            F.sequence(F.lit(0), F.lit(59)),
            lambda i: F.conv(
                F.pmod(F.xxhash64(F.col("id") * 61 + i + seed),
                       F.lit(10_000_000)).cast("string"), 10, 36),
        )
        return spark.range(n).select(
            F.col("id").alias("doc_id"),
            F.array_join(toks, " ").alias("text"),
        )

    ev = mk("ev", n_eval_docs, seed=7).localCheckpoint(eager=True)
    base = mk("tr", n_eval_docs * 10, seed=7_000_000)
    # 10% contaminated: replace text with an eval doc's text
    tr = base.join(
        ev.select((F.col("doc_id") * 10).alias("doc_id"),
                  F.col("text").alias("ev_text")),
        "doc_id", "left",
    ).select(
        "doc_id", F.coalesce("ev_text", "text").alias("text")
    ).localCheckpoint(eager=True)

    out = {"n_eval_docs": n_eval_docs, "n_corpus_docs": n_eval_docs * 10}
    n_grams = None
    for mode in ("broadcast", "shuffle"):
        t0 = time.perf_counter()
        res = decontaminate(tr, ev, "doc_id", "text", n=4, join_mode=mode)
        cnt = res.count()
        out[f"{mode}_sec"] = round(time.perf_counter() - t0, 2)
        out[f"{mode}_contaminated"] = cnt
    from crawler_spark.operators.dedup import ngram_hashes_exploded
    n_grams = ngram_hashes_exploded(ev, "doc_id", "text", 4) \
        .select("_g").distinct().count()
    out["n_eval_grams"] = n_grams
    assert out["broadcast_contaminated"] == out["shuffle_contaminated"]
    return out


def main() -> None:
    edges_m = float(sys.argv[1]) if len(sys.argv) > 1 else 10.0
    pack_m = float(sys.argv[2]) if len(sys.argv) > 2 else 100.0
    eval_docs = int(sys.argv[3]) if len(sys.argv) > 3 else 20_000
    spark = get_spark("curation_scale_probe", cores=32)
    spark.range(10).count()  # JVM warm-up out of the timings
    result = {
        "components": probe_components(spark, int(edges_m * 1e6)),
        "packing": probe_packing(spark, int(pack_m * 1e6)),
        "decontaminate": probe_decontaminate(spark, eval_docs),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
