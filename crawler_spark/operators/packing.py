"""Sequence packing for pretraining batches: assign each document to a
fixed token-capacity bin, shard-locally and deterministically.

Real packers fill a sequence of ``capacity`` tokens from a stream of
docs, splitting/padding at bin boundaries. The distributed form packs
per shard (a worker packs only its own slice — global packing order is
neither needed nor wanted), which maps exactly onto Spark: a
deterministic bucket column partitions the corpus, and a bucket-local
running token count assigns bins. One shuffle (the window exchange on
bucket); no global sort, no single-partition window — the scale trap a
corpus-wide ORDER BY would be.

Policy (documented, engine-portable): within a bucket docs pack in
id order; a doc is assigned to the bin where its first token lands
(``bin_id = prefix_sum_exclusive // capacity``) and ``bin_offset``
says where in that bin it starts — the information a boundary-splitting
writer needs. Docs longer than ``capacity`` simply span bins, as in a
real packer. Every output is integer arithmetic on (id, token count),
so the DuckDB oracle runs the literal same window expression.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def pack_sequences(
    df: DataFrame,
    id_col: str,
    n_tokens: Column,
    capacity: int = 512,
    n_buckets: int = 8,
    partition_extra: tuple[str, ...] = (),
) -> DataFrame:
    """(*partition_extra, id, n_tokens, bucket, bin_id, bin_offset) per
    input row.

    ``n_tokens``: column expression giving the row's token count.
    ``bucket = id % n_buckets`` shards the corpus (at scale n_buckets ≫
    cores, so each bucket's window is partition-local after one
    exchange); ``bin_id``/``bin_offset`` derive from the exclusive
    prefix sum of token counts within the bucket in id order.
    ``partition_extra``: additional sharding columns prepended to the
    window partition (e.g. ``("split",)`` packs each train/val/test
    split independently — bins never span splits).
    """
    kid = F.col(id_col)
    w = (
        W.partitionBy(*partition_extra, "bucket")
        .orderBy(id_col)
        .rowsBetween(W.unboundedPreceding, -1)
    )
    return (
        df.select(
            *partition_extra,
            kid,
            n_tokens.cast("bigint").alias("n_tokens"),
            (kid % n_buckets).alias("bucket"),
        )
        .withColumn(
            "cum_excl", F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
        )
        .select(
            *partition_extra,
            id_col,
            "n_tokens",
            "bucket",
            # integral DIV, not floor(double /): a double quotient rounds
            # past 2^53 cumulative tokens per bucket and could disagree
            # with the oracle's exact // near bin boundaries.
            F.expr(f"cum_excl DIV {int(capacity)}").alias("bin_id"),
            (F.col("cum_excl") % capacity).alias("bin_offset"),
        )
    )
