"""Corpus mixing: per-domain (per-source) quota capping.

Web-scale training corpora cap how many documents any one domain may
contribute (RefinedWeb/C4 style): without a cap, a handful of mega-hosts
dominate the token budget. ``quota_cap`` keeps the top ``cap`` documents
per key by a caller-supplied quality order.

Scale shape: a plain ``row_number`` window over the domain key serializes
each domain into one task — a mega-domain with billions of docs becomes
the straggler. So this reuses the frontier scheduler's salted two-phase
top-k (SURVEY.md E2/E4): phase 1 ranks within (key, salt) and keeps a
local top-``cap`` (a hot key spreads over ``salt_buckets`` tasks), phase 2
ranks the <= cap*salt_buckets survivors per key exactly. The global
top-cap is always contained in the union of per-salt top-caps, so the
result is bit-identical to the single-window form.

Reference analogue: the crawler caps per-domain fetch volume through its
priority queue budget (SURVEY.md E2); this is the corpus-side equivalent.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

__all__ = ["quota_cap"]


def quota_cap(
    df: DataFrame,
    key_col: str,
    order_cols: list[Column],
    cap: int,
    salt_buckets: int = 8,
    rank_col: str = "quota_rank",
) -> DataFrame:
    """Keep the top ``cap`` rows per ``key_col`` under ``order_cols``.

    ``order_cols`` must be a total order within each key (include a
    unique id as the last column) — otherwise the kept set is
    nondeterministic under ties, which breaks resume/oracle identity.
    Adds ``rank_col`` (1-based rank within the key).
    """
    # salt from the deterministic hash of the full order key's last
    # column expression would be ideal; hashing all input columns via
    # xxhash64 on the row's unique tiebreak keeps salting stable across
    # repartitions. Callers pass the unique id last in order_cols.
    r = str(order_cols[-1])  # SortOrder reprs as Column<'x ASC NULLS FIRST'>
    if " ASC NULLS " in r or " DESC NULLS " in r:
        raise ValueError(
            "quota_cap's LAST order column is hashed for the salt and "
            "must be a plain Column (the unique id), not a "
            ".asc()/.desc() SortOrder — ascending is implied; earlier "
            "columns may carry sort direction freely")
    salt = F.pmod(F.xxhash64(order_cols[-1].cast("string")),
                  F.lit(salt_buckets))
    w_local = W.partitionBy(key_col, "__salt").orderBy(*order_cols)
    local = (
        df.withColumn("__salt", salt)
        .withColumn("__lr", F.row_number().over(w_local))
        .where(F.col("__lr") <= cap)
        .drop("__lr")
    )
    w_key = W.partitionBy(key_col).orderBy(*order_cols)
    return (
        local.withColumn(rank_col, F.row_number().over(w_key).cast("int"))
        .where(F.col(rank_col) <= cap)
        .drop("__salt")
    )
