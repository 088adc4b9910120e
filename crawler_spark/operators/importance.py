"""DSIR-style hashed-token importance weights for data selection.

Data Selection via Importance Resampling (Xie et al., 2023) scores every
raw document by how much its hashed n-gram feature mass looks like a
small in-domain target corpus versus the raw corpus, then keeps the
highest-importance documents.  This module computes the per-document
importance as an ENGINE-EXACT rational number instead of DSIR's
log-likelihood ratio: integer hit-mass sums (numerator = target-corpus
token mass over the doc's hashed buckets, denominator = raw-corpus mass
over the same buckets) compare across engines bit-identically, while a
float log-ratio would not survive the driver's value hash.  Selection
thresholds use integer cross-multiplication (num * den_thresh >
den * num_thresh), the same exactness pattern as the quality gates in
operators/quality.py.

Buckets are the first two hex chars of md5(token) — 256 buckets keyed by
the hex STRING itself, so no hex->int conversion has to agree between
engines (the operators/sampling.py lesson).  The bucket-stats table is
256 rows -> broadcast; the per-doc aggregation has map-side partials.
Shape at 100 TB: one explode over distinct tokens, one tiny agg for the
stats, one broadcast join back, one keyed sum per doc — no all-pairs,
nothing driver-side.

The reference crawler has no data-selection surface; this belongs to the
beyond-reference training-pipeline operator set (COVERAGE.md
"LLM-data-pipeline operators"), alongside quota_cap (RefinedWeb mixing)
and semantic_diversify (SemDeDup).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["token_bucket", "importance_weights"]

N_BUCKETS = 256  # 2 hex chars of md5 — fixed, engine-portable


def token_bucket(tok: Column, bucket_family: str = "md5") -> Column:
    """Hashed feature bucket of a token.

    ``"md5"`` — first 2 hex chars (a 256-bucket STRING key; restatable
    in any engine with md5, so the DuckDB oracle form).
    ``"xxhash64"`` — pmod(xxhash64, 256): JVM-native, measured ~1.7x
    faster through the full weights job at 2M docs (the production
    form; not restatable in DuckDB).  Weights differ only by which
    tokens share a bucket — both are uniform 256-way hashes.
    """
    if bucket_family == "xxhash64":
        return F.pmod(F.xxhash64(tok), F.lit(N_BUCKETS))
    if bucket_family == "md5":
        return F.substring(F.md5(tok), 1, 2)
    raise ValueError(f"unknown bucket_family: {bucket_family!r}")


def _doc_token_buckets(
    df: DataFrame, id_col: str, text_col: str, target_pred: Column,
    bucket_family: str = "md5",
) -> DataFrame:
    """(_id, _is_target, _b): one row per (doc, distinct whitespace
    token) with the token's bucket; the doc-level target flag is carried
    through the explode so no join back is ever needed.  Whitespace-run
    split (the test_quality lesson: single-space split manufactures ''
    tokens from newlines)."""
    toks = F.array_distinct(
        F.filter(F.split(F.col(text_col), r"\s+"), lambda t: t != "")
    )
    return df.select(
        F.col(id_col).alias("_id"),
        target_pred.alias("_is_target"),
        F.explode(toks).alias("_t"),
    ).select("_id", "_is_target",
             token_bucket(F.col("_t"), bucket_family).alias("_b"))


def importance_weights(
    df: DataFrame,
    id_col: str,
    text_col: str,
    target_pred: Column,
    bucket_family: str = "md5",
) -> DataFrame:
    """Per-document importance as exact integers.

    Returns (id_col, n_tokens, imp_num, imp_den):

    * ``n_tokens``  — the doc's distinct-token count (its feature mass)
    * ``imp_num``   — sum over the doc's tokens of how many target-corpus
                      (doc, token) pairs share the token's bucket
    * ``imp_den``   — same sum over the whole raw corpus

    imp_num/imp_den estimates p_target(doc features)/p_raw(doc features)
    up to the constant |target|/|raw| factor; rank or threshold with
    integer cross-multiplication, never floats.  ``target_pred`` marks
    the in-domain rows of ``df`` itself (e.g. a trusted-source or
    language predicate); for an external target corpus, union it in with
    the predicate set on provenance.
    """
    flagged = _doc_token_buckets(
        df, id_col, text_col, target_pred, bucket_family)
    stats = flagged.groupBy("_b").agg(
        F.count("*").alias("_raw_cnt"),
        F.sum(F.col("_is_target").cast("long")).alias("_tgt_cnt"),
    )
    scored = (
        flagged.select("_id", "_b")
        .join(F.broadcast(stats), "_b")
        .groupBy("_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum("_tgt_cnt").alias("imp_num"),
            F.sum("_raw_cnt").alias("imp_den"),
        )
    )
    return scored.select(
        F.col("_id").alias(id_col),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("imp_num").cast("long").alias("imp_num"),
        F.col("imp_den").cast("long").alias("imp_den"),
    )
