"""Repetition-based document quality signals (Gopher-style filters).

Large-scale pretraining corpora drop documents dominated by repeated
content — boilerplate, keyword stuffing, templated spam. The published
MassiveText/Gopher rules measure this as (a) the fraction of the
document's n-gram occurrences covered by its single most frequent
n-gram and (b) the fraction of occurrences belonging to any duplicated
n-gram, plus token-level duplication. This module computes those
signals with pure DataFrame algebra:

  tokens   split -> explode -> per-doc count / count-distinct
  bigrams  zip_with over two array slices (shuffle-free construction)
           -> explode -> (doc, gram) count -> per-doc max / sum

Scale shape: two aggregations keyed by doc_id (+gram), both with
map-side partial aggregation, joined on doc_id — linear in corpus
size, no window over the corpus, no driver-side state. The gate uses
integer cross-multiplication (``5*top <= n`` == top/n <= 0.2) so the
keep decision is engine-exact for the DuckDB oracle; all outputs are
BIGINT counts, never floats.

Reference analogue: the reference filters short/blocked content only
(html_downloader.py:255-278); repetition filtering is the published
curation step a training-data user adds on top.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Gopher-flavoured default gates, as integer cross-multiplications:
#   top bigram covers > 20% of bigram occurrences  -> drop
#   duplicate tokens exceed 30% of all tokens      -> drop
# Both apply only at >= MIN_REPETITION_TOKENS: below that the top-bigram
# share is >= 1/(n-1) for ANY doc, so the ratio measures length, not
# repetition (published pipelines gate repetition above a length floor;
# length filtering itself is a separate rule — see TX.quality_score).
TOP_BIGRAM_MAX_NUM, TOP_BIGRAM_MAX_DEN = 1, 5
DUP_TOKEN_MAX_NUM, DUP_TOKEN_MAX_DEN = 3, 10
MIN_REPETITION_TOKENS = 20


def repetition_signals(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = MIN_REPETITION_TOKENS,
) -> DataFrame:
    """Per-document repetition counts + the keep gate.

    Output: id, n_tokens, n_distinct_tokens, n_bigrams,
    top_bigram_count, dup_bigram_occurrences, keep (int 0/1).
    Documents with < 2 tokens have no bigrams and are dropped (same
    inner-join semantics as the SQL restatement).

    Tokenization splits on whitespace RUNS (\\s+) and drops empty
    tokens: real crawled text has newlines/tabs/double spaces, and a
    single-space split would turn every extra blank into a duplicate
    '' token that falsely fails the dup-token gate (review finding
    r05).
    """
    toks = docs.select(
        id_col,
        F.filter(F.split(F.col(text_col), r"\s+"),
                 lambda x: x != F.lit("")).alias("toks"),
    )

    tok_stats = (
        toks.select(id_col, F.explode("toks").alias("tk"))
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_tokens"),
            F.countDistinct("tk").alias("n_distinct_tokens"),
        )
    )

    bigrams = toks.select(
        id_col,
        F.explode(
            F.expr(
                "zip_with(slice(toks, 1, size(toks) - 1), "
                "slice(toks, 2, size(toks) - 1), "
                "(a, b) -> concat(a, ' ', b))"
            )
        ).alias("gram"),
    )
    bigram_stats = (
        bigrams.groupBy(id_col, "gram")
        .agg(F.count("*").alias("c"))
        .groupBy(id_col)
        .agg(
            F.sum("c").alias("n_bigrams"),
            F.max("c").alias("top_bigram_count"),
            F.coalesce(
                F.sum(F.when(F.col("c") > 1, F.col("c"))), F.lit(0)
            ).cast("long").alias("dup_bigram_occurrences"),
        )
    )

    # integer-only comparison (no float division): den*top <= num*n
    keep = (F.col("n_tokens") < F.lit(min_tokens)) | (
        (F.lit(TOP_BIGRAM_MAX_DEN) * F.col("top_bigram_count")
         <= F.lit(TOP_BIGRAM_MAX_NUM) * F.col("n_bigrams"))
        & (F.lit(DUP_TOKEN_MAX_DEN)
           * (F.col("n_tokens") - F.col("n_distinct_tokens"))
           <= F.lit(DUP_TOKEN_MAX_NUM) * F.col("n_tokens"))
    )
    return (
        tok_stats.join(bigram_stats, id_col)
        .select(
            id_col, "n_tokens", "n_distinct_tokens", "n_bigrams",
            "top_bigram_count", "dup_bigram_occurrences",
            keep.cast("int").alias("keep"),
        )
    )
