"""Deterministic sampling / split driver queries (training-data
curation).  Selection is a pure function of (key, seed) — the md5-prefix
threshold of ``operators/sampling.py`` — so DuckDB reproduces the EXACT
same membership from the same SQL expression: full value oracles with no
randomness caveat (the reason engine-native ``sample``/TABLESAMPLE is
unusable for a durable split).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import register
from ..operators.sampling import (
    hex_threshold,
    oracle_hash_prefix_sql,
    stratified_sample,
    train_val_test_split,
)
from ..sources.testdata import load_table

_SEED_SPLIT, _VAL, _TEST = "split0", 0.1, 0.1
_SEED_STRAT = "s0"
_RATES = {"en": 0.5}
_DEFAULT_RATE = 0.25

_H_SPLIT = oracle_hash_prefix_sql("doc_id", _SEED_SPLIT)
_H_STRAT = oracle_hash_prefix_sql("doc_id", _SEED_STRAT)


@register(
    "corpus_split_stats",
    oracle=f"""
    WITH labeled AS (
      SELECT lang, n_chars,
             CASE WHEN {_H_SPLIT} < '{hex_threshold(_VAL)}' THEN 'val'
                  WHEN {_H_SPLIT} < '{hex_threshold(_VAL + _TEST)}'
                    THEN 'test'
                  ELSE 'train' END AS split
      FROM documents
    )
    SELECT split, lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS n_chars
    FROM labeled GROUP BY split, lang
    """,
)
def corpus_split_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stable train/val/test split of the corpus (hash-threshold on
    doc_id — invariant under repartitioning, engines and reruns) rolled
    up per (split, lang).  The curation primitive every training
    pipeline needs to be deterministic at 100 TB."""
    docs = load_table(spark, sf_dir, "documents")
    labeled = train_val_test_split(docs, "doc_id", _VAL, _TEST,
                                   seed=_SEED_SPLIT)
    return labeled.groupBy("split", "lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("n_chars"),
    )


@register(
    "stratified_sample",
    oracle=f"""
    SELECT doc_id, lang
    FROM documents
    WHERE {_H_STRAT} <
          CASE WHEN lang = 'en' THEN '{hex_threshold(_RATES["en"])}'
               ELSE '{hex_threshold(_DEFAULT_RATE)}' END
    """,
)
def stratified_sample_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stratum deterministic downsampling (keep 50% of the dominant
    'en', 25% of everything else).  Tail query: the hash-threshold
    machinery is driver-proven by corpus_split_stats; the per-stratum
    rate CASE is the only delta."""
    docs = load_table(spark, sf_dir, "documents")
    return stratified_sample(
        docs, "doc_id", "lang", _RATES, default_rate=_DEFAULT_RATE,
        seed=_SEED_STRAT,
    ).select("doc_id", "lang")
