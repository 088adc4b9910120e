"""Deterministic corpus sampling / splitting (training-data curation).

A 100 TB pipeline cannot use engine-native random sampling for curation:
``df.sample``/TABLESAMPLE draws depend on partitioning and Spark
internals, so the selected set changes across engines, cluster sizes and
reruns — unacceptable for a train/val/test split that must be stable for
the lifetime of a model.  The standard fix is HASH-THRESHOLD sampling:
a row is selected iff ``md5(key || ':' || seed)`` falls below a
threshold.  Selection is then a pure function of (key, seed) — stable
under repartitioning, engine-portable (any engine with md5), and
consistent across tables (join two tables on key and both sides agree on
membership).

Implementation note: the threshold compare is done LEXICOGRAPHICALLY on
the first 8 hex chars of the digest (both Spark and DuckDB emit
lowercase hex md5), which sidesteps hex->int conversion differences
between engines entirely; ``frac`` maps to ``format(int(frac*2^32),
'08x')`` and frac>=1 uses the sentinel ``'g'`` (greater than every hex
character).  Everything is built-in column algebra — codegen-native, no
UDFs, no shuffle for the filters themselves.

The reference has no sampling surface (it crawls everything); these are
part of the beyond-reference training-pipeline operator set
(COVERAGE.md "LLM-data-pipeline operators").
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hex_threshold(frac: float) -> str:
    """First-8-hex-chars threshold for a keep fraction in [0, 1]."""
    if frac >= 1.0:
        return "g"  # greater than every hex char -> keep everything
    if frac <= 0.0:
        return "00000000"
    return format(int(frac * 2**32), "08x")


def _hash_prefix(key: Column, seed: str) -> Column:
    """First 8 hex chars of md5(key ':' seed) — the sampling coordinate.

    ``concat`` (NOT concat_ws, which silently SKIPS null args) so a NULL
    key yields a NULL coordinate, exactly like the oracle restatement's
    ``CAST(key) || ':' || seed`` — on both engines NULL-key rows then
    fail every threshold compare (excluded from samples, routed to the
    CASE/otherwise 'train' branch of the split)."""
    return F.substring(
        F.md5(F.concat(key.cast("string"), F.lit(":"), F.lit(seed))
              .cast("binary")),
        1, 8)


def hash_sample(
    df: DataFrame, key_col: str, frac: float, seed: str = "s0"
) -> DataFrame:
    """Keep a deterministic ``frac`` of rows, selected by key hash."""
    return df.where(_hash_prefix(F.col(key_col), seed)
                    < F.lit(hex_threshold(frac)))


def stratified_sample(
    df: DataFrame,
    key_col: str,
    stratum_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    seed: str = "s0",
) -> DataFrame:
    """Per-stratum hash-threshold sampling (e.g. downsample dominant
    languages, keep rare ones whole).  ``rates`` maps stratum value ->
    keep fraction; unlisted strata use ``default_rate``."""
    thresh = F.lit(hex_threshold(default_rate))
    for value, frac in rates.items():
        thresh = F.when(F.col(stratum_col) == value,
                        F.lit(hex_threshold(frac))).otherwise(thresh)
    return df.where(_hash_prefix(F.col(key_col), seed) < thresh)


def train_val_test_split(
    df: DataFrame,
    key_col: str,
    val_frac: float = 0.1,
    test_frac: float = 0.1,
    seed: str = "split0",
) -> DataFrame:
    """Label every row with a stable 'train'/'val'/'test' split column.
    Membership is a pure function of (key, seed): stable across reruns,
    repartitioning and engines, and consistent for any table keyed the
    same way."""
    h = _hash_prefix(F.col(key_col), seed)
    t_val = hex_threshold(val_frac)
    t_test = hex_threshold(val_frac + test_frac)
    return df.withColumn(
        "split",
        F.when(h < F.lit(t_val), F.lit("val"))
         .when(h < F.lit(t_test), F.lit("test"))
         .otherwise(F.lit("train")),
    )


def oracle_hash_prefix_sql(key_sql: str, seed: str) -> str:
    """The DuckDB restatement of ``_hash_prefix`` (engines agree on
    lowercase-hex md5 of the same string)."""
    return f"substr(md5(CAST({key_sql} AS VARCHAR) || ':' || '{seed}'), 1, 8)"
