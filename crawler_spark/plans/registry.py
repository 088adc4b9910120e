"""Query registry: name -> (Spark DataFrame plan, DuckDB oracle SQL).

Each registered query is a callable ``(spark, sf_dir) -> DataFrame`` built
with the DataFrame API (Catalyst-optimized), paired with an ANSI-SQL string
DuckDB can execute over the same parquet tables. The driver compares
row-count + schema + order-insensitive value hash, so every computed column
is aliased identically on both sides and aggregates are cast to exact
decimal types to make values engine-independent.

Queries whose semantics are not SQL-expressible (vectorized-UDF pipelines,
stateful streaming) register with ``oracle=None`` — the driver then records
a rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    """Decorator: register a query plan and (optionally) its oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(
                f"duplicate query registration: {name!r} — a silent "
                "overwrite could pair the new plan with a stale oracle")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco
