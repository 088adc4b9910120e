"""crawler_spark — a PySpark-native URL-frontier + fetch-scheduler analytics engine.

A from-scratch rebuild of the query/data-processing capabilities of the
reference crawler (Sam-Radnus/Crawler, surveyed in SURVEY.md), re-expressed
Spark-first: DataFrame/SQL plans optimized by Catalyst, vectorized
pandas/Arrow UDFs for the few non-relational steps (URL canonicalization,
HTML-ish parsing, image codec), and an atomic round-snapshot table layer
standing in for Iceberg (no Iceberg runtime jar in this sandbox).

Layout:
  session.py    - SparkSession builder (AQE, Arrow, UTC, sane shuffle sizing)
  sources/      - table IO: snapshot tables w/ atomic commits, testdata loaders
  functions/    - scalar/vectorized functions: urls, parsing, text, images
  operators/    - frontier, scheduler, dedup, similarity (the engine core)
  plans/        - the oracle-checked query layer (DataFrame plans + ANSI SQL)
  streaming/    - Structured Streaming round driver (foreachBatch)
"""

__version__ = "0.1.0"
