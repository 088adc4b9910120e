"""Relational query layer — the reference's API/read surface re-expressed
as Catalyst-optimized DataFrame plans over the driver testdata.

Each query maps a surveyed reference operator (SURVEY.md §2, cites into
/root/reference) onto the testdata star schema. Determinism rules shared
with the DuckDB oracles:

* money/metric arithmetic is exact decimal *internally*, but every column
  that reaches the output is emitted as ROUND(CAST(x AS DOUBLE), n) (or
  BIGINT) on BOTH engines — the driver harness hashes DuckDB DECIMAL /
  HUGEINT differently from Spark DecimalType even when values are equal
  (round-1 lesson: 8 hash_match failures, all value-identical);
* ratios are exact-decimal sums cast to double then divided and rounded —
  IEEE doubles over identical inputs are bit-identical;
* synthesized geo coordinates are kept as INTEGER tenth-degrees
  (lat10/lon10) wherever they appear in output, so no float formatting is
  hashed; doubles appear only inside filters with safe margins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..sources.testdata import load_table
from .registry import register

# ---------------------------------------------------------------------------
# Derived geo dimension: the testdata has no coordinates, so both engines
# derive deterministic integer tenth-degree coords from c_custkey. This
# models the reference's pages(latitude, longitude) columns
# (worker/src/crawler/storage/database_service.py:56-57).
# ---------------------------------------------------------------------------

GEO_SQL = (
    "SELECT c_custkey, c_nationkey, c_mktsegment, c_acctbal, "
    "CAST(c_custkey * 37 % 1800 - 900 AS INT) AS lat10, "
    "CAST(c_custkey * 73 % 3600 - 1800 AS INT) AS lon10 "
    "FROM customer"
)


def _geo(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        "c_nationkey",
        "c_mktsegment",
        "c_acctbal",
        (F.col("c_custkey") * 37 % 1800 - 900).cast("int").alias("lat10"),
        (F.col("c_custkey") * 73 % 3600 - 1800).cast("int").alias("lon10"),
    )


def _haversine_km(lat_deg, lon_deg):
    """Great-circle distance from (0,0) in km — replaces PostGIS ST_DWithin
    (api/main.py:81-90) with native trig (whole-stage codegen, no UDF)."""
    half_lat = F.radians(lat_deg) / 2
    half_lon = F.radians(lon_deg) / 2
    a = F.pow(F.sin(half_lat), 2) + F.cos(F.radians(F.lit(0.0))) * F.cos(
        F.radians(lat_deg)
    ) * F.pow(F.sin(half_lon), 2)
    return 2 * 6371.0 * F.asin(F.sqrt(a))


HAVERSINE_SQL = (
    "2*6371.0*asin(sqrt(pow(sin(radians({lat})/2),2) "
    "+ cos(radians(0.0))*cos(radians({lat}))*pow(sin(radians({lon})/2),2)))"
)


# ---------------------------------------------------------------------------
# K1 — LIMIT/OFFSET pagination (api/main.py:57-70). Spark has no stable
# OFFSET without order → row_number window over the sort key.
# ---------------------------------------------------------------------------
@register(
    "pages_paginate",
    oracle="""
    SELECT o_orderkey, o_orderstatus,
           ROUND(CAST(o_totalprice AS DOUBLE), 2) AS total_price
    FROM orders
    ORDER BY o_orderkey
    LIMIT 20 OFFSET 40
    """,
)
def pages_paginate(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = W.orderBy("o_orderkey")
    return (
        o.select(
            "o_orderkey",
            "o_orderstatus",
            F.round(F.col("o_totalprice").cast("double"), 2).alias("total_price"),
        )
        .withColumn("rn", F.row_number().over(w))
        .where((F.col("rn") > 40) & (F.col("rn") <= 60))
        .drop("rn")
    )


# ---------------------------------------------------------------------------
# F2/K3 — top-10 domain distribution (content_storage.py:209-217):
# groupBy(host).count().orderBy(desc).limit(10) — TakeOrderedAndProject.
# ---------------------------------------------------------------------------
@register(
    "top_domains",
    oracle="""
    SELECT source, COUNT(*) AS n_docs
    FROM documents
    GROUP BY source
    ORDER BY n_docs DESC, source
    LIMIT 10
    """,
)
def top_domains(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (
        d.groupBy("source")
        .agg(F.count("*").alias("n_docs"))
        .orderBy(F.desc("n_docs"), "source")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# F3 — success-rate stats (content_storage.py:198-231): conditional agg.
# "success" modeled as value > 100 (the testdata has no status_code).
# ---------------------------------------------------------------------------
@register(
    "success_rate",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CASE WHEN value > 100 THEN 1 ELSE 0 END) AS BIGINT) AS n_ok,
           ROUND(CAST(SUM(CASE WHEN value > 100 THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*), 4) AS ok_rate
    FROM events
    GROUP BY event_type
    """,
)
def success_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    n_ok = F.sum(F.when(F.col("value") > 100, 1).otherwise(0))
    return e.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        n_ok.alias("n_ok"),
        F.round(n_ok.cast("double") / F.count("*"), 4).alias("ok_rate"),
    )


# ---------------------------------------------------------------------------
# F4/C12 — heatmap grid aggregation (api/main.py:202-213):
# GROUP BY grid cell -> COUNT(*) weight, ORDER BY weight DESC LIMIT.
# Grid cell on integer tenth-degrees: floor(lat10/50) = 5-degree cells.
# ---------------------------------------------------------------------------
@register(
    "heatmap_grid",
    oracle="""
    WITH geo AS ({geo})
    SELECT CAST(FLOOR(lat10 / 50.0) AS INT) AS cell_lat,
           CAST(FLOOR(lon10 / 50.0) AS INT) AS cell_lon,
           COUNT(*) AS weight
    FROM geo
    GROUP BY 1, 2
    ORDER BY weight DESC, cell_lat, cell_lon
    LIMIT 100
    """.format(geo=GEO_SQL),
)
def heatmap_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = _geo(spark, sf_dir)
    return (
        g.groupBy(
            F.floor(F.col("lat10") / 50.0).cast("int").alias("cell_lat"),
            F.floor(F.col("lon10") / 50.0).cast("int").alias("cell_lon"),
        )
        .agg(F.count("*").alias("weight"))
        .orderBy(F.desc("weight"), "cell_lat", "cell_lon")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# J3 — radius search (api/main.py:81-90): ST_DWithin -> native haversine.
# ---------------------------------------------------------------------------
@register(
    "nearby_radius",
    oracle="""
    WITH geo AS ({geo})
    SELECT c_custkey,
           ROUND({hav}, 2) AS dist_km
    FROM geo
    WHERE {hav} <= 3000.0
    """.format(
        geo=GEO_SQL,
        hav=HAVERSINE_SQL.format(lat="lat10/10.0", lon="lon10/10.0"),
    ),
)
def nearby_radius(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = _geo(spark, sf_dir)
    dist = _haversine_km(F.col("lat10") / 10.0, F.col("lon10") / 10.0)
    return (
        g.withColumn("dist_km_raw", dist)
        .where(F.col("dist_km_raw") <= 3000.0)
        .select("c_custkey", F.round("dist_km_raw", 2).alias("dist_km"))
    )


# ---------------------------------------------------------------------------
# J4 — similar-properties self-join (api/main.py:152-187): broadcast the
# single base row, equi-join on type + price-band residual.
# ---------------------------------------------------------------------------
@register(
    "similar_properties",
    oracle="""
    WITH base AS (SELECT p_type, p_retailprice FROM part WHERE p_partkey = 1)
    SELECT p.p_partkey, p.p_type,
           ROUND(CAST(p.p_retailprice AS DOUBLE), 2) AS retail_price
    FROM part p, base b
    WHERE p.p_type = b.p_type
      AND p.p_retailprice BETWEEN b.p_retailprice * 0.8 AND b.p_retailprice * 1.2
      AND p.p_partkey <> 1
    """,
)
def similar_properties(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    base = p.where(F.col("p_partkey") == 1).select(
        F.col("p_type").alias("b_type"), F.col("p_retailprice").alias("b_price")
    )
    return (
        p.join(F.broadcast(base), p.p_type == base.b_type)
        .where(
            F.col("p_retailprice").between(
                F.col("b_price") * 0.8, F.col("b_price") * 1.2
            )
            & (F.col("p_partkey") != 1)
        )
        .select(
            "p_partkey",
            "p_type",
            F.round(F.col("p_retailprice").cast("double"), 2).alias("retail_price"),
        )
    )


# ---------------------------------------------------------------------------
# A16 composite — /properties/similar/nearby (api/main.py:93-143):
# ST_DWithin radius AND price BETWEEN AND optional type list AND
# LIMIT/OFFSET, all in ONE query. Each predicate is individually proven
# by nearby_radius / properties_by_price_type / pages_paginate; this is
# the composed endpoint form. Deterministic pagination: ORDER BY key
# before LIMIT/OFFSET (the reference paginates an unordered SELECT —
# nondeterministic under Postgres, SURVEY §8).
# ---------------------------------------------------------------------------
@register(
    "similar_nearby",
    oracle="""
    WITH geo AS (
      SELECT c_custkey,
             (CAST(c_custkey * 37 % 1000 AS DOUBLE) / 1000.0) * 10.0 + 35.0 AS lat,
             (CAST(c_custkey * 73 % 1000 AS DOUBLE) / 1000.0) * 10.0 - 100.0 AS lon,
             CAST(c_acctbal AS DOUBLE) AS price,
             CASE WHEN c_custkey % 3 = 0 THEN 'apartment'
                  WHEN c_custkey % 3 = 1 THEN 'house'
                  ELSE 'condo' END AS property_type
      FROM customer
    ), hits AS (
      SELECT c_custkey, price, property_type,
             ROUND(2 * 6371.0 * asin(sqrt(
               pow(sin(radians(lat - 40.0) / 2), 2)
               + cos(radians(lat)) * cos(radians(40.0))
               * pow(sin(radians(lon - (-95.0)) / 2), 2))), 1) AS dist_km
      FROM geo
      WHERE price BETWEEN 1000 AND 6000
        AND property_type IN ('apartment', 'condo')
    )
    SELECT c_custkey, ROUND(price, 2) AS price, property_type, dist_km
    FROM hits WHERE dist_km <= 400.0
    ORDER BY c_custkey LIMIT 50 OFFSET 2
    """,
)
def similar_nearby(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    geo = c.select(
        "c_custkey",
        ((k * 37 % 1000).cast("double") / 1000.0 * 10.0 + 35.0).alias("lat"),
        ((k * 73 % 1000).cast("double") / 1000.0 * 10.0 - 100.0).alias("lon"),
        F.col("c_acctbal").cast("double").alias("price"),
        F.when(k % 3 == 0, "apartment").when(k % 3 == 1, "house")
        .otherwise("condo").alias("property_type"),
    )
    # two-point haversine to the query center (40, -95), matching the
    # oracle expression term-for-term
    a = (
        F.pow(F.sin(F.radians(F.col("lat") - F.lit(40.0)) / 2), 2)
        + F.cos(F.radians("lat")) * F.cos(F.radians(F.lit(40.0)))
        * F.pow(F.sin(F.radians(F.col("lon") - F.lit(-95.0)) / 2), 2)
    )
    dist = F.round(2 * 6371.0 * F.asin(F.sqrt(a)), 1)
    return (
        geo.where(
            F.col("price").between(1000, 6000)
            & F.col("property_type").isin("apartment", "condo")
        )
        .withColumn("dist_km", dist)
        .where(F.col("dist_km") <= 400.0)
        .select("c_custkey", F.round("price", 2).alias("price"),
                "property_type", "dist_km")
        .orderBy("c_custkey")
        .offset(2).limit(50)
    )


# ---------------------------------------------------------------------------
# J5 — bounding-box filter (api/main.py:237-243): pure range predicates
# (integer comparisons -> parquet min/max pruning at scale).
# ---------------------------------------------------------------------------
@register(
    "bbox_filter",
    oracle="""
    WITH geo AS ({geo})
    SELECT c_custkey, lat10, lon10
    FROM geo
    WHERE lat10 BETWEEN 100 AND 600 AND lon10 BETWEEN -300 AND 400
    """.format(geo=GEO_SQL),
)
def bbox_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = _geo(spark, sf_dir)
    return g.where(
        F.col("lat10").between(100, 600) & F.col("lon10").between(-300, 400)
    ).select("c_custkey", "lat10", "lon10")


# ---------------------------------------------------------------------------
# E1/J1/G2 — priority assignment (geospatial/prioritizer.py:150-162):
# broadcast dim joins (city->state->region) + region->priority case +
# deterministic round-robin (row_number % 2) for "listing" rows, and the
# priority=-1 drop (worker.py:426-428 / B7).
# ---------------------------------------------------------------------------
@register(
    "priority_assign",
    oracle="""
    WITH joined AS (
      SELECT c.c_custkey, c.c_mktsegment, r.r_name
      FROM customer c
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
    ), prio AS (
      SELECT c_custkey,
             CASE WHEN c_mktsegment = 'BUILDING'
                  THEN 1 + (ROW_NUMBER() OVER (ORDER BY c_custkey) % 2)
                  WHEN r_name = 'AMERICA' THEN 3
                  WHEN r_name = 'ASIA' THEN 4
                  WHEN r_name = 'EUROPE' THEN 5
                  ELSE -1 END AS priority
      FROM joined
    )
    SELECT c_custkey, CAST(priority AS INT) AS priority
    FROM prio WHERE priority <> -1
    """,
)
def priority_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    joined = c.join(
        F.broadcast(n), c.c_nationkey == n.n_nationkey
    ).join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    # Round-robin over a *stable* key (not a mutable global counter as in
    # prioritizer.py:18,157-159) — deterministic at any parallelism.
    rr = F.row_number().over(W.orderBy("c_custkey")) % 2
    prio = (
        F.when(F.col("c_mktsegment") == "BUILDING", 1 + rr)
        .when(F.col("r_name") == "AMERICA", 3)
        .when(F.col("r_name") == "ASIA", 4)
        .when(F.col("r_name") == "EUROPE", 5)
        .otherwise(-1)
    )
    return (
        joined.select("c_custkey", prio.cast("int").alias("priority"))
        .where(F.col("priority") != -1)
    )


# ---------------------------------------------------------------------------
# E4 — per-host top-k fetch-batch pick: row_number over
# Window.partitionBy(host).orderBy(desc(priority), ts) <= k. Here: top-3
# events per user by value.
# ---------------------------------------------------------------------------
@register(
    "per_host_topk",
    oracle="""
    SELECT user_id, event_id, ROUND(CAST(value AS DOUBLE), 2) AS val
    FROM (
      SELECT user_id, event_id, value,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY value DESC, event_id) AS rn
      FROM events
    ) WHERE rn <= 3
    """,
)
def per_host_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.desc("value"), "event_id")
    return (
        e.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select(
            "user_id", "event_id",
            F.round(F.col("value").cast("double"), 2).alias("val"),
        )
    )


# ---------------------------------------------------------------------------
# G1 — politeness spacing (html_downloader.py:121-133): keep an event only
# if >= 10 min elapsed since the previous event of the same user (lag).
# ---------------------------------------------------------------------------
@register(
    "politeness_lag",
    oracle="""
    SELECT event_id, user_id, ts_ms
    FROM (
      SELECT event_id, user_id, epoch_ms(ts) AS ts_ms,
             LAG(epoch_ms(ts)) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev_ms
      FROM events
    ) WHERE prev_ms IS NULL OR ts_ms - prev_ms >= 600000
    """,
)
def politeness_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts_ms", "event_id")
    # events.ts is TIMESTAMP_NTZ in parquet; with UTC session tz the cast
    # to TIMESTAMP is epoch-preserving, matching DuckDB's epoch_ms.
    ts_ms = F.unix_millis(F.col("ts").cast("timestamp"))
    return (
        e.select("event_id", "user_id", ts_ms.alias("ts_ms"))
        .withColumn("prev_ms", F.lag("ts_ms").over(w))
        .where(F.col("prev_ms").isNull() | (F.col("ts_ms") - F.col("prev_ms") >= 600000))
        .drop("prev_ms")
    )


# ---------------------------------------------------------------------------
# D1 — frontier-new = extracted MINUS seen (anti-join): customers without
# a high-value order (left_anti replaces the per-URL bloom+DB check,
# worker.py:362 / database_service.py:78-85). The "seen" side is a
# *filtered* orders subset so the result is non-empty at every sf — the
# round-1 unfiltered form matched every customer and passed vacuously.
# ---------------------------------------------------------------------------
@register(
    "anti_join_unseen",
    oracle="""
    SELECT c_custkey FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 300000)
    """,
)
def anti_join_unseen(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(F.col("o_totalprice") > 300000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey")


# ---------------------------------------------------------------------------
# D5 — batch existence check (cache_service.py:200-212): left_semi join.
# ---------------------------------------------------------------------------
@register(
    "semi_join_seen",
    oracle="""
    SELECT c_custkey FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def semi_join_seen(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey")


# ---------------------------------------------------------------------------
# D3/D4 — exact dedupe, first-discovery-wins (database_service.py:48,
# link_extractor.py:33): keep the lowest doc_id per content hash.
# ---------------------------------------------------------------------------
@register(
    "dedup_first_wins",
    oracle="""
    SELECT doc_id, content_hash
    FROM (
      SELECT doc_id, md5(text) AS content_hash,
             ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
      FROM documents
    ) WHERE rn = 1
    """,
)
def dedup_first_wins(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    w = W.partitionBy("content_hash").orderBy("doc_id")
    return (
        d.select("doc_id", F.md5("text").alias("content_hash"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .drop("rn")
    )


# ---------------------------------------------------------------------------
# F1-style TPC-H Q1 pricing summary: the canonical multi-agg groupBy with
# exact decimal arithmetic (maps the reference's stats counters,
# logger.py:37-45, onto a real analytic aggregation).
# ---------------------------------------------------------------------------
@register(
    "tpch_q1",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE), 2) AS sum_qty,
           ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE), 2) AS sum_base_price,
           ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6)) *
                    (1 - CAST(l_discount AS DECIMAL(18,6)))) AS DOUBLE), 2) AS sum_disc_price,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast("decimal(18,6)")
    price = F.col("l_extendedprice").cast("decimal(18,6)")
    disc = F.col("l_discount").cast("decimal(18,6)")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            # exact decimal sums internally; the *output* is round(double,2)
            # on both engines (driver hashes Decimal types asymmetrically).
            F.round(F.sum(qty).cast("double"), 2).alias("sum_qty"),
            F.round(F.sum(price).cast("double"), 2).alias("sum_base_price"),
            F.round(F.sum(price * (1 - disc)).cast("double"), 2).alias("sum_disc_price"),
            F.count("*").alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# API: price-band + property-type listing (api/main.py:93-141) — range +
# equality predicates with pagination; predicates reach the parquet scan.
# ---------------------------------------------------------------------------
@register(
    "properties_by_price_type",
    oracle="""
    SELECT o_orderkey, o_orderstatus,
           ROUND(CAST(o_totalprice AS DOUBLE), 2) AS price
    FROM orders
    WHERE o_totalprice BETWEEN 50000 AND 150000 AND o_orderstatus = 'O'
    ORDER BY o_orderkey
    LIMIT 25
    """,
)
def properties_by_price_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.where(
            F.col("o_totalprice").between(50000, 150000)
            & (F.col("o_orderstatus") == "O")
        )
        .select(
            "o_orderkey", "o_orderstatus",
            F.round(F.col("o_totalprice").cast("double"), 2).alias("price"),
        )
        .orderBy("o_orderkey")
        .limit(25)
    )


# ---------------------------------------------------------------------------
# API: by-city listing (api/main.py:251-266) — equality on a dimension
# attribute via broadcast join (city ≙ nation name here).
# ---------------------------------------------------------------------------
@register(
    "properties_by_city",
    oracle="""
    SELECT c.c_custkey, n.n_name AS city
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE n.n_name = 'NATION_7'
    ORDER BY c.c_custkey
    LIMIT 50
    """,
)
def properties_by_city(spark: SparkSession, sf_dir: str) -> DataFrame:
    # 'NATION_7' exists in the generated testdata (names are NATION_0..24);
    # round 1 filtered 'FRANCE' and returned 0 rows at every sf (vacuous).
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .where(F.col("n_name") == "NATION_7")
        .select("c_custkey", F.col("n_name").alias("city"))
        .orderBy("c_custkey")
        .limit(50)
    )


# ---------------------------------------------------------------------------
# API: by-id point lookup (api/main.py:269-283) — single-key predicate;
# parquet min/max metrics prune row groups (Iceberg: file pruning).
# ---------------------------------------------------------------------------
@register(
    "property_by_id",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderstatus,
           ROUND(CAST(o_totalprice AS DOUBLE), 2) AS price
    FROM orders WHERE o_orderkey = 988
    """,
)
def property_by_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.where(F.col("o_orderkey") == 988).select(
        "o_orderkey", "o_custkey", "o_orderstatus",
        F.round(F.col("o_totalprice").cast("double"), 2).alias("price"),
    )
