"""Driver queries for the frozen geo dims (SURVEY.md J1/J2/E1, §1.5).

The Spark side joins the REAL frozen fixture dims (functions/geo.py,
fixtures/*.json); the DuckDB oracle gets the same mapping inlined as a
VALUES list generated from the fixture at import time — the interesting
logic (broadcast dim join, listing round-robin, region+3 priority, the
-1 drop) is restated independently in SQL, only the constant lookup table
is shared (it IS the artifact under test).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.geo import assign_priority_geo, city_region_map
from ..sources.testdata import load_table
from .registry import register

_CITY_MAP = city_region_map()  # one fixture read at import, reused below
_CITIES = sorted(_CITY_MAP)  # stable order shared by both engines
_N_UNMAPPED = 5  # extra slugs that miss the dim -> priority -1 -> dropped
_M = len(_CITIES) + _N_UNMAPPED

_CITY_SLUGS = _CITIES + [f"nowhere{i}" for i in range(_N_UNMAPPED)]

_VALUES = ", ".join(
    "({i}, '{c}', '{s}', {r})".format(
        i=i, c=c, s=_CITY_MAP[c][0], r=_CITY_MAP[c][1]
    )
    for i, c in enumerate(_CITIES)
)


@register(
    "priority_assign_geo",
    oracle=f"""
    WITH dim(idx, city, state, region) AS (VALUES {_VALUES}),
    cust AS (
      SELECT c_custkey, c_custkey % 3 = 0 AS is_listing,
             c_custkey % {_M} AS idx
      FROM customer
    ),
    j AS (
      SELECT c.c_custkey, c.is_listing, d.city, d.state, d.region
      FROM cust c LEFT JOIN dim d ON c.idx = d.idx
    ),
    rr AS (
      SELECT *, ROW_NUMBER() OVER (
               PARTITION BY is_listing ORDER BY c_custkey) % 2 AS rn
      FROM j
    )
    SELECT c_custkey, city, state, CAST(priority AS INT) AS priority
    FROM (
      SELECT c_custkey, city, state,
             CASE WHEN region IS NULL THEN -1
                  WHEN is_listing THEN 1 + rn
                  ELSE region + 3 END AS priority
      FROM rr
    ) WHERE priority <> -1
    """,
)
def priority_assign_geo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers mapped onto the frozen city vocabulary (plus a few
    unmapped slugs), priority assigned through the fixture broadcast dims;
    unmapped rows exercise the B7 drop."""
    c = load_table(spark, sf_dir, "customer")
    city = F.element_at(
        F.array(*[F.lit(s) for s in _CITY_SLUGS]),
        (F.col("c_custkey") % _M + 1).cast("int"),
    )
    rows = c.select(
        "c_custkey",
        city.alias("city"),
        (F.col("c_custkey") % 3 == 0).alias("is_listing"),
    )
    out = assign_priority_geo(rows, spark, order_col="c_custkey")
    return out.where(F.col("priority") != -1).select(
        "c_custkey", "city", "state", "priority"
    )


def _coords_values() -> str:
    """The frozen state-coords fixture as a VALUES list — the dim IS the
    artifact under test (same precedent as the city dim above); the
    haversine is restated independently in SQL."""
    from ..functions.geo import _load, state_regions

    regions = state_regions()
    return ", ".join(
        f"('{s}', {float(ll[0])!r}, {float(ll[1])!r}, {regions[s]})"
        for s, ll in sorted(_load("state_coords.json").items())
    )


@register(
    "state_coords_radius",
    oracle=f"""
    WITH dim(state, lat, lon, region) AS (VALUES {{values}}),
    ks AS (SELECT lat AS qlat, lon AS qlon FROM dim WHERE state = 'KS'),
    d AS (
      SELECT state, region,
             ROUND(2 * 6371.0 * asin(sqrt(
               pow(sin(radians(lat - qlat) / 2), 2)
               + cos(radians(lat)) * cos(radians(qlat))
               * pow(sin(radians(lon - qlon) / 2), 2))), 1) AS dist_km
      FROM dim, ks
    )
    SELECT state, CAST(region AS INT) AS region, dist_km
    FROM d WHERE dist_km <= 1500.0
    """.format(values=_coords_values()),
)
def state_coords_radius(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 over the frozen coords dim: states within 1500 km of the
    fixture's Kansas centroid, value-checked against an independent SQL
    haversine over the inlined fixture."""
    from ..functions.geo import state_coords_dim

    dim = state_coords_dim(spark)
    ks = dim.where(F.col("state") == "KS").select(
        F.col("lat").alias("qlat"), F.col("lon").alias("qlon")
    )
    d = dim.crossJoin(F.broadcast(ks))
    # full two-point haversine (native trig, codegen)
    a = (
        F.pow(F.sin(F.radians(F.col("lat") - F.col("qlat")) / 2), 2)
        + F.cos(F.radians("lat")) * F.cos(F.radians("qlat"))
        * F.pow(F.sin(F.radians(F.col("lon") - F.col("qlon")) / 2), 2)
    )
    dist = 2 * 6371.0 * F.asin(F.sqrt(a))
    return (
        d.withColumn("dist_km", F.round(dist, 1))
        .where(F.col("dist_km") <= 1500.0)
        .select("state", "region", "dist_km")
        .orderBy("state")
    )
