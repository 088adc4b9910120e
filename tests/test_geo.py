"""Frozen geo fixture dims (SURVEY §1.5): shape, coverage, regions,
priority truth table (prioritizer.py:150-162 semantics, frozen fixtures
instead of constructor-time scraping — §8.5 do-not-copy)."""

from __future__ import annotations

from pyspark.sql import functions as F

from crawler_spark.functions.geo import (
    assign_priority_geo,
    city_region_map,
    city_state_dim,
    state_coords_dim,
    state_regions,
)


def test_state_coords_covers_us():
    regions = state_regions()
    assert len(regions) == 51  # 50 states + DC
    # tertiles: ~17 per region, coasts on the right side
    assert regions["CA"] == 2 and regions["WA"] == 2
    assert regions["KS"] == 1 and regions["OK"] == 1 and regions["MO"] == 1
    assert regions["NY"] == 0 and regions["FL"] == 0
    counts = {r: sum(1 for v in regions.values() if v == r) for r in (0, 1, 2)}
    assert all(15 <= c <= 19 for c in counts.values()), counts


def test_city_map_every_state_reachable():
    m = city_region_map()
    assert len(m) >= 60
    states_covered = {s for s, _ in m.values()}
    assert len(states_covered) >= 45


def test_dims_are_tiny_and_typed(spark):
    sc = state_coords_dim(spark)
    cs = city_state_dim(spark)
    assert sc.count() == 51 and cs.count() >= 60
    assert dict(sc.dtypes)["lat"] == "double"
    assert dict(cs.dtypes)["region"] == "int"


def test_priority_truth_table(spark):
    rows = spark.createDataFrame(
        [(1, "sfbay", False), (2, "chicago", False), (3, "newyork", False),
         (4, "sfbay", True), (5, "boston", True), (6, "gotham", False),
         (7, "gotham", True)],
        "k long, city string, is_listing boolean",
    )
    out = {r["k"]: r["priority"]
           for r in assign_priority_geo(rows, spark, order_col="k").collect()}
    assert out[1] == 5   # CA west property -> 2+3
    assert out[2] == 4   # IL central -> 1+3
    assert out[3] == 3   # NY east -> 0+3
    assert {out[4], out[5]} == {1, 2}   # listings round-robin 1/2
    assert out[6] == -1 and out[7] == -1  # unmapped -> drop signal


def test_priority_join_is_broadcast(spark):
    rows = spark.createDataFrame([(1, "sfbay", False)],
                                 "k long, city string, is_listing boolean")
    plan = assign_priority_geo(rows, spark, order_col="k") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert F is not None


def test_round_robin_parity_distributed_and_exact(spark):
    """The two-phase rank must (a) equal the naive global window parity
    on a bigger frame, (b) not plan a SinglePartition exchange for the
    ranking (ADVICE r02: partitionBy(is_listing) was a 2-partition sort)."""
    from crawler_spark.functions.geo import _global_rank_parity

    cities = ["sfbay", "chicago", "newyork", "boston"]
    rows = spark.createDataFrame(
        [(i, cities[i % 4], i % 3 == 0) for i in range(500)],
        "k long, city string, is_listing boolean",
    ).repartition(8)

    got = {r["k"]: r["_rr"]
           for r in _global_rank_parity(rows, "is_listing", "k").collect()}
    # naive oracle: global rank within group ordered by k
    by_group: dict[bool, list[int]] = {}
    for i in range(500):
        by_group.setdefault(i % 3 == 0, []).append(i)
    for g, ks in by_group.items():
        for rank, k in enumerate(sorted(ks), start=1):
            assert got[k] == rank % 2, (g, k)

    plan = _global_rank_parity(rows, "is_listing", "k") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan
