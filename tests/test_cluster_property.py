"""Property-based check of connected_components against a pure-Python
union-find over randomized graphs — catches topologies the fixed
test_dedup_clusters cases don't enumerate (cycles, multi-bridges,
duplicate/self-referencing candidate pairs). Few examples: each runs
real Spark jobs."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from crawler_spark.operators.dedup import connected_components


def _union_find(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # min id per component
    return {n: find(n) for n in list(parent)}


_edges = st.lists(
    st.tuples(st.integers(min_value=0, max_value=15),
              st.integers(min_value=0, max_value=15)),
    min_size=1, max_size=20,
)


@settings(max_examples=10, deadline=None)
@given(edges=_edges)
def test_components_match_union_find(spark, edges):
    # candidate pairs are (a < b) by contract; normalize and drop loops
    pairs = sorted({(min(a, b), max(a, b)) for a, b in edges if a != b})
    if not pairs:
        return
    df = spark.createDataFrame(pairs, "id_a: long, id_b: long")
    got = {(r.node, r.rep) for r in connected_components(df).collect()}
    expect = set(_union_find(pairs).items())
    assert got == expect
