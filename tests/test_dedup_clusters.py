"""Connected-components clustering + decontamination invariants.

The driver oracle (near_dup_clusters vs a recursive-CTE closure) proves
engine parity on the LSH graph, whose components happen to be shallow
(sizes 2-3 on the testdata). These tests force the topologies that stress
the propagation itself: long chains (multi-hop label travel), stars,
merged components, and partitioning invariance.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crawler_spark.operators.dedup import (
    cluster_representatives,
    connected_components,
    decontaminate,
)


def _pairs(spark, edges):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in edges], "id_a: long, id_b: long"
    )


def _labels(df):
    return {(r.node, r.rep) for r in df.collect()}


def test_chain_collapses_to_min(spark):
    # 0-1-2-...-19: diameter 19 forces multi-hop propagation; pointer
    # jumping must still converge well inside the iteration cap.
    chain = _pairs(spark, [(i, i + 1) for i in range(19)])
    got = _labels(connected_components(chain))
    assert got == {(i, 0) for i in range(20)}


def test_chain_with_reversed_and_shuffled_edges(spark):
    # Same chain, edges listed high->low and interleaved: the fixpoint is
    # orientation-independent because edges are symmetrized internally.
    edges = [(i + 1, i) for i in range(19)][::-1]
    got = _labels(connected_components(_pairs(spark, edges)))
    assert got == {(i, 0) for i in range(20)}


def test_star_and_separate_components(spark):
    # star centered at 100 + disjoint triangle {1,2,3} + isolated pair.
    edges = [(100, 100 + i) for i in range(1, 6)]
    edges += [(1, 2), (2, 3), (1, 3), (7, 8)]
    got = _labels(connected_components(_pairs(spark, edges)))
    expect = {(100 + i, 100) for i in range(6)}
    expect |= {(1, 1), (2, 1), (3, 1), (7, 7), (8, 7)}
    assert got == expect


def test_bridge_edge_merges_components(spark):
    # two chains joined by one bridge edge -> single component.
    edges = [(i, i + 1) for i in range(0, 4)]
    edges += [(i, i + 1) for i in range(10, 14)]
    base = _labels(connected_components(_pairs(spark, edges)))
    assert {r for _, r in base} == {0, 10}
    merged = _labels(connected_components(_pairs(spark, edges + [(4, 10)])))
    assert {r for _, r in merged} == {0}
    assert len(merged) == 10


def test_partitioning_invariance(spark):
    edges = [(i, i + 1) for i in range(19)] + [(30, 31), (31, 33)]
    df = _pairs(spark, edges)
    a = _labels(connected_components(df))
    b = _labels(connected_components(df.repartition(7)))
    c = _labels(connected_components(df.coalesce(1)))
    assert a == b == c


def test_empty_pairs(spark):
    df = _pairs(spark, [])
    assert connected_components(df).count() == 0


def test_string_ids_chain(spark):
    # Regression: convergence detection must be type-generic. The old
    # sum-of-reps probe cast string reps to decimal -> NULL, and
    # NULL == NULL declared a fixpoint after one iteration, silently
    # returning partial propagation for md5/URL-keyed pipelines.
    edges = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"), ("x", "y")]
    df = spark.createDataFrame(edges, "id_a: string, id_b: string")
    got = _labels(connected_components(df))
    assert got == {("a", "a"), ("b", "a"), ("c", "a"), ("d", "a"),
                   ("e", "a"), ("x", "x"), ("y", "x")}


def test_cluster_sizes(spark):
    edges = [(0, 1), (1, 2), (5, 6)]
    rows = {(r.node, r.rep, r.cluster_size)
            for r in cluster_representatives(_pairs(spark, edges)).collect()}
    assert rows == {(0, 0, 3), (1, 0, 3), (2, 0, 3), (5, 5, 2), (6, 5, 2)}


# ---------------------------------------------------------------------------
# decontamination
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        # eval doc: contributes 4-grams "a b c d", "b c d e"
        (0, "a b c d e"),
        # train: shares both eval 4-grams (superstring)
        (1, "z a b c d e y"),
        # train: shares exactly one ("a b c d")
        (2, "a b c d x"),
        # train: shares none (reordered)
        (3, "e d c b a"),
        # train: too short for a 4-gram
        (4, "a b c"),
        # train: repeats the same shared 4-gram twice -> still counts once
        (5, "a b c d q a b c d"),
    ]
    return spark.createDataFrame(rows, "doc_id: long, text: string")


def test_decontaminate_counts(spark, docs):
    ev = docs.where(F.col("doc_id") == 0)
    tr = docs.where(F.col("doc_id") != 0)
    got = {(r.doc_id, r.n_shared)
           for r in decontaminate(tr, ev, "doc_id", "text", n=4).collect()}
    assert got == {(1, 2), (2, 1), (5, 1)}


def test_decontaminate_empty_eval(spark, docs):
    ev = docs.where(F.lit(False))
    tr = docs
    assert decontaminate(tr, ev, "doc_id", "text", n=4).count() == 0


def test_decontaminate_join_modes_agree(spark, docs):
    """The broadcast/shuffle seam (r04 verdict #6): identical values in
    every join_mode, and 'auto' flips to shuffle above the documented
    gram ceiling."""
    import crawler_spark.operators.dedup as dd

    ev = docs.where(F.col("doc_id") == 0)
    tr = docs.where(F.col("doc_id") != 0)
    want = {(1, 2), (2, 1), (5, 1)}
    for mode in ("broadcast", "shuffle", "auto"):
        got = {(r.doc_id, r.n_shared) for r in decontaminate(
            tr, ev, "doc_id", "text", n=4, join_mode=mode).collect()}
        assert got == want, mode
    with pytest.raises(ValueError):
        decontaminate(tr, ev, "doc_id", "text", join_mode="nope")


def test_decontaminate_auto_flips_above_ceiling(spark, docs, monkeypatch):
    import crawler_spark.operators.dedup as dd

    ev = docs.where(F.col("doc_id") == 0)   # 2 distinct eval grams
    tr = docs.where(F.col("doc_id") != 0)
    monkeypatch.setattr(dd, "DECONTAMINATE_BROADCAST_MAX_GRAMS", 1)
    df = dd.decontaminate(tr, ev, "doc_id", "text", n=4, join_mode="auto")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" not in plan   # flipped to shuffle
    got = {(r.doc_id, r.n_shared) for r in df.collect()}
    assert got == {(1, 2), (2, 1), (5, 1)}
