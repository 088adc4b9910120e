"""Units for the round-5 late additions: freshness re-crawl scheduling,
DSIR importance weights, and the xxhash64 MinHash-LSH hash family."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from crawler_spark.frontier.freshness import recrawl_schedule
from crawler_spark.operators import dedup as DD
from crawler_spark.operators.importance import importance_weights

SF_DIR = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# recrawl_schedule
# ---------------------------------------------------------------------------


def _log(spark, rows):
    return spark.createDataFrame(
        [(u, datetime.datetime(2024, 1, 1, h), c) for u, h, c in rows],
        "url string, ts timestamp, changed boolean",
    )


def test_recrawl_tier_boundaries(spark):
    # 2/4 changes = exactly the hot cut; 1/5 = exactly warm; 0/3 = cold
    log = _log(spark, [
        ("hot.example", 0, True), ("hot.example", 1, True),
        ("hot.example", 2, False), ("hot.example", 3, False),
        ("warm.example", 0, True), ("warm.example", 1, False),
        ("warm.example", 2, False), ("warm.example", 3, False),
        ("warm.example", 4, False),
        ("cold.example", 0, False), ("cold.example", 1, False),
        ("cold.example", 2, False),
    ])
    out = {r["url"]: r for r in recrawl_schedule(
        log, "url", "ts", F.col("changed")).collect()}
    assert out["hot.example"]["tier"] == "hot"
    assert out["hot.example"]["revisit_hours"] == 6
    assert out["warm.example"]["tier"] == "warm"
    assert out["cold.example"]["tier"] == "cold"
    # next_due = last observed fetch + tier hours, exact
    assert out["hot.example"]["next_due"] == datetime.datetime(2024, 1, 1, 9)
    assert out["cold.example"]["next_due"] == datetime.datetime(2024, 1, 4, 2)


def test_recrawl_one_fetch_no_change_is_cold(spark):
    log = _log(spark, [("x.example", 0, False)])
    row = recrawl_schedule(log, "url", "ts", F.col("changed")).collect()[0]
    assert (row["tier"], row["revisit_hours"]) == ("cold", 72)
    # ...and one fetch WITH a change is hot (1*2 >= 1*1)
    log2 = _log(spark, [("y.example", 0, True)])
    row2 = recrawl_schedule(log2, "url", "ts", F.col("changed")).collect()[0]
    assert (row2["tier"], row2["revisit_hours"]) == ("hot", 6)


# ---------------------------------------------------------------------------
# importance_weights
# ---------------------------------------------------------------------------


def test_importance_weights_tiny(spark):
    # target doc shares token 'alpha' with doc 3; doc 4 is disjoint
    df = spark.createDataFrame(
        [(1, "alpha beta", True), (2, "gamma delta", False),
         (3, "alpha  epsilon", False), (4, "zeta\nzeta eta", False)],
        "id long, text string, tgt boolean",
    )
    out = {r["id"]: r for r in importance_weights(
        df, "id", "text", F.col("tgt")).collect()}
    from hashlib import md5

    def bucket(t):
        return md5(t.encode()).hexdigest()[:2]

    toks = {1: ["alpha", "beta"], 2: ["gamma", "delta"],
            3: ["alpha", "epsilon"], 4: ["zeta", "eta"]}
    raw: dict[str, int] = {}
    tgt: dict[str, int] = {}
    for d, ts in toks.items():
        for t in ts:
            b = bucket(t)
            raw[b] = raw.get(b, 0) + 1
            if d == 1:
                tgt[b] = tgt.get(b, 0) + 1
    for d, ts in toks.items():
        assert out[d]["n_tokens"] == len(ts), d
        assert out[d]["imp_num"] == sum(tgt.get(bucket(t), 0) for t in ts), d
        assert out[d]["imp_den"] == sum(raw.get(bucket(t), 0) for t in ts), d
    # the target-sharing doc outranks the disjoint doc (cross-multiplied)
    a, b = out[3], out[4]
    assert a["imp_num"] * b["imp_den"] > b["imp_num"] * a["imp_den"]


def test_importance_plan_broadcasts_stats(spark):
    df = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = importance_weights(
        df, "doc_id", "text", F.col("lang") == "fr"
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan


# ---------------------------------------------------------------------------
# xxhash64 MinHash-LSH family
# ---------------------------------------------------------------------------


def _true_pairs(spark, thresh_num=97, thresh_den=100):
    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    sh = d.select(
        "doc_id",
        F.array_distinct(DD.word_shingles(F.col("text"), 3)).alias("s"),
    ).where(F.size("s") >= 1)
    a = sh.select(F.col("doc_id").alias("id_a"), F.col("s").alias("sa"))
    b = sh.select(F.col("doc_id").alias("id_b"), F.col("s").alias("sb"))
    ni = F.size(F.array_intersect("sa", "sb"))
    nu = F.size(F.array_distinct(F.concat("sa", "sb")))
    return {
        (r["id_a"], r["id_b"])
        for r in a.join(b, F.col("id_a") < F.col("id_b"))
        .where(ni * thresh_den >= nu * thresh_num)
        .select("id_a", "id_b").collect()
    }


def test_xxhash_family_recall_matches_md5(spark):
    """Both hash families must find every true >=0.97-Jaccard pair on the
    frozen corpus (the property near_dup_pairs_fast's oracle rests on)."""
    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    truth = _true_pairs(spark)
    assert truth, "corpus lost its planted near-dups?"
    for fam in ("md5", "xxhash64"):
        cand = {
            (r["id_a"], r["id_b"])
            for r in DD.minhash_lsh_candidates(
                d, "doc_id", "text", k=6, band_size=2, hash_family=fam
            ).collect()
        }
        missed = truth - cand
        assert not missed, (fam, missed)


def test_xxhash_family_band_keys_are_longs(spark):
    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    cand = DD.minhash_lsh_candidates(
        d, "doc_id", "text", hash_family="xxhash64")
    plan = cand._jdf.queryExecution().executedPlan().toString()
    assert "xxhash64" in plan.lower()
    assert "BatchEvalPython" not in plan


def test_unknown_hash_family_raises(spark):
    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    try:
        DD.minhash_lsh_candidates(d, "doc_id", "text", hash_family="sha1")
    except ValueError as e:
        assert "hash_family" in str(e)
    else:
        raise AssertionError("expected ValueError")


# ---------------------------------------------------------------------------
# link_mass_rank
# ---------------------------------------------------------------------------


def test_link_mass_rank_tiny_graph(spark):
    from crawler_spark.frontier.linkrank import SCALE, link_mass_rank

    # 1 -> 2, 1 -> 3, 2 -> 3, 4 -> 3 (3 is the hub; 4 is source-only)
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (4, 3)], "src long, dst long")
    out = {r["node"]: r for r in link_mass_rank(
        edges, "src", "dst", iterations=2).collect()}

    # replay the integer recurrence by hand
    outdeg = {1: 2, 2: 1, 4: 1}
    m = {n: SCALE for n in (1, 2, 3, 4)}
    floor = 15 * SCALE // 100
    for _ in range(2):
        inc = {n: 0 for n in (1, 2, 3, 4)}
        for s, d in [(1, 2), (1, 3), (2, 3), (4, 3)]:
            inc[d] += m[s] // outdeg[s]
        m = {n: floor + (85 * inc[n]) // 100 for n in (1, 2, 3, 4)}

    for n in (1, 2, 3, 4):
        assert out[n]["mass"] == m[n], n
    assert out[3]["indegree"] == 3 and out[3]["outdegree"] == 0
    assert out[1]["indegree"] == 0 and out[1]["outdegree"] == 2
    # the hub accumulated strictly more mass than everyone else
    assert all(out[3]["mass"] > out[n]["mass"] for n in (1, 2, 4))


def test_importance_bucket_families_agree_on_mass(spark):
    """n_tokens is bucket-family-invariant; weights differ only by
    which tokens share a bucket (both families are uniform 256-way)."""
    from crawler_spark.operators.importance import importance_weights

    df = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(50)
    a = {r["doc_id"]: r for r in importance_weights(
        df, "doc_id", "text", F.col("lang") == "fr").collect()}
    b = {r["doc_id"]: r for r in importance_weights(
        df, "doc_id", "text", F.col("lang") == "fr",
        bucket_family="xxhash64").collect()}
    assert set(a) == set(b)
    for k in a:
        assert a[k]["n_tokens"] == b[k]["n_tokens"], k
        assert b[k]["imp_den"] >= b[k]["n_tokens"]  # every token hits >=1
    try:
        importance_weights(df, "doc_id", "text", F.col("lang") == "fr",
                           bucket_family="crc32")
    except ValueError as e:
        assert "bucket_family" in str(e)
    else:
        raise AssertionError("expected ValueError")


def test_link_mass_rank_long_chain_checkpoints(spark):
    """iterations=6 crosses the lineage-checkpoint boundary; values must
    still equal the hand recurrence (checkpointing is value-neutral)."""
    from crawler_spark.frontier.linkrank import SCALE, link_mass_rank

    edge_list = [(1, 2), (2, 3), (3, 1), (1, 3)]
    edges = spark.createDataFrame(edge_list, "src long, dst long")
    out = {r["node"]: r["mass"] for r in link_mass_rank(
        edges, "src", "dst", iterations=6).collect()}

    outdeg = {1: 2, 2: 1, 3: 1}
    m = {n: SCALE for n in (1, 2, 3)}
    floor = 15 * SCALE // 100
    for _ in range(6):
        inc = {n: 0 for n in (1, 2, 3)}
        for s, d in edge_list:
            inc[d] += m[s] // outdeg[s]
        m = {n: floor + (85 * inc[n]) // 100 for n in (1, 2, 3)}
    assert out == m


def test_recrawl_null_observation_is_not_changed(spark):
    import datetime as _dt

    log = spark.createDataFrame(
        [("u", _dt.datetime(2024, 1, 1), None),
         ("u", _dt.datetime(2024, 1, 2), True),
         ("v", _dt.datetime(2024, 1, 1), None)],
        "url string, ts timestamp, changed boolean",
    )
    out = {r["url"]: r for r in recrawl_schedule(
        log, "url", "ts", F.col("changed")).collect()}
    assert out["u"]["n_changes"] == 1          # NULL skipped, not NULL-sum
    assert out["v"]["n_changes"] == 0          # all-NULL URL -> 0, not NULL
    assert out["v"]["tier"] == "cold"


def test_due_filter_gates_frontier(spark):
    import datetime as _dt

    from crawler_spark.frontier.freshness import due_filter

    log = _log(spark, [
        ("hot.example", 0, True),    # hot -> due at 00:00 + 6h
        ("cold.example", 0, False),  # cold -> due at 00:00 + 72h
    ])
    sched = recrawl_schedule(log, "url", "ts", F.col("changed"))
    frontier = spark.createDataFrame(
        [("hot.example",), ("cold.example",), ("new.example",)],
        "url string")
    # at +7h: hot is due, cold is not, never-fetched is always eligible
    kept = sorted(r["url"] for r in due_filter(
        frontier, sched, "url", _dt.datetime(2024, 1, 1, 7)).collect())
    assert kept == ["hot.example", "new.example"]
    # at +73h everything is due
    kept2 = sorted(r["url"] for r in due_filter(
        frontier, sched, "url", _dt.datetime(2024, 1, 4, 1)).collect())
    assert kept2 == ["cold.example", "hot.example", "new.example"]
