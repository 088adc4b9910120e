"""Checkpoint/resume: kill after round k, resume, identical results
(north rule: resumable from checkpoint with per-partition lineage)."""

from __future__ import annotations

import os

from crawler_spark.frontier import synth
from crawler_spark.frontier.store import RoundStore, run_crawl_checkpointed

N_PAGES, N_HOSTS, N_SEEDS, ROUNDS, K = 2000, 20, 6, 4, 2


def _log_rows(store):
    return sorted(
        (r["round"], r["priority"], r["host_id"], r["url"], r["seq"])
        for r in store.read_deltas("fetch_log").collect()
    )


def test_resume_equals_uninterrupted(spark, tmp_path):
    web = synth.web_graph(spark, N_PAGES, N_HOSTS)
    robots = synth.robots_dim(spark, N_HOSTS)
    seeds = synth.seed_urls(spark, N_PAGES, N_SEEDS, N_HOSTS)

    # uninterrupted run
    full = RoundStore(spark, str(tmp_path / "full"))
    run_crawl_checkpointed(full, web, robots, ROUNDS, K, seeds=seeds)

    # interrupted run: stop after round 2, then resume to ROUNDS
    part = RoundStore(spark, str(tmp_path / "part"))
    run_crawl_checkpointed(part, web, robots, 2, K, seeds=seeds)
    assert part.latest_round() == 2
    # simulate a crash mid-round-3: stray uncommitted files are invisible
    stray = tmp_path / "part" / "frontier" / "r00003"
    os.makedirs(stray, exist_ok=True)
    (stray / "part-garbage.parquet.tmp").write_bytes(b"crashed")

    resumed = RoundStore(spark, str(tmp_path / "part"))
    assert resumed.latest_round() == 2  # garbage without manifest ignored
    run_crawl_checkpointed(resumed, web, robots, ROUNDS, K)

    assert _log_rows(full) == _log_rows(resumed)
    # seen-set snapshots agree too
    a = {r["url"] for r in full.read("seen", ROUNDS).collect()}
    b = {r["url"] for r in resumed.read("seen", ROUNDS).collect()}
    assert a == b
    # lineage metrics recorded per round
    m = resumed.read_deltas("metrics").collect()
    assert {r["round"] for r in m} == set(range(0, ROUNDS + 1))
    assert all(r["max_part_rows"] is not None for r in m if r["round"] > 0)


def test_time_travel_view(spark, tmp_path):
    web = synth.web_graph(spark, N_PAGES, N_HOSTS)
    robots = synth.robots_dim(spark, N_HOSTS)
    seeds = synth.seed_urls(spark, N_PAGES, N_SEEDS, N_HOSTS)
    st = RoundStore(spark, str(tmp_path / "tt"))
    run_crawl_checkpointed(st, web, robots, 3, K, seeds=seeds)
    upto2 = st.read_deltas("fetch_log", upto=2).select("round").distinct().collect()
    assert {r["round"] for r in upto2} == {1, 2}


def test_bloom_accelerated_crawl_identical(spark, tmp_path):
    """The bloom-sidecar path must be bit-identical to the exact path."""
    web = synth.web_graph(spark, N_PAGES, N_HOSTS)
    robots = synth.robots_dim(spark, N_HOSTS)
    seeds = synth.seed_urls(spark, N_PAGES, N_SEEDS, N_HOSTS)

    plain = RoundStore(spark, str(tmp_path / "plain"))
    run_crawl_checkpointed(plain, web, robots, 3, K, seeds=seeds)
    bloomy = RoundStore(spark, str(tmp_path / "bloomy"))
    run_crawl_checkpointed(bloomy, web, robots, 3, K, seeds=seeds,
                           use_bloom=True, bloom_buckets=8)

    assert _log_rows(plain) == _log_rows(bloomy)
    a = {r["url"] for r in plain.read("seen", 3).collect()}
    b = {r["url"] for r in bloomy.read("seen", 3).collect()}
    assert a == b


def test_checkpointed_cooldown_matches_simulator(spark, tmp_path):
    from crawler_spark.frontier import simulator
    st = RoundStore(spark, str(tmp_path / "cool"))
    web = synth.web_graph(spark, N_PAGES, N_HOSTS)
    robots = synth.robots_dim(spark, N_HOSTS)
    seeds = synth.seed_urls(spark, N_PAGES, N_SEEDS, N_HOSTS)
    run_crawl_checkpointed(st, web, robots, 4, K, seeds=seeds,
                           cooldown_rounds=2)
    sim = simulator.simulate(N_PAGES, N_SEEDS, 4, K, N_HOSTS,
                             cooldown_rounds=2)
    assert _log_rows(st) == sorted(sim.fetch_log)


def test_commit_replay_idempotent(spark, tmp_path):
    """Exactly-once claim: re-committing a round (foreachBatch replay)
    leaves identical visible state."""
    st = RoundStore(spark, str(tmp_path / "idem"))
    web = synth.web_graph(spark, N_PAGES, N_HOSTS)
    robots = synth.robots_dim(spark, N_HOSTS)
    seeds = synth.seed_urls(spark, N_PAGES, N_SEEDS, N_HOSTS)
    run_crawl_checkpointed(st, web, robots, 2, K, seeds=seeds)
    before = _log_rows(st)
    seen_before = {r["url"] for r in st.read("seen", 2).collect()}

    # replay round 2: wipe its manifest so the loop re-executes it
    import os
    os.remove(st._manifest(2))
    assert st.latest_round() == 1
    run_crawl_checkpointed(st, web, robots, 2, K)

    assert _log_rows(st) == before
    assert {r["url"] for r in st.read("seen", 2).collect()} == seen_before


def test_crawl_with_binary_payload(spark, tmp_path):
    """Content-store-as-a-table: crawled property pages carry the binary
    image payload; stored bytes decode to PSNR>=40dB and captions match."""
    from crawler_spark.frontier import images as I

    st = RoundStore(spark, str(tmp_path / "payload"))
    web = synth.web_graph(spark, N_PAGES, N_HOSTS)
    robots = synth.robots_dim(spark, N_HOSTS)
    seeds = synth.seed_urls(spark, N_PAGES, N_SEEDS, N_HOSTS)
    imgs = I.images_table(spark, N_PAGES).localCheckpoint()
    run_crawl_checkpointed(st, web, robots, 3, K, seeds=seeds, images=imgs)

    pages = st.read_deltas("pages")
    props = pages.where(pages.kind == "property")
    n_props = props.count()
    assert n_props > 0
    assert props.where(props.bytes.isNull()).count() == 0
    # decoded invariants on the STORED bytes
    from pyspark.sql import functions as F
    v = I.verify_payload(
        props.select(
            F.col("image_id").cast("string").alias("image_id"),
            "bytes", "w", "h", "fmt", "caption", "phash")
    )
    bad = v.where((F.col("psnr_db") < 40.0) | ~F.col("caption_ok")
                  | ~F.col("phash_ok")).count()
    assert bad == 0
    # listings carry no payload but stay in the table
    assert pages.where(pages.kind == "listing")\
                .where(pages.bytes.isNotNull()).count() == 0
    # headers map survives the store round-trip (JSONB analogue, §1.2):
    # every crawled page carries the map and the values match the synth
    # formulas (server = 'synth/' || host_id % 3).
    assert pages.where(F.col("headers").isNull()).count() == 0
    mism = pages.where(
        (F.element_at("headers", "server")
         != F.concat(F.lit("synth/"), (F.col("host_id") % 3).cast("string")))
        | (F.element_at("headers", "content-type")
           != F.when(F.col("kind") == "listing", "text/html")
              .otherwise("text/html; charset=utf-8"))
    ).count()
    assert mism == 0
