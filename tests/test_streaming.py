"""Structured Streaming: file-stream seed ingestion, streaming windowed
aggregation with watermark vs its batch equivalent, and the round ticker."""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F

from crawler_spark.frontier import synth
from crawler_spark.frontier.store import RoundStore, init_crawl
from crawler_spark.streaming.rounds import (
    stream_seed_inbox,
    windowed_event_counts,
)

N_PAGES, N_HOSTS = 2000, 20


def test_streaming_windowed_agg_matches_batch(spark, tmp_path):
    """The same windowed_event_counts plan over a file stream (2 chunks,
    watermarked) and over the batch frame produce identical final counts."""
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    src = str(tmp_path / "events_stream")
    events.where(F.col("event_id") % 2 == 0).write.parquet(src, mode="append")
    events.where(F.col("event_id") % 2 == 1).write.parquet(src, mode="append")

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", "2")
        .parquet(src)
    )
    q = (
        windowed_event_counts(stream)
        .writeStream.format("memory")
        .queryName("winagg")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r["window_start"], r["event_type"]): (r["n"], r["sum_value"])
        for r in spark.sql("select * from winagg").collect()
    }
    want = {
        (r["window_start"], r["event_type"]): (r["n"], r["sum_value"])
        for r in windowed_event_counts(events).collect()
    }
    # append-mode emits only windows older than the watermark; every
    # emitted window must match batch exactly, and most windows must emit
    assert got
    for k, v in got.items():
        assert want[k][0] == v[0]
        assert abs(want[k][1] - v[1]) < 1e-6
    assert len(got) >= len(want) - 3  # tail windows may be held back


def test_stream_seed_inbox_merges_frontier(spark, tmp_path):
    robots = synth.robots_dim(spark, N_HOSTS)
    seeds = synth.seed_urls(spark, N_PAGES, 4, N_HOSTS)
    store = RoundStore(spark, str(tmp_path / "wh"))
    init_crawl(store, seeds, robots)
    before = store.read("frontier", 0).count()

    inbox = str(tmp_path / "inbox")
    os.makedirs(inbox, exist_ok=True)
    extra = synth.seed_urls(spark, N_PAGES, 12, N_HOSTS)  # supersets seeds
    extra.write.parquet(inbox, mode="overwrite")

    q = stream_seed_inbox(spark, store, robots, inbox,
                          str(tmp_path / "ck2"))
    q.awaitTermination(120)
    time.sleep(0.5)

    after = store.read("frontier", 0)
    n_after = after.count()
    assert n_after > before                      # new seeds merged
    assert after.count() == after.select("url").distinct().count()  # deduped


def test_stateful_politeness_gate(spark, tmp_path):
    """applyInPandasWithState politeness: state persists ACROSS micro-
    batches (a host admitted in batch 1 blocks too-soon candidates in
    batch 2), and the cumulative decisions equal the batch fold."""
    from crawler_spark.streaming.stateful import (
        politeness_admit, politeness_admit_batch)

    rows = [  # (host_id, url, ts)
        (1, "https://h1.synth.test/a", 0.0),
        (1, "https://h1.synth.test/b", 4.0),    # < 8s after a -> blocked
        (2, "https://h2.synth.test/a", 1.0),
        (1, "https://h1.synth.test/c", 9.0),    # >= 8s after a -> admitted
        (1, "https://h1.synth.test/d", 12.0),   # < 8s after c -> blocked
        (2, "https://h2.synth.test/b", 20.0),
    ]
    batch1, batch2 = rows[:3], rows[3:]
    schema = "host_id int, url string, ts double"
    src = str(tmp_path / "cand")
    spark.createDataFrame(batch1, schema).coalesce(1).write.parquet(
        src + "/b1")
    spark.createDataFrame(batch2, schema).coalesce(1).write.parquet(
        src + "/b2")

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")   # one file per micro-batch
        .parquet(src + "/b*")
    )
    q = (
        politeness_admit(stream, min_interval_s=8.0)
        .writeStream.format("memory").queryName("polite")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck3"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {r["url"]: r["admitted"]
           for r in spark.sql("select * from polite").collect()}
    want = {r["url"]: r["admitted"]
            for r in politeness_admit_batch(
                spark.createDataFrame(rows, schema), 8.0).collect()}
    assert got == want
    assert want == {
        "https://h1.synth.test/a": True,
        "https://h1.synth.test/b": False,
        "https://h1.synth.test/c": True,
        "https://h1.synth.test/d": False,
        "https://h2.synth.test/a": True,
        "https://h2.synth.test/b": True,
    }


def test_streaming_session_windows_match_batch(spark, tmp_path):
    """session_window over a 2-chunk file stream == the batch run."""
    from crawler_spark.streaming.rounds import session_event_counts

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    src = str(tmp_path / "sess_stream")
    events.where(F.col("event_id") % 2 == 0).write.parquet(src, mode="append")
    events.where(F.col("event_id") % 2 == 1).write.parquet(src, mode="append")

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", "2").parquet(src)
    )
    q = (
        session_event_counts(stream)
        .writeStream.format("memory").queryName("sesswin")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck4"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = {(r["session_start"], r["user_id"]): r["n_events"]
           for r in spark.sql("select * from sesswin").collect()}
    want = {(r["session_start"], r["user_id"]): r["n_events"]
            for r in session_event_counts(events).collect()}
    assert got
    for k, v in got.items():
        assert want[k] == v  # every emitted session matches batch exactly
    assert len(got) >= len(want) * 0.8  # only the watermark tail held back


def test_streamed_rounds_carry_image_payload(spark, tmp_path):
    """stream_rounds with the image table: streamed rounds produce the
    SAME committed state as batch rounds (fetch log byte-identical) and
    the streamed pages carry a verifiable binary payload (PSNR >= 40 dB,
    caption equality) — the multimodal path under streaming semantics."""
    from crawler_spark.frontier import images as I
    from crawler_spark.frontier.store import run_crawl_checkpointed
    from crawler_spark.streaming.rounds import stream_rounds

    web = synth.web_graph(spark, N_PAGES, N_HOSTS)
    robots = synth.robots_dim(spark, N_HOSTS)
    seeds = synth.seed_urls(spark, N_PAGES, 6, N_HOSTS)
    imgs = I.images_table(spark, N_PAGES)

    batch = RoundStore(spark, str(tmp_path / "batch"))
    run_crawl_checkpointed(batch, web, robots, 2, 2, seeds=seeds,
                           images=imgs)

    streamed = RoundStore(spark, str(tmp_path / "stream"))
    init_crawl(streamed, seeds, robots)
    q = stream_rounds(spark, streamed, web, robots, 2, max_rounds=2,
                      checkpoint_dir=str(tmp_path / "ckpt"), images=imgs)
    deadline = time.time() + 120
    while streamed.latest_round() < 2 and time.time() < deadline:
        time.sleep(1)
    q.stop()
    assert streamed.latest_round() == 2

    def log_rows(st):
        return sorted(map(tuple, st.read_deltas("fetch_log").collect()))

    assert log_rows(streamed) == log_rows(batch)

    pages = streamed.read_deltas("pages").where(F.col("bytes").isNotNull())
    n_payload = pages.count()
    assert n_payload > 0
    v = I.verify_payload(pages.select(
        "image_id", "bytes", "w", "h", "fmt", "caption", "phash"
    ).withColumn("image_id", F.col("image_id").cast("string")))
    bad = v.where((F.col("psnr_db") < 40.0) | ~F.col("caption_ok")).count()
    assert bad == 0
