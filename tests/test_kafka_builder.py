"""Kafka streaming builders — broker-free unit tests.

The codec (encode_frontier/decode_frontier) is pure column algebra, so a
batch DataFrame exercises the exact expressions a streaming frame would
run; the reader/writer wiring is pinned through its option maps.
Reference topology: docker-compose.yml:55-63 (topics), master.py:110-116 /
worker.py:433-438 (keyed vs unkeyed sends), worker.py:278-295 (consumer).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from crawler_spark.streaming.kafka import (
    KafkaConfig,
    decode_frontier,
    encode_frontier,
    frontier_reader,
    frontier_writer,
    priority_topics,
    reader_options,
)

CFG = KafkaConfig("broker-1:9092,broker-2:9092")


def test_reader_options_topology():
    opts = reader_options(CFG)
    assert opts["subscribe"] == (
        "urls_priority_1,urls_priority_2,urls_priority_3,"
        "urls_priority_4,urls_priority_5"
    )
    assert opts["kafka.bootstrap.servers"] == "broker-1:9092,broker-2:9092"
    assert opts["startingOffsets"] == "earliest"  # worker.py:281
    assert opts["maxOffsetsPerTrigger"] == "100000"
    assert reader_options(CFG, include_dlq=True)["subscribe"].endswith(",dlq")


def test_reader_builder_constructs(spark):
    # no broker: everything up to .load() must construct cleanly
    assert frontier_reader(spark, CFG) is not None


def test_priority_topics_match_compose():
    assert priority_topics(CFG) == [f"urls_priority_{p}" for p in (1, 2, 3, 4, 5)]


def _msgs(spark):
    rows = [
        # url, priority, timestamp, ts, source, queued_at, error, step, rc, host
        ("https://a.test/1", 1, 1000, 1.0, "seed", 1.0, None, None, 0, "a.test"),
        ("https://a.test/2", 3, 2000, 2.0, "extracted", None, None, None, 0, "a.test"),
        ("https://b.test/3", 5, 3000, 3.0, "manual", 3.0, None, None, 0, "b.test"),
        ("https://b.test/4", 0, 4000, 4.0, "transaction_failure", None,
         "boom", "fetch", 2, "b.test"),
    ]
    return spark.createDataFrame(
        rows,
        "url string, priority int, timestamp long, ts double, source string, "
        "queued_at double, error string, failed_step string, retry_count int, "
        "host string",
    )


def test_encode_routing_and_keys(spark):
    out = {r["url"]: r for r in
           encode_frontier(_msgs(spark), CFG)
           .withColumn("url", F.get_json_object("value", "$.url"))
           .collect()}
    assert out["https://a.test/1"]["topic"] == "urls_priority_1"
    assert out["https://a.test/1"]["key"] == "a.test"      # seed => keyed
    assert out["https://a.test/2"]["topic"] == "urls_priority_3"
    assert out["https://a.test/2"]["key"] is None          # extracted => unkeyed
    assert out["https://b.test/3"]["key"] == "b.test"      # manual => keyed
    assert out["https://b.test/4"]["topic"] == "dlq"       # priority 0 => DLQ


def test_codec_round_trip_lossless(spark):
    msgs = _msgs(spark)
    encoded = encode_frontier(msgs, CFG)
    raw = encoded.select(
        F.col("key").cast("binary").alias("key"),
        F.col("value").cast("binary").alias("value"),
        "topic",
    )
    back = decode_frontier(raw, CFG)
    want = sorted(map(tuple, msgs.drop("host").collect()))
    got = sorted(map(tuple, back.select(
        "url", "priority", "timestamp", "ts", "source", "queued_at",
        "error", "failed_step", "retry_count").collect()))
    assert got == want
    prios = {r["url"]: r["topic_priority"] for r in back.collect()}
    assert prios["https://a.test/2"] == 3
    assert prios["https://b.test/4"] is None  # dlq topic has no priority


def test_codec_is_jvm_native(spark):
    """from_json/to_json only — no Python UDF in the codec plan."""
    plan = encode_frontier(_msgs(spark), CFG)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_writer_builder_constructs(spark, tmp_path):
    enc = encode_frontier(_msgs(spark), CFG)
    # batch frame has no writeStream: wire through a memory-stream shape
    # instead — builder must accept any encoded streaming frame; here we
    # just assert the builder wiring with a rate source of the same schema
    stream = (
        spark.readStream.format("rate").option("rowsPerSecond", 1).load()
        .select(
            F.lit("k").alias("key"),
            F.lit("{}").alias("value"),
            F.lit("urls_priority_1").alias("topic"),
        )
    )
    w = frontier_writer(stream, CFG, str(tmp_path / "ckpt"))
    assert w is not None  # .start() needs a broker; wiring is complete


def test_kafka_seed_ingest_round_trip(spark, tmp_path):
    """Kafka-shaped records -> decode -> enqueue -> atomic store merge,
    driven broker-free through the foreachBatch callable."""
    from crawler_spark.frontier import synth
    from crawler_spark.frontier.store import RoundStore, init_crawl
    from crawler_spark.streaming.kafka import kafka_seed_ingest

    n_pages, n_hosts = 2000, 20
    robots = synth.robots_dim(spark, n_hosts)
    seeds = synth.seed_urls(spark, n_pages, 3, n_hosts)
    store = RoundStore(spark, str(tmp_path / "kafka_wh"))
    init_crawl(store, seeds, robots)
    before = store.read("frontier", 0).count()

    # new seed URLs arriving as keyed Kafka messages (incl. one dup of an
    # existing seed and one invalid scheme — both must be dropped)
    incoming = synth.seed_urls(spark, n_pages, 8, n_hosts) \
        .unionByName(spark.createDataFrame(
            [("javascript:void(0)",)], "url string"))
    msgs = incoming.select(
        "url", F.lit(1).alias("priority"),
        F.lit(0).cast("long").alias("timestamp"),
        F.lit(0.0).alias("ts"), F.lit("seed").alias("source"),
        F.lit(0.0).alias("queued_at"),
        F.lit(None).cast("string").alias("error"),
        F.lit(None).cast("string").alias("failed_step"),
        F.lit(0).alias("retry_count"),
        F.lit("h").alias("host"),
    )
    raw = encode_frontier(msgs, CFG).select(
        F.col("key").cast("binary"), F.col("value").cast("binary"), "topic")

    kafka_seed_ingest(store, robots, CFG)(raw, batch_id=0)

    after = store.read("frontier", 0).count()
    seen = {r["url"] for r in store.read("seen", 0).collect()}
    assert after > before                      # new URLs enqueued
    assert not any(u.startswith("javascript") for u in seen)
    # replay the same micro-batch: idempotent (exactly-once surface)
    kafka_seed_ingest(store, robots, CFG)(raw, batch_id=0)
    assert store.read("frontier", 0).count() == after
