"""Repetition quality signals (operators/quality.py) and PII scrubbing
(functions/text.py): hand-computable examples pin the counts, gates,
and the redaction chain's ordering semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from crawler_spark.functions import text as TX
from crawler_spark.operators.quality import repetition_signals


def test_repetition_signals_hand_example(spark):
    docs = spark.createDataFrame(
        [
            # "a b" occurs 3x of 5 bigrams (top 60% > 20% -> drop);
            # tokens: 6 total, 2 distinct -> dup frac 4/6 > 30%
            (1, "a b a b a b"),
            # all-distinct: every bigram unique, no dup tokens -> keep
            (2, "one two three four five"),
            # just over the top-bigram gate: "x y" is 1 of only 4
            # bigrams (25% > 20% -> drop) even with all-distinct tokens
            (3, "x y p q r"),
            # single token: no bigrams -> row absent (inner join)
            (4, "solo"),
        ],
        ["doc_id", "text"],
    )
    # min_tokens=0: exercise the gates themselves on tiny hand examples
    # (the default length floor would bypass them all)
    out = {r.doc_id: r
           for r in repetition_signals(docs, min_tokens=0).collect()}
    assert set(out) == {1, 2, 3}

    r1 = out[1]
    assert (r1.n_tokens, r1.n_distinct_tokens) == (6, 2)
    assert (r1.n_bigrams, r1.top_bigram_count) == (5, 3)
    assert r1.dup_bigram_occurrences == 5  # "a b" x3 + "b a" x2
    assert r1.keep == 0

    r2 = out[2]
    assert (r2.n_tokens, r2.n_distinct_tokens) == (5, 5)
    assert (r2.n_bigrams, r2.top_bigram_count) == (4, 1)
    assert r2.dup_bigram_occurrences == 0
    # with the floor disabled even all-distinct short docs fail the
    # occupancy gate (1/4 > 1/5) — the reason the floor exists:
    assert r2.keep == 0

    r3 = out[3]
    assert (r3.top_bigram_count, r3.n_bigrams) == (1, 4)
    assert r3.keep == 0  # 1/4 > 1/5: the gate is on occupancy, not dups


def test_repetition_keep_boundary(spark):
    # exactly ON the 20% boundary: top bigram is 1 of 5 -> 5*1 <= 5 keep
    docs = spark.createDataFrame([(1, "m n c d e f")], ["doc_id", "text"])
    r = repetition_signals(docs, min_tokens=0).collect()[0]
    assert (r.top_bigram_count, r.n_bigrams, r.keep) == (1, 5, 1)


def test_repetition_length_floor(spark):
    # default floor: a 6-token doc keeps regardless of repetition, a
    # 20-token spam doc is gated and dropped
    docs = spark.createDataFrame(
        [(1, "a b a b a b"), (2, " ".join(["spam"] * 20))],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r.keep for r in repetition_signals(docs).collect()}
    assert out == {1: 1, 2: 0}


def test_repetition_whitespace_runs(spark):
    """Newlines / tabs / space runs are ONE separator — counts must
    equal the single-space form of the same document (review finding
    r05: a single-space split turned every extra blank into a duplicate
    '' token and falsely failed the dup-token gate)."""
    docs = spark.createDataFrame(
        [(1, "one two three four five"),
         (2, "one  two\nthree\t four \n\n five")],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r
           for r in repetition_signals(docs, min_tokens=0).collect()}
    assert tuple(out[1])[1:] == tuple(out[2])[1:]
    assert (out[2].n_tokens, out[2].n_distinct_tokens) == (5, 5)


def test_pii_redact_chain(spark):
    df = spark.createDataFrame(
        [
            (1, "mail a@b.io and c.d-e@sub.domain.org now"),
            (2, "server 192.168.0.1 and 10.0.0.255 up"),
            (3, "call 0123456789 or 000111222333"),
            (4, "clean text with digits 123 and 45.6 only"),
            # an email whose local part is digits must NOT also count
            # as a phone (phone counted after email removal)
            (5, "ping 0123456789@relay.example.net ok"),
            # real emails are any-case (review finding r05)
            (6, "write John.Doe@Example.COM today"),
        ],
        ["doc_id", "text"],
    )
    out = {
        r.doc_id: r
        for r in df.select(
            "doc_id", *TX.pii_counts(F.col("text")),
            TX.redact_pii(F.col("text")).alias("red"),
        ).collect()
    }
    assert (out[1].n_emails, out[1].red) == (
        2, "mail <EMAIL> and <EMAIL> now")
    assert (out[2].n_ips, out[2].red) == (
        2, "server <IP> and <IP> up")
    assert (out[3].n_phones, out[3].red) == (
        2, "call <PHONE> or <PHONE>")
    assert (out[4].n_emails, out[4].n_ips, out[4].n_phones) == (0, 0, 0)
    assert out[4].red == "clean text with digits 123 and 45.6 only"
    assert (out[5].n_emails, out[5].n_phones) == (1, 0)
    assert out[5].red == "ping <EMAIL> ok"
    assert (out[6].n_emails, out[6].red) == (1, "write <EMAIL> today")
