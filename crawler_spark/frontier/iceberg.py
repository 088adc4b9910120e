"""Iceberg production mapping of the RoundStore commit protocol.

No Iceberg runtime jar ships in this sandbox (SURVEY.md §7 step 0), so
the engine runs on the parquet round-snapshot stand-in
(`store.py::RoundStore` — manifest-last atomic visibility, time travel,
resume). Jar-fetch attempts, once per round per the r02/r03 verdicts:
r04 (2026-08-17): `curl https://repo1.maven.org/maven2/org/apache/
iceberg/iceberg-spark-runtime-...` returns HTTP 000 (no outbound
network in the sandbox; `spark.jars.packages` would fail the same way
at the ivy resolve step).
r05 (2026-08-17): same attempt, same result (HTTP 000) — the item is
closed permanently in-sandbox per the r04 verdict #8; the standing
guard is the parse-validation suite (tests/test_iceberg_sql.py), which
fails if this module's SQL ever rots against the pinned Spark version.
The runtime execution of this module's
MERGE/WAP statements therefore remains cluster-only; everything below
is parse-validated in-sandbox. This module pins the seam's OTHER side: the exact DDL and
per-round SQL a cluster deployment executes against Iceberg tables, one
statement per store operation, so swapping the stand-in for Iceberg is a
config change, not a design task. Every statement is parse-validated
against Spark's SQL parser in tests/test_iceberg_sql.py (full execution
needs the runtime jar; parsing does not).

Mapping (north rule: "10^10-entry frontier held in Iceberg tables ...
merges discovered outlinks back into the frontier with MERGE INTO"):

  RoundStore.commit("frontier") -> MERGE INTO frontier   (batch rows
      deleted, retries updated, discoveries inserted — one snapshot)
  RoundStore.commit("seen")     -> MERGE INTO seen       (insert-if-absent)
  RoundStore.commit("hosts")    -> MERGE INTO hosts      (upsert last_fetch)
  fetch_log / pages / dlq / metrics deltas -> INSERT INTO (append-only)
  resume                        -> read snapshot as of the last published
                                   wap.id (all-or-nothing round visibility)

Cross-table round atomicity uses Iceberg's write-audit-publish staging:
every write in round r carries `spark.wap.id = "round-<r>"`; readers pin
published snapshots only, and the round publishes by fast-forwarding each
table to its audited snapshot — exactly the role `_commits/r{N}.json`
plays in the stand-in. Layout mirrors `frontier/bucketed.py`:
`bucket(N, url)` partition transforms give the storage-partitioned
(zero-Exchange) fetch and seen joins.
"""

from __future__ import annotations

BUCKETS = 64

DDL: dict[str, str] = {
    "frontier": f"""
        CREATE TABLE IF NOT EXISTS wh.frontier (
          url STRING, host_id INT, priority INT,
          disc_round INT, retry_count INT, eligible_round INT)
        USING iceberg
        PARTITIONED BY (bucket({BUCKETS}, url))
        TBLPROPERTIES ('write.distribution-mode' = 'hash',
                       'format-version' = '2',
                       'write.merge.mode' = 'merge-on-read')""",
    "seen": f"""
        CREATE TABLE IF NOT EXISTS wh.seen (url STRING)
        USING iceberg
        PARTITIONED BY (bucket({BUCKETS}, url))
        TBLPROPERTIES ('format-version' = '2')""",
    "hosts": """
        CREATE TABLE IF NOT EXISTS wh.hosts (
          host_id INT, last_fetch_round INT)
        USING iceberg""",
    "fetch_log": """
        CREATE TABLE IF NOT EXISTS wh.fetch_log (
          round INT, priority INT, host_id INT, url STRING, seq INT)
        USING iceberg
        PARTITIONED BY (round)""",
    "pages": f"""
        CREATE TABLE IF NOT EXISTS wh.pages (
          round INT, url STRING, page_id BIGINT, kind STRING,
          image_id BIGINT, priority INT, host_id INT, seq INT,
          headers MAP<STRING, STRING>,
          bytes BINARY, w INT, h INT, fmt STRING,
          caption STRING, phash BIGINT)
        USING iceberg
        PARTITIONED BY (round, bucket({BUCKETS}, url))""",
    "dlq": """
        CREATE TABLE IF NOT EXISTS wh.dlq (
          round INT, url STRING, host_id INT, priority INT,
          disc_round INT, retry_count INT, eligible_round INT)
        USING iceberg
        PARTITIONED BY (round)""",
    "metrics": """
        CREATE TABLE IF NOT EXISTS wh.metrics (
          round INT, n_batch BIGINT, n_fetched BIGINT, n_parts BIGINT,
          max_part_rows BIGINT, n_hosts_approx BIGINT)
        USING iceberg""",
}

# The round's change set, produced by run_round as a temp view with an
# `op` discriminator: 'remove' (fetched this round), 'requeue' (failed,
# retry_count bumped), 'insert' (new discovery that passed robots +
# dedupe). One MERGE applies all three — a single frontier snapshot.
MERGE_FRONTIER = """
    MERGE INTO wh.frontier t
    USING round_frontier_changes c
    ON t.url = c.url
    WHEN MATCHED AND c.op = 'remove' THEN DELETE
    WHEN MATCHED AND c.op = 'requeue' THEN UPDATE SET
      t.retry_count = c.retry_count,
      t.eligible_round = c.eligible_round
    WHEN NOT MATCHED AND c.op = 'insert' THEN INSERT
      (url, host_id, priority, disc_round, retry_count, eligible_round)
      VALUES (c.url, c.host_id, c.priority, c.disc_round,
              c.retry_count, c.eligible_round)"""

# First-discovery-wins (D1/D3): insert-if-absent, never update — the
# MERGE form of the engine's left_anti + union.
MERGE_SEEN = """
    MERGE INTO wh.seen t
    USING round_new_urls c
    ON t.url = c.url
    WHEN NOT MATCHED THEN INSERT (url) VALUES (c.url)"""

MERGE_HOSTS = """
    MERGE INTO wh.hosts t
    USING round_host_fetches c
    ON t.host_id = c.host_id
    WHEN MATCHED THEN UPDATE SET t.last_fetch_round = c.round
    WHEN NOT MATCHED THEN INSERT (host_id, last_fetch_round)
      VALUES (c.host_id, c.round)"""

APPEND = {
    "fetch_log": """
        INSERT INTO wh.fetch_log
        SELECT round, priority, host_id, url, seq FROM round_fetch_log""",
    "pages": """
        INSERT INTO wh.pages
        SELECT round, url, page_id, kind, image_id, priority, host_id,
               seq, headers, bytes, w, h, fmt, caption, phash
        FROM round_pages""",
    "dlq": """
        INSERT INTO wh.dlq
        SELECT round, url, host_id, priority, disc_round, retry_count,
               eligible_round FROM round_dlq""",
    "metrics": """
        INSERT INTO wh.metrics
        SELECT round, n_batch, n_fetched, n_parts, max_part_rows,
               n_hosts_approx FROM round_metrics""",
}


def round_statements() -> list[str]:
    """The ordered statement list one committed round executes on a real
    cluster (after run_round registers the round_* temp views), all under
    one `spark.wap.id` so the round publishes atomically.

    Order: frontier BEFORE seen. Under WAP staging the order is
    invisible (nothing publishes until every statement is audited), but
    if the statements ever run unstaged, a crash between the two must
    err toward re-enqueueing (frontier has the discovery, seen doesn't —
    the next round's anti-join re-admits and dedupe re-drops it:
    at-least-once, self-healing) and never toward losing it (seen
    remembers a URL the frontier never queued: permanently uncrawled).
    State tables precede the append-only logs for the same reason."""
    return [MERGE_FRONTIER, MERGE_SEEN, MERGE_HOSTS, *APPEND.values()]


def all_statements() -> list[str]:
    return [*DDL.values(), *round_statements()]
