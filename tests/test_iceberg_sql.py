"""The Iceberg production mapping (frontier/iceberg.py) is parse-valid
Spark SQL: no runtime jar ships in the sandbox, so statements can't
EXECUTE, but Spark's parser fully validates MERGE INTO / partition
transforms / DDL syntax without a catalog — a malformed statement (the
usual swap-day failure) is caught here."""

from __future__ import annotations

import pytest

from crawler_spark.frontier import iceberg as I


def _parse(spark, sql: str):
    # sessionState().sqlParser() parses without analysis/catalog lookup
    return spark._jsparkSession.sessionState().sqlParser().parsePlan(sql)


def test_all_statements_parse(spark):
    for sql in I.all_statements():
        _parse(spark, sql)  # raises ParseException on bad syntax


def test_merge_frontier_covers_all_round_transitions(spark):
    plan = str(_parse(spark, I.MERGE_FRONTIER))
    # delete fetched, update retries, insert discoveries — the exact
    # frontier' = (frontier - batch) ∪ requeue ∪ new of engine.py step 7
    assert "deleteaction" in plan
    assert "updateaction" in plan
    assert "insertaction" in plan


def test_seen_merge_is_insert_only(spark):
    plan = str(_parse(spark, I.MERGE_SEEN))
    assert "insertaction" in plan
    assert "deleteaction" not in plan and "updateaction" not in plan


def test_ddl_buckets_match_bucketed_module(spark):
    from crawler_spark.frontier.bucketed import DEFAULT_BUCKETS

    assert I.BUCKETS == DEFAULT_BUCKETS
    assert f"bucket({I.BUCKETS}, url)" in I.DDL["frontier"]
    assert f"bucket({I.BUCKETS}, url)" in I.DDL["seen"]


def test_round_statement_order_publishes_consistently():
    """frontier must merge before seen: if the statements ever run
    unstaged, a crash between them must err toward re-enqueueing (the
    anti-join + dedupe self-heal a duplicate) and never toward a URL
    that seen remembers but the frontier never queued (permanently
    uncrawled). State tables precede append-only logs."""
    stmts = I.round_statements()
    assert stmts.index(I.MERGE_FRONTIER) < stmts.index(I.MERGE_SEEN)
    assert stmts.index(I.MERGE_SEEN) < stmts.index(I.APPEND["pages"])


def test_statements_reject_typo(spark):
    with pytest.raises(Exception):
        _parse(spark, "MERGE INTOO wh.frontier t USING c ON 1=1")
