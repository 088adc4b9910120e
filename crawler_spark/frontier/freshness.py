"""Freshness-driven re-crawl scheduling (change-rate -> revisit interval).

The reference crawler re-fetches every known URL each run and relies on
its content-change gate to skip unchanged pages after the fetch
(crawler_service change detection; SURVEY.md A14/B8/D2 — mirrored here
by plans/frontier_queries.py::content_change_gate).  At 10^10 URLs that
wastes almost the whole fetch budget: incremental-crawl scheduling (Cho &
Garcia-Molina, "Effective Page Refresh Policies for Web Crawlers") keys
the revisit interval to each URL's observed change rate instead.

``recrawl_schedule`` turns a fetch history (one row per fetch with a
content-changed observation) into a per-URL schedule:

* change ratio  = n_changes / n_fetches, compared against tier cuts with
  INTEGER cross-multiplication (n_changes * den >= n_fetches * num) so
  the tiering is engine-exact — no float ratio ever materializes;
* revisit tier  -> hours (hot / warm / cold), a bounded step function of
  the ratio (the estimator is the empirical change frequency; the
  Poisson-MLE refinement -ln(1 - X/n) is a monotone transform of X/n, so
  a tier table keyed on X/n expresses the same policy without floats);
* next_due      = last_fetch + revisit hours (exact integer-microsecond
  timestamp arithmetic on both engines).

Scale shape: one keyed aggregation over the fetch log with map-side
partials — the log is append-only and partitioned by day in practice, so
the agg prunes to the trailing window; everything downstream is column
algebra.  The output joins the frontier on url_id to gate eligibility
(next_due <= now), the same broadcast/bucketed join seam the robots gate
uses (frontier/engine.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["recrawl_schedule", "DEFAULT_TIERS"]

# (name, ratio numerator, ratio denominator, revisit hours): a URL whose
# observed change ratio is >= num/den lands in the first matching tier.
DEFAULT_TIERS = [
    ("hot", 1, 2, 6),     # changes on >= half its fetches -> 6 h
    ("warm", 1, 5, 24),   # >= a fifth -> daily
    ("cold", 0, 1, 72),   # everything else -> 3 days
]


def recrawl_schedule(
    fetch_log: DataFrame,
    url_col: str,
    ts_col: str,
    changed_pred: Column,
    tiers: list[tuple[str, int, int, int]] = DEFAULT_TIERS,
) -> DataFrame:
    """Per-URL revisit schedule from a fetch history.

    Returns (url_col, n_fetches, n_changes, tier, revisit_hours,
    next_due), one row per URL.  ``changed_pred`` is the per-fetch
    content-changed observation (e.g. sha256 differs from the previous
    snapshot — the content_change_gate output feeds straight in).
    """
    per_url = fetch_log.groupBy(url_col).agg(
        F.count("*").cast("long").alias("n_fetches"),
        # NULL observation = not changed (coalesce BEFORE the sum — a
        # bare sum would skip NULLs and, on an all-NULL URL, go NULL
        # itself instead of 0)
        F.sum(F.coalesce(changed_pred.cast("long"), F.lit(0)))
        .cast("long").alias("n_changes"),
        F.max(F.col(ts_col)).alias("last_fetch"),
    )
    tier_col: Column = F.lit(tiers[-1][0])
    hours_col: Column = F.lit(tiers[-1][3])
    # build the CASE from the last (loosest) tier up so the first
    # matching (tightest) tier wins, exactly like a SQL CASE top-down
    for name, num, den, hours in reversed(tiers[:-1]):
        hit = F.col("n_changes") * den >= F.col("n_fetches") * num
        tier_col = F.when(hit, name).otherwise(tier_col)
        hours_col = F.when(hit, hours).otherwise(hours_col)
    return (
        per_url.withColumn("tier", tier_col)
        .withColumn("revisit_hours", hours_col.cast("int"))
        .withColumn(
            "next_due",
            F.expr("timestampadd(HOUR, revisit_hours, last_fetch)"),
        )
        .select(url_col, "n_fetches", "n_changes", "tier",
                "revisit_hours", "next_due")
    )


def due_filter(
    frontier: DataFrame,
    schedule: DataFrame,
    url_col: str,
    now,
) -> DataFrame:
    """Re-crawl eligibility gate: keep frontier rows whose URL is due at
    ``now`` (next_due <= now) — or has no schedule yet (never fetched =
    always eligible).  A left join on the url key + one filter: the same
    broadcast/bucketed seam as the robots gate, so it composes with
    enqueue/schedule_batch without a new shuffle shape.  ``now`` is a
    datetime or ISO string, compared exactly (integer microseconds)."""
    sched = schedule.select(
        F.col(url_col).alias("__u"), F.col("next_due").alias("__due"))
    return (
        frontier.join(
            sched, frontier[url_col] == sched["__u"], "left")
        .where(F.col("__due").isNull()
               | (F.col("__due") <= F.lit(now).cast("timestamp")))
        .drop("__u", "__due")
    )
