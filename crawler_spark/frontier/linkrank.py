"""Link-graph mass ranking for crawl prioritization (OPIC/PageRank-lite).

Production crawlers order their frontier by link popularity: OPIC
(Abiteboul et al., "Adaptive On-Line Page Importance Computation")
distributes each page's "cash" over its outlinks and fetches the
highest-accumulated-cash URLs first; batch systems run a few PageRank
iterations over the discovered link graph between crawl waves.  The
reference crawler has no link-graph surface (its priority is
relevance + geography, SURVEY.md E1); this extends the E-family with
the standard popularity signal.

``link_mass_rank`` runs a fixed number of damped mass-propagation
iterations ENTIRELY in integer arithmetic so every intermediate is
engine-exact (the oracle replays the same iterations in SQL):

    mass_0(v)   = SCALE
    mass_i+1(v) = (15 * SCALE) div 100
                  + (85 * sum over in-edges (u,v) of
                        mass_i(u) div outdeg(u)) div 100

All quantities are non-negative, so Spark's truncating ``div`` and
DuckDB's flooring ``//`` agree; integral division loses remainders
deterministically (identically on both engines), which is exactly the
trade OPIC makes with its cash quanta.

Scale shape per iteration: one groupBy(dst) aggregation with map-side
partial sums + one join of the mass vector back onto the edge list's
src side — the hash-to-min shape of operators/dedup.py::
connected_components with sum instead of min.  Iterations are a fixed
small constant (2-3 suffice to separate hubs from the tail for frontier
ordering), so there is no driver-synchronized convergence loop at all;
for long chains, localCheckpoint the mass vector every few iterations
exactly as connected_components does.  Hot pages (mega in-degree) are
plain aggregation skew — AQE splits the partial-agg buckets, no salting
needed because sum is associative.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["link_mass_rank", "SCALE"]

SCALE = 1_000_000  # one page = 1M cash units; div keeps everything exact


def link_mass_rank(
    edges: DataFrame,
    src_col: str,
    dst_col: str,
    iterations: int = 2,
) -> DataFrame:
    """Damped integer mass propagation over a directed link graph.

    Returns one row per node that appears in ``edges`` (either side):
    (node, indegree, outdegree, mass) with ``mass`` after ``iterations``
    rounds.  Dangling nodes (no outlinks) simply don't forward mass —
    the OPIC treatment; nodes with no inlinks keep the damping floor.
    """
    e = edges.select(
        F.col(src_col).alias("_src"), F.col(dst_col).alias("_dst"))
    nodes = (
        e.select(F.col("_src").alias("node"))
        .union(e.select(F.col("_dst").alias("node")))
        .distinct()
    )
    outdeg = e.groupBy("_src").agg(F.count("*").alias("outdeg"))
    indeg = e.groupBy("_dst").agg(F.count("*").alias("indeg"))
    mass = nodes.select("node", F.lit(SCALE).cast("long").alias("mass"))
    floor = (15 * SCALE) // 100
    for it in range(iterations):
        contrib = (
            e.join(mass.withColumnRenamed("node", "_src"), "_src")
            .join(outdeg, "_src")
            .select(
                "_dst",
                F.expr("mass div outdeg").alias("_c"),
            )
        )
        incoming = contrib.groupBy("_dst").agg(F.sum("_c").alias("_in"))
        mass = (
            nodes.join(incoming.withColumnRenamed("_dst", "node"),
                       "node", "left")
            .select(
                "node",
                (F.lit(floor)
                 + F.expr("85 * coalesce(_in, 0) div 100")
                 ).cast("long").alias("mass"),
            )
        )
        # keep lineage flat on long chains (the connected_components
        # pattern); the 2-3 iteration frontier default never triggers it
        if (it + 1) % 3 == 0 and it + 1 < iterations:
            mass = mass.localCheckpoint(eager=True)
    return (
        mass
        .join(indeg.withColumnRenamed("_dst", "node"), "node", "left")
        .join(outdeg.withColumnRenamed("_src", "node"), "node", "left")
        .select(
            "node",
            F.coalesce("indeg", F.lit(0)).cast("long").alias("indegree"),
            F.coalesce("outdeg", F.lit(0)).cast("long").alias("outdegree"),
            "mass",
        )
    )
