"""Iterative graph algorithm (SURVEY.md §2.C: the "non-SQL-expressible"
category -- except we pin even this to an oracle by unrolling the fixed
iteration count into chained CTEs).

PageRank over the event-type transition graph: nodes are event types,
edge u->v weighted by how often v follows u in some user's timeline.
The edge extraction is the scale-relevant part (one window shuffle over
the full events table); the iteration then runs on the tiny aggregated
graph -- the standard shape for graph analytics on log data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from eecs485_p4_mapreduce_spark.plans.registry import query
from eecs485_p4_mapreduce_spark.sources import load_table

_ITERS = 10
_DAMP = 0.85


def _pagerank_oracle() -> str:
    """Unroll the fixed-point iteration into chained CTEs (r0..rN)."""
    parts = [
        """
        edges AS (
          SELECT src, dst, COUNT(*) AS w FROM (
            SELECT lag(event_type) OVER (PARTITION BY user_id ORDER BY ts) AS src,
                   event_type AS dst
            FROM events)
          WHERE src IS NOT NULL GROUP BY src, dst),
        outw AS (SELECT src, SUM(w) AS tw FROM edges GROUP BY src),
        nodes AS (SELECT DISTINCT dst AS node FROM edges
                  UNION SELECT DISTINCT src FROM edges),
        nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
        r0 AS (SELECT node, 1.0 / (SELECT n FROM nn) AS rank FROM nodes)
        """
    ]
    for k in range(_ITERS):
        parts.append(
            f"""
        r{k + 1} AS (
          SELECT n.node,
                 (1.0 - {_DAMP}) / (SELECT n FROM nn) + {_DAMP} * coalesce(SUM(
                     r.rank * e.w / o.tw), 0.0) AS rank
          FROM nodes n
          LEFT JOIN edges e ON e.dst = n.node
          LEFT JOIN r{k} r ON r.node = e.src
          LEFT JOIN outw o ON o.src = e.src
          GROUP BY n.node)
            """
        )
    return (
        "WITH " + ",".join(parts)
        + f" SELECT node AS event_type, round(rank, 6) AS pagerank FROM r{_ITERS}"
    )


@query("graph_pagerank", oracle=_pagerank_oracle())
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank (10 iterations, d=0.85) on event-type
    transitions.

    Spark side: one window shuffle extracts edges from the raw log, then
    a driver-side loop iterates on the aggregated graph (broadcast-sized
    here; at billions of nodes each iteration is the classic
    join-aggregate with the rank DataFrame checkpointed every few steps
    to truncate lineage -- same code shape).  The DuckDB oracle unrolls
    the same 10 iterations as chained CTEs, proving even the iterative
    operator exactly.
    """
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts")
    edges = (
        e.select(F.lag("event_type").over(w).alias("src"), F.col("event_type").alias("dst"))
        .filter(F.col("src").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count("*").alias("w"))
        .localCheckpoint()  # iteration reuses edges; never recompute the window
    )
    outw = edges.groupBy("src").agg(F.sum("w").alias("tw"))
    nodes = (
        edges.select(F.col("dst").alias("node"))
        .union(edges.select(F.col("src").alias("node")))
        .distinct()
    )
    # node count from the data, not a constant: a generator change in the
    # number of event types must not silently break rank normalization
    n_nodes = nodes.count()
    ranks = nodes.withColumn("rank", F.lit(1.0 / n_nodes))
    contrib_base = edges.join(outw, "src")
    for k in range(_ITERS):
        incoming = (
            contrib_base.join(ranks, contrib_base.src == ranks.node)
            .select(
                F.col("dst"),
                (F.col("rank") * F.col("w") / F.col("tw")).alias("c"),
            )
            .groupBy("dst")
            .agg(F.sum("c").alias("inflow"))
        )
        ranks = (
            nodes.join(incoming, nodes.node == incoming.dst, "left")
            .select(
                "node",
                (
                    F.lit((1.0 - _DAMP) / n_nodes)
                    + F.lit(_DAMP) * F.coalesce(F.col("inflow"), F.lit(0.0))
                ).alias("rank"),
            )
        )
        if (k + 1) % 4 == 0:
            # truncate lineage: iterative plans grow linearly and would
            # blow up analysis/codegen time by iteration ~15 otherwise
            ranks = ranks.localCheckpoint()
    return ranks.select(F.col("node").alias("event_type"), F.round("rank", 6).alias("pagerank"))
