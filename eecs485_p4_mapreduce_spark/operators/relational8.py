"""Eighth relational wave: TPC-H q12 and q21 adaptations -- the last two
canonical TPC-H shapes expressible on this corpus (everything still
absent needs the partsupp table, which the testdata does not ship).

The corpus has no l_shipmode / l_commitdate / l_receiptdate, so "late"
is re-expressed on the columns it does have: a lineitem is late when it
ships more than 30 days after its order date.  q12's group-by-shipmode
becomes group-by-linestatus (the only categorical lineitem column), and
q21's receipt>commit predicate becomes the same 30-day lateness --
the plan shapes (q12: join + conditional partial aggregation; q21:
EXISTS + NOT EXISTS self-joins over lineitem) are the canonical ones.

Same construction as relational4/5 (SURVEY.md §2.C joins/aggregations
rows): one SQL text fed verbatim to BOTH Spark and the DuckDB oracle
via ``run_sql``, so the engines parse identical text and the comparison
is bitwise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from eecs485_p4_mapreduce_spark.plans.registry import query
from eecs485_p4_mapreduce_spark.sources import run_sql

_Q12 = """
    SELECT l.l_linestatus,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
      AND l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY l.l_linestatus
    ORDER BY l.l_linestatus
"""

_Q21 = """
    SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE o.o_orderstatus = 'F'
      AND l1.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
      AND n.n_name = 'NATION_3'
      AND EXISTS (
          SELECT 1 FROM lineitem l2
          WHERE l2.l_orderkey = l1.l_orderkey
            AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
          SELECT 1 FROM lineitem l3
          WHERE l3.l_orderkey = l1.l_orderkey
            AND l3.l_suppkey <> l1.l_suppkey
            AND l3.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
      )
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 100
"""


@query("tpch_q12_late_lines", oracle=_Q12)
def tpch_q12_late_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q12 (shipping modes and order priority), adapted: count
    late lineitems (shipped >30 days after order date) per linestatus,
    split into high- vs low-priority orders.  One orderkey equi-join
    (the corpus's biggest shuffle pair), with the date window pushed to
    the lineitem scan so row-group skipping prunes to one year; the
    priority CASEs fold into partial aggregation map-side, so only
    per-status partial counts cross the final exchange.  Integer
    CAST keeps both engines at BIGINT."""
    return run_sql(spark, sf_dir, _Q12)


@query("tpch_q21_suppliers_kept_waiting", oracle=_Q21)
def tpch_q21_suppliers_kept_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q21 (suppliers who kept orders waiting), adapted to the
    30-day lateness predicate: suppliers in one nation who were the
    ONLY late supplier on a finished multi-supplier order.  The classic
    hard shape: lineitem joined against itself twice -- a correlated
    EXISTS (another supplier participated) and a correlated NOT EXISTS
    (no other supplier was late).  Catalyst lowers these to one
    left-semi and one left-anti join on l_orderkey, so at 100 TB the
    query is three orderkey-partitioned shuffles over lineitem (reusable
    exchange for the two self-join sides), never a per-row rescan;
    nation and supplier broadcast.  Deterministic top-100 via the
    (numwait DESC, s_name) total order."""
    return run_sql(spark, sf_dir, _Q21)
