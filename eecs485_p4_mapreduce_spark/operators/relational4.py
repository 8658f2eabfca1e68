"""Fourth relational wave: canonical TPC-H query shapes adapted to the
columns this corpus carries (no partsupp table, no l_shipmode /
l_commitdate / l_receiptdate, no p_container -- predicates are adapted,
the plan shapes are the canonical ones).

These exercise the join/agg patterns a 100 TB warehouse lives on:
Q5's six-way snowflake with a cross-dimension equality (customer and
supplier in the same nation), Q6's pure scan-side predicate reduction,
Q10's group-by over a three-way join with a global top-k, Q14's
conditional-aggregate ratio, Q17's correlated per-key average, Q19's
OR-of-conjunctions pushed into one join.  Each SQL string is written
once and fed verbatim to BOTH Spark (over temp views named like the
parquet tables) and the DuckDB oracle, so the two engines parse the
identical text; all double aggregates go through the decimal-exact
dsum/davg twins (:mod:`..functions.numeric`) so they compare bitwise.

Reference parity note: the reference framework (SURVEY.md §2.C) has no
join operator at all -- every query here is net-new surface built on
Catalyst; citations are to the checklist rows they satisfy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from eecs485_p4_mapreduce_spark.functions.numeric import davg_sql, dsum_sql
from eecs485_p4_mapreduce_spark.plans.registry import query
from eecs485_p4_mapreduce_spark.sources import run_sql

_Q4 = """
    SELECT o.o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1996-04-01'
      AND EXISTS (
          SELECT 1 FROM lineitem l
          WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
      )
    GROUP BY o.o_orderpriority
"""

_Q5 = f"""
    SELECT n.n_name,
           {dsum_sql('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n.n_name
"""

_Q6 = f"""
    SELECT {dsum_sql('l_extendedprice * l_discount')} AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
"""

_Q10 = f"""
    SELECT c.c_custkey, c.c_name,
           {dsum_sql('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
           c.c_acctbal, n.n_name
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1996-04-01'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
"""

_Q14 = f"""
    SELECT 100.0 * {dsum_sql(
        "CASE WHEN p.p_type = 'PROMO'"
        " THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0.0 END")}
           / {dsum_sql('l.l_extendedprice * (1 - l.l_discount)')}
           AS promo_revenue_pct
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-09-01'
      AND l.l_shipdate < TIMESTAMP '1996-10-01'
"""

_Q17 = f"""
    SELECT {dsum_sql('l.l_extendedprice')} / 7.0 AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#13'
      AND l.l_quantity < (
          SELECT 0.2 * {davg_sql('l2.l_quantity')}
          FROM lineitem l2 WHERE l2.l_partkey = p.p_partkey
      )
"""

_Q19 = f"""
    SELECT {dsum_sql('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity >= 1 AND l.l_quantity <= 11)
       OR (p.p_brand = 'Brand#7' AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity >= 10 AND l.l_quantity <= 20)
       OR (p.p_brand = 'Brand#20' AND p.p_size BETWEEN 1 AND 35
           AND l.l_quantity >= 20 AND l.l_quantity <= 30)
"""



@query("tpch_q4_priority_count", oracle=_Q4)
def tpch_q4_priority_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q4 (order priority checking), adapted: late-shipping orders
    per priority, with the commit/receipt-date predicate replaced by
    ``l_shipdate > o_orderdate`` (the columns this corpus has).  The
    correlated EXISTS carries a non-equi conjunct on top of the orderkey
    equality; Catalyst still lowers it to one left-semi join -- no
    per-order rescan of lineitem."""
    return run_sql(spark, sf_dir, _Q4)


@query("tpch_q5_local_supplier_volume", oracle=_Q5)
def tpch_q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q5 (local supplier volume): six-way snowflake join where
    customer and supplier must sit in the same nation.  region/nation
    (and the filtered year of orders at real scale) broadcast; the
    c_nationkey = s_nationkey cross-dimension equality rides along as a
    join residual instead of a post-join filter.  At 100 TB the only big
    shuffle is lineitem⋈orders on orderkey."""
    return run_sql(spark, sf_dir, _Q5)


@query("tpch_q6_forecast_revenue", oracle=_Q6)
def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q6 (forecasting revenue change): no join, no group-by --
    the whole query is scan-side predicate evaluation plus one global
    sum.  All three predicates push to the parquet scan
    (min/max row-group skipping on l_shipdate), so the 100 TB plan reads
    a year's row groups and two columns, nothing else."""
    return run_sql(spark, sf_dir, _Q6)


@query("tpch_q10_returned_items", oracle=_Q10)
def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q10 (returned item reporting): revenue lost to returns per
    customer over a quarter, global top-20.  The returnflag and date
    filters push to the scans; the final ORDER BY + LIMIT plans as
    TakeOrderedAndProject (per-partition top-20, then a 20-row merge on
    the driver -- no global sort).  Exact-decimal revenue plus the
    c_custkey tie-break make the cut deterministic across engines."""
    return run_sql(spark, sf_dir, _Q10)


@query("tpch_q14_promo_effect", oracle=_Q14)
def tpch_q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q14 (promotion effect): percentage of one month's revenue
    from PROMO-type parts -- a conditional aggregate divided by a total,
    computed in one pass over the join (no second scan).  Both sums are
    decimal-exact before the single double division, so the ratio is
    bitwise stable."""
    return run_sql(spark, sf_dir, _Q14)


@query("tpch_q17_small_qty_revenue", oracle=_Q17)
def tpch_q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q17 (small-quantity-order revenue): lineitems of one brand
    below 20% of their part's average quantity.  Catalyst de-correlates
    the per-part average into one aggregate over lineitem joined back on
    partkey -- two passes total, not one per part.  The threshold is
    0.2 * decimal-exact average, identical in both engines."""
    return run_sql(spark, sf_dir, _Q17)


@query("tpch_q19_discounted_revenue", oracle=_Q19)
def tpch_q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q19 (discounted revenue): an OR of three brand/size/quantity
    conjunctions evaluated inside one lineitem⋈part join.  part is the
    small side and broadcasts; the partkey equality is shared by all
    three branches so the disjunction becomes a join residual, not three
    unions of the fact table."""
    return run_sql(spark, sf_dir, _Q19)


_RCTE = """
    WITH RECURSIVE walk AS (
      SELECT p_partkey AS start_key, p_partkey AS cur, 0 AS depth,
             CAST(p_retailprice AS DECIMAL(18,6)) AS path_price
      FROM part
      UNION ALL
      SELECT w.start_key, p.p_partkey, w.depth + 1,
             CAST(w.path_price + CAST(p.p_retailprice AS DECIMAL(18,6))
                  AS DECIMAL(18,6))
      FROM walk w JOIN part p ON p.p_partkey = CAST(FLOOR(w.cur / 8) AS BIGINT)
      WHERE w.cur > 0
    )
    SELECT start_key, CAST(MAX(depth) AS INT) AS depth_to_root,
           CAST(MAX(path_price) AS DOUBLE) AS path_price_rollup
    FROM walk GROUP BY start_key
"""


@query("recursive_cte_tree_rollup", oracle=_RCTE)
def recursive_cte_tree_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (WITH RECURSIVE): walk every part up an implicit
    8-ary tree hierarchy (parent = partkey/8) to the root, accumulating
    depth and a decimal-exact price rollup along the path.  Each
    recursion level is one join of the frontier against the parent
    table, so the total work is O(rows * depth) with depth = log8(keys)
    -- the set-at-a-time semantics a 100 TB hierarchy rollup needs,
    versus row-at-a-time tree walks.  The same SQL text runs on both
    engines (integer parent arithmetic spelled FLOOR(cur/8), exact for
    keys far below 2^52); the running sum stays decimal inside the
    recursion and becomes double only at the end."""
    return run_sql(spark, sf_dir, _RCTE)


_RCTE_PATHS = """
    WITH RECURSIVE edges AS (
      SELECT DISTINCT src, dst FROM (
        SELECT event_type AS src,
               lead(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS dst
        FROM events)
      WHERE dst IS NOT NULL AND src <> dst),
    paths AS (
      SELECT src AS start_t, dst AS end_t, 1 AS depth FROM edges
      UNION ALL
      SELECT p.start_t, e.dst, p.depth + 1
      FROM paths p JOIN edges e ON e.src = p.end_t
      WHERE p.depth < 3
    )
    SELECT start_t, end_t, CAST(COUNT(*) AS BIGINT) AS n_paths,
           CAST(MIN(depth) AS INT) AS shortest
    FROM paths GROUP BY start_t, end_t
"""


@query("recursive_cte_path_counts", oracle=_RCTE_PATHS)
def recursive_cte_path_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE over a CYCLIC graph (the event-type transition
    graph), UNION ALL with an explicit depth cap — the cycle-safe
    recursion discipline when the engine's recursion is bag-semantics:
    path counts and shortest-path length for every reachable pair within
    3 hops.  The edge list is derived with a lead() window (one user_id
    shuffle over events); the recursion then iterates on the tiny
    distinct edge set.  Same SQL text on both engines
    (recursive_cte_tree_rollup precedent)."""
    return run_sql(spark, sf_dir, _RCTE_PATHS)
