"""Third relational coverage wave: subqueries (scalar, IN, correlated
EXISTS/NOT EXISTS, correlated scalar) and TPC-H-canonical join+agg+top-k
shapes (q3 shipping priority, q18 large-volume customers).

Subqueries are the one SQL surface the reference framework cannot even
emulate with user executables (they need a second pass over a second
input, cf. SURVEY.md §2.C "Joins ... absent"); Catalyst de-correlates all
of these into joins (RewritePredicateSubquery / scalar-subquery rewrite),
so at 100 TB they execute as broadcast or shuffle joins -- no per-row
re-scans, unlike a naive interpreter.

Cross-engine determinism: every aggregate that feeds a comparison
(HAVING, scalar-subquery threshold) goes through the decimal-exact
dsum/davg twins in :mod:`eecs485_p4_mapreduce_spark.functions.numeric`,
so Spark and DuckDB compare bitwise-identical doubles and select the
same rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from eecs485_p4_mapreduce_spark.functions.numeric import davg_sql, dsum_sql
from eecs485_p4_mapreduce_spark.plans.registry import query
from eecs485_p4_mapreduce_spark.sources import load_table


def _views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    for n in names:
        load_table(spark, sf_dir, n).createOrReplaceTempView(f"r3_{n}")


@query(
    "subquery_scalar_avg",
    oracle=f"""
    SELECT p_brand, COUNT(*) AS n_above, MAX(p_retailprice) AS max_price
    FROM part
    WHERE p_retailprice > (SELECT {davg_sql('p_retailprice')} FROM part)
    GROUP BY p_brand
    """,
)
def subquery_scalar_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery as a filter threshold: parts priced
    above the global average.  Catalyst plans the subquery as a separate
    job whose single-row result is broadcast into the filter -- one extra
    pass, no per-row evaluation, which is exactly what you want at scale.
    """
    _views(spark, sf_dir, "part")
    return spark.sql(
        f"""
        SELECT p_brand, COUNT(*) AS n_above, MAX(p_retailprice) AS max_price
        FROM r3_part
        WHERE p_retailprice > (SELECT {davg_sql('p_retailprice')} FROM r3_part)
        GROUP BY p_brand
        """
    )


@query(
    "subquery_in_q18",
    oracle=f"""
    SELECT o.o_orderkey, c.c_name, o.o_totalprice,
           {dsum_sql('l.l_quantity')} AS total_qty
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey
        HAVING {dsum_sql('l_quantity')} > 250.0
    )
    GROUP BY o.o_orderkey, c.c_name, o.o_totalprice
    """,
)
def subquery_in_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q18 (large-volume customers): IN over an aggregated-HAVING
    subquery.  Catalyst rewrites IN to a left-semi join on the aggregated
    side; the HAVING sum is decimal-exact so both engines pick the same
    orderkeys at the 250-unit threshold."""
    _views(spark, sf_dir, "customer", "orders", "lineitem")
    return spark.sql(
        f"""
        SELECT o.o_orderkey, c.c_name, o.o_totalprice,
               {dsum_sql('l.l_quantity')} AS total_qty
        FROM r3_customer c
        JOIN r3_orders o ON c.c_custkey = o.o_custkey
        JOIN r3_lineitem l ON o.o_orderkey = l.l_orderkey
        WHERE o.o_orderkey IN (
            SELECT l_orderkey FROM r3_lineitem
            GROUP BY l_orderkey
            HAVING {dsum_sql('l_quantity')} > 250.0
        )
        GROUP BY o.o_orderkey, c.c_name, o.o_totalprice
        """
    )


@query(
    "subquery_exists_correlated",
    oracle="""
    SELECT c.c_mktsegment, COUNT(*) AS n_cust
    FROM customer c
    WHERE EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000.0
    )
    AND NOT EXISTS (
        SELECT 1 FROM orders o2
        WHERE o2.o_custkey = c.c_custkey
          AND o2.o_orderstatus = 'F' AND o2.o_totalprice < 10000.0
    )
    GROUP BY c.c_mktsegment
    """,
)
def subquery_exists_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS + NOT EXISTS in one predicate: customers with at
    least one big order and no small finished order.  Catalyst lowers
    these to a left-semi and a left-anti join respectively (visible in
    the plan) -- two shuffle joins, not O(customers) re-scans."""
    _views(spark, sf_dir, "customer", "orders")
    return spark.sql(
        """
        SELECT c.c_mktsegment, COUNT(*) AS n_cust
        FROM r3_customer c
        WHERE EXISTS (
            SELECT 1 FROM r3_orders o
            WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000.0
        )
        AND NOT EXISTS (
            SELECT 1 FROM r3_orders o2
            WHERE o2.o_custkey = c.c_custkey
              AND o2.o_orderstatus = 'F' AND o2.o_totalprice < 10000.0
        )
        GROUP BY c.c_mktsegment
        """
    )


@query(
    "subquery_correlated_scalar",
    oracle=f"""
    SELECT p.p_brand, COUNT(*) AS n_above
    FROM part p
    WHERE p.p_retailprice > (
        SELECT {davg_sql('p2.p_retailprice')} FROM part p2
        WHERE p2.p_brand = p.p_brand
    )
    GROUP BY p.p_brand
    """,
)
def subquery_correlated_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar aggregate subquery: parts above their own
    brand's average price.  Catalyst de-correlates into a per-brand
    aggregate joined back on the correlation key -- the aggregate is
    computed once per brand, then broadcast, instead of once per row."""
    _views(spark, sf_dir, "part")
    return spark.sql(
        f"""
        SELECT p.p_brand, COUNT(*) AS n_above
        FROM r3_part p
        WHERE p.p_retailprice > (
            SELECT {davg_sql('p2.p_retailprice')} FROM r3_part p2
            WHERE p2.p_brand = p.p_brand
        )
        GROUP BY p.p_brand
        """
    )


@query(
    "tpch_q3_shipping_priority",
    oracle=f"""
    SELECT l.l_orderkey,
           {dsum_sql('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-07-01'
      AND l.l_shipdate > TIMESTAMP '1998-07-01'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l.l_orderkey
    LIMIT 10
    """,
)
def tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q3 (shipping priority): selective filters on all three join
    inputs, revenue aggregate, global top-10.  The segment filter reaches
    the customer scan (pushdown), the small filtered customer side
    broadcasts, and the final ORDER BY+LIMIT runs as
    TakeOrderedAndProject (no global sort).  Tie-break on l_orderkey
    makes the LIMIT deterministic across engines."""
    _views(spark, sf_dir, "customer", "orders", "lineitem")
    return spark.sql(
        f"""
        SELECT l.l_orderkey,
               {dsum_sql('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
               o.o_orderdate, o.o_orderpriority
        FROM r3_customer c
        JOIN r3_orders o ON c.c_custkey = o.o_custkey
        JOIN r3_lineitem l ON o.o_orderkey = l.l_orderkey
        WHERE c.c_mktsegment = 'BUILDING'
          AND o.o_orderdate < TIMESTAMP '1998-07-01'
          AND l.l_shipdate > TIMESTAMP '1998-07-01'
        GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
        ORDER BY revenue DESC, l.l_orderkey
        LIMIT 10
        """
    )


@query(
    "subquery_q2_max_acctbal",
    oracle="""
    SELECT r.r_name, n.n_name, s.s_name, s.s_acctbal
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE s.s_acctbal = (
        SELECT MAX(s2.s_acctbal) FROM supplier s2
        WHERE s2.s_nationkey = s.s_nationkey
    )
    """,
)
def subquery_q2_max_acctbal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q2's shape (equality against a correlated aggregate) on the
    tables this corpus has: the top-balance supplier(s) per nation, with
    nation/region names joined in.  Catalyst de-correlates the MAX into a
    per-nation aggregate joined back on the correlation key; nation and
    region broadcast.  MAX of a double is a pure selection (no
    accumulation), so no decimal guard is needed for parity."""
    _views(spark, sf_dir, "supplier", "nation", "region")
    return spark.sql(
        """
        SELECT r.r_name, n.n_name, s.s_name, s.s_acctbal
        FROM r3_supplier s
        JOIN r3_nation n ON s.s_nationkey = n.n_nationkey
        JOIN r3_region r ON n.n_regionkey = r.r_regionkey
        WHERE s.s_acctbal = (
            SELECT MAX(s2.s_acctbal) FROM r3_supplier s2
            WHERE s2.s_nationkey = s.s_nationkey
        )
        """
    )


@query(
    "lateral_topk_orders",
    oracle="""
    SELECT c.c_custkey, c.c_mktsegment, t.o_orderkey, t.o_totalprice
    FROM customer c, LATERAL (
        SELECT o_orderkey, o_totalprice FROM orders o
        WHERE o.o_custkey = c.c_custkey
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 3
    ) t
    WHERE c.c_mktsegment IN ('BUILDING', 'MACHINERY')
    """,
)
def lateral_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery with per-row ORDER BY ... LIMIT: each
    customer's top-3 orders by price.  Catalyst de-correlates this into a
    WindowGroupLimit over orders partitioned by o_custkey (partial limit
    before the shuffle, final after) joined back to customers -- the
    top-k never materializes more than k rows per key per partition, so
    the plan scales with customers x k, not with all orders.  Tie-break
    on o_orderkey keeps the per-customer cut deterministic."""
    _views(spark, sf_dir, "customer", "orders")
    return spark.sql(
        """
        SELECT c.c_custkey, c.c_mktsegment, t.o_orderkey, t.o_totalprice
        FROM r3_customer c, LATERAL (
            SELECT o_orderkey, o_totalprice FROM r3_orders o
            WHERE o.o_custkey = c.c_custkey
            ORDER BY o_totalprice DESC, o_orderkey
            LIMIT 3
        ) t
        WHERE c.c_mktsegment IN ('BUILDING', 'MACHINERY')
        """
    )
