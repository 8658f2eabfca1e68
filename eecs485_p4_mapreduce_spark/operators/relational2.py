"""Second relational coverage wave (SURVEY.md §2.C gaps): grouping sets,
full-outer/cross joins, ALL-variant set ops, array/map functions, pivot,
percentiles, deterministic sampling, regex functions, null-safe equality,
conditional aggregation, decimal-exact statistical moments, date
arithmetic, and the MERGE/upsert join pattern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from eecs485_p4_mapreduce_spark.functions.numeric import dsum, dsum_sql, hu_ratio_signed, hu_ratio_signed_sql
from eecs485_p4_mapreduce_spark.plans.registry import query
from eecs485_p4_mapreduce_spark.sources import load_table


@query(
    "grouping_sets_orders",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority,
           GROUPING(o_orderstatus, o_orderpriority) AS gid,
           COUNT(*) AS n, {dsum_sql('o_totalprice')} AS revenue
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
)
def grouping_sets_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS with grouping_id -- the general form cube/
    rollup specialize; Spark expands to a single Expand+HashAggregate."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("sg_orders")
    return spark.sql(
        f"""
        SELECT o_orderstatus, o_orderpriority,
               grouping_id(o_orderstatus, o_orderpriority) AS gid,
               COUNT(*) AS n,
               {dsum_sql('o_totalprice')} AS revenue
        FROM sg_orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


@query(
    "join_full_outer",
    oracle=f"""
    SELECT coalesce(c.c_custkey, o.o_custkey) AS custkey,
           COUNT(o.o_orderkey) AS n_big_orders,
           {dsum_sql('coalesce(o.o_totalprice, 0.0)')} AS big_total
    FROM (SELECT * FROM customer WHERE c_acctbal > 0) c
    FULL OUTER JOIN (SELECT * FROM orders WHERE o_totalprice > 450000) o
      ON c.c_custkey = o.o_custkey
    GROUP BY 1
    """,
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join: keeps customers without big orders AND big orders
    whose customer fails the filter."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 0)
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 450000)
    return (
        c.join(o, c.c_custkey == o.o_custkey, "full_outer")
        .groupBy(F.coalesce("c_custkey", "o_custkey").alias("custkey"))
        .agg(
            F.count("o_orderkey").alias("n_big_orders"),
            dsum(F.coalesce(F.col("o_totalprice"), F.lit(0.0))).alias("big_total"),
        )
    )


@query(
    "join_cross_regions",
    oracle="""
    SELECT a.r_name AS from_region, b.r_name AS to_region
    FROM region a CROSS JOIN region b
    WHERE a.r_name <> b.r_name
    """,
)
def join_cross_regions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit cross join (route matrix) -- fine for tiny dims, and the
    plan shows a BroadcastNestedLoopJoin, never a shuffle."""
    a = load_table(spark, sf_dir, "region").select(F.col("r_name").alias("from_region"))
    b = load_table(spark, sf_dir, "region").select(F.col("r_name").alias("to_region"))
    return a.crossJoin(b).filter(F.col("from_region") != F.col("to_region"))


@query(
    "setops_all_variants",
    oracle="""
    SELECT nk, 'union_all' AS tag FROM
      (SELECT c_nationkey AS nk FROM customer UNION ALL SELECT s_nationkey FROM supplier)
    UNION ALL
    SELECT nk, 'intersect_all' AS tag FROM
      (SELECT c_nationkey AS nk FROM customer INTERSECT ALL SELECT s_nationkey FROM supplier)
    UNION ALL
    SELECT nk, 'except_all' AS tag FROM
      (SELECT c_nationkey AS nk FROM customer EXCEPT ALL SELECT s_nationkey FROM supplier)
    """,
)
def setops_all_variants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset (ALL) set operations -- multiplicity-preserving forms."""
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nk"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk"))
    u = c.unionAll(s).withColumn("tag", F.lit("union_all"))
    i = c.intersectAll(s).withColumn("tag", F.lit("intersect_all"))
    e = c.exceptAll(s).withColumn("tag", F.lit("except_all"))
    return u.unionAll(i).unionAll(e)


@query(
    "array_map_fns",
    oracle="""
    SELECT p_brand,
           array_to_string(list(DISTINCT p_type ORDER BY p_type), '|') AS types,
           len(list(DISTINCT p_type ORDER BY p_type)) AS n_types,
           list(DISTINCT p_type ORDER BY p_type)[1] AS first_type,
           list_contains(list(DISTINCT p_type ORDER BY p_type), 'PROMO') AS has_promo
    FROM part
    GROUP BY p_brand
    """,
)
def array_map_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array construction + inspection: collect_set -> array_sort (the
    deterministic spelling of list aggregation), size/element_at/contains.

    The array itself is surfaced as a '|'-joined string: raw ARRAY columns
    are not canonicalizable by the driver's pandas comparator (unhashable
    list -- the round-1 err), and the rule that maps never surface raw in
    output applies equally to arrays."""
    p = load_table(spark, sf_dir, "part")
    types = F.array_sort(F.collect_set("p_type"))
    return p.groupBy("p_brand").agg(
        F.array_join(types, "|").alias("types"),
        F.size(types).alias("n_types"),
        F.element_at(types, 1).alias("first_type"),
        F.array_contains(types, "PROMO").alias("has_promo"),
    )


@query(
    "pivot_year_status",
    oracle=f"""
    SELECT year(o_orderdate) AS yr,
           CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS F,
           CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS O,
           CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS BIGINT) AS P
    FROM orders
    GROUP BY 1
    """,
)
def pivot_year_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long->wide): order counts per year x status.  Explicit value
    list so the plan is a single pass (no distinct-values pre-query)."""
    o = load_table(spark, sf_dir, "orders")
    # na.fill: Spark's pivot emits NULL for an empty (year, status) cell
    # where the oracle's COUNT(*) FILTER emits 0 -- fill so a sparse year
    # cannot hash-mismatch.
    return (
        o.groupBy(F.year("o_orderdate").alias("yr"))
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
        .na.fill(0, ["F", "O", "P"])
    )


@query(
    "percentiles_price",
    oracle="""
    SELECT o_orderstatus,
           round(quantile_cont(o_totalprice, 0.25), 4) AS p25,
           round(quantile_cont(o_totalprice, 0.50), 4) AS p50,
           round(quantile_cont(o_totalprice, 0.75), 4) AS p75,
           round(quantile_cont(o_totalprice, 0.95), 4) AS p95
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def percentiles_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (Spark percentile == DuckDB
    quantile_cont, both linear interpolation on the sorted set)."""
    o = load_table(spark, sf_dir, "orders")
    # one percentile agg with an array of quantiles: a single sorted-value
    # buffer per group instead of four (the exact Percentile aggregate
    # materializes the whole group's values per expression)
    qs = o.groupBy("o_orderstatus").agg(
        F.expr("percentile(o_totalprice, array(0.25, 0.50, 0.75, 0.95))").alias("qa")
    )
    return qs.select(
        "o_orderstatus",
        *[
            F.round(F.col("qa")[i], 4).alias(name)
            for i, name in enumerate(["p25", "p50", "p75", "p95"])
        ],
    )


@query(
    "sample_hash_bernoulli",
    oracle=f"""
    SELECT COUNT(*) AS n, {dsum_sql('l_extendedprice')} AS sampled_revenue
    FROM lineitem
    WHERE substring(md5(CAST(l_orderkey * 10 + l_linenumber AS VARCHAR)), 1, 1) IN ('0', '1')
    """,
)
def sample_hash_bernoulli(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~12.5% Bernoulli sample via content hashing -- the
    reproducible alternative to rand()-based sampling (identical sample on
    every engine and every run, which rand() cannot give across engines)."""
    li = load_table(spark, sf_dir, "lineitem")
    key = (F.col("l_orderkey") * 10 + F.col("l_linenumber")).cast("string")
    return li.filter(F.substring(F.md5(key), 1, 1).isin("0", "1")).agg(
        F.count("*").alias("n"), dsum("l_extendedprice").alias("sampled_revenue")
    )


@query(
    "regex_fns",
    oracle="""
    SELECT p_partkey,
           regexp_extract(p_type, '^([A-Z]+)', 1) AS type_word,
           regexp_replace(p_name, '[aeiouAEIOU]', '_', 'g') AS name_devoweled,
           regexp_matches(p_type, '^(SMALL|LARGE)') AS is_sized,
           len(regexp_extract_all(lower(p_name), '[a-z]+')) AS word_count
    FROM part
    WHERE regexp_matches(p_type, 'O')
    """,
)
def regex_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex surface: extract (group 1), replace-all, rlike predicate,
    extract_all count -- patterns chosen inside the Java/RE2 common set."""
    p = load_table(spark, sf_dir, "part")
    return p.filter(F.col("p_type").rlike("O")).select(
        "p_partkey",
        F.regexp_extract("p_type", r"^([A-Z]+)", 1).alias("type_word"),
        F.regexp_replace("p_name", "[aeiouAEIOU]", "_").alias("name_devoweled"),
        F.col("p_type").rlike("^(SMALL|LARGE)").alias("is_sized"),
        F.size(F.regexp_extract_all(F.lower(F.col("p_name")), F.lit("[a-z]+"), F.lit(0))).alias(
            "word_count"
        ),
    )


@query(
    "nullsafe_eq",
    oracle="""
    SELECT
      CAST(json_extract_string(props, '$.k') AS BIGINT) IS NOT DISTINCT FROM 7 AS k_is_7,
      CAST(json_extract_string(props, '$.missing') AS BIGINT)
        IS NOT DISTINCT FROM NULL AS missing_is_null,
      COUNT(*) AS n
    FROM events
    GROUP BY 1, 2
    """,
)
def nullsafe_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality (<=> / IS NOT DISTINCT FROM) over JSON-extracted
    nullable values."""
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    missing = F.get_json_object("props", "$.missing").cast("bigint")
    return (
        e.select(
            k.eqNullSafe(F.lit(7)).alias("k_is_7"),
            missing.eqNullSafe(F.lit(None).cast("bigint")).alias("missing_is_null"),
        )
        .groupBy("k_is_7", "missing_is_null")
        .agg(F.count("*").alias("n"))
    )


_BUILDING_CASE = "CASE WHEN c_mktsegment = 'BUILDING' THEN c_acctbal ELSE 0.0 END"


@query(
    "cond_agg_fns",
    oracle=f"""
    SELECT n_name AS nation,
           CAST(COUNT(*) FILTER (WHERE c_acctbal < 0) AS BIGINT) AS n_negative,
           bool_or(c_acctbal > 9000) AS any_rich,
           bool_and(c_acctbal > -1000) AS all_above_floor,
           {dsum_sql(_BUILDING_CASE)} AS building_bal
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY 1
    """,
)
def cond_agg_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregation: count_if, bool_or/bool_and, CASE-gated sum."""
    c = load_table(spark, sf_dir, "customer")
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    return (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count_if(F.col("c_acctbal") < 0).alias("n_negative"),
            F.bool_or(F.col("c_acctbal") > 9000).alias("any_rich"),
            F.bool_and(F.col("c_acctbal") > -1000).alias("all_above_floor"),
            dsum(
                F.when(F.col("c_mktsegment") == "BUILDING", F.col("c_acctbal")).otherwise(0.0)
            ).alias("building_bal"),
        )
    )


@query(
    "stats_moments",
    oracle=f"""
    WITH s AS (
      SELECT event_type,
             COUNT(*) AS n,
             SUM(CAST(value AS DECIMAL(18,6))) AS sxd,
             SUM(CAST(value * value AS DECIMAL(28,12))) AS sxxd
      FROM events GROUP BY event_type)
    SELECT event_type, CAST(n AS BIGINT) AS n,
           {hu_ratio_signed_sql(
               "CAST(n AS HUGEINT) * CAST(sxxd * 1000000000000 AS HUGEINT)"
               " - CAST(sxd * 1000000 AS HUGEINT)"
               " * CAST(sxd * 1000000 AS HUGEINT)",
               "CAST(n AS HUGEINT) * n * 1000000000000", 6)} AS var_pop,
           round(sqrt(CAST(sxxd AS DOUBLE) / n
                      - (CAST(sxd AS DOUBLE) / n) * (CAST(sxd AS DOUBLE) / n)),
                 6) AS stddev_pop
    FROM s
    """,
)
def stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population variance/stddev from exact decimal moment sums.

    Built-in var_pop/stddev_pop stream Welford-style updates whose float
    error depends on partition order -- unusable against a cross-engine
    oracle.  Computing from exact decimal SUM(x)/SUM(x^2) is
    order-independent and, as a bonus, a single-pass partial-aggregable
    plan (x*x is one double multiply, identical in both engines)."""
    e = load_table(spark, sf_dir, "events")
    s = e.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(F.col("value").cast("decimal(18,6)")).alias("sxd"),
        F.sum((F.col("value") * F.col("value")).cast("decimal(28,12)")).alias(
            "sxxd"
        ),
    )
    # var_pop = (n*sxx_i - sx_i^2)/(n^2*10^12) is the exact rational
    # over the 10^12/10^6-scaled decimal sums: signed half-up recipe;
    # stddev keeps round(sqrt(identical double), 6) — sqrt outputs are
    # never decimal halves (CLAUDE.md rule)
    mean = F.col("sxd").cast("double") / F.col("n")
    var = F.col("sxxd").cast("double") / F.col("n") - mean * mean
    return s.select(
        "event_type",
        F.col("n").cast("bigint").alias("n"),
        hu_ratio_signed(
            "cast(n as decimal(38,0))"
            " * cast(sxxd * 1000000000000 as decimal(38,0))"
            " - cast(sxd * 1000000 as decimal(38,0))"
            " * cast(sxd * 1000000 as decimal(38,0))",
            "cast(n as decimal(38,0)) * n * 1000000000000",
            6,
        ).alias("var_pop"),
        F.round(F.sqrt(var), 6).alias("stddev_pop"),
    )


def twopass_var(e: DataFrame) -> DataFrame:
    """Production body of stats_var_twopass over any
    (event_type, value) frame — factored so the overflow-boundary test
    drives the EXACT production derivation on a synthetic frame whose
    single-pass form wraps decimal(38,0)."""
    x = e.select(
        "event_type",
        F.expr(
            "cast(cast(value as decimal(18,6)) * 1000000 as decimal(38,0))"
        ).alias("x6"),
    )
    centers = (
        x.groupBy("event_type")
        .agg(F.count("*").alias("n"), F.sum("x6").alias("sx6"))
        # Spark decimal `div` truncates toward zero — matches the
        # oracle's sign-split HUGEINT floor spelling
        .select("event_type", "n", F.expr("sx6 div n").alias("m6"))
    )
    p2 = (
        x.join(F.broadcast(centers), "event_type")
        .groupBy("event_type", "n", "m6")
        .agg(
            F.sum(F.expr("x6 - m6")).alias("sd6"),
            F.sum(F.expr("(x6 - m6) * (x6 - m6)")).alias("sdd12"),
        )
    )
    return p2.select(
        "event_type",
        F.col("n").cast("bigint").alias("n"),
        (F.col("m6").cast("double") / 1000000).alias("center"),
        hu_ratio_signed(
            "cast(n as decimal(38,0)) * sdd12 - sd6 * sd6",
            "cast(n as decimal(38,0)) * n * 1000000000000",
            6,
        ).alias("var_pop"),
    )


@query(
    "stats_var_twopass",
    oracle=f"""
    WITH x AS (
      SELECT event_type,
             CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS HUGEINT) AS x6
      FROM events),
    c AS (
      SELECT event_type, COUNT(*) AS n, SUM(x6) AS sx6
      FROM x GROUP BY 1),
    m AS (  -- truncate-toward-zero center (Spark decimal `div`
            -- truncates; HUGEINT // floors, so split the sign)
      SELECT event_type, n,
             CASE WHEN sx6 < 0 THEN -(abs(sx6) // CAST(n AS HUGEINT))
                  ELSE sx6 // CAST(n AS HUGEINT) END AS m6
      FROM c),
    p2 AS (
      SELECT x.event_type, m.n, m.m6,
             SUM(x.x6 - m.m6) AS sd6,
             SUM((x.x6 - m.m6) * (x.x6 - m.m6)) AS sdd12
      FROM x JOIN m ON x.event_type = m.event_type
      GROUP BY 1, 2, 3)
    SELECT event_type, CAST(n AS BIGINT) AS n,
           CAST(m6 AS DOUBLE) / 1000000 AS center,
           {hu_ratio_signed_sql(
               "CAST(n AS HUGEINT) * sdd12 - sd6 * sd6",
               "CAST(n AS HUGEINT) * n * 1000000000000", 6)} AS var_pop
    FROM p2
    """,
)
def stats_var_twopass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-pass (center-then-square) population variance — the
    PRODUCTION overflow fallback for the squared-sum rational family
    (stats_moments, chi-square, Brier) whose single-pass
    ``n*sxx - sx^2`` form carries ~1e8–1e10-row int128 headroom when
    values sit far from zero.

    Pass 1 computes the per-group integer-quantized center
    ``m6 = trunc(sum(x6)/n)`` at 10^6 scale; pass 2 re-scans, centers
    every value on m6, and sums the SMALL deviations d = x6 - m6 and
    d^2 exactly.  Shift invariance makes the result ALGEBRAICALLY
    IDENTICAL to the single-pass rational —
    ``n*sum(d^2) - sum(d)^2 == n*sum(x^2) - sum(x)^2`` for any integer
    shift — so var_pop here hash-matches stats_moments' while the
    int128 requirement drops from n^2*mean^2*10^12 to
    n^2*spread^2*10^12: for a value column with mean ~1e9 and spread
    ~1e3 that is 1e12x more headroom (the boundary where the
    single-pass form wraps at ~500 rows is pinned by
    tests/test_properties.py::test_twopass_variance_survives_singlepass_overflow).
    Cost: one extra scan + a broadcast join of the tiny center dim —
    the classic accuracy/throughput trade at 100 TB, chosen here as
    the documented fallback rather than the default because the
    events/lineitem value domains sit near zero.
    """
    return twopass_var(load_table(spark, sf_dir, "events"))


@query(
    "date_arithmetic",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderdate + INTERVAL 30 DAY AS TIMESTAMP) AS due_date,
           date_diff('day', o_orderdate, TIMESTAMP '2000-01-01') AS days_to_y2k,
           CAST(last_day(o_orderdate) AS VARCHAR) AS month_end,
           dayofweek(o_orderdate) + 1 AS dow,  -- DuckDB: 0=Sunday; Spark: 1=Sunday
           weekofyear(o_orderdate) AS woy
    FROM orders
    WHERE o_orderkey % 100 = 0
    """,
)
def date_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date arithmetic surface: interval add, datediff, last_day,
    day-of-week, ISO week-of-year."""
    o = load_table(spark, sf_dir, "orders")
    return o.filter(F.col("o_orderkey") % 100 == 0).select(
        "o_orderkey",
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("due_date"),
        F.datediff(F.lit("2000-01-01").cast("timestamp"), F.col("o_orderdate")).cast("bigint")
        .alias("days_to_y2k"),
        F.last_day("o_orderdate").cast("string").alias("month_end"),
        F.dayofweek("o_orderdate").alias("dow"),
        F.weekofyear("o_orderdate").alias("woy"),
    )


@query(
    "merge_upsert_snapshot",
    oracle=f"""
    WITH changes AS (
      SELECT o_custkey AS custkey, COUNT(*) AS new_orders,
             {dsum_sql('o_totalprice')} AS spend
      FROM orders WHERE o_orderstatus = 'O' GROUP BY 1)
    SELECT coalesce(c.c_custkey, ch.custkey) AS c_custkey,
           coalesce(c.c_name, 'NEW#' || CAST(ch.custkey AS VARCHAR)) AS c_name,
           CASE WHEN ch.custkey IS NULL THEN 'unchanged'
                WHEN c.c_custkey IS NULL THEN 'inserted'
                ELSE 'updated' END AS merge_action,
           coalesce(ch.new_orders, 0) AS new_orders,
           coalesce(ch.spend, 0.0) AS spend
    FROM customer c FULL OUTER JOIN changes ch ON c.c_custkey = ch.custkey
    """,
)
def merge_upsert_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE / upsert pattern without a table format: target FULL OUTER
    JOIN changes, per-row action (update / insert / unchanged) decided by
    match side.  This is what Delta/Iceberg MERGE INTO lowers to; on plain
    parquet the merged snapshot is rewritten partition-wise (at 100 TB:
    partition the target by key range and rewrite only partitions with
    changes -- the join prunes the rest)."""
    c = load_table(spark, sf_dir, "customer")
    changes = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "O")
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(F.count("*").alias("new_orders"), dsum("o_totalprice").alias("spend"))
    )
    merged = c.join(changes, c.c_custkey == changes.custkey, "full_outer")
    action = (
        F.when(F.col("custkey").isNull(), "unchanged")
        .when(F.col("c_custkey").isNull(), "inserted")
        .otherwise("updated")
    )
    return merged.select(
        F.coalesce("c_custkey", "custkey").alias("c_custkey"),
        F.coalesce(F.col("c_name"), F.concat(F.lit("NEW#"), F.col("custkey").cast("string")))
        .alias("c_name"),
        action.alias("merge_action"),
        F.coalesce("new_orders", F.lit(0)).alias("new_orders"),
        F.coalesce("spend", F.lit(0.0)).alias("spend"),
    )


@query(
    "map_fns",
    oracle="""
    WITH sub AS (
      SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
      FROM orders GROUP BY 1, 2),
    m AS (
      SELECT o_orderstatus,
             map(list(o_orderpriority ORDER BY o_orderpriority),
                 list(n ORDER BY o_orderpriority)) AS pm
      FROM sub GROUP BY o_orderstatus)
    SELECT o_orderstatus,
           CAST(cardinality(pm) AS INT) AS n_keys,
           map_keys(pm)[1] AS first_key,
           CAST(pm['1-URGENT'][1] AS BIGINT) AS urgent_n,
           CAST(list_sum(map_values(pm)) AS BIGINT) AS total_n
    FROM m
    """,
)
def map_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-typed column surface: build a priority->count map per status
    (entries sorted for determinism), then keys/lookup/cardinality/values.
    Maps never surface raw in the output -- engines render them
    differently -- only scalar projections of them do."""
    o = load_table(spark, sf_dir, "orders")
    sub = o.groupBy("o_orderstatus", "o_orderpriority").agg(F.count("*").alias("n"))
    m = sub.groupBy("o_orderstatus").agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("o_orderpriority", "n")))
        ).alias("pm")
    )
    return m.select(
        "o_orderstatus",
        F.size("pm").alias("n_keys"),
        F.element_at(F.map_keys("pm"), 1).alias("first_key"),
        F.element_at("pm", "1-URGENT").cast("bigint").alias("urgent_n"),
        F.aggregate(F.map_values("pm"), F.lit(0).cast("bigint"), lambda a, x: a + x)
        .alias("total_n"),
    )
