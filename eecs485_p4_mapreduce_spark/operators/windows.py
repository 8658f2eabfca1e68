"""Window functions, grouping sets, and batch twins of streaming windows
(SURVEY.md §2.C "Window functions", "Grouping sets", "Streaming").

The batch tumbling/sliding/session queries here are the DuckDB-checkable
twins of the Structured Streaming operators in
:mod:`eecs485_p4_mapreduce_spark.streaming` -- same grouping semantics,
same column names, so the streaming path can be validated against them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from eecs485_p4_mapreduce_spark.functions.numeric import dsum, dsum_sql
from eecs485_p4_mapreduce_spark.plans.registry import query
from eecs485_p4_mapreduce_spark.sources import load_table


@query(
    "window_rank_orders",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rk, drk
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER w AS rk,
             DENSE_RANK() OVER w AS drk
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    ) WHERE rk <= 3
    """,
)
def window_rank_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer via row_number/dense_rank -- the
    partitioned top-k idiom (one shuffle on the partition key; each
    partition sorts locally, no global sort)."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rk"),
            F.dense_rank().over(w).alias("drk"),
        )
        .filter(F.col("rk") <= 3)
    )


@query(
    "window_lag_events",
    oracle="""
    SELECT event_id, user_id, ts, value,
           lag(value) OVER w AS prev_value,
           lead(value) OVER w AS next_value,
           value - lag(value) OVER w AS delta
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    """,
)
def window_lag_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead over each user's event timeline (ts is unique per user)."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts")
    return e.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        (F.col("value") - F.lag("value").over(w)).alias("delta"),
    )


@query(
    "window_running_sum",
    oracle="""
    SELECT event_id, user_id, ts,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER
                (PARTITION BY user_id ORDER BY ts
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS running_value,
           ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts) AS seq
    FROM events
    """,
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative sum per user (decimal-exact, see functions/numeric.py)."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts").rowsBetween(Window.unboundedPreceding, 0)
    ws = Window.partitionBy("user_id").orderBy("ts")
    return e.select(
        "event_id",
        "user_id",
        "ts",
        F.sum(F.col("value").cast("decimal(18,6)")).over(w).cast("double").alias("running_value"),
        F.row_number().over(ws).alias("seq"),
    )


@query(
    "rollup_orders",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
           {dsum_sql('o_totalprice')} AS revenue
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def rollup_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals (status -> status+priority -> grand total)."""
    o = load_table(spark, sf_dir, "orders")
    return o.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n"), dsum("o_totalprice").alias("revenue")
    )


@query(
    "cube_orders",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
           {dsum_sql('o_totalprice')} AS revenue
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def cube_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (status, priority): all 4 grouping sets in one pass --
    Spark expands then hash-aggregates; partial agg keeps the shuffle
    proportional to group cardinality, not input rows."""
    o = load_table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n"), dsum("o_totalprice").alias("revenue")
    )


@query(
    "tumbling_window_1h",
    oracle=f"""
    SELECT date_trunc('hour', ts) AS window_start, event_type,
           COUNT(*) AS n, {dsum_sql('value')} AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def tumbling_window_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the streaming 1h tumbling window
    (streaming/windows.py): F.window == date_trunc for tumbling."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), dsum("value").alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


@query(
    "sliding_window_1h_30m",
    oracle=f"""
    SELECT window_start, COUNT(*) AS n, {dsum_sql('value')} AS total_value
    FROM (
      SELECT unnest([
               date_trunc('hour', ts) + CASE WHEN minute(ts) >= 30
                    THEN INTERVAL 30 MINUTE ELSE INTERVAL 0 MINUTE END,
               date_trunc('hour', ts) + CASE WHEN minute(ts) >= 30
                    THEN INTERVAL 30 MINUTE ELSE INTERVAL 0 MINUTE END
                 - INTERVAL 30 MINUTE
             ]) AS window_start,
             value
      FROM events)
    GROUP BY 1
    """,
)
def sliding_window_1h_30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window (1h length, 30m slide): each event lands in exactly
    two windows. Spark's F.window explodes assignments the same way the
    oracle's unnest does."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count("*").alias("n"), dsum("value").alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "n", "total_value")
    )


@query(
    "session_window_30m",
    oracle=f"""
    WITH flagged AS (
      SELECT user_id, ts, value,
             CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                       OVER (PARTITION BY user_id ORDER BY ts) > 1800000000
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events),
    sessions AS (
      SELECT user_id, ts, value,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM flagged)
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           MIN(ts) AS session_start, MAX(ts) AS session_end,
           COUNT(*) AS n_events, {dsum_sql('value')} AS total_value
    FROM sessions
    GROUP BY 1, 2
    """,
)
def session_window_30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30m inactivity gap) via lag + cumulative
    flag sum -- one shuffle on user_id; the batch twin of
    ``F.session_window`` in the streaming module."""
    e = load_table(spark, sf_dir, "events")
    wo = Window.partitionBy("user_id").orderBy("ts")
    wrun = wo.rowsBetween(Window.unboundedPreceding, 0)
    gap = F.unix_micros(F.col("ts")) - F.lag(F.unix_micros(F.col("ts"))).over(wo)
    flagged = e.select(
        "user_id",
        "ts",
        "value",
        F.when(gap.isNull() | (gap > 30 * 60 * 1_000_000), 1).otherwise(0).alias("new_session"),
    )
    sess = flagged.withColumn(
        "session_id", F.sum("new_session").over(wrun).cast("bigint")
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count("*").alias("n_events"),
        dsum("value").alias("total_value"),
    )


@query(
    "window_ntile_pctrank",
    oracle="""
    SELECT o_orderkey, o_orderstatus,
           ntile(4) OVER w AS quartile,
           percent_rank() OVER w AS pct_rank,
           cume_dist() OVER w AS cume
    FROM orders
    WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
    """,
)
def window_ntile_pctrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions: ntile / percent_rank / cume_dist
    (orderkey tie-break makes the frames deterministic)."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_orderstatus",
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )


@query(
    "window_range_frame",
    oracle="""
    SELECT event_id, user_id, ts,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER
                (PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS trailing_1h_value,
           COUNT(*) OVER
                (PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
             AS trailing_1h_events
    FROM events
    """,
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE window frame: trailing-1-hour sum/count per user -- a value
    frame over event time, not a row count (Spark expresses the interval
    as a rangeBetween over epoch microseconds)."""
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts")))
        .rangeBetween(-3_600_000_000, 0)
    )
    return e.select(
        "event_id",
        "user_id",
        "ts",
        F.sum(F.col("value").cast("decimal(18,6)")).over(w).cast("double")
        .alias("trailing_1h_value"),
        F.count("*").over(w).alias("trailing_1h_events"),
    )


@query(
    "window_value_fns",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice,
           first_value(o_totalprice) OVER w AS first_price,
           last_value(o_totalprice) OVER w AS last_price,
           nth_value(o_totalprice, 2) OVER w AS second_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def window_value_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value/last_value/nth_value over an explicit full-partition
    frame.  The frame is spelled out because the SQL default
    (RANGE ... CURRENT ROW) makes last_value a running value -- the
    classic silent-wrong-answer; the deterministic ORDER BY tie-break
    (price, then key) keeps nth_value engine-stable."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_totalprice", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.first("o_totalprice").over(w).alias("first_price"),
        F.last("o_totalprice").over(w).alias("last_price"),
        F.nth_value("o_totalprice", 2).over(w).alias("second_price"),
    )


@query(
    "rollup_multires_events",
    oracle=f"""
    WITH base AS (
      SELECT date_trunc('hour', ts) AS hour_ts, date_trunc('day', ts) AS day_ts,
             event_type, value
      FROM events)
    SELECT CASE WHEN GROUPING(hour_ts) = 0 THEN 'hour' ELSE 'day' END AS resolution,
           COALESCE(hour_ts, day_ts) AS window_start,
           event_type, COUNT(*) AS n, {dsum_sql('value')} AS total_value
    FROM base
    GROUP BY GROUPING SETS ((hour_ts, event_type), (day_ts, event_type))
    """,
)
def rollup_multires_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-resolution time rollup (the hypertable continuous-aggregate
    shape): hourly AND daily aggregates of the event stream in ONE pass
    via GROUPING SETS — Spark's Expand emits each row once per
    resolution, then a single hash aggregate builds both rollups, so
    the fact table is scanned once instead of once per resolution.

    At 100 TB the alternative (N scans for N resolutions) loses by
    exactly N; the Expand costs one extra in-memory row copy per
    resolution and keeps partial aggregation map-side."""
    e = load_table(spark, sf_dir, "events")
    e.createOrReplaceTempView("events_mr")
    return spark.sql(
        f"""
        WITH base AS (
          SELECT date_trunc('hour', ts) AS hour_ts, date_trunc('day', ts) AS day_ts,
                 event_type, value
          FROM events_mr)
        SELECT CASE WHEN GROUPING(hour_ts) = 0 THEN 'hour' ELSE 'day' END AS resolution,
               COALESCE(hour_ts, day_ts) AS window_start,
               event_type, COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
        FROM base
        GROUP BY GROUPING SETS ((hour_ts, event_type), (day_ts, event_type))
        """
    )


@query(
    "window_ratio_to_report",
    oracle=f"""
    WITH nat AS (
      SELECT n.n_regionkey, n.n_name,
             {dsum_sql('o.o_totalprice')} AS nat_rev
      FROM customer c
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY n.n_regionkey, n.n_name)
    SELECT n_name, nat_rev,
           round(nat_rev / SUM(CAST(nat_rev AS DECIMAL(18,6)))
                 OVER (PARTITION BY n_regionkey), 6) AS region_share
    FROM nat
    """,
)
def window_ratio_to_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-to-report: each nation's share of its REGION's revenue — an
    aggregate windowed over the aggregate (the report-builder staple).
    The window runs over the 25-row nation rollup, not the fact table;
    the denominator re-sums the per-nation doubles in decimal so the
    share is order-independent."""
    c = load_table(spark, sf_dir, "customer")
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    o = load_table(spark, sf_dir, "orders")
    nat = (
        c.join(n, n.n_nationkey == c.c_nationkey)
        .join(o, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("n_regionkey", "n_name")
        .agg(dsum("o_totalprice").alias("nat_rev"))
    )
    w = Window.partitionBy("n_regionkey")
    return nat.select(
        "n_name",
        "nat_rev",
        F.round(
            F.col("nat_rev")
            / F.sum(F.col("nat_rev").cast("decimal(18,6)")).over(w),
            6,
        ).alias("region_share"),
    )


@query(
    "window_gaps_islands",
    oracle="""
    WITH rn AS (
      SELECT user_id, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id)
             - ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                  ORDER BY ts, event_id) AS grp
      FROM events),
    runs AS (
      SELECT user_id, event_type, grp, COUNT(*) AS run_len
      FROM rn GROUP BY user_id, event_type, grp)
    SELECT event_type, CAST(run_len AS BIGINT) AS run_len,
           CAST(COUNT(*) AS BIGINT) AS n_runs
    FROM runs GROUP BY event_type, run_len
    """,
)
def window_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: maximal runs of consecutive same-type events
    per user via the classic double-row_number difference (constant
    within a run, jumps at every break), rolled up to a run-length
    distribution per event type.  Both row_numbers and the run
    aggregation share the user_id partitioning — one shuffle of the
    event stream, and the output is bounded by (types x max run)."""
    e = load_table(spark, sf_dir, "events")
    w1 = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w2 = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    rn = e.select(
        "user_id",
        "event_type",
        (F.row_number().over(w1) - F.row_number().over(w2)).alias("grp"),
    )
    runs = rn.groupBy("user_id", "event_type", "grp").agg(
        F.count("*").alias("run_len")
    )
    return runs.groupBy(
        "event_type", F.col("run_len").cast("bigint").alias("run_len")
    ).agg(F.count("*").cast("bigint").alias("n_runs"))


@query(
    "window_topk_with_ties",
    oracle="""
    SELECT o_orderpriority, o_orderkey, o_totalprice, rk FROM (
      SELECT o_orderpriority, o_orderkey, o_totalprice,
             RANK() OVER (PARTITION BY o_orderpriority
                          ORDER BY floor(o_totalprice / 10000.0) DESC) AS rk
      FROM orders)
    WHERE rk <= 3
    """,
)
def window_topk_with_ties(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k WITH TIES (rank(), not row_number()): every order in the
    top-3 price BANDS per priority survives, however many tie — the
    'WITH TIES' fetch semantics.  Banding the sort key (floor to $10k)
    makes ties real and the result deterministic without an id
    tie-break, because rank() admits ALL peers — the semantic difference
    this query exists to pin against the row_number top-k variants."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc(F.floor(F.col("o_totalprice") / 10000.0))
    )
    return (
        o.withColumn("rk", F.rank().over(w))
        .filter(F.col("rk") <= 3)
        .select("o_orderpriority", "o_orderkey", "o_totalprice", "rk")
    )


@query(
    "window_since_last_event",
    oracle="""
    WITH rn AS (
      SELECT user_id, ts, event_id, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events),
    marked AS (
      SELECT user_id, event_type, rn,
             MAX(CASE WHEN event_type = 'purchase' THEN rn END)
               OVER (PARTITION BY user_id ORDER BY rn
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS last_purchase_rn
      FROM rn)
    SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CASE WHEN last_purchase_rn IS NULL
                         THEN rn ELSE rn - last_purchase_rn END) AS BIGINT)
             AS total_gap,
           CAST(MAX(CASE WHEN last_purchase_rn IS NULL
                         THEN rn ELSE rn - last_purchase_rn END) AS BIGINT)
             AS max_gap
    FROM marked GROUP BY user_id
    """,
)
def window_since_last_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """'Events since last purchase' — a running counter with conditional
    RESET, the recency feature a churn/propensity model consumes.  The
    reset is a conditional-MAX window (position of the latest prior
    purchase) subtracted from the running position; both windows share
    the user_id ordering, so the stream shuffles once.  Rolled up to
    per-user totals so the output stays small at any event volume."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    rn = e.select(
        "user_id", "event_type", F.row_number().over(w).alias("rn")
    )
    wprev = (
        Window.partitionBy("user_id")
        .orderBy("rn")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    marked = rn.withColumn(
        "last_purchase_rn",
        F.max(
            F.when(F.col("event_type") == "purchase", F.col("rn"))
        ).over(wprev),
    )
    gap = F.when(
        F.col("last_purchase_rn").isNull(), F.col("rn")
    ).otherwise(F.col("rn") - F.col("last_purchase_rn"))
    return marked.groupBy("user_id").agg(
        F.count("*").cast("bigint").alias("n_events"),
        F.sum(gap).cast("bigint").alias("total_gap"),
        F.max(gap).cast("bigint").alias("max_gap"),
    )


@query(
    "window_period_over_period",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(o_orderdate AS TIMESTAMP) AS day,
             {dsum_sql('o_totalprice')} AS revenue
      FROM orders GROUP BY o_orderdate)
    SELECT day, revenue,
           lag(revenue) OVER (ORDER BY day) AS prev_revenue,
           round((revenue - lag(revenue) OVER (ORDER BY day))
                 / lag(revenue) OVER (ORDER BY day), 6) AS pct_change
    FROM daily
    """,
)
def window_period_over_period(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Period-over-period change: daily revenue with lag-based percent
    delta — the dashboard staple.  The global-ordered lag runs over the
    DAILY AGGREGATE (bounded by the calendar, not the order volume), so
    the single-partition window is a non-issue at any scale; deltas
    divide decimal-exact daily sums and round once."""
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.col("o_orderdate").cast("timestamp").alias("day")
    ).agg(dsum("o_totalprice").alias("revenue"))
    w = Window.orderBy("day")
    prev = F.lag("revenue").over(w)
    return daily.select(
        "day",
        "revenue",
        prev.alias("prev_revenue"),
        F.round((F.col("revenue") - prev) / prev, 6).alias("pct_change"),
    )


@query(
    "tumbling_window_offset",
    oracle=f"""
    SELECT date_trunc('hour', ts - INTERVAL 15 MINUTE) + INTERVAL 15 MINUTE
             AS window_start,
           event_type, COUNT(*) AS n, {dsum_sql('value')} AS total_value
    FROM events GROUP BY 1, 2
    """,
)
def tumbling_window_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling windows with a NON-ZERO ORIGIN (F.window's startTime):
    hourly buckets aligned to :15 — the billing-period / business-day
    alignment plain date_trunc cannot express.  The oracle recovers the
    same alignment by truncating the shifted timestamp and shifting
    back, proving the startTime semantics."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.window("ts", "1 hour", "1 hour", "15 minutes").alias("w"), "event_type"
        )
        .agg(F.count("*").alias("n"), dsum("value").alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"), "event_type", "n", "total_value"
        )
    )


@query(
    "session_window_dynamic_gap",
    oracle="""
    WITH g AS (
      SELECT user_id, epoch_us(ts) AS us,
             CASE WHEN event_type = 'purchase' THEN 3600000000
                  ELSE 1800000000 END AS gap
      FROM events),
    r AS (
      SELECT user_id, us, gap,
             max(us + gap) OVER (PARTITION BY user_id ORDER BY us
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_reach
      FROM g),
    f AS (
      SELECT user_id, us, gap,
             CASE WHEN prev_reach IS NULL OR us >= prev_reach
                  THEN 1 ELSE 0 END AS new_s
      FROM r),
    s AS (
      SELECT user_id, us, gap,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY us
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM f)
    SELECT user_id, make_timestamp(min(us)) AS session_start,
           make_timestamp(max(us + gap)) AS session_end,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM s GROUP BY user_id, sid
    """,
)
def session_window_dynamic_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DYNAMIC-gap session windows (Spark 4 ``session_window`` with a
    per-event gap expression): purchases keep a session alive for 1 hour,
    everything else 30 minutes -- the per-event-weighted sessionization
    real funnels want (a checkout shouldn't time out as fast as a page
    view).

    Each event spans [ts, ts + gap(event)) and overlapping spans merge;
    the oracle spells that interval-union as gaps-and-islands with a
    RUNNING MAX of prior reach (plain lag is wrong here -- an earlier
    long-gap event can outreach a later short-gap one), which is also
    the proof the built-in's merge semantics are exactly interval union.
    One user_id shuffle on the Spark side, the same shape as the fixed
    -gap session query."""
    e = load_table(spark, sf_dir, "events")
    gap = (
        F.when(F.col("event_type") == "purchase", F.lit("1 hour"))
        .otherwise(F.lit("30 minutes"))
    )
    return (
        e.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").cast("bigint").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )
