"""Product-analytics shapes: ordered string aggregation, wide->long
unpivot, histogram binning, and event-sequence funnels.

These are the everyday OLAP queries the reference could only express as
custom reducers over pre-sorted partitions (SURVEY.md §2.B); here each is
a single declarative plan with map-side partial aggregation.

Cross-engine determinism: string aggregation is over a SORTED list (an
unordered listagg differs run-to-run in ANY distributed engine -- the
sort is not a test convenience, it is the only correct spec at scale);
histogram bin ids use floor() so double->int conversion rounds the same
way in both engines; funnel stage times are MIN(ts) per stage, an
order-insensitive reduction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from eecs485_p4_mapreduce_spark.functions.numeric import dsum, dsum_sql
from eecs485_p4_mapreduce_spark.plans.registry import query
from eecs485_p4_mapreduce_spark.sources import load_table


@query(
    "agg_string_concat",
    oracle="""
    SELECT r.r_name, string_agg(n.n_name, ',' ORDER BY n.n_name) AS nations
    FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
)
def agg_string_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered listagg: nation names per region, comma-joined in sorted
    order.  Spark spells it array_join(array_sort(collect_list())); the
    sort makes the result well-defined regardless of partition order --
    collect_list alone is nondeterministic on any shuffled input."""
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias(
                "nations"
            )
        )
    )


@query(
    "unpivot_lineitem_metrics",
    oracle=f"""
    WITH wide AS (
      SELECT l_returnflag,
             {dsum_sql('l_quantity')} AS sum_qty,
             {dsum_sql('l_extendedprice')} AS sum_price,
             {dsum_sql('l_discount')} AS sum_disc
      FROM lineitem GROUP BY l_returnflag)
    SELECT l_returnflag, metric, metric_value
    FROM wide
    UNPIVOT (metric_value FOR metric IN (sum_qty, sum_price, sum_disc))
    """,
)
def unpivot_lineitem_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide->long unpivot (melt): three per-flag aggregates become
    (flag, metric, value) rows.  The unpivot runs AFTER the aggregate, so
    it triples a handful of rows, not the 100 TB input; Spark lowers
    ``DataFrame.unpivot`` to an Expand node, the same operator grouping
    sets use."""
    li = load_table(spark, sf_dir, "lineitem")
    wide = li.groupBy("l_returnflag").agg(
        dsum("l_quantity").alias("sum_qty"),
        dsum("l_extendedprice").alias("sum_price"),
        dsum("l_discount").alias("sum_disc"),
    )
    return wide.unpivot(
        ["l_returnflag"],
        ["sum_qty", "sum_price", "sum_disc"],
        "metric",
        "metric_value",
    )


@query(
    "histogram_value_bins",
    oracle="""
    SELECT event_type, CAST(floor(value / 5.0) AS BIGINT) AS bin,
           COUNT(*) AS n
    FROM events
    GROUP BY 1, 2
    """,
)
def histogram_value_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram (bin width 5) of event values per type: a
    pure hash aggregate over (type, floor(value/width)) -- the
    full-distribution profile one runs before choosing quality-score
    thresholds.  floor() before the int cast because Spark truncates and
    DuckDB rounds on CAST(double AS INT)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(
            "event_type",
            F.floor(F.col("value") / 5.0).cast("bigint").alias("bin"),
        )
        .agg(F.count("*").alias("n"))
    )


@query(
    "funnel_view_click_purchase",
    oracle="""
    WITH stages AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
             MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
             MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
      FROM events GROUP BY user_id)
    SELECT user_id, t_view, t_click, t_purchase
    FROM stages
    WHERE t_view < t_click AND t_click < t_purchase
    """,
)
def funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-funnel conversion: users whose first view precedes their
    first click precedes their first purchase.  One conditional-MIN hash
    aggregate per user (map-side combinable, no window, no self-join --
    the three-way self-join formulation shuffles the event table three
    times for the same answer), then a filter on stage order."""
    e = load_table(spark, sf_dir, "events")

    def first_ts(stage: str):
        return F.min(F.when(F.col("event_type") == stage, F.col("ts"))).alias(
            f"t_{stage}"
        )

    stages = e.groupBy("user_id").agg(
        first_ts("view"), first_ts("click"), first_ts("purchase")
    )
    return stages.filter(
        (F.col("t_view") < F.col("t_click"))
        & (F.col("t_click") < F.col("t_purchase"))
    )


@query(
    "pattern_funnel_sessions",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, event_id, substring(event_type, 1, 1) AS c,
             CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                       OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800000000
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events),
    sessions AS (
      SELECT user_id, ts, event_id, c,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM flagged),
    seqs AS (
      SELECT user_id, session_id,
             array_to_string(list(c ORDER BY ts, event_id), '') AS seq,
             COUNT(*) AS n_ev
      FROM sessions GROUP BY user_id, session_id)
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_sessions,
           CAST(SUM(CASE WHEN regexp_matches(seq, 'v.*c.*p') THEN 1 ELSE 0 END)
                AS BIGINT) AS n_matched,
           CAST(SUM(n_ev) AS BIGINT) AS n_events
    FROM seqs GROUP BY user_id
    """,
)
def pattern_funnel_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Complex-event-processing pattern match (the MATCH_RECOGNIZE /
    Flink-CEP shape, lowered to windows + regex): sessionize each user's
    event stream on a 30-minute inactivity gap, render every session as
    its ordered event-initial string, and count sessions matching the
    ordered pattern view -> click -> purchase ('v.*c.*p').

    Unlike ``funnel_view_click_purchase`` (lifetime conditional-MIN),
    the pattern here must occur INSIDE one session, which needs the
    sequence string.  All three windows and the two aggregations share
    the user_id hash partitioning, so the event stream shuffles once;
    the regex runs on ~session-length strings, bounded by the session
    gap at any corpus size."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lag_ts = F.lag("ts").over(w)
    flagged = e.select(
        "user_id",
        "ts",
        "event_id",
        F.substring("event_type", 1, 1).alias("c"),
        F.when(
            (F.unix_micros("ts") - F.unix_micros(lag_ts) > 1800000000)
            | lag_ts.isNull(),
            1,
        )
        .otherwise(0)
        .alias("new_session"),
    )
    sessions = flagged.withColumn(
        "session_id",
        F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    seqs = sessions.groupBy("user_id", "session_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("ts", "event_id", "c"))),
                lambda x: x["c"],
            ),
            "",
        ).alias("seq"),
        F.count("*").alias("n_ev"),
    )
    return seqs.groupBy("user_id").agg(
        F.count("*").cast("bigint").alias("n_sessions"),
        F.sum(F.when(F.col("seq").rlike("v.*c.*p"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_matched"),
        F.sum("n_ev").cast("bigint").alias("n_events"),
    )
