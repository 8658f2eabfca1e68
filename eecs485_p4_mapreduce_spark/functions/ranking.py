"""Distributed global ranks / running sums without a one-task window.

``row_number() OVER (ORDER BY ...)`` with no PARTITION BY funnels the
whole input through a single task — the classic 100 TB dead end (Spark
itself logs "No Partition Defined for Window operation").  The scale-safe
plan, factored here from ``ids_contiguous_assign``
(operators/relational6.py), is:

1. ``repartitionByRange`` on the sort key — each partition holds a
   contiguous key range;
2. rank (and, optionally, running-sum) WITHIN each partition — an
   ordinary partitioned window, parallel across partitions;
3. aggregate one count/sum row per partition (P rows, P = partition
   count), prefix-sum that P-row frame, and broadcast the offsets back.

``global offset + local rank`` equals the global rank for ANY disjoint
ordered ranges, so the result is independent of where
repartitionByRange's *sampled* boundaries happen to fall.  The ranged
frame is localCheckpoint()ed because both branches (per-partition stats
and the numbering) must observe the same physical partitioning, and the
checkpoint stops projection collapse from replaying the exchange.

The only global window left is the P-row prefix sum — constant-size at
any data scale.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_PARTS = 32


def with_global_rank(
    df: DataFrame,
    order_cols: Sequence[Column | str],
    *,
    sum_col: str | None = None,
    partitions: int = _PARTS,
) -> DataFrame:
    """Return ``df`` + ``_rk`` (1-based global rank over ``order_cols``)
    and ``_n`` (total row count), computed with the range-partition /
    partition-offset recipe above.  With ``sum_col`` also adds ``_cum``
    (inclusive running sum of that column in rank order) and ``_tot``
    (its grand total) — exact for decimal inputs, since every addition
    is a decimal aggregate.

    ``order_cols`` may include ``F.col(...).desc()`` sort orders; they
    are applied identically to the range partitioner and the local
    window, which is what makes offset+local == global."""
    ranged = (
        df.repartitionByRange(partitions, *order_cols)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint()
    )
    aggs = [F.count("*").alias("_c")]
    if sum_col is not None:
        aggs.append(F.sum(sum_col).alias("_s"))
    per_part = ranged.groupBy("_pid").agg(*aggs)
    w_prev = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    w_all = Window.orderBy("_pid").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    off_cols = [
        F.col("_pid"),
        F.coalesce(F.sum("_c").over(w_prev), F.lit(0)).alias("_off"),
        F.sum("_c").over(w_all).alias("_n"),
    ]
    if sum_col is not None:
        off_cols += [
            F.coalesce(F.sum("_s").over(w_prev), F.lit(0)).alias("_soff"),
            F.sum("_s").over(w_all).alias("_tot"),
        ]
    offsets = per_part.select(*off_cols)

    w_local = Window.partitionBy("_pid").orderBy(*order_cols)
    out = ranged.withColumn("_local_rk", F.row_number().over(w_local))
    if sum_col is not None:
        out = out.withColumn(
            "_local_cum",
            F.sum(sum_col).over(
                w_local.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
    out = out.join(F.broadcast(offsets), "_pid")
    out = out.withColumn(
        "_rk", (F.col("_off") + F.col("_local_rk")).cast("bigint")
    )
    if sum_col is not None:
        out = out.withColumn("_cum", F.col("_soff") + F.col("_local_cum"))
    return out.drop("_pid", "_off", "_local_rk", "_soff", "_local_cum")


def ntile_from_rank(rk: str, n: str, tiles: int) -> Column:
    """SQL ``ntile(tiles)`` recomputed from a global rank: with
    q = n div t and r = n mod t, the first r tiles hold q+1 rows and the
    rest hold q — the exact ANSI tile-size rule, spelled in int64
    arithmetic only (``DIV``/``%``), so it is bitwise identical to both
    engines' ntile over the same ordering.  ``rk``/``n`` are column
    names (1-based rank, total count)."""
    t = int(tiles)
    return F.expr(
        f"CASE WHEN {rk} <= ({n} % {t}) * ({n} DIV {t} + 1)"
        f" THEN ({rk} - 1) DIV ({n} DIV {t} + 1) + 1"
        f" ELSE ({n} % {t}) + 1 +"
        f" ({rk} - ({n} % {t}) * ({n} DIV {t} + 1) - 1) DIV ({n} DIV {t})"
        " END"
    ).cast("int")
