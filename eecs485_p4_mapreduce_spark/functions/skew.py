"""Skew mitigation: salted aggregation and salted joins.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime; salting is the explicit fallback when one key dominates so hard
that even split partitions overwhelm an executor (the classic null-key /
power-law-user problem at 100 TB).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg_count(df: DataFrame, key: str, salt: int = 16) -> DataFrame:
    """Two-phase skew-proof count: groupBy((key, salt)) partial counts,
    then groupBy(key) final sum.  The hot key's rows spread over ``salt``
    reducers in phase 1; phase 2 only merges ``salt`` partial rows."""
    salted = df.withColumn("_salt", F.pmod(F.crc32(F.monotonically_increasing_id().cast("string")), F.lit(salt)))
    partial = salted.groupBy(key, "_salt").agg(F.count("*").alias("_c"))
    return partial.groupBy(key).agg(F.sum("_c").cast("bigint").alias("cnt"))


def salted_join(
    left: DataFrame, right: DataFrame, left_key: str, right_key: str, salt: int = 8
) -> DataFrame:
    """Skew-proof equi-join: salt the (large, skewed) left side with a
    random shard id and explode the (smaller) right side across all
    ``salt`` shard ids, then join on (key, shard).

    The hot key's rows land in ``salt`` different shuffle partitions
    instead of one; the right side is replicated x salt (cheap when the
    right side is the smaller input).  Row-level results are identical to
    a plain join.
    """
    lsalt = left.withColumn(
        "_shard",
        F.pmod(F.crc32(F.monotonically_increasing_id().cast("string")), F.lit(salt)),
    )
    rsalt = right.withColumn(
        "_shard", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    out = lsalt.join(
        rsalt, (F.col(left_key) == F.col(right_key)) & (lsalt["_shard"] == rsalt["_shard"])
    )
    return out.drop("_shard")


def hot_keys(df: DataFrame, key: str, threshold_ratio: float = 0.01) -> DataFrame:
    """Diagnostic: keys holding more than ``threshold_ratio`` of all rows
    (the candidates worth salting or isolating into a broadcast path)."""
    total = df.count()
    return (
        df.groupBy(key)
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") > total * threshold_ratio)
        .orderBy(F.desc("cnt"))
    )
