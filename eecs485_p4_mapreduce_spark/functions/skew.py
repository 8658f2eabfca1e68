"""Skew mitigation: salted aggregation and salted joins.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime; salting is the explicit fallback when one key dominates so hard
that even split partitions overwhelm an executor (the classic null-key /
power-law-user problem at 100 TB).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _content_salt(df: DataFrame, n: int, cols: list[str] | None = None) -> Column:
    """Deterministic per-row salt in [0, n): crc32 over row content.

    NOT monotonically_increasing_id()/rand(): those are nondeterministic
    across task retries, and a salt that feeds a shuffle partition key must
    reproduce identically on recomputation or a post-fetch-failure stage
    retry can place rows in partitions other reducers already consumed
    (lost/duplicated rows, the SPARK-23207 class -- and session.py enables
    task retry).

    ``cols`` picks which columns feed the hash (default: all).  Pass a
    high-cardinality subset -- ideally a unique row key -- when it exists:
    hashing every column defeats column pruning at the scan (the salt
    expression forces a read of each referenced column).  Trade-off
    either way: rows identical across the hashed columns share a salt,
    so a hot key whose rows are indistinguishable does not spread.
    """
    use = cols if cols is not None else df.columns
    rendered = F.concat_ws("\x1f", *[F.col(c).cast("string") for c in use])
    return F.pmod(F.crc32(rendered), F.lit(n))


def salted_agg_count(
    df: DataFrame, key: str, salt: int = 16, salt_cols: list[str] | None = None
) -> DataFrame:
    """Two-phase skew-proof count: groupBy((key, salt)) partial counts,
    then groupBy(key) final sum.  The hot key's rows spread over ``salt``
    reducers in phase 1; phase 2 only merges ``salt`` partial rows."""
    salted = df.withColumn("_salt", _content_salt(df, salt, salt_cols))
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
    lsalt = left.withColumn("_shard", _content_salt(left, salt))
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
