"""Parquet table loaders.

The reference's only source is a directory-of-text-files scan
(SURVEY.md §2.A1, reference tests/test_manager_02.py:166-190); the engine's
analytic surface reads columnar parquet so Catalyst gets predicate pushdown,
column pruning, and partition pruning for free.  ``spark.read.text`` remains
available via :mod:`eecs485_p4_mapreduce_spark.mapreduce` for the
exe-compat path.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

# The driver-provided star schema (TESTDATA.md).
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def normalize_events_ts(df: DataFrame) -> DataFrame:
    """Normalize ``events.ts`` to a microsecond timestamp, dispatching on the
    dtype the reader actually produced.

    Testdata generations have stored ``ts`` two ways: TIMESTAMP(NANOS)
    (readable only as int64 under ``spark.sql.legacy.parquet.nanosAsLong``)
    and plain ``timestamp[us]`` (arrives as TIMESTAMP_NTZ).  Assuming one
    fixed storage type is exactly how round 2 lost every events-touching
    query, so dispatch on the schema: LongType means epoch-nanos and gets
    the ns->us conversion; anything else is cast to TimestampType.  The
    cast is value-identical under the UTC session timezone (session.py)
    and gives every downstream query one stable dtype — several use
    ``unix_micros``/watermarks, which reject TIMESTAMP_NTZ.  Shared by the
    batch loader and ``streaming.events_stream`` so the two paths cannot
    diverge.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, TimestampType

    if isinstance(df.schema["ts"].dataType, LongType):
        # Integer `div`, not `/`: epoch-nanos overflow double's 53-bit
        # mantissa, so float division is off by up to 1us.
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if not isinstance(df.schema["ts"].dataType, TimestampType):
        return df.withColumn("ts", F.col("ts").cast(TimestampType()))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table. Scans stay declarative so filters/projections
    written downstream reach the parquet reader (PushedFilters/ReadSchema)."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        # nanosAsLong only affects TIMESTAMP(NANOS) columns; harmless when
        # the file already stores micros, and required when it stores nanos.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Naive-timestamp semantics must match the DuckDB oracle regardless
        # of which session (ours or the driver's) loads the table.
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        return normalize_events_ts(spark.read.parquet(path))
    return spark.read.parquet(path)


def widen_scan(df: DataFrame, *keys: str) -> DataFrame:
    """Conditional keyed repartition before a HEAVY scan-side projection
    (the minhash_banded pattern, factored): a compact single-split scan
    otherwise serializes per-row md5/shingle/n-gram work onto one core —
    and when several plan branches replay the same projection, onto one
    core PER BRANCH.  A wide production scan never pays the exchange
    (conditional on scan partitions < defaultParallelism); the
    deterministic key keeps retries safe.  Call it on the bare scan
    frame only — `.rdd` on a frame with joins above it would force AQE
    stage materialization at plan time."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        df = df.repartition(target, *keys)
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so ``spark.sql`` queries mirror the
    DuckDB oracle's pre-registered views."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def run_sql(spark, sf_dir: str, sql: str):
    """Register all table views, then run one SQL text -- the shared
    execution path for queries whose Spark and DuckDB spellings are the
    same string (relational4/relational5)."""
    register_views(spark, sf_dir)
    return spark.sql(sql)
