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


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table. Scans stay declarative so filters/projections
    written downstream reach the parquet reader (PushedFilters/ReadSchema)."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        # events.parquet stores TIMESTAMP(NANOS), which Spark's parquet
        # reader rejects.  Read nanos as int64 (legacy conf) and convert to
        # a microsecond timestamp JVM-side (floor-division, matching how
        # DuckDB truncates ns->us).  The conf is a runtime SQLConf, so this
        # works in the driver's session too.
        from pyspark.sql import functions as F

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        raw = spark.read.parquet(path)
        # Integer `div`, not `/`: epoch-nanos overflow double's 53-bit
        # mantissa, so float division is off by up to 1us.
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return spark.read.parquet(path)


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
