"""Source/sink coverage beyond parquet (SURVEY.md §2.C "Scans/sources" /
"Sinks"): CSV and JSON-lines round-trips driven inside oracle-checked
queries, plus the exact ``part-NNNNN`` text sink exercised by the
exe-compat path (mapreduce/job.py).

Each query writes a table out in the target format, reads it back with an
explicit schema, and aggregates -- the oracle runs against the original
parquet, so a lossy writer/reader would hash-mismatch.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from eecs485_p4_mapreduce_spark.functions.numeric import dsum, dsum_sql
from eecs485_p4_mapreduce_spark.plans.registry import query
from eecs485_p4_mapreduce_spark.sources import load_table


@query(
    "source_csv_roundtrip",
    oracle="""
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           MIN(md5(text)) AS first_digest
    FROM documents
    GROUP BY lang
    """,
)
def source_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents -> CSV (quoted, header) -> read back with explicit schema
    -> aggregate.  Exercises the CSV writer/parser including quoting of
    free text; the md5 digest in the oracle catches any corruption."""
    docs = load_table(spark, sf_dir, "documents")
    out = tempfile.mkdtemp(prefix="spark-graft-csv-")
    path = os.path.join(out, "docs")
    docs.write.mode("overwrite").option("header", True).option("quoteAll", True).csv(path)
    back = (
        spark.read.option("header", True)
        .schema("doc_id bigint, text string, lang string, source string, n_chars bigint")
        .csv(path)
    )
    return back.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        F.min(F.md5("text")).alias("first_digest"),
    )


@query(
    "source_json_roundtrip",
    oracle=f"""
    SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n,
           {dsum_sql('o_totalprice')} AS revenue,
           MIN(CAST(o_orderdate AS VARCHAR)) AS first_date
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def source_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders -> JSON lines -> read back with explicit schema -> aggregate.
    Timestamps survive via ISO strings; the oracle's min(date-as-string)
    pins the serialization."""
    o = load_table(spark, sf_dir, "orders")
    out = tempfile.mkdtemp(prefix="spark-graft-json-")
    path = os.path.join(out, "orders")
    o.write.mode("overwrite").json(path)
    back = spark.read.schema(
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string"
    ).json(path)
    return back.groupBy("o_orderstatus").agg(
        F.count("*").cast("bigint").alias("n"),
        dsum("o_totalprice").alias("revenue"),
        F.min(F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss")).alias("first_date"),
    )


@query(
    "source_orc_roundtrip",
    oracle=f"""
    SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n,
           {dsum_sql('c_acctbal')} AS total_bal,
           MIN(c_name) AS first_name
    FROM customer
    GROUP BY c_mktsegment
    """,
)
def source_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer -> ORC -> read back -> aggregate.  Exercises the second
    columnar container (stripe-based, same predicate-pushdown and
    column-pruning machinery as parquet); the oracle aggregates the
    original table, so any loss in the writer/reader shows up as a hash
    mismatch."""
    c = load_table(spark, sf_dir, "customer")
    out = tempfile.mkdtemp(prefix="spark-graft-orc-")
    path = os.path.join(out, "customer")
    c.write.mode("overwrite").orc(path)
    back = spark.read.orc(path)
    return back.groupBy("c_mktsegment").agg(
        F.count("*").cast("bigint").alias("n"),
        dsum("c_acctbal").alias("total_bal"),
        F.min("c_name").alias("first_name"),
    )
