"""Similarity search over the embeddings table (SURVEY.md §2.C ⊕).

Three tiers, mirroring how ANN is actually deployed:
- ``knn_cosine``        exact brute-force top-k, pure JVM expressions.
- ``knn_cosine_pandas`` the same query through a vectorized Arrow/Pandas
  UDF (numpy matmul per batch) -- the pattern for when the metric is not
  expressible with built-ins.  ~10-100x faster than a row-at-a-time
  Python UDF; still the slow path vs built-ins.
- ``knn_ivf_label``     partition-pruned search: probe only the query's
  cluster (the ``label`` column stands in for a trained IVF coarse
  quantizer).  At 100 TB: partition the table by list id, prune scans by
  the probed lists, brute-force within lists -- the shuffle-free path.

Dot products fold left-to-right in double (Spark ``aggregate`` ==
DuckDB ``list_inner_product`` order), round(6) guards the last bit.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from eecs485_p4_mapreduce_spark.plans.registry import query
from eecs485_p4_mapreduce_spark.sources import load_table

_TOPK = 5
_NQ = 10  # vec_id < 10 are the query vectors

_DOT = "aggregate(zip_with({a}, {b}, (x, y) -> x * y), cast(0.0 as double), (acc, x) -> acc + x)"


def _cos_expr(a: str, b: str) -> str:
    dot = _DOT.format(a=a, b=b)
    na = f"sqrt({_DOT.format(a=a, b=a)})"
    nb = f"sqrt({_DOT.format(a=b, b=b)})"
    return f"{dot} / ({na} * {nb})"


_ORACLE_KNN = f"""
    WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < {_NQ}),
    scored AS (
      SELECT q.query_id, e.vec_id AS neighbor_id,
             list_inner_product(q.qv, e.v)
               / (sqrt(list_inner_product(q.qv, q.qv)) * sqrt(list_inner_product(e.v, e.v)))
               AS cos_raw
      FROM q JOIN e ON e.vec_id <> q.query_id),
    ranked AS (
      SELECT query_id, neighbor_id, cos_raw,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cos_raw DESC, neighbor_id) AS rk
      FROM scored)
    SELECT query_id, neighbor_id, round(cos_raw, 6) AS cosine, rk
    FROM ranked WHERE rk <= {_TOPK}
"""


@query("knn_cosine", oracle=_ORACLE_KNN)
def knn_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact brute-force cosine top-k: broadcast the query set, score every
    vector JVM-side, partitioned top-k via row_number.

    One broadcast + one shuffle (on query_id, cardinality = |queries|).
    The scan side never shuffles -- this shape survives any table size;
    it is the verify/rerank stage for the IVF/LSH variants.
    """
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    q = F.broadcast(
        e.filter(F.col("vec_id") < _NQ).select(
            F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
        )
    )
    scored = (
        q.join(e, F.col("vec_id") != F.col("query_id"))
        .withColumn("cos_raw", F.expr(_cos_expr("qv", "v")))
        .select("query_id", F.col("vec_id").alias("neighbor_id"), "cos_raw")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_raw"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _TOPK)
        .select("query_id", "neighbor_id", F.round("cos_raw", 6).alias("cosine"), "rk")
    )


@query("knn_cosine_pandas", oracle=_ORACLE_KNN)
def knn_cosine_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same exact top-k, but the scoring runs in a scalar Pandas UDF:
    Arrow-batched columns -> numpy dot per row pair.  Demonstrates the
    vectorized-UDF escape hatch with identical results to the built-in
    plan (same oracle)."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def cos_udf(qv: pd.Series, v: pd.Series) -> pd.Series:
        # per-element fold in float64; np.dot would use SIMD/BLAS reorder
        # and drift in the last bit vs the oracle's sequential sum.
        def fold(a, b):
            acc = 0.0
            for x, y in zip(a, b):
                acc += x * y
            return acc

        out = [
            fold(a, b) / ((fold(a, a) ** 0.5) * (fold(b, b) ** 0.5))
            for a, b in zip(qv, v)
        ]
        return pd.Series(out)

    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    q = F.broadcast(
        e.filter(F.col("vec_id") < _NQ).select(
            F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
        )
    )
    scored = (
        q.join(e, F.col("vec_id") != F.col("query_id"))
        .withColumn("cos_raw", cos_udf(F.col("qv"), F.col("v")))
        .select("query_id", F.col("vec_id").alias("neighbor_id"), "cos_raw")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_raw"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _TOPK)
        .select("query_id", "neighbor_id", F.round("cos_raw", 6).alias("cosine"), "rk")
    )


@query(
    "knn_ivf_label",
    oracle=f"""
    WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    q AS (SELECT vec_id AS query_id, label AS qlabel, v AS qv FROM e WHERE vec_id < {_NQ}),
    scored AS (
      SELECT q.query_id, e.vec_id AS neighbor_id,
             list_inner_product(q.qv, e.v)
               / (sqrt(list_inner_product(q.qv, q.qv)) * sqrt(list_inner_product(e.v, e.v)))
               AS cos_raw
      FROM q JOIN e ON e.label = q.qlabel AND e.vec_id <> q.query_id),
    ranked AS (
      SELECT query_id, neighbor_id, cos_raw,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cos_raw DESC, neighbor_id) AS rk
      FROM scored)
    SELECT query_id, neighbor_id, round(cos_raw, 6) AS cosine, rk
    FROM ranked WHERE rk <= {_TOPK}
    """,
)
def knn_ivf_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style approximate top-k: probe only the query's own cluster
    (label = coarse quantizer cell).  The label equi-join IS the partition
    pruning -- with the table bucketed by label, each query touches one
    bucket (1/nlist of the data) and nothing shuffles but the results."""
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )
    q = F.broadcast(
        e.filter(F.col("vec_id") < _NQ).select(
            F.col("vec_id").alias("query_id"),
            F.col("label").alias("qlabel"),
            F.col("v").alias("qv"),
        )
    )
    scored = (
        q.join(e, (F.col("label") == F.col("qlabel")) & (F.col("vec_id") != F.col("query_id")))
        .withColumn("cos_raw", F.expr(_cos_expr("qv", "v")))
        .select("query_id", F.col("vec_id").alias("neighbor_id"), "cos_raw")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_raw"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _TOPK)
        .select("query_id", "neighbor_id", F.round("cos_raw", 6).alias("cosine"), "rk")
    )
