"""Distributed iterative linear algebra (SURVEY.md §2.C iterative
category, alongside graph.py): top principal direction of the embedding
matrix by power iteration, oracle-pinned by unrolling the fixed
iteration count into chained CTEs -- the same proof technique as
``graph_pagerank``.

Scale shape: each iteration is one scan of the embeddings table -- a
per-row dot product against the broadcast current vector, then a
(d, component) partial-sum aggregate of D*|rows| terms down to D values.
Nothing but the D-vector (64 doubles) ever leaves the executors; at
100 TB this is the standard distributed mat-vec and the driver loop just
re-broadcasts 512 bytes per iteration.

Cross-engine determinism: per-row dots fold left-to-right (Spark
``aggregate`` == DuckDB ``list_inner_product`` order, the knn_cosine
precedent); the per-component sums accumulate in DECIMAL(30,15)
(order-independent, functions/numeric.py rationale); the norm is a
sequential d-ascending fold both sides (Python loop == DuckDB
``list_sum`` over a d-ordered list), so every intermediate double is
bit-identical.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from eecs485_p4_mapreduce_spark.plans.registry import query
from eecs485_p4_mapreduce_spark.sources import load_table

_D = 64      # embedding dim
_ITERS = 4   # fixed unrolled iteration count

_DOT_V = (
    "aggregate(zip_with(v, {vl}, (x, y) -> x * y),"
    " cast(0.0 as double), (acc, x) -> acc + x)"
)


def _power_iter_oracle() -> str:
    """Unroll the mat-vec fixed point into chained CTEs (v0..vN)."""
    parts = [
        f"""
        e AS MATERIALIZED (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        el AS MATERIALIZED (
          SELECT vec_id, d, v[d] AS x
          FROM e, unnest(range(1, {_D} + 1)) AS t(d)),
        v0 AS (SELECT list_transform(range(1, {_D} + 1), d -> 1.0) AS vv)
        """
    ]
    for k in range(1, _ITERS + 1):
        parts.append(
            f"""
        dot{k} AS (SELECT e.vec_id,
                          list_inner_product(e.v, (SELECT vv FROM v{k - 1})) AS dot
                   FROM e),
        s{k} AS (SELECT el.d,
                        CAST(SUM(CAST(el.x * dot{k}.dot AS DECIMAL(30,15))) AS DOUBLE) AS s
                 FROM el JOIN dot{k} ON dot{k}.vec_id = el.vec_id
                 GROUP BY el.d),
        sv{k} AS (SELECT list(s ORDER BY d) AS sv FROM s{k}),
        v{k} AS (SELECT list_transform(sv, x ->
                     x / sqrt(list_sum(list_transform(sv, y -> y * y)))) AS vv
                 FROM sv{k})
            """
        )
    return (
        "WITH " + ",".join(parts) + f"""
        SELECT d,
               round(vv[d], 6) AS component,
               round(sqrt(list_sum(list_transform(sv, y -> y * y))), 6) AS sigma
        FROM v{_ITERS}, sv{_ITERS}, unnest(range(1, {_D} + 1)) AS t(d)
        """
    )


@query("embedding_top_pc_power_iteration", oracle=_power_iter_oracle())
def embedding_top_pc_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal direction of the (uncentered) embedding matrix:
    v <- X^T X v / ||X^T X v||, {_ITERS} fixed iterations from v0 = 1.

    Per iteration: broadcast v as a literal array, one scan computes each
    row's dot x.v, posexplode multiplies it back against each component,
    and a decimal-exact groupBy(d) reduces to the D-vector.  Only the
    64-double result is collected (the pagerank-style driver loop --
    data never moves).  Normalization runs on the driver as a sequential
    d-ascending fold so it is bit-identical to the oracle's list_sum.
    sigma (the final pre-normalization norm) estimates the top singular
    value of X^T X's action, i.e. lambda_1.
    """
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    v = [1.0] * _D
    for _ in range(_ITERS):
        # v travels as broadcast DATA (1-row DataFrame), not as a literal
        # array: with literals every iteration is a brand-new plan and
        # whole-stage codegen recompiles (~1.5 s/iteration of pure JIT);
        # with identical plan text the compiled stages are cache-hit from
        # iteration 2 on (measured 11.5 s -> 6.4 s total at sf0.1,
        # ~0.7 s/iteration steady-state).
        vdf = spark.createDataFrame([(v,)], "vl array<double>")
        dotted = (
            e.crossJoin(F.broadcast(vdf))
            .withColumn("dot", F.expr(_DOT_V.format(vl="vl")))
            .select("v", "dot")
        )
        # dot is a pass-through column of the Generate node, so it is
        # evaluated once per input row, not once per exploded element
        s_rows = (
            dotted.select(F.posexplode("v").alias("d0", "x"), "dot")
            .groupBy((F.col("d0") + 1).alias("d"))
            .agg(
                F.sum((F.col("x") * F.col("dot")).cast("decimal(30,15)"))
                .cast("double")
                .alias("s")
            )
            .collect()
        )
        s = [r["s"] for r in sorted(s_rows, key=lambda r: r["d"])]
        norm_sq = 0.0
        for y in s:
            norm_sq += y * y
        sigma = math.sqrt(norm_sq)
        v = [y / sigma for y in s]
    # round via Spark's SQL round (HALF_UP, matching the oracle's round),
    # not Python's round (HALF_EVEN)
    rows = [(d + 1, v[d], sigma) for d in range(_D)]
    raw = spark.createDataFrame(rows, "d bigint, component double, sigma double")
    return raw.select(
        "d", F.round("component", 6).alias("component"), F.round("sigma", 6).alias("sigma")
    )
