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

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from eecs485_p4_mapreduce_spark.functions import kmeansfn
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


# The Lloyd's trainer + unrolled oracle CTEs moved to
# functions/kmeansfn.py so operators/semdedup.py can share the quantizer
# without a decoration-time circular import (the lshfn.py convention).
# Local underscore aliases keep this module's call sites unchanged.
_KM_K = kmeansfn.KM_K
_KM_ROUNDS = kmeansfn.KM_ROUNDS
_km_assign = kmeansfn.km_assign
_lloyds_assignments = kmeansfn.lloyds_assignments
_kmeans_cte = kmeansfn.kmeans_cte


def _kmeans_oracle() -> str:
    return (
        _kmeans_cte()
        + f"""
        SELECT a.k, CAST(COUNT(*) AS BIGINT) AS n_points,
               round(list_inner_product(c.cv, c.cv), 6) AS centroid_sq_norm
        FROM afin a JOIN c{_KM_ROUNDS} c ON c.k = a.k
        GROUP BY a.k, c.cv
        """
    )


@query("embedding_kmeans_ivf_train", oracle=_kmeans_oracle())
def embedding_kmeans_ivf_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train the IVF coarse quantizer: Lloyd's k-means over the embedding
    table, K={_KM_K} lists, {_KM_ROUNDS} fixed update rounds from a
    deterministic init (centroids = vec_id 0..K-1) -- closing the
    ``knn_ivf_label`` caveat where a pre-assigned label column stood in
    for a trained quantizer.

    Each round: broadcast the K x D centroid table (data, not literals
    -- the power-iteration codegen lesson above), assign every vector by
    join + row_number argmin on -2 x.c + |c|^2 (|x|^2 is constant per
    row; ties break on k, matching the oracle's ORDER BY dist, k), then
    recompute centroids with a decimal-exact component mean.  Only the
    K x D centroid matrix reaches the driver between rounds.  The oracle
    unrolls the identical rounds as chained CTEs, so even the iterative
    TRAINING loop is proven exactly -- same argmin, same decimal means.
    At 100 TB: assignment is a broadcast join scan (embarrassingly
    parallel), the update one (k, d) aggregate; rounds are sequential
    scans, the classic distributed Lloyd's shape.
    """
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    cdf, final = _lloyds_assignments(spark, e)
    norm = F.expr(
        "aggregate(zip_with(cv, cv, (x, y) -> x * y), cast(0.0 as double),"
        " (acc, x) -> acc + x)"
    )
    return (
        final.join(F.broadcast(cdf), "k")
        .groupBy("k", F.round(norm, 6).alias("centroid_sq_norm"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_points"))
        .select("k", "n_points", "centroid_sq_norm")
    )


_IVF_NQ = 10    # vec_id < 10 are the query vectors (matches knn_cosine)
_IVF_TOPK = 5


def _ivf_trained_oracle() -> str:
    return (
        _kmeans_cte()
        + f""",
        qa AS (SELECT a.vec_id AS query_id, a.k, e.v AS qv
               FROM afin a JOIN e ON e.vec_id = a.vec_id
               WHERE a.vec_id < {_IVF_NQ}),
        scored AS (
          SELECT qa.query_id, a.vec_id AS neighbor_id,
                 list_inner_product(qa.qv, e.v)
                   / (sqrt(list_inner_product(qa.qv, qa.qv))
                      * sqrt(list_inner_product(e.v, e.v))) AS cos_raw
          FROM qa
          JOIN afin a ON a.k = qa.k AND a.vec_id <> qa.query_id
          JOIN e ON e.vec_id = a.vec_id),
        ranked AS (
          SELECT query_id, neighbor_id, cos_raw,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                                    ORDER BY cos_raw DESC, neighbor_id) AS rk
          FROM scored)
        SELECT query_id, neighbor_id, round(cos_raw, 6) AS cosine, rk
        FROM ranked WHERE rk <= {_IVF_TOPK}
        """
    )


@query("knn_ivf_trained", oracle=_ivf_trained_oracle())
def knn_ivf_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end trained IVF search: train the coarse quantizer
    (Lloyd's, the shared _lloyds_assignments), assign the corpus to
    lists, then answer each query by probing ONLY its own list
    (nprobe=1) with exact cosine rerank -- the full production IVF
    pipeline in one declarative query, upgrading ``knn_ivf_label`` from
    a pre-assigned label to a quantizer the engine itself trained.

    The probe is a broadcast equi-join on the list id: with the corpus
    bucketed/partitioned by list, each query scans 1/nlist of the data
    and nothing shuffles but results.  The oracle reuses the identical
    unrolled training CTEs, so quantizer, assignment, and search are all
    proven against DuckDB in one statement.
    """
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    _, assigned = _lloyds_assignments(spark, e)
    corpus = assigned.select("vec_id", "v", "k")
    q = F.broadcast(
        corpus.filter(F.col("vec_id") < _IVF_NQ).select(
            F.col("vec_id").alias("query_id"), F.col("v").alias("qv"), "k"
        )
    )
    cos = F.expr(
        "aggregate(zip_with(qv, v, (x, y) -> x * y), cast(0.0 as double),"
        " (acc, x) -> acc + x)"
        " / (sqrt(aggregate(zip_with(qv, qv, (x, y) -> x * y), cast(0.0 as double),"
        " (acc, x) -> acc + x))"
        " * sqrt(aggregate(zip_with(v, v, (x, y) -> x * y), cast(0.0 as double),"
        " (acc, x) -> acc + x)))"
    )
    scored = (
        q.join(corpus, "k")
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn("cos_raw", cos)
        .select("query_id", F.col("vec_id").alias("neighbor_id"), "cos_raw")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_raw"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _IVF_TOPK)
        .select("query_id", "neighbor_id", F.round("cos_raw", 6).alias("cosine"), "rk")
    )
