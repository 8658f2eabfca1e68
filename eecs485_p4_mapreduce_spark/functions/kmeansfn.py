"""Shared Lloyd's k-means quantizer: Spark training loop + the unrolled
DuckDB CTE chain that replays it exactly.

Lives under functions/ (no registry import) so any operator module —
the IVF training/search queries in operators/linalg.py and the SemDeDup
pruner in operators/semdedup.py — can be imported first without a
decoration-time circular import (the lshfn.py convention).  See
operators/linalg.py for the determinism rationale (decimal-exact
component means, argmin ties on k) and the scale notes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

D = 64          # embedding dim
KM_K = 8        # clusters (the IVF nlist)
KM_ROUNDS = 2   # fixed unrolled update rounds

# string, not F.expr(...): building a Column needs an active SparkContext,
# which does not exist at module import time
KM_DIST = (
    "-2 * aggregate(zip_with(v, cv, (x, y) -> x * y), cast(0.0 as double),"
    " (acc, x) -> acc + x)"
    " + aggregate(zip_with(cv, cv, (x, y) -> x * y), cast(0.0 as double),"
    " (acc, x) -> acc + x)"
)


def km_assign(e: DataFrame, cdf: DataFrame) -> DataFrame:
    """(vec_id, v, k): nearest-centroid list id per vector, ties on k."""
    w = Window.partitionBy("vec_id").orderBy("dist", "k")
    return (
        e.crossJoin(F.broadcast(cdf))
        .withColumn("dist", F.expr(KM_DIST))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("vec_id", "v", "k")
    )


# Session-scoped trained-quantizer store: (applicationId, cache_key) ->
# (cache_key = caller's (sf_dir, loader) tuple) ->
# centroid list.  Three queries (IVF training, trained-IVF search,
# SemDeDup) train the IDENTICAL quantizer over the same embeddings; the
# centroids are a K x D python list (tiny, driver-side), so memoizing
# them is the in-process stand-in for the stored model table a
# production pipeline would read.  Deterministic, so cached vs fresh is
# bit-identical — every consumer's oracle replays the same training.
# Same immutable-sf_dir assumption (and clear() escape hatch) as
# dedup._SIG_CACHE: entries live for the application; if the parquet
# under a cached sf_dir is rewritten mid-application, clear first.
_CENTROID_CACHE: dict[tuple, list] = {}


def clear_centroid_cache() -> None:
    """Drop every cached trained quantizer (see _CENTROID_CACHE caveats)."""
    _CENTROID_CACHE.clear()


def lloyds_assignments(spark: SparkSession, e: DataFrame, cache_key: object = None):
    """Run the fixed Lloyd's rounds; return (final centroid DF, final
    assignment DF).  Shared by the training query, the trained-IVF
    search query, and the SemDeDup pruner so all provably use the same
    quantizer.  Pass ``cache_key`` — callers use (sf_dir, loader), so
    a monkeypatched load_table gets its own entry rather than stale
    centroids (the _SIG_CACHE discipline) — to reuse this session's
    trained centroids instead of re-running the training jobs."""
    key = (
        (spark.sparkContext.applicationId, cache_key)
        if cache_key is not None
        else None
    )
    centroids = _CENTROID_CACHE.get(key) if key else None
    if centroids is None:
        init = e.filter(F.col("vec_id") < KM_K).select(
            F.col("vec_id").alias("k"), F.col("v").alias("cv")
        )
        centroids = [(int(r["k"]), list(r["cv"])) for r in init.collect()]
        for _ in range(KM_ROUNDS):
            cdf = spark.createDataFrame(centroids, "k bigint, cv array<double>")
            assigned = km_assign(e, cdf)
            means = (
                assigned.select("k", F.posexplode("v").alias("d0", "x"))
                .groupBy("k", (F.col("d0") + 1).alias("d"))
                .agg(
                    (
                        F.sum(F.col("x").cast("decimal(30,15)")).cast("double")
                        / F.count(F.lit(1))
                    ).alias("c")
                )
                .collect()
            )
            by_k: dict[int, list] = {}
            for r in means:
                by_k.setdefault(int(r["k"]), []).append((r["d"], r["c"]))
            centroids = [
                (k, [c for _, c in sorted(vals)]) for k, vals in sorted(by_k.items())
            ]
        if key:
            _CENTROID_CACHE[key] = centroids
    cdf = spark.createDataFrame(centroids, "k bigint, cv array<double>")
    return cdf, km_assign(e, cdf)


def kmeans_cte() -> str:
    """The unrolled Lloyd's CTE chain through the final assignment
    (afin) and final centroids (c{rounds}) -- shared by the training
    query's oracle, the trained-IVF search oracle, and the SemDeDup
    oracle."""
    parts = [
        f"""
        e AS MATERIALIZED (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        el AS MATERIALIZED (
          SELECT vec_id, d, v[d] AS x
          FROM e, unnest(range(1, {D} + 1)) AS t(d)),
        c0 AS (SELECT vec_id AS k, v AS cv FROM e WHERE vec_id < {KM_K})
        """
    ]
    for r in range(1, KM_ROUNDS + 1):
        parts.append(
            f"""
        d{r} AS (
          SELECT e.vec_id, c.k,
                 -2 * list_inner_product(e.v, c.cv)
                   + list_inner_product(c.cv, c.cv) AS dist
          FROM e CROSS JOIN c{r - 1} c),
        a{r} AS (
          SELECT vec_id, k FROM (
            SELECT vec_id, k,
                   ROW_NUMBER() OVER (PARTITION BY vec_id
                                      ORDER BY dist, k) AS rk
            FROM d{r}) WHERE rk = 1),
        m{r} AS (
          SELECT a.k, el.d,
                 CAST(SUM(CAST(el.x AS DECIMAL(30,15))) AS DOUBLE)
                   / COUNT(*) AS c
          FROM el JOIN a{r} a ON a.vec_id = el.vec_id
          GROUP BY a.k, el.d),
        c{r} AS (
          SELECT k, list(c ORDER BY d) AS cv FROM m{r} GROUP BY k)
            """
        )
    final = KM_ROUNDS
    return (
        "WITH " + ",".join(parts) + f""",
        dfin AS (
          SELECT e.vec_id, c.k,
                 -2 * list_inner_product(e.v, c.cv)
                   + list_inner_product(c.cv, c.cv) AS dist
          FROM e CROSS JOIN c{final} c),
        afin AS (
          SELECT vec_id, k FROM (
            SELECT vec_id, k,
                   ROW_NUMBER() OVER (PARTITION BY vec_id
                                      ORDER BY dist, k) AS rk
            FROM dfin) WHERE rk = 1)
        """
    )
