"""Flagship end-to-end corpus-curation pipeline (SURVEY.md §2.C ⊕):
every stage a 100 TB pretraining-data job runs, composed in ONE
registered query with ONE unrolled DuckDB oracle proving the whole
funnel bit-for-bit:

  raw -> language+length gate -> exact dedup (normalized-fingerprint
  keeper) -> near dedup (MinHash-LSH greedy keeper) -> temperature mix
  (md5-bucket acceptance toward target language shares)

The output is the funnel readout (per-stage surviving docs + tokens)
that every curation run reports.  Each stage reuses the exact spelling
its standalone operator already proved (pipeline_training_data's
fingerprint, dedup.py's banded MinHash chain, mixing.py's integer
acceptance thresholds), so the composite shows the stages COMPOSE --
the point of an engine, not just a query zoo.

Scale shape: stages 0-2 are scan-side expressions plus one fp-keyed
window; stage 3 is the banded-signature equi-join (16-byte keys only);
stage 4 is a 5-row broadcast of acceptance thresholds.  The survivor
id set is localCheckpointed after the MinHash stage so the funnel's
later branches never recompute signatures.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from eecs485_p4_mapreduce_spark.functions.textfn import DUCK_TOKENS, tokens
from eecs485_p4_mapreduce_spark.operators.dedup import (
    _MINHASH_BANDED_DUCK,
    _minhash_banded,
)
from eecs485_p4_mapreduce_spark.operators.mixing import (
    _BUCKETS,
    _HEX3,
    _MIX_CASE,
)
from eecs485_p4_mapreduce_spark.plans.registry import query
from eecs485_p4_mapreduce_spark.sources import load_table

_LANGS = ("en", "de", "es", "fr", "zh")
_MIN_WORDS = 20

# The shared MinHash CTE chain is written against the `documents` view;
# here the signatures must be computed over the exact-dedup SURVIVORS
# (pipeline order matters: near-dedup after exact-dedup), so retarget
# the one scan it contains.
_mh = _MINHASH_BANDED_DUCK.strip()
assert _mh.startswith("WITH ") and _mh.count("FROM documents") == 1
_MH_OVER_EX = _mh[len("WITH "):].replace("FROM documents", "FROM exd")

_LANG_LIST = ", ".join(f"'{l}'" for l in _LANGS)


def _funnel_row(stage: str, rel: str) -> str:
    return (
        f"SELECT '{stage}' AS stage, CAST(COUNT(*) AS BIGINT) AS n_docs,"
        f" CAST(SUM(n_words) AS BIGINT) AS total_tokens FROM {rel}"
    )


@query(
    "pipeline_curation_end_to_end",
    oracle=f"""
    WITH base AS MATERIALIZED (
      SELECT doc_id, lang, text, len({DUCK_TOKENS}) AS n_words,
             md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
      FROM documents),
    filt AS MATERIALIZED (
      SELECT * FROM base
      WHERE lang IN ({_LANG_LIST}) AND n_words >= {_MIN_WORDS}),
    exd AS MATERIALIZED (
      SELECT * FROM filt
      WHERE doc_id = (SELECT MIN(doc_id) FROM filt f2 WHERE f2.fp = filt.fp)),
    {_MH_OVER_EX},
    victims AS (
      SELECT DISTINCT y.doc_id AS doc_id
      FROM banded x JOIN banded y
        ON x.b = y.b AND x.band_hash = y.band_hash AND x.doc_id < y.doc_id),
    nd AS MATERIALIZED (
      SELECT * FROM exd WHERE doc_id NOT IN (SELECT doc_id FROM victims)),
    counts AS (SELECT lang, COUNT(*) AS n_lang FROM nd GROUP BY lang),
    tot AS (SELECT COUNT(*) AS n_total FROM nd),
    rates AS (
      SELECT lang,
             CAST(floor(least(1.0,
               (CASE lang {_MIX_CASE} ELSE 0.0 END) * tot.n_total / n_lang)
               * {_BUCKETS}) AS BIGINT) AS thresh
      FROM counts, tot),
    mixed AS (
      SELECT nd.* FROM nd JOIN rates r ON r.lang = nd.lang
      WHERE {_HEX3['duckdb']} < r.thresh)
    {_funnel_row('s0_raw', 'base')}
    UNION ALL {_funnel_row('s1_lang_length', 'filt')}
    UNION ALL {_funnel_row('s2_exact_dedup', 'exd')}
    UNION ALL {_funnel_row('s3_near_dedup', 'nd')}
    UNION ALL {_funnel_row('s4_mixed', 'mixed')}
    """,
)
def pipeline_curation_end_to_end(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full curation funnel in one plan: language + min-length gates,
    exact dedup (min-doc_id keeper per normalized md5 fingerprint),
    MinHash-LSH near dedup (greedy: a doc is dropped when any band
    partner has a smaller id -- deterministic, no component search),
    then temperature mixing by integer md5-bucket acceptance.  Emits
    the per-stage (docs, tokens) funnel a curation run reports.

    Every stage reuses the spelling its standalone operator proved;
    the oracle is the same chain unrolled as CTEs, so the check proves
    the COMPOSITION, end to end, including the order-sensitivity
    (signatures over exact-dedup survivors, mix shares over near-dedup
    survivors).
    """
    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id",
        "lang",
        "text",
        F.size(tokens("text")).alias("n_words"),
        F.md5(F.trim(F.regexp_replace(F.lower("text"), r"\s+", " "))).alias("fp"),
    )
    filt = base.filter(
        F.col("lang").isin(*_LANGS) & (F.col("n_words") >= _MIN_WORDS)
    )
    ex = (
        filt.withColumn("keeper", F.min("doc_id").over(Window.partitionBy("fp")))
        .filter(F.col("doc_id") == F.col("keeper"))
        .drop("keeper")
    )
    _, banded = _minhash_banded(ex.select("doc_id", "text"))
    victims = (
        banded.select(F.col("doc_id").alias("a"), "b", "band_hash")
        .join(banded.select(F.col("doc_id").alias("doc_id"), "b", "band_hash"),
              ["b", "band_hash"])
        .filter(F.col("a") < F.col("doc_id"))
        .select("doc_id")
        .distinct()
    )
    nd = ex.join(victims, "doc_id", "left_anti").localCheckpoint()
    counts = nd.groupBy("lang").agg(F.count("*").alias("n_lang"))
    tot = nd.agg(F.count("*").alias("n_total"))
    rates = (
        counts.crossJoin(F.broadcast(tot))
        .withColumn(
            "thresh",
            F.expr(
                f"cast(floor(least(1.0, (CASE lang {_MIX_CASE} ELSE 0.0 END)"
                f" * n_total / n_lang) * {_BUCKETS}) as bigint)"
            ),
        )
        .select("lang", "thresh")
    )
    mixed = nd.join(F.broadcast(rates), "lang").filter(
        F.expr(_HEX3["spark"]) < F.col("thresh")
    )

    def funnel(df: DataFrame, stage: str) -> DataFrame:
        return df.agg(
            F.lit(stage).alias("stage"),
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_words").cast("bigint").alias("total_tokens"),
        )

    return (
        funnel(base, "s0_raw")
        .unionByName(funnel(filt, "s1_lang_length"))
        .unionByName(funnel(ex, "s2_exact_dedup"))
        .unionByName(funnel(nd, "s3_near_dedup"))
        .unionByName(funnel(mixed, "s4_mixed"))
    )
