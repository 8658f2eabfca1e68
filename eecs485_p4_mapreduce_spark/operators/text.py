"""The reference's own query surface, Spark-first (SURVEY.md §2.B).

Word count (B1 tokenize + B2 group-sum; reference
tests/testdata/exec/wc_map.sh:12, wc_reduce.sh:14), grep (B3 substring
filter; tests/testdata/exec/grep_map.py:27-28), projection with
malformed-row guard (B4; grep_reduce.py:17-27).  The reference runs these as
subprocess pipelines over text files; here they are declarative plans --
Catalyst pushes the grep predicate into the parquet scan and runs the
aggregation hash-partial+final (the map-side combine the reference lacks,
SURVEY.md §2.B2), whole-stage-codegen'd end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from eecs485_p4_mapreduce_spark.functions.textfn import DUCK_TOKENS, tokens
from eecs485_p4_mapreduce_spark.plans.registry import query
from eecs485_p4_mapreduce_spark.sources import load_table

# DuckDB twin of functions.textfn.tokens


@query(
    "wordcount",
    oracle=f"""
    SELECT word, COUNT(*) AS cnt
    FROM (SELECT unnest({DUCK_TOKENS}) AS word FROM documents)
    GROUP BY word
    """,
)
def wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token frequency over the corpus: scan -> flatMap -> shuffle -> agg.

    The flagship query -- exercises the reference's entire dataflow
    (A1 scan, A2 map, A3 partition, A5 merge, A6 reduce) in one plan.
    """
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(tokens("text")).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )


@query(
    "grep",
    oracle="""
    SELECT doc_id, text
    FROM documents
    WHERE contains(lower(text), 'scan')
    """,
)
def grep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Case-insensitive substring filter (reference grep_map.py:27-28).

    The predicate is declarative, so Catalyst pushes a StartsWith-free
    Contains filter toward the scan instead of piping every row through a
    subprocess as the reference does.
    """
    docs = load_table(spark, sf_dir, "documents")
    return docs.filter(F.lower(F.col("text")).contains("scan")).select("doc_id", "text")


@query(
    "grep_count",
    oracle="""
    SELECT lang, COUNT(*) AS matches
    FROM documents
    WHERE contains(lower(text), 'join')
    GROUP BY lang
    """,
)
def grep_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grep + aggregate: match count per language."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.filter(F.lower(F.col("text")).contains("join"))
        .groupBy("lang")
        .agg(F.count("*").alias("matches"))
    )


@query(
    "project_guard",
    oracle="""
    SELECT doc_id, source AS src, n_chars
    FROM documents
    WHERE text IS NOT NULL AND length(text) > 0
    """,
)
def project_guard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection with malformed-row guard (reference grep_reduce.py:17-27:
    emit value, skip rows that don't parse)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.filter(F.col("text").isNotNull() & (F.length("text") > 0))
        .select("doc_id", F.col("source").alias("src"), "n_chars")
    )


@query(
    "distinct_tokens",
    oracle=f"""
    SELECT lang, COUNT(DISTINCT word) AS n_distinct
    FROM (SELECT lang, unnest({DUCK_TOKENS}) AS word FROM documents)
    GROUP BY lang
    """,
)
def distinct_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) -- expands to a two-phase distinct aggregate."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("lang", F.explode(tokens("text")).alias("word"))
        .groupBy("lang")
        .agg(F.countDistinct("word").alias("n_distinct"))
    )


@query(
    "wordcount_topk",
    oracle=f"""
    SELECT word, cnt FROM (
      SELECT word, COUNT(*) AS cnt
      FROM (SELECT unnest({DUCK_TOKENS}) AS word FROM documents)
      GROUP BY word)
    ORDER BY cnt DESC, word LIMIT 20
    """,
)
def wordcount_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k most frequent tokens: agg + global TakeOrdered (no full sort).

    Spark plans orderBy+limit as TakeOrderedAndProject -- each partition
    keeps only k candidates, so the global sort never materializes; at
    100 TB this is the only sane top-k.
    """
    docs = load_table(spark, sf_dir, "documents")
    wc = (
        docs.select(F.explode(tokens("text")).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )
    return wc.orderBy(F.desc("cnt"), F.asc("word")).limit(20)
