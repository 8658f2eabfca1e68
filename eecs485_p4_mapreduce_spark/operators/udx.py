"""User-defined function surface (SURVEY.md §2.C "UDF/UDAF/UDTF").

The reference's *entire* query surface is user code (arbitrary streaming
executables, ref tests/testdata/exec/*; see the exe-compat path in
eecs485_p4_mapreduce_spark/mapreduce).  The engine-native equivalents:

- scalar Python UDF        (row-at-a-time; the slow path, shown once)
- vectorized Pandas UDF    (Arrow batches; see also similarity.py)
- grouped-map UDAF         (applyInPandas: whole group in, frame out)
- Python UDTF              (one row in, N rows out, lateral-join shape)
- stateful streaming op    (applyInPandasWithState; streaming/__init__.py)

Each has a DuckDB oracle so the Python results are pinned to relational
semantics, and each docstring says when NOT to use it (built-ins beat
all of these whenever they can express the logic).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from eecs485_p4_mapreduce_spark.functions.textfn import DUCK_TOKENS, tokens
from eecs485_p4_mapreduce_spark.plans.registry import query
from eecs485_p4_mapreduce_spark.sources import load_table



@query(
    "udf_scalar_python",
    oracle="""
    SELECT doc_id,
           CAST(length(text) - length(regexp_replace(lower(text), '[aeiou]', '', 'g'))
                AS BIGINT) AS n_vowels
    FROM documents
    WHERE doc_id < 50
    """,
)
def udf_scalar_python(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time Python UDF (vowel count), deliberately over a pruned
    50-row slice: this is the SLOW path -- one Python call per row, no
    Arrow batching, pickled values both ways.  Exists for API coverage;
    everything it does here is expressible (and oracle'd) as built-ins."""
    from pyspark.sql.types import LongType

    @F.udf(returnType=LongType())
    def n_vowels(text: str) -> int:
        return sum(1 for ch in text.lower() if ch in "aeiou")

    docs = load_table(spark, sf_dir, "documents")
    return docs.filter(F.col("doc_id") < 50).select("doc_id", n_vowels("text").alias("n_vowels"))


@query(
    "udaf_grouped_pandas",
    oracle=f"""
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           round(quantile_cont(n_chars, 0.5), 4) AS median_chars,
           round(quantile_cont(len({DUCK_TOKENS}), 0.5), 4) AS median_tokens
    FROM documents
    GROUP BY lang
    """,
)
def udaf_grouped_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map UDAF via applyInPandas: each language group arrives as
    one pandas frame, the aggregate (medians) is computed in Python, one
    row leaves.  The 100 TB caveat: group size must fit an executor's
    memory -- for unbounded groups use built-in aggregates or pre-reduce."""

    def stats(pdf: pd.DataFrame) -> pd.DataFrame:
        toks = pdf["text"].str.lower().str.split()
        return pd.DataFrame(
            {
                "lang": [pdf["lang"].iloc[0]],
                "n_docs": [len(pdf)],
                "median_chars": [round(float(pdf["n_chars"].median()), 4)],
                "median_tokens": [round(float(toks.map(len).median()), 4)],
            }
        )

    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("lang").applyInPandas(
        stats, schema="lang string, n_docs bigint, median_chars double, median_tokens double"
    )


@query(
    "udtf_chunk_text",
    oracle=f"""
    WITH toks AS (SELECT doc_id, {DUCK_TOKENS} AS toks FROM documents WHERE doc_id < 100),
    n AS (SELECT doc_id, toks, (len(toks) + 9) // 10 AS n_chunks FROM toks)
    SELECT doc_id, CAST(i AS INT) AS chunk_idx,
           array_to_string(toks[10 * i + 1 : 10 * i + 10], ' ') AS chunk,
           CAST(len(toks[10 * i + 1 : 10 * i + 10]) AS INT) AS chunk_len
    FROM n, unnest(range(0, n_chunks)) AS t(i)
    """,
)
def udtf_chunk_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF: one document row in, N chunk rows out (10-token
    chunks -- the LLM-context-windowing shape).  Lateral-join semantics
    with an arbitrary Python generator body; prefer explode(built-in
    expression) when the fan-out is expressible, as the oracle proves it
    is here."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id bigint, chunk_idx int, chunk string, chunk_len int")
    class ChunkText:
        def eval(self, doc_id: int, text: str):  # noqa: D102
            toks = [t for t in text.lower().split() if t]
            for i in range(0, (len(toks) + 9) // 10):
                window = toks[10 * i : 10 * i + 10]
                yield doc_id, i, " ".join(window), len(window)

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    docs.createOrReplaceTempView("sg_docs_chunk")
    spark.udtf.register("sg_chunk_text", ChunkText)
    return spark.sql(
        "SELECT c.* FROM sg_docs_chunk, LATERAL sg_chunk_text(doc_id, text) AS c"
    )


@query(
    "pipeline_training_data",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, source, text,
             len({DUCK_TOKENS}) AS n_words,
             md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
      FROM documents
      WHERE lang IN ('en', 'de')),
    kept AS (
      SELECT * FROM scored
      WHERE n_words >= 20
        AND doc_id = (SELECT MIN(doc_id) FROM scored s2 WHERE s2.fp = scored.fp))
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_words) AS BIGINT) AS total_tokens
    FROM kept
    GROUP BY source
    """,
)
def pipeline_training_data(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end training-data pipeline composite: language filter ->
    quality gate (>= 20 tokens) -> exact dedup on normalized fingerprint
    (keeper = min doc_id) -> per-source token budget.  One declarative
    plan: scan-side filters, a window for the keeper, one final agg --
    the shape of a real corpus-prep job, all Catalyst-optimized."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents").filter(F.col("lang").isin("en", "de"))
    fp = F.md5(F.trim(F.regexp_replace(F.lower("text"), r"\s+", " ")))
    scored = docs.select(
        "doc_id", "source", F.size(tokens("text")).alias("n_words"), fp.alias("fp")
    )
    w = Window.partitionBy("fp")
    kept = (
        scored.withColumn("keeper", F.min("doc_id").over(w))
        .filter((F.col("n_words") >= 20) & (F.col("doc_id") == F.col("keeper")))
    )
    return kept.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_words").cast("bigint").alias("total_tokens"),
    )


@query(
    "udtf_analyze_firsttoks",
    oracle=f"""
    WITH toks AS (SELECT doc_id, {DUCK_TOKENS} AS toks FROM documents WHERE doc_id < 100)
    SELECT doc_id,
           toks[1] AS tok_0, toks[2] AS tok_1, toks[3] AS tok_2,
           CAST(len(toks) AS BIGINT) AS n_total
    FROM toks
    """,
)
def udtf_analyze_firsttoks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Polymorphic UDTF (Spark 4): the static ``analyze`` hook computes
    the OUTPUT SCHEMA from the call's literal argument -- here
    ``sg_first_toks(text, 3)`` produces columns tok_0..tok_2 -- so one
    UDTF serves any width without N hand-written variants.  The
    catalyst-visible schema stays fixed per call site, which is what
    keeps the plan compilable; short rows (absent tokens) yield NULL,
    matching SQL list_extract semantics."""
    from pyspark.sql.functions import udtf
    from pyspark.sql.functions import AnalyzeArgument, AnalyzeResult
    from pyspark.sql.types import LongType, StringType, StructType

    class FirstToks:
        @staticmethod
        def analyze(text: AnalyzeArgument, n: AnalyzeArgument) -> AnalyzeResult:
            schema = StructType()
            for i in range(int(n.value)):
                schema = schema.add(f"tok_{i}", StringType())
            return AnalyzeResult(schema=schema.add("n_total", LongType()))

        def eval(self, text: str, n: int):  # noqa: D102
            toks = [t for t in text.lower().split() if t]
            yield tuple(toks[i] if i < len(toks) else None for i in range(n)) + (
                len(toks),
            )

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    docs.createOrReplaceTempView("sg_docs_ftoks")
    spark.udtf.register("sg_first_toks", udtf(FirstToks))
    return spark.sql(
        "SELECT doc_id, c.* FROM sg_docs_ftoks, LATERAL sg_first_toks(text, 3) AS c"
    )


@query(
    "mapinarrow_vector_norms",
    oracle="""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
    SELECT vec_id,
           round(sqrt(list_inner_product(v, v)), 6) AS l2_norm,
           round(list_max(list_transform(v, x -> abs(x))), 6) AS linf_norm
    FROM e
    """,
)
def mapinarrow_vector_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``mapInArrow``: the zero-copy sibling of mapInPandas -- the UDF
    receives raw ``pyarrow.RecordBatch`` objects (no pandas conversion
    overhead, no object boxing) and returns batches.  The right choice
    when the kernel is already columnar (numpy/Arrow compute), as vector
    math is.  Norm sums run in float64 over 64 elements; BLAS-order
    drift vs the oracle's sequential fold is ~1e-13 and round(6)
    absorbs it (similarity.py precedent)."""
    import numpy as np
    import pyarrow as pa

    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )

    def norms(batches):
        for batch in batches:
            vec_ids = batch.column("vec_id")
            mat = np.vstack(batch.column("v").to_numpy(zero_copy_only=False))
            l2 = np.round(np.sqrt((mat * mat).sum(axis=1)), 6)
            linf = np.round(np.abs(mat).max(axis=1), 6)
            yield pa.RecordBatch.from_arrays(
                [vec_ids, pa.array(l2, type=pa.float64()), pa.array(linf, type=pa.float64())],
                names=["vec_id", "l2_norm", "linf_norm"],
            )

    return e.mapInArrow(norms, schema="vec_id bigint, l2_norm double, linf_norm double")


@query(
    "udaf_grouped_arrow",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(round(value * 1000000) AS BIGINT)) AS BIGINT)
             AS total_micros,
           CAST(MAX(CAST(round(value * 1000000) AS BIGINT)) AS BIGINT)
             AS max_micros
    FROM events GROUP BY event_type
    """,
)
def udaf_grouped_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map UDAF via ``applyInArrow`` (Spark 4's zero-copy sibling
    of applyInPandas): each event_type group arrives as a pyarrow.Table,
    the aggregate is computed with Arrow compute kernels — no pandas
    materialization at all.

    Determinism: doubles are quantized to integer micro-units BEFORE the
    in-group sum (int64 addition is order-independent, unlike float),
    so the Python-side result matches the oracle bitwise regardless of
    Arrow batch order.  round() ties are HALF_EVEN in numpy AND DuckDB's
    round-on-double, and the generator emits <= 6 decimals, so the
    quantization itself is exact.  Same 100 TB caveat as
    udaf_grouped_pandas: a group must fit one executor."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def stats(tbl: pa.Table) -> pa.Table:
        micros = pc.round(pc.multiply(tbl.column("value"), 1_000_000.0))
        micros = pc.cast(micros, pa.int64())
        return pa.table(
            {
                "event_type": [tbl.column("event_type")[0].as_py()],
                "n": pa.array([tbl.num_rows], pa.int64()),
                "total_micros": pa.array([pc.sum(micros).as_py()], pa.int64()),
                "max_micros": pa.array([pc.max(micros).as_py()], pa.int64()),
            }
        )

    e = load_table(spark, sf_dir, "events").select("event_type", "value")
    return e.groupBy("event_type").applyInArrow(
        stats,
        schema="event_type string, n bigint, total_micros bigint, max_micros bigint",
    )


@query(
    "udtf_table_arg_stats",
    oracle="""
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(MAX(n_chars) AS BIGINT) AS max_chars
    FROM documents GROUP BY lang
    """,
)
def udtf_table_arg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF with a TABLE argument (Spark 4): the function consumes
    an entire RELATION — ``my_udtf(TABLE(docs) PARTITION BY lang)`` —
    with the engine routing each partition's rows through one UDTF
    instance (eval per row, terminate per partition).  This is the
    table-in/table-out contract stored procedures and feature
    transformers want, vs the per-row LATERAL UDTFs
    (``udtf_chunk_text``).  The aggregate is integer-only, so the
    Python path is bit-exact against the oracle's plain GROUP BY."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="lang string, n_docs bigint, total_chars bigint, max_chars bigint")
    class LangStats:
        def __init__(self):
            self.lang = None
            self.n = 0
            self.total = 0
            self.mx = 0

        def eval(self, row):  # noqa: ANN001
            self.lang = row["lang"]
            self.n += 1
            self.total += row["n_chars"]
            self.mx = max(self.mx, row["n_chars"])

        def terminate(self):
            if self.lang is not None:
                yield self.lang, self.n, self.total, self.mx

    spark.udtf.register("sg_lang_stats", LangStats)
    load_table(spark, sf_dir, "documents").select(
        "lang", "n_chars"
    ).createOrReplaceTempView("sg_docs_for_udtf")
    return spark.sql(
        "SELECT * FROM sg_lang_stats(TABLE(sg_docs_for_udtf) PARTITION BY lang)"
    )


@query(
    "udf_arrow_optimized",
    oracle="""
    SELECT doc_id,
           CAST(length(text) - length(regexp_replace(lower(text), '[aeiou]', '', 'g'))
                AS BIGINT) AS n_vowels,
           CAST(length(text) AS BIGINT) AS n_chars_txt
    FROM documents
    """,
)
def udf_arrow_optimized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 ARROW-OPTIMIZED Python UDF (``useArrow=True``): the same
    per-row function signature as ``udf_scalar_python``, but values
    cross the JVM/Python boundary as Arrow batches instead of pickled
    rows -- the drop-in upgrade that makes row-style UDFs usable on the
    full table (so this one runs UNPRUNED, unlike the deliberately
    50-row pickled variant).  At 100 TB the remaining gap to a true
    ``pandas_udf`` is per-row Python dispatch, not serialization; this
    query pins that the Arrow path stays available and exact."""
    from pyspark.sql.types import LongType

    @F.udf(returnType=LongType(), useArrow=True)
    def n_vowels(text: str) -> int:
        return sum(1 for ch in text.lower() if ch in "aeiou")

    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        n_vowels("text").alias("n_vowels"),
        F.length("text").cast("bigint").alias("n_chars_txt"),
    )


@query(
    "udx_cogroup_merge_asof",
    oracle="""
    WITH p AS (SELECT user_id, epoch_us(ts) AS t_us, MAX(event_id) AS event_id
               FROM events WHERE event_type = 'purchase'
               GROUP BY user_id, epoch_us(ts)),
    c AS (SELECT user_id, epoch_us(ts) AS t_us, MAX(event_id) AS event_id
          FROM events WHERE event_type = 'click'
          GROUP BY user_id, epoch_us(ts))
    SELECT p.user_id, p.event_id AS purchase_id,
           COALESCE(c.event_id, -1) AS click_id,
           CAST(COALESCE(p.t_us - c.t_us, -1) AS BIGINT) AS gap_us
    FROM p ASOF LEFT JOIN c
      ON p.user_id = c.user_id AND p.t_us >= c.t_us
    """,
)
def udx_cogroup_merge_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cogrouped ``applyInPandas``: purchases and clicks are grouped by
    user on the JVM side, then each user's pair of frames meets in ONE
    Python worker for a pandas ``merge_asof`` (latest click at or
    before each purchase) -- the cogroup API is the escape hatch for
    per-key logic that needs BOTH sides as local frames (custom as-of
    tolerances, curve alignment, per-key model scoring) without a
    row-expanding join.

    Both sides are pre-collapsed to one row per (user, microsecond)
    with MAX(event_id) so the as-of tie is deterministic -- pandas
    keeps the last row among equal keys and DuckDB's ASOF picks among
    ties arbitrarily; unique keys make both irrelevant.  At scale this
    is one user-keyed shuffle per side and Arrow batches into Python;
    the relational spelling (`join_asof_events`) stays the fast path --
    this query pins that the cogroup path agrees with it.
    """
    e = load_table(spark, sf_dir, "events")

    def side(kind: str) -> DataFrame:
        return (
            e.filter(F.col("event_type") == kind)
            .select(
                "user_id",
                F.expr("unix_micros(ts)").alias("t_us"),
                "event_id",
            )
            .groupBy("user_id", "t_us")
            .agg(F.max("event_id").alias("event_id"))
        )

    # Shard-keyed cogroup (64 shards, the stateful-streaming discipline):
    # cogrouping directly on user_id makes one Python invocation per user
    # and per-group overhead dominates (measured 7.3 s at sf0.1);
    # merge_asof's `by=` does the per-user matching inside each shard
    # frame instead (measured ~1 s).
    purchases = side("purchase").withColumn("shard", F.expr("user_id % 64"))
    clicks = side("click").withColumn("shard", F.expr("user_id % 64"))

    def merge_asof_shard(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        left = left.sort_values(["t_us", "event_id"], kind="mergesort")
        right = right.sort_values(["t_us", "event_id"], kind="mergesort").rename(
            columns={"t_us": "c_us", "event_id": "c_id"}
        )
        m = pd.merge_asof(
            left, right, left_on="t_us", right_on="c_us",
            by="user_id", direction="backward",
        )
        return pd.DataFrame(
            {
                "user_id": m["user_id"].values,
                "purchase_id": m["event_id"].values,
                "click_id": m["c_id"].fillna(-1).astype("int64").values,
                "gap_us": (m["t_us"] - m["c_us"]).fillna(-1).astype("int64").values,
            }
        )

    return (
        purchases.groupBy("shard")
        .cogroup(clicks.groupBy("shard"))
        .applyInPandas(
            lambda l, r: merge_asof_shard(l, r),
            schema="user_id bigint, purchase_id bigint, click_id bigint, gap_us bigint",
        )
    )
