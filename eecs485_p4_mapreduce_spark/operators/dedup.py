"""Deduplication operators (SURVEY.md §2.C ⊕): exact, MinHash+LSH,
SimHash, n-gram Jaccard, embedding-cosine near-dup.

Design for 100 TB:
- Exact dedup shuffles a 32-byte md5, never the document body.
- MinHash signatures are computed scan-side as pure column expressions
  (transform/array_min over shingles -- no UDF, no shuffle); only the
  (band, band_hash) pairs shuffle, so the join key space is tiny and the
  candidate join is an equi-join AQE can handle skew on.
- SimHash fingerprints likewise reduce each document to 32 bits scan-side.
- The all-pairs verification joins here (n-gram Jaccard, embedding cosine)
  are the *verify* stage one runs on LSH candidates; at test scale we run
  them globally so the DuckDB oracle can check them exactly.

Cross-engine determinism: every hash is md5 (identical in Spark and
DuckDB); min/fraction reductions over unordered sets are order-insensitive,
so Spark and DuckDB agree bitwise.  Spark-side expressions use the SQL
dialect (selectExpr/F.expr); the oracle uses DuckDB's list_* spellings of
the same expressions (1-based element_at/list_extract in both).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from eecs485_p4_mapreduce_spark.plans.registry import query
from eecs485_p4_mapreduce_spark.sources import load_table

# ---------------------------------------------------------------- exact

@query(
    "dedup_exact",
    oracle="""
    SELECT md5(text) AS text_hash, CAST(MIN(doc_id) AS BIGINT) AS keeper,
           CAST(COUNT(*) AS BIGINT) AS n_copies
    FROM documents
    GROUP BY 1
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup via hash-groupBy on md5(text): keeper = min doc_id.
    Equivalent to dropDuplicates('text') but shuffles only the hash."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy(F.md5("text").alias("text_hash")).agg(
        F.min("doc_id").cast("bigint").alias("keeper"),
        F.count("*").cast("bigint").alias("n_copies"),
    )


# ------------------------------------------------------- minhash + LSH

_K = 16          # minhash signature length
_BANDS = 8       # LSH bands (r = _K // _BANDS = 2 rows per band)
_R = _K // _BANDS
_SHINGLE = 8     # char-shingle width

# Spark SQL / DuckDB twins for: distinct char shingles of lowered text.
_SH_SPARK = (
    f"array_distinct(transform(sequence(1, greatest(length(lower(text)) - {_SHINGLE - 1}, 1)),"
    f" i -> substring(lower(text), i, {_SHINGLE})))"
)
_SH_DUCK = (
    f"list_distinct(list_transform(range(1, greatest(length(lower(text)) - {_SHINGLE - 1}, 1) + 1),"
    f" i -> substring(lower(text), i, {_SHINGLE})))"
)

# signature[s] = min over shingles of md5(s || '|' || shingle), s = 0.._K-1
_SIG_DUCK = (
    f"list_transform(range(0, {_K}),"
    f" s -> list_min(list_transform(sh, g -> md5(concat(CAST(s AS VARCHAR), '|', g)))))"
)


def _bands_sql(idx_fn: str, seq: str) -> str:
    """band b (1.._BANDS) hash = md5(concat of its r signature entries)."""
    parts = ", ".join(
        f"md5(concat({', '.join(f'{idx_fn}(sig, (b - 1) * {_R} + {j + 1})' for j in range(_R))}))"
        for _ in (0,)
    )
    return f"transform({seq}, b -> {parts})" if idx_fn == "element_at" else \
        f"list_transform({seq}, b -> {parts})"


_BANDS_SPARK = _bands_sql("element_at", f"sequence(1, {_BANDS})")
_BANDS_DUCK = _bands_sql("list_extract", f"range(1, {_BANDS} + 1)")

# est similarity = fraction of equal signature entries (1-based indexing)
_EST_SPARK = (
    f"cast(size(filter(sequence(1, {_K}),"
    f" i -> element_at(sig_a, i) = element_at(sig_b, i))) as double) / {_K}"
)
_EST_DUCK = (
    f"CAST(len(list_filter(range(1, {_K} + 1),"
    f" i -> list_extract(sig_a, i) = list_extract(sig_b, i))) AS DOUBLE) / {_K}"
)


@query(
    "dedup_minhash_lsh",
    oracle=f"""
    WITH sh AS MATERIALIZED (SELECT doc_id, {_SH_DUCK} AS sh FROM documents),
    sig AS MATERIALIZED (SELECT doc_id, {_SIG_DUCK} AS sig FROM sh),
    withbands AS MATERIALIZED (SELECT doc_id, sig, {_BANDS_DUCK} AS bands FROM sig),
    banded AS (
      SELECT doc_id, sig, b, list_extract(bands, b) AS band_hash
      FROM withbands, unnest(range(1, {_BANDS} + 1)) AS t(b)),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
             a.sig AS sig_a, b.sig AS sig_b
      FROM banded a JOIN banded b
        ON a.b = b.b AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id)
    SELECT doc_a, doc_b, {_EST_DUCK} AS est_jaccard
    FROM cand
    """,
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(16) + LSH(8 bands x 2): shingle -> minhash -> band ->
    bucket-join -> estimated Jaccard.

    The signature is computed with ONE shuffle: explode (doc x shingle x
    seed), md5, then a hash aggregate taking the per-seed min -- a
    conditional-min pivot, so partial aggregation collapses the exploded
    rows map-side.  (A pure-expression version -- transform over seeds of
    array_min over shingles -- is semantically identical but Catalyst's
    projection collapse inlines it into every downstream reference,
    recomputing 16x|shingles| md5s per band row; the aggregate form
    materializes signatures at the exchange instead.)  Only
    (band, band_hash, doc_id, sig) rows shuffle for the candidate
    equi-join; at 100 TB its key cardinality ~= corpus size * bands.
    """
    docs = load_table(spark, sf_dir, "documents")
    ex = docs.select("doc_id", F.explode(F.expr(_SH_SPARK)).alias("g"))
    exs = ex.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(_K - 1))).alias("s"),
        "g",
    ).select("doc_id", "s", F.md5(F.concat_ws("|", F.col("s"), F.col("g"))).alias("h"))
    sig_df = exs.groupBy("doc_id").agg(
        F.array(*[F.min(F.when(F.col("s") == i, F.col("h"))) for i in range(_K)]).alias("sig")
    )
    sig = (
        sig_df.withColumn("bands", F.expr(_BANDS_SPARK))
        .select("doc_id", "sig", F.posexplode("bands").alias("b0", "band_hash"))
        .select("doc_id", "sig", (F.col("b0") + 1).alias("b"), "band_hash")
    )
    a = sig.select(
        F.col("doc_id").alias("doc_a"), F.col("sig").alias("sig_a"), "b", "band_hash"
    )
    b = sig.select(
        F.col("doc_id").alias("doc_b"), F.col("sig").alias("sig_b"), "b", "band_hash"
    )
    cand = (
        a.join(b, ["b", "band_hash"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "sig_a", "sig_b")
        .distinct()
    )
    return cand.select("doc_a", "doc_b", F.expr(_EST_SPARK).alias("est_jaccard"))


# ------------------------------------------------------------- simhash

_BITS = 32

# 32-bit simhash as a '0'/'1' string: bit j of md5(token) = bit (3 - j%4)
# of hex digit j/4; fingerprint bit = majority vote over tokens.
def _simhash_sql(dialect: str) -> str:
    if dialect == "spark":
        size, flt, tr, join_fn, pos, seq = (
            "size", "filter", "transform", "array_join", "instr",
            f"sequence(0, {_BITS - 1})",
        )
    else:
        size, flt, tr, join_fn, pos, seq = (
            "len", "list_filter", "list_transform", "array_to_string", "strpos",
            f"range(0, {_BITS})",
        )
    # NB: CAST(double AS INT) truncates in Spark but ROUNDS in DuckDB --
    # every division here goes through floor() before casting.
    bit = (
        f"(CAST(floor(({pos}('0123456789abcdef', substring(h, CAST(floor(j / 4) AS INT) + 1, 1)) - 1)"
        f" / power(2, 3 - j % 4)) AS INT) % 2)"
    )
    ones = f"{size}({flt}(hs, h -> {bit} = 1))"
    return (
        f"{join_fn}({tr}({seq}, j -> CASE WHEN 2 * {ones} > {size}(hs) THEN '1' ELSE '0' END), '')"
    )


_HAM_SPARK = (
    f"size(filter(sequence(1, {_BITS}),"
    f" i -> substring(fp_a, i, 1) <> substring(fp_b, i, 1)))"
)
_HAM_DUCK = (
    f"len(list_filter(range(1, {_BITS} + 1),"
    f" i -> substring(fp_a, i, 1) <> substring(fp_b, i, 1)))"
)

_TOK_SPARK = "filter(split(lower(text), '\\\\s+'), t -> t <> '')"
_TOK_DUCK = "list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '')"


@query(
    "dedup_simhash",
    oracle=f"""
    WITH hs AS (SELECT doc_id,
                       list_transform({_TOK_DUCK}, t -> md5(t)) AS hs
                FROM documents),
    fp AS (SELECT doc_id, {_simhash_sql('duckdb')} AS fp FROM hs)
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST({_HAM_DUCK.replace('fp_a', 'a.fp').replace('fp_b', 'b.fp')} AS BIGINT) AS hamming
    FROM fp a JOIN fp b ON a.doc_id < b.doc_id
    WHERE {_HAM_DUCK.replace('fp_a', 'a.fp').replace('fp_b', 'b.fp')} <= 6
    """,
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash(32) near-dup: majority-vote fingerprint over md5(token)
    bits, then pairs within Hamming distance 6.

    Fingerprints are scan-side expressions; the all-pairs comparison here
    is the verify stage (at 100 TB, candidates come from banding the
    fingerprint into 4x8-bit keys first -- same LSH shape as MinHash).
    """
    docs = load_table(spark, sf_dir, "documents")
    fp = (
        docs.withColumn("hs", F.expr(f"transform({_TOK_SPARK}, t -> md5(t))"))
        .select("doc_id", F.expr(_simhash_sql("spark")).alias("fp"))
    )
    a = fp.select(F.col("doc_id").alias("doc_a"), F.col("fp").alias("fp_a"))
    b = fp.select(F.col("doc_id").alias("doc_b"), F.col("fp").alias("fp_b"))
    ham = F.expr(_HAM_SPARK)
    return (
        a.join(b, F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", ham.cast("bigint").alias("hamming"))
        .filter(F.col("hamming") <= 6)
    )


# ------------------------------------------------- n-gram exact Jaccard

_NG_SPARK = (
    "array_distinct(transform(sequence(1, greatest(size(toks) - 2, 1)),"
    " i -> concat(element_at(toks, i), ' ', element_at(toks, least(i + 1, size(toks))),"
    " ' ', element_at(toks, least(i + 2, size(toks))))))"
)
_NG_DUCK = (
    "list_distinct(list_transform(range(1, greatest(len(toks) - 2, 1) + 1),"
    " i -> concat(list_extract(toks, i), ' ', list_extract(toks, least(i + 1, len(toks))),"
    " ' ', list_extract(toks, least(i + 2, len(toks))))))"
)


@query(
    "dedup_ngram_jaccard",
    oracle=f"""
    WITH toks AS (SELECT doc_id, {_TOK_DUCK} AS toks FROM documents),
    ng AS (SELECT doc_id, {_NG_DUCK} AS ng FROM toks),
    sizes AS (SELECT doc_id, len(ng) AS sz FROM ng),
    ex AS (SELECT doc_id, unnest(ng) AS g FROM ng),
    inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
              FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id
              GROUP BY 1, 2)
    SELECT doc_a, doc_b,
           CAST(i AS DOUBLE) / (sa.sz + sb.sz - i) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE CAST(i AS DOUBLE) / (sa.sz + sb.sz - i) >= 0.03
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact word-3-gram Jaccard similarity pairs (>= 0.03).

    The inverted-index join (explode n-grams, equi-join on gram) is the
    exact verify stage; n-grams are far rarer than tokens so the join
    fan-out stays bounded.  At 100 TB you run this only on LSH candidate
    pairs instead of globally.
    """
    docs = load_table(spark, sf_dir, "documents")
    ng = (
        docs.withColumn("toks", F.expr(_TOK_SPARK))
        .withColumn("ng", F.expr(_NG_SPARK))
        .select("doc_id", "ng")
    )
    sizes = ng.select("doc_id", F.size("ng").alias("sz"))
    ex = ng.select("doc_id", F.explode("ng").alias("g"))
    a = ex.select(F.col("doc_id").alias("doc_a"), "g")
    b = ex.select(F.col("doc_id").alias("doc_b"), "g")
    inter = (
        a.join(b, "g")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("i"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sza"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("szb"))
    jac = F.col("i").cast("double") / (F.col("sza") + F.col("szb") - F.col("i"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= 0.03)
    )


# ------------------------------------------- embedding cosine near-dup

@query(
    "dedup_embedding_cosine",
    oracle="""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           round(list_inner_product(a.v, b.v)
                 / (sqrt(list_inner_product(a.v, a.v)) * sqrt(list_inner_product(b.v, b.v))),
                 6) AS cosine
    FROM e a JOIN e b ON a.vec_id < b.vec_id
    WHERE list_inner_product(a.v, b.v)
          / (sqrt(list_inner_product(a.v, a.v)) * sqrt(list_inner_product(b.v, b.v))) >= 0.35
    """,
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup: pairs with cosine >= 0.35 (brute-force verify
    stage; candidates at scale come from the LSH bucketing in
    operators/similarity.py).  Dot products fold left-to-right in double,
    matching DuckDB's list_inner_product bitwise; round(6) guards the
    last bit."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    dot = "aggregate(zip_with(va, vb, (x, y) -> x * y), cast(0.0 as double), (acc, x) -> acc + x)"
    norm = lambda c: f"sqrt(aggregate(zip_with({c}, {c}, (x, y) -> x * y), cast(0.0 as double), (acc, x) -> acc + x))"  # noqa: E731
    a = emb.select(F.col("vec_id").alias("vec_a"), F.col("v").alias("va"))
    b = emb.select(F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"))
    cos = F.expr(f"{dot} / ({norm('va')} * {norm('vb')})")
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .withColumn("cos_raw", cos)
        .filter(F.col("cos_raw") >= 0.35)
        .select("vec_a", "vec_b", F.round("cos_raw", 6).alias("cosine"))
    )
