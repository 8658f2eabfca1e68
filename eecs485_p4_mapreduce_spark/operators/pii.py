"""PII detection / redaction over the documents corpus (SURVEY.md §2.C ⊕
text-analysis family).

The compliance stage every LLM training pipeline runs before release:
find personally identifiable spans (emails, phone numbers, SSN-shaped
ids) and rewrite them to typed placeholders.  Both stages are pure
scan-side regular-expression projections (JVM regex inside whole-stage
codegen — no Python boundary, no shuffle except the final per-source
aggregate), so they scale with the scan at 100 TB.

Determinism across engines: the synthetic corpus contains no reliable
PII, so each document is AUGMENTED with deterministic PII spans built
from ``doc_id`` by IDENTICAL string arithmetic in Spark and DuckDB; the
detectors then run over the identical augmented text.  Patterns avoid
engine-specific syntax (Java regex vs RE2 agree on character classes,
bounded repetition, and ``\\b`` word boundaries; patterns are passed as
API literals, never through SQL string escaping).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from eecs485_p4_mapreduce_spark.plans.registry import query
from eecs485_p4_mapreduce_spark.sources import load_table

EMAIL_PAT = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_PAT = r"\b555-[0-9]{4}\b"
SSN_PAT = r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b"

# identical augmentation, spelled once per engine
_AUG_DUCK = (
    "text || ' contact user' || CAST(doc_id AS VARCHAR)"
    " || '@example.com or admin' || CAST(doc_id AS VARCHAR)"
    " || '@test.org tel 555-'"
    " || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')"
    " || ' ssn 123-45-'"
    " || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')"
)


def _aug_spark() -> F.Column:
    did = F.col("doc_id").cast("string")
    tail = F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0")
    return F.concat(
        F.col("text"),
        F.lit(" contact user"), did,
        F.lit("@example.com or admin"), did,
        F.lit("@test.org tel 555-"), tail,
        F.lit(" ssn 123-45-"), tail,
    )


@query(
    "pii_detect_counts",
    oracle=f"""
    WITH a AS (SELECT doc_id, source, {_AUG_DUCK} AS aug FROM documents)
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(len(regexp_extract_all(aug, '{EMAIL_PAT}'))) AS BIGINT)
             AS n_emails,
           CAST(SUM(len(regexp_extract_all(aug, '{PHONE_PAT}'))) AS BIGINT)
             AS n_phones,
           CAST(SUM(len(regexp_extract_all(aug, '{SSN_PAT}'))) AS BIGINT)
             AS n_ssns
    FROM a GROUP BY source
    """,
)
def pii_detect_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII span counting per source: non-overlapping leftmost regex
    matches for email / phone / SSN shapes, summed per source.  One
    scan, three ``regexp_count`` projections inside codegen, one tiny
    aggregate — the detection pass is IO-bound at any corpus size.  The
    oracle counts the same spans with RE2's ``regexp_extract_all`` over
    the identically augmented text."""
    d = load_table(spark, sf_dir, "documents").select(
        "source", _aug_spark().alias("aug")
    )
    return d.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum(F.regexp_count("aug", F.lit(EMAIL_PAT))).cast("bigint").alias("n_emails"),
        F.sum(F.regexp_count("aug", F.lit(PHONE_PAT))).cast("bigint").alias("n_phones"),
        F.sum(F.regexp_count("aug", F.lit(SSN_PAT))).cast("bigint").alias("n_ssns"),
    )


@query(
    "pii_redact_audit",
    oracle=f"""
    WITH a AS (SELECT doc_id, source, {_AUG_DUCK} AS aug FROM documents),
    r AS (SELECT doc_id, source,
                 regexp_replace(regexp_replace(regexp_replace(aug,
                     '{EMAIL_PAT}', '[EMAIL]', 'g'),
                     '{PHONE_PAT}', '[PHONE]', 'g'),
                     '{SSN_PAT}', '[SSN]', 'g') AS red,
                 aug
          FROM a)
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(len(aug) - len(red)) AS BIGINT) AS bytes_removed,
           MIN(md5(red)) AS first_digest,
           CAST(SUM(len(regexp_extract_all(red, '{EMAIL_PAT}'))
                    + len(regexp_extract_all(red, '{PHONE_PAT}'))
                    + len(regexp_extract_all(red, '{SSN_PAT}'))) AS BIGINT)
             AS n_residual
    FROM r GROUP BY source
    """,
)
def pii_redact_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction with a built-in audit: rewrite every detected span
    to a typed placeholder (email -> phone -> SSN, fixed order so both
    engines transform identically), then PROVE the rewrite by re-running
    all three detectors over the redacted text — ``n_residual`` must be
    0 and is part of the checked result, as is a content digest of the
    redacted output.  Replacement, like detection, is scan-side JVM
    regex; the redacted text never shuffles (only per-source counters
    and one min-digest do)."""
    d = load_table(spark, sf_dir, "documents").select(
        "source", _aug_spark().alias("aug")
    )
    red = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("aug"), F.lit(EMAIL_PAT), F.lit("[EMAIL]")),
            F.lit(PHONE_PAT),
            F.lit("[PHONE]"),
        ),
        F.lit(SSN_PAT),
        F.lit("[SSN]"),
    )
    r = d.select("source", "aug", red.alias("red"))
    residual = (
        F.regexp_count("red", F.lit(EMAIL_PAT))
        + F.regexp_count("red", F.lit(PHONE_PAT))
        + F.regexp_count("red", F.lit(SSN_PAT))
    )
    return r.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum(F.length("aug") - F.length("red")).cast("bigint").alias("bytes_removed"),
        F.min(F.md5(F.encode("red", "UTF-8"))).alias("first_digest"),
        F.sum(residual).cast("bigint").alias("n_residual"),
    )
