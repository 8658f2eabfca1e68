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
bounded repetition, and ``\\b`` word boundaries).  On the SPARK side
patterns travel as API literals (``F.lit``), never through SQL string
escaping; the DuckDB oracle embeds them in single-quoted SQL literals
via f-string, so the guard below rejects any future pattern containing
a quote or backslash-quote hazard before it can silently corrupt the
oracle SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from eecs485_p4_mapreduce_spark.plans.registry import query
from eecs485_p4_mapreduce_spark.sources import load_table

EMAIL_PAT = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_PAT = r"\b555-[0-9]{4}\b"
SSN_PAT = r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b"

for _pat in (EMAIL_PAT, PHONE_PAT, SSN_PAT):
    # the oracle f-strings single-quote these; a quote inside would
    # splice the SQL text (module docstring, "Determinism" section)
    assert "'" not in _pat, f"PII pattern not SQL-literal-safe: {_pat!r}"

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


# ---------------------------------------------------------------------------
# Structured identifiers: checksum-validated PII (round-5 verdict item 4)
# ---------------------------------------------------------------------------
# Regex alone over-detects structured identifiers — any 16-digit run
# "looks like" a credit card.  Real pipelines validate the CHECKSUM
# before redacting/reporting: Luhn mod-10 for payment cards, ISO 13616
# mod-97 for IBANs.  Both are expressible as pure int64 folds over the
# candidate's digits (the quality_benford_digits integer-arithmetic
# discipline), so detection AND validation stay inside whole-stage
# codegen on the scan — no Python, no shuffle except the tiny final
# aggregate.  Candidates are augmented deterministically from doc_id
# (half/10% valid by construction) with the same both-engines string
# arithmetic as the regex PII pair above.

CARD_PAT = r"\b[0-9]{16}\b"
IBAN_PAT = r"\bDE[0-9]{20}\b"

for _pat in (CARD_PAT, IBAN_PAT):
    assert "'" not in _pat, f"PII pattern not SQL-literal-safe: {_pat!r}"

# Luhn mod-10 over one 16-digit candidate string `c` (doubling every
# second digit from the right; 16 fixed length makes parity static).
# Both spellings are the same fold; `div`/`//` is the only dialect gap.
_LUHN_STEP = (
    "CASE WHEN (16 - i) % 2 = 1"
    " THEN (2*(ascii(substring(c, i, 1))-48)) {div} 10"
    "    + (2*(ascii(substring(c, i, 1))-48)) % 10"
    " ELSE ascii(substring(c, i, 1))-48 END"
)
_LUHN_VALID_SPARK = (
    "aggregate(sequence(1, 16), cast(0 as bigint), (s, i) -> s + "
    + _LUHN_STEP.format(div="div")
    + ") % 10 = 0"
)
_LUHN_VALID_DUCK = (
    "list_sum(list_transform(range(1, 17), i -> "
    + _LUHN_STEP.format(div="//")
    + ")) % 10 = 0"
)


@query(
    "pii_luhn_creditcard",
    oracle=f"""
    WITH a AS (
      SELECT doc_id, source,
             {_AUG_DUCK} || ' card '
               || lpad(CAST(doc_id % 100000 AS VARCHAR), 5, '0')
               || lpad(CAST((doc_id * 48271) % 100000 AS VARCHAR), 5, '0')
               || lpad(CAST((doc_id * 69621) % 100000 AS VARCHAR), 5, '0')
               || CAST(doc_id % 10 AS VARCHAR) AS aug
      FROM documents),
    per_doc AS (
      SELECT source,
             len(regexp_extract_all(aug, '{CARD_PAT}')) AS n_cand,
             coalesce(list_sum(list_transform(
               regexp_extract_all(aug, '{CARD_PAT}'),
               c -> CASE WHEN {_LUHN_VALID_DUCK} THEN 1 ELSE 0 END)), 0)
               AS n_valid
      FROM a)
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_cand) AS BIGINT) AS n_candidates,
           CAST(SUM(n_valid) AS BIGINT) AS n_luhn_valid
    FROM per_doc GROUP BY source
    """,
)
def pii_luhn_creditcard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Checksum-validated payment-card detection: every 16-digit run is
    a CANDIDATE; only runs passing the Luhn mod-10 check count as card
    numbers (~1 in 10 of the synthetic candidates, by construction:
    the appended check digit is ``doc_id % 10``).  The whole pass is
    scan-side codegen — regexp_extract_all for candidates, a nested
    int64 fold per candidate for the checksum, one per-source aggregate
    — so like the regex pair it stays IO-bound at 100 TB.  No explode:
    the per-candidate fold runs INSIDE an aggregate() over the extracted
    array (the InferFiltersFromGenerate hazard in CLAUDE.md never
    arises)."""
    did = F.col("doc_id")
    aug = F.concat(
        _aug_spark(),
        F.lit(" card "),
        F.lpad((did % 100000).cast("string"), 5, "0"),
        F.lpad(((did * 48271) % 100000).cast("string"), 5, "0"),
        F.lpad(((did * 69621) % 100000).cast("string"), 5, "0"),
        (did % 10).cast("string"),
    )
    d = load_table(spark, sf_dir, "documents").select(
        "source", aug.alias("aug")
    )
    cands = "regexp_extract_all(aug, '\\\\b[0-9]{16}\\\\b', 0)"
    return (
        d.select(
            "source",
            F.expr(f"size({cands})").alias("n_cand"),
            F.expr(
                f"aggregate({cands}, cast(0 as bigint),"
                f" (acc, c) -> acc + CASE WHEN {_LUHN_VALID_SPARK}"
                " THEN 1 ELSE 0 END)"
            ).alias("n_valid"),
        )
        .groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_cand").cast("bigint").alias("n_candidates"),
            F.sum("n_valid").cast("bigint").alias("n_luhn_valid"),
        )
    )


# ISO 13616 rearrangement fold for a 'DE' + 2-check + 18-digit BBAN
# candidate `c`: digits(BBAN) || '1314' (D=13, E=14) || check, folded
# (acc*10 + d) % 97; valid iff the fold lands on 1.
_IBAN_REARR = "substring(c, 5, 18) || '1314' || substring(c, 3, 2)"
_IBAN_REARR_SPARK = "concat(substring(c, 5, 18), '1314', substring(c, 3, 2))"
_IBAN_VALID_SPARK = (
    f"aggregate(sequence(1, 24), cast(0 as bigint), (acc, i) ->"
    f" (acc*10 + (ascii(substring({_IBAN_REARR_SPARK}, i, 1))-48)) % 97) = 1"
)
_IBAN_VALID_DUCK = (
    f"list_reduce(list_prepend(0, list_transform(range(1, 25), i ->"
    f" ascii(substring({_IBAN_REARR}, i, 1))-48)),"
    " (acc, dg) -> (acc*10 + dg) % 97) = 1"
)


@query(
    "pii_iban_mod97",
    oracle=f"""
    WITH b AS (
      SELECT doc_id, source, text,
             lpad(CAST(doc_id % 1000000000 AS VARCHAR), 9, '0')
               || lpad(CAST((doc_id * 7919) % 1000000000 AS VARCHAR), 9, '0')
               AS bban
      FROM documents),
    r AS (
      SELECT doc_id, source, text, bban,
             98 - list_reduce(list_prepend(0, list_transform(range(1, 25),
                    i -> ascii(substring(bban || '131400', i, 1))-48)),
                  (acc, dg) -> (acc*10 + dg) % 97) AS correct
      FROM b),
    a AS (
      SELECT doc_id, source,
             text || ' iban DE'
               || lpad(CAST(CASE WHEN (doc_id // 2) % 2 = 0 THEN correct
                                 WHEN correct < 98 THEN correct + 1
                                 ELSE 2 END AS VARCHAR), 2, '0')
               || bban AS aug
      FROM r),
    per_doc AS (
      SELECT source,
             len(regexp_extract_all(aug, '{IBAN_PAT}')) AS n_cand,
             coalesce(list_sum(list_transform(
               regexp_extract_all(aug, '{IBAN_PAT}'),
               c -> CASE WHEN {_IBAN_VALID_DUCK} THEN 1 ELSE 0 END)), 0)
               AS n_valid
      FROM a)
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_cand) AS BIGINT) AS n_ibans,
           CAST(SUM(n_valid) AS BIGINT) AS n_mod97_valid
    FROM per_doc GROUP BY source
    """,
)
def pii_iban_mod97(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Checksum-validated IBAN detection (ISO 13616 mod-97): augment
    each document with a DE-prefixed IBAN whose check digits are
    CORRECT for alternating doc_id pairs and off-by-one otherwise
    (``doc_id div 2`` parity — mixes valid/invalid WITHIN each source,
    whose doc_ids share low-bit parity), then detect
    candidates by regex and validate by the rearrangement fold — all
    int64 arithmetic inside codegen, exactly half the candidates valid
    by construction (which the oracle independently recomputes).  The
    check-digit derivation itself (98 - fold(bban || '131400')) runs in
    BOTH engines, so a fold discrepancy would fail the hash match even
    before the validator disagreed."""
    did = F.col("doc_id")
    d = (
        load_table(spark, sf_dir, "documents")
        .withColumn(
            "bban",
            F.concat(
                F.lpad((did % 1000000000).cast("string"), 9, "0"),
                F.lpad(((did * 7919) % 1000000000).cast("string"), 9, "0"),
            ),
        )
        .withColumn(
            "correct",
            F.lit(98)
            - F.expr(
                "aggregate(sequence(1, 24), cast(0 as bigint), (acc, i) ->"
                " (acc*10 + (ascii(substring(concat(bban, '131400'), i, 1))-48)) % 97)"
            ),
        )
        .select(
            "source",
            F.concat(
                F.col("text"),
                F.lit(" iban DE"),
                F.lpad(
                    F.when(F.expr("doc_id div 2") % 2 == 0, F.col("correct"))
                    .when(F.col("correct") < 98, F.col("correct") + 1)
                    .otherwise(F.lit(2))
                    .cast("string"),
                    2,
                    "0",
                ),
                F.col("bban"),
            ).alias("aug"),
        )
    )
    cands = "regexp_extract_all(aug, '\\\\bDE[0-9]{20}\\\\b', 0)"
    return (
        d.select(
            "source",
            F.expr(f"size({cands})").alias("n_cand"),
            F.expr(
                f"aggregate({cands}, cast(0 as bigint),"
                f" (acc, c) -> acc + CASE WHEN {_IBAN_VALID_SPARK}"
                " THEN 1 ELSE 0 END)"
            ).alias("n_valid"),
        )
        .groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_cand").cast("bigint").alias("n_ibans"),
            F.sum("n_valid").cast("bigint").alias("n_mod97_valid"),
        )
    )


@query(
    "pii_redaction_density_deciles",
    oracle=f"""
    WITH a AS (SELECT doc_id, source, {_AUG_DUCK} AS aug FROM documents),
    r AS (SELECT doc_id,
                 len(aug) - len(regexp_replace(regexp_replace(regexp_replace(aug,
                     '{EMAIL_PAT}', '[EMAIL]', 'g'),
                     '{PHONE_PAT}', '[PHONE]', 'g'),
                     '{SSN_PAT}', '[SSN]', 'g')) AS bytes_removed
          FROM a),
    t AS (SELECT doc_id, bytes_removed,
                 NTILE(10) OVER (ORDER BY bytes_removed, doc_id) AS decile
          FROM r)
    SELECT decile,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(MIN(bytes_removed) AS BIGINT) AS min_removed,
           CAST(MAX(bytes_removed) AS BIGINT) AS max_removed,
           CAST(SUM(bytes_removed) AS BIGINT) AS total_removed
    FROM t GROUP BY decile
    """,
)
def pii_redaction_density_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document redaction-density deciles: how much text the PII
    pass removes per document, deciled over the whole corpus — the
    audit a release manager reads to find sources whose documents are
    ABNORMALLY dense in PII (top decile) before shipping a corpus.

    The global decile is the classic unpartitioned-window trap; it runs
    through ``functions/ranking.py`` (range-partition + partition-offset
    + the exact ANSI ntile rule in int64), ordered by the INTEGER
    bytes_removed with doc_id tie-break — the no-raw-float-ORDER-BY
    ranking convention."""
    from eecs485_p4_mapreduce_spark.functions.ranking import (
        ntile_from_rank,
        with_global_rank,
    )

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", _aug_spark().alias("aug")
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
    per_doc = d.select(
        "doc_id",
        (F.length("aug") - F.length(red)).cast("bigint").alias("bytes_removed"),
    )
    ranked = with_global_rank(per_doc, ["bytes_removed", "doc_id"])
    return (
        ranked.select(
            "bytes_removed", ntile_from_rank("_rk", "_n", 10).alias("decile")
        )
        .groupBy("decile")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.min("bytes_removed").cast("bigint").alias("min_removed"),
            F.max("bytes_removed").cast("bigint").alias("max_removed"),
            F.sum("bytes_removed").cast("bigint").alias("total_removed"),
        )
    )
