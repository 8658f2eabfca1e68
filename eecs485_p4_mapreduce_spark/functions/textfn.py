"""Text column expressions.

Tokenization matches the reference's mapper contract -- whitespace split +
lowercase (reference tests/testdata/exec/wc_map.sh:12: ``tr '[ \\t]' '\\n' |
tr upper lower``) -- expressed as JVM-side built-ins so the hot path stays
inside whole-stage codegen (no Python UDF).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# DuckDB spelling of :func:`tokens` -- THE oracle-side tokenizer.  Every
# module's oracle SQL must use this one constant; a second copy that
# drifts breaks Spark-vs-oracle parity for that module.
DUCK_TOKENS = "list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '')"


def tokens(col: Column | str) -> Column:
    """Lowercased whitespace tokens, empties dropped.

    array<string>; DuckDB twin:
    ``list_filter(string_split_regex(lower(x), '\\s+'), t -> t <> '')``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.lower(c), r"\s+"), lambda t: t != "")


def shingles(col: Column | str, k: int = 5) -> Column:
    """Distinct character k-shingles of the lowercased text.

    Near-dup feature set (MinHash/Jaccard input). Built from
    ``sequence``/``transform``/``substring`` so shingling runs JVM-side;
    shingle i = substring(lower(text), i, k), i in 1..max(len-k+1, 1).
    """
    c = F.lower(F.col(col) if isinstance(col, str) else col)
    n = F.greatest(F.length(c) - F.lit(k - 1), F.lit(1))
    return F.array_distinct(
        F.transform(F.sequence(F.lit(1), n), lambda i: F.substring(c, i, F.lit(k)))
    )


def shingles_sql(text_expr: str, k: int = 5, *, duckdb: bool = False) -> str:
    """SQL twin of :func:`shingles` (DuckDB uses list_* names)."""
    lc = f"lower({text_expr})"
    if duckdb:
        return (
            f"list_distinct(list_transform(range(1, greatest(length({lc}) - {k - 1}, 1) + 1),"
            f" i -> substring({lc}, i, {k})))"
        )
    return (
        f"array_distinct(transform(sequence(1, greatest(length({lc}) - {k - 1}, 1)),"
        f" i -> substring({lc}, i, {k})))"
    )
