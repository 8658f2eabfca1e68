"""Hyperplane-LSH expression builders shared by the ANN queries
(operators/similarity.py) and the embedding near-dup gate
(operators/dedup.py).

Lives under functions/ (no registry import) so either operator module can
be imported first without a decoration-time circular import — the @query
decorators build their DuckDB oracle strings at module-import time, and
both modules need these templates then.

Hyperplane weights derive from md5 so Spark and DuckDB compute the exact
same reals: w[h][d] = (hexval(md5('h_d')[0]) / 15) - 0.5.
"""

from __future__ import annotations

H = 8    # random hyperplanes -> 8-bit bucket (~1/256 of the table per probe)
D = 64   # embedding dim


def w_sql(dialect: str, h: str, d: str) -> str:
    """Weight of hyperplane ``h`` at dimension ``d`` (same value in both
    engines; md5 is the shared deterministic source of randomness)."""
    pos = "instr" if dialect == "spark" else "strpos"
    cat = f"concat(cast({h} as string), '_', cast({d} as string))" if dialect == "spark" \
        else f"concat(CAST({h} AS VARCHAR), '_', CAST({d} AS VARCHAR))"
    return f"(({pos}('0123456789abcdef', substring(md5({cat}), 1, 1)) - 1) / 15.0 - 0.5)"


def bucket_sql(dialect: str) -> str:
    """Sign bitstring (one char per hyperplane): sign of v . w."""
    if dialect == "spark":
        tr, join_fn, seq_h, seq_d, idx = (
            "transform", "array_join", f"sequence(0, {H - 1})", f"sequence(1, {D})",
            "element_at",
        )
        fold = "aggregate({arr}, cast(0.0 as double), (acc, x) -> acc + x)"
    else:
        tr, join_fn, seq_h, seq_d, idx = (
            "list_transform", "array_to_string", f"range(0, {H})", f"range(1, {D} + 1)",
            "list_extract",
        )
        fold = "CAST(list_sum({arr}) AS DOUBLE)"
    terms = f"{tr}({seq_d}, d -> {idx}(v, d) * {w_sql(dialect, 'h', '(d - 1)')})"
    score = fold.format(arr=terms)
    return f"{join_fn}({tr}({seq_h}, h -> CASE WHEN {score} >= 0 THEN '1' ELSE '0' END), '')"
