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


def weights() -> list[list[float]]:
    """The H x D hyperplane weight matrix, computed in Python.

    hashlib.md5 == Spark md5 == DuckDB md5, and `int/15.0 - 0.5` is the
    same two IEEE operations `_w_sql` spells in SQL, so these doubles are
    bit-identical to what the engines derive -- which lets the Spark side
    embed them as literals instead of running 512 md5 calls per row (the
    lambda-bound md5(concat(h,'_',d)) in `bucket_sql` cannot constant-fold,
    and was ~90% of the ANN queries' runtime).
    """
    import hashlib

    return [
        [
            int(hashlib.md5(f"{h}_{d}".encode()).hexdigest()[0], 16) / 15.0 - 0.5
            for d in range(D)
        ]
        for h in range(H)
    ]


def bucket_expr_spark() -> str:
    """Spark bucket expression with the weight matrix inlined as literals
    (repr round-trips doubles exactly; SQL decimal literals parse to the
    nearest double, recovering the identical value).  Same fold order as
    `bucket_sql('spark')` -- zip_with multiplies elementwise in d order and
    the aggregate folds left-to-right -- so every score double matches the
    md5-in-SQL spelling bit for bit (pinned by a unit test)."""
    wmat = ", ".join(
        "array(" + ", ".join(repr(x) for x in row) + ")" for row in weights()
    )
    score = (
        f"aggregate(zip_with(v, element_at(array({wmat}), h + 1), (x, y) -> x * y),"
        " cast(0.0 as double), (acc, x) -> acc + x)"
    )
    return (
        f"array_join(transform(sequence(0, {H - 1}),"
        f" h -> CASE WHEN {score} >= 0 THEN '1' ELSE '0' END), '')"
    )


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
