"""Numeric helpers for oracle-exact aggregation.

Summing doubles is order-dependent: at sf0.01 a SUM over ~60k
``l_extendedprice`` values (~1.8e9 total) accumulates ~1e-2 of float error
that differs between Spark's partial-agg tree and DuckDB's scan order, so a
naive double SUM hash-mismatches.  Fix: sum exactly in fixed-point decimal,
then cast the exact decimal back to double -- both engines round the same
decimal to the same IEEE double, making the result bitwise stable while the
query output schema stays DOUBLE.  This is also the right call at 100 TB:
decimal partial aggregation is Tungsten-native and overflow-checked.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# 18 total digits, 6 fractional: exact for the testdata's monetary/measure
# doubles (<= 1e7 magnitude, generator emits <= 6 decimal places) and leaves
# 12 integer digits of headroom for the partial-agg running sum.
_SCALE = 6
_PREC = 18


def _dec(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({_PREC},{_SCALE})")


def dsum(col: Column | str) -> Column:
    """Order-independent SUM(double): exact decimal sum cast back to double."""
    return F.sum(_dec(col)).cast("double")


def davg(col: Column | str) -> Column:
    """Order-independent AVG(double): exact decimal sum / count, in double."""
    return F.sum(_dec(col)).cast("double") / F.count(F.col(col) if isinstance(col, str) else col)


def dsum_sql(expr: str) -> str:
    """DuckDB-side twin of :func:`dsum` for oracle SQL strings."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL({_PREC},{_SCALE}))) AS DOUBLE)"


def davg_sql(expr: str) -> str:
    """DuckDB-side twin of :func:`davg`."""
    return f"(CAST(SUM(CAST({expr} AS DECIMAL({_PREC},{_SCALE}))) AS DOUBLE) / COUNT({expr}))"


# ---------------------------------------------------- half-up ratios
#
# round(double, N) of an integer-sum ratio is NOT cross-engine safe:
# when the true ratio is an exact decimal half (e.g. 0.25325 at N=4)
# Spark rounds the exact binary expansion HALF_UP while DuckDB rounds
# x*10^N computed in double — found live at sf0.001 (CLAUDE.md round-6
# note; graph_clustering_coefficient carries the property pin).  These
# helpers render round-half-up(num/den, N) entirely in integer
# arithmetic — (2*num*10^N + den) DIV (2*den), then one shared /10^N —
# identical in both engines at any operand magnitude (decimal(38,0) /
# HUGEINT give 100 TB overflow headroom).  Contract: num >= 0, den > 0
# (count ratios; half-up of a negative ratio would need a sign split).


def hu_ratio(num: str, den: str, n: int) -> Column:
    """Spark column: round-half-up of integer ratio ``num/den`` to
    ``n`` digits, as DOUBLE.  ``num``/``den`` are SQL expression
    strings resolvable in the frame (the dsum_sql convention)."""
    p = 10 ** n
    return (
        F.expr(
            f"cast((2 * cast({num} as decimal(38,0)) * {p}"
            f" + cast({den} as decimal(38,0)))"
            f" div (2 * cast({den} as decimal(38,0))) as bigint)"
        ).cast("double")
        / p
    )


def hu_ratio_sql(num: str, den: str, n: int) -> str:
    """DuckDB twin of :func:`hu_ratio` (HUGEINT is true int128)."""
    p = 10 ** n
    return (
        f"CAST(CAST((2 * CAST({num} AS HUGEINT) * {p}"
        f" + CAST({den} AS HUGEINT))"
        f" // (2 * CAST({den} AS HUGEINT)) AS BIGINT) AS DOUBLE) / {p}"
    )


# Signed variant, for means of QUANTIZED-VALUE decimal sums (kl_nats,
# Theil, time-weighted averages): the numerator is a sum of terms
# c * q where q was quantized to k decimals, carried as the exact
# integer sum at 10^k scale, and individual terms (hence the sum) may
# be negative.  round(double, N) is HALF_UP = half-AWAY-FROM-ZERO in
# Spark (BigDecimal) and away-from-zero in DuckDB (std::round), so the
# signed recipe splits the sign out and applies the positive half-up
# recipe to |num| and |den|:
#     sign(num/den) * ((2*|num|*10^n + |den|) div (2*|den|)).
# Contract: num and den any sign; den = 0 renders NULL in both dialects
# (Spark's non-ANSI decimal ``div`` by zero is NULL; the DuckDB twin
# NULLIFs the divisor).  To render round(mean, N) of a k-quantized sum
# S/10^k over denominator n, call with num = S (the integer-scaled sum)
# and den = n * 10^k.  Render note: the final step is
# cast(scaled_int as double) / 10^N in BOTH dialects — bitwise
# identical cross-engine at any magnitude, but past 2^53 the scaled
# integer is no longer a double and the quotient is two-step-rounded;
# real call sites render ratios/means that fit comfortably.


def hu_ratio_signed(num: str, den: str, n: int) -> Column:
    """Spark column: round-half-away-from-zero of ``num/den`` to ``n``
    digits, as DOUBLE; ``num``/``den`` may be negative (den = 0 is
    NULL)."""
    p = 10 ** n
    a = f"abs(cast({num} as decimal(38,0)))"
    d = f"abs(cast({den} as decimal(38,0)))"
    sgn = (
        f"(case when (cast({num} as decimal(38,0)) < 0)"
        f" != (cast({den} as decimal(38,0)) < 0) then -1 else 1 end)"
    )
    return (
        F.expr(
            f"cast({sgn} * cast((2 * {a} * {p} + {d})"
            f" div (2 * {d}) as bigint) as bigint)"
        ).cast("double")
        / p
    )


def hu_ratio_signed_sql(num: str, den: str, n: int) -> str:
    """DuckDB twin of :func:`hu_ratio_signed`."""
    p = 10 ** n
    a = f"abs(CAST({num} AS HUGEINT))"
    d = f"abs(CAST({den} AS HUGEINT))"
    sgn = (
        f"(CASE WHEN (CAST({num} AS HUGEINT) < 0)"
        f" != (CAST({den} AS HUGEINT) < 0) THEN -1 ELSE 1 END)"
    )
    return (
        f"CAST(CAST({sgn} * CAST((2 * {a} * {p} + {d})"
        f" // NULLIF(2 * {d}, 0) AS BIGINT) AS BIGINT) AS DOUBLE) / {p}"
    )
