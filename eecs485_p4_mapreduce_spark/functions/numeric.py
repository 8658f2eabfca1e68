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
