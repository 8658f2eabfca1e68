"""Driver-strict canonicalizer shared by tools/oracle_check.py and
tests/test_oracle_queries.py.

The round-1 driver gate proved STRICTER than our local twin in exactly two
ways, both now replicated here:

1.  Type-tagged scalars.  The driver canonicalizes through pandas, where a
    Spark BIGINT (int64) and a DuckDB DOUBLE (float64) hash differently even
    when numerically equal (46 vs 46.0 -- the round-1 ``scalar_math_fns``
    red row).  We therefore render ``i:46`` vs ``f:46`` so any cross-engine
    type divergence fails locally.

2.  No raw containers.  The driver's pandas sort dies on unhashable lists
    (the round-1 ``array_map_fns`` err).  A list/map/struct value in a final
    output column is a registration bug -- we raise instead of stringifying.

3.  Type contracts on the DECLARED engine output types (round 10's red
    row).  The local gate fetches rows natively (``fetchall()`` /
    ``collect()``), where a DuckDB HUGEINT arrives as a Python int -- but
    the driver canonicalizes through pandas, where HUGEINT coerces to
    float64 (``i:123`` vs ``f:123.0``, the ``sample_split_train_val_test``
    hash-red) and DECIMAL to object.  Values cannot reveal this, so both
    local gates now also enforce :func:`duck_type_violations` /
    :func:`spark_type_violations` on the result SCHEMAS.
"""

from __future__ import annotations

import datetime
import decimal
import math


def render(v) -> str:
    """Render one scalar as a type-tagged string; raise on containers."""
    if v is None:
        return "NULL"
    if isinstance(v, bool):  # before int: bool is an int subclass
        return f"b:{v}"
    if isinstance(v, int):
        return f"i:{v}"
    if isinstance(v, float):
        if math.isnan(v):
            return "f:NaN"
        return "f:%.17g" % v
    if isinstance(v, decimal.Decimal):
        return f"dec:{v}"
    if isinstance(v, bytes):
        return "x:" + v.hex()
    if isinstance(v, str):
        return "s:" + v
    if isinstance(v, datetime.datetime):
        return "ts:" + v.isoformat()
    if isinstance(v, datetime.date):
        return "d:" + v.isoformat()
    if isinstance(v, (list, tuple, set, dict)) or type(v).__name__ == "Row":
        raise TypeError(
            f"raw container {type(v).__name__} in output column -- the "
            "driver comparator cannot canonicalize this; project it through "
            "array_join/to_json first"
        )
    return "o:" + str(v)


# DuckDB output types pandas cannot hold losslessly: HUGEINT/UHUGEINT
# (int128 -> float64) and DECIMAL (-> object).  Oracles must CAST these
# to BIGINT/DOUBLE at the final SELECT.
_DUCK_LOSSY = ("HUGEINT", "UHUGEINT", "DECIMAL")


def duck_type_violations(rel) -> list:
    """Pandas-lossy final column types of a DuckDB relation (bind-only --
    reading ``.types`` prepares the query without executing it)."""
    return [
        f"{c}:{t}"
        for c, t in zip(rel.columns, rel.types)
        if str(t).upper().startswith(_DUCK_LOSSY)
    ]


def spark_type_violations(schema) -> list:
    """Driver-hazard final column types of a Spark schema: DecimalType
    goes through pandas as object (vs the oracle's int64/float64) and
    array/map/struct are unhashable in the driver's pandas sort."""
    from pyspark.sql import types as T

    bad = (T.DecimalType, T.ArrayType, T.MapType, T.StructType)
    return [
        f"{f.name}:{f.dataType.simpleString()}"
        for f in schema.fields
        if isinstance(f.dataType, bad)
    ]


def canon(rows, cols):
    """Column-name-sorted, row-sorted, type-tagged canonical form."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted(tuple(render(r[i]) for i in order) for r in rows)
    return out, [cols[i] for i in order]


def close(a: str, b: str, tol: float = 1e-9) -> bool:
    """Near-equality report helper (diagnostic only -- the gate is exact)."""
    if a == b:
        return True
    ta, tb = a.split(":", 1)[0] if ":" in a else "", b.split(":", 1)[0] if ":" in b else ""
    if ta not in ("i", "f", "dec") or tb not in ("i", "f", "dec"):
        return False
    try:
        fa = float(a.split(":", 1)[1])
        fb = float(b.split(":", 1)[1])
    except ValueError:
        return False
    return math.isclose(fa, fb, rel_tol=tol, abs_tol=1e-12)
