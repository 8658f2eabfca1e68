"""Every registered query matches its DuckDB oracle (the driver's gate,
run here at sf0.001 for speed; tools/oracle_check.py runs sf0.01).

Uses the driver-strict canonicalizer from tools/canon.py: type-tagged
scalars (so int/float cross-engine divergence fails here, not only at the
driver) and a hard TypeError on raw array/map/struct output columns."""

from __future__ import annotations

import pytest

from eecs485_p4_mapreduce_spark.plans import REGISTRY
from tools.canon import canon as _canon
from tools.canon import duck_type_violations, spark_type_violations


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(name, spark, sf_dir, duck):
    spec = REGISTRY[name]
    sdf = spec.fn(spark, sf_dir)
    assert not spark_type_violations(sdf.schema), (
        "pandas-lossy Spark final column types (driver canonicalizes "
        f"through pandas): {spark_type_violations(sdf.schema)}"
    )
    srows, scols = sdf.collect(), sdf.columns
    if spec.oracle is None:
        assert len(srows) >= 0  # rows-only check (non-SQL-expressible op)
        return
    rel = duck.sql(spec.oracle)
    assert not duck_type_violations(rel), (
        "pandas-lossy DuckDB final column types (HUGEINT -> float64 at "
        f"the driver): {duck_type_violations(rel)}"
    )
    drows, dcols = rel.fetchall(), rel.columns
    s_canon, s_cols = _canon(srows, scols)
    d_canon, d_cols = _canon(drows, dcols)
    assert s_cols == d_cols, f"column names differ: {s_cols} vs {d_cols}"
    assert len(s_canon) == len(d_canon), f"row count {len(s_canon)} != {len(d_canon)}"
    assert s_canon == d_canon
