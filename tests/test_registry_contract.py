"""Registry/driver-contract guards: the invariants future rounds are
most likely to break by accident."""

from __future__ import annotations

import bench
from eecs485_p4_mapreduce_spark.plans import REGISTRY


def test_bench_queries_all_registered():
    """A renamed/removed query left in BENCH_QUERIES crashes the whole
    driver bench run (the round-2 failure mode, different trigger)."""
    missing = [q for q in bench.BENCH_QUERIES if q not in REGISTRY]
    assert not missing, f"bench.py references unknown queries: {missing}"


def test_bench_queries_unique():
    assert len(bench.BENCH_QUERIES) == len(set(bench.BENCH_QUERIES))


def test_every_query_has_an_oracle():
    """100%-oracled registry: the driver records `no_oracle` rows as
    unvalidated, so a None oracle silently weakens CORRECTNESS -- keep
    the bar at every query driver-checkable."""
    missing = [n for n, s in REGISTRY.items() if s.oracle is None]
    assert not missing, f"queries without oracle SQL: {missing}"


def test_oracle_final_types_survive_pandas(duck):
    """Bind-only scan of every oracle's OUTPUT schema: no final column may
    be HUGEINT/UHUGEINT/DECIMAL.  The driver canonicalizes DuckDB results
    through pandas, where HUGEINT coerces to float64 (round 10's
    ``sample_split_train_val_test`` hash-red: bare ``SUM(int32)`` is
    HUGEINT in DuckDB, ``i:123`` vs ``f:123.0``) while the local gate's
    ``fetchall()`` silently launders it to Python int.  Values cannot
    reveal the class, so this pins the DECLARED types registry-wide.
    Binding (``rel.types``) prepares without executing, so the full-registry
    scan is cheap."""
    from tools.canon import duck_type_violations

    bad = {}
    for name, spec in REGISTRY.items():
        if spec.oracle is None:
            continue
        try:
            viol = duck_type_violations(duck.sql(spec.oracle))
        except Exception as e:  # noqa: BLE001 — bind error ≠ type violation
            raise AssertionError(f"{name}: oracle failed to bind: {e}") from e
        if viol:
            bad[name] = viol
    assert not bad, f"pandas-lossy oracle final types: {bad}"


def test_type_contract_catches_round10_class(duck, spark):
    """The guard itself, pinned red-on-the-old-spelling: a bare
    ``SUM(int32)`` oracle (exactly ``sampling.py``'s pre-fix form) must be
    flagged HUGEINT, the CAST form must be clean, and the Spark-side twin
    must flag Decimal/array finals."""
    from pyspark.sql import functions as F

    from tools.canon import duck_type_violations, spark_type_violations

    old = duck.sql("SELECT lang, SUM(n_chars) AS total_chars "
                   "FROM documents GROUP BY 1")
    assert duck_type_violations(old) == ["total_chars:HUGEINT"]
    fixed = duck.sql("SELECT lang, CAST(SUM(n_chars) AS BIGINT) AS "
                     "total_chars FROM documents GROUP BY 1")
    assert duck_type_violations(fixed) == []
    assert duck_type_violations(
        duck.sql("SELECT CAST(1 AS DECIMAL(38,0)) AS x")
    ) == ["x:DECIMAL(38,0)"]

    sdf = spark.range(1).select(
        F.lit(1).cast("decimal(38,0)").alias("d"),
        F.array(F.lit(1)).alias("a"),
        F.lit(1).alias("ok"),
    )
    assert spark_type_violations(sdf.schema) == [
        "d:decimal(38,0)", "a:array<int>"]


def test_every_query_documented():
    undocumented = [n for n, s in REGISTRY.items() if not s.doc.strip()]
    assert not undocumented, f"queries without docstrings: {undocumented}"
