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


def test_every_query_documented():
    undocumented = [n for n, s in REGISTRY.items() if not s.doc.strip()]
    assert not undocumented, f"queries without docstrings: {undocumented}"
