"""Shared fixtures: one SparkSession per test session, repo on sys.path."""

from __future__ import annotations

import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# Fast local testing: small SF by default, overridable for deeper runs.
SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
REFERENCE = "/root/reference"


@pytest.fixture(scope="session")
def spark():
    from eecs485_p4_mapreduce_spark import get_spark

    s = get_spark("spark-graft-tests", cpus=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(scope="session")
def duck():
    import duckdb

    con = duckdb.connect()
    from eecs485_p4_mapreduce_spark.sources import TABLES

    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con
