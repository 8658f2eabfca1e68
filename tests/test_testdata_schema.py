"""Pin the driver-generated testdata schemas (pyarrow only, no Spark).

Round 2 died because the driver regenerated ``events.parquet`` with
``ts`` as timestamp[us] while the loader still assumed TIMESTAMP(NANOS)
stored as int64 — 39/138 queries failed at load time.  This test turns
any future testdata schema drift into ONE clear failure naming the file,
the column, and the loader that must adapt, instead of a wall of
AnalysisExceptions.

The reference pins all behavior with golden files (reference
tests/test_manager_02.py); this is the equivalent for our inputs.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

# Column name -> storage type, as of 2026-08 testdata generation.  Columns
# with several loader-supported encodings list every acceptable type.
EXPECTED = {
    "region": {"r_regionkey": {"int32"}, "r_name": {"string", "large_string"}},
    "nation": {
        "n_nationkey": {"int32"},
        "n_name": {"string", "large_string"},
        "n_regionkey": {"int32"},
    },
    "customer": {
        "c_custkey": {"int64"},
        "c_name": {"string", "large_string"},
        "c_nationkey": {"int32"},
        "c_acctbal": {"double"},
        "c_mktsegment": {"string", "large_string"},
    },
    "supplier": {
        "s_suppkey": {"int64"},
        "s_name": {"string", "large_string"},
        "s_nationkey": {"int32"},
        "s_acctbal": {"double"},
    },
    "part": {
        "p_partkey": {"int64"},
        "p_name": {"string", "large_string"},
        "p_brand": {"string", "large_string"},
        "p_type": {"string", "large_string"},
        "p_size": {"int32"},
        "p_retailprice": {"double"},
    },
    "orders": {
        "o_orderkey": {"int64"},
        "o_custkey": {"int64"},
        "o_orderstatus": {"string", "large_string"},
        "o_totalprice": {"double"},
        "o_orderdate": {"timestamp[us]", "timestamp[ns]"},
        "o_orderpriority": {"string", "large_string"},
    },
    "lineitem": {
        "l_orderkey": {"int64"},
        "l_partkey": {"int64"},
        "l_suppkey": {"int64"},
        "l_linenumber": {"int32"},
        "l_quantity": {"double"},
        "l_extendedprice": {"double"},
        "l_discount": {"double"},
        "l_tax": {"double"},
        "l_returnflag": {"string", "large_string"},
        "l_linestatus": {"string", "large_string"},
        "l_shipdate": {"timestamp[us]", "timestamp[ns]"},
    },
    "events": {
        "event_id": {"int64"},
        # Both encodings the loader's normalize_events_ts handles
        # (sources/tables.py).  Anything else must fail HERE, loudly.
        "ts": {"timestamp[us]", "timestamp[ns]", "int64"},
        "user_id": {"int64"},
        "event_type": {"string", "large_string"},
        "value": {"double"},
        "props": {"string", "large_string"},
    },
    "documents": {
        "doc_id": {"int64"},
        "text": {"string", "large_string"},
        "lang": {"string", "large_string"},
        "source": {"string", "large_string"},
        "n_chars": {"int64"},
    },
    "embeddings": {
        "vec_id": {"int64"},
        "embedding": {"list<element: float>", "list<item: float>"},
        "label": {"int32"},
    },
}


@pytest.mark.parametrize("table", sorted(EXPECTED))
def test_testdata_schema_matches_loader_assumptions(table: str) -> None:
    path = os.path.join(SF_DIR, f"{table}.parquet")
    if not os.path.exists(path):
        pytest.skip(f"{path} absent")
    schema = pq.read_schema(path)
    actual = {f.name: str(f.type) for f in schema}
    expected = EXPECTED[table]
    assert set(actual) == set(expected), (
        f"{path} columns changed: have {sorted(actual)}, loader expects "
        f"{sorted(expected)} — update eecs485_p4_mapreduce_spark/sources/tables.py "
        f"and this snapshot together"
    )
    for col, allowed in expected.items():
        assert actual[col] in allowed, (
            f"{path} column {col!r} is now stored as {actual[col]!r}; the "
            f"loader supports {sorted(allowed)}.  Adapt "
            f"eecs485_p4_mapreduce_spark/sources/tables.py (for events.ts: "
            f"normalize_events_ts) BEFORE touching any query — this is the "
            f"drift that killed round 2."
        )


def test_events_loader_handles_both_ts_encodings(spark, tmp_path):
    """normalize_events_ts must produce the same TimestampType column and
    the same instants whether events.ts is stored as int64 epoch-nanos
    (round-1 testdata, readable only under nanosAsLong) or as
    timestamp[us] (current testdata) -- the dtype dispatch that round 2
    lacked.  Both branches are synthesized here so neither silently loses
    coverage when the driver's generator changes again."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq_w
    from pyspark.sql.types import TimestampType

    from eecs485_p4_mapreduce_spark.sources import load_table

    instants = [
        dt.datetime(2024, 1, 1, 12, 0, 0),
        dt.datetime(2024, 1, 1, 12, 30, 45, 123456),
    ]
    base = {
        "event_id": pa.array([1, 2], pa.int64()),
        "user_id": pa.array([10, 20], pa.int64()),
        "event_type": pa.array(["view", "click"]),
        "value": pa.array([1.5, 2.5], pa.float64()),
        "props": pa.array(["{}", "{}"]),
    }
    micros = [(t - dt.datetime(1970, 1, 1)) // dt.timedelta(microseconds=1) for t in instants]

    cases = {
        "us": pa.array(instants, pa.timestamp("us")),
        "nanos_as_int64": pa.array([m * 1000 for m in micros], pa.int64()),
    }
    results = {}
    for name, ts_arr in cases.items():
        d = tmp_path / name
        d.mkdir()
        cols = dict(base)
        cols["ts"] = ts_arr
        table = pa.table(
            {k: cols[k] for k in ["event_id", "ts", "user_id", "event_type", "value", "props"]}
        )
        pq_w.write_table(table, str(d / "events.parquet"))
        df = load_table(spark, str(d), "events")
        assert isinstance(df.schema["ts"].dataType, TimestampType), (name, df.schema)
        results[name] = sorted(
            (r["event_id"], r["ts"]) for r in df.select("event_id", "ts").collect()
        )
    assert results["us"] == results["nanos_as_int64"], results
    assert [t for _, t in results["us"]] == instants


def test_events_bounds_for_packed_argminmax_key():
    """agg_argminmax_by (operators/relational6.py) packs (value, event_id)
    into one int64: correctness requires 0 <= value < 9.2e3 (no int64
    overflow after *1e6*1e9) and 0 <= event_id < 1e9 (id digits must not
    bleed into value digits).  Assert the corpus actually satisfies the
    preconditions at every shipped sf."""
    import duckdb

    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        path = f"/root/testdata/{sf}/events.parquet"
        if not os.path.exists(path):
            continue
        lo_v, hi_v, lo_id, hi_id = duckdb.sql(
            f"SELECT min(value), max(value), min(event_id), max(event_id)"
            f" FROM '{path}'"
        ).fetchone()
        assert 0 <= lo_v and hi_v < 9.2e3, (sf, lo_v, hi_v)
        assert 0 <= lo_id and hi_id < 1e9, (sf, lo_id, hi_id)
