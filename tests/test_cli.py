"""CLI entry point (`python -m eecs485_p4_mapreduce_spark`)."""

from __future__ import annotations

import io
import contextlib

from eecs485_p4_mapreduce_spark.__main__ import main


def test_cli_list_filters_queries():
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        assert main(["list", "dedup_"]) == 0
    out = buf.getvalue()
    assert "dedup_exact" in out and "dedup_minhash_lsh" in out
    assert "knn_cosine" not in out


def test_cli_oracle_prints_sql():
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        assert main(["oracle", "q1_pricing_summary"]) == 0
    assert "l_returnflag" in buf.getvalue()


def test_cli_unknown_query_is_error():
    assert main(["run", "definitely_not_a_query"]) == 2


def test_cli_run_shows_rows(spark, sf_dir):
    # reuses the session fixture's JVM; get_spark returns the active one
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        assert main(["run", "privacy_k_anonymity", "--sf-dir", sf_dir, "-n", "2"]) == 0
    assert "k_anonymous" in buf.getvalue()
