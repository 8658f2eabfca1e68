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


def test_mr_submit_shutdown_stops_cluster(monkeypatch):
    """--shutdown twin of the reference's mapreduce-submit --shutdown
    (ref mapreduce/submit.py:62,77-79): no job fields required; the
    'cluster' (SparkSession) gets stop()ed."""
    import eecs485_p4_mapreduce_spark as pkg
    from tools.mr_submit import main as mr_main

    stopped = []

    class FakeSession:
        def stop(self):
            stopped.append(True)

    monkeypatch.setattr(pkg, "get_spark", lambda name: FakeSession())
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        assert mr_main(["--shutdown"]) == 0
    assert stopped == [True]
    assert "shutdown" in buf.getvalue()


def test_mr_submit_status_reports_cluster(monkeypatch):
    """--status twin of the reference's `bin/mapreduce status` (prints
    manager/worker liveness, exit 0 iff both run): manager = the Spark
    driver/scheduler, workers = executor slots.  The probe OBSERVES a
    pre-existing cluster and never starts one — exit 1 is a reachable
    outcome, like the reference's."""
    import tools.mr_submit as mr
    from tools.mr_submit import main as mr_main

    monkeypatch.setattr(mr, "_active_cluster", lambda: ("local[32]", 32))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        assert mr_main(["--status"]) == 0
    out = buf.getvalue()
    assert "manager running (local[32])" in out
    assert "workers running (32 slots)" in out

    monkeypatch.setattr(mr, "_active_cluster", lambda: None)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        assert mr_main(["--status"]) == 1
    assert "manager not running" in buf.getvalue()


def test_mr_submit_status_probe_never_creates_a_session(monkeypatch):
    """The liveness probe itself: --status must OBSERVE, never create.
    Pinned directly (round-9 ADVICE): besides get_spark, ANY
    getOrCreate on the Builder is trapped — a regression that routes
    _active_cluster through getOrCreate (which would start a cluster
    whenever the suite's shared session is down, making exit 1
    unreachable) now fails regardless of the shared fixture's state —
    and the active session must be the identical object before and
    after the probe."""
    from pyspark.sql import SparkSession

    import eecs485_p4_mapreduce_spark as pkg
    from tools.mr_submit import main as mr_main

    def boom(*a, **k):
        raise AssertionError("--status must not create a session")

    monkeypatch.setattr(pkg, "get_spark", boom)
    monkeypatch.setattr(SparkSession.Builder, "getOrCreate", boom)
    before = SparkSession.getActiveSession()
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = mr_main(["--status"])
    assert SparkSession.getActiveSession() is before
    # rc reflects whether the TEST process already has a live session
    # (the suite's shared fixture may be up); either way the probe
    # observed rather than created
    assert rc in (0, 1)
    from pyspark import SparkContext

    live = before is not None or SparkContext._active_spark_context is not None
    assert rc == (0 if live else 1)


def test_mr_submit_requires_job_args_without_shutdown():
    from tools.mr_submit import main as mr_main

    with contextlib.redirect_stderr(io.StringIO()):
        try:
            mr_main(["--input", "/tmp/x"])
        except SystemExit as e:
            assert e.code == 2
        else:
            raise AssertionError("expected argparse error")


def test_cli_run_shows_rows(spark, sf_dir):
    # reuses the session fixture's JVM; get_spark returns the active one
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        assert main(["run", "privacy_k_anonymity", "--sf-dir", sf_dir, "-n", "2"]) == 0
    assert "k_anonymous" in buf.getvalue()
