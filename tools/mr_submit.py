"""CLI twin of the reference's ``mapreduce-submit`` (mapreduce/submit.py
:21-60): submit one streaming-executable job to the engine.

    python tools/mr_submit.py --input DIR --output DIR \\
        --mapper EXE --reducer EXE [--nmappers 4] [--nreducers 2]

Where the reference sends a JSON message to a Manager over TCP, here the
"cluster" is a SparkSession -- the scheduler, shuffle, and fault handling
the reference hand-rolls (SURVEY.md §2.A8-A13) are Spark built-ins.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _active_cluster() -> tuple[str, int] | None:
    """(master, slots) of an ALREADY-RUNNING local cluster, else None.

    The reference's `bin/mapreduce status` (bin/mapreduce:41-60) OBSERVES
    pre-existing manager/worker processes and exits 1 when none run; the
    twin therefore probes for an existing SparkSession/SparkContext and
    never creates one — previously the probe called get_spark(), which
    would START a cluster just to report it running, making exit 1
    unreachable."""
    try:
        from pyspark import SparkContext
        from pyspark.sql import SparkSession

        spark = SparkSession.getActiveSession()
        sc = spark.sparkContext if spark is not None else (
            SparkContext._active_spark_context
        )
        if sc is None:
            return None
        return sc.master, sc.defaultParallelism
    except Exception:  # noqa: BLE001 — liveness probe, any failure = down
        return None


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument(
        "--shutdown",
        "-s",
        action="store_true",
        help="shut the cluster down instead of submitting a job "
        "(reference mapreduce/submit.py:62,77-79: sends {'message_type':"
        " 'shutdown'}; here the cluster is the SparkSession, so the twin"
        " is spark.stop())",
    )
    ap.add_argument(
        "--status",
        action="store_true",
        help="report cluster status instead of submitting a job "
        "(reference bin/mapreduce status: prints manager/worker liveness,"
        " exit 0 iff both run; here manager = the Spark driver/scheduler"
        " and workers = executor slots, so the twin reports the session's"
        " master and parallelism)",
    )
    ap.add_argument("--input", help="input directory of text files")
    ap.add_argument("--output", help="output directory (created)")
    ap.add_argument("--mapper", help="mapper executable")
    ap.add_argument("--reducer", help="reducer executable")
    ap.add_argument("--nmappers", type=int, default=4)
    ap.add_argument("--nreducers", type=int, default=2)
    args = ap.parse_args(argv)

    from eecs485_p4_mapreduce_spark import get_spark
    from eecs485_p4_mapreduce_spark.mapreduce import MapReduceJob

    if args.shutdown:
        spark = get_spark("mr-submit")
        spark.stop()
        print("shutdown")
        return 0
    if args.status:
        live = _active_cluster()
        if live is None:
            print("manager not running")
            print("workers not running")
            return 1
        master, slots = live
        print(f"manager running ({master})")
        print(f"workers running ({slots} slots)")
        return 0
    missing = [
        f"--{k}" for k in ("input", "output", "mapper", "reducer")
        if getattr(args, k) is None
    ]
    if missing:
        ap.error(f"the following arguments are required: {', '.join(missing)}")

    spark = get_spark("mr-submit")
    spark.sparkContext.setLogLevel("ERROR")
    outputs = MapReduceJob(
        input_directory=args.input,
        output_directory=args.output,
        mapper_executable=args.mapper,
        reducer_executable=args.reducer,
        num_mappers=args.nmappers,
        num_reducers=args.nreducers,
    ).run(spark)
    for path in outputs:
        print(path)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
