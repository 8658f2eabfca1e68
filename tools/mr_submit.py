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


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True, help="input directory of text files")
    ap.add_argument("--output", required=True, help="output directory (created)")
    ap.add_argument("--mapper", required=True, help="mapper executable")
    ap.add_argument("--reducer", required=True, help="reducer executable")
    ap.add_argument("--nmappers", type=int, default=4)
    ap.add_argument("--nreducers", type=int, default=2)
    args = ap.parse_args()

    from eecs485_p4_mapreduce_spark import get_spark
    from eecs485_p4_mapreduce_spark.mapreduce import MapReduceJob

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
