"""Command-line entry point: run any registered query from a shell.

    python -m eecs485_p4_mapreduce_spark list [substr]
    python -m eecs485_p4_mapreduce_spark run <query> [--sf-dir DIR] [-n ROWS]
                                               [--out PATH --format parquet|csv|json]
    python -m eecs485_p4_mapreduce_spark explain <query> [--sf-dir DIR]
    python -m eecs485_p4_mapreduce_spark oracle <query>

`run` prints the first rows (or writes a file sink), `explain` prints the
formatted physical plan, `oracle` prints the query's DuckDB oracle SQL.
This is the reference's `mapreduce-submit` ergonomics for the analytic
surface (tools/mr_submit.py covers the exe-compat path).
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="eecs485_p4_mapreduce_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p_list = sub.add_parser("list", help="list registered queries")
    p_list.add_argument("substr", nargs="?", default="")

    for c in ("run", "explain", "oracle"):
        p = sub.add_parser(c)
        p.add_argument("query")
        if c != "oracle":
            p.add_argument("--sf-dir", default=None)
        if c == "run":
            p.add_argument("-n", type=int, default=20, help="rows to show")
            p.add_argument("--out", default=None, help="write result here instead")
            p.add_argument(
                "--format", default="parquet", choices=["parquet", "csv", "json"]
            )

    args = ap.parse_args(argv)

    # Import after parsing so `list`/`oracle` stay JVM-free and fast.
    from eecs485_p4_mapreduce_spark.plans import REGISTRY

    if args.cmd == "list":
        for name, spec in sorted(REGISTRY.items()):
            if args.substr in name:
                first = (spec.doc or "").strip().splitlines()
                print(f"{name:40s} {first[0] if first else ''}")
        return 0

    if args.query not in REGISTRY:
        print(f"unknown query {args.query!r}; try: list", file=sys.stderr)
        return 2
    spec = REGISTRY[args.query]

    if args.cmd == "oracle":
        if spec.oracle is None:
            print("-- (no SQL oracle: non-SQL-expressible operator)")
        else:
            print(spec.oracle.strip())
        return 0

    from eecs485_p4_mapreduce_spark import get_spark
    from eecs485_p4_mapreduce_spark.sources.tables import DEFAULT_SF_DIR

    sf_dir = args.sf_dir or DEFAULT_SF_DIR
    spark = get_spark(f"cli-{args.cmd}-{args.query}")
    spark.sparkContext.setLogLevel("ERROR")
    df = spec.fn(spark, sf_dir)

    if args.cmd == "explain":
        df.explain("formatted")
        return 0
    if args.out:
        df.write.format(args.format).mode("overwrite").save(args.out)
        print(f"wrote {args.out} ({args.format})")
    else:
        df.show(args.n, truncate=False)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
