#!/usr/bin/env python3
"""Grep mapper (Hadoop-Streaming contract).

Contract (reference tests/testdata/exec/grep_map.py): argv[1] is the query
term (default ``product``); for each non-empty stripped stdin line whose
lowercase form contains the query, emit ``1\\t<line>``.  Original
implementation of the contract.
"""

import sys


def main() -> None:
    term = sys.argv[1] if len(sys.argv) > 1 else "product"
    for raw in sys.stdin:
        line = raw.strip()
        if line and term in line.lower():
            sys.stdout.write(f"1\t{line}\n")


if __name__ == "__main__":
    main()
