#!/usr/bin/env python3
"""Grep reducer (Hadoop-Streaming contract).

Contract (reference tests/testdata/exec/grep_reduce.py:17-27): for each
``key\\tvalue`` stdin line, emit the value alone; skip malformed lines
that do not split into exactly two fields.  Original implementation.
"""

import sys


def main() -> None:
    for raw in sys.stdin:
        parts = raw.rstrip("\n").split("\t")
        if len(parts) != 2:
            continue
        sys.stdout.write(parts[1])
        sys.stdout.write("\n")


if __name__ == "__main__":
    main()
