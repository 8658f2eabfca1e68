#!/usr/bin/env python3
"""Word-count mapper (Hadoop-Streaming contract).

Contract (reference tests/testdata/exec/wc_map.sh:1-12): read text lines
on stdin; for every whitespace token, emit ``<token_lowercased>\\t1``.
This is an original implementation of that contract -- not a copy.
"""

import sys


def emit_pairs(stream):
    """Yield one tab-separated (token, 1) line per whitespace token."""
    for raw in stream:
        for token in raw.split():
            yield f"{token.lower()}\t1"


def main() -> None:
    out = sys.stdout
    for pair in emit_pairs(sys.stdin):
        out.write(pair)
        out.write("\n")


if __name__ == "__main__":
    main()
