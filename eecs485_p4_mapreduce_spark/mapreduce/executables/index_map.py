#!/usr/bin/env python3
"""Inverted-index mapper (Hadoop-Streaming contract).

Input lines are ``<doc_id>\\t<text>``; for every DISTINCT lowercase
whitespace token in the document, emit ``<token>\\t<doc_id>``.  This is
the map stage of the classic search-engine index build the reference
framework exists to run (its course's companion project) -- an original
implementation of the streaming contract, not a copy.
"""

import sys


def emit_postings(stream):
    """Yield one (token, doc_id) line per distinct token per document."""
    for raw in stream:
        line = raw.rstrip("\n")
        if not line:
            continue
        doc_id, _, text = line.partition("\t")
        for token in sorted(set(text.lower().split())):
            yield f"{token}\t{doc_id}"


def main() -> None:
    out = sys.stdout
    for pair in emit_postings(sys.stdin):
        out.write(pair)
        out.write("\n")


if __name__ == "__main__":
    main()
