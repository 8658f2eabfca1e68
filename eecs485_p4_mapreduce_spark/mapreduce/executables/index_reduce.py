#!/usr/bin/env python3
"""Inverted-index reducer (Hadoop-Streaming contract).

Input: ``<token>\\t<doc_id>`` lines, key-grouped (sorted).  Output one
line per token: ``<token>\\t<df>\\t<doc_id,doc_id,...>`` with doc ids
numerically sorted and de-duplicated -- the posting list.
"""

import itertools
import sys


def build_postings(stream):
    """Yield one (token, df, postings) line per key group."""
    keyed = (line.rstrip("\n").partition("\t") for line in stream if line.strip())
    for token, group in itertools.groupby(keyed, key=lambda kv: kv[0]):
        docs = sorted({int(doc) for _, _, doc in group})
        yield f"{token}\t{len(docs)}\t{','.join(str(d) for d in docs)}"


def main() -> None:
    out = sys.stdout
    for line in build_postings(sys.stdin):
        out.write(line)
        out.write("\n")


if __name__ == "__main__":
    main()
