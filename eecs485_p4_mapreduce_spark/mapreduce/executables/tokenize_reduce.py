#!/usr/bin/env python3
"""Word-count reducer (Hadoop-Streaming contract).

Contract (reference tests/testdata/exec/wc_reduce.py docstring + golden
outputs): stdin is key-sorted ``key\\tvalue`` lines; emit
``key\\t<sum of int values>`` per distinct key.  Sorted input means each
key's run is contiguous, so a single streaming pass with O(1) state
suffices (the reference pins this with a <1 MiB heap ceiling,
tests/test_worker_11.py:164).  Original implementation of the contract.
"""

import sys


def main() -> None:
    current: str | None = None
    total = 0
    for raw in sys.stdin:
        line = raw.rstrip("\n")
        key, _, value = line.partition("\t")
        if key != current:
            if current is not None:
                sys.stdout.write(f"{current}\t{total}\n")
            current, total = key, 0
        total += int(value)
    if current is not None:
        sys.stdout.write(f"{current}\t{total}\n")


if __name__ == "__main__":
    main()
