"""Leaf module for the shared 8-token-window constants.

dedup.py and pipeline.py both need these at MODULE level (oracle SQL is
built at decoration time), and operator modules must never import each
other at module level in both directions of the plans-package init
order — a direct ``import operators.dedup`` re-enters plans/__init__
with dedup partially initialized, and any module-level consumer of
dedup symbols then sees an ImportError.  Constants live here (imports
only textfn); functions like ``_token_windows`` stay in dedup and are
imported lazily inside query bodies.
"""

from __future__ import annotations

from eecs485_p4_mapreduce_spark.functions.textfn import DUCK_TOKENS

_NGRAM = 8

_GRAMS_DUCK = f"""
    t AS (SELECT doc_id, source, {DUCK_TOKENS} AS tk FROM documents),
    g AS (
      SELECT doc_id, source,
             unnest(list_transform(range(1, len(tk) - {_NGRAM - 2}), i ->
               md5(array_to_string(list_slice(tk, i, i + {_NGRAM - 1}), ' ')))) AS h
      FROM t)"""

# Stand-in eval set: prompts lifted verbatim from these corpus documents
# (tokens 5..20) — the "leaked benchmark" scenario a decontamination run
# exists to catch.  Ids exist at every shipped sf.
_BENCH_IDS = (3, 77, 141, 256, 307)
