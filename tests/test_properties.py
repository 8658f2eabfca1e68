"""Property-based tests (hypothesis) for the engine's pure building
blocks -- the pieces whose contracts must hold for arbitrary input, not
just the fixtures."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from eecs485_p4_mapreduce_spark.mapreduce import keyof, md5_partition, round_robin_groups

# text without tabs/newlines (keys) and with them (whole lines)
_keys = st.text(
    alphabet=st.characters(blacklist_characters="\t\n\r", blacklist_categories=("Cs",)),
    max_size=40,
)
_vals = st.text(
    alphabet=st.characters(blacklist_characters="\n\r", blacklist_categories=("Cs",)),
    max_size=40,
)


@given(_keys, _vals)
def test_keyof_is_prefix_before_first_tab(key, val):
    line = f"{key}\t{val}"
    assert keyof(line) == key


@given(_keys)
def test_keyof_tabless_line_is_whole_line(key):
    assert keyof(key) == key


@given(_vals, st.integers(min_value=1, max_value=64))
@settings(max_examples=200)
def test_md5_partition_in_range_and_deterministic(line, nparts):
    p = md5_partition(line, nparts)
    assert 0 <= p < nparts
    assert p == md5_partition(line, nparts)


@given(st.lists(st.text(min_size=1, max_size=10), min_size=1, max_size=50, unique=True),
       st.integers(min_value=1, max_value=10))
def test_round_robin_partitions_every_file_once(files, n):
    groups = round_robin_groups(files, n)
    flat = [f for g in groups for f in g]
    assert sorted(flat) == sorted(files)          # every file exactly once
    assert all(g for g in groups)                 # no empty groups
    ordered = sorted(files)
    for i, g in enumerate(groups):                # group i = files i, i+m, ...
        assert g == ordered[i::len(groups)]


@given(st.lists(st.integers(min_value=-(10**6), max_value=10**6), min_size=1, max_size=100))
def test_decimal_sum_matches_integer_sum(xs):
    """dsum over values representable in decimal(18,6) is exact: summing
    x/64 floats (exactly representable) must equal the rational result."""
    from eecs485_p4_mapreduce_spark.functions.numeric import _dec  # noqa: F401

    # pure-python check of the invariant the Spark agg relies on:
    # decimal accumulation of 6-decimal values is associative and exact
    from decimal import Decimal

    vals = [Decimal(x) / Decimal(64) for x in xs]
    assert sum(vals) == sum(reversed(vals))
