"""Multi-dimensional clustering (Z-order) for write layouts.

Range-sorting a table on one column makes filters on that column prune
perfectly and filters on every other column touch every file.  Z-order
interleaves the bits of two (or more) bucketized columns into one sort
key, so a range-partitioned write clusters *both* dimensions: a filter
on either column touches O(n / 2^(bits/2)) of n files instead of all of
them.  This is the layout trick behind Delta/Iceberg ``ZORDER BY`` /
``sort_order`` and it needs nothing from Spark beyond an expression --
``repartitionByRange(n, morton).sortWithinPartitions(morton).write``.

At 100 TB: pick bits so that 2^(2*bits) >> number of files, compute the
bucket bounds from column statistics (not a driver collect over data),
and re-cluster only when the file-skipping ratio decays.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def width_bucket(col: Column, lo: float, hi: float, buckets: int) -> Column:
    """Equal-width bucket index in [0, buckets) with clamped edges."""
    w = (hi - lo) / buckets
    raw = F.floor((col - F.lit(lo)) / F.lit(w)).cast("int")
    return F.greatest(F.lit(0), F.least(F.lit(buckets - 1), raw))


def morton2(a_bucket: Column, b_bucket: Column, bits: int = 3) -> Column:
    """Interleave two ``bits``-bit bucket indices into a Z-order key.

    Bit layout (bits=3): a2 b2 a1 b1 a0 b0 -- `a` gets the higher bit of
    each pair, so neither dimension dominates the ordering.
    """
    code = F.lit(0)
    for i in range(bits):
        a_bit = F.shiftright(a_bucket, i).bitwiseAND(F.lit(1))
        b_bit = F.shiftright(b_bucket, i).bitwiseAND(F.lit(1))
        code = (
            code
            + (a_bit * F.lit(1 << (2 * i + 1)))
            + (b_bit * F.lit(1 << (2 * i)))
        )
    return code
