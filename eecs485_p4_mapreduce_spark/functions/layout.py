"""Multi-dimensional clustering (Z-order) for write layouts.

Range-sorting a table on one column makes filters on that column prune
perfectly and filters on every other column touch every file.  Z-order
interleaves the bits of two (or more) bucketized columns into one sort
key, so a range-partitioned write clusters *both* dimensions: a filter
on either column touches O(n / 2^(bits/2)) of n files instead of all of
them.  This is the layout trick behind Delta/Iceberg ``ZORDER BY`` /
``sort_order`` and it needs nothing from Spark beyond an expression --
``repartitionByRange(n, morton).sortWithinPartitions(morton).write``.

At 100 TB: pick the bucket count so that buckets^2 >> number of files,
compute the bucket bounds from column statistics (not a driver collect
over data), and re-cluster only when the file-skipping ratio decays.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def width_bucket(col: Column, lo: float, hi: float, buckets: int) -> Column:
    """Equal-width bucket index in [0, buckets) with clamped edges.

    ``hi`` must be strictly greater than ``lo``: with a zero-width range
    the division yields NULL, which least/greatest would silently skip,
    mapping every row to the top bucket and degrading the Z-order key to
    one dimension with no error -- so this raises instead.
    """
    if hi <= lo:
        raise ValueError(f"width_bucket needs hi > lo, got [{lo}, {hi}]")
    w = (hi - lo) / buckets
    raw = F.floor((col - F.lit(lo)) / F.lit(w)).cast("int")
    return F.greatest(F.lit(0), F.least(F.lit(buckets - 1), raw))


def morton2(a_bucket: Column, b_bucket: Column, buckets: int = 8) -> Column:
    """Interleave two bucket indices in [0, buckets) into a Z-order key.

    ``buckets`` must be a power of two and MUST match the bucket count
    used in :func:`width_bucket` -- interleaving fewer bits than the
    bucket indices carry would silently alias distinct buckets onto one
    key (e.g. 16 buckets through a 3-bit interleave collide pairwise).

    Bit layout (buckets=8): a2 b2 a1 b1 a0 b0 -- `a` gets the higher bit
    of each pair, so neither dimension dominates the ordering.
    """
    bits = buckets.bit_length() - 1
    if 1 << bits != buckets:
        raise ValueError(f"buckets must be a power of two, got {buckets}")
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
