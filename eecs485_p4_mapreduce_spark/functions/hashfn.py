"""md5-derived integer hashing shared across operator modules.

Lives under functions/ (no registry import) so any operator module can be
imported first without a decoration-time circular import — the same
rationale as lshfn.py.  md5 is the one digest Spark, DuckDB, and
hashlib all implement bit-identically, so it is the engine's shared
deterministic source of randomness (MinHash, SimHash bands, Count-Min
rows, samplers all derive from it).
"""

from __future__ import annotations

# Broder-style mixing modulus: one md5 yields two 32-bit ints (hex chars
# 1-8 and 9-16); derived hash i = (h1 + i * (2*h2 + 1)) mod 2^32.
M32 = 4_294_967_296


def hex_int_sql(dialect: str, src: str, start: int) -> str:
    """Integer from 8 hex chars of md5 (identical value in both engines).

    Spark spells it natively (``conv`` is codegen'd; a lambda-based
    digit fold is interpreted and ~10x slower); DuckDB has no conv so it
    uses the equivalent digit-weight sum.
    """
    if dialect == "spark":
        return f"cast(conv(substring({src}, {start}, 8), 16, 10) as bigint)"
    return (
        f"CAST(list_sum(list_transform(range(0, 8), c -> (strpos('0123456789abcdef',"
        f" substring({src}, {start} + c, 1)) - 1) * CAST(pow(16, 7 - c) AS BIGINT))) AS BIGINT)"
    )
