"""Property pins for shared-template CONSTANTS: every module-level
expression string or literal table that both the Spark body and the
DuckDB oracle render from is verified here against an independent
derivation (closed-form math, Fraction identity, or a pure-Python
replay of the declared hash/rounding recipe).  The inventory test
(tests/test_template_inventory.py) asserts each shared-formula
constant maps to one of these pins (or to a recount pin in
tests/test_recount_pins.py / test_headroom_bounds.py).
"""

from __future__ import annotations

import hashlib
import math
import re
from decimal import ROUND_HALF_UP, Decimal
from fractions import Fraction


# ------------------------------------------------------ Benford literals


def test_benford_literals_match_log10():
    """_BENFORD_EXPECTED's nine literals are round(log10(1 + 1/d), 6)
    — the closed-form Benford first-digit law, recomputed here."""
    from eecs485_p4_mapreduce_spark.operators.analytics import (
        _BENFORD_EXPECTED,
    )

    pairs = re.findall(r"WHEN '(\d)' THEN ([0-9.]+)", _BENFORD_EXPECTED)
    assert len(pairs) == 9
    for d, lit in pairs:
        assert float(lit) == round(math.log10(1 + 1 / int(d)), 6), d


# --------------------------------------------- t-closeness sensitive band


def test_tclose_sens_band_matches_python(spark):
    """_SENS_SQL's shifted band (floor(acctbal)+1000) div 2000 equals
    the Python floor-division recount across the full TPC-H acctbal
    range INCLUDING negatives — the shift is what makes integer div
    == floor div in both engines; driven on the production string."""
    import duckdb

    from eecs485_p4_mapreduce_spark.operators.analytics import _SENS_SQL

    vals = [-999.99, -999.0, -0.01, 0.0, 999.99, 1000.0, 2999.99,
            3000.0, 9999.99, 4499.5]
    expect = [(math.floor(v) + 1000) // 2000 for v in vals]
    assert all((math.floor(v) + 1000) >= 0 for v in vals)

    df = spark.createDataFrame([(v,) for v in vals], "c_acctbal double")
    got_s = [
        r["b"]
        for r in df.select(
            df.c_acctbal,
            __import__("pyspark.sql.functions", fromlist=["expr"])
            .expr(f"{_SENS_SQL} div 2000")
            .alias("b"),
        ).collect()
    ]
    assert got_s == expect

    con = duckdb.connect()
    got_d = [
        row[0]
        for v in vals
        for row in con.execute(
            f"SELECT {_SENS_SQL} // 2000 FROM"
            f" (SELECT CAST({v!r} AS DOUBLE) AS c_acctbal)"
        ).fetchall()
    ]
    assert got_d == expect


# ------------------------------------------------ _REG_P6 signed quantizer


def test_reg_p6_quantizer_matches_fraction(spark):
    """The prediction-grid quantizer template (signed half-up of a
    1e-6-scaled sum over a count) matches Fraction half-away-from-zero
    rounding in BOTH dialect spellings, including negative sums, exact
    halves, n = 0, and NULL n."""
    import duckdb

    from eecs485_p4_mapreduce_spark.operators.analytics import _REG_P6

    cases = [  # (s6, n)
        (3, 2), (-3, 2), (5, 2), (-5, 2), (7, 3), (-7, 3),
        (0, 5), (123456789, 7), (-123456789, 7), (1, 1),
    ]

    def pyq(s, n):
        if n in (None, 0):
            return None
        half = Fraction(s, n)
        sign = -1 if half < 0 else 1
        return sign * int(
            (abs(half) + Fraction(1, 2)).__floor__()
        )

    expect = [pyq(s, n) for s, n in cases] + [None, None]

    rows = [(s, n) for s, n in cases] + [(9, 0), (9, None)]
    df = spark.createDataFrame(rows, "s6 long, n long")
    from pyspark.sql import functions as F

    got_s = [
        r["q"]
        for r in df.select(
            F.expr(_REG_P6.format(s="s6", n="n", div="div")).alias("q")
        ).collect()
    ]
    assert [None if g is None else int(g) for g in got_s] == expect

    con = duckdb.connect()
    sql_rows = ", ".join(
        f"({s}, {'NULL' if n is None else n})" for s, n in rows
    )
    got_d = [
        None if r[0] is None else int(r[0])
        for r in con.execute(
            f"SELECT {_REG_P6.format(s='s6', n='n', div='//')}"
            f" FROM (VALUES {sql_rows}) AS t(s6, n)"
        ).fetchall()
    ]
    assert got_d == expect


# ------------------------------------------- temperature-mix share table


def test_temperature_case_literals_match_policy():
    """_TEMP_CASE's literals are round(p^0.5 / Z, 6) over the _MIX
    policy (alpha = 0.5 temperature rescale), recomputed here."""
    from eecs485_p4_mapreduce_spark.operators.mixing import (
        _MIX,
        _TEMP_CASE,
    )

    z = sum(math.sqrt(p) for p in _MIX.values())
    pairs = dict(re.findall(r"WHEN '(\w+)' THEN ([0-9.]+)", _TEMP_CASE))
    assert set(pairs) == set(_MIX)
    for lang, p in _MIX.items():
        assert float(pairs[lang]) == round(math.sqrt(p) / z, 6), lang


# --------------------------------------------- Poisson bootstrap table


def test_poisson_case_thresholds_match_cdf():
    """_POIS_CASE's four integer thresholds are floor(2^32 * CDF_k) of
    the Poisson(1) distribution, recomputed from e^-1 * 2^32 partial
    sums (each sits ~0.5 away from an integer, so the float chain is
    unambiguous)."""
    from eecs485_p4_mapreduce_spark.operators.sampling import _POIS_CASE

    lits = [int(x) for x in re.findall(r"u < (\d+)", _POIS_CASE)]
    assert len(lits) == 4
    cdf = 0.0
    fact = 1
    for k in range(4):
        if k:
            fact *= k
        cdf += math.exp(-1) / fact
        scaled = cdf * 2**32
        assert abs(scaled - round(scaled)) > 0.05  # away from the edge
        assert lits[k] == math.floor(scaled), k


# --------------------------------------------------- Bloom probe masks


def test_bloom_probe_masks_regenerate():
    """_BLOOM_HITS regenerates exactly from the declared double-hash
    derivation (h1 = md5[0:8], h9 = md5[8:16]; p1 = h1 % 252,
    p2 = (h1 + 2*h9 + 1) % 252; 4x63-bit words) over the declared
    probe set — the whole mask table recomputed from scratch."""
    from eecs485_p4_mapreduce_spark.operators.similarity import _BLOOM_HITS

    def masks(tok: str) -> dict[int, int]:
        h = hashlib.md5(tok.encode()).hexdigest()
        h1, h9 = int(h[0:8], 16), int(h[8:16], 16)
        out: dict[int, int] = {}
        for p in (h1 % 252, (h1 + 2 * h9 + 1) % 252):
            out[p // 63] = out.get(p // 63, 0) | (1 << (p % 63))
        return out

    cases = []
    for tok in ["fast", "table", "scan", "zebra", "quantum"]:
        conds = " AND ".join(
            f"(w{w} & {m}) = {m}" for w, m in sorted(masks(tok).items())
        )
        cases.append(f"(CASE WHEN {conds} THEN 1 ELSE 0 END)")
    assert " + ".join(cases) == _BLOOM_HITS


# ------------------------------------- preference-quality cleared rational


def test_pref_quality_rational_identity():
    """_PREF_Q_NUM/_PREF_Q_DEN is the quality composite cleared of its
    two divisions: NUM/DEN == 2*(n_stop/n_words) + [n_words >= 20]
    - 5*(n_punct/n_chars) exactly, verified with Fractions over a grid
    including the length-flag boundary."""
    from eecs485_p4_mapreduce_spark.operators.textstats import (
        _PREF_Q_DEN,
        _PREF_Q_NUM,
    )

    # the template is plain integer arithmetic over 3 columns — replay
    # it textually with eval on ints (cast(... as decimal) stripped)
    def render(t, **cols):
        t = re.sub(r"cast\((\w+) as decimal\(38,0\)\)", r"\1", t)
        t = t.replace(
            "CASE WHEN n_words >= 20 THEN 1 ELSE 0 END",
            str(1 if cols["n_words"] >= 20 else 0),
        )
        return eval(t, {}, cols)  # noqa: S307 - test-only, fixed template

    for n_stop, n_words, n_punct, n_chars in [
        (3, 10, 2, 55),
        (7, 19, 0, 90),    # just under the flag
        (7, 20, 0, 90),    # at the flag
        (0, 25, 25, 100),
        (12, 40, 3, 333),
    ]:
        num = render(
            _PREF_Q_NUM,
            n_stop=n_stop,
            n_words=n_words,
            n_punct=n_punct,
            n_chars_txt=n_chars,
        )
        den = render(
            _PREF_Q_DEN,
            n_stop=n_stop,
            n_words=n_words,
            n_punct=n_punct,
            n_chars_txt=n_chars,
        )
        flag = 1 if n_words >= 20 else 0
        assert Fraction(num, den) == (
            2 * Fraction(n_stop, n_words)
            + flag
            - 5 * Fraction(n_punct, n_chars)
        )


# --------------------------------------------------- lerp cleared rational


def test_lerp_rational_identity():
    """_LERP_NUM/_LERP_DEN is linear interpolation cleared of its
    division: NUM/DEN == pv + (nx - pv) * (bucket_s - pt)/(nt - pt)
    exactly (Fractions), anchored at both ends and mid-gap."""
    from eecs485_p4_mapreduce_spark.operators.timeseries import (
        _LERP_DEN,
        _LERP_NUM,
    )

    for pv, nx, pt, nt, bucket_s in [
        (10, 40, 0, 300, 0),      # left anchor -> pv
        (10, 40, 0, 300, 300),    # right anchor -> nx
        (10, 40, 0, 300, 100),
        (-5, 5, 600, 1500, 900),
        (7, 7, 0, 600, 300),      # flat segment
    ]:
        cols = dict(pv=pv, nx=nx, pt=pt, nt=nt, bucket_s=bucket_s)
        num = eval(_LERP_NUM, {}, cols)  # noqa: S307 - fixed template
        den = eval(_LERP_DEN, {}, cols)  # noqa: S307
        assert Fraction(num, den) == pv + Fraction(
            (nx - pv) * (bucket_s - pt), nt - pt
        )
    # anchors resolve exactly
    assert eval(_LERP_NUM, {}, dict(pv=10, nx=40, pt=0, nt=300,
                                    bucket_s=0)) == 10 * 300
    assert eval(_LERP_NUM, {}, dict(pv=10, nx=40, pt=0, nt=300,
                                    bucket_s=300)) == 40 * 300


# ------------------------------------------------ DP Laplace noise replay


def test_dp_noise_matches_python_recount(spark):
    """The md5-replayable Laplace mechanism (_dp_noise_sql, shared
    formula skeleton across both dialect spellings) matches a pure
    Python replay: uniform from the first 8 md5 hex chars, inverse-CDF
    transform, the declared round(ln, 4) quantization, half-up to
    integer — driven on the production Spark expression AND the DuckDB
    twin for a set of key strings."""
    import duckdb

    from pyspark.sql import functions as F

    from eecs485_p4_mapreduce_spark.operators.analytics import (
        _DP_EPS_INV,
        _DP_SALT,
        _dp_noise_sql,
    )

    keys = ["view", "click", "purchase", "scroll", "login", "zz-edge"]

    def py_noise(key: str) -> int:
        h = int(
            hashlib.md5((_DP_SALT + key).encode()).hexdigest()[:8], 16
        )
        u = (h + 0.5) / 4294967296.0
        t = u - 0.5
        sign = 0.0 if t == 0 else math.copysign(1.0, t)
        q4 = float(
            Decimal(math.log(1.0 - 2.0 * abs(t))).quantize(
                Decimal("0.0001"), rounding=ROUND_HALF_UP
            )
        )
        raw = -_DP_EPS_INV * sign * q4
        return int(
            Decimal(raw).quantize(Decimal(1), rounding=ROUND_HALF_UP)
        )

    expect = [py_noise(k) for k in keys]

    df = spark.createDataFrame([(k,) for k in keys], "event_type string")
    got_s = [
        int(r["noise"])
        for r in df.select(
            F.expr(_dp_noise_sql("spark")).alias("noise")
        ).collect()
    ]
    assert got_s == expect, (got_s, expect)

    con = duckdb.connect()
    vals = ", ".join(f"('{k}')" for k in keys)
    got_d = [
        int(r[0])
        for r in con.execute(
            f"SELECT {_dp_noise_sql('duckdb')}"
            f" FROM (VALUES {vals}) AS t(event_type)"
        ).fetchall()
    ]
    assert got_d == expect, (got_d, expect)
