"""int128/decimal(38,0) headroom boundary pins for the squared-sum
rational family (round-10 VERDICT item 1).

Each test drives the PRODUCTION expression strings (module constants,
the _WELCH_AQ discipline) on synthetic PRE-AGGREGATED frames, so the
boundary is demonstrated on exactly the arithmetic the query ships:

- BELOW the documented bound the rendered value equals exact Fraction
  arithmetic (the recipes are genuinely exact, not merely stable);
- PAST the bound the wrap is LOUD (NUMERIC_VALUE_OUT_OF_RANGE), never
  a silently wrong number — which is the failure mode the docstrings'
  decision rules promise before pointing at the shard / two-pass /
  rescale escape hatches (relational2.twopass_var is the pinned
  variance-family spelling).
"""

from __future__ import annotations

from fractions import Fraction

import pytest
from pyspark.sql import functions as F

from eecs485_p4_mapreduce_spark.functions.numeric import (
    hu_ratio,
    hu_ratio_signed,
)


def _half_away(num: int, den: int, digits: int) -> int:
    """Exact round-half-away-from-zero of num/den at `digits` decimals,
    as the scaled integer (the recipe's contract)."""
    frac = Fraction(num * 10**digits, den)
    sgn = -1 if frac < 0 else 1
    a = abs(frac)
    q = a.numerator // a.denominator
    if a - q >= Fraction(1, 2):
        q += 1
    return sgn * q


_OVERFLOW = "NUMERIC_VALUE_OUT_OF_RANGE"


def test_dimstat_variance_exact_below_bound_loud_above(spark):
    """embedding_dim_stats' single-pass variance rational
    (_DIMSTAT_VAR_NUM/_DEN): exact at realistic magnitudes; the
    render's 2*|num|*10^6 binds at num <= 5e31 (~5e7 rows/dim for
    unit-norm 64-dim embeddings) and wraps loudly past it."""
    from eecs485_p4_mapreduce_spark.plans import REGISTRY  # noqa: F401
    from eecs485_p4_mapreduce_spark.operators.similarity import (
        _DIMSTAT_VAR_DEN,
        _DIMSTAT_VAR_NUM,
    )

    # in-bound: n = 1e7 rows/dim of unit-norm-embedding-scale stats
    # (pre-aggregated frame); the render's 2*|num|*10^6 is the binding
    # factor, so num = n^2*E[x^2]*10^18 must stay <= 5e31
    n, sx9, sxx15 = 10**7, 123_456_789_012_345, 2 * 10**20
    sxd = f"{sx9 // 10**9}.{sx9 % 10**9:09d}"
    sxxd = f"{sxx15 // 10**15}.{sxx15 % 10**15:015d}"
    g = spark.sql(
        f"SELECT cast({n} as bigint) AS n,"
        f" cast('{sxd}' as decimal(38,9)) AS sxd,"
        f" cast('{sxxd}' as decimal(38,15)) AS sxxd"
    )
    got = g.select(
        hu_ratio_signed(_DIMSTAT_VAR_NUM, _DIMSTAT_VAR_DEN, 6).alias("v")
    ).collect()[0]["v"]
    true_num = n * sxx15 * 1000 - sx9 * sx9
    true_den = n * n * 10**18
    assert got == float(_half_away(true_num, true_den, 6)) / 10**6
    # past the bound: n = 1e9 at E[x^2] = 0.7 ->
    # 2 * num * 10^6 ~ 1.4e42 > decimal(38,0)
    big = spark.sql(
        "SELECT cast(1000000000 as bigint) AS n,"
        " cast(1 as decimal(38,9)) AS sxd,"
        " cast(700000000000 as decimal(38,15)) AS sxxd"
    )
    with pytest.raises(Exception, match=_OVERFLOW):
        big.select(
            hu_ratio_signed(_DIMSTAT_VAR_NUM, _DIMSTAT_VAR_DEN, 6)
        ).collect()


def test_dimstat_q4_survives_where_exact_form_wraps(spark):
    """embedding_dim_stats_q4's quantized rational
    (_DIMSTAT_Q4_VAR_NUM/_DEN) at n = 1e9 rows/dim — the row count
    where the EXACT form's render provably wraps (previous test) —
    stays exact: the declared floor(x*10^4) grid drops the render
    factor from 2*n^2*E[x^2]*10^24 to 2*n^2*E[x4^2]*10^4, pushing the
    bound past 1e12 rows/dim.  This pins the quantization-drop escape
    as IMPLEMENTED for the dim-stats family."""
    from eecs485_p4_mapreduce_spark.operators.similarity import (
        _DIMSTAT_Q4_VAR_DEN,
        _DIMSTAT_Q4_VAR_NUM,
    )

    # n = 1e9 rows at E[x^2] = 0.7 (the exact form's wrap scenario):
    # x4 magnitudes ~ 8366, E[x4^2] ~ 7e7 -> sxx8 = 7e16, sx4 = 1e10
    n, sx4, sxx8 = 10**9, 10**10, 7 * 10**16
    g = spark.sql(
        f"SELECT cast({n} as bigint) AS n,"
        f" cast({sx4} as decimal(38,0)) AS sx4,"
        f" cast({sxx8} as decimal(38,0)) AS sxx8"
    )
    got = g.select(
        hu_ratio_signed(_DIMSTAT_Q4_VAR_NUM, _DIMSTAT_Q4_VAR_DEN, 4).alias("v")
    ).collect()[0]["v"]
    true_num = n * sxx8 - sx4 * sx4
    true_den = n * n * 10**8
    assert got == float(_half_away(true_num, true_den, 4)) / 10**4
    # headroom to spare: the render factor at 1e12 rows is still inside
    # decimal(38,0) (2 * (1e24 * 7e7) * 1e4 = 1.4e36 < 1e38)
    assert 2 * (10**12) ** 2 * (7 * 10**7) * 10**4 < 10**38


def test_chi_square_cell_exact_below_bound_loud_above(spark):
    """stats_chi_square_independence's per-cell rational
    (_CHI_NUM/_CHI_DEN): exact while |o*n - r*c| <= ~7e15 (~8e8
    events at percent-level deviations); wraps loudly past it."""
    from eecs485_p4_mapreduce_spark.plans import REGISTRY  # noqa: F401
    from eecs485_p4_mapreduce_spark.operators.timeseries import (
        _CHI_DEN,
        _CHI_NUM,
    )

    # |o*n - r*c| must stay <= ~7e15 (the render's 2*d^2*10^6 factor)
    o, r, c, n = 12_345_678, 50_000_000, 40_000_000, 200_000_000
    cell = spark.sql(
        f"SELECT cast({o} as bigint) AS o, cast({r} as bigint) AS r,"
        f" cast({c} as bigint) AS c, cast({n} as bigint) AS n"
    )
    got = cell.select(hu_ratio(_CHI_NUM, _CHI_DEN, 6).alias("v")).collect()[
        0
    ]["v"]
    d = o * n - r * c
    assert got == float(_half_away(d * d, n * r * c, 6)) / 10**6
    # a percent-level deviation at n = 2e9 puts d ~ 4.7e16 ->
    # 2 * d^2 * 10^6 ~ 4e39 wraps decimal(38,0)
    hot = spark.sql(
        "SELECT cast(123456789 as bigint) AS o,"
        " cast(500000000 as bigint) AS r,"
        " cast(400000000 as bigint) AS c,"
        " cast(2000000000 as bigint) AS n"
    )
    with pytest.raises(Exception, match=_OVERFLOW):
        hot.select(hu_ratio(_CHI_NUM, _CHI_DEN, 6)).collect()


def test_chi_q4_survives_where_exact_form_wraps(spark):
    """stats_chi_square_q4's quantized term (_CHI_Q4_TERM) at the hot
    scenario where the exact rational's render provably wraps (previous
    test): d stays exact int128, the contribution is correctly-rounded
    double arithmetic floored onto the declared 1e-4 grid — Python
    floats are the same IEEE doubles, so the expected value is computed
    with the identical operation sequence."""
    import math

    from eecs485_p4_mapreduce_spark.operators.timeseries import _CHI_Q4_TERM

    o, r, c, n = 123_456_789, 500_000_000, 400_000_000, 2_000_000_000
    hot = spark.sql(
        f"SELECT cast({o} as bigint) AS o, cast({r} as bigint) AS r,"
        f" cast({c} as bigint) AS c, cast({n} as bigint) AS n"
    )
    got = hot.select(F.expr(_CHI_Q4_TERM).alias("t4")).collect()[0]["t4"]
    d = o * n - r * c
    expect = math.floor(
        ((float(d) * float(d)) / ((float(n) * float(r)) * float(c))) * 10000.0
    )
    assert int(got) == expect
    # and at 1e14 events (past 100 TB): t4 <= n*10^4 stays in bigint
    o2, r2, c2, n2 = 10**13, 3 * 10**13, 2 * 10**13, 10**14
    big = spark.sql(
        f"SELECT cast({o2} as bigint) AS o, cast({r2} as bigint) AS r,"
        f" cast({c2} as bigint) AS c, cast({n2} as bigint) AS n"
    )
    got2 = big.select(F.expr(_CHI_Q4_TERM).alias("t4")).collect()[0]["t4"]
    d2 = o2 * n2 - r2 * c2
    assert int(got2) == math.floor(
        ((float(d2) * float(d2)) / ((float(n2) * float(r2)) * float(c2)))
        * 10000.0
    )


def test_brier_resolution_q4_survives_where_exact_form_wraps(spark):
    """eval_brier_resolution_q4's quantized term (_BRIER_Q4_TERM) at the
    hot scenario where the exact resolution render provably wraps (next
    test): bin/base rates render half-up onto the 1e-4 grid first, so
    the term is <= n_k*10^8 and the 6-digit render holds to ~8e23
    rows."""
    from eecs485_p4_mapreduce_spark.operators.similarity import (
        _BRIER_Q4_TERM,
    )

    n_k, sy, n, sy_tot = 10**9, 4 * 10**8, 10**10, 6 * 10**9
    hot = spark.sql(
        f"SELECT cast({n_k} as bigint) AS n_k, cast({sy} as bigint) AS sy,"
        f" cast({n} as bigint) AS n, cast({sy_tot} as bigint) AS sy_tot"
    )
    got = hot.select(
        F.expr(_BRIER_Q4_TERM).alias("term"),
        hu_ratio(
            _BRIER_Q4_TERM, "cast(n as decimal(38,0)) * 100000000", 6
        ).alias("res"),
    ).collect()[0]
    rate4 = (2 * sy * 10**4 + n_k) // (2 * n_k)
    base4 = (2 * sy_tot * 10**4 + n) // (2 * n)
    term = n_k * (rate4 - base4) ** 2
    assert int(got["term"]) == term
    assert got["res"] == float(_half_away(term, n * 10**8, 6)) / 10**6
    # headroom: even at n = 1e20 rows the render factor fits
    assert 2 * (10**20 * 10**8) * 10**6 < 10**38


def test_brier_terms_exact_below_bound_loud_above(spark):
    """eval_brier_decomposition's per-bin squares (_BRIER_DREL/_DRES):
    each deviation square binds at |dev| <= ~2.2e14 through the
    render's 2*dev^2*10^8 factor; RESOLUTION's dev ~ n_k*n*gap binds
    first (~1e8 total rows at a 20% gap) and wraps loudly past it —
    the docstring's declared-quantization-drop rule."""
    from eecs485_p4_mapreduce_spark.plans import REGISTRY  # noqa: F401
    from eecs485_p4_mapreduce_spark.operators.similarity import (
        _BRIER_DREL,
        _BRIER_DRES,
    )

    # |dres| = |sy*n - n_k*sy_tot| must stay <= ~2.2e14 (the render's
    # 2*dres^2*10^8 factor)
    n_k, sp, sy, n, sy_tot = (
        10**6,
        37 * 10**8,
        4 * 10**5,
        10**7,
        6 * 10**6,
    )
    b = spark.sql(
        f"SELECT cast({n_k} as bigint) AS n_k, cast({sp} as bigint) AS sp,"
        f" cast({sy} as bigint) AS sy, cast({n} as bigint) AS n,"
        f" cast({sy_tot} as bigint) AS sy_tot"
    )
    got = b.select(
        hu_ratio(
            f"{_BRIER_DREL} * {_BRIER_DREL}",
            "cast(n_k as decimal(38,0)) * 100000000",
            8,
        ).alias("t_rel"),
        hu_ratio(
            f"{_BRIER_DRES} * {_BRIER_DRES}",
            "cast(n_k as decimal(38,0)) * n * n",
            8,
        ).alias("t_res"),
    ).collect()[0]
    drel, dres = sp - 10**4 * sy, sy * n - n_k * sy_tot
    assert got["t_rel"] == float(
        _half_away(drel * drel, n_k * 10**8, 8)
    ) / 10**8
    assert got["t_res"] == float(
        _half_away(dres * dres, n_k * n * n, 8)
    ) / 10**8
    # a 20% calibration gap at n = 1e10, n_k = 1e9 puts dres ~ 2e18 ->
    # 2 * dres^2 * 10^8 ~ 8e44 wraps decimal(38,0)
    hot = spark.sql(
        "SELECT cast(1000000000 as bigint) AS n_k,"
        " cast(1 as bigint) AS sp, cast(400000000 as bigint) AS sy,"
        " cast(10000000000 as bigint) AS n,"
        " cast(6000000000 as bigint) AS sy_tot"
    )
    with pytest.raises(Exception, match=_OVERFLOW):
        hot.select(
            hu_ratio(
                f"{_BRIER_DRES} * {_BRIER_DRES}",
                "cast(n_k as decimal(38,0)) * n * n",
                8,
            )
        ).collect()


def test_covar_exact_below_bound_loud_above(spark):
    """stats_correlation's covariance rational (_CORR_COV_NUM/_DEN):
    exact to ~2e7 rows per group at TPC-H magnitudes (the render's
    2*|num|*10^6 needs num = n^2*E[xy]*10^12 <= 5e31); wraps loudly
    past it (then: two-pass centering + declared quantization drop,
    per the docstring's decision rule)."""
    from eecs485_p4_mapreduce_spark.plans import REGISTRY  # noqa: F401
    from eecs485_p4_mapreduce_spark.operators.analytics import (
        _CORR_COV_DEN,
        _CORR_COV_NUM,
    )

    # 1e6 rows, mean qty ~25 (10^6 scale), mean price ~3e4 (10^6),
    # cross-moment ~9e5 per row (10^12 scale); the render's
    # 2*|num|*10^6 factor needs num = n^2*E[xy]*10^12 <= 5e31
    n = 10**6
    sx6, sy6, sxy12 = 25 * 10**6 * n + 7, 3 * 10**10 * n + 11, (
        9 * 10**17
    ) * n + 13
    sxd = f"{sx6 // 10**6}.{sx6 % 10**6:06d}"
    syd = f"{sy6 // 10**6}.{sy6 % 10**6:06d}"
    sxyd = f"{sxy12 // 10**12}.{sxy12 % 10**12:012d}"
    s = spark.sql(
        f"SELECT cast({n} as bigint) AS n,"
        f" cast('{sxd}' as decimal(38,6)) AS sxd,"
        f" cast('{syd}' as decimal(38,6)) AS syd,"
        f" cast('{sxyd}' as decimal(38,12)) AS sxyd"
    )
    got = s.select(
        hu_ratio_signed(_CORR_COV_NUM, _CORR_COV_DEN, 6).alias("v")
    ).collect()[0]["v"]
    true_num = n * sxy12 - sx6 * sy6
    true_den = n * (n - 1) * 10**12
    assert got == float(_half_away(true_num, true_den, 6)) / 10**6
    # TPC-H magnitudes at n = 1e9: num ~ 9e35 ->
    # 2 * num * 10^6 ~ 1.8e42 > decimal(38,0)
    big = spark.sql(
        "SELECT cast(1000000000 as bigint) AS n,"
        " cast(25000000000 as decimal(38,6)) AS sxd,"
        " cast(30000000000000 as decimal(38,6)) AS syd,"
        " cast(900000000000000000000000 as decimal(38,12)) AS sxyd"
    )
    with pytest.raises(Exception, match=_OVERFLOW):
        big.select(
            hu_ratio_signed(_CORR_COV_NUM, _CORR_COV_DEN, 6)
        ).collect()


def test_logreg_prescaled_sum_matches_sum_then_scale(spark):
    """ml_logreg_gradient_step's pre-scaled numerator
    (_LOGREG_GRAD_NUM) is term-for-term identical to the old
    sum-then-scale spelling (10^15 * a 15-fraction-digit decimal is
    lossless), and the only remaining cap is the render recipe's own
    2 * |num| * 10^6 — ~5e16 rows of |err * x| <= 1."""
    import random

    from eecs485_p4_mapreduce_spark.plans import REGISTRY  # noqa: F401
    from eecs485_p4_mapreduce_spark.operators.linalg import (
        _LOGREG_GRAD_NUM,
    )

    rng = random.Random(20260816)
    vals = [
        (round(rng.uniform(-1, 1), 4), rng.uniform(-1, 1))
        for _ in range(500)
    ] + [(0.0001, 1e-17), (-0.9999, 0.9999999999999), (1.0, -1.0)]
    df = spark.createDataFrame(vals, "err double, x double")
    old = "sum(cast(err * x as decimal(30,15))) * 1000000000000000"
    row = df.selectExpr(
        f"cast({_LOGREG_GRAD_NUM} as decimal(38,0)) AS new",
        f"cast({old} as decimal(38,0)) AS old",
    ).collect()[0]
    assert row["new"] == row["old"]
    # and the production render is exact vs Fraction on those terms
    n = len(vals)
    got = df.select(
        hu_ratio_signed(
            _LOGREG_GRAD_NUM,
            f"cast({n} as decimal(38,0)) * 1000000000000000",
            6,
        ).alias("g")
    ).collect()[0]["g"]
    # mirror the engine: per-term IEEE double product, HALF_UP cast to
    # 15 decimals (Spark's double -> decimal cast rounding)
    from decimal import ROUND_HALF_UP, Decimal

    terms = [
        int(
            Decimal(e * x).quantize(
                Decimal("1e-15"), rounding=ROUND_HALF_UP
            )
            * 10**15
        )
        for e, x in vals
    ]
    s = sum(terms)
    assert got == float(_half_away(s, n * 10**15, 6)) / 10**6


def test_ols_cramer_exact_below_bound_loud_above(spark):
    """ml_ols_normal_equation's Cramer rationals (_OLS_DN/_OLS_D1):
    exact at realistic magnitudes (hour <= 23, dow <= 6, y 1e-6-scaled
    at |value| ~ 1e2); the render's 2*|det_j|*10^6 binds around ~1e8
    rows (det_j ~ n^3 * feature-scale^4 * 1e8) and wraps loudly past
    it — the docstring's escape is CENTERING the features (moments
    shift exactly), never sharding."""
    from eecs485_p4_mapreduce_spark.operators.linalg import (
        _OLS_D1,
        _OLS_DN,
    )

    def frame(n):
        # synthetic-but-consistent Gram moments: x1 ~ 11.5 mean hour,
        # x2 ~ 3 mean dow, y6 ~ 5e7 (value ~ 50)
        s1, s2 = n * 23 // 2, n * 3
        s11, s22, s12 = n * 180, n * 12, n * 35
        sy = n * 5 * 10**7
        s1y, s2y = s1 * 5 * 10**7 + n * 10**6, s2 * 5 * 10**7 - n * 10**5
        cols = dict(n=n, s1=s1, s2=s2, s11=s11, s22=s22, s12=s12,
                    sy=sy, s1y=s1y, s2y=s2y)
        sql = ", ".join(
            f"cast({v} as decimal(38,0)) AS {k}" for k, v in cols.items()
        )
        return spark.sql(f"SELECT {sql}"), cols

    g, c = frame(10**6)  # in-bound: 1e6 rows
    got = g.select(
        hu_ratio_signed(_OLS_D1, f"{_OLS_DN} * 1000000", 6).alias("b1")
    ).collect()[0]["b1"]
    dn = (c["n"] * (c["s11"] * c["s22"] - c["s12"] ** 2)
          - c["s1"] * (c["s1"] * c["s22"] - c["s12"] * c["s2"])
          + c["s2"] * (c["s1"] * c["s12"] - c["s11"] * c["s2"]))
    d1 = (c["n"] * (c["s1y"] * c["s22"] - c["s12"] * c["s2y"])
          - c["sy"] * (c["s1"] * c["s22"] - c["s12"] * c["s2"])
          + c["s2"] * (c["s1"] * c["s2y"] - c["s1y"] * c["s2"]))
    assert got == float(_half_away(d1, dn * 10**6, 6)) / 10**6
    # past the bound: 1e10 rows -> det_j ~ 1e30*... and the render's
    # 2*|d1|*1e6 clears decimal(38,0)
    big, _ = frame(10**10)
    with pytest.raises(Exception, match=_OVERFLOW):
        big.select(
            hu_ratio_signed(_OLS_D1, f"{_OLS_DN} * 1000000", 6).alias("b1")
        ).collect()


def test_calibration_intercept_exact_below_bound_loud_above(spark):
    """eval_calibration_regression's intercept rational (the
    cross-multiplication-cleared 2x2 Cramer form): exact at realistic
    magnitudes (p_bp <= 1e4); the intercept numerator carries
    sy*(n*spp - sp^2) ~ n^3 * 1e8, so the render binds around ~1e7
    rows and wraps loudly past it — the docstring's escape is
    centering p (the moments shift exactly)."""

    def frame(n):
        sp = n * 5000
        spp = n * 35 * 10**6
        sy = n // 2
        spy = n * 2700
        cols = dict(n=n, sp=sp, spp=spp, sy=sy, spy=spy)
        sql = ", ".join(
            f"cast({v} as decimal(38,0)) AS {k}" for k, v in cols.items()
        )
        return spark.sql(f"SELECT {sql}"), cols

    num = "sy * (n * spp - sp * sp) - (n * spy - sp * sy) * sp"
    den = "n * (n * spp - sp * sp)"
    g, c = frame(10**6)
    got = g.select(
        hu_ratio_signed(num, den, 6).alias("a")
    ).collect()[0]["a"]
    tnum = (c["sy"] * (c["n"] * c["spp"] - c["sp"] ** 2)
            - (c["n"] * c["spy"] - c["sp"] * c["sy"]) * c["sp"])
    tden = c["n"] * (c["n"] * c["spp"] - c["sp"] ** 2)
    assert got == float(_half_away(tnum, tden, 6)) / 10**6
    big, _ = frame(10**9)
    with pytest.raises(Exception, match=_OVERFLOW):
        big.select(hu_ratio_signed(num, den, 6).alias("a")).collect()
