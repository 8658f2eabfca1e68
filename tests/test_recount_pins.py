"""Engine-independent recount pins for shared-template queries.

Every query here renders its readout through a formula template (a
Python-generated expression string, an ``hu_ratio`` recipe, or an
integer-rational spelling) that is SHARED between the Spark body and
the DuckDB oracle — so the 445/445 oracle sweeps cannot catch a bug in
the template itself.  Each test replays the declared recipe in pure
Python (Fraction / hashlib / integer arithmetic) on an injected
adversarial corpus (or, for the band-graph query, on the production
edge set) and requires exact agreement, plus — where the production
spelling is an algebraically collapsed form — a Fraction cross-check
that the collapsed form equals the textbook formula.

These are the round-12 verdict's item-1 pins; the inventory that maps
each shared-template query to its pin lives in
tests/test_template_inventory.py.
"""

from __future__ import annotations

import datetime as dt
import hashlib
import math
from fractions import Fraction

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


# ---------------------------------------------------------------- helpers


def hu(num: int, den: int, n: int) -> float:
    """Python replica of functions/numeric.py::hu_ratio (half-up)."""
    p = 10**n
    return float((2 * num * p + den) // (2 * den)) / p


def hus(num: int, den: int, n: int):
    """Python replica of hu_ratio_signed (half-away-from-zero)."""
    if den == 0:
        return None
    p = 10**n
    s = -1 if (num < 0) != (den < 0) else 1
    return float(s * ((2 * abs(num) * p + abs(den)) // (2 * abs(den)))) / p


def bucket256(key: str) -> int:
    """Python replica of sampling._bucket256_sql: first md5 hex byte."""
    return int(hashlib.md5(key.encode()).hexdigest()[:2], 16)


def write_events(path, rows):
    """rows: (event_id, ts, user_id, event_type, value)."""
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": [r[3] for r in rows],
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": ["{}"] * len(rows),
        }
    )
    pq.write_table(tbl, f"{path}/events.parquet")


def write_documents(path, rows):
    """rows: (doc_id, text, lang, source, n_chars)."""
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": [r[1] for r in rows],
            "lang": [r[2] for r in rows],
            "source": [r[3] for r in rows],
            "n_chars": pa.array([r[4] for r in rows], pa.int64()),
        }
    )
    pq.write_table(tbl, f"{path}/documents.parquet")


def run(spark, name, sf_dir):
    from eecs485_p4_mapreduce_spark.plans import REGISTRY

    return REGISTRY[name].fn(spark, str(sf_dir)).collect()


EPOCH = dt.datetime(1970, 1, 1)


def eus(d: dt.datetime) -> int:
    return int((d - EPOCH) // dt.timedelta(microseconds=1))


# ------------------------------------------------- survival_nelson_aalen


def test_nelson_aalen_matches_python_recount(spark, tmp_path):
    """Life-table recount on an injected corpus with a duplicate
    duration, an extinction-adjacent tail, and two censored users:
    the at-risk suffix, the 1e-6 hazard grid, the integer cumulative
    hazard and the Breslow transform must match a pure-Python replay
    of the declared recipe."""
    d0 = dt.datetime(2024, 6, 1, 8, 0, 0)
    day = dt.timedelta(days=1)
    rows, eid = [], 0

    def span(u, f, l):
        nonlocal eid
        rows.append((eid, f, u, "view", 1.0))
        eid += 1
        if l != f:
            rows.append((eid, l, u, "view", 1.0))
            eid += 1

    span(1, d0, d0 + dt.timedelta(hours=1))          # dur 0, death
    span(2, d0, d0 + day)                            # dur 1, death
    span(3, d0 + 2 * day, d0 + 3 * day + dt.timedelta(hours=2))  # dur 1
    span(4, d0, d0 + 5 * day)                        # dur 5, death
    span(5, d0 + day, d0 + 9 * day + dt.timedelta(hours=12))  # censored
    span(6, d0, d0 + 10 * day)                       # head; censored
    write_events(tmp_path, rows)

    # pure-Python life table off the same raw rows
    users = {}
    for _, ts, u, _, _ in rows:
        f, l = users.get(u, (ts, ts))
        users[u] = (min(f, ts), max(l, ts))
    head = max(l for _, l in users.values())
    DAY_US = 86400 * 10**6
    hist = {}
    for f, l in users.values():
        dur = (eus(l) - eus(f)) // DAY_US
        death = 1 if (eus(head) - eus(l)) // DAY_US >= 3 else 0
        n_exit, n_death = hist.get(dur, (0, 0))
        hist[dur] = (n_exit + 1, n_death + death)
    durs = sorted(hist)
    expect, ch6 = [], 0
    for i, dur in enumerate(durs):
        at_risk = sum(hist[d][0] for d in durs[i:])
        deaths = hist[dur][1]
        haz6 = (2 * deaths * 10**6 + at_risk) // (2 * at_risk)
        ch6 += haz6
        expect.append(
            (
                dur,
                at_risk,
                deaths,
                float(haz6) / 10**6,
                float(ch6) / 10**6,
                round(math.exp(-(float(ch6) / 10**6)), 4),
            )
        )

    got = sorted(
        (
            r["dur_days"],
            r["n_at_risk"],
            r["n_deaths"],
            r["hazard"],
            r["cum_hazard"],
            r["breslow_survival"],
        )
        for r in run(spark, "survival_nelson_aalen", tmp_path)
    )
    assert got == expect, got


# -------------------------------------------- privacy_randomized_response


def test_randomized_response_matches_python_recount(spark, tmp_path):
    """Warner-mechanism recount: replay both md5 hex-digit coins and
    the signed debias rational (4*reported - n)/(2n) with hashlib +
    integer arithmetic; small cohorts are engineered so one nation's
    estimate goes negative (the signed branch)."""
    rows = []
    for ck in range(1, 41):
        rows.append(
            (ck, f"Customer{ck}", 1, 10.0,
             "BUILDING" if ck % 3 == 0 else "MACHINERY")
        )
    # nation 2: all-MACHINERY custkeys picked so most coins report 0
    # (reported < n/4), forcing the debiased estimate negative
    for ck in [61, 62, 63, 64, 65, 66, 67, 69, 70, 72, 74, 76, 68]:
        rows.append((ck, f"Customer{ck}", 2, 10.0, "MACHINERY"))
    tbl = pa.table(
        {
            "c_custkey": pa.array([r[0] for r in rows], pa.int64()),
            "c_name": [r[1] for r in rows],
            "c_nationkey": pa.array([r[2] for r in rows], pa.int32()),
            "c_acctbal": pa.array([r[3] for r in rows], pa.float64()),
            "c_mktsegment": [r[4] for r in rows],
        }
    )
    pq.write_table(tbl, tmp_path / "customer.parquet")

    agg = {}
    for ck, _, nk, _, seg in rows:
        h = hashlib.md5(str(ck).encode()).hexdigest()
        truth = 1 if seg == "BUILDING" else 0
        reported = truth if h[0] < "8" else (1 if h[1] < "8" else 0)
        n, nr, nt = agg.get(nk, (0, 0, 0))
        agg[nk] = (n + 1, nr + reported, nt + truth)
    expect = sorted(
        (
            nk,
            n,
            nr,
            hus(4 * nr - n, 2 * n, 6),
            hu(nt, n, 6),
        )
        for nk, (n, nr, nt) in agg.items()
    )
    got = sorted(
        (
            r["c_nationkey"],
            r["n"],
            r["n_reported"],
            r["est_rate"],
            r["true_rate"],
        )
        for r in run(spark, "privacy_randomized_response", tmp_path)
    )
    assert got == expect, got
    # the signed branch is actually exercised
    assert any(e[3] < 0 for e in expect)


# ------------------------------------------------- corpus_token_burstiness


def test_burstiness_matches_python_recount(spark, tmp_path):
    """Fano recount: a clumped token (30x in each of 2 docs), a Poisson
    token (1x in each of 60 docs), and a below-threshold token (cf=49)
    — the exact rational (N*sff - cf^2)/(N*cf) replayed with integers,
    zeros-included semantics verified by construction."""
    rows = []
    for i in range(60):
        text = f"aaa filler{i}"
        if i < 2:
            text += " zzz" * 30
        if i < 49:
            text += " bbb"
        rows.append((i, text, "en", "web", len(text)))
    write_documents(tmp_path, rows)

    # python recount: tokenize = lowercase whitespace split
    from collections import Counter, defaultdict

    per_term = defaultdict(lambda: [0, 0])  # cf, sff
    for _, text, _, _, _ in rows:
        for term, tf in Counter(text.lower().split()).items():
            per_term[term][0] += tf
            per_term[term][1] += tf * tf
    n_docs = len(rows)
    f = [
        (term, cf, hu(n_docs * sff - cf * cf, n_docs * cf, 6))
        for term, (cf, sff) in per_term.items()
        if cf >= 50
    ]
    assert "bbb" not in {t for t, _, _ in f}  # threshold bites
    f.sort(key=lambda t: (-t[2], t[0]))
    expect = f[:20]

    got = [
        (r["term"], r["cf"], r["fano"])
        for r in run(spark, "corpus_token_burstiness", tmp_path)
    ]
    assert got == expect, got
    # the clumped token leads with Fano >> 1; the uniform one sits at 0
    assert got[0][0] == "zzz" and got[0][2] > 10
    assert ("aaa", 60, 0.0) in got


# --------------------------------------------------- pipeline_snapshot_diff


def test_snapshot_diff_matches_python_recount(spark, tmp_path):
    """Membership recount: replay the md5 doc_id bucketing (v1 =
    0..229, v2 = 26..255) with hashlib and recount all six counters
    per language."""
    rows = [
        (i, f"doc {i}", "en" if i % 3 else "de", "web", 50 + 7 * i)
        for i in range(1, 201)
    ]
    write_documents(tmp_path, rows)

    agg = {}
    for doc_id, _, lang, _, n_chars in rows:
        b = bucket256(str(doc_id))
        state = "removed" if b < 26 else ("added" if b >= 230 else "common")
        a = agg.setdefault(lang, [0, 0, 0, 0, 0, 0])
        if state == "added":
            a[0] += 1
            a[3] += n_chars
            a[5] += n_chars
        elif state == "removed":
            a[1] += 1
            a[4] += n_chars
            a[5] -= n_chars
        else:
            a[2] += 1
    expect = sorted((lang, *vals) for lang, vals in agg.items())
    got = sorted(
        (
            r["lang"],
            r["n_added"],
            r["n_removed"],
            r["n_common"],
            r["chars_added"],
            r["chars_removed"],
            r["net_char_delta"],
        )
        for r in run(spark, "pipeline_snapshot_diff", tmp_path)
    )
    assert got == expect, got
    assert any(a[1] and a[2] for a in agg.values())  # non-degenerate diff


# ------------------------------------------------------- rl_group_advantage


def test_rl_group_advantage_matches_python_recount(spark, tmp_path):
    """GRPO advantage recount: dyadic reward values (lossless 1e-6
    quantization), a singleton group that must be dropped, and a
    |advantage| tie broken by (user_id, event_id); top-20 replayed
    with exact signed rationals."""
    base = dt.datetime(2024, 2, 1)
    vals = {
        1: [0.25, 1.5, -2.75, 4.0],
        2: [10.5, -10.5],          # symmetric: |adv| tie inside group
        3: [7.0],                  # singleton: dropped
        4: [0.125 * k for k in range(8)],
        5: [3.5, 3.5, 3.5],        # all-equal: zero advantages
        6: [100.0, -50.0, 25.0, -12.5, 6.25],
    }
    rows, eid = [], 0
    for u, vs in vals.items():
        for v in vs:
            rows.append((eid, base + dt.timedelta(minutes=eid), u, "view", v))
            eid += 1
    write_events(tmp_path, rows)

    adv = []
    for u, vs in vals.items():
        n = len(vs)
        if n < 2:
            continue
        v6s = [round(v * 10**6) for v in vs]  # dyadic -> exact
        s6 = sum(v6s)
        eids = [e for e, _, uu, _, _ in rows if uu == u]
        for e, v6 in zip(eids, v6s):
            adv.append((e, u, n, hus(v6 * n - s6, n * 10**6, 6)))
    adv.sort(key=lambda t: (-abs(t[3]), t[1], t[0]))
    expect = adv[:20]

    got = [
        (r["event_id"], r["user_id"], r["group_n"], r["advantage"])
        for r in run(spark, "rl_group_advantage", tmp_path)
    ]
    assert got == expect, got
    assert all(r[1] != 3 for r in got)  # singleton group absent


# ------------------------------------------- dq_functional_dependency_audit


def test_dq_fd_audit_matches_python_recount(spark, tmp_path):
    """FD-violation recount over four injected tables with known
    determinacy breaks; exact group counters + half-up rates."""
    customer = [
        (1, "a", 1, 0.0, "BUILDING"),
        (2, "b", 1, 0.0, "MACHINERY"),   # nation 1 violates
        (3, "c", 2, 0.0, "BUILDING"),
        (4, "d", 2, 0.0, "BUILDING"),
        (5, "e", 3, 0.0, "AUTOMOBILE"),
    ]
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array([r[0] for r in customer], pa.int64()),
                "c_name": [r[1] for r in customer],
                "c_nationkey": pa.array([r[2] for r in customer], pa.int32()),
                "c_acctbal": pa.array([r[3] for r in customer], pa.float64()),
                "c_mktsegment": [r[4] for r in customer],
            }
        ),
        tmp_path / "customer.parquet",
    )
    li = [(1, "A"), (1, "A"), (2, "A"), (2, "R"), (3, "N")]  # order 2 violates
    d = dt.date(2024, 1, 1)
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array([r[0] for r in li], pa.int64()),
                "l_partkey": pa.array([1] * len(li), pa.int64()),
                "l_suppkey": pa.array([1] * len(li), pa.int64()),
                "l_linenumber": pa.array(list(range(len(li))), pa.int32()),
                "l_quantity": pa.array([1.0] * len(li), pa.float64()),
                "l_extendedprice": pa.array([1.0] * len(li), pa.float64()),
                "l_discount": pa.array([0.0] * len(li), pa.float64()),
                "l_tax": pa.array([0.0] * len(li), pa.float64()),
                "l_returnflag": [r[1] for r in li],
                "l_linestatus": ["O"] * len(li),
                "l_shipdate": pa.array([d] * len(li), pa.date32()),
            }
        ),
        tmp_path / "lineitem.parquet",
    )
    nation = [(1, "ALPHA", 1), (2, "BETA", 1), (3, "GAMMA", 2)]  # no violation
    pq.write_table(
        pa.table(
            {
                "n_nationkey": pa.array([r[0] for r in nation], pa.int32()),
                "n_name": [r[1] for r in nation],
                "n_regionkey": pa.array([r[2] for r in nation], pa.int32()),
            }
        ),
        tmp_path / "nation.parquet",
    )
    orders = [
        (1, 10, "O"),
        (2, 10, "F"),   # cust 10 violates
        (3, 11, "O"),
        (4, 12, "O"),
        (5, 12, "O"),
    ]
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array([r[0] for r in orders], pa.int64()),
                "o_custkey": pa.array([r[1] for r in orders], pa.int64()),
                "o_orderstatus": [r[2] for r in orders],
                "o_totalprice": pa.array([1.0] * len(orders), pa.float64()),
                "o_orderdate": pa.array(
                    [dt.datetime(2024, 1, 1)] * len(orders),
                    pa.timestamp("us"),
                ),
                "o_orderpriority": ["1-URGENT"] * len(orders),
            }
        ),
        tmp_path / "orders.parquet",
    )

    def fd(pairs):
        groups = {}
        for lhs, rhs in pairs:
            groups.setdefault(lhs, set()).add(rhs)
        n = len(groups)
        v = sum(1 for s in groups.values() if len(s) > 1)
        return n, v, hu(v, n, 6)

    expect = sorted(
        [
            ("custkey->orderstatus", *fd([(r[1], r[2]) for r in orders])),
            ("nation->mktsegment", *fd([(r[2], r[4]) for r in customer])),
            ("orderkey->returnflag", *fd(li)),
            ("regionkey->nationname", *fd([(r[2], r[1]) for r in nation])),
        ]
    )
    got = [
        (r["fd"], r["n_groups"], r["n_violating"], r["violation_rate"])
        for r in run(spark, "dq_functional_dependency_audit", tmp_path)
    ]
    assert got == expect, got


# ----------------------------------------------------------- dq_id_gap_audit


def test_dq_id_gap_matches_python_recount(spark, tmp_path):
    """Key-continuity recount: a gapped key set with a DUPLICATE id
    (distinct < row count), a contiguous one, and a sparse one."""
    keysets = {
        "orders": ("o_orderkey", [1, 2, 3, 7, 7]),
        "customer": ("c_custkey", [10, 11, 12, 13, 14, 15]),
        "part": ("p_partkey", [5, 9]),
    }
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(keysets["orders"][1], pa.int64()),
                "o_custkey": pa.array([1] * 5, pa.int64()),
                "o_orderstatus": ["O"] * 5,
                "o_totalprice": pa.array([1.0] * 5, pa.float64()),
                "o_orderdate": pa.array(
                    [dt.datetime(2024, 1, 1)] * 5, pa.timestamp("us")
                ),
                "o_orderpriority": ["1-URGENT"] * 5,
            }
        ),
        tmp_path / "orders.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array(keysets["customer"][1], pa.int64()),
                "c_name": ["x"] * 6,
                "c_nationkey": pa.array([1] * 6, pa.int32()),
                "c_acctbal": pa.array([0.0] * 6, pa.float64()),
                "c_mktsegment": ["BUILDING"] * 6,
            }
        ),
        tmp_path / "customer.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "p_partkey": pa.array(keysets["part"][1], pa.int64()),
                "p_name": ["p"] * 2,
                "p_brand": ["B"] * 2,
                "p_type": ["T"] * 2,
                "p_size": pa.array([1] * 2, pa.int32()),
                "p_retailprice": pa.array([1.0] * 2, pa.float64()),
            }
        ),
        tmp_path / "part.parquet",
    )

    expect = []
    for tbl, (_, ks) in keysets.items():
        lo, hi, nd = min(ks), max(ks), len(set(ks))
        span = hi - lo + 1
        expect.append((tbl, lo, hi, nd, span - nd, hu(nd, span, 6)))
    expect.sort()
    got = [
        (
            r["tbl"],
            r["min_id"],
            r["max_id"],
            r["n_distinct"],
            r["n_missing"],
            r["density"],
        )
        for r in run(spark, "dq_id_gap_audit", tmp_path)
    ]
    assert got == expect, got
    assert expect[1][4] == 3  # orders: span 7, distinct 4 -> 3 missing


# -------------------------------------------------------- eval_mcnemar_scorers


def test_mcnemar_matches_python_recount(spark, tmp_path):
    """Paired-scorer recount: replay both round(6)-quantized dot
    products with a sequential double fold in index order (the
    aggregate() semantics), rebuild the 2x2 discordant table, and
    check the continuity-corrected rational; the corpus forces b > 0,
    c > 0 and disagreement between head and full scorers."""
    import numpy as np

    from eecs485_p4_mapreduce_spark.operators.similarity import _INF_W

    rng = [
        [((i * 37 + j * 11) % 19 - 9) / 10.0 for j in range(64)]
        for i in range(24)
    ]
    rows = [(i, rng[i], i % 10) for i in range(24)]
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array([r[0] for r in rows], pa.int64()),
                "embedding": pa.array(
                    [r[1] for r in rows], pa.list_(pa.float32())
                ),
                "label": pa.array([r[2] for r in rows], pa.int32()),
            }
        ),
        tmp_path / "embeddings.parquet",
    )

    def dot(vec, w):
        acc = 0.0
        for x, wi in zip(vec, w):
            acc += float(np.float32(x)) * wi
        return acc

    n = b = c = a_corr = b_corr = 0
    for _, vec, label in rows:
        y = 1 if label >= 5 else 0
        da, db = dot(vec, _INF_W), dot(vec[:16], _INF_W[:16])
        assert abs(da) > 1e-5 and abs(db) > 1e-5  # away from the boundary
        pa_, pb_ = (1 if da > 0 else 0), (1 if db > 0 else 0)
        n += 1
        a_corr += pa_ == y
        b_corr += pb_ == y
        b += pa_ == y and pb_ != y
        c += pa_ != y and pb_ == y
    assert b > 0 and c > 0
    chi = hu((abs(b - c) - 1) ** 2, b + c, 6)
    expect = (n, hu(a_corr, n, 6), hu(b_corr, n, 6), b, c, chi)

    r = run(spark, "eval_mcnemar_scorers", tmp_path)[0]
    got = (
        r["n"],
        r["acc_full"],
        r["acc_head16"],
        r["full_only_wins"],
        r["head_only_wins"],
        r["mcnemar_chi"],
    )
    assert got == expect, (got, expect)


# --------------------------------------------------- stats_kruskal_wallis


def test_kruskal_wallis_matches_python_recount(spark, tmp_path):
    """KW recount on an injected corpus with heavy cross-group ties:
    doubled midranks replayed from the value histogram, the per-group
    centered term replayed with the SAME double chain, and — the
    independence check — the centered form verified against the
    textbook uncentered H = 12/(N(N+1)) * sum R_g^2/n_g - 3(N+1) with
    exact Fractions (the midrank identity the collapse relies on)."""
    lengths = {
        "aa": [10, 10, 10, 25, 40, 40],
        "bb": [10, 25, 25, 25, 60],
        "cc": [40, 60, 60, 95, 95, 95, 95],
    }
    rows, did = [], 0
    for lang, ls in lengths.items():
        for n_chars in ls:
            rows.append((did, f"doc {did}", lang, "web", n_chars))
            did += 1
    write_documents(tmp_path, rows)

    from collections import Counter

    allv = [v for ls in lengths.values() for v in ls]
    n = len(allv)
    hist = Counter(allv)
    cum_before, seen = {}, 0
    for v in sorted(hist):
        cum_before[v] = seen
        seen += hist[v]
    grp = {}
    for lang, ls in lengths.items():
        n_g = len(ls)
        r2 = sum(2 * cum_before[v] + hist[v] + 1 for v in ls)
        grp[lang] = (n_g, r2)
    tie = sum(c**3 - c for c in hist.values())

    # midrank identity: sum of doubled rank sums = N(N+1); centered ==
    # uncentered textbook H, in exact Fractions
    assert sum(r2 for _, r2 in grp.values()) == n * (n + 1)
    h_centered = sum(
        Fraction(12 * n_g, 1)
        * (Fraction(r2, 2 * n_g) - Fraction(n + 1, 2)) ** 2
        / (n * (n + 1))
        for n_g, r2 in grp.values()
    )
    h_textbook = (
        Fraction(12, n * (n + 1))
        * sum(Fraction(r2, 2) ** 2 / n_g for n_g, r2 in grp.values())
        - 3 * (n + 1)
    )
    assert h_centered == h_textbook

    # the production double chain, term by term
    h4 = 0
    for n_g, r2 in grp.values():
        dev = (r2 / (2.0 * n_g)) - ((n + 1.0) / 2.0)
        t4 = math.floor(
            (((12.0 * n_g) * dev) * dev) / (n * (n + 1.0)) * 10000.0
        )
        assert t4 == (12 * n_g * (Fraction(r2, 2 * n_g)
                                  - Fraction(n + 1, 2)) ** 2
                      / (n * (n + 1)) * 10000).__floor__()
        h4 += t4
    c6 = math.floor((1.0 - tie / ((float(n) * n) * n - n)) * 1000000.0)
    assert c6 == ((1 - Fraction(tie, n**3 - n)) * 10**6).__floor__()
    h_tie = float((2 * h4 * 100 * 10000 + c6) // (2 * c6)) / 10000.0

    r = run(spark, "stats_kruskal_wallis", tmp_path)[0]
    assert r["n_groups"] == len(lengths)
    assert r["n"] == n
    assert r["h_stat"] == h4 / 10000.0
    assert r["h_tie_corrected"] == h_tie


# ----------------------------------------------------- stats_friedman_test


def test_friedman_matches_python_recount(spark, tmp_path):
    """Friedman recount: zero-filled users x types grid with
    within-block ties, doubled midranks off each user's value
    histogram, and the collapsed one-rational chi2_F verified against
    the textbook 12/(nk(k+1)) * sum (R_j - n(k+1)/2)^2 in exact
    Fractions before comparing the rendered readout."""
    base = dt.datetime(2024, 4, 1)
    counts = {  # user -> {type: count}; zero-filled over 3 types
        1: {"view": 3, "click": 1},           # purchase 0
        2: {"view": 2, "click": 2},           # tie inside the block
        3: {"purchase": 5},
        4: {"view": 1, "click": 1, "purchase": 1},  # full 3-way tie
        5: {"view": 4, "click": 2, "purchase": 1},
    }
    rows, eid = [], 0
    for u, tc in counts.items():
        for ty, c in tc.items():
            for _ in range(c):
                rows.append(
                    (eid, base + dt.timedelta(minutes=eid), u, ty, 1.0)
                )
                eid += 1
    write_events(tmp_path, rows)

    from collections import Counter

    types = sorted({ty for tc in counts.values() for ty in tc})
    k, nu = len(types), len(counts)
    r2 = dict.fromkeys(types, 0)
    for u, tc in counts.items():
        vals = {ty: tc.get(ty, 0) for ty in types}
        hist = Counter(vals.values())
        cum_before, seen = {}, 0
        for v in sorted(hist):
            cum_before[v] = seen
            seen += hist[v]
        for ty, v in vals.items():
            r2[ty] += 2 * cum_before[v] + hist[v] + 1
    sq = sum(x * x for x in r2.values())

    chi_collapsed = Fraction(
        3 * (sq - nu * nu * k * (k + 1) ** 2), nu * k * (k + 1)
    )
    chi_textbook = Fraction(12, nu * k * (k + 1)) * sum(
        (Fraction(x, 2) - Fraction(nu * (k + 1), 2)) ** 2
        for x in r2.values()
    )
    assert chi_collapsed == chi_textbook
    num = 3 * (sq - nu * nu * k * (k + 1) ** 2)

    r = run(spark, "stats_friedman_test", tmp_path)[0]
    assert r["n_users"] == nu and r["k_types"] == k
    assert r["chi2_friedman"] == hu(num, nu * k * (k + 1), 6)
    assert r["kendall_w"] == hu(
        num, nu * nu * k * (k + 1) * (k - 1), 6
    )


# --------------------------------------------------- stats_brown_forsythe


def test_brown_forsythe_matches_python_recount(spark, tmp_path):
    """BF recount: per-group DOUBLED exact medians off the value
    histogram (even and odd group sizes, ties at the median), the
    1e-6-grid mean-square integers, and the assembled F — plus a
    Fraction cross-check that the grid F sits within grid error of the
    exact Brown-Forsythe statistic (the doubling cancels)."""
    lengths = {
        "aa": [10, 20, 20, 90],        # even n, tie at the median pair
        "bb": [5, 30, 30, 30, 200],    # odd n, median inside a tie run
        "cc": [15, 15, 45, 80, 80, 120],
    }
    rows, did = [], 0
    for lang, ls in lengths.items():
        for n_chars in ls:
            rows.append((did, f"doc {did}", lang, "web", n_chars))
            did += 1
    write_documents(tmp_path, rows)

    from collections import Counter

    s_tot = sst = sq6 = 0
    n = sum(len(ls) for ls in lengths.values())
    k = len(lengths)
    per_group = {}
    for lang, ls in lengths.items():
        n_g = len(ls)
        hist = Counter(ls)
        cum, med_lo, med_hi = 0, None, None
        for v in sorted(hist):
            cum += hist[v]
            if med_lo is None and cum >= (n_g + 1) // 2:
                med_lo = v
            if med_hi is None and cum >= (n_g + 2) // 2:
                med_hi = v
        med2 = med_lo + med_hi
        s_g = sum(abs(2 * v - med2) for v in ls)
        ss_g = sum(abs(2 * v - med2) ** 2 for v in ls)
        q6 = (2 * s_g * s_g * 10**6 + n_g) // (2 * n_g)
        per_group[lang] = (n_g, s_g, ss_g, q6)
        s_tot += s_g
        sst += ss_g
        sq6 += q6
    t6 = (2 * s_tot * s_tot * 10**6 + n) // (2 * n)
    f_grid = hus(
        (n - k) * (sq6 - t6), (k - 1) * (sst * 10**6 - sq6), 6
    )

    # exact BF statistic in Fractions (no grid): z = |x - med|, with
    # med = med2/2; SSB = sum s_g^2/n_g - s^2/n, SSW = sst - sum
    # s_g^2/n_g (all in doubled-z units; the 4s cancel in the ratio)
    sq_exact = sum(
        Fraction(s_g * s_g, n_g) for n_g, s_g, _, _ in per_group.values()
    )
    f_exact = (
        Fraction(n - k)
        * (sq_exact - Fraction(s_tot * s_tot, n))
        / (Fraction(k - 1) * (sst - sq_exact))
    )
    assert abs(Fraction(f_grid).limit_denominator(10**9) - f_exact) < Fraction(1, 100)

    r = run(spark, "stats_brown_forsythe", tmp_path)[0]
    assert r["n_docs"] == n and r["k_groups"] == k
    assert r["mean_abs_dev"] == hu(s_tot, 2 * n, 6)
    assert r["f_bf"] == f_grid


# ------------------------------------------------- ml_ols_normal_equation


def test_ols_matches_python_recount(spark, tmp_path):
    """Closed-form OLS recount: integer epoch-derived features, exact
    nine-moment Gram, Cramer determinants replayed in Python ints —
    and the independence check: a Fraction Gaussian solve of the
    normal equations must equal the det ratios exactly."""
    base = dt.datetime(2024, 3, 4, 1, 30, 0)  # Monday
    rows = []
    for i in range(40):
        ts = base + dt.timedelta(hours=5 * i, minutes=7 * (i % 5))
        val = 0.25 * ((i % 9) - 4) + (i % 3)  # dyadic, signed
        rows.append((i, ts, 1 + i % 4, "view", val))
    write_events(tmp_path, rows)

    n_ = s1 = s2 = s11 = s22 = s12 = sy = s1y = s2y = 0
    for _, ts, _, _, val in rows:
        e = eus(ts)
        x1 = (e // 3600000000) % 24
        x2 = ((e // 86400000000) + 4) % 7
        y6 = round(val * 10**6)  # dyadic -> exact
        n_ += 1
        s1 += x1
        s2 += x2
        s11 += x1 * x1
        s22 += x2 * x2
        s12 += x1 * x2
        sy += y6
        s1y += x1 * y6
        s2y += x2 * y6
    dn = (n_ * (s11 * s22 - s12 * s12)
          - s1 * (s1 * s22 - s12 * s2)
          + s2 * (s1 * s12 - s11 * s2))
    d0 = (sy * (s11 * s22 - s12 * s12)
          - s1 * (s1y * s22 - s12 * s2y)
          + s2 * (s1y * s12 - s11 * s2y))
    d1 = (n_ * (s1y * s22 - s12 * s2y)
          - sy * (s1 * s22 - s12 * s2)
          + s2 * (s1 * s2y - s1y * s2))
    d2 = (n_ * (s11 * s2y - s1y * s12)
          - s1 * (s1 * s2y - s1y * s2)
          + sy * (s1 * s12 - s11 * s2))
    assert dn > 0

    # independent algebra check: Fraction Gaussian solve == det ratios
    A = [
        [Fraction(n_), Fraction(s1), Fraction(s2), Fraction(sy)],
        [Fraction(s1), Fraction(s11), Fraction(s12), Fraction(s1y)],
        [Fraction(s2), Fraction(s12), Fraction(s22), Fraction(s2y)],
    ]
    for col in range(3):
        piv = next(r for r in range(col, 3) if A[r][col] != 0)
        A[col], A[piv] = A[piv], A[col]
        for r in range(3):
            if r != col and A[r][col] != 0:
                f = A[r][col] / A[col][col]
                A[r] = [a - f * b for a, b in zip(A[r], A[col])]
    beta6 = [A[i][3] / A[i][i] for i in range(3)]
    assert beta6 == [Fraction(d, dn) for d in (d0, d1, d2)]

    r = run(spark, "ml_ols_normal_equation", tmp_path)[0]
    assert r["n"] == n_
    assert r["beta_intercept"] == hus(d0, dn * 10**6, 6)
    assert r["beta_hour"] == hus(d1, dn * 10**6, 6)
    assert r["beta_dow"] == hus(d2, dn * 10**6, 6)


# ----------------------------------------------- stats_bh_fdr_permutation


def test_bh_fdr_matches_python_recount(spark, tmp_path):
    """Full BH-FDR recount with hashlib: all 16 lang-salted replica
    splits per hypothesis, the cross-multiplied extremeness compares,
    the shared-denominator p-values, the (n_extreme, lang) integer BH
    order, and the step-up threshold derived INDEPENDENTLY as the
    exact-Fraction p_(i) <= i*alpha/m — on a corpus with glaring
    strata (rejections), moderate strata (survivors), and one tiny
    stratum (n1 << n/2).  This pin caught the round-12 template's
    100x-too-loose cleared compare (10*m*k <= 1700*i, now
    100*m*k <= 170*i)."""
    rows, did = [], 0
    for lang, sizes in [
        ("aa", [100] * 10),            # glaring: far from the rest
        ("bb", [2000, 2100, 2200]),    # tiny stratum (n1 << n/2)
        ("cc", [900 + 10 * i for i in range(25)]),
        ("dd", [1100 - 10 * i for i in range(20)]),
        ("ff", [3000] * 5),            # glaring the other way
    ]:
        for s in sizes:
            rows.append((did, f"doc {did}", lang, "web", s))
            did += 1
    write_documents(tmp_path, rows)

    docs = [(r[0], r[2], r[4]) for r in rows]
    tot_s = sum(s for _, _, s in docs)
    tot_n = len(docs)
    langs = sorted({lang for _, lang, _ in docs})
    hits = {}
    for L in langs:
        s1 = sum(s for _, lang, s in docs if lang == L)
        n1 = sum(1 for _, lang, _ in docs if lang == L)
        s0, n0 = tot_s - s1, tot_n - n1
        obs_gap = abs(s1 * n0 - s0 * n1)
        extreme = 0
        for rr in range(1, 17):
            rs1 = rn1 = rs0 = rn0 = 0
            for doc_id, _, s in docs:
                if bucket256(f"{doc_id}:{L}:{rr}") < 128:
                    rs1 += s
                    rn1 += 1
                else:
                    rs0 += s
                    rn0 += 1
            if rn1 == 0 or rn0 == 0:
                extreme += 1
            elif (abs(rs1 * rn0 - rs0 * rn1) * (n1 * n0)
                  >= obs_gap * (rn1 * rn0)):
                extreme += 1
        hits[L] = (n1, extreme)
    order = sorted(langs, key=lambda L: (hits[L][1], L))
    m = len(order)
    # the INDEPENDENT threshold derivation: BH step-up rejects the
    # largest prefix with p_(i) <= i*alpha/m, p = knum/17, alpha = 0.10
    # — in exact Fractions, never the production's cleared compare
    # (whose earlier spelling was 100x too loose; this pin caught it)
    istar = 0
    for i, L in enumerate(order, start=1):
        if Fraction(1 + hits[L][1], 17) <= Fraction(i, m) * Fraction(10, 100):
            istar = i
    expect = sorted(
        (
            L,
            hits[L][0],
            1 + hits[L][1],
            hu(1 + hits[L][1], 17, 6),
            i,
            i <= istar,
        )
        for i, L in enumerate(order, start=1)
    )
    got = sorted(
        (
            r["lang"],
            r["n_docs"],
            r["p_num"],
            r["p_value"],
            r["p_rank"],
            r["rejected"],
        )
        for r in run(spark, "stats_bh_fdr_permutation", tmp_path)
    )
    assert got == expect, (got, expect)
    assert any(e[5] for e in expect)      # at least one rejection
    assert not all(e[5] for e in expect)  # and at least one survivor


# ----------------------------------------------------- graph_modularity_lpa


def test_modularity_lpa_matches_python_recount(spark, sf_dir):
    """Band-graph modularity recount ON THE PRODUCTION EDGE SET: take
    lsh_candidate_edges' output (its derivation is property-pinned
    elsewhere), replay 2 synchronous LPA rounds with (count DESC,
    label ASC) plurality in pure Python, and recount m / communities /
    intra edges / the one-rational Q with exact integers."""
    from collections import Counter, defaultdict

    from eecs485_p4_mapreduce_spark.operators.dedup import (
        lsh_candidate_edges,
    )

    edges = [
        (r["da"], r["db"])
        for r in lsh_candidate_edges(spark, sf_dir).collect()
    ]
    assert edges, "sf corpus produced no candidate edges"
    adj = defaultdict(list)
    for a, b in edges:
        adj[a].append(b)
        adj[b].append(a)
    labels = {u: u for u in adj}
    for _ in range(2):
        new = {}
        for u in adj:
            votes = Counter(labels[v] for v in adj[u])
            new[u] = min(votes, key=lambda l: (-votes[l], l))
        labels = new
    m = len(edges)
    intra = sum(1 for a, b in edges if labels[a] == labels[b])
    d_c = defaultdict(int)
    for u in adj:
        d_c[labels[u]] += len(adj[u])
    sum_dc2 = sum(d * d for d in d_c.values())
    expect = (
        m,
        len(d_c),
        intra,
        hus(4 * m * intra - sum_dc2, 4 * m * m, 6),
    )

    r = run(spark, "graph_modularity_lpa", sf_dir)[0]
    got = (
        r["m_edges"],
        r["n_communities"],
        r["intra_edges"],
        r["modularity"],
    )
    assert got == expect, (got, expect)
