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


@given(
    st.integers(min_value=0, max_value=7),
    st.integers(min_value=0, max_value=7),
)
def test_morton2_is_bijective_and_ordered(a, b):
    """morton2 must be a bijection of (a, b) bucket pairs onto 0..63, and
    the block id (code >> 3) must depend only on (a2, b2, a1) -- the
    property the Z-order file-skipping bound in test_scale_layout relies
    on."""
    # pure-python twin of the column expression
    def morton_py(a, b, bits=3):
        code = 0
        for i in range(bits):
            code |= ((a >> i) & 1) << (2 * i + 1)
            code |= ((b >> i) & 1) << (2 * i)
        return code

    code = morton_py(a, b)
    assert 0 <= code < 64
    # bijectivity: de-interleave recovers the inputs
    a_back = sum(((code >> (2 * i + 1)) & 1) << i for i in range(3))
    b_back = sum(((code >> (2 * i)) & 1) << i for i in range(3))
    assert (a_back, b_back) == (a, b)
    # block id structure: top 3 bits are a2 b2 a1
    blk = code >> 3
    assert blk == (((a >> 2) & 1) << 2) | (((b >> 2) & 1) << 1) | ((a >> 1) & 1)


@given(st.lists(st.integers(min_value=-(10**9), max_value=10**9), min_size=2, max_size=60))
@settings(max_examples=100)
def test_dsum_is_order_invariant(xs):
    """The decimal path must give one answer for every permutation /
    partitioning -- the invariant that makes double SUMs oracle-exact.
    Modeled in pure python the way Spark's partial aggregation combines:
    any split into two partial sums equals the total."""
    from decimal import Decimal

    vals = [Decimal(x) / Decimal(10**6) for x in xs]  # decimal(_,6) grid
    total = sum(vals)
    for cut in (1, len(vals) // 2, len(vals) - 1):
        assert sum(vals[:cut]) + sum(vals[cut:]) == total
    assert sum(reversed(vals)) == total


@given(
    st.floats(min_value=-1e6, max_value=1e6, allow_nan=False),
    st.floats(min_value=1.0, max_value=1e5),
    st.integers(min_value=1, max_value=64),
)
def test_width_bucket_clamps_to_range(x, width, buckets):
    """width_bucket's pure-python twin: result always lands in
    [0, buckets) even for out-of-range inputs (clamped edges)."""
    lo, hi = -1000.0, -1000.0 + width
    w = (hi - lo) / buckets
    raw = int((x - lo) // w)
    clamped = max(0, min(buckets - 1, raw))
    assert 0 <= clamped < buckets


@given(
    st.lists(
        st.frozensets(st.sampled_from("abcdefghij"), min_size=1, max_size=8),
        min_size=2,
        max_size=12,
    )
)
def test_prefix_filter_has_no_false_negatives(docsets):
    """The AllPairs/PPJoin candidate rule used by
    dedup_prefix_filter_jaccard: any pair with Jaccard >= 7/10 MUST
    share a token inside both prefixes (prefix len = n - ceil(t*n) + 1
    over a shared global token order).  Verified against brute force on
    random small set families -- the no-false-negatives guarantee is the
    whole point of the exact variant."""
    # global order: by document frequency then token (the query's order)
    from collections import Counter

    df = Counter(t for s in docsets for t in s)
    order = sorted({t for s in docsets for t in s}, key=lambda t: (df[t], t))
    rank = {t: i for i, t in enumerate(order)}

    def prefix(s):
        toks = sorted(s, key=lambda t: rank[t])
        n = len(toks)
        plen = n - ((7 * n + 9) // 10) + 1
        return set(toks[:plen])

    for i in range(len(docsets)):
        for j in range(i + 1, len(docsets)):
            a, b = docsets[i], docsets[j]
            inter = len(a & b)
            union = len(a | b)
            if 10 * inter >= 7 * union:  # true near-dup pair
                assert prefix(a) & prefix(b), (
                    f"false negative: {sorted(a)} vs {sorted(b)}"
                )


# ---- real-codec roundtrips (operators/multimodal.py) ---------------------

@given(st.integers(min_value=0, max_value=10**9))
@settings(max_examples=100)
def test_bmp_encode_decode_roundtrip(doc_id):
    """Every synthesized BMP must parse back to exactly the generator's
    dimensions and pixel values — including the bottom-up row order and
    4-byte padding the header dictates."""
    from eecs485_p4_mapreduce_spark.operators.multimodal import (
        _decode_bmp,
        _encode_bmp,
    )

    w, h, px = _decode_bmp(_encode_bmp(doc_id))
    assert (w, h) == (doc_id % 5 + 2, doc_id % 3 + 2)
    assert len(px) == w * h
    for i, (b, g, r) in enumerate(px):
        v = (doc_id * 7 + i) % 256
        assert (b, g, r) == (v, (3 * v) % 256, (5 * v) % 256), i


@given(st.integers(min_value=0, max_value=10**9))
@settings(max_examples=100)
def test_wav_encode_decode_roundtrip(doc_id):
    """Every synthesized RIFF/WAVE must parse back to the generator's
    rate and samples — proving the chunk walk skips the junk LIST chunk
    and honors word alignment and int16 endianness."""
    from eecs485_p4_mapreduce_spark.operators.multimodal import (
        _decode_wav,
        _encode_wav,
    )

    rate, samples = _decode_wav(_encode_wav(doc_id))
    n = doc_id % 50 + 10
    assert rate == 8000 + (doc_id % 3) * 4000
    assert samples == [((doc_id * 31 + i * 13) % 65536) - 32768 for i in range(n)]


@given(
    st.integers(min_value=0, max_value=10**9),
    st.integers(min_value=0, max_value=10**6),
)
@settings(max_examples=100)
def test_video_container_roundtrip(doc_id, nbytes):
    """Every synthesized SGV1 container must walk back to exactly
    ``nbytes % 4 + 1`` frames, each a real BMP whose decoded dims and
    blue channel match the per-frame seed arithmetic the oracles use."""
    from eecs485_p4_mapreduce_spark.operators.multimodal import (
        _decode_video,
        _encode_video,
    )

    frames = _decode_video(_encode_video(doc_id, nbytes))
    assert len(frames) == nbytes % 4 + 1
    for i, (frame, w, h, px) in enumerate(frames):
        seed = doc_id * 131 + i * 17
        assert frame[:2] == b"BM"
        assert (w, h) == (seed % 5 + 2, seed % 3 + 2)
        assert sum(p[0] for p in px) == sum(
            (seed * 7 + p) % 256 for p in range(w * h)
        )


def test_video_decoder_rejects_malformed():
    """The container walk must refuse a non-SGV1 payload."""
    import pytest as _pytest

    from eecs485_p4_mapreduce_spark.operators.multimodal import _decode_video

    with _pytest.raises(ValueError):
        _decode_video(b"NOPE\x00\x00\x00\x01")


def test_wav_decoder_rejects_malformed():
    """The RIFF reader must refuse non-WAVE payloads and truncated
    containers rather than mis-parsing them."""
    import pytest as _pytest

    from eecs485_p4_mapreduce_spark.operators.multimodal import (
        _decode_bmp,
        _decode_wav,
        _encode_wav,
    )

    with _pytest.raises(ValueError):
        _decode_wav(b"RIFFxxxxJUNK")
    with _pytest.raises(ValueError):
        _decode_wav(b"not a riff at all....")
    with _pytest.raises(ValueError):
        _decode_bmp(b"PNG\x00 definitely not a bitmap")
    # fmt-only container (no data chunk) must be rejected, not guessed
    good = _encode_wav(7)
    no_data = good[: good.index(b"data")]
    fixed = no_data[:4] + len(no_data[8:]).to_bytes(4, "little") + no_data[8:]
    with _pytest.raises(ValueError):
        _decode_wav(fixed)


# ---- ranking recipe vs native windows (functions/ranking.py) --------------

@given(
    st.lists(
        st.tuples(
            st.integers(0, 30),
            st.one_of(st.none(), st.integers(0, 2)),
        ),
        min_size=1,
        max_size=120,
    ),
    st.integers(min_value=2, max_value=7),
)
@settings(max_examples=12, deadline=None)
def test_grouped_global_rank_matches_window(spark, rows, parts):
    """Property: with_global_rank(partition_cols=[g]) equals rank()
    computed by an ordinary window for ANY data (duplicates, skewed
    groups, fewer rows than partitions, NULL group values -- PARTITION
    BY keeps NULL as a group and so must the recipe's null-safe
    re-attach) and ANY partition count -- including the packed-id
    arithmetic's edge cases (empty range partitions, single-row
    groups)."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from eecs485_p4_mapreduce_spark.functions.ranking import with_global_rank

    df = spark.createDataFrame(
        [(v, g, i) for i, (v, g) in enumerate(rows)], "v int, g int, tid int"
    )
    got = with_global_rank(
        df, ["v", "tid"], partitions=parts, partition_cols=["g"]
    )
    gmap = {(r["g"], r["v"], r["tid"]): (r["_rk"], r["_n"]) for r in got.collect()}
    w = Window.partitionBy("g").orderBy("v", "tid")
    want = df.select(
        "g", "v", "tid",
        F.row_number().over(w).alias("rk"),
        F.count("*").over(
            Window.partitionBy("g").rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("n"),
    ).collect()
    assert len(gmap) == len(want)
    for r in want:
        assert gmap[(r["g"], r["v"], r["tid"])] == (r["rk"], r["n"]), r


@given(
    st.lists(st.integers(-50, 50), min_size=1, max_size=150),
    st.integers(min_value=2, max_value=6),
)
@settings(max_examples=12, deadline=None)
def test_global_rank_cumsum_matches_window(spark, vals, parts):
    """Property: the sum_col variant's _cum/_tot equal the native
    running-sum window for any values (negatives, duplicates) and any
    partition count."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from eecs485_p4_mapreduce_spark.functions.ranking import with_global_rank

    df = spark.createDataFrame(
        [(v, i) for i, v in enumerate(vals)], "v int, tid int"
    )
    got = with_global_rank(df, ["v", "tid"], sum_col="v", partitions=parts)
    gmap = {r["tid"]: (r["_rk"], r["_cum"], r["_tot"]) for r in got.collect()}
    w = Window.orderBy("v", "tid")
    want = df.select(
        "tid",
        F.row_number().over(w).alias("rk"),
        F.sum("v").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("cum"),
    ).collect()
    tot = sum(vals)
    for r in want:
        assert gmap[r["tid"]] == (r["rk"], r["cum"], tot), r


@given(
    st.lists(
        st.one_of(
            st.text(
                alphabet="aA0.@-_% 5", min_size=0, max_size=12
            ),  # adversarial: pattern-alphabet soup
            st.sampled_from(
                [
                    "a@b.cd", "x@y", "@.com", "555-1234", "555-12345",
                    "a555-1234b", "123-45-6789", "1234-45-6789",
                    "123-456-789", "a.b@c-d.ef", "..@..", "-555-0000-",
                ]
            ),
        ),
        min_size=1,
        max_size=6,
    )
)
@settings(max_examples=40, deadline=None)
def test_pii_regex_cross_engine_parity(spark, pieces):
    """The pii queries' whole oracle contract: Spark's Java regex and
    DuckDB's RE2 must count the SAME spans for the three patterns on
    arbitrary text — including adjacent candidates, partial matches,
    and boundary-adversarial strings.  A dialect divergence here would
    hash-mismatch the oracle on some future corpus."""
    import duckdb

    from eecs485_p4_mapreduce_spark.operators.pii import (
        EMAIL_PAT,
        PHONE_PAT,
        SSN_PAT,
    )

    text = " ".join(pieces)
    import pyspark.sql.functions as F

    row = (
        spark.createDataFrame([(text,)], "t string")
        .select(
            F.regexp_count("t", F.lit(EMAIL_PAT)).alias("e"),
            F.regexp_count("t", F.lit(PHONE_PAT)).alias("p"),
            F.regexp_count("t", F.lit(SSN_PAT)).alias("s"),
        )
        .collect()[0]
    )
    con = duckdb.connect()
    d = con.execute(
        "SELECT len(regexp_extract_all(?, ?)),"
        " len(regexp_extract_all(?, ?)),"
        " len(regexp_extract_all(?, ?))",
        [text, EMAIL_PAT, text, PHONE_PAT, text, SSN_PAT],
    ).fetchone()
    assert (row["e"], row["p"], row["s"]) == d, (text, tuple(row), d)


@given(
    st.lists(
        st.text(alphabet="0123456789", min_size=16, max_size=16),
        min_size=0,
        max_size=4,
    ),
    st.lists(
        st.text(alphabet="0123456789", min_size=20, max_size=20),
        min_size=0,
        max_size=4,
    ),
)
@settings(max_examples=25, deadline=None)
def test_pii_checksum_cross_engine_parity(spark, cards, bbans):
    """The checksum queries' oracle contract, three ways: Spark's int64
    fold, DuckDB's list fold, and a plain-Python reference must agree on
    the number of Luhn-valid 16-digit runs and mod-97-valid DE IBANs in
    arbitrary digit soup.  A fold-order or integer-division divergence
    in either engine would hash-mismatch the oracle on some corpus."""
    import duckdb
    import pyspark.sql.functions as F

    from eecs485_p4_mapreduce_spark.operators.pii import (
        _IBAN_VALID_DUCK,
        _IBAN_VALID_SPARK,
        _LUHN_VALID_DUCK,
        _LUHN_VALID_SPARK,
        CARD_PAT,
        IBAN_PAT,
    )

    text = " pay " + " ".join(cards) + " acct " + " ".join(
        "DE" + b for b in bbans
    )

    def luhn_ok(c: str) -> bool:
        s = 0
        for i, ch in enumerate(c, start=1):
            d = ord(ch) - 48
            if (16 - i) % 2 == 1:
                s += (2 * d) // 10 + (2 * d) % 10
            else:
                s += d
        return s % 10 == 0

    def m97_ok(c: str) -> bool:
        acc = 0
        for ch in c[4:] + "1314" + c[2:4]:
            acc = (acc * 10 + ord(ch) - 48) % 97
        return acc == 1

    exp = (
        sum(luhn_ok(c) for c in cards),
        sum(m97_ok("DE" + b) for b in bbans),
    )
    card_cands = "regexp_extract_all(t, '\\\\b[0-9]{16}\\\\b', 0)"
    iban_cands = "regexp_extract_all(t, '\\\\bDE[0-9]{20}\\\\b', 0)"
    row = (
        spark.createDataFrame([(text,)], "t string")
        .select(
            F.expr(
                f"aggregate({card_cands}, cast(0 as bigint), (acc, c) ->"
                f" acc + CASE WHEN {_LUHN_VALID_SPARK} THEN 1 ELSE 0 END)"
            ).alias("nl"),
            F.expr(
                f"aggregate({iban_cands}, cast(0 as bigint), (acc, c) ->"
                f" acc + CASE WHEN {_IBAN_VALID_SPARK} THEN 1 ELSE 0 END)"
            ).alias("ni"),
        )
        .collect()[0]
    )
    got_spark = (row["nl"], row["ni"])
    con = duckdb.connect()
    got_duck = con.execute(
        f"""
        SELECT coalesce(list_sum(list_transform(
                 regexp_extract_all(?, '{CARD_PAT}'),
                 c -> CASE WHEN {_LUHN_VALID_DUCK} THEN 1 ELSE 0 END)), 0),
               coalesce(list_sum(list_transform(
                 regexp_extract_all(?, '{IBAN_PAT}'),
                 c -> CASE WHEN {_IBAN_VALID_DUCK} THEN 1 ELSE 0 END)), 0)
        """,
        [text, text],
    ).fetchone()
    assert got_spark == tuple(got_duck) == exp, (text, got_spark, got_duck, exp)


@settings(max_examples=200, deadline=None)
@given(
    st.integers(min_value=0, max_value=10**30),
    st.integers(min_value=1, max_value=10**15),
)
def test_duckdb_hugeint_floor_div_is_exact(x, y):
    """The oracle-side exact floor-division spelling used where int64
    would overflow (privacy_t_closeness): DuckDB's decimal ``//`` ROUNDS
    the quotient before flooring, and decimal ``/`` routes through
    DOUBLE (exactness lost past 2^53 -- found by this test's first
    version, which pinned the (x - x %% y) / y identity and caught the
    double conversion).  HUGEINT ``//`` is true int128 floor division;
    pin it against Python's arbitrary-precision floor division across
    the full range the engine uses."""
    import duckdb

    got = duckdb.execute(
        """
        SELECT CAST(CAST(? AS HUGEINT) // CAST(? AS HUGEINT) AS VARCHAR)
        """,
        [str(x), str(y)],
    ).fetchone()[0]
    assert int(got) == x // y, (x, y, got, x // y)


@settings(max_examples=200, deadline=None)
@given(
    st.integers(min_value=0, max_value=10**18),
    st.integers(min_value=1, max_value=10**14),
)
def test_integer_half_up_render_is_exact(num, den):
    """The (2*num*10^4 + den) // (2*den) half-up rendering recipe
    (graph_clustering_coefficient, COVERAGE rule 8): pinned against
    exact Fraction arithmetic — round-half-up of num/den at 4 decimals,
    in HUGEINT so the doubled scaled numerator can never overflow.
    round(double, 4) is NOT safe here: engines disagree when num/den is
    an exact decimal half (0.25325 -> Spark 0.2533, DuckDB 0.2532 —
    found at sf0.001)."""
    import duckdb
    from fractions import Fraction

    got = duckdb.execute(
        """
        SELECT CAST((2 * CAST(? AS HUGEINT) * 10000 + CAST(? AS HUGEINT))
                    // (2 * CAST(? AS HUGEINT)) AS VARCHAR)
        """,
        [str(num), str(den), str(den)],
    ).fetchone()[0]
    frac = Fraction(num * 10**4, den)
    exp = frac.numerator // frac.denominator
    if Fraction(frac - exp) >= Fraction(1, 2):
        exp += 1
    assert int(got) == exp, (num, den, got, exp)


# ---- degree-oriented wedge/triangle enumeration (operators/graph.py) ------


def _oriented_frame(spark, pairs):
    """Build the lsh_oriented_edges shape (lo, hi, dlo, dhi) from a raw
    undirected pair list — the same degree-orientation derivation
    dedup.lsh_oriented_edges runs over the stored edge table."""
    import pyspark.sql.functions as F

    edges = spark.createDataFrame(
        sorted({(min(a, b), max(a, b)) for a, b in pairs if a != b}),
        "da bigint, db bigint",
    )
    deg = (
        edges.select(F.col("da").alias("doc_id"))
        .unionAll(edges.select(F.col("db").alias("doc_id")))
        .groupBy("doc_id")
        .agg(F.count("*").cast("bigint").alias("d"))
    )
    e2 = edges.join(
        deg.select(F.col("doc_id").alias("da"), F.col("d").alias("d_a")), "da"
    ).join(deg.select(F.col("doc_id").alias("db"), F.col("d").alias("d_b")), "db")
    a_first = F.struct("d_a", "da") < F.struct("d_b", "db")
    oe = e2.select(
        F.when(a_first, F.col("da")).otherwise(F.col("db")).alias("lo"),
        F.when(a_first, F.col("db")).otherwise(F.col("da")).alias("hi"),
        F.when(a_first, F.col("d_a")).otherwise(F.col("d_b")).alias("dlo"),
        F.when(a_first, F.col("d_b")).otherwise(F.col("d_a")).alias("dhi"),
    )
    return edges, oe


@given(
    st.lists(
        st.tuples(st.integers(0, 11), st.integers(0, 11)),
        min_size=1,
        max_size=40,
    )
)
@settings(max_examples=12, deadline=None)
def test_oriented_wedges_match_unoriented_multiset(spark, pairs):
    """THE orientation-equivalence claim the round-7 wedge rewrite rests
    on: `_oriented_wedges` (out-out / in-out / in-in class split over
    the degree-oriented edge set) must produce EXACTLY the wedge
    multiset of the classic both-directions enumeration
    (adj JOIN adj ON a1.v = a2.u WHERE a1.u < a2.v) for ANY graph —
    duplicates of a pair mean two distinct middles and must be
    preserved, since linkpred COUNTS wedges per pair."""
    from collections import Counter

    import pyspark.sql.functions as F

    from eecs485_p4_mapreduce_spark.operators.graph import _oriented_wedges

    edges, oe = _oriented_frame(spark, pairs)
    if edges.count() == 0:
        return
    got = Counter(
        (r["u"], r["w"]) for r in _oriented_wedges(oe).collect()
    )
    adj = edges.select(F.col("da").alias("u"), F.col("db").alias("v")).unionAll(
        edges.select(F.col("db").alias("u"), F.col("da").alias("v"))
    )
    want = Counter(
        (r["u"], r["w"])
        for r in adj.alias("a1")
        .join(adj.alias("a2"), F.col("a1.v") == F.col("a2.u"))
        .filter(F.col("a1.u") < F.col("a2.v"))
        .select(F.col("a1.u").alias("u"), F.col("a2.v").alias("w"))
        .collect()
    )
    assert got == want


@given(
    st.lists(
        st.tuples(st.integers(0, 11), st.integers(0, 11)),
        min_size=1,
        max_size=40,
    )
)
@settings(max_examples=8, deadline=None)
def test_wedge_pairs_distinct_matches_multiset_distinct(spark, pairs):
    """graph_centrality_2hop's round-9 dedup path
    (`_oriented_wedge_pairs_distinct`: explicit-width repartition +
    in-place dropDuplicates) must produce EXACTLY the set
    `_oriented_wedges(oe).distinct()` would — the plan changed for the
    1g-heap coalescing OOM, the result set must not."""
    from eecs485_p4_mapreduce_spark.operators.graph import (
        _oriented_wedge_pairs_distinct,
        _oriented_wedges,
    )

    edges, oe = _oriented_frame(spark, pairs)
    if edges.count() == 0:
        return
    got = {
        (r["u"], r["w"])
        for r in _oriented_wedge_pairs_distinct(oe).collect()
    }
    want = {
        (r["u"], r["w"]) for r in _oriented_wedges(oe).distinct().collect()
    }
    assert got == want


@given(
    st.lists(
        st.tuples(st.integers(0, 9), st.integers(0, 9)),
        min_size=1,
        max_size=30,
    )
)
@settings(max_examples=10, deadline=None)
def test_oriented_triangles_match_id_oriented_listing(spark, pairs):
    """`_triangles_from_oriented` (out-out wedges at the key-minimum
    vertex + one closing-edge probe) must list EXACTLY the unordered
    triangle set of the classic id-oriented e JOIN e JOIN e closure,
    each exactly once, for ANY graph."""
    import pyspark.sql.functions as F

    from eecs485_p4_mapreduce_spark.operators.graph import (
        _triangles_from_oriented,
    )

    edges, oe = _oriented_frame(spark, pairs)
    if edges.count() == 0:
        return
    got = sorted(
        tuple(sorted((r["a"], r["b"], r["c"])))
        for r in _triangles_from_oriented(oe).collect()
    )
    ab, bc, ac = edges.alias("ab"), edges.alias("bc"), edges.alias("ac")
    want = sorted(
        tuple(sorted((r["a"], r["b"], r["c"])))
        for r in ab.join(bc, F.col("bc.da") == F.col("ab.db"))
        .join(
            ac,
            (F.col("ac.da") == F.col("ab.da")) & (F.col("ac.db") == F.col("bc.db")),
        )
        .select(
            F.col("ab.da").alias("a"),
            F.col("ab.db").alias("b"),
            F.col("bc.db").alias("c"),
        )
        .collect()
    )
    assert got == want
    assert len(got) == len(set(got))  # each triangle exactly once


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10**12),
            st.integers(min_value=1, max_value=10**9),
        ),
        min_size=1,
        max_size=40,
    )
)
@settings(max_examples=8, deadline=None)
def test_hu_ratio_spark_matches_fraction(spark, nd):
    """functions/numeric.py::hu_ratio (the Spark half of the integer
    half-up recipe) against exact Fraction arithmetic: for any
    (num >= 0, den > 0) the rendered double must be exactly the
    two-step render float(round-half-up(num/den, 6 digits)) / 10^6 —
    the DuckDB half is pinned by test_integer_half_up_render_is_exact.
    (Two-step, as in the signed twins: past 2^53 the scaled integer is
    no longer a double, so cast-then-divide differs from Python's
    one-step rational division in the last bit — hypothesis found the
    live example (153957089443, 7) this round.  Cross-engine still
    exact: both engines perform the identical IEEE cast-then-divide.)"""
    from fractions import Fraction

    from eecs485_p4_mapreduce_spark.functions.numeric import hu_ratio

    df = spark.createDataFrame(
        [(i, n, d) for i, (n, d) in enumerate(nd)], "i long, num long, den long"
    )
    got = {
        r["i"]: r["r"]
        for r in df.select("i", hu_ratio("num", "den", 6).alias("r")).collect()
    }
    for i, (n, d) in enumerate(nd):
        frac = Fraction(n * 10**6, d)
        exp = frac.numerator // frac.denominator
        if frac - exp >= Fraction(1, 2):
            exp += 1
        assert got[i] == float(exp) / 10**6, (n, d, got[i], exp)


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=4 * 10**15),   # epoch_us horizon
            st.integers(min_value=0, max_value=2**63 - 1),    # any int64 id
            st.integers(min_value=-(10**6), max_value=10**6),
        ),
        min_size=1,
        max_size=60,
        unique_by=lambda r: (r[0], r[1]),  # unique (ts, id) key, as in events
    )
)
@settings(max_examples=60, deadline=None)
def test_hugeint_packed_argmin_matches_struct_order(rows):
    """The OHLC oracles' arg-extreme packing (round-7 fix): DuckDB's
    arg_min over ``epoch_us * 2^63 + event_id`` (HUGEINT) must pick the
    same row as the (ts, event_id) lexicographic STRUCT order Spark's
    min_by uses — for ANY non-negative int64 event_id, which the old
    1e9 multiplier silently violated past event_id >= 1e9."""
    import duckdb

    con = duckdb.connect()
    con.execute("CREATE TABLE t (e HUGEINT, i HUGEINT, v BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", [
        (str(e), str(i), v) for e, i, v in rows
    ])
    got = con.execute(
        "SELECT arg_min(v, CAST(e AS HUGEINT) * 9223372036854775808 + i),"
        "       arg_max(v, CAST(e AS HUGEINT) * 9223372036854775808 + i)"
        " FROM t"
    ).fetchone()
    lo = min(rows, key=lambda r: (r[0], r[1]))
    hi = max(rows, key=lambda r: (r[0], r[1]))
    assert (got[0], got[1]) == (lo[2], hi[2]), (got, lo, hi)


# ---- signed half-up ratio + 10^k-scaled-sum render (round-8 item 1) --------


def _half_away(num, den, digits):
    """Exact round-half-AWAY-FROM-ZERO of num/den at `digits` decimals,
    returned as the scaled integer (the recipe's contract), via Fraction."""
    from fractions import Fraction

    frac = Fraction(num * 10**digits, den)
    sgn = -1 if frac < 0 else 1
    a = abs(frac)
    q = a.numerator // a.denominator
    if a - q >= Fraction(1, 2):
        q += 1
    return sgn * q


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=-(10**12), max_value=10**12),
            st.integers(min_value=-(10**9), max_value=10**9).filter(lambda d: d != 0),
        ),
        min_size=1,
        max_size=40,
    )
)
@settings(max_examples=8, deadline=None)
def test_hu_ratio_signed_spark_matches_fraction(spark, nd):
    """functions/numeric.py::hu_ratio_signed against exact Fraction
    arithmetic: for ANY-sign num/den the rendered double must be exactly
    round-half-away-from-zero(num/den, 6 digits) / 10^6 — the signed
    extension of the hu_ratio pin (round(double, N) is half-away in
    BOTH engines, so away-from-zero is the cross-engine target)."""
    from eecs485_p4_mapreduce_spark.functions.numeric import hu_ratio_signed

    df = spark.createDataFrame(
        [(i, n, d) for i, (n, d) in enumerate(nd)], "i long, num long, den long"
    )
    got = {
        r["i"]: r["r"]
        for r in df.select(
            "i", hu_ratio_signed("num", "den", 6).alias("r")
        ).collect()
    }
    for i, (n, d) in enumerate(nd):
        # the render is cast(scaled_int as double) / 10^6 — model BOTH
        # rounding steps (float() then divide): beyond 2^53 the scaled
        # integer is no longer a double, and the two-step render differs
        # from Python's one-step rational division in the last bit.
        # Cross-engine this is still exact: Spark and DuckDB perform the
        # identical IEEE cast-then-divide.
        assert got[i] == float(_half_away(n, d, 6)) / 10**6, (n, d, got[i])


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=-(10**12), max_value=10**12),
            st.integers(min_value=-(10**9), max_value=10**9).filter(lambda d: d != 0),
        ),
        min_size=1,
        max_size=40,
    )
)
@settings(max_examples=40, deadline=None)
def test_hu_ratio_signed_sql_matches_fraction(nd):
    """DuckDB twin of the signed recipe (hu_ratio_signed_sql) against
    Fraction — including negative numerators AND denominators (the
    bitext margin's avg-sum divisor can be negative)."""
    import duckdb

    from eecs485_p4_mapreduce_spark.functions.numeric import hu_ratio_signed_sql

    con = duckdb.connect()
    con.execute("CREATE TABLE t (i BIGINT, num BIGINT, den BIGINT)")
    con.executemany(
        "INSERT INTO t VALUES (?, ?, ?)",
        [(i, n, d) for i, (n, d) in enumerate(nd)],
    )
    expr = hu_ratio_signed_sql("num", "den", 6)
    got = dict(con.execute(f"SELECT i, {expr} FROM t").fetchall())
    for i, (n, d) in enumerate(nd):
        # two-step render semantics (see the Spark twin's comment)
        assert got[i] == float(_half_away(n, d, 6)) / 10**6, (n, d, got[i])


@given(
    st.integers(min_value=0, max_value=9),              # render digits N
    st.sampled_from([4, 6, 8, 9, 15]),                  # value quantization k
    st.lists(
        st.integers(min_value=-(10**10), max_value=10**10),  # 10^k-scaled values
        min_size=1,
        max_size=30,
    ),
)
@settings(max_examples=40, deadline=None)
def test_scaled_sum_mean_render_is_exact(digits, k, vals):
    """The 10^k-scaled-sum form (round-8 conversion target): rendering
    round(mean, N) of a k-decimal-quantized value sum via the signed
    recipe with num = S (the integer sum at 10^k scale) and
    den = n * 10^k must equal exact Fraction round-half-away of
    (S/10^k)/n — for any k in the repo's quantization set and any
    render scale N.  This is the contract kl_nats / theil / twavg /
    davg-round sites rely on after conversion."""
    import duckdb

    from eecs485_p4_mapreduce_spark.functions.numeric import hu_ratio_signed_sql

    s = sum(vals)
    n = len(vals)
    con = duckdb.connect()
    # call-site convention: fold the 10^k scale INSIDE the wide cast —
    # a bare int32 product (n * 10^k) overflows before the helper's
    # HUGEINT cast (the eval_calibration_bins ADVICE class)
    expr = hu_ratio_signed_sql(str(s), f"CAST({n} AS HUGEINT) * {10**k}", digits)
    got = con.execute(f"SELECT {expr}").fetchone()[0]
    # two-step render semantics (see test_hu_ratio_signed_spark's comment)
    assert got == float(_half_away(s, n * 10**k, digits)) / 10**digits, (
        digits, k, s, n, got,
    )


def _welch_df_expected(n1, vals1, n2, vals2):
    """Exact-integer model of the production df_welch recipe: half-up
    quantize a_i = (n*ss - s^2) / (n^2 (n-1)) at 10^7, then
    half-up((A1+A2)^2 (n1-1)(n2-1) / (A1^2 (n2-1) + A2^2 (n1-1)), 4)."""
    from fractions import Fraction

    def aq(vals):
        n, s, ss = len(vals), sum(vals), sum(v * v for v in vals)
        num, den = n * ss - s * s, n * n * (n - 1)
        return (2 * num * 10**7 + den) // (2 * den)

    a1, a2 = aq(vals1), aq(vals2)
    num = (a1 + a2) ** 2 * (n1 - 1) * (n2 - 1)
    den = a1 * a1 * (n2 - 1) + a2 * a2 * (n1 - 1)
    if den == 0:
        return None, None, a1, a2
    got_scaled = (2 * num * 10**4 + den) // (2 * den)
    # the true (unquantized) df, for the closeness bound
    fa1 = Fraction(n1 * sum(v * v for v in vals1) - sum(vals1) ** 2,
                   n1 * n1 * (n1 - 1))
    fa2 = Fraction(n2 * sum(v * v for v in vals2) - sum(vals2) ** 2,
                   n2 * n2 * (n2 - 1))
    fden = fa1 * fa1 / (n1 - 1) + fa2 * fa2 / (n2 - 1)
    true_df = float((fa1 + fa2) ** 2 / fden) if fden else None
    return float(got_scaled) / 10**4, true_df, a1, a2


@given(
    st.lists(st.integers(min_value=0, max_value=20000), min_size=2, max_size=25),
    st.lists(st.integers(min_value=0, max_value=20000), min_size=2, max_size=25),
)
@settings(max_examples=10, deadline=None)
def test_welch_df_recipe_matches_fraction(spark, vals1, vals2):
    """stats_welch_ttest's df_welch recipe (the round-9 retirement of
    the registry's last round(double, N) of a non-transcendental
    rational): the PRODUCTION expression strings (_WELCH_AQ /
    _WELCH_DF_NUM / _WELCH_DF_DEN through hu_ratio) over injected
    moments must equal the exact integer model, within the query's
    documented value domain (character/token counts; the recipe's
    stated bound is (a1+a2)*sqrt(n1*n2) <= 9.2e9, and 20000-char docs
    at n = 2 sit ~2x inside it).  Also pins quantization fidelity: the
    render sits within the derived tolerance of the true rational."""
    from pyspark.sql import functions as F

    from eecs485_p4_mapreduce_spark.functions.numeric import hu_ratio
    from eecs485_p4_mapreduce_spark.operators.analytics import (
        _WELCH_AQ,
        _WELCH_DF_DEN,
        _WELCH_DF_NUM,
    )

    n1, n2 = len(vals1), len(vals2)
    row = (
        n1, sum(vals1), sum(v * v for v in vals1),
        n2, sum(vals2), sum(v * v for v in vals2),
    )
    w = spark.createDataFrame(
        [row], "n1 long, s1 long, ss1 long, n2 long, s2 long, ss2 long"
    )
    got = (
        w.select(
            "*",
            F.expr(_WELCH_AQ.format(n="n1", s="s1", ss="ss1")).alias("a1q"),
            F.expr(_WELCH_AQ.format(n="n2", s="s2", ss="ss2")).alias("a2q"),
        )
        .select(hu_ratio(_WELCH_DF_NUM, _WELCH_DF_DEN, 4).alias("df"))
        .collect()[0]["df"]
    )
    exp, true_df, a1, a2 = _welch_df_expected(n1, vals1, n2, vals2)
    assert got == exp, (vals1, vals2, got, exp)
    if true_df is not None and a1 > 0 and a2 > 0:
        # |d ln df| <= 4 * (rel err a1 + rel err a2); half-up error on
        # A_i is <= 0.5, so rel err <= 0.5/A_i.  1.5x safety margin,
        # 2e-4 floor for the final render's own half-up step.
        tol = max(2e-4, true_df * 6 * (0.5 / a1 + 0.5 / a2))
        assert abs(got - true_df) <= tol, (got, true_df, tol, vals1, vals2)


def test_twopass_variance_survives_singlepass_overflow(spark):
    """stats_var_twopass's production body (relational2.twopass_var) at
    the documented int128 boundary: 20k rows of ~9e8-magnitude values
    put the single-pass rational's n*sum(x6^2) term at ~3e38 — past
    decimal(38,0) — while the two-pass center-then-square derivation
    stays ~1e15 and returns the EXACT population variance (checked
    against Fraction arithmetic, including the 1e-6 half-away render).
    This pins the 'shard or two-pass beyond ~1e8-1e10 rows' escape
    hatch the squared-sum family's docstrings promise."""
    from fractions import Fraction

    import pytest
    from pyspark.sql import functions as F

    from eecs485_p4_mapreduce_spark.operators.relational2 import twopass_var

    n = 20000
    # exact-in-decimal(18,6) doubles: 9e8 + quarter-unit jitter
    vals = [900000000.0 + (i % 7) * 0.25 for i in range(n)]
    x6 = [int(Fraction(str(v)) * 10**6) for v in vals]
    # the boundary is real: the single-pass intermediate wraps int128
    assert n * sum(v * v for v in x6) > 10**38
    e = spark.createDataFrame(
        [("x", v) for v in vals], "event_type string, value double"
    )
    # 1) the single-pass stats_moments rational overflows loudly (ANSI)
    single = e.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(F.col("value").cast("decimal(18,6)")).alias("sxd"),
        F.sum((F.col("value") * F.col("value")).cast("decimal(28,12)")).alias("sxxd"),
    )
    with pytest.raises(Exception, match="NUMERIC_VALUE_OUT_OF_RANGE"):
        single.select(
            F.expr(
                "cast(n as decimal(38,0))"
                " * cast(sxxd * 1000000000000 as decimal(38,0))"
                " - cast(sxd * 1000000 as decimal(38,0))"
                " * cast(sxd * 1000000 as decimal(38,0))"
            ).alias("numer")
        ).collect()
    # 2) the two-pass production path is exact
    row = twopass_var(e).collect()[0]
    s, ss = sum(x6), sum(v * v for v in x6)
    true_var = Fraction(len(x6) * ss - s * s, len(x6) ** 2 * 10**12)
    assert row["var_pop"] == float(_half_away(
        true_var.numerator, true_var.denominator, 6)) / 10**6
    assert row["n"] == n
    # the center is the truncated mean at 1e-6
    assert row["center"] == float(s // n) / 10**6


def test_twopass_covar_survives_singlepass_overflow(spark):
    """stats_covar_twopass's production body (analytics.twopass_covar)
    at the documented int128 boundary: 20k rows of ~9e8/8e8-magnitude
    value pairs wrap the single-pass stats_correlation derivation
    loudly (the cross-moment terms alone exceed its decimal widths),
    while the center-then-square derivation stays small and returns the
    EXACT sample covariance (checked against Fraction arithmetic,
    including the 1e-6 half-away render).  This pins stats_correlation's
    'center-then-square beyond ~2e7 rows/group' escape hatch as
    implemented, not merely documented."""
    from fractions import Fraction

    import pytest
    from pyspark.sql import functions as F

    from eecs485_p4_mapreduce_spark.operators.analytics import (
        _CORR_COV_DEN,
        _CORR_COV_NUM,
        twopass_covar,
    )

    n = 20000
    # exact-in-decimal(18,6) doubles: big means, small spreads — the
    # regime where centering wins mean_x*mean_y/cov headroom
    xs = [900000000.0 + (i % 7) * 0.25 for i in range(n)]
    ys = [800000000.0 + (i % 5) * 0.5 for i in range(n)]
    x6 = [int(Fraction(str(v)) * 10**6) for v in xs]
    y6 = [int(Fraction(str(v)) * 10**6) for v in ys]
    # the boundary is real: the single-pass intermediate wraps int128
    assert n * sum(a * b for a, b in zip(x6, y6)) > 10**38
    li = spark.createDataFrame(
        [("x", a, b) for a, b in zip(xs, ys)],
        "l_returnflag string, l_quantity double, l_extendedprice double",
    )
    # 1) the single-pass stats_correlation derivation overflows loudly
    single = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum(F.col("l_quantity").cast("decimal(18,6)")).alias("sxd"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,6)")).alias("syd"),
        F.sum(
            (F.col("l_quantity") * F.col("l_extendedprice")).cast(
                "decimal(28,12)"
            )
        ).alias("sxyd"),
    )
    with pytest.raises(Exception, match="NUMERIC_VALUE_OUT_OF_RANGE"):
        single.select(
            F.expr(f"({_CORR_COV_NUM}) / ({_CORR_COV_DEN})").alias("r")
        ).collect()
    # 2) the two-pass production path is exact
    row = twopass_covar(li).collect()[0]
    sx, sy = sum(x6), sum(y6)
    sxy = sum(a * b for a, b in zip(x6, y6))
    true = Fraction(n * sxy - sx * sy, n * (n - 1) * 10**12)
    assert row["covar_samp"] == float(
        _half_away(true.numerator, true.denominator, 6)
    ) / 10**6
    assert row["n"] == n
    assert row["center_x"] == float(sx // n) / 10**6
    assert row["center_y"] == float(sy // n) / 10**6


@given(
    st.lists(
        st.tuples(st.integers(0, 11), st.integers(0, 11)),
        min_size=1,
        max_size=40,
    )
)
@settings(max_examples=8, deadline=None)
def test_production_orient_edges_matches_replica(spark, pairs):
    """dedup.orient_edges — the PRODUCTION derivation lsh_oriented_edges
    persists — against the test replica (_oriented_frame) over injected
    edge tables, including degree ties and would-be duplicate edges: a
    future refactor of the production path can no longer silently
    diverge from the helper the orientation-equivalence proofs pin."""
    from eecs485_p4_mapreduce_spark.operators.dedup import orient_edges

    uniq = sorted({(min(a, b), max(a, b)) for a, b in pairs if a != b})
    if not uniq:
        return
    edges, replica = _oriented_frame(spark, pairs)
    got = sorted(
        tuple(r) for r in orient_edges(edges).collect()
    )
    exp = sorted(tuple(r) for r in replica.collect())
    assert got == exp, (pairs, got, exp)


@given(
    st.lists(
        st.tuples(
            st.integers(0, 2),      # user id
            st.booleans(),          # is_click
        ),
        min_size=1,
        max_size=60,
    )
)
@settings(max_examples=12, deadline=None)
def test_desc_cumulative_next_anchor_matches_suffix_frame(spark, rows):
    """Property: the as-of family's forward pass — a DESC-ordered
    running last-non-null over (unboundedPreceding, -1) — equals the
    naive (1, unboundedFollowing) first-non-null for ANY event
    interleaving, as long as the sort key is total (unique ts per
    (user, is_click) here, like production's microsecond timestamps /
    deduped clicks).  Spark re-aggregates suffix frames per row
    (O(n^2) per partition, measured 43 s vs 0.35 s at 50k rows), so
    the production queries use the cumulative spelling; this pins that
    the rewrite is a pure evaluation-strategy change."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    data = [
        (u, i, int(c), 1000 + i)  # ts = row index: unique total order
        for i, (u, c) in enumerate(rows)
    ]
    df = spark.createDataFrame(data, "u int, ts int, is_click int, src int")
    val = F.when(F.col("is_click") == 1, F.col("src"))
    naive = (
        Window.partitionBy("u")
        .orderBy(F.col("ts").asc(), F.col("is_click").desc())
        .rowsBetween(1, Window.unboundedFollowing)
    )
    prod = (
        Window.partitionBy("u")
        .orderBy(F.col("ts").desc(), F.col("is_click").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    out = df.select(
        "u",
        "ts",
        F.first(val, ignorenulls=True).over(naive).alias("want"),
        F.last(val, ignorenulls=True).over(prod).alias("got"),
    ).collect()
    for r in out:
        assert r["want"] == r["got"], r


@given(
    st.lists(
        st.tuples(st.integers(1, 50), st.integers(0, 50)),
        min_size=1,
        max_size=10,
    ).filter(lambda bs: all(sy <= n for n, sy in bs))
)
@settings(max_examples=60, deadline=None)
def test_isotonic_minimax_identity_matches_pava(bins):
    """eval_isotonic_bins replaces PAVA's sequential pooling with the
    minimax identity iso_i = max_{j<=i} min_{k>=i} mean(y, j..k) — a
    constant-size segment enumeration a distributed engine can run.
    Pin the identity itself: over random weighted binary bins, the
    exact-Fraction minimax equals the textbook weighted
    pool-adjacent-violators fit, and both are monotone."""
    from fractions import Fraction

    n = len(bins)
    # minimax over exact segment means
    def seg_mean(j, k):
        sw = sum(bins[i][0] for i in range(j, k + 1))
        sy = sum(bins[i][1] for i in range(j, k + 1))
        return Fraction(sy, sw)

    minimax = [
        max(min(seg_mean(j, k) for k in range(i, n)) for j in range(0, i + 1))
        for i in range(n)
    ]
    # classic weighted PAVA
    blocks = []  # (weight, ysum)
    for w, sy in bins:
        blocks.append((w, sy))
        while len(blocks) >= 2 and Fraction(blocks[-2][1], blocks[-2][0]) >= Fraction(
            blocks[-1][1], blocks[-1][0]
        ):
            w2, s2 = blocks.pop()
            w1, s1 = blocks.pop()
            blocks.append((w1 + w2, s1 + s2))
    # expand blocks back to per-bin fits
    pava = []
    idx = 0
    for w, sy in blocks:
        # count how many original bins this block covers by weight
        acc = 0
        while acc < w:
            acc += bins[idx][0]
            pava.append(Fraction(sy, w))
            idx += 1
    assert pava == minimax
    assert all(a <= b for a, b in zip(minimax, minimax[1:]))
