"""Property-based tests (hypothesis) for the engine's core invariants —
the layer SURVEY §5 says the reference lacks entirely (its only "tests" are
live infrastructure pings, tests/test_pipeline_integration.py).

Each property runs the REAL Spark expressions on small generated inputs and
checks them against an independent pure-Python model, so the invariant holds
for arbitrary data, not just the fixture tables.  Example counts are kept
small: every example is a createDataFrame + collect round trip.
"""

from __future__ import annotations

import datetime
import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Window
from pyspark.sql import functions as F

PROP = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_EPOCH = datetime.datetime(2024, 1, 1)


# -- D1 dedup: deterministic winner, order- and partitioning-independent -----

_dup_rows = st.lists(
    st.tuples(
        st.integers(0, 5),       # event_id (few keys => many collisions)
        st.integers(0, 1000),    # ts offset seconds
        st.integers(0, 3),       # user_id
    ),
    min_size=1,
    max_size=40,
)


@PROP
@given(rows=_dup_rows, seed=st.randoms(use_true_random=False))
def test_dedup_picks_min_winner_regardless_of_row_order(spark, rows, seed):
    """The keyed-dedup window (dedup_events' exact spec) must select the
    lexicographic-min (ts, user_id) row per event_id no matter how the
    input rows are ordered or partitioned — the determinism fix over the
    reference's arrival-order dropDuplicates."""
    shuffled = list(rows)
    seed.shuffle(shuffled)
    df = spark.createDataFrame(
        [
            (f"e{k}", _EPOCH + datetime.timedelta(seconds=ts), f"u{u}")
            for k, ts, u in shuffled
        ],
        "event_id string, ts timestamp, user_id string",
    ).repartition(4)
    w = Window.partitionBy("event_id").orderBy("ts", "user_id")
    got = {
        (r.event_id, r.ts, r.user_id)
        for r in df.withColumn("rn", F.row_number().over(w)).where("rn = 1").collect()
    }
    expect = {}
    for k, ts, u in rows:
        key = f"e{k}"
        val = (_EPOCH + datetime.timedelta(seconds=ts), f"u{u}")
        if key not in expect or val < expect[key]:
            expect[key] = val
    assert got == {(k, v[0], v[1]) for k, v in expect.items()}


# -- A5 safe rate: total function, bounded when num <= denom ------------------

@PROP
@given(
    pairs=st.lists(
        st.tuples(st.integers(0, 10_000), st.integers(0, 10_000)),
        min_size=1,
        max_size=30,
    )
)
def test_safe_rate_is_total_and_bounded(spark, pairs):
    """safe_rate (funnel/payment rate semantics, funnel_processor.py:49-55)
    must never divide by zero, return exactly 0.0 for empty denominators,
    and stay in [0, 100] whenever num <= denom."""
    from e_commerce_streaming_datapipeline_spark.functions.windows import safe_rate

    df = spark.createDataFrame(pairs, "num long, denom long")
    rows = df.select(
        "num", "denom", safe_rate(F.col("num"), F.col("denom")).alias("rate")
    ).collect()
    for r in rows:
        assert r.rate is not None
        if r.denom == 0:
            assert r.rate == 0.0
        else:
            # model fround's cross-engine semantics exactly: HALF_UP on the
            # double's exact value (Spark round / DuckDB std::round), NOT
            # Python round()'s half-even
            import decimal

            x = r.num / r.denom * 100  # safe_rate's scale multiply
            expected = float(
                decimal.Decimal(x * 100.0).quantize(
                    decimal.Decimal(1), rounding=decimal.ROUND_HALF_UP
                )
            ) / 100.0
            assert r.rate == expected
            if r.num <= r.denom:
                assert 0.0 <= r.rate <= 100.0


# -- similarity: cosine expression against a python model ---------------------

_vec = st.lists(
    st.floats(-10, 10, allow_nan=False, allow_infinity=False, width=32),
    min_size=4,
    max_size=4,
)


@PROP
@given(a=_vec, b=_vec)
def test_cosine_similarity_matches_python_model(spark, a, b):
    """The JVM-side cosine expression (functions/vector.py, the brute-force
    similarity kernel) must agree with an independent float64 model and obey
    |cos| <= 1 for any non-degenerate vectors."""
    from e_commerce_streaming_datapipeline_spark.functions.vector import (
        cosine_similarity_expr,
    )

    na, nb = math.sqrt(sum(x * x for x in a)), math.sqrt(sum(x * x for x in b))
    if na < 1e-6 or nb < 1e-6:
        return  # degenerate inputs are filtered out by every caller
    df = spark.createDataFrame([(a, b)], "a array<double>, b array<double>")
    got = df.select(
        cosine_similarity_expr(F.col("a"), F.col("b")).alias("cos")
    ).collect()[0].cos
    expect = sum(x * y for x, y in zip(a, b)) / (na * nb)
    assert abs(got - expect) < 1e-9
    assert abs(got) <= 1.0 + 1e-12


# -- minhash shingles: spark expression against a python model ----------------

_words = st.lists(st.sampled_from(["a", "b", "c", "d", "ee", "ff"]), min_size=0, max_size=12)


@PROP
@given(words_a=_words, words_b=_words)
def test_shingle_jaccard_matches_python_model(spark, words_a, words_b):
    """shingled_docs (the MinHash/Jaccard foundation) must produce exactly
    the distinct word-3-gram sets a reference implementation produces, so
    the exact-Jaccard verification step is trustworthy for any text."""
    from e_commerce_streaming_datapipeline_spark.operators.dedup import (
        SHINGLE_K,
        shingled_docs,
    )

    def py_shingles(words: list[str]) -> set[str]:
        return {
            " ".join(words[i : i + SHINGLE_K])
            for i in range(len(words) - SHINGLE_K + 1)
        }

    docs = spark.createDataFrame(
        [(0, " ".join(words_a)), (1, " ".join(words_b))], "doc_id long, text string"
    )
    got = {r.doc_id: set(r.shingles) for r in shingled_docs(docs).collect()}
    for doc_id, words in ((0, words_a), (1, words_b)):
        expect = py_shingles(words)
        if len(words) < SHINGLE_K:
            assert doc_id not in got  # too short to shingle: filtered, not empty
        else:
            assert got[doc_id] == expect


def test_merge_upsert_is_idempotent(spark, sf_dir):
    """MERGE semantics: applying the same update batch twice must equal
    applying it once (the exactly-once sink property D5 relies on)."""
    from pyspark.sql import functions as F

    from e_commerce_streaming_datapipeline_spark.operators.setops import merge_upsert
    from e_commerce_streaming_datapipeline_spark.sources.batch import load_table

    orders = load_table(spark, "orders", sf_dir).select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    existing = orders.where(F.col("o_orderkey") % 3 == 0)
    updates = orders.where(F.col("o_orderkey") % 2 == 0).withColumn(
        "o_totalprice", F.col("o_totalprice") + 1.0
    )
    once = merge_upsert(existing, updates, ["o_orderkey"])
    twice = merge_upsert(once, updates, ["o_orderkey"])
    assert once.exceptAll(twice).isEmpty() and twice.exceptAll(once).isEmpty()


def test_scd2_intervals_are_well_formed(spark, sf_dir):
    """SCD2 invariants per customer: exactly one open (is_current) version,
    every closed interval strictly precedes its successor, and version
    intervals never overlap."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from e_commerce_streaming_datapipeline_spark.operators.analytics import (
        q_scd2_priority_history,
    )

    hist = q_scd2_priority_history(spark, sf_dir)
    open_counts = (
        hist.groupBy("custkey")
        .agg(F.sum(F.col("is_current").cast("long")).alias("n_open"))
        .where(F.col("n_open") != 1)
    )
    assert open_counts.isEmpty(), "each customer must have exactly one open version"
    w = Window.partitionBy("custkey").orderBy("effective_from")
    overlaps = (
        hist.withColumn("next_from", F.lead("effective_from").over(w))
        .where(
            F.col("next_from").isNotNull()
            & (F.col("effective_to") != F.col("next_from"))
        )
    )
    assert overlaps.isEmpty(), "each version must close exactly at its successor"


@given(
    u=st.integers(min_value=0, max_value=255),
    t=st.integers(min_value=0, max_value=255),
)
@settings(max_examples=200, deadline=None)
def test_zorder_interleave_matches_python_model(u, t):
    """The generated shift/mask SQL (DuckDB dialect — the Spark dialect is
    the same arithmetic by construction) must equal the reference Python
    bit-interleave, and be a bijection on (u8, t8)."""
    import duckdb

    from e_commerce_streaming_datapipeline_spark.operators.layout import _interleave_sql

    expr = _interleave_sql(str(u), str(t), dialect="duckdb")
    got = duckdb.sql(f"SELECT {expr}").fetchone()[0]
    want = 0
    for i in range(8):
        want |= ((u >> i) & 1) << (2 * i + 1)
        want |= ((t >> i) & 1) << (2 * i)
    assert got == want
    # bijectivity: decode back
    du = dt = 0
    for i in range(8):
        du |= ((got >> (2 * i + 1)) & 1) << i
        dt |= ((got >> (2 * i)) & 1) << i
    assert (du, dt) == (u, t)


@given(key=st.integers(min_value=0, max_value=2**31 - 1))
@settings(max_examples=200, deadline=None)
def test_bloom_positions_in_range_and_engine_identical(key):
    """Both Bloom probe hashes must land in [0, m) and the DuckDB-dialect
    arithmetic must equal the Python model for any 31-bit key (no overflow
    ambiguity in BIGINT)."""
    import duckdb

    from e_commerce_streaming_datapipeline_spark.operators.layout import (
        _BLOOM_H,
        _BLOOM_M,
    )

    for a, b in _BLOOM_H:
        want = (key * a + b) % _BLOOM_M
        # CAST the key literal: table columns are BIGINT (promoting the
        # product), but a bare INT32 literal times INT32 overflows in DuckDB
        got = duckdb.sql(
            f"SELECT (CAST({key} AS BIGINT) * {a} + {b}) % {_BLOOM_M}"
        ).fetchone()[0]
        assert got == want
        assert 0 <= want < _BLOOM_M


# -- cross-engine rounding primitives: fround / cents_sum vs DuckDB ----------

_money_vals = st.lists(
    st.one_of(
        st.floats(-1e9, 1e9, allow_nan=False, allow_infinity=False, width=64),
        # knife-edge decimal halves (inexact in binary — the entire point:
        # both engines must round the SAME double the SAME way)
        st.integers(-10**6, 10**6).map(lambda k: k / 100 + 0.005),
        st.integers(-10**6, 10**6).map(lambda k: k / 1000 + 0.0005),
        st.sampled_from([52.755, 2.675, -2.675, 0.005, -0.005, 0.0]),
    ),
    min_size=1,
    max_size=50,
)


@PROP
@given(vals=_money_vals, ndigits=st.sampled_from([0, 2, 4, 6]))
def test_fround_bit_equals_duckdb_round(spark, vals, ndigits):
    """`fround(x, n)` (the rounding every oracle-checked column uses) must be
    BIT-equal to DuckDB's `round(x * 10^n) / 10^n` for arbitrary doubles,
    including decimal half knife-edges — the primitive the whole
    cross-engine hash-match strategy stands on."""
    import duckdb
    import struct

    from e_commerce_streaming_datapipeline_spark.functions.rounding import fround

    sdf = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "i long, x double")
    got = {
        r.i: r.y
        for r in sdf.select("i", fround(F.col("x"), ndigits).alias("y")).collect()
    }
    con = duckdb.connect()
    expected = {}
    for i, v in enumerate(vals):
        expected[i] = con.execute(
            f"SELECT round(CAST(? AS DOUBLE) * {10**ndigits}) / {10**ndigits}", [v]
        ).fetchone()[0]
    for i in got:
        g, e = got[i], expected[i]
        # bit-level comparison (0.0 == -0.0 would hide a sign divergence;
        # the value hash stringifies, where -0.0 and 0.0 both print 0)
        gb = struct.pack("<d", g if g != 0 else abs(g))
        eb = struct.pack("<d", e if e != 0 else abs(e))
        assert gb == eb, (vals[i], ndigits, g, e)


@PROP
@given(vals=_money_vals)
def test_cents_sum_bit_equals_duckdb(spark, vals):
    """`cents_sum` (scaled-long exact money aggregation) must equal DuckDB's
    `sum(CAST(round(x * 100) AS BIGINT))` for any input multiset — exactness
    plus order-independence is what makes money hashes engine-stable."""
    import duckdb

    from e_commerce_streaming_datapipeline_spark.functions.rounding import cents_sum

    # keep the scaled sum far from long overflow
    vals = [max(min(v, 1e12), -1e12) for v in vals]
    sdf = spark.createDataFrame([(v,) for v in vals], "x double")
    got = sdf.agg(cents_sum(F.col("x")).alias("s")).first().s
    con = duckdb.connect()
    con.execute("CREATE TABLE t (x DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?)", [(v,) for v in vals])
    expected = con.execute(
        "SELECT sum(CAST(round(x * 100) AS BIGINT)) FROM t"
    ).fetchone()[0]
    assert got == expected, (vals, got, expected)


@given(s=st.integers(min_value=0, max_value=10**16))
def test_integer_half_up_div_equals_engine_round(s):
    """The Markov-squaring claim pinned: for non-negative integer sums s,
    (s + 500000) // 1000000 == round(s / 1e6) as BOTH engines compute it
    (exact-half quotients are dyadic rationals, representable in double, so
    IEEE division lands exactly ON the .5 and half-away rounding agrees
    with the integer formula).  This is what lets the driver-side squaring
    chain in `markov_attribution` mirror the oracle's SQL round()."""
    import duckdb

    py = (s + 500_000) // 1_000_000
    duck = duckdb.connect().execute(
        f"SELECT CAST(round({s} / 1000000.0) AS BIGINT)"
    ).fetchone()[0]
    assert py == duck, (s, py, duck)


# -- BPE trainer: the shared-SQL merge semantics vs a pure-Python model ------

_bpe_words = st.lists(
    st.text(alphabet="ab", min_size=1, max_size=6),
    min_size=1,
    max_size=8,
)


def _bpe_reference(texts: list[str], n_merges: int = 5):
    """Sennrich-style BPE on a word-frequency table: per round, count
    adjacent symbol pairs weighted by word frequency, take the
    (count DESC, lhs, rhs) argmax, merge greedily left-to-right
    non-overlapping."""
    from collections import Counter

    wc = Counter(w for t in texts for w in t.split(" ") if len(w) >= 2)
    seqs = [(list(w), f) for w, f in wc.items()]
    merges = []
    for step in range(1, n_merges + 1):
        pc: Counter = Counter()
        for syms, f in seqs:
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += f
        if not pc:
            break
        (l, r), n = min(pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        merges.append((step, l, r, l + r, n))
        new_seqs = []
        for syms, f in seqs:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_seqs.append((out, f))
        seqs = new_seqs
    return merges


@settings(max_examples=30, deadline=None)
@given(words=_bpe_words)
def test_bpe_oracle_sql_matches_python_model(words):
    """bpe_learn_merges' SQL (the replace()-over-double-space-joined-symbols
    encoding shared by both engines; the Spark twin is hash-checked against
    this exact text at two SFs plus the documents edge fixture) must
    reproduce a direct Python BPE trainer on arbitrary corpora — including
    the overlapping-pair case ("aaa" -> ["aa","a"]) and merge exhaustion on
    tiny alphabets."""
    import duckdb
    import pandas as pd

    from e_commerce_streaming_datapipeline_spark.plans.registry import get_query

    sql = get_query("bpe_learn_merges").oracle
    con = duckdb.connect()
    con.register("documents", pd.DataFrame({"text": [" ".join(words)]}))
    got = sorted(map(tuple, con.execute(sql).fetchall()))
    want = sorted(_bpe_reference([" ".join(words)]))
    assert got == want
