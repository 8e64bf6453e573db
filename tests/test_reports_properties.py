"""Property tests: reports.py entries vs independent pure-Python
references on adversarial corpora. The DuckDB oracle proves Spark and
DuckDB agree; these prove both agree with a from-scratch statement of
the INTENDED semantics (same pattern as test_quality_properties.py).
"""

from __future__ import annotations

from fractions import Fraction

from hypothesis import given, settings, strategies as st

from dsacord_spark.plans.catalog import specs

_VOCAB = ["a", "bb", "ccc", "d1", "!"]
_doc = st.lists(st.sampled_from(_VOCAB), min_size=0, max_size=12)


def _write_docs(spark, tmp_path_factory, rows, schema):
    sf = str(tmp_path_factory.mktemp("rp"))
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{sf}/documents.parquet")
    return sf


@settings(max_examples=8, deadline=None)
@given(corpus=st.lists(_doc, min_size=1, max_size=6))
def test_ari_matches_python_reference(spark, tmp_path_factory, corpus):
    """ARI = (471*c*s + 50*w^2 - 2143*w*s) / (100*w*s) with half-up
    integer rounding to 6dp — checked against direct Fraction math."""
    rows = [(d, " ".join(t) + ". tail sentence") for d, t in enumerate(corpus)]
    sf = _write_docs(spark, tmp_path_factory, rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_chars"], r["n_words"], r["n_sentences"], r["ari"])
        for r in specs()["text_readability_ari"].fn(spark, sf).collect()
    }
    for d, (_, text) in enumerate(rows):
        c = sum(1 for ch in text if ch.isascii() and ch.isalnum())
        w = len([t for t in text.split() if t])
        s = max(
            len([p for p in (seg.strip(" ") for seg in text.split(".")) if p]),
            1,
        )
        if w == 0:
            assert d not in got
            continue
        num, den = 471 * c * s + 50 * w * w - 2143 * w * s, 100 * w * s
        ari_e6 = int((Fraction(num) * 1_000_000 + Fraction(den, 2)) / den)
        assert got[d] == (c, w, s, ari_e6 / 1_000_000), (d, text, got[d])


@settings(max_examples=8, deadline=None)
@given(
    corpus=st.lists(
        st.tuples(st.sampled_from(["s0", "s1", "s2"]), _doc),
        min_size=2,
        max_size=8,
    )
)
def test_tv_distance_matches_python_reference(spark, tmp_path_factory, corpus):
    """TV distance via the shared-token algebra must equal the direct
    full-vocabulary Fraction sum (validates the missing-token-mass
    recovery: sum_only_in_1 c1*t2 == (t1 - shared1)*t2)."""
    rows = [(d, src, " ".join(t)) for d, (src, t) in enumerate(corpus)]
    sf = _write_docs(
        spark, tmp_path_factory, rows, "doc_id long, source string, text string"
    )
    got = {
        (r["source_a"], r["source_b"]): r["tv_distance"]
        for r in specs()["source_vocab_tv_distance"].fn(spark, sf).collect()
    }
    counts: dict[str, dict[str, int]] = {}
    for _, src, text in rows:
        for tk in text.split():
            counts.setdefault(src, {})[tk] = counts.get(src, {}).get(tk, 0) + 1
    srcs = sorted(counts)
    want = {}
    for i, s1 in enumerate(srcs):
        for s2 in srcs[i + 1 :]:
            t1, t2 = sum(counts[s1].values()), sum(counts[s2].values())
            if not t1 or not t2:
                continue
            vocab = set(counts[s1]) | set(counts[s2])
            tv = (
                sum(
                    abs(
                        Fraction(counts[s1].get(tk, 0), t1)
                        - Fraction(counts[s2].get(tk, 0), t2)
                    )
                    for tk in vocab
                )
                / 2
            )
            want[(s1, s2)] = round(float(tv), 6)
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 2e-6, (k, got[k], want[k])


@settings(max_examples=8, deadline=None)
@given(corpus=st.lists(_doc, min_size=1, max_size=6))
def test_bigram_fluency_matches_python_reference(
    spark, tmp_path_factory, corpus
):
    """Mean add-one-smoothed bigram probability vs a direct Python
    reference with position-ordered summation."""
    rows = [(d, " ".join(t)) for d, t in enumerate(corpus)]
    sf = _write_docs(spark, tmp_path_factory, rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_bigrams"], r["mean_bigram_p"])
        for r in specs()["text_bigram_lm_fluency"].fn(spark, sf).collect()
    }
    toks = {d: [t for t in text.split() if t] for d, text in rows}
    uni: dict[str, int] = {}
    big: dict[tuple[str, str], int] = {}
    vocab = set()
    for t in toks.values():
        for w in t:
            uni[w] = uni.get(w, 0) + 1
            vocab.add(w)
        for a, b in zip(t, t[1:]):
            big[(a, b)] = big.get((a, b), 0) + 1
    want = {}
    for d, t in toks.items():
        if len(t) < 2:
            continue
        ps = [
            (big[(a, b)] + 1) / (uni[a] + len(vocab))
            for a, b in zip(t, t[1:])
        ]
        s = 0.0
        for p in ps:
            s += p
        want[d] = (len(ps), round(s / len(ps), 9))
    assert got == want, (corpus, got, want)


def test_global_rank_ntile_matches_builtin(spark):
    """_global_rank + _ntile_bucket must reproduce Spark's own
    row_number/ntile over the same total ordering for every (n, k) shape
    — including n < k, n % k != 0, duplicate order values broken by the
    tie-break, and n smaller than the partition count."""
    from pyspark.sql import Window as W, functions as F

    from dsacord_spark.plans.reports import _global_rank, _ntile_bucket

    for n, k in [(1, 10), (7, 5), (10, 10), (23, 5), (57, 10), (64, 3)]:
        rows = [(i, (i * 7919) % 13, f"id{i:03d}") for i in range(n)]
        df = spark.createDataFrame(rows, "i long, v long, tb string")
        order = [F.col("v").desc(), F.col("tb").asc()]
        win = W.orderBy(*order)
        expect = {
            (r["i"]): (r["r"], r["b"])
            for r in df.select(
                "i",
                F.row_number().over(win).alias("r"),
                F.ntile(k).over(win).alias("b"),
            ).collect()
        }
        ranked = _global_rank(df, order, "r", parts=4)
        got = {
            r["i"]: (r["r"], r["b"])
            for r in ranked.withColumn(
                "b", _ntile_bucket(F.col("r"), F.lit(n), k)
            ).collect()
        }
        assert got == expect, (n, k)


def test_global_cumsum_matches_builtin(spark):
    """_global_cumsum must reproduce SUM() OVER (ORDER BY ... ROWS
    UNBOUNDED PRECEDING) exactly — including null runs (sum skips nulls,
    an all-null prefix stays null), negative deltas, and frames smaller
    than the partition count."""
    from pyspark.sql import Window as W, functions as F

    from dsacord_spark.plans.distrib import _global_cumsum

    rows = [
        (i, (i * 31) % 7 - 3, None if i % 5 == 0 else (i * 13) % 11)
        for i in range(57)
    ]
    df = spark.createDataFrame(rows, "i long, a long, b long")
    order = [F.col("i").asc()]
    win = (
        W.orderBy(*order).rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    expect = {
        r["i"]: (r["ca"], r["cb"])
        for r in df.select(
            "i",
            F.sum("a").over(win).alias("ca"),
            F.sum("b").over(win).alias("cb"),
        ).collect()
    }
    got = {
        r["i"]: (r["ca"], r["cb"])
        for r in _global_cumsum(
            df, order, {"ca": F.col("a"), "cb": F.col("b")}, parts=4
        ).collect()
    }
    assert got == expect


def test_global_rank_survives_no_exchange_reuse(spark):
    """Structural-consistency pin (round-4 ADVICE medium): _global_rank /
    _global_cumsum must not depend on Spark's exchange/stage reuse to
    keep the offsets branch and the probe branch on the SAME
    repartitionByRange materialization. With reuse disabled, only the
    unconditional persist in _ranged guarantees one boundary sample and
    one _pid assignment — ranks must still exactly match the built-in
    window forms."""
    from pyspark.sql import Window as W, functions as F

    from dsacord_spark.plans.distrib import _global_cumsum, _global_rank

    old = spark.conf.get("spark.sql.exchange.reuse", "true")
    spark.conf.set("spark.sql.exchange.reuse", "false")
    try:
        rows = [(i, (i * 7919) % 13, f"id{i:03d}") for i in range(157)]
        df = spark.createDataFrame(rows, "i long, v long, tb string")
        order = [F.col("v").desc(), F.col("tb").asc()]
        expect = {
            r["i"]: r["r"]
            for r in df.select(
                "i", F.row_number().over(W.orderBy(*order)).alias("r")
            ).collect()
        }
        got = {
            r["i"]: r["r"]
            for r in _global_rank(df, order, "r", parts=8).collect()
        }
        assert got == expect
        win = W.orderBy(F.col("i").asc()).rowsBetween(
            W.unboundedPreceding, W.currentRow
        )
        expect_c = {
            r["i"]: r["cv"]
            for r in df.select("i", F.sum("v").over(win).alias("cv")).collect()
        }
        got_c = {
            r["i"]: r["cv"]
            for r in _global_cumsum(
                df, [F.col("i").asc()], {"cv": F.col("v")}, parts=8
            ).collect()
        }
        assert got_c == expect_c
    finally:
        spark.conf.set("spark.sql.exchange.reuse", old)
        spark.catalog.clearCache()


def test_distrib_rejects_shadowing_output_names(spark):
    """Output names that collide with input columns must raise instead of
    silently computing later sums over an overwritten column (round-4
    ADVICE low)."""
    import pytest
    from pyspark.sql import functions as F

    from dsacord_spark.plans.distrib import _global_cumsum, _global_rank

    df = spark.createDataFrame([(1, 2)], "i long, v long")
    with pytest.raises(ValueError, match="collide"):
        _global_rank(df, [F.col("i").asc()], rank_name="v")
    with pytest.raises(ValueError, match="collide"):
        _global_cumsum(df, [F.col("i").asc()], {"v": F.col("v")})


def test_copresence_cap_binding_matches_oracle(spark, tmp_path_factory):
    """events_user_copresence_topk's per-hour admission cap never binds at
    the test SFs — this fixture makes it bind (one hour with more users
    than _COPRESENCE_CAP) and checks Spark and the DuckDB oracle still
    agree exactly, i.e. the scrambled-admission cap is implemented
    identically on both engines."""
    import datetime as dt

    from dsacord_spark.plans.reports import _COPRESENCE_CAP
    from tests.oracle_harness import check_query

    n_users = _COPRESENCE_CAP + 173  # cap binds in hour 0
    rows = []
    base = dt.datetime(2025, 3, 1, 0, 0, 0)
    for u in range(n_users):
        rows.append((u + 1, u + 1, base + dt.timedelta(seconds=u % 3600)))
    # a second, uncapped hour shared by a subset (nonzero pair counts > 1)
    for u in range(40):
        rows.append(
            (10_000 + u, u + 1, base + dt.timedelta(hours=2, seconds=u))
        )
    import pyarrow as pa
    import pyarrow.parquet as pq

    sf = str(tmp_path_factory.mktemp("cop"))
    # single parquet FILE (not a Spark directory) so the DuckDB side of
    # check_query can read the same path
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
        }
    )
    pq.write_table(tbl, f"{sf}/events.parquet")
    problems = check_query(spark, "events_user_copresence_topk", sf)
    assert not problems, problems


def test_separability_degenerate_single_label_matches_oracle(
    spark, tmp_path_factory
):
    """embed_separability_index on degenerate input (ONE label -> zero
    inter-label pairs; plus an all-zero-norm label) must emit the SAME
    NULL-mean row on both engines — DuckDB's list_reduce raises on an
    empty fold and Spark's 0.0-init fold divides by zero unless both
    sides guard on count()==0 (the round-3 advice item)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tests.oracle_harness import check_query

    for name, labels in [("one_label", [7] * 5), ("zero_norms", [1, 2])]:
        vecs = (
            [[1.0, 2.0, 3.0]] * 5
            if name == "one_label"
            else [[0.0, 0.0, 0.0], [0.0, 0.0, 0.0]]
        )
        sf = str(tmp_path_factory.mktemp(name))
        tbl = pa.table(
            {
                "vec_id": pa.array(range(1, len(labels) + 1), pa.int64()),
                "embedding": pa.array(vecs, pa.list_(pa.float32())),
                "label": pa.array(labels, pa.int32()),
            }
        )
        pq.write_table(tbl, f"{sf}/embeddings.parquet")
        problems = check_query(spark, "embed_separability_index", sf)
        assert not problems, (name, problems)


def _write_events(tmp_path_factory, name, rows):
    """rows: (event_id, ts_datetime, user_id, event_type, value). Single
    parquet FILE so both engines read the same path."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    sf = str(tmp_path_factory.mktemp(name))
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    pq.write_table(tbl, f"{sf}/events.parquet")
    return sf


def test_ab_effect_size_degenerate_one_arm_matches_oracle(
    spark, tmp_path_factory
):
    """events_ab_effect_size with only one arm present (no 'purchase'
    rows): every purchase-side moment is NULL and both engines must
    propagate identical NULLs through the cross-multiplied algebra."""
    import datetime as dt

    from tests.oracle_harness import check_query

    base = dt.datetime(2025, 3, 1)
    rows = [
        (i + 1, base + dt.timedelta(minutes=i), 1 + i % 3, "click",
         round(0.01 * ((i * 37) % 500), 2))
        for i in range(40)
    ]
    sf = _write_events(tmp_path_factory, "onearm", rows)
    problems = check_query(spark, "events_ab_effect_size", sf)
    assert not problems, problems


def test_session_histogram_tie_break_matches_oracle(
    spark, tmp_path_factory
):
    """events_session_duration_histogram with duplicate per-user
    timestamps WHERE a >=4h session boundary lands inside the tie group:
    without the (ts_us, event_id) tie-break on the cumulative-sum window
    (the round-3 advice item) the tie rows split between sessions by
    physical order and the histogram is engine-dependent."""
    import datetime as dt

    from tests.oracle_harness import check_query

    base = dt.datetime(2025, 3, 1)
    rows = []
    eid = 0
    for u in (1, 2, 3):
        # three events at the EXACT same timestamp...
        for _ in range(3):
            eid += 1
            rows.append((eid, base, u, "click", 1.0))
        # ...then a 4h gap, then another tie group at the boundary
        for _ in range(3):
            eid += 1
            rows.append(
                (eid, base + dt.timedelta(hours=4), u, "click", 1.0)
            )
        eid += 1
        rows.append(
            (eid, base + dt.timedelta(hours=4, minutes=30), u, "view", 1.0)
        )
    sf = _write_events(tmp_path_factory, "ties", rows)
    problems = check_query(spark, "events_session_duration_histogram", sf)
    assert not problems, problems


def test_ntile_closed_form_wide_grid(spark):
    """_ntile_bucket's closed form vs a from-scratch Python statement of
    ntile (first n%k buckets take ceil(n/k) rows) over every (n, k) with
    n <= 120, k in {1..12} — one Spark job per k, all ranks at once."""
    from pyspark.sql import functions as F

    from dsacord_spark.plans.distrib import _ntile_bucket

    def ref_bucket(r, n, k):
        q, rem = divmod(n, k)
        cut = rem * (q + 1)
        if r <= cut:
            return (r - 1) // (q + 1) + 1
        return rem + (r - cut - 1) // q + 1

    rows = [(n, r) for n in range(1, 121) for r in range(1, n + 1)]
    df = spark.createDataFrame(rows, "n long, r long")
    for k in range(1, 13):
        got = {
            (x["n"], x["r"]): x["b"]
            for x in df.select(
                "n", "r", _ntile_bucket(F.col("r"), F.col("n"), k).alias("b")
            ).collect()
        }
        for (n, r), b in got.items():
            assert b == ref_bucket(r, n, k), (n, r, k, b)


def test_integer_round6_formula_is_half_up_everywhere():
    """The cross-engine 6dp rounding used throughout reports.py —
    (2e6*n + d) div (2*d), both engines truncating toward zero on
    non-negative operands — must equal exact half-UP rounding of n/d to
    six decimals for ALL non-negative n <= d. Property-checked with
    exact rational arithmetic (no float detour), including the
    .xxxxxx5 ties where Spark round() (half-up) and DuckDB round()
    (half-even on doubles) genuinely disagree."""
    from fractions import Fraction

    from hypothesis import given, settings, strategies as st

    @settings(max_examples=500, deadline=None)
    @given(st.integers(0, 10**12), st.integers(1, 10**12))
    def check(n, d):
        if n > d:
            n, d = d, n  # ratios in the catalog are shares <= 1
        got = (2_000_000 * n + d) // (2 * d)
        x = Fraction(n, d) * 1_000_000
        exact_half_up = (x.numerator * 2 + x.denominator) // (
            2 * x.denominator
        )
        assert got == exact_half_up, (n, d, got, exact_half_up)

    check()

    # the documented tie case: 1/128 * 1e6 = 7812.5 -> half-up 7813
    assert (2_000_000 * 1 + 128) // (2 * 128) == 7813
