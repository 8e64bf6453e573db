"""Round-8 additions, property-pinned: the incremental Hamming probe's
equivalence with brute force (planted hashes), its bucket-cap admission,
and the curate keep-selection aggregate's equivalence with the window
formulation it replaced (ties included)."""

from __future__ import annotations

from pyspark.sql import Window as W, functions as F


def test_incremental_probe_matches_bruteforce_planted(spark):
    """Hand-planted 64-bit hashes at known distances: the banded probe
    must return exactly the brute-force answer (pigeonhole: radius 3 <
    4 bands), including hamming-0 (identical hash) matches, min-id
    tie-breaks, and misses."""
    from dsacord_spark.operators.dedup import incremental_hamming_matches

    # index: ids 10/11 share hash 0b0 (min id 10); id 12 at 0xF0;
    # id 13 far away
    index = spark.createDataFrame(
        [(10, 0x00), (11, 0x00), (12, 0xF0), (13, 0x7777777777777777)],
        "id long, h long",
    )
    # batch: 1 == exact dup of hash 0 -> match 10, hamming 0
    #        2 == hamming 1 from 0    -> match 10, hamming 1
    #        3 == 0xD0: hamming 1 from 0xF0 AND hamming 3 from 0x00 —
    #             the aggregates are independent: best_hamming = 1 (via
    #             0xF0) while match_id = 10 (min id over ALL matches)
    #        4 == miss (far from everything)
    batch = spark.createDataFrame(
        [(1, 0x00), (2, 0x01), (3, 0xD0), (4, 0x0F0F0F0F0F0F0F0F)],
        "id long, h long",
    )
    got = {
        r["id"]: (r["is_dup"], r["match_id"], r["best_hamming"])
        for r in incremental_hamming_matches(
            index, batch, "id", "h", n_bands=4, radius=3, hash_bits=64
        ).collect()
    }
    assert got == {
        1: (True, 10, 0),
        2: (True, 10, 1),
        3: (True, 10, 1),
        4: (False, None, None),
    }


def test_incremental_probe_bruteforce_equivalence_on_corpus(spark, sf_dir):
    """On the real documents corpus: banded probe == brute-force
    crossJoin verify (exact recall with radius < n_bands, no cap)."""
    from dsacord_spark.operators.dedup import (
        SIMHASH_BITS,
        incremental_hamming_matches,
        simhash_signatures,
    )

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sig = simhash_signatures(d, "doc_id", "text").persist()
    try:
        batch = sig.filter(F.col("doc") % 10 == 0)
        index = sig.filter(F.col("doc") % 10 != 0)
        got = sorted(
            map(
                tuple,
                incremental_hamming_matches(
                    index, batch, "doc", "simhash",
                    n_bands=4, radius=3, hash_bits=SIMHASH_BITS,
                ).collect(),
            )
        )
        b, i = batch.alias("b"), index.alias("i")
        ham = F.bit_count(
            F.col("b.simhash").bitwiseXOR(F.col("i.simhash"))
        ).cast("int")
        brute = (
            b.crossJoin(i)
            .select(F.col("b.doc").alias("doc"), F.col("i.doc").alias("idoc"),
                    ham.alias("hm"))
            .filter(F.col("hm") <= 3)
            .groupBy("doc")
            .agg(F.min("idoc").alias("match_id"),
                 F.min("hm").alias("best_hamming"))
        )
        want = sorted(
            map(
                tuple,
                batch.select("doc")
                .join(brute, "doc", "left")
                .select(
                    "doc",
                    F.col("match_id").isNotNull().alias("is_dup"),
                    "match_id",
                    "best_hamming",
                )
                .collect(),
            )
        )
        assert got == want and len(got) > 0
    finally:
        sig.unpersist()


def test_incremental_probe_bucket_cap_bounds_not_breaks(spark):
    """A generous bucket_cap (bigger than any bucket) must not change
    the planted answer — the admission path is reachable without
    distorting results where it shouldn't bind."""
    from dsacord_spark.operators.dedup import incremental_hamming_matches

    index = spark.createDataFrame([(10, 0x00), (12, 0xF0)], "id long, h long")
    batch = spark.createDataFrame([(1, 0x01), (2, 0xFFFF)], "id long, h long")
    got = {
        r["id"]: (r["is_dup"], r["match_id"])
        for r in incremental_hamming_matches(
            index, batch, "id", "h", n_bands=4, radius=3, hash_bits=64,
            bucket_cap=100,
        ).collect()
    }
    assert got == {1: (True, 10), 2: (False, None)}


def test_curate_keep_aggregate_matches_window_formulation(spark):
    """The r8 min_by keep selection == the row_number window it
    replaced, on a corpus with the awkward cases: multi-member clusters,
    LENGTH TIES (id must break them), and singletons."""
    from dsacord_spark.curate import dedup_corpus

    rows = [
        # cluster of identical texts (exact -> same cluster), length tie
        (1, "same text here"),
        (2, "same text here"),
        (3, "same text here"),
        # another cluster, distinct lengths
        (4, "bbbb " * 10),
        (5, "bbbb " * 10),
        # singleton
        (9, "unique snowflake"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    labeled = dedup_corpus(docs, method="exact")
    # window formulation (the pre-r8 semantics), computed independently
    w = W.partitionBy("cluster_id").orderBy(
        F.length("text").desc(), F.col("doc_id").asc()
    )
    want = {
        r["doc_id"]: r["kept_w"]
        for r in labeled.withColumn(
            "kept_w", F.row_number().over(w) == 1
        ).collect()
    }
    got = {r["doc_id"]: r["kept"] for r in labeled.collect()}
    assert got == want
    assert got[1] and not got[2] and not got[3]  # tie -> min id wins
    assert got[9]  # singleton keeps itself


def test_incremental_probe_pigeonhole_guard(spark):
    """n_bands <= radius must raise, not silently lose recall."""
    import pytest

    from dsacord_spark.operators.dedup import incremental_hamming_matches

    idx = spark.createDataFrame([(1, 0)], "id long, h long")
    with pytest.raises(ValueError, match="pigeonhole"):
        incremental_hamming_matches(
            idx, idx, "id", "h", n_bands=4, radius=4, hash_bits=64
        )


def test_curate_keep_selection_labels_tokenless_docs(spark, tmp_path):
    """A doc whose text tokenizes to nothing has no simhash signature,
    but dedup_corpus (and the curate_keep_selection oracle) must still
    label it a kept singleton (r8 review)."""
    from dsacord_spark.curate import dedup_corpus

    docs = spark.createDataFrame(
        [(1, "real words here"), (2, "   "), (3, "")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["cluster_id"], r["kept"])
        for r in dedup_corpus(docs, method="simhash").collect()
    }
    assert got == {1: (1, True), 2: (2, True), 3: (3, True)}


def test_stream_incremental_dedup_matches_batch_entry(spark, sf_dir, monkeypatch):
    """The streamed probe must (a) actually run in >1 micro-batch and
    (b) return exactly the batch entry's rows — per-doc matches are
    independent of batching."""
    from dsacord_spark.plans.catalog import queries
    from dsacord_spark.streaming import pipeline as sp

    calls = []
    orig = sp.run_bounded_stream

    def counting(spark_, df, transform, **kw):
        bt = kw.get("batch_transform")

        def wrapped(b):
            calls.append(1)
            return bt(b)

        kw["batch_transform"] = wrapped
        return orig(spark_, df, transform, **kw)

    monkeypatch.setattr(sp, "run_bounded_stream", counting)
    got = sorted(
        map(tuple, queries()["stream_incremental_dedup"](spark, sf_dir).collect())
    )
    want = sorted(
        map(tuple, queries()["dedup_incremental_probe"](spark, sf_dir).collect())
    )
    assert got == want and len(got) > 0
    assert len(calls) >= 2, f"expected >=2 micro-batches, saw {len(calls)}"


def test_incremental_probe_hypothesis_random_hashes(spark):
    """Generative pin: for random 64-bit hash sets, the banded probe
    equals the O(|B| x |I|) brute force (pigeonhole exact recall at
    radius 3 < 4 bands). Few examples — each spins Spark jobs — but
    the generator covers duplicate hashes, shared batch/index values,
    and near-miss distances the planted fixture can't enumerate."""
    from hypothesis import HealthCheck, given, settings, strategies as st

    from dsacord_spark.operators.dedup import incremental_hamming_matches

    h64 = st.integers(min_value=-(2**63), max_value=2**63 - 1)
    # bias toward collisions/near-misses: mix a tiny base pool with
    # single-bit flips of it
    base = st.shared(st.lists(h64, min_size=2, max_size=4), key="pool")
    def _flip_signed64(x, bit):
        v = (x ^ (1 << bit)) & ((1 << 64) - 1)
        return v - (1 << 64) if v >= (1 << 63) else v

    near = st.builds(
        lambda pool, i, bit: _flip_signed64(pool[i % len(pool)], bit),
        base, st.integers(0, 3), st.integers(0, 63),
    )
    val = st.one_of(near, h64)

    @settings(max_examples=5, deadline=None,
              suppress_health_check=list(HealthCheck))
    @given(
        st.lists(val, min_size=1, max_size=6),
        st.lists(val, min_size=1, max_size=6),
    )
    def run(batch_hs, index_hs):
        batch = spark.createDataFrame(
            [(i, h) for i, h in enumerate(batch_hs)], "id long, h long"
        )
        index = spark.createDataFrame(
            [(100 + i, h) for i, h in enumerate(index_hs)], "id long, h long"
        )
        got = {
            r["id"]: (r["is_dup"], r["match_id"], r["best_hamming"])
            for r in incremental_hamming_matches(
                index, batch, "id", "h", n_bands=4, radius=3, hash_bits=64
            ).collect()
        }
        want = {}
        for bi, bh in enumerate(batch_hs):
            ms = [
                (100 + ii, bin((bh ^ ih) & ((1 << 64) - 1)).count("1"))
                for ii, ih in enumerate(index_hs)
            ]
            ms = [(i, d) for i, d in ms if d <= 3]
            want[bi] = (
                (True, min(i for i, _ in ms), min(d for _, d in ms))
                if ms else (False, None, None)
            )
        assert got == want

    run()


def test_persisted_hamming_index_matches_inmemory_probe(spark, sf_dir):
    """build_hamming_index -> probe_hamming_index must equal the
    in-memory incremental_hamming_matches on the real corpus (shared
    tail, index side served from the pre-hashed summary/band tables),
    and a band-parameter drift between build and probe must raise."""
    import pytest

    from dsacord_spark.operators.dedup import (
        SIMHASH_BITS,
        build_hamming_index,
        incremental_hamming_matches,
        probe_hamming_index,
        simhash_signatures,
    )

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sig = simhash_signatures(d, "doc_id", "text").persist()
    try:
        batch = sig.filter(F.col("doc") % 10 == 0)
        index = sig.filter(F.col("doc") % 10 != 0)
        build_hamming_index(
            index, "doc", "simhash", "t_ham_idx",
            n_bands=4, hash_bits=SIMHASH_BITS, buckets=4,
        )
        got = sorted(map(tuple, probe_hamming_index(
            spark, "t_ham_idx", batch, "doc", "simhash", radius=3
        ).collect()))
        want = sorted(map(tuple, incremental_hamming_matches(
            index, batch, "doc", "simhash",
            n_bands=4, radius=3, hash_bits=SIMHASH_BITS,
        ).collect()))
        assert got == want and len(got) > 0
        # the meta table guards parameter drift: radius >= stored n_bands
        with pytest.raises(ValueError, match="pigeonhole"):
            probe_hamming_index(
                spark, "t_ham_idx", batch, "doc", "simhash", radius=4
            )
    finally:
        sig.unpersist()
        for t in ("t_ham_idx_summary", "t_ham_idx_bands", "t_ham_idx_meta"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_hamming_index_append_mode_extends_index(spark):
    """build_hamming_index(mode='append') over a delta must extend the
    index (per-hash MIN is monotone under union), and an append with
    drifted band parameters must raise against the meta row."""
    import pytest

    from dsacord_spark.operators.dedup import (
        build_hamming_index,
        probe_hamming_index,
    )

    try:
        base = spark.createDataFrame([(10, 0x00)], "id long, h long")
        build_hamming_index(base, "id", "h", "t_ham_app", n_bands=4,
                            hash_bits=64, buckets=2)
        delta = spark.createDataFrame(
            [(5, 0x00), (20, 0xF0)], "id long, h long"
        )
        build_hamming_index(delta, "id", "h", "t_ham_app", n_bands=4,
                            hash_bits=64, buckets=2, mode="append")
        batch = spark.createDataFrame(
            [(1, 0x00), (2, 0xF1), (3, 0x0F0F0F0F0F0F0F0F)],
            "id long, h long",
        )
        got = {
            r["id"]: (r["is_dup"], r["match_id"])
            for r in probe_hamming_index(
                spark, "t_ham_app", batch, "id", "h", radius=3
            ).collect()
        }
        # hash 0x00 now has summary rows from BOTH builds: min wins (5);
        # 0xF0 exists only via the appended delta
        assert got == {1: (True, 5), 2: (True, 20), 3: (False, None)}
        with pytest.raises(ValueError, match="does not match"):
            build_hamming_index(delta, "id", "h", "t_ham_app", n_bands=2,
                                hash_bits=64, buckets=2, mode="append")
    finally:
        for t in ("t_ham_app_summary", "t_ham_app_bands", "t_ham_app_meta"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
