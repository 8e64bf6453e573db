"""Cross-engine parity for the round-5 entries on paths the test data
never exercises (the repo's adversarial-fixture tradition: cap binding,
empty folds, degenerate inputs — each checked at full driver strictness
via tests.oracle_harness.check_query on a synthetic parquet table)."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

from tests.oracle_harness import check_query


def _write_docs(sf, texts, sources=None, langs=None):
    n = len(texts)
    tbl = pa.table(
        {
            "doc_id": pa.array(range(1, n + 1), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs or ["en"] * n, pa.string()),
            "source": pa.array(
                sources or [f"s{i % 3}" for i in range(n)], pa.string()
            ),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(tbl, f"{sf}/documents.parquet")


def test_dedup_savings_no_duplicates_and_total_wipe(spark, tmp_path_factory):
    """Two degenerate corpora: all-unique (n_removed must be 0 for every
    source on both engines) and one source that is pure duplicates of a
    doc owned by another source (removal_rate exactly 1.0 there —
    canonical selection is global, not per-source)."""
    sf = str(tmp_path_factory.mktemp("uniq"))
    _write_docs(sf, [f"unique doc {i}" for i in range(30)])
    assert not check_query(spark, "corpus_dedup_savings_by_source", sf)

    sf2 = str(tmp_path_factory.mktemp("wipe"))
    texts = ["the shared doc"] * 10 + [f"own doc {i}" for i in range(10)]
    sources = ["keeper"] + ["loser"] * 9 + ["keeper"] * 10
    _write_docs(sf2, texts, sources)
    assert not check_query(spark, "corpus_dedup_savings_by_source", sf2)


def test_dedup_savings_whitespace_normalized_cluster(spark, tmp_path_factory):
    """Docs differing only in case/whitespace must land in ONE cluster on
    both engines (the normalized fingerprint is the dedup key)."""
    sf = str(tmp_path_factory.mktemp("norm"))
    _write_docs(
        sf,
        ["Hello   World", "hello world", "  HELLO  WORLD  ", "other"],
        ["a", "b", "c", "c"],
    )
    assert not check_query(spark, "corpus_dedup_savings_by_source", sf)


def _write_embeds(sf, vecs, labels=None):
    n = len(vecs)
    tbl = pa.table(
        {
            "vec_id": pa.array(range(1, n + 1), pa.int64()),
            "embedding": pa.array(vecs, pa.list_(pa.float32())),
            "label": pa.array(labels or [0] * n, pa.int32()),
        }
    )
    pq.write_table(tbl, f"{sf}/embeddings.parquet")


def test_embed_redundancy_constant_dim_filtered_both_engines(
    spark, tmp_path_factory
):
    """A zero-variance dimension has no defined correlation: both engines
    must FILTER its pairs (the var>0 guard), not divide by zero."""
    sf = str(tmp_path_factory.mktemp("const"))
    vecs = [[1.0, float(i), float(i % 3), 2.5] for i in range(12)]
    _write_embeds(sf, vecs)
    assert not check_query(spark, "embed_dim_redundancy_topk", sf)


def test_embed_redundancy_duplicated_dim_exact_unit_corr(
    spark, tmp_path_factory
):
    """A dimension duplicated (and one negated) must score corr exactly
    +/-1.0 on the integer grid — the quantized algebra is exact, so both
    engines produce literal 1.0/-1.0, not 0.999999. Values sit ON the
    1/128 grid (i/128 is exact in float32) because floor() is not
    odd-symmetric off-grid: floor(-x*128) = -ceil(x*128) there, which
    legitimately breaks perfect anti-correlation (both engines agree on
    that too — check_query covers the off-grid case at the catalog SFs)."""
    from dsacord_spark.plans.catalog import queries

    sf = str(tmp_path_factory.mktemp("dup"))
    vecs = [
        [i / 128, i / 128, -i / 128, float(i % 5) / 3] for i in range(20)
    ]
    _write_embeds(sf, vecs)
    assert not check_query(spark, "embed_dim_redundancy_topk", sf)
    rows = {
        (r["dim_i"], r["dim_j"]): r["corr"]
        for r in queries()["embed_dim_redundancy_topk"](spark, sf).collect()
    }
    assert rows[(1, 2)] == 1.0
    assert rows[(1, 3)] == -1.0


def test_embed_redundancy_null_elements_and_null_rows(
    spark, tmp_path_factory
):
    """Null embedding ELEMENTS quantize to 0 on both engines; an
    all-NULL embedding row contributes nothing (dropped by the Arrow
    kernel, no rows from the oracle's unnest) — driver-strict parity on
    the dirty-input path the catalog data never exercises."""
    import pyarrow as pa

    sf = str(tmp_path_factory.mktemp("nulls"))
    vecs = [
        [1.0, None, float(i) / 4, 0.5] if i % 4 == 0
        else ([None, None, None, None] if i == 5
              else [float(i) / 8, 1.0 - i / 8, float(i % 3), -0.25])
        for i in range(16)
    ]
    vecs_arr = pa.array(
        [None if i == 5 else vecs[i] for i in range(16)],
        pa.list_(pa.float32()),
    )
    tbl = pa.table(
        {
            "vec_id": pa.array(range(1, 17), pa.int64()),
            "embedding": vecs_arr,
            "label": pa.array([0] * 16, pa.int32()),
        }
    )
    import pyarrow.parquet as pq

    pq.write_table(tbl, f"{sf}/embeddings.parquet")
    assert not check_query(spark, "embed_dim_redundancy_topk", sf)
    spark.catalog.clearCache()


def test_embed_redundancy_all_empty_lists_empty_result(
    spark, tmp_path_factory
):
    """Embeddings that are all EMPTY lists: the oracle's unnest emits no
    rows, so the result is empty — the Arrow kernel must skip the batch
    (d=0), not crash on a zero-width reshape."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    sf = str(tmp_path_factory.mktemp("empty"))
    tbl = pa.table(
        {
            "vec_id": pa.array(range(1, 6), pa.int64()),
            "embedding": pa.array([[]] * 5, pa.list_(pa.float32())),
            "label": pa.array([0] * 5, pa.int32()),
        }
    )
    pq.write_table(tbl, f"{sf}/embeddings.parquet")
    assert not check_query(spark, "embed_dim_redundancy_topk", sf)
    spark.catalog.clearCache()


def test_simhash_calibration_small_corpus_and_exact_dups(
    spark, tmp_path_factory
):
    """Corpus smaller than the sample cap (every doc sampled, all pairs
    scored) with an exact-duplicate pair (hamming-0 bucket must appear)
    and an empty doc (dropped from signatures on both engines)."""
    from dsacord_spark.plans.catalog import queries

    sf = str(tmp_path_factory.mktemp("simcal"))
    texts = (
        ["alpha beta gamma delta"] * 2
        + ["   "]  # tokenless: dropped by both signature pipelines
        + [f"doc {i} words {i * 7} more {i * 13}" for i in range(12)]
    )
    _write_docs(sf, texts)
    assert not check_query(spark, "dedup_simhash_radius_calibration", sf)
    rows = {
        r["hamming"]: r["n_pairs"]
        for r in queries()["dedup_simhash_radius_calibration"](
            spark, sf
        ).collect()
    }
    assert rows.get(0) == 1  # exactly the duplicate pair
    # 14 docs with tokens -> C(14,2) pairs total
    assert sum(rows.values()) == 14 * 13 // 2
    spark.catalog.clearCache()


def _write_events_ts(sf, days_and_counts, base=None):
    """events.parquet with `count` events on each given day offset."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    base = base or dt.datetime(2024, 3, 1, 12, 0, 0)
    rows = []
    for day, count in days_and_counts:
        for k in range(count):
            rows.append(base + dt.timedelta(days=day, seconds=k))
    tbl = pa.table(
        {
            "event_id": pa.array(range(len(rows)), pa.int64()),
            "user_id": pa.array([1] * len(rows), pa.int64()),
            "ts": pa.array(rows, pa.timestamp("us")),
        }
    )
    pq.write_table(tbl, f"{sf}/events.parquet")


def test_autocorr_gap_days_count_as_zero(spark, tmp_path_factory):
    """Days with no events are 0 on the spine, not absent: a 3-day hole
    between two active stretches must depress lag-1 correlation on both
    engines identically (without the spine the pair set itself differs)."""
    sf = str(tmp_path_factory.mktemp("gap"))
    _write_events_ts(
        sf, [(0, 5), (1, 9), (2, 4), (6, 8), (7, 3), (8, 11), (20, 2)]
    )
    assert not check_query(spark, "events_daily_autocorr", sf)


def test_autocorr_constant_series_drops_all_lags(spark, tmp_path_factory):
    """A constant daily series has zero variance: the var>0 guard must
    produce an EMPTY result on both engines (not NaN/divide-by-zero)."""
    sf = str(tmp_path_factory.mktemp("const"))
    _write_events_ts(sf, [(d, 7) for d in range(20)])
    assert not check_query(spark, "events_daily_autocorr", sf)


def test_autocorr_series_shorter_than_longest_lag(spark, tmp_path_factory):
    """A 5-day span has no lag-7/14 pairs at all: those lags must vanish
    from the output on both engines rather than emit n_pairs=0 rows."""
    sf = str(tmp_path_factory.mktemp("short"))
    _write_events_ts(sf, [(0, 3), (1, 9), (2, 1), (3, 14), (4, 6)])
    assert not check_query(spark, "events_daily_autocorr", sf)


def test_quality_sweep_unreached_thresholds_report_zero(
    spark, tmp_path_factory
):
    """A corpus where no document reaches the top score levels: the
    thresholds above the best score must report n_docs=0 / doc_pct=0.0
    (NOT null — the totals ride every threshold row via the one-row
    cross join, the exact path a totals column on the level join would
    leave NULL)."""
    sf = str(tmp_path_factory.mktemp("lowq"))
    # pure punctuation docs: fail the length band (tokens < 5), fail the
    # stopword ratio, fail punct < 0.2 -> score 0 for all
    _write_docs(sf, ["!!! ??? ***"] * 6)
    assert not check_query(spark, "corpus_quality_prune_sweep", sf)


def test_quality_sweep_mixed_levels_and_token_weighting(
    spark, tmp_path_factory
):
    """Docs engineered onto distinct score levels with very different
    token counts: doc_pct and token_pct must diverge (token weighting is
    real) and match the oracle at every threshold."""
    sf = str(tmp_path_factory.mktemp("mix"))
    s10 = "the cat and the dog walked to the park with a friend"  # 4+3+3
    s7_no_stop = " ".join(f"w{i}" for i in range(120))  # len + punct
    s7_stop_punct = "the!!! and??? of*** to### is$$$ in%%%"  # len + stop
    s4 = " ".join(f"w{i}!!!!!!!!!!" for i in range(120))  # len only
    s3 = "alpha beta gamma"  # punct only (under the length band)
    s0 = "!!! ??? ***"
    _write_docs(sf, [s10] * 3 + [s7_no_stop, s7_stop_punct] + [s4] * 2 + [s3, s0])
    assert not check_query(spark, "corpus_quality_prune_sweep", sf)


def test_effective_rank_rank1_collapse_is_exactly_one(
    spark, tmp_path_factory
):
    """All vectors on one ray: the second-moment matrix is rank 1, so
    the participation ratio must be EXACTLY 1.0 on both engines (trace^2
    == frobenius^2 in exact integer algebra — any drift means a sum left
    the decimal path)."""
    sf = str(tmp_path_factory.mktemp("rank1"))
    base = [1.0, 2.0, -1.0, 0.5]
    _write_embeds(sf, [[x * s for x in base] for s in (1.0, 2.0, 3.0, -2.0)])
    assert not check_query(spark, "embed_effective_rank", sf)
    from dsacord_spark.plans.catalog import specs

    row = specs()["embed_effective_rank"].fn(spark, sf).collect()[0]
    assert row.effective_rank == 1.0
    spark.catalog.clearCache()


def test_effective_rank_orthogonal_basis_hits_dimension(
    spark, tmp_path_factory
):
    """One vector per basis direction with equal magnitude: isotropic
    second moment, PR == d exactly (4.0 here), top share == 1/d."""
    sf = str(tmp_path_factory.mktemp("iso"))
    vecs = [
        [2.0, 0.0, 0.0, 0.0],
        [0.0, 2.0, 0.0, 0.0],
        [0.0, 0.0, 2.0, 0.0],
        [0.0, 0.0, 0.0, 2.0],
    ]
    # two copies of each so n*ss - s*s is nonzero per dimension
    _write_embeds(sf, vecs + [[-x for x in v] for v in vecs])
    assert not check_query(spark, "embed_effective_rank", sf)
    from dsacord_spark.plans.catalog import specs

    row = specs()["embed_effective_rank"].fn(spark, sf).collect()[0]
    assert row.effective_rank == 4.0
    spark.catalog.clearCache()


def test_effective_rank_zero_variance_empty_and_null_elements(
    spark, tmp_path_factory
):
    """Identical vectors -> M == 0 -> trace guard drops the row on BOTH
    engines (empty result, not NaN). Null elements quantize to 0 like
    the redundancy entry; parity checked on a mixed-null fixture."""
    sf = str(tmp_path_factory.mktemp("zero"))
    _write_embeds(sf, [[1.0, 2.0, 3.0]] * 5)
    assert not check_query(spark, "embed_effective_rank", sf)
    from dsacord_spark.plans.catalog import specs

    assert specs()["embed_effective_rank"].fn(spark, sf).count() == 0
    spark.catalog.clearCache()

    sf2 = str(tmp_path_factory.mktemp("nulls"))
    _write_embeds(
        sf2,
        [[1.0, None, 2.0], [None, 1.5, -1.0], [0.25, 0.75, None], [1.0, 1.0, 1.0]],
    )
    assert not check_query(spark, "embed_effective_rank", sf2)


# --- corpus_novelty_curve ---------------------------------------------------


def test_novelty_identical_corpus_all_old_after_first(
    spark, tmp_path_factory
):
    """All docs identical: the lowest populated bucket owns the whole
    vocabulary (novelty 1.0), every later bucket re-sees it (novelty 0),
    and cum_vocab is flat at the one-doc shingle count — on both engines."""
    sf = str(tmp_path_factory.mktemp("ident"))
    _write_docs(sf, ["the very same document text here"] * 40)
    assert not check_query(spark, "corpus_novelty_curve", sf)

    from dsacord_spark.plans.reports import corpus_novelty_curve

    rows = sorted(
        corpus_novelty_curve(spark, sf).collect(), key=lambda r: r.bucket
    )
    assert rows[0].novelty_rate == 1.0
    assert rows[0].new_shingles == rows[0].shingles_seen
    for r in rows[1:]:
        assert r.new_shingles == 0 and r.novelty_rate == 0.0
        assert r.shingles_seen == rows[0].shingles_seen
        assert r.cum_vocab == rows[0].cum_vocab


def test_novelty_disjoint_vocab_rate_one_everywhere(
    spark, tmp_path_factory
):
    """Fully disjoint per-doc vocabularies: every bucket's shingles are
    first-seen there, so novelty_rate is exactly 1.0 in every bucket and
    the final cum_vocab equals the corpus-wide distinct shingle count."""
    sf = str(tmp_path_factory.mktemp("disj"))
    _write_docs(
        sf, [f"tok{i}a tok{i}b tok{i}c tok{i}d tok{i}e" for i in range(50)]
    )
    assert not check_query(spark, "corpus_novelty_curve", sf)

    from dsacord_spark.plans.reports import corpus_novelty_curve

    rows = corpus_novelty_curve(spark, sf).collect()
    assert all(r.novelty_rate == 1.0 for r in rows)
    assert max(r.cum_vocab for r in rows) == sum(r.new_shingles for r in rows)


def test_novelty_empty_texts_no_vocabulary(spark, tmp_path_factory):
    """All-empty texts contribute NO shingles on either engine (the
    empty-slice artifact is '' on Spark but NULL on DuckDB — the entry
    excludes tokenless docs from shingle generation entirely, so the
    divergence can't surface): the result is empty on both."""
    sf = str(tmp_path_factory.mktemp("empty"))
    _write_docs(sf, [""] * 25)
    assert not check_query(spark, "corpus_novelty_curve", sf)

    from dsacord_spark.plans.reports import corpus_novelty_curve

    assert corpus_novelty_curve(spark, sf).count() == 0


# --- corpus_manifest --------------------------------------------------------


def test_manifest_planted_duplicates_and_langs(spark, tmp_path_factory):
    """Planted exact duplicates and a controlled language mix: dup_rate
    and n_langs must be exact on both engines. Source 'dupy': 10 docs, 4
    copies of one text (7 distinct -> dup_rate 0.3), langs en/fr."""
    texts = (
        ["copy me"] * 4
        + [f"dupy own {i}" for i in range(6)]
        + [f"clean {i}" for i in range(10)]
    )
    sources = ["dupy"] * 10 + ["clean"] * 10
    langs = ["en", "fr"] * 5 + ["en"] * 10
    sf = str(tmp_path_factory.mktemp("mani"))
    _write_docs(sf, texts, sources, langs)
    assert not check_query(spark, "corpus_manifest", sf)

    from dsacord_spark.plans.reports import corpus_manifest

    by_src = {r.source: r for r in corpus_manifest(spark, sf).collect()}
    assert by_src["dupy"].distinct_texts == 7
    assert by_src["dupy"].dup_rate == 0.3
    assert by_src["dupy"].n_langs == 2
    assert by_src["clean"].dup_rate == 0.0
    assert by_src["clean"].n_langs == 1
    assert by_src["dupy"].doc_share == 0.5 == by_src["clean"].doc_share


def test_manifest_single_source_full_share(spark, tmp_path_factory):
    """One source owns the corpus: doc_share is exactly 1.0 and the
    token/char sums equal direct recounts."""
    texts = [f"alpha beta gamma {i}" for i in range(12)]
    sf = str(tmp_path_factory.mktemp("solo"))
    _write_docs(sf, texts, ["only"] * 12)
    assert not check_query(spark, "corpus_manifest", sf)

    from dsacord_spark.plans.reports import corpus_manifest

    (row,) = corpus_manifest(spark, sf).collect()
    assert row.doc_share == 1.0
    assert row.n_docs == 12 and row.distinct_texts == 12
    assert row.n_tokens == sum(len(t.split()) for t in texts)
    assert row.n_chars == sum(len(t) for t in texts)


# --- text_langid_eval ---------------------------------------------------------


def test_langid_eval_perfect_and_never_predicted(spark, tmp_path_factory):
    """A corpus the heuristic classifies perfectly (pure stopword texts,
    matching labels) scores precision=recall=f1=1.0 exactly; a label the
    heuristic never predicts ('xx' on numeric gibberish -> guess 'und')
    gets predicted=0, precision 0.0 (the div0 guard), recall 0.0 — on
    both engines."""
    texts = (
        ["the and of to is in"] * 5
        + ["der die das und ist nicht"] * 4
        + ["12345 67890 99999"] * 3
    )
    langs = ["en"] * 5 + ["de"] * 4 + ["xx"] * 3
    sf = str(tmp_path_factory.mktemp("lid"))
    _write_docs(sf, texts, None, langs)
    assert not check_query(spark, "text_langid_eval", sf)

    from dsacord_spark.plans.reports import text_langid_eval

    by = {r.lang: r for r in text_langid_eval(spark, sf).collect()}
    assert by["en"].precision == 1.0 == by["en"].recall == by["en"].f1
    assert by["de"].f1 == 1.0
    assert by["xx"].predicted == 0
    assert by["xx"].precision == 0.0 and by["xx"].recall == 0.0
    spark.catalog.clearCache()


def test_langid_eval_asymmetric_confusion(spark, tmp_path_factory):
    """Mislabeling in ONE direction: es-labeled docs written with French
    stopwords deflate fr precision but not es recall's denominator —
    the support/predicted split must stay per-side exact. es: support 4,
    predicted 0; fr: predicted includes the 4 impostors."""
    texts = (
        ["le la les et est dans"] * 6       # labeled fr, guessed fr
        + ["le la les et est pour"] * 4     # labeled es, guessed fr
    )
    langs = ["fr"] * 6 + ["es"] * 4
    sf = str(tmp_path_factory.mktemp("conf"))
    _write_docs(sf, texts, None, langs)
    assert not check_query(spark, "text_langid_eval", sf)

    from dsacord_spark.plans.reports import text_langid_eval

    by = {r.lang: r for r in text_langid_eval(spark, sf).collect()}
    assert by["fr"].support == 6 and by["fr"].predicted == 10
    assert by["fr"].precision == 0.6 and by["fr"].recall == 1.0
    assert by["es"].predicted == 0 and by["es"].recall == 0.0
    # f1 for fr: 2*6/(10+6) = 0.75 exactly
    assert by["fr"].f1 == 0.75
    spark.catalog.clearCache()


# --- corpus_curation_funnel ----------------------------------------------------


def test_curation_funnel_every_gate_bites(spark, tmp_path_factory):
    """A corpus where each gate removes known docs: 4 German (lang gate),
    2 high-punctuation English (quality gate: punct >= 0.2 and the
    length band both fail -> score 3 < 7), 3 copies of one good doc
    (dedup keeps the min doc_id). Exact counts at every stage on both
    engines; dedup runs on the SURVIVORS (the duplicate set that never
    reaches gate 3 must not consume a canonical slot)."""
    good = "the cat and the dog went to the market in the morning"
    texts = (
        [good] * 3                                     # dup cluster, all pass
        + ["the quick brown fox is in the old barn"] * 2  # unique good
        + ["der hund und die katze sind nicht hier"] * 4  # german
        # english (stopwords -> passes the lang gate) but too short AND
        # punct-heavy: score 0+0+3 = 3 < 7 -> quality gate removes it
        + ["the of !!!"] * 2
    )
    sf = str(tmp_path_factory.mktemp("funnel"))
    _write_docs(sf, texts)
    assert not check_query(spark, "corpus_curation_funnel", sf)

    from dsacord_spark.plans.reports import corpus_curation_funnel

    by = {r.stage: r for r in corpus_curation_funnel(spark, sf).collect()}
    assert by[0].n_docs == 11
    assert by[1].n_docs == 7          # 4 german out
    assert by[2].n_docs == 5          # 2 short+punct-heavy english out
    assert by[3].n_docs == 2          # dup clusters (3 and 2) -> 1 + 1
    assert by[3].pct_of_total == 0.181818
    spark.catalog.clearCache()


def test_curation_funnel_empty_and_all_filtered(spark, tmp_path_factory):
    """Empty corpus: all stages 0 with pct 0.0 (div0 guard) on both
    engines. All-filtered corpus (nothing passes the lang gate): later
    stages 0/0 -> pct_of_prev 0.0, never a crash."""
    sf = str(tmp_path_factory.mktemp("fempty"))
    _write_docs(sf, [])
    assert not check_query(spark, "corpus_curation_funnel", sf)

    from dsacord_spark.plans.reports import corpus_curation_funnel

    rows = {r.stage: r for r in corpus_curation_funnel(spark, sf).collect()}
    assert rows[0].n_docs == 0 and rows[0].pct_of_total == 0.0
    assert rows[3].pct_of_prev == 0.0

    sf2 = str(tmp_path_factory.mktemp("fnolang"))
    _write_docs(sf2, ["der hund ist nicht hier und das ist gut"] * 6)
    assert not check_query(spark, "corpus_curation_funnel", sf2)
    rows2 = {r.stage: r for r in corpus_curation_funnel(spark, sf2).collect()}
    assert rows2[0].n_docs == 6 and rows2[1].n_docs == 0
    assert rows2[1].pct_of_prev == 0.0 and rows2[2].pct_of_prev == 0.0
    spark.catalog.clearCache()


# --- embed_cosine_band_histogram ------------------------------------------------


def test_cosine_bands_identical_and_antiparallel(spark, tmp_path_factory):
    """Identical vectors land in the TOP band (cos==1 floors to k and is
    clamped to k-1; tiny sqrt round-off floors to k-1 directly — both
    engines agree bit-for-bit either way); anti-parallel pairs land in
    the BOTTOM band (-k). Zero vectors are dropped by both engines."""
    vecs = (
        [[1.0, 2.0, 3.0, 4.0]] * 3      # identical triple -> 3 pairs at top
        + [[-1.0, -2.0, -3.0, -4.0]]    # anti-parallel to the triple
        + [[0.0, 0.0, 0.0, 0.0]] * 2    # zero: dropped
    )
    sf = str(tmp_path_factory.mktemp("cosb"))
    _write_embeds(sf, vecs)
    assert not check_query(spark, "embed_cosine_band_histogram", sf)

    from dsacord_spark.plans.reports import embed_cosine_band_histogram

    by = {r.band: r for r in embed_cosine_band_histogram(spark, sf).collect()}
    assert by[19].n_pairs == 3          # the identical triple
    assert by[-20].n_pairs == 3         # each of the triple vs the negation
    assert sum(r.n_pairs for r in by.values()) == 6  # C(4,2), zeros gone
    assert max(by) == 19 and min(by) == -20
    assert by[19].cum_share == 1.0
    spark.catalog.clearCache()


def test_cosine_bands_sample_cap_binds(spark, tmp_path_factory):
    """More vectors than the 400-sample cap: pair count is exactly
    C(400, 2) on both engines (the md5-ordered sample is shared), never
    corpus^2."""
    import math

    vecs = [
        [math.sin(i * 0.7), math.cos(i * 1.3), (i % 17) / 8.0, 1.0]
        for i in range(450)
    ]
    sf = str(tmp_path_factory.mktemp("coscap"))
    _write_embeds(sf, vecs)
    assert not check_query(spark, "embed_cosine_band_histogram", sf)

    from dsacord_spark.plans.reports import embed_cosine_band_histogram

    rows = embed_cosine_band_histogram(spark, sf).collect()
    assert sum(r.n_pairs for r in rows) == 400 * 399 // 2
    spark.catalog.clearCache()


# --- orders_forecast_eval / events_type_diversity -------------------------------


def test_forecast_eval_perfect_weekly_seasonality(spark, tmp_path_factory):
    """Revenue that repeats exactly every 7 days makes the seasonal-naive
    baseline perfect: abs error 0, WAPE exactly 0.0, on both engines.
    And a corpus shorter than 8 days has no (d, d-7) pairs: empty."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    def write_orders(sf, day_revenues):
        base = dt.date(2024, 3, 4)  # a Monday
        rows = [
            (i + 1, base + dt.timedelta(days=d), rev)
            for i, (d, rev) in enumerate(day_revenues)
        ]
        tbl = pa.table(
            {
                "o_orderkey": pa.array([r[0] for r in rows], pa.int64()),
                "o_orderdate": pa.array([r[1] for r in rows], pa.date32()),
                "o_totalprice": pa.array(
                    [r[2] for r in rows], pa.decimal128(18, 2)
                ),
            }
        )
        pq.write_table(tbl, f"{sf}/orders.parquet")

    from decimal import Decimal

    sf = str(tmp_path_factory.mktemp("seas"))
    # 21 days, revenue keyed only by weekday -> f(d) = r(d-7) exactly
    write_orders(
        sf,
        [(d, Decimal(100 + 10 * (d % 7))) for d in range(21)],
    )
    assert not check_query(spark, "orders_forecast_eval", sf)

    from dsacord_spark.plans.reports import orders_forecast_eval

    rows = orders_forecast_eval(spark, sf).collect()
    assert len(rows) == 7
    assert all(r.wape == 0.0 and r.mae_total == 0.0 for r in rows)

    sf2 = str(tmp_path_factory.mktemp("short"))
    write_orders(sf2, [(d, Decimal(50)) for d in range(6)])
    assert not check_query(spark, "orders_forecast_eval", sf2)
    assert orders_forecast_eval(spark, sf2).count() == 0

    # non-degenerate: pin the ISO-dow mapping AND the rounding path
    # (the all-zero seasonality fixture above can't catch a permuted
    # dow or a broken WAPE formula — review finding). 14 days starting
    # Monday 2024-03-04; only the second Monday deviates (150 vs 100):
    # dow=1 gets wape = 50/150 = 0.333333 (half-up of 1/3), mae 50.0;
    # every other weekday pairs exactly once at zero error.
    sf3 = str(tmp_path_factory.mktemp("asym"))
    write_orders(
        sf3,
        [(d, Decimal(150) if d == 7 else Decimal(100)) for d in range(14)],
    )
    assert not check_query(spark, "orders_forecast_eval", sf3)
    by = {r.dow: r for r in orders_forecast_eval(spark, sf3).collect()}
    assert by[1].wape == 0.333333 and by[1].mae_total == 50.0
    assert all(by[d].wape == 0.0 and by[d].n_days == 1 for d in range(2, 8))

    # zero-revenue weekday: Spark ANSI div would crash without the
    # guard; both engines must report wape 0.0 (review finding)
    sf4 = str(tmp_path_factory.mktemp("zero"))
    write_orders(
        sf4,
        [(d, Decimal(0) if d % 7 == 2 else Decimal(80)) for d in range(14)],
    )
    assert not check_query(spark, "orders_forecast_eval", sf4)
    by4 = {r.dow: r for r in orders_forecast_eval(spark, sf4).collect()}
    assert by4[3].wape == 0.0  # Wednesday (dow 3) had zero revenue


def test_type_diversity_exact_scores_and_min_support(spark, tmp_path_factory):
    """Uniform 4-type behavior scores exactly 0.75 = (k-1)/k; a
    single-type account scores exactly 0.0; a user below the 20-event
    floor is excluded — on both engines."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    base = dt.datetime(2024, 3, 1)
    rows = []  # (user, type)
    rows += [(1, f"t{i % 4}") for i in range(20)]   # uniform over 4 types
    rows += [(2, "only")] * 25                      # single type
    rows += [(3, f"t{i}") for i in range(5)]        # below min support
    tbl = pa.table(
        {
            "event_id": pa.array(range(len(rows)), pa.int64()),
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "event_type": pa.array([r[1] for r in rows], pa.string()),
            "ts": pa.array(
                [base + dt.timedelta(seconds=i) for i in range(len(rows))],
                pa.timestamp("us"),
            ),
        }
    )
    sf = str(tmp_path_factory.mktemp("div"))
    pq.write_table(tbl, f"{sf}/events.parquet")
    assert not check_query(spark, "events_type_diversity", sf)

    from dsacord_spark.plans.reports import events_type_diversity

    by = {r.user_id: r for r in events_type_diversity(spark, sf).collect()}
    assert by[1].diversity == 0.75 and by[1].n_types == 4
    assert by[2].diversity == 0.0 and by[2].n_types == 1
    assert 3 not in by
