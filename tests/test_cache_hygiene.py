"""Sweep-level cache hygiene (VERDICT r2 item 4 / ADVICE r2 item 4).

Several catalog entries persist() intermediate frames their returned
lazy plan consumes (gap-fill hourly agg, MAD per-type frames, simhash
signatures, CMS exact side). That is correct within one query — the
alternative is re-scanning the raw table per consumer — but a long-lived
driver session sweeping 145 queries must not accumulate those pinned
blocks. bench.py releases them with spark.catalog.clearCache() at family
boundaries AND once after the loop; this test pins the contract: after a
mini-sweep of the known-persisting entries plus the bench-style cleanup,
ZERO persistent RDDs remain in the session.
"""

from __future__ import annotations

from dsacord_spark.plans.catalog import queries

# the entries the round-2 ADVICE named as persisting without unpersist
_PERSISTING_ENTRIES = [
    "events_hourly_gapfill",   # plans/extended.py hourly agg
    "events_anomaly_mad",      # plans/quality.py med + st frames
    "text_heavy_hitters_cms",  # plans/quality.py exact side
    "events_user_similarity_topk",  # plans/quality.py profile vectors
]


def _n_persistent(spark) -> int:
    return spark.sparkContext._jsc.getPersistentRDDs().size()


def test_sweep_leaves_no_pinned_rdds(spark, sf_dir):
    # BASELINE-relative (r7): localCheckpoint RDDs from other tests in
    # the shared session linger in getPersistentRDDs and clearCache
    # does not touch them — the contract here is "this sweep adds no
    # pinned blocks", not "the whole session is empty"
    base = _n_persistent(spark)
    q = queries()
    ran = 0
    for name in _PERSISTING_ENTRIES:
        if name in q:
            q[name](spark, sf_dir).count()
            ran += 1
    assert ran, "persisting entries vanished from the catalog"
    # at least one of them must actually have pinned blocks (otherwise
    # this test is asserting a vacuous cleanup)
    assert _n_persistent(spark) > base
    # bench.py's loop-end cleanup
    spark.catalog.clearCache()
    assert _n_persistent(spark) <= base


def test_bench_has_loop_end_cleanup():
    """The sweep-end clearCache must stay in bench.py's query loop."""
    from pathlib import Path

    src = (Path(__file__).resolve().parents[1] / "bench.py").read_text()
    assert src.count("spark.catalog.clearCache()") >= 2  # family + loop-end


def test_run_query_releases_persisted_blocks(spark, sf_dir):
    """catalog.run_query is the supported external single-entry API: it
    must return rows AND leave zero persistent RDDs even for entries
    that persist intermediates their plan consumes (dedup_simhash pins
    the signature frame across its self-join)."""
    from dsacord_spark.plans.catalog import run_query

    base = _n_persistent(spark)  # baseline-relative: see first test
    rows = run_query(spark, "dedup_simhash", sf_dir)
    assert isinstance(rows, list)
    assert _n_persistent(spark) <= base


def test_run_query_warns_on_preexisting_caches(spark, sf_dir):
    """ADVICE r6: run_query's session-wide clearCache silently evicted
    caller caches — it must now WARN when pre-existing persisted frames
    are about to be dropped, and stay silent on a clean session."""
    import warnings

    from pyspark.sql import functions as F

    from dsacord_spark.plans.catalog import run_query

    # TWO caller caches: `mine` deliberately gets NO action (the
    # unmaterialized persist is the silent-eviction case — the
    # CacheManager knows it at .persist() time while
    # getPersistentRDDs() would not, r7 review), while `mine2` IS
    # materialized so the post-run check genuinely proves run_query
    # evicted real caller-owned blocks (second r7 review pass: with
    # only the unmaterialized frame the eviction assert was vacuous)
    base = _n_persistent(spark)  # baseline-relative: see first test
    mine = spark.range(10).select(F.col("id")).persist()
    mine2 = spark.range(20).select(F.col("id")).persist()
    mine2.count()
    assert _n_persistent(spark) > base  # mine2's blocks are pinned
    try:
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            run_query(spark, "sort_topk", sf_dir)
        assert any(
            "pre-existing cached" in str(x.message) for x in w
        ), [str(x.message) for x in w]
        assert _n_persistent(spark) <= base  # caller caches evicted
        with warnings.catch_warnings(record=True) as w2:
            warnings.simplefilter("always")
            run_query(spark, "sort_topk", sf_dir)
        assert not any(
            "pre-existing cached" in str(x.message) for x in w2
        )
    finally:
        mine.unpersist()
        mine2.unpersist()
