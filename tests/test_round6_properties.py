"""Round-6 pinning tests: the ADVICE.md dyadic-tie fixes (removal_rate /
load_factor rendered with the shared integer half-up formula) and the
duplicate-safe banded joiner's catalog-visible behavior."""

from __future__ import annotations

from tests.oracle_harness import check_query
from tests.test_round5_properties import _write_docs


def test_dedup_savings_removal_rate_dyadic_tie_half_up(
    spark, tmp_path_factory
):
    """ADVICE r5 #1: a power-of-two per-source doc count with one
    removed doc puts removal_rate on an exact dyadic tie (1/128 * 1e6 =
    7812.5) where Spark round() (HALF_UP) and DuckDB round() on doubles
    (half-even) disagree at 6dp. The integer-div rendering must agree
    across engines AND be the half-UP value 0.007813."""
    sf = str(tmp_path_factory.mktemp("tie"))
    # source "x": 127 unique docs + 1 duplicate -> n_docs=128, removed=1
    texts = [f"x doc {i}" for i in range(127)] + ["x doc 0"]
    sources = ["x"] * 128
    _write_docs(sf, texts, sources)
    assert not check_query(spark, "corpus_dedup_savings_by_source", sf)
    from dsacord_spark.plans.catalog import queries

    row = queries()["corpus_dedup_savings_by_source"](spark, sf).collect()[0]
    assert row.n_docs == 128 and row.n_removed == 1
    assert row.removal_rate == 0.007813  # half-up, not half-even .007812


def test_shard_plan_load_factor_power_of_two_corpus(
    spark, tmp_path_factory
):
    """ADVICE r5 #2: corpus_shard_plan.load_factor on a power-of-two
    total doc count (the tie-prone denominator) must value-match the
    oracle with the integer half-up rendering on both sides."""
    sf = str(tmp_path_factory.mktemp("pow2"))
    _write_docs(
        sf,
        [f"doc number {i} padding words" for i in range(256)],
        ["s"] * 256,
    )
    assert not check_query(spark, "corpus_shard_plan", sf)
