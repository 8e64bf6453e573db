"""Differential test: every catalog entry vs its DuckDB oracle at sf0.001
(the driver runs the same shape of check at sf0.01)."""

from __future__ import annotations

import pytest

from dsacord_spark.plans.catalog import specs
from tests.oracle_harness import check_query


def _names():
    return sorted(specs().keys())


@pytest.mark.parametrize("name", _names())
def test_catalog_query_matches_oracle(spark, sf_dir, name):
    problems = check_query(spark, name, sf_dir)
    assert not problems, f"{name}: " + "; ".join(problems)


def _group_of(name, hist, sql):
    """Mirror catalog._ordered's group assignment for property checks
    (the green predicate itself is IMPORTED, not duplicated, so these
    tests can never classify under a different rule than production)."""
    from dsacord_spark.plans.catalog import _is_green

    rec = hist.get(name)
    has_sql = name in sql
    if rec is not None:
        if _is_green(rec, has_sql):
            return 3
        if not has_sql or rec.get("err") != "no_oracle":
            return 0
        # rows-only history on a since-upgraded oracle entry: falls
        # through to the never-checked groups (first value check beats
        # green canaries)
    return 1 if has_sql else 2


def test_driver_window_rotation_invariants():
    """History-invariant properties of the driver-window rotation: the
    emission order must be (fails, unchecked-oracle, unchecked-rows-only,
    greens) for WHATEVER CORRECTNESS_r*.json files are present, so this
    test stays green every time the driver lands a new round file."""
    from dsacord_spark.plans.catalog import _driver_history, oracle_sql, queries

    names = list(queries().keys())
    assert len(names) == len(set(names))
    hist = _driver_history()
    sql = oracle_sql()
    groups = [_group_of(n, hist, sql) for n in names]
    assert groups == sorted(groups), "rotation group order is not monotone"
    # the 50-window must never waste a slot on a green entry while any
    # unchecked/failed entry exists outside it
    window, tail = set(names[:50]), names[50:]
    wasted = [n for n in names[:50] if _group_of(n, hist, sql) == 3]
    starved = [n for n in tail if _group_of(n, hist, sql) < 3]
    assert not (wasted and starved), (wasted[:3], starved[:3])
    assert window  # the driver always has 50 entries to check


def test_driver_window_rotation_synthetic(monkeypatch):
    """Concrete ordering under a fabricated history: one fail, one green,
    everything else unchecked — the fail must lead, the green must trail,
    and adding a NEWER round file that greens the fail rotates it back."""
    import dsacord_spark.plans.catalog as cat

    reg_names = list(cat.get_registry().keys())
    sqls = {n for n, s in cat.get_registry().items() if s.sql is not None}
    fail_name = next(n for n in reg_names if n in sqls)
    green_name = next(n for n in reg_names if n in sqls and n != fail_name)
    ok = {"rows_match": True, "schema_match": True, "hash_match": True, "err": None}
    bad = {"rows_match": True, "schema_match": True, "hash_match": False, "err": None}

    def fake_hist():
        return {fail_name: {**bad, "_round": "CORRECTNESS_r98.json"},
                green_name: {**ok, "_round": "CORRECTNESS_r98.json"}}

    monkeypatch.setattr(cat, "_driver_history", fake_hist)
    names = list(cat.queries().keys())
    assert names[0] == fail_name
    assert names[-1] == green_name

    def fake_hist2():
        return {fail_name: {**ok, "_round": "CORRECTNESS_r99.json"},
                green_name: {**ok, "_round": "CORRECTNESS_r98.json"}}

    monkeypatch.setattr(cat, "_driver_history", fake_hist2)
    names2 = list(cat.queries().keys())
    # both now green: oldest-round green rotates back in before the newer one
    assert names2.index(green_name) < names2.index(fail_name)
    assert names2[0] not in (fail_name, green_name)


def test_driver_window_rows_only_classification(monkeypatch):
    """A recorded err='no_oracle' WITH a row count is the driver's clean
    rows-only verdict — the entry must rotate like a green, not lead the
    window forever as a pseudo-failure. A no_oracle rec with spark_rows
    null means the harness crashed before counting — that one must lead."""
    import dsacord_spark.plans.catalog as cat

    reg_names = list(cat.get_registry().keys())
    # since r9 every registered entry carries an oracle (sql is never
    # None), so SYNTHESIZE two rows-only specs to keep the rotation's
    # no_oracle classification paths pinned (the driver still records
    # err='no_oracle' for any future oracle-less entry)
    import dataclasses

    from dsacord_spark.plans import registry as reg_mod

    reg = reg_mod._REGISTRY  # get_registry() hands out copies
    clean, crashed = reg_names[0], reg_names[1]
    for n in (clean, crashed):
        monkeypatch.setitem(reg, n, dataclasses.replace(reg[n], sql=None))
    base = {"rows_match": None, "schema_match": None, "hash_match": None}

    def fake_hist():
        return {
            clean: {**base, "err": "no_oracle", "spark_rows": 25,
                    "_round": "CORRECTNESS_r98.json"},
            crashed: {**base, "err": "no_oracle", "spark_rows": None,
                      "_round": "CORRECTNESS_r98.json"},
        }

    monkeypatch.setattr(cat, "_driver_history", fake_hist)
    names = list(cat.queries().keys())
    assert names[0] == crashed
    # the clean rows-only entry trails every never-checked entry
    assert names.index(clean) > len(reg_names) - 3

    # an entry whose history says rows-only but that HAS an oracle now
    # (upgraded since the check) must rotate as never-value-checked
    # (group 1), ahead of greens but not as a failure
    oracled = next(n for n, s in cat.get_registry().items() if s.sql is not None)

    def fake_hist2():
        return {
            oracled: {**base, "err": "no_oracle", "spark_rows": 10,
                      "_round": "CORRECTNESS_r98.json"},
            clean: {**base, "err": "no_oracle", "spark_rows": 25,
                    "_round": "CORRECTNESS_r98.json"},
        }

    monkeypatch.setattr(cat, "_driver_history", fake_hist2)
    names2 = list(cat.queries().keys())
    assert names2.index(oracled) < names2.index(clean)
    assert names2[0] != oracled  # not classified as a failure


def test_driver_window_all_green_picks_oldest(monkeypatch):
    """Post-coverage rotation: once EVERY entry is green, the 50-window
    becomes pure regression canaries and must hold the OLDEST-checked
    greens first — an entry last verified three rounds ago rotates back
    in before one verified last round. Fabricated history: all entries
    green, split across three past rounds round-robin."""
    import dsacord_spark.plans.catalog as cat

    reg_names = list(cat.get_registry().keys())
    ok = {
        "rows_match": True,
        "schema_match": True,
        "hash_match": True,
        "err": None,
    }
    rounds = (
        "CORRECTNESS_r97.json",
        "CORRECTNESS_r98.json",
        "CORRECTNESS_r99.json",
    )

    def fake_hist():
        return {
            n: {**ok, "_round": rounds[i % 3]}
            for i, n in enumerate(reg_names)
        }

    monkeypatch.setattr(cat, "_driver_history", fake_hist)
    names = list(cat.queries().keys())
    oldest = [n for i, n in enumerate(reg_names) if i % 3 == 0]
    # oldest-round greens lead, in registration order within the round
    assert names[: len(oldest)] == oldest
    # the 50-window is filled entirely from the oldest round (62 >= 50)
    hist = fake_hist()
    assert all(hist[n]["_round"] == rounds[0] for n in names[:50])


def test_approx_distinct_error_bound(spark, sf_dir):
    """agg_approx_distinct's raw HLL estimate left the entry output in r8
    (the entry now carries a structural value oracle: exact count +
    within-bound boolean) — this gate pins the RAW estimate directly:
    within 5% relative error of exact in every group, and deterministic
    across two evaluations (fixed seeds, fixed data)."""
    from pyspark.sql import functions as F

    from dsacord_spark.plans.catalog import queries

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    est = o.groupBy("o_orderstatus").agg(
        F.approx_count_distinct("o_custkey", 0.01).alias("approx"),
        F.count_distinct("o_custkey").alias("exact"),
    )
    rows = est.collect()
    assert rows
    for r in rows:
        err = abs(r["approx"] - r["exact"]) / r["exact"]
        assert err <= 0.05, (r["o_orderstatus"], r["approx"], r["exact"])
    assert sorted(map(tuple, rows)) == sorted(map(tuple, est.collect()))
    # and the catalog entry's contract boolean agrees
    for r in queries()["agg_approx_distinct"](spark, sf_dir).collect():
        assert r["est_within_5pct"], r


def test_approx_percentile_rank_error_bound(spark, sf_dir):
    """approx_percentile at accuracy=10000 must land within 1% RELATIVE
    value error of the exact percentile on every group (the sketch's
    guarantee is rank error 1/accuracy; on this data distribution that
    maps well inside 1% of value). The raw sketch values left the entry
    output in r8 (structural oracle: exact percentiles + rank-band
    booleans), so compute them directly here."""
    from pyspark.sql import functions as F

    from dsacord_spark.plans.catalog import specs

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    rows = o.groupBy("o_orderstatus").agg(
        F.approx_percentile("o_totalprice", F.lit(0.5), F.lit(10000)).alias("am"),
        F.approx_percentile("o_totalprice", F.lit(0.9), F.lit(10000)).alias("a9"),
        F.percentile("o_totalprice", F.lit(0.5)).alias("em"),
        F.percentile("o_totalprice", F.lit(0.9)).alias("e9"),
    ).collect()
    assert rows
    for r in rows:
        for approx, exact in ((r["am"], r["em"]), (r["a9"], r["e9"])):
            assert abs(approx - exact) / abs(exact) < 0.01, r
    # and the catalog entry's rank-band contract booleans hold
    for r in specs()["agg_approx_percentiles"].fn(spark, sf_dir).collect():
        assert r["median_in_band"] and r["p90_in_band"], r
