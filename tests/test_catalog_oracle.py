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
    """The driver checks the FIRST 50 queries() entries only. Pin the
    round-2 window: the 13 fixed hash-fails lead (proving the fix gets
    driver signal), every windowed entry is oracle-eligible (no rows-only
    slot wasted), and no duplicates."""
    from dsacord_spark.plans.catalog import _DRIVER_PRIORITY, oracle_sql, queries

    names = list(queries().keys())
    assert len(_DRIVER_PRIORITY) == 50
    assert len(set(_DRIVER_PRIORITY)) == 50
    assert names[:50] == _DRIVER_PRIORITY
    sql = oracle_sql()
    assert all(n in sql for n in _DRIVER_PRIORITY)
    assert names[:13] == [
        "pricing_summary", "join_equi_agg", "agg_cube", "window_running_sum",
        "window_tumbling_hour", "session_windows", "json_props_agg",
        "pivot_status", "json_map_explode", "unpivot_measures",
        "join_skew_salted", "profile_lineitem", "skew_report_orders",
    ]
    # total catalog unchanged by the reordering
    assert len(names) == len(set(names))


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
