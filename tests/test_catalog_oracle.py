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
