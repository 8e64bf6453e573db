"""Aggregated catalog: importing the query-group modules populates the
registry; `queries()` / `oracle_sql()` are re-exported by __spark_entry__.py
for the driver."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

import dsacord_spark.plans.relational  # noqa: F401  (registers layer A)
import dsacord_spark.plans.analysis  # noqa: F401  (registers layer B)
import dsacord_spark.plans.advanced  # noqa: F401  (registers advanced ops)
import dsacord_spark.plans.extended  # noqa: F401  (registers extended ops)
import dsacord_spark.plans.composite  # noqa: F401  (registers composite ops)
import dsacord_spark.plans.curation  # noqa: F401  (registers curation ops)
import dsacord_spark.plans.udx  # noqa: F401  (registers UDTF/UDAF surface)
from dsacord_spark.plans.registry import QuerySpec, get_registry


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in get_registry().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.sql for name, spec in get_registry().items() if spec.sql is not None
    }


def specs() -> dict[str, QuerySpec]:
    return get_registry()
