"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  -> flagship query on /root/testdata/sf0.001 (smoke, rows>0)
queries()     -> named operator catalog from SURVEY.md §2 (+ layer-B
                 analysis operators), each (spark, sf_dir) -> DataFrame
oracle_sql()  -> matching ANSI SQL per query for the DuckDB oracle

The catalog itself lives in dsacord_spark/plans/ — this module only
re-exports it.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from dsacord_spark.plans import catalog as _catalog


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: decimal-exact pricing summary over sf0.001 lineitem."""
    return _catalog.specs()["pricing_summary"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _catalog.queries()


def oracle_sql() -> dict[str, str]:
    return _catalog.oracle_sql()
