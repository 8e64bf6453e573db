"""S1 — date-range URL generation (/root/reference/main.go:146-154).

One row per day in [date_from, date_to] with the daily dump URL. Pure
DataFrame (sequence + explode): the driver never loops; partitioning the
tiny URL table to `workers` partitions is what the reference's worker
pool becomes in Spark (SURVEY §2.12 O1).
"""

from __future__ import annotations

from datetime import date

from pyspark.sql import DataFrame, SparkSession, functions as F

from dsacord_spark.functions.parsing import url_for_day


def url_table(
    spark: SparkSession, date_from: date, date_to: date, workers: int = 1
) -> DataFrame:
    days = spark.sql(
        "SELECT explode(sequence(to_date(:f), to_date(:t), interval 1 day)) AS day",
        args={"f": date_from.isoformat(), "t": date_to.isoformat()},
    )
    df = days.select(
        F.col("day"),
        F.date_format("day", "yyyy-MM-dd").alias("dt"),
        url_for_day(F.col("day")).alias("url"),
    )
    return df.repartition(max(workers, 1))
