"""K5 — parquet sink (absent in the reference; used by the oracle tests
and as the lake-format landing of the typed `decisions` table).

Partitioned by dump date (`dt`) so downstream scans prune by day — the
Spark formulation of the reference's one-day-one-unit layout
(SURVEY §4.3). At 100 TB, day-partitioned parquet with ~128 MB files is
the layout every query in the catalog assumes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def write_decisions_parquet(
    df: DataFrame,
    path: str,
    partition_by_date: bool = True,
    mode: str = "append",
) -> None:
    writer = df.write.mode(mode)
    if partition_by_date and "created_at" in df.columns:
        df = df.withColumn(
            "dt", F.coalesce(F.date_format("created_at", "yyyy-MM-dd"), F.lit("unknown"))
        )
        # Cluster rows by dt before the dynamic-partition write: without
        # this every task holding every day emits tasks x days small files
        # (the classic small-files problem); with it each day is one file
        # per shuffle partition that owns it, and AQE coalesces the rest.
        # A single very large day would serialize into one writer task —
        # at that point drop the repartition and let maxRecordsPerFile
        # split it instead.
        df = df.repartition("dt")
        writer = df.write.mode(mode).partitionBy("dt")
    writer.parquet(path)
