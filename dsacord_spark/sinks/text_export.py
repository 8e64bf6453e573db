"""Sharded text-format exports (JSONL / CSV) for the curated corpus.

Training pipelines consume curated data as sharded JSONL at least as
often as parquet (tokenizer feeds, eval harnesses, cross-org handoff).
These writers are thin, deliberate wrappers over Spark's native json/csv
sinks — the JVM writes every byte (no Python in the path) — with the two
knobs that matter at scale made explicit:

- shard sizing via `maxRecordsPerFile` (a million-file export and a
  single 2 TB shard are both failure modes; bound records per file and
  let the partition count set the parallelism);
- layout via `partition_cols` (hive-style dirs so downstream consumers
  prune shards the same way the parquet lake does).

Reference parity note: the reference exports nothing (Postgres only,
main.go:194-204); this is layer-B surface for the training-data
pipeline north star.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def export_jsonl(
    df: DataFrame,
    path: str,
    partition_cols: list[str] | None = None,
    max_records_per_file: int = 100_000,
    compression: str | None = None,
) -> None:
    """Write df as sharded JSON-lines under path (one object per line,
    UTF-8, ISO-8601 timestamps — Spark's native json sink)."""
    w = df.write.mode("overwrite").option(
        "maxRecordsPerFile", str(max_records_per_file)
    )
    if compression:
        w = w.option("compression", compression)
    if partition_cols:
        w = w.partitionBy(*partition_cols)
    w.json(path)


def read_jsonl(spark, path: str, schema=None) -> DataFrame:
    """Read a JSONL export back. Pass the writing frame's schema to skip
    inference (an extra full scan) and to pin types — inference widens
    e.g. int32 to long and reads timestamps only with a matching format."""
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    return r.json(path)


def export_csv(
    df: DataFrame,
    path: str,
    partition_cols: list[str] | None = None,
    max_records_per_file: int = 100_000,
    header: bool = True,
) -> None:
    """Write df as sharded CSV (RFC-4180 quoting, header per shard) —
    the interchange format the reference's own source data arrives in."""
    w = (
        df.write.mode("overwrite")
        .option("maxRecordsPerFile", str(max_records_per_file))
        .option("header", str(header).lower())
        .option("escape", '"')
    )
    if partition_cols:
        w = w.partitionBy(*partition_cols)
    w.csv(path)
