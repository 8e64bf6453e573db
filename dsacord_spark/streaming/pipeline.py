"""Structured Streaming wiring (SURVEY §2.10): landing dir -> typed
transform -> idempotent sink.

The reference is a batch backfill tool whose shape is micro-batch: an
unbounded sequence of daily dumps with late/duplicate data handled by
upsert (README.md:27-28). Mapping:

- source:     file-source `readStream` on the landing directory
              (CSV fast path; the ZIP path stages through the extraction
              step first), `maxFilesPerTrigger` bounds a backfill batch;
- trigger:    `availableNow` == the reference's one-shot date-range run;
              a processing-time trigger == tailing fresh dumps;
- exactly-once: checkpointing + per-epoch keep-latest dedup + idempotent
              upsert keyed on uuid (utils.go:91,100-104);
- late data:  watermark on created_at for the windowed aggregates; the
              upsert sink makes late re-dumps idempotent regardless.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming import StreamingQuery

from dsacord_spark.schema import CSV_SCHEMA
from dsacord_spark.sinks.jdbc import dedup_batch
from dsacord_spark.transform import decisions_transform, split_quarantine


def read_wire_stream(
    spark: SparkSession, landing_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    reader = (
        spark.readStream.schema(CSV_SCHEMA)
        .option("header", True)
        .option("multiLine", True)
        .option("escape", '"')
        .option("mode", "PERMISSIVE")
        .option("recursiveFileLookup", "true")
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.csv(landing_dir)


def start_decisions_stream(
    spark: SparkSession,
    landing_dir: str,
    checkpoint_dir: str,
    sink: Callable[[DataFrame, int], None],
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
) -> StreamingQuery:
    """Stream wire CSVs through the typed transform into `sink` via
    foreachBatch. The sink receives the epoch's VALID rows already
    deduped on uuid (epoch-level exactly-once under checkpoint replay
    when the sink itself is idempotent, e.g. always-upsert)."""
    wire = read_wire_stream(spark, landing_dir, max_files_per_trigger)

    def run_epoch(batch_df: DataFrame, epoch_id: int) -> None:
        typed = decisions_transform(batch_df)
        valid, _quarantine = split_quarantine(typed)
        sink(dedup_batch(valid), epoch_id)

    writer = (
        wire.writeStream.foreachBatch(run_epoch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def streaming_event_counts(
    events_stream: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Windowed streaming aggregate with late-data watermark — the
    streaming twin of the batch `window_tumbling_hour` catalog query."""
    return (
        events_stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
        )
    )
