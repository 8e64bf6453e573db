"""End-to-end batch pipeline — the Spark formulation of the reference's
whole program (/root/reference/main.go:58-171, SURVEY §3.1):

config -> validate -> URL table (S1) -> stage ZIPs with backoff (S2) ->
extract nested ZIPs/CSVs (S3-S5) -> typed transform (P1/F1-F5) ->
quarantine split (Q5) -> dedup -> sink (K1-K4) -> run metrics (O5).

The reference's channel/goroutine topology disappears: Spark schedules
the staged-file partitions; per-day error isolation (O3) lives in the
stager's returned error list; metrics come from df.observe instead of a
racy atomic counter (Q2 divergence).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, functions as F

from dsacord_spark.config import Config
from dsacord_spark.sinks.jdbc import dedup_batch
from dsacord_spark.sinks.parquet import write_decisions_parquet
from dsacord_spark.sources.stager import stage_range
from dsacord_spark.sources.urlgen import url_table
from dsacord_spark.sources.zipsource import read_staged_zips
from dsacord_spark.transform import decisions_transform, split_quarantine, with_dq_metrics


@dataclass
class RunMetrics:
    """O5 (main.go:156-165): rows, elapsed, quarantined; exact, not
    over-counted (Q2)."""

    rows_written: int = 0
    rows_quarantined: int = 0
    elapsed_s: float = 0.0
    day_errors: list[str] = field(default_factory=list)


def run_backfill(
    spark: SparkSession,
    cfg: Config,
    sink=None,
    opener=None,
) -> RunMetrics:
    """One-shot date-range run (== `./dsacord --from --to ...`).

    `sink(valid_df) -> int` writes the deduped valid rows and returns the
    written count; defaults to the date-partitioned parquet sink under
    cfg.landing_dir + '/decisions'. `opener` injects the HTTP transport
    (tests use fakes; production uses urllib)."""
    t0 = time.monotonic()
    warnings = cfg.validate()
    for w in warnings:
        print(f"warning: {w}")

    urls = [
        (r["dt"], r["url"])
        for r in url_table(spark, cfg.date_from, cfg.date_to, cfg.workers).collect()
    ]
    staged = stage_range(
        urls,
        cfg.landing_dir,
        workers=cfg.workers,
        **({"opener": opener} if opener else {}),
    )
    metrics = RunMetrics(day_errors=[e for _, e in staged if e])

    if not any(p for p, _ in staged):
        metrics.elapsed_s = time.monotonic() - t0
        return metrics

    wire = read_staged_zips(spark, cfg.landing_dir)
    typed, dq = with_dq_metrics(decisions_transform(wire))
    valid, quarantined = split_quarantine(typed)
    deduped = dedup_batch(valid)
    # second observation, on the post-dedup frame: the sink's own action
    # populates it, so rows_written is exact (Q2/O5) with ZERO extra
    # passes — no pre-write count (the r7 double-compute defect) and no
    # post-write read-back (which crashes on an all-quarantined empty
    # write and over-counts stale days under dynamic partition
    # overwrite — r8 review findings)
    from pyspark.sql import Observation

    written_obs = Observation("written")
    deduped = deduped.observe(written_obs, F.count(F.lit(1)).alias("n"))

    if sink is None:
        out = cfg.landing_dir.rstrip("/") + "/decisions"

        def sink(df: DataFrame) -> int:
            write_decisions_parquet(df, out, mode="overwrite")
            try:
                return int(written_obs.get["n"])
            except Exception:
                # AQE's empty-relation propagation replaces the subtree
                # (including the CollectMetrics node) when an upstream
                # stage materializes zero rows, so the metrics row never
                # arrives and .get raises — which PROVES the write was
                # empty (reproduced: all-quarantined run; a non-empty
                # write always executes the observe)
                return 0

    metrics.rows_written = sink(deduped)
    # the observation sits below the quarantine filter, so the sink's own
    # action populates it — no second scan of the extraction pipeline
    # (the reference re-reads nothing either; Q2 exactness, for free)
    try:
        metrics.rows_quarantined = int(dq.get["empty_uuid"])
    except Exception:
        # the empty-write corner loses EVERY observation row of the
        # query (AQE empty-relation propagation — see the sink
        # fallback), so pay one explicit count of the quarantined split
        # in this degenerate case only; the normal path stays one-pass
        metrics.rows_quarantined = quarantined.count()
    metrics.elapsed_s = time.monotonic() - t0
    return metrics
