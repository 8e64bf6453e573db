"""Metrics-lake snapshot writer — materialize catalog report outputs to
a partitioned parquet lake in one pass, the "metric snapshot" pattern
every scheduled analytics pipeline ends with (compute once per day,
serve from the lake; re-running a day overwrites just that day).

    python -m dsacord_spark.reports_snapshot \
        --sf-dir /root/testdata/sf0.01 --output /data/metrics \
        --dt 2026-08-14 [--only text_zipf_table,orders_revenue_gini]

Layout: `<output>/report=<name>/dt=<DT>/*.parquet` plus a snapshot
manifest `<output>/_manifest/dt=<DT>.json` recording per-report row
counts and timings — the manifest is what a downstream freshness check
reads instead of listing data files.

Scale notes: each report's plan runs exactly as in the catalog (the
same DataFrames the driver value-checks); writes are per-report
`mode=overwrite` on the (report, dt) partition pair so a re-run of one
day is idempotent and never touches other days. The loop over reports
is driver-side ORCHESTRATION (one action per report), not a data path —
the data never flows through the driver.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time

from pyspark.sql import SparkSession

# default snapshot set: the cheap, small-output health reports — the
# ones a daily metrics lake actually stores (pair-listing and per-doc
# entries are query-time reports, not snapshot material)
DEFAULT_REPORTS = (
    "text_zipf_table",
    "text_hapax_ratio",
    "text_charclass_profile",
    "text_ngram_dup_sweep",
    "corpus_dup_cluster_histogram",
    "source_vocab_tv_distance",
    "events_dau_stickiness",
    "events_weekhour_heatmap",
    "events_session_duration_histogram",
    "events_funnel_windowed",
    "events_rolling_7d_active",
    "orders_ltv_deciles",
    "orders_rfm_segments",
    "orders_repeat_retention",
    "orders_revenue_gini",
    "orders_month_priority_lift",
    "region_nation_share",
    "supplier_scorecard",
    "part_brand_hhi",
    "customer_balance_iqr_outliers",
)

_DT_RE = re.compile(r"^\d{4}-\d{2}-\d{2}$")


def write_snapshot(
    spark: SparkSession,
    sf_dir: str,
    output: str,
    dt: str,
    reports: list[str] | None = None,
) -> dict:
    """Run each report against `sf_dir` and write it under
    `report=<name>/dt=<dt>`; returns (and persists) the manifest."""
    from dsacord_spark.plans.catalog import queries

    if not _DT_RE.match(dt):
        raise ValueError(f"--dt must be YYYY-MM-DD, got {dt!r}")
    q = queries()
    names = list(reports) if reports else list(DEFAULT_REPORTS)
    unknown = [n for n in names if n not in q]
    if unknown:
        raise ValueError(f"unknown report(s): {unknown}")

    manifest: dict = {"dt": dt, "sf_dir": sf_dir, "reports": {}}
    for name in names:
        t0 = time.perf_counter()
        df = q[name](spark, sf_dir)
        dest = os.path.join(output, f"report={name}", f"dt={dt}")
        df.write.mode("overwrite").parquet(dest)
        n = spark.read.parquet(dest).count()
        manifest["reports"][name] = {
            "rows": n,
            "seconds": round(time.perf_counter() - t0, 3),
        }
        # snapshots must never leave pinned blocks behind (several report
        # plans persist shared frames); release per report
        spark.catalog.clearCache()
    man_dir = os.path.join(output, "_manifest")
    os.makedirs(man_dir, exist_ok=True)
    with open(os.path.join(man_dir, f"dt={dt}.json"), "w") as fh:
        json.dump(manifest, fh, indent=1, sort_keys=True)
        fh.write("\n")
    return manifest


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="python -m dsacord_spark.reports_snapshot")
    ap.add_argument("--sf-dir", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--dt", required=True, help="snapshot day, YYYY-MM-DD")
    ap.add_argument(
        "--only",
        default="",
        help="comma-separated report names (default: the snapshot set)",
    )
    ap.add_argument("--master", default="local[*]")
    args = ap.parse_args(argv)

    from dsacord_spark.session import get_spark

    spark = get_spark(app_name="dsacord-reports-snapshot", master=args.master)
    reports = [s for s in args.only.split(",") if s] or None
    manifest = write_snapshot(spark, args.sf_dir, args.output, args.dt, reports)
    total = round(sum(r["seconds"] for r in manifest["reports"].values()), 2)
    print(
        json.dumps(
            {
                "dt": manifest["dt"],
                "n_reports": len(manifest["reports"]),
                "total_rows": sum(
                    r["rows"] for r in manifest["reports"].values()
                ),
                "seconds": total,
            },
            separators=(",", ":"),
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
