"""reports_snapshot: metrics-lake layout, manifest, idempotent per-day
overwrite, cache hygiene, and CLI wiring."""

from __future__ import annotations

import json
import os

import pytest

from dsacord_spark.reports_snapshot import write_snapshot


_SMALL_SET = ["orders_revenue_gini", "text_hapax_ratio",
              "events_weekhour_heatmap"]


def test_snapshot_layout_manifest_and_counts(spark, sf_dir, tmp_path):
    out = str(tmp_path / "metrics")
    man = write_snapshot(spark, sf_dir, out, "2026-08-14", _SMALL_SET)
    assert set(man["reports"]) == set(_SMALL_SET)
    for name, rec in man["reports"].items():
        dest = os.path.join(out, f"report={name}", "dt=2026-08-14")
        df = spark.read.parquet(dest)
        assert df.count() == rec["rows"] > 0
    with open(os.path.join(out, "_manifest", "dt=2026-08-14.json")) as fh:
        on_disk = json.load(fh)
    assert on_disk["reports"] == man["reports"]
    # cache hygiene: a snapshot run leaves no pinned blocks
    assert spark.sparkContext._jsc.getPersistentRDDs().size() == 0


def test_snapshot_rerun_is_idempotent_and_day_scoped(spark, sf_dir, tmp_path):
    out = str(tmp_path / "metrics")
    write_snapshot(spark, sf_dir, out, "2026-08-14", ["orders_revenue_gini"])
    first = spark.read.parquet(
        os.path.join(out, "report=orders_revenue_gini", "dt=2026-08-14")
    ).collect()
    # a second day lands beside the first
    write_snapshot(spark, sf_dir, out, "2026-08-15", ["orders_revenue_gini"])
    # re-running day 1 overwrites in place, does not duplicate rows
    write_snapshot(spark, sf_dir, out, "2026-08-14", ["orders_revenue_gini"])
    again = spark.read.parquet(
        os.path.join(out, "report=orders_revenue_gini", "dt=2026-08-14")
    ).collect()
    assert sorted(map(tuple, first)) == sorted(map(tuple, again))
    days = sorted(
        d for d in os.listdir(os.path.join(out, "report=orders_revenue_gini"))
        if d.startswith("dt=")
    )
    assert days == ["dt=2026-08-14", "dt=2026-08-15"]


def test_snapshot_rejects_bad_inputs(spark, sf_dir, tmp_path):
    out = str(tmp_path / "m")
    with pytest.raises(ValueError, match="YYYY-MM-DD"):
        write_snapshot(spark, sf_dir, out, "20260814", _SMALL_SET)
    with pytest.raises(ValueError, match="unknown report"):
        write_snapshot(spark, sf_dir, out, "2026-08-14", ["nope"])


def test_default_set_names_exist_in_catalog():
    from dsacord_spark.plans.catalog import queries
    from dsacord_spark.reports_snapshot import DEFAULT_REPORTS

    q = queries()
    missing = [n for n in DEFAULT_REPORTS if n not in q]
    assert not missing, missing
