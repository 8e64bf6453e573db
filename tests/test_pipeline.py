"""End-to-end backfill: URL generation -> staged download (fake HTTP) ->
nested-zip extraction -> typed transform -> dedup -> parquet sink ->
metrics, with one day 403ing (isolated, run continues — main.go:137-144)."""

from __future__ import annotations

import io
import urllib.error
import zipfile
from datetime import date

from dsacord_spark.config import Config
from dsacord_spark.pipeline import run_backfill
from tests.test_ingest import HEADER, _FULL_ROW, _csv_row


def _day_zip(uuid: str) -> bytes:
    row = dict(_FULL_ROW)
    row["uuid"] = uuid
    csv_data = HEADER + "\n" + _csv_row(row) + "\n" + _csv_row(row) + "\n"  # dup row
    inner = io.BytesIO()
    with zipfile.ZipFile(inner, "w") as zf:
        zf.writestr("d.csv", csv_data)
    outer = io.BytesIO()
    with zipfile.ZipFile(outer, "w") as zf:
        zf.writestr("inner.zip", inner.getvalue())
    return outer.getvalue()


class _Resp(io.BytesIO):
    status = 200

    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


def test_run_backfill_end_to_end(spark, tmp_path):
    served = {
        "2025-01-01": _day_zip("day1-row"),
        "2025-01-03": _day_zip("day3-row"),
    }

    def opener(url):
        for dt, data in served.items():
            if dt in url:
                return _Resp(data)
        raise urllib.error.HTTPError(url, 403, "forbidden", None, None)  # day 2

    cfg = Config(
        date_from=date(2025, 1, 1),
        date_to=date(2025, 1, 3),
        landing_dir=str(tmp_path / "landing"),
    )
    metrics = run_backfill(spark, cfg, opener=opener)

    assert metrics.rows_written == 2            # dup rows within day deduped
    assert metrics.rows_quarantined == 0
    assert len(metrics.day_errors) == 1         # the 403 day, isolated
    assert "forbidden" in metrics.day_errors[0]

    out = spark.read.parquet(str(tmp_path / "landing" / "decisions"))
    assert sorted(r["uuid"] for r in out.select("uuid").collect()) == [
        "day1-row",
        "day3-row",
    ]
