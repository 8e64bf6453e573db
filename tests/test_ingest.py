"""Ingestion-path integration: zip-of-zips-of-csv fixture -> extraction
-> typed transform -> quarantine split -> parquet sink (SURVEY §5.2 item 5).
Edge cases mirror FIXTURES.md §2 golden rows."""

from __future__ import annotations

import io
import zipfile
from datetime import datetime

import pytest
from pyspark.sql import functions as F

from dsacord_spark.schema import CSV_COLUMNS
from dsacord_spark.sources.zipsource import read_staged_zips
from dsacord_spark.transform import decisions_transform, split_quarantine
from dsacord_spark.sinks.parquet import write_decisions_parquet

HEADER = ",".join(CSV_COLUMNS)

# one fully-populated valid row
_FULL_ROW = {
    "uuid": "aaaa-1",
    "decision_visibility": '["DECISION_VISIBILITY_CONTENT_REMOVED"]',
    "end_date_visibility_restriction": "2025-01-02 03:04:05",
    "category": "STATEMENT_CATEGORY_SCAM",
    "content_type": "not-json-token",
    "automated_detection": "Yes",
    "platform_uid": "175928847299117063-42-user",
    "created_at": "2025-01-01 00:00:00",
}


def _csv_row(overrides: dict) -> str:
    import csv as _csv

    buf = io.StringIO()
    _csv.writer(buf, quoting=_csv.QUOTE_ALL, lineterminator="").writerow(
        [overrides.get(c, "") for c in CSV_COLUMNS]
    )
    return buf.getvalue()


def _build_fixture(tmp_path) -> str:
    """landing/dt=2025-01-01/day.zip: nested zip + plain csv + ragged csv."""
    csv1 = HEADER + "\n" + _csv_row(_FULL_ROW) + "\n" + _csv_row({"uuid": ""}) + "\n"
    # ragged: header-subset file (missing most columns) with a short row
    csv2 = (
        "uuid,platform_uid,automated_detection\n"
        '"bbbb-1","abc-9-server","NO"\n'
        '"bbbb-2"\n'  # short row: missing cells -> None
    )
    inner = io.BytesIO()
    with zipfile.ZipFile(inner, "w") as zf:
        zf.writestr("part-0.csv", csv1)
    outer = io.BytesIO()
    with zipfile.ZipFile(outer, "w") as zf:
        zf.writestr("inner.zip", inner.getvalue())
        zf.writestr("part-1.csv", csv2)
    day_dir = tmp_path / "landing" / "dt=2025-01-01"
    day_dir.mkdir(parents=True)
    (day_dir / "day.zip").write_bytes(outer.getvalue())
    return str(tmp_path / "landing")


@pytest.fixture(scope="module")
def wire(spark, tmp_path_factory):
    landing = _build_fixture(tmp_path_factory.mktemp("ingest"))
    return read_staged_zips(spark, landing).cache()


def test_extraction_row_count_and_provenance(wire):
    rows = wire.collect()
    assert len(rows) == 4
    sources = {r["_source_file"] for r in rows}
    assert any("inner.zip!part-0.csv" in s for s in sources)  # nested path
    assert any("!part-1.csv" in s for s in sources)


def test_typed_transform_golden_values(wire):
    typed = decisions_transform(wire)
    by_uuid = {r["uuid"]: r for r in typed.collect()}
    full = by_uuid["aaaa-1"]
    assert full["decision_visibility"] == ["DECISION_VISIBILITY_CONTENT_REMOVED"]
    assert full["content_type"] == ["not-json-token"]  # singleton fallback
    assert full["end_date_visibility_restriction"] == datetime(2025, 1, 2, 3, 4, 5)
    assert full["automated_detection"] is True
    assert full["snowflake_time"] == datetime(2016, 4, 30, 11, 18, 25, 796000)
    assert full["entity_id"] == "42" and full["entity_type"] == "user"
    assert full["incompatible_content_illegal"] is None  # Q4
    # header-subset file: absent column -> '' (the reference's get closure,
    # utils.go:185-191, returns '' for missing and short), bad snowflake ->
    # NULL time; ''-input parse functions still yield NULL
    partial = by_uuid["bbbb-1"]
    assert partial["category"] == ""
    assert partial["decision_ground"] == ""
    assert partial["end_date_visibility_restriction"] is None
    assert partial["automated_detection"] is False
    assert partial["snowflake_time"] is None
    assert partial["entity_id"] == "9" and partial["entity_type"] == "server"
    # short row: missing cells -> '' -> uid parts fall back to ''
    short = by_uuid["bbbb-2"]
    assert short["platform_uid"] == "" and short["entity_id"] == ""


def test_quarantine_split(wire):
    valid, quarantined = split_quarantine(decisions_transform(wire))
    assert valid.count() == 3
    assert quarantined.count() == 1


def test_parquet_sink_roundtrip(spark, wire, tmp_path):
    out = str(tmp_path / "decisions")
    valid, _ = split_quarantine(decisions_transform(wire))
    write_decisions_parquet(valid, out, mode="overwrite")
    back = spark.read.parquet(out)
    assert back.count() == 3
    assert "dt" in back.columns  # date-partitioned layout
    assert back.filter(F.col("uuid") == "aaaa-1").select("dt").collect()[0][
        "dt"
    ] == "2025-01-01"
