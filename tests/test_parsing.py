"""Golden fixtures pinning F1-F5 semantics (FIXTURES.md §2; reference
/root/reference/utils.go:193-297)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from dsacord_spark.functions import (
    parse_array_field,
    parse_bool,
    parse_snowflake,
    parse_time,
    platform_uid_parts,
    url_for_day,
)


def _one(spark, expr, value):
    df = spark.createDataFrame([(value,)], "v string")
    return df.select(expr.alias("out")).collect()[0]["out"]


# F1 parseTime (utils.go:193-202)
def test_parse_time_valid(spark):
    assert _one(spark, parse_time("v"), "2025-01-02 03:04:05") == datetime(
        2025, 1, 2, 3, 4, 5
    )


def test_parse_time_empty_and_bad(spark):
    assert _one(spark, parse_time("v"), "") is None
    assert _one(spark, parse_time("v"), "2025-01-02") is None  # wrong layout
    assert _one(spark, parse_time("v"), "not a time") is None


# F2 parseArrayField (utils.go:248-261)
def test_parse_array_json(spark):
    assert _one(spark, parse_array_field("v"), '["A","B"]') == ["A", "B"]


def test_parse_array_empty_is_null(spark):
    assert _one(spark, parse_array_field("v"), "") is None


def test_parse_array_fallback_singleton(spark):
    assert _one(spark, parse_array_field("v"), "not-json") == ["not-json"]
    # bad JSON -> singleton of the raw string, not a partial parse
    assert _one(spark, parse_array_field("v"), '["A",]') == ['["A",]']


# F3 parseBool (utils.go:263-272)
def test_parse_bool(spark):
    assert _one(spark, parse_bool("v"), "Yes") is True
    assert _one(spark, parse_bool("v"), "NO") is False
    assert _one(spark, parse_bool("v"), "maybe") is None
    assert _one(spark, parse_bool("v"), "") is None


# F5 parseSnowflake (utils.go:290-297): golden value from FIXTURES.md —
# (175928847299117063 >> 22) + 1420070400000 ms = 2016-04-30 11:18:25.796 UTC
def test_parse_snowflake_golden(spark):
    out = _one(spark, parse_snowflake("v"), "175928847299117063")
    assert out == datetime(2016, 4, 30, 11, 18, 25, 796000)


def test_parse_snowflake_bad_is_null(spark):
    assert _one(spark, parse_snowflake("v"), "abc") is None


# F4 parsePlatformUID (utils.go:274-288)
def _uid(spark, value):
    df = spark.createDataFrame([(value,)], "v string")
    parts = platform_uid_parts("v")
    row = df.select(
        parts["snowflake_time"].alias("t"),
        parts["entity_id"].alias("i"),
        parts["entity_type"].alias("y"),
    ).collect()[0]
    return row["t"], row["i"], row["y"]


def test_platform_uid_full(spark):
    t, i, y = _uid(spark, "175928847299117063-42-user")
    assert t == datetime(2016, 4, 30, 11, 18, 25, 796000)
    assert (i, y) == ("42", "user")


def test_platform_uid_bad_snowflake_keeps_id_type(spark):
    t, i, y = _uid(spark, "abc-42-user")
    assert t is None
    assert (i, y) == ("42", "user")


def test_platform_uid_short(spark):
    assert _uid(spark, "42-user") == (None, "", "")


def test_platform_uid_extra_parts_ignored(spark):
    t, i, y = _uid(spark, "175928847299117063-42-user-extra")
    assert (i, y) == ("42", "user")


# F6 URL template (main.go:148)
def test_url_for_day(spark):
    df = spark.createDataFrame([("2024-12-28",)], "v string")
    out = df.select(url_for_day(F.to_date("v")).alias("u")).collect()[0]["u"]
    assert out == (
        "https://dsa-sor-data-dumps.s3.eu-central-1.amazonaws.com/"
        "sor-discord-netherlands-bv-2024-12-28-full.zip"
    )
