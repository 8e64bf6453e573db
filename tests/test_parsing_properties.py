"""Property-based tests (hypothesis) for the F1-F5 parse functions:
random inputs from the wire's realistic alphabet are run through the Spark
Column builders in one job per example and compared element-wise against
pure-Python models of the pinned semantics (utils.go:193-297 + the
documented Q4/Q6 divergences). Complements the hand-picked golden rows in
test_parsing.py with bulk randomized coverage."""

from __future__ import annotations

import json
import re
from datetime import datetime, timedelta

from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F

from dsacord_spark.functions.parsing import (
    DISCORD_EPOCH_MS,
    parse_array_field,
    parse_bool,
    parse_snowflake,
    parse_time,
    platform_uid_parts,
)

_SETTINGS = dict(max_examples=5, deadline=None)

_token = st.text(alphabet="abcdefghijklmnopqrstuvwxyzXYZ ", min_size=0, max_size=12)
_digits = st.integers(min_value=0, max_value=10**25).map(str)


def _run(spark, values: list[str], col_builder) -> list:
    df = spark.createDataFrame([(v,) for v in values], "v string")
    return [r["out"] for r in df.select(col_builder(F.col("v")).alias("out")).collect()]


# --- F3 parse_bool ---------------------------------------------------------


def _bool_model(s: str):
    low = s.lower()
    return True if low == "yes" else False if low == "no" else None


@settings(**_SETTINGS)
@given(st.lists(st.one_of(_token, st.sampled_from(["Yes", "NO", "yes ", "nO"])),
                min_size=1, max_size=50))
def test_parse_bool_matches_model(spark, values):
    assert _run(spark, values, parse_bool) == [_bool_model(v) for v in values]


# --- F1 parse_time ---------------------------------------------------------

_dt = st.datetimes(min_value=datetime(1905, 1, 1), max_value=datetime(2100, 1, 1))
_time_input = st.one_of(
    _dt.map(lambda d: d.strftime("%Y-%m-%d %H:%M:%S")),
    st.just(""),
    _token,
)


def _time_model(s: str):
    if re.fullmatch(r"\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}", s or ""):
        try:
            return datetime.strptime(s, "%Y-%m-%d %H:%M:%S")
        except ValueError:
            return None
    return None


@settings(**_SETTINGS)
@given(st.lists(_time_input, min_size=1, max_size=50))
def test_parse_time_matches_model(spark, values):
    assert _run(spark, values, parse_time) == [_time_model(v) for v in values]


# --- F2 parse_array_field --------------------------------------------------

_simple = st.text(alphabet="abcdefghijklmnopqrstuvwxyz0123456789_", min_size=1, max_size=8)
_array_input = st.one_of(
    st.just(""),
    st.lists(_simple, min_size=0, max_size=4).map(json.dumps),
    _simple,  # non-JSON token -> singleton fallback
)


def _array_model(s: str):
    if s == "":
        return None
    try:
        v = json.loads(s)
        if isinstance(v, list) and all(isinstance(x, str) for x in v):
            return v
    except json.JSONDecodeError:
        pass
    return [s]


@settings(**_SETTINGS)
@given(st.lists(_array_input, min_size=1, max_size=50))
def test_parse_array_matches_model(spark, values):
    assert _run(spark, values, parse_array_field) == [_array_model(v) for v in values]


# --- F5 parse_snowflake ----------------------------------------------------


def _snowflake_model(s: str):
    if not re.fullmatch(r"\d+", s) or int(s) > 2**63 - 1:
        return None
    ms = (int(s) >> 22) + DISCORD_EPOCH_MS
    return datetime(1970, 1, 1) + timedelta(milliseconds=ms)


@settings(**_SETTINGS)
@given(st.lists(st.one_of(_digits, _token), min_size=1, max_size=50))
def test_parse_snowflake_matches_model(spark, values):
    assert _run(spark, values, parse_snowflake) == [_snowflake_model(v) for v in values]


# --- F4 platform_uid_parts -------------------------------------------------

_segment = st.text(alphabet="abcdefghijklmnopqrstuvwxyz0123456789", min_size=0, max_size=8)
_uid_input = st.lists(_segment, min_size=0, max_size=5).map("-".join)


def _uid_model(s: str):
    parts = s.split("-")
    if len(parts) >= 3:
        return (_snowflake_model(parts[0]), parts[1], parts[2])
    return (None, "", "")


@settings(**_SETTINGS)
@given(st.lists(_uid_input, min_size=1, max_size=50))
def test_platform_uid_matches_model(spark, values):
    df = spark.createDataFrame([(v,) for v in values], "v string")
    cols = platform_uid_parts(F.col("v"))
    rows = df.select(
        cols["snowflake_time"].alias("t"),
        cols["entity_id"].alias("i"),
        cols["entity_type"].alias("y"),
    ).collect()
    got = [(r["t"], r["i"], r["y"]) for r in rows]
    assert got == [_uid_model(v) for v in values]
