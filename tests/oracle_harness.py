"""Local differential harness mirroring the driver's t2 check: run each
catalog query in Spark AND its oracle SQL in DuckDB over the same parquet,
then compare row count, sorted column names, and order-insensitive values.

Driver-strictness model (hardened in round 2 after 13 hash-fails shipped
through the old tolerance-based compare): the driver fetches both sides into
pandas and hashes a value representation that is
  - INSENSITIVE to integer width (round 1: `window_rank_topn` passed with
    Spark int32 `row_number` vs DuckDB int64), but
  - SENSITIVE to numeric *kind*: Decimal('12345.60') vs 12345.6, and
    DuckDB's SUM(BIGINT)->HUGEINT->float64 `6.0` vs Spark's int64 `6`,
    were exactly the 13 round-1 failures.
So this harness fetches DuckDB via `.df()` and Spark via `.toPandas()`
(the same boundary the driver crosses), canonicalizes numpy scalars to
Python values WITHOUT changing their kind, and requires repr-exact cell
equality (float_rtol=0 — no tolerance). A query that passes here fetches
kind-identical, bit-identical values on both engines.
"""

from __future__ import annotations

import math
import os
from decimal import Decimal

import duckdb
import numpy as np
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def run_oracle_df(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    try:
        for t in TABLES:
            path = os.path.join(sf_dir, f"{t}.parquet")
            if os.path.exists(path):
                con.execute(
                    f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
                )
        return con.execute(sql).df()
    finally:
        con.close()


def _canon_cell(v):
    """Canonical, kind-preserving form of one fetched cell.

    numpy integer -> int, numpy float -> float (width erased, kind kept);
    Decimal stays Decimal (so a Decimal leaking to the output boundary is
    a FAILURE against a float oracle, by design); NaN/None unified per
    kind so float-NaN == float-NaN and None == None across engines."""
    if v is None:
        return ("null",)
    if isinstance(v, (bool, np.bool_)):  # before int: bool subclasses int
        return ("b", bool(v))
    if isinstance(v, (int, np.integer)):
        return ("i", int(v))
    if isinstance(v, (np.floating, float)):
        f = float(v)
        if math.isnan(f):
            # NULL in an object/nullable column fetches as NaN on one
            # engine and None on the other; the driver treats them as
            # equal (f3_parse_bool was driver-green in round 1 with
            # exactly this split), so unify with ("null",)
            return ("null",)
        return ("f", repr(f))
    if isinstance(v, np.bool_):
        return ("b", bool(v))
    if isinstance(v, Decimal):
        return ("dec", repr(v))
    if isinstance(v, (list, tuple, np.ndarray)):
        return ("l", tuple(_canon_cell(x) for x in v))
    # pandas fetches SQL NULL in object columns as None or NaN depending
    # on the path; treat pd.NA / NaT uniformly as null
    if v is pd.NaT or v is pd.NA:
        return ("null",)
    return ("v", v if not isinstance(v, (bytes, bytearray)) else bytes(v))


def _canon_rows(df: pd.DataFrame):
    order = sorted(df.columns)
    sub = df[order]
    rows = []
    for tup in sub.itertuples(index=False, name=None):
        rows.append(tuple(_canon_cell(c) for c in tup))
    rows.sort(key=repr)
    return order, rows


def compare_pandas(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame):
    """Return a list of human-readable problems (empty == match).

    Strict: repr-exact values, no float tolerance, kind-sensitive."""
    problems = []
    if sorted(spark_pdf.columns) != sorted(oracle_pdf.columns):
        problems.append(
            f"columns differ: spark={sorted(spark_pdf.columns)} "
            f"oracle={sorted(oracle_pdf.columns)}"
        )
        return problems
    if len(spark_pdf) != len(oracle_pdf):
        problems.append(
            f"row count differs: spark={len(spark_pdf)} oracle={len(oracle_pdf)}"
        )
    _, s_rows = _canon_rows(spark_pdf)
    order, o_rows = _canon_rows(oracle_pdf)
    mismatches = 0
    for i, (sr, orow) in enumerate(zip(s_rows, o_rows)):
        if sr != orow:
            mismatches += 1
            if mismatches <= 3:
                detail = [
                    f"{c}: spark={s} oracle={o}"
                    for c, s, o in zip(order, sr, orow)
                    if s != o
                ]
                problems.append(f"row {i} (sorted): " + "; ".join(detail))
    if mismatches > 3:
        problems.append(f"... {mismatches} mismatching rows total")
    if mismatches:
        problems.append(
            f"fetched dtypes: spark={dict(spark_pdf.dtypes.astype(str))} "
            f"oracle={dict(oracle_pdf.dtypes.astype(str))}"
        )
    return problems


_checked = 0


def check_query(spark, name: str, sf_dir: str):
    from dsacord_spark.plans.catalog import specs

    # a few queries persist frames their returned lazy plan consumes
    # (simhash signatures, gap-fill hourly agg — PLANS.md known costs);
    # release pinned blocks periodically so the 100+-query sweep doesn't
    # accumulate them
    global _checked
    _checked += 1
    if _checked % 16 == 0:
        spark.catalog.clearCache()

    spec = specs()[name]
    df = spec.fn(spark, sf_dir)
    if spec.sql is None:
        assert df.count() >= 0
        return []
    oracle_pdf = run_oracle_df(spec.sql, sf_dir)
    return compare_pandas(df.toPandas(), oracle_pdf)


# Back-compat shims for callers of the round-1 API ---------------------------

def run_oracle(sql: str, sf_dir: str):
    pdf = run_oracle_df(sql, sf_dir)
    return list(pdf.columns), [tuple(r) for r in pdf.itertuples(index=False, name=None)]


def compare(spark_df, oracle_cols, oracle_rows, float_rtol=0):
    oracle_pdf = pd.DataFrame(oracle_rows, columns=oracle_cols)
    return compare_pandas(spark_df.toPandas(), oracle_pdf)
