"""Local differential harness mirroring the driver's t2 check: run each
catalog query in Spark AND its oracle SQL in DuckDB over the same parquet,
then compare row count, sorted column names, and order-insensitive values.

Comparison is stricter than a hash: exact equality for ints/strings/bools/
decimals, exact-or-1e-9-relative for floats (and it reports WHERE the
mismatch is, which a hash can't)."""

from __future__ import annotations

import math
import os
from decimal import Decimal

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def run_oracle(sql: str, sf_dir: str):
    con = duckdb.connect()
    try:
        for t in TABLES:
            path = os.path.join(sf_dir, f"{t}.parquet")
            if os.path.exists(path):
                con.execute(
                    f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
                )
        cur = con.execute(sql)
        cols = [d[0] for d in cur.description]
        rows = cur.fetchall()
        return cols, rows
    finally:
        con.close()


def _norm_cell(v):
    if isinstance(v, Decimal):
        return ("dec", str(v))
    if isinstance(v, float):
        return ("f", v)
    if isinstance(v, list):
        return ("l", tuple(_norm_cell(x) for x in v))
    return ("v", v)


def _sort_key(row):
    return tuple(
        (t, repr(v)) for t, v in row
    )


def compare(spark_df, oracle_cols, oracle_rows, float_rtol=1e-9):
    """Return a list of human-readable problems (empty == match)."""
    problems = []
    s_cols = list(spark_df.columns)
    if sorted(s_cols) != sorted(oracle_cols):
        problems.append(f"columns differ: spark={sorted(s_cols)} oracle={sorted(oracle_cols)}")
        return problems
    # reorder both to sorted column order (driver sorts by name)
    order = sorted(s_cols)
    s_idx = [s_cols.index(c) for c in order]
    o_idx = [oracle_cols.index(c) for c in order]

    s_rows = [tuple(r[i] for i in s_idx) for r in spark_df.collect()]
    o_rows = [tuple(r[i] for i in o_idx) for r in oracle_rows]
    if len(s_rows) != len(o_rows):
        problems.append(f"row count differs: spark={len(s_rows)} oracle={len(o_rows)}")

    s_n = sorted(
        (tuple(_norm_cell(c) for c in r) for r in s_rows), key=_sort_key
    )
    o_n = sorted(
        (tuple(_norm_cell(c) for c in r) for r in o_rows), key=_sort_key
    )
    mismatches = 0
    for i, (sr, orow) in enumerate(zip(s_n, o_n)):
        if sr == orow:
            continue
        # allow float tolerance cell-wise
        ok = True
        for (st, sv), (ot, ov) in zip(sr, orow):
            if st == "f" and ot == "f" and sv is not None and ov is not None:
                if sv == ov:
                    continue
                if math.isclose(sv, ov, rel_tol=float_rtol, abs_tol=1e-12):
                    continue
                ok = False
                break
            elif (st, sv) != (ot, ov):
                ok = False
                break
        if not ok:
            mismatches += 1
            if mismatches <= 3:
                problems.append(f"row {i} (sorted): spark={sr} oracle={orow}")
    if mismatches > 3:
        problems.append(f"... {mismatches} mismatching rows total")
    return problems


def check_query(spark, name: str, sf_dir: str):
    from dsacord_spark.plans.catalog import specs

    spec = specs()[name]
    df = spec.fn(spark, sf_dir)
    if spec.sql is None:
        assert df.count() >= 0
        return []
    cols, rows = run_oracle(spec.sql, sf_dir)
    return compare(df, cols, rows)
