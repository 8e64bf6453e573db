"""Distributed order-statistics primitives (no unpartitioned windows).

`row_number()/ntile()/SUM() OVER (ORDER BY ...)` with no PARTITION BY
compile to a physical plan that funnels the ENTIRE input frame through
one task (Exchange SinglePartition + Window) — fine on a 100-row
aggregate, fatal when the frame grows with the corpus (per-customer,
per-token, per-user-day frames are hundreds of millions of rows at
100 TB). These helpers compute the same exact results with the classic
two-pass prefix-sum shape:

  1. `repartitionByRange` on the order columns — rows land in range
     partitions that respect the global order (where a sampled boundary
     falls only moves rows between partitions, never changes a result);
  2. per-partition counts/totals — a `parts`-row metadata aggregate —
     become broadcast cumulative offsets;
  3. the per-row value = partition offset + a window PARTITIONED by the
     range-partition id.

Every window is either bounded (`parts` rows) or partitioned. Order
columns must form a TOTAL order (unique tie-break last) or ranks within
a tie become partition-placement-dependent.

Used by plans/reports.py (LTV deciles, RFM quintiles, revenue Gini),
plans/extended.py (Pareto running share, sweep-line concurrency) and
plans/curation.py (vocabulary growth). Equivalence to the built-in
window forms is pinned by
tests/test_reports_properties.py::test_global_rank_ntile_matches_builtin
and ::test_global_cumsum_matches_builtin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F


def _ranged(df: DataFrame, order_cols, parts: int):
    # ALWAYS persisted — for correctness, not speed. The offsets branch
    # (per-_pid counts) and the probe branch both consume this frame; if
    # each materialized its own `repartitionByRange`, each would sample
    # its own range boundaries (the sampler is seeded per materialization)
    # and `spark_partition_id()` is nondeterministic across them, so the
    # counts of one placement would be joined against the _pids of
    # another and ranks/cumsums would silently shift. Relying on Spark's
    # exchange/stage reuse to dedupe the two subtrees makes correctness
    # optimizer-dependent (spark.sql.exchange.reuse=false, or plan drift
    # that de-canonicalizes one side, breaks it — round-4 ADVICE).
    # Persisting makes both branches share ONE cached plan, hence one
    # shuffle, one boundary sample, one _pid assignment, structurally.
    # tests/test_reports_properties.py::test_global_rank_survives_no_exchange_reuse
    # pins this with reuse disabled. (It is also the measured fast shape
    # for chained passes — RFM's 3-score chain: 2.8s vs 4.0s uncached at
    # sf0.1.) Released at the harness/bench family boundary like every
    # other catalog persist.
    return (
        df.repartitionByRange(parts, *order_cols)
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )


def _check_names(df: DataFrame, out_names) -> None:
    """Output columns must not shadow inputs: _global_cumsum applies its
    outputs via sequential withColumn, so a name collision would make a
    later sum read an already-overwritten column (round-4 ADVICE)."""
    clash = set(out_names) & set(df.columns)
    if clash or "_pid" in df.columns:
        raise ValueError(
            f"distrib output names collide with input columns: "
            f"{sorted(clash | ({'_pid'} & set(df.columns)))}"
        )


def _global_rank(
    df: DataFrame,
    order_cols,
    rank_name: str = "r",
    parts: int = 32,
) -> DataFrame:
    """Exact 1-based global row rank under a total ordering. The ranged
    frame is always persisted — see _ranged."""
    _check_names(df, [rank_name])
    part = _ranged(df, order_cols, parts)
    cnt = part.groupBy("_pid").agg(F.count(F.lit(1)).alias("_c"))
    woff = W.orderBy("_pid").rowsBetween(W.unboundedPreceding, -1)
    offs = cnt.select(
        "_pid", F.coalesce(F.sum("_c").over(woff), F.lit(0)).alias("_off")
    )
    wloc = W.partitionBy("_pid").orderBy(*order_cols)
    return (
        part.join(F.broadcast(offs), "_pid")
        .withColumn(
            rank_name,
            (F.col("_off") + F.row_number().over(wloc)).cast("bigint"),
        )
        .drop("_pid", "_off")
    )


def _global_cumsum(
    df: DataFrame,
    order_cols,
    sums: dict,
    parts: int = 32,
) -> DataFrame:
    """Exact inclusive running totals under a total ordering.

    `sums` maps output column name -> expression; each output column is
    SUM(expr) OVER (ORDER BY order_cols ROWS UNBOUNDED PRECEDING), i.e.
    partition-total offsets plus a partitioned running sum. Null
    semantics match the window form (SUM skips nulls; an all-null prefix
    stays null; offsets coalesce to 0). Output names must not shadow
    input columns (raises — see _check_names). The ranged frame is
    always persisted — see _ranged."""
    _check_names(df, sums)
    part = _ranged(df, order_cols, parts)
    cnt = part.groupBy("_pid").agg(
        *[F.sum(expr).alias(f"_t_{name}") for name, expr in sums.items()],
        *[F.count(expr).alias(f"_n_{name}") for name, expr in sums.items()],
    )
    woff = W.orderBy("_pid").rowsBetween(W.unboundedPreceding, -1)
    offs = cnt.select(
        "_pid",
        *[
            F.coalesce(F.sum(f"_t_{name}").over(woff), F.lit(0)).alias(
                f"_off_{name}"
            )
            for name in sums
        ],
        *[
            F.coalesce(F.sum(f"_n_{name}").over(woff), F.lit(0)).alias(
                f"_nn_{name}"
            )
            for name in sums
        ],
    )
    wloc = (
        W.partitionBy("_pid")
        .orderBy(*order_cols)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    out = part.join(F.broadcast(offs), "_pid")
    for name, expr in sums.items():
        run = F.sum(expr).over(wloc)
        # window-SUM null semantics: null iff NO non-null value anywhere
        # in the global prefix — a null local run still inherits the
        # prior partitions' offset when they held non-null values
        out = out.withColumn(
            name,
            F.when(
                run.isNull() & (F.col(f"_nn_{name}") == 0), F.lit(None)
            ).otherwise(F.coalesce(run, F.lit(0)) + F.col(f"_off_{name}")),
        )
    return out.drop(
        "_pid",
        *[f"_off_{n}" for n in sums],
        *[f"_nn_{n}" for n in sums],
    )


def _idiv(a, b):
    """Exact integer division a DIV b for non-negative operands.

    (a - a%b) is exactly divisible, so the double division is exact for
    quotients < 2^53 — no engine-specific DIV semantics involved.
    """
    return ((a - a % b) / b).cast("bigint")


def _ntile_bucket(r, n, k: int):
    """ntile(k) bucket from a 1-based global rank r out of n rows.

    Closed form of SQL ntile: the first n%k buckets take ceil(n/k) rows,
    the rest floor(n/k) — identical to every engine's ntile over the same
    total ordering, but computable from the distributed _global_rank
    without any unpartitioned window.
    """
    q = _idiv(n, F.lit(k))
    rem = n - q * k
    cut = rem * (q + 1)
    return (
        F.when(r <= cut, _idiv(r - 1, q + 1) + 1)
        .otherwise(rem + _idiv(r - cut - 1, q) + 1)
        .cast("int")
    )
