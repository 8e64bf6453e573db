"""The rest of the TPC-H query suite, adapted to the driver's synthetic
schema (SURVEY §2.4-2.5 upper end; reference has NO query surface — this
is layer-B completeness so a TPC-H-literate user finds every familiar
query shape).

The synthetic tables omit `partsupp`, lineitem's commit/receipt dates,
ship mode/instructions, and customer phone numbers, so each query keeps
its CHARACTERISTIC PLAN SHAPE (the thing that matters for engine
coverage: the correlated min of Q2, the EXISTS semi-join of Q4, the OR'd
multi-predicate pushdown of Q19, the double-aggregate of Q13, ...) with
the closest available columns standing in. Adaptations are noted per
query.

Determinism rules (PLANS.md): money sums pass through DECIMAL(18,2) and
cast to DOUBLE only at the output boundary; integer sums/counts wrapped
CAST(... AS BIGINT) in the oracle; comparisons against averages are
restated as exact integer/decimal cross-multiplications so no engine
ever compares against a float-divided threshold; every ranked output
carries a unique tie-break.

Scale notes use the same vocabulary as plans/composite.py: dimensions
broadcast, fact-fact joins shuffle once on their keys, aggregates run
partial+final, AQE free to re-plan at real scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from dsacord_spark.plans.registry import register, table

_D = "decimal(18,2)"


def _dec(c) -> F.Column:
    return (F.col(c) if isinstance(c, str) else c).cast(_D)


def _rev() -> F.Column:
    """Exact decimal revenue: price and (1-discount) are EACH cast to
    decimal first (both exactly representable at their scale), so the
    product and every sum over it are exact integers-at-scale on both
    engines — no double->decimal rounding of a product ever happens.
    Casting the PRODUCT (the r1-era formulation) diverged between
    engines when a product landed near a .005 midpoint."""
    return _dec("l_extendedprice") * (
        F.lit(1) - F.col("l_discount")
    ).cast("decimal(4,2)")


_REV_SQL = ("CAST(l_extendedprice AS DECIMAL(18,2)) "
            "* CAST(1 - l_discount AS DECIMAL(4,2))")


# ---------------------------------------------------------------------------
# Q2 shape: correlated MIN subquery — for each qualifying part, the
# supplier with the minimum cost. No partsupp table, so the part-supplier
# relation is the DISTINCT (l_partkey, l_suppkey) pairs observed in
# lineitem and s_acctbal stands in for ps_supplycost. The plan shape is
# the point: per-part argmin with a deterministic tie-break, which Spark
# expresses as a rank window over the joined relation (one shuffle on
# p_partkey) where SQL engines write a correlated scalar subquery.
# ---------------------------------------------------------------------------
@register(
    "q2_min_cost_supplier",
    sql="""
    WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
    cand AS (
      SELECT p.p_partkey, p.p_name, s.s_suppkey, s.s_name, s.s_acctbal, n.n_name
      FROM part p
      JOIN ps ON ps.l_partkey = p.p_partkey
      JOIN supplier s ON s.s_suppkey = ps.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      WHERE p.p_size <= 5 AND p.p_type = 'SMALL')
    , ranked AS (
      SELECT *, row_number() OVER (PARTITION BY p_partkey
                                   ORDER BY s_acctbal ASC, s_suppkey ASC) AS rn
      FROM cand)
    SELECT p_partkey, p_name, s_suppkey, s_name, n_name,
           CAST(s_acctbal AS DOUBLE) AS supplier_cost
    FROM ranked WHERE rn = 1
    """,
    doc="TPC-H Q2 shape (correlated min): cheapest supplier per small "
    "part, part-supplier relation derived from lineitem (no partsupp in "
    "the synthetic schema), s_acctbal standing in for ps_supplycost.",
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part").filter(
        (F.col("p_size") <= 5) & (F.col("p_type") == "SMALL")
    )
    ps = (
        table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    cand = (
        ps.join(F.broadcast(p), ps["l_partkey"] == p["p_partkey"])
        .join(s, ps["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
    )
    w = W.partitionBy("p_partkey").orderBy(
        F.col("s_acctbal").asc(), F.col("s_suppkey").asc()
    )
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "p_partkey", "p_name", "s_suppkey", "s_name", "n_name",
            F.col("s_acctbal").cast("double").alias("supplier_cost"),
        )
    )


# ---------------------------------------------------------------------------
# Q4 shape: EXISTS semi-join + priority rollup. No commit/receipt dates,
# so "late order" = an order with at least one lineitem shipped more
# than 60 days after the order date.
# ---------------------------------------------------------------------------
@register(
    "q4_priority_late_ship",
    sql="""
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1996-07-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority
    """,
    doc="TPC-H Q4 shape: EXISTS semi-join (late-shipping lineitem) -> "
    "order counts per priority. Plans as LeftSemi with the date filter "
    "pushed to both scans.",
)
def q4_priority_late_ship(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    l = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = o.join(
        l,
        (o["o_orderkey"] == l["l_orderkey"])
        & (l["l_shipdate"] > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


# ---------------------------------------------------------------------------
# Q6 shape: the canonical scan-filter-aggregate — zero joins, every
# predicate pushed to the parquet scan, one partial+final agg. The
# benchmark's pure-pushdown probe.
# ---------------------------------------------------------------------------
@register(
    "q6_forecast_revenue",
    sql="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                 * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE)
             AS revenue,
           CAST(count(*) AS BIGINT) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount >= 0.02 AND l_discount <= 0.06
      AND l_quantity < 24
    """,
    doc="TPC-H Q6: scan-filter-agg with full predicate pushdown "
    "(PushedFilters carries all four range predicates; ReadSchema is 4 "
    "columns), single-row revenue forecast.",
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.02)
            & (F.col("l_discount") <= 0.06)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(_dec("l_extendedprice") * F.col("l_discount").cast("decimal(4,2)"))
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# ---------------------------------------------------------------------------
# Q8 shape: national market share — share of one nation's suppliers in a
# region's customer revenue, by order year. Division happens ONCE, on
# the two exact decimal sums cast to double (deterministic), not
# per-row.
# ---------------------------------------------------------------------------
@register(
    "q8_market_share",
    sql=f"""
    WITH base AS (
      SELECT year(o_orderdate) AS o_year,
             {_REV_SQL} AS rev,
             sn.n_name AS supp_nation
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation cn ON c_nationkey = cn.n_nationkey
      JOIN region   ON cn.n_regionkey = r_regionkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation sn ON s_nationkey = sn.n_nationkey
      WHERE r_name = 'EUROPE'
        AND o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate < TIMESTAMP '1998-01-01')
    SELECT o_year,
           CAST(SUM(CASE WHEN supp_nation = 'GERMANY' THEN rev
                         ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS nation_rev,
           CAST(SUM(rev) AS DOUBLE) AS total_rev,
           round(CAST(SUM(CASE WHEN supp_nation = 'GERMANY' THEN rev
                               ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
                 / CAST(SUM(rev) AS DOUBLE), 6) AS mkt_share
    FROM base GROUP BY o_year
    """,
    doc="TPC-H Q8 shape: 7-relation join graph (two roles for nation) -> "
    "GERMANY suppliers' share of EUROPE customer revenue per year. "
    "Dimensions broadcast; the share divides two exact decimal sums once "
    "per group.",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    n = table(spark, sf_dir, "nation")
    cn = n.join(
        F.broadcast(r), n["n_regionkey"] == r["r_regionkey"]
    ).select(F.col("n_nationkey").alias("cn_key"))
    sn = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    c = table(spark, sf_dir, "customer").join(
        F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key")
    )
    s = table(spark, sf_dir, "supplier").join(
        F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key")
    ).select("s_suppkey", "supp_nation")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    l = table(spark, sf_dir, "lineitem")
    zero = F.lit(0).cast(_D)
    nation_rev = F.sum(
        F.when(F.col("supp_nation") == "GERMANY", _rev()).otherwise(zero)
    ).cast("double")
    total_rev = F.sum(_rev()).cast("double")
    return (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(s, l["l_suppkey"] == s["s_suppkey"])
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            nation_rev.alias("nation_rev"),
            total_rev.alias("total_rev"),
            F.round(nation_rev / total_rev, 6).alias("mkt_share"),
        )
    )


# ---------------------------------------------------------------------------
# Q9 shape: product-type profit by nation and year. No ps_supplycost, so
# profit = revenue - p_retailprice * l_quantity / 10 (a deterministic
# pseudo-cost: retail price scaled down, exact in decimal).
# ---------------------------------------------------------------------------
@register(
    "q9_product_profit",
    sql=f"""
    SELECT n_name AS nation, year(o_orderdate) AS o_year,
           CAST(SUM(10 * ({_REV_SQL})
                    - CAST(p_retailprice AS DECIMAL(18,2))
                      * CAST(l_quantity AS DECIMAL(9,0)))
                AS DOUBLE) / 10 AS profit
    FROM lineitem
    JOIN part     ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN orders   ON l_orderkey = o_orderkey
    WHERE p_name LIKE '%widget%'
    GROUP BY n_name, year(o_orderdate)
    """,
    doc="TPC-H Q9 shape: profit per supplier nation x year for widget "
    "parts; pseudo-cost p_retailprice*qty/10 stands in for the absent "
    "ps_supplycost (decimal-exact on both engines).",
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    o = table(spark, sf_dir, "orders")
    l = table(spark, sf_dir, "lineitem")
    sn = s.join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"]).select(
        "s_suppkey", "n_name"
    )
    cost = _dec("p_retailprice") * F.col("l_quantity").cast("decimal(9,0)")
    return (
        l.join(F.broadcast(p), l["l_partkey"] == p["p_partkey"])
        .join(sn, l["l_suppkey"] == sn["s_suppkey"])
        .join(o, l["l_orderkey"] == o["o_orderkey"])
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(
            (F.sum(F.lit(10) * _rev() - cost).cast("double") / 10).alias(
                "profit"
            )
        )
    )


# ---------------------------------------------------------------------------
# Q12 shape: CASE-aggregation over a derived category. No l_shipmode, so
# the categories are ship-delay bands (days from order to ship), and the
# priority split keeps Q12's high/low CASE pair.
# ---------------------------------------------------------------------------
@register(
    "q12_ship_delay_priority",
    sql="""
    SELECT CASE WHEN date_diff('day', o_orderdate, l_shipdate) <= 30
                THEN 'fast' ELSE 'slow' END AS delay_band,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY 1
    """,
    doc="TPC-H Q12 shape: derived-category CASE aggregation (ship-delay "
    "bands stand in for ship modes), one fact-fact shuffle join + "
    "partial/final agg on a 2-value key.",
)
def q12_ship_delay_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    l = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    ).select("l_orderkey", "l_shipdate")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .withColumn(
            "delay_band",
            F.when(
                F.datediff(F.col("l_shipdate"), F.col("o_orderdate")) <= 30,
                F.lit("fast"),
            ).otherwise(F.lit("slow")),
        )
        .groupBy("delay_band")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


# ---------------------------------------------------------------------------
# Q13 shape: the double aggregate — orders per customer (LEFT join so
# zero-order customers count), then the distribution of those counts.
# Two shuffles by construction; the second input is already tiny.
# ---------------------------------------------------------------------------
@register(
    "q13_customer_distribution",
    sql="""
    WITH per_cust AS (
      SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderstatus <> 'P'
      GROUP BY c_custkey)
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
    FROM per_cust GROUP BY c_count
    """,
    doc="TPC-H Q13: LEFT join keeps zero-order customers, then a second "
    "aggregate over the per-customer counts (the canonical "
    "agg-of-an-agg plan).",
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer").select("c_custkey")
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") != "P"
    ).select("o_custkey", "o_orderkey")
    per_cust = (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).alias("custdist")
    )


# ---------------------------------------------------------------------------
# Q14 shape: CASE-share of revenue — promo parts' fraction of one
# month's revenue. One broadcast dim join; the division runs once on the
# two exact decimal sums.
# ---------------------------------------------------------------------------
@register(
    "q14_promo_revenue",
    sql=f"""
    SELECT CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {_REV_SQL}
                         ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS promo_rev,
           CAST(SUM({_REV_SQL}) AS DOUBLE) AS total_rev,
           round(100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {_REV_SQL}
                                       ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
                 / CAST(SUM({_REV_SQL}) AS DOUBLE), 6) AS promo_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-03-01'
      AND l_shipdate < TIMESTAMP '1996-04-01'
    """,
    doc="TPC-H Q14: promo parts' share of one month's revenue — "
    "broadcast part join, single-row CASE-share output.",
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part").select("p_partkey", "p_type")
    l = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    zero = F.lit(0).cast(_D)
    promo = F.sum(
        F.when(F.col("p_type") == "PROMO", _rev()).otherwise(zero)
    ).cast("double")
    total = F.sum(_rev()).cast("double")
    return (
        l.join(F.broadcast(p), l["l_partkey"] == p["p_partkey"])
        .agg(
            promo.alias("promo_rev"),
            total.alias("total_rev"),
            F.round(F.lit(100.0) * promo / total, 6).alias("promo_pct"),
        )
    )


# ---------------------------------------------------------------------------
# Q15 shape: top supplier — a revenue "view" per supplier over a
# quarter, then suppliers whose revenue equals the global max (exact
# decimal equality; ties all emitted, ordered by suppkey). The global
# max runs as an analytic over the ALREADY-AGGREGATED per-supplier frame
# (supplier-cardinality rows, so the single-partition window is safe by
# construction at any corpus scale).
# ---------------------------------------------------------------------------
@register(
    "q15_top_supplier",
    sql=f"""
    WITH rev AS (
      SELECT l_suppkey AS supplier_no, SUM({_REV_SQL}) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name,
           CAST(total_revenue AS DOUBLE) AS total_revenue
    FROM supplier JOIN rev ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
    """,
    doc="TPC-H Q15: quarterly revenue per supplier, emit the max-revenue "
    "supplier(s) by exact decimal equality against the scalar max.",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    rev = l.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_rev()).alias("total_revenue")
    )
    top = rev.withColumn(
        "__mx", F.max("total_revenue").over(W.partitionBy())
    ).filter(F.col("total_revenue") == F.col("__mx"))
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        top.join(F.broadcast(s), top["supplier_no"] == s["s_suppkey"])
        .select(
            "s_suppkey", "s_name",
            F.col("total_revenue").cast("double").alias("total_revenue"),
        )
    )


# ---------------------------------------------------------------------------
# Q16 shape: distinct-supplier counts per part attribute triple, with a
# NOT-IN supplier exclusion. No partsupp: the part-supplier relation
# comes from lineitem; "complaint" suppliers = negative account balance.
# ---------------------------------------------------------------------------
@register(
    "q16_part_supplier_counts",
    sql="""
    WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
    SELECT p_brand, p_type, p_size,
           CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM ps
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1'
      AND p_size IN (1, 4, 9, 16, 25, 36, 49)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    """,
    doc="TPC-H Q16 shape: distinct-agg per attribute triple with an "
    "anti-join supplier exclusion (negative acctbal stands in for "
    "complaint comments); part-supplier pairs derived from lineitem.",
)
def q16_part_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ps = (
        table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    p = table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49)
    )
    bad = table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select(F.col("s_suppkey").alias("bad_key"))
    return (
        ps.join(F.broadcast(p), ps["l_partkey"] == p["p_partkey"])
        .join(
            F.broadcast(bad),
            ps["l_suppkey"] == F.col("bad_key"),
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


# ---------------------------------------------------------------------------
# Q19 shape: disjunctive multi-attribute predicates — three OR'd
# (brand, size-range, quantity-range) conjunctions evaluated across the
# part join. The probe for OR-predicate pushdown and join-side filter
# placement.
# ---------------------------------------------------------------------------
@register(
    "q19_disjunctive_revenue",
    sql=f"""
    SELECT CAST(SUM({_REV_SQL}) AS DOUBLE) AS revenue,
           CAST(count(*) AS BIGINT) AS n_items
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
           AND l_quantity >= 1 AND l_quantity <= 11)
       OR (p_brand = 'Brand#7' AND p_size BETWEEN 10 AND 25
           AND l_quantity >= 10 AND l_quantity <= 20)
       OR (p_brand = 'Brand#13' AND p_size BETWEEN 20 AND 35
           AND l_quantity >= 20 AND l_quantity <= 30)
    """,
    doc="TPC-H Q19: three OR'd brand/size/quantity conjunctions over the "
    "part join — the disjunctive-pushdown probe (part-side predicates "
    "reach the part scan, quantity predicates the lineitem scan).",
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    l = table(spark, sf_dir, "lineitem")
    j = l.join(F.broadcast(p), l["l_partkey"] == p["p_partkey"])
    q = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15)
         & (q >= 1) & (q <= 11))
        | ((F.col("p_brand") == "Brand#7") & F.col("p_size").between(10, 25)
           & (q >= 10) & (q <= 20))
        | ((F.col("p_brand") == "Brand#13") & F.col("p_size").between(20, 35)
           & (q >= 20) & (q <= 30))
    )
    return j.filter(cond).agg(
        F.sum(_rev()).cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


# ---------------------------------------------------------------------------
# Q20 shape: nested quantity-threshold semi-join — suppliers who shipped
# MORE than their "share" of small parts. The avg comparison is restated
# as an exact cross-multiplication (2 * n_pairs * pair_qty > total_qty,
# all decimal/bigint) so neither engine divides.
# ---------------------------------------------------------------------------
@register(
    "q20_heavy_small_part_suppliers",
    sql="""
    WITH pair_qty AS (
      SELECT l_suppkey, l_partkey,
             SUM(CAST(l_quantity AS DECIMAL(18,2))) AS qty
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE p_name LIKE 'small%'
        AND l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1997-01-01'
      GROUP BY l_suppkey, l_partkey),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n_pairs, SUM(qty) AS total_qty
            FROM pair_qty),
    heavy AS (SELECT DISTINCT l_suppkey FROM pair_qty, tot
              WHERE 2 * n_pairs * qty > total_qty)
    SELECT s_suppkey, s_name, n_name
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    WHERE s_suppkey IN (SELECT l_suppkey FROM heavy)
    """,
    doc="TPC-H Q20 shape: suppliers whose per-part shipped quantity of "
    "'small' parts exceeds 2x the average pair quantity (exact "
    "cross-multiplied threshold), surfaced via semi-join with their "
    "nation.",
)
def q20_heavy_small_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part").filter(F.col("p_name").like("small%"))
    l = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    pair_qty = (
        l.join(F.broadcast(p), l["l_partkey"] == p["p_partkey"])
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(_dec("l_quantity")).alias("qty"))
    )
    tot = pair_qty.agg(
        F.count(F.lit(1)).alias("n_pairs"), F.sum("qty").alias("total_qty")
    )
    heavy = (
        pair_qty.crossJoin(F.broadcast(tot))
        .filter(F.lit(2) * F.col("n_pairs") * F.col("qty") > F.col("total_qty"))
        .select("l_suppkey")
        .distinct()
    )
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    return (
        s.join(F.broadcast(heavy), s["s_suppkey"] == heavy["l_suppkey"], "left_semi")
        .join(F.broadcast(n), F.col("s_nationkey") == n["n_nationkey"])
        .select("s_suppkey", "s_name", "n_name")
    )


# ---------------------------------------------------------------------------
# Q21 shape: the latest shipper in multi-supplier orders — EXISTS
# (another supplier in the order) + "this supplier holds the order's max
# ship date" (the NOT-EXISTS half restated as a max-equality, with
# single-holder enforcement so ties don't double-count). Spark computes
# both via one window over the order; the oracle via correlated
# aggregates.
# ---------------------------------------------------------------------------
@register(
    "q21_latest_shipper",
    sql="""
    WITH li AS (
      SELECT l_orderkey, l_suppkey, l_shipdate
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderstatus = 'F'),
    per_order AS (
      SELECT l_orderkey,
             count(DISTINCT l_suppkey) AS n_supp,
             max(l_shipdate) AS max_ship
      FROM li GROUP BY l_orderkey),
    latest AS (
      SELECT DISTINCT li.l_orderkey, li.l_suppkey
      FROM li JOIN per_order po ON li.l_orderkey = po.l_orderkey
      WHERE po.n_supp >= 2 AND li.l_shipdate = po.max_ship),
    single_holder AS (
      SELECT l_orderkey FROM latest GROUP BY l_orderkey HAVING count(*) = 1)
    SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM latest
    JOIN single_holder USING (l_orderkey)
    JOIN supplier ON s_suppkey = l_suppkey
    GROUP BY s_name
    """,
    doc="TPC-H Q21 shape: suppliers who were the SOLE latest shipper in "
    "finished multi-supplier orders (EXISTS/NOT-EXISTS restated as "
    "per-order max-equality + single-holder check; no receipt/commit "
    "dates in the synthetic schema).",
)
def q21_latest_shipper(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Window formulation: per-order supplier count and max ship date come
    # from ONE shuffle on l_orderkey (collect_set/max analytic) instead
    # of the oracle's aggregate-then-rejoin (which scans lineitem twice);
    # the single-holder check rides the same partitioning, so the whole
    # correlated-EXISTS cascade costs 2 orderkey shuffles + the final
    # name rollup (16 exchanges as a literal translation, 4 this way).
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey")
    li = (
        table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(o, F.col("l_orderkey") == o["o_orderkey"], "left_semi")
    )
    w = W.partitionBy("l_orderkey")
    latest = (
        li.withColumn("n_supp", F.size(F.collect_set("l_suppkey").over(w)))
        .withColumn("max_ship", F.max("l_shipdate").over(w))
        .filter(
            (F.col("n_supp") >= 2) & (F.col("l_shipdate") == F.col("max_ship"))
        )
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    single = latest.withColumn(
        "__n", F.count(F.lit(1)).over(W.partitionBy("l_orderkey"))
    ).filter(F.col("__n") == 1)
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        single.join(F.broadcast(s), single["l_suppkey"] == s["s_suppkey"])
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


# ---------------------------------------------------------------------------
# Q22 shape: above-average idle customers — acctbal above the positive
# average (exact cross-multiplied: bal * n_pos > sum_pos) with NO
# orders, rolled up by market segment (stands in for the phone country
# code). Anti-join + scalar-aggregate threshold.
# ---------------------------------------------------------------------------
@register(
    "q22_idle_customers",
    sql="""
    WITH pos AS (
      SELECT CAST(count(*) AS BIGINT) AS n_pos,
             SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS sum_pos
      FROM customer WHERE c_acctbal > 0)
    SELECT c_mktsegment,
           CAST(count(*) AS BIGINT) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
    FROM customer, pos
    WHERE CAST(c_acctbal AS DECIMAL(18,2)) * n_pos > sum_pos
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                      AND o_orderdate >= TIMESTAMP '1999-01-01')
    GROUP BY c_mktsegment
    """,
    doc="TPC-H Q22 shape: customers above the positive-average balance "
    "(exact cross-multiplied threshold) with no RECENT orders (every "
    "synthetic customer has some order, so idleness = lapsed since "
    "1999), per market segment — scalar-agg broadcast + anti-join.",
)
def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    pos = c.filter(F.col("c_acctbal") > 0).agg(
        F.count(F.lit(1)).alias("n_pos"),
        F.sum(_dec("c_acctbal")).alias("sum_pos"),
    )
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp")
    ).select("o_custkey")
    return (
        c.crossJoin(F.broadcast(pos))
        .filter(_dec("c_acctbal") * F.col("n_pos") > F.col("sum_pos"))
        .join(o, c["c_custkey"] == o["o_custkey"], "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(_dec("c_acctbal")).cast("double").alias("totacctbal"),
        )
    )


# ---------------------------------------------------------------------------
# Q11 shape: important parts by value share — per-part value vs a scalar
# fraction of the total (HAVING against a scalar subquery; restated as
# exact cross-multiplication part_value * 1000 > total_value).
# ---------------------------------------------------------------------------
@register(
    "q11_important_parts",
    sql="""
    WITH val AS (
      SELECT l_partkey,
             SUM(CAST(l_extendedprice * l_quantity AS DECIMAL(18,2))) AS part_value
      FROM lineitem GROUP BY l_partkey),
    tot AS (SELECT SUM(part_value) AS total_value FROM val)
    SELECT l_partkey AS p_partkey,
           CAST(part_value AS DOUBLE) AS part_value
    FROM val, tot
    WHERE part_value * 1500 > total_value
    """,
    doc="TPC-H Q11 shape: parts above 1/1500 of total inventory value "
    "(group-by + HAVING vs scalar subquery, cross-multiplied exact).",
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    val = l.groupBy("l_partkey").agg(
        F.sum(_dec(F.col("l_extendedprice") * F.col("l_quantity"))).alias(
            "part_value"
        )
    )
    tot = val.agg(F.sum("part_value").alias("total_value"))
    return (
        val.crossJoin(F.broadcast(tot))
        .filter(F.col("part_value") * 1500 > F.col("total_value"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.col("part_value").cast("double").alias("part_value"),
        )
    )
