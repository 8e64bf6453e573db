"""Layer-A operator catalog: the reference's compute surface (scalar parse
functions F1-F5, dedup/upsert semantics, URL generation) re-expressed over
the synthetic tables, plus the full relational surface the reference lacks
(joins, aggs, windows, sorts, set ops — SURVEY.md §2.4-2.8, all native
Spark).

Scale notes are attached per query: each one states why the plan survives
a 1000-executor / 100 TB run (broadcast choice, shuffle keys, pushdown).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from dsacord_spark.functions.parsing import (
    parse_array_field,
    parse_bool,
    parse_time,
    platform_uid_parts,
    url_for_day,
)
from dsacord_spark.plans.registry import register, table

_D = "decimal(18,2)"


def _dec(c) -> F.Column:
    return (F.col(c) if isinstance(c, str) else c).cast(_D)


def _dsum(c) -> F.Column:
    """Decimal-exact sum, cast to double AT THE OUTPUT BOUNDARY.

    Internally decimal (summation-order independent — the right call
    under AQE); the final cast makes the fetched pandas dtype float64 on
    BOTH engines (DuckDB returns SUM(DECIMAL) as DECIMAL(38,2) which
    pandas fetches as float64, while Spark's Decimal fetches as
    object(Decimal) — equal values, different dtypes, diverging under
    any dtype-sensitive hash; root-caused in VERDICT.md round 1). The
    decimal→double conversion is correctly rounded in both engines
    (unscaled value < 2^53), so the doubles are bit-identical."""
    return F.sum(_dec(c)).cast("double")


def _ts_str(c) -> F.Column:
    return F.date_format(c, "yyyy-MM-dd HH:mm:ss")


# ---------------------------------------------------------------------------
# Flagship aggregation (SURVEY §2.5 A3): TPC-H-Q1-style pricing summary.
# Scale: single shuffle on two low-cardinality keys; partial aggregation is
# map-side (Catalyst HashAggregate partial+final); parquet scan prunes to 7
# columns and pushes the l_shipdate filter down.
# ---------------------------------------------------------------------------
@register(
    "pricing_summary",
    sql="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
               * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
           CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS DOUBLE) AS avg_qty,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="Hash aggregation with decimal-exact sums (SURVEY §2.5).",
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dsum("l_quantity").alias("sum_qty"),
            _dsum("l_extendedprice").alias("sum_base_price"),
            F.sum(_dec("l_extendedprice") * (F.lit(1).cast(_D) - _dec("l_discount")))
            .cast("double")
            .alias("sum_disc_price"),
            (F.sum(_dec("l_quantity")).cast("double") / F.count(F.lit(1))).cast("double").alias(
                "avg_qty"
            ),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# F1 parseTime (utils.go:193-202) exercised through the oracle: synthesize
# good/empty/garbage/wrong-layout inputs from events deterministically.
# ---------------------------------------------------------------------------
@register(
    "f1_parse_time",
    sql="""
    WITH raw AS (
      SELECT event_id,
             CASE event_id % 4
               WHEN 0 THEN strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S')
               WHEN 1 THEN ''
               WHEN 2 THEN 'not a time'
               ELSE strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d')
             END AS s
      FROM events
    )
    SELECT event_id, s AS raw_value,
           strftime(try_strptime(s, '%Y-%m-%d %H:%M:%S'), '%Y-%m-%d %H:%M:%S') AS parsed
    FROM raw
    """,
    doc="F1: `yyyy-MM-dd HH:mm:ss` else NULL (utils.go:193-202).",
)
def f1_parse_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    s = (
        F.when(F.col("event_id") % 4 == 0, F.date_format("ts", "yyyy-MM-dd HH:mm:ss"))
        .when(F.col("event_id") % 4 == 1, F.lit(""))
        .when(F.col("event_id") % 4 == 2, F.lit("not a time"))
        .otherwise(F.date_format("ts", "yyyy-MM-dd"))
    )
    return e.select(
        "event_id",
        s.alias("raw_value"),
        _ts_str(parse_time(s)).alias("parsed"),
    )


# ---------------------------------------------------------------------------
# F2 parseArrayField (utils.go:248-261): JSON array else singleton fallback.
# ---------------------------------------------------------------------------
@register(
    "f2_parse_array",
    sql="""
    WITH raw AS (
      SELECT doc_id,
             CASE doc_id % 5
               WHEN 0 THEN '["VISIBILITY_REMOVED","VISIBILITY_OTHER"]'
               WHEN 1 THEN ''
               WHEN 2 THEN 'bare-token'
               WHEN 3 THEN 'two bare tokens'
               ELSE '["' || source || '"]'
             END AS s
      FROM documents
    )
    SELECT doc_id, s AS raw_value,
           CASE WHEN s = '' THEN NULL
                ELSE array_to_string(
                  COALESCE(TRY_CAST(TRY_CAST(s AS JSON) AS VARCHAR[]), [s]), '|')
           END AS parsed_joined
    FROM raw
    """,
    doc="F2: empty->NULL, JSON array, else singleton of raw (utils.go:248-261).",
)
def f2_parse_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    s = (
        F.when(F.col("doc_id") % 5 == 0, F.lit('["VISIBILITY_REMOVED","VISIBILITY_OTHER"]'))
        .when(F.col("doc_id") % 5 == 1, F.lit(""))
        .when(F.col("doc_id") % 5 == 2, F.lit("bare-token"))
        # NOTE: '["A",]' (trailing comma) is deliberately NOT exercised via
        # the oracle: DuckDB's JSON parser is lenient and accepts it, while
        # Spark's from_json and the reference's json.Unmarshal both reject
        # it (singleton fallback). That corner is pinned by
        # tests/test_parsing.py::test_parse_array_fallback_singleton.
        .when(F.col("doc_id") % 5 == 3, F.lit("two bare tokens"))
        .otherwise(F.concat(F.lit('["'), F.col("source"), F.lit('"]')))
    )
    return d.select(
        "doc_id",
        s.alias("raw_value"),
        F.array_join(parse_array_field(s), "|").alias("parsed_joined"),
    )


# ---------------------------------------------------------------------------
# F3 parseBool (utils.go:263-272): case-insensitive yes/no tri-state.
# ---------------------------------------------------------------------------
@register(
    "f3_parse_bool",
    sql="""
    WITH raw AS (
      SELECT event_id,
             CASE event_id % 6
               WHEN 0 THEN 'Yes' WHEN 1 THEN 'no' WHEN 2 THEN 'NO'
               WHEN 3 THEN '' WHEN 4 THEN 'maybe' ELSE 'YES'
             END AS s
      FROM events
    )
    SELECT event_id, s AS raw_value,
           CASE WHEN lower(s) = 'yes' THEN TRUE
                WHEN lower(s) = 'no' THEN FALSE
                ELSE NULL END AS parsed
    FROM raw
    """,
    doc="F3: yes/no else NULL (utils.go:263-272).",
)
def f3_parse_bool(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    s = (
        F.when(F.col("event_id") % 6 == 0, F.lit("Yes"))
        .when(F.col("event_id") % 6 == 1, F.lit("no"))
        .when(F.col("event_id") % 6 == 2, F.lit("NO"))
        .when(F.col("event_id") % 6 == 3, F.lit(""))
        .when(F.col("event_id") % 6 == 4, F.lit("maybe"))
        .otherwise(F.lit("YES"))
    )
    return e.select("event_id", s.alias("raw_value"), parse_bool(s).alias("parsed"))


# ---------------------------------------------------------------------------
# F4+F5 platform_uid decode (utils.go:274-297): snowflake>>22 + Discord
# epoch; malformed variants included. Snowflakes are synthesized in a
# realistic range from user_id.
# ---------------------------------------------------------------------------
@register(
    "f4_f5_platform_uid",
    sql="""
    WITH raw AS (
      SELECT event_id,
             CASE event_id % 5
               WHEN 4 THEN 'abc-' || CAST(user_id AS VARCHAR) || '-user'
               WHEN 3 THEN CAST(user_id AS VARCHAR) || '-message'
               ELSE CAST(1175882496000000000 + event_id * 4194304 AS VARCHAR)
                    || '-' || CAST(user_id AS VARCHAR)
                    || '-' || (CASE event_id % 3 WHEN 0 THEN 'user' WHEN 1 THEN 'message' ELSE 'server' END)
             END AS uid
      FROM events
    ),
    parts AS (SELECT event_id, uid, string_split(uid, '-') AS p FROM raw)
    SELECT event_id, uid AS platform_uid,
           CASE WHEN len(p) >= 3 THEN
             strftime(epoch_ms((TRY_CAST(p[1] AS BIGINT) >> 22) + 1420070400000),
                      '%Y-%m-%d %H:%M:%S')
           END AS snowflake_time,
           CASE WHEN len(p) >= 3 THEN p[2] ELSE '' END AS entity_id,
           CASE WHEN len(p) >= 3 THEN p[3] ELSE '' END AS entity_type
    FROM parts
    """,
    doc="F4/F5: platform_uid -> (snowflake_time, entity_id, entity_type), utils.go:274-297.",
)
def f4_f5_platform_uid(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    sf = (F.lit(1175882496000000000) + F.col("event_id") * 4194304).cast("string")
    etype = (
        F.when(F.col("event_id") % 3 == 0, F.lit("user"))
        .when(F.col("event_id") % 3 == 1, F.lit("message"))
        .otherwise(F.lit("server"))
    )
    uid = (
        F.when(
            F.col("event_id") % 5 == 4,
            F.concat(F.lit("abc-"), F.col("user_id").cast("string"), F.lit("-user")),
        )
        .when(
            F.col("event_id") % 5 == 3,
            F.concat(F.col("user_id").cast("string"), F.lit("-message")),
        )
        .otherwise(
            F.concat(sf, F.lit("-"), F.col("user_id").cast("string"), F.lit("-"), etype)
        )
    )
    parts = platform_uid_parts(uid)
    return e.select(
        "event_id",
        uid.alias("platform_uid"),
        _ts_str(parts["snowflake_time"]).alias("snowflake_time"),
        parts["entity_id"].alias("entity_id"),
        parts["entity_type"].alias("entity_type"),
    )


# ---------------------------------------------------------------------------
# S1 URL generation (main.go:146-154): date range -> daily dump URLs.
# ---------------------------------------------------------------------------
@register(
    "s1_url_generation",
    sql="""
    SELECT strftime(d, '%Y-%m-%d') AS day,
           'https://dsa-sor-data-dumps.s3.eu-central-1.amazonaws.com/sor-discord-netherlands-bv-'
             || strftime(d, '%Y-%m-%d') || '-full.zip' AS url
    FROM (SELECT unnest(generate_series(DATE '2024-12-28', DATE '2025-01-10', INTERVAL 1 DAY)) AS d)
    """,
    doc="S1: one URL per day in [from, to] (main.go:146-154).",
)
def s1_url_generation(spark: SparkSession, sf_dir: str) -> DataFrame:
    days = spark.sql(
        "SELECT explode(sequence(DATE '2024-12-28', DATE '2025-01-10', interval 1 day)) AS d"
    )
    return days.select(
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        url_for_day(F.col("d")).alias("url"),
    )


# ---------------------------------------------------------------------------
# Dedup keep-latest (the window formulation of the reference's upsert
# UpdateAll semantics, utils.go:100-104 / SURVEY §2.6). Scale: one shuffle
# on the dedup key; AQE handles skewed keys; no driver collection.
# ---------------------------------------------------------------------------
@register(
    "dedup_keep_latest",
    sql="""
    SELECT event_id, user_id, event_type,
           strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS ts_str, value
    FROM events
    QUALIFY row_number() OVER (
      PARTITION BY user_id, event_type ORDER BY ts DESC, event_id DESC) = 1
    """,
    doc="row_number keep-latest per key — upsert UpdateAll semantics (utils.go:100-104).",
)
def dedup_keep_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    # order on the full-precision nanos long so ties resolve exactly as the
    # oracle's TIMESTAMP_NS ordering does
    w = W.partitionBy("user_id", "event_type").orderBy(
        F.col("ts_ns").desc(), F.col("event_id").desc()
    )
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "event_id",
            "user_id",
            "event_type",
            _ts_str(F.col("ts")).alias("ts_str"),
            "value",
        )
    )


# ---------------------------------------------------------------------------
# P3 quarantine split (SURVEY §2.2 P3 / quirk Q5): empty-key rows are
# quarantined instead of crashing the sink.
# ---------------------------------------------------------------------------
@register(
    "quarantine_split",
    sql="""
    WITH tagged AS (
      SELECT CASE WHEN o_orderkey % 97 = 0 THEN '' ELSE CAST(o_orderkey AS VARCHAR) END AS uuid
      FROM orders
    )
    SELECT CASE WHEN uuid = '' THEN 'quarantine' ELSE 'valid' END AS split,
           COUNT(*) AS n
    FROM tagged GROUP BY 1
    """,
    doc="Q5: empty-uuid rows split to quarantine (utils.go:176-178).",
)
def quarantine_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    uuid = F.when(F.col("o_orderkey") % 97 == 0, F.lit("")).otherwise(
        F.col("o_orderkey").cast("string")
    )
    return (
        o.select(uuid.alias("uuid"))
        .select(
            F.when(F.col("uuid") == "", F.lit("quarantine")).otherwise(F.lit("valid")).alias("split")
        )
        .groupBy("split")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# ---------------------------------------------------------------------------
# Joins (SURVEY §2.4 — ABSENT in reference; full native surface here).
# Scale: dims (nation/region) are broadcast — no shuffle of the fact side;
# customer/orders equi-join shuffles on the join key with AQE skew handling.
# ---------------------------------------------------------------------------
@register(
    "join_equi_agg",
    sql="""
    SELECT n_name,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
    doc="Equi-join chain + agg; nation broadcast (SURVEY §2.4).",
)
def join_equi_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            _dsum("o_totalprice").alias("revenue"),
        )
    )


@register(
    "join_broadcast_dims",
    sql="""
    SELECT s_suppkey, s_name, n_name, r_name
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    """,
    doc="Broadcast dimension joins: no fact-side shuffle at any scale.",
)
def join_broadcast_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", "s_name", "n_name", "r_name")
    )


@register(
    "join_anti",
    sql="""
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > 200000)
    """,
    doc="Left-anti join — the reference's 'insert only new uuids' shape (main.go:194-204).",
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 200000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@register(
    "join_semi",
    sql="""
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
    """,
    doc="Left-semi join (EXISTS).",
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


# ---------------------------------------------------------------------------
# Aggregation variants (SURVEY §2.5): distinct, approx, cube.
# ---------------------------------------------------------------------------
@register(
    "agg_distinct",
    sql="""
    SELECT o_orderstatus,
           COUNT(*) AS n_orders,
           COUNT(DISTINCT o_custkey) AS n_customers,
           MIN(o_totalprice) AS min_price,
           MAX(o_totalprice) AS max_price
    FROM orders GROUP BY o_orderstatus
    """,
    doc="Distinct aggregation (Catalyst expand+two-phase); min/max raw doubles are arithmetic-free.",
)
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.count_distinct(F.col("o_custkey")).alias("n_customers"),
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
    )


@register(
    "agg_cube",
    sql="""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    doc="CUBE grouping sets (SURVEY §2.5 A3).",
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        _dsum("o_totalprice").alias("sum_price"),
    )


# ---------------------------------------------------------------------------
# Sorts / top-k (SURVEY §2.7): Spark plans TakeOrderedAndProject — no full
# sort at scale, each partition keeps k rows then the driver merges k*p.
# ---------------------------------------------------------------------------
@register(
    "sort_topk",
    sql="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
    """,
    doc="Top-k via orderBy+limit (TakeOrderedAndProject).",
)
def sort_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Set operations (SURVEY §2.8).
# ---------------------------------------------------------------------------
@register(
    "set_intersect",
    sql="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
    doc="INTERSECT: customers with both open and finished orders.",
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    b = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return a.intersect(b)


@register(
    "set_except",
    sql="""
    SELECT c_custkey FROM customer
    EXCEPT
    SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
    doc="EXCEPT: the set-op formulation of the anti join.",
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer").select("c_custkey")
    o = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return c.subtract(o)  # EXCEPT DISTINCT


@register(
    "set_union",
    sql="""
    SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_totalprice > 400000
    UNION
    SELECT c_custkey AS custkey FROM customer WHERE c_acctbal < 0
    """,
    doc="UNION DISTINCT across two derived sets.",
)
def set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    a = o.filter(F.col("o_totalprice") > 400000).select(F.col("o_custkey").alias("custkey"))
    b = c.filter(F.col("c_acctbal") < 0).select(F.col("c_custkey").alias("custkey"))
    return a.union(b).distinct()


# ---------------------------------------------------------------------------
# Window functions (SURVEY §2.6): ranking + running frame.
# ---------------------------------------------------------------------------
@register(
    "window_rank_topn",
    sql="""
    SELECT c_nationkey, c_custkey, c_acctbal, rn FROM (
      SELECT c_nationkey, c_custkey, c_acctbal,
             row_number() OVER (PARTITION BY c_nationkey
                                ORDER BY c_acctbal DESC, c_custkey ASC) AS rn
      FROM customer)
    WHERE rn <= 3
    """,
    doc="Per-group top-N by row_number.",
)
def window_rank_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    w = W.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey").asc())
    return (
        c.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("c_nationkey", "c_custkey", "c_acctbal", "rn")
    )


@register(
    "window_running_sum",
    sql="""
    SELECT event_id, user_id,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
             PARTITION BY user_id ORDER BY ts ASC, event_id ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value
    FROM events
    """,
    doc="Running decimal sum per user (frame = unbounded preceding..current).",
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy(F.col("ts_ns").asc(), F.col("event_id").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        F.sum(_dec("value")).over(w).cast("double").alias("running_value"),
    )


@register(
    "window_lag_lead",
    sql="""
    SELECT event_id, user_id,
           strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS ts_str,
           epoch_us(ts) - lag(epoch_us(ts)) OVER (
             PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS gap_us
    FROM events
    """,
    doc="lag(): per-user inter-event gap in microseconds (exact in both engines).",
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.col("ts_ns").asc(), F.col("event_id").asc())
    gap = F.col("ts_us") - F.lag("ts_us").over(w)
    return e.select(
        "event_id",
        "user_id",
        _ts_str(F.col("ts")).alias("ts_str"),
        gap.alias("gap_us"),
    )


# ---------------------------------------------------------------------------
# Tumbling time window (SURVEY §2.10, batch formulation of the streaming
# windowed agg; streaming wiring lives in dsacord_spark/streaming/).
# ---------------------------------------------------------------------------
@register(
    "window_tumbling_hour",
    sql="""
    SELECT strftime(time_bucket(INTERVAL 1 HOUR, CAST(ts AS TIMESTAMP)),
                    '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events GROUP BY 1, 2
    """,
    doc="Tumbling 1h window counts per event_type (epoch-aligned both engines).",
)
def window_tumbling_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            _dsum("value").alias("sum_value"),
        )
        .select(
            _ts_str(F.col("w.start")).alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


# ---------------------------------------------------------------------------
# Session windows (gaps-and-islands oracle; Spark uses native
# session_window in streaming — batch formulation here mirrors the SQL).
# ---------------------------------------------------------------------------
@register(
    "session_windows",
    sql="""
    WITH gaps AS (
      SELECT event_id, user_id, ts, value,
             CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                       OR epoch_us(ts) - lag(epoch_us(ts)) OVER (
                            PARTITION BY user_id ORDER BY ts, event_id) >= 14400000000
                  THEN 1 ELSE 0 END AS new_session
      FROM events),
    sess AS (
      SELECT user_id, ts, value,
             CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
      FROM gaps)
    SELECT user_id, session_id,
           strftime(min(CAST(ts AS TIMESTAMP)), '%Y-%m-%d %H:%M:%S') AS session_start,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM sess GROUP BY user_id, session_id
    """,
    doc="Sessionization (4h inactivity gap) — session_window semantics (SURVEY §2.10).",
)
def session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.col("ts_ns").asc(), F.col("event_id").asc())
    prev_us = F.lag("ts_us").over(w)
    new_session = F.when(
        prev_us.isNull() | ((F.col("ts_us") - prev_us) >= 14400000000),
        F.lit(1),
    ).otherwise(F.lit(0))
    wrun = W.partitionBy("user_id").orderBy(
        F.col("ts_ns").asc(), F.col("event_id").asc()
    ).rowsBetween(W.unboundedPreceding, W.currentRow)
    return (
        e.withColumn("new_session", new_session)
        .withColumn("session_id", F.sum("new_session").over(wrun))
        .groupBy("user_id", "session_id")
        .agg(
            _ts_str(F.min("ts")).alias("session_start"),
            F.count(F.lit(1)).alias("n_events"),
            _dsum("value").alias("sum_value"),
        )
    )


# ---------------------------------------------------------------------------
# F8 JSON parsing generalized to events.props (SURVEY §2.3 F8).
# ---------------------------------------------------------------------------
@register(
    "json_props_agg",
    sql="""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           MAX(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
    FROM events GROUP BY event_type
    """,
    doc="F8: JSON field extraction + aggregation over events.props.",
)
def json_props_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").try_cast("bigint")
    return e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(k).alias("sum_k"),
        F.max(k).alias("max_k"),
    )


# ---------------------------------------------------------------------------
# Pivot (reshaping surface; oracle via conditional aggregation).
# ---------------------------------------------------------------------------
@register(
    "pivot_status",
    sql="""
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS qty_open,
           CAST(SUM(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS qty_finished
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="Pivot on l_linestatus (conditional-agg oracle).",
)
def pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.sum(F.when(F.col("l_linestatus") == "O", _dec("l_quantity")))
        .cast("double")
        .alias("qty_open"),
        F.sum(F.when(F.col("l_linestatus") == "F", _dec("l_quantity")))
        .cast("double")
        .alias("qty_finished"),
    )


# ---------------------------------------------------------------------------
# P1 — the full wide typed transform (utils.go:184-247) exercised through
# the oracle: wire-shaped string columns are synthesized from `orders`,
# run through decisions_transform (which also fills the MISSING wire
# columns with NULL — the header-guard path), and projected back to
# comparable scalars.
# ---------------------------------------------------------------------------
@register(
    "decisions_wide_transform",
    sql="""
    WITH wire AS (
      SELECT CAST(o_orderkey AS VARCHAR) AS uuid,
             CASE o_orderkey % 3
               WHEN 0 THEN '["VIS_REMOVED","VIS_OTHER"]'
               WHEN 1 THEN '' ELSE 'bare' END AS decision_visibility,
             CASE o_orderkey % 2 WHEN 0
               THEN strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') ELSE 'nope' END AS content_date,
             CASE o_orderkey % 4 WHEN 0 THEN 'Yes' WHEN 1 THEN 'NO'
               WHEN 2 THEN '' ELSE 'maybe' END AS automated_detection,
             CASE o_orderkey % 5 WHEN 4 THEN 'zz-7-user'
               ELSE CAST(1175882496000000000 + o_orderkey * 4194304 AS VARCHAR)
                    || '-' || CAST(o_custkey AS VARCHAR) || '-message' END AS platform_uid,
             strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS created_at
      FROM orders),
    parts AS (SELECT *, string_split(platform_uid, '-') AS p FROM wire)
    SELECT uuid,
           CASE WHEN decision_visibility = '' THEN NULL
                ELSE array_to_string(
                  COALESCE(TRY_CAST(TRY_CAST(decision_visibility AS JSON) AS VARCHAR[]),
                           [decision_visibility]), '|')
           END AS visibility_joined,
           strftime(try_strptime(content_date, '%Y-%m-%d %H:%M:%S'),
                    '%Y-%m-%d %H:%M:%S') AS content_date_parsed,
           CASE WHEN lower(automated_detection) = 'yes' THEN TRUE
                WHEN lower(automated_detection) = 'no' THEN FALSE END AS automated_detection,
           CASE WHEN len(p) >= 3 THEN
             strftime(epoch_ms((TRY_CAST(p[1] AS BIGINT) >> 22) + 1420070400000),
                      '%Y-%m-%d %H:%M:%S') END AS snowflake_time,
           CASE WHEN len(p) >= 3 THEN p[2] ELSE '' END AS entity_id,
           CASE WHEN len(p) >= 3 THEN p[3] ELSE '' END AS entity_type,
           strftime(try_strptime(created_at, '%Y-%m-%d %H:%M:%S'),
                    '%Y-%m-%d %H:%M:%S') AS created_at_parsed,
           CAST(NULL AS VARCHAR) AS category,
           CAST(NULL AS BOOLEAN) AS incompatible_content_illegal
    FROM parts
    """,
    doc="P1: full 36->40 wide transform incl. missing-column guard (utils.go:184-247).",
)
def decisions_wide_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dsacord_spark.transform import decisions_transform

    o = table(spark, sf_dir, "orders")
    key = F.col("o_orderkey")
    wire = o.select(
        key.cast("string").alias("uuid"),
        F.when(key % 3 == 0, F.lit('["VIS_REMOVED","VIS_OTHER"]'))
        .when(key % 3 == 1, F.lit(""))
        .otherwise(F.lit("bare"))
        .alias("decision_visibility"),
        F.when(key % 2 == 0, F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss"))
        .otherwise(F.lit("nope"))
        .alias("content_date"),
        F.when(key % 4 == 0, F.lit("Yes"))
        .when(key % 4 == 1, F.lit("NO"))
        .when(key % 4 == 2, F.lit(""))
        .otherwise(F.lit("maybe"))
        .alias("automated_detection"),
        F.when(key % 5 == 4, F.lit("zz-7-user"))
        .otherwise(
            F.concat(
                (F.lit(1175882496000000000) + key * 4194304).cast("string"),
                F.lit("-"),
                F.col("o_custkey").cast("string"),
                F.lit("-message"),
            )
        )
        .alias("platform_uid"),
        F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss").alias("created_at"),
    )
    typed = decisions_transform(wire)  # remaining 30 wire columns: missing->NULL
    return typed.select(
        "uuid",
        F.array_join("decision_visibility", "|").alias("visibility_joined"),
        _ts_str(F.col("content_date")).alias("content_date_parsed"),
        "automated_detection",
        _ts_str(F.col("snowflake_time")).alias("snowflake_time"),
        "entity_id",
        "entity_type",
        _ts_str(F.col("created_at")).alias("created_at_parsed"),
        "category",  # proves the missing-column guard fills NULL
        "incompatible_content_illegal",  # Q4: always NULL
    )


# ---------------------------------------------------------------------------
# F7/F9 incidental string/math surface (utils.go: lower/split/trim, shift).
# ---------------------------------------------------------------------------
@register(
    "scalar_string_math",
    sql="""
    SELECT p_partkey,
           lower(p_name) AS name_lower,
           string_split(p_type, ' ')[1] AS type_head,
           trim(p_brand) AS brand_trim,
           p_partkey >> 2 AS key_shifted,
           length(p_name) AS name_len
    FROM part
    """,
    doc="F7/F9: lower/split/trim/shiftright/length as pure column exprs.",
)
def scalar_string_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.lower("p_name").alias("name_lower"),
        F.split(F.col("p_type"), " ").getItem(0).alias("type_head"),
        F.trim(F.col("p_brand")).alias("brand_trim"),
        F.shiftright(F.col("p_partkey"), 2).alias("key_shifted"),
        F.length("p_name").alias("name_len"),
    )


# ---------------------------------------------------------------------------
# F8 generalized to MapType (SURVEY §2.3 F8 "target generalizes to
# events.props map parsing"): from_json to map<string,bigint>, explode the
# entries, aggregate per key — schema-free property bags, the idiom for
# sparse event attributes at scale (vs one column per property).
# ---------------------------------------------------------------------------
@register(
    "json_map_explode",
    sql="""
    SELECT event_type, k AS prop_key, COUNT(*) AS n,
           CAST(SUM(CAST(json_extract(props, '$.' || k) AS BIGINT)) AS BIGINT) AS sum_v
    FROM (SELECT event_type, props, unnest(json_keys(props)) AS k FROM events)
    GROUP BY 1, 2
    """,
    doc="F8 map generalization: from_json(map<string,bigint>) + explode + per-key agg.",
)
def json_map_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,bigint>")
    return (
        e.select("event_type", F.explode(m).alias("prop_key", "prop_val"))
        .groupBy("event_type", "prop_key")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("prop_val").alias("sum_v"))
    )


# ---------------------------------------------------------------------------
# Unpivot / melt (reshaping surface, §2 set-ops/reshape family): wide
# measure columns -> long (measure, value) rows. Narrow map-side op, no
# shuffle; the DuckDB oracle uses native UNPIVOT.
# ---------------------------------------------------------------------------
@register(
    "unpivot_measures",
    sql="""
    WITH m AS (SELECT l_orderkey, l_linenumber,
        CAST(l_quantity AS DECIMAL(18,2)) AS l_quantity,
        CAST(l_extendedprice AS DECIMAL(18,2)) AS l_extendedprice,
        CAST(l_discount AS DECIMAL(18,2)) AS l_discount FROM lineitem)
    SELECT l_orderkey, l_linenumber, measure, CAST(val AS DOUBLE) AS val
    FROM (UNPIVOT m ON l_quantity, l_extendedprice, l_discount
          INTO NAME measure VALUE val)
    """,
    doc="Unpivot three lineitem measures to long form (melt).",
)
def unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        _dec("l_quantity").alias("l_quantity"),
        _dec("l_extendedprice").alias("l_extendedprice"),
        _dec("l_discount").alias("l_discount"),
    )
    return l.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_extendedprice", "l_discount"],
        "measure",
        "val",
    ).withColumn("val", F.col("val").cast("double"))


# ---------------------------------------------------------------------------
# Subquery surface (SURVEY §3: the reference has no SQL at all; the target
# exposes Spark's full SQL front-end). The SAME ANSI text runs on Spark
# and DuckDB — the Spark side goes through spark.sql over temp views, so
# parsing, subquery decorrelation, and rewrite-to-join are Catalyst's.
# ---------------------------------------------------------------------------
_EXISTS_SQL = """
    SELECT c_custkey, c_name
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
"""


@register(
    "subquery_exists",
    sql=_EXISTS_SQL,
    doc="Correlated EXISTS subquery (Catalyst decorrelates to a semi-join); "
    "identical SQL text on both engines.",
)
def subquery_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_EXISTS_SQL)


_SCALAR_SQL = """
    SELECT o_orderpriority, COUNT(*) AS n
    FROM orders
    WHERE o_totalprice > (SELECT MAX(o_totalprice) / 2 FROM orders)
    GROUP BY o_orderpriority
"""


@register(
    "subquery_scalar",
    sql=_SCALAR_SQL,
    doc="Scalar subquery threshold (MAX/2: exact in binary floating point, "
    "so the predicate is engine-independent).",
)
def subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_SCALAR_SQL)


# ---------------------------------------------------------------------------
# Salted skew join (SURVEY §4.3 / the 100 TB contract: "skewed keys ->
# salting or AQE skew-join"). The technique made concrete: replicate the
# dim side across SALT shards, salt the fact side deterministically, join
# on (key, salt) — each hot key's rows spread over SALT reducers instead
# of one. Result is provably identical to the plain join (the oracle IS
# the plain join). AQE's skew-join handles mid-sized skew automatically;
# explicit salting is for keys too hot for partition splitting.
# ---------------------------------------------------------------------------
_SKEW_SALT = 8


@register(
    "join_skew_salted",
    sql="""
    SELECT o_orderpriority, COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o_orderpriority
    """,
    doc="Skew-resistant salted join: fact salted, dim replicated x8; "
    "oracle is the equivalent plain join.",
)
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    lf = l.withColumn(
        "__salt",
        F.pmod(F.hash("l_orderkey", "l_linenumber", "l_quantity"), F.lit(_SKEW_SALT)),
    )
    od = o.withColumn(
        "__salt", F.explode(F.array(*[F.lit(s) for s in range(_SKEW_SALT)]))
    )
    return (
        lf.join(od, (lf["l_orderkey"] == od["o_orderkey"]) & (lf["__salt"] == od["__salt"]))
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            _dsum("l_quantity").alias("sum_qty"),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q3-shaped headline: 3-table join chain with selective filters on
# both ends + decimal revenue agg + top-k. Catalyst broadcast-joins the
# filtered customer segment, pushes both date predicates into the parquet
# scans, and plans the top-10 as TakeOrderedAndProject.
# ---------------------------------------------------------------------------
@register(
    "shipping_priority",
    sql="""
    SELECT l.l_orderkey,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l.l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
           CAST(o.o_orderdate AS VARCHAR) AS o_orderdate
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < DATE '1995-03-15'
      AND l.l_shipdate > DATE '1995-03-15'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue DESC, l.l_orderkey ASC
    LIMIT 10
    """,
    doc="TPC-H Q3 shape: selective 3-table join -> revenue agg -> top-10.",
)
def shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < F.lit("1995-03-15").cast("date"))
    l = table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > F.lit("1995-03-15").cast("date"))
    revenue = _dec("l_extendedprice") * (
        F.lit(1) - F.col("l_discount")
    ).cast("decimal(4,2)")
    return (
        # no broadcast hint on customer: the segment filter keeps ~1/5 of
        # a user-population-sized table — a forced broadcast is an OOM
        # hazard at scale; AQE still auto-broadcasts it when it measures
        # small (it does at the test SFs)
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.col("o_orderdate").cast("string").alias("o_orderdate"),
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Table profiling (training-pipeline utility: one pass, one row, the
# null/distinct/extremes summary a data curator runs before training).
# Single aggregation -> map-side partials; no per-column scans.
# ---------------------------------------------------------------------------
@register(
    "profile_lineitem",
    sql="""
    SELECT COUNT(*) AS n_rows,
           COUNT(DISTINCT l_orderkey) AS n_orders,
           COUNT(DISTINCT l_returnflag) AS n_flags,
           CAST(SUM(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_shipdate,
           CAST(MIN(l_shipdate) AS VARCHAR) AS min_shipdate,
           CAST(MAX(l_shipdate) AS VARCHAR) AS max_shipdate,
           CAST(MIN(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS min_qty,
           CAST(MAX(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS max_qty
    FROM lineitem
    """,
    doc="One-pass column profile: counts, distincts, null counts, extremes.",
)
def profile_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    return l.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count_distinct(F.col("l_orderkey")).alias("n_orders"),
        F.count_distinct(F.col("l_returnflag")).alias("n_flags"),
        F.sum(F.when(F.col("l_shipdate").isNull(), 1).otherwise(0)).alias(
            "null_shipdate"
        ),
        F.min("l_shipdate").cast("string").alias("min_shipdate"),
        F.max("l_shipdate").cast("string").alias("max_shipdate"),
        F.min(_dec("l_quantity")).cast("double").alias("min_qty"),
        F.max(_dec("l_quantity")).cast("double").alias("max_qty"),
    )


# ---------------------------------------------------------------------------
# Skew diagnosis (the ops tool you run BEFORE picking a join/partition
# strategy at scale: per-key concentration of the join key, top hot keys,
# and the max/avg ratio that predicts straggler tasks). Two small aggs
# over one shuffle of the key column only.
# ---------------------------------------------------------------------------
@register(
    "skew_report_orders",
    sql="""
    WITH per_key AS (
      SELECT o_custkey AS key, COUNT(*) AS cnt FROM orders GROUP BY o_custkey),
    stats AS (
      SELECT COUNT(*) AS n_keys, CAST(SUM(cnt) AS BIGINT) AS n_rows, MAX(cnt) AS max_cnt,
             round(MAX(cnt) / (SUM(cnt) / CAST(COUNT(*) AS DOUBLE)), 4) AS skew_ratio
      FROM per_key),
    top AS (
      SELECT key, cnt,
             row_number() OVER (ORDER BY cnt DESC, key ASC) AS rk
      FROM per_key)
    SELECT s.n_keys, s.n_rows, s.max_cnt, s.skew_ratio, t.key AS hot_key, t.cnt AS hot_cnt, t.rk
    FROM stats s JOIN top t ON t.rk <= 5
    """,
    doc="Join-key skew report for orders.o_custkey: key count, hottest keys, "
    "max/avg concentration ratio (straggler predictor).",
)
def skew_report_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").select(F.col("o_custkey").alias("key"))
    per_key = o.groupBy("key").agg(F.count(F.lit(1)).alias("cnt"))
    stats = per_key.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("cnt").alias("n_rows"),
        F.max("cnt").alias("max_cnt"),
        F.round(
            F.max("cnt") / (F.sum("cnt") / F.count(F.lit(1)).cast("double")), 4
        ).alias("skew_ratio"),
    )
    # top-k FIRST (TakeOrderedAndProject — no global sort), then rank the
    # 5-row result; a bare row_number window over per_key would funnel
    # every key through one sorting task
    w = W.orderBy(F.col("cnt").desc(), F.col("key").asc())
    top = (
        per_key.orderBy(F.col("cnt").desc(), F.col("key").asc())
        .limit(5)
        .withColumn("rk", F.row_number().over(w))
    )
    return stats.crossJoin(top).select(
        "n_keys",
        "n_rows",
        "max_cnt",
        "skew_ratio",
        F.col("key").alias("hot_key"),
        F.col("cnt").alias("hot_cnt"),
        "rk",
    )


# ---------------------------------------------------------------------------
# Array / higher-order function surface made explicit (used internally by
# every dedup/similarity operator; exposed here as a user-facing query):
# sort, distinct, slice, element access, filter, transform+aggregate fold
# over the embedding arrays — all JVM-side, zero shuffle.
# ---------------------------------------------------------------------------
@register(
    "array_functions",
    sql="""
    SELECT vec_id,
           len(embedding) AS dim,
           round(CAST(embedding[1] AS DOUBLE), 6) AS first_v,
           round(CAST(list_max(embedding) AS DOUBLE), 6) AS max_v,
           len(list_filter(embedding, x -> x > 0)) AS n_pos,
           round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                   list_transform(embedding[1:8], x -> CAST(x AS DOUBLE))),
                 (acc, x) -> acc + x), 6) AS head_sum
    FROM embeddings
    """,
    doc="Array surface: size/index/max/filter-count/sliced fold over "
    "array<float>, sequential double accumulation for parity.",
)
def array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings")
    emb = F.col("embedding")
    head = F.transform(F.slice(emb, 1, 8), lambda x: x.cast("double"))
    return e.select(
        "vec_id",
        F.size(emb).alias("dim"),
        F.round(emb.getItem(0).cast("double"), 6).alias("first_v"),
        F.round(F.array_max(emb).cast("double"), 6).alias("max_v"),
        F.size(F.filter(emb, lambda x: x > 0)).alias("n_pos"),
        F.round(
            F.aggregate(head, F.lit(0.0), lambda acc, x: acc + x), 6
        ).alias("head_sum"),
    )


# ---------------------------------------------------------------------------
# Date/interval arithmetic surface (F6-adjacent): truncation, component
# extraction, day arithmetic, date differences — per-row projections the
# scan absorbs.
# ---------------------------------------------------------------------------
@register(
    "date_functions",
    sql="""
    SELECT o_orderkey,
           CAST(date_trunc('month', o_orderdate) AS VARCHAR) AS order_month,
           CAST(EXTRACT(year FROM o_orderdate) AS INT) AS order_year,
           CAST(EXTRACT(dow FROM o_orderdate) AS INT) AS order_dow,
           CAST(CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS VARCHAR) AS due_date,
           datediff('day', DATE '1995-01-01', o_orderdate) AS days_since_95
    FROM orders
    """,
    doc="Date functions: trunc, extract, interval add, datediff "
    "(DuckDB dow == Spark dayofweek-1).",
)
def date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.date_trunc("month", d).cast("date").cast("string").alias("order_month"),
        F.year(d).alias("order_year"),
        (F.dayofweek(d) - F.lit(1)).alias("order_dow"),
        F.date_add(d, 30).cast("string").alias("due_date"),
        F.datediff(d, F.lit("1995-01-01").cast("date")).alias("days_since_95"),
    )
