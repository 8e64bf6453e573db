"""Advanced relational operators (as-of join, range join, grouping sets,
rollup, percentiles, range window frames) and the multimodal plumbing
queries. Fills out the SURVEY §2.4-2.7 matrix beyond the basics."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from dsacord_spark.plans.registry import register, table

_D = "decimal(18,2)"


def _dec(c) -> F.Column:
    return (F.col(c) if isinstance(c, str) else c).cast(_D)


def _ts_str(c) -> F.Column:
    return F.date_format(c, "yyyy-MM-dd HH:mm:ss")


# ---------------------------------------------------------------------------
# As-of join (SURVEY §2.4 "range/as-of"): for each lineitem shipment, the
# most recent reference rate at or before the ship date. Spark has no
# native ASOF JOIN. The naive composition (inequality join + keep-latest
# window) explodes: every fact row matches every earlier rate, so 600k
# facts x 1.5k rates -> ~400M intermediate rows and a shuffle over them
# (measured 490s at sf0.1). Because the as-of key is discretizable (a
# date), the scale-correct plan is:
#   1. forward-fill the small rate table onto a dense daily calendar
#      (window over ~thousands of rows — stays driver-small forever),
#   2. broadcast EQUI-join the calendar to the fact table on the exact
#      date: hash join, exactly one match per fact row, zero explosion,
#      zero shuffle of the big side.  (measured 1.5s at sf0.1 — 300x)
# For a continuous as-of key or a big-big as-of, the fallback is
# union-both-sides + last_value(ignorenulls) over a range-partitioned
# time order with per-partition boundary carry-over.
# ---------------------------------------------------------------------------
@register(
    "join_asof_rates",
    sql="""
    WITH rates AS (
      SELECT o_orderdate AS rate_date, MIN(o_totalprice) AS rate
      FROM orders WHERE o_orderkey % 97 = 0 GROUP BY o_orderdate)
    SELECT l.l_orderkey, l.l_linenumber,
           strftime(l.l_shipdate, '%Y-%m-%d %H:%M:%S') AS ship_ts,
           strftime(r.rate_date, '%Y-%m-%d %H:%M:%S') AS rate_ts,
           r.rate
    FROM lineitem l ASOF JOIN rates r ON r.rate_date <= l.l_shipdate
    """,
    doc="As-of join: inequality join + keep-latest window (DuckDB native ASOF oracle).",
)
def join_asof_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    rates = (
        o.filter(F.col("o_orderkey") % 97 == 0)
        .groupBy(F.col("o_orderdate").alias("rate_date"))
        .agg(F.min("o_totalprice").alias("rate"))
    )
    # Dense daily calendar spanning [first rate, last shipment], each day
    # forward-filled with the latest rate at-or-before it. The calendar is
    # O(days) rows, so the unpartitioned window is fine (it runs on the
    # broadcast-small side, never on the fact table).
    span = rates.agg(F.min("rate_date").alias("lo")).crossJoin(
        l.agg(F.max("l_shipdate").alias("hi"))
    )
    calendar = span.select(
        F.explode(F.sequence("lo", "hi", F.expr("interval 1 day"))).alias("day")
    )
    wff = W.orderBy("day").rowsBetween(W.unboundedPreceding, 0)
    filled = (
        calendar.join(rates, calendar["day"] == rates["rate_date"], "left")
        .select(
            "day",
            F.last("rate_date", ignorenulls=True).over(wff).alias("rate_date"),
            F.last("rate", ignorenulls=True).over(wff).alias("rate"),
        )
    )
    # Inner equi-join drops shipments before the first rate — identical to
    # DuckDB's (inner) ASOF JOIN semantics.
    return (
        l.join(F.broadcast(filled), l["l_shipdate"] == filled["day"], "inner")
        .select(
            "l_orderkey",
            "l_linenumber",
            _ts_str(F.col("l_shipdate")).alias("ship_ts"),
            _ts_str(F.col("rate_date")).alias("rate_ts"),
            "rate",
        )
    )


# ---------------------------------------------------------------------------
# Forward as-of join (the other lookup direction: the NEXT known rate at
# or after each shipment — "what price takes effect next"). Same
# calendar trick as join_asof_rates with the fill reversed: first
# non-null over [current, unbounded following] on the small side, then a
# broadcast equi-join; the fact table never shuffles or explodes. Inner
# join drops shipments after the last rate — DuckDB's inner ASOF
# semantics with the >= comparator.
# ---------------------------------------------------------------------------
@register(
    "join_asof_forward",
    sql="""
    WITH rates AS (
      SELECT o_orderdate AS rate_date, MIN(o_totalprice) AS rate
      FROM orders WHERE o_orderkey % 97 = 0 GROUP BY o_orderdate)
    SELECT l.l_orderkey, l.l_linenumber,
           strftime(l.l_shipdate, '%Y-%m-%d %H:%M:%S') AS ship_ts,
           strftime(r.rate_date, '%Y-%m-%d %H:%M:%S') AS rate_ts,
           r.rate
    FROM lineitem l ASOF JOIN rates r ON r.rate_date >= l.l_shipdate
    """,
    doc="Forward as-of join: next rate at-or-after each shipment "
    "(backward-filled calendar + broadcast equi-join; DuckDB native "
    "forward ASOF oracle).",
)
def join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    rates = (
        o.filter(F.col("o_orderkey") % 97 == 0)
        .groupBy(F.col("o_orderdate").alias("rate_date"))
        .agg(F.min("o_totalprice").alias("rate"))
    )
    span = l.agg(F.min("l_shipdate").alias("lo")).crossJoin(
        rates.agg(F.max("rate_date").alias("hi"))
    )
    # clamp: lo comes from lineitem, hi from rates — if every rate
    # predates every shipment, sequence(lo, hi) would throw where the
    # oracle's ASOF simply matches nothing; the 1-day degenerate
    # calendar carries no rate and the null-filter below yields empty
    calendar = span.select(
        F.explode(
            F.sequence("lo", F.greatest("hi", "lo"), F.expr("interval 1 day"))
        ).alias("day")
    )
    wbf = W.orderBy("day").rowsBetween(0, W.unboundedFollowing)
    filled = (
        calendar.join(rates, calendar["day"] == rates["rate_date"], "left")
        .select(
            "day",
            F.first("rate_date", ignorenulls=True).over(wbf).alias("rate_date"),
            F.first("rate", ignorenulls=True).over(wbf).alias("rate"),
        )
    )
    return (
        l.join(F.broadcast(filled), l["l_shipdate"] == filled["day"], "inner")
        .filter(F.col("rate_date").isNotNull())
        .select(
            "l_orderkey",
            "l_linenumber",
            _ts_str(F.col("l_shipdate")).alias("ship_ts"),
            _ts_str(F.col("rate_date")).alias("rate_ts"),
            "rate",
        )
    )


# ---------------------------------------------------------------------------
# Range (non-equi) join: bucket lineitems by quantity bands.
# ---------------------------------------------------------------------------
@register(
    "join_range_buckets",
    sql="""
    WITH buckets(lo, hi, band) AS (VALUES (0, 10, 'low'), (10, 25, 'mid'), (25, 100, 'high'))
    SELECT band, COUNT(*) AS n,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM lineitem JOIN buckets ON l_quantity >= lo AND l_quantity < hi
    GROUP BY band
    """,
    doc="Non-equi range join (broadcast nested loop on a literal bucket table).",
)
def join_range_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    # SQL VALUES -> LocalTableScan: createDataFrame from Python lists plans
    # as a Python-RDD scan (applySchemaToPythonRDD), which spins a Python
    # worker and blocks columnar execution just to emit 3 constant rows
    buckets = spark.sql(
        "SELECT * FROM VALUES (0, 10, 'low'), (10, 25, 'mid'), (25, 100, 'high')"
        " AS buckets(lo, hi, band)"
    )
    return (
        l.join(
            F.broadcast(buckets),
            (F.col("l_quantity") >= F.col("lo")) & (F.col("l_quantity") < F.col("hi")),
        )
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(_dec("l_extendedprice")).cast("double").alias("revenue"),
        )
    )


# ---------------------------------------------------------------------------
# Grouping sets / rollup (SURVEY §2.5 A3).
# ---------------------------------------------------------------------------
@register(
    "agg_grouping_sets",
    sql="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
           CAST(GROUPING(o_orderpriority) AS INT) AS g_priority,
           COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
    doc="GROUPING SETS with grouping() flags.",
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders_gs")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
               CAST(GROUPING(o_orderpriority) AS INT) AS g_priority,
               COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


@register(
    "agg_rollup",
    sql="""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    doc="ROLLUP hierarchy totals.",
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    return l.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
    )


# approx_count_distinct's raw estimate is engine-specific (HLL seeds
# differ), so the ESTIMATE can't be oracled — but the error CONTRACT can
# (r7 verdict #5): emit the exact count (SQL-exact) plus a within-bound
# boolean computed from the sketch; the DuckDB twin emits literal TRUE,
# so a sketch drifting out of bound hash-mismatches. The raw estimate's
# determinism is pinned in tests/test_catalog_oracle.py.
@register(
    "agg_approx_distinct",
    sql="""
    SELECT o_orderstatus,
           COUNT(DISTINCT o_custkey) AS exact_customers,
           TRUE AS est_within_5pct
    FROM orders GROUP BY o_orderstatus
    """,
    doc="approx_count_distinct (HLL, rsd=0.01) per status — structural "
    "value oracle: exact count + 5pct error-contract boolean.",
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    # rsd=0.01 (vs the 0.05 default): the contract asserts <=5% relative
    # error, and rsd is a standard deviation, not a bound — at sf0.01 the
    # default sketch missed by 5.7% on one group. A 1% rsd keeps the gate
    # at ~5 sigma for ~87KB of sketch per group.
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.approx_count_distinct("o_custkey", 0.01).alias("__approx"),
            F.count_distinct("o_custkey").alias("exact_customers"),
        )
        .select(
            "o_orderstatus",
            "exact_customers",
            (
                F.abs(F.col("__approx") - F.col("exact_customers"))
                <= 0.05 * F.col("exact_customers")
            ).alias("est_within_5pct"),
        )
    )


@register(
    "agg_approx_percentiles",
    # structural value oracle (r8, upgraded from rows-only): the sketch
    # value is engine-specific, but its RANK-ERROR contract is not —
    # approx_percentile(accuracy=10000) must land inside the exact
    # [p-0.01, p+0.01] quantile band (rank error <= 1e-4*n, so a 0.01
    # quantile band is ~100x slack). The oracle computes the exact
    # percentiles and emits TRUE for the band booleans; Spark computes
    # them from the real sketch. Raw sketch values pinned in pytest.
    sql="""
    SELECT o_orderstatus,
           round(quantile_cont(o_totalprice, 0.5), 4) AS exact_median,
           round(quantile_cont(o_totalprice, 0.9), 4) AS exact_p90,
           TRUE AS median_in_band, TRUE AS p90_in_band
    FROM orders GROUP BY o_orderstatus
    """,
    doc="approx_percentile (t-digest-style sketch, accuracy 10000) "
    "checked against the exact percentile per status via a rank-band "
    "contract. The sketch is the 100 TB path: exact percentile sorts "
    "every group, the sketch is one mergeable pass.",
)
def agg_approx_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    agg = o.groupBy("o_orderstatus").agg(
        F.approx_percentile(
            "o_totalprice", F.lit(0.5), F.lit(10000)
        ).alias("__approx_median"),
        F.approx_percentile(
            "o_totalprice", F.lit(0.9), F.lit(10000)
        ).alias("__approx_p90"),
        F.round(F.percentile("o_totalprice", F.lit(0.5)), 4).alias("exact_median"),
        F.round(F.percentile("o_totalprice", F.lit(0.9)), 4).alias("exact_p90"),
        F.percentile("o_totalprice", F.lit(0.49)).alias("__lo50"),
        F.percentile("o_totalprice", F.lit(0.51)).alias("__hi50"),
        F.percentile("o_totalprice", F.lit(0.89)).alias("__lo90"),
        F.percentile("o_totalprice", F.lit(0.91)).alias("__hi90"),
    )
    return agg.select(
        "o_orderstatus",
        "exact_median",
        "exact_p90",
        F.col("__approx_median").between(
            F.col("__lo50"), F.col("__hi50")
        ).alias("median_in_band"),
        F.col("__approx_p90").between(
            F.col("__lo90"), F.col("__hi90")
        ).alias("p90_in_band"),
    )


@register(
    "agg_percentiles",
    sql="""
    SELECT o_orderstatus,
           round(quantile_cont(o_totalprice, 0.5), 4) AS median_price,
           round(quantile_cont(o_totalprice, 0.9), 4) AS p90_price
    FROM orders GROUP BY o_orderstatus
    """,
    doc="Exact interpolated percentiles (Spark percentile == DuckDB quantile_cont).",
)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.round(F.percentile("o_totalprice", F.lit(0.5)), 4).alias("median_price"),
        F.round(F.percentile("o_totalprice", F.lit(0.9)), 4).alias("p90_price"),
    )


# ---------------------------------------------------------------------------
# RANGE window frame: trailing 1-hour sum per user (value-based frame on
# the microsecond epoch, identical in both engines).
# ---------------------------------------------------------------------------
@register(
    "window_range_frame",
    sql="""
    SELECT event_id, user_id,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
             PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS DOUBLE) AS trailing_1h_value
    FROM events
    """,
    doc="RANGE frame over event-time: trailing 1h per-user sum.",
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy(F.col("ts_us").asc())
        .rangeBetween(-3_600_000_000, 0)
    )
    return e.select(
        "event_id",
        "user_id",
        F.sum(_dec("value")).over(w).cast("double").alias("trailing_1h_value"),
    )


# ---------------------------------------------------------------------------
# Multimodal plumbing (binary columns + pandas-UDF decode stubs).
# ---------------------------------------------------------------------------
@register(
    "multimodal_binary_stats",
    sql="""
    SELECT doc_id AS media_id,
           CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS modality,
           octet_length(encode(text)) AS n_bytes,
           md5(text) AS content_md5
    FROM documents
    """,
    doc="Binary column stats: opaque media bytes with typed metadata.",
)
def multimodal_binary_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dsacord_spark.multimodal.binary import synthesize_media

    d = table(spark, sf_dir, "documents")
    media = synthesize_media(d)
    return media.select(
        "media_id",
        "modality",
        F.octet_length("data").alias("n_bytes"),
        F.md5(F.col("data")).alias("content_md5"),
    )


def _feature_str(col: str = "feature"):
    """Render an array<float> feature as a deterministic 6dp string.

    Driver-visible catalog outputs must hold scalar cells only: the
    round-4 harness crashed canonicalizing list columns (sort_values on
    an object Series of lists — CORRECTNESS_r04 `unhashable type`
    tracebacks for the two entries that exposed raw arrays). Internal
    callers keep the typed array from decode_images/decode_audio. As of
    r7 no registered entry exposes a feature column (the meta entries
    moved to scalar value-oracle contracts; feature vectors are pinned
    byte-exact in pytest goldens) — this stays as THE canonical
    flattener for any future list-column entry, referenced by the
    no-nested-columns invariant's guidance
    (tests/test_plan_invariants.py)."""
    body = F.concat_ws(
        ",", F.transform(F.col(col), lambda x: F.format_string("%.6f", x))
    )
    return F.concat(F.lit("["), body, F.lit("]"))


@register(
    "multimodal_decode_meta",
    # FULL value oracle via scalar projection (r7, extending the r6 ask
    # beyond resize/frame-sample): the pixel decode still runs in the
    # kernel, but the driver-compared columns are the header contract —
    # format/width/height derive structurally from md5(text) bytes
    # (maker: png iff seed[2]%4==0; dims 8+seed[0]%9 x 8+seed[1]%9).
    # n_bytes is NOT projected (PNG length depends on zlib output);
    # the pixel-level quadrant-luma feature stays pinned byte-exact in
    # tests/test_multimodal.py::test_decode_feature_goldens.
    sql="""
    SELECT doc_id AS media_id,
           CASE WHEN CAST('0x' || substr(md5(text), 5, 2) AS BIGINT) % 4 = 0
                THEN 'png' ELSE 'bmp' END AS format,
           CAST(8 + CAST('0x' || substr(md5(text), 1, 2) AS BIGINT) % 9
                AS INT) AS width,
           CAST(8 + CAST('0x' || substr(md5(text), 3, 2) AS BIGINT) % 9
                AS INT) AS height,
           CAST(3 AS INT) AS n_channels
    FROM documents WHERE doc_id % 3 = 0
    """,
    doc="mapInPandas image decode over REAL generated BMPs/PNGs "
    "(synthesize_real_media): header metadata value-checked against the "
    "structural oracle (format/dims are pure functions of the text "
    "seed); pixel-level features pinned byte-exact in pytest.",
)
def multimodal_decode_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dsacord_spark.multimodal.binary import (
        decode_images, synthesize_real_media,
    )

    d = table(spark, sf_dir, "documents")
    media = synthesize_real_media(d).filter(F.col("modality") == "image")
    return decode_images(media).select(
        "media_id", "format", "width", "height", "n_channels"
    )


@register(
    "multimodal_audio_meta",
    # FULL value oracle via scalar projection (r7): the stdlib `wave`
    # decode still runs; the compared columns are the WAV header
    # contract — n_frames = 64 + md5(text)[0] at 8 kHz mono 16-bit, so
    # n_bytes = 44 (canonical RIFF/fmt/data headers) + 2*n_frames and
    # duration_ms = n_frames/8 exactly (0.125 is dyadic: the float
    # multiply is exact and int() == integer division). The RMS
    # envelope feature stays pinned byte-exact in pytest.
    sql="""
    WITH a AS (
      SELECT doc_id AS media_id,
             64 + CAST('0x' || substr(md5(text), 1, 2) AS BIGINT) AS nf
      FROM documents WHERE doc_id % 3 = 1)
    SELECT media_id, CAST(44 + 2 * nf AS BIGINT) AS n_bytes,
           'wav' AS format, CAST(1 AS INT) AS n_channels,
           CAST(8000 AS INT) AS sample_rate, CAST(nf AS BIGINT) AS n_frames,
           CAST(nf // 8 AS BIGINT) AS duration_ms
    FROM a
    """,
    doc="mapInPandas audio decode over REAL generated PCM WAVs (stdlib "
    "wave): channels/rate/frames/duration/bytes value-checked against "
    "the structural oracle; RMS envelope pinned byte-exact in pytest.",
)
def multimodal_audio_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dsacord_spark.multimodal.binary import (
        decode_audio, synthesize_real_media,
    )

    d = table(spark, sf_dir, "documents")
    media = synthesize_real_media(d).filter(F.col("modality") == "audio")
    return decode_audio(media).select(
        "media_id", "n_bytes", "format", "n_channels", "sample_rate",
        "n_frames", "duration_ms",
    )


@register(
    "multimodal_video_meta",
    # FULL value oracle via scalar projection (r7): the RIFF/AVI demux
    # still runs; the compared columns are the container contract —
    # 8x6 BGR24 at fps 10, n_frames = 6 + md5(text)[0] % 10, so
    # n_bytes = 224 (RIFF + hdrl + movi framing, a constant of the
    # writer layout) + 152 per frame ('00db' header 8 + stride 24 x
    # height 6) and duration_ms = n_frames * 100. Mean luma over the
    # actual frame pixels stays pinned byte-exact in pytest.
    sql="""
    WITH v AS (
      SELECT doc_id AS media_id,
             6 + (CAST('0x' || substr(md5(text), 1, 2) AS BIGINT) % 10)
               AS nf
      FROM documents WHERE doc_id % 3 = 2)
    SELECT media_id, CAST(224 + 152 * nf AS BIGINT) AS n_bytes,
           'avi/bgr24' AS format, CAST(8 AS INT) AS width,
           CAST(6 AS INT) AS height, CAST(nf AS INT) AS n_frames,
           CAST(nf * 100 AS BIGINT) AS duration_ms
    FROM v
    """,
    doc="mapInPandas video decode over REAL generated RIFF/AVI "
    "containers: dimensions/frame-count/duration/bytes value-checked "
    "against the structural oracle; mean frame luma pinned byte-exact "
    "in pytest.",
)
def multimodal_video_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dsacord_spark.multimodal.binary import (
        decode_video, synthesize_real_media,
    )

    d = table(spark, sf_dir, "documents")
    media = synthesize_real_media(d).filter(F.col("modality") == "video")
    return decode_video(media).select(
        "media_id", "n_bytes", "format", "width", "height", "n_frames",
        "duration_ms",
    )


@register(
    "multimodal_frame_sample",
    # FULL value oracle via scalar projection (r5/r6 verdict ask): the
    # AVI demux still runs in the Python kernel (mapInPandas emits its
    # whole schema before Spark prunes), but the driver-compared columns
    # are plain ints DuckDB derives structurally from `documents` — the
    # synthesized AVI carries n_frames = 6 + md5(text)[0] % 10 at fps 10
    # (multimodal/binary.synthesize_real_media), so the 1000ms sampler
    # picks frame 0 always and frame 10 (ts 1000ms) iff n_frames >= 11.
    # The frame_md5 byte-level signal stays pinned in
    # tests/test_multimodal.py (golden frame hashes).
    sql="""
    WITH v AS (
      SELECT doc_id AS media_id,
             6 + (CAST('0x' || substr(md5(text), 1, 2) AS BIGINT) % 10)
               AS n_frames
      FROM documents WHERE doc_id % 3 = 2)
    SELECT media_id, CAST(0 AS INT) AS frame_idx,
           CAST(0 AS BIGINT) AS frame_ts_ms
    FROM v
    UNION ALL
    SELECT media_id, CAST(1 AS INT) AS frame_idx,
           CAST(1000 AS BIGINT) AS frame_ts_ms
    FROM v WHERE n_frames >= 11
    """,
    doc="Video frame sampling over REAL generated AVIs: frames picked on "
    "the container timebase, real presentation timestamps; value-checked "
    "on (media_id, frame_idx, frame_ts_ms) against the structural oracle "
    "(frame count is a pure function of the document text seed).",
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dsacord_spark.multimodal.binary import (
        sample_frames, synthesize_real_media,
    )

    d = table(spark, sf_dir, "documents")
    return sample_frames(synthesize_real_media(d)).select(
        "media_id", "frame_idx", "frame_ts_ms"
    )


@register(
    "multimodal_resize",
    # FULL value oracle via scalar projection (r5/r6 verdict ask): the
    # resize kernel still runs (binary in, binary out through
    # mapInPandas), but the compared columns are the scalar contract —
    # every image row resizes to exactly 32x32x3 = 3072 bytes (the
    # deterministic stride kernel always emits the full target buffer).
    # Byte-level output stays pinned by tests (resize golden).
    sql="""
    SELECT doc_id AS media_id, CAST(32 AS INT) AS width,
           CAST(32 AS INT) AS height, CAST(3072 AS BIGINT) AS n_bytes
    FROM documents WHERE doc_id % 3 = 0
    """,
    doc="Image resize over REAL generated BMPs/PNGs: Pillow kernel when "
    "installed, deterministic byte-stride kernel otherwise; binary in, "
    "fixed-size binary out via mapInPandas; value-checked on the "
    "(media_id, width, height, n_bytes) scalar contract.",
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dsacord_spark.multimodal.binary import (
        resize_images, synthesize_real_media,
    )

    d = table(spark, sf_dir, "documents")
    return resize_images(synthesize_real_media(d)).select(
        "media_id", "width", "height", "n_bytes"
    )


# ---------------------------------------------------------------------------
# Perceptual-hash image dedup: the multimodal x dedup crossover a
# training-data pipeline needs (byte-level hashing misses re-encoded /
# slightly-edited images; a 64-bit dHash over decoded pixels clusters
# them). The synthesized corpus has no natural near-duplicates, so the
# entry PLANTS a perturbed twin for every 30th image (one-pixel BMP edit
# / byte-identical PNG copy at twin id -(media_id + 1) — the NEGATIVE id
# space can never collide with a real doc-derived media_id at any corpus
# size, unlike an additive offset; review finding) and must find exactly
# those pairs (plus any naturally byte-identical images — duplicated
# source text seeds identical media). Scale shape: the Arrow-batched
# hash kernel is linear; the candidate join is
# operators/dedup.banded_hamming_pairs (4 x 16-bit bands, radius 3 =
# bands - 1, pigeonhole recall exactly 1 — the result EQUALS the
# brute-force O(n^2) scan, the simhash_pairs contract; exact
# bit_count(xor) verify filtered BEFORE distinct). Exact-dup clusters
# (K byte-identical images) are pre-grouped to one representative
# before the banded join (r6: the joiner's stage 1/2/3 split), so a
# viral-meme cluster costs K-1 expansion rows, never a K^2/2 band
# bucket. At multi-billion-image scale the 16-bit band value space
# saturates for NEAR-dups too: both knobs are now real parameters of
# banded_hamming_pairs — `hash_bits/n_bands/radius` for the
# 2 x 32-bit/radius-1 shape (recall stays pigeonhole-exact,
# property-pinned) and `bucket_cap` for per-bucket admission (bounded
# recall, map-side WindowGroupLimit, exact-dup pairs never lost).
# ---------------------------------------------------------------------------

_PHASH_BANDS = 4  # 16-bit bands of the 64-bit hash
_PHASH_RADIUS = _PHASH_BANDS - 1  # pigeonhole: recall 1 at <= bands-1
_PHASH_TWIN_EVERY = 30  # plant a perturbed twin for every 30th image


def _fingerprint_pair_frame(
    spark: SparkSession, sf_dir: str, modality: str
) -> DataFrame:
    """Raw fingerprint near-dup pairs (media_id_a, media_id_b, hamming)
    for one modality — the shared body of the three dedup entries:
    synthesize real media, plant a perturbed twin at -(id+1) for every
    30th item of the modality's residue class, hash with the modality's
    64-bit kernel, join with banded_hamming_pairs (pigeonhole-exact
    recall at Hamming <= _PHASH_RADIUS). Not catalog-registered — the
    hash-valued hamming column has no DuckDB twin, so the full raw
    result (hamming included) is pinned as a pytest golden
    (tests/test_rows_only_golden.py) while the registered entries expose
    the structurally-checkable pair set."""
    from dsacord_spark.multimodal.binary import (
        audio_ehash, image_dhash, perturb_audio, perturb_images,
        perturb_video, synthesize_real_media, video_vhash,
    )
    from dsacord_spark.operators.dedup import banded_hamming_pairs

    hash_fn, perturb_fn, hash_col, residue = {
        "image": (image_dhash, perturb_images, "dhash", 0),
        "audio": (audio_ehash, perturb_audio, "ehash", 1),
        "video": (video_vhash, perturb_video, "vhash", 2),
    }[modality]
    d = table(spark, sf_dir, "documents")
    media = synthesize_real_media(d).filter(F.col("modality") == modality)
    # media_ids are == residue (mod 3); every 10th of them gets a twin
    twins = perturb_fn(
        media.filter(F.col("media_id") % _PHASH_TWIN_EVERY == residue)
    ).withColumn("media_id", -(F.col("media_id") + F.lit(1)))
    # persisted for the same reason as simhash_pairs' signature frame:
    # the banded self-join reads this on BOTH sides and Spark does no
    # CSE across self-join branches — unpersisted, the decode + hash
    # kernel (the dominant cost) runs twice. Released by the
    # harness/bench at the family boundary like every catalog persist.
    hashed = (
        hash_fn(media.unionByName(twins))
        .filter(F.col(hash_col).isNotNull())
        .persist()
    )
    return banded_hamming_pairs(
        hashed, "media_id", hash_col, _PHASH_BANDS, _PHASH_RADIUS
    )


def _fingerprint_pairs_sql(residue: int) -> str:
    """Structural DuckDB twin for the fingerprint pair set (r8 verdict
    ask #5 — the multimodal_phash_clusters argument, pair edition): the
    synthesized media are a pure function of document text, so
    byte-identical media (equal text) share a hash (hamming 0), each
    planted twin is a deterministic perturbation of those shared bytes
    (the twin hash moves a few bits from its group's hash, always
    within radius 3, and twins of equal-text docs are byte-identical),
    so the Hamming-<=3 pair set equals the complete graph on each
    text-equality group with twins attached — which DuckDB computes
    structurally from `documents` (verified pairwise-identical across
    sf0.001/0.01/0.1 for all three modalities; a cross-text false pair
    would need two 64-bit fingerprints within 3 bits, ~2e-15/pair)."""
    return f"""
    WITH med AS (
      SELECT doc_id AS media_id, md5(text) AS tkey
      FROM documents WHERE doc_id % 3 = {residue}),
    allm AS (
      SELECT media_id, tkey FROM med
      UNION ALL
      SELECT -(media_id + 1) AS media_id, tkey FROM med
      WHERE media_id % 30 = {residue})
    SELECT a.media_id AS media_id_a, b.media_id AS media_id_b,
           TRUE AS within_radius
    FROM allm a JOIN allm b
      ON a.tkey = b.tkey AND a.media_id < b.media_id
    """


def _structural_pairs(pairs: DataFrame) -> DataFrame:
    """Project the raw pair frame onto the structurally-checkable
    contract: the pair SET plus the pigeonhole boolean (the joiner's
    exact-verify filter guarantees it; a recall or verify drift changes
    the row set and hash-mismatches). The hash-valued hamming column
    stays pinned by the pytest golden over the raw frame."""
    return pairs.select(
        "media_id_a",
        "media_id_b",
        (F.col("hamming") <= F.lit(_PHASH_RADIUS)).alias("within_radius"),
    )


@register(
    "multimodal_phash_dedup",
    sql=_fingerprint_pairs_sql(0),
    doc="Image near-dup dedup via 64-bit dHash over REAL decoded pixels "
    "(stdlib BMP/PNG tiers): banded 4x16-bit LSH candidate join with "
    "pigeonhole-exact recall at Hamming <= 3, exact bit_count verify, "
    "planted perturbed twins recovered. FULL value oracle on the pair "
    "set despite the Python hash kernel: media are a pure function of "
    "document text, so the Hamming pairs equal the text-equality "
    "groups' complete graphs with twins attached (the "
    "multimodal_phash_clusters argument); hamming values pinned by "
    "pytest golden.",
)
def multimodal_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _structural_pairs(_fingerprint_pair_frame(spark, sf_dir, "image"))


@register(
    "multimodal_audio_fingerprint_dedup",
    sql=_fingerprint_pairs_sql(1),
    doc="Audio near-dup dedup via a 64-bit temporal-envelope difference "
    "hash over REAL decoded PCM (stdlib wave): same banded-LSH + exact "
    "bit_count machinery as the image entry (pigeonhole-exact recall "
    "at Hamming <= 3), planted one-sample-edit twins recovered; FULL "
    "value oracle on the pair set via the text-equality structural twin "
    "(see multimodal_phash_dedup), hamming values pinned by golden.",
)
def multimodal_audio_fingerprint_dedup(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    return _structural_pairs(_fingerprint_pair_frame(spark, sf_dir, "audio"))


@register(
    "multimodal_video_fingerprint_dedup",
    sql=_fingerprint_pairs_sql(2),
    doc="Video near-dup dedup via a 64-bit spatio-temporal fingerprint "
    "(8 sampled frames x 8 column-luma comparisons over REAL demuxed "
    "BGR frames): the shared banded-LSH + exact bit_count machinery "
    "(pigeonhole-exact recall at Hamming <= 3), planted one-pixel-edit "
    "twins recovered — completes the image/audio/video dedup triple; "
    "FULL value oracle on the pair set via the text-equality structural "
    "twin (see multimodal_phash_dedup), hamming values pinned by golden.",
)
def multimodal_video_fingerprint_dedup(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    return _structural_pairs(_fingerprint_pair_frame(spark, sf_dir, "video"))


# ---------------------------------------------------------------------------
# Stream-stream interval join and watermarked streaming dedup, run over a
# bounded stream (run_bounded_stream) so the REAL streaming operators get
# full value checks against batch SQL oracles. Scale notes: the interval
# join's time bound lets Spark expire buffered state on both sides once
# the watermark passes (unbounded state otherwise); the dedup's state is
# bounded by the watermark horizon instead of growing forever.
# ---------------------------------------------------------------------------
@register(
    "stream_join_interval",
    sql="""
    SELECT v.user_id,
           strftime(CAST(v.ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS view_ts,
           strftime(CAST(c.ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS click_ts
    FROM events v JOIN events c
      ON v.user_id = c.user_id
     AND v.event_type = 'view' AND c.event_type = 'click'
     AND c.ts >= v.ts AND c.ts <= v.ts + INTERVAL 1 HOUR
    """,
    doc="Watermarked stream-stream interval join (views matched to "
    "clicks within 1h), drained over a bounded stream and value-checked "
    "against the batch join oracle — the real streaming join path, not "
    "a batch twin.",
)
def stream_join_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dsacord_spark.streaming.pipeline import (
        join_event_streams, run_bounded_stream,
    )

    e = table(spark, sf_dir, "events").select("user_id", "event_type", "ts")

    def transform(stream: DataFrame) -> DataFrame:
        views = stream.filter(F.col("event_type") == "view")
        clicks = stream.filter(F.col("event_type") == "click")
        return join_event_streams(
            views, clicks, key="user_id", within="1 hour", watermark="0 seconds"
        )

    out = run_bounded_stream(spark, e, transform)
    return out.select(
        "user_id",
        _ts_str(F.col("l_ts")).alias("view_ts"),
        _ts_str(F.col("r_ts")).alias("click_ts"),
    )


@register(
    "stream_dedup_watermark",
    sql="""
    SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events GROUP BY event_type
    """,
    doc="Streaming dedup (dropDuplicatesWithinWatermark on user x type) "
    "over a bounded stream; the per-type survivor counts equal the batch "
    "distinct-user counts — checks the real streaming-dedup state path.",
)
def stream_dedup_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dsacord_spark.streaming.pipeline import dedup_stream, run_bounded_stream

    e = table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    out = run_bounded_stream(
        spark,
        e,
        # horizon far past the dataset's whole time span: the oracle
        # equality (survivors == distinct keys) must hold even if the
        # runner ever splits the input into multiple micro-batches —
        # with a short horizon, duplicates farther apart than it that
        # land in different batches would BOTH survive state eviction
        lambda stream: dedup_stream(
            stream, ["user_id", "event_type"], watermark="3650 days"
        ),
    )
    return out.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_users")
    )


# ---------------------------------------------------------------------------
# Custom stateful streaming operator (SURVEY §2.10): per-key session
# assembly via applyInPandasWithState, run here over a bounded stream so
# the DuckDB island-SQL oracle gives a full value check on the streaming
# code path (same >= 4h-gap semantics as the batch `session_windows`
# query — two independent engines, one oracle).
# ---------------------------------------------------------------------------
@register(
    "session_stateful",
    sql="""
    WITH gaps AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                       OR epoch_us(ts) - lag(epoch_us(ts)) OVER (
                            PARTITION BY user_id ORDER BY ts, event_id) >= 14400000000
                  THEN 1 ELSE 0 END AS new_session
      FROM events),
    sess AS (
      SELECT user_id, ts,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS sid
      FROM gaps)
    SELECT CAST(user_id AS VARCHAR) AS user_id,
           strftime(min(CAST(ts AS TIMESTAMP)), '%Y-%m-%d %H:%M:%S') AS session_start,
           strftime(max(CAST(ts AS TIMESTAMP)), '%Y-%m-%d %H:%M:%S') AS session_end,
           COUNT(*) AS n_events
    FROM sess GROUP BY user_id, sid
    """,
    doc="Stateful streaming sessionizer (applyInPandasWithState) over a bounded "
    "stream; closed sessions checked against the island-SQL oracle.",
)
def session_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dsacord_spark.streaming.pipeline import sessionize_bounded

    e = table(spark, sf_dir, "events").select("user_id", "ts")
    s = sessionize_bounded(spark, e, gap_s=14400)
    return s.select(
        "user_id",
        _ts_str(F.col("session_start")).alias("session_start"),
        _ts_str(F.col("session_end")).alias("session_end"),
        "n_events",
    )


# ---------------------------------------------------------------------------
# Distribution window functions (SURVEY §2.6: ntile / percent_rank /
# cume_dist). ntile's bucket boundaries depend on intra-tie row order, so
# the ORDER BY carries the unique o_orderkey tie-break on both sides.
# ---------------------------------------------------------------------------
@register(
    "window_distribution",
    sql="""
    SELECT o_orderkey, o_orderpriority,
           ntile(4) OVER w AS price_quartile,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist() OVER w, 6) AS cume
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
    """,
    doc="ntile/percent_rank/cume_dist over orders by priority.",
)
def window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").asc(), F.col("o_orderkey").asc()
    )
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.ntile(4).over(w).alias("price_quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )
