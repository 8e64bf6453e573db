"""Extended operator catalog: statistical aggregates, fuzzy string
matching, sliding windows, full-outer joins, and the remaining
training-pipeline text/embedding operators (PII scrub, n-gram stats,
embedding quantization).

Determinism strategy matches plans/relational.py: every floating-point
output is derived from decimal-exact sums (or strictly left-to-right
double accumulation) through an expression written identically in the
Spark DSL and the DuckDB oracle SQL, so value hashes agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from dsacord_spark.functions.text import (
    doc_fingerprint,
    quality_score,
    token_count,
    tokens,
)
from dsacord_spark.functions.vectors import norm, to_double_array
from dsacord_spark.plans.analysis import _EN, _FPRINT_SQL, _TOKS_SQL, _stop_hits_sql
from dsacord_spark.plans.registry import register, table

_D = "decimal(18,2)"


def _dec(c) -> F.Column:
    return (F.col(c) if isinstance(c, str) else c).cast(_D)


def _ts_str(c) -> F.Column:
    return F.date_format(c, "yyyy-MM-dd HH:mm:ss")


# ---------------------------------------------------------------------------
# Statistical moments from decimal-exact sums (SURVEY §2.5 A3 extension).
# stddev/corr are NOT computed with the engines' native aggregates (their
# float accumulation order differs under parallelism); instead both engines
# reduce to exact decimal sums (one shuffle, partial+final hash agg) and
# derive the moments with an identical double-precision expression.
# Scale: single shuffle on a 3-value key; everything else is map-side.
# ---------------------------------------------------------------------------
@register(
    "agg_stats_moments",
    sql="""
    WITH s AS (
      SELECT l_returnflag,
             COUNT(*) AS n,
             SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sx,
             SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS sxx,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS sy,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS syy,
             SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS sxy
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
           round(CAST(sx AS DOUBLE) / n, 6) AS mean_qty,
           round(sqrt((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n) / (n - 1)), 6) AS std_qty,
           round((CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / n)
             / sqrt((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n)
                    * (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / n)), 6) AS corr_qty_price
    FROM s
    """,
    doc="Sample stddev + Pearson corr via decimal-exact sufficient statistics; "
    "outputs rounded to 6dp on both engines (squared-price sums exceed 2^53 "
    "unscaled, so the decimal->double cast is 1-ulp engine-dependent).",
)
def agg_stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    s = l.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(_dec("l_quantity")).alias("sx"),
        F.sum(_dec("l_quantity") * _dec("l_quantity")).alias("sxx"),
        F.sum(_dec("l_extendedprice")).alias("sy"),
        F.sum(_dec("l_extendedprice") * _dec("l_extendedprice")).alias("syy"),
        F.sum(_dec("l_quantity") * _dec("l_extendedprice")).alias("sxy"),
    )
    sx, sxx = F.col("sx").cast("double"), F.col("sxx").cast("double")
    sy, syy = F.col("sy").cast("double"), F.col("syy").cast("double")
    sxy, n = F.col("sxy").cast("double"), F.col("n")
    var_x = sxx - sx * sx / n
    var_y = syy - sy * sy / n
    return s.select(
        "l_returnflag",
        "n",
        F.round(sx / n, 6).alias("mean_qty"),
        F.round(F.sqrt(var_x / (n - F.lit(1))), 6).alias("std_qty"),
        F.round((sxy - sx * sy / n) / F.sqrt(var_x * var_y), 6).alias(
            "corr_qty_price"
        ),
    )


# ---------------------------------------------------------------------------
# Fuzzy string top-k (layer B: entity-resolution building block). Five
# deterministically-misspelled probe names (3rd char deleted, lowercased)
# are matched to the supplier table by Levenshtein distance.
# Scale: the probe side is tiny and broadcast; the corpus side computes
# distances map-side. The per-probe top-k window shuffles on probe_id —
# at a real scale with few probes, replace with per-partition local top-k
# + a driver merge (same pattern as ann_bruteforce_topk).
# ---------------------------------------------------------------------------
@register(
    "fuzzy_string_topk",
    sql="""
    WITH probes AS (
      SELECT s_suppkey AS probe_id,
             lower(substr(s_name, 1, 2) || substr(s_name, 4)) AS probe
      FROM supplier WHERE s_suppkey <= 5
    ),
    scored AS (
      SELECT probe_id, probe, s_suppkey AS match_id,
             levenshtein(probe, lower(s_name)) AS dist
      FROM probes, supplier
    ),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY probe_id
                                   ORDER BY dist, match_id) AS rank
      FROM scored
    )
    SELECT probe_id, probe, match_id, dist, rank FROM ranked WHERE rank <= 3
    """,
    doc="Levenshtein top-3 match per misspelled probe (broadcast probes).",
)
def fuzzy_string_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = table(spark, sf_dir, "supplier")
    probes = s.filter(F.col("s_suppkey") <= 5).select(
        F.col("s_suppkey").alias("probe_id"),
        F.lower(
            F.concat(F.expr("substr(s_name, 1, 2)"), F.expr("substr(s_name, 4)"))
        ).alias("probe"),
    )
    scored = F.broadcast(probes).crossJoin(s).select(
        "probe_id",
        "probe",
        F.col("s_suppkey").alias("match_id"),
        F.levenshtein("probe", F.lower(F.col("s_name"))).alias("dist"),
    )
    w = W.partitionBy("probe_id").orderBy("dist", "match_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("probe_id", "probe", "match_id", "dist", "rank")
    )


# ---------------------------------------------------------------------------
# Sliding (hopping) window: 2-hour windows every 1 hour — each event lands
# in exactly two windows (SURVEY §2.10 window family). The oracle expands
# each event into its two hour-aligned window starts explicitly.
# Scale: Spark's window() is a generator + hash agg — one shuffle on
# (window, event_type); partial aggregation halves the shuffled rows.
# ---------------------------------------------------------------------------
@register(
    "window_sliding_2h",
    sql="""
    WITH b AS (
      SELECT time_bucket(INTERVAL 1 HOUR, CAST(ts AS TIMESTAMP)) AS tb,
             event_type, value
      FROM events
    ),
    ex AS (
      SELECT tb AS ws, event_type, value FROM b
      UNION ALL
      SELECT tb - INTERVAL 1 HOUR, event_type, value FROM b
    )
    SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM ex GROUP BY 1, 2
    """,
    doc="Hopping 2h/1h window counts (each event in exactly 2 windows).",
)
def window_sliding_2h(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "2 hours", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(_dec("value")).cast("double").alias("sum_value"),
        )
        .select(
            _ts_str(F.col("w.start")).alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


# ---------------------------------------------------------------------------
# Full-outer join with key coalescing (completes the join-type surface of
# SURVEY §2.4): daily order activity vs daily event activity — the two
# calendars barely overlap, so both null sides are exercised.
# Scale: both inputs are pre-aggregated to one row per day BEFORE the
# join (map-side partial agg), so the full-outer shuffle moves days, not
# raw rows.
# ---------------------------------------------------------------------------
@register(
    "join_full_outer_days",
    sql="""
    WITH o AS (
      SELECT strftime(o_orderdate, '%Y-%m-%d') AS dt, COUNT(*) AS order_cnt
      FROM orders GROUP BY 1
    ),
    e AS (
      SELECT strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS dt, COUNT(*) AS event_cnt
      FROM events GROUP BY 1
    )
    SELECT dt,
           COALESCE(order_cnt, 0) AS order_cnt,
           COALESCE(event_cnt, 0) AS event_cnt
    FROM o FULL JOIN e USING (dt)
    """,
    doc="Full-outer join of two pre-aggregated daily calendars.",
)
def join_full_outer_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = (
        table(spark, sf_dir, "orders")
        .groupBy(F.date_format("o_orderdate", "yyyy-MM-dd").alias("dt"))
        .agg(F.count(F.lit(1)).alias("order_cnt"))
    )
    e = (
        table(spark, sf_dir, "events")
        .groupBy(F.date_format("ts", "yyyy-MM-dd").alias("dt"))
        .agg(F.count(F.lit(1)).alias("event_cnt"))
    )
    return o.join(e, "dt", "full_outer").select(
        "dt",
        F.coalesce("order_cnt", F.lit(0)).alias("order_cnt"),
        F.coalesce("event_cnt", F.lit(0)).alias("event_cnt"),
    )


# ---------------------------------------------------------------------------
# PII scrubbing (layer B: training-data hygiene). Deterministic PII
# snippets are appended per doc_id class, then masked with three regex
# passes (URL before EMAIL before digit runs, so partial overlaps resolve
# the same way in both engines). Patterns avoid constructs where Java
# (backtracking) and RE2 (leftmost-longest) could disagree: character
# classes + greedy quantifiers only, no alternation inside repeats.
# Scale: pure map-side projection, zero shuffles.
# ---------------------------------------------------------------------------
_PII_URL = "https?://[A-Za-z0-9./?=&_%-]+"
_PII_EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z][A-Za-z]+"
_PII_NUM = "[0-9][0-9][0-9][0-9]+"


@register(
    "text_pii_scrub",
    sql=f"""
    WITH seeded AS (
      SELECT doc_id,
             text || CASE doc_id % 4
               WHEN 0 THEN ' contact bob.smith+spam@example-mail.com now'
               WHEN 1 THEN ' card 4111222233334444 ref 98765'
               WHEN 2 THEN ' see https://example.com/p?id=9&u=x#f'
               ELSE ''
             END AS t
      FROM documents
    ),
    scrubbed AS (
      SELECT doc_id,
             regexp_replace(
               regexp_replace(
                 regexp_replace(t, '{_PII_URL}', '<URL>', 'g'),
                 '{_PII_EMAIL}', '<EMAIL>', 'g'),
               '{_PII_NUM}', '<NUM>', 'g') AS clean,
             t
      FROM seeded
    )
    SELECT doc_id, clean,
           len(regexp_extract_all(t, '{_PII_URL}')) AS n_url,
           len(regexp_extract_all(t, '{_PII_EMAIL}')) AS n_email,
           len(regexp_extract_all(t, '{_PII_NUM}')) AS n_num
    FROM scrubbed
    """,
    doc="Regex PII masking (URL/email/long-digit-run) + per-doc match counts.",
)
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    seeded = F.concat(
        F.col("text"),
        F.when(F.col("doc_id") % 4 == 0, F.lit(" contact bob.smith+spam@example-mail.com now"))
        .when(F.col("doc_id") % 4 == 1, F.lit(" card 4111222233334444 ref 98765"))
        .when(F.col("doc_id") % 4 == 2, F.lit(" see https://example.com/p?id=9&u=x#f"))
        .otherwise(F.lit("")),
    )
    t = seeded.alias("t")
    clean = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(t, F.lit(_PII_URL), F.lit("<URL>")),
            F.lit(_PII_EMAIL),
            F.lit("<EMAIL>"),
        ),
        F.lit(_PII_NUM),
        F.lit("<NUM>"),
    )
    return d.select(
        "doc_id",
        clean.alias("clean"),
        F.regexp_count(t, F.lit(_PII_URL)).alias("n_url"),
        F.regexp_count(t, F.lit(_PII_EMAIL)).alias("n_email"),
        F.regexp_count(t, F.lit(_PII_NUM)).alias("n_num"),
    )


# ---------------------------------------------------------------------------
# Corpus bigram top-k (layer B: n-gram corpus statistics). Tokenize,
# form adjacent word pairs, count globally, keep the top 20.
# Scale: tokenization + bigram expansion are map-side generators; the
# count is one shuffle with map-side partial aggregation; the final
# top-20 plans as TakeOrderedAndProject (no global sort).
# ---------------------------------------------------------------------------
@register(
    "text_bigram_topk",
    sql=f"""
    WITH toks AS (SELECT doc_id, {_TOKS_SQL.format(c="text")} AS t FROM documents),
    bg AS (
      SELECT t[i] || ' ' || t[i+1] AS bigram
      FROM toks, unnest(generate_series(1, len(t) - 1)) AS u(i)
      WHERE len(t) >= 2
    )
    SELECT bigram, COUNT(*) AS cnt
    FROM bg GROUP BY bigram
    ORDER BY cnt DESC, bigram LIMIT 20
    """,
    doc="Global top-20 word bigrams over the documents corpus.",
)
def text_bigram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    with_toks = d.select(tokens(F.col("text")).alias("__t"))
    bigrams = with_toks.select(
        F.explode(
            F.expr(
                "CASE WHEN size(__t) >= 2 THEN "
                "transform(sequence(0, size(__t) - 2), "
                "i -> concat(element_at(__t, i + 1), ' ', element_at(__t, i + 2))) "
                "ELSE array() END"
            )
        ).alias("bigram")
    )
    return (
        bigrams.groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("bigram").asc())
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Embedding L2-normalize + int8 quantization (layer B: vector-index prep).
# norm accumulates left-to-right in double (functions/vectors.py), the
# quantized value is round(x / norm * 127) — the identical expression on
# the DuckDB side makes even this float pipeline hash-exact.
# Scale: pure map-side transform; at 100 TB this is the cheap half of an
# IVF/PQ index build and runs fused in one codegen stage.
# ---------------------------------------------------------------------------
@register(
    "embed_normalize_quantize",
    sql="""
    WITH v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
    ),
    n AS (
      SELECT vec_id, e, sqrt(list_dot_product(e, e)) AS nrm FROM v
    )
    SELECT vec_id, nrm AS norm,
           array_to_string(
             list_transform(e, x -> CAST(round(x / nrm * 127, 0) AS INT)), ',') AS quantized
    FROM n WHERE nrm > 0
    """,
    doc="L2 norm + int8 quantization of embeddings (map-side, codegen-fused).",
)
def embed_normalize_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings")
    nd = norm(F.col("embedding"))
    quant = F.transform(
        to_double_array(F.col("embedding")),
        lambda x: F.round(x / F.col("norm") * 127, 0).cast("int").cast("string"),
    )
    return (
        e.select("vec_id", nd.alias("norm"), "embedding")
        .filter(F.col("norm") > 0)
        .select("vec_id", "norm", F.array_join(quant, ",").alias("quantized"))
    )


# ---------------------------------------------------------------------------
# Curation funnel (layer B: the end-to-end shape of a training-data
# pipeline — language gate, quality gate, exact dedup — as ONE conditional
# aggregation). Instead of 4 chained filters = 4 scans, every stage is a
# FILTER-ed count over a single pass, and the dedup stage is a distinct
# count of the content fingerprint among surviving docs.
# Scale: one scan + one distinct-agg expand; no per-stage materialization.
# ---------------------------------------------------------------------------
_QUALITY_SQL = f"""
      (CASE WHEN CAST(len({_TOKS_SQL.format(c='text')}) AS DOUBLE) >= 5
                 AND CAST(len({_TOKS_SQL.format(c='text')}) AS DOUBLE) <= 5000 THEN 0.4 ELSE 0.0 END)
      + (CASE WHEN CAST(length(text) - length(regexp_replace(text, '[^A-Za-z0-9\\s]', '', 'g')) AS DOUBLE)
                   / length(text) < 0.2 THEN 0.3 ELSE 0.0 END)
      + (CASE WHEN CAST({_stop_hits_sql('text', _EN)} AS DOUBLE)
                   / greatest(CAST(len({_TOKS_SQL.format(c='text')}) AS DOUBLE), 1.0) > 0.01
              THEN 0.3 ELSE 0.0 END)"""


@register(
    "curation_funnel",
    sql=f"""
    WITH t AS (
      SELECT lang, CAST({_QUALITY_SQL} AS DOUBLE) AS q, {_FPRINT_SQL} AS fp
      FROM documents
    )
    SELECT COUNT(*) AS n_raw,
           COUNT(*) FILTER (WHERE lang = 'en') AS n_lang,
           COUNT(*) FILTER (WHERE lang = 'en' AND q >= 0.7) AS n_quality,
           COUNT(DISTINCT CASE WHEN lang = 'en' AND q >= 0.7 THEN fp END) AS n_unique
    FROM t
    """,
    doc="One-pass curation funnel: raw -> lang gate -> quality gate -> exact dedup.",
)
def curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    t = d.select(
        "lang",
        quality_score("text").alias("q"),
        doc_fingerprint("text").alias("fp"),
    )
    en = F.col("lang") == "en"
    keep = en & (F.col("q") >= 0.7)
    return t.agg(
        F.count(F.lit(1)).alias("n_raw"),
        F.count_if(en).alias("n_lang"),
        F.count_if(keep).alias("n_quality"),
        F.count_distinct(F.when(keep, F.col("fp"))).alias("n_unique"),
    )


# ---------------------------------------------------------------------------
# Token-length power-of-2 bucketing (layer B: sequence-length bucketing
# for training-batch packing). The bucket exponent is computed with
# integer arithmetic (length of the binary representation), never
# floating log2 — libm rounding near power-of-2 boundaries would diverge
# between engines (and between executor platforms at scale).
# Scale: map-side projection + one low-cardinality shuffle (~12 buckets).
# ---------------------------------------------------------------------------
@register(
    "length_bucket_stats",
    sql=f"""
    WITH t AS (
      SELECT greatest(len({_TOKS_SQL.format(c='text')}), 1) AS n_tok, n_chars
      FROM documents
    )
    SELECT length(bin(n_tok)) - 1 AS bucket_exp,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS sum_tokens,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars
    FROM t GROUP BY 1
    """,
    doc="Power-of-2 sequence-length buckets via integer bit-length (no libm).",
)
def length_bucket_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    t = d.select(
        F.greatest(token_count("text"), F.lit(1)).alias("n_tok"), "n_chars"
    )
    return (
        t.groupBy((F.length(F.bin("n_tok")) - 1).alias("bucket_exp"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("sum_tokens"),
            F.sum("n_chars").alias("sum_chars"),
        )
    )


# ---------------------------------------------------------------------------
# Hourly gap-fill + LOCF forward fill (the hypertable / time_bucket_gapfill
# shape): a dense (event_type x hour) spine generated from the observed
# span, hours with no events filled with count 0, and the hourly average
# value carried forward across gaps with last-non-null-over-window.
# Scale: the spine is sequence()-generated (types x hours rows — tiny
# relative to raw events, and computable without a second scan once the
# span row is known); the raw table is touched once for the hourly
# pre-aggregation (one shuffle), the gap-fill left join is a broadcast of
# the spine against the aggregate (or vice versa — both are post-agg
# sized), and LOCF is one window pass per event_type partition.
# Determinism: av = decimal-sum cast double / count, then copied verbatim
# by LOCF — no float accumulation anywhere.
# ---------------------------------------------------------------------------
@register(
    "events_hourly_gapfill",
    sql="""
    WITH hourly AS (
      SELECT event_type,
             time_bucket(INTERVAL 1 HOUR, CAST(ts AS TIMESTAMP)) AS hr,
             COUNT(*) AS cnt,
             SUM(CAST(value AS DECIMAL(18,2))) AS sv
      FROM events GROUP BY 1, 2
    ),
    span AS (SELECT min(hr) AS mn, max(hr) AS mx FROM hourly),
    spine AS (
      SELECT et.event_type, gs.hr
      FROM (SELECT DISTINCT event_type FROM events) et
      CROSS JOIN (SELECT unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS hr
                  FROM span) gs
    ),
    j AS (
      SELECT s.event_type, s.hr,
             COALESCE(h.cnt, 0) AS cnt,
             CAST(h.sv AS DOUBLE) / h.cnt AS av
      FROM spine s LEFT JOIN hourly h
        ON h.event_type = s.event_type AND h.hr = s.hr
    )
    SELECT event_type, strftime(hr, '%Y-%m-%d %H:%M:%S') AS hr_str, cnt,
           last_value(av IGNORE NULLS) OVER (
             PARTITION BY event_type ORDER BY hr
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS locf_avg
    FROM j
    """,
    doc="Dense hourly spine per event_type; zero-filled counts; hourly "
    "avg value forward-filled (LOCF) across empty hours.",
)
def events_hourly_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    # persisted: the aggregate feeds three consumers (span row, spine
    # type list, gap-fill join) — unpersisted, each re-scans raw events
    hourly = (
        e.groupBy("event_type", F.date_trunc("hour", F.col("ts")).alias("hr"))
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum(_dec("value")).alias("sv"))
        .persist()
    )
    span = hourly.agg(F.min("hr").alias("mn"), F.max("hr").alias("mx"))
    hours = span.select(
        F.explode(
            F.sequence(F.col("mn"), F.col("mx"), F.expr("INTERVAL 1 HOUR"))
        ).alias("hr")
    )
    # event types enumerated from the AGGREGATE (it contains exactly the
    # types present in events), not a second scan of the raw table
    spine = hourly.select("event_type").distinct().crossJoin(hours)
    j = spine.join(hourly, ["event_type", "hr"], "left").select(
        "event_type",
        "hr",
        F.coalesce(F.col("cnt"), F.lit(0)).alias("cnt"),
        (F.col("sv").cast("double") / F.col("cnt")).alias("av"),
    )
    w = (
        W.partitionBy("event_type")
        .orderBy("hr")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return j.select(
        "event_type",
        _ts_str(F.col("hr")).alias("hr_str"),
        "cnt",
        F.last(F.col("av"), ignorenulls=True).over(w).alias("locf_avg"),
    )


# ---------------------------------------------------------------------------
# Inverted index (posting lists): term -> document frequency + sorted
# posting list, the core retrieval / exact-phrase-lookup structure.
# Scale: explode + distinct-per-doc is map-side; the single shuffle is the
# groupBy(term) — skew on stopword-grade terms is bounded because posting
# lists are stored sorted-compressed per term (here: csv string; at scale:
# delta-encoded arrays bucketed by term hash). min_df prunes the hapax
# tail, which is the bulk of the vocabulary.
# ---------------------------------------------------------------------------
@register(
    "text_inverted_index",
    sql=f"""
    WITH t AS (
      SELECT DISTINCT doc_id, unnest({_TOKS_SQL.format(c='text')}) AS term
      FROM documents
    )
    SELECT term, COUNT(*) AS df,
           array_to_string(list_sort(list(doc_id)), ',') AS postings
    FROM t GROUP BY term HAVING COUNT(*) >= 25
    """,
    doc="Posting lists: term -> df + comma-joined sorted doc ids "
    "(min_df 25 prunes the hapax tail).",
)
def text_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    t = d.select(
        "doc_id", F.explode(F.array_distinct(tokens(F.col("text")))).alias("term")
    )
    return (
        t.groupBy("term")
        .agg(
            F.count(F.lit(1)).alias("df"),
            F.concat_ws(
                ",",
                F.transform(
                    F.array_sort(F.collect_list("doc_id")),
                    lambda x: x.cast("string"),
                ),
            ).alias("postings"),
        )
        .filter(F.col("df") >= 25)
    )


# ---------------------------------------------------------------------------
# Fixed-bin histogram (the profiling/EDA primitive): 5000-wide price bins
# with a terminal catch-all bucket. Bin assignment is a pure map-side
# expression on each row (floor of a division — no two-pass min/max scan,
# unlike events_value_winsorize which deliberately exercises the two-pass
# shape), so the whole query is one partial+final hash agg on ~21 keys.
# ---------------------------------------------------------------------------
@register(
    "price_histogram",
    sql="""
    SELECT CAST(least(floor(l_extendedprice / 5000), 20) AS INT) AS bin,
           COUNT(*) AS n,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
    FROM lineitem GROUP BY 1
    """,
    doc="Fixed-width price histogram: map-side bin expr, one hash agg.",
)
def price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    bin_col = F.least(
        F.floor(F.col("l_extendedprice") / 5000), F.lit(20)
    ).cast("int")
    return l.groupBy(bin_col.alias("bin")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(_dec("l_extendedprice")).cast("double").alias("sum_price"),
    )


# ---------------------------------------------------------------------------
# Percent-of-total: window aggregate OVER the output of a hash aggregate
# (share-of-whole reporting shape). The window has no partition key — a
# single-partition exchange — but its input is the aggregate (a handful
# of rows), never the raw table; share = exact decimal sums divided in
# double, deterministic on both engines.
# ---------------------------------------------------------------------------
@register(
    "segment_share_of_total",
    sql="""
    WITH seg AS (
      SELECT c_mktsegment, COUNT(*) AS n_cust,
             SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS seg_bal
      FROM customer GROUP BY 1
    )
    SELECT c_mktsegment, n_cust, CAST(seg_bal AS DOUBLE) AS seg_bal,
           round(CAST(seg_bal AS DOUBLE) / CAST(SUM(seg_bal) OVER () AS DOUBLE),
                 6) AS share
    FROM seg
    """,
    doc="Share-of-total per market segment: window over aggregate output.",
)
def segment_share_of_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    seg = c.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_cust"),
        F.sum(_dec("c_acctbal")).alias("seg_bal"),
    )
    w = W.partitionBy()
    return seg.select(
        "c_mktsegment",
        "n_cust",
        F.col("seg_bal").cast("double").alias("seg_bal"),
        F.round(
            F.col("seg_bal").cast("double")
            / F.sum("seg_bal").over(w).cast("double"),
            6,
        ).alias("share"),
    )


# ---------------------------------------------------------------------------
# Cohort retention (the product-analytics staple): users grouped by their
# first active day; for each (cohort, day-offset) cell, how many of that
# cohort's users were active. Two shuffles — the distinct (user, day)
# projection feeds both the per-user min (cohort assignment) and the
# activity join, which co-partition on user_id, then one agg on the
# (cohort, offset) cell key.
# ---------------------------------------------------------------------------
@register(
    "events_retention_cohort",
    sql="""
    WITH a AS (
      SELECT DISTINCT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d
      FROM events
    ),
    f AS (SELECT user_id, min(d) AS d0 FROM a GROUP BY 1)
    SELECT strftime(d0, '%Y-%m-%d') AS cohort,
           CAST(date_diff('day', d0, d) AS INT) AS offset_days,
           COUNT(*) AS n_users
    FROM a JOIN f USING (user_id)
    GROUP BY 1, 2
    """,
    doc="Cohort retention matrix: first-active-day cohort x day offset "
    "-> active user count.",
)
def events_retention_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    a = e.select("user_id", F.to_date(F.col("ts")).alias("d")).distinct()
    f = a.groupBy("user_id").agg(F.min("d").alias("d0"))
    return (
        a.join(f, "user_id")
        .groupBy(
            F.date_format(F.col("d0"), "yyyy-MM-dd").alias("cohort"),
            F.datediff(F.col("d"), F.col("d0")).alias("offset_days"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


# ---------------------------------------------------------------------------
# Pareto / cumulative-share: the smallest prefix of customers (by revenue,
# descending) that covers 80% of total revenue. Running sums stay in
# exact decimal over the window; only the final share division goes to
# double. Both windows run over the AGGREGATE output (one row per
# customer), never raw orders — the global-order sort is post-agg sized.
# The filter keeps every row whose PRECEDING prefix is still under the
# threshold, so the crossing row is included (classic Pareto cut).
# ---------------------------------------------------------------------------
@register(
    "orders_pareto_customers",
    sql="""
    WITH r AS (
      SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS revenue
      FROM orders GROUP BY 1
    ),
    c AS (
      SELECT o_custkey, revenue,
             SUM(revenue) OVER (ORDER BY revenue DESC, o_custkey ASC
                                ROWS UNBOUNDED PRECEDING) AS cum,
             SUM(revenue) OVER () AS total
      FROM r
    )
    SELECT o_custkey, CAST(revenue AS DOUBLE) AS revenue,
           round(CAST(cum AS DOUBLE) / CAST(total AS DOUBLE), 6) AS cum_share
    FROM c
    WHERE CAST(cum - revenue AS DOUBLE) / CAST(total AS DOUBLE) < 0.8
    """,
    doc="Pareto cut: top customers covering 80% of revenue; exact-decimal "
    "running share over post-aggregate rows.",
)
def orders_pareto_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dsacord_spark.plans.distrib import _global_cumsum

    o = table(spark, sf_dir, "orders")
    r = o.groupBy("o_custkey").agg(F.sum(_dec("o_totalprice")).alias("revenue"))
    # distributed running share: the per-customer frame is
    # user-population-sized at scale, so both the running sum and the
    # grand total avoid unpartitioned windows (the total rides a 1-row
    # broadcast aggregate; exact decimal addition is order-insensitive)
    tot = r.agg(F.sum("revenue").alias("total"))
    c = _global_cumsum(
        r,
        [F.col("revenue").desc(), F.col("o_custkey").asc()],
        {"cum": F.col("revenue")},
    ).crossJoin(F.broadcast(tot))
    return c.filter(
        (F.col("cum") - F.col("revenue")).cast("double")
        / F.col("total").cast("double")
        < 0.8
    ).select(
        "o_custkey",
        F.col("revenue").cast("double").alias("revenue"),
        F.round(
            F.col("cum").cast("double") / F.col("total").cast("double"), 6
        ).alias("cum_share"),
    )


# ---------------------------------------------------------------------------
# Market-basket co-occurrence: part pairs bought together in the same
# order, ranked by support. The pair stage is an equi-self-join on
# l_orderkey — pair count per order is bounded by basket size (~7 items
# -> ~21 pairs), so the blow-up is per-basket-quadratic, never
# corpus-quadratic, and the join co-partitions both sides on one key.
# Items are deduped per order first (a part can appear on several lines)
# and ordered a < b so each unordered pair appears once.
# ---------------------------------------------------------------------------
@register(
    "basket_part_pairs_topk",
    sql="""
    WITH items AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    )
    SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
           COUNT(*) AS n_orders
    FROM items a JOIN items b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY 1, 2
    ORDER BY n_orders DESC, part_a ASC, part_b ASC
    LIMIT 25
    """,
    doc="Within-order part-pair co-occurrence, top-25 by support "
    "(basket-bounded self-join, orderkey co-partitioned).",
)
def basket_part_pairs_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    items = l.select("l_orderkey", "l_partkey").distinct()
    a = items.alias("a")
    b = items.alias("b")
    return (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy(
            F.col("n_orders").desc(), F.col("part_a").asc(), F.col("part_b").asc()
        )
        .limit(25)
    )


# ---------------------------------------------------------------------------
# Sweep-line concurrency: how many user activity intervals (first to last
# event of each user's day) are open simultaneously, reported as the max
# per hour. The classic interval-overlap algorithm as a dataflow:
# intervals unpivot to +1/-1 boundary events, a running sum over the
# boundary order IS the concurrency curve. The running sum is the
# distributed two-pass prefix sum (plans/distrib._global_cumsum) over
# the 2 x (users x days) boundary rows — corpus-growing, so never
# funneled through one partition; ties order +1 before -1 (inclusive
# overlap), then by (user, day) so the running sum is a strict total
# order on both engines. Timestamps stay integer microseconds
# end-to-end.
# ---------------------------------------------------------------------------
@register(
    "events_concurrency_sweep",
    sql="""
    WITH a AS (
      SELECT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d,
             epoch_us(CAST(ts AS TIMESTAMP)) AS tu
      FROM events
    ),
    iv AS (SELECT user_id, d, min(tu) AS s, max(tu) AS e FROM a GROUP BY 1, 2),
    b AS (
      SELECT user_id, d, s AS t, 1 AS delta FROM iv
      UNION ALL
      SELECT user_id, d, e AS t, -1 AS delta FROM iv
    ),
    c AS (
      SELECT t,
             CAST(SUM(delta) OVER (ORDER BY t ASC, delta DESC,
                                   user_id ASC, d ASC
                                   ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS conc
      FROM b
    )
    SELECT strftime(time_bucket(INTERVAL 1 HOUR, make_timestamp(t)),
                    '%Y-%m-%d %H:%M:%S') AS hr_str,
           max(conc) AS max_concurrency
    FROM c GROUP BY 1
    """,
    doc="Sweep-line max concurrency of user-day activity intervals per "
    "hour (+1/-1 boundary unpivot, running sum over post-agg rows).",
)
def events_concurrency_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    a = e.select("user_id", F.to_date("ts").alias("d"), F.col("ts_us"))
    iv = a.groupBy("user_id", "d").agg(
        F.min("ts_us").alias("s"), F.max("ts_us").alias("e")
    )
    b = iv.select(
        "user_id", "d", F.col("s").alias("t"), F.lit(1).alias("delta")
    ).unionAll(
        iv.select("user_id", "d", F.col("e").alias("t"), F.lit(-1).alias("delta"))
    )
    from dsacord_spark.plans.distrib import _global_cumsum

    # distributed sweep-line: the boundary frame is 2 x (users x days)
    # rows — corpus-growing — so the running sum uses the two-pass
    # prefix-sum instead of an unpartitioned window
    c = _global_cumsum(
        b,
        [
            F.col("t").asc(),
            F.col("delta").desc(),
            F.col("user_id").asc(),
            F.col("d").asc(),
        ],
        {"conc": F.col("delta")},
    ).select("t", F.col("conc").cast("long").alias("conc"))
    return c.groupBy(
        _ts_str(F.date_trunc("hour", F.timestamp_micros(F.col("t")))).alias(
            "hr_str"
        )
    ).agg(F.max("conc").alias("max_concurrency"))


# ---------------------------------------------------------------------------
# Longest consecutive-day streak per user (gaps-and-islands at daily
# grain — the engagement metric counterpart of sessionization's
# minute-grain islands). The island key is date minus row_number days:
# constant within a consecutive run, strictly monotone across gaps.
# Everything shuffles on user_id once; islands and the per-user max are
# co-partitioned follow-up aggregates.
# ---------------------------------------------------------------------------
@register(
    "events_longest_streak",
    sql="""
    WITH a AS (
      SELECT DISTINCT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d
      FROM events
    ),
    r AS (
      SELECT user_id, d,
             d - CAST(row_number() OVER (PARTITION BY user_id ORDER BY d)
                      AS INT) AS anchor
      FROM a
    ),
    isl AS (
      SELECT user_id, anchor, COUNT(*) AS len
      FROM r GROUP BY user_id, anchor
    )
    SELECT user_id,
           MAX(len) AS longest_streak,
           CAST(SUM(len) AS BIGINT) AS n_active_days
    FROM isl GROUP BY user_id
    """,
    doc="Gaps-and-islands: longest run of consecutive active days per "
    "user (date minus row_number anchor).",
)
def events_longest_streak(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    a = e.select("user_id", F.to_date("ts").alias("d")).distinct()
    w = W.partitionBy("user_id").orderBy("d")
    r = a.withColumn(
        "anchor", F.date_sub(F.col("d"), F.row_number().over(w))
    )
    isl = r.groupBy("user_id", "anchor").agg(F.count(F.lit(1)).alias("len"))
    return isl.groupBy("user_id").agg(
        F.max("len").alias("longest_streak"),
        F.sum("len").cast("long").alias("n_active_days"),
    )


# ---------------------------------------------------------------------------
# Month-over-month revenue growth: lag ratio over the monthly aggregate.
# Revenue stays exact decimal through the aggregation and the lag; only
# the growth ratio divides in double (deterministic operands). The lag
# window runs over O(months) post-agg rows in one partition — by
# construction tiny.
# ---------------------------------------------------------------------------
@register(
    "orders_mom_growth",
    sql="""
    WITH m AS (
      SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS revenue
      FROM orders GROUP BY 1
    )
    SELECT month, CAST(revenue AS DOUBLE) AS revenue,
           round(CAST(revenue - lag(revenue) OVER (ORDER BY month) AS DOUBLE)
                 / CAST(lag(revenue) OVER (ORDER BY month) AS DOUBLE), 6)
             AS mom_growth
    FROM m
    """,
    doc="Month-over-month growth: decimal-exact monthly sums, lag-ratio "
    "window over post-agg rows.",
)
def orders_mom_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    m = o.groupBy(
        F.date_format(F.date_trunc("month", F.col("o_orderdate")), "yyyy-MM-dd")
        .alias("month")
    ).agg(F.sum(_dec("o_totalprice")).alias("revenue"))
    w = W.orderBy("month")
    prev = F.lag("revenue").over(w)
    return m.select(
        "month",
        F.col("revenue").cast("double").alias("revenue"),
        F.round(
            (F.col("revenue") - prev).cast("double") / prev.cast("double"), 6
        ).alias("mom_growth"),
    )


# ---------------------------------------------------------------------------
# Event-type transition matrix (first-order Markov counts): for each
# consecutive pair of events within a user's timeline, count
# (from_type -> to_type) and its share of all transitions leaving
# from_type. One user_id shuffle for the lag window, then a hash agg on
# the ~types^2 pair key; the share divides two exact integers.
# ---------------------------------------------------------------------------
@register(
    "events_type_transitions",
    sql="""
    WITH seq AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY epoch_us(CAST(ts AS TIMESTAMP)),
                                            event_id) AS prev_type
      FROM events
    ),
    pairs AS (
      SELECT prev_type AS from_type, event_type AS to_type, COUNT(*) AS n
      FROM seq WHERE prev_type IS NOT NULL GROUP BY 1, 2
    )
    SELECT from_type, to_type, n,
           round(CAST(n AS DOUBLE)
                 / SUM(n) OVER (PARTITION BY from_type), 6) AS share
    FROM pairs
    """,
    doc="First-order Markov transition matrix over per-user event "
    "sequences, with per-source-type shares.",
)
def events_type_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.col("ts_us").asc(), F.col("event_id").asc())
    seq = e.select(
        "user_id",
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
    )
    pairs = (
        seq.filter(F.col("prev_type").isNotNull())
        .groupBy(
            F.col("prev_type").alias("from_type"),
            F.col("event_type").alias("to_type"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    ws = W.partitionBy("from_type")
    return pairs.select(
        "from_type",
        "to_type",
        "n",
        F.round(F.col("n").cast("double") / F.sum("n").over(ws), 6).alias("share"),
    )
