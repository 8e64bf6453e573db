"""Corpus/data-quality operators, round-2 additions to layer B: C4-style
boilerplate-window coverage, a token-commonness (rarity) score, embedding
label-centroid structure, robust (MAD) outlier detection, count-min
heavy hitters (batch + streaming-merged twins), HLL distinct over
micro-batches, the sequence-packing plan, and time-series similarity
search over per-user activity profiles.

These close the remaining gaps a pretraining-data pipeline hits after
dedup/decontamination: *boilerplate removal* (the C4/RefinedWeb step that
strips text fragments repeated across many unrelated pages), a *vocabulary
commonness score* (the integer-exact stand-in for a unigram-LM quality
gate — gibberish has rare "words", boilerplate has ultra-common ones), and
*label-centroid cosine structure* over the embedding table (the standard
first look at whether labels are separable before spending on a probe).

Determinism notes (registry.py rules apply):
- boilerplate/rarity arithmetic is pure integer counting until one final
  IEEE division, so both engines produce bit-identical doubles;
- centroid sums fold the per-label vectors in vec_id order via
  F.aggregate / list_reduce — both engines accumulate doubles strictly
  left-to-right over the same sequence, so the centroids (and the cosines
  derived from them) are bit-identical. A plain SUM() over rows would NOT
  be deterministic under AQE; the sorted fold is the point.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from dsacord_spark.functions.hashing import md5_long, md5_long_sql
from dsacord_spark.functions.text import tokens
from dsacord_spark.functions.vectors import cosine, to_double_array
from dsacord_spark.plans.analysis import _TOKS_SQL
from dsacord_spark.plans.registry import register, table

# ---------------------------------------------------------------------------
# Boilerplate-window coverage (C4 / RefinedWeb "repeated fragment" gate).
# A word 8-gram window that occurs in >= 3 DISTINCT documents is
# boilerplate evidence; a document's boilerplate fraction is the share of
# its token positions covered by at least one such window. This is the
# position-level refinement of dedup_chunk_exact: overlapping windows,
# document-frequency threshold, and exact union-of-intervals coverage.
# Scale: the window index is one scan + one shuffle on the 60-bit window
# hash; the coverage explode is bounded by (boilerplate windows x 8), i.e.
# by true boilerplate density, never corpus x corpus. At 100 TB the
# window-hash index is a materialized bucketed table shared with the
# dedup/decontamination family.
# ---------------------------------------------------------------------------
_BP_N = 8
_BP_DF = 3
_BP_KEEP = 0.3


@register(
    "text_boilerplate_coverage",
    sql=f"""
    WITH toks AS (
      SELECT doc_id, {_TOKS_SQL.format(c='text')} AS t FROM documents),
    tk AS (SELECT doc_id AS doc, t, len(t) AS n_tokens FROM toks
           WHERE len(t) >= 1),
    win AS (
      SELECT doc, n_tokens, i,
             {md5_long_sql(f"array_to_string(t[i:i+{_BP_N - 1}], ' ')")} AS hg
      FROM tk,
           unnest(generate_series(1, greatest(n_tokens-{_BP_N - 1}, 1))) AS u(i)),
    boiler AS (
      SELECT hg FROM (
        SELECT hg, count(DISTINCT doc) AS nd FROM win GROUP BY hg)
      WHERE nd >= {_BP_DF}),
    cov AS (
      SELECT DISTINCT doc, p
      FROM win JOIN boiler USING (hg),
           unnest(generate_series(i, least(i+{_BP_N - 1}, n_tokens))) AS v(p)),
    covc AS (SELECT doc, count(*) AS n_boiler_tokens FROM cov GROUP BY doc)
    SELECT tk.doc AS doc_id, tk.n_tokens,
           COALESCE(n_boiler_tokens, 0) AS n_boiler_tokens,
           round(CAST(COALESCE(n_boiler_tokens, 0) AS DOUBLE) / tk.n_tokens, 6)
             AS boiler_frac,
           (CAST(COALESCE(n_boiler_tokens, 0) AS DOUBLE) / tk.n_tokens
             <= {_BP_KEEP}) AS keep
    FROM tk LEFT JOIN covc ON covc.doc = tk.doc
    """,
    doc="C4-style boilerplate gate: word 8-gram windows occurring in >= 3 "
    "distinct docs are boilerplate; per doc, the exact token-position "
    "coverage of those windows (union of overlapping intervals), the "
    "covered fraction, and a keep flag (frac <= 0.3). One shuffle on the "
    "window hash; coverage cost bounded by true boilerplate density.",
)
def text_boilerplate_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    tk = (
        d.select(F.col("doc_id").alias("doc"), tokens("text").alias("t"))
        .withColumn("n_tokens", F.size("t"))
        .filter(F.col("n_tokens") >= 1)
    )
    # materialize t before the per-offset slice (see _shingle_index note:
    # inlining the tokenizer makes Catalyst re-split once per offset)
    win = (
        tk.select(
            "doc",
            "n_tokens",
            "t",
            F.explode(
                F.sequence(
                    F.lit(1),
                    F.greatest(F.col("n_tokens") - F.lit(_BP_N - 1), F.lit(1)),
                )
            ).alias("i"),
        )
        .select(
            "doc",
            "n_tokens",
            "i",
            md5_long(
                F.concat_ws(" ", F.slice(F.col("t"), F.col("i"), _BP_N))
            ).alias("hg"),
        )
        .persist()
    )
    boiler = (
        win.groupBy("hg")
        .agg(F.count_distinct("doc").alias("nd"))
        .filter(F.col("nd") >= _BP_DF)
        .select("hg")
    )
    cov = (
        win.join(boiler, "hg")
        .select(
            "doc",
            F.explode(
                F.sequence(
                    F.col("i"),
                    F.least(F.col("i") + F.lit(_BP_N - 1), F.col("n_tokens")),
                )
            ).alias("p"),
        )
        .distinct()
        .groupBy("doc")
        .agg(F.count(F.lit(1)).alias("n_boiler_tokens"))
    )
    frac = F.coalesce(F.col("n_boiler_tokens"), F.lit(0)).cast("double") / F.col(
        "n_tokens"
    )
    # every doc with n_tokens >= 1 emits at least one window (offset 1 is
    # always generated), so the per-doc size list is served from the
    # persisted window frame instead of re-tokenizing the corpus
    sizes = win.select("doc", "n_tokens").distinct()
    return (
        sizes
        .join(cov, "doc", "left")
        .select(
            F.col("doc").alias("doc_id"),
            "n_tokens",
            F.coalesce(F.col("n_boiler_tokens"), F.lit(0)).alias(
                "n_boiler_tokens"
            ),
            F.round(frac, 6).alias("boiler_frac"),
            (frac <= _BP_KEEP).alias("keep"),
        )
    )


# ---------------------------------------------------------------------------
# Token-commonness (rarity) score: the integer-exact surrogate for a
# unigram-LM quality gate. Mean/min corpus collection-frequency of a
# document's tokens: gibberish scores a LOW mean (its "words" are rare),
# boilerplate scores HIGH (ultra-common tokens). Integer sums both sides
# (ln-based logprob is only faithfully rounded and could flip a rounding
# boundary between engines — same reasoning as text_tfidf_topk's rational
# idf). Scale: the token->cf table is a vocabulary-sized dimension —
# orders of magnitude smaller than the corpus — so it broadcasts and the
# token stream never shuffles; one partial-aggregated groupBy per doc.
# ---------------------------------------------------------------------------


@register(
    "text_rarity_score",
    sql=f"""
    WITH toks AS (
      SELECT doc_id, {_TOKS_SQL.format(c='text')} AS t FROM documents),
    tok AS (SELECT doc_id, tk FROM toks, unnest(t) AS u(tk)),
    cf AS (SELECT tk, count(*) AS cf FROM tok GROUP BY tk)
    SELECT doc_id,
           count(*) AS n_tokens,
           CAST(sum(cf) AS BIGINT) AS sum_cf,
           CAST(min(cf) AS BIGINT) AS min_cf,
           round(CAST(sum(cf) AS DOUBLE) / count(*), 6) AS mean_cf
    FROM tok JOIN cf USING (tk)
    GROUP BY doc_id
    """,
    doc="Unigram commonness score per document: mean and min corpus "
    "collection-frequency of its tokens (integer-exact unigram-LM "
    "surrogate; low mean = gibberish-like rare vocabulary, high mean = "
    "stopword/boilerplate-like). The vocabulary cf table broadcasts.",
)
def text_rarity_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(tokens("text")).alias("tk"))
    cf = tok.groupBy("tk").agg(F.count(F.lit(1)).alias("cf"))
    return (
        tok.join(F.broadcast(cf), "tk")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("cf").alias("sum_cf"),
            F.min("cf").alias("min_cf"),
            F.round(
                F.sum("cf").cast("double") / F.count(F.lit(1)), 6
            ).alias("mean_cf"),
        )
    )


# ---------------------------------------------------------------------------
# Label-centroid cosine structure over the embedding table: per-label mean
# vector, then pairwise centroid cosines — the first-look separability
# report before spending on a trained probe (high off-diagonal cosine =
# confusable label pair). Determinism: per-label sums fold the vectors in
# vec_id order (F.aggregate / list_reduce are strict left-to-right), so
# both engines accumulate the identical double sequence. Scale: labels are
# few; collect_list per label is bounded by the largest class. At 100 TB
# the same fold runs per partition with a final ordered merge of partial
# (sum, count) pairs — or drop exactness and use plain SUM; the catalog
# keeps the oracle-exact form.
# ---------------------------------------------------------------------------


def _label_centroids(e: DataFrame) -> DataFrame:
    """(label, n, cent): exact per-label mean vectors via the vec_id-
    ordered fold — THE single centroid definition, shared by the
    separability report and the label-noise probe."""
    g = e.groupBy("label").agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.col("vec_id"), to_double_array("embedding").alias("v")
                )
            )
        ).alias("vs"),
        F.count(F.lit(1)).alias("n"),
    )
    zero = F.transform(F.col("vs")[0]["v"], lambda x: F.lit(0.0))
    summed = F.aggregate(
        F.col("vs"),
        zero,
        lambda acc, s: F.zip_with(acc, s["v"], lambda a, b: a + b),
    )
    return g.select(
        "label", "n", F.transform(summed, lambda x: x / F.col("n")).alias("cent")
    )


@register(
    "embed_label_centroids",
    sql="""
    WITH g AS (
      SELECT label, list(CAST(embedding AS DOUBLE[]) ORDER BY vec_id) AS vs,
             count(*) AS n
      FROM embeddings GROUP BY label),
    c AS (
      SELECT label, CAST(n AS BIGINT) AS n,
        list_transform(
          list_reduce(vs, (acc, v) ->
            list_transform(generate_series(1, len(acc)), i -> acc[i] + v[i])),
          x -> x / n) AS cent
      FROM g)
    SELECT a.label AS label_a, b.label AS label_b,
           a.n AS n_a, b.n AS n_b,
           round(list_dot_product(a.cent, b.cent) /
                 (sqrt(list_dot_product(a.cent, a.cent)) *
                  sqrt(list_dot_product(b.cent, b.cent))), 6)
             AS centroid_cosine
    FROM c a JOIN c b ON a.label < b.label
    WHERE list_dot_product(a.cent, a.cent) > 0
      AND list_dot_product(b.cent, b.cent) > 0
    """,
    doc="Pairwise label-centroid cosines over the embedding table (label "
    "separability report). Centroid sums fold vectors in vec_id order on "
    "both engines, so results are bit-identical; the pair join is over "
    "the tiny label set. Zero-norm centroids (a degenerate label whose "
    "mean vector is exactly 0) are excluded on BOTH engines — without "
    "the guard Spark's try_divide yields NULL while DuckDB divides to "
    "inf/NaN (same guard as embed_label_noise_topk).",
)
def embed_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dsacord_spark.functions.vectors import dot

    e = table(spark, sf_dir, "embeddings")
    cents = _label_centroids(e).filter(dot("cent", "cent") > 0)
    a = cents.select(
        F.col("label").alias("label_a"),
        F.col("n").alias("n_a"),
        F.col("cent").alias("ca"),
    )
    b = cents.select(
        F.col("label").alias("label_b"),
        F.col("n").alias("n_b"),
        F.col("cent").alias("cb"),
    )
    return (
        a.join(F.broadcast(b), F.col("label_a") < F.col("label_b"))
        .select(
            "label_a",
            "label_b",
            "n_a",
            "n_b",
            F.round(cosine(F.col("ca"), F.col("cb")), 6).alias(
                "centroid_cosine"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Robust (MAD) outlier detection per event_type: median and median
# absolute deviation via EXACT interpolated percentiles (Spark
# `percentile` == DuckDB `quantile_cont`, same parity agg_percentiles
# pins), then the standard |x - med| > 3*MAD flag. Robust stats are the
# data-quality twin of events_value_winsorize: winsorizing clamps tails,
# this one *reports* them without being corrupted by them (a mean/stddev
# z-score moves with the outliers it is hunting; percentile selection
# does not — and unlike stddev's float sum-of-squares, it is
# order-deterministic, so the value oracle stays exact). Scale: three
# scans of the events stream (median, stats, outlier count) with only
# the tiny per-type frames persisted and broadcast; no shuffle of the
# raw stream beyond the groupBys' partial aggs.
# ---------------------------------------------------------------------------


@register(
    "events_anomaly_mad",
    sql="""
    WITH med AS (
      SELECT event_type, quantile_cont(value, 0.5) AS med
      FROM events GROUP BY event_type),
    j AS (
      SELECT e.event_type, abs(e.value - m.med) AS adev, m.med
      FROM events e JOIN med m USING (event_type)),
    st AS (
      SELECT event_type, count(*) AS n, min(med) AS med,
             quantile_cont(adev, 0.5) AS mad
      FROM j GROUP BY event_type),
    o AS (
      SELECT j.event_type, count(*) AS n_outliers
      FROM j JOIN st USING (event_type)
      WHERE adev > 3 * mad GROUP BY j.event_type)
    SELECT st.event_type, CAST(n AS BIGINT) AS n_events,
           round(med, 6) AS median_value,
           round(mad, 6) AS mad_value,
           CAST(COALESCE(n_outliers, 0) AS BIGINT) AS n_outliers,
           round(CAST(COALESCE(n_outliers, 0) AS DOUBLE) / n, 6)
             AS outlier_frac
    FROM st LEFT JOIN o USING (event_type)
    """,
    doc="Robust outlier report per event_type: exact interpolated median "
    "and MAD (order-deterministic percentile selection, not float "
    "moment sums), count and fraction of |value - median| > 3*MAD "
    "events. Three scans of the stream (med, stats, outlier count) with "
    "only the tiny per-type frames persisted/broadcast — caching the "
    "full deviation stream would cost more than the re-scan at scale.",
)
def events_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events").select("event_type", "value")
    # med and st are per-type rows (tiny) but their subtrees scan the
    # whole stream; both feed two consumers and Spark does no CSE across
    # join branches, so persist them — unpersisted, the plan re-scans
    # events ~6x and computes the exact percentile 3x
    med = e.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.5)).alias("med")
    ).persist()
    j = e.join(F.broadcast(med), "event_type").select(
        "event_type", F.abs(F.col("value") - F.col("med")).alias("adev"), "med"
    )
    st = j.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("med").alias("med"),
        F.percentile("adev", F.lit(0.5)).alias("mad"),
    ).persist()
    o = (
        j.join(F.broadcast(st.select("event_type", "mad")), "event_type")
        .filter(F.col("adev") > 3 * F.col("mad"))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_outliers"))
    )
    return (
        st.join(o, "event_type", "left")
        .select(
            "event_type",
            F.col("n").alias("n_events"),
            F.round("med", 6).alias("median_value"),
            F.round("mad", 6).alias("mad_value"),
            F.coalesce(F.col("n_outliers"), F.lit(0)).alias("n_outliers"),
            F.round(
                F.coalesce(F.col("n_outliers"), F.lit(0)).cast("double")
                / F.col("n"),
                6,
            ).alias("outlier_frac"),
        )
    )


# ---------------------------------------------------------------------------
# Count-min-sketch heavy hitters: the streaming/mergeable answer to
# text_token_topk. A depth-4 x width-1024 CMS built with the engine's
# md5 hash family — deterministic constants, so (like the MinHash/LSH
# family) the sketch is bit-reproducible in DuckDB and the entry gets a
# FULL value oracle instead of a rows-only check. Output carries both
# the sketch estimate and the exact count, making the one-sided error
# (cms_count >= exact_count, within n_tokens/width) visible and
# gate-able. Scale: the sketch is built from the vocabulary-sized
# (token, count) table, not the occurrence stream — explode x depth of
# the vocab, one 4096-group aggregation, broadcast join back; counters
# merge across shards/streams by addition (the point of a CMS at
# 100 TB: a fixed 32 KB summary per partition, merged associatively).
# ---------------------------------------------------------------------------
_CMS_DEPTH = 4
_CMS_WIDTH = 1024

_CMS_SQL = f"""
    WITH toks AS (
      SELECT doc_id, {_TOKS_SQL.format(c='text')} AS t FROM documents),
    tok AS (SELECT tk FROM toks, unnest(t) AS u(tk)),
    exact AS (SELECT tk, count(*) AS cnt FROM tok GROUP BY tk),
    lv AS (
      SELECT tk, cnt, i,
             {md5_long_sql("tk || '#' || CAST(i AS VARCHAR)")} % {_CMS_WIDTH} AS b
      FROM exact, unnest([{", ".join(map(str, range(_CMS_DEPTH)))}]) AS u(i)),
    cms AS (SELECT i, b, CAST(sum(cnt) AS BIGINT) AS w FROM lv GROUP BY i, b),
    est AS (
      SELECT tk, min(w) AS cms_count, min(cnt) AS exact_count
      FROM lv JOIN cms USING (i, b) GROUP BY tk)
    SELECT tk AS token,
           CAST(cms_count AS BIGINT) AS cms_count,
           CAST(exact_count AS BIGINT) AS exact_count,
           row_number() OVER (ORDER BY cms_count DESC, tk ASC) AS rank
    FROM est ORDER BY cms_count DESC, tk ASC LIMIT 10
    """


def _cms_probes():
    """(i, b) probe structs for a token column `tk` — THE single
    definition of the CMS hash positions (shared by the batch build and
    the streaming partials; drift would desynchronize the counters)."""
    return F.array(
        *[
            F.struct(
                F.lit(i).alias("i"),
                (
                    md5_long(F.concat_ws("#", F.col("tk"), F.lit(str(i))))
                    % _CMS_WIDTH
                ).alias("b"),
            )
            for i in range(_CMS_DEPTH)
        ]
    )


def _cms_top10(lv: DataFrame) -> DataFrame:
    """counters + top-10 from the (tk, cnt, i, b) probe frame: bucket
    sums, broadcast back, min-over-depth estimate, ranked top-10."""
    from pyspark.sql import Window as W

    cms = lv.groupBy("i", "b").agg(F.sum("cnt").alias("w"))
    est = (
        lv.join(F.broadcast(cms), ["i", "b"])
        .groupBy("tk")
        .agg(
            F.min("w").alias("cms_count"),
            F.min("cnt").alias("exact_count"),
        )
    )
    # top-k via orderBy+limit (TakeOrderedAndProject: parallel partial
    # top-10 per partition, no global sort); the rank window then runs
    # over only the 10 survivors — a bare row_number window here would
    # funnel the whole vocabulary through one partition
    top = est.orderBy(F.col("cms_count").desc(), F.col("tk").asc()).limit(10)
    win = W.orderBy(F.col("cms_count").desc(), F.col("tk").asc())
    return top.withColumn("rank", F.row_number().over(win)).select(
        F.col("tk").alias("token"), "cms_count", "exact_count", "rank"
    )


@register(
    "text_heavy_hitters_cms",
    sql=_CMS_SQL,
    doc="Top-10 heavy-hitter tokens by a depth-4 x width-1024 count-min "
    "sketch (deterministic md5 hash family -> full value oracle), with "
    "the exact count alongside so the sketch's one-sided error is "
    "visible. Built from the vocab-sized count table; counters merge by "
    "addition across shards.",
)
def text_heavy_hitters_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    tok = d.select(F.explode(tokens("text")).alias("tk"))
    exact = tok.groupBy("tk").agg(F.count(F.lit(1)).alias("cnt")).persist()
    lv = exact.select("tk", "cnt", F.explode(_cms_probes()).alias("p")).select(
        "tk", "cnt", "p.i", "p.b"
    )
    return _cms_top10(lv)


@register(
    "stream_heavy_hitters_cms",
    sql=_CMS_SQL,
    doc="The SAME top-10 CMS answer computed on the real streaming path: "
    "documents staged as 4 files drained one micro-batch each "
    "(maxFilesPerTrigger=1), per-batch PARTIAL (token, i, b) counts "
    "appended via foreachBatch, merged by addition afterwards — the "
    "mergeable-sketch property exercised for real, same oracle as the "
    "batch formulation.",
)
def stream_heavy_hitters_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dsacord_spark.streaming.pipeline import run_bounded_stream

    d = table(spark, sf_dir, "documents").select("text").repartition(4)

    def batch_partial(batch: DataFrame) -> DataFrame:
        # pre-aggregate to the vocab-sized (token, count) table BEFORE
        # exploding probes — same scale point as the batch build: probe
        # hashing and shuffle input cost distinct_tokens x depth, not
        # occurrences x depth
        cnt = (
            batch.select(F.explode(tokens("text")).alias("tk"))
            .groupBy("tk")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        return cnt.select(
            "tk", "c", F.explode(_cms_probes()).alias("p")
        ).select("tk", "p.i", "p.b", "c")

    partials = run_bounded_stream(
        spark,
        d,
        lambda s: s,
        reader_options={"maxFilesPerTrigger": "1"},
        batch_transform=batch_partial,
    )
    # merge partial sketches by addition (the CMS merge operator), then
    # reuse the exact same counter->top-10 path as the batch entry
    merged = partials.groupBy("tk", "i", "b").agg(F.sum("c").alias("cnt"))
    return _cms_top10(merged)


# ---------------------------------------------------------------------------
# Sequence-packing plan: GPT-style contiguous packing of the tokenized
# corpus into fixed-length training sequences (capacity 512 tokens).
# Docs are deterministically sharded (hash mod 32 — the unit of parallel
# packing at scale), ordered by doc_id within the shard, and assigned to
# the bin their starting offset falls in (floor(cum_before / 512): docs
# straddling a boundary spill into the next bin, exactly like the
# concat-then-chunk packing every pretraining run uses). Output is the
# per-bin plan: doc count, token sum, and start/end offsets. Scale: one
# window per shard (shards are independent — no global ordering, which
# is the thing that would NOT scale), one final per-bin aggregation.
# ---------------------------------------------------------------------------
_PACK_SEQ = 512
_PACK_SHARDS = 32


@register(
    "corpus_pack_sequences",
    sql=f"""
    WITH toks AS (
      SELECT doc_id, len({_TOKS_SQL.format(c='text')}) AS n_tok FROM documents),
    sh AS (
      SELECT doc_id, n_tok,
             {md5_long_sql("CAST(doc_id AS VARCHAR)")} % {_PACK_SHARDS} AS shard
      FROM toks WHERE n_tok >= 1),
    cum AS (
      SELECT shard, doc_id, n_tok,
             CAST(COALESCE(sum(n_tok) OVER (
               PARTITION BY shard ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
               AS cum_before
      FROM sh),
    b AS (
      SELECT shard, doc_id, n_tok, cum_before,
             cum_before // {_PACK_SEQ} AS bin
      FROM cum)
    SELECT shard, bin,
           count(*) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS n_tokens,
           CAST(min(cum_before) AS BIGINT) AS start_offset,
           CAST(max(cum_before + n_tok) AS BIGINT) AS end_offset
    FROM b GROUP BY shard, bin
    """,
    doc="GPT-style sequence-packing plan: docs sharded by hash (the "
    "parallel packing unit), ordered by doc_id within shard, assigned "
    "to the 512-token bin their starting offset falls in "
    "(concat-then-chunk semantics). Per-(shard, bin) doc count, token "
    "sum, and offsets. One window per independent shard — no global "
    "ordering anywhere.",
)
def corpus_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    d = table(spark, sf_dir, "documents")
    tk = d.select(
        "doc_id", F.size(tokens("text")).alias("n_tok")
    ).filter(F.col("n_tok") >= 1)
    sh = tk.withColumn(
        "shard", md5_long(F.col("doc_id").cast("string")) % _PACK_SHARDS
    )
    win = (
        W.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    cum = sh.withColumn(
        "cum_before", F.coalesce(F.sum("n_tok").over(win), F.lit(0))
    )
    # integer division (`div`), NOT floor(x / cap): routing a bigint
    # through IEEE double loses exactness past 2^53 cumulative tokens per
    # shard, and the DuckDB oracle uses true integer division (`//`) —
    # `div` keeps the two engines' semantics identical at any offset
    b = cum.withColumn(
        "bin", F.expr(f"cum_before div {_PACK_SEQ}")
    )
    return b.groupBy("shard", "bin").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").alias("n_tokens"),
        F.min("cum_before").alias("start_offset"),
        F.max(F.col("cum_before") + F.col("n_tok")).alias("end_offset"),
    )


# ---------------------------------------------------------------------------
# Streaming approx-distinct via mergeable HLL sketches: the second
# mergeable-sketch streaming twin (CMS above counts frequencies; HLL
# counts cardinalities). Per micro-batch, hll_sketch_agg builds a binary
# sketch per group; afterwards hll_union_agg merges the partials and
# hll_sketch_estimate reads the cardinality — the exact shape of a
# 100 TB distinct-count: fixed-size sketch per partition/stream, one
# tiny union at the end, never a global distinct shuffle. Rows-only for
# the driver (sketch internals are engine-specific, same as
# agg_approx_distinct); the pytest gate bounds the error vs the exact
# count and pins stream-merged == batch-global estimates.
# ---------------------------------------------------------------------------


@register(
    "stream_approx_distinct_hll",
    # structural value oracle (r8, upgraded from rows-only): the merged
    # HLL estimate is engine-specific, but the exact distinct count is
    # SQL-exact and the sketch's error contract (<=5%: default
    # lgConfigK=12 -> rsd ~1.6%, so 5% is ~3 sigma) is a boolean both
    # engines can state — DuckDB as literal TRUE, Spark computed from
    # the stream-merged sketch. Stream-merged == batch-global estimate
    # parity stays pinned in pytest.
    sql="""
    SELECT o_orderstatus,
           COUNT(DISTINCT o_custkey) AS exact_customers,
           TRUE AS est_within_5pct
    FROM orders GROUP BY o_orderstatus
    """,
    doc="Distinct customers per order status on the real streaming path: "
    "per-micro-batch HLL sketches (hll_sketch_agg) merged with "
    "hll_union_agg — fixed-size mergeable state, no global distinct "
    "shuffle. Structural value oracle: exact count + 5pct error-contract "
    "boolean computed from the merged sketch.",
)
def stream_approx_distinct_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dsacord_spark.streaming.pipeline import run_bounded_stream

    o = table(spark, sf_dir, "orders").select(
        "o_orderstatus", "o_custkey"
    ).repartition(4)

    def batch_partial(batch: DataFrame) -> DataFrame:
        return batch.groupBy("o_orderstatus").agg(
            F.hll_sketch_agg("o_custkey").alias("sk")
        )

    partials = run_bounded_stream(
        spark,
        o,
        lambda s: s,
        reader_options={"maxFilesPerTrigger": "1"},
        batch_transform=batch_partial,
    )
    est = partials.groupBy("o_orderstatus").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk"))
        .cast("long")
        .alias("__approx")
    )
    exact = o.groupBy("o_orderstatus").agg(
        F.count_distinct("o_custkey").alias("exact_customers")
    )
    return est.join(exact, "o_orderstatus").select(
        "o_orderstatus",
        "exact_customers",
        (
            F.abs(F.col("__approx") - F.col("exact_customers"))
            <= 0.05 * F.col("exact_customers")
        ).alias("est_within_5pct"),
    )


# ---------------------------------------------------------------------------
# Time-series similarity search (the EDBT'19 / REPOSE theme from
# PAPERS.md, on the events table): each user's activity profile is the
# dense per-day value-sum vector over the corpus date span; for a
# deterministic probe subset, return the top-5 most-similar other users
# by cosine. Exactness: daily sums go through DECIMAL(18,2) (order-free)
# and convert to double once; vectors are built in day order on both
# engines; cosines use the shared strict-left-fold dot product; ranking
# uses raw (un-rounded) scores with a user tie-break. Scale: the per-day
# grid is |users| x |days| (bounded), probes broadcast against the
# profile table — the same bounded-probe brute-force shape as
# ann_bruteforce_topk; an LSH/IVF tier applies unchanged if the probe
# set grows.
# ---------------------------------------------------------------------------
# mod 50 yields several probes even at the sf0.01 oracle scale (150
# users), so the per-probe ranking/tie-break is actually exercised by
# the driver's value check, not just at sf0.1
_TS_PROBE_MOD = 50
_TS_TOPK = 5


@register(
    "events_user_similarity_topk",
    sql=f"""
    WITH e2 AS (
      SELECT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
             SUM(CAST(value AS DECIMAL(18,2))) AS s
      FROM events WHERE ts IS NOT NULL GROUP BY 1, 2),
    b AS (SELECT min(day) AS dmin, max(day) AS dmax FROM e2),
    spine AS (
      SELECT CAST(unnest(generate_series(CAST(dmin AS TIMESTAMP),
                                         CAST(dmax AS TIMESTAMP),
                                         INTERVAL 1 DAY)) AS DATE) AS day
      FROM b),
    u AS (SELECT DISTINCT user_id FROM e2),
    grid AS (SELECT user_id, day FROM u CROSS JOIN spine),
    v AS (
      SELECT user_id,
             list(CAST(COALESCE(s, 0) AS DOUBLE) ORDER BY day) AS vec
      FROM grid LEFT JOIN e2 USING (user_id, day)
      GROUP BY user_id),
    vv AS (
      SELECT user_id, vec, sqrt(list_dot_product(vec, vec)) AS nrm
      FROM v WHERE list_dot_product(vec, vec) > 0),
    pairs AS (
      SELECT p.user_id AS probe_user, c.user_id AS similar_user,
             list_dot_product(p.vec, c.vec) / (p.nrm * c.nrm) AS score
      FROM vv p JOIN vv c ON p.user_id <> c.user_id
      WHERE p.user_id % {_TS_PROBE_MOD} = 0),
    ranked AS (
      SELECT probe_user, similar_user, score,
             row_number() OVER (PARTITION BY probe_user
                                ORDER BY score DESC, similar_user ASC) AS rank
      FROM pairs)
    SELECT probe_user, similar_user, round(score, 6) AS cosine, rank
    FROM ranked WHERE rank <= {_TS_TOPK}
    """,
    doc="Time-series similarity search: per-user dense daily activity "
    "vectors (decimal-exact sums over the corpus date span), top-5 "
    "most-similar users per deterministic probe by cosine. Bounded "
    "probe side broadcast against the profile table; ranking on raw "
    "scores with a user tie-break.",
)
def events_user_similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from dsacord_spark.functions.vectors import dot

    e = table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    e2 = e.groupBy(
        "user_id", F.to_date("ts").alias("day")
    ).agg(F.sum(F.col("value").cast("decimal(18,2)")).alias("s"))
    bounds = e2.agg(
        F.min("day").alias("dmin"), F.max("day").alias("dmax")
    )
    per_user = e2.groupBy("user_id").agg(
        F.map_from_entries(F.collect_list(F.struct("day", "s"))).alias("m")
    )
    v = per_user.crossJoin(F.broadcast(bounds)).select(
        "user_id",
        F.transform(
            F.sequence(F.col("dmin"), F.col("dmax")),
            lambda d: F.coalesce(
                F.element_at(F.col("m"), d),
                F.lit(0).cast("decimal(18,2)"),
            ).cast("double"),
        ).alias("vec"),
    )
    # norms precomputed once per user (a per-pair sqrt(dot(v,v)) would
    # re-fold the day vector for every candidate pair); persisted — the
    # profile build (groupBys + per-user transform) feeds both join sides
    vv = (
        v.filter(dot("vec", "vec") > 0)
        .withColumn("nrm", F.sqrt(dot("vec", "vec")))
        .persist()
    )
    probes = vv.filter(F.col("user_id") % _TS_PROBE_MOD == 0).select(
        F.col("user_id").alias("probe_user"),
        F.col("vec").alias("pvec"),
        F.col("nrm").alias("pnrm"),
    )
    pairs = (
        vv.join(F.broadcast(probes), F.col("probe_user") != F.col("user_id"))
        .select(
            "probe_user",
            F.col("user_id").alias("similar_user"),
            (dot("pvec", "vec") / (F.col("pnrm") * F.col("nrm"))).alias(
                "score"
            ),
        )
    )
    win = W.partitionBy("probe_user").orderBy(
        F.col("score").desc(), F.col("similar_user").asc()
    )
    return (
        pairs.withColumn("rank", F.row_number().over(win))
        .filter(F.col("rank") <= _TS_TOPK)
        .select(
            "probe_user",
            "similar_user",
            F.round("score", 6).alias("cosine"),
            "rank",
        )
    )


# ---------------------------------------------------------------------------
# Label-noise probe: per label, the vectors LEAST similar to their own
# label centroid — the standard first pass for mislabeled points before
# training a probe (a point far from its class mean in cosine is either
# noise or a labeling error). Reuses the exact vec_id-ordered centroid
# fold, so scores are bit-identical across engines; ranking is on raw
# scores ascending with a vec_id tie-break. Scale: centroids are a
# labels-sized broadcast; one scan of the embedding table scores every
# vector map-side, then a per-label top-k.
# ---------------------------------------------------------------------------
_NOISE_K = 3

_EMB_D = "CAST(e.embedding AS DOUBLE[])"


@register(
    "embed_label_noise_topk",
    sql=f"""
    WITH g AS (
      SELECT label, list(CAST(embedding AS DOUBLE[]) ORDER BY vec_id) AS vs,
             count(*) AS n
      FROM embeddings GROUP BY label),
    c AS (
      SELECT label, CAST(n AS BIGINT) AS n,
        list_transform(
          list_reduce(vs, (acc, v) ->
            list_transform(generate_series(1, len(acc)), i -> acc[i] + v[i])),
          x -> x / n) AS cent
      FROM g),
    scored AS (
      SELECT e.label, e.vec_id,
             list_dot_product({_EMB_D}, c.cent) /
               (sqrt(list_dot_product({_EMB_D}, {_EMB_D})) *
                sqrt(list_dot_product(c.cent, c.cent))) AS score
      FROM embeddings e JOIN c USING (label)
      WHERE list_dot_product({_EMB_D}, {_EMB_D}) > 0
        AND list_dot_product(c.cent, c.cent) > 0),
    ranked AS (
      SELECT label, vec_id, score,
             row_number() OVER (PARTITION BY label
                                ORDER BY score ASC, vec_id ASC) AS rank
      FROM scored)
    SELECT label, vec_id, round(score, 6) AS cosine_to_centroid, rank
    FROM ranked WHERE rank <= {_NOISE_K}
    """,
    doc="Label-noise probe: per label, the 3 vectors least similar to "
    "their own label centroid (exact fold centroids, raw-score ranking "
    "with vec_id tie-break) — the standard mislabeled-point first pass. "
    "Centroids broadcast; scoring is one map-side scan.",
)
def embed_label_noise_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from dsacord_spark.functions.vectors import dot

    e = table(spark, sf_dir, "embeddings")
    cents = _label_centroids(e).select("label", "cent")
    v = e.select("label", "vec_id", to_double_array("embedding").alias("ve"))
    scored = (
        v.join(F.broadcast(cents), "label")
        .filter((dot("ve", "ve") > 0) & (dot("cent", "cent") > 0))
        .select(
            "label",
            "vec_id",
            (
                dot("ve", "cent")
                / (F.sqrt(dot("ve", "ve")) * F.sqrt(dot("cent", "cent")))
            ).alias("score"),
        )
    )
    win = W.partitionBy("label").orderBy(
        F.col("score").asc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(win))
        .filter(F.col("rank") <= _NOISE_K)
        .select(
            "label",
            "vec_id",
            F.round("score", 6).alias("cosine_to_centroid"),
            "rank",
        )
    )
