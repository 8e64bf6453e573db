"""Training-data curation operators, round 2 of layer B: benchmark
decontamination, TF-IDF distinctive terms, chunk-level exact substring
dedup, and quantized-shortlist ANN rerank.

These are the remaining pillars of a pretraining-corpus pipeline that the
catalog did not yet exercise: removing eval-set contamination from the
training split (n-gram overlap, the GPT-3/PaLM decontamination recipe),
corpus-statistics term weighting, the chunk-hash approximation of exact
substring dedup (Lee et al., "Deduplicating Training Data Makes Language
Models Better"), and the scalar-quantization + exact-rerank retrieval
shape used by every production vector index.

Round 3 adds the two remaining corpus-level ops: data-mixture weighting
(temperature-scaled sampling weights per source x lang, the mixture step
every pretraining run tunes) and a kNN label-vote evaluation over the
embedding table (the standard embedding-quality probe).

All hashes are md5-derived (functions/hashing.py) so every query here is
fully value-checked against the DuckDB oracle, except
text_compression_ratio whose zlib kernel has no DuckDB twin (rows-only,
determinism pinned by pytest).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from dsacord_spark.functions.hashing import md5_long, md5_long_sql
from dsacord_spark.functions.text import tokens
from dsacord_spark.functions.vectors import norm, to_double_array
from dsacord_spark.operators.dedup import _shingle_index
from dsacord_spark.plans.analysis import _ngr_cte, _TOKS_SQL
from dsacord_spark.plans.registry import register, table
_SPLIT_HASH = md5_long_sql("CAST(doc_id AS VARCHAR)")

# ---------------------------------------------------------------------------
# Benchmark decontamination: flag training-split documents that share any
# word 8-gram with the held-out test split (hash-mod split identical to
# split_train_test). At scale the held-out side is a benchmark suite —
# tiny by construction — so its distinct n-gram set is broadcast and the
# train side never shuffles: one scan of the corpus, a broadcast-hash
# semi-ish join, one partial-aggregated groupBy on doc.
# ---------------------------------------------------------------------------
_DECON_N = 8


@register(
    "decontaminate_train_test",
    sql=f"""
    WITH toks AS (SELECT doc_id, {_TOKS_SQL.format(c='text')} AS t FROM documents),
    ngr_s AS (
      SELECT DISTINCT doc_id AS doc, array_to_string(t[i:i+{_DECON_N - 1}], ' ') AS ng
      FROM toks,
           unnest(generate_series(1, greatest(len(t)-{_DECON_N - 1}, 1))) AS u(i)
    ),
    ngr AS (SELECT doc, {md5_long_sql('ng')} AS hg FROM ngr_s),
    bkt AS (SELECT doc, hg, {md5_long_sql('CAST(doc AS VARCHAR)')} % 100 AS b FROM ngr),
    tr AS (SELECT doc, hg FROM bkt WHERE b < 80),
    te AS (SELECT DISTINCT hg FROM bkt WHERE b >= 90),
    sz AS (SELECT doc, count(*) AS n_ngrams FROM tr GROUP BY doc),
    sh AS (SELECT doc, count(*) AS n_shared FROM tr JOIN te USING (hg) GROUP BY doc)
    SELECT sh.doc AS doc_id, n_shared, n_ngrams,
           round(CAST(n_shared AS DOUBLE) / n_ngrams, 6) AS contamination_frac
    FROM sh JOIN sz ON sz.doc = sh.doc
    """,
    doc="Train/test decontamination: training-split docs sharing >=1 word "
    "8-gram with the test split (hash-mod split), with the shared-n-gram "
    "fraction. The held-out n-gram set is broadcast (benchmark suites are "
    "small), so at 100 TB this is one corpus scan with zero shuffles "
    "before the per-doc count.",
)
def decontaminate_train_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    ngr = _shingle_index(d, "doc_id", "text", _DECON_N)
    bucket = md5_long(F.col("doc").cast("string")) % F.lit(100)
    tr = ngr.filter(bucket < 80)
    te = ngr.filter(bucket >= 90).select("hg").distinct()
    sizes = tr.groupBy("doc").agg(F.count(F.lit(1)).alias("n_ngrams"))
    shared = (
        tr.join(F.broadcast(te), "hg")
        .groupBy("doc")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    return (
        shared.join(sizes, "doc")
        .select(
            F.col("doc").alias("doc_id"),
            "n_shared",
            "n_ngrams",
            F.round(
                F.col("n_shared").cast("double") / F.col("n_ngrams"), 6
            ).alias("contamination_frac"),
        )
    )


# ---------------------------------------------------------------------------
# TF-IDF distinctive terms per language. The idf factor uses the rational
# surrogate (N+1)/(df+1) instead of ln((N+1)/(df+1)): it is strictly
# monotone in the true idf (so rankings are identical) while staying
# division-exact — integer-valued operands and a single IEEE division give
# bit-identical doubles in both engines, where ln() is only
# faithfully-rounded and could flip a round(,6) at the boundary.
# ---------------------------------------------------------------------------


@register(
    "text_tfidf_topk",
    sql=f"""
    WITH toks AS (SELECT doc_id, lang, {_TOKS_SQL.format(c='text')} AS t FROM documents),
    tok AS (SELECT doc_id, lang, tk FROM toks, unnest(t) AS u(tk)),
    tf AS (SELECT lang, tk AS token, count(*) AS tf FROM tok GROUP BY 1, 2),
    df AS (SELECT tk AS token, count(DISTINCT doc_id) AS df FROM tok GROUP BY 1),
    n AS (SELECT count(*) AS nn FROM documents),
    w AS (
      SELECT lang, token, tf, df,
             tf * (nn + 1.0) / (df + 1.0) AS wt
      FROM tf JOIN df USING (token), n),
    ranked AS (
      SELECT lang, token, tf, df, wt,
             row_number() OVER (PARTITION BY lang ORDER BY wt DESC, token ASC) AS rank
      FROM w)
    SELECT lang, token, tf, df, round(wt, 6) AS weight, rank
    FROM ranked WHERE rank <= 5
    """,
    doc="Top-5 distinctive terms per language by TF-IDF (rational idf "
    "surrogate, ranking-equivalent and cross-engine exact). Two "
    "co-partitioned aggregations on token + a tiny per-lang window.",
)
def text_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    tok = d.select("doc_id", "lang", F.explode(tokens("text")).alias("token"))
    tf = tok.groupBy("lang", "token").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tok.groupBy("token").agg(F.count_distinct("doc_id").alias("df"))
    nn = d.agg(F.count(F.lit(1)).alias("nn"))
    w = (
        tf.join(df_, "token")
        .crossJoin(F.broadcast(nn))
        .withColumn(
            "wt",
            F.col("tf") * (F.col("nn") + F.lit(1.0)) / (F.col("df") + F.lit(1.0)),
        )
    )
    win = W.partitionBy("lang").orderBy(F.col("wt").desc(), F.col("token").asc())
    return (
        w.withColumn("rank", F.row_number().over(win))
        .filter(F.col("rank") <= 5)
        .select("lang", "token", "tf", "df", F.round("wt", 6).alias("weight"), "rank")
    )


# ---------------------------------------------------------------------------
# Chunk-level exact substring dedup: hash non-overlapping 16-token chunks
# and report, per document, how many of its chunks appear verbatim in some
# other chunk position of the corpus. The chunk-hash table is the scalable
# stand-in for suffix-array exact-substring dedup: one scan to build,
# one shuffle on the 60-bit chunk hash, cost linear in corpus size.
# ---------------------------------------------------------------------------
_CHUNK = 16


@register(
    "dedup_chunk_exact",
    sql=f"""
    WITH toks AS (SELECT doc_id, {_TOKS_SQL.format(c='text')} AS t FROM documents),
    ch AS (
      SELECT doc_id,
             list_transform(generate_series(1, len(t)-{_CHUNK - 1}, {_CHUNK}),
                            i -> {md5_long_sql(f"array_to_string(t[i:i+{_CHUNK - 1}], ' ')")}) AS hs
      FROM toks WHERE len(t) >= {_CHUNK}),
    cd AS (SELECT DISTINCT doc_id AS doc, hg FROM ch, unnest(hs) AS u(hg)),
    cnt AS (SELECT hg, count(*) AS n FROM cd GROUP BY hg),
    sz AS (SELECT doc, count(*) AS n_chunks FROM cd GROUP BY doc),
    dup AS (SELECT doc, count(*) AS n_dup FROM cd JOIN cnt USING (hg)
            WHERE n > 1 GROUP BY doc)
    SELECT dup.doc AS doc_id, n_chunks, n_dup AS n_dup_chunks,
           round(CAST(n_dup AS DOUBLE) / n_chunks, 6) AS dup_chunk_frac
    FROM dup JOIN sz ON sz.doc = dup.doc
    """,
    doc="Chunk-hash exact substring dedup (16-token non-overlapping "
    "chunks): per-doc count and fraction of chunks duplicated elsewhere "
    "in the corpus — the linear-cost approximation of suffix-array "
    "exact-substring dedup.",
)
def dedup_chunk_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    tk = d.select("doc_id", tokens("text").alias("t")).filter(
        F.size("t") >= _CHUNK
    )
    offsets = F.sequence(
        F.lit(1), F.size("t") - F.lit(_CHUNK - 1), F.lit(_CHUNK)
    )
    hashes = F.array_distinct(
        F.transform(
            offsets,
            lambda i: md5_long(F.concat_ws(" ", F.slice(F.col("t"), i, _CHUNK))),
        )
    )
    cd = tk.select(
        F.col("doc_id").alias("doc"), F.explode(hashes).alias("hg")
    ).persist()
    cnt = cd.groupBy("hg").agg(F.count(F.lit(1)).alias("n"))
    sizes = cd.groupBy("doc").agg(F.count(F.lit(1)).alias("n_chunks"))
    dup = (
        cd.join(cnt.filter(F.col("n") > 1), "hg")
        .groupBy("doc")
        .agg(F.count(F.lit(1)).alias("n_dup"))
    )
    return dup.join(sizes, "doc").select(
        F.col("doc").alias("doc_id"),
        "n_chunks",
        F.col("n_dup").alias("n_dup_chunks"),
        F.round(F.col("n_dup").cast("double") / F.col("n_chunks"), 6).alias(
            "dup_chunk_frac"
        ),
    )


# ---------------------------------------------------------------------------
# Quantized-shortlist ANN: score every candidate with an int8
# scalar-quantized dot product (exact integer arithmetic, 4x narrower than
# the float vectors), keep a top-20 shortlist per query, then rerank only
# the shortlist with the exact float cosine. This is the memory-bound
# retrieval shape (SQ8 index + rerank) — at 100 TB the quantized table is
# the thing that fits in cluster RAM while the float vectors stay on disk
# and are fetched only for the shortlist join.
# ---------------------------------------------------------------------------
_SHORTLIST, _RERANK_K = 20, 5

_Q_SQL = (
    "list_transform(CAST({v} AS DOUBLE[]), "
    "x -> CAST(round(x / sqrt(list_dot_product(CAST({v} AS DOUBLE[]), "
    "CAST({v} AS DOUBLE[]))) * 127, 0) AS BIGINT))"
)


def _cos_sql(a: str, b: str) -> str:
    va, vb = f"CAST({a} AS DOUBLE[])", f"CAST({b} AS DOUBLE[])"
    return (
        f"list_dot_product({va}, {vb})"
        f" / (sqrt(list_dot_product({va}, {va}))"
        f" * sqrt(list_dot_product({vb}, {vb})))"
    )


@register(
    "ann_quantized_rerank",
    sql=f"""
    WITH qt AS (
      SELECT vec_id, embedding, {_Q_SQL.format(v='embedding')} AS qv
      FROM embeddings),
    q AS (SELECT vec_id AS q_id, embedding AS q_vec, qv AS q_qv
          FROM qt WHERE vec_id < 5),
    coarse AS (
      SELECT q_id, q_vec, e.vec_id AS neighbor_id, e.embedding AS n_vec,
             CAST(list_dot_product(CAST(q_qv AS DOUBLE[]), CAST(e.qv AS DOUBLE[])) AS BIGINT) AS qdot
      FROM q, qt e WHERE e.vec_id <> q_id),
    short AS (
      SELECT q_id, q_vec, neighbor_id, n_vec,
             row_number() OVER (PARTITION BY q_id ORDER BY qdot DESC, neighbor_id ASC) AS srn
      FROM coarse),
    rer AS (
      SELECT q_id, neighbor_id, {_cos_sql('q_vec', 'n_vec')} AS cos
      FROM short WHERE srn <= {_SHORTLIST}),
    ranked AS (
      SELECT q_id, neighbor_id, cos,
             row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, neighbor_id ASC) AS rank
      FROM rer)
    SELECT q_id, neighbor_id, rank, round(cos, 6) AS cos_sim
    FROM ranked WHERE rank <= {_RERANK_K}
    """,
    doc="ANN via int8 scalar quantization: integer-dot shortlist (top-20, "
    "exact cross-engine arithmetic) then exact-cosine rerank to top-5 — "
    "the SQ8-index + rerank retrieval shape.",
)
def ann_quantized_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings")
    nrm = norm(F.col("embedding"))
    qv = F.transform(
        to_double_array(F.col("embedding")),
        lambda x: F.round(x / F.col("nrm") * 127, 0).cast("long"),
    )
    qt = e.select("vec_id", "embedding", nrm.alias("nrm")).select(
        "vec_id", "embedding", qv.alias("qv")
    )
    q = qt.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_vec"),
        F.col("qv").alias("q_qv"),
    )
    coarse = (
        qt.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            "q_vec",
            F.col("vec_id").alias("neighbor_id"),
            F.col("embedding").alias("n_vec"),
            F.aggregate(
                F.zip_with(F.col("q_qv"), F.col("qv"), lambda a, b: a * b),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ).alias("qdot"),
        )
    )
    swin = W.partitionBy("q_id").orderBy(
        F.col("qdot").desc(), F.col("neighbor_id").asc()
    )
    short = coarse.withColumn("srn", F.row_number().over(swin)).filter(
        F.col("srn") <= _SHORTLIST
    )
    qd, nd = to_double_array(F.col("q_vec")), to_double_array(F.col("n_vec"))
    dot = F.aggregate(
        F.zip_with(qd, nd, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    cos = dot / (norm(F.col("q_vec")) * norm(F.col("n_vec")))
    rer = short.select("q_id", "neighbor_id", cos.alias("cos"))
    rwin = W.partitionBy("q_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        rer.withColumn("rank", F.row_number().over(rwin))
        .filter(F.col("rank") <= _RERANK_K)
        .select("q_id", "neighbor_id", "rank", F.round("cos", 6).alias("cos_sim"))
    )


# ---------------------------------------------------------------------------
# Data-mixture weighting: per (source, lang) bucket, token counts and the
# temperature-scaled (alpha = 0.5) sampling weight w_i = sqrt(p_i) /
# sum_j sqrt(p_j), plus the implied epochs-over-bucket at that mix. The
# grouped table has #sources x #langs rows regardless of corpus size, so
# both normalization passes are broadcast joins against one-row frames —
# at 100 TB this is one scan + one tiny agg.
# ---------------------------------------------------------------------------


@register(
    "corpus_mix_weights",
    sql=f"""
    WITH toks AS (SELECT source, lang, len({_TOKS_SQL.format(c='text')}) AS nt
                  FROM documents),
    g AS (SELECT source, lang, count(*) AS n_docs,
                 CAST(sum(nt) AS BIGINT) AS n_tokens
          FROM toks GROUP BY 1, 2),
    t AS (SELECT CAST(sum(n_tokens) AS DOUBLE) AS tot FROM g),
    w AS (SELECT g.*, tot, CAST(n_tokens AS DOUBLE) / tot AS share,
                 sqrt(CAST(n_tokens AS DOUBLE) / tot) AS sw
          FROM g, t),
    z AS (SELECT sum(sw) AS z FROM w)
    SELECT source, lang, n_docs, n_tokens,
           round(share, 6) AS token_share,
           round(sw / z, 6) AS mix_weight,
           round(sw / z * tot / n_tokens, 6) AS sampling_epochs
    FROM w, z
    """,
    doc="Data-mixture weighting: temperature-scaled (alpha=0.5) sampling "
    "weight and implied epoch count per (source, lang) bucket. The "
    "grouped table is O(sources x langs) rows, so normalization is two "
    "one-row broadcast joins on top of a single corpus scan.",
)
def corpus_mix_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    g = d.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(tokens("text"))).alias("n_tokens"),
    )
    tot = g.agg(F.sum("n_tokens").cast("double").alias("tot"))
    w = (
        g.crossJoin(F.broadcast(tot))
        .withColumn("share", F.col("n_tokens").cast("double") / F.col("tot"))
        .withColumn("sw", F.sqrt(F.col("share")))
    )
    z = w.agg(F.sum("sw").alias("z"))
    return w.crossJoin(F.broadcast(z)).select(
        "source",
        "lang",
        "n_docs",
        "n_tokens",
        F.round("share", 6).alias("token_share"),
        F.round(F.col("sw") / F.col("z"), 6).alias("mix_weight"),
        F.round(
            F.col("sw") / F.col("z") * F.col("tot") / F.col("n_tokens"), 6
        ).alias("sampling_epochs"),
    )


# ---------------------------------------------------------------------------
# kNN label-vote evaluation: for a 20% query sample, find the 10 nearest
# neighbors by exact cosine (excluding self), majority-vote their labels
# (ties -> smaller label), and report per-class accuracy — the standard
# probe for "do these embeddings encode the label?". The query side is
# broadcast; at scale the sample is fixed-size while the candidate scan
# is the full table, so the pair stage stays a broadcast nested loop
# with no shuffle before the per-query top-k.
# ---------------------------------------------------------------------------
_KNN_K = 10
# Hard cap on the query-sample id range: the modulo filter alone grows
# linearly with the corpus, and the sample is collected to the driver and
# shipped (pickled q-matrix) into every block_topk_cosine task. The cap
# makes it a true fixed-size query set (<= CAP/5 queries x 64 dims float64
# ~= 1 MB) regardless of SF. Covers every vec_id at the test SFs, so
# results are unchanged there; both engines apply the same cap.
_KNN_MAX_QID = 10_000


_UNIT_SQL = (
    "list_transform(CAST({v} AS DOUBLE[]), "
    "x -> x / sqrt(list_dot_product(CAST({v} AS DOUBLE[]), "
    "CAST({v} AS DOUBLE[]))))"
)


@register(
    "knn_label_accuracy",
    sql=f"""
    WITH u AS (SELECT vec_id, label, {_UNIT_SQL.format(v='embedding')} AS uv
               FROM embeddings),
    q AS (SELECT vec_id AS q_id, uv AS q_uv, label AS q_label
          FROM u WHERE vec_id % 5 = 0 AND vec_id < {_KNN_MAX_QID}),
    sc AS (SELECT q_id, q_label, e.vec_id AS n_id, e.label AS n_label,
                  list_dot_product(q_uv, e.uv) AS cos
           FROM q, u e WHERE e.vec_id <> q_id),
    top AS (SELECT q_id, q_label, n_label,
                   row_number() OVER (PARTITION BY q_id
                                      ORDER BY cos DESC, n_id ASC) AS rn
            FROM sc),
    votes AS (SELECT q_id, q_label, n_label, count(*) AS c
              FROM top WHERE rn <= {_KNN_K} GROUP BY 1, 2, 3),
    pred AS (SELECT q_id, q_label, n_label,
                    row_number() OVER (PARTITION BY q_id
                                       ORDER BY c DESC, n_label ASC) AS vr
             FROM votes)
    SELECT q_label AS label, count(*) AS n_queries,
           CAST(sum(CASE WHEN n_label = q_label THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
           round(CAST(sum(CASE WHEN n_label = q_label THEN 1 ELSE 0 END)
                      AS DOUBLE) / count(*), 6) AS accuracy
    FROM pred WHERE vr = 1 GROUP BY 1
    """,
    doc="kNN label-vote eval: top-10 exact-cosine neighbors for a 20% "
    "query sample, majority-vote the neighbor labels (ties -> smaller "
    "label), report per-class accuracy. The pair stage is "
    "block_topk_cosine (vectorized per-dimension multiply-adds in "
    "mapInPandas, local top-k per Arrow batch): only batches x queries "
    "x k rows reach the global top-k window instead of the full pair "
    "matrix. Bit-identical scores to the sequential-fold SQL oracle "
    "(see the operator docstring); replaced the interpreted HOF "
    "crossjoin formulation, 9.3s -> ~1.5s at sf0.1.",
)
def knn_label_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dsacord_spark.operators.similarity import block_topk_cosine

    e = table(spark, sf_dir, "embeddings")
    q_side = e.filter(
        (F.col("vec_id") % 5 == 0) & (F.col("vec_id") < _KNN_MAX_QID)
    )
    # the id cap makes the sample genuinely fixed-size (see _KNN_MAX_QID);
    # collecting it here is the same materialization the broadcast-hash
    # build side would do
    q_rows = [
        (r["vec_id"], r["embedding"])
        for r in q_side.select("vec_id", "embedding").collect()
    ]
    local = block_topk_cosine(
        e, q_rows, k=_KNN_K, payload_cols=("label",)
    ).withColumnRenamed("label", "n_label")
    twin = W.partitionBy("q_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    top = local.withColumn("rn", F.row_number().over(twin)).filter(
        F.col("rn") <= _KNN_K
    )
    votes = top.groupBy("q_id", "n_label").agg(F.count(F.lit(1)).alias("c"))
    vwin = W.partitionBy("q_id").orderBy(F.col("c").desc(), F.col("n_label").asc())
    pred = votes.withColumn("vr", F.row_number().over(vwin)).filter(
        F.col("vr") == 1
    )
    q_labels = q_side.select(
        F.col("vec_id").alias("q_id"), F.col("label").alias("q_label")
    )
    return (
        pred.join(F.broadcast(q_labels), "q_id")
        .groupBy(F.col("q_label").alias("label"))
        .agg(
            F.count(F.lit(1)).alias("n_queries"),
            F.sum(
                F.when(F.col("n_label") == F.col("q_label"), 1).otherwise(0)
            ).alias("n_correct"),
        )
        .withColumn(
            "accuracy",
            F.round(
                F.col("n_correct").cast("double") / F.col("n_queries"), 6
            ),
        )
    )


# ---------------------------------------------------------------------------
# Overlapping token-window chunking: the doc -> fixed-size-chunk step that
# precedes embedding / tokenization in a retrieval or pretraining
# pipeline (64-token windows, stride 32 -> 50% overlap; a short doc
# yields its single full-doc chunk). Pure map-side: tokens materialize
# once per doc, each window is a slice — no shuffle, no Python; row count
# grows ~2x tokens/64 per doc, which is the operator's contract.
# ---------------------------------------------------------------------------
_CHUNK_TOKENS = 64
_CHUNK_STRIDE = 32


@register(
    "text_chunk_windows",
    sql=f"""
    WITH t AS (
      SELECT doc_id, {_TOKS_SQL.format(c='text')} AS toks FROM documents
    ),
    w AS (
      SELECT doc_id, toks,
             unnest(generate_series(
               1, greatest(len(toks) - {_CHUNK_TOKENS - 1}, 1),
               {_CHUNK_STRIDE})) AS start
      FROM t WHERE len(toks) > 0
    )
    SELECT doc_id,
           CAST((start - 1) / {_CHUNK_STRIDE} AS INT) AS chunk_idx,
           array_to_string(list_slice(toks, start,
                                      start + {_CHUNK_TOKENS - 1}), ' ')
             AS chunk_text,
           CAST(least(len(toks) - start + 1, {_CHUNK_TOKENS}) AS INT)
             AS n_tokens
    FROM w
    """,
    doc="64-token chunks at stride 32 (50% overlap) per document — the "
    "chunking step before embedding/tokenization. Map-side only.",
)
def text_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    # tokens in their own projection (same Catalyst re-evaluation trap as
    # the shingle index: inlining tokens() under the per-offset transform
    # re-runs the regex split once per window)
    t = d.select("doc_id", tokens(F.col("text")).alias("toks")).filter(
        F.size("toks") > 0
    )
    starts = F.sequence(
        F.lit(1),
        F.greatest(F.size("toks") - F.lit(_CHUNK_TOKENS - 1), F.lit(1)),
        F.lit(_CHUNK_STRIDE),
    )
    return (
        t.select("doc_id", "toks", F.explode(starts).alias("start"))
        .select(
            "doc_id",
            ((F.col("start") - 1) / F.lit(_CHUNK_STRIDE))
            .cast("int")
            .alias("chunk_idx"),
            F.concat_ws(
                " ", F.slice(F.col("toks"), F.col("start"), _CHUNK_TOKENS)
            ).alias("chunk_text"),
            F.least(
                F.size("toks") - F.col("start") + 1, F.lit(_CHUNK_TOKENS)
            )
            .cast("int")
            .alias("n_tokens"),
        )
    )


# ---------------------------------------------------------------------------
# Mixture-weighted sampling: materialize the sampling decision implied by
# corpus_mix_weights. Each (source, lang) bucket keeps documents at rate
# min(1, sampling_epochs) — over-weighted buckets keep everything (their
# >1 epochs become training-time repetition), under-weighted buckets
# downsample deterministically by hash threshold (md5 of doc_id, the
# same reproducible-selection trick as split_train_test: no RNG, so the
# sample is stable across runs, engines, and partitionings). One corpus
# scan + a broadcast of the O(sources x langs) rate table.
# ---------------------------------------------------------------------------


@register(
    "corpus_mix_sample",
    sql=f"""
    WITH toks AS (SELECT doc_id, source, lang,
                         len({_TOKS_SQL.format(c='text')}) AS nt
                  FROM documents),
    g AS (SELECT source, lang, count(*) AS n_docs, sum(nt) AS n_tokens
          FROM toks GROUP BY 1, 2),
    t AS (SELECT CAST(sum(n_tokens) AS DOUBLE) AS tot FROM g),
    w AS (SELECT g.*, tot, sqrt(CAST(n_tokens AS DOUBLE) / tot) AS sw
          FROM g, t),
    z AS (SELECT sum(sw) AS z FROM w),
    rates AS (
      SELECT source, lang, n_docs,
             least(1.0, sw / z * tot / n_tokens) AS keep_rate
      FROM w, z),
    kept AS (
      SELECT d.source, d.lang, r.n_docs, r.keep_rate
      FROM toks d JOIN rates r
        ON r.source = d.source AND r.lang = d.lang
      WHERE {md5_long_sql("CAST(doc_id AS VARCHAR)")} % 1000000
            < keep_rate * 1000000)
    SELECT source, lang, n_docs,
           CAST(count(*) AS BIGINT) AS n_kept,
           round(keep_rate, 6) AS keep_rate
    FROM kept GROUP BY source, lang, n_docs, keep_rate
    """,
    doc="Mixture-weighted deterministic sampling: per-bucket keep rate "
    "min(1, sampling_epochs) applied by md5 hash threshold; reports "
    "kept counts per (source, lang).",
)
def corpus_mix_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", "source", "lang", F.size(tokens("text")).alias("nt")
    )
    g = toks.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("nt").alias("n_tokens")
    )
    tot = g.agg(F.sum("n_tokens").cast("double").alias("tot"))
    w = g.crossJoin(F.broadcast(tot)).withColumn(
        "sw", F.sqrt(F.col("n_tokens").cast("double") / F.col("tot"))
    )
    z = w.agg(F.sum("sw").alias("z"))
    rates = (
        w.crossJoin(F.broadcast(z))
        .select(
            "source",
            "lang",
            "n_docs",
            F.least(
                F.lit(1.0),
                F.col("sw") / F.col("z") * F.col("tot") / F.col("n_tokens"),
            ).alias("keep_rate"),
        )
    )
    # the admission filter reads only (doc_id, source, lang) — joining
    # the RAW table instead of `toks` drops the second tokenize+size
    # pass over every document (r13, guide §2.3 "project before": the
    # tokenization subtree was evaluated twice, once for the rate
    # aggregate and once here, and the second evaluation's output column
    # was never used)
    kept = (
        d.select("doc_id", "source", "lang")
        .join(F.broadcast(rates), ["source", "lang"])
        .filter(
            md5_long(F.col("doc_id").cast("string")) % F.lit(1000000)
            < F.col("keep_rate") * 1000000
        )
    )
    return kept.groupBy("source", "lang", "n_docs", "keep_rate").agg(
        F.count(F.lit(1)).cast("long").alias("n_kept")
    ).select(
        "source",
        "lang",
        "n_docs",
        "n_kept",
        F.round("keep_rate", 6).alias("keep_rate"),
    )


# ---------------------------------------------------------------------------
# Vocabulary growth curve (Heaps' law probe): cumulative distinct
# vocabulary vs cumulative token count over the corpus in doc_id order.
# Cumulative COUNT(DISTINCT) is not a window aggregate either engine
# supports — the scalable rewrite is first-occurrence attribution: each
# token contributes +1 at the ONE document where it first appears
# (min doc_id per token), and the curve is a running sum of those
# contributions. Two co-partitioned aggregates on token, then a
# DISTRIBUTED running sum (plans/distrib._global_cumsum) over the
# per-doc frame — that frame is doc-cardinality, so an unpartitioned
# SUM OVER window would funnel the whole corpus's doc rows through one
# task at 100 TB.
# ---------------------------------------------------------------------------


@register(
    "corpus_vocab_growth",
    sql=f"""
    WITH tok AS (
      SELECT doc_id, tk
      FROM (SELECT doc_id, {_TOKS_SQL.format(c='text')} AS t FROM documents),
           unnest(t) AS u(tk)
    ),
    per_doc AS (SELECT doc_id, count(*) AS n_tok FROM tok GROUP BY 1),
    firsts AS (SELECT tk, min(doc_id) AS first_doc FROM tok GROUP BY 1),
    new_per_doc AS (
      SELECT first_doc AS doc_id, count(*) AS new_tokens
      FROM firsts GROUP BY 1
    )
    SELECT p.doc_id,
           CAST(SUM(p.n_tok) OVER (ORDER BY p.doc_id
                                   ROWS UNBOUNDED PRECEDING) AS BIGINT)
             AS cum_tokens,
           CAST(SUM(COALESCE(n.new_tokens, 0)) OVER (ORDER BY p.doc_id
                                   ROWS UNBOUNDED PRECEDING) AS BIGINT)
             AS vocab_size
    FROM per_doc p LEFT JOIN new_per_doc n ON n.doc_id = p.doc_id
    """,
    doc="Heaps'-law vocabulary growth: cumulative distinct vocabulary "
    "via first-occurrence attribution (cumulative COUNT DISTINCT "
    "rewritten as a running sum of per-doc first-seen token counts).",
)
def corpus_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(tokens("text")).alias("tk"))
    per_doc = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_tok"))
    firsts = tok.groupBy("tk").agg(F.min("doc_id").alias("first_doc"))
    new_per_doc = firsts.groupBy(F.col("first_doc").alias("doc_id")).agg(
        F.count(F.lit(1)).alias("new_tokens")
    )
    from dsacord_spark.plans.distrib import _global_cumsum

    joined = per_doc.join(new_per_doc, "doc_id", "left")
    cum = _global_cumsum(
        joined,
        [F.col("doc_id").asc()],
        {
            "cum_tokens": F.col("n_tok"),
            "vocab_size": F.coalesce(F.col("new_tokens"), F.lit(0)),
        },
    )
    return cum.select(
        "doc_id",
        F.col("cum_tokens").cast("long").alias("cum_tokens"),
        F.col("vocab_size").cast("long").alias("vocab_size"),
    )


# ---------------------------------------------------------------------------
# Cross-source contamination matrix: exact-content duplicates that span
# two different sources, counted per source pair. The per-source twin of
# exact dedup — the report a curation run uses to decide which source to
# drop when feeds overlap. Scale: one shuffle on the content hash;
# hash-group sizes are duplicate multiplicities (tiny), so the in-group
# pair expansion is bounded by true duplicate density, never corpus^2.
# ---------------------------------------------------------------------------
@register(
    "source_overlap_matrix",
    sql=f"""
    WITH {_ngr_cte(3).strip()},
    sizes AS (SELECT doc, count(*) AS sz FROM ngr GROUP BY doc),
    inter AS (
      SELECT a.doc AS doc_a, b.doc AS doc_b, count(*) AS i
      FROM ngr a JOIN ngr b ON a.hg = b.hg AND a.doc < b.doc
      GROUP BY 1, 2),
    pairs AS (
      SELECT doc_a, doc_b
      FROM inter
      JOIN sizes sa ON sa.doc = doc_a
      JOIN sizes sb ON sb.doc = doc_b
      WHERE CAST(i AS DOUBLE) / (sa.sz + sb.sz - i) >= 0.5),
    lab AS (
      SELECT least(da.source, db.source) AS source_a,
             greatest(da.source, db.source) AS source_b
      FROM pairs
      JOIN documents da ON da.doc_id = doc_a
      JOIN documents db ON db.doc_id = doc_b)
    SELECT source_a, source_b, CAST(count(*) AS BIGINT) AS n_dup_pairs
    FROM lab GROUP BY 1, 2
    """,
    doc="Cross-source contamination matrix: near-duplicate pairs "
    "(trigram Jaccard >= 0.5, same evidence as dedup_ngram_jaccard) "
    "counted per unordered source pair — the report a curation run uses "
    "to decide which overlapping feed to drop. Diagonal entries "
    "(source_a = source_b) are within-source duplication.",
)
def source_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dsacord_spark.operators.dedup import ngram_jaccard_pairs

    d = table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(d, "doc_id", "text", n=3, threshold=0.5)
    srcs = d.select("doc_id", "source")
    sa = srcs.select(F.col("doc_id").alias("doc_a"), F.col("source").alias("sa"))
    sb = srcs.select(F.col("doc_id").alias("doc_b"), F.col("source").alias("sb"))
    return (
        # no broadcast hints: the doc_id->source map is doc-cardinality
        # (forced broadcast = OOM at corpus scale); the pair frame joins
        # it shuffled on doc keys, and AQE still auto-broadcasts when
        # the map measures small (it does at the test SFs)
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .groupBy(
            F.least("sa", "sb").alias("source_a"),
            F.greatest("sa", "sb").alias("source_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_dup_pairs"))
    )


# ---------------------------------------------------------------------------
# Compression-ratio quality signal: zlib ratio per document, aggregated
# per language. Highly repetitive/boilerplate text compresses far below
# natural prose, making the ratio a standard cheap quality gate (used
# alongside the repetition filters). Python kernel (zlib) in mapInPandas.
# Scale: pure map work + one tiny agg, zero wide shuffles before the
# final 5-row group.
# ---------------------------------------------------------------------------
def text_compression_ratio_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The raw per-language zlib stats (lang, n_docs, mean_ratio,
    min_ratio). Not catalog-registered — DuckDB has no zlib twin for the
    ratio VALUES, so these are pinned as a pytest golden
    (tests/test_rows_only_golden.py) while the registered entry below
    exposes the structurally-checkable contract."""
    import zlib

    from collections.abc import Iterator

    import pandas as pd

    def ratios(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            raw = [str(t).encode() for t in pdf["text"]]
            yield pd.DataFrame(
                {
                    "lang": pdf["lang"],
                    "ratio": [
                        (len(zlib.compress(b, 6)) / len(b)) if b else 1.0
                        for b in raw
                    ],
                }
            )

    d = table(spark, sf_dir, "documents")
    per_doc = d.select("lang", "text").mapInPandas(
        ratios, schema="lang string, ratio double"
    )
    return per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("ratio"), 6).alias("mean_ratio"),
        F.round(F.min("ratio"), 6).alias("min_ratio"),
    )


@register(
    "text_compression_ratio",
    # STRUCTURAL value oracle (r8 verdict ask #4, the sketch-entry
    # pattern): the zlib kernel still runs — ratio_sane derives from the
    # actual per-doc ratios — but the compared columns are the
    # oracle-expressible contract: per-lang doc counts, exact char
    # totals, and a ratio-sanity boolean the DuckDB twin emits TRUE for
    # (every zlib(level=6) ratio of non-empty text lies in (0, 2] —
    # deflate's worst-case expansion is ~5 bytes per 16 KiB block + an
    # 11-byte header, nowhere near 2x on any input — and empty text is
    # pinned to ratio 1.0; min <= mean holds for any distribution). The
    # raw mean/min ratios stay pinned by the pytest golden over
    # text_compression_ratio_stats.
    sql="""
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(SUM(LENGTH(COALESCE(text, ''))) AS BIGINT) AS total_chars,
           TRUE AS ratio_sane
    FROM documents GROUP BY lang
    """,
    doc="Per-language compression-ratio gate: zlib(level=6) bytes over "
    "raw bytes (the cheap repetition/boilerplate signal); value-checked "
    "on the (lang, n_docs, total_chars, ratio_sane) structural contract "
    "— a broken kernel (ratio <= 0, > 2, or min > mean) flips the "
    "boolean and hash-mismatches; raw ratios pinned by pytest golden.",
)
def text_compression_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    stats = text_compression_ratio_stats(spark, sf_dir)
    d = table(spark, sf_dir, "documents")
    chars = d.groupBy("lang").agg(
        F.sum(F.length(F.coalesce(F.col("text"), F.lit("")))).alias(
            "total_chars"
        )
    )
    return stats.join(chars, "lang").select(
        "lang",
        "n_docs",
        "total_chars",
        (
            (F.col("min_ratio") > 0)
            & (F.col("min_ratio") <= F.col("mean_ratio"))
            & (F.col("mean_ratio") <= 2.0)
        ).alias("ratio_sane"),
    )


# ---------------------------------------------------------------------------
# Bloom-filter decontamination: the 100 TB formulation of the same
# operator. decontaminate_train_test broadcasts the DISTINCT test
# n-gram set — fine while benchmarks are small, but the held-out side
# of a real decontamination run can be billions of n-grams. The Bloom
# variant replaces the broadcast set with a FIXED-SIZE bit array built
# and probed entirely in JVM Column algebra (no Python in the hot
# path):
#   build: per test n-gram, k double-hashed positions -> (word, mask)
#          -> bit_or per 64-bit word -> a <=2^14-row broadcast table;
#   probe: per train n-gram, the same k probes join that table; a
#          candidate needs ALL k bits set;
#   verify: candidates (tiny after filtering) exact-join the test set,
#          so false positives are removed and the answer is EXACT —
#          same oracle as the broadcast formulation, two independent
#          implementations.
# ---------------------------------------------------------------------------
_BLOOM_BITS = 1 << 20  # 128 KiB of filter
_BLOOM_K = 5


def _bloom_hashes(hg):
    """(h1, h2) of the double-hashing scheme — THE single definition of
    the probe-position math, shared by the filter build and the probe
    side (a drift between the two would produce false NEGATIVES, which
    the exact-verify join cannot repair).

    Every intermediate stays far below 2^63 (ANSI mode aborts on long
    overflow): h1 is reduced into the table domain first; h2 derives
    from a 31-bit slice and is forced odd for full-cycle probing."""
    h1 = F.pmod(hg, F.lit(_BLOOM_BITS))
    h2 = F.pmod(
        F.pmod(hg, F.lit(2_147_483_647)) * F.lit(2654435761),
        F.lit(_BLOOM_BITS),
    ).bitwiseOR(F.lit(1))
    return h1, h2


def _with_bloom_probes(df: DataFrame, hg_col: str) -> DataFrame:
    """Explode each row into its k double-hashed Bloom probes:
    pos_j = (h1 + j*h2) mod m with h2 forced odd (full-cycle probing),
    split into the 64-bit word index `w` and the in-word bit `mask`.
    Pure Column algebra (shiftleft over a Column shift amount goes
    through expr — the Python helper only takes int literals)."""
    h1, h2 = _bloom_hashes(F.col(hg_col))
    out = df.withColumn(
        "__j", F.explode(F.array(*[F.lit(j) for j in range(_BLOOM_K)]))
    ).withColumn(
        "__pos", F.pmod(h1 + F.col("__j") * h2, F.lit(_BLOOM_BITS))
    )
    return out.withColumn("w", F.shiftright(F.col("__pos"), 6)).withColumn(
        "mask",
        F.expr("shiftleft(cast(1 as bigint), cast(__pos % 64 as int))"),
    ).drop("__j", "__pos")


@register(
    "decontaminate_bloom",
    sql=f"""
    WITH toks AS (SELECT doc_id, {_TOKS_SQL.format(c='text')} AS t FROM documents),
    ngr_s AS (
      SELECT DISTINCT doc_id AS doc, array_to_string(t[i:i+{_DECON_N - 1}], ' ') AS ng
      FROM toks,
           unnest(generate_series(1, greatest(len(t)-{_DECON_N - 1}, 1))) AS u(i)
    ),
    ngr AS (SELECT doc, {md5_long_sql('ng')} AS hg FROM ngr_s),
    bkt AS (SELECT doc, hg, {md5_long_sql('CAST(doc AS VARCHAR)')} % 100 AS b FROM ngr),
    tr AS (SELECT doc, hg FROM bkt WHERE b < 80),
    te AS (SELECT DISTINCT hg FROM bkt WHERE b >= 90),
    sz AS (SELECT doc, count(*) AS n_ngrams FROM tr GROUP BY doc),
    sh AS (SELECT doc, count(*) AS n_shared FROM tr JOIN te USING (hg) GROUP BY doc)
    SELECT sh.doc AS doc_id, n_shared, n_ngrams,
           round(CAST(n_shared AS DOUBLE) / n_ngrams, 6) AS contamination_frac
    FROM sh JOIN sz ON sz.doc = sh.doc
    """,
    doc="Decontamination via a JVM-native Bloom filter (128 KiB, k=5 "
    "double-hashed probes as Column algebra: bit_or-aggregated words, "
    "broadcast word-table join, all-bits-set candidacy) with an exact "
    "verify join on the candidates only — identical EXACT output to "
    "decontaminate_train_test (same oracle), but the test side ships as "
    "a fixed-size filter instead of a broadcast n-gram set.",
)
def decontaminate_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    ngr = _shingle_index(d, "doc_id", "text", _DECON_N)
    bucket = md5_long(F.col("doc").cast("string")) % F.lit(100)
    tr = ngr.filter(bucket < 80)
    te = ngr.filter(bucket >= 90).select("hg").distinct()

    # build: word -> bits (bit_or over all test n-grams' probe masks)
    # persisted: the <=2^14-row word table is referenced once per probe
    # join below — without the persist each broadcast re-derives it from
    # the test n-gram set
    bloom = (
        _with_bloom_probes(te, "hg")
        .groupBy("w")
        .agg(F.bit_or("mask").alias("bits"))
        .persist()
    )
    # probe: every (doc, hg) needs ALL k probes to find their bit set.
    # k successive broadcast-hash joins against the <=2^14-row word table
    # — entirely map-side, no explode and no shuffle (the previous
    # explode(k) + groupBy(doc, hg) formulation paid a k-times-wider
    # shuffle for the hit count; the conjunction of per-probe filters is
    # the same predicate with zero exchanges, and each filter prunes the
    # stream before the next join).
    probe = tr.select("doc", "hg")
    h1, h2 = _bloom_hashes(F.col("hg"))
    for j in range(_BLOOM_K):
        probe = (
            probe.withColumn(
                f"__p{j}", F.pmod(h1 + F.lit(j) * h2, F.lit(_BLOOM_BITS))
            )
            .withColumn(f"__w{j}", F.shiftright(F.col(f"__p{j}"), 6))
            .withColumn(
                f"__m{j}",
                F.expr(
                    f"shiftleft(cast(1 as bigint), cast(__p{j} % 64 as int))"
                ),
            )
            .join(
                F.broadcast(
                    bloom.select(
                        F.col("w").alias(f"__w{j}"),
                        F.col("bits").alias(f"__b{j}"),
                    )
                ),
                f"__w{j}",
            )
            .filter(
                (F.col(f"__b{j}").bitwiseAND(F.col(f"__m{j}")))
                == F.col(f"__m{j}")
            )
        )
    hits = probe.select("doc", "hg")
    # verify: exact join removes Bloom false positives -> EXACT result
    shared = (
        hits.join(te, "hg")
        .groupBy("doc")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    sizes = tr.groupBy("doc").agg(F.count(F.lit(1)).alias("n_ngrams"))
    return shared.join(sizes, "doc").select(
        F.col("doc").alias("doc_id"),
        "n_shared",
        "n_ngrams",
        F.round(
            F.col("n_shared").cast("double") / F.col("n_ngrams"), 6
        ).alias("contamination_frac"),
    )
