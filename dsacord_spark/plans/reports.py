"""Corpus- and business-health report operators (round-3 additions).

Forty-three oracle-eligible entries extending the layer-B catalog beyond the
reference's surface (the reference is a 600-line ETL with no query layer;
this family is the analytics a 100 TB training-data pipeline runs on top
of the ingested lake): a bigram-LM fluency score, asymmetric containment
near-dup pairs, the exact-duplicate cluster-size histogram, a Zipf
rank-frequency table, customer-lifetime-value deciles, DAU/MAU
stickiness, RFM segmentation, inter-arrival latency profiles,
sentence-level exact dedup, brand-concentration HHI, the
session-duration histogram, a supplier scorecard, ARI readability,
source-vocabulary total-variation distance, the MinHash calibration
report, user co-presence edges, embedding-norm percentiles, per-user
burstiness (Fano), weekly revenue seasonality, character-class
profiles, repeat-order retention, the week-hour activity heatmap,
hapax/type-token richness, the n-gram duplicate-rate sweep, an
expiring 24h-deadline funnel, exact rolling 7-day actives (day-spine
range join), a deterministic hash sampler, a region->nation
share-of-parent rollup, a month x priority contingency-lift matrix,
exact-algebra Pearson correlation, event-type co-occurrence lift, a
deterministic max_by peak-hour report, Cohen's-d A/B effect size, the
revenue Gini coefficient, Tukey-fence IQR outliers, the Jaccard
threshold-band histogram, a label-separability scalar, the daily
new-vs-returning split, token-length profiles, an error-burst alarm,
the cohort-LTV revenue triangle, cross-source duplicate provenance,
and basket-size bands.

Determinism (registry.py header rules): every cross-engine number is an
integer, a DECIMAL sum, a single IEEE division of deterministic operands,
or a SEQUENTIAL fold over a per-key array in pinned order (the
quality.py centroid trick) — never an order-sensitive float aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from dsacord_spark.functions.text import doc_fingerprint, tokens
from dsacord_spark.plans.distrib import _global_rank, _idiv, _ntile_bucket
from dsacord_spark.plans.registry import register, table

# tokens(): whitespace split of trimmed text, empties dropped (kept in
# lockstep with analysis.py's _TOKS_SQL / functions/text.py tokens())
_TOKS_SQL = (
    "list_filter(string_split_regex(trim({c}), '\\s+'), x -> x <> '')"
)



# ---------------------------------------------------------------------------
# Bigram-LM fluency: train an add-one-smoothed bigram model ON the corpus
# (global bigram + unigram counts), then score each document by its mean
# in-corpus transition probability mean_p = (1/n) * sum over positions of
#   p_i = (c(w_i, w_{i+1}) + 1) / (c(w_i) + V).
# Low scores flag machine-garbled / boilerplate-anomalous text the same
# way an LM perplexity filter does (cf. CCNet's LM filtering stage), and
# every p_i is a single IEEE division of integer-valued operands, so the
# score is cross-engine exact WITHOUT logs: the per-doc sum folds the
# p_i ARRAY in position order on both engines (sequential double fold =
# bit-identical), sidestepping ln()'s faithful-rounding hazard the same
# way tfidf's rational idf surrogate does.
# Scale: explode bigrams (linear), two co-partitioned count aggs keyed by
# bigram/unigram, one broadcast of the 1-row vocab count, one shuffle
# back to doc_id for the fold. No driver-side state.
# ---------------------------------------------------------------------------


@register(
    "text_bigram_lm_fluency",
    sql=f"""
    WITH toks AS (
      SELECT doc_id, {_TOKS_SQL.format(c='text')} AS t FROM documents),
    big AS (
      SELECT doc_id, i AS pos, t[i] AS w1, t[i+1] AS w2
      FROM toks, unnest(generate_series(1, len(t) - 1)) AS u(i)
      WHERE len(t) >= 2),
    uni AS (
      SELECT tk AS w1, count(*) AS c1
      FROM toks, unnest(t) AS u(tk) GROUP BY 1),
    bc AS (SELECT w1, w2, count(*) AS c2 FROM big GROUP BY 1, 2),
    v AS (SELECT count(DISTINCT tk) AS vocab FROM toks, unnest(t) AS u(tk)),
    scored AS (
      SELECT big.doc_id, big.pos,
             CAST(bc.c2 + 1 AS DOUBLE) / (uni.c1 + v.vocab) AS p
      FROM big JOIN bc USING (w1, w2) JOIN uni USING (w1), v),
    folded AS (
      SELECT doc_id, count(*) AS n_bigrams,
             list_reduce(list(p ORDER BY pos), (a, b) -> a + b) AS s
      FROM scored GROUP BY doc_id)
    SELECT doc_id, n_bigrams,
           round(s / n_bigrams, 9) AS mean_bigram_p
    FROM folded
    """,
    doc="Per-document mean add-one-smoothed bigram transition probability "
    "under the corpus's own bigram model — the exact-arithmetic stand-in "
    "for an LM perplexity filter (low = garbled/unnatural token stream). "
    "Integer-count divisions folded per doc in position order: "
    "bit-identical across engines with no log calls.",
)
def text_bigram_lm_fluency(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    tk = d.select("doc_id", tokens("text").alias("t")).filter(F.size("t") >= 2)
    big = tk.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("t") - 1),
                lambda i: F.struct(
                    i.alias("pos"),
                    F.element_at("t", i).alias("w1"),
                    F.element_at("t", i + 1).alias("w2"),
                ),
            )
        ).alias("b"),
    ).select("doc_id", "b.pos", "b.w1", "b.w2")
    alltk = d.select(F.explode(tokens("text")).alias("w1"))
    uni = alltk.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    bc = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    vocab = alltk.agg(F.count_distinct("w1").alias("vocab"))
    scored = (
        big.join(bc, ["w1", "w2"])
        .join(uni, "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            "doc_id",
            "pos",
            (
                (F.col("c2") + F.lit(1)).cast("double")
                / (F.col("c1") + F.col("vocab"))
            ).alias("p"),
        )
    )
    # fold the per-doc probability array in position order — sequential
    # double fold, identical on both engines (quality.py centroid trick)
    folded = scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.aggregate(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "p"))),
                lambda s: s["p"],
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("s"),
    )
    return folded.select(
        "doc_id",
        "n_bigrams",
        F.round(F.col("s") / F.col("n_bigrams"), 9).alias("mean_bigram_p"),
    )


# ---------------------------------------------------------------------------
# Asymmetric containment pairs: C(A->B) = |shingles(A) n shingles(B)| /
# |shingles(A)|. Symmetric Jaccard misses a short document wholly quoted
# inside a much longer one (J is diluted by the big doc's size); max
# directional containment is the standard fix (Broder's containment from
# the original shingling paper). Reuses the 3-gram md5 shingle frame the
# Jaccard family uses; same inverted-index join, same bounded-by-true-
# duplicate-density cost — and the same bucketed shingle-index
# (build_shingle_index) zero-Exchange route applies at scale.
# ---------------------------------------------------------------------------
_CONTAIN_T = 0.8


@register(
    "text_containment_pairs",
    sql=f"""
    WITH toks AS (
      SELECT doc_id, {_TOKS_SQL.format(c='text')} AS t FROM documents),
    ngr_s AS (
      SELECT DISTINCT doc_id AS doc, array_to_string(t[i:i+2], ' ') AS ng
      FROM toks, unnest(generate_series(1, greatest(len(t)-2, 1))) AS u(i)),
    ngr AS (SELECT doc, CAST('0x' || SUBSTR(MD5(ng), 1, 15) AS BIGINT) AS hg
            FROM ngr_s),
    sizes AS (SELECT doc, count(*) AS sz FROM ngr GROUP BY doc),
    inter AS (
      SELECT a.doc AS doc_a, b.doc AS doc_b, count(*) AS i
      FROM ngr a JOIN ngr b ON a.hg = b.hg AND a.doc < b.doc
      GROUP BY 1, 2)
    SELECT doc_a, doc_b,
           round(CAST(i AS DOUBLE) / sa.sz, 6) AS contain_a_in_b,
           round(CAST(i AS DOUBLE) / sb.sz, 6) AS contain_b_in_a
    FROM inter
    JOIN sizes sa ON sa.doc = doc_a
    JOIN sizes sb ON sb.doc = doc_b
    WHERE greatest(CAST(i AS DOUBLE) / sa.sz, CAST(i AS DOUBLE) / sb.sz)
          >= {_CONTAIN_T}
    """,
    doc="Directional shingle containment C(A->B)=|A n B|/|A| at >= 0.8 in "
    "either direction: catches a doc wholly quoted inside a longer one, "
    "which size-diluted symmetric Jaccard misses (Broder '97). Same "
    "inverted-index machinery and scale route as the Jaccard dedup "
    "family.",
)
def text_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dsacord_spark.operators.dedup import _shingle_index

    d = table(spark, sf_dir, "documents")
    # persisted index: the plan consumes it 3x (sizes + both join sides);
    # the unpersisted frame re-ran the shingle scan each time (measured
    # 3.5s -> ~2s at sf0.1). Shared with the dedup family via Spark's
    # plan-matching cache; released at bench family boundaries.
    ngr = _shingle_index(d, "doc_id", "text", 3)
    sizes = ngr.groupBy("doc").agg(F.count(F.lit(1)).alias("sz"))
    a, b = ngr.alias("a"), ngr.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.hg") == F.col("b.hg")) & (F.col("a.doc") < F.col("b.doc")),
        )
        .groupBy(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("i"))
    )
    sa = sizes.select(F.col("doc").alias("doc_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("doc").alias("doc_b"), F.col("sz").alias("sz_b"))
    cab = F.col("i").cast("double") / F.col("sz_a")
    cba = F.col("i").cast("double") / F.col("sz_b")
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter(F.greatest(cab, cba) >= _CONTAIN_T)
        .select(
            "doc_a",
            "doc_b",
            F.round(cab, 6).alias("contain_a_in_b"),
            F.round(cba, 6).alias("contain_b_in_a"),
        )
    )


# ---------------------------------------------------------------------------
# Exact-duplicate cluster-size histogram: fingerprint every document
# (md5 of whitespace-normalized lowercased text — doc_fingerprint), group
# to clusters, then report the SIZE DISTRIBUTION: for each cluster size,
# how many clusters, how many documents they absorb, and the corpus
# fraction. The first chart every dedup run is judged by ("what fraction
# of the corpus sits in 1000+-copy clusters?"). Two narrow shuffles
# (fingerprint, then size); output rows ~ distinct sizes (tiny).
# ---------------------------------------------------------------------------


def _dup_cluster_histogram_fp_sql() -> str:
    from dsacord_spark.plans.analysis import _FPRINT_SQL

    return f"""
    WITH fp AS (
      SELECT {_FPRINT_SQL} AS fp
      FROM documents),"""


@register(
    "corpus_dup_cluster_histogram",
    sql=_dup_cluster_histogram_fp_sql() + """
    cl AS (SELECT fp, count(*) AS cluster_size FROM fp GROUP BY fp),
    tot AS (SELECT count(*) AS n_docs FROM documents)
    SELECT cluster_size,
           count(*) AS n_clusters,
           CAST(cluster_size * count(*) AS BIGINT) AS n_docs_absorbed,
           round(CAST(cluster_size * count(*) AS DOUBLE) / max(n_docs), 6)
             AS corpus_frac
    FROM cl, tot
    GROUP BY cluster_size
    """,
    doc="Histogram of exact-duplicate cluster sizes over normalized-text "
    "fingerprints: n_clusters / docs absorbed / corpus fraction per "
    "size. Two narrow shuffles; output is one row per distinct size.",
)
def corpus_dup_cluster_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    fp = d.select(doc_fingerprint("text").alias("fp"))
    cl = fp.groupBy("fp").agg(F.count(F.lit(1)).alias("cluster_size"))
    tot = d.agg(F.count(F.lit(1)).alias("n_docs"))
    return (
        cl.groupBy("cluster_size")
        .agg(F.count(F.lit(1)).alias("n_clusters"))
        .crossJoin(F.broadcast(tot))
        .select(
            "cluster_size",
            "n_clusters",
            (F.col("cluster_size") * F.col("n_clusters"))
            .cast("bigint")
            .alias("n_docs_absorbed"),
            F.round(
                (F.col("cluster_size") * F.col("n_clusters")).cast("double")
                / F.col("n_docs"),
                6,
            ).alias("corpus_frac"),
        )
    )


# ---------------------------------------------------------------------------
# Zipf rank-frequency table: top-100 tokens by corpus frequency with the
# rank-1 frequency ratio and the cumulative share of all token mass —
# the standard corpus-health fingerprint (a natural corpus tracks
# freq ~ 1/rank; a boilerplate-heavy one shows a fat head). No logs, no
# regression: ratios are single divisions of exact integers, cumulative
# share is a bigint running sum over 100 ordered rows — all cross-engine
# exact. One token-count shuffle + a 100-row window.
# ---------------------------------------------------------------------------
_ZIPF_K = 100


@register(
    "text_zipf_table",
    sql=f"""
    WITH toks AS (
      SELECT {_TOKS_SQL.format(c='text')} AS t FROM documents),
    tok AS (SELECT lower(tk) AS token FROM toks, unnest(t) AS u(tk)),
    cnt AS (SELECT token, count(*) AS freq FROM tok GROUP BY token),
    tot AS (SELECT count(*) AS total FROM tok),
    ranked AS (
      SELECT token, freq,
             row_number() OVER (ORDER BY freq DESC, token ASC) AS rank
      FROM cnt),
    top AS (SELECT * FROM ranked WHERE rank <= {_ZIPF_K}),
    head AS (SELECT freq AS f1 FROM top WHERE rank = 1)
    SELECT rank, token, freq,
           round(CAST(f1 AS DOUBLE) / freq, 6) AS zipf_ratio,
           round(CAST(SUM(freq) OVER (ORDER BY rank
                   ROWS UNBOUNDED PRECEDING) AS DOUBLE) / total, 6)
             AS cum_share
    FROM top, head, tot
    """,
    doc="Zipf rank-frequency fingerprint: top-100 lowercased tokens, the "
    "f(1)/f(r) ratio (Zipf predicts ~= r) and cumulative token-mass "
    "share. Integer counts and single divisions only — no logs, exact "
    "on both engines.",
)
def text_zipf_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    tok = d.select(F.explode(tokens("text")).alias("tk")).select(
        F.lower("tk").alias("token")
    )
    cnt = tok.groupBy("token").agg(F.count(F.lit(1)).alias("freq"))
    tot = tok.agg(F.count(F.lit(1)).alias("total"))
    # top-K FIRST via orderBy+limit (TakeOrderedAndProject: parallel
    # per-partition top-100, no global sort) — a bare row_number window
    # here would funnel the whole vocabulary (corpus-growing under
    # Heaps' law) through one partition; rank runs on the K survivors
    win = W.orderBy(F.col("freq").desc(), F.col("token").asc())
    top = (
        cnt.orderBy(F.col("freq").desc(), F.col("token").asc())
        .limit(_ZIPF_K)
        .withColumn("rank", F.row_number().over(win))
    )
    head = top.filter(F.col("rank") == 1).select(F.col("freq").alias("f1"))
    cum = W.orderBy("rank").rowsBetween(W.unboundedPreceding, W.currentRow)
    return (
        top.crossJoin(F.broadcast(head))
        .crossJoin(F.broadcast(tot))
        .select(
            "rank",
            "token",
            "freq",
            F.round(F.col("f1").cast("double") / F.col("freq"), 6).alias(
                "zipf_ratio"
            ),
            F.round(
                F.sum("freq").over(cum).cast("double") / F.col("total"), 6
            ).alias("cum_share"),
        )
    )


# ---------------------------------------------------------------------------
# Customer-lifetime-value deciles: rank customers by exact DECIMAL
# revenue, cut into ntile(10) deciles (o_custkey tie-break pins intra-tie
# bucket boundaries), and report each decile's customer count, revenue,
# and share — the classic whale-curve segmentation. One orders shuffle on
# custkey, then _global_rank's two-pass prefix sum + the ntile closed
# form instead of an unpartitioned ntile window: at 100 TB the
# per-customer frame is hundreds of millions of rows, and exactness does
# not require funneling it through one sort partition.
# ---------------------------------------------------------------------------


@register(
    "orders_ltv_deciles",
    sql="""
    WITH rev AS (
      SELECT o_custkey,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS revenue
      FROM orders GROUP BY o_custkey),
    dec AS (
      SELECT o_custkey, revenue,
             ntile(10) OVER (ORDER BY revenue DESC, o_custkey ASC) AS decile
      FROM rev),
    tot AS (SELECT SUM(revenue) AS total FROM rev)
    SELECT decile,
           count(*) AS n_customers,
           CAST(SUM(revenue) AS DOUBLE) AS decile_revenue,
           round(CAST(SUM(revenue) AS DOUBLE) / CAST(total AS DOUBLE), 6)
             AS revenue_share
    FROM dec, tot
    GROUP BY decile, total
    """,
    doc="Whale-curve customer segmentation: exact decimal revenue per "
    "customer, ntile(10) deciles (custkey tie-break), per-decile count / "
    "revenue / share. Deciles come from the distributed _global_rank + "
    "ntile closed form — no unpartitioned window anywhere in the plan.",
)
def orders_ltv_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    rev = o.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("revenue")
    )
    # ntile(10) without the unpartitioned window: distributed global rank
    # (two-pass prefix sum over range partitions) + the ntile closed form.
    # Bucket assignment is identical to the oracle's ntile because the
    # (revenue DESC, custkey ASC) ordering is total.
    tot = rev.agg(
        F.sum("revenue").alias("total"), F.count(F.lit(1)).alias("n_cust")
    )
    ranked = _global_rank(
        rev, [F.col("revenue").desc(), F.col("o_custkey").asc()], "r"
    )
    dec = ranked.crossJoin(F.broadcast(tot.select("n_cust"))).select(
        "revenue",
        _ntile_bucket(F.col("r"), F.col("n_cust"), 10).alias("decile"),
    )
    tot = tot.select("total")
    return (
        dec.groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            # decimal sum cast to double (registry.py determinism rules —
            # exact sum, then one deterministic binary->double conversion)
            F.sum("revenue").cast("double").alias("decile_revenue"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "decile",
            "n_customers",
            "decile_revenue",
            F.round(
                F.col("decile_revenue") / F.col("total").cast("double"),
                6,
            ).alias("revenue_share"),
        )
    )


# ---------------------------------------------------------------------------
# Engagement: daily active users + calendar-month stickiness (DAU/MAU).
# The product-health twin of the retention cohort entry. Exact distinct
# counts and one division; two narrow aggregations of the events stream
# (per-day and per-month distincts share the map-side scan).
# ---------------------------------------------------------------------------


@register(
    "events_dau_stickiness",
    sql="""
    WITH e AS (
      SELECT strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day,
             strftime(CAST(ts AS TIMESTAMP), '%Y-%m') AS month,
             user_id
      FROM events),
    dau AS (SELECT day, month, count(DISTINCT user_id) AS dau
            FROM e GROUP BY day, month),
    mau AS (SELECT month, count(DISTINCT user_id) AS mau
            FROM e GROUP BY month)
    SELECT day, dau.month AS month, dau, mau,
           round(CAST(dau AS DOUBLE) / mau, 6) AS stickiness
    FROM dau JOIN mau USING (month)
    """,
    doc="Daily active users and DAU/MAU stickiness per calendar month — "
    "exact distincts, one division. Two aggregations over one events "
    "scan; the month join is against the tiny per-month frame.",
)
def events_dau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events").select(
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        F.date_format("ts", "yyyy-MM").alias("month"),
        "user_id",
    )
    dau = e.groupBy("day", "month").agg(
        F.count_distinct("user_id").alias("dau")
    )
    mau = e.groupBy("month").agg(F.count_distinct("user_id").alias("mau"))
    return dau.join(F.broadcast(mau), "month").select(
        "day",
        "month",
        "dau",
        "mau",
        F.round(F.col("dau").cast("double") / F.col("mau"), 6).alias(
            "stickiness"
        ),
    )


# ---------------------------------------------------------------------------
# RFM customer segmentation: recency (days since last order, vs the
# corpus max date), frequency (order count), monetary (exact DECIMAL
# revenue), each cut into quintiles (custkey tie-breaks pin every
# boundary), reported as segment sizes. The canonical CRM segmentation;
# the windows run over the per-customer aggregate (1.5k rows at sf0.01),
# never the fact table.
# ---------------------------------------------------------------------------


@register(
    "orders_rfm_segments",
    sql="""
    WITH cust AS (
      SELECT o_custkey,
             date_diff('day', max(CAST(o_orderdate AS TIMESTAMP)),
                       (SELECT max(CAST(o_orderdate AS TIMESTAMP)) FROM orders))
               AS recency_days,
             count(*) AS frequency,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS monetary
      FROM orders GROUP BY o_custkey),
    scored AS (
      SELECT o_custkey, recency_days, frequency, monetary,
             ntile(5) OVER (ORDER BY recency_days ASC, o_custkey ASC) AS r_score,
             ntile(5) OVER (ORDER BY frequency DESC, o_custkey ASC) AS f_score,
             ntile(5) OVER (ORDER BY CAST(monetary AS DOUBLE) DESC,
                            o_custkey ASC) AS m_score
      FROM cust)
    SELECT r_score, f_score, m_score,
           count(*) AS n_customers,
           CAST(SUM(monetary) AS DOUBLE) AS segment_revenue
    FROM scored GROUP BY 1, 2, 3
    """,
    doc="RFM quintile segmentation (recency/frequency/monetary, custkey "
    "tie-breaks): segment sizes and exact-decimal revenue. Each score "
    "comes from a distributed _global_rank pass + the ntile closed form "
    "— no unpartitioned windows over the per-customer frame.",
)
def orders_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    maxd = o.agg(F.max(F.col("o_orderdate").cast("timestamp")).alias("mx"))
    cust = (
        o.groupBy("o_custkey")
        .agg(
            F.max(F.col("o_orderdate").cast("timestamp")).alias("last_order"),
            F.count(F.lit(1)).alias("frequency"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("monetary"),
        )
        .crossJoin(F.broadcast(maxd))
        .select(
            "o_custkey",
            F.datediff(F.col("mx"), F.col("last_order")).alias("recency_days"),
            "frequency",
            "monetary",
        )
    )
    # Three ntile(5) scores from ONE distributed rank pass (r13, guide
    # §2: the r12 shape chained three _global_rank passes — three range
    # shuffles + three boundary samplings + three persists over a frame
    # that widened each pass, 33 jobs / 148 stages of AQE waves at
    # sf0.1). Melt each customer into three (dim, sort_key) rows where
    # sort_key orders ascending within its dimension:
    #   dim 0: recency_days            (ASC  — cast to double, exact)
    #   dim 1: -frequency              (DESC == negated ASC; counts are
    #                                   exact in double below 2^53)
    #   dim 2: -CAST(monetary AS DOUBLE) (the oracle's own DESC double
    #                                   ordering, negated; negation is
    #                                   exact in IEEE754 and ties stay
    #                                   ties)
    # then ONE _global_rank over (dim, sort_key, o_custkey). Dimensions
    # are contiguous blocks of exactly n_cust rows under that total
    # order, so rank-within-dim = global_rank - dim * n_cust, and the
    # ntile closed form is unchanged. Still no unpartitioned windows —
    # the same two-pass prefix-sum shape, just 3x the (narrow) rows in
    # one shuffle instead of 3 shuffles of a widening frame.
    # persisted: the melt and the n_tot count both consume cust;
    # uncached, each would re-run the orders scan + aggregate.
    cust = cust.persist()
    n_tot = cust.agg(F.count(F.lit(1)).alias("n_cust"))
    melted = cust.select(
        "o_custkey",
        "monetary",
        F.explode(
            F.array(
                F.struct(
                    F.lit(0).alias("dim"),
                    F.col("recency_days").cast("double").alias("sk"),
                ),
                F.struct(
                    F.lit(1).alias("dim"),
                    (-F.col("frequency").cast("double")).alias("sk"),
                ),
                F.struct(
                    F.lit(2).alias("dim"),
                    (-F.col("monetary").cast("double")).alias("sk"),
                ),
            )
        ).alias("d"),
    ).select("o_custkey", "monetary", F.col("d.dim").alias("dim"), F.col("d.sk").alias("sk"))
    ranked = _global_rank(
        melted,
        [F.col("dim").asc(), F.col("sk").asc(), F.col("o_custkey").asc()],
        "gr",
    )
    scored = ranked.crossJoin(F.broadcast(n_tot)).withColumn(
        "score",
        _ntile_bucket(
            F.col("gr") - F.col("dim").cast("bigint") * F.col("n_cust"),
            F.col("n_cust"),
            5,
        ),
    )
    pivoted = scored.groupBy("o_custkey").agg(
        F.max(F.when(F.col("dim") == 0, F.col("score"))).alias("r_score"),
        F.max(F.when(F.col("dim") == 1, F.col("score"))).alias("f_score"),
        F.max(F.when(F.col("dim") == 2, F.col("score"))).alias("m_score"),
        F.max("monetary").alias("monetary"),
    )
    return pivoted.groupBy("r_score", "f_score", "m_score").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum("monetary").cast("double").alias("segment_revenue"),
    )


# ---------------------------------------------------------------------------
# Inter-arrival time stats per event_type: exact interpolated median and
# p90 of consecutive-event gaps in MICROSECONDS (lag over the (ts, id)
# order both engines agree on; integer operands keep the percentile
# interpolation cross-engine exact — the agg_percentiles parity pins).
# The latency-profile twin of events_anomaly_mad's value profile.
# ---------------------------------------------------------------------------


@register(
    "events_inter_arrival_stats",
    sql="""
    WITH o AS (
      SELECT event_type,
             epoch_us(CAST(ts AS TIMESTAMP)) AS us, event_id
      FROM events),
    gaps AS (
      SELECT event_type,
             us - lag(us) OVER (PARTITION BY event_type
                                ORDER BY us, event_id) AS gap_us
      FROM o)
    SELECT event_type,
           count(gap_us) AS n_gaps,
           round(quantile_cont(gap_us, 0.5), 6) AS median_gap_us,
           round(quantile_cont(gap_us, 0.9), 6) AS p90_gap_us
    FROM gaps WHERE gap_us IS NOT NULL
    GROUP BY event_type
    """,
    doc="Per-event-type inter-arrival profile: exact interpolated median "
    "and p90 of consecutive gaps in integer microseconds ((ts, event_id) "
    "order pinned on both engines). One window shuffle on event_type + a "
    "tiny percentile agg.",
)
def events_inter_arrival_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events").select("event_type", "ts_us", "event_id")
    w = W.partitionBy("event_type").orderBy(
        F.col("ts_us").asc(), F.col("event_id").asc()
    )
    gaps = e.select(
        "event_type",
        (F.col("ts_us") - F.lag("ts_us").over(w)).alias("gap_us"),
    ).filter(F.col("gap_us").isNotNull())
    return gaps.groupBy("event_type").agg(
        F.count("gap_us").alias("n_gaps"),
        F.round(F.percentile("gap_us", F.lit(0.5)), 6).alias("median_gap_us"),
        F.round(F.percentile("gap_us", F.lit(0.9)), 6).alias("p90_gap_us"),
    )


# ---------------------------------------------------------------------------
# Sentence-level exact dedup: the sentence-unit twin of dedup_chunk_exact
# (16-token chunks) using the udx family's '.'-split sentence convention,
# trimmed, kept at >= 20 chars (short fragments like "Yes" would connect
# everything). Per doc: distinct sentences, how many appear verbatim in
# OTHER documents, and the duplicated fraction — the C4/RefinedWeb
# line-level dedup report. One shuffle on the 60-bit sentence hash.
# ---------------------------------------------------------------------------


@register(
    "text_sentence_dedup",
    sql="""
    WITH sents AS (
      SELECT doc_id,
             list_filter(list_transform(string_split(text, '.'),
                                        s -> trim(s)),
                         s -> length(s) >= 20) AS ss
      FROM documents),
    sd AS (
      SELECT DISTINCT doc_id AS doc,
             CAST('0x' || SUBSTR(MD5(s), 1, 15) AS BIGINT) AS hg
      FROM sents, unnest(ss) AS u(s)),
    cnt AS (SELECT hg, count(DISTINCT doc) AS nd FROM sd GROUP BY hg),
    sz AS (SELECT doc, count(*) AS n_sentences FROM sd GROUP BY doc),
    dup AS (SELECT doc, count(*) AS n_dup FROM sd JOIN cnt USING (hg)
            WHERE nd > 1 GROUP BY doc)
    SELECT sz.doc AS doc_id, n_sentences,
           COALESCE(n_dup, 0) AS n_dup_sentences,
           round(CAST(COALESCE(n_dup, 0) AS DOUBLE) / n_sentences, 6)
             AS dup_sentence_frac
    FROM sz LEFT JOIN dup ON dup.doc = sz.doc
    """,
    doc="Sentence-level exact dedup report ('.'-split sentences >= 20 "
    "chars, distinct per doc): per-doc count/fraction of sentences that "
    "appear verbatim in other documents — the line-level dedup pass of "
    "C4/RefinedWeb. One shuffle on the sentence hash.",
)
def text_sentence_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dsacord_spark.functions.hashing import md5_long

    d = table(spark, sf_dir, "documents")
    sents = d.select(
        "doc_id",
        F.filter(
            F.transform(F.split("text", "\\."), lambda s: F.trim(s)),
            lambda s: F.length(s) >= 20,
        ).alias("ss"),
    )
    sd = (
        sents.select("doc_id", F.explode("ss").alias("s"))
        .select(F.col("doc_id").alias("doc"), md5_long(F.col("s")).alias("hg"))
        .distinct()
    )
    cnt = sd.groupBy("hg").agg(F.count_distinct("doc").alias("nd"))
    sz = sd.groupBy("doc").agg(F.count(F.lit(1)).alias("n_sentences"))
    dup = (
        sd.join(cnt, "hg")
        .filter(F.col("nd") > 1)
        .groupBy("doc")
        .agg(F.count(F.lit(1)).alias("n_dup"))
    )
    return (
        sz.join(dup, "doc", "left")
        .select(
            F.col("doc").alias("doc_id"),
            "n_sentences",
            F.coalesce(F.col("n_dup"), F.lit(0)).alias("n_dup_sentences"),
            F.round(
                F.coalesce(F.col("n_dup"), F.lit(0)).cast("double")
                / F.col("n_sentences"),
                6,
            ).alias("dup_sentence_frac"),
        )
    )


# ---------------------------------------------------------------------------
# Brand concentration per part type: Herfindahl–Hirschman index of
# lineitem volume shares across brands, HHI = sum_b (n_b / N)^2 =
# sum(n_b^2) / N^2 — numerator and denominator kept as EXACT DECIMAL(38,0)
# integer arithmetic (bigint squares overflow int64 past ~3e9 rows per
# group at 100 TB), one deterministic double division at the end.
# ---------------------------------------------------------------------------


@register(
    "part_brand_hhi",
    sql="""
    WITH j AS (
      SELECT p.p_type, p.p_brand, count(*) AS n
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      GROUP BY 1, 2),
    t AS (
      SELECT p_type,
             count(*) AS n_brands,
             SUM(CAST(n AS DECIMAL(38,0)) * n) AS sq,
             SUM(CAST(n AS DECIMAL(38,0))) AS tot
      FROM j GROUP BY p_type)
    SELECT p_type, n_brands,
           CAST(tot AS BIGINT) AS n_items,
           round(CAST(sq AS DOUBLE) / (CAST(tot AS DOUBLE) * CAST(tot AS DOUBLE)), 6)
             AS hhi
    FROM t
    """,
    doc="Brand-concentration (Herfindahl) index of lineitem volume per "
    "part type: exact decimal integer sums of squared brand counts, one "
    "double division. The part dim join broadcasts; one narrow shuffle "
    "on (type, brand).",
)
def part_brand_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem").select("l_partkey")
    p = table(spark, sf_dir, "part").select("p_partkey", "p_type", "p_brand")
    j = (
        l.join(F.broadcast(p), l["l_partkey"] == p["p_partkey"])
        .groupBy("p_type", "p_brand")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    t = j.groupBy("p_type").agg(
        F.count(F.lit(1)).alias("n_brands"),
        F.sum(F.col("n").cast("decimal(38,0)") * F.col("n")).alias("sq"),
        F.sum(F.col("n").cast("decimal(38,0)")).alias("tot"),
    )
    return t.select(
        "p_type",
        "n_brands",
        F.col("tot").cast("bigint").alias("n_items"),
        F.round(
            F.col("sq").cast("double")
            / (F.col("tot").cast("double") * F.col("tot").cast("double")),
            6,
        ).alias("hhi"),
    )


# ---------------------------------------------------------------------------
# Session-duration histogram: the same >= 4h-gap islands the session
# entries pin, reduced to the duration distribution — single-event,
# sub-hour, 1-4h, and 4h+ bands (exact integer microsecond spans).
# The shape report a sessionization rollout is judged by.
# ---------------------------------------------------------------------------


@register(
    "events_session_duration_histogram",
    sql="""
    WITH o AS (
      SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us, event_id
      FROM events),
    gaps AS (
      SELECT user_id, us, event_id,
             CASE WHEN lag(us) OVER w IS NULL
                       OR us - lag(us) OVER w >= 14400000000
                  THEN 1 ELSE 0 END AS new_session
      FROM o WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
    sess AS (
      SELECT user_id, us,
             SUM(new_session) OVER (PARTITION BY user_id
                                    ORDER BY us, event_id
                                    ROWS UNBOUNDED PRECEDING) AS sid
      FROM gaps),
    spans AS (
      SELECT user_id, sid, count(*) AS n_events,
             max(us) - min(us) AS span_us
      FROM sess GROUP BY user_id, sid),
    banded AS (
      SELECT CASE WHEN n_events = 1 THEN 'single_event'
                  WHEN span_us < 3600000000 THEN 'lt_1h'
                  WHEN span_us < 14400000000 THEN 'h1_to_4h'
                  ELSE 'ge_4h' END AS band
      FROM spans),
    tot AS (SELECT count(*) AS n FROM spans)
    SELECT band, count(*) AS n_sessions,
           round(CAST(count(*) AS DOUBLE) / max(n), 6) AS session_frac
    FROM banded, tot GROUP BY band
    """,
    doc="Histogram of session durations over the catalog's >= 4h-gap "
    "islands: single-event / <1h / 1-4h / >=4h bands with exact integer "
    "microsecond spans. One user_id window + a 4-row aggregate.",
)
def events_session_duration_histogram(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    e = table(spark, sf_dir, "events").select("user_id", "ts_us", "event_id")
    w = W.partitionBy("user_id").orderBy(
        F.col("ts_us").asc(), F.col("event_id").asc()
    )
    gaps = e.select(
        "user_id",
        "ts_us",
        "event_id",
        F.when(
            F.lag("ts_us").over(w).isNull()
            | (F.col("ts_us") - F.lag("ts_us").over(w) >= 14_400_000_000),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("new_session"),
    )
    # (ts_us, event_id) tie-break on the cumulative sum too: ts_us is
    # ns-truncated so per-user duplicate timestamps exist, and a session
    # boundary landing inside a tie group must split it identically on
    # both engines regardless of physical row order.
    cum = W.partitionBy("user_id").orderBy("ts_us", "event_id").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    sess = gaps.select(
        "user_id", "ts_us", F.sum("new_session").over(cum).alias("sid")
    )
    spans = sess.groupBy("user_id", "sid").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.max("ts_us") - F.min("ts_us")).alias("span_us"),
    )
    banded = spans.select(
        F.when(F.col("n_events") == 1, F.lit("single_event"))
        .when(F.col("span_us") < 3_600_000_000, F.lit("lt_1h"))
        .when(F.col("span_us") < 14_400_000_000, F.lit("h1_to_4h"))
        .otherwise(F.lit("ge_4h"))
        .alias("band")
    )
    tot = spans.agg(F.count(F.lit(1)).alias("n"))
    return (
        banded.groupBy("band")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .crossJoin(F.broadcast(tot))
        .select(
            "band",
            "n_sessions",
            F.round(F.col("n_sessions").cast("double") / F.col("n"), 6).alias(
                "session_frac"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Supplier scorecard: the operational fact-to-dim rollup every supply
# pipeline runs — per supplier: item volume, return rate, exact-decimal
# net revenue, and the exact interpolated median of the order->ship lag
# in integer days. One lineitem->orders equi-join (both sides shuffled on
# orderkey at scale), one rollup keyed by the 100-row supplier dim.
# ---------------------------------------------------------------------------


@register(
    "supplier_scorecard",
    sql="""
    WITH j AS (
      SELECT l.l_suppkey,
             l.l_returnflag,
             CAST(l.l_extendedprice AS DECIMAL(18,2))
               * (CAST(1 AS DECIMAL(18,2)) - CAST(l.l_discount AS DECIMAL(18,2)))
               AS net,
             date_diff('day', CAST(o.o_orderdate AS TIMESTAMP),
                       CAST(l.l_shipdate AS TIMESTAMP)) AS lag_days
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
    agg AS (
      SELECT l_suppkey AS s_suppkey,
             count(*) AS n_items,
             SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS n_returned,
             CAST(SUM(net) AS DOUBLE) AS net_revenue,
             quantile_cont(lag_days, 0.5) AS median_lag
      FROM j GROUP BY 1)
    SELECT s.s_suppkey, s.s_name,
           n_items,
           round(CAST(n_returned AS DOUBLE) / n_items, 6) AS return_rate,
           net_revenue,
           round(median_lag, 6) AS median_ship_lag_days
    FROM agg JOIN supplier s USING (s_suppkey)
    """,
    doc="Per-supplier operational scorecard: volume, return rate, exact "
    "decimal net revenue, exact interpolated median order->ship lag in "
    "integer days. Fact-fact join on orderkey + a broadcast supplier dim.",
)
def supplier_scorecard(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_returnflag", "l_extendedprice",
        "l_discount", "l_shipdate",
    )
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    dec = lambda c: F.col(c).cast("decimal(18,2)")
    j = l.join(o, l["l_orderkey"] == o["o_orderkey"]).select(
        "l_suppkey",
        "l_returnflag",
        (dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - dec("l_discount"))).alias("net"),
        F.datediff(
            F.col("l_shipdate").cast("timestamp"),
            F.col("o_orderdate").cast("timestamp"),
        ).alias("lag_days"),
    )
    agg = j.groupBy(F.col("l_suppkey").alias("s_suppkey")).agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).alias(
            "n_returned"
        ),
        F.sum("net").cast("double").alias("net_revenue"),
        F.percentile("lag_days", F.lit(0.5)).alias("median_lag"),
    )
    return agg.join(F.broadcast(s), "s_suppkey").select(
        "s_suppkey",
        "s_name",
        "n_items",
        F.round(F.col("n_returned").cast("double") / F.col("n_items"), 6).alias(
            "return_rate"
        ),
        "net_revenue",
        F.round("median_lag", 6).alias("median_ship_lag_days"),
    )


# ---------------------------------------------------------------------------
# Readability (Automated Readability Index): ARI = 4.71*(chars/words) +
# 0.5*(words/sentences) - 21.43, with chars = alphanumeric count, words =
# whitespace tokens, sentences = '.'-split non-empty segments (>= 1).
# Chosen over Flesch BECAUSE it needs no syllable counts — all three
# inputs are exact integers, so the fixed expression tree evaluates
# bit-identically on both engines. Pure map-side column math.
# ---------------------------------------------------------------------------


@register(
    "text_readability_ari",
    sql=f"""
    WITH m AS (
      SELECT doc_id,
             length(regexp_replace(text, '[^A-Za-z0-9]', '', 'g')) AS n_chars,
             len({_TOKS_SQL.format(c='text')}) AS n_words,
             greatest(len(list_filter(list_transform(string_split(text, '.'),
                                                     s -> trim(s)),
                                      s -> s <> '')), 1) AS n_sentences
      FROM documents)
    SELECT doc_id, n_chars, n_words, n_sentences,
           CAST((1000000 * (471 * CAST(n_chars AS BIGINT) * n_sentences
                            + 50 * CAST(n_words AS BIGINT) * n_words
                            - 2143 * CAST(n_words AS BIGINT) * n_sentences)
                 + 50 * CAST(n_words AS BIGINT) * n_sentences)
                // (100 * CAST(n_words AS BIGINT) * n_sentences)
                AS DOUBLE) / 1000000 AS ari
    FROM m WHERE n_words > 0
    """,
    doc="Automated Readability Index per document (ARI needs no syllable "
    "model — its three inputs are exact integer counts). ARI = N/D with "
    "N = 471*c*s + 50*w^2 - 2143*w*s, D = 100*w*s, and the 6-decimal "
    "rounding is done IN INTEGER ARITHMETIC ((N*1e6 + D/2) div D) "
    "because these small-denominator rationals land on exact .xxxxxx5 "
    "ties where Spark's round() (half-up) and DuckDB's (half-even on "
    "doubles) disagree. Map-side column math, no shuffle.",
)
def text_readability_ari(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    m = d.select(
        "doc_id",
        F.length(F.regexp_replace("text", "[^A-Za-z0-9]", "")).alias("n_chars"),
        F.size(tokens("text")).alias("n_words"),
        F.greatest(
            F.size(
                F.filter(
                    F.transform(F.split("text", "\\."), lambda s: F.trim(s)),
                    lambda s: s != "",
                )
            ),
            F.lit(1),
        ).alias("n_sentences"),
    ).filter(F.col("n_words") > 0)
    # half-up rounding via integer math: (N*1e6 + D/2) div D; D = 100*w*s
    # is always even so D/2 = 50*w*s is exact; both engines truncate
    # integer division toward zero (verified -7 div 2 = -3 on each)
    return m.select(
        "doc_id",
        "n_chars",
        "n_words",
        "n_sentences",
        (
            F.expr(
                "(1000000 * (471 * CAST(n_chars AS BIGINT) * n_sentences"
                " + 50 * CAST(n_words AS BIGINT) * n_words"
                " - 2143 * CAST(n_words AS BIGINT) * n_sentences)"
                " + 50 * CAST(n_words AS BIGINT) * n_sentences)"
                " div (100 * CAST(n_words AS BIGINT) * n_sentences)"
            ).cast("double")
            / F.lit(1_000_000)
        ).alias("ari"),
    )


# ---------------------------------------------------------------------------
# Source-vocabulary divergence: pairwise TOTAL VARIATION distance between
# the unigram distributions of every pair of document sources,
#   TV(P,Q) = (1/2) * sum_tk |p_tk - q_tk|,
# computed in EXACT integer arithmetic: with per-source counts c and
# totals t,  |c1/t1 - c2/t2| = |c1*t2 - c2*t1| / (t1*t2), so the whole
# sum is a DECIMAL(38,0) accumulation with ONE double division at the
# end. Tokens absent from one source contribute (t1 - shared1)*t2 (resp.
# symmetric) — recovered from the shared-token sums, so only the
# token-level INNER join is needed (no per-pair full-outer join). The
# mixture-health report for multi-source corpus assembly: TV ~ 0 means
# two sources are interchangeable, TV ~ 1 means disjoint vocabularies.
# Scale: one (source, token) count shuffle; the pair join fans each
# token's source list (<= 20) quadratically — bounded by n_sources^2,
# not corpus size.
# ---------------------------------------------------------------------------


@register(
    "source_vocab_tv_distance",
    sql="""
    WITH tok AS (
      SELECT source, tk
      FROM (SELECT source,
                   list_filter(string_split_regex(trim(text), '\\s+'),
                               x -> x <> '') AS t
            FROM documents), unnest(t) AS u(tk)),
    cnt AS (SELECT source, tk, count(*) AS c FROM tok GROUP BY 1, 2),
    tot AS (SELECT source, count(*) AS t FROM tok GROUP BY 1),
    shared AS (
      SELECT a.source AS source_a, b.source AS source_b,
             SUM(abs(CAST(a.c AS DECIMAL(38,0)) * tb.t
                     - CAST(b.c AS DECIMAL(38,0)) * ta.t)) AS num_shared,
             SUM(CAST(a.c AS DECIMAL(38,0))) AS shared_a,
             SUM(CAST(b.c AS DECIMAL(38,0))) AS shared_b
      FROM cnt a
      JOIN cnt b ON a.tk = b.tk AND a.source < b.source
      JOIN tot ta ON ta.source = a.source
      JOIN tot tb ON tb.source = b.source
      GROUP BY 1, 2),
    -- the pair SPINE comes from tot x tot, not the shared-token join:
    -- a pair with fully DISJOINT vocabularies shares no token, but its
    -- TV distance is defined (= 1.0) and must appear in the output
    pair AS (
      SELECT ta.source AS source_a, tb.source AS source_b,
             ta.t AS t_a, tb.t AS t_b,
             COALESCE(num_shared, 0) AS num_shared,
             COALESCE(shared_a, 0) AS shared_a,
             COALESCE(shared_b, 0) AS shared_b
      FROM tot ta JOIN tot tb ON ta.source < tb.source
      LEFT JOIN shared ON shared.source_a = ta.source
                      AND shared.source_b = tb.source)
    SELECT source_a, source_b,
           round(CAST(num_shared + (t_a - shared_a) * t_b
                      + (t_b - shared_b) * t_a AS DOUBLE)
                 / (2.0 * t_a * t_b), 6) AS tv_distance
    FROM pair
    """,
    doc="Pairwise total-variation distance between source unigram "
    "distributions in exact integer arithmetic (|c1*t2 - c2*t1| decimal "
    "sums, one final division) — the mixture-health report for "
    "multi-source corpus assembly. Token-inner-join only; missing-token "
    "mass recovered from shared-token sums.",
)
def source_vocab_tv_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    tok = d.select("source", F.explode(tokens("text")).alias("tk"))
    cnt = tok.groupBy("source", "tk").agg(F.count(F.lit(1)).alias("c"))
    tot = tok.groupBy("source").agg(F.count(F.lit(1)).alias("t"))
    a = cnt.select(
        F.col("source").alias("source_a"), "tk", F.col("c").alias("c_a")
    )
    b = cnt.select(
        F.col("source").alias("source_b"), "tk", F.col("c").alias("c_b")
    )
    ta = tot.select(F.col("source").alias("source_a"), F.col("t").alias("t_a"))
    tb = tot.select(F.col("source").alias("source_b"), F.col("t").alias("t_b"))
    dec = lambda c: F.col(c).cast("decimal(38,0)")
    shared = (
        a.join(b, "tk")
        .filter(F.col("source_a") < F.col("source_b"))
        .join(F.broadcast(ta), "source_a")
        .join(F.broadcast(tb), "source_b")
        .groupBy("source_a", "source_b")
        .agg(
            F.sum(
                F.abs(dec("c_a") * F.col("t_b") - dec("c_b") * F.col("t_a"))
            ).alias("num_shared"),
            F.sum(dec("c_a")).alias("shared_a"),
            F.sum(dec("c_b")).alias("shared_b"),
        )
    )
    # pair spine from tot x tot: a fully-disjoint pair shares no token
    # but its TV distance is defined (= 1.0) and must be emitted
    spine = (
        ta.crossJoin(tb)
        .filter(F.col("source_a") < F.col("source_b"))
    )
    pair = spine.join(shared, ["source_a", "source_b"], "left").select(
        "source_a",
        "source_b",
        "t_a",
        "t_b",
        F.coalesce(F.col("num_shared"), F.lit(0).cast("decimal(38,0)")).alias(
            "num_shared"
        ),
        F.coalesce(F.col("shared_a"), F.lit(0).cast("decimal(38,0)")).alias(
            "shared_a"
        ),
        F.coalesce(F.col("shared_b"), F.lit(0).cast("decimal(38,0)")).alias(
            "shared_b"
        ),
    )
    return pair.select(
        "source_a",
        "source_b",
        F.round(
            (
                F.col("num_shared")
                + (F.col("t_a") - F.col("shared_a")) * F.col("t_b")
                + (F.col("t_b") - F.col("shared_b")) * F.col("t_a")
            ).cast("double")
            / (F.lit(2.0) * F.col("t_a") * F.col("t_b")),
            6,
        ).alias("tv_distance"),
    )


# ---------------------------------------------------------------------------
# MinHash calibration report: for every LSH candidate pair (any band
# collision), the signature-estimated Jaccard (fraction of the 32
# permutation slots that agree — the unbiased MinHash estimator) next to
# the EXACT shingle Jaccard, with the absolute error. The sketch-quality
# report that justifies (or indicts) the production LSH parameters: if
# |est - exact| drifts past the ~1/sqrt(32) band, the permutation family
# or shingle unit is wrong. The deterministic md5-based permutation
# family (functions/hashing.py) is what makes even the ESTIMATOR
# oracle-checkable. Estimates are counts/32 (exact division); the same
# candidate machinery as dedup_minhash_lsh.
# ---------------------------------------------------------------------------


def _minhash_band_rows_sql(n_perm: int, bands: int) -> str:
    """SQL mirror of operators/dedup.minhash_bands over a `sig` CTE —
    ONE definition shared by the calibration and bucket-load oracles
    (band construction in lockstep with the Spark side by import, never
    by copy)."""
    from dsacord_spark.functions.hashing import md5_long_sql

    rows = n_perm // bands
    return " UNION ALL ".join(
        "SELECT doc, {j} AS band_idx, {h} AS band_hash FROM sig".format(
            j=j,
            h=md5_long_sql(
                "concat_ws(',', "
                + ", ".join(
                    [str(j)] + [f"m{j * rows + r}" for r in range(rows)]
                )
                + ")"
            ),
        )
        for j in range(bands)
    )


def _minhash_calibration_sql(n_perm: int = 32, bands: int = 8) -> str:
    from dsacord_spark.functions.hashing import _perm_constants
    from dsacord_spark.plans.analysis import _ngr_cte, _perm_min_sql

    perms = _perm_constants(n_perm)
    mins = ",\n             ".join(
        _perm_min_sql(i, a, b) for i, (a, b) in enumerate(perms)
    )
    band_rows = _minhash_band_rows_sql(n_perm, bands)
    agree = " + ".join(
        f"(CASE WHEN sa.m{i} = sb.m{i} THEN 1 ELSE 0 END)"
        for i in range(n_perm)
    )
    return f"""
    WITH {_ngr_cte(3).strip()},
    sig AS (SELECT doc, {mins} FROM ngr GROUP BY doc),
    bands AS ({band_rows}),
    cand AS (
      SELECT DISTINCT a.doc AS doc_a, b.doc AS doc_b
      FROM bands a JOIN bands b
        ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
           AND a.doc < b.doc),
    sizes AS (SELECT doc, count(*) AS sz FROM ngr GROUP BY doc),
    inter AS (
      SELECT c.doc_a, c.doc_b, count(*) AS i
      FROM cand c JOIN ngr a ON a.doc = c.doc_a
      JOIN ngr b ON b.doc = c.doc_b AND a.hg = b.hg
      GROUP BY 1, 2),
    est AS (
      SELECT c.doc_a, c.doc_b,
             CAST({agree} AS DOUBLE) / {n_perm} AS est_jaccard
      FROM cand c JOIN sig sa ON sa.doc = c.doc_a
      JOIN sig sb ON sb.doc = c.doc_b)
    SELECT est.doc_a, est.doc_b,
           round(est_jaccard, 6) AS est_jaccard,
           round(CAST(COALESCE(i, 0) AS DOUBLE)
                 / (sa.sz + sb.sz - COALESCE(i, 0)), 6) AS exact_jaccard,
           round(abs(est_jaccard - CAST(COALESCE(i, 0) AS DOUBLE)
                 / (sa.sz + sb.sz - COALESCE(i, 0))), 6) AS abs_error
    FROM est
    LEFT JOIN inter ON inter.doc_a = est.doc_a AND inter.doc_b = est.doc_b
    JOIN sizes sa ON sa.doc = est.doc_a
    JOIN sizes sb ON sb.doc = est.doc_b
    """


@register(
    "dedup_minhash_calibration",
    sql=_minhash_calibration_sql(32, 8),
    doc="MinHash sketch-calibration: per LSH candidate pair, the "
    "32-permutation signature-agreement estimate of Jaccard next to the "
    "exact shingle Jaccard and |error| — the report that validates the "
    "production LSH parameters. Deterministic md5 permutations make the "
    "estimator itself oracle-checkable.",
)
def dedup_minhash_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dsacord_spark.operators.dedup import (
        _shingle_index, minhash_bands, minhash_signatures,
    )

    n_perm, bands = 32, 8
    d = table(spark, sf_dir, "documents")
    # persisted: this entry consumes the signature frame from FOUR plan
    # branches (bands a/b, sa, sb) and Spark does no CSE across them —
    # unpersisted, the 32-permutation aggregate re-executes per branch
    # (observed: 6 InMemoryTableScans of the shingle cache in one run).
    # One row per doc, same order as the output; released at the bench/
    # harness family boundary like every catalog persist. Local wall is
    # parity (the shingle cache absorbs recomputes at sf0.1); at corpus
    # scale the avoided recomputes are full-index aggregate passes.
    # (r13 note: a grouped collect_list pair-generation variant was
    # A/B'd and measured SLOWER — 1.67s -> 2.08s interleaved min-of-3 —
    # so the self-join over the sig-persist-backed bands stays; the
    # banding itself recomputes from the cached signature, which is
    # cheap md5 column algebra.)
    sig = minhash_signatures(d, "doc_id", "text", 3, n_perm).persist()
    bands_df = minhash_bands(sig, n_perm, bands)
    a, b = bands_df.alias("a"), bands_df.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .distinct()
    )
    sa = sig.select(
        F.col("doc").alias("doc_a"),
        *[F.col(f"m{i}").alias(f"a{i}") for i in range(n_perm)],
    )
    sb = sig.select(
        F.col("doc").alias("doc_b"),
        *[F.col(f"m{i}").alias(f"b{i}") for i in range(n_perm)],
    )
    agree = sum(
        F.when(F.col(f"a{i}") == F.col(f"b{i}"), 1).otherwise(0)
        for i in range(n_perm)
    )
    est = (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (agree.cast("double") / F.lit(n_perm)).alias("est_jaccard"),
        )
    )
    ngr = _shingle_index(d, "doc_id", "text", 3)
    sizes = ngr.groupBy("doc").agg(F.count(F.lit(1)).alias("sz"))
    na = ngr.select(F.col("doc").alias("doc_a"), F.col("hg").alias("hg_a"))
    nb = ngr.select(F.col("doc").alias("doc_b2"), F.col("hg").alias("hg_b"))
    inter = (
        cand.join(na, "doc_a")
        .join(
            nb,
            (F.col("doc_b") == F.col("doc_b2"))
            & (F.col("hg_a") == F.col("hg_b")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    sza = sizes.select(F.col("doc").alias("doc_a"), F.col("sz").alias("sz_a"))
    szb = sizes.select(F.col("doc").alias("doc_b"), F.col("sz").alias("sz_b"))
    i0 = F.coalesce(F.col("i"), F.lit(0))
    exact = i0.cast("double") / (F.col("sz_a") + F.col("sz_b") - i0)
    return (
        est.join(inter, ["doc_a", "doc_b"], "left")
        .join(sza, "doc_a")
        .join(szb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round("est_jaccard", 6).alias("est_jaccard"),
            F.round(exact, 6).alias("exact_jaccard"),
            F.round(F.abs(F.col("est_jaccard") - exact), 6).alias("abs_error"),
        )
    )


# ---------------------------------------------------------------------------
# Co-presence graph build: pairs of users active in the same hour bucket,
# scored by the number of shared hours — the standard co-occurrence edge
# list (user-user projection of the bipartite user-hour graph). The
# self-join is BOUNDED BY BUCKETING *and by a per-bucket admission cap*:
# each hour admits at most _COPRESENCE_CAP users (deterministic scrambled
# admission order so the cap is an unbiased sample, not "lowest ids"), so
# a hot hour with U users costs min(U, cap)^2/2 pairs instead of U^2/2 —
# that bound is what keeps a 100 TB co-presence build tractable when one
# hour is skewed (an outage spike, a bot storm). The cap does not bind at
# the test SFs (max 166 users/hour at sf0.1). Top-50 lands as
# TakeOrderedAndProject (orderBy+limit — per-partition top-50 then a
# 50-row merge on the driver side of the exchange), NOT a row_number over
# the full pair aggregate through one partition; rank is assigned on the
# 50-row result.
# ---------------------------------------------------------------------------

_COPRESENCE_CAP = 1024
# Admission-scramble constants — shared by the Spark expression and the
# oracle SQL below (interpolated, never duplicated as literals: editing
# one side alone would silently break Spark/oracle lockstep — r4 ADVICE).
# Fold the id through a modular multiply: exact integer math, identical
# on both engines, so the per-hour cap samples the bucket deterministically
# instead of admitting the lowest ids. The triple's canonical home is
# functions/hashing.py (also used by the banded-joiner bucket cap);
# importing keeps the copies drift-proof while the SQL interpolation
# below keeps the oracle in lockstep.
from dsacord_spark.functions.hashing import (  # noqa: E402
    SCRAMBLE_MOD1 as _SCRAMBLE_MOD1,
    SCRAMBLE_MOD2 as _SCRAMBLE_MOD2,
    SCRAMBLE_MULT as _SCRAMBLE_MULT,
)


def _scramble(col):
    """Spark Column form of the admission scramble."""
    return ((col % _SCRAMBLE_MOD1) * _SCRAMBLE_MULT) % _SCRAMBLE_MOD2


_SCRAMBLE_SQL = (
    f"((user_id % {_SCRAMBLE_MOD1}) * {_SCRAMBLE_MULT}) % {_SCRAMBLE_MOD2}"
)


@register(
    "events_user_copresence_topk",
    sql=f"""
    WITH uh AS (
      SELECT DISTINCT user_id,
             date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hr
      FROM events),
    adm AS (
      SELECT user_id, hr,
             row_number() OVER (
               PARTITION BY hr
               ORDER BY {_SCRAMBLE_SQL},
                        user_id) AS rn
      FROM uh),
    capped AS (SELECT user_id, hr FROM adm WHERE rn <= {_COPRESENCE_CAP}),
    pairs AS (
      SELECT a.user_id AS user_a, b.user_id AS user_b,
             count(*) AS shared_hours
      FROM capped a JOIN capped b ON a.hr = b.hr AND a.user_id < b.user_id
      GROUP BY 1, 2),
    top AS (
      SELECT user_a, user_b, shared_hours
      FROM pairs
      ORDER BY shared_hours DESC, user_a ASC, user_b ASC
      LIMIT 50)
    SELECT row_number() OVER (ORDER BY shared_hours DESC,
                              user_a ASC, user_b ASC) AS rank,
           user_a, user_b, shared_hours
    FROM top
    """,
    doc="User co-presence edge list: pairs of users sharing activity "
    "hours, top-50 by shared-hour count (pair-key tie-break). The "
    "self-join is bucketed by hour AND capped per bucket (deterministic "
    "scrambled admission, 1024 users/hour) so a skewed hour is bounded; "
    "top-50 via orderBy+limit (TakeOrderedAndProject), rank assigned on "
    "the 50-row result.",
)
def events_user_copresence_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    # persisted: BOTH self-join sides consume it — unpersisted, the scan
    # and the distinct shuffle run twice (released at the bench family
    # boundary / sweep-end clearCache)
    uh = e.select(
        "user_id", F.date_trunc("hour", F.col("ts")).alias("hr")
    ).distinct()
    # Deterministic per-hour admission cap: scrambled order (fold the id
    # through a small modular multiply — exact integer math, identical on
    # both engines) so the cap samples the bucket rather than taking the
    # lowest ids. row_number is PARTITIONED by hr — no global window.
    adm = W.partitionBy("hr").orderBy(
        _scramble(F.col("user_id")).asc(),
        F.col("user_id").asc(),
    )
    capped = (
        uh.withColumn("rn", F.row_number().over(adm))
        .filter(F.col("rn") <= _COPRESENCE_CAP)
        .select("user_id", "hr")
        .persist()
    )
    a = capped.select(F.col("user_id").alias("user_a"), "hr")
    b = capped.select(F.col("user_id").alias("user_b"), "hr")
    pairs = (
        a.join(b, "hr")
        .filter(F.col("user_a") < F.col("user_b"))
        .groupBy("user_a", "user_b")
        .agg(F.count(F.lit(1)).alias("shared_hours"))
    )
    top = pairs.orderBy(
        F.col("shared_hours").desc(), F.col("user_a").asc(), F.col("user_b").asc()
    ).limit(50)
    # rank over the 50-row TakeOrderedAndProject result — the single
    # partition window consumes 50 rows, never the full pair table.
    win = W.orderBy(
        F.col("shared_hours").desc(), F.col("user_a").asc(), F.col("user_b").asc()
    )
    return top.select(
        F.row_number().over(win).alias("rank"),
        "user_a",
        "user_b",
        "shared_hours",
    )


# ---------------------------------------------------------------------------
# Embedding-norm distribution per label: per-vector L2 norm via the
# position-ordered fold (bit-identical across engines), then EXACT
# interpolated percentiles per label — percentile is selection over
# deterministic doubles, not summation, so it is fold-order-safe. The
# norm profile catches normalization bugs (a label whose p50 norm is far
# from 1 after a supposed L2-normalize) before they poison cosine math.
# ---------------------------------------------------------------------------


@register(
    "embed_norm_percentiles",
    sql="""
    WITH n AS (
      SELECT label,
             sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                   CAST(embedding AS DOUBLE[]))) AS nrm
      FROM embeddings)
    SELECT label, count(*) AS n_vecs,
           round(quantile_cont(nrm, 0.05), 6) AS p05_norm,
           round(quantile_cont(nrm, 0.5), 6) AS p50_norm,
           round(quantile_cont(nrm, 0.95), 6) AS p95_norm
    FROM n GROUP BY label
    """,
    doc="Per-label L2-norm percentiles of the embedding table (exact "
    "interpolated selection over deterministic per-vector fold norms) — "
    "the normalization-health check run before any cosine pipeline.",
)
def embed_norm_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dsacord_spark.functions.vectors import norm

    e = table(spark, sf_dir, "embeddings")
    n = e.select("label", norm("embedding").alias("nrm"))
    return n.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.round(F.percentile("nrm", F.lit(0.05)), 6).alias("p05_norm"),
        F.round(F.percentile("nrm", F.lit(0.5)), 6).alias("p50_norm"),
        F.round(F.percentile("nrm", F.lit(0.95)), 6).alias("p95_norm"),
    )


# ---------------------------------------------------------------------------
# Burstiness (index of dispersion) per user: Fano factor of the per-hour
# event counts, D = var/mean, in EXACT integer algebra — with hourly
# counts n_i over N active+inactive... here N = user's active hours and
# the population variance over them:
#   D = (N * sum(n^2) - (sum n)^2) / (N * sum n)
# (counts are ints; squares kept in DECIMAL(38,0); one double division).
# D ~ 1 is Poisson-like arrival, D >> 1 is bursty — the standard traffic
# shape report. One (user, hour) count shuffle + a per-user rollup.
# ---------------------------------------------------------------------------


@register(
    "events_burstiness_fano",
    sql="""
    WITH uh AS (
      SELECT user_id, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hr,
             count(*) AS n
      FROM events GROUP BY 1, 2),
    agg AS (
      SELECT user_id,
             count(*) AS n_hours,
             SUM(CAST(n AS DECIMAL(38,0))) AS s1,
             SUM(CAST(n AS DECIMAL(38,0)) * n) AS s2
      FROM uh GROUP BY user_id)
    SELECT user_id, n_hours, CAST(s1 AS BIGINT) AS n_events,
           round(CAST(n_hours * s2 - s1 * s1 AS DOUBLE)
                 / CAST(n_hours * s1 AS DOUBLE), 6) AS fano
    FROM agg
    """,
    doc="Per-user burstiness: Fano factor (variance/mean) of hourly event "
    "counts in exact integer algebra — (N*sum(n^2) - (sum n)^2) / "
    "(N*sum n), decimal-exact sums, one double division. D~1 Poisson, "
    "D>>1 bursty.",
)
def events_burstiness_fano(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    uh = e.groupBy(
        "user_id", F.date_trunc("hour", F.col("ts")).alias("hr")
    ).agg(F.count(F.lit(1)).alias("n"))
    dec = F.col("n").cast("decimal(38,0)")
    agg = uh.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_hours"),
        F.sum(dec).alias("s1"),
        F.sum(dec * F.col("n")).alias("s2"),
    )
    return agg.select(
        "user_id",
        "n_hours",
        F.col("s1").cast("bigint").alias("n_events"),
        F.round(
            (F.col("n_hours") * F.col("s2") - F.col("s1") * F.col("s1"))
            .cast("double")
            / (F.col("n_hours") * F.col("s1")).cast("double"),
            6,
        ).alias("fano"),
    )


# ---------------------------------------------------------------------------
# Weekly seasonality: net revenue per ISO week with week-over-week delta
# and the share of its quarter — exact decimal sums, lag over the tiny
# aggregated frame, single divisions at the boundary. The calendar
# rollup+lag shape (dashboard staple) the catalog lacked.
# ---------------------------------------------------------------------------


@register(
    "lineitem_weekly_revenue",
    sql="""
    WITH w AS (
      SELECT strftime(date_trunc('week', CAST(l_shipdate AS TIMESTAMP)),
                      '%Y-%m-%d') AS week_start,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                 * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
               AS rev
      FROM lineitem GROUP BY 1)
    SELECT week_start,
           CAST(rev AS DOUBLE) AS net_revenue,
           CAST(rev - lag(rev) OVER (ORDER BY week_start) AS DOUBLE)
             AS wow_delta
    FROM w
    """,
    doc="Net revenue per Monday-started week (date_trunc('week') agrees "
    "across engines; ISO week-year patterns do not survive Spark 3's "
    "parser) with week-over-week delta: exact decimal sums; the lag "
    "window runs over the tiny aggregated frame, never the fact table.",
)
def lineitem_weekly_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    dec = lambda c: F.col(c).cast("decimal(18,2)")
    w = l.groupBy(
        F.date_format(
            F.date_trunc("week", F.col("l_shipdate").cast("timestamp")),
            "yyyy-MM-dd",
        ).alias("week_start")
    ).agg(
        F.sum(
            dec("l_extendedprice")
            * (F.lit(1).cast("decimal(18,2)") - dec("l_discount"))
        ).alias("rev")
    )
    lagw = W.orderBy("week_start")
    return w.select(
        "week_start",
        F.col("rev").cast("double").alias("net_revenue"),
        (F.col("rev") - F.lag("rev").over(lagw)).cast("double").alias("wow_delta"),
    )


# ---------------------------------------------------------------------------
# Character-class profile per language: ascii-letter / digit / whitespace
# / punctuation-ish counts and ratios — the encoding-health report that
# catches mojibake and OCR garbage per corpus slice. Pure map-side
# regexp_replace length algebra (identical Java/RE2 character classes),
# exact integer counts, single divisions.
# ---------------------------------------------------------------------------


@register(
    "text_charclass_profile",
    sql="""
    WITH m AS (
      SELECT lang,
             length(text) AS n_all,
             length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS n_alpha,
             length(regexp_replace(text, '[^0-9]', '', 'g')) AS n_digit,
             length(text) - length(regexp_replace(text, '\\s', '', 'g'))
               AS n_space
      FROM documents),
    a AS (
      SELECT lang, count(*) AS n_docs,
             SUM(CAST(n_all AS BIGINT)) AS chars,
             SUM(CAST(n_alpha AS BIGINT)) AS alpha,
             SUM(CAST(n_digit AS BIGINT)) AS digit,
             SUM(CAST(n_space AS BIGINT)) AS space
      FROM m GROUP BY lang)
    SELECT lang, n_docs, CAST(chars AS BIGINT) AS chars,
           round(CAST(alpha AS DOUBLE) / chars, 6) AS alpha_ratio,
           round(CAST(digit AS DOUBLE) / chars, 6) AS digit_ratio,
           round(CAST(space AS DOUBLE) / chars, 6) AS space_ratio,
           round(CAST(chars - alpha - digit - space AS DOUBLE) / chars, 6)
             AS other_ratio
    FROM a
    """,
    doc="Character-class profile per language (alpha/digit/space/other "
    "ratios over exact integer counts) — the encoding/mojibake health "
    "report. Map-side regex length algebra, one tiny rollup.",
)
def text_charclass_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    m = d.select(
        "lang",
        F.length("text").alias("n_all"),
        F.length(F.regexp_replace("text", "[^A-Za-z]", "")).alias("n_alpha"),
        F.length(F.regexp_replace("text", "[^0-9]", "")).alias("n_digit"),
        (
            F.length("text") - F.length(F.regexp_replace("text", "\\s", ""))
        ).alias("n_space"),
    )
    a = m.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("n_all").cast("bigint")).alias("chars"),
        F.sum(F.col("n_alpha").cast("bigint")).alias("alpha"),
        F.sum(F.col("n_digit").cast("bigint")).alias("digit"),
        F.sum(F.col("n_space").cast("bigint")).alias("space"),
    )
    r = lambda c: F.round(c.cast("double") / F.col("chars"), 6)
    return a.select(
        "lang",
        "n_docs",
        "chars",
        r(F.col("alpha")).alias("alpha_ratio"),
        r(F.col("digit")).alias("digit_ratio"),
        r(F.col("space")).alias("space_ratio"),
        r(F.col("chars") - F.col("alpha") - F.col("digit") - F.col("space")).alias(
            "other_ratio"
        ),
    )


# ---------------------------------------------------------------------------
# Repeat-order retention: of customers whose FIRST order is at least H
# days before the corpus horizon (so the window is fully observable),
# the fraction that placed a second order within 30/60/90 days — the
# survival/conversion-window rollup (exact day arithmetic, no windows
# over the fact table: per-customer min + second-min via two aggregates).
# ---------------------------------------------------------------------------


@register(
    "orders_repeat_retention",
    sql="""
    WITH c AS (
      SELECT o_custkey,
             min(CAST(o_orderdate AS TIMESTAMP)) AS first_order
      FROM orders GROUP BY o_custkey),
    nxt AS (
      SELECT o.o_custkey,
             min(CAST(o.o_orderdate AS TIMESTAMP)) AS second_order
      FROM orders o JOIN c USING (o_custkey)
      WHERE CAST(o.o_orderdate AS TIMESTAMP) > c.first_order
      GROUP BY o.o_custkey),
    h AS (SELECT max(CAST(o_orderdate AS TIMESTAMP)) AS horizon FROM orders),
    j AS (
      SELECT c.o_custkey,
             date_diff('day', c.first_order,
                       COALESCE(nxt.second_order, h.horizon + INTERVAL 1000 DAY))
               AS gap_days,
             date_diff('day', c.first_order, h.horizon) AS observable_days
      FROM c LEFT JOIN nxt USING (o_custkey), h)
    SELECT CAST(count(*) AS BIGINT) AS n_customers,
           CAST(SUM(CASE WHEN gap_days <= 30 THEN 1 ELSE 0 END) AS BIGINT)
             AS repeat_30d,
           CAST(SUM(CASE WHEN gap_days <= 60 THEN 1 ELSE 0 END) AS BIGINT)
             AS repeat_60d,
           CAST(SUM(CASE WHEN gap_days <= 90 THEN 1 ELSE 0 END) AS BIGINT)
             AS repeat_90d,
           round(CAST(SUM(CASE WHEN gap_days <= 90 THEN 1 ELSE 0 END) AS DOUBLE)
                 / count(*), 6) AS repeat_90d_rate
    FROM j WHERE observable_days >= 90
    """,
    doc="Repeat-order retention: of customers with >= 90 observable days "
    "after their first order, how many re-ordered within 30/60/90 days. "
    "Two per-customer aggregates (first + second order), exact day "
    "arithmetic, one summary row.",
)
def orders_repeat_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").select(
        "o_custkey", F.col("o_orderdate").cast("timestamp").alias("od")
    )
    c = o.groupBy("o_custkey").agg(F.min("od").alias("first_order"))
    nxt = (
        o.join(c, "o_custkey")
        .filter(F.col("od") > F.col("first_order"))
        .groupBy("o_custkey")
        .agg(F.min("od").alias("second_order"))
    )
    h = o.agg(F.max("od").alias("horizon"))
    j = (
        c.join(nxt, "o_custkey", "left")
        .crossJoin(F.broadcast(h))
        .select(
            "o_custkey",
            F.datediff(
                F.coalesce(
                    F.col("second_order"),
                    F.col("horizon") + F.expr("INTERVAL 1000 DAYS"),
                ),
                F.col("first_order"),
            ).alias("gap_days"),
            F.datediff(F.col("horizon"), F.col("first_order")).alias(
                "observable_days"
            ),
        )
        .filter(F.col("observable_days") >= 90)
    )
    flag = lambda d: F.sum(
        F.when(F.col("gap_days") <= d, 1).otherwise(0)
    ).cast("bigint")
    return j.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers"),
        flag(30).alias("repeat_30d"),
        flag(60).alias("repeat_60d"),
        flag(90).alias("repeat_90d"),
        F.round(
            F.sum(F.when(F.col("gap_days") <= 90, 1).otherwise(0)).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("repeat_90d_rate"),
    )


# ---------------------------------------------------------------------------
# Activity heatmap matrix: event counts and share by (day-of-week, hour-
# of-day) — the traffic-shape fingerprint behind capacity planning.
# ISO day-of-week numbering pinned on both engines; exact counts, one
# division against the broadcast total.
# ---------------------------------------------------------------------------


def _iso_dow(col) -> "F.Column":
    """ISO day-of-week (1=Monday..7=Sunday) from Spark's dayofweek
    (1=Sunday..7=Saturday) — the Spark twin of DuckDB's isodow(). One
    definition shared by every weekday-keyed entry (heatmap, forecast
    scorecard), so a mapping fix can never drift between them."""
    return ((F.dayofweek(col) + 5) % 7) + 1

@register(
    "events_weekhour_heatmap",
    sql="""
    WITH e AS (
      SELECT isodow(CAST(ts AS TIMESTAMP)) AS dow,
             CAST(strftime(CAST(ts AS TIMESTAMP), '%H') AS INT) AS hod
      FROM events),
    t AS (SELECT count(*) AS n FROM e)
    SELECT dow, hod, count(*) AS n_events,
           round(CAST(count(*) AS DOUBLE) / max(n), 6) AS share
    FROM e, t GROUP BY dow, hod
    """,
    doc="(ISO day-of-week, hour-of-day) activity matrix with exact counts "
    "and total share — the 7x24 traffic fingerprint. One narrow "
    "aggregation; the total broadcasts.",
)
def events_weekhour_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events").select(
        _iso_dow("ts").alias("dow"),
        F.hour("ts").alias("hod"),
    )
    t = e.agg(F.count(F.lit(1)).alias("n"))
    return (
        e.groupBy("dow", "hod")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .crossJoin(F.broadcast(t))
        .select(
            "dow",
            "hod",
            "n_events",
            F.round(F.col("n_events").cast("double") / F.col("n"), 6).alias(
                "share"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Hapax ratio per source: fraction of each source's vocabulary that
# occurs exactly once IN THAT SOURCE (hapax legomena) and the source's
# type-token ratio — the vocabulary-richness fingerprint (template-heavy
# sources show low hapax share, natural prose high). Exact integer
# counts over one (source, token) aggregation.
# ---------------------------------------------------------------------------


@register(
    "text_hapax_ratio",
    sql="""
    WITH tok AS (
      SELECT source, tk
      FROM (SELECT source,
                   list_filter(string_split_regex(trim(text), '\\s+'),
                               x -> x <> '') AS t
            FROM documents), unnest(t) AS u(tk)),
    cnt AS (SELECT source, tk, count(*) AS c FROM tok GROUP BY 1, 2),
    a AS (
      SELECT source,
             count(*) AS vocab,
             SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS hapax,
             SUM(c) AS n_tokens
      FROM cnt GROUP BY source)
    SELECT source, CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(vocab AS BIGINT) AS vocab,
           CAST(hapax AS BIGINT) AS hapax,
           round(CAST(hapax AS DOUBLE) / vocab, 6) AS hapax_ratio,
           round(CAST(vocab AS DOUBLE) / n_tokens, 6) AS type_token_ratio
    FROM a
    """,
    doc="Vocabulary richness per source: hapax-legomena share of the "
    "vocabulary and type-token ratio (exact integer counts) — low hapax "
    "share flags template/boilerplate-heavy sources.",
)
def text_hapax_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    tok = d.select("source", F.explode(tokens("text")).alias("tk"))
    cnt = tok.groupBy("source", "tk").agg(F.count(F.lit(1)).alias("c"))
    a = cnt.groupBy("source").agg(
        F.count(F.lit(1)).alias("vocab"),
        F.sum(F.when(F.col("c") == 1, 1).otherwise(0)).alias("hapax"),
        F.sum("c").alias("n_tokens"),
    )
    return a.select(
        "source",
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        F.col("vocab").cast("bigint").alias("vocab"),
        F.col("hapax").cast("bigint").alias("hapax"),
        F.round(F.col("hapax").cast("double") / F.col("vocab"), 6).alias(
            "hapax_ratio"
        ),
        F.round(F.col("vocab").cast("double") / F.col("n_tokens"), 6).alias(
            "type_token_ratio"
        ),
    )


# ---------------------------------------------------------------------------
# Duplicate-shingle rate as a function of n: for n in {2, 3, 5, 8}, the
# fraction of distinct word n-grams that occur in more than one document
# — the curve that picks the shingle size for the dedup family (too
# small = everything collides, too large = nothing does). One scan per n
# unioned; each n's aggregate is two narrow shuffles.
# ---------------------------------------------------------------------------
_NGRAM_SWEEP = (2, 3, 5, 8)


def _dup_rate_sql(n: int) -> str:
    return f"""
    SELECT {n} AS n,
           count(*) AS n_shingles,
           CAST(SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
           round(CAST(SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS DOUBLE)
                 / count(*), 6) AS shared_rate
    FROM (
      SELECT ng, count(DISTINCT doc_id) AS nd
      FROM (
        SELECT DISTINCT doc_id, array_to_string(t[i:i+{n - 1}], ' ') AS ng
        FROM (SELECT doc_id,
                     list_filter(string_split_regex(trim(text), '\\s+'),
                                 x -> x <> '') AS t
              FROM documents),
             unnest(generate_series(1, greatest(len(t)-{n - 1}, 1))) AS u(i))
      GROUP BY ng)
    """


@register(
    "text_ngram_dup_sweep",
    sql=" UNION ALL ".join(_dup_rate_sql(n) for n in _NGRAM_SWEEP),
    doc="Cross-document duplicate rate of distinct word n-grams for n in "
    "{2,3,5,8} — the curve that justifies the dedup family's shingle "
    "size. One distinct-ngram aggregation per n.",
)
def text_ngram_dup_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    # tokenize ONCE and persist: each of the 4 sweep branches re-reading
    # and re-splitting the corpus cost 4.6s at sf0.1; sharing the token
    # array cuts it to one scan + 4 cheap shingle expansions (released
    # at the bench family boundary / sweep-end clearCache)
    tk = d.select("doc_id", tokens("text").alias("t")).persist()
    outs = []
    for n in _NGRAM_SWEEP:
        offsets = F.sequence(
            F.lit(1), F.greatest(F.size("t") - F.lit(n - 1), F.lit(1))
        )
        ngrams = F.array_distinct(
            F.transform(
                offsets, lambda i: F.concat_ws(" ", F.slice(F.col("t"), i, n))
            )
        )
        ng = tk.select("doc_id", F.explode(ngrams).alias("ng")).distinct()
        per = ng.groupBy("ng").agg(F.count_distinct("doc_id").alias("nd"))
        outs.append(
            per.agg(
                F.lit(n).alias("n"),
                F.count(F.lit(1)).alias("n_shingles"),
                F.sum(F.when(F.col("nd") > 1, 1).otherwise(0)).alias(
                    "n_shared"
                ),
                F.round(
                    F.sum(F.when(F.col("nd") > 1, 1).otherwise(0)).cast(
                        "double"
                    )
                    / F.count(F.lit(1)),
                    6,
                ).alias("shared_rate"),
            )
        )
    out = outs[0]
    for rest in outs[1:]:
        out = out.unionAll(rest)
    return out


# ---------------------------------------------------------------------------
# Windowed funnel: view -> click -> purchase where each step must land
# within 24h of the PREVIOUS step (events_funnel counts unconditional
# first-touch ordering; real funnels expire). Per-user first qualifying
# chain via min-aggregates, then one summary row with conversion rates —
# exact integer microsecond arithmetic. Two aggregates over the events
# scan; no window over the raw stream.
# ---------------------------------------------------------------------------
_FUNNEL_WINDOW_US = 24 * 3600 * 1_000_000


@register(
    "events_funnel_windowed",
    sql=f"""
    WITH e AS (
      SELECT user_id, event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS us
      FROM events),
    v AS (SELECT user_id, min(us) AS t1 FROM e
          WHERE event_type = 'view' GROUP BY user_id),
    c AS (
      SELECT e.user_id, min(e.us) AS t2
      FROM e JOIN v USING (user_id)
      WHERE e.event_type = 'click' AND e.us > v.t1
        AND e.us - v.t1 <= {_FUNNEL_WINDOW_US}
      GROUP BY e.user_id),
    p AS (
      SELECT e.user_id, min(e.us) AS t3
      FROM e JOIN c USING (user_id)
      WHERE e.event_type = 'purchase' AND e.us > c.t2
        AND e.us - c.t2 <= {_FUNNEL_WINDOW_US}
      GROUP BY e.user_id)
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM v) AS step1_view,
           (SELECT CAST(count(*) AS BIGINT) FROM c) AS step2_click_24h,
           (SELECT CAST(count(*) AS BIGINT) FROM p) AS step3_purchase_24h,
           round(CAST((SELECT count(*) FROM c) AS DOUBLE)
                 / (SELECT count(*) FROM v), 6) AS view_to_click,
           round(CAST((SELECT count(*) FROM p) AS DOUBLE)
                 / greatest((SELECT count(*) FROM c), 1), 6) AS click_to_purchase
    """,
    doc="Expiring funnel: view -> click -> purchase with a 24h deadline "
    "per step (first qualifying chain per user, exact integer "
    "microseconds). Three min-aggregates chained by semi-join; one "
    "summary row.",
)
def events_funnel_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events").select("user_id", "event_type", "ts_us")
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("t1"))
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(
            (F.col("ts_us") > F.col("t1"))
            & (F.col("ts_us") - F.col("t1") <= _FUNNEL_WINDOW_US)
        )
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("t2"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(
            (F.col("ts_us") > F.col("t2"))
            & (F.col("ts_us") - F.col("t2") <= _FUNNEL_WINDOW_US)
        )
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("t3"))
    )
    nv = v.agg(F.count(F.lit(1)).alias("step1_view"))
    nc = c.agg(F.count(F.lit(1)).alias("step2_click_24h"))
    np_ = p.agg(F.count(F.lit(1)).alias("step3_purchase_24h"))
    return (
        nv.crossJoin(F.broadcast(nc))
        .crossJoin(F.broadcast(np_))
        .select(
            F.col("step1_view").cast("bigint").alias("step1_view"),
            F.col("step2_click_24h").cast("bigint").alias("step2_click_24h"),
            F.col("step3_purchase_24h").cast("bigint").alias(
                "step3_purchase_24h"
            ),
            F.round(
                F.col("step2_click_24h").cast("double") / F.col("step1_view"),
                6,
            ).alias("view_to_click"),
            F.round(
                F.col("step3_purchase_24h").cast("double")
                / F.greatest(F.col("step2_click_24h"), F.lit(1)),
                6,
            ).alias("click_to_purchase"),
        )
    )


# ---------------------------------------------------------------------------
# Rolling 7-day active users per day: exact rolling DISTINCT (which no
# window frame can express — distincts don't sum) via the day-spine
# range join against the deduplicated (user, day) table: each day counts
# the distinct users whose active-day falls in [d-6, d]. The join fans
# each user-day to <= 7 spine days — linear in activity, the scale-safe
# exact formulation (the approximate twin at 100 TB is the HLL-partial
# path the streaming sketches already demonstrate).
# ---------------------------------------------------------------------------


@register(
    "events_rolling_7d_active",
    sql="""
    WITH ud AS (
      SELECT DISTINCT user_id,
             date_trunc('day', CAST(ts AS TIMESTAMP)) AS day
      FROM events),
    spine AS (SELECT DISTINCT day FROM ud),
    j AS (
      SELECT s.day, ud.user_id
      FROM spine s JOIN ud
        ON ud.day <= s.day AND ud.day >= s.day - INTERVAL 6 DAY)
    SELECT strftime(day, '%Y-%m-%d') AS day,
           CAST(count(DISTINCT user_id) AS BIGINT) AS active_7d
    FROM j GROUP BY day
    """,
    doc="Exact rolling 7-day distinct active users per day via the "
    "day-spine range join over deduplicated (user, day) — rolling "
    "DISTINCT has no window-frame form; the fan-out is <= 7 rows per "
    "user-day, linear in activity.",
)
def events_rolling_7d_active(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    ud = e.select(
        "user_id", F.date_trunc("day", F.col("ts")).alias("day")
    ).distinct()
    spine = ud.select("day").distinct().select(F.col("day").alias("sday"))
    j = spine.join(
        ud,
        (F.col("day") <= F.col("sday"))
        & (F.col("day") >= F.col("sday") - F.expr("INTERVAL 6 DAYS")),
    )
    return (
        j.groupBy("sday")
        .agg(F.count_distinct("user_id").cast("bigint").alias("active_7d"))
        .select(
            F.date_format("sday", "yyyy-MM-dd").alias("day"), "active_7d"
        )
    )


# ---------------------------------------------------------------------------
# Deterministic hash sample: the reproducible distributed sampler — rank
# every doc by md5(doc_id) and keep the first K. Unlike rand()-based
# sampling this is stable across runs, partitionings, engines, and
# cluster sizes (the property a 100 TB eval-split draw actually needs),
# and unlike LIMIT it is unbiased w.r.t. storage order. TakeOrdered
# top-K: no full sort, no shuffle of the corpus.
# ---------------------------------------------------------------------------
_SAMPLE_K = 100


@register(
    "sample_deterministic_hash",
    sql=f"""
    SELECT doc_id, lang, source
    FROM (
      SELECT doc_id, lang, source,
             row_number() OVER (
               ORDER BY CAST('0x' || SUBSTR(MD5(CAST(doc_id AS VARCHAR)), 1, 15)
                             AS BIGINT), doc_id) AS rk
      FROM documents)
    WHERE rk <= {_SAMPLE_K}
    """,
    doc="Reproducible uniform-ish sample: top-100 documents by "
    "md5(doc_id) hash order — stable across runs, partitionings, and "
    "engines (what an eval-split draw needs; rand() is none of these). "
    "Plans as TakeOrderedAndProject: no full sort, no corpus shuffle.",
)
def sample_deterministic_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dsacord_spark.functions.hashing import md5_long

    d = table(spark, sf_dir, "documents")
    ranked = d.select(
        "doc_id", "lang", "source",
        md5_long(F.col("doc_id").cast("string")).alias("hk"),
    )
    # orderBy+limit plans as TakeOrderedAndProject (per-partition top-K,
    # K-row merge) — the rank itself isn't in the output, so no
    # row_number window (which would funnel the corpus through one
    # partition) is needed at all.
    return (
        ranked.orderBy(F.col("hk").asc(), F.col("doc_id").asc())
        .limit(_SAMPLE_K)
        .select("doc_id", "lang", "source")
    )


# ---------------------------------------------------------------------------
# Hierarchy rollup with share-of-parent: customer count and exact-decimal
# account balance per nation, each with its share of the parent region
# and of the grand total — the two-level dimensional report (region ->
# nation) the star schema exists for. Dims broadcast; one customer
# aggregate; shares are single divisions of exact decimals.
# ---------------------------------------------------------------------------


@register(
    "region_nation_share",
    sql="""
    WITH n AS (
      SELECT r.r_name AS region, na.n_name AS nation,
             count(*) AS n_customers,
             SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS bal
      FROM customer c
      JOIN nation na ON c.c_nationkey = na.n_nationkey
      JOIN region r ON na.n_regionkey = r.r_regionkey
      GROUP BY 1, 2),
    reg AS (SELECT region, SUM(bal) AS rbal FROM n GROUP BY region),
    tot AS (SELECT SUM(bal) AS tbal FROM n)
    SELECT n.region, n.nation, n_customers,
           CAST(bal AS DOUBLE) AS balance,
           round(CAST(bal AS DOUBLE) / CAST(rbal AS DOUBLE), 6)
             AS share_of_region,
           round(CAST(bal AS DOUBLE) / CAST(tbal AS DOUBLE), 6)
             AS share_of_total
    FROM n JOIN reg USING (region), tot
    """,
    doc="Two-level dimensional rollup (region -> nation): customer count, "
    "exact decimal balance, share-of-parent-region and share-of-total. "
    "Dims broadcast; shares are single exact-decimal divisions.",
)
def region_nation_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer").select("c_nationkey", "c_acctbal")
    na = table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    r = table(spark, sf_dir, "region").select("r_regionkey", "r_name")
    n = (
        c.join(F.broadcast(na), c["c_nationkey"] == na["n_nationkey"])
        .join(F.broadcast(r), na["n_regionkey"] == r["r_regionkey"])
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(F.col("c_acctbal").cast("decimal(18,2)")).alias("bal"),
        )
    )
    reg = n.groupBy("region").agg(F.sum("bal").alias("rbal"))
    tot = n.agg(F.sum("bal").alias("tbal"))
    return (
        n.join(F.broadcast(reg), "region")
        .crossJoin(F.broadcast(tot))
        .select(
            "region",
            "nation",
            "n_customers",
            F.col("bal").cast("double").alias("balance"),
            F.round(
                F.col("bal").cast("double") / F.col("rbal").cast("double"), 6
            ).alias("share_of_region"),
            F.round(
                F.col("bal").cast("double") / F.col("tbal").cast("double"), 6
            ).alias("share_of_total"),
        )
    )


# ---------------------------------------------------------------------------
# Contingency lift matrix: observed order count per (month, priority)
# cell vs the independence expectation, reported as the exact lift
# o * N / (row_total * col_total) — the per-cell form of a chi-square
# independence scan (a single chi-square statistic would sum floats
# across cells; the per-cell lift stays a single division of exact
# integers and is the actionable output anyway).
# ---------------------------------------------------------------------------


@register(
    "orders_month_priority_lift",
    sql="""
    WITH o AS (
      SELECT strftime(CAST(o_orderdate AS TIMESTAMP), '%m') AS month,
             o_orderpriority AS priority
      FROM orders),
    cell AS (SELECT month, priority, count(*) AS obs FROM o GROUP BY 1, 2),
    rt AS (SELECT month, count(*) AS row_tot FROM o GROUP BY month),
    ct AS (SELECT priority, count(*) AS col_tot FROM o GROUP BY priority),
    n AS (SELECT count(*) AS nn FROM o)
    SELECT cell.month, cell.priority, obs,
           round(CAST(row_tot AS DOUBLE) * col_tot / nn, 6) AS expected,
           round(CAST(obs AS DOUBLE) * nn / (CAST(row_tot AS DECIMAL(38,0)) * col_tot), 6)
             AS lift
    FROM cell JOIN rt USING (month) JOIN ct USING (priority), n
    """,
    doc="Month x priority contingency scan: observed counts, independence "
    "expectation, and exact per-cell lift obs*N/(row_tot*col_tot) — the "
    "actionable per-cell form of a chi-square independence check "
    "(integer operands, single divisions).",
)
def orders_month_priority_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").select(
        F.date_format(F.col("o_orderdate").cast("timestamp"), "MM").alias(
            "month"
        ),
        F.col("o_orderpriority").alias("priority"),
    )
    cell = o.groupBy("month", "priority").agg(F.count(F.lit(1)).alias("obs"))
    rt = o.groupBy("month").agg(F.count(F.lit(1)).alias("row_tot"))
    ct = o.groupBy("priority").agg(F.count(F.lit(1)).alias("col_tot"))
    n = o.agg(F.count(F.lit(1)).alias("nn"))
    return (
        cell.join(F.broadcast(rt), "month")
        .join(F.broadcast(ct), "priority")
        .crossJoin(F.broadcast(n))
        .select(
            "month",
            "priority",
            "obs",
            F.round(
                F.col("row_tot").cast("double") * F.col("col_tot") / F.col("nn"),
                6,
            ).alias("expected"),
            F.round(
                F.col("obs").cast("double")
                * F.col("nn")
                / (F.col("row_tot").cast("decimal(38,0)") * F.col("col_tot")).cast(
                    "double"
                ),
                6,
            ).alias("lift"),
        )
    )


# ---------------------------------------------------------------------------
# Pearson correlation in EXACT algebra: r between part size and retail
# price per part type. Built-in corr() sums doubles in partition order
# (nondeterministic under AQE); here every moment sum is DECIMAL-exact
# (size is int, price is .1-grained -> DECIMAL(18,2)), the covariance
# and variance terms are exact decimal algebra, and only the final
# sqrt/division touch floating point — on identical operands, so the
# result is cross-engine identical.
# ---------------------------------------------------------------------------


@register(
    "part_size_price_corr",
    sql="""
    WITH m AS (
      SELECT p_type,
             count(*) AS n,
             SUM(CAST(p_size AS DECIMAL(38,2))) AS sx,
             SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS sy,
             SUM(CAST(p_size AS DECIMAL(38,2)) * p_size) AS sxx,
             SUM(CAST(p_retailprice AS DECIMAL(18,2))
                 * CAST(p_retailprice AS DECIMAL(18,2))) AS syy,
             SUM(CAST(p_size AS DECIMAL(38,2))
                 * CAST(p_retailprice AS DECIMAL(18,2))) AS sxy
      FROM part GROUP BY p_type)
    SELECT p_type, CAST(n AS BIGINT) AS n_parts,
           round(CAST(n * sxy - sx * sy AS DOUBLE)
                 / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                    * sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 6) AS corr_size_price
    FROM m
    WHERE n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
    """,
    doc="Pearson correlation of part size vs retail price per type with "
    "all moment sums in exact DECIMAL algebra (built-in corr() folds "
    "doubles in partition order and is not deterministic); sqrt/divide "
    "run once on identical operands.",
)
def part_size_price_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part")
    sx_ = F.col("p_size").cast("decimal(38,2)")
    sy_ = F.col("p_retailprice").cast("decimal(18,2)")
    m = p.groupBy("p_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(sx_).alias("sx"),
        F.sum(sy_).alias("sy"),
        F.sum(sx_ * F.col("p_size")).alias("sxx"),
        F.sum(sy_ * sy_).alias("syy"),
        F.sum(sx_ * sy_).alias("sxy"),
    )
    varx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vary = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    cov = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    return (
        m.filter((varx > 0) & (vary > 0))
        .select(
            "p_type",
            F.col("n").cast("bigint").alias("n_parts"),
            F.round(
                cov.cast("double")
                / (F.sqrt(varx.cast("double")) * F.sqrt(vary.cast("double"))),
                6,
            ).alias("corr_size_price"),
        )
    )


# ---------------------------------------------------------------------------
# Event-type co-occurrence lift: which pairs of event types are used by
# the same users MORE than independence predicts —
#   lift(a,b) = n_both * n_users / (n_a * n_b)
# over per-user distinct type sets (exact integers, one division). The
# feature-affinity scan behind "users who do X also do Y"; the pair
# space is |types|^2 (tiny), the per-user distinct is the only big step.
# ---------------------------------------------------------------------------


@register(
    "events_type_cooccurrence_lift",
    sql="""
    WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
    n AS (SELECT count(DISTINCT user_id) AS n_users FROM events),
    t AS (SELECT event_type, count(*) AS n_t FROM ut GROUP BY event_type),
    p AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             count(*) AS n_both
      FROM ut a JOIN ut b
        ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY 1, 2)
    SELECT type_a, type_b, n_both,
           round(CAST(n_both AS DOUBLE) * n_users
                 / (CAST(ta.n_t AS DECIMAL(38,0)) * tb.n_t), 6) AS lift
    FROM p
    JOIN t ta ON ta.event_type = type_a
    JOIN t tb ON tb.event_type = type_b, n
    """,
    doc="Per-user event-type co-occurrence lift n_both*N/(n_a*n_b) over "
    "distinct user-type sets — the 'users who do X also do Y' affinity "
    "scan. Exact integers; pair space is |types|^2.",
)
def events_type_cooccurrence_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    ut = e.select("user_id", "event_type").distinct()
    n = e.agg(F.count_distinct("user_id").alias("n_users"))
    t = ut.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_t"))
    a = ut.select("user_id", F.col("event_type").alias("type_a"))
    b = ut.select("user_id", F.col("event_type").alias("type_b"))
    p = (
        a.join(b, "user_id")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    ta = t.select(F.col("event_type").alias("type_a"), F.col("n_t").alias("na"))
    tb = t.select(F.col("event_type").alias("type_b"), F.col("n_t").alias("nb"))
    return (
        p.join(F.broadcast(ta), "type_a")
        .join(F.broadcast(tb), "type_b")
        .crossJoin(F.broadcast(n))
        .select(
            "type_a",
            "type_b",
            "n_both",
            F.round(
                F.col("n_both").cast("double")
                * F.col("n_users")
                / (F.col("na").cast("decimal(38,0)") * F.col("nb")).cast(
                    "double"
                ),
                6,
            ).alias("lift"),
        )
    )


# ---------------------------------------------------------------------------
# Per-user peak hour via the max_by/arg_max functor (SURVEY §2.5 agg
# surface): the hour-of-day each user is most active in. Ties are the
# known hazard of arg_max on BOTH engines (unspecified winner), so the
# ordering key is the composite cnt*100+hod — unique per (user, hod)
# since hod < 24 — making the argmax single-valued and cross-engine
# deterministic without a window.
# ---------------------------------------------------------------------------


@register(
    "events_user_peak_hour",
    sql="""
    WITH uh AS (
      SELECT user_id,
             CAST(strftime(CAST(ts AS TIMESTAMP), '%H') AS INT) AS hod,
             count(*) AS cnt
      FROM events GROUP BY 1, 2)
    SELECT user_id,
           arg_max(hod, cnt * 100 + hod) AS peak_hour,
           CAST(max(cnt) AS BIGINT) AS peak_events
    FROM uh GROUP BY user_id
    """,
    doc="Per-user most-active hour via arg_max/max_by with a composite "
    "unique ordering key (cnt*100+hod) — arg_max ties are unspecified "
    "on both engines, the composite makes the winner deterministic "
    "without a window shuffle.",
)
def events_user_peak_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    uh = e.groupBy("user_id", F.hour("ts").alias("hod")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    return uh.groupBy("user_id").agg(
        F.max_by("hod", F.col("cnt") * 100 + F.col("hod")).alias("peak_hour"),
        F.max("cnt").cast("bigint").alias("peak_events"),
    )


# ---------------------------------------------------------------------------
# A/B effect size (Cohen's d) between purchase- and click-event values:
# the experiment-analysis primitive. All moment sums are exact DECIMAL
# (values are .01-grained doubles -> DECIMAL(18,2) is lossless), the
# pooled variance is exact decimal algebra, and only the final
# sqrt/division touch floating point on identical operands — the same
# determinism recipe as part_size_price_corr (built-in stddev is
# fold-order nondeterministic).
# ---------------------------------------------------------------------------


@register(
    "events_ab_effect_size",
    sql="""
    WITH m AS (
      SELECT event_type,
             count(*) AS n,
             SUM(CAST(value AS DECIMAL(18,2))) AS s1,
             SUM(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2)))
               AS s2
      FROM events WHERE event_type IN ('purchase', 'click')
      GROUP BY event_type),
    w AS (
      SELECT
        max(CASE WHEN event_type = 'purchase' THEN n END) AS n1,
        max(CASE WHEN event_type = 'purchase' THEN s1 END) AS sa1,
        max(CASE WHEN event_type = 'purchase' THEN s2 END) AS sa2,
        max(CASE WHEN event_type = 'click' THEN n END) AS n2,
        max(CASE WHEN event_type = 'click' THEN s1 END) AS sb1,
        max(CASE WHEN event_type = 'click' THEN s2 END) AS sb2
      FROM m)
    SELECT CAST(n1 AS BIGINT) AS n_purchase, CAST(n2 AS BIGINT) AS n_click,
           round(CAST(sa1 AS DOUBLE) / n1, 6) AS mean_purchase,
           round(CAST(sb1 AS DOUBLE) / n2, 6) AS mean_click,
           round((CAST(sa1 AS DOUBLE) / n1 - CAST(sb1 AS DOUBLE) / n2)
                 / sqrt(CAST(n2 * (n1 * sa2 - sa1 * sa1)
                             + n1 * (n2 * sb2 - sb1 * sb1) AS DOUBLE)
                        / (CAST(n1 AS DOUBLE) * n2 * (n1 + n2 - 2))),
                 6) AS cohens_d
    FROM w
    """,
    doc="Cohen's d effect size between purchase and click event values: "
    "exact decimal moment sums, exact pooled sum-of-squares, one "
    "sqrt/division at the boundary — the A/B-experiment primitive with "
    "none of stddev()'s fold-order nondeterminism.",
)
def events_ab_effect_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "click")
    )
    dec = F.col("value").cast("decimal(18,2)")
    m = e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec).alias("s1"),
        F.sum(dec * dec).alias("s2"),
    )
    pick = lambda t, c: F.max(
        F.when(F.col("event_type") == t, F.col(c))
    )
    w = m.agg(
        pick("purchase", "n").alias("n1"),
        pick("purchase", "s1").alias("sa1"),
        pick("purchase", "s2").alias("sa2"),
        pick("click", "n").alias("n2"),
        pick("click", "s1").alias("sb1"),
        pick("click", "s2").alias("sb2"),
    )
    m1 = F.col("sa1").cast("double") / F.col("n1")
    m2 = F.col("sb1").cast("double") / F.col("n2")
    # Pooled SSQ cross-multiplied into pure DECIMAL algebra (no decimal
    # division mid-pipeline — Spark rounds decimal quotients HALF_UP at an
    # engine-defined scale while DuckDB does not, so sa2 - sa1^2/n1 is NOT
    # cross-engine exact; n2*(n1*sa2 - sa1^2) + n1*(n2*sb2 - sb1^2) is).
    # The (n1*n2*(n1+n2-2)) denominator folds in double on identical
    # operands left-to-right on both engines.
    ssq_num = (
        F.col("n2")
        * (F.col("n1") * F.col("sa2") - F.col("sa1") * F.col("sa1"))
        + F.col("n1")
        * (F.col("n2") * F.col("sb2") - F.col("sb1") * F.col("sb1"))
    ).cast("double")
    ssq_den = (
        F.col("n1").cast("double")
        * F.col("n2")
        * (F.col("n1") + F.col("n2") - 2)
    )
    return w.select(
        F.col("n1").cast("bigint").alias("n_purchase"),
        F.col("n2").cast("bigint").alias("n_click"),
        F.round(m1, 6).alias("mean_purchase"),
        F.round(m2, 6).alias("mean_click"),
        F.round((m1 - m2) / F.sqrt(ssq_num / ssq_den), 6).alias("cohens_d"),
    )


# ---------------------------------------------------------------------------
# Gini coefficient of customer revenue: the inequality summary behind
# the whale curve (orders_ltv_deciles shows the bands; Gini is the
# scalar). Sort-based exact formula over per-customer decimal revenue:
#   G = (2 * sum(rank_i * x_i)) / (n * sum(x)) - (n + 1) / n
# with x ranked ascending (custkey tie-break). The rank-weighted sum is
# exact decimal * int; the two final divisions are single double ops.
# Ranks come from _global_rank's two-pass prefix sum, so the
# per-customer aggregate is never funneled through a single partition.
# ---------------------------------------------------------------------------


@register(
    "orders_revenue_gini",
    sql="""
    WITH rev AS (
      SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS x
      FROM orders GROUP BY o_custkey),
    rk AS (
      SELECT x, row_number() OVER (ORDER BY x ASC, o_custkey ASC) AS i
      FROM rev),
    s AS (
      SELECT count(*) AS n,
             SUM(CAST(i AS DECIMAL(38,0)) * x) AS wsum,
             SUM(x) AS tot
      FROM rk)
    SELECT CAST(n AS BIGINT) AS n_customers,
           CAST(tot AS DOUBLE) AS total_revenue,
           round(2.0 * CAST(wsum AS DOUBLE) / (n * CAST(tot AS DOUBLE))
                 - CAST(n + 1 AS DOUBLE) / n, 6) AS gini
    FROM s
    """,
    doc="Gini coefficient of per-customer revenue (sort-based exact "
    "formula; rank-weighted sum is exact decimal x int, custkey "
    "tie-break pins equal-revenue ranks). One scalar inequality summary "
    "next to the decile whale curve.",
)
def orders_revenue_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    rev = o.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("x")
    )
    # rank-weighted sum via the distributed _global_rank (two-pass prefix
    # sum) — the per-customer frame never funnels through one partition.
    rk = _global_rank(
        rev, [F.col("x").asc(), F.col("o_custkey").asc()], "i"
    ).select("x", "i")
    s = rk.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("i").cast("decimal(38,0)") * F.col("x")).alias("wsum"),
        F.sum("x").alias("tot"),
    )
    return s.select(
        F.col("n").cast("bigint").alias("n_customers"),
        F.col("tot").cast("double").alias("total_revenue"),
        F.round(
            F.lit(2.0) * F.col("wsum").cast("double")
            / (F.col("n") * F.col("tot").cast("double"))
            - (F.col("n") + 1).cast("double") / F.col("n"),
            6,
        ).alias("gini"),
    )


# ---------------------------------------------------------------------------
# IQR outlier report per market segment: Tukey fences over exact
# interpolated quartiles of customer balances (1.5*IQR — the boxplot
# rule), with counts outside each fence. The quartile-selection twin of
# the MAD report (events_anomaly_mad): selection percentiles are
# order-deterministic where moment-based z-scores are not.
# ---------------------------------------------------------------------------


@register(
    "customer_balance_iqr_outliers",
    sql="""
    WITH q AS (
      SELECT c_mktsegment,
             count(*) AS n,
             quantile_cont(c_acctbal, 0.25) AS q1,
             quantile_cont(c_acctbal, 0.75) AS q3
      FROM customer GROUP BY c_mktsegment),
    o AS (
      SELECT c.c_mktsegment,
             SUM(CASE WHEN c.c_acctbal < q.q1 - 1.5 * (q.q3 - q.q1)
                      THEN 1 ELSE 0 END) AS n_low,
             SUM(CASE WHEN c.c_acctbal > q.q3 + 1.5 * (q.q3 - q.q1)
                      THEN 1 ELSE 0 END) AS n_high
      FROM customer c JOIN q USING (c_mktsegment)
      GROUP BY c.c_mktsegment)
    SELECT q.c_mktsegment, CAST(n AS BIGINT) AS n_customers,
           round(q1, 6) AS q1, round(q3, 6) AS q3,
           CAST(n_low AS BIGINT) AS n_low_outliers,
           CAST(n_high AS BIGINT) AS n_high_outliers
    FROM q JOIN o USING (c_mktsegment)
    """,
    doc="Tukey-fence (1.5*IQR) outlier counts per market segment over "
    "exact interpolated quartiles of customer balances — the boxplot "
    "rule; selection percentiles keep it order-deterministic.",
)
def customer_balance_iqr_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer").select("c_mktsegment", "c_acctbal")
    q = c.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"),
        F.percentile("c_acctbal", F.lit(0.25)).alias("q1"),
        F.percentile("c_acctbal", F.lit(0.75)).alias("q3"),
    )
    j = c.join(F.broadcast(q), "c_mktsegment")
    iqr = F.col("q3") - F.col("q1")
    o = j.groupBy("c_mktsegment").agg(
        F.sum(
            F.when(F.col("c_acctbal") < F.col("q1") - 1.5 * iqr, 1).otherwise(0)
        ).alias("n_low"),
        F.sum(
            F.when(F.col("c_acctbal") > F.col("q3") + 1.5 * iqr, 1).otherwise(0)
        ).alias("n_high"),
    )
    return q.join(o, "c_mktsegment").select(
        "c_mktsegment",
        F.col("n").cast("bigint").alias("n_customers"),
        F.round("q1", 6).alias("q1"),
        F.round("q3", 6).alias("q3"),
        F.col("n_low").cast("bigint").alias("n_low_outliers"),
        F.col("n_high").cast("bigint").alias("n_high_outliers"),
    )


# ---------------------------------------------------------------------------
# Jaccard threshold-band histogram: the full exact pair computation run
# ONCE at a low floor (0.3), bucketed into similarity bands — the curve
# that picks the dedup THRESHOLD the way text_ngram_dup_sweep picks the
# shingle size (how many pairs does each candidate threshold admit?).
# Reuses the persisted shingle index and the naive inverted-index join.
# ---------------------------------------------------------------------------


@register(
    "dedup_jaccard_band_histogram",
    sql="""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(text), '\\s+'),
                         x -> x <> '') AS t
      FROM documents),
    ngr_s AS (
      SELECT DISTINCT doc_id AS doc, array_to_string(t[i:i+2], ' ') AS ng
      FROM toks, unnest(generate_series(1, greatest(len(t)-2, 1))) AS u(i)),
    ngr AS (SELECT doc, CAST('0x' || SUBSTR(MD5(ng), 1, 15) AS BIGINT) AS hg
            FROM ngr_s),
    sizes AS (SELECT doc, count(*) AS sz FROM ngr GROUP BY doc),
    inter AS (
      SELECT a.doc AS doc_a, b.doc AS doc_b, count(*) AS i
      FROM ngr a JOIN ngr b ON a.hg = b.hg AND a.doc < b.doc
      GROUP BY 1, 2),
    j AS (
      SELECT CAST(i AS DOUBLE) / (sa.sz + sb.sz - i) AS jac
      FROM inter
      JOIN sizes sa ON sa.doc = doc_a
      JOIN sizes sb ON sb.doc = doc_b
      WHERE CAST(i AS DOUBLE) / (sa.sz + sb.sz - i) >= 0.3),
    banded AS (
      SELECT CASE WHEN jac >= 0.9 THEN '0.90+'
                  WHEN jac >= 0.7 THEN '0.70-0.90'
                  WHEN jac >= 0.5 THEN '0.50-0.70'
                  ELSE '0.30-0.50' END AS band
      FROM j)
    SELECT band, CAST(count(*) AS BIGINT) AS n_pairs
    FROM banded GROUP BY band
    """,
    doc="Exact-Jaccard similarity-band histogram over all pairs >= 0.3 — "
    "the threshold-selection curve for the dedup family (how many pairs "
    "each candidate threshold admits). One inverted-index join on the "
    "shared persisted shingle index.",
)
def dedup_jaccard_band_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dsacord_spark.operators.dedup import _ngram_jaccard_naive, _shingle_index

    d = table(spark, sf_dir, "documents")
    ngr = _shingle_index(d, "doc_id", "text", 3)
    pairs = _ngram_jaccard_naive(ngr, 0.3)
    banded = pairs.select(
        F.when(F.col("jaccard") >= 0.9, F.lit("0.90+"))
        .when(F.col("jaccard") >= 0.7, F.lit("0.70-0.90"))
        .when(F.col("jaccard") >= 0.5, F.lit("0.50-0.70"))
        .otherwise(F.lit("0.30-0.50"))
        .alias("band")
    )
    return banded.groupBy("band").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs")
    )


# ---------------------------------------------------------------------------
# Label separability scalar: mean intra-label cosine (each label's
# vectors to their own centroid) vs mean inter-label centroid cosine —
# the one-number summary over the embed_label_centroids matrix. Both
# means fold SORT-PINNED tiny arrays (per-label rows / label pairs)
# sequentially, so no order-sensitive float aggregation ever happens.
# ---------------------------------------------------------------------------


@register(
    "embed_separability_index",
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
      FROM g),
    intra AS (
      SELECT e.label,
             list_dot_product(CAST(e.embedding AS DOUBLE[]), c.cent) /
               (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                      CAST(e.embedding AS DOUBLE[]))) *
                sqrt(list_dot_product(c.cent, c.cent))) AS cos_own,
             e.vec_id
      FROM embeddings e JOIN c USING (label)
      WHERE list_dot_product(CAST(e.embedding AS DOUBLE[]),
                             CAST(e.embedding AS DOUBLE[])) > 0
        AND list_dot_product(c.cent, c.cent) > 0),
    intra_m AS (
      SELECT CASE WHEN count(*) = 0 THEN NULL
                  ELSE list_reduce(list(cos_own ORDER BY label, vec_id),
                                   (a, b) -> a + b) / count(*)
             END AS mean_intra,
             count(*) AS n_vecs
      FROM intra),
    pairs AS (
      SELECT a.label AS la, b.label AS lb,
             list_dot_product(a.cent, b.cent) /
               (sqrt(list_dot_product(a.cent, a.cent)) *
                sqrt(list_dot_product(b.cent, b.cent))) AS cos_cc
      FROM c a JOIN c b ON a.label < b.label
      WHERE list_dot_product(a.cent, a.cent) > 0
        AND list_dot_product(b.cent, b.cent) > 0),
    inter_m AS (
      SELECT CASE WHEN count(*) = 0 THEN NULL
                  ELSE list_reduce(list(cos_cc ORDER BY la, lb),
                                   (a, b) -> a + b) / count(*)
             END AS mean_inter,
             count(*) AS n_pairs
      FROM pairs)
    SELECT CAST(n_vecs AS BIGINT) AS n_vecs,
           CAST(n_pairs AS BIGINT) AS n_label_pairs,
           round(mean_intra, 6) AS mean_intra_cosine,
           round(mean_inter, 6) AS mean_inter_cosine,
           round(mean_intra - mean_inter, 6) AS separability_gap
    FROM intra_m, inter_m
    """,
    doc="One-number label separability: mean cosine of vectors to their "
    "OWN label centroid minus mean inter-label centroid cosine. Every "
    "mean folds a sort-pinned array sequentially (no order-sensitive "
    "float aggregation); zero-norm guards on both engines.",
)
def embed_separability_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dsacord_spark.functions.vectors import dot, to_double_array
    from dsacord_spark.plans.quality import _label_centroids

    e = table(spark, sf_dir, "embeddings")
    cents = _label_centroids(e).select("label", "cent")
    v = e.select("label", "vec_id", to_double_array("embedding").alias("ve"))
    intra = (
        v.join(F.broadcast(cents), "label")
        .filter((dot("ve", "ve") > 0) & (dot("cent", "cent") > 0))
        .select(
            "label",
            "vec_id",
            (
                dot("ve", "cent")
                / (F.sqrt(dot("ve", "ve")) * F.sqrt(dot("cent", "cent")))
            ).alias("cos_own"),
        )
    )
    # count()==0 guard: DuckDB's list_reduce raises on an empty list while
    # Spark's F.aggregate folds to the 0.0 init and then divides by zero
    # (NaN) — both sides emit the same NULL on degenerate input instead.
    intra_m = intra.agg(
        F.when(F.count(F.lit(1)) == 0, F.lit(None).cast("double"))
        .otherwise(
            F.aggregate(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("label", "vec_id", "cos_own"))
                    ),
                    lambda s: s["cos_own"],
                ),
                F.lit(0.0),
                lambda a, x: a + x,
            )
            / F.count(F.lit(1))
        ).alias("mean_intra"),
        F.count(F.lit(1)).alias("n_vecs"),
    )
    a = cents.select(F.col("label").alias("la"), F.col("cent").alias("ca"))
    b = cents.select(F.col("label").alias("lb"), F.col("cent").alias("cb"))
    pairs = (
        a.join(F.broadcast(b), F.col("la") < F.col("lb"))
        .filter((dot("ca", "ca") > 0) & (dot("cb", "cb") > 0))
        .select(
            "la",
            "lb",
            (
                dot("ca", "cb")
                / (F.sqrt(dot("ca", "ca")) * F.sqrt(dot("cb", "cb")))
            ).alias("cos_cc"),
        )
    )
    inter_m = pairs.agg(
        F.when(F.count(F.lit(1)) == 0, F.lit(None).cast("double"))
        .otherwise(
            F.aggregate(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("la", "lb", "cos_cc"))),
                    lambda s: s["cos_cc"],
                ),
                F.lit(0.0),
                lambda a_, x: a_ + x,
            )
            / F.count(F.lit(1))
        ).alias("mean_inter"),
        F.count(F.lit(1)).alias("n_pairs"),
    )
    return (
        intra_m.crossJoin(F.broadcast(inter_m))
        .select(
            F.col("n_vecs").cast("bigint").alias("n_vecs"),
            F.col("n_pairs").cast("bigint").alias("n_label_pairs"),
            F.round("mean_intra", 6).alias("mean_intra_cosine"),
            F.round("mean_inter", 6).alias("mean_inter_cosine"),
            F.round(F.col("mean_intra") - F.col("mean_inter"), 6).alias(
                "separability_gap"
            ),
        )
    )


# ---------------------------------------------------------------------------
# New vs returning users per day: first-touch attribution — each user's
# first active day marks them "new" that day, "returning" on every later
# active day. Exact counts from the deduplicated (user, day) table plus
# a broadcast first-day join; the daily growth-accounting split every
# product dashboard leads with.
# ---------------------------------------------------------------------------


@register(
    "events_new_vs_returning",
    sql="""
    WITH ud AS (
      SELECT DISTINCT user_id,
             date_trunc('day', CAST(ts AS TIMESTAMP)) AS day
      FROM events),
    first AS (SELECT user_id, min(day) AS first_day FROM ud GROUP BY user_id)
    SELECT strftime(day, '%Y-%m-%d') AS day,
           CAST(SUM(CASE WHEN day = first_day THEN 1 ELSE 0 END) AS BIGINT)
             AS new_users,
           CAST(SUM(CASE WHEN day > first_day THEN 1 ELSE 0 END) AS BIGINT)
             AS returning_users
    FROM ud JOIN first USING (user_id)
    GROUP BY day
    """,
    doc="Daily new-vs-returning user split (first-touch attribution over "
    "the deduplicated user-day table; exact counts). first_day comes "
    "from a min() window over the user-keyed distinct frame — the frame "
    "is full-user-population cardinality, so it must never be broadcast; "
    "the window reuses the user_id shuffle the distinct already did.",
)
def events_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    ud = e.select(
        "user_id", F.date_trunc("day", F.col("ts")).alias("day")
    ).distinct()
    first_day = F.min("day").over(W.partitionBy("user_id"))
    return (
        ud.withColumn("first_day", first_day)
        .groupBy("day")
        .agg(
            F.sum(F.when(F.col("day") == F.col("first_day"), 1).otherwise(0))
            .cast("bigint")
            .alias("new_users"),
            F.sum(F.when(F.col("day") > F.col("first_day"), 1).otherwise(0))
            .cast("bigint")
            .alias("returning_users"),
        )
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "new_users",
            "returning_users",
        )
    )


# ---------------------------------------------------------------------------
# Token-length profile per language: mean token length (exact integer
# sums, one division) and the share of 15+-char tokens — the long-token
# garbage signal (URLs, base64 blobs, concatenation bugs) that length
# filters key on.
# ---------------------------------------------------------------------------


@register(
    "text_token_length_profile",
    sql="""
    WITH tok AS (
      SELECT lang, tk
      FROM (SELECT lang,
                   list_filter(string_split_regex(trim(text), '\\s+'),
                               x -> x <> '') AS t
            FROM documents), unnest(t) AS u(tk))
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_tokens,
           round(CAST(SUM(CAST(length(tk) AS BIGINT)) AS DOUBLE) / count(*), 6)
             AS mean_token_len,
           CAST(SUM(CASE WHEN length(tk) >= 15 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_long_tokens,
           round(CAST(SUM(CASE WHEN length(tk) >= 15 THEN 1 ELSE 0 END) AS DOUBLE)
                 / count(*), 6) AS long_token_share
    FROM tok GROUP BY lang
    """,
    doc="Token-length profile per language: exact mean length and the "
    "15+-char long-token share (URL/base64/concatenation-garbage "
    "signal).",
)
def text_token_length_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    tok = d.select("lang", F.explode(tokens("text")).alias("tk"))
    return tok.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
        F.round(
            F.sum(F.length("tk").cast("bigint")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("mean_token_len"),
        F.sum(F.when(F.length("tk") >= 15, 1).otherwise(0))
        .cast("bigint")
        .alias("n_long_tokens"),
        F.round(
            F.sum(F.when(F.length("tk") >= 15, 1).otherwise(0)).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("long_token_share"),
    )


# ---------------------------------------------------------------------------
# Error-burst alarm: hours whose error-event rate exceeds 3x the global
# error rate (with a minimum volume floor so tiny hours don't alarm) —
# the static form of the rate-alarm every on-call dashboard runs. Exact
# counts; the comparison is cross-multiplied into integer arithmetic
# (err * global_total > 3 * global_err * total) so no float threshold
# is ever computed.
# ---------------------------------------------------------------------------


@register(
    "events_error_burst_hours",
    sql="""
    WITH h AS (
      SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hr,
             count(*) AS total,
             SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS err
      FROM events GROUP BY 1),
    g AS (SELECT SUM(total) AS gtotal, SUM(err) AS gerr FROM h)
    SELECT strftime(hr, '%Y-%m-%d %H:%M:%S') AS hr_str,
           CAST(total AS BIGINT) AS n_events,
           CAST(err AS BIGINT) AS n_errors,
           round(CAST(err AS DOUBLE) / total, 6) AS error_rate,
           round(CAST(gerr AS DOUBLE) / gtotal, 6) AS global_rate
    FROM h, g
    WHERE total >= 20
      AND err * gtotal > 3 * gerr * total
    """,
    doc="Error-burst alarm: hours (>= 20 events) whose error rate tops "
    "3x the global rate — threshold evaluated by integer "
    "cross-multiplication, no float comparison.",
)
def events_error_burst_hours(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    h = e.groupBy(F.date_trunc("hour", F.col("ts")).alias("hr")).agg(
        F.count(F.lit(1)).alias("total"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0)).alias(
            "err"
        ),
    )
    g = h.agg(F.sum("total").alias("gtotal"), F.sum("err").alias("gerr"))
    return (
        h.crossJoin(F.broadcast(g))
        .filter(
            (F.col("total") >= 20)
            & (F.col("err") * F.col("gtotal") > 3 * F.col("gerr") * F.col("total"))
        )
        .select(
            F.date_format("hr", "yyyy-MM-dd HH:mm:ss").alias("hr_str"),
            F.col("total").cast("bigint").alias("n_events"),
            F.col("err").cast("bigint").alias("n_errors"),
            F.round(F.col("err").cast("double") / F.col("total"), 6).alias(
                "error_rate"
            ),
            F.round(F.col("gerr").cast("double") / F.col("gtotal"), 6).alias(
                "global_rate"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Cohort revenue triangle: customers grouped by first-order month, exact
# decimal revenue per (cohort, months-since-first) cell — the
# cohort-LTV triangle (the events retention cohort's revenue twin on the
# orders table). Month arithmetic via integer year*12+month algebra so
# the offset is exact on both engines.
# ---------------------------------------------------------------------------


@register(
    "orders_cohort_revenue",
    sql="""
    WITH o AS (
      SELECT o_custkey,
             CAST(strftime(CAST(o_orderdate AS TIMESTAMP), '%Y') AS INT) * 12
               + CAST(strftime(CAST(o_orderdate AS TIMESTAMP), '%m') AS INT)
               AS m,
             CAST(o_totalprice AS DECIMAL(18,2)) AS price
      FROM orders),
    c AS (SELECT o_custkey, min(m) AS cohort_m FROM o GROUP BY o_custkey)
    SELECT printf('%04d-%02d', (cohort_m - 1) // 12, ((cohort_m - 1) % 12) + 1)
             AS cohort_month,
           o.m - c.cohort_m AS months_since,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(SUM(price) AS DOUBLE) AS revenue
    FROM o JOIN c USING (o_custkey)
    GROUP BY cohort_m, o.m - c.cohort_m
    """,
    doc="Cohort-LTV triangle: exact decimal revenue per (first-order-month "
    "cohort, months-since) cell; month offsets via integer year*12+month "
    "algebra. The revenue twin of the events retention cohort.",
)
def orders_cohort_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").select(
        "o_custkey",
        (
            F.year(F.col("o_orderdate").cast("timestamp")) * 12
            + F.month(F.col("o_orderdate").cast("timestamp"))
        ).alias("m"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
    )
    # cohort month via a window over the custkey partition — the
    # per-customer cohort frame is user-population-sized, so a broadcast
    # join on it is an OOM hazard at scale; the window reuses one
    # user-keyed shuffle instead (same shape as events_new_vs_returning)
    j = o.withColumn("cohort_m", F.min("m").over(W.partitionBy("o_custkey")))
    return (
        j.groupBy("cohort_m", (F.col("m") - F.col("cohort_m")).alias("months_since"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum("price").cast("double").alias("revenue"),
        )
        .select(
            F.format_string(
                "%04d-%02d",
                ((F.col("cohort_m") - 1) / 12).cast("int"),
                ((F.col("cohort_m") - 1) % 12).cast("int") + 1,
            ).alias("cohort_month"),
            "months_since",
            "n_orders",
            "revenue",
        )
    )


# ---------------------------------------------------------------------------
# Cross-source duplication: exact-duplicate clusters that SPAN sources —
# the provenance report that distinguishes within-source boilerplate
# (template reuse) from cross-source contamination (mirrored/scraped
# content), which call for different dedup policies. Rides the same
# normalized-text fingerprint as the cluster histogram.
# ---------------------------------------------------------------------------


def _dup_cross_source_sql() -> str:
    # fingerprint fragment interpolated from the shared definition
    # (analysis._FPRINT_SQL == doc_fingerprint()), not re-inlined
    from dsacord_spark.plans.analysis import _FPRINT_SQL

    return f"""
    WITH fp AS (
      SELECT source, {_FPRINT_SQL} AS fp
      FROM documents),
    cl AS (
      SELECT fp, count(*) AS n_docs,
             count(DISTINCT source) AS n_sources
      FROM fp GROUP BY fp
      HAVING count(*) > 1)
    SELECT CASE WHEN n_sources > 1 THEN 'cross_source'
                ELSE 'within_source' END AS dup_kind,
           CAST(count(*) AS BIGINT) AS n_clusters,
           CAST(SUM(n_docs) AS BIGINT) AS n_docs,
           CAST(SUM(n_docs - 1) AS BIGINT) AS n_removable
    FROM cl GROUP BY 1
    """


@register(
    "corpus_dup_cross_source",
    sql=_dup_cross_source_sql(),
    doc="Duplicate provenance: exact-dup clusters split into "
    "within-source (template/boilerplate reuse) vs cross-source "
    "(mirrored/scraped contamination) with docs and removable counts — "
    "the split that picks the dedup policy.",
)
def corpus_dup_cross_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    fp = d.select("source", doc_fingerprint("text").alias("fp"))
    cl = (
        fp.groupBy("fp")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count_distinct("source").alias("n_sources"),
        )
        .filter(F.col("n_docs") > 1)
    )
    return (
        cl.select(
            F.when(F.col("n_sources") > 1, F.lit("cross_source"))
            .otherwise(F.lit("within_source"))
            .alias("dup_kind"),
            "n_docs",
        )
        .groupBy("dup_kind")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_clusters"),
            F.sum("n_docs").cast("bigint").alias("n_docs"),
            F.sum(F.col("n_docs") - 1).cast("bigint").alias("n_removable"),
        )
    )


# ---------------------------------------------------------------------------
# Order-size (basket) distribution: lineitems per order bucketed into
# 1 / 2-3 / 4-7 / 8+ bands with exact mean items per order — the basket
# shape behind fulfillment planning. One narrow per-order count + a
# 4-row rollup.
# ---------------------------------------------------------------------------


@register(
    "orders_basket_size_bands",
    sql="""
    WITH per AS (
      SELECT l_orderkey, count(*) AS n_items
      FROM lineitem GROUP BY l_orderkey),
    t AS (
      SELECT count(*) AS n_orders, SUM(n_items) AS total_items FROM per)
    SELECT CASE WHEN n_items = 1 THEN '1'
                WHEN n_items <= 3 THEN '2-3'
                WHEN n_items <= 7 THEN '4-7'
                ELSE '8+' END AS band,
           CAST(count(*) AS BIGINT) AS n_orders,
           round(CAST(count(*) AS DOUBLE) / max(t.n_orders), 6) AS order_share,
           round(CAST(max(t.total_items) AS DOUBLE) / max(t.n_orders), 6)
             AS mean_items_per_order
    FROM per, t GROUP BY 1
    """,
    doc="Basket-size bands (lineitems per order: 1 / 2-3 / 4-7 / 8+) with "
    "order shares and the exact corpus-wide mean items per order.",
)
def orders_basket_size_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem").select("l_orderkey")
    per = l.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("n_items"))
    t = per.agg(
        F.count(F.lit(1)).alias("n_orders_t"),
        F.sum("n_items").alias("total_items"),
    )
    return (
        per.select(
            F.when(F.col("n_items") == 1, F.lit("1"))
            .when(F.col("n_items") <= 3, F.lit("2-3"))
            .when(F.col("n_items") <= 7, F.lit("4-7"))
            .otherwise(F.lit("8+"))
            .alias("band")
        )
        .groupBy("band")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_orders"))
        .crossJoin(F.broadcast(t))
        .select(
            "band",
            "n_orders",
            F.round(
                F.col("n_orders").cast("double") / F.col("n_orders_t"), 6
            ).alias("order_share"),
            F.round(
                F.col("total_items").cast("double") / F.col("n_orders_t"), 6
            ).alias("mean_items_per_order"),
        )
    )


# ===========================================================================
# Round-5 additions: dedup-savings provenance, embedding-dimension
# redundancy, and the SimHash radius-calibration curve. Registered LAST so
# earlier entries keep their registration order (window-rotation stability).
# ===========================================================================


# ---------------------------------------------------------------------------
# Dedup survivorship: what exact dedup with keep-canonical (min doc_id per
# normalized-text fingerprint cluster) would REMOVE, per source — docs,
# chars, and the removal rate. The report run before committing a dedup
# pass: it quantifies the storage/compute savings and shows which sources
# the pass hits hardest (survivorship bias check). One fingerprint-keyed
# shuffle (window min over fp — no self-join), then a #sources-row rollup.
# ---------------------------------------------------------------------------


def _savings_sql() -> str:
    # the fingerprint fragment is INTERPOLATED from the one definition
    # shared with doc_fingerprint()/dedup_exact (never duplicated as a
    # literal — the copresence-constants lockstep rule)
    from dsacord_spark.plans.analysis import _FPRINT_SQL

    return f"""
    WITH fp AS (
      SELECT doc_id, source, n_chars, {_FPRINT_SQL} AS fp
      FROM documents),
    k AS (
      SELECT source, n_chars,
             CASE WHEN doc_id = MIN(doc_id) OVER (PARTITION BY fp)
                  THEN 1 ELSE 0 END AS kept
      FROM fp)
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(SUM(kept) AS BIGINT) AS n_kept,
           CAST(SUM(1 - kept) AS BIGINT) AS n_removed,
           CAST(SUM(CASE WHEN kept = 0 THEN n_chars ELSE 0 END) AS BIGINT)
             AS chars_removed,
           CAST((2000000 * SUM(1 - kept) + count(*)) // (2 * count(*))
                AS DOUBLE) / 1000000 AS removal_rate
    FROM k GROUP BY source
    """


@register(
    "corpus_dedup_savings_by_source",
    sql=_savings_sql(),
    doc="Dedup survivorship by source: docs/chars that exact "
    "keep-canonical dedup (min doc_id per normalized-text fingerprint) "
    "would remove, with per-source removal rates — the savings/bias "
    "report run before committing a dedup pass. One fp-keyed shuffle "
    "(window min, no self-join) + a #sources-row rollup.",
)
def corpus_dedup_savings_by_source(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    fp = d.select(
        "doc_id", "source", "n_chars", doc_fingerprint("text").alias("fp")
    )
    kept = F.when(
        F.col("doc_id") == F.min("doc_id").over(W.partitionBy("fp")), 1
    ).otherwise(0)
    k = fp.select("source", "n_chars", kept.alias("kept"))
    # removal_rate via the shared integer half-up 6dp formula: plain
    # round() diverges between Spark (HALF_UP) and DuckDB (half-even
    # on doubles) on dyadic ties like 1/128 = 0.0078125
    return (
        k.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("kept").cast("bigint").alias("n_kept"),
            F.sum(1 - F.col("kept")).cast("bigint").alias("n_removed"),
            F.sum(F.when(F.col("kept") == 0, F.col("n_chars")).otherwise(0))
            .cast("bigint")
            .alias("chars_removed"),
        )
        .withColumn(
            "removal_rate",
            F.expr("(2000000 * n_removed + n_docs) div (2 * n_docs)").cast(
                "double"
            )
            / 1e6,
        )
    )


# ---------------------------------------------------------------------------
# Embedding-dimension redundancy: top-20 dimension pairs by |Pearson
# correlation| on the SQ8-style integer grid (q = floor(x * 128)). Highly
# correlated dimensions signal a projection/whitening opportunity before
# ANN indexing. Quantizing first makes every SUM an exact integer
# (float32 -> double is exact, *128 is an exponent shift, floor is
# deterministic; null elements quantize to 0 on both engines), so the
# cross-multiplied correlation algebra
#   corr = (n*Sxy - Sx*Sy) / sqrt(n*Sxx - Sx^2) / sqrt(n*Syy - Sy^2)
# is bit-identical across engines. The cross-products are computed in
# DOUBLE on both sides (identical op sequence): int64 cross-multiplies
# like n*Sxy would hit ANSI ARITHMETIC_OVERFLOW past ~24M vectors, while
# the double algebra stays exact wherever every term < 2^53 (all test
# SFs, and any n*maxq^2 below ~10^15) and degrades gracefully — never
# errors — beyond it. Scale shape: each
# task reduces its rows to ONE d x d integer Gramian (numpy int64
# matmul in a mapInArrow kernel — exact, order-independent, so the
# oracle still value-matches) and emits d^2/2 partial rows; Spark sums
# the per-task partials into the final 2016-row aggregate. No
# self-join, no vec_id shuffle, and per-row work is a matmul instead of
# d^2/2 struct allocations — measured 4.3x faster than the pure-JVM
# nested-transform expansion at sf0.1 (interleaved min-of-3: 0.38s vs
# 1.65s) with a bit-equal result; the gap grows with d since the
# transform materializes O(d^2) structs per row. Per-dim moments stay
# JVM-side and ride a 64-row broadcast.
# ---------------------------------------------------------------------------


def _gram_partial_batches(it):
    """mapInArrow kernel: all rows of a task -> one upper-triangle
    integer Gramian (di, dj, p) partial. int64 end to end: products and
    sums are exact, so downstream algebra is engine-reproducible. Bound:
    |q| <= ~2^10 per cell keeps a 100 TB-scale accumulation far below
    int64 overflow (guarded by the quantizer's input range).

    Input contract (kept in lockstep with the oracle): element nulls are
    already quantized to 0 upstream; an all-NULL embedding row is
    dropped (the oracle's unnest emits no rows for it); a ragged table
    raises — fixed dimension is the embedding-table contract everywhere
    in this engine (every cosine/fold entry assumes it)."""
    import numpy as np
    import pyarrow as pa_

    acc = None
    for batch in it:
        col = batch.column(0)
        if col.null_count:
            col = col.drop_null()
        if len(col) == 0:
            continue
        # per-row length check (list_value_length is slice-safe, unlike
        # raw .offsets): a total-count check alone would accept
        # compensating ragged lengths ([4,3,5] vs d=4) and silently
        # shear values across rows
        import pyarrow.compute as pc

        lens = pc.list_value_length(col).to_numpy(zero_copy_only=False)
        d = int(lens[0])
        if (lens != d).any():
            raise ValueError(
                "embedding Gramian kernel: ragged embedding lengths — "
                "the embedding table must be fixed-dimension"
            )
        if d == 0:
            continue  # all-empty lists: the oracle's unnest emits no rows
        flat = col.flatten().to_numpy(zero_copy_only=False)
        mat = flat.reshape(-1, d)
        g = mat.T @ mat
        acc = g if acc is None else acc + g
    if acc is not None:
        iu = np.triu_indices(acc.shape[0], 1)
        yield pa_.RecordBatch.from_arrays(
            [
                pa_.array((iu[0] + 1).astype("int32")),
                pa_.array((iu[1] + 1).astype("int32")),
                pa_.array(acc[iu], type=pa_.int64()),
            ],
            names=["di", "dj", "p"],
        )


@register(
    "embed_dim_redundancy_topk",
    sql="""
    WITH q AS (
      SELECT vec_id,
             list_transform(embedding,
               x -> CAST(FLOOR(COALESCE(CAST(x AS DOUBLE), 0) * 128)
                         AS BIGINT)) AS qs
      FROM embeddings),
    exp AS (
      SELECT vec_id, unnest(qs) AS qv, generate_subscripts(qs, 1) AS i
      FROM q),
    dim AS (
      SELECT i, CAST(count(*) AS DOUBLE) AS n,
             CAST(SUM(qv) AS DOUBLE) AS s,
             CAST(SUM(qv * qv) AS DOUBLE) AS ss
      FROM exp GROUP BY i),
    pr AS (
      SELECT a.i AS di, b.i AS dj,
             CAST(SUM(a.qv * b.qv) AS DOUBLE) AS sxy
      FROM exp a JOIN exp b ON a.vec_id = b.vec_id AND a.i < b.i
      GROUP BY 1, 2),
    c AS (
      SELECT di, dj,
             (da.n * sxy - da.s * db.s)
               / sqrt(da.n * da.ss - da.s * da.s)
               / sqrt(db.n * db.ss - db.s * db.s) AS corr
      FROM pr
      JOIN dim da ON pr.di = da.i
      JOIN dim db ON pr.dj = db.i
      WHERE da.n * da.ss - da.s * da.s > 0
        AND db.n * db.ss - db.s * db.s > 0),
    top AS (
      SELECT di, dj, corr FROM c
      ORDER BY abs(corr) DESC, di ASC, dj ASC LIMIT 20)
    SELECT row_number() OVER (ORDER BY abs(corr) DESC, di ASC, dj ASC)
             AS rank,
           CAST(di AS INT) AS dim_i, CAST(dj AS INT) AS dim_j,
           round(corr, 6) AS corr
    FROM top
    """,
    doc="Embedding-dimension redundancy: top-20 dimension pairs by "
    "|Pearson correlation| on the floor(x*128) integer grid — exact "
    "cross-multiplied integer algebra, cross-engine bit-identical. "
    "Per-task integer Gramian via a mapInArrow numpy kernel (no "
    "self-join, no vec_id shuffle; 4.3x the pure-JVM transform "
    "expansion); one 2016-row aggregate + a 64-row broadcast; top-20 "
    "via orderBy+limit.",
)
def embed_dim_redundancy_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings")
    # null elements quantize to 0 (COALESCE mirrored in the oracle): the
    # Arrow kernel then always sees non-null int64 values
    qs = F.transform(
        F.col("embedding"),
        lambda x: F.floor(
            F.coalesce(x.cast("double"), F.lit(0.0)) * 128
        ).cast("long"),
    )
    # persisted: the quantized frame feeds BOTH the pair-product path and
    # the per-dim moment path (released at the harness/bench family
    # boundary like every other catalog persist). vec_id is NOT kept —
    # no Spark consumer needs it (it exists only for the oracle's
    # self-join), and dropping it halves the cached row width.
    q = e.select(qs.alias("qs")).persist()
    pr = (
        q.mapInArrow(_gram_partial_batches, schema="di int, dj int, p long")
        .groupBy("di", "dj")
        .agg(F.sum("p").cast("double").alias("sxy"))
    )
    exp = q.select(F.posexplode("qs").alias("i0", "qv")).select(
        (F.col("i0") + 1).alias("i"), "qv"
    )
    # moments cast to double HERE, mirroring the oracle's dim CTE: the
    # downstream cross-multiplies in int64 would hit ANSI
    # ARITHMETIC_OVERFLOW past ~24M vectors; the double algebra is exact
    # wherever every term < 2^53 (all test SFs) and degrades gracefully
    # instead of erroring beyond that
    dim = exp.groupBy("i").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("qv").cast("double").alias("s"),
        F.sum(F.col("qv") * F.col("qv")).cast("double").alias("ss"),
    )
    da = dim.select(
        F.col("i").alias("di"), F.col("n").alias("n_a"),
        F.col("s").alias("s_a"), F.col("ss").alias("ss_a"),
    )
    db = dim.select(
        F.col("i").alias("dj"), F.col("n").alias("n_b"),
        F.col("s").alias("s_b"), F.col("ss").alias("ss_b"),
    )
    va = F.col("n_a") * F.col("ss_a") - F.col("s_a") * F.col("s_a")
    vb = F.col("n_b") * F.col("ss_b") - F.col("s_b") * F.col("s_b")
    corr = (
        (F.col("n_a") * F.col("sxy") - F.col("s_a") * F.col("s_b"))
        / F.sqrt(va)
        / F.sqrt(vb)
    )
    c = (
        pr.join(F.broadcast(da), "di")
        .join(F.broadcast(db), "dj")
        .filter((va > 0) & (vb > 0))
        .select("di", "dj", corr.alias("corr"))
    )
    top = c.orderBy(
        F.abs(F.col("corr")).desc(), F.col("di").asc(), F.col("dj").asc()
    ).limit(20)
    win = W.orderBy(
        F.abs(F.col("corr")).desc(), F.col("di").asc(), F.col("dj").asc()
    )
    # rank over the 20-row TakeOrderedAndProject result only
    return top.select(
        F.row_number().over(win).alias("rank"),
        F.col("di").cast("int").alias("dim_i"),
        F.col("dj").cast("int").alias("dim_j"),
        F.round("corr", 6).alias("corr"),
    )


# ---------------------------------------------------------------------------
# SimHash radius calibration: the Hamming-distance histogram over all
# pairs of a deterministic hash-ordered document sample — the curve that
# picks dedup_simhash's max_hamming radius (the knee between the
# near-dup mass at low distance and the ~30-bit random-pair bulk).
# Completes the threshold-selection family (MinHash calibration, Jaccard
# band histogram, shingle-size sweep). SAMPLING is the scale design:
# calibration needs distance statistics, not every pair, so the pair
# count is capped at K^2/2 forever (K=400 -> 79,800 pairs) regardless of
# corpus size; the sample itself plans as TakeOrderedAndProject (no
# corpus shuffle), mirroring sample_deterministic_hash.
# ---------------------------------------------------------------------------

_SIMCAL_K = 400


def _simcal_sql() -> str:
    from dsacord_spark.functions.hashing import md5_long_sql
    from dsacord_spark.plans.analysis import _simhash_sig_ctes

    hk = md5_long_sql("CAST(doc_id AS VARCHAR)")
    return f"""
    WITH samp AS (
      SELECT doc_id, text FROM (
        SELECT doc_id, text,
               row_number() OVER (ORDER BY {hk}, doc_id) AS rk
        FROM documents)
      WHERE rk <= {_SIMCAL_K}),
    {_simhash_sig_ctes('samp')},
    prh AS (
      SELECT bit_count(xor(a.simhash, b.simhash)) AS hamming
      FROM sig a JOIN sig b ON a.doc < b.doc),
    h AS (SELECT hamming, count(*) AS n_pairs FROM prh GROUP BY hamming),
    t AS (SELECT SUM(n_pairs) AS total FROM h)
    SELECT CAST(hamming AS INT) AS hamming,
           CAST(n_pairs AS BIGINT) AS n_pairs,
           CAST(SUM(n_pairs) OVER (ORDER BY hamming) AS BIGINT) AS cum_pairs,
           round(CAST(SUM(n_pairs) OVER (ORDER BY hamming) AS DOUBLE)
                 / (SELECT total FROM t), 6) AS cum_share
    FROM h
    """


@register(
    "dedup_simhash_radius_calibration",
    sql=_simcal_sql(),
    doc="SimHash radius-calibration curve: Hamming-distance histogram "
    "(count / cumulative count / cumulative share) over all pairs of a "
    "deterministic md5-ordered 400-doc sample — picks dedup_simhash's "
    "max_hamming. Pair work capped at K^2/2 forever (sampling IS the "
    "scale design); sample plans as TakeOrderedAndProject; signatures "
    "shared with operators/dedup.simhash_signatures.",
)
def dedup_simhash_radius_calibration(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from dsacord_spark.functions.hashing import md5_long
    from dsacord_spark.operators.dedup import simhash_signatures

    d = table(spark, sf_dir, "documents")
    samp = (
        d.select(
            "doc_id", "text",
            md5_long(F.col("doc_id").cast("string")).alias("hk"),
        )
        .orderBy(F.col("hk").asc(), F.col("doc_id").asc())
        .limit(_SIMCAL_K)
        .select("doc_id", "text")
    )
    # persisted: the K-row signature frame feeds both nested-loop sides
    # AND the histogram total — unpersisted, the corpus-wide top-K sample
    # scan (the only part that touches the full table) re-runs 4x
    sig = simhash_signatures(samp, "doc_id", "text").persist()
    a = sig.select(F.col("doc").alias("da"), F.col("simhash").alias("ha"))
    b = sig.select(F.col("doc").alias("db"), F.col("simhash").alias("hb"))
    # K-row frame vs K-row frame: broadcast nested-loop on the a<b
    # predicate — bounded at K^2/2 pairs by construction, never corpus^2
    pairs = a.join(F.broadcast(b), F.col("da") < F.col("db")).select(
        F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))).alias("hamming")
    )
    h = pairs.groupBy("hamming").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs")
    )
    t = h.agg(F.sum("n_pairs").alias("total"))
    # cumulative over the <=61-row aggregated histogram — bounded window
    wc = W.orderBy("hamming").rowsBetween(W.unboundedPreceding, W.currentRow)
    return (
        h.withColumn("cum_pairs", F.sum("n_pairs").over(wc).cast("bigint"))
        .crossJoin(F.broadcast(t))
        .select(
            F.col("hamming").cast("int").alias("hamming"),
            "n_pairs",
            "cum_pairs",
            F.round(
                F.col("cum_pairs").cast("double") / F.col("total"), 6
            ).alias("cum_share"),
        )
    )


# ---------------------------------------------------------------------------
# Training-shard balance plan: deterministic md5 doc->shard assignment
# (the reproducible pseudo-shuffle a training-data export needs — rand()
# is none of reproducible/partitioning-stable/engine-stable) with
# per-shard doc/token/char loads and a load factor vs the mean. The
# report that validates shard balance BEFORE burning a 100 TB export:
# one corpus scan, a 64-group map-side-combined aggregate, a one-row
# broadcast total. Hash assignment means rebalancing is a constant
# change, not a reshuffle of prior shards.
# ---------------------------------------------------------------------------

_SHARD_N = 64


def _shard_plan_sql() -> str:
    # hash + tokenizer fragments interpolated from the shared
    # definitions (md5_long_sql / _TOKS_SQL), never duplicated as
    # literals — the lockstep rule
    from dsacord_spark.functions.hashing import md5_long_sql

    return f"""
    WITH a AS (
      SELECT {md5_long_sql('CAST(doc_id AS VARCHAR)')} % {_SHARD_N} AS shard,
             len({_TOKS_SQL.format(c='text')}) AS n_toks,
             n_chars
      FROM documents),
    g AS (
      SELECT shard, count(*) AS n_docs, SUM(n_toks) AS n_tokens,
             SUM(n_chars) AS n_chars
      FROM a GROUP BY shard)
    SELECT CAST(shard AS INT) AS shard,
           CAST(n_docs AS BIGINT) AS n_docs,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(n_chars AS BIGINT) AS n_chars,
           CAST((2000000 * n_docs * {_SHARD_N} + SUM(n_docs) OVER ())
                // (2 * SUM(n_docs) OVER ()) AS DOUBLE) / 1000000
             AS load_factor
    FROM g
    """


@register(
    "corpus_shard_plan",
    sql=_shard_plan_sql(),
    doc=f"Training-shard balance plan: deterministic md5 doc->shard "
    f"assignment into {_SHARD_N} shards with per-shard doc/token/char "
    "loads and load factor vs the mean — validates export balance "
    "before writing; ONE corpus scan (the grand total comes from a "
    "bounded window over the 64-row grouped aggregate, not a second "
    "scan), map-side-combined 64-group aggregate.",
)
def corpus_shard_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dsacord_spark.functions.hashing import md5_long

    d = table(spark, sf_dir, "documents")
    a = d.select(
        (md5_long(F.col("doc_id").cast("string")) % _SHARD_N).alias("shard"),
        F.size(tokens("text")).alias("n_toks"),
        "n_chars",
    )
    g = a.groupBy("shard").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_toks").cast("bigint").alias("n_tokens"),
        F.sum("n_chars").cast("bigint").alias("n_chars"),
    )
    # grand total as a bounded window over the 64-row aggregate — a
    # separate a.agg() branch would re-scan the whole corpus (exchange
    # reuse cannot dedupe two different aggregates over one frame)
    wall = W.partitionBy(F.lit(0)).rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    return (
        g.withColumn("_tot", F.sum("n_docs").over(wall))
        .select(
            F.col("shard").cast("int").alias("shard"),
            "n_docs",
            "n_tokens",
            "n_chars",
            # integer half-up 6dp (plain round() splits HALF_UP vs
            # half-even on exact dyadic ties like 64/8192). The product
            # rides DECIMAL(38,0) — BIGINT would ANSI-error once a shard
            # holds ~7e10 docs (2e6 * n_docs * 64 > 2^63) while DuckDB's
            # HUGEINT silently succeeds; same posture as the fano entry
            # (ADVICE r6). The div quotient is the 6dp-scaled load
            # factor, bounded by 64e6 << 2^63, so the BIGINT quotient of
            # Spark's decimal `div` cannot wrap.
            (
                F.expr(
                    f"(CAST(2000000 AS DECIMAL(38,0)) * n_docs * {_SHARD_N}"
                    " + _tot) div (2 * _tot)"
                ).cast("double")
                / 1e6
            ).alias("load_factor"),
        )
    )


# ---------------------------------------------------------------------------
# Quality-prune threshold sweep: for every cutoff t on the integer-tenths
# quality score (functions/text.quality_score10 — the 4+3+3 rendering of
# the text_quality heuristic), how many documents and tokens survive
# `quality >= t`? The curation planning table behind "where do we set the
# quality bar": one corpus scan reduced to a <= 11-row per-level
# aggregate; the 11-threshold grid joins against THAT aggregate, never
# the corpus, so the sweep costs one scan regardless of grid size.
# Integer score levels mean no threshold ever sits on a float-sum grid
# point (0.4+0.3 is 0.7000000000000001 in both engines; 4+3 is just 7).
# ---------------------------------------------------------------------------


def _quality_sweep_sql() -> str:
    # score fragment interpolated from the shared definition
    # (analysis._quality10_sql == functions/text.quality_score10)
    from dsacord_spark.plans.analysis import _quality10_sql

    return f"""
    WITH q AS (
      SELECT {_quality10_sql('text')} AS s10,
             len({_TOKS_SQL.format(c='text')}) AS n_toks
      FROM documents),
    lvl AS (SELECT s10, count(*) AS d, SUM(n_toks) AS tk
            FROM q GROUP BY s10),
    tot AS (SELECT SUM(d) AS td, SUM(tk) AS tt FROM lvl),
    thr AS (SELECT CAST(unnest(generate_series(0, 10)) AS INT) AS threshold)
    SELECT t.threshold,
           CAST(COALESCE(SUM(l.d), 0) AS BIGINT) AS n_docs,
           CAST(COALESCE(SUM(l.tk), 0) AS BIGINT) AS n_tokens,
           round(CAST(COALESCE(SUM(l.d), 0) AS DOUBLE)
                 / (SELECT td FROM tot), 6) AS doc_pct,
           round(CAST(COALESCE(SUM(l.tk), 0) AS DOUBLE)
                 / (SELECT tt FROM tot), 6) AS token_pct
    FROM thr t LEFT JOIN lvl l ON l.s10 >= t.threshold
    GROUP BY t.threshold
    """


@register(
    "corpus_quality_prune_sweep",
    sql=_quality_sweep_sql(),
    doc="Docs/tokens retained at every quality cutoff t in 0..10 over the "
    "integer-tenths quality score — the set-the-quality-bar planning "
    "table. One corpus scan -> <=11-row level aggregate; the threshold "
    "grid joins the aggregate, not the corpus.",
)
def corpus_quality_prune_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dsacord_spark.functions.text import quality_score10, token_count

    d = table(spark, sf_dir, "documents")
    q = d.select(
        quality_score10("text").alias("s10"),
        token_count("text").alias("n_toks"),
    )
    lvl = q.groupBy("s10").agg(
        F.count(F.lit(1)).alias("d"),
        F.sum("n_toks").alias("tk"),
    )
    # persisted so the totals branch reads the 11-row aggregate, not the
    # corpus (exchange reuse cannot dedupe two different aggregates over
    # one frame); the harness releases catalog persists per query
    lvl = lvl.persist()
    tot = lvl.agg(F.sum("d").alias("td"), F.sum("tk").alias("tt"))
    thr = spark.range(0, 11).select(F.col("id").cast("int").alias("threshold"))
    # totals ride EVERY threshold row via the one-row cross join, so
    # thresholds no document reaches still divide by the real totals
    # (a totals column carried on the level join would be NULL there)
    joined = thr.crossJoin(F.broadcast(tot)).join(
        F.broadcast(lvl), F.col("s10") >= F.col("threshold"), "left"
    )
    return joined.groupBy("threshold").agg(
        F.coalesce(F.sum("d"), F.lit(0)).cast("bigint").alias("n_docs"),
        F.coalesce(F.sum("tk"), F.lit(0)).cast("bigint").alias("n_tokens"),
        F.round(
            F.coalesce(F.sum("d"), F.lit(0)).cast("double") / F.max("td"),
            6,
        ).alias("doc_pct"),
        F.round(
            F.coalesce(F.sum("tk"), F.lit(0)).cast("double") / F.max("tt"),
            6,
        ).alias("token_pct"),
    )


# ---------------------------------------------------------------------------
# Daily-volume autocorrelation: Pearson r between the gap-filled daily
# event-count series and itself at lags 1/2/3/7/14 days — the seasonality
# detector behind capacity planning (a strong lag-7 says weekly cycle;
# lag-1 says momentum). The series lives on an integer day-index spine
# (missing days count 0 — autocorrelation over a gappy series is wrong
# without the spine), pairs come from an equi-join on i + lag against the
# tiny per-day aggregate, and every moment sum is DECIMAL-exact over
# integer counts (the part_size_price_corr playbook): only the final
# sqrt/divide touch floating point, on identical operands in both
# engines. Scale: one events scan reduced to a #days-row frame; the
# lag join and moments run on that frame, so cost is O(days), not
# O(events), at any corpus size.
# ---------------------------------------------------------------------------

_AUTOCORR_LAGS = (1, 2, 3, 7, 14)


@register(
    "events_daily_autocorr",
    sql=f"""
    WITH d AS (
      SELECT datediff('day', DATE '1970-01-01',
                      CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS i,
             count(*) AS c
      FROM events GROUP BY 1),
    b AS (SELECT min(i) AS mn, max(i) AS mx FROM d),
    s AS (
      SELECT t.i, COALESCE(d.c, 0) AS c
      FROM (SELECT unnest(generate_series((SELECT mn FROM b),
                                          (SELECT mx FROM b))) AS i) t
      LEFT JOIN d USING (i)),
    l AS (SELECT unnest([{", ".join(str(x) for x in _AUTOCORR_LAGS)}]) AS lag),
    p AS (
      SELECT l.lag, a.c AS x, bb.c AS y
      FROM s a JOIN l ON true JOIN s bb ON bb.i = a.i + l.lag),
    m AS (
      SELECT lag, count(*) AS n,
             SUM(CAST(x AS DECIMAL(38,0))) AS sx,
             SUM(CAST(y AS DECIMAL(38,0))) AS sy,
             SUM(CAST(x AS DECIMAL(38,0)) * x) AS sxx,
             SUM(CAST(y AS DECIMAL(38,0)) * y) AS syy,
             SUM(CAST(x AS DECIMAL(38,0)) * y) AS sxy
      FROM p GROUP BY lag)
    SELECT CAST(lag AS INT) AS lag, CAST(n AS BIGINT) AS n_pairs,
           round(CAST(n * sxy - sx * sy AS DOUBLE)
                 / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                    * sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 6) AS autocorr
    FROM m
    WHERE n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
    """,
    doc="Pearson autocorrelation of the gap-filled daily event-count "
    "series at lags 1/2/3/7/14 (weekly-cycle detector). Day-index spine "
    "fills missing days with 0; moment sums are DECIMAL-exact integers; "
    "one events scan -> O(days) frame for everything downstream.",
)
def events_daily_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    d = e.groupBy(
        F.datediff(
            F.to_date("ts"), F.lit("1970-01-01").cast("date")
        ).alias("i")
    ).agg(F.count(F.lit(1)).alias("c"))
    # persisted: the spine bounds and the spine join both read d — two
    # different aggregates/branches over the events scan otherwise
    d = d.persist()
    b = d.agg(F.min("i").alias("mn"), F.max("i").alias("mx"))
    spine = b.select(F.explode(F.sequence("mn", "mx")).alias("i"))
    sc = (
        spine.join(d, "i", "left")
        .select("i", F.coalesce("c", F.lit(0)).cast("bigint").alias("c"))
        .persist()
    )
    lags = spark.range(1).select(
        F.explode(
            F.array(*[F.lit(x) for x in _AUTOCORR_LAGS])
        ).alias("lag")
    )
    a = sc.select(F.col("i").alias("ia"), F.col("c").alias("x"))
    bb = sc.select(F.col("i").alias("ib"), F.col("c").alias("y"))
    pairs = a.crossJoin(F.broadcast(lags)).join(
        F.broadcast(bb), F.col("ib") == F.col("ia") + F.col("lag")
    )
    dx = F.col("x").cast("decimal(38,0)")
    dy = F.col("y").cast("decimal(38,0)")
    m = pairs.groupBy("lag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dx).alias("sx"),
        F.sum(dy).alias("sy"),
        F.sum(dx * F.col("x")).alias("sxx"),
        F.sum(dy * F.col("y")).alias("syy"),
        F.sum(dx * F.col("y")).alias("sxy"),
    )
    varx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vary = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    cov = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    return (
        m.filter((varx > 0) & (vary > 0))
        .select(
            F.col("lag").cast("int").alias("lag"),
            F.col("n").cast("bigint").alias("n_pairs"),
            F.round(
                cov.cast("double")
                / (
                    F.sqrt(varx.cast("double"))
                    * F.sqrt(vary.cast("double"))
                ),
                6,
            ).alias("autocorr"),
        )
    )


# ---------------------------------------------------------------------------
# Embedding effective rank (participation ratio): PR = trace(M)^2 /
# ||M||_F^2 over the raw second-moment matrix M = n*Sxy - Sx*Sy on the
# floor(x*128) integer grid — (sum lambda)^2 / (sum lambda^2) of the
# covariance spectrum WITHOUT any eigendecomposition (both traces are
# closed forms in the Gramian entries), plus the top raw-variance
# dimension and its share of total variance. PR near 1 means one
# direction carries everything (collapse); PR near d means isotropic —
# the standard representation-quality diagnostic run before ANN
# indexing or whitening. Scale shape: the same one-pass mapInArrow
# integer-Gramian sketch as embed_dim_redundancy_topk (d^2/2 partial
# rows per task, no self-join, no vec_id shuffle), then everything
# downstream runs on d- and d^2-row frames. Every sum is DECIMAL-exact
# integer algebra (PR is scale-invariant, so the quantization and the
# uncentered-vs-centered n factor cancel nowhere that matters for
# determinism); only the final ratio touches floating point, on
# identical operands in both engines. Bound: |M| must fit DECIMAL(19,0)
# before squaring — n*q_max^2 < 1e19, ~3e7 vectors at |q|<=2^10 (the
# redundancy entry's documented bound class; past it the entry raises
# ANSI overflow rather than degrade silently — re-grid the quantizer or
# subsample to extend).
# ---------------------------------------------------------------------------


@register(
    "embed_effective_rank",
    sql="""
    WITH q AS (
      SELECT vec_id,
             list_transform(embedding,
               x -> CAST(FLOOR(COALESCE(CAST(x AS DOUBLE), 0) * 128)
                         AS BIGINT)) AS qs
      FROM embeddings),
    exp AS (
      SELECT vec_id, unnest(qs) AS qv, generate_subscripts(qs, 1) AS i
      FROM q),
    dim AS (
      SELECT i, count(*) AS n, SUM(qv) AS s, SUM(qv * qv) AS ss
      FROM exp GROUP BY i),
    nv AS (SELECT max(n) AS nv FROM dim),
    dd AS (
      SELECT i,
             CAST(nv AS DECIMAL(18,0)) * CAST(ss AS DECIMAL(19,0))
               - CAST(s AS DECIMAL(19,0)) * CAST(s AS DECIMAL(19,0)) AS m
      FROM dim, nv),
    pr AS (
      SELECT a.i AS di, b.i AS dj, SUM(a.qv * b.qv) AS sxy
      FROM exp a JOIN exp b ON a.vec_id = b.vec_id AND a.i < b.i
      GROUP BY 1, 2),
    pm AS (
      SELECT CAST(nv AS DECIMAL(18,0)) * CAST(sxy AS DECIMAL(19,0))
               - CAST(da.s AS DECIMAL(19,0)) * CAST(db.s AS DECIMAL(19,0))
               AS m
      FROM pr JOIN dim da ON pr.di = da.i
              JOIN dim db ON pr.dj = db.i, nv),
    tr AS (SELECT SUM(m) AS tra, count(*) AS n_dims FROM dd),
    fd AS (SELECT SUM(CAST(m AS DECIMAL(19,0))
                      * CAST(m AS DECIMAL(19,0))) AS f1 FROM dd),
    fp AS (SELECT COALESCE(SUM(CAST(m AS DECIMAL(19,0))
                               * CAST(m AS DECIMAL(19,0))), 0) AS f2
           FROM pm),
    top AS (SELECT i, m FROM dd ORDER BY m DESC, i ASC LIMIT 1)
    SELECT CAST(nv AS BIGINT) AS n_vecs,
           CAST(n_dims AS INT) AS n_dims,
           round(CAST(tra AS DOUBLE) * CAST(tra AS DOUBLE)
                 / CAST(f1 + 2 * f2 AS DOUBLE), 6) AS effective_rank,
           CAST(top.i AS INT) AS top_var_dim,
           round(CAST(top.m AS DOUBLE) / CAST(tra AS DOUBLE), 6)
             AS top_var_share
    FROM tr, fd, fp, top, nv
    WHERE f1 + 2 * f2 > 0 AND tra > 0
    """,
    doc="Embedding effective rank (participation ratio trace^2/frobenius^2 "
    "of the second-moment matrix) + top-variance dimension share — the "
    "representation-collapse diagnostic, eigendecomposition-free. Same "
    "one-pass integer-Gramian mapInArrow sketch as the dimension-"
    "redundancy entry; DECIMAL-exact sums; one output row.",
)
def embed_effective_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings")
    qs = F.transform(
        F.col("embedding"),
        lambda x: F.floor(
            F.coalesce(x.cast("double"), F.lit(0.0)) * 128
        ).cast("long"),
    )
    q = e.select(qs.alias("qs")).persist()
    pr = (
        q.mapInArrow(_gram_partial_batches, schema="di int, dj int, p long")
        .groupBy("di", "dj")
        .agg(F.sum("p").alias("sxy"))
    )
    exp = q.select(F.posexplode("qs").alias("i0", "qv")).select(
        (F.col("i0") + 1).alias("i"), "qv"
    )
    # persisted: trace, frobenius-diagonal, top-dim, and the pair join
    # all read this 64-row frame (and through it the one corpus pass)
    dim = exp.groupBy("i").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("qv").alias("s"),
        F.sum(F.col("qv") * F.col("qv")).alias("ss"),
    ).persist()
    nv = dim.agg(F.max("n").alias("nv"))
    d18 = F.col("nv").cast("decimal(18,0)")
    dd = dim.crossJoin(F.broadcast(nv)).select(
        "i",
        (
            d18 * F.col("ss").cast("decimal(19,0)")
            - F.col("s").cast("decimal(19,0)")
            * F.col("s").cast("decimal(19,0)")
        ).alias("m"),
    )
    da = dim.select(F.col("i").alias("di"), F.col("s").alias("s_a"))
    db = dim.select(F.col("i").alias("dj"), F.col("s").alias("s_b"))
    pm = (
        pr.join(F.broadcast(da), "di")
        .join(F.broadcast(db), "dj")
        .crossJoin(F.broadcast(nv))
        .select(
            (
                d18 * F.col("sxy").cast("decimal(19,0)")
                - F.col("s_a").cast("decimal(19,0)")
                * F.col("s_b").cast("decimal(19,0)")
            ).alias("m")
        )
    )
    m19 = F.col("m").cast("decimal(19,0)")
    tr = dd.agg(
        F.sum("m").alias("tra"), F.count(F.lit(1)).alias("n_dims")
    )
    fd = dd.agg(F.sum(m19 * m19).alias("f1"))
    fp_ = pm.agg(F.coalesce(F.sum(m19 * m19), F.lit(0)).alias("f2"))
    top = dd.orderBy(F.col("m").desc(), F.col("i").asc()).limit(1)
    frob2 = F.col("f1") + 2 * F.col("f2")
    return (
        tr.crossJoin(F.broadcast(fd))
        .crossJoin(F.broadcast(fp_))
        .crossJoin(F.broadcast(top))
        .crossJoin(F.broadcast(nv))
        .filter((frob2 > 0) & (F.col("tra") > 0))
        .select(
            F.col("nv").cast("bigint").alias("n_vecs"),
            F.col("n_dims").cast("int").alias("n_dims"),
            F.round(
                F.col("tra").cast("double") * F.col("tra").cast("double")
                / frob2.cast("double"),
                6,
            ).alias("effective_rank"),
            F.col("i").cast("int").alias("top_var_dim"),
            F.round(
                F.col("m").cast("double") / F.col("tra").cast("double"), 6
            ).alias("top_var_share"),
        )
    )


# ---------------------------------------------------------------------------
# Corpus novelty / saturation curve: split the corpus into 10 equal
# deterministic slices (md5(doc_id) % 10 — the corpus_shard_plan
# assignment), treat slice index as a synthetic ingestion schedule, and
# measure how much of each slice's 3-gram shingle vocabulary is NEW
# (first seen in that slice) vs already covered by earlier slices. The
# Heaps'-law planning curve behind "is more of this corpus still buying
# diversity?": a flat novelty_rate tail says additional data from the
# same distribution mostly repeats what the model has seen.
# Scale: ONE text scan -> linear n-gram explode -> a SINGLE corpus-sized
# shuffle keyed by shingle hash (groupBy(hg) with map-side partial
# collect_set bounded by 10 buckets); the per-bucket aggregate is 10
# rows, so the cum_vocab window is bounded. n_docs comes from a second
# scan PRUNED to doc_id only (exchange reuse cannot dedupe two different
# aggregates; a one-int64-column parquet scan is noise at any scale).
# No joins between corpus-sized frames, no persist, no driver state.
# ---------------------------------------------------------------------------

_NOVELTY_BUCKETS = 10
_NOVELTY_N = 3  # n-gram width — the dedup machinery's default shingle


def _novelty_sql() -> str:
    # bucket + tokenizer + hash fragments interpolated from the shared
    # definitions (md5_long_sql / _TOKS_SQL), never duplicated literals
    from dsacord_spark.functions.hashing import md5_long_sql

    b = f"{md5_long_sql('CAST(doc_id AS VARCHAR)')} % {_NOVELTY_BUCKETS}"
    n = _NOVELTY_N
    return f"""
    WITH toks AS (
      SELECT {b} AS b, {_TOKS_SQL.format(c='text')} AS t FROM documents),
    ngr_s AS (
      SELECT DISTINCT b, array_to_string(t[i:i+{n - 1}], ' ') AS ng
      FROM toks,
           unnest(generate_series(1, greatest(len(t)-{n - 1}, 1))) AS u(i)),
    pairs AS (SELECT DISTINCT b, {md5_long_sql('ng')} AS hg FROM ngr_s
              WHERE ng IS NOT NULL AND ng <> ''),
    firstb AS (SELECT hg, min(b) AS fb FROM pairs GROUP BY hg),
    per AS (
      SELECT p.b, count(*) AS seen,
             SUM(CASE WHEN p.b = f.fb THEN 1 ELSE 0 END) AS new
      FROM pairs p JOIN firstb f USING (hg) GROUP BY p.b),
    nd AS (SELECT {b} AS b, count(*) AS n_docs FROM documents GROUP BY 1)
    SELECT CAST(per.b AS INT) AS bucket,
           CAST(nd.n_docs AS BIGINT) AS n_docs,
           CAST(seen AS BIGINT) AS shingles_seen,
           CAST(new AS BIGINT) AS new_shingles,
           CAST((2000000 * new + seen) // (2 * seen) AS DOUBLE) / 1000000
               AS novelty_rate,
           CAST(SUM(new) OVER (ORDER BY per.b ROWS UNBOUNDED PRECEDING)
                AS BIGINT) AS cum_vocab
    FROM per JOIN nd ON nd.b = per.b
    """


@register(
    "corpus_novelty_curve",
    sql=_novelty_sql(),
    doc=f"N-gram novelty/saturation curve over {_NOVELTY_BUCKETS} "
    "deterministic md5 corpus slices exposed in index order: per slice, "
    "distinct 3-gram shingles present, shingles first seen there, the "
    "novelty rate, and the cumulative vocabulary. One text scan, one "
    "shingle-keyed shuffle (collect_set bounded by the bucket count), "
    "10-row output.",
)
def corpus_novelty_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dsacord_spark.functions.hashing import md5_long
    from dsacord_spark.functions.text import word_ngrams

    d = table(spark, sf_dir, "documents")
    bucket = (
        md5_long(F.col("doc_id").cast("string")) % _NOVELTY_BUCKETS
    ).alias("b")
    # word_ngrams is already array_distinct per doc; cross-doc duplicates
    # within a bucket collapse in the collect_set below, so no explicit
    # distinct() (saves one corpus shuffle vs distinct-then-group).
    # Tokenless docs are excluded from shingle generation on BOTH
    # engines (their only "shingle" is the empty-slice artifact, which
    # Spark renders '' and DuckDB NULL — a join-semantics trap, not a
    # vocabulary item); they still count in n_docs.
    exploded = (
        d.select(
            bucket, F.explode(word_ngrams("text", _NOVELTY_N)).alias("ng")
        )
        .filter(F.col("ng") != "")
        .select("b", md5_long(F.col("ng")).alias("hg"))
    )
    per_h = exploded.groupBy("hg").agg(
        F.min("b").alias("fb"), F.collect_set("b").alias("bs")
    )
    per_b = (
        per_h.select(F.explode("bs").alias("b"), "fb")
        .groupBy("b")
        .agg(
            F.count(F.lit(1)).alias("seen"),
            F.sum(F.when(F.col("b") == F.col("fb"), 1).otherwise(0)).alias(
                "new"
            ),
        )
    )
    nd = d.groupBy(bucket).agg(F.count(F.lit(1)).alias("n_docs"))
    # bounded window: per_b is a grouped aggregate of <= 10 rows
    wcum = W.orderBy("b").rowsBetween(W.unboundedPreceding, W.currentRow)
    return per_b.join(nd, "b").select(
        F.col("b").cast("int").alias("bucket"),
        F.col("n_docs").cast("bigint").alias("n_docs"),
        F.col("seen").cast("bigint").alias("shingles_seen"),
        F.col("new").cast("bigint").alias("new_shingles"),
        # half-up 6dp rounding in integer math ((2e6*new + seen) div
        # (2*seen)): new/seen is a small-denominator rational that can
        # land on exact .xxxxxx5 ties where the engines' round() modes
        # diverge (the text_readability_ari playbook)
        (
            F.expr("(2000000 * new + seen) div (2 * seen)").cast("double")
            / F.lit(1_000_000)
        ).alias("novelty_rate"),
        F.sum("new").over(wcum).cast("bigint").alias("cum_vocab"),
    )


# ---------------------------------------------------------------------------
# Corpus manifest — the per-source "dataset card" a training-data release
# ships with: volume (docs/tokens/chars), language spread, mean quality,
# exact-duplicate load, and share of the corpus, in one table. Composes
# the per-aspect entries (text_stats / text_lang_breakdown / dedup_exact)
# into the single summary a data curator actually reads first.
# Scale: one text scan -> groupBy(source, text-hash, lang) (the corpus
# shuffle, map-side combined); the source-level distinct counts run over
# THAT deduplicated frame (Expand x2 of the deduped rows, never the raw
# corpus); the grand total is a bounded window over the #sources-row
# aggregate. Ratios are half-up-rounded in integer arithmetic (the ARI
# playbook) — mean quality, dup rate and doc share are all
# small-denominator rationals. Documented bound: 2e6 * sum(quality10)
# must fit int64, i.e. < ~4.6e11 docs per source; past that, regrid to
# DECIMAL before the division.
# ---------------------------------------------------------------------------


def _manifest_sql() -> str:
    from dsacord_spark.functions.hashing import md5_long_sql
    from dsacord_spark.plans.analysis import _quality10_sql

    return f"""
    WITH b AS (
      SELECT source, lang, {md5_long_sql('text')} AS h,
             {_quality10_sql('text')} AS s10,
             len({_TOKS_SQL.format(c='text')}) AS n_toks, n_chars
      FROM documents),
    g AS (
      SELECT source, count(*) AS n_docs, SUM(n_toks) AS n_tokens,
             SUM(n_chars) AS n_chars, count(DISTINCT lang) AS n_langs,
             count(DISTINCT h) AS distinct_texts, SUM(s10) AS sq
      FROM b GROUP BY source),
    t AS (SELECT SUM(n_docs) AS total FROM g)
    SELECT source,
           CAST(n_docs AS BIGINT) AS n_docs,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(n_chars AS BIGINT) AS n_chars,
           CAST(n_langs AS BIGINT) AS n_langs,
           CAST(distinct_texts AS BIGINT) AS distinct_texts,
           CAST((2000000 * sq + n_docs) // (2 * n_docs) AS DOUBLE)
               / 1000000 AS mean_quality10,
           CAST((2000000 * (n_docs - distinct_texts) + n_docs)
                // (2 * n_docs) AS DOUBLE) / 1000000 AS dup_rate,
           CAST((2000000 * n_docs + total) // (2 * total) AS DOUBLE)
               / 1000000 AS doc_share
    FROM g, t
    """


@register(
    "corpus_manifest",
    sql=_manifest_sql(),
    doc="Per-source dataset card: docs/tokens/chars, distinct languages, "
    "distinct texts, mean integer-tenths quality, exact-dup rate, and "
    "corpus doc share. One corpus scan -> (source, hash, lang) combine; "
    "distinct counts over the deduped frame; integer-exact 6dp ratios.",
)
def corpus_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dsacord_spark.functions.hashing import md5_long
    from dsacord_spark.functions.text import quality_score10, token_count

    d = table(spark, sf_dir, "documents")
    base = d.select(
        "source",
        "lang",
        md5_long(F.col("text")).alias("h"),
        quality_score10("text").alias("s10"),
        token_count("text").alias("n_toks"),
        "n_chars",
    )
    g1 = base.groupBy("source", "h", "lang").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum("n_toks").alias("tk"),
        F.sum("n_chars").alias("ch"),
        F.sum("s10").alias("sq1"),
    )
    g = g1.groupBy("source").agg(
        F.sum("cnt").alias("n_docs"),
        F.sum("tk").alias("n_tokens"),
        F.sum("ch").alias("n_chars"),
        F.countDistinct("lang").alias("n_langs"),
        F.countDistinct("h").alias("distinct_texts"),
        F.sum(F.col("sq1")).alias("sq"),
    )
    # bounded window: g is the #sources-row aggregate
    wall = W.partitionBy(F.lit(0)).rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    g = g.withColumn("total", F.sum("n_docs").over(wall))
    return g.select(
        "source",
        F.col("n_docs").cast("bigint").alias("n_docs"),
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        F.col("n_chars").cast("bigint").alias("n_chars"),
        F.col("n_langs").cast("bigint").alias("n_langs"),
        F.col("distinct_texts").cast("bigint").alias("distinct_texts"),
        (
            F.expr("(2000000 * sq + n_docs) div (2 * n_docs)").cast("double")
            / F.lit(1_000_000)
        ).alias("mean_quality10"),
        (
            F.expr(
                "(2000000 * (n_docs - distinct_texts) + n_docs)"
                " div (2 * n_docs)"
            ).cast("double")
            / F.lit(1_000_000)
        ).alias("dup_rate"),
        (
            F.expr("(2000000 * n_docs + total) div (2 * total)").cast(
                "double"
            )
            / F.lit(1_000_000)
        ).alias("doc_share"),
    )


# ---------------------------------------------------------------------------
# Language-ID evaluation scorecard: per labeled language, the support /
# predicted / correct counts and precision, recall, F1 of the lang_id
# heuristic against the labeled `lang` column — the classifier-QA table
# behind text_lang_breakdown's raw confusion matrix (is the lang-ID gate
# good enough to route documents at 100 TB?). One corpus scan -> the
# (lang, guess) confusion aggregate (persisted: the support and
# predicted branches both read it — tiny, <= |langs|^2 rows); everything
# downstream is bounded by the language count. F1 is computed as
# 2*correct / (predicted + support) — the algebraically equal form whose
# operands stay integers, so the ARI integer-rounding playbook applies
# to all three ratios (no nested float division).
# ---------------------------------------------------------------------------


def _langid_eval_sql() -> str:
    from dsacord_spark.plans.analysis import _lang_id_sql

    return f"""
    WITH cm AS (
      SELECT lang, {_lang_id_sql('text')} AS g, count(*) AS n
      FROM documents GROUP BY 1, 2),
    sup AS (
      SELECT lang, SUM(n) AS support,
             SUM(CASE WHEN g = lang THEN n ELSE 0 END) AS correct
      FROM cm GROUP BY lang),
    pred AS (SELECT g, SUM(n) AS predicted FROM cm GROUP BY g)
    SELECT s.lang,
           CAST(s.support AS BIGINT) AS support,
           CAST(COALESCE(p.predicted, 0) AS BIGINT) AS predicted,
           CAST(s.correct AS BIGINT) AS correct,
           CASE WHEN COALESCE(p.predicted, 0) = 0 THEN 0.0
                ELSE CAST((2000000 * s.correct + p.predicted)
                          // (2 * p.predicted) AS DOUBLE) / 1000000
           END AS precision,
           CAST((2000000 * s.correct + s.support) // (2 * s.support)
                AS DOUBLE) / 1000000 AS recall,
           CAST((2000000 * 2 * s.correct + (COALESCE(p.predicted, 0) + s.support))
                // (2 * (COALESCE(p.predicted, 0) + s.support)) AS DOUBLE)
               / 1000000 AS f1
    FROM sup s LEFT JOIN pred p ON p.g = s.lang
    """


@register(
    "text_langid_eval",
    sql=_langid_eval_sql(),
    doc="Per-language precision/recall/F1 scorecard of the lang-ID "
    "heuristic vs the labeled lang column. One corpus scan -> persisted "
    "(lang, guess) confusion aggregate; bounded joins; integer-exact "
    "6dp ratios (F1 as 2c/(p+s) keeps operands integral).",
)
def text_langid_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dsacord_spark.functions.text import lang_id

    d = table(spark, sf_dir, "documents")
    # persisted: support and predicted are DIFFERENT aggregates over this
    # frame (exchange reuse cannot dedupe them) — unpersisted, the corpus
    # scan + confusion shuffle would run twice. <= |langs|^2 rows.
    cm = (
        d.groupBy(F.col("lang"), lang_id("text").alias("g"))
        .agg(F.count(F.lit(1)).alias("n"))
        .persist()
    )
    sup = cm.groupBy("lang").agg(
        F.sum("n").alias("support"),
        F.sum(F.when(F.col("g") == F.col("lang"), F.col("n")).otherwise(0)).alias(
            "correct"
        ),
    )
    pred = cm.groupBy("g").agg(F.sum("n").alias("predicted"))
    j = sup.join(
        F.broadcast(pred), sup["lang"] == pred["g"], "left"
    ).withColumn("predicted", F.coalesce(F.col("predicted"), F.lit(0)))
    return j.select(
        "lang",
        F.col("support").cast("bigint").alias("support"),
        F.col("predicted").cast("bigint").alias("predicted"),
        F.col("correct").cast("bigint").alias("correct"),
        F.when(F.col("predicted") == 0, F.lit(0.0))
        .otherwise(
            F.expr(
                "(2000000 * correct + predicted) div (2 * predicted)"
            ).cast("double")
            / F.lit(1_000_000)
        )
        .alias("precision"),
        (
            F.expr("(2000000 * correct + support) div (2 * support)").cast(
                "double"
            )
            / F.lit(1_000_000)
        ).alias("recall"),
        (
            F.expr(
                "(2000000 * 2 * correct + (predicted + support))"
                " div (2 * (predicted + support))"
            ).cast("double")
            / F.lit(1_000_000)
        ).alias("f1"),
    )


# ---------------------------------------------------------------------------
# Curation attrition funnel: how many documents/tokens survive each gate
# of the standard curation pipeline, applied cumulatively in pipeline
# order — (0) raw corpus, (1) target-language gate (lang_id == 'en'),
# (2) quality gate (integer-tenths score >= 7), (3) exact dedup
# keep-canonical (min doc_id per normalized fingerprint AMONG the
# gate-1+2 survivors — dedup runs on what's left, the real pipeline
# order). THE planning table before burning a full 100 TB curation run.
# Scale: one corpus scan; the only shuffle is the fingerprint-keyed
# window (min survivor doc_id per fp — partitioned, never global); the
# funnel reduces to a ONE-ROW aggregate and the 4 output rows are
# exploded from it, so stage count never touches the corpus. Ratios are
# integer-round exact; zero denominators (empty corpus / empty stage)
# take the div0 guard on both engines.
# ---------------------------------------------------------------------------

_FUNNEL_QUALITY_MIN = 7
_FUNNEL_LANG = "en"


def _funnel_sql() -> str:
    from dsacord_spark.plans.analysis import (
        _FPRINT_SQL, _lang_id_sql, _quality10_sql,
    )

    q = _FUNNEL_QUALITY_MIN
    pct = (
        "CASE WHEN {d} = 0 THEN 0.0 ELSE "
        "CAST((2000000 * {n} + {d}) // (2 * {d}) AS DOUBLE) / 1000000 END"
    )
    return f"""
    WITH base AS (
      SELECT doc_id,
             {_FPRINT_SQL} AS fp,
             {_lang_id_sql('text')} = '{_FUNNEL_LANG}' AS l,
             {_quality10_sql('text')} >= {q} AS qok,
             len({_TOKS_SQL.format(c='text')}) AS n_toks
      FROM documents),
    w AS (
      SELECT doc_id, l, qok, n_toks,
             min(CASE WHEN l AND qok THEN doc_id END)
               OVER (PARTITION BY fp) AS m
      FROM base),
    agg AS (
      SELECT count(*) AS d0, COALESCE(SUM(n_toks), 0) AS t0,
             COALESCE(SUM(CASE WHEN l THEN 1 ELSE 0 END), 0) AS d1,
             COALESCE(SUM(CASE WHEN l THEN n_toks ELSE 0 END), 0) AS t1,
             COALESCE(SUM(CASE WHEN l AND qok THEN 1 ELSE 0 END), 0) AS d2,
             COALESCE(SUM(CASE WHEN l AND qok THEN n_toks ELSE 0 END), 0) AS t2,
             COALESCE(SUM(CASE WHEN l AND qok AND doc_id = m THEN 1 ELSE 0 END), 0) AS d3,
             COALESCE(SUM(CASE WHEN l AND qok AND doc_id = m THEN n_toks ELSE 0 END), 0) AS t3
      FROM w),
    st AS (
      SELECT * FROM (VALUES
        (0, 'all'), (1, 'lang'), (2, 'quality'), (3, 'dedup')
      ) AS v(stage, stage_name))
    SELECT st.stage, st.stage_name,
           CAST(CASE st.stage WHEN 0 THEN d0 WHEN 1 THEN d1
                WHEN 2 THEN d2 ELSE d3 END AS BIGINT) AS n_docs,
           CAST(CASE st.stage WHEN 0 THEN t0 WHEN 1 THEN t1
                WHEN 2 THEN t2 ELSE t3 END AS BIGINT) AS n_tokens,
           CASE st.stage
             WHEN 0 THEN CASE WHEN d0 = 0 THEN 0.0 ELSE 1.0 END
             WHEN 1 THEN {pct.format(n='d1', d='d0')}
             WHEN 2 THEN {pct.format(n='d2', d='d1')}
             ELSE {pct.format(n='d3', d='d2')}
           END AS pct_of_prev,
           CASE st.stage
             WHEN 0 THEN CASE WHEN d0 = 0 THEN 0.0 ELSE 1.0 END
             WHEN 1 THEN {pct.format(n='d1', d='d0')}
             WHEN 2 THEN {pct.format(n='d2', d='d0')}
             ELSE {pct.format(n='d3', d='d0')}
           END AS pct_of_total
    FROM st, agg
    """


@register(
    "corpus_curation_funnel",
    sql=_funnel_sql(),
    doc="Curation attrition funnel: docs/tokens surviving each pipeline "
    "gate cumulatively (raw -> lang_id target gate -> quality >= "
    f"{_FUNNEL_QUALITY_MIN} -> exact-dedup canonical among survivors), "
    "with integer-exact step and total retention. One scan; the only "
    "shuffle is the fingerprint-partitioned window; one-row aggregate "
    "-> 4 exploded rows.",
)
def corpus_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dsacord_spark.functions.text import (
        doc_fingerprint, lang_id, quality_score10, token_count,
    )

    d = table(spark, sf_dir, "documents")
    base = d.select(
        "doc_id",
        doc_fingerprint("text").alias("fp"),
        (lang_id("text") == _FUNNEL_LANG).alias("l"),
        (quality_score10("text") >= _FUNNEL_QUALITY_MIN).alias("qok"),
        token_count("text").alias("n_toks"),
    )
    wfp = W.partitionBy("fp")
    w = base.select(
        "doc_id",
        "l",
        "qok",
        "n_toks",
        F.min(
            F.when(F.col("l") & F.col("qok"), F.col("doc_id"))
        ).over(wfp).alias("m"),
    )
    surv = F.col("l") & F.col("qok") & (F.col("doc_id") == F.col("m"))
    agg = w.agg(
        F.count(F.lit(1)).alias("d0"),
        F.coalesce(F.sum("n_toks"), F.lit(0)).alias("t0"),
        F.coalesce(F.sum(F.when(F.col("l"), 1).otherwise(0)), F.lit(0)).alias("d1"),
        F.coalesce(
            F.sum(F.when(F.col("l"), F.col("n_toks")).otherwise(0)), F.lit(0)
        ).alias("t1"),
        F.coalesce(
            F.sum(F.when(F.col("l") & F.col("qok"), 1).otherwise(0)), F.lit(0)
        ).alias("d2"),
        F.coalesce(
            F.sum(
                F.when(F.col("l") & F.col("qok"), F.col("n_toks")).otherwise(0)
            ),
            F.lit(0),
        ).alias("t2"),
        F.coalesce(F.sum(F.when(surv, 1).otherwise(0)), F.lit(0)).alias("d3"),
        F.coalesce(
            F.sum(F.when(surv, F.col("n_toks")).otherwise(0)), F.lit(0)
        ).alias("t3"),
    )

    def _pct(n: str, dd: str):
        return F.when(F.col(dd) == 0, F.lit(0.0)).otherwise(
            F.expr(f"(2000000 * {n} + {dd}) div (2 * {dd})").cast("double")
            / F.lit(1_000_000)
        )

    stages = F.array(
        *[
            F.struct(
                F.lit(i).alias("stage"),
                F.lit(nm).alias("stage_name"),
                F.col(f"d{i}").cast("bigint").alias("n_docs"),
                F.col(f"t{i}").cast("bigint").alias("n_tokens"),
                (
                    F.when(F.col("d0") == 0, F.lit(0.0)).otherwise(F.lit(1.0))
                    if i == 0
                    else _pct(f"d{i}", f"d{i - 1}")
                ).alias("pct_of_prev"),
                (
                    F.when(F.col("d0") == 0, F.lit(0.0)).otherwise(F.lit(1.0))
                    if i == 0
                    else _pct(f"d{i}", "d0")
                ).alias("pct_of_total"),
            )
            for i, nm in enumerate(["all", "lang", "quality", "dedup"])
        ]
    )
    return agg.select(F.explode(stages).alias("s")).select(
        F.col("s.stage").cast("int").alias("stage"),
        "s.stage_name",
        "s.n_docs",
        "s.n_tokens",
        "s.pct_of_prev",
        "s.pct_of_total",
    )


# ---------------------------------------------------------------------------
# Embedding-cosine band histogram: the threshold-selection curve for
# embedding near-dup dedup / ANN cutoffs — pair-cosine distribution over
# all pairs of a deterministic md5-ordered 400-vector sample, bucketed
# into 0.05-wide bands with cumulative shares. Completes the dedup
# calibration triple (Jaccard threshold bands, SimHash Hamming radius,
# embedding cosine). Pair work capped at K^2/2 forever (sampling IS the
# scale design, the dedup_simhash_radius_calibration playbook); the
# sample plans as TakeOrderedAndProject; every fold is the
# functions/vectors double-promoted strict left-to-right accumulate, so
# cosines are bit-identical to DuckDB's list_dot_product over the same
# DOUBLE[] cast. Bands floor identical doubles -> identical ints; the
# +/-1.0 edge is clamped into the outermost bands on both engines.
# ---------------------------------------------------------------------------

_COSCAL_K = 400
_COSCAL_BANDS = 20  # bands per unit: band = floor(cos * 20), 0.05 wide


def _coscal_sql() -> str:
    from dsacord_spark.functions.hashing import md5_long_sql

    k = _COSCAL_BANDS
    return f"""
    WITH s AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
      FROM embeddings
      ORDER BY {md5_long_sql('CAST(vec_id AS VARCHAR)')} ASC, vec_id ASC
      LIMIT {_COSCAL_K}),
    vv AS (
      SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm
      FROM s WHERE list_dot_product(v, v) > 0),
    p AS (
      SELECT least({k - 1}, greatest({-k},
               CAST(floor(list_dot_product(a.v, b.v) / (a.nrm * b.nrm)
                          * {k}) AS INT))) AS band
      FROM vv a JOIN vv b ON a.vec_id < b.vec_id),
    h AS (SELECT band, count(*) AS n_pairs FROM p GROUP BY band),
    t AS (SELECT SUM(n_pairs) AS total FROM h),
    c AS (
      SELECT band, n_pairs,
             SUM(n_pairs) OVER (ORDER BY band ROWS UNBOUNDED PRECEDING)
               AS cum_pairs
      FROM h)
    SELECT CAST(band AS INT) AS band,
           CAST(band AS DOUBLE) / {k} AS band_lo,
           CAST(n_pairs AS BIGINT) AS n_pairs,
           CAST(cum_pairs AS BIGINT) AS cum_pairs,
           CAST((2000000 * cum_pairs + total) // (2 * total) AS DOUBLE)
               / 1000000 AS cum_share
    FROM c, t
    """


@register(
    "embed_cosine_band_histogram",
    sql=_coscal_sql(),
    doc="Embedding-cosine threshold-selection curve: pair-cosine "
    f"histogram (0.05 bands) with cumulative shares over all pairs of "
    f"a deterministic md5-ordered {_COSCAL_K}-vector sample — picks the "
    "near-dup / ANN cosine cutoff. K^2/2-bounded BNLJ; double-promoted "
    "order-pinned folds; integer-exact shares.",
)
def embed_cosine_band_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dsacord_spark.functions.hashing import md5_long
    from dsacord_spark.functions.vectors import dot, to_double_array

    e = table(spark, sf_dir, "embeddings")
    samp = (
        e.select(
            "vec_id",
            to_double_array("embedding").alias("v"),
            md5_long(F.col("vec_id").cast("string")).alias("hk"),
        )
        .orderBy(F.col("hk").asc(), F.col("vec_id").asc())
        .limit(_COSCAL_K)
        .select("vec_id", "v")
    )
    # persisted: the K-row normed frame feeds both nested-loop sides —
    # unpersisted, the corpus-wide top-K sample scan re-runs per side
    vv = (
        samp.filter(dot("v", "v") > 0)
        .withColumn("nrm", F.sqrt(dot("v", "v")))
        .persist()
    )
    a = vv.select(
        F.col("vec_id").alias("ia"), F.col("v").alias("va"),
        F.col("nrm").alias("na"),
    )
    b = vv.select(
        F.col("vec_id").alias("ib"), F.col("v").alias("vb"),
        F.col("nrm").alias("nb"),
    )
    k = _COSCAL_BANDS
    cos = dot("va", "vb") / (F.col("na") * F.col("nb"))
    pairs = a.join(F.broadcast(b), F.col("ia") < F.col("ib")).select(
        F.least(
            F.lit(k - 1),
            F.greatest(F.lit(-k), F.floor(cos * k).cast("int")),
        ).alias("band")
    )
    h = pairs.groupBy("band").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs")
    )
    t = h.agg(F.sum("n_pairs").alias("total"))
    wc = W.orderBy("band").rowsBetween(W.unboundedPreceding, W.currentRow)
    return (
        h.withColumn("cum_pairs", F.sum("n_pairs").over(wc).cast("bigint"))
        .crossJoin(F.broadcast(t))
        .select(
            F.col("band").cast("int").alias("band"),
            (F.col("band").cast("double") / k).alias("band_lo"),
            "n_pairs",
            "cum_pairs",
            (
                F.expr(
                    "(2000000 * cum_pairs + total) div (2 * total)"
                ).cast("double")
                / F.lit(1_000_000)
            ).alias("cum_share"),
        )
    )


# ---------------------------------------------------------------------------
# Seasonal-naive forecast scorecard: score the classic same-weekday-last-
# week baseline (f(d) = revenue(d-7)) against actual daily revenue, per
# ISO weekday — the eval table a demand-forecasting pipeline starts
# from (any model must beat this row). Error arithmetic stays in exact
# integer CENTS (daily revenue is a DECIMAL(18,2) sum; |r - f| in cents
# is an integer), so MAE and WAPE are integer-exact 6dp ratios; WAPE
# (sum|err| / sum actual) replaces per-day MAPE to dodge zero-revenue
# days. Scale: one orders scan -> per-day aggregate (O(days)); the
# d-7 self-join and the 7-row weekday aggregate are bounded by the
# calendar, not the corpus.
# ---------------------------------------------------------------------------


@register(
    "orders_forecast_eval",
    sql="""
    WITH daily AS (
      SELECT o_orderdate AS d,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
               AS cents
      FROM orders GROUP BY 1),
    paired AS (
      SELECT a.d, isodow(CAST(a.d AS TIMESTAMP)) AS dow,
             a.cents AS act, f.cents AS fc
      FROM daily a JOIN daily f ON f.d = a.d - INTERVAL 7 DAY),
    g AS (
      SELECT dow, count(*) AS n_days,
             SUM(abs(act - fc)) AS abs_err, SUM(act) AS act_sum
      FROM paired GROUP BY dow)
    SELECT CAST(dow AS INT) AS dow,
           CAST(n_days AS BIGINT) AS n_days,
           CAST(abs_err AS DOUBLE) / 100 AS mae_total,
           CASE WHEN act_sum = 0 THEN 0.0
                ELSE CAST((2000000 * abs_err + act_sum) // (2 * act_sum)
                          AS DOUBLE) / 1000000
           END AS wape
    FROM g
    """,
    doc="Seasonal-naive (same weekday last week) forecast scorecard per "
    "ISO weekday: paired days, total absolute error, and WAPE — exact "
    "integer-cents arithmetic throughout. One orders scan; everything "
    "past the per-day aggregate is O(days).",
)
def orders_forecast_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    # persisted: the d-7 self-join reads this aggregate on BOTH sides
    # and Spark does no CSE across self-join branches — unpersisted,
    # the corpus-linear orders scan runs twice (review finding; the
    # events_daily_autocorr playbook). O(days) rows; released by the
    # harness/bench at the family boundary like every catalog persist.
    daily = o.groupBy(F.col("o_orderdate").alias("d")).agg(
        (F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100)
        .cast("bigint")
        .alias("cents")
    ).persist()
    f_ = daily.select(
        F.date_add(F.col("d"), 7).alias("d"), F.col("cents").alias("fc")
    )
    paired = daily.join(f_, "d").select(
        _iso_dow("d").alias("dow"),
        F.col("cents").alias("act"),
        "fc",
    )
    # sums and the 2e6 rounding multiplier ride DECIMAL(38,0): Spark 4
    # ANSI throws on int64 overflow past ~4.6e12 summed error cents
    # (~$46B per weekday group — reachable at large SF) while DuckDB's
    # HUGEINT silently succeeds. The div quotient is 2e6 * WAPE — NOT
    # bounded by 2e6 (WAPE > 1 whenever errors exceed revenue) but
    # int64-safe until WAPE ~ 9.2e12, far past any meaningful value
    # (review finding; the autocorr playbook)
    g = paired.groupBy("dow").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum(
            F.abs(F.col("act") - F.col("fc")).cast("decimal(38,0)")
        ).alias("abs_err"),
        F.sum(F.col("act").cast("decimal(38,0)")).alias("act_sum"),
    )
    return g.select(
        F.col("dow").cast("int").alias("dow"),
        F.col("n_days").cast("bigint").alias("n_days"),
        (F.col("abs_err").cast("double") / 100).alias("mae_total"),
        # act_sum = 0 (a weekday whose paired days all had zero revenue)
        # would crash Spark ANSI div while DuckDB // returns NULL —
        # report 0.0 on both engines instead (review finding)
        F.when(F.col("act_sum") == 0, F.lit(0.0))
        .otherwise(
            F.expr(
                "(CAST(2000000 AS DECIMAL(38,0)) * abs_err + act_sum)"
                " div (2 * act_sum)"
            ).cast("double")
            / F.lit(1_000_000)
        )
        .alias("wape"),
    )


# ---------------------------------------------------------------------------
# Behavioral diversity (Gini-Simpson) per user: 1 - sum_i p_i^2 over the
# user's event-type distribution — the diversity diagnostic an abuse /
# bot filter keys on (single-action accounts score 0, uniform behavior
# scores (k-1)/k), and the ln()-free stand-in for Shannon entropy: the
# score is a RATIONAL in integer counts ((N^2 - sum n_i^2) / N^2), so it
# is cross-engine exact where entropy's log is a faithful-rounding
# hazard (registry determinism rules). One (user, type) shuffle with
# map-side combine, then a per-user aggregate; no windows, no joins.
# ---------------------------------------------------------------------------

_DIVERSITY_MIN_EVENTS = 20


@register(
    "events_type_diversity",
    sql=f"""
    WITH c AS (
      SELECT user_id, event_type, count(*) AS n
      FROM events GROUP BY 1, 2),
    u AS (
      SELECT user_id, SUM(n) AS nn, SUM(n * n) AS ssq,
             count(*) AS n_types
      FROM c GROUP BY user_id)
    SELECT user_id,
           CAST(nn AS BIGINT) AS n_events,
           CAST(n_types AS BIGINT) AS n_types,
           CAST((2000000 * (nn * nn - ssq) + nn * nn) // (2 * nn * nn)
                AS DOUBLE) / 1000000 AS diversity
    FROM u WHERE nn >= {_DIVERSITY_MIN_EVENTS}
    """,
    doc="Gini-Simpson behavioral diversity per user (1 - sum p_i^2 over "
    "event types; >= 20 events): the exact-rational, ln()-free entropy "
    "stand-in for bot/abuse triage. One (user,type) shuffle + per-user "
    "aggregate; integer-exact 6dp.",
)
def events_type_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    c = e.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("n"))
    # squares and the 2e6 rounding multiplier ride DECIMAL(38,0): a user
    # past ~2.14M events overflows the int64 formula under Spark 4 ANSI
    # (exactly the bot-scale population this entry targets) while
    # DuckDB's HUGEINT silently succeeds; the div quotient is <= 1e6 so
    # the bigint result is safe (review finding)
    u = c.groupBy("user_id").agg(
        F.sum(F.col("n").cast("decimal(38,0)")).alias("nn"),
        F.sum(F.col("n").cast("decimal(38,0)") * F.col("n")).alias("ssq"),
        F.count(F.lit(1)).alias("n_types"),
    )
    return u.filter(F.col("nn") >= _DIVERSITY_MIN_EVENTS).select(
        "user_id",
        F.col("nn").cast("bigint").alias("n_events"),
        F.col("n_types").cast("bigint").alias("n_types"),
        (
            F.expr(
                "(CAST(2000000 AS DECIMAL(38,0)) * (nn * nn - ssq)"
                " + nn * nn) div (2 * nn * nn)"
            ).cast("double")
            / F.lit(1_000_000)
        ).alias("diversity"),
    )


# ---------------------------------------------------------------------------
# MinHash-LSH band-bucket occupancy: per band, the histogram of bucket
# sizes and the candidate-pair cost each size class contributes
# (n_buckets * C(sz, 2)). THE pre-flight diagnostic for the quadratic
# hot-bucket failure this round's banded-joiner rework fixed: a bucket
# of K identical-signature docs costs K^2/2 candidate pairs, and this
# report shows that number before the join runs. Band hashing is in
# lockstep with dedup_minhash_lsh / dedup_minhash_calibration (same
# md5 band-hash construction over the same 32-perm signatures).
# Scale: signature shuffle (map-side partial mins), then strictly
# reducing groupBys; no joins at all. cand_pairs is computed in exact
# integer/decimal arithmetic and emitted as DOUBLE (exact below 2^53,
# graceful — never erroring — beyond; the Gramian-entry precedent),
# because a pathological bucket's pair count is exactly the number
# this report exists to expose and must not overflow int64.
# ---------------------------------------------------------------------------


def _minhash_bucket_load_sql(n_perm: int = 32, bands: int = 8) -> str:
    from dsacord_spark.functions.hashing import _perm_constants
    from dsacord_spark.plans.analysis import _ngr_cte, _perm_min_sql

    perms = _perm_constants(n_perm)
    mins = ",\n             ".join(
        _perm_min_sql(i, a, b) for i, (a, b) in enumerate(perms)
    )
    band_rows = _minhash_band_rows_sql(n_perm, bands)
    return f"""
    WITH {_ngr_cte(3).strip()},
    sig AS (SELECT doc, {mins} FROM ngr GROUP BY doc),
    bands AS ({band_rows}),
    bucket AS (
      SELECT band_idx, band_hash, count(*) AS sz
      FROM bands GROUP BY 1, 2)
    SELECT CAST(band_idx AS INT) AS band_idx,
           CAST(sz AS BIGINT) AS bucket_size,
           CAST(count(*) AS BIGINT) AS n_buckets,
           CAST(sz * count(*) AS BIGINT) AS n_docs,
           -- HUGEINT promotion: sz comes from count(*) (BIGINT) and
           -- sz*(sz-1) would ERROR past ~3e9 members without it, the
           -- same hazard the Spark side dodges with DECIMAL(38,0) / 2
           CAST(count(*) * (CAST(sz AS HUGEINT) * (sz - 1) // 2)
                AS DOUBLE) AS cand_pairs
    FROM bucket GROUP BY band_idx, sz
    """


@register(
    "dedup_minhash_bucket_load",
    sql=_minhash_bucket_load_sql(32, 8),
    doc="MinHash-LSH band-bucket occupancy histogram with per-size-class "
    "candidate-pair cost (n_buckets * C(sz,2)) — the pre-flight "
    "hot-bucket diagnostic for the LSH join. Band hashing in lockstep "
    "with dedup_minhash_lsh; no joins, strictly reducing aggregates.",
)
def dedup_minhash_bucket_load(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dsacord_spark.operators.dedup import minhash_bands, minhash_signatures

    n_perm, bands = 32, 8
    d = table(spark, sf_dir, "documents")
    sig = minhash_signatures(d, "doc_id", "text", 3, n_perm)
    bucket = (
        minhash_bands(sig, n_perm, bands)
        .groupBy("band_idx", "band_hash")
        .agg(F.count(F.lit(1)).alias("sz"))
    )
    return bucket.groupBy("band_idx", "sz").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_buckets"),
        (F.col("sz") * F.count(F.lit(1))).cast("bigint").alias("n_docs"),
        # `/ 2`, NOT `div 2`: Spark's div always returns BIGINT, so the
        # decimal halving would silently WRAP for a bucket past ~4.3e9
        # members — the exact pathological regime this report exposes
        # (review finding, live-verified). The product is always even,
        # so decimal `/` is exact; DuckDB's HUGEINT `//` agrees.
        F.expr(
            "CAST(CAST(count(1) AS DECIMAL(38,0))"
            " * (CAST(sz AS DECIMAL(38,0)) * (sz - 1) / 2) AS DOUBLE)"
        ).alias("cand_pairs"),
    ).select(
        F.col("band_idx").cast("int").alias("band_idx"),
        F.col("sz").cast("bigint").alias("bucket_size"),
        "n_buckets",
        "n_docs",
        "cand_pairs",
    )


# ---------------------------------------------------------------------------
# Event-arrival burstiness per event_type: the Fano factor
# (variance/mean) of per-minute arrival counts over the observed span,
# zero-count minutes included — the capacity-planning number that
# separates Poisson-ish traffic (fano ~ 1) from bursty spikes
# (fano >> 1). Deliberately NOT events_burstiness_fano (per-USER, over
# that user's ACTIVE hours only — bot triage): this one keys on
# event_type at minute grain and counts the EMPTY minutes in the span,
# which is the correct arrival-process treatment for sizing stream
# capacity — a type firing 60k events in one minute of a quiet day is
# maximally bursty here but looks Poisson if idle periods are dropped. All arithmetic exact: counts are integers, the span is
# minutes between the minute-truncated min/max (UTC-pinned session, so
# truncation matches DuckDB), and fano renders via the integer half-up
# 6dp formula over fano = (n*S2 - S^2) / (n*S) with S = sum of counts,
# S2 = sum of squared counts (zero minutes contribute nothing to
# either, so active-minute sums suffice). Sums ride DECIMAL(38,0): n*S2
# overflows int64 under Spark 4 ANSI at high-rate types (~2^63 at
# ~1e5 minutes x 3e6-events-per-minute squared) while DuckDB's HUGEINT
# silently succeeds (the diversity/WAPE playbook). Cauchy-Schwarz makes
# the numerator non-negative. Scale: one (type, minute) shuffle with
# map-side combine, then a per-type aggregate — O(types) output rows.
# ---------------------------------------------------------------------------


@register(
    "events_arrival_burstiness",
    sql="""
    WITH m AS (
      SELECT event_type,
             date_trunc('minute', CAST(ts AS TIMESTAMP)) AS mn,
             count(*) AS c
      FROM events GROUP BY 1, 2),
    g AS (
      SELECT event_type, min(mn) AS mn0, max(mn) AS mn1,
             count(*) AS active, SUM(c) AS sc, SUM(c * c) AS sc2,
             MAX(c) AS peak
      FROM m GROUP BY 1),
    x AS (
      SELECT event_type, active, sc, sc2, peak,
             datediff('minute', mn0, mn1) + 1 AS n
      FROM g)
    SELECT event_type,
           CAST(sc AS BIGINT) AS n_events,
           CAST(active AS BIGINT) AS active_minutes,
           CAST(n AS BIGINT) AS span_minutes,
           CAST(peak AS BIGINT) AS peak_per_minute,
           CAST((2000000 * (n * sc2 - sc * sc) + n * sc) // (2 * n * sc)
                AS DOUBLE) / 1000000 AS fano
    FROM x
    """,
    doc="Arrival burstiness per event_type: exact Fano factor "
    "(variance/mean of per-minute counts over the observed span, empty "
    "minutes included), active/span minutes and peak rate — Poisson "
    "traffic scores ~1, bursty spikes >> 1. One (type, minute) shuffle "
    "+ O(types) aggregate; DECIMAL-exact integer arithmetic.",
)
def events_arrival_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    m = e.groupBy(
        "event_type", F.date_trunc("minute", F.col("ts")).alias("mn")
    ).agg(F.count(F.lit(1)).alias("c"))
    g = m.groupBy("event_type").agg(
        F.min("mn").alias("mn0"),
        F.max("mn").alias("mn1"),
        F.count(F.lit(1)).alias("active"),
        F.sum(F.col("c").cast("decimal(38,0)")).alias("sc"),
        F.sum(F.col("c").cast("decimal(38,0)") * F.col("c")).alias("sc2"),
        F.max("c").alias("peak"),
    )
    x = g.withColumn(
        "n",
        F.expr("timestampdiff(MINUTE, mn0, mn1) + 1").cast("decimal(38,0)"),
    )
    return x.select(
        "event_type",
        F.col("sc").cast("bigint").alias("n_events"),
        F.col("active").cast("bigint").alias("active_minutes"),
        F.col("n").cast("bigint").alias("span_minutes"),
        F.col("peak").cast("bigint").alias("peak_per_minute"),
        (
            F.expr(
                "(CAST(2000000 AS DECIMAL(38,0)) * (n * sc2 - sc * sc)"
                " + n * sc) div (2 * n * sc)"
            ).cast("double")
            / F.lit(1_000_000)
        ).alias("fano"),
    )


# ---------------------------------------------------------------------------
# Round-7 additions (registered at the tail — the rotation contract).
#
# CLUSTER-MODE dedup outputs: the r6 verdict's #1 ask. The pair-list
# entries (dedup_simhash, multimodal_*_fingerprint_dedup) answer "which
# pairs are near-dups" — inherently C(K,2) rows for a K-identical
# cluster, unwritable for one viral meme cluster at web scale. The
# pipeline-consumable product is the O(n) assignment table
# (id, cluster_id, canonical_id) from operators/dedup.
# hash_cluster_assignments: hash-level banded pairs -> connected
# components over DISTINCT hashes -> one label join back to members.
# ---------------------------------------------------------------------------


def _simhash_clusters_sql() -> str:
    # signature CTEs interpolated from the shared definition
    # (analysis._simhash_sig_ctes — the dedup_simhash lockstep rule);
    # components via the recursive-CTE pattern of dedup_components,
    # singletons re-attached with the LEFT JOIN of dedup_keep_canonical.
    from dsacord_spark.plans.analysis import _simhash_sig_ctes

    return f"""
    WITH RECURSIVE {_simhash_sig_ctes('documents').strip()},
    pairs AS (
      SELECT a.doc AS src, b.doc AS dst FROM sig a JOIN sig b ON a.doc < b.doc
      WHERE bit_count(xor(a.simhash, b.simhash)) <= 3),
    edges AS (SELECT src, dst FROM pairs UNION SELECT dst, src FROM pairs),
    reach(node, lab) AS (
      SELECT DISTINCT src, src FROM edges
      UNION
      SELECT e.src, r.lab FROM edges e JOIN reach r ON r.node = e.dst),
    comp AS (SELECT node, MIN(lab) AS cid FROM reach GROUP BY node)
    SELECT s.doc AS doc_id,
           COALESCE(c.cid, s.doc) AS cluster_id,
           COALESCE(c.cid, s.doc) AS canonical_id
    FROM sig s LEFT JOIN comp c ON c.node = s.doc
    """


@register(
    "dedup_simhash_clusters",
    sql=_simhash_clusters_sql(),
    doc="CLUSTER-MODE SimHash dedup: one (doc_id, cluster_id, "
    "canonical_id) row per document — the O(n) assignment table a real "
    "pipeline consumes instead of dedup_simhash's C(K,2) pair list. "
    "Spark: banded LSH pairs over DISTINCT 60-bit signatures, connected "
    "components over hashes (auto propagation + large-star/small-star "
    "fallback), one label join back; oracle: brute-force pairs + "
    "recursive-CTE components — provably equal labelings.",
)
def dedup_simhash_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dsacord_spark.operators.dedup import (
        SIMHASH_BITS, hash_cluster_assignments, simhash_signatures,
    )

    d = table(spark, sf_dir, "documents")
    # persisted like simhash_pairs' signature frame: members + the
    # distinct-hash side both read it, and the 60-bit signature
    # expression is the dominant cost (released at the family boundary)
    sig = simhash_signatures(d, "doc_id", "text").persist()
    out = hash_cluster_assignments(
        sig, "doc", "simhash", n_bands=4, radius=3, hash_bits=SIMHASH_BITS
    )
    return out.select(
        F.col("media_id").alias("doc_id"), "cluster_id", "canonical_id"
    )


@register(
    "multimodal_phash_clusters",
    sql="""
    WITH img AS (
      SELECT doc_id AS media_id, md5(text) AS tkey
      FROM documents WHERE doc_id % 3 = 0),
    allm AS (
      SELECT media_id, tkey FROM img
      UNION ALL
      SELECT -(media_id + 1) AS media_id, tkey FROM img
      WHERE media_id % 30 = 0)
    SELECT media_id,
           MIN(media_id) OVER (PARTITION BY tkey) AS cluster_id,
           MIN(media_id) OVER (PARTITION BY tkey) AS canonical_id
    FROM allm
    """,
    doc="CLUSTER-MODE image dedup over REAL decoded pixels: the "
    "multimodal_phash_dedup fixture (planted twins at -(id+1), every "
    "30th image) emitted as O(n) (media_id, cluster_id, canonical_id) "
    "assignments instead of member pairs. FULL value oracle despite the "
    "Python dHash kernel: the synthesized media are a pure function of "
    "document text, the planted BMP edit moves the dHash <= 2 bits "
    "(always within radius 3) and PNG twins are byte-identical, so the "
    "Hamming components equal the text-equality groups with twins "
    "attached — which DuckDB computes structurally from `documents` "
    "(verified pairwise-identical across sf0.001/0.01/0.1; a cross-text "
    "near-collision would need two 64-bit dHashes within 3 bits, "
    "~2e-15/pair).",
)
def multimodal_phash_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dsacord_spark.multimodal.binary import (
        image_dhash, perturb_images, synthesize_real_media,
    )
    from dsacord_spark.operators.dedup import hash_cluster_assignments
    from dsacord_spark.plans.advanced import (
        _PHASH_BANDS, _PHASH_RADIUS, _PHASH_TWIN_EVERY,
    )

    d = table(spark, sf_dir, "documents")
    media = synthesize_real_media(d).filter(F.col("modality") == "image")
    twins = perturb_images(
        media.filter(F.col("media_id") % _PHASH_TWIN_EVERY == 0)
    ).withColumn("media_id", -(F.col("media_id") + F.lit(1)))
    # persisted across the banded stages like the pair entry (pixel
    # decode + hash kernel is the dominant cost; family boundary frees)
    hashed = (
        image_dhash(media.unionByName(twins))
        .filter(F.col("dhash").isNotNull())
        .persist()
    )
    return hash_cluster_assignments(
        hashed, "media_id", "dhash", _PHASH_BANDS, _PHASH_RADIUS, 64
    )


# ---------------------------------------------------------------------------
# Hot-bucket pre-flight for the HAMMING-banded joiner (r6 verdict #6):
# dedup_minhash_bucket_load profiles the MinHash band join; this is the
# same n_buckets x C(sz,2) histogram over banded_hash_pairs' own band
# split (operators/dedup._band_rows — one definition, joiner and
# diagnostic cannot drift), run over the 60-bit SimHash signatures the
# simhash joiner actually bands. The report that tells an operator what
# `bucket_cap` to pass BEFORE the join runs.
# ---------------------------------------------------------------------------


def _simhash_bucket_load_sql() -> str:
    from dsacord_spark.plans.analysis import _simhash_sig_ctes

    width = 60 // 4
    mask = (1 << width) - 1
    return f"""
    WITH {_simhash_sig_ctes('documents').strip()},
    u AS (SELECT DISTINCT simhash FROM sig),
    b AS (
      SELECT t.band_no, (simhash >> ({width} * t.band_no)) & {mask} AS band_val
      FROM u, unnest([0, 1, 2, 3]) AS t(band_no)),
    bucket AS (
      SELECT band_no, band_val, count(*) AS sz FROM b GROUP BY 1, 2)
    SELECT CAST(band_no AS INT) AS band_no,
           CAST(sz AS BIGINT) AS bucket_size,
           CAST(count(*) AS BIGINT) AS n_buckets,
           CAST(sz * count(*) AS BIGINT) AS n_hashes,
           -- HUGEINT promotion: same hazard note as the minhash twin
           CAST(count(*) * (CAST(sz AS HUGEINT) * (sz - 1) // 2)
                AS DOUBLE) AS cand_pairs
    FROM bucket GROUP BY band_no, sz
    """


@register(
    "dedup_simhash_bucket_load",
    sql=_simhash_bucket_load_sql(),
    doc="Hamming-banded band-bucket occupancy histogram over DISTINCT "
    "60-bit SimHash signatures (4 x 15-bit bands — the simhash joiner's "
    "own split via the shared _band_rows definition) with per-size-class "
    "candidate-pair cost: the pre-flight diagnostic that sizes "
    "`bucket_cap` for banded_hash_pairs. No joins, strictly reducing "
    "aggregates.",
)
def dedup_simhash_bucket_load(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dsacord_spark.operators.dedup import (
        SIMHASH_BITS, banded_bucket_load, simhash_signatures,
    )

    d = table(spark, sf_dir, "documents")
    sig = simhash_signatures(d, "doc_id", "text")
    uniq = sig.select("simhash").distinct()
    return banded_bucket_load(uniq, "simhash", 4, SIMHASH_BITS)


# ---------------------------------------------------------------------------
# Round-8 addition (registered at the tail — the rotation contract).
#
# The curate CLI's complete dedup product, value-checked cross-engine:
# dedup_corpus(method='simhash') = cluster-mode assignments (the
# dedup_simhash_clusters labeling) PLUS the keep selection (longest
# text wins, doc_id breaks ties — since r8 a map-side-combined min_by
# aggregate, not a per-cluster window sort). This entry pins the
# library/CLI path end-to-end: a regression in the banding, the
# component labeling, OR the keep aggregate hash-mismatches.
# ---------------------------------------------------------------------------


def _curate_keep_sql() -> str:
    # same signature/component CTEs as dedup_simhash_clusters (lockstep
    # rule: one definition, interpolated), plus the keep ranking
    from dsacord_spark.plans.analysis import _simhash_sig_ctes

    return f"""
    WITH RECURSIVE {_simhash_sig_ctes('documents').strip()},
    pairs AS (
      SELECT a.doc AS src, b.doc AS dst FROM sig a JOIN sig b ON a.doc < b.doc
      WHERE bit_count(xor(a.simhash, b.simhash)) <= 3),
    edges AS (SELECT src, dst FROM pairs UNION SELECT dst, src FROM pairs),
    reach(node, lab) AS (
      SELECT DISTINCT src, src FROM edges
      UNION
      SELECT e.src, r.lab FROM edges e JOIN reach r ON r.node = e.dst),
    comp AS (SELECT node, MIN(lab) AS cid FROM reach GROUP BY node),
    lab AS (
      -- from documents, not sig: a token-less doc has no signature
      -- (sig's size(hs)>0 filter) but dedup_corpus still labels it a
      -- kept singleton via its left join — mirror that (r8 review)
      SELECT dd.doc_id, COALESCE(c.cid, dd.doc_id) AS cluster_id
      FROM documents dd LEFT JOIN comp c ON c.node = dd.doc_id),
    ranked AS (
      SELECT l.doc_id, l.cluster_id,
             row_number() OVER (PARTITION BY l.cluster_id
                 ORDER BY length(d.text) DESC, l.doc_id ASC) AS rn
      FROM lab l JOIN documents d ON d.doc_id = l.doc_id)
    SELECT doc_id, cluster_id, rn = 1 AS kept FROM ranked
    """


@register(
    "curate_keep_selection",
    sql=_curate_keep_sql(),
    doc="The curate CLI's full dedup product (dedup_corpus, "
    "method=simhash): per document its Hamming-component cluster_id "
    "and the kept flag — longest text per cluster wins, doc_id breaks "
    "ties. Spark computes the keep with a map-side-combined min_by "
    "aggregate joined back (no per-cluster window sort — the r8 skew "
    "fix); the oracle brute-forces pairs, labels components with a "
    "recursive CTE, and ranks with a window — provably equal output.",
)
def curate_keep_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dsacord_spark.curate import dedup_corpus

    d = table(spark, sf_dir, "documents")
    return dedup_corpus(d, method="simhash").select(
        "doc_id", "cluster_id", "kept"
    )


# ---------------------------------------------------------------------------
# Incremental dedup probe: today's batch vs the accumulated corpus —
# the daily-ingest question ("which new docs duplicate something we
# already hold?") answered WITHOUT re-banding the corpus against
# itself. Batch = doc_id % 10 == 0, index = the rest (deterministic,
# both engines). All heavy frames hash-sized (see
# operators/dedup.incremental_hamming_matches); at production scale the
# per-hash index summary persists with the lake and is append-only.
# ---------------------------------------------------------------------------


def _incremental_probe_sql() -> str:
    from dsacord_spark.plans.analysis import _simhash_sig_ctes

    return f"""
    WITH {_simhash_sig_ctes('documents').strip()},
    bat AS (SELECT s.doc, s.simhash FROM sig s WHERE s.doc % 10 = 0),
    idx AS (SELECT s.doc, s.simhash FROM sig s WHERE s.doc % 10 <> 0),
    m AS (
      SELECT b.doc AS bdoc,
             MIN(bit_count(xor(b.simhash, i.simhash))) AS best_h,
             MIN(i.doc) AS mid
      FROM bat b JOIN idx i
        ON bit_count(xor(b.simhash, i.simhash)) <= 3
      GROUP BY b.doc)
    SELECT b.doc AS doc_id,
           m.bdoc IS NOT NULL AS is_dup,
           m.mid AS match_id,
           CAST(m.best_h AS INT) AS best_hamming
    FROM bat b LEFT JOIN m ON m.bdoc = b.doc
    """


@register(
    "dedup_incremental_probe",
    sql=_incremental_probe_sql(),
    doc="Incremental near-dup probe: each NEW-batch doc (doc_id % 10 = "
    "0) matched against the existing corpus index (the rest) at SimHash "
    "Hamming <= 3 — (doc_id, is_dup, min matching index id, best "
    "hamming). Spark: banded batch x index join over DISTINCT hashes "
    "with a per-hash index summary (hash-sized frames, one member "
    "stamp); oracle: brute-force batch x index. The daily-ingest shape: "
    "probe cost tracks the batch, never the corpus.",
)
def dedup_incremental_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dsacord_spark.operators.dedup import (
        SIMHASH_BITS, incremental_hamming_matches, simhash_signatures,
    )

    d = table(spark, sf_dir, "documents")
    # simhash_signatures emits (doc, simhash); persisted because the
    # batch/index splits and the distinct-hash band sides all re-read it
    sig = simhash_signatures(d, "doc_id", "text").persist()
    batch = sig.filter(F.col("doc") % 10 == 0)
    index = sig.filter(F.col("doc") % 10 != 0)
    return incremental_hamming_matches(
        index, batch, "doc", "simhash",
        n_bands=4, radius=3, hash_bits=SIMHASH_BITS,
    ).withColumnRenamed("doc", "doc_id")


@register(
    "stream_incremental_dedup",
    sql=_incremental_probe_sql(),  # per-doc probes are independent, so
    # the union of per-micro-batch probe outputs == the batch probe —
    # the SAME oracle value-checks the real streaming path
    doc="dedup_incremental_probe on the real streaming path: the new "
    "batch arrives in micro-batches (maxFilesPerTrigger=1) and each is "
    "probed inside foreachBatch against the STATIC per-hash index "
    "summary — the production backfill-vs-lake shape: the summary and "
    "its band rows are computed once and persisted, so per-micro-batch "
    "cost is the batch's own banding plus a scan of the hash-sized "
    "index frames. Output and oracle identical to the batch entry "
    "because per-doc matches are independent of batching.",
)
def stream_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dsacord_spark.operators.dedup import (
        SIMHASH_BITS, _band_rows, _hamming_probe_tail, simhash_signatures,
    )
    from dsacord_spark.streaming.pipeline import run_bounded_stream

    d = table(spark, sf_dir, "documents")
    # the index side is computed ONCE (the r8 review caught the closure
    # re-running the summary groupBy per micro-batch against the doc's
    # 'index computed once' claim). r13: eager localCheckpoint instead
    # of persist (guide §5 "cheaper way to cut lineage") — a persisted
    # frame still carries its FULL logical plan, and foreachBatch
    # re-analyzes the probe plan per micro-batch, so every batch re-paid
    # the analyzer walk over the 60-sum signature subtree (~340 ms/plan
    # build measured). Truncating lineage makes the per-batch plan
    # shallow: interleaved same-session A/B min-of-3 3.48 -> 2.90s
    # (0.83x, all reps better, output parity exact). The checkpoint
    # blocks are batch-sized, unreferenced once the entry returns (the
    # stream's output is staged through parquet), and reclaimed by the
    # ContextCleaner — the cache-hygiene tests are baseline-relative
    # for exactly this class of blocks. Fault-tolerance trade per §5:
    # at production scale the per-hash summary is a persisted lake
    # table (build_hamming_index), not a recomputable lineage.
    sig = simhash_signatures(d, "doc_id", "text").localCheckpoint(
        eager=True
    )
    batch = sig.filter(F.col("doc") % 10 == 0).repartition(4)
    idx_min = (
        sig.filter(F.col("doc") % 10 != 0)
        .select(F.col("doc").alias("_iid"), F.col("simhash").alias("_ih"))
        .groupBy("_ih")
        .agg(F.min("_iid").alias("_i_min"))
        .localCheckpoint(eager=True)
    )
    ib = _band_rows(
        idx_min.select(F.col("_ih").alias("_h")), "_h", 4, SIMHASH_BITS
    ).localCheckpoint(eager=True)

    def probe(b: DataFrame) -> DataFrame:
        return _hamming_probe_tail(
            b, "doc", "simhash", idx_min, ib,
            n_bands=4, radius=3, hash_bits=SIMHASH_BITS, bucket_cap=None,
        )

    out = run_bounded_stream(
        spark,
        batch.select("doc", "simhash"),
        lambda s: s,
        reader_options={"maxFilesPerTrigger": "1"},
        batch_transform=probe,
    )
    return out.withColumnRenamed("doc", "doc_id")


def _incremental_minhash_sql(
    n_perm: int = 32, bands: int = 8, threshold: float = 0.5
) -> str:
    # signature/band construction interpolated from the shared
    # definitions (_ngr_cte / _perm_min_sql / _minhash_band_rows_sql —
    # the minhash lockstep rule), so the oracle reproduces the LSH
    # candidates exactly: banded recall is probabilistic, and a
    # brute-force oracle would "find" pairs the banding legitimately
    # misses (same contract as dedup_minhash_lsh)
    from dsacord_spark.functions.hashing import _perm_constants
    from dsacord_spark.plans.analysis import _ngr_cte, _perm_min_sql

    mins = ",\n             ".join(
        _perm_min_sql(i, a, b)
        for i, (a, b) in enumerate(_perm_constants(n_perm))
    )
    band_rows = _minhash_band_rows_sql(n_perm, bands)
    return f"""
    WITH {_ngr_cte(3).strip()},
    sig AS (SELECT doc, {mins} FROM ngr GROUP BY doc),
    bands AS ({band_rows}),
    cand AS (
      SELECT DISTINCT bb.doc AS bdoc, ib.doc AS idoc
      FROM (SELECT * FROM bands WHERE doc % 10 = 0) bb
      JOIN (SELECT * FROM bands WHERE doc % 10 <> 0) ib
        ON bb.band_idx = ib.band_idx AND bb.band_hash = ib.band_hash),
    sizes AS (SELECT doc, count(*) AS sz FROM ngr GROUP BY doc),
    inter AS (
      SELECT c.bdoc, c.idoc, count(*) AS i
      FROM cand c
      JOIN ngr a ON a.doc = c.bdoc
      JOIN ngr b ON b.doc = c.idoc AND b.hg = a.hg
      GROUP BY c.bdoc, c.idoc),
    j AS (
      SELECT i.bdoc, i.idoc,
             CAST(i.i AS DOUBLE) / (sa.sz + sb.sz - i.i) AS jac
      FROM inter i
      JOIN sizes sa ON sa.doc = i.bdoc
      JOIN sizes sb ON sb.doc = i.idoc),
    m AS (
      SELECT bdoc, MIN(idoc) AS mid, round(MAX(jac), 6) AS bj
      FROM j WHERE jac >= {threshold} GROUP BY bdoc)
    SELECT d.doc_id,
           m.bdoc IS NOT NULL AS is_dup,
           m.mid AS match_id,
           m.bj AS best_jaccard
    FROM (SELECT doc_id FROM documents WHERE doc_id % 10 = 0) d
    LEFT JOIN m ON m.bdoc = d.doc_id
    """


@register(
    "dedup_incremental_minhash",
    sql=_incremental_minhash_sql(),
    doc="Incremental near-dup probe, Jaccard edition: each NEW-batch "
    "doc (doc_id % 10 = 0) matched against the existing corpus at "
    "n-gram Jaccard >= 0.5 via MinHash-banded batch x index candidates "
    "+ exact verify — (doc_id, is_dup, min matching index id, best "
    "jaccard). Oracle reproduces the banding bit-for-bit (shared "
    "constants), so LSH recall is part of the checked contract; "
    "completes the incremental family (Hamming twin: "
    "dedup_incremental_probe).",
)
def dedup_incremental_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dsacord_spark.operators.dedup import incremental_minhash_matches

    d = table(spark, sf_dir, "documents")
    batch = d.filter(F.col("doc_id") % 10 == 0)
    index = d.filter(F.col("doc_id") % 10 != 0)
    return incremental_minhash_matches(
        index, batch, "doc_id", "text", n=3, n_perm=32, bands=8,
        threshold=0.5,
    )


# ---------------------------------------------------------------------------
# r10: the RETRY shape of the incremental probes — batch and index
# OVERLAP (a replayed run probes against a corpus that already holds its
# own docs) and the probe excludes self-evidence instead of reporting
# every shared doc as a duplicate of itself. These value-oracle the
# exclude_self semantics the daily curate loop's idempotence rests on
# (curate.dedup_incremental; r9 verdict item 1). Batch = doc_id % 10 = 0;
# index = doc_id % 10 <> 3, so EVERY batch doc also sits in the index
# (and most genuine cross-duplicates remain available).
# ---------------------------------------------------------------------------


def _incremental_probe_selfsafe_sql() -> str:
    from dsacord_spark.plans.analysis import _simhash_sig_ctes

    # the in-memory Hamming exclusion is a member-level ANTI-JOIN of the
    # batch's ids out of the index side (exact); the oracle states it as
    # the WHERE on idx
    return f"""
    WITH {_simhash_sig_ctes('documents').strip()},
    bat AS (SELECT s.doc, s.simhash FROM sig s WHERE s.doc % 10 = 0),
    idx AS (SELECT s.doc, s.simhash FROM sig s
            WHERE s.doc % 10 <> 3 AND s.doc % 10 <> 0),
    m AS (
      SELECT b.doc AS bdoc,
             MIN(bit_count(xor(b.simhash, i.simhash))) AS best_h,
             MIN(i.doc) AS mid
      FROM bat b JOIN idx i
        ON bit_count(xor(b.simhash, i.simhash)) <= 3
      GROUP BY b.doc)
    SELECT b.doc AS doc_id,
           m.bdoc IS NOT NULL AS is_dup,
           m.mid AS match_id,
           CAST(m.best_h AS INT) AS best_hamming
    FROM bat b LEFT JOIN m ON m.bdoc = b.doc
    """


@register(
    "dedup_incremental_probe_selfsafe",
    sql=_incremental_probe_selfsafe_sql(),
    doc="dedup_incremental_probe's RETRY shape (r10): the batch (doc_id "
    "% 10 = 0) is fully contained in the index (doc_id % 10 <> 3) — a replayed run "
    "probing a corpus that already holds its own docs. exclude_self "
    "anti-joins the batch's ids out of the index members, so a doc is a "
    "dup only on OTHER-doc evidence; without it every shared doc "
    "matches itself at Hamming 0 and a retried curate run silently "
    "empties its kept set.",
)
def dedup_incremental_probe_selfsafe(
    spark: SparkSession, sf_dir: str,
) -> DataFrame:
    from dsacord_spark.operators.dedup import (
        SIMHASH_BITS, incremental_hamming_matches, simhash_signatures,
    )

    d = table(spark, sf_dir, "documents")
    sig = simhash_signatures(d, "doc_id", "text").persist()
    batch = sig.filter(F.col("doc") % 10 == 0)
    index = sig.filter(F.col("doc") % 10 != 3)
    return incremental_hamming_matches(
        index, batch, "doc", "simhash",
        n_bands=4, radius=3, hash_bits=SIMHASH_BITS, exclude_self=True,
    ).withColumnRenamed("doc", "doc_id")


def _incremental_minhash_selfsafe_sql(
    n_perm: int = 32, bands: int = 8, threshold: float = 0.5
) -> str:
    # same interpolated banding as _incremental_minhash_sql (lockstep
    # rule); the minhash exclusion is PAIR-level (bdoc <> idoc at the
    # candidate stage — member-exact on both probe paths), so a shared
    # doc can still be matched by a DIFFERENT index doc
    from dsacord_spark.functions.hashing import _perm_constants
    from dsacord_spark.plans.analysis import _ngr_cte, _perm_min_sql

    mins = ",\n             ".join(
        _perm_min_sql(i, a, b)
        for i, (a, b) in enumerate(_perm_constants(n_perm))
    )
    band_rows = _minhash_band_rows_sql(n_perm, bands)
    return f"""
    WITH {_ngr_cte(3).strip()},
    sig AS (SELECT doc, {mins} FROM ngr GROUP BY doc),
    bands AS ({band_rows}),
    cand AS (
      SELECT DISTINCT bb.doc AS bdoc, ib.doc AS idoc
      FROM (SELECT * FROM bands WHERE doc % 10 = 0) bb
      JOIN (SELECT * FROM bands WHERE doc % 10 <> 3) ib
        ON bb.band_idx = ib.band_idx AND bb.band_hash = ib.band_hash
       AND bb.doc <> ib.doc),
    sizes AS (SELECT doc, count(*) AS sz FROM ngr GROUP BY doc),
    inter AS (
      SELECT c.bdoc, c.idoc, count(*) AS i
      FROM cand c
      JOIN ngr a ON a.doc = c.bdoc
      JOIN ngr b ON b.doc = c.idoc AND b.hg = a.hg
      GROUP BY c.bdoc, c.idoc),
    j AS (
      SELECT i.bdoc, i.idoc,
             CAST(i.i AS DOUBLE) / (sa.sz + sb.sz - i.i) AS jac
      FROM inter i
      JOIN sizes sa ON sa.doc = i.bdoc
      JOIN sizes sb ON sb.doc = i.idoc),
    m AS (
      SELECT bdoc, MIN(idoc) AS mid, round(MAX(jac), 6) AS bj
      FROM j WHERE jac >= {threshold} GROUP BY bdoc)
    SELECT d.doc_id,
           m.bdoc IS NOT NULL AS is_dup,
           m.mid AS match_id,
           m.bj AS best_jaccard
    FROM (SELECT doc_id FROM documents WHERE doc_id % 10 = 0) d
    LEFT JOIN m ON m.bdoc = d.doc_id
    """


@register(
    "dedup_incremental_minhash_selfsafe",
    sql=_incremental_minhash_selfsafe_sql(),
    doc="dedup_incremental_minhash's RETRY shape (r10): batch (doc_id % "
    "10 = 0) is fully contained in the index (doc_id % 10 <> 3) and exclude_self drops "
    "self pairs at the candidate stage (bdoc <> idoc — member-exact: "
    "the per-doc band rows carry real ids on both probe paths, unlike "
    "the Hamming index's min-id summary), so a replayed batch keeps its "
    "docs unless ANOTHER index doc genuinely duplicates them. Oracle "
    "reproduces banding AND exclusion bit-for-bit.",
)
def dedup_incremental_minhash_selfsafe(
    spark: SparkSession, sf_dir: str,
) -> DataFrame:
    from dsacord_spark.operators.dedup import incremental_minhash_matches

    d = table(spark, sf_dir, "documents")
    batch = d.filter(F.col("doc_id") % 10 == 0)
    index = d.filter(F.col("doc_id") % 10 != 3)
    return incremental_minhash_matches(
        index, batch, "doc_id", "text", n=3, n_perm=32, bands=8,
        threshold=0.5, exclude_self=True,
    )
