"""Layer-B operator catalog: text analysis, dedup family, similarity
search over the `documents` and `embeddings` tables (the LLM-data-pipeline
surface the north star adds on top of the reference's ETL semantics).

Every oracle SQL string here is *generated from the same constants* as the
Spark implementation (md5-based hashes, LCG permutation pairs, md5-derived
hyperplane masks), so even the LSH-based probabilistic operators are
bit-reproducible in DuckDB — a much stronger check than rows-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from dsacord_spark.functions.hashing import (
    MERSENNE_31,
    _perm_constants,
    md5_long,
    md5_long_sql,
)
from dsacord_spark.functions.text import (
    LANG_MARKERS,
    TOKEN_RE,
    doc_fingerprint,
    lang_id,
    lang_scores,
    punct_ratio,
    quality_score,
    regex_tokens,
    token_count,
    tokens,
)
from dsacord_spark.operators.dedup import (
    exact_duplicate_groups,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
    SIMHASH_BITS,
)
from dsacord_spark.operators.similarity import (
    blocked_near_dup_pairs,
    brute_force_topk,
    hyperplane_masks,
    lsh_topk,
)
from dsacord_spark.plans.registry import register, table

# ---------------------------------------------------------------------------
# Shared SQL fragments (DuckDB dialect), kept in lockstep with the Spark
# column builders in functions/text.py.
# ---------------------------------------------------------------------------

# tokens(): whitespace split of trimmed text, empties dropped
_TOKS_SQL = (
    "list_filter(string_split_regex(trim({c}), '\\s+'), x -> x <> '')"
)


def _stop_hits_sql(c: str, words: list[str]) -> str:
    pat = "\\b(" + "|".join(words) + ")\\b"
    return f"len(regexp_extract_all(lower({c}), '{pat}'))"


def _ngr_cte(n: int = 3) -> str:
    """CTE producing (doc, hg): distinct word n-grams per document, as
    60-bit md5 hashes (matching operators.dedup._shingle_index)."""
    hg = md5_long_sql("ng")
    return f"""
    toks AS (SELECT doc_id, {_TOKS_SQL.format(c='text')} AS t FROM documents),
    ngr_s AS (
      SELECT DISTINCT doc_id AS doc, array_to_string(t[i:i+{n - 1}], ' ') AS ng
      FROM toks, unnest(generate_series(1, greatest(len(t)-{n - 1}, 1))) AS u(i)
    ),
    ngr AS (SELECT doc, {hg} AS hg FROM ngr_s)"""


def _jaccard_tail_sql(threshold: float, cand: str | None) -> str:
    """sizes/inter/jaccard over the `ngr` CTE; optionally restricted to a
    candidate-pair CTE named `cand`."""
    inter_src = (
        "FROM ngr a JOIN ngr b ON a.hg = b.hg AND a.doc < b.doc"
        if cand is None
        else "FROM cand c JOIN ngr a ON a.doc = c.doc_a "
        "JOIN ngr b ON b.doc = c.doc_b AND a.hg = b.hg"
    )
    return f"""
    sizes AS (SELECT doc, count(*) AS sz FROM ngr GROUP BY doc),
    inter AS (
      SELECT a.doc AS doc_a, b.doc AS doc_b, count(*) AS i
      {inter_src}
      GROUP BY 1, 2)
    SELECT doc_a, doc_b,
           CAST(i AS DOUBLE) / (sa.sz + sb.sz - i) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc = doc_a
    JOIN sizes sb ON sb.doc = doc_b
    WHERE CAST(i AS DOUBLE) / (sa.sz + sb.sz - i) >= {threshold}"""


def _perm_min_sql(i: int, a: int, b: int) -> str:
    return f"MIN(({a} * ((hg) % {MERSENNE_31}) + {b}) % {MERSENNE_31}) AS m{i}"


def _vec_d(expr: str) -> str:
    return f"CAST({expr} AS DOUBLE[])"


def _cos_sql(a: str, b: str) -> str:
    return (
        f"list_dot_product({_vec_d(a)}, {_vec_d(b)})"
        f" / (sqrt(list_dot_product({_vec_d(a)}, {_vec_d(a)}))"
        f" * sqrt(list_dot_product({_vec_d(b)}, {_vec_d(b)})))"
    )


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------

_EN = LANG_MARKERS["en"]


def _lang_id_sql(c: str) -> str:
    scores = {lang: _stop_hits_sql(c, ws) for lang, ws in LANG_MARKERS.items()}
    best = "greatest(" + ", ".join(scores.values()) + ")"
    whens = " ".join(
        f"WHEN {scores[lang]} = {best} THEN '{lang}'" for lang in LANG_MARKERS
    )
    return f"CASE WHEN {best} = 0 THEN 'und' {whens} ELSE 'und' END"


_FPRINT_SQL = md5_long_sql("regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')")
_TOKS_TEXT = _TOKS_SQL.format(c="text")


def _quality10_sql(c: str = "text") -> str:
    """Integer-tenths quality score (4+3+3) — the SQL rendering of
    functions/text.quality_score10. Conditions are byte-identical to the
    text_quality oracle above (same double-valued n_tok / punct-ratio /
    stopword-ratio comparisons); only the CASE terms are integers, so a
    threshold grid over the score is float-free."""
    n_tok = f"CAST(len({_TOKS_SQL.format(c=c)}) AS DOUBLE)"
    pr = (
        f"CAST(length({c}) - length(regexp_replace({c}, '[^A-Za-z0-9\\s]', '', 'g')) AS DOUBLE)"
        f" / length({c})"
    )
    sw = f"CAST({_stop_hits_sql(c, _EN)} AS DOUBLE)"
    return (
        f"(CASE WHEN {n_tok} >= 5 AND {n_tok} <= 5000 THEN 4 ELSE 0 END)"
        f" + (CASE WHEN {pr} < 0.2 THEN 3 ELSE 0 END)"
        f" + (CASE WHEN {sw} / greatest({n_tok}, 1.0) > 0.01 THEN 3 ELSE 0 END)"
    )


@register(
    "text_stats",
    sql=f"""
    SELECT doc_id,
           len({_TOKS_TEXT}) AS n_tokens,
           len(regexp_extract_all(text, '{TOKEN_RE}')) AS n_regex_tokens,
           round(CAST(length(text) - length(regexp_replace(text, '[^A-Za-z0-9\\s]', '', 'g')) AS DOUBLE)
                 / length(text), 6) AS punct_ratio,
           {_FPRINT_SQL} AS fingerprint
    FROM documents
    """,
    doc="Token counts (whitespace + BPE-ish regex), punctuation ratio, md5 fingerprint.",
)
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        token_count("text").alias("n_tokens"),
        F.size(regex_tokens("text")).alias("n_regex_tokens"),
        F.round(punct_ratio("text"), 6).alias("punct_ratio"),
        doc_fingerprint("text").alias("fingerprint"),
    )


@register(
    "text_quality",
    sql=f"""
    WITH t AS (
      SELECT doc_id, lang,
             CAST(len({_TOKS_SQL.format(c='text')}) AS DOUBLE) AS n_tok,
             CAST(length(text) - length(regexp_replace(text, '[^A-Za-z0-9\\s]', '', 'g')) AS DOUBLE)
               / length(text) AS pr,
             CAST({_stop_hits_sql('text', _EN)} AS DOUBLE) AS sw
      FROM documents)
    SELECT doc_id, lang,
           CAST((CASE WHEN n_tok >= 5 AND n_tok <= 5000 THEN 0.4 ELSE 0.0 END)
           + (CASE WHEN pr < 0.2 THEN 0.3 ELSE 0.0 END)
           + (CASE WHEN sw / greatest(n_tok, 1.0) > 0.01 THEN 0.3 ELSE 0.0 END)
           AS DOUBLE) AS quality
    FROM t
    """,
    doc="Heuristic quality score: length band + punctuation + stopword ratio.",
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    return d.select("doc_id", "lang", quality_score("text").alias("quality"))


@register(
    "text_lang_breakdown",
    sql=f"""
    SELECT lang, {_lang_id_sql('text')} AS lang_guess, count(*) AS n
    FROM documents GROUP BY 1, 2
    """,
    doc="Language-ID heuristic (stopword n-gram hits) vs the labeled lang column.",
)
def text_lang_breakdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    return d.groupBy("lang", lang_id("text").alias("lang_guess")).agg(
        F.count(F.lit(1)).alias("n")
    )


@register(
    "text_token_topk",
    sql=f"""
    WITH toks AS (SELECT doc_id, {_TOKS_SQL.format(c='text')} AS t FROM documents)
    SELECT tk AS token, count(*) AS cnt
    FROM toks, unnest(t) AS u(tk)
    GROUP BY tk ORDER BY cnt DESC, token ASC LIMIT 20
    """,
    doc="Global token frequency top-20 (explode -> hash agg -> top-k).",
)
def text_token_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(tokens("text")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("token").asc())
        .limit(20)
    )


@register(
    "text_repetition_filters",
    sql=f"""
    WITH toks AS (SELECT doc_id, {_TOKS_TEXT} AS t FROM documents),
    tf AS (SELECT doc_id, tk, count(*) AS c
           FROM toks, unnest(t) AS u(tk) GROUP BY doc_id, tk),
    mx AS (SELECT doc_id, max(c) AS max_tf, sum(c) AS n_tok,
                  count(*) AS n_uniq
           FROM tf GROUP BY doc_id),
    ngs AS (SELECT doc_id, array_to_string(t[i:i+2], ' ') AS ng
            FROM toks,
                 unnest(generate_series(1, greatest(len(t)-2, 1))) AS u(i)),
    ng3 AS (SELECT doc_id, count(*) AS n3, count(DISTINCT ng) AS u3
            FROM ngs GROUP BY doc_id)
    SELECT mx.doc_id,
           round(1.0 - CAST(n_uniq AS DOUBLE) / n_tok, 6) AS dup_word_frac,
           round(CAST(max_tf AS DOUBLE) / n_tok, 6) AS top_word_frac,
           round(1.0 - CAST(u3 AS DOUBLE) / n3, 6) AS dup_3gram_frac,
           (CAST(max_tf AS DOUBLE) / n_tok <= 0.1
            AND 1.0 - CAST(n_uniq AS DOUBLE) / n_tok <= 0.6) AS keep
    FROM mx JOIN ng3 ON ng3.doc_id = mx.doc_id
    """,
    doc="Gopher-style within-document repetition gates (dup-word fraction, "
    "top-word fraction, duplicate-3gram fraction) computed per row with "
    "higher-order array functions — zero shuffles, one codegen span; the "
    "classic pretraining-corpus quality filter family.",
)
def text_repetition_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    # tokens materialized once; inlining tokens() in each metric would
    # re-run the regexp split per reference (see PLANS.md)
    tk = d.select("doc_id", tokens("text").alias("t"))
    t = F.col("t")
    n_tok = F.size(t)
    max_tf = F.array_max(
        F.transform(
            F.array_distinct(t),
            lambda x: F.size(F.filter(t, lambda y: y == x)),
        )
    )
    ngrams = F.transform(
        F.sequence(F.lit(1), F.greatest(n_tok - F.lit(2), F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(t, i, 3)),
    )
    # ngrams materialized once too — referencing the transform() twice
    # (n3 and u3) would rebuild the whole array per metric
    # metrics are defined for docs with >= 1 token (a whitespace-only doc
    # would yield 0/0 = NaN here and silently vanish from the SQL twin's
    # inner join — make the dropped-row semantics explicit instead)
    withng = tk.filter(F.size(t) > 0).select(
        "doc_id",
        n_tok.alias("n_tok"),
        F.size(F.array_distinct(t)).alias("n_uniq"),
        max_tf.alias("max_tf"),
        ngrams.alias("ng"),
    )
    withm = withng.select(
        "doc_id",
        "n_tok",
        "n_uniq",
        "max_tf",
        F.size(F.col("ng")).alias("n3"),
        F.size(F.array_distinct(F.col("ng"))).alias("u3"),
    )
    top_frac = F.col("max_tf").cast("double") / F.col("n_tok")
    dup_word = F.lit(1.0) - F.col("n_uniq").cast("double") / F.col("n_tok")
    dup3 = F.lit(1.0) - F.col("u3").cast("double") / F.col("n3")
    return withm.select(
        "doc_id",
        F.round(dup_word, 6).alias("dup_word_frac"),
        F.round(top_frac, 6).alias("top_word_frac"),
        F.round(dup3, 6).alias("dup_3gram_frac"),
        ((top_frac <= 0.1) & (dup_word <= 0.6)).alias("keep"),
    )


@register(
    "events_value_winsorize",
    sql="""
    WITH pct AS (
      SELECT event_type,
             quantile_cont(value, 0.01) AS p01,
             quantile_cont(value, 0.99) AS p99
      FROM events GROUP BY event_type)
    SELECT e.event_type,
           count(*) AS n,
           round(avg(least(greatest(e.value, p01), p99)), 6) AS robust_mean,
           round(min(least(greatest(e.value, p01), p99)), 6) AS robust_min,
           round(max(least(greatest(e.value, p01), p99)), 6) AS robust_max
    FROM events e JOIN pct USING (event_type)
    GROUP BY e.event_type
    """,
    doc="Percentile-winsorized robust aggregate per event type: exact "
    "p01/p99 in a first small agg, clipped stats via a broadcast join "
    "back — the two-pass shape that avoids a per-key window sort over "
    "the full fact table at scale.",
)
def events_value_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events").select("event_type", "value")
    pct = e.groupBy("event_type").agg(
        F.expr("percentile(value, 0.01)").alias("p01"),
        F.expr("percentile(value, 0.99)").alias("p99"),
    )
    clipped = e.join(F.broadcast(pct), "event_type").select(
        "event_type",
        F.least(F.greatest(F.col("value"), F.col("p01")), F.col("p99")).alias("v"),
    )
    return clipped.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("v"), 6).alias("robust_mean"),
        F.round(F.min("v"), 6).alias("robust_min"),
        F.round(F.max("v"), 6).alias("robust_max"),
    )


# ---------------------------------------------------------------------------
# Dedup family
# ---------------------------------------------------------------------------

# Synthesized exact duplicates: every 10th doc re-appears under a shifted id
# (the raw table has no exact dups).
_AUG_SQL = """
    aug AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 10 = 0
    )"""


@register(
    "dedup_exact",
    sql=f"""
    WITH {_AUG_SQL.strip()}
    SELECT min(doc_id) AS canonical_id, count(*) AS n_copies
    FROM aug GROUP BY text HAVING count(*) > 1
    """,
    doc="Exact dedup by content hash-groupBy (synthesized duplicate rows).",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    dups = d.filter(F.col("doc_id") % 10 == 0).withColumn(
        "doc_id", F.col("doc_id") + 1000000
    )
    aug = d.select("doc_id", "text").unionByName(dups.select("doc_id", "text"))
    return exact_duplicate_groups(aug, "doc_id", "text")


@register(
    "dedup_ngram_jaccard",
    sql="WITH " + _ngr_cte(3).strip() + "," + _jaccard_tail_sql(0.5, cand=None),
    doc="Exact trigram-Jaccard pairs >= 0.5 via inverted-index self-join.",
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(d, "doc_id", "text", n=3, threshold=0.5)


def _minhash_sql(n_perm: int = 32, bands: int = 8, threshold: float = 0.5) -> str:
    rows = n_perm // bands
    perms = _perm_constants(n_perm)
    mins = ",\n             ".join(
        _perm_min_sql(i, a, b) for i, (a, b) in enumerate(perms)
    )
    band_rows = " UNION ALL ".join(
        "SELECT doc, {j} AS band_idx, {h} AS band_hash FROM sig".format(
            j=j,
            h=md5_long_sql(
                "concat_ws(',', "
                + ", ".join([str(j)] + [f"m{j * rows + r}" for r in range(rows)])
                + ")"
            ),
        )
        for j in range(bands)
    )
    return f"""
    WITH {_ngr_cte(3).strip()},
    sig AS (SELECT doc, {mins} FROM ngr GROUP BY doc),
    bands AS ({band_rows}),
    cand AS (
      SELECT DISTINCT a.doc AS doc_a, b.doc AS doc_b
      FROM bands a JOIN bands b
        ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash AND a.doc < b.doc),
    {_jaccard_tail_sql(threshold, cand='cand').strip()}
    """


@register(
    "dedup_minhash_lsh",
    sql=_minhash_sql(32, 8, 0.5),
    doc="MinHash(32)-LSH(8 bands) candidates + exact Jaccard verify >= 0.5. "
    "Deterministic md5-based permutations make even the LSH stage oracle-checkable.",
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    return minhash_lsh_pairs(d, "doc_id", "text", n=3, n_perm=32, bands=8, threshold=0.5)


def _simhash_sig_ctes(src: str) -> str:
    """CTE chain `toks, tok, sums, sig` computing the per-doc 60-bit
    SimHash from `src` (any relation exposing doc_id, text) — shared by
    the dedup_simhash oracle here and the radius-calibration oracle in
    plans/reports.py so both engines' signature definitions stay in
    lockstep with operators/dedup.simhash_signatures."""
    h = md5_long_sql("tk")
    bit_sums = ",\n             ".join(
        f"SUM(CASE WHEN (({h}) >> {bit}) & 1 = 1 THEN 1 ELSE -1 END) AS s{bit}"
        for bit in range(SIMHASH_BITS)
    )
    sim = " + ".join(
        f"(CASE WHEN s{bit} > 0 THEN CAST({1 << bit} AS BIGINT) ELSE 0 END)"
        for bit in range(SIMHASH_BITS)
    )
    return f"""toks AS (SELECT doc_id, {_TOKS_SQL.format(c='text')} AS t FROM {src}),
    tok AS (SELECT DISTINCT doc_id AS doc, tk FROM toks, unnest(t) AS u(tk)),
    sums AS (SELECT doc, {bit_sums} FROM tok GROUP BY doc),
    sig AS (SELECT doc, {sim} AS simhash FROM sums)"""


def _simhash_sql(max_hamming: int = 3) -> str:
    return f"""
    WITH {_simhash_sig_ctes('documents')}
    SELECT a.doc AS doc_a, b.doc AS doc_b,
           bit_count(xor(a.simhash, b.simhash)) AS hamming
    FROM sig a JOIN sig b ON a.doc < b.doc
    WHERE bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}
    """


@register(
    "dedup_simhash",
    sql=_simhash_sql(3),
    doc="SimHash(60-bit) pairs with hamming <= 3. Spark uses banded candidates "
    "(pigeonhole: 4 bands -> recall 1), oracle brute-forces — provably equal.",
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    return simhash_pairs(d, "doc_id", "text", max_hamming=3, n_bands=4)


# ---------------------------------------------------------------------------
# Similarity search over embeddings
# ---------------------------------------------------------------------------


@register(
    "ann_bruteforce_topk",
    sql=f"""
    WITH q AS (SELECT vec_id AS q_id, embedding AS q_vec FROM embeddings WHERE vec_id < 5),
    scored AS (
      SELECT q_id, e.vec_id AS neighbor_id,
             {_cos_sql('q_vec', 'e.embedding')} AS cos
      FROM q, embeddings e WHERE e.vec_id <> q_id),
    ranked AS (
      SELECT q_id, neighbor_id, cos,
             row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, neighbor_id ASC) AS rank
      FROM scored)
    SELECT q_id, neighbor_id, rank, round(cos, 6) AS cos_sim
    FROM ranked WHERE rank <= 10
    """,
    doc="Exact top-10 cosine neighbors for 5 query vectors (brute-force baseline).",
)
def ann_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    return brute_force_topk(e, q, k=10)


_MASKS = hyperplane_masks(n_planes=4, dim=64)


def _bucket_sql(vec: str) -> str:
    terms = []
    for p, mask in enumerate(_MASKS):
        lits = "[" + ", ".join(f"{float(m):.1f}" for m in mask) + "]"
        terms.append(
            f"(CASE WHEN list_dot_product({_vec_d(vec)}, {lits}) > 0"
            f" THEN {1 << p} ELSE 0 END)"
        )
    return " + ".join(terms)


_PROBE_LIST = "[bucket, " + ", ".join(
    f"xor(bucket, {1 << p})" for p in range(len(_MASKS))
) + "]"


@register(
    "ann_lsh_topk",
    sql=f"""
    WITH eb AS (SELECT vec_id, embedding, {_bucket_sql('embedding')} AS bucket FROM embeddings),
    q AS (SELECT vec_id AS q_id, embedding AS q_vec, bucket FROM eb WHERE vec_id < 5),
    qp AS (SELECT q_id, q_vec, u.b AS bucket
           FROM q, unnest({_PROBE_LIST}) AS u(b)),
    scored AS (
      SELECT q_id, e.vec_id AS neighbor_id,
             {_cos_sql('q_vec', 'e.embedding')} AS cos
      FROM qp JOIN eb e USING (bucket) WHERE e.vec_id <> q_id),
    ranked AS (
      SELECT q_id, neighbor_id, cos,
             row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, neighbor_id ASC) AS rank
      FROM scored)
    SELECT q_id, neighbor_id, rank, round(cos, 6) AS cos_sim
    FROM ranked WHERE rank <= 5
    """,
    doc="ANN top-5 via random-hyperplane LSH buckets (16 buckets, md5-derived "
    "masks), multi-probe (own bucket + each Hamming-1 bucket) — the 100 TB "
    "path: bucket equi-join instead of cross join.",
)
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    return lsh_topk(e, q, _MASKS, k=5)


@register(
    "dedup_embedding_blocked",
    sql=f"""
    SELECT a.label AS blk, a.vec_id AS id_a, b.vec_id AS id_b,
           round({_cos_sql('a.embedding', 'b.embedding')}, 6) AS cos_sim
    FROM embeddings a JOIN embeddings b
      ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE round({_cos_sql('a.embedding', 'b.embedding')}, 6) >= 0.45
    """,
    doc="Embedding near-dup pairs (cos >= 0.45) within a blocking key — "
    "equi-join on the block, never an unbounded cross join.",
)
def dedup_embedding_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings")
    return blocked_near_dup_pairs(e, block_col="label", threshold=0.45)


# ---------------------------------------------------------------------------
# Rolling-hash document fingerprint (north star "document fingerprinting
# (rolling hash)"): order-sensitive Rabin-Karp fold over the token-hash
# sequence — unlike text_stats' flat md5 of normalized text, token
# reordering changes this fingerprint. Pure Column expressions (higher-
# order transform + aggregate), zero UDFs, one narrow scan, no shuffle.
# ---------------------------------------------------------------------------
_RK_BASE = 1_000_003


@register(
    "text_rolling_fingerprint",
    sql=f"""
    WITH toks AS (SELECT doc_id, {_TOKS_SQL.format(c='text')} AS t FROM documents),
    hs AS (SELECT doc_id,
                  list_transform(t, x -> {md5_long_sql('x')} % {MERSENNE_31}) AS h,
                  len(t) AS n_tokens
           FROM toks)
    SELECT doc_id, n_tokens,
           list_reduce(list_prepend(0, h),
                       (acc, x) -> (acc * {_RK_BASE} + x) % {MERSENNE_31}) AS rolling_fp
    FROM hs
    """,
    doc="Rabin-Karp rolling-hash fingerprint over the token sequence "
    "(SURVEY layer B; order-sensitive, bit-identical in both engines).",
)
def text_rolling_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    t = tokens("text")
    hs = F.transform(t, lambda x: md5_long(x) % F.lit(MERSENNE_31))
    fp = F.aggregate(
        hs,
        F.lit(0).cast("bigint"),
        lambda acc, x: (acc * F.lit(_RK_BASE) + x) % F.lit(MERSENNE_31),
    )
    return d.select(
        "doc_id",
        F.size(t).cast("bigint").alias("n_tokens"),
        fp.alias("rolling_fp"),
    )


# ---------------------------------------------------------------------------
# IVF ANN (north star: "an IVF or LSH-bucketed variant as the scale
# path"). Deterministic coarse quantizer (first-n centroids == 0-iteration
# k-means) so the DuckDB oracle reproduces the whole index; see
# operators/similarity.py:ivf_topk for the scale notes.
# ---------------------------------------------------------------------------
_IVF_CELLS, _IVF_NPROBE = 16, 4

# shared by ann_ivf_topk AND ann_ivf_topk_blas: both entries compute the
# identical index (same first-n centroids, same probe/score/top-k tail,
# cos rounded to 6dp) — the BLAS variant differs only in float64
# SUMMATION ORDER (dgemm vs sequential fold), which the 6dp rounding
# absorbs on non-adversarial data; exact row equality of the two Spark
# paths is additionally pinned by
# tests/test_similarity_recall.py::test_ivf_blas_assignment_matches_declarative
_IVF_TOPK_SQL = f"""
    WITH cent AS (SELECT vec_id AS c_id, embedding AS c_vec
                  FROM embeddings ORDER BY vec_id LIMIT {_IVF_CELLS}),
    assign_scored AS (
      SELECT e.vec_id, e.embedding, c.c_id,
             row_number() OVER (PARTITION BY e.vec_id
                 ORDER BY {_cos_sql('e.embedding', 'c.c_vec')} DESC, c.c_id ASC) AS rn
      FROM embeddings e, cent c),
    assigned AS (SELECT vec_id, embedding, c_id AS cell FROM assign_scored WHERE rn = 1),
    qprobe AS (
      SELECT q.vec_id AS q_id, q.embedding AS q_vec, c.c_id AS cell,
             row_number() OVER (PARTITION BY q.vec_id
                 ORDER BY {_cos_sql('q.embedding', 'c.c_vec')} DESC, c.c_id ASC) AS rn
      FROM embeddings q, cent c WHERE q.vec_id < 5),
    probes AS (SELECT q_id, q_vec, cell FROM qprobe WHERE rn <= {_IVF_NPROBE}),
    scored AS (
      SELECT q_id, a.vec_id AS neighbor_id, {_cos_sql('q_vec', 'a.embedding')} AS cos
      FROM probes p JOIN assigned a USING (cell) WHERE a.vec_id <> p.q_id),
    ranked AS (
      SELECT q_id, neighbor_id, cos,
             row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, neighbor_id ASC) AS rank
      FROM scored)
    SELECT q_id, neighbor_id, rank, round(cos, 6) AS cos_sim
    FROM ranked WHERE rank <= 5
    """


@register(
    "ann_ivf_topk",
    sql=_IVF_TOPK_SQL,
    doc="IVF ANN top-5: 16-cell coarse quantizer, nprobe=4 — query touches "
    "nprobe/n_cells of the corpus instead of all of it.",
)
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dsacord_spark.operators.similarity import ivf_topk

    e = table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    return ivf_topk(e, q, n_cells=_IVF_CELLS, nprobe=_IVF_NPROBE, k=5)


@register(
    "ann_ivf_topk_blas",
    sql=_IVF_TOPK_SQL,  # FULL value oracle (upgraded r8 from rows-only):
    # same index semantics as ann_ivf_topk; the BLAS path's float64
    # summation-order difference is absorbed by the 6dp rounding on
    # this data (verified at sf0.001/0.01/0.1) and exact equality of
    # the two Spark paths is pinned in tests/test_similarity_recall.py
    doc="ann_ivf_topk with the production BLAS cell assignment "
    "(operators/similarity.py:assign_cells_blas): one dgemm per Arrow "
    "batch replaces the corpus x n_cells crossJoin + per-vector window "
    "— no shuffle, no scored-pair materialization. The round-1 plan "
    "audit's recorded revisit (VERDICT r1 task 8).",
)
def ann_ivf_topk_blas(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dsacord_spark.operators.similarity import ivf_topk_blas

    e = table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    return ivf_topk_blas(e, q, n_cells=_IVF_CELLS, nprobe=_IVF_NPROBE, k=5)


@register(
    "ann_ivf_kmeans_topk",
    # STRUCTURAL value oracle (upgraded r8 from rows-only): Lloyd's
    # training itself is iterative — not SQL-expressible — but the
    # result's CONTRACT is: exactly k ranked rows per query (the
    # (q_id, rank) grid), self excluded, scores monotone in rank, and
    # every score <= the exact brute-force best cosine for that query
    # (IVF scores are true cosines of real corpus vectors). The oracle
    # computes the grid and the brute-force best EXACTLY; the booleans
    # are literal TRUE on the SQL side and computed from the trained
    # index on the Spark side, so any violation hash-mismatches.
    # Neighbor identity/recall stays gated in tests/test_similarity_recall.py.
    sql=f"""
    WITH brute AS (
      SELECT q.vec_id AS q_id,
             round(max({_cos_sql('q.embedding', 'a.embedding')}), 6)
               AS brute_best_cos
      FROM embeddings q JOIN embeddings a ON a.vec_id <> q.vec_id
      WHERE q.vec_id < 5 GROUP BY q.vec_id)
    SELECT q_id, CAST(t.r AS INT) AS rank, brute_best_cos,
           TRUE AS self_excluded, TRUE AS cos_monotone, TRUE AS cos_le_best
    FROM brute, range(1, 6) t(r)
    """,
    doc="Full production IVF: spherical k-means centroids (3 Lloyd's "
    "iterations, BLAS assignment + partition-partial sums merged on the "
    "driver — no n x d shuffle) feeding the BLAS probe pipeline. "
    "Better-balanced cells than the first-n quantizer -> higher recall "
    "at the same nprobe. Output is the structural contract (rank grid, "
    "exact brute-force ceiling, monotonicity/self-exclusion booleans); "
    "recall vs brute force is gated in pytest.",
)
def ann_ivf_kmeans_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dsacord_spark.operators.similarity import ivf_topk_kmeans

    e = table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    res = ivf_topk_kmeans(
        e, q, n_cells=_IVF_CELLS, nprobe=_IVF_NPROBE, k=5, iters=3
    )
    best = brute_force_topk(e, q, k=1).select(
        "q_id", F.col("cos_sim").alias("brute_best_cos")
    )
    w = W.partitionBy("q_id").orderBy(F.col("rank").asc())
    return (
        res.join(F.broadcast(best), "q_id")
        .withColumn("__prev", F.lag("cos_sim").over(w))
        .select(
            "q_id",
            "rank",
            "brute_best_cos",
            (F.col("neighbor_id") != F.col("q_id")).alias("self_excluded"),
            F.coalesce(
                F.col("cos_sim") <= F.col("__prev") + F.lit(1e-9), F.lit(True)
            ).alias("cos_monotone"),
            (F.col("cos_sim") <= F.col("brute_best_cos") + F.lit(1e-6)).alias(
                "cos_le_best"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Deterministic training-data selection: hash-based train/val/test split
# and per-language stratified sampling. Hash-mod selection (not rand()) is
# the scale-correct idiom: reproducible across runs/engines, stable under
# repartitioning, and join-free (a narrow map-side filter at 100 TB).
# ---------------------------------------------------------------------------
_SPLIT_HASH = md5_long_sql("CAST(doc_id AS VARCHAR)")


@register(
    "split_train_test",
    sql=f"""
    SELECT doc_id,
           CASE WHEN {_SPLIT_HASH} % 100 < 80 THEN 'train'
                WHEN {_SPLIT_HASH} % 100 < 90 THEN 'val'
                ELSE 'test' END AS split
    FROM documents
    """,
    doc="Deterministic 80/10/10 train/val/test split by doc-id hash.",
)
def split_train_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    bucket = md5_long(F.col("doc_id").cast("string")) % F.lit(100)
    split = (
        F.when(bucket < 80, F.lit("train"))
        .when(bucket < 90, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return d.select("doc_id", split.alias("split"))


_STRATA_RATES = {"en": 200, "de": 500, "fr": 500}  # out of 1000
_DEFAULT_RATE = 800


@register(
    "sample_stratified",
    sql=f"""
    SELECT doc_id, lang
    FROM documents
    WHERE {_SPLIT_HASH} % 1000 <
          CASE lang
            {' '.join(f"WHEN '{lg}' THEN {r}" for lg, r in _STRATA_RATES.items())}
            ELSE {_DEFAULT_RATE} END
    """,
    doc="Deterministic per-language stratified sample (hash-mod rates): "
    "downsample dominant languages, keep the tail.",
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    bucket = md5_long(F.col("doc_id").cast("string")) % F.lit(1000)
    rate = F.lit(_DEFAULT_RATE)
    for lg, r in reversed(_STRATA_RATES.items()):
        rate = F.when(F.col("lang") == lg, F.lit(r)).otherwise(rate)
    return d.filter(bucket < rate).select("doc_id", "lang")
