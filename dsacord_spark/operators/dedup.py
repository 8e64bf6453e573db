"""Deduplication operators for large-scale text pipelines.

Five families, all expressed as DataFrame transformations (no Python in
the hot path, so every stage is Catalyst-optimized and shuffle-explicit):

- exact:        hash groupBy on content (or md5 fingerprint)
- keep-latest:  window row_number per key — the reference's upsert
                UpdateAll semantics (/root/reference/utils.go:100-104)
- n-gram Jaccard: exact pairwise similarity restricted to pairs sharing
                a shingle (inverted-index join, never a cross join)
- MinHash-LSH:  signature -> banded buckets -> candidate pairs -> exact
                verify. The scale path: candidate generation cost is
                O(docs x bands), independent of pair count.
- SimHash:      60-bit signature, banded (pigeonhole: hamming <= bands-1
                has guaranteed recall), then exact hamming filter.

All hashes derive from md5 (functions/hashing.py) so a SQL oracle can
reproduce results bit-for-bit — Spark's xxhash64 would be faster but
unverifiable; swap `md5_long` for `F.xxhash64` in production if oracle
parity is not needed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W, functions as F

from dsacord_spark.functions.hashing import _perm_constants, md5_long, perm_hash
from dsacord_spark.functions.text import tokens, word_ngrams


def exact_duplicate_groups(df: DataFrame, id_col: str, content_col: str) -> DataFrame:
    """Exact dedup via hash groupBy: one row per duplicated content value,
    keeping the smallest id as canonical. Scale: single shuffle on the
    content hash; map-side partial aggregation."""
    return (
        df.groupBy(F.col(content_col).alias("content"))
        .agg(
            F.min(F.col(id_col)).alias("canonical_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .filter(F.col("n_copies") > 1)
        .select("canonical_id", "n_copies")
    )


def keep_latest(df: DataFrame, keys: list[str], order: list[Column]) -> DataFrame:
    """Keep one row per key, latest by `order` — upsert UpdateAll shape."""
    w = W.partitionBy(*keys).orderBy(*order)
    return df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")


def _exploded_ngrams(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """(id, ng) pairs — distinct word n-grams per doc (inverted index)."""
    return df.select(
        F.col(id_col).alias("doc"), F.explode(word_ngrams(text_col, n)).alias("ng")
    )


def _shingle_index(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """(doc, hg): the inverted shingle index with 60-bit hashed shingles,
    persisted — it is reused 2-3x per pair query (sizes + both join
    sides), and joining on a long beats joining on the shingle string ~2x.
    At 100 TB this is a materialized table (write once, bucket by hg),
    not a cache.

    The token array is materialized in its own projection BEFORE the
    per-offset transform: inlining tokens() inside slice() makes Catalyst
    re-evaluate the regexp split once per offset (~6x slower measured)."""
    tk = df.select(F.col(id_col).alias("doc"), tokens(text_col).alias("t"))
    offsets = F.sequence(
        F.lit(1), F.greatest(F.size(F.col("t")) - F.lit(n - 1), F.lit(1))
    )
    ngrams = F.array_distinct(
        F.transform(offsets, lambda i: F.concat_ws(" ", F.slice(F.col("t"), i, n)))
    )
    return (
        tk.select("doc", F.explode(ngrams).alias("ng"))
        .select("doc", md5_long(F.col("ng")).alias("hg"))
        .persist()
    )


def ngram_jaccard_pairs(
    df: DataFrame, id_col: str, text_col: str, n: int = 3, threshold: float = 0.5
) -> DataFrame:
    """Exact n-gram Jaccard similarity for every pair sharing >=1 shingle.

    Scale: the self-join is on the shingle value (inverted index), so cost
    is sum over shingles of df^2 — bounded by dropping ultra-common
    shingles in a production pipeline; the MinHash variant below is the
    preferred path at 100 TB because its candidate set does not grow with
    shingle frequency."""
    ngr = _shingle_index(df, id_col, text_col, n)
    sizes = ngr.groupBy("doc").agg(F.count(F.lit(1)).alias("sz"))
    a, b = ngr.alias("a"), ngr.alias("b")
    inter = (
        a.join(b, (F.col("a.hg") == F.col("b.hg")) & (F.col("a.doc") < F.col("b.doc")))
        .groupBy(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("doc").alias("doc_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("doc").alias("doc_b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.col("inter").cast("double")
            / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, n: int = 3, n_perm: int = 32
) -> DataFrame:
    """One row per doc with columns m0..m{n_perm-1}: MinHash signature over
    word n-grams. One shuffle (groupBy doc) with map-side partial mins."""
    # the md5 lives in the shared shingle index — computed once per
    # shingle, not once per (shingle x permutation)
    ngr = _shingle_index(df, id_col, text_col, n).withColumn(
        "h", F.col("hg") % F.lit(2_147_483_647)
    )
    aggs = [
        F.min((F.lit(a) * F.col("h") + F.lit(b)) % F.lit(2_147_483_647)).alias(f"m{i}")
        for i, (a, b) in enumerate(_perm_constants(n_perm))
    ]
    return ngr.groupBy("doc").agg(*aggs)


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    n_perm: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
) -> DataFrame:
    """MinHash-LSH near-dup pairs with exact Jaccard verification.

    signature -> `bands` band-hashes per doc -> join docs sharing a band
    (candidate pairs) -> compute true n-gram Jaccard for candidates only
    -> filter >= threshold. With 32 perms / 8 bands / 4 rows the S-curve
    midpoint is ~0.59; candidates are verified exactly, so precision is 1
    and only recall depends on LSH parameters."""
    rows_per_band = n_perm // bands
    sig = minhash_signatures(df, id_col, text_col, n, n_perm)
    band_structs = [
        F.struct(
            F.lit(j).alias("band_idx"),
            md5_long(
                F.concat_ws(
                    ",",
                    F.lit(j),
                    *[F.col(f"m{j * rows_per_band + r}") for r in range(rows_per_band)],
                )
            ).alias("band_hash"),
        )
        for j in range(bands)
    ]
    bands_df = sig.select(
        F.col("doc"), F.explode(F.array(*band_structs)).alias("b")
    ).select("doc", "b.band_idx", "b.band_hash")

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

    # Exact verify on candidates only (reuses the persisted shingle index).
    ngr = _shingle_index(df, id_col, text_col, n)
    sizes = ngr.groupBy("doc").agg(F.count(F.lit(1)).alias("sz"))
    na = ngr.select(F.col("doc").alias("doc_a"), F.col("hg").alias("hg_a"))
    nb = ngr.select(F.col("doc").alias("doc_b2"), F.col("hg").alias("hg_b"))
    inter = (
        cand.join(na, "doc_a")
        .join(nb, (F.col("doc_b") == F.col("doc_b2")) & (F.col("hg_a") == F.col("hg_b")))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("doc").alias("doc_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("doc").alias("doc_b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.col("inter").cast("double")
            / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


SIMHASH_BITS = 60  # md5_long yields 60-bit hashes


def simhash_signatures(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """60-bit SimHash over distinct tokens: bit b of the signature is set
    iff sum over tokens of (+1 if bit b of token-hash else -1) > 0 —
    equivalently iff 2 * |{token hashes with bit b set}| > n_tokens.

    Computed per row with higher-order array functions (hash each token
    once, then one filter-count per bit): zero shuffles, one codegen
    projection. The previous explode + 60-expression groupBy formulation
    shuffled n_docs x n_tokens rows to compute a per-document value —
    at corpus scale that shuffle IS the cost of the operator. Empty
    docs are dropped, matching the explode formulation's semantics."""
    hs = F.transform(F.array_distinct(tokens(text_col)), lambda t: md5_long(t))
    base = df.select(F.col(id_col).alias("doc"), hs.alias("hs")).filter(
        F.size(F.col("hs")) > 0
    )
    n = F.size(F.col("hs"))
    sim = None
    for bit in range(SIMHASH_BITS):
        nset = F.size(
            F.filter(
                F.col("hs"),
                lambda h: F.shiftright(h, bit).bitwiseAND(F.lit(1)) == 1,
            )
        )
        term = F.when(nset * 2 > n, F.lit(1 << bit).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        sim = term if sim is None else sim + term
    return base.select("doc", sim.alias("simhash"))


def simhash_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    n_bands: int = 4,
) -> DataFrame:
    """Near-dup pairs with SimHash hamming distance <= max_hamming.

    Banded candidate generation: split the 60-bit signature into n_bands
    chunks; any pair within max_hamming differs in <= max_hamming bits, so
    with n_bands > max_hamming at least one chunk is identical (pigeonhole)
    -> recall is exactly 1 and the result equals the brute-force O(n^2)
    scan the oracle runs at small SF."""
    assert n_bands > max_hamming, "pigeonhole recall needs n_bands > max_hamming"
    # persisted for the same reason as _shingle_index: the banded
    # self-join reads the signature frame on BOTH sides, and Spark does
    # no CSE across self-join branches — unpersisted, the 60-bit
    # signature expression (the dominant cost) evaluates twice
    sig = simhash_signatures(df, id_col, text_col).persist()
    band_bits = SIMHASH_BITS // n_bands
    mask = (1 << band_bits) - 1
    chunks = [
        F.struct(
            F.lit(j).alias("band_idx"),
            F.shiftright(F.col("simhash"), j * band_bits)
            .bitwiseAND(F.lit(mask))
            .alias("chunk"),
        )
        for j in range(n_bands)
    ]
    bands_df = sig.select(
        "doc", "simhash", F.explode(F.array(*chunks)).alias("b")
    ).select("doc", "simhash", "b.band_idx", "b.chunk")
    a, b = bands_df.alias("a"), bands_df.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(
            F.col("a.doc").alias("doc_a"),
            F.col("b.doc").alias("doc_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        # filter BEFORE distinct: the banded join emits each qualifying
        # pair up to n_bands times, so dropping far pairs first shrinks
        # the distinct's shuffle input
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def duplicate_components(pairs: DataFrame, max_iter: int = 30) -> DataFrame:
    """Connected components over an undirected duplicate-pair edge list
    (doc_a, doc_b) -> one row per node: (doc_id, cluster_id) where
    cluster_id is the smallest doc id in the node's component. This is the
    step that turns pairwise near-dup evidence into dedup decisions (keep
    one canonical doc per cluster).

    Algorithm: min-label propagation to a fixpoint — each round every node
    takes the min of its own label and its neighbors' labels (one shuffle
    join + one partial-aggregated groupBy per round), converging in
    O(component diameter) rounds. Near-dup components are dense and
    shallow (they come from banded/bucketed candidate generation), so the
    diameter is small in practice; `localCheckpoint` truncates the lineage
    each round so the plan stays flat. At 100 TB the same loop runs with
    the edge list bucketed by src; for adversarially long chain graphs
    switch to the large-star/small-star algorithm (Kiveris et al.), which
    converges in O(log n) rounds with the same join-shape per round.
    Raises RuntimeError rather than returning a wrong answer if the
    fixpoint is not reached within max_iter."""
    edges = pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    sym = edges.union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).persist()
    # The edge list is usually orders of magnitude smaller than the corpus
    # (it only holds near-dup evidence), but the session's shuffle
    # partitioning is sized for the corpus — at 32+ partitions each tiny
    # per-round join pays full scheduling fan-out. Size the loop's shuffle
    # from the measured edge count instead (~500k edges/partition; the
    # count also materializes the persist before the loop re-reads it).
    spark = pairs.sparkSession
    n_edges = sym.count()
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    loop_parts = max(1, min(int(prev_parts), n_edges // 500_000 + 1))
    spark.conf.set("spark.sql.shuffle.partitions", str(loop_parts))
    try:
        return _propagate_min_labels(sym, max_iter)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)


def _propagate_min_labels(sym: DataFrame, max_iter: int) -> DataFrame:
    labels = (
        sym.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("lab", F.col("node"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        nbr = (
            sym.join(labels, sym["dst"] == labels["node"])
            .groupBy(F.col("src").alias("node2"))
            .agg(F.min("lab").alias("nlab"))
        )
        # carry the previous label through the propagation join so the
        # convergence probe is a local filter on the checkpointed frame,
        # not a second join per round
        new = (
            labels.join(nbr, labels["node"] == nbr["node2"], "left")
            .select(
                F.col("node"),
                F.col("lab").alias("old_lab"),
                F.least(F.col("lab"), F.coalesce(F.col("nlab"), F.col("lab"))).alias(
                    "lab"
                ),
            )
            .localCheckpoint()
        )
        changed = new.filter(F.col("lab") < F.col("old_lab")).limit(1).count()
        labels = new.drop("old_lab")
        if changed == 0:
            sym.unpersist()
            return labels.select(
                F.col("node").alias("doc_id"), F.col("lab").alias("cluster_id")
            )
    sym.unpersist()
    raise RuntimeError(f"connected components did not converge in {max_iter} rounds")
