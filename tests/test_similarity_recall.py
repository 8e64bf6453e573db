"""ANN quality regression: the approximate paths must actually find the
neighbors the brute-force baseline finds. The oracle harness proves each
query matches ITS OWN DuckDB twin; this test pins the cross-algorithm
quality bound (an LSH/IVF twin can match its oracle perfectly while
being a useless index — recall against exact top-k is the real metric).

Data and algorithms are fully deterministic (seed-42 corpus, md5-derived
masks, LCG centroid seeds), so the measured recalls are exact; the
asserted floors sit below them only to absorb deliberate parameter
retuning, not randomness. Measured at sf0.001, 20 queries, k=10:
single-probe LSH 0.10 -> multi-probe 0.47 (5 of 16 buckets probed),
IVF nprobe=4/16 0.83.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dsacord_spark.operators.similarity import (
    brute_force_topk,
    hyperplane_masks,
    ivf_topk,
    lsh_topk,
)
from dsacord_spark.plans.registry import table


@pytest.fixture(scope="module")
def topk_sets(spark, sf_dir):
    e = table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    masks = hyperplane_masks(n_planes=4, dim=64)
    bf = brute_force_topk(e, q, k=10).select("q_id", "neighbor_id")
    n_truth = bf.count()

    def recall(approx):
        return bf.join(approx, ["q_id", "neighbor_id"]).count() / n_truth

    return e, q, masks, recall


def test_multiprobe_lsh_recall(topk_sets):
    e, q, masks, recall = topk_sets
    assert recall(lsh_topk(e, q, masks, k=10).select("q_id", "neighbor_id")) >= 0.4


def test_multiprobe_beats_single_probe(topk_sets):
    e, q, masks, recall = topk_sets
    single = recall(
        lsh_topk(e, q, masks, k=10, multiprobe=False).select("q_id", "neighbor_id")
    )
    multi = recall(lsh_topk(e, q, masks, k=10).select("q_id", "neighbor_id"))
    assert multi > single


def test_ivf_recall(topk_sets):
    e, q, _, recall = topk_sets
    approx = ivf_topk(e, q, n_cells=16, nprobe=4, k=10).select(
        "q_id", "neighbor_id"
    )
    assert recall(approx) >= 0.7


def test_minhash_lsh_recall_and_precision(spark, sf_dir):
    """MinHash-LSH near-dup pairs vs the exact n-gram-Jaccard scan:
    precision is 1 by construction (candidates are exact-verified), and
    recall on this corpus is 1.0 (measured 28/28 at sf0.001 — its near
    dups sit far above the 32-perm/8-band S-curve midpoint of ~0.59);
    the floor absorbs parameter retuning only."""
    from dsacord_spark.operators.dedup import (
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
    )

    d = table(spark, sf_dir, "documents")
    exact = ngram_jaccard_pairs(d, "doc_id", "text", n=3, threshold=0.5).select(
        "doc_a", "doc_b"
    )
    lsh = minhash_lsh_pairs(d, "doc_id", "text", n=3, threshold=0.5).select(
        "doc_a", "doc_b"
    )
    n_exact, n_lsh = exact.count(), lsh.count()
    n_hit = exact.join(lsh, ["doc_a", "doc_b"]).count()
    assert n_hit == n_lsh  # precision 1: every LSH pair is a true pair
    assert n_exact > 0 and n_hit / n_exact >= 0.9


def test_block_topk_bit_matches_hof_formulation(spark, sf_dir):
    """block_topk_cosine's docstring claims bit-parity with the
    sequential-fold Column formulation (normalize, then dimension-order
    dot). Build that formulation inline and require EXACT equality —
    ids, ranks, and float-for-float cosine values."""
    from pyspark.sql import Window as W

    from dsacord_spark.functions.vectors import norm, to_double_array
    from dsacord_spark.operators.similarity import block_topk_cosine

    e = table(spark, sf_dir, "embeddings")
    q_rows = [
        (r["vec_id"], r["embedding"])
        for r in e.filter(F.col("vec_id") < 20)
        .select("vec_id", "embedding")
        .collect()
    ]

    w = W.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("neighbor_id").asc())
    block = (
        block_topk_cosine(e, q_rows, k=10)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
        .select("q_id", "neighbor_id", "rank", "cos")
    )

    u = e.select(
        "vec_id", norm(F.col("embedding")).alias("nrm"), "embedding"
    ).select(
        "vec_id",
        F.transform(
            to_double_array(F.col("embedding")), lambda x: x / F.col("nrm")
        ).alias("uv"),
    )
    q = u.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("q_id"), F.col("uv").alias("q_uv")
    )
    cos = F.aggregate(
        F.zip_with(F.col("q_uv"), F.col("uv"), lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    hof = (
        u.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("q_id"))
        .select("q_id", F.col("vec_id").alias("neighbor_id"), cos.alias("cos"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
        .select("q_id", "neighbor_id", "rank", "cos")
    )

    b_rows = sorted(map(tuple, block.collect()))
    h_rows = sorted(map(tuple, hof.collect()))
    assert b_rows == h_rows  # exact, including the doubles


def test_block_topk_empty_queries_and_nan_ordering(spark):
    """Two edge cases of block_topk_cosine: an empty query list returns
    an empty frame (not a shape-unpack crash), and a zero-norm corpus
    vector scores NULL (Arrow maps pandas NaN to SQL NULL) and ranks
    LAST — the documented degenerate-input semantics, internally
    consistent between the batch-local and global top-k orders."""
    from pyspark.sql import Window as W

    from dsacord_spark.operators.similarity import block_topk_cosine

    emb = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),
            (2, [0.9, 0.1]),
            (3, [0.0, 0.0]),  # zero norm -> NaN cosine against anything
        ],
        "vec_id long, embedding array<float>",
    )
    assert block_topk_cosine(emb, [], k=2).count() == 0

    q = [(1, [1.0, 0.0])]
    w = W.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("neighbor_id").asc())
    got = (
        block_topk_cosine(emb, q, k=2)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 2)
        .orderBy("rank")
        .collect()
    )
    # NULL-cosine degenerate vec 3 ranks after the 0.9-cosine vec 2
    assert [r["neighbor_id"] for r in got] == [2, 3]
    assert got[1]["cos"] is None


def test_ivf_blas_assignment_matches_declarative(spark, sf_dir):
    """The BLAS (mapInPandas dgemm+argmax) cell assignment and the
    declarative (broadcast crossJoin + window) path must agree end-to-end
    on the synthetic corpus: same cells, same neighbors, same ranks,
    same rounded cosines. Summation order differs (BLAS vs sequential
    fold), so this also guards against near-tie drift."""
    from dsacord_spark.plans.analysis import ann_ivf_topk, ann_ivf_topk_blas

    a = sorted(map(tuple, ann_ivf_topk(spark, sf_dir).collect()))
    b = sorted(map(tuple, ann_ivf_topk_blas(spark, sf_dir).collect()))
    assert a == b


def test_ivf_blas_nprobe_expansion(spark, sf_dir):
    """nprobe>1 emits one row per probe with ranks 1..nprobe, ties to
    the lower centroid id (stable argsort == the window's tie-break)."""
    from dsacord_spark.operators.similarity import assign_cells_blas

    emb = table(spark, sf_dir, "embeddings")
    cent = [
        (r["vec_id"], r["embedding"])
        for r in emb.orderBy("vec_id").limit(8).collect()
    ]
    rows = assign_cells_blas(emb.limit(20), cent, nprobe=3).collect()
    per_vec: dict = {}
    for r in rows:
        per_vec.setdefault(r["vec_id"], []).append(r["probe_rank"])
    assert len(per_vec) == 20
    assert all(sorted(v) == [1, 2, 3] for v in per_vec.values())


def test_ivf_kmeans_recall_floor(spark, sf_dir):
    """Trained centroids must not degrade recall vs the 0-iteration
    (first-n) quantizer at the same nprobe; assert a floor at the
    0-iter measured level (0.83 at sf0.001) minus slack for parameter
    retuning. Also sanity: training is deterministic (two runs agree)."""
    from dsacord_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk_kmeans,
        kmeans_centroids,
    )

    e = table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    bf = brute_force_topk(e, q, k=10).select("q_id", "neighbor_id")
    n_truth = bf.count()
    km = ivf_topk_kmeans(e, q, n_cells=16, nprobe=5, k=10, iters=3)
    recall = bf.join(km, ["q_id", "neighbor_id"]).count() / n_truth
    assert recall >= 0.80, recall

    c1 = kmeans_centroids(e, k=8, iters=2)
    c2 = kmeans_centroids(e, k=8, iters=2)
    assert c1 == c2


def test_persisted_ivf_index_prunes_partitions_and_matches_inmemory(
    spark, sf_dir, tmp_path
):
    """The cell-partitioned IVF lake must (a) answer identically to the
    in-memory ivf_topk_kmeans with the same parameters and (b) plan the
    probe scan with directory-level partition pruning — the physical
    'read nprobe/n_cells of the corpus' guarantee."""
    import io as _io
    import re
    from contextlib import redirect_stdout

    from dsacord_spark.operators.similarity import (
        build_ivf_index,
        ivf_topk_kmeans,
        query_ivf_index,
    )

    e = table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    path = str(tmp_path / "ivf")
    build_ivf_index(e, path, n_cells=16, iters=3)
    # materialize=False: the plan pin below needs the LAZY serving plan
    # (the default local-relation result has no scan to inspect)
    served = query_ivf_index(spark, path, q, nprobe=4, k=5,
                             materialize=False)
    mem = ivf_topk_kmeans(e, q, n_cells=16, nprobe=4, k=5, iters=3)
    assert sorted(map(tuple, served.collect())) == sorted(map(tuple, mem.collect()))

    buf = _io.StringIO()
    with redirect_stdout(buf):
        served.explain("formatted")
    plan = buf.getvalue()
    m = re.search(r"PartitionFilters: \[([^\]]*)", plan)
    assert m and "cell" in m.group(1), plan


def test_kmeans_small_and_empty_corpus(spark):
    """A corpus smaller than k trains fewer centroids (no IndexError);
    an empty corpus returns no centroids; the end-to-end top-k still
    works on the short corpus."""
    from dsacord_spark.operators.similarity import (
        ivf_topk_kmeans,
        kmeans_centroids,
    )

    emb = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(10)],
        "vec_id long, embedding array<float>",
    )
    assert len(kmeans_centroids(emb, k=16, iters=2)) == 10
    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    assert kmeans_centroids(empty, k=4) == []
    q = emb.limit(2).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    assert ivf_topk_kmeans(emb, q, n_cells=16, nprobe=4, k=3).count() == 6


def test_csv_duplicate_header_tolerated(spark):
    """Regression: a zip-member CSV with a duplicated header name parses
    through the row-parser tier (last occurrence wins, matching the
    reference's name->index map) instead of crashing the pyarrow tier's
    reindex."""
    from dsacord_spark.sources.zipsource import _parse_csv_frame

    pdf = _parse_csv_frame(b"uuid,uuid,category\na,b,c\n", "m")
    assert len(pdf) == 1
    assert pdf.iloc[0]["uuid"] == "b"
    assert pdf.iloc[0]["category"] == "c"
