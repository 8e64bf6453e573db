"""Golden-intent tests for the corpus-quality operators (plans/quality.py).

The oracle sweep only proves Spark and DuckDB AGREE; these pin the
intended semantics on hand-computed fixtures: exact boilerplate window
coverage (union of overlapping intervals), collection-frequency sums, and
label-centroid cosines.
"""

from __future__ import annotations

import math

import pytest

from dsacord_spark.plans.catalog import specs

_P = "a b c d e f g h"  # the 8-token boilerplate phrase (df = 3)


def _docs_dir(spark, tmp_path):
    rows = [
        # P at positions 1-8 of 16 tokens -> 8 covered, frac 0.5
        (1, _P + " x1 y1 z1 w1 v1 u1 t1 s1"),
        # P at positions 4-11 of 16 tokens -> same coverage
        (2, "x2 y2 z2 " + _P + " w2 v2 u2 t2 s2"),
        # P at 1-8 of 9 tokens -> frac 8/9
        (3, _P + " q3"),
        # no boilerplate at all
        (4, "m4 n4 o4 p4 q4 r4 s4 t4 u4 v4"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    return str(tmp_path)


def test_boilerplate_coverage_golden(spark, tmp_path):
    sf = _docs_dir(spark, tmp_path)
    out = {
        r["doc_id"]: r
        for r in specs()["text_boilerplate_coverage"].fn(spark, sf).collect()
    }
    assert set(out) == {1, 2, 3, 4}
    for doc, n_tok, n_boiler, keep in [
        (1, 16, 8, False),
        (2, 16, 8, False),
        (3, 9, 8, False),
        (4, 10, 0, True),
    ]:
        r = out[doc]
        assert r["n_tokens"] == n_tok, r
        assert r["n_boiler_tokens"] == n_boiler, r
        assert r["boiler_frac"] == pytest.approx(
            round(n_boiler / n_tok, 6), abs=0
        )
        assert r["keep"] is keep, r


def test_rarity_score_golden(spark, tmp_path):
    rows = [(1, "apple apple banana"), (2, "apple cherry")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    out = {
        r["doc_id"]: r
        for r in specs()["text_rarity_score"].fn(spark, str(tmp_path)).collect()
    }
    # cf: apple=3, banana=1, cherry=1
    assert out[1]["n_tokens"] == 3
    assert out[1]["sum_cf"] == 7
    assert out[1]["min_cf"] == 1
    assert out[1]["mean_cf"] == round(7 / 3, 6)
    assert out[2]["n_tokens"] == 2
    assert out[2]["sum_cf"] == 4
    assert out[2]["mean_cf"] == 2.0


def test_label_centroids_golden(spark, tmp_path):
    rows = [
        (0, [1.0, 0.0], 0),
        (1, [0.0, 1.0], 0),  # centroid label 0: (0.5, 0.5)
        (2, [1.0, 0.0], 1),  # centroid label 1: (1, 0)
        (3, [0.0, 2.0], 2),  # centroid label 2: (0, 2)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "embeddings.parquet")
    )
    out = {
        (r["label_a"], r["label_b"]): r
        for r in specs()["embed_label_centroids"].fn(spark, str(tmp_path)).collect()
    }
    assert set(out) == {(0, 1), (0, 2), (1, 2)}
    assert out[(0, 1)]["n_a"] == 2 and out[(0, 1)]["n_b"] == 1
    expect = round(0.5 / (math.sqrt(0.5) * 1.0), 6)  # 0.707107
    assert out[(0, 1)]["centroid_cosine"] == expect
    assert out[(0, 2)]["centroid_cosine"] == expect
    assert out[(1, 2)]["centroid_cosine"] == 0.0


def test_cms_overestimates_and_finds_true_heavy_hitter(spark, tmp_path):
    """CMS property pin on a vocabulary WIDER than the sketch (so
    collisions actually occur): estimates never undercount, and the
    dominant token still ranks first."""
    # 3000 distinct filler tokens (> _CMS_WIDTH buckets) + one token
    # repeated 500 times
    rows = [(i, " ".join(f"w{i}_{j}" for j in range(3))) for i in range(1000)]
    rows.append((9999, " ".join(["hot"] * 500)))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    out = specs()["text_heavy_hitters_cms"].fn(spark, str(tmp_path)).collect()
    assert len(out) == 10
    assert all(r["cms_count"] >= r["exact_count"] for r in out)
    top = out[0] if out[0]["rank"] == 1 else min(out, key=lambda r: r["rank"])
    assert top["token"] == "hot" and top["exact_count"] == 500


def test_pack_sequences_invariants(spark, sf_dir):
    """Packing-plan invariants on the real table: every doc lands in
    exactly one bin, shard streams are contiguous (each bin starts where
    the previous ended), and the bin id is the starting offset's
    512-token slot."""
    from collections import defaultdict

    from dsacord_spark.functions.text import tokens as _toks
    from pyspark.sql import functions as F

    out = specs()["corpus_pack_sequences"].fn(spark, sf_dir).collect()
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.size(_toks("text")).alias("n")
    ).filter(F.col("n") >= 1)
    total_docs, total_tokens = d.count(), d.agg(F.sum("n")).collect()[0][0]
    assert sum(r["n_docs"] for r in out) == total_docs
    assert sum(r["n_tokens"] for r in out) == total_tokens
    by_shard = defaultdict(list)
    for r in out:
        by_shard[r["shard"]].append(r)
        assert r["bin"] == r["start_offset"] // 512
    for rows in by_shard.values():
        rows.sort(key=lambda r: r["bin"])
        for prev, cur in zip(rows, rows[1:]):
            assert cur["start_offset"] == prev["end_offset"]
