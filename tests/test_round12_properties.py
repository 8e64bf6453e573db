"""Round-12 pins: the r11 ADVICE fixes (annctl stats null-cosine
weighted mean, _in_literals int64 gate, side-effect-free zero-batch
drain) and the IVF lease integration's registry semantics. The IVF id
side-index itself is pinned in tests/test_ivf_lifecycle.py."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F


def test_in_literals_int64_gate(spark):
    """r11 ADVICE: an int outside int64 must NOT take the bare-literal
    SQL fast path (it would parse as DECIMAL and silently change the
    comparison's coercion); the isin fallback errors loudly instead.
    Boundary values stay on the fast path."""
    from dsacord_spark.operators.dedup import _in_literals

    df = spark.createDataFrame(
        [(1,), (5,), (2**63 - 1,), (-(2**63),)], "c long"
    )
    got = df.filter(
        _in_literals("c", [1, 2**63 - 1, -(2**63)])
    ).count()
    assert got == 3  # boundary longs still served by the parsed-SQL path
    with pytest.raises(Exception, match="9223372036854775808"):
        df.filter(_in_literals("c", [1, 2**63])).count()
    # bool is an int subclass but type(v) is not int -> isin fallback,
    # whose analyzer rejects the type mix loudly (never a silently
    # rendered bare literal)
    with pytest.raises(Exception, match="DATATYPE_MISMATCH"):
        df.filter(_in_literals("c", [True])).count()


def test_shape_empty_drain_prefers_side_effect_free_path(spark):
    """r11 ADVICE: a zero-micro-batch drain must not run the per-batch
    transform's side effects. Pin the dispatch: drain_transform wins
    over batch_transform; without it the 2-arg contract still holds."""
    from dsacord_spark.streaming import pipeline as sp

    effects: list[str] = []

    def batch_t(b, batch_id):
        effects.append(f"batch:{batch_id}")
        return b

    out = sp._shape_empty_drain(
        spark, "doc_id long, h long", batch_t, True,
        lambda b: b.select("doc_id"),
    )
    assert out.columns == ["doc_id"] and out.count() == 0
    assert effects == [], "per-batch side effects ran on the drain"
    out = sp._shape_empty_drain(
        spark, "doc_id long, h long", batch_t, True, None
    )
    assert out.count() == 0 and effects == ["batch:0"]


def test_zero_batch_drain_is_side_effect_free(
    spark, sf_dir, monkeypatch
):
    """r11 ADVICE, end-to-end through the probes' own drain closures:
    when the bounded runner reports zero micro-batches, the index
    probes must shape their empty output WITHOUT firing on_batch_start
    (the maintenance hook could compact an index for a batch that never
    ran) and without eager snapshot checkpoints. The runner is stubbed
    to the zero-batch branch (under availableNow even an empty staged
    input runs one empty micro-batch, so the branch is defensive); the
    drain closures and the probe tails they build are the real ones."""
    from dsacord_spark.operators.dedup import (
        build_hamming_index,
        build_minhash_index,
    )
    from dsacord_spark.streaming import pipeline as sp

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .limit(40)
    )
    calls: list[int] = []

    def fake_runner(spark_, batch_df, transform, **kw):
        return sp._shape_empty_drain(
            spark_, transform(batch_df).schema, kw.get("batch_transform"),
            kw.get("pass_batch_id", False), kw.get("drain_transform"),
        )

    monkeypatch.setattr(sp, "run_bounded_stream", fake_runner)
    try:
        build_hamming_index(
            docs.select("doc_id", F.xxhash64("text").alias("h")),
            "doc_id", "h", "t_r12_drain_ham",
        )
        out = sp.stream_probe_hamming_index(
            spark, "t_r12_drain_ham",
            spark.createDataFrame([], "doc_id long, h long"),
            "doc_id", "h",
            refresh_every_n_batches=1,
            on_batch_start=calls.append,
        )
        assert out.count() == 0 and len(out.columns) >= 2
        assert calls == [], "hook fired for a batch that never ran"

        build_minhash_index(docs, "doc_id", "text", "t_r12_drain_mh")
        out = sp.stream_probe_minhash_index(
            spark, "t_r12_drain_mh",
            spark.createDataFrame([], "doc_id long, text string"),
            "doc_id", "text",
            refresh_every_n_batches=1,
            on_batch_start=calls.append,
        )
        assert out.count() == 0 and len(out.columns) >= 2
        assert calls == [], "hook fired for a batch that never ran"
    finally:
        for t in ("t_r12_drain_ham", "t_r12_drain_mh"):
            for suffix in ("_summary", "_bands", "_shingles", "_meta"):
                spark.sql(f"DROP TABLE IF EXISTS {t}{suffix}")


def test_annctl_stats_survives_null_mean_cos(spark, tmp_path, capsys):
    """r11 ADVICE (medium): a cell whose members are all zero-norm
    vectors is legal input — cosine is NULL via try_divide, so the cell
    reports n_vecs>0 with mean_cos=None. `annctl stats` must weight the
    summary mean over the SCORED cells only (divided by their n_vecs,
    not the grand total) instead of dying with a TypeError."""
    from dsacord_spark.annctl import main
    from dsacord_spark.operators.similarity import _hadoop_write_text

    path = str(tmp_path / "nullcos")
    spark.createDataFrame(
        [
            (1, [1.0, 0.0], 0), (2, [1.0, 0.0], 0),
            (3, [0.0, 0.0], 1), (4, [0.0, 0.0], 1),
        ],
        "vec_id long, embedding array<float>, cell long",
    ).write.partitionBy("cell").parquet(path)
    _hadoop_write_text(
        spark, f"{path}/_ivf_centroids.json",
        json.dumps({
            "n_cells": 2, "id_col": "vec_id", "vec_col": "embedding",
            "centroids": [[0, [1.0, 0.0]], [1, [0.0, 0.0]]],
        }),
    )
    assert main(["stats", "--index", path]) == 0
    lines = [
        json.loads(ln)
        for ln in capsys.readouterr().out.splitlines()
        if ln.startswith("{")
    ]
    per_cell = {d["cell"]: d for d in lines if "cell" in d}
    assert per_cell[1]["n_vecs"] == 2 and per_cell[1]["mean_cos"] is None
    summary = lines[-1]
    assert summary["n_vecs"] == 4 and summary["empty_cells"] == 0
    # weighted over cell 0's two scored vectors only: cos == 1.0
    assert summary["mean_cos"] == pytest.approx(1.0, abs=1e-6)


def test_ivf_lease_names_normalize_trailing_slash():
    """`a/b` and `a/b/` must coordinate as ONE index in the lease
    registry — otherwise a query on one spelling wouldn't block a
    retrain on the other."""
    from dsacord_spark import leases
    from dsacord_spark.operators.similarity import _ivf_lease_name

    name = _ivf_lease_name("/tmp/ivf_x/")
    assert name == _ivf_lease_name("/tmp/ivf_x")
    with leases.stream_lease(name):
        with pytest.raises(leases._MaintenanceBlocked):
            with leases.maintenance_lease(_ivf_lease_name("/tmp/ivf_x")):
                pass
