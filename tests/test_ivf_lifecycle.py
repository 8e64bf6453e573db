"""IVF lake lifecycle (r11): daily append with frozen centroids,
per-cell drift/imbalance stats, and atomic retrain — the ANN twin of
the dedup indexes' build/probe/append/compact loop. Correctness anchor
throughout: a query with nprobe == n_cells scans every cell partition,
so its top-k must equal brute force over the lake's current contents,
whatever sequence of appends/retrains produced the layout."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dsacord_spark.operators.similarity import (
    append_ivf_index,
    brute_force_topk,
    build_ivf_index,
    ivf_index_stats,
    query_ivf_index,
    retrain_ivf_index,
)

N_CELLS = 4


@pytest.fixture()
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )


def _queries(emb):
    return emb.filter(F.col("vec_id") % 97 == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )


def _exhaustive(spark, path, emb, k=3):
    """nprobe == n_cells -> every cell scanned -> must equal brute
    force over the same corpus."""
    got = sorted(map(tuple, query_ivf_index(
        spark, path, _queries(emb), nprobe=N_CELLS, k=k
    ).select("q_id", "neighbor_id", "rank").collect()))
    corpus = spark.read.parquet(path).select("vec_id", "embedding")
    want = sorted(map(tuple, brute_force_topk(
        corpus, _queries(emb), k=k
    ).select("q_id", "neighbor_id", "rank").collect()))
    assert got == want, "exhaustive-probe != brute force"
    return got


def test_append_assigns_with_frozen_centroids(spark, emb, tmp_path):
    """Append = assignment to the index's OWN centroids: the sidecar is
    byte-stable across appends, the appended rows land in valid cell
    partitions, and an exhaustive-probe query over the grown lake still
    equals brute force."""
    import json
    import os

    from dsacord_spark.operators.similarity import _hadoop_read_text

    path = str(tmp_path / "ivf")
    half_a = emb.filter(F.col("vec_id") % 2 == 0)
    half_b = emb.filter(F.col("vec_id") % 2 == 1)
    build_ivf_index(half_a, path, n_cells=N_CELLS)
    meta0 = _hadoop_read_text(
        spark, os.path.join(path, "_ivf_centroids.json"))
    n_a = spark.read.parquet(path).count()

    appended = append_ivf_index(spark, path, half_b)
    assert appended == half_b.count()
    assert spark.read.parquet(path).count() == n_a + appended
    # centroids untouched by the append
    assert _hadoop_read_text(
        spark, os.path.join(path, "_ivf_centroids.json")) == meta0
    # every appended row sits in a trained cell partition
    cells = {r[0] for r in
             spark.read.parquet(path).select("cell").distinct().collect()}
    assert cells <= set(range(N_CELLS))
    _exhaustive(spark, path, emb)
    # sanity on the sidecar shape the lifecycle relies on
    meta = json.loads(meta0)
    assert meta["n_cells"] == N_CELLS and meta["id_col"] == "vec_id"


def test_append_is_retry_idempotent(spark, emb, tmp_path):
    """The daily contract: replaying a batch appends 0 rows and leaves
    query results byte-identical; skip_existing=False documents the
    raw append-anything behavior."""
    path = str(tmp_path / "ivf")
    build_ivf_index(emb.filter(F.col("vec_id") < 250), path,
                    n_cells=N_CELLS)
    batch = emb.filter(F.col("vec_id") >= 250)
    assert append_ivf_index(spark, path, batch) == batch.count()
    before = _exhaustive(spark, path, emb)
    assert append_ivf_index(spark, path, batch) == 0  # replay no-op
    assert _exhaustive(spark, path, emb) == before
    # a half-overlapping batch appends only the genuinely new rows
    assert append_ivf_index(spark, path, emb) == 0  # all present


def test_stats_track_growth_and_stay_jvm_side(spark, emb, tmp_path):
    """ivf_index_stats: counts sum to the lake size, cosines are valid
    and per-cell means never exceed 1; the plan carries NO Python eval
    nodes (the centroid join is a broadcast of k rows, the cosine is
    Column algebra)."""
    path = str(tmp_path / "ivf")
    build_ivf_index(emb.filter(F.col("vec_id") < 250), path,
                    n_cells=N_CELLS)
    s0 = {r["cell"]: r for r in ivf_index_stats(spark, path).collect()}
    assert sum(r["n_vecs"] for r in s0.values()) == \
        spark.read.parquet(path).count()
    append_ivf_index(spark, path, emb.filter(F.col("vec_id") >= 250))
    s1 = {r["cell"]: r for r in ivf_index_stats(spark, path).collect()}
    assert sum(r["n_vecs"] for r in s1.values()) == \
        spark.read.parquet(path).count()
    assert sum(r["n_vecs"] for r in s1.values()) > \
        sum(r["n_vecs"] for r in s0.values())
    for r in s1.values():
        if r["n_vecs"] == 0:  # dead cell: reported, cosines null
            assert r["mean_cos"] is None and r["min_cos"] is None
            continue
        assert -1.0 - 1e-9 <= r["min_cos"] <= r["mean_cos"] <= 1.0 + 1e-9
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        ivf_index_stats(spark, path).explain("formatted")
    import re

    assert not re.search(
        r"BatchEvalPython|ArrowEvalPython|MapInPandas|PythonMapInArrow",
        buf.getvalue(),
    ), "stats plan must stay JVM-side"


def test_retrain_swaps_atomically_and_stays_correct(spark, emb,
                                                    tmp_path):
    """retrain_ivf_index: after appends, retraining rewrites the lake
    under fresh centroids with NO residue directories, preserves every
    row, refreshes the sidecar, and the exhaustive-probe check still
    equals brute force. The mean cosine-to-centroid must not get worse:
    retraining re-fits the quantizer to the data appends drifted."""
    import os

    path = str(tmp_path / "ivf")
    build_ivf_index(emb.filter(F.col("vec_id") < 150), path,
                    n_cells=N_CELLS, iters=2)
    append_ivf_index(spark, path, emb.filter(F.col("vec_id") >= 150))
    n_before = spark.read.parquet(path).count()

    def wmean_cos(stats_rows):
        n = sum(r["n_vecs"] for r in stats_rows)
        return sum(r["n_vecs"] * r["mean_cos"] for r in stats_rows) / n

    drifted = wmean_cos(ivf_index_stats(spark, path).collect())
    out = retrain_ivf_index(spark, path, iters=3)
    assert out == {"n_vecs": n_before, "n_cells": N_CELLS,
                   "cells_before": N_CELLS}
    assert spark.read.parquet(path).count() == n_before
    assert not os.path.exists(path + "__retrain")
    assert not os.path.exists(path + "__old")
    refit = wmean_cos(ivf_index_stats(spark, path).collect())
    assert refit >= drifted - 1e-9, (refit, drifted)
    _exhaustive(spark, path, emb)
    # appends keep working against the refreshed sidecar
    assert append_ivf_index(spark, path, emb) == 0


def test_missing_sidecar_raises_rebuild_diagnostic(spark, emb,
                                                   tmp_path):
    path = str(tmp_path / "noidx")
    emb.limit(5).withColumn("cell", F.lit(0)) \
        .write.partitionBy("cell").parquet(path)
    with pytest.raises(ValueError, match="rebuild with build_ivf_index"):
        append_ivf_index(spark, path, emb.limit(1))
    with pytest.raises(ValueError, match="rebuild with build_ivf_index"):
        ivf_index_stats(spark, path)


def test_annctl_cli_daily_loop(spark, emb, tmp_path, capsys):
    """The composed CLI runbook end-to-end: build -> append (twice — the
    replay must report appended=0) -> stats -> query -> retrain ->
    query again. Every subcommand emits one parseable JSON summary
    line; the query output equals brute force at nprobe == cells."""
    import json

    from dsacord_spark.annctl import main

    root = str(tmp_path)
    idx = f"{root}/idx"
    emb.filter(F.col("vec_id") < 250).write.parquet(f"{root}/day0")
    emb.filter(F.col("vec_id") >= 250).write.parquet(f"{root}/day1")
    _queries(emb).select(
        F.col("q_id").alias("vec_id"), F.col("q_vec").alias("embedding")
    ).write.parquet(f"{root}/q")

    def run(*argv):
        assert main(list(argv)) == 0
        lines = [ln for ln in capsys.readouterr().out.splitlines()
                 if ln.strip().startswith("{")]
        return [json.loads(ln) for ln in lines]

    built = run("build", "--input", f"{root}/day0", "--index", idx,
                "--cells", str(N_CELLS), "--iters", "2",
                "--id-index", "t_annctl_ids")[-1]
    assert built["n_vecs"] == 250 and built["id_index"] == "t_annctl_ids"
    a1 = run("append", "--input", f"{root}/day1", "--index", idx)[-1]
    assert a1["appended"] == emb.filter(F.col("vec_id") >= 250).count()
    a2 = run("append", "--input", f"{root}/day1", "--index", idx)[-1]
    assert a2["appended"] == 0  # replay no-op, reported honestly
    s = run("stats", "--index", idx)
    assert len(s) == N_CELLS + 1  # one line per cell + the summary
    assert s[-1]["n_vecs"] == emb.count() and s[-1]["imbalance"] >= 1.0
    qr = run("query", "--input", f"{root}/q", "--index", idx,
             "--output", f"{root}/out", "--nprobe", str(N_CELLS),
             "--k", "3")[-1]
    got = sorted(map(tuple, spark.read.parquet(f"{root}/out")
                 .select("q_id", "neighbor_id", "rank").collect()))
    want = sorted(map(tuple, brute_force_topk(
        spark.read.parquet(idx).select("vec_id", "embedding"),
        _queries(emb), k=3,
    ).select("q_id", "neighbor_id", "rank").collect()))
    assert got == want and qr["result_rows"] == len(got)
    rt = run("retrain", "--index", idx)[-1]
    assert rt["n_vecs"] == emb.count()
    run("query", "--input", f"{root}/q", "--index", idx,
        "--output", f"{root}/out2", "--nprobe", str(N_CELLS), "--k", "3")
    got2 = sorted(map(tuple, spark.read.parquet(f"{root}/out2")
                  .select("q_id", "neighbor_id", "rank").collect()))
    assert got2 == want  # exhaustive probe invariant to the re-layout
    # the id side-index tracked the whole loop (append + retrain)
    assert spark.table("t_annctl_ids").count() == emb.count()
    spark.sql("DROP TABLE IF EXISTS t_annctl_ids")


def test_stats_report_dead_cells(spark, tmp_path, capsys):
    """r11 review: a trained cell with NO members (k-means left it
    empty, or appends drained it) must appear in the report at
    n_vecs=0 / null cosines — hiding it understated imbalance (max/mean
    over occupied cells reads 'healthy' while half the quantizer is
    dead). Hand-write a lake whose sidecar declares 2 cells but whose
    rows all sit in cell 0."""
    import json

    from dsacord_spark.annctl import main
    from dsacord_spark.operators.similarity import _hadoop_write_text

    path = str(tmp_path / "deadcell")
    spark.createDataFrame(
        [(1, [1.0, 0.0], 0), (2, [0.9, 0.1], 0)],
        "vec_id long, embedding array<float>, cell long",
    ).write.partitionBy("cell").parquet(path)
    _hadoop_write_text(
        spark, f"{path}/_ivf_centroids.json",
        json.dumps({
            "n_cells": 2, "id_col": "vec_id", "vec_col": "embedding",
            "centroids": [[0, [1.0, 0.0]], [1, [0.0, 1.0]]],
        }),
    )
    rows = {r["cell"]: r for r in ivf_index_stats(spark, path).collect()}
    assert set(rows) == {0, 1}
    assert rows[0]["n_vecs"] == 2 and rows[0]["mean_cos"] > 0.9
    assert rows[1]["n_vecs"] == 0
    assert rows[1]["mean_cos"] is None and rows[1]["min_cos"] is None
    assert main(["stats", "--index", path]) == 0
    summary = json.loads(
        [ln for ln in capsys.readouterr().out.splitlines()
         if ln.startswith("{")][-1])
    assert summary["cells"] == 2 and summary["empty_cells"] == 1
    assert summary["imbalance"] == 2.0  # max(2,0) / mean(2,0)=1 -> 2.0
    assert summary["mean_cos"] is not None


def test_compact_blocks_new_streams_and_streams_block_compact(spark):
    """r11 review (TOCTOU): the mid-batch check and the maintenance
    claim are one atomic step under the registry lock, and the guard is
    two-directional — a stream cannot START while a maintenance rewrite
    holds the index."""
    from dsacord_spark import leases

    with leases.maintenance_lease("t_r11_toctou"):
        with pytest.raises(RuntimeError, match="maintenance"):
            with leases.stream_lease("t_r11_toctou"):
                pass
        # an unrelated index is unaffected
        with leases.stream_lease("t_r11_other"):
            pass
    # released: streams may start again
    with leases.stream_lease("t_r11_toctou"):
        with pytest.raises(leases._MaintenanceBlocked):
            with leases.maintenance_lease("t_r11_toctou"):
                pass
        # force overrides, as compact_index(force=True) documents
        with leases.maintenance_lease("t_r11_toctou", force=True):
            pass
    assert leases.blocking_leases("t_r11_toctou") == 0


def test_append_with_id_index_bounded_and_idempotent(spark, emb,
                                                     tmp_path):
    """r12 verdict item 1: with `id_index_table` set at build time, the
    daily append keeps the full retry-idempotence contract (replay -> 0,
    half-overlap -> only the new rows) while every per-append read is
    batch-sized. Invariants pinned per append: the side index holds
    exactly the lake's id set, the `_ivf_pending` marker is gone, and
    the exhaustive probe still equals brute force."""
    import os

    idx = "t_ivf_idx_bounded"
    path = str(tmp_path / "ivf")
    try:
        build_ivf_index(emb.filter(F.col("vec_id") < 250), path,
                        n_cells=N_CELLS, id_index_table=idx)
        assert spark.table(idx).count() == \
            spark.read.parquet(path).count()

        batch = emb.filter(F.col("vec_id") >= 250)
        assert append_ivf_index(spark, path, batch) == batch.count()
        assert not os.path.exists(os.path.join(path, "_ivf_pending"))
        assert spark.table(idx).count() == \
            spark.read.parquet(path).count()

        before = _exhaustive(spark, path, emb)
        assert append_ivf_index(spark, path, batch) == 0  # replay no-op
        assert _exhaustive(spark, path, emb) == before
        assert append_ivf_index(spark, path, emb) == 0  # all present
        # index stayed a set: one row per lake row, no duplicates
        ids = spark.table(idx)
        assert ids.count() == ids.distinct().count() == \
            spark.read.parquet(path).count()
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {idx}")


def test_append_id_index_crash_window_recovery(spark, emb, tmp_path,
                                               monkeypatch):
    """The lake-write -> index-write crash window: simulate a driver
    death AFTER the lake append but BEFORE the index append (the index
    write raises), then replay the batch. The `_ivf_pending` marker
    must route the replay through recovery: zero rows re-appended (no
    duplicates), the index healed to the lake's id set, the marker
    deleted, and the exhaustive probe equal to brute force."""
    import os

    from pyspark.sql.readwriter import DataFrameWriter

    idx = "t_ivf_idx_crash"
    path = str(tmp_path / "ivf")
    try:
        build_ivf_index(emb.filter(F.col("vec_id") < 250), path,
                        n_cells=N_CELLS, id_index_table=idx)
        batch = emb.filter(F.col("vec_id") >= 250)

        def boom(self, name, *a, **kw):
            raise RuntimeError("simulated crash before index write")

        with monkeypatch.context() as m:
            m.setattr(DataFrameWriter, "saveAsTable", boom)
            with pytest.raises(RuntimeError, match="simulated crash"):
                append_ivf_index(spark, path, batch)
        # crash state: rows in the lake, marker present, index stale
        assert os.path.exists(os.path.join(path, "_ivf_pending"))
        assert spark.read.parquet(path).count() == 250 + batch.count()
        assert spark.table(idx).count() == 250

        assert append_ivf_index(spark, path, batch) == 0  # replay heals
        assert not os.path.exists(os.path.join(path, "_ivf_pending"))
        lake = spark.read.parquet(path)
        assert lake.count() == lake.select("vec_id").distinct().count()
        assert spark.table(idx).count() == lake.count()
        _exhaustive(spark, path, emb)
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {idx}")


def test_retrain_rebuilds_id_index_and_appends_stay_bounded(spark, emb,
                                                            tmp_path):
    """retrain with an id side-index: the rebuilt table matches the
    retrained lake's id set, the sidecar still names it, and the next
    replayed append is still a no-op (the drop-or-rebuild rule from the
    r10 rebuild's phantom-key fix, applied to the IVF lake)."""
    import json
    import os

    from dsacord_spark.operators.similarity import _hadoop_read_text

    idx = "t_ivf_idx_retrain"
    path = str(tmp_path / "ivf")
    try:
        build_ivf_index(emb.filter(F.col("vec_id") < 250), path,
                        n_cells=N_CELLS, id_index_table=idx)
        batch = emb.filter(F.col("vec_id") >= 250)
        append_ivf_index(spark, path, batch)
        retrain_ivf_index(spark, path, iters=2)
        meta = json.loads(_hadoop_read_text(
            spark, os.path.join(path, "_ivf_centroids.json")))
        assert meta["id_index_table"] == idx
        assert spark.table(idx).count() == \
            spark.read.parquet(path).count()
        assert append_ivf_index(spark, path, batch) == 0  # still replay-safe
        assert append_ivf_index(spark, path, emb) == 0
        _exhaustive(spark, path, emb)
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {idx}")


def test_append_adopts_missing_id_index(spark, emb, tmp_path):
    """A sidecar that names a MISSING table (crashed build bootstrap, or
    the table was dropped) is healed by the next append: one bootstrap
    scan, then the bounded path — and the append itself stays exact."""
    idx = "t_ivf_idx_adopt"
    path = str(tmp_path / "ivf")
    try:
        build_ivf_index(emb.filter(F.col("vec_id") < 250), path,
                        n_cells=N_CELLS, id_index_table=idx)
        spark.sql(f"DROP TABLE {idx}")  # simulate the crashed bootstrap
        batch = emb.filter(F.col("vec_id") >= 250)
        assert append_ivf_index(spark, path, batch) == batch.count()
        assert spark.table(idx).count() == \
            spark.read.parquet(path).count()
        assert append_ivf_index(spark, path, batch) == 0
        _exhaustive(spark, path, emb)
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {idx}")


def test_query_retrain_append_interleaving_guard(spark, emb, tmp_path):
    """r12 verdict item 3: the IVF lifecycle coordinates through the
    lease registry. A stream lease (an in-flight query) blocks retrain
    AND append before they mutate anything; a maintenance lease (an
    in-flight retrain/append) refuses a new query with a retry
    diagnostic — both directions through the REAL lifecycle functions."""
    import os

    from dsacord_spark import leases
    from dsacord_spark.operators.similarity import (
        _hadoop_read_text,
        _ivf_lease_name,
    )

    path = str(tmp_path / "ivf")
    build_ivf_index(emb.filter(F.col("vec_id") < 250), path,
                    n_cells=N_CELLS)
    sidecar = os.path.join(path, "_ivf_centroids.json")
    meta0 = _hadoop_read_text(spark, sidecar)
    name = _ivf_lease_name(path)
    batch = emb.filter(F.col("vec_id") >= 250)

    with leases.stream_lease(name):  # an in-flight query's lease
        with pytest.raises(leases._MaintenanceBlocked):
            retrain_ivf_index(spark, path)
        with pytest.raises(leases._MaintenanceBlocked):
            append_ivf_index(spark, path, batch)
    # neither refused op touched the lake
    assert _hadoop_read_text(spark, sidecar) == meta0
    assert spark.read.parquet(path).count() == 250

    with leases.maintenance_lease(name):  # an in-flight rewrite
        with pytest.raises(RuntimeError, match="maintenance"):
            query_ivf_index(spark, path, _queries(emb), nprobe=1, k=1)
    # released: the full lifecycle proceeds
    assert append_ivf_index(spark, path, batch) == batch.count()
    _exhaustive(spark, path, emb)


def test_append_id_index_probe_plan_is_bounded(spark, emb, tmp_path):
    """Plan pin for the bounded daily probe (the join append_ivf_index
    builds): the id side-index feeds its anti-join as a bucketed scan
    with NO Exchange between them, and the probe plan contains NO scan
    of the lake directory at all — the full-lake id read the r11 shape
    paid is gone from the daily path."""
    import io as _io
    import re
    from contextlib import redirect_stdout

    from dsacord_spark.operators.similarity import (
        _read_ivf_meta,
        assign_cells_blas,
    )
    from tests.test_scale_plans import _parents_until_join

    idx = "t_ivf_idx_plan"
    path = str(tmp_path / "ivf")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        build_ivf_index(emb, path, n_cells=N_CELLS, id_index_table=idx)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        meta = _read_ivf_meta(spark, path)
        batch = emb.limit(50).select("vec_id", "embedding")
        assigned = assign_cells_blas(
            batch, [(int(c), v) for c, v in meta["centroids"]],
            "vec_id", "embedding", nprobe=1,
        ).drop("probe_rank")
        probed = assigned.join(
            spark.table(idx).select("vec_id"), "vec_id", "left_anti"
        )
        buf = _io.StringIO()
        with redirect_stdout(buf):
            probed.explain("formatted")
        plan = buf.getvalue()
        assert plan.count("Bucketed: true") == 1, plan
        chain = _parents_until_join(plan, idx)
        assert not any("Exchange" in c for c in chain), chain
        # no lake read anywhere in the probe (the other scan in the
        # plan is the batch's own parquet input): the lake directory
        # never appears as a scan location
        assert path not in plan, re.findall(r"Location[^\n]*", plan)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql(f"DROP TABLE IF EXISTS {idx}")


def test_retrain_trigger_expression_semantics():
    """The --retrain-if mini-grammar: and binds tighter than or, null
    metrics never trigger, unknown metrics and malformed clauses raise
    (a typo must not silently never-trigger)."""
    from dsacord_spark.annctl import eval_retrain_trigger as ev

    s = {"imbalance": 2.5, "mean_cos": 0.95, "n_vecs": 100,
         "empty_cells": 0, "cells": 4}
    assert ev("imbalance>2.0", s)
    assert not ev("mean_cos<0.9", s)
    assert ev("imbalance>2.0 or mean_cos<0.9", s)
    assert not ev("imbalance>2.0 and mean_cos<0.9", s)
    # or binds last: (A and B) or C
    assert ev("imbalance>2.0 and mean_cos<0.9 or n_vecs>=100", s)
    assert ev("empty_cells==0", s) and ev("cells!=5", s)
    assert not ev("mean_cos<0.9", {**s, "mean_cos": None})  # null: false
    with pytest.raises(ValueError, match="unknown metric"):
        ev("imblance>2.0", s)
    with pytest.raises(ValueError, match="bad --retrain-if clause"):
        ev("imbalance >> 2", s)


def test_annctl_stats_retrain_if_closes_the_loop(spark, tmp_path,
                                                 capsys):
    """r12 verdict item 7: `annctl stats --retrain-if EXPR` acts on the
    drift report. A drifted lake (every vector crowded into one of two
    trained cells -> imbalance 2.0) triggers the retrain and records it
    in the summary; a healthy lake does not, and its sidecar stays
    byte-identical."""
    import json

    from dsacord_spark.annctl import main
    from dsacord_spark.operators.similarity import (
        _hadoop_read_text,
        _hadoop_write_text,
    )

    def mk_lake(path, rows):
        spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, cell long",
        ).write.partitionBy("cell").parquet(path)
        _hadoop_write_text(
            spark, f"{path}/_ivf_centroids.json",
            json.dumps({
                "n_cells": 2, "id_col": "vec_id",
                "vec_col": "embedding",
                "centroids": [[0, [1.0, 0.0]], [1, [0.0, 1.0]]],
            }),
        )

    def run(*argv):
        assert main(list(argv)) == 0
        return [json.loads(ln) for ln in
                capsys.readouterr().out.splitlines()
                if ln.startswith("{")][-1]

    rule = "imbalance>1.5 or mean_cos<0.8"

    healthy = str(tmp_path / "healthy")
    mk_lake(healthy, [(1, [1.0, 0.0], 0), (2, [0.9, 0.1], 0),
                      (3, [0.0, 1.0], 1), (4, [0.1, 0.9], 1)])
    meta0 = _hadoop_read_text(spark, f"{healthy}/_ivf_centroids.json")
    s = run("stats", "--index", healthy, "--retrain-if", rule)
    assert s["retrain_triggered"] is False and "retrain" not in s
    assert _hadoop_read_text(
        spark, f"{healthy}/_ivf_centroids.json") == meta0

    drifted = str(tmp_path / "drifted")  # all appends piled into cell 0
    mk_lake(drifted, [(1, [1.0, 0.0], 0), (2, [0.7, 0.7], 0),
                      (3, [0.6, 0.8], 0), (4, [0.8, 0.6], 0)])
    meta0 = _hadoop_read_text(spark, f"{drifted}/_ivf_centroids.json")
    s = run("stats", "--index", drifted, "--retrain-if", rule,
            "--retrain-iters", "2")
    assert s["imbalance"] == 2.0 and s["retrain_triggered"] is True
    assert s["retrain"]["n_vecs"] == 4 and s["retrain"]["n_cells"] == 2
    # the retrain re-fit the quantizer: sidecar rewritten, lake intact,
    # and the re-read report is balanced again
    assert _hadoop_read_text(
        spark, f"{drifted}/_ivf_centroids.json") != meta0
    s2 = run("stats", "--index", drifted, "--retrain-if", rule)
    assert s2["n_vecs"] == 4 and s2["retrain_triggered"] is False


def test_stream_probe_ivf_matches_batch_query(spark, emb, tmp_path):
    """stream_probe_ivf_index (r12): query vectors arriving as a stream,
    served per micro-batch from the persisted lake. Per-query results
    are batching-independent, so the drained output must equal the
    batch query_ivf_index over the same queries — and maintenance
    driven from the on_batch_start boundary hook (a daily append before
    batch 0) is visible to every batch."""
    from dsacord_spark.streaming.pipeline import stream_probe_ivf_index

    path = str(tmp_path / "ivf")
    build_ivf_index(emb.filter(F.col("vec_id") < 250), path,
                    n_cells=N_CELLS)
    late = emb.filter(F.col("vec_id") >= 250)
    hooked: list[int] = []

    def hook(batch_id: int) -> None:
        hooked.append(batch_id)
        if batch_id == 0:
            # maintenance from the boundary: the lease is non-blocking
            # here, so the daily append completes synchronously and
            # every batch (including this one) probes the grown lake
            assert append_ivf_index(spark, path, late) == late.count()

    q = _queries(emb)
    got = sorted(map(tuple, stream_probe_ivf_index(
        spark, path, q, nprobe=N_CELLS, k=3, on_batch_start=hook,
    ).select("q_id", "neighbor_id", "rank").collect()))
    assert hooked and hooked[0] == 0
    want = sorted(map(tuple, query_ivf_index(
        spark, path, q, nprobe=N_CELLS, k=3,
    ).select("q_id", "neighbor_id", "rank").collect()))
    assert got == want
    # and the exhaustive-probe == brute-force anchor over the grown lake
    _exhaustive(spark, path, emb)


def test_stream_probe_ivf_blocks_maintenance_mid_stream(spark, emb,
                                                        tmp_path):
    """While the ANN stream lease is live (not at a boundary), a
    maintenance op refuses — the stream cannot have the lake swapped
    out from under an in-flight probe plan."""
    from dsacord_spark import leases
    from dsacord_spark.operators.similarity import _ivf_lease_name
    from dsacord_spark.streaming.pipeline import stream_probe_ivf_index

    path = str(tmp_path / "ivf")
    build_ivf_index(emb.filter(F.col("vec_id") < 250), path,
                    n_cells=N_CELLS)
    refusals: list[str] = []

    def hostile_hook(batch_id: int) -> None:
        # simulate a SECOND thread's maintenance attempt arriving while
        # the stream is mid-batch: leave the boundary window first
        lease = leases._LEASES[_ivf_lease_name(path)][0]
        lease.at_boundary = False
        try:
            retrain_ivf_index(spark, path)
        except leases._MaintenanceBlocked:
            refusals.append("blocked")
        finally:
            lease.at_boundary = True

    out = stream_probe_ivf_index(
        spark, path, _queries(emb), nprobe=1, k=1,
        on_batch_start=hostile_hook,
    )
    assert out.count() > 0
    assert refusals, "mid-batch retrain was not refused"


def test_quantized_lake_serving(spark, emb, tmp_path):
    """r12 SQ8 serving: a quantize=True lake stores an int8 `__q8`
    column; `query_ivf_index(shortlist=N)` serves coarse-int8 +
    exact-rerank. With the shortlist covering the probed corpus the
    result is EXACTLY brute force (the approximation vanishes); at a
    tight shortlist the top-1 neighbor survives quantization for most
    queries (recall floor pinned on the deterministic fixture). The
    daily loop (append with frozen centroids, retrain) preserves the
    quantized column and flag."""
    path = str(tmp_path / "ivfq")
    build_ivf_index(emb.filter(F.col("vec_id") < 250), path,
                    n_cells=N_CELLS, quantize=True)
    schema = dict(spark.read.parquet(path).dtypes)
    assert schema["__q8"] == "array<tinyint>"

    q = _queries(emb)

    def served(shortlist, k=3):
        return sorted(map(tuple, query_ivf_index(
            spark, path, q, nprobe=N_CELLS, k=k, shortlist=shortlist,
        ).select("q_id", "neighbor_id", "rank").collect()))

    def exact(k=3):
        corpus = spark.read.parquet(path).select("vec_id", "embedding")
        return sorted(map(tuple, brute_force_topk(
            corpus, q, k=k
        ).select("q_id", "neighbor_id", "rank").collect()))

    assert served(shortlist=100_000) == exact()  # degenerates to exact

    tight = served(shortlist=20)
    want = exact()
    top1_want = {(r[0], r[1]) for r in want if r[2] == 1}
    top1_got = {(r[0], r[1]) for r in tight if r[2] == 1}
    recall1 = len(top1_want & top1_got) / len(top1_want)
    assert recall1 >= 0.8, recall1  # deterministic fixture

    # daily loop keeps the quantized column flowing
    batch = emb.filter(F.col("vec_id") >= 250)
    assert append_ivf_index(spark, path, batch) == batch.count()
    assert append_ivf_index(spark, path, batch) == 0
    assert dict(spark.read.parquet(path).dtypes)["__q8"] == \
        "array<tinyint>"
    assert served(shortlist=100_000) == exact()  # over the grown lake
    retrain_ivf_index(spark, path, iters=2)
    assert dict(spark.read.parquet(path).dtypes)["__q8"] == \
        "array<tinyint>"
    assert served(shortlist=100_000) == exact()

    # a plain lake refuses the quantized path with a rebuild diagnostic
    plain = str(tmp_path / "plain")
    build_ivf_index(emb.limit(50), plain, n_cells=2)
    with pytest.raises(ValueError, match="quantize=True"):
        query_ivf_index(spark, plain, q, shortlist=10)


def test_quantized_lake_with_id_index_append(spark, emb, tmp_path):
    """The two r12 lake options compose: a quantized lake with an id
    side-index appends through the marker protocol carrying `__q8`,
    stays replay-idempotent, and serves exactly at a covering
    shortlist."""
    idx = "t_ivf_q_idx"
    path = str(tmp_path / "ivfqi")
    try:
        build_ivf_index(emb.filter(F.col("vec_id") < 250), path,
                        n_cells=N_CELLS, quantize=True,
                        id_index_table=idx)
        batch = emb.filter(F.col("vec_id") >= 250)
        assert append_ivf_index(spark, path, batch) == batch.count()
        assert append_ivf_index(spark, path, batch) == 0
        assert dict(spark.read.parquet(path).dtypes)["__q8"] == \
            "array<tinyint>"
        assert spark.table(idx).count() == \
            spark.read.parquet(path).count()
        q = _queries(emb)
        got = sorted(map(tuple, query_ivf_index(
            spark, path, q, nprobe=N_CELLS, k=3, shortlist=100_000,
        ).select("q_id", "neighbor_id", "rank").collect()))
        want = sorted(map(tuple, brute_force_topk(
            spark.read.parquet(path).select("vec_id", "embedding"),
            q, k=3,
        ).select("q_id", "neighbor_id", "rank").collect()))
        assert got == want
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {idx}")


def test_quantized_rerank_plan_prunes_columns(spark, emb, tmp_path):
    """Plan pin for the SQ8 serving split: the RERANK plan (what
    materialize=False returns — the coarse phase already ran inside the
    call) reads only (id, vec, __vn) — never the `__q8` coarse column —
    and carries the shortlist's literal id IN-filter down to the scan
    (PushedFilters + row-group skipping over the id-sorted files)."""
    import io as _io
    import re
    from contextlib import redirect_stdout

    path = str(tmp_path / "ivfq")
    build_ivf_index(emb.filter(F.col("vec_id") < 250), path,
                    n_cells=N_CELLS, quantize=True)
    served = query_ivf_index(
        spark, path, _queries(emb), nprobe=N_CELLS, k=3,
        shortlist=10, materialize=False,
    )
    buf = _io.StringIO()
    with redirect_stdout(buf):
        served.explain("formatted")
    plan = buf.getvalue()
    schemas = re.findall(r"ReadSchema: (\S+)", plan)
    assert schemas and not any("__q8" in s for s in schemas), schemas
    assert any("vec_id" in s and "embedding" in s for s in schemas)
    assert re.search(r"PushedFilters: \[[^\]]*[Ii]n\(vec_id", plan), plan
