"""IVF lifecycle scale rehearsal (r11): corpus x1 / x10 / x100 with a
FIXED ~500-vector daily batch, timing each lifecycle op (min of 2 runs
after clearCache where re-runnable) to separate the flat costs from the
corpus-linear ones.

Expected shape (the design contract the numbers check):
- append (r12: id side-index built, the recommended deployment):
  batch-sized assignment + an anti-join against the bucketed id index
  + batch-sized marker/lake/index writes — FLAT in the corpus (the r11
  full-lake id scan and both footer-count passes are gone from the
  daily path); `append_unindexed_s` keeps the r11 shape measured for
  contrast — corpus-linear through its id scan and footer counts;
- probe (nprobe=2 of 8 cells): reads nprobe/n_cells of the corpus via
  directory pruning — sub-linear growth;
- stats: ONE corpus scan — linear by design (it is the maintenance
  report, not the serving path);
- build / retrain: corpus-linear by definition (training + full
  re-assignment rewrite). Retrain exists so appends can stay cheap
  daily and the linear cost is paid on the MAINTENANCE cadence.

Run from the repo root:  python scripts/ivf_scale_rehearsal.py [sf_dir]
Prints one JSON line per (factor, op) plus a summary line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    import shutil
    import tempfile

    from dsacord_spark.operators.similarity import (
        append_ivf_index,
        build_ivf_index,
        ivf_index_stats,
        query_ivf_index,
        retrain_ivf_index,
    )
    from dsacord_spark.session import get_spark

    spark = get_spark(app_name="ivf-rehearsal")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    # fixed daily batch: ~10% of the base table, ids disjoint from every
    # replica (negative side)
    batch = emb.filter(F.col("vec_id") % 10 == 0).select(
        (-F.col("vec_id") - 1).alias("vec_id"), "embedding"
    )
    queries = emb.filter(F.col("vec_id") % 97 == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    base = emb.filter(F.col("vec_id") % 10 != 0)
    work = tempfile.mkdtemp(prefix="dsacord-ivf-reh-")
    results = []
    try:
        for factor in (1, 10, 100):
            corpus = base
            for i in range(1, factor):
                corpus = corpus.union(
                    base.select(
                        (F.col("vec_id") + F.lit(i * 10_000_000)).alias(
                            "vec_id"
                        ),
                        "embedding",
                    )
                )
            path = os.path.join(work, f"ivf_x{factor}")
            idx_table = f"t_ivf_reh_ids_x{factor}"
            cell = {"factor": factor}
            # r11 contrast lake: no id index -> append pays the
            # full-lake id scan + footer counts (corpus-linear)
            path_uidx = os.path.join(work, f"ivf_noidx_x{factor}")
            build_ivf_index(corpus, path_uidx, n_cells=8, iters=2)
            t0 = time.perf_counter()
            append_ivf_index(spark, path_uidx, batch)
            cell["append_unindexed_s"] = round(
                time.perf_counter() - t0, 2
            )
            shutil.rmtree(path_uidx, ignore_errors=True)

            t0 = time.perf_counter()
            build_ivf_index(corpus, path, n_cells=8, iters=2,
                            id_index_table=idx_table)
            cell["build_s"] = round(time.perf_counter() - t0, 2)
            t0 = time.perf_counter()
            cell["appended"] = append_ivf_index(spark, path, batch)
            cell["append_s"] = round(time.perf_counter() - t0, 2)

            def timed(fn):
                times = []
                for _ in range(2):
                    spark.catalog.clearCache()
                    t = time.perf_counter()
                    fn()
                    times.append(round(time.perf_counter() - t, 2))
                return min(times)

            cell["probe_s_min"] = timed(
                lambda: query_ivf_index(
                    spark, path, queries, nprobe=2, k=3
                ).count()
            )
            cell["stats_s_min"] = timed(
                lambda: ivf_index_stats(spark, path).collect()
            )
            t0 = time.perf_counter()
            retrain_ivf_index(spark, path, iters=2)
            cell["retrain_s"] = round(time.perf_counter() - t0, 2)
            results.append(cell)
            print(json.dumps(cell), flush=True)
            shutil.rmtree(path, ignore_errors=True)
            spark.sql(f"DROP TABLE IF EXISTS {idx_table}")
        by = {c["factor"]: c for c in results}

        def growth(key):
            return (
                round(by[100][key] / by[1][key], 2)
                if by[1].get(key) else None
            )

        print(json.dumps({
            "summary": {
                k: {"x1": by[1][k], "x10": by[10][k], "x100": by[100][k],
                    "growth_100x": growth(k)}
                for k in ("append_s", "append_unindexed_s",
                          "probe_s_min", "stats_s_min",
                          "build_s", "retrain_s")
            }
        }))
        return 0
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
