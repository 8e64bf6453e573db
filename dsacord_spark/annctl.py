"""ANN index control CLI — the ops entry point for the IVF lake
lifecycle, the embedding-side twin of the curate CLI's text-dedup loop
(build / daily append / health stats / serve / retrain):

    python -m dsacord_spark.annctl build   --input emb.parquet --index DIR
                                           [--cells 16] [--iters 3]
                                           [--id-index TABLE]
                                           [--quantize]
    python -m dsacord_spark.annctl append  --input batch.parquet --index DIR
                                           [--no-skip-existing]
    python -m dsacord_spark.annctl stats   --index DIR
                                           [--retrain-if EXPR]
                                           [--retrain-iters 3]
    python -m dsacord_spark.annctl query   --input queries.parquet
                                           --index DIR --output DIR
                                           [--nprobe 4] [--k 5]
                                           [--shortlist N]
    python -m dsacord_spark.annctl retrain --index DIR [--cells N]
                                           [--iters 3]

Every subcommand prints exactly one JSON summary line (stats
additionally prints one JSON line per cell before it), mirroring the
curate CLI's contract so the composed daily runbook can parse both the
same way. Column names default to the engine's embedding schema
(vec_id / embedding) and are overridable with --id-col / --vec-col;
`query` maps them onto the (q_id, q_vec) contract internally.

The daily loop this serves: `append` every batch (retry-idempotent —
a replayed batch reports appended=0), watch `stats` for imbalance
(max/mean n_vecs) and drift (mean_cos falling), `retrain` on the
maintenance cadence (atomic rename-aside swap; probes keep working
before and after, never during a half-written index). `stats
--retrain-if 'imbalance>2.0 or mean_cos<0.9'` closes that loop in one
runbook line: the report decides, the same retrain acts, and the
summary JSON records `retrain_triggered` (plus the retrain's own
summary when it fired) so the runbook's history is auditable."""

from __future__ import annotations

import json
import re
import sys
import time

_TRIGGER_OPS = {
    "<": lambda a, b: a < b, ">": lambda a, b: a > b,
    "<=": lambda a, b: a <= b, ">=": lambda a, b: a >= b,
    "==": lambda a, b: a == b, "!=": lambda a, b: a != b,
}


def eval_retrain_trigger(expr: str, summary: dict) -> bool:
    """Evaluate a `--retrain-if` expression against the stats summary —
    a deliberately tiny grammar (comparison clauses joined by and/or,
    or binds last; no parentheses, no eval) so a runbook line stays
    auditable. Unknown metric names raise (a typo must not silently
    never-trigger); a metric whose VALUE is null (e.g. mean_cos on an
    all-empty lake) makes its clause false — absence of evidence never
    triggers maintenance."""
    def clause(s: str) -> bool:
        m = re.fullmatch(
            r"\s*([A-Za-z_]\w*)\s*(<=|>=|==|!=|<|>)\s*"
            r"(-?\d+(?:\.\d+)?)\s*", s)
        if not m:
            raise ValueError(f"bad --retrain-if clause: {s!r}")
        name, op, lit = m.groups()
        if name not in summary:
            raise ValueError(
                f"unknown metric {name!r} in --retrain-if; have "
                f"{sorted(summary)}")
        val = summary[name]
        if val is None:
            return False
        return _TRIGGER_OPS[op](float(val), float(lit))

    return any(
        all(clause(c) for c in re.split(r"\s+and\s+", conj))
        for conj in re.split(r"\s+or\s+", expr)
    )


def main(argv: list[str] | None = None) -> int:
    import argparse

    p = argparse.ArgumentParser(prog="annctl", description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    def common(sp, with_input: bool):
        if with_input:
            sp.add_argument("--input", required=True,
                            help="Input parquet of vectors")
        sp.add_argument("--index", required=True,
                        help="IVF lake directory")
        sp.add_argument("--id-col", default="vec_id")
        sp.add_argument("--vec-col", default="embedding")
        sp.add_argument("--master", default=None,
                        help="Spark master override")
        sp.add_argument("--force", action="store_true",
                        help="take over another driver's maintenance "
                             "marker (use when its holder is known "
                             "dead; see MaintenanceMarkerHeld)")

    b = sub.add_parser("build", help="train + materialize the IVF lake")
    common(b, True)
    b.add_argument("--cells", type=int, default=16)
    b.add_argument("--iters", type=int, default=3)
    b.add_argument("--quantize", action="store_true",
                   help="store an int8 SQ8 column beside each vector "
                        "so `query --shortlist N` can serve a coarse "
                        "integer-dot pass over ~1/4 the vector bytes "
                        "with an exact rerank of only the shortlist")
    b.add_argument("--id-index", default=None, metavar="TABLE",
                   help="catalog table to maintain as the lake's "
                        "id side-index: every daily append's retry "
                        "anti-join then reads this bucketed table "
                        "(batch-sized) instead of the full lake's id "
                        "column (corpus-sized); retrain rebuilds it")

    ap = sub.add_parser("append", help="assign a batch to the existing "
                                       "centroids and append")
    common(ap, True)
    ap.add_argument("--no-skip-existing", action="store_true",
                    help="append without the retry-idempotence "
                         "anti-join (raw append-anything)")

    st = sub.add_parser("stats", help="per-cell drift/imbalance report")
    common(st, False)
    st.add_argument("--retrain-if", default=None, metavar="EXPR",
                    help="close the maintenance loop: retrain when the "
                         "summary satisfies EXPR, e.g. "
                         "'imbalance>2.0 or mean_cos<0.9'. Clauses are "
                         "<metric><op><number> over the summary fields "
                         "(imbalance, mean_cos, n_vecs, empty_cells, "
                         "cells) joined with and/or (or binds last); a "
                         "null metric never triggers")
    st.add_argument("--retrain-iters", type=int, default=3,
                    help="k-means iterations for a triggered retrain")

    q = sub.add_parser("query", help="serve top-k ANN from the lake")
    common(q, True)
    q.add_argument("--output", required=True,
                   help="Output parquet dir for (q_id, neighbor_id, "
                        "rank, cos_sim)")
    q.add_argument("--nprobe", type=int, default=4)
    q.add_argument("--k", type=int, default=5)
    q.add_argument("--shortlist", type=int, default=None,
                   help="serve via the quantized two-phase probe "
                        "(requires build --quantize): coarse int8 "
                        "top-N then exact rerank")

    rt = sub.add_parser("retrain", help="re-train centroids from the "
                                        "lake's current contents "
                                        "(atomic swap)")
    common(rt, False)
    rt.add_argument("--cells", type=int, default=None,
                    help="new cell count (default: keep the index's)")
    rt.add_argument("--iters", type=int, default=3)

    a = p.parse_args(argv)
    # --id-col/--vec-col only shape NEW metadata (build) or the query
    # mapping; append/stats/retrain read them from the index's own
    # sidecar — warn instead of silently ignoring (the curate CLI's
    # flag-relevance rule)
    if a.cmd in ("append", "stats", "retrain") and (
        a.id_col != "vec_id" or a.vec_col != "embedding"
    ):
        print(
            f"warning: --id-col/--vec-col have no effect with "
            f"'{a.cmd}' — column names come from the index's own "
            f"sidecar metadata",
            file=sys.stderr,
        )

    from dsacord_spark.operators.similarity import (
        append_ivf_index,
        build_ivf_index,
        ivf_index_stats,
        query_ivf_index,
        retrain_ivf_index,
    )
    from dsacord_spark.session import get_spark

    spark = get_spark(app_name=f"dsacord-annctl-{a.cmd}", master=a.master)
    t0 = time.perf_counter()

    def done(**kw) -> int:
        kw["elapsed_s"] = round(time.perf_counter() - t0, 2)
        print(json.dumps(kw))
        return 0

    if a.cmd == "build":
        emb = spark.read.parquet(a.input)
        build_ivf_index(emb, a.index, n_cells=a.cells, iters=a.iters,
                        id_col=a.id_col, vec_col=a.vec_col,
                        id_index_table=a.id_index, force=a.force,
                        quantize=a.quantize)
        return done(built_index=a.index, cells=a.cells,
                    id_index=a.id_index,
                    n_vecs=spark.read.parquet(a.index).count())
    if a.cmd == "append":
        n = append_ivf_index(
            spark, a.index, spark.read.parquet(a.input),
            skip_existing=not a.no_skip_existing, force=a.force,
        )
        return done(appended=n, index=a.index,
                    skip_existing=not a.no_skip_existing)
    if a.cmd == "stats":
        rows = ivf_index_stats(spark, a.index).collect()
        for r in rows:
            print(json.dumps({
                "cell": r["cell"], "n_vecs": r["n_vecs"],
                "mean_cos": r["mean_cos"], "min_cos": r["min_cos"],
            }))
        # ivf_index_stats emits every trained cell (empty ones at
        # n_vecs=0 with null cosines), so `cells` matches the sidecar's
        # n_cells and `imbalance` counts dead cells against the mean —
        # a half-empty quantizer reads 2.0, not a healthy 1.0 (r11
        # review); the weighted mean skips the null-cosine empty cells
        counts = [r["n_vecs"] for r in rows]
        total = sum(counts)
        # the weighted mean runs over cells that HAVE a cosine: a cell
        # of all zero-norm vectors is legal input (cosine is NULL via
        # try_divide, k-means groups zero vectors together) and reports
        # n_vecs>0 with mean_cos=None — weight by the scored rows'
        # n_vecs only, divided by THEIR sum, not the grand total
        # (r11 ADVICE: the n_vecs-only guard died with a TypeError)
        scored = [r for r in rows if r["n_vecs"] and r["mean_cos"] is not None]
        scored_n = sum(r["n_vecs"] for r in scored)
        summary = dict(
            index=a.index, cells=len(rows), n_vecs=total,
            empty_cells=sum(1 for c in counts if c == 0),
            imbalance=round(max(counts) / (total / len(rows)), 3)
            if total else None,
            mean_cos=round(
                sum(r["n_vecs"] * r["mean_cos"] for r in scored)
                / scored_n, 6
            ) if scored_n else None,
        )
        if a.retrain_if is not None:
            # the trigger that closes the maintenance loop (r11 verdict
            # item 7): the stats report DECIDES, the same atomic-swap
            # retrain ACTS — one runbook line instead of a human reading
            # drift numbers
            summary["retrain_triggered"] = eval_retrain_trigger(
                a.retrain_if, summary
            )
            if summary["retrain_triggered"]:
                summary["retrain"] = retrain_ivf_index(
                    spark, a.index, iters=a.retrain_iters, force=a.force
                )
        return done(**summary)
    if a.cmd == "query":
        from pyspark.sql import functions as F

        from dsacord_spark import leases
        from dsacord_spark.operators.similarity import _ivf_lease_name

        queries = spark.read.parquet(a.input).select(
            F.col(a.id_col).alias("q_id"), F.col(a.vec_col).alias("q_vec")
        )
        # materialize=False + an explicit stream lease spanning plan AND
        # the distributed write: an offline query frame can be millions
        # of rows, so the result must never funnel through the driver
        # (r12 review) — the lease still keeps a retrain from swapping
        # files under the in-flight scan (stream_lease is re-entrant:
        # query_ivf_index's own lease nests under this one)
        with leases.stream_lease(_ivf_lease_name(a.index)):
            out = query_ivf_index(spark, a.index, queries,
                                  nprobe=a.nprobe, k=a.k,
                                  materialize=False,
                                  shortlist=a.shortlist)
            out.write.mode("overwrite").parquet(a.output)
        return done(
            index=a.index, output=a.output, nprobe=a.nprobe, k=a.k,
            result_rows=spark.read.parquet(a.output).count(),
        )
    # retrain
    info = retrain_ivf_index(spark, a.index, n_cells=a.cells,
                             iters=a.iters, force=a.force)
    return done(retrained=a.index, **info)


if __name__ == "__main__":
    sys.exit(main())
