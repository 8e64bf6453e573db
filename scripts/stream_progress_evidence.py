"""Capture per-micro-batch StreamingQueryProgress for the streaming
catalog entries (r12 verdict item 3): attach a StreamingQueryListener,
run each named entry through its normal catalog fn, and dump every
batch's durationMs breakdown + stateOperators summary to
plans/r13/streaming_progress.json.

The point: adjudicate whether the streaming entries' wall time is OUR
transform work (optimizable) or the micro-batch engine's fixed cost
(addBatch vs walCommit/latestOffset/commitOffsets etc.). Driver-side
evidence only; run on an idle host.

Usage: python scripts/stream_progress_evidence.py [name ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

DEFAULT = [
    "stream_incremental_dedup",
    "session_stateful",
    "stream_join_interval",
    "stream_heavy_hitters_cms",
    "stream_approx_distinct_hll",
    "stream_event_counts",
]


def main() -> None:
    names = sys.argv[1:] or DEFAULT
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    from pyspark.sql.streaming import StreamingQueryListener

    from dsacord_spark.plans.catalog import specs
    from dsacord_spark.session import get_spark

    spark = get_spark(app_name="stream-progress", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)

    events: list[dict] = []

    class Capture(StreamingQueryListener):
        def onQueryStarted(self, e):  # noqa: N802
            pass

        def onQueryProgress(self, e):  # noqa: N802
            p = e.progress
            events.append({
                "entry": CURRENT[0],
                "batchId": p.batchId,
                "numInputRows": p.numInputRows,
                "durationMs": dict(p.durationMs or {}),
                "stateOperators": [
                    {
                        "operatorName": getattr(so, "operatorName", ""),
                        "numRowsTotal": so.numRowsTotal,
                        "numRowsUpdated": so.numRowsUpdated,
                        "commitTimeMs": getattr(so, "commitTimeMs", None),
                    }
                    for so in (p.stateOperators or [])
                ],
            })

        def onQueryIdle(self, e):  # noqa: N802
            pass

        def onQueryTerminated(self, e):  # noqa: N802
            pass

    CURRENT = [""]
    spark.streams.addListener(Capture())
    reg = specs()
    walls = {}
    for name in names:
        if name not in reg:
            print(f"skip {name}", file=sys.stderr)
            continue
        # warm pass first: the engine's one-time classloading (~5s) must
        # not masquerade as per-batch cost
        CURRENT[0] = f"{name}#warm"
        reg[name].fn(spark, sf_dir).count()
        spark.catalog.clearCache()
        CURRENT[0] = name
        t0 = time.perf_counter()
        reg[name].fn(spark, sf_dir).count()
        walls[name] = round(time.perf_counter() - t0, 3)
        spark.catalog.clearCache()
    # listener delivery is async; give the bus a moment to drain
    time.sleep(3)
    out = {"walls": walls, "batches": events}
    path = os.path.join(repo, "plans", "r13", "streaming_progress.json")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(walls, indent=1))
    for ev in events:
        if ev["entry"].endswith("#warm"):
            continue
        d = ev["durationMs"]
        print(f"{ev['entry']:28s} batch={ev['batchId']} rows={ev['numInputRows']:7d} "
              f"trigger={d.get('triggerExecution', -1):6d}ms "
              f"addBatch={d.get('addBatch', -1):6d}ms "
              f"getBatch={d.get('getBatch', -1):4d}ms "
              f"walCommit={d.get('walCommit', -1):4d}ms "
              f"commitOffsets={d.get('commitOffsets', -1):4d}ms")


if __name__ == "__main__":
    main()
