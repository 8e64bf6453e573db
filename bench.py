"""Benchmark runner: times the headline catalog queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and prints ONE JSON line the driver records as BENCH_r{N}.json.

Each query is executed to completion with a cheap count-style sink (the
driver-facing contract returns DataFrames; timing needs an action). A
warm-up run of one query amortizes JVM/codegen startup out of per-query
numbers.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from dsacord_spark.session import get_spark
    from dsacord_spark.plans.catalog import specs

    spark = get_spark(app_name="dsacord-bench", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)

    # Headline set: the operators that dominate real pipelines.
    headline = [
        "pricing_summary",
        "join_equi_agg",
        "dedup_keep_latest",
        "window_tumbling_hour",
        "window_running_sum",
        "agg_cube",
        "json_props_agg",
        "sort_topk",
    ]
    registry = specs()
    headline = [q for q in headline if q in registry]
    # Include every other catalog query too (cheaper, still timed).
    rest = [q for q in sorted(registry) if q not in headline]

    # Warm-up: JVM + parquet footer caches.
    registry[headline[0]].fn(spark, sf_dir).count()

    timings: dict[str, float] = {}
    for name in headline + rest:
        t0 = time.perf_counter()
        try:
            df = registry[name].fn(spark, sf_dir)
            n = df.count()
            timings[name] = round(time.perf_counter() - t0, 4)
        except Exception as exc:  # pragma: no cover
            print(f"bench: {name} failed: {exc}", file=sys.stderr)
            timings[name] = -1.0

    total = round(sum(t for t in timings.values() if t >= 0), 4)
    out = {
        "metric": "catalog_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf_dir,
        "cpus": cpus,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
