"""Dump explain("formatted") for named catalog queries to plans/<round>
(round dir from $SPARK_GRAFT_PLANS_ROUND, default r13).

Usage: python scripts/plan_dump.py <suffix> [name ...]
With no names: the default audit set (headline + slowest). Driver-side
only — builds each plan and writes plans/r12/<name>_<suffix>.txt; also
prints per-query plan-construction and explain wall times so driver-side
planning cost is visible (guide §7.3).
"""

from __future__ import annotations

import io
import os
import re
import sys
import time
from collections import Counter
from contextlib import redirect_stdout

DEFAULT = [
    "ingest_e2e",  # handled specially (not a catalog entry)
]


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans",
        os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r13"))
    os.makedirs(out_dir, exist_ok=True)

    from dsacord_spark.plans.catalog import specs
    from dsacord_spark.session import get_spark

    spark = get_spark(app_name="plan-dump", master="local[4]",
                      shuffle_partitions=32)
    reg = specs()
    if not names:
        names = sorted(reg)
    for name in names:
        if name not in reg:
            print(f"skip {name}: not in catalog", file=sys.stderr)
            continue
        t0 = time.perf_counter()
        df = reg[name].fn(spark, sf_dir)
        t1 = time.perf_counter()
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        t2 = time.perf_counter()
        text = buf.getvalue()
        nodes = Counter(re.findall(r"\(\d+\)\s+([A-Za-z]+)", text))
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(text)
        interesting = {k: v for k, v in nodes.items() if k in (
            "Exchange", "Sort", "SortMergeJoin", "BroadcastHashJoin",
            "ShuffledHashJoin", "BroadcastNestedLoopJoin", "CartesianProduct",
            "BatchEvalPython", "ArrowEvalPython", "MapInPandas", "MapInArrow",
            "HashAggregate", "ObjectHashAggregate", "Window", "Generate",
            "Scan")}
        print(f"{name}: build={t1-t0:.3f}s explain={t2-t1:.3f}s "
              f"{dict(sorted(interesting.items()))}")
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
