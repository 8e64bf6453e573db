"""Steady-state per-stage profile: run each entry REPS times in one
session, report per-run wall, and the stage metrics of the LAST run only
(job-group `name#rep`). Same REST view as profile_query.py but without
first-run JIT/codegen warmup polluting the stage numbers.

Usage: [REPS=3] python scripts/profile_query_warm.py name [name ...]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request


def _api(base: str, path: str):
    with urllib.request.urlopen(base + path) as r:
        return json.loads(r.read())


def main() -> None:
    names = sys.argv[1:]
    reps = int(os.environ.get("REPS", "3"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from dsacord_spark.plans.catalog import specs
    from dsacord_spark.session import get_spark

    spark = get_spark(app_name="profile-query-warm", master=f"local[{cpus}]",
                      shuffle_partitions=cpus,
                      extra_conf={"spark.ui.enabled": "true"})
    sc = spark.sparkContext
    base = (f"http://localhost:{sc.uiWebUrl.rsplit(':', 1)[1]}"
            f"/api/v1/applications/{sc.applicationId}") if sc.uiWebUrl else None
    reg = specs()
    for name in names:
        if name not in reg:
            print(f"skip {name}")
            continue
        walls = []
        for rep in range(reps):
            spark.catalog.clearCache()
            group = f"{name}#{rep}"
            sc.setJobGroup(group, group)
            t0 = time.perf_counter()
            reg[name].fn(spark, sf_dir).count()
            walls.append(time.perf_counter() - t0)
            sc.setJobGroup(None, None)
        group = f"{name}#{reps - 1}"
        jobs = [j for j in _api(base, "/jobs") if j.get("jobGroup") == group]
        stage_ids = sorted({s for j in jobs for s in j["stageIds"]})
        stages = []
        for sid in stage_ids:
            try:
                stages.extend(_api(base, f"/stages/{sid}"))
            except Exception:
                pass
        stages.sort(key=lambda s: -(s.get("executorRunTime") or 0))
        print(f"\n=== {name}: walls={[round(w, 2) for w in walls]} "
              f"last-run jobs={len(jobs)} stages={len(stages)}")
        for s in stages[:14]:
            dur = (s.get("executorRunTime") or 0) / 1000
            print(f"  stage {s['stageId']:4d} {s['status']:9s} "
                  f"tasks={s.get('numCompleteTasks', 0):4d} "
                  f"execRun={dur:7.2f}s "
                  f"shufR={s.get('shuffleReadBytes', 0)>>10:8d}K "
                  f"shufW={s.get('shuffleWriteBytes', 0)>>10:8d}K "
                  f"in={s.get('inputBytes', 0)>>10:8d}K  "
                  f"{(s.get('name') or '')[:60]}")
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
