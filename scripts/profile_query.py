"""Per-stage profile of catalog entries via the Spark UI REST API.

Runs each named entry bench-style (fn + count) on local[$SPARK_GRAFT_CPUS]
with the UI enabled, then reads /api/v1 job+stage metrics for the jobs the
entry submitted (bracketed by a job-group id). Prints, per entry: wall,
job count, and the top stages by duration with task counts and shuffle
bytes — the §1 "where does the time actually go" view that local mode
lacks without the UI.

Usage: python scripts/profile_query.py name [name ...]
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
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from dsacord_spark.plans.catalog import specs
    from dsacord_spark.session import get_spark

    spark = get_spark(app_name="profile-query", master=f"local[{cpus}]",
                      shuffle_partitions=cpus,
                      extra_conf={"spark.ui.enabled": "true"})
    sc = spark.sparkContext
    base = f"http://localhost:{sc.uiWebUrl.rsplit(':', 1)[1]}/api/v1/applications/{sc.applicationId}" if sc.uiWebUrl else None
    reg = specs()
    for name in names:
        if name not in reg:
            print(f"skip {name}")
            continue
        spark.catalog.clearCache()
        sc.setJobGroup(name, name)
        t0 = time.perf_counter()
        reg[name].fn(spark, sf_dir).count()
        wall = time.perf_counter() - t0
        sc.setJobGroup(None, None)
        jobs = [j for j in _api(base, "/jobs")
                if j.get("jobGroup") == name]
        stage_ids = sorted({s for j in jobs for s in j["stageIds"]})
        stages = []
        for sid in stage_ids:
            try:
                for att in _api(base, f"/stages/{sid}"):
                    stages.append(att)
            except Exception:
                pass
        stages.sort(key=lambda s: -(s.get("executorRunTime") or 0))
        print(f"\n=== {name}: wall={wall:.2f}s jobs={len(jobs)} "
              f"stages={len(stages)}")
        for s in stages[:12]:
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
