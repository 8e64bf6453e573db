"""Isolate the ingest_e2e phases with noop sinks (guide §1.4).

Phases, each timed separately over the same bench fixture (cumulative
prefixes of the real dataflow, so phase N - phase N-1 ~= the Nth
operator's cost):
  A  binaryFile scan + mapInArrow extract        -> noop
  B  A + decisions_transform (typed select)       -> noop
  C  B + split_quarantine valid-side filter       -> noop
  D  C + dedup_batch window                       -> noop
  E  full write_decisions_parquet (real sink) + count (the bench action)

Run on an idle host: python scripts/ingest_phase_timing.py [reps]
"""

from __future__ import annotations

import os
import sys
import time


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import _build_ingest_fixture, _reset_session_state
    import tempfile

    from dsacord_spark.session import get_spark
    from dsacord_spark.sinks.jdbc import dedup_batch
    from dsacord_spark.sinks.parquet import write_decisions_parquet
    from dsacord_spark.sources.zipsource import read_staged_zips
    from dsacord_spark.transform import decisions_transform, split_quarantine

    spark = get_spark(app_name="ingest-phases", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
    work = tempfile.mkdtemp(prefix="ingest-phase-")
    landing = os.path.join(work, "landing")
    rows = _build_ingest_fixture(landing, min(cpus, 32), 28125)
    os.sync()
    print(f"fixture rows={rows}")

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    def phase_a(out):
        noop(read_staged_zips(spark, landing))

    def phase_b(out):
        noop(decisions_transform(read_staged_zips(spark, landing)))

    def phase_c(out):
        valid, _ = split_quarantine(
            decisions_transform(read_staged_zips(spark, landing)))
        noop(valid)

    def phase_d(out):
        valid, _ = split_quarantine(
            decisions_transform(read_staged_zips(spark, landing)))
        noop(dedup_batch(valid))

    def phase_e(out):
        valid, _ = split_quarantine(
            decisions_transform(read_staged_zips(spark, landing)))
        write_decisions_parquet(dedup_batch(valid), out, mode="overwrite")
        spark.read.parquet(out).count()

    phases = [("A extract", phase_a), ("B +transform", phase_b),
              ("C +filter", phase_c), ("D +dedup", phase_d),
              ("E full+write+count", phase_e)]
    # warm one full pass first
    phase_e(os.path.join(work, "warm_out"))
    results = {}
    for r in range(reps):
        for name, fn in phases:
            _reset_session_state(spark)
            spark.sparkContext.setJobDescription(f"phase {name} rep {r}")
            t0 = time.perf_counter()
            fn(os.path.join(work, f"out_{r}"))
            dt = time.perf_counter() - t0
            results.setdefault(name, []).append(round(dt, 2))
            _reset_session_state(spark)
            os.sync()
    for name, ts in results.items():
        print(f"{name:22s} min={min(ts):6.2f} all={ts}")
    import shutil

    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
