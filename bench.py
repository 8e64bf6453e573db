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

BASELINE_ROWS_PER_S = 37_950  # reference README end-to-end run (BASELINE.md)


def _csv_part(day: int, part: int, n: int) -> str:
    import csv as _csv
    import io

    from dsacord_spark.schema import CSV_COLUMNS

    idx = {c: i for i, c in enumerate(CSV_COLUMNS)}
    buf = io.StringIO()
    w = _csv.writer(buf, quoting=_csv.QUOTE_ALL)
    w.writerow(CSV_COLUMNS)
    for i in range(n):
        rec = [""] * len(CSV_COLUMNS)
        # ~1% empty uuids (quarantine path), ~2% cross-file duplicates
        rec[idx["uuid"]] = (
            "" if i % 97 == 0 else f"u-{day}-{part if i % 53 else 0}-{i}"
        )
        rec[idx["decision_visibility"]] = '["DECISION_VISIBILITY_CONTENT_REMOVED"]'
        rec[idx["category"]] = f"STATEMENT_CATEGORY_{i % 7}"
        rec[idx["content_type"]] = (
            "plain-token" if i % 3 else '["CONTENT_TYPE_TEXT"]'
        )
        rec[idx["automated_detection"]] = ("Yes", "No", "maybe")[i % 3]
        rec[idx["platform_uid"]] = f"{175928847299117063 + i}-{i}-user"
        rec[idx["created_at"]] = (
            f"2025-01-{day % 28 + 1:02d} 00:{(i // 60) % 60:02d}:{i % 60:02d}"
        )
        rec[idx["content_date"]] = "2025-01-01 12:00:00" if i % 5 else ""
        rec[idx["territorial_scope"]] = '["NL","DE"]'
        rec[idx["decision_ground"]] = "DECISION_GROUND_ILLEGAL_CONTENT"
        w.writerow(rec)
    return buf.getvalue()


def _one_fixture_day(args: tuple[str, int, int]) -> int:
    landing, d, rows_per_csv = args
    import io
    import zipfile
    from datetime import date, timedelta
    from pathlib import Path

    inner = io.BytesIO()
    with zipfile.ZipFile(inner, "w", zipfile.ZIP_DEFLATED) as zf:
        for p in (0, 1):
            zf.writestr(f"part-{p}.csv", _csv_part(d, p, rows_per_csv))
    outer = io.BytesIO()
    with zipfile.ZipFile(outer, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("inner.zip", inner.getvalue())
        zf.writestr("part-2.csv", _csv_part(d, 2, rows_per_csv))
    day_dir = Path(landing) / f"dt={date(2025, 1, 1) + timedelta(days=d)}"
    day_dir.mkdir(parents=True, exist_ok=True)
    (day_dir / "day.zip").write_bytes(outer.getvalue())
    return 3 * rows_per_csv


def _build_ingest_fixture(landing: str, days: int, rows_per_csv: int) -> int:
    """Deterministic zip-of-zips-of-csv landing dir shaped exactly like the
    reference's daily dumps (one dt=YYYY-MM-DD dir per day, each day.zip
    holding a nested zip of two CSVs plus one plain CSV). Generated in
    parallel worker processes; generation is NOT part of the timed run.
    Returns total rows written (incl. quarantine rows and duplicates,
    mirroring real dump content)."""
    from concurrent.futures import ProcessPoolExecutor

    jobs = [(landing, d, rows_per_csv) for d in range(days)]
    with ProcessPoolExecutor(max_workers=min(days, os.cpu_count() or 8)) as ex:
        return sum(ex.map(_one_fixture_day, jobs))


def _reset_session_state(spark, settle: bool = False) -> None:
    """Clear cached blocks and force a JVM GC between bench sections so
    one section's leftover heap garbage doesn't bill GC stalls to the
    next (measured up to 5x swing on the ingest section at 8g heap).

    `settle=True` additionally waits for the ContextCleaner to finish
    deleting the PREVIOUS sections' shuffle/broadcast files before the
    timed window opens (r13 measurement-hygiene fix, documented in
    OPTIMIZATION_r13.md): the GC enqueues hundreds of shuffle-file
    deletions that the cleaner daemon then executes ASYNCHRONOUSLY —
    measured DURING the post-sweep ingest rep (block-manager file count
    769 -> 387 inside the timed window), doubling its wall (14.9s
    contaminated vs 7.0-9.7s after a drain, same code, same session).
    The wait runs entirely OUTSIDE the timed window and changes no
    timed action; it makes the reset actually reset."""
    spark.catalog.clearCache()
    try:
        spark.sparkContext._jvm.java.lang.System.gc()
    except Exception:  # pragma: no cover
        pass
    if settle:
        _cleaner_settle(spark)


def _cleaner_settle(spark, timeout_s: float = 20.0) -> None:
    """Poll this session's block-manager local dirs until the async
    ContextCleaner stops deleting files (count stops shrinking) or
    `timeout_s` elapses. Driver-side metadata walk only — no Spark job."""
    import glob

    def _dirs() -> list[str]:
        try:
            jdirs = (
                spark.sparkContext._jvm.org.apache.spark.SparkEnv.get()
                .blockManager().diskBlockManager().localDirs()
            )
            return [jdirs[i].getAbsolutePath() for i in range(len(jdirs))]
        except Exception:  # pragma: no cover - fallback for API drift
            return glob.glob("/tmp/blockmgr-*")

    def _count(dirs: list[str]) -> int:
        n = 0
        for d in dirs:
            for _, _, fs in os.walk(d):
                n += len(fs)
        return n

    dirs = _dirs()
    prev = _count(dirs)
    deadline = time.monotonic() + timeout_s
    while time.monotonic() < deadline:
        time.sleep(1.0)
        cur = _count(dirs)
        if cur >= prev:
            return
        prev = cur


def _ingest_setup(sf_dir: str, cpus: int) -> dict:
    """Build the ingest fixture once; the timed reps run INTERLEAVED at
    the start / middle / end of the whole bench (r5 verdict #3): three
    back-to-back reps all sit inside the same host-load spike, so
    min-of-3 was still effectively a single load sample — BENCH_r05's
    ingest figure swung 8.27 -> 11.04s on load alone while same-session
    sweeps measured 7.44-9.92s. Spreading the reps across the ~3-minute
    bench decorrelates them (the repo's interleaved-A/B methodology,
    PLANS.md round-2)."""
    import re
    import tempfile

    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else 0.1
    days = min(cpus, 32)
    rows_per_csv = max(100, int(sf * 27_000_000 / (3 * days)))

    work = tempfile.mkdtemp(prefix="dsacord-ingest-bench-")
    landing = os.path.join(work, "landing")
    try:
        rows_in = _build_ingest_fixture(landing, days, rows_per_csv)
        # a tiny 1-day landing for the UNTIMED path warm-up: the old
        # back-to-back min-of-3 implicitly measured a warm path (reps
        # 2-3 reused rep 1's spun-up Python workers + JIT'd operators);
        # isolated interleaved reps must warm the same machinery
        # explicitly or the min carries a systematic cold-start tax
        warm_landing = os.path.join(work, "warm_landing")
        _build_ingest_fixture(warm_landing, 1, 300)
        # flush fixture writeback before the first timed window: a
        # pending multi-hundred-MB writeback colliding with the first
        # timed read produced 200s+ outliers on an otherwise ~15s run
        os.sync()
    except BaseException:
        # a half-built multi-hundred-MB fixture must not leak when the
        # build dies (ENOSPC): finalize never runs if setup raises
        import shutil

        shutil.rmtree(work, ignore_errors=True)
        raise
    # the fixture lives for the WHOLE bench (reps are interleaved at
    # start/mid/end), so a mid-bench abort — Ctrl-C during the catalog
    # sweep, an uncaught py4j error — would leak it without a process-
    # exit hook; the hook is idempotent with _ingest_finalize's rmtree
    import atexit
    import shutil

    atexit.register(shutil.rmtree, work, ignore_errors=True)
    return {
        "work": work,
        "landing": landing,
        "warm_landing": warm_landing,
        "out": os.path.join(work, "decisions"),
        "rows_in": rows_in,
        "reps": [],
        "rep_load_avg": [],
        "rows_written": 0,
    }


def _ingest_warm(spark, ctx: dict) -> None:
    """Untimed warm-up of the exact ingest dataflow over the tiny
    landing: spins up Python workers, JITs the zip/CSV/transform
    operators, and initializes the parquet committer."""
    from dsacord_spark.sinks.jdbc import dedup_batch
    from dsacord_spark.sinks.parquet import write_decisions_parquet
    from dsacord_spark.sources.zipsource import read_staged_zips
    from dsacord_spark.transform import decisions_transform, split_quarantine

    wire = read_staged_zips(spark, ctx["warm_landing"])
    valid, _ = split_quarantine(decisions_transform(wire))
    write_decisions_parquet(
        dedup_batch(valid), ctx["out"] + "_warm", mode="overwrite"
    )
    os.sync()  # rep 1 is timed immediately after; flush first


def _ingest_rep(spark, ctx: dict) -> None:
    """One timed rep of the full ingestion dataflow (SURVEY §3.2: staged
    zips -> nested-zip extraction -> typed transform -> quarantine split
    -> dedup -> date-partitioned parquet sink). Comparable to the
    reference's 37,950 rows/s end-to-end number minus the network
    download (local files here, S3 there)."""
    from dsacord_spark.sinks.jdbc import dedup_batch
    from dsacord_spark.sinks.parquet import write_decisions_parquet
    from dsacord_spark.sources.zipsource import read_staged_zips
    from dsacord_spark.transform import decisions_transform, split_quarantine

    # decouple this rep from whatever the surrounding sweep left on the
    # heap AND on disk: drop cached blocks, force a full GC, and wait
    # for the async cleaner to finish deleting the sweep's shuffle
    # files (a garbage-laden heap measures GC stalls; an active cleaner
    # measures the sweep's deferred file deletions — see
    # _reset_session_state's settle note)
    _reset_session_state(spark, settle=True)
    t0 = time.perf_counter()
    wire = read_staged_zips(spark, ctx["landing"])
    typed = decisions_transform(wire)
    valid, quarantined = split_quarantine(typed)
    write_decisions_parquet(dedup_batch(valid), ctx["out"], mode="overwrite")
    ctx["rows_written"] = spark.read.parquet(ctx["out"]).count()
    ctx["reps"].append(round(time.perf_counter() - t0, 4))
    ctx["rep_load_avg"].append(round(os.getloadavg()[0], 2))
    _reset_session_state(spark)
    # flush this rep's parquet writeback OUTSIDE the timed window:
    # reps 1 and 2 run right before timed catalog sections, and a
    # pending multi-hundred-MB writeback would bill its flush to
    # whichever queries follow (the same collision the setup sync
    # guards against)
    os.sync()


def _ingest_finalize(ctx: dict) -> dict:
    import shutil

    shutil.rmtree(ctx["work"], ignore_errors=True)
    if not ctx["reps"]:
        raise RuntimeError("no ingest rep completed")
    elapsed = min(ctx["reps"])
    return {
        "seconds": round(elapsed, 4),
        "rows_in": ctx["rows_in"],
        "rows_written": ctx["rows_written"],
        "rows_per_s": round(ctx["rows_in"] / elapsed, 1),
        "baseline_rows_per_s": BASELINE_ROWS_PER_S,
        # label reflects how many reps actually completed: publishing a
        # single surviving sample as "min-of-3" would smuggle back the
        # one-load-window bias the interleaving removes
        "method": (
            f"interleaved min-of-{len(ctx['reps'])} "
            "(reps at bench start/mid/end)"
        ),
        "reps": ctx["reps"],
        "rep_load_avg_1m": ctx["rep_load_avg"],
    }


_AB_REP_SCRIPT = """
import json, sys, time
landing, warm, out, cpus = sys.argv[1:5]
from dsacord_spark.session import get_spark
from dsacord_spark.sinks.jdbc import dedup_batch
from dsacord_spark.sinks.parquet import write_decisions_parquet
from dsacord_spark.sources.zipsource import read_staged_zips
from dsacord_spark.transform import decisions_transform, split_quarantine
spark = get_spark(app_name="dsacord-ab-rep", master=f"local[{cpus}]",
                  shuffle_partitions=int(cpus))
def run(src, dst):
    valid, _ = split_quarantine(decisions_transform(
        read_staged_zips(spark, src)))
    write_decisions_parquet(dedup_batch(valid), dst, mode="overwrite")
run(warm, out + "_warm")  # untimed path warm-up (workers, JIT, committer)
t0 = time.perf_counter()
run(landing, out)
print(json.dumps({"elapsed": time.perf_counter() - t0}))
"""


# Fixed cross-round comparison panel (r11 verdict item 2): the r11
# driver snapshot showed 2x single-run wobble on join_equi_agg with zero
# code change on that path — only ingest self-adjudicated. These five
# cover the shapes cross-round claims cite: a shuffle join+agg, a cube,
# a top-k sort, the window-dedup, and an incremental index probe.
_AB_PANEL = [
    "join_equi_agg",
    "agg_cube",
    "sort_topk",
    "dedup_keep_latest",
    "dedup_incremental_probe_selfsafe",
]

_AB_PANEL_SCRIPT = """
import json, sys, time
sf_dir, cpus, names = sys.argv[1], int(sys.argv[2]), json.loads(sys.argv[3])
from dsacord_spark.session import get_spark
from dsacord_spark.plans.catalog import specs
spark = get_spark(app_name="dsacord-ab-panel", master=f"local[{cpus}]",
                  shuffle_partitions=cpus)
reg = specs()
names = [n for n in names if n in reg]
for n in names:  # warm pass: JVM, footer caches, codegen
    reg[n].fn(spark, sf_dir).count()
spark.catalog.clearCache()
out = {}
for n in names:  # timed exactly like the main sweep: plan + count
    t0 = time.perf_counter()
    reg[n].fn(spark, sf_dir).count()
    out[n] = round(time.perf_counter() - t0, 4)
    spark.catalog.clearCache()
print(json.dumps({"panel": out}))
"""


def _run_ab(commit: str, sf_dir: str, cpus: int) -> dict:
    """Cross-round A/B adjudication (r9 verdict item 6): the r9 bench
    swing burned a judging session proving host noise, because BENCH
    snapshots from different rounds sample different host-load windows.
    This mode re-runs the SAME ingest fixture through the current tree
    and a git worktree at `commit`, INTERLEAVED (cur/prior x3, each rep
    its own subprocess so each tree's code loads cleanly), and reports
    min-of-3 per side — a same-window, same-fixture comparison that a
    cross-round swing can be checked against directly. Each rep pays its
    own JVM startup + explicit warm-up identically on both sides; only
    the post-warm-up dataflow is timed.

    r12 (verdict item 2) extends the same discipline past ingest to the
    fixed _AB_PANEL of catalog queries: per panel-rep one subprocess per
    side runs the whole panel (warm pass, then timed pass mirroring the
    main sweep's plan+count), interleaved cur/prior x3, and the result
    carries per-QUERY min-of-3 ratios — so a cross-round wobble on any
    panel query can be adjudicated same-window instead of by comparing
    two rounds' single-run snapshots. Panel queries missing from either
    tree's catalog are skipped on both sides (names are append-only, so
    this only happens when A/B-ing across the round that introduced
    one)."""
    import shutil
    import subprocess
    import tempfile

    repo = os.path.dirname(os.path.abspath(__file__))
    wt = tempfile.mkdtemp(prefix="dsacord-ab-wt-")
    os.rmdir(wt)
    subprocess.run(
        ["git", "-C", repo, "worktree", "add", "--detach", wt, commit],
        check=True, capture_output=True, text=True,
    )
    work = tempfile.mkdtemp(prefix="dsacord-ab-fixture-")
    landing = os.path.join(work, "landing")
    warm = os.path.join(work, "warm")
    try:
        days = min(cpus, 16)
        rows_in = _build_ingest_fixture(landing, days, 3000)
        _build_ingest_fixture(warm, 1, 300)
        os.sync()

        def one_rep(tree: str) -> tuple[float, float]:
            env = dict(os.environ, PYTHONPATH=tree)
            out_dir = tempfile.mkdtemp(prefix="dsacord-ab-out-")
            try:
                r = subprocess.run(
                    [sys.executable, "-c", _AB_REP_SCRIPT, landing, warm,
                     os.path.join(out_dir, "o"), str(cpus)],
                    capture_output=True, text=True, cwd=tree, env=env,
                    timeout=1200,
                )
                if r.returncode != 0:
                    raise RuntimeError(
                        f"ab rep in {tree} failed: {r.stderr[-500:]}"
                    )
                last = r.stdout.strip().splitlines()[-1]
                return json.loads(last)["elapsed"], os.getloadavg()[0]
            finally:
                shutil.rmtree(out_dir, ignore_errors=True)

        def one_panel_rep(tree: str) -> dict[str, float]:
            env = dict(os.environ, PYTHONPATH=tree)
            r = subprocess.run(
                [sys.executable, "-c", _AB_PANEL_SCRIPT, sf_dir,
                 str(cpus), json.dumps(_AB_PANEL)],
                capture_output=True, text=True, cwd=tree, env=env,
                timeout=1200,
            )
            if r.returncode != 0:
                raise RuntimeError(
                    f"ab panel rep in {tree} failed: {r.stderr[-500:]}"
                )
            return json.loads(r.stdout.strip().splitlines()[-1])["panel"]

        reps: dict[str, list[float]] = {"current": [], "prior": []}
        loads: dict[str, list[float]] = {"current": [], "prior": []}
        panel_reps: dict[str, list[dict]] = {"current": [], "prior": []}
        for i in range(3):
            # alternate which side runs first (r12): the second runner
            # of every pair reads a page cache the first just warmed and
            # a co-tenant load that decayed — a FIXED order hands one
            # side a systematic edge (measured ~1.3x apparent regression
            # on a no-change query, inverted to 0.89x by swapping order)
            pair = (("current", repo), ("prior", wt))
            for label, tree in pair if i % 2 == 0 else pair[::-1]:
                e, load1m = one_rep(tree)
                reps[label].append(round(e, 3))
                loads[label].append(round(load1m, 2))
                panel_reps[label].append(one_panel_rep(tree))
        cur, pri = min(reps["current"]), min(reps["prior"])
        panel: dict[str, dict] = {}
        for q in _AB_PANEL:
            cur_q = [p[q] for p in panel_reps["current"] if q in p]
            pri_q = [p[q] for p in panel_reps["prior"] if q in p]
            if not cur_q or not pri_q:
                continue  # absent from one tree's catalog
            panel[q] = {
                "current_min_s": min(cur_q),
                "prior_min_s": min(pri_q),
                "ratio": round(min(cur_q) / min(pri_q), 3),
            }
        return {
            "commit": commit,
            "fixture_rows": rows_in,
            "days": days,
            "reps_current": reps["current"],
            "reps_prior": reps["prior"],
            "rep_load_avg_1m": loads,
            "current_min_s": cur,
            "prior_min_s": pri,
            "ratio_current_over_prior": round(cur / pri, 3),
            "panel": panel,
            "method": "interleaved cur/prior x3 (order alternates per "
                      "iteration — page-cache/load-decay bias), min-of-3, "
                      "one subprocess per rep (own JVM + warm-up), shared "
                      "fixture; panel: same interleave, per-query min-of-3",
        }
    finally:
        shutil.rmtree(work, ignore_errors=True)
        subprocess.run(
            ["git", "-C", repo, "worktree", "remove", "--force", wt],
            capture_output=True,
        )
        shutil.rmtree(wt, ignore_errors=True)


def main() -> None:
    # exit cleanly on SIGTERM (what `timeout`/driver kills send): the
    # default handler terminates WITHOUT running atexit, which would
    # leak the ingest fixture dir the atexit hook exists to remove
    import signal

    signal.signal(signal.SIGTERM, lambda *_: sys.exit(143))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    if "--ab" in sys.argv:
        # A/B-vs-commit mode: adjudicate a cross-round ingest swing in
        # one same-window run; merges an "ab" section into
        # BENCH_DETAIL.json and prints a compact line, nothing else
        commit = sys.argv[sys.argv.index("--ab") + 1]
        ab = _run_ab(commit, sf_dir, cpus)
        detail_path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"
        )
        detail = {}
        try:
            with open(detail_path) as fh:
                detail = json.load(fh)
        except (OSError, ValueError):
            pass
        detail["ab"] = ab
        with open(detail_path, "w") as fh:
            json.dump(detail, fh, indent=1, sort_keys=True)
            fh.write("\n")
        print(json.dumps(
            {"metric": "ingest_ab", "value": ab["ratio_current_over_prior"],
             "unit": "ratio", "commit": commit,
             "current_min_s": ab["current_min_s"],
             "prior_min_s": ab["prior_min_s"],
             "panel_ratios": {q: p["ratio"]
                              for q, p in ab["panel"].items()}},
            separators=(",", ":"),
        ))
        return
    # co-tenant load on this host swings timings up to 10x with no code
    # change (SWEEPS/PLANS noise methodology); recording the load lets a
    # reader discount a noisy snapshot without re-running
    load_start = os.getloadavg()

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

    # Warm-up: JVM + parquet footer caches, plus one tiny availableNow
    # stream so the first streaming query in the sweep doesn't bill
    # one-time streaming-engine classloading (~5s) to its own timing.
    registry[headline[0]].fn(spark, sf_dir).count()
    try:
        import datetime as _dt

        from dsacord_spark.streaming.pipeline import sessionize_bounded

        tiny = spark.createDataFrame(
            [("w", _dt.datetime(2025, 1, 1, 0, 0, 0)),
             ("w", _dt.datetime(2025, 1, 1, 9, 0, 0))],
            "user_id string, ts timestamp",
        )
        sessionize_bounded(spark, tiny).count()
    except Exception as exc:  # pragma: no cover
        print(f"bench: stream warm-up failed: {exc}", file=sys.stderr)

    # ingest fixture once; timed reps interleaved at bench start / mid /
    # end so min-of-3 samples three decorrelated host-load windows
    # (r5 verdict #3 — see _ingest_setup)
    ingest_ctx: dict | None = None
    ingest: dict = {}
    try:
        ingest_ctx = _ingest_setup(sf_dir, cpus)
    except Exception as exc:  # pragma: no cover
        print(f"bench: ingest setup failed: {exc}", file=sys.stderr)
        ingest = {"error": str(exc)}
    if ingest_ctx is not None:
        # warm-up failure must not also skip rep 1 (they used to share
        # one try): reps would then measure the cold path the warm-up
        # exists to remove, silently
        try:
            _ingest_warm(spark, ingest_ctx)  # untimed path warm-up
        except Exception as exc:  # pragma: no cover
            print(f"bench: ingest warm-up failed: {exc}", file=sys.stderr)
        try:
            _ingest_rep(spark, ingest_ctx)  # rep 1: bench start
        except Exception as exc:  # pragma: no cover
            print(f"bench: ingest rep1 failed: {exc}", file=sys.stderr)

    timings: dict[str, float] = {}
    order = headline + rest
    for qi, name in enumerate(order):
        # a few queries persist frames their returned (lazy) plan consumes
        # (simhash signatures, gap-fill hourly agg — see PLANS.md known
        # costs); the sweep releases those pinned blocks at FAMILY
        # boundaries (name prefix change) so they don't accumulate across
        # 100+ queries, while families that share a persisted frame (the
        # dedup_* queries all reuse the shingle index via Spark's
        # plan-matching cache) keep it warm within the family
        fam = name.split("_", 1)[0]
        if qi and fam != order[qi - 1].split("_", 1)[0]:
            spark.catalog.clearCache()
        t0 = time.perf_counter()
        try:
            df = registry[name].fn(spark, sf_dir)
            n = df.count()
            timings[name] = round(time.perf_counter() - t0, 4)
        except Exception as exc:  # pragma: no cover
            print(f"bench: {name} failed: {exc}", file=sys.stderr)
            timings[name] = -1.0
    # release the last family's pinned blocks so the sweep ends with zero
    # persistent RDDs (tests/test_cache_hygiene.py asserts this contract)
    spark.catalog.clearCache()

    if ingest_ctx is not None:
        try:
            _ingest_rep(spark, ingest_ctx)  # rep 2: after the sweep
        except Exception as exc:  # pragma: no cover
            print(f"bench: ingest rep2 failed: {exc}", file=sys.stderr)

    # retry block for the slowest 10 queries, min-of-3 INTERLEAVED:
    # single-shot timings on this host swing up to 10x from co-tenant
    # load, and the slowest list is exactly what cross-round perf
    # comparisons read. Two extra passes over the ten as a block — pass A
    # slowest-first, pass B in REVERSED order — so each query is measured
    # once early and once late in the warm-cache block and min-of-3 does
    # not systematically favor whichever query happened to run last
    # (the repo's interleaved-A/B noise methodology, PLANS.md round-2).
    retry = [
        q
        for q, t in sorted(
            ((q, t) for q, t in timings.items() if t >= 0),
            key=lambda kv: -kv[1],
        )[:10]
    ]
    for name in retry + retry[::-1]:
        try:
            t0 = time.perf_counter()
            registry[name].fn(spark, sf_dir).count()
            timings[name] = round(
                min(timings[name], time.perf_counter() - t0), 4
            )
        except Exception:  # pragma: no cover - keep prior measurement
            pass
        spark.catalog.clearCache()

    if ingest_ctx is not None:
        try:
            _ingest_rep(spark, ingest_ctx)  # rep 3: bench end
        except Exception as exc:  # pragma: no cover
            print(f"bench: ingest rep3 failed: {exc}", file=sys.stderr)
        try:
            ingest = _ingest_finalize(ingest_ctx)
            timings["ingest_e2e"] = ingest["seconds"]
        except Exception as exc:  # pragma: no cover
            print(f"bench: ingest_e2e failed: {exc}", file=sys.stderr)
            ingest = {"error": str(exc)}
            timings["ingest_e2e"] = -1.0
    else:
        timings["ingest_e2e"] = -1.0

    total = round(sum(t for t in timings.values() if t >= 0), 2)
    # The driver captures only the tail (~1 KB) of stdout; round 1's line
    # with all 108 per-query floats overflowed it and BENCH_r01.json got
    # "parsed": null. Keep the stdout line compact: headline queries only,
    # 2dp, summary keys first. The full per-query detail goes to
    # BENCH_DETAIL.json in the repo root (committed alongside the code).
    failed = sorted(q for q, t in timings.items() if t < 0)
    slowest = dict(
        sorted(
            ((q, t) for q, t in timings.items() if t >= 0),
            key=lambda kv: -kv[1],
        )[:3]
    )
    out = {
        "metric": "catalog_total_wall",
        "value": total,
        "unit": "sec",
        "sf": sf_dir,
        "cpus": cpus,
        "n_queries": len(timings),
        "n_failed": len(failed),
        "queries": {q: round(timings[q], 2) for q in headline if q in timings},
        "slowest": {q: round(t, 2) for q, t in slowest.items()},
        "ingest_rows_per_s": ingest.get("rows_per_s", -1),
        "ingest_sec": ingest.get("seconds", -1),
        "baseline_rows_per_s": BASELINE_ROWS_PER_S,
    }
    detail = {
        "metric": "catalog_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "failed": failed,
        "ingest": ingest,
        "sf": sf_dir,
        "cpus": cpus,
        "retry_method": "slowest-10 min-of-3, interleaved A/B block "
        "(pass A slowest-first, pass B reversed)",
        "retried": retry,
        "load_avg": {
            "start": [round(x, 2) for x in load_start],
            "end": [round(x, 2) for x in os.getloadavg()],
        },
    }
    try:
        detail_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   "BENCH_DETAIL.json")
        # carry an existing A/B adjudication forward (it names the commit
        # it compared, so staleness is self-identifying) — a plain bench
        # run must not erase the --ab evidence the driver's snapshot reads
        try:
            with open(detail_path) as fh:
                prev = json.load(fh)
            if "ab" in prev:
                detail["ab"] = prev["ab"]
        except (OSError, ValueError):
            pass
        with open(detail_path, "w") as fh:
            json.dump(detail, fh, indent=1, sort_keys=True)
            fh.write("\n")
    except OSError as exc:  # pragma: no cover
        print(f"bench: could not write BENCH_DETAIL.json: {exc}", file=sys.stderr)
    # the driver captures ~1KB of stdout tail: degrade the line gracefully
    # instead of asserting AFTER a successful sweep (an abort here would
    # reproduce the exact parsed:null failure this code prevents)
    line = json.dumps(out, separators=(",", ":"))
    for drop in ("queries", "slowest"):
        if len(line) < 900:
            break
        out.pop(drop, None)
        print(f"bench: dropped {drop!r} from stdout line (too long); "
              "full detail in BENCH_DETAIL.json", file=sys.stderr)
        line = json.dumps(out, separators=(",", ":"))
    print(line)


if __name__ == "__main__":
    main()
