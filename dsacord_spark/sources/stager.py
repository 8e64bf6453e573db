"""S2 — HTTP stager with exponential backoff
(/root/reference/utils.go:25-48).

Downloads each daily dump ZIP into a landing directory laid out as
`landing/dt=YYYY-MM-DD/<name>.zip` so every downstream scan gets partition
pruning by dump date (SURVEY §4.3).

Error classification mirrors the reference exactly (quirk Q8):
- HTTP 403 -> permanent failure, "forbidden or does not exist"
  (utils.go:34-36): no retry;
- any other non-200 -> retry with exponential backoff (utils.go:38-46);
- per-day errors are isolated — a failed day never aborts the run
  (main.go:137-144, O3).

Network I/O is confined to this staging step (driver- or
foreachPartition-side); everything after reads local/DFS files, so Spark
task retries never re-download. Uses only stdlib urllib; retry policy is
injectable for tests (no network in CI).
"""

from __future__ import annotations

import os
import threading
import time
import urllib.error
import urllib.request
import uuid
from dataclasses import dataclass


class PermanentDownloadError(Exception):
    """403: dump is forbidden or does not exist (utils.go:34-36)."""


@dataclass
class BackoffPolicy:
    """Exponential backoff matching the shape of the reference's
    backoff.NewExponentialBackOff(): initial 0.5s, x1.5, capped tries."""

    initial_s: float = 0.5
    multiplier: float = 1.5
    max_tries: int = 8
    sleep = staticmethod(time.sleep)

    def delays(self):
        d = self.initial_s
        for _ in range(self.max_tries):
            yield d
            d *= self.multiplier


def download_with_backoff(
    url: str, opener=None, policy: BackoffPolicy | None = None
) -> bytes:
    """GET the URL with reference-faithful retry classification."""
    policy = policy or BackoffPolicy()
    opener = opener or urllib.request.urlopen
    last_err: Exception | None = None
    for delay in policy.delays():
        try:
            with opener(url) as resp:
                status = getattr(resp, "status", 200)
                if status == 403:
                    raise PermanentDownloadError(
                        f"{url}: file is forbidden or does not exist"
                    )
                if status != 200:
                    raise urllib.error.HTTPError(url, status, "bad status", None, None)
                return resp.read()
        except PermanentDownloadError:
            raise
        except urllib.error.HTTPError as e:
            if e.code == 403:
                raise PermanentDownloadError(
                    f"{url}: file is forbidden or does not exist"
                ) from e
            last_err = e
        except (urllib.error.URLError, ConnectionError, TimeoutError) as e:
            last_err = e
        policy.sleep(delay)
    raise RuntimeError(f"download failed after retries: {url}") from last_err


def stage_day(url: str, dt: str, landing_dir: str, **kw) -> tuple[str, str | None]:
    """Download one day's ZIP into landing/dt=<dt>/. Returns (path|'', error).
    Error isolation per day (O3): failures are returned, not raised."""
    out_dir = os.path.join(landing_dir, f"dt={dt}")
    os.makedirs(out_dir, exist_ok=True)
    out_path = os.path.join(out_dir, os.path.basename(url))
    try:
        data = download_with_backoff(url, **kw)
    except Exception as exc:
        return "", f"{dt}: {exc}"
    # attempt-unique temp name: under distributed staging, speculative
    # or zombie task attempts for the same day may run concurrently, and
    # a shared fixed '.tmp' would interleave writes into one corrupt
    # file (r8 review). Unique temps mean each attempt publishes its own
    # complete bytes; os.replace stays atomic and last-publish wins.
    tmp = f"{out_path}.tmp.{os.getpid()}.{threading.get_ident()}.{uuid.uuid4().hex[:8]}"
    try:
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, out_path)  # atomic publish: never a partial
    finally:
        # unlike the old fixed '.tmp' (overwritten by the next attempt),
        # a unique temp orphaned by a failed write/replace would live
        # forever — unlink it on any exit where the publish didn't
        # consume it (r8 ADVICE; a killed -9 attempt still orphans, so
        # stage_range also sweeps stale temps at start)
        if os.path.exists(tmp):
            try:
                os.unlink(tmp)
            except OSError:
                pass
    return out_path, None


def sweep_stale_temps(landing_dir: str, min_age_s: float = 3600.0) -> int:
    """Remove orphaned `*.zip.tmp.*` attempt files under the landing dir
    — litter from attempts killed between write and publish (the
    try/finally in stage_day cannot run for a SIGKILL). Called by
    stage_range before any download starts; NOT called on the
    distributed path, where concurrent tasks on other nodes may hold
    open temps. Temps never match read_staged_zips' `*.zip` glob, so
    this is hygiene, not correctness.

    Only temps whose mtime is older than `min_age_s` (default 1h) are
    removed (r9 ADVICE): a SECOND driver run sharing the landing dir may
    have a live attempt mid-write, and an unconditional sweep would
    unlink it under the writer — failing its os.replace and defeating
    the unique-temp design whose point was safe concurrent attempts. An
    orphan is by definition not being written anymore, so age is the
    discriminator; a crashed attempt's temp is collected by the first
    run starting an hour later."""
    removed = 0
    if not os.path.isdir(landing_dir):
        return 0
    now = time.time()
    for root, _dirs, files in os.walk(landing_dir):
        for name in files:
            if ".zip.tmp." in name:
                p = os.path.join(root, name)
                try:
                    if now - os.path.getmtime(p) >= min_age_s:
                        os.unlink(p)
                        removed += 1
                except OSError:
                    pass
    return removed


def stage_range(
    url_rows, landing_dir: str, workers: int = 1, **kw
) -> list[tuple[str, str | None]]:
    """Stage a list of (dt, url) rows with up to `workers` concurrent
    downloads (the reference's worker pool, main.go:114-135 — O1; the
    README recommends ≤5). Downloads are I/O-bound and each day writes
    to its own dt= directory via an atomic rename, so a thread pool is
    safe; per-day error isolation (O3) is preserved because stage_day
    returns failures instead of raising. Results come back in input
    order regardless of completion order (Executor.map semantics), so
    callers see the same deterministic list the serial loop produced."""
    url_rows = list(url_rows)
    sweep_stale_temps(landing_dir)
    if workers <= 1 or len(url_rows) <= 1:
        return [stage_day(url, dt, landing_dir, **kw) for dt, url in url_rows]
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=min(workers, len(url_rows))) as pool:
        return list(
            pool.map(lambda r: stage_day(r[1], r[0], landing_dir, **kw), url_rows)
        )


def stage_range_distributed(
    url_df, landing_dir: str, opener=None, policy: BackoffPolicy | None = None
) -> list[tuple[str, str | None]]:
    """Cluster-side staging: each Spark task downloads its partition of
    the URL table straight into the (shared/DFS) landing dir — the
    multi-node formulation of the reference's worker pool (O1,
    main.go:114-135). `stage_range`'s thread pool saturates one node's
    NIC; on a 1000-executor cluster a 10-year backfill wants the
    downloads where the tasks are, so concurrency = the URL table's
    partition count (url_table(workers=N) sets it) times task slots.

    Error isolation (O3) is unchanged — stage_day returns failures —
    and the per-day atomic rename makes re-runs idempotent. Requires
    `landing_dir` to be visible to executors (true for DFS paths and
    for local paths in local mode). The injectable opener/policy must
    be picklable (module-level fakes in tests; default urllib in
    production). Results: one (path|'', error|None) per day, collected
    to the driver — day-count-sized, never data-sized."""
    kw = {}
    if opener is not None:
        kw["opener"] = opener
    if policy is not None:
        kw["policy"] = policy

    def _stage_partition(rows):
        for r in rows:
            yield stage_day(r["url"], r["dt"], landing_dir, **kw)

    return [
        (p, e)
        for p, e in url_df.select("dt", "url").rdd.mapPartitions(
            _stage_partition
        ).collect()
    ]
