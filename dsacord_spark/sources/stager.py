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
import time
import urllib.error
import urllib.request
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
    tmp = out_path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, out_path)  # atomic publish: readers never see partials
    return out_path, None


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
    if workers <= 1 or len(url_rows) <= 1:
        return [stage_day(url, dt, landing_dir, **kw) for dt, url in url_rows]
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=min(workers, len(url_rows))) as pool:
        return list(
            pool.map(lambda r: stage_day(r[1], r[0], landing_dir, **kw), url_rows)
        )
