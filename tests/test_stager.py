"""S2 stager semantics (quirk Q8): 403 permanent, other errors retried
with backoff, per-day error isolation. Fake transport — no network."""

from __future__ import annotations

import io
import urllib.error

import pytest

from dsacord_spark.sources.stager import (
    BackoffPolicy,
    PermanentDownloadError,
    download_with_backoff,
    stage_day,
    stage_range,
)


class FakeResponse(io.BytesIO):
    def __init__(self, data: bytes, status: int = 200):
        super().__init__(data)
        self.status = status

    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


def scripted_opener(script):
    calls = []

    def opener(url):
        calls.append(url)
        item = script.pop(0)
        if isinstance(item, Exception):
            raise item
        return item

    opener.calls = calls
    return opener


def no_sleep_policy(tries=4):
    p = BackoffPolicy(max_tries=tries)
    p.sleep = lambda _: None
    return p


def test_retry_then_success():
    opener = scripted_opener(
        [
            urllib.error.HTTPError("u", 500, "boom", None, None),
            urllib.error.URLError("conn reset"),
            FakeResponse(b"zipbytes"),
        ]
    )
    out = download_with_backoff("http://x/y.zip", opener=opener, policy=no_sleep_policy())
    assert out == b"zipbytes"
    assert len(opener.calls) == 3


def test_403_is_permanent_no_retry():
    opener = scripted_opener([urllib.error.HTTPError("u", 403, "forbidden", None, None)])
    with pytest.raises(PermanentDownloadError, match="forbidden or does not exist"):
        download_with_backoff("http://x/y.zip", opener=opener, policy=no_sleep_policy())
    assert len(opener.calls) == 1  # no retry after 403


def test_exhausted_retries_raise():
    opener = scripted_opener([urllib.error.URLError("down")] * 4)
    with pytest.raises(RuntimeError, match="failed after retries"):
        download_with_backoff("http://x/y.zip", opener=opener, policy=no_sleep_policy(4))


def test_stage_day_isolates_errors_and_writes_atomically(tmp_path):
    ok_opener = scripted_opener([FakeResponse(b"DATA")])
    path, err = stage_day(
        "http://x/d.zip", "2025-01-01", str(tmp_path), opener=ok_opener,
        policy=no_sleep_policy(),
    )
    assert err is None
    assert open(path, "rb").read() == b"DATA"
    assert "dt=2025-01-01" in path

    bad_opener = scripted_opener(
        [urllib.error.HTTPError("u", 403, "forbidden", None, None)]
    )
    path2, err2 = stage_day(
        "http://x/d2.zip", "2025-01-02", str(tmp_path), opener=bad_opener,
        policy=no_sleep_policy(),
    )
    assert path2 == "" and "forbidden" in err2  # error returned, not raised


def test_stage_range_downloads_concurrently(tmp_path):
    """O1 (main.go:114-135): with workers=N, N downloads are in flight at
    once. The opener blocks each call on a 2-party barrier — only true
    concurrency releases it; a serial loop would deadlock (caught by the
    barrier timeout instead of hanging the suite)."""
    import threading

    barrier = threading.Barrier(2, action=None)
    in_flight = []
    lock = threading.Lock()

    def blocking_opener(url):
        with lock:
            in_flight.append(url)
        barrier.wait(timeout=30)  # raises BrokenBarrierError if serial
        return FakeResponse(b"Z-" + url.encode())

    rows = [("2025-01-01", "http://x/a.zip"), ("2025-01-02", "http://x/b.zip")]
    results = stage_range(
        rows, str(tmp_path), workers=2,
        opener=blocking_opener, policy=no_sleep_policy(),
    )
    assert [err for _, err in results] == [None, None]
    # results preserve input order regardless of completion order
    assert "dt=2025-01-01" in results[0][0] and "dt=2025-01-02" in results[1][0]
    assert open(results[0][0], "rb").read() == b"Z-http://x/a.zip"
    assert len(in_flight) == 2


def test_stage_range_isolates_per_day_errors_under_concurrency(tmp_path):
    """O3 under O1: a 403 day fails in its worker thread and is returned
    in place; the other days still download."""
    def opener(url):
        if "b.zip" in url:
            raise urllib.error.HTTPError(url, 403, "forbidden", None, None)
        return FakeResponse(b"OK")

    rows = [
        ("2025-01-01", "http://x/a.zip"),
        ("2025-01-02", "http://x/b.zip"),
        ("2025-01-03", "http://x/c.zip"),
    ]
    results = stage_range(
        rows, str(tmp_path), workers=3, opener=opener, policy=no_sleep_policy(),
    )
    assert results[0][1] is None and results[2][1] is None
    assert results[1][0] == "" and "forbidden" in results[1][1]


def test_stage_range_distributed_tasks_download_and_isolate(spark, tmp_path):
    """O1 at cluster scale: the URL-table partitions download inside
    Spark tasks (mapPartitions), results come back day-count-sized with
    per-day error isolation intact. The fake opener is defined inside
    the test so cloudpickle ships it by value to the workers."""

    class _R(io.BytesIO):
        status = 200

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    def opener(url):
        if "2025-01-02" in url:
            raise urllib.error.HTTPError(url, 403, "forbidden", None, None)
        return _R(url.rsplit("/", 1)[-1].encode())

    from dsacord_spark.sources.stager import stage_range_distributed
    from dsacord_spark.sources.urlgen import url_table
    from datetime import date

    urls = url_table(spark, date(2025, 1, 1), date(2025, 1, 3), workers=3)
    results = stage_range_distributed(
        urls, str(tmp_path), opener=opener, policy=no_sleep_policy(1)
    )
    assert len(results) == 3
    by_err = [e for _, e in results]
    assert sum(e is not None for e in by_err) == 1
    assert any(e and "forbidden" in e for e in by_err)
    ok_paths = [p for p, e in results if e is None]
    assert len(ok_paths) == 2
    for p in ok_paths:
        assert open(p, "rb").read() == p.rsplit("/", 1)[-1].encode()


def test_stage_day_unlinks_temp_when_write_fails(tmp_path, monkeypatch):
    """r8 ADVICE: a failed write/publish must not orphan the
    attempt-unique temp file — unlike the old fixed '.tmp' name (which
    the next attempt overwrote), a unique temp left behind is permanent
    litter in the landing dir."""
    import os

    import dsacord_spark.sources.stager as stager_mod

    real_replace = os.replace

    def boom_replace(src, dst):
        raise OSError("disk full mid-publish")

    monkeypatch.setattr(stager_mod.os, "replace", boom_replace)
    opener = scripted_opener([FakeResponse(b"DATA")])
    with pytest.raises(OSError, match="disk full"):
        stage_day(
            "http://x/d.zip", "2025-01-01", str(tmp_path), opener=opener,
            policy=no_sleep_policy(),
        )
    day_dir = tmp_path / "dt=2025-01-01"
    leftovers = [p.name for p in day_dir.iterdir()]
    assert leftovers == [], f"orphaned temp files: {leftovers}"
    monkeypatch.setattr(stager_mod.os, "replace", real_replace)


def test_stage_range_sweeps_stale_temps(tmp_path):
    """A SIGKILLed attempt's temp (try/finally never ran) is removed by
    the next stage_range before downloads start — but ONLY once it is
    older than the liveness threshold (r9 ADVICE: a concurrent run
    sharing the landing dir may be mid-write in a FRESH temp, and
    unlinking it under the writer would fail its atomic publish).
    Published .zip files are untouched."""
    import os
    import time

    from dsacord_spark.sources.stager import sweep_stale_temps

    day_dir = tmp_path / "dt=2025-01-01"
    day_dir.mkdir(parents=True)
    stale = day_dir / "d.zip.tmp.999.888.deadbeef"
    stale.write_bytes(b"partial")
    two_h_ago = time.time() - 7200
    os.utime(stale, (two_h_ago, two_h_ago))
    live = day_dir / "d.zip.tmp.111.222.cafecafe"
    live.write_bytes(b"being written right now")
    keep = day_dir / "old.zip"
    keep.write_bytes(b"published")

    opener = scripted_opener([FakeResponse(b"DATA")])
    results = stage_range(
        [("2025-01-02", "http://x/d2.zip")], str(tmp_path),
        opener=opener, policy=no_sleep_policy(),
    )
    assert results[0][1] is None
    assert not stale.exists(), "old orphan survived the sweep"
    assert live.exists(), "a fresh (possibly live) temp was unlinked"
    assert keep.read_bytes() == b"published"
    assert sweep_stale_temps(str(tmp_path / "missing-dir")) == 0
