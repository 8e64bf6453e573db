"""In-process lease registry coordinating index MAINTENANCE with live
streaming probes (r10 verdict item 4 / PLANS.md backlog).

The streaming probes (stream_probe_hamming_index / _minhash_index)
re-read their index tables lazily: between snapshot refreshes the data
lives in localCheckpoint blocks (file-independent), but at every refresh
boundary — or every micro-batch under the refresh=None policy — the
probe resolves the CURRENT table files and reads them. compact_index
rewrites those files; run concurrently from another thread it can
delete files an in-flight probe plan still references. The registry
makes that interleaving explicit:

- a stream probe holds a lease on its index base name for the stream's
  lifetime;
- the probe marks the lease "at boundary" while its on_batch_start hook
  runs — the one point where no probe plan is in flight and a SYNCHRONOUS
  compaction completes before the next batch's plan is built, so
  maintenance driven from the hook is safe by construction;
- compact_index refuses (raises) while any lease is live and NOT at a
  boundary, unless forced.

Scope: leases are per-process (this driver). A second driver compacting
the same warehouse is not visible here — the composed daily runbook is
sequential within one driver, which is the deployment this guards. The
rename-aside swap in sinks/parquet.compact_bucketed_table independently
guarantees the TABLE always exists; this registry guards the narrower
live-file-list race.
"""

from __future__ import annotations

import threading
from contextlib import contextmanager

_LOCK = threading.Lock()
_LEASES: dict[str, list["_StreamLease"]] = {}
_MAINTENANCE: dict[str, int] = {}


class _StreamLease:
    __slots__ = ("table_name", "at_boundary")

    def __init__(self, table_name: str):
        self.table_name = table_name
        self.at_boundary = False


@contextmanager
def stream_lease(table_name: str):
    """Register a live streaming reader of index `table_name` (base name,
    not the per-suffix tables) for the duration of the with-block.
    Raises if a maintenance op is currently rewriting the index — a
    stream started mid-rewrite would plan batch 0 over files about to
    be deleted (the reverse direction of the compaction guard; both
    directions are decided under the one registry lock, so neither side
    can slip in between the other's check and registration)."""
    lease = _StreamLease(table_name)
    with _LOCK:
        if _MAINTENANCE.get(table_name):
            raise RuntimeError(
                f"cannot start a streaming probe of {table_name!r}: a "
                f"maintenance rewrite (compact_index) is in progress — "
                f"retry when it completes"
            )
        _LEASES.setdefault(table_name, []).append(lease)
    try:
        yield lease
    finally:
        with _LOCK:
            held = _LEASES.get(table_name, [])
            if lease in held:
                held.remove(lease)
            if not held:
                _LEASES.pop(table_name, None)


@contextmanager
def at_boundary(lease: "_StreamLease"):
    """Mark `lease` as sitting at a micro-batch boundary (no probe plan
    in flight) while the block runs — maintenance invoked inside it sees
    this lease as non-blocking."""
    lease.at_boundary = True
    try:
        yield
    finally:
        lease.at_boundary = False


def blocking_leases(table_name: str) -> int:
    """Number of live leases on `table_name` that are NOT currently at a
    batch boundary — the count that must be 0 for a file-rewriting
    maintenance op to proceed safely."""
    with _LOCK:
        return sum(
            1 for lease in _LEASES.get(table_name, ())
            if not lease.at_boundary
        )


@contextmanager
def maintenance_lease(table_name: str, force: bool = False):
    """Atomically claim `table_name` for a file-rewriting maintenance op
    (compact_index): under the ONE registry lock, verify no mid-batch
    stream lease exists (unless `force`) and mark maintenance active, so
    a stream starting after the check cannot race the rewrite — the
    check-then-rewrite TOCTOU the r11 review flagged. Mid-batch leases
    raise the refusal the caller turns into its diagnostic; leases AT a
    boundary (the on_batch_start hook window) do not block, and a
    stream attempting to START during the with-block is rejected by
    stream_lease."""
    with _LOCK:
        blocking = sum(
            1 for lease in _LEASES.get(table_name, ())
            if not lease.at_boundary
        )
        if blocking and not force:
            raise _MaintenanceBlocked(table_name, blocking)
        _MAINTENANCE[table_name] = _MAINTENANCE.get(table_name, 0) + 1
    try:
        yield
    finally:
        with _LOCK:
            n = _MAINTENANCE.get(table_name, 1) - 1
            if n <= 0:
                _MAINTENANCE.pop(table_name, None)
            else:
                _MAINTENANCE[table_name] = n


class _MaintenanceBlocked(RuntimeError):
    def __init__(self, table_name: str, n_blocking: int):
        self.table_name = table_name
        self.n_blocking = n_blocking
        super().__init__(
            f"{n_blocking} live streaming probe(s) hold a mid-batch "
            f"lease on {table_name!r}"
        )
