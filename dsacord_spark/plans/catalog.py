"""Aggregated catalog: importing the query-group modules populates the
registry; `queries()` / `oracle_sql()` are re-exported by __spark_entry__.py
for the driver."""

from __future__ import annotations

import json
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

import dsacord_spark.plans.relational  # noqa: F401  (registers layer A)
import dsacord_spark.plans.analysis  # noqa: F401  (registers layer B)
import dsacord_spark.plans.advanced  # noqa: F401  (registers advanced ops)
import dsacord_spark.plans.extended  # noqa: F401  (registers extended ops)
import dsacord_spark.plans.composite  # noqa: F401  (registers composite ops)
import dsacord_spark.plans.curation  # noqa: F401  (registers curation ops)
import dsacord_spark.plans.udx  # noqa: F401  (registers UDTF/UDAF surface)
import dsacord_spark.plans.tpch_rest  # noqa: F401  (registers TPC-H suite rest)
import dsacord_spark.plans.quality  # noqa: F401  (registers corpus-quality ops)
import dsacord_spark.plans.reports  # noqa: F401  (registers r3 report ops — LAST so existing window seqs are stable)
from dsacord_spark.plans.registry import QuerySpec, get_registry

# The driver's per-round correctness check covers only the FIRST 50
# registry entries (round 1 checked exactly the first 50 in import order,
# leaving 58 of 108 catalog queries with no driver signal — VERDICT.md r1).
# Emission order is therefore derived from the driver's own recorded
# history (CORRECTNESS_r*.json at the repo root) so every round's
# 50-query window maximizes NEW signal, with no per-round hand editing:
#   group 0 — queries whose LATEST driver check failed any of the three
#             booleans: they lead the window so the fix is proven;
#   group 1 — never driver-checked, oracle-eligible entries (value-hash
#             signal is worth more than a rows-only check); within the
#             group, entries from the modules the round-1 verdict named
#             as needing driver signal first (the TPC-H composites,
#             the curation family, and the UDX trio — VERDICT.md r1
#             "Next round" #2 lists them as the done-criterion), then
#             the rest in registration order;
#   group 2 — never driver-checked, rows-only entries;
#   group 3 — previously green, oldest round first (regression canaries
#             rotate back in over time).
# Within a group, registration (module import) order is kept otherwise.
# If the history files are unreadable the registry order stands — the
# sweep still covers the first 50.

_WINDOW_PRIORITY_MODULES = (
    "dsacord_spark.plans.composite",
    "dsacord_spark.plans.curation",
    "dsacord_spark.plans.udx",
)


def _driver_history() -> dict[str, dict]:
    """Latest driver verdict per query from CORRECTNESS_r*.json files."""
    hist: dict[str, dict] = {}
    root = Path(__file__).resolve().parents[2]
    for path in sorted(root.glob("CORRECTNESS_r*.json")):
        try:
            data = json.loads(path.read_text())
        except (OSError, ValueError):
            continue
        if not isinstance(data, dict):
            continue
        for name, rec in data.items():
            if isinstance(rec, dict):
                hist[name] = {**rec, "_round": path.name}
    return hist


def _is_green(rec: dict, has_sql: bool) -> bool:
    """Single definition of 'this driver record is a clean pass' — shared
    with tests/test_catalog_oracle.py so the rotation tests can never
    drift from production classification.

    A value-oracled record is green iff rows+schema+hash all passed with
    no error. A rows-only entry (has_sql=False) can never value-match:
    the driver records err="no_oracle" with the observed row count, and
    that IS its full-strength check (the value gate is
    tests/test_rows_only_golden.py) — green, so the slot rotates like
    any other instead of pinning the window forever. A null spark_rows
    means the harness crashed before counting (e.g. a
    non-canonicalizable column) — a real failure either way."""
    if (
        not has_sql
        and rec.get("err") == "no_oracle"
        and rec.get("spark_rows") is not None
    ):
        return True
    return bool(
        rec.get("rows_match")
        and rec.get("schema_match")
        and rec.get("hash_match", True)
    ) and rec.get("err") is None


def _ordered() -> dict[str, QuerySpec]:
    reg = get_registry()
    try:
        hist = _driver_history()
    except Exception:  # pragma: no cover - defensive: never break the driver
        hist = {}
    seq = {name: i for i, name in enumerate(reg)}

    def sort_key(name: str):
        rec = hist.get(name)
        if rec is not None:
            has_sql = reg[name].sql is not None
            if _is_green(rec, has_sql):
                return (3, rec.get("_round", ""), seq[name])
            if not has_sql or rec.get("err") != "no_oracle":
                return (0, "", seq[name])
            # history says rows-only but the entry HAS an oracle now: it
            # was upgraded since that check — its first value check beats
            # green canaries, so fall through to the never-checked groups
        if reg[name].sql is not None:
            named = reg[name].fn.__module__ in _WINDOW_PRIORITY_MODULES
            return (1, "" if named else "z", seq[name])
        return (2, "", seq[name])

    out = {n: reg[n] for n in sorted(reg, key=sort_key)}
    return out


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in _ordered().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.sql for name, spec in _ordered().items() if spec.sql is not None
    }


def specs() -> dict[str, QuerySpec]:
    return _ordered()


def run_query(
    spark: SparkSession, name: str, sf_dir: str
) -> list:
    """Leak-free single-entry runner for EXTERNAL callers: execute one
    catalog entry to completion and release every cached block before
    returning the collected rows.

    A handful of entries persist intermediate frames their returned
    (lazy) plan consumes — simhash signatures, kernel-computed media
    hashes, the gap-fill hourly aggregate (PLANS.md "Known intentional
    costs"). The in-repo harnesses (bench.py, oracle sweeps) release
    those pinned blocks at family boundaries, but a caller holding only
    the lazy DataFrame from queries()[name] would inherit them for the
    session. This wrapper is the supported way to run one entry
    standalone: materialize, then clearCache.

    CAVEAT: the cleanup is session-wide — clearCache() also evicts any
    frames the CALLER had cached for its own purposes (Spark offers no
    way to enumerate only the blocks one query pinned). Re-persist
    caller-side frames after this returns, or use the queries() dict
    directly and manage caches yourself.

    For bulk runs, prefer the queries() dict directly and call
    spark.catalog.clearCache() at family boundaries like bench.py does
    (clearing per-entry would evict frames that consecutive same-family
    entries deliberately share)."""
    reg = _ordered()
    if name not in reg:
        raise KeyError(
            f"unknown catalog entry {name!r}; valid names: "
            f"{', '.join(sorted(reg))}"
        )
    # the blast radius is easy to miss (ADVICE r6): surface pre-existing
    # caller caches loudly before the session-wide clearCache drops them
    # (Spark offers no per-query block enumeration to scope the evict).
    # Probe the SQL CacheManager, not getPersistentRDDs(): a DataFrame
    # persist registers in the CacheManager at .persist() time, while
    # its RDD only appears after the first action — the unmaterialized
    # persist is exactly the silent-eviction case to warn about, and
    # raw-RDD persists (which clearCache does NOT touch) would
    # false-positive (r7 review finding).
    try:
        pre_cached = not (
            spark._jsparkSession.sharedState().cacheManager().isEmpty()
        )
    except Exception:  # pragma: no cover - py4j internals may shift
        pre_cached = False
    try:
        return reg[name].fn(spark, sf_dir).collect()
    finally:
        if pre_cached:
            import warnings

            warnings.warn(
                f"run_query({name!r}) clears the session cache on exit: "
                "pre-existing cached DataFrame(s) are being evicted too "
                "— re-persist caller-side frames after this returns, or "
                "manage caches via queries() directly",
                RuntimeWarning,
                stacklevel=2,
            )
        spark.catalog.clearCache()
