"""Automated enforcement of the PLANS.md physical-plan invariants.

PLANS.md documents, per audit, that the catalog contains no
CartesianProduct and no undeclared Python-eval nodes. Docs drift; this
test sweeps `explain(formatted)` for EVERY catalog entry (no execution —
plan compilation only) and asserts the invariants mechanically:

1. No `CartesianProduct` anywhere (unbounded NxM is never acceptable;
   broadcast nested-loop against declared-tiny sides is).
2. Python/Arrow eval nodes appear ONLY in entries that declare a Python
   kernel (multimodal decoders, the UDX surface, vectorized
   similarity/ANN kernels, streaming stateful entries) — everything else
   must stay fully JVM-side for whole-stage codegen.
3. Every entry's plan must contain at least one parquet scan of the
   sf_dir (guards against an entry silently computing from literals).
"""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout

import pytest

from dsacord_spark.plans.catalog import specs

# Entries DECLARED to run a Python kernel (Arrow-batched; the slow path
# used only where built-ins cannot express the semantics).
_PYTHON_KERNEL_OK = {
    # multimodal decode / transform (binary media needs Python)
    "multimodal_decode_meta",
    "multimodal_audio_meta",
    "multimodal_video_meta",
    "multimodal_frame_sample",
    "multimodal_resize",
    "multimodal_binary_stats",
    "multimodal_phash_dedup",  # pixel decode + dHash kernel
    "multimodal_audio_fingerprint_dedup",  # PCM decode + envelope hash
    "multimodal_video_fingerprint_dedup",  # AVI demux + frame hash
    "text_compression_ratio",  # zlib kernel
    # UDX surface (the POINT of these entries is the Python UDF API)
    "udtf_sentence_split",
    "udaf_grouped_median",
    "grouped_map_percentile",
    # vectorized numpy block kernels
    "knn_label_accuracy",
    "ann_ivf_topk_blas",
    "ann_ivf_kmeans_topk",
    "embed_dim_redundancy_topk",  # per-task int64 Gramian (mapInArrow)
    # streaming stateful (applyInPandasWithState sessionizer)
    "session_stateful",
}

# Streaming entries execute through run_bounded_stream/sessionize_bounded
# (they stage data and run a real stream when CALLED); their "plan" is a
# driver-side recipe, not a single compilable query — explain() would
# trigger execution. Audit them by module instead.
_STREAMING_PREFIX = ("stream_", "session_stateful")


def _plans(spark, sf_dir):
    out = {}
    for name, spec in specs().items():
        if name.startswith(_STREAMING_PREFIX[0]) or name in (
            "session_stateful",
        ):
            continue
        df = spec.fn(spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        simple = df._jdf.queryExecution().executedPlan().toString()
        out[name] = {"fmt": buf.getvalue(), "simple": simple,
                     "schema": df.schema}
    return out


@pytest.fixture(scope="module")
def all_plans(spark, sf_dir):
    return _plans(spark, sf_dir)


def test_no_cartesian_product_anywhere(all_plans):
    offenders = [
        n for n, p in all_plans.items() if "CartesianProduct" in p["fmt"]
    ]
    assert not offenders, offenders


def test_python_nodes_only_where_declared(all_plans):
    pat = re.compile(
        r"BatchEvalPython|ArrowEvalPython|FlatMapGroupsInPandas|MapInPandas"
        r"|AggregateInPandas|PythonMapInArrow"
    )
    offenders = {
        n: sorted(set(pat.findall(p["fmt"])))
        for n, p in all_plans.items()
        if pat.search(p["fmt"]) and n not in _PYTHON_KERNEL_OK
    }
    assert not offenders, (
        f"undeclared Python eval nodes: {offenders} — either push the "
        "logic into built-in functions or add the entry to "
        "_PYTHON_KERNEL_OK with a justification"
    )


# Entries whose final plan legitimately contains no parquet scan:
# s1_url_generation materializes a date-range sequence (the reference's
# URL generator takes no table input — main.go:146-154); dedup_components
# returns the materialized component table (iterative label propagation /
# union-find runs at call time, the result is a local checkpoint).
_NO_SCAN_OK = {"s1_url_generation", "dedup_components"}


def test_every_plan_scans_input(all_plans):
    no_scan = [
        n
        for n, p in all_plans.items()
        if "Scan parquet" not in p["fmt"]
        and "BatchScan" not in p["fmt"]
        and n not in _NO_SCAN_OK
    ]
    assert not no_scan, no_scan


def test_no_nested_columns_in_catalog_outputs(all_plans):
    """Driver-canonicalizer contract: catalog outputs hold SCALAR cells
    only. The round-4 harness crashed (`unhashable type: 'list'`) when
    multimodal_decode_meta/audio_meta exposed raw array<float> feature
    columns — pandas sort_values can't canonicalize object-of-list
    Series. Arrays/maps stay internal (decode_* keeps typed vectors);
    registered entries must flatten them (e.g. _feature_str's 6dp
    rendering)."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    offenders = {
        n: [f.name for f in p["schema"].fields
            if isinstance(f.dataType, (ArrayType, MapType, StructType))]
        for n, p in all_plans.items()
        if any(isinstance(f.dataType, (ArrayType, MapType, StructType))
               for f in p["schema"].fields)
    }
    assert not offenders, (
        f"nested driver-visible columns: {offenders} — serialize to a "
        "deterministic string (see plans/advanced.py::_feature_str)"
    )


# --- invariant 4: single-partition funnels must be bounded -----------------
#
# An `Exchange SinglePartition` moves EVERYTHING in its subtree through
# one task — fine when what flows is already reduced (a keyless
# aggregate's partials, a LIMIT, a broadcast-declared-tiny side), fatal
# when raw table rows flow through it (the round-3 verdict's
# events_user_copresence_topk / ltv-decile findings: an unpartitioned
# window or rank over an unreduced frame is the plan shape that dies
# first at 100x). Mechanically: on every root-to-scan path BELOW a
# SinglePartition exchange there must be at least one REDUCING node —
# an Aggregate, a Limit/TakeOrdered, or a BroadcastExchange.

_REDUCING = re.compile(
    r"^(HashAggregate|SortAggregate|ObjectHashAggregate|LocalLimit"
    r"|GlobalLimit|TakeOrderedAndProject|CollectLimit|BroadcastExchange"
    r"|ReusedExchange|LocalTableScan|Range\b)"
)
_SCAN = re.compile(r"^(BatchScan|FileScan|Scan parquet|InMemoryTableScan)")


def _tree(simple: str):
    """Parse executedPlan().toString() indentation into (depth, name) and
    children adjacency. Each tree level is 3 chars of prefix."""
    nodes = []
    for ln in simple.splitlines():
        m = re.match(r"^([ :+\-|]*?)(\*?)\s*([A-Za-z].*)$", ln)
        if not m or not m.group(3):
            continue
        depth = len(m.group(1)) // 3
        name = m.group(3).lstrip("* ")
        nodes.append((depth, name))
    children: dict[int, list[int]] = {i: [] for i in range(len(nodes))}
    stack: list[int] = []
    for i, (d, _) in enumerate(nodes):
        while stack and nodes[stack[-1]][0] >= d:
            stack.pop()
        if stack:
            children[stack[-1]].append(i)
        stack.append(i)
    return nodes, children


def _unbounded_scan_paths(nodes, children, root: int) -> bool:
    """True if some path root->leaf hits a scan with no reducing node."""

    def walk(i: int) -> bool:
        name = nodes[i][1]
        if _REDUCING.match(name):
            return False  # this branch is bounded from here down
        if _SCAN.match(name):
            return True
        return any(walk(c) for c in children[i])

    return any(walk(c) for c in children[root])


def test_single_partition_funnels_are_bounded(all_plans):
    offenders = {}
    for qname, p in all_plans.items():
        nodes, children = _tree(p["simple"])
        bad = [
            i
            for i, (_, name) in enumerate(nodes)
            if name.startswith("Exchange SinglePartition")
            and _unbounded_scan_paths(nodes, children, i)
        ]
        if bad:
            offenders[qname] = [nodes[i][1] for i in bad]
    assert not offenders, (
        f"raw-scan rows flow through a single-partition exchange in: "
        f"{sorted(offenders)} — reduce (aggregate/limit/broadcast) before "
        "any global funnel, or re-express with a distributed two-pass "
        "rank (plans/reports.py _global_rank)"
    )
