"""Property-based test: text_boilerplate_coverage vs an independent
pure-Python reference on adversarial corpora (tiny vocabularies force
window collisions; lengths straddle the 8-token window; duplicate
windows within one doc; df exactly at the threshold).

The DuckDB oracle proves Spark and DuckDB agree; this proves both agree
with a from-scratch statement of the INTENDED semantics."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from dsacord_spark.plans.catalog import specs

_N = 8
_DF = 3

_VOCAB = ["a", "b", "c", "d"]
_doc = st.lists(st.sampled_from(_VOCAB), min_size=0, max_size=20)
_corpus = st.lists(_doc, min_size=2, max_size=6)


def _py_boilerplate(token_docs: list[list[str]]):
    """Independent reference: windows are 1-indexed slices t[i:i+7] for
    i in 1..max(len-7, 1); a window string in >= 3 distinct docs is
    boilerplate; coverage is the union of positions i..min(i+7, len)."""
    toks = {d: t for d, t in enumerate(token_docs) if t}
    by_window: dict[str, set[int]] = {}
    positions: dict[int, list[tuple[int, str]]] = {}
    for d, t in toks.items():
        stop = max(len(t) - (_N - 1), 1)
        for i in range(1, stop + 1):
            key = " ".join(t[i - 1 : i - 1 + _N])
            by_window.setdefault(key, set()).add(d)
            positions.setdefault(d, []).append((i, key))
    boiler = {k for k, ds in by_window.items() if len(ds) >= _DF}
    out = {}
    for d, t in toks.items():
        cov: set[int] = set()
        for i, key in positions[d]:
            if key in boiler:
                cov.update(range(i, min(i + _N - 1, len(t)) + 1))
        out[d] = (len(t), len(cov))
    return out


@settings(max_examples=8, deadline=None)
@given(corpus=_corpus)
def test_boilerplate_matches_python_reference(spark, tmp_path_factory, corpus):
    rows = [(d, " ".join(t)) for d, t in enumerate(corpus)]
    sf = str(tmp_path_factory.mktemp("bp"))
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(
        1
    ).write.mode("overwrite").parquet(f"{sf}/documents.parquet")
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_boiler_tokens"])
        for r in specs()["text_boilerplate_coverage"].fn(spark, sf).collect()
    }
    want = _py_boilerplate(corpus)
    assert got == want, (corpus, got, want)


def _md5_long(s: str) -> int:
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


@settings(max_examples=8, deadline=None)
@given(
    lengths=st.lists(st.integers(min_value=0, max_value=40), min_size=1, max_size=30)
)
def test_pack_sequences_matches_python_reference(
    spark, tmp_path_factory, lengths
):
    """Packing plan vs an independent reference including the md5 shard
    assignment: same bins, doc counts, token sums, and offsets."""
    rows = [(d, " ".join(["w"] * n)) for d, n in enumerate(lengths)]
    sf = str(tmp_path_factory.mktemp("pk"))
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(
        1
    ).write.mode("overwrite").parquet(f"{sf}/documents.parquet")

    # reference: shard by md5(doc_id) % 32, order by doc_id, cumulative
    # offsets, bin = start_offset // 512
    SEQ, SHARDS = 512, 32
    want = {}
    running: dict[int, int] = {}
    for d, n in sorted(enumerate(lengths)):
        if n < 1:
            continue
        shard = _md5_long(str(d)) % SHARDS
        start = running.get(shard, 0)
        key = (shard, start // SEQ)
        if key not in want:
            want[key] = [0, 0, start, start]
        want[key][0] += 1
        want[key][1] += n
        want[key][3] = start + n
        running[shard] = start + n

    got = {
        (r["shard"], r["bin"]): [
            r["n_docs"], r["n_tokens"], r["start_offset"], r["end_offset"]
        ]
        for r in specs()["corpus_pack_sequences"].fn(spark, sf).collect()
    }
    assert got == {k: list(v) for k, v in want.items()}, (lengths, got, want)
