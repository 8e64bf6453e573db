"""Golden-value gates for the rows-only catalog entries (VERDICT r2 #5).

These catalog entries can never hash-match a DuckDB oracle: the
multimodal queries here decode/hash binary media DuckDB can't parse, the
compression-ratio query needs zlib, and the streaming HLL query's
estimates are engine-specific. Their driver check is rows-only — so
THIS file is their value oracle: every entry's FULL result at sf0.001
is pinned as a canonical sha256 (columns sorted by name, rows sorted,
floats at 6dp, binary cells md5'd), exactly the strength of the
driver's value-hash check. The inputs are deterministic (media bytes
are synthesized per-doc from content hashes; HLL seeds are fixed), so
these hashes are stable across sessions at the pinned test config
(local[4], shuffle=4 — conftest.py).

Regenerate after an INTENTIONAL semantics change with:
  python tests/test_rows_only_golden.py   (prints fresh goldens)
"""

from __future__ import annotations

import hashlib

import pytest

from dsacord_spark.plans.catalog import queries

# name -> (n_rows, sha256, two sample canonical lines for debuggability)
GOLDEN = {
    # multimodal_{decode,audio,video}_meta left this table in r7: their
    # catalog entries now carry FULL structural value oracles over the
    # header-scalar contract, and the pixel/PCM/luma byte-level signal
    # moved to tests/test_multimodal.py::test_decode_feature_goldens
    # multimodal_frame_sample / multimodal_resize left this table in r7:
    # their catalog entries now carry FULL structural value oracles over
    # the scalar contract, and the byte-level md5 signal moved to
    # tests/test_multimodal.py::test_frame_and_resize_byte_goldens
    "text_compression_ratio": (
        5,
        "99e9bc58385924b6d408ff9a348e70c16c8f264ab1cac2152efad96e95c1216a",
        "'de'|0.538813|0.406615|71",
    ),
    # stream_approx_distinct_hll / agg_approx_distinct /
    # agg_approx_percentiles left this table in r8: their catalog
    # entries now carry structural value oracles (exact value +
    # error-contract boolean), and the raw sketch estimates are pinned
    # directly in tests/test_catalog_oracle.py and test_streaming.py
    # (ann_ivf_topk_blas gained the full ann_ivf_topk SQL oracle and
    # ann_ivf_kmeans_topk a rank-grid/brute-ceiling structural oracle
    # in the same round)
    # every planted perturbed twin recovered (twin ids are negative:
    # -(media_id+1), collision-free at any corpus size), zero
    # false-positive pairs; the in-window edits land some twins at
    # hamming 1, exercising the within-radius path
    "multimodal_phash_dedup": (
        17,
        "dd2c43de40425f510452c270c7329b72a3e9c51f00bbbdc2633e7fba10556591",
        "0|-151|150",
    ),
    # every planted one-sample-edit twin recovered (3 at hamming 1),
    # zero false positives among the unrelated audio clips
    "multimodal_audio_fingerprint_dedup": (
        17,
        "c7008c5febdc5a1cec0ad3cee891acf32f51e28ec4b19b1a00013a7f8e1537b7",
        "0|-122|121",
    ),
    # every planted one-pixel-edit twin recovered (1 at hamming 1),
    # zero false positives among the unrelated video clips
    "multimodal_video_fingerprint_dedup": (
        17,
        "9ea107d242806ed68735dfd494e3697dcac71452204a340a0c195c0c001464e5",
        "0|-123|122",
    ),
}


def _cell(v):
    if isinstance(v, float):
        return f"{v:.6f}"
    if isinstance(v, (bytes, bytearray)):
        return hashlib.md5(bytes(v)).hexdigest()
    if isinstance(v, list):
        return "[" + ",".join(_cell(x) for x in v) + "]"
    return repr(v)


def canonical_lines(df) -> list[str]:
    cols = sorted(df.columns)
    rows = df.select(*cols).collect()
    return sorted("|".join(_cell(v) for v in r) for r in rows)


@pytest.mark.parametrize("name", sorted(GOLDEN))
def test_rows_only_entry_matches_golden(spark, sf_dir, name):
    n_exp, sha_exp, first_line = GOLDEN[name]
    lines = canonical_lines(queries()[name](spark, sf_dir))
    assert len(lines) == n_exp, f"{name}: {len(lines)} rows, expected {n_exp}"
    assert lines[0] == first_line or any(
        ln == first_line for ln in lines[:3]
    ), f"{name}: sample line drifted: {lines[0]!r}"
    sha = hashlib.sha256("\n".join(lines).encode()).hexdigest()
    assert sha == sha_exp, (
        f"{name}: canonical sha drifted ({sha[:12]} != {sha_exp[:12]}); "
        "if the semantics change was intentional, regenerate with "
        "`python tests/test_rows_only_golden.py`"
    )


if __name__ == "__main__":  # golden regeneration helper
    import json

    from dsacord_spark.session import get_spark

    s = get_spark(app_name="golden-regen", master="local[4]",
                  shuffle_partitions=4,
                  extra_conf={"spark.driver.memory": "4g"})
    q = queries()
    fresh = {}
    for nm in sorted(GOLDEN):
        ls = canonical_lines(q[nm](s, "/root/testdata/sf0.001"))
        sha = hashlib.sha256("\n".join(ls).encode()).hexdigest()
        fresh[nm] = (len(ls), sha, ls[0])
    print(json.dumps(fresh, indent=1))
