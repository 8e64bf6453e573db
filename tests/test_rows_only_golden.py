"""Golden-value gates for the hash-kernel result frames the DuckDB
oracle cannot value-check (VERDICT r2 #5).

Since r9 every CATALOG entry carries a full or structural value oracle —
the last rows-only entries (compression ratio, the three fingerprint
dedups) were converted to structural contracts (r8 verdict asks #4/#5).
What the structural twins cannot check is the HASH-VALUED part of those
results: the zlib mean/min ratios and the pairwise hamming distances.
THIS file pins those raw frames — the un-projected helpers the
registered entries derive from — as canonical sha256 goldens (columns
sorted by name, rows sorted, floats at 6dp, binary cells md5'd), exactly
the strength of the old rows-only value pins. The inputs are
deterministic (media bytes are synthesized per-doc from content hashes),
so these hashes are stable across sessions at the pinned test config
(local[4], shuffle=4 — conftest.py).

Regenerate after an INTENTIONAL semantics change with:
  python tests/test_rows_only_golden.py   (prints fresh goldens)
"""

from __future__ import annotations

import hashlib

import pytest


def _compression_stats(spark, sf_dir):
    from dsacord_spark.plans.curation import text_compression_ratio_stats

    return text_compression_ratio_stats(spark, sf_dir)


def _pairs(modality):
    def get(spark, sf_dir):
        from dsacord_spark.plans.advanced import _fingerprint_pair_frame

        return _fingerprint_pair_frame(spark, sf_dir, modality)

    return get


# name -> (getter, n_rows, sha256, a sample canonical line). The shas
# are UNCHANGED from the pre-r9 entry goldens: the helpers return the
# exact frames the entries used to return; only the registered
# projection changed (structural columns for the DuckDB twin).
GOLDEN = {
    # multimodal_{decode,audio,video}_meta left this table in r7,
    # frame_sample/resize in r7, the approx sketches in r8 — all now
    # carry structural value oracles; byte-level signal lives in
    # tests/test_multimodal.py goldens.
    "text_compression_ratio_stats": (
        _compression_stats,
        5,
        "99e9bc58385924b6d408ff9a348e70c16c8f264ab1cac2152efad96e95c1216a",
        "'de'|0.538813|0.406615|71",
    ),
    # every planted perturbed twin recovered (twin ids are negative:
    # -(media_id+1), collision-free at any corpus size), zero
    # false-positive pairs; the in-window edits land some twins at
    # hamming 1, exercising the within-radius path
    "multimodal_phash_pairs": (
        _pairs("image"),
        17,
        "dd2c43de40425f510452c270c7329b72a3e9c51f00bbbdc2633e7fba10556591",
        "0|-151|150",
    ),
    # every planted one-sample-edit twin recovered (3 at hamming 1),
    # zero false positives among the unrelated audio clips
    "multimodal_audio_fingerprint_pairs": (
        _pairs("audio"),
        17,
        "c7008c5febdc5a1cec0ad3cee891acf32f51e28ec4b19b1a00013a7f8e1537b7",
        "0|-122|121",
    ),
    # every planted one-pixel-edit twin recovered (1 at hamming 1),
    # zero false positives among the unrelated video clips
    "multimodal_video_fingerprint_pairs": (
        _pairs("video"),
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
    getter, n_exp, sha_exp, first_line = GOLDEN[name]
    lines = canonical_lines(getter(spark, sf_dir))
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
    fresh = {}
    for nm in sorted(GOLDEN):
        ls = canonical_lines(GOLDEN[nm][0](s, "/root/testdata/sf0.001"))
        sha = hashlib.sha256("\n".join(ls).encode()).hexdigest()
        fresh[nm] = (len(ls), sha, ls[0])
    print(json.dumps(fresh, indent=1))
