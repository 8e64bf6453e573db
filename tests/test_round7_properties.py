"""Round-7 property pins: cluster-mode fingerprint dedup output is O(n)
(never the C(K,2) member-pair list), its labels equal the pair-path
components, the minhash bucket cap keeps its map-side plan shape, and
the banded bucket-load histogram predicts the joiner's own band split."""

from __future__ import annotations

import random
import re

from pyspark.sql import functions as F

from dsacord_spark.operators.dedup import (
    banded_bucket_load,
    banded_hamming_pairs,
    hash_cluster_assignments,
    minhash_lsh_pairs,
)


def _to_df(spark, hashes: dict[int, int]):
    signed = {
        k: v - (1 << 64) if v >= (1 << 63) else v for k, v in hashes.items()
    }
    return spark.createDataFrame(
        [(k, v) for k, v in signed.items()], "media_id long, h long"
    )


def test_cluster_assignments_linear_in_identical_cluster(spark):
    """THE r6-verdict stress property: a 1,000-member byte-identical
    cluster yields exactly 1,000 assignment rows (one per member, all
    labeled by the min member id) — the pair list for the same input is
    1000*999/2 rows. Near-dup (hamming 1) items merge clusters;
    singletons label themselves."""
    hashes = {i: 0x5EED_5EED_5EED_5EED for i in range(1000)}
    hashes[2000] = 0x17
    hashes[2001] = 0x17 ^ (1 << 5)  # hamming 1 from 2000
    hashes[3000] = 0x9E3779B97F4A7C15  # unrelated singleton
    df = _to_df(spark, hashes).persist()
    out = hash_cluster_assignments(df, "media_id", "h", 4, 3, 64).collect()
    assert len(out) == len(hashes)  # O(n), never O(pairs)
    got = {r["media_id"]: (r["cluster_id"], r["canonical_id"]) for r in out}
    assert all(got[i] == (0, 0) for i in range(1000))
    assert got[2000] == (2000, 2000) and got[2001] == (2000, 2000)
    assert got[3000] == (3000, 3000)
    df.unpersist()


def test_cluster_assignments_equal_pair_path_components(spark):
    """Equivalence on a seeded corpus with planted 0/1/3-bit twins: the
    cluster labeling must be exactly the connected components of the
    banded_hamming_pairs output (computed here with an independent
    Python union-find over the brute-force pair set), with every input
    id present — the two public surfaces of one dedup semantics."""
    rng = random.Random(0xD5AC1)
    hashes = {i: rng.getrandbits(64) for i in range(1, 41)}
    hashes[101] = hashes[1]
    hashes[102] = hashes[2] ^ (1 << 7)
    hashes[103] = hashes[3] ^ (1 << 0) ^ (1 << 21) ^ (1 << 63)
    hashes[104] = hashes[4] ^ 0b1111  # 4 bits: outside radius 3
    df = _to_df(spark, hashes).persist()

    parent = {k: k for k in hashes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    ids = sorted(hashes)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            if bin(hashes[a] ^ hashes[b]).count("1") <= 3:
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[ra] = rb
    comp_min: dict = {}
    for k in hashes:
        r = find(k)
        comp_min[r] = min(comp_min.get(r, k), k)
    expected = {k: comp_min[find(k)] for k in hashes}

    out = hash_cluster_assignments(df, "media_id", "h", 4, 3, 64).collect()
    got = {r["media_id"]: r["cluster_id"] for r in out}
    assert got == expected
    assert all(r["canonical_id"] == r["cluster_id"] for r in out)
    # cross-check the pair surface covers the same non-singleton sets
    pairs = banded_hamming_pairs(df, "media_id", "h", 4, 3).collect()
    linked = {p["media_id_a"] for p in pairs} | {p["media_id_b"] for p in pairs}
    singles = {k for k, v in expected.items() if sum(
        1 for x in expected.values() if x == v) == 1}
    assert linked == set(hashes) - singles
    df.unpersist()


def test_minhash_bucket_cap_bounds_and_plan(spark):
    """The minhash band-bucket admission cap: 200 docs sharing one
    boilerplate text land in one (band, hash) bucket per band; with
    bucket_cap=10 the candidate join sees at most C(10,2) pairs per
    band. The cap must compile to a map-side PARTIAL WindowGroupLimit —
    the mode tied to the NODE (a Final-only regression with 'Partial'
    elsewhere in the plan must fail, ADVICE r6). Capped output is a
    subset of the uncapped exact result."""
    docs = spark.range(200).select(
        F.col("id").alias("doc_id"),
        F.lit("the same boilerplate sentence repeated for every doc in "
              "this hot bucket fixture").alias("text"),
    )
    capped_df = minhash_lsh_pairs(
        docs, "doc_id", "text", n=3, n_perm=32, bands=8, threshold=0.5,
        bucket_cap=10,
    )
    plan = capped_df._jdf.queryExecution().executedPlan().toString()
    assert re.search(r"WindowGroupLimit.*Partial", plan), (
        "minhash bucket-cap admission lost its map-side partial limit"
    )
    capped = {(r["doc_a"], r["doc_b"]) for r in capped_df.collect()}
    # every admitted candidate still verifies at jaccard 1.0 (identical
    # docs); the cap bounds the candidate count, 10 admitted per bucket
    # across 8 identical-value bands -> exactly C(10,2) surviving pairs
    assert len(capped) == 10 * 9 // 2
    uncapped = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_lsh_pairs(
            docs, "doc_id", "text", n=3, n_perm=32, bands=8, threshold=0.5
        ).collect()
    }
    assert capped <= uncapped and len(uncapped) == 200 * 199 // 2


def test_banded_bucket_load_predicts_join_input(spark):
    """The histogram must agree with a hand count over the SAME band
    split the joiner uses (4 x 16-bit slices of the signed hash), and
    its cand_pairs must sum to the uncapped banded join's per-band
    candidate expansion."""
    rng = random.Random(0xB10C)
    hashes = {i: rng.getrandbits(64) for i in range(60)}
    for i in range(60, 90):
        hashes[i] = hashes[0]  # one hot hash (still ONE distinct value)
    df = _to_df(spark, hashes)
    uniq = df.select(F.col("h").alias("_h")).distinct()
    rows = banded_bucket_load(uniq, "_h", 4, 64).collect()

    from collections import Counter

    distinct = {v - (1 << 64) if v >= (1 << 63) else v
                for v in hashes.values()}
    expect = Counter()
    for band in range(4):
        sizes = Counter(
            ((h >> (16 * band)) & 0xFFFF) if h >= 0
            else (((h + (1 << 64)) >> (16 * band)) & 0xFFFF)
            for h in distinct
        )
        for sz in sizes.values():
            expect[(band, sz)] += 1
    got = {(r["band_no"], r["bucket_size"]): (
        r["n_buckets"], r["n_hashes"], r["cand_pairs"]) for r in rows}
    assert set(got) == set(expect)
    for (band, sz), n_buckets in expect.items():
        nb, nh, cp = got[(band, sz)]
        assert nb == n_buckets
        assert nh == sz * n_buckets
        assert cp == float(n_buckets * sz * (sz - 1) // 2)
