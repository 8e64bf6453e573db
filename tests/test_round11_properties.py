"""Round-11 pins for the r10 ADVICE fixes: the Hamming probe's
pre-aggregate self-exclusion (cross-hash evidence survives), the
rebuild path dropping a stale uuid index, the heal append honoring the
existing index's bucket spec, compact_bucketed_table's rename-aside
swap, and the streaming probes' refresh-policy validation + batch-id
keyed snapshot generations."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.test_round9_properties import (
    HAMMING_SUFFIXES,
    MINHASH_SUFFIXES,
    _drop_index_tables,
)


def test_probe_exclude_self_keeps_cross_hash_evidence(spark):
    """r10 ADVICE: a batch doc that is its own best (MIN-id) match at
    Hamming 0 but ALSO matches a genuine different-hash stranger within
    radius must report the stranger — the r10 post-filter cleared the
    whole row. Construct: doc 5 in the index under its own hash (own id
    IS the hash's min member), index doc 7 two bits away."""
    from dsacord_spark.operators.dedup import (
        build_hamming_index,
        incremental_hamming_matches,
        probe_hamming_index,
    )

    h5 = 0b1111000011110000
    h7 = h5 ^ 0b11  # hamming 2 from h5
    index = spark.createDataFrame(
        [(5, h5), (7, h7)], "doc long, simhash long"
    )
    batch = spark.createDataFrame([(5, h5)], "doc long, simhash long")
    t = "t_r11_xh"
    try:
        build_hamming_index(index, "doc", "simhash", t,
                            n_bands=4, hash_bits=16, buckets=2)
        for name, out in (
            ("idx", probe_hamming_index(
                spark, t, batch, "doc", "simhash", radius=3,
                exclude_self=True)),
            ("mem", incremental_hamming_matches(
                index, batch, "doc", "simhash", n_bands=4, radius=3,
                hash_bits=16, exclude_self=True)),
        ):
            row = out.collect()[0]
            assert row["is_dup"] is True, (name, row)
            assert row["match_id"] == 7, (name, row)
            assert row["best_hamming"] == 2, (name, row)
        # and with a SMALLER-id stranger the reported match is still the
        # stranger, not the self pair
        index2 = spark.createDataFrame(
            [(5, h5), (3, h7)], "doc long, simhash long"
        )
        build_hamming_index(index2, "doc", "simhash", t,
                            n_bands=4, hash_bits=16, buckets=2)
        row = probe_hamming_index(
            spark, t, batch, "doc", "simhash", radius=3, exclude_self=True
        ).collect()[0]
        assert (row["is_dup"], row["match_id"], row["best_hamming"]) == (
            True, 3, 2)
    finally:
        spark.catalog.clearCache()
        _drop_index_tables(spark, t, HAMMING_SUFFIXES)


def test_rebuild_drops_stale_uuid_index(spark, tmp_path):
    """r10 ADVICE (medium): a full rebuild overwrites the decisions lake
    — a uuid index built from the PREVIOUS lake would retain phantom
    keys and silently anti-join valid new rows away on the next daily
    append. The rebuild must drop the index; the next append's bootstrap
    rebuilds it from the new lake."""
    from dsacord_spark.sinks.parquet import (
        append_new_decisions,
        describe_bucket_spec,
    )

    out = str(tmp_path / "decisions")
    idx = "t_r11_uuididx"

    def _mk(uuids):
        return spark.createDataFrame(
            [(u, "2024-03-0%d 10:00:00" % (i + 1)) for i, u in
             enumerate(uuids)],
            "uuid string, created_at string",
        ).withColumn("created_at", F.to_timestamp("created_at"))

    try:
        # day 1: append u1/u2 through the indexed path (bootstraps idx)
        append_new_decisions(spark, _mk(["u1", "u2"]), out,
                             uuid_index_table=idx)
        assert sorted(
            r[0] for r in spark.table(idx).collect()) == ["u1", "u2"]
        # rebuild shrinks the lake to u1 only (e.g. changed quarantine
        # rules). Simulate pipeline.run_backfill's rebuild sink: static
        # overwrite + the r11 index drop.
        _mk(["u1"]).withColumn(
            "dt", F.date_format("created_at", "yyyy-MM-dd")
        ).write.partitionBy("dt").mode("overwrite").parquet(out)
        spark.sql(f"DROP TABLE IF EXISTS {idx}")
        # next daily append carries u2 again — it must LAND (the stale
        # index would have anti-joined it away)
        append_new_decisions(spark, _mk(["u2"]), out,
                             uuid_index_table=idx)
        lake_uuids = sorted(
            r[0] for r in spark.read.parquet(out).select("uuid").collect()
        )
        assert lake_uuids == ["u1", "u2"], lake_uuids
        # the bootstrap rebuilt the index from the new lake
        assert sorted(
            r[0] for r in spark.table(idx).collect()) == ["u1", "u2"]
        # and the heal append honors the EXISTING table's bucket count
        # even when the caller restates a different one (r10 ADVICE)
        n0 = describe_bucket_spec(spark, idx)["n_buckets"]
        append_new_decisions(spark, _mk(["u3"]), out,
                             uuid_index_table=idx,
                             uuid_index_buckets=n0 + 7)
        assert describe_bucket_spec(spark, idx)["n_buckets"] == n0
        assert sorted(r[0] for r in spark.table(idx).collect()) == [
            "u1", "u2", "u3"]
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {idx}")


def test_run_backfill_rebuild_heals_shrunken_lake_index(spark, tmp_path):
    """Pipeline-level wiring of the rebuild-drops-index contract, end to
    end through run_backfill: ingest two days with a uuid index, remove
    one day's staged ZIP, rebuild (the lake shrinks), then re-ingest the
    removed day — its row must LAND. Before r11 the rebuild kept the
    stale index, whose phantom key silently anti-joined the replayed row
    away (permanent row loss — the r10 ADVICE medium)."""
    import os
    import shutil
    from datetime import date

    from dsacord_spark.config import Config
    from dsacord_spark.pipeline import run_backfill
    from tests.test_pipeline import _Resp, _day_zip_at

    landing = str(tmp_path / "landing")
    idx = "t_r11_plidx"

    def opener(url):
        for dt in ("2025-01-01", "2025-01-02"):
            if dt in url:
                return _Resp(_day_zip_at(f"row-{dt}", f"{dt} 00:00:00"))
        raise AssertionError(f"unexpected url {url}")

    def cfg(d_from, d_to):
        return Config(date_from=d_from, date_to=d_to,
                      landing_dir=landing, uuid_index_table=idx)

    try:
        m = run_backfill(
            spark, cfg(date(2025, 1, 1), date(2025, 1, 2)), opener=opener
        )
        assert m.rows_written == 2
        assert spark.catalog.tableExists(idx)
        # day 2's dump disappears (e.g. upstream retraction); rebuild
        staged = [f for f in os.listdir(landing)
                  if "2025-01-02" in f and f != "decisions"]
        assert staged, os.listdir(landing)
        for f in staged:
            p = os.path.join(landing, f)
            shutil.rmtree(p) if os.path.isdir(p) else os.remove(p)
        m = run_backfill(
            spark, cfg(date(2025, 1, 1), date(2025, 1, 1)),
            opener=opener, rebuild=True,
        )
        assert m.rows_written == 1  # the shrunken lake
        assert not spark.catalog.tableExists(idx)  # index dropped
        # day 2 returns as a NEW daily run: its row must land again
        m = run_backfill(
            spark, cfg(date(2025, 1, 2), date(2025, 1, 2)), opener=opener
        )
        assert m.rows_written == 1, (
            "stale uuid index anti-joined the replayed day away"
        )
        lake = spark.read.parquet(landing + "/decisions")
        assert sorted(r[0] for r in lake.select("uuid").collect()) == [
            "row-2025-01-01", "row-2025-01-02"]
        # and the bootstrap rebuilt the index from the new lake
        assert sorted(r[0] for r in spark.table(idx).collect()) == [
            "row-2025-01-01", "row-2025-01-02"]
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {idx}")


def test_compact_bucketed_table_swaps_rename_aside(spark):
    """r10 ADVICE: the swap must never pass through a dropped-table
    state with the data only in __compact. Pin the observable contract:
    compaction works, preserves contents/spec, and leaves no __old or
    __compact residue."""
    from dsacord_spark.sinks.parquet import (
        compact_bucketed_table,
        describe_bucket_spec,
    )

    t = "t_r11_compact"
    try:
        for i in range(3):  # three appends -> multi-file buckets
            (
                spark.range(i * 10, i * 10 + 10)
                .withColumn("k", F.col("id") % 4)
                .write.format("parquet").mode(
                    "overwrite" if i == 0 else "append")
                .bucketBy(4, "k").sortBy("k")
                .saveAsTable(t)
            )
        before = sorted(map(tuple, spark.table(t).collect()))
        spec0 = describe_bucket_spec(spark, t)
        stats = compact_bucketed_table(spark, t)
        assert stats["files_after"] <= stats["n_buckets"]
        assert sorted(map(tuple, spark.table(t).collect())) == before
        assert describe_bucket_spec(spark, t) == spec0
        assert not spark.catalog.tableExists(f"{t}__old")
        assert not spark.catalog.tableExists(f"{t}__compact")
    finally:
        for s in ("", "__old", "__compact"):
            spark.sql(f"DROP TABLE IF EXISTS {t}{s}")


def test_in_literals_matches_isin(spark):
    """The r11 fast literal-IN (one parsed SQL expression instead of a
    per-literal py4j crossing) must be value-identical to Column.isin
    on the int fast path, fall back for non-ints, and reject everything
    on an empty list (SQL's IN () is a parse error, not false)."""
    from dsacord_spark.operators.dedup import _in_literals

    df = spark.range(1000).withColumn("k", F.col("id") * 3 - 500)
    vals = [-500, -2, 0, 1, 997, 998, 10**12, -(10**12)]
    got = sorted(r[0] for r in df.filter(_in_literals("k", vals)).collect())
    want = sorted(
        r[0] for r in df.filter(F.col("k").isin(vals)).collect())
    assert got == want and got  # non-trivial match set
    assert df.filter(_in_literals("k", [])).count() == 0
    sdf = df.withColumn("s", F.col("id").cast("string"))
    got_s = sorted(
        r["s"] for r in sdf.filter(_in_literals("s", ["7", "9"])).collect())
    assert got_s == ["7", "9"]  # non-int fallback path


def test_compact_index_interleaves_with_stream_probe(spark):
    """r10 verdict item 4: compacting an index UNDER a live snapshot
    stream. The safe pattern — compact from the stream's own
    on_batch_start hook (a batch boundary) — must succeed mid-stream,
    and the stream must stay CORRECT across the following snapshot
    refresh boundary (which re-reads the now-compacted tables). A
    compaction attempted while a mid-batch lease is held must refuse."""
    from dsacord_spark import leases
    from dsacord_spark.operators.dedup import (
        SIMHASH_BITS, build_hamming_index, compact_index,
        probe_hamming_index, simhash_signatures,
    )
    from dsacord_spark.streaming.pipeline import stream_probe_hamming_index

    docs = spark.createDataFrame(
        [(i, f"document number {i} with mostly shared boilerplate text "
              f"and a unique token tok{i}") for i in range(16)],
        "doc_id long, text string",
    )
    t = "t_r11_ilv"
    try:
        sig = simhash_signatures(docs, "doc_id", "text")
        build_hamming_index(sig, "doc", "simhash", t,
                            n_bands=4, hash_bits=SIMHASH_BITS, buckets=4)
        # append a second generation so buckets span >1 file and the
        # compaction has real work
        from dsacord_spark.curate import update_corpus_index

        update_corpus_index(
            spark.createDataFrame(
                [(100 + i, f"later appended doc {i} carrying token "
                           f"late{i}") for i in range(4)],
                "doc_id long, text string",
            ), "simhash", t,
        )
        # refusal: a held mid-batch lease blocks compaction
        with leases.stream_lease(t):
            with pytest.raises(RuntimeError, match="refused"):
                compact_index(spark, t)
            compact_index(spark, t, force=True)  # override works
        assert leases.blocking_leases(t) == 0  # lease released

        batch = sig.repartition(4)  # 4 staged files -> 4 micro-batches
        compacted = {}

        def hook(i: int) -> None:
            if i == 1:
                # mid-stream, at a boundary: must succeed (the lease is
                # marked non-blocking inside the hook window)
                compacted.update(compact_index(spark, t))

        streamed = stream_probe_hamming_index(
            spark, t, batch, "doc", "simhash",
            refresh_every_n_batches=2, on_batch_start=hook,
        )
        got = sorted(map(tuple, streamed.collect()))
        assert compacted, "hook never compacted — batch 1 did not run"
        for s, st in compacted.items():
            assert st["files_after"] <= st["n_buckets"], (s, st)
        # correctness across the refresh boundary (batch 2 re-reads the
        # compacted tables): equals the batch probe over the same frame
        want = sorted(map(tuple, probe_hamming_index(
            spark, t, batch, "doc", "simhash").collect()))
        assert got == want
        assert leases.blocking_leases(t) == 0
    finally:
        spark.catalog.clearCache()
        _drop_index_tables(spark, t, HAMMING_SUFFIXES)


def test_stream_probe_refresh_policy_validation(spark):
    """r10 ADVICE: refresh_every_n_batches=0 used to reach the modulo
    and die with ZeroDivisionError inside the first micro-batch; the
    N >= 1 contract is now validated up front, before any stream
    machinery spins up."""
    from dsacord_spark.operators.dedup import (
        SIMHASH_BITS, build_hamming_index, build_minhash_index,
        simhash_signatures,
    )
    from dsacord_spark.streaming.pipeline import (
        stream_probe_hamming_index,
        stream_probe_minhash_index,
    )

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta")],
        "doc_id long, text string",
    )
    tmh, tham = "t_r11_smh", "t_r11_sham"
    try:
        build_minhash_index(docs, "doc_id", "text", tmh, buckets=2)
        sig = simhash_signatures(docs, "doc_id", "text")
        build_hamming_index(sig, "doc", "simhash", tham,
                            n_bands=4, hash_bits=SIMHASH_BITS, buckets=2)
        for bad in (0, -3):
            with pytest.raises(ValueError, match=">= 1"):
                stream_probe_hamming_index(
                    spark, tham, sig, "doc", "simhash",
                    refresh_every_n_batches=bad)
            with pytest.raises(ValueError, match=">= 1"):
                stream_probe_minhash_index(
                    spark, tmh, docs, "doc_id", "text",
                    refresh_every_n_batches=bad)
    finally:
        spark.catalog.clearCache()
        _drop_index_tables(spark, tmh, MINHASH_SUFFIXES)
        _drop_index_tables(spark, tham, HAMMING_SUFFIXES)


def test_in_literals_isin_parity_property(spark):
    """Hypothesis pin for the fast literal-IN: for ANY list of int64
    values (boundaries included), the parsed-SQL form selects exactly
    the rows Column.isin selects. One shared frame, many filter pairs —
    the property is pure plan semantics, so examples stay cheap."""
    from hypothesis import given, settings, strategies as st

    from dsacord_spark.operators.dedup import _in_literals

    i64 = st.integers(min_value=-(2 ** 63), max_value=2 ** 63 - 1)
    df = spark.createDataFrame(
        [(v,) for v in (-(2 ** 63), -1, 0, 1, 7, 63, 2 ** 62,
                        2 ** 63 - 1)],
        "k long",
    ).cache()
    df.count()

    @settings(max_examples=25, deadline=None)
    @given(st.lists(i64 | st.sampled_from(
        [-(2 ** 63), 2 ** 63 - 1, 0, 7]), max_size=12))
    def check(vals):
        got = sorted(
            r[0] for r in df.filter(_in_literals("k", vals)).collect())
        want = sorted(
            r[0] for r in df.filter(
                F.col("k").isin(vals) if vals else F.lit(False)
            ).collect())
        assert got == want, (vals, got, want)

    try:
        check()
    finally:
        df.unpersist()


def test_stream_probe_empty_batch_returns_empty_frame(spark):
    """r11 review: a bounded stream that drains ZERO micro-batches (an
    empty staged batch writes no data files) reaches run_bounded_stream's
    fallback, which must honor the 2-arg batch_transform contract — it
    used to call the probe with one arg and die with TypeError instead
    of returning an empty, correctly-shaped result."""
    from dsacord_spark.operators.dedup import (
        SIMHASH_BITS, build_hamming_index, simhash_signatures,
    )
    from dsacord_spark.streaming.pipeline import stream_probe_hamming_index

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta")],
        "doc_id long, text string",
    )
    t = "t_r11_empty"
    try:
        sig = simhash_signatures(docs, "doc_id", "text")
        build_hamming_index(sig, "doc", "simhash", t,
                            n_bands=4, hash_bits=SIMHASH_BITS, buckets=2)
        empty = sig.filter(F.lit(False))
        out = stream_probe_hamming_index(spark, t, empty, "doc", "simhash")
        assert out.count() == 0
        assert out.columns == ["doc", "is_dup", "match_id", "best_hamming"]
        # and with the snapshot policy set (the pass_batch_id path)
        out2 = stream_probe_hamming_index(
            spark, t, empty, "doc", "simhash", refresh_every_n_batches=2)
        assert out2.count() == 0
    finally:
        spark.catalog.clearCache()
        _drop_index_tables(spark, t, HAMMING_SUFFIXES)
