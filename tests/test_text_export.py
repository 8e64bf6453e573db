"""JSONL/CSV export sinks: round-trip fidelity, shard sizing, and
partition layout."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from dsacord_spark.sinks.text_export import export_csv, export_jsonl, read_jsonl


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_jsonl_round_trip_and_sharding(spark, sf_dir, tmp_path):
    d = _docs(spark, sf_dir).repartition(2)
    out = str(tmp_path / "jsonl")
    export_jsonl(d, out, max_records_per_file=100)
    files = glob.glob(f"{out}/*.json")
    # 500 docs / 2 partitions / 100-record cap -> >= 5 shards, none over cap
    assert len(files) >= 5
    back = read_jsonl(spark, out, schema=d.schema)
    assert back.count() == d.count()
    assert back.schema == d.schema
    # value fidelity on a text column that contains spaces
    a = {r["doc_id"]: r["text"] for r in d.collect()}
    b = {r["doc_id"]: r["text"] for r in back.collect()}
    assert a == b


def test_jsonl_partitioned_layout_prunes(spark, sf_dir, tmp_path):
    d = _docs(spark, sf_dir)
    out = str(tmp_path / "bylang")
    export_jsonl(d, out, partition_cols=["lang"])
    langs = {r["lang"] for r in d.select("lang").distinct().collect()}
    dirs = {p.rsplit("lang=", 1)[1] for p in glob.glob(f"{out}/lang=*")}
    assert dirs == langs
    one = spark.read.schema(
        "doc_id long, text string, source string, n_chars long"
    ).json(f"{out}/lang={sorted(langs)[0]}")
    expect = d.filter(F.col("lang") == sorted(langs)[0]).count()
    assert one.count() == expect


def test_csv_round_trip_with_quoting(spark, tmp_path):
    rows = [
        (1, 'plain text'),
        (2, 'comma, inside'),
        (3, 'quote " inside'),
        (4, 'newline\ninside'),
    ]
    d = spark.createDataFrame(rows, "id long, text string")
    out = str(tmp_path / "csv")
    export_csv(d, out)
    back = (
        spark.read.schema("id long, text string")
        .option("header", "true")
        .option("escape", '"')
        .option("multiLine", "true")
        .csv(out)
    )
    assert {(r["id"], r["text"]) for r in back.collect()} == set(rows)
