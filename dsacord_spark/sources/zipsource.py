"""S3/S4 — ZIP and nested-ZIP extraction as a distributed source
(/root/reference/utils.go:50-86, 121-148).

The reference fans out one goroutine per ZIP entry and materializes every
archive fully in memory (quirk Q7, README warns about it). Spark-first
design instead:

- `spark.read.format("binaryFile")` lists the staged ZIPs; Spark assigns
  whole files to tasks (a ZIP is not splittable), so across-file
  parallelism replaces the reference's worker pool.
- a `mapInArrow` generator walks each archive with Python `zipfile`,
  recursing one level into nested `.zip` entries exactly like
  readFileAndExtractDecisions (utils.go:130-140), and yields CSV bytes
  per inner file — streaming per entry, never holding the whole expansion
  (Q7 divergence: we keep only one entry's bytes at a time).
- CSV parsing happens in the same pass, Arrow-native: pyarrow's CSV
  reader emits record batches straight to the JVM (S5 semantics: ragged
  rows tolerated, missing columns -> '', utils.go:161,167-191, via
  pandas/row-parser fallback tiers), with the 36 wire columns as
  strings. Typed decoding stays in Spark columns (transform.py) so F1-F5
  remain Catalyst expressions.

At 100 TB: binaryFile scan over dt=YYYY-MM-DD partitions gives partition
pruning by date; maxFilesPerTrigger bounds a streaming backfill; one task
per daily ZIP matches the reference's unit of work (main.go:146-154).
"""

from __future__ import annotations

import csv
import io
import shutil
import tempfile
import zipfile
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dsacord_spark.schema import CSV_COLUMNS

# wire schema for the extraction output: all strings + provenance
EXTRACT_SCHEMA = (
    ", ".join(f"{c} string" for c in CSV_COLUMNS) + ", _source_file string"
)


# inner archives up to this size stay in memory; larger ones spill to a
# task-local temp file (quirk Q7: the reference materializes every nested
# archive fully in RAM, utils.go:131 — the README warns about it)
INNER_SPOOL_BYTES = 64 << 20


def _iter_csv_members(data: bytes, name: str) -> Iterator[tuple[str, bytes]]:
    """Yield (member_name, csv_bytes) from a ZIP, recursing one level into
    nested .zip entries (utils.go:130-140). The nested archive is streamed
    through a SpooledTemporaryFile instead of zf.read()'s full in-memory
    copy, so an oversized inner zip spills to task-local disk rather than
    holding executor memory (Q7 divergence; ZipFile only needs a seekable
    file, which the spool provides in both its memory and disk states)."""
    with zipfile.ZipFile(io.BytesIO(data)) as zf:
        for info in zf.infolist():
            if info.is_dir():
                continue
            if info.filename.lower().endswith(".zip"):
                with tempfile.SpooledTemporaryFile(
                    max_size=INNER_SPOOL_BYTES
                ) as spool:
                    with zf.open(info) as src:
                        shutil.copyfileobj(src, spool, 1 << 20)
                    spool.seek(0)
                    with zipfile.ZipFile(spool) as izf:
                        for iinfo in izf.infolist():
                            if iinfo.is_dir() or iinfo.filename.lower().endswith(".zip"):
                                continue  # reference recurses exactly one level
                            yield (
                                f"{name}!{info.filename}!{iinfo.filename}",
                                izf.read(iinfo),
                            )
            else:
                yield f"{name}!{info.filename}", zf.read(info)


def _parse_csv_rows(raw: bytes, source: str) -> Iterator[dict]:
    """Row-at-a-time fallback parse for ragged files (utils.go:159-191
    semantics: FieldsPerRecord=-1 — rows longer than the header are legal):
    missing column or short row -> '' exactly like the reference's get
    closure (utils.go:185-191); extra columns ignored."""
    text = raw.decode("utf-8", errors="replace")
    reader = csv.reader(io.StringIO(text))
    try:
        header = next(reader)
    except StopIteration:
        return
    index = {name: i for i, name in enumerate(header)}
    for rec in reader:
        row = {}
        for col in CSV_COLUMNS:
            i = index.get(col)
            row[col] = rec[i] if i is not None and i < len(rec) else ""
        row["_source_file"] = source
        yield row


def _parse_csv_frame(raw: bytes, source: str) -> pd.DataFrame:
    """Vectorized header-mapped parse, three tiers by speed: pyarrow's
    multithreaded CSV reader (measured 1.5x pandas' C engine on the wire
    shape: 173ms vs 260ms per 50k-row member, identical output), then
    pandas' C engine, then the row-at-a-time parser. The faster tiers
    reject ragged rows (wider than the header), which the reference
    tolerates (FieldsPerRecord=-1, utils.go:161), so each parse error
    falls through to the next tier. Semantics match the get-closure
    (utils.go:185-191) exactly: present-but-empty cell, short row, and
    absent column all -> ''; extra columns ignored."""
    import pyarrow as pa
    from pyarrow import csv as pa_csv

    try:
        t = pa_csv.read_csv(
            io.BytesIO(raw),
            convert_options=pa_csv.ConvertOptions(
                column_types={c: pa.string() for c in CSV_COLUMNS}
            ),
            parse_options=pa_csv.ParseOptions(newlines_in_values=True),
        )
        pdf = t.to_pandas()
    except pa.ArrowException:
        try:
            pdf = pd.read_csv(
                io.BytesIO(raw),
                dtype=str,
                keep_default_na=False,
                na_values=[],
                encoding="utf-8",
                encoding_errors="replace",
            )
        except (pd.errors.ParserError, pd.errors.EmptyDataError, ValueError):
            return pd.DataFrame(
                list(_parse_csv_rows(raw, source)),
                columns=CSV_COLUMNS + ["_source_file"],
            )
    if not pdf.columns.is_unique:
        # duplicate header names: reindex would raise; the row parser's
        # first-wins header map handles them (matching the reference's
        # name->index map, utils.go:167-170)
        return pd.DataFrame(
            list(_parse_csv_rows(raw, source)),
            columns=CSV_COLUMNS + ["_source_file"],
        )
    pdf = pdf.reindex(columns=CSV_COLUMNS).fillna("")
    pdf["_source_file"] = source
    return pdf


def _member_arrow_table(csv_bytes: bytes, source: str):
    """Arrow-native member parse: pyarrow CSV straight to a wire-schema
    pa.Table, no pandas object strings in the hot tier (the pandas
    round-trip — Arrow -> object dtype -> Arrow — was measured as the
    dominant map-side cost at sf0.1: ~3.4s wall vs ~0.5s of actual
    parse). Falls back to the pandas tiers (_parse_csv_frame) for
    ragged/duplicate-header/corrupt members, then converts once."""
    import pyarrow as pa
    import pyarrow.compute as pc
    from pyarrow import csv as pa_csv

    target = pa.schema(
        [pa.field(c, pa.string()) for c in CSV_COLUMNS]
        + [pa.field("_source_file", pa.string())]
    )

    def _fallback():
        pdf = _parse_csv_frame(csv_bytes, source)
        if pdf.empty:
            return None
        return pa.Table.from_pandas(
            pdf, schema=target, preserve_index=False
        )

    try:
        t = pa_csv.read_csv(
            io.BytesIO(csv_bytes),
            convert_options=pa_csv.ConvertOptions(
                column_types={c: pa.string() for c in CSV_COLUMNS}
            ),
            parse_options=pa_csv.ParseOptions(newlines_in_values=True),
        )
    except pa.ArrowException:
        return _fallback()
    names = t.column_names
    if len(set(names)) != len(names):
        return _fallback()  # duplicate headers: row parser's first-wins map
    n = len(t)
    if n == 0:
        return None
    arrays = []
    for c in CSV_COLUMNS:
        if c in names:
            # absent cell / null -> '' exactly like the reference's get
            # closure (utils.go:185-191)
            arrays.append(pc.fill_null(t.column(c), ""))
        else:
            arrays.append(pc.fill_null(pa.nulls(n, pa.string()), ""))
    arrays.append(pc.fill_null(pa.nulls(n, pa.string()), source))
    return pa.Table.from_arrays(arrays, schema=target)


def _members_safe(content: bytes, path: str) -> Iterator[tuple[str, bytes]]:
    """Per-archive error isolation (reference parity, main.go:183-206: a
    failed day is logged to the error channel and the run continues): a
    corrupt or truncated archive — outer or nested — is logged to the
    worker's stderr and SKIPPED instead of failing the task; members
    already extracted from it before the corruption point are kept."""
    import sys as _sys
    import zlib as _zlib

    gen = _iter_csv_members(content, path)
    while True:
        try:
            yield next(gen)
        except StopIteration:
            return
        except (zipfile.BadZipFile, _zlib.error, OSError, EOFError) as exc:
            print(
                f"dsacord extract: skipping corrupt archive {path}: {exc}",
                file=_sys.stderr,
            )
            return


def extract_zip_arrow(it):
    """mapInArrow body over binaryFile rows (path, content): walk each
    archive's members with corrupt-archive isolation and emit wire-schema
    record batches straight to the JVM — no pandas materialization."""
    for rb in it:
        paths = rb.column("path").to_pylist()
        contents = rb.column("content").to_pylist()
        for path, content in zip(paths, contents):
            for member, csv_bytes in _members_safe(bytes(content), str(path)):
                t = _member_arrow_table(csv_bytes, member)
                if t is None:
                    continue
                yield from t.to_batches()


def read_staged_zips(
    spark: SparkSession, landing: str | list[str]
) -> DataFrame:
    """binaryFile scan of the landing dir — or of an explicit staged-path
    list (what stage_range returns), so a daily run reads exactly its
    own ZIPs instead of rescanning every previously staged day (r8
    verdict; at 100 TB the landing dir holds years of dumps and a
    directory scan would re-extract all of them).

    Arrow-native extraction (mapInArrow): the parse tier emits pyarrow
    record batches directly, skipping the pandas object-string
    round-trip on both sides of the worker boundary (interleaved A/B at
    sf0.1/32 cores: see PLANS.md round-4 notes)."""
    binary = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.zip")
        .option("recursiveFileLookup", "true")
        .load(landing)
        .select("path", "content")
    )
    return binary.mapInArrow(extract_zip_arrow, schema=EXTRACT_SCHEMA)


def read_staged_csvs(spark: SparkSession, landing_dir: str) -> DataFrame:
    """S5 fast path: if the stager (or a pre-step) already unzipped to raw
    CSVs, use Spark's native reader — vectorized, splittable, pushdown-
    friendly — instead of the Python extraction UDF."""
    df = (
        spark.read.option("header", True)
        .option("multiLine", True)
        .option("escape", '"')
        .option("mode", "PERMISSIVE")
        .option("recursiveFileLookup", "true")
        .csv(landing_dir)
    )
    present = set(df.columns)
    # Spark's CSV reader yields NULL for empty cells and for columns a
    # particular file lacks; the reference's get closure yields '' for
    # every such case (utils.go:185-191) — coalesce restores that
    cols = [
        F.coalesce(F.col(c).cast("string"), F.lit("")).alias(c)
        if c in present
        else F.lit("").alias(c)
        for c in CSV_COLUMNS
    ]
    return df.select(*cols, F.input_file_name().alias("_source_file"))
