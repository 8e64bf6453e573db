"""Multimodal columns: image/audio/video as opaque `binary` columns with
typed metadata, processed by Arrow-batched pandas UDFs.

The Spark-side plumbing (schemas, mapInPandas batch shapes, partitioning)
is real and tested; the actual media decode is STUBBED — this container
has no image/audio libraries, so `decode_image` tries Pillow and falls
back to a deterministic fake decoder (clearly marked) that derives
metadata/features from the bytes alone. Swapping in a real decoder
changes only `_decode_one`.

At 100 TB: media bytes live in the lake as binary columns (or object-
store pointers) partitioned by modality/date; decode runs in mapInPandas
so each task streams Arrow batches instead of collecting files; feature
vectors come back as array<float> columns that feed the similarity
operators in operators/similarity.py.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F

# typed metadata schema for decoded images
IMAGE_META_SCHEMA = (
    "media_id long, n_bytes long, format string, width int, height int, "
    "n_channels int, feature array<float>"
)

FRAME_SCHEMA = "media_id long, frame_idx int, frame_ts_ms long, frame_md5 string"


def synthesize_media(docs: DataFrame) -> DataFrame:
    """Derive a deterministic fake media table from `documents`: the text
    bytes stand in for encoded media. Real pipelines read binary files via
    spark.read.format('binaryFile') — the downstream plumbing is the same."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "utf-8").alias("data"),
        F.when(F.col("doc_id") % 3 == 0, F.lit("image"))
        .when(F.col("doc_id") % 3 == 1, F.lit("audio"))
        .otherwise(F.lit("video"))
        .alias("modality"),
    )


def _have_pillow() -> bool:
    try:  # pragma: no cover - not installed in this container
        import PIL.Image  # noqa: F401

        return True
    except ImportError:
        return False


def _fake_decode_one(data: bytes) -> dict:
    """DETERMINISTIC FAKE DECODER (stub): metadata derived from the bytes.
    A real decoder would parse the media header instead."""
    digest = hashlib.md5(data).digest()
    width = 64 + digest[0] % 192
    height = 64 + digest[1] % 192
    feature = [((b / 255.0) * 2.0 - 1.0) for b in digest[:8]]
    return {
        "n_bytes": len(data),
        "format": "fake/deterministic",
        "width": int(width),
        "height": int(height),
        "n_channels": 3,
        "feature": feature,
    }


def _decode_one(data: bytes) -> dict:
    if _have_pillow():  # pragma: no cover
        raise NotImplementedError(
            "real image decode: parse with PIL.Image.open(io.BytesIO(data))"
        )
    return _fake_decode_one(data)


def decode_images(media: DataFrame) -> DataFrame:
    """mapInPandas decode: (media_id, data) -> typed metadata + feature
    vector. Arrow batches in, Arrow batches out — no per-row Python."""

    def decode_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for media_id, data in zip(pdf["media_id"], pdf["data"]):
                meta = _decode_one(bytes(data))
                meta["media_id"] = media_id
                out.append(meta)
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id", "n_bytes", "format", "width", "height",
                    "n_channels", "feature",
                ],
            )

    return media.select("media_id", "data").mapInPandas(
        decode_batches, schema=IMAGE_META_SCHEMA
    )


def sample_frames(media: DataFrame, every_ms: int = 1000, max_frames: int = 5) -> DataFrame:
    """Video frame sampling stub: one output row per sampled frame
    (mapInPandas as a flat-map — row counts grow, Arrow batches bound
    memory). Frame 'content' is a deterministic hash of (bytes, index)."""

    def frames(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for media_id, data in zip(pdf["media_id"], pdf["data"]):
                raw = bytes(data)
                n = min(max_frames, 1 + len(raw) % max_frames)
                for i in range(n):
                    rows.append(
                        {
                            "media_id": media_id,
                            "frame_idx": i,
                            "frame_ts_ms": i * every_ms,
                            "frame_md5": hashlib.md5(raw + bytes([i])).hexdigest(),
                        }
                    )
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_idx", "frame_ts_ms", "frame_md5"]
            )

    return media.filter(F.col("modality") == "video").select(
        "media_id", "data"
    ).mapInPandas(frames, schema=FRAME_SCHEMA)


RESIZED_SCHEMA = "media_id long, width int, height int, n_bytes long, data binary"


def resize_images(media: DataFrame, width: int = 32, height: int = 32) -> DataFrame:
    """Resize stub: (media_id, data) -> fixed-size binary + new dims.
    The DETERMINISTIC FAKE kernel strides the source bytes down to
    width*height*3 (padding by repetition when short) — a real kernel
    swaps in Pillow's Image.resize without touching the Spark plumbing:
    binary in, binary out, Arrow-batched, flat per-row cardinality."""

    target = width * height * 3

    def resize_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for media_id, data in zip(pdf["media_id"], pdf["data"]):
                raw = bytes(data) or b"\x00"
                reps = -(-target // len(raw))  # ceil-div: pad short inputs
                buf = (raw * reps)[:target] if reps > 1 else raw[
                    :: max(1, len(raw) // target)
                ][:target].ljust(target, raw[:1])
                rows.append(
                    {
                        "media_id": media_id,
                        "width": width,
                        "height": height,
                        "n_bytes": len(buf),
                        "data": buf,
                    }
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "width", "height", "n_bytes", "data"]
            )

    return media.filter(F.col("modality") == "image").select(
        "media_id", "data"
    ).mapInPandas(resize_batches, schema=RESIZED_SCHEMA)
