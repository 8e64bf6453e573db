"""Multimodal columns: image/audio/video as opaque `binary` columns with
typed metadata, processed by Arrow-batched pandas UDFs.

The Spark-side plumbing (schemas, mapInPandas batch shapes, partitioning)
is real and tested, and so are the decode paths for all three
modalities in this container, no codec libraries required:

- images: full pixel decode via Pillow when installed (`_pil_decode`);
  else a pure-stdlib header sniffer for PNG/GIF/BMP/JPEG
  (`_sniff_header`) with REAL pixel features for uncompressed 24-bit
  BMPs (`_bmp_pixel_feature`); compressed formats get header-only
  metadata with a clearly marked hash-derived placeholder feature.
- audio: real PCM WAV parse via the stdlib `wave` module
  (`_decode_audio_one`): header metadata + RMS envelope over samples.
- video: real RIFF/AVI demux (`parse_avi`): container metadata, frame
  bytes, timebase-driven frame sampling, per-frame luma.

Bytes no tier recognizes fall to the deterministic fake
(`_fake_decode_one`), clearly labeled in the output's format column.

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


def synthesize_real_media(docs: DataFrame) -> DataFrame:
    """Deterministic REAL media derived from `documents`: image rows get
    a valid 24-bit BMP (pixels seeded from md5(text)), audio rows a valid
    PCM WAV (stdlib `wave` writer), video rows a valid RIFF/AVI with
    uncompressed BGR24 frames — all three modalities are real files whose
    decode paths run for real in this container. Unlike
    `synthesize_media` (raw text bytes, kept for the SQL-oracle stats
    query), everything this emits exercises the real decode tiers: BMP
    pixel decode, WAV header + PCM parse, AVI demux + frame sampling.
    Generation runs in mapInPandas so the media bytes are built where the
    data lives, never on the driver."""

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                mod = ("image", "audio", "video")[int(doc_id) % 3]
                seed = hashlib.md5(str(text).encode()).digest()
                if mod == "image":
                    # a quarter of image rows are real PNGs (zlib-deflated,
                    # CRC'd) so the pure-stdlib PNG inflate+unfilter tier
                    # runs in the catalog, the rest 24-bit BMPs
                    maker = make_png_bytes if seed[2] % 4 == 0 else make_bmp_bytes
                    data = maker(seed, width=8 + seed[0] % 9,
                                 height=8 + seed[1] % 9)
                elif mod == "audio":
                    data = make_wav_bytes(seed, n_frames=64 + seed[0],
                                          sample_rate=8000)
                else:
                    data = make_avi_bytes(
                        seed, width=8, height=6,
                        n_frames=6 + seed[0] % 10, fps=10,
                    )
                rows.append({"media_id": int(doc_id), "data": data,
                             "modality": mod})
            yield pd.DataFrame(rows, columns=["media_id", "data", "modality"])

    return docs.select("doc_id", "text").mapInPandas(
        gen, schema="media_id long, data binary, modality string"
    )


def make_bmp_bytes(seed: bytes, width: int = 8, height: int = 8) -> bytes:
    """A real, valid 24-bit uncompressed BMP; pixels are a deterministic
    stream derived from the seed (public BITMAPINFOHEADER layout)."""
    import struct

    row_raw = width * 3
    pad = (4 - row_raw % 4) % 4
    body = bytearray()
    stream = bytearray()
    i = 0
    while len(stream) < width * height * 3:
        stream += hashlib.md5(seed + i.to_bytes(4, "big")).digest()
        i += 1
    for y in range(height):
        start = y * row_raw
        body += stream[start : start + row_raw]
        body += b"\x00" * pad
    pixel_offset = 14 + 40
    file_size = pixel_offset + len(body)
    header = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, pixel_offset)
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(body), 2835, 2835, 0, 0
    )
    return header + info + bytes(body)


def make_png_bytes(seed: bytes, width: int = 8, height: int = 8) -> bytes:
    """A real, valid 8-bit RGB PNG (public PNG spec: IHDR/IDAT/IEND
    chunks, zlib-deflated scanlines, per-chunk CRC32); pixels are the
    same deterministic md5 stream the BMP builder uses."""
    import struct
    import zlib

    stream = bytearray()
    i = 0
    while len(stream) < width * height * 3:
        stream += hashlib.md5(seed + b"png" + i.to_bytes(4, "big")).digest()
        i += 1

    def chunk(tag: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload))
            + tag
            + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    raw = bytearray()
    for y in range(height):
        raw += b"\x00"  # filter type 0 (None) per scanline
        raw += stream[y * width * 3 : (y + 1) * width * 3]
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def _png_luma_grid(data: bytes) -> tuple[int, int, list[list[float]]] | None:
    """REAL pixel decode for 8-bit non-interlaced PNGs, pure stdlib: walk
    the chunk stream, inflate the concatenated IDATs with zlib, reverse
    the per-scanline filters (None/Sub/Up/Average/Paeth — the five
    filters of the public PNG spec), and return the row-major per-pixel
    luma grid as (width, height, rows). Supports color types 0 (gray),
    2 (RGB), 4 (gray+alpha) and 6 (RGBA); returns None for palette,
    16-bit, or interlaced images (those need more machinery than a
    feature probe justifies). Shared by the quadrant-luma feature and
    the perceptual-hash (dHash) kernel."""
    import struct
    import zlib

    if len(data) < 33 or data[:8] != b"\x89PNG\r\n\x1a\n":
        return None
    w, h = struct.unpack(">II", data[16:24])
    bit_depth, color_type, _, _, interlace = data[24:29]
    if bit_depth != 8 or interlace != 0:
        return None
    n_ch = {0: 1, 2: 3, 4: 2, 6: 4}.get(color_type)
    if n_ch is None or not w or not h:
        return None
    # concatenate IDAT payloads
    idat = bytearray()
    pos = 8
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        if tag == b"IDAT":
            idat += data[pos + 8 : pos + 8 + length]
        if tag == b"IEND":
            break
        pos += 12 + length
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error:
        return None
    stride = w * n_ch
    if len(raw) < h * (stride + 1):
        return None
    # reverse scanline filters
    out = bytearray(h * stride)
    prev = bytes(stride)
    for y in range(h):
        ftype = raw[y * (stride + 1)]
        line = bytearray(raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)])
        if ftype == 1:  # Sub
            for x in range(n_ch, stride):
                line[x] = (line[x] + line[x - n_ch]) & 0xFF
        elif ftype == 2:  # Up
            for x in range(stride):
                line[x] = (line[x] + prev[x]) & 0xFF
        elif ftype == 3:  # Average
            for x in range(stride):
                left = line[x - n_ch] if x >= n_ch else 0
                line[x] = (line[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for x in range(stride):
                a = line[x - n_ch] if x >= n_ch else 0
                b = prev[x]
                c = prev[x - n_ch] if x >= n_ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[x] = (line[x] + pred) & 0xFF
        elif ftype != 0:
            return None
        out[y * stride : (y + 1) * stride] = line
        prev = bytes(line)
    rows: list[list[float]] = []
    for y in range(h):
        row = out[y * stride : (y + 1) * stride]
        lr = []
        for x in range(w):
            px = row[x * n_ch : (x + 1) * n_ch]
            if color_type in (0, 4):
                lr.append(float(px[0]))
            else:
                lr.append(0.299 * px[0] + 0.587 * px[1] + 0.114 * px[2])
        rows.append(lr)
    return w, h, rows


def _quadrant_feature(w: int, h: int, rows: list[list[float]]) -> list[float]:
    """Quadrant luma means over a luma grid, scaled to [-1, 1], plus the
    mirrored complements (the stable 8-dim layout shared by every image
    decode tier). Row-major accumulation order — identical IEEE sums to
    the pre-refactor in-line loops, so the golden pins hold."""
    sums = [0.0] * 4
    counts = [0] * 4
    for y in range(h):
        qy = 0 if y < h // 2 else 1
        for x in range(w):
            q = qy * 2 + (0 if x < w // 2 else 1)
            sums[q] += rows[y][x]
            counts[q] += 1
    means = [s / c if c else 0.0 for s, c in zip(sums, counts)]
    feat = [(m / 255.0) * 2.0 - 1.0 for m in means]
    return feat + [-f for f in feat]


def _png_pixel_feature(data: bytes) -> list[float] | None:
    """Quadrant-luma feature for PNGs (see _png_luma_grid for the real
    pixel decode; same layout as the BMP tier)."""
    g = _png_luma_grid(data)
    if g is None:
        return None
    return _quadrant_feature(*g)


def make_wav_bytes(seed: bytes, n_frames: int = 128, sample_rate: int = 8000,
                   n_channels: int = 1) -> bytes:
    """A real PCM WAV built with the stdlib `wave` writer; 16-bit samples
    are a deterministic stream derived from the seed."""
    import io
    import struct
    import wave

    stream = bytearray()
    i = 0
    while len(stream) < n_frames * n_channels * 2:
        stream += hashlib.md5(seed + b"wav" + i.to_bytes(4, "big")).digest()
        i += 1
    frames = bytes(stream[: n_frames * n_channels * 2])
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(n_channels)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(frames)
    return buf.getvalue()


def _have_pillow() -> bool:
    try:  # pragma: no cover - not installed in this container
        import PIL.Image  # noqa: F401

        return True
    except ImportError:
        return False


def _sniff_header(data: bytes) -> dict | None:
    """Header-only image decode, pure stdlib: recognize PNG / GIF / BMP /
    JPEG magic and read width/height/channels from the format header.
    These layouts are public file-format specs (PNG IHDR, GIF logical
    screen descriptor, BMP BITMAPINFOHEADER, JPEG SOFn markers). Returns
    None when the bytes are not a recognized image."""
    import struct

    if len(data) >= 24 and data[:8] == b"\x89PNG\r\n\x1a\n" and data[12:16] == b"IHDR":
        w, h = struct.unpack(">II", data[16:24])
        color_type = data[25] if len(data) > 25 else 6
        channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color_type, 3)
        return {"format": "png", "width": w, "height": h, "n_channels": channels}
    if len(data) >= 10 and data[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", data[6:10])
        return {"format": "gif", "width": w, "height": h, "n_channels": 3}
    if len(data) >= 26 and data[:2] == b"BM":
        w, h = struct.unpack("<ii", data[18:26])
        return {"format": "bmp", "width": w, "height": abs(h), "n_channels": 3}
    if len(data) >= 4 and data[:2] == b"\xff\xd8":
        # walk JPEG segments to the first SOFn frame header
        i = 2
        while i + 9 < len(data):
            if data[i] != 0xFF:
                i += 1
                continue
            marker = data[i + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2
                continue
            seg_len = struct.unpack(">H", data[i + 2 : i + 4])[0]
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                h, w = struct.unpack(">HH", data[i + 5 : i + 9])
                channels = data[i + 9]
                return {
                    "format": "jpeg", "width": w, "height": h,
                    "n_channels": int(channels),
                }
            i += 2 + seg_len
    return None


def _pil_decode(data: bytes) -> dict:  # pragma: no cover - PIL not in container
    import io

    import PIL.Image

    with PIL.Image.open(io.BytesIO(data)) as img:
        img.load()
        channels = len(img.getbands())
        # 8-dim feature: per-band means of the four image quadrants,
        # flattened and truncated/padded to 8, scaled to [-1, 1]
        small = img.convert("L").resize((4, 2))
        px = list(small.getdata())
        feature = [(p / 255.0) * 2.0 - 1.0 for p in px[:8]]
        feature += [0.0] * (8 - len(feature))
        return {
            "n_bytes": len(data),
            "format": (img.format or "unknown").lower(),
            "width": img.width,
            "height": img.height,
            "n_channels": channels,
            "feature": feature,
        }


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


def _bmp_luma_grid(
    data: bytes, width: int, height: int
) -> list[list[float]] | None:
    """Row-major per-pixel luma grid for uncompressed 24-bit BMPs, no
    codec needed (raw BGR rows per the public BITMAPINFOHEADER layout).
    Returns None for compressed/other-depth BMPs. Shared by the
    quadrant-luma feature and the perceptual-hash (dHash) kernel."""
    import struct

    if len(data) < 30:
        return None
    pixel_offset = struct.unpack("<I", data[10:14])[0]
    bpp = struct.unpack("<H", data[28:30])[0]
    compression = struct.unpack("<I", data[30:34])[0] if len(data) >= 34 else 0
    if bpp != 24 or compression != 0:
        return None
    row_raw = width * 3
    stride = row_raw + (4 - row_raw % 4) % 4
    if len(data) < pixel_offset + stride * height:
        return None
    rows: list[list[float]] = []
    for y in range(height):
        row = data[pixel_offset + y * stride : pixel_offset + y * stride + row_raw]
        lr = []
        for x in range(width):
            b, g, r = row[3 * x], row[3 * x + 1], row[3 * x + 2]
            lr.append(0.299 * r + 0.587 * g + 0.114 * b)
        rows.append(lr)
    return rows


def _bmp_pixel_feature(data: bytes, width: int, height: int) -> list[float] | None:
    """Quadrant-luma feature for uncompressed 24-bit BMPs (see
    _bmp_luma_grid; 8-dim layout shared with the other decode tiers)."""
    rows = _bmp_luma_grid(data, width, height)
    if rows is None:
        return None
    return _quadrant_feature(width, height, rows)


def _dhash64(w: int, h: int, rows: list[list[float]]) -> int:
    """64-bit difference hash (classic public dHash): box-mean
    downsample the luma grid to a 9x8 cell grid, set bit (r*8+c) when
    the cell to the right is strictly brighter. Near-identical images
    differ in a handful of bits (Hamming distance), unrelated images in
    ~32. Returned as a SIGNED 64-bit int (two's complement) so it
    round-trips Spark's bigint without a float detour.

    Full-strength hashes need a decoded width >= 9 and height >= 8
    (one pixel column per cell column). Below that, pigeonhole forces
    adjacent cells onto identical pixel ranges — with w = 8 the c=0 vs
    c=1 comparison bit is structurally 0 in every row — shrinking the
    effective alphabet and mildly raising collision odds for tiny
    images. No boundary formula can avoid this (9 cells cannot tile
    fewer than 9 columns distinctly); it is deterministic, identical
    across engines, and harmless for recall (collapse only ever maps
    near-identical tiny images CLOSER together, never further apart)."""
    gw, gh = 9, 8
    cells: list[list[float]] = []
    for r in range(gh):
        y0 = r * h // gh
        y1 = max((r + 1) * h // gh, y0 + 1)
        crow = []
        for c in range(gw):
            x0 = c * w // gw
            x1 = max((c + 1) * w // gw, x0 + 1)
            tot = 0.0
            n = 0
            for y in range(y0, min(y1, h)):
                for x in range(x0, min(x1, w)):
                    tot += rows[y][x]
                    n += 1
            crow.append(tot / n if n else 0.0)
        cells.append(crow)
    v = 0
    for r in range(gh):
        for c in range(gw - 1):
            if cells[r][c + 1] > cells[r][c]:
                v |= 1 << (r * 8 + c)
    return v - (1 << 64) if v >= (1 << 63) else v


def _decode_one(data: bytes) -> dict:
    """Tiered decode: full pixel decode via Pillow when installed; else a
    pure-stdlib header sniff (real format/width/height/channels) with
    REAL pixel features for uncompressed 24-bit BMPs and a hash-derived
    placeholder feature for compressed formats (pixels need a codec);
    else the deterministic fake for non-image bytes (e.g. the
    synthesize_media text stand-ins)."""
    if _have_pillow():  # pragma: no cover - PIL not in this container
        try:
            return _pil_decode(data)
        except Exception:
            pass  # not decodable media -> header sniff / fake below
    sniffed = _sniff_header(data)
    if sniffed is not None:
        meta = _fake_decode_one(data)  # placeholder feature vector
        meta.update(sniffed)
        if sniffed["format"] == "bmp":
            real = _bmp_pixel_feature(
                data, sniffed["width"], sniffed["height"]
            )
            if real is not None:
                meta["feature"] = real
        elif sniffed["format"] == "png":
            real = _png_pixel_feature(data)
            if real is not None:
                meta["feature"] = real
        return meta
    return _fake_decode_one(data)


AUDIO_META_SCHEMA = (
    "media_id long, n_bytes long, format string, n_channels int, "
    "sample_rate int, n_frames long, duration_ms long, feature array<float>"
)


def _decode_audio_one(data: bytes) -> dict:
    """REAL WAV decode via the stdlib `wave` module: header metadata plus
    an 8-segment RMS envelope over the PCM samples as the feature vector.
    Non-WAV bytes fall back to the deterministic fake (format
    'fake/deterministic', metadata derived from the byte stream)."""
    import io
    import struct
    import wave

    try:
        with wave.open(io.BytesIO(data), "rb") as w:
            n_channels = w.getnchannels()
            sample_rate = w.getframerate()
            n_frames = w.getnframes()
            width = w.getsampwidth()
            frames = w.readframes(n_frames)
    except (wave.Error, EOFError, struct.error):
        fake = _fake_decode_one(data)
        return {
            "n_bytes": len(data),
            "format": "fake/deterministic",
            "n_channels": fake["n_channels"],
            "sample_rate": 8000,
            "n_frames": fake["width"] * fake["height"],
            "duration_ms": fake["width"],
            "feature": fake["feature"],
        }
    if width == 2 and n_frames:
        samples = struct.unpack(f"<{len(frames) // 2}h", frames)
        seg = max(1, len(samples) // 8)
        feature = []
        for i in range(8):
            chunk = samples[i * seg : (i + 1) * seg]
            if chunk:
                rms = (sum(s * s for s in chunk) / len(chunk)) ** 0.5
                feature.append(rms / 32768.0)
            else:
                feature.append(0.0)
    else:
        feature = [0.0] * 8
    return {
        "n_bytes": len(data),
        "format": "wav",
        "n_channels": n_channels,
        "sample_rate": sample_rate,
        "n_frames": n_frames,
        "duration_ms": int(n_frames * 1000 / sample_rate) if sample_rate else 0,
        "feature": feature,
    }


def decode_audio(media: DataFrame) -> DataFrame:
    """mapInPandas audio decode: (media_id, data) -> WAV metadata + RMS
    envelope. Arrow batches in and out, like decode_images."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [
            "media_id", "n_bytes", "format", "n_channels", "sample_rate",
            "n_frames", "duration_ms", "feature",
        ]
        for pdf in it:
            out = []
            for media_id, data in zip(pdf["media_id"], pdf["data"]):
                meta = _decode_audio_one(bytes(data))
                meta["media_id"] = media_id
                out.append(meta)
            yield pd.DataFrame(out, columns=cols)

    return media.select("media_id", "data").mapInPandas(
        batches, schema=AUDIO_META_SCHEMA
    )


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


IMAGE_HASH_SCHEMA = (
    "media_id long, format string, width int, height int, dhash long"
)


def image_dhash(media: DataFrame) -> DataFrame:
    """mapInPandas perceptual hash: (media_id, data) -> 64-bit dHash over
    the REAL decoded luma grid (the stdlib BMP/PNG pixel tiers). Rows
    whose pixels can't be decoded (palette/16-bit/interlaced PNG,
    compressed BMP, non-image bytes) get a NULL dhash — callers filter.
    The dhash column is built as a nullable Arrow int64 explicitly: a
    plain object/float pandas column would round 64-bit hashes through
    float64 and corrupt them."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, fmts, ws, hs, dhs = [], [], [], [], []
            for media_id, data in zip(pdf["media_id"], pdf["data"]):
                data = bytes(data)
                sn = _sniff_header(data)
                fmt = sn["format"] if sn else None
                w = sn.get("width") if sn else None
                h = sn.get("height") if sn else None
                grid = None
                if fmt == "bmp" and w and h:
                    rows = _bmp_luma_grid(data, w, h)
                    if rows is not None:
                        grid = (w, h, rows)
                elif fmt == "png":
                    grid = _png_luma_grid(data)
                ids.append(int(media_id))
                fmts.append(fmt)
                ws.append(w)
                hs.append(h)
                dhs.append(_dhash64(*grid) if grid is not None else None)
            yield pd.DataFrame(
                {
                    "media_id": pd.array(ids, dtype="int64"),
                    "format": pd.array(fmts, dtype="object"),
                    "width": pd.array(ws, dtype="Int32"),
                    "height": pd.array(hs, dtype="Int32"),
                    "dhash": pd.array(dhs, dtype="Int64"),
                }
            )

    return media.select("media_id", "data").mapInPandas(
        batches, schema=IMAGE_HASH_SCHEMA
    )


def perturb_images(media: DataFrame) -> DataFrame:
    """Deterministic one-pixel perturbation: for uncompressed 24-bit
    BMPs, flip the top bit of the first pixel's blue channel (a single
    corner pixel shifts by ~15 luma units — a visually trivial edit that
    moves the dHash by at most a couple of bits). Other formats pass
    through byte-identical (PNG would need a re-encoder; an identical
    twin is still a legitimate near-duplicate: Hamming 0). Used to plant
    known near-duplicates in the synthesized corpus, which has none
    naturally."""
    import struct

    schema = media.schema

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for data in pdf["data"]:
                data = bytes(data)
                sn = _sniff_header(data)
                if sn and sn["format"] == "bmp" and len(data) >= 14:
                    off = struct.unpack("<I", data[10:14])[0]
                    if off < len(data):
                        buf = bytearray(data)
                        buf[off] ^= 0x80
                        data = bytes(buf)
                out.append(data)
            pdf = pdf.copy()
            pdf["data"] = out
            yield pdf

    return media.mapInPandas(batches, schema=schema)


def _wav_ehash64(data: bytes) -> int | None:
    """64-bit temporal-envelope difference hash for 16-bit PCM WAVs —
    the audio analogue of dHash: 65 segment RMS values over the sample
    stream, bit k set when segment k+1 is strictly louder than segment
    k. Robust to small per-sample edits (one sample moves at most the
    two comparisons that touch its segment), unrelated audio disagrees
    on ~half the bits. Returns None for non-WAV / non-16-bit input.
    Returned as a SIGNED 64-bit int (two's complement) so it round-trips
    Spark's bigint without a float detour."""
    import io
    import struct
    import wave

    try:
        with wave.open(io.BytesIO(data), "rb") as w:
            n_frames = w.getnframes()
            width = w.getsampwidth()
            frames = w.readframes(n_frames)
        if width != 2 or not n_frames:
            return None
        # a data chunk truncated mid-sample leaves an odd byte count;
        # struct.unpack demands an exact-length buffer, so decode the
        # whole-sample prefix — the contract is a hash or None for
        # undecodable bytes, never a task crash (review finding)
        even = len(frames) - len(frames) % 2
        samples = struct.unpack(f"<{even // 2}h", frames[:even])
    except (wave.Error, EOFError, struct.error):
        return None
    if not samples:
        return None
    n_seg = 65
    seg = max(1, len(samples) // n_seg)
    env = []
    for i in range(n_seg):
        chunk = samples[i * seg : (i + 1) * seg]
        if chunk:
            env.append((sum(s * s for s in chunk) / len(chunk)) ** 0.5)
        else:
            env.append(0.0)
    v = 0
    for k in range(64):
        if env[k + 1] > env[k]:
            v |= 1 << k
    return v - (1 << 64) if v >= (1 << 63) else v


AUDIO_HASH_SCHEMA = "media_id long, ehash long"


def audio_ehash(media: DataFrame) -> DataFrame:
    """mapInPandas audio fingerprint: (media_id, data) -> 64-bit envelope
    difference hash (see _wav_ehash64). NULL for undecodable rows. The
    hash column is a nullable Arrow int64 explicitly — a float pandas
    column would corrupt 64-bit hashes."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, ehs = [], []
            for media_id, data in zip(pdf["media_id"], pdf["data"]):
                ids.append(int(media_id))
                ehs.append(_wav_ehash64(bytes(data)))
            yield pd.DataFrame(
                {
                    "media_id": pd.array(ids, dtype="int64"),
                    "ehash": pd.array(ehs, dtype="Int64"),
                }
            )

    return media.select("media_id", "data").mapInPandas(
        batches, schema=AUDIO_HASH_SCHEMA
    )


def perturb_audio(media: DataFrame) -> DataFrame:
    """Deterministic one-sample perturbation for RIFF/WAVE bytes: flip a
    mid-amplitude bit in the FIRST PCM sample (an inaudible click). The
    first sample always sits inside _wav_ehash64's 65-segment window
    (the last n mod 65 samples are discarded — a tail edit would hash
    identically for ~99% of corpus lengths, review finding), so the
    twin lands at a small nonzero Hamming distance whenever the edit
    flips an envelope comparison. Non-WAV bytes pass through unchanged.
    Used to plant known near-duplicates in the synthesized corpus."""
    schema = media.schema

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for data in pdf["data"]:
                data = bytes(data)
                if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
                    i = data.find(b"data")
                    # first sample's high byte lives at data-chunk
                    # payload offset +1 (16-bit little-endian PCM)
                    if 0 <= i and i + 9 < len(data):
                        buf = bytearray(data)
                        buf[i + 9] ^= 0x40
                        data = bytes(buf)
                out.append(data)
            pdf = pdf.copy()
            pdf["data"] = out
            yield pdf

    return media.mapInPandas(batches, schema=schema)


def sample_frames(media: DataFrame, every_ms: int = 1000, max_frames: int = 5) -> DataFrame:
    """Video frame sampling: one output row per sampled frame
    (mapInPandas as a flat-map — row counts grow, Arrow batches bound
    memory). RIFF/AVI bytes are REALLY demuxed (`parse_avi`): frames are
    sampled on the stream's own timebase (every_ms against the
    container's us_per_frame), the md5 is of the actual frame bytes, and
    timestamps are real presentation times. Non-AVI bytes fall back to
    the deterministic fake (hash of bytes + index)."""

    def frames(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for media_id, data in zip(pdf["media_id"], pdf["data"]):
                raw = bytes(data)
                avi = parse_avi(raw)
                if avi is not None and avi["frames"]:
                    stride = max(
                        1, round(every_ms * 1000 / max(1, avi["us_per_frame"]))
                    )
                    picked = list(range(0, len(avi["frames"]), stride))[:max_frames]
                    for out_idx, f_idx in enumerate(picked):
                        rows.append(
                            {
                                "media_id": media_id,
                                "frame_idx": out_idx,
                                "frame_ts_ms": f_idx * avi["us_per_frame"] // 1000,
                                "frame_md5": hashlib.md5(
                                    avi["frames"][f_idx]
                                ).hexdigest(),
                            }
                        )
                    continue
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

    def _pil_resize(raw: bytes) -> bytes | None:  # pragma: no cover - no PIL here
        if not _have_pillow():
            return None
        import io

        import PIL.Image

        try:
            with PIL.Image.open(io.BytesIO(raw)) as img:
                return img.convert("RGB").resize((width, height)).tobytes()
        except Exception:
            return None  # non-image bytes -> fake kernel below

    def resize_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for media_id, data in zip(pdf["media_id"], pdf["data"]):
                raw = bytes(data) or b"\x00"
                real = _pil_resize(raw)
                if real is not None:
                    rows.append(
                        {
                            "media_id": media_id,
                            "width": width,
                            "height": height,
                            "n_bytes": len(real),
                            "data": real,
                        }
                    )
                    continue
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


# ---------------------------------------------------------------------------
# Video: minimal RIFF/AVI container with uncompressed BGR24 frames (the
# public AVI layout: hdrl(avih + strl(strh/strf)) + movi('00db' chunks)).
# Writable and parseable with struct alone, so the video modality is real
# end-to-end in this container: real frame bytes, real timing metadata,
# real per-frame sampling.
# ---------------------------------------------------------------------------


def make_avi_bytes(
    seed: bytes,
    width: int = 8,
    height: int = 6,
    n_frames: int = 12,
    fps: int = 10,
) -> bytes:
    """A real, valid AVI: RIFF('AVI ') with a main header, one
    uncompressed-video stream, and n_frames raw bottom-up BGR frames in
    the movi list; pixel bytes are a deterministic seed-derived stream."""
    import struct

    def chunk(tag: bytes, payload: bytes) -> bytes:
        pad = b"\x00" if len(payload) % 2 else b""
        return tag + struct.pack("<I", len(payload)) + payload + pad

    def list_chunk(kind: bytes, payload: bytes) -> bytes:
        return chunk(b"LIST", kind + payload)

    row_raw = width * 3
    stride = row_raw + (4 - row_raw % 4) % 4
    frame_bytes = stride * height
    us_per_frame = 1_000_000 // fps

    frames = []
    stream = bytearray()
    i = 0
    while len(stream) < frame_bytes * n_frames:
        stream += hashlib.md5(seed + b"avi" + i.to_bytes(4, "big")).digest()
        i += 1
    for f in range(n_frames):
        frames.append(bytes(stream[f * frame_bytes : (f + 1) * frame_bytes]))

    avih = struct.pack(
        "<14I",
        us_per_frame, frame_bytes * fps, 0, 0x10, n_frames, 0, 1,
        frame_bytes, width, height, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"\x00\x00\x00\x00"
        + struct.pack("<10I", 0, 0, 0, 1, fps, 0, n_frames, frame_bytes, 0, 0)
        + struct.pack("<4H", 0, 0, width, height)
    )
    strf = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, frame_bytes, 0, 0, 0, 0
    )
    hdrl = list_chunk(
        b"hdrl",
        chunk(b"avih", avih) + list_chunk(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi = list_chunk(b"movi", b"".join(chunk(b"00db", f) for f in frames))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def parse_avi(data: bytes) -> dict | None:
    """Parse the minimal AVI layout: returns width/height/n_frames/
    us_per_frame and the raw frame byte chunks, or None when the bytes
    are not a RIFF AVI."""
    import struct

    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        return None
    meta: dict = {"frames": []}

    def walk(buf: bytes) -> None:
        i = 0
        while i + 8 <= len(buf):
            tag = buf[i : i + 4]
            (size,) = struct.unpack("<I", buf[i + 4 : i + 8])
            payload = buf[i + 8 : i + 8 + size]
            if tag == b"LIST":
                walk(payload[4:])
            elif tag == b"avih" and size >= 40:
                vals = struct.unpack("<10I", payload[:40])
                meta.update(
                    us_per_frame=vals[0], n_frames=vals[4],
                    width=vals[8], height=vals[9],
                )
            elif tag in (b"00db", b"00dc"):
                meta["frames"].append(payload)
            i += 8 + size + (size % 2)

    walk(data[12:])
    if "width" not in meta:
        return None
    return meta


def _bgr_frame_luma(frame: bytes, width: int, height: int) -> float:
    """Mean luma of one raw bottom-up BGR frame (stride-padded rows).
    Tolerates short/compressed chunks (a real-world AVI may carry '00dc'
    compressed frames smaller than stride*height): only complete pixels
    actually present are averaged; an unusable chunk scores 0.0 instead
    of crashing the task."""
    row_raw = width * 3
    stride = row_raw + (4 - row_raw % 4) % 4
    total = 0.0
    n = 0
    for y in range(height):
        row = frame[y * stride : y * stride + row_raw]
        for x in range(len(row) // 3):
            b, g, r = row[3 * x], row[3 * x + 1], row[3 * x + 2]
            total += 0.299 * r + 0.587 * g + 0.114 * b
            n += 1
    return total / n if n else 0.0


def _avi_vhash64(data: bytes) -> int | None:
    """64-bit spatio-temporal fingerprint for raw-BGR AVIs: sample 8
    frames evenly across the stream; per frame, 9 column-luma means give
    8 left-vs-right comparisons (the dHash trick per frame), packing
    8 frames x 8 bits. A one-pixel edit moves at most the two
    comparisons touching its column in one sampled frame; unrelated
    clips disagree on ~half the bits. Returns None for non-AVI bytes or
    an AVI with no frame chunks. Returned as a SIGNED 64-bit int."""
    meta = parse_avi(data)
    if meta is None or not meta["frames"] or not meta.get("width"):
        return None
    w, h = meta["width"], meta["height"]
    frames = meta["frames"]
    nf = len(frames)
    row_raw = w * 3
    stride = row_raw + (4 - row_raw % 4) % 4
    v = 0
    for fi in range(8):
        frame = frames[fi * nf // 8]
        colmeans = []
        for c in range(9):
            x0 = c * w // 9
            x1 = max((c + 1) * w // 9, x0 + 1)
            tot = 0.0
            n = 0
            for y in range(h):
                row = frame[y * stride : y * stride + row_raw]
                for x in range(x0, min(x1, len(row) // 3)):
                    b, g, r = row[3 * x], row[3 * x + 1], row[3 * x + 2]
                    tot += 0.299 * r + 0.587 * g + 0.114 * b
                    n += 1
            colmeans.append(tot / n if n else 0.0)
        for c in range(8):
            if colmeans[c + 1] > colmeans[c]:
                v |= 1 << (fi * 8 + c)
    return v - (1 << 64) if v >= (1 << 63) else v


VIDEO_HASH_SCHEMA = "media_id long, vhash long"


def video_vhash(media: DataFrame) -> DataFrame:
    """mapInPandas video fingerprint: (media_id, data) -> 64-bit
    spatio-temporal hash (see _avi_vhash64). NULL for undecodable rows;
    nullable Arrow int64 explicitly (no float corruption)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, vhs = [], []
            for media_id, data in zip(pdf["media_id"], pdf["data"]):
                ids.append(int(media_id))
                vhs.append(_avi_vhash64(bytes(data)))
            yield pd.DataFrame(
                {
                    "media_id": pd.array(ids, dtype="int64"),
                    "vhash": pd.array(vhs, dtype="Int64"),
                }
            )

    return media.select("media_id", "data").mapInPandas(
        batches, schema=VIDEO_HASH_SCHEMA
    )


def perturb_video(media: DataFrame) -> DataFrame:
    """Deterministic one-pixel perturbation for RIFF/AVI bytes: flip the
    top bit of the FIRST pixel byte of the FIRST frame chunk. Frame 0 is
    always among _avi_vhash64's 8 sampled frames (a last-byte edit hit a
    sampled frame only when 7*nf//8 == nf-1 — review finding), so the
    twin lands at a small nonzero Hamming distance whenever the edit
    flips a column comparison. Non-AVI bytes pass through unchanged."""
    schema = media.schema

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for data in pdf["data"]:
                data = bytes(data)
                if len(data) > 12 and data[:4] == b"RIFF" and data[8:12] == b"AVI ":
                    i = data.find(b"00db")
                    if i < 0:
                        i = data.find(b"00dc")
                    if 0 <= i and i + 8 < len(data):
                        buf = bytearray(data)
                        buf[i + 8] ^= 0x80
                        data = bytes(buf)
                out.append(data)
            pdf = pdf.copy()
            pdf["data"] = out
            yield pdf

    return media.mapInPandas(batches, schema=schema)


VIDEO_META_SCHEMA = (
    "media_id long, n_bytes long, format string, width int, height int, "
    "n_frames int, duration_ms long, mean_luma double"
)


def decode_video(media: DataFrame) -> DataFrame:
    """mapInPandas video decode: REAL AVI demux (dimensions, frame count,
    duration from the container header) plus mean luma over the actual
    frame pixels. Non-AVI bytes get the deterministic fake metadata."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [
            "media_id", "n_bytes", "format", "width", "height", "n_frames",
            "duration_ms", "mean_luma",
        ]
        for pdf in it:
            rows = []
            for media_id, data in zip(pdf["media_id"], pdf["data"]):
                raw = bytes(data)
                avi = parse_avi(raw)
                if avi is not None:
                    lumas = [
                        _bgr_frame_luma(f, avi["width"], avi["height"])
                        for f in avi["frames"]
                    ]
                    rows.append(
                        {
                            "media_id": media_id,
                            "n_bytes": len(raw),
                            "format": "avi/bgr24",
                            "width": avi["width"],
                            "height": avi["height"],
                            "n_frames": len(avi["frames"]),
                            "duration_ms": len(avi["frames"])
                            * avi["us_per_frame"] // 1000,
                            "mean_luma": round(
                                sum(lumas) / len(lumas), 6
                            ) if lumas else 0.0,
                        }
                    )
                else:
                    fake = _fake_decode_one(raw)
                    rows.append(
                        {
                            "media_id": media_id,
                            "n_bytes": len(raw),
                            "format": "fake/deterministic",
                            "width": fake["width"],
                            "height": fake["height"],
                            "n_frames": 0,
                            "duration_ms": 0,
                            "mean_luma": 0.0,
                        }
                    )
            yield pd.DataFrame(rows, columns=cols)

    return media.select("media_id", "data").mapInPandas(
        batches, schema=VIDEO_META_SCHEMA
    )
