"""Multimodal decode tests: real header sniffing (PNG/GIF/BMP/JPEG built
in-test from the public format specs, stdlib only), the Pillow tier via a
minimal stub module (Pillow itself is not in this container), and the
Arrow-batched Spark plumbing end-to-end.

Reference has no media handling (SURVEY §2 — multimodal is a north-star
layer-B addition); these tests pin the three-tier decode contract in
dsacord_spark/multimodal/binary.py.
"""

from __future__ import annotations

import struct
import sys
import types
import zlib

import pytest

from dsacord_spark.multimodal import binary as mm


def make_png(width: int = 5, height: int = 3, color_type: int = 2) -> bytes:
    """A real, valid PNG built from the spec: signature, IHDR, IDAT
    (zlib-compressed scanlines), IEND."""

    def chunk(tag: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload))
            + tag
            + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
        )

    channels = {0: 1, 2: 3, 6: 4}[color_type]
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    raw = b"".join(
        b"\x00" + bytes((x * 37 + y * 11 + c) % 256
                        for x in range(width) for c in range(channels))
        for y in range(height)
    )
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def make_gif(width: int = 7, height: int = 4) -> bytes:
    return b"GIF89a" + struct.pack("<HH", width, height) + b"\x00\x00\x00;"


def make_bmp(width: int = 9, height: int = 6) -> bytes:
    # 14-byte file header + BITMAPINFOHEADER with dims at offset 18
    return (
        b"BM" + b"\x00" * 16 + struct.pack("<ii", width, height) + b"\x00" * 20
    )


def make_jpeg(width: int = 11, height: int = 8) -> bytes:
    # SOI, APP0 stub, SOF0 frame header carrying the dimensions, EOI
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
    sof0_payload = struct.pack(">BHHB", 8, height, width, 3) + b"\x01\x11\x00" * 3
    sof0 = b"\xff\xc0" + struct.pack(">H", 2 + len(sof0_payload)) + sof0_payload
    return b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"


class TestHeaderSniff:
    def test_png(self):
        meta = mm._decode_one(make_png(5, 3, color_type=2))
        assert (meta["format"], meta["width"], meta["height"], meta["n_channels"]) == (
            "png", 5, 3, 3
        )

    def test_png_rgba(self):
        meta = mm._decode_one(make_png(2, 2, color_type=6))
        assert meta["n_channels"] == 4

    def test_gif(self):
        meta = mm._decode_one(make_gif(7, 4))
        assert (meta["format"], meta["width"], meta["height"]) == ("gif", 7, 4)

    def test_bmp_and_bottom_up_height(self):
        meta = mm._decode_one(make_bmp(9, 6))
        assert (meta["format"], meta["width"], meta["height"]) == ("bmp", 9, 6)
        # negative height = top-down BMP; reported height is absolute
        assert mm._decode_one(make_bmp(9, -6))["height"] == 6

    def test_jpeg(self):
        meta = mm._decode_one(make_jpeg(11, 8))
        assert (meta["format"], meta["width"], meta["height"], meta["n_channels"]) == (
            "jpeg", 11, 8, 3
        )

    def test_non_image_falls_back_to_fake(self):
        meta = mm._decode_one(b"just some text bytes")
        assert meta["format"] == "fake/deterministic"
        assert len(meta["feature"]) == 8

    def test_sniffed_meta_has_all_columns(self):
        meta = mm._decode_one(make_png())
        assert set(meta) == {
            "n_bytes", "format", "width", "height", "n_channels", "feature",
        }
        assert meta["n_bytes"] == len(make_png())


class _StubImage:
    """Minimal PIL.Image stand-in implementing exactly the surface
    _pil_decode/_pil_resize use."""

    def __init__(self, width, height, bands="RGB", fmt="PNG"):
        self.width, self.height = width, height
        self.format = fmt
        self._bands = bands

    # context manager + loading
    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False

    def load(self):
        return None

    def getbands(self):
        return tuple(self._bands)

    def convert(self, mode):
        return _StubImage(self.width, self.height, bands=mode, fmt=self.format)

    def resize(self, size):
        return _StubImage(size[0], size[1], bands=self._bands, fmt=self.format)

    def getdata(self):
        return [17] * (self.width * self.height)

    def tobytes(self):
        return b"\x11" * (self.width * self.height * len(self._bands))


class TestPillowTier:
    @pytest.fixture()
    def stub_pil(self, monkeypatch):
        sniff = mm._sniff_header

        def fake_open(buf):
            meta = sniff(buf.getvalue())
            if meta is None:
                raise OSError("cannot identify image file")
            return _StubImage(
                meta["width"], meta["height"],
                bands="RGBA" if meta["n_channels"] == 4 else "RGB",
                fmt=meta["format"].upper(),
            )

        pil = types.ModuleType("PIL")
        pil_image = types.ModuleType("PIL.Image")
        pil_image.open = fake_open
        pil.Image = pil_image
        monkeypatch.setitem(sys.modules, "PIL", pil)
        monkeypatch.setitem(sys.modules, "PIL.Image", pil_image)
        return pil

    def test_decode_uses_pillow_when_available(self, stub_pil):
        meta = mm._decode_one(make_png(5, 3))
        assert (meta["format"], meta["width"], meta["height"]) == ("png", 5, 3)
        assert len(meta["feature"]) == 8
        # stub pixels are constant 17 -> scaled to 17/255*2-1
        assert meta["feature"][0] == pytest.approx(17 / 255 * 2 - 1)

    def test_decode_pillow_failure_falls_back(self, stub_pil):
        meta = mm._decode_one(b"not an image at all")
        assert meta["format"] == "fake/deterministic"

    def test_resize_uses_pillow_when_available(self, stub_pil, spark):
        media = spark.createDataFrame(
            [(1, bytearray(make_png(5, 3)), "image"),
             (2, bytearray(b"plain bytes"), "image")],
            "media_id long, data binary, modality string",
        )
        rows = {r["media_id"]: r for r in mm.resize_images(media, 4, 4).collect()}
        assert rows[1]["n_bytes"] == 4 * 4 * 3  # real (stubbed) RGB resize
        assert rows[2]["n_bytes"] == 4 * 4 * 3  # fake kernel also hits target


class TestSparkPlumbing:
    def test_decode_images_over_real_png(self, spark):
        media = spark.createDataFrame(
            [(1, bytearray(make_png(5, 3))), (2, bytearray(b"text-bytes"))],
            "media_id long, data binary",
        )
        rows = {r["media_id"]: r for r in mm.decode_images(media).collect()}
        assert rows[1]["format"] == "png"
        assert (rows[1]["width"], rows[1]["height"]) == (5, 3)
        assert rows[2]["format"] == "fake/deterministic"
        assert len(rows[1]["feature"]) == 8

    def test_decode_deterministic(self, spark):
        media = spark.createDataFrame(
            [(i, bytearray(make_gif(3 + i, 2))) for i in range(10)],
            "media_id long, data binary",
        )
        a = sorted(map(tuple, mm.decode_images(media).collect()))
        b = sorted(map(tuple, mm.decode_images(media).collect()))
        assert a == b


class TestRealGeneratedMedia:
    def test_make_bmp_is_decodable_with_real_pixels(self):
        bmp = mm.make_bmp_bytes(b"seed-1", width=9, height=7)
        meta = mm._decode_one(bmp)
        assert (meta["format"], meta["width"], meta["height"]) == ("bmp", 9, 7)
        # real pixel feature: quadrant luma means + mirrored complements
        feat = meta["feature"]
        assert len(feat) == 8
        assert feat[4:] == [-f for f in feat[:4]]
        assert all(-1.0 <= f <= 1.0 for f in feat)
        # different seed -> different pixels -> different feature
        other = mm._decode_one(mm.make_bmp_bytes(b"seed-2", width=9, height=7))
        assert other["feature"] != feat

    def test_make_wav_is_decodable_with_stdlib_wave(self):
        wav = mm.make_wav_bytes(b"seed-1", n_frames=100, sample_rate=8000)
        meta = mm._decode_audio_one(wav)
        assert meta["format"] == "wav"
        assert meta["n_channels"] == 1
        assert meta["sample_rate"] == 8000
        assert meta["n_frames"] == 100
        assert meta["duration_ms"] == 12  # 100 frames at 8 kHz
        assert len(meta["feature"]) == 8
        assert any(f > 0 for f in meta["feature"])  # real RMS energy

    def test_audio_fallback_on_non_wav(self):
        meta = mm._decode_audio_one(b"definitely not riff")
        assert meta["format"] == "fake/deterministic"

    def test_synthesize_real_media_modalities(self, spark, sf_dir):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(30)
        media = mm.synthesize_real_media(docs)
        rows = media.collect()
        by_mod = {}
        for r in rows:
            by_mod.setdefault(r["modality"], []).append(bytes(r["data"]))
        assert set(by_mod) == {"image", "audio", "video"}
        # image rows are a PNG/BMP mix (a quarter PNG by seed byte)
        assert all(
            d[:2] == b"BM" or d[:8] == b"\x89PNG\r\n\x1a\n"
            for d in by_mod["image"]
        )
        assert all(d[:4] == b"RIFF" for d in by_mod["audio"])

    def test_decode_audio_over_spark(self, spark, sf_dir):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(30)
        media = mm.synthesize_real_media(docs).filter("modality = 'audio'")
        out = mm.decode_audio(media).collect()
        assert out and all(r["format"] == "wav" for r in out)
        assert all(r["sample_rate"] == 8000 for r in out)

    def test_real_media_deterministic(self, spark, sf_dir):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(10)
        a = sorted((r["media_id"], bytes(r["data"]))
                   for r in mm.synthesize_real_media(docs).collect())
        b = sorted((r["media_id"], bytes(r["data"]))
                   for r in mm.synthesize_real_media(docs).collect())
        assert a == b


class TestAviVideo:
    def test_make_avi_roundtrip(self):
        avi = mm.make_avi_bytes(b"s1", width=8, height=6, n_frames=12, fps=10)
        meta = mm.parse_avi(avi)
        assert (meta["width"], meta["height"]) == (8, 6)
        assert len(meta["frames"]) == 12
        assert meta["us_per_frame"] == 100_000
        # stride-padded BGR24 frame size
        assert all(len(f) == 24 * 6 for f in meta["frames"])

    def test_parse_rejects_non_avi(self):
        assert mm.parse_avi(b"not riff") is None
        assert mm.parse_avi(mm.make_wav_bytes(b"s")) is None  # RIFF but WAVE

    def test_sample_frames_uses_container_timebase(self, spark):
        avi = mm.make_avi_bytes(b"s2", width=8, height=6, n_frames=10, fps=10)
        media = spark.createDataFrame(
            [(1, bytearray(avi), "video")],
            "media_id long, data binary, modality string",
        )
        rows = sorted(
            mm.sample_frames(media, every_ms=300, max_frames=4).collect(),
            key=lambda r: r["frame_idx"],
        )
        # 10 fps -> 100ms/frame; 300ms sampling -> every 3rd frame
        assert [r["frame_ts_ms"] for r in rows] == [0, 300, 600, 900]
        # md5 is of the REAL frame bytes
        meta = mm.parse_avi(avi)
        import hashlib as _h

        assert rows[0]["frame_md5"] == _h.md5(meta["frames"][0]).hexdigest()

    def test_frame_and_resize_byte_goldens(self, spark):
        """Byte-level pins for the kernels whose catalog entries moved to
        scalar-projection value oracles (r7 — multimodal_frame_sample /
        multimodal_resize): the driver now checks their int contract
        against DuckDB, so the md5-of-actual-bytes signal the old
        rows-only goldens carried is pinned HERE on fixed seeds."""
        import hashlib as _h

        avi = mm.make_avi_bytes(b"golden", width=8, height=6,
                                n_frames=12, fps=10)
        media = spark.createDataFrame(
            [(1, bytearray(avi), "video")],
            "media_id long, data binary, modality string",
        )
        got = sorted(
            (r["frame_idx"], r["frame_ts_ms"], r["frame_md5"])
            for r in mm.sample_frames(media).collect()
        )
        assert got == [
            (0, 0, "5555f06ed0b5bf43aebf2b0d052e78c8"),
            (1, 1000, "282879c00168c6c53f2df49d1a41e987"),
        ]
        bmp = mm.make_bmp_bytes(b"golden", 9, 9)
        med2 = spark.createDataFrame(
            [(1, bytearray(bmp), "image")],
            "media_id long, data binary, modality string",
        )
        r = mm.resize_images(med2).collect()[0]
        assert (r["width"], r["height"], r["n_bytes"]) == (32, 32, 3072)
        assert _h.md5(bytes(r["data"])).hexdigest() == (
            "280261b583b07b72fbe1cd71822f1576"
        )

    def test_decode_feature_goldens(self):
        """Byte-exact pins for the pixel/PCM/luma math whose catalog
        entries moved to header-scalar value oracles (r7 —
        multimodal_{decode,audio,video}_meta): quadrant-luma features
        for both image tiers, the 8-segment RMS envelope, and the
        mean frame luma stay pinned HERE on fixed seeds."""
        import hashlib as _h

        seed = _h.md5(b"golden").digest()
        mb = mm._decode_one(mm.make_bmp_bytes(seed, 9, 9))
        assert [round(x, 6) for x in mb["feature"]] == [
            0.014157, 0.029704, 0.018712, -0.005189,
            -0.014157, -0.029704, -0.018712, 0.005189,
        ]
        mp = mm._decode_one(mm.make_png_bytes(seed, 10, 11))
        assert [round(x, 6) for x in mp["feature"]] == [
            0.031175, 0.122525, 0.031559, -0.107941,
            -0.031175, -0.122525, -0.031559, 0.107941,
        ]
        ma = mm._decode_audio_one(
            mm.make_wav_bytes(seed, n_frames=100, sample_rate=8000)
        )
        assert [round(x, 6) for x in ma["feature"]] == [
            0.635486, 0.359036, 0.544392, 0.479566,
            0.526566, 0.60023, 0.550035, 0.568999,
        ]
        avi = mm.make_avi_bytes(seed, width=8, height=6, n_frames=12, fps=10)
        meta = mm.parse_avi(avi)
        lumas = [
            mm._bgr_frame_luma(f, meta["width"], meta["height"])
            for f in meta["frames"]
        ]
        assert round(sum(lumas) / len(lumas), 6) == 126.593839

    def test_decode_video_real_metadata(self, spark, sf_dir):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(30)
        media = mm.synthesize_real_media(docs).filter("modality = 'video'")
        out = mm.decode_video(media).collect()
        assert out and all(r["format"] == "avi/bgr24" for r in out)
        assert all(r["n_frames"] >= 6 for r in out)
        assert all(0.0 < r["mean_luma"] < 255.0 for r in out)
        assert all(
            r["duration_ms"] == r["n_frames"] * 100 for r in out
        )  # 10 fps


class TestPngDecode:
    """Pure-stdlib PNG tier: make_png_bytes roundtrip + unfiltering."""

    def test_make_png_is_valid_and_sniffable(self):
        from dsacord_spark.multimodal.binary import (
            _sniff_header, make_png_bytes,
        )

        data = make_png_bytes(b"seed", width=9, height=7)
        meta = _sniff_header(data)
        assert meta == {
            "format": "png", "width": 9, "height": 7, "n_channels": 3,
        }

    def test_png_pixel_feature_matches_direct_computation(self):
        from dsacord_spark.multimodal.binary import (
            _png_pixel_feature, make_png_bytes,
        )
        import hashlib as _hl

        w, h = 8, 6
        data = make_png_bytes(b"s2", width=w, height=h)
        feat = _png_pixel_feature(data)
        assert feat is not None and len(feat) == 8
        # recompute from the generator's own pixel stream
        stream = bytearray()
        i = 0
        while len(stream) < w * h * 3:
            stream += _hl.md5(b"s2" + b"png" + i.to_bytes(4, "big")).digest()
            i += 1
        sums, counts = [0.0] * 4, [0] * 4
        for y in range(h):
            qy = 0 if y < h // 2 else 1
            for x in range(w):
                r, g, b = stream[3 * (y * w + x): 3 * (y * w + x) + 3]
                luma = 0.299 * r + 0.587 * g + 0.114 * b
                q = qy * 2 + (0 if x < w // 2 else 1)
                sums[q] += luma
                counts[q] += 1
        want = [(s / c / 255.0) * 2.0 - 1.0 for s, c in zip(sums, counts)]
        want += [-f for f in want]
        assert feat == pytest.approx(want, abs=1e-12)

    def test_png_unfilter_all_five_filter_types(self):
        """Craft a PNG whose five scanlines use filters 0..4 and check the
        decoder reverses each (reference encoding done by hand per the
        PNG spec's filter definitions)."""
        import struct
        import zlib

        from dsacord_spark.multimodal.binary import _png_pixel_feature

        w, h, n_ch = 4, 5, 3
        # target (unfiltered) pixel rows: deterministic ramp
        px = [[(y * 40 + x * 13 + c * 7) % 256 for x in range(w) for c in range(n_ch)]
              for y in range(h)]

        def paeth(a, b, c):
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            return a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)

        raw = bytearray()
        prev = [0] * (w * n_ch)
        for y, ftype in enumerate([0, 1, 2, 3, 4]):
            line = px[y]
            enc = []
            for x in range(w * n_ch):
                left = line[x - n_ch] if x >= n_ch else 0
                up = prev[x]
                ul = prev[x - n_ch] if x >= n_ch else 0
                if ftype == 0:
                    enc.append(line[x])
                elif ftype == 1:
                    enc.append((line[x] - left) & 0xFF)
                elif ftype == 2:
                    enc.append((line[x] - up) & 0xFF)
                elif ftype == 3:
                    enc.append((line[x] - ((left + up) >> 1)) & 0xFF)
                else:
                    enc.append((line[x] - paeth(left, up, ul)) & 0xFF)
            raw.append(ftype)
            raw += bytes(enc)
            prev = line

        def chunk(tag, payload):
            return (struct.pack(">I", len(payload)) + tag + payload
                    + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF))

        data = (b"\x89PNG\r\n\x1a\n"
                + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
                + chunk(b"IDAT", zlib.compress(bytes(raw)))
                + chunk(b"IEND", b""))
        feat = _png_pixel_feature(data)
        assert feat is not None
        sums, counts = [0.0] * 4, [0] * 4
        for y in range(h):
            qy = 0 if y < h // 2 else 1
            for x in range(w):
                r, g, b = px[y][3 * x: 3 * x + 3]
                luma = 0.299 * r + 0.587 * g + 0.114 * b
                q = qy * 2 + (0 if x < w // 2 else 1)
                sums[q] += luma
                counts[q] += 1
        want = [(s / c / 255.0) * 2.0 - 1.0 for s, c in zip(sums, counts)]
        want += [-f for f in want]
        assert feat == pytest.approx(want, abs=1e-12)

    def test_png_rejects_unsupported(self):
        from dsacord_spark.multimodal.binary import _png_pixel_feature

        assert _png_pixel_feature(b"not a png") is None
        # palette png (color type 3) falls back
        import struct
        import zlib

        def chunk(tag, payload):
            return (struct.pack(">I", len(payload)) + tag + payload
                    + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF))

        pal = (b"\x89PNG\r\n\x1a\n"
               + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0))
               + chunk(b"IDAT", zlib.compress(b"\x00\x00\x00\x00\x00\x00"))
               + chunk(b"IEND", b""))
        assert _png_pixel_feature(pal) is None

    def test_synthesized_corpus_contains_both_png_and_bmp(self, spark, sf_dir):
        from dsacord_spark.multimodal.binary import (
            decode_images, synthesize_real_media,
        )
        from dsacord_spark.plans.registry import table

        d = table(spark, sf_dir, "documents")
        media = synthesize_real_media(d)
        fmts = {
            r["format"]
            for r in decode_images(
                media.filter(media["modality"] == "image")
            ).select("format").distinct().collect()
        }
        assert {"png", "bmp"} <= fmts, fmts


# --- perceptual hash (dHash) -------------------------------------------------


def test_dhash_deterministic_and_format_agnostic_content():
    """Same pixels -> same hash on repeated decode; BMP and PNG built
    from the SAME md5 pixel stream hash close to each other only when
    the streams actually match (the builders use different stream salts,
    so these two differ — we assert determinism, not cross-format
    equality)."""
    seed = b"\x01" * 16
    bmp = mm.make_bmp_bytes(seed, width=12, height=10)
    g1 = mm._bmp_luma_grid(bmp, 12, 10)
    g2 = mm._bmp_luma_grid(bmp, 12, 10)
    assert g1 == g2
    assert mm._dhash64(12, 10, g1) == mm._dhash64(12, 10, g2)


def test_dhash_one_pixel_bmp_edit_small_hamming():
    """The perturb_images edit (flip 0x80 in the first pixel's blue
    channel) must move the dHash by only a few bits — the whole premise
    of perceptual dedup."""
    seed = b"\x42" * 16
    bmp = mm.make_bmp_bytes(seed, width=9, height=8)
    off = struct.unpack("<I", bmp[10:14])[0]
    edited = bytearray(bmp)
    edited[off] ^= 0x80
    h0 = mm._dhash64(9, 8, mm._bmp_luma_grid(bmp, 9, 8))
    h1 = mm._dhash64(9, 8, mm._bmp_luma_grid(bytes(edited), 9, 8))
    ham = bin((h0 ^ h1) & ((1 << 64) - 1)).count("1")
    assert ham <= 4, f"one-pixel edit moved {ham} bits"


def test_dhash_unrelated_images_far_apart():
    """Independent random images should disagree on roughly half the 64
    comparison bits — well past any near-dup radius."""
    h = []
    for b in (b"\x07", b"\x99", b"\xee"):
        bmp = mm.make_bmp_bytes(b * 16, width=16, height=16)
        h.append(mm._dhash64(16, 16, mm._bmp_luma_grid(bmp, 16, 16)))
    for i in range(len(h)):
        for j in range(i + 1, len(h)):
            ham = bin((h[i] ^ h[j]) & ((1 << 64) - 1)).count("1")
            assert ham > 10, f"unrelated images at hamming {ham}"


def test_dhash_png_grid_matches_bmp_grid_for_same_pixels():
    """A PNG and BMP encoding the SAME raw RGB rows must produce the
    SAME luma grid (hence the same dHash): pixel decode is
    format-independent. Uses the public builders' layouts directly."""
    w, ht = 6, 4
    rgb = bytes(range(17, 17 + w * ht * 3))  # deterministic RGB rows

    # PNG: filter-0 scanlines of the rgb rows
    def chunk(tag, payload):
        return (
            struct.pack(">I", len(payload)) + tag + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
        )

    raw = bytearray()
    for y in range(ht):
        raw += b"\x00" + rgb[y * w * 3 : (y + 1) * w * 3]
    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, ht, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )
    # BMP: same rows, but stored as BGR with 4-byte row padding
    row_raw = w * 3
    pad = (4 - row_raw % 4) % 4
    body = bytearray()
    for y in range(ht):
        row = rgb[y * row_raw : (y + 1) * row_raw]
        for x in range(w):
            r, g, b = row[3 * x], row[3 * x + 1], row[3 * x + 2]
            body += bytes((b, g, r))
        body += b"\x00" * pad
    header = struct.pack("<2sIHHI", b"BM", 54 + len(body), 0, 0, 54)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, ht, 1, 24, 0, len(body), 2835, 2835, 0, 0
    )
    bmp = header + info + bytes(body)

    gp = mm._png_luma_grid(png)
    gb = mm._bmp_luma_grid(bmp, w, ht)
    assert gp is not None and gb is not None
    assert gp == (w, ht, gb)
    assert mm._dhash64(*gp) == mm._dhash64(w, ht, gb)


def test_image_dhash_dataframe_roundtrip(spark):
    """image_dhash end-to-end through Arrow: hashes survive as exact
    int64 (no float corruption), undecodable bytes yield NULL dhash."""
    bmp = mm.make_bmp_bytes(b"\x33" * 16, width=10, height=9)
    png = mm.make_png_bytes(b"\x44" * 16, width=8, height=8)
    rows = [(1, bmp), (2, png), (3, b"not an image at all")]
    media = spark.createDataFrame(rows, "media_id long, data binary")
    got = {r.media_id: r for r in mm.image_dhash(media).collect()}
    assert got[1].format == "bmp" and got[1].width == 10
    assert got[1].dhash == mm._dhash64(10, 9, mm._bmp_luma_grid(bmp, 10, 9))
    assert got[2].format == "png"
    assert got[2].dhash == mm._dhash64(*mm._png_luma_grid(png))
    assert got[3].dhash is None and got[3].format is None


# --- audio envelope fingerprint ----------------------------------------------


def test_wav_ehash_deterministic_and_sample_edit_small():
    """Envelope hash is stable across decodes; a one-sample TAIL edit
    (outside the 65-segment window for most lengths) moves it by at
    most 2 bits, and the ACTUAL perturb_audio edit (first sample,
    always in-window) is also bounded by 2 bits — pinning the planted
    twins' recoverability at radius 3 directly against the shipped
    perturbation."""
    wav = mm.make_wav_bytes(b"\x21" * 16, n_frames=260)
    h0 = mm._wav_ehash64(wav)
    assert h0 == mm._wav_ehash64(wav)
    edited = bytearray(wav)
    edited[-1] ^= 0x40
    h1 = mm._wav_ehash64(bytes(edited))
    ham = bin((h0 ^ h1) & ((1 << 64) - 1)).count("1")
    assert ham <= 2, f"tail edit moved {ham} bits"
    # the shipped first-sample edit (perturb_audio's byte math)
    i = wav.find(b"data")
    head = bytearray(wav)
    head[i + 9] ^= 0x40
    h2 = mm._wav_ehash64(bytes(head))
    ham2 = bin((h0 ^ h2) & ((1 << 64) - 1)).count("1")
    assert ham2 <= 2, f"first-sample edit moved {ham2} bits"


def test_wav_ehash_unrelated_clips_far_apart():
    """Independent random clips disagree on many comparison bits."""
    h = [
        mm._wav_ehash64(mm.make_wav_bytes(b * 16, n_frames=300))
        for b in (b"\x05", b"\x77", b"\xcd")
    ]
    for i in range(len(h)):
        for j in range(i + 1, len(h)):
            ham = bin((h[i] ^ h[j]) & ((1 << 64) - 1)).count("1")
            assert ham > 10, f"unrelated clips at hamming {ham}"


def test_wav_ehash_rejects_non_wav():
    assert mm._wav_ehash64(b"definitely not a RIFF file") is None
    bmp = mm.make_bmp_bytes(b"\x11" * 16)
    assert mm._wav_ehash64(bmp) is None


def test_audio_ehash_dataframe_roundtrip(spark):
    """audio_ehash end-to-end through Arrow: exact int64 hashes, NULL
    for undecodable rows; perturb_audio only touches RIFF/WAVE bytes."""
    wav = mm.make_wav_bytes(b"\x66" * 16, n_frames=128)
    rows = [(1, wav), (2, b"not audio")]
    media = spark.createDataFrame(rows, "media_id long, data binary")
    got = {r.media_id: r for r in mm.audio_ehash(media).collect()}
    assert got[1].ehash == mm._wav_ehash64(wav)
    assert got[2].ehash is None
    pert = {
        r.media_id: bytes(r.data)
        for r in mm.perturb_audio(media).collect()
    }
    assert pert[1] != wav and len(pert[1]) == len(wav)
    assert pert[2] == b"not audio"


# --- video spatio-temporal fingerprint ---------------------------------------


def test_avi_vhash_deterministic_and_pixel_edit_small():
    """Fingerprint is stable across decodes; a last-byte TAIL edit moves
    it by at most 2 bits, and the ACTUAL perturb_video edit (first pixel
    of the first frame chunk — frame 0 is always among the 8 sampled) is
    also bounded by 2 bits, pinning the planted twins' recoverability at
    radius 3 against the shipped perturbation."""
    avi = mm.make_avi_bytes(b"\x31" * 16, width=8, height=6, n_frames=8)
    h0 = mm._avi_vhash64(avi)
    assert h0 == mm._avi_vhash64(avi)
    edited = bytearray(avi)
    edited[-1] ^= 0x80
    h1 = mm._avi_vhash64(bytes(edited))
    ham = bin((h0 ^ h1) & ((1 << 64) - 1)).count("1")
    assert ham <= 2, f"tail edit moved {ham} bits"
    # the shipped first-frame edit (perturb_video's byte math)
    i = avi.find(b"00db")
    head = bytearray(avi)
    head[i + 8] ^= 0x80
    h2 = mm._avi_vhash64(bytes(head))
    ham2 = bin((h0 ^ h2) & ((1 << 64) - 1)).count("1")
    assert ham2 <= 2, f"first-frame edit moved {ham2} bits"


def test_avi_vhash_unrelated_clips_far_apart():
    h = [
        mm._avi_vhash64(mm.make_avi_bytes(b * 16, width=8, height=6,
                                          n_frames=10))
        for b in (b"\x09", b"\x55", b"\xbb")
    ]
    for i in range(len(h)):
        for j in range(i + 1, len(h)):
            ham = bin((h[i] ^ h[j]) & ((1 << 64) - 1)).count("1")
            assert ham > 10, f"unrelated clips at hamming {ham}"


def test_avi_vhash_rejects_non_avi():
    assert mm._avi_vhash64(b"not a riff container") is None
    assert mm._avi_vhash64(mm.make_wav_bytes(b"\x13" * 16)) is None


def test_video_vhash_dataframe_roundtrip(spark):
    avi = mm.make_avi_bytes(b"\x77" * 16, width=8, height=6, n_frames=7)
    rows = [(1, avi), (2, b"junk bytes")]
    media = spark.createDataFrame(rows, "media_id long, data binary")
    got = {r.media_id: r for r in mm.video_vhash(media).collect()}
    assert got[1].vhash == mm._avi_vhash64(avi)
    assert got[2].vhash is None
    pert = {
        r.media_id: bytes(r.data)
        for r in mm.perturb_video(media).collect()
    }
    assert pert[1] != avi and len(pert[1]) == len(avi)
    assert pert[2] == b"junk bytes"


def test_banded_hamming_pairs_equals_brute_force(spark):
    """The _banded_hamming_pairs contract: with radius <= n_bands - 1 the
    banded join's result EQUALS the brute-force O(n^2) scan. Seeded
    64-bit hashes with planted near pairs (0/1/3-bit edits) and a
    just-outside pair (4 bits, must be excluded by radius 3)."""
    import random

    from dsacord_spark.operators.dedup import banded_hamming_pairs

    rng = random.Random(0xD5AC0)
    hashes = {i: rng.getrandbits(64) for i in range(1, 41)}
    hashes[101] = hashes[1]                                  # 0-bit twin
    hashes[102] = hashes[2] ^ (1 << 7)                       # 1-bit
    hashes[103] = hashes[3] ^ (1 << 0) ^ (1 << 21) ^ (1 << 63)  # 3-bit
    hashes[104] = hashes[4] ^ 0b1111                         # 4-bit: out
    signed = {
        k: v - (1 << 64) if v >= (1 << 63) else v for k, v in hashes.items()
    }
    df = spark.createDataFrame(
        [(k, v) for k, v in signed.items()], "media_id long, h long"
    )
    got = {
        (r.media_id_a, r.media_id_b, r.hamming)
        for r in banded_hamming_pairs(df, "media_id", "h", 4, 3).collect()
    }
    exp = set()
    ids = sorted(hashes)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            ham = bin(hashes[a] ^ hashes[b]).count("1")
            if ham <= 3:
                exp.add((a, b, ham))
    assert (1, 101, 0) in exp and (2, 102, 1) in exp and (3, 103, 3) in exp
    assert not any(a == 4 and b == 104 for a, b, _ in exp)
    assert got == exp


def _brute_pairs(hashes: dict[int, int], radius: int) -> set:
    exp = set()
    ids = sorted(hashes)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            ham = bin(hashes[a] ^ hashes[b]).count("1")
            if ham <= radius:
                exp.add((a, b, ham))
    return exp


def _to_df(spark, hashes: dict[int, int]):
    signed = {
        k: v - (1 << 64) if v >= (1 << 63) else v for k, v in hashes.items()
    }
    return spark.createDataFrame(
        [(k, v) for k, v in signed.items()], "media_id long, h long"
    )


def test_banded_pairs_duplicate_cluster_bounded(spark):
    """r5 verdict #1: a cluster of K byte-identical items (the common
    case dedup exists for) must NOT put K rows into one band bucket.
    With exact-hash pre-grouping the banded join's input is the
    DISTINCT-hash set, so the HASH-level pair stage is provably bounded:
    1,000 identical hashes + 40 distinct ones yield <= C(41,2)
    hash-level candidates (vs ~500k member-level before), while the
    member-level expansion still returns every one of the
    1000*999/2 exact-dup pairs plus the planted near pairs."""
    import random

    from dsacord_spark.operators.dedup import (
        banded_hamming_pairs, banded_hash_pairs,
    )
    from pyspark.sql import functions as F

    rng = random.Random(0xBEEF)
    hashes = {i: rng.getrandbits(64) for i in range(1, 41)}
    hot = rng.getrandbits(64)
    for i in range(1000, 2000):  # the meme cluster: 1,000 identical items
        hashes[i] = hot
    hashes[41] = hot ^ (1 << 13)  # near-dup of the hot hash (hamming 1)
    df = _to_df(spark, hashes).persist()
    # HASH-level stage input == distinct hashes: 40 + hot + near = 42
    uniq = df.select(F.col("h").alias("_h")).distinct()
    assert uniq.count() == 42
    hp = banded_hash_pairs(uniq, "_h", 4, 3, 64).count()
    assert hp <= 42 * 41 // 2  # bounded by C(42,2), never K^2/2
    pairs = banded_hamming_pairs(df, "media_id", "h", 4, 3)
    # PLAN pin (review finding: the hp-count assert above is satisfiable
    # by any implementation handed pre-distinct hashes): the composed
    # joiner itself must feed the banded join from a DISTINCT-hash
    # aggregate — a revert to member-level banding has no
    # HashAggregate(keys=[_h..], functions=[]) node at all
    import re

    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert re.search(
        r"HashAggregate\(keys=\[_h#\d+L?\], functions=\[\]", plan
    ), "banded join is not fed from a distinct-hash aggregate"
    got = {
        (r.media_id_a, r.media_id_b, r.hamming) for r in pairs.collect()
    }
    df.unpersist()
    exp = _brute_pairs(hashes, 3)
    assert len([p for p in exp if p[2] == 0]) >= 1000 * 999 // 2
    assert got == exp


def test_banded_pairs_bucket_cap_bounds_candidates(spark):
    """The per-bucket admission cap: 500 DISTINCT hashes sharing band 0
    (same low 16 bits) form one hot band bucket. With bucket_cap=20 the
    hash-level candidate count is bounded by the capped buckets'
    admission (pairs among <= 20 admitted per bucket), not 500^2/2; the
    admitted subset is deterministic, and uncapped recall stays exact."""
    import random

    from dsacord_spark.operators.dedup import banded_hash_pairs
    from pyspark.sql import functions as F

    rng = random.Random(0xCAFE)
    low16 = 0x5A5A
    hashes = {}
    for i in range(500):
        hashes[i] = (rng.getrandbits(48) << 16) | low16
    df = _to_df(spark, hashes)
    uniq = df.select(F.col("h").alias("_h")).distinct()
    # radius 63 disables the hamming filter: counts candidate pairs
    capped = banded_hash_pairs(uniq, "_h", 64, 63, 64, bucket_cap=20)
    # PLAN pin: the cap must compile to a PARTIAL WindowGroupLimit
    # (map-side top-cap per bucket) — without it the hot bucket's U
    # rows all funnel through one window task, the exact single-task
    # skew the cap exists to survive (review finding)
    import re

    plan = capped._jdf.queryExecution().executedPlan().toString()
    # mode tied to the NODE (ADVICE r6): a Final-only WindowGroupLimit
    # with 'Partial' elsewhere in the plan string must not pass
    assert re.search(r"WindowGroupLimit.*Partial", plan), (
        "bucket-cap admission lost its map-side partial group limit"
    )
    n_capped = capped.count()
    # 64 1-bit bands; the shared band admits 20 -> C(20,2) pairs from it;
    # other bands are random bits (2 buckets each, cap binds at 20 per
    # bucket) -> total far below the uncapped blow-up
    assert n_capped <= 64 * 2 * (20 * 19 // 2)
    # determinism: same admission sample on a re-run
    assert capped.count() == n_capped
    # and a small uncapped run is still exact (recall contract intact)
    small = {k: hashes[k] for k in range(12)}
    sdf = _to_df(spark, small)
    from dsacord_spark.operators.dedup import banded_hamming_pairs

    got = {
        (r.media_id_a, r.media_id_b, r.hamming)
        for r in banded_hamming_pairs(sdf, "media_id", "h", 4, 3).collect()
    }
    assert got == _brute_pairs(small, 3)


def test_banded_pairs_band_shapes_recall_exact(spark):
    """r5 verdict #4 — the band-width knob: recall stays EXACT at
    radius <= n_bands - 1 for BOTH documented shapes, 4x16-bit bands at
    radius 3 and 2x32-bit bands at radius 1 (the multi-billion-item
    regime where 16-bit band values saturate). Seeded corpora with
    planted edits at the radius boundary and just outside it."""
    import random

    from dsacord_spark.operators.dedup import banded_hamming_pairs

    for shape_bands, shape_radius, seed in ((4, 3, 7), (2, 1, 11)):
        rng = random.Random(seed)
        hashes = {i: rng.getrandbits(64) for i in range(1, 31)}
        nid = 100
        for base in (1, 2, 3):
            h = hashes[base]
            for nbits in (shape_radius, shape_radius + 1):  # in / out
                nid += 1
                bits = rng.sample(range(64), nbits)
                x = h
                for b in bits:
                    x ^= 1 << b
                hashes[nid] = x
        hashes[nid + 1] = hashes[4]  # one exact twin
        df = _to_df(spark, hashes)
        got = {
            (r.media_id_a, r.media_id_b, r.hamming)
            for r in banded_hamming_pairs(
                df, "media_id", "h", shape_bands, shape_radius
            ).collect()
        }
        exp = _brute_pairs(hashes, shape_radius)
        assert got == exp, f"shape {shape_bands}x{64 // shape_bands}"
        assert any(p[2] == shape_radius for p in exp)  # boundary hit


def test_wav_ehash_truncated_data_chunk_returns_hash_not_crash():
    """A WAV whose data chunk is cut mid-sample (odd byte count) must
    yield a hash of the whole-sample prefix (or None), never raise —
    one malformed media row must not kill the dedup job (review
    finding: struct.unpack demands an exact-length buffer)."""
    wav = mm.make_wav_bytes(b"\x52" * 16, n_frames=130)
    truncated = wav[:-1]
    h = mm._wav_ehash64(truncated)
    assert h is None or isinstance(h, int)
    # and the hash of the undamaged file still stands
    assert isinstance(mm._wav_ehash64(wav), int)


def test_dhash_invariant_under_affine_luma_transforms():
    """dHash only compares cell-mean ORDER, so any strictly increasing
    AFFINE transform of the luma grid (brightness/contrast shifts — the
    classic edits perceptual hashing must survive) yields the IDENTICAL
    hash: mean(g*v + b) = g*mean(v) + b preserves every comparison for
    g > 0. Checked in EXACT float arithmetic (integer lumas,
    power-of-two gains, integer biases) so near-tie cell means cannot
    flip from rounding and the property holds bit-for-bit forever."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=60, deadline=None)
    @given(
        st.integers(2, 14),
        st.integers(2, 12),
        st.integers(0, 2**32 - 1),
        st.sampled_from([0.25, 0.5, 2.0, 4.0, 8.0]),
        st.integers(-64, 64),
    )
    def check(w, h, seed, gain, bias):
        import random

        rng = random.Random(seed)
        rows = [
            [float(rng.randrange(0, 256)) for _ in range(w)]
            for _ in range(h)
        ]
        scaled = [[gain * v + bias for v in row] for row in rows]
        assert mm._dhash64(w, h, rows) == mm._dhash64(w, h, scaled)

    check()


def test_bucket_cap_never_loses_exact_dup_pairs(spark):
    """Contract: `bucket_cap` bounds only the NEAR-dup candidate stage.
    Exact-duplicate pairs travel through the same-hash equi-join (stage
    1), which never touches band buckets — so even a cap of 1 must
    return every same-hash pair, while the capped result overall stays
    a subset of the uncapped one."""
    import random

    from dsacord_spark.operators.dedup import banded_hamming_pairs

    rng = random.Random(0xD00D)
    hashes = {i: rng.getrandbits(64) for i in range(1, 30)}
    hot = rng.getrandbits(64)
    for i in range(100, 140):  # 40-member exact-dup cluster
        hashes[i] = hot
    hashes[30] = hot ^ (1 << 7)  # one near-dup of the cluster
    df = _to_df(spark, hashes).persist()
    uncapped = {
        (r.media_id_a, r.media_id_b, r.hamming)
        for r in banded_hamming_pairs(df, "media_id", "h", 4, 3).collect()
    }
    capped = {
        (r.media_id_a, r.media_id_b, r.hamming)
        for r in banded_hamming_pairs(
            df, "media_id", "h", 4, 3, bucket_cap=1
        ).collect()
    }
    df.unpersist()
    exact = {p for p in uncapped if p[2] == 0}
    assert len(exact) >= 40 * 39 // 2
    assert exact <= capped  # cap cannot evict same-hash pairs
    assert capped <= uncapped  # cap only ever removes pairs
