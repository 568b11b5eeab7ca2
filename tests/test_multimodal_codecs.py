"""Codec injection: the multimodal pipeline's decode/resize stages are
pluggable — a user-registered decoder (Pillow in a real deployment)
slots in behind the same registry and mapInPandas plumbing as the
deterministic sandbox stub, changing values only, never the plan."""

from __future__ import annotations

import pytest

from d365fo_db_sync_spark.operators import multimodal


def _assets(spark, rows):
    return spark.createDataFrame(
        rows,
        "asset_id long, media_type string, content binary, meta map<string,string>",
    )


def _png_chunk(typ: bytes, data: bytes) -> bytes:
    import zlib

    return (
        len(data).to_bytes(4, "big")
        + typ
        + data
        + (zlib.crc32(typ + data) & 0xFFFFFFFF).to_bytes(4, "big")
    )


def _filter_row(ft: int, row: list[int], prior: list[int], bpp: int) -> bytes:
    """Apply the FORWARD PNG filter (spec section 9) so the decoder's
    reconstruction is verified against an independent implementation."""
    out = []
    for x, v in enumerate(row):
        a = row[x - bpp] if x >= bpp else 0
        b = prior[x]
        c = prior[x - bpp] if x >= bpp else 0
        if ft == 0:
            out.append(v & 0xFF)
        elif ft == 1:
            out.append((v - a) & 0xFF)
        elif ft == 2:
            out.append((v - b) & 0xFF)
        elif ft == 3:
            out.append((v - ((a + b) >> 1)) & 0xFF)
        else:  # Paeth
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            out.append((v - pred) & 0xFF)
    return bytes(out)


def _make_png(w, h, pixels, color_type=2, filters=None, palette=None):
    """Minimal pure-Python PNG writer (truecolor/gray/palette, depth 8)
    with a chosen per-row filter type — independent of the decoder
    under test."""
    import struct
    import zlib

    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color_type]
    rows = []
    for y in range(h):
        row = []
        for x in range(w):
            px = pixels[y][x]
            row.extend(px if isinstance(px, (tuple, list)) else (px,))
        rows.append(row)
    filters = filters or [0] * h
    raw = b""
    prior = [0] * (w * channels)
    for y, row in enumerate(rows):
        ft = filters[y]
        raw += bytes([ft]) + _filter_row(ft, row, prior, channels)
        prior = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    body = _png_chunk(b"IHDR", ihdr)
    if palette is not None:
        body += _png_chunk(b"PLTE", bytes(v for rgb in palette for v in rgb))
    body += _png_chunk(b"IDAT", zlib.compress(raw))
    body += _png_chunk(b"IEND", b"")
    return multimodal.PNG_SIGNATURE + body


def test_custom_codec_injection(spark):
    # a user codec registered for a media type is what decode uses
    def my_codec(content: bytes, media_type: str) -> dict:
        return {
            "width": 111,
            "height": 222,
            "duration_ms": None,
            "feature": [float(len(content))] * 8,
        }

    multimodal.register_codec("image", my_codec)
    try:
        out = multimodal.decode_features(
            _assets(spark, [(1, "image", b"abcd", {})])
        ).collect()
        assert out[0]["width"] == 111 and out[0]["height"] == 222
        assert out[0]["feature"] == [4.0] * 8
        assert out[0]["n_bytes"] == 4
    finally:
        multimodal.register_codec("image", multimodal.fake_codec)


def test_unregistered_media_type_raises(spark):
    multimodal._CODECS.pop("hologram", None)
    df = multimodal.decode_features(_assets(spark, [(1, "hologram", b"x", {})]))
    with pytest.raises(Exception, match="no codec registered"):
        df.collect()


def test_register_default_codecs_reports_live_path():
    chosen = multimodal.register_default_codecs()
    try:
        from PIL import Image  # noqa: F401

        expected = "pillow+raw-formats"
    except ImportError:
        expected = "raw-formats+stub"
    assert chosen == {"image": expected, "audio": "stub", "video": "stub"}
    # the registry is actually populated for all three types
    for mt in ("image", "audio", "video"):
        assert mt in multimodal._CODECS
    # and the registered image codec really decodes PNG: 2x1 white/black
    out = multimodal._CODECS["image"](_make_png(2, 1, [[(255, 255, 255), (0, 0, 0)]]), "image")
    assert (out["width"], out["height"]) == (2, 1)


def test_register_default_codecs_stub_when_real_disabled():
    chosen = multimodal.register_default_codecs(prefer_real=False)
    assert chosen["image"] == "stub"
    assert multimodal._CODECS["image"] is multimodal.fake_codec


def test_pillow_codec_decodes_real_bytes(spark):
    # runs only where Pillow exists (not in this sandbox) — the same
    # pipeline then computes true dimensions from real image bytes
    pytest.importorskip("PIL")
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (20, 10), color=(255, 0, 0)).save(buf, format="PNG")
    multimodal.register_codec("image", multimodal.pillow_image_codec())
    try:
        out = multimodal.decode_features(
            _assets(spark, [(1, "image", buf.getvalue(), {})])
        ).collect()
        assert (out[0]["width"], out[0]["height"]) == (20, 10)
        assert abs(sum(out[0]["feature"]) - 1.0) < 1e-6  # normalized histogram
    finally:
        multimodal.register_codec("image", multimodal.fake_codec)


def test_custom_resampler_injection(spark):
    calls: list[tuple[int, int]] = []

    def resample(content: bytes, w: int, h: int) -> bytes:
        calls.append((w, h))
        return content[::-1]  # visible, deterministic transform

    out = multimodal.resize_images(
        _assets(spark, [(1, "image", b"abcdef", {}), (2, "video", b"zz", {})]),
        width=4,
        height=2,
        resample=resample,
    ).collect()
    assert len(out) == 1  # video row routed away
    assert bytes(out[0]["content"]) == b"fedcba"
    assert out[0]["n_bytes"] == 6


def test_stub_resample_unchanged_default(spark):
    out = multimodal.resize_images(
        _assets(spark, [(1, "image", b"a" * 1000, {})]), width=8, height=8
    ).collect()
    assert out[0]["n_bytes"] == 8  # width*height/8 byte cap


def test_pcm16_codec_real_decode(spark):
    """Raw PCM decodes for real: a pure sine wave's RMS is 1/sqrt(2) of
    its amplitude and the duration follows the sample count."""
    import math

    import numpy as np

    from d365fo_db_sync_spark.operators import multimodal

    sr = 16_000
    t = np.arange(sr)  # exactly one second
    amp = 0.5
    wave = (amp * np.sin(2 * math.pi * 440 * t / sr) * 32768).astype("<i2")
    codec = multimodal.pcm16_audio_codec(sample_rate=sr)
    out = codec(wave.tobytes(), "audio")
    assert out["duration_ms"] == 1000
    assert out["feature"][0] == pytest.approx(amp / math.sqrt(2), rel=1e-3)  # rms
    assert out["feature"][1] == pytest.approx(amp, rel=1e-3)  # peak
    # 440 Hz crosses zero ~880 times/s -> zcr ~ 880/16000
    assert out["feature"][2] == pytest.approx(880 / sr, rel=0.05)
    assert out["feature"][3] == pytest.approx(0.0, abs=1e-3)  # mean
    # silence edge case
    assert codec(b"", "audio")["duration_ms"] == 0


def test_ppm_codec_real_decode(spark):
    """P6 parsing is a real decode: header dims + exact channel means."""
    import numpy as np

    from d365fo_db_sync_spark.operators import multimodal

    w, h = 4, 2
    px = np.zeros((h, w, 3), dtype=np.uint8)
    px[..., 0] = 255  # pure red image
    payload = b"P6\n# a comment\n4 2\n255\n" + px.tobytes()
    out = multimodal.ppm_image_codec()(payload, "image")
    assert (out["width"], out["height"]) == (4, 2)
    assert out["feature"][0] == pytest.approx(1.0)  # mean R
    assert out["feature"][1] == pytest.approx(0.0)  # mean G
    assert out["feature"][2] == pytest.approx(0.0)  # mean B
    # red luminance 0.2126 lands in bin 1 of 5 ([0.2, 0.4))
    assert out["feature"][3 + 1] == pytest.approx(1.0)
    with pytest.raises(ValueError):
        multimodal.ppm_image_codec()(b"JFIF....", "image")


def test_real_codecs_through_distributed_decode(spark):
    """The real codecs run through the same mapInPandas plumbing as the
    stubs — schema contract unchanged, values now physically meaningful."""
    import numpy as np

    from d365fo_db_sync_spark.operators import multimodal

    sr = 16_000
    tone = (0.25 * np.sin(np.linspace(0, 350, sr // 2)) * 32768).astype("<i2")
    px = np.full((3, 5, 3), 128, dtype=np.uint8)
    rows = [
        (1, "audio", bytearray(tone.tobytes()), {}),
        (2, "image", bytearray(b"P6\n5 3\n255\n" + px.tobytes()), {}),
    ]
    assets = spark.createDataFrame(rows, multimodal.ASSET_SCHEMA)
    multimodal.register_codec("audio", multimodal.pcm16_audio_codec(sr))
    multimodal.register_codec("image", multimodal.ppm_image_codec())
    try:
        out = {r["asset_id"]: r for r in multimodal.decode_features(assets).collect()}
    finally:
        multimodal.register_default_codecs(prefer_real=False)
    assert out[1]["duration_ms"] == 500
    assert (out[2]["width"], out[2]["height"]) == (5, 3)
    assert out[2]["feature"][0] == pytest.approx(128 / 255, rel=1e-3)


# ------------------------------------------------------------ WAV (RIFF)


def _make_wav(samples, rate=8000, channels=1):
    import io
    import struct
    import wave

    bio = io.BytesIO()
    with wave.open(bio, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(struct.pack(f"<{len(samples)}h", *samples))
    return bio.getvalue()


class TestWavCodec:
    def test_header_rate_drives_duration(self):
        from d365fo_db_sync_spark.operators.multimodal import wav_audio_codec

        codec = wav_audio_codec()
        out = codec(_make_wav([0] * 4000, rate=8000), "audio")
        assert out["duration_ms"] == 500  # 4000 frames @ 8 kHz
        out2 = codec(_make_wav([0] * 4000, rate=16000), "audio")
        assert out2["duration_ms"] == 250  # same frames, true rate honored

    def test_mono_features_match_pcm16_codec(self):
        from d365fo_db_sync_spark.operators.multimodal import (
            pcm16_audio_codec,
            wav_audio_codec,
        )
        import struct

        samples = [int(10_000 * ((i % 64) / 32.0 - 1.0)) for i in range(16_000)]
        wav = wav_audio_codec()(_make_wav(samples, rate=16000), "audio")
        raw = pcm16_audio_codec(16_000)(
            struct.pack(f"<{len(samples)}h", *samples), "audio"
        )
        assert wav["feature"] == raw["feature"]
        assert wav["duration_ms"] == raw["duration_ms"]

    def test_stereo_mono_mixes(self):
        from d365fo_db_sync_spark.operators.multimodal import wav_audio_codec

        # L = +1000, R = -1000 everywhere -> mono mix is exactly zero
        inter = [1000, -1000] * 2000
        out = wav_audio_codec()(_make_wav(inter, rate=8000, channels=2), "audio")
        assert out["feature"][0] == 0.0  # rms of the mix
        assert out["duration_ms"] == 250  # 2000 frames @ 8 kHz

    def test_rejects_non_wav_and_compressed(self):
        import pytest

        from d365fo_db_sync_spark.operators.multimodal import wav_audio_codec

        codec = wav_audio_codec()
        with pytest.raises(ValueError):
            codec(b"not riff at all", "audio")
        # wFormatTag=7 (mu-law): loud rejection, not a silent mis-decode
        bad = bytearray(_make_wav([0] * 100))
        fmt_at = bad.find(b"fmt ") + 8
        bad[fmt_at : fmt_at + 2] = (7).to_bytes(2, "little")
        with pytest.raises(ValueError):
            codec(bytes(bad), "audio")

    def test_skips_unknown_chunks(self):
        from d365fo_db_sync_spark.operators.multimodal import wav_audio_codec

        wav = bytearray(_make_wav([100] * 50, rate=8000))
        # splice an unknown odd-sized chunk between header and fmt
        extra = b"LIST" + (5).to_bytes(4, "little") + b"abcde" + b"\x00"
        spliced = wav[:12] + extra + wav[12:]
        spliced[4:8] = (len(spliced) - 8).to_bytes(4, "little")
        out = wav_audio_codec()(bytes(spliced), "audio")
        assert out["duration_ms"] == round(50 * 1000 / 8000)

    def test_extensible_pcm_accepted(self):
        from d365fo_db_sync_spark.operators.multimodal import wav_audio_codec

        wav = bytearray(_make_wav([500] * 400, rate=8000))
        fmt_at = wav.find(b"fmt ")
        size_at = fmt_at + 4
        old_size = int.from_bytes(wav[size_at : size_at + 4], "little")
        # rebuild as WAVE_FORMAT_EXTENSIBLE: tag 0xFFFE, cbSize=22,
        # SubFormat leading tag = 1 (PCM)
        body = bytearray(wav[fmt_at + 8 : fmt_at + 8 + old_size])
        body[0:2] = (0xFFFE).to_bytes(2, "little")
        ext = (22).to_bytes(2, "little")
        ext += (16).to_bytes(2, "little")  # valid bits
        ext += (0).to_bytes(4, "little")  # channel mask
        ext += (1).to_bytes(2, "little") + bytes(14)  # SubFormat GUID: PCM
        new_body = bytes(body[:16]) + ext
        rebuilt = (
            bytes(wav[:size_at])
            + len(new_body).to_bytes(4, "little")
            + new_body
            + bytes(wav[fmt_at + 8 + old_size :])
        )
        rebuilt = bytearray(rebuilt)
        rebuilt[4:8] = (len(rebuilt) - 8).to_bytes(4, "little")
        out = wav_audio_codec()(bytes(rebuilt), "audio")
        assert out["duration_ms"] == round(400 * 1000 / 8000)
        # features equal the plain-PCM parse of the same samples
        plain = wav_audio_codec()(_make_wav([500] * 400, rate=8000), "audio")
        assert out["feature"] == plain["feature"]


class TestPngCodec:
    """PNG decodes for REAL with stdlib zlib: filter reconstruction,
    all five color types, palette lookup — verified against an
    independent pure-Python encoder (forward filters applied per the
    spec in _filter_row, not by the decoder's own math)."""

    def _codec(self):
        return multimodal.png_image_codec()

    def test_true_dims_and_channel_means(self):
        # 4x2 solid-ish image: 6 red, 2 blue pixels
        pix = [
            [(255, 0, 0)] * 4,
            [(255, 0, 0), (255, 0, 0), (0, 0, 255), (0, 0, 255)],
        ]
        out = self._codec()(_make_png(4, 2, pix), "image")
        assert (out["width"], out["height"]) == (4, 2)
        assert abs(sum(out["feature"]) - 1.0) < 1e-9  # normalized histogram
        # red lum = 76, blue lum = 29 -> bins 2 and 0 of 8
        assert out["feature"][2] == 6 / 8 and out["feature"][0] == 2 / 8

    def test_all_filter_types_reconstruct(self):
        """Every row uses a different forward filter (None, Sub, Up,
        Average, Paeth); a gradient makes the filters non-trivial. The
        decoder must reconstruct the exact luminance histogram a
        filter-0 encoding of the same pixels yields."""
        w, h = 8, 5
        pix = [
            [((x * 37 + y * 11) % 256, (x * 5) % 256, (y * 73) % 256) for x in range(w)]
            for y in range(h)
        ]
        plain = self._codec()(_make_png(w, h, pix, filters=[0] * h), "image")
        filtered = self._codec()(
            _make_png(w, h, pix, filters=[0, 1, 2, 3, 4]), "image"
        )
        assert filtered == plain

    def test_grayscale_and_palette(self):
        gray = self._codec()(
            _make_png(3, 1, [[0, 128, 255]], color_type=0), "image"
        )
        assert (gray["width"], gray["height"]) == (3, 1)
        assert gray["feature"][0] == gray["feature"][4] == gray["feature"][7] == 1 / 3
        pal = self._codec()(
            _make_png(
                3,
                1,
                [[0, 1, 0]],
                color_type=3,
                palette=[(255, 255, 255), (0, 0, 0)],
            ),
            "image",
        )
        assert pal["feature"][7] == 2 / 3 and pal["feature"][0] == 1 / 3

    def test_rejects_what_it_cannot_decode(self):
        with pytest.raises(ValueError, match="not a PNG"):
            self._codec()(b"JFIF...", "image")
        import struct
        import zlib

        # 16-bit depth header: rejected loudly
        ihdr = struct.pack(">IIBBBBB", 1, 1, 16, 2, 0, 0, 0)
        buf = (
            multimodal.PNG_SIGNATURE
            + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(b"\x00" * 7))
            + _png_chunk(b"IEND", b"")
        )
        with pytest.raises(ValueError, match="bit depth"):
            self._codec()(buf, "image")

    def test_auto_codec_sniffs_and_falls_back(self, spark):
        """The registered default image codec routes PNG payloads to the
        real decoder and non-media payloads to the stub, inside one
        mapInPandas pass."""
        multimodal.register_default_codecs()
        try:
            png_bytes = _make_png(5, 3, [[(9, 9, 9)] * 5] * 3)
            out = {
                r["asset_id"]: r
                for r in multimodal.decode_features(
                    _assets(
                        spark,
                        [(1, "image", png_bytes, {}), (2, "image", b"plain text", {})],
                    )
                ).collect()
            }
            assert (out[1]["width"], out[1]["height"]) == (5, 3)
            stub = multimodal.fake_codec(b"plain text", "image")
            assert (out[2]["width"], out[2]["height"]) == (
                stub["width"],
                stub["height"],
            )
        finally:
            multimodal.register_codec("image", multimodal.fake_codec)

    def test_pillow_parity_when_available(self):
        pytest.importorskip("PIL")
        import io

        from PIL import Image

        pix = [[(x * 30 % 256, 50, y * 40 % 256) for x in range(6)] for y in range(4)]
        png_bytes = _make_png(6, 4, pix)
        img = Image.open(io.BytesIO(png_bytes))
        assert (img.width, img.height) == (6, 4)
        ours = self._codec()(png_bytes, "image")
        assert (ours["width"], ours["height"]) == (6, 4)


def _lzw_encode(indices, min_code_size):
    """Independent FORWARD GIF-LZW encoder (spec appendix F, encoder
    side): dictionary build + variable code width LSB-first packing —
    so the decoder is verified against spec math, not its own."""
    clear = 1 << min_code_size
    end = clear + 1
    width = min_code_size + 1
    table = {(i,): i for i in range(clear)}
    next_code = end + 1
    buf = bytearray()
    acc = 0
    nbits = 0

    def emit(code):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            buf.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    prev = ()
    for px in indices:
        cand = prev + (px,)
        if cand in table:
            prev = cand
            continue
        emit(table[prev])
        table[cand] = next_code
        next_code += 1
        if next_code == (1 << width) + 1 and width < 12:
            width += 1
        prev = (px,)
    if prev:
        emit(table[prev])
    emit(end)
    if nbits:
        buf.append(acc & 0xFF)
    return bytes(buf)


def _sub_blocks(data):
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def _make_gif(w, h, rows, palette, interlaced=False, extra_frames=(), delays=()):
    """Minimal GIF89a writer: global palette, optional interlace row
    reordering, optional extra frames with Graphic Control delays
    (units of 1/100 s)."""
    import struct

    bits = max(2, (len(palette) - 1).bit_length())
    pal = bytearray()
    for r, g, b in palette:
        pal += bytes((r, g, b))
    pal += b"\x00" * (3 * ((1 << bits) - len(palette)))
    packed = 0x80 | (bits - 1)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, packed, 0, 0)
    out += pal

    def frame(rows_, delay=None):
        buf = bytearray()
        if delay is not None:
            buf += b"\x21\xf9"
            buf += _sub_blocks(struct.pack("<BHB", 0, delay, 0))
        lp = 0x40 if interlaced else 0
        buf += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, lp)
        stored = rows_
        if interlaced:
            order = [
                r
                for start, step in ((0, 8), (4, 8), (2, 4), (1, 2))
                for r in range(start, h, step)
            ]
            stored = [rows_[r] for r in order]
        flat = [px for row in stored for px in row]
        mcs = bits
        buf.append(mcs)
        buf += _sub_blocks(_lzw_encode(flat, mcs))
        return buf

    delays = list(delays) + [None] * (1 + len(extra_frames) - len(delays))
    out += frame(rows, delays[0])
    for k, fr in enumerate(extra_frames):
        out += frame(fr, delays[k + 1])
    out += b"\x3b"
    return bytes(out)


class TestGifCodec:
    """GIF decodes for REAL in pure stdlib: full LZW (variable width,
    CLEAR/END, KwKwK), palettes, interlace, animation walking —
    verified against an independent forward LZW encoder."""

    _PAL = [(255, 0, 0), (0, 0, 255), (255, 255, 255), (0, 0, 0)]

    def _codec(self):
        return multimodal.gif_image_codec()

    def test_dims_palette_and_histogram(self):
        # 4x2: 6 red (lum 76 -> bin 2), 2 blue (lum 29 -> bin 0)
        rows = [[0, 0, 0, 0], [0, 0, 1, 1]]
        out = self._codec()(_make_gif(4, 2, rows, self._PAL), "image")
        assert (out["width"], out["height"]) == (4, 2)
        assert out["duration_ms"] is None  # still image
        assert abs(sum(out["feature"]) - 1.0) < 1e-9
        assert out["feature"][2] == 6 / 8 and out["feature"][0] == 2 / 8

    def test_lzw_dictionary_growth_roundtrip(self):
        """A 32x16 patterned frame forces the LZW table through several
        width increments; decode must reproduce the exact per-color
        counts (each palette color in its own luminance bin)."""
        w, h = 32, 16
        rows = [[(x * y + x // 3) % 4 for x in range(w)] for y in range(h)]
        out = self._codec()(_make_gif(w, h, rows, self._PAL), "image")
        import collections

        counts = collections.Counter(px for row in rows for px in row)
        n = w * h
        # luminance bins: red 76 -> bin 2, white 255 -> bin 7,
        # blue 29 and black 0 -> bin 0 (shared)
        assert out["feature"][2] == counts[0] / n
        assert out["feature"][7] == counts[2] / n
        assert out["feature"][0] == (counts[1] + counts[3]) / n

    def test_interlaced_matches_progressive(self):
        w, h = 8, 9
        rows = [[(x + y) % 4 for x in range(w)] for y in range(h)]
        plain = self._codec()(_make_gif(w, h, rows, self._PAL), "image")
        inter = self._codec()(
            _make_gif(w, h, rows, self._PAL, interlaced=True), "image"
        )
        assert inter == plain

    def test_animated_duration_sums_gce_delays(self):
        rows = [[0, 1], [2, 3]]
        out = self._codec()(
            _make_gif(
                2,
                2,
                rows,
                self._PAL,
                extra_frames=[[[1, 1], [1, 1]], [[2, 2], [2, 2]]],
                delays=[10, 20, 5],  # 1/100 s units -> 350 ms total
            ),
            "image",
        )
        assert out["duration_ms"] == 350

    def test_rejects_garbage(self):
        with pytest.raises(ValueError, match="not a GIF"):
            self._codec()(b"NOTAGIF", "image")
        with pytest.raises(ValueError, match="no image data"):
            self._codec()(b"GIF89a" + b"\x02\x00\x02\x00\x00\x00\x00" + b"\x3b", "image")

    def test_auto_codec_sniffs_gif(self, spark):
        multimodal.register_default_codecs()
        try:
            gif_bytes = _make_gif(5, 3, [[2] * 5] * 3, self._PAL)
            out = {
                r["asset_id"]: r
                for r in multimodal.decode_features(
                    _assets(spark, [(1, "image", gif_bytes, {})])
                ).collect()
            }
            assert (out[1]["width"], out[1]["height"]) == (5, 3)
            assert out[1]["feature"][7] == 1.0  # all white
        finally:
            multimodal.register_codec("image", multimodal.fake_codec)

    def test_pillow_parity_when_available(self):
        pytest.importorskip("PIL")
        import io

        from PIL import Image

        rows = [[(x + y) % 4 for x in range(6)] for y in range(4)]
        gif_bytes = _make_gif(6, 4, rows, self._PAL)
        img = Image.open(io.BytesIO(gif_bytes)).convert("RGB")
        assert (img.width, img.height) == (6, 4)
        import numpy as np

        rgb = np.asarray(img)
        lum = (
            rgb[..., 0].astype(np.int64) * 299
            + rgb[..., 1].astype(np.int64) * 587
            + rgb[..., 2].astype(np.int64) * 114
        ) // 1000
        hist, _ = np.histogram(lum, bins=8, range=(0, 256))
        ours = self._codec()(gif_bytes, "image")["feature"]
        assert ours == (hist / lum.size).tolist()
