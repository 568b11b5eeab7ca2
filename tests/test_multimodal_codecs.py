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


# ---------------------------------------------------------------------------
# Independent baseline JPEG forward encoder (test-side verification rig).
# Everything below is written from ITU T.81 directly — double-loop reference
# FDCT/IDCT, its own canonical Huffman code assignment, its own bit writer
# with byte stuffing and restart markers — sharing NO code with the decoder,
# so any decoder-side parsing/entropy/placement error breaks pixel equality.
# ---------------------------------------------------------------------------

_ENC_ZZ = (
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
)

# ITU T.81 Annex K example quantization tables (natural order)
_ENC_QLUM = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]
_ENC_QCHR = [
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
] + [99] * 32


def _enc_fdct(block):
    """Reference double-loop forward DCT (T.81 A.3.3)."""
    import math

    import numpy as np

    out = np.zeros((8, 8))
    for u in range(8):
        for v in range(8):
            s = 0.0
            for x in range(8):
                for y in range(8):
                    s += (
                        block[x, y]
                        * math.cos((2 * x + 1) * u * math.pi / 16)
                        * math.cos((2 * y + 1) * v * math.pi / 16)
                    )
            cu = 1 / math.sqrt(2) if u == 0 else 1.0
            cv = 1 / math.sqrt(2) if v == 0 else 1.0
            out[u, v] = 0.25 * cu * cv * s
    return out


def _enc_idct(coeffs):
    """Reference double-loop inverse DCT (T.81 A.3.3)."""
    import math

    import numpy as np

    out = np.zeros((8, 8))
    for x in range(8):
        for y in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    cu = 1 / math.sqrt(2) if u == 0 else 1.0
                    cv = 1 / math.sqrt(2) if v == 0 else 1.0
                    s += (
                        cu
                        * cv
                        * coeffs[u, v]
                        * math.cos((2 * x + 1) * u * math.pi / 16)
                        * math.cos((2 * y + 1) * v * math.pi / 16)
                    )
            out[x, y] = 0.25 * s
    return out


# Huffman specs: 12 DC categories at length 4; the 162 standard AC
# (run, size) symbols plus EOB/ZRL all at length 8 (Kraft-feasible,
# trivially canonical — tables are carried in the file, so simple ones
# are as legal as Annex K's)
_ENC_DC_COUNTS = [0, 0, 0, 12] + [0] * 12
_ENC_DC_SYMS = list(range(12))
_ENC_AC_SYMS = [0x00, 0xF0] + [
    (r << 4) | s for r in range(16) for s in range(1, 11)
]
_ENC_AC_COUNTS = [0] * 7 + [len(_ENC_AC_SYMS)] + [0] * 8


def _enc_codes(counts, symbols):
    codes, code, k = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(counts[ln - 1]):
            codes[symbols[k]] = (code, ln)
            k += 1
            code += 1
        code <<= 1
    return codes


class _EncBits:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code, length):
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                b = self.acc & 0xFF
                self.out.append(b)
                if b == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def pad(self):
        while self.n:
            self.put(1, 1)


def _enc_category(v):
    return int(v).bit_length() if v else 0


def _enc_magnitude(v, s):
    return v if v >= 0 else v + (1 << s) - 1


def _enc_block_bits(w, qcoef_zz, pred, dc_codes, ac_codes):
    diff = int(qcoef_zz[0]) - pred
    s = _enc_category(abs(diff))
    c, ln = dc_codes[s]
    w.put(c, ln)
    if s:
        w.put(_enc_magnitude(diff, s), s)
    run = 0
    last_nz = 0
    for k in range(1, 64):
        if qcoef_zz[k]:
            last_nz = k
    for k in range(1, last_nz + 1):
        v = int(qcoef_zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            c, ln = ac_codes[0xF0]
            w.put(c, ln)
            run -= 16
        s = _enc_category(abs(v))
        c, ln = ac_codes[(run << 4) | s]
        w.put(c, ln)
        w.put(_enc_magnitude(v, s), s)
        run = 0
    if last_nz < 63:
        c, ln = ac_codes[0x00]
        w.put(c, ln)
    return int(qcoef_zz[0])


def _enc_seg(marker, payload):
    return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") + payload


def encode_baseline_jpeg(pixels, subsample=False, restart=0, dqt16=False):
    """Encode an H x W (grayscale) or H x W x 3 (RGB) uint8 array as a
    baseline JPEG; returns (jpeg_bytes, expected_pixels) where expected
    is the encoder's OWN reconstruction (dequant -> reference IDCT ->
    level shift -> box upsample -> YCbCr->RGB), i.e. what a correct
    decoder must produce. ``subsample=True`` emits 4:2:0; ``restart``
    inserts DRI/RSTn every that many MCUs; ``dqt16`` stores the quant
    tables with 16-bit precision (pq=1)."""
    import numpy as np

    gray = pixels.ndim == 2
    h, w = pixels.shape[:2]
    qlum = np.array(_ENC_QLUM).reshape(8, 8)
    qchr = np.array(_ENC_QCHR).reshape(8, 8)
    if gray:
        comps = [{"id": 1, "h": 1, "v": 1, "tq": 0, "q": qlum, "plane": pixels.astype(np.float64)}]
    else:
        p = pixels.astype(np.float64)
        y = 0.299 * p[..., 0] + 0.587 * p[..., 1] + 0.114 * p[..., 2]
        cb = 128 - 0.168736 * p[..., 0] - 0.331264 * p[..., 1] + 0.5 * p[..., 2]
        cr = 128 + 0.5 * p[..., 0] - 0.418688 * p[..., 1] - 0.081312 * p[..., 2]
        if subsample:
            # box-mean 2x2 after edge-padding to even dims
            def box(c):
                ph = c if h % 2 == 0 else np.vstack([c, c[-1:]])
                pw = ph if w % 2 == 0 else np.hstack([ph, ph[:, -1:]])
                return (
                    pw[0::2, 0::2] + pw[1::2, 0::2] + pw[0::2, 1::2] + pw[1::2, 1::2]
                ) / 4.0

            cb, cr = box(cb), box(cr)
            sf = [(2, 2), (1, 1), (1, 1)]
        else:
            sf = [(1, 1), (1, 1), (1, 1)]
        comps = [
            {"id": 1, "h": sf[0][0], "v": sf[0][1], "tq": 0, "q": qlum, "plane": y},
            {"id": 2, "h": sf[1][0], "v": sf[1][1], "tq": 1, "q": qchr, "plane": cb},
            {"id": 3, "h": sf[2][0], "v": sf[2][1], "tq": 1, "q": qchr, "plane": cr},
        ]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcx = -(-w // (8 * hmax))
    mcy = -(-h // (8 * vmax))

    # pad each plane to its MCU grid by edge replication, FDCT+quantize
    for c in comps:
        pl = c["plane"]
        th, tw = mcy * c["v"] * 8, mcx * c["h"] * 8
        pl = np.pad(pl, ((0, th - pl.shape[0]), (0, tw - pl.shape[1])), mode="edge")
        qs = {}
        recon = np.zeros_like(pl)
        for by in range(th // 8):
            for bx in range(tw // 8):
                blk = pl[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                qc = np.round(_enc_fdct(blk - 128.0) / c["q"]).astype(np.int64)
                qs[(by, bx)] = qc
                rec = _enc_idct(qc * c["q"])
                recon[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = np.clip(
                    np.round(rec) + 128, 0, 255
                )
        c["qblocks"] = qs
        c["recon"] = recon

    # expected pixels: box-upsample recon planes, crop, color convert
    ups = []
    for c in comps:
        r = c["recon"]
        if c["v"] != vmax:
            r = np.repeat(r, vmax // c["v"], axis=0)
        if c["h"] != hmax:
            r = np.repeat(r, hmax // c["h"], axis=1)
        ups.append(r[:h, :w])
    if gray:
        expected = ups[0].astype(np.int64)
    else:
        yy, cbb, crr = ups
        rr = yy + 1.402 * (crr - 128)
        gg = yy - 0.344136 * (cbb - 128) - 0.714136 * (crr - 128)
        bb = yy + 1.772 * (cbb - 128)
        expected = np.clip(np.round(np.stack([rr, gg, bb], axis=-1)), 0, 255).astype(
            np.int64
        )

    # entropy-code the MCU stream
    dc_codes = _enc_codes(_ENC_DC_COUNTS, _ENC_DC_SYMS)
    ac_codes = _enc_codes(_ENC_AC_COUNTS, _ENC_AC_SYMS)
    wtr = _EncBits()
    entropy = bytearray()
    preds = {c["id"]: 0 for c in comps}
    mcu = 0
    rst = 0
    for my in range(mcy):
        for mx in range(mcx):
            if restart and mcu and mcu % restart == 0:
                wtr.pad()
                entropy += wtr.out
                entropy += bytes([0xFF, 0xD0 + (rst % 8)])
                rst += 1
                wtr = _EncBits()
                preds = {c["id"]: 0 for c in comps}
            for c in comps:
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        qc = c["qblocks"][(my * c["v"] + by, mx * c["h"] + bx)]
                        flat = qc.reshape(-1)
                        zzc = [flat[_ENC_ZZ[k]] for k in range(64)]
                        preds[c["id"]] = _enc_block_bits(
                            wtr, zzc, preds[c["id"]], dc_codes, ac_codes
                        )
            mcu += 1
    wtr.pad()
    entropy += wtr.out

    # assemble the file
    out = bytearray(b"\xff\xd8")
    for tq, q in ((0, qlum), (1, qchr)) if not gray else ((0, qlum),):
        zzq = [int(q.reshape(-1)[_ENC_ZZ[k]]) for k in range(64)]
        if dqt16:
            body = bytes([0x10 | tq]) + b"".join(v.to_bytes(2, "big") for v in zzq)
        else:
            body = bytes([tq]) + bytes(zzq)
        out += _enc_seg(0xDB, body)
    sof = bytearray([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
    sof.append(len(comps))
    for c in comps:
        sof += bytes([c["id"], (c["h"] << 4) | c["v"], c["tq"]])
    out += _enc_seg(0xC0, bytes(sof))
    for tc_th in ([(0, 0), (1, 0)] if gray else [(0, 0), (1, 0), (0, 1), (1, 1)]):
        tc, th = tc_th
        counts = _ENC_DC_COUNTS if tc == 0 else _ENC_AC_COUNTS
        syms = _ENC_DC_SYMS if tc == 0 else _ENC_AC_SYMS
        out += _enc_seg(
            0xC4, bytes([(tc << 4) | th]) + bytes(counts) + bytes(syms)
        )
    if restart:
        out += _enc_seg(0xDD, restart.to_bytes(2, "big"))
    sos = bytearray([len(comps)])
    for c in comps:
        tbl = 0 if c["id"] == 1 else 1
        sos += bytes([c["id"], (tbl << 4) | tbl])
    sos += bytes([0, 63, 0])
    out += _enc_seg(0xDA, bytes(sos))
    out += entropy
    out += b"\xff\xd9"
    return bytes(out), expected


class TestJpegCodec:
    """Baseline JPEG decoder vs the independent forward encoder above:
    pixel-level agreement (<=1 quantized-rounding ulp, since the two
    sides use independently-written IDCTs) across grayscale, 4:4:4,
    4:2:0 with odd dimensions, restart intervals, and 16-bit DQT."""

    def _decode_px(self, payload):
        from d365fo_db_sync_spark.operators.multimodal import jpeg_decode_pixels

        return jpeg_decode_pixels(payload)

    def _check(self, pixels, **enc_kw):
        import numpy as np

        payload, expected = encode_baseline_jpeg(pixels, **enc_kw)
        got = self._decode_px(payload)
        assert got.shape == expected.shape
        diff = np.abs(got - expected)
        assert diff.max() <= 1, (diff.max(), (diff > 0).mean())
        # off-by-one only at float rounding boundaries — must be rare
        assert (diff > 0).mean() < 0.02

    def _rand(self, shape, seed):
        import numpy as np

        return np.random.RandomState(seed).randint(0, 256, shape).astype(np.uint8)

    def test_grayscale_roundtrip(self):
        self._check(self._rand((17, 24), 1))

    def test_rgb_444_roundtrip(self):
        self._check(self._rand((16, 16, 3), 2))

    def test_rgb_420_odd_dims_roundtrip(self):
        # odd width AND height: exercises chroma box subsampling,
        # MCU padding, pixel-replication upsampling, and the crop
        self._check(self._rand((13, 21, 3), 3), subsample=True)

    def test_restart_intervals_reset_predictors(self):
        # 4 MCUs wide x 2 tall at 4:2:0, restart every 2 MCUs -> 3
        # RST markers, each segment decoding with fresh DC predictors
        self._check(self._rand((32, 64, 3), 4), subsample=True, restart=2)

    def test_16bit_quant_tables(self):
        self._check(self._rand((16, 8, 3), 5), dqt16=True)

    def test_smooth_gradient_heavy_eob(self):
        import numpy as np

        # a smooth ramp quantizes to near-all-zero AC -> EOB-dominated
        # stream, the opposite entropy regime from random noise
        g = np.clip(
            np.add.outer(np.arange(24) * 3, np.arange(40) * 2), 0, 255
        ).astype(np.uint8)
        self._check(g)

    def test_codec_feature_contract(self):
        import numpy as np

        from d365fo_db_sync_spark.operators.multimodal import jpeg_image_codec

        payload, expected = encode_baseline_jpeg(self._rand((16, 16, 3), 6))
        feat = jpeg_image_codec()(payload, "image")
        assert feat["width"] == 16 and feat["height"] == 16
        assert feat["duration_ms"] is None
        assert len(feat["feature"]) == 8
        assert abs(sum(feat["feature"]) - 1.0) < 1e-9
        # histogram agrees with one computed from the expected pixels
        lum = (
            expected[..., 0] * 299 + expected[..., 1] * 587 + expected[..., 2] * 114
        ) // 1000
        want, _ = np.histogram(lum, bins=8, range=(0, 256))
        got = np.array(feat["feature"]) * lum.size
        assert np.abs(got - want).max() <= 3  # <=1-ulp pixels near bin edges

    def test_rejects_what_it_cannot_decode(self):
        import numpy as np

        from d365fo_db_sync_spark.operators.multimodal import jpeg_image_codec

        codec = jpeg_image_codec()
        with pytest.raises(ValueError, match="not a JPEG"):
            codec(b"\x89PNG1234", "image")
        payload, _ = encode_baseline_jpeg(self._rand((8, 8), 7))
        # flip SOF0 -> SOF2: progressive must be refused, not garbled
        prog = payload.replace(b"\xff\xc0", b"\xff\xc2", 1)
        with pytest.raises(ValueError, match="baseline"):
            codec(prog, "image")
        with pytest.raises(ValueError):
            codec(payload[: len(payload) // 2], "image")  # truncated

    def test_auto_codec_sniffs_jpeg(self, spark):
        from d365fo_db_sync_spark.operators import multimodal

        payload, _ = encode_baseline_jpeg(self._rand((9, 11), 8))
        multimodal.register_codec("image", multimodal.auto_image_codec())
        try:
            df = multimodal.decode_features(
                _assets(spark, [(1, "image", bytearray(payload), {})])
            )
            row = df.collect()[0]
            assert (row["width"], row["height"]) == (11, 9)
        finally:
            multimodal.register_default_codecs()

    def test_pillow_parity_when_available(self):
        import numpy as np

        PIL = pytest.importorskip("PIL")
        del PIL
        import io

        from PIL import Image

        from d365fo_db_sync_spark.operators.multimodal import jpeg_decode_pixels

        payload, _ = encode_baseline_jpeg(self._rand((16, 16, 3), 9))
        ours = jpeg_decode_pixels(payload)
        ref = np.asarray(Image.open(io.BytesIO(payload)).convert("RGB")).astype(
            np.int64
        )
        # libjpeg uses smoothing-free 4:4:4 here; small IDCT rounding
        # differences are expected, gross mismatches are not
        assert np.abs(ours - ref).max() <= 2


class TestDcJpegEncoder:
    """encode_dc_jpeg: the DC-only staging encoder. Verified against
    the production DECODER (the decoder itself is pinned against the
    independent full forward encoder above — this class checks the
    staging twin rides the same verified path) and against the
    closed-form contract pixel == 2*dc + 128 at quant 16."""

    def test_flat_blocks_decode_to_closed_form(self):
        import numpy as np

        from d365fo_db_sync_spark.operators.multimodal import (
            encode_dc_jpeg,
            jpeg_decode_pixels,
        )

        dcs = [0, 31, -32, 7, -1, 16]
        px = jpeg_decode_pixels(encode_dc_jpeg(dcs, 3))
        assert px.shape == (16, 24)
        exp = np.zeros((16, 24), dtype=np.int64)
        for i, dc in enumerate(dcs):
            r, c = divmod(i, 3)
            exp[r * 8 : r * 8 + 8, c * 8 : c * 8 + 8] = 2 * dc + 128
        assert (px == exp).all()

    def test_quant_scales_the_flat_value(self):
        from d365fo_db_sync_spark.operators.multimodal import (
            encode_dc_jpeg,
            jpeg_decode_pixels,
        )

        px = jpeg_decode_pixels(encode_dc_jpeg([4], 1, quant=8))
        assert (px == 4 * 8 // 8 + 128).all()  # dc*q/8 + 128

    def test_extreme_dc_swings_roundtrip(self):
        """Max-category DC diffs (±63, the densest 1-bit patterns this
        alphabet can emit) must survive the round trip."""
        from d365fo_db_sync_spark.operators.multimodal import (
            encode_dc_jpeg,
            jpeg_decode_pixels,
        )

        dcs = [31, -32] * 8
        px = jpeg_decode_pixels(encode_dc_jpeg(dcs, 4))
        for i, dc in enumerate(dcs):
            r, c = divmod(i, 4)
            assert px[r * 8, c * 8] == 2 * dc + 128

    def test_bit_writer_stuffs_ff(self):
        """A DC-only scan with the standard tables can never align
        eight 1-bits (runs cap at 6 before the all-zero EOB code), so
        the writer's T.81 stuffing rule is pinned directly: a 0xFF
        data byte must be followed by 0x00, and the unstuffing reader
        must invert it."""
        from d365fo_db_sync_spark.operators.multimodal import (
            _JpegBits,
            _JpegBitWriter,
        )

        w = _JpegBitWriter()
        w.write(0xFF, 8)
        w.write(0xA5, 8)
        out = w.flush()
        assert out == b"\xff\x00\xa5"
        segs, _ = __import__(
            "d365fo_db_sync_spark.operators.multimodal", fromlist=["x"]
        )._jpeg_split_entropy(out, 0)
        assert segs[0] == b"\xff\xa5"
        r = _JpegBits(segs[0])
        assert (r.bits(8), r.bits(8)) == (0xFF, 0xA5)

    def test_histogram_feature_contract(self):
        from d365fo_db_sync_spark.operators.multimodal import (
            encode_dc_jpeg,
            jpeg_image_codec,
        )

        # four blocks at pixel values 64, 128, 128, 190 -> bins 2, 4, 4, 5
        feat = jpeg_image_codec()(encode_dc_jpeg([-32, 0, 0, 31], 2), "image")
        assert (feat["width"], feat["height"]) == (16, 16)
        assert feat["feature"] == [0, 0, 0.25, 0, 0.5, 0.25, 0, 0]

    def test_grid_and_quant_validation(self):
        from d365fo_db_sync_spark.operators.multimodal import encode_dc_jpeg

        with pytest.raises(ValueError, match="full block grid"):
            encode_dc_jpeg([1, 2, 3], 2)
        with pytest.raises(ValueError, match="full block grid"):
            encode_dc_jpeg([], 2)
        with pytest.raises(ValueError, match="quant"):
            encode_dc_jpeg([1, 2], 2, quant=256)

    def test_staged_assets_decode_through_auto_codec(self, spark):
        from pyspark.sql import functions as F

        from d365fo_db_sync_spark.operators import multimodal

        docs = spark.createDataFrame(
            [(7, "Hello world"), (8, None), (9, "xy")],
            "doc_id long, text string",
        )
        assets = multimodal.jpeg_assets_from_documents(docs, side=2)
        multimodal.register_codec("image", multimodal.auto_image_codec())
        try:
            rows = {
                r["asset_id"]: r
                for r in multimodal.decode_features(assets).collect()
            }
        finally:
            multimodal.register_default_codecs()
        assert set(rows) == {7, 8, 9}
        for doc_id, text in ((7, "Hello world"), (8, ""), (9, "xy")):
            s = (text + "AAAA")[:4]
            bins = [0.0] * 8
            for ch in s:
                bins[(2 * ((ord(ch) % 64) - 32) + 128) // 32] += 0.25
            r = rows[doc_id]
            assert (r["width"], r["height"]) == (16, 16)
            assert [round(b, 6) for b in r["feature"]] == [
                round(b, 6) for b in bins
            ]
