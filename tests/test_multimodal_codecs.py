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

        expected = "pillow"
    except ImportError:
        expected = "stub"
    assert chosen == {"image": expected, "audio": "stub", "video": "stub"}
    # the registry is actually populated for all three types
    for mt in ("image", "audio", "video"):
        assert mt in multimodal._CODECS


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
