"""operators/imagededup.py — perceptual-hash image near-dup semantics:
the staged PPM round-trips through the real byte decoder, dHash is the
documented gradient-sign pack, banded candidates are pigeonhole-complete
below the band count, and the verified pair set equals the brute-force
Hamming model restricted to candidates."""

from __future__ import annotations

import itertools

import pytest
from pyspark.sql import functions as F

from d365fo_db_sync_spark.operators import imagededup, multimodal


@pytest.fixture(scope="module")
def docs(spark):
    base = "".join(chr(65 + (i * 7) % 26) for i in range(64))
    near = base[:20] + "x" + base[21:]  # one pixel off -> tiny Hamming
    rows = [
        (0, base),
        (1, base),  # exact dup of 0
        (2, near),  # near dup of 0
        (3, "".join(chr(97 + (i * 11) % 26) for i in range(64))),
        (4, "short"),  # mostly padding
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _expected_sig(text: str) -> int:
    s = ((text or "") + "A" * 64)[:64]
    lum = [ord(ch) % 256 for ch in s]
    return imagededup.dhash_py(lum)


def test_stage_roundtrips_through_real_decoder(spark, docs):
    assets = imagededup.stage_ppm_assets(docs).collect()
    by_id = {r["asset_id"]: bytes(r["content"]) for r in assets}
    w, h, raw = multimodal.ppm_pixels(by_id[0])
    assert (w, h) == (8, 8) and len(raw) == 8 * 8 * 3
    s = (docs.filter("doc_id = 0").first()["text"] + "A" * 64)[:64]
    assert [raw[i * 3] for i in range(64)] == [ord(c) % 256 for c in s]
    # gray: all three channels equal
    assert all(raw[i * 3] == raw[i * 3 + 1] == raw[i * 3 + 2] for i in range(64))


def test_dhash_signature_values(spark, docs):
    sigs = {
        r["asset_id"]: r["dhash"]
        for r in imagededup.dhash_signatures(
            imagededup.stage_ppm_assets(docs)
        ).collect()
    }
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    for i, t in texts.items():
        assert sigs[i] == _expected_sig(t)
        assert 0 <= sigs[i] < (1 << 56)
    assert sigs[0] == sigs[1]  # exact dup -> identical signature


def test_candidates_pigeonhole_complete_and_verify_matches_bruteforce(
    spark, docs
):
    sigs_df = imagededup.dhash_signatures(imagededup.stage_ppm_assets(docs))
    sigs = {r["asset_id"]: r["dhash"] for r in sigs_df.collect()}
    cand = {
        (r["id_a"], r["id_b"])
        for r in imagededup.dhash_candidates(sigs_df).collect()
    }
    brute = {
        (a, b): bin(sigs[a] ^ sigs[b]).count("1")
        for a, b in itertools.combinations(sorted(sigs), 2)
    }
    # pigeonhole: every pair with Hamming < BANDS must be a candidate
    for (a, b), d in brute.items():
        if d < imagededup.BANDS:
            assert (a, b) in cand, (a, b, d)
    # verified output == brute-force threshold model restricted to cands
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in imagededup.dhash_near_duplicates(
            sigs_df, max_hamming=6
        ).collect()
    }
    want = {p: d for p, d in brute.items() if d <= 6 and p in cand}
    assert got == want
    assert got[(0, 1)] == 0  # exact dup
    assert (0, 2) in got  # planted near dup survives verify


def test_dhash_rejects_wrong_grid(spark):
    assets = spark.createDataFrame(
        [(1, "image", bytearray(b"P6 4 2 255\n" + b"\x00" * 24), {})],
        "asset_id long, media_type string, content binary, meta map<string,string>",
    )
    with pytest.raises(Exception):
        imagededup.dhash_signatures(assets).collect()


def test_mixed_formats_identical_signatures(spark, docs):
    """r15: the format rotation (PPM/PNG/GIF) is signature-invisible —
    every staged blob decodes through its own REAL stdlib path back to
    the identical pixel rule, so dHash equals the text-derived model
    no matter which codec carried it."""
    assets = imagededup.stage_mixed_assets(docs)
    metas = {r["asset_id"]: r["meta"]["codec"] for r in assets.collect()}
    assert {metas[0], metas[1], metas[2]} == {"ppm-gray", "png-gray", "gif-gray"}
    sigs = {
        r["asset_id"]: r["dhash"]
        for r in imagededup.dhash_signatures(assets).collect()
    }
    for i, t in {r["doc_id"]: r["text"] for r in docs.collect()}.items():
        assert sigs[i] == _expected_sig(t), (i, metas[i])


def test_luminance_grid_box_downsamples_larger_images():
    """A 16x16 image box-downsamples to the 8x8 hash grid by integer
    block means — checked against an independent numpy reference."""
    import numpy as np

    vals = bytes((y * 16 + x) * 13 % 256 for y in range(16) for x in range(16))
    blob = multimodal.encode_gray_png(16, 16, vals)
    got = imagededup.luminance_grid(blob, grid=8)
    arr = np.frombuffer(vals, dtype=np.uint8).reshape(16, 16).astype(np.int64)
    want = [
        int(arr[2 * gy : 2 * gy + 2, 2 * gx : 2 * gx + 2].sum()) // 4
        for gy in range(8)
        for gx in range(8)
    ]
    assert got == want


def test_dhash_jpeg_self_consistency():
    """The lossy path: dHash over a real baseline JPEG equals the
    reference dHash of the DECODER's own pixels (flat DC-only blocks
    make those exactly predictable: clip(dc + 128) at quant=8), so the
    adapter is pinned decoder-relative — the honest contract for a
    lossy codec."""
    dc = [((i * 29) % 201) - 100 for i in range(64)]  # 8x8 blocks -> 64x64 px
    blob = multimodal.encode_dc_jpeg(dc, 8, quant=8)
    expected_lum = [max(0, min(255, v + 128)) for v in dc]
    assert imagededup.luminance_grid(blob, grid=8) == expected_lum
    sigs = imagededup.dhash_py(expected_lum)
    assets_sig = imagededup.dhash_py(imagededup.luminance_grid(blob, grid=8))
    assert assets_sig == sigs


def test_gif_lzw_encoder_roundtrips_through_decoder():
    """The forward LZW encoder (spec appendix F, encoder side) round-
    trips through the production decoder, including the code-width
    growth and full-table CLEAR/reset path (21k varied bytes overflow
    the 12-bit table)."""
    data = bytes((i * i * 31 + i * 7) % 256 for i in range(21000))
    enc = multimodal._gif_lzw_encode(data, 8)
    dec = multimodal._gif_lzw_decode(enc, 8)
    assert bytes(dec) == data
