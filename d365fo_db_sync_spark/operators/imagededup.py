"""Perceptual-hash image near-dup detection — dHash over decoded
luminance with Hamming-banded candidate pairs (the MinHash-LSH shape
applied to pixels; the standard image-dedup recipe of training-data
pipelines, e.g. the difference-hash described by the pHash/imagehash
literature).

Pipeline shape (100 TB story identical to text MinHash-LSH):

1. **decode + hash** — one ``mapInPandas`` Arrow-batch stage decodes
   each image payload with the REAL stdlib decoders behind the
   multimodal codec registry (PNG inflate + filters, GIF LZW +
   palette, baseline JPEG, binary PPM — sniffed by signature via
   multimodal.image_luminance; r15, was PPM-only), box-downsamples to
   the hash grid when larger, and reduces it to a 56-bit dHash: the
   8x8 luminance grid's horizontal gradient signs (bit ``y*7+x`` set
   iff ``px[y][x] > px[y][x+1]``). The corpus collapses to one BIGINT
   per image before anything shuffles.
2. **band** — the signature splits into 4 bands of 14 bits (the
   dedup.simhash_candidates discipline): any pair within Hamming
   distance <= 3 shares at least one band by pigeonhole.
3. **candidates** — a band-bucket self-equi-join emits collision
   groups only, never all-pairs.
4. **verify** — candidates re-join the signature sidecar (bounded: one
   long per image) and keep pairs with exact ``bit_count(a XOR b)``
   under the threshold.

Every step is integer byte math over an already-oracled decoder, so a
SQL oracle replays decode -> hash -> band -> join -> verify end to end
(suite: ``multimodal_dhash_near_dups``). 56 bits (not 64) keeps the
signature strictly positive in a signed BIGINT on both engines — the
dedup._SIMHASH_BITS md5 precedent.

Reference parity: the reference engine (DBSyncTool) has no media
operators; this extends the LLM-data-pipeline tier next to
operators/dedup.py (text near-dup) and operators/multimodal.py (codec
registry the decode stage builds on).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: dHash grid — 8x8 luminance, 7 horizontal comparisons per row
GRID = 8
DHASH_BITS = GRID * (GRID - 1)  # 56
#: banding — 4 bands of 14 bits: catches every pair with Hamming
#: distance <= 3 by pigeonhole
BANDS = 4
BAND_WIDTH = DHASH_BITS // BANDS


def stage_ppm_assets(docs: DataFrame, grid: int = GRID) -> DataFrame:
    """Deterministic grayscale PPM asset table from the documents
    corpus: each document becomes one ``grid x grid`` binary PPM (P6)
    whose pixel bytes are the leading codepoints of
    ``text + 'AAA...'`` padding mod 256 (R = G = B, so luminance is
    the byte itself under any weighting) — near-duplicate texts yield
    near-duplicate images, and a SQL oracle recomputes every pixel
    from the raw text without a decoder (the
    jpeg_assets_from_documents discipline). Runs executor-side in the
    same Arrow-batch shape as the decode stage."""
    n_px = grid * grid
    pad = "A" * n_px
    header = f"P6 {grid} {grid} 255\n".encode()

    def stage(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, blobs = [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                s = ((text or "") + pad)[:n_px]
                px = bytes(ord(ch) % 256 for ch in s)
                ids.append(doc_id)
                blobs.append(header + b"".join(bytes((v, v, v)) for v in px))
            yield pd.DataFrame({"asset_id": ids, "content": blobs})

    staged = docs.select("doc_id", "text").mapInPandas(
        stage,
        schema=T.StructType(
            [
                T.StructField("asset_id", T.LongType(), False),
                T.StructField("content", T.BinaryType(), False),
            ]
        ),
    )
    return staged.select(
        "asset_id",
        F.lit("image").alias("media_type"),
        "content",
        F.create_map(F.lit("codec"), F.lit("ppm-gray")).alias("meta"),
    )


def stage_mixed_assets(docs: DataFrame, grid: int = GRID) -> DataFrame:
    """:func:`stage_ppm_assets` with the FORMAT rotated per document —
    ``doc_id % 3`` picks binary PPM, grayscale PNG, or gray-palette
    GIF89a (multimodal.encode_gray_png / encode_gray_gif), all
    LOSSLESS encodings of the IDENTICAL pixel rule (leading text
    codepoints mod 256). Near-dup semantics are format-blind by
    construction, and a SQL oracle still recomputes every pixel from
    the raw text — while the Spark side now exercises three REAL
    decode paths (PPM byte slice, PNG inflate + filters, GIF LZW +
    palette) inside one Arrow-batch stage."""
    from d365fo_db_sync_spark.operators.multimodal import (
        encode_gray_gif,
        encode_gray_png,
    )

    n_px = grid * grid
    pad = "A" * n_px
    header = f"P6 {grid} {grid} 255\n".encode()

    def stage(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, blobs, codecs = [], [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                s = ((text or "") + pad)[:n_px]
                px = bytes(ord(ch) % 256 for ch in s)
                fmt = int(doc_id) % 3
                if fmt == 0:
                    blob = header + b"".join(bytes((v, v, v)) for v in px)
                    codec = "ppm-gray"
                elif fmt == 1:
                    blob = encode_gray_png(grid, grid, px)
                    codec = "png-gray"
                else:
                    blob = encode_gray_gif(grid, grid, px)
                    codec = "gif-gray"
                ids.append(doc_id)
                blobs.append(blob)
                codecs.append(codec)
            yield pd.DataFrame(
                {"asset_id": ids, "content": blobs, "codec": codecs}
            )

    staged = docs.select("doc_id", "text").mapInPandas(
        stage,
        schema=T.StructType(
            [
                T.StructField("asset_id", T.LongType(), False),
                T.StructField("content", T.BinaryType(), False),
                T.StructField("codec", T.StringType(), False),
            ]
        ),
    )
    return staged.select(
        "asset_id",
        F.lit("image").alias("media_type"),
        "content",
        F.create_map(F.lit("codec"), F.col("codec")).alias("meta"),
    )


def luminance_grid(content: bytes, grid: int = GRID) -> list[int]:
    """Row-major ``grid x grid`` integer luminance from ANY
    stdlib-decodable image payload (multimodal.image_luminance sniffs
    PNG/GIF/baseline-JPEG/PPM): images already at ``grid x grid`` pass
    through exactly; larger ones box-downsample (integer block mean,
    ``sum // count`` over ``[k*n // grid, (k+1)*n // grid)`` bounds) —
    the deterministic resize dHash needs, no imaging library. Smaller
    images raise: an upsample would fabricate gradients."""
    from d365fo_db_sync_spark.operators.multimodal import image_luminance

    w, h, lum = image_luminance(content)
    if w < grid or h < grid:
        raise ValueError(
            f"luminance_grid needs >= {grid}x{grid} pixels, got {w}x{h}"
        )
    if (w, h) == (grid, grid):
        return [int(v) for v in lum.flatten()]
    out = []
    for gy in range(grid):
        y0, y1 = gy * h // grid, (gy + 1) * h // grid
        for gx in range(grid):
            x0, x1 = gx * w // grid, (gx + 1) * w // grid
            blk = lum[y0:y1, x0:x1]
            out.append(int(blk.sum()) // int(blk.size))
    return out


def dhash_py(lum: list[int], grid: int = GRID) -> int:
    """Reference dHash over a row-major luminance grid — bit
    ``y*(grid-1)+x`` set iff ``lum[y][x] > lum[y][x+1]``. Shared by
    the executor stage and the brute-force test model."""
    sig = 0
    for y in range(grid):
        for x in range(grid - 1):
            if lum[y * grid + x] > lum[y * grid + x + 1]:
                sig |= 1 << (y * (grid - 1) + x)
    return sig


def dhash_signatures(
    assets: DataFrame,
    grid: int = GRID,
    id_col: str = "asset_id",
    content_col: str = "content",
) -> DataFrame:
    """(id, dhash) via one ``mapInPandas`` Arrow-batch stage: decode
    the payload with the REAL sniffing pixel adapter
    (:func:`luminance_grid` over multimodal.image_luminance — PNG,
    GIF, baseline JPEG, or binary PPM; r15, was PPM-only),
    box-downsample to the hash grid when larger, reduce to the 56-bit
    dHash. One long per image leaves the stage — the corpus never
    shuffles at pixel width. For the gray staged corpora the ITU
    luminance IS the staged byte (R = G = B), so signatures are
    unchanged from the PPM-only path."""

    def hash_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, sigs = [], []
            for aid, content in zip(pdf[id_col], pdf[content_col]):
                lum = luminance_grid(bytes(content), grid)
                ids.append(aid)
                sigs.append(dhash_py(lum, grid))
            yield pd.DataFrame({id_col: ids, "dhash": sigs})

    return assets.select(id_col, content_col).mapInPandas(
        hash_batch,
        schema=T.StructType(
            [
                T.StructField(id_col, T.LongType(), False),
                T.StructField("dhash", T.LongType(), False),
            ]
        ),
    )


def dhash_candidates(
    sigs: DataFrame, id_col: str = "asset_id", bands: int = BANDS
) -> DataFrame:
    """Hamming-near candidate pairs (id_a < id_b): split the 56-bit
    signature into ``bands`` chunks; pairs sharing any chunk are
    candidates (catches Hamming distance < bands by pigeonhole). The
    band-bucket equi-join shuffles collision groups only — never
    all-pairs (dedup.simhash_candidates on pixels)."""
    width = DHASH_BITS // bands
    mask = (1 << width) - 1
    chunks = sigs.select(
        id_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftrightunsigned("dhash", b * width)
                        .bitwiseAND(F.lit(mask))
                        .alias("chunk"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select(id_col, "bb.band", "bb.chunk")
    a, b = chunks.alias("a"), chunks.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .distinct()
    )


def dhash_near_duplicates(
    sigs: DataFrame,
    max_hamming: int | None = None,
    id_col: str = "asset_id",
    bands: int = BANDS,
) -> DataFrame:
    """Verified near-dup pairs: banded candidates re-joined against the
    signature sidecar (one long per image — broadcast-able next to any
    real corpus), kept when the exact Hamming distance
    ``bit_count(a XOR b)`` <= ``max_hamming``. Returns
    ``(id_a, id_b, hamming)``. Candidate recall is exact only below
    ``bands`` (pigeonhole), so ``max_hamming`` DEFAULTS to
    ``bands - 1`` — the largest threshold the banding fully covers;
    passing a larger one is allowed (banded-LSH partial recall, the
    MinHash-LSH candidate/verify split) but warns that pairs past the
    pigeonhole bound may be silently missed."""
    if max_hamming is None:
        max_hamming = bands - 1
    elif max_hamming >= bands:
        import warnings

        warnings.warn(
            f"dhash_near_duplicates: max_hamming={max_hamming} exceeds the "
            f"banding recall guarantee (bands={bands} only ensures every "
            f"pair at Hamming distance <= {bands - 1} shares a band) — "
            f"pairs at distance {bands}..{max_hamming} are best-effort",
            RuntimeWarning,
            stacklevel=2,
        )
    # materialized: four consumers (both candidate self-join sides and
    # both verify sides) would each re-run the Arrow decode stage —
    # the signature frame is one long per image, metadata-sized
    sigs = sigs.localCheckpoint(eager=True)
    cand = dhash_candidates(sigs, id_col=id_col, bands=bands)
    sa = sigs.select(F.col(id_col).alias("id_a"), F.col("dhash").alias("_ha"))
    sb = sigs.select(F.col(id_col).alias("id_b"), F.col("dhash").alias("_hb"))
    return (
        cand.join(sa, on="id_a")
        .join(sb, on="id_b")
        .select(
            "id_a",
            "id_b",
            F.bit_count(
                F.col("_ha").bitwiseXOR(F.col("_hb"))
            ).cast("int").alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )
