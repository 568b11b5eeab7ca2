"""Multimodal-plumbing suite: binary asset columns + Arrow-batched
decode via mapInPandas (operators/multimodal.py).

The decode itself is stubbed (no media libs in this environment) with a
deterministic byte-math codec — which makes the ENTIRE distributed
pipeline oracle-checkable: DuckDB recomputes the same integer features
from the text bytes. What this verifies is precisely the part that
matters at 100 TB: schema contract, binary column handling, Arrow batch
round-trip, and null/media-type routing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from d365fo_db_sync_spark.operators import multimodal
from d365fo_db_sync_spark.sources import load_table
from d365fo_db_sync_spark.suite import register


@register(
    "multimodal_decode_features",
    oracle="""
    WITH t AS (
      SELECT doc_id, length(text) AS n,
             list_sum([ascii(text[i]) for i in range(1, LEAST(length(text), 64) + 1)]) AS h
      FROM documents)
    SELECT doc_id AS asset_id,
           CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END
             AS media_type,
           n AS n_bytes,
           CAST(CASE WHEN doc_id % 3 = 0 THEN (h % 640) + 1 END AS BIGINT) AS width,
           CAST(CASE WHEN doc_id % 3 = 0 THEN ((h // 7) % 480) + 1 END AS BIGINT) AS height,
           CASE WHEN doc_id % 3 <> 0 THEN n * 10 END AS duration_ms
    FROM t
    """,
)
def multimodal_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary assets (text bytes as stand-in media) -> mapInPandas decode
    with the deterministic fake codec -> typed feature rows. One Python
    stage over Arrow batches; everything before and after stays JVM-side."""
    for mt in ("image", "audio", "video"):
        multimodal.register_codec(mt, multimodal.fake_codec)
    assets = multimodal.assets_from_documents(load_table(spark, sf_dir, "documents"))
    feats = multimodal.decode_features(assets)
    return feats.select(
        "asset_id",
        "media_type",
        "n_bytes",
        F.col("width").cast("long").alias("width"),
        F.col("height").cast("long").alias("height"),
        "duration_ms",
    )


@register(
    "multimodal_resize_images",
    oracle="""
    SELECT doc_id AS asset_id,
           CAST(64 AS BIGINT) AS width, CAST(48 AS BIGINT) AS height,
           LEAST(strlen(text), 384) AS n_bytes
    FROM documents WHERE doc_id % 3 = 0
    """,
)
def multimodal_resize_images(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize stage over the image subset: mapInPandas with the stub
    resample (truncate to width*height/8 bytes). The oracle recomputes
    the output byte size from the source text — verifying routing,
    batch shape, and the binary round-trip."""
    assets = multimodal.assets_from_documents(load_table(spark, sf_dir, "documents"))
    out = multimodal.resize_images(assets, width=64, height=48)
    return out.select(
        "asset_id",
        F.col("width").cast("long").alias("width"),
        F.col("height").cast("long").alias("height"),
        "n_bytes",
    )


@register(
    "multimodal_frame_sample_counts",
    oracle="""
    WITH v AS (
      SELECT doc_id, LEAST(4, strlen(text) // 100 + 1) AS n_frames,
             LEAST(strlen(text), 400) AS sampled_bytes
      FROM documents WHERE doc_id % 3 = 2)
    SELECT doc_id AS asset_id, n_frames,
           n_frames - 1 AS max_frame_idx, sampled_bytes
    FROM v
    """,
)
def multimodal_frame_sample_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over the video subset (every frame, capped at 4;
    stub codec = 100-byte runs). The per-frame explode happens inside
    the Arrow batch on executors; the oracle recomputes frame counts and
    sampled byte totals from source lengths."""
    assets = multimodal.assets_from_documents(load_table(spark, sf_dir, "documents"))
    frames = multimodal.sample_frames(
        assets,
        multimodal.FrameSampleSpec(every_n=1, max_frames=4, bytes_per_frame=100),
    )
    return frames.groupBy("asset_id").agg(
        F.count("*").alias("n_frames"),
        F.max("frame_idx").cast("long").alias("max_frame_idx"),
        F.sum(F.length("frame")).alias("sampled_bytes"),
    )
