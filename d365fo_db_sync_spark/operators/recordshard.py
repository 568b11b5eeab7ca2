"""WebDataset-style record-shard export for multimodal (binary)
corpora — the media counterpart of operators/packing.write_shards.

Training-data pipelines ship image/audio corpora as sequential RECORD
shards (tar in WebDataset, record files in TFRecord/ArrayRecord): each
shard is one contiguous blob of concatenated payloads plus a sidecar
manifest of ``(id, shard, offset, length)`` so a dataloader can open a
shard once and slice records sequentially. This module composes the
existing deterministic byte-budgeted sharding (packing.shuffled_shards
— md5-order shuffle + banded prefix sum, budget counted in BYTES) with
the opaque ``binary`` content columns of the multimodal tier:

* :func:`record_shard_assignments` — ``(id, n_bytes, g_start, shard)``
  over the hash-shuffled byte stream; a record never splits across
  shards (assignment by its start offset).
* :func:`write_record_shards` — materialize ``root/blobs`` (ONE row
  per shard: the shard's records concatenated in stream order, built
  by a per-shard Arrow group stage bounded by the byte budget) and
  ``root/manifest`` (offsets sidecar). One shard-id shuffle; each blob
  is written exactly once.
* :func:`append_record_shards` — O(batch) ingestion: a later batch
  opens a FRESH shard range after the published maximum (its own
  md5-order stream shifted past the existing byte space), so published
  blob rows/files are byte-immutable — the ivf_append /
  ManifestParquetTarget append-by-reference discipline.
* :func:`read_record_assets` — the loader view: manifest x blobs join,
  each record sliced back out with ``substring(blob, offset+1,
  n_bytes)`` (pure codegen; no Python on the read path).

Every number (g_start, shard, offset, md5 of the sliced record) is
deterministic byte math, so a SQL oracle replays export AND read-back
end to end (suite: ``pipeline_media_shard_export``).

Reference parity: the reference engine ships rows to Azure SQL, not
record files; this extends the LLM-data-pipeline export tier next to
packing.write_shards (text parquet shards).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from d365fo_db_sync_spark.operators.packing import shuffled_shards

#: hard ceiling on the per-shard byte budget. A shard blob is ONE
#: parquet binary cell (Spark caps a single binary value at 2 GiB) and
#: rides whole through the read-path join, so the practical bound is
#: task memory, not the format: 256 MiB keeps blob build, write and
#: slice comfortably inside a default executor task while staying
#: large enough for WebDataset-style sequential IO.
MAX_SHARD_BYTES = 256 * 1024 * 1024

_BLOB_SCHEMA = T.StructType(
    [
        T.StructField("shard", T.LongType(), False),
        T.StructField("blob", T.BinaryType(), False),
    ]
)


def record_shard_assignments(
    assets: DataFrame,
    shard_bytes: int,
    id_col: str = "asset_id",
    content_col: str = "content",
    salt: str = "",
) -> DataFrame:
    """``(id, n_bytes, g_start, shard)`` for the byte stream: the
    deterministic md5-order shuffle and banded prefix sum of
    packing.shuffled_shards with the budget counted in CONTENT BYTES.
    Zero-byte payloads are excluded (a record file cannot address an
    empty slice; callers keep them in a metadata-only sidecar).
    ``shard_bytes`` must be in ``[1, MAX_SHARD_BYTES]`` — a blob is one
    parquet binary cell and rides whole through the per-record read
    join, so an unbounded budget silently runs into Spark's 2 GiB
    binary-cell cap / task memory long before it fails loudly."""
    if not 1 <= shard_bytes <= MAX_SHARD_BYTES:
        raise ValueError(
            f"shard_bytes={shard_bytes} outside [1, {MAX_SHARD_BYTES}] — "
            f"a shard blob is a single parquet binary cell (2 GiB hard "
            f"format cap) held whole in task memory during build and "
            f"read-back; raise MAX_SHARD_BYTES only with executor "
            f"memory sized to match"
        )
    assigned = shuffled_shards(
        assets,
        F.length(F.col(content_col)).cast("long"),
        shard_tokens=shard_bytes,
        id_col=id_col,
        salt=salt,
    )
    return assigned.withColumnRenamed("n_tokens", "n_bytes")


def shard_offsets(assigned: DataFrame, id_col: str = "asset_id") -> DataFrame:
    """Manifest rows ``(id, shard, offset, n_bytes)``: a record's
    offset inside its shard blob is its stream position minus the
    shard's first — exact because the stream is contiguous and a shard
    owns a consecutive start-offset range. One window over the shard
    (rows bounded by the byte budget)."""
    w = Window.partitionBy("shard")
    return assigned.select(
        id_col,
        "shard",
        (F.col("g_start") - F.min("g_start").over(w)).alias("offset"),
        "n_bytes",
    )


def _build_blobs(joined: DataFrame) -> DataFrame:
    """(shard, blob) — concatenate each shard's records in stream
    order inside one Arrow group stage. Group size is bounded by the
    byte budget (plus one record), so writer memory is bounded by
    construction."""

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("g_start")
        blob = b"".join(bytes(c) for c in pdf["content"])
        return pd.DataFrame({"shard": [int(pdf["shard"].iloc[0])], "blob": [blob]})

    return joined.groupBy("shard").applyInPandas(build, schema=_BLOB_SCHEMA)


def write_record_shards(
    assets: DataFrame,
    assigned: DataFrame,
    root: str,
    id_col: str = "asset_id",
    content_col: str = "content",
    append: bool = False,
) -> None:
    """Materialize ``root/blobs`` (one concatenated record blob per
    shard) and ``root/manifest`` (the offsets sidecar). One equi-join
    of the assignment back to the payloads, one shard-id shuffle into
    the per-shard build stage. ``append=True`` adds NEW rows/files
    only — published blob files are never rewritten."""
    mode = "append" if append else "overwrite"
    joined = assets.select(F.col(id_col), F.col(content_col).alias("content")).join(
        assigned.select(id_col, "g_start", "shard"), on=id_col
    )
    _build_blobs(joined).write.mode(mode).parquet(f"{root}/blobs")
    shard_offsets(assigned, id_col).write.mode(mode).parquet(f"{root}/manifest")


def append_record_shards(
    spark: SparkSession,
    root: str,
    assets: DataFrame,
    shard_bytes: int,
    id_col: str = "asset_id",
    content_col: str = "content",
    salt: str = "",
) -> int:
    """O(batch) ingestion of a later asset batch: the batch gets its
    own md5-order stream opening a FRESH shard range strictly after
    the published maximum (records shift by ``(max_shard + 1) *
    shard_bytes``), so existing blobs and manifest rows are
    byte-untouched — only new files land. Returns the first shard id
    of the appended range. Reads |manifest| metadata, writes
    O(batch)."""
    max_shard = (
        spark.read.parquet(f"{root}/manifest").agg(F.max("shard")).first()[0]
    )
    base = int(max_shard) + 1
    assigned = record_shard_assignments(
        assets, shard_bytes, id_col=id_col, content_col=content_col, salt=salt
    ).select(
        id_col,
        "n_bytes",
        (F.col("g_start") + F.lit(base * shard_bytes)).alias("g_start"),
        (F.col("shard") + F.lit(base)).alias("shard"),
    )
    write_record_shards(
        assets, assigned, root, id_col=id_col, content_col=content_col, append=True
    )
    return base


def read_record_assets(
    spark: SparkSession, root: str, id_col: str = "asset_id"
) -> DataFrame:
    """The dataloader view: ``(id, shard, offset, n_bytes, content)``
    with every record sliced back out of its shard blob by
    ``substring(blob, offset + 1, n_bytes)`` — pure codegen on the
    read path. This is the RANDOM-ACCESS view: the manifest x blobs
    equi-join references the full ``shard_bytes`` blob on every
    probe-side row until the substring projects, which is fine for
    point lookups and bounded by MAX_SHARD_BYTES by construction —
    but a FULL-CORPUS sequential read should go per-shard instead
    (group the manifest by ``shard``, open each blob once, slice
    records in offset order inside one task — the WebDataset loader
    pattern), touching each blob once total rather than once per
    record."""
    blobs = spark.read.parquet(f"{root}/blobs")
    man = spark.read.parquet(f"{root}/manifest")
    return man.join(blobs, on="shard").select(
        id_col,
        "shard",
        "offset",
        "n_bytes",
        F.expr(
            "substring(blob, cast(offset + 1 as int), cast(n_bytes as int))"
        ).alias("content"),
    )
