"""JSONL corpus ingestion — the arrival format of most LLM training
corpora (one JSON document per line, written by scrapers and
upstream pipelines long before anything becomes parquet).

Production discipline baked in:

- **Explicit schema, never inference.** Schema inference is a full
  extra pass over 100 TB and silently drifts when a rare field shows
  up late; the ingest contract is declared, and anything that doesn't
  match it is DATA (a quarantine row), not a schema change.
- **PERMISSIVE + corrupt-record capture.** Malformed lines land in a
  ``_corrupt_record`` column instead of killing the job (a crawler
  corpus always has torn lines); the caller gets an exact quarantine
  count and the raw bytes for triage.
- **The whole path is a Catalyst scan** — pushdown and pruning apply
  to the parsed columns exactly as they would on parquet; no RDD text
  pre-pass.

Spark caveat handled here: filtering ONLY on the corrupt column of a
freshly-read JSON frame is disallowed by Spark (the parser would have
to re-run just for the filter — SPARK-21610), so :func:`read_jsonl`
materializes the split with ``persist()`` before partitioning rows
into good/quarantine. Callers that stream the good side onward and
drop the report skip that with ``quarantine=False``.

Reference parity note: the reference ingests from SQL Server only
(`/root/reference/DBSyncTool/Services/AxDbDataService.cs`); file-based
corpus ingestion is part of this engine's pipeline extension surface.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

CORRUPT_COL = "_corrupt_record"

__all__ = [
    "CORRUPT_COL",
    "JsonlIngest",
    "read_csv",
    "read_jsonl",
    "write_csv",
    "write_jsonl",
]


@dataclass
class JsonlIngest:
    """Result of a quarantining JSONL read."""

    good: DataFrame
    quarantine: DataFrame
    n_good: int
    n_quarantined: int


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType,
    quarantine: bool = True,
) -> "JsonlIngest | DataFrame":
    """Read line-delimited JSON under ``path`` against an EXPLICIT
    ``schema``. With ``quarantine=True`` (default) returns a
    :class:`JsonlIngest` whose ``good`` frame holds rows that parsed
    clean and whose ``quarantine`` frame holds the raw text of every
    malformed line; with ``quarantine=False`` returns the lazy parsed
    frame directly (malformed lines surface as all-NULL rows, the
    plain PERMISSIVE contract) and never materializes anything."""
    if CORRUPT_COL in schema.fieldNames():
        raise ValueError(f"schema must not already contain {CORRUPT_COL!r}")
    # build a fresh StructType: StructType.add mutates in place, which
    # would silently grow the caller's schema object
    full = StructType(list(schema.fields) + [StructField(CORRUPT_COL, StringType())])
    df = (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )
    if not quarantine:
        return df.drop(CORRUPT_COL)
    df = df.persist()
    bad = F.col(CORRUPT_COL).isNotNull()
    good = df.filter(~bad).drop(CORRUPT_COL)
    quar = df.filter(bad).select(F.col(CORRUPT_COL).alias("raw_line"))
    return JsonlIngest(
        good=good,
        quarantine=quar,
        n_good=good.count(),
        n_quarantined=quar.count(),
    )


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Write ``df`` as line-delimited JSON (the interchange format the
    read side consumes). Spark JSON-escapes embedded newlines/quotes,
    so arbitrary document text round-trips losslessly."""
    df.write.mode(mode).json(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType,
    quarantine: bool = True,
    header: bool = False,
    multiline: bool = False,
) -> "JsonlIngest | DataFrame":
    """CSV twin of :func:`read_jsonl` — same explicit-schema,
    PERMISSIVE + corrupt-record-capture discipline for the other
    arrival format upstream systems hand over (exports, spreadsheets,
    legacy ETL drops). Malformed rows — wrong column arity, type
    mismatches — land in the quarantine frame with their raw line;
    clean rows parse against the declared schema with standard RFC
    quoting (embedded commas and quotes always round-trip).

    ``multiline=True`` enables quoted EMBEDDED NEWLINES — required to
    read back text fields containing line breaks, but it forces Spark
    to parse whole files instead of line-splittable chunks (one task
    per file, no intra-file parallelism). At corpus scale prefer JSONL
    for newline-bearing text; CSV multiline is the compatibility
    escape hatch for data that arrives that way.

    Returns :class:`JsonlIngest` (the shape is format-agnostic) or,
    with ``quarantine=False``, the lazy PERMISSIVE frame."""
    if CORRUPT_COL in schema.fieldNames():
        raise ValueError(f"schema must not already contain {CORRUPT_COL!r}")
    full = StructType(list(schema.fields) + [StructField(CORRUPT_COL, StringType())])
    df = (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .option("header", str(header).lower())
        .option("multiLine", str(multiline).lower())
        .csv(path)
    )
    if not quarantine:
        return df.drop(CORRUPT_COL)
    # same SPARK-21610 persist discipline as read_jsonl: filtering only
    # on the corrupt column of a fresh CSV frame is disallowed
    df = df.persist()
    bad = F.col(CORRUPT_COL).isNotNull()
    good = df.filter(~bad).drop(CORRUPT_COL)
    quar = df.filter(bad).select(F.col(CORRUPT_COL).alias("raw_line"))
    return JsonlIngest(
        good=good,
        quarantine=quar,
        n_good=good.count(),
        n_quarantined=quar.count(),
    )


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Write ``df`` as headerless CSV with default RFC quoting —
    embedded commas/quotes are quoted-escaped by Spark. Text with
    embedded NEWLINES is also quoted correctly, but reading it back
    requires :func:`read_csv` ``multiline=True`` (see its scale
    caveat); prefer JSONL for newline-bearing corpora."""
    df.write.mode(mode).csv(path)
