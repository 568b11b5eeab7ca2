"""Scalar function surface (reference family F1-F18).

Most of the reference's scalar work maps 1:1 onto built-in
``pyspark.sql.functions`` (JVM-side, codegen'd — never Python UDFs).
This module adds the engine-specific pieces: the record-count literal
parser, 8-byte rowversion encoding, and null-safe comparison helpers.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def parse_record_count(text: str) -> int:
    """``"10m"`` -> 10_000_000; plain integers pass through
    (CopyOrchestrator.cs:1765-1779)."""
    t = text.strip().lower()
    if t.endswith("m"):
        return int(float(t[:-1]) * 1_000_000)
    if t.endswith("k"):
        return int(float(t[:-1]) * 1_000)
    return int(t)


def rowversion_to_hex(col: Column | str) -> Column:
    """F7 — 8-byte rowversion -> ``0x``-prefixed 16-hex-char string
    (TimestampHelper.cs:37-47)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.concat(F.lit("0x"), F.lpad(F.upper(F.hex(c)), 16, "0"))


def hex_to_rowversion(col: Column | str) -> Column:
    """F7 — parse the ``0xHEX`` form back to binary
    (TimestampHelper.cs:52-64)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.unhex(F.lpad(F.regexp_replace(c, "^0[xX]", ""), 16, "0"))


def rowversion_u64(col: Column | str) -> Column:
    """8-byte rowversion as an unsigned-order-preserving BIGINT
    (values < 2^63 in practice; D365 rowversions are counters).
    Spark's BinaryType already orders unsigned-lexicographically
    (matching TimestampHelper.cs:12-24) — this is for arithmetic/
    display only."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.hex(c), 16, 10).cast("long")


def null_safe_eq(a: Column | str, b: Column | str) -> Column:
    """F16 — NULL==NULL true, NULL==value false (ValuesEqual,
    AxDbDataService.cs:872-886). Spark's ``eqNullSafe`` / SQL ``<=>``."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    return ca.eqNullSafe(cb)


def wildcard_like(col: Column | str, pattern: str) -> Column:
    """F5/P4 — ``*``-wildcard match as a column predicate."""
    import re

    c = F.col(col) if isinstance(col, str) else col
    return c.rlike("(?i)^" + re.escape(pattern).replace("\\*", ".*") + "$")


def seconds_to_mmss(col: Column | str) -> Column:
    """F18 — seconds -> ``m:ss`` display string
    (CopyOrchestrator.cs:1865-1870)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.format_string(
        "%d:%02d", (c / 60).cast("int"), (c % 60).cast("int")
    )
