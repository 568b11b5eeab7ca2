"""Typed multi-column sort — the engine analog of the reference's grid
column sort (MainForm.cs:2089-2250: each column sorts by its UNDERLYING
typed value — numeric display strings by number, text lexically — with
a per-click asc/desc toggle).

Spark formulation: a deterministic sort KEY expression instead of UI
state. ``typed_sort_key`` makes one string column order "numerically
when it looks numeric, lexically otherwise" — numeric values first as
a group (matching the reference, where a numeric-backed column is all
numeric), then non-numeric strings. ``grid_sort`` applies it (or a
plain typed column) with direction, as a distributed ``orderBy`` —
Spark's range-partitioned sort, no single-reducer bottleneck.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_NUMERIC_RE = r"^-?\d+(\.\d+)?$"


def typed_sort_key(col: Column | str) -> Column:
    """Struct key ``(non_numeric, num, text)``: rows whose string looks
    numeric sort by numeric value (as a group, before non-numeric
    rows); everything else sorts lexically. Struct comparison is
    field-by-field, so one ``orderBy(typed_sort_key(c))`` gives the
    whole discipline — usable in ``orderBy``, window ``orderBy``, and
    range partitioning alike."""
    c = F.col(col) if isinstance(col, str) else col
    num = F.when(c.rlike(_NUMERIC_RE), c.cast("double"))
    return F.struct(
        num.isNull().cast("int").alias("non_numeric"),
        num.alias("num"),
        c.alias("text"),
    )


def grid_sort(
    df: DataFrame,
    column: str,
    ascending: bool = True,
    numeric_source: str | None = None,
    tiebreak: str | None = None,
) -> DataFrame:
    """Sort ``df`` the way the reference sorts a grid column.

    ``numeric_source`` names the raw column backing a formatted display
    column (the reference's ``EstimatedSizeMBDisplay`` sorting by
    ``EstimatedSizeMB``) — given, it is used directly; otherwise the
    display column gets the typed key. ``tiebreak`` (a unique column)
    makes the order total, which distributed sorts need for
    determinism."""
    key: Column = F.col(numeric_source) if numeric_source else typed_sort_key(column)
    keys = [key.asc() if ascending else key.desc()]
    if tiebreak:
        keys.append(F.col(tiebreak).asc())
    return df.orderBy(*keys)
