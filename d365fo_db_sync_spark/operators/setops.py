"""Set operations (reference family E1-E6).

The reference uses .NET set types on schema-field and key lists
(CopyOrchestrator.cs:190, 385-399); here they are distributed DataFrame
set ops so the same semantics hold on data-scale inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def intersect(a: DataFrame, b: DataFrame) -> DataFrame:
    """E1 — set intersection (dedups, like SQL INTERSECT)."""
    return a.intersect(b)


def intersect_all(a: DataFrame, b: DataFrame) -> DataFrame:
    return a.intersectAll(b)


def except_(a: DataFrame, b: DataFrame) -> DataFrame:
    """E2 — set difference (CopyOrchestrator.cs:387-388)."""
    return a.exceptAll(b).dropDuplicates()


def except_all(a: DataFrame, b: DataFrame) -> DataFrame:
    return a.exceptAll(b)


def union_distinct(a: DataFrame, b: DataFrame) -> DataFrame:
    """E3 — delete-set / insert-set union (AxDbDataService.cs:266-270)."""
    return a.union(b).dropDuplicates()


def union_all(a: DataFrame, b: DataFrame) -> DataFrame:
    """E5 — UNION ALL (strategy-SQL pattern, README.md:120)."""
    return a.union(b)


def dedup(df: DataFrame, *cols: str) -> DataFrame:
    """E4 — drop duplicates on the given columns (all if none given)."""
    return df.dropDuplicates(list(cols) or None)
