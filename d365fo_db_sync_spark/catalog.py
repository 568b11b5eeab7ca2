"""Catalog discovery (reference family S1-S3, R7, R8).

The reference enumerates tables with row counts and size estimates from
DMVs (Tier2DataService.cs:35-97) and caches the app-level schema
dictionary in one query (:484-543). Spark's analog: the session catalog
plus parquet footer statistics. ``discovery_stats`` builds the same
(table_name, row_count) relation distributedly — parquet count() is a
metadata-only job (footer row counts), not a full scan.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def discovery_stats(tables: dict[str, DataFrame], include_empty: bool = False) -> DataFrame:
    """Per-table stats scan (S1): one small agg per table, unioned.

    Mirrors DiscoverTablesAsync's ``GROUP BY name HAVING count > 0``
    shape; counts run as Spark jobs (parquet footer metadata) and the
    empty-table filter is the reference's P6 skip rule.
    """
    frames = [
        df.agg(F.count(F.lit(1)).alias("row_count")).select(
            F.lit(name).alias("table_name"), "row_count"
        )
        for name, df in tables.items()
    ]
    out = reduce(DataFrame.unionAll, frames)
    if not include_empty:
        out = out.filter(F.col("row_count") > 0)
    return out


class SchemaDictionary:
    """Schema-dictionary cache (S2/S3/R7).

    tableName -> StructType, loaded once per run — the reference's
    "~4000 queries -> 1" optimization (Tier2DataService.cs:481-482)
    becomes "inspect each DataFrame's schema once and memoize".
    """

    def __init__(self) -> None:
        self._schemas: dict[str, T.StructType] = {}

    def put(self, name: str, schema: T.StructType) -> None:
        self._schemas[name.upper()] = schema

    def load(self, tables: dict[str, DataFrame]) -> "SchemaDictionary":
        for name, df in tables.items():
            self.put(name, df.schema)
        return self

    def fields(self, name: str) -> list[str]:
        return [f.name for f in self._schemas[name.upper()].fields]

    def schema(self, name: str) -> T.StructType:
        return self._schemas[name.upper()]

    def __contains__(self, name: str) -> bool:
        return name.upper() in self._schemas


def schema_diff(src_fields: list[str], tgt_fields: list[str]) -> tuple[list[str], list[str]]:
    """J8 — schema set-compare both directions for the system-table
    exact-equality check (CopyOrchestrator.cs:384-399). Returns
    (only_in_source, only_in_target)."""
    s = {f.upper(): f for f in src_fields}
    t = {f.upper(): f for f in tgt_fields}
    return (
        [v for k, v in s.items() if k not in t],
        [v for k, v in t.items() if k not in s],
    )


def profile_columns(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Column-level data profile: (column, n_rows, n_nulls, n_distinct,
    min_str, max_str) — the data-quality sibling of ``discovery_stats``
    (the reference profiles at table granularity; operations teams
    profile columns before trusting a sync).

    ONE pass over the table: every column's aggregates compute in the
    same map-side partial aggregation (count + count(col) + HLL
    distinct + min/max), and the single wide row unpivots to one row
    per column with ``stack`` — no per-column jobs, no shuffle beyond
    the scalar agg. ``n_distinct`` is exact here; at 100 TB swap the
    `countDistinct` for `approx_count_distinct` (documented HLL
    discipline) — the plan shape does not change. min/max are cast to
    string so heterogeneous column types share one output schema (the
    display shape, like the reference's grid)."""
    cols = list(cols or df.columns)
    # positional internal aliases + escaped label literals: column names
    # are DATA here (a profiled table can legally have spaces, dots, or
    # quotes in its names) and must never be spliced into SQL as syntax
    def ref(c: str):
        # backtick-quote (with doubling) so dots/spaces/quotes in real
        # column names resolve as literal names, not nested-field paths
        return F.col("`" + c.replace("`", "``") + "`")

    aggs: list = [F.count(F.lit(1)).alias("__n")]
    for i, c in enumerate(cols):
        aggs += [
            F.count(ref(c)).alias(f"__nn_{i}"),
            F.countDistinct(ref(c)).alias(f"__nd_{i}"),
            F.min(ref(c)).cast("string").alias(f"__mn_{i}"),
            F.max(ref(c)).cast("string").alias(f"__mx_{i}"),
        ]
    wide = df.agg(*aggs)
    labels = {f"__lbl_{i}": F.lit(c) for i, c in enumerate(cols)}
    wide = wide.withColumns(labels)
    stack_args = ", ".join(
        f"__lbl_{i}, __nn_{i}, __nd_{i}, __mn_{i}, __mx_{i}" for i in range(len(cols))
    )
    return wide.selectExpr(
        "__n as n_rows",
        f"stack({len(cols)}, {stack_args}) as (column, n_non_null, n_distinct, min_str, max_str)",
    ).selectExpr(
        "column",
        "n_rows",
        "cast(n_rows - n_non_null as bigint) as n_nulls",
        "cast(n_distinct as bigint) as n_distinct",
        "min_str",
        "max_str",
    )


def profile_drift(old: DataFrame, new: DataFrame) -> DataFrame:
    """Per-column drift between two :func:`profile_columns` outputs —
    the snapshot-over-snapshot data-quality monitor (run it on
    yesterday's vs today's table version before trusting a sync, the
    operational sibling of the reference's pre-sync table checks).

    Emits one row per column present in EITHER profile:
    ``status`` = added | removed | changed | stable, the raw
    old/new row counts, null rates in integer basis points (exact
    integer division — no float drift in the monitor itself),
    ``distinct_ratio_bp`` (new/old distinct count, bp; NULL when the
    column is new or previously empty), and ``range_changed`` (either
    bound moved). Pure DataFrame composition over two metadata-sized
    profile frames — cost is the two profile passes, the diff itself
    is free."""
    o = old.select(
        "column",
        F.col("n_rows").alias("old_rows"),
        F.col("n_nulls").alias("old_nulls"),
        F.col("n_distinct").alias("old_distinct"),
        F.col("min_str").alias("old_min"),
        F.col("max_str").alias("old_max"),
    )
    n = new.select(
        "column",
        F.col("n_rows").alias("new_rows"),
        F.col("n_nulls").alias("new_nulls"),
        F.col("n_distinct").alias("new_distinct"),
        F.col("min_str").alias("new_min"),
        F.col("max_str").alias("new_max"),
    )
    j = o.join(n, on="column", how="full_outer")
    bp = lambda nulls, rows: F.when(  # noqa: E731
        F.col(rows) > 0, F.expr(f"{nulls} * 10000 DIV {rows}")
    )
    range_changed = ~(
        F.col("old_min").eqNullSafe(F.col("new_min"))
        & F.col("old_max").eqNullSafe(F.col("new_max"))
    )
    changed = (
        range_changed
        | (F.col("old_distinct") != F.col("new_distinct"))
        | (F.col("old_nulls") != F.col("new_nulls"))
        | (F.col("old_rows") != F.col("new_rows"))
    )
    status = (
        F.when(F.col("old_rows").isNull(), F.lit("added"))
        .when(F.col("new_rows").isNull(), F.lit("removed"))
        .when(changed, F.lit("changed"))
        .otherwise(F.lit("stable"))
    )
    ratio = F.when(
        (F.col("old_distinct") > 0) & F.col("new_distinct").isNotNull(),
        F.expr("new_distinct * 10000 DIV old_distinct"),
    )
    return j.select(
        "column",
        status.alias("status"),
        "old_rows",
        "new_rows",
        bp("old_nulls", "old_rows").alias("old_null_bp"),
        bp("new_nulls", "new_rows").alias("new_null_bp"),
        ratio.cast("long").alias("distinct_ratio_bp"),
        range_changed.alias("range_changed"),
    )
