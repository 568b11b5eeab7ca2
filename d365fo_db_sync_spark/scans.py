"""Parameterized scan operators (reference family S5-S8).

These are the reference engine's four extraction shapes, re-expressed as
DataFrame transforms so Catalyst plans them:

* top-N-by-key      -> ``orderBy(desc(key)).limit(n)``; Catalyst compiles
  this to TakeOrderedAndProject — a distributed top-k (per-partition heap
  + single merge), NOT a full sort. Scales to any partition count.
* control scan      -> 2-column pruned projection before the top-k, so the
  parquet reader materializes only (key, version) — the reference's
  "~1 KB per 1000 records vs ~100 MB" optimization (README.md:234) is
  column pruning, which we get from the scan's ReadSchema.
* watermark scan    -> version/key range predicates, pushed to the scan
  (parquet min/max row-group skipping; JDBC WHERE clause).
* recency scan      -> timestamp cutoff predicate, same pushdown path.

Reference parity: Tier2DataService.cs:278-286 (S5), 336-376 (S6),
381-434 (S7), 291-311 (S8); SQL shape CopyOrchestrator.cs:1920-1921.
"""

from __future__ import annotations

import datetime as _dt
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def top_n_by_key(
    df: DataFrame,
    key: str,
    n: int,
    fields: Sequence[str] | None = None,
) -> DataFrame:
    """Last ``n`` rows by ``key`` (descending) — the reference's defining
    query shape ``SELECT TOP(n) <fields> FROM t ORDER BY key DESC``.

    Projection happens *before* the top-k so column pruning reaches the
    scan. ``key`` must be unique for deterministic results (RecId is).
    """
    if fields is not None:
        df = df.select(*fields)
    return df.orderBy(F.desc(key)).limit(n)


def control_scan(
    df: DataFrame,
    key: str = "RecId",
    version: str = "SysRowVersion",
    n: int | None = None,
) -> DataFrame:
    """2-column change-detection sidecar ``(key, version)``.

    Reference: Tier2DataService.cs:336-376 — the control query that cuts
    transfer by 99%+. Here the cut is the pruned ReadSchema.
    """
    out = df.select(key, version)
    if n is not None:
        out = out.orderBy(F.desc(key)).limit(n)
    return out


def watermark_scan(
    df: DataFrame,
    version_threshold,
    min_key,
    key: str = "RecId",
    version: str = "SysRowVersion",
    fields: Sequence[str] | None = None,
    n: int | None = None,
) -> DataFrame:
    """Incremental fetch: rows at-or-above the stored watermark and key floor.

    ``WHERE version >= threshold AND key >= min_key ORDER BY key DESC TOP(n)``
    (Tier2DataService.cs:381-434). Both predicates are simple range
    filters -> pushed to the scan (row-group skipping on parquet,
    WHERE-clause on JDBC).

    A threshold <= 0 is the late-data "fetch everything" floor
    (CopyOrchestrator.cs:1115-1118): NULL versions are admitted too —
    ``version >= 0`` alone is null-rejecting and would strand rows whose
    version was never stamped. The OR of two pushable predicates
    (range + IsNull) still reaches the parquet scan.
    """
    ver_pred = F.col(version) >= F.lit(version_threshold)
    if isinstance(version_threshold, (int, float)) and version_threshold <= 0:
        ver_pred = ver_pred | F.col(version).isNull()
    out = df.filter(ver_pred & (F.col(key) >= F.lit(min_key)))
    if fields is not None:
        out = out.select(*fields)
    if n is not None:
        out = out.orderBy(F.desc(key)).limit(n)
    return out


def recency_scan(
    df: DataFrame,
    days: int,
    now: _dt.datetime | str | None = None,
    ts_col: str = "MODIFIEDDATETIME",
) -> DataFrame:
    """Rows modified in the last ``days`` days (Tier2DataService.cs:291-311).

    ``now`` defaults to the current timestamp; pass a fixed instant for
    deterministic tests.
    """
    if now is None:
        anchor: Column = F.current_timestamp()
    else:
        # cast the literal to the column's own timestamp flavor so NTZ
        # columns never round-trip through the session timezone
        anchor = F.lit(now).cast(df.schema[ts_col].dataType)
    cutoff = anchor - F.make_interval(days=F.lit(days))
    return df.filter(F.col(ts_col) > cutoff)
