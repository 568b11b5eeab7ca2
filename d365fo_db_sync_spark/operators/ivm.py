"""Incremental view maintenance for additive rollups.

A 100 TB fact table with a per-key rollup on top cannot afford a full
re-aggregation every CDC cycle; the IVM identity for distributive
aggregates (COUNT/SUM — the classic deferred-maintenance result from
the materialized-view literature, Gupta & Mumick's survey) is that a
change batch folds into the view as a DELTA:

    insert row  ->  (+1, +measures)
    delete row  ->  (-1, -measures)
    update row  ->  delete(old) + insert(new)

so the maintained view only ever touches |affected groups| rows —
O(batch), never O(table). AVG and friends derive at read time from
(sum, count); MIN/MAX are deliberately out of scope (they are not
self-maintainable under deletes without a full group rescan, the
standard caveat).

Exactness: measures accumulate as DECIMAL (order-independent), so the
maintained view is bit-identical to a from-scratch recompute — the
property the suite query oracles. Plan shape: the delta is ONE
partially-aggregated groupBy over the change batch; the apply is one
full-outer join on the group key against the |groups|-sized view
(broadcast when small), dropping groups whose maintained count reaches
zero.

Reference parity: the reference recomputes its control aggregates from
SQL Server on every cycle (`/root/reference/DBSyncTool/Services/
AxDbDataService.cs` COUNT/MAX control scans); incremental maintenance
is this engine's scale path for the same numbers.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "SIGN_COL",
    "apply_rollup_delta",
    "rollup_delta",
    "rollup_full",
    "signed_update",
]

SIGN_COL = "__sign"

_DEC = "decimal(28,6)"


def signed_update(old: DataFrame, new: DataFrame) -> DataFrame:
    """Express an update batch as IVM change rows: every ``old`` row
    with sign -1 unioned with every ``new`` row with sign +1. Columns
    must match."""
    return old.withColumn(SIGN_COL, F.lit(-1)).unionByName(
        new.withColumn(SIGN_COL, F.lit(1))
    )


def rollup_delta(
    changes: DataFrame,
    group_cols: Sequence[str],
    measure_cols: Sequence[str],
) -> DataFrame:
    """Fold a signed change batch into a per-group delta: ``d_cnt``
    plus ``d_sum_<m>`` for every measure, measures accumulated as
    exact DECIMAL. ``changes`` must carry :data:`SIGN_COL` (+1/-1 —
    use :func:`signed_update` for update batches). One
    partially-aggregated exchange over the batch."""
    gcols = list(group_cols)
    sign = F.col(SIGN_COL)
    aggs = [F.sum(sign.cast("long")).alias("d_cnt")]
    for m in measure_cols:
        aggs.append(
            F.sum(sign.cast(_DEC) * F.col(m).cast(_DEC)).alias(f"d_sum_{m}")
        )
    return changes.groupBy(*gcols).agg(*aggs)


def apply_rollup_delta(
    view: DataFrame,
    delta: DataFrame,
    group_cols: Sequence[str],
    measure_cols: Sequence[str],
) -> DataFrame:
    """Merge a :func:`rollup_delta` into the maintained view (columns
    ``cnt`` + ``sum_<m>``, same DECIMAL type): full-outer on the group
    key, null-safe addition, groups whose count reaches zero drop out.
    O(|view| + |delta|) — the fact table is never touched. The
    full-outer join (a brand-new group must surface from the delta
    side, a drained group from the view side) rules out a broadcast
    build in Spark, so this is one hash exchange of two
    group-cardinality-sized frames — negligible next to any fact
    scan."""
    gcols = list(group_cols)
    joined = view.join(delta, on=gcols, how="full_outer")

    def add(a: str, b: str, typ: str):
        return (
            F.coalesce(F.col(a), F.lit(0).cast(typ))
            + F.coalesce(F.col(b), F.lit(0).cast(typ))
        )

    out = joined.select(
        *gcols,
        add("cnt", "d_cnt", "long").alias("cnt"),
        *[
            add(f"sum_{m}", f"d_sum_{m}", _DEC).cast(_DEC).alias(f"sum_{m}")
            for m in measure_cols
        ],
    )
    return out.filter(F.col("cnt") != 0)


def rollup_full(
    df: DataFrame,
    group_cols: Sequence[str],
    measure_cols: Sequence[str],
) -> DataFrame:
    """From-scratch rollup with the same column/typing contract as the
    maintained view — the initializer (and the recompute an IVM test
    compares against)."""
    gcols = list(group_cols)
    return df.groupBy(*gcols).agg(
        F.count("*").alias("cnt"),
        *[
            F.sum(F.col(m).cast(_DEC)).cast(_DEC).alias(f"sum_{m}")
            for m in measure_cols
        ],
    )
