"""Skew-mitigation operators.

AQE's skew-join splitting covers joins (session.py turns it on); what it
does NOT cover is a skewed *aggregation* whose hot keys funnel into one
reducer. The classic fix is salting: two-stage aggregation where stage 1
groups on (key, salt) — spreading a hot key over S reducers — and
stage 2 merges the S partials per key. Correct for any agg that
decomposes into partial+final (sum/count/min/max and anything built
from them).

At 100 TB: pick salt ≈ executor-core count for the hot keys; the cost is
one extra (tiny) shuffle of S rows per key, the win is removing the
single-reducer ceiling on the hot key.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    salt: int = 32,
) -> DataFrame:
    """Two-stage salted aggregation.

    ``aggs`` maps output column -> (input column, op) with op in
    {sum, count, min, max}. Example::

        salted_agg(df, ["k"], {"total": ("v", "sum"), "n": ("*", "count")})

    is equivalent to ``df.groupBy("k").agg(sum(v), count(*))`` but never
    concentrates one key on one reducer.
    """
    partial_ops = {
        "sum": F.sum,
        "count": lambda c: F.count(F.lit(1)) if c == "*" else F.count(c),
        "min": F.min,
        "max": F.max,
    }
    merge_ops = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}

    salted = df.withColumn("__salt", F.pmod(F.monotonically_increasing_id(), F.lit(salt)))
    stage1 = salted.groupBy(*keys, "__salt").agg(
        *[
            partial_ops[op](col).alias(f"__p_{out}")
            for out, (col, op) in aggs.items()
        ]
    )
    stage2 = stage1.groupBy(*keys).agg(
        *[
            merge_ops[op](f"__p_{out}").alias(out)
            for out, (col, op) in aggs.items()
        ]
    )
    return stage2


def top_frequent_keys(df: DataFrame, key: str, min_count: int) -> DataFrame:
    """Hot-key detector: keys whose row count exceeds ``min_count`` —
    the stats pass that decides which keys need salting / isolation
    (the same role as AQE's skewedPartitionFactor, but at key grain)."""
    return (
        df.groupBy(key)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= min_count)
        .orderBy(F.desc("cnt"), F.asc(key))
    )


def skew_profile(df: DataFrame, key_cols: Sequence[str], top_k: int = 10) -> DataFrame:
    """Skew advisor: the top-``top_k`` hottest keys with the numbers an
    operator needs to pick a mitigation — ``cnt``, ``rank``,
    ``share_bp`` (basis points of all rows, integer) and
    ``salt_factor`` = ceil(cnt / avg-rows-per-key), the salt width that
    levels this key back to an average reducer's load (1 = not skewed).

    All integer arithmetic, so the report is value-checkable
    cross-engine. Scale shape: one groupBy on the key (map-side partial
    counts); the hot set comes from ``orderBy().limit()`` — Catalyst
    plans TakeOrderedAndProject, a per-partition top-k + single merge
    of ``top_k`` rows per partition, never a global sort — and the
    corpus-wide totals ride a 1-row aggregate broadcast back. The rank
    window runs AFTER the limit, on a ``top_k``-row frame (the pmod
    partition key makes the single-partition choice explicit)."""
    if top_k <= 0:
        raise ValueError(f"top_k must be positive, got {top_k}")
    from pyspark.sql import Window

    counts = df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("cnt"))
    stats = counts.agg(
        F.sum("cnt").alias("__total"), F.count(F.lit(1)).alias("__n_keys")
    )
    hot = counts.orderBy(F.desc("cnt"), *key_cols).limit(top_k)
    w = Window.partitionBy(F.pmod(F.col("cnt"), F.lit(1))).orderBy(
        F.desc("cnt"), *key_cols
    )
    return (
        hot.crossJoin(F.broadcast(stats))
        .withColumn("rank", F.row_number().over(w))
        .withColumn("share_bp", F.expr("cnt * 10000 div __total"))
        # avg-first, not cnt*n_keys/total: the cross product overflows
        # BIGINT once total*n_keys passes 2^63 (realistic at 10^11 rows
        # x 10^8 keys); dividing first keeps every intermediate within
        # the row count's own magnitude
        .withColumn("__avg", F.expr("greatest(__total div __n_keys, 1)"))
        .withColumn("salt_factor", F.expr("(cnt + __avg - 1) div __avg"))
        .drop("__total", "__n_keys", "__avg")
    )


def salt_column(num_buckets: int, cols: Sequence[str | Column] = ()) -> Column:
    """Deterministic salt from row content (xxhash64 mod buckets) when
    reproducibility matters more than perfect balance; without content
    columns, falls back to a physical-row spread."""
    if cols:
        return F.pmod(F.abs(F.xxhash64(*cols)), F.lit(num_buckets))
    return F.pmod(F.monotonically_increasing_id(), F.lit(num_buckets))
