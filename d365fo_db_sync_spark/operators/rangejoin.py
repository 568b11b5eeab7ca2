"""Interval-containment (range) join without a cartesian product.

Spark plans a bare ``ON p.ts BETWEEN i.start AND i.end`` as
BroadcastNestedLoopJoin (or worse, a cartesian) — fine for tiny sides,
fatal at scale. The classic fix is banding: bucket time into fixed-width
bands, explode each interval into the bands it covers, and equi-join
points to intervals on the band id before applying the exact range
predicate. The shuffle key is the band — cost scales with
points + intervals x bands/interval, never |points| x |intervals|.

Pick the band width near the typical interval length: wider bands mean
fewer exploded rows but more false candidates per band.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_col: str,
    end_col: str,
    band_seconds: int = 3600,
    equi_keys: list[str] | None = None,
) -> DataFrame:
    """Inner join of points to the intervals containing them
    (closed-open: ``start <= ts < end``). Returns all columns from both
    inputs; non-``equi_keys`` names must not collide.

    ``equi_keys`` names columns present on BOTH sides that must match
    exactly (a user id, a tenant) — they join alongside the band, so
    the shuffle key becomes ``(keys…, band)``. Without them a shared
    entity column would make every band a cross-entity hot key: all
    users' points meet all users' intervals in the band before the
    filter, which is the quadratic blowup banding exists to avoid."""
    b = F.lit(band_seconds)
    keys = list(equi_keys or [])

    def _secs(name: str):
        # TIMESTAMP_NTZ can't cast straight to long; hop through TIMESTAMP.
        # Both sides use the same conversion, so banding stays consistent.
        return F.col(name).cast("timestamp").cast("long")

    p = points.withColumn("__band", F.floor(_secs(point_ts) / b))
    i = intervals.withColumn(
        "__band",
        F.explode(F.sequence(F.floor(_secs(start_col) / b), F.floor(_secs(end_col) / b))),
    )
    return (
        p.join(i, on=["__band", *keys])
        .filter((F.col(point_ts) >= F.col(start_col)) & (F.col(point_ts) < F.col(end_col)))
        .drop("__band")
    )
