"""Regular-grid resampling with gap filling for event streams.

Event tables are irregular; downstream consumers (dashboards, feature
pipelines, anomaly detectors) want a REGULAR grid — one row per
(key, interval) even when nothing happened — with carried-forward
values over the gaps. The classic warehouse recipe, Spark-first:

1. bucket each event to its interval start (all-codegen
   timestampdiff/timestampadd arithmetic against a fixed NTZ epoch —
   deliberately NOT unix_timestamp, which reads TIMESTAMP_NTZ through
   the SESSION timezone and would shift bucket boundaries under
   TZ=America/New_York) and aggregate per (key, bucket) — one shuffle;
2. build each key's date spine as a ``sequence()`` ARRAY from its own
   min to the global max bucket, exploded executor-side — never a
   driver-side date loop, never a cross join against a spine table;
3. left-join observations onto the spine (same (key, bucket)
   partitioning) and forward-fill with ``last(value,
   ignorenulls=True)`` over an UNBOUNDED PRECEDING window per key —
   one more shuffle, ordered by bucket.

Scale shape: 2 shuffles; the spine explode multiplies rows only by
the grid density (bounded, chosen by the caller via ``interval``),
and every expression stays in whole-stage codegen.

Reference stake: the reference engine has no time-series stage; this
belongs to the analytics extension surface (the events table's
consumers), same tier as the as-of and interval joins.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["interval_bucket", "resample_ffill", "sessionize", "rolling_time_agg"]

_EPOCH = "TIMESTAMP_NTZ '1970-01-01 00:00:00'"


def interval_bucket(ts_col: str, interval_seconds: int) -> Column:
    """Floor a timestamp column to its interval start, timezone-free:
    seconds measured against a fixed NTZ epoch via timestampdiff, so
    TIMESTAMP_NTZ inputs bucket identically under every session
    timezone (unix_timestamp would not)."""
    n = int(interval_seconds)
    return F.expr(
        f"timestampadd(SECOND, "
        f"CAST(floor(timestampdiff(SECOND, {_EPOCH}, "
        f"CAST({ts_col} AS TIMESTAMP_NTZ)) / {n}) AS BIGINT) * {n}, {_EPOCH})"
    )


def resample_ffill(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    agg: dict[str, Column],
    interval_seconds: int = 86_400,
    fill_cols: list[str] | None = None,
    until: str = "global_max",
    max_gap_intervals: int | None = None,
) -> DataFrame:
    """Aggregate ``df`` onto a regular time grid and fill the gaps.

    Returns one row per (keys, bucket_ts) from each key's FIRST
    observation to a per-key horizon. ``agg`` maps output column
    name -> aggregate expression (evaluated per (keys, bucket));
    ``fill_cols`` (default: all agg outputs) are forward-filled from
    the key's most recent observed bucket. ``is_observed`` marks real
    vs gap rows (a dedicated sentinel, so aggregates that are
    legitimately NULL on observed buckets don't misclassify).
    Aggregates NOT forward-filled keep NULL on gap rows (callers
    COALESCE to taste, e.g. counts to 0).

    The horizon bounds the spine explode — the scale lever at 100×:

    - ``until="global_max"`` (default): every key runs to the corpus's
      last bucket, the dense-grid contract dashboards expect. At
      millions of keys × a multi-year horizon this lets a key observed
      once on day 1 emit a gap row per interval to the end of time.
    - ``until="key_max"``: each key stops at its OWN last observed
      bucket — dead keys generate zero tail rows.
    - ``max_gap_intervals=N`` (with ``until="global_max"``): each key
      runs at most N intervals past its own last observation,
      ``min(global_max, key_max + N*interval)`` — the carry-forward
      stays fresh-bounded while live keys still reach the horizon.
    """
    if not agg:
        raise ValueError("agg must name at least one aggregate")
    if until not in ("global_max", "key_max"):
        raise ValueError(f"until must be global_max|key_max, got {until!r}")
    if max_gap_intervals is not None and max_gap_intervals < 0:
        raise ValueError(f"max_gap_intervals must be >= 0, got {max_gap_intervals}")
    if until == "key_max" and max_gap_intervals is not None:
        raise ValueError(
            "max_gap_intervals only applies with until='global_max' "
            "(key_max already stops at each key's last observation)"
        )
    fill_cols = list(agg) if fill_cols is None else fill_cols
    obs = (
        df.withColumn("bucket_ts", interval_bucket(ts_col, interval_seconds))
        .groupBy(*key_cols, "bucket_ts")
        .agg(
            *[expr.alias(name) for name, expr in agg.items()],
            F.lit(True).alias("__obs"),
        )
    )
    # per-key spine: first observed bucket .. per-key horizon. The
    # global bound stays IN-PLAN as a broadcast 1-row aggregate (a
    # collected datetime would re-enter through F.lit as a session-tz
    # TIMESTAMP literal and shift under non-UTC sessions — caught by
    # the timezone-independence test); the per-key sequence is an
    # array built and exploded on the executors.
    bounds = obs.groupBy(*key_cols).agg(
        F.min("bucket_ts").alias("lo"), F.max("bucket_ts").alias("__key_hi")
    )
    if until == "key_max":
        bounds = bounds.withColumn("hi", F.col("__key_hi"))
    else:
        hi = obs.agg(F.max("bucket_ts").alias("__global_hi"))
        bounds = bounds.crossJoin(F.broadcast(hi))
        if max_gap_intervals is None:
            bounds = bounds.withColumn("hi", F.col("__global_hi"))
        else:
            capped = F.expr(
                f"timestampadd(SECOND, "
                f"{int(max_gap_intervals) * int(interval_seconds)}, __key_hi)"
            )
            bounds = bounds.withColumn("hi", F.least(F.col("__global_hi"), capped))
    spine = (
        bounds
        .select(
            *key_cols,
            F.explode(
                F.sequence(
                    F.col("lo"),
                    F.col("hi"),
                    F.expr(f"INTERVAL {int(interval_seconds)} SECOND"),
                )
            ).alias("bucket_ts"),
        )
    )
    joined = spine.join(obs, on=[*key_cols, "bucket_ts"], how="left")
    w = (
        Window.partitionBy(*key_cols)
        .orderBy("bucket_ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = joined.withColumn("is_observed", F.coalesce("__obs", F.lit(False)))
    for c in fill_cols:
        out = out.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return out.drop("__obs")


def sessionize(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    gap_seconds: int = 1800,
    tiebreak_cols: list[str] | None = None,
    session_col: str = "session_id",
) -> DataFrame:
    """Per-EVENT session labels: a new session starts when the gap from
    the key's previous event exceeds ``gap_seconds`` (exclusive — a
    gap of exactly the threshold stays in-session, matching
    ``session_window``'s semantics). ``session_col`` is the key-scoped
    session ordinal (1, 2, ...), so (keys, session_id) identifies a
    session. The batch complement of the streaming
    ``stateful_sessionize``: that one emits per-session aggregates as
    state expires; this labels every ROW for downstream joins (funnel
    steps, per-session features).

    ``tiebreak_cols`` extend the ordering past the timestamp — pass a
    unique column (event id) whenever timestamps can collide, or the
    lag/cumsum order (and thus labels at the collision) is
    tie-ambiguous.

    Plan: one shuffle+sort on (keys, ts, tiebreaks); the lag and the
    running new-session count ride the SAME window spec, so Spark
    reuses one sort. Gap math is timestampdiff(MICROSECOND) —
    session-timezone-free on NTZ inputs, exact at the boundary.
    """
    order = [F.col(ts_col)] + [F.col(c) for c in (tiebreak_cols or [])]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    prev = F.lag(ts_col).over(w)
    with_prev = df.withColumn("__prev_ts", prev)
    gap_us = F.expr(f"timestampdiff(MICROSECOND, __prev_ts, {ts_col})")
    is_new = (
        F.col("__prev_ts").isNull() | (gap_us > F.lit(int(gap_seconds) * 1_000_000))
    ).cast("int")
    run = (
        Window.partitionBy(*key_cols)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return with_prev.withColumn(session_col, F.sum(is_new).over(run)).drop(
        "__prev_ts"
    )


def rolling_time_agg(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    aggs: dict[str, Column],
    window_seconds: int,
) -> DataFrame:
    """Trailing time-window aggregates per key: every row gets each
    aggregate computed over the key's rows with ``ts`` in the half-open
    window ``(row_ts - window_seconds, row_ts]`` — the 7-day rolling
    sum / 24-hour rolling count shape.

    Implemented as a RANGE frame over a MICROSECOND epoch ordinal
    (timestampdiff against the fixed NTZ epoch — session-timezone-free
    and DST-safe, where ordering by unix_timestamp would not be;
    microseconds, not seconds, so sub-second timestamps don't alias
    onto the same ordinal and the window bound is exact). One
    shuffle+sort per key; all aggregates share the frame, so Spark
    evaluates them in one window pass.
    """
    if window_seconds < 1:
        raise ValueError(f"window_seconds must be >= 1, got {window_seconds}")
    us = F.expr(
        f"timestampdiff(MICROSECOND, {_EPOCH}, CAST({ts_col} AS TIMESTAMP_NTZ))"
    )
    lo = -(int(window_seconds) * 1_000_000 - 1)
    out = df.withColumn("__us", us)
    w = (
        Window.partitionBy(*key_cols)
        .orderBy("__us")
        .rangeBetween(lo, Window.currentRow)
    )
    for name, expr in aggs.items():
        out = out.withColumn(name, expr.over(w))
    return out.drop("__us")
