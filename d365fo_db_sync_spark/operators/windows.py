"""Window operators (SURVEY §2.5 generalization + §2.9 event-time windows).

The reference's only ranking construct is a global top-N executed once per
table in a loop (CopyOrchestrator.cs:446-495, 1920-1921). The scale
generalization is "last N rows per group" in ONE pass: a ranking window
partitioned by the group key — one shuffle total instead of one query per
group. Event-time tumbling/sliding/session windows cover the `events`
stream table in batch mode; the same expressions run under Structured
Streaming (d365fo_db_sync_spark.streaming).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_n_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    order_col: str,
    n: int,
    descending: bool = True,
    tiebreakers: Sequence[str] = (),
) -> DataFrame:
    """Last/first N rows per group via row_number — one shuffle on the
    group key. ``order_col`` + ``tiebreakers`` must be unique per group
    for deterministic output."""
    ordering = [F.desc(order_col) if descending else F.asc(order_col)]
    ordering += [F.desc(t) if descending else F.asc(t) for t in tiebreakers]
    w = Window.partitionBy(*group_cols).orderBy(*ordering)
    return (
        df.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= n)
        .drop("rn")
    )


def top_n_per_group_salted(
    df: DataFrame,
    group_cols: Sequence[str],
    order_col: str,
    n: int,
    descending: bool = True,
    tiebreakers: Sequence[str] = (),
    salt_buckets: int = 32,
) -> DataFrame:
    """Hot-group-safe top-N: identical output to :func:`top_n_per_group`
    but a group's rows never funnel through one task.

    A ranking window moves EVERY row of a group to the task that owns
    its partition key — a hot group (one tenant, one table id) with
    10^9 rows at 100 TB stalls the stage on that task. Two stages fix
    the funnel: (1) rank within (group, salt) — the hot group's rows
    spread over ``salt_buckets`` tasks, each keeping its local top-N;
    (2) rank the surviving ≤ salt_buckets × N rows per group globally.
    The global top-N is contained in the union of per-salt top-Ns, so
    the result is exact; with ``order_col`` + ``tiebreakers`` unique
    per group it is deterministic. Cost: a second (tiny) shuffle of
    N × salt_buckets rows per group — noise next to the stage-1 spread.

    The salt is a hash of the ordering columns, not a random number:
    reruns and speculative task retries land every row in the same
    bucket, keeping the operator idempotent.
    """
    ordering = [F.desc(order_col) if descending else F.asc(order_col)]
    ordering += [F.desc(t) if descending else F.asc(t) for t in tiebreakers]
    salt = F.pmod(F.xxhash64(order_col, *tiebreakers), F.lit(salt_buckets))
    local_w = Window.partitionBy(*group_cols, "__salt").orderBy(*ordering)
    survivors = (
        df.withColumn("__salt", salt)
        .withColumn("__rn", F.row_number().over(local_w))
        .filter(F.col("__rn") <= n)
        .drop("__salt", "__rn")
    )
    return top_n_per_group(
        survivors, group_cols, order_col, n, descending, tiebreakers
    )


def with_rank(
    df: DataFrame,
    group_cols: Sequence[str],
    order_exprs: Sequence[Column],
    kind: str = "row_number",
    out: str = "rnk",
) -> DataFrame:
    """Ranking window: row_number / rank / dense_rank / percent_rank."""
    fn = {
        "row_number": F.row_number,
        "rank": F.rank,
        "dense_rank": F.dense_rank,
        "percent_rank": F.percent_rank,
    }[kind]
    w = Window.partitionBy(*group_cols).orderBy(*order_exprs)
    return df.withColumn(out, fn().over(w))


def with_lag_lead(
    df: DataFrame,
    group_cols: Sequence[str],
    order_cols: Sequence[str],
    value_col: str,
    offset: int = 1,
) -> DataFrame:
    """Analytic lag/lead over a deterministic ordering."""
    w = Window.partitionBy(*group_cols).orderBy(*[F.asc(c) for c in order_cols])
    return df.withColumn(f"prev_{value_col}", F.lag(value_col, offset).over(w)).withColumn(
        f"next_{value_col}", F.lead(value_col, offset).over(w)
    )


def with_running_agg(
    df: DataFrame,
    group_cols: Sequence[str],
    order_cols: Sequence[str],
    value_col: str,
    agg: str = "sum",
    out: str | None = None,
) -> DataFrame:
    """Running aggregate with an unbounded-preceding→current frame —
    the reference's incremental ETA/progress-rate analog
    (CopyOrchestrator.cs:474-492)."""
    w = (
        Window.partitionBy(*group_cols)
        .orderBy(*[F.asc(c) for c in order_cols])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fn = {"sum": F.sum, "avg": F.avg, "min": F.min, "max": F.max, "count": F.count}[agg]
    return df.withColumn(out or f"running_{agg}", fn(value_col).over(w))


def _select_window(res: DataFrame, start: str, end: str) -> DataFrame:
    others = [c for c in res.columns if c != "w"]
    return res.select(
        F.col("w.start").alias(start), F.col("w.end").alias(end), *others
    )


def tumbling_window_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    agg_exprs: Sequence[Column],
    extra_group: Sequence[str] = (),
) -> DataFrame:
    """Tumbling event-time window aggregate. Output includes
    ``window_start``/``window_end``. The identical expression runs on a
    streaming DataFrame under a watermark."""
    win = F.window(F.col(ts_col), duration)
    res = df.groupBy(win.alias("w"), *extra_group).agg(*agg_exprs)
    return _select_window(res, "window_start", "window_end")


def sliding_window_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    slide: str,
    agg_exprs: Sequence[Column],
    extra_group: Sequence[str] = (),
) -> DataFrame:
    """Sliding event-time window aggregate (each row lands in
    duration/slide windows)."""
    win = F.window(F.col(ts_col), duration, slide)
    res = df.groupBy(win.alias("w"), *extra_group).agg(*agg_exprs)
    return _select_window(res, "window_start", "window_end")


def session_window_agg(
    df: DataFrame,
    ts_col: str,
    gap: str,
    group_cols: Sequence[str],
    agg_exprs: Sequence[Column],
) -> DataFrame:
    """Session windows: rows closer than ``gap`` merge into one session
    per group."""
    win = F.session_window(F.col(ts_col), gap)
    res = df.groupBy(win.alias("w"), *group_cols).agg(*agg_exprs)
    return _select_window(res, "session_start", "session_end")
