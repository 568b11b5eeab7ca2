"""As-of (temporal) join — an operator Spark lacks natively.

``asof_join(left, right)`` attaches to each left row the latest right
row with the same key and ``right_ts <= left_ts`` (backward direction,
inclusive — the financial-data default and DuckDB's ``ASOF JOIN ON
l.ts >= r.ts`` semantics). ``direction="forward"`` flips it to the
EARLIEST right row with ``right_ts >= left_ts``; ``tolerance_seconds``
bounds the staleness (a match further than the tolerance reads as no
match — the pandas ``merge_asof(tolerance=...)`` contract, which is
what keeps day-old quotes from silently enriching fresh events).

Implementation is the union + window trick, not a range join: tag both
sides, union on (key, ts), and carry the right side's values forward
with ``last(ignorenulls=True)`` over an unbounded-preceding window per
key (reversed ordering for the forward direction). Cost is ONE shuffle
on the key (the window sort), independent of how far back matches
reach — a banded range join would shuffle per-band and explode on
sparse keys. At equal timestamps the right row sorts first, so the
left row sees it (inclusive match in both directions). Tolerance adds
no shuffle: the matched timestamp rides the same window and a codegen
conditional nulls out-of-range matches.

The carry is ONE struct holding the matched right row's timestamp AND
all its value columns, filled by a single ``last(ignorenulls=True)``.
Filling each value column independently would be wrong: a NULL field
in the nearest right row would make ``last`` skip to an OLDER right
row for that column only, mixing (ts, value) across rows and letting
an out-of-tolerance stale value through the tolerance gate. A struct
with NULL fields is itself non-NULL, so the single fill pins every
output to the one matched row — pandas ``merge_asof`` / DuckDB
``ASOF JOIN`` row semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: dict[str, str],
    direction: str = "backward",
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """As-of join, backward- or forward-inclusive, optionally bounded.

    ``right_cols`` maps right-side column -> output alias; every left
    column is preserved. Left rows with no matching right row (none in
    the direction, or none within ``tolerance_seconds``) keep NULLs
    (left-join semantics). If several right rows share (key, ts), the
    one latest in the window order wins — callers needing a specific
    tiebreak should pre-dedupe the right side.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    out_aliases = list(right_cols.values())
    l_tagged = left.select(
        F.col(on).alias("__k"),
        F.col(left_ts).alias("__t"),
        F.lit(0).alias("__is_right"),
        F.struct(*left.columns).alias("__left"),
        *[F.lit(None).cast(dict(right.dtypes)[src]).alias(dst) for src, dst in right_cols.items()],
    )
    r_tagged = right.select(
        F.col(on).alias("__k"),
        F.col(right_ts).alias("__t"),
        F.lit(1).alias("__is_right"),
        F.lit(None).cast(
            "struct<" + ", ".join(f"{c}: {t}" for c, t in left.dtypes) + ">"
        ).alias("__left"),
        *[F.col(src).alias(dst) for src, dst in right_cols.items()],
    )
    unioned = l_tagged.unionByName(r_tagged)
    t_order = F.col("__t").asc() if direction == "backward" else F.col("__t").desc()
    w = (
        Window.partitionBy("__k")
        .orderBy(t_order, F.col("__is_right").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # One struct per right row (NULL on left rows) so a single
    # ignorenulls fill carries ts + every value from the SAME matched
    # row; per-column fills would skip NULL fields to older rows.
    match_row = F.when(
        F.col("__is_right") == 1,
        F.struct(
            F.col("__t").alias("__rt"),
            *[F.col(dst).alias(dst) for dst in out_aliases],
        ),
    )
    filled = unioned.select(
        "__is_right",
        "__left",
        F.col("__t").alias("__lt"),
        F.last(match_row, ignorenulls=True).over(w).alias("__m"),
    )
    rows = filled.filter(F.col("__is_right") == 0).select(
        "__left",
        F.col("__lt").alias("__lt"),
        F.col("__m.__rt").alias("__mt"),
        *[F.col(f"__m.{dst}").alias(dst) for dst in out_aliases],
    )
    if tolerance_seconds is not None:
        # timestampdiff, NOT unix_timestamp: the latter reads
        # TIMESTAMP_NTZ through the session timezone, and two wall
        # times straddling a DST jump would mis-measure the gap by an
        # hour under a DST-observing session. MICROSECOND, not SECOND:
        # "within N seconds" is an exact comparison — second-truncated
        # diffs admit up to N+0.999 s and disagree with engines that
        # count boundary crossings
        gap = (
            F.expr("timestampdiff(MICROSECOND, __mt, __lt)")
            if direction == "backward"
            else F.expr("timestampdiff(MICROSECOND, __lt, __mt)")
        )
        in_range = F.col("__mt").isNotNull() & (
            gap <= F.lit(int(tolerance_seconds) * 1_000_000)
        )
        rows = rows.select(
            "__left",
            *[F.when(in_range, F.col(dst)).alias(dst) for dst in out_aliases],
        )
    return rows.select(
        *[F.col(f"__left.{c}").alias(c) for c in left.columns],
        *out_aliases,
    )
