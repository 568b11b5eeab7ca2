"""As-of (temporal) join — an operator Spark lacks natively.

``asof_join(left, right)`` attaches to each left row the latest right
row with the same key and ``right_ts <= left_ts`` (backward direction,
inclusive — the financial-data default and DuckDB's ``ASOF JOIN ON
l.ts >= r.ts`` semantics).

Implementation is the union + window trick, not a range join: tag both
sides, union on (key, ts), and carry the right side's values forward
with ``last(ignorenulls=True)`` over an unbounded-preceding window per
key. Cost is ONE shuffle on the key (the window sort), independent of
how far back matches reach — a banded range join would shuffle
per-band and explode on sparse keys. At equal timestamps the right row
sorts first, so the left row sees it (inclusive match).
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
) -> DataFrame:
    """Backward-inclusive as-of join.

    ``right_cols`` maps right-side column -> output alias; every left
    column is preserved. Left rows with no earlier right row keep NULLs
    (left-join semantics). If several right rows share (key, ts), the
    one latest in the window order wins — callers needing a specific
    tiebreak should pre-dedupe the right side.
    """
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
    w = (
        Window.partitionBy("__k")
        .orderBy(F.col("__t").asc(), F.col("__is_right").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        "__is_right",
        "__left",
        *[F.last(dst, ignorenulls=True).over(w).alias(dst) for dst in out_aliases],
    )
    return filled.filter(F.col("__is_right") == 0).select(
        *[F.col(f"__left.{c}").alias(c) for c in left.columns],
        *out_aliases,
    )
