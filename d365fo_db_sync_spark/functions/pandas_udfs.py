"""Pandas-UDF / UDAF surface (U4) — the sanctioned slow path.

The engine's rule (SCALE.md): built-in column expressions first; when
Python is genuinely needed, Arrow-batched pandas UDFs — never
row-at-a-time Python UDFs. This module holds the reference
implementations of that pattern:

* :func:`cosine_pandas_udf` — vectorized numpy cosine against a fixed
  query vector. Semantically identical to the JVM higher-order fold in
  operators/similarity.py (equivalence is pytest-asserted); exists for
  workloads where the scoring math outgrows SQL expressions (learned
  re-rankers, custom kernels).
* :func:`grouped_robust_stats` — applyInPandas grouped aggregation
  computing median absolute deviation, a statistic with no built-in
  aggregate. One Arrow round-trip per group partition.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def cosine_pandas_udf(query_vec: list[float]):
    """Returns a Series->Series pandas UDF scoring cosine(v, query_vec).

    numpy vectorizes across the Arrow batch: one BLAS dot per row
    without leaving the batch buffer. ~10-100x a row-at-a-time Python
    UDF; still slower than the JVM fold for simple dots — use only when
    the math can't stay in SQL.
    """
    import numpy as np

    q = np.asarray(query_vec, dtype=np.float64)
    qn = float(np.sqrt((q * q).sum()))

    @F.pandas_udf(T.DoubleType())
    def _cos(vecs: pd.Series) -> pd.Series:
        out = []
        for v in vecs:
            a = np.asarray(v, dtype=np.float64)
            na = float(np.sqrt((a * a).sum()))
            out.append(float(a.dot(q)) / (na * qn) if na and qn else None)
        return pd.Series(out)

    return _cos


ROBUST_STATS_SCHEMA = T.StructType(
    [
        T.StructField("group_key", T.StringType()),
        T.StructField("n", T.LongType()),
        T.StructField("median", T.DoubleType()),
        T.StructField("mad", T.DoubleType()),
    ]
)


def grouped_robust_stats(df: DataFrame, group_col: str, value_col: str) -> DataFrame:
    """Median absolute deviation per group via applyInPandas — a UDAF
    shape Spark has no built-in for. Groups shuffle once on the key;
    each group is one pandas frame (callers must ensure per-group data
    fits an executor — at 100 TB pre-aggregate or sample first)."""

    def stats(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf[value_col].astype(float)
        med = float(v.median())
        mad = float((v - med).abs().median())
        return pd.DataFrame(
            {
                "group_key": [str(pdf[group_col].iloc[0])],
                "n": [len(v)],
                "median": [med],
                "mad": [mad],
            }
        )

    return df.groupBy(group_col).applyInPandas(stats, schema=ROBUST_STATS_SCHEMA)


def sentence_split_udtf():
    """User-defined TABLE function (the §2.10 UDTF leg): one input row
    -> N output rows, here splitting a document into
    ``(idx, sentence)`` on '.' boundaries. Lazily constructed because
    the @udtf decorator registers against the active session's config.

    Same contract as the rest of this module: the UDTF is the
    sanctioned SLOW path for row-expanding logic that genuinely cannot
    stay in SQL (stateful parsers, ML tokenizers yielding variable
    rows). THIS example can stay in SQL — ``posexplode(split(...))``
    is the codegen equivalent, and the pytest suite asserts the two
    produce identical rows — which is exactly why it is the reference
    implementation: the equivalence proves the UDTF wiring without
    smuggling Python into any hot path."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="idx int, sentence string")
    class SentenceSplit:
        def eval(self, text: str):
            if text is None:
                return
            idx = 0
            for raw in text.split("."):
                s = raw.strip()
                if s:
                    yield idx, s
                    idx += 1

    return SentenceSplit
