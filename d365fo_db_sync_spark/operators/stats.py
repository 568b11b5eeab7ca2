"""Group-wise correlation statistics with cross-engine-exact arithmetic.

Corpus curation keeps asking "does metric A track metric B within each
slice?" — quality score vs document length, price vs quantity, token
count vs dedup survival. Pearson answers it for linear relationships,
Spearman for monotone ones (and is the robust choice when either
metric has heavy tails, which quality scores always do).

Built-in ``F.corr`` is a streaming-moment double aggregate whose
accumulation order differs across engines (and across runs), so it
cannot be value-oracled. Both statistics here are instead assembled
from EXACT integer power sums — order-independent, no float drift —
with the closed-form ``(n·Sxy - Sx·Sy) / sqrt((n·Sxx - Sx²)(n·Syy -
Sy²))`` applied once at the end in double precision to identical
operands (the suite's BM25/packing oracle discipline):

- Spearman uses DOUBLED average ranks, which are always integers:
  ``2*avg_rank(v) = rank_asc(v) + (n + 1 - rank_desc(v))`` — the
  min-rank/max-rank identity for ties. Both rank windows partition by
  the GROUP only (one exchange, sorts reused), where the textbook
  ``rank + (ties-1)/2`` form would need a per-(group, value) window
  and a second exchange. The 2x scaling cancels in the quotient.
- Pearson scales the measures to integers once (``value · 10^scale``
  as exact DECIMAL) — the 10^scale factor likewise cancels. Power
  sums accumulate as ``DECIMAL(38,0)``.

Scale shape: ONE exchange on the group key (all four rank windows and
the final aggregate share it), no joins, no UDFs, no driver
materialization. Degenerate groups (zero variance on either side)
yield NULL via ``nullif`` rather than a division error.

Reference: the reference tool exposes only COUNT/MIN/MAX/SUM rollups
(`/root/reference/DBSyncTool/Services/Tier2DataService.cs:43-53` and
`Services/AxDbDataService.cs` build plain MAX/SUM/COUNT aggregates);
correlation is part of this engine's analytics extension surface
(SURVEY §2.4 extensions).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["group_linregress", "rank_correlation", "welch_t_test", "zscore_outliers"]

_D38 = "decimal(38,0)"


def _corr_from_sums(sx, sy, sxx, syy, sxy, n, out_prec: int) -> Column:
    """Closed-form correlation from exact power sums. All operands are
    cast to double FIRST and the expression tree is fixed, so any
    engine evaluating the same shape produces the identical IEEE
    result — exactness lives in the sums, not here."""
    nd = n.cast("double")
    num = nd * sxy.cast("double") - sx.cast("double") * sy.cast("double")
    var_x = nd * sxx.cast("double") - sx.cast("double") * sx.cast("double")
    var_y = nd * syy.cast("double") - sy.cast("double") * sy.cast("double")
    return F.round(num / F.nullif(F.sqrt(var_x * var_y), F.lit(0.0)), out_prec)


def rank_correlation(
    df: DataFrame,
    group_cols: Sequence[str],
    x: str,
    y: str,
    value_scale: int = 2,
    out_prec: int = 6,
) -> DataFrame:
    """Per-group Spearman AND Pearson correlation of ``x`` vs ``y``.

    Returns one row per group: ``(*group_cols, n, spearman, pearson)``
    with both coefficients rounded to ``out_prec`` decimals. NULL
    measures are excluded pairwise (a row missing either measure
    carries no rank information); zero-variance groups return NULL.
    ``value_scale`` is the decimal scale at which the raw measures are
    exact (Pearson quantizes to ``10^-value_scale`` before the integer
    power sums — lossless whenever the data has at most that many
    fractional digits, which is the contract the caller asserts)."""
    gcols = list(group_cols)
    base = df.select(*gcols, x, y).na.drop(subset=[x, y])
    g = Window.partitionBy(*gcols)

    def doubled_rank(col: str):
        asc = F.rank().over(g.orderBy(F.col(col).asc()))
        desc = F.rank().over(g.orderBy(F.col(col).desc()))
        return asc + F.count("*").over(g) + F.lit(1) - desc

    mul = 10**value_scale
    prec = min(38 - value_scale, 30)

    def as_int(col: str):
        dec = F.col(col).cast(f"decimal({prec},{value_scale})")
        return (dec * F.lit(mul)).cast(_D38)

    ranked = base.select(
        *gcols,
        doubled_rank(x).cast(_D38).alias("rx"),
        doubled_rank(y).cast(_D38).alias("ry"),
        as_int(x).alias("vx"),
        as_int(y).alias("vy"),
    )

    def sums(a: str, b: str, tag: str):
        return [
            F.sum(F.col(a)).alias(f"s{tag}x"),
            F.sum(F.col(b)).alias(f"s{tag}y"),
            F.sum(F.col(a) * F.col(a)).alias(f"s{tag}xx"),
            F.sum(F.col(b) * F.col(b)).alias(f"s{tag}yy"),
            F.sum(F.col(a) * F.col(b)).alias(f"s{tag}xy"),
        ]

    agg = ranked.groupBy(*gcols).agg(
        F.count("*").alias("n"), *sums("rx", "ry", "r"), *sums("vx", "vy", "v")
    )
    n = F.col("n")
    return agg.select(
        *gcols,
        "n",
        _corr_from_sums(
            F.col("srx"), F.col("sry"), F.col("srxx"),
            F.col("sryy"), F.col("srxy"), n, out_prec,
        ).alias("spearman"),
        _corr_from_sums(
            F.col("svx"), F.col("svy"), F.col("svxx"),
            F.col("svyy"), F.col("svxy"), n, out_prec,
        ).alias("pearson"),
    )


def group_linregress(
    df: DataFrame,
    group_cols: Sequence[str],
    x: str,
    y: str,
    value_scale: int = 2,
    out_prec: int = 6,
) -> DataFrame:
    """Per-group ordinary-least-squares fit of ``y = slope·x +
    intercept``: one row per group with ``(n, slope, intercept, r2)``.

    Same exactness machinery as :func:`rank_correlation` — measures
    quantize once to integers at ``value_scale``, the five power sums
    accumulate as exact DECIMAL(38,0), and the closed forms
    ``slope = (n·Sxy - Sx·Sy) / (n·Sxx - Sx²)``,
    ``intercept = (Sy - slope·Sx) / n``,
    ``r2 = (n·Sxy - Sx·Sy)² / ((n·Sxx - Sx²)(n·Syy - Sy²))``
    run once in double precision with a fixed expression tree an
    ANSI-SQL oracle mirrors. Built-in regr_slope/regr_r2 stream
    doubles and cannot be value-oracled. The 10^scale factor cancels
    in slope and r2; the intercept rescales by one final divide.
    Zero-x-variance groups return NULL (nullif, no division error);
    r2 is NULL when y has zero variance.

    ONE exchange (the groupBy); no windows, no joins."""
    gcols = list(group_cols)
    base = df.select(*gcols, x, y).na.drop(subset=[x, y])
    mul = 10**value_scale
    prec = min(38 - value_scale, 30)

    def as_int(col: str):
        dec = F.col(col).cast(f"decimal({prec},{value_scale})")
        return (dec * F.lit(mul)).cast(_D38)

    v = base.select(*gcols, as_int(x).alias("vx"), as_int(y).alias("vy"))
    agg = v.groupBy(*gcols).agg(
        F.count("*").alias("n"),
        F.sum("vx").alias("sx"),
        F.sum("vy").alias("sy"),
        F.sum(F.col("vx") * F.col("vx")).alias("sxx"),
        F.sum(F.col("vy") * F.col("vy")).alias("syy"),
        F.sum(F.col("vx") * F.col("vy")).alias("sxy"),
    )
    nd = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxx = F.col("sxx").cast("double")
    syy = F.col("syy").cast("double")
    sxy = F.col("sxy").cast("double")
    num = nd * sxy - sx * sy
    var_x = nd * sxx - sx * sx
    var_y = nd * syy - sy * sy
    slope = num / F.nullif(var_x, F.lit(0.0))
    intercept = (sy - slope * sx) / nd / F.lit(float(mul))
    r2 = (num * num) / F.nullif(var_x * var_y, F.lit(0.0))
    return agg.select(
        *gcols,
        "n",
        F.round(slope, out_prec).alias("slope"),
        F.round(intercept, out_prec).alias("intercept"),
        F.round(r2, out_prec).alias("r2"),
    )


def zscore_outliers(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    k: int = 3,
    value_scale: int = 2,
) -> DataFrame:
    """Flag rows whose value deviates more than ``k`` standard
    deviations from their GROUP mean — the per-slice anomaly gate a
    curation pipeline runs on quality scores, event values, or row
    volumes before trusting a batch.

    The decision is EXACT INTEGER arithmetic, no sqrt, no float:
    ``z² > k²  ⟺  (n·v - Σv)² > k² · (n·Σv² - (Σv)²)`` after scaling
    values to integers at ``value_scale`` (both sides are DECIMAL(38,0)
    products of exact sums), so the flag can never drift between
    engines or runs — the hazard of the textbook
    ``abs(v - avg) > k * stddev`` formulation, where avg/stddev are
    accumulation-order-dependent doubles and a borderline row flips.
    ``k`` is an integer by contract (k² stays exact).

    Returns the input rows plus ``is_outlier``. Plan: one
    partially-aggregated groupBy for the three power sums, broadcast
    back onto the rows (group-cardinality-sized build side), flag in
    whole-stage codegen. The fact scan happens twice (stats + flag) —
    at steady state the stats frame lives in a maintained sidecar (the
    BM25/IVF discipline) and the flag pass is the only scan."""
    if k < 1:
        raise ValueError(f"k must be a positive integer, got {k}")
    gcols = list(group_cols)
    mul = 10**value_scale
    prec = min(38 - value_scale, 30)
    vi = (F.col(value_col).cast(f"decimal({prec},{value_scale})") * F.lit(mul)).cast(
        _D38
    )
    stats = (
        df.select(*gcols, vi.alias("__v"))
        .groupBy(*gcols)
        .agg(
            F.count("*").cast(_D38).alias("__n"),
            F.sum("__v").alias("__s"),
            F.sum(F.col("__v") * F.col("__v")).alias("__ss"),
        )
    )
    joined = df.join(F.broadcast(stats), on=gcols)
    dev = F.col("__n") * vi - F.col("__s")
    var_n2 = F.col("__n") * F.col("__ss") - F.col("__s") * F.col("__s")
    return joined.withColumn(
        "is_outlier", dev * dev > F.lit(k * k).cast(_D38) * var_n2
    ).drop("__n", "__s", "__ss")


def welch_t_test(
    df: DataFrame,
    group_cols: Sequence[str],
    variant_col: str,
    value_col: str,
    value_scale: int = 2,
    out_prec: int = 6,
) -> DataFrame:
    """Per-group Welch's t statistic between variant pairs of an A/B
    split — the experimentation readout every event pipeline ends at.
    One output row per unordered variant pair per group
    (lexicographically smaller variant = A): a group with exactly two
    variants yields one row, a group with only one variant yields NO
    row (the pairing self-join has nothing to pair it with — it is
    dropped, not NULL-padded), and a group with k > 2 variants yields
    all k·(k-1)/2 pairwise readouts (the multi-arm experiment). The
    ``welch_t`` value itself is NULL when either side has n < 2 (the
    unbiased variance is undefined) or both variances are zero.

    Same discipline as the rest of this module: per-variant ``n, S,
    SS`` accumulate as exact integer DECIMALs (order-independent), and
    ``t = (meanA - meanB) / sqrt(sA²/nA + sB²/nB)`` with the unbiased
    ``s² = (n·SS - S²) / (n·(n-1))`` evaluates once in double with a
    fixed expression tree the oracle mirrors. One partially-aggregated
    exchange on (group, variant), then a tiny self-join on the
    group-cardinality frame. The 10^scale factor cancels in t."""
    gcols = list(group_cols)
    mul = 10**value_scale
    prec = min(38 - value_scale, 30)
    vi = (F.col(value_col).cast(f"decimal({prec},{value_scale})") * F.lit(mul)).cast(
        _D38
    )
    per = (
        df.select(*gcols, F.col(variant_col).alias("__var"), vi.alias("__v"))
        .groupBy(*gcols, "__var")
        .agg(
            F.count("*").alias("n"),
            F.sum("__v").alias("s"),
            F.sum(F.col("__v") * F.col("__v")).alias("ss"),
        )
    )
    a = per.select(
        *gcols, F.col("__var").alias("va"), F.col("n").alias("na"),
        F.col("s").alias("sa"), F.col("ss").alias("ssa"),
    )
    b = per.select(
        *gcols, F.col("__var").alias("vb"), F.col("n").alias("nb"),
        F.col("s").alias("sb"), F.col("ss").alias("ssb"),
    )
    pair = a.join(b, on=gcols).filter(F.col("va") < F.col("vb"))

    def mean(s, n):
        return s.cast("double") / n.cast("double")

    def var(n, s, ss):
        nd = n.cast("double")
        return (nd * ss.cast("double") - s.cast("double") * s.cast("double")) / (
            nd * (nd - F.lit(1.0))
        )

    na, nb = F.col("na"), F.col("nb")
    num = mean(F.col("sa"), na) - mean(F.col("sb"), nb)
    den = F.sqrt(
        var(na, F.col("sa"), F.col("ssa")) / na.cast("double")
        + var(nb, F.col("sb"), F.col("ssb")) / nb.cast("double")
    )
    t = F.when(
        (na >= 2) & (nb >= 2), F.round(num / F.nullif(den, F.lit(0.0)), out_prec)
    )
    return pair.select(
        *gcols,
        F.col("va").alias("variant_a"),
        F.col("vb").alias("variant_b"),
        na.alias("n_a"),
        nb.alias("n_b"),
        t.alias("welch_t"),
    )
