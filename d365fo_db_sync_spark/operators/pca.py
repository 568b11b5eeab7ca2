"""Deterministic fixed-round power iteration for the top principal
component — the decimal-replay twin of the eigh-bound whitening tier
(operators/similarity.fit_whitener runs a driver-side numpy ``eigh``,
which no SQL engine reproduces; the POWER METHOD is plain matrix
arithmetic, so a fixed-round unroll replays cross-engine exactly, the
clustering.kmeans_fit / classifier.logreg_fit discipline applied to
linear algebra — Mises & Pollaczek-Geiringer 1929's iteration).

Exactness chain (every number identical in Spark, Python and the SQL
oracle):

* components quantize once to DECIMAL(28,12) (clustering.quantized_vec);
* the per-dimension MEAN and the d x d COVARIANCE are exact
  DECIMAL(38,18) term sums with one IEEE division each, re-quantized
  to DECIMAL(28,12) — covariance is ONE combinable (i, j)-keyed
  aggregate over the per-row component self-join (n*d^2 rows in, d^2
  out, map-side partials);
* the iteration runs DRIVER-SIDE on the collected d^2 matrix (bounded
  model metadata — 32 KB at d=64, the PQ-codebook contract) with exact
  Decimal arithmetic mirroring the engines' casts: per round
  ``w = C v`` as per-entry DECIMAL(38,18)-quantized exact sums,
  ``norm = sqrt(exact sum of w_i^2)`` (libm sqrt is correctly rounded
  — identical IEEE doubles both sides), ``v' = decimal28(w / norm)``;
  init is the coordinate vector of the LARGEST DIAGONAL entry (ties to
  the smallest index) — deterministic and never orthogonal to the top
  eigenvector of a PSD matrix unless that diagonal is degenerate;
* the per-vector PROJECTION onto the fitted component is one more
  combinable exact-decimal aggregate (codegen exploded shape).

A SQL oracle unrolls mean -> covariance -> R rounds -> projection as
chained CTEs (suite: ``similarity_pca_component`` /
``similarity_pca_projection``). Quality (convergence to numpy's top
eigenpair on real data) is pinned in tests/test_pca.py against
numpy.linalg.eigh; the full-spectrum whitener keeps its rows-only
production path.
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from d365fo_db_sync_spark.operators.clustering import (
    _COMP_DEC,
    _DIST_DEC,
    exploded_components,
)

_Q12 = Decimal("1e-12")
_Q18 = Decimal("1e-18")


def _q12f(x: float) -> float:
    """double -> DECIMAL(28,12) -> double, through the shortest decimal
    repr (== the engines' cast path); +0.0 folds -0.0."""
    return float(Decimal(repr(float(x))).quantize(_Q12, ROUND_HALF_UP)) + 0.0


def _d18(x: float) -> Decimal:
    return Decimal(repr(float(x))).quantize(_Q18, ROUND_HALF_UP)


def component_means(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> list[float]:
    """Per-dimension DECIMAL(28,12)-exact means of the quantized corpus
    — d driver rows (bounded metadata). ``decimal28(double(exact sum) /
    n)`` per dimension, the kmeans centroid-update arithmetic."""
    rows = (
        exploded_components(df, id_col, vec_col)
        .groupBy("_pos")
        .agg(
            F.sum(F.col("_comp").cast(_COMP_DEC)).alias("s"),
            F.count("*").alias("n"),
        )
        .select(
            "_pos",
            (F.col("s").cast("double") / F.col("n").cast("double"))
            .cast(_COMP_DEC)
            .cast("double")
            .alias("m"),
        )
        .collect()
    )
    out = [0.0] * len(rows)
    for r in rows:
        out[r._pos] = r.m
    return out


def covariance_frame(
    df: DataFrame,
    mu: list[float],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(i, j, c): the exact-decimal covariance ``C_ij = decimal28(
    double(sum_rows DEC38((x_i - mu_i) (x_j - mu_j))) / n)``. One
    self-join of the exploded components on the row id (n*d^2 rows)
    into ONE combinable (i, j)-keyed aggregate — map-side partials
    collapse the shuffle to partitions * d^2 rows."""
    mu_df = df.sparkSession.createDataFrame(
        [(p, m) for p, m in enumerate(mu)], "_pos int, m double"
    )
    from pyspark.sql.functions import broadcast

    ve = (
        exploded_components(df, id_col, vec_col)
        .join(broadcast(mu_df), on="_pos")
        .select("_id", "_pos", (F.col("_comp") - F.col("m")).alias("_d"))
    )
    a = ve.select(
        F.col("_id"), F.col("_pos").alias("i"), F.col("_d").alias("_da")
    )
    b = ve.select(
        F.col("_id"), F.col("_pos").alias("j"), F.col("_d").alias("_db")
    )
    return (
        a.join(b, on="_id")
        .groupBy("i", "j")
        .agg(
            F.sum((F.col("_da") * F.col("_db")).cast(_DIST_DEC)).alias("s"),
            F.count("*").alias("n"),
        )
        .select(
            "i",
            "j",
            (F.col("s").cast("double") / F.col("n").cast("double"))
            .cast(_COMP_DEC)
            .cast("double")
            .alias("c"),
        )
    )


def power_iterate(
    cov: list[list[float]], rounds: int = 3
) -> tuple[list[float], float]:
    """Fixed-round power iteration on the collected covariance,
    driver-side with exact Decimal arithmetic (see module doc).
    Returns ``(v, eigenvalue)`` — the unit top-component estimate on
    the DECIMAL(28,12) grid and its Rayleigh quotient
    ``decimal28(v . Cv)`` after the final round."""
    d = len(cov)
    # init: coordinate vector of the largest diagonal (ties -> lowest i)
    j0 = max(range(d), key=lambda i: (cov[i][i], -i))
    v = [1.0 if i == j0 else 0.0 for i in range(d)]

    def matvec(vv: list[float]) -> list[float]:
        out = []
        for i in range(d):
            s = sum((_d18(cov[i][j] * vv[j]) for j in range(d)), Decimal(0))
            out.append(float(s))
        return out

    for _ in range(rounds):
        w = matvec(v)
        import math

        nrm = math.sqrt(
            float(sum((_d18(x * x) for x in w), Decimal(0)))
        )
        if nrm == 0.0:  # degenerate (zero covariance): keep the axis
            break
        v = [_q12f(x / nrm) for x in w]
    wv = matvec(v)
    eig = _q12f(float(sum((_d18(v[i] * wv[i]) for i in range(d)), Decimal(0))))
    return v, eig


def pca_power_fit(
    df: DataFrame,
    rounds: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[list[float], list[float], float]:
    """End-to-end deterministic top-component fit: returns
    ``(mu, v, eigenvalue)``. Two bounded collects (d means, d^2
    covariance) + the driver-side iteration."""
    mu = component_means(df, id_col, vec_col)
    rows = covariance_frame(df, mu, id_col, vec_col).collect()
    d = len(mu)
    cov = [[0.0] * d for _ in range(d)]
    for r in rows:
        cov[r.i][r.j] = r.c
    v, eig = power_iterate(cov, rounds)
    return mu, v, eig


def pca_project(
    df: DataFrame,
    mu: list[float],
    v: list[float],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out: str = "proj",
) -> DataFrame:
    """(id, proj): each vector's exact-decimal projection onto the
    fitted component, ``double(sum_i DEC38((x_i - mu_i) * v_i))`` —
    one broadcast join + ONE combinable aggregate (codegen), the
    rank-1 PCA readout (curation/visualization axis)."""
    pv = df.sparkSession.createDataFrame(
        [(p, m, c) for p, (m, c) in enumerate(zip(mu, v))],
        "_pos int, m double, v double",
    )
    from pyspark.sql.functions import broadcast

    return (
        exploded_components(df, id_col, vec_col)
        .join(broadcast(pv), on="_pos")
        .groupBy("_id")
        .agg(
            F.sum(
                ((F.col("_comp") - F.col("m")) * F.col("v")).cast(_DIST_DEC)
            ).alias("s")
        )
        .select(
            F.col("_id").alias(id_col), F.col("s").cast("double").alias(out)
        )
    )
