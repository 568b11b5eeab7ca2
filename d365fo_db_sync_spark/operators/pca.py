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
  DECIMAL(38,18) term sums, each finished by ONE raw IEEE division —
  NOT re-quantized to decimal (r15: a double→decimal cast of a
  DERIVED double rounds the shortest repr on the JVM but the exact
  binary expansion in DuckDB, and a half-boundary splits them — the
  sf1 k-means centroid incident, clustering.py module doc);
  covariance is ONE combinable (i, j)-keyed aggregate over the
  per-row component self-join (n*d^2 rows in, d^2 out, map-side
  partials);
* the iteration runs DRIVER-SIDE on the collected d^2 matrix (bounded
  model metadata — 32 KB at d=64, the PQ-codebook contract) with exact
  Decimal arithmetic mirroring the engines' casts: per round
  ``w = C v`` as per-entry DECIMAL(38,18)-quantized exact sums,
  ``norm = sqrt(exact sum of w_i^2)`` (libm sqrt is correctly rounded
  — identical IEEE doubles both sides), ``v' = w / norm`` as raw IEEE
  quotients; init is the coordinate vector of the LARGEST DIAGONAL
  entry (ties to the smallest index) — deterministic, and heuristic:
  a PSD matrix CAN place its max diagonal on a coordinate orthogonal
  to the top eigenvector (the fixed-round iteration then converges to
  a lower eigenpair), so the fit runs a second deterministic start
  and WARNS when it finds a materially larger Rayleigh quotient;
* the per-vector PROJECTION onto the fitted component is one more
  combinable exact-decimal aggregate (codegen exploded shape).

A SQL oracle unrolls mean -> covariance -> R rounds -> projection as
chained CTEs (suite: ``similarity_pca_component`` /
``similarity_pca_projection``). Quality (convergence to numpy's top
eigenpair on real data) is pinned in tests/test_pca.py against
numpy.linalg.eigh; the full-spectrum whitener keeps its rows-only
production path.

**The corpus-scale exactness limit (r15, found by the sf1 battery).**
The chain above is exact GIVEN identical inputs, but the ingestion
cast itself (double -> DECIMAL(28,12)) is only
probabilistically identical cross-engine: Spark rounds the double's
shortest decimal repr, DuckDB its exact binary expansion, and for an
arbitrary double the two quantize differently with P ~ 2e-5 (the
value must land within the ~1e-17 repr gap of a 5e-13 grid
half-boundary). Per value that is invisible; over a 38M-component
corpus it means HUNDREDS of components differ by one 1e-12 grid step,
a per-dimension mean accumulates ~1e-16 of cross-engine difference,
and 64 amplifying iteration rounds grow the component vector's
divergence to ~1e-14. Consequences baked into this module: the
iteration stays raw (re-quantizing mid-chain at 1e-12 would
re-introduce the k-means incident class at ~4k casts/fit), and every
READOUT quantizes onto a grid far COARSER than the accumulated
divergence (v at 1e-6, mean/eigenvalue at 1e-9 — straddle odds
~1e-6/battery) so downstream arithmetic is exact-decimal and the
value hash holds by construction. Any operator that surfaces
corpus-aggregated doubles at full precision inherits this limit.
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

_Q18 = Decimal("1e-18")


def _d18(x: float) -> Decimal:
    return Decimal(repr(float(x))).quantize(_Q18, ROUND_HALF_UP)


def component_means(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> list[float]:
    """Per-dimension means of the quantized corpus — d driver rows
    (bounded metadata). ``double(exact decimal sum) / double(n)`` per
    dimension: the RAW IEEE quotient, no re-quantization — the kmeans
    centroid-update arithmetic after the r14 half-boundary fix."""
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
    """(i, j, c): the deterministic covariance ``C_ij =
    double(sum_rows DEC38((x_i - mu_i) (x_j - mu_j))) / n`` — the sum
    is an exact order-free decimal term sum, the quotient stays RAW
    IEEE (no decimal re-cast of the derived double). One
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
            .alias("c"),
        )
    )


def power_iterate(
    cov: list[list[float]], rounds: int = 3, guard: bool = True
) -> tuple[list[float], float]:
    """Fixed-round power iteration on the collected covariance,
    driver-side with exact Decimal arithmetic (see module doc).
    Returns ``(v, eigenvalue)`` — the unit top-component estimate
    (components are raw IEEE quotients) and its Rayleigh quotient
    ``double(exact sum of DEC38(v_i * (Cv)_i))`` after the final round.

    The deterministic start (coordinate of the largest diagonal, ties
    to the smallest index) is a heuristic, not a guarantee: a PSD
    matrix CAN carry its max diagonal on a coordinate orthogonal to
    the top eigenvector, and a thin eigengap can leave ``rounds`` too
    few (this corpus needed 64). ``guard=True`` therefore re-runs the
    identical iteration from a SECOND deterministic start (the
    next-largest diagonal) and emits a ``RuntimeWarning`` when that
    start's Rayleigh quotient materially exceeds the returned one —
    the returned eigenpair is always the primary start's, so oracle
    replays are unaffected."""
    import math

    d = len(cov)

    def matvec(vv: list[float]) -> list[float]:
        out = []
        for i in range(d):
            s = sum((_d18(cov[i][j] * vv[j]) for j in range(d)), Decimal(0))
            out.append(float(s))
        return out

    def run(j0: int) -> tuple[list[float], float]:
        v = [1.0 if i == j0 else 0.0 for i in range(d)]
        for _ in range(rounds):
            w = matvec(v)
            nrm = math.sqrt(
                float(sum((_d18(x * x) for x in w), Decimal(0)))
            )
            if nrm == 0.0:  # degenerate (zero covariance): keep the axis
                break
            v = [x / nrm for x in w]  # raw IEEE quotients — no re-cast
        wv = matvec(v)
        eig = float(
            sum((_d18(v[i] * wv[i]) for i in range(d)), Decimal(0))
        )
        return v, eig

    # diagonal order: largest first, ties to the smallest index
    diag_order = sorted(range(d), key=lambda i: (-cov[i][i], i))
    v, eig = run(diag_order[0])
    if guard and d > 1:
        _, eig2 = run(diag_order[1])
        if eig2 > eig + max(1e-9 * abs(eig), 1e-30):
            import warnings

            warnings.warn(
                f"power_iterate: second deterministic start found a "
                f"larger Rayleigh quotient ({eig2!r} > {eig!r}) — the "
                f"primary start likely converged to a lower eigenpair "
                f"(orthogonal init or under-converged rounds={rounds})",
                RuntimeWarning,
                stacklevel=2,
            )
    return v, eig


def pca_power_fit(
    df: DataFrame,
    rounds: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    guard: bool = True,
) -> tuple[list[float], list[float], float]:
    """End-to-end deterministic top-component fit: returns
    ``(mu, v, eigenvalue)``. Two bounded collects (d means, d^2
    covariance) + the driver-side iteration (``guard`` as in
    power_iterate — a second-start Rayleigh check that warns on
    wrong-eigenpair convergence without changing the result)."""
    mu = component_means(df, id_col, vec_col)
    rows = covariance_frame(df, mu, id_col, vec_col).collect()
    d = len(mu)
    cov = [[0.0] * d for _ in range(d)]
    for r in rows:
        cov[r.i][r.j] = r.c
    v, eig = power_iterate(cov, rounds, guard=guard)
    return mu, v, eig


#: readout grids (r15, the sf1 projection incident — see module doc):
#: COARSER than the fit's accumulated cross-engine divergence. The
#: ingestion cast (double -> DECIMAL(28,12)) straddles with
#: P ~ 2e-5 per component — invisible per value, but a corpus-scale
#: mean accumulates ~1e-16 of cross-engine difference and 64
#: amplifying power-iteration rounds grow it to ~1e-14 in v. A
#: readout grid must sit far above that: 1e-6 for the component
#: (straddle P ~ 1e-8 per entry), 1e-9 for the slow-moving mean and
#: eigenvalue (divergence ~1e-16, P ~ 1e-7).
_QV = Decimal("1e-6")
_QMU = Decimal("1e-9")


def _dq(x: float, grid: Decimal) -> Decimal:
    """Model-constant quantization — the Python twin of Spark's
    double->decimal cast (shortest-repr HALF_UP, the
    clustering._driver_lloyd equivalence)."""
    return Decimal(repr(float(x))).quantize(grid, ROUND_HALF_UP)


def pca_project(
    df: DataFrame,
    mu: list[float],
    v: list[float],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out: str = "proj",
) -> DataFrame:
    """(id, proj): each vector's EXACT-decimal projection onto the
    quantized fitted component — one broadcast join + ONE combinable
    aggregate (codegen), the rank-1 PCA readout (curation/
    visualization axis).

    Readout discipline (r15, the sf1 projection incident): the fitted
    ``mu``/``v`` doubles are NOT bit-identical cross-engine at corpus
    scale (the module doc's ingestion-straddle accumulation — v
    diverges ~1e-14 at sf1), so any readout arithmetic on the raw
    doubles hashes differently. The fix quantizes the 2*dim MODEL
    constants ONCE onto grids far coarser than the divergence (v at
    1e-6, mu at 1e-9 — both engines then hold the identical decimal
    with straddle probability ~1e-6 per battery), after which every
    per-vector term ``(x_i - mu_i) * v_i`` is an exact decimal
    product: ZERO double->decimal casts on the corpus-width path, and
    the sum value-hashes by construction."""
    pv = df.sparkSession.createDataFrame(
        [
            (p, _dq(m, _QMU), _dq(c, _QV))
            for p, (m, c) in enumerate(zip(mu, v))
        ],
        "_pos int, m decimal(16,9), v decimal(7,6)",
    )
    from pyspark.sql.functions import broadcast

    return (
        exploded_components(df, id_col, vec_col)
        .join(broadcast(pv), on="_pos")
        .groupBy("_id")
        .agg(
            F.sum(
                (F.col("_comp").cast("decimal(16,12)") - F.col("m"))
                * F.col("v")
            ).alias("s")
        )
        .select(
            F.col("_id").alias(id_col), F.col("s").cast("double").alias(out)
        )
    )
