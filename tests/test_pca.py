"""operators/pca.py — deterministic power iteration: determinism,
convergence against numpy's exact top eigenpair on the real corpus,
projection contract, and the degenerate zero-covariance guard."""

from __future__ import annotations

import math

import pytest

from d365fo_db_sync_spark.operators import pca


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def test_fit_is_deterministic(spark, emb):
    a = pca.pca_power_fit(emb, rounds=4)
    b = pca.pca_power_fit(emb, rounds=4)
    assert a == b  # bit-identical: means, component, eigenvalue


def test_converges_to_numpy_top_eigenpair(spark, emb):
    import numpy as np

    mu, v, eig = pca.pca_power_fit(emb, rounds=64)
    x = np.array(
        [list(map(float, r["embedding"])) for r in emb.collect()],
        dtype=np.float64,
    )
    xc = x - x.mean(axis=0)
    cov = xc.T @ xc / x.shape[0]
    evals, evecs = np.linalg.eigh(cov)
    top_val, top_vec = evals[-1], evecs[:, -1]
    # Rayleigh quotient converges fast even with a small eigengap
    assert eig == pytest.approx(top_val, rel=0.01)
    assert eig <= top_val * (1 + 1e-6)  # Rayleigh never exceeds lambda_max
    # direction: |cosine| high (sign is arbitrary in the reference)
    cos = abs(float(np.dot(v, top_vec)) / math.sqrt(float(np.dot(v, v))))
    assert cos >= 0.9
    assert math.isclose(
        sum(c * c for c in v), 1.0, rel_tol=1e-6
    )  # unit on the quantized grid


def test_projection_values(spark, emb):
    mu, v, _ = pca.pca_power_fit(emb, rounds=4)
    got = {r["vec_id"]: r["proj"] for r in pca.pca_project(emb, mu, v).collect()}
    rows = {r["vec_id"]: list(map(float, r["embedding"])) for r in emb.collect()}
    # spot-check three vectors against the plain double dot product;
    # tolerance covers the r15 readout quantization (v at 1e-6, mu at
    # 1e-9): |sum (x-mu) dv| <= dim * max|x-mu| * 5e-7 ~ 2e-5
    for vid in list(rows)[:3]:
        want = sum((x - m) * c for x, m, c in zip(rows[vid], mu, v))
        assert got[vid] == pytest.approx(want, abs=5e-5)
    assert len(got) == len(rows)


def test_zero_covariance_keeps_axis(spark):
    df = spark.sparkSession if False else None  # noqa: F841
    v, eig = pca.power_iterate([[0.0, 0.0], [0.0, 0.0]], rounds=3)
    assert v in ([1.0, 0.0], [0.0, 1.0])
    assert eig == 0.0


def test_guard_warns_on_orthogonal_init():
    """The largest-diagonal start CAN be orthogonal to the top
    eigenvector (the r14 ADVICE counterexample): diag(C) puts its max
    on a coordinate carried by a LOWER eigenpair. The second-start
    Rayleigh guard must warn; the returned pair stays the primary
    start's (oracle replays unchanged)."""
    import warnings

    # eigenvectors e0=(1,0,0) with lambda=2 is NOT top; top is the
    # (0,1,1)/sqrt2 pair with lambda=3, but the max diagonal (first
    # coordinate, 2.0 > 1.5) is exactly orthogonal to it.
    cov = [
        [2.0, 0.0, 0.0],
        [0.0, 1.5, 1.5],
        [0.0, 1.5, 1.5],
    ]
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        v, eig = pca.power_iterate(cov, rounds=8)
    assert eig == pytest.approx(2.0)  # primary start's (wrong) pair
    assert v == [1.0, 0.0, 0.0]
    assert any(
        issubclass(w.category, RuntimeWarning)
        and "larger Rayleigh" in str(w.message)
        for w in rec
    )


def test_guard_silent_when_primary_start_wins():
    import warnings

    cov = [[3.0, 0.5], [0.5, 1.0]]
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        pca.power_iterate(cov, rounds=16)
    assert not [w for w in rec if issubclass(w.category, RuntimeWarning)]


def test_raw_quotient_component_no_decimal_grid(spark, emb):
    """r15: the fitted component/means are RAW IEEE quotients — NOT
    DECIMAL(28,12)-grid values (the sf1 half-boundary class). A grid
    value re-quantizes to itself; a raw quotient generically does not."""
    from decimal import ROUND_HALF_UP, Decimal

    mu, v, eig = pca.pca_power_fit(emb, rounds=4)

    def on_grid(x: float) -> bool:
        return float(
            Decimal(repr(x)).quantize(Decimal("1e-12"), ROUND_HALF_UP)
        ) == x

    # at least one mean and one component must carry digits past the
    # 1e-12 grid (all-on-grid would mean the re-cast quietly returned)
    assert not all(on_grid(m) for m in mu)
    assert not all(on_grid(c) for c in v)
