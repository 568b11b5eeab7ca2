"""ZCA whitening for embedding columns (operators/similarity.py):
single-pass GEMM moments, driver d×d eigh, batch-GEMM apply."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from d365fo_db_sync_spark.operators.similarity import (
    fit_whitener,
    whiten_embeddings,
)


def _correlated(n=400, d=8, seed=3):
    rng = np.random.RandomState(seed)
    base = rng.randn(n, d)
    mix = np.eye(d) + 0.6 * rng.randn(d, d) / np.sqrt(d)  # correlate dims
    return base @ mix + rng.randn(d) * 2.0  # and shift the mean


def _df(spark, x):
    return spark.createDataFrame(
        [(i, row.tolist()) for i, row in enumerate(x)],
        "vec_id long, embedding array<double>",
    )


def test_fit_matches_numpy_reference(spark):
    x = _correlated()
    mean, w = fit_whitener(_df(spark, x))
    np.testing.assert_allclose(mean, x.mean(axis=0), rtol=0, atol=1e-9)
    cov = np.cov(x, rowvar=False, bias=True)
    lam, u = np.linalg.eigh(cov)
    w_ref = (u * (1.0 / np.sqrt(lam + 1e-6))) @ u.T
    np.testing.assert_allclose(w, w_ref, rtol=0, atol=1e-7)


def test_whitened_covariance_is_identity(spark):
    x = _correlated()
    df = _df(spark, x)
    model = fit_whitener(df)
    out = whiten_embeddings(df, model)
    got = {r["vec_id"]: r["embedding"] for r in out.collect()}
    white = np.array([got[i] for i in range(len(x))])
    cov = np.cov(white, rowvar=False, bias=True)
    # eps regularization keeps it slightly under exact identity
    np.testing.assert_allclose(cov, np.eye(x.shape[1]), atol=1e-2)
    assert abs(white.mean()) < 1e-9  # centered


def test_partitioning_invariance(spark):
    x = _correlated(n=123)
    one = fit_whitener(_df(spark, x).coalesce(1))
    many = fit_whitener(_df(spark, x).repartition(7))
    # float sum order differs across partitionings; agreement to ~1e-9
    np.testing.assert_allclose(one[0], many[0], atol=1e-9)
    np.testing.assert_allclose(one[1], many[1], atol=1e-6)


def test_passthrough_and_out_col(spark):
    x = _correlated(n=20, d=4)
    df = _df(spark, x).withColumn("label", F.lit("keep"))
    model = fit_whitener(df)
    out = whiten_embeddings(df, model, out_col="white")
    row = out.filter("vec_id = 0").collect()[0]
    assert row["label"] == "keep"
    assert list(map(float, row["embedding"])) == x[0].tolist()  # original kept
    assert len(row["white"]) == 4


def test_empty_frame_raises(spark):
    df = _df(spark, np.zeros((0, 4)))
    with pytest.raises(ValueError, match="non-empty"):
        fit_whitener(df)
