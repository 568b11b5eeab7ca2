"""Property-based invariants for the round-11 tiers: the Misra-Gries
fold bound (hypothesis over the REAL _fold_mg_batch), exact integer
identities of the rank statistics, quantile error bounds, and
Wasserstein metric axioms — the dedup-properties discipline extended
to the drift/sketch families."""

from __future__ import annotations

import math
import random

import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from d365fo_db_sync_spark.operators.sketches import _fold_mg_batch


@given(
    stream=st.lists(
        st.lists(st.integers(min_value=0, max_value=25), min_size=0, max_size=60),
        min_size=1,
        max_size=8,
    ),
    cap=st.integers(min_value=2, max_value=12),
)
@settings(max_examples=300, deadline=None)
def test_mg_fold_bound_and_capacity(stream, cap):
    """Driving the REAL vectorized fold over arbitrary batch streams:
    the summary never exceeds cap rows, never OVERcounts any key, and
    undercounts every key by at most n/(cap+1) — the invariant the
    frequent_items superset guarantee stands on."""
    run = None
    truth: dict[int, int] = {}
    n = 0
    for batch in stream:
        pdf = pd.DataFrame({"k": batch})
        run = _fold_mg_batch(run, pdf, ["k"], cap)
        for v in batch:
            truth[v] = truth.get(v, 0) + 1
        n += len(batch)
        if run is not None:
            assert len(run) <= cap
    got = {} if run is None else dict(zip(run["k"], run["__mg"]))
    bound = n / (cap + 1)
    for key, cnt in truth.items():
        est = got.get(key, 0)
        assert est <= cnt, (key, est, cnt)
        assert est >= cnt - bound, (key, est, cnt, bound)
    for key, est in got.items():
        assert key in truth  # never invents keys


def test_auc_complement_identity_and_ks_symmetry(spark):
    """Exact integer identities on seeded random data: AUC(a,b) +
    AUC(b,a) == 1 exactly (shared integer numerator), KS is symmetric,
    and W1 is symmetric and translation-invariant — double-for-double,
    not approximately."""
    from pyspark.sql import functions as F

    from d365fo_db_sync_spark.operators.drift import (
        ks_statistic,
        mann_whitney_auc,
        wasserstein_1,
    )

    rng = random.Random(23)
    for trial in range(3):
        a_vals = [rng.randrange(40) for _ in range(300)]
        b_vals = [rng.randrange(25, 70) for _ in range(200)]
        a = spark.createDataFrame([(v,) for v in a_vals], "x long")
        b = spark.createDataFrame([(v,) for v in b_vals], "x long")
        auc_ab = mann_whitney_auc(a, b, "x").collect()[0]["auc"]
        auc_ba = mann_whitney_auc(b, a, "x").collect()[0]["auc"]
        assert auc_ab + auc_ba == 1.0
        ks_ab = ks_statistic(a, b, "x").collect()[0]["ks"]
        ks_ba = ks_statistic(b, a, "x").collect()[0]["ks"]
        assert ks_ab == ks_ba
        w_ab = wasserstein_1(a, b, "x").collect()[0]["w1"]
        w_ba = wasserstein_1(b, a, "x").collect()[0]["w1"]
        assert w_ab == w_ba and w_ab >= 0.0
        shift = spark.createDataFrame([(v + 1000,) for v in a_vals], "x long")
        shift_b = spark.createDataFrame([(v + 1000,) for v in b_vals], "x long")
        assert (
            wasserstein_1(shift, shift_b, "x").collect()[0]["w1"] == w_ab
        )  # translation invariance, exact on the integer numerator


def test_binned_quantiles_error_bound_random(spark):
    """Seeded random corpora: every histogram quantile lands within
    one bin width of the true empirical quantile."""
    from d365fo_db_sync_spark.operators.drift import binned_quantiles

    rng = random.Random(5)
    for trial in range(3):
        vals = sorted(rng.randrange(10_000) for _ in range(2000))
        df = spark.createDataFrame([(v,) for v in vals], "x long")
        n_bins = 40
        width = (vals[-1] - vals[0]) / n_bins
        qs = [0.1, 0.5, 0.9, 0.99]
        got = {
            r["q"]: r["est"]
            for r in binned_quantiles(df, "x", qs, n_bins).collect()
        }
        for q in qs:
            true = vals[min(len(vals) - 1, math.ceil(q * len(vals)) - 1)]
            assert abs(got[q] - true) <= width + 1e-9, (q, got[q], true)
