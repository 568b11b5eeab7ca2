"""rank_correlation: tie handling, degenerate groups, null exclusion,
and a hypothesis model check against a pure-Python reference."""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from d365fo_db_sync_spark.operators.stats import rank_correlation


def ref_pearson(xs, ys):
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    num = n * sum(a * b for a, b in zip(xs, ys)) - sx * sy
    vx = n * sum(a * a for a in xs) - sx * sx
    vy = n * sum(b * b for b in ys) - sy * sy
    d = math.sqrt(vx * vy)
    return num / d if d > 0 else None


def doubled_ranks(vals):
    """2 * average rank with ties: first_index + last_index + 2 in the
    sorted order (both 0-based)."""
    s = sorted(vals)
    rs = len(s) - 1
    return [s.index(v) + (rs - s[::-1].index(v)) + 2 for v in vals]


def ref_spearman(xs, ys):
    return ref_pearson(doubled_ranks(xs), doubled_ranks(ys))


def _run(spark, rows, value_scale=0):
    df = spark.createDataFrame(rows, "g string, x double, y double")
    return {
        r["g"]: (r["n"], r["spearman"], r["pearson"])
        for r in rank_correlation(
            df.repartition(3), ["g"], "x", "y", value_scale=value_scale
        ).collect()
    }


def test_perfect_monotone_nonlinear(spark):
    """y = x**3 is perfectly monotone but not linear: spearman == 1
    exactly, pearson < 1."""
    rows = [("a", float(i), float(i**3)) for i in range(-5, 6)]
    got = _run(spark, rows)
    n, sp, pe = got["a"]
    assert n == 11 and sp == 1.0
    assert pe is not None and 0.8 < pe < 1.0


def test_ties_and_inverse(spark):
    rows = [("d", float(v), float(-v)) for v in [1, 2, 2, 2, 3, 9]]
    got = _run(spark, rows)
    assert got["d"][1] == -1.0  # anti-monotone, ties on both sides align


def test_degenerate_and_null_exclusion(spark):
    rows = [
        ("c", 5.0, 1.0), ("c", 5.0, 2.0), ("c", 5.0, 3.0),  # zero x-variance
        ("m", 1.0, 1.0), ("m", 2.0, None), ("m", None, 9.0),
        ("m", 3.0, 4.0), ("m", 4.0, 6.0),
    ]
    got = _run(spark, rows)
    assert got["c"] == (3, None, None)
    n, sp, pe = got["m"]  # the two null-bearing pairs drop
    assert n == 3
    assert sp == ref_spearman([1, 3, 4], [1, 4, 6])
    assert abs(pe - ref_pearson([1, 3, 4], [1, 4, 6])) <= 5.1e-7


@given(
    pts=st.lists(
        st.tuples(st.integers(-1000, 1000), st.integers(-1000, 1000)),
        min_size=2,
        max_size=60,
    )
)
@settings(max_examples=25, deadline=None)
def test_rank_correlation_model_check(spark, pts):
    """Both coefficients match the closed-form reference within the
    6-dp output round on random integer point sets."""
    rows = [("g", float(a), float(b)) for a, b in pts]
    got = _run(spark, rows)
    n, sp, pe = got["g"]
    assert n == len(pts)
    for got_v, want_v in ((sp, ref_spearman(*zip(*pts))), (pe, ref_pearson(*zip(*pts)))):
        if want_v is None:
            assert got_v is None
        else:
            assert abs(got_v - want_v) <= 5.1e-7, (got_v, want_v)


def ref_linregress(xs, ys):
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    num = n * sum(a * b for a, b in zip(xs, ys)) - sx * sy
    vx = n * sum(a * a for a in xs) - sx * sx
    vy = n * sum(b * b for b in ys) - sy * sy
    if vx == 0:
        return None, None, None
    slope = num / vx
    intercept = (sy - slope * sx) / n
    r2 = (num * num) / (vx * vy) if vy != 0 else None
    return slope, intercept, r2


def test_group_linregress_exact_line(spark):
    """Points exactly on y = 2.5x - 3: slope/intercept recovered
    exactly, r2 == 1."""
    from d365fo_db_sync_spark.operators.stats import group_linregress

    rows = [("a", float(i), 2.5 * i - 3.0) for i in range(10)]
    rows += [("z", 4.0, 1.0), ("z", 4.0, 9.0)]  # zero x-variance
    df = spark.createDataFrame(rows, "g string, x double, y double")
    got = {
        r["g"]: (r["n"], r["slope"], r["intercept"], r["r2"])
        for r in group_linregress(df, ["g"], "x", "y", value_scale=1).collect()
    }
    assert got["a"] == (10, 2.5, -3.0, 1.0)
    assert got["z"] == (2, None, None, None)


@given(
    pts=st.lists(
        st.tuples(st.integers(-500, 500), st.integers(-500, 500)),
        min_size=2,
        max_size=50,
    )
)
@settings(max_examples=25, deadline=None)
def test_group_linregress_model_check(spark, pts):
    from d365fo_db_sync_spark.operators.stats import group_linregress

    rows = [("g", float(a), float(b)) for a, b in pts]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    r = group_linregress(df.repartition(3), ["g"], "x", "y", value_scale=0).first()
    slope, intercept, r2 = ref_linregress(*zip(*pts))
    for got_v, want_v in ((r["slope"], slope), (r["intercept"], intercept), (r["r2"], r2)):
        if want_v is None:
            assert got_v is None
        else:
            assert abs(got_v - want_v) <= 5.1e-7, (got_v, want_v)


def test_zscore_outliers_exact_flags(spark):
    """Integer-exact k-sigma flags match the closed-form inequality on
    a small set with one gross outlier (k=2: in a sample of n=6 the
    max attainable z is (n-1)/sqrt(n) ~ 2.04, so 3-sigma can never
    fire — the finite-sample bound); k validation raises."""
    import pytest

    from d365fo_db_sync_spark.operators.stats import zscore_outliers

    vals = [10.0, 11.0, 9.0, 10.5, 9.5, 100.0]
    df = spark.createDataFrame([("a", v) for v in vals], "g string, v double")
    got = {
        r["v"]: r["is_outlier"]
        for r in zscore_outliers(df, ["g"], "v", k=2, value_scale=1).collect()
    }
    n = len(vals)
    s = sum(int(v * 10) for v in vals)
    ss = sum(int(v * 10) ** 2 for v in vals)
    for v in vals:
        want = (n * int(v * 10) - s) ** 2 > 4 * (n * ss - s * s)
        assert got[v] == want, v
    assert got[100.0] and not got[10.0]
    with pytest.raises(ValueError):
        zscore_outliers(df, ["g"], "v", k=0)


@given(
    vals=st.lists(st.integers(-1000, 1000), min_size=1, max_size=40),
    k=st.integers(1, 4),
)
@settings(max_examples=25, deadline=None)
def test_zscore_outliers_model_check(spark, vals, k):
    from d365fo_db_sync_spark.operators.stats import zscore_outliers

    df = spark.createDataFrame(
        [("g", i, float(v)) for i, v in enumerate(vals)],
        "g string, i long, v double",
    )
    got = {
        r["i"]: r["is_outlier"]
        for r in zscore_outliers(
            df.repartition(3), ["g"], "v", k=k, value_scale=0
        ).collect()
    }
    n, s, ss = len(vals), sum(vals), sum(v * v for v in vals)
    for i, v in enumerate(vals):
        assert got[i] == ((n * v - s) ** 2 > k * k * (n * ss - s * s)), (i, v)


def test_welch_t_reference_and_guards(spark):
    """Welch t on a known two-sample set matches the closed form; a
    singleton variant yields NULL; missing variant drops the group."""
    from d365fo_db_sync_spark.operators.stats import welch_t_test

    a_vals = [1.0, 2.0, 3.0, 4.0]
    b_vals = [6.0, 7.0, 9.0]
    rows = [("g", "a", v) for v in a_vals] + [("g", "b", v) for v in b_vals]
    rows += [("tiny", "a", 5.0), ("tiny", "b", 1.0), ("tiny", "b", 2.0)]
    rows += [("solo", "a", 1.0), ("solo", "a", 2.0)]
    df = spark.createDataFrame(rows, "g string, variant string, v double")
    got = {
        r["g"]: (r["variant_a"], r["variant_b"], r["n_a"], r["n_b"], r["welch_t"])
        for r in welch_t_test(df, ["g"], "variant", "v", value_scale=1).collect()
    }

    def ref_t(xs, ys):
        nx, ny = len(xs), len(ys)
        mx, my = sum(xs) / nx, sum(ys) / ny
        vx = sum((x - mx) ** 2 for x in xs) / (nx - 1)
        vy = sum((y - my) ** 2 for y in ys) / (ny - 1)
        return (mx - my) / math.sqrt(vx / nx + vy / ny)

    va, vb, na, nb, t = got["g"]
    assert (va, vb, na, nb) == ("a", "b", 4, 3)
    assert abs(t - ref_t(a_vals, b_vals)) <= 5.1e-7
    assert got["tiny"][4] is None  # n_a = 1: variance undefined
    assert "solo" not in got  # no second variant, no pair row


def test_welch_t_multi_arm_emits_all_pairs(spark):
    """A group with k > 2 variants yields all k·(k-1)/2 unordered pair
    readouts (documented multi-arm contract), each matching the
    two-sample closed form."""
    from d365fo_db_sync_spark.operators.stats import welch_t_test

    arms = {
        "a": [1.0, 2.0, 3.0],
        "b": [5.0, 7.0, 6.0, 8.0],
        "c": [10.0, 12.0],
    }
    rows = [("g", v, x) for v, xs in arms.items() for x in xs]
    df = spark.createDataFrame(rows, "g string, variant string, v double")
    got = {
        (r["variant_a"], r["variant_b"]): (r["n_a"], r["n_b"], r["welch_t"])
        for r in welch_t_test(df, ["g"], "variant", "v", value_scale=1).collect()
    }
    assert set(got) == {("a", "b"), ("a", "c"), ("b", "c")}

    def ref_t(xs, ys):
        nx, ny = len(xs), len(ys)
        mx, my = sum(xs) / nx, sum(ys) / ny
        vx = sum((x - mx) ** 2 for x in xs) / (nx - 1)
        vy = sum((y - my) ** 2 for y in ys) / (ny - 1)
        return (mx - my) / math.sqrt(vx / nx + vy / ny)

    for (a, b), (na, nb, t) in got.items():
        assert (na, nb) == (len(arms[a]), len(arms[b]))
        assert abs(t - ref_t(arms[a], arms[b])) <= 5.1e-7, (a, b)
