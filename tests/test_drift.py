"""Distribution-drift operators (operators/drift.py): PSI vs a Python
brute force, integer-exact KS vs exhaustive CDF comparison, degenerate
and validation cases."""

from __future__ import annotations

import math
from fractions import Fraction

import pytest

from d365fo_db_sync_spark.operators.drift import ks_statistic, psi


def _mk(spark, vals, col="x"):
    return spark.createDataFrame([(v,) for v in vals], f"{col} long")


def test_psi_matches_bruteforce(spark):
    ref_vals = [10, 12, 15, 20, 22, 30, 35, 40, 45, 50]
    cur_vals = [40, 42, 45, 48, 50, 50, 38, 44]
    out = psi(_mk(spark, ref_vals), _mk(spark, cur_vals), "x", n_bins=4).collect()

    lo, hi = min(ref_vals), max(ref_vals)
    width = (hi - lo) / 4.0

    def bin_of(v):
        return min(max(int(math.floor((v - lo) / width)), 0), 3)

    nr, nc = {}, {}
    for v in ref_vals:
        nr[bin_of(v)] = nr.get(bin_of(v), 0) + 1
    for v in cur_vals:
        nc[bin_of(v)] = nc.get(bin_of(v), 0) + 1
    got = {r["bin"]: r for r in out}
    assert set(got) == set(nr) | set(nc)
    total = 0.0
    for b, r in got.items():
        p = max(nr.get(b, 0) / len(ref_vals), 1e-6)
        q = max(nc.get(b, 0) / len(cur_vals), 1e-6)
        exp = (p - q) * math.log(p / q)
        assert abs(r["psi_term"] - exp) < 1e-12
        assert (r["n_ref"], r["n_cur"]) == (nr.get(b, 0), nc.get(b, 0))
        total += exp
    # this split is heavily shifted -> well above the 0.25 rule of thumb
    assert total > 0.25


def test_psi_identical_distributions_near_zero(spark):
    vals = list(range(100))
    out = psi(_mk(spark, vals), _mk(spark, vals), "x", n_bins=10).collect()
    assert abs(sum(r["psi_term"] for r in out)) < 1e-12
    assert all(r["n_ref"] == r["n_cur"] == 10 for r in out)


def test_psi_degenerate_constant_reference(spark):
    out = psi(_mk(spark, [5, 5, 5]), _mk(spark, [5, 9]), "x", n_bins=4).collect()
    # hi == lo: everything lands in bin 0 on both sides
    assert [(r["bin"], r["n_ref"], r["n_cur"]) for r in out] == [(0, 3, 2)]
    assert abs(out[0]["psi_term"]) < 1e-12


def test_psi_validation(spark):
    df = _mk(spark, [1])
    with pytest.raises(ValueError, match="n_bins"):
        psi(df, df, "x", n_bins=1)
    with pytest.raises(ValueError, match="eps"):
        psi(df, df, "x", eps=0)


def test_ks_matches_exhaustive(spark):
    ref_vals = [1, 2, 2, 3, 5, 8, 9]
    cur_vals = [4, 5, 6, 6, 7, 9, 9, 10]
    row = ks_statistic(_mk(spark, ref_vals), _mk(spark, cur_vals), "x").collect()[0]
    n_r, n_c = len(ref_vals), len(cur_vals)
    best, best_v = Fraction(0), None
    for v in sorted(set(ref_vals) | set(cur_vals)):
        fr = Fraction(sum(1 for x in ref_vals if x <= v), n_r)
        fc = Fraction(sum(1 for x in cur_vals if x <= v), n_c)
        gap = abs(fr - fc)
        if gap > best:
            best, best_v = gap, v
    assert row["ks"] == float(best)
    assert row["at_value"] == best_v
    assert (row["n_ref"], row["n_cur"]) == (n_r, n_c)


def test_ks_identical_is_zero_and_tie_breaks_low(spark):
    vals = [3, 1, 4, 1, 5]
    row = ks_statistic(_mk(spark, vals), _mk(spark, vals), "x").collect()[0]
    assert row["ks"] == 0.0
    assert row["at_value"] == 1  # all gaps tie at 0 -> smallest value wins


def test_ks_disjoint_supports_is_one(spark):
    row = ks_statistic(
        _mk(spark, [1, 2, 3]), _mk(spark, [10, 11]), "x"
    ).collect()[0]
    assert row["ks"] == 1.0
    assert row["at_value"] == 3


def test_psi_categorical_matches_bruteforce(spark):
    from d365fo_db_sync_spark.operators.drift import psi_categorical

    ref = [("en",)] * 8 + [("de",)] * 2
    cur = [("en",)] * 3 + [("fr",)] * 7  # de vanished, fr appeared
    rdf = spark.createDataFrame(ref, "lang string")
    cdf = spark.createDataFrame(cur, "lang string")
    out = {r["category"]: r for r in psi_categorical(rdf, cdf, "lang").collect()}
    assert set(out) == {"en", "de", "fr"}
    for cat, nr, nc in (("en", 8, 3), ("de", 2, 0), ("fr", 0, 7)):
        p = max(nr / 10, 1e-6)
        q = max(nc / 10, 1e-6)
        r = out[cat]
        assert (r["n_ref"], r["n_cur"]) == (nr, nc)
        assert abs(r["psi_term"] - (p - q) * math.log(p / q)) < 1e-12
    # vanished + appeared categories dominate: massive PSI
    assert sum(r["psi_term"] for r in out.values()) > 1.0


def test_psi_categorical_null_and_validation(spark):
    from d365fo_db_sync_spark.operators.drift import psi_categorical

    rdf = spark.createDataFrame([("en",), (None,)], "lang string")
    out = psi_categorical(rdf, rdf, "lang").collect()
    assert [(r["category"], r["n_ref"], r["n_cur"]) for r in out] == [("en", 1, 1)]
    with pytest.raises(ValueError, match="eps"):
        psi_categorical(rdf, rdf, "lang", eps=-1)


def test_mann_whitney_matches_exhaustive_pairs(spark):
    import itertools
    import random

    from d365fo_db_sync_spark.operators.drift import mann_whitney_auc

    rng = random.Random(9)
    a = [rng.randrange(0, 25) for _ in range(70)]
    b = [rng.randrange(8, 33) for _ in range(50)]
    row = mann_whitney_auc(_mk(spark, a), _mk(spark, b), "x").collect()[0]
    num = sum(
        Fraction(1) if r < c else Fraction(1, 2) if r == c else Fraction(0)
        for r, c in itertools.product(a, b)
    )
    assert row["u_statistic"] == float(num)
    assert row["auc"] == float(num / (len(a) * len(b)))
    assert (row["n_ref"], row["n_cur"]) == (len(a), len(b))


def test_mann_whitney_limits(spark):
    from d365fo_db_sync_spark.operators.drift import mann_whitney_auc

    # identical samples: AUC exactly 0.5 (all mass in ties)
    row = mann_whitney_auc(_mk(spark, [1, 2, 3]), _mk(spark, [1, 2, 3]), "x").collect()[0]
    assert row["auc"] == 0.5
    # complete separation in each direction
    hi = mann_whitney_auc(_mk(spark, [1, 2]), _mk(spark, [5, 6]), "x").collect()[0]
    lo = mann_whitney_auc(_mk(spark, [5, 6]), _mk(spark, [1, 2]), "x").collect()[0]
    assert hi["auc"] == 1.0 and hi["u_statistic"] == 4.0
    assert lo["auc"] == 0.0 and lo["u_statistic"] == 0.0


def test_spine_guard_raises_on_high_cardinality(spark):
    """The r10-flagged invariant, now code: a row-cardinality double
    column is refused before the unpartitioned cumulative window ever
    plans; max_spine=None restores the old behavior for provably
    bounded domains."""
    from pyspark.sql import functions as F

    from d365fo_db_sync_spark.operators.drift import (
        ks_statistic,
        mann_whitney_auc,
        wasserstein_1,
    )

    big = spark.range(50_000).select(
        (F.col("id").cast("double") + F.lit(0.5)).alias("x")
    )
    for fn in (ks_statistic, mann_whitney_auc, wasserstein_1):
        with pytest.raises(ValueError, match="max_spine"):
            fn(big, big, "x", max_spine=10_000)
    # bounded override: same data, guard skipped, plan unchanged
    row = ks_statistic(big, big, "x", max_spine=None).collect()[0]
    assert row["ks"] == 0.0


def test_empty_side_yields_null_not_error(spark):
    """ANSI-mode guard: an empty reference or stream yields NULL
    statistics (try_divide), never a divide-by-zero error — the
    psi_from_counts discipline extended to every drift operator."""
    from d365fo_db_sync_spark.operators.drift import (
        ks_statistic,
        mann_whitney_auc,
        psi_categorical,
        wasserstein_1,
    )

    some = _mk(spark, [1, 2, 3])
    empty = _mk(spark, [])
    row = ks_statistic(some, empty, "x").collect()[0]
    assert row["ks"] is None and row["n_cur"] == 0
    row = mann_whitney_auc(empty, some, "x").collect()[0]
    assert row["auc"] is None
    row = wasserstein_1(some, empty, "x").collect()[0]
    assert row["w1"] is None
    # categorical: empty side floors to eps everywhere, no error
    cat = spark.createDataFrame([("en",), ("de",)], "lang string")
    ecat = spark.createDataFrame([], "lang string")
    rows = psi_categorical(cat, ecat, "lang").collect()
    assert {r["category"] for r in rows} == {"en", "de"}
    assert all(r["p_cur"] == 1e-6 for r in rows)


def test_wasserstein_matches_bruteforce(spark):
    """W1 vs the exact Fraction-arithmetic integral of |F_ref - F_cur|
    over the observed spine."""
    from d365fo_db_sync_spark.operators.drift import wasserstein_1

    ref_vals = [1, 2, 2, 3, 5, 8, 9]
    cur_vals = [4, 5, 6, 6, 7, 9, 9, 10]
    row = wasserstein_1(_mk(spark, ref_vals), _mk(spark, cur_vals), "x").collect()[0]
    n_r, n_c = len(ref_vals), len(cur_vals)
    spine = sorted(set(ref_vals) | set(cur_vals))
    exact = Fraction(0)
    for v, v_next in zip(spine, spine[1:]):
        fr = Fraction(sum(1 for x in ref_vals if x <= v), n_r)
        fc = Fraction(sum(1 for x in cur_vals if x <= v), n_c)
        exact += abs(fr - fc) * (v_next - v)
    assert row["w1"] == float(exact)
    assert (row["n_ref"], row["n_cur"]) == (n_r, n_c)


def test_wasserstein_limits(spark):
    from d365fo_db_sync_spark.operators.drift import wasserstein_1

    # identical distributions: exactly zero
    row = wasserstein_1(_mk(spark, [3, 1, 4]), _mk(spark, [4, 1, 3]), "x").collect()[0]
    assert row["w1"] == 0.0
    # point masses at distance d: W1 == d
    row = wasserstein_1(_mk(spark, [2, 2]), _mk(spark, [7, 7]), "x").collect()[0]
    assert row["w1"] == 5.0
    # single shared point: zero via the coalesce (no gaps to sum)
    row = wasserstein_1(_mk(spark, [5]), _mk(spark, [5, 5]), "x").collect()[0]
    assert row["w1"] == 0.0


def test_binned_quantiles_matches_bruteforce(spark):
    """Interpolated histogram quantiles vs a Python replay of the same
    definition, plus the one-bin-width error bound against true
    quantiles on a uniform stream."""
    from d365fo_db_sync_spark.operators.drift import binned_quantiles

    vals = list(range(1000))  # uniform 0..999
    df = _mk(spark, vals)
    qs = [0.25, 0.5, 0.9, 0.99, 1.0]
    n_bins = 50
    got = {r["q"]: r["est"] for r in binned_quantiles(df, "x", qs, n_bins).collect()}

    lo, hi = 0.0, 999.0
    width = (hi - lo) / n_bins
    import math

    bins = [0] * n_bins
    for v in vals:
        bins[min(max(int(math.floor((v - lo) / width)), 0), n_bins - 1)] += 1
    n = len(vals)
    for q in qs:
        target = q * n
        cum = 0
        for b, cnt in enumerate(bins):
            if cum + cnt >= target:
                expect = lo + width * (b + (target - cum) / cnt)
                break
            cum += cnt
        assert got[q] == expect
        true_q = q * (n - 1)  # uniform: value == rank
        assert abs(got[q] - true_q) <= width + 1e-9

    # degenerate constant column: every quantile is the constant
    const = _mk(spark, [7, 7, 7])
    rows = binned_quantiles(const, "x", [0.5, 1.0], 10).collect()
    assert all(r["est"] == 7.0 for r in rows)

    import pytest

    with pytest.raises(ValueError, match="quantiles"):
        binned_quantiles(df, "x", [0.0])
    with pytest.raises(ValueError, match="at least one"):
        binned_quantiles(df, "x", [])


def test_jsd_matches_bruteforce_and_limits(spark):
    """Per-bin JSD terms vs a Python replay; identical distributions
    read exactly zero; disjoint supports read ln 2 total; a brand-new
    bin contributes FINITE mass (the PSI epsilon-spike complement)."""
    import math as _m

    from d365fo_db_sync_spark.operators.drift import jsd

    ref_vals = [10, 12, 15, 20, 22, 30, 35, 40, 45, 50]
    cur_vals = [40, 42, 45, 48, 50, 50, 38, 44]
    rows = jsd(_mk(spark, ref_vals), _mk(spark, cur_vals), "x", n_bins=4).collect()

    lo, hi = min(ref_vals), max(ref_vals)
    width = (hi - lo) / 4.0

    def bin_of(v):
        return min(max(int(_m.floor((v - lo) / width)), 0), 3)

    nr: dict[int, int] = {}
    nc: dict[int, int] = {}
    for v in ref_vals:
        nr[bin_of(v)] = nr.get(bin_of(v), 0) + 1
    for v in cur_vals:
        nc[bin_of(v)] = nc.get(bin_of(v), 0) + 1
    for r in rows:
        p = nr.get(r["bin"], 0) / len(ref_vals)
        q = nc.get(r["bin"], 0) / len(cur_vals)
        m = (p + q) / 2.0
        exp = 0.5 * (
            (p * _m.log(p / m) if p > 0 else 0.0)
            + (q * _m.log(q / m) if q > 0 else 0.0)
        )
        assert r["jsd_term"] == pytest.approx(exp, rel=1e-12, abs=1e-15)
        assert r["jsd_term"] >= 0.0

    same = jsd(_mk(spark, ref_vals), _mk(spark, ref_vals), "x", n_bins=4)
    assert all(r["jsd_term"] == 0.0 for r in same.collect())

    # disjoint supports (as a raw spine — raw values would clamp into
    # the reference edge bins by design): total JSD is exactly ln 2,
    # every term finite despite the true zeros PSI would eps-floor
    from d365fo_db_sync_spark.operators.drift import jsd_from_counts

    spine = spark.createDataFrame(
        [(0, 5, 0), (1, 0, 7)], "bin int, n_ref long, n_cur long"
    )
    total = sum(r["jsd_term"] for r in jsd_from_counts(spine).collect())
    assert total == pytest.approx(_m.log(2.0), rel=1e-12)


def test_psi_by_group_equals_per_group_psi(spark):
    """psi_by_group rows for each group equal an independent psi() run
    restricted to that group — same edges, same terms, double for
    double; groups without a reference baseline are excluded."""
    from pyspark.sql import functions as F

    from d365fo_db_sync_spark.operators.drift import psi, psi_by_group

    ref_rows = (
        [("en", v) for v in [10, 20, 30, 40, 50]]
        + [("de", v) for v in [100, 140, 180]]
    )
    cur_rows = (
        [("en", v) for v in [40, 45, 50, 55]]
        + [("de", v) for v in [100, 100, 180]]
        + [("fr", v) for v in [7, 8]]        # no ref baseline -> excluded
        + [(None, 1), ("en", None)]          # NULLs excluded
    )
    ref = spark.createDataFrame(ref_rows, "g string, x long")
    cur = spark.createDataFrame(cur_rows, "g string, x long")
    got = psi_by_group(ref, cur, "x", "g", n_bins=4).collect()
    assert {r["g"] for r in got} == {"en", "de"}
    by_group = {}
    for r in got:
        by_group.setdefault(r["g"], {})[r["bin"]] = r
    for g in ("en", "de"):
        solo = {
            r["bin"]: r
            for r in psi(
                ref.filter(F.col("g") == g),
                cur.filter(F.col("g") == g),
                "x",
                n_bins=4,
            ).collect()
        }
        assert set(solo) == set(by_group[g])
        for b, r in solo.items():
            gr = by_group[g][b]
            assert (gr["n_ref"], gr["n_cur"]) == (r["n_ref"], r["n_cur"])
            assert gr["psi_term"] == r["psi_term"]

    import pytest as _pt

    with _pt.raises(ValueError, match="n_bins"):
        psi_by_group(ref, cur, "x", "g", n_bins=1)


def test_embedding_centroid_drift_bruteforce(spark):
    """Exact Python replay of the dyadic quantization + dim-sorted
    folds; identical snapshots read cos == 1.0 / l2 == 0.0 exactly."""
    import random

    from d365fo_db_sync_spark.operators.drift import embedding_centroid_drift

    rng = random.Random(3)
    dim = 8
    ref_rows = [[rng.uniform(-1, 1) for _ in range(dim)] for _ in range(40)]
    cur_rows = [[rng.uniform(-1, 1) + 0.3 for _ in range(dim)] for _ in range(25)]
    import struct as _struct

    def f32(x):  # what parquet float32 storage does to a double
        return _struct.unpack("f", _struct.pack("f", x))[0]

    ref_rows = [[f32(x) for x in v] for v in ref_rows]
    cur_rows = [[f32(x) for x in v] for v in cur_rows]
    mk = lambda rows: spark.createDataFrame(
        [(v,) for v in rows], "embedding array<float>"
    )
    row = embedding_centroid_drift(mk(ref_rows), mk(cur_rows), "embedding").collect()[0]

    mult = float(1 << 20)
    sr = [sum(math.floor(v[d] * mult) for v in ref_rows) for d in range(dim)]
    sc = [sum(math.floor(v[d] * mult) for v in cur_rows) for d in range(dim)]
    dot = nr2 = nc2 = l2sq = 0.0
    for d in range(dim):
        dot += float(sr[d]) * float(sc[d])
        nr2 += float(sr[d]) * float(sr[d])
        nc2 += float(sc[d]) * float(sc[d])
        diff = sr[d] / len(ref_rows) - sc[d] / len(cur_rows)
        l2sq += diff * diff
    assert row["cos_centroid"] == dot / (math.sqrt(nr2) * math.sqrt(nc2))
    assert row["l2_centroid"] == math.sqrt(l2sq) / mult
    assert (row["n_ref"], row["n_cur"]) == (40, 25)
    # the 0.3 shift should be visible in metric units
    assert row["l2_centroid"] == pytest.approx(0.3 * math.sqrt(dim), rel=0.4)

    same = embedding_centroid_drift(mk(ref_rows), mk(ref_rows), "embedding").collect()[0]
    # sqrt(x)*sqrt(x) != x in floats: identity cosine is 1 +/- an ulp
    assert same["cos_centroid"] == pytest.approx(1.0, abs=1e-12)
    assert same["l2_centroid"] == 0.0

    with pytest.raises(ValueError, match="scale_bits"):
        embedding_centroid_drift(mk(ref_rows), mk(cur_rows), "embedding", scale_bits=0)


def test_embedding_centroid_drift_ragged_raises(spark):
    """The uniform-dims contract is enforced at evaluation, not
    assumed: ragged vector lengths — within a side or across sides —
    raise loudly instead of silently truncating to the shared dims
    (the r11 verdict's silence). An entirely EMPTY side is not ragged:
    the statistic is undefined against nothing and reads NULL."""
    from d365fo_db_sync_spark.operators.drift import embedding_centroid_drift

    mk = lambda rows: spark.createDataFrame(
        [(v,) for v in rows], "embedding array<float>"
    )
    uniform = mk([[1.0, 2.0], [3.0, 4.0]])

    # within-side ragged: one short vector among long ones
    ragged = mk([[1.0, 2.0], [3.0]])
    with pytest.raises(Exception, match="ragged"):
        embedding_centroid_drift(ragged, uniform, "embedding").collect()
    with pytest.raises(Exception, match="ragged"):
        embedding_centroid_drift(uniform, ragged, "embedding").collect()

    # cross-side mismatch: each side internally uniform, lengths differ
    longer = mk([[1.0, 2.0, 3.0], [4.0, 5.0, 6.0]])
    with pytest.raises(Exception, match="ragged"):
        embedding_centroid_drift(uniform, longer, "embedding").collect()

    # an empty side (no rows / only NULL vectors) -> NULL statistics,
    # never a ragged error
    empty = mk([]).filter("embedding IS NOT NULL")
    row = embedding_centroid_drift(empty, uniform, "embedding").collect()[0]
    assert row["cos_centroid"] is None and row["n_ref"] is None
    assert row["n_cur"] == 2
    both = embedding_centroid_drift(empty, empty, "embedding").collect()[0]
    assert both["cos_centroid"] is None and both["n_cur"] is None


def test_drift_summary_matches_individual_operators(spark):
    """The one-row dashboard equals each standalone statistic (PSI/JSD
    totals via the bin-ordered fold of the same terms) — and the
    empty-side/guard contracts carry through."""
    from d365fo_db_sync_spark.operators.drift import (
        drift_summary,
        jsd,
        ks_statistic,
        mann_whitney_auc,
        psi,
        wasserstein_1,
    )

    ref = _mk(spark, [10, 12, 15, 20, 22, 30, 35, 40, 45, 50])
    cur = _mk(spark, [40, 42, 45, 48, 50, 50, 38, 44])
    row = drift_summary(ref, cur, "x", n_bins=4).collect()[0]

    psi_terms = sorted(
        (r["bin"], r["psi_term"]) for r in psi(ref, cur, "x", n_bins=4).collect()
    )
    acc = 0.0
    for _, t in psi_terms:
        acc += t
    assert row["psi_total"] == acc
    jsd_terms = sorted(
        (r["bin"], r["jsd_term"]) for r in jsd(ref, cur, "x", n_bins=4).collect()
    )
    acc = 0.0
    for _, t in jsd_terms:
        acc += t
    assert row["jsd_total"] == acc
    assert row["ks"] == ks_statistic(ref, cur, "x").collect()[0]["ks"]
    assert row["auc"] == mann_whitney_auc(ref, cur, "x").collect()[0]["auc"]
    assert row["w1"] == wasserstein_1(ref, cur, "x").collect()[0]["w1"]
    assert (row["n_ref"], row["n_cur"]) == (10, 8)

    with pytest.raises(ValueError, match="max_spine"):
        drift_summary(
            _mk(spark, list(range(5000))), _mk(spark, [1]), "x", max_spine=1000
        )
