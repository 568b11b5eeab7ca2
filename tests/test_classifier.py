"""Trained quality classifier (operators/classifier.py): exact
pure-Python replay of the quantized GD pipeline, separation on a
labeled synthetic, featureless-doc contract, validation."""

from __future__ import annotations

import hashlib
import math
from decimal import ROUND_HALF_UP, Decimal

import pytest
from pyspark.sql import functions as F

from d365fo_db_sync_spark.operators.classifier import (
    LogRegModel,
    hashed_tf,
    logreg_fit,
    logreg_score,
)

#: driver-window tier: value-equality / contract tests (pytest -m fast)
pytestmark = pytest.mark.fast


def _feats(text: str) -> list[str]:
    toks = text.lower().split()
    return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]


def _bucket(f: str, m: int) -> int:
    return int(hashlib.md5(f.encode()).hexdigest()[:15], 16) % m


def _q(x: float, digits: int) -> float:
    """Mirror the JVM's double->decimal cast: Spark routes it through
    BigDecimal.valueOf, which quantizes the double's SHORTEST decimal
    representation (Double.toString), not its exact binary expansion —
    Decimal(repr(x)) reproduces that; Decimal(x) would diverge at the
    ~17th significant digit (found the hard way in the influence
    replay at the 1e-18 grid)."""
    return float(
        Decimal(repr(x)).quantize(
            Decimal(f"1e-{digits}"), rounding=ROUND_HALF_UP
        )
    )


def _d18(x: float) -> Decimal:
    """The engine's DECIMAL(38,18) term quantization, JVM semantics
    (shortest-repr, HALF_UP) — see :func:`_q`."""
    return Decimal(repr(x)).quantize(
        Decimal("1e-18"), rounding=ROUND_HALF_UP
    )


def _py_fit_score(rows, m, lr, rounds, lr_b=None):
    """The whole quantized pipeline in plain Python: hashed normalized
    TF, per-round sorted-fold scores, DECIMAL(38,12)-quantized
    sigmoids and weights, DECIMAL(38,18)-quantized gradient terms
    summed exactly."""
    xs: dict[int, dict[int, float]] = {}
    nf: dict[int, int] = {}
    for doc_id, text, _y in rows:
        fs = _feats(text) if text else []
        nf[doc_id] = len(fs)
        cnt: dict[int, int] = {}
        for f in fs:
            b = _bucket(f, m)
            cnt[b] = cnt.get(b, 0) + 1
        xs[doc_id] = {b: c / len(fs) for b, c in cnt.items()} if fs else {}
    lr_b = lr if lr_b is None else lr_b
    ys = {doc_id: float(y) for doc_id, _t, y in rows}
    n = len(rows)
    w: dict[int, float] = {}
    bias = 0.0

    def score(doc_id: int) -> float:
        s = 0.0
        for b in sorted(set(xs[doc_id]) & set(w)):
            s += w[b] * xs[doc_id][b]
        return s + bias

    for _ in range(rounds):
        resid = {
            d: _q(1.0 / (1.0 + math.exp(-score(d))), 12) - ys[d] for d in ys
        }
        grads: dict[int, Decimal] = {}
        for d, xv in xs.items():
            for b, x in xv.items():
                grads[b] = grads.get(b, Decimal(0)) + _d18(resid[d] * x)
        w = {
            b: _q(w.get(b, 0.0) - lr * (float(g) / n), 12)
            for b, g in grads.items()
        }
        gb = sum((_d18(r) for r in resid.values()), Decimal(0))
        bias = _q(bias - lr_b * (float(gb) / n), 12)

    out = {}
    for d in ys:
        s = score(d)
        out[d] = (nf[d], s, _q(1.0 / (1.0 + math.exp(-s)), 12))
    return w, bias, out


ROWS = [
    (0, "the quick brown fox jumps over the lazy dog", 1),
    (1, "the fox and the hound run through the field", 1),
    (2, "a quick dog jumps over a brown fence", 1),
    (3, "buy cheap pills now click here free offer", 0),
    (4, "click here free money offer cheap deal now", 0),
    (5, "cheap offer free pills click buy now deal", 0),
    (6, None, 0),
]


def test_fit_score_matches_python_replay(spark):
    """Weights, bias, scores and probabilities equal the Python
    replay double-for-double — the property the SQL oracle relies
    on."""
    m, lr, rounds = 64, 10.0, 2
    df = spark.createDataFrame(ROWS, "doc_id long, text string, y int")
    model = logreg_fit(df, "y", m_buckets=m, lr=lr, rounds=rounds)
    exp_w, exp_b, exp_out = _py_fit_score(ROWS, m, lr, rounds)
    assert model.bias == exp_b
    assert model.weights == exp_w

    got = {
        r["doc_id"]: (r["n_features"], r["score"], r["prob"])
        for r in logreg_score(df, model).collect()
    }
    assert got == exp_out

    # per-parameter learning rates (weights hot, bias cool): same
    # exact replay property
    m2 = logreg_fit(df, "y", m_buckets=m, lr=500.0, rounds=2, lr_bias=1.0)
    w2, b2, out2 = _py_fit_score(ROWS, m, 500.0, 2, lr_b=1.0)
    assert m2.bias == b2 and m2.weights == w2
    got2 = {
        r["doc_id"]: (r["n_features"], r["score"], r["prob"])
        for r in logreg_score(df, m2).collect()
    }
    assert got2 == out2


def test_fit_with_shared_features_is_identical(spark):
    """A precomputed ``hashed_tf`` frame passed through ``features=``
    (the r15 one-explode fit+score path) yields bit-identical weights,
    bias, and scored output to the self-featurizing fit — the
    value-preservation contract of the optimization."""
    m, lr, rounds = 64, 500.0, 2
    df = spark.createDataFrame(ROWS, "doc_id long, text string, y int")
    base_model = logreg_fit(df, "y", m_buckets=m, lr=lr, rounds=rounds, lr_bias=1.0)
    base_out = sorted(map(tuple, logreg_score(df, base_model).collect()))

    x = hashed_tf(df, "text", "doc_id", m).localCheckpoint(eager=True)
    model = logreg_fit(
        df, "y", m_buckets=m, lr=lr, rounds=rounds, lr_bias=1.0, features=x
    )
    assert model.bias == base_model.bias
    assert model.weights == base_model.weights
    out = sorted(map(tuple, logreg_score(df, model, features=x).collect()))
    assert out == base_out


def test_fused_rounds_match_python_replay(spark):
    """rounds >= 2 run the r16 FUSED round (one plan: per-doc
    (bucket, x, w*x) list -> sorted-subsequence score fold -> inline
    residual -> exploded gradient terms). Three rounds chain two fused
    rounds back to back; weights, bias and scores must equal the plain
    Python replay double-for-double — including the featureless doc
    (id 6), whose bias gradient term must survive the left join."""
    m, lr, rounds = 64, 500.0, 3
    df = spark.createDataFrame(ROWS, "doc_id long, text string, y int")
    model = logreg_fit(df, "y", m_buckets=m, lr=lr, rounds=rounds, lr_bias=1.0)
    exp_w, exp_b, exp_out = _py_fit_score(ROWS, m, lr, rounds, lr_b=1.0)
    assert model.bias == exp_b
    assert model.weights == exp_w
    got = {
        r["doc_id"]: (r["n_features"], r["score"], r["prob"])
        for r in logreg_score(df, model).collect()
    }
    assert got == exp_out


def test_separation_and_keep(spark):
    """Two rounds separate the classes on a clean synthetic: every
    reference-like doc outscores every crawl-like doc, keep follows
    the quantized threshold, and a featureless doc scores the bare
    bias (never a dropped row)."""
    df = spark.createDataFrame(ROWS, "doc_id long, text string, y int")
    model = logreg_fit(df, "y", m_buckets=64, lr=10.0, rounds=2)
    rows = {r["doc_id"]: r for r in logreg_score(df, model).collect()}
    assert set(rows) == set(range(7))
    pos = [rows[i]["prob"] for i in (0, 1, 2)]
    neg = [rows[i]["prob"] for i in (3, 4, 5)]
    assert min(pos) > max(neg)
    for r in rows.values():
        assert r["keep"] == (r["prob"] >= 0.5)
    # featureless doc: no features -> bare-bias score
    assert rows[6]["n_features"] == 0
    sig_bias = 1.0 / (1.0 + math.exp(-model.bias))
    assert rows[6]["prob"] == _q(sig_bias, 12)

    # the model is the quantized-grid one: every weight survives a
    # 12-digit decimal round-trip
    for w in list(model.weights.values()) + [model.bias]:
        assert w == _q(w, 12)


def test_hashed_tf_and_validation(spark):
    df = spark.createDataFrame(ROWS, "doc_id long, text string, y int")
    tf = hashed_tf(df, m_buckets=64)
    r = tf.filter(F.col("doc_id") == 0).collect()
    n = sum(row["cnt"] for row in r)
    assert all(row["n_features"] == n for row in r)
    assert all(row["x"] == row["cnt"] / n for row in r)
    assert tf.filter(F.col("doc_id") == 6).count() == 0  # NULL text
    # r15: n_features rides map-side (size of the feature array, cast
    # long) instead of a per-doc window sum — the published type and
    # column order must not drift with the plan change
    assert dict(tf.dtypes)["n_features"] == "bigint"
    assert tf.columns == ["doc_id", "bucket", "cnt", "n_features", "x"]
    empty = spark.createDataFrame(
        [(0, ""), (1, "   ")], "doc_id long, text string"
    )
    assert hashed_tf(empty, m_buckets=64).count() == 0  # no features -> no rows

    with pytest.raises(ValueError, match="m_buckets"):
        hashed_tf(df, m_buckets=1)
    with pytest.raises(ValueError, match="rounds"):
        logreg_fit(df, "y", rounds=0)
    with pytest.raises(ValueError, match="lr must be"):
        logreg_fit(df, "y", lr=0.0)
    with pytest.raises(ValueError, match="lr_bias"):
        logreg_fit(df, "y", lr_bias=-1.0)
    with pytest.raises(ValueError, match="empty training"):
        logreg_fit(df.filter("doc_id < 0"), "y")
    # scoring with a fresh (zero) model: everything sits at p = 0.5
    zero = logreg_score(df, LogRegModel(m_buckets=64)).collect()
    assert all(r["prob"] == 0.5 for r in zero)


@pytest.mark.parametrize(
    "rows, m, lr, lr_b",
    [
        # all-positive labels: resid = p-1 everywhere, bias dives
        ([(i, f"w{i} common token", 1) for i in range(5)], 16, 10.0, 10.0),
        # heavy bucket collisions: m=2 squashes every feature into
        # two buckets — weights still replay exactly
        ([(0, "a b c d", 1), (1, "e f g h", 0), (2, "a e", 1)], 2, 50.0, 1.0),
        # single labeled doc + an empty one
        ([(0, "only doc here", 1), (1, None, 0)], 8, 10.0, 10.0),
        # whitespace-only and duplicate-token texts
        ([(0, "   ", 0), (1, "x x x x x", 1), (2, "x y", 0)], 8, 200.0, 1.0),
    ],
)
def test_adversarial_corpora_replay_exactly(spark, rows, m, lr, lr_b):
    """Edge corpora (one-class labels, m=2 collisions, singleton,
    empty/duplicate texts): the Spark fit+score still equals the
    Python replay double-for-double — the quantized-GD discipline has
    no data-shape escape hatches."""
    df = spark.createDataFrame(rows, "doc_id long, text string, y int")
    model = logreg_fit(df, "y", m_buckets=m, lr=lr, rounds=2, lr_bias=lr_b)
    exp_w, exp_b, exp_out = _py_fit_score(rows, m, lr, 2, lr_b=lr_b)
    assert model.bias == exp_b and model.weights == exp_w
    got = {
        r["doc_id"]: (r["n_features"], r["score"], r["prob"])
        for r in logreg_score(df, model).collect()
    }
    assert got == exp_out


def test_influence_scores_replay_and_signs(spark):
    """TracIn single-checkpoint influence: exact equality with a
    Python replay of resid_i * (sum_b x_ib * gd_b + gd_bias), and the
    behavioral pins — a training doc IDENTICAL to a dev doc (same
    label) is a proponent (positive influence); its label-flipped twin
    is an opponent (negative)."""
    from d365fo_db_sync_spark.operators.classifier import influence_scores

    m, lr = 64, 10.0
    train_rows = ROWS[:6] + [
        # twin of dev doc 50 with the SAME label -> proponent
        (7, "the quick brown fox jumps over the lazy dog", 1),
        # same text, FLIPPED label -> opponent
        (8, "the quick brown fox jumps over the lazy dog", 0),
    ]
    dev_rows = [
        (50, "the quick brown fox jumps over the lazy dog", 1),
        (51, "buy cheap pills now click here free offer", 0),
    ]
    train = spark.createDataFrame(train_rows, "doc_id long, text string, y int")
    dev = spark.createDataFrame(dev_rows, "doc_id long, text string, y int")
    model = logreg_fit(train, "y", m_buckets=m, lr=lr, rounds=2)
    got = {
        r["doc_id"]: r["influence"]
        for r in influence_scores(train, dev, model, "y").collect()
    }

    # ---- Python replay ----
    def feats_x(rows):
        out = {}
        for doc_id, text, _y in rows:
            fs = _feats(text) if text else []
            cnt: dict[int, int] = {}
            for f in fs:
                b = _bucket(f, m)
                cnt[b] = cnt.get(b, 0) + 1
            out[doc_id] = (
                {b: c / len(fs) for b, c in cnt.items()} if fs else {}
            )
        return out

    def resid(rows):
        xs = feats_x(rows)
        out = {}
        for doc_id, _t, y in rows:
            s = (
                sum(
                    model.weights[b] * x
                    for b, x in sorted(xs[doc_id].items())
                    if b in model.weights
                )
                + model.bias
            )
            # mirror the engine: sorted-bucket fold then quantize
            s2 = 0.0
            for b in sorted(set(xs[doc_id]) & set(model.weights)):
                s2 += model.weights[b] * xs[doc_id][b]
            s = s2 + model.bias
            out[doc_id] = _q(1.0 / (1.0 + math.exp(-s)), 12) - y
        return out, xs

    from decimal import Decimal

    dev_r, dev_x = resid(dev_rows)
    nd = len(dev_rows)
    gd: dict[int, float] = {}
    acc: dict[int, Decimal] = {}
    for d, xv in dev_x.items():
        for b, x in xv.items():
            acc[b] = acc.get(b, Decimal(0)) + _d18(dev_r[d] * x)
    gd = {b: float(a) / nd for b, a in acc.items()}
    gdb = float(sum((_d18(r) for r in dev_r.values()), Decimal(0))) / nd
    tr_r, tr_x = resid(train_rows)
    exp = {}
    for d in tr_r:
        # r14: per-term DECIMAL(38,18) quantization + exact order-free
        # sum (was a bucket-sorted double fold)
        s_dec = sum(
            (_d18(tr_x[d][b] * gd[b]) for b in set(tr_x[d]) & set(gd)),
            Decimal(0),
        )
        exp[d] = tr_r[d] * (float(s_dec) + gdb)
    assert got == exp

    # behavioral pins
    assert got[7] > 0  # same-label twin: proponent
    assert got[8] < 0  # flipped-label twin: opponent
    assert got[7] * got[8] < 0

    import pytest as _pt

    with _pt.raises(ValueError, match="empty dev"):
        influence_scores(train, dev.filter("doc_id < 0"), model, "y")
