"""Trained char-n-gram Naive Bayes language ID (operators/langid.py):
exact Python replay, held-out accuracy, featureless fallback,
validation."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from d365fo_db_sync_spark.operators.langid import (
    char_ngram_buckets,
    nb_fit,
    nb_predict,
)


def _buckets(text: str | None, n: int, m: int) -> list[int]:
    if text is None:
        return []
    t = text.lower()
    if len(t) < n:
        return []
    return [
        int(hashlib.md5(t[i : i + n].encode()).hexdigest()[:15], 16) % m
        for i in range(len(t) - n + 1)
    ]


def _py_nb(train, score, n, m):
    """Plain-Python replay of the full fit+predict expression tree:
    Laplace likelihoods, doc-count priors, bucket-sorted sequential
    folds, smallest-label tie-breaks."""
    labels = sorted({l for _i, _t, l in train if l is not None})
    nl = {l: 0 for l in labels}
    tl = {l: 0 for l in labels}
    c: dict[tuple[str, int], int] = {}
    for _i, t, l in train:
        if l is None:
            continue
        bs = _buckets(t, n, m)
        nl[l] += 1
        tl[l] += len(bs)
        for b in bs:
            c[(l, b)] = c.get((l, b), 0) + 1
    N = sum(nl.values())
    pri = {l: math.log(nl[l] / N) for l in labels}
    llh = {
        (l, b): math.log((c.get((l, b), 0) + 1) / (tl[l] + m))
        for l in labels
        for b in range(m)
    }
    out = {}
    for i, t, _l in score:
        cnt: dict[int, int] = {}
        for b in _buckets(t, n, m):
            cnt[b] = cnt.get(b, 0) + 1
        best = None
        for l in labels:
            if cnt:
                s = 0.0
                for b in sorted(cnt):
                    s += cnt[b] * llh[(l, b)]
                s += pri[l]
            else:
                s = pri[l]
            if best is None or s > best[1] or (s == best[1] and l < best[0]):
                best = (l, s)
        out[i] = best
    return out


ROWS = [
    (0, "the cat sat on the mat and the dog ran", "en"),
    (1, "she sells sea shells on the sea shore", "en"),
    (2, "the rain in spain stays mainly on the plain", "en"),
    (3, "der hund lief schnell durch den dunklen wald", "de"),
    (4, "die katze schlaeft gern in der warmen sonne", "de"),
    (5, "ich gehe morgen frueh zur schule und lerne", "de"),
    (6, "aaaa bbbb cccc", None),  # NULL label: excluded from the fit
]


def test_matches_python_replay_exactly(spark):
    """Predictions AND posterior log-probs equal the Python replay —
    the property the SQL oracle relies on."""
    n, m = 3, 64
    df = spark.createDataFrame(ROWS, "doc_id long, text string, lang string")
    model = nb_fit(df, n=n, m_buckets=m)
    got = {
        r["doc_id"]: (r["lang_pred"], r["log_prob"])
        for r in nb_predict(df, model, n=n, m_buckets=m).collect()
    }
    exp = _py_nb(ROWS, ROWS, n, m)
    assert set(got) == set(exp)
    for i in exp:
        assert got[i][0] == exp[i][0]
        # Java's and CPython's libm ln may differ in the last ulp —
        # the SQL oracle (DuckDB) is the parity partner, and the
        # harness hashes floats at 9 decimals; pin to 1e-12 here
        assert got[i][1] == pytest.approx(exp[i][1], rel=1e-12, abs=1e-12)
    # the model spine is complete: |classes| x m rows
    assert model.count() == 2 * m


def test_heldout_accuracy_and_fallback(spark):
    """Train on 80% of a two-language synthetic, predict the held-out
    20% perfectly; featureless (short/NULL) docs fall back to the
    prior argmax; ties break toward the smallest label."""
    rows = []
    for i in range(40):
        rows.append((i, f"the quick brown fox number {i} jumps high", "en"))
    for i in range(40, 75):
        rows.append((i, f"der schnelle braune fuchs nummer {i} springt", "de"))
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    train = df.filter(F.pmod("doc_id", F.lit(5)) != 0)
    test = df.filter(F.pmod("doc_id", F.lit(5)) == 0)
    model = nb_fit(train)
    pred = nb_predict(test, model)
    joined = pred.join(df.select("doc_id", "lang"), on="doc_id")
    assert joined.filter(F.col("lang_pred") != F.col("lang")).count() == 0

    # featureless docs: the bare-prior argmax — 'en' has more training
    # docs (32 vs 28), so empties read 'en' with log_prob = ln(32/60)
    empty = spark.createDataFrame(
        [(100, None), (101, "ab")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in nb_predict(empty, model).collect()}
    for i in (100, 101):
        assert got[i]["lang_pred"] == "en"
        assert got[i]["log_prob"] == pytest.approx(
            math.log(32 / 60), rel=1e-12
        )


def test_validation_and_gram_edges(spark):
    df = spark.createDataFrame(ROWS, "doc_id long, text string, lang string")
    with pytest.raises(ValueError, match="n must be"):
        char_ngram_buckets("text", n=0)
    with pytest.raises(ValueError, match="m_buckets"):
        char_ngram_buckets("text", m_buckets=1)
    with pytest.raises(ValueError, match="no labeled rows"):
        nb_fit(df.filter("lang IS NULL AND doc_id < 0"))
    # exact-length text yields exactly one gram; shorter yields none
    g = spark.createDataFrame(
        [("abc",), ("ab",), (None,)], "text string"
    ).select(char_ngram_buckets("text", n=3, m_buckets=8).alias("b"))
    sizes = [len(r["b"]) for r in g.collect()]
    assert sizes == [1, 0, 0]
