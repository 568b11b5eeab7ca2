"""Feature-hashing MIPS retrieval (operators/retrieval.py): hash-space
contracts, brute-force score equality, tie discipline, and the
broadcast plan shape the corpus-side scale story depends on."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from d365fo_db_sync_spark.operators.retrieval import hashed_token_features, mips_topk


def _bucket(tok: str, dims: int = 256) -> int:
    return int(hashlib.md5(tok.encode()).hexdigest()[:4], 16) % dims


def _features(text: str, dims: int = 256) -> dict[int, int]:
    out: dict[int, int] = {}
    for tok in text.lower().split():
        b = _bucket(tok, dims)
        out[b] = out.get(b, 0) + 1
    return out


@pytest.fixture()
def corpus(spark):
    rows = [
        (0, "spark shuffle join window"),
        (1, "spark spark spark aggregate"),
        (2, "totally unrelated words here"),
        (3, "join window shuffle spark"),  # same bag as 0
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_hashed_features_match_reference(spark, corpus):
    feats = hashed_token_features(corpus, "doc_id", "text", dims=256).collect()
    got: dict[int, dict[int, int]] = {}
    for r in feats:
        got.setdefault(r["doc_id"], {})[r["bucket"]] = r["weight"]
    rows = {r["doc_id"]: r["text"] for r in corpus.collect()}
    for i, text in rows.items():
        assert got[i] == _features(text)
    assert all(0 <= r["bucket"] < 256 for r in feats)


def test_mips_topk_matches_bruteforce_and_breaks_ties_by_id(spark, corpus):
    queries = spark.createDataFrame(
        [(100, "spark shuffle join window")], "query_id long, text string"
    )
    feats = hashed_token_features(corpus, "doc_id", "text")
    qf = hashed_token_features(queries, "query_id", "text")
    got = sorted(
        (r["rnk"], r["doc_id"], r["score"])
        for r in mips_topk(feats, qf, k=4, corpus_id="doc_id").collect()
    )
    qv = _features("spark shuffle join window")
    texts = {r["doc_id"]: r["text"] for r in corpus.collect()}
    # zero-score documents share no posting, so the join never ranks
    # them — mirror that in the reference
    brute = sorted(
        (
            -sum(w * _features(t).get(b, 0) for b, w in qv.items()),
            i,
        )
        for i, t in texts.items()
        if sum(w * _features(t).get(b, 0) for b, w in qv.items()) > 0
    )
    want = [(rk + 1, i, -neg) for rk, (neg, i) in enumerate(brute)]
    assert got == want
    # docs 0 and 3 share the exact bag -> tied score, id ascending wins
    assert [g[1] for g in got if g[2] == got[0][2]] == [0, 3]


def test_mips_topk_query_side_broadcasts(spark, corpus):
    queries = spark.createDataFrame(
        [(100, "spark words")], "query_id long, text string"
    )
    feats = hashed_token_features(corpus, "doc_id", "text")
    qf = hashed_token_features(queries, "query_id", "text")
    plan = (
        mips_topk(feats, qf, k=2, corpus_id="doc_id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan  # corpus postings stay map-side


def test_retrieval_validates_args(spark, corpus):
    with pytest.raises(ValueError):
        hashed_token_features(corpus, "doc_id", "text", dims=0)
    feats = hashed_token_features(corpus, "doc_id", "text")
    with pytest.raises(ValueError):
        mips_topk(feats, feats, k=0)
