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


def _naive_mmr(qvec, cand, k, lam):
    """Independent pure-Python full MMR (no numpy, no shortlist):
    cand = {id: vector}; returns [(rnk, id, relevance, mmr_score)]."""
    import math

    def cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        return num / (
            math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b))
        )

    rel = {i: cos(qvec, v) for i, v in cand.items()}
    selected, out = [], []
    remaining = sorted(cand)
    for step in range(min(k, len(cand))):
        best, best_score = None, None
        for i in remaining:  # ascending id = tie-break
            pen = max((cos(cand[i], cand[s]) for s in selected), default=0.0)
            score = lam * rel[i] - (1.0 - lam) * pen
            if best is None or score > best_score:
                best, best_score = i, score
        selected.append(best)
        remaining.remove(best)
        out.append((step + 1, best, rel[best], best_score))
    return out


def test_mmr_rerank_matches_naive_full_mmr(spark):
    """With shortlist >= |corpus|, mmr_rerank IS full MMR: selection
    order, relevance, and mmr_score all match an independent naive
    implementation, across lambdas, k, queries, and partitionings."""
    import random

    import pytest

    from d365fo_db_sync_spark.operators.similarity import mmr_rerank

    rng = random.Random(7)
    n, dim = 24, 6
    cand = {
        i: [rng.gauss(0, 1) for _ in range(dim)] for i in range(n)
    }
    # plant a near-duplicate pair at high relevance to exercise the
    # diversity penalty: 100 and 101 are almost identical directions
    base = [1.0, 0.9, 0.1, 0.0, 0.2, 0.1]
    cand[100] = base
    cand[101] = [x * 1.001 + 1e-4 for x in base]
    corpus = spark.createDataFrame(
        [(i, v) for i, v in cand.items()], "vec_id long, embedding array<double>"
    )
    qvecs = {-1: [1.0, 1.0, 0.0, 0.0, 0.0, 0.0], -2: [0.0, 0.0, 1.0, 1.0, 0.0, 0.0]}
    queries = spark.createDataFrame(
        [(q, v) for q, v in qvecs.items()], "query_id long, embedding array<double>"
    )

    for lam in (1.0, 0.7, 0.4):
        got = mmr_rerank(
            corpus.repartition(5), queries, k=6, lam=lam, shortlist=n + 2
        ).collect()
        by_q = {}
        for r in got:
            by_q.setdefault(r["query_id"], []).append(
                (r["rnk"], r["neighbor_id"], r["relevance"], r["mmr_score"])
            )
        for q, qvec in qvecs.items():
            expected = _naive_mmr(qvec, cand, k=6, lam=lam)
            rows = sorted(by_q[q])
            assert [x[:2] for x in rows] == [x[:2] for x in expected], (lam, q)
            for g, e in zip(rows, expected):
                assert g[2] == pytest.approx(e[2], abs=1e-12)
                assert g[3] == pytest.approx(e[3], abs=1e-12)

    # the diversity property itself: pure relevance (lam=1) takes both
    # planted near-duplicates back to back; lam=0.5 must not
    top_lam1 = [
        r["neighbor_id"]
        for r in mmr_rerank(corpus, queries, k=2, lam=1.0, shortlist=n + 2)
        .filter("query_id = -1").orderBy("rnk").collect()
    ]
    assert set(top_lam1) == {100, 101}
    top_div = [
        r["neighbor_id"]
        for r in mmr_rerank(corpus, queries, k=2, lam=0.5, shortlist=n + 2)
        .filter("query_id = -1").orderBy("rnk").collect()
    ]
    assert len(set(top_div) & {100, 101}) == 1, top_div

    with pytest.raises(ValueError, match="shortlist"):
        mmr_rerank(corpus, queries, k=10, shortlist=5)
    with pytest.raises(ValueError, match="lam"):
        mmr_rerank(corpus, queries, k=2, lam=1.5)


def test_rrf_fuse_scores_and_outer_merge(spark):
    """rrf_fuse: exact 1/(k_rrf+rank) sums, items present in only one
    list still fuse (the union IS the outer merge), ties break on
    ascending item id, and bad args raise."""
    import pytest

    from d365fo_db_sync_spark.operators.retrieval import rrf_fuse

    a = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 12, 3)],
        "query_id long, item_id long, rnk int",
    )
    b = spark.createDataFrame(
        [(1, 11, 1), (1, 13, 2)],
        "query_id long, item_id long, rnk int",
    )
    out = {
        r["item_id"]: (r["rnk"], r["n_lists"], r["rrf_score"])
        for r in rrf_fuse([a, b], k=10, k_rrf=60).collect()
    }
    assert out[11] == (1, 2, pytest.approx(1 / 62 + 1 / 61))
    assert out[10] == (2, 1, pytest.approx(1 / 61))
    assert out[13] == (3, 1, pytest.approx(1 / 62))
    assert out[12] == (4, 1, pytest.approx(1 / 63))

    # exact tie (same single-list rank) -> ascending item id wins
    c = spark.createDataFrame(
        [(2, 7, 1)], "query_id long, item_id long, rnk int"
    )
    d = spark.createDataFrame(
        [(2, 5, 1)], "query_id long, item_id long, rnk int"
    )
    tied = [
        (r["rnk"], r["item_id"])
        for r in rrf_fuse([c, d], k=10).orderBy("rnk").collect()
    ]
    assert tied == [(1, 5), (2, 7)]

    with pytest.raises(ValueError, match="at least one"):
        rrf_fuse([])
    with pytest.raises(ValueError, match="positive"):
        rrf_fuse([a], k=0)


def test_hard_negatives_band_and_determinism(spark):
    """hard_negatives: picks live strictly inside the rank band, are
    deterministic across partitionings, and respect k_neg; bad bands
    raise."""
    import pytest

    from conftest import SF_SMOKE
    from d365fo_db_sync_spark.operators.similarity import (
        cosine_topk_bruteforce_np,
        hard_negatives,
    )
    from d365fo_db_sync_spark.sources import load_table

    emb = load_table(spark, SF_SMOKE, "embeddings")
    queries = emb.filter("vec_id % 100 = 0").selectExpr(
        "vec_id AS query_id", "embedding"
    )
    out = hard_negatives(emb, queries, k_neg=4, rank_lo=5, rank_hi=15).collect()
    ranks = cosine_topk_bruteforce_np(emb, queries, k=15).collect()
    true_rank = {(r["query_id"], r["neighbor_id"]): r["rnk"] for r in ranks}
    per_q = {}
    for r in out:
        assert 5 < r["rank"] <= 15
        # the reported rank IS the true exact cosine rank
        assert true_rank[(r["query_id"], r["neighbor_id"])] == r["rank"]
        per_q.setdefault(r["query_id"], []).append((r["pick"], r["neighbor_id"]))
    for q, picks in per_q.items():
        assert sorted(p for p, _ in picks) == [1, 2, 3, 4], (q, picks)

    again = hard_negatives(
        emb.repartition(7), queries, k_neg=4, rank_lo=5, rank_hi=15
    ).collect()
    assert {(r["query_id"], r["pick"], r["neighbor_id"]) for r in again} == {
        (r["query_id"], r["pick"], r["neighbor_id"]) for r in out
    }

    with pytest.raises(ValueError, match="rank_lo"):
        hard_negatives(emb, queries, rank_lo=10, rank_hi=10)
    with pytest.raises(ValueError, match="k_neg"):
        hard_negatives(emb, queries, k_neg=0)


def test_cosine_topk_np_empty_query_set_returns_empty(spark):
    """An upstream screen can filter every query candidate — the GEMM
    shortlist must return an empty frame with the contract schema, not
    blow up on a 0-row matrix."""
    from d365fo_db_sync_spark.operators.similarity import cosine_topk_bruteforce_np

    corpus = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])], "vec_id long, embedding array<double>"
    )
    empty_q = corpus.filter("vec_id < 0").selectExpr(
        "vec_id AS query_id", "embedding"
    )
    out = cosine_topk_bruteforce_np(corpus, empty_q, k=3)
    assert out.columns == ["query_id", "rnk", "neighbor_id", "cosine"]
    assert out.count() == 0


def test_mmr_exact_twin_matches_production_selection(spark, sf_dir):
    """r15 graduation check: the decimal-replay twin
    (similarity.mmr_rerank_exact — the value-oracled suite path) picks
    the SAME selection sequence as the production Arrow greedy
    (similarity.mmr_rerank) on the real corpus, and its scores agree
    to float tolerance (the twin scores from decimal-quantized cosine
    terms, the production from float64 GEMM — identical semantics,
    different rounding at ~1e-12)."""
    from d365fo_db_sync_spark.operators.similarity import (
        mmr_rerank,
        mmr_rerank_exact,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") % 125 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = mmr_rerank_exact(emb, queries, k=5, lam=0.7, shortlist=32)
    prod = mmr_rerank(emb, queries, k=5, lam=0.7, shortlist=32)
    got = {(r["query_id"], r["rnk"]): r for r in exact.collect()}
    want = {(r["query_id"], r["rnk"]): r for r in prod.collect()}
    assert set(got) == set(want) and got
    for key in got:
        assert got[key]["neighbor_id"] == want[key]["neighbor_id"], key
        assert got[key]["relevance"] == pytest.approx(
            want[key]["relevance"], abs=1e-9
        )
        assert got[key]["mmr_score"] == pytest.approx(
            want[key]["mmr_score"], abs=1e-9
        )
