"""operators/retrieval.ranking_metrics semantics against hand-computed
values: perfect ranking scores NDCG 1, inversions discount it, absent
relevance zeroes RR and NULLs NDCG, recall/precision count exactly."""

from __future__ import annotations

import math

import pytest

from d365fo_db_sync_spark.operators.retrieval import ranking_metrics


@pytest.fixture(scope="module")
def frames(spark):
    # q1: perfect ranking (rel 2 then rel 1); q2: reversed; q3: no
    # relevant docs in qrels at all
    results = spark.createDataFrame(
        [
            (1, 10, 1), (1, 11, 2), (1, 12, 3),
            (2, 20, 1), (2, 21, 2), (2, 22, 3),
            (3, 30, 1), (3, 31, 2),
        ],
        "query_id long, doc_id long, rnk int",
    )
    qrels = spark.createDataFrame(
        [(1, 10, 2), (1, 11, 1), (2, 22, 2), (2, 21, 1)],
        "query_id long, doc_id long, rel int",
    )
    return results, qrels


def test_ranking_metrics_values(spark, frames):
    results, qrels = frames
    got = {
        r["query_id"]: r
        for r in ranking_metrics(results, qrels, k=3).collect()
    }

    def dcg(pairs):  # (rank, rel)
        return sum((2**rel - 1) / math.log2(rk + 1) for rk, rel in pairs)

    # q1: hits 2/2, first rel at rank 1, ideal ordering == actual
    r1 = got[1]
    assert r1["n_rel"] == 2 and r1["hits_at_k"] == 2
    assert r1["recall_at_k"] == 1.0
    assert r1["precision_at_k"] == pytest.approx(2 / 3)
    assert r1["rr"] == 1.0
    assert r1["dcg_at_k"] == pytest.approx(dcg([(1, 2), (2, 1)]), abs=1e-9)
    assert r1["ndcg_at_k"] == pytest.approx(1.0, abs=1e-9)
    # AP: relevant at ranks 1,2 -> (1/1 + 2/2) / min(2, 3) = 1
    assert r1["ap_at_k"] == pytest.approx(1.0, abs=1e-9)

    # q2: the graded docs rank WORST-first -> NDCG < 1, rr = 1/2
    r2 = got[2]
    assert r2["hits_at_k"] == 2 and r2["rr"] == 0.5
    assert r2["dcg_at_k"] == pytest.approx(dcg([(2, 1), (3, 2)]), abs=1e-9)
    assert r2["idcg_at_k"] == pytest.approx(dcg([(1, 2), (2, 1)]), abs=1e-9)
    assert 0 < r2["ndcg_at_k"] < 1
    # AP: relevant at ranks 2,3 -> (1/2 + 2/3) / min(2, 3)
    assert r2["ap_at_k"] == pytest.approx((0.5 + 2 / 3) / 2, abs=1e-9)

    # q3: nothing labeled -> rr 0, recall/AP/NDCG NULL, dcg 0
    r3 = got[3]
    assert r3["n_rel"] == 0 and r3["hits_at_k"] == 0
    assert r3["rr"] == 0.0
    assert r3["recall_at_k"] is None and r3["ndcg_at_k"] is None
    assert r3["ap_at_k"] is None
    assert r3["dcg_at_k"] == 0.0


def test_ranking_metrics_missing_query_scores_zero(spark, frames):
    # a query present in qrels but ABSENT from the run (retriever
    # returned zero rows) must still appear, scoring 0 — not vanish
    # and skew MRR / mean recall optimistic
    results, qrels = frames
    qrels_plus = qrels.union(
        spark.createDataFrame(
            [(9, 90, 2), (9, 91, 1)], "query_id long, doc_id long, rel int"
        )
    )
    got = {
        r["query_id"]: r
        for r in ranking_metrics(results, qrels_plus, k=3).collect()
    }
    assert set(got) == {1, 2, 3, 9}
    r9 = got[9]
    assert r9["n_rel"] == 2 and r9["hits_at_k"] == 0
    assert r9["recall_at_k"] == 0.0 and r9["precision_at_k"] == 0.0
    assert r9["rr"] == 0.0 and r9["dcg_at_k"] == 0.0
    assert r9["ap_at_k"] == 0.0  # labeled but no hits: 0, not NULL
    assert r9["idcg_at_k"] > 0 and r9["ndcg_at_k"] == 0.0


def test_ranking_metrics_k_slices(spark, frames):
    results, qrels = frames
    got = {
        r["query_id"]: r
        for r in ranking_metrics(results, qrels, k=1).collect()
    }
    # at k=1 only the top hit counts; q2's rank-1 doc is unlabeled
    assert got[1]["hits_at_k"] == 1 and got[1]["recall_at_k"] == 0.5
    assert got[2]["hits_at_k"] == 0 and got[2]["rr"] == 0.0
    # ideal@1 for q1 is the rel-2 doc alone
    assert got[1]["ndcg_at_k"] == pytest.approx(1.0, abs=1e-9)
