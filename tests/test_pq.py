"""Product-quantization ANN contracts (operators/pq.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from d365fo_db_sync_spark.operators import pq, similarity
from d365fo_db_sync_spark.sources import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF, "embeddings")


@pytest.fixture(scope="module")
def books(emb):
    return pq.pq_train(emb, m=8, k=16, sample_limit=500, iters=8)


def test_train_shapes(books):
    assert books.m == 8 and books.k == 16 and books.dim == 64
    assert len(books.centroids) == 8
    assert all(len(c) == 16 and len(c[0]) == 8 for c in books.centroids)


def test_train_gemm_matches_naive_distances(emb, books):
    """pq_train assigns with the GEMM identity ||s-c||^2 ~ -2 s.c + ||c||^2
    (the ||s||^2 row constant dropped) to avoid the O(n*k*d_sub)
    broadcast intermediate (~1.6 GB at sample_limit=100k, k=256). Pin
    that the fitted codebooks are identical to a naive full-distance
    Lloyd's reference run on the same sample and seed."""
    import numpy as np

    from d365fo_db_sync_spark.operators.pq import _normalize

    rows = emb.select("embedding").limit(500).collect()
    x = _normalize(np.array([list(r[0]) for r in rows], dtype=np.float64))
    n, dim = x.shape
    m, k, iters = 8, 16, 8
    d_sub = dim // m
    rng = np.random.default_rng(42)
    for j in range(m):
        sub = x[:, j * d_sub : (j + 1) * d_sub]
        init_idx = rng.permutation(n)[:k]
        c = sub[init_idx].copy()
        for _ in range(iters):
            d2 = ((sub[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for ci in range(k):
                mask = assign == ci
                if mask.any():
                    c[ci] = sub[mask].mean(axis=0)
        np.testing.assert_allclose(
            np.array(books.centroids[j]), c, rtol=1e-9, atol=1e-12
        )


def test_encode_codes_valid(emb, books):
    enc = pq.pq_encode(emb, books)
    rows = enc.collect()
    assert len(rows) == emb.count()
    assert all(len(r["codes"]) == 8 for r in rows)
    assert all(0 <= c < 16 for r in rows for c in r["codes"])


def test_encode_deterministic(emb, books):
    a = {r["vec_id"]: tuple(r["codes"]) for r in pq.pq_encode(emb.repartition(7), books).collect()}
    b = {r["vec_id"]: tuple(r["codes"]) for r in pq.pq_encode(emb.coalesce(1), books).collect()}
    assert a == b


def test_adc_recall_vs_exact(emb, books):
    """PQ@k recall against the exact cosine top-k: with 8×16 codes on
    64-dim data this is a coarse quantizer — the pin is that recall is
    far above chance (random top-10 of 500 would overlap ~2%) and the
    pipeline ranks by real proximity, not noise."""
    queries = emb.filter(F.pmod("vec_id", F.lit(50)) == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = similarity.cosine_topk_bruteforce(emb, queries, k=10)
    truth: dict[int, set] = {}
    for r in exact.collect():
        truth.setdefault(r["query_id"], set()).add(r["neighbor_id"])

    enc = pq.pq_encode(emb, books)
    approx = pq.pq_topk(enc, queries, books, kk=10)
    got: dict[int, set] = {}
    for r in approx.collect():
        got.setdefault(r["query_id"], set()).add(r["neighbor_id"])

    assert set(got) == set(truth)
    hits = sum(len(got[q] & truth[q]) for q in truth)
    total = sum(len(truth[q]) for q in truth)
    recall = hits / total
    assert recall >= 0.3, f"recall {recall:.2f}"


def test_adc_ranking_sane(emb, books):
    queries = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    enc = pq.pq_encode(emb, books)
    rows = pq.pq_topk(enc, queries, books, kk=5).orderBy("rnk").collect()
    assert [r["rnk"] for r in rows] == [1, 2, 3, 4, 5]
    dists = [r["adc_dist"] for r in rows]
    assert dists == sorted(dists)
    assert all(r["neighbor_id"] != 0 for r in rows)


def test_ivf_pq_rerank_composition(spark, emb, books):
    """The IVF+PQ+exact-rerank pipeline returns the exact-cosine
    contract shape and beats raw ADC recall (the rerank restores
    full-precision order among candidates)."""
    queries = emb.filter(F.pmod("vec_id", F.lit(50)) == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = similarity.cosine_topk_bruteforce(emb, queries, k=10)
    truth: dict[int, set] = {}
    for r in exact.collect():
        truth.setdefault(r["query_id"], set()).add(r["neighbor_id"])

    out = pq.ivf_pq_topk(
        emb, queries, books=books, n_lists=8, n_probes=6, kk=10, rerank_factor=4
    )
    rows = out.collect()
    got: dict[int, set] = {}
    for r in rows:
        got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    # shape contract
    per_q = {}
    for r in rows:
        per_q.setdefault(r["query_id"], []).append(r)
    for q, rs in per_q.items():
        assert sorted(x["rnk"] for x in rs) == list(range(1, len(rs) + 1))
        cosines = [x["cosine"] for x in sorted(rs, key=lambda x: x["rnk"])]
        assert cosines == sorted(cosines, reverse=True)
    # recall: with 6/8 cells probed + 4x rerank this must do at least
    # as well as coarse ADC alone did (0.31-0.40 measured)
    hits = sum(len(got[q] & truth[q]) for q in truth)
    total = sum(len(truth[q]) for q in truth)
    assert hits / total >= 0.4, f"recall {hits/total:.2f}"


@pytest.fixture(scope="module")
def det_books(emb):
    # the suite instance's shape (m=16): with the md5-order seed pick,
    # m=8's 8-dim subspaces land ~0.25 recall on this near-random
    # corpus where m=16 lands ~0.4 — the fixed-seed tradeoff
    return pq.pq_train_deterministic(emb, m=16, k=16, rounds=2)


def test_deterministic_pq_codes_valid_and_deterministic(emb, det_books):
    assert det_books.m == 16 and det_books.k == 16 and det_books.dim == 64
    enc = pq.pq_encode_exact(emb, det_books).collect()
    assert len(enc) == emb.count()
    assert all(
        len(r["codes"]) == 16 and all(0 <= c < 16 for c in r["codes"])
        for r in enc
    )
    again = pq.pq_train_deterministic(emb, m=16, k=16, rounds=2)
    assert det_books.centroids == again.centroids  # bit-identical


def test_deterministic_pq_recall(emb, det_books):
    """The oracle-replayable PQ path holds the numpy path's recall bar
    (>= 0.3 @10 on this near-random corpus; chance is ~2%) — the
    equivalence the suite's value-oracled similarity_pq_topk rests
    on."""
    queries = emb.filter(F.pmod("vec_id", F.lit(50)) == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = similarity.cosine_topk_bruteforce(emb, queries, k=10)
    truth: dict[int, set] = {}
    for r in exact.collect():
        truth.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    enc = pq.pq_encode_exact(emb, det_books)
    approx = pq.pq_topk_exact(enc, queries, det_books, kk=10)
    got: dict[int, set] = {}
    for r in approx.collect():
        got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    assert set(got) == set(truth)
    hits = sum(len(got[q] & truth[q]) for q in truth)
    recall = hits / sum(len(truth[q]) for q in truth)
    assert recall >= 0.3, f"recall {recall:.2f}"


def test_normalized_qvec_zero_vector_guard(spark):
    """A zero vector normalizes to itself (the numpy path's
    max(norm, eps) guard) instead of NaN-ing the codes."""
    df = spark.createDataFrame(
        [(0, [0.0] * 8), (1, [1.0] * 8)], "vec_id long, embedding array<float>"
    )
    rows = df.select(
        "vec_id", pq.normalized_qvec("embedding").alias("nv")
    ).collect()
    by_id = {r["vec_id"]: r["nv"] for r in rows}
    assert by_id[0] == [0.0] * 8
    import math
    assert all(not math.isnan(x) for x in by_id[1])
    assert abs(sum(x * x for x in by_id[1]) - 1.0) < 1e-9
