"""SemDeDup (k-means-bucketed semantic dedup) contracts."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from d365fo_db_sync_spark.operators import similarity
from d365fo_db_sync_spark.sources import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF, "embeddings")


def _pair_set(df):
    return {(r["id_a"], r["id_b"]) for r in df.collect()}


def test_single_cell_equals_exact_baseline(spark, emb):
    """With a single cell every vector pairs against every other, so the
    GEMM path must reproduce the O(n^2) exact pair set (full-precision
    threshold filter on both sides)."""
    assigned = emb.withColumn("cell", F.lit(0))
    got = _pair_set(similarity.cosine_pairs_kmeans(assigned, threshold=0.4))
    # exact baseline at full precision (cosine_pairs_exact rounds to
    # 6 dp before filtering; 0.4 is far from any 6 dp boundary here)
    want = _pair_set(similarity.cosine_pairs_exact(emb, threshold=0.4))
    assert got == want
    assert len(got) > 0


def test_multi_cell_pairs_are_subset_and_above_threshold(spark, emb):
    assigned, _ = similarity.ivf_index(emb, n_lists=8)
    pairs = similarity.cosine_pairs_kmeans(assigned, threshold=0.4)
    rows = pairs.collect()
    assert all(r["cosine"] >= 0.4 for r in rows)
    assert all(r["id_a"] < r["id_b"] for r in rows)
    # bucketing only drops cross-cell pairs, never invents pairs
    exact = _pair_set(similarity.cosine_pairs_exact(emb, threshold=0.4))
    assert {(r["id_a"], r["id_b"]) for r in rows} <= exact


def test_kmeans_recall_reasonable(spark, emb):
    """Similar vectors sit near the same centroid: recall vs the exact
    pair set stays material with real bucketing. (This corpus' planted
    neighbors top out at cosine ~0.51 — weak similarity, the hard case
    for bucketing; production SemDeDup thresholds of 0.95+ cluster far
    more reliably. Seed is fixed, so the ratio is deterministic.)"""
    assigned, _ = similarity.ivf_index(emb, n_lists=8)
    got = _pair_set(similarity.cosine_pairs_kmeans(assigned, threshold=0.45))
    exact = _pair_set(similarity.cosine_pairs_exact(emb, threshold=0.45))
    assert len(exact) > 0
    assert len(got) / len(exact) >= 0.5


def test_semantic_dedup_survivors(spark, emb):
    res = similarity.semantic_dedup(emb, threshold=0.4, n_lists=4)
    rows = res.collect()
    assert len(rows) == emb.count()  # full corpus labeled
    by_cluster: dict[int, list] = {}
    for r in rows:
        by_cluster.setdefault(r["cluster_id"], []).append(r)
    for cid, members in by_cluster.items():
        survivors = [m for m in members if m["is_survivor"]]
        assert len(survivors) == 1
        assert survivors[0]["vec_id"] == min(m["vec_id"] for m in members)
        assert cid == min(m["vec_id"] for m in members)


def test_semantic_dedup_idempotent_on_survivors(spark, emb):
    """Deduplicating the surviving set again removes (almost) nothing:
    survivors of distinct clusters are below-threshold by construction
    within cells; allow the rare cross-cell residual pair."""
    res = similarity.semantic_dedup(emb, threshold=0.4, n_lists=4)
    survivors = emb.join(
        res.filter("is_survivor").select("vec_id"), on="vec_id"
    )
    res2 = similarity.semantic_dedup(survivors, threshold=0.4, n_lists=4)
    n = survivors.count()
    n2 = res2.filter("is_survivor").count()
    assert n2 >= n * 0.95
