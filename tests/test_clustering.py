"""Deterministic fixed-round k-means (operators/clustering.py):
Lloyd's-contract properties (WCSS monotonically improves, assignment
partitions the corpus), determinism across invocations, quality pinned
against MLlib's KMeans on the same data, and the deterministic IVF
path's recall against brute force — the equivalence the r12 verdict
asked for when graduating the ANN tier's clustering primitive from
rows-only to value-oracled."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from d365fo_db_sync_spark.operators import clustering, similarity


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _clustered_frame(spark, n=200, dim=4):
    protos = [
        [1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0],
        [0.0, 0.0, 1.0, 0.0], [0.0, 0.0, 0.0, 1.0],
    ]
    rows = []
    for i in range(n):
        p = protos[i % 4]
        jitter = [0.15 * math.sin(i * 1.7 + d) for d in range(dim)]
        rows.append((i, [p[d] + jitter[d] for d in range(dim)]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_assignment_partitions_corpus(spark, emb):
    centers = clustering.kmeans_fit(emb, k=8, rounds=2)
    assigned = clustering.kmeans_assign(emb, centers, dist_col="d")
    n = emb.count()
    assert assigned.count() == n
    cells = assigned.agg(
        F.min("cell"), F.max("cell"), F.countDistinct("cell"), F.min("d")
    ).collect()[0]
    assert cells[0] >= 0 and cells[1] < 8
    assert cells[2] >= 2  # the corpus actually spreads over cells
    assert cells[3] >= 0.0  # squared distances are non-negative


def test_wcss_improves_with_rounds(spark, emb):
    """More Lloyd rounds never hurt WCSS measured against each fit's
    own centroids — the monotone-improvement contract that makes a
    fixed-round unroll a faithful Lloyd's."""
    seed = clustering.kmeans_seed_centers(emb, k=8)
    w0 = clustering.wcss(emb, seed)
    w1 = clustering.wcss(emb, clustering.kmeans_fit(emb, k=8, rounds=1))
    w2 = clustering.wcss(emb, clustering.kmeans_fit(emb, k=8, rounds=2))
    assert w1 <= w0 + 1e-9
    assert w2 <= w1 + 1e-9


def test_fit_is_deterministic(spark, emb):
    a = clustering.kmeans_fit(emb, k=4, rounds=2)
    b = clustering.kmeans_fit(emb, k=4, rounds=2)
    assert a == b  # bit-identical, not approximately equal


def test_quality_vs_mllib(spark, emb):
    """The md5-seeded fixed-round fit lands in the same quality regime
    as MLlib's k-means++ (which it replaces on the oracled path): WCSS
    within 1.5x on the real embeddings corpus."""
    ours = clustering.wcss(emb, clustering.kmeans_fit(emb, k=8, rounds=2))

    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    v = emb.withColumn(
        "_fv", array_to_vector(F.col("embedding").cast("array<double>"))
    )
    model = KMeans(k=8, seed=42, featuresCol="_fv").fit(v.select("_fv"))
    mllib_centers = [list(map(float, c)) for c in model.clusterCenters()]
    theirs = clustering.wcss(emb, mllib_centers)
    assert ours <= theirs * 1.5


def test_empty_cell_keeps_previous_centroid(spark):
    """k larger than the number of distinct points: the surplus cells
    must coalesce to their seed centroid instead of NaN-ing out."""
    rows = [(i, [float(i % 2), 0.0]) for i in range(10)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    centers = clustering.kmeans_fit(df, k=4, rounds=2)
    assert len(centers) == 4
    assert all(all(not math.isnan(x) for x in c) for c in centers)


def test_deterministic_ivf_recall(spark):
    """ivf_index_deterministic + exact probes recovers >= 0.9 of the
    brute-force neighbors on clusterable data — the same bar the MLlib
    path is held to (test_ivf_topk_recall_on_clustered_data)."""
    emb = _clustered_frame(spark)
    queries = emb.filter(F.col("vec_id") % 40 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = similarity.cosine_topk_bruteforce(emb, queries, k=5)
    assigned, centers = similarity.ivf_index_deterministic(
        emb, n_lists=4, rounds=2
    )
    probes = clustering.probe_cells_exact(queries, centers, n_probes=2)
    approx = similarity.ivf_topk(
        assigned, centers, queries, k=5, n_probes=2, probes=probes
    )

    def pairs(df):
        return {(r["query_id"], r["neighbor_id"]) for r in df.collect()}

    e, a = pairs(exact), pairs(approx)
    assert len(a & e) / len(e) >= 0.9


def test_sampled_fit_deterministic_and_seed_invariant(spark, emb):
    """sample_n fits on the md5-order slice: deterministic across
    invocations, seeds unchanged (the sample is a superset of the k
    seeds — first-k of the same order), degenerates to the full fit
    when the sample covers the corpus."""
    a = clustering.kmeans_fit(emb, k=8, rounds=2, sample_n=200)
    b = clustering.kmeans_fit(emb, k=8, rounds=2, sample_n=200)
    assert a == b
    n = emb.count()
    full = clustering.kmeans_fit(emb, k=8, rounds=2)
    covering = clustering.kmeans_fit(emb, k=8, rounds=2, sample_n=n)
    assert covering == full
    with pytest.raises(ValueError):
        clustering.kmeans_fit(emb, k=8, rounds=2, sample_n=4)


def test_sampled_fit_wcss_within_bound_of_full_fit(spark, emb):
    """The 256-vector sampled fit (the suite's _KM_SAMPLE) stays in the
    full fit's quality regime: WCSS within 1.3x on the real corpus —
    the bound that justifies always-sample at 100 TB."""
    full = clustering.kmeans_fit(emb, k=8, rounds=2)
    sampled = clustering.kmeans_fit(emb, k=8, rounds=2, sample_n=256)
    assert clustering.wcss(emb, sampled) <= clustering.wcss(emb, full) * 1.3


def test_assign_cells_matches_kmeans_assign(spark, emb):
    """The slim codegen assignment and the join-back wrapper agree
    row-for-row (same cells, same exact distances)."""
    centers = clustering.kmeans_fit(emb, k=8, rounds=2, sample_n=256)
    slim = {
        (r["vec_id"], r["cell"], r["d"])
        for r in clustering.assign_cells(emb, centers, dist_col="d").collect()
    }
    wide = {
        (r["vec_id"], r["cell"], r["d"])
        for r in clustering.kmeans_assign(emb, centers, dist_col="d")
        .select("vec_id", "cell", "d")
        .collect()
    }
    assert slim == wide and len(slim) == emb.count()


def test_probe_cells_exact_matches_double_probes(spark, emb):
    """The decimal-exact probe selection agrees with the production
    double-fold probe selection on the real corpus (both pick the same
    nearest cells when distances are not pathologically tied)."""
    centers = clustering.kmeans_fit(emb, k=8, rounds=2)
    queries = emb.filter(F.col("vec_id") % 25 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = {
        (r["query_id"], r["cell"])
        for r in clustering.probe_cells_exact(queries, centers, 3).collect()
    }
    prod = {
        (r["query_id"], r["cell"])
        for r in similarity._probe_cells(queries, centers, 3).collect()
    }
    assert exact == prod


def test_wcss_threads_custom_id_col(spark):
    """wcss on a frame WITHOUT a vec_id column (r14 regression: the
    assign_cells route hardcoded id_col and broke such frames)."""
    df = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [1.0, 1.0]), (3, [4.0, 4.0])],
        "doc_id long, emb array<double>",
    )
    centers = [[0.0, 0.0], [4.0, 4.0]]
    w = clustering.wcss(df, centers, vec_col="emb", id_col="doc_id")
    assert w == pytest.approx(2.0)  # (1,1) -> (0,0) contributes 1+1
