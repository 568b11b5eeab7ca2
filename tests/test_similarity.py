"""similarity.label_centroids: exact per-(label, dimension) means."""

from __future__ import annotations

from d365fo_db_sync_spark.operators.similarity import label_centroids


def test_label_centroids_exact(spark):
    """Centroid components equal the plain-Python mean of the
    double-exact float components, per (label, pos)."""
    rows = [
        (0, [1.0, 2.0, 4.0]),
        (0, [3.0, 2.0, 0.0]),
        (1, [0.5, -1.25, 8.0]),
        (1, [0.25, 1.25, -8.0]),
        (1, [0.25, 0.0, 3.0]),
    ]
    df = spark.createDataFrame(rows, "label int, embedding array<float>")
    got = {
        (r["label"], r["pos"]): (r["n"], r["mean_comp"])
        for r in label_centroids(df.repartition(3)).collect()
    }
    by_label = {0: rows[:2], 1: rows[2:]}
    for (lab, pos), (n, mean) in got.items():
        vals = [v[1][pos] for v in by_label[lab]]
        assert n == len(vals)
        assert mean == round(sum(vals) / len(vals), 6), (lab, pos)
    assert len(got) == 6


def test_prototype_confusion_separable_and_crossover(spark):
    """Well-separated clusters land on the diagonal; a mislabeled
    point sitting in the other cluster shows up off-diagonal."""
    from d365fo_db_sync_spark.operators.similarity import prototype_confusion

    rows = [
        (1, 0, [0.0, 0.0]), (2, 0, [0.2, 0.0]), (3, 0, [0.0, 0.2]),
        (4, 1, [10.0, 10.0]), (5, 1, [10.2, 10.0]),
        (6, 1, [0.1, 0.1]),  # labeled 1, sits in cluster 0
    ]
    df = spark.createDataFrame(rows, "vec_id long, label int, embedding array<float>")
    got = {
        (r["label"], r["assigned_label"]): r["cnt"]
        for r in prototype_confusion(df.repartition(3)).collect()
    }
    # centroid 1 is dragged toward the origin by vec 6, but stays far
    # from cluster 0; vec 6 itself is nearest centroid 0
    assert got == {(0, 0): 3, (1, 1): 2, (1, 0): 1}


def test_centroid_silhouette_values_and_single_label_refusal(spark):
    """Two tight, well-separated clusters score near +1; a corpus
    with a single distinct label is refused (b is NULL everywhere —
    silhouette undefined, and counting those rows in n_vectors while
    dropping them from sum_sil would deflate the caller-side mean)."""
    import pytest

    from d365fo_db_sync_spark.operators.similarity import centroid_silhouette

    rows = [
        (1, 0, [0.0, 0.0]), (2, 0, [0.2, 0.0]),
        (3, 1, [10.0, 10.0]), (4, 1, [10.0, 10.2]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, label int, embedding array<float>")
    cached_before = spark.sparkContext._jsc.getPersistentRDDs().size()
    got = {r["label"]: r for r in centroid_silhouette(df).collect()}
    for lab in (0, 1):
        assert got[lab]["n_vectors"] == 2
        # mean silhouette close to 1 for tight separated clusters
        assert got[lab]["sum_sil"] / got[lab]["n_vectors"] > 0.99

    one = df.filter("label = 0")
    with pytest.raises(ValueError, match="2 distinct labels"):
        centroid_silhouette(one)

    # no cached-RDD leak: the r9 shape persisted the centroid frame
    # for the label-count guard and never unpersisted on success
    assert spark.sparkContext._jsc.getPersistentRDDs().size() == cached_before
