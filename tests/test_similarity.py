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
