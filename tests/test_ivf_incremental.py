"""Incremental IVF on the manifest sink (operators/similarity.py):
O(batch) vector appends by reference, exact file-list probe reads."""

from __future__ import annotations

import os

import numpy as np

from d365fo_db_sync_spark.operators.similarity import (
    cosine_topk_bruteforce,
    ivf_append_incremental,
    ivf_index,
    ivf_topk,
    ivf_topk_incremental,
    ivf_write_incremental,
)


def _vecs(spark, n, d=16, seed=5, id_start=0):
    rng = np.random.RandomState(seed)
    x = rng.randn(n, d)
    return spark.createDataFrame(
        [(id_start + i, row.tolist()) for i, row in enumerate(x)],
        "vec_id long, embedding array<double>",
    )


def _queries(df):
    from pyspark.sql import functions as F

    return df.filter(F.pmod("vec_id", F.lit(37)) == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )


def test_matches_hive_ivf_path(spark, tmp_path):
    """Same model, same probes: the manifest-backed index must return
    exactly what the in-memory ivf_topk returns."""
    base = _vecs(spark, 300)
    assigned, model = ivf_index(base, n_lists=8)
    root = str(tmp_path / "ivf")
    ivf_write_incremental(assigned, model, root)
    q = _queries(base)
    want = {
        (r["query_id"], r["rnk"]): r["neighbor_id"]
        for r in ivf_topk(assigned, model, q, k=5, n_probes=3).collect()
    }
    got = {
        (r["query_id"], r["rnk"]): r["neighbor_id"]
        for r in ivf_topk_incremental(spark, root, q, k=5, n_probes=3).collect()
    }
    assert got == want and len(got) > 0


def test_append_is_by_reference_and_retrievable(spark, tmp_path):
    from d365fo_db_sync_spark.sinks import ManifestParquetTarget

    base = _vecs(spark, 300)
    assigned, model = ivf_index(base, n_lists=8)
    root = str(tmp_path / "ivf")
    ivf_write_incremental(assigned, model, root)

    t = ManifestParquetTarget(os.path.join(root, "vectors"), key="cell", n_buckets=16)
    before = t._load_manifest()
    base_files = {f for fs in before["buckets"].values() for f in fs}
    mtimes = {f: os.stat(f).st_mtime_ns for f in base_files}

    new = _vecs(spark, 40, seed=99, id_start=10_000)
    n = ivf_append_incremental(spark, root, new)
    assert n == 40

    # O(batch): every base file survives BY REFERENCE, byte-untouched
    after = t._load_manifest()
    after_files = {f for fs in after["buckets"].values() for f in fs}
    assert base_files <= after_files
    for f in base_files:
        assert os.stat(f).st_mtime_ns == mtimes[f]

    # an appended vector queried against the index finds ITSELF excluded
    # but its nearest base neighbors present; and querying with a base
    # vector can now surface appended neighbors
    q_new = new.limit(3).selectExpr("vec_id AS query_id", "embedding")
    res = ivf_topk_incremental(spark, root, q_new, k=3, n_probes=8).collect()
    assert len(res) > 0
    # full-probe search over the appended index == brute force over the
    # union corpus (exact recall at n_probes = n_lists)
    union = base.unionByName(new)
    got = {
        (r["query_id"], r["rnk"]): r["neighbor_id"]
        for r in ivf_topk_incremental(
            spark, root, q_new, k=3, n_probes=8
        ).collect()
    }
    want = {
        (r["query_id"], r["rnk"]): r["neighbor_id"]
        for r in cosine_topk_bruteforce(union, q_new, k=3).collect()
    }
    assert got == want


def test_probe_reads_only_probed_buckets(spark, tmp_path):
    """The probe read plans from the manifest's file list for the
    probed cells' buckets only — fewer scan files than the full index
    (the disk-level inverted-file contract)."""
    from pyspark.sql import functions as F

    base = _vecs(spark, 400)
    assigned, model = ivf_index(base, n_lists=8)
    root = str(tmp_path / "ivf")
    ivf_write_incremental(assigned, model, root)
    from d365fo_db_sync_spark.sinks import ManifestParquetTarget

    t = ManifestParquetTarget(os.path.join(root, "vectors"), key="cell", n_buckets=16)
    m = t._load_manifest()
    all_files = {f for fs in m["buckets"].values() for f in fs}
    one_cell = spark.createDataFrame([(0,)], "cell int")
    probed = t.probe(spark, one_cell)
    # inputFiles returns file: URIs; compare on basenames
    scan = {os.path.basename(f) for f in probed.inputFiles()}
    full = {os.path.basename(f) for f in all_files}
    assert scan <= full
    assert 0 < len(scan) < len(full)
    # and cell 0's rows are all present in the probed read
    assert probed.filter("cell = 0").count() == assigned.filter("cell = 0").count()


def test_nondefault_bucket_count_persists_in_meta(spark, tmp_path):
    """A writer's n_buckets is recorded in _ivf_meta.json; appenders
    and probes that omit the parameter recover it instead of hashing
    cell->bucket with a different modulus and pruning wrong buckets."""
    base = _vecs(spark, 200)
    assigned, model = ivf_index(base, n_lists=8)
    root = str(tmp_path / "ivf")
    ivf_write_incremental(assigned, model, root, n_buckets=100)  # non-default

    new = _vecs(spark, 20, seed=77, id_start=5_000)
    assert ivf_append_incremental(spark, root, new) == 20  # no n_buckets arg

    q = new.limit(2).selectExpr("vec_id AS query_id", "embedding")
    got = {
        (r["query_id"], r["rnk"]): r["neighbor_id"]
        for r in ivf_topk_incremental(spark, root, q, k=3, n_probes=8).collect()
    }
    union = base.unionByName(new)
    want = {
        (r["query_id"], r["rnk"]): r["neighbor_id"]
        for r in cosine_topk_bruteforce(union, q, k=3).collect()
    }
    assert got == want and len(got) == 6
