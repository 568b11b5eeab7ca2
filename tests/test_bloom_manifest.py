"""Per-bucket Bloom filters on the manifest sink: point-lookup file
skipping on non-key columns, append-mode OR-merge, superset-or-absent
soundness."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from d365fo_db_sync_spark.sinks import ManifestParquetTarget


def _table(spark, n=2000):
    """user_id is rare-per-value (each appears ~4x) and uncorrelated
    with the RecId hash bucketing — the bloom's target shape."""
    return spark.range(n).select(
        F.col("id").alias("RecId"),
        (F.col("id") % 500).alias("user_id"),
        (F.col("id") % 7).cast("double").alias("amount"),
    )


def test_probe_value_skips_files_and_stays_exact(spark, tmp_path):
    t = ManifestParquetTarget(
        str(tmp_path / "t"), key="RecId", n_buckets=16, bloom_cols=["user_id"]
    )
    df = _table(spark)
    t.overwrite(df)
    got = sorted(r["RecId"] for r in t.probe_value(spark, "user_id", 123).collect())
    want = sorted(r["RecId"] for r in df.filter("user_id = 123").collect())
    assert got == want and len(got) == 4
    m = t._load_manifest()
    n_total = sum(len(fs) for fs in m["buckets"].values())
    planned = t.probe_value(spark, "user_id", 123)
    assert len(planned.inputFiles()) < n_total  # the bloom actually cut
    # an absent value: the bloom proves absence almost everywhere
    assert t.probe_value(spark, "user_id", 10**9).count() == 0
    with pytest.raises(ValueError, match="not bloom-tracked"):
        t.probe_value(spark, "amount", 1.0)


def test_append_or_merges_blooms(spark, tmp_path):
    """append_rows must fold the new rows' bits in (bloom union): a
    value introduced only by the append is still found, and prior
    values stay found."""
    t = ManifestParquetTarget(
        str(tmp_path / "t"), key="RecId", n_buckets=4, bloom_cols=["user_id"]
    )
    t.overwrite(_table(spark, n=400))
    extra = spark.createDataFrame(
        [(10_001, 99_999, 1.0), (10_002, 99_999, 2.0)],
        "RecId long, user_id long, amount double",
    )
    t.append_rows(spark, extra)
    got = sorted(
        r["RecId"] for r in t.probe_value(spark, "user_id", 99_999).collect()
    )
    assert got == [10_001, 10_002]
    assert t.probe_value(spark, "user_id", 123).count() == 1  # 400/500 -> one hit
    m = t._load_manifest()
    assert set(m["blooms"]["user_id"]) <= {str(b) for b in m["buckets"]}


def test_pre_bloom_history_scans_conservatively(spark, tmp_path):
    """A table written WITHOUT bloom tracking, then appended WITH it:
    appended-onto buckets get no entry (superset-or-absent), and the
    probe still returns exact rows by scanning them."""
    plain = ManifestParquetTarget(str(tmp_path / "t"), key="RecId", n_buckets=4)
    plain.overwrite(_table(spark, n=400))
    t = ManifestParquetTarget(
        str(tmp_path / "t"), key="RecId", n_buckets=4, bloom_cols=["user_id"]
    )
    extra = spark.createDataFrame(
        [(10_001, 77_777, 1.0)], "RecId long, user_id long, amount double"
    )
    t.append_rows(spark, extra)
    m = t._load_manifest()
    # the appended bucket inherited untracked history: no bloom entry
    assert len(m["blooms"]["user_id"]) == 0
    got = sorted(r["RecId"] for r in t.probe_value(spark, "user_id", 123).collect())
    want = [123]  # from the original table: 400 rows, user_id = id % 500
    assert got == want
    assert t.probe_value(spark, "user_id", 77_777).count() == 1


def test_bloom_geometry_change_refused(spark, tmp_path):
    t = ManifestParquetTarget(
        str(tmp_path / "t"), key="RecId", n_buckets=2,
        bloom_cols=["user_id"], bloom_bits=1 << 10,
    )
    t.overwrite(_table(spark, n=100))
    t2 = ManifestParquetTarget(
        str(tmp_path / "t"), key="RecId", n_buckets=2,
        bloom_cols=["user_id"], bloom_bits=1 << 12,
    )
    extra = spark.createDataFrame(
        [(900, 1, 0.0)], "RecId long, user_id long, amount double"
    )
    with pytest.raises(ValueError, match="geometry"):
        t2.append_rows(spark, extra)
    with pytest.raises(ValueError, match="multiple of 64"):
        ManifestParquetTarget(
            str(tmp_path / "x"), key="RecId", bloom_cols=["u"], bloom_bits=100
        )
