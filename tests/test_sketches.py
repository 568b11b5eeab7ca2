"""HLL sketch sidecar maintenance (operators/sketches.py):
mergeability, replay-idempotence, parquet persistence."""

from __future__ import annotations

from pyspark.sql import functions as F

from d365fo_db_sync_spark.operators.sketches import (
    distinct_sketch,
    estimate_sketches,
    merge_sketches,
)


def _est(spark, sidecar):
    return {
        r["g"]: r["approx_distinct"]
        for r in estimate_sketches(sidecar, ["g"]).collect()
    }


def test_merged_equals_single_pass_and_new_groups_survive(spark):
    """Union-of-sketches == sketch-of-union (exact register equality,
    so the ESTIMATES are identical), and a group present in only one
    batch survives the merge."""
    full = spark.range(2000).select(
        (F.col("id") % 2).cast("string").alias("g"), (F.col("id") % 700).alias("v")
    )
    b1 = full.filter(F.col("id") % 3 != 0)
    b2 = full.filter(F.col("id") % 3 == 0)
    merged = merge_sketches(
        distinct_sketch(b1, ["g"], "v"), distinct_sketch(b2, ["g"], "v"), ["g"]
    )
    assert _est(spark, merged) == _est(spark, distinct_sketch(full, ["g"], "v"))

    only_new = spark.createDataFrame([("z", 1), ("z", 2)], "g string, v int")
    merged2 = merge_sketches(merged, distinct_sketch(only_new, ["g"], "v"), ["g"])
    est2 = _est(spark, merged2)
    assert est2["z"] == 2 and set(est2) == {"0", "1", "z"}


def test_replay_idempotent_and_parquet_roundtrip(spark, tmp_path):
    """Re-merging the same batch does not move any estimate (HLL union
    is idempotent), including across a parquet round-trip of the
    binary sketch column."""
    df = spark.range(500).select(
        F.lit("a").alias("g"), (F.col("id") % 123).alias("v")
    )
    sk = distinct_sketch(df, ["g"], "v")
    once = merge_sketches(sk, sk, ["g"])
    path = str(tmp_path / "sidecar")
    once.write.parquet(path)
    restored = spark.read.parquet(path)
    twice = merge_sketches(restored, sk, ["g"])
    assert (
        _est(spark, sk) == _est(spark, once) == _est(spark, twice) == {"a": 123}
    )
