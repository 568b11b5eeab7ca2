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


# ---------------------------------------------------------------------------
# KMV bottom-k sketches
# ---------------------------------------------------------------------------


def test_kmv_small_groups_are_exact_and_estimates_bounded(spark):
    """Groups under k slots degrade to EXACT counts; groups over k
    estimate within ~5 relative standard errors (1/sqrt(k-2)) of the
    truth — the same empirical-bounds discipline as the HLL oracle."""
    from d365fo_db_sync_spark.operators.sketches import kmv_estimate, kmv_sketch

    k = 64
    rows = [("small", f"v{i}") for i in range(40)] + [
        ("big", f"w{i % 5000}") for i in range(12000)
    ]
    df = spark.createDataFrame(rows, "g string, v string")
    sk = kmv_sketch(df, ["g"], "v", k=k)
    est = {r["g"]: r["n_distinct_est"] for r in kmv_estimate(sk, k).collect()}
    assert est["small"] == 40.0  # under k: exact by construction
    rse = 1.0 / (k - 2) ** 0.5
    assert abs(est["big"] - 5000) <= 5 * rse * 5000
    # sketch arrays are sorted, distinct and capped at k
    arr = {r["g"]: r["kmins"] for r in sk.collect()}
    assert arr["small"] == sorted(set(arr["small"])) and len(arr["small"]) == 40
    assert arr["big"] == sorted(set(arr["big"])) and len(arr["big"]) == k


def test_kmv_merge_equals_single_pass_union(spark):
    """Mergeability contract: bottom-k of a union == merge of the two
    bottom-k sketches — fold order (a+b vs b+a, batchwise vs one shot)
    must not matter."""
    from d365fo_db_sync_spark.operators.sketches import kmv_merge, kmv_sketch

    k = 32
    a = spark.createDataFrame(
        [("g", f"x{i}") for i in range(300)], "g string, v string"
    )
    b = spark.createDataFrame(
        [("g", f"x{i}") for i in range(150, 500)], "g string, v string"
    )
    both = kmv_sketch(a.union(b), ["g"], "v", k=k).collect()[0]["kmins"]
    sa = kmv_sketch(a, ["g"], "v", k=k).select(F.col("kmins").alias("ma"))
    sb = kmv_sketch(b, ["g"], "v", k=k).select(F.col("kmins").alias("mb"))
    j = sa.crossJoin(sb)
    ab = j.select(kmv_merge(F.col("ma"), F.col("mb"), k).alias("m")).collect()[0]["m"]
    ba = j.select(kmv_merge(F.col("mb"), F.col("ma"), k).alias("m")).collect()[0]["m"]
    assert ab == ba == both


def test_kmv_pairwise_overlap_tracks_exact_jaccard(spark):
    """The inclusion-ratio Jaccard estimator vs the exact Jaccard on
    controlled overlaps: disjoint pairs read ~0, a 50%-overlap pair
    reads within 5 rse, and identical sets read exactly 1."""
    from d365fo_db_sync_spark.operators.sketches import (
        kmv_pairwise_overlap,
        kmv_sketch,
    )

    k = 128
    rows = (
        [("a", f"v{i}") for i in range(2000)]
        + [("b", f"v{i}") for i in range(1000, 3000)]  # |a&b|/|aUb| = 1/3
        + [("c", f"z{i}") for i in range(2000)]  # disjoint from a and b
        + [("d", f"v{i}") for i in range(2000)]  # identical to a
    )
    df = spark.createDataFrame(rows, "g string, v string")
    sk = kmv_sketch(df, ["g"], "v", k=k)
    got = {
        (r["g_a"], r["g_b"]): r for r in kmv_pairwise_overlap(sk, "g", k).collect()
    }
    rse = 1.0 / (k - 2) ** 0.5
    ab = got[("a", "b")]
    assert abs(ab["jaccard_est"] - 1 / 3) <= 5 * rse
    assert abs(ab["union_est"] - 3000) <= 5 * rse * 3000
    assert abs(ab["inter_est"] - 1000) <= 8 * rse * 1000
    assert got[("a", "c")]["jaccard_est"] <= 2 * rse  # disjoint
    ad = got[("a", "d")]
    assert ad["jaccard_est"] == 1.0 and ad["inter_est"] == ad["union_est"]
    # symmetric key ordering: every pair appears exactly once, a < b
    assert all(p[0] < p[1] for p in got)
    assert len(got) == 6
