"""HLL sketch sidecar maintenance (operators/sketches.py):
mergeability, replay-idempotence, parquet persistence."""

from __future__ import annotations

import pytest
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


class TestFrequentItems:
    def test_equals_exact_groupby_on_skewed_stream(self, spark):
        import random

        from d365fo_db_sync_spark.operators.sketches import frequent_items

        rng = random.Random(7)
        rows = []
        for _ in range(30000):
            r = rng.random()
            if r < 0.25:
                rows.append(("hot-a",))
            elif r < 0.4:
                rows.append(("hot-b",))
            elif r < 0.45:
                rows.append(("warm",))
            else:
                rows.append((f"u{rng.randrange(8000)}",))
        df = spark.createDataFrame(rows, "k string").repartition(16)
        got = {
            r["k"]: r["count"]
            for r in frequent_items(df, ["k"], min_fraction=0.04).collect()
        }
        from collections import Counter

        c = Counter(r[0] for r in rows)
        exact = {k: v for k, v in c.items() if v >= 0.04 * len(rows)}
        assert got == exact

    def test_threshold_boundary_item_is_kept(self, spark):
        """count == min_fraction * n exactly — the case the +1 in the
        capacity floor exists for."""
        from d365fo_db_sync_spark.operators.sketches import frequent_items

        # 100 rows; 'edge' appears exactly 10 = 0.1 * 100 times
        rows = [("edge",)] * 10 + [(f"x{i}",) for i in range(90)]
        df = spark.createDataFrame(rows, "k string").repartition(7)
        got = {r["k"]: r["count"] for r in frequent_items(df, ["k"], 0.1).collect()}
        assert got == {"edge": 10}

    def test_multi_column_keys_and_fraction(self, spark):
        from d365fo_db_sync_spark.operators.sketches import frequent_items

        rows = [("a", 1)] * 6 + [("a", 2)] * 3 + [("b", 1)] * 1
        df = spark.createDataFrame(rows, "k string, g int")
        out = {
            (r["k"], r["g"]): (r["count"], r["fraction"])
            for r in frequent_items(df, ["k", "g"], 0.3).collect()
        }
        assert out == {("a", 1): (6, 0.6), ("a", 2): (3, 0.3)}

    def test_capacity_floor_enforced(self, spark):
        from d365fo_db_sync_spark.operators.sketches import frequent_items

        df = spark.createDataFrame([("a",)], "k string")
        with pytest.raises(ValueError, match="no-miss guarantee"):
            frequent_items(df, ["k"], 0.1, capacity=5)
        with pytest.raises(ValueError, match="min_fraction"):
            frequent_items(df, ["k"], 0.0)
        with pytest.raises(ValueError, match="at least one column"):
            frequent_items(df, [], 0.1)

    def test_no_exchange_before_candidate_filter(self, spark):
        """The raw key space must not shuffle: the only exchanges in
        the plan sit AFTER the semi join (exact recount of survivors)
        and in the 1-row total — phase 1 is mapInPandas over the scan
        partitions."""
        from d365fo_db_sync_spark.operators.sketches import frequent_items
        from d365fo_db_sync_spark.plans.audit import explain_formatted

        ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        plan = explain_formatted(frequent_items(ev, ["user_id"], 0.01))
        # the candidate branch: scan -> mapInPandas, no exchange between
        before_join = plan.split("Join")[0]
        assert "MapInPandas" in plan
        assert "BroadcastExchange" in plan  # candidates + total broadcast
        # the raw-key-space invariant itself: nothing hash-partitions
        # ahead of the semi join (a shuffle there would be the naive
        # groupBy plan this operator exists to avoid)
        assert "Exchange hashpartitioning" not in before_join, before_join

    def test_candidate_set_bounded_regardless_of_partitions(self, spark):
        """The 100x guard: with many partitions and a near-unique key
        space, the merged candidate set must stay ~1/phi^2-bounded
        (the old union-of-partition-candidates bound was
        partitions x capacity — unbroadcastable at cluster scale)."""
        import math
        import random

        from d365fo_db_sync_spark.operators.sketches import _mg_candidates

        rng = random.Random(3)
        rows = [("hot",) if rng.random() < 0.2 else (f"u{rng.randrange(20000)}",)
                for _ in range(40000)]
        df = spark.createDataFrame(rows, "k string").repartition(32)
        phi = 0.05
        cap = math.ceil(1 / phi) + 1
        total = df.agg(F.count("*").alias("__n"))
        cands = [
            r["k"] for r in _mg_candidates(df, ["k"], phi, cap, total).collect()
        ]
        bound = (1 + phi) / phi**2 + 2
        assert len(cands) <= bound, len(cands)
        assert "hot" in cands  # the true heavy hitter always survives


class TestCountMin:
    def test_never_undercounts_and_bounds(self, spark):
        """The CM guarantee on a collision-heavy sketch (tiny width):
        every estimate >= its exact count, and the min-over-depths
        keeps the overcount within the 2n/width analysis bound for
        every probed key (deterministic hashes -> a fixed corpus gives
        fixed collisions, so this pin is stable)."""
        import random

        from pyspark.sql import functions as F

        from d365fo_db_sync_spark.operators.sketches import cms_estimate, cms_sketch

        rng = random.Random(7)
        rows = [(f"k{rng.randrange(200)}",) for _ in range(4000)]
        df = spark.createDataFrame(rows, "v string").repartition(5)
        n = len(rows)
        depth, width = 4, 64
        sk = cms_sketch(df, "v", depth=depth, width=width)
        keys = df.select("v").distinct()
        est = {r["v"]: r["est"] for r in cms_estimate(sk, keys, "v", depth, width).collect()}
        exact = {
            r["v"]: r["c"]
            for r in df.groupBy("v").agg(F.count("*").alias("c")).collect()
        }
        assert set(est) == set(exact)
        assert all(est[k] >= exact[k] for k in exact)
        # analysis bound, with room: overwhelmingly likely at depth 4
        assert all(est[k] - exact[k] <= 2 * n / width for k in exact)

    def test_exact_when_no_collisions(self, spark):
        from pyspark.sql import functions as F

        from d365fo_db_sync_spark.operators.sketches import cms_estimate, cms_sketch

        rows = [("a",)] * 5 + [("b",)] * 3 + [("c",)] * 1 + [(None,)] * 2
        df = spark.createDataFrame(rows, "v string")
        sk = cms_sketch(df, "v", depth=4, width=4096)
        est = {
            r["v"]: r["est"]
            for r in cms_estimate(sk, df.select("v"), "v", 4, 4096).collect()
        }
        assert est == {"a": 5, "b": 3, "c": 1}  # NULLs excluded everywhere
        # an unseen key estimates 0 (all its buckets empty at this width)
        probe = spark.createDataFrame([("zzz-unseen",)], "v string")
        got = cms_estimate(sk, probe, "v", 4, 4096).collect()[0]["est"]
        assert got == 0

    def test_merge_equals_single_pass(self, spark):
        """Mergeability: counter sums of two halves == the one-pass
        sketch of the whole, row for row (deterministic hashes)."""
        from d365fo_db_sync_spark.operators.sketches import cms_merge, cms_sketch

        rows = [(f"k{i % 37}",) for i in range(1000)]
        df = spark.createDataFrame(rows, "v string")
        half1 = spark.createDataFrame(rows[:500], "v string")
        half2 = spark.createDataFrame(rows[500:], "v string")
        merged = cms_merge(
            cms_sketch(half1, "v", 3, 32), cms_sketch(half2, "v", 3, 32)
        )
        whole = cms_sketch(df, "v", 3, 32)
        assert sorted(map(tuple, merged.collect())) == sorted(
            map(tuple, whole.collect())
        )

    def test_validation(self, spark):
        import pytest

        from d365fo_db_sync_spark.operators.sketches import cms_sketch

        df = spark.createDataFrame([("a",)], "v string")
        with pytest.raises(ValueError, match="depth"):
            cms_sketch(df, "v", depth=0)
        with pytest.raises(ValueError, match="width"):
            cms_sketch(df, "v", width=4)
