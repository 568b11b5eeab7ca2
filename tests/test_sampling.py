"""Deterministic sampling operators (operators/sampling.py): the
properties that make them safe for training-data pipelines —
partitioning-invariant membership, disjoint-exhaustive splits, exact
stratum quotas, and decorrelated salts."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from d365fo_db_sync_spark.operators import sampling


@pytest.fixture()
def docs(spark):
    return spark.range(0, 2000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 7).alias("src")
    )


def ids(df):
    return sorted(r["doc_id"] for r in df.select("doc_id").collect())


def test_membership_invariant_to_partitioning(spark, docs):
    a = ids(sampling.hash_sample(docs, ["doc_id"], 0.3))
    b = ids(sampling.hash_sample(docs.repartition(17, "src"), ["doc_id"], 0.3))
    c = ids(sampling.hash_sample(docs.coalesce(1), ["doc_id"], 0.3))
    assert a == b == c  # df.sample() fails exactly this
    assert 0.2 < len(a) / 2000 < 0.4


def test_fraction_bounds(spark, docs):
    assert ids(sampling.hash_sample(docs, ["doc_id"], 0.0)) == []
    assert len(ids(sampling.hash_sample(docs, ["doc_id"], 1.0))) == 2000


def test_subset_monotonicity(spark, docs):
    # a smaller fraction is a strict subset of a larger one (same keys,
    # same salt): growing a sample never unsamples anything
    small = set(ids(sampling.hash_sample(docs, ["doc_id"], 0.1)))
    big = set(ids(sampling.hash_sample(docs, ["doc_id"], 0.5)))
    assert small <= big


def test_salt_decorrelates(spark, docs):
    a = set(ids(sampling.hash_sample(docs, ["doc_id"], 0.5, salt="a")))
    b = set(ids(sampling.hash_sample(docs, ["doc_id"], 0.5, salt="b")))
    assert a != b
    overlap = len(a & b) / max(1, len(a))
    assert 0.3 < overlap < 0.7  # ~independent draws


def test_split_disjoint_exhaustive(spark, docs):
    out = sampling.train_eval_split(
        docs, ["doc_id"], {"train": 0.8, "val": 0.1, "test": 0.1}
    )
    counts = {r["split"]: r["cnt"] for r in out.groupBy("split").agg(F.count("*").alias("cnt")).collect()}
    assert None not in counts  # exhaustive: weights sum to 1.0
    assert sum(counts.values()) == 2000
    assert counts["train"] > counts["val"] and counts["train"] > counts["test"]
    # disjoint by construction: one row -> one label (split is a column,
    # not three independent samples). Check against independent samples:
    train = set(ids(out.filter(F.col("split") == "train")))
    val = set(ids(out.filter(F.col("split") == "val")))
    test = set(ids(out.filter(F.col("split") == "test")))
    assert not (train & val) and not (train & test) and not (val & test)


def test_split_heldout_when_weights_short(spark, docs):
    out = sampling.train_eval_split(docs, ["doc_id"], {"train": 0.5})
    n_null = out.filter(F.col("split").isNull()).count()
    assert 0 < n_null < 2000  # the unlisted mass is held out as NULL


def test_stratified_exact_quota(spark, docs):
    out = sampling.stratified_sample(docs, ["src"], 5, ["doc_id"])
    counts = [r["cnt"] for r in out.groupBy("src").agg(F.count("*").alias("cnt")).collect()]
    assert counts == [5] * 7
    # deterministic: same rows on a different partitioning
    again = sampling.stratified_sample(docs.repartition(13), ["src"], 5, ["doc_id"])
    assert ids(out) == ids(again)


def test_stratified_small_stratum_keeps_all(spark):
    df = spark.createDataFrame([(1, "a"), (2, "a"), (3, "b")], "doc_id long, src string")
    out = sampling.stratified_sample(df, ["src"], 5, ["doc_id"])
    assert out.count() == 3


def test_mixture_fractions_math():
    counts = {"web": 1000, "code": 100, "books": 50}
    weights = {"web": 0.5, "code": 0.3, "books": 0.2}
    fr = sampling.mixture_fractions(counts, weights)
    # books binds: T = 50/0.2 = 250 -> web 125/1000, code 75/100, books 50/50
    assert fr == {"web": 0.125, "code": 0.75, "books": 1.0}
    # zero-weight sources are excluded entirely
    fr2 = sampling.mixture_fractions(counts, {"web": 1.0, "code": 0.0})
    assert "code" not in fr2 and fr2["web"] == 1.0


def test_mixture_sample_rates_and_determinism(spark, docs):
    src = docs.withColumn("source", F.concat(F.lit("s"), F.col("src")))
    mix = {"s0": 1.0, "s1": 0.5}
    out = sampling.mixture_sample(src, "source", mix, ["doc_id"])
    counts = {
        r["source"]: r["cnt"]
        for r in out.groupBy("source").agg(F.count("*").alias("cnt")).collect()
    }
    assert set(counts) == {"s0", "s1"}  # unlisted sources dropped
    n0 = src.filter(F.col("source") == "s0").count()
    n1 = src.filter(F.col("source") == "s1").count()
    assert counts["s0"] == n0  # fraction 1.0 keeps everything
    assert 0.3 < counts["s1"] / n1 < 0.7
    again = sampling.mixture_sample(src.repartition(11), "source", mix, ["doc_id"])
    assert ids(out) == ids(again)


class TestMixtureByTokenBudget:
    def _docs(self, spark):
        rows = [(i, "a" if i < 50 else "b", (i % 7) + 1) for i in range(100)]
        return spark.createDataFrame(rows, "doc_id long, src string, toks int")

    def test_budget_met_and_admission_predicate(self, spark):
        from d365fo_db_sync_spark.operators.sampling import mixture_by_token_budget
        from pyspark.sql import functions as F

        df = self._docs(spark)
        out = mixture_by_token_budget(
            df, "src", F.col("toks"), {"a": 30, "b": 50}
        ).collect()
        by_src = {}
        for r in out:
            by_src.setdefault(r["src"], []).append(r)
        for src, budget in (("a", 30), ("b", 50)):
            rows = sorted(by_src[src], key=lambda r: r["tok_before"])
            # contiguous prefix: each row starts where the previous ended
            pos = 0
            for r in rows:
                assert r["tok_before"] == pos
                pos += r["n_tokens"]
            # budget met: total >= budget, and dropping the last row dips below
            assert pos >= budget
            assert pos - rows[-1]["n_tokens"] < budget

    def test_deterministic_across_partitionings(self, spark):
        from d365fo_db_sync_spark.operators.sampling import mixture_by_token_budget
        from pyspark.sql import functions as F

        df = self._docs(spark)
        a = {
            (r["src"], r["doc_id"])
            for r in mixture_by_token_budget(
                df.repartition(13), "src", F.col("toks"), {"a": 40}
            ).collect()
        }
        b = {
            (r["src"], r["doc_id"])
            for r in mixture_by_token_budget(
                df.coalesce(1), "src", F.col("toks"), {"a": 40}
            ).collect()
        }
        assert a == b and len(a) > 0

    def test_unlisted_groups_excluded_and_exhaustion(self, spark):
        from d365fo_db_sync_spark.operators.sampling import mixture_by_token_budget
        from pyspark.sql import functions as F

        df = self._docs(spark)
        out = mixture_by_token_budget(
            df, "src", F.col("toks"), {"a": 10_000_000}
        ).collect()
        assert {r["src"] for r in out} == {"a"}  # b unlisted -> excluded
        assert len(out) == 50  # budget beyond supply admits the whole group

    def test_empty_budgets_raise(self, spark):
        from d365fo_db_sync_spark.operators.sampling import mixture_by_token_budget
        from pyspark.sql import functions as F

        with pytest.raises(ValueError):
            mixture_by_token_budget(self._docs(spark), "src", F.col("toks"), {})


# ------------------------------------------------- temperature mixture


def test_temperature_quotas_alpha_half_is_isqrt_proportional():
    import math

    counts = {"a": 100, "b": 400, "c": 2500}
    q = sampling.temperature_quotas(counts, 600)
    mass = {s: math.isqrt(n) for s, n in counts.items()}  # 10, 20, 50
    sm = sum(mass.values())
    assert q == {s: (600 * m) // sm for s, m in mass.items()}
    assert sum(q.values()) <= 600
    # flatter than natural proportions: the small source's share grows
    assert q["a"] / 600 > counts["a"] / sum(counts.values())


def test_temperature_quotas_edge_cases():
    assert sampling.temperature_quotas({}, 100) == {}
    assert sampling.temperature_quotas({"a": 0}, 100) == {}
    assert sampling.temperature_quotas({"a": 9}, 0) == {"a": 0}
    with pytest.raises(ValueError):
        sampling.temperature_quotas({"a": 9}, -1)
    # alpha=1 keeps natural proportions (float-mass path)
    q = sampling.temperature_quotas({"a": 100, "b": 300}, 400, alpha=1.0)
    assert q == {"a": 100, "b": 300}


def test_temperature_mixture_admits_exact_quota_in_hash_order(spark, docs):
    import hashlib

    counts = {
        r["src"]: r["n"]
        for r in docs.groupBy("src").agg(F.count("*").alias("n")).collect()
    }
    quotas = sampling.temperature_quotas(
        {str(s): n for s, n in counts.items()}, 700
    )
    out = sampling.mixture_by_token_budget(
        docs.withColumn("src", F.col("src").cast("string")),
        "src",
        F.lit(1),
        quotas,
        id_col="doc_id",
    ).collect()
    by_src: dict[str, list[int]] = {}
    for r in out:
        by_src.setdefault(r["src"], []).append(r["doc_id"])
    for s, quota in quotas.items():
        n_src = counts[int(s)]
        assert len(by_src.get(s, [])) == min(quota, n_src)
        # admitted set = the quota-prefix of the source's hash order
        expected = sorted(
            (i for i in range(2000) if i % 7 == int(s)),
            key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i),
        )[:quota]
        assert sorted(by_src.get(s, [])) == sorted(expected)


class TestWeightedSample:
    """Per-row weighted admission: deterministic, monotone in weight,
    rate tracks the mean weight, degenerate weights exact."""

    def test_degenerate_weights(self, spark, docs):
        kept0 = sampling.weighted_sample(docs, ["doc_id"], F.lit(0.0))
        kept1 = sampling.weighted_sample(docs, ["doc_id"], F.lit(1.0))
        assert kept0.count() == 0
        assert kept1.count() == 2000
        # negative / >1 weights clamp to the same outcomes
        assert sampling.weighted_sample(docs, ["doc_id"], F.lit(-0.5)).count() == 0
        assert sampling.weighted_sample(docs, ["doc_id"], F.lit(2.5)).count() == 2000

    def test_constant_weight_equals_hash_sample(self, spark, docs):
        """A constant weight must admit exactly the hash_sample set —
        same hash coordinate, same threshold math."""
        w = ids(sampling.weighted_sample(docs, ["doc_id"], F.lit(0.3)))
        h = ids(sampling.hash_sample(docs, ["doc_id"], 0.3))
        assert w == h

    def test_rate_tracks_mean_weight_and_partitioning_invariance(self, spark, docs):
        w = (F.col("doc_id") % 10) / 10.0  # mean 0.45
        a = ids(sampling.weighted_sample(docs, ["doc_id"], w))
        b = ids(sampling.weighted_sample(docs.repartition(13, "src"), ["doc_id"], w))
        assert a == b
        assert 0.35 < len(a) / 2000 < 0.55

    def test_membership_monotone_in_weight(self, spark, docs):
        """Raising weights can only ADD rows — threshold sweeps yield
        nested subsets (the reproducibility property RNG sampling
        lacks)."""
        lo = set(ids(sampling.weighted_sample(docs, ["doc_id"], F.lit(0.2))))
        mid = set(ids(sampling.weighted_sample(docs, ["doc_id"], F.lit(0.5))))
        hi = set(ids(sampling.weighted_sample(docs, ["doc_id"], F.lit(0.8))))
        assert lo <= mid <= hi
        # and per-row: a varying weight admits the union of each row's
        # own constant-weight decision
        w = (F.col("doc_id") % 2) * 0.5  # 0.0 for even ids, 0.5 for odd
        mixed = set(ids(sampling.weighted_sample(docs, ["doc_id"], w)))
        assert mixed == {i for i in mid if i % 2 == 1}

    def test_salt_decorrelates(self, spark, docs):
        a = set(ids(sampling.weighted_sample(docs, ["doc_id"], F.lit(0.5), salt="x")))
        b = set(ids(sampling.weighted_sample(docs, ["doc_id"], F.lit(0.5), salt="y")))
        assert a != b
        overlap = len(a & b) / max(1, len(a))
        assert 0.3 < overlap < 0.7  # ~independent draws


class TestExactKSample:
    def test_exact_size_and_determinism(self, spark, docs):
        a = ids(sampling.exact_k_sample(docs, ["doc_id"], 100))
        b = ids(sampling.exact_k_sample(docs.repartition(9, "src"), ["doc_id"], 100))
        assert len(a) == 100 and a == b

    def test_growing_k_is_a_superset(self, spark, docs):
        small = set(ids(sampling.exact_k_sample(docs, ["doc_id"], 50)))
        big = set(ids(sampling.exact_k_sample(docs, ["doc_id"], 200)))
        assert small < big

    def test_k_larger_than_input(self, spark, docs):
        assert len(ids(sampling.exact_k_sample(docs, ["doc_id"], 99_999))) == 2000

    def test_matches_python_reference_order(self, spark, docs):
        import hashlib

        got = ids(sampling.exact_k_sample(docs, ["doc_id"], 25))
        want = sorted(
            range(2000),
            key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i),
        )[:25]
        assert got == sorted(want)

    def test_plan_is_take_ordered(self, spark, docs):
        from d365fo_db_sync_spark.plans.audit import uses

        assert uses(
            sampling.exact_k_sample(docs, ["doc_id"], 10), "TakeOrderedAndProject"
        )


def test_cluster_safe_split_co_travels(spark):
    """All members of a near-dup cluster get the SAME split label —
    the leakage-proof property per-doc hashing does not have."""
    from d365fo_db_sync_spark.operators.sampling import cluster_safe_split

    docs = spark.range(0, 40).select(F.col("id").alias("doc_id"))
    # three clusters: {0,1,2}, {10,11}, {20,21,22,23}; rest singletons
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (10, 11), (20, 21), (21, 22), (22, 23)],
        "id_a long, id_b long",
    )
    out = cluster_safe_split(docs, pairs, {"train": 0.5, "eval": 0.5})
    rows = {r["doc_id"]: (r["cluster_id"], r["split"]) for r in out.collect()}
    assert len(rows) == 40
    for members in ([0, 1, 2], [10, 11], [20, 21, 22, 23]):
        labels = {rows[m] for m in members}
        assert len(labels) == 1  # one (cluster, split) for the whole cluster
    # splits are exhaustive and deterministic across reruns
    rows2 = {
        r["doc_id"]: (r["cluster_id"], r["split"])
        for r in cluster_safe_split(
            docs, pairs, {"train": 0.5, "eval": 0.5}
        ).collect()
    }
    assert rows == rows2
    assert {s for _, s in rows.values()} <= {"train", "eval"}


def test_ordered_budget_head_matches_naive(spark):
    from d365fo_db_sync_spark.operators.sampling import ordered_budget_head

    import random

    rng = random.Random(7)
    data = [(i, rng.randint(0, 9), rng.randint(1, 50)) for i in range(200)]
    data += [(900, 5, 0)]  # zero-token row: dropped
    df = spark.createDataFrame(data, "doc_id long, q long, n long")

    out = {
        r["doc_id"]: (r["n_tokens"], r["tok_before"])
        for r in ordered_budget_head(
            df,
            order_key=-F.col("q"),
            band=F.lit(9) - F.col("q"),  # exact coarsening: one band per q
            token_count=F.col("n"),
            budget=1_000,
        ).collect()
    }
    # naive: admit in (q desc, id) order until the budget line is crossed
    run = 0
    expect = {}
    for i, q, n in sorted((r for r in data if r[2] > 0), key=lambda r: (-r[1], r[0])):
        if run < 1_000:
            expect[i] = (n, run)
        run += n
    assert out == expect
    # the crossing row is included: the last admitted tok_before < 1000
    # but its end may exceed the budget
    last = max(expect.values(), key=lambda v: v[1])
    assert last[1] < 1_000 <= last[1] + last[0] or sum(
        n for n, _ in expect.values()
    ) < 1_000


def test_ordered_budget_head_bad_budget_raises(spark):
    from d365fo_db_sync_spark.operators.sampling import ordered_budget_head

    df = spark.createDataFrame([(1, 1, 1)], "doc_id long, q long, n long")
    with pytest.raises(ValueError):
        ordered_budget_head(df, F.col("q"), F.col("q"), F.col("n"), 0)


def test_ordered_budget_head_with_coarse_bands(spark):
    """Bands that group MANY order-key values (a realistic quantile
    coarsening) must still reproduce the naive global order exactly —
    the band is a plan hint, never a semantic boundary."""
    import random

    from d365fo_db_sync_spark.operators.sampling import ordered_budget_head

    for seed in (11, 12):
        rng = random.Random(seed)
        data = [(i, rng.randint(0, 99), rng.randint(1, 30)) for i in range(300)]
        df = spark.createDataFrame(data, "doc_id long, q long, n long")
        out = {
            r["doc_id"]: (r["n_tokens"], r["tok_before"])
            for r in ordered_budget_head(
                df,
                order_key=-F.col("q"),
                band=(F.lit(99) - F.col("q")) / F.lit(25),  # 4 coarse bands
                token_count=F.col("n"),
                budget=800,
            ).collect()
        }
        run, expect = 0, {}
        for i, q, n in sorted(data, key=lambda r: (-r[1], r[0])):
            if run < 800:
                expect[i] = (n, run)
            run += n
        assert out == expect, f"seed={seed}"


def test_quantile_bands_feed_budget_head(spark):
    """approxQuantile-derived bands satisfy the monotone contract and
    leave ordered_budget_head's result identical to the naive order —
    band placement must never change semantics."""
    import random

    from d365fo_db_sync_spark.operators.sampling import (
        ordered_budget_head,
        quantile_bands,
    )

    rng = random.Random(21)
    data = [(i, rng.gauss(0, 100), rng.randint(1, 20)) for i in range(400)]
    df = spark.createDataFrame(data, "doc_id long, q double, n long")
    band = quantile_bands(df, F.col("q"), n_bands=16)
    # monotone: banding the sorted q values never decreases
    got_bands = [
        r["b"] for r in df.select(band.alias("b"), "q").orderBy("q").collect()
    ]
    assert got_bands == sorted(got_bands)
    assert len(set(got_bands)) > 4  # actually spreads across bands

    out = {
        r["doc_id"]: (r["n_tokens"], r["tok_before"])
        for r in ordered_budget_head(
            df, F.col("q"), band, F.col("n"), budget=900
        ).collect()
    }
    run, expect = 0, {}
    for i, q, n in sorted(data, key=lambda r: (r[1], r[0])):
        if run < 900:
            expect[i] = (n, run)
        run += n
    assert out == expect


def test_quantile_bands_validates(spark):
    from d365fo_db_sync_spark.operators.sampling import quantile_bands

    df = spark.createDataFrame([(1.0,)], "q double")
    with pytest.raises(ValueError):
        quantile_bands(df, F.col("q"), n_bands=1)


class TestWeightedPrioritySample:
    def _df(self, spark, rows):
        return spark.createDataFrame(rows, "id long, w double")

    def test_replays_reference_selection(self, spark):
        import hashlib
        import math

        from d365fo_db_sync_spark.operators.sampling import (
            weighted_priority_sample,
        )

        rows = [(i, float(1 + (i * 7) % 13)) for i in range(60)]
        df = self._df(spark, rows)
        got = sorted(
            r["id"]
            for r in weighted_priority_sample(
                df, ["id"], df["w"], k=10, salt="s"
            ).collect()
        )

        def pri(i, w):
            h = int(hashlib.md5(f"s\x1f{i}".encode()).hexdigest()[:8], 16)
            return math.log((h + 0.5) / 2**32) / w

        exp = sorted(
            i for i, w in sorted(rows, key=lambda r: -pri(*r))[:10]
        )
        assert got == exp

    def test_k_at_least_n_returns_all_positive_weight(self, spark):
        from d365fo_db_sync_spark.operators.sampling import (
            weighted_priority_sample,
        )

        df = self._df(spark, [(1, 2.0), (2, 0.0), (3, -1.0), (4, 0.5)])
        got = sorted(
            r["id"]
            for r in weighted_priority_sample(df, ["id"], df["w"], k=10).collect()
        )
        assert got == [1, 4]  # non-positive weights never qualify

    def test_weight_monotonicity_statistical(self, spark):
        """A 10x-weighted item should be selected far more often across
        independent salts than a 1x item — the property that makes this
        'weighted' and not just deterministic."""
        from d365fo_db_sync_spark.operators.sampling import (
            weighted_priority_sample,
        )

        rows = [(i, 10.0 if i < 10 else 1.0) for i in range(100)]
        df = self._df(spark, rows).cache()
        try:
            heavy = 0
            for salt in map(str, range(8)):
                sel = {
                    r["id"]
                    for r in weighted_priority_sample(
                        df, ["id"], df["w"], k=20, salt=salt
                    ).collect()
                }
                heavy += sum(1 for i in sel if i < 10)
            # 10 heavy items at weight 10 vs 90 at weight 1: heavy items
            # should take well over their uniform share (2 of 20) per draw
            assert heavy >= 8 * 5, heavy
        finally:
            df.unpersist()

    def test_plan_is_distributed_topk(self, spark):
        from d365fo_db_sync_spark.operators.sampling import (
            weighted_priority_sample,
        )
        from d365fo_db_sync_spark.plans.audit import physical_operators, uses

        df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        out = weighted_priority_sample(df, ["doc_id"], df["n_chars"], k=50)
        assert uses(out, "TakeOrderedAndProject"), physical_operators(out)
