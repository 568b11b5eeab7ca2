"""Privacy transforms: pseudonym determinism/joinability, NULL
handling, k-anonymity audit exactness, validation."""

from __future__ import annotations

import hashlib

import pytest

from d365fo_db_sync_spark.operators.privacy import (
    k_anonymity_audit,
    pseudonymize,
)


def test_pseudonyms_match_reference_and_preserve_joins(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (1, "c"), (None, "d")],
        "user_id int, tag string",
    )
    out = {
        (r["tag"]): r["user_id"]
        for r in pseudonymize(df, ["user_id"], salt="s3cret").collect()
    }

    def ref(v):
        return hashlib.md5(f"s3cret\x00{v}".encode()).hexdigest()

    assert out["a"] == ref(1)  # full 128-bit digest by default
    assert out["b"] == ref(2)
    assert out["c"] == out["a"]  # same value -> same pseudonym (joinable)
    assert out["d"] is None  # NULL carries no identity; stays NULL
    assert out["a"] != out["b"]


def test_pseudonym_delimiter_separates_salt_from_value(spark):
    """(salt='ab', v='c') must NOT collide with (salt='a', v='bc') —
    the undelimited concatenation did (the pre-fix construction)."""
    df = spark.createDataFrame([("c",)], "x string")
    df2 = spark.createDataFrame([("bc",)], "x string")
    a = pseudonymize(df, ["x"], salt="ab").collect()[0]["x"]
    b = pseudonymize(df2, ["x"], salt="a").collect()[0]["x"]
    assert a != b


def test_pseudonym_truncation_still_opt_in(spark):
    df = spark.createDataFrame([(7,)], "x int")
    got = pseudonymize(df, ["x"], salt="s", length=8).collect()[0]["x"]
    assert got == hashlib.md5(b"s\x007").hexdigest()[:8]


def test_pseudonymize_validation(spark):
    df = spark.createDataFrame([(1,)], "x int")
    with pytest.raises(ValueError, match="salt"):
        pseudonymize(df, ["x"], salt="")
    with pytest.raises(ValueError, match="at least one"):
        pseudonymize(df, [], salt="s")
    with pytest.raises(ValueError, match="length"):
        pseudonymize(df, ["x"], salt="s", length=40)


def test_k_anonymity_audit_flags_small_groups(spark):
    rows = [("US", 30)] * 5 + [("US", 40)] * 2 + [("DE", 30)] * 1
    df = spark.createDataFrame(rows, "country string, age int")
    got = {
        (r["country"], r["age"]): (r["group_size"], r["at_risk"])
        for r in k_anonymity_audit(df, ["country", "age"], k=5).collect()
    }
    assert got[("US", 30)] == (5, False)
    assert got[("US", 40)] == (2, True)
    assert got[("DE", 30)] == (1, True)
    with pytest.raises(ValueError, match="k must be"):
        k_anonymity_audit(df, ["country"], k=1)
    with pytest.raises(ValueError, match="at least one"):
        k_anonymity_audit(df, [], k=5)


def test_suppress_below_k_matches_bruteforce(spark):
    from d365fo_db_sync_spark.operators.privacy import suppress_below_k

    rows = [
        ("a", "x", i) for i in range(5)
    ] + [("a", "y", 0), ("b", "x", 1), ("b", "x", 2), ("c", "z", 3)]
    df = spark.createDataFrame(rows, "q1 string, q2 string, payload int")
    kept = suppress_below_k(df, ["q1", "q2"], k=3)
    assert kept.columns == df.columns  # schema unchanged, helper column gone
    got = sorted((r["q1"], r["q2"], r["payload"]) for r in kept.collect())
    # only the (a, x) group reaches k=3; every row of it survives intact
    assert got == sorted(("a", "x", i) for i in range(5))


def test_suppress_below_k_is_one_shuffle_no_join(spark):
    """The scale contract: high-cardinality QI suppression must be ONE
    exchange (the window partition) and must NOT join an audit frame
    back — that second shuffle is the composition this operator
    replaces."""
    from d365fo_db_sync_spark.operators.privacy import suppress_below_k
    from d365fo_db_sync_spark.plans.audit import explain_formatted, physical_operators

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet").select(
        "user_id", "event_type"
    )
    kept = suppress_below_k(ev, ["user_id", "event_type"], k=5)
    ops = physical_operators(kept)
    assert sum("Exchange" in o for o in ops) == 1, ops
    assert not any("Join" in o for o in ops), ops
    assert any("Window" in o for o in ops), ops
    # the helper count column is projected away before the plan returns
    assert "__group_size" not in explain_formatted(kept).split("Output")[0]


def test_suppress_below_k_validation(spark):
    from d365fo_db_sync_spark.operators.privacy import suppress_below_k

    df = spark.createDataFrame([("a", 1)], "q string, v int")
    with pytest.raises(ValueError, match="at least one column"):
        suppress_below_k(df, [], k=5)
    with pytest.raises(ValueError, match="k must be >= 2"):
        suppress_below_k(df, ["q"], k=1)


def test_l_diversity_flags_homogeneous_groups(spark):
    from d365fo_db_sync_spark.operators.privacy import l_diversity_audit

    rows = [
        # group (a): 4 rows but ONE sensitive value -> at risk at l=2
        ("a", "flu"), ("a", "flu"), ("a", "flu"), ("a", "flu"),
        # group (b): 2 rows, 2 distinct -> safe
        ("b", "flu"), ("b", "cold"),
        # group (c): NULL sensitive carries no disclosure -> 1 distinct, risk
        ("c", "flu"), ("c", None),
    ]
    df = spark.createDataFrame(rows, "qi string, dx string")
    out = {
        r["qi"]: (r["group_size"], r["distinct_sensitive"], r["at_risk"])
        for r in l_diversity_audit(df, ["qi"], "dx", l=2).collect()
    }
    assert out == {"a": (4, 1, True), "b": (2, 2, False), "c": (2, 1, True)}


def test_l_diversity_validation(spark):
    from d365fo_db_sync_spark.operators.privacy import l_diversity_audit

    df = spark.createDataFrame([("a", "s")], "q string, s string")
    with pytest.raises(ValueError, match="at least one column"):
        l_diversity_audit(df, [], "s")
    with pytest.raises(ValueError, match="cannot be a quasi-identifier"):
        l_diversity_audit(df, ["q", "s"], "s")
    with pytest.raises(ValueError, match="l must be >= 2"):
        l_diversity_audit(df, ["q"], "s", l=1)


def test_generalize_until_k_walks_ladder_then_suppresses(spark):
    import pyspark.sql.functions as F

    from d365fo_db_sync_spark.operators.privacy import generalize_until_k

    # zips 10001..10004 with 3 rows each, plus a singleton 99999
    rows = [(f"{z}", i) for z in range(10001, 10005) for i in range(3)]
    rows += [("99999", 0)]
    df = spark.createDataFrame(rows, "zip string, v int")
    ladder = [{"zip": F.substring("zip", 1, 3)}, {"zip": F.substring("zip", 1, 1)}]

    # k=12: raw zips fail, 3-digit prefix pools 10001-10004 into '100'
    # (12 rows) but leaves '999' a singleton; 1-digit prefix still
    # leaves '9' a singleton -> suppression escape fires on it
    out, level, suppressed = generalize_until_k(df, ["zip"], ladder, k=12)
    assert (level, suppressed) == (2, True)
    got = {(r["zip"]) for r in out.select("zip").distinct().collect()}
    assert got == {"1"}  # the '9' singleton was suppressed at the top level
    assert out.count() == 12

    # k=3: level 0 already passes... except the singleton; level 1 pools it? no
    # k=2: level 1 ('100' x12 + '999' x1) still leaks; check a clean pass:
    df2 = df.filter(F.col("zip") != "99999")
    out2, level2, supp2 = generalize_until_k(df2, ["zip"], ladder, k=3)
    assert (level2, supp2) == (0, False)  # identity level already k-anonymous
    assert out2.count() == 12

    out3, level3, supp3 = generalize_until_k(df2, ["zip"], ladder, k=12)
    assert (level3, supp3) == (1, False)  # one coarsening step suffices
    assert {r["zip"] for r in out3.select("zip").distinct().collect()} == {"100"}


def test_generalize_until_k_validation(spark):
    import pyspark.sql.functions as F

    from d365fo_db_sync_spark.operators.privacy import generalize_until_k

    df = spark.createDataFrame([("a", 1)], "q string, v int")
    with pytest.raises(ValueError, match="non-QI columns"):
        generalize_until_k(df, ["q"], [{"v": F.lit(0)}], k=2)
    with pytest.raises(ValueError, match="k must be >= 2"):
        generalize_until_k(df, ["q"], [], k=1)


def test_t_closeness_matches_bruteforce(spark):
    from fractions import Fraction

    from d365fo_db_sync_spark.operators.privacy import t_closeness_audit

    rows = (
        [("a", "cancer")] * 9 + [("a", "flu")] * 1          # heavily skewed
        + [("b", "cancer")] * 5 + [("b", "flu")] * 5        # balanced
        + [("c", "flu")] * 4 + [("c", None)] * 3            # NULLs excluded
    )
    df = spark.createDataFrame(rows, "qi string, dx string")
    out = {
        r["qi"]: (r["group_size"], r["tvd"], r["at_risk"])
        for r in t_closeness_audit(df, ["qi"], "dx", t=0.2).collect()
    }
    # global (NULL excluded): cancer 14/24, flu 10/24
    data = {"a": {"cancer": 9, "flu": 1}, "b": {"cancer": 5, "flu": 5},
            "c": {"flu": 4}}
    glob = {"cancer": Fraction(14, 24), "flu": Fraction(10, 24)}
    for qi, counts in data.items():
        ng = sum(counts.values())
        tvd = sum(
            abs(Fraction(counts.get(v, 0), ng) - p) for v, p in glob.items()
        ) / 2
        gs, got_tvd, risk = out[qi]
        assert gs == ng
        assert abs(got_tvd - float(tvd)) < 1e-15, (qi, got_tvd, tvd)
        assert risk == (tvd > Fraction(1, 5))
    assert out["a"][2] is True and out["b"][2] is False


def test_t_closeness_validation(spark):
    from d365fo_db_sync_spark.operators.privacy import t_closeness_audit

    df = spark.createDataFrame([("a", "s")], "q string, s string")
    with pytest.raises(ValueError, match="at least one column"):
        t_closeness_audit(df, [], "s")
    with pytest.raises(ValueError, match="cannot be a quasi-identifier"):
        t_closeness_audit(df, ["q", "s"], "s")
    with pytest.raises(ValueError, match="t must be in"):
        t_closeness_audit(df, ["q"], "s", t=1.5)


def test_t_closeness_corpus_shuffles_once(spark):
    """Plan pin: the corpus shuffles exactly once (into (QI, value)
    counts); the window's QI exchange is REUSED by the final rollup
    (three hash exchanges total, none after the Window), and the
    global distribution + total ride broadcasts."""
    import re

    import pyspark.sql.functions as F

    from d365fo_db_sync_spark.operators.privacy import t_closeness_audit
    from d365fo_db_sync_spark.plans.audit import explain_formatted

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet").select(
        F.to_date("ts").alias("day"), "event_type"
    )
    plan = explain_formatted(t_closeness_audit(ev, ["day"], "event_type"))
    keys = [
        re.sub(r"#\d+", "", m.group(1))
        for m in re.finditer(
            r"Arguments: hashpartitioning\(((?:\w+#\d+(?:, )?)+), \d+\)", plan
        )
    ]
    assert sorted(keys) == ["day", "day, event_type", "event_type"], keys
    from d365fo_db_sync_spark.plans.audit import physical_operators

    ops = physical_operators(t_closeness_audit(ev, ["day"], "event_type"))
    assert sum(o.startswith("BroadcastExchange") for o in ops) == 2, ops


def test_suppress_below_k_rejects_reserved_column(spark):
    """The temp-column collision guard: a pre-existing __group_size
    would be silently overwritten and dropped, corrupting the released
    schema — refuse loudly instead."""
    import pytest

    from d365fo_db_sync_spark.operators.privacy import suppress_below_k

    df = spark.createDataFrame([("a", 1)], "qi string, __group_size int")
    with pytest.raises(ValueError, match="__group_size"):
        suppress_below_k(df, ["qi"], k=2)
