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
