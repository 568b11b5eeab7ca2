"""Fuzzy entity matching contracts (operators/fuzzy.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from d365fo_db_sync_spark.operators import fuzzy

NAMES = [
    (1, "small ring"),
    (2, "small ping"),   # dist 1 to "small ring"
    (3, "small rings"),  # dist 1 to "small ring", 2 to "small ping"
    (4, "smallring"),    # dist 1 (deletion) to "small ring"
    (5, "big bolt"),
    (6, "big bolts"),
    (7, "Big bolt"),     # first char differs -> blocked out by design
    (8, "small ring"),   # exact duplicate of 1
]


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(NAMES, "id long, name string")


def _brute(max_dist):
    """Reference semantics: first-char equal AND |Δlen| <= k AND lev <= k."""
    import difflib  # noqa: F401  (documentational; we hand-roll lev below)

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb))
        return dp[-1]

    out = set()
    for i, (ia, na) in enumerate(NAMES):
        for ib, nb in NAMES[i + 1 :]:
            lo, hi = (ia, ib) if ia < ib else (ib, ia)
            if (
                na[:1] == nb[:1]
                and abs(len(na) - len(nb)) <= max_dist
                and lev(na, nb) <= max_dist
            ):
                out.add((lo, hi))
    return out


@pytest.mark.parametrize("k", [0, 1, 2])
def test_self_match_equals_reference(df, k):
    got = {(r["id_a"], r["id_b"]) for r in fuzzy.fuzzy_self_match(df, "id", "name", k).collect()}
    assert got == _brute(k)


def test_self_match_no_duplicate_pairs(df):
    rows = fuzzy.fuzzy_self_match(df, "id", "name", 2).collect()
    pairs = [(r["id_a"], r["id_b"]) for r in rows]
    assert len(pairs) == len(set(pairs))  # banding admits each pair once
    assert all(r["id_a"] < r["id_b"] for r in rows)
    assert all(r["dist"] <= 2 for r in rows)


def test_two_table_join(spark, df):
    right = spark.createDataFrame(
        [(100, "small ring"), (101, "big bolt"), (102, "zzz")],
        "rid long, rname string",
    )
    got = {
        (r["id"], r["rid"], r["dist"])
        for r in fuzzy.fuzzy_join(df, right, "id", "rid", "name", "rname", 1).collect()
    }
    assert (1, 100, 0) in got and (8, 100, 0) in got
    assert (2, 100, 1) in got  # small ping ~ small ring
    assert (5, 101, 0) in got and (6, 101, 1) in got
    assert not any(rid == 102 for _i, rid, _d in got)


def test_blocking_excludes_cross_first_char(df):
    # "Big bolt" vs "big bolt" is 1 edit but first chars differ: the
    # documented blocking tradeoff, pinned so it stays deliberate
    got = {(r["id_a"], r["id_b"]) for r in fuzzy.fuzzy_self_match(df, "id", "name", 2).collect()}
    assert (5, 7) not in got
