"""Delta-comparison edge cases from the reference's spec checklists
(DeltaComparison_ImplementationPlan_v2.md:142-226, 1292-1335): NULL
datetimes, RECVERSION=1 collisions, negative RECVERSION, fallback mode."""

from __future__ import annotations

import datetime as dt

import pytest

from d365fo_db_sync_spark import delta

TS = dt.datetime(2024, 3, 1, 12, 0, 0)
SCHEMA = "RecId long, RECVERSION int, CREATEDDATETIME timestamp_ntz, MODIFIEDDATETIME timestamp_ntz"


def classify(spark, src_rows, tgt_rows, **kw):
    src = spark.createDataFrame(src_rows, SCHEMA)
    tgt = spark.createDataFrame(tgt_rows, SCHEMA)
    out = delta.classify_changes(src, tgt, key="RecId", **kw)
    return {r["RecId"]: r["change_type"] for r in out.collect()}


def test_four_way_basics(spark):
    got = classify(
        spark,
        src_rows=[
            (1, 2, TS, TS),          # unchanged
            (2, 3, TS, TS),          # modified (version)
            (4, 2, TS, TS),          # new
        ],
        tgt_rows=[
            (1, 2, TS, TS),
            (2, 2, TS, TS),
            (3, 2, TS, TS),          # deleted
        ],
    )
    assert got == {1: "unchanged", 2: "modified", 3: "deleted", 4: "new"}


def test_null_datetime_semantics(spark):
    """NULL=NULL matches; NULL vs value does not (ValuesEqual,
    AxDbDataService.cs:872-886)."""
    got = classify(
        spark,
        src_rows=[(1, 2, None, TS), (2, 2, None, TS), (3, 2, None, None)],
        tgt_rows=[(1, 2, None, TS), (2, 2, TS, TS), (3, 2, None, None)],
    )
    assert got == {1: "unchanged", 2: "modified", 3: "unchanged"}


def test_modified_datetime_difference(spark):
    got = classify(
        spark,
        src_rows=[(1, 2, TS, TS + dt.timedelta(seconds=1))],
        tgt_rows=[(1, 2, TS, TS)],
    )
    assert got == {1: "modified"}


def test_negative_recversion(spark):
    """RECVERSION can be negative (DeltaComparison spec :148-152) —
    plain equality applies."""
    got = classify(
        spark,
        src_rows=[(1, -5, TS, TS), (2, -5, TS, TS)],
        tgt_rows=[(1, -5, TS, TS), (2, 7, TS, TS)],
    )
    assert got == {1: "unchanged", 2: "modified"}


def test_recversion_1_with_datetimes_is_normal_compare(spark):
    """With datetime columns present (NOT fallback mode), RECVERSION=1 rows
    compare normally — the MaxRecId rule only applies in fallback mode."""
    got = classify(
        spark,
        src_rows=[(1, 1, TS, TS)],
        tgt_rows=[(1, 1, TS, TS)],
    )
    assert got == {1: "unchanged"}


@pytest.mark.parametrize(
    ("max_key", "tgt_rv", "expected"),
    [
        (100, 1, "unchanged"),   # both =1, key <= max -> unchanged
        (0, 1, "modified"),      # key > max -> modified
        (100, 2, "modified"),    # tgt version != 1 -> modified
        (None, 1, "modified"),   # no stored max -> modified
    ],
)
def test_fallback_recversion_1_rule(spark, max_key, tgt_rv, expected):
    """AxDbDataService.cs:801-814."""
    src = spark.createDataFrame([(5, 1)], "RecId long, RECVERSION int")
    tgt = spark.createDataFrame([(5, tgt_rv)], "RecId long, RECVERSION int")
    ctx = delta.ComparisonContext(has_recversion=True, has_created=False, has_modified=False)
    out = delta.classify_changes(src, tgt, key="RecId", context=ctx, max_transferred_key=max_key)
    assert out.collect()[0]["change_type"] == expected


def test_fallback_non_1_versions_compare_normally(spark):
    src = spark.createDataFrame([(1, 5), (2, 5)], "RecId long, RECVERSION int")
    tgt = spark.createDataFrame([(1, 5), (2, 6)], "RecId long, RECVERSION int")
    ctx = delta.ComparisonContext(has_recversion=True, has_created=False, has_modified=False)
    out = delta.classify_changes(src, tgt, key="RecId", context=ctx, max_transferred_key=10)
    got = {r["RecId"]: r["change_type"] for r in out.collect()}
    assert got == {1: "unchanged", 2: "modified"}


def test_context_from_columns():
    ctx = delta.ComparisonContext.from_columns(
        ["RecId", "RECVERSION", "CREATEDDATETIME"], ["recid", "recversion", "modifieddatetime"]
    )
    assert ctx.has_recversion and not ctx.has_created and not ctx.has_modified
    assert ctx.is_fallback_mode


def test_compact_duplicates_salted(spark):
    """compact_duplicates: a duplicate-key source (uncompacted CDC
    replay) reduces to element-wise max per key BEFORE the join, via the
    two-stage salted aggregation — the latest version wins and the
    classification matches what a pre-deduped source would produce."""
    later = dt.datetime(2024, 3, 2, 12, 0, 0)
    src_rows = (
        # hot key 1: many replayed events, versions 1..40, latest ts
        [(1, v, TS, later if v == 40 else TS) for v in range(1, 41)]
        + [(2, 2, TS, TS), (3, 9, TS, TS)]
    )
    tgt_rows = [(1, 40, TS, later), (2, 2, TS, TS)]
    got = classify(spark, src_rows, tgt_rows, compact_duplicates=True, salt=4)
    assert got == {1: "unchanged", 2: "unchanged", 3: "new"}
    # exactly one row per key — the join never sees the duplicates
    src = spark.createDataFrame(src_rows, SCHEMA)
    tgt = spark.createDataFrame(tgt_rows, SCHEMA)
    out = delta.classify_changes(src, tgt, compact_duplicates=True, salt=4)
    assert out.count() == 3


def test_custom_version_column_name_enables_version_compare(spark):
    # regression: from_columns used to test only the DEFAULT names, so
    # classify_changes(recversion="SysRowVersion") silently degraded to
    # key-only comparison and called every surviving key unchanged
    from d365fo_db_sync_spark.delta import classify_changes

    src = spark.createDataFrame(
        [(1, 10), (2, 99)], "RecId long, SysRowVersion long"
    )
    tgt = spark.createDataFrame(
        [(1, 10), (2, 20)], "RecId long, SysRowVersion long"
    )
    got = {
        r["RecId"]: r["change_type"]
        for r in classify_changes(src, tgt, recversion="SysRowVersion").collect()
    }
    assert got == {1: "unchanged", 2: "modified"}
