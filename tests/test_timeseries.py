"""Regular-grid resample + forward fill (operators/timeseries.py)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from d365fo_db_sync_spark.operators import timeseries


def _events(spark, rows):
    return spark.createDataFrame(
        [(k, dt.datetime.fromisoformat(t), v) for k, t, v in rows],
        "key string, ts timestamp_ntz, value double",
    )


def _grid(spark, rows, interval=86_400):
    out = timeseries.resample_ffill(
        _events(spark, rows),
        ["key"],
        "ts",
        {"v": F.sum("value"), "n": F.count("*")},
        interval_seconds=interval,
        fill_cols=["v"],  # carry the value; counts stay NULL on gaps
    )
    return {
        (r["key"], r["bucket_ts"].isoformat()): (r["v"], r["n"], r["is_observed"])
        for r in out.collect()
    }


def test_gaps_filled_with_last_observation(spark):
    g = _grid(
        spark,
        [
            ("a", "2024-01-01T05:00:00", 10.0),
            ("a", "2024-01-04T01:00:00", 7.0),
        ],
    )
    assert g[("a", "2024-01-01T00:00:00")] == (10.0, 1, True)
    # days 2 and 3 are gap rows: value carried, count NOT filled, flagged
    assert g[("a", "2024-01-02T00:00:00")] == (10.0, None, False)
    assert g[("a", "2024-01-03T00:00:00")] == (10.0, None, False)
    assert g[("a", "2024-01-04T00:00:00")] == (7.0, 1, True)
    assert len(g) == 4


def test_keys_span_to_global_max_but_start_at_own_min(spark):
    g = _grid(
        spark,
        [
            ("a", "2024-01-01T12:00:00", 1.0),
            ("b", "2024-01-03T12:00:00", 2.0),
            ("a", "2024-01-02T12:00:00", 3.0),
        ],
    )
    # a: 3 rows (its min .. global max), b: 1 row (starts at its own min)
    assert {k for k in g} == {
        ("a", "2024-01-01T00:00:00"),
        ("a", "2024-01-02T00:00:00"),
        ("a", "2024-01-03T00:00:00"),
        ("b", "2024-01-03T00:00:00"),
    }
    assert g[("a", "2024-01-03T00:00:00")] == (3.0, None, False)


def test_same_bucket_aggregates(spark):
    g = _grid(
        spark,
        [
            ("a", "2024-01-01T01:00:00", 1.0),
            ("a", "2024-01-01T23:00:00", 2.0),
        ],
    )
    assert g[("a", "2024-01-01T00:00:00")] == (3.0, 2, True)
    assert len(g) == 1


def test_hourly_interval(spark):
    g = _grid(
        spark,
        [("a", "2024-01-01T00:10:00", 1.0), ("a", "2024-01-01T03:50:00", 2.0)],
        interval=3600,
    )
    assert len(g) == 4  # 00,01,02,03
    assert g[("a", "2024-01-01T01:00:00")] == (1.0, None, False)


def test_buckets_are_session_timezone_independent(spark):
    """TIMESTAMP_NTZ inputs must bucket identically under any session
    timezone — the unix_timestamp trap the module docstring names."""
    rows = [("a", "2024-03-10T01:30:00", 1.0), ("a", "2024-03-12T23:30:00", 2.0)]
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        a = _grid(spark, rows)
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        b = _grid(spark, rows)
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
    assert a == b


def test_empty_agg_raises(spark):
    with pytest.raises(ValueError):
        timeseries.resample_ffill(_events(spark, []), ["key"], "ts", {})
