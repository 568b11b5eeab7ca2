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


def _bounded_grid(spark, rows, **kw):
    out = timeseries.resample_ffill(
        _events(spark, rows),
        ["key"],
        "ts",
        {"v": F.sum("value")},
        interval_seconds=86_400,
        **kw,
    )
    return {(r["key"], r["bucket_ts"].isoformat()) for r in out.collect()}


_SPARSE = [
    # key "dead" fires once on day 1 of a 10-day corpus; key "live"
    # spans the whole range. Unbounded, "dead" would fill 10 rows.
    ("dead", "2024-01-01T06:00:00", 1.0),
    ("live", "2024-01-01T06:00:00", 1.0),
    ("live", "2024-01-10T06:00:00", 2.0),
]


def test_until_key_max_stops_dead_keys(spark):
    g = _bounded_grid(spark, _SPARSE, until="key_max")
    dead = {b for k, b in g if k == "dead"}
    live = {b for k, b in g if k == "live"}
    assert dead == {"2024-01-01T00:00:00"}  # zero tail rows
    assert len(live) == 10  # its own max IS the global max
    assert len(g) == 11


def test_max_gap_intervals_caps_the_tail(spark):
    g = _bounded_grid(spark, _SPARSE, max_gap_intervals=2)
    dead = sorted(b for k, b in g if k == "dead")
    # day 1 observed + at most 2 gap intervals past its last observation
    assert dead == [
        "2024-01-01T00:00:00",
        "2024-01-02T00:00:00",
        "2024-01-03T00:00:00",
    ]
    # live keys still reach the global horizon (cap never extends past it)
    assert len([b for k, b in g if k == "live"]) == 10


def test_max_gap_zero_equals_key_max(spark):
    assert _bounded_grid(spark, _SPARSE, max_gap_intervals=0) == _bounded_grid(
        spark, _SPARSE, until="key_max"
    )


def test_default_horizon_unchanged(spark):
    g = _bounded_grid(spark, _SPARSE)
    assert len([b for k, b in g if k == "dead"]) == 10  # global_max default


def test_bad_until_raises(spark):
    with pytest.raises(ValueError):
        timeseries.resample_ffill(
            _events(spark, []), ["key"], "ts", {"v": F.sum("value")}, until="nope"
        )
    with pytest.raises(ValueError):
        timeseries.resample_ffill(
            _events(spark, []),
            ["key"],
            "ts",
            {"v": F.sum("value")},
            max_gap_intervals=-1,
        )


class TestSessionize:
    def _label(self, spark, rows, gap=600, tiebreaks=None):
        out = timeseries.sessionize(
            _events(spark, rows), ["key"], "ts", gap_seconds=gap,
            tiebreak_cols=tiebreaks,
        )
        return {
            (r["key"], r["ts"].isoformat()): r["session_id"] for r in out.collect()
        }

    def test_gap_splits_sessions(self, spark):
        g = self._label(
            spark,
            [
                ("a", "2024-01-01T00:00:00", 1.0),
                ("a", "2024-01-01T00:05:00", 1.0),
                ("a", "2024-01-01T00:30:00", 1.0),  # 25 min gap > 10 min
                ("b", "2024-01-01T00:00:00", 1.0),
            ],
        )
        assert g[("a", "2024-01-01T00:00:00")] == 1
        assert g[("a", "2024-01-01T00:05:00")] == 1
        assert g[("a", "2024-01-01T00:30:00")] == 2
        assert g[("b", "2024-01-01T00:00:00")] == 1  # per-key ordinals

    def test_boundary_gap_stays_in_session(self, spark):
        g = self._label(
            spark,
            [
                ("a", "2024-01-01T00:00:00", 1.0),
                ("a", "2024-01-01T00:10:00", 1.0),  # exactly 600 s
            ],
        )
        assert set(g.values()) == {1}

    def test_matches_session_window_boundaries(self, spark):
        """The per-event labels must induce the same session count per
        key as Spark's own session_window aggregation."""
        import random

        rng = random.Random(7)
        rows = []
        base = 0
        for k in ("a", "b", "c"):
            base = 0
            for _ in range(40):
                base += rng.choice([60, 120, 1200])
                rows.append(
                    (k, f"2024-01-01T{base // 3600:02d}:{(base % 3600) // 60:02d}:{base % 60:02d}", 1.0)
                )
        df = _events(spark, rows)
        labeled = timeseries.sessionize(df, ["key"], "ts", gap_seconds=600)
        ours = {
            r["key"]: r["n"]
            for r in labeled.groupBy("key")
            .agg(F.countDistinct("session_id").alias("n"))
            .collect()
        }
        spark_native = {
            r["key"]: r["n"]
            for r in df.groupBy("key", F.session_window("ts", "10 minutes"))
            .count()
            .groupBy("key")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        assert ours == spark_native


class TestRollingTimeAgg:
    def _roll(self, spark, rows, window=600):
        out = timeseries.rolling_time_agg(
            _events(spark, rows),
            ["key"],
            "ts",
            {"w_sum": F.sum("value"), "w_n": F.count("*")},
            window_seconds=window,
        )
        return {
            (r["key"], r["ts"].isoformat()): (r["w_sum"], r["w_n"])
            for r in out.collect()
        }

    def test_trailing_window_contents(self, spark):
        g = self._roll(
            spark,
            [
                ("a", "2024-01-01T00:00:00", 1.0),
                ("a", "2024-01-01T00:05:00", 2.0),
                ("a", "2024-01-01T00:20:00", 4.0),  # 15 min after the 2nd
                ("b", "2024-01-01T00:01:00", 8.0),
            ],
        )
        assert g[("a", "2024-01-01T00:00:00")] == (1.0, 1)
        assert g[("a", "2024-01-01T00:05:00")] == (3.0, 2)
        assert g[("a", "2024-01-01T00:20:00")] == (4.0, 1)  # both earlier aged out? no: 00:05 is 15min < 10min? 15min > 10min -> aged
        assert g[("b", "2024-01-01T00:01:00")] == (8.0, 1)

    def test_window_is_half_open_at_the_far_edge(self, spark):
        # an event exactly window_seconds older is EXCLUDED
        g = self._roll(
            spark,
            [
                ("a", "2024-01-01T00:00:00", 1.0),
                ("a", "2024-01-01T00:10:00", 2.0),  # exactly 600 s later
            ],
        )
        assert g[("a", "2024-01-01T00:10:00")] == (2.0, 1)
        # but one microsecond inside is included
        g2 = self._roll(
            spark,
            [
                ("a", "2024-01-01T00:00:00.000001", 1.0),
                ("a", "2024-01-01T00:10:00", 2.0),
            ],
        )
        assert g2[("a", "2024-01-01T00:10:00")] == (3.0, 2)

    def test_matches_naive_python(self, spark):
        import random

        rng = random.Random(3)
        rows = []
        for k in ("a", "b"):
            t0 = 0
            for _ in range(60):
                t0 += rng.randrange(30, 900)
                rows.append(
                    (k, f"2024-01-01T{t0 // 3600:02d}:{(t0 % 3600) // 60:02d}:{t0 % 60:02d}", float(rng.randrange(1, 9)))
                )
        got = self._roll(spark, rows, window=1200)
        import datetime as dt

        by_key: dict[str, list] = {}
        for k, t, v in rows:
            by_key.setdefault(k, []).append((dt.datetime.fromisoformat(t), v))
        for k, evs in by_key.items():
            for t, _v in evs:
                want_n = sum(
                    1 for t2, _ in evs if t2 <= t and (t - t2).total_seconds() < 1200
                )
                want_sum = sum(
                    v2 for t2, v2 in evs if t2 <= t and (t - t2).total_seconds() < 1200
                )
                assert got[(k, t.isoformat())] == (want_sum, want_n)

    def test_bad_window_raises(self, spark):
        with pytest.raises(ValueError):
            timeseries.rolling_time_agg(
                _events(spark, []), ["key"], "ts", {"n": F.count("*")}, 0
            )


def test_key_max_with_max_gap_raises(spark):
    with pytest.raises(ValueError, match="only applies"):
        timeseries.resample_ffill(
            _events(spark, []),
            ["key"],
            "ts",
            {"v": F.sum("value")},
            until="key_max",
            max_gap_intervals=3,
        )
