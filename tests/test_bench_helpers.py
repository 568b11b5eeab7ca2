"""bench.py helper discipline: the canary 'historical median' must be
built from rounds STRICTLY BEFORE the one being recorded — a re-run
after the driver wrote this round's BENCH file must not let this run's
own canary dilute the cross-round correction."""

from __future__ import annotations

import pytest

import json

#: driver-window tier: value-equality / contract tests (pytest -m fast)
pytestmark = pytest.mark.fast


def _write(p, name, canary):
    (p / name).write_text(
        json.dumps({"parsed": {"queries": {"load_canary_pre": canary,
                                           "load_canary_post": canary + 0.01}}})
    )


def test_canary_history_excludes_current_round(tmp_path, monkeypatch):
    import bench

    monkeypatch.setattr(
        bench, "__file__", str(tmp_path / "bench.py"), raising=False
    )
    # driver artifacts: rounds 1-2 closed => current round is 3
    (tmp_path / "CORRECTNESS_r01.json").write_text("{}")
    (tmp_path / "CORRECTNESS_r02.json").write_text("{}")
    _write(tmp_path, "BENCH_r01.json", 0.10)
    _write(tmp_path, "BENCH_r02.json", 0.20)
    # this round's own file already recorded (re-run scenario) + a
    # stray future file: both must be excluded
    _write(tmp_path, "BENCH_r03.json", 9.99)
    _write(tmp_path, "BENCH_r04.json", 9.99)

    assert bench._current_round() == 3
    hist = bench._canary_history()
    assert hist == {"BENCH_r01": 0.10, "BENCH_r02": 0.20}


def test_canary_history_empty_repo(tmp_path, monkeypatch):
    import bench

    monkeypatch.setattr(
        bench, "__file__", str(tmp_path / "bench.py"), raising=False
    )
    assert bench._current_round() == 1
    assert bench._canary_history() == {}


def test_io_canary_history(tmp_path, monkeypatch):
    import bench

    monkeypatch.setattr(
        bench, "__file__", str(tmp_path / "bench.py"), raising=False
    )
    (tmp_path / "CORRECTNESS_r01.json").write_text("{}")
    (tmp_path / "BENCH_r01.json").write_text(
        json.dumps({"parsed": {"queries": {"io_canary_pre": 0.11,
                                           "io_canary_post": 0.09}}})
    )
    # an unparseable driver record (the r12 failure mode) contributes
    # nothing and does not crash history extraction
    (tmp_path / "CORRECTNESS_r02.json").write_text("{}")
    (tmp_path / "BENCH_r02.json").write_text(json.dumps({"parsed": None}))
    assert bench._io_canary_history() == {"BENCH_r01": 0.09}


def _fake_detail(n_queries):
    timings = {f"very_long_query_name_number_{i:04d}": 1.0 + i
               for i in range(n_queries)}
    timings.update(load_canary_pre=0.1, load_canary_post=0.11,
                   io_canary_pre=0.1, io_canary_post=0.1)
    timings["cdc_stream_throughput:steady_rows_per_sec"] = 98765.4
    return {
        "metric": "suite_total_runtime", "value": 43.21, "unit": "sec",
        "queries": timings,
        "dispersion": {k: 0.01 for k in timings},
        "normalized_total": 44.0,
        "canary": {"this_run": 0.1, "median_history": 0.12,
                   "history": {f"BENCH_r{i:02d}": 0.1 for i in range(12)},
                   "trail": [0.1] * 20},
        "io_canary": {"this_run": 0.1, "history": {}, "reading_rule": "x"},
        "steady_rows_per_sec_history": {},
        "sf": 0.1,
    }


def test_summary_line_stays_under_driver_tail_window():
    """The driver records only the last ~2000 chars of stdout; r12's
    full-detail line outgrew it and the permanent record lost the
    headline. The stdout summary must stay parseable regardless of how
    many queries the suite grows."""
    import bench

    for n in (5, 34, 200):
        line = bench.summary_line(_fake_detail(n))
        assert len(line.encode()) <= bench.SUMMARY_MAX_BYTES
        parsed = json.loads(line)
        assert parsed["value"] == 43.21
        assert parsed["normalized_total"] == 44.0
        # the keys future cross-round _history() reads from driver
        # records must survive the cap
        for k in ("load_canary_pre", "load_canary_post",
                  "io_canary_pre", "io_canary_post",
                  "cdc_stream_throughput:steady_rows_per_sec"):
            assert k in parsed["queries"]
        assert parsed["n_queries"] == n


def test_median_formula():
    import bench

    assert bench._median([]) is None
    assert bench._median([0.3]) == 0.3
    assert bench._median([0.1, 0.3]) == 0.2
    assert bench._median([0.3, 0.1, 0.2]) == 0.2


def test_io_normalized_total_formula_and_summary():
    """r13 verdict #5: the io-canary history graduates to a published
    io_normalized_total = raw_total * median(io history) / this_io —
    same shape as the CPU correction, carried in both the detail dict
    and the stdout summary. With io median 0.12 and this-run io 0.10
    the raw 43.21 normalizes to 43.21 * 1.2."""
    import bench

    detail = _fake_detail(5)
    detail["io_normalized_total"] = round(43.21 * 0.12 / 0.1, 3)
    parsed = json.loads(bench.summary_line(detail))
    assert parsed["io_normalized_total"] == round(43.21 * 0.12 / 0.1, 3)
    # the formula itself, as main() computes it
    assert round(43.21 * bench._median([0.11, 0.12, 0.13]) / 0.1, 3) == round(
        43.21 * 1.2, 3
    )


def test_bounded_factor_formula():
    """r14 verdict #7: the canary is a ~0.1 s measurement — the applied
    correction is the raw median-ratio CLAMPED to CANARY_FACTOR_CLAMP,
    with the raw factor reported beside it; missing history or a dead
    canary mean factor 1.0 (raw None)."""
    import bench

    lo, hi = bench.CANARY_FACTOR_CLAMP
    # in-band: applied == raw
    raw, applied = bench._bounded_factor(0.12, 0.10)
    assert raw == applied == 0.12 / 0.10
    # the r14 incident shape: 0.1215 median over a 0.077 read is a
    # 1.58x multiplier — now clamped to the ceiling, raw preserved
    raw, applied = bench._bounded_factor(0.1215, 0.077)
    assert raw == 0.1215 / 0.077 and applied == hi
    # fast-machine direction clamps at the floor
    raw, applied = bench._bounded_factor(0.08, 0.16)
    assert raw == 0.5 and applied == lo
    # degenerate inputs
    assert bench._bounded_factor(None, 0.1) == (None, 1.0)
    assert bench._bounded_factor(0.1, None) == (None, 1.0)
    assert bench._bounded_factor(0.1, 0.0) == (None, 1.0)


def test_this_run_canary_is_median_of_all_samples():
    """The published this-run canary folds pre + post + the
    interleaved trail through the median — one unlucky read cannot
    set the correction factor (main() computes
    _median([pre, post] + trail))."""
    import bench

    # the r14 shape: one 0.077 outlier among otherwise ~0.12 reads
    samples = [0.077, 0.121] + [0.118, 0.124, 0.119]
    assert bench._median(samples) == 0.119
