"""bench.py helper discipline: the canary 'historical median' must be
built from rounds STRICTLY BEFORE the one being recorded — a re-run
after the driver wrote this round's BENCH file must not let this run's
own canary dilute the cross-round correction."""

from __future__ import annotations

import json


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
