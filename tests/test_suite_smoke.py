"""Smoke: every registered query runs at sf0.001 and returns a stable schema.

The full value-level check against DuckDB lives in tools/check.py (and the
driver's t2 harness); this keeps pytest fast.
"""

from __future__ import annotations

import pytest

# NOT in the `-m fast` driver-window tier: the per-query smoke run is
# redundant with the driver's own t2 correctness gate, which executes
# every registered query against its DuckDB oracle anyway.


def _names():
    from d365fo_db_sync_spark.suite import queries

    return sorted(queries())


@pytest.mark.parametrize("name", _names())
def test_query_runs(spark, sf_dir, name):
    from d365fo_db_sync_spark.suite import queries

    df = queries()[name](spark, sf_dir)
    assert df.columns, name
    assert df.count() >= 0


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    qs = e.queries()
    oracles = e.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 30


def test_gate_window_is_oracled_and_atomic(spark, sf_dir):
    """The correctness gate grades EXACTLY the first 50 registered
    queries, and its canonicalizer (pandas sort_values) crashes on
    array/map/struct cells. Two invariants guard the hard signal:
    every query in the window has an oracle, and every in-window
    query's output schema is purely atomic (the r1/r2 red row was an
    array<string> column reaching the gate)."""
    from pyspark.sql import types as T

    from d365fo_db_sync_spark.suite import oracle_sql, queries

    qs = queries()
    oracles = oracle_sql()
    window = list(qs)[:50]
    missing = [n for n in window if n not in oracles]
    assert not missing, f"gate-window queries without oracle: {missing}"

    composite = (T.ArrayType, T.MapType, T.StructType)
    offenders = []
    for name in window:
        schema = qs[name](spark, sf_dir).schema
        for f in schema.fields:
            if isinstance(f.dataType, composite):
                offenders.append((name, f.name, f.dataType.simpleString()))
    assert not offenders, f"composite columns inside the gate window: {offenders}"
