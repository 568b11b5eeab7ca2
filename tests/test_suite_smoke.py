"""Smoke: every registered query runs at sf0.001 and returns a stable schema.

The full value-level check against DuckDB lives in tools/check.py (and the
driver's t2 harness); this keeps pytest fast.
"""

from __future__ import annotations

import pytest


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
