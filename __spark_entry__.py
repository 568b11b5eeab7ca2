"""Driver contract for the spark-graft builder (PySpark target).

The engine lives in :mod:`d365fo_db_sync_spark`; this file is the thin
driver-facing shim. ``queries()``/``oracle_sql()`` are generated from the
engine's registered suite (d365fo_db_sync_spark/suite/) — one entry per
implemented operator from SURVEY.md §2.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: snapshot-sync shape —
    last N orders by unique key with a pruned projection (SURVEY §7.1)."""
    from d365fo_db_sync_spark.suite import queries

    return queries()["topn_orders_snapshot"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from d365fo_db_sync_spark.suite import queries as _queries

    return _queries()


def oracle_sql() -> dict[str, str]:
    from d365fo_db_sync_spark.suite import oracle_sql as _oracle_sql

    return _oracle_sql()
