"""d365fo_db_sync_spark — a PySpark-native incremental-sync / analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference tool TrudAX/D365FO-DB-Sync (a .NET batch ETL / incremental
replication engine), re-expressed Spark-first:

* scans/sources/sinks        -> :mod:`d365fo_db_sync_spark.sources`, :mod:`.scans`
* projection/filter family   -> :mod:`d365fo_db_sync_spark.projection`
* delta comparison (joins)   -> :mod:`d365fo_db_sync_spark.delta`
* incremental sync + state   -> :mod:`d365fo_db_sync_spark.sync`, :mod:`.state`
* strategy DSL               -> :mod:`d365fo_db_sync_spark.strategy`
* catalog discovery          -> :mod:`d365fo_db_sync_spark.catalog`
* set ops / windows / aggs   -> :mod:`d365fo_db_sync_spark.operators`
* scale extensions           -> :mod:`d365fo_db_sync_spark.operators.dedup`,
                                ``.similarity``, ``.text``, ``.multimodal``

Everything is declarative DataFrame API so Catalyst handles pruning,
pushdown, join selection and AQE; engine-level logic (watermark state,
cost-based merge-mode selection, strategy compilation) lives above the plan.
"""

from d365fo_db_sync_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
