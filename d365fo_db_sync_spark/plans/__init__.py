"""Logical-plan layer: strategy compilation lives in d365fo_db_sync_spark.strategy."""
