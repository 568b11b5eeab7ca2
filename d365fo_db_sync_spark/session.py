"""SparkSession factory with scale-conscious defaults.

The engine targets large clusters (100 TB-class inputs); the defaults here
are the knobs that matter at that scale and are harmless locally:

* AQE on (runtime coalescing, skew-join splitting, dynamic join selection)
* auto broadcast enabled — dimension tables in sync workloads are tiny
* Arrow for any pandas-UDF exchange (the slow-path operators)
* session timezone pinned to UTC so timestamp semantics are deterministic
  and match the DuckDB oracle used by the correctness harness
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "d365fo-db-sync-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` when running
    locally; on a real cluster leave it unset and submit normally.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        # Local: one shuffle partition per core avoids tiny-task overhead.
        # On a cluster this should be ~2-3x total cores (or leave AQE's
        # coalescing to shrink an intentionally high initial number).
        shuffle_partitions = int(cpus) if cpus.isdigit() else 32

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # FAIR mode: concurrent per-table sync jobs (orchestrator worker
        # pool, R10) round-robin instead of FIFO — one huge table cannot
        # starve the small ones, matching the reference's N independent
        # workers each making progress (CopyOrchestrator.cs:440-497)
        .config("spark.scheduler.mode", "FAIR")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", "128m")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def release_local_checkpoint(df) -> None:
    """Free an eager ``localCheckpoint()``'s executor blocks once the
    frame is fully consumed: the checkpointed plan's root is a
    LogicalRDD whose RDD the checkpoint persisted — unpersist it.
    Best-effort over py4j internals (a cleanup miss must never kill
    the caller; the blocks then die with the executor). Canonical
    home for the streaming sidecar pipelines' and the iterative batch
    fitters' per-pass cleanup."""
    try:
        df._jdf.queryExecution().analyzed().rdd().unpersist(False)
    except Exception:
        pass
