"""Structured Streaming surface.

The reference is a repeated-batch CDC engine (SURVEY §2.9); this module
is the same machinery under Spark's streaming runtime:

* :class:`CdcStreamPipeline` — readStream -> foreachBatch -> the SAME
  SyncEngine merge used in batch mode. Each micro-batch plays the role
  of one reference sync cycle; the engine's StateStore is the
  cross-batch watermark (in addition to Spark's own checkpoint).
* :func:`stream_tumbling_counts` — the windowed-aggregate surface with a
  late-data watermark, reusing the exact expressions the batch suite
  verifies against DuckDB (suite/events_q.py).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from d365fo_db_sync_spark.sinks import ParquetTarget
from d365fo_db_sync_spark.sync import SyncEngine


class CdcStreamPipeline:
    """Micro-batch CDC: every incoming batch is merged into the target
    with the reference's semantics (classify -> delete -> idempotent
    insert), exactly-once via idempotent key-based writes (T5).

    The reference's per-table cycle (CopyOrchestrator.cs:812-939) IS a
    manually-scheduled micro-batch; here Spark's trigger scheduling
    replaces the worker loop.
    """

    def __init__(
        self,
        engine: SyncEngine,
        table: str,
        target: ParquetTarget,
        checkpoint_dir: str,
    ) -> None:
        self.engine = engine
        self.table = table
        self.target = target
        self.checkpoint_dir = checkpoint_dir

    def _handle_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        # a micro-batch is a DELTA, not a snapshot window — upsert by key,
        # never delete (deletes arrive as explicit tombstones upstream)
        self.engine.merge_upsert(self.table, batch_df, self.target)

    def start(self, stream_df: DataFrame, available_now: bool = True):
        """Attach to a streaming DataFrame and start the query.

        ``available_now=True`` drains what exists and stops — the batch
        refresh mode; ``False`` runs continuously on the default trigger.
        """
        writer = (
            stream_df.writeStream.foreachBatch(self._handle_batch)
            .option("checkpointLocation", self.checkpoint_dir)
            .outputMode("update")
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()


def stream_tumbling_counts(
    stream_df: DataFrame,
    ts_col: str,
    duration: str,
    watermark_delay: str,
    agg_exprs: Sequence[Column] | None = None,
    extra_group: Sequence[str] = (),
) -> DataFrame:
    """Streaming tumbling-window aggregate with late-data handling.

    The watermark bounds state exactly like the reference bounds its
    incremental window with the stored rowversion (T1/T4): rows later
    than ``watermark_delay`` behind the max event time are dropped from
    state instead of widening it forever.
    """
    aggs = list(agg_exprs) if agg_exprs else [F.count("*").alias("cnt")]
    win = F.window(F.col(ts_col), duration)
    res = (
        stream_df.withWatermark(ts_col, watermark_delay)
        .groupBy(win.alias("w"), *extra_group)
        .agg(*aggs)
    )
    others = [c for c in res.columns if c != "w"]
    return res.select(
        F.col("w.start").alias("window_start"), F.col("w.end").alias("window_end"), *others
    )
