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
        # a micro-batch is a DELTA, not a snapshot window — upsert by
        # key; rows carrying a true `__deleted` tombstone delete theirs
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


def stateful_sessionize(
    stream_df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    gap_seconds: int = 1800,
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Custom stateful operator: event-time sessionization with
    ``applyInPandasWithState`` — the surface Spark's built-in
    ``session_window`` cannot cover when per-session custom state or
    emission logic is needed.

    Per key, events are folded into gap-separated sessions; a session
    closes (and emits) either when a later event arrives beyond the gap,
    or when the event-time timeout fires after the watermark passes
    session_end + gap. State per key is three scalars — bounded
    regardless of corpus size — and the watermark bounds how long it
    lives, exactly like the reference bounds its incremental window with
    the stored rowversion (T1/T4).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = (
        f"{key_col} long, session_start timestamp, session_end timestamp, n_events long"
    )
    state_schema = "start_us long, end_us long, cnt long"
    gap_us = gap_seconds * 1_000_000

    def _emit(key, start_us: int, end_us: int, cnt: int):
        return pd.DataFrame(
            {
                key_col: [key],
                "session_start": [pd.Timestamp(start_us, unit="us")],
                "session_end": [pd.Timestamp(end_us, unit="us")],
                "n_events": [cnt],
            }
        )

    def fn(key, pdfs, state: GroupState):
        (k,) = key
        if state.hasTimedOut:
            start_us, end_us, cnt = state.get
            state.remove()
            yield _emit(k, start_us, end_us, cnt)
            return
        ts_us = []
        for pdf in pdfs:
            ts_us.extend(int(t.value // 1000) for t in pd.to_datetime(pdf[ts_col]))
        if not ts_us:
            return
        ts_us.sort()
        if state.exists:
            start_us, end_us, cnt = state.get
        else:
            start_us, end_us, cnt = ts_us[0], ts_us[0], 0
        for t in ts_us:
            if t - end_us > gap_us:
                yield _emit(k, start_us, end_us, cnt)
                start_us, end_us, cnt = t, t, 1
            else:
                end_us = max(end_us, t)
                cnt += 1
        state.update((start_us, end_us, cnt))
        # close the open session once the watermark passes end + gap
        state.setTimeoutTimestamp((end_us + gap_us) // 1000)

    return (
        stream_df.withWatermark(ts_col, watermark_delay)
        .groupBy(key_col)
        .applyInPandasWithState(
            fn,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
