"""Structured Streaming: micro-batch CDC merge + watermarked window aggs."""

from __future__ import annotations

import datetime as dt
import os

from d365fo_db_sync_spark.sinks import ParquetTarget
from d365fo_db_sync_spark.state import StateStore
from d365fo_db_sync_spark.streaming import CdcStreamPipeline, stream_tumbling_counts
from d365fo_db_sync_spark.sync import SyncConfig, SyncEngine

SCHEMA = "RecId long, RECVERSION int, SysRowVersion long, AMOUNT double"


def test_cdc_stream_merges_batches(spark, tmp_path):
    src_dir = str(tmp_path / "incoming")
    os.makedirs(src_dir)
    store = StateStore(str(tmp_path / "state.json"))
    engine = SyncEngine(spark, store, SyncConfig(record_count=1000))
    target = ParquetTarget(str(tmp_path / "tgt"))
    pipe = CdcStreamPipeline(engine, "T", target, str(tmp_path / "ckpt"))

    # batch 1: initial snapshot lands in the source directory
    b1 = spark.createDataFrame([(i, 2, 100 + i, float(i)) for i in range(20)], SCHEMA)
    b1.write.mode("append").parquet(src_dir)
    stream = spark.readStream.schema(b1.schema).parquet(src_dir)
    q = pipe.start(stream, available_now=True)
    q.awaitTermination(120)
    assert sorted(r["RecId"] for r in target.read(spark).collect()) == list(range(20))

    # batch 2: a delta file appears -> merged idempotently on the key
    b2 = spark.createDataFrame([(5, 3, 500, 99.0), (100, 2, 501, 1.0)], SCHEMA)
    b2.write.mode("append").parquet(src_dir)
    q2 = pipe.start(spark.readStream.schema(b1.schema).parquet(src_dir), available_now=True)
    q2.awaitTermination(120)
    got = {r["RecId"]: r["AMOUNT"] for r in target.read(spark).collect()}
    assert got[5] == 99.0  # modified row replaced
    assert got[100] == 1.0  # new row inserted
    assert len(got) == 21  # nothing duplicated (T5 idempotence)


def test_stream_tumbling_counts_matches_batch(spark, tmp_path):
    src_dir = str(tmp_path / "ev")
    base = dt.datetime(2024, 1, 1)
    rows = [(i, base + dt.timedelta(minutes=7 * i), float(i)) for i in range(100)]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, value double")
    df.write.parquet(src_dir)

    stream = spark.readStream.schema(df.schema).parquet(src_dir)
    agg = stream_tumbling_counts(stream, "ts", "1 hour", "10 minutes")
    out_dir = str(tmp_path / "out")
    q = (
        agg.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    # Streaming append emits only windows closed by the watermark; every
    # emitted window must match the batch computation exactly.
    got = {
        r["window_start"]: r["cnt"]
        for r in spark.read.parquet(out_dir).collect()
    }
    from pyspark.sql import functions as F

    expected = {
        r["w"]["start"]: r["cnt"]
        for r in df.groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    assert got
    for k, v in got.items():
        assert expected[k] == v


def test_stateful_sessionize_emits_closed_sessions(spark, tmp_path):
    from d365fo_db_sync_spark.streaming import stateful_sessionize

    src_dir = str(tmp_path / "sess_src")
    os.makedirs(src_dir)
    base = dt.datetime(2024, 3, 1, 8, 0, 0)
    schema = "user_id long, ts timestamp"

    # user 1: two sessions separated by > gap; user 2: one session
    batch1 = spark.createDataFrame(
        [
            (1, base), (1, base + dt.timedelta(minutes=5)),
            (1, base + dt.timedelta(hours=3)),
            (2, base + dt.timedelta(minutes=1)),
        ],
        schema,
    )
    batch1.write.mode("append").parquet(src_dir)

    def drain():
        stream = spark.readStream.schema(batch1.schema).parquet(src_dir)
        out = stateful_sessionize(stream, gap_seconds=1800, watermark_delay="1 minute")
        q = (
            out.writeStream.format("parquet")
            .option("path", str(tmp_path / "sess_out"))
            .option("checkpointLocation", str(tmp_path / "sess_ckpt"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    drain()
    # sentinel far in the future advances the watermark so the remaining
    # open sessions time out and emit on the next run
    spark.createDataFrame(
        [(99, base + dt.timedelta(days=2))], schema
    ).write.mode("append").parquet(src_dir)
    drain()

    rows = spark.read.parquet(str(tmp_path / "sess_out")).collect()
    sessions = {(r["user_id"], r["n_events"]) for r in rows}
    assert (1, 2) in sessions  # first session of user 1 (2 events)
    assert (1, 1) in sessions  # second session of user 1
    assert (2, 1) in sessions  # user 2's only session


def test_cdc_merge_tombstones_delete_keys(spark, tmp_path):
    from pyspark.sql import functions as F

    store = StateStore(str(tmp_path / "ts_state.json"))
    engine = SyncEngine(spark, store, SyncConfig())
    target = ParquetTarget(str(tmp_path / "ts_tgt"))

    base = spark.createDataFrame(
        [(i, 2, 100 + i, float(i)) for i in range(10)], SCHEMA
    )
    engine.merge_upsert("T", base, target)

    batch = spark.createDataFrame(
        [(3, 3, 500, 99.0, True), (4, 3, 501, 44.0, False), (77, 2, 502, 7.0, True)],
        SCHEMA + ", __deleted boolean",
    )
    rpt = engine.merge_upsert("T", batch, target)
    got = {r["RecId"]: r["AMOUNT"] for r in target.read(spark).collect()}
    assert 3 not in got  # tombstoned
    assert got[4] == 44.0  # upserted
    assert 77 not in got  # delete of absent key is a no-op
    assert rpt.deleted == 2 and rpt.inserted == 1
    assert len(got) == 9


def test_stream_dedup_keys_collapses_replays(spark, tmp_path):
    from d365fo_db_sync_spark.streaming import stream_dedup_keys

    src_dir = str(tmp_path / "dup_src")
    base = dt.datetime(2024, 5, 1)
    schema = "RecId long, ts timestamp, v double"
    # the same keys delivered twice (at-least-once upstream)
    rows = [(i, base + dt.timedelta(minutes=i), float(i)) for i in range(10)]
    df = spark.createDataFrame(rows + rows[:5], schema)
    df.write.parquet(src_dir)

    stream = spark.readStream.schema(df.schema).parquet(src_dir)
    out = stream_dedup_keys(stream, ["RecId"], "ts", "30 minutes")
    out_dir = str(tmp_path / "dup_out")
    q = (
        out.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "dup_ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = [r["RecId"] for r in spark.read.parquet(out_dir).collect()]
    assert sorted(got) == list(range(10))  # one row per key, no replays


def test_stream_sliding_and_session_counts_match_batch(spark, tmp_path):
    from pyspark.sql import functions as F

    from d365fo_db_sync_spark.streaming import (
        stream_session_counts,
        stream_sliding_counts,
    )

    src_dir = str(tmp_path / "sw_src")
    base = dt.datetime(2024, 6, 1)
    # two users, bursts separated by quiet gaps
    rows = [
        (u, base + dt.timedelta(minutes=m))
        for u in (1, 2)
        for m in [0, 3, 6, 60, 63, 200]
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    df.write.parquet(src_dir)

    def drain(out, name):
        q = (
            out.writeStream.format("parquet")
            .option("path", str(tmp_path / f"{name}_out"))
            .option("checkpointLocation", str(tmp_path / f"{name}_ckpt"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return spark.read.parquet(str(tmp_path / f"{name}_out"))

    stream = spark.readStream.schema(df.schema).parquet(src_dir)
    slid = drain(
        stream_sliding_counts(stream, "ts", "10 minutes", "5 minutes", "1 minute"),
        "slid",
    )
    expected = {
        (r["w"]["start"], r["cnt"])
        for r in df.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    got = {(r["window_start"], r["cnt"]) for r in slid.collect()}
    assert got and got <= expected  # append emits only watermark-closed windows

    stream2 = spark.readStream.schema(df.schema).parquet(src_dir)
    sess = drain(
        stream_session_counts(stream2, "ts", "30 minutes", "1 minute", ["user_id"]),
        "sess",
    )
    sess_expected = {
        (r["user_id"], r["w"]["start"], r["cnt"])
        for r in df.groupBy(
            F.session_window("ts", "30 minutes").alias("w"), "user_id"
        )
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    sess_got = {(r["user_id"], r["session_start"], r["cnt"]) for r in sess.collect()}
    assert sess_got and sess_got <= sess_expected


def test_stream_interval_join_bounded_state(spark, tmp_path):
    from d365fo_db_sync_spark.streaming import stream_interval_join

    base = dt.datetime(2024, 7, 1)
    p_dir, i_dir = str(tmp_path / "pts"), str(tmp_path / "ivs")
    pts = spark.createDataFrame(
        [(i, base + dt.timedelta(minutes=10 * i)) for i in range(12)],
        "pid long, pts timestamp",
    )
    ivs = spark.createDataFrame(
        [
            (0, base, base + dt.timedelta(minutes=25)),
            (1, base + dt.timedelta(minutes=40), base + dt.timedelta(minutes=70)),
        ],
        "iid long, s timestamp, e timestamp",
    )
    pts.write.parquet(p_dir)
    ivs.write.parquet(i_dir)

    out = stream_interval_join(
        spark.readStream.schema(pts.schema).parquet(p_dir),
        spark.readStream.schema(ivs.schema).parquet(i_dir),
        "pts", "s", "e",
        point_watermark="1 minute",
        interval_watermark="2 hours",
    )
    out_dir = str(tmp_path / "ij_out")
    q = (
        out.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ij_ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {(r["pid"], r["iid"]) for r in spark.read.parquet(out_dir).collect()}
    naive = {
        (p["pid"], i["iid"])
        for p in pts.collect()
        for i in ivs.collect()
        if i["s"] <= p["pts"] < i["e"]
    }
    assert got == naive and len(naive) > 0


def test_stream_curation_filter_matches_batch(spark, tmp_path):
    """The curation expressions (quality features + deterministic hash
    sampling) are STATELESS column expressions, so the identical code
    runs under readStream and admits exactly the same rows the batch
    pipeline admits — streaming ingest curation needs no second
    implementation."""
    from pyspark.sql import functions as F

    from d365fo_db_sync_spark.operators.sampling import hash_sample
    from d365fo_db_sync_spark.operators.text import quality_features

    rows = [
        (i, ("tok " * (5 + i % 40)).strip() + (" x!!" if i % 7 == 0 else ""))
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    src_dir = str(tmp_path / "src")
    df.write.parquet(src_dir)

    def curate(frame):
        kept = quality_features(frame, "text").filter(
            (F.col("n_tokens") >= 10) & (F.col("punct_ratio") <= 0.05)
        )
        return hash_sample(kept, ["doc_id"], 0.5).select("doc_id")

    batch_ids = {r["doc_id"] for r in curate(df).collect()}

    stream = spark.readStream.schema(df.schema).parquet(src_dir)
    out_dir, cp = str(tmp_path / "out"), str(tmp_path / "cp")
    q = (
        curate(stream)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", cp)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    stream_ids = {r["doc_id"] for r in spark.read.parquet(out_dir).collect()}
    assert stream_ids == batch_ids
    assert 0 < len(batch_ids) < 300


def test_cdc_stream_merges_into_bucketed_target(spark, tmp_path):
    """The streaming CDC pipeline routes each micro-batch through
    merge_upsert, which auto-selects the partial-rewrite path on a
    BucketedParquetTarget — stream merges get bucket-scoped rewrites
    with no pipeline changes."""
    from pyspark.sql import functions as F

    from d365fo_db_sync_spark.sinks import BucketedParquetTarget
    from d365fo_db_sync_spark.state import StateStore
    from d365fo_db_sync_spark.streaming import CdcStreamPipeline
    from d365fo_db_sync_spark.sync import SyncConfig, SyncEngine

    b1 = spark.createDataFrame(
        [(i, 100 + i, float(i), False) for i in range(30)],
        "RecId long, SysRowVersion long, AMOUNT double, __deleted boolean",
    )
    src_dir = str(tmp_path / "src")
    b1.write.parquet(src_dir)

    engine = SyncEngine(spark, StateStore(str(tmp_path / "s.json")), SyncConfig())
    target = BucketedParquetTarget(str(tmp_path / "tgt"), key="RecId", n_buckets=8)
    pipe = CdcStreamPipeline(engine, "TS", target, str(tmp_path / "cp"))
    pipe.start(
        spark.readStream.schema(b1.schema).parquet(src_dir), available_now=True
    ).awaitTermination(120)
    assert target.read(spark).count() == 30

    # second micro-batch: one update + one tombstone
    spark.createDataFrame(
        [(3, 500, 99.0, False), (7, 501, None, True)], b1.schema
    ).write.mode("append").parquet(src_dir)
    pipe.start(
        spark.readStream.schema(b1.schema).parquet(src_dir), available_now=True
    ).awaitTermination(120)
    got = {r["RecId"]: r["AMOUNT"] for r in target.read(spark).collect()}
    assert got[3] == 99.0 and 7 not in got and len(got) == 29
    assert "__kb" not in target.read(spark).columns


def test_dedup_stream_pipeline_cross_batch(spark, tmp_path):
    """Continuous ingestion dedup: a second micro-batch's duplicates of
    the first are filtered by the persisted index; only novel rows reach
    the callback."""
    import os as _os

    from d365fo_db_sync_spark.sinks import BucketedParquetTarget
    from d365fo_db_sync_spark.streaming import DedupStreamPipeline

    src_dir = str(tmp_path / "docs_in")
    _os.makedirs(src_dir)
    schema = "doc_id long, fp string, text string"
    idx = BucketedParquetTarget(str(tmp_path / "idx"), key="fp", n_buckets=8)
    seen: dict[int, set[int]] = {}

    def on_novel(df, batch_id):
        seen.setdefault(batch_id, set()).update(r["doc_id"] for r in df.collect())

    pipe = DedupStreamPipeline(idx, str(tmp_path / "ckpt"), on_novel=on_novel)

    b1 = spark.createDataFrame([(1, "a", "x"), (2, "b", "y"), (3, "a", "x")], schema)
    b1.write.mode("append").parquet(src_dir)
    q = pipe.start(spark.readStream.schema(b1.schema).parquet(src_dir))
    q.awaitTermination(120)

    b2 = spark.createDataFrame([(10, "b", "y"), (11, "c", "z")], schema)
    b2.write.mode("append").parquet(src_dir)
    q2 = pipe.start(spark.readStream.schema(b1.schema).parquet(src_dir))
    q2.awaitTermination(120)

    novel_all = set().union(*seen.values())
    assert novel_all == {1, 2, 11}  # 3 = in-batch dup, 10 = cross-batch dup
    assert {(r["fp"], r["doc_id"]) for r in idx.read(spark).collect()} == {
        ("a", 1), ("b", 2), ("c", 11),
    }


def test_cdc_file_source_rate_limited_drain(spark, tmp_path):
    """maxFilesPerTrigger=1 must split an availableNow drain into one
    micro-batch per staged file — the backpressure contract: a backlog
    never arrives as one giant merge."""
    from d365fo_db_sync_spark.streaming import cdc_file_source

    src_dir = str(tmp_path / "incoming")
    os.makedirs(src_dir)
    store = StateStore(str(tmp_path / "state.json"))
    engine = SyncEngine(spark, store, SyncConfig(record_count=1000))
    target = ParquetTarget(str(tmp_path / "tgt"))
    pipe = CdcStreamPipeline(engine, "T", target, str(tmp_path / "ckpt"))

    for f in range(4):
        spark.createDataFrame(
            [(f * 10 + i, 2, 100 + f * 10 + i, float(i)) for i in range(5)], SCHEMA
        ).coalesce(1).write.mode("append").parquet(src_dir)

    batches = []
    orig = pipe._handle_batch
    pipe._handle_batch = lambda df, bid: (batches.append(bid), orig(df, bid))[1]

    stream = cdc_file_source(
        spark, src_dir, SCHEMA, max_files_per_trigger=1
    )
    q = pipe.start(stream, available_now=True)
    q.awaitTermination(180)

    assert len(batches) >= 4  # one batch per file, not one big batch
    got = sorted(r["RecId"] for r in target.read(spark).collect())
    assert got == sorted(f * 10 + i for f in range(4) for i in range(5))


def test_cdc_file_source_archives_consumed_files(spark, tmp_path):
    """cleanSource=archive moves drained files out of the staging dir —
    the reference's clear-staging-after-cycle behavior."""
    from d365fo_db_sync_spark.streaming import cdc_file_source

    src_dir = str(tmp_path / "incoming")
    archive = str(tmp_path / "done")
    os.makedirs(src_dir)
    store = StateStore(str(tmp_path / "state.json"))
    engine = SyncEngine(spark, store, SyncConfig(record_count=1000))
    target = ParquetTarget(str(tmp_path / "tgt"))
    pipe = CdcStreamPipeline(engine, "T", target, str(tmp_path / "ckpt"))

    spark.createDataFrame(
        [(i, 2, 100 + i, float(i)) for i in range(5)], SCHEMA
    ).coalesce(1).write.mode("append").parquet(src_dir)

    stream = cdc_file_source(
        spark, src_dir, SCHEMA, clean_source="archive", archive_dir=archive
    )
    q = pipe.start(stream, available_now=True)
    q.awaitTermination(180)
    assert len(target.read(spark).collect()) == 5

    # Spark's source cleaner archives a file only on a LATER cycle than
    # the one that read it — stage a second file and drain again so the
    # first becomes eligible, then poll (the cleaner thread is async).
    spark.createDataFrame(
        [(10 + i, 2, 200 + i, float(i)) for i in range(3)], SCHEMA
    ).coalesce(1).write.mode("append").parquet(src_dir)
    q2 = pipe.start(
        cdc_file_source(
            spark, src_dir, SCHEMA, clean_source="archive", archive_dir=archive
        ),
        available_now=True,
    )
    q2.awaitTermination(180)
    assert len(target.read(spark).collect()) == 8

    import glob
    import time as _time

    archived = []
    for _ in range(20):
        archived = glob.glob(f"{archive}/**/*.parquet", recursive=True)
        if archived:
            break
        _time.sleep(0.5)
    assert archived, "consumed staging file was not archived"


def test_dedup_stream_with_bloom_matches_plain(spark, tmp_path):
    """The bloom-gated pipeline must converge the index and report the
    same novel sets as the plain pipeline, persist its sidecar next to
    the index, and keep the sidecar a SUPERSET of the index's
    fingerprints (the soundness contract) across restarts."""
    import os as _os

    from d365fo_db_sync_spark.operators import bloom as bloom_mod
    from d365fo_db_sync_spark.sinks import BucketedParquetTarget
    from d365fo_db_sync_spark.streaming import DedupStreamPipeline

    src_dir = str(tmp_path / "docs_in")
    _os.makedirs(src_dir)
    schema = "doc_id long, fp string, text string"
    idx = BucketedParquetTarget(str(tmp_path / "idx"), key="fp", n_buckets=8)
    seen: dict[int, set[int]] = {}

    def on_novel(df, batch_id):
        seen.setdefault(batch_id, set()).update(r["doc_id"] for r in df.collect())

    pipe = DedupStreamPipeline(
        idx, str(tmp_path / "ckpt"), on_novel=on_novel, use_bloom=True,
        bloom_m_bits=1 << 12,
    )

    b1 = spark.createDataFrame([(1, "a", "x"), (2, "b", "y"), (3, "a", "x")], schema)
    b1.write.mode("append").parquet(src_dir)
    q = pipe.start(spark.readStream.schema(b1.schema).parquet(src_dir))
    q.awaitTermination(120)

    # restart with a FRESH pipeline object: the bloom must come back
    # from the sidecar, not driver memory
    pipe2 = DedupStreamPipeline(
        idx, str(tmp_path / "ckpt"), on_novel=on_novel, use_bloom=True,
        bloom_m_bits=1 << 12,
    )
    b2 = spark.createDataFrame([(10, "b", "y"), (11, "c", "z")], schema)
    b2.write.mode("append").parquet(src_dir)
    q2 = pipe2.start(spark.readStream.schema(b1.schema).parquet(src_dir))
    q2.awaitTermination(120)

    novel_all = set().union(*seen.values())
    assert novel_all == {1, 2, 11}
    assert {(r["fp"], r["doc_id"]) for r in idx.read(spark).collect()} == {
        ("a", 1), ("b", 2), ("c", 11),
    }
    # sidecar exists and is a superset of the index fingerprints
    loaded = bloom_mod.load(str(tmp_path / "idx" / "_bloom.json"))
    assert loaded is not None
    bf, stamp = loaded
    hits = idx.read(spark).filter(bloom_mod.might_contain(bf, "fp")).count()
    assert hits == 3  # zero false negatives over the whole index
    # post-merge restamp points at the live index version
    import os as _os2

    assert stamp == _os2.path.basename(idx.current_path())


def test_dedup_stream_bloom_detects_stale_sidecar(spark, tmp_path):
    """An index advanced WITHOUT bloom maintenance must not be trusted:
    the version stamp mismatches, the pipeline rebuilds the bloom from
    the live index, and the cross-batch duplicate is still caught."""
    import os as _os

    from d365fo_db_sync_spark.operators import dedup as dedup_mod
    from d365fo_db_sync_spark.sinks import BucketedParquetTarget
    from d365fo_db_sync_spark.streaming import DedupStreamPipeline

    src_dir = str(tmp_path / "docs_in")
    _os.makedirs(src_dir)
    schema = "doc_id long, fp string, text string"
    idx = BucketedParquetTarget(str(tmp_path / "idx"), key="fp", n_buckets=8)
    seen: set[int] = set()

    pipe = DedupStreamPipeline(
        idx, str(tmp_path / "ckpt"),
        on_novel=lambda df, _b: seen.update(r["doc_id"] for r in df.collect()),
        use_bloom=True, bloom_m_bits=1 << 12,
    )
    b1 = spark.createDataFrame([(1, "a", "x"), (2, "b", "y")], schema)
    b1.write.mode("append").parquet(src_dir)
    pipe.start(spark.readStream.schema(b1.schema).parquet(src_dir)).awaitTermination(120)

    # advance the index OUT OF BAND (no bloom maintenance): fp "c" lands
    # in the index while the sidecar still stamps the old version
    dedup_mod.ingest_batch(
        spark,
        spark.createDataFrame([(50, "c", "z")], schema),
        idx,
    )

    pipe2 = DedupStreamPipeline(
        idx, str(tmp_path / "ckpt"),
        on_novel=lambda df, _b: seen.update(r["doc_id"] for r in df.collect()),
        use_bloom=True, bloom_m_bits=1 << 12,
    )
    # fp "c" again (a duplicate vs the out-of-band row) + a novel "d"
    b2 = spark.createDataFrame([(60, "c", "z"), (61, "d", "w")], schema)
    b2.write.mode("append").parquet(src_dir)
    pipe2.start(spark.readStream.schema(b1.schema).parquet(src_dir)).awaitTermination(120)

    assert 60 not in seen  # the stale-bloom path would have let this through
    assert 61 in seen
    assert {r["fp"] for r in idx.read(spark).collect()} == {"a", "b", "c", "d"}


def test_dedup_stream_novel_dir_exactly_once(spark, tmp_path):
    """The novel_dir file protocol delivers each batch's novel set
    exactly once: staged before the merge, keyed by batch, idempotent
    on replay, and readable back as one hive-partitioned frame."""
    import os as _os

    from d365fo_db_sync_spark.sinks import BucketedParquetTarget
    from d365fo_db_sync_spark.streaming import DedupStreamPipeline

    src_dir = str(tmp_path / "docs_in")
    _os.makedirs(src_dir)
    schema = "doc_id long, fp string, text string"
    idx = BucketedParquetTarget(str(tmp_path / "idx"), key="fp", n_buckets=8)
    novel_dir = str(tmp_path / "novel")
    _os.makedirs(novel_dir)

    pipe = DedupStreamPipeline(
        idx, str(tmp_path / "ckpt"), novel_dir=novel_dir
    )
    b1 = spark.createDataFrame([(1, "a", "x"), (2, "b", "y"), (3, "a", "x")], schema)
    b1.write.mode("append").parquet(src_dir)
    pipe.start(spark.readStream.schema(b1.schema).parquet(src_dir)).awaitTermination(120)

    b2 = spark.createDataFrame([(10, "b", "y"), (11, "c", "z")], schema)
    b2.write.mode("append").parquet(src_dir)
    pipe.start(spark.readStream.schema(b1.schema).parquet(src_dir)).awaitTermination(120)

    out = pipe.read_novel(spark)
    rows = {(r["batch_id"], r["doc_id"]) for r in out.collect()}
    assert rows == {(0, 1), (0, 2), (1, 11)}

    # a replayed/pre-staged batch dir is never rewritten: plant a marker
    marker = _os.path.join(novel_dir, "batch_id=0", "_marker")
    open(marker, "w").close()

    def stage_again():
        # drive _handle_batch directly with batch 0's frame (what a
        # checkpoint replay does); the existing dir must short-circuit
        pipe._handle_batch(b1, 0)

    stage_again()
    assert _os.path.exists(marker)
    # and nothing doubled
    out2 = {(r["batch_id"], r["doc_id"]) for r in pipe.read_novel(spark).collect()}
    assert out2 == rows
    # no leftover _tmp staging dirs
    assert not [d for d in _os.listdir(novel_dir) if d.startswith("_tmp-")]


def test_cdc_stream_restart_evolves_schema(spark, tmp_path):
    """The restart-after-upstream-schema-change story: a stream built
    on schema A populates the target; the upstream adds a column, the
    query restarts with the widened schema and evolve_schema=True, and
    the first merged batch widens the target in place — pre-existing
    rows read the new column as NULL, no backfill rewrite."""
    from d365fo_db_sync_spark.sinks import BucketedParquetTarget
    from d365fo_db_sync_spark.state import StateStore
    from d365fo_db_sync_spark.streaming import CdcStreamPipeline
    from d365fo_db_sync_spark.sync import SyncConfig, SyncEngine

    v1 = spark.createDataFrame(
        [(i, 100 + i, float(i), False) for i in range(20)],
        "RecId long, SysRowVersion long, AMOUNT double, __deleted boolean",
    )
    src_v1, src_v2 = str(tmp_path / "v1"), str(tmp_path / "v2")
    v1.write.parquet(src_v1)

    engine = SyncEngine(spark, StateStore(str(tmp_path / "s.json")), SyncConfig())
    target = BucketedParquetTarget(str(tmp_path / "tgt"), key="RecId", n_buckets=4)
    pipe = CdcStreamPipeline(
        engine, "TS", target, str(tmp_path / "cp1"), evolve_schema=True
    )
    pipe.start(
        spark.readStream.schema(v1.schema).parquet(src_v1), available_now=True
    ).awaitTermination(120)
    assert target.read(spark).columns == ["RecId", "SysRowVersion", "AMOUNT"]

    # upstream widens: CURRENCY arrives; the restarted query reads v2
    v2 = spark.createDataFrame(
        [(3, 500, 9.9, "EUR", False), (100, 501, 1.0, "USD", False)],
        "RecId long, SysRowVersion long, AMOUNT double, CURRENCY string,"
        " __deleted boolean",
    )
    v2.write.parquet(src_v2)
    pipe2 = CdcStreamPipeline(
        engine, "TS", target, str(tmp_path / "cp2"), evolve_schema=True
    )
    pipe2.start(
        spark.readStream.schema(v2.schema).parquet(src_v2), available_now=True
    ).awaitTermination(120)

    rows = {r["RecId"]: r for r in target.read(spark).collect()}
    assert "CURRENCY" in target.read(spark).columns
    assert rows[3]["CURRENCY"] == "EUR" and rows[3]["AMOUNT"] == 9.9
    assert rows[100]["CURRENCY"] == "USD"
    assert rows[5]["CURRENCY"] is None  # old row NULL-backfilled
    assert len(rows) == 21


def test_heavy_hitter_stream_matches_batch_and_bounds(spark, tmp_path):
    """HeavyHitterStreamPipeline: after draining micro-batches, exact()
    equals the batch operator on the full corpus; bounds() brackets
    every true count and never rules out a true heavy hitter; a
    replayed batch is a summary no-op."""
    import os

    from d365fo_db_sync_spark.operators.text import heavy_hitters_exact, tokens
    from d365fo_db_sync_spark.streaming import HeavyHitterStreamPipeline

    src_dir = str(tmp_path / "docs_in")
    os.makedirs(src_dir)
    rows = []
    # "alpha" heavy overall; "beta" heavy only in the second wave; a
    # long singleton tail no slice should emit
    for i in range(30):
        rows.append((i, "alpha alpha tail%d" % i))
    for i in range(30, 45):
        rows.append((i, "beta beta beta alpha w%d" % i))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    docs.filter("doc_id < 30").coalesce(1).write.mode("append").parquet(src_dir)
    docs.filter("doc_id >= 30").coalesce(1).write.mode("append").parquet(src_dir)

    k = 8
    pipe = HeavyHitterStreamPipeline(
        str(tmp_path / "summ"), str(tmp_path / "ckpt"), text_col="text", k=k
    )
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    q = pipe.start(stream, available_now=True)
    q.awaitTermination(120)

    want = {
        (r["token"], r["cnt"], r["n_total"])
        for r in heavy_hitters_exact(docs, "text", k=k).collect()
    }
    got = {
        (r["token"], r["cnt"], r["n_total"])
        for r in pipe.exact(spark, docs).collect()
    }
    assert got == want and any(t == "alpha" for t, _, _ in got)

    from pyspark.sql import functions as F

    true_counts = {
        r["token"]: r["cnt"]
        for r in docs.select(F.explode(tokens("text")).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    n_total = sum(true_counts.values())
    bounds = pipe.bounds(spark).collect()
    heavy = {t for t, _, _ in want}
    seen_status = {}
    for r in bounds:
        assert r["n_total"] == n_total
        assert r["lower"] <= true_counts[r["token"]] <= r["upper"], r
        seen_status[r["token"]] = r["status"]
    for t in heavy:  # a true heavy hitter is never ruled out
        assert seen_status[t] in ("confirmed", "possible"), (t, seen_status[t])
    # at least the dominant token is confirmed without any corpus scan
    assert seen_status["alpha"] == "confirmed"

    # replay idempotency, both layers: a restarted query re-delivering
    # an already-published batch_id must be a summary no-op (the
    # batch-dir skip, called directly to bypass the checkpoint ledger),
    # while a genuinely new batch id still lands
    n_slices = pipe.summary(spark).count()
    pipe._handle_batch(docs, 0)  # replayed delivery of batch 0
    assert pipe.summary(spark).count() == n_slices
    pipe._handle_batch(docs.limit(3), 99)
    after_new = pipe.summary(spark).count()
    assert after_new > n_slices
    q2 = pipe.start(  # and the checkpoint ledger re-drains nothing
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir),
        available_now=True,
    )
    q2.awaitTermination(120)
    assert pipe.summary(spark).count() == after_new


def test_rollup_stream_pipeline_retractions_and_replay(spark, tmp_path):
    """RollupStreamPipeline: a CDC stream with retraction rows folds
    exactly (update = -old +new), a replayed batch id is a no-op, and
    the maintained view matches the from-scratch recompute."""
    from d365fo_db_sync_spark.operators.ivm import SIGN_COL, rollup_full
    from d365fo_db_sync_spark.streaming import RollupStreamPipeline

    pipe = RollupStreamPipeline(
        str(tmp_path / "view"), str(tmp_path / "ckpt"), ["g"], ["v"]
    )
    schema = f"g string, v double, {SIGN_COL} int"
    b0 = spark.createDataFrame(
        [("a", 1.5, 1), ("a", 2.0, 1), ("b", 4.0, 1)], schema
    )
    b1 = spark.createDataFrame(
        [("a", 1.5, -1), ("a", 10.0, 1), ("b", 4.0, -1)], schema
    )
    pipe._handle_batch(b0, 0)
    pipe._handle_batch(b1, 1)
    pipe._handle_batch(b1, 1)  # replay: must not double-apply

    got = {
        r["g"]: (r["cnt"], float(r["sum_v"]))
        for r in pipe.view(spark).collect()
    }
    # b drained to zero count and dropped; a = {2.0, 10.0}
    assert got == {"a": (2, 12.0)}

    final_rows = spark.createDataFrame([("a", 2.0), ("a", 10.0)], "g string, v double")
    want = {
        r["g"]: (r["cnt"], float(r["sum_v"]))
        for r in rollup_full(final_rows, ["g"], ["v"]).collect()
    }
    assert got == want


def test_streaming_drain_races_batch_merge_occ(spark, tmp_path):
    """Streaming x OCC composition: one CdcStreamPipeline micro-batch
    drain and one concurrent batch merge_upsert contend on the SAME
    ManifestParquetTarget. A barrier pins the contended interleaving
    (both writers derive their carried references from the same parent
    version before either publishes); the manifest CAS arbitrates:
    exactly one publish wins the version, the loser's bounded
    merge_upsert retry re-derives and converges, the streaming query
    finishes without an exception, and the final state is lossless and
    value-exact. Two independent engines/state stores — only the
    target is shared, the realistic two-jobs-one-table shape."""
    import threading

    from d365fo_db_sync_spark.sinks import ManifestParquetTarget

    # retain 3 versions so the version log keeps the full race history
    # visible (the default window of 1 GCs the loser's parent away)
    target = ManifestParquetTarget(
        str(tmp_path / "tgt"), key="RecId", n_buckets=8, retain_versions=3
    )
    base = spark.createDataFrame(
        [(i, 2, 100 + i, float(i)) for i in range(100)], SCHEMA
    )
    target.overwrite(base)
    v_before = len(target.versions())

    eng_s = SyncEngine(spark, StateStore(str(tmp_path / "s_stream.json")), SyncConfig())
    eng_b = SyncEngine(spark, StateStore(str(tmp_path / "s_batch.json")), SyncConfig())

    src_dir = str(tmp_path / "incoming")
    os.makedirs(src_dir)
    stream_batch = spark.createDataFrame(
        [(i, 3, 900 + i, 50.0) for i in range(1000, 1005)], SCHEMA
    )
    stream_batch.write.mode("append").parquet(src_dir)
    batch_rows = spark.createDataFrame(
        [(i, 3, 800 + i, 70.0) for i in range(2000, 2005)], SCHEMA
    )

    both_derived = threading.Barrier(2, timeout=180)
    real_write = ManifestParquetTarget._write_version
    tlocal = threading.local()
    write_calls: list[int] = []

    def gated_write(self, *a, **kw):
        write_calls.append(1)
        if getattr(tlocal, "armed", True):
            tlocal.armed = False
            both_derived.wait()  # both writers derived from one parent
        return real_write(self, *a, **kw)

    pipe = CdcStreamPipeline(eng_s, "T_STREAM", target, str(tmp_path / "ckpt"))
    ManifestParquetTarget._write_version = gated_write
    try:
        q = pipe.start(
            spark.readStream.schema(stream_batch.schema).parquet(src_dir),
            available_now=True,
        )
        # the batch writer contends from the test thread while the
        # micro-batch merge runs on the streaming execution thread
        eng_b.merge_upsert("T_BATCH", batch_rows, target)
        q.awaitTermination(300)
        assert q.exception() is None
    finally:
        ManifestParquetTarget._write_version = real_write

    # exactly one commit per version: winner published once, loser's
    # single bounded retry published the next version (3 staged writes
    # total), and the version log advanced by exactly two, no gaps
    assert len(write_calls) == 3
    assert len(target.versions()) == v_before + 2

    got = {r["RecId"]: r["AMOUNT"] for r in target.read(spark).collect()}
    assert set(got) == set(range(100)) | set(range(1000, 1005)) | set(
        range(2000, 2005)
    )
    assert all(got[i] == 50.0 for i in range(1000, 1005))
    assert all(got[i] == 70.0 for i in range(2000, 2005))
    assert all(got[i] == float(i) for i in range(100))


def test_drift_monitor_stream_matches_batch_psi(spark, tmp_path):
    """DriftMonitorPipeline: after draining rate-limited micro-batches,
    psi_view equals the BATCH operators.drift.psi over the
    concatenated stream (bin counts fold exactly); a replayed batch id
    is a sidecar no-op; reference edges stay frozen."""
    import os

    from d365fo_db_sync_spark.operators.drift import psi
    from d365fo_db_sync_spark.streaming import DriftMonitorPipeline

    ref = spark.createDataFrame(
        [(v,) for v in range(100, 200)], "n_chars long"
    )
    # drifted stream: shifted right, plus out-of-range mass for the clamp
    wave1 = [(v,) for v in range(150, 230)]
    wave2 = [(v,) for v in range(240, 260)] + [(None,)]
    cur = spark.createDataFrame(wave1 + wave2, "n_chars long")

    src_dir = str(tmp_path / "stream_in")
    os.makedirs(src_dir)
    spark.createDataFrame(wave1, "n_chars long").coalesce(1).write.mode(
        "append"
    ).parquet(src_dir)
    spark.createDataFrame(wave2, "n_chars long").coalesce(1).write.mode(
        "append"
    ).parquet(src_dir)

    pipe = DriftMonitorPipeline(
        ref,
        "n_chars",
        sidecar_dir=str(tmp_path / "sidecar"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        n_bins=5,
    )
    stream = (
        spark.readStream.schema(cur.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    q = pipe.start(stream, available_now=True)
    q.awaitTermination(120)

    got = {r["bin"]: r for r in pipe.psi_view(spark).collect()}
    exp = {r["bin"]: r for r in psi(ref, cur, "n_chars", n_bins=5).collect()}
    assert set(got) == set(exp)
    for b in exp:
        assert (got[b]["n_ref"], got[b]["n_cur"]) == (
            exp[b]["n_ref"],
            exp[b]["n_cur"],
        )
        assert got[b]["psi_term"] == exp[b]["psi_term"]  # identical doubles

    # two micro-batches published, atomically
    parts = sorted(
        e for e in os.listdir(pipe.sidecar_dir) if e.startswith("batch_id=")
    )
    assert len(parts) == 2 and not any(e.startswith("_tmp") for e in os.listdir(pipe.sidecar_dir))

    # replayed batch: sidecar untouched
    before = pipe.counts_view(spark).collect()
    pipe._handle_batch(spark.createDataFrame(wave1, "n_chars long"), 0)
    after = pipe.counts_view(spark).collect()
    assert sorted(map(tuple, before)) == sorted(map(tuple, after))


def test_drift_monitor_empty_and_validation(spark, tmp_path):
    from d365fo_db_sync_spark.operators.drift import psi_from_counts
    from d365fo_db_sync_spark.streaming import DriftMonitorPipeline

    ref = spark.createDataFrame([(1,)], "n_chars long")
    pipe = DriftMonitorPipeline(
        ref, "n_chars", str(tmp_path / "s"), str(tmp_path / "c"), n_bins=3
    )
    # nothing ingested yet: psi_view is pure reference mass
    rows = pipe.psi_view(spark).collect()
    assert [(r["bin"], r["n_ref"], r["n_cur"]) for r in rows] == [(0, 1, 0)]

    import pytest

    with pytest.raises(ValueError, match="n_bins"):
        DriftMonitorPipeline(ref, "n_chars", "x", "y", n_bins=1)
    with pytest.raises(ValueError, match="no non-NULL"):
        DriftMonitorPipeline(
            spark.createDataFrame([(None,)], "n_chars long"),
            "n_chars", "x", "y",
        )
    with pytest.raises(ValueError, match="eps"):
        psi_from_counts(spark.createDataFrame([], "bin int, n_ref long, n_cur long"), eps=0)


def test_drift_monitor_ks_auc_views_match_batch(spark, tmp_path):
    """ks_view/auc_view over the folded bin sidecar equal the BATCH
    statistics over the bin indices of the concatenated stream —
    double for double (the r10 verdict's ask: the sidecar already
    holds everything a binned KS needs; no new stream-side state)."""
    import os

    import pytest
    from pyspark.sql import functions as F

    from d365fo_db_sync_spark.operators.drift import ks_statistic, mann_whitney_auc
    from d365fo_db_sync_spark.streaming import DriftMonitorPipeline

    ref = spark.createDataFrame([(v,) for v in range(100, 200)], "n_chars long")
    wave1 = [(v,) for v in range(150, 230)]
    wave2 = [(v,) for v in range(240, 260)] + [(None,)]
    cur = spark.createDataFrame(wave1 + wave2, "n_chars long")

    src_dir = str(tmp_path / "in")
    os.makedirs(src_dir)
    for wave in (wave1, wave2):
        spark.createDataFrame(wave, "n_chars long").coalesce(1).write.mode(
            "append"
        ).parquet(src_dir)
    pipe = DriftMonitorPipeline(
        ref, "n_chars", str(tmp_path / "sc"), str(tmp_path / "ck"), n_bins=5
    )
    stream = (
        spark.readStream.schema(cur.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    pipe.start(stream, available_now=True).awaitTermination(120)

    # NULL metric rows are excluded BEFORE binning (the monitor's
    # contract) — binning first would send them to bin 0 via
    # greatest(NULL, 0)
    binned_ref = ref.filter(F.col("n_chars").isNotNull()).select(
        pipe._bin_expr().alias("b")
    )
    binned_cur = cur.filter(F.col("n_chars").isNotNull()).select(
        pipe._bin_expr().alias("b")
    )
    got = pipe.ks_view(spark).collect()[0]
    exp = ks_statistic(binned_ref, binned_cur, "b").collect()[0]
    assert (got["ks"], got["at_value"], got["n_ref"], got["n_cur"]) == (
        exp["ks"], exp["at_value"], exp["n_ref"], exp["n_cur"],
    )
    got = pipe.auc_view(spark).collect()[0]
    exp = mann_whitney_auc(binned_ref, binned_cur, "b").collect()[0]
    assert (got["auc"], got["u_statistic"]) == (exp["auc"], exp["u_statistic"])

    # jsd_view == batch jsd over the concatenated stream (same folded
    # integers, double for double)
    from d365fo_db_sync_spark.operators.drift import jsd

    gotj = {r["bin"]: r["jsd_term"] for r in pipe.jsd_view(spark).collect()}
    expj = {
        r["bin"]: r["jsd_term"]
        for r in jsd(ref, cur, "n_chars", n_bins=5).collect()
    }
    assert gotj == expj

    with pytest.raises(ValueError, match="psi_view"):
        pipe.mix_view(spark)


def test_drift_monitor_categorical_mix_matches_batch(spark, tmp_path):
    """Categorical mode: mix_view over the folded category sidecar
    equals batch psi_categorical over the concatenated stream; the
    numeric-only views refuse; replay is a sidecar no-op."""
    import os

    import pytest

    from d365fo_db_sync_spark.operators.drift import psi_categorical
    from d365fo_db_sync_spark.streaming import DriftMonitorPipeline

    ref = spark.createDataFrame(
        [("en",)] * 8 + [("de",)] * 2, "lang string"
    )
    wave1 = [("en",)] * 3 + [("fr",)] * 4
    wave2 = [("de",)] * 2 + [(None,)]
    cur = spark.createDataFrame(wave1 + wave2, "lang string")

    src_dir = str(tmp_path / "in")
    os.makedirs(src_dir)
    for wave in (wave1, wave2):
        spark.createDataFrame(wave, "lang string").coalesce(1).write.mode(
            "append"
        ).parquet(src_dir)
    pipe = DriftMonitorPipeline(
        ref, "lang", str(tmp_path / "sc"), str(tmp_path / "ck"),
        categorical=True,
    )
    stream = (
        spark.readStream.schema(cur.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    pipe.start(stream, available_now=True).awaitTermination(120)

    got = {r["category"]: r for r in pipe.mix_view(spark).collect()}
    exp = {r["category"]: r for r in psi_categorical(ref, cur, "lang").collect()}
    assert set(got) == set(exp)
    for c in exp:
        assert (got[c]["n_ref"], got[c]["n_cur"]) == (exp[c]["n_ref"], exp[c]["n_cur"])
        assert got[c]["psi_term"] == exp[c]["psi_term"]  # identical doubles

    for bad in ("psi_view", "ks_view", "auc_view"):
        with pytest.raises(ValueError, match="mix_view"):
            getattr(pipe, bad)(spark)

    # replayed batch id: sidecar untouched
    before = sorted(map(tuple, pipe.counts_view(spark).collect()))
    pipe._handle_batch(spark.createDataFrame(wave1, "lang string"), 0)
    assert sorted(map(tuple, pipe.counts_view(spark).collect())) == before

    with pytest.raises(ValueError, match="no non-NULL"):
        DriftMonitorPipeline(
            spark.createDataFrame([(None,)], "lang string"),
            "lang", "x", "y", categorical=True,
        )


def test_frequent_items_stream_matches_exact_groupby(spark, tmp_path):
    """FrequentItemsStreamPipeline: after draining a skewed stream in
    micro-batches, exact() equals the naive groupBy+HAVING over the
    whole stream — the streaming twin of frequent_items' guarantee
    (superset candidates folded across batches, exact recount)."""
    import os
    import random

    from pyspark.sql import functions as F

    from d365fo_db_sync_spark.streaming import FrequentItemsStreamPipeline

    rng = random.Random(11)
    waves = []
    for w in range(4):
        rows = []
        for _ in range(5000):
            r = rng.random()
            if r < 0.15:
                rows.append(("hot",))
            elif r < 0.22:
                rows.append((f"warm{w % 2}",))
            else:
                rows.append((f"u{rng.randrange(3000)}",))
        waves.append(rows)
    allrows = [r for wave in waves for r in wave]
    corpus = spark.createDataFrame(allrows, "k string")

    src = str(tmp_path / "in")
    os.makedirs(src)
    for i, wave in enumerate(waves):
        spark.createDataFrame(wave, "k string").coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{src}/b{i}")
    pipe = FrequentItemsStreamPipeline(
        str(tmp_path / "summ"), str(tmp_path / "ckpt"), ["k"], min_fraction=0.03
    )
    stream = (
        spark.readStream.schema(corpus.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*")
    )
    pipe.start(stream, available_now=True).awaitTermination(120)

    got = {(r["k"]): (r["count"], r["fraction"]) for r in pipe.exact(spark, corpus).collect()}
    n = len(allrows)
    naive = {
        r["k"]: (r["c"], r["c"] / n)
        for r in corpus.groupBy("k").agg(F.count("*").alias("c")).collect()
        if r["c"] >= 0.03 * n
    }
    assert got == naive
    assert "hot" in got

    # candidate superset stays bounded regardless of batch count
    cands = pipe.candidates(spark).collect()
    phi = 0.03
    assert len(cands) <= (1 + phi) / phi**2 + 2

    # replayed batch id: sidecar untouched, totals unchanged
    before = sorted(
        map(tuple, pipe.summary(spark).select("k", "__mg", "__nb", "batch_id").collect())
    )
    pipe._handle_batch(spark.createDataFrame(waves[0], "k string"), 0)
    after = sorted(
        map(tuple, pipe.summary(spark).select("k", "__mg", "__nb", "batch_id").collect())
    )
    assert before == after

    # per-batch sidecar stays capacity-bounded (the compression step)
    per_batch = (
        pipe.summary(spark).groupBy("batch_id").agg(F.count("*").alias("c")).collect()
    )
    assert all(r["c"] <= pipe.capacity for r in per_batch)


def test_frequent_items_stream_validation_and_empty(spark, tmp_path):
    import pytest

    from d365fo_db_sync_spark.streaming import FrequentItemsStreamPipeline

    with pytest.raises(ValueError, match="no-miss"):
        FrequentItemsStreamPipeline("x", "y", ["k"], 0.1, capacity=5)
    with pytest.raises(ValueError, match="min_fraction"):
        FrequentItemsStreamPipeline("x", "y", ["k"], 0.0)
    with pytest.raises(ValueError, match="at least one column"):
        FrequentItemsStreamPipeline("x", "y", [], 0.1)

    pipe = FrequentItemsStreamPipeline(
        str(tmp_path / "s"), str(tmp_path / "c"), ["k"], 0.1
    )
    corpus = spark.createDataFrame([("a",)], "k string")
    assert pipe.candidates(spark) is None
    out = pipe.exact(spark, corpus)
    assert out.count() == 0
    assert out.columns == ["k", "count", "fraction"]


def test_drift_monitor_quantile_view_matches_batch_bins(spark, tmp_path):
    """quantile_view over the folded sidecar equals
    quantiles_from_counts over the batch bin counts of the
    concatenated stream — and both interpolate within one bin width
    of the true quantiles."""
    import os

    from pyspark.sql import functions as F

    from d365fo_db_sync_spark.operators.drift import quantiles_from_counts
    from d365fo_db_sync_spark.streaming import DriftMonitorPipeline

    ref = spark.createDataFrame([(v,) for v in range(0, 1000)], "n_chars long")
    wave1 = [(v,) for v in range(0, 500)]
    wave2 = [(v,) for v in range(500, 1000)]

    src_dir = str(tmp_path / "in")
    os.makedirs(src_dir)
    for wave in (wave1, wave2):
        spark.createDataFrame(wave, "n_chars long").coalesce(1).write.mode(
            "append"
        ).parquet(src_dir)
    pipe = DriftMonitorPipeline(
        ref, "n_chars", str(tmp_path / "sc"), str(tmp_path / "ck"), n_bins=20
    )
    stream = (
        spark.readStream.schema("n_chars long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    pipe.start(stream, available_now=True).awaitTermination(120)

    qs = [0.5, 0.95]
    got = {r["q"]: r["est"] for r in pipe.quantile_view(spark, qs).collect()}
    cur = spark.createDataFrame(wave1 + wave2, "n_chars long")
    batch_counts = (
        cur.select(pipe._bin_expr().alias("bin"))
        .groupBy("bin")
        .agg(F.count("*").alias("n_cur"))
    )
    exp = {
        r["q"]: r["est"]
        for r in quantiles_from_counts(
            batch_counts, qs, lo=pipe.lo, hi=pipe.hi, n_bins=pipe.n_bins
        ).collect()
    }
    assert got == exp
    width = (pipe.hi - pipe.lo) / pipe.n_bins
    assert abs(got[0.5] - 499.5) <= width + 1e-9
    assert abs(got[0.95] - 949.05) <= width + 1e-9


def test_drift_monitor_edge_mass_and_typed_mix(spark, tmp_path):
    """Two r11-ADVICE closures on the drift monitor: (1)
    edge_mass_view surfaces out-of-range clamping — a stream entirely
    beyond the frozen reference range piles its mass into the high
    edge bin, which is the saturation signal quantile_view's bound
    caveat points at; (2) mix_view casts the category back to the
    reference column's ORIGINAL type (the sidecar stringifies), so a
    non-string categorical monitor matches psi_categorical
    schema-exactly, not just value-exactly."""
    import os

    import pytest

    from d365fo_db_sync_spark.operators.drift import psi_categorical
    from d365fo_db_sync_spark.streaming import DriftMonitorPipeline

    # --- numeric monitor: clamped mass shows in edge_mass_view ---
    ref = spark.createDataFrame([(v,) for v in range(0, 100)], "x long")
    wave = [(v,) for v in range(500, 600)]  # entirely above hi=99
    src_dir = str(tmp_path / "in_num")
    os.makedirs(src_dir)
    spark.createDataFrame(wave, "x long").coalesce(1).write.mode(
        "append"
    ).parquet(src_dir)
    pipe = DriftMonitorPipeline(
        ref, "x", str(tmp_path / "sc_num"), str(tmp_path / "ck_num"), n_bins=10
    )
    stream = (
        spark.readStream.schema("x long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    pipe.start(stream, available_now=True).awaitTermination(120)
    em = {r["side"]: r for r in pipe.edge_mass_view(spark).collect()}
    assert em["high"]["edge_frac_cur"] == 1.0  # all clamped into bin 9
    assert em["high"]["edge_frac_ref"] == pytest.approx(0.1)
    assert em["low"]["edge_frac_cur"] == 0.0
    # ...and the saturated quantile reads the reference range edge
    est = {r["q"]: r["est"] for r in pipe.quantile_view(spark, [0.5]).collect()}
    assert est[0.5] <= pipe.hi + 1e-9  # saturated: true median is 549.5

    # --- categorical monitor over an INT column: type round-trips ---
    ref_i = spark.createDataFrame([(1,)] * 8 + [(2,)] * 2, "cat int")
    cur_rows = [(1,)] * 3 + [(3,)] * 7
    src2 = str(tmp_path / "in_cat")
    os.makedirs(src2)
    spark.createDataFrame(cur_rows, "cat int").coalesce(1).write.mode(
        "append"
    ).parquet(src2)
    pipe2 = DriftMonitorPipeline(
        ref_i, "cat", str(tmp_path / "sc_cat"), str(tmp_path / "ck_cat"),
        categorical=True,
    )
    stream2 = (
        spark.readStream.schema("cat int")
        .option("maxFilesPerTrigger", 1)
        .parquet(src2)
    )
    pipe2.start(stream2, available_now=True).awaitTermination(120)
    view = pipe2.mix_view(spark)
    exp_df = psi_categorical(
        ref_i, spark.createDataFrame(cur_rows, "cat int"), "cat"
    )
    assert view.schema["category"].dataType == exp_df.schema["category"].dataType
    got = {r["category"]: r for r in view.collect()}
    exp = {r["category"]: r for r in exp_df.collect()}
    assert set(got) == set(exp) == {1, 2, 3}
    for c in exp:
        assert got[c]["psi_term"] == exp[c]["psi_term"]
    # categorical mode refuses the edge view (bins are unordered)
    with pytest.raises(ValueError, match="mix_view"):
        pipe2.edge_mass_view(spark)


def test_cms_stream_fold_equals_single_pass(spark, tmp_path):
    """CmsStreamPipeline: the folded sidecar equals a one-pass CMS of
    the concatenated stream counter-for-counter (mergeability), the
    estimates carry the never-undercount guarantee, and a replayed
    batch is a sidecar no-op."""
    import os

    from pyspark.sql import functions as F

    from d365fo_db_sync_spark.operators.sketches import cms_sketch
    from d365fo_db_sync_spark.streaming import CmsStreamPipeline

    waves = [
        [(f"k{i % 19}",) for i in range(300)],
        [("hot",)] * 120 + [(f"k{i % 7}",) for i in range(80)],
    ]
    allrows = [r for w in waves for r in w]
    corpus = spark.createDataFrame(allrows, "v string")

    src = str(tmp_path / "in")
    os.makedirs(src)
    for i, wave in enumerate(waves):
        spark.createDataFrame(wave, "v string").coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{src}/b{i}")
    pipe = CmsStreamPipeline(
        str(tmp_path / "sc"), str(tmp_path / "ck"), "v", depth=3, width=32
    )
    stream = (
        spark.readStream.schema(corpus.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*")
    )
    pipe.start(stream, available_now=True).awaitTermination(120)

    folded = sorted(map(tuple, pipe.sketch(spark).collect()))
    whole = sorted(map(tuple, cms_sketch(corpus, "v", 3, 32).collect()))
    assert folded == whole

    est = {r["v"]: r["est"] for r in pipe.estimate(spark, corpus.select("v")).collect()}
    exact = {
        r["v"]: r["c"]
        for r in corpus.groupBy("v").agg(F.count("*").alias("c")).collect()
    }
    assert all(est[k] >= exact[k] for k in exact)

    before = folded
    pipe._handle_batch(spark.createDataFrame(waves[0], "v string"), 0)
    assert sorted(map(tuple, pipe.sketch(spark).collect())) == before

    # empty pipeline contract
    empty = CmsStreamPipeline(str(tmp_path / "s2"), str(tmp_path / "c2"), "v")
    assert empty.sketch(spark).count() == 0
    assert empty.estimate(spark, corpus.select("v")).agg(F.max("est")).first()[0] == 0


def test_centroid_drift_stream_matches_batch(spark, tmp_path):
    """CentroidDriftStreamPipeline: the folded per-dim integer
    sidecars yield EXACTLY the batch embedding_centroid_drift over
    the concatenated stream (integer sums fold without error);
    replayed batches are sidecar no-ops; a ragged reference refuses
    at construction."""
    import os
    import struct as _struct

    import pytest

    from d365fo_db_sync_spark.operators.drift import embedding_centroid_drift
    from d365fo_db_sync_spark.streaming import CentroidDriftStreamPipeline

    import random

    rng = random.Random(7)
    f32 = lambda x: _struct.unpack("f", _struct.pack("f", x))[0]
    dim = 6
    mk_rows = lambda k, shift: [
        [f32(rng.uniform(-1, 1) + shift) for _ in range(dim)] for _ in range(k)
    ]
    ref_rows = mk_rows(30, 0.0)
    wave1, wave2 = mk_rows(12, 0.25), mk_rows(9, 0.4)
    mk = lambda rows: spark.createDataFrame(
        [(v,) for v in rows], "embedding array<float>"
    )

    src = str(tmp_path / "in")
    os.makedirs(src)
    for wave in (wave1, wave2):
        mk(wave).coalesce(1).write.mode("append").parquet(src)
    pipe = CentroidDriftStreamPipeline(
        mk(ref_rows), "embedding", str(tmp_path / "sc"), str(tmp_path / "ck")
    )
    stream = (
        spark.readStream.schema("embedding array<float>")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    pipe.start(stream, available_now=True).awaitTermination(120)

    got = pipe.centroid_view(spark).collect()[0]
    exp = embedding_centroid_drift(
        mk(ref_rows), mk(wave1 + wave2), "embedding"
    ).collect()[0]
    assert (got["n_ref"], got["n_cur"]) == (exp["n_ref"], exp["n_cur"]) == (30, 21)
    assert got["cos_centroid"] == exp["cos_centroid"]  # identical doubles
    assert got["l2_centroid"] == exp["l2_centroid"]

    # replayed batch id: sidecar untouched
    before = sorted(map(tuple, pipe.sums_view(spark).collect()))
    pipe._handle_batch(mk(wave1), 0)
    assert sorted(map(tuple, pipe.sums_view(spark).collect())) == before

    # a ragged REFERENCE refuses at construction; a ragged BATCH
    # surfaces through the view's guard
    ragged = spark.createDataFrame(
        [([1.0, 2.0],), ([3.0],)], "embedding array<float>"
    )
    with pytest.raises(ValueError, match="ragged"):
        CentroidDriftStreamPipeline(ragged, "embedding", "x", "y")
    pipe._handle_batch(ragged, 99)
    with pytest.raises(Exception, match="ragged"):
        pipe.centroid_view(spark).collect()
    with pytest.raises(ValueError, match="no non-NULL"):
        CentroidDriftStreamPipeline(
            mk([]).filter("embedding IS NOT NULL"), "embedding", "x", "y"
        )


def test_classifier_scores_through_drift_monitor(spark, tmp_path):
    """Round-12 composition: a trained classifier's quantized
    probabilities are just another scalar metric — the drift monitor
    ingests per-batch SCORED micro-batches and its psi/ks views equal
    the batch drift operators over the concatenated scored stream.
    This is the production shape for 'is the incoming crawl's quality
    distribution shifting against the reference?'."""
    import os

    from pyspark.sql import functions as F

    from d365fo_db_sync_spark.operators.classifier import (
        logreg_fit,
        logreg_score,
    )
    from d365fo_db_sync_spark.operators.drift import ks_statistic, psi
    from d365fo_db_sync_spark.streaming import DriftMonitorPipeline

    rows = [
        (i, "alpha beta gamma delta epsilon", 1) for i in range(20)
    ] + [(100 + i, "zip zap zoom quux corge", 0) for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, text string, y int")
    model = logreg_fit(df, "y", m_buckets=64, lr=200.0, rounds=2, lr_bias=1.0)

    ref_scored = logreg_score(df, model).select("doc_id", "prob")
    # the "incoming crawl": mostly low-quality docs, in 2 micro-batches
    wave1 = [(200 + i, "zip zap zoom quux corge") for i in range(8)]
    wave2 = [(300 + i, "alpha beta zip zap gamma") for i in range(5)]
    src = str(tmp_path / "in")
    os.makedirs(src)
    for w in (wave1, wave2):
        spark.createDataFrame(w, "doc_id long, text string").coalesce(
            1
        ).write.mode("append").parquet(src)

    pipe = DriftMonitorPipeline(
        ref_scored, "prob", str(tmp_path / "sc"), str(tmp_path / "ck"),
        n_bins=8,
    )
    score_and_publish = lambda batch_df, bid: pipe._handle_batch(
        logreg_score(batch_df, model).select("doc_id", "prob"), bid
    )
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(score_and_publish)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    cur_scored = logreg_score(
        spark.createDataFrame(wave1 + wave2, "doc_id long, text string"),
        model,
    ).select("prob")
    got_psi = {r["bin"]: r for r in pipe.psi_view(spark).collect()}
    exp_psi = {r["bin"]: r for r in psi(ref_scored, cur_scored, "prob", n_bins=8).collect()}
    assert set(got_psi) == set(exp_psi)
    for b in exp_psi:
        assert (got_psi[b]["n_ref"], got_psi[b]["n_cur"]) == (
            exp_psi[b]["n_ref"], exp_psi[b]["n_cur"],
        )
        assert got_psi[b]["psi_term"] == exp_psi[b]["psi_term"]
    # the low-quality influx is visible drift
    total_psi = sum(r["psi_term"] for r in got_psi.values())
    assert total_psi > 0.25


def test_frequent_items_stream_releases_checkpoint_blocks(spark, tmp_path):
    """Each micro-batch's eager localCheckpoint must be unpersisted
    once its sidecar is written (r12 ADVICE): over a long-running
    stream, leaked checkpoint blocks accumulate without bound on
    executors. After draining the stream, no RDD storage may remain."""
    import os

    from d365fo_db_sync_spark.streaming import FrequentItemsStreamPipeline

    src = str(tmp_path / "in")
    os.makedirs(src)
    for i in range(3):
        spark.createDataFrame(
            [(f"k{j % 5}",) for j in range(200)], "k string"
        ).coalesce(1).write.mode("overwrite").parquet(f"{src}/b{i}")
    pipe = FrequentItemsStreamPipeline(
        str(tmp_path / "summ"), str(tmp_path / "ckpt"), ["k"],
        min_fraction=0.05,
    )
    stream = (
        spark.readStream.schema("k string")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*")
    )
    # delta-based: other operators in this shared session may hold
    # their own (batch-scoped) checkpoint blocks — the invariant under
    # test is that THIS stream adds none
    before = {
        s.id() for s in spark.sparkContext._jsc.sc().getRDDStorageInfo()
    }
    pipe.start(stream, available_now=True).awaitTermination(120)
    stored = [
        s
        for s in spark.sparkContext._jsc.sc().getRDDStorageInfo()
        if s.id() not in before
    ]
    assert len(stored) == 0, [s.toString() for s in stored]


def test_classifier_score_stream_equals_batch_histogram(spark, tmp_path):
    """ClassifierScoreStreamPipeline final state == classifier.
    score_histogram over the concatenated stream, value for value:
    the per-batch partials are integer counts + exact DECIMAL(38,12)
    prob sums, so the fold across micro-batches is exact (the
    CentroidDrift equivalence discipline for the trained tier)."""
    import os

    from pyspark.sql import functions as F

    from d365fo_db_sync_spark.operators.classifier import (
        logreg_fit,
        score_histogram,
    )
    from d365fo_db_sync_spark.streaming import ClassifierScoreStreamPipeline

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    src_num = F.substring("source", 4, 10).cast("int")
    labeled = docs.select(
        "doc_id", "text",
        F.coalesce(src_num < 10, F.lit(False)).alias("is_ref"),
    )
    model = logreg_fit(
        labeled, "is_ref", m_buckets=256, lr=2000.0, rounds=1, lr_bias=1.0
    )
    stream_docs = docs.select("doc_id", "text")

    src = str(tmp_path / "in")
    os.makedirs(src)
    for b in range(3):
        stream_docs.filter(F.pmod("doc_id", F.lit(3)) == b).coalesce(
            1
        ).write.mode("overwrite").parquet(f"{src}/b{b}")
    pipe = ClassifierScoreStreamPipeline(
        model, str(tmp_path / "sidecar"), str(tmp_path / "ckpt"), n_bins=10
    )
    stream = (
        spark.readStream.schema(stream_docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*")
    )
    pipe.start(stream, available_now=True).awaitTermination(120)

    got = {
        r["bin"]: (r["n_docs"], r["n_keep"], r["mean_prob"])
        for r in pipe.histogram_view(spark).collect()
    }
    want = {
        r["bin"]: (r["n_docs"], r["n_keep"], r["mean_prob"])
        for r in score_histogram(stream_docs, model, n_bins=10).collect()
    }
    assert got == want  # exact, not approximate
    assert sum(v[0] for v in got.values()) == stream_docs.count()

    # replay safety: re-publishing an existing batch_id is a no-op
    batch0 = spark.read.parquet(f"{src}/b0")
    pipe._handle_batch(batch0, 0)
    again = {
        r["bin"]: (r["n_docs"], r["n_keep"], r["mean_prob"])
        for r in pipe.histogram_view(spark).collect()
    }
    assert again == want


def test_ranking_metrics_stream_equals_batch(spark, tmp_path):
    """RankingMetricsStreamPipeline's folded view is double-for-double
    retrieval.ranking_metrics over the concatenated run, including
    queries whose rows span micro-batches and a qrels query the run
    never mentions (scores zero on both sides); replaying a published
    batch_id is a no-op."""
    import os

    from pyspark.sql import functions as F

    from d365fo_db_sync_spark.operators.retrieval import ranking_metrics
    from d365fo_db_sync_spark.streaming import RankingMetricsStreamPipeline

    run = spark.createDataFrame(
        [(q, q * 100 + r, r) for q in (1, 2, 3) for r in range(1, 8)],
        "query_id long, doc_id long, rnk int",
    )
    qrels = spark.createDataFrame(
        [(1, 101, 2), (1, 105, 1), (2, 203, 3), (2, 999, 1), (9, 900, 2)],
        "query_id long, doc_id long, rel int",
    )
    src = str(tmp_path / "in")
    os.makedirs(src)
    for b in range(3):  # split on DOC id: queries span batches
        run.filter(F.pmod("doc_id", F.lit(3)) == b).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{src}/b{b}")
    pipe = RankingMetricsStreamPipeline(
        qrels, str(tmp_path / "sidecar"), str(tmp_path / "ckpt"), k=5
    )
    stream = (
        spark.readStream.schema(run.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*")
    )
    assert pipe.start(stream, available_now=True).awaitTermination(120)

    def snap(df):
        return {r["query_id"]: tuple(r)[1:] for r in df.collect()}

    got = snap(pipe.metrics_view(spark))
    want = snap(ranking_metrics(run, qrels, k=5))
    assert got == want  # exact, not approximate
    assert 9 in got and got[9][1] == 0  # absent-from-run query scores 0

    # replay safety: re-publishing an existing batch_id is a no-op
    pipe._handle_batch(spark.read.parquet(f"{src}/b0"), 0)
    assert snap(pipe.metrics_view(spark)) == want
