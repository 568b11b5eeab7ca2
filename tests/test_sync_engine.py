"""End-to-end sync scenario matrix (DBSyncTool_Optimization_Spec.md:1595-1608):
first sync / no changes / source-only changes / deletes / major changes /
late data / crash safety. Fixtures follow FIXTURES.md Part B (uint64
surrogate for the rowversion)."""

from __future__ import annotations

import datetime as dt

import pytest

from d365fo_db_sync_spark.sinks import ParquetTarget
from d365fo_db_sync_spark.state import StateStore, TableState
from d365fo_db_sync_spark.sync import (
    INCREMENTAL,
    NO_CHANGE,
    STANDARD,
    TRUNCATE,
    SyncConfig,
    SyncEngine,
)

SCHEMA = (
    "RecId long, RECVERSION int, SysRowVersion long, "
    "CREATEDDATETIME timestamp_ntz, MODIFIEDDATETIME timestamp_ntz, AMOUNT double"
)


def make_rows(n, ver_start=100):
    base = dt.datetime(2024, 1, 1)
    return [
        (
            1000 + i,
            2 if i % 10 else 1,  # some RECVERSION=1 rows
            ver_start + i,
            None if i % 17 == 0 else base + dt.timedelta(hours=i),
            base + dt.timedelta(hours=i, minutes=30),
            float(i) * 1.5,
        )
        for i in range(n)
    ]


@pytest.fixture()
def env(spark, tmp_path):
    store = StateStore(str(tmp_path / "state.json"))
    cfg = SyncConfig(record_count=1000, current_sequence=0)
    engine = SyncEngine(spark, store, cfg)
    target = ParquetTarget(str(tmp_path / "tgt"))
    return spark, store, engine, target


def df_of(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def keys_of(target, spark):
    return sorted(r["RecId"] for r in target.read(spark).select("RecId").collect())


def test_first_run_standard_then_no_change(env):
    spark, store, engine, target = env
    rows = make_rows(50)
    src = df_of(spark, rows)

    r1 = engine.sync_table("T1", src, target)
    assert r1.mode == STANDARD
    assert r1.inserted == 50
    assert keys_of(target, spark) == sorted(r[0] for r in rows)
    st = store.get("T1")
    assert st.src_ts == max(r[2] for r in rows)
    assert st.max_transferred_key == max(r[0] for r in rows)
    assert st.next_sequence == max(r[0] for r in rows) + 10_000

    # scenario: resync with zero changes -> fast path, no writes
    v1 = target.current_path()
    r2 = engine.sync_table("T1", src, target)
    assert r2.mode == NO_CHANGE
    assert target.current_path() == v1  # target untouched


def test_incremental_low_change(env):
    spark, store, engine, target = env
    rows = make_rows(100)
    src = df_of(spark, rows)
    engine.sync_table("T1", src, target)

    # mutate <40%: modify 5 (bump version), insert 3 new, delete 2
    ver = 1000
    new_rows = []
    deleted = {1000 + 7, 1000 + 8}
    for r in rows:
        if r[0] in deleted:
            continue
        if r[0] % 20 == 0:  # 5 modified
            ver += 1
            r = (r[0], r[1] + 1, ver, r[3], r[4], r[5] + 99.0)
        new_rows.append(r)
    for j in range(3):  # 3 new
        ver += 1
        new_rows.append((2000 + j, 2, ver, None, dt.datetime(2024, 2, 1), 1.0))
    src2 = df_of(spark, new_rows)

    r2 = engine.sync_table("T1", src2, target)
    assert r2.mode == INCREMENTAL
    assert keys_of(target, spark) == sorted(r[0] for r in new_rows)
    # modified rows actually replaced
    got = {r["RecId"]: r["AMOUNT"] for r in target.read(spark).collect()}
    for r in new_rows:
        assert got[r[0]] == r[5]
    assert store.get("T1").src_ts == ver


def test_truncate_on_major_change(env):
    spark, store, engine, target = env
    rows = make_rows(100)
    engine.sync_table("T1", df_of(spark, rows), target)

    # bump version on 60% of rows -> change% >= 40 -> TRUNCATE
    new_rows = [
        (r[0], r[1] + 1, r[2] + 1000, r[3], r[4], r[5]) if i % 10 < 6 else r
        for i, r in enumerate(rows)
    ]
    r2 = engine.sync_table("T1", df_of(spark, new_rows), target)
    assert r2.mode == TRUNCATE
    assert keys_of(target, spark) == sorted(r[0] for r in new_rows)


def test_late_data_watermark_widening(env):
    spark, store, engine, target = env
    rows = make_rows(50)
    engine.sync_table("T1", df_of(spark, rows), target)

    # a row with an OLD version (below the stored watermark) appears in the
    # source but is missing from the target -> must still be recovered (T4)
    late = (3000, 2, 5, None, dt.datetime(2024, 1, 15), 7.0)  # version 5 << watermark
    src2 = df_of(spark, rows + [late])
    r2 = engine.sync_table("T1", src2, target)
    assert r2.mode == INCREMENTAL
    assert r2.missing == 1
    assert 3000 in keys_of(target, spark)
    got = {r["RecId"]: r["AMOUNT"] for r in target.read(spark).collect()}
    assert got[3000] == 7.0


def test_window_excess_rows_removed(env):
    spark, store, engine, target = env
    rows = make_rows(100)
    engine.sync_table("T1", df_of(spark, rows), target)

    # shrink the sync window: top-30 only -> target rows outside the control
    # set are dropped (J5 NOT-EXISTS delete) once change/excess >= threshold
    engine.config.record_count = 30
    src2 = df_of(spark, rows)
    r2 = engine.sync_table("T1", src2, target)
    expected = sorted(r[0] for r in rows)[-30:]
    assert keys_of(target, spark) == expected
    assert r2.mode in (INCREMENTAL, TRUNCATE)


def test_watermark_never_advances_on_failure(env, monkeypatch):
    spark, store, engine, target = env
    rows = make_rows(40)
    engine.sync_table("T1", df_of(spark, rows), target)
    st_before = store.get("T1")

    def boom(df):
        raise RuntimeError("disk full")

    monkeypatch.setattr(target, "overwrite", boom)
    bumped = [(r[0], r[1] + 1, r[2] + 500, r[3], r[4], r[5]) for r in rows]
    with pytest.raises(RuntimeError):
        engine.sync_table("T1", df_of(spark, bumped), target)
    st_after = store.get("T1")
    assert st_after == st_before  # crash-safety contract (T1/T6)


def test_fallback_no_rowversion_column(env):
    spark, store, engine, target = env
    # no SysRowVersion column -> engine stays on the standard path with
    # RECVERSION comparison (ComparisonContext fallback)
    rows = [(i, 2, dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 2)) for i in range(20)]
    schema = "RecId long, RECVERSION int, CREATEDDATETIME timestamp_ntz, MODIFIEDDATETIME timestamp_ntz"
    src = spark.createDataFrame(rows, schema)
    r1 = engine.sync_table("T2", src, target)
    assert r1.mode == STANDARD
    assert r1.inserted == 20

    r2 = engine.sync_table("T2", src, target)
    assert r2.mode == STANDARD
    assert r2.classification.get("unchanged") == 20
    assert keys_of(target, spark) == [r[0] for r in rows]


def test_state_store_roundtrip(tmp_path):
    p = str(tmp_path / "s.json")
    s1 = StateStore(p)
    s1.commit("Foo", TableState(src_ts=10, tgt_ts=9, max_transferred_key=123, next_sequence=500))
    s2 = StateStore(p)
    st = s2.get("FOO")  # case-insensitive
    assert (st.src_ts, st.tgt_ts, st.max_transferred_key, st.next_sequence) == (10, 9, 123, 500)
    s2.clear("foo")
    assert StateStore(p).get("FOO").src_ts is None


def test_config_profiles_roundtrip(tmp_path):
    from d365fo_db_sync_spark.config import ConfigStore, EngineConfig

    store = ConfigStore(str(tmp_path / "cfg.json"))
    cfg = EngineConfig(parallel_workers=4, strategy_text="T|100 -truncate")
    store.save("prod-sync", cfg)
    assert not ConfigStore.is_valid_name("bad name!")
    import pytest as _pytest

    with _pytest.raises(ValueError):
        store.save("bad name!", cfg)

    again = ConfigStore(str(tmp_path / "cfg.json"))
    assert again.load().parallel_workers == 4  # last-used pointer
    assert again.names() == ["prod-sync"]


def test_snapshot_sink(spark, tmp_path):
    from d365fo_db_sync_spark.sinks import ParquetTarget, snapshot

    tgt = ParquetTarget(str(tmp_path / "t"))
    df = spark.createDataFrame([(1,), (2,)], "id long")
    tgt.overwrite(df)
    dest = snapshot(tgt, str(tmp_path / "snaps"), "t_2024_01_01_0000")
    assert spark.read.parquet(dest).count() == 2
    # snapshot survives a subsequent overwrite (COPY_ONLY semantics)
    tgt.overwrite(spark.createDataFrame([(9,)], "id long"))
    assert spark.read.parquet(dest).count() == 2


def test_partitioned_target_prunes_on_read(spark, tmp_path):
    import os

    from d365fo_db_sync_spark.plans.audit import explain_formatted
    from d365fo_db_sync_spark.sinks import ParquetTarget

    tgt = ParquetTarget(str(tmp_path / "pt"), partition_by=["day"])
    df = spark.createDataFrame(
        [(i, f"2024-01-{1 + i % 3:02d}") for i in range(30)], "id long, day string"
    )
    tgt.overwrite(df)
    live = tgt.current_path()
    assert any(e.startswith("day=") for e in os.listdir(live))  # hive layout

    pruned = tgt.read(spark).filter("day = '2024-01-02'")
    assert pruned.count() == 10
    assert "PartitionFilters" in explain_formatted(pruned)
