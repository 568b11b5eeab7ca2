"""Orchestration: prepare (patterns, intersection, strategy bind) +
parallel process + retry (CopyOrchestrator.cs:49-341, 414-619)."""

from __future__ import annotations

import datetime as dt

import pytest

from d365fo_db_sync_spark.orchestrator import Orchestrator
from d365fo_db_sync_spark.state import StateStore
from d365fo_db_sync_spark.strategy import StrategyType
from d365fo_db_sync_spark.sync import SyncConfig, SyncEngine


@pytest.fixture()
def sources(spark):
    def mk(n, extra_col=False):
        rows = [
            (i, 2, 100 + i, dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 2), float(i))
            for i in range(n)
        ]
        schema = (
            "RecId long, RECVERSION int, SysRowVersion long, "
            "CREATEDDATETIME timestamp_ntz, MODIFIEDDATETIME timestamp_ntz, AMOUNT double"
        )
        df = spark.createDataFrame(rows, schema)
        if extra_col:
            from pyspark.sql import functions as F

            df = df.withColumn("SRC_ONLY_COL", F.lit("x"))
        return df

    return {"CUSTTABLE": mk(30), "SALESTABLE": mk(40, extra_col=True), "tmp_Lower": mk(5)}


def test_prepare_patterns_and_intersection(spark, sources):
    engine = SyncEngine(spark, StateStore("/tmp/_unused_state.json"), SyncConfig())
    orch = Orchestrator(spark, engine, workers=2)
    plans = orch.prepare(
        sources,
        target_schemas={
            "CUSTTABLE": ["RECID", "RECVERSION", "SYSROWVERSION", "CREATEDDATETIME",
                          "MODIFIEDDATETIME", "AMOUNT", "TGT_ONLY"],
            "SALESTABLE": ["RECID", "RECVERSION", "SYSROWVERSION", "CREATEDDATETIME",
                           "MODIFIEDDATETIME", "AMOUNT"],
        },
        include=["CUST*", "SALES*"],
        exclude=["*lower*"],
        strategy_text="CUSTTABLE|20\nSALESTABLE|sql:SELECT * FROM SALESTABLE -truncate",
        excluded_fields=["CUSTTABLE.AMOUNT"],
    )
    by_name = {p.name: p for p in plans}
    assert set(by_name) == {"CUSTTABLE", "SALESTABLE"}
    # P1: intersection minus exclusions, preserving source order & case
    assert "AMOUNT" not in by_name["CUSTTABLE"].copyable_fields
    assert "SRC_ONLY_COL" not in by_name["SALESTABLE"].copyable_fields
    assert by_name["CUSTTABLE"].strategy.record_count == 20
    assert by_name["SALESTABLE"].strategy.type == StrategyType.SQL
    assert by_name["SALESTABLE"].strategy.use_truncate


def test_process_parallel_and_report(spark, sources, tmp_path):
    engine = SyncEngine(spark, StateStore(str(tmp_path / "state.json")), SyncConfig())
    orch = Orchestrator(spark, engine, workers=3)
    plans = orch.prepare(sources, include=["CUSTTABLE", "SALESTABLE"])
    result = orch.process(plans, sources, str(tmp_path / "targets"))
    assert all(p.status == "Completed" for p in result.plans)
    report = result.to_df(spark).collect()
    assert {r["table_name"] for r in report} == {"CUSTTABLE", "SALESTABLE"}
    assert all(r["mode"] == "STANDARD" for r in report)


def test_failure_containment_and_retry(spark, sources, tmp_path):
    engine = SyncEngine(spark, StateStore(str(tmp_path / "state.json")), SyncConfig())
    orch = Orchestrator(spark, engine, workers=1, stop_on_first_failure=True)
    plans = orch.prepare(sources, include=["CUSTTABLE", "SALESTABLE"])

    broken = dict(sources)
    broken["CUSTTABLE"] = None  # will raise on .select
    result = orch.process(plans, broken, str(tmp_path / "targets"))
    statuses = {p.name: p.status for p in result.plans}
    assert statuses["CUSTTABLE"] == "Failed"
    assert result.failed and "NoneType" in result.failed[0].error

    # retry with the fixed source heals the run (R11)
    orch.retry_failed(result, sources, str(tmp_path / "targets"))
    assert all(p.status == "Completed" for p in result.plans)


def test_auto_stop_cancels_inflight_job_groups(spark, sources, tmp_path, monkeypatch):
    """R13 — first failure must cancel the OTHER tables' Spark job
    groups, not just drain the queue: the slow in-flight table ends
    Cancelled (its group cancelled cluster-side), and retry_failed
    picks Cancelled victims back up."""
    import threading

    engine = SyncEngine(spark, StateStore(str(tmp_path / "state.json")), SyncConfig())
    orch = Orchestrator(spark, engine, workers=2, stop_on_first_failure=True)
    plans = orch.prepare(sources, include=["CUSTTABLE", "SALESTABLE"])

    cancelled: list[str] = []
    cancel_seen = threading.Event()
    monkeypatch.setattr(
        spark.sparkContext,
        "cancelJobGroup",
        lambda g: (cancelled.append(g), cancel_seen.set()),
    )

    real_sync = engine.sync_table
    sales_started = threading.Event()

    def gated_sync(name, src, target, **kw):
        if name == "CUSTTABLE":
            # fail only once the peer is registered + in flight, so the
            # cancellation has a live group to hit (deterministic order)
            assert sales_started.wait(timeout=30), "peer table never started"
            raise RuntimeError("source gone")
        # SALESTABLE: simulate a long-running sync that dies when its
        # job group is cancelled mid-flight
        sales_started.set()
        assert cancel_seen.wait(timeout=30), "auto-stop never cancelled the peer group"
        raise RuntimeError("job group cancelled")

    monkeypatch.setattr(engine, "sync_table", gated_sync)
    result = orch.process(plans, sources, str(tmp_path / "targets"))
    statuses = {p.name: p.status for p in result.plans}
    assert statuses["CUSTTABLE"] == "Failed"
    assert statuses["SALESTABLE"] == "Cancelled"
    assert len(cancelled) == 1 and "SALESTABLE" in cancelled[0]

    # retry heals BOTH the root failure and the cancelled victim
    monkeypatch.setattr(engine, "sync_table", real_sync)
    orch.retry_failed(result, sources, str(tmp_path / "targets"))
    assert all(p.status == "Completed" for p in result.plans)


def test_workers_pin_fair_pools(spark, sources, tmp_path, monkeypatch):
    """R10 — each worker thread pins its table to its own FAIR pool so
    concurrent tables round-robin (scheduler mode itself is set by
    session.get_spark)."""
    assert spark.conf.get("spark.scheduler.mode") == "FAIR"
    pools: set[str] = set()
    orig = spark.sparkContext.setLocalProperty

    def spy(k, v):
        if k == "spark.scheduler.pool" and v:
            pools.add(v)
        return orig(k, v)

    monkeypatch.setattr(spark.sparkContext, "setLocalProperty", spy)
    engine = SyncEngine(spark, StateStore(str(tmp_path / "state.json")), SyncConfig())
    orch = Orchestrator(spark, engine, workers=2)
    plans = orch.prepare(sources, include=["CUSTTABLE", "SALESTABLE"])
    result = orch.process(plans, sources, str(tmp_path / "targets"))
    assert all(p.status == "Completed" for p in result.plans)
    assert pools == {"sync-CUSTTABLE", "sync-SALESTABLE"}


def test_sql_strategy_executes_template(spark, sources, tmp_path):
    """A sql: strategy's template drives the actual fetch — the custom
    WHERE clause must shape the target (U1 three-variant compilation)."""
    engine = SyncEngine(spark, StateStore(str(tmp_path / "s.json")), SyncConfig())
    orch = Orchestrator(spark, engine, workers=2)
    plans = orch.prepare(
        sources,
        include=["CUSTTABLE"],
        strategy_text=(
            "CUSTTABLE|sql:SELECT TOP (@recordCount) * FROM CUSTTABLE "
            "WHERE RecId >= 10 AND @sysRowVersionFilter ORDER BY RecId DESC"
        ),
    )
    res = orch.process(plans, sources, str(tmp_path / "tgt"))
    assert res.plans[0].status == "Completed", res.plans[0].error
    from d365fo_db_sync_spark.sinks import ParquetTarget

    got = ParquetTarget(str(tmp_path / "tgt" / "CUSTTABLE")).read(spark)
    keys = sorted(r["RecId"] for r in got.collect())
    assert keys == list(range(10, 30))  # template's WHERE applied

    # second cycle goes through the optimized path: the control and
    # incremental variants of the SAME template must keep it in sync
    res2 = orch.process(plans, sources, str(tmp_path / "tgt"))
    assert res2.plans[0].status == "Completed", res2.plans[0].error
    assert res2.plans[0].report.mode == "NO_CHANGE"


def test_truncate_flag_forces_full_refresh(spark, sources, tmp_path):
    engine = SyncEngine(spark, StateStore(str(tmp_path / "s.json")), SyncConfig())
    orch = Orchestrator(spark, engine, workers=1)
    plans = orch.prepare(
        sources, include=["CUSTTABLE"], strategy_text="CUSTTABLE|15 -truncate"
    )
    assert plans[0].strategy.use_truncate
    res = orch.process(plans, sources, str(tmp_path / "tgt"))
    assert res.plans[0].report.mode == "TRUNCATE"
    from d365fo_db_sync_spark.sinks import ParquetTarget

    got = ParquetTarget(str(tmp_path / "tgt" / "CUSTTABLE")).read(spark)
    assert got.count() == 15  # top-15 by key, full refresh every run


def test_post_transfer_sql_script(spark):
    from d365fo_db_sync_spark.orchestrator import run_sql_script

    spark.sql("DROP TABLE IF EXISTS _pt_demo")
    script = """
    -- comment line is skipped

    CREATE TABLE _pt_demo (id INT) USING parquet
    INSERT INTO _pt_demo VALUES (1), (2)
    """
    executed = run_sql_script(spark, script)
    assert len(executed) == 2
    assert spark.table("_pt_demo").count() == 2
    with pytest.raises(RuntimeError, match="line 1"):
        run_sql_script(spark, "SELECT * FROM _no_such_table_xyz")
    spark.sql("DROP TABLE IF EXISTS _pt_demo")


def test_action_chain_gated_on_success(spark):
    from d365fo_db_sync_spark.orchestrator import RunResult, TablePlan, run_action_chain
    from d365fo_db_sync_spark.strategy import Strategy

    calls = []

    def a1(res):
        calls.append("a1")

    def a2(res):
        calls.append("a2")

    ok = RunResult(plans=[TablePlan("T", Strategy("T"), ["A"], status="Completed")])
    assert run_action_chain(ok, [a1, a2]) == ["a1", "a2"]

    calls.clear()
    bad = RunResult(plans=[TablePlan("T", Strategy("T"), ["A"], status="Failed")])
    assert run_action_chain(bad, [a1, a2]) == []
    assert calls == []


def test_process_action_spawns_real_subprocess(spark):
    """U3's external hook as a REAL process (the reference's PowerShell
    launch with -BackupFilePath): argv expansion with the completed
    table list, stdout capture, chain-stopping non-zero exit."""
    from d365fo_db_sync_spark.orchestrator import (
        RunResult,
        TablePlan,
        process_action,
        run_action_chain,
    )
    from d365fo_db_sync_spark.strategy import Strategy

    ok = RunResult(
        plans=[
            TablePlan("T1", Strategy("T1"), ["A"], status="Completed"),
            TablePlan("T2", Strategy("T2"), ["A"], status="Completed"),
        ]
    )
    echo = process_action(["/bin/echo", "done"], arg_template="-Tables={tables}")
    assert run_action_chain(ok, [echo]) == ["process:/bin/echo"]
    assert echo.last_stdout.strip() == "done -Tables=T1,T2"

    boom = process_action(["/bin/sh", "-c", "echo oops >&2; exit 3"])
    with pytest.raises(RuntimeError, match="exited 3: oops"):
        run_action_chain(ok, [boom])


def test_orchestrator_buckets_flag_uses_partial_rewrite_target(spark, tmp_path):
    import os

    from d365fo_db_sync_spark.orchestrator import Orchestrator
    from d365fo_db_sync_spark.state import StateStore
    from d365fo_db_sync_spark.sync import SyncConfig, SyncEngine

    rows = [(i, 1, 100 + i, float(i)) for i in range(40)]
    src = spark.createDataFrame(
        rows, "RecId long, RECVERSION int, SysRowVersion long, AMOUNT double"
    )
    store = StateStore(str(tmp_path / "s.json"))
    engine = SyncEngine(spark, store, SyncConfig(record_count=100))
    orch = Orchestrator(spark, engine)
    plans = orch.prepare({"T1": src}, strategy_text="T1|100 -buckets 8")
    res = orch.process(plans, {"T1": src}, str(tmp_path / "tgt"))
    assert res.plans[0].status == "Completed", res.plans[0].error
    live = os.path.join(str(tmp_path / "tgt"), "T1")
    # hive bucket dirs prove the bucketed target was used
    version_dir = [
        d for d in os.listdir(live) if d.startswith("v_")
    ]
    assert version_dir
    entries = os.listdir(os.path.join(live, version_dir[0]))
    assert any(e.startswith("__kb=") for e in entries)
    got = spark.read.parquet(os.path.join(live, version_dir[0]))
    assert got.count() == 40


def test_orchestrator_manifest_flag_uses_manifest_target(spark, tmp_path):
    import os

    from d365fo_db_sync_spark.orchestrator import Orchestrator
    from d365fo_db_sync_spark.sinks import ManifestParquetTarget
    from d365fo_db_sync_spark.state import StateStore
    from d365fo_db_sync_spark.sync import SyncConfig, SyncEngine

    rows = [(i, 1, 100 + i, float(i)) for i in range(40)]
    src = spark.createDataFrame(
        rows, "RecId long, RECVERSION int, SysRowVersion long, AMOUNT double"
    )
    store = StateStore(str(tmp_path / "s.json"))
    engine = SyncEngine(spark, store, SyncConfig(record_count=100))
    orch = Orchestrator(spark, engine)
    plans = orch.prepare({"T1": src}, strategy_text="T1|100 -buckets 8 -manifest")
    res = orch.process(plans, {"T1": src}, str(tmp_path / "tgt"))
    assert res.plans[0].status == "Completed", res.plans[0].error
    live = os.path.join(str(tmp_path / "tgt"), "T1")
    version_dirs = [d for d in os.listdir(live) if d.startswith("v_")]
    assert version_dirs
    # the manifest file proves the manifest sink was selected
    assert any(
        os.path.exists(os.path.join(live, v, "_manifest.json")) for v in version_dirs
    )
    t = ManifestParquetTarget(live, key="RecId", n_buckets=8)
    assert t.num_rows() == 40
    assert t.read(spark).count() == 40


def test_orchestrator_evolve_flag_end_to_end(spark, tmp_path):
    """-evolve in the strategy DSL must carry all the way through
    prepare/process: a source that grows a column between runs widens
    the target instead of failing the plan."""
    from d365fo_db_sync_spark.orchestrator import Orchestrator
    from d365fo_db_sync_spark.state import StateStore
    from d365fo_db_sync_spark.sync import SyncConfig, SyncEngine

    src1 = spark.createDataFrame(
        [(i, 1, 100 + i, float(i)) for i in range(30)],
        "RecId long, RECVERSION int, SysRowVersion long, AMOUNT double",
    )
    store = StateStore(str(tmp_path / "s.json"))
    engine = SyncEngine(spark, store, SyncConfig(record_count=100))
    orch = Orchestrator(spark, engine)
    tgt_root = str(tmp_path / "tgt")

    plans = orch.prepare({"T1": src1}, strategy_text="T1|100 -buckets 8 -evolve")
    res = orch.process(plans, {"T1": src1}, tgt_root)
    assert res.plans[0].status == "Completed", res.plans[0].error

    src2 = src1.withColumn("NEWCOL", src1["RecId"].cast("string"))
    # bump versions so the optimized path sees changes
    src2 = src2.withColumn("SysRowVersion", src2["SysRowVersion"] + 1000)
    plans2 = orch.prepare({"T1": src2}, strategy_text="T1|100 -buckets 8 -evolve")
    res2 = orch.process(plans2, {"T1": src2}, tgt_root)
    assert res2.plans[0].status == "Completed", res2.plans[0].error

    from d365fo_db_sync_spark.sinks import BucketedParquetTarget
    import os as _os

    t = BucketedParquetTarget(_os.path.join(tgt_root, "T1"), key="RecId", n_buckets=8)
    out = t.read(spark)
    assert "NEWCOL" in out.columns
    assert out.count() == 30
    # (strict-mode rejection of the same drift is pinned at engine level
    # in test_schema_evolution — at orchestrator level a 100%-change
    # cycle legally routes through the truncate fallback, which takes
    # the source schema wholesale)
