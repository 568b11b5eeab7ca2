"""JdbcSink contract tests against a stub statement runner.

No database ships in this environment, so the sink's behavior is pinned
by the statements it emits and their order — the same contract the
reference exercises against SQL Server (AxDbDataService.cs:316-318,
369-397 trigger bracketing; 909-932 chunked deletes).
"""

from __future__ import annotations

import pytest

from d365fo_db_sync_spark.sinks import JdbcSink


class Recorder:
    def __init__(self, fail_on: str | None = None):
        self.statements: list[str] = []
        self.fail_on = fail_on

    def __call__(self, stmt: str) -> None:
        self.statements.append(stmt)
        if self.fail_on and self.fail_on in stmt:
            raise RuntimeError(f"stub failure on: {stmt}")


@pytest.fixture()
def sink():
    return JdbcSink("jdbc:sqlserver://h:1433;db=x", "CUSTTABLE", delete_batch_size=3)


def test_trigger_sql_shapes(sink):
    assert sink.trigger_disable_sql() == "ALTER TABLE [CUSTTABLE] DISABLE TRIGGER ALL"
    assert sink.trigger_enable_sql() == "ALTER TABLE [CUSTTABLE] ENABLE TRIGGER ALL"


def test_write_brackets_load_with_trigger_toggle(sink, monkeypatch):
    events: list[str] = []
    runner = Recorder()
    monkeypatch.setattr(sink, "_save", lambda df, mode: events.append(f"save:{mode}"))
    sink.write(object(), mode="append", statement_runner=runner)
    # disable strictly BEFORE the load, enable strictly AFTER
    assert runner.statements == [
        "ALTER TABLE [CUSTTABLE] DISABLE TRIGGER ALL",
        "ALTER TABLE [CUSTTABLE] ENABLE TRIGGER ALL",
    ]
    assert events == ["save:append"]


def test_write_reenables_triggers_when_load_raises(sink, monkeypatch):
    # T8 crash contract: triggers must never stay disabled
    runner = Recorder()

    def boom(df, mode):
        raise RuntimeError("bulk copy failed")

    monkeypatch.setattr(sink, "_save", boom)
    with pytest.raises(RuntimeError, match="bulk copy failed"):
        sink.write(object(), statement_runner=runner)
    assert runner.statements[-1] == "ALTER TABLE [CUSTTABLE] ENABLE TRIGGER ALL"


def test_write_swallows_reenable_failure(sink, monkeypatch):
    # reference catch-all: a failed re-enable must not mask the original
    # error (or raise at all on a successful load)
    runner = Recorder(fail_on="ENABLE")
    monkeypatch.setattr(sink, "_save", lambda df, mode: None)
    sink.write(object(), statement_runner=runner)  # no raise

    def boom(df, mode):
        raise ValueError("original")

    monkeypatch.setattr(sink, "_save", boom)
    with pytest.raises(ValueError, match="original"):
        sink.write(object(), statement_runner=Recorder(fail_on="ENABLE"))


def test_write_custom_pre_post_sql(sink, monkeypatch):
    runner = Recorder()
    monkeypatch.setattr(sink, "_save", lambda df, mode: None)
    sink.write(
        object(),
        statement_runner=runner,
        pre_sql=["SET IDENTITY_INSERT CUSTTABLE ON"],
        post_sql=["SET IDENTITY_INSERT CUSTTABLE OFF"],
    )
    assert runner.statements == [
        "SET IDENTITY_INSERT CUSTTABLE ON",
        "SET IDENTITY_INSERT CUSTTABLE OFF",
    ]


def test_execute_deletes_batches_and_order(sink):
    runner = Recorder()
    n = sink.execute_deletes(runner, "RecId", list(range(1, 8)))  # 7 ids, chunk 3
    assert n == 3
    assert runner.statements == [
        "DELETE FROM CUSTTABLE WHERE RecId IN (1,2,3)",
        "DELETE FROM CUSTTABLE WHERE RecId IN (4,5,6)",
        "DELETE FROM CUSTTABLE WHERE RecId IN (7)",
    ]


def test_execute_deletes_empty_is_noop(sink):
    runner = Recorder()
    assert sink.execute_deletes(runner, "RecId", []) == 0
    assert runner.statements == []


def test_execute_deletes_default_batch_size_matches_reference():
    # DELETE_BATCH_SIZE = 5000 (AxDbDataService.cs:11)
    sink = JdbcSink("jdbc:x", "T")
    stmts = sink.delete_in_batches_sql("RecId", list(range(5001)))
    assert len(stmts) == 2
    assert stmts[0].count(",") == 4999


def test_snapshot_progress_reporting(tmp_path):
    # S13 progress analog of the reference's percent_complete poll:
    # monotonic percentages ending at 100, estimates appear once bytes
    # have moved, and a crashing callback never fails the backup.
    from pyspark.sql import SparkSession

    from d365fo_db_sync_spark.sinks import ParquetTarget, snapshot

    spark = SparkSession.getActiveSession() or (
        SparkSession.builder.master("local[2]").getOrCreate()
    )
    tgt = ParquetTarget(str(tmp_path / "t"))
    tgt.overwrite(spark.range(1000).repartition(4))

    calls: list[tuple[float, float | None]] = []
    dest = snapshot(
        tgt, str(tmp_path / "snaps"), "s1", progress=lambda p, e: calls.append((p, e))
    )
    assert spark.read.parquet(dest).count() == 1000
    pcts = [p for p, _ in calls]
    assert pcts == sorted(pcts) and pcts[-1] == 100.0
    assert any(e is not None for _, e in calls[1:])

    def boom(p, e):
        raise RuntimeError("monitor died")

    dest2 = snapshot(tgt, str(tmp_path / "snaps"), "s2", progress=boom)
    assert spark.read.parquet(dest2).count() == 1000
