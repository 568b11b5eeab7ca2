"""Run orchestration: plan set -> parallel per-table execution + report.

Mirrors the reference's two entry points (SURVEY §3): PrepareTableList
(catalog -> include/exclude patterns -> strategy bind -> schema
intersection) and ProcessTables (worker pool over a shared queue,
auto-stop on first failure, retry of failed units —
CopyOrchestrator.cs:414-619).

Spark mapping: cross-table parallelism is a driver-side thread pool
submitting independent Spark jobs (the cluster scheduler interleaves
their tasks; with the FAIR scheduler each worker can pin a pool).
Within one table, Spark's DAG scheduler replaces the reference's
hand-rolled fetch→compare→delete→insert pipeline.
"""

from __future__ import annotations

import os
import threading
import traceback
import uuid
from concurrent.futures import ThreadPoolExecutor, as_completed
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from d365fo_db_sync_spark import projection
from d365fo_db_sync_spark.sinks import ParquetTarget
from d365fo_db_sync_spark.strategy import (
    Fetcher,
    Strategy,
    StrategyType,
    get_strategy,
    parse_strategy_overrides,
)
from d365fo_db_sync_spark.sync import SyncEngine, SyncReport


@dataclass
class TablePlan:
    """The reference's TableInfo: logical plan + status record
    (Models/TableInfo.cs:5-120)."""

    name: str
    strategy: Strategy
    copyable_fields: list[str]
    status: str = "Pending"
    error: str = ""
    report: SyncReport | None = None


@dataclass
class RunResult:
    plans: list[TablePlan] = field(default_factory=list)

    @property
    def failed(self) -> list[TablePlan]:
        return [p for p in self.plans if p.status == "Failed"]

    @property
    def completed(self) -> list[TablePlan]:
        return [p for p in self.plans if p.status == "Completed"]

    def to_df(self, spark: SparkSession) -> DataFrame:
        """The run-report grid (TableInfo's status columns) as a DataFrame."""
        rows = [
            (
                p.name,
                p.strategy.type.value,
                p.status,
                p.report.mode if p.report else None,
                p.report.inserted if p.report else None,
                p.report.deleted if p.report else None,
                round(p.report.duration_sec, 3) if p.report else None,
                p.error or None,
            )
            for p in self.plans
        ]
        return spark.createDataFrame(
            rows,
            "table_name string, strategy string, status string, mode string, "
            "inserted long, deleted long, duration_sec double, error string",
        )


class Orchestrator:
    def __init__(
        self,
        spark: SparkSession,
        engine: SyncEngine,
        workers: int = 10,  # ParallelWorkers default (AppConfiguration.cs:36)
        stop_on_first_failure: bool = True,  # CopyOrchestrator.cs:462-472
    ) -> None:
        self.spark = spark
        self.engine = engine
        self.workers = workers
        self.stop_on_first_failure = stop_on_first_failure

    # -- entry point 1: prepare (CopyOrchestrator.cs:49-341) -----------------

    def prepare(
        self,
        sources: dict[str, DataFrame],
        target_schemas: dict[str, list[str]] | None = None,
        include: list[str] | None = None,
        exclude: list[str] | None = None,
        strategy_text: str = "",
        excluded_fields: list[str] | None = None,
        default_count: int = 10_000,
    ) -> list[TablePlan]:
        overrides = parse_strategy_overrides(strategy_text)
        names = projection.match_table_names(
            sources.keys(), include or ["*"], exclude or []
        )
        global_excl, per_table_excl = projection.parse_field_exclusions(excluded_fields or [])

        plans: list[TablePlan] = []
        for name in names:
            src_fields = sources[name].columns
            tgt_fields = (target_schemas or {}).get(name, src_fields)
            excl = global_excl | per_table_excl.get(name.upper(), set())
            copyable = projection.schema_intersection(src_fields, tgt_fields, excl)
            if not copyable:  # P6-adjacent skip rule (CopyOrchestrator.cs:203-208)
                continue
            plans.append(
                TablePlan(
                    name=name,
                    strategy=get_strategy(name, overrides, default_count),
                    copyable_fields=copyable,
                )
            )
        return plans

    # -- entry point 2: process (CopyOrchestrator.cs:414-523) ----------------

    def process(
        self,
        plans: list[TablePlan],
        sources: dict[str, DataFrame],
        target_root: str,
    ) -> RunResult:
        stop = threading.Event()
        lock = threading.Lock()
        active_groups: dict[str, str] = {}  # table -> Spark job-group id

        def cancel_inflight(except_name: str) -> None:
            # R13: the reference registers its cancellation token to
            # SqlCommand.Cancel() so blocked work aborts server-side
            # (Tier2DataService.cs:455-478, AxDbDataService.cs:536-548).
            # Spark analog: every worker thread runs its table under its
            # own job group; auto-stop cancels the other groups, which
            # interrupts their running tasks cluster-side.
            with lock:
                doomed = [g for n, g in active_groups.items() if n != except_name]
            for group in doomed:
                try:
                    self.spark.sparkContext.cancelJobGroup(group)
                except Exception:  # noqa: BLE001 — best-effort, like Cancel()
                    pass

        def run_one(plan: TablePlan) -> None:
            if stop.is_set():
                return  # stays Pending, like the drained queue on auto-stop
            sc = self.spark.sparkContext
            group = f"sync:{plan.name}:{uuid.uuid4().hex[:8]}"
            # pinned-thread mode makes this thread-local, so each worker
            # tags exactly its own table's jobs
            sc.setJobGroup(group, f"sync {plan.name}", interruptOnCancel=True)
            # R10: each table runs in its own FAIR pool (created on
            # demand, default weight) so concurrent tables share the
            # cluster round-robin instead of queueing FIFO behind the
            # largest one (requires spark.scheduler.mode=FAIR — set by
            # session.get_spark; a no-op under FIFO)
            sc.setLocalProperty("spark.scheduler.pool", f"sync-{plan.name}")
            with lock:
                active_groups[plan.name] = group
            plan.status = "Processing"
            try:
                src = sources[plan.name]
                if plan.strategy.buckets:
                    from d365fo_db_sync_spark.sinks import (
                        BucketedParquetTarget,
                        ManifestParquetTarget,
                    )

                    if plan.strategy.manifest:
                        target: ParquetTarget = ManifestParquetTarget(
                            os.path.join(target_root, plan.name),
                            key=self.engine.config.key,
                            n_buckets=plan.strategy.buckets,
                            retain_versions=plan.strategy.retain or 1,
                            stats_cols=list(plan.strategy.stats_cols),
                            bloom_cols=list(plan.strategy.bloom_cols),
                        )
                    else:
                        target = BucketedParquetTarget(
                            os.path.join(target_root, plan.name),
                            key=self.engine.config.key,
                            n_buckets=plan.strategy.buckets,
                        )
                else:
                    target = ParquetTarget(os.path.join(target_root, plan.name))
                fetcher = Fetcher(
                    self.spark,
                    src,
                    plan.strategy,
                    fields=plan.copyable_fields,
                    key=self.engine.config.key,
                    version=self.engine.config.version,
                    default_count=self.engine.config.record_count,
                )
                plan.report = self.engine.sync_table(
                    plan.name,
                    src.select(*plan.copyable_fields),
                    target,
                    fetcher=fetcher,
                    # -truncate flag and System strategy force full refresh
                    force_truncate=plan.strategy.use_truncate
                    or plan.strategy.type == StrategyType.SYSTEM,
                    evolve_schema=plan.strategy.evolve,
                )
                plan.status = "Completed"
            except Exception as e:  # noqa: BLE001 — per-table fault containment (R11)
                if stop.is_set():
                    # secondary failure after auto-stop = a cancelled
                    # victim, not the root cause (its target is intact:
                    # the staged write never swapped its pointer)
                    plan.status = "Cancelled"
                    plan.error = f"cancelled after first failure: {type(e).__name__}: {e}"
                else:
                    plan.status = "Failed"
                    plan.error = f"{type(e).__name__}: {e}\n{traceback.format_exc(limit=3)}"
                    if self.stop_on_first_failure:
                        stop.set()
                        cancel_inflight(plan.name)
            finally:
                with lock:
                    active_groups.pop(plan.name, None)

        with ThreadPoolExecutor(max_workers=self.workers) as pool:
            futures = [pool.submit(run_one, p) for p in plans]
            for f in as_completed(futures):
                f.result()
        return RunResult(plans=plans)

    def retry_failed(
        self,
        result: RunResult,
        sources: dict[str, DataFrame],
        target_root: str,
    ) -> RunResult:
        """Re-run only failed units (RetryFailedAsync,
        CopyOrchestrator.cs:525-619)."""
        failed = [p for p in result.plans if p.status in ("Failed", "Pending", "Cancelled")]
        for p in failed:
            p.status, p.error = "Pending", ""
        self.process(failed, sources, target_root)
        return result


# -- post-transfer action chain (U2/U3; MainForm.cs:1714-1753) ----------------


def run_sql_script(spark: SparkSession, script: str) -> list[str]:
    """Post-transfer SQL script runner (PostTransferSqlService.cs:23-96):
    line-per-statement, skip blanks and `--` comments, stop on first
    error. Returns the executed statements; raises on the failing one
    with its line number."""
    executed: list[str] = []
    for i, raw in enumerate(script.splitlines(), start=1):
        stmt = raw.strip()
        if not stmt or stmt.startswith("--"):
            continue
        try:
            spark.sql(stmt).collect()
        except Exception as e:  # noqa: BLE001 — stop-on-first-error contract
            raise RuntimeError(f"Post-transfer SQL failed at line {i}: {stmt!r}: {e}") from e
        executed.append(stmt)
    return executed


def run_action_chain(result: RunResult, actions: list) -> list[str]:
    """Post-run hook chain (the reference's SQL -> backup -> PowerShell
    pipeline): each callable receives the RunResult; the chain stops at
    the first failure and each stage is gated on all prior successes —
    and on the run itself having no failed tables."""
    ran: list[str] = []
    if result.failed:
        return ran
    for action in actions:
        action(result)
        ran.append(getattr(action, "__name__", repr(action)))
    return ran


def process_action(command: list[str], arg_template: str | None = None):
    """A chain action that spawns a REAL external process — the
    PowerShell hook's engine equivalent (PowerShellService.cs:16-102:
    the reference launches `powershell -File script -BackupFilePath X`
    after a successful run and fails the chain on a non-zero exit).

    ``command`` is the argv list; ``arg_template`` (e.g.
    ``"-Tables={tables}"``) is appended with ``{tables}`` expanded to a
    comma-joined list of the run's completed table names — the analog
    of the reference passing the backup path. Stdout is captured onto
    the returned action (``action.last_stdout``) for the caller's log;
    a non-zero exit raises, stopping the chain exactly like the
    reference's exit-code check."""
    import subprocess

    def run_process(result: RunResult) -> None:
        argv = list(command)
        if arg_template is not None:
            tables = ",".join(p.name for p in result.completed)
            argv.append(arg_template.format(tables=tables))
        proc = subprocess.run(argv, capture_output=True, text=True)
        run_process.last_stdout = proc.stdout
        if proc.returncode != 0:
            raise RuntimeError(
                f"process action {argv!r} exited {proc.returncode}: {proc.stderr.strip()}"
            )

    run_process.__name__ = f"process:{command[0]}"
    return run_process
