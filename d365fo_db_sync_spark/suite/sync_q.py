"""End-to-end sync-engine suite: the reference's whole pipeline as a
single deterministic, ORACLE-CHECKED scenario.

Two versioned source snapshots are derived from `orders`; the engine
runs a first standard sync (fresh target) and then an incremental cycle
(deletes + modifications + late-arriving "new" rows below the
watermark). The reference's core promise — "make the last N records the
same between source and target" (README.md:9) — means the final target
state IS SQL-expressible: `SELECT ... FROM v2 ORDER BY key DESC LIMIT N`.
The DuckDB oracle asserts exactly that, which transitively verifies mode
selection, the 3-step merge, late-data widening (T4), idempotent insert
(T5) and the watermark commit (T1).

Targets/state live in a per-invocation temp directory (torn down by the
OS); everything else is pure DataFrame.

Scenario derivation (Spark and SQL in lockstep):
  v1 = orders minus keys %89==0 (these arrive "late" in v2 with OLD
       versions -> only recoverable via watermark widening)
  v2 = orders minus keys %97==0 (deletions), with keys %13==0 modified
       (version +2e9, amount +1000)
  version = o_orderkey * 2 (+bump); N = 5000 of 15000 keys.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from d365fo_db_sync_spark.sinks import ParquetTarget
from d365fo_db_sync_spark.sources import load_table
from d365fo_db_sync_spark.state import StateStore
from d365fo_db_sync_spark.suite import register, scratch_dir
from d365fo_db_sync_spark.sync import SyncConfig, SyncEngine

_N = 5000
_BUMP = 2_000_000_000


#: payload columns carried through the sync rows untouched — the sync
#: scenario must move REAL row widths (the reference's no-change claim
#: is exactly "2-column control scan vs full-row transfer",
#: README.md:234), so the harness rows keep the rest of the orders row
#: plus a comment-sized derived string instead of an unrealistically
#: narrow 4-column projection. The oracles are unaffected: every
#: oracle-checked query projects the 4 core columns, and column pruning
#: keeps the payload out of the control scan — which is the point.
def _payload() -> list:
    return [
        F.col("o_custkey"),
        F.col("o_orderdate"),
        F.col("o_orderpriority"),
        F.concat_ws(
            " ",
            F.md5(F.col("o_orderkey").cast("string")),
            F.col("o_orderpriority"),
            F.md5(F.col("o_custkey").cast("string")),
        ).alias("o_comment"),
    ]


def _v1(orders: DataFrame) -> DataFrame:
    k = F.col("o_orderkey")
    return orders.filter(F.pmod(k, 89) != 0).select(
        k.alias("RecId"),
        (k * 2).alias("SysRowVersion"),
        F.col("o_totalprice").alias("amount"),
        F.col("o_orderstatus").alias("status"),
        *_payload(),
    )


def _v2(orders: DataFrame) -> DataFrame:
    k = F.col("o_orderkey")
    modified = F.pmod(k, 13) == 0
    return orders.filter(F.pmod(k, 97) != 0).select(
        k.alias("RecId"),
        (k * 2 + F.when(modified, F.lit(_BUMP)).otherwise(0)).alias("SysRowVersion"),
        F.when(modified, F.col("o_totalprice") + 1000.0)
        .otherwise(F.col("o_totalprice"))
        .alias("amount"),
        F.col("o_orderstatus").alias("status"),
        *_payload(),
    )


_FINAL_STATE_SQL = f"""
    WITH v2 AS (
      SELECT o_orderkey AS RecId,
             o_orderkey * 2
               + CASE WHEN o_orderkey % 13 = 0 THEN {_BUMP} ELSE 0 END AS SysRowVersion,
             CASE WHEN o_orderkey % 13 = 0 THEN o_totalprice + 1000.0
                  ELSE o_totalprice END AS amount,
             o_orderstatus AS status
      FROM orders WHERE o_orderkey % 97 <> 0)
    SELECT RecId, SysRowVersion, amount, status
    FROM v2 ORDER BY RecId DESC LIMIT {_N}
"""


def _run_cycles(spark: SparkSession, sf_dir: str) -> tuple[SyncEngine, ParquetTarget, list]:
    orders = load_table(spark, sf_dir, "orders")
    work = scratch_dir("syncq_")
    store = StateStore(f"{work}/state.json")
    engine = SyncEngine(spark, store, SyncConfig(record_count=_N))
    target = ParquetTarget(f"{work}/orders_tgt")
    reports = [
        engine.sync_table("orders", _v1(orders), target),
        engine.sync_table("orders", _v2(orders), target),
    ]
    return engine, target, reports


@register("sync_incremental_e2e", oracle=_FINAL_STATE_SQL, bench=True)
def sync_incremental_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full pipeline: standard first sync, then an incremental cycle over
    a mutated source (deletes, version-bumped modifications, late rows
    below the watermark). Returns the final target table; the oracle is
    the engine's contract — the last N source rows, verbatim."""
    engine, target, reports = _run_cycles(spark, sf_dir)
    assert reports[1].mode == "INCREMENTAL", reports[1]
    return target.read(spark).select("RecId", "SysRowVersion", "amount", "status")


#: Side-channel for bench.py: per-cycle wall times of the most recent
#: sync_noop_fastpath run. The reference's headline claim is that a
#: no-change resync is ~15x cheaper than a first sync
#: (TESTING_GUIDE.md:331-333); the oracled query times the WHOLE
#: two-cycle harness, so bench reports these sub-timings separately to
#: give that claim a direct number.
NOOP_CYCLE_TIMINGS: dict[str, float] = {}


@register(
    "sync_noop_fastpath",
    oracle=f"""
    SELECT 'NO_CHANGE' AS mode,
           LEAST({_N}, (SELECT COUNT(*) FROM orders WHERE o_orderkey % 89 <> 0))
             AS tgt_rows
    """,
    bench=True,
)
def sync_noop_fastpath(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R6 perfect-sync short circuit: re-syncing an unchanged source must
    touch nothing — no deletes, no inserts, NO_CHANGE mode. Returns the
    observed (mode, target row count) as a 1-row frame."""
    orders = load_table(spark, sf_dir, "orders")
    work = scratch_dir("syncq_")
    store = StateStore(f"{work}/state.json")
    engine = SyncEngine(spark, store, SyncConfig(record_count=_N))
    target = ParquetTarget(f"{work}/orders_tgt")
    t0 = time.time()
    engine.sync_table("orders", _v1(orders), target)
    t1 = time.time()
    rpt = engine.sync_table("orders", _v1(orders), target)
    t2 = time.time()
    NOOP_CYCLE_TIMINGS["first_sync"] = round(t1 - t0, 3)
    NOOP_CYCLE_TIMINGS["noop_cycle"] = round(t2 - t1, 3)
    n = target.read(spark).count()
    return spark.createDataFrame([(rpt.mode, n)], "mode string, tgt_rows long")


@register(
    "sync_truncate_fallback",
    oracle=f"""
    WITH v2 AS (
      SELECT o_orderkey AS RecId,
             o_orderkey * 2 + {_BUMP} AS SysRowVersion,
             o_totalprice + 1000.0 AS amount,
             o_orderstatus AS status
      FROM orders)
    SELECT RecId, SysRowVersion, amount, status
    FROM v2 ORDER BY RecId DESC LIMIT {_N}
    """,
)
def sync_truncate_fallback(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R5/T2 cost-based fallback: when every row in the window changed
    (100% >= the 40% threshold), the engine must pick TRUNCATE and fully
    refresh — the oracle is again the last-N contract over the new
    source version."""
    orders = load_table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    all_modified = orders.select(
        k.alias("RecId"),
        (k * 2 + F.lit(_BUMP)).alias("SysRowVersion"),
        (F.col("o_totalprice") + 1000.0).alias("amount"),
        F.col("o_orderstatus").alias("status"),
    )
    work = scratch_dir("syncq_")
    store = StateStore(f"{work}/state.json")
    engine = SyncEngine(spark, store, SyncConfig(record_count=_N))
    target = ParquetTarget(f"{work}/orders_tgt")
    engine.sync_table("orders", _v1(orders), target)
    rpt = engine.sync_table("orders", all_modified, target)
    assert rpt.mode == "TRUNCATE", rpt
    return target.read(spark).select("RecId", "SysRowVersion", "amount", "status")


@register(
    "strategy_sql_template_fetch",
    oracle=f"""
    SELECT o_orderkey, o_totalprice, o_orderstatus
    FROM orders WHERE o_totalprice > 100000
    ORDER BY o_orderkey DESC LIMIT 2000
    """,
)
def strategy_sql_template_fetch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1 — the strategy DSL's sql: template path end-to-end: parse a
    DSL line, compile the template (star expansion to the copyable field
    list, @recordCount substitution, @sysRowVersionFilter folded to
    (1=1) for the full pass, TOP(n) hoisted to LIMIT), execute through
    spark.sql so Catalyst prunes/pushes the user query like any other
    plan (CopyOrchestrator.cs:1913-1935)."""
    from d365fo_db_sync_spark.strategy import Fetcher, parse_strategy_line

    s = parse_strategy_line(
        "ORDERS|2000|sql:SELECT TOP (@recordCount) * FROM ORDERS "
        "WHERE o_totalprice > 100000 AND @sysRowVersionFilter "
        "ORDER BY o_orderkey DESC"
    )
    orders = load_table(spark, sf_dir, "orders")
    f = Fetcher(
        spark, orders, s,
        fields=["o_orderkey", "o_totalprice", "o_orderstatus"],
        key="o_orderkey", version="o_orderdate",
    )
    return f.full()


@register(
    "orchestrator_multi_table_e2e",
    oracle="""
    WITH a AS (SELECT o_orderkey AS k FROM orders ORDER BY k DESC LIMIT 2000),
         b AS (SELECT c_custkey AS k FROM customer ORDER BY k DESC LIMIT 1000)
    SELECT 'ORDERS_A' AS table_name, 'STANDARD' AS mode, COUNT(*) AS n_rows,
           MIN(k) AS min_key, MAX(k) AS max_key, CAST(3 AS BIGINT) AS n_cols
    FROM a
    UNION ALL
    SELECT 'CUSTOMER_B', 'TRUNCATE', COUNT(*), MIN(k), MAX(k), CAST(3 AS BIGINT)
    FROM b
    """,
)
def orchestrator_multi_table_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole prepare->process pipeline over two tables at once
    (CopyOrchestrator.cs:49-523 as one flow): strategy DSL binds a
    RecId top-N to one table and a -truncate full refresh to the other,
    a field exclusion shrinks the copyable schema (P1/P2), and the
    parallel worker pool runs both syncs concurrently. The oracle is
    the last-N contract per table plus the strategy-determined mode and
    the post-exclusion column count."""
    from d365fo_db_sync_spark.orchestrator import Orchestrator

    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    ko, kc = F.col("o_orderkey"), F.col("c_custkey")
    sources = {
        "ORDERS_A": orders.select(
            ko.alias("RecId"), (ko * 2).alias("SysRowVersion"),
            F.col("o_totalprice").alias("amount"),
        ),
        "CUSTOMER_B": customer.select(
            kc.alias("RecId"), (kc * 3).alias("SysRowVersion"),
            F.col("c_acctbal").alias("bal"), F.col("c_mktsegment").alias("seg"),
        ),
    }
    work = scratch_dir("orch_e2e_")
    engine = SyncEngine(spark, StateStore(f"{work}/state.json"), SyncConfig())
    orch = Orchestrator(spark, engine, workers=4)
    plans = orch.prepare(
        sources,
        strategy_text="ORDERS_A|2000\nCUSTOMER_B|1000 -truncate",
        excluded_fields=["CUSTOMER_B.seg"],
    )
    result = orch.process(plans, sources, f"{work}/targets")
    assert not result.failed, [p.error for p in result.failed]

    out = []
    for p in result.plans:
        tgt = ParquetTarget(f"{work}/targets/{p.name}").read(spark)
        row = tgt.agg(
            F.count("*").alias("n"), F.min("RecId").alias("mn"), F.max("RecId").alias("mx")
        ).first()
        out.append(
            (p.name, p.report.mode, row["n"], row["mn"], row["mx"], len(tgt.columns))
        )
    return spark.createDataFrame(
        out,
        "table_name string, mode string, n_rows long, min_key long, "
        "max_key long, n_cols long",
    )
