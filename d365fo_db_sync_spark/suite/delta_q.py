"""Delta-comparison suite (SURVEY §2.3 J1, §2.9 T-family).

Source/target snapshot pairs are derived deterministically from `orders`
with arithmetic on the unique key, realizing the reference's scenario
matrix (DBSyncTool_Optimization_Spec.md:1597-1612): ~new, ~deleted,
modified-by-version, modified-by-datetime, NULL=NULL datetime matches,
and the RECVERSION=1 fallback collisions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from d365fo_db_sync_spark import delta
from d365fo_db_sync_spark.sources import load_table
from d365fo_db_sync_spark.suite import register

# Shared derivation (Spark + SQL kept in lockstep):
#   src = keys % 10 != 0;  tgt = keys % 10 != 1
#   RECVERSION   = key % 100 (+1 in src when key % 7 == 0 -> modified)
#   CREATEDDATETIME = NULL when key % 17 == 0 (both sides -> NULL=NULL unchanged)
#   MODIFIEDDATETIME: src NULL when key % 19 == 0 (tgt non-NULL -> modified),
#                     src +1 day when key % 13 == 0 (-> modified)


def _src_snapshot(orders: DataFrame) -> DataFrame:
    k = F.col("o_orderkey")
    return orders.filter(F.pmod(k, 10) != 0).select(
        k.alias("RecId"),
        (
            F.pmod(k, 100).cast("int") + F.when(F.pmod(k, 7) == 0, 1).otherwise(0)
        ).alias("RECVERSION"),
        F.when(F.pmod(k, 17) == 0, F.lit(None).cast("timestamp_ntz"))
        .otherwise(F.col("o_orderdate"))
        .alias("CREATEDDATETIME"),
        F.when(F.pmod(k, 19) == 0, F.lit(None).cast("timestamp_ntz"))
        .when(F.pmod(k, 13) == 0, F.col("o_orderdate") + F.make_interval(days=F.lit(1)))
        .otherwise(F.col("o_orderdate"))
        .alias("MODIFIEDDATETIME"),
    )


def _tgt_snapshot(orders: DataFrame) -> DataFrame:
    k = F.col("o_orderkey")
    return orders.filter(F.pmod(k, 10) != 1).select(
        k.alias("RecId"),
        F.pmod(k, 100).cast("int").alias("RECVERSION"),
        F.when(F.pmod(k, 17) == 0, F.lit(None).cast("timestamp_ntz"))
        .otherwise(F.col("o_orderdate"))
        .alias("CREATEDDATETIME"),
        F.col("o_orderdate").alias("MODIFIEDDATETIME"),
    )


_SNAPSHOT_CTES = """
    WITH src AS (
      SELECT o_orderkey AS RecId,
             CAST(o_orderkey % 100 AS INTEGER)
               + CASE WHEN o_orderkey % 7 = 0 THEN 1 ELSE 0 END AS RECVERSION,
             CASE WHEN o_orderkey % 17 = 0 THEN NULL ELSE o_orderdate END AS CREATEDDATETIME,
             CASE WHEN o_orderkey % 19 = 0 THEN NULL
                  WHEN o_orderkey % 13 = 0 THEN o_orderdate + INTERVAL 1 DAY
                  ELSE o_orderdate END AS MODIFIEDDATETIME
      FROM orders WHERE o_orderkey % 10 <> 0
    ), tgt AS (
      SELECT o_orderkey AS RecId,
             CAST(o_orderkey % 100 AS INTEGER) AS RECVERSION,
             CASE WHEN o_orderkey % 17 = 0 THEN NULL ELSE o_orderdate END AS CREATEDDATETIME,
             o_orderdate AS MODIFIEDDATETIME
      FROM orders WHERE o_orderkey % 10 <> 1
    )
"""


@register(
    "delta_classify_family",
    oracle=_SNAPSHOT_CTES
    + """
    , c AS (
      SELECT COALESCE(s.RecId, t.RecId) AS RecId,
             CASE WHEN t.RecId IS NULL THEN 'new'
                  WHEN s.RecId IS NULL THEN 'deleted'
                  WHEN s.RECVERSION = t.RECVERSION
                       AND s.CREATEDDATETIME IS NOT DISTINCT FROM t.CREATEDDATETIME
                       AND s.MODIFIEDDATETIME IS NOT DISTINCT FROM t.MODIFIEDDATETIME
                  THEN 'unchanged' ELSE 'modified' END AS change_type
      FROM src s FULL OUTER JOIN tgt t ON s.RecId = t.RecId
    )
    SELECT 'classify' AS variant, RecId, change_type,
           CAST(NULL AS BIGINT) AS cnt
    FROM c
    UNION ALL
    SELECT 'counts', CAST(NULL AS BIGINT), change_type, COUNT(*)
    FROM c GROUP BY change_type
    """,
    bench=True,
)
def delta_classify_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tagged union of the classification and its logged rollup:

    * ``classify`` — J1/F16/F17, the full-outer 4-way change
      classification (CompareRecords, AxDbDataService.cs:765-867) as
      ONE distributed join; eqNullSafe reproduces ValuesEqual's NULL
      semantics (:872-886).
    * ``counts`` — A6-analog over the classification, the four counts
      the reference logs per table (AxDbDataService.cs:246-248).

    Both branches derive from the same classified frame; the shared
    join subtree's shuffle stages deduplicate via exchange reuse
    (explicit ``ReusedExchange`` with AQE off, runtime stage-cache
    reuse with AQE on), so the scans and shuffle writes happen once —
    only the merge-read of the counts branch is re-executed. The
    engine's production path never pays even that: sync.py computes
    its change counts inside the fused single-pass premerge metrics.
    """
    orders = load_table(spark, sf_dir, "orders")
    classified = delta.classify_changes(
        _src_snapshot(orders), _tgt_snapshot(orders), key="RecId"
    )
    a = classified.select(
        F.lit("classify").alias("variant"),
        "RecId",
        "change_type",
        F.lit(None).cast("long").alias("cnt"),
    )
    b = delta.change_counts(classified).select(
        F.lit("counts").alias("variant"),
        F.lit(None).cast("long").alias("RecId"),
        "change_type",
        F.col("cnt"),
    )
    return a.unionByName(b)


@register(
    "delta_classify_fallback_mode",
    oracle="""
    WITH src AS (
      SELECT o_orderkey AS RecId,
             CASE WHEN o_orderkey % 5 = 0 THEN 1
                  ELSE CAST(o_orderkey % 100 AS INTEGER)
                       + CASE WHEN o_orderkey % 7 = 0 THEN 1 ELSE 0 END
             END AS RECVERSION
      FROM orders WHERE o_orderkey % 10 <> 0
    ), tgt AS (
      SELECT o_orderkey AS RecId,
             CASE WHEN o_orderkey % 5 = 0 AND o_orderkey % 3 <> 0 THEN 1
                  ELSE CAST(o_orderkey % 100 AS INTEGER)
             END AS RECVERSION
      FROM orders WHERE o_orderkey % 10 <> 1
    )
    SELECT COALESCE(s.RecId, t.RecId) AS RecId,
           CASE WHEN t.RecId IS NULL THEN 'new'
                WHEN s.RecId IS NULL THEN 'deleted'
                WHEN s.RECVERSION = 1 THEN
                     CASE WHEN t.RECVERSION = 1 AND s.RecId <= 10000
                          THEN 'unchanged' ELSE 'modified' END
                WHEN s.RECVERSION = t.RECVERSION THEN 'unchanged'
                ELSE 'modified' END AS change_type
    FROM src s FULL OUTER JOIN tgt t ON s.RecId = t.RecId
    """,
)
def delta_classify_fallback_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 fallback mode — no datetime columns, so RECVERSION=1 rows are
    undecidable by version alone; the MaxRecId rule (both sides =1 AND
    key <= stored max-transferred) classifies them unchanged
    (AxDbDataService.cs:801-814)."""
    orders = load_table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    src = orders.filter(F.pmod(k, 10) != 0).select(
        k.alias("RecId"),
        F.when(F.pmod(k, 5) == 0, F.lit(1))
        .otherwise(F.pmod(k, 100).cast("int") + F.when(F.pmod(k, 7) == 0, 1).otherwise(0))
        .cast("int")
        .alias("RECVERSION"),
    )
    tgt = orders.filter(F.pmod(k, 10) != 1).select(
        k.alias("RecId"),
        F.when((F.pmod(k, 5) == 0) & (F.pmod(k, 3) != 0), F.lit(1))
        .otherwise(F.pmod(k, 100).cast("int"))
        .cast("int")
        .alias("RECVERSION"),
    )
    ctx = delta.ComparisonContext(has_recversion=True, has_created=False, has_modified=False)
    return delta.classify_changes(src, tgt, key="RecId", context=ctx, max_transferred_key=10000)
