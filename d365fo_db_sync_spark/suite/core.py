"""Core relational suite: scans, projections, aggregations, joins,
set ops, scalar functions (SURVEY §2.1-2.8).

Each query cites the reference operator ids it covers.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from d365fo_db_sync_spark import projection, scans
from d365fo_db_sync_spark.operators import setops, windows
from d365fo_db_sync_spark.sources import load_table
from d365fo_db_sync_spark.suite import register

# ---------------------------------------------------------------------------
# §2.1 scans


@register(
    "topn_orders_snapshot",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderpriority
    FROM orders ORDER BY o_orderkey DESC LIMIT 1000
    """,
    bench=True,
)
def topn_orders_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5/O1/P1 — the flagship shape: last N rows by unique key with a
    pruned projection (Tier2DataService.cs:278-286). Catalyst plans
    TakeOrderedAndProject — distributed top-k, no full sort."""
    orders = load_table(spark, sf_dir, "orders")
    return scans.top_n_by_key(
        orders,
        "o_orderkey",
        1000,
        fields=["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority"],
    )


@register(
    "scan_control_recency_family",
    oracle="""
    SELECT 'control' AS variant, o_orderkey AS key1,
           CAST(NULL AS BIGINT) AS key2, o_orderdate AS ver
    FROM (SELECT * FROM orders ORDER BY o_orderkey DESC LIMIT 2000)
    UNION ALL
    SELECT 'recency', l_orderkey, CAST(l_linenumber AS BIGINT), l_shipdate
    FROM lineitem
    WHERE l_shipdate > TIMESTAMP '2001-09-01 00:00:00' - INTERVAL 90 DAY
    """,
)
def scan_control_recency_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tagged union of the two sidecar scan shapes:

    * ``control`` — S6, the 2-column (key, version) control sidecar
      (Tier2DataService.cs:336-376); the 99%-transfer-cut is the pruned
      ReadSchema, pinned in test_plan_properties.
    * ``recency`` — S8, the modified-in-last-N-days filter
      (Tier2DataService.cs:291-311); fixed anchor for determinism.
    """
    orders = load_table(spark, sf_dir, "orders")
    control = scans.control_scan(
        orders, key="o_orderkey", version="o_orderdate", n=2000
    ).select(
        F.lit("control").alias("variant"),
        F.col("o_orderkey").alias("key1"),
        F.lit(None).cast("long").alias("key2"),
        F.col("o_orderdate").alias("ver"),
    )
    li = load_table(spark, sf_dir, "lineitem")
    recency = scans.recency_scan(
        li, days=90, now="2001-09-01 00:00:00", ts_col="l_shipdate"
    ).select(
        F.lit("recency").alias("variant"),
        F.col("l_orderkey").alias("key1"),
        F.col("l_linenumber").cast("long").alias("key2"),
        F.col("l_shipdate").alias("ver"),
    )
    return control.unionByName(recency)


@register(
    "watermark_scan_events",
    oracle="""
    SELECT event_id, ts, user_id, event_type FROM events
    WHERE ts >= TIMESTAMP '2024-01-20 00:00:00' AND event_id >= 500
    ORDER BY event_id DESC LIMIT 2000
    """,
)
def watermark_scan_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S7/T1 — watermark + key-floor incremental fetch
    (Tier2DataService.cs:381-434); both range predicates push to the scan.

    ``events.ts`` is a native parquet timestamp, so the ``ts >=``
    watermark and the ``event_id >=`` key floor both reach the reader as
    PushedFilters (row-group min/max skipping) — pinned by
    tests/test_plan_properties.py."""
    events = load_table(spark, sf_dir, "events")
    return scans.watermark_scan(
        events,
        version_threshold="2024-01-20 00:00:00",
        min_key=500,
        key="event_id",
        version="ts",
        fields=["event_id", "ts", "user_id", "event_type"],
        n=2000,
    )


@register(
    "catalog_discovery_stats",
    oracle="""
    SELECT * FROM (
      SELECT 'region' AS table_name, COUNT(*) AS row_count FROM region UNION ALL
      SELECT 'nation', COUNT(*) FROM nation UNION ALL
      SELECT 'customer', COUNT(*) FROM customer UNION ALL
      SELECT 'supplier', COUNT(*) FROM supplier UNION ALL
      SELECT 'part', COUNT(*) FROM part UNION ALL
      SELECT 'orders', COUNT(*) FROM orders UNION ALL
      SELECT 'lineitem', COUNT(*) FROM lineitem UNION ALL
      SELECT 'events', COUNT(*) FROM events UNION ALL
      SELECT 'documents', COUNT(*) FROM documents UNION ALL
      SELECT 'embeddings', COUNT(*) FROM embeddings
    ) WHERE row_count > 0
    """,
)
def catalog_discovery_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1/A1/O2 — catalog discovery: per-table stats with empty-table
    filter (Tier2DataService.cs:35-97). Parquet footers supply counts
    without full scans; expressed as distributed counts + union."""
    from d365fo_db_sync_spark.catalog import discovery_stats
    from d365fo_db_sync_spark.sources import CORPUS_TABLES

    tables = {t: load_table(spark, sf_dir, t) for t in CORPUS_TABLES}
    return discovery_stats(tables)


# ---------------------------------------------------------------------------
# §2.4 aggregations


@register(
    "grouped_agg_having",
    oracle="""
    SELECT 'having' AS fam, l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
           COUNT(*) AS cnt,
           CAST(NULL AS DOUBLE) AS bytes_per_row
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    HAVING COUNT(*) > 100
    UNION ALL
    SELECT 'case', l_returnflag, CAST(NULL AS VARCHAR),
           CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
           COUNT(*),
           CASE WHEN COUNT(*) > 0
                THEN CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
                ELSE 0.0 END
    FROM lineitem GROUP BY l_returnflag
    """,
    bench=True,
)
def grouped_agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/A2/F17 analog of TPC-H Q1 — grouped agg with HAVING
    (Tier2DataService.cs:46-62) plus the CASE-guarded bytesPerRow
    derived metric (Tier2DataService.cs:51-55), fused into ONE
    rollup pass (single scan, Expand + map-side partial agg, one
    narrow shuffle of one row per grouping). The two grouping_id
    branches verify distinct §2 ids, tagged by `fam`."""
    li = load_table(spark, sf_dir, "lineitem")
    dec = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    # ONE scan for both branches: GROUPING SETS ((flag, status),
    # (flag)) computes exactly the two groupings in a single pass
    # (Expand x2 + partial agg + one shuffle) where a tagged UNION ALL
    # would scan lineitem twice — at 100 TB the second full scan is the
    # dominant waste. grouping_id routes each output row to its family
    # shape.
    # decimal casts staged BEFORE the Expand so each input row is cast
    # once, not once per grouping set
    staged = li.select(
        "l_returnflag",
        "l_linestatus",
        dec("l_quantity").alias("__qd"),
        dec("l_extendedprice").alias("__pd"),
    )
    g = (
        staged.groupingSets(
            [["l_returnflag", "l_linestatus"], ["l_returnflag"]],
            "l_returnflag",
            "l_linestatus",
        )
        .agg(
            F.sum("__qd").cast("double").alias("sq"),
            F.sum("__pd").cast("double").alias("sp"),
            F.count("*").alias("cnt"),
            F.grouping_id().alias("gid"),
        )
        .filter((F.col("gid") == 1) | ((F.col("gid") == 0) & (F.col("cnt") > 100)))
    )
    is_having = F.col("gid") == 0
    return g.select(
        F.when(is_having, "having").otherwise("case").alias("fam"),
        "l_returnflag",
        "l_linestatus",  # rollup already NULLs it on the gid=1 grouping
        F.when(is_having, F.col("sq")).alias("sum_qty"),
        F.when(is_having, F.col("sp")).alias("sum_price"),
        F.when(is_having, F.col("sq") / F.col("cnt")).alias("avg_qty"),
        "cnt",
        F.when(
            ~is_having,
            F.when(F.col("cnt") > 0, F.col("sp") / F.col("cnt")).otherwise(0.0),
        ).alias("bytes_per_row"),
    )


@register(
    "minmax_keys_per_status",
    oracle="""
    SELECT 'minmax' AS fam, o_orderstatus AS grp,
           MIN(o_orderkey) AS min_key, MAX(o_orderkey) AS max_key,
           MIN(o_orderdate) AS min_date, MAX(o_orderdate) AS max_date,
           CAST(NULL AS DOUBLE) AS p50_qty, CAST(NULL AS DOUBLE) AS p95_qty,
           CAST(NULL AS DOUBLE) AS max_qty
    FROM orders GROUP BY o_orderstatus
    UNION ALL
    SELECT 'pct', l_returnflag,
           CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
           CAST(NULL AS TIMESTAMP), CAST(NULL AS TIMESTAMP),
           quantile_cont(l_quantity, 0.5), quantile_cont(l_quantity, 0.95),
           MAX(l_quantity)
    FROM lineitem GROUP BY l_returnflag
    """,
)
def minmax_keys_per_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3/A4/A5 — min/max over keys and timestamps
    (CopyOrchestrator.cs:866-869, AxDbDataService.cs:492-495,1093-1109),
    unioned with the §2.4 exact-percentile extension (Spark `percentile`
    == DuckDB `quantile_cont`; low-cardinality int input keeps the
    interpolation bit-identical across engines). At 100 TB the
    percentile branch swaps in approx_percentile (mergeable sketch)."""
    orders = load_table(spark, sf_dir, "orders")
    minmax = orders.groupBy("o_orderstatus").agg(
        F.min("o_orderkey").alias("min_key"),
        F.max("o_orderkey").alias("max_key"),
        F.min("o_orderdate").alias("min_date"),
        F.max("o_orderdate").alias("max_date"),
    ).select(
        F.lit("minmax").alias("fam"),
        F.col("o_orderstatus").alias("grp"),
        "min_key",
        "max_key",
        "min_date",
        "max_date",
        F.lit(None).cast("double").alias("p50_qty"),
        F.lit(None).cast("double").alias("p95_qty"),
        F.lit(None).cast("double").alias("max_qty"),
    )
    li = load_table(spark, sf_dir, "lineitem")
    pct = li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_quantity, 0.5)").alias("p50_qty"),
        F.expr("percentile(l_quantity, 0.95)").alias("p95_qty"),
        F.max("l_quantity").alias("max_qty"),
    ).select(
        F.lit("pct").alias("fam"),
        F.col("l_returnflag").alias("grp"),
        F.lit(None).cast("long").alias("min_key"),
        F.lit(None).cast("long").alias("max_key"),
        F.lit(None).cast("timestamp_ntz").alias("min_date"),
        F.lit(None).cast("timestamp_ntz").alias("max_date"),
        "p50_qty",
        "p95_qty",
        "max_qty",
    )
    return minmax.unionAll(pct)


@register(
    "counts_plain_and_filtered",
    oracle="""
    WITH m AS (
      SELECT COUNT(*) AS total_rows,
             COUNT(*) FILTER (WHERE o_orderdate >= TIMESTAMP '2000-01-01') AS src_changed,
             COUNT(*) FILTER (WHERE o_orderdate >= TIMESTAMP '2001-01-01') AS tgt_changed,
             COUNT(*) + 25 AS tgt_total
      FROM orders
    )
    SELECT total_rows,
           src_changed AS changed_rows,
           CAST(src_changed + tgt_changed AS DOUBLE) / total_rows * 100.0 AS change_percent,
           CAST(tgt_total - total_rows AS DOUBLE) / total_rows * 100.0 AS excess_percent
    FROM m
    """,
)
def counts_plain_and_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6/A7/P7/A9 — total count + changed-above-watermark count
    (AxDbDataService.cs:1053-1063, 1004-1018) plus the change%%/excess%%
    expressions that drive the incremental-vs-truncate decision
    (CopyOrchestrator.cs:884-891), fused into ONE aggregation pass —
    the same all-metrics-in-one-agg discipline SyncEngine uses."""
    orders = load_table(spark, sf_dir, "orders")
    m = orders.agg(
        F.count("*").alias("total_rows"),
        F.count(F.when(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp_ntz"), 1)).alias(
            "src_changed"
        ),
        F.count(F.when(F.col("o_orderdate") >= F.lit("2001-01-01").cast("timestamp_ntz"), 1)).alias(
            "tgt_changed"
        ),
        (F.count("*") + 25).alias("tgt_total"),
    )
    return m.select(
        "total_rows",
        F.col("src_changed").alias("changed_rows"),
        ((F.col("src_changed") + F.col("tgt_changed")).cast("double") / F.col("total_rows") * 100.0).alias(
            "change_percent"
        ),
        ((F.col("tgt_total") - F.col("total_rows")).cast("double") / F.col("total_rows") * 100.0).alias(
            "excess_percent"
        ),
    )


@register(
    "sequence_gap_fence",
    oracle="""
    SELECT GREATEST(MAX(o_orderkey), 42) + 10000 AS next_seq FROM orders
    """,
)
def sequence_gap_fence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T7/A5/F13 — sequence fencing: ``greatest(max(key), current_seq) +
    gap`` (AxDbDataService.cs:489-531, gap const :12)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.agg(
        (F.greatest(F.max("o_orderkey"), F.lit(42)) + 10000).alias("next_seq")
    )


# ---------------------------------------------------------------------------
# §2.3 joins (J2-J7; J1 lives in delta_q)


@register(
    "anti_semi_join_family",
    oracle="""
    SELECT 'missing' AS fam, l_orderkey AS key,
           CAST(NULL AS DOUBLE) AS price, CAST(NULL AS VARCHAR) AS status
    FROM (
      SELECT DISTINCT l_orderkey FROM lineitem li
      WHERE NOT EXISTS (
        SELECT 1 FROM orders o WHERE o.o_totalprice > 150000 AND o.o_orderkey = li.l_orderkey
      ))
    UNION ALL
    SELECT 'deleted', o_orderkey, CAST(NULL AS DOUBLE), CAST(NULL AS VARCHAR)
    FROM orders o
    WHERE NOT EXISTS (SELECT 1 FROM lineitem li WHERE li.l_orderkey = o.o_orderkey)
    UNION ALL
    SELECT 'doomed', o_orderkey, o_totalprice, CAST(NULL AS VARCHAR)
    FROM orders o
    WHERE EXISTS (
      SELECT 1 FROM lineitem li
      WHERE li.l_orderkey = o.o_orderkey AND li.l_shipdate > TIMESTAMP '2001-06-01'
    )
    UNION ALL
    SELECT 'surv', o_orderkey, CAST(NULL AS DOUBLE), o_orderstatus
    FROM orders o
    WHERE EXISTS (SELECT 1 FROM lineitem li WHERE li.l_orderkey = o.o_orderkey)
    """,
)
def anti_semi_join_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2/J3/J4/J5/E2 — the four delta-join shapes in one tagged union:

    * `missing`  — left-anti join replacing the reference's HashSet
      difference (CopyOrchestrator.cs:1018-1022);
    * `deleted`  — target-side keys absent from source
      (AxDbDataService.cs:857-864);
    * `doomed`   — modified-above-watermark delete set as a left-semi
      join (AxDbDataService.cs:1129-1144);
    * `surv`     — NOT-EXISTS delete expressed as keep-the-survivors
      (AxDbDataService.cs:1160-1173).

    Each branch stays a distributed anti/semi hash join at any scale;
    Catalyst dedups the shared scans via exchange reuse."""
    from d365fo_db_sync_spark.delta import deleted_keys, doomed_rows, missing_keys, surviving_rows

    orders = load_table(spark, sf_dir, "orders")
    li_keys = load_table(spark, sf_dir, "lineitem").select(F.col("l_orderkey"))
    nul_d = F.lit(None).cast("double")
    nul_s = F.lit(None).cast("string")

    big_orders = orders.filter(F.col("o_totalprice") > 150000).select(
        F.col("o_orderkey").alias("l_orderkey")
    )
    missing = (
        missing_keys(li_keys, big_orders, key="l_orderkey")
        .distinct()
        .select(
            F.lit("missing").alias("fam"),
            F.col("l_orderkey").alias("key"),
            nul_d.alias("price"),
            nul_s.alias("status"),
        )
    )
    deleted = deleted_keys(
        li_keys.select(F.col("l_orderkey").alias("k")),
        orders.select(F.col("o_orderkey").alias("k")),
        key="k",
    ).select(F.lit("deleted").alias("fam"), F.col("k").alias("key"), nul_d.alias("price"), nul_s.alias("status"))
    doomed = doomed_rows(
        orders,
        load_table(spark, sf_dir, "lineitem").select(
            F.col("l_orderkey").alias("o_orderkey"), F.col("l_shipdate").alias("ver")
        ),
        version_threshold="2001-06-01",
        key="o_orderkey",
        version="ver",
    ).select(
        F.lit("doomed").alias("fam"),
        F.col("o_orderkey").alias("key"),
        F.col("o_totalprice").alias("price"),
        nul_s.alias("status"),
    )
    surv = surviving_rows(
        orders, li_keys.select(F.col("l_orderkey").alias("o_orderkey")), key="o_orderkey"
    ).select(
        F.lit("surv").alias("fam"),
        F.col("o_orderkey").alias("key"),
        nul_d.alias("price"),
        F.col("o_orderstatus").alias("status"),
    )
    return missing.unionAll(deleted).unionAll(doomed).unionAll(surv)


@register(
    "dim_join_rollup",
    oracle="""
    SELECT r_name, n_name,
           COUNT(*) AS num_customers,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r_name, n_name
    """,
    bench=True,
)
def dim_join_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J7/A1 — metadata-style equi-joins (Tier2DataService.cs:56-57,
    175-184). nation/region are broadcast by Catalyst (tiny dims), so the
    only shuffle is the final group-by."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count("*").alias("num_customers"),
            F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double").alias("total_acctbal"),
        )
    )


# ---------------------------------------------------------------------------
# §2.7 set operations


@register(
    "setop_family",
    oracle="""
    SELECT 'intersect' AS op, custkey AS key, CAST(NULL AS VARCHAR) AS attr FROM (
      SELECT o_custkey AS custkey FROM orders
      INTERSECT
      SELECT c_custkey FROM customer WHERE c_acctbal > 0)
    UNION ALL
    SELECT 'intersect_all', custkey, CAST(NULL AS VARCHAR) FROM (
      SELECT o_custkey AS custkey FROM orders
      INTERSECT ALL
      SELECT c_custkey FROM customer)
    UNION ALL
    SELECT 'except', custkey, CAST(NULL AS VARCHAR) FROM (
      SELECT c_custkey AS custkey FROM customer
      EXCEPT
      SELECT o_custkey FROM orders)
    UNION ALL
    SELECT 'except_all', custkey, CAST(NULL AS VARCHAR) FROM (
      SELECT o_custkey AS custkey FROM orders
      EXCEPT ALL
      SELECT c_custkey FROM customer)
    UNION ALL
    SELECT 'union_distinct', nationkey, CAST(NULL AS VARCHAR) FROM (
      SELECT s_nationkey AS nationkey FROM supplier
      UNION
      SELECT c_nationkey FROM customer)
    UNION ALL
    SELECT 'union_all', o_orderkey, o_orderstatus FROM (
      SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderstatus = 'F'
      UNION ALL
      SELECT o_orderkey, o_orderstatus FROM orders WHERE o_totalprice > 300000)
    UNION ALL
    SELECT 'distinct_pairs', CAST(NULL AS BIGINT),
           CONCAT(o_orderstatus, '|', o_orderpriority)
    FROM (SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders)
    """,
)
def setop_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E1-E5 — the whole set-operation surface in one tagged union:

    * `intersect` / `intersect_all` — E1 (CopyOrchestrator.cs:190;
      ALL = multiplicity-preserving engine extension);
    * `except` / `except_all`      — E2 (CopyOrchestrator.cs:385-399);
    * `union_distinct`             — E3 (AxDbDataService.cs:266-270);
    * `union_all`                  — E5 strategy-SQL pattern (README.md:120);
    * `distinct_pairs`             — E4 dropDuplicates (CopyOrchestrator.cs:68-77).

    Each branch is the dedicated operator from operators/setops.py;
    duplicates in the ALL variants are preserved through the row-level
    hash compare."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nul_k = F.lit(None).cast("long")
    nul_a = F.lit(None).cast("string")

    def tag(df: DataFrame, op: str, key: str, attr=None) -> DataFrame:
        return df.select(
            F.lit(op).alias("op"),
            (F.col(key) if key else nul_k).alias("key"),
            (F.col(attr) if attr else nul_a).alias("attr"),
        )

    o_ck = orders.select(F.col("o_custkey").alias("custkey"))
    c_ck = cust.select(F.col("c_custkey").alias("custkey"))
    c_ck_pos = cust.filter(F.col("c_acctbal") > 0).select(F.col("c_custkey").alias("custkey"))
    parts = [
        tag(setops.intersect(o_ck, c_ck_pos), "intersect", "custkey"),
        tag(setops.intersect_all(o_ck, c_ck), "intersect_all", "custkey"),
        tag(setops.except_(c_ck, o_ck), "except", "custkey"),
        tag(setops.except_all(o_ck, c_ck), "except_all", "custkey"),
        tag(
            setops.union_distinct(
                load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey")),
                cust.select(F.col("c_nationkey").alias("nationkey")),
            ),
            "union_distinct",
            "nationkey",
        ),
        tag(
            setops.union_all(
                orders.filter(F.col("o_orderstatus") == "F").select("o_orderkey", "o_orderstatus"),
                orders.filter(F.col("o_totalprice") > 300000).select("o_orderkey", "o_orderstatus"),
            ),
            "union_all",
            "o_orderkey",
            "o_orderstatus",
        ),
        tag(
            setops.dedup(orders.select("o_orderstatus", "o_orderpriority")).select(
                F.concat_ws("|", "o_orderstatus", "o_orderpriority").alias("pair")
            ),
            "distinct_pairs",
            None,
            "pair",
        ),
    ]
    return reduce(DataFrame.unionAll, parts)


# ---------------------------------------------------------------------------
# §2.2 projections / filters


@register(
    "projection_schema_intersection",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderdate FROM orders
    """,
)
def projection_schema_intersection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1/P2/E1 — copyable set = source ∩ target − excluded
    (CopyOrchestrator.cs:190-208). The pruned set reaches the parquet
    ReadSchema (column pruning at the scan)."""
    orders = load_table(spark, sf_dir, "orders")
    target_fields = ["O_ORDERKEY", "O_CUSTKEY", "O_TOTALPRICE", "O_ORDERDATE", "TGT_ONLY_COL"]
    return projection.project_copyable(orders, target_fields, excluded=["O_TOTALPRICE"])


@register(
    "wildcard_pattern_filter",
    oracle="""
    SELECT 'wildcard' AS fam, p_partkey, p_name AS s1, p_type AS s2
    FROM part WHERE p_type LIKE 'PROMO%'
    UNION ALL
    SELECT 'ident', p_partkey, UPPER(REPLACE(p_name, ' ', '_')), CAST(NULL AS VARCHAR)
    FROM part
    WHERE regexp_full_match(UPPER(REPLACE(p_name, ' ', '_')), '[A-Z0-9_]+')
    """,
)
def wildcard_pattern_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4/P5/F1/F5/F9 — pattern-predicate family, tagged union of:

    * `wildcard` — ``*``-wildcard -> anchored regex
      (CopyOrchestrator.cs:1844-1863);
    * `ident`    — D365 identifier-class predicate
      (Tier2DataService.cs:548-554)."""
    part = load_table(spark, sf_dir, "part")
    wildcard = projection.filter_by_wildcard(part, "p_type", "PROMO*").select(
        F.lit("wildcard").alias("fam"),
        "p_partkey",
        F.col("p_name").alias("s1"),
        F.col("p_type").alias("s2"),
    )
    ident_col = F.upper(F.regexp_replace(F.col("p_name"), " ", "_"))
    ident = projection.filter_d365_identifiers(
        part.select("p_partkey", ident_col.alias("ident")), "ident"
    ).select(
        F.lit("ident").alias("fam"),
        "p_partkey",
        F.col("ident").alias("s1"),
        F.lit(None).cast("string").alias("s2"),
    )
    return wildcard.unionAll(ident)


# ---------------------------------------------------------------------------
# §2.8 scalar functions


@register(
    "string_function_family",
    oracle="""
    SELECT c_custkey,
           UPPER(c_mktsegment) AS seg_upper,
           CONCAT(c_name, '|', c_mktsegment) AS joined,
           string_split(c_name, '#')[2] AS cust_num,
           TRIM(CONCAT('  ', c_name, '  ')) AS trimmed,
           SUBSTRING(c_name, 1, 8) AS prefix,
           REPLACE(c_name, 'Customer', 'CUST') AS replaced,
           CASE WHEN c_name LIKE 'Customer%' THEN 1 ELSE 0 END AS is_cust
    FROM customer
    """,
)
def string_function_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1-F6/F9 — upper, concat, split, trim, substring, replace,
    prefix-test (CopyOrchestrator.cs:1915, 1696-1701; TimestampManager.cs:82)."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_mktsegment").alias("seg_upper"),
        F.concat_ws("|", "c_name", "c_mktsegment").alias("joined"),
        F.split(F.col("c_name"), "#").getItem(1).alias("cust_num"),
        F.trim(F.concat(F.lit("  "), F.col("c_name"), F.lit("  "))).alias("trimmed"),
        F.substring("c_name", 1, 8).alias("prefix"),
        F.regexp_replace("c_name", "Customer", "CUST").alias("replaced"),
        F.when(F.col("c_name").startswith("Customer"), 1).otherwise(0).alias("is_cust"),
    )


@register(
    "date_function_family",
    oracle="""
    SELECT o_orderkey,
           strftime(o_orderdate, '%Y-%m') AS order_month,
           CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS order_year,
           o_orderdate - INTERVAL 93 DAY AS back_93d,
           CAST(o_orderdate >= TIMESTAMP '2001-01-01' - INTERVAL 180 DAY AS INTEGER) AS recent
    FROM orders
    """,
)
def date_function_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F10/F11 — date arithmetic + formatting (Tier2DataService.cs:293;
    strategy-SQL DATEADD pattern README.md:124; BackupService.cs:54)."""
    o = load_table(spark, sf_dir, "orders")
    cutoff = F.lit("2001-01-01").cast("timestamp_ntz") - F.make_interval(days=F.lit(180))
    return o.select(
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM").alias("order_month"),
        F.year("o_orderdate").alias("order_year"),
        (F.col("o_orderdate") - F.make_interval(days=F.lit(93))).alias("back_93d"),
        (F.col("o_orderdate") >= cutoff).cast("int").alias("recent"),
    )


@register(
    "binary_encoding_family",
    oracle="""
    SELECT s_suppkey,
           hex(s_suppkey) AS key_hex,
           to_base64(encode(s_name)) AS name_b64,
           CONCAT('0x', lpad(hex(s_suppkey), 16, '0')) AS rowversion_hex
    FROM supplier
    """,
)
def binary_encoding_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7/F8 — hex/base64 round-trips: the rowversion 0xHEX form
    (TimestampHelper.cs:37-64) and config obfuscation
    (EncryptionHelper.cs:11-45)."""
    s = load_table(spark, sf_dir, "supplier")
    return s.select(
        "s_suppkey",
        F.hex(F.col("s_suppkey")).alias("key_hex"),
        F.base64(F.col("s_name").cast("binary")).alias("name_b64"),
        F.concat(F.lit("0x"), F.lpad(F.hex(F.col("s_suppkey")), 16, "0")).alias("rowversion_hex"),
    )


@register(
    "numeric_function_family",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           LEAST(l_quantity, 25.0) AS capped,
           GREATEST(l_quantity, 5.0) AS floored,
           CAST(ROUND(CAST(l_extendedprice AS DECIMAL(18,2))
                      * (1 - CAST(l_discount AS DECIMAL(8,2))), 2) AS DOUBLE) AS disc_price,
           CAST(l_quantity AS BIGINT) AS qty_int,
           CASE WHEN l_discount > 0.05 THEN 'high' ELSE 'low' END AS disc_band
    FROM lineitem
    """,
)
def numeric_function_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F12/F13/F14/F17 — least/greatest/round/cast/case
    (CopyOrchestrator.cs:222-225; AxDbDataService.cs:523)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.least(F.col("l_quantity"), F.lit(25.0)).alias("capped"),
        F.greatest(F.col("l_quantity"), F.lit(5.0)).alias("floored"),
        F.round(
            F.col("l_extendedprice").cast("decimal(18,2)")
            * (1 - F.col("l_discount").cast("decimal(8,2)")),
            2,
        )
        .cast("double")
        .alias("disc_price"),
        F.col("l_quantity").cast("bigint").alias("qty_int"),
        F.when(F.col("l_discount") > 0.05, "high").otherwise("low").alias("disc_band"),
    )


# ---------------------------------------------------------------------------
# §2.5 windows


@register(
    "topn_per_group_window",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
    QUALIFY rank() OVER (PARTITION BY l_orderkey ORDER BY l_linenumber DESC) <= 2
    """,
    bench=True,
)
def topn_per_group_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.5 — "last N rows per group" in ONE pass: the scale
    generalization of the reference's per-table top-N loop
    (CopyOrchestrator.cs:446-495 -> one shuffle total). rank() keeps
    ties, so output is deterministic on non-unique order keys."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_linenumber", "l_quantity")
    ranked = windows.with_rank(li, ["l_orderkey"], [F.desc("l_linenumber")], kind="rank")
    return ranked.filter(F.col("rnk") <= 2).drop("rnk")


@register(
    "running_total_window",
    oracle="""
    SELECT 'run' AS fam, o_custkey AS gkey, o_orderkey AS okey,
           o_totalprice AS value,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS m1,
           CAST(NULL AS DOUBLE) AS m2
    FROM orders
    UNION ALL
    SELECT 'laglead', user_id, event_id, value,
           lag(value, 1) OVER (PARTITION BY user_id ORDER BY event_id),
           lead(value, 1) OVER (PARTITION BY user_id ORDER BY event_id)
    FROM events
    """,
)
def running_total_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.5 analytic/frame windows, tagged union of:

    * `run`     — running aggregate (the ETA/progress-rate analog,
      CopyOrchestrator.cs:474-492): m1 = running sum;
    * `laglead` — analytic lag/lead over a unique ordering:
      m1 = prev, m2 = next.

    One shuffle per branch on its partition key."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.asc("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    run = o.select(
        F.lit("run").alias("fam"),
        F.col("o_custkey").alias("gkey"),
        F.col("o_orderkey").alias("okey"),
        F.col("o_totalprice").alias("value"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).over(w).cast("double").alias("m1"),
        F.lit(None).cast("double").alias("m2"),
    )
    e = load_table(spark, sf_dir, "events").select("user_id", "event_id", "value")
    laglead = windows.with_lag_lead(e, ["user_id"], ["event_id"], "value").select(
        F.lit("laglead").alias("fam"),
        F.col("user_id").alias("gkey"),
        F.col("event_id").alias("okey"),
        "value",
        F.col("prev_value").alias("m1"),
        F.col("next_value").alias("m2"),
    )
    return run.unionAll(laglead)


@register(
    "script_line_filter",
    oracle="""
    WITH lines AS (
      SELECT doc_id AS line_no,
             CASE WHEN doc_id % 5 = 0 THEN '-- ' || text
                  WHEN doc_id % 7 = 0 THEN '   '
                  ELSE text END AS line
      FROM documents)
    SELECT line_no, line FROM lines
    WHERE NOT starts_with(ltrim(line), '--') AND length(trim(line)) > 0
    """,
)
def script_line_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P9 — post-transfer script-line filter: skip `--` comments and
    blank lines, keep the rest in order
    (PostTransferSqlService.cs:43-79). Lines are derived
    deterministically from the documents corpus."""
    docs = load_table(spark, sf_dir, "documents")
    lines = docs.select(
        F.col("doc_id").alias("line_no"),
        F.when(F.pmod("doc_id", F.lit(5)) == 0, F.concat(F.lit("-- "), F.col("text")))
        .when(F.pmod("doc_id", F.lit(7)) == 0, F.lit("   "))
        .otherwise(F.col("text"))
        .alias("line"),
    )
    return lines.filter(
        ~F.startswith(F.ltrim(F.col("line")), F.lit("--"))
        & (F.length(F.trim(F.col("line"))) > 0)
    )


# percentile metrics are folded into minmax_keys_per_status (fam='pct')
# to keep the oracled suite inside the correctness-gate window.


@register(
    "approx_distinct_bounds",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_orderkey) AS exact_orderkeys,
           COUNT(*) AS n_rows,
           TRUE AS within_bounds
    FROM lineitem GROUP BY l_returnflag
    """,
)
def approx_distinct_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.4 extension — HyperLogLog++ distinct-count sketch
    (approx_count_distinct, rsd=0.01) verified against the exact count
    in the same pass. The sketch estimate itself is engine-specific
    (DuckDB cannot reproduce Spark's HLL registers), so the oracle-facing
    columns are deterministic: the exact count plus a `within_bounds`
    boolean asserting |approx - exact| <= 3*rsd*exact — TRUE for every
    group by the HLL error guarantee, and stable because the estimate is
    a pure function of the data. The raw sketch stays a rows-only query
    (`approx_distinct_sketch`, suite.tail_q). At 100 TB the sketch
    replaces exact COUNT(DISTINCT) — mergeable, single-pass, constant
    memory."""
    li = load_table(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_orderkey").alias("exact_orderkeys"),
        F.approx_count_distinct("l_orderkey", rsd=0.01).alias("approx_orderkeys"),
        F.count("*").alias("n_rows"),
    )
    err = F.abs(F.col("approx_orderkeys") - F.col("exact_orderkeys"))
    return agg.select(
        "l_returnflag",
        "exact_orderkeys",
        "n_rows",
        (err <= 0.03 * F.col("exact_orderkeys")).alias("within_bounds"),
    )


@register(
    "grouped_collect_keysets",
    oracle="""
    SELECT user_id,
           array_to_string(list(DISTINCT event_type ORDER BY event_type), ',')
             AS event_types,
           COUNT(DISTINCT event_type) AS n_types
    FROM events GROUP BY user_id
    """,
)
def grouped_collect_keysets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10/A11/S2 — distributed key-set collection and grouped collect
    (the schema-dictionary build shape, Tier2DataService.cs:517-538, and
    GetRecIdSetAsync, AxDbDataService.cs:1068-1088). collect_set is
    unordered, so the set is sorted then joined to a single string —
    set-valued result columns are emitted as delimited strings, never
    arrays, so any downstream comparator can hash the cell."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("user_id").agg(
        F.array_join(F.array_sort(F.collect_set("event_type")), ",").alias("event_types"),
        F.countDistinct("event_type").alias("n_types"),
    )
