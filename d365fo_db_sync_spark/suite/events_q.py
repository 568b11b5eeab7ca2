"""Event-time window + JSON suite over the `events` stream table
(SURVEY §2.9 extension surface).

The reference has no event-time windows — its watermark machinery is
micro-batch CDC. These queries are the engine's streaming-semantics
surface, run in batch mode so the DuckDB oracle can check them; the
identical expressions run under Structured Streaming with a watermark
(d365fo_db_sync_spark.streaming).

Float discipline: `value` is summed through DECIMAL(18,6) in both
engines (binary doubles are effectively never on a rounding boundary,
and decimal accumulation is order-independent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from d365fo_db_sync_spark.operators import windows
from d365fo_db_sync_spark.sources import load_table
from d365fo_db_sync_spark.suite import register


@register(
    "events_tumbling_window",
    oracle="""
    SELECT 'tumble' AS fam,
           time_bucket(INTERVAL '1 hour', ts) AS window_start,
           time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS window_end,
           event_type,
           COUNT(*) AS cnt,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 2, 3, 4
    UNION ALL
    SELECT 'slide', window_start, window_start + INTERVAL '1 hour',
           CAST(NULL AS VARCHAR), COUNT(*),
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
    FROM (
      SELECT time_bucket(INTERVAL '30 minutes', ts) AS window_start, value FROM events
      UNION ALL
      SELECT time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes', value FROM events
    )
    GROUP BY 1, 2, 3
    """,
    bench=True,
)
def events_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time window family, tagged union of:

    * `tumble` — tumbling 1-hour windows, the batch form of
      ``groupBy(window(ts, '1 hour'))``; under streaming the same plan
      runs with ``withWatermark``. One shuffle on (window, type).
    * `slide`  — sliding 1h/30m windows: every event lands in two
      windows; the oracle materializes the same assignment with a
      two-bucket union.

    Deliberately TWO scans: each branch exercises the real F.window
    operator (the streaming-capable primitive — the same expression
    runs under withWatermark). A hand-built explode could fuse them
    into one scan but would verify window arithmetic instead of the
    operator; a production job runs one window spec, not the union."""
    e = load_table(spark, sf_dir, "events")
    tumble = windows.tumbling_window_agg(
        e,
        "ts",
        "1 hour",
        [
            F.count("*").alias("cnt"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("total_value"),
        ],
        extra_group=("event_type",),
    ).select(
        F.lit("tumble").alias("fam"),
        "window_start",
        "window_end",
        "event_type",
        "cnt",
        "total_value",
    )
    slide = windows.sliding_window_agg(
        e,
        "ts",
        "1 hour",
        "30 minutes",
        [
            F.count("*").alias("cnt"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("total_value"),
        ],
    ).select(
        F.lit("slide").alias("fam"),
        "window_start",
        "window_end",
        F.lit(None).cast("string").alias("event_type"),
        "cnt",
        "total_value",
    )
    return tumble.unionAll(slide)


@register(
    "events_session_window",
    oracle="""
    WITH ordered AS (
      SELECT user_id, ts,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL '30 minutes'
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ), numbered AS (
      SELECT user_id, ts,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM ordered
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL '30 minutes' AS session_end,
           COUNT(*) AS cnt
    FROM numbered GROUP BY user_id, session_id
    """,
    bench=True,
)
def events_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (30-min gap) per user — Spark's native
    session_window; the oracle is the classic gaps-and-islands
    formulation. Session end = last event + gap, matching Spark."""
    e = load_table(spark, sf_dir, "events")
    out = windows.session_window_agg(
        e, "ts", "30 minutes", ["user_id"], [F.count("*").alias("cnt")]
    )
    return out.select("user_id", "session_start", "session_end", "cnt")


@register(
    "events_json_extract",
    oracle="""
    SELECT event_id, event_type,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_value
    FROM events
    WHERE CAST(json_extract_string(props, '$.k') AS INTEGER) >= 50
    """,
)
def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction from the props column (SURVEY §2.8 extension;
    `events.props` is JSON-encoded) — stays in JVM codegen via
    get_json_object, no UDF."""
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("int")
    return e.select("event_id", "event_type", k.alias("k_value")).filter(
        F.col("k_value") >= 50
    )


@register(
    "events_cube_rollup",
    oracle="""
    SELECT 'cube' AS fam, event_type,
           CAST(EXTRACT(day FROM ts) AS INTEGER) AS day_of_month,
           COUNT(*) AS cnt,
           CAST(NULL AS BIGINT) AS users,
           CAST(NULL AS TIMESTAMP) AS first_ts, CAST(NULL AS TIMESTAMP) AS last_ts
    FROM events
    GROUP BY CUBE (event_type, day_of_month)
    UNION ALL
    SELECT 'type', event_type, CAST(NULL AS INTEGER), COUNT(*),
           COUNT(DISTINCT user_id), MIN(ts), MAX(ts)
    FROM events GROUP BY event_type
    """,
)
def events_cube_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rollup family over the stream table, tagged union of:

    * `cube` — CUBE grouping sets (SURVEY §2.4 'engine adds' surface:
      cube/rollup are Spark built-ins the reference lacks);
    * `type` — A1/A6 + distinct-agg per event type (distinct aggregates
      are a SURVEY §2.4 'engine adds' item)."""
    e = load_table(spark, sf_dir, "events")
    # ONE scan of the fact table: the cube's (event_type) marginal IS
    # the 'type' branch's grouping, so compute every aggregate in the
    # cube pass and, post-agg (the result is ~200 rows), emit the
    # marginal rows under BOTH family tags via an exploded tag array —
    # the separate groupBy (and its second full scan) disappears.
    g = (
        e.select("event_type", F.dayofmonth("ts").alias("day_of_month"), "user_id", "ts")
        .cube("event_type", "day_of_month")
        .agg(
            F.count("*").alias("cnt"),
            F.countDistinct("user_id").alias("users"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
            F.grouping_id().alias("gid"),
        )
    )
    # gid 1 = (event_type) marginal: the only grouping shared by both families
    fams = F.when(
        F.col("gid") == 1, F.array(F.lit("cube"), F.lit("type"))
    ).otherwise(F.array(F.lit("cube")))
    x = g.select(F.explode(fams).alias("fam"), "event_type", "day_of_month",
                 "cnt", "users", "first_ts", "last_ts")
    is_type = F.col("fam") == "type"
    return x.select(
        "fam",
        "event_type",
        "day_of_month",
        "cnt",
        F.when(is_type, F.col("users")).alias("users"),
        F.when(is_type, F.col("first_ts")).alias("first_ts"),
        F.when(is_type, F.col("last_ts")).alias("last_ts"),
    )


@register(
    "events_asof_join",
    oracle="""
    WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
    v AS (SELECT event_id AS view_event, user_id, ts AS view_ts FROM events
          WHERE event_type = 'view')
    SELECT p.event_id, p.user_id, p.ts, v.view_event, v.view_ts
    FROM p ASOF LEFT JOIN v
      ON p.user_id = v.user_id AND p.ts >= v.view_ts
    """,
    bench=True,
)
def events_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (operators/asof.py): each purchase event gets the SAME
    user's most recent earlier-or-equal view event — the attribution /
    last-touch shape. One shuffle on the user key via the union+window
    trick; DuckDB's native ASOF JOIN is the oracle."""
    from d365fo_db_sync_spark.operators.asof import asof_join

    e = load_table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    views = e.filter(F.col("event_type") == "view").select("event_id", "user_id", "ts")
    return asof_join(
        purchases, views, on="user_id", left_ts="ts", right_ts="ts",
        right_cols={"event_id": "view_event", "ts": "view_ts"},
    )


@register(
    "events_interval_join_counts",
    oracle="""
    WITH s AS (SELECT event_id, ts FROM events WHERE event_type = 'signup'),
    e AS (SELECT event_id AS err_id, ts AS err_ts FROM events WHERE event_type = 'error')
    SELECT s.event_id AS window_id, COUNT(e.err_id) AS n_errors
    FROM s LEFT JOIN e ON e.err_ts >= s.ts AND e.err_ts < s.ts + INTERVAL 2 HOUR
    GROUP BY 1
    """,
    bench=True,
)
def events_interval_join_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-containment join (operators/rangejoin.py): errors inside
    each signup's 2-hour window, banded on the hour so the join is an
    equi-join on band ids — never a nested-loop over
    |points| x |intervals|. Zero-error windows survive via the final
    left join (DuckDB's IEJoin is the oracle)."""
    from d365fo_db_sync_spark.operators.rangejoin import interval_join

    ev = load_table(spark, sf_dir, "events")
    signups = ev.filter(F.col("event_type") == "signup").select(
        F.col("event_id").alias("window_id"),
        F.col("ts").alias("w_start"),
        (F.col("ts") + F.make_interval(hours=F.lit(2))).alias("w_end"),
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("err_id"), F.col("ts").alias("err_ts")
    )
    pairs = interval_join(errors, signups, "err_ts", "w_start", "w_end", band_seconds=3600)
    counts = pairs.groupBy("window_id").agg(F.count("*").alias("n_errors"))
    return signups.join(counts, on="window_id", how="left").select(
        "window_id", F.coalesce("n_errors", F.lit(0)).alias("n_errors")
    )
