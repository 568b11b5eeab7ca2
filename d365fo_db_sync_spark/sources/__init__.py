"""Source connectors.

The engine's data path is declarative ``spark.read`` so Catalyst keeps
predicate pushdown / column pruning / partition pruning. Parquet is the
test corpus path; :mod:`.jdbc` carries the reference's source semantics
(server-side top-N, watermark predicates) for real deployments.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

#: Tables in the driver-generated corpus (TESTDATA.md).
CORPUS_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one corpus table; plain parquet scan so pushdown/pruning apply.

    ``events.ts`` is written as parquet TIMESTAMP(NANOS), which Spark's
    vectorized reader rejects; we read it as nanos-since-epoch and convert
    to a microsecond timestamp (matching DuckDB's truncation semantics).
    """
    if name == "events":
        from pyspark.sql import functions as F

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if dict(df.dtypes).get("ts") == "bigint":
            # keep the raw nanos column: predicates on the CONVERTED ts
            # cannot reach the parquet scan (computed column), but an
            # equivalent range predicate on ts_nanos pushes down and
            # enables row-group skipping (see SCALE.md pushdown gap)
            df = df.withColumn("ts_nanos", F.col("ts"))
            # epoch-nanos -> TIMESTAMP_NTZ via pure interval arithmetic:
            # exact to the microsecond and independent of the session
            # timezone (timestamp_micros() would yield LTZ and render
            # shifted under a non-UTC driver session).
            df = df.withColumn(
                "ts",
                F.expr(
                    "timestamp_ntz'1970-01-01 00:00:00'"
                    " + make_dt_interval(ts div 86400000000000, 0, 0,"
                    " cast((ts div 1000) % 86400000000 as decimal(18,6)) / 1000000)"
                ),
            )
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in CORPUS_TABLES}
