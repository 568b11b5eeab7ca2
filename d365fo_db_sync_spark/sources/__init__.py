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

    ``events.ts`` is a native parquet ``timestamp[us]`` column at every
    scale factor, so range predicates on it push straight down to the
    reader (row-group min/max skipping) with no conversion layer.
    """
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in CORPUS_TABLES}
