"""Physical-plan introspection — the SCALE.md audit as reusable code.

A scale-conscious engine must be able to ASSERT its plans, not hope for
them: that a top-N compiles to a distributed top-k, that range
predicates reach the parquet scan, that a dimension join broadcasts.
These helpers parse `.explain("formatted")` output so tests (and CI)
pin the plan properties the 100 TB design depends on.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_formatted(df: DataFrame) -> str:
    """The formatted physical plan as a string (what `.explain` prints)."""
    jvm = df.sparkSession._jvm
    return df._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def physical_operators(df: DataFrame) -> list[str]:
    """Operator names in plan order, e.g. ['TakeOrderedAndProject',
    'Project', 'Scan parquet']."""
    plan = explain_formatted(df)
    ops = []
    for line in plan.splitlines():
        m = re.match(r"^\(\d+\)\s+(.+?)(?:\s+\[codegen.*)?$", line.strip())
        if m:
            ops.append(m.group(1).strip())
    return ops


def pushed_filters(df: DataFrame) -> list[str]:
    """The parquet scan's PushedFilters entries (empty if none push)."""
    plan = explain_formatted(df)
    out: list[str] = []
    for line in plan.splitlines():
        m = re.search(r"PushedFilters:\s*\[(.*)\]", line)
        if m and m.group(1).strip():
            # predicates contain commas (e.g. GreaterThanOrEqual(ts,5)) —
            # extract name(args) units rather than splitting on ','
            out.extend(re.findall(r"\w+\([^()]*\)", m.group(1)))
    return out


def read_schema(df: DataFrame) -> list[str]:
    """Column names the scan actually materializes (column pruning proof)."""
    plan = explain_formatted(df)
    m = re.search(r"ReadSchema:\s*struct<(.*?)>", plan)
    if not m:
        return []
    return [f.split(":")[0] for f in m.group(1).split(",") if f]


def uses(df: DataFrame, operator: str) -> bool:
    """True if the physical plan contains the named operator (substring
    match against operator lines, e.g. 'BroadcastHashJoin')."""
    return any(operator in op for op in physical_operators(df))
