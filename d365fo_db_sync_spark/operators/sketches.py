"""Mergeable distinct-count sketch sidecars (Apache DataSketches HLL).

COUNT(DISTINCT) over 100 TB cannot be recomputed per reporting cycle;
the production pattern is a maintained SIDEcar of per-group HLL
sketches: each ingest batch contributes its own sketch (one pass over
the batch only), the sidecar folds it in with a union — sketch union
is exact with respect to the sketch semantics (the union of two HLL
sketches is the sketch of the union, the DataSketches mergeability
guarantee) — and estimates are O(|groups|) reads of the sidecar. The
fact table is never rescanned.

Spark's built-in DataSketches surface does the heavy lifting
(``hll_sketch_agg`` / ``hll_union_agg`` / ``hll_sketch_estimate`` —
binary, persistable, engine-versioned); this module adds the
maintenance discipline: group-wise fold, null-safe two-sided merge,
parquet round-trip of the binary column.

Estimates are approximate by design, so the suite query oracles the
DETERMINISTIC companions (exact count + a within-bounds boolean, the
approx_distinct_bounds pattern) — the raw registers are engine
internals.

Reference scope: the reference recomputes COUNT aggregates from SQL
Server each cycle (`/root/reference/DBSyncTool/Services/
AxDbDataService.cs`); sketch maintenance is this engine's scale path,
sibling to the IVM rollups in operators/ivm.py (which cover the
distributive aggregates; distinct counts need sketches because exact
distinct is not incrementally maintainable under inserts without
keeping the full key set).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["distinct_sketch", "estimate_sketches", "merge_sketches"]

SKETCH_COL = "sketch"


def distinct_sketch(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    lg_k: int = 12,
) -> DataFrame:
    """Per-group HLL sketch of ``value_col``: one partially-aggregated
    exchange over the batch, O(2^lg_k) bytes per group regardless of
    cardinality. ``lg_k=12`` gives ~1.6% relative standard error."""
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(value_col, F.lit(lg_k)).alias(SKETCH_COL)
    )


def merge_sketches(
    sidecar: DataFrame,
    delta: DataFrame,
    group_cols: Sequence[str],
) -> DataFrame:
    """Fold a batch's sketches into the maintained sidecar: union the
    two group-cardinality-sized frames and ``hll_union_agg`` per group
    — associative and order-free, so replays and out-of-order batches
    converge to the same registers. Groups new to either side survive
    (the union subsumes a full-outer join with null-safe merge)."""
    both = sidecar.select(*group_cols, SKETCH_COL).unionByName(
        delta.select(*group_cols, SKETCH_COL)
    )
    return both.groupBy(*group_cols).agg(
        F.hll_union_agg(SKETCH_COL, F.lit(True)).alias(SKETCH_COL)
    )


def estimate_sketches(sidecar: DataFrame, group_cols: Sequence[str]) -> DataFrame:
    """O(|groups|) estimate read of the sidecar."""
    return sidecar.select(
        *group_cols, F.hll_sketch_estimate(SKETCH_COL).alias("approx_distinct")
    )
