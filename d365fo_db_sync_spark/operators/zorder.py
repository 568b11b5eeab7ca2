"""Z-order (Morton) clustering expressions for multi-column data skipping.

The lakehouse OPTIMIZE ZORDER (Delta/Iceberg public designs): rows are
ordered by the bit-interleave of per-column rank buckets, so any
contiguous slice of the sort order covers a small axis-aligned
RECTANGLE in the column space — per-file footer min/max then prune
2-D (or k-D) box predicates, where a single-column sort can only ever
prune its own column.

Everything here is a Catalyst Column expression (whole-stage codegen,
no UDF, no extra shuffle beyond the rewrite's own repartition):

- :func:`quantile_bounds` — driver-side approximate quantile cut
  points (a bounded ``2**bits - 1``-element list, the only driver
  materialization in the path);
- :func:`rank_bucket` — value -> rank bucket in ``[0, 2**bits)`` as a
  flat codegen sum of boundary comparisons (rank buckets equalize
  skewed distributions — raw value bits would put 90% of a Zipfian
  column into one z-column);
- :func:`morton_interleave` — bit ``i`` of dimension ``j`` lands at
  position ``i*d + j`` (shift/AND/OR term sum, distinct bit positions
  so plain ``+`` is an OR).

Reference semantics: the reference tool has no clustering maintenance
(its tables live in SQL Server, `/root/reference/DBSyncTool/Services/
SqlQueryService.cs` delegates layout to the engine); this is the
lakehouse-side equivalent an analytics engine needs once tables are
parquet + manifest zone maps (`sinks.ManifestParquetTarget`).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["morton_interleave", "quantile_bounds", "quantile_bounds_multi", "rank_bucket"]


def quantile_bounds(
    df: DataFrame, col: str, bits: int = 6, rel_err: float = 0.001
) -> list[float]:
    """Approximate quantile cut points splitting ``col`` into
    ``2**bits`` equal-frequency rank buckets: ``2**bits - 1`` interior
    boundaries, deduplicated (heavy values collapse buckets rather
    than splitting a tie across two).

    Driver-side by design — the Greenwald-Khanna sketch runs
    distributed and ships back a bounded list (<= 255 doubles at
    ``bits=8``), which then travels into the bucket expression as a
    literal array. The column is cast to double first so timestamps
    and integers share one code path."""
    if not 1 <= bits <= 16:
        raise ValueError(f"bits must be in [1, 16], got {bits}")
    n = (1 << bits) - 1
    probs = [(i + 1) / (n + 1) for i in range(n)]
    vals = (
        df.select(F.col(col).cast("double").alias("__q"))
        .na.drop()
        .approxQuantile("__q", probs, rel_err)
    )
    out: list[float] = []
    for v in vals:
        if not out or v > out[-1]:
            out.append(float(v))
    return out


def rank_bucket(col: Column | str, bounds: list[float]) -> Column:
    """Rank bucket of ``col`` given ascending ``bounds``: the count of
    boundaries strictly below the value, as an int Column in
    ``[0, len(bounds)]``. NULLs land in bucket 0 (they sort first, the
    same corner every engine's NULLS FIRST gives them).

    Deliberately a FLAT sum of comparison terms, not a higher-order
    ``aggregate`` over a literal array: HOF lambdas are interpreted
    per element, and a first cut using one took minutes at sf1 where
    this whole-stage-codegen form takes seconds (found live: the
    z-code feeds a sort, and an expensive expression there is
    disastrous — see ``_write_version``'s materialization note)."""
    c = (F.col(col) if isinstance(col, str) else col).cast("double")
    out: Column = F.lit(0)
    for b in bounds:
        out = out + F.when(c > F.lit(float(b)), F.lit(1)).otherwise(F.lit(0))
    return out


def morton_interleave(dims: list[Column], bits: int = 6) -> Column:
    """Morton (Z-curve) code of ``dims`` (each an int Column in
    ``[0, 2**bits)``): bit ``i`` of dimension ``j`` goes to output bit
    ``i * len(dims) + j``. Terms occupy distinct bit positions, so the
    sum IS the bitwise OR — a flat codegen expression of
    ``bits * len(dims)`` shift/AND/shift terms, no UDF.

    ``bits * len(dims)`` must fit a long (<= 62)."""
    d = len(dims)
    if d < 1:
        raise ValueError("need at least one dimension")
    if bits * d > 62:
        raise ValueError(f"bits*dims = {bits * d} exceeds long range")
    terms = []
    for j, dim in enumerate(dims):
        c = dim.cast("long")
        for i in range(bits):
            terms.append(F.shiftleft(F.shiftright(c, i).bitwiseAND(F.lit(1)), i * d + j))
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def quantile_bounds_multi(
    df: DataFrame, cols: list[str], bits: int = 6, rel_err: float = 0.001
) -> dict[str, list[float]]:
    """:func:`quantile_bounds` for several columns in ONE corpus pass —
    ``approxQuantile`` accepts a column list and runs all GK sketches
    in the same aggregation, so a k-column z-order pays one scan for
    its cut points instead of k."""
    if not 1 <= bits <= 16:
        raise ValueError(f"bits must be in [1, 16], got {bits}")
    n = (1 << bits) - 1
    probs = [(i + 1) / (n + 1) for i in range(n)]
    cast = df.select(
        *[F.col(c).cast("double").alias(f"__q{i}") for i, c in enumerate(cols)]
    )
    per_col = cast.approxQuantile([f"__q{i}" for i in range(len(cols))], probs, rel_err)
    out: dict[str, list[float]] = {}
    for c, vals in zip(cols, per_col):
        b: list[float] = []
        for v in vals:
            if v is not None and (not b or v > b[-1]):
                b.append(float(v))
        out[c] = b
    return out
