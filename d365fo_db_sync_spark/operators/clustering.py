"""Deterministic fixed-round k-means (Lloyd's) on the decimal-replay
discipline — the clustering primitive the ANN tier (IVF cells, PQ
codebooks, SemDeDup cells) previously borrowed from MLlib's KMeans,
whose seeded-but-engine-internal init and double accumulation order
make it irreproducible in a SQL oracle. This implementation trades
k-means++ init for BIT-EXACT cross-engine replay:

* **init** — the k seed centroids are the vectors of the k ids
  smallest by ``(md5(cast(id as string)), id)`` (the suite's hash-
  order ``sampling`` discipline): a deterministic, data-independent,
  uniformly-scattered pick both engines order identically.
* **distances** — vector components quantize ONCE to
  ``DECIMAL(28,12)`` (cast back to DOUBLE: both engines then hold the
  identical IEEE double). Each squared-difference term is computed in
  double and quantized to ``DECIMAL(38,18)`` BEFORE summation, so the
  per-(vector, cell) distance is an exact, order-free decimal sum —
  equal whether folded sequentially (Spark ``aggregate``) or
  aggregated by SQL ``SUM`` (DuckDB). Argmin ties break on cell id.
* **update** — per-(cell, dim) mean as ``decimal28_12(double(sum_dec)
  / n)``: the sum is exact decimal, the single division is IEEE-exact
  given identical operands, and the result re-quantizes so the
  centroids entering the next round are decimal-valued doubles a SQL
  oracle replays as chained CTEs, round for round (the
  ``graph.pagerank`` / ``classifier.logreg_fit`` fixed-K discipline).
* **empty cells** keep their previous centroid (coalesce against the
  prior round — no resampling, which would need order-dependent
  randomness).

Scale shape (local[32] today, 1000 executors unchanged): assignment is
MAP-ONLY — centroids ride as literal arrays in a column expression
(k*dim doubles, broadcast by closure), so the corpus is never shuffled
to be assigned. Each update round is ONE combinable aggregate keyed on
(cell, dim) — map-side partials reduce the shuffle to
``partitions * k * dim`` rows — followed by a k*dim-row driver collect
(bounded model metadata, the same contract as logreg_fit's weight
collect). Fixed ``rounds`` unrolled, no convergence-test driver loop.

Reference parity: the reference engine has no clustering operator;
this exists for the LLM-data-pipeline tier (IVF/PQ/SemDeDup — Johnson
et al. 2021 "Billion-scale similarity search with GPUs" for the IVF
recipe; Abbas et al. 2023 "SemDeDup"). Lloyd 1982.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: component quantization — matches similarity_label_centroids'
#: DECIMAL(28,12) (no reachable half-boundary from float32 inputs)
_COMP_DEC = "decimal(28,12)"
#: per-term distance quantization — matches logreg_fit's gradient terms
_DIST_DEC = "decimal(38,18)"


def quantized_vec(vec_col) -> Column:
    """``array<double>`` with every component quantized through
    DECIMAL(28,12) — the shared starting point of fit, assignment and
    oracle replay."""
    return F.transform(
        F.col(vec_col).cast("array<double>") if isinstance(vec_col, str) else vec_col,
        lambda x: x.cast(_COMP_DEC).cast("double"),
    )


def decimal_sq_dist(qvec: Column, center: list[float]) -> Column:
    """Exact decimal squared distance from a quantized vector column to
    a centroid literal: per-dim ``(x-c)^2`` in double, each term cast
    to DECIMAL(38,18), folded with a cast-stabilized decimal
    accumulator — an exact order-free sum equal to the oracle's
    ``SUM(CAST(... AS DECIMAL(38,18)))``."""
    terms = F.transform(
        F.zip_with(qvec, F.lit(center), lambda x, y: (x - y) * (x - y)),
        lambda t: t.cast(_DIST_DEC),
    )
    return F.aggregate(
        terms,
        F.lit(0).cast(_DIST_DEC),
        lambda acc, v: (acc + v).cast(_DIST_DEC),
    )


def _argmin_cell(qvec: Column, centers: list[list[float]]) -> Column:
    """struct(dist, cell) of the nearest centroid — array_min over the
    per-cell struct array orders by exact decimal distance first, cell
    id second (the deterministic tie-break)."""
    return F.array_min(
        F.array(
            *[
                F.struct(
                    decimal_sq_dist(qvec, c).alias("d"),
                    F.lit(i).cast("int").alias("cell"),
                )
                for i, c in enumerate(centers)
            ]
        )
    )


def kmeans_seed_centers(
    df: DataFrame, k: int, id_col: str = "vec_id", vec_col: str = "embedding"
) -> list[list[float]]:
    """Deterministic init: the quantized vectors of the k ids smallest
    by (md5(id), id), cell number = rank in that order. A TopK driver
    collect of k rows — bounded metadata."""
    rows = (
        df.select(F.col(id_col).alias("_id"), quantized_vec(vec_col).alias("_qv"))
        .orderBy(F.md5(F.col("_id").cast("string")), "_id")
        .limit(k)
        .collect()
    )
    return [list(r._qv) for r in rows]


def kmeans_fit(
    df: DataFrame,
    k: int = 16,
    rounds: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Fixed-round deterministic Lloyd's: returns the final centroids
    as k lists of DECIMAL(28,12)-valued doubles. Per round: map-only
    assignment against the previous centroids, ONE combinable
    (cell, dim)-keyed mean aggregate, one k*dim-row collect. Exactly
    ``rounds`` rounds — no convergence loop, so a SQL oracle unrolls
    the identical chain."""
    centers = kmeans_seed_centers(df, k, id_col, vec_col)
    base = df.select(quantized_vec(vec_col).alias("_qv"))
    for _ in range(rounds):
        assigned = base.withColumn("_cell", _argmin_cell(F.col("_qv"), centers))
        upd = (
            assigned.select(
                F.col("_cell")["cell"].alias("cell"),
                F.posexplode("_qv").alias("pos", "comp"),
            )
            .groupBy("cell", "pos")
            .agg(F.sum(F.col("comp").cast(_COMP_DEC)).alias("s"), F.count("*").alias("n"))
            .select(
                "cell",
                "pos",
                (F.col("s").cast("double") / F.col("n").cast("double"))
                .cast(_COMP_DEC)
                .cast("double")
                .alias("c"),
            )
            .collect()
        )
        new = {(r.cell, r.pos): r.c for r in upd}
        centers = [
            [new.get((ci, p), centers[ci][p]) for p in range(len(centers[ci]))]
            for ci in range(k)
        ]
    return centers


def kmeans_assign(
    df: DataFrame,
    centers: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out: str = "cell",
    dist_col: str | None = None,
) -> DataFrame:
    """Map-only nearest-centroid assignment (no shuffle): adds ``out``
    (int cell id) and optionally ``dist_col`` (exact decimal squared
    distance, cast to double) to the input frame."""
    near = _argmin_cell(quantized_vec(vec_col), centers)
    res = df.withColumn("_near", near).withColumn(out, F.col("_near")["cell"])
    if dist_col is not None:
        res = res.withColumn(dist_col, F.col("_near")["d"].cast("double"))
    return res.drop("_near")


def probe_cells_exact(
    queries: DataFrame,
    centers: list[list[float]],
    n_probes: int,
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """(query_id, cell) rows for each query's n_probes nearest
    centroids by EXACT decimal distance — the oracle-replayable twin of
    similarity._probe_cells (whose pure-double fold is fine for
    production probing but not for a value-hash gate). Map-only."""
    structs = F.array(
        *[
            F.struct(
                decimal_sq_dist(F.col("_qv"), c).alias("d"),
                F.lit(i).cast("int").alias("cell"),
            )
            for i, c in enumerate(centers)
        ]
    )
    return queries.select(
        F.col(query_id_col), quantized_vec(vec_col).alias("_qv")
    ).select(
        query_id_col,
        F.explode(
            F.transform(
                F.slice(F.array_sort(structs), 1, n_probes), lambda s: s["cell"]
            )
        ).alias("cell"),
    )


def wcss(df: DataFrame, centers: list[list[float]], vec_col: str = "embedding") -> float:
    """Within-cluster sum of squares against the given centroids — the
    quality number tests pin the deterministic fit against MLlib's."""
    row = (
        kmeans_assign(df, centers, vec_col=vec_col, dist_col="_d")
        .agg(F.sum("_d").alias("w"))
        .collect()[0]
    )
    return float(row.w)
