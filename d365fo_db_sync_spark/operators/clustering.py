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
* **update** — per-(cell, dim) mean as the RAW IEEE quotient
  ``double(sum_dec) / double(n)``: the sum is exact decimal (so both
  engines cast it to the identical double) and the single division of
  identical operands is correctly rounded — bit-identical
  cross-engine with NO quantization boundary. (r14: the mean
  previously re-quantized through DECIMAL(28,12); a double→decimal
  cast rounds the SHORTEST repr on the JVM but the exact binary
  expansion in DuckDB, and at sf1 one mean landed on a half-boundary
  those two representations split — the raw quotient has no such
  boundary, and every downstream consumer only needs both engines to
  hold the same double.)
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


def exploded_components(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """(_id, _pos, _comp): the quantized components as rows — the
    codegen assignment/fit hot path runs on this frame through joins
    and combinable aggregates (pq._nv_exploded's lesson: the map-only
    per-row shape evaluates k*dim interpreted HOF folds per row).

    Quantization happens AFTER the explode, on the scalar component:
    ``transform()`` lambdas are interpreted per element, a plain
    scalar cast is whole-stage codegen — same values, no Python-esque
    per-element interpreter in the corpus-wide path (r15)."""
    raw = (
        F.col(vec_col).cast("array<double>")
        if isinstance(vec_col, str)
        else vec_col
    )
    return df.select(
        F.col(id_col).alias("_id"),
        F.posexplode(raw).alias("_pos", "__rawc"),
    ).select(
        "_id",
        "_pos",
        F.col("__rawc").cast(_COMP_DEC).cast("double").alias("_comp"),
    )


def _assign_exploded(
    ve: DataFrame, centers: list[list[float]], with_dist: bool = False
) -> DataFrame:
    """(_id, cell[, _d]) nearest centroid per vector from the exploded
    frame: k per-cell exact decimal distance sums in ONE combinable
    groupBy(_id) aggregate, argmin as an array_min over (dist, cell)
    structs in the following projection — ONE shuffle of k decimals
    per vector, no rank window, all whole-stage codegen.

    The centroid components arrive via a BROADCAST k-column dim-keyed
    frame equi-joined on ``_pos`` (r15: ``element_at`` on a k-list of
    dim-length array literals cost ~40% of the whole assignment in
    per-row array accesses; the dim-row broadcast hash join is plain
    column arithmetic after a codegen probe, measured ~1.4x faster
    end-to-end, and the broadcast is dim rows — trivial at any scale).
    Value-identical to the interpreted decimal_sq_dist/_argmin_cell
    fold (same per-term double product, same DECIMAL(38,18)
    quantization before an exact order-free sum, same (dist, cell)
    tie-break)."""
    from pyspark.sql.functions import broadcast

    k = len(centers)
    dim = len(centers[0])
    cdf = ve.sparkSession.createDataFrame(
        [(p, *[float(centers[ci][p]) for ci in range(k)]) for p in range(dim)],
        "_pos int, " + ", ".join(f"_c{ci} double" for ci in range(k)),
    )

    def term(ci: int):
        e = F.col("_comp") - F.col(f"_c{ci}")
        return F.sum((e * e).cast(_DIST_DEC)).alias(f"_d{ci}")

    agg = (
        ve.join(broadcast(cdf), on="_pos")
        .groupBy("_id")
        .agg(*[term(ci) for ci in range(k)])
    )
    near = F.array_min(
        F.array(
            *[
                F.struct(
                    F.col(f"_d{ci}").alias("d"),
                    F.lit(ci).cast("int").alias("cell"),
                )
                for ci in range(len(centers))
            ]
        )
    )
    r = agg.select("_id", near.alias("_near"))
    cols = [F.col("_id"), F.col("_near")["cell"].alias("cell")]
    if with_dist:
        cols.append(F.col("_near")["d"].alias("_d"))
    return r.select(*cols)


def kmeans_seed_centers(
    df: DataFrame, k: int, id_col: str = "vec_id", vec_col: str = "embedding"
) -> list[list[float]]:
    """Deterministic init: the quantized vectors of the k ids smallest
    by (md5(id), id), cell number = rank in that order. A TopK driver
    collect of k rows — bounded metadata."""
    rows = (
        df.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
        .orderBy(F.md5(F.col("_id").cast("string")), "_id")
        .limit(k)
        # quantize AFTER the limit: the transform() HOF then runs on k
        # rows instead of the whole corpus (r15; values unchanged —
        # quantization commutes with row selection)
        .select(quantized_vec(F.col("_v")).alias("_qv"))
        .collect()
    )
    return [list(r._qv) for r in rows]


def kmeans_fit(
    df: DataFrame,
    k: int = 16,
    rounds: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_n: int | None = None,
) -> list[list[float]]:
    """Fixed-round deterministic Lloyd's: returns the final centroids
    as k lists of doubles — each component the RAW IEEE quotient of an
    exact decimal sum (no DECIMAL(28,12) re-quantization; the r14
    half-boundary fix, module doc). Per round: codegen assignment
    against the previous centroids (_assign_exploded — centroid
    literals indexed by position into ONE combinable exact-decimal
    groupBy + array_min argmin; no join, no window — r14; the r13
    shape evaluated k*dim interpreted HOF folds per row), ONE
    combinable (cell, dim)-keyed mean aggregate, one k*dim-row
    collect. Exactly ``rounds`` rounds — no convergence loop, so a SQL
    oracle unrolls the identical chain.

    ``sample_n`` fits on the deterministic md5-order sample instead of
    the full corpus (the suite's hash-order ``sampling`` discipline:
    the ``sample_n`` ids smallest by ``(md5(id), id)`` — a superset of
    the k seeds, so seeding is unchanged). Centroid quality needs only
    a bounded sample (the pq codebook argument: ~100k vectors suffice
    at any corpus size), and at 100 TB fitting on the full corpus per
    round is the CPU hot spot — pass sample_n there, always. The
    sample replays in a SQL oracle as the same ORDER BY md5 LIMIT,
    and the fit itself runs DRIVER-SIDE on the collected sample (ONE
    TakeOrderedAndProject job; the production numpy PQ path fits its
    codebooks on a driver sample for the same reason) with exact
    Decimal arithmetic bit-identical to the distributed rounds —
    pinned by tests/test_clustering.py's covering-sample equality."""
    if sample_n is not None:
        if sample_n < k:
            raise ValueError(f"sample_n={sample_n} must be >= k={k}")
        rows = (
            df.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
            .orderBy(F.md5(F.col("_id").cast("string")), "_id")
            .limit(sample_n)
            # quantize AFTER the limit (kmeans_seed_centers' rule): the
            # interpreted transform() runs on sample_n rows, not the
            # corpus
            .select(quantized_vec(F.col("_v")).alias("_qv"))
            .collect()
        )
        sample = [list(r._qv) for r in rows]
        if len(sample) < k:
            raise ValueError(
                f"kmeans_fit: corpus has only {len(sample)} rows, "
                f"fewer than k={k}"
            )
        return _driver_lloyd(sample, [list(v) for v in sample[:k]], rounds)
    centers = kmeans_seed_centers(df, k, id_col, vec_col)
    if len(centers) < k:
        raise ValueError(
            f"kmeans_fit: corpus has only {len(centers)} rows, fewer than k={k}"
        )
    ve = exploded_components(df, id_col, vec_col)
    for _ in range(rounds):
        a = _assign_exploded(ve, centers)
        upd = (
            a.join(ve, on="_id")
            .groupBy("cell", "_pos")
            .agg(
                F.sum(F.col("_comp").cast(_COMP_DEC)).alias("s"),
                F.count("*").alias("n"),
            )
            .select(
                "cell",
                F.col("_pos").alias("pos"),
                (F.col("s").cast("double") / F.col("n").cast("double"))
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


def _driver_lloyd(
    sample: list[list[float]], centers: list[list[float]], rounds: int
) -> list[list[float]]:
    """Pure-Python exact replay of the fixed Lloyd rounds on the
    collected sample — bit-identical to the distributed/SQL chain
    because every step mirrors the engines' decimal semantics:

    * per-term distance = ``(x - c) * (x - c)`` in IEEE double, then
      quantized to the DECIMAL(38,18) grid via the double's SHORTEST
      decimal repr (``Decimal(repr(t))`` == Spark's
      ``BigDecimal.valueOf`` cast path), summed exactly;
    * argmin strictly-less over ascending cells == the (dist, cell)
      tie-break;
    * mean = ``float(exact decimal sum) / n`` — the RAW IEEE quotient,
      no re-quantization (see the module doc: the double→decimal
      re-cast is the one step whose rounding can split cross-engine);
      empty cells keep their previous centroid."""
    from decimal import ROUND_HALF_UP, Decimal

    q12, q18 = Decimal("1e-12"), Decimal("1e-18")
    zero = Decimal(0)
    k = len(centers)
    for _ in range(rounds):
        sums: list[list[Decimal]] = [
            [zero] * len(c) for c in centers
        ]
        cnts = [0] * k
        for v in sample:
            best_d, best_c = None, 0
            for ci in range(k):
                c = centers[ci]
                dist = zero
                for x, y in zip(v, c):
                    t = (x - y) * (x - y)
                    dist += Decimal(repr(t)).quantize(q18, ROUND_HALF_UP)
                if best_d is None or dist < best_d:
                    best_d, best_c = dist, ci
            cnts[best_c] += 1
            s = sums[best_c]
            for p, x in enumerate(v):
                s[p] += Decimal(repr(x)).quantize(q12, ROUND_HALF_UP)
        centers = [
            [
                float(sums[ci][p]) / cnts[ci] if cnts[ci] else centers[ci][p]
                for p in range(len(centers[ci]))
            ]
            for ci in range(k)
        ]
    return centers


def assign_cells(
    df: DataFrame,
    centers: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out: str = "cell",
    dist_col: str | None = None,
) -> DataFrame:
    """Slim nearest-centroid assignment: ``(id_col, out[, dist_col])``
    via the codegen exploded shape (_assign_exploded) — use this when
    the caller needs only the assignment, skipping kmeans_assign's
    join back onto the input frame."""
    res = _assign_exploded(
        exploded_components(df, id_col, vec_col),
        centers,
        with_dist=dist_col is not None,
    )
    sel = [F.col("_id").alias(id_col), F.col("cell").alias(out)]
    if dist_col is not None:
        sel.append(F.col("_d").cast("double").alias(dist_col))
    return res.select(*sel)


def kmeans_assign(
    df: DataFrame,
    centers: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out: str = "cell",
    dist_col: str | None = None,
) -> DataFrame:
    """Nearest-centroid assignment: adds ``out`` (int cell id) and
    optionally ``dist_col`` (exact decimal squared distance, cast to
    double) to the input frame. r14: runs the codegen exploded shape
    (assign_cells) and equi-joins the result back on ``id_col`` — two
    AQE-planned shuffles of n*k / n rows that whole-stage codegen
    beats the old map-only k*dim-interpreted-HOF-folds-per-row plan
    on by ~an order of magnitude (pq._nv_exploded's lesson). Requires
    ``id_col`` to be unique (every caller's corpora are id-keyed)."""
    return df.join(
        assign_cells(df, centers, id_col, vec_col, out, dist_col), on=id_col
    )


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


def wcss(
    df: DataFrame,
    centers: list[list[float]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> float:
    """Within-cluster sum of squares against the given centroids — the
    quality number tests pin the deterministic fit against MLlib's.
    ``id_col`` threads through to assign_cells (frames without a
    ``vec_id`` column pass their own key here)."""
    row = (
        assign_cells(df, centers, id_col=id_col, vec_col=vec_col, dist_col="_d")
        .agg(F.sum("_d").alias("w"))
        .collect()[0]
    )
    return float(row.w)
