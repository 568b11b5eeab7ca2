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

__all__ = [
    "cms_estimate",
    "cms_merge",
    "cms_sketch",
    "distinct_sketch",
    "frequent_items",
    "estimate_sketches",
    "kmv_estimate",
    "kmv_hash",
    "kmv_merge",
    "kmv_pairwise_overlap",
    "kmv_sketch",
    "merge_sketches",
]

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


# ---------------------------------------------------------------------------
# KMV (k-minimum-values / bottom-k theta) sketches — SET OPERATIONS, the
# thing HLL cannot do: estimate |A ∩ B| / Jaccard between corpus slices
# without an exact pairwise distinct. Deterministic by construction
# (the sketch is a pure function of the data through an
# engine-independent md5-derived hash), so unlike the HLL registers the
# ENTIRE estimate — k-min arrays, union estimate, intersection estimate
# — is value-oracleable in DuckDB, byte for byte.
# ---------------------------------------------------------------------------

#: hash space: 15 hex digits = 60 bits, exactly representable ordering
#: in BIGINT and identically computable in Spark (conv) and DuckDB
#: ('0x..'::BIGINT)
KMV_SPACE = float(16**15)


def kmv_hash(col) -> "F.Column":
    """Engine-independent 60-bit uniform hash: the first 15 hex chars
    of md5, read as an integer. NOT a keyed hash — same value, same
    point in [0, 2^60) everywhere, which is what makes two groups'
    sketches intersectable."""
    return F.conv(
        F.substring(F.md5(F.col(col).cast("string")), 1, 15), 16, 10
    ).cast("long")


def kmv_sketch(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    k: int = 256,
) -> DataFrame:
    """Per-group bottom-k sketch: the sorted array of the k SMALLEST
    distinct hash values of ``value_col`` (all of them when the group
    holds fewer than k distincts — the sketch degrades to exact).
    O(k) longs per group regardless of cardinality; relative standard
    error of the distinct estimate ~ 1/sqrt(k-2) (~6% at k=256).

    Scale shape: one distinct pass keyed (group, hash) — 8-byte hash
    values, not raw strings, cross the wire — then a per-group rank
    bounded at k. Mergeable exactly: the bottom-k of a union is the
    bottom-k of the concatenated bottom-k arrays (:func:`kmv_merge`),
    so sidecar maintenance folds batches without rescanning, same
    discipline as the HLL sidecar above."""
    if k < 8:
        raise ValueError(f"k must be >= 8 for a usable estimate, got {k}")
    from pyspark.sql import Window

    d = df.select(
        *group_cols, kmv_hash(value_col).alias("__h")
    ).distinct()
    w = Window.partitionBy(*group_cols).orderBy("__h")
    return (
        d.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .groupBy(*group_cols)
        .agg(F.sort_array(F.collect_list("__h")).alias("kmins"))
    )


def kmv_estimate(sketch: DataFrame, k: int, out_col: str = "n_distinct_est") -> DataFrame:
    """Distinct-count estimate per sketch row: exact group size when
    the group never filled its k slots, else the k-th order statistic
    estimator (k-1) * SPACE / kth_min. Pure double arithmetic over
    deterministic inputs — identical in any IEEE engine."""
    m = F.size("kmins")
    kth = F.element_at("kmins", k)
    est = F.when(m < k, m.cast("double")).otherwise(
        F.lit(float(k - 1)) * F.lit(KMV_SPACE) / kth.cast("double")
    )
    return sketch.withColumn(out_col, est)


def kmv_merge(a, b, k: int) -> "F.Column":
    """Bottom-k of the union of two bottom-k arrays — the exact sketch
    of the union of the underlying sets (every hash small enough to
    make the union's bottom-k is in one of the inputs' bottom-k)."""
    return F.slice(F.array_sort(F.array_union(a, b)), 1, k)


def kmv_pairwise_overlap(
    sketches: DataFrame,
    group_col: str,
    k: int,
) -> DataFrame:
    """Audience/vocabulary overlap between every PAIR of groups from a
    sketch frame: per (group_a < group_b) row —

    * ``union_est``  — distinct estimate of A ∪ B from the merged
      bottom-k (exact when the merge never filled k slots);
    * ``jaccard_est`` — the inclusion ratio rho = |{x in merged :
      x in both inputs}| / |merged| (an exact INTEGER ratio over the
      sketch, the textbook KMV Jaccard estimator);
    * ``inter_est``  — rho * union_est.

    |groups| sketch rows self-join into |groups|^2/2 pure-array-math
    rows: the fact table is never rescanned and nothing about the
    pair loop touches the corpus — the whole point of carrying
    sketches. Every column is a deterministic function of the data,
    so a SQL oracle can replay it exactly."""
    a = sketches.select(
        F.col(group_col).alias("ga"), F.col("kmins").alias("ma")
    )
    b = sketches.select(
        F.col(group_col).alias("gb"), F.col("kmins").alias("mb")
    )
    j = a.join(b, F.col("ga") < F.col("gb"))
    merged = kmv_merge(F.col("ma"), F.col("mb"), k)
    m = F.size(merged)
    union_est = F.when(m < k, m.cast("double")).otherwise(
        F.lit(float(k - 1)) * F.lit(KMV_SPACE) / F.element_at(merged, k).cast("double")
    )
    # |{x in merged : x in both}| in O(k): the intersect is a hash
    # probe, and membership in `merged` — the sorted bottom-k of the
    # union — is just x <= max(merged) for any x already in an input
    common = F.size(
        F.filter(
            F.array_intersect(F.col("ma"), F.col("mb")),
            lambda x: x <= F.element_at(merged, -1),
        )
    )
    rho = common.cast("double") / F.greatest(m, F.lit(1)).cast("double")
    return j.select(
        F.col("ga").alias(f"{group_col}_a"),
        F.col("gb").alias(f"{group_col}_b"),
        union_est.alias("union_est"),
        rho.alias("jaccard_est"),
        (rho * union_est).alias("inter_est"),
    )


# ---------------------------------------------------------------------------
# Count-Min sketch (Cormode & Muthukrishnan 2005) — POINT-FREQUENCY
# estimates, the thing neither HLL (cardinality) nor KMV (set overlap)
# nor Misra-Gries (top-phi only) answers: "about how often does THIS
# key occur?", for any key, from depth x width counters. Like the KMV
# sketch it is deterministic by construction (seeded md5-derived
# buckets), so counters AND estimates replay exactly in a SQL oracle —
# approximate answers, exactly reproducible.
# ---------------------------------------------------------------------------


def _cms_bucket(col, d: int, width: int) -> "F.Column":
    """Row hash for depth ``d``: the 60-bit md5 integer of
    ``"{d}\\x00{value}"`` modulo ``width`` — pairwise-independent
    enough across depths for the CM bound, engine-independent like
    :func:`kmv_hash` (DuckDB: ``('0x' || substr(md5(d || chr(0) ||
    v), 1, 15))::BIGINT % width``)."""
    return F.pmod(
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit(str(d)), F.lit("\x00"), F.col(col).cast("string")
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("long"),
        F.lit(width),
    )


def cms_sketch(
    df: DataFrame,
    value_col: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Count-Min sketch of ``value_col``: ``depth x width`` counters as
    rows ``(d, bucket, cnt)`` (absent rows are zero counters). One
    corpus pass — each row maps to ``depth`` (d, bucket) cells map-side
    and the groupBy collapses into at most depth*width combinable
    partials, so the shuffle moves a CONSTANT-size summary no matter
    the corpus. NULL values are excluded (they have no key identity).

    Guarantee (CM 2005): for every key, estimate >= true count, and
    estimate <= true + 2n/width with probability 1 - 2^-depth —
    overcount only, never undercount, which composes with
    :func:`cms_merge` (counter sums) into the sidecar maintenance
    discipline of the HLL/KMV sketches above: each ingest batch
    contributes its own sketch, the fact table is never rescanned."""
    if depth < 1:
        raise ValueError(f"depth must be >= 1, got {depth}")
    if width < 8:
        raise ValueError(f"width must be >= 8 for a usable bound, got {width}")
    base = df.filter(F.col(value_col).isNotNull())
    cells = base.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        _cms_bucket(value_col, d, width).alias("bucket"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("c")
    ).select("c.d", "c.bucket")
    return cells.groupBy("d", "bucket").agg(F.count("*").alias("cnt"))


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """CMS of a union = elementwise counter sum (exact with respect to
    the sketch semantics — same depth/width required, the caller's
    contract like the HLL lg_k)."""
    return (
        a.select("d", "bucket", "cnt")
        .unionByName(b.select("d", "bucket", "cnt"))
        .groupBy("d", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Point-frequency estimates for ``keys`` (a BOUNDED key list —
    dashboard watchlists, candidate sets): per key, ``min`` over the
    ``depth`` counters its buckets hit; a bucket with no counter row
    is zero. The key list expands x depth (small), left-joins the
    depth*width sketch, and folds with one min — the corpus is never
    touched. Output: ``(key_col, est)``; ``est >= true count``
    always."""
    if depth < 1:
        raise ValueError(f"depth must be >= 1, got {depth}")
    probes = keys.select(key_col).filter(F.col(key_col).isNotNull()).distinct()
    expanded = probes.select(
        key_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        _cms_bucket(key_col, d, width).alias("bucket"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("c"),
    ).select(key_col, "c.d", "c.bucket")
    joined = expanded.join(sketch, on=["d", "bucket"], how="left").select(
        key_col, F.coalesce("cnt", F.lit(0)).alias("cnt")
    )
    return joined.groupBy(key_col).agg(F.min("cnt").alias("est"))


def frequent_items(
    df: DataFrame,
    cols: Sequence[str],
    min_fraction: float,
    capacity: int | None = None,
) -> DataFrame:
    """Every value combination of ``cols`` occurring in at least
    ``min_fraction`` of rows, with its EXACT count — without ever
    shuffling the raw key space.

    The naive plan (groupBy + HAVING) shuffles every distinct key; on
    a 100 TB corpus with near-unique keys (user ids, URLs) that
    shuffle IS the job. This runs the classic two-phase heavy-hitters
    pipeline instead:

    1. **Candidates** — a Misra-Gries summary of capacity
       ``ceil(1/min_fraction) + 1`` per PARTITION, accumulated across
       the partition's Arrow batches inside one mapInPandas pass
       (O(capacity) memory, no shuffle, and no per-row Python: each
       batch is counted with a vectorized groupby and folded with the
       mergeable-summaries compression — see :func:`_mg_summary`). The
       summary undercounts any item by at most n_p/(capacity+1),
       strictly less than n_p/capacity, and by pigeonhole an item with
       global count > n/capacity must beat that bound in at least one
       partition — the ``+ 1`` turns the threshold case
       ``count == min_fraction*n == n/capacity`` into a strict
       inequality, so the candidate union is a SUPERSET of every
       reported heavy hitter: the sketch can over-report, never miss.
       NULL key combinations are not reported (phase 2's semi join
       cannot match them) but still count toward ``n``.
    1.5. **Candidate merge** — Misra-Gries summaries are MERGEABLE
       (Agarwal et al. 2012): summing per-key counters across
       partitions preserves the bound, so the summed counter satisfies
       ``c'(x) > count(x) - n/capacity``. Keys are kept only when
       ``c' >= n*(min_fraction - 1/capacity) - 1`` (the -1 absorbs
       float rounding in the conservative direction) — still a
       guaranteed superset, but now AT MOST
       ``(1 + min_fraction)/min_fraction^2`` keys (each survivor owns
       that much summed mass), INDEPENDENT of partition count. Without
       this merge the candidate union is bounded only by
       partitions x capacity — ~80M forced-broadcast rows at 100 TB /
       128 MB splits — which is the 100x failure this stage exists to
       prevent. The merge itself shuffles only the summary rows
       (partitions x capacity, metadata-sized next to the corpus).
    2. **Exact recount** — the bounded candidate keys broadcast into a
       semi join over the corpus, and only the surviving rows (which
       belong to frequent keys, so map-side partial aggregation
       collapses them) shuffle into an exact count, filtered at the
       threshold against a broadcast 1-row total.

    Because phase 1 is conservative and phase 2 is exact, the output
    EQUALS the naive exact plan's — approximate machinery, exact
    answer — which is what lets the suite query value-oracle this
    against plain SQL. Output: ``cols`` + ``count`` + ``fraction``
    (one double division, engine-exact).

    ``capacity`` can be raised above the floor (never lowered — that
    would break the superset guarantee, so values below it raise).

    Sibling: ``operators/text.py heavy_hitters_exact`` is the same
    two-phase discipline specialized to TOKEN streams, with exact
    per-partition counts (memory = partition distinct tokens); this is
    the row-key form with a CONSTANT-memory decrementing summary — the
    SpaceSaving-style drop-in that function's docstring anticipates
    for adversarial partitions."""
    if not cols:
        raise ValueError("cols must name at least one column")
    if not 0 < min_fraction < 1:
        raise ValueError(f"min_fraction must be in (0, 1), got {min_fraction}")
    import math

    floor_cap = math.ceil(1.0 / min_fraction) + 1
    if capacity is None:
        capacity = floor_cap
    elif capacity < floor_cap:
        raise ValueError(
            f"capacity {capacity} breaks the no-miss guarantee; "
            f"need >= ceil(1/min_fraction) + 1 = {floor_cap}"
        )
    from pyspark.sql.functions import broadcast

    cols = list(cols)
    total = df.agg(F.count("*").alias("__n"))
    candidates = _mg_candidates(df, cols, float(min_fraction), int(capacity), total)
    survivors = df.join(broadcast(candidates), on=cols, how="left_semi")
    counted = survivors.groupBy(*cols).agg(F.count("*").alias("count"))
    return (
        counted.crossJoin(broadcast(total))
        .filter(F.col("count") >= F.lit(float(min_fraction)) * F.col("__n"))
        .select(
            *cols,
            "count",
            (F.col("count") / F.col("__n")).alias("fraction"),
        )
    )


def _mg_candidates(
    df: DataFrame,
    cols: list[str],
    min_fraction: float,
    cap: int,
    total: DataFrame,
) -> DataFrame:
    """Phases 1 + 1.5 of :func:`frequent_items`, exposed for tests and
    streaming merges: per-partition Misra-Gries counters
    (:func:`_mg_summary` — vectorized Arrow-batch folds, O(cap)
    memory), summed per key across partitions (the mergeable-
    summaries bound: summed counter > true count - n/cap), then
    thresholded at ``n*(min_fraction - 1/cap) - 1`` — a guaranteed
    heavy-hitter superset of at most ~(1+phi)/phi^2 keys regardless of
    partition count. ``total`` is the 1-row ``__n`` frame so callers
    reuse one corpus aggregate across phases."""
    from pyspark.sql.functions import broadcast

    summed = (
        _mg_summary(df, cols, cap)
        .groupBy(*cols)
        .agg(F.sum("__mg").alias("__mg"))
    )
    thr = (
        F.lit(min_fraction) * F.col("__n")
        - F.col("__n") / F.lit(float(cap))
        - F.lit(1.0)
    )
    return (
        summed.crossJoin(broadcast(total))
        .filter(F.col("__mg") >= thr)
        .select(*cols)
    )


def _mg_summary(df: DataFrame, cols: list[str], cap: int) -> DataFrame:
    """Per-partition Misra-Gries summary of the ``cols`` key stream —
    at most ``cap`` rows ``(*cols, __mg)`` per partition, each key
    undercounted by at most ``n_p/(cap+1)`` (strictly under the
    ``n_p/cap`` bound the candidate threshold assumes).

    Vectorized fold (no per-row Python): each Arrow batch is counted
    EXACTLY with a C-speed ``groupby(...).size()``, summed into the
    running summary with a second vectorized groupby, and the summary
    is compressed back under ``cap`` with the mergeable-summaries step
    (Agarwal et al. 2012): subtract the (cap+1)-th largest counter
    from every counter and drop the non-positive ones. Exact batch
    counts are error-free summaries, so each fold is an MG merge; each
    compression removes >= (cap+1) x its decrement in total mass, so
    the summed decrements — the worst-case undercount of any one key —
    telescope to <= n_p/(cap+1). Per-batch cost is O(batch_distinct)
    in C plus O(summary) for the compression; the interpreter never
    touches individual rows.

    Shared phase 1 of :func:`frequent_items` (via
    :func:`_mg_candidates`) and of the streaming
    ``FrequentItemsStreamPipeline``, whose per-batch sidecars fold
    these summaries across micro-batches."""
    import pandas as pd
    from pyspark.sql import types as T

    if "__mg" in cols:
        raise ValueError("'__mg' is reserved by the summarizer")
    keyed = df.select(*cols)
    summ_schema = T.StructType(
        [keyed.schema[c] for c in cols] + [T.StructField("__mg", T.LongType(), False)]
    )

    def summarize(batches):
        run = None
        for pdf in batches:
            run = _fold_mg_batch(run, pdf, cols, cap)
        if run is None:
            run = pd.DataFrame({c: [] for c in [*cols, "__mg"]})
        yield run[[*cols, "__mg"]]

    return keyed.mapInPandas(summarize, schema=summ_schema)


def _fold_mg_batch(run, pdf, cols: list[str], cap: int):
    """One vectorized Misra-Gries fold step — exposed as a pure
    function so the property suite can drive the REAL code over
    arbitrary batch streams without a Spark job per example. ``run``
    is the running summary (``None`` before the first batch), ``pdf``
    the next exact batch; returns the new summary, always <= ``cap``
    rows, with total undercount across a stream bounded by
    n/(cap+1) (each compression removes >= (cap+1) x its decrement
    of total mass)."""
    import pandas as pd

    if len(pdf) == 0:
        return run
    vc = (
        pdf.groupby(cols, dropna=False, sort=False)
        .size()
        .reset_index(name="__mg")
    )
    if run is None:
        run = vc
    else:
        run = (
            pd.concat([run, vc], ignore_index=True)
            .groupby(cols, dropna=False, sort=False)["__mg"]
            .sum()
            .reset_index()
        )
    if len(run) > cap:
        dec = run["__mg"].nlargest(cap + 1).iloc[-1]
        run = run[run["__mg"] > dec].copy()
        run["__mg"] -= dec
    return run
