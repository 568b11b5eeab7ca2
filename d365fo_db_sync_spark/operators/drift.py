"""Distribution-drift monitoring between corpus snapshots.

The reference engine re-verifies row counts between source and target
each cycle (`/root/reference/DBSyncTool/Services/CopyOrchestrator.cs`
change-volume checks) — the schema-level "did anything move?" gate. A
training-data platform needs the DATA-level twin: did this crawl's
length/quality/score DISTRIBUTION shift against the reference corpus
enough to invalidate downstream mixture ratios? Standard,
public-textbook measures:

* :func:`psi` — Population Stability Index over reference-derived
  equi-width bins: ``sum_b (p_b - q_b) * ln(p_b / q_b)``. The industry
  screening rule of thumb (<0.1 stable / 0.1-0.25 drifting / >0.25
  shifted) is a property of the measure, not of any vendor.
* :func:`ks_statistic` — the two-sample Kolmogorov-Smirnov statistic
  ``max_v |F_ref(v) - F_cur(v)|``, assembled as an INTEGER numerator
  (``max |cum_ref*n_cur - cum_cur*n_ref|`` over the value union) with
  one final double division — bit-identical cross-engine, the same
  discipline as ``privacy.t_closeness_audit``.
* :func:`mann_whitney_auc` — the rank-sum U statistic normalized to
  the ROC-AUC of separating the snapshots (0.5 = no location drift),
  the same integer-numerator discipline over the same value spine.
* :func:`wasserstein_1` — earth-mover distance in metric units (how
  FAR the mass moved, not just whether), same spine discipline.
* :func:`psi_categorical` — the mix monitor (category is the bin).

Scale shapes:

* PSI: one min/max aggregate over the reference (broadcast 1-row), one
  combinable groupBy per side over BIN INDICES (at most ``n_bins``
  groups — the corpus shuffles into n_bins partial counts map-side),
  and a bins-sized join. Nothing row-sized leaves the scans.
* KS / AUC / W1: one combinable per-value groupBy per side, then a
  cumulative window over the DISTINCT-value spine. The window is
  unpartitioned — correct and cheap while ``|distinct values| <<
  rows`` (integer metrics: token counts, scores quantized by the
  caller); for continuous metrics bin first (``psi``'s edges or
  ``sampling.quantile_bands``) so the spine stays bounded. That
  invariant is enforced IN CODE: every spine statistic probes
  ``approx_count_distinct`` first and raises above ``max_spine``
  (default 1e6) rather than silently global-sorting row-cardinality
  data into a single partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "auc_from_counts",
    "centroid_from_dim_sums",
    "dim_sums",
    "jsd",
    "jsd_from_counts",
    "binned_quantiles",
    "drift_summary",
    "embedding_centroid_drift",
    "ks_from_counts",
    "ks_statistic",
    "mann_whitney_auc",
    "psi",
    "psi_by_group",
    "psi_categorical",
    "psi_from_counts",
    "quantiles_from_counts",
    "wasserstein_1",
]

#: default ceiling on the distinct-value spine the rank statistics
#: sort over — above this the unpartitioned cumulative window becomes
#: the classic single-partition global-sort bottleneck, so the guard
#: raises instead of silently degrading (the engine-wide refuse-loudly
#: discipline; cf. similarity.centroid_silhouette's label guard)
MAX_SPINE = 1_000_000


def _spine_guard(ref: DataFrame, cur: DataFrame, col: str, max_spine: int | None) -> None:
    """Refuse a row-cardinality value spine IN CODE, not docstring:
    one cheap ``approx_count_distinct`` over both sides (a combinable
    scan aggregate, no shuffle of rows) before the statistic's
    unpartitioned cumulative window is ever planned. ``max_spine=None``
    skips the probe for callers that already bounded the domain."""
    if max_spine is None:
        return
    probe = (
        ref.select(F.col(col).alias("v"))
        .unionByName(cur.select(F.col(col).alias("v")))
        .agg(F.approx_count_distinct("v").alias("d"))
        .first()["d"]
    )
    if probe > max_spine:
        raise ValueError(
            f"~{probe} distinct values of {col!r} exceed max_spine="
            f"{max_spine}: the cumulative window would global-sort a "
            "row-scale spine. Bin the metric first (psi's equi-width "
            "edges or sampling.quantile_bands), quantize it, or pass "
            "max_spine=None if the domain is provably bounded."
        )


def psi(
    ref: DataFrame,
    cur: DataFrame,
    col: str,
    n_bins: int = 10,
    eps: float = 1e-6,
) -> DataFrame:
    """Per-bin PSI contributions between ``ref`` (the baseline corpus)
    and ``cur`` (the snapshot under test) over equi-width bins of
    ``col`` spanning the REFERENCE min..max — new mass outside the
    reference range lands in the edge bins (clamped), which is exactly
    the drift the measure should see. Returns one row per bin:
    ``(bin, n_ref, n_cur, p_ref, p_cur, psi_term)``; total PSI is
    ``sum(psi_term)`` and the conventional reading is <0.1 stable,
    0.1-0.25 drifting, >0.25 shifted.

    ``eps`` floors both proportions before the log ratio (the standard
    empty-bin guard — PSI is infinite on true zeros); terms where BOTH
    sides are empty are exactly zero. NULL metric values are excluded
    from both sides. Bin assignment uses one shared (min, max, width)
    computed in double arithmetic, so an oracle replaying the same
    expressions bins identically."""
    if eps <= 0:
        raise ValueError(f"eps must be positive, got {eps}")
    # materialized (r16 sweep): psi_from_counts reads the spine twice
    # (totals aggregate + term projection), and each read re-ran the
    # whole two-corpus binning lineage; the spine is n_bins rows
    return psi_from_counts(
        _binned_spine(ref, cur, col, n_bins).localCheckpoint(eager=True),
        eps=eps,
    )


def _binned_spine(
    ref: DataFrame, cur: DataFrame, col: str, n_bins: int
) -> DataFrame:
    """Reference-edged equi-width bin counts of both sides:
    ``(bin, n_ref, n_cur)`` — the shared front half of :func:`psi`
    and :func:`jsd`. One min/max aggregate over the reference
    (broadcast 1-row), one combinable groupBy per side over bin
    indices, a bins-sized full-outer join. NULLs excluded; mass
    outside the reference range clamps into the edge bins."""
    if n_bins < 2:
        raise ValueError(f"n_bins must be >= 2, got {n_bins}")
    from pyspark.sql.functions import broadcast

    r = ref.filter(F.col(col).isNotNull())
    c = cur.filter(F.col(col).isNotNull())
    edges = r.agg(
        F.min(F.col(col).cast("double")).alias("__lo"),
        F.max(F.col(col).cast("double")).alias("__hi"),
    )

    def binned(df: DataFrame, out: str) -> DataFrame:
        x = F.col(col).cast("double")
        width = (F.col("__hi") - F.col("__lo")) / F.lit(float(n_bins))
        idx = F.when(F.col("__hi") == F.col("__lo"), F.lit(0)).otherwise(
            F.least(
                F.greatest(
                    F.floor((x - F.col("__lo")) / width).cast("int"), F.lit(0)
                ),
                F.lit(n_bins - 1),
            )
        )
        return (
            df.crossJoin(broadcast(edges))
            .select(idx.alias("bin"))
            .groupBy("bin")
            .agg(F.count("*").alias(out))
        )

    rb = binned(r, "n_ref")
    cb = binned(c, "n_cur")
    return rb.join(cb, on="bin", how="full_outer").select(
        "bin",
        F.coalesce("n_ref", F.lit(0)).alias("n_ref"),
        F.coalesce("n_cur", F.lit(0)).alias("n_cur"),
    )


def drift_summary(
    ref: DataFrame,
    cur: DataFrame,
    col: str,
    n_bins: int = 10,
    eps: float = 1e-6,
    max_spine: int | None = MAX_SPINE,
) -> DataFrame:
    """Every scalar drift measure in ONE row — the dashboard read:
    ``(psi_total, jsd_total, ks, auc, w1, n_ref, n_cur)``. PSI/JSD
    totals come from the binned spine (terms folded in BIN ORDER — a
    sorted sequential fold, not an order-undefined SUM, so the totals
    value-oracle like every term does); KS/AUC/W1 from the exact
    distinct-value spine.

    Plan shape: the exact distinct-value spine is computed ONCE
    (2 corpus scans — one per side's combinable groupBy) and
    localCheckpointed (bounded by ``max_spine``); the BIN spine then
    derives from the spine rows themselves — the bin of a value
    depends only on the value, so grouping the weighted spine by bin
    index is IDENTICAL to binning the raw rows, at spine cost instead
    of another two corpus scans — and every statistic reads a
    materialization. Without the checkpoints, Spark's lack of
    plan-level CTE reuse would re-run the corpus scans once per
    statistic (the binned_quantiles lesson, applied at the API
    level). Total: 2 corpus scans for 5 statistics — plus the
    ``_spine_guard`` probe's 2 (one combinable approx_count_distinct
    per side, run BEFORE the spine is planned so a row-cardinality
    metric raises instead of materializing a row-scale checkpoint);
    callers that already bounded the domain pass ``max_spine=None``
    and get the bare 2."""
    if eps <= 0:
        raise ValueError(f"eps must be positive, got {eps}")
    if n_bins < 2:
        raise ValueError(f"n_bins must be >= 2, got {n_bins}")
    _spine_guard(ref, cur, col, max_spine)
    from pyspark.sql.functions import broadcast

    spine_v = _counts_spine(ref, cur, col).localCheckpoint(eager=True)
    # reference edges from the spine's ref-weighted values — identical
    # to _binned_spine's raw-row min/max because binning is a pure
    # function of the value
    edges = spine_v.filter(F.col("c_ref") > 0).agg(
        F.min(F.col("v").cast("double")).alias("__lo"),
        F.max(F.col("v").cast("double")).alias("__hi"),
    )
    x = F.col("v").cast("double")
    width = (F.col("__hi") - F.col("__lo")) / F.lit(float(n_bins))
    idx = F.when(F.col("__hi") == F.col("__lo"), F.lit(0)).otherwise(
        F.least(
            F.greatest(
                F.floor((x - F.col("__lo")) / width).cast("int"), F.lit(0)
            ),
            F.lit(n_bins - 1),
        )
    )
    spine_b = (
        spine_v.crossJoin(broadcast(edges))
        .select(idx.alias("bin"), "c_ref", "c_cur")
        .groupBy("bin")
        .agg(
            F.sum("c_ref").alias("n_ref"), F.sum("c_cur").alias("n_cur")
        )
        .localCheckpoint(eager=True)
    )

    def folded_total(terms: DataFrame, term_col: str, out: str) -> DataFrame:
        return terms.agg(
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("bin", F.col(term_col)))),
                F.lit(0.0),
                lambda acc, x: acc + x[term_col],
            ).alias(out)
        )

    psi_total = folded_total(psi_from_counts(spine_b, eps=eps), "psi_term", "psi_total")
    jsd_total = folded_total(jsd_from_counts(spine_b), "jsd_term", "jsd_total")
    ks = ks_from_counts(spine_v).select("ks")
    auc = auc_from_counts(spine_v).select("auc")
    w1 = _w1_from_counts(spine_v).select("w1", "n_ref", "n_cur")
    out = psi_total.crossJoin(broadcast(jsd_total))
    out = out.crossJoin(broadcast(ks))
    out = out.crossJoin(broadcast(auc))
    return out.crossJoin(broadcast(w1)).select(
        "psi_total", "jsd_total", "ks", "auc", "w1", "n_ref", "n_cur"
    )


def embedding_centroid_drift(
    ref: DataFrame,
    cur: DataFrame,
    vec_col: str = "embedding",
    scale_bits: int = 20,
) -> DataFrame:
    """Drift for the EMBEDDING modality: cosine similarity and L2
    distance between the two snapshots' mean vectors — the cheapest
    meaningful "did the representation distribution move?" monitor
    (a mean shift moves retrieval/clustering behavior before any
    scalar metric notices). One row:
    ``(cos_centroid, l2_centroid, n_ref, n_cur)``.

    Exactness discipline (the decimal-PageRank idea, in dyadic form):
    every float32 component is quantized EXACTLY — ``floor(x * 2^20)``
    is a pure exponent shift of the binary value, identical in any
    IEEE engine — so the per-dimension sums are INTEGERS (order-free,
    overflow-safe: |sum| <= n * 2^20 * max|x|), and the cosine/L2
    arithmetic runs over the DIMENSION-SORTED array of those integers
    with a sequential fold — no order-undefined double SUM anywhere,
    hence SQL-oracleable. Cosine uses the sum vectors directly (the
    1/n factors cancel); L2 divides each sum by its side's count and
    rescales by 2^-scale_bits, so it is in the embedding's own units.
    Quantization bias is bounded by 2^-scale_bits per component
    (~1e-6 at 20 bits) — far below any drift threshold a monitor
    would act on.

    Scale shape: the vectors explode map-side into (dim, q) pairs and
    collapse into DIM-sized integer partials per side (combinable);
    everything after is dim-sized array math on one row. NULL vectors
    are excluded. Dimensions must be UNIFORM (the table contract
    everywhere else in the engine) and that contract is enforced at
    evaluation time from the per-dim counts already in hand — equal
    counts across observed dims is equivalent to equal vector lengths
    (posexplode counts are non-increasing in the dim index) — so
    ragged input RAISES instead of silently truncating to the shared
    dims (the pre-r12 inner join's failure mode). An entirely empty
    side is not ragged: the statistic is undefined against nothing and
    comes back NULL, the KS/AUC convention. The guard costs zero extra
    scans (it reads the same single aggregated row)."""
    # FULL OUTER: a dim present on one side only is evidence of
    # cross-side length mismatch — it must reach the guard, not be
    # silently dropped by an inner join
    joined = dim_sums(ref, vec_col, scale_bits, "sr", "nr").join(
        dim_sums(cur, vec_col, scale_bits, "sc", "nc"),
        on="d",
        how="full_outer",
    )
    return centroid_from_dim_sums(joined, scale_bits=scale_bits)


def dim_sums(
    df: DataFrame,
    vec_col: str,
    scale_bits: int,
    s_col: str = "sc",
    n_col: str = "nc",
) -> DataFrame:
    """One side's per-dimension quantized integer sums:
    ``(d, s_col, n_col)`` with ``s = sum(floor(x * 2^scale_bits))`` —
    the exact (order-free, mergeable) summary
    :func:`embedding_centroid_drift` runs its arithmetic over, and
    exactly the sidecar shape ``CentroidDriftStreamPipeline``
    publishes per micro-batch (integer sums fold across batches
    without error). NULL vectors excluded; map-side explode into
    DIM-sized combinable partials."""
    if not 1 <= scale_bits <= 30:
        raise ValueError(f"scale_bits must be in [1, 30], got {scale_bits}")
    mult = float(1 << scale_bits)
    base = df.filter(F.col(vec_col).isNotNull())
    return (
        base.select(F.posexplode(vec_col).alias("d", "x"))
        .select(
            "d",
            F.floor(F.col("x").cast("double") * F.lit(mult))
            .cast("long")
            .alias("q"),
        )
        .groupBy("d")
        .agg(F.sum("q").alias(s_col), F.count("*").alias(n_col))
    )


def centroid_from_dim_sums(
    joined: DataFrame, scale_bits: int = 20
) -> DataFrame:
    """The centroid-drift tail over already-quantized per-dimension
    integer sums ``(d, sr, nr, sc, nc)`` — the reusable half of
    :func:`embedding_centroid_drift`, also fed by the streaming
    monitor's folded per-batch sidecars
    (``CentroidDriftStreamPipeline.centroid_view``: the per-dim sums
    are exact integers, so the micro-batch fold is an exact sum and
    the view equals the batch operator over the concatenated stream).
    Carries the same ragged-dims guard: unequal per-dim counts within
    a side, or a dim missing from a non-empty side (NULL sr/nr or
    sc/nc), raise at evaluation."""
    if not 1 <= scale_bits <= 30:
        raise ValueError(f"scale_bits must be in [1, 30], got {scale_bits}")
    mult = float(1 << scale_bits)
    packed = joined.agg(
        F.array_sort(
            F.collect_list(F.struct("d", "sr", "sc"))
        ).alias("a"),
        F.max("nr").alias("n_ref"),
        F.max("nc").alias("n_cur"),
        F.min("nr").alias("__nr_min"),
        F.min("nc").alias("__nc_min"),
        F.coalesce(
            F.sum(F.when(F.col("nr").isNull(), 1).otherwise(0)), F.lit(0)
        ).alias("__miss_r"),
        F.coalesce(
            F.sum(F.when(F.col("nc").isNull(), 1).otherwise(0)), F.lit(0)
        ).alias("__miss_c"),
    )
    # uniform ⟺ within each non-empty side every observed dim carries
    # the same count AND no dim is missing from a non-empty side
    uniform = (
        F.col("__nr_min").eqNullSafe(F.col("n_ref"))
        & F.col("__nc_min").eqNullSafe(F.col("n_cur"))
        & (F.col("n_ref").isNull() | (F.col("__miss_r") == 0))
        & (F.col("n_cur").isNull() | (F.col("__miss_c") == 0))
    )

    def guarded(c):
        return F.when(
            F.assert_true(
                uniform,
                F.lit(
                    "embedding_centroid_drift: ragged vector lengths — "
                    "per-dimension counts differ within a side, or a "
                    "dimension is missing from one non-empty side; pad "
                    "or filter the corpus to uniform dims first"
                ),
            ).isNull(),
            c,
        )
    a = F.col("a")
    dot = F.aggregate(
        a, F.lit(0.0),
        lambda acc, x: acc + x["sr"].cast("double") * x["sc"].cast("double"),
    )
    nr2 = F.aggregate(
        a, F.lit(0.0),
        lambda acc, x: acc + x["sr"].cast("double") * x["sr"].cast("double"),
    )
    nc2 = F.aggregate(
        a, F.lit(0.0),
        lambda acc, x: acc + x["sc"].cast("double") * x["sc"].cast("double"),
    )
    l2sq = F.aggregate(
        a, F.lit(0.0),
        lambda acc, x: acc
        + (
            F.try_divide(x["sr"].cast("double"), F.col("n_ref"))
            - F.try_divide(x["sc"].cast("double"), F.col("n_cur"))
        )
        * (
            F.try_divide(x["sr"].cast("double"), F.col("n_ref"))
            - F.try_divide(x["sc"].cast("double"), F.col("n_cur"))
        ),
    )
    return packed.select(
        guarded(F.try_divide(dot, F.sqrt(nr2) * F.sqrt(nc2))).alias(
            "cos_centroid"
        ),
        guarded(F.sqrt(l2sq) / F.lit(mult)).alias("l2_centroid"),
        guarded(F.col("n_ref")).alias("n_ref"),
        guarded(F.col("n_cur")).alias("n_cur"),
    )


def psi_by_group(
    ref: DataFrame,
    cur: DataFrame,
    col: str,
    group_col: str,
    n_bins: int = 10,
    eps: float = 1e-6,
) -> DataFrame:
    """Per-SEGMENT PSI — the monitoring shape a mixture pipeline
    actually needs ("did the length distribution drift *within each
    language*?", where a global PSI can read stable while every
    segment shifted in opposite directions). One row per
    ``(group, bin)``: same columns and term math as :func:`psi`, with
    proportions normalized PER GROUP, and each group's bins spanning
    that group's OWN reference min..max (a group's drift is judged
    against its own baseline, not a global range that would squash
    narrow segments into one bin).

    Scale shape: one group-keyed min/max aggregate over the reference
    (group-cardinality-sized, broadcast back), one combinable groupBy
    per side over (group, bin), a (group x bins)-sized full-outer
    join, and per-group totals via a window over the already-bins-
    sized frame — the corpora shuffle only into (group, bin) partial
    counts. NULL metric values and NULL groups are excluded, and a
    group with no reference rows is excluded entirely (no baseline ->
    no bins to judge against; monitor new-group arrival with
    :func:`psi_categorical` on the group column instead)."""
    if n_bins < 2:
        raise ValueError(f"n_bins must be >= 2, got {n_bins}")
    if eps <= 0:
        raise ValueError(f"eps must be positive, got {eps}")
    from pyspark.sql import Window
    from pyspark.sql.functions import broadcast

    def clean(df: DataFrame) -> DataFrame:
        return df.filter(
            F.col(col).isNotNull() & F.col(group_col).isNotNull()
        )

    r, c = clean(ref), clean(cur)
    edges = r.groupBy(F.col(group_col).alias("__g")).agg(
        F.min(F.col(col).cast("double")).alias("__lo"),
        F.max(F.col(col).cast("double")).alias("__hi"),
    )

    def binned(df: DataFrame, out: str) -> DataFrame:
        x = F.col(col).cast("double")
        width = (F.col("__hi") - F.col("__lo")) / F.lit(float(n_bins))
        idx = F.when(F.col("__hi") == F.col("__lo"), F.lit(0)).otherwise(
            F.least(
                F.greatest(
                    F.floor((x - F.col("__lo")) / width).cast("int"), F.lit(0)
                ),
                F.lit(n_bins - 1),
            )
        )
        return (
            df.join(
                broadcast(edges), on=F.col(group_col) == F.col("__g"), how="inner"
            )
            .select(F.col("__g"), idx.alias("bin"))
            .groupBy("__g", "bin")
            .agg(F.count("*").alias(out))
        )

    rb = binned(r, "n_ref")
    cb = binned(c, "n_cur")
    spine = rb.join(cb, on=["__g", "bin"], how="full_outer").select(
        "__g",
        "bin",
        F.coalesce("n_ref", F.lit(0)).alias("n_ref"),
        F.coalesce("n_cur", F.lit(0)).alias("n_cur"),
    )
    w = Window.partitionBy("__g")
    both = spine.select(
        "*",
        F.sum("n_ref").over(w).alias("__tr"),
        F.sum("n_cur").over(w).alias("__tc"),
    )
    p_ref = F.greatest(
        F.coalesce(F.try_divide("n_ref", "__tr"), F.lit(0.0)),
        F.lit(float(eps)),
    )
    p_cur = F.greatest(
        F.coalesce(F.try_divide("n_cur", "__tc"), F.lit(0.0)),
        F.lit(float(eps)),
    )
    term = F.when(
        (F.col("n_ref") == 0) & (F.col("n_cur") == 0), F.lit(0.0)
    ).otherwise((p_ref - p_cur) * F.log(p_ref / p_cur))
    return both.select(
        F.col("__g").alias(group_col),
        "bin",
        "n_ref",
        "n_cur",
        p_ref.alias("p_ref"),
        p_cur.alias("p_cur"),
        term.alias("psi_term"),
    )


def jsd(
    ref: DataFrame,
    cur: DataFrame,
    col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Per-bin Jensen-Shannon divergence contributions between the
    two snapshots over reference-edged equi-width bins — see
    :func:`jsd_from_counts` for the term math and why JSD earns a
    place next to PSI."""
    # materialized: same two-consumer spine shape as :func:`psi` (r16)
    return jsd_from_counts(
        _binned_spine(ref, cur, col, n_bins).localCheckpoint(eager=True)
    )


def jsd_from_counts(spine: DataFrame) -> DataFrame:
    """Jensen-Shannon divergence terms over an already-binned count
    spine ``(bin, n_ref, n_cur)``: per bin,

        jsd_term = 0.5 * [ p*ln(p/m) + q*ln(q/m) ],   m = (p+q)/2

    with the standard ``0*ln(0) = 0`` convention — so unlike PSI no
    epsilon floor is needed (JSD is finite on true zeros, which is
    exactly why it complements PSI: a brand-new bin contributes
    bounded mass instead of an eps-dependent spike). Total JSD is
    ``sum(jsd_term)``, bounded in [0, ln 2]; 0 iff the distributions
    are identical. One row per bin — the per-bin contract of
    :func:`psi_from_counts`, with the same try_divide empty-side
    behavior (an all-empty side reads as all-zero proportions).
    Fed by the drift monitor's folded sidecar (``jsd_view``) or
    :func:`jsd`."""
    from pyspark.sql.functions import broadcast

    tot = spine.agg(
        F.sum("n_ref").alias("__tr"), F.sum("n_cur").alias("__tc")
    )
    both = spine.crossJoin(broadcast(tot))
    p = F.coalesce(F.try_divide("n_ref", "__tr"), F.lit(0.0))
    q = F.coalesce(F.try_divide("n_cur", "__tc"), F.lit(0.0))
    m = (p + q) / F.lit(2.0)
    term = F.lit(0.5) * (
        F.when(p > 0, p * F.log(p / m)).otherwise(F.lit(0.0))
        + F.when(q > 0, q * F.log(q / m)).otherwise(F.lit(0.0))
    )
    return both.select(
        "bin",
        "n_ref",
        "n_cur",
        p.alias("p_ref"),
        q.alias("p_cur"),
        term.alias("jsd_term"),
    )


def psi_from_counts(spine: DataFrame, eps: float = 1e-6) -> DataFrame:
    """The PSI term math over an ALREADY-BINNED count spine
    ``(bin, n_ref, n_cur)`` — the reusable tail of :func:`psi`, also
    fed by the streaming drift monitor's folded per-batch counts
    (bin counts are integers, so the sidecar merge is an exact sum
    and the PSI recomputes from totals each read). Same epsilon floor
    and both-empty-is-zero rule as :func:`psi`."""
    if eps <= 0:
        raise ValueError(f"eps must be positive, got {eps}")
    from pyspark.sql.functions import broadcast

    tot = spine.agg(
        F.sum("n_ref").alias("__tr"), F.sum("n_cur").alias("__tc")
    )
    both = spine.crossJoin(broadcast(tot))
    # an all-empty side (e.g. a drift monitor read before any batch
    # lands) has proportion 0 everywhere -> the epsilon floor, not a
    # division by its zero total (ANSI mode makes that an error)
    p_ref = F.greatest(
        F.coalesce(F.try_divide("n_ref", "__tr"), F.lit(0.0)),
        F.lit(float(eps)),
    )
    p_cur = F.greatest(
        F.coalesce(F.try_divide("n_cur", "__tc"), F.lit(0.0)),
        F.lit(float(eps)),
    )
    term = F.when(
        (F.col("n_ref") == 0) & (F.col("n_cur") == 0), F.lit(0.0)
    ).otherwise((p_ref - p_cur) * F.log(p_ref / p_cur))
    return both.select(
        "bin",
        "n_ref",
        "n_cur",
        p_ref.alias("p_ref"),
        p_cur.alias("p_cur"),
        term.alias("psi_term"),
    )


def psi_categorical(
    ref: DataFrame,
    cur: DataFrame,
    col: str,
    eps: float = 1e-6,
) -> DataFrame:
    """:func:`psi` for CATEGORICAL columns (language mix, source mix,
    license tags): one row per observed category with both side's
    counts, proportions (epsilon-floored) and the PSI term. No
    binning — the category IS the bin — so the only scale knob is
    category cardinality, and the corpus shuffles into |categories|
    combinable partial counts per side. Categories absent from one
    side surface with a zero count and the epsilon floor, which is
    precisely the "new source appeared / source vanished" drift a mix
    monitor exists to catch. NULL categories are excluded (monitor
    them as a quality metric, not a mix share)."""
    if eps <= 0:
        raise ValueError(f"eps must be positive, got {eps}")
    from pyspark.sql.functions import broadcast

    rb = (
        ref.filter(F.col(col).isNotNull())
        .groupBy(F.col(col).alias("category"))
        .agg(F.count("*").alias("n_ref"))
    )
    cb = (
        cur.filter(F.col(col).isNotNull())
        .groupBy(F.col(col).alias("category"))
        .agg(F.count("*").alias("n_cur"))
    )
    spine = rb.join(cb, on="category", how="full_outer").select(
        "category",
        F.coalesce("n_ref", F.lit(0)).alias("n_ref"),
        F.coalesce("n_cur", F.lit(0)).alias("n_cur"),
    )
    tot = spine.agg(F.sum("n_ref").alias("__tr"), F.sum("n_cur").alias("__tc"))
    both = spine.crossJoin(broadcast(tot))
    # an all-empty side has proportion 0 everywhere -> the epsilon
    # floor, not a division by its zero total (ANSI mode errors) —
    # the same contract as psi_from_counts
    p_ref = F.greatest(
        F.coalesce(F.try_divide("n_ref", "__tr"), F.lit(0.0)),
        F.lit(float(eps)),
    )
    p_cur = F.greatest(
        F.coalesce(F.try_divide("n_cur", "__tc"), F.lit(0.0)),
        F.lit(float(eps)),
    )
    return both.select(
        "category",
        "n_ref",
        "n_cur",
        p_ref.alias("p_ref"),
        p_cur.alias("p_cur"),
        ((p_ref - p_cur) * F.log(p_ref / p_cur)).alias("psi_term"),
    )


def _counts_spine(ref: DataFrame, cur: DataFrame, col: str) -> DataFrame:
    """Per-distinct-value counts of both sides over the union of
    observed values: ``(v, c_ref, c_cur)``. NULLs excluded. One
    combinable groupBy per side, a spine-sized full-outer join."""
    rv = (
        ref.filter(F.col(col).isNotNull())
        .groupBy(F.col(col).alias("v"))
        .agg(F.count("*").alias("c_ref"))
    )
    cv = (
        cur.filter(F.col(col).isNotNull())
        .groupBy(F.col(col).alias("v"))
        .agg(F.count("*").alias("c_cur"))
    )
    return rv.join(cv, on="v", how="full_outer").select(
        "v",
        F.coalesce("c_ref", F.lit(0)).alias("c_ref"),
        F.coalesce("c_cur", F.lit(0)).alias("c_cur"),
    )


def ks_statistic(
    ref: DataFrame,
    cur: DataFrame,
    col: str,
    max_spine: int | None = MAX_SPINE,
) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic over ``col``: one row
    ``(ks, at_value, n_ref, n_cur)`` where ``ks = max_v |F_ref(v) -
    F_cur(v)|`` over the union of observed values and ``at_value`` is
    the (smallest) value attaining it — the split point a drift triage
    looks at first.

    Exactness: the maximum is taken over the INTEGER quantity
    ``|cum_ref*n_cur - cum_cur*n_ref|`` and divided once by
    ``n_ref*n_cur``, so the double survives a cross-engine value hash
    (ties in the integer maximum break toward the smallest value —
    total order, both engines agree). NULLs are excluded; an EMPTY
    side yields a NULL ``ks`` (try_divide — the statistic is undefined
    against nothing, and ANSI mode must not error).

    The cumulative window runs over the distinct-value spine, and
    ``max_spine`` enforces in code that the spine stays bounded
    (integer metrics or pre-binned continuous ones) — see
    :func:`_spine_guard`."""
    _spine_guard(ref, cur, col, max_spine)
    # materialized (r16 sweep): the KS tail reads the spine from two
    # consumers (cumulative window + totals) — each re-ran both corpus
    # scans; the spine is distinct-value-bounded (guarded above)
    return ks_from_counts(
        _counts_spine(ref, cur, col).localCheckpoint(eager=True)
    )


def ks_from_counts(spine: DataFrame) -> DataFrame:
    """The KS tail over an already-counted value spine
    ``(v, c_ref, c_cur)`` — the reusable half of :func:`ks_statistic`,
    also fed by the streaming drift monitor's folded per-bin integers
    (``DriftMonitorPipeline.ks_view``, where ``v`` is the bin index
    and the statistic is the KS of the BINNED distributions)."""
    from pyspark.sql import Window
    from pyspark.sql.functions import broadcast

    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    cum = spine.select(
        "v",
        F.sum("c_ref").over(w).alias("cum_ref"),
        F.sum("c_cur").over(w).alias("cum_cur"),
    )
    tot = spine.agg(
        F.sum("c_ref").alias("n_ref"), F.sum("c_cur").alias("n_cur")
    )
    scored = cum.crossJoin(broadcast(tot)).select(
        "v",
        "n_ref",
        "n_cur",
        F.abs(
            F.col("cum_ref") * F.col("n_cur") - F.col("cum_cur") * F.col("n_ref")
        ).alias("num"),
    )
    best = scored.orderBy(F.col("num").desc(), F.col("v").asc()).limit(1)
    return best.select(
        F.try_divide(
            F.col("num"), (F.col("n_ref") * F.col("n_cur")).cast("double")
        ).alias("ks"),
        F.col("v").alias("at_value"),
        "n_ref",
        "n_cur",
    )


def wasserstein_1(
    ref: DataFrame,
    cur: DataFrame,
    col: str,
    max_spine: int | None = MAX_SPINE,
) -> DataFrame:
    """Earth-mover / 1-Wasserstein distance between the two empirical
    distributions of ``col``, in the metric's own units: ``W1 =
    integral |F_ref(x) - F_cur(x)| dx``, evaluated exactly over the
    observed-value spine as ``sum_i |cum_ref(v_i)*n_cur -
    cum_cur(v_i)*n_ref| * (v_{i+1} - v_i)`` with ONE final division by
    ``n_ref*n_cur``. Complements the unit-free siblings: KS is the max
    CDF gap (shape), AUC the stochastic dominance (location order) —
    W1 says HOW FAR the mass moved, which is what a mixture-rebalance
    decision actually costs against.

    Exactness: on integral metrics the numerator is a pure BIGINT sum
    (counts x value gaps), order-free across partitions, so the one
    division is bit-stable cross-engine — the suite oracles it. On
    double metrics each term is exact but the SUM order is not; treat
    the result as a float-fold like every multi-term double sum. An
    empty side yields NULL (try_divide). Same bounded-spine guard and
    cumulative-window shape as :func:`ks_statistic`."""
    _spine_guard(ref, cur, col, max_spine)
    # materialized: same multi-consumer spine shape as ks_statistic (r16)
    return _w1_from_counts(
        _counts_spine(ref, cur, col).localCheckpoint(eager=True)
    )


def _w1_from_counts(spine: DataFrame) -> DataFrame:
    """The W1 tail over an already-counted value spine
    ``(v, c_ref, c_cur)`` — shared by :func:`wasserstein_1` and
    :func:`drift_summary`."""
    from pyspark.sql import Window
    from pyspark.sql.functions import broadcast

    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    lead = Window.orderBy("v")
    cum = spine.select(
        "v",
        F.sum("c_ref").over(w).alias("cum_ref"),
        F.sum("c_cur").over(w).alias("cum_cur"),
        F.lead("v").over(lead).alias("v_next"),
    )
    tot = spine.agg(
        F.sum("c_ref").alias("n_ref"), F.sum("c_cur").alias("n_cur")
    )
    num = (
        cum.crossJoin(broadcast(tot))
        .filter(F.col("v_next").isNotNull())
        .agg(
            F.sum(
                F.abs(
                    F.col("cum_ref") * F.col("n_cur")
                    - F.col("cum_cur") * F.col("n_ref")
                )
                * (F.col("v_next") - F.col("v"))
            ).alias("__num")
        )
    )
    return num.crossJoin(broadcast(tot)).select(
        F.coalesce(
            F.try_divide(
                F.col("__num"), (F.col("n_ref") * F.col("n_cur")).cast("double")
            ),
            F.when(F.col("n_ref") * F.col("n_cur") > 0, F.lit(0.0)),
        ).alias("w1"),
        "n_ref",
        "n_cur",
    )


def _quantile_tail(
    counts: DataFrame,
    qs: list[float],
    count_col: str,
) -> DataFrame:
    """Shared interpolation tail over an integer bin-count spine
    ``(bin, count_col)``: per requested quantile q, the first bin
    whose cumulative count reaches ``q * n`` supplies
    ``est = lo + width * (bin + (q*n - cum_before)/cnt)`` — linear
    interpolation inside the crossing bin, every term deterministic
    (integer cums, one q*n product, one division), so a SQL oracle
    replays the doubles exactly. Bins absent from the spine are zero
    counters: the cumulative never moves there, so the crossing bin
    always has cnt > 0 for q*n > 0.

    The ``counts`` subtree is referenced exactly ONCE: the total rides
    an unbounded window over the same bins-sized sort, and the qs
    arrive by explode — self-joining or re-aggregating ``counts``
    would re-evaluate its whole upstream (the corpus scan, for
    :func:`binned_quantiles`) once per reference. An empty spine
    yields an empty result."""
    from pyspark.sql import Window

    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = counts.select(
        "bin",
        F.col(count_col).alias("__cnt"),
        F.sum(count_col).over(w).alias("__cum"),
        (F.sum(count_col).over(w) - F.col(count_col)).alias("__cb"),
        F.sum(count_col).over(wall).alias("__n"),
        F.col("__qlo"),
        F.col("__qw"),
    )
    hits = cum.select(
        "*", F.explode(F.array(*[F.lit(float(q)) for q in qs])).alias("q")
    ).filter(F.col("__cum") >= F.col("q") * F.col("__n"))
    first = hits.groupBy("q").agg(
        F.min_by(
            F.struct("bin", "__cnt", "__cb", "__qlo", "__qw", "__n"),
            F.col("bin"),
        ).alias("s")
    )
    est = F.col("s.__qlo") + F.col("s.__qw") * (
        F.col("s.bin")
        + F.try_divide(
            F.col("q") * F.col("s.__n") - F.col("s.__cb"), F.col("s.__cnt")
        )
    )
    return first.select(
        "q", est.alias("est"), F.col("s.__n").alias("n")
    ).orderBy("q")


def quantiles_from_counts(
    counts: DataFrame,
    qs: list[float],
    lo: float,
    hi: float,
    n_bins: int,
    count_col: str = "n_cur",
) -> DataFrame:
    """Quantile estimates from an ALREADY-BINNED equi-width count spine
    ``(bin, count_col)`` with known edges — the read-side companion of
    the drift monitor's sidecar (``DriftMonitorPipeline.quantile_view``
    feeds its folded integers here): approximate quantiles of
    everything ingested, error bounded by one bin width, computed from
    n_bins integers with NO quantile state kept on the stream and no
    corpus access. Deterministic (integer cums + one interpolation per
    q), hence SQL-oracleable — unlike approx_percentile's engine
    internals. ``qs`` in (0, 1]; one row ``(q, est, n)`` per quantile;
    an empty spine yields an empty result."""
    _validate_qs(qs)
    if n_bins < 2:
        raise ValueError(f"n_bins must be >= 2, got {n_bins}")
    width = 0.0 if hi == lo else (hi - lo) / float(n_bins)
    prepared = counts.select(
        "bin",
        count_col,
        F.lit(float(lo)).alias("__qlo"),
        F.lit(float(width)).alias("__qw"),
    )
    return _quantile_tail(prepared, qs, count_col)


def binned_quantiles(
    df: DataFrame,
    col: str,
    qs: list[float],
    n_bins: int = 100,
) -> DataFrame:
    """Approximate quantiles of ``col`` via an equi-width histogram:
    one min/max aggregate (broadcast 1-row), one combinable groupBy
    into at most ``n_bins`` partial counts — the corpus shuffles
    nothing row-sized — then per-q linear interpolation inside the
    crossing bin. Error is bounded by one bin width of the observed
    range; raise ``n_bins`` to tighten (the cost stays n_bins
    integers). The deterministic alternative to ``approx_percentile``
    when the answer must replay exactly cross-engine (every term is
    integer cums and one interpolation). NULLs excluded; ``qs`` in
    (0, 1]."""
    _validate_qs(qs)
    if n_bins < 2:
        raise ValueError(f"n_bins must be >= 2, got {n_bins}")
    from pyspark.sql.functions import broadcast

    d = df.filter(F.col(col).isNotNull())
    edges = d.agg(
        F.min(F.col(col).cast("double")).alias("__lo"),
        F.max(F.col(col).cast("double")).alias("__hi"),
    )
    x = F.col(col).cast("double")
    width = (F.col("__hi") - F.col("__lo")) / F.lit(float(n_bins))
    idx = F.when(F.col("__hi") == F.col("__lo"), F.lit(0)).otherwise(
        F.least(
            F.greatest(F.floor((x - F.col("__lo")) / width).cast("int"), F.lit(0)),
            F.lit(n_bins - 1),
        )
    )
    # lo/hi ride the groupBy as constant firsts so the edges subtree —
    # and with it the corpus scan — is referenced exactly once more
    # than the binned scan: two scans total, the psi floor
    prepared = (
        d.crossJoin(broadcast(edges))
        .select(idx.alias("bin"), "__lo", "__hi")
        .groupBy("bin")
        .agg(
            F.count("*").alias("n"),
            F.first("__lo").alias("__qlo"),
            F.when(F.first("__hi") == F.first("__lo"), F.lit(0.0))
            .otherwise(
                (F.first("__hi") - F.first("__lo")) / F.lit(float(n_bins))
            )
            .alias("__qw"),
        )
    )
    return _quantile_tail(prepared, qs, "n")


def _validate_qs(qs: list[float]) -> None:
    if not qs:
        raise ValueError("qs must name at least one quantile")
    for q in qs:
        if not 0 < q <= 1:
            raise ValueError(f"quantiles must be in (0, 1], got {q}")


def mann_whitney_auc(
    ref: DataFrame,
    cur: DataFrame,
    col: str,
    max_spine: int | None = MAX_SPINE,
) -> DataFrame:
    """Rank-based drift: the Mann-Whitney U statistic and its
    normalized form — ``auc = P(ref_value < cur_value) + 0.5 *
    P(equal)`` over all cross pairs, i.e. the common-language effect
    size / ROC-AUC of separating the two snapshots by this metric.
    ``auc = 0.5`` means no location drift; 0 or 1 means complete
    separation. Complements :func:`ks_statistic` (max CDF gap is
    shape-sensitive; AUC is the location/stochastic-dominance
    summary).

    Exactness: the pair count ``sum_v c_cur(v) * (2*cum_ref_before(v)
    + c_ref(v))`` is assembled in INTEGER half-units over the
    distinct-value spine and divided ONCE by ``2*n_ref*n_cur`` —
    bit-stable cross-engine, no per-pair work, no float rank
    averaging. ``u_statistic`` is the same numerator in half-units
    (``U = auc * n_ref * n_cur``). NULLs excluded; an empty side
    yields NULL ``auc`` (try_divide — no pairs exist to rank). One row
    out: ``(u_statistic, auc, n_ref, n_cur)``.

    Scale: the same bounded distinct-value spine discipline as
    :func:`ks_statistic` — per-value combinable groupBys, one
    cumulative window over the spine, totals broadcast — with the same
    in-code ``max_spine`` guard."""
    _spine_guard(ref, cur, col, max_spine)
    # materialized: same multi-consumer spine shape as ks_statistic (r16)
    return auc_from_counts(
        _counts_spine(ref, cur, col).localCheckpoint(eager=True)
    )


def auc_from_counts(spine: DataFrame) -> DataFrame:
    """The Mann-Whitney/AUC tail over an already-counted value spine
    ``(v, c_ref, c_cur)`` — the reusable half of
    :func:`mann_whitney_auc`, fed by the streaming monitor's folded
    bin integers the same way as :func:`ks_from_counts`."""
    from pyspark.sql import Window
    from pyspark.sql.functions import broadcast

    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    cum = spine.select(
        "c_ref",
        "c_cur",
        F.coalesce(F.sum("c_ref").over(w), F.lit(0)).alias("cum_ref_before"),
    )
    tot = spine.agg(
        F.sum("c_ref").alias("n_ref"), F.sum("c_cur").alias("n_cur")
    )
    num2 = cum.agg(
        F.sum(
            F.col("c_cur") * (F.lit(2) * F.col("cum_ref_before") + F.col("c_ref"))
        ).alias("__num2")
    )
    return (
        num2.crossJoin(broadcast(tot))
        .select(
            (F.col("__num2") / F.lit(2.0)).alias("u_statistic"),
            F.try_divide(
                F.col("__num2"),
                F.lit(2.0) * F.col("n_ref") * F.col("n_cur"),
            ).alias("auc"),
            "n_ref",
            "n_cur",
        )
    )
