"""Deterministic sampling for training-data curation.

``df.sample()`` is the wrong tool for a data pipeline: it is seeded per
partition, so the sampled SET changes whenever partitioning, file
layout, or cluster size changes — a backfill resamples different rows
than the original run, silently breaking train/eval separation. The
operators here derive membership from a CONTENT hash of stable key
columns instead:

* the decision is a pure map-side filter — zero shuffles, no state,
  embarrassingly parallel at any scale;
* the same row lands in the same bucket on every run, every cluster,
  every engine (md5 is engine-independent, unlike xxhash64 which DuckDB
  cannot reproduce — that is what makes these operators oracle-checkable);
* splits are disjoint and exhaustive by construction (half-open hex
  ranges over one hash value).

Hash mechanics: md5 of the concatenated key columns, first 8 hex chars
compared LEXICOGRAPHICALLY against a threshold — lowercase hex strings
of equal length order exactly like their numeric values, so no
hex-to-int conversion is needed (keeps the oracle SQL portable).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_HEX_SPACE = 1 << 32  # first 8 hex chars of the md5


def _bucket_hex(key_cols: Sequence[str], salt: str = "") -> Column:
    """First 8 hex chars of md5(salt || key columns) — the sampling
    coordinate in [0, 2^32) encoded as a lexicographically ordered hex
    string. ``salt`` decorrelates independent sampling decisions drawn
    from the same keys (e.g. a fraction sample inside a train split)."""
    parts = [F.lit(salt)] if salt else []
    parts += [F.col(c).cast("string") for c in key_cols]
    return F.substring(F.md5(F.concat_ws("\x1f", *parts)), 1, 8)


def _hex_threshold(fraction: float) -> str:
    v = max(0, int(fraction * _HEX_SPACE))
    # 2^32 would print as 9 chars and compare LOWER than any 8-char hex
    # ("1..." < "f..."); "g" is a single char above the whole hex
    # alphabet, so `bucket < "g"` correctly admits every row
    return "g" if v >= _HEX_SPACE else format(v, "08x")


def hash_sample(
    df: DataFrame, key_cols: Sequence[str], fraction: float, salt: str = ""
) -> DataFrame:
    """Keep ~``fraction`` of rows, deterministically by key content.

    Unlike ``df.sample``, membership survives repartitioning, reruns,
    and incremental backfills: a row is in or out forever. Pure
    map-side predicate — pushes down to the scan when the key columns
    are scan columns."""
    return df.filter(_bucket_hex(key_cols, salt) < F.lit(_hex_threshold(fraction)))


def exact_k_sample(
    df: DataFrame, key_cols: Sequence[str], k: int, salt: str = ""
) -> DataFrame:
    """EXACTLY ``k`` rows (fewer only if the input is smaller),
    deterministically: the k lowest rows in (md5 bucket, keys) order —
    a uniform sample with a guaranteed size, for fixed-size eval sets
    and golden subsets where :func:`hash_sample`'s ±binomial jitter is
    unacceptable. The full 32-hex digest (not the 8-char prefix)
    breaks bucket ties before the keys do, so the order is total and
    collision-free.

    Plan shape: ``orderBy().limit(k)`` compiles to
    TakeOrderedAndProject — a per-partition top-k heap plus one
    driver-side merge of k rows per partition, never a global sort.
    Growing k later yields a SUPERSET of the earlier sample (same
    order, longer prefix) — golden sets can be extended without
    invalidating the old one.

    PRECONDITION: ``key_cols`` must uniquely identify rows. Rows
    duplicated on the keys are TIED in (md5, keys) order, so which
    duplicate crosses the limit-k boundary is partitioning-dependent —
    both determinism and the grow-k superset guarantee then hold only
    up to that tie. Pass a unique column (row id) in ``key_cols``
    whenever duplicates are possible, the same discipline as
    ``sessionize``'s tiebreak_cols."""
    parts = [F.lit(salt)] if salt else []
    parts += [F.col(c).cast("string") for c in key_cols]
    order = [F.md5(F.concat_ws("\x1f", *parts))] + [F.col(c) for c in key_cols]
    return df.orderBy(*order).limit(k)


def weighted_sample(
    df: DataFrame,
    key_cols: Sequence[str],
    weight: Column,
    salt: str = "",
) -> DataFrame:
    """Keep each row with probability ``weight`` (a per-row column in
    [0, 1]), deterministically by key content — the quality-weighted
    corpus reweighting step (CCNet-style: admit a document with
    probability tied to its quality score, so "resampling toward the
    head" is a pure filter, not an RNG pass).

    Same machinery as :func:`hash_sample` — md5 bucket compared
    lexicographically — except the threshold is computed PER ROW from
    the weight: ``floor(weight * 2^32)`` rendered as 8 lowercase hex
    chars (format parity between Spark's ``format_string`` and
    DuckDB's ``printf`` keeps it oracle-checkable). Weights ≥ 1 admit
    unconditionally (the 9-char "100000000" would otherwise compare
    LOWER than 8-char buckets — same hazard :func:`_hex_threshold`
    documents); weights ≤ 0 never admit. Membership is monotone in the
    weight: raising a row's weight can only keep it, never drop it —
    the property that makes threshold sweeps reproducible subsets.
    Pure map-side predicate, zero shuffles."""
    bucket = _bucket_hex(key_cols, salt)
    # clamp below: a negative weight would floor to a negative long
    # whose %08x rendering is 16 chars of two's complement — which
    # compares HIGHER than every 8-char bucket and admits everything
    w = F.greatest(F.lit(0.0), weight)
    thr = F.format_string("%08x", F.floor(w * F.lit(float(_HEX_SPACE))).cast("long"))
    keep = F.when(w >= 1.0, F.lit(True)).otherwise(bucket < thr)
    return df.filter(keep)


def weighted_priority_sample(
    df: DataFrame,
    key_cols: Sequence[str],
    weight: Column,
    k: int,
    salt: str = "",
) -> DataFrame:
    """EXACTLY ``k`` rows sampled WITHOUT replacement with probability
    proportional to ``weight`` — Efraimidis & Spirakis (2006) A-Res:
    each row draws a priority ``u^(1/w)`` with ``u`` uniform in (0,1)
    and the k largest priorities win. Where :func:`weighted_sample` is
    Bernoulli (size jitters, weights are probabilities),
    this is the fixed-size form (weights are RELATIVE odds — "sample
    100k documents, quality-weighted").

    Determinism: ``u`` comes from the content hash, not an RNG —
    ``(first-8-hex-of-md5 + 0.5) / 2^32`` — so the sample survives
    repartitioning and reruns, and an oracle can replay it. The
    priority is compared as ``ln(u)/w`` (monotone in ``u^(1/w)`` since
    ``ln u < 0``: larger is closer to 0), avoiding cross-engine
    ``pow`` in favor of one ``ln`` and one division. Rows with
    non-positive weight never qualify (A-Res has no mass for them).

    Plan shape: map-side priority + ``orderBy().limit(k)`` =
    TakeOrderedAndProject (per-partition heap, k-row driver merge),
    never a global sort. The full-digest + key tiebreak makes the
    order total, same discipline as :func:`exact_k_sample`."""
    parts = [F.lit(salt)] if salt else []
    parts += [F.col(c).cast("string") for c in key_cols]
    digest = F.md5(F.concat_ws("\x1f", *parts))
    u = (
        F.conv(F.substring(digest, 1, 8), 16, 10).cast("double") + F.lit(0.5)
    ) / F.lit(float(_HEX_SPACE))
    w = weight.cast("double")
    pri = F.log(u) / w
    order = [pri.desc(), digest] + [F.col(c) for c in key_cols]
    return df.filter(w > 0).orderBy(*order).limit(k)


def split_column(
    key_cols: Sequence[str],
    splits: dict[str, float],
    salt: str = "",
) -> Column:
    """A split-label column from cumulative half-open hash ranges.

    ``splits`` maps label -> weight (weights need not sum to 1; rows
    hashing past the last boundary get NULL, i.e. "held out"). Ranges
    are disjoint and exhaustive over the listed weights by
    construction, so train/eval can NEVER overlap — the property that
    per-split independent sampling does not give."""
    total = 0.0
    expr = F.lit(None).cast("string")
    bucket = _bucket_hex(key_cols, salt)
    bounds: list[tuple[str, str, str]] = []
    for label, weight in splits.items():
        lo = _hex_threshold(total)
        total += weight
        bounds.append((label, lo, _hex_threshold(total)))
    if bounds and abs(total - 1.0) < 1e-9:
        # float accumulation can land a hair under 1.0, which would
        # hold out the topmost hash sliver ("ffffffff") from splits the
        # caller clearly meant to be exhaustive — clamp the last bound
        label, lo, _ = bounds[-1]
        bounds[-1] = (label, lo, "g")
    for label, lo, hi in reversed(bounds):
        expr = F.when((bucket >= lo) & (bucket < hi), label).otherwise(expr)
    return expr


def train_eval_split(
    df: DataFrame, key_cols: Sequence[str], splits: dict[str, float], salt: str = ""
) -> DataFrame:
    """Attach a ``split`` label column (see :func:`split_column`)."""
    return df.withColumn("split", split_column(key_cols, splits, salt))


def mixture_fractions(
    counts: dict[str, int], weights: dict[str, float]
) -> dict[str, float]:
    """Per-source sampling fractions that realize a target mixture.

    Given source row counts and target composition weights, the largest
    achievable output (no upsampling) is ``T = min_s(n_s / w_s)``; each
    source then contributes ``w_s * T`` rows, i.e. fraction
    ``w_s * T / n_s`` (the binding source samples at 1.0). Driver-side
    arithmetic on a handful of per-source scalars — the counts come
    from one tiny groupBy."""
    active = {s: w for s, w in weights.items() if w > 0}
    t = min(counts[s] / w for s, w in active.items())
    return {
        s: (min(1.0, w * t / counts[s]) if counts[s] else 0.0)
        for s, w in active.items()
    }


def temperature_quotas(
    counts: dict[str, int], total_out: int, alpha: float = 0.5
) -> dict[str, int]:
    """Temperature-scaled mixture quotas (the mT5/XLM-R ``p^alpha``
    recipe): sample sources proportionally to ``n_s^alpha`` so
    low-resource sources are upweighted relative to their natural share
    (alpha=1 keeps natural proportions, alpha=0 is uniform). Returns a
    per-source DOCUMENT quota summing to ≤ ``total_out``; feed it to
    :func:`mixture_by_token_budget` with a unit token count to admit
    exactly the quota per source in deterministic hash order.

    For the default alpha=0.5 the scaled mass is computed as
    ``math.isqrt(n_s)`` — pure INTEGER arithmetic end-to-end, so an SQL
    oracle reproduces the quotas bit-exactly (``floor(sqrt(n))`` on a
    double is exact for n < 2^52 away from the mis-rounding band near
    perfect squares, which starts mattering only past ~10^15 rows).
    Other alphas go through float ``pow`` — fine for production use,
    but not oracle-grade (libm pow is not cross-engine bit-stable).
    Driver-side arithmetic over |sources| scalars.
    """
    if total_out < 0:
        raise ValueError(f"total_out must be non-negative, got {total_out}")
    import math

    if alpha == 0.5:
        mass = {s: math.isqrt(n) for s, n in counts.items() if n > 0}
    else:
        mass = {s: int(n**alpha * (1 << 20)) for s, n in counts.items() if n > 0}
    total_mass = sum(mass.values())
    if total_mass == 0:
        return {s: 0 for s in mass}
    return {s: (total_out * m) // total_mass for s, m in mass.items()}


def mixture_sample(
    df: DataFrame,
    source_col: str,
    fractions: dict[str, float],
    key_cols: Sequence[str],
    salt: str = "",
) -> DataFrame:
    """Sample each source at its own fraction — dataset mixture
    weighting (e.g. rebalance web/code/books to a target recipe).
    Sources absent from ``fractions`` are dropped. Still a pure
    map-side predicate: the per-source threshold is a CASE chain over
    the (small) source set, composed with the same hash the other
    samplers use, so mixture membership is as rerun-stable as a plain
    fraction sample. Use :func:`mixture_fractions` to derive the
    fractions from counts + target weights."""
    bucket = _bucket_hex(key_cols, salt)
    th = F.lit(None).cast("string")
    for s, frac in fractions.items():
        th = F.when(F.col(source_col) == s, F.lit(_hex_threshold(frac))).otherwise(th)
    return df.filter(bucket < th)


def stratified_sample(
    df: DataFrame,
    strata_cols: Sequence[str],
    n_per_stratum: int,
    key_cols: Sequence[str],
    salt: str = "",
) -> DataFrame:
    """Exactly ``min(n, |stratum|)`` rows per stratum, chosen by hash
    rank — deterministic quota sampling (balanced eval sets, per-source
    caps in a mixture). ONE shuffle on the strata columns; the hash
    order is uniform within each stratum, so the quota is an unbiased
    draw. Ties are impossible: the full md5 plus the key columns make
    the ordering total."""
    from pyspark.sql import Window

    parts = ([F.lit(salt)] if salt else []) + [F.col(c).cast("string") for c in key_cols]
    order = [F.md5(F.concat_ws("\x1f", *parts))] + [F.col(c) for c in key_cols]
    w = Window.partitionBy(*strata_cols).orderBy(*order)
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= n_per_stratum)
        .drop("__rk")
    )


def cluster_safe_split(
    docs: DataFrame,
    pairs: DataFrame,
    splits: dict[str, float],
    id_col: str = "doc_id",
    a_col: str = "id_a",
    b_col: str = "id_b",
    salt: str = "",
) -> DataFrame:
    """Near-dup-aware train/eval split: hash-range membership computed
    on the CLUSTER id (connected components over ``pairs``), not the
    document id, so every member of a near-duplicate cluster lands on
    the SAME side of the split. Per-document hashing leaks eval
    content into train whenever a near-dup pair straddles the
    boundary — the contamination the split-leakage audit detects;
    this is the constructive fix. Returns ``docs`` plus ``cluster_id``
    and ``split`` (half-open md5 ranges: disjoint-exhaustive, rerun-
    and partitioning-invariant, same contract as
    :func:`train_eval_split`).

    Scale shape: components run only over the paired-node set (tiny
    next to the corpus), the corpus is labeled via a broadcast join,
    and the split predicate is pure map-side codegen — the corpus is
    never shuffled."""
    from d365fo_db_sync_spark.operators.graph import connected_components

    comp = connected_components(pairs, src=a_col, dst=b_col).withColumnRenamed(
        "node", id_col
    )
    labeled = (
        docs.join(F.broadcast(comp), on=id_col, how="left")
        .withColumn("cluster_id", F.coalesce("component", F.col(id_col)))
        .drop("component")
    )
    return labeled.withColumn("split", split_column(["cluster_id"], splits, salt))


def ordered_budget_head(
    df: DataFrame,
    order_key: Column,
    band: Column,
    token_count: Column,
    budget: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Greedy best-first selection under a token budget: admit rows in
    ascending ``(order_key, id_col)`` order until ``budget`` tokens are
    reached (the row crossing the line is included) — "fill a 10 B
    token budget with the highest-quality documents", the
    quality-ordered complement of :func:`mixture_by_token_budget`'s
    unbiased hash-ordered admission. Returns ``(id_col, n_tokens,
    tok_before)`` for admitted rows; ``tok_before < budget`` IS the
    admission predicate. Zero-token rows are dropped.

    ``band`` must be a MONOTONE NON-DECREASING coarsening of
    ``order_key`` (rows in an earlier band all precede rows in a later
    band): derive it as a fixed-width or quantile bucketing of the
    order key — at corpus scale compute band edges once with
    ``approxQuantile`` so bands stay balanced. The banded two-stage
    scan is the :func:`packing.hash_banded_prefix_sum` discipline
    generalized to a caller-chosen order: stage 1 is an in-band
    running sum (parallel across bands), stage 2 an exclusive prefix
    over the band-total frame (|bands| rows, metadata-sized, broadcast
    back) — never a global single-partition window over the corpus."""
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    sized = df.select(
        F.col(id_col),
        order_key.alias("_ord"),
        band.cast("long").alias("_band"),
        token_count.cast("long").alias("n_tokens"),
    ).filter(F.col("n_tokens") > 0)
    in_band = (
        Window.partitionBy("_band")
        .orderBy("_ord", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = sized.withColumn("_local_end", F.sum("n_tokens").over(in_band))
    totals = sized.groupBy("_band").agg(F.sum("n_tokens").alias("_tot"))
    # |bands| rows: the single-partition stage-2 window is explicit
    # and safe by construction (same rationale as the packing scan);
    # the pmod key survives constant folding where a bare literal
    # would trip the global-window warning
    band_order = (
        Window.partitionBy(F.pmod(F.crc32(F.col("_band").cast("string")), F.lit(1)))
        .orderBy("_band")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        "_band",
        F.coalesce(F.sum("_tot").over(band_order), F.lit(0)).alias("_off"),
    )
    return (
        local.join(F.broadcast(offsets), on="_band")
        .withColumn(
            "tok_before", F.col("_off") + F.col("_local_end") - F.col("n_tokens")
        )
        .filter(F.col("tok_before") < F.lit(int(budget)))
        .select(id_col, "n_tokens", "tok_before")
    )


def quantile_bands(
    df: DataFrame,
    order_key: Column,
    n_bands: int = 256,
    relative_error: float = 0.001,
) -> Column:
    """Build a balanced band expression for :func:`ordered_budget_head`
    from the observed distribution of ``order_key``: one
    ``approxQuantile`` pass computes ``n_bands - 1`` edges, and the
    returned column maps each row to its quantile bucket via a
    compiled comparison chain (whole-stage codegen, no UDF). The
    result is monotone non-decreasing in ``order_key`` by
    construction — the band contract — and because the operator's
    output is invariant to WHERE band edges fall (bands are a plan
    hint, not a semantic boundary), the approximation error only
    shifts work between bands, never results.

    Cost: one extra pass over ``order_key`` (Greenwald-Khanna sketch,
    driver merge of per-partition summaries). At corpus scale run it
    on a :func:`hash_sample` of the input instead — quantile edges
    from a 1% sample keep bands balanced within the sampling error."""
    if n_bands < 2:
        raise ValueError(f"n_bands must be >= 2, got {n_bands}")
    probs = [i / n_bands for i in range(1, n_bands)]
    edges = (
        df.select(order_key.cast("double").alias("_q"))
        .na.drop()
        .approxQuantile("_q", probs, relative_error)
    )
    expr: Column = F.lit(0)
    key = order_key.cast("double")
    # wrap ascending so the OUTERMOST when tests the largest edge:
    # the largest satisfied edge wins, band i+1 means
    # order_key >= edges[i] — monotone by construction
    for i in range(len(edges)):
        expr = F.when(key >= F.lit(edges[i]), F.lit(i + 1)).otherwise(expr)
    return expr


def mixture_by_token_budget(
    df: DataFrame,
    group_col: str,
    token_count: Column,
    budgets: dict[str, int],
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Assemble a TOKEN-budgeted mixture: per group, admit documents in
    deterministic hash order until the group's token budget is reached
    (the document that crosses the line is included, so every budget is
    met or the group is exhausted). "30 B tokens of web, 10 B of code"
    is the shape pretraining mixtures are actually specified in — doc
    fractions (:func:`mixture_fractions`-style) under- or over-shoot
    whenever per-source document lengths differ.

    Returns (group_col, id_col, n_tokens, tok_before) for admitted
    documents — ``tok_before`` is the group's running total before this
    document, so ``tok_before < budget`` IS the admission predicate.

    Scale shape (the packing.pack_sequences discipline, per group): the
    hash order key's first two hex chars band each group into 256
    sub-buckets; stage 1 is an in-bucket running sum (parallel across
    groups × buckets), stage 2 an exclusive prefix over the ≤
    |groups|·256-row bucket-total frame (metadata-sized, broadcast
    back). No per-group global window, so one giant source cannot
    serialize into a single task. Selection order is the md5 hash, so
    the admitted prefix is an unbiased sample of the group — and the
    same rows are admitted on every rerun, any partitioning.
    """
    if not budgets:
        raise ValueError("mixture_by_token_budget needs at least one budget")
    from d365fo_db_sync_spark.operators.packing import hash_banded_prefix_sum

    parts = ([F.lit(salt)] if salt else []) + [F.col(id_col).cast("string")]
    h = F.md5(F.concat_ws("\x1f", *parts))
    sized = df.select(
        F.col(group_col),
        F.col(id_col),
        token_count.cast("long").alias("n_tokens"),
        h.alias("_h"),
    ).filter(F.col("n_tokens") > 0)
    # the shared banded two-stage scan (operators/packing.py) computes
    # the per-group exclusive running total; admission is then a pure
    # filter against the group's budget
    prefixed, _ = hash_banded_prefix_sum(sized, id_col, group_cols=(group_col,))
    budget_col = F.lit(None).cast("long")
    for g, b in budgets.items():
        budget_col = F.when(F.col(group_col) == g, F.lit(int(b))).otherwise(budget_col)
    return (
        prefixed.withColumn("_budget", budget_col)
        .filter(F.col("_budget").isNotNull() & (F.col("tok_before") < F.col("_budget")))
        .select(group_col, id_col, "n_tokens", "tok_before")
    )


def gumbel_topk_sample(
    df: DataFrame,
    key_cols: Sequence[str],
    log_weight: Column,
    k: int,
    salt: str = "",
) -> DataFrame:
    """Exactly ``k`` rows without replacement with probability
    proportional to ``exp(log_weight)`` — the Gumbel-top-k trick
    (Vieira 2014; equivalent to :func:`weighted_priority_sample`'s
    A-Res, proof: -ln(-ln u) + ln w is a monotone transform of
    u^(1/w)), for pipelines that produce LOG weights directly —
    importance resampling (DSIR-style), LM scores — where
    exponentiating first would under/overflow long before the
    comparison cares.

    Same determinism contract as the linear-domain form: the Gumbel
    noise ``g = -ln(-ln u)`` comes from the content-hash uniform, not
    an RNG, so the selected SET is rerun- and repartition-invariant
    and an oracle replays it. Rows with NULL log-weight never qualify.
    Plan: map-side key + TakeOrderedAndProject — no global sort."""
    parts = [F.lit(salt)] if salt else []
    parts += [F.col(c).cast("string") for c in key_cols]
    digest = F.md5(F.concat_ws("\x1f", *parts))
    u = (
        F.conv(F.substring(digest, 1, 8), 16, 10).cast("double") + F.lit(0.5)
    ) / F.lit(float(_HEX_SPACE))
    key = log_weight.cast("double") - F.log(-F.log(u))
    order = [key.desc(), digest] + [F.col(c) for c in key_cols]
    return df.filter(log_weight.isNotNull()).orderBy(*order).limit(k)
