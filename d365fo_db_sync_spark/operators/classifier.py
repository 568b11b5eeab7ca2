"""Trained quality classifier — the CCNet/fastText-style
discriminative filter (Wenzek et al. 2020 "CCNet"; Joulin et al. 2017
"Bag of Tricks"; the GPT-3 curation recipe, Brown et al. 2020 App. A):
a logistic regression over hashed unigram+bigram features scoring
"reference-like vs crawl", trained IN SPARK with a fixed number of
full-batch gradient-descent rounds.

This is the discriminative sibling of DSIR (operators/dsir.py): DSIR
*weights toward* a target distribution (generative importance ratio);
this classifier *filters* against labeled reference data — the two
compose into the standard published curation stack. It reuses DSIR's
featurizer (``dsir.hashed_features``) and bucket hash verbatim, so one
feature explode can feed both.

Training shape, per round (the ``graph.pagerank`` fixed-K replay
discipline applied to SGD):

1. **score** — per-document ``w·x + b`` where ``x`` is the
   length-normalized hashed-TF vector (``cnt/n_doc`` — every division
   IEEE-exact). The dot product joins the per-(doc, bucket) frame with
   the BROADCAST weight table and folds the BUCKET-SORTED contribution
   list (``aggregate`` over ``array_sort(collect_list(...))``) — a
   deterministic sequential sum, never an order-undefined SQL SUM.
2. **sigmoid** — ``p = 1/(1+exp(-score))``, then quantized through
   ``DECIMAL(38,12)`` (decimal cast, not ``round()`` on DOUBLE — the
   two engines' double-round differ; the decimal cast is exact and
   HALF_UP in both). The quantization is a cross-engine
   re-synchronization barrier: everything downstream of a matching
   ``p`` matches exactly.
3. **gradient** — per-bucket ``sum((p-y) * x)`` with every term
   quantized to ``DECIMAL(38,18)`` BEFORE the sum (exact, order-free,
   the decimal-PageRank discipline), one cast back to DOUBLE, one
   division by ``n``.
4. **update** — ``w' = decimal38_12(w - lr * (g/n))`` per bucket (and
   the same for the bias), so the weights entering the next round are
   decimal-quantized doubles a SQL oracle unrolls as chained CTEs,
   round for round.

Scale shape: the corpus explodes ONCE into per-(doc, bucket) counts
(localCheckpointed — both the per-round gradient and the final scoring
read it; Spark's lack of plan reuse would otherwise re-run the feature
explode per action), each round moves ONE doc-keyed score join plus
ONE combinable bucket-keyed gradient aggregate (at most ``m_buckets``
partials), and the model itself is <= m_buckets + 1 doubles — bounded
metadata on the driver, broadcast back for scoring. Nothing row-scale
ever sits on the driver.

Reference scope: the reference engine copies table rows verbatim
(`/root/reference/DBSyncTool/Services/CopyOrchestrator.cs`); trained
curation models are the training-data extension tier (SURVEY §2.8,
BASELINE.json "text analysis" north star), sibling to
operators/dsir.py and operators/text.py's heuristic
``quality_classifier``.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from d365fo_db_sync_spark.operators.dsir import _bucket, hashed_features

__all__ = [
    "LogRegModel",
    "hashed_tf",
    "histogram_from_partials",
    "influence_scores",
    "logreg_fit",
    "logreg_score",
    "prob_partials",
    "score_histogram",
]

#: the per-stage quantization grids: scores/weights/probabilities
#: re-synchronize cross-engine at 12 decimal digits (far below any
#: decision threshold), per-term gradient contributions at 18 (the
#: pagerank inflow discipline — exact, order-free decimal sums).
#:
#: Semantics fine print (measured, not hypothetical): Spark's
#: double->decimal cast routes through BigDecimal.valueOf, which
#: quantizes the double's SHORTEST decimal representation
#: (Double.toString); an engine quantizing the exact binary expansion
#: instead (Python's Decimal(float); DuckDB's cast) can differ in the
#: last decimal place of the 18-digit grid (~1e-17 absolute). The
#: 12-digit model grid and the harness's 9-digit value hash both sit
#: far above that gap, so oracles and replays agree — but an EXACT
#: replay (the pytest discipline) must quantize Decimal(repr(x)), the
#: shortest-repr form, as tests/test_classifier.py's _q/_d18 do.
_Q_MODEL = "decimal(38,12)"
_Q_TERM = "decimal(38,18)"


@dataclass(frozen=True)
class LogRegModel:
    """A fitted hashed-n-gram logistic regression: per-bucket weights
    (only buckets observed in training carry one — unseen buckets
    contribute nothing at scoring, the hashing-trick contract), the
    bias, and the hyperparameters needed to featurize identically at
    scoring time. All weights are DECIMAL(38,12)-quantized doubles —
    the exact numbers a SQL oracle's CTE replay produces."""

    weights: dict[int, float] = field(default_factory=dict)
    bias: float = 0.0
    m_buckets: int = 1024
    lr: float = 10.0
    rounds: int = 2
    lr_bias: float | None = None


def hashed_tf(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    m_buckets: int = 1024,
) -> DataFrame:
    """Length-normalized hashed term frequencies:
    ``(id_col, bucket, cnt, n_features, x)`` with ``x = cnt /
    n_features`` (an IEEE-exact division — both engines agree bit for
    bit). One map-side feature explode collapsing into per-(doc,
    bucket) counts; documents with no features yield no rows (callers
    re-attach them with a left join, the DSIR convention). The
    featurizer and bucket hash are DSIR's — one explode can serve
    both operators.

    ``n_features`` (the per-doc total feature count = sum of cnt) is
    the SIZE of the feature array, so it rides map-side from before
    the explode instead of a partition-by-doc window after the
    aggregate — one exchange+sort fewer per featurize, identical
    integers, identical ``x`` doubles (r15).

    PRECONDITION (load-bearing since the r15 map-side change):
    ``id_col`` must be unique in ``df``. Grouping on (id, n_features,
    bucket) treats n_features as functionally dependent on the id;
    two rows sharing an id but differing in feature count would
    produce separate (id, bucket) rows where the old window-sum shape
    merged them. Every engine caller keys documents by a unique
    doc_id; a caller with duplicate ids must pre-aggregate first."""
    if m_buckets < 2:
        raise ValueError(f"m_buckets must be >= 2, got {m_buckets}")
    counts = (
        df.select(F.col(id_col), hashed_features(text_col).alias("__fs"))
        .select(
            id_col,
            F.size("__fs").cast("long").alias("n_features"),
            F.explode(F.col("__fs")).alias("__f"),
        )
        .select(
            id_col, "n_features", _bucket(F.col("__f"), m_buckets).alias("bucket")
        )
        # n_features is functionally dependent on id_col — an extra
        # grouping key, not extra groups
        .groupBy(id_col, "n_features", "bucket")
        .agg(F.count("*").alias("cnt"))
    )
    return counts.select(
        id_col,
        "bucket",
        "cnt",
        "n_features",
        (F.col("cnt").cast("double") / F.col("n_features").cast("double")).alias(
            "x"
        ),
    )


def _sigmoid_q(score):
    """Quantized logistic: ``decimal38_12(1 / (1 + exp(-score)))`` —
    the cross-engine re-synchronization barrier (see module doc)."""
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-score))
    return p.cast(_Q_MODEL).cast("double")


def _fold_dot(terms: DataFrame, id_col: str) -> DataFrame:
    """Per-document ``sum(w*x)`` as a fold over the BUCKET-SORTED
    contribution list — deterministic sequential double sum (the DSIR
    discipline), so the score replays exactly in SQL."""
    return terms.groupBy(id_col).agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("bucket", "c"))),
            F.lit(0.0),
            lambda acc, t: acc + t["c"],
        ).alias("__s")
    )


def _scores(
    x: DataFrame,
    base: DataFrame,
    id_col: str,
    weights: dict[int, float],
    bias: float,
    spark,
    carry: tuple[str, ...] = (),
) -> DataFrame:
    """``(id_col, *carry, score)`` for every row of ``base``: the
    broadcast weight map dotted against the hashed-TF frame, bias
    added; documents with no features (or only unseen buckets) score
    the bare bias. An empty weight map short-circuits to the bias —
    the round-1 state. ``carry`` passes extra ``base`` columns
    through, so a caller needing (score, label) per row reads them
    off this frame directly instead of re-joining ``base`` on
    ``id_col`` (one exchange+join per fit round saved; the score
    arithmetic is untouched)."""
    from pyspark.sql.functions import broadcast

    if not weights:
        return base.select(id_col, *carry, F.lit(float(bias)).alias("score"))
    wdf = spark.createDataFrame(
        sorted((int(b), float(w)) for b, w in weights.items()),
        "bucket long, w double",
    )
    terms = x.join(broadcast(wdf), on="bucket").select(
        id_col, "bucket", (F.col("w") * F.col("x")).alias("c")
    )
    dot = _fold_dot(terms, id_col)
    return base.join(dot, on=id_col, how="left").select(
        id_col,
        *carry,
        (F.coalesce("__s", F.lit(0.0)) + F.lit(float(bias))).alias("score"),
    )


def _fused_round_grad(
    x: DataFrame,
    y: DataFrame,
    id_col: str,
    weights: dict[int, float],
    bias: float,
    spark,
) -> DataFrame:
    """One fit round's gradient frame ``(bucket, __gd)`` — bias under
    bucket -1 — as a SINGLE plan over ``x`` (r16 fusion; requires
    non-empty ``weights``).

    Value preservation vs the unfused shape, term by term:

    * score: the fold runs over ``filter(array_sort(collect_list(
      struct(bucket, x, c))), c IS NOT NULL)`` — the same members
      (weighted buckets only; ``c = w * x`` after a broadcast join) in
      the same order (bucket asc — buckets are distinct per doc) as
      ``_fold_dot``'s ``array_sort(collect_list(struct(bucket, c)))``,
      so the sequential double sum is bit-identical.
    * docs with features but no weighted bucket fold to 0.0; featureless
      docs (left join from ``y``) coalesce to 0.0 — both match the old
      ``coalesce(__s, 0.0) + bias``.
    * gradient: every (doc, bucket) term is ``(__r * x).cast(_Q_TERM)``
      exactly as before; the bias entry is appended to the SAME array
      with ``x = 1.0``, and ``__r * 1.0 == __r`` bit-for-bit (IEEE
      multiplication by one is exact; ``__r`` is always finite), so the
      bias terms equal the old ``__r.cast(_Q_TERM)``. The grouped
      decimal sum is order-free exact either way.
    """
    from pyspark.sql.functions import broadcast

    wdf = spark.createDataFrame(
        sorted((int(b), float(w)) for b, w in weights.items()),
        "bucket long, w double",
    )
    dot = F.aggregate(
        F.filter(F.col("__arr"), lambda t: t["c"].isNotNull()),
        F.lit(0.0),
        lambda acc, t: acc + t["c"],
    )
    # the fold is projected HERE, per doc, below the y join and the
    # explode: left in the post-explode projection the optimizer
    # re-evaluates it once per exploded TERM (~avg buckets/doc times
    # per doc — verified in the plan). Only the scalar sigmoid rides
    # above the Generate.
    per_doc = (
        x.join(broadcast(wdf), on="bucket", how="left")
        .groupBy(id_col)
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct("bucket", "x", (F.col("w") * F.col("x")).alias("c"))
                )
            ).alias("__arr")
        )
        .select(id_col, "__arr", F.coalesce(dot, F.lit(0.0)).alias("__dot"))
    )
    score = F.coalesce(F.col("__dot"), F.lit(0.0)) + F.lit(float(bias))
    bias_entry = F.struct(
        F.lit(-1).cast("long").alias("bucket"),
        F.lit(1.0).alias("x"),
        F.lit(None).cast("double").alias("c"),
    )
    terms = (
        y.join(per_doc, on=id_col, how="left")
        .select(
            (_sigmoid_q(score) - F.col("__y")).alias("__r"),
            F.explode(
                F.when(F.col("__arr").isNull(), F.array(bias_entry)).otherwise(
                    F.concat(F.col("__arr"), F.array(bias_entry))
                )
            ).alias("__t0"),
        )
        .select(
            F.col("__t0.bucket").alias("bucket"),
            (F.col("__r") * F.col("__t0.x")).cast(_Q_TERM).alias("__t"),
        )
    )
    return (
        terms.groupBy("bucket")
        .agg(F.sum("__t").alias("__g"))
        .select("bucket", F.col("__g").cast("double").alias("__gd"))
    )


def logreg_fit(
    train: DataFrame,
    label_col: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    m_buckets: int = 1024,
    lr: float = 10.0,
    rounds: int = 2,
    lr_bias: float | None = None,
    features: DataFrame | None = None,
) -> LogRegModel:
    """Fit the classifier with ``rounds`` full-batch GD rounds from
    zero weights (round 1's p is exactly 0.5 — the analytic shortcut
    the SQL replay uses). ``label_col`` is truthy/1 for the
    reference-like class. Every number the fit produces is
    decimal-quantized per the module discipline, so the returned model
    is the one a SQL oracle's unrolled CTE chain computes.

    ``lr_bias`` (default: same as ``lr``) is the bias's own learning
    rate — standard per-parameter scaling. The feature values are
    length-normalized TF (each ~1/n_features, so a document's mass
    spreads thin across buckets) while the bias input is effectively
    1, so the bias gradient runs ~2-3 orders of magnitude hotter than
    any weight gradient; one shared high ``lr`` makes the bias
    oscillate (diverge) before the weights learn anything. A typical
    productive pairing on this featurization is ``lr`` in the
    hundreds-to-thousands with ``lr_bias ~ 1``.

    Per round: one doc-keyed score join (skipped in round 1), one
    eager doc-sized checkpoint of the residuals, one bucket-keyed
    combinable gradient aggregate collected as <= m_buckets rows, and
    one 1-row bias aggregate — the driver only ever holds the model.

    ``features`` optionally passes a precomputed, ALREADY-MATERIALIZED
    ``hashed_tf(train, ...)`` frame (``logreg_score``'s existing
    contract) so a fit-then-score caller over ONE corpus pays for the
    feature explode — the heaviest map-side stage — exactly once
    instead of once per phase."""
    if rounds < 1:
        raise ValueError(f"rounds must be >= 1, got {rounds}")
    if lr <= 0:
        raise ValueError(f"lr must be positive, got {lr}")
    lr_b = lr if lr_bias is None else lr_bias
    if lr_b <= 0:
        raise ValueError(f"lr_bias must be positive, got {lr_bias}")
    spark = train.sparkSession
    y = train.select(
        F.col(id_col),
        F.col(label_col).cast("boolean").cast("int").cast("double").alias("__y"),
    )
    n_docs = y.count()
    if n_docs == 0:
        raise ValueError("logreg_fit: empty training frame")
    # ONE feature explode for all rounds (and reusable by the caller
    # for scoring when train == corpus): integer counts + exact
    # normalized TF, materialized because every round's gradient and
    # the next round's score join both read it
    x = (
        features.select(id_col, "bucket", "x")
        if features is not None
        else hashed_tf(train, text_col, id_col, m_buckets)
        .select(id_col, "bucket", "x")
        .localCheckpoint(eager=True)
    )
    weights: dict[int, float] = {}
    bias = 0.0
    from pyspark.sql.functions import broadcast

    #: the bias rides the SAME gradient aggregate as the weights under
    #: the reserved bucket -1 (its "feature" is the constant 1, so its
    #: term is the bare residual) — one combinable aggregate and ONE
    #: bounded collect per round instead of separate weight/bias jobs.
    #: Identical arithmetic per parameter (the per-bucket update
    #: expression is unchanged), so oracles and the Python replay are
    #: unaffected.
    _BIAS_KEY = -1
    for _ in range(rounds):
        if not weights:
            # round 1 (zero weights): the score is the bare bias for
            # every doc, so the residual is a constant-per-label
            # expression over y — checkpointed (doc-sized) because the
            # w/b gradient branches both consume it, and an unchecked
            # parquet-lineage residual gets mis-broadcast into the
            # gradient join (measured r15 regression)
            scored = _scores(x, y, id_col, weights, bias, spark, carry=("__y",))
            resid = (
                scored.select(
                    id_col,
                    (_sigmoid_q(F.col("score")) - F.col("__y")).alias("__r"),
                )
                .localCheckpoint(eager=True)
            )
            w_terms = x.join(resid, on=id_col).select(
                "bucket", (F.col("__r") * F.col("x")).cast(_Q_TERM).alias("__t")
            )
            b_terms = resid.select(
                F.lit(_BIAS_KEY).cast("long").alias("bucket"),
                F.col("__r").cast(_Q_TERM).alias("__t"),
            )
            grad = (
                w_terms.unionByName(b_terms)
                .groupBy("bucket")
                .agg(F.sum("__t").alias("__g"))
                .select("bucket", F.col("__g").cast("double").alias("__gd"))
            )
        else:
            # rounds >= 2, FUSED (r16): one job per round instead of a
            # score/residual checkpoint job + a separate gradient job.
            # Each doc's (bucket, x, w*x) list rides through ONE
            # groupBy; the score folds the weighted SUB-SEQUENCE of the
            # bucket-sorted list (identical summation sequence to
            # _fold_dot — same members, same order, same doubles), the
            # residual is computed inline, and the SAME array (plus a
            # bias entry with x = 1.0, so its term __r * 1.0 == __r
            # bit-for-bit) explodes into the gradient terms — x is
            # scanned once, nothing is materialized between, and the
            # per-(doc,bucket) frame never joins back on itself.
            grad = _fused_round_grad(x, y, id_col, weights, bias, spark)
        # fold the old parameters in JVM-side so the update arithmetic
        # — w - lr * (g/n), then the decimal quantization — happens in
        # ONE Spark expression, the exact tree the oracle writes
        pdf = spark.createDataFrame(
            sorted(
                [(int(b), float(w)) for b, w in weights.items()]
                + [(_BIAS_KEY, float(bias))]
            ),
            "bucket long, w double",
        )
        rate = F.when(
            F.col("bucket") == _BIAS_KEY, F.lit(float(lr_b))
        ).otherwise(F.lit(float(lr)))
        upd = grad.join(broadcast(pdf), on="bucket", how="left").select(
            "bucket",
            (
                F.coalesce("w", F.lit(0.0))
                - rate * (F.col("__gd") / F.lit(float(n_docs)))
            )
            .cast(_Q_MODEL)
            .cast("double")
            .alias("w"),
        )
        params = {r["bucket"]: r["w"] for r in upd.collect()}
        bias = params.pop(_BIAS_KEY)
        weights = params
    return LogRegModel(
        weights=weights, bias=float(bias), m_buckets=m_buckets, lr=lr,
        rounds=rounds, lr_bias=lr_b,
    )


def logreg_score(
    df: DataFrame,
    model: LogRegModel,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    features: DataFrame | None = None,
) -> DataFrame:
    """Score every document with the fitted model:
    ``(id_col, n_features, score, prob, keep)`` where ``prob`` is the
    DECIMAL(38,12)-quantized sigmoid and ``keep = prob >= threshold``
    — the comparison runs on the quantized value, so the decision is
    reproducible cross-engine at the same granularity as the reported
    score (text.quality_classifier's contract). Featureless documents
    score the bare bias, never a dropped row. Map-side broadcast dot
    product + one doc-keyed fold — the corpus shuffles once.

    ``features`` optionally passes a precomputed, ALREADY-MATERIALIZED
    ``hashed_tf(df, ...)`` frame so a caller composing several passes
    over the same corpus (influence_scores: residual scoring + the
    attribution fold) pays for the feature explode exactly once."""
    spark = df.sparkSession
    # materialized: the n_features rollup and the score join both read
    # the explode (the fit/DSIR localCheckpoint discipline) — integer
    # counts bounded by min(features, m_buckets) rows per doc
    x = (
        features
        if features is not None
        else hashed_tf(df, text_col, id_col, model.m_buckets).localCheckpoint(
            eager=True
        )
    )
    base = df.select(id_col)
    nf = x.groupBy(id_col).agg(F.first("n_features").alias("__nf"))
    scored = _scores(
        x.select(id_col, "bucket", "x"), base, id_col, model.weights,
        model.bias, spark,
    )
    prob = _sigmoid_q(F.col("score"))
    return (
        scored.join(nf, on=id_col, how="left")
        .select(
            id_col,
            F.coalesce("__nf", F.lit(0)).cast("long").alias("n_features"),
            "score",
            prob.alias("prob"),
            (prob >= F.lit(float(threshold))).alias("keep"),
        )
    )


def influence_scores(
    train: DataFrame,
    dev: DataFrame,
    model: LogRegModel,
    label_col: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Training-data attribution, TracIn single-checkpoint form
    (Pruthi et al. 2020 "Estimating Training Data Influence by Tracing
    Gradient Descent", public method): per training document,

        influence(i) = g_i · mean_j(g_j over the dev set)

    where ``g`` is the logistic-loss gradient at the fitted model —
    for this model ``g = (p - y) * [x; 1]`` (features + bias slot), so
    the dot product factors as ``resid_i * (sum_b x_ib * gd_b + gd_bias)``
    with ``gd`` the dev-mean gradient. POSITIVE influence = this
    document's gradient aligns with the dev set's (training on it
    pushes the model the way the dev set pushes — a proponent);
    NEGATIVE = an opponent (mislabeled or out-of-distribution
    candidates — the data-attribution triage next to the
    confident-learning flags). Returns ``(id_col, influence)``.

    Exactness: residuals come from the DECIMAL(38,12)-quantized
    probabilities; the dev-mean gradient per bucket is a
    DECIMAL(38,18)-exact sum with ONE division by n_dev; each training
    document's ``x * gd`` terms quantize through DECIMAL(38,18) before
    an ORDER-FREE sum (then one residual multiply) — every number
    replays in a SQL oracle as a plain grouped SUM.

    Scale shape: the dev gradient collapses into <= m_buckets + 1
    combinable partials (broadcast back); each corpus is featurized
    EXACTLY ONCE — one localCheckpointed explode per side feeds both
    its residual scoring and its gradient/attribution fold (r13: the
    r12 shape featurized train twice, once inside the residual's
    logreg_score and again for the fold — the ADVICE item) — and the
    training corpus shuffles ONCE on the doc id for the fold.
    Production use holds out the dev set from the fit; the math does
    not require it."""
    from pyspark.sql.functions import broadcast

    def resid(df: DataFrame, feats: DataFrame) -> DataFrame:
        y = df.select(
            F.col(id_col),
            F.col(label_col)
            .cast("boolean")
            .cast("int")
            .cast("double")
            .alias("__y"),
        )
        return (
            logreg_score(
                df, model, text_col=text_col, id_col=id_col, features=feats
            )
            .select(id_col, "prob")
            .join(y, on=id_col)
            .select(id_col, (F.col("prob") - F.col("__y")).alias("__r"))
        )

    n_dev = dev.count()
    if n_dev == 0:
        raise ValueError("influence_scores: empty dev set")
    # ONE materialized explode per corpus, threaded through every pass
    xd_full = hashed_tf(dev, text_col, id_col, model.m_buckets).localCheckpoint(
        eager=True
    )
    xt_full = hashed_tf(
        train, text_col, id_col, model.m_buckets
    ).localCheckpoint(eager=True)
    # dev-side: gradient partials are bucket-bounded; materialize the
    # residuals once (dev-sized) — the per-bucket and bias aggregates
    # both read them
    dev_r = resid(dev, xd_full).localCheckpoint(eager=True)
    xd = xd_full.select(id_col, "bucket", "x")
    gd = (
        xd.join(dev_r, on=id_col)
        .groupBy("bucket")
        .agg(F.sum((F.col("__r") * F.col("x")).cast(_Q_TERM)).alias("__g"))
        .select(
            "bucket",
            (F.col("__g").cast("double") / F.lit(float(n_dev))).alias("g"),
        )
    )
    gdb = dev_r.agg(
        F.sum(F.col("__r").cast(_Q_TERM)).alias("__g")
    ).select(
        (F.col("__g").cast("double") / F.lit(float(n_dev))).alias("gb")
    )
    xt = xt_full.select(id_col, "bucket", "x")
    # per-doc dot product as an ORDER-FREE decimal sum: each x * g term
    # quantizes through DECIMAL(38,18) before summation (the same
    # _Q_TERM discipline as gd above), so the aggregate is combinable
    # (map-side partials, whole-stage codegen) and the SQL oracle is a
    # plain grouped SUM — no per-doc list materialization on either
    # engine (r14: the r13 shape folded a bucket-sorted collect_list
    # sequentially, an interpreted HOF here and an >80 GB list-agg
    # spill in the sf1 oracle replay)
    si = (
        xt.join(broadcast(gd), on="bucket")
        .groupBy(id_col)
        .agg(F.sum((F.col("x") * F.col("g")).cast(_Q_TERM)).alias("__sd"))
        .select(id_col, F.col("__sd").cast("double").alias("__s"))
    )
    return (
        resid(train, xt_full)
        .join(si, on=id_col, how="left")
        .crossJoin(broadcast(gdb))
        .select(
            id_col,
            (
                F.col("__r")
                * (F.coalesce("__s", F.lit(0.0)) + F.col("gb"))
            ).alias("influence"),
        )
    )


def prob_partials(
    scored: DataFrame, n_bins: int = 10, id_col: str = "doc_id"
) -> DataFrame:
    """Mergeable per-bin partials of a scored frame (logreg_score
    output): ``(bin, n_docs, n_keep, sum_prob)`` with ``bin =
    least(floor(prob * n_bins), n_bins - 1)`` (the calibration query's
    binning) and ``sum_prob`` an exact DECIMAL(38,12) sum of the
    already-quantized probabilities. Counts and decimal sums are
    order-free exact, so partials from any split of the corpus
    (micro-batches, shards) fold to the whole-corpus values — the
    sidecar unit of ClassifierScoreStreamPipeline."""
    b = F.least(
        F.floor(F.col("prob") * F.lit(float(n_bins))).cast("int"),
        F.lit(n_bins - 1),
    )
    return scored.groupBy(b.alias("bin")).agg(
        F.count("*").alias("n_docs"),
        F.sum(F.col("keep").cast("long")).alias("n_keep"),
        F.sum(F.col("prob").cast(_Q_MODEL)).alias("sum_prob"),
    )


def histogram_from_partials(partials: DataFrame) -> DataFrame:
    """Fold per-bin partials (any number of batches/shards) into the
    final score histogram: ``(bin, n_docs, n_keep, mean_prob)``. The
    fold is exact (integer counts + decimal sums), so the result over
    N partial sets is IDENTICAL to the single-pass histogram over the
    concatenated corpus — the shared tail of score_histogram and the
    streaming view."""
    return (
        partials.groupBy("bin")
        .agg(
            F.sum("n_docs").alias("n_docs"),
            F.sum("n_keep").alias("n_keep"),
            F.sum("sum_prob").alias("__sp"),
        )
        .select(
            "bin",
            "n_docs",
            "n_keep",
            (F.col("__sp").cast("double") / F.col("n_docs").cast("double"))
            .alias("mean_prob"),
        )
    )


def score_histogram(
    df: DataFrame,
    model: LogRegModel,
    n_bins: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
) -> DataFrame:
    """Score ``df`` with the frozen model and return the probability
    histogram ``(bin, n_docs, n_keep, mean_prob)`` — the drift-ready
    readout of a deployed classifier (score distribution shift is the
    standard production drift signal for a frozen filter). One scoring
    pass + one <= n_bins-partial combinable aggregate."""
    scored = logreg_score(
        df, model, text_col=text_col, id_col=id_col, threshold=threshold
    )
    return histogram_from_partials(prob_partials(scored, n_bins, id_col))
