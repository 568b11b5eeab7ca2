"""Privacy transforms for dataset release — the PII-safe export step.

The reference engine's privacy surface is credential obfuscation in
config files (`/root/reference/DBSyncTool/Helpers/EncryptionHelper.cs`);
a training-data platform needs the DATA-side equivalents: identifier
pseudonymization before a corpus leaves the trust boundary, and a
re-identification risk audit over the quasi-identifiers that remain.
Both are public, standard constructions (keyed-hash pseudonyms;
Sweeney's k-anonymity) expressed as zero-UDF codegen passes.

Design:

* :func:`pseudonymize` — deterministic keyed pseudonyms
  ``md5(salt || '\\x00' || value)``: the same value maps to the same pseudonym
  EVERYWHERE (joins/groupBys across exported tables keep working —
  referential integrity survives the export), while recovering the
  original requires the salt, which stays inside the boundary. One
  projection, no shuffle, no UDF.
* :func:`k_anonymity_audit` — per quasi-identifier combination group
  size: combinations observed on fewer than ``k`` rows are
  re-identification risks (an attacker who knows those attributes
  pins the individual to under k candidates). One groupBy; policy
  (suppress/generalize/drop) stays with the caller.
* :func:`suppress_below_k` — the suppression policy itself, shaped
  for HIGH-cardinality quasi-identifiers: a window count over the QI
  partition keys, so the whole mitigation is ONE shuffle with no
  audit-frame join. The audit+join composition pays the QI shuffle
  twice and, when groups ≈ rows (the cardinality-explosion case), the
  audit frame is too big to broadcast — the join becomes a second
  full shuffle. The window form cannot.
* :func:`l_diversity_audit` — Machanavajjhala et al.'s refinement:
  a k-anonymous group whose SENSITIVE attribute is constant still
  leaks it; flag groups with fewer than ``l`` distinct sensitive
  values. One groupBy with a distinct aggregate.
* :func:`t_closeness_audit` — Li et al.'s further refinement: a
  group can be l-diverse yet still skew far from the corpus-wide
  sensitive distribution (99% cancer in a group vs 1% globally tells
  an attacker plenty). Flags groups whose total-variation distance
  from the global distribution exceeds ``t``. One corpus shuffle;
  the global distribution is a broadcast.
* :func:`generalize_until_k` — the generalization-ladder escape for
  when suppression would delete too much: coarsen the quasi-
  identifiers level by level (caller-supplied expressions, e.g. day →
  week → month) until the audit passes, falling back to suppression
  at the coarsest level. The ladder walk is a driver-side loop of
  one count() per level — bounded by the ladder length, never by the
  data.

Pseudonymization is NOT anonymization — linkage attacks against the
remaining quasi-identifiers are exactly what the audit measures; ship
the two together.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "generalize_until_k",
    "k_anonymity_audit",
    "l_diversity_audit",
    "pseudonymize",
    "suppress_below_k",
    "t_closeness_audit",
]


def pseudonymize(
    df: DataFrame,
    cols: list[str],
    salt: str,
    length: int = 32,
) -> DataFrame:
    """Replace each named column with a deterministic keyed pseudonym:
    the first ``length`` hex chars of ``md5(salt || '\\x00' || value)``.
    NULL stays NULL (it carries no identity to hide — and mapping it
    would collide every NULL into one fake identity).

    The NUL delimiter makes the (salt, value) encoding injective —
    without it ``('ab', 'c')`` and ``('a', 'bc')`` hash identically
    across configurations. The default keeps the FULL 128-bit digest:
    at LLM-corpus cardinalities (~2^32 distinct identities) a 64-bit
    truncation has birthday-collision odds near 1 — two real users
    silently merged under one pseudonym, breaking the referential-
    integrity property this exists to provide. Truncation stays
    available for humans-will-read-this exports, but any ``length``
    below 32 trades collision resistance for brevity — size it
    against the expected distinct count (≈ 2^(2·length) pairs)."""
    if not cols:
        raise ValueError("cols must name at least one column")
    if not salt:
        raise ValueError("an empty salt defeats the construction")
    if not 1 <= length <= 32:
        raise ValueError(f"length must be in [1, 32], got {length}")
    out = df
    for c in cols:
        out = out.withColumn(
            c,
            F.when(
                F.col(c).isNotNull(),
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit(salt), F.lit("\x00"), F.col(c).cast("string")
                        )
                    ),
                    1,
                    length,
                ),
            ),
        )
    return out


def k_anonymity_audit(
    df: DataFrame,
    quasi_cols: list[str],
    k: int = 5,
) -> DataFrame:
    """Group sizes over the quasi-identifier columns, flagging
    combinations smaller than ``k``: one row per observed combination
    with ``group_size`` and ``at_risk`` (true when ``group_size <
    k``). The release gate is ``filter(at_risk).count() == 0``; which
    mitigation to apply (generalize a column, suppress the rows) is
    policy, so the audit reports rather than mutates."""
    if not quasi_cols:
        raise ValueError("quasi_cols must name at least one column")
    if k < 2:
        raise ValueError(f"k must be >= 2 to mean anything, got {k}")
    return df.groupBy(*quasi_cols).agg(
        F.count("*").alias("group_size"),
        (F.count("*") < F.lit(k)).alias("at_risk"),
    )


def suppress_below_k(
    df: DataFrame,
    quasi_cols: list[str],
    k: int = 5,
) -> DataFrame:
    """Drop every row whose quasi-identifier combination appears on
    fewer than ``k`` rows — the suppression mitigation for the risks
    :func:`k_anonymity_audit` reports, as ONE window-count shuffle.

    Scale shape (the reason this is not audit + join-back): with a
    high-cardinality quasi-identifier set — the groupBy-key-explosion
    case, where the number of distinct combinations approaches the row
    count — the audit frame is row-sized, so joining it back is a
    second full shuffle of the corpus (broadcast is off the table) and
    map-side partial aggregation buys nothing. ``count() OVER
    (PARTITION BY qi)`` moves each row exactly once; the count and the
    filter happen where the row already landed. The output keeps the
    input schema unchanged."""
    if not quasi_cols:
        raise ValueError("quasi_cols must name at least one column")
    if k < 2:
        raise ValueError(f"k must be >= 2 to mean anything, got {k}")
    if "__group_size" in df.columns:
        # withColumn would silently overwrite (then drop) the user's
        # column, corrupting the released frame's schema contract
        raise ValueError(
            "input already carries a '__group_size' column; rename it "
            "before suppression"
        )
    from pyspark.sql import Window

    w = Window.partitionBy(*quasi_cols)
    return (
        df.withColumn("__group_size", F.count(F.lit(1)).over(w))
        .filter(F.col("__group_size") >= k)
        .drop("__group_size")
    )


def l_diversity_audit(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    l: int = 2,
) -> DataFrame:
    """Distinct-sensitive-value counts per quasi-identifier
    combination, flagging groups with fewer than ``l`` distinct values
    of ``sensitive_col`` (Machanavajjhala et al. 2007: a k-anonymous
    group whose disease column reads 'cancer' k times still discloses
    it — homogeneity k-anonymity cannot see). NULL sensitive values
    carry no disclosure and do not count toward diversity. One
    groupBy; the distinct aggregate expands to Spark's standard
    two-phase plan (partial distinct map-side, final count after the
    one QI shuffle)."""
    if not quasi_cols:
        raise ValueError("quasi_cols must name at least one column")
    if sensitive_col in quasi_cols:
        raise ValueError(
            f"sensitive column {sensitive_col!r} cannot be a quasi-identifier"
        )
    if l < 2:
        raise ValueError(f"l must be >= 2 to mean anything, got {l}")
    return df.groupBy(*quasi_cols).agg(
        F.count("*").alias("group_size"),
        F.countDistinct(sensitive_col).alias("distinct_sensitive"),
        (F.countDistinct(sensitive_col) < F.lit(l)).alias("at_risk"),
    )


def t_closeness_audit(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    t: float = 0.2,
) -> DataFrame:
    """Total-variation distance between each quasi-identifier group's
    sensitive-value distribution and the corpus-wide one, flagging
    groups above ``t`` (Li, Li & Venkatasubramanian 2007). l-diversity
    counts values; t-closeness weighs them — a group that is 99%
    'cancer' against a 1% global rate passes l=2 yet discloses the
    diagnosis with near certainty.

    Exactness across engines: the distance is assembled as an INTEGER
    numerator first — for group g with size ``n_g``, corpus size
    ``n``, group value counts ``c_gv`` and global counts ``c_v``,

        num_g = sum_v_in_g |c_gv*n - c_v*n_g|  +  n_g*n  -  sum_v_in_g c_v*n_g

    (values absent from the group contribute their full global mass;
    the closed form folds them in without materializing the missing
    (group, value) pairs), then ``tvd = num_g / (2*n_g*n)`` — ONE
    correctly-rounded double division, so Spark and a SQL oracle agree
    bit-for-bit regardless of summation order. NULL sensitive values
    are excluded from both distributions.

    Scale shape: the CORPUS shuffles exactly once (into the
    (QI, value) counts); every later exchange moves group-sized
    frames — the value counts re-partition by QI for the window, and
    the final rollup REUSES that partitioning (no fourth exchange;
    plan-pinned in tests). The global value distribution is
    sensitive-cardinality-sized (small by the construction of a
    sensitive attribute) and broadcasts, and the corpus total rides a
    broadcast 1-row frame."""
    if not quasi_cols:
        raise ValueError("quasi_cols must name at least one column")
    if sensitive_col in quasi_cols:
        raise ValueError(
            f"sensitive column {sensitive_col!r} cannot be a quasi-identifier"
        )
    if not 0 < t < 1:
        raise ValueError(f"t must be in (0, 1), got {t}")
    from pyspark.sql.functions import broadcast

    base = df.filter(F.col(sensitive_col).isNotNull())
    pair = base.groupBy(*quasi_cols, sensitive_col).agg(F.count("*").alias("c_gv"))
    glob = base.groupBy(sensitive_col).agg(F.count("*").alias("c_v"))
    total = base.agg(F.count("*").alias("n"))
    joined = pair.join(broadcast(glob), on=sensitive_col).crossJoin(broadcast(total))
    # n_g rides a window over the SAME keys the final rollup groups on,
    # so the window's exchange is the rollup's exchange — no extra
    # shuffle and no group-sizes frame to join back (which could not
    # broadcast in the high-cardinality-QI case)
    from pyspark.sql import Window

    enriched = joined.withColumn(
        "n_g", F.sum("c_gv").over(Window.partitionBy(*quasi_cols))
    )
    num = enriched.groupBy(*quasi_cols).agg(
        F.first("n_g").alias("group_size"),
        F.first("n").alias("n"),
        (
            F.sum(F.abs(F.col("c_gv") * F.col("n") - F.col("c_v") * F.col("n_g")))
            + F.first(F.col("n_g") * F.col("n"))
            - F.sum(F.col("c_v") * F.col("n_g"))
        ).alias("num"),
    )
    tvd = F.col("num") / (F.lit(2.0) * F.col("group_size") * F.col("n"))
    return num.select(
        *quasi_cols,
        "group_size",
        tvd.alias("tvd"),
        (tvd > F.lit(float(t))).alias("at_risk"),
    )


def generalize_until_k(
    df: DataFrame,
    quasi_cols: list[str],
    ladder: list[dict],
    k: int = 5,
):
    """Walk a generalization ladder until the corpus is k-anonymous,
    suppressing at the coarsest level if it never is.

    ``ladder`` is an ordered list of levels, finest first; each level
    maps a quasi-identifier column name to the coarsened expression to
    substitute (e.g. level 1 truncates dates to the week, level 2 to
    the month). Level 0 — the identity, no substitution — is implied
    and tried first. The first level whose :func:`k_anonymity_audit`
    reports zero at-risk groups wins; if even the last level leaks,
    :func:`suppress_below_k` runs on it (the escape hatch — coarsening
    has a floor, suppression always terminates).

    Returns ``(released_df, level, suppressed)`` where ``level`` is the
    winning ladder index (0 = no generalization) and ``suppressed``
    says the escape fired. Cost: one count() job per level tried —
    driver-side, bounded by ``len(ladder)``, each a single-shuffle
    aggregate with map-side partials."""
    if k < 2:
        raise ValueError(f"k must be >= 2 to mean anything, got {k}")
    levels: list[dict] = [{}] + list(ladder)
    for extra in levels[1:]:
        unknown = set(extra) - set(quasi_cols)
        if unknown:
            raise ValueError(f"ladder generalizes non-QI columns: {sorted(unknown)}")
    for level, mapping in enumerate(levels):
        cand = df
        for col, expr in mapping.items():
            cand = cand.withColumn(col, expr)
        risk = (
            k_anonymity_audit(cand, quasi_cols, k=k)
            .filter(F.col("at_risk"))
            .limit(1)
            .count()
        )
        if risk == 0:
            return cand, level, False
    return suppress_below_k(cand, quasi_cols, k=k), len(levels) - 1, True
