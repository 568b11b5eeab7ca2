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

Pseudonymization is NOT anonymization — linkage attacks against the
remaining quasi-identifiers are exactly what the audit measures; ship
the two together.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["k_anonymity_audit", "pseudonymize"]


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
