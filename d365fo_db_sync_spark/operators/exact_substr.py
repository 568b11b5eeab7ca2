"""Exact-substring (token-window) deduplication — the corpus-curation
operation document-level dedup cannot express: find every run of >= k
tokens that repeats ACROSS documents and excise it, leaving the
documents' unique content intact. Two near-identical documents are one
near-dup PAIR to MinHash; a boilerplate header pasted into a million
otherwise-unique pages is invisible at document granularity and is
exactly what this pass removes (the published result: models trained
on substring-deduped corpora memorize less and score better).

The reference engine deduplicates at row granularity (delta classify,
`/root/reference/DBSyncTool/Services/CopyOrchestrator.cs` key-compare
cycle); this module is the sub-row analogue a training-data platform
needs.

Design (all JVM-side, zero UDFs):

1. ONE tokenize pass per document; every k-token window emits
   ``(doc, start, window)`` via a codegen ``transform`` over a start
   index sequence + ``slice``/``array_join`` — no posexplode self-join.
2. Window stats are one groupBy: a window with ``n_docs >= min_docs``
   is boilerplate. The suffix-array construction the single-machine
   reference implementations use (Lee et al.) does not distribute;
   fixed-k window fingerprinting is the standard shuffle-friendly
   equivalent: any repeated run of length >= k contains a repeated
   k-window at every offset, so token coverage of the two definitions
   is IDENTICAL for runs >= k (a run of length L > k is covered by its
   L - k + 1 constituent windows).
3. The excision rebuild reuses the span discipline of
   :func:`~d365fo_db_sync_spark.operators.text_search.redact_spans`:
   covered positions roll up per document, maximal runs merge, and the
   document rebuilds from the once-tokenized array — dropped, not
   placeholder-replaced (ExactSubstr semantics: boilerplate carries no
   signal worth marking).

Scale shape: keying the shuffle by window TEXT costs k x token-count
bytes — exact but heavy; ``hashed=True`` keys by ``xxhash64`` of the
window (8 bytes/window, the production path at 100 TB) with identical
downstream plumbing, trading a ~2^-64-per-pair collision chance (a
false merge excises a unique window) for the k-fold shuffle
reduction. The duplicate-window set is small relative to the corpus
(boilerplate is repetitive by definition), so the join back onto the
window stream broadcasts under AQE; the covered-set and count frames
carry only affected documents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from d365fo_db_sync_spark.operators.text_search import (
    _rebuild_outside_runs,
    _run_ends,
    _run_starts,
    _token_array,
)

__all__ = [
    "duplicate_token_stats",
    "excise_repeated_windows",
    "repeated_windows",
    "token_windows",
]

# NULL-text documents tokenize to the EMPTY array (n_tokens 0,
# clean_text '') rather than a NULL that would skew sum(n_tokens) /
# dup_frac in duplicate_token_stats
_tokens = _token_array


def token_windows(
    docs: DataFrame,
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    hashed: bool = False,
) -> DataFrame:
    """Every k-token window of every document: ``(<id_col>, start, w)``
    with 0-based token starts. ``w`` is the space-joined window text,
    or its ``xxhash64`` fingerprint (LongType) when ``hashed`` — same
    rows either way, 8 bytes instead of ~k words per key. Documents
    shorter than k tokens emit nothing."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    # materialize the token array ONCE as a real column: every shifted
    # slice reads it, and an inlined tokenize expression would re-split
    # the document per slice
    base = docs.select(F.col(id_col), _tokens(text_col).alias("__a"))
    return _windows_from_tokens(base, k, id_col, hashed)


def _windows_from_tokens(
    base: DataFrame, k: int, id_col: str, hashed: bool = False
) -> DataFrame:
    """:func:`token_windows` body over a pre-tokenized ``(<id_col>,
    __a array<string>)`` frame — the split point that lets
    :func:`excise_repeated_windows` tokenize the corpus exactly once
    for its three consumers (r16)."""
    sz = F.size("__a")
    # Sliding windows as the zip of the token array with its own k-1
    # shifted suffixes (dedup.exploded_shingles' r15 build): slice +
    # arrays_zip + posexplode + concat_ws are all whole-stage codegen,
    # where the previous transform(sequence(...), array_join(slice))
    # evaluated an interpreted lambda per window. Only the zipped
    # window structs reach the explode — k tokens per row, never n
    # copies of the n-token source array (that shape is O(n^2) bytes
    # per document and was measured at ~140 s for three 20k-token
    # documents — SCALE.md round 10). The start <= n-k filter drops
    # the ragged tail windows (and short docs entirely, matching the
    # contract).
    shifted = base.select(
        F.col(id_col),
        sz.alias("__n"),
        *[F.slice("__a", i + 1, sz).alias(f"__s{i}") for i in range(k)],
    )
    zipped = shifted.select(
        F.col(id_col),
        "__n",
        F.posexplode(F.arrays_zip(*[f"__s{i}" for i in range(k)])).alias(
            "start", "__w"
        ),
    )
    w = F.concat_ws(" ", *[F.col("__w").getField(f"__s{i}") for i in range(k)])
    return zipped.filter(F.col("start") <= F.col("__n") - k).select(
        F.col(id_col),
        "start",
        (F.xxhash64(w) if hashed else w).alias("w"),
    )


def repeated_windows(
    docs: DataFrame,
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_docs: int = 2,
    hashed: bool = False,
) -> DataFrame:
    """The boilerplate inventory: every k-token window appearing in at
    least ``min_docs`` DISTINCT documents, with ``n_docs`` and total
    occurrence count ``n_occ`` (within-doc repeats of a cross-doc
    window all count). One groupBy on the window key; map-side partials
    carry both aggregates."""
    if min_docs < 2:
        raise ValueError(
            f"min_docs must be >= 2 (cross-document repetition), got {min_docs}"
        )
    wins = token_windows(docs, k, id_col=id_col, text_col=text_col, hashed=hashed)
    return (
        wins.groupBy("w")
        .agg(
            F.countDistinct(id_col).alias("n_docs"),
            F.count("*").alias("n_occ"),
        )
        .filter(F.col("n_docs") >= min_docs)
    )


def excise_repeated_windows(
    docs: DataFrame,
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_docs: int = 2,
    hashed: bool = False,
) -> DataFrame:
    """ExactSubstr excision: rebuild every document's token stream with
    each token that sits inside ANY cross-document repeated k-window
    REMOVED. Output per input document: ``<id_col>, n_tokens`` (before
    excision), ``n_dup_tokens`` (removed), ``n_spans`` (maximal removed
    runs), ``clean_text`` (surviving tokens, single-space joined —
    clean documents pass through token-normalized with zero counts).

    A repeated run of length L >= k is covered end-to-end by its
    L - k + 1 repeated windows, so maximal-run merging reconstructs the
    full boilerplate span — no half-excised fragments. The rebuild is
    the same codegen run-slicing discipline as ``redact_spans``
    (O(n_tokens + n_runs) per document); spans drop rather than leave
    a placeholder.

    One-tokenize shape (r16): the previous body built the
    ``token_windows`` subtree TWICE (once for the window stream, once
    inside ``repeated_windows`` for the boilerplate inventory) and
    tokenized the corpus a THIRD time for the rebuild — three full
    scans + tokenizes of the source, since sibling consumers share no
    exchange. Now the tokenized frame is materialized once and feeds
    all three; the inventory is the same aggregate derived from the
    same window stream, so the output is multiset-identical. The
    checkpoint is corpus-token-scale (not the narrow-frame norm —
    SCALE.md's reliable-checkpoint/staging substitution applies at
    cluster scale), the price of removing two of three corpus
    passes."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    if min_docs < 2:
        raise ValueError(
            f"min_docs must be >= 2 (cross-document repetition), got {min_docs}"
        )
    toks = docs.select(F.col(id_col), _tokens(text_col).alias("__a")).localCheckpoint(
        eager=True
    )
    wins = _windows_from_tokens(toks, k, id_col, hashed)
    dup = (
        wins.groupBy("w")
        .agg(F.countDistinct(id_col).alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
        .select("w")
    )
    hits = wins.join(dup, on="w")
    covered = (
        hits.select(
            id_col,
            F.explode(
                F.sequence(F.col("start"), F.col("start") + F.lit(k - 1))
            ).alias("p"),
        )
        .groupBy(id_col)
        .agg(F.sort_array(F.collect_set("p")).alias("cov"))
    )
    base = toks.select(F.col(id_col), F.col("__a").alias("__toks"))
    j = (
        base.join(covered, on=id_col, how="left")
        .select(
            F.col(id_col),
            "__toks",
            F.coalesce(F.col("cov"), F.array().cast("array<int>")).alias("__cov"),
        )
        # run bounds as real columns — only attribute references may
        # sit inside the rebuild's zip lambda (see _rebuild_outside_runs)
        .withColumn("__rs", _run_starts(F.col("__cov")))
        .withColumn("__re", _run_ends(F.col("__cov")))
    )
    kept = _rebuild_outside_runs(F.col("__toks"), F.col("__rs"), F.col("__re"))
    return j.select(
        F.col(id_col),
        F.size("__toks").cast("long").alias("n_tokens"),
        F.size("__cov").cast("long").alias("n_dup_tokens"),
        F.size("__rs").cast("long").alias("n_spans"),
        F.array_join(kept, " ").alias("clean_text"),
    )


def duplicate_token_stats(
    docs: DataFrame,
    k: int,
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    min_docs: int = 2,
    hashed: bool = False,
) -> DataFrame:
    """Corpus-quality dashboard number: per ``group_col``, how much of
    the token mass is cross-document boilerplate. One row per group
    with ``n_docs_total``, ``n_docs_affected``, ``n_tokens``,
    ``n_dup_tokens``, and ``dup_frac`` (6-dp DECIMAL ratio surfaced as
    DOUBLE — order-independent, oracle-safe). The number that decides
    whether a source is worth keeping before any model sees it."""
    exc = excise_repeated_windows(
        docs, k, id_col=id_col, text_col=text_col, min_docs=min_docs, hashed=hashed
    )
    g = docs.select(F.col(id_col), F.col(group_col))
    return (
        exc.join(g, on=id_col)
        .groupBy(group_col)
        .agg(
            F.count("*").alias("n_docs_total"),
            F.count(F.when(F.col("n_dup_tokens") > 0, 1)).alias("n_docs_affected"),
            F.sum("n_tokens").alias("n_tokens"),
            F.sum("n_dup_tokens").alias("n_dup_tokens"),
            (
                F.sum("n_dup_tokens").cast("decimal(38,6)")
                / F.greatest(F.sum("n_tokens"), F.lit(1)).cast("decimal(38,6)")
            )
            .cast("decimal(18,6)")
            .cast("double")
            .alias("dup_frac"),
        )
    )
