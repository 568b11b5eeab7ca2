"""Positional inverted-index phrase search — exact multi-token phrase
matching over a document corpus without a per-document Python pass.

The reference engine's text surface is LIKE/wildcard filtering
(`/root/reference/DBSyncTool/Services/CopyOrchestrator.cs:1844-1863`,
the wildcard table-name match); this module extends that idea to the
LLM-corpus scale problem: find every occurrence of a set of phrases
(benchmark contamination strings, PII trigger phrases, quality
blocklist n-grams) across billions of documents.

Design (all JVM-side, zero UDFs):

1. ONE tokenize pass builds positional postings ``(doc, pos, tok)`` —
   ``posexplode`` over a codegen ``split``/``filter`` expression.
2. The phrase set unrolls into a tiny ``(phrase, off, tok)`` table
   that is BROADCAST — postings are never self-joined, which is what
   kills the naive k-way join at corpus scale (the posting list for a
   stopword is billions of rows; joining it against itself k times is
   quadratic in the hot key).
3. A candidate start position is ``pos - off``; a start is a match
   iff the distinct matched offsets count equals the phrase length —
   one groupBy on ``(doc, phrase, start)``, partial-aggregated
   map-side, carries the whole decision.

Cost: |postings-that-hit-any-phrase-token| rows through one shuffle.
Overlapping matches are counted (each start position is independent),
repeated tokens inside a phrase are handled by the distinct-offset
count, and phrases with tokens absent from the corpus simply produce
no candidates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "phrase_occurrences",
    "phrase_search",
    "redact_spans",
    "tokenize_positions",
]

_TOKEN_SPLIT = "[^a-z0-9]+"


def _token_array(text_col: str):
    """The canonical token array: lowercased alphanumeric split,
    empties dropped, NULL text coalesced to an EMPTY array — so a
    NULL-text document flows through every rebuild/count as a
    zero-token document (n_tokens 0, rebuilt text ''), never as a
    NULL that poisons size()/sum() rollups downstream."""
    return F.coalesce(
        F.filter(
            F.split(F.lower(F.col(text_col)), _TOKEN_SPLIT),
            lambda t: t != F.lit(""),
        ),
        F.array().cast("array<string>"),
    )


def _run_starts(cov):
    """First position of each maximal run in a SORTED DISTINCT int
    array: one linear zip against the 1-right-shifted twin (a run
    starts where the predecessor is not position-1). O(|cov|)."""
    sz = F.size(cov)
    prev = F.concat(
        F.array(F.lit(-2)), F.slice(cov, 1, F.greatest(sz - 1, F.lit(0)))
    )
    return F.filter(
        F.zip_with(cov, prev, lambda c, p: F.when(c - p != 1, c)),
        lambda x: x.isNotNull(),
    )


def _run_ends(cov):
    """Last position of each maximal run — the mirror zip against the
    1-left-shifted twin. Pairs index-for-index with :func:`_run_starts`
    (both filters preserve the sorted order, and every run has exactly
    one start and one end)."""
    sz = F.size(cov)
    nxt = F.concat(
        F.slice(cov, 2, F.greatest(sz - 1, F.lit(0))), F.array(F.lit(-2))
    )
    return F.filter(
        F.zip_with(cov, nxt, lambda c, n_: F.when(n_ - c != 1, c)),
        lambda x: x.isNotNull(),
    )


def _rebuild_outside_runs(toks, rs, re_, placeholder: str | None = None):
    """Surviving-token array: every token inside a covered run
    [rs[i], re_[i]] is dropped, each run optionally replaced by ONE
    ``placeholder``. O(n_tokens + n_runs) per row: the head gap is one
    slice, then one zip over the runs emits (marker + following gap
    slice) each — replacing the r9 per-token ``array_contains(cov, i)``
    scan that was O(n_tokens x |cov|), quadratic exactly on the
    boilerplate-heavy documents this pass exists for. (The obvious
    ``map_from_arrays`` + ``element_at`` membership map is NOT a fix:
    Spark's ``GetMapValue`` is a documented linear scan over the key
    array — ``sql/catalyst .. complexTypeExtractors.scala`` — so it
    has the same complexity with a bigger constant; measured in
    SCALE.md round 10.)

    CAUTION for callers: ``toks``/``rs``/``re_`` MUST be plain column
    references (materialized via select/withColumn), not expression
    trees — ``toks`` is referenced inside the zip lambda, and an
    inlined expression there would re-evaluate per run."""
    n = F.size(toks)
    m = F.size(rs)
    head = F.slice(toks, 1, F.when(m == 0, n).otherwise(F.element_at(rs, 1)))
    # each run's next-run start (n for the last run); length must be
    # exactly m — a stray element against an empty re_ zips to NULL
    # and a NULL element turns flatten() into NULL
    nxt_rs = F.when(m == 0, F.array().cast("array<int>")).otherwise(
        F.concat(F.slice(rs, 2, m - 1), F.array(n))
    )
    mark = (
        F.array(F.lit(placeholder))
        if placeholder is not None
        else F.array().cast("array<string>")
    )
    tail = F.flatten(
        F.zip_with(
            re_,
            nxt_rs,
            lambda e, ns: F.concat(mark, F.slice(toks, e + 2, ns - e - 1)),
        )
    )
    return F.concat(head, tail)


def tokenize_positions(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Positional postings ``(id, pos, tok)`` for a lowercased
    alphanumeric tokenization — 0-based positions, empty tokens (from
    leading/trailing separators) dropped BEFORE positions are
    assigned, so positions index the token sequence, not the raw
    splits."""
    return docs.select(
        F.col(id_col), F.posexplode(_token_array(text_col)).alias("pos", "tok")
    )


def phrase_occurrences(
    docs: DataFrame,
    phrases: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Every exact occurrence of every phrase: one row per match site,
    columns ``phrase, <id_col>, start, plen`` (0-based token position;
    overlapping occurrences all emit). The per-document rollup is
    :func:`phrase_search`; this is the position-level surface KWIC
    extraction and span redaction build on.

    Phrases tokenize with the same rule as the corpus; a phrase that
    tokenizes to nothing raises (it would match everywhere or nowhere
    depending on convention — make the caller decide)."""
    import re

    spark = docs.sparkSession
    rows = []
    for p in phrases:
        # phrases tokenize with the SAME rule as the corpus — a phrase
        # containing punctuation must match the token stream the
        # punctuation-stripping corpus tokenizer actually produces
        toks = [t for t in re.split(_TOKEN_SPLIT, p.lower()) if t]
        if not toks:
            raise ValueError(f"phrase tokenizes to nothing: {p!r}")
        rows.extend((p, off, tok, len(toks)) for off, tok in enumerate(toks))
    ph = spark.createDataFrame(rows, "phrase string, off int, tok string, plen int")

    postings = tokenize_positions(docs, id_col=id_col, text_col=text_col)
    # candidate starts: every posting that hits any phrase token,
    # rebased to the position the phrase would have to start at
    cand = postings.join(F.broadcast(ph), on="tok").select(
        id_col,
        "phrase",
        "plen",
        (F.col("pos") - F.col("off")).alias("start"),
        "off",
    )
    return (
        cand.groupBy(id_col, "phrase", "plen", "start")
        .agg(F.countDistinct("off").alias("n_off"))
        .filter(F.col("n_off") == F.col("plen"))
        .select("phrase", id_col, "start", "plen")
    )


def phrase_search(
    docs: DataFrame,
    phrases: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact phrase occurrences of every phrase in ``phrases`` across
    ``docs``: one row per ``(phrase, doc)`` with a match, columns
    ``phrase, <id_col>, n_matches, first_start`` (0-based token
    position of the earliest occurrence; overlapping occurrences all
    count). The per-site rows are :func:`phrase_occurrences`."""
    occ = phrase_occurrences(docs, phrases, id_col=id_col, text_col=text_col)
    return occ.groupBy("phrase", id_col).agg(
        F.count("*").alias("n_matches"),
        F.min("start").alias("first_start"),
    )


def redact_spans(
    docs: DataFrame,
    phrases: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    placeholder: str = "<BLOCKED>",
) -> DataFrame:
    """Blocklist span redaction — the act half of the detect-triage-act
    pipeline (:func:`phrase_occurrences` detects, the KWIC view
    triages, this redacts): every document comes back with each
    matched phrase span replaced by ONE typed ``placeholder`` token.

    Output: ``<id_col>, n_matches, n_spans, redacted_text`` for EVERY
    input document (clean documents pass through with zero counts).
    Overlapping or adjacent occurrences merge: a token covered by any
    occurrence is redacted, and each MAXIMAL run of covered tokens
    collapses to a single placeholder — so ``n_spans`` (placeholders
    inserted) can be lower than ``n_matches`` (occurrence sites), and
    stitching two halves of a blocked phrase across a redaction hole
    is impossible by construction.

    The rebuild happens on the TOKEN STREAM: ``redacted_text`` is the
    document's tokens (same lowercased alphanumeric rule as the index)
    rejoined with single spaces. Token positions cannot be spliced
    back into the raw bytes (the tokenizer drops punctuation and
    case), and a blocklist consumer wants the normalized form anyway —
    it is what downstream dedup/quality passes tokenize to. Callers
    needing raw-byte splicing want the regex tier
    (operators/text.pii_redact) instead.

    Scale shape, zero UDFs end-to-end: the occurrence pass is
    :func:`phrase_occurrences` (broadcast phrase table, one shuffle
    over hit postings); covered positions roll up per document
    (``sequence`` + ``collect_set`` — bounded by tokens-per-doc, not
    corpus size); both per-doc frames carry ONLY matched documents, a
    tiny fraction of a real corpus, so AQE turns the two left joins
    back onto the corpus into broadcasts; the rebuild itself is
    codegen run-slicing over the once-tokenized array (sorted covered
    set -> maximal-run bounds -> one slice per uncovered gap,
    :func:`_rebuild_outside_runs`) — O(n_tokens + n_runs) per
    document even when most of the document is covered, and no
    per-row Python anywhere."""
    occ = phrase_occurrences(docs, phrases, id_col=id_col, text_col=text_col)
    # ONE per-doc aggregate carries both the covered set and the match
    # count (r15: the two separate rollups each re-ran the whole
    # phrase_occurrences subtree — tokenize + postings join + HAVING —
    # because sibling aggregates share no exchange). Same values:
    # distinct-flatten-sort of the per-occurrence position ranges ==
    # collect_set over their explode.
    per_doc = (
        occ.select(
            id_col,
            F.sequence(
                F.col("start"), F.col("start") + F.col("plen") - 1
            ).alias("__ps"),
        )
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_matches"),
            F.sort_array(
                F.array_distinct(F.flatten(F.collect_list("__ps")))
            ).alias("cov"),
        )
    )

    base = docs.select(F.col(id_col), _token_array(text_col).alias("__toks"))
    j = (
        base.join(per_doc, on=id_col, how="left")
        .select(
            F.col(id_col),
            "__toks",
            "n_matches",
            F.coalesce(F.col("cov"), F.array().cast("array<int>")).alias("__cov"),
        )
        # materialize the run bounds as real columns; only plain
        # attribute references may appear inside the rebuild's zip
        # lambda (an inlined expression there would re-evaluate per
        # run — see _rebuild_outside_runs)
        .withColumn("__rs", _run_starts(F.col("__cov")))
        .withColumn("__re", _run_ends(F.col("__cov")))
    )
    kept = _rebuild_outside_runs(
        F.col("__toks"), F.col("__rs"), F.col("__re"), placeholder=placeholder
    )
    return j.select(
        F.col(id_col),
        F.coalesce(F.col("n_matches"), F.lit(0)).cast("long").alias("n_matches"),
        F.size("__rs").cast("long").alias("n_spans"),
        F.array_join(kept, " ").alias("redacted_text"),
    )
