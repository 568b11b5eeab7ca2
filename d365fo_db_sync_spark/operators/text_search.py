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


def tokenize_positions(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Positional postings ``(id, pos, tok)`` for a lowercased
    alphanumeric tokenization — 0-based positions, empty tokens (from
    leading/trailing separators) dropped BEFORE positions are
    assigned, so positions index the token sequence, not the raw
    splits."""
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), _TOKEN_SPLIT), lambda t: t != F.lit("")
    )
    return docs.select(
        F.col(id_col), F.posexplode(toks).alias("pos", "tok")
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
    back onto the corpus into broadcasts; the rebuild itself is a
    codegen ``transform``/``filter``/``array_join`` over the
    once-tokenized array — no per-row Python anywhere."""
    occ = phrase_occurrences(docs, phrases, id_col=id_col, text_col=text_col)
    covered = (
        occ.select(
            id_col,
            F.explode(
                F.sequence(F.col("start"), F.col("start") + F.col("plen") - 1)
            ).alias("p"),
        )
        .groupBy(id_col)
        .agg(F.sort_array(F.collect_set("p")).alias("cov"))
    )
    counts = occ.groupBy(id_col).agg(F.count("*").alias("n_matches"))

    toks = F.filter(
        F.split(F.lower(F.col(text_col)), _TOKEN_SPLIT), lambda t: t != F.lit("")
    )
    base = docs.select(F.col(id_col), toks.alias("__toks"))
    j = base.join(covered, on=id_col, how="left").join(
        counts, on=id_col, how="left"
    )
    cov = F.coalesce(F.col("cov"), F.array().cast("array<int>"))
    kept = F.filter(
        F.transform(
            F.col("__toks"),
            lambda t, i: F.when(~F.array_contains(cov, i), t).when(
                ~F.array_contains(cov, i - 1), F.lit(placeholder)
            ),
        ),
        lambda x: x.isNotNull(),
    )
    n_spans = F.size(F.filter(cov, lambda p: ~F.array_contains(cov, p - 1)))
    return j.select(
        F.col(id_col),
        F.coalesce(F.col("n_matches"), F.lit(0)).cast("long").alias("n_matches"),
        n_spans.cast("long").alias("n_spans"),
        F.array_join(kept, " ").alias("redacted_text"),
    )
