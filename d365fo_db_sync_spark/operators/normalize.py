"""Deterministic text normalization — the cleaning pass upstream of
every quality/dedup stage (the C4-style pipeline: strip markup, drop
junk lines, canonicalize whitespace; Raffel et al. 2020 §2.2 describe
the published heuristics these expressions implement).

Everything here is a pure codegen column expression — regexp_replace /
split / filter / array_join, no UDFs, no shuffles — so normalization
fuses into the SCAN stage of whatever pipeline consumes it, and the
output strings are byte-exact replayable cross-engine (the suite
oracles them). Regex classes are spelled EXPLICITLY (``[ \\t\\n\\r\\f]``
instead of ``\\s``) because shorthand classes differ between regex
engines (Java's ``\\s`` includes vertical tab, RE2's does not) — the
one dialect trap this module exists to have already stepped around.

Reference scope: the reference engine transfers table rows verbatim
(no text stage); normalization is part of the training-data extension
surface, upstream sibling of operators/text.py's quality features.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "clean_lines",
    "dedup_lines",
    "dedup_paragraphs",
    "drop_common_lines",
    "drop_common_paragraphs",
    "normalize_text",
    "strip_control_chars",
    "strip_html",
    "normalize_whitespace",
]

#: the paragraph delimiter: the literal blank-line separator. Split on
#: the EXACT two-newline string (not \\n{2,}) so splitting and
#: rejoining with the same delimiter is byte-exact for any input —
#: "a\\n\\n\\nb" splits to ["a", "\\nb"] and rejoins to itself, where a
#: greedy \\n{2,} split would collapse the third newline on rebuild.
PARAGRAPH_DELIM = "\n\n"

#: C0 controls minus tab/newline/carriage-return, plus DEL — the bytes
#: that survive no sane text pipeline. \\x0B and \\x0C (vertical tab /
#: form feed) are removed HERE so later whitespace handling never
#: depends on either engine's \\s shorthand covering them.
_CONTROL_CLASS = "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]"


def strip_control_chars(col: Column | str) -> Column:
    """Remove C0 control characters (except tab/newline/CR) and DEL."""
    return F.regexp_replace(F.col(col) if isinstance(col, str) else col,
                            _CONTROL_CLASS, "")


def strip_html(col: Column | str) -> Column:
    """Drop ``<...>`` tags (replaced by one space so adjacent words do
    not fuse) and decode the five ubiquitous entities + ``&nbsp;``.
    Deliberately NOT a parser — the published cleaning pipelines use
    exactly this class of regex pass, and a tag regex is deterministic
    where a lenient parser is not."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.regexp_replace(c, "<[^>]*>", " ")
    for ent, rep in (
        ("&nbsp;", " "),
        ("&amp;", "&"),
        ("&lt;", "<"),
        ("&gt;", ">"),
        ("&quot;", '"'),
        ("&#39;", "'"),
    ):
        c = F.replace(c, F.lit(ent), F.lit(rep))
    return c


def normalize_whitespace(col: Column | str) -> Column:
    """Collapse every run of whitespace (space/tab/newline/CR/FF) to a
    single space and trim — the terminal canonicalization step, after
    which tokenization is layout-independent."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(c, "[ \\t\\n\\r\\f]+", " "))


def clean_lines(
    col: Column | str,
    min_tokens: int = 3,
    require_terminal: bool = True,
) -> Column:
    """C4's line filter: keep only lines with at least ``min_tokens``
    whitespace tokens and (optionally) a terminal-punctuation ending
    (``. ! ? "``) after right-trim — navigation crumbs, cookie
    banners and menu fragments fail both tests. Lines are joined back
    with ``\\n``; a document with no surviving lines becomes the empty
    string. Pure array expressions over the split lines."""
    if min_tokens < 1:
        raise ValueError(f"min_tokens must be >= 1, got {min_tokens}")
    c = F.col(col) if isinstance(col, str) else col
    lines = F.split(c, "\n", -1)

    def keep(line):
        toks = F.size(
            F.filter(F.split(line, "[ \\t]+", -1), lambda x: x != F.lit(""))
        )
        ok = toks >= F.lit(min_tokens)
        if require_terminal:
            ok = ok & F.rtrim(line).rlike('[.!?"]$')
        return ok

    return F.array_join(F.filter(lines, keep), "\n")


def normalize_text(
    col: Column | str,
    min_tokens: int = 3,
    require_terminal: bool = True,
) -> Column:
    """The composed cleaning pass, in the order the stages assume:
    strip markup (tags may span junk), strip control bytes (so line
    logic never sees \\x0B/\\x0C), filter junk lines (needs the \\n
    structure intact), then collapse whitespace (destroys the \\n
    structure, hence last). One codegen expression end to end."""
    c = strip_html(col)
    c = strip_control_chars(c)
    c = clean_lines(c, min_tokens=min_tokens, require_terminal=require_terminal)
    return normalize_whitespace(c)


def dedup_lines(col: Column | str) -> Column:
    """Drop repeated lines WITHIN a document, keeping each line's
    first occurrence in order (``array_distinct`` preserves first-
    occurrence order) — the within-page half of C4's line dedup
    (cookie banners and nav crumbs repeat inside a page long before
    they repeat across pages). Pure codegen."""
    return _dedup_units(col, "\n")


def dedup_paragraphs(col: Column | str) -> Column:
    """Drop repeated PARAGRAPHS (blank-line-separated blocks) within a
    document, keeping first occurrences in order — the within-page
    half at the RefinedWeb/FineWeb paragraph grain (templated intro/
    footer blocks repeat inside a page with per-line noise that line
    dedup misses as a unit). Pure codegen; splits on the literal
    ``\\n\\n`` so the rebuild is byte-exact (:data:`PARAGRAPH_DELIM`)."""
    return _dedup_units(col, PARAGRAPH_DELIM)


def _dedup_units(col: Column | str, delim: str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.array_join(F.array_distinct(F.split(c, delim, -1)), delim)


def drop_common_lines(
    df,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_occurrences: int = 2,
):
    """Corpus-level boilerplate removal — the across-pages half of
    C4's line dedup: any line occurring in MORE than
    ``max_occurrences`` documents (distinct-doc count, so in-page
    repetition doesn't inflate it) is dropped from every document.
    Returns ``(id_col, text_clean, n_lines_kept, n_lines_dropped)``;
    documents whose every line is boilerplate come back as the empty
    string, never a dropped row. Blank lines are never counted as
    boilerplate (they carry layout, not content — and at corpus scale
    the empty line would always trip the threshold and silently glue
    paragraphs).

    Scale shape: lines explode map-side with their positions; the
    line-frequency pass is ONE combinable groupBy over line text
    (distinct-doc counts via the standard two-phase partial distinct);
    the common set anti-joins back WITHOUT a forced broadcast — its
    size is bounded only by total_lines/(max_occurrences+1), so on a
    boilerplate-heavy corpus it can be large, and AQE picks broadcast
    when it measures small (the usual case) while a forced hint would
    OOM the driver on the adversarial one (the frequent_items
    pre-merge lesson). Surviving lines reassemble per document with a
    position-sorted fold (exact original order, deterministic). Two
    doc-keyed shuffles + one line-keyed shuffle at any corpus size."""
    return _drop_common_units(
        df, text_col, id_col, max_occurrences, "\n", "line"
    )


def drop_common_paragraphs(
    df,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_occurrences: int = 2,
):
    """Corpus-level boilerplate removal at PARAGRAPH grain — the
    RefinedWeb/FineWeb recipe's middle granularity between line dedup
    and whole-document dedup: any blank-line-separated block occurring
    in more than ``max_occurrences`` distinct documents is dropped
    from every document (templated disclaimers, bio boxes, promo
    blocks — multi-line units whose individual lines may sit under the
    line threshold). Returns ``(id_col, text_clean, n_paragraphs_kept,
    n_paragraphs_dropped)``. Splits on the literal ``\\n\\n``
    (:data:`PARAGRAPH_DELIM` — byte-exact rebuild for any input);
    empty blocks are never counted as boilerplate, same contract and
    plan shape as :func:`drop_common_lines` with the paragraph as the
    unit: one unit-keyed shuffle, distinct-doc counts, AQE-chosen
    anti-join, position-sorted rebuild."""
    return _drop_common_units(
        df, text_col, id_col, max_occurrences, PARAGRAPH_DELIM, "paragraph"
    )


def _drop_common_units(
    df,
    text_col: str,
    id_col: str,
    max_occurrences: int,
    delim: str,
    unit: str,
):
    """The shared across-documents dedup core — see
    :func:`drop_common_lines` for the plan-shape discussion; ``delim``
    picks the unit grain and ``unit`` names the output counters."""
    if max_occurrences < 1:
        raise ValueError(
            f"max_occurrences must be >= 1, got {max_occurrences}"
        )
    kept_col, dropped_col = f"n_{unit}s_kept", f"n_{unit}s_dropped"
    base = df.select(
        F.col(id_col),
        F.coalesce(F.col(text_col), F.lit("")).alias("__t"),
    )
    units = base.select(
        id_col,
        F.posexplode(F.split(F.col("__t"), delim, -1)).alias("pos", "u"),
    )
    counted = (
        units.filter(F.col("u") != "")
        .groupBy("u")
        .agg(F.countDistinct(id_col).alias("__docs"))
    )
    common = counted.filter(F.col("__docs") > max_occurrences).select("u")
    kept = units.join(common, on="u", how="left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "u"))),
                lambda x: x["u"],
            ),
            delim,
        ).alias("text_clean"),
        F.count("*").alias(kept_col),
    )
    totals = units.groupBy(id_col).agg(F.count("*").alias("__n_units"))
    return (
        totals.join(rebuilt, on=id_col, how="left")
        .select(
            id_col,
            F.coalesce("text_clean", F.lit("")).alias("text_clean"),
            F.coalesce(kept_col, F.lit(0)).alias(kept_col),
            (
                F.col("__n_units") - F.coalesce(kept_col, F.lit(0))
            ).alias(dropped_col),
        )
    )
