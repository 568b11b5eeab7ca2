"""Text-analysis suite over the `documents` corpus (driver north-star
extension surface; no reference-tool counterpart).

Every query is pure column expressions from operators/text.py — JVM
codegen end-to-end, no Python UDFs — and each oracle reproduces the
exact semantics with DuckDB list/regex functions. Ratio columns round
to 6 dp in BOTH engines (operands are int/int, so the doubles are
bit-identical before rounding anyway).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from d365fo_db_sync_spark.operators import text
from d365fo_db_sync_spark.sources import load_table
from d365fo_db_sync_spark.suite import register

#: DuckDB expression for the engine's token array (text.tokens):
#: lowercase, split on whitespace runs, drop empty tokens.
_TOKS = "list_filter(regexp_split_to_array(lower(text), '\\s+'), t -> t <> '')"

_STOPWORDS_SQL = "[" + ", ".join(f"'{w}'" for w in text.STOPWORDS) + "]"


@register(
    "text_quality_scores",
    oracle=f"""
    WITH t AS (SELECT doc_id, text, {_TOKS} AS toks FROM documents)
    SELECT doc_id,
           len(toks) AS n_tokens,
           length(text) AS n_chars_actual,
           ROUND((length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')))
                 / GREATEST(length(text), 1), 6) AS punct_ratio,
           ROUND(len(list_intersect(toks, {_STOPWORDS_SQL}))
                 / GREATEST(len(toks), 1), 6) AS stopword_ratio,
           ROUND(length(regexp_replace(text, '\\s+', '', 'g'))
                 / GREATEST(len(toks), 1), 6) AS mean_token_len
    FROM t
    """,
    bench=True,
)
def text_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality features (length / punctuation / stopword
    ratios) — the cheap filters of web-scale corpus cleaning, one
    narrow scan + map-only expressions (no shuffle at any scale)."""
    docs = load_table(spark, sf_dir, "documents")
    feats = text.quality_features(docs, "text")
    return feats.select(
        "doc_id",
        "n_tokens",
        "n_chars_actual",
        F.round("punct_ratio", 6).alias("punct_ratio"),
        F.round("stopword_ratio", 6).alias("stopword_ratio"),
        F.round("mean_token_len", 6).alias("mean_token_len"),
    )


def _lang_scores_sql() -> str:
    parts = [
        f"len(list_intersect(toks, [{', '.join(repr(w) for w in ws)}])) AS s_{lang}"
        for lang, ws in text.LANG_MARKERS.items()
    ]
    return ", ".join(parts)


def _lang_case_sql() -> str:
    langs = list(text.LANG_MARKERS)
    best = "GREATEST(" + ", ".join(f"s_{lang}" for lang in langs) + ")"
    whens = "\n".join(f"WHEN s_{lang} = {best} THEN '{lang}'" for lang in langs)
    return f"CASE WHEN {best} <= 0 THEN 'unknown'\n{whens}\nELSE 'unknown' END"


@register(
    "text_language_id_rollup",
    oracle=f"""
    WITH t AS (SELECT source, {_TOKS} AS toks FROM documents),
    s AS (SELECT source, {_lang_scores_sql()} FROM t)
    SELECT {_lang_case_sql()} AS lang_pred, source, COUNT(*) AS n_docs
    FROM s GROUP BY 1, 2
    """,
)
def text_language_id_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID (dictionary n-gram heuristic, argmax of marker hits)
    rolled up by (predicted language, source). Map-side expression +
    one small shuffle on the rollup keys."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(text.language_id("text").alias("lang_pred"), "source")
        .groupBy("lang_pred", "source")
        .agg(F.count("*").alias("n_docs"))
    )


#: the BPE-ish token pattern embedded VERBATIM in the oracle SQL —
#: built from the same constant the engine compiles, so the two regex
#: texts cannot drift (DuckDB standard string literals do not process
#: backslash escapes, so the bytes reach RE2 unchanged)
_BPE_RE_SQL = text.BPE_TOKEN_RE.replace("'", "''")


@register(
    "text_token_count_rollup",
    oracle=f"""
    WITH t AS (
      SELECT source,
             len({_TOKS}) AS n_ws,
             len(regexp_extract_all(lower(text), '{_BPE_RE_SQL}')) AS n_bpe
      FROM documents)
    SELECT source, COUNT(*) AS n_docs,
           CAST(SUM(n_ws) AS BIGINT) AS total_tokens,
           CAST(SUM(n_bpe) AS BIGINT) AS total_bpe_tokens
    FROM t GROUP BY source
    """,
)
def text_token_count_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus token accounting per source: whitespace tokens and the
    BPE-ish subword proxy (tokens = digit runs | runs clear of digits/
    whitespace/ASCII punctuation). Both engines EXTRACT tokens with the
    byte-identical pattern text.BPE_TOKEN_RE — no replacement-string
    dialects ($1 vs \\1), no lookarounds, no \\p{Punct}/[:punct:]
    aliases — and the oracle CASTs its SUMs to BIGINT so DuckDB's
    default HUGEINT sums can't perturb the value hash."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(text.token_count("text")).alias("total_tokens"),
        F.sum(text.bpe_ish_token_count("text")).alias("total_bpe_tokens"),
    )


@register(
    "text_fingerprint_prefix_clusters",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    f AS (SELECT doc_id, md5(array_to_string(toks[1:32], ' ')) AS fp FROM t)
    SELECT fp, COUNT(*) AS n_docs, MIN(doc_id) AS first_doc
    FROM f GROUP BY fp
    """,
)
def text_fingerprint_prefix_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting over the first 32 normalized tokens (the
    cheap prefix-dup detector); grouped into clusters. One shuffle on
    the 16-byte fingerprint — the exact-dedup shape at scale."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", text.fingerprint("text", prefix_tokens=32).alias("fp"))
        .groupBy("fp")
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("first_doc"))
    )
