"""Text-analysis operators for large-scale training-data pipelines.

Everything here is built-in column expressions (JVM codegen, no Python
UDFs): at 100 TB the tokenizer must run inside whole-stage codegen, not
in a Python worker. Derived from the PySpark public API; these have no
reference-tool counterpart (BASELINE.json north-star extension).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: tiny per-language stopword marker sets for the n-gram/stopword
#: language-ID heuristic (classic dictionary method)
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "and", "of", "to", "is"),
    "es": ("el", "la", "los", "de", "que", "es"),
    "fr": ("le", "la", "les", "des", "et", "est"),
    "de": ("der", "die", "das", "und", "ist", "ein"),
}

STOPWORDS = tuple(sorted({w for ws in LANG_MARKERS.values() for w in ws}))


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization with empty-token filtering — stays in
    codegen (split + filter higher-order function)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.lower(c), r"\s+"), lambda t: t != "")


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


#: Explicit ASCII punctuation class (0x21-0x2F, 0x3A-0x40, 0x5B-0x60,
#: 0x7B-0x7E spelled out as ranges) + whitespace. Deliberately avoids
#: ``\p{Punct}`` / ``[:punct:]`` aliases and lookarounds so the Java and
#: RE2 (DuckDB oracle) dialects are guaranteed to agree byte-for-byte.
BPE_SPLIT_CLASS = r"[\s!-/:-@\[-`{-~]+"

#: A BPE-ish token is either a maximal digit run OR a maximal run of
#: characters that are not digits, whitespace, or ASCII punctuation.
#: The two alternatives match disjoint character sets, so
#: leftmost-first (Java) and leftmost-longest (RE2) semantics produce
#: identical token streams — ONE pattern text shared verbatim by the
#: engine and the DuckDB oracle, with no replacement-string dialect
#: ($1 vs \1) anywhere.
BPE_TOKEN_RE = r"[0-9]+|[^0-9\s!-/:-@\[-`{-~]+"


def bpe_ish_token_count(col: Column | str) -> Column:
    """A BPE-like proxy: count tokens split on whitespace AND
    punctuation/digit boundaries — approximates subword token counts
    without a tokenizer model (regex stays JVM-side).

    Implemented as direct token *extraction* with the single shared
    pattern :data:`BPE_TOKEN_RE` (no staged replacements), so the
    DuckDB oracle can run the byte-identical pattern via
    ``len(regexp_extract_all(...))``."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(F.lower(c), F.lit(BPE_TOKEN_RE), F.lit(0)))


def bpe_ish_token_count_staged(col: Column | str) -> Column:
    """The original staged construction of :func:`bpe_ish_token_count`:
    materialize digit/letter boundaries as inserted spaces in two
    ``regexp_replace`` passes, then split on :data:`BPE_SPLIT_CLASS`.

    Kept (and pinned equivalent by ``tests/test_text_quality.py``) as
    the semantic anchor for the extraction rewrite — it needs
    engine-specific replacement syntax (``$1`` vs ``\\1``), which made
    it unsuitable for a cross-engine oracle."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.regexp_replace(F.lower(c), r"([0-9])([^0-9])", r"$1 $2")
    c = F.regexp_replace(c, r"([^0-9])([0-9])", r"$1 $2")
    return F.size(F.filter(F.split(c, BPE_SPLIT_CLASS), lambda t: t != ""))


def punct_count(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.length(c) - F.length(F.regexp_replace(c, r"[^\w\s]", ""))


def stopword_count(col: Column | str) -> Column:
    return F.size(F.array_intersect(tokens(col), F.lit(list(STOPWORDS)).cast("array<string>")))


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / stopword features for quality scoring —
    the standard cheap filters of web-scale corpus cleaning."""
    t = tokens(text_col)
    n_tok = F.size(t)
    return df.withColumns(
        {
            "n_tokens": n_tok,
            "n_chars_actual": F.length(text_col),
            "punct_ratio": punct_count(text_col) / F.greatest(F.length(text_col), F.lit(1)),
            "stopword_ratio": stopword_count(text_col) / F.greatest(n_tok, F.lit(1)),
            "mean_token_len": (
                F.length(F.regexp_replace(F.col(text_col), r"\s+", ""))
                / F.greatest(n_tok, F.lit(1))
            ),
        }
    )


#: Fixed weights for the linear quality classifier — a stand-in for an
#: offline-trained fastText/logreg quality model (the ENGINE surface is
#: the distributed scoring pass; training happens offline on labels the
#: pipeline doesn't own). Values are exact in binary-friendly decimals
#: and sized so both classes occur on natural-language text.
QUALITY_CLASSIFIER_WEIGHTS: dict[str, float] = {
    "bias": -1.0,
    "stopword_ratio": 6.0,
    "punct_ratio": -8.0,
    "mean_token_len": 0.125,
    "n_tokens": 0.004,
}


def quality_classifier(df: DataFrame, text_col: str = "text") -> DataFrame:
    """FIXED-weight heuristic quality gate — the zero-training
    screen; the TRAINED sibling (hashed-n-gram logistic regression
    fitted on labeled data, SQL-replayable GD) is
    ``operators.classifier.logreg_fit``/``logreg_score``. Model-based quality filtering (the CCNet/GPT-3-style learned
    gate, linearized): score every document with a fixed-weight logistic
    model over the :func:`quality_features` columns and keep documents
    scoring above 0. Adds ``quality_logit`` (rounded to 6 decimals) and
    ``keep``.

    ``keep`` is derived from the ROUNDED logit so the decision is
    reproducible cross-engine at the same granularity as the reported
    score (an unrounded comparison could flip on the last ulp of a
    float sum). The whole pass is map-only column arithmetic inside
    whole-stage codegen — terms are summed left-to-right in the
    declaration order of :data:`QUALITY_CLASSIFIER_WEIGHTS`, which an
    SQL oracle mirrors literally."""
    w = QUALITY_CLASSIFIER_WEIGHTS
    feats = quality_features(df, text_col)
    logit = (
        F.lit(w["bias"])
        + F.col("stopword_ratio") * F.lit(w["stopword_ratio"])
        + F.col("punct_ratio") * F.lit(w["punct_ratio"])
        + F.col("mean_token_len") * F.lit(w["mean_token_len"])
        + F.col("n_tokens") * F.lit(w["n_tokens"])
    )
    rounded = F.round(logit, 6)
    return feats.withColumns(
        {"quality_logit": rounded, "keep": rounded > F.lit(0.0)}
    )


def language_id(col: Column | str, default: str = "unknown") -> Column:
    """Dictionary language-ID: argmax of per-language marker-token hits.

    Pure column expression (array_intersect per language + CASE chain),
    so it distributes with the scan. Ties resolve in LANG_MARKERS order —
    deterministic. This is the zero-training screen; the TRAINED
    sibling (hashed char-n-gram Naive Bayes fitted on a labeled slice,
    covering any language the labels cover) is
    ``operators.langid.nb_fit``/``nb_predict``."""
    toks = tokens(col)
    scores = {
        lang: F.size(F.array_intersect(toks, F.lit(list(ws)).cast("array<string>")))
        for lang, ws in LANG_MARKERS.items()
    }
    best = F.greatest(*scores.values())
    expr = F.when(best <= 0, F.lit(default))
    for lang in LANG_MARKERS:  # first max wins, in declaration order
        expr = expr.when(scores[lang] == best, F.lit(lang))
    return expr.otherwise(F.lit(default))


def fingerprint(col: Column | str, prefix_tokens: int | None = None) -> Column:
    """Deterministic document fingerprint: md5 over the normalized token
    stream (optionally just the first N tokens — a cheap rolling-hash
    analog for prefix dedup). md5 keeps oracle parity with DuckDB."""
    t = tokens(col)
    if prefix_tokens is not None:
        t = F.slice(t, 1, prefix_tokens)
    return F.md5(F.array_join(t, " ").cast("binary"))


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_tokens: int = 512,
    overlap: int = 0,
) -> DataFrame:
    """Split documents into fixed-size token windows with optional
    overlap — the standard pre-training/RAG chunking step, entirely in
    codegen (no Python): tokenize once, build the chunk-start sequence,
    slice per start, posexplode to one row per chunk.

    Output: (id, chunk_idx, chunk_text, n_chunk_tokens). The final
    partial window is kept (a document shorter than ``chunk_tokens``
    yields itself as chunk 0); ``overlap`` tokens are shared between
    consecutive chunks (stride = chunk_tokens - overlap). The explode
    happens executor-side, so output cardinality scales with total
    token count, never through the driver."""
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("require 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    t = tokens(text_col)
    n = F.size(t)
    # chunk starts: 0, stride, 2*stride, ... with the FINAL chunk
    # clamped to end exactly at the last token (start = n - chunk),
    # so no content is dropped and no chunk is a subset of another
    last_start = F.greatest(n - F.lit(chunk_tokens), F.lit(0))
    n_chunks = F.floor(last_start / stride) + F.when(
        last_start % stride > 0, F.lit(2)
    ).otherwise(F.lit(1))
    starts = F.sequence(F.lit(0).cast("long"), (n_chunks - 1).cast("long"))
    chunk_arrays = F.transform(
        starts,
        lambda i: F.slice(
            t, (F.least(i * stride, last_start.cast("long")) + 1).cast("int"), chunk_tokens
        ),
    )
    return df.select(
        F.col(id_col),
        F.posexplode(chunk_arrays).alias("chunk_idx", "__toks"),
    ).select(
        id_col,
        "chunk_idx",
        F.array_join("__toks", " ").alias("chunk_text"),
        F.size("__toks").alias("n_chunk_tokens"),
    )


#: PII patterns kept lookaround-free so the SAME pattern runs under
#: Java regex (Spark) and RE2 (DuckDB) — RE2 has no backreferences or
#: lookarounds, and oracle parity requires one pattern text
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\(\d{3}\) ?\d{3}-\d{4}|\b\d{3}-\d{3}-\d{4}\b"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


def pii_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document PII hit counts (emails / phone numbers / IPv4) —
    the redaction-or-drop gate of corpus cleaning. Pure regexp_count
    column expressions: distributes with the scan, zero shuffles."""
    c = F.col(text_col)
    return df.withColumns(
        {
            "n_emails": F.regexp_count(c, F.lit(EMAIL_RE)),
            "n_phones": F.regexp_count(c, F.lit(PHONE_RE)),
            "n_ipv4": F.regexp_count(c, F.lit(IPV4_RE)),
        }
    )


#: (placeholder, pattern) in application order: emails first (an email
#: local part can contain phone-shaped digit runs a later pass would
#: misread), then phones, then IPs. Placeholders contain no ``$`` or
#: backslash, so the replacement string needs no dialect translation —
#: Java regex (Spark) and RE2 (DuckDB) consume it byte-for-byte.
PII_REDACTIONS: tuple[tuple[str, str], ...] = (
    ("<EMAIL>", EMAIL_RE),
    ("<PHONE>", PHONE_RE),
    ("<IP>", IPV4_RE),
)


def pii_redact(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Typed-placeholder PII redaction — the redact half of the
    redact-or-drop gate (:func:`pii_counts` is the detect half).
    Adds ``n_redacted`` (total spans replaced) and ``redacted_text``.

    Replacements apply sequentially in :data:`PII_REDACTIONS` order and
    ``n_redacted`` counts matches at each STAGE (emails on the original
    text, phones on the email-redacted text, ...), so it is exactly the
    number of placeholders inserted — counting every pattern on the
    original would double-count a phone-shaped run inside an email's
    local part. Pure regexp_replace/regexp_count column expressions:
    distributes with the scan, zero shuffles at any corpus size."""
    staged = F.col(text_col)
    n = F.lit(0)
    for tag, pat in PII_REDACTIONS:
        n = n + F.regexp_count(staged, F.lit(pat))
        staged = F.regexp_replace(staged, pat, tag)
    return df.withColumns(
        {"n_redacted": n.cast("long"), "redacted_text": staged}
    )


def repetition_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Within-document repetition ratios (the Gopher-style quality
    rules): duplicate-token fraction and duplicate-bigram fraction.
    Highly repetitive documents (boilerplate, keyword stuffing, decode
    loops) score high and get filtered before training. All array
    expressions — no shuffle, no Python."""
    t = tokens(text_col)
    n = F.size(t)
    bigrams = F.zip_with(
        F.slice(t, 1, F.greatest(n - 1, F.lit(0))),
        F.slice(t, 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    return df.withColumns(
        {
            "dup_token_frac": (
                (n - F.size(F.array_distinct(t))) / F.greatest(n, F.lit(1))
            ),
            "dup_bigram_frac": (
                (F.size(bigrams) - F.size(F.array_distinct(bigrams)))
                / F.greatest(F.size(bigrams), F.lit(1))
            ),
        }
    )


def compression_ratio(
    df: DataFrame, text_col: str = "text", level: int = 6, out_col: str = "zlib_ratio"
) -> DataFrame:
    """Entropy-proxy quality signal: deflate(text)/len(text) per document.

    Highly repetitive or templated text (boilerplate, navigation spam,
    generation loops) compresses far below natural prose, so a low
    ratio is the classic cheap filter the n-gram repetition fractions
    miss (long-range repeats beyond the bigram window). No compression
    codec exists as a Spark SQL expression, so this is the Arrow tier:
    ``mapInPandas`` with one zlib pass per document inside each batch —
    one Python round-trip per Arrow batch, never per row, and the
    output is deterministic for a fixed zlib level.

    Empty documents get ratio 0.0 (nothing to compress, nothing to
    flag).
    """
    import zlib

    from pyspark.sql.types import DoubleType, StructField, StructType

    # copy, don't .add() on df.schema: that mutates the DataFrame's
    # CACHED schema object in place and corrupts later resolution
    schema = StructType(
        list(df.schema.fields) + [StructField(out_col, DoubleType())]
    )

    def batches(it):
        for pdf in it:
            raw = [t.encode("utf-8") if t is not None else b"" for t in pdf[text_col]]
            pdf[out_col] = [
                len(zlib.compress(b, level)) / len(b) if b else 0.0 for b in raw
            ]
            yield pdf

    return df.mapInPandas(batches, schema)


def unigram_vocab(df: DataFrame, text_col: str = "text", top_v: int | None = None):
    """Corpus unigram counts: (token, cnt) DataFrame plus the total
    token count — the training pass of the unigram LM quality scorer.
    One explode + one groupBy shuffle; ``top_v`` keeps the most frequent
    V tokens (ties break lexicographically for determinism). At corpus
    scale this is a maintained sidecar, like the BM25/IVF stats."""
    toks = df.select(F.explode(tokens(text_col)).alias("tok"))
    counts = toks.groupBy("tok").agg(F.count("*").alias("cnt"))
    if top_v is not None:
        counts = counts.orderBy(F.desc("cnt"), F.asc("tok")).limit(top_v)
    return counts


def unigram_logprob(
    col: Column | str,
    vocab: dict[str, int],
    total: int,
    floor_logprob: float = -20.0,
) -> Column:
    """Mean per-token unigram log-probability under a fixed vocabulary —
    the classic cheap LM-quality proxy (gibberish and boilerplate score
    low; KenLM-style scoring without a model artifact). OOV tokens take
    ``floor_logprob``.

    The vocab rides into the plan as a map literal and the fold is a
    sequential left-to-right HOF `aggregate` — deterministic float
    order, reproducible by an oracle that folds the same list the same
    way. At real scale the literal map becomes a broadcast-join against
    the vocab sidecar (same scores, one extra broadcast)."""
    t = tokens(col)
    if not vocab:
        raise ValueError("unigram_logprob needs a non-empty vocab")
    import math

    entries = []
    for tok in sorted(vocab):
        entries.append(F.lit(tok))
        entries.append(F.lit(math.log(vocab[tok] / total)))
    m = F.create_map(*entries)
    total_lp = F.aggregate(
        t,
        F.lit(0.0),
        lambda acc, x: acc + F.coalesce(m[x], F.lit(float(floor_logprob))),
    )
    return total_lp / F.greatest(F.size(t), F.lit(1))


def oov_rate(col: Column | str, vocab: dict[str, int] | list[str]) -> Column:
    """Fraction of tokens outside a fixed vocabulary — integer-exact
    (count/count), so the oracle agrees bit-for-bit with no float-fold
    caveats. High OOV = encoding damage, gibberish, or domain shift.

    Membership is ``isin`` over the vocabulary literals: above the
    optimizer's inSetConversionThreshold (default 10) Catalyst
    compiles that to ``InSet`` — a hash-set probe, O(1) per token —
    where an array/map literal scan is O(V) per token (GetMapValue is
    a linear scan, the text_search lesson)."""
    t = tokens(col)
    words = sorted(vocab)
    in_vocab = (
        F.size(F.filter(t, lambda x: x.isin(*words))) if words else F.lit(0)
    )
    return (F.size(t) - in_vocab).cast("double") / F.greatest(F.size(t), F.lit(1))


def heavy_hitters_exact(
    df: DataFrame, text_col: str = "text", k: int = 60
) -> DataFrame:
    """EXACT phi-heavy hitters — every token whose global count strictly
    exceeds N/k (N = total tokens) — in two scans that never shuffle
    the full token multiset.

    Pass 1 (candidates): each partition counts its own token slice
    locally (vectorized ``value_counts`` inside ``mapInPandas``) and
    emits only tokens whose LOCAL count ``c_p`` satisfies
    ``c_p * k > n_p`` (n_p = the partition's token total) — at most
    k-1 rows per partition, plus one NULL-token sentinel row carrying
    n_p. Pigeonhole guarantee: if a token's global count exceeds N/k
    then in >= 1 partition its local count exceeds that partition's
    n_p/k (the local shares cannot ALL sit at or below their quota
    when the global total is above it), so the union of emissions is
    a SUPERSET of the true heavy hitters. This is the mergeable
    local-candidates shape of Misra-Gries-style summaries, with exact
    local counts instead of a decrementing sketch: memory is bounded
    by per-partition distinct tokens (fine for ~128 MB text splits; for
    adversarial partitions the constant-memory Misra-Gries summarizer
    in ``operators/sketches.py frequent_items`` is the drop-in).

    Pass 2 (exact verify): candidates stay a DataFrame and are
    BROADCAST into a left-semi join that drops every non-candidate
    token map-side BEFORE the groupBy — partial aggregation then
    collapses each partition to <= |candidates| rows, so the only
    shuffle in the whole operator carries candidate partials, never
    the token stream. N rides along as an in-plan 1-row broadcast
    (no driver collect), and the final ``cnt * k > N`` filter makes
    the result EXACT — which is why this operator, unlike a sketch,
    oracles against plain GROUP BY SQL.

    Returns ``(token, cnt, n_total)`` for each heavy hitter.
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    # cached: the summary (<= k rows + 1 sentinel per partition) feeds
    # both the candidate set and the token total — without it the
    # pass-1 scan would run once per consumer
    summ = candidate_summary(df, text_col, k).cache()
    cands = summ.filter(F.col("token").isNotNull()).select("token").distinct()
    total = summ.filter(F.col("token").isNull()).agg(
        F.sum("cnt").alias("n_total")
    )
    return verify_candidates(df, cands, text_col, k, total=total)


def candidate_summary(df: DataFrame, text_col: str, k: int) -> DataFrame:
    """Pass 1 of :func:`heavy_hitters_exact`, exposed for mergeable use
    (the streaming pipeline appends one of these per micro-batch):
    per-partition over-quota candidates plus one NULL-token sentinel
    row carrying the slice's token total. ``slice_id`` labels each
    partition summary so a merger can join emissions back to their
    slice's quota (the bound math needs to know which slices did NOT
    emit a token). Output: ``(slice_id, token, cnt)``, <= k rows + 1
    sentinel per non-empty partition."""
    import uuid

    import pandas as pd

    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")

    def partition_summary(batches):
        counts: dict[str, int] = {}
        n_p = 0
        for pdf in batches:
            if len(pdf) == 0:
                continue
            flat = pdf["toks"].explode().dropna()
            n_p += len(flat)
            for tok, c in flat.value_counts().items():
                counts[tok] = counts.get(tok, 0) + int(c)
        if n_p == 0:
            return
        cand = {t: c for t, c in counts.items() if c * k > n_p}
        sid = uuid.uuid4().hex
        yield pd.DataFrame(
            {
                "slice_id": sid,
                "token": [None] + list(cand.keys()),
                "cnt": [n_p] + list(cand.values()),
            }
        )

    return df.select(tokens(text_col).alias("toks")).mapInPandas(
        partition_summary, "slice_id string, token string, cnt long"
    )


def verify_candidates(
    df: DataFrame,
    cands: DataFrame,
    text_col: str,
    k: int,
    total: DataFrame | None = None,
) -> DataFrame:
    """Pass 2 of :func:`heavy_hitters_exact`, exposed for mergeable
    use: given ANY candidate SUPERSET frame (a single ``token``
    column), count only candidate tokens over ``df`` — broadcast
    left-semi drop before the groupBy, so the only shuffle carries
    candidate partials — and keep those with ``cnt * k > N``. Exact
    whenever ``cands`` really is a superset of the true heavy hitters
    (the pigeonhole guarantee of :func:`candidate_summary`, which
    also holds for a UNION of summaries over disjoint slices of the
    corpus — the streaming case). ``total`` is an optional 1-row
    ``n_total`` frame (e.g. the summed sentinels, already known);
    without it the token total is counted from ``df`` in one scalar
    aggregate."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    if total is None:
        total = df.agg(
            F.sum(token_count(text_col)).cast("long").alias("n_total")
        )
    toks = df.select(F.explode(tokens(text_col)).alias("token"))
    counts = (
        toks.join(F.broadcast(cands.select("token").distinct()), "token", "left_semi")
        .groupBy("token")
        .agg(F.count("*").alias("cnt"))
    )
    return (
        counts.crossJoin(F.broadcast(total))
        .filter(F.col("cnt") * k > F.col("n_total"))
        .select("token", "cnt", "n_total")
    )


UNK = "<unk>"


def vocab_mapped_tokens(col: Column | str, vocab: "list[str]", unk: str = UNK) -> Column:
    """Token stream with everything outside ``vocab`` collapsed to the
    ``unk`` symbol — the closed-vocabulary preprocessing every n-gram
    LM shares. Pure codegen: ``isin`` over the vocabulary literals
    compiles to an InSet hash probe (O(1) per token) above the
    optimizer's conversion threshold, vs O(V) for an array or map
    literal scan."""
    words = sorted(vocab)
    if not words:
        return F.transform(tokens(col), lambda x: F.lit(unk))
    return F.transform(
        tokens(col),
        lambda x: F.when(x.isin(*words), x).otherwise(F.lit(unk)),
    )


def bigram_pairs(mapped: Column) -> Column:
    """Adjacent-pair strings ("w1 w2") from a mapped token array —
    tokens cannot contain whitespace (the tokenizer split on it), so
    the space join is collision-free. zip_with against the tail pads
    the final element with NULL, which the filter drops; empty and
    single-token docs yield an empty list."""
    shifted = F.slice(mapped, 2, F.greatest(F.size(mapped), F.lit(1)))
    pairs = F.zip_with(
        mapped,
        shifted,
        lambda x, y: F.when(y.isNull(), F.lit(None)).otherwise(
            F.concat_ws(" ", x, y)
        ),
    )
    return F.filter(pairs, lambda p: p.isNotNull())


def bigram_vocab(
    df: DataFrame, text_col: str, vocab: "list[str]", unk: str = UNK
) -> DataFrame:
    """Bigram counts over the vocab-mapped token stream: one explode +
    groupBy (map-side partial counts). With a closed top-V vocabulary
    the result is <= (V+1)^2 rows — a sidecar, not a corpus-scale
    table."""
    mapped = vocab_mapped_tokens(text_col, vocab, unk)
    return (
        df.select(F.explode(bigram_pairs(mapped)).alias("b"))
        .groupBy("b")
        .agg(F.count("*").alias("cnt"))
    )


def bigram_logprob(
    col: Column | str,
    bigram_lp: "dict[str, float]",
    fallback_lp: "dict[str, float]",
    vocab: "list[str]",
    unk: str = UNK,
) -> Column:
    """Mean per-bigram log-probability under an add-one-smoothed
    bigram LM: ``P(w2|w1) = (c(w1 w2) + 1) / (c(w1) + V + 1)``, with
    unseen-pair fallback ``ln(1 / (c(w1) + V + 1))`` carried per w1 in
    ``fallback_lp``, and a final ``ln(1 / (V + 1))`` tier (c(w1) = 0)
    for a w1 the training stream never produced — e.g. held-out text
    containing OOV when training had none, so ``fallback_lp`` lacks
    the unk key. ``bigram_lp`` maps "w1 w2" -> ln P. Both maps ship as
    two-array literals (``map_from_arrays`` keeps the plan small at
    ~V^2 entries); at real scale they become a broadcast join against
    the bigram sidecar, same scores. The fold is the sequential
    left-to-right HOF ``aggregate`` — deterministic float order, the
    same order an oracle's list fold applies. Empty/single-token
    documents score 0.0 over a denominator clamped to 1."""
    if not fallback_lp:
        raise ValueError("fallback_lp must cover the vocab (plus unk)")
    mapped = vocab_mapped_tokens(col, vocab, unk)
    bigs = bigram_pairs(mapped)
    bkeys = sorted(bigram_lp)
    bm = (
        F.map_from_arrays(
            F.lit(bkeys).cast("array<string>"),
            F.lit([float(bigram_lp[k]) for k in bkeys]).cast("array<double>"),
        )
        if bigram_lp
        else F.map_from_arrays(
            F.lit([]).cast("array<string>"), F.lit([]).cast("array<double>")
        )
    )
    fkeys = sorted(fallback_lp)
    fm = F.map_from_arrays(
        F.lit(fkeys).cast("array<string>"),
        F.lit([float(fallback_lp[k]) for k in fkeys]).cast("array<double>"),
    )
    import math

    unseen_w1_lp = -math.log(len(set(vocab)) + 1)
    total_lp = F.aggregate(
        bigs,
        F.lit(0.0),
        lambda acc, b: acc
        + F.coalesce(bm[b], fm[F.split(b, " ")[0]], F.lit(unseen_w1_lp)),
    )
    return total_lp / F.greatest(F.size(bigs), F.lit(1))


def winsorized_group_stats(
    df: DataFrame,
    group_col: str,
    score_col: str,
    lo_q: float = 0.05,
    hi_q: float = 0.95,
    tiebreak_cols: "tuple[str, ...]" = (),
) -> DataFrame:
    """Group-wise winsorization report — the outlier-robust
    normalization step before thresholding a quality score whose tails
    are garbage (boilerplate scoring absurdly high, binary-damage docs
    absurdly low): per group, the DISCRETE lo/hi quantile bounds
    (value at rank ceil(q*n) in ascending score order — integer-rank
    exact, where interpolated percentiles can differ between engines
    in the last ulp), clip counts on each side, and the mean of the
    clipped score.

    Returns one row per group: ``(group, n_docs, p_lo, p_hi,
    clipped_lo, clipped_hi, avg_winsorized)``.

    Plan shape: ONE window sort per group computes rank and group
    size together; the two bound rows per group collapse via a
    conditional aggregate into a |groups|-row frame that BROADCASTS
    back onto the scores; clip counts are integer-exact and the mean
    is an ORDER-FREE rollup: each clipped score rounds to 6 dp and
    routes through DECIMAL(18,6) so the group sum is exact under any
    partitioning, and the mean is the raw IEEE quotient of that exact
    sum (r15: a double AVG sums in task-scheduling order, so its last
    ulps — and occasionally a 6-dp round — flipped between runs; the
    sf1 battery caught the sibling pattern in the LM rollups). No
    driver materialization, two shuffles total (the sort, the final
    group agg)."""
    if not 0.0 < lo_q < hi_q <= 1.0:
        raise ValueError(f"need 0 < lo_q < hi_q <= 1, got ({lo_q}, {hi_q})")
    s = F.col(score_col)
    w = Window.partitionBy(group_col).orderBy(score_col, *tiebreak_cols)
    wn = Window.partitionBy(group_col)
    ranked = df.select(group_col, score_col, *tiebreak_cols).withColumns(
        {"__rn": F.row_number().over(w), "__n": F.count("*").over(wn)}
    )
    r_lo = F.greatest(F.ceil(F.lit(lo_q) * F.col("__n")), F.lit(1))
    r_hi = F.ceil(F.lit(hi_q) * F.col("__n"))
    bounds = ranked.groupBy(group_col).agg(
        F.max(F.when(F.col("__rn") == r_lo, s)).alias("p_lo"),
        F.max(F.when(F.col("__rn") == r_hi, s)).alias("p_hi"),
    )
    joined = df.select(group_col, score_col).join(
        F.broadcast(bounds), on=group_col
    )
    clipped = F.least(F.greatest(s, F.col("p_lo")), F.col("p_hi"))
    return joined.groupBy(group_col, "p_lo", "p_hi").agg(
        F.count("*").alias("n_docs"),
        F.sum((s < F.col("p_lo")).cast("long")).alias("clipped_lo"),
        F.sum((s > F.col("p_hi")).cast("long")).alias("clipped_hi"),
        (
            F.sum(F.round(clipped, 6).cast("decimal(18,6)")).cast("double")
            / F.count("*")
        ).alias("avg_winsorized"),
    ).select(
        group_col, "n_docs", "p_lo", "p_hi",
        "clipped_lo", "clipped_hi", "avg_winsorized",
    )
