"""Corpus relevance ranking: TF-IDF / BM25 over the `documents` table.

A training-data pipeline needs keyword relevance for targeted corpus
slicing (pull the docs about X for a domain mixture, rank candidates
for inspection, build weak labels). Classic BM25 (Robertson/Sparck
Jones probabilistic relevance framework — public literature) maps onto
Spark as TWO corpus passes and ZERO wide shuffles:

1. **stats pass** — one scalar aggregate row: corpus size ``N``, total
   document length (for ``avgdl``), and per-query-term document
   frequencies ``df(t)``. Per-term tf columns are pure map-side
   expressions (``size(filter(tokens, t = term))``), so the DF counts
   ride the same partial-aggregate reduction as ``count(*)`` — the
   shuffle ships ONE row per partition.
2. **score pass** — the 1-row stats frame is broadcast (crossJoin) and
   every document scores map-side:
   ``score = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1-b+b·dl/avgdl))``
   with ``idf(t) = ln(1 + (N-df+0.5)/(df+0.5))``.

At 100 TB the stats pass amortizes: corpus-level ``N``/``avgdl``/``df``
live in a maintained sidecar (the same discipline as the IVF centroid
sidecar in operators/similarity.py), so steady-state queries are the
map-side score pass plus a TakeOrderedAndProject top-k — no shuffle at
all. Everything is JVM codegen; no Python in the hot path.

``avgdl`` is exposed as exact-integer ``SUM(dl)`` divided once in
double precision, so an ANSI-SQL oracle reproduces the score
bit-for-bit (modulo a final 6 dp display round, which both engines
apply to the same double).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from d365fo_db_sync_spark.operators import text


def _tf(term: str) -> Column:
    # token-equality count, not substring: size(filter(toks, x = term));
    # single-arg lambda — a second parameter would make PySpark bind the
    # (element, index) filter variant
    return F.size(F.filter(F.col("toks"), lambda t: t == F.lit(term)))


def bm25_score(
    docs: DataFrame,
    terms: Sequence[str],
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Score every document against a bag of query terms with BM25.

    Returns (id_col, dl, bm25) for documents matching at least one
    term. ``bm25`` is the raw double — callers round for display. The
    plan is: map-side tf columns -> one scalar-row aggregate ->
    broadcast stats -> map-side score; the corpus is never shuffled.
    """
    if not terms:
        raise ValueError("bm25_score needs at least one query term")
    base = (
        docs.select(F.col(id_col), text.tokens(text_col).alias("toks"))
        .withColumn("dl", F.size("toks"))
        .withColumns({f"tf_{i}": _tf(t) for i, t in enumerate(terms)})
        .drop("toks")
        # narrow per-doc decision frame (id, dl, tf_*), materialized:
        # TWO consumers read it (the stats aggregate and the score
        # side), and on the score side the `matched` predicate is
        # otherwise pushed below the projection with its aliases
        # substituted — the regex tokenize then runs ~5x per row (4x
        # in the pushed filter + once in the projection) plus once
        # more for the stats scan. One tokenize pass total instead.
        .localCheckpoint(eager=True)
    )
    stats = base.agg(
        F.count("*").alias("n_docs"),
        F.sum("dl").alias("sum_dl"),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("long")).alias(f"df_{i}")
            for i in range(len(terms))
        ],
    )
    # 1-row stats frame broadcast over the corpus: the scale-correct
    # shape (the alternative — collecting to the driver — would make
    # the builder eager and put a Python float in the score path)
    joined = base.join(F.broadcast(stats), F.lit(True))
    # exact-integer sum / count, ONE double division — oracle-reproducible
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs").cast("double")
    norm = 1.0 - b + b * (F.col("dl").cast("double") / avgdl)
    score = F.lit(0.0)
    matched = F.lit(False)
    for i in range(len(terms)):
        tf = F.col(f"tf_{i}").cast("double")
        idf = F.log(
            1.0
            + (F.col("n_docs").cast("double") - F.col(f"df_{i}") + 0.5)
            / (F.col(f"df_{i}") + 0.5)
        )
        score = score + idf * (tf * (k1 + 1.0)) / (tf + k1 * norm)
        matched = matched | (F.col(f"tf_{i}") > 0)
    return joined.filter(matched).select(
        F.col(id_col), F.col("dl"), score.alias("bm25")
    )


def bm25_topk(
    docs: DataFrame,
    terms: Sequence[str],
    k: int = 20,
    **kwargs,
) -> DataFrame:
    """Top-k BM25 documents — orderBy+limit compiles to
    TakeOrderedAndProject (per-partition heap + single merge), never a
    global sort. Ties break on the id column for determinism."""
    id_col = kwargs.get("id_col", "doc_id")
    scored = bm25_score(docs, terms, **kwargs)
    return scored.orderBy(F.desc("bm25"), F.asc(id_col)).limit(k)


def tfidf_vectors(
    docs: DataFrame,
    vocab: Sequence[str],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Dense TF-IDF vectors over a FIXED vocabulary (the corpus-slicing
    / weak-labeling shape: vocab is curated and small, documents are the
    100 TB side). Returns (id_col, tfidf array<double>) with
    ``tf·ln(1 + N/df)`` weights; same two-pass zero-wide-shuffle plan
    as :func:`bm25_score`."""
    if not vocab:
        raise ValueError("tfidf_vectors needs a non-empty vocabulary")
    base = (
        docs.select(F.col(id_col), text.tokens(text_col).alias("toks"))
        .withColumns({f"tf_{i}": _tf(t) for i, t in enumerate(vocab)})
        .drop("toks")
    )
    stats = base.agg(
        F.count("*").alias("n_docs"),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("long")).alias(f"df_{i}")
            for i in range(len(vocab))
        ],
    )
    joined = base.join(F.broadcast(stats), F.lit(True))
    weights = [
        F.col(f"tf_{i}").cast("double")
        * F.log(
            1.0 + F.col("n_docs").cast("double") / F.greatest(F.col(f"df_{i}"), F.lit(1))
        )
        for i in range(len(vocab))
    ]
    return joined.select(F.col(id_col), F.array(*weights).alias("tfidf"))


def tfidf_keywords(
    docs: DataFrame,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    out_prec: int = 6,
) -> DataFrame:
    """Per-document top-``k`` keywords by corpus TF-IDF — the
    open-vocabulary complement to :func:`tfidf_vectors` (which needs a
    curated vocab): every document surfaces the terms that most
    distinguish it from the corpus, the standard cheap doc-labeling /
    inspection signal in a curation pipeline.

    Returns ``(id_col, rnk, token, tf, df, tfidf)`` with
    ``tfidf = round(tf · ln((N+1)/(df+1)), out_prec)`` (the smoothed
    idf keeps corpus-saturating tokens at ~0 instead of negative).
    Ranking orders by the ROUNDED score then token text, so ties and
    sub-round float noise break identically in any engine.

    Scale shape — three key-partitioned exchanges, no joins, no UDFs,
    no driver materialization:
    1. explode -> partial-aggregated ``(doc, token) -> tf`` groupBy
       (map-side combine absorbs within-doc repetition);
    2. ``df(token)`` as a count window over the token partition of
       that already-distinct frame (df == row count per token, no
       countDistinct needed);
    3. per-doc top-k via row_number over the doc partition.
    ``N`` rides in as a broadcast 1-row aggregate, the bm25 stats-pass
    discipline."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    tf = (
        docs.select(F.col(id_col), F.explode(text.tokens(text_col)).alias("token"))
        .groupBy(id_col, "token")
        .agg(F.count("*").alias("tf"))
    )
    n_docs = docs.agg(F.count("*").alias("n_docs"))
    w_tok = Window.partitionBy("token")
    scored = (
        tf.withColumn("df", F.count("*").over(w_tok))
        .join(F.broadcast(n_docs), F.lit(True))
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf").cast("double")
                * F.log(
                    (F.col("n_docs").cast("double") + F.lit(1.0))
                    / (F.col("df").cast("double") + F.lit(1.0))
                ),
                out_prec,
            ),
        )
    )
    w_doc = Window.partitionBy(id_col).orderBy(
        F.col("tfidf").desc(), F.col("token").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w_doc))
        .filter(F.col("rnk") <= k)
        .select(id_col, "rnk", "token", "tf", "df", "tfidf")
    )


def npmi_collocations(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
) -> DataFrame:
    """Collocation mining over adjacent token bigrams: per surviving
    bigram ``(a, b)`` the count and the NORMALIZED pointwise mutual
    information ``npmi = pmi / -ln(p(a,b))`` with
    ``pmi = ln(p(a,b) / (p(a) p(b)))`` — the [-1, 1]-scaled
    association score (Bouma 2009) whose high end is the multiword
    expressions a tokenizer/phrase table wants and whose low end is
    the "glued boilerplate" seam detector. Both unigram AND bigram
    probabilities are normalized by the TOKEN total N (the
    gensim-style convention): every bigram occurrence contains an
    occurrence of each member, so ``p(a,b) <= min(p(a), p(b))`` and
    the npmi <= 1 bound actually holds — normalizing bigrams by the
    pair total T instead silently breaks it (p(a,b) can then exceed
    p(a), and 'perfect' pairs score above 1).

    Exactness: probabilities are correctly-rounded integer-count
    divisions composed into ONE ln argument (and one more for the
    normalizer), so an oracle replaying the same expression tree gets
    the same doubles to well past the value hash's 9-decimal
    normalization.

    Scale shape: bigrams explode map-side (two slices zipped — the
    token array is never duplicated through the explode, the
    exact_substr lesson), collapse in ONE combinable groupBy, and the
    ``min_count`` prefix filter runs BEFORE the unigram joins so only
    surviving bigrams (vocabulary-sized, not corpus-sized) join the
    unigram counts — keyed joins AQE broadcasts when the vocabulary
    allows. Totals ride broadcast 1-row frames."""
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")
    from pyspark.sql.functions import broadcast

    base = df.select(text.tokens(text_col).alias("toks"))
    n1 = F.greatest(F.size("toks") - F.lit(1), F.lit(0))
    pairs = base.select(
        F.explode(
            F.zip_with(
                F.slice("toks", F.lit(1), n1),
                F.slice("toks", F.lit(2), n1),
                lambda a, b: F.struct(a.alias("a"), b.alias("b")),
            )
        ).alias("bg")
    ).select("bg.a", "bg.b")
    big = pairs.groupBy("a", "b").agg(F.count("*").alias("n_ab"))
    uni = (
        base.select(F.explode("toks").alias("t"))
        .groupBy("t")
        .agg(F.count("*").alias("n_t"))
    )
    tot_u = uni.agg(F.sum("n_t").alias("__n"))
    survivors = big.filter(F.col("n_ab") >= min_count)
    joined = (
        survivors.join(uni.select(F.col("t").alias("a"), F.col("n_t").alias("n_a")), on="a")
        .join(uni.select(F.col("t").alias("b"), F.col("n_t").alias("n_b")), on="b")
        .crossJoin(broadcast(tot_u))
    )
    p_ab = F.col("n_ab") / F.col("__n")
    p_a = F.col("n_a") / F.col("__n")
    p_b = F.col("n_b") / F.col("__n")
    pmi = F.log(p_ab / (p_a * p_b))
    # p(a,b) < 1 always (a corpus with any bigram has N >= 2 tokens),
    # so the normalizer -ln(p_ab) never divides by zero
    npmi = pmi / -F.log(p_ab)
    return joined.select(
        "a",
        "b",
        F.col("n_ab").alias("count"),
        pmi.alias("pmi"),
        npmi.alias("npmi"),
    )


def apply_collocations(
    df: DataFrame,
    phrases: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "_",
) -> DataFrame:
    """Apply a learned phrase table to the corpus — the gensim-Phrases
    rewrite step downstream of :func:`npmi_collocations`: every
    adjacent token pair present in ``phrases`` (columns ``a``, ``b``)
    merges into one ``a<sep>b`` token, GREEDILY left-to-right (a token
    consumed by a merge cannot start the next one — "new york york
    times" with both pairs learned yields "new_york york_times", not
    three overlapping merges).

    Distributed greedy without a sequential pass: greedy-kept merges
    over a maximal run of CONSECUTIVE matched pair positions are
    exactly the odd-ranked ones (1st, 3rd, ...), so matched positions
    shrink to kept merges with two window functions (gaps-and-islands
    grouping, then in-run rank parity) — no per-document Python, no
    iteration. The phrase probe is one broadcast hash join
    (vocabulary-sized phrase table, O(1) per pair — not a per-token
    membership scan), and the rebuild is the run-slicing discipline of
    ``text_search._rebuild_outside_runs``: head slice + one zip over
    the merge array emitting (merged token + following plain slice),
    O(n_tokens + n_merges) per document in codegen.

    Output per document: ``id_col``, ``n_merges``, ``n_tokens_out``,
    ``text_phrased`` (single-space joined). NULL text behaves as the
    empty document."""
    from pyspark.sql import Window
    from pyspark.sql.functions import broadcast

    for need in ("a", "b"):
        if need not in phrases.columns:
            raise ValueError(f"phrases must carry columns 'a' and 'b', missing {need!r}")
    base = df.select(F.col(id_col), text.tokens(text_col).alias("__toks")).select(
        F.col(id_col),
        F.coalesce("__toks", F.array().cast("array<string>")).alias("__toks"),
    )
    n1 = F.greatest(F.size("__toks") - F.lit(1), F.lit(0))
    pairs = base.select(
        F.col(id_col),
        F.posexplode(
            F.zip_with(
                F.slice("__toks", F.lit(1), n1),
                F.slice("__toks", F.lit(2), n1),
                lambda a, b: F.struct(a.alias("a"), b.alias("b")),
            )
        ).alias("pos", "pr"),
    ).select(F.col(id_col), "pos", "pr.a", "pr.b")
    matched = pairs.join(
        broadcast(phrases.select("a", "b").distinct()), on=["a", "b"], how="left_semi"
    ).select(F.col(id_col), "pos")
    w_doc = Window.partitionBy(id_col).orderBy("pos")
    grouped = matched.withColumn(
        "__grp", F.col("pos") - F.row_number().over(w_doc)
    )
    w_run = Window.partitionBy(id_col, "__grp").orderBy("pos")
    kept = grouped.withColumn("__rr", F.row_number().over(w_run)).filter(
        F.col("__rr") % 2 == 1
    )
    merges = kept.groupBy(id_col).agg(
        F.sort_array(F.collect_list("pos")).alias("__m")
    )
    j = (
        base.join(merges, on=id_col, how="left")
        .select(
            F.col(id_col),
            "__toks",
            F.coalesce("__m", F.array().cast("array<int>")).alias("__m"),
        )
    )
    toks, m = F.col("__toks"), F.col("__m")
    n = F.size(toks)
    nm = F.size(m)
    head = F.slice(toks, 1, F.when(nm == 0, n).otherwise(F.element_at(m, 1)))
    # each merge's next-merge position (token count for the last one);
    # same exactly-nm-elements discipline as _rebuild_outside_runs
    nxt = F.when(nm == 0, F.array().cast("array<int>")).otherwise(
        F.concat(F.slice(m, 2, nm - 1), F.array(n))
    )
    tail = F.flatten(
        F.zip_with(
            m,
            nxt,
            lambda mm, nx: F.concat(
                F.array(
                    F.concat_ws(
                        sep,
                        F.element_at(F.col("__toks"), mm + 1),
                        F.element_at(F.col("__toks"), mm + 2),
                    )
                ),
                F.slice(F.col("__toks"), mm + 3, nx - mm - 2),
            ),
        )
    )
    out = F.concat(head, tail)
    return j.select(
        F.col(id_col),
        nm.cast("long").alias("n_merges"),
        F.size(out).cast("long").alias("n_tokens_out"),
        F.array_join(out, " ").alias("text_phrased"),
    )


def learn_apply_phrases(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    rounds: int = 2,
    min_count: int = 5,
    npmi_threshold: float = 0.3,
) -> DataFrame:
    """Iterated phrase learning — the published gensim-Phrases
    multi-pass pattern: each round mines collocations on the CURRENT
    corpus (:func:`npmi_collocations`), keeps pairs scoring
    ``npmi >= npmi_threshold`` at ``min_count``, rewrites every
    document with the greedy left-to-right merge
    (:func:`apply_collocations`), and feeds the rebuilt text into the
    next round — so round 2 surfaces TRIgrams as (bigram_token, word)
    pairs ("new_york" + "times" -> "new_york_times"), round 3
    4-grams, and so on. One pass alone can never exceed bigrams: the
    greedy parity rule consumes a merged token, so longer units only
    emerge by re-learning on the rewritten stream.

    Returns the FINAL round's :func:`apply_collocations` frame
    (``id_col, n_merges, n_tokens_out, text_phrased``) — ``n_merges``
    counts the last round's merges only, by construction of the
    iteration. Rounds where no pair clears the bar rewrite nothing
    (empty phrase table -> zero merges) and the iteration is a fixed
    point from there.

    Scale shape: each round costs what one learn+apply costs (bigram
    explode -> one combinable groupBy -> vocabulary-sized joins ->
    broadcast pair probe -> two windows -> codegen rebuild); rounds
    are a small constant chosen by the caller, and nothing carries
    across rounds except the rebuilt text column itself. The rewritten
    corpus is localCheckpointed between rounds (the graph-peel
    discipline) — each round's learn AND apply scan the SAME
    materialization instead of lazily replaying every earlier round,
    which would make round N cost O(N) round replays."""
    if rounds < 1:
        raise ValueError(f"rounds must be >= 1, got {rounds}")
    cur = df.select(F.col(id_col), F.col(text_col).alias("__text"))
    applied = None
    for r in range(rounds):
        if r > 0:
            cur = cur.localCheckpoint(eager=True)
        phrases = npmi_collocations(cur, text_col="__text", min_count=min_count).filter(
            F.col("npmi") >= F.lit(float(npmi_threshold))
        )
        applied = apply_collocations(cur, phrases, id_col=id_col, text_col="__text")
        cur = applied.select(
            F.col(id_col), F.col("text_phrased").alias("__text")
        )
    return applied
