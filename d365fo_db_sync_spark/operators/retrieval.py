"""Sparse lexical retrieval: feature hashing + inverted-index MIPS.

The hashing trick (Weinberger et al. 2009) turns tokens into a
fixed-width sparse count vector — bucket = hash(token) mod dims,
weight = occurrences — with NO vocabulary to build, broadcast, or keep
consistent across runs: the feature space is defined by the hash
function alone, so featurization is embarrassingly parallel and
rerun-stable on any cluster.

Retrieval then scores query·document inner products WITHOUT
materializing dense vectors: the sparse rows ARE a posting-list
inverted index, so the dot product is an equi-join on the bucket id
followed by a sum of weight products — the classic sparse-MIPS shape.
All arithmetic is integer (counts and products), which is what lets a
SQL oracle value-check every score exactly; the hash rides md5 hex
prefixes, reproducible in any engine.

Scale shape at 100 TB: featurization is one groupBy per side keyed on
(id, bucket) with map-side partial counts; the score join broadcasts
the QUERY side (queries are thousands of rows against a corpus of
billions) so the corpus postings stream map-side and the only wide
shuffle is the per-(query, doc) score aggregation, whose cardinality
is bounded by matching postings — never |corpus| x |queries|.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from d365fo_db_sync_spark.operators.text import tokens


def hashed_token_features(
    df: DataFrame, id_col: str, text_col: str, dims: int = 256
) -> DataFrame:
    """Sparse feature-hashing bag-of-words: ``(id, bucket, weight)``
    rows with ``bucket = md5(token) hex-prefix mod dims`` and
    ``weight`` the token's occurrence count in the bucket. One groupBy
    on (id, bucket) — map-side combine does the counting."""
    if dims <= 0:
        raise ValueError(f"dims must be positive, got {dims}")
    ex = df.select(F.col(id_col), F.explode(tokens(text_col)).alias("__tok"))
    bucket = (
        F.conv(F.substring(F.md5("__tok"), 1, 4), 16, 10).cast("long") % dims
    )
    return ex.groupBy(F.col(id_col), bucket.alias("bucket")).agg(
        F.count("*").alias("weight")
    )


def mips_topk(
    corpus_feats: DataFrame,
    query_feats: DataFrame,
    k: int = 5,
    corpus_id: str = "doc_id",
    query_id: str = "query_id",
    broadcast_queries: bool = True,
) -> DataFrame:
    """Top-k inner-product retrieval over sparse hashed features.

    ``score(q, d) = sum over shared buckets of weight_q * weight_d`` —
    an equi-join on the bucket (the inverted-index probe), one
    aggregation per (query, doc) pair, then a per-query rank window.
    Ties break on ascending corpus id, making the top-k total-ordered
    and cross-engine reproducible. ``broadcast_queries`` keeps the
    corpus postings map-side (right at any realistic query count);
    disable it only for query sets too large to broadcast."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    q = query_feats.select(
        F.col(query_id), F.col("bucket"), F.col("weight").alias("__qw")
    )
    if broadcast_queries:
        q = F.broadcast(q)
    scores = (
        corpus_feats.join(q, on="bucket")
        .groupBy(query_id, corpus_id)
        .agg(F.sum(F.col("weight") * F.col("__qw")).alias("score"))
    )
    w = Window.partitionBy(query_id).orderBy(
        F.col("score").desc(), F.col(corpus_id)
    )
    return scores.withColumn("rnk", F.row_number().over(w)).filter(
        F.col("rnk") <= k
    )


def rrf_fuse(
    ranked_lists: list[DataFrame],
    k: int = 10,
    k_rrf: int = 60,
    query_id: str = "query_id",
    item_id: str = "item_id",
) -> DataFrame:
    """Reciprocal Rank Fusion (Cormack, Clarke & Buettcher 2009):
    ``score(q, d) = sum over lists L of 1 / (k_rrf + rank_L(q, d))`` —
    the standard score-free way to combine heterogeneous retrievers
    (dense cosine + sparse lexical being THE hybrid-search pairing),
    robust precisely because it ignores incomparable raw scores and
    uses only ranks.

    PRECONDITION: each input frame carries ``(query_id, item_id,
    rnk)`` with (query_id, item_id) UNIQUE per frame — i.e. a ranked
    top-k list, the thing every retriever here emits. Duplicate rows
    would double-count into the fused sum and inflate ``n_lists``
    past ``len(ranked_lists)`` (an n_lists cap is the cheap caller-
    side sanity check). Because each list is already bounded
    top-k-per-query, everything downstream is metadata-scale
    regardless of corpus size: the union of per-list
    contributions holds <= |queries| x k_list x n_lists rows, ONE
    groupBy sums them per (query, item), and a rank window cuts the
    fused top-k with item-id tie-breaks. Items missing from a list
    simply contribute nothing (the union IS the full-outer merge,
    without n-way join plumbing).

    Determinism: with two lists the fused sum is a single IEEE
    addition (order-free); for three or more the groupBy sum order is
    partition-dependent at ~1e-16 — round fused scores before
    hash-comparing across engines (contributions are ~1/k_rrf scale,
    so 6 dp absorbs association noise). Returns ``(query_id, rnk,
    item_id, n_lists, rrf_score)``."""
    from functools import reduce

    if not ranked_lists:
        raise ValueError("need at least one ranked list to fuse")
    if k <= 0 or k_rrf <= 0:
        raise ValueError(f"k and k_rrf must be positive, got k={k}, k_rrf={k_rrf}")
    contribs = reduce(
        DataFrame.unionByName,
        [
            frame.select(
                F.col(query_id),
                F.col(item_id),
                (F.lit(1.0) / (F.lit(k_rrf) + F.col("rnk"))).alias("__c"),
            )
            for frame in ranked_lists
        ],
    )
    fused = contribs.groupBy(query_id, item_id).agg(
        F.sum("__c").alias("rrf_score"), F.count("*").alias("n_lists")
    )
    w = Window.partitionBy(query_id).orderBy(
        F.col("rrf_score").desc(), F.col(item_id)
    )
    return (
        fused.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(query_id, "rnk", item_id, "n_lists", "rrf_score")
    )


def ranking_partials(
    results: DataFrame,
    qrels: DataFrame,
    k: int = 10,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    rank_col: str = "rnk",
    rel_col: str = "rel",
) -> DataFrame:
    """MERGEABLE per-query partials of a (slice of a) retrieval run:
    ``(query, hits_at_k, first_rel, dcg)`` — an integer count, a
    nullable MIN rank, and an exact DECIMAL(38,12) sum of the
    quantized DCG terms. All three fold exactly across arbitrary row
    slices (SUM/MIN/SUM), so partials computed per micro-batch and
    folded equal the partials of the concatenated run double for
    double — the streaming twin's sidecar unit
    (streaming.RankingMetricsStreamPipeline). One broadcast-able join
    of the batch's top-k slice against qrels, one combinable
    aggregate."""
    term_dec = "decimal(38,12)"
    topk = results.filter(F.col(rank_col) <= k).select(
        query_col, doc_col, rank_col
    )
    labeled = qrels.filter(F.col(rel_col) > 0).select(
        query_col, doc_col, rel_col
    )
    j = topk.join(labeled, on=[query_col, doc_col], how="left")
    gain = F.pow(F.lit(2.0), F.col(rel_col).cast("double")) - F.lit(1.0)
    dterm = (gain / F.log2(F.col(rank_col).cast("double") + F.lit(1.0))).cast(
        term_dec
    )
    return j.groupBy(query_col).agg(
        F.count(F.when(F.col(rel_col).isNotNull(), 1))
        .cast("long")
        .alias("hits_at_k"),
        F.min(F.when(F.col(rel_col).isNotNull(), F.col(rank_col)))
        .cast("int")
        .alias("first_rel"),
        F.coalesce(
            F.sum(F.when(F.col(rel_col).isNotNull(), dterm)),
            F.lit(0).cast(term_dec),
        ).alias("dcg"),
        # the ranks at which relevant docs appeared (<= k ints, sorted)
        # — the AP partial: a bounded SET is what merges exactly, the
        # cumulative-precision terms themselves do not
        F.array_sort(
            F.collect_list(
                F.when(F.col(rel_col).isNotNull(), F.col(rank_col)).cast(
                    "int"
                )
            )
        ).alias("rel_ranks"),
    )


def fold_ranking_partials(
    partials: DataFrame, query_col: str = "query_id"
) -> DataFrame:
    """Fold partials from several run slices back into one row per
    query — exact by construction (SUM of counts, MIN of ranks, SUM of
    exact decimals)."""
    return partials.groupBy(query_col).agg(
        F.sum("hits_at_k").cast("long").alias("hits_at_k"),
        F.min("first_rel").alias("first_rel"),
        F.sum("dcg").cast("decimal(38,12)").alias("dcg"),
        F.array_sort(F.flatten(F.collect_list("rel_ranks"))).alias(
            "rel_ranks"
        ),
    )


def ranking_metrics_from_partials(
    partials: DataFrame,
    qrels: DataFrame,
    k: int = 10,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    rel_col: str = "rel",
) -> DataFrame:
    """The metrics tail over folded partials: attach the qrels-derived
    denominators (n_rel, ideal DCG) and derive
    recall/precision/rr/ndcg — the second half of
    :func:`ranking_metrics`, shared with the streaming view so the
    stream's final state is double-for-double the batch readout."""
    term_dec = "decimal(38,12)"
    folded = fold_ranking_partials(partials, query_col)
    labeled = qrels.filter(F.col(rel_col) > 0).select(
        query_col, doc_col, rel_col
    )
    # Spine = run queries UNION labeled queries: a query the retriever
    # returned zero rows for must still score hits/recall/rr 0 (else
    # downstream means — MRR, mean recall — silently skew optimistic).
    spine = (
        folded.select(query_col)
        .union(labeled.select(query_col))
        .distinct()
    )
    per_q = spine.join(folded, on=query_col, how="left").select(
        query_col,
        F.coalesce("hits_at_k", F.lit(0)).alias("hits_at_k"),
        F.col("first_rel").alias("__first"),
        F.coalesce("dcg", F.lit(0).cast(term_dec)).alias("__dcg"),
        F.coalesce(
            "rel_ranks", F.array().cast("array<int>")
        ).alias("__ranks"),
    )
    # AP numerator from the folded relevant-rank list: the i-th
    # relevant hit (1-based, rank-ascending) contributes P@r_i = i/r_i;
    # each term quantizes through DECIMAL(38,12) before the exact sum
    # (the DCG discipline — double SUM order is undefined cross-engine)
    ap_num = F.aggregate(
        F.transform(
            "__ranks",
            lambda r, i: (
                (i + F.lit(1)).cast("double") / r.cast("double")
            ).cast(term_dec),
        ),
        F.lit(0).cast(term_dec),
        lambda acc, v: (acc + v).cast(term_dec),
    )
    per_q = per_q.withColumn("__apnum", ap_num).drop("__ranks")
    n_rel = labeled.groupBy(query_col).agg(F.count("*").alias("n_rel"))
    w = Window.partitionBy(query_col).orderBy(
        F.desc(rel_col), F.asc(doc_col)
    )
    ideal = (
        labeled.withColumn("__pos", F.row_number().over(w))
        .filter(F.col("__pos") <= k)
        .select(
            query_col,
            (
                (F.pow(F.lit(2.0), F.col(rel_col).cast("double")) - F.lit(1.0))
                / F.log2(F.col("__pos").cast("double") + F.lit(1.0))
            )
            .cast(term_dec)
            .alias("__it"),
        )
        .groupBy(query_col)
        .agg(F.sum("__it").alias("__idcg"))
    )
    return (
        per_q.join(n_rel, on=query_col, how="left")
        .join(ideal, on=query_col, how="left")
        .select(
            query_col,
            F.coalesce("n_rel", F.lit(0)).cast("long").alias("n_rel"),
            F.col("hits_at_k").cast("long").alias("hits_at_k"),
            (
                F.col("hits_at_k").cast("double")
                / F.nullif(F.col("n_rel"), F.lit(0)).cast("double")
            ).alias("recall_at_k"),
            (F.col("hits_at_k").cast("double") / F.lit(float(k))).alias(
                "precision_at_k"
            ),
            F.coalesce(
                F.lit(1.0) / F.col("__first").cast("double"), F.lit(0.0)
            ).alias("rr"),
            (
                F.col("__apnum").cast("double")
                / F.nullif(
                    F.least(F.coalesce("n_rel", F.lit(0)), F.lit(k)),
                    F.lit(0),
                ).cast("double")
            ).alias("ap_at_k"),
            F.col("__dcg").cast("double").alias("dcg_at_k"),
            F.col("__idcg").cast("double").alias("idcg_at_k"),
            (
                F.col("__dcg").cast("double")
                / F.col("__idcg").cast("double")
            ).alias("ndcg_at_k"),
        )
    )


def ranking_metrics(
    results: DataFrame,
    qrels: DataFrame,
    k: int = 10,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    rank_col: str = "rnk",
    rel_col: str = "rel",
) -> DataFrame:
    """Per-query ranking quality of a retrieval run — the standard IR
    eval readout (TREC conventions; Järvelin & Kekäläinen 2002 for
    NDCG): given ranked ``results`` (query, doc, 1-based rank) and
    graded relevance labels ``qrels`` (query, doc, integer rel > 0),
    returns per query

    * ``n_rel`` — labeled-relevant docs for the query,
    * ``hits_at_k`` / ``recall_at_k`` / ``precision_at_k``,
    * ``rr`` — reciprocal rank of the first relevant hit (0 if none;
      MRR is its mean),
    * ``ap_at_k`` — binary-relevance average precision,
      ``sum_i(i / rank_i) / min(n_rel, k)`` over the i-th relevant hit
      at rank ``rank_i`` (MAP is its mean; NULL when the query has no
      labeled-relevant docs, like NDCG),
    * ``dcg_at_k`` / ``idcg_at_k`` / ``ndcg_at_k`` — graded, gain
      ``2^rel - 1``, ``log2(rank+1)`` discount; NDCG is NULL when the
      query has no labeled-relevant docs.

    Exactness: every DCG term quantizes through DECIMAL(38,12) BEFORE
    the sum (the decimal-replay re-synchronization barrier — libm
    ``log2`` may differ across engines in the last ulp, and double
    SUM order is undefined; the quantized decimal sum is exact and
    order-free), so a SQL oracle value-checks every metric. The ideal
    ordering ties break on the doc id — deterministic in both engines.

    Scale shape: one broadcast-able join of the top-k slice against
    qrels (both bounded by queries x k / queries x labels — metadata
    next to the corpus), two combinable per-query aggregates, one
    rank window over qrels for the ideal ordering. The corpus itself
    is never touched — this consumes a retrieval RUN.

    The output spine is the UNION of run queries and labeled queries:
    a query present in qrels for which the retriever returned zero
    rows still appears, scoring hits/recall/rr/dcg 0 (ndcg 0 when it
    has labeled-relevant docs) — means over the frame stay honest."""
    return ranking_metrics_from_partials(
        ranking_partials(
            results, qrels, k, query_col, doc_col, rank_col, rel_col
        ),
        qrels,
        k,
        query_col,
        doc_col,
        rel_col,
    )
