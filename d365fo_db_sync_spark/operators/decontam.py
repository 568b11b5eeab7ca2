"""Benchmark decontamination: find and drop training documents whose
n-grams overlap an evaluation/benchmark set.

The standard pre-training hygiene step (the n-gram overlap rule of the
public GPT-3/PaLM appendices): an eval item is "contaminated" if its
word n-grams appear in a training document, and such documents must be
dropped or flagged before training.

Scale shape: the benchmark side is tiny by construction (eval suites
are thousands of items; the corpus is billions of documents), so its
exploded shingle set is BROADCAST — the corpus side streams through a
map-side broadcast-hash join on the shingle, then ONE shuffle
aggregates per-(doc, bench-item) match counts. The corpus is never
re-partitioned by shingle, which at 100 TB would be a full-corpus
shuffle of every n-gram.

Reuses the codegen shingle builder from operators/dedup.py (posexplode
+ lead window, no higher-order-function interpretation overhead).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from d365fo_db_sync_spark.operators.dedup import exploded_shingles


def benchmark_overlap(
    corpus: DataFrame,
    bench: DataFrame,
    corpus_id: str = "doc_id",
    corpus_text: str = "text",
    bench_id: str = "bench_id",
    bench_text: str = "text",
    n: int = 3,
) -> DataFrame:
    """Per (corpus document, benchmark item) n-gram overlap.

    Returns one row per pair sharing >= 1 distinct word n-gram:
    ``(corpus_id, bench_id, matched_ngrams, bench_ngrams,
    overlap_frac)`` where ``overlap_frac`` is the fraction of the
    benchmark item's DISTINCT n-grams found in the document (the
    direction that defines contamination — a long document trivially
    contains many n-grams, but only coverage OF THE EVAL ITEM matters).

    Thresholding is the caller's policy; see :func:`decontaminate`.
    """
    if corpus_id == bench_id:
        raise ValueError("corpus_id and bench_id must differ to label the pair")
    c = exploded_shingles(corpus, corpus_id, corpus_text, n=n, distinct=True)
    b = exploded_shingles(bench, bench_id, bench_text, n=n, distinct=True)
    bench_sizes = b.groupBy(bench_id).agg(F.count("*").alias("bench_ngrams"))
    pairs = (
        c.join(F.broadcast(b), on="g")
        .groupBy(corpus_id, bench_id)
        .agg(F.count("*").alias("matched_ngrams"))
    )
    return pairs.join(F.broadcast(bench_sizes), on=bench_id).select(
        corpus_id,
        bench_id,
        "matched_ngrams",
        "bench_ngrams",
        (F.col("matched_ngrams") / F.col("bench_ngrams")).alias("overlap_frac"),
    )


def exact_contamination(
    corpus: DataFrame,
    needles: DataFrame,
    corpus_id: str = "doc_id",
    corpus_text: str = "text",
    needle_id: str = "bench_id",
    needle_text: str = "needle",
) -> DataFrame:
    """Exact answer-string contamination: one row per (document,
    benchmark answer) where the answer appears VERBATIM
    (case-insensitive) in the document — the exact-match rule used for
    short-answer benchmarks, where n-gram shingle overlap is the wrong
    tool (a 3-word answer has zero 3-gram context of its own).

    Scale shape: the needle set (benchmark answers — thousands at
    most) is BROADCAST and the containment predicate runs map-side as
    a broadcast nested-loop join: every executor scans its corpus
    slice once against the in-memory needle list, no shuffle of the
    corpus ever. Cost is O(|needles| x doc length) per document —
    the distributed shape is right at any corpus size; swap the inner
    loop for an Aho-Corasick pass (mapInPandas over the same
    broadcast) only if the needle set grows past ~10^5.
    Thresholding/removal composes with :func:`decontaminate`'s
    left-anti discipline."""
    if corpus_id == needle_id:
        raise ValueError("corpus_id and needle_id must differ to label the pair")
    return corpus.join(
        F.broadcast(needles),
        F.contains(F.lower(corpus[corpus_text]), F.lower(needles[needle_text])),
    ).select(
        # frame-qualified: corpus and needle frames may legally share
        # column names (e.g. both call their text column "text")
        corpus[corpus_id],
        needles[needle_id],
        needles[needle_text],
    )


def semantic_contamination(
    corpus_vecs: DataFrame,
    needle_vecs: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    needle_id_col: str = "bench_id",
) -> DataFrame:
    """Embedding-space contamination scores: for every corpus vector,
    the max cosine similarity against ANY benchmark needle vector and
    which needle achieved it — the third leg of the decontamination
    family (n-gram :func:`benchmark_overlap`, verbatim
    :func:`exact_contamination`, and this semantic variant, the
    paraphrase-robust rule n-grams miss).

    Returns one row per corpus vector: ``(id_col, best_needle,
    max_cos)`` with ``max_cos`` at full float64 precision (callers
    round/threshold; see the suite query). ``best_needle`` is the
    argmax at full precision with needle-id ascending as tie-break, so
    the result is deterministic and partitioning-invariant. All-zero
    vectors score cosine 0.0 on every pair (no direction — see
    ``similarity.vec_matrix_np``) instead of emitting NaN rows that
    would silently vanish from threshold filters.

    Scale shape: mirrors :func:`exact_contamination` — the needle side
    (an eval suite: thousands of vectors at most) is collected once and
    shipped in the UDF closure; the corpus streams through
    ``mapInPandas`` in Arrow batches and each batch scores against the
    whole needle matrix as ONE float64 GEMM (BLAS), emitting exactly
    one row per corpus vector. The corpus is never shuffled and no
    |corpus| x |needles| pair set ever materializes."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import DoubleType, StructField, StructType

    from d365fo_db_sync_spark.operators.similarity import vec_matrix_np

    n_rows = sorted(
        needle_vecs.select(needle_id_col, vec_col).collect(),
        key=lambda r: r[needle_id_col],
    )
    if not n_rows:
        raise ValueError("needle_vecs is empty — nothing to screen against")
    # dtype inferred, not coerced: the declared schema promises the
    # caller's id types back (string/int32 ids pass straight through)
    nids = np.array([r[needle_id_col] for r in n_rows])
    nmat, nnorm = vec_matrix_np(r[vec_col] for r in n_rows)

    schema = StructType(
        [
            StructField(id_col, corpus_vecs.schema[id_col].dataType),
            StructField("best_needle", needle_vecs.schema[needle_id_col].dataType),
            StructField("max_cos", DoubleType()),
        ]
    )

    def score(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf[id_col].to_numpy()
            cmat, cnorm = vec_matrix_np(pdf[vec_col])
            scores = (cmat @ nmat.T) / np.outer(cnorm, nnorm)
            # argmax at full precision; needles are sorted by id so
            # np.argmax's first-max rule IS the id-ascending tie-break
            best = np.argmax(scores, axis=1)
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "best_needle": nids[best],
                    "max_cos": scores[np.arange(len(ids)), best],
                }
            )

    return corpus_vecs.select(id_col, vec_col).mapInPandas(score, schema)


def decontaminate(
    corpus: DataFrame,
    bench: DataFrame,
    corpus_id: str = "doc_id",
    corpus_text: str = "text",
    bench_id: str = "bench_id",
    bench_text: str = "text",
    n: int = 3,
    min_overlap_frac: float = 0.5,
) -> DataFrame:
    """Drop every corpus document whose overlap with ANY benchmark item
    reaches ``min_overlap_frac`` — the flagged-id set stays distributed
    and removal is a left-anti join (never a collected id list)."""
    flagged = (
        benchmark_overlap(corpus, bench, corpus_id, corpus_text, bench_id, bench_text, n)
        .filter(F.col("overlap_frac") >= min_overlap_frac)
        .select(corpus_id)
        .distinct()
    )
    return corpus.join(flagged, on=corpus_id, how="left_anti")
