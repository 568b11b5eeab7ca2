"""Similarity-search suite over the `embeddings` corpus (array<float>,
64-dim; driver north-star extension surface).

Oracle notes:

* Cosine values are computed at full double precision for ranking, then
  rounded to 4 dp for the value hash (cross-engine accumulation-order
  noise lives at ~1e-16, far below both the ranking gaps and the
  rounding grain). Ties break on neighbor_id.
* The random-hyperplane LSH path IS oracle-checkable: the hyperplanes
  are deterministic doubles generated at module import, embedded into
  the oracle SQL as literals, so DuckDB computes the same buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from d365fo_db_sync_spark.operators import similarity
from d365fo_db_sync_spark.sources import load_table
from d365fo_db_sync_spark.suite import register

_K = 5
_BITS = 8
_DIM = 64

#: queries = every 25th vector (deterministic, small by construction)
_QUERY_PRED_SQL = "vec_id % 25 = 0"


def _queries_frame(emb: DataFrame) -> DataFrame:
    return emb.filter(F.pmod("vec_id", F.lit(25)) == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )


@register(
    "similarity_cosine_topk",
    oracle=f"""
    WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
    q AS (SELECT vec_id AS query_id, e AS qe FROM v WHERE {_QUERY_PRED_SQL}),
    scored AS (
      SELECT q.query_id, v.vec_id AS neighbor_id,
             list_cosine_similarity(q.qe, v.e) AS c
      FROM q JOIN v ON q.query_id <> v.vec_id),
    ranked AS (
      SELECT query_id, neighbor_id, c,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY c DESC, neighbor_id) AS rnk
      FROM scored)
    SELECT query_id, rnk, neighbor_id, ROUND(c, 4) AS cosine
    FROM ranked WHERE rnk <= {_K}
    """,
    bench=True,
)
def similarity_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact brute-force cosine top-k per query, computed on the
    fold-order-preserving Arrow path (r16): per-batch dots and norms
    accumulate in dimension order, reproducing the JVM zip_with +
    aggregate fold's doubles bit-for-bit (pinned by
    tests/test_pandas_udfs.py::test_ordered_np_equals_hof_fold), while
    the corpus streams through vectorized numpy instead of interpreted
    per-pair HOF folds and each batch pre-reduces to its own top-k
    before the rank-window shuffle. The HOF formulation
    (similarity.cosine_topk_bruteforce) remains the oracle-anchor
    twin; both produce identical rows."""
    emb = load_table(spark, sf_dir, "embeddings")
    res = similarity.cosine_topk_bruteforce_np(
        emb,
        _queries_frame(emb),
        k=_K,
        id_col="vec_id",
        query_id_col="query_id",
        preserve_fold_order=True,
    )
    return res.select("query_id", "rnk", "neighbor_id", F.round("cosine", 4).alias("cosine"))


def _bucket_sql(vec_expr: str) -> str:
    planes = similarity._hyperplanes(_DIM, _BITS, seed=42)
    terms = []
    for i, plane in enumerate(planes):
        lit = "[" + ", ".join(repr(x) for x in plane) + "]::DOUBLE[]"
        terms.append(
            f"(CASE WHEN list_dot_product({vec_expr}, {lit}) >= 0"
            f" THEN {1 << i} ELSE 0 END)"
        )
    return " + ".join(terms)


@register(
    "similarity_cosine_topk_lsh",
    oracle=f"""
    WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
    b AS (SELECT vec_id, e, {_bucket_sql('e')} AS bucket FROM v),
    q AS (SELECT vec_id AS query_id, e AS qe, bucket FROM b WHERE {_QUERY_PRED_SQL}),
    scored AS (
      SELECT q.query_id, b.vec_id AS neighbor_id,
             list_cosine_similarity(q.qe, b.e) AS c
      FROM q JOIN b ON q.bucket = b.bucket AND q.query_id <> b.vec_id),
    ranked AS (
      SELECT query_id, neighbor_id, c,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY c DESC, neighbor_id) AS rnk
      FROM scored)
    SELECT query_id, rnk, neighbor_id, ROUND(c, 4) AS cosine
    FROM ranked WHERE rnk <= {_K}
    """,
)
def similarity_cosine_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-k via random-hyperplane LSH: 8 sign bits -> 256 buckets,
    candidates only within the query's bucket, exact re-rank inside.
    The shuffle carries ~n/256 rows per bucket instead of n — the scale
    path. Deterministic hyperplanes make even this approximate operator
    oracle-checkable (same buckets in DuckDB)."""
    emb = load_table(spark, sf_dir, "embeddings")
    res = similarity.cosine_topk_lsh(
        emb,
        _queries_frame(emb),
        k=_K,
        bits=_BITS,
        dim=_DIM,
        id_col="vec_id",
        query_id_col="query_id",
        seed=42,
    )
    return res.select("query_id", "rnk", "neighbor_id", F.round("cosine", 4).alias("cosine"))


@register(
    "similarity_near_dup_exact",
    oracle="""
    WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings)
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           ROUND(list_cosine_similarity(a.e, b.e), 6) AS cosine
    FROM v a JOIN v b ON a.vec_id < b.vec_id
    WHERE ROUND(list_cosine_similarity(a.e, b.e), 6) >= 0.4
    """,
)
def similarity_near_dup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, exact O(n^2) baseline at
    threshold 0.4 (this corpus' max pair cosine is ~0.51, so the planted
    near-neighbors surface without exact duplicates existing)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.cosine_pairs_exact(emb, threshold=0.4)


# similarity_near_dup_lsh and similarity_cosine_topk_ivf live in
# suite.tail_q (both fully value-oracled since r13 — deterministic
# hyperplane literals / decimal-replay k-means).
