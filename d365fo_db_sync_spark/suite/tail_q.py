"""Rows-only tail of the suite — queries whose values are genuinely not
SQL-expressible cross-engine (engine-specific hash bit patterns, k-means
training, HLL registers).

Registered LAST on purpose: the 50 oracled queries come first in
registration order so every one of them sits inside the driver's
correctness gate window; these four get the weaker rows-only check there
but each carries a pytest asserting its semantic contract
(tests/test_scale_ops.py, tests/test_similarity.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from d365fo_db_sync_spark.operators import dedup, similarity
from d365fo_db_sync_spark.sources import load_table
from d365fo_db_sync_spark.suite import register

_K = 5
_BITS = 8
_DIM = 64


def _queries_frame(emb: DataFrame) -> DataFrame:
    return emb.filter(F.pmod("vec_id", F.lit(25)) == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )


@register("approx_distinct_sketch", oracle=None)
def approx_distinct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.4 extension — raw HyperLogLog++ distinct-count sketch
    (approx_count_distinct, rsd=0.01). Sketch internals differ across
    engines so there is no value-level oracle; the deterministic
    bounded-check twin (`approx_distinct_bounds`, suite.core) carries
    the oracle, and tests/test_scale_ops.py asserts the estimate is
    within the configured error of the exact count."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey", rsd=0.01).alias("approx_orderkeys"),
        F.count("*").alias("n_rows"),
    )


@register("dedup_simhash_candidates", oracle=None)
def dedup_simhash_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash(64-bit) banded Hamming candidates (4 bands of 16 bits —
    catches every pair with Hamming distance <= 3 by pigeonhole).
    Depends on xxhash64 bit patterns, which DuckDB cannot reproduce ->
    rows-only check; the pytest suite asserts the planted near-dup pairs
    are recovered."""
    docs = load_table(spark, sf_dir, "documents")
    return dedup.simhash_candidates(docs, "doc_id", "text", bands=4)


@register("similarity_near_dup_lsh", oracle=None)
def similarity_near_dup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs via the LSH bucket join — approximate
    (pairs split across buckets are missed; recall rises with fewer
    bits). Rows-only check here; pytest asserts it returns a subset of
    the exact pair set with matching cosines."""
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.embedding_near_duplicates(emb, threshold=0.4, bits=_BITS, dim=_DIM)


@register("similarity_cosine_topk_ivf", oracle=None)
def similarity_cosine_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-k via an IVF index (k-means cells, probe the 4 nearest of
    16). K-means training is not reproducible in DuckDB -> rows-only
    check; pytest asserts recall >= 0.9 against the brute-force baseline.
    The probe join shuffles ~n*probes/lists candidate rows per query —
    with the index written partitioned by cell, a probe reads only its
    cells' files at 100 TB."""
    emb = load_table(spark, sf_dir, "embeddings")
    assigned, model = similarity.ivf_index(emb, n_lists=16)
    res = similarity.ivf_topk(
        assigned, model, _queries_frame(emb), k=_K, n_probes=4,
        id_col="vec_id", query_id_col="query_id",
    )
    return res.select("query_id", "rnk", "neighbor_id", F.round("cosine", 4).alias("cosine"))
