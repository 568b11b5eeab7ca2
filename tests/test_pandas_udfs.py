"""UDTF surface (functions/pandas_udfs.py): wiring proven by
equivalence with the codegen posexplode(split(...)) path."""

from __future__ import annotations

import pytest

#: driver-window tier: value-equality / contract tests (pytest -m fast)
pytestmark = pytest.mark.fast

def test_sentence_split_udtf_matches_codegen_path(spark):
    """UDTF output == the posexplode(split(...)) codegen equivalent on
    every row, including empties, trailing dots, and NULL text."""
    from pyspark.sql import functions as F

    from d365fo_db_sync_spark.functions.pandas_udfs import sentence_split_udtf

    rows = [
        (1, "one. two.  three"),
        (2, "."),
        (3, None),
        (4, "no dots here"),
        (5, " lead. . trail. "),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    SentenceSplit = sentence_split_udtf()
    got = sorted(
        (r["doc_id"], r["idx"], r["sentence"])
        for r in docs.lateralJoin(
            SentenceSplit(F.col("text").outer())
        ).select("doc_id", "idx", "sentence").collect()
    )
    codegen = (
        docs.select(
            "doc_id",
            F.posexplode(
                F.filter(
                    F.transform(F.split("text", r"\."), lambda s: F.trim(s)),
                    lambda s: s != "",
                )
            ).alias("idx", "sentence"),
        )
    )
    want = sorted(
        (r["doc_id"], r["idx"], r["sentence"]) for r in codegen.collect()
    )
    assert got == want and len(got) == 6


def test_ordered_np_equals_hof_fold(spark):
    """``cosine_topk_bruteforce_np(preserve_fold_order=True)`` must
    equal the JVM zip_with/aggregate fold path ROW FOR ROW with
    bit-identical raw cosines — the r16 value-preservation contract
    that lets similarity_cosine_topk run on the Arrow path. Checked on
    the full smoke corpus (every vector scored against every query)
    and on a synthetic corpus with exact cosine ties (parallel
    vectors), where any accumulation-order drift would flip ranks."""
    from conftest import SF_SMOKE
    from d365fo_db_sync_spark.operators.similarity import (
        cosine_topk_bruteforce,
        cosine_topk_bruteforce_np,
    )
    from d365fo_db_sync_spark.sources import load_table

    emb = load_table(spark, SF_SMOKE, "embeddings")
    queries = emb.filter("vec_id % 25 = 0").selectExpr(
        "vec_id AS query_id", "embedding"
    )
    hof = sorted(map(tuple, cosine_topk_bruteforce(emb, queries, k=5).collect()))
    ordered = sorted(
        map(
            tuple,
            cosine_topk_bruteforce_np(
                emb, queries, k=5, preserve_fold_order=True
            ).collect(),
        )
    )
    assert ordered == hof  # raw doubles, no rounding

    # ties: v, 2v, 4v are pairwise cosine 1.0; ranks must break on id
    # identically in both paths
    base = [0.3, -1.2, 0.05, 2.0]
    rows = [
        (1, [x * 1.0 for x in base]),
        (2, [x * 2.0 for x in base]),
        (3, [x * 4.0 for x in base]),
        (4, [-x for x in base]),
        (5, [1.0, 0.0, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = df.selectExpr("vec_id AS query_id", "embedding")
    hof2 = sorted(map(tuple, cosine_topk_bruteforce(df, q, k=4).collect()))
    np2 = sorted(
        map(
            tuple,
            cosine_topk_bruteforce_np(
                df, q, k=4, preserve_fold_order=True
            ).collect(),
        )
    )
    assert np2 == hof2
