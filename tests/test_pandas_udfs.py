"""UDTF surface (functions/pandas_udfs.py): wiring proven by
equivalence with the codegen posexplode(split(...)) path."""

from __future__ import annotations

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
