"""Semantic contract of the compression-ratio quality signal (the
rows-only `text_compression_quality` query's pytest half) + the
BPE-ish token-count extraction/staged equivalence pin."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from d365fo_db_sync_spark.operators.text import (
    bpe_ish_token_count,
    bpe_ish_token_count_staged,
    compression_ratio,
)


def _ratios(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {r["doc_id"]: r["zlib_ratio"] for r in compression_ratio(df).collect()}


def test_repetitive_text_compresses_below_prose(spark):
    prose = (
        "The quick brown fox jumps over the lazy dog while seventeen "
        "quirky zebras vault backwards through mismatched garden hoops."
    ) * 4
    loop = "spam ham " * 60
    got = _ratios(spark, [(1, prose), (2, loop), (3, ""), (4, None)])
    assert got[2] < got[1] < 1.2
    assert got[2] < 0.1  # a pure loop collapses
    assert got[3] == 0.0 and got[4] == 0.0  # empty/null -> 0, not error


def test_ratio_is_deterministic_and_partitioning_invariant(spark):
    rows = [(i, f"doc {i} " + "xyz " * (i % 17)) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = sorted(map(tuple, compression_ratio(df).collect()))
    b = sorted(map(tuple, compression_ratio(df.repartition(7)).collect()))
    assert a == b


def test_bpe_extraction_equals_staged_construction(spark):
    """The oracle-friendly single-pattern extraction must count exactly
    what the original staged replace-then-split construction counted —
    on adversarial literals AND the real sf0.01 corpus."""
    rows = [
        (1, "abc123def 45-6,7.8"),
        (2, "plain words only"),
        (3, "UPPER lower 2024: mix3d_tokens [bracketed] `tick`"),
        (4, ""),
        (5, "   \t\n  "),
        (6, "1234567890"),
        (7, "a1b2c3"),
        (8, "punct!!! only??? ---"),
        (9, "unicode naïve café 北京 42度"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    mism = df.select(
        bpe_ish_token_count("text").alias("a"),
        bpe_ish_token_count_staged("text").alias("b"),
    ).filter("a <> b")
    assert mism.count() == 0

    corpus = os.path.join(
        os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01"),
        "documents.parquet",
    )
    if os.path.exists(corpus):
        docs = spark.read.parquet(corpus)
        got = docs.agg(
            F.sum(bpe_ish_token_count("text")).alias("a"),
            F.sum(bpe_ish_token_count_staged("text")).alias("b"),
            F.sum(
                (bpe_ish_token_count("text") != bpe_ish_token_count_staged("text")).cast("int")
            ).alias("n_diff"),
        ).first()
        assert got["n_diff"] == 0 and got["a"] == got["b"]


def test_input_schema_not_mutated(spark):
    """compression_ratio must not mutate the input frame's cached
    schema (StructType.add is in-place) — regression guard."""
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    compression_ratio(df)
    assert [f.name for f in df.schema.fields] == ["doc_id", "text"]
    assert df.select("doc_id", "text").count() == 1
