"""Semantic contract of the compression-ratio quality signal (the
rows-only `text_compression_quality` query's pytest half)."""

from __future__ import annotations

from d365fo_db_sync_spark.operators.text import compression_ratio


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


def test_input_schema_not_mutated(spark):
    """compression_ratio must not mutate the input frame's cached
    schema (StructType.add is in-place) — regression guard."""
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    compression_ratio(df)
    assert [f.name for f in df.schema.fields] == ["doc_id", "text"]
    assert df.select("doc_id", "text").count() == 1
