"""JSONL ingestion (sources/textfiles.py): quarantine capture, lazy
path, schema-object safety."""

from __future__ import annotations

import pytest
from pyspark.sql.types import LongType, StringType, StructField, StructType

from d365fo_db_sync_spark.sources.textfiles import (
    CORRUPT_COL,
    read_jsonl,
    write_jsonl,
)

SCHEMA = StructType(
    [StructField("doc_id", LongType()), StructField("text", StringType())]
)


@pytest.fixture()
def landing(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, 'line with "quotes" and\nnewline'), (2, "plain"), (3, None)],
        SCHEMA,
    )
    path = str(tmp_path / "docs")
    write_jsonl(df, path)
    with open(f"{path}/zz_torn.json", "w", encoding="utf-8") as f:
        f.write("{broken\n")
        f.write('{"doc_id": 9, "text": "good extra"}\n')
    return path


def test_quarantine_counts_and_raw_lines(spark, landing):
    ing = read_jsonl(spark, landing, SCHEMA)
    assert (ing.n_good, ing.n_quarantined) == (4, 1)
    assert [r["raw_line"] for r in ing.quarantine.collect()] == ["{broken"]
    got = {r["doc_id"]: r["text"] for r in ing.good.collect()}
    assert got[1] == 'line with "quotes" and\nnewline'  # lossless escaping
    assert got[3] is None and got[9] == "good extra"


def test_lazy_path_and_schema_safety(spark, landing):
    before = len(SCHEMA.fields)
    df = read_jsonl(spark, landing, SCHEMA, quarantine=False)
    assert df.columns == ["doc_id", "text"]
    assert df.count() == 5  # malformed line surfaces as an all-NULL row
    assert len(SCHEMA.fields) == before  # caller's schema not mutated
    with pytest.raises(ValueError, match="_corrupt_record"):
        read_jsonl(
            spark,
            landing,
            StructType([StructField(CORRUPT_COL, StringType())]),
        )


def test_csv_roundtrip_hostile_content_and_quarantine(spark, tmp_path):
    """CSV twin: commas/quotes round-trip always; embedded newlines
    round-trip under multiline=True; malformed rows quarantine."""
    from d365fo_db_sync_spark.sources.textfiles import read_csv, write_csv

    rows = [
        (1, 'comma, "quoted", and more'),
        (2, "plain"),
        (3, None),
        (4, "trailing space "),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    path = str(tmp_path / "csv_docs")
    write_csv(df, path)
    with open(f"{path}/zz_torn.csv", "w", encoding="utf-8") as f:
        f.write("not-a-long,text-col\n")  # type mismatch on doc_id
    ing = read_csv(spark, path, SCHEMA)
    assert (ing.n_good, ing.n_quarantined) == (4, 1)
    assert [r["raw_line"] for r in ing.quarantine.collect()] == [
        "not-a-long,text-col"
    ]
    got = {r["doc_id"]: r["text"] for r in ing.good.collect()}
    assert got[1] == 'comma, "quoted", and more'
    assert got[3] is None


def test_csv_multiline_newline_roundtrip(spark, tmp_path):
    from d365fo_db_sync_spark.sources.textfiles import read_csv, write_csv

    df = spark.createDataFrame(
        [(1, "first\nsecond line"), (2, "plain")], SCHEMA
    )
    path = str(tmp_path / "csv_ml")
    write_csv(df, path)
    ing = read_csv(spark, path, SCHEMA, multiline=True)
    got = {r["doc_id"]: r["text"] for r in ing.good.collect()}
    assert ing.n_quarantined == 0
    assert got[1] == "first\nsecond line"


def test_csv_lazy_path_and_schema_safety(spark, tmp_path):
    from d365fo_db_sync_spark.sources.textfiles import read_csv, write_csv

    df = spark.createDataFrame([(1, "a"), (2, "b")], SCHEMA)
    path = str(tmp_path / "csv_lazy")
    write_csv(df, path)
    before = len(SCHEMA.fields)
    lazy = read_csv(spark, path, SCHEMA, quarantine=False)
    assert lazy.columns == ["doc_id", "text"]
    assert lazy.count() == 2
    assert len(SCHEMA.fields) == before
    with pytest.raises(ValueError, match="_corrupt_record"):
        read_csv(
            spark, path, StructType([StructField(CORRUPT_COL, StringType())])
        )
