"""Expression-level Bloom filter contracts (operators/bloom.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from d365fo_db_sync_spark.operators import bloom, dedup
from d365fo_db_sync_spark.sinks import BucketedParquetTarget
from d365fo_db_sync_spark.suite import scratch_dir


@pytest.fixture(scope="module")
def keys(spark):
    return spark.range(0, 500).select(F.md5(F.col("id").cast("string")).alias("k"))


def test_no_false_negatives(spark, keys):
    bf = bloom.build(keys, "k", m_bits=1 << 14, k=5)
    n = keys.filter(bloom.might_contain(bf, "k")).count()
    assert n == 500  # every inserted key must test positive


def test_false_positive_rate_bounded(spark, keys):
    bf = bloom.build(keys, "k", m_bits=1 << 14, k=5)
    other = spark.range(10_000, 12_000).select(
        F.md5(F.col("id").cast("string")).alias("k")
    )
    fp = other.filter(bloom.might_contain(bf, "k")).count()
    # 500 keys in 16384 bits ≈ 32 bits/key -> fpp well under 1%;
    # allow 2% for hash-quality slack
    assert fp <= 40


def test_update_is_superset(spark, keys):
    bf = bloom.build(keys, "k", m_bits=1 << 14, k=5)
    extra = spark.range(5_000, 5_100).select(
        F.md5(F.col("id").cast("string")).alias("k")
    )
    bf2 = bloom.update(bf, extra, "k")
    assert extra.filter(bloom.might_contain(bf2, "k")).count() == 100
    assert keys.filter(bloom.might_contain(bf2, "k")).count() == 500
    # old positives stay positive (words only gain bits)
    for w_old, w_new in zip(bf.words, bf2.words):
        assert (w_old & ~w_new) == 0 or (w_old & 0xFFFFFFFFFFFFFFFF) & ~(
            w_new & 0xFFFFFFFFFFFFFFFF
        ) == 0


def test_membership_stays_codegen(spark, keys):
    bf = bloom.build(keys, "k", m_bits=1 << 10, k=3)
    plan = (
        keys.filter(bloom.might_contain(bf, "k"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def _mk_batch(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("doc_id"), F.md5(F.col("id").cast("string")).alias("fp")
    )


def test_ingest_batch_with_bloom_matches_without(spark):
    work_a, work_b = scratch_dir("bloom_a_"), scratch_dir("bloom_b_")
    idx_a = BucketedParquetTarget(work_a + "/idx", key="fp", n_buckets=8)
    idx_b = BucketedParquetTarget(work_b + "/idx", key="fp", n_buckets=8)

    b1 = _mk_batch(spark, 0, 300)
    b2 = _mk_batch(spark, 200, 500)  # 100 overlap with b1

    # seed both indexes identically, then build the bloom over the index
    dedup.ingest_batch(spark, b1, idx_a)
    dedup.ingest_batch(spark, b1, idx_b)
    bf = bloom.build(idx_b.read(spark), "fp", m_bits=1 << 14, k=5)

    plain = {r["doc_id"] for r in dedup.ingest_batch(spark, b2, idx_a).collect()}
    with_bloom = {
        r["doc_id"]
        for r in dedup.ingest_batch(spark, b2, idx_b, bloom=bf).collect()
    }
    assert with_bloom == plain == set(range(300, 500))
    # both indexes converged to the same key set
    assert idx_a.read(spark).count() == idx_b.read(spark).count() == 500


def test_ingest_batch_bloom_replay_is_noop(spark):
    work = scratch_dir("bloom_r_")
    idx = BucketedParquetTarget(work + "/idx", key="fp", n_buckets=8)
    b1 = _mk_batch(spark, 0, 300)
    dedup.ingest_batch(spark, b1, idx)
    bf = bloom.build(idx.read(spark), "fp", m_bits=1 << 14, k=5)
    replay = dedup.ingest_batch(spark, b1, idx, bloom=bf)
    assert replay.count() == 0
    assert idx.read(spark).count() == 300
