"""operators/recordshard.py — record-shard export physics: blobs are
the in-order concatenation of their records, the manifest addresses
every byte, read-back is byte-exact, and append opens a fresh shard
range without touching published blobs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from d365fo_db_sync_spark.operators import recordshard
from d365fo_db_sync_spark.suite import scratch_dir


@pytest.fixture(scope="module")
def assets(spark):
    rows = [
        (i, "image", bytearray(bytes([i % 251]) * (50 + 13 * (i % 7))), {})
        for i in range(40)
    ]
    return spark.createDataFrame(
        rows,
        "asset_id long, media_type string, content binary, "
        "meta map<string,string>",
    )


def _contents(df):
    return {r["asset_id"]: bytes(r["content"]) for r in df.collect()}


def test_roundtrip_byte_exact(spark, assets):
    root = f"{scratch_dir('rs_t1_')}/rs"
    assigned = recordshard.record_shard_assignments(assets, shard_bytes=400)
    recordshard.write_record_shards(assets, assigned, root)
    back = _contents(recordshard.read_record_assets(spark, root))
    want = _contents(assets)
    assert back == want


def test_blob_is_inorder_concat_and_manifest_addresses_all(spark, assets):
    root = f"{scratch_dir('rs_t2_')}/rs"
    assigned = recordshard.record_shard_assignments(assets, shard_bytes=400)
    recordshard.write_record_shards(assets, assigned, root)
    man = spark.read.parquet(f"{root}/manifest").collect()
    blobs = {
        r["shard"]: bytes(r["blob"])
        for r in spark.read.parquet(f"{root}/blobs").collect()
    }
    # per shard: offsets tile the blob exactly (no gaps, no overlap)
    by_shard: dict[int, list] = {}
    for r in man:
        by_shard.setdefault(r["shard"], []).append((r["offset"], r["n_bytes"]))
    for shard, spans in by_shard.items():
        spans.sort()
        pos = 0
        for off, n in spans:
            assert off == pos
            pos += n
        assert pos == len(blobs[shard])
    # records never split: every record's bytes are contiguous in ONE blob
    want = _contents(assets)
    for r in man:
        blob = blobs[r["shard"]]
        assert blob[r["offset"] : r["offset"] + r["n_bytes"]] == want[r["asset_id"]]


def test_append_opens_fresh_range_and_is_byte_immutable(spark, assets):
    root = f"{scratch_dir('rs_t3_')}/rs"
    base = assets.filter(F.col("asset_id") < 30)
    late = assets.filter(F.col("asset_id") >= 30)
    assigned = recordshard.record_shard_assignments(base, shard_bytes=400)
    recordshard.write_record_shards(base, assigned, root)
    before = {
        r["shard"]: bytes(r["blob"])
        for r in spark.read.parquet(f"{root}/blobs").collect()
    }
    first_new = recordshard.append_record_shards(
        spark, root, late, shard_bytes=400
    )
    assert first_new == max(before) + 1
    after = {
        r["shard"]: bytes(r["blob"])
        for r in spark.read.parquet(f"{root}/blobs").collect()
    }
    # published blobs byte-identical; new shards strictly above the range
    for shard, blob in before.items():
        assert after[shard] == blob
    assert all(s >= first_new for s in set(after) - set(before))
    # the combined corpus reads back byte-exact
    back = _contents(recordshard.read_record_assets(spark, root))
    assert back == _contents(assets)


def test_zero_byte_payloads_excluded(spark):
    df = spark.createDataFrame(
        [(1, "image", bytearray(b"xy"), {}), (2, "image", bytearray(b""), {})],
        "asset_id long, media_type string, content binary, "
        "meta map<string,string>",
    )
    assigned = recordshard.record_shard_assignments(df, shard_bytes=100)
    assert [r["asset_id"] for r in assigned.collect()] == [1]


def test_shard_bytes_cap_validated(spark):
    """r15: a shard blob is ONE parquet binary cell held whole in task
    memory — budgets outside [1, MAX_SHARD_BYTES] must fail loudly at
    assignment time, not at write/read time against the 2 GiB cap."""
    df = spark.createDataFrame(
        [(1, "image", bytearray(b"xy"), {})],
        "asset_id long, media_type string, content binary, "
        "meta map<string,string>",
    )
    with pytest.raises(ValueError, match="shard_bytes"):
        recordshard.record_shard_assignments(
            df, shard_bytes=recordshard.MAX_SHARD_BYTES + 1
        )
    with pytest.raises(ValueError, match="shard_bytes"):
        recordshard.record_shard_assignments(df, shard_bytes=0)
    # the boundary itself is legal
    recordshard.record_shard_assignments(
        df, shard_bytes=recordshard.MAX_SHARD_BYTES
    )
