"""Merge-on-read key tombstones on the manifest sink: O(batch)
metadata delete commits, masked reads everywhere, retirement on
rewrite, time-travel and export semantics."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from d365fo_db_sync_spark.sinks import ManifestParquetTarget


def _table(spark, n=1000):
    return spark.range(n).select(
        F.col("id").alias("RecId"),
        (F.col("id") * 2).alias("SysRowVersion"),
        (F.col("id") % 9).cast("double").alias("amount"),
    )


def _keys(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], "RecId long")


def test_mor_delete_is_metadata_only_and_masks_everywhere(spark, tmp_path):
    t = ManifestParquetTarget(str(tmp_path / "t"), key="RecId", n_buckets=4)
    t.overwrite(_table(spark))
    before = t._load_manifest()
    dead = list(range(0, 1000, 97))

    assert t.delete_keys_mor(spark, _keys(spark, dead)) == len(dead)

    after = t._load_manifest()
    assert after["buckets"] == before["buckets"]  # zero data files touched
    ver = os.path.dirname(after["tombstones"][0]["path"])
    assert sorted(os.listdir(ver)) == ["_manifest.json", "tombstones"]

    live = {r["RecId"] for r in t.read(spark).collect()}
    assert live == {k for k in range(1000) if k not in set(dead)}
    assert t.num_rows() == 1000 - len(dead)
    # probe and scan_range are masked too
    probed = t.probe(spark, _keys(spark, [97, 98]))
    assert {r["RecId"] for r in probed.collect() if r["RecId"] in (97, 98)} == {98}
    assert sorted(
        r["RecId"] for r in t.scan_range(spark, 96, 99).collect()
    ) == [96, 98, 99]

    # re-deleting the same keys (or absent keys) is a no-op commit
    assert t.delete_keys_mor(spark, _keys(spark, dead)) == 0
    assert t.delete_keys_mor(spark, _keys(spark, [10 ** 9])) == 0


def test_rewrite_retires_tombstones(spark, tmp_path):
    """compact() reads masked data and fully rewrites every bucket, so
    the tombstones retire in the same commit; rows stay identical and
    num_rows stays exact."""
    t = ManifestParquetTarget(str(tmp_path / "t"), key="RecId", n_buckets=4)
    t.overwrite(_table(spark, n=500))
    t.delete_keys_mor(spark, _keys(spark, [5, 6, 7]))
    want = sorted(r["RecId"] for r in t.read(spark).collect())

    assert t.compact(spark, cluster_by_key=True, target_rows_per_file=100) == 4
    m = t._load_manifest()
    assert "tombstones" not in m or not m["tombstones"]
    assert sorted(r["RecId"] for r in t.read(spark).collect()) == want
    assert t.num_rows() == 497


def test_partial_rewrite_keeps_untouched_bucket_tombstones(spark, tmp_path):
    """A merge that rewrites SOME buckets retires only their tombstone
    keys; keys in untouched buckets stay masked — and appended new
    rows never collide with them (append is new-keys-only)."""
    t = ManifestParquetTarget(str(tmp_path / "t"), key="RecId", n_buckets=8)
    t.overwrite(_table(spark, n=800))
    dead = list(range(0, 800, 53))
    t.delete_keys_mor(spark, _keys(spark, dead))
    n_before = t.num_rows()

    fresh = spark.createDataFrame(
        [(9001, 1, 0.0), (9002, 1, 0.0)],
        "RecId long, SysRowVersion long, amount double",
    )
    t.append_rows(spark, fresh)
    assert t.num_rows() == n_before + 2
    live = {r["RecId"] for r in t.read(spark).collect()}
    assert 9001 in live and 9002 in live
    assert not (set(dead) & live)

    # targeted rewrite of the buckets holding two of the dead keys
    # via merge: those keys' rows vanish physically, entries retire,
    # other buckets' tombstones persist
    upserts = spark.createDataFrame(
        [(53, 106, 1.0)], "RecId long, SysRowVersion long, amount double"
    )
    t.merge(spark, upserts)
    live2 = {r["RecId"] for r in t.read(spark).collect()}
    assert 53 in live2  # the upsert re-inserted key 53
    assert not ((set(dead) - {53}) & live2)  # everyone else stays dead
    m = t._load_manifest()
    remaining = sum(e["rows"] for e in m.get("tombstones", []))
    assert remaining < len(dead)  # some entries retired with the rewrite


def test_time_travel_and_export_keep_tombstone_semantics(spark, tmp_path):
    t = ManifestParquetTarget(
        str(tmp_path / "t"), key="RecId", n_buckets=2, retain_versions=4
    )
    t.overwrite(_table(spark, n=100))
    v0 = os.path.basename(t.current_path())
    t.delete_keys_mor(spark, _keys(spark, [1, 2, 3]))
    v1 = os.path.basename(t.current_path())

    # the pre-delete version still reads the full table
    assert t.read_version(spark, v0).count() == 100
    assert t.read_version(spark, v1).count() == 97

    exported = t.export_version(v1, str(tmp_path / "exp"))
    got = {r["RecId"] for r in exported.read(spark).collect()}
    assert len(got) == 97 and not ({1, 2, 3} & got)
    assert exported.num_rows() == 97


def test_mor_lifecycle_model_check(spark, tmp_path):
    """Deterministic pseudo-random interleavings of MOR deletes,
    appends of fresh keys, and compactions against a plain Python set
    model: after every operation the live key set and num_rows match
    the model exactly. (A fixed xorshift stream keeps the scenario
    reproducible — suite rules ban wall-clock randomness.)"""
    def xorshift(seed):
        x = seed
        while True:
            x ^= (x << 13) & 0xFFFFFFFF
            x ^= x >> 17
            x ^= (x << 5) & 0xFFFFFFFF
            yield x

    for seed in (0xDEADBEEF, 0x12345678):
        rng = xorshift(seed)
        t = ManifestParquetTarget(
            str(tmp_path / f"m{seed}"), key="RecId", n_buckets=4
        )
        t.overwrite(_table(spark, n=200))
        model = set(range(200))
        next_new = 10_000
        for step in range(6):
            op = next(rng) % 3
            if op == 0 and model:  # delete a pseudo-random slice
                victims = [k for k in sorted(model) if (k + next(rng)) % 7 == 0][:20]
                got = t.delete_keys_mor(spark, _keys(spark, victims + [999_999]))
                assert got == len(victims), (seed, step)
                model -= set(victims)
            elif op == 1:  # append fresh keys
                fresh = [(next_new + i, 1, 0.0) for i in range(15)]
                next_new += 15
                t.append_rows(
                    spark,
                    spark.createDataFrame(
                        fresh, "RecId long, SysRowVersion long, amount double"
                    ),
                )
                model |= {r[0] for r in fresh}
            else:  # compact materializes tombstones
                t.compact(spark, cluster_by_key=True, target_rows_per_file=64)
                m = t._load_manifest()
                assert not m.get("tombstones"), (seed, step)
            live = {r["RecId"] for r in t.read(spark).collect()}
            assert live == model, (seed, step, len(live), len(model))
            assert t.num_rows() == len(model), (seed, step)
