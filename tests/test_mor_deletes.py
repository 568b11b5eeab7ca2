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


def test_overwrite_retires_every_tombstone(spark, tmp_path):
    """A full-table overwrite drops every prior file, so NO tombstone
    has anything left to mask — all of them retire, even for keys
    hashing to buckets the new data leaves empty. A later append of a
    previously-tombstoned key must be visible (the r7-advice row-loss
    bug: stale global tombstones silently masked re-inserts)."""
    t = ManifestParquetTarget(str(tmp_path / "t"), key="RecId", n_buckets=8)
    t.overwrite(_table(spark, n=400))
    dead = list(range(0, 400, 31))
    t.delete_keys_mor(spark, _keys(spark, dead))

    # new data: a handful of keys, leaving most of the 8 buckets empty
    t.overwrite(
        spark.createDataFrame(
            [(1, 1, 0.0), (2, 1, 0.0)],
            "RecId long, SysRowVersion long, amount double",
        )
    )
    m = t._load_manifest()
    assert not m.get("tombstones")
    assert t.num_rows() == 2

    # re-insert a key that was tombstoned before the overwrite and
    # hashes to a bucket the overwrite left EMPTY — it must be live
    victim = next(k for k in dead if k > 2)
    t.append_rows(
        spark,
        spark.createDataFrame(
            [(victim, 1, 0.0)], "RecId long, SysRowVersion long, amount double"
        ),
    )
    live = {r["RecId"] for r in t.read(spark).collect()}
    assert live == {1, 2, victim}
    assert t.num_rows() == 3


def test_merge_that_empties_a_bucket_retires_its_tombstones(spark, tmp_path):
    """A merge whose deletes empty a bucket stages no files for it, but
    the bucket's prior files are still replaced — its tombstones retire
    (the staged_buckets proxy missed this: no staged dir, no retire)."""
    t = ManifestParquetTarget(str(tmp_path / "t"), key="RecId", n_buckets=4)
    t.overwrite(_table(spark, n=64))
    # tombstone one key, then merge-delete EVERY key of its bucket so
    # the bucket rewrites to empty (no staged files for it)
    t.delete_keys_mor(spark, _keys(spark, [7]))
    b7 = _keys(spark, [7]).select(t._bucket_of(F.col("RecId")).alias("b")).first()["b"]
    doomed_ids = [
        r["RecId"]
        for r in _table(spark, n=64)
        .select("RecId", t._bucket_of(F.col("RecId")).alias("b"))
        .filter(F.col("b") == b7)
        .collect()
    ]
    empty_up = spark.createDataFrame(
        [], "RecId long, SysRowVersion long, amount double"
    )
    t.merge(spark, empty_up, doomed_keys=_keys(spark, doomed_ids))
    m = t._load_manifest()
    assert not m.get("tombstones")
    assert t.num_rows() == 64 - len(doomed_ids)
    # the once-tombstoned key re-inserts cleanly
    t.append_rows(
        spark,
        spark.createDataFrame(
            [(7, 1, 0.0)], "RecId long, SysRowVersion long, amount double"
        ),
    )
    assert 7 in {r["RecId"] for r in t.read(spark).collect()}


def test_delete_range_retires_and_counts_tombstones_exactly(spark, tmp_path):
    """delete_range over a table with tombstones: entries for keys in
    [lo, hi] or resident in rewritten boundary files retire in the
    same commit, deleted_rows reports only NEWLY deleted (logically
    live) rows, and num_rows stays exact (the r7-advice
    double-subtraction bug)."""
    t = ManifestParquetTarget(str(tmp_path / "t"), key="RecId", n_buckets=4)
    t.overwrite(_table(spark, n=500))
    # cluster so delete_range gets real drops + boundary rewrites
    t.compact(spark, cluster_by_key=True, target_rows_per_file=50)
    dead = [100, 150, 260, 444]  # two in the coming range, two outside
    t.delete_keys_mor(spark, _keys(spark, dead))
    assert t.num_rows() == 496

    got = t.delete_range(spark, 120, 300)
    # live rows in [120, 300]: 181 keys minus the 2 tombstoned (150, 260)
    assert got["deleted_rows"] == 181 - 2
    assert t.num_rows() == 496 - (181 - 2)
    live = {r["RecId"] for r in t.read(spark).collect()}
    assert live == set(range(500)) - set(range(120, 301)) - set(dead)

    # tombstones for in-range keys retired; out-of-range keys' entries
    # survive only if their rows still physically exist
    m = t._load_manifest()
    remaining = sum(e["rows"] for e in m.get("tombstones", []))
    assert remaining <= 2  # at most the out-of-range pair (100, 444)
    assert t.num_rows() == len(live)

    # a retired key re-inserts cleanly (no stale mask)
    t.append_rows(
        spark,
        spark.createDataFrame(
            [(150, 1, 0.0)], "RecId long, SysRowVersion long, amount double"
        ),
    )
    assert 150 in {r["RecId"] for r in t.read(spark).collect()}


def test_replace_range_over_tombstones_is_exact(spark, tmp_path):
    t = ManifestParquetTarget(str(tmp_path / "t"), key="RecId", n_buckets=4)
    t.overwrite(_table(spark, n=200))
    t.compact(spark, cluster_by_key=True, target_rows_per_file=25)
    t.delete_keys_mor(spark, _keys(spark, [50, 60, 199]))
    assert t.num_rows() == 197

    rows = spark.createDataFrame(
        [(55, 1, 9.9), (60, 1, 9.9)],
        "RecId long, SysRowVersion long, amount double",
    )
    got = t.replace_range(spark, 40, 80, rows)
    # live rows in [40, 80]: 41 keys minus tombstoned 50 and 60
    assert got["deleted_rows"] == 41 - 2
    assert got["inserted_rows"] == 2
    live = {r["RecId"] for r in t.read(spark).collect()}
    want = (set(range(200)) - set(range(40, 81)) - {199}) | {55, 60}
    assert live == want
    assert t.num_rows() == len(want)


def test_bloom_publish_with_tombstone_consolidation(spark, tmp_path):
    """bloom_cols + a publish that consolidates surviving tombstones
    into staged/tombstones: the bloom pass must read the explicit
    staged bucket files, not the staged dir (hive __kb_bucket=N dirs
    mixed with the unpartitioned tombstones dir make directory-level
    partition discovery raise 'Conflicting directory structures')."""
    t = ManifestParquetTarget(
        str(tmp_path / "t"), key="RecId", n_buckets=4, bloom_cols=["RecId"]
    )
    t.overwrite(_table(spark, n=400))
    dead = list(range(0, 400, 29))  # spread across all buckets
    t.delete_keys_mor(spark, _keys(spark, dead))

    # merge one key: its bucket rewrites (retiring that bucket's
    # entries), the rest consolidate -> staged/tombstones is written in
    # the SAME version dir the bloom pass reads back
    up = spark.createDataFrame(
        [(29, 58, 1.0)], "RecId long, SysRowVersion long, amount double"
    )
    t.merge(spark, up)  # raised Conflicting directory structures before the fix
    m = t._load_manifest()
    assert m.get("tombstones")  # survivors consolidated, not dropped
    live = {r["RecId"] for r in t.read(spark).collect()}
    assert 29 in live and not ((set(dead) - {29}) & live)
    # bloom point-lookup still exact after the mixed-layout publish
    got = {r["RecId"] for r in t.probe_value(spark, "RecId", 29).collect()}
    assert got == {29}
    assert t.probe_value(spark, "RecId", 58).count() == 0  # tombstoned


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
        for step in range(8):
            op = next(rng) % 5
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
            elif op == 2:  # compact materializes tombstones
                t.compact(spark, cluster_by_key=True, target_rows_per_file=64)
                m = t._load_manifest()
                assert not m.get("tombstones"), (seed, step)
            elif op == 3 and model:  # range delete over live + tombstoned
                lo = sorted(model)[next(rng) % len(model)]
                hi = lo + 40
                got = t.delete_range(spark, lo, hi)
                want_gone = {k for k in model if lo <= k <= hi}
                assert got["deleted_rows"] == len(want_gone), (seed, step)
                model -= want_gone
            else:  # full overwrite retires every tombstone
                keep = sorted(model)[: max(1, len(model) // 2)]
                t.overwrite(
                    spark.createDataFrame(
                        [(k, 1, 0.0) for k in keep],
                        "RecId long, SysRowVersion long, amount double",
                    )
                )
                assert not t._load_manifest().get("tombstones"), (seed, step)
                model = set(keep)
            live = {r["RecId"] for r in t.read(spark).collect()}
            assert live == model, (seed, step, len(live), len(model))
            assert t.num_rows() == len(model), (seed, step)
