"""ManifestParquetTarget — the object-store-native bucketed sink:
carry-forward by manifest REFERENCE (no hardlinks), reference-walking
GC, exact file-list bucket pruning."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from d365fo_db_sync_spark.sinks import ManifestParquetTarget


def _base(spark, n=2000):
    return spark.range(0, n).select(
        F.col("id").alias("RecId"),
        (F.col("id") * 2).alias("SysRowVersion"),
        (F.col("id") * 1.5).alias("amount"),
    )


def _batch(spark):
    """Updates for keys 0..3 plus inserts 9000..9001 — six keys, so at
    most six affected buckets."""
    ups = spark.range(0, 4).select(
        F.col("id").alias("RecId"),
        (F.col("id") * 2 + 1000).alias("SysRowVersion"),
        F.lit(9.9).alias("amount"),
    )
    ins = spark.range(9000, 9002).select(
        F.col("id").alias("RecId"),
        (F.col("id") * 2).alias("SysRowVersion"),
        F.lit(1.1).alias("amount"),
    )
    return ups.unionByName(ins)


def test_merge_matches_logical_rewrite(spark, tmp_path):
    t = ManifestParquetTarget(str(tmp_path / "t"), key="RecId", n_buckets=16)
    base = _base(spark)
    t.overwrite(base)
    doomed = spark.createDataFrame([(5,), (2,)], "RecId long")
    n_rewritten = t.merge(spark, _batch(spark), doomed_keys=doomed)
    assert 0 < n_rewritten <= 16

    # contract (same as BucketedParquetTarget): doomed keys are dropped
    # from the old state, then upserts replace-or-insert — a key both
    # doomed and upserted keeps its upsert row (upsert wins)
    changed = _batch(spark).select("RecId").unionByName(doomed)
    expected = base.join(changed, on="RecId", how="left_anti").unionByName(
        _batch(spark)
    )
    got = sorted(map(tuple, t.read(spark).collect()))
    want = sorted(map(tuple, expected.collect()))
    assert got == want
    assert t.num_rows() == len(want)


def test_untouched_buckets_carry_forward_by_reference(spark, tmp_path):
    t = ManifestParquetTarget(str(tmp_path / "t"), key="RecId", n_buckets=64)
    t.overwrite(_base(spark))
    v0 = t.current_path()
    t.merge(spark, _batch(spark))
    v1 = t.current_path()
    assert v1 != v0

    m = t._load_manifest()
    locations = {
        b: {os.path.dirname(os.path.dirname(f)) for f in fs}
        for b, fs in m["buckets"].items()
        if fs
    }
    in_old = [b for b, dirs in locations.items() if dirs == {v0}]
    in_new = [b for b, dirs in locations.items() if dirs == {v1}]
    # most buckets must still point INTO THE OLD VERSION (metadata-only
    # carry-forward, zero data copied), only the affected few are new
    assert len(in_new) >= 1
    assert len(in_old) > len(in_new)
    assert len(in_old) + len(in_new) == len(locations)
    # and the old version's referenced files still exist (not GC'd)
    assert os.path.isdir(v0)


def test_vacuum_unreferenced_keeps_referenced_versions(spark, tmp_path):
    t = ManifestParquetTarget(str(tmp_path / "t"), key="RecId", n_buckets=16)
    t.overwrite(_base(spark))
    v0 = t.current_path()
    t.merge(spark, _batch(spark))  # v1 references v0
    removed = t.vacuum_unreferenced()
    assert removed == []  # v0 still referenced by the live manifest
    before = sorted(map(tuple, t.read(spark).collect()))

    t.overwrite(_base(spark, n=50))  # full rewrite: nothing references v0/v1
    # publish auto-vacuums, so the orphaned versions are ALREADY gone
    assert not os.path.exists(v0)
    assert t.vacuum_unreferenced() == []
    assert t.num_rows() == 50
    assert len(sorted(map(tuple, t.read(spark).collect()))) == 50
    assert before  # sanity: pre-vacuum read had worked


def test_vacuum_spares_fresh_unpublished_staging(spark, tmp_path):
    """A v_* dir that never made the version log / pointer is a
    concurrent writer's in-flight staging (or a conflict's leftovers):
    vacuum must skip it until it ages past _STAGING_TTL, else
    post-publish GC can delete files another writer is about to
    publish a manifest against."""
    import json
    import time

    t = ManifestParquetTarget(str(tmp_path / "t"), key="RecId", n_buckets=8)
    t.overwrite(_base(spark, 50))
    # fake another writer's staging: unpublished dir with a manifest
    staged = os.path.join(t.root, "v_deadbeef0001")
    os.makedirs(staged)
    with open(os.path.join(staged, t.MANIFEST), "w", encoding="utf-8") as f:
        json.dump({"schema": "{}", "buckets": {}, "stats": {}}, f)

    assert t.vacuum_unreferenced() == []  # fresh -> spared
    t.merge(spark, _batch(spark))  # publish auto-vacuums -> still spared
    assert os.path.isdir(staged)

    # age the TOP dir past the horizon but leave a fresh file deep
    # inside (a long Spark stage writes into subdirs without touching
    # the top-level mtime): still alive, must be spared
    old = time.time() - (t._STAGING_TTL + 10)
    os.utime(staged, (old, old))
    sub = os.path.join(staged, "_temporary")
    os.makedirs(sub)
    with open(os.path.join(sub, "part-0"), "w", encoding="utf-8"):
        pass
    os.utime(sub, (old, old))  # subdir old too; only the FILE is fresh
    assert t.vacuum_unreferenced() == []
    assert os.path.isdir(staged)

    # age everything: now it's abandoned garbage, collected
    for root, dirs, files in os.walk(staged):
        for name in dirs + files:
            os.utime(os.path.join(root, name), (old, old))
    os.utime(staged, (old, old))
    assert t.vacuum_unreferenced() == [os.path.abspath(staged)]
    assert not os.path.exists(staged)


def test_vacuum_still_collects_published_orphans_immediately(spark, tmp_path):
    """PUBLISHED versions that age out of the retention window are
    GC'd without any TTL wait — OCC (expected_parent) protects writers
    that derived from them, so there is nothing to grace-period."""
    t = ManifestParquetTarget(str(tmp_path / "t"), key="RecId", n_buckets=8)
    t.overwrite(_base(spark, 50))
    v0 = t.current_path()
    t.overwrite(_base(spark, 60))  # full rewrite: v0 unreferenced
    assert not os.path.exists(v0)  # auto-vacuum took it at once


def test_export_version_refuses_live_dest(spark, tmp_path):
    t = ManifestParquetTarget(str(tmp_path / "t"), key="RecId", n_buckets=4)
    t.overwrite(_base(spark, 20))
    name = os.path.basename(t.current_path())
    other = ManifestParquetTarget(str(tmp_path / "o"), key="RecId", n_buckets=4)
    other.overwrite(_base(spark, 5))
    before = sorted(map(tuple, other.read(spark).collect()))
    with pytest.raises(FileExistsError, match="already hosts a live table"):
        t.export_version(name, str(tmp_path / "o"))
    # the existing table is untouched
    assert sorted(map(tuple, other.read(spark).collect())) == before
    # a fresh root still works
    exp = t.export_version(name, str(tmp_path / "fresh"))
    assert exp.read(spark).count() == 20


def test_bucket_emptied_by_deletes_drops_its_entry(spark, tmp_path):
    t = ManifestParquetTarget(str(tmp_path / "t"), key="RecId", n_buckets=4)
    small = spark.createDataFrame(
        [(1, 10, 1.0), (2, 20, 2.0), (3, 30, 3.0)],
        "RecId long, SysRowVersion long, amount double",
    )
    t.overwrite(small)
    # delete EVERY row (all buckets affected, no upserts survive)
    doomed = small.select("RecId")
    empty_ups = small.limit(0)
    t.merge(spark, empty_ups, doomed_keys=doomed)
    assert t.num_rows() == 0
    assert t.read(spark).count() == 0  # empty read keeps the schema
    assert t.read(spark).columns == ["RecId", "SysRowVersion", "amount"]


def test_replay_idempotent_with_sync_engine(spark, tmp_path):
    """The engine's CDC merge path accepts the manifest target
    transparently (isinstance BucketedParquetTarget) and replays are
    metadata no-ops on the final state."""
    from d365fo_db_sync_spark.state import StateStore
    from d365fo_db_sync_spark.sync import SyncConfig, SyncEngine

    engine = SyncEngine(
        spark, StateStore(str(tmp_path / "s.json")), SyncConfig()
    )
    t = ManifestParquetTarget(str(tmp_path / "t"), key="RecId", n_buckets=8)
    t.overwrite(_base(spark, n=500))
    batch = spark.createDataFrame(
        [(1, 5000, 7.7, False), (499, 5001, 8.8, False), (10, None, None, True)],
        "RecId long, SysRowVersion long, amount double, __deleted boolean",
    )
    r1 = engine.merge_upsert("m", batch, t)
    state1 = sorted(map(tuple, t.read(spark).collect()))
    r2 = engine.merge_upsert("m", batch, t)  # replay
    state2 = sorted(map(tuple, t.read(spark).collect()))
    assert state1 == state2
    assert r1.mode == r2.mode == "INCREMENTAL"
    keys = {row[0] for row in state1}
    assert 10 not in keys and 1 in keys and 499 in keys
    assert t.num_rows() == 499


def test_base_vacuum_is_safe_on_manifest_target(spark, tmp_path):
    """The inherited ParquetTarget.vacuum contract ('delete every
    non-live version') would destroy carried-forward data on a manifest
    target — the override must keep referenced versions alive."""
    t = ManifestParquetTarget(str(tmp_path / "t"), key="RecId", n_buckets=64)
    t.overwrite(_base(spark))
    v0 = t.current_path()
    t.merge(spark, _batch(spark))  # live manifest references v0
    assert t.vacuum() == []  # the UNSAFE base behavior would remove v0
    assert os.path.isdir(v0)
    assert t.read(spark).count() == t.num_rows() > 0


def test_random_merge_sequence_matches_model(spark, tmp_path):
    """Five randomized CDC batches (upserts + deletes, fixed seed)
    applied through the manifest merge must equal a plain dict model —
    the sequential-consistency check across version chains, GC, and
    carried references."""
    import random

    rng = random.Random(42)
    t = ManifestParquetTarget(str(tmp_path / "t"), key="RecId", n_buckets=8)
    model: dict[int, tuple] = {}

    base_rows = [(k, k * 2, float(k)) for k in range(200)]
    model.update({k: (k, k * 2, float(k)) for k, *_ in [(r[0],) for r in base_rows]})
    model = {r[0]: r for r in base_rows}
    t.overwrite(
        spark.createDataFrame(base_rows, "RecId long, SysRowVersion long, amount double")
    )

    for step in range(5):
        ups = {
            k: (k, 10_000 + step * 100 + k, rng.random())
            for k in rng.sample(range(400), 12)
        }
        dead = set(rng.sample(range(250), 6))
        up_df = spark.createDataFrame(
            list(ups.values()), "RecId long, SysRowVersion long, amount double"
        )
        dead_df = spark.createDataFrame([(k,) for k in dead], "RecId long")
        t.merge(spark, up_df, doomed_keys=dead_df)
        for k in dead:
            model.pop(k, None)
        model.update(ups)  # upsert wins over a same-batch delete

    got = sorted(map(tuple, t.read(spark).collect()))
    want = sorted(model.values())
    assert got == want
    assert t.num_rows() == len(want)


# ----------------------------------------------------------- time travel


def test_time_travel_reads_exact_prior_snapshot(spark, tmp_path):
    t = ManifestParquetTarget(
        str(tmp_path / "tt"), key="RecId", n_buckets=8, retain_versions=3
    )
    t.overwrite(_base(spark, 100))
    v1 = t.versions()[-1]
    snap1 = {(r["RecId"], r["SysRowVersion"]) for r in t.read(spark).collect()}
    t.merge(spark, _batch(spark))
    v2 = t.versions()[-1]
    assert v1 != v2
    # live read moved on; the pinned version still reads the old state
    live = {(r["RecId"], r["SysRowVersion"]) for r in t.read(spark).collect()}
    old = {(r["RecId"], r["SysRowVersion"]) for r in t.read_version(spark, v1).collect()}
    assert old == snap1 and live != snap1
    # the live version name resolves to the live state
    assert {
        (r["RecId"], r["SysRowVersion"]) for r in t.read_version(spark, v2).collect()
    } == live


def test_retention_window_bounds_history(spark, tmp_path):
    t = ManifestParquetTarget(
        str(tmp_path / "ret"), key="RecId", n_buckets=8, retain_versions=2
    )
    t.overwrite(_base(spark, 50))
    names = [t.versions()[-1]]
    for start in (9100, 9200, 9300):
        ins = spark.range(start, start + 2).select(
            F.col("id").alias("RecId"),
            (F.col("id") * 2).alias("SysRowVersion"),
            F.lit(0.5).alias("amount"),
        )
        t.merge(spark, ins)
        names.append(t.versions()[-1])
    # only the last two publishes survive GC
    assert t.versions() == names[-2:]
    with pytest.raises(FileNotFoundError):
        t.read_version(spark, names[0])
    # and the retained prior version is still fully readable (its
    # carried references were protected from the reference walk)
    assert t.read_version(spark, names[-2]).count() == 50 + 2 * 2


def test_default_retention_keeps_live_only(spark, tmp_path):
    t = ManifestParquetTarget(str(tmp_path / "one"), key="RecId", n_buckets=8)
    t.overwrite(_base(spark, 50))
    t.merge(spark, _batch(spark))
    assert len(t.versions()) == 1  # prior version GC'd at publish
    with pytest.raises(ValueError):
        ManifestParquetTarget(str(tmp_path / "bad"), key="RecId", retain_versions=0)


# ------------------------------------------------------ zone-map skipping


def test_scan_range_skips_files_and_stays_exact(spark, tmp_path):
    t = ManifestParquetTarget(str(tmp_path / "zm"), key="RecId", n_buckets=64)
    t.overwrite(_base(spark, 2000))  # keys 0..1999
    ins = spark.range(9000, 9006).select(
        F.col("id").alias("RecId"),
        (F.col("id") * 2).alias("SysRowVersion"),
        F.lit(1.1).alias("amount"),
    )
    t.merge(spark, ins)

    m = t._load_manifest()
    all_files = [f for fs in m["buckets"].values() for f in fs]
    assert all(f in m["stats"] and "min" in m["stats"][f] for f in all_files)

    # a scan over the inserted range must skip every carried-forward
    # file whose zone map tops out below 9000
    got = sorted(r["RecId"] for r in t.scan_range(spark, 9000, 9100).collect())
    assert got == list(range(9000, 9006))
    skippable = [f for f in all_files if m["stats"][f]["max"] < 9000]
    assert skippable  # untouched buckets carried forward with old maxima

    # and a mid-range scan is row-exact against the brute-force filter
    want = sorted(
        r["RecId"] for r in t.read(spark).filter("RecId BETWEEN 500 AND 600").collect()
    )
    assert sorted(r["RecId"] for r in t.scan_range(spark, 500, 600).collect()) == want


def test_scan_range_conservative_without_stats(spark, tmp_path):
    t = ManifestParquetTarget(str(tmp_path / "nostats"), key="RecId", n_buckets=4)
    t.overwrite(_base(spark, 100))
    # simulate a pre-zone-map manifest: strip the stats block in place
    import json

    live = t.current_path()
    mp = f"{live}/_manifest.json"
    with open(mp) as f:
        raw = json.load(f)
    raw.pop("stats", None)
    with open(mp, "w") as f:
        json.dump(raw, f)
    got = sorted(r["RecId"] for r in t.scan_range(spark, 10, 20).collect())
    assert got == list(range(10, 21))  # every file scanned, rows exact


def test_publish_heals_a_lost_log_entry(spark, tmp_path):
    import os

    t = ManifestParquetTarget(
        str(tmp_path / "heal"), key="RecId", n_buckets=8, retain_versions=3
    )
    t.overwrite(_base(spark, 40))
    t.merge(spark, _batch(spark))
    v2 = t.versions()[-1]
    # simulate the crash window: v2 published (pointer set) but its log
    # line lost
    log = os.path.join(t.root, t.VERSION_LOG)
    with open(log) as f:
        lines = [ln for ln in f if ln.strip() and ln.strip() != v2]
    with open(log, "w") as f:
        f.writelines(lines)
    assert t.versions()[-1] == v2  # repaired in-memory while live
    # the NEXT publish must heal the log durably, not lose v2 forever
    ins = spark.range(9500, 9502).select(
        F.col("id").alias("RecId"),
        (F.col("id") * 2).alias("SysRowVersion"),
        F.lit(0.1).alias("amount"),
    )
    t.merge(spark, ins)
    with open(log) as f:
        logged = [ln.strip() for ln in f if ln.strip()]
    assert v2 in logged
    assert v2 in t.versions()  # still readable inside the window


def test_scan_range_string_keys(spark, tmp_path):
    # zone maps must work for lexicographic string keys too (min/max
    # from footer stats are strings; overlap comparison is string order)
    t = ManifestParquetTarget(str(tmp_path / "strk"), key="k", n_buckets=4)
    df = spark.createDataFrame(
        [(f"key_{i:04d}", i) for i in range(500)], "k string, v long"
    )
    t.overwrite(df)
    got = sorted(r["k"] for r in t.scan_range(spark, "key_0100", "key_0110").collect())
    assert got == [f"key_{i:04d}" for i in range(100, 111)]


def test_versions_ignores_dangling_log_entry(spark, tmp_path):
    import os

    t = ManifestParquetTarget(str(tmp_path / "dang"), key="RecId", n_buckets=4)
    t.overwrite(_base(spark, 30))
    live = t.versions()[-1]
    # simulate a crash BEFORE the pointer swap in a legacy log-first
    # layout: a logged name whose directory/manifest never materialized
    with open(os.path.join(t.root, t.VERSION_LOG), "a") as f:
        f.write("v_neverpublished\n")
    assert t.versions() == [live]
    # and GC remains safe with the dangling entry present
    t.merge(spark, _batch(spark))
    assert t.read(spark).count() > 0


def test_compact_collapses_small_files_losslessly(spark, tmp_path):
    t = ManifestParquetTarget(str(tmp_path / "opt"), key="RecId", n_buckets=4)
    t.overwrite(_base(spark, 400))
    # three insert-only fast-path cycles accrete a file per touched
    # bucket each (append-by-reference: no existing bucket rewritten)
    for start in (9000, 9100, 9200):
        ins = spark.range(start, start + 40).select(
            F.col("id").alias("RecId"),
            (F.col("id") * 2).alias("SysRowVersion"),
            F.lit(2.5).alias("amount"),
        )
        t.append_rows(spark, ins)
    before = {(r["RecId"], r["SysRowVersion"]) for r in t.read(spark).collect()}
    m = t._load_manifest()
    assert any(len(fs) > 1 for fs in m["buckets"].values())  # small files exist

    n = t.compact(spark)
    assert n >= 1
    m2 = t._load_manifest()
    assert all(len(fs) <= 1 for fs in m2["buckets"].values())
    after = {(r["RecId"], r["SysRowVersion"]) for r in t.read(spark).collect()}
    assert after == before  # lossless
    # zone maps regenerated for the compacted files
    assert all(
        "min" in m2["stats"][f] for fs in m2["buckets"].values() for f in fs
    )
    # idempotent: nothing left to compact, no empty version published
    live = t.current_path()
    assert t.compact(spark) == 0
    assert t.current_path() == live

    with pytest.raises(ValueError):
        t.compact(spark, max_files_per_bucket=0)


def test_append_rows_never_rewrites_existing_buckets(spark, tmp_path):
    import os

    t = ManifestParquetTarget(str(tmp_path / "apnd"), key="RecId", n_buckets=4)
    t.overwrite(_base(spark, 200))
    m1 = t._load_manifest()
    old_files = {f for fs in m1["buckets"].values() for f in fs}
    mtimes = {f: os.stat(f).st_mtime_ns for f in old_files}

    ins = spark.range(9000, 9050).select(
        F.col("id").alias("RecId"),
        (F.col("id") * 2).alias("SysRowVersion"),
        F.lit(7.5).alias("amount"),
    )
    t.append_rows(spark, ins)

    m2 = t._load_manifest()
    new_files = {f for fs in m2["buckets"].values() for f in fs}
    # every old file carried forward byte-untouched, new files added
    assert old_files <= new_files
    for f in old_files:
        assert os.stat(f).st_mtime_ns == mtimes[f]
    # data = union, and the appended rows are probe-visible
    got = {r["RecId"] for r in t.read(spark).collect()}
    assert got == set(range(200)) | set(range(9000, 9050))
    # merge still works on top of the appended state
    t.merge(spark, _batch(spark))
    assert {r["RecId"] for r in t.read(spark).collect()} >= {9000, 9001}


class TestOptimisticConcurrency:
    """CAS-on-parent-version publish: a writer whose carried references
    were derived from a stale manifest must fail with
    ConcurrentWriteError, never clobber the interloper's commit."""

    def test_stale_parent_raises_and_preserves_live(self, spark, tmp_path):
        from d365fo_db_sync_spark.sinks import ConcurrentWriteError

        t = ManifestParquetTarget(str(tmp_path / "t"), key="RecId", n_buckets=8)
        t.overwrite(_base(spark, 100))
        v1 = os.path.basename(t.current_path())

        # interloper publishes on top of v1
        t.merge(spark, _batch(spark))
        v2 = os.path.basename(t.current_path())
        assert v2 != v1
        live_rows = {r["RecId"]: r["SysRowVersion"] for r in t.read(spark).collect()}

        # a writer still holding v1 as its parent must be rejected
        stale = spark.range(50, 52).select(
            F.col("id").alias("RecId"),
            F.lit(777).alias("SysRowVersion"),
            F.lit(0.0).alias("amount"),
        )
        with pytest.raises(ConcurrentWriteError, match="another writer"):
            t._write_version(stale, carried={}, expected_parent=v1)

        # the live table is exactly the interloper's commit, untouched
        assert t.current_path().endswith(v2)
        assert {
            r["RecId"]: r["SysRowVersion"] for r in t.read(spark).collect()
        } == live_rows

    def test_sequential_writers_pass_the_check(self, spark, tmp_path):
        t = ManifestParquetTarget(str(tmp_path / "t"), key="RecId", n_buckets=8)
        t.overwrite(_base(spark, 100))
        t.merge(spark, _batch(spark))  # parent captured + verified internally
        t.append_rows(
            spark,
            spark.range(9100, 9105).select(
                F.col("id").alias("RecId"),
                (F.col("id") * 2).alias("SysRowVersion"),
                F.lit(1.0).alias("amount"),
            ),
        )
        assert t.compact(spark) >= 1
        got = {r["RecId"] for r in t.read(spark).collect()}
        assert got >= {9000, 9001} | set(range(9100, 9105))

    def test_publish_lock_is_released_and_crashed_holder_is_harmless(
        self, spark, tmp_path
    ):
        """flock is released by the kernel when its holder dies, so a
        leftover lock FILE (crashed holder) never blocks acquisition —
        no staleness heuristic, no TTL, no break-the-lock TOCTOU."""
        import fcntl

        t = ManifestParquetTarget(str(tmp_path / "t"), key="RecId", n_buckets=8)
        t.overwrite(_base(spark, 50))
        lock = t._pointer() + ".lock"
        # the lock file persists (unlinking it would split waiters
        # across two inodes) but must not be HELD after publish
        fd = os.open(lock, os.O_CREAT | os.O_RDWR)
        try:
            fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)  # not held
            fcntl.flock(fd, fcntl.LOCK_UN)
        finally:
            os.close(fd)
        t.merge(spark, _batch(spark))  # leftover file is no obstacle
        assert {r["RecId"] for r in t.read(spark).collect()} >= {9000, 9001}

    def test_publish_times_out_while_lock_is_held(self, spark, tmp_path):
        import fcntl

        t = ManifestParquetTarget(str(tmp_path / "t"), key="RecId", n_buckets=8)
        t.overwrite(_base(spark, 50))
        fd = os.open(t._pointer() + ".lock", os.O_CREAT | os.O_RDWR)
        fcntl.flock(fd, fcntl.LOCK_EX)
        try:
            with pytest.raises(TimeoutError, match="publish lock busy"):
                with t._publish_lock():
                    pass  # pragma: no cover
        finally:
            os.close(fd)
        t.merge(spark, _batch(spark))  # released -> publish proceeds

    def test_two_writers_race_one_wins_and_retry_converges(self, spark, tmp_path):
        """TRUE two-writer race: two threads stage + publish against one
        manifest concurrently. A barrier pins the contended interleaving
        (both derive from the same parent before either publishes), the
        real flock + expected_parent check arbitrates: exactly one
        publish wins, the loser raises ConcurrentWriteError, and the
        standard OCC retry (re-derive, re-merge) converges losslessly."""
        import threading

        from d365fo_db_sync_spark.sinks import ConcurrentWriteError

        t = ManifestParquetTarget(str(tmp_path / "t"), key="RecId", n_buckets=8)
        t.overwrite(_base(spark, 100))

        both_derived = threading.Barrier(2, timeout=120)
        real_write = ManifestParquetTarget._write_version
        first_pass = threading.local()

        def gated_write(self, *a, **kw):
            if getattr(first_pass, "armed", True):
                first_pass.armed = False
                both_derived.wait()  # both carried-derivations done
            return real_write(self, *a, **kw)

        def batch(lo):
            return spark.range(lo, lo + 5).select(
                F.col("id").alias("RecId"),
                F.lit(9_999).alias("SysRowVersion"),
                F.lit(1.5).alias("amount"),
            )

        results: dict[int, str] = {}

        def writer(i):
            spark.sparkContext.setLocalProperty("spark.scheduler.pool", f"w{i}")
            try:
                t.merge(spark, batch(1000 * (i + 1)))
                results[i] = "won"
            except ConcurrentWriteError:
                t.merge(spark, batch(1000 * (i + 1)))  # OCC retry: re-derive
                results[i] = "retried"

        orig = ManifestParquetTarget._write_version
        ManifestParquetTarget._write_version = gated_write
        try:
            threads = [threading.Thread(target=writer, args=(i,)) for i in (0, 1)]
            for th in threads:
                th.start()
            for th in threads:
                th.join(timeout=300)
                assert not th.is_alive()
        finally:
            ManifestParquetTarget._write_version = orig

        assert sorted(results.values()) == ["retried", "won"]  # exactly one each
        rows = {r["RecId"]: (r["SysRowVersion"], r["amount"])
                for r in t.read(spark).collect()}
        # lossless: base rows plus BOTH writers' batches, value-exact
        assert set(rows) == set(range(100)) | set(range(1000, 1005)) | set(
            range(2000, 2005)
        )
        for k in (*range(1000, 1005), *range(2000, 2005)):
            assert rows[k] == (9_999, 1.5)


def test_engine_retries_merge_on_conflict(spark, tmp_path, monkeypatch):
    """SyncEngine.merge_upsert re-derives and retries when the sink
    reports an optimistic-concurrency conflict — and gives up loudly
    after bounded attempts."""
    from d365fo_db_sync_spark.sinks import ConcurrentWriteError
    from d365fo_db_sync_spark.state import StateStore
    from d365fo_db_sync_spark.sync import SyncConfig, SyncEngine

    t = ManifestParquetTarget(str(tmp_path / "t"), key="RecId", n_buckets=8)
    t.overwrite(_base(spark, 100))
    engine = SyncEngine(
        spark, StateStore(str(tmp_path / "state.json")), SyncConfig()
    )

    real_merge = ManifestParquetTarget.merge
    calls = {"n": 0}

    def flaky_merge(self, *a, **kw):
        calls["n"] += 1
        if calls["n"] == 1:
            raise ConcurrentWriteError("simulated interloper")
        return real_merge(self, *a, **kw)

    monkeypatch.setattr(ManifestParquetTarget, "merge", flaky_merge)
    rep = engine.merge_upsert("t", _batch(spark), t)
    assert calls["n"] == 2  # one conflict, one successful retry
    assert rep.inserted > 0
    assert {r["RecId"] for r in t.read(spark).collect()} >= {9000, 9001}

    # permanent conflict: bounded retries then raise
    calls["n"] = 0

    def always_conflict(self, *a, **kw):
        calls["n"] += 1
        raise ConcurrentWriteError("hot table")

    monkeypatch.setattr(ManifestParquetTarget, "merge", always_conflict)
    with pytest.raises(ConcurrentWriteError):
        engine.merge_upsert("t", _batch(spark), t)
    assert calls["n"] == 3


def test_export_version_is_standalone_fork(spark, tmp_path):
    """export_version materializes a pinned snapshot as an independent
    table: identical rows + zone maps, survives source GC, and later
    writes to either side don't affect the other."""
    t = ManifestParquetTarget(
        str(tmp_path / "src"), key="RecId", n_buckets=8, retain_versions=2
    )
    t.overwrite(_base(spark, 300))
    v1 = os.path.basename(t.current_path())
    want = {(r["RecId"], r["SysRowVersion"]) for r in t.read(spark).collect()}

    exported = t.export_version(v1, str(tmp_path / "release"))
    got = {(r["RecId"], r["SysRowVersion"]) for r in exported.read(spark).collect()}
    assert got == want
    # zone maps carried: a range scan on the export prunes like the source
    m = exported._load_manifest()
    assert any("min" in s for s in m["stats"].values())

    # mutate the source past the retention window; the export is unmoved
    t.merge(spark, _batch(spark))
    t.merge(spark, _batch(spark))
    t.vacuum_unreferenced()
    assert {
        (r["RecId"], r["SysRowVersion"]) for r in exported.read(spark).collect()
    } == want

    # the export is a real table: it can merge independently
    exported.merge(spark, _batch(spark))
    assert {r["RecId"] for r in exported.read(spark).collect()} >= {9000, 9001}
    # and the source did NOT gain the export's rows beyond its own merges
    assert t.num_rows() == exported.num_rows()  # same batch applied to both


def test_export_version_unknown_name_raises(spark, tmp_path):
    t = ManifestParquetTarget(str(tmp_path / "src"), key="RecId", n_buckets=8)
    t.overwrite(_base(spark, 10))
    with pytest.raises(FileNotFoundError):
        t.export_version("v_nonexistent", str(tmp_path / "x"))


class TestDeleteRange:
    def _table(self, spark, tmp_path, rows_per_file=50):
        t = ManifestParquetTarget(str(tmp_path / "t"), key="RecId", n_buckets=4)
        # several appends -> several files per bucket with disjoint key
        # ranges, so zone maps can classify files decisively
        t.overwrite(_base(spark, rows_per_file))
        for lo in (1000, 2000, 3000):
            t.append_rows(
                spark,
                spark.range(lo, lo + rows_per_file).select(
                    F.col("id").alias("RecId"),
                    (F.col("id") * 2).alias("SysRowVersion"),
                    F.lit(0.5).alias("amount"),
                ),
            )
        return t

    def test_state_matches_filter_semantics(self, spark, tmp_path):
        t = self._table(spark, tmp_path)
        before = {r["RecId"] for r in t.read(spark).collect()}
        rep = t.delete_range(spark, 1990, 3010)
        got = {r["RecId"] for r in t.read(spark).collect()}
        assert got == {k for k in before if not (1990 <= k <= 3010)}
        assert rep["deleted_rows"] == len(before) - len(got)

    def test_covered_files_drop_metadata_only(self, spark, tmp_path):
        t = self._table(spark, tmp_path)
        m = t._load_manifest()
        files = {f for fs in m["buckets"].values() for f in fs}
        mtimes = {f: os.stat(f).st_mtime_ns for f in files}
        # the 2000-2049 slice lives wholly inside its own files:
        # deleting exactly that range must drop those files from the
        # manifest WITHOUT rewriting anything
        rep = t.delete_range(spark, 2000, 2049)
        assert rep["rewritten_files"] == 0
        assert rep["dropped_files"] >= 1
        assert rep["deleted_rows"] == 50
        after = t._load_manifest()
        survivors = {f for fs in after["buckets"].values() for f in fs}
        # every surviving file is an original, byte-untouched
        assert survivors <= files
        for f in survivors:
            assert os.stat(f).st_mtime_ns == mtimes[f]
        assert {r["RecId"] for r in t.read(spark).collect()} == {
            r for r in range(50)
        } | set(range(1000, 1050)) | set(range(3000, 3050))

    def test_boundary_files_rewrite_filtered(self, spark, tmp_path):
        t = self._table(spark, tmp_path)
        rep = t.delete_range(spark, 2025, 2049)  # half of one slice
        assert rep["dropped_files"] == 0  # no file wholly covered
        assert rep["rewritten_files"] >= 1
        got = {r["RecId"] for r in t.read(spark).collect()}
        assert set(range(2000, 2025)) <= got
        assert not (got & set(range(2025, 2050)))

    def test_occ_protects_delete(self, spark, tmp_path, monkeypatch):
        from d365fo_db_sync_spark.sinks import ConcurrentWriteError

        t = self._table(spark, tmp_path)
        real = ManifestParquetTarget._write_version

        def interloped(self, *a, **kw):
            # another writer publishes between plan and publish
            monkeypatch.setattr(ManifestParquetTarget, "_write_version", real)
            t.append_rows(
                spark,
                spark.range(9000, 9001).select(
                    F.col("id").alias("RecId"),
                    F.col("id").alias("SysRowVersion"),
                    F.lit(1.0).alias("amount"),
                ),
            )
            return real(self, *a, **kw)

        monkeypatch.setattr(ManifestParquetTarget, "_write_version", interloped)
        with pytest.raises(ConcurrentWriteError):
            t.delete_range(spark, 0, 10)


class TestReplaceRange:
    def test_atomic_restatement(self, spark, tmp_path):
        t = ManifestParquetTarget(str(tmp_path / "t"), key="RecId", n_buckets=4)
        t.overwrite(_base(spark, 100).sort("RecId"))
        t.append_rows(
            spark,
            spark.range(1000, 1100).select(
                F.col("id").alias("RecId"),
                (F.col("id") * 2).alias("SysRowVersion"),
                F.lit(0.5).alias("amount"),
            ).sort("RecId"),
        )
        versions_before = len(t.versions())
        restated = spark.range(1000, 1050).select(
            F.col("id").alias("RecId"),
            F.lit(777).alias("SysRowVersion"),
            F.lit(9.0).alias("amount"),
        )
        rep = t.replace_range(spark, 1000, 1099, restated)
        assert rep["inserted_rows"] == 50
        assert rep["deleted_rows"] == 100
        # ONE new version for the whole restatement
        assert len(t.versions()) <= versions_before + 1
        rows = {r["RecId"]: r["SysRowVersion"] for r in t.read(spark).collect()}
        assert set(rows) == set(range(100)) | set(range(1000, 1050))
        assert all(rows[k] == 777 for k in range(1000, 1050))

    def test_out_of_range_rows_raise(self, spark, tmp_path):
        t = ManifestParquetTarget(str(tmp_path / "t"), key="RecId", n_buckets=4)
        t.overwrite(_base(spark, 50))
        bad = spark.range(10, 60).select(
            F.col("id").alias("RecId"),
            F.lit(1).alias("SysRowVersion"),
            F.lit(1.0).alias("amount"),
        )
        before = sorted(map(tuple, t.read(spark).collect()))
        with pytest.raises(ValueError, match="outside"):
            t.replace_range(spark, 10, 40, bad)  # keys 41..59 outside
        assert sorted(map(tuple, t.read(spark).collect())) == before


def test_scan_range_on_secondary_stats_col(spark, tmp_path):
    """stats_cols zone-maps a change-tracking column: a watermark scan
    on SysRowVersion plans only the files whose version range crosses
    the watermark — the incremental-read-from-lakehouse cut — while
    untracked columns still scan conservatively and row-exact."""
    t = ManifestParquetTarget(
        str(tmp_path / "t"), key="RecId", n_buckets=4,
        stats_cols=["SysRowVersion"],
    )
    # three ingest slabs with disjoint rowversion epochs
    def slab(keys, ver_base):
        return spark.createDataFrame(
            [(k, ver_base + i, float(k)) for i, k in enumerate(keys)],
            "RecId long, SysRowVersion long, amount double",
        )

    t.overwrite(slab(range(0, 100), 1_000))
    t.append_rows(spark, slab(range(100, 200), 5_000))
    t.append_rows(spark, slab(range(200, 300), 9_000))
    m = t._load_manifest()
    all_files = {os.path.basename(f) for fs in m["buckets"].values() for f in fs}

    # watermark: only the NEWEST epoch
    got = t.scan_range(spark, 9_000, 10_000, col="SysRowVersion")
    assert {r["RecId"] for r in got.collect()} == set(range(200, 300))
    scanned = {os.path.basename(f) for f in got.inputFiles()}
    assert scanned < all_files  # older epochs' files skipped entirely

    # key-column scans keep their original behavior
    got_k = t.scan_range(spark, 50, 120)
    assert {r["RecId"] for r in got_k.collect()} == set(range(50, 121))

    # untracked column: conservative full read, still row-exact
    got_u = t.scan_range(spark, 10.0, 20.0, col="amount")
    assert {r["RecId"] for r in got_u.collect()} == set(range(10, 21))
    assert {os.path.basename(f) for f in got_u.inputFiles()} == all_files


def test_clustered_compact_tightens_zone_maps(spark, tmp_path):
    """cluster_by_key compaction sorts each bucket by key and splits at
    target_rows_per_file, so files own contiguous key ranges: a narrow
    scan_range afterwards reads FEWER files than before, with identical
    rows — and mid-bucket metadata-only range deletes become possible."""
    t = ManifestParquetTarget(str(tmp_path / "t"), key="RecId", n_buckets=2)
    # interleaved appends: every file's zone map spans ~the whole
    # keyspace, so range scans cannot prune at all
    evens = spark.range(0, 2000, 2).select(
        F.col("id").alias("RecId"),
        (F.col("id") * 2).alias("SysRowVersion"),
        F.lit(1.0).alias("amount"),
    )
    odds = spark.range(1, 2000, 2).select(
        F.col("id").alias("RecId"),
        (F.col("id") * 2).alias("SysRowVersion"),
        F.lit(2.0).alias("amount"),
    )
    t.overwrite(evens)
    t.append_rows(spark, odds)
    want = sorted(map(tuple, t.read(spark).collect()))

    before = t.scan_range(spark, 100, 140)
    n_before = len(before.inputFiles())

    n = t.compact(spark, cluster_by_key=True, target_rows_per_file=200)
    assert n == 2  # every non-empty bucket re-clustered
    m = t._load_manifest()
    assert all(len(fs) >= 4 for fs in m["buckets"].values())  # split files
    assert sorted(map(tuple, t.read(spark).collect())) == want  # lossless

    after = t.scan_range(spark, 100, 140)
    assert sorted(r["RecId"] for r in after.collect()) == list(range(100, 141))
    assert len(after.inputFiles()) < n_before  # zone maps now prune

    # mid-bucket metadata-only delete: a range covering interior files
    rep = t.delete_range(spark, 400, 1500)
    assert rep["dropped_files"] >= 1
    got = {r["RecId"] for r in t.read(spark).collect()}
    assert got == {k for k in range(2000) if not (400 <= k <= 1500)}


def test_layout_report_drives_maintenance(spark, tmp_path):
    """The layout advisor reads ONLY the manifest: interleaved appends
    raise zone_overlap_frac and the file counts until it recommends
    cluster/compact; after clustered compaction the report is clean."""
    t = ManifestParquetTarget(str(tmp_path / "t"), key="RecId", n_buckets=2)
    t.overwrite(
        spark.range(0, 1000, 2).select(
            F.col("id").alias("RecId"),
            F.col("id").alias("SysRowVersion"),
            F.lit(1.0).alias("amount"),
        )
    )
    for k in range(5):  # interleaved appends: full-span files pile up
        t.append_rows(
            spark,
            spark.range(1 + k, 1000, 10).select(
                F.col("id").alias("RecId"),
                F.col("id").alias("SysRowVersion"),
                F.lit(2.0).alias("amount"),
            ),
        )
    rep = t.layout_report(small_file_rows=10_000)
    assert rep["files_per_bucket_max"] > 4
    assert rep["zone_overlap_frac"] > 0.5
    assert set(rep["recommendations"]) == {"compact", "cluster"}
    assert rep["small_files"] == rep["n_files"]  # all tiny here

    t.compact(spark, cluster_by_key=True, target_rows_per_file=400)
    rep2 = t.layout_report(small_file_rows=10)
    # clustered: ranges nearly disjoint (a duplicate key straddling a
    # file split still counts — both files must be read for that key,
    # so the metric is honestly conservative)
    assert rep2["zone_overlap_frac"] <= 0.5 < rep["zone_overlap_frac"]
    assert rep2["recommendations"] == []
    assert rep2["small_files"] == 0

    # fat-bucket signal: with a tiny threshold the advisor recommends
    # the geometry migration; the row figure comes from the manifest
    assert rep2["rows_per_bucket_max"] > 0
    rep3 = t.layout_report(small_file_rows=10, rebucket_rows_per_bucket=100)
    assert "rebucket" in rep3["recommendations"]


def test_crashed_process_lock_released_by_kernel(spark, tmp_path):
    """A subprocess takes the publish flock and DIES holding it; the
    kernel releases the lock with the process, so the next publish
    proceeds immediately — the exact crash scenario the old
    mtime-TTL break heuristic existed for, now handled for free."""
    import subprocess
    import sys

    t = ManifestParquetTarget(str(tmp_path / "t"), key="RecId", n_buckets=4)
    t.overwrite(_base(spark, 20))
    lock = t._pointer() + ".lock"
    code = (
        "import fcntl, os, sys\n"
        f"fd = os.open({lock!r}, os.O_CREAT | os.O_RDWR)\n"
        "fcntl.flock(fd, fcntl.LOCK_EX)\n"
        "print('locked', flush=True)\n"
        "os._exit(1)  # die WITHOUT unlocking\n"
    )
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=60
    )
    assert "locked" in out.stdout
    t.merge(spark, _batch(spark))  # must not wait for any TTL
    assert {r["RecId"] for r in t.read(spark).collect()} >= {9000, 9001}


def test_check_constraints_reject_before_publish(spark, tmp_path):
    """A violating batch aborts with per-constraint counts and a
    sample, the staged dir is cleaned, and the table is untouched —
    on EVERY write path (overwrite, merge via append_rows)."""
    import pytest

    from d365fo_db_sync_spark.sinks import ConstraintViolation

    t = ManifestParquetTarget(
        str(tmp_path / "t"), key="RecId", n_buckets=2,
        constraints={
            "amount_nonneg": "amount >= 0",
            "rv_positive": "SysRowVersion > 0",
        },
    )
    good = spark.createDataFrame(
        [(1, 10, 1.0), (2, 20, 0.0), (3, 30, None)],  # NULL passes CHECK
        "RecId long, SysRowVersion long, amount double",
    )
    t.overwrite(good)
    assert t.num_rows() == 3

    bad = spark.createDataFrame(
        [(4, 40, -5.0), (5, 0, -1.0)],
        "RecId long, SysRowVersion long, amount double",
    )
    with pytest.raises(ConstraintViolation) as ei:
        t.append_rows(spark, bad)
    assert ei.value.counts == {"amount_nonneg": 2, "rv_positive": 1}
    assert len(ei.value.sample) == 2
    # nothing published, nothing staged left behind
    assert t.num_rows() == 3
    import os
    leftovers = [
        d for d in os.listdir(str(tmp_path / "t"))
        if d.startswith("v_") and d != os.path.basename(t.current_path())
    ]
    assert leftovers == []

    with pytest.raises(ConstraintViolation):
        t.overwrite(bad)
    assert sorted(r["RecId"] for r in t.read(spark).collect()) == [1, 2, 3]


class TestGeometry:
    def _table(self, spark, n=300):
        return spark.range(n).select(
            F.col("id").alias("RecId"), (F.col("id") * 3).alias("v")
        )

    def test_wrong_n_buckets_refused_loudly(self, spark, tmp_path):
        """Reopening a table with the wrong bucket count must raise on
        every live path — the silent alternative is probes missing
        rows and merges rewriting the wrong window (corruption)."""
        t = ManifestParquetTarget(str(tmp_path / "t"), key="RecId", n_buckets=8)
        t.overwrite(self._table(spark))
        wrong = ManifestParquetTarget(str(tmp_path / "t"), key="RecId", n_buckets=16)
        with pytest.raises(ValueError, match="geometry"):
            wrong.read(spark)
        with pytest.raises(ValueError, match="geometry"):
            wrong.merge(spark, self._table(spark, 5))
        with pytest.raises(ValueError, match="geometry"):
            wrong.probe(spark, self._table(spark, 3))
        # the correctly-constructed handle still works
        assert ManifestParquetTarget(
            str(tmp_path / "t"), key="RecId", n_buckets=8
        ).read(spark).count() == 300

    def test_wrong_key_refused(self, spark, tmp_path):
        t = ManifestParquetTarget(str(tmp_path / "t"), key="RecId", n_buckets=4)
        t.overwrite(self._table(spark))
        wrong = ManifestParquetTarget(str(tmp_path / "t"), key="v", n_buckets=4)
        with pytest.raises(ValueError, match="geometry"):
            wrong.num_rows()

    def test_legacy_manifest_without_geometry_reads(self, spark, tmp_path):
        import json
        import os

        t = ManifestParquetTarget(str(tmp_path / "t"), key="RecId", n_buckets=4)
        t.overwrite(self._table(spark))
        mpath = os.path.join(t.current_path(), t.MANIFEST)
        with open(mpath, encoding="utf-8") as f:
            raw = json.load(f)
        raw.pop("geometry")
        with open(mpath, "w", encoding="utf-8") as f:
            json.dump(raw, f)
        # pre-geometry manifests are trusted as constructed
        anyn = ManifestParquetTarget(str(tmp_path / "t"), key="RecId", n_buckets=32)
        assert anyn.read(spark).count() == 300

    def test_rebucket_migrates_losslessly(self, spark, tmp_path):
        import os

        t = ManifestParquetTarget(
            str(tmp_path / "t"), key="RecId", n_buckets=4, retain_versions=4
        )
        t.overwrite(self._table(spark))
        v0 = os.path.basename(t.current_path())
        dead = [5, 6, 7]
        t.delete_keys_mor(
            spark, spark.createDataFrame([(k,) for k in dead], "RecId long")
        )
        want = {r["RecId"] for r in t.read(spark).collect()}

        t.rebucket(spark, 16)
        assert t.n_buckets == 16
        m = t._load_manifest()
        assert m["geometry"] == {"key": "RecId", "n_buckets": 16}
        assert not m.get("tombstones")  # physically dropped by the rewrite
        assert {r["RecId"] for r in t.read(spark).collect()} == want
        assert t.num_rows() == len(want)
        # probe under the NEW geometry finds live rows and masks nothing
        probed = t.probe(
            spark, spark.createDataFrame([(10,), (5,)], "RecId long")
        )
        assert {r["RecId"] for r in probed.collect() if r["RecId"] in (10, 5)} == {10}
        # a tombstoned-then-migrated key re-inserts cleanly
        t.append_rows(
            spark, spark.createDataFrame([(5, 15)], "RecId long, v long")
        )
        assert 5 in {r["RecId"] for r in t.read(spark).collect()}
        # old-geometry version stays time-travel readable (file lists)
        assert t.read_version(spark, v0).count() == 300
        # reopening: new geometry works, the old one now refuses
        assert ManifestParquetTarget(
            str(tmp_path / "t"), key="RecId", n_buckets=16
        ).num_rows() == len(want) + 1
        with pytest.raises(ValueError, match="geometry"):
            ManifestParquetTarget(
                str(tmp_path / "t"), key="RecId", n_buckets=4
            ).read(spark)

    def test_rebucket_same_size_is_noop_and_validates(self, spark, tmp_path):
        import os

        t = ManifestParquetTarget(str(tmp_path / "t"), key="RecId", n_buckets=4)
        t.overwrite(self._table(spark))
        before = os.path.basename(t.current_path())
        t.rebucket(spark, 4)
        assert os.path.basename(t.current_path()) == before  # no publish
        with pytest.raises(ValueError, match="n_buckets"):
            t.rebucket(spark, 0)

    def test_export_carries_version_geometry(self, spark, tmp_path):
        import os

        t = ManifestParquetTarget(
            str(tmp_path / "t"), key="RecId", n_buckets=4, retain_versions=3
        )
        t.overwrite(self._table(spark))
        v0 = os.path.basename(t.current_path())
        t.rebucket(spark, 8)
        # exporting the PRE-rebucket version yields a 4-bucket table
        exp = t.export_version(v0, str(tmp_path / "exp"))
        assert exp.n_buckets == 4
        assert exp.read(spark).count() == 300
        assert exp._load_manifest()["geometry"]["n_buckets"] == 4


class TestBucketedGeometrySidecar:
    """The non-manifest bucketed sink gets the same wrong-geometry
    refusal via a root-level sidecar (it has no manifest to record
    into)."""

    def _t(self, spark, n=100):
        return spark.range(n).select(
            F.col("id").alias("RecId"), (F.col("id") * 2).alias("v")
        )

    def test_wrong_geometry_refused_on_merge_and_probe(self, spark, tmp_path):
        from d365fo_db_sync_spark.sinks import BucketedParquetTarget

        t = BucketedParquetTarget(str(tmp_path / "b"), key="RecId", n_buckets=8)
        t.overwrite(self._t(spark))
        wrong = BucketedParquetTarget(str(tmp_path / "b"), key="RecId", n_buckets=4)
        with pytest.raises(ValueError, match="geometry"):
            wrong.merge(spark, self._t(spark, 5))
        with pytest.raises(ValueError, match="geometry"):
            wrong.probe(spark, self._t(spark, 3))
        # plain read never bucket-prunes, so it stays permitted
        assert wrong.read(spark).count() == 100

    def test_overwrite_redefines_geometry(self, spark, tmp_path):
        from d365fo_db_sync_spark.sinks import BucketedParquetTarget

        t8 = BucketedParquetTarget(str(tmp_path / "b"), key="RecId", n_buckets=8)
        t8.overwrite(self._t(spark))
        # a full replace under a new handle is a legitimate migration
        t4 = BucketedParquetTarget(str(tmp_path / "b"), key="RecId", n_buckets=4)
        t4.overwrite(self._t(spark, 60))
        assert t4.merge(spark, self._t(spark, 3)) >= 1  # now consistent
        with pytest.raises(ValueError, match="geometry"):
            t8.probe(spark, self._t(spark, 3))  # the OLD handle is stale now

    def test_crashed_overwrite_keeps_old_geometry(self, spark, tmp_path):
        """A failed re-geometry overwrite must leave the OLD sidecar
        live: the data pointer never swapped, so the old layout is
        what's on disk — publishing the new geometry first (the
        pre-fix order) would let a new-geometry handle bucket-prune
        through the wrong modulus over old-layout files."""
        from d365fo_db_sync_spark.sinks import BucketedParquetTarget, ParquetTarget

        t8 = BucketedParquetTarget(str(tmp_path / "b"), key="RecId", n_buckets=8)
        t8.overwrite(self._t(spark))

        t4 = BucketedParquetTarget(str(tmp_path / "b"), key="RecId", n_buckets=4)
        orig = ParquetTarget.overwrite

        def boom(self, df):
            raise RuntimeError("simulated mid-write crash")

        ParquetTarget.overwrite = boom
        try:
            with pytest.raises(RuntimeError, match="simulated"):
                t4.overwrite(self._t(spark, 60))
        finally:
            ParquetTarget.overwrite = orig

        # the old handle (matching the still-live old data) keeps
        # working; the would-be new handle is refused
        assert t8.merge(spark, self._t(spark, 3)) >= 1
        with pytest.raises(ValueError, match="geometry"):
            t4.probe(spark, self._t(spark, 3))

    def test_legacy_table_without_sidecar_trusted(self, spark, tmp_path):
        import os

        from d365fo_db_sync_spark.sinks import BucketedParquetTarget

        t = BucketedParquetTarget(str(tmp_path / "b"), key="RecId", n_buckets=8)
        t.overwrite(self._t(spark))
        os.remove(os.path.join(str(tmp_path / "b"), t.GEOMETRY_SIDECAR))
        anyn = BucketedParquetTarget(str(tmp_path / "b"), key="RecId", n_buckets=8)
        assert anyn.merge(spark, self._t(spark, 2)) >= 1
