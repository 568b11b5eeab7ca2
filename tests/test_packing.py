"""Sequence-packing operator: exactness vs a driver-side brute force,
plus the plan properties the 100 TB design depends on."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from d365fo_db_sync_spark.operators.packing import pack_manifest, pack_sequences


def _brute(rows: list[tuple[int, int]], budget: int) -> dict[int, tuple]:
    acc, exp = 0, {}
    for i, t in sorted(rows):
        if t <= 0:
            continue
        start = acc
        acc += t
        first, last = start // budget, (start + t - 1) // budget
        exp[i] = (t, start, first, last, last - first + 1)
    return exp


@pytest.mark.parametrize("budget,span", [(17, 25), (64, 7), (1, 1000)])
def test_pack_sequences_matches_bruteforce(spark, budget, span):
    # sparse non-contiguous ids, a zero-token doc (must be dropped),
    # and token counts that straddle budget boundaries
    rows = [(i, (i * 7) % 13 + 1) for i in range(0, 200, 3)] + [(1, 0)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    got = {
        r["doc_id"]: (
            r["n_tokens"], r["g_start"], r["first_pack"], r["last_pack"], r["n_packs"]
        )
        for r in pack_sequences(
            df, F.col("n_tokens"), budget=budget, bucket_span=span
        ).collect()
    }
    assert got == _brute(rows, budget)


def test_pack_sequences_rejects_bad_budget(spark):
    df = spark.createDataFrame([(1, 2)], "doc_id long, n_tokens long")
    with pytest.raises(ValueError):
        pack_sequences(df, F.col("n_tokens"), budget=0)


def test_pack_manifest_accounts_for_every_span(spark):
    rows = [(i, (i * 11) % 29 + 1) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    packed = pack_sequences(df, F.col("n_tokens"), budget=23, bucket_span=10)
    manifest = pack_manifest(packed, budget=23).collect()
    total_tokens = sum(t for _, t in rows)
    # every pack up to the stream end appears exactly once
    assert sorted(r["pack_id"] for r in manifest) == list(
        range((total_tokens - 1) // 23 + 1)
    )
    # doc-span accounting: sum of per-pack doc counts == sum of n_packs
    n_spans = {r["doc_id"]: r["n_packs"] for r in packed.collect()}
    assert sum(r["n_docs"] for r in manifest) == sum(n_spans.values())
    for r in manifest:
        assert r["tok_end"] - r["tok_start"] + 1 == 23


def test_pack_sequences_plan_is_two_stage_not_global_window(spark):
    """The corpus-wide cumsum must run PARTITIONED by the range bucket
    (parallel), with only the metadata-sized bucket-offset frame on a
    single partition — a global-order window over the corpus would
    serialize 100 TB through one task."""
    from d365fo_db_sync_spark.plans.audit import explain_formatted
    from d365fo_db_sync_spark.sources import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    from d365fo_db_sync_spark.operators import text

    df = pack_sequences(docs, text.token_count("text"), budget=128, bucket_span=50)
    plan = explain_formatted(df)
    assert "hashpartitioning(_pk_bucket" in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def _ffd_brute(rows: list[tuple[int, int]], budget: int) -> dict[int, int]:
    """Reference FFD over one bucket (all ids in a single bucket)."""
    remaining: list[int] = []
    out = {}
    for i, t in sorted((r for r in rows if r[1] > 0), key=lambda r: (-r[1], r[0])):
        for j, rem in enumerate(remaining):
            if t <= rem:
                remaining[j] = rem - t
                out[i] = j
                break
        else:
            remaining.append(max(budget - t, 0))
            out[i] = len(remaining) - 1
    return out


def test_ffd_matches_reference_and_respects_budget(spark):
    from d365fo_db_sync_spark.operators.packing import pack_sequences_ffd

    rows = [(i, (i * 13) % 37 + 1) for i in range(120)] + [(500, 200), (501, 0)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    got = pack_sequences_ffd(
        df, F.col("n_tokens"), budget=40, bucket_span=1000
    ).collect()
    # single bucket (span > max id) -> comparable to the driver reference
    assert {r["doc_id"]: r["pack_in_bucket"] for r in got} == _ffd_brute(rows, 40)
    # no pack over budget except singleton oversize docs
    packs: dict[int, list[int]] = {}
    for r in got:
        packs.setdefault(r["pack_in_bucket"], []).append(r["n_tokens"])
    for members in packs.values():
        assert sum(members) <= 40 or len(members) == 1
    # zero-token doc dropped, oversize doc isolated
    ids = {r["doc_id"] for r in got}
    assert 501 not in ids and 500 in ids


def test_ffd_is_partitioning_invariant(spark):
    """The assignment must depend only on (bucket, tokens, id) — never
    on how the input happened to be partitioned."""
    from d365fo_db_sync_spark.operators.packing import pack_sequences_ffd

    rows = [(i, (i * 7) % 23 + 1) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    a = pack_sequences_ffd(df, F.col("n_tokens"), 31, bucket_span=50)
    b = pack_sequences_ffd(
        df.repartition(13), F.col("n_tokens"), 31, bucket_span=50
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


# -- hypothesis property suite ------------------------------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

doc_st = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=400),  # doc_id (dups dropped below)
        st.integers(min_value=0, max_value=90),  # n_tokens (0 => dropped)
    ),
    min_size=1,
    max_size=60,
)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=doc_st, budget=st.integers(min_value=1, max_value=50),
       span=st.sampled_from([1, 7, 50, 1000]))
def test_pack_sequences_property(spark, rows, budget, span):
    rows = list({i: (i, t) for i, t in rows}.values())  # unique ids
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    got = {
        r["doc_id"]: (
            r["n_tokens"], r["g_start"], r["first_pack"], r["last_pack"], r["n_packs"]
        )
        for r in pack_sequences(
            df, F.col("n_tokens"), budget=budget, bucket_span=span
        ).collect()
    }
    assert got == _brute(rows, budget)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=doc_st, budget=st.integers(min_value=1, max_value=50))
def test_ffd_property_single_bucket(spark, rows, budget):
    from d365fo_db_sync_spark.operators.packing import pack_sequences_ffd

    rows = list({i: (i, t) for i, t in rows}.values())
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    got = pack_sequences_ffd(
        df, F.col("n_tokens"), budget=budget, bucket_span=10_000
    ).collect()
    assert {r["doc_id"]: r["pack_in_bucket"] for r in got} == _ffd_brute(rows, budget)
    packs: dict[int, list[int]] = {}
    for r in got:
        packs.setdefault(r["pack_in_bucket"], []).append(r["n_tokens"])
    for members in packs.values():
        assert sum(members) <= budget or len(members) == 1


def test_pack_sequences_duplicate_ids_row_bounded_not_peer_inclusive(spark):
    """The in-bucket cumsum uses an explicit ROWS frame: duplicate ids
    (a documented contract violation — the id is the stream order key)
    must each get a row-bounded offset, never the RANGE-frame behavior
    where every peer receives the inclusive sum of ALL peers. Pinned so
    the frame spec can't silently regress: total stream length must
    equal the token sum, and per-duplicate offsets must be distinct."""
    from pyspark.sql import functions as F

    from d365fo_db_sync_spark.operators.packing import pack_sequences

    rows = [(1, 10), (2, 7), (2, 5), (3, 4)]  # id 2 duplicated
    df = spark.createDataFrame(rows, "doc_id long, n int")
    out = pack_sequences(df, F.col("n"), budget=8, bucket_span=100).collect()
    assert len(out) == 4
    # ROWS frame: offsets strictly increase through the duplicates;
    # stream is gapless and exactly sum(n) long
    ends = sorted((r["g_start"], r["g_start"] + r["n_tokens"]) for r in out)
    assert ends[0][0] == 0
    for (s1, e1), (s2, e2) in zip(ends, ends[1:]):
        assert s2 == e1  # gapless
    assert ends[-1][1] == sum(n for _, n in rows)
    dup_starts = [r["g_start"] for r in out if r["doc_id"] == 2]
    assert len(set(dup_starts)) == 2


# ---------------------------------------------------------------- shards


def _brute_shards(rows, shard_tokens):
    import hashlib

    order = sorted(
        ((hashlib.md5(str(i).encode()).hexdigest(), i, t) for i, t in rows if t > 0),
    )
    acc, exp = 0, {}
    for _, i, t in order:
        exp[i] = (t, acc, acc // shard_tokens)
        acc += t
    return exp


def test_shuffled_shards_matches_bruteforce(spark):
    from d365fo_db_sync_spark.operators.packing import shuffled_shards

    rows = [(i, (i * 11) % 29 + 1) for i in range(0, 300, 2)] + [(4, 0)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    got = {
        r["doc_id"]: (r["n_tokens"], r["g_start"], r["shard"])
        for r in shuffled_shards(df, F.col("n_tokens"), shard_tokens=37).collect()
    }
    assert got == _brute_shards(rows, 37)


def test_shuffled_shards_partitioning_invariant(spark):
    from d365fo_db_sync_spark.operators.packing import shuffled_shards

    rows = [(i, i % 5 + 1) for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    a = sorted(
        shuffled_shards(df, F.col("n_tokens"), 50).collect(),
        key=lambda r: r["doc_id"],
    )
    b = sorted(
        shuffled_shards(df.repartition(13), F.col("n_tokens"), 50).collect(),
        key=lambda r: r["doc_id"],
    )
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_shuffled_shards_salt_changes_order_not_membership(spark):
    from d365fo_db_sync_spark.operators.packing import shuffled_shards

    rows = [(i, 3) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    a = {r["doc_id"]: r["g_start"] for r in shuffled_shards(df, F.lit(3), 20).collect()}
    b = {
        r["doc_id"]: r["g_start"]
        for r in shuffled_shards(df, F.lit(3), 20, salt="s2").collect()
    }
    assert set(a) == set(b)  # same documents in the stream
    assert a != b  # at a different position


def test_shard_manifest_tiles_the_stream(spark):
    from d365fo_db_sync_spark.operators.packing import shard_manifest, shuffled_shards

    rows = [(i, (i * 7) % 13 + 1) for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    assigned = shuffled_shards(df, F.col("n_tokens"), shard_tokens=100)
    man = sorted(shard_manifest(assigned).collect(), key=lambda r: r["shard"])
    total = sum(t for _, t in rows)
    assert sum(r["n_tokens"] for r in man) == total
    assert sum(r["n_docs"] for r in man) == len(rows)
    # consecutive shards tile the stream: each starts within shard_tokens
    # of its nominal boundary and ends where the next begins
    for prev, cur in zip(man, man[1:]):
        assert prev["tok_end"] + 1 == cur["tok_start"]
    assert man[0]["tok_start"] == 0
    assert man[-1]["tok_end"] == total - 1
    # a shard's first doc starts inside the shard's nominal token range
    for r in man:
        assert r["shard"] * 100 <= r["tok_start"] < (r["shard"] + 1) * 100


def test_shuffled_shards_rejects_bad_budget(spark):
    from d365fo_db_sync_spark.operators.packing import shuffled_shards

    df = spark.createDataFrame([(1, 2)], "doc_id long, n_tokens long")
    with pytest.raises(ValueError):
        shuffled_shards(df, F.col("n_tokens"), 0)


def test_write_shards_roundtrip(spark, tmp_path):
    from d365fo_db_sync_spark.operators.packing import shuffled_shards, write_shards

    rows = [(i, f"doc body {i}", (i * 7) % 13 + 1) for i in range(300)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, n_tokens long")
    assigned = shuffled_shards(docs, F.col("n_tokens"), shard_tokens=200)
    path = str(tmp_path / "shards")
    write_shards(docs, assigned, path)

    back = spark.read.parquet(path)
    # every document lands in exactly the shard the assignment named
    want = {(r["doc_id"], r["shard"]) for r in assigned.collect()}
    got = {(r["doc_id"], r["shard"]) for r in back.collect()}
    assert got == want
    # full payload carried through
    assert set(back.columns) >= {"doc_id", "text", "g_start", "shard"}
    # one file per shard: the pre-write repartition collapses writers
    import os

    import pandas as pd

    for d in os.listdir(path):
        if d.startswith("shard="):
            files = [f for f in os.listdir(os.path.join(path, d)) if f.endswith(".parquet")]
            assert len(files) == 1, (d, files)
            # in-FILE row order is the contract a sequential dataloader
            # reads: g_start ascending inside each shard file (the
            # writer's own Sort(shard) must not eliminate it)
            g = pd.read_parquet(os.path.join(path, d, files[0]))["g_start"].tolist()
            assert g == sorted(g)


def test_shuffled_shards_plan_has_no_global_sort(spark):
    from d365fo_db_sync_spark.operators.packing import shuffled_shards

    df = spark.range(0, 10_000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 9 + 1).alias("n_tokens")
    )
    plan = (
        shuffled_shards(df, F.col("n_tokens"), 500)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the layout must come from the banded prefix sum, never a global
    # order-by (rangepartitioning serializes the corpus through one
    # sort at scale)
    assert "rangepartitioning" not in plan.lower()
    assert "BroadcastExchange" in plan  # band offsets broadcast back


def test_append_shards_immutable_and_contiguous(spark, tmp_path):
    from d365fo_db_sync_spark.operators.packing import (
        append_shards,
        shuffled_shards,
        write_shards,
    )

    docs1 = spark.createDataFrame(
        [(i, (i * 7) % 13 + 1) for i in range(200)], "doc_id long, n_tokens long"
    )
    a1 = shuffled_shards(docs1, F.col("n_tokens"), shard_tokens=100)
    path = str(tmp_path / "inc")
    write_shards(docs1, a1, path)
    total1 = sum(r["n_tokens"] for r in a1.collect())
    # data files only: the writer legitimately refreshes _SUCCESS markers
    before = {}
    for root, _, files in __import__("os").walk(path):
        for f in files:
            if f.endswith(".parquet"):
                p = f"{root}/{f}"
                before[p] = __import__("os").stat(p).st_mtime_ns

    docs2 = spark.createDataFrame(
        [(i, i % 9 + 1) for i in range(1000, 1150)], "doc_id long, n_tokens long"
    )
    a2 = shuffled_shards(docs2, F.col("n_tokens"), shard_tokens=100)
    new_total = append_shards(docs2, a2, path, total1, shard_tokens=100)

    # every pre-existing file is byte-untouched (immutability contract)
    for p, m in before.items():
        assert __import__("os").stat(p).st_mtime_ns == m
    # batch 2 starts at the next shard boundary and is contiguous
    boundary = -(-total1 // 100) * 100
    back = spark.read.parquet(path)
    b2 = sorted(
        (r["g_start"], r["n_tokens"], r["shard"])
        for r in back.filter("doc_id >= 1000").collect()
    )
    assert b2[0][0] == boundary
    acc = boundary
    for g, t, s in b2:
        assert g == acc and s == g // 100
        acc += t
    assert new_total == acc
    # phase-1 layout byte-identical through the append
    got1 = sorted(
        (r["doc_id"], r["g_start"], r["shard"])
        for r in back.filter("doc_id < 1000").collect()
    )
    want1 = sorted(
        (r["doc_id"], r["g_start"], r["shard"]) for r in a1.collect()
    )
    assert got1 == want1


def test_append_shards_empty_batch_returns_boundary(spark, tmp_path):
    from d365fo_db_sync_spark.operators.packing import append_shards, shuffled_shards

    docs = spark.createDataFrame([], "doc_id long, n_tokens long")
    a = shuffled_shards(docs, F.col("n_tokens"), 50)
    path = str(tmp_path / "empty")
    assert append_shards(docs, a, path, 130, shard_tokens=50) == 150
    import pytest as _p

    with _p.raises(ValueError):
        append_shards(docs, a, path, -1, shard_tokens=50)


def test_curriculum_shards_phase_major_hash_within(spark):
    import hashlib

    from d365fo_db_sync_spark.operators.packing import curriculum_shards

    rows = [(i, (i * 7) % 40 + 1) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    out = curriculum_shards(
        df, F.col("n_tokens"), F.expr("n_tokens div 10"), shard_tokens=100
    ).collect()
    got = {r["doc_id"]: (r["difficulty"], r["g_start"], r["shard"]) for r in out}
    order = sorted(
        (t // 10, hashlib.md5(str(i).encode()).hexdigest(), i, t)
        for i, t in rows
    )
    acc = 0
    for d, _, i, t in order:
        assert got[i] == (d, acc, acc // 100)
        acc += t
    # phase boundaries are monotone: every easy doc precedes every hard one
    max_easy = max(g for i, (d, g, _) in got.items() if d == 0)
    min_hard = min(g for i, (d, g, _) in got.items() if d == max(v[0] for v in got.values()))
    assert max_easy < min_hard


def test_curriculum_shards_rejects_bad_budget(spark):
    from d365fo_db_sync_spark.operators.packing import curriculum_shards

    df = spark.createDataFrame([(1, 2)], "doc_id long, n_tokens long")
    with pytest.raises(ValueError):
        curriculum_shards(df, F.col("n_tokens"), F.lit(0), 0)


def test_curriculum_shards_plan_has_no_global_sort(spark):
    from d365fo_db_sync_spark.operators.packing import curriculum_shards

    df = spark.range(0, 5000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 9 + 1).alias("n_tokens")
    )
    plan = (
        curriculum_shards(df, F.col("n_tokens"), F.expr("n_tokens div 3"), 500)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "rangepartitioning" not in plan.lower()
    assert "BroadcastExchange" in plan  # band + phase offsets broadcast
