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
