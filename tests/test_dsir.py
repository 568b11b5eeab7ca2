"""DSIR importance weights (operators/dsir.py): exact brute-force
replay, direction pins, neutral empties, Gumbel top-k selection."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from d365fo_db_sync_spark.operators.dsir import dsir_log_weights, hashed_features

#: driver-window tier: value-equality / contract tests (pytest -m fast)
pytestmark = pytest.mark.fast


def _feats(text: str) -> list[str]:
    toks = text.lower().split()
    return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]


def _bucket_py(f: str, m: int) -> int:
    import hashlib

    return int(hashlib.md5(f.encode()).hexdigest()[:15], 16) % m


def test_matches_bruteforce_exactly(spark):
    """log_w equals a Python replay of the same expression tree —
    Laplace models, bucket-sorted sequential fold — double for
    double."""
    target_rows = [(i, "the quick brown fox jumps") for i in range(3)] + [
        (10 + i, "quantum flux capacitors hum") for i in range(2)
    ]
    raw_rows = [
        (0, "the quick brown fox jumps again"),
        (1, "unrelated spam spam spam offer"),
        (2, "quantum flux capacitors hum loudly"),
        (3, None),
    ]
    m = 64
    target = spark.createDataFrame(target_rows, "doc_id long, text string")
    raw = spark.createDataFrame(raw_rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_features"], r["log_w"])
        for r in dsir_log_weights(raw, target, m_buckets=m).collect()
    }

    tc: dict[int, int] = {}
    for _, t in target_rows:
        for f in _feats(t):
            b = _bucket_py(f, m)
            tc[b] = tc.get(b, 0) + 1
    rc: dict[int, int] = {}
    for _, t in raw_rows:
        if t is None:
            continue
        for f in _feats(t):
            b = _bucket_py(f, m)
            rc[b] = rc.get(b, 0) + 1
    tt, tr = sum(tc.values()), sum(rc.values())
    lr = {
        b: math.log((tc.get(b, 0) + 1) / (tt + m))
        - math.log((rc.get(b, 0) + 1) / (tr + m))
        for b in set(tc) | set(rc)
    }
    for doc_id, t in raw_rows:
        if t is None:
            assert got[doc_id] == (0, 0.0)
            continue
        cnts: dict[int, int] = {}
        for f in _feats(t):
            b = _bucket_py(f, m)
            cnts[b] = cnts.get(b, 0) + 1
        acc = 0.0
        for b in sorted(cnts):
            acc += cnts[b] * lr[b]
        assert got[doc_id][0] == len(_feats(t))
        # JVM Math.log and libm may differ in the last ulp (both are
        # <=1-ulp implementations, neither correctly rounded) — the
        # suite's 9-decimal value hash is unaffected; pin to 1e-12 rel
        assert got[doc_id][1] == pytest.approx(acc, rel=1e-12)
    # direction: the on-target docs outscore the spam
    assert got[0][1] > got[1][1] and got[2][1] > got[1][1]


def test_gumbel_topk_deterministic_and_bruteforced(spark):
    """gumbel_topk_sample selects exactly the brute-force top-k by
    log_w - ln(-ln u) with the content-hash u, and reruns select the
    same set."""
    from d365fo_db_sync_spark.operators.sampling import gumbel_topk_sample

    rows = [(i, float(i % 7) - 3.0) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, log_w double")
    picked = [
        r["doc_id"]
        for r in gumbel_topk_sample(df, ["doc_id"], F.col("log_w"), 25).collect()
    ]
    import hashlib

    def key(doc_id, lw):
        dg = hashlib.md5(str(doc_id).encode()).hexdigest()
        u = (int(dg[:8], 16) + 0.5) / 2**32
        return (lw - math.log(-math.log(u)), dg, doc_id)

    exp = sorted(
        ((key(i, lw), i) for i, lw in rows),
        key=lambda p: (-p[0][0], p[0][1], p[0][2]),
    )[:25]
    assert picked == [i for _, i in exp]
    again = [
        r["doc_id"]
        for r in gumbel_topk_sample(
            df.repartition(7), ["doc_id"], F.col("log_w"), 25
        ).collect()
    ]
    assert again == picked
    # NULL log weights never qualify
    with_null = df.union(spark.createDataFrame([(999, None)], "doc_id long, log_w double"))
    got = gumbel_topk_sample(with_null, ["doc_id"], F.col("log_w"), 300).collect()
    assert all(r["doc_id"] != 999 for r in got)


def test_select_topk_excludes_empty_docs(spark):
    """dsir_select_topk's empty-doc guard (r11 verdict #3): for EVERY
    k up to the non-empty count, no featureless document enters the
    selected set — their neutral log_w = 0.0 would otherwise rank
    mid-pack and beat mildly off-domain real documents.
    include_empty=True restores the raw neutral-weight draw (and
    mid-pack is exactly where the empties land in it)."""
    from d365fo_db_sync_spark.operators.dsir import dsir_select_topk

    target = spark.createDataFrame(
        [(100 + i, "alpha beta gamma delta") for i in range(3)],
        "doc_id long, text string",
    )
    # 8 real docs (4 on-domain, 4 off-domain) + 4 empties
    raw_rows = (
        [(i, "alpha beta gamma delta") for i in range(4)]
        + [(10 + i, "zip zap zoom quux") for i in range(4)]
        + [(20, None), (21, ""), (22, "   "), (23, "\n\t")]
    )
    raw = spark.createDataFrame(raw_rows, "doc_id long, text string")
    empty_ids = {20, 21, 22, 23}

    for k in (1, 3, 5, 8):  # every k <= n_nonempty
        picked = {
            r["doc_id"]
            for r in dsir_select_topk(raw, target, k=k, m_buckets=64).collect()
        }
        assert len(picked) == k
        assert picked.isdisjoint(empty_ids)
    # k above the non-empty pool: the draw is the whole guarded pool
    assert {
        r["doc_id"]
        for r in dsir_select_topk(raw, target, k=12, m_buckets=64).collect()
    } == set(range(4)) | {10, 11, 12, 13}

    # include_empty=True: the old neutral-weight draw — empties rank
    # BETWEEN the on-domain (log_w > 0) and off-domain (log_w < 0)
    # docs, so a k-8 draw picks all four of them over off-domain docs
    legacy = {
        r["doc_id"]
        for r in dsir_select_topk(
            raw, target, k=8, m_buckets=64, include_empty=True
        ).collect()
    }
    assert empty_ids <= legacy

    with pytest.raises(ValueError, match="k must be"):
        dsir_select_topk(raw, target, k=0)


def test_subset_target_path_is_identical(spark):
    """target_is_raw_subset=True (the r15 one-featurize path) returns
    bit-identical weights to re-exploding the subset target — the
    value-preservation contract of the optimization."""
    rows = [
        (0, "the quick brown fox jumps again", "en"),
        (1, "unrelated spam spam spam offer", "de"),
        (2, "quantum flux capacitors hum loudly", "en"),
        (3, None, None),
        (4, "", "en"),
    ]
    raw = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    target = raw.filter(F.col("lang") == "en")
    base = sorted(map(tuple, dsir_log_weights(raw, target, m_buckets=64).collect()))
    fast = sorted(
        map(
            tuple,
            dsir_log_weights(
                raw, target, m_buckets=64, target_is_raw_subset=True
            ).collect(),
        )
    )
    assert fast == base


def test_validation(spark):
    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError, match="m_buckets"):
        dsir_log_weights(df, df, m_buckets=1)
