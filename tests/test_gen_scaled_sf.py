"""Invariants of the scale-curve corpus generator (tools/gen_scaled_sf).

The sf0.1→sf1 curve in SCALE.md is only evidence if the derived corpus
preserves the operators' workload shape: keys stay unique and
join-consistent across copies, per-copy text keeps every statistic the
quality/packing operators read, and embeddings keep their norms. These
tests pin those properties on tiny 2-copy derivations of sf0.001.
"""

from __future__ import annotations

import string
import sys
from pathlib import Path

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))

from gen_scaled_sf import STRIDES, TABLE_KEYS, scaled_copy  # noqa: E402

SF = "/root/testdata/sf0.001"


def _load(spark, t):
    return spark.read.parquet(f"{SF}/{t}.parquet")


def _union_copies(spark, t, n=2):
    base = _load(spark, t)
    out = scaled_copy(base, t, 0)
    for i in range(1, n):
        out = out.union(scaled_copy(base, t, i))
    return out


@pytest.mark.parametrize("table", sorted(TABLE_KEYS))
def test_keys_disjoint_and_cardinality_scales(spark, table):
    base = _load(spark, table)
    scaled = _union_copies(spark, table, 2)
    assert scaled.count() == 2 * base.count()
    # the table's primary-ish key keeps its duplication factor: distinct
    # count doubles exactly (copies never collide)
    key = next(iter(TABLE_KEYS[table]))
    assert (
        scaled.select(key).distinct().count()
        == 2 * base.select(key).distinct().count()
    )


def test_foreign_keys_stay_join_consistent(spark):
    """Every lineitem in every copy joins exactly the orders rows its
    copy shipped — the fact/fact join fans out identically to the base
    corpus, scaled by the copy count."""
    orders = _union_copies(spark, "orders", 2)
    lineitem = _union_copies(spark, "lineitem", 2)
    base_hits = (
        _load(spark, "lineitem")
        .join(_load(spark, "orders"), F.col("l_orderkey") == F.col("o_orderkey"))
        .count()
    )
    scaled_hits = lineitem.join(
        orders, F.col("l_orderkey") == F.col("o_orderkey")
    ).count()
    assert scaled_hits == 2 * base_hits


def test_document_text_statistics_preserved_but_shingles_distinct(spark):
    base = _load(spark, "documents")
    copy1 = scaled_copy(base, "documents", 1)
    a = base.select(
        F.sum(F.length("text")).alias("chars"),
        F.sum(F.size(F.split(F.trim("text"), r"\s+"))).alias("toks"),
    ).first()
    b = copy1.select(
        F.sum(F.length("text")).alias("chars"),
        F.sum(F.size(F.split(F.trim("text"), r"\s+"))).alias("toks"),
    ).first()
    # byte-length and token structure identical (translate is 1:1)
    assert (a["chars"], a["toks"]) == (b["chars"], b["toks"])
    # but the actual token strings moved: cross-copy overlap of distinct
    # tokens collapses (so dedup sees a genuinely larger shingle space)
    tok = lambda df: df.select(  # noqa: E731
        F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("t")
    ).distinct()
    base_toks = tok(base).count()
    overlap = tok(base).intersect(tok(copy1)).count()
    assert overlap < 0.5 * base_toks, (overlap, base_toks)


def test_translate_rotation_is_bijective():
    """The per-copy Caesar alphabet is a permutation of a-z for every
    copy index — no two letters collapse (which would change shingle
    cardinality within a copy)."""
    from gen_scaled_sf import _caesar_alphabet

    for i in range(1, 26):
        rot = _caesar_alphabet(i)
        assert sorted(rot) == list(string.ascii_lowercase)
        assert rot != string.ascii_lowercase


def test_embedding_rotation_preserves_norms(spark):
    base = _load(spark, "embeddings")
    copy3 = scaled_copy(base, "embeddings", 3)
    norm = F.sqrt(
        F.aggregate(
            "embedding",
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )
    a = sorted(
        r[0] for r in base.select(F.round(norm, 6)).collect()
    )
    b = sorted(
        r[0] for r in copy3.select(F.round(norm, 6)).collect()
    )
    assert a == b
    # and dimensionality is unchanged
    assert copy3.select(F.size("embedding")).distinct().first()[0] == 64


def test_strides_clear_base_id_ranges(spark):
    """Each family's stride must exceed the base corpus' max id at the
    scale factors this tool is used with — otherwise copies collide."""
    maxima = {
        "orderkey": _load(spark, "orders").agg(F.max("o_orderkey")).first()[0],
        "custkey": _load(spark, "customer").agg(F.max("c_custkey")).first()[0],
        "event_id": _load(spark, "events").agg(F.max("event_id")).first()[0],
        "doc_id": _load(spark, "documents").agg(F.max("doc_id")).first()[0],
        "vec_id": _load(spark, "embeddings").agg(F.max("vec_id")).first()[0],
    }
    for fam, mx in maxima.items():
        # x1000 headroom: the strides must still clear ids at sf0.1
        assert STRIDES[fam] > mx, (fam, mx)


def test_scaled_keys_clear_synthetic_offset_space(spark):
    """Several sync suite queries manufacture keys at RecId + 90M and
    probe [90M, 100M); scaled orderkeys must stay below that space or
    synthetic inserts collide with real copies (found the hard way:
    sync_snapshot_diff hash-mismatched on a 10M-stride sf1 corpus)."""
    from gen_scaled_sf import _SYNTHETIC_OFFSET_FLOOR

    base = _load(spark, "orders")
    top = scaled_copy(base, "orders", 9)  # the highest copy at x10
    assert (
        top.agg(F.max("o_orderkey")).first()[0] < _SYNTHETIC_OFFSET_FLOOR
    )
