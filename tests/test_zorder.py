"""Z-order clustering: Morton expression physics, rank buckets, and the
manifest sink's compact_zorder -> scan_box read path."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from d365fo_db_sync_spark.operators.zorder import (
    morton_interleave,
    quantile_bounds,
    rank_bucket,
)
from d365fo_db_sync_spark.sinks import ManifestParquetTarget


def ref_morton(vals: tuple[int, ...], bits: int) -> int:
    out = 0
    for j, x in enumerate(vals):
        for i in range(bits):
            out |= ((x >> i) & 1) << (i * len(vals) + j)
    return out


def test_morton_interleave_matches_reference(spark):
    """The codegen bit-interleave equals the textbook Morton code for
    every (x, y) pair in a 2**5 x 2**5 grid, and for a 3-D sample."""
    bits = 5
    df = spark.range(32 * 32).select(
        (F.col("id") % 32).alias("x"), (F.col("id") / 32).cast("long").alias("y")
    )
    got = df.select(
        "x", "y", morton_interleave([F.col("x"), F.col("y")], bits=bits).alias("z")
    ).collect()
    for r in got:
        assert r["z"] == ref_morton((r["x"], r["y"]), bits), (r["x"], r["y"])

    df3 = spark.createDataFrame(
        [(3, 5, 7), (0, 0, 0), (15, 1, 8)], "a int, b int, c int"
    )
    got3 = df3.select(
        "a", "b", "c",
        morton_interleave([F.col("a"), F.col("b"), F.col("c")], bits=4).alias("z"),
    ).collect()
    for r in got3:
        assert r["z"] == ref_morton((r["a"], r["b"], r["c"]), 4)


def test_morton_rejects_long_overflow():
    with pytest.raises(ValueError):
        morton_interleave([F.lit(1), F.lit(2)], bits=32)
    with pytest.raises(ValueError):
        morton_interleave([], bits=4)


def test_rank_bucket_counts_and_nulls(spark):
    """rank_bucket = count of boundaries strictly below the value;
    NULLs land in bucket 0."""
    df = spark.createDataFrame(
        [(0.5,), (1.0,), (1.5,), (2.0,), (99.0,), (None,)], "v double"
    )
    got = {
        r["v"]: r["b"]
        for r in df.select(
            "v", rank_bucket("v", [1.0, 2.0, 3.0]).alias("b")
        ).collect()
    }
    assert got == {0.5: 0, 1.0: 0, 1.5: 1, 2.0: 1, 99.0: 3, None: 0}


def test_quantile_bounds_dedupes_and_orders(spark):
    """Heavy repeated values collapse boundaries instead of repeating
    them; the result is strictly increasing and bounded by 2**bits-1."""
    df = spark.createDataFrame([(1.0,)] * 50 + [(2.0,)] * 50, "v double")
    b = quantile_bounds(df, "v", bits=4)
    assert b == sorted(set(b))
    assert len(b) <= 15
    const = quantile_bounds(spark.createDataFrame([(7.0,)] * 10, "v double"), "v")
    assert const == [7.0]
    with pytest.raises(ValueError):
        quantile_bounds(df, "v", bits=0)


def _dims_table(spark, n=4000):
    """Key uncorrelated with both payload dims; dims uncorrelated with
    each other (co-prime strides), so neither key clustering nor a
    single-dim sort helps a 2-D box — the z-order must do the work."""
    return spark.range(n).select(
        F.col("id").alias("RecId"),
        (F.col("id") * 37 % 100).alias("x"),
        (F.col("id") * 61 % 100).alias("y"),
    )


def test_compact_zorder_lossless_and_scan_box_prunes(spark, tmp_path):
    """After compact_zorder(x, y): contents identical, a 2-D box scan
    is row-exact, and it plans strictly fewer files than the same data
    under key clustering (where per-file x/y zone maps span ~the whole
    domain and prune nothing)."""
    zt = ManifestParquetTarget(
        str(tmp_path / "z"), key="RecId", n_buckets=4, stats_cols=["x", "y"]
    )
    kt = ManifestParquetTarget(
        str(tmp_path / "k"), key="RecId", n_buckets=4, stats_cols=["x", "y"]
    )
    df = _dims_table(spark)
    zt.overwrite(df)
    kt.overwrite(df)
    want = sorted(map(tuple, df.collect()))

    assert zt.compact_zorder(spark, ["x", "y"], bits=5, target_rows_per_file=100) == 4
    kt.compact(spark, cluster_by_key=True, target_rows_per_file=100)
    assert sorted(map(tuple, zt.read(spark).collect())) == want  # lossless

    box = {"x": (10, 29), "y": (10, 29)}
    zb = zt.scan_box(spark, box)
    kb = kt.scan_box(spark, box)
    expect = sorted(
        map(tuple, df.filter("x between 10 and 29 and y between 10 and 29").collect())
    )
    assert sorted(map(tuple, zb.collect())) == expect
    assert sorted(map(tuple, kb.collect())) == expect
    m = zt._load_manifest()
    n_total = sum(len(fs) for fs in m["buckets"].values())
    assert n_total >= 16  # the split actually produced many files
    assert len(zb.inputFiles()) < len(kb.inputFiles()), (
        len(zb.inputFiles()),
        len(kb.inputFiles()),
        n_total,
    )
    assert len(zb.inputFiles()) < n_total / 2  # real pruning, not an off-by-one


def test_scan_box_conservative_on_untracked_column(spark, tmp_path):
    """A predicate on a column with no recorded stats cannot skip any
    file, but the residual filter keeps the result exact."""
    t = ManifestParquetTarget(str(tmp_path / "t"), key="RecId", n_buckets=2)
    df = _dims_table(spark, n=500)
    t.overwrite(df)
    got = sorted(
        r["RecId"] for r in t.scan_box(spark, {"x": (0, 9)}).collect()
    )
    want = sorted(r["RecId"] for r in df.filter("x between 0 and 9").collect())
    assert got == want


def test_compact_zorder_requires_zone_mapped_cols(spark, tmp_path):
    t = ManifestParquetTarget(str(tmp_path / "t"), key="RecId", n_buckets=2)
    t.overwrite(_dims_table(spark, n=100))
    with pytest.raises(ValueError, match="zone-mapped"):
        t.compact_zorder(spark, ["x", "y"])
    # key itself is always zone-mapped: z-order on (key, x) is legal
    t2 = ManifestParquetTarget(
        str(tmp_path / "t2"), key="RecId", n_buckets=2, stats_cols=["x"]
    )
    t2.overwrite(_dims_table(spark, n=100))
    assert t2.compact_zorder(spark, ["RecId", "x"], bits=4) == 2


def test_scan_box_model_check(spark, tmp_path):
    """Random 2-D boxes over a z-ordered table: scan_box == naive
    filter for every box, including empty, full-domain, and
    single-point boxes."""
    zt = ManifestParquetTarget(
        str(tmp_path / "zm"), key="RecId", n_buckets=4, stats_cols=["x", "y"]
    )
    df = _dims_table(spark, n=1500)
    zt.overwrite(df)
    zt.compact_zorder(spark, ["x", "y"], bits=5, target_rows_per_file=120)
    rows = [(r["RecId"], r["x"], r["y"]) for r in df.collect()]
    boxes = [
        (0, 99, 0, 99),          # full domain
        (40, 39, 0, 99),         # empty on x
        (17, 17, 53, 53),        # single cell
        (0, 9, 90, 99),          # corner
        (25, 74, 25, 74),        # centre mass
        (99, 99, 0, 0),          # opposite corner point
    ]
    for xlo, xhi, ylo, yhi in boxes:
        got = sorted(
            r["RecId"]
            for r in zt.scan_box(
                spark, {"x": (xlo, xhi), "y": (ylo, yhi)}
            ).collect()
        )
        want = sorted(
            k for k, x, y in rows if xlo <= x <= xhi and ylo <= y <= yhi
        )
        assert got == want, (xlo, xhi, ylo, yhi)
