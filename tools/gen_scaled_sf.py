"""Derive a larger scale-factor corpus from the driver's sf0.1 tables.

The driver ships deterministic corpora only up to sf0.1; the 100 TB
sizing claims in SCALE.md extrapolate from a measured scale CURVE, so
this tool manufactures an sfN directory (default 10x = sf1) by
unioning N key-shifted copies of each fact table — deterministically,
with the perturbations needed to keep operator semantics realistic at
the larger size rather than degenerate:

* every key column (and its foreign-key uses) shifts by
  ``copy * stride`` with one stride per key family, so joins stay
  1:1-consistent and group cardinalities scale linearly;
* ``documents.text`` is passed through a per-copy letter substitution
  (a Caesar rotation over a-z via ``translate``): token counts, byte
  lengths, whitespace structure — everything the quality/packing/
  token-stat operators read — are IDENTICAL per copy, but shingles
  differ across copies, so the dedup/similarity operators see a 10x
  corpus with the same within-copy near-dup structure instead of
  every document acquiring 9 artificial exact twins (which would make
  pair generation quadratic and measure a different workload);
* ``embeddings.embedding`` is rotated (array slice-concat) per copy —
  norms preserved, directions decorrelated across copies;
* dimension tables ``region``/``nation`` stay fixed (25 nations is a
  constant of the world, as in TPC-H).

Usage: python tools/gen_scaled_sf.py [--src /root/testdata/sf0.1]
           [--dst /tmp/sfgen/sf1] [--copies 10]

The output is scratch data for scale-curve runs (SCALE.md) — it is
NOT a correctness corpus and is never written under /root/testdata.
"""

from __future__ import annotations

import argparse
import string
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

#: per-key-family shift strides: comfortably above any sf0.1 max id.
#: The orderkey stride must ALSO keep every scaled key below the
#: suite's synthetic-offset space: several sync queries manufacture
#: insert/append keys at RecId + 90,000,000 (and probe
#: [90M, 99,999,999] for zone-map pruning), so scaled orderkeys must
#: stay under 90M or those inserts collide with real copies — at
#: 10 copies, 9 * 8M + max_base(~150k) = 72.15M clears it.
STRIDES = {
    "orderkey": 8_000_000,
    "custkey": 1_000_000,
    "partkey": 1_000_000,
    "suppkey": 1_000_000,
    "event_id": 10_000_000,
    "user_id": 1_000_000,
    "doc_id": 1_000_000,
    "vec_id": 1_000_000,
}

#: keys the suite synthesizes at RecId + 90M (see sync_snapshot_diff,
#: sync_scan_range_zonemap, sync_append_compact)
_SYNTHETIC_OFFSET_FLOOR = 90_000_000

#: which columns of each table belong to which key family
TABLE_KEYS = {
    "customer": {"c_custkey": "custkey"},
    "supplier": {"s_suppkey": "suppkey"},
    "part": {"p_partkey": "partkey"},
    "orders": {"o_orderkey": "orderkey", "o_custkey": "custkey"},
    "lineitem": {
        "l_orderkey": "orderkey",
        "l_partkey": "partkey",
        "l_suppkey": "suppkey",
    },
    "events": {"event_id": "event_id", "user_id": "user_id"},
    "documents": {"doc_id": "doc_id"},
    "embeddings": {"vec_id": "vec_id"},
}

FIXED_TABLES = ("region", "nation")


def _caesar_alphabet(i: int) -> str:
    letters = string.ascii_lowercase
    return letters[i % 26 :] + letters[: i % 26]


def scaled_copy(df, table: str, copy: int):
    from pyspark.sql import functions as F

    out = df
    for col, family in TABLE_KEYS[table].items():
        out = out.withColumn(col, F.col(col) + F.lit(copy * STRIDES[family]))
    if table == "documents" and copy:
        rot = _caesar_alphabet(copy)
        out = out.withColumn(
            "text", F.translate("text", string.ascii_lowercase, rot)
        )
    if table == "embeddings" and copy:
        n = 64  # embedding dim in the driver corpus
        k = copy % n or 1
        out = out.withColumn(
            "embedding",
            F.concat(
                F.slice("embedding", k + 1, n - k), F.slice("embedding", 1, k)
            ),
        )
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", default="/tmp/sfgen/sf1")
    ap.add_argument("--copies", type=int, default=10)
    args = ap.parse_args()

    if (args.copies - 1) * STRIDES["orderkey"] + 1_000_000 >= _SYNTHETIC_OFFSET_FLOOR:
        raise SystemExit(
            f"--copies {args.copies} would push scaled orderkeys into the "
            "suite's synthetic +90M key space (see STRIDES comment); use "
            "fewer copies or rework the strides"
        )

    from d365fo_db_sync_spark.session import get_spark

    spark = get_spark("gen-scaled-sf")
    for t in FIXED_TABLES:
        df = spark.read.parquet(f"{args.src}/{t}.parquet")
        df.write.mode("overwrite").parquet(f"{args.dst}/{t}.parquet")
        print(f"{t}: copied unchanged ({df.count()} rows)")
    for t in TABLE_KEYS:
        base = spark.read.parquet(f"{args.src}/{t}.parquet")
        scaled = scaled_copy(base, t, 0)
        for i in range(1, args.copies):
            scaled = scaled.union(scaled_copy(base, t, i))
        scaled.repartition(32).write.mode("overwrite").parquet(
            f"{args.dst}/{t}.parquet"
        )
        print(f"{t}: x{args.copies} -> {spark.read.parquet(f'{args.dst}/{t}.parquet').count()} rows")
    spark.stop()


if __name__ == "__main__":
    main()
