"""Interleaved A/B of session-config variants over bench queries.

Usage: python tools/ab_conf.py --variant NAME --sf DIR q1 q2 ...

One process = one variant = one SparkSession; interleave variants by
alternating invocations from the shell. Timing methodology matches
bench.py exactly (noop sink, clearCache between queries, wall per rep).
Variants are defined in _VARIANTS below; "base" is the shipping
session.py configuration.
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

_VARIANTS: dict[str, dict[str, str]] = {
    "base": {},
    "shj": {
        "spark.sql.join.preferSortMergeJoin": "false",
        "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold": "64m",
    },
    "coalesce": {
        "spark.sql.adaptive.coalescePartitions.parallelismFirst": "false",
    },
    "both": {
        "spark.sql.join.preferSortMergeJoin": "false",
        "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold": "64m",
        "spark.sql.adaptive.coalescePartitions.parallelismFirst": "false",
    },
}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--variant", default="base", choices=sorted(_VARIANTS))
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--repeat", type=int, default=3)
    args = ap.parse_args()

    from d365fo_db_sync_spark.session import get_spark
    from d365fo_db_sync_spark.suite import queries

    qs = queries()
    spark = get_spark("ab_conf", extra_conf=_VARIANTS[args.variant])
    spark.range(1000).count()  # warm-up

    for name in args.names:
        fn = qs[name]
        best, walls = float("inf"), []
        for _ in range(args.repeat):
            spark.catalog.clearCache()
            t0 = time.time()
            fn(spark, args.sf).write.format("noop").mode("overwrite").save()
            walls.append(round(time.time() - t0, 3))
            best = min(best, walls[-1])
        print(f"{args.variant} {name} min={best:.3f} reps={walls}", flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
