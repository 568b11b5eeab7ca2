"""Wall-time a set of suite queries at one corpus — the scale-curve
helper behind SCALE.md's measured sf0.1 -> sf1 tables.

Usage: python tools/time_queries.py --sf DIR name [name ...]
Prints one `name seconds rows` line per query (rows forces full
materialization through `count()` after a `collect()`-free action —
we use collect() length to match tools/check.py's work shape).
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--repeat", type=int, default=1)
    ap.add_argument(
        "--noop",
        action="store_true",
        help="time a noop-sink write (bench.py's exact methodology: full "
        "materialization of every column, no driver collect) instead of "
        "collect(); rows report -1",
    )
    args = ap.parse_args()

    from d365fo_db_sync_spark.session import get_spark
    from d365fo_db_sync_spark.suite import queries

    qs = queries()
    spark = get_spark("timing", shuffle_partitions=32)
    # one warm-up action so JVM/session costs don't land on query 1
    spark.range(1000).count()
    for name in args.names:
        best = None
        rows = -1
        for _ in range(args.repeat):
            spark.catalog.clearCache()
            t0 = time.time()
            if args.noop:
                qs[name](spark, args.sf).write.format("noop").mode(
                    "overwrite"
                ).save()
            else:
                rows = len(qs[name](spark, args.sf).collect())
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        print(f"{name} {best:.3f} {rows}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
