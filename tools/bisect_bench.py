"""One-off bisect harness for the r3 bench regression (VERDICT r3 #3).

Times the three regressed queries under a config variant given on the
command line; run each variant in a fresh process:

    python tools/bisect_bench.py fair      # r3 status quo
    python tools/bisect_bench.py fifo      # FIFO scheduler
    python tools/bisect_bench.py nopersist # FAIR but persist() no-op'd
    python tools/bisect_bench.py fifo-nopersist
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

QUERIES = ("similarity_cosine_topk", "dedup_minhash_lsh_verified", "sync_incremental_e2e")


def main() -> None:
    variant = sys.argv[1] if len(sys.argv) > 1 else "fair"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    if "nopersist" in variant:
        from pyspark.sql import DataFrame

        DataFrame.persist = lambda self, *a, **k: self  # type: ignore[method-assign]

    from d365fo_db_sync_spark.session import get_spark
    from d365fo_db_sync_spark.suite import queries as all_queries

    extra = {"spark.scheduler.mode": "FIFO"} if variant.startswith("fifo") else {}
    spark = get_spark("bisect", extra_conf=extra)
    qs = all_queries()

    qs["topn_orders_snapshot"](spark, sf_dir).write.format("noop").mode("overwrite").save()

    out: dict[str, float] = {}
    for name in QUERIES:
        best = float("inf")
        for _ in range(3):
            spark.catalog.clearCache()
            t0 = time.time()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        out[name] = round(best, 3)
    print(json.dumps({"variant": variant, "timings": out}))
    spark.stop()


if __name__ == "__main__":
    main()
