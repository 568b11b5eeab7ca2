"""Plan-shape sweep: dump ``explain("formatted")`` for a set of suite
queries and print one summary row per query (plan lines, parquet scans,
Exchange / Generate / Window counts, Python-eval nodes) so duplicated
subtrees and stray shuffles stand out mechanically. The r16 rows-only
tail sweep behind OPTIMIZATION_r16.md.

Usage: python tools/plan_sweep.py --outdir plans/r16/sweep [--sf DIR] [name ...]
(no names = every registered query without a bench flag filter)
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--outdir", required=True)
    args = ap.parse_args()

    from d365fo_db_sync_spark.session import get_spark
    from d365fo_db_sync_spark.suite import queries

    qs = queries()
    names = args.names or sorted(qs)
    out = Path(args.outdir)
    out.mkdir(parents=True, exist_ok=True)
    spark = get_spark("plansweep", shuffle_partitions=32)
    spark.range(1000).count()
    print("name lines scans exchanges generates windows pyeval")
    for name in names:
        try:
            df = qs[name](spark, args.sf)
            plan = spark._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # builder side work can fail off-corpus
            print(f"{name} ERROR {type(e).__name__}: {str(e)[:120]}")
            continue
        (out / f"{name}.txt").write_text(plan)
        print(
            f"{name} {plan.count(chr(10))} {plan.count('Scan parquet')} "
            f"{plan.count('Exchange')} {plan.count('Generate')} "
            f"{plan.count('Window')} "
            f"{plan.count('BatchEvalPython') + plan.count('ArrowEvalPython') + plan.count('MapInPandas') + plan.count('MapInArrow') + plan.count('FlatMapGroupsInPandas')}"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
