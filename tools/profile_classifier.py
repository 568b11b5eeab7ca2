"""Phase-level wall breakdown of quality_classifier_scores (and the cdc
stream) at one corpus — the measurement behind OPTIMIZATION_r15's
per-phase claims. Each phase is labeled via setJobDescription so a UI
trace would agree; walls are printed per phase.

Usage: python tools/profile_classifier.py [--sf DIR] [--what clf|cdc]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def profile_clf(spark, sf_dir: str) -> None:
    from pyspark.sql import functions as F

    from d365fo_db_sync_spark.operators.classifier import (
        hashed_tf,
        logreg_fit,
        logreg_score,
    )
    from d365fo_db_sync_spark.sources import load_table

    sc = spark.sparkContext

    def phase(label, fn):
        sc.setJobDescription(label)
        t0 = time.time()
        out = fn()
        print(f"  {time.time() - t0:7.3f}s  {label}", flush=True)
        sc.setJobDescription(None)
        return out

    docs = load_table(spark, sf_dir, "documents")
    src_num = F.substring("source", 4, 10).cast("int")
    labeled = docs.select(
        "doc_id", "text", F.coalesce(src_num < 10, F.lit(False)).alias("is_ref")
    )
    x = phase(
        "clf: featurize checkpoint",
        lambda: hashed_tf(docs, "text", "doc_id", 1024).localCheckpoint(eager=True),
    )
    model = phase(
        "clf: fit (2 rounds)",
        lambda: logreg_fit(
            labeled, "is_ref", m_buckets=1024, lr=2000.0, rounds=2,
            lr_bias=1.0, features=x,
        ),
    )
    phase(
        "clf: final scoring noop",
        lambda: logreg_score(docs, model, features=x)
        .write.format("noop")
        .mode("overwrite")
        .save(),
    )


def profile_cdc(spark, sf_dir: str) -> None:
    from d365fo_db_sync_spark.suite import queries

    fn = queries()["cdc_stream_throughput"]
    from d365fo_db_sync_spark.suite.tail_q import CDC_STREAM_STATS

    # one rep per call — main()'s --repeat drives the rep count (the
    # old internal 2-rep loop ran 2*repeat reps and ignored the flag)
    spark.catalog.clearCache()
    t0 = time.time()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    print(
        f"  total={time.time() - t0:6.3f}s stats={dict(CDC_STREAM_STATS)}",
        flush=True,
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--what", default="clf", choices=("clf", "cdc"))
    ap.add_argument("--repeat", type=int, default=2)
    args = ap.parse_args()

    from d365fo_db_sync_spark.session import get_spark

    spark = get_spark("profile")
    spark.range(1000).count()
    for r in range(args.repeat):
        print(f"rep {r}:", flush=True)
        spark.catalog.clearCache()
        if args.what == "clf":
            profile_clf(spark, args.sf)
        else:
            profile_cdc(spark, args.sf)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
