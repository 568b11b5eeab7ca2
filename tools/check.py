"""Local replica of the driver's t2 correctness gate.

Runs every suite query on Spark AND its oracle SQL on DuckDB over the
same parquet corpus, then compares row count, sorted column names, and an
order-insensitive value hash. Usage:

    python tools/check.py [--sf /root/testdata/sf0.01] [name ...]
"""

from __future__ import annotations

import argparse
import datetime as dt
import hashlib
import math
import os
import sys
import time

sys.path.insert(0, "/root/repo")


def normalize(v) -> str:
    if v is None:
        return "\x00NULL"
    if isinstance(v, bool):
        return "1" if v else "0"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(round(v, 9))
    if isinstance(v, (dt.datetime,)):
        return v.isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(normalize(x) for x in v) + "]"
    return str(v)


def value_hash(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x01".join(normalize(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\x02")
    return h.hexdigest()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--show-diff", action="store_true")
    args = ap.parse_args()

    import duckdb

    from d365fo_db_sync_spark.session import get_spark
    from d365fo_db_sync_spark.suite import oracle_sql, queries

    qs = queries()
    oracles = oracle_sql()
    names = args.names or list(qs)

    import pyspark

    # environment canary: "passes locally, fails at the driver" bugs are
    # usually version-sensitive oracles — make the stack visible in every
    # check log so a divergence can be attributed immediately
    print(f"duckdb {duckdb.__version__} / pyspark {pyspark.__version__}")

    spark = get_spark("check", shuffle_partitions=8)
    con = duckdb.connect()
    # Spill OUTSIDE the repo: DuckDB's default temp dir is cwd-relative
    # (.tmp/), and a big sf1 battery once left 14 GB of spill files that a
    # snapshot commit then swept into git history (round-12 verdict #1).
    spill = os.environ.get("DUCKDB_TEMP_DIR", "/tmp/duckdb_spill")
    os.makedirs(spill, exist_ok=True)
    con.execute(f"SET temp_directory='{spill}'")
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        # the driver corpora are flat files; derived scale-curve corpora
        # (tools/gen_scaled_sf.py) are Spark-written DIRECTORIES of part
        # files — glob those so DuckDB sees the same rows Spark reads
        path = f"{args.sf}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")

    passed = failed = 0
    for name in names:
        if name not in qs:
            print(f"{name}: NOT REGISTERED")
            failed += 1
            continue
        t0 = time.time()
        try:
            sdf = qs[name](spark, args.sf)
            s_cols = list(sdf.columns)
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"{name}: SPARK ERROR {type(e).__name__}: {e}")
            failed += 1
            continue
        if name not in oracles:
            print(f"{name}: rows-only ({len(s_rows)} rows, {time.time()-t0:.1f}s)")
            passed += 1
            continue
        try:
            rel = con.sql(oracles[name])
            d_cols = list(rel.columns)
            d_types = [str(t) for t in rel.types]
            d_rows = rel.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"{name}: ORACLE ERROR {type(e).__name__}: {e}")
            failed += 1
            continue

        problems = []
        # int128-typed oracle columns (DuckDB defaults SUM(BIGINT) to
        # HUGEINT) hash differently on some driver stacks — ban them so
        # the hazard fails HERE, not only at the driver
        huge = [f"{c}:{t}" for c, t in zip(d_cols, d_types) if "HUGEINT" in t.upper()]
        if huge:
            problems.append(f"HUGEINT-typed oracle column(s) {huge} — CAST to BIGINT")
        if len(s_rows) != len(d_rows):
            problems.append(f"rows {len(s_rows)} vs {len(d_rows)}")
        if sorted(c.lower() for c in s_cols) != sorted(c.lower() for c in d_cols):
            problems.append(f"cols {sorted(s_cols)} vs {sorted(d_cols)}")
        if not problems:
            sh = value_hash([c.lower() for c in s_cols], s_rows)
            dh = value_hash([c.lower() for c in d_cols], d_rows)
            if sh != dh:
                problems.append("value-hash mismatch")
                if args.show_diff:
                    order_s = sorted(range(len(s_cols)), key=lambda i: s_cols[i].lower())
                    order_d = sorted(range(len(d_cols)), key=lambda i: d_cols[i].lower())
                    ls = sorted("|".join(normalize(r[i]) for i in order_s) for r in s_rows)
                    ld = sorted("|".join(normalize(r[i]) for i in order_d) for r in d_rows)
                    shown = 0
                    for a, b in zip(ls, ld):
                        if a != b:
                            print(f"  spark:  {a}\n  oracle: {b}")
                            shown += 1
                            if shown >= 5:
                                break
        if problems:
            print(f"{name}: FAIL ({'; '.join(problems)})")
            failed += 1
        else:
            print(f"{name}: PASS ({len(s_rows)} rows, {time.time()-t0:.1f}s)")
            passed += 1

    print(f"\n{passed} passed, {failed} failed")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
