"""Side-by-side Spark vs DuckDB oracle check for a subset of catalog
queries at one or more SF dirs — the same comparison as
tests/test_oracle_parity.py, runnable at any scale while iterating on an
optimization (the driver's gate runs at sf0.01; this lets us also prove
equality at sf0.1/sf1.0 where fp-order effects would be likeliest to
surface).

Usage: python jobs/check_parity.py --queries a,b --sfs /root/testdata/sf0.01,...
"""

from __future__ import annotations

import argparse
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("REFINED_SPARK_TMPFS_SHUFFLE", "1")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def values(rows, cols):
    return sorted(tuple(r[c] for c in cols) for r in rows)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", required=True)
    ap.add_argument("--sfs", default="/root/testdata/sf0.01")
    args = ap.parse_args()

    import duckdb

    from refined_spark import queries as Q
    from refined_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="check_parity", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    failures = 0
    for sf in args.sfs.split(","):
        con = duckdb.connect()
        for t in TABLES:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
        for name in args.queries.split(","):
            sdf = Q.QUERIES[name](spark, sf)
            cols = sorted(sdf.columns)
            s_vals = values([r.asDict() for r in sdf.collect()], cols)
            ddf = con.execute(Q.ORACLES[name]).fetch_df()
            assert sorted(ddf.columns) == cols, (name, sf, ddf.columns, cols)
            d_vals = values(ddf.to_dict("records"), cols)
            ok = len(s_vals) == len(d_vals)
            bad = None
            if ok:
                for a, b in zip(s_vals, d_vals):
                    for x, y in zip(a, b):
                        if isinstance(x, float) or isinstance(y, float):
                            fx, fy = float(x), float(y)
                            if not (fx == fy or (math.isnan(fx) and math.isnan(fy))):
                                ok, bad = False, (a, b)
                                break
                        elif x != y:
                            ok, bad = False, (a, b)
                            break
                    if not ok:
                        break
            print(f"{sf} {name}: rows={len(s_vals)}/{len(d_vals)} "
                  f"{'OK' if ok else 'MISMATCH ' + str(bad)}")
            if not ok:
                failures += 1
        con.close()
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
