"""Extra measurement harness for optimization rounds (bench.py is FROZEN
for driver measurement; everything exploratory lives here — guide §1.4).

Times individual catalog queries through the noop sink with the same
methodology as bench.py (2 passes, per-query min, machine-busy gate) at an
arbitrary SF dir, and optionally dumps .explain("formatted") per query for
the plans/ evidence files.

Usage:
  python bench_extra.py --sf /root/testdata/sf1.0 \
      --queries ngram_jaccard,embedding_neardup [--passes 2] \
      [--plans-dir plans/r06 --plans-tag before]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

os.environ.setdefault("REFINED_SPARK_TMPFS_SHUFFLE", "1")

MAX_BUSY = float(os.environ.get("REFINED_SPARK_MAX_BENCH_BUSY", "0.15"))


def _busy_frac(interval: float = 1.0) -> float:
    def snap():
        with open("/proc/stat") as f:
            parts = f.readline().split()[1:]
        vals = [int(x) for x in parts]
        idle = vals[3] + (vals[4] if len(vals) > 4 else 0)
        return idle, sum(vals)

    i0, t0 = snap()
    time.sleep(interval)
    i1, t1 = snap()
    dt = t1 - t0
    return 1.0 - (i1 - i0) / dt if dt else 0.0


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                                   "/root/testdata/sf0.1"))
    ap.add_argument("--queries", default=None,
                    help="comma-separated subset; default = bench.py HEADLINE")
    ap.add_argument("--passes", type=int, default=2)
    ap.add_argument("--plans-dir", default=None)
    ap.add_argument("--plans-tag", default="before")
    ap.add_argument("--no-gate", action="store_true")
    args = ap.parse_args()

    from bench import HEADLINE
    from refined_spark import queries as Q
    from refined_spark.session import get_spark

    names = args.queries.split(",") if args.queries else list(HEADLINE)
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="bench_extra", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    if args.plans_dir:
        os.makedirs(args.plans_dir, exist_ok=True)
        for name in names:
            df = Q.QUERIES[name](spark, args.sf)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            with open(os.path.join(args.plans_dir,
                                   f"{name}_{args.plans_tag}.txt"), "w") as f:
                f.write(plan)

    timings: dict[str, float] = {}
    samples: dict[str, list[float]] = {}
    for _pass in range(args.passes):
        for name in names:
            fn = Q.QUERIES[name]
            if not args.no_gate:
                for _ in range(30):
                    if _busy_frac() <= MAX_BUSY:
                        break
                    time.sleep(4)
            spark.sparkContext.setJobDescription(f"{name} pass{_pass}")
            t0 = time.time()
            materialize(fn(spark, args.sf))
            dt = round(time.time() - t0, 3)
            spark.sparkContext.setJobDescription(None)
            samples.setdefault(name, []).append(dt)
            timings[name] = min(timings.get(name, dt), dt)

    print(json.dumps({
        "metric": "bench_extra",
        "sf_dir": args.sf,
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "samples": samples,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
