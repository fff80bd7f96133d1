"""A/B: fused cogrouped scoring vs the row-join plan on the er_pipeline
bench corpus, interleaved in ONE session (same JVM warmth for both arms).
Methodology per BENCH.md: >=1 warm-up per arm, then alternating measured
runs, report every sample + loadavg — never a single-run verdict.

Usage: python jobs/ab_fused.py [n_rounds]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import (MAX_BENCH_BUSY, _busy_frac, _cpu_steal_seconds,
                   _unpersist_all, ensure_er_corpus, materialize)
from refined_spark.session import get_spark
from refined_spark.plans import pipeline

rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
corpus = ensure_er_corpus()
spark = get_spark(app_name="ab_fused", master="local[32]")
spark.sparkContext.setLogLevel("ERROR")
load = lambda k: spark.read.parquet(f"{corpus}/{k}.parquet")


def run(fused: bool) -> tuple[float, float]:
    """Returns (seconds, stolen_vcpus). Waits for the instantaneous machine
    busy fraction to drop first (same gate as bench.py — we are idle here,
    so busy == host noise), and annotates each sample with the hypervisor
    steal it absorbed so contaminated samples are identifiable."""
    for _ in range(60):
        if _busy_frac() <= MAX_BENCH_BUSY:
            break
        time.sleep(4)
    st0 = _cpu_steal_seconds()
    t0 = time.time()
    out = pipeline.run(
        spark, load("documents"), load("pem"), load("entity_meta"),
        load("entity_embeddings"), load("human_qcodes"),
        fused_scoring=fused,
    )
    materialize(out)
    dt = time.time() - t0
    _unpersist_all(spark)
    return round(dt, 2), round((_cpu_steal_seconds() - st0) / dt, 2)


samples = {"fused": [], "rowjoin": [], "load": [],
           "fused_steal": [], "rowjoin_steal": []}
run(True)  # warm-up: codegen compile + C2 tiering
run(False)
for _ in range(rounds):
    samples["load"].append(round(os.getloadavg()[0], 2))
    f_dt, f_st = run(True)
    r_dt, r_st = run(False)
    samples["fused"].append(f_dt)
    samples["rowjoin"].append(r_dt)
    samples["fused_steal"].append(f_st)
    samples["rowjoin_steal"].append(r_st)
samples["min_fused"] = min(samples["fused"])
samples["min_rowjoin"] = min(samples["rowjoin"])
print(json.dumps(samples))
# persist for BENCH.md (bench._write_bench_md includes this table)
with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "ab_fused_result.json"), "w") as f:
    json.dump(samples, f)
spark.stop()
