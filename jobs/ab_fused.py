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

from bench import ensure_er_corpus, materialize, _unpersist_all
from refined_spark.session import get_spark
from refined_spark.plans import pipeline

rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
corpus = ensure_er_corpus()
spark = get_spark(app_name="ab_fused", master="local[32]")
spark.sparkContext.setLogLevel("ERROR")
load = lambda k: spark.read.parquet(f"{corpus}/{k}.parquet")


def run(fused: bool) -> float:
    t0 = time.time()
    out = pipeline.run(
        spark, load("documents"), load("pem"), load("entity_meta"),
        load("entity_embeddings"), load("human_qcodes"),
        fused_scoring=fused,
    )
    materialize(out)
    dt = time.time() - t0
    _unpersist_all(spark)
    return round(dt, 2)


samples = {"fused": [], "rowjoin": [], "load": []}
run(True)  # warm-up: codegen compile + C2 tiering
run(False)
for _ in range(rounds):
    samples["load"].append(round(os.getloadavg()[0], 2))
    samples["fused"].append(run(True))
    samples["rowjoin"].append(run(False))
samples["min_fused"] = min(samples["fused"])
samples["min_rowjoin"] = min(samples["rowjoin"])
print(json.dumps(samples))
# persist for BENCH.md (bench._write_bench_md includes this table)
with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "ab_fused_result.json"), "w") as f:
    json.dump(samples, f)
spark.stop()
