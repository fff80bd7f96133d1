"""A/B: kernel-time fixes on the wide arm at the 9x amortization corpus.

Motivation (measured, round 4): the 3.24M-doc e2e point at 16 cores came
in 25% over its Amdahl prediction (420.6 s vs 337.8 s) while the 4-core
arm beat its own line. Per-run /proc/stat probes during the wide run
show the miss is NOT barriers (busy ~= 16 the whole run) but kernel
time: sys bursts to ~11 of 16 busy cores during the exchange-heavy
phases. Burst-gated attribution: ~64-116k page faults/s machine-wide
(JVM ~20k/s, Python workers the rest), zero disk I/O, zero THP/
compaction/reclaim activity, GC ~1.5% of wall — i.e. each fault costs
~100 us, the signature of minor faults serializing on one mm's lock
while other threads map/unmap (mmap_lock write holders + TLB
shootdowns). The JVM's mapping churn comes from shuffle-block reads:
local fetches memory-map any block over spark.storage.memoryMapThreshold
(default 2 MB), and the 9x corpus is the first input whose exchange
blocks cross that line, so every reduce task faults its way through
mapped tmpfs pages 16 threads at a time.

Arms (fresh JVM each, one warm-up then one measured run, probes on):
  mmap2g  — spark.storage.memoryMapThreshold=2g: local shuffle blocks are
            pread into heap buffers (kernel memcpy, no page faults, no
            mm-lock contention, no munmap TLB shootdowns)
  mmap2g_batch100k — the above + Arrow batches 10k -> 100k records
            (fewer JVM<->Python round trips; tests whether worker-side
            fault churn scales with batch COUNT)

Baseline (conf unchanged) is the bench.py --stage-run e2e measurement
recorded in jobs/e2e_amortize_result.json.

Usage: taskset -c 0-15 python jobs/ab_arrow_batch.py <corpus_dir> [cores]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _cpu_busy_sys_seconds, _cpu_steal_seconds, run_er_pipeline

ARMS = [
    ("mmap2g", {"spark.storage.memoryMapThreshold": "2g"}),
    ("mmap2g_batch100k", {
        "spark.storage.memoryMapThreshold": "2g",
        "spark.sql.execution.arrow.maxRecordsPerBatch": "100000",
    }),
]


def one_arm(corpus: str, cores: int, name: str, conf: dict) -> dict:
    """Fresh JVM per arm (these confs are read at plan/exec time)."""
    from refined_spark.session import get_spark

    os.environ["REFINED_SPARK_TMPFS_SHUFFLE"] = "1"
    spark = get_spark(
        app_name=f"ab_{name}",
        master=f"local[{cores}]",
        shuffle_partitions=96,
        scale_profile=True,
        extra_conf=conf,
    )
    spark.sparkContext.setLogLevel("ERROR")
    run_er_pipeline(spark, corpus)  # warm-up: codegen + C2 tiering
    st0 = _cpu_steal_seconds()
    bs0 = _cpu_busy_sys_seconds()
    t0 = time.time()
    _, n_docs = run_er_pipeline(spark, corpus)
    dt = time.time() - t0
    bs1 = _cpu_busy_sys_seconds()
    row = {
        "arm": name,
        "sec": round(dt, 2),
        "docs_per_sec": round(n_docs / dt, 1),
        "busy_cores": round((bs1[0] - bs0[0]) / dt, 2),
        "sys_cores": round((bs1[1] - bs0[1]) / dt, 2),
        "steal_cores": round((_cpu_steal_seconds() - st0) / dt, 2),
    }
    spark.stop()
    return row


def main() -> None:
    corpus = sys.argv[1]
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    rows = [one_arm(corpus, cores, name, conf) for name, conf in ARMS]
    out = {"corpus": corpus, "cores": cores, "rows": rows}
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "ab_arrow_batch_result.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
