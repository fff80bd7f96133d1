"""Per-stage CPU-second matrix for the e2e work-inflation investigation.

Round-4 finding (jobs/e2e_amortize_result.json): on the identical corpus
the 16-core e2e arm burns ~63% more CPU-seconds than the 4-core arm at
steal~0 with all cores BUSY — wall-clock efficiency falls with corpus
size instead of rising along the Amdahl fit. Busy-but-slower means work
inflation, and it can hide in exactly one place per stage; this job
produces the evidence of WHERE.

Method: the same pipeline the e2e bench times (bench.run_er_pipeline's
dataflow), but cut at every stage boundary — each stage writes parquet
to tmpfs and the next stage reads it back, so the (busy, sys) CPU delta
around one stage charges only that stage's compute (plus its own tmpfs
IO, visible as sys). Identical job config to the amortize arms
(scale_profile=True, shuffle_partitions=96) at both widths; one warm
rep then `reps` measured reps per stage, min-wall rep reported with its
own CPU columns, all samples retained.

Usage:
  taskset -c 0-3  python jobs/profile_inflation.py <corpus> 4  [reps] [stage,stage,...]
  taskset -c 0-15 python jobs/profile_inflation.py <corpus> 16 [reps] [stage,stage,...]

The optional stage list re-measures only those stages (earlier stages
still execute once, unmeasured, to produce the parquet inputs).

Appends one JSON line per run to jobs/profile_inflation_result.jsonl.
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("REFINED_SPARK_TMPFS_SHUFFLE", "1")

from bench import _cpu_busy_sys_seconds, _cpu_steal_seconds, materialize, _unpersist_all  # noqa: E402
from refined_spark.session import get_spark  # noqa: E402

RESULT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "profile_inflation_result.jsonl")


def calibrate_cpu(n: int = 200_000) -> float:
    """Single-thread fixed-work calibration: MB/s of sha256 over a 4 KB
    buffer, n rounds (~0.3 s quiet). Logged before every stage sample — if
    this rate collapses in the same windows where identical Spark work
    triples its CPU bill, the slowdown is the BOX (host contention
    throttling delivered cycles), not the engine."""
    import hashlib
    buf = b"x" * 4096
    t0 = time.time()
    h = hashlib.sha256()
    for _ in range(n):
        h.update(buf)
    dt = time.time() - t0
    return round(n * 4096 / 1024 / 1024 / dt, 1)


def jvm_gc_seconds(spark) -> float:
    """Cumulative GC time of the local-mode JVM (driver == executors) from
    the GarbageCollector MXBeans — the delta across a stage separates 'GC
    grew superlinearly with task concurrency' from 'the kernels got
    slower'."""
    beans = (spark.sparkContext._jvm.java.lang.management.ManagementFactory
             .getGarbageCollectorMXBeans())
    return sum(b.getCollectionTime() for b in beans) / 1000.0


def proc_class_cpu() -> dict[str, float]:
    """Cumulative (utime+stime) CPU seconds by process class: the Spark
    JVM ('java') vs the pyspark daemon/workers ('python'). Machine-wide
    scan is fine — the profiler owns the box. Splits each stage's busy
    CPU into JVM-side vs Python-worker-side inflation. The split is
    approximate across worker restarts: the counters are cumulative
    per-PID, so a worker exiting between two snapshots takes its CPU
    with it and the raw delta can go negative — callers clamp at 0."""
    tck = os.sysconf("SC_CLK_TCK")
    out = {"java": 0.0, "python": 0.0}
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/stat") as f:
                parts = f.read().rsplit(")", 1)[1].split()
            comm = open(f"/proc/{pid}/comm").read().strip()
        except OSError:
            continue
        cpu = (int(parts[11]) + int(parts[12])) / tck  # utime+stime
        if comm == "java":
            out["java"] += cpu
        elif comm.startswith("python"):
            out["python"] += cpu
    return out


def main() -> None:
    corpus = sys.argv[1]
    cores = int(sys.argv[2])
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2

    from refined_spark.operators import clustering, coref, pem, scoring
    from refined_spark.plans import pipeline

    spark = get_spark(app_name=f"inflation_{cores}", master=f"local[{cores}]",
                      shuffle_partitions=96, scale_profile=True)
    spark.sparkContext.setLogLevel("ERROR")
    load = lambda k: spark.read.parquet(f"{corpus}/{k}.parquet")

    work = "/dev/shm/inflation_stages"
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work)

    def sink(df, name):
        df.write.mode("overwrite").parquet(f"{work}/{name}.parquet")

    def src(name):
        return spark.read.parquet(f"{work}/{name}.parquet")

    docs = load("documents")
    if docs.rdd.getNumPartitions() < cores:
        docs = docs.repartition(cores)

    # stage factories: each returns a zero-arg body computing ONLY that
    # stage from materialized inputs. Order matters — later stages read
    # the parquet the earlier ones wrote.
    def s_mentions():
        sink(pipeline.build_mentions(docs), "mentions")

    def s_candidates():
        sink(pem.candidate_join(src("mentions"), load("pem"),
                                entity_meta=load("entity_meta")), "candidates")

    def s_coref():
        sink(coref.propagate_person_coref(
            src("candidates"), load("human_qcodes"),
            mentions=src("mentions"), entity_meta=load("entity_meta")),
            "merged")
        coref.release_cache()

    def s_ctx():
        sink(scoring.mention_window_embeddings(docs), "ctx")

    def s_fused():
        r = scoring.score_resolve_fused(
            src("merged"), load("entity_embeddings"), src("ctx"),
            mentions=src("mentions"))
        assert r is not None
        sink(r, "resolved")

    def s_cc():
        materialize(clustering.cluster_assignments(src("resolved")))

    def s_join():
        resolved = src("resolved")
        materialize(resolved.join(
            clustering.cluster_assignments(resolved), "mention_id"))

    stages = [("mentions", s_mentions), ("candidates", s_candidates),
              ("coref", s_coref), ("ctx", s_ctx), ("fused_resolve", s_fused),
              ("cc", s_cc), ("final_join", s_join)]
    only = set(sys.argv[4].split(",")) if len(sys.argv) > 4 else None

    out = {"corpus": corpus, "cores": cores, "reps": reps, "stages": {}}
    for name, body in stages:
        if only is not None and name not in only:
            body()  # unmeasured: produce the parquet input for later stages
            _unpersist_all(spark)
            continue
        body()  # warm: codegen compile + writes the stage output once
        _unpersist_all(spark)
        samples = []
        for _ in range(reps):
            cal0 = calibrate_cpu()
            st0 = _cpu_steal_seconds()
            b0, s0 = _cpu_busy_sys_seconds()
            g0 = jvm_gc_seconds(spark)
            c0 = proc_class_cpu()
            t0 = time.time()
            body()
            dt = time.time() - t0
            b1, s1 = _cpu_busy_sys_seconds()
            g1 = jvm_gc_seconds(spark)
            c1 = proc_class_cpu()
            samples.append({
                "wall": round(dt, 2),
                "busy_cpu_s": round(b1 - b0, 1),
                "sys_cpu_s": round(s1 - s0, 1),
                "gc_s": round(g1 - g0, 1),
                "jvm_cpu_s": round(max(0.0, c1["java"] - c0["java"]), 1),
                "py_cpu_s": round(max(0.0, c1["python"] - c0["python"]), 1),
                "steal_cores": round((_cpu_steal_seconds() - st0) / dt, 2),
                "cal_mbps_before": cal0,
                "cal_mbps_after": calibrate_cpu(),
            })
            _unpersist_all(spark)
        best = min(samples, key=lambda s: s["wall"])
        out["stages"][name] = {"best": best, "all": samples}
        print(json.dumps({name: out["stages"][name]["best"]}), flush=True)

    out["total_wall"] = round(
        sum(s["best"]["wall"] for s in out["stages"].values()), 2)
    out["total_busy_cpu_s"] = round(
        sum(s["best"]["busy_cpu_s"] for s in out["stages"].values()), 1)
    out["total_sys_cpu_s"] = round(
        sum(s["best"]["sys_cpu_s"] for s in out["stages"].values()), 1)
    with open(RESULT, "a") as f:
        f.write(json.dumps(out) + "\n")
    print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
