"""Benchmark harness.

Default run: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]; prints ONE JSON line
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}.

--scaling: runs the ER pipeline (the north-rule workload, on the
deterministic interleaved-document corpus) at local[8] and local[32] on the
SAME input and writes throughput at both plus scaling efficiency to BENCH.md
— the sandbox stand-in for the N vs 4N executor criterion.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
BENCH_FIXTURE_DIR = os.environ.get(
    "REFINED_SPARK_BENCH_DATA", "/tmp/refined_spark_bench_corpus"
)
# ER corpus scale for the bench: ~sf0.1-proportionate
ER_DOCS = int(os.environ.get("REFINED_SPARK_BENCH_DOCS", "20000"))
ER_ENTITIES = int(os.environ.get("REFINED_SPARK_BENCH_ENTITIES", "1500"))
# scaling mode uses a larger corpus so compute dominates fixed driver
# latency — the quantity the N->4N criterion is about
SCALING_DOCS = int(os.environ.get("REFINED_SPARK_SCALING_DOCS", "120000"))
SCALING_ENTITIES = int(os.environ.get("REFINED_SPARK_SCALING_ENTITIES", "4000"))

HEADLINE = [
    "pricing_summary",
    "revenue_by_nation",
    "topk_orders_per_customer",
    "pem_build",
    "candidate_join",
    "minhash_signatures",
    "ngram_jaccard",
    "ann_bruteforce",
    "token_stats",
    "quality_score",
    "lang_id",
    "fingerprint",
    "event_sessionize",
]


def ensure_er_corpus(n_docs: int = ER_DOCS, n_entities: int = ER_ENTITIES) -> str:
    from refined_spark import fixtures

    tag = f"d{n_docs}_e{n_entities}_s42"
    out = os.path.join(BENCH_FIXTURE_DIR, tag)
    marker = os.path.join(out, "_DONE")
    if not os.path.exists(marker):
        fixtures.generate(out, n_docs=n_docs, n_entities=n_entities, seed=42)
        with open(marker, "w") as f:
            f.write("ok")
    return out


def _unpersist_all(spark) -> None:
    """Free localCheckpoint/cache RDDs between runs — they otherwise
    accumulate in the JVM and each successive run gets slower."""
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    for rdd in jmap.values():
        rdd.unpersist()


def run_er_pipeline(spark, corpus_dir: str) -> tuple[float, int]:
    """Returns (seconds, n_docs) for the full blocking->scoring->clustering
    pipeline (no snapshot IO — measures compute+shuffle)."""
    from refined_spark.plans import pipeline

    load = lambda k: spark.read.parquet(f"{corpus_dir}/{k}.parquet")
    docs = load("documents")
    n_docs = docs.count()
    t0 = time.time()
    out = pipeline.run(
        spark,
        docs,
        load("pem"),
        load("entity_meta"),
        load("entity_embeddings"),
        load("human_qcodes"),
    )
    out.count()
    dt = time.time() - t0
    _unpersist_all(spark)
    return dt, n_docs


def main_bench() -> None:
    from refined_spark import queries as Q
    from refined_spark.session import get_spark

    spark = get_spark(app_name="refined_spark_bench", master=f"local[{CPUS}]",
                      shuffle_partitions=int(CPUS))
    spark.sparkContext.setLogLevel("ERROR")

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = Q.QUERIES[name]
        t0 = time.time()
        fn(spark, SF_DIR).count()
        timings[name] = round(time.time() - t0, 3)

    corpus = ensure_er_corpus()
    # one uncounted warm-up: the first execution of the fused ER plan pays
    # ~60-90s of one-time whole-stage-codegen (Janino) compilation that the
    # codegen cache then absorbs — steady-state throughput is the honest
    # number (the one-time compile amortizes to nothing at 100 TB)
    run_er_pipeline(spark, corpus)
    er_sec, n_docs = run_er_pipeline(spark, corpus)
    timings["er_pipeline"] = round(er_sec, 3)

    total = round(sum(timings.values()), 3)
    sf = SF_DIR.rstrip("/").split("sf")[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "er_docs_per_sec": round(n_docs / er_sec, 1),
            }
        )
    )
    spark.stop()


def er_run(corpus: str, cores: int, runs: int = 3) -> None:
    """Subprocess body: one JVM pinned to `cores` CPUs (via taskset in the
    parent), warm-up + `runs` measured runs, prints one JSON line."""
    from refined_spark.session import get_spark

    spark = get_spark(
        app_name=f"refined_spark_scaling_{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=max(cores, 8),
    )
    spark.sparkContext.setLogLevel("ERROR")
    run_er_pipeline(spark, corpus)  # warm-up (JVM/codegen/broadcast)
    secs = []
    n_docs = 0
    for _ in range(runs):
        sec, n_docs = run_er_pipeline(spark, corpus)
        secs.append(sec)
    secs.sort()
    med = secs[len(secs) // 2]
    print(json.dumps({"sec": med, "all_secs": secs,
                      "docs_per_sec": n_docs / med, "n_docs": n_docs}))
    spark.stop()


def main_scaling() -> None:
    """ER pipeline at 8 vs 32 CPUS on the same corpus -> BENCH.md.
    Each parallelism level runs in its own subprocess pinned with taskset so
    GC/python-worker threads cannot leak extra cores into the N-core run;
    median of 3 measured runs."""
    import subprocess

    corpus = ensure_er_corpus(SCALING_DOCS, SCALING_ENTITIES)
    results = {}
    for cores in (8, 32):
        cmd = [
            "taskset", "-c", f"0-{cores - 1}",
            sys.executable, os.path.abspath(__file__),
            "--er-run", corpus, str(cores),
        ]
        out = subprocess.run(cmd, capture_output=True, text=True, check=True)
        line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
        results[cores] = json.loads(line)

    eff = (results[32]["docs_per_sec"] / results[8]["docs_per_sec"]) / 4.0
    lines = [
        "# BENCH — ER pipeline throughput & scaling (sandbox evidence for the",
        "# N -> 4N executor criterion: same job, same input, local[8] vs local[32])",
        "",
        f"corpus: {results[8]['n_docs']} interleaved documents "
        f"({SCALING_ENTITIES} entities), deterministic seed 42",
        "",
        "| parallelism | wall-clock (s) | docs/sec |",
        "|---|---|---|",
        f"| local[8]  (N)  | {results[8]['sec']:.2f} | {results[8]['docs_per_sec']:.1f} |",
        f"| local[32] (4N) | {results[32]['sec']:.2f} | {results[32]['docs_per_sec']:.1f} |",
        "",
        f"**scaling efficiency (throughput_4N / throughput_N) / 4 = {eff:.3f}** "
        f"(target >= 0.8)",
        "",
        "Reference single-node CPU baseline: 7.8 docs/s (AIDA, README.md:225 of",
        "the reference); this pipeline's per-core docs/sec at local[8] is "
        f"{results[8]['docs_per_sec'] / 8:.1f}.",
    ]
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print(json.dumps({"scaling_efficiency": round(eff, 3), **{f"local{k}": v for k, v in results.items()}}))


if __name__ == "__main__":
    if "--er-run" in sys.argv:
        i = sys.argv.index("--er-run")
        er_run(sys.argv[i + 1], int(sys.argv[i + 2]))
    elif "--scaling" in sys.argv:
        main_scaling()
    else:
        main_bench()
