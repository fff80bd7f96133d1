"""Classify the non-scaling fraction of a gated stage.

Runs one stage body at a pinned core count (taskset in the caller) with:
  - a background /proc/stat sampler (busy cores, 0.25 s grain)
  - wall timestamps around every internal driver step

Output: a phase table (step, wall, mean busy cores during it) that says
whether the wide arm loses time to DRIVER SERIAL work (busy ~1 core) or
to SATURATION (busy == arm width but wall too long).

Usage:  taskset -c 0-15 python jobs/profile_scaling.py clustering_global 16
"""
from __future__ import annotations

import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("REFINED_SPARK_TMPFS_SHUFFLE", "1")

CORPUS = os.environ.get(
    "PROF_CORPUS", "/tmp/refined_spark_bench_corpus/d360000_e8000_s42"
)
PREP = os.path.join(CORPUS, "_stage_prep_a16_v4")


class Sampler(threading.Thread):
    def __init__(self, grain: float = 0.25):
        super().__init__(daemon=True)
        self.grain = grain
        self.samples: list[tuple[float, float]] = []  # (t, busy_cores)
        self.stop_flag = False

    @staticmethod
    def _snap():
        with open("/proc/stat") as f:
            parts = [int(x) for x in f.readline().split()[1:]]
        idle = parts[3] + parts[4]
        return idle, sum(parts)

    def run(self):
        i0, t0 = self._snap()
        ncpu = os.cpu_count()
        while not self.stop_flag:
            time.sleep(self.grain)
            i1, t1 = self._snap()
            dt = t1 - t0
            busy = (1.0 - (i1 - i0) / dt) * ncpu if dt else 0.0
            self.samples.append((time.time(), busy))
            i0, t0 = i1, t1


class Phases:
    def __init__(self, sampler: Sampler):
        self.sampler = sampler
        self.marks: list[tuple[str, float]] = [("start", time.time())]

    def mark(self, name: str):
        self.marks.append((name, time.time()))

    def report(self):
        print(f"\n{'phase':<38}{'wall_s':>9}{'busy_cores':>12}")
        for (name, t0), (_, t1) in zip(self.marks, self.marks[1:]):
            window = [b for (t, b) in self.sampler.samples if t0 <= t <= t1]
            busy = sum(window) / len(window) if window else float("nan")
            print(f"{name:<38}{t1 - t0:>9.2f}{busy:>12.1f}")
        total = self.marks[-1][1] - self.marks[0][1]
        print(f"{'TOTAL':<38}{total:>9.2f}")


def main():
    stage, cores = sys.argv[1], int(sys.argv[2])
    from pyspark.sql import functions as F

    from refined_spark.operators import clustering, scoring
    from refined_spark.session import get_spark

    spark = get_spark(
        app_name=f"profile_{stage}_{cores}", master=f"local[{cores}]",
        shuffle_partitions=96, scale_profile=True,
    )
    spark.sparkContext.setLogLevel("ERROR")

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    if stage == "clustering_global":
        resolved = spark.read.parquet(f"{PREP}/resolved_amp.parquet").drop("shard")

        def body(ph=None):
            mk = ph.mark if ph else (lambda *_: None)
            m = resolved.select(
                "mention_id", "qcode", F.xxhash64("mention_id").alias("mid"))
            anchors = m.where(F.col("qcode").isNotNull()).select(
                "mention_id", "mid",
                F.xxhash64(F.lit("ENT:"), "qcode").alias("eid"))
            edges = anchors.select(
                F.col("mid").alias("src"), F.col("eid").alias("dst"))
            mk("plan:edges built")
            cur = edges.select(
                F.greatest("src", "dst").alias("src"),
                F.least("src", "dst").alias("dst"),
            ).where(F.col("src") != F.col("dst"))
            cur = cur.localCheckpoint(eager=False)
            after = clustering._small_star(clustering._large_star(cur))
            after = after.localCheckpoint(eager=False)
            mk("plan:round built")
            v = clustering._violation_count(after)
            mk(f"job:violation_count (v={v})")
            comp = after.select(
                F.col("src").alias("node"), F.col("dst").alias("component"))
            roots = after.select("dst").distinct().select(
                F.col("dst").alias("node"), F.col("dst").alias("component"))
            assigned = m.join(
                comp.unionByName(roots), m["mid"] == F.col("node"), "left"
            ).select(
                "mention_id",
                F.coalesce(F.col("component"), F.col("mid")).alias("cluster_id"),
            )
            mk("plan:assemble built")
            noop(assigned)
            mk("job:final materialize")

    elif stage == "scoring":
        merged = spark.read.parquet(f"{PREP}/merged.parquet")
        mention_attrs = spark.read.parquet(f"{PREP}/mentions.parquet")
        docs = spark.read.parquet(f"{CORPUS}/documents.parquet")
        emb = spark.read.parquet(f"{CORPUS}/entity_embeddings.parquet")
        ctx = scoring.mention_window_embeddings(docs)
        fused = scoring.score_resolve_fused(merged, emb, ctx, mentions=mention_attrs)
        assert fused is not None

        def body(ph=None):
            mk = ph.mark if ph else (lambda *_: None)
            noop(fused)
            mk("job:fused materialize")

    else:
        raise SystemExit(f"unknown stage {stage}")

    # warm-ups
    for i in range(2):
        t0 = time.time()
        body()
        print(f"warmup {i}: {time.time() - t0:.2f}s", flush=True)
        for (_id, rdd) in list(spark.sparkContext._jsc.getPersistentRDDs().items()):
            rdd.unpersist()
        spark.sparkContext._jvm.System.gc()
        time.sleep(1)

    s = Sampler()
    s.start()
    ph = Phases(s)
    body(ph)
    s.stop_flag = True
    time.sleep(0.3)
    ph.report()
    spark.stop()


if __name__ == "__main__":
    main()
