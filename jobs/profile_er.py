"""Stage-level timing of the er_pipeline bench workload: run the full
pipeline warm, then time each stage boundary by materializing prefixes.
Usage: python jobs/profile_er.py [n_runs]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import ensure_er_corpus, materialize, _unpersist_all
from refined_spark.session import get_spark
from refined_spark.operators import clustering, coref, pem, scoring, spans
from refined_spark.plans import pipeline

corpus = ensure_er_corpus()
spark = get_spark(app_name="profile_er", master="local[32]")
spark.sparkContext.setLogLevel("ERROR")
load = lambda k: spark.read.parquet(f"{corpus}/{k}.parquet")

def t(fn):
    t0 = time.time()
    fn()
    return round(time.time() - t0, 2)

def full():
    docs = load("documents")
    out = pipeline.run(spark, docs, load("pem"), load("entity_meta"),
                       load("entity_embeddings"), load("human_qcodes"))
    materialize(out)
    _unpersist_all(spark)

# settle the JVM: the fused plan reaches steady state around run 3-4
runs = int(sys.argv[1]) if len(sys.argv) > 1 else 4
settle = [t(full) for _ in range(runs)]

docs = load("documents")
if docs.rdd.getNumPartitions() < 32:
    docs = docs.repartition(32)
mentions = pipeline.build_mentions(docs)
cands = pem.candidate_join(mentions, load("pem"), entity_meta=load("entity_meta"))
merged = coref.propagate_person_coref(cands, load("human_qcodes"),
                                      mentions=mentions, entity_meta=load("entity_meta"))
stage_secs = {}
stage_secs["mentions"] = t(lambda: materialize(mentions))
stage_secs["candidates"] = t(lambda: materialize(cands))
stage_secs["coref(full-prefix)"] = t(lambda: materialize(merged))
ctx = scoring.mention_window_embeddings(docs)
stage_secs["ctx_windows(alone)"] = t(lambda: materialize(ctx))
fused = scoring.score_resolve_fused(merged, load("entity_embeddings"), ctx,
                                    mentions=mentions)
stage_secs["resolved(full-prefix)"] = t(lambda: materialize(fused))
resolved = fused.localCheckpoint(eager=True)
stage_secs["cc(clusters)"] = t(lambda: materialize(clustering.cluster_assignments(resolved)))
out = resolved.join(clustering.cluster_assignments(resolved), "mention_id")
stage_secs["final_join"] = t(lambda: materialize(out))
print(json.dumps({"settle": settle, "stages": stage_secs,
                  "load": round(os.getloadavg()[0], 2)}))
spark.stop()
