"""spark-submit entrypoint for the entity-resolution pipeline.

    spark-submit --py-files dist/refined_spark.zip jobs/run_pipeline.py \
        --input <corpus_dir> --output <out_dir> [--store <snapshot_dir>] \
        [--salted] [--evaluate]

Reads the interleaved documents corpus + dictionary tables from --input
(parquet: documents, pem, entity_meta, entity_embeddings, human_qcodes
[, gold_mentions]), runs blocking -> coref -> scoring -> resolution ->
clustering, writes (mention_id, doc_id, block_key, offset, qcode, score,
cluster_id) parquet to --output. With --store, every stage commits a
resumable snapshot (kill/rerun resumes at the first uncommitted stage).
With --evaluate and a gold_mentions table present, prints pairwise F1 as
one JSON line.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str]) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--store", default=None)
    ap.add_argument("--salted", action="store_true")
    ap.add_argument("--evaluate", action="store_true")
    args = ap.parse_args(argv)

    # imports AFTER arg parsing: on a cluster these resolve from --py-files
    from pyspark.sql import SparkSession

    from refined_spark.plans import pipeline
    from refined_spark.plans.snapshots import StageStore

    spark = SparkSession.builder.appName("refined_spark_pipeline").getOrCreate()

    load = lambda k: spark.read.parquet(f"{args.input}/{k}.parquet")
    store = StageStore(args.store) if args.store else None
    out = pipeline.run(
        spark,
        load("documents"),
        load("pem"),
        load("entity_meta"),
        load("entity_embeddings"),
        load("human_qcodes"),
        store=store,
        salted=args.salted,
    )
    out.write.mode("overwrite").parquet(args.output)

    if args.evaluate:
        gold = load("gold_mentions")
        result = spark.read.parquet(args.output)
        m = pipeline.evaluate(result, gold)
        print(json.dumps(m))
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1:])
