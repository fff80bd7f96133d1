"""Incremental ingestion: new document files resolved per micro-batch via
foreachBatch; exactly-once across restarts (checkpointed file source)."""

import os
import shutil

import pyspark.sql.functions as F

from refined_spark import fixtures
from refined_spark.streaming.incremental import incremental_resolve


def test_incremental_resolve(spark, tables, fixture_paths, tmp_path):
    in_dir = str(tmp_path / "incoming")
    out_dir = str(tmp_path / "resolved")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(in_dir)

    # batch 1: first half of the fixture docs as one file
    docs = spark.read.parquet(fixture_paths["documents"])
    docs.where(F.col("doc_id") < "doc-000060").write.parquet(f"{in_dir}/b1.parquet")

    q = incremental_resolve(
        spark, in_dir, out_dir, ckpt,
        tables["pem"], tables["entity_meta"], tables["entity_embeddings"],
        tables["human_qcodes"],
    )
    q.awaitTermination(120)
    n1 = spark.read.parquet(out_dir).select("mention_id").distinct().count()
    assert n1 > 0

    # batch 2: the rest arrives; restart stream from the same checkpoint —
    # already-processed files must NOT be reprocessed (no duplicate mentions)
    docs.where(F.col("doc_id") >= "doc-000060").write.parquet(f"{in_dir}/b2.parquet")
    q2 = incremental_resolve(
        spark, in_dir, out_dir, ckpt,
        tables["pem"], tables["entity_meta"], tables["entity_embeddings"],
        tables["human_qcodes"],
    )
    q2.awaitTermination(120)
    out = spark.read.parquet(out_dir)
    total = out.count()
    distinct = out.select("mention_id").distinct().count()
    assert total == distinct, "micro-batch reprocessing duplicated mentions"
    assert distinct > n1
