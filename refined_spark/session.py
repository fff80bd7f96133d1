"""SparkSession factory with scale-oriented defaults.

Designed for a 1000-executor cluster reading ~100 TB; tested on local[N].
Key choices:
  - AQE on (runtime coalescing, skew-join splitting) — the reference never
    faces shuffle skew because its alias lookup is an O(1) dict probe
    (/root/reference/src/refined/doc_preprocessing/candidate_generator.py:62-72);
    a distributed join on surface_form skews on hot aliases, so we rely on
    AQE + explicit salting (operators/pem.py).
  - Arrow enabled for pandas UDFs (all Python kernels are Arrow-batched).
  - shuffle partitions sized for the local test harness; on a real cluster
    set spark.sql.shuffle.partitions ~ 2-3x total cores and let AQE coalesce.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "refined_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    master = master or os.environ.get("SPARK_GRAFT_MASTER", "local[*]")
    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    if master == "local[$SPARK_GRAFT_CPUS]" or (master == "local[*]" and cpus):
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "96"))

    # scan parallelism: split files so every core gets work even on small
    # local inputs. Spark's split size is max(openCostInBytes, bytes/minPartitionNum)
    # capped at maxPartitionBytes; the 4 MB openCost default dates from
    # spinning-disk HDFS and floors a 60 MB table at ~15 splits — starving a
    # 32-core machine (measured: the doc-embedding UDF stage ran 15 tasks on
    # 32 cores). 1 MB lets split count track cluster size; at 100 TB inputs
    # have thousands of >=128 MB splits and neither knob matters.
    n_cores = os.cpu_count() or 8
    if master.startswith("local["):
        inner = master[6:-1]
        if inner.isdigit():
            n_cores = int(inner)

    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.files.openCostInBytes", str(1024 * 1024))
        .config("spark.sql.files.minPartitionNum", str(2 * n_cores))
    )
    # shuffle/checkpoint spill directory: this sandbox's virtual disk is
    # IOPS-throttled and shared, which makes shuffle-heavy stages both slow
    # and noisy; tmpfs removes disk from the measurement. Opt-in only
    # (REFINED_SPARK_TMPFS_SHUFFLE=1, set by bench.py and the test suite):
    # /dev/shm exists on every Linux host and is typically capped at 50% RAM,
    # so defaulting shuffle spill into it would break sizeable real runs.
    if (
        os.environ.get("REFINED_SPARK_TMPFS_SHUFFLE") == "1"
        and os.path.isdir("/dev/shm")
        and not os.environ.get("SPARK_LOCAL_DIRS")
    ):
        shm = "/dev/shm/spark-local"
        os.makedirs(shm, exist_ok=True)
        b = b.config("spark.local.dir", shm)
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
