"""SparkSession factory tuned for the CDC ingest workload.

All knobs here are plain public Spark confs. Defaults are sized for the
sandbox (local[N], single JVM); on a real cluster the same settings apply
per-executor and `shuffle_partitions` should scale with total cores.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Scratch space must stay inside the repo per sandbox rules.
_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_WORK_DIR = os.path.join(_REPO_ROOT, ".work")


def get_spark(
    app_name: str = "canal_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with CDC-appropriate defaults.

    - AQE on (runtime coalesce + skew-join splitting: the Spark-native answer
      to the reference's hand-tuned ring sizes / thread pools,
      MysqlMultiStageCoprocessor.java:44-137).
    - Arrow on for all pandas interchange (the "raw/lazy parse" analog,
      EntryEventSink.java:49-60 — bytes stay columnar end to end).
    - Shuffle partitions default to cores (local mode) — the apply stage
      repartitions explicitly by key anyway.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    master = master or os.environ.get("SPARK_MASTER", f"local[{cpus}]")
    if shuffle_partitions is None:
        n = master[master.find("[") + 1 : master.find("]")] if "[" in master else cpus
        shuffle_partitions = (os.cpu_count() or 8) if n == "*" else int(n)

    os.makedirs(_WORK_DIR, exist_ok=True)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        .config("spark.local.dir", os.path.join(_WORK_DIR, "spark-tmp"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.sql.warehouse.dir", os.path.join(_WORK_DIR, "warehouse"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
