"""spark-submit entry: replay a pre-generated binlog into a fresh LakeTable.

This is the job BASELINE.json's scaling gate runs at two cluster sizes:

    spark-submit --master local[N] --py-files canal_spark.zip \
        tools/replay_job.py <log_dir> <base_parquet> <table_dir> [n_buckets]

Prints one JSON line {"sec":..., "events":..., "events_per_sec":...}.
The parallelism comes entirely from --master / executor config — the job
code is identical at every cluster size (no hand-sharding).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import types as T

BASE_SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType()),
    T.StructField("tokens", T.ArrayType(T.IntegerType())),
    T.StructField("n_tok", T.IntegerType()),
    T.StructField("source", T.StringType()),
])


def main() -> None:
    log_dir, base_path, table_dir = sys.argv[1:4]
    n_buckets = int(sys.argv[4]) if len(sys.argv) > 4 else 32

    spark = SparkSession.builder.appName("canal_spark_replay").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    from canal_spark.pipeline import replay
    from canal_spark.table.lake import LakeTable

    shutil.rmtree(table_dir, ignore_errors=True)
    base_df = spark.read.schema(BASE_SCHEMA).parquet(base_path)
    table = LakeTable.create(spark, table_dir, BASE_SCHEMA,
                             key_col="doc_id", n_buckets=n_buckets, df=base_df)
    t0 = time.time()
    replay(spark, log_dir, table.refresh())
    dt = time.time() - t0
    with open(os.path.join(log_dir, "log_manifest.json")) as f:
        n_events = json.load(f)["n_events"]
    print(json.dumps({"sec": round(dt, 3), "events": n_events,
                      "events_per_sec": round(n_events / dt, 1)}))


if __name__ == "__main__":
    main()
