"""Measure the incremental bucket-spec migration's two scale claims:

1. A ``rebucket_step(k)`` commit costs O(k × bucket) — a fixed fraction of
   the one-shot ``rebucket()`` full rewrite (≈ k/N of it), so the rewrite
   can be amortized over the maintenance cadence instead of holding one
   giant commit.
2. Merge latency is unchanged mid-migration: the mixed-spec routing is one
   JVM `when(isin)` expression, and each merge still prunes to the files
   of its routed buckets.

Usage: python tools/migration_bench.py [n_docs] [n_buckets] [factor]
Prints one JSON line.
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from canal_spark.session import get_spark  # noqa: E402


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000
    n_buckets = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 4

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from __spark_entry__ import BASE_SCHEMA
    from canal_spark.fixtures.generator import generate_base_table
    from canal_spark.table.lake import LakeTable

    os.environ.setdefault("SPARK_DRIVER_MEMORY", "16g")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8)))
    spark = get_spark("migration_bench", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    work = os.path.join(_REPO, ".work", "migration_bench")
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work)
    base_pq = os.path.join(work, "base.parquet")
    pq.write_table(generate_base_table(n_docs, seed=11), base_pq)
    base_df = spark.read.schema(BASE_SCHEMA).parquet(base_pq)

    def mk(name):
        return LakeTable.create(spark, os.path.join(work, name), BASE_SCHEMA,
                                key_col="doc_id", n_buckets=n_buckets,
                                df=base_df)

    def chg(i, n=2000):
        # n spread update keys, one row per key — MATERIALIZED to parquet
        # first so the timed merge never pays the fixture's key-pick sort
        p = os.path.join(work, f"chg{i}.parquet")
        if not os.path.exists(p):
            (base_df.select("doc_id").orderBy(F.crc32(F.concat(
                F.lit(str(i)), "doc_id"))).limit(n)
                .select("doc_id",
                        F.array(F.lit(i)).cast("array<int>").alias("tokens"),
                        F.lit(1).alias("n_tok"), F.lit("web").alias("source"),
                        F.lit("U").alias("op"),
                        F.format_string("lsn-%06d", F.lit(i)).alias("lsn"))
                .coalesce(1).write.parquet(p))
        return spark.read.parquet(p)

    out: dict = {"n_docs": n_docs, "n_buckets": n_buckets,
                 "target": n_buckets * factor, "parallelism": cpus}

    # steady-state merge latency (median of 5)
    t = mk("steady")
    lat = []
    for i in range(5):
        t0 = time.time()
        t.merge_apply(chg(i), batch_id=f"s{i}")
        lat.append(time.time() - t0)
    out["merge_sec_steady"] = round(sorted(lat)[2], 2)

    # one-shot full rewrite cost
    t1 = mk("oneshot")
    t0 = time.time()
    t1.rebucket(n_buckets * factor)
    out["rebucket_full_sec"] = round(time.time() - t0, 2)

    # incremental: per-step cost + merge latency interleaved mid-migration
    t2 = mk("incremental")
    t2.rebucket_start(n_buckets * factor)
    step_secs, mid_lat = [], []
    i = 100
    while True:
        t0 = time.time()
        st = t2.rebucket_step(1)
        step_secs.append(time.time() - t0)
        t0 = time.time()
        t2.merge_apply(chg(i), batch_id=f"m{i}")
        mid_lat.append(time.time() - t0)
        i += 1
        if st["done"]:
            break
    out["steps"] = len(step_secs)
    out["step_sec_median"] = round(sorted(step_secs)[len(step_secs) // 2], 2)
    out["step_sec_max"] = round(max(step_secs), 2)
    out["merge_sec_mid_migration"] = round(sorted(mid_lat)[len(mid_lat) // 2], 2)
    out["step_vs_full_ratio"] = round(
        out["step_sec_median"] / out["rebucket_full_sec"], 3)
    rows = t2.read().count()
    assert rows >= n_docs, rows
    out["final_rows"] = rows
    print(json.dumps(out))


if __name__ == "__main__":
    main()
