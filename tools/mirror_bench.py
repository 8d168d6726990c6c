"""Mirror fan-out micro-bench: serial vs pooled per-sink apply at N sinks.

Builds one deterministic typed event log, remaps each DML event's
table_name to one of N tables by key hash (so every sink receives ~1/N of
the events — the whole-database-sync shape), pre-creates the N sinks, and
times mirror_apply at max_concurrency 1 vs the pool. The per-sink work is
deliberately SMALL pruned jobs, so the serial wall is dominated by driver
round-trips — the exact overhead the pool overlaps (PERF.md #19;
reference analog: pooled per-table executors, RdbSyncService.java:52-131).

Usage: python tools/mirror_bench.py [n_tables] [n_events] [conc]
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


def main() -> int:
    n_tables = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n_events = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    conc = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from canal_spark.fixtures import (CdcLogSpec, generate_base_table,
                                      generate_cdc_log)
    from canal_spark.mirror import LakeDatabase, mirror_apply
    from canal_spark.pipeline import prepare_events, read_event_log
    from canal_spark.session import get_spark

    work = os.path.join(_REPO, ".work", "mirror_bench")
    shutil.rmtree(work, ignore_errors=True)
    spark = get_spark("mirror_bench")
    spark.sparkContext.setLogLevel("ERROR")

    schema = T.StructType([
        T.StructField("doc_id", T.StringType()),
        T.StructField("tokens", T.ArrayType(T.IntegerType())),
        T.StructField("n_tok", T.IntegerType()),
        T.StructField("source", T.StringType()),
    ])
    base = generate_base_table(2000, seed=11)
    log_dir = os.path.join(work, "log")
    generate_cdc_log(log_dir, CdcLogSpec(
        n_events=n_events, seed=11, events_per_file=max(1000, n_events // 8),
        pk_change_frac=0.0, other_table_frac=0.0), base)

    # remap each event's table by key hash → N tables of ~equal traffic;
    # txn markers (NULL pk) stay on table 0. Materialize the remapped log
    # so BOTH timed runs read identical parquet with pushable gates.
    raw = read_event_log(spark, log_dir)
    pk = F.coalesce(F.col("after.doc_id"), F.col("before.doc_id"))
    tno = F.coalesce(F.pmod(F.xxhash64(pk), F.lit(n_tables)), F.lit(0))
    remap_dir = os.path.join(work, "remapped")
    (raw.withColumn("table_name",
                    F.when(F.col("entry_type") == "ROWDATA",
                           F.concat(F.lit("tokseq_"), tno))
                    .otherwise(F.col("table_name")))
        .withColumn("sql", F.lit(None).cast("string"))
        .repartition(1).sortWithinPartitions("gtid_seq", "binlog_pos")
        .write.mode("overwrite").parquet(remap_dir))
    ev = prepare_events(spark.read.parquet(remap_dir),
                        table_regex=r"^train\.tokseq_\d+$")

    def build_db(tag: str) -> LakeDatabase:
        db = LakeDatabase(spark, os.path.join(work, f"db_{tag}"))
        bdf = spark.createDataFrame(base.to_pandas(), schema)
        for i in range(n_tables):
            db.create(f"train.tokseq_{i}", schema, n_buckets=4,
                      df=bdf.where(F.pmod(F.xxhash64("doc_id"),
                                          F.lit(n_tables)) == i))
        return db

    res = {}
    for tag, c in (("warm", 1), ("serial", 1), ("pool", conc),
                   ("serial2", 1), ("pool2", conc)):
        db = build_db(tag)
        t0 = time.time()
        stats = mirror_apply(ev, db, batch_id="m", max_concurrency=c)
        res[tag] = round(time.time() - t0, 2)
        assert len(stats) == n_tables and all(
            s.events > 0 for s in stats.values())

    ser = min(res["serial"], res["serial2"])
    par = min(res["pool"], res["pool2"])
    print(json.dumps({
        "n_tables": n_tables, "n_events": n_events, "concurrency": conc,
        "serial_sec": ser, "pool_sec": par,
        "speedup": round(ser / par, 2),
        "runs": res,
    }))
    spark.stop()
    shutil.rmtree(work, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
