"""Rewrite-bytes proportionality for the file-pruned copy-on-write MERGE.

VERDICT r02 #2's done-criterion: show that applying a SMALL change batch
rewrites an amount of data proportional to the BATCH, not to the table —
the property that keeps copy-on-write viable at 10^10 rows (the
reference's apply cost is batch-proportional JDBC DML,
client-adapter/rdb/.../support/BatchExecutor.java).

Protocol: build the same range-clustered table at two sizes (docs D and
8D, identical bucket count and file-roll cap), apply the IDENTICAL 20k-
event tail batch to each, and compare bytes rewritten (new data files
written by the MERGE commit) and files read. Two batch shapes:

- ``recent``: updates/deletes hit the newest 1% of keys + ascending
  inserts — the steady-state CDC tail (temporal locality).
- ``spread``: update targets sampled uniformly over the WHOLE keyspace —
  the adversarial shape; file pruning degrades toward bucket granularity
  as batch keys cover every file range (same behavior as Iceberg CoW;
  merge-on-read deltas are the escape hatch if a workload looks like
  this at scale).

Usage: python tools/merge_pruning_bench.py [small_docs] [factor]
Appends a markdown row per run to stdout; copy into PERF.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

import numpy as np
import pyarrow as pa

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

N_BUCKETS = 16
ROLL = 16_384          # records per data file (range-disjoint within bucket)
BATCH_EVENTS = 20_000


def table_bytes(table) -> int:
    return sum(
        os.path.getsize(os.path.join(table.data_dir, f))
        for fs in table.snap["files"].values() for f in fs
    )


def snap_files(table) -> set[str]:
    """Every live data file — base AND merge-on-read deltas."""
    return {f for fs in table.snap["files"].values() for f in fs} | {
        f for fs in table.snap.get("deltas", {}).values() for f in fs}


def run_one(spark, n_docs: int, shape: str, merge_mode: str = "cow") -> dict:
    from canal_spark.fixtures import CdcLogSpec, generate_base_table, generate_cdc_log
    from canal_spark.pipeline import replay
    from canal_spark.table.lake import LakeTable
    from pyspark.sql import types as T

    work = os.path.join(_REPO, ".work", f"prune_{n_docs}_{shape}_{merge_mode}")
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work, exist_ok=True)

    base = generate_base_table(n_docs, seed=7)
    schema = T.StructType([
        T.StructField("doc_id", T.StringType()),
        T.StructField("tokens", T.ArrayType(T.IntegerType())),
        T.StructField("n_tok", T.IntegerType()),
        T.StructField("source", T.StringType()),
    ])
    base_pq = os.path.join(work, "base.parquet")
    import pyarrow.parquet as pq
    pq.write_table(base, base_pq)
    tbl = LakeTable.create(
        spark, os.path.join(work, "tokseq"), schema, n_buckets=N_BUCKETS,
        df=spark.read.parquet(base_pq), max_records_per_file=ROLL,
        merge_mode=merge_mode)

    # tail batch over a key slice: newest 1% (recent) or a uniform sample
    # over the whole keyspace (spread). Inserts ascend past every existing id.
    if shape == "recent":
        lo = n_docs - max(n_docs // 100, 5_000)
        slice_idx = np.arange(lo, n_docs)
    else:
        rng = np.random.default_rng(11)
        slice_idx = np.sort(rng.choice(n_docs, size=10_000, replace=False))
    tail_base = base.take(pa.array(slice_idx))
    log_dir = os.path.join(work, "tail_log")
    generate_cdc_log(log_dir, CdcLogSpec(
        n_events=BATCH_EVENTS, seed=13, op_mix=(0.3, 0.6, 0.1),
        events_per_file=BATCH_EVENTS, doc_offset=10 * n_docs,
        pk_change_frac=0.0), tail_base)

    before_files = snap_files(tbl)
    before_bytes = table_bytes(tbl)
    t0 = time.time()
    stats = replay(spark, log_dir, tbl, batch_id="tail")
    secs = time.time() - t0
    tbl = tbl.refresh()
    new_files = snap_files(tbl) - before_files
    rewritten = sum(os.path.getsize(os.path.join(tbl.data_dir, f))
                    for f in new_files)
    m = stats.merges[0]
    out = {
        "docs": n_docs, "shape": shape, "mode": m.get("mode", "cow"),
        "table_mb": before_bytes // 2**20, "batch_events": BATCH_EVENTS,
        "files_read": m["files_read"], "files_carried": m["files_carried"],
        "rewritten_mb": round(rewritten / 2**20, 1),
        "merge_sec": round(secs, 1),
    }
    shutil.rmtree(work, ignore_errors=True)
    return out


def main() -> None:
    small = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    from canal_spark.session import get_spark
    spark = get_spark("merge_pruning_bench")
    rows = []
    # recent = steady-state CDC tail (CoW's home turf; auto must pick cow);
    # spread = adversarial uniform keys (auto must escape to a mor delta).
    for shape, mode in (("recent", "cow"), ("spread", "cow"),
                        ("recent", "auto"), ("spread", "auto")):
        for n in (small, small * factor):
            r = run_one(spark, n, shape, merge_mode=mode)
            rows.append(r)
            print(json.dumps(r), flush=True)
    print("\n| docs | shape | mode | table MB | files read | files carried "
          "| rewritten MB | merge s |")
    print("|---|---|---|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['docs']:,} | {r['shape']} | {r['mode']} | "
              f"{r['table_mb']} | {r['files_read']} | {r['files_carried']} | "
              f"{r['rewritten_mb']} | {r['merge_sec']} |")


if __name__ == "__main__":
    main()
