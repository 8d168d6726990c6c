"""Headline benchmark. Prints ONE JSON line:

  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": <sf>,
   "replay_events": N, "replay_events_per_sec": X, "parallelism": C}

Workload:
  - cdc_replay   — the flagship: generate (cached) a synthetic binlog sized
                   to the SF, seed the LakeTable from the tokenized documents
                   table, replay end-to-end (decode → LWW → bucketed MERGE,
                   one DDL mid-log to exercise range splitting).
  - q_lww        — LWW collapse over the events table (map-side-combining
                   max_by aggregate).
  - q_dedup_minhash — MinHash+LSH near-dup pairs over documents.
  - q_ann_topk   — brute-force cosine top-k over embeddings.
  - q_pricing    — TPC-H Q1-shape aggregate over lineitem.
  - q_pack_assign — training-sequence packing plan over documents
                   (sharded distributed prefix sum).

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default all cores).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

_REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO)

from canal_spark.session import get_spark  # noqa: E402


def _force(df) -> None:
    """Fully execute a DataFrame without materializing to the driver."""
    df.write.mode("overwrite").format("noop").save()


def _cpu_stat() -> tuple[int, int, int]:
    """(steal, iowait, total) jiffies — the VM's co-tenant noise signals
    (steal = CPU contention, iowait = the shared virtio disk; PERF.md)."""
    with open("/proc/stat") as f:
        vals = list(map(int, f.readline().split()[1:]))
    steal = vals[7] if len(vals) > 7 else 0
    iowait = vals[4] if len(vals) > 4 else 0
    return steal, iowait, sum(vals)


def _sf_of(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def ensure_fixture(sf_dir: str, n_events: int, seed: int = 42,
                   ddl: bool = True, min_tok: int = 4,
                   max_tok: int = 64) -> tuple[str, str]:
    """Generate (once, cached) the bench binlog + base table for this SF.

    ``ddl=False`` produces a DDL-free log (single MERGE range) — used by the
    scaling bench so the measured job has one commit's worth of serial
    driver work, like a steady-state micro-batch."""
    import pyarrow.parquet as pq

    from __spark_entry__ import _tokenized_base
    from canal_spark.fixtures.generator import CdcLogSpec, generate_cdc_log

    tag = (f"bench_{os.path.basename(sf_dir.rstrip('/'))}_{n_events}_{seed}"
           + ("" if ddl else "_noddl")
           + ("" if (min_tok, max_tok) == (4, 64) else f"_t{min_tok}-{max_tok}"))
    root = os.path.join(_REPO, ".work", tag)
    log_dir = os.path.join(root, "binlog")
    base_path = os.path.join(root, "base.parquet")
    manifest = os.path.join(log_dir, "log_manifest.json")
    if not (os.path.exists(manifest) and os.path.exists(base_path)):
        shutil.rmtree(root, ignore_errors=True)
        os.makedirs(root, exist_ok=True)
        base = _tokenized_base(sf_dir)
        pq.write_table(base, base_path)
        spec = CdcLogSpec(
            n_events=n_events, seed=seed, hot_frac=0.3, hot_keys=16,
            other_table_frac=0.02, pk_change_frac=0.02,
            min_tok=min_tok, max_tok=max_tok,
            events_per_file=100_000,
            ddl_script=(
                [(n_events // 2,
                  "ALTER TABLE train.tokseq ADD COLUMN quality_tier STRING")]
                if ddl else []
            ),
        )
        generate_cdc_log(log_dir, spec, base=base)
    return log_dir, base_path


def run_replay(spark, log_dir: str, base_path: str, table_dir: str,
               n_buckets: int = 32) -> dict:
    """Replay the full log into a fresh LakeTable; returns stats + seconds."""
    from __spark_entry__ import BASE_SCHEMA
    from canal_spark.pipeline import replay
    from canal_spark.table.lake import LakeTable

    shutil.rmtree(table_dir, ignore_errors=True)
    base_df = spark.read.schema(BASE_SCHEMA).parquet(base_path)
    table = LakeTable.create(spark, table_dir, BASE_SCHEMA,
                             key_col="doc_id", n_buckets=n_buckets, df=base_df)
    t0 = time.time()
    stats = replay(spark, log_dir, table.refresh())
    dt = time.time() - t0
    with open(os.path.join(log_dir, "log_manifest.json")) as f:
        n_events = json.load(f)["n_events"]
    return {"sec": dt, "events": n_events,
            "events_per_sec": n_events / dt if dt else 0.0,
            "merges": stats.ranges, "ddls": stats.ddls}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8)))
    sf = _sf_of(sf_dir)
    n_events = max(20_000, int(10_000_000 * sf))  # sf0.1 → 1M events

    from canal_spark.functions import (cdc_demo, curation, dedup,
                                       relational, similarity, text)
    from pyspark.sql import functions as F

    # size the driver JVM like the spark-submit runs (PERF.md: heap growth
    # from a small -Xms costs ~2x on the first heavy job)
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "16g")
    spark = get_spark(
        "bench", master=f"local[{cpus}]", shuffle_partitions=cpus,
        extra_conf={"spark.driver.extraJavaOptions": "-Xms12g"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    log_dir, base_path = ensure_fixture(sf_dir, n_events)
    # keyed by sf+cores so concurrent validations at other SFs can't rmtree
    # each other's live table mid-replay
    table_dir = os.path.join(
        _REPO, ".work",
        f"bench_table_{os.path.basename(sf_dir.rstrip('/'))}-{cpus}")

    def t(name):
        return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))

    timings: dict[str, float] = {}

    # warm the (small) fixture into page cache before timing
    import glob
    for f in glob.glob(os.path.join(log_dir, "*.parquet")) + [base_path]:
        with open(f, "rb") as fh:
            fh.read()

    def cpu_canary() -> float:
        """Fixed pure-CPU JVM job (no input, no shuffle): a machine-speed
        canary. /proc/stat steal misses co-tenant memory-bandwidth and
        scheduler degradation (measured: every query 1.5-2x slow in a
        window stamping only 1.1% steal); an inflated canary flags those
        windows. Quiet-host reference ≈0.4-0.6 s at 32 cores."""
        t0 = time.time()
        # high-32 shift keeps the ANSI sum below 2^62 for 1e9 rows
        spark.range(0, 1_000_000_000, 1, cpus).select(
            F.sum(F.shiftrightunsigned(F.xxhash64("id"), 32))).collect()
        return round(time.time() - t0, 3)

    cpu_canary()                       # JIT warm
    canary_pre = cpu_canary()

    # Replay timing protocol (VERDICT r03 wrong #2 — the r3 artifact
    # recorded 8.856 s while reps were still strictly descending
    # 17.2→10.3→8.9→8.86, i.e. the JVM/code-cache never converged before
    # the adaptive stop fired):
    #   1. TWO fixed warm-up reps, always discarded — the first heavy job
    #      in a fresh JVM is reproducibly 2-30x slower than steady state
    #      (JIT + page cache; PERF.md "benchmark hygiene") and the second
    #      is often still descending.
    #   2. Timed reps run TO PLATEAU: stop once a rep FAILS to improve the
    #      best-so-far by ≥2% (minimum 3 timed reps, cap 8). A "last two
    #      agree within X%" rule cannot tell a plateau from a slow
    #      geometric descent — an 8-rep probe at HEAD was still shaving
    #      ~4%/rep at rep 3 (7.58/7.23/6.95…6.02) and passed an 8% window
    #      while 15% above its floor. Improvement-stall costs one extra
    #      rep at the floor and never stops mid-descent.
    #   3. Report the best timed rep (the engine; slower reps are host).
    stat0 = _cpu_stat()
    warmups = [run_replay(spark, log_dir, base_path, table_dir,
                          n_buckets=cpus) for _ in range(2)]
    reps = []
    for _ in range(8):
        reps.append(run_replay(spark, log_dir, base_path, table_dir,
                               n_buckets=cpus))
        if len(reps) >= 3 and reps[-1]["sec"] > 0.98 * min(
                r["sec"] for r in reps[:-1]):
            break
    rep = min(reps, key=lambda r: r["sec"])
    timings["cdc_replay"] = round(rep["sec"], 3)

    def timed(name, df_fn):
        secs = []
        for _ in range(3):     # best-of-3: see PERF.md "benchmark hygiene"
            t0 = time.time()
            _force(df_fn())
            secs.append(time.time() - t0)
        timings[name] = round(min(secs), 3)

    timed("q_lww", lambda: cdc_demo.lww_collapse(t("events")))
    timed("q_dedup_minhash", lambda: dedup.minhash_lsh_pairs(
        t("documents"), n=3, num_hashes=64, bands=8, threshold_bp=7000))
    timed("q_ann_topk", lambda: similarity.cosine_topk(
        t("embeddings"), t("embeddings").where(F.col("vec_id") < 8), k=5))
    timed("q_pricing", lambda: relational.pricing_summary(t("lineitem")))
    timed("q_pack_assign", lambda: curation.pack_assignments(
        text.token_count(t("documents")).select(
            "doc_id", F.col("bpe_tokens").alias("n_tok")), seq_len=2048))

    canary_post = cpu_canary()
    stat1 = _cpu_stat()
    dt_total = stat1[2] - stat0[2]
    steal_pct = round(100.0 * (stat1[0] - stat0[0]) / dt_total, 2) if dt_total else 0.0
    iowait_pct = round(100.0 * (stat1[1] - stat0[1]) / dt_total, 2) if dt_total else 0.0

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "cdc_replay_plus_curation_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "replay_events": rep["events"],
        "replay_events_per_sec": round(rep["events_per_sec"], 1),
        "replay_warmup_runs_sec": [round(r["sec"], 3) for r in warmups],
        "replay_runs_sec": [round(r["sec"], 3) for r in reps],
        "host_steal_pct": steal_pct,    # co-tenant CPU noise during the bench
        "host_iowait_pct": iowait_pct,  # shared virtio disk contention
        # fixed pure-CPU JVM job before/after the timed block; quiet-host
        # reference ~0.4-0.6 s — inflated values flag co-tenant degradation
        # (memory bandwidth, scheduler) that steal% misses
        "cpu_canary_sec": [canary_pre, canary_post],
        "parallelism": cpus,
    }))


if __name__ == "__main__":
    main()
