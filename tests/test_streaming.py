"""Structured Streaming replay: exactly-once, resume, txn alignment."""

import os

from pyspark.sql import types as T

from canal_spark.fixtures import CdcLogSpec, generate_base_table, generate_cdc_log
from canal_spark.operators.decode import convert_log_to_wire
from canal_spark.oracle import oracle_final_state
from canal_spark.streaming.replay import StreamingReplay
from canal_spark.table.lake import LakeTable
from tests.conftest import assert_state_equal, rows_to_state

TOKSEQ_SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType()),
    T.StructField("tokens", T.ArrayType(T.IntegerType())),
    T.StructField("n_tok", T.IntegerType()),
    T.StructField("source", T.StringType()),
])


def _setup(spark, tmp_work, spec: CdcLogSpec, n_base=200, **lake_kw):
    base = generate_base_table(n_base, seed=spec.seed)
    typed_dir = os.path.join(tmp_work, "typed")
    generate_cdc_log(typed_dir, spec, base)
    wire_dir = os.path.join(tmp_work, "wire")
    convert_log_to_wire(spark, typed_dir, wire_dir)
    bdf = spark.createDataFrame(base.to_pandas(), TOKSEQ_SCHEMA)
    table = LakeTable.create(spark, os.path.join(tmp_work, "tokseq"),
                             TOKSEQ_SCHEMA, n_buckets=8, df=bdf, **lake_kw)
    return base, typed_dir, wire_dir, table


def _check(table, base, typed_dir):
    expected, cols = oracle_final_state(base, typed_dir)
    actual = rows_to_state(table.read().collect(), table.logical_columns())
    assert table.logical_columns() == cols
    assert_state_equal(actual, expected, cols)


def test_streaming_replay_microbatches(spark, tmp_work):
    spec = CdcLogSpec(n_events=2500, seed=21, events_per_file=400,
                      other_table_frac=0.05, pk_change_frac=0.05)
    base, typed_dir, wire_dir, table = _setup(spark, tmp_work, spec)
    sr = StreamingReplay(spark, wire_dir, table,
                         os.path.join(tmp_work, "ckpt"),
                         max_files_per_trigger=2)
    sr.run_to_completion()
    sr.flush_tail()
    _check(table, base, typed_dir)
    # metrics recorded one line per epoch with lineage
    lines = sr.metrics.read()
    assert len(lines) >= 3
    assert all("lineage" in m and "batch_sec" in m for m in lines)
    # the stream must apply INCREMENTALLY (txn-aligned micro-batches), not
    # defer everything to the final tail flush
    applied_epochs = [m for m in lines if m["events_applied"] > 0]
    assert len(applied_epochs) >= 2, [m["events_applied"] for m in lines]


def test_streaming_kill_and_resume(spark, tmp_work):
    """Stop after the first segments, restart with the SAME checkpoint:
    offsets resume, nothing double-applies (exactly-once at table level)."""
    spec = CdcLogSpec(n_events=2000, seed=22, events_per_file=250)
    base, typed_dir, wire_dir, table = _setup(spark, tmp_work, spec)
    ckpt = os.path.join(tmp_work, "ckpt")

    # phase 1: process at most a couple of micro-batches, then hard-stop
    sr1 = StreamingReplay(spark, wire_dir, table, ckpt, max_files_per_trigger=1)
    q = sr1.start(available_now=True)
    while not sr1.metrics.read():
        q.awaitTermination(0.2)
    q.stop()  # kill mid-stream
    applied_v = table.refresh().version
    assert applied_v > 1  # something committed before the kill

    # phase 2: new "process" resumes from the checkpoint
    sr2 = StreamingReplay(spark, wire_dir, table.refresh(), ckpt,
                          max_files_per_trigger=1)
    sr2.run_to_completion()
    sr2.flush_tail()
    _check(table.refresh(), base, typed_dir)


def test_streaming_with_ddl(spark, tmp_work):
    ddl = [
        (600, "ALTER TABLE train.tokseq ADD COLUMN lang varchar"),
        (1400, "ALTER TABLE train.tokseq RENAME COLUMN source TO src"),
    ]
    spec = CdcLogSpec(n_events=2000, seed=23, events_per_file=300,
                      ddl_script=ddl)
    base, typed_dir, wire_dir, table = _setup(spark, tmp_work, spec)
    sr = StreamingReplay(spark, wire_dir, table, os.path.join(tmp_work, "ckpt"),
                         max_files_per_trigger=3)
    sr.run_to_completion()
    sr.flush_tail()
    assert table.logical_columns() == ["doc_id", "tokens", "n_tok", "src", "lang"]
    _check(table, base, typed_dir)


def test_streaming_maintenance_long_tail(spark, tmp_work):
    """Long tail with auto-maintenance every 3 data epochs: file counts and
    tombstones stay bounded, snapshots expire, a mid-stream kill/resume
    keeps the state (and an attached JoinedView) oracle-equal.
    VERDICT r02 next #5."""
    import os as _os

    from pyspark.sql import functions as F

    from canal_spark.views import JoinedView

    # Insert-heavy + all updates/deletes on a small hot set: monotone new
    # keys land OUTSIDE existing files' [min,max] ranges, so the file-level
    # MERGE pruning carries most files forward and appends a new file per
    # bucket per epoch — exactly the fragmentation compaction must bound.
    spec = CdcLogSpec(n_events=3000, seed=25, events_per_file=150,
                      op_mix=(0.7, 0.2, 0.1), hot_keys=8, hot_frac=1.0)
    # tiny roll cap ⇒ rewrites split into range-disjoint files, so the hot
    # rewrites and the carried insert files fragment buckets realistically
    base, typed_dir, wire_dir, table = _setup(spark, tmp_work, spec,
                                              max_records_per_file=24)

    dim_rows = [("web", "crawl"), ("books", "curated"), ("code", "curated"),
                ("wiki", "curated"), ("forums", "crawl")]
    dim = spark.createDataFrame(dim_rows, "source string, src_kind string")
    view_schema = T.StructType([
        T.StructField("doc_id", T.StringType()),
        T.StructField("n_tok", T.IntegerType()),
        T.StructField("source", T.StringType()),
        T.StructField("src_kind", T.StringType()),
    ])
    bdf = spark.createDataFrame(base.to_pandas(), TOKSEQ_SCHEMA)
    vt = LakeTable.create(
        spark, os.path.join(tmp_work, "view"), view_schema, n_buckets=8,
        max_records_per_file=24,
        df=bdf.select("doc_id", "n_tok", "source")
              .join(F.broadcast(dim), "source", "left")
              .select("doc_id", "n_tok", "source", "src_kind"))
    view = JoinedView(vt, dim, on="source")

    ckpt = os.path.join(tmp_work, "ckpt")
    kw = dict(max_files_per_trigger=1, views=[view], maintenance_every=3,
              max_files_per_bucket=2, snapshots_keep=3)

    # phase 1: a few epochs, then hard kill
    sr1 = StreamingReplay(spark, wire_dir, table, ckpt, **kw)
    q = sr1.start(available_now=True)
    while len(sr1.metrics.read()) < 5:
        q.awaitTermination(0.2)
    q.stop()

    # phase 2: resume from the checkpoint, drain, flush
    sr2 = StreamingReplay(spark, wire_dir, table.refresh(), ckpt, **kw)
    sr2.run_to_completion()
    sr2.flush_tail()
    _check(table.refresh(), base, typed_dir)

    # the view tracked the whole stream too
    expected, _cols = oracle_final_state(base, typed_dir)
    dimd = dict(dim_rows)
    vstate = {r["doc_id"]: r.asDict() for r in view.table.read().collect()}
    assert set(vstate) == set(expected)
    assert all(v["src_kind"] == dimd[expected[k]["source"]]
               and v["n_tok"] == expected[k]["n_tok"]
               for k, v in vstate.items())

    # maintenance actually ran and compacted fragmented buckets
    maints = [m["maintenance"] for m in sr1.metrics.read() + sr2.metrics.read()
              if m.get("maintenance")]
    assert any(m["table"]["compacted_buckets"] for m in maints), maints
    assert any(m["table"]["files_removed"] > 0 for m in maints)

    # bounded fragmentation: a bucket cannot hold fewer than
    # ceil(rows/max_records_per_file) files (the roll cap), so assert each
    # bucket stays within the floor plus a few epochs' worth of churn —
    # nowhere near the ~#commits a no-maintenance tail accrues
    import math
    snap = table.refresh().snap
    worst_over_floor = 0
    for b, fs in snap["files"].items():
        n_rows = table.read_raw(buckets=[int(b)]).count()
        floor = math.ceil(n_rows / 24) if n_rows else 1
        worst_over_floor = max(worst_over_floor, len(fs) - floor)
    assert worst_over_floor <= 2 * 3, worst_over_floor  # ≤ 2×maintenance_every
    # snapshots expired: far fewer metadata versions on disk than commits
    n_meta = len([f for f in _os.listdir(table.meta_dir)
                  if f.startswith("v") and f.endswith(".json")])
    assert n_meta < snap["version"], (n_meta, snap["version"])

    # tombstones purged by compaction: far fewer tombstone rows remain than
    # deletes were applied over the stream
    n_tomb = (table.read_raw()
              .where(F.coalesce(F.col("_deleted"), F.lit(False))).count())
    total_deletes = int(spec.n_events * spec.op_mix[2] * 0.8)
    assert n_tomb < total_deletes, (n_tomb, total_deletes)


def test_streaming_truncate_fence(spark, tmp_work):
    ddl = [(800, "TRUNCATE TABLE train.tokseq")]
    spec = CdcLogSpec(n_events=1500, seed=24, events_per_file=200)
    spec.ddl_script = ddl
    base, typed_dir, wire_dir, table = _setup(spark, tmp_work, spec)
    sr = StreamingReplay(spark, wire_dir, table, os.path.join(tmp_work, "ckpt"),
                         max_files_per_trigger=2)
    sr.run_to_completion()
    sr.flush_tail()
    _check(table, base, typed_dir)
    assert table.snap["truncate_lsn"]

    # duplicate delivery of PRE-truncate events must not resurrect rows
    from canal_spark.pipeline import replay
    state = rows_to_state(table.read().collect(), table.logical_columns())
    replay(spark, typed_dir, table,
           files=["mysql-bin.000001.parquet"], batch_id="stale-redelivery")
    state2 = rows_to_state(table.read().collect(), table.logical_columns())
    assert state == state2


def test_streaming_pack_index_kill_resume(spark, tmp_work):
    """PackIndexView under Structured Streaming: txn-aligned micro-batches
    re-pack touched shards as they land; a hard kill + checkpoint resume
    converges the index to the per-shard packing of the final corpus."""
    from canal_spark.oracle import oracle_pack_state
    from canal_spark.views import PackIndexView, pack_index_frame

    SEQ, K = 64, 6
    spec = CdcLogSpec(n_events=2500, seed=26, events_per_file=400,
                      pk_change_frac=0.03)
    base, typed_dir, wire_dir, table = _setup(spark, tmp_work, spec)
    pack_schema = T.StructType([
        T.StructField("doc_id", T.StringType()),
        T.StructField("shard", T.StringType()),
        T.StructField("n_tok", T.LongType()),
        T.StructField("local_off", T.LongType()),
        T.StructField("pack_first", T.LongType()),
        T.StructField("pack_last", T.LongType()),
    ])
    bdf = spark.createDataFrame(base.to_pandas(), TOKSEQ_SCHEMA)
    vt = LakeTable.create(
        spark, os.path.join(tmp_work, "pack_idx"), pack_schema, n_buckets=8,
        df=pack_index_frame(bdf.select("doc_id", "n_tok"), SEQ, shard_chars=K))
    ckpt = os.path.join(tmp_work, "ckpt")
    kw = dict(max_files_per_trigger=1,
              views=[PackIndexView(vt, SEQ, shard_chars=K)])

    sr1 = StreamingReplay(spark, wire_dir, table, ckpt, **kw)
    q = sr1.start(available_now=True)
    while len(sr1.metrics.read()) < 3:
        q.awaitTermination(0.2)
    q.stop()  # hard kill mid-stream

    sr2 = StreamingReplay(spark, wire_dir, table.refresh(), ckpt, **kw)
    sr2.run_to_completion()
    sr2.flush_tail()
    _check(table.refresh(), base, typed_dir)

    expected, _cols = oracle_final_state(base, typed_dir)
    exp = {d: (r["shard"], r["n_tok"], r["local_off"], r["pack_first"],
               r["pack_last"])
           for d, r in oracle_pack_state(expected, K, SEQ).items()}
    got = {r["doc_id"]: (r["shard"], r["n_tok"], r["local_off"],
                         r["pack_first"], r["pack_last"])
           for r in vt.refresh().read().collect()}
    assert got == exp


def test_streaming_agg_rollup_kill_resume(spark, tmp_work):
    """AggRollupView under Structured Streaming with auto-maintenance
    interleaved: per-epoch signed deltas keep the per-source rollup
    current; a hard kill + checkpoint resume (re-delivered epochs hit the
    main ledger, so the view must fence against the PARENT snapshot of an
    already-applied merge) converges to a GROUP BY recompute."""
    from canal_spark.views import AggRollupView, agg_rollup_frame

    spec = CdcLogSpec(n_events=2500, seed=27, events_per_file=400,
                      pk_change_frac=0.03)
    base, typed_dir, wire_dir, table = _setup(spark, tmp_work, spec)
    rollup_schema = T.StructType([
        T.StructField("source", T.StringType()),
        T.StructField("n_docs", T.LongType()),
        T.StructField("sum_n_tok", T.LongType()),
    ])
    bdf = spark.createDataFrame(base.to_pandas(), TOKSEQ_SCHEMA)
    vt = LakeTable.create(
        spark, os.path.join(tmp_work, "rollup"), rollup_schema,
        key_col="source", n_buckets=4,
        df=agg_rollup_frame(bdf, "source", ("n_tok",)))
    ckpt = os.path.join(tmp_work, "ckpt")
    kw = dict(max_files_per_trigger=1, maintenance_every=2,
              views=[AggRollupView(vt, table, "source", ("n_tok",))])

    sr1 = StreamingReplay(spark, wire_dir, table, ckpt, **kw)
    q = sr1.start(available_now=True)
    while len(sr1.metrics.read()) < 3:
        q.awaitTermination(0.2)
    q.stop()  # hard kill mid-stream

    sr2 = StreamingReplay(spark, wire_dir, table.refresh(), ckpt, **kw)
    sr2.run_to_completion()
    sr2.flush_tail()
    _check(table.refresh(), base, typed_dir)

    expected, _cols = oracle_final_state(base, typed_dir)
    exp = {}
    for row in expected.values():
        g = row.get("source") or "(null)"
        a = exp.setdefault(g, [0, 0])
        a[0] += 1
        a[1] += row.get("n_tok") or 0
    got = {r["source"]: [r["n_docs"], r["sum_n_tok"]]
           for r in vt.refresh().read().collect()}
    assert got == exp


def test_streaming_filtered_view_kill_resume(spark, tmp_work):
    """FilteredView under Structured Streaming: predicate-crossing updates
    land as view inserts/deletes per micro-batch; a hard kill + checkpoint
    resume (re-delivered epochs ledger-no-op on the main table while the
    view fences per key) converges to filter(final state, predicate)."""
    from canal_spark.views import FilteredView

    PRED = "pmod(n_tok, 2) = 0"
    filt_schema = T.StructType([
        T.StructField("doc_id", T.StringType()),
        T.StructField("n_tok", T.IntegerType()),
        T.StructField("source", T.StringType()),
    ])
    spec = CdcLogSpec(n_events=2500, seed=28, events_per_file=400,
                      pk_change_frac=0.03)
    base, typed_dir, wire_dir, table = _setup(spark, tmp_work, spec)
    bdf = spark.createDataFrame(base.to_pandas(), TOKSEQ_SCHEMA)
    from pyspark.sql import functions as F
    vt = LakeTable.create(
        spark, os.path.join(tmp_work, "filt_view"), filt_schema, n_buckets=8,
        df=bdf.where(F.expr(PRED)).select("doc_id", "n_tok", "source"))
    ckpt = os.path.join(tmp_work, "ckpt")
    kw = dict(max_files_per_trigger=1,
              views=[FilteredView(vt, PRED,
                                  input_types={"n_tok": T.IntegerType(),
                                               "source": T.StringType()})])

    sr1 = StreamingReplay(spark, wire_dir, table, ckpt, **kw)
    q = sr1.start(available_now=True)
    while len(sr1.metrics.read()) < 3:
        q.awaitTermination(0.2)
    q.stop()  # hard kill mid-stream

    sr2 = StreamingReplay(spark, wire_dir, table.refresh(), ckpt, **kw)
    sr2.run_to_completion()
    sr2.flush_tail()
    _check(table.refresh(), base, typed_dir)

    expected, _cols = oracle_final_state(base, typed_dir)
    exp = {d: (r["n_tok"], r.get("source")) for d, r in expected.items()
           if r.get("n_tok") is not None and r["n_tok"] % 2 == 0}
    got = {r["doc_id"]: (r["n_tok"], r["source"])
           for r in vt.refresh().read().collect()}
    assert got == exp


def test_streaming_child_agg_and_consumers_kill_resume(spark, tmp_work):
    """Round-4 integration: a streaming primary (changelog=True) with a
    ChildAggView attached, TWO named consumers polling the feed between
    micro-batches, a hard kill + checkpoint resume. Everything must
    converge: main == oracle, per-parent child aggregates == recompute,
    both consumers == main, feed freed past the slowest ack."""
    from canal_spark.streaming.relay import register_consumer, relay_until_idle
    from canal_spark.views import ChildAggView

    spec = CdcLogSpec(n_events=2500, seed=29, events_per_file=400,
                      pk_change_frac=0.03)
    base, typed_dir, wire_dir, table = _setup(spark, tmp_work, spec,
                                              changelog=True)
    parents = [("web", 50), ("books", 100), ("code", 80),
               ("wiki", 100), ("forums", 30)]
    ca_schema = T.StructType([
        T.StructField("source", T.StringType()),
        T.StructField("weight_e2", T.IntegerType()),
        T.StructField("n_child", T.LongType()),
        T.StructField("sum_n_tok", T.LongType()),
    ])
    bdf = spark.createDataFrame(base.to_pandas(), TOKSEQ_SCHEMA)
    pdf = spark.createDataFrame(parents, "source string, weight_e2 int")
    vt = LakeTable.create(spark, os.path.join(tmp_work, "child_agg"),
                          ca_schema, key_col="source", n_buckets=4)
    view = ChildAggView(vt, table, "source", ("n_tok",))
    vt.overwrite(view.seed_frame(pdf, bdf), batch_id="seed")
    c1 = LakeTable.create(spark, os.path.join(tmp_work, "c1"), TOKSEQ_SCHEMA,
                          n_buckets=8, df=bdf)
    c2 = LakeTable.create(spark, os.path.join(tmp_work, "c2"), TOKSEQ_SCHEMA,
                          n_buckets=8, df=bdf)
    register_consumer(table, "c1")
    register_consumer(table, "c2")

    ckpt = os.path.join(tmp_work, "ckpt")
    kw = dict(max_files_per_trigger=1, views=[view])
    sr1 = StreamingReplay(spark, wire_dir, table, ckpt, **kw)
    q = sr1.start(available_now=True)
    while len(sr1.metrics.read()) < 3:
        q.awaitTermination(0.2)
    q.stop()  # hard kill mid-stream
    # consumer 1 polls MID-stream (partial feed), with expiry
    relay_until_idle(table.refresh(), c1, prefix="c1", consumer="c1",
                     expire_acked=True)

    sr2 = StreamingReplay(spark, wire_dir, table.refresh(), ckpt, **kw)
    sr2.run_to_completion()
    sr2.flush_tail()
    _check(table.refresh(), base, typed_dir)

    relay_until_idle(table.refresh(), c1, prefix="c1", consumer="c1",
                     expire_acked=True)
    relay_until_idle(table.refresh(), c2, prefix="c2", consumer="c2",
                     expire_acked=True)
    expected, cols = oracle_final_state(base, typed_dir)
    for c in (c1, c2):
        assert_state_equal(rows_to_state(c.refresh().read().collect(), cols),
                           expected, cols)
    assert table.refresh().snap["changelog"] == {}

    # child aggregates == recompute over the oracle state
    exp = {}
    for row in expected.values():
        g = row.get("source")
        if g is None:
            continue
        a = exp.setdefault(g, [0, 0])
        a[0] += 1
        a[1] += row.get("n_tok") or 0
    got = {r["source"]: [r["n_child"], r["sum_n_tok"]]
           for r in vt.refresh().read().collect()}
    assert got == {p[0]: exp.get(p[0], [0, 0]) for p in parents}
