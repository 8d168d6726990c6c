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


def _setup(spark, tmp_work, spec: CdcLogSpec, n_base=200):
    base = generate_base_table(n_base, seed=spec.seed)
    typed_dir = os.path.join(tmp_work, "typed")
    generate_cdc_log(typed_dir, spec, base)
    wire_dir = os.path.join(tmp_work, "wire")
    convert_log_to_wire(spark, typed_dir, wire_dir)
    bdf = spark.createDataFrame(base.to_pandas(), TOKSEQ_SCHEMA)
    table = LakeTable.create(spark, os.path.join(tmp_work, "tokseq"),
                             TOKSEQ_SCHEMA, n_buckets=8, df=bdf)
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
