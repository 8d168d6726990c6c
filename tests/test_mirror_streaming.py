"""Live whole-database mirror: the streaming tail fans each micro-batch
into one LakeTable per source table, creating sinks mid-stream on first
sight, with per-sink exactly-once across a kill/resume
(RdbMirrorDbSyncService as a live adapter — see canal_spark/streaming/
mirror.py)."""

import os

import pytest
from pyspark.sql import types as T

from canal_spark.fixtures import CdcLogSpec, generate_base_table, generate_cdc_log
from canal_spark.mirror import LakeDatabase
from canal_spark.operators.decode import convert_log_to_wire
from canal_spark.oracle import oracle_mirror_final_state
from canal_spark.streaming.mirror import MirrorStreamingReplay
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
    db = LakeDatabase(spark, os.path.join(tmp_work, "lakedb"))
    bdf = spark.createDataFrame(base.to_pandas(), TOKSEQ_SCHEMA)
    db.create("train.tokseq", TOKSEQ_SCHEMA, n_buckets=8, df=bdf)
    return base, typed_dir, wire_dir, db


def _check(db, base, typed_dir):
    expected = oracle_mirror_final_state(
        {"train.tokseq": base, "train.other_tbl": None}, typed_dir)
    assert sorted(db.names()) == sorted(expected)
    for name, (exp_state, exp_cols) in expected.items():
        t = db.get(name)
        assert t.logical_columns() == exp_cols, name
        actual = rows_to_state(t.read().collect(), exp_cols)
        assert_state_equal(actual, exp_state, exp_cols)


def test_mirror_streaming_creates_sink_mid_stream(spark, tmp_work):
    spec = CdcLogSpec(n_events=2500, seed=31, events_per_file=400,
                      other_table_frac=0.15, pk_change_frac=0.03)
    base, typed_dir, wire_dir, db = _setup(spark, tmp_work, spec)
    sr = MirrorStreamingReplay(
        spark, wire_dir, db, os.path.join(tmp_work, "ckpt"),
        schema_factory=lambda name: TOKSEQ_SCHEMA, n_buckets=8,
        max_files_per_trigger=2)
    sr.run_to_completion()
    sr.flush_tail()
    _check(db, base, typed_dir)
    lines = sr.metrics.read()
    assert len(lines) >= 3
    # per-sink versions recorded per epoch; both sinks advanced
    assert all(isinstance(m["table_version"], dict) for m in lines)
    assert len(lines[-1]["table_version"]) == 2
    applied_epochs = [m for m in lines if m["events_applied"] > 0]
    assert len(applied_epochs) >= 2, [m["events_applied"] for m in lines]


def test_mirror_streaming_kill_and_resume(spark, tmp_work):
    spec = CdcLogSpec(n_events=2000, seed=32, events_per_file=250,
                      other_table_frac=0.15)
    base, typed_dir, wire_dir, db = _setup(spark, tmp_work, spec)
    ckpt = os.path.join(tmp_work, "ckpt")

    sr1 = MirrorStreamingReplay(
        spark, wire_dir, db, ckpt,
        schema_factory=lambda name: TOKSEQ_SCHEMA, n_buckets=8,
        max_files_per_trigger=1)
    q = sr1.start(available_now=True)
    while not sr1.metrics.read():
        q.awaitTermination(0.2)
    q.stop()  # kill mid-stream
    assert db.get("train.tokseq").version > 1

    # a new "process": fresh LakeDatabase over the same root, same ckpt
    db2 = LakeDatabase(spark, os.path.join(tmp_work, "lakedb"))
    sr2 = MirrorStreamingReplay(
        spark, wire_dir, db2, ckpt,
        schema_factory=lambda name: TOKSEQ_SCHEMA, n_buckets=8,
        max_files_per_trigger=1)
    sr2.run_to_completion()
    sr2.flush_tail()
    _check(db2, base, typed_dir)


def test_mirror_streaming_rejects_views(spark, tmp_work):
    spec = CdcLogSpec(n_events=200, seed=33, events_per_file=200)
    base, typed_dir, wire_dir, db = _setup(spark, tmp_work, spec)
    with pytest.raises(ValueError, match="per-table"):
        MirrorStreamingReplay(
            spark, wire_dir, db, os.path.join(tmp_work, "ckpt"),
            views=[object()])
