"""WireMessageSink: the MQ delivery semantics (pk-hash partition routing,
per-partition in-order sequences, exactly-once epochs) on a file topic.

Reference semantics: MQMessageUtils.messagePartition (connector/core/.../
MQMessageUtils.java:252-347), CanalMQStarter worker loop (server/.../
CanalMQStarter.java:152-216), FlatMessage shape (protocol/.../
FlatMessage.java).
"""

import hashlib
import os

from pyspark.sql import functions as F

from canal_spark.fixtures import CdcLogSpec, generate_base_table, generate_cdc_log
from canal_spark.operators.decode import convert_log_to_wire
from canal_spark.pipeline import prepare_envelope, read_event_log
from canal_spark.sinks import WireMessageSink
from canal_spark.streaming.replay import StreamingReplay
from canal_spark.table.lake import LakeTable
from tests.test_streaming import TOKSEQ_SCHEMA, _check

N_PART = 8


def _h60_py(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _messages(sink, spark):
    return [r.asDict() for r in sink.read(spark).collect()]


def test_wire_sink_routing_order_and_idempotence(spark, tmp_work):
    spec = CdcLogSpec(n_events=2000, seed=51, pk_change_frac=0.03,
                      other_table_frac=0.05)
    base = generate_base_table(200, seed=51)
    log_dir = os.path.join(tmp_work, "log")
    generate_cdc_log(log_dir, spec, base)
    ev = prepare_envelope(read_event_log(spark, log_dir))

    sink = WireMessageSink(os.path.join(tmp_work, "topic"), N_PART)
    assert sink.read(spark).count() == 0  # empty topic: schema'd, no rows
    res = sink.publish(ev, "000000000")
    assert not res["skipped"]

    msgs = _messages(sink, spark)
    # complete delivery: exactly the subscribed DML events, by lsn
    dml = ev.where((F.col("entry_type") == "ROWDATA")
                   & ~F.coalesce(F.col("is_ddl"), F.lit(False))
                   & F.col("event_type").isin("INSERT", "UPDATE", "DELETE"))
    assert {m["lsn"] for m in msgs} == {r["lsn"] for r in
                                        dml.select("lsn").collect()}
    # routing: p == pmod(h60(pk), N) for every message
    assert all(m["p"] == _h60_py(m["pk"]) % N_PART for m in msgs)
    # ordering: per partition, seq is dense 1..n and ascends with lsn
    by_p = {}
    for m in msgs:
        by_p.setdefault(m["p"], []).append(m)
    for p, ms in by_p.items():
        ms.sort(key=lambda m: m["seq"])
        assert [m["seq"] for m in ms] == list(range(1, len(ms) + 1))
        assert [m["lsn"] for m in ms] == sorted(m["lsn"] for m in ms)
    # a key's messages all live in one partition
    key_parts = {}
    for m in msgs:
        key_parts.setdefault(m["pk"], set()).add(m["p"])
    assert all(len(ps) == 1 for ps in key_parts.values())
    # exactly-once: re-publishing the same epoch is a no-op
    assert sink.publish(ev, "000000000")["skipped"]
    assert len(_messages(sink, spark)) == len(msgs)


def test_streaming_wire_sink_kill_resume(spark, tmp_work):
    """Topic published per epoch inside the foreachBatch: a hard kill +
    checkpoint resume redelivers epochs, and the epoch-keyed directories
    make delivery exactly-once — no duplicate or missing messages vs the
    log's DML set, per-key order preserved across epochs."""
    spec = CdcLogSpec(n_events=2500, seed=52, events_per_file=400,
                      pk_change_frac=0.03)
    base = generate_base_table(200, seed=52)
    typed_dir = os.path.join(tmp_work, "typed")
    generate_cdc_log(typed_dir, spec, base)
    wire_dir = os.path.join(tmp_work, "wire")
    convert_log_to_wire(spark, typed_dir, wire_dir)
    bdf = spark.createDataFrame(base.to_pandas(), TOKSEQ_SCHEMA)
    table = LakeTable.create(spark, os.path.join(tmp_work, "tokseq"),
                             TOKSEQ_SCHEMA, n_buckets=8, df=bdf)
    sink = WireMessageSink(os.path.join(tmp_work, "topic"), N_PART)
    ckpt = os.path.join(tmp_work, "ckpt")
    kw = dict(max_files_per_trigger=1, message_sinks=[sink])

    sr1 = StreamingReplay(spark, wire_dir, table, ckpt, **kw)
    q = sr1.start(available_now=True)
    while len(sr1.metrics.read()) < 3:
        q.awaitTermination(0.2)
    q.stop()  # hard kill mid-stream

    sr2 = StreamingReplay(spark, wire_dir, table.refresh(), ckpt, **kw)
    sr2.run_to_completion()
    sr2.flush_tail()
    _check(table.refresh(), base, typed_dir)

    # the topic carries the log's subscribed DML exactly once
    ev = prepare_envelope(read_event_log(spark, typed_dir))
    dml_lsns = sorted(
        r["lsn"] for r in ev.where(
            (F.col("entry_type") == "ROWDATA")
            & ~F.coalesce(F.col("is_ddl"), F.lit(False))
            & F.col("event_type").isin("INSERT", "UPDATE", "DELETE")
        ).select("lsn").collect())
    msgs = _messages(sink, spark)
    assert sorted(m["lsn"] for m in msgs) == dml_lsns  # no dupes, no gaps

    # per-key order across epochs: consumer order (epoch asc, seq asc)
    # within the key's one partition == lsn order
    per_key = {}
    for m in msgs:
        per_key.setdefault(m["pk"], []).append(m)
    for pk, ms in per_key.items():
        assert len({m["p"] for m in ms}) == 1
        consumer_order = sorted(ms, key=lambda m: (m["epoch"], m["seq"]))
        assert [m["lsn"] for m in consumer_order] == sorted(
            m["lsn"] for m in ms), pk


def test_group_streaming_wire_sink_timeline(spark, tmp_work):
    """Sharded upstream feeding one topic: the barrier-released events
    publish with their MERGED timeline LSN, so a consumer of any partition
    sees a single txn-consistent stream — per-key order == execute-time
    order across shards, delivery exactly-once."""
    from canal_spark.streaming.group import GroupStreamingReplay
    from tests.test_group_streaming import _setup_shards, _check as _gcheck

    bases, typed_dirs, wire_dirs, table = _setup_shards(
        spark, tmp_work, events_per_shard=[900, 600], seed=53)
    sink = WireMessageSink(os.path.join(tmp_work, "topic"), N_PART)
    gr = GroupStreamingReplay(
        spark, wire_dirs, table, os.path.join(tmp_work, "ckpt"),
        max_files_per_trigger=1, message_sinks=[sink])
    gr.run_to_completion()
    gr.flush_tail()
    _gcheck(table.refresh(), bases, typed_dirs)

    # exactly-once across shards: one message per subscribed DML event
    n_dml = 0
    for d in typed_dirs:
        ev = prepare_envelope(read_event_log(spark, d))
        n_dml += ev.where(
            (F.col("entry_type") == "ROWDATA")
            & ~F.coalesce(F.col("is_ddl"), F.lit(False))
            & F.col("event_type").isin("INSERT", "UPDATE", "DELETE")
        ).count()
    msgs = _messages(sink, spark)
    assert len(msgs) == n_dml
    assert len({m["lsn"] for m in msgs}) == n_dml  # merged LSNs unique

    # consumer order per key == merged-timeline (execute-time) order
    per_key = {}
    for m in msgs:
        per_key.setdefault(m["pk"], []).append(m)
    for pk, ms in per_key.items():
        assert len({m["p"] for m in ms}) == 1
        consumer = sorted(ms, key=lambda m: (m["epoch"], m["seq"]))
        lsns = [m["lsn"] for m in consumer]
        assert lsns == sorted(lsns), pk
        ts = [m["execute_ts"] for m in consumer]
        assert ts == sorted(ts), pk
