"""Multi-table mirror replay (whole-database sync) vs the per-table oracle.

The reference's instance subscribes to a FILTER; the mirror adapter routes
each source table's DML into its own target and creates targets on first
sight (client-adapter/rdb/.../RdbMirrorDbSyncService.java:50-140). Here:
one log with two tables under `^train\\.` fans into two LakeTables, and a
RENAME TABLE of an existing subscription must NOT fork a second sink."""

import os

from pyspark.sql import types as T

from canal_spark.fixtures import CdcLogSpec, generate_base_table, generate_cdc_log
from canal_spark.mirror import LakeDatabase, mirror_replay
from canal_spark.oracle import oracle_mirror_final_state
from tests.conftest import assert_state_equal, rows_to_state

TOKSEQ_SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType()),
    T.StructField("tokens", T.ArrayType(T.IntegerType())),
    T.StructField("n_tok", T.IntegerType()),
    T.StructField("source", T.StringType()),
])


def _setup(spark, tmp_work, spec: CdcLogSpec, n_base=200):
    base = generate_base_table(n_base, seed=spec.seed)
    log_dir = os.path.join(tmp_work, "log")
    generate_cdc_log(log_dir, spec, base)
    db = LakeDatabase(spark, os.path.join(tmp_work, "lakedb"))
    bdf = spark.createDataFrame(base.to_pandas(), TOKSEQ_SCHEMA)
    db.create("train.tokseq", TOKSEQ_SCHEMA, n_buckets=8, df=bdf)
    return base, log_dir, db


def _check_all(db, base, log_dir, sink_names):
    expected = oracle_mirror_final_state(
        {"train.tokseq": base, "train.other_tbl": None}, log_dir)
    assert sorted(db.names()) == sorted(sink_names)
    for name in sink_names:
        t = db.get(name)
        exp_state, exp_cols = expected[name]
        assert t.logical_columns() == exp_cols
        actual = rows_to_state(t.read().collect(), exp_cols)
        assert_state_equal(actual, exp_state, exp_cols)


def test_mirror_routes_two_tables(spark, tmp_work):
    spec = CdcLogSpec(n_events=2500, seed=21, events_per_file=800,
                      other_table_frac=0.15, pk_change_frac=0.03)
    base, log_dir, db = _setup(spark, tmp_work, spec)
    stats = mirror_replay(spark, log_dir, db, batch_id="m1")
    # other_tbl sink auto-created with a schema inferred from typed images
    assert set(stats) == {"train.tokseq", "train.other_tbl"}
    other = db.get("train.other_tbl")
    assert other.logical_columns()[:1] == ["doc_id"]
    assert stats["train.other_tbl"].events > 0
    _check_all(db, base, log_dir, ["train.tokseq", "train.other_tbl"])

    # whole-batch redelivery: per-table ledger makes every sink a no-op
    v = {n: db.get(n).version for n in db.names()}
    again = mirror_replay(spark, log_dir, db, batch_id="m1")
    assert all(s.ranges == 0 for s in again.values())
    assert {n: db.get(n).version for n in db.names()} == v


def test_mirror_ddl_applies_only_to_its_table(spark, tmp_work):
    ddl = [(800, "ALTER TABLE train.tokseq ADD COLUMN lang varchar")]
    spec = CdcLogSpec(n_events=2500, seed=22, events_per_file=800,
                      other_table_frac=0.1, ddl_script=ddl)
    base, log_dir, db = _setup(spark, tmp_work, spec)
    # the log's merged image struct widens globally once ANY table alters;
    # create-on-first-sight inference must NOT copy tokseq's DDL-added
    # column onto other_tbl (inference excludes this log's DDL-born names)
    stats = mirror_replay(spark, log_dir, db)
    # the ALTER splits tokseq's merge but must NOT split other_tbl's
    assert stats["train.tokseq"].ranges == 2
    assert stats["train.other_tbl"].ranges == 1
    assert "lang" in db.get("train.tokseq").logical_columns()
    assert "lang" not in db.get("train.other_tbl").logical_columns()
    _check_all(db, base, log_dir, ["train.tokseq", "train.other_tbl"])


def test_mirror_rename_does_not_fork_a_second_sink(spark, tmp_work):
    ddl = [(1000, "RENAME TABLE train.tokseq TO train.tokseq2")]
    spec = CdcLogSpec(n_events=2500, seed=23, events_per_file=800,
                      other_table_frac=0.1, ddl_script=ddl)
    base, log_dir, db = _setup(spark, tmp_work, spec)
    mirror_replay(spark, log_dir, db)
    # post-rename DML arrives under train.tokseq2 — it belongs to the
    # renamed sink (catalog key stays train.tokseq), NOT a new table
    assert sorted(db.names()) == ["train.other_tbl", "train.tokseq"]
    assert db.current_subscriptions()["train.tokseq"] == ("train", "tokseq2")
    expected = oracle_mirror_final_state(
        {"train.tokseq": base, "train.other_tbl": None}, log_dir)
    for name in db.names():
        exp_state, exp_cols = expected[name]
        actual = rows_to_state(db.get(name).read().collect(), exp_cols)
        assert_state_equal(actual, exp_state, exp_cols)

    # a LATER batch must still route tokseq2 DML to the renamed sink
    tail_spec = CdcLogSpec(n_events=600, seed=24, events_per_file=600,
                           other_table_frac=0.1, doc_offset=20_000_000,
                           gtid_offset=10_000,
                           table=("train", "tokseq2"))
    tail_dir = os.path.join(tmp_work, "tail_log")
    generate_cdc_log(tail_dir, tail_spec, None)
    mirror_replay(spark, tail_dir, db)
    assert sorted(db.names()) == ["train.other_tbl", "train.tokseq"]
    final = rows_to_state(db.get("train.tokseq").read().collect(),
                          ["doc_id", "tokens", "n_tok", "source"])
    assert any(k.startswith("doc02000") for k in final)

    # regression (mirror fuzz finding): redeliver the ORIGINAL log — its
    # pre-rename events arrive under the OLD name, which is no longer the
    # sink's current subscription; they belong to the sink's persisted
    # history and must route there (fenced no-op), never fork a new sink
    # (db.create used to raise 'already exists' on the catalog key)
    states = {n: rows_to_state(db.get(n).read().collect(),
                               ["doc_id", "tokens", "n_tok", "source"])
              for n in db.names()}
    mirror_replay(spark, log_dir, db)
    assert sorted(db.names()) == ["train.other_tbl", "train.tokseq"]
    for n, before in states.items():
        assert rows_to_state(db.get(n).read().collect(),
                             ["doc_id", "tokens", "n_tok", "source"]) == before


def test_mirror_parallel_apply_equals_serial(spark, tmp_work):
    """Per-sink applies submitted from the driver thread pool (the
    reference's pooled per-table executors, RdbSyncService.java:52-131)
    must land every sink in exactly the serial apply's state — same oracle,
    same versions-per-sink shape, same schema."""
    spec = CdcLogSpec(n_events=2500, seed=23, events_per_file=800,
                      other_table_frac=0.2, pk_change_frac=0.03,
                      ddl_script=[(900, "ALTER TABLE train.tokseq "
                                        "ADD COLUMN lang varchar")])
    base = generate_base_table(200, seed=spec.seed)
    log_dir = os.path.join(tmp_work, "log")
    generate_cdc_log(log_dir, spec, base)
    bdf = spark.createDataFrame(base.to_pandas(), TOKSEQ_SCHEMA)

    dbs = {}
    for mode, conc in (("serial", 1), ("parallel", 4)):
        db = LakeDatabase(spark, os.path.join(tmp_work, f"lakedb_{mode}"))
        db.create("train.tokseq", TOKSEQ_SCHEMA, n_buckets=8, df=bdf)
        stats = mirror_replay(spark, log_dir, db, batch_id="m1",
                              max_concurrency=conc)
        assert set(stats) == {"train.tokseq", "train.other_tbl"}
        dbs[mode] = db

    expected = oracle_mirror_final_state(
        {"train.tokseq": base, "train.other_tbl": None}, log_dir)
    for name in ("train.tokseq", "train.other_tbl"):
        exp_state, exp_cols = expected[name]
        states = {}
        for mode, db in dbs.items():
            t = db.get(name)
            assert t.logical_columns() == exp_cols
            states[mode] = rows_to_state(t.read().collect(), exp_cols)
            assert_state_equal(states[mode], exp_state, exp_cols)
        assert states["serial"] == states["parallel"]
