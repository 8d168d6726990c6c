"""End-to-end batch replay vs the sequential-apply oracle.

The flagship correctness gate (BASELINE.json): after replaying the synthetic
binlog, the engine's table equals the oracle row-for-row with exact
token-array equality per doc_id.
"""

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from canal_spark.fixtures import CdcLogSpec, generate_base_table, generate_cdc_log
from canal_spark.fixtures.generator import duplicate_tail
from canal_spark.oracle import oracle_final_state
from canal_spark.pipeline import replay
from canal_spark.table.lake import LakeTable
from tests.conftest import assert_state_equal, rows_to_state

TOKSEQ_SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType()),
    T.StructField("tokens", T.ArrayType(T.IntegerType())),
    T.StructField("n_tok", T.IntegerType()),
    T.StructField("source", T.StringType()),
])


def _setup(spark, tmp_work, spec: CdcLogSpec, n_base=300):
    base = generate_base_table(n_base, seed=spec.seed)
    log_dir = os.path.join(tmp_work, "log")
    generate_cdc_log(log_dir, spec, base)
    bdf = spark.createDataFrame(
        base.to_pandas(), TOKSEQ_SCHEMA
    )
    table = LakeTable.create(spark, os.path.join(tmp_work, "tokseq"),
                             TOKSEQ_SCHEMA, n_buckets=8, df=bdf)
    return base, log_dir, table


def _check(spark, table, base, log_dir):
    expected, cols = oracle_final_state(base, log_dir)
    actual = rows_to_state(table.read().collect(), table.logical_columns())
    assert table.logical_columns() == cols
    assert_state_equal(actual, expected, cols)


def test_replay_plain(spark, tmp_work):
    spec = CdcLogSpec(n_events=3000, seed=11, events_per_file=1000,
                      other_table_frac=0.05, pk_change_frac=0.05)
    base, log_dir, table = _setup(spark, tmp_work, spec)
    stats = replay(spark, log_dir, table, batch_id="full")
    assert stats.ranges == 1 and stats.ddls == 0
    _check(spark, table, base, log_dir)


def test_replay_with_skew_and_salt(spark, tmp_work):
    spec = CdcLogSpec(n_events=3000, seed=12, hot_keys=4, hot_frac=0.6,
                      op_mix=(0.2, 0.75, 0.05))
    base, log_dir, table = _setup(spark, tmp_work, spec)
    replay(spark, log_dir, table, salt_partitions=8)
    _check(spark, table, base, log_dir)


def test_replay_with_ddl_schema_evolution(spark, tmp_work):
    ddl = [
        (500, "ALTER TABLE train.tokseq ADD COLUMN lang varchar"),
        (1200, "ALTER TABLE train.tokseq RENAME COLUMN source TO src"),
        (1800, "CREATE INDEX idx1 ON train.tokseq (doc_id)"),  # must be ignored
        (2200, "ALTER TABLE train.tokseq DROP COLUMN lang"),
    ]
    spec = CdcLogSpec(n_events=3000, seed=13, events_per_file=800,
                      ddl_script=ddl, pk_change_frac=0.03)
    base, log_dir, table = _setup(spark, tmp_work, spec)
    stats = replay(spark, log_dir, table, batch_id="full")
    # the ignorable CREATE INDEX must NOT split a merge range (3 real DDLs)
    assert stats.ddls == 3 and stats.ranges == 4
    assert table.logical_columns() == ["doc_id", "tokens", "n_tok", "src"]
    _check(spark, table, base, log_dir)


def test_replay_with_truncate(spark, tmp_work):
    ddl = [(1000, "TRUNCATE TABLE train.tokseq")]
    spec = CdcLogSpec(n_events=2000, seed=14, ddl_script=ddl)
    base, log_dir, table = _setup(spark, tmp_work, spec)
    replay(spark, log_dir, table)
    _check(spark, table, base, log_dir)


def test_replay_duplicate_delivery_idempotent(spark, tmp_work):
    """At-least-once: re-delivered segments must be no-ops (idempotent MERGE
    keyed (doc_id, _source_lsn) — the exactly-once requirement)."""
    spec = CdcLogSpec(n_events=2000, seed=15, events_per_file=500)
    base, log_dir, table = _setup(spark, tmp_work, spec)
    replay(spark, log_dir, table, batch_id="first")
    state_before = rows_to_state(table.read().collect(), table.logical_columns())

    # duplicate the last 2 segments under new names and replay ONLY them
    dups = duplicate_tail(log_dir, n_files=2)
    replay(spark, log_dir, table, files=dups, batch_id="dup-delivery")
    state_after = rows_to_state(table.read().collect(), table.logical_columns())
    assert state_before == state_after

    # and the full-log oracle still matches (dup events are idempotent there too)
    _check(spark, table, base, log_dir)


def test_replay_whole_batch_replay_is_noop(spark, tmp_work):
    spec = CdcLogSpec(n_events=1000, seed=16)
    base, log_dir, table = _setup(spark, tmp_work, spec)
    replay(spark, log_dir, table, batch_id="b0")
    v = table.version
    stats = replay(spark, log_dir, table, batch_id="b0")  # ledger hit
    assert stats.ranges == 0 and table.version == v
    # replay WITHOUT ledger id: LSN fence alone must keep state identical
    replay(spark, log_dir, table)
    _check(spark, table, base, log_dir)


@pytest.mark.parametrize("variant", ["maxby", "window"])
def test_lww_collapse_variants_agree(spark, tmp_work, variant):
    from canal_spark.operators.lww import (changes_from_events, collapse_lww,
                                           collapse_lww_window)
    from canal_spark.pipeline import read_event_log, with_lsn

    spec = CdcLogSpec(n_events=1500, seed=17, pk_change_frac=0.1)
    base, log_dir, _ = _setup(spark, tmp_work, spec)
    ev = with_lsn(read_event_log(spark, log_dir)).where(
        "entry_type = 'ROWDATA' AND NOT is_ddl AND table_name = 'tokseq'"
    )
    ch = changes_from_events(ev)
    got = collapse_lww(ch) if variant == "maxby" else collapse_lww_window(ch)
    rows = got.collect()
    assert len(rows) == got.select("doc_id").distinct().count()
    # cross-check the two variants
    other = collapse_lww_window(ch) if variant == "maxby" else collapse_lww(ch)
    a = {(r["doc_id"], r["op"], r["lsn"]) for r in rows}
    b = {(r["doc_id"], r["op"], r["lsn"]) for r in other.collect()}
    assert a == b


def test_replay_with_full_alter_grammar(spark, tmp_work):
    """Round-2 grammar: MODIFY (type widen), CHANGE (rename+retype),
    multi-clause ALTER, positioned ADD — engine state must still equal the
    sequential oracle (which shares the grammar but applies it as a plain
    dict fold)."""
    ddl = [
        (400, "ALTER TABLE train.tokseq MODIFY COLUMN n_tok BIGINT"),
        (900, "ALTER TABLE train.tokseq ADD COLUMN q1 TEXT, ADD q2 TEXT"),
        (1400, "ALTER TABLE train.tokseq ADD COLUMN lead_c TEXT FIRST"),
        (1900, "ALTER TABLE train.tokseq CHANGE COLUMN q1 quality VARCHAR(32)"),
        (2300, "ALTER TABLE train.tokseq ADD INDEX iq (q2)"),  # shape no-op
        (2600, "ALTER TABLE train.tokseq DROP COLUMN q2, DROP COLUMN lead_c"),
    ]
    spec = CdcLogSpec(n_events=3000, seed=21, events_per_file=700,
                      ddl_script=ddl, pk_change_frac=0.03)
    base, log_dir, table = _setup(spark, tmp_work, spec)
    stats = replay(spark, log_dir, table, batch_id="full")
    # the shape-preserving ADD INDEX must NOT split a merge range
    assert stats.ddls == 5 and stats.ranges == 6
    table.refresh()
    assert table.logical_columns() == ["doc_id", "tokens", "n_tok", "source",
                                       "quality"]
    assert table.schema()["n_tok"].dataType == T.LongType()
    _check(spark, table, base, log_dir)


def test_resume_into_ddl_split_range(spark, tmp_work):
    """Crash BETWEEN a DDL's registry commit and the following range's
    MERGE (VERDICT r01 missing #5): the resumed replay must skip the
    already-merged range (batch ledger), skip the already-applied DDL
    (last_ddl_lsn fence), and apply only the tail — ending in the exact
    oracle state. Mirrors DatabaseTableMeta.rollback-to-position semantics
    at the sink."""
    from pyspark.sql import functions as F

    from canal_spark.pipeline import apply_dml_range, prepare_events, read_event_log
    from canal_spark.schema.tracker import SchemaTracker

    ddl_sql = "ALTER TABLE train.tokseq ADD COLUMN quality_tier TEXT"
    spec = CdcLogSpec(n_events=2500, seed=31, events_per_file=600,
                      ddl_script=[(1200, ddl_sql)], pk_change_frac=0.03)
    base, log_dir, table = _setup(spark, tmp_work, spec)

    # --- partial run: merge the pre-DDL range, mirror the DDL, then "crash"
    ev = prepare_events(read_event_log(spark, log_dir))
    ddl_row = ev.where(F.col("is_ddl")).select("lsn", "sql").collect()
    assert len(ddl_row) == 1
    ddl_lsn = ddl_row[0]["lsn"]
    dml = ev.where(~F.col("is_ddl"))
    # the same sub-range batch id replay() itself would use
    apply_dml_range(dml, table, None, ddl_lsn, batch_id="full/r0")
    SchemaTracker(table.refresh()).apply_ddl(ddl_sql, ddl_lsn)
    table.refresh()
    assert "quality_tier" in table.logical_columns()
    v_crash = table.version

    # --- resume: full replay under the same outer batch id
    stats = replay(spark, log_dir, table.refresh(), batch_id="full")
    table.refresh()
    # r0 must have been skipped by the ledger (merge was a no-op commit)
    assert any(m.get("skipped") for m in stats.merges)
    _check(spark, table, base, log_dir)

    # --- replay the whole batch once more: everything fenced, state stable
    v_done = table.version
    replay(spark, log_dir, table.refresh(), batch_id="full")
    assert table.refresh().version == v_done
    _check(spark, table, base, log_dir)
    assert v_done > v_crash


def test_start_position_resolution(spark, tmp_work):
    """Bootstrap-without-checkpoint (VERDICT r01 missing #2): resolve a
    start from a timestamp or a configured (file, pos) via parquet FOOTER
    stats only, prune pre-boundary segments from the scan, and land in the
    exact oracle state (prefix already applied, LSN fence absorbs overlap)."""
    from canal_spark.streaming.positions import find_start_position, segment_stats

    spec = CdcLogSpec(n_events=4000, seed=41, events_per_file=800,
                      pk_change_frac=0.02, other_table_frac=0.03)
    base, log_dir, table = _setup(spark, tmp_work, spec)
    stats = segment_stats(log_dir)
    assert len(stats) >= 4
    assert all(s.min_ts is not None and s.max_ts is not None for s in stats)

    # consume the first two segments "yesterday"
    replay(spark, log_dir, table, files=[s.file for s in stats[:2]])

    # --- resume from a timestamp: the boundary segment's first event time
    boundary = stats[2].min_ts
    sp = find_start_position(log_dir, timestamp=boundary)
    # pruning is conservative on timestamp ties at segment rolls: every
    # needed segment is present and at least the oldest is pruned
    assert all(s.file in sp.files for s in stats[2:])
    assert stats[0].file not in sp.files
    replay(spark, log_dir, table.refresh(), start=sp)
    _check(spark, table.refresh(), base, log_dir)

    # --- (file, pos) start on a fresh prefix-seeded table
    table2 = LakeTable.create(
        spark, os.path.join(tmp_work, "tokseq2"), TOKSEQ_SCHEMA, n_buckets=8,
        df=spark.createDataFrame(base.to_pandas(), TOKSEQ_SCHEMA))
    replay(spark, log_dir, table2, files=[s.file for s in stats[:3]])
    sp2 = find_start_position(log_dir, binlog_file=stats[3].binlog_file,
                              binlog_pos=4)
    assert sp2.files == [s.file for s in stats[3:]]
    replay(spark, log_dir, table2.refresh(), start=sp2)
    _check(spark, table2.refresh(), base, log_dir)

    # --- GTID start (gtid-mode subscription): prune by footer max_gtid,
    # row-fence by gtid_seq, land in the oracle state from a prefix seed
    table3 = LakeTable.create(
        spark, os.path.join(tmp_work, "tokseq3"), TOKSEQ_SCHEMA, n_buckets=8,
        df=spark.createDataFrame(base.to_pandas(), TOKSEQ_SCHEMA))
    replay(spark, log_dir, table3, files=[s.file for s in stats[:3]])
    boundary_gtid = stats[3].min_gtid
    assert boundary_gtid is not None
    sp_g = find_start_position(log_dir, gtid=boundary_gtid)
    assert all(s.file in sp_g.files for s in stats[3:])
    assert stats[0].file not in sp_g.files
    replay(spark, log_dir, table3.refresh(), start=sp_g)
    _check(spark, table3.refresh(), base, log_dir)

    # --- a start past the end of the log is a clean no-op
    import datetime
    future = datetime.datetime(2100, 1, 1, tzinfo=datetime.timezone.utc)
    sp3 = find_start_position(log_dir, timestamp=future)
    assert sp3.files == []
    v = table.refresh().version
    st = replay(spark, log_dir, table, start=sp3)
    assert st.ranges == 0 and table.refresh().version == v
    sp4 = find_start_position(log_dir, gtid=(stats[-1].max_gtid or 0) + 1)
    assert sp4.files == []


def test_group_replay_batch(spark, tmp_work):
    """Batch form of the N-source merge: two disjoint-key shard logs fold
    into one table in merged-timeline order, equal to the group oracle."""
    import pyarrow as pa

    from canal_spark.oracle import oracle_group_final_state
    from canal_spark.pipeline import group_replay

    bases, dirs = [], []
    for i in range(2):
        b = generate_base_table(120, seed=61 + i, id_offset=i * 1_000_000)
        spec = CdcLogSpec(n_events=1200, seed=61 + i, events_per_file=400,
                          pk_change_frac=0.03, other_table_frac=0.03,
                          doc_offset=10_000_000 * (i + 1))
        d = os.path.join(tmp_work, f"shard{i}")
        generate_cdc_log(d, spec, b)
        bases.append(b)
        dirs.append(d)
    combined = pa.concat_tables(bases)
    table = LakeTable.create(
        spark, os.path.join(tmp_work, "tokseq"), TOKSEQ_SCHEMA, n_buckets=8,
        df=spark.createDataFrame(combined.to_pandas(), TOKSEQ_SCHEMA))
    stats = group_replay(spark, dirs, table, batch_id="g1")
    assert stats.events > 0
    expected, cols = oracle_group_final_state(bases, dirs)
    actual = rows_to_state(table.refresh().read().collect(),
                           table.logical_columns())
    assert_state_equal(actual, expected, cols)
    # idempotence: same batch id is a no-op
    v = table.refresh().version
    group_replay(spark, dirs, table.refresh(), batch_id="g1")
    assert table.refresh().version == v


# ---------------------------------------------------------------- rename
# RENAME TABLE follow, end-to-end (DatabaseTableMeta keeps tracking the
# renamed table, parse/.../tsdb/DatabaseTableMeta.java:161-181): DML
# arriving under the NEW name keeps merging, the snapshot records the new
# subscription for later resumes, and stale DML under the OLD name stops.

RENAME_SQL = "RENAME TABLE train.tokseq TO train.tokseq_v2"


def test_rename_table_follow_end_to_end(spark, tmp_work):
    spec = CdcLogSpec(n_events=1800, seed=51, events_per_file=400,
                      ddl_script=[(600, RENAME_SQL)], pk_change_frac=0.03,
                      other_table_frac=0.05)
    base, log_dir, table = _setup(spark, tmp_work, spec)

    # the fixture really emits post-rename DML under the new name
    from canal_spark.pipeline import read_event_log
    names = {r["table_name"] for r in read_event_log(spark, log_dir)
             .select("table_name").distinct().collect()}
    assert "tokseq_v2" in names and "tokseq" in names

    stats = replay(spark, log_dir, table, batch_id="full")
    assert stats.ddls == 1 and stats.ranges == 2
    _check(spark, table, base, log_dir)  # oracle follows the rename too
    assert tuple(table.refresh().snap["subscribed"]) == ("train", "tokseq_v2")


def test_rename_table_follow_resume(spark, tmp_work):
    """Split replay across the rename: a FRESH LakeTable handle must resume
    the renamed subscription from the snapshot, not reset to the default."""
    import json

    spec = CdcLogSpec(n_events=1800, seed=52, events_per_file=400,
                      ddl_script=[(600, RENAME_SQL)], pk_change_frac=0.03)
    base, log_dir, table = _setup(spark, tmp_work, spec)
    files = json.load(open(os.path.join(log_dir, "log_manifest.json")))["files"]
    assert len(files) >= 4
    replay(spark, log_dir, table, files=files[:3], batch_id="p1")
    assert tuple(table.refresh().snap["subscribed"]) == ("train", "tokseq_v2")

    resumed = LakeTable(spark, table.path)  # fresh handle: snapshot only
    replay(spark, log_dir, resumed, files=files[3:], batch_id="p2")
    _check(spark, resumed.refresh(), base, log_dir)


def test_stale_old_name_dml_ignored_after_rename(spark, tmp_work):
    """A late event still using the pre-rename table name must NOT apply
    (independent of the oracle, which shares the follow logic)."""
    import numpy as np
    import pyarrow.parquet as pq

    from canal_spark.fixtures.generator import _SegmentBuffer
    from canal_spark.oracle import oracle_final_state

    spec = CdcLogSpec(n_events=1200, seed=53, events_per_file=400,
                      ddl_script=[(500, RENAME_SQL)])
    base, log_dir, table = _setup(spark, tmp_work, spec)
    expected, cols = oracle_final_state(base, log_dir)
    victim = sorted(expected)[0]
    vrow = expected[victim]

    # craft a DELETE for the victim under the OLD name, LSN past the end
    seg_files = sorted(f for f in os.listdir(log_dir) if f.endswith(".parquet"))
    max_gtid = max(int(pq.read_table(os.path.join(log_dir, f),
                                     columns=["gtid_seq"])
                       .column(0).to_numpy().max()) for f in seg_files)
    pool = np.asarray(list(vrow["tokens"]) or [0], dtype=np.int32)
    buf = _SegmentBuffer([c for c in cols if c not in
                          ("doc_id", "tokens", "n_tok", "source")])
    img = {"doc_id": victim, "source": vrow["source"],
           "n_tok": vrow["n_tok"], "tok_lo": 0, "tok_hi": len(pool)}
    buf.add("ROWDATA", "DELETE", max_gtid + 1, "mysql-bin.999999", 4,
            1_800_000_000_000_000, "train", "tokseq", f"xid-{max_gtid+1}",
            False, None, img, None)
    buf.flush(os.path.join(log_dir, "mysql-bin.999999.parquet"), pool)

    replay(spark, log_dir, table, batch_id="full")
    actual = rows_to_state(table.refresh().read().collect(),
                           table.logical_columns())
    assert victim in actual  # the stale-name DELETE did not land
    assert_state_equal(actual, expected, cols)


def test_typed_added_columns_int_and_float(spark, tmp_work):
    """DDL-added columns with NUMERIC declared types, found by the fuzz
    harness: wire values travel as strings (FlatMessage model), the
    generator emits type-conforming strings, the sink casts to the
    declared type at MERGE (SURVEY §2 row 39), and the oracle coerces
    identically. Covers BOTH replay paths — typed (cast at merge) and
    wire (tolerant string decode + cast, operators/lww.py)."""
    from canal_spark.operators.decode import convert_log_to_wire

    spec = CdcLogSpec(
        n_events=900, seed=61, events_per_file=250, pk_change_frac=0.05,
        ddl_script=[
            (150, "ALTER TABLE train.tokseq ADD COLUMN rank_i INT"),
            (450, "ALTER TABLE train.tokseq ADD COLUMN score_f DOUBLE"),
        ])
    base, log_dir, table = _setup(spark, tmp_work, spec)
    stats = replay(spark, log_dir, table, batch_id="typed")
    assert stats.ddls == 2
    table = table.refresh()
    _check(spark, table, base, log_dir)
    # the evolved columns really are typed AND populated on the sink
    sch = {f.name: f.dataType.simpleString() for f in table.read().schema}
    assert sch["rank_i"] == "int" and sch["score_f"] == "double"
    assert table.read().where(F.col("rank_i").isNotNull()).count() > 0

    # same log through the WIRE path (fused string-payload collapse)
    wire_dir = os.path.join(tmp_work, "wire")
    convert_log_to_wire(spark, log_dir, wire_dir)
    table2 = LakeTable.create(
        spark, os.path.join(tmp_work, "tokseq2"), TOKSEQ_SCHEMA, n_buckets=8,
        df=spark.createDataFrame(base.to_pandas(), TOKSEQ_SCHEMA))
    replay(spark, wire_dir, table2, batch_id="wire", wire=True)
    _check(spark, table2.refresh(), base, log_dir)
