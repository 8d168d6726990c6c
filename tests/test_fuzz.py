"""Property-based fuzz: random log shapes replayed through the engine must
land in the sequential-apply oracle's state — token arrays exact.

Every prior correctness test fixes a handful of seeded specs; this harness
lets hypothesis drive the spec space (event counts incl. tiny logs, op-mix
extremes, heavy pk-change rates, hot-key skew, segment-roll sizes down to
a few transactions per file, DDL anywhere in the log including event 0)
and shrinks any failure to a minimal spec. The reference's analog is its
randomized DDL corpus test (parse/src/test/.../MemoryTableMeta_Random_
DDL_Test.java) — here the randomization covers the whole apply pipeline:
envelope filter → DDL-split ranges → LWW collapse → LSN-fenced MERGE.
"""

import itertools
import os
import shutil

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from canal_spark.fixtures import CdcLogSpec, generate_base_table, generate_cdc_log
from canal_spark.oracle import oracle_final_state
from canal_spark.pipeline import replay
from canal_spark.table.lake import LakeTable
from tests.conftest import WORK, assert_state_equal, rows_to_state

# one work dir per EXAMPLE, never reused: Spark caches persisted plans by
# file path, so re-running a shrunk example at a path an earlier example
# used (same seed/n_events/epf, different op mix) would read the OLD
# table's cached rows — a harness artifact that looks exactly like an
# engine wrong-answer (diagnosed via a clean standalone repro of the
# "failing" spec)
_RUN = itertools.count()

TOKSEQ_SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType()),
    T.StructField("tokens", T.ArrayType(T.IntegerType())),
    T.StructField("n_tok", T.IntegerType()),
    T.StructField("source", T.StringType()),
])

# one DDL drawn per example; positions clamp into the log
_DDLS = [
    "ALTER TABLE train.tokseq ADD COLUMN q1 STRING",
    "ALTER TABLE train.tokseq ADD COLUMN s1 INT, ADD COLUMN s2 STRING",
    "ALTER TABLE train.tokseq ADD COLUMN tmp INT",
    "TRUNCATE TABLE train.tokseq",
]


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    seed=st.integers(0, 2**20),
    n_events=st.integers(20, 900),
    n_base=st.integers(5, 150),
    ins=st.integers(0, 10), upd=st.integers(0, 10), dele=st.integers(0, 10),
    hot_frac=st.sampled_from([0.0, 0.5, 0.95]),
    pk_change_frac=st.sampled_from([0.0, 0.1, 0.3]),
    events_per_file=st.integers(7, 500),
    txn_max=st.integers(1, 300),
    ddl=st.none() | st.tuples(st.integers(0, 900), st.sampled_from(_DDLS)),
)
def test_fuzz_replay_matches_oracle(spark, seed, n_events, n_base, ins, upd,
                                    dele, hot_frac, pk_change_frac,
                                    events_per_file, txn_max, ddl):
    tot = (ins + upd + dele) or 1
    spec = CdcLogSpec(
        n_events=n_events, seed=seed,
        op_mix=(ins / tot, upd / tot, dele / tot),
        hot_frac=hot_frac, pk_change_frac=pk_change_frac,
        events_per_file=events_per_file, txn_max=txn_max,
        other_table_frac=0.05,
        ddl_script=[(min(ddl[0], n_events - 1), ddl[1])] if ddl else [],
    )
    work = os.path.join(WORK, f"fuzz_{next(_RUN)}_{seed}_{n_events}")
    shutil.rmtree(work, ignore_errors=True)
    try:
        base = generate_base_table(n_base, seed=seed)
        log_dir = os.path.join(work, "log")
        generate_cdc_log(log_dir, spec, base)
        table = LakeTable.create(
            spark, os.path.join(work, "tokseq"), TOKSEQ_SCHEMA, n_buckets=4,
            df=spark.createDataFrame(base.to_pandas(), TOKSEQ_SCHEMA))
        replay(spark, log_dir, table)
        table = table.refresh()

        expected, cols = oracle_final_state(base, log_dir)
        assert table.logical_columns() == cols
        actual = rows_to_state(table.read().collect(), cols)
        assert_state_equal(actual, expected, cols)
    finally:
        shutil.rmtree(work, ignore_errors=True)


@settings(max_examples=4, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    seed=st.integers(0, 2**20),
    n_events=st.integers(20, 600),
    n_base=st.integers(5, 120),
    hot_frac=st.sampled_from([0.0, 0.95]),
    pk_change_frac=st.sampled_from([0.0, 0.3]),
    events_per_file=st.integers(11, 300),
    ddl=st.none() | st.tuples(st.integers(0, 600), st.sampled_from(_DDLS)),
    salt=st.sampled_from([None, 4]),
)
def test_fuzz_wire_replay_matches_oracle(spark, seed, n_events, n_base,
                                         hot_frac, pk_change_frac,
                                         events_per_file, ddl, salt):
    """Same property through the WIRE path (the streaming hot path: fused
    string-payload collapse → tolerant decode → sink-type cast), with the
    salted two-phase collapse in the mix."""
    from canal_spark.operators.decode import convert_log_to_wire

    spec = CdcLogSpec(
        n_events=n_events, seed=seed, hot_frac=hot_frac,
        pk_change_frac=pk_change_frac, events_per_file=events_per_file,
        other_table_frac=0.05,
        ddl_script=[(min(ddl[0], n_events - 1), ddl[1])] if ddl else [],
    )
    work = os.path.join(WORK, f"wfuzz_{next(_RUN)}_{seed}_{n_events}")
    shutil.rmtree(work, ignore_errors=True)
    try:
        base = generate_base_table(n_base, seed=seed)
        log_dir = os.path.join(work, "log")
        generate_cdc_log(log_dir, spec, base)
        wire_dir = os.path.join(work, "wire")
        convert_log_to_wire(spark, log_dir, wire_dir)
        table = LakeTable.create(
            spark, os.path.join(work, "tokseq"), TOKSEQ_SCHEMA, n_buckets=4,
            df=spark.createDataFrame(base.to_pandas(), TOKSEQ_SCHEMA))
        replay(spark, wire_dir, table, wire=True, salt_partitions=salt)
        table = table.refresh()

        expected, cols = oracle_final_state(base, log_dir)
        assert table.logical_columns() == cols
        actual = rows_to_state(table.read().collect(), cols)
        assert_state_equal(actual, expected, cols)
    finally:
        shutil.rmtree(work, ignore_errors=True)
