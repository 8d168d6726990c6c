"""DDL classifier unit tests (DruidDdlParser/SimpleDdlParser analog,
MemoryTableMeta skip-list semantics) — pure Python, no Spark session."""

from __future__ import annotations

from pyspark.sql import types as T

from canal_spark.schema.ddl import (
    mysql_type_to_spark,
    parse_ddl,
    parse_ddl_statements,
)


def test_add_column_variants():
    for sql, col, dtype in [
        ("ALTER TABLE train.tokseq ADD COLUMN quality_tier STRING", "quality_tier", T.StringType()),
        ("alter table tokseq add lang varchar(8)", "lang", T.StringType()),
        ("ALTER TABLE `train`.`tokseq` ADD COLUMN `n_spans` INT", "n_spans", T.IntegerType()),
        ("ALTER TABLE t ADD COLUMN big BIGINT;", "big", T.LongType()),
        ("ALTER TABLE t ADD COLUMN ts TIMESTAMP NULL", "ts", T.TimestampType()),
    ]:
        cmd = parse_ddl(sql)
        assert cmd.kind == "ADD_COLUMN", sql
        assert cmd.column == col
        assert cmd.dtype == dtype


def test_qualified_names():
    cmd = parse_ddl("ALTER TABLE train.tokseq ADD COLUMN x TEXT")
    assert (cmd.schema, cmd.table) == ("train", "tokseq")
    cmd = parse_ddl("ALTER TABLE tokseq ADD COLUMN x TEXT")
    assert (cmd.schema, cmd.table) == (None, "tokseq")


def test_rename_and_drop():
    cmd = parse_ddl("ALTER TABLE train.tokseq RENAME COLUMN old_c TO new_c")
    assert cmd.kind == "RENAME_COLUMN" and (cmd.column, cmd.new_name) == ("old_c", "new_c")
    cmd = parse_ddl("ALTER TABLE train.tokseq DROP COLUMN gone")
    assert cmd.kind == "DROP_COLUMN" and cmd.column == "gone"
    cmd = parse_ddl("ALTER TABLE train.tokseq DROP gone2")
    assert cmd.kind == "DROP_COLUMN" and cmd.column == "gone2"


def test_truncate():
    for sql in ("TRUNCATE TABLE train.tokseq", "truncate tokseq"):
        cmd = parse_ddl(sql)
        assert cmd.kind == "TRUNCATE"
        assert cmd.table == "tokseq"


def test_skip_list():
    """Statements that never change row shape must be ignored
    (MemoryTableMeta.apply skip-list, MemoryTableMeta.java:76-84)."""
    for sql in [
        "CREATE INDEX idx_src ON tokseq(source)",
        "CREATE UNIQUE INDEX u ON tokseq(doc_id)",
        "DROP INDEX idx_src ON tokseq",
        "GRANT SELECT ON train.* TO 'reader'@'%'",
        "FLUSH TABLES",
        "SET NAMES utf8mb4",
        "ANALYZE TABLE tokseq",
        "OPTIMIZE TABLE tokseq",
        "BEGIN",
        "COMMIT",
        "",
        None,
    ]:
        assert parse_ddl(sql).kind == "IGNORE", sql


def test_unknown_statement_is_noop():
    assert parse_ddl("CREATE TABLE other (id INT)").kind == "IGNORE"
    assert parse_ddl("ALTER TABLE t FROB THE KNOB").kind == "IGNORE"


# ---- round-2 grammar (DruidDdlParser alter-corpus coverage) ----

def test_modify_column():
    cmd = parse_ddl("ALTER TABLE train.tokseq MODIFY COLUMN n_tok BIGINT")
    assert cmd.kind == "MODIFY_COLUMN"
    assert cmd.column == "n_tok" and cmd.dtype == T.LongType()
    cmd = parse_ddl("alter table t modify c decimal(12,3) not null")
    assert cmd.kind == "MODIFY_COLUMN" and cmd.dtype == T.DecimalType(12, 3)


def test_change_column():
    cmd = parse_ddl("ALTER TABLE t CHANGE COLUMN old_c new_c VARCHAR(64)")
    assert cmd.kind == "CHANGE_COLUMN"
    assert (cmd.column, cmd.new_name) == ("old_c", "new_c")
    assert cmd.dtype == T.StringType()
    cmd = parse_ddl("ALTER TABLE t CHANGE `a` `b` INT UNSIGNED")
    assert (cmd.column, cmd.new_name) == ("a", "b")
    assert cmd.dtype == T.LongType()  # unsigned int widens past int32


def test_multi_clause_alter():
    cmds = parse_ddl_statements(
        "ALTER TABLE train.tokseq ADD COLUMN a INT, ADD b TEXT, "
        "DROP COLUMN c, MODIFY d BIGINT")
    kinds = [c.kind for c in cmds]
    assert kinds == ["ADD_COLUMN", "ADD_COLUMN", "DROP_COLUMN", "MODIFY_COLUMN"]
    assert [c.column for c in cmds] == ["a", "b", "c", "d"]


def test_parenthesized_add_batch():
    cmds = parse_ddl_statements("ALTER TABLE t ADD (x INT, y DECIMAL(8,2))")
    assert [c.column for c in cmds] == ["x", "y"]
    assert cmds[1].dtype == T.DecimalType(8, 2)


def test_column_position():
    cmd = parse_ddl("ALTER TABLE t ADD COLUMN lead INT FIRST")
    assert cmd.position == ("FIRST", None)
    cmd = parse_ddl("ALTER TABLE t ADD COLUMN mid INT AFTER doc_id")
    assert cmd.position == ("AFTER", "doc_id")
    cmd = parse_ddl("ALTER TABLE t MODIFY c BIGINT AFTER source")
    assert cmd.position == ("AFTER", "source")


def test_rename_table_forms():
    cmd = parse_ddl("RENAME TABLE train.tokseq TO train.tokseq2")
    assert cmd.kind == "RENAME_TABLE" and cmd.new_name == "train.tokseq2"
    cmd = parse_ddl("ALTER TABLE tokseq RENAME TO tokseq_v2")
    assert cmd.kind == "RENAME_TABLE" and cmd.new_name == "tokseq_v2"
    cmd = parse_ddl("ALTER TABLE tokseq RENAME AS tokseq_v3")
    assert cmd.new_name == "tokseq_v3"


def test_shape_preserving_clauses_ignored():
    for sql in [
        "ALTER TABLE t ADD INDEX idx (source)",
        "ALTER TABLE t ADD PRIMARY KEY (doc_id)",
        "ALTER TABLE t ADD CONSTRAINT fk FOREIGN KEY (x) REFERENCES o(y)",
        "ALTER TABLE t DROP INDEX idx",
        "ALTER TABLE t ALTER COLUMN c SET DEFAULT 0",
        "ALTER TABLE t ENGINE=InnoDB",
        "ALTER TABLE t CONVERT TO CHARACTER SET utf8mb4",
        "ALTER TABLE t AUTO_INCREMENT = 100",
    ]:
        assert all(c.kind == "IGNORE" for c in parse_ddl_statements(sql)), sql
    # but ADD of a column whose NAME starts like a keyword still parses
    cmd = parse_ddl("ALTER TABLE t ADD key_count INT")
    assert cmd.kind == "ADD_COLUMN" and cmd.column == "key_count"


def test_mixed_shape_and_index_clauses():
    cmds = parse_ddl_statements(
        "ALTER TABLE t ADD COLUMN q INT, ADD INDEX iq (q), DROP COLUMN z")
    kinds = [c.kind for c in cmds]
    assert kinds == ["ADD_COLUMN", "IGNORE", "DROP_COLUMN"]


def test_type_kernel():
    # LogEventConvert.java:762-847 unsigned-widening semantics
    assert mysql_type_to_spark("int") == T.IntegerType()
    assert mysql_type_to_spark("int(11)") == T.IntegerType()
    assert mysql_type_to_spark("int(10) unsigned") == T.LongType()
    assert mysql_type_to_spark("bigint") == T.LongType()
    assert mysql_type_to_spark("bigint(20) unsigned") == T.DecimalType(20, 0)
    assert mysql_type_to_spark("tinyint(1)") == T.IntegerType()
    assert mysql_type_to_spark("decimal(38,18)") == T.DecimalType(38, 18)
    assert mysql_type_to_spark("numeric") == T.DecimalType(10, 0)
    assert mysql_type_to_spark("enum('a','b')") == T.StringType()
    assert mysql_type_to_spark("set('x','y')") == T.StringType()
    assert mysql_type_to_spark("varbinary(16)") == T.BinaryType()
    assert mysql_type_to_spark("json") == T.StringType()
    assert mysql_type_to_spark("datetime(6)") == T.TimestampType()
    assert mysql_type_to_spark("some_future_type") == T.StringType()


# ------------------------------------------------------- golden fixtures
# ADVICE r02: the oracle classifies DDL with the engine's own grammar, so a
# grammar bug would change both sides identically and parity tests would
# stay green. These golden expectations are HAND-WRITTEN (not produced by
# any parser) for every DDL shape the fixture generator and the driver
# queries emit — an independent anchor for the shared grammar.

GOLDEN_DDL = [
    # (sql, [(kind, column, new_name)])
    ("ALTER TABLE train.tokseq ADD COLUMN quality_tier TEXT",
     [("ADD_COLUMN", "quality_tier", None)]),
    ("ALTER TABLE train.tokseq ADD COLUMN lang VARCHAR(8)",
     [("ADD_COLUMN", "lang", None)]),
    ("ALTER TABLE train.tokseq RENAME COLUMN quality_tier TO q_tier",
     [("RENAME_COLUMN", "quality_tier", "q_tier")]),
    ("ALTER TABLE train.tokseq DROP COLUMN lang",
     [("DROP_COLUMN", "lang", None)]),
    ("ALTER TABLE train.tokseq MODIFY COLUMN q_tier VARCHAR(32)",
     [("MODIFY_COLUMN", "q_tier", None)]),
    ("ALTER TABLE train.tokseq CHANGE COLUMN q_tier tier VARCHAR(32)",
     [("CHANGE_COLUMN", "q_tier", "tier")]),
    ("ALTER TABLE train.tokseq ADD COLUMN a TEXT, ADD COLUMN b TEXT",
     [("ADD_COLUMN", "a", None), ("ADD_COLUMN", "b", None)]),
    ("ALTER TABLE train.tokseq ADD COLUMN pos_c TEXT AFTER source",
     [("ADD_COLUMN", "pos_c", None)]),
    ("TRUNCATE TABLE train.tokseq",
     [("TRUNCATE", None, None)]),
    ("RENAME TABLE train.tokseq TO train.tokseq_v2",
     [("RENAME_TABLE", None, "train.tokseq_v2")]),
    ("ALTER TABLE train.tokseq RENAME TO tokseq_v2",
     [("RENAME_TABLE", None, "tokseq_v2")]),
    # shape-preserving statements the skip-list must ignore entirely
    ("CREATE INDEX idx_src ON train.tokseq (source)",
     [("IGNORE", None, None)]),
    ("ALTER TABLE train.tokseq ADD INDEX idx_src (source)",
     [("IGNORE", None, None)]),
    ("ANALYZE TABLE train.tokseq",
     [("IGNORE", None, None)]),
]


def test_golden_ddl_fixtures():
    for sql, expected in GOLDEN_DDL:
        got = [(c.kind, c.column, c.new_name)
               for c in parse_ddl_statements(sql)]
        assert got == expected, f"{sql!r}: {got} != {expected}"


def test_golden_subscription_walk():
    """Independent end-state check of the rename-follow walk: fold the
    golden DDL list's renames by hand-expected end state."""
    from canal_spark.schema.tracker import SchemaTracker

    sub = ("train", "tokseq")
    for sql, _ in GOLDEN_DDL[:9]:
        for c in parse_ddl_statements(sql):
            sub = SchemaTracker.follow(c, sub)
    assert sub == ("train", "tokseq")  # no rename yet
    for c in parse_ddl_statements("RENAME TABLE train.tokseq TO train.tokseq_v2"):
        sub = SchemaTracker.follow(c, sub)
    assert sub == ("train", "tokseq_v2")
    # a rename of some OTHER table must not move the subscription
    for c in parse_ddl_statements("RENAME TABLE train.other TO train.other2"):
        sub = SchemaTracker.follow(c, sub)
    assert sub == ("train", "tokseq_v2")
