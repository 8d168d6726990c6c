"""DDL classifier unit tests (DruidDdlParser/SimpleDdlParser analog,
MemoryTableMeta skip-list semantics) — pure Python, no Spark session."""

from __future__ import annotations

from pyspark.sql import types as T

from canal_spark.schema.ddl import parse_ddl


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
    assert parse_ddl("RENAME TABLE a TO b").kind == "IGNORE"
    assert parse_ddl("CREATE TABLE other (id INT)").kind == "IGNORE"
