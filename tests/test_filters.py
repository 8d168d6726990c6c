"""Envelope filters + field projection (§2 rows 10-13) — dedicated tests
(VERDICT r01: these rows were implemented but had no direct coverage)."""

from pyspark.sql import functions as F
from pyspark.sql import types as T

from canal_spark.operators.filters import envelope_filter, field_projection

IMAGE = T.StructType([
    T.StructField("doc_id", T.StringType()),
    T.StructField("n_tok", T.IntegerType()),
    T.StructField("source", T.StringType()),
])

SCHEMA = T.StructType([
    T.StructField("entry_type", T.StringType()),
    T.StructField("event_type", T.StringType()),
    T.StructField("schema_name", T.StringType()),
    T.StructField("table_name", T.StringType()),
    T.StructField("is_ddl", T.BooleanType()),
    T.StructField("after", IMAGE),
])


def _events(spark):
    rows = [
        ("ROWDATA", "INSERT", "train", "tokseq", False, ("d1", 3, "web")),
        ("ROWDATA", "UPDATE", "train", "tokseq", False, ("d2", 4, "web")),
        ("ROWDATA", "DELETE", "train", "tokseq", False, ("d3", 1, "web")),
        ("ROWDATA", "INSERT", "train", "other_tbl", False, ("x1", 9, "web")),
        ("ROWDATA", "INSERT", "audit", "tokseq", False, ("x2", 9, "web")),
        ("ROWDATA", "ALTER", "train", "tokseq", True, None),
        ("ROWDATA", "QUERY", "train", "tokseq", False, None),
        ("TRANSACTIONBEGIN", "", "train", "tokseq", False, None),
        ("TRANSACTIONEND", "", "train", "tokseq", False, None),
    ]
    return spark.createDataFrame(rows, SCHEMA)


def test_table_regex_white_and_black(spark):
    ev = _events(spark)
    white = envelope_filter(ev, table_regex=r"^train\.tokseq$")
    assert white.where(F.col("table_name") == "other_tbl").count() == 0
    assert white.where(F.col("schema_name") == "audit").count() == 0
    black = envelope_filter(ev, table_regex=None,
                            table_black_regex=r"\.other_tbl$")
    assert black.where(F.col("table_name") == "other_tbl").count() == 0
    assert black.where(F.col("schema_name") == "audit").count() == 1


def test_dml_type_gate(spark):
    """include/exclude ops filter ROWDATA DML only — markers and DDL always
    pass (filterDmlInsert/Update/Delete analog)."""
    ev = _events(spark).where(F.col("table_name") == "tokseq")
    ins_only = envelope_filter(ev, include_ops=["INSERT"], drop_query=False)
    kinds = {r["event_type"] for r in
             ins_only.where(F.col("entry_type") == "ROWDATA")
             .where(~F.col("is_ddl")).collect()}
    assert "UPDATE" not in kinds and "DELETE" not in kinds
    assert ins_only.where(F.col("entry_type") == "TRANSACTIONEND").count() == 1
    assert ins_only.where(F.col("is_ddl")).count() == 1  # DDL passes the gate

    no_del = envelope_filter(ev, exclude_ops=["DELETE"], drop_query=False)
    assert no_del.where(F.col("event_type") == "DELETE").count() == 0
    assert no_del.where(F.col("event_type") == "UPDATE").count() >= 1


def test_query_and_ddl_flags(spark):
    ev = _events(spark)
    assert envelope_filter(ev).where(F.col("event_type") == "QUERY").count() == 0
    kept = envelope_filter(ev, drop_query=False)
    assert kept.where(F.col("event_type") == "QUERY").count() == 1
    assert envelope_filter(ev, drop_ddl=True).where(F.col("is_ddl")).count() == 0


def test_field_projection(spark):
    """Per-table field whitelist drops struct fields but keeps NULL images
    NULL (needField analog)."""
    ev = _events(spark)
    out = field_projection(ev, "after", ["doc_id", "source"])
    dt = dict(out.dtypes)["after"]
    assert "n_tok" not in dt and "doc_id" in dt and "source" in dt
    rows = {r["event_type"]: r["after"] for r in out.collect()}
    assert rows["INSERT"] is not None and rows["INSERT"]["doc_id"] in ("d1", "x1", "x2")
    assert rows["ALTER"] is None  # null image stays null, not struct-of-nulls
