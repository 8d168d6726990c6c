"""LakeTable.describe(): the metadata-only admin/metrics surface."""

import os

from pyspark.sql import types as T

from canal_spark.table.lake import LakeTable

SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType()),
    T.StructField("tokens", T.ArrayType(T.IntegerType())),
    T.StructField("n_tok", T.IntegerType()),
    T.StructField("source", T.StringType()),
])

BASE = [("a", [1], 1, "web"), ("b", [2], 1, "web"), ("c", [3], 1, "books")]


def _chg(spark, rows):
    schema = T.StructType(SCHEMA.fields + [
        T.StructField("op", T.StringType()),
        T.StructField("lsn", T.StringType()),
    ])
    return spark.createDataFrame(rows, schema)


def test_describe_tracks_state_without_scans(spark, tmp_work):
    t = LakeTable.create(spark, os.path.join(tmp_work, "t"), SCHEMA,
                         n_buckets=4, merge_mode="mor",
                         df=spark.createDataFrame(BASE, SCHEMA))
    d = t.describe()
    assert d["n_buckets"] == 4 and d["migration"] is None
    assert d["base_rows"] == 3 and d["delta_files"] == 0
    assert d["columns"] == ["doc_id", "tokens", "n_tok", "source"]

    t.merge_apply(_chg(spark, [
        ("a", [9], 1, "code", "U", "lsn-002"),
        ("d", [4], 1, "wiki", "U", "lsn-003"),
    ]), batch_id="b1")
    d = t.describe()
    assert d["delta_files"] >= 1 and d["delta_rows"] == 2
    assert d["watermark_lsn"] == "lsn-003" and d["applied_batches"] == 1
    assert d["version"] == t.version

    t.rebucket_start(8)
    t.rebucket_step(1)
    d = t.describe()
    assert d["migration"] == {"target": 8, "migrated": 1, "remaining": 3}
    while t.rebucket_step(2)["remaining"]:
        pass
    assert t.describe()["migration"] is None
    assert t.describe()["n_buckets"] == 8
