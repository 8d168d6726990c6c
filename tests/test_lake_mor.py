"""Merge-on-read delta commits: O(batch) apply for spread-key batches.

The copy-on-write MERGE prunes at file granularity, but a batch whose keys
cover most file ranges degrades toward a full bucket rewrite — the shape
Iceberg answers with merge-on-read (v2 equality deletes / Delta deletion
vectors). LakeTable's ``merge_mode`` selects per table: "mor" appends the
LWW-collapsed batch as delta files, resolved by a max-LSN fold at read;
"auto" picks per batch from manifest row counts. ``compact()`` folds the
chain back into base files."""

import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from canal_spark.table.lake import LakeTable

SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType()),
    T.StructField("tokens", T.ArrayType(T.IntegerType())),
    T.StructField("n_tok", T.IntegerType()),
    T.StructField("source", T.StringType()),
])

BASE = [
    ("a", [1, 2], 2, "web"),
    ("b", [3], 1, "web"),
    ("c", [4, 5, 6], 3, "books"),
]


def _mk(spark, path, rows, **kw):
    df = spark.createDataFrame(rows, SCHEMA)
    return LakeTable.create(spark, path, SCHEMA, n_buckets=4, df=df, **kw)


def _chg(spark, rows):
    schema = T.StructType(SCHEMA.fields + [
        T.StructField("op", T.StringType()),
        T.StructField("lsn", T.StringType()),
    ])
    return spark.createDataFrame(rows, schema)


def _state(t):
    return {r["doc_id"]: (list(r["tokens"] or []), r["n_tok"], r["source"])
            for r in t.read().collect()}


def test_mor_commit_is_append_only_and_fold_resolves(spark, tmp_work):
    t = _mk(spark, os.path.join(tmp_work, "t"), BASE, merge_mode="mor")
    base_files = {f for fl in t.snap["files"].values() for f in fl}
    res = t.merge_apply(_chg(spark, [
        ("a", [9, 9], 2, "code", "U", "lsn-002"),
        ("b", None, None, None, "D", "lsn-003"),
        ("d", [7], 1, "wiki", "U", "lsn-004"),
    ]), batch_id="b1")
    assert res["mode"] == "mor" and res["files_read"] == 0
    assert res["delta_files"] >= 1
    # append-only: every base file carried forward untouched
    assert {f for fl in t.snap["files"].values() for f in fl} == base_files
    assert any(t.snap["deltas"].values())
    assert _state(t) == {
        "a": ([9, 9], 2, "code"),
        "c": ([4, 5, 6], 3, "books"),
        "d": ([7], 1, "wiki"),
    }
    # ledger: redelivery of the same batch id is a metadata no-op
    v = t.version
    res2 = t.merge_apply(_chg(spark, [
        ("a", [0], 1, "x", "U", "lsn-002")]), batch_id="b1")
    assert res2["skipped"] and t.version == v


def test_mor_lsn_fence_stale_delta_loses(spark, tmp_work):
    t = _mk(spark, os.path.join(tmp_work, "t"), BASE, merge_mode="mor")
    t.merge_apply(_chg(spark, [("a", [9], 1, "new", "U", "lsn-005")]))
    # late event older than the stored winner: the fold must ignore it
    t.merge_apply(_chg(spark, [("a", [0], 1, "old", "U", "lsn-001")]))
    assert _state(t)["a"] == ([9], 1, "new")


def test_mor_compact_folds_chain_and_purges(spark, tmp_work):
    t = _mk(spark, os.path.join(tmp_work, "t"), BASE, merge_mode="mor")
    t.merge_apply(_chg(spark, [("a", [9], 1, "v1", "U", "lsn-002")]))
    t.merge_apply(_chg(spark, [("a", [9, 9], 2, "v2", "U", "lsn-003")]))
    t.merge_apply(_chg(spark, [("b", None, None, None, "D", "lsn-004")]))
    before = _state(t)
    t.compact()
    assert not any(t.snap["deltas"].values())
    assert _state(t) == before
    # tombstones physically gone after the fold
    raw = t.read_raw()
    assert raw.where(F.col("_deleted")).count() == 0
    # delta files no longer referenced -> expire removes them from disk
    t.expire_snapshots(keep_last=1)
    on_disk = {f for f in os.listdir(t.data_dir) if f.endswith(".parquet")}
    assert not any(f.startswith("d") for f in on_disk)
    assert _state(t) == before


def test_mor_then_cow_interleave(spark, tmp_work):
    """LWW-by-LSN is associative: winners resolve correctly no matter which
    commit path (delta vs rewrite) carried each version."""
    t = _mk(spark, os.path.join(tmp_work, "t"), BASE, merge_mode="mor")
    t.merge_apply(_chg(spark, [("a", [9], 1, "mor1", "U", "lsn-002")]))
    # CoW override rewrites base files while the delta still holds lsn-002
    t.merge_apply(_chg(spark, [("a", [8], 1, "cow", "U", "lsn-003")]),
                  mode="cow")
    assert _state(t)["a"] == ([8], 1, "cow")
    # newer delta on top of the CoW row
    t.merge_apply(_chg(spark, [("a", [7], 1, "mor2", "U", "lsn-004")]))
    assert _state(t)["a"] == ([7], 1, "mor2")
    # and a STALE CoW write cannot shadow the newer delta winner
    t.merge_apply(_chg(spark, [("a", [6], 1, "stale", "U", "lsn-001")]),
                  mode="cow")
    assert _state(t)["a"] == ([7], 1, "mor2")


def test_auto_mode_picks_by_amplification(spark, tmp_work):
    # 4000 base rows in 4 buckets; a 2-row batch would rewrite ~1000-row
    # files (amplification >> 16) -> delta; a 3000-row batch covering most
    # keys (amplification ~ 1) -> copy-on-write.
    rows = [(f"k{i:05d}", [i], 1, "s") for i in range(4000)]
    t = _mk(spark, os.path.join(tmp_work, "t"), rows, merge_mode="auto")
    small = t.merge_apply(_chg(spark, [
        ("k00001", [1, 1], 2, "s", "U", "lsn-2"),
        ("k03999", [2, 2], 2, "s", "U", "lsn-3"),
    ]))
    assert small["mode"] == "mor"
    big = t.merge_apply(_chg(spark, [
        (f"k{i:05d}", [i, i], 2, "big", "U", f"lsn-9{i:05d}")
        for i in range(2, 3000)
    ]))
    assert big["mode"] == "cow"
    got = _state(t)
    assert got["k00001"] == ([1, 1], 2, "s")  # delta survived the CoW pass
    assert got["k02999"] == ([2999, 2999], 2, "big")
    assert got["k03999"] == ([2, 2], 2, "s")
    assert got["k00000"] == ([0], 1, "s")
    assert len(got) == 4000


def test_mor_metadata_only_ddl_interplay(spark, tmp_work):
    """ADD COLUMN between delta commits: older delta files lack the new
    physical column and must read as NULL (name-mapped evolution holds on
    the delta path exactly as on base files)."""
    t = _mk(spark, os.path.join(tmp_work, "t"), BASE, merge_mode="mor")
    t.merge_apply(_chg(spark, [("a", [9], 1, "v1", "U", "lsn-002")]))
    t.alter_add_column("lang", T.StringType())
    sch = T.StructType(SCHEMA.fields + [
        T.StructField("lang", T.StringType()),
        T.StructField("op", T.StringType()),
        T.StructField("lsn", T.StringType()),
    ])
    t.merge_apply(spark.createDataFrame(
        [("b", [5], 1, "web", "en", "U", "lsn-003")], sch))
    got = {r["doc_id"]: r for r in t.read().collect()}
    assert got["a"]["lang"] is None and got["a"]["tokens"] == [9]
    assert got["b"]["lang"] == "en" and got["b"]["tokens"] == [5]


def test_maintain_folds_long_delta_chains(spark, tmp_work):
    t = _mk(spark, os.path.join(tmp_work, "t"), BASE, merge_mode="mor")
    for i in range(6):
        t.merge_apply(_chg(spark, [
            ("a", [i], 1, f"v{i}", "U", f"lsn-{i + 2:03d}")]))
    before = _state(t)
    # arm maintenance (watermark set by merge max-lsn observation)
    assert t.snap["watermark_lsn"]
    res = t.maintain(max_files_per_bucket=8)
    assert not res["skipped"]
    assert not any(t.snap.get("deltas", {}).values())
    assert _state(t) == before
