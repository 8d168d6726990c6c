"""Bucket-count evolution: ``LakeTable.rebucket`` — the Iceberg
partition-spec change (bucket(N, key) → bucket(M, key)) + rewrite_data_files
as one atomic snapshot swap.

A table sized at creation cannot follow 100× data growth: buckets blow past
the target file size, CoW commits rewrite huge files, lookups scan huge
buckets. ``rebucket`` widens the spec online (readers resolve the old
snapshot until the pointer swap) while preserving every merge semantics —
tombstone LSN fences, delta folds, type-evolution chains, the batch ledger.
"""

import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from canal_spark.table.lake import LakeTable, bucket_expr

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
    ("d", [7, 8], 2, "wiki"),
    ("e", [9], 1, "code"),
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


def test_rebucket_state_invariant_and_files_under_new_spec(spark, tmp_work):
    t = _mk(spark, os.path.join(tmp_work, "t"), BASE)
    before = _state(t)
    res = t.rebucket(16)
    assert not res["skipped"] and t.n_buckets == 16
    assert _state(t) == before
    # every file sits in the bucket the NEW spec assigns its keys to:
    # scanning any one manifest bucket returns only keys hashing there
    for b, names in t.snap["files"].items():
        got = t.read_raw(buckets=[int(b)]).select(
            "doc_id", bucket_expr("doc_id", 16).alias("_chk")).collect()
        assert all(r["_chk"] == int(b) for r in got)


def test_rebucket_keeps_tombstone_lsn_fence(spark, tmp_work):
    t = _mk(spark, os.path.join(tmp_work, "t"), BASE)
    t.merge_apply(_chg(spark, [
        ("b", None, None, None, "D", "lsn-005"),
        ("a", [9, 9], 2, "code", "U", "lsn-006"),
    ]), batch_id="b1")
    t.rebucket(16)
    # stale duplicates (lower LSN) arriving AFTER the rebucket must still
    # lose: the tombstone and the updated row's fence crossed the rewrite
    t.merge_apply(_chg(spark, [
        ("b", [3], 1, "web", "U", "lsn-001"),     # deleted key: stays dead
        ("a", [1, 2], 2, "web", "U", "lsn-001"),  # updated key: no regression
    ]), batch_id="b2")
    got = _state(t)
    assert "b" not in got
    assert got["a"] == ([9, 9], 2, "code")
    # ledger survived the swap: redelivering b1 is a no-op
    v = t.version
    assert t.merge_apply(_chg(spark, [
        ("b", None, None, None, "D", "lsn-005"),
    ]), batch_id="b1")["skipped"] and t.version == v


def test_rebucket_folds_mor_deltas(spark, tmp_work):
    t = _mk(spark, os.path.join(tmp_work, "t"), BASE, merge_mode="mor")
    t.merge_apply(_chg(spark, [
        ("a", [7], 1, "code", "U", "lsn-002"),
        ("f", [1, 1], 2, "web", "U", "lsn-003"),
    ]), batch_id="m1")
    assert any(t.snap["deltas"].values())
    before = _state(t)
    t.rebucket(8)
    assert t.snap["deltas"] == {} and _state(t) == before
    # post-rebucket MoR commits land under the new spec
    t.merge_apply(_chg(spark, [("g", [2], 1, "web", "U", "lsn-004")]),
                  batch_id="m2")
    assert _state(t)["g"] == ([2], 1, "web")


def test_rebucket_materializes_type_evolution_chain(spark, tmp_work):
    t = _mk(spark, os.path.join(tmp_work, "t"), BASE)
    t.alter_modify_column("n_tok", T.LongType())
    assert any(c.get("prev") for c in t.snap["columns"])
    before = _state(t)
    t.rebucket(16)
    # the read-time coalesce chain is gone — data files carry the live type
    assert not any(c.get("prev") for c in t.snap["columns"])
    assert _state(t) == before
    assert dict(t.read().dtypes)["n_tok"] == "bigint"


def test_rebucket_merge_and_lookup_after_swap(spark, tmp_work):
    t = _mk(spark, os.path.join(tmp_work, "t"), BASE)
    t.rebucket(16)
    t.merge_apply(_chg(spark, [
        ("c", [5], 1, "books", "U", "lsn-010"),
        ("z", [6, 6], 2, "web", "U", "lsn-011"),
    ]), batch_id="b1")
    got = {r["doc_id"]: r for r in t.lookup(["c", "z", "nope"]).collect()}
    assert set(got) == {"c", "z"}
    assert list(got["c"]["tokens"]) == [5]
    # downscaling works the same way (consolidation after mass deletes)
    t.rebucket(2)
    assert t.n_buckets == 2 and _state(t)["z"] == ([6, 6], 2, "web")


def test_maintain_auto_rebucket_is_incremental(spark, tmp_work):
    rows = [(f"k{i:04d}", [i], 1, "web") for i in range(200)]
    t = _mk(spark, os.path.join(tmp_work, "t"), rows)
    # give maintain a watermark so it is not a guard no-op
    t.merge_apply(_chg(spark, [("k0000", [0], 1, "web", "U", "lsn-001")]),
                  batch_id="w1")
    # 200 rows / 20 target = 10 buckets → ×4 cap from 4 → target spec 16,
    # migrated 2 old buckets per maintenance pass: done on the 2nd pass
    r1 = t.maintain(target_rows_per_bucket=20)
    assert r1["rebucketed_to"] is None and r1["migration_remaining"] == 2
    assert t.n_buckets == 4 and t.next_n_buckets == 16
    assert len(_state(t)) == 200          # mixed-spec read is exact
    r2 = t.maintain(target_rows_per_bucket=20)
    assert r2["rebucketed_to"] == 16 and t.n_buckets == 16
    assert t.next_n_buckets is None
    assert len(_state(t)) == 200
    # already wide enough: next pass starts nothing
    r3 = t.maintain(target_rows_per_bucket=20)
    assert r3["rebucketed_to"] is None and r3["migration_remaining"] == 0


def test_incremental_migration_with_live_merges(spark, tmp_work):
    """Merges keep landing BETWEEN migration steps; every intermediate
    read, lookup and the final state must be exact under the mixed spec."""
    rows = [(f"k{i:03d}", [i], 1, "web") for i in range(60)]
    expected = {d: (list(tk), n, s) for d, tk, n, s in rows}
    t = _mk(spark, os.path.join(tmp_work, "t"), rows)   # 4 buckets
    t.rebucket_start(16)
    lsn = 100
    step_sizes = []
    done = False
    i = 0
    while not done:
        st = t.rebucket_step(1)
        step_sizes.append(len(st["migrated"]))
        done = st["done"]
        # a merge between every step: update one key, insert one, delete one
        up, new, dead = f"k{i:03d}", f"n{i:03d}", f"k{i + 30:03d}"
        t.merge_apply(_chg(spark, [
            (up, [99, i], 2, "code", "U", f"lsn-{lsn:04d}"),
            (new, [i], 1, "wiki", "U", f"lsn-{lsn + 1:04d}"),
            (dead, None, None, None, "D", f"lsn-{lsn + 2:04d}"),
        ]), batch_id=f"mb{i}")
        expected[up] = ([99, i], 2, "code")
        expected[new] = ([i], 1, "wiki")
        expected.pop(dead, None)
        lsn += 10
        assert _state(t) == expected    # mixed-spec read exact mid-flight
        got = {r["doc_id"] for r in t.lookup([up, new, dead]).collect()}
        assert got == {up, new}         # routed point lookup mid-flight
        i += 1
    assert all(s <= 1 for s in step_sizes) and sum(step_sizes) == 4
    assert t.n_buckets == 16 and t.next_n_buckets is None
    assert _state(t) == expected


def test_incremental_migration_fence_and_resume_from_manifest(spark, tmp_work):
    t = _mk(spark, os.path.join(tmp_work, "t"), BASE)
    t.merge_apply(_chg(spark, [("b", None, None, None, "D", "lsn-050")]),
                  batch_id="d1")
    t.rebucket_start(8)
    t.rebucket_step(1)
    # crash/resume: a fresh handle reads the mixed-spec manifest and
    # continues the migration where it stopped
    t2 = LakeTable(spark, t.path)
    assert t2.next_n_buckets == 8 and len(t2.snap["migrated"]) == 1
    while not t2.rebucket_step(2)["done"]:
        pass
    assert t2.n_buckets == 8
    # the tombstone's LSN fence crossed the migration: stale update loses
    t2.merge_apply(_chg(spark, [("b", [3], 1, "web", "U", "lsn-001")]),
                   batch_id="d2")
    assert "b" not in _state(t2)


def test_rebucket_start_validates_multiple(spark, tmp_work):
    import pytest

    t = _mk(spark, os.path.join(tmp_work, "t"), BASE)
    with pytest.raises(ValueError):
        t.rebucket_start(6)             # 4 ∤ 6
    t.rebucket_start(8)
    with pytest.raises(ValueError):
        t.rebucket_start(16)            # already in progress
    # one-shot rebucket subsumes the active migration
    t.rebucket(16)
    assert t.n_buckets == 16 and t.next_n_buckets is None
    assert len(_state(t)) == len(BASE)
