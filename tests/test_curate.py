"""Index-driven dedup sweep: curation decisions applied back to the lake
table through the CDC net-change contract, views kept consistent."""

import json
import os

import pyarrow as pa
from pyspark.sql import functions as F
from pyspark.sql import types as T

from canal_spark.curate import dedup_sweep
from canal_spark.fixtures import CdcLogSpec, generate_base_table, generate_cdc_log
from canal_spark.oracle import oracle_final_state, oracle_pack_state
from canal_spark.pipeline import replay
from canal_spark.table.lake import LakeTable
from canal_spark.views import PackIndexView, fingerprint_index_view, pack_index_frame

TOKSEQ_SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType()),
    T.StructField("tokens", T.ArrayType(T.IntegerType())),
    T.StructField("n_tok", T.IntegerType()),
    T.StructField("source", T.StringType()),
])
INDEX_SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType()),
    T.StructField("fp_md5", T.StringType()),
    T.StructField("n_tok", T.IntegerType()),
    T.StructField("source", T.StringType()),
])
PACK_SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType()),
    T.StructField("shard", T.StringType()),
    T.StructField("n_tok", T.LongType()),
    T.StructField("local_off", T.LongType()),
    T.StructField("pack_first", T.LongType()),
    T.StructField("pack_last", T.LongType()),
])
SEQ, K = 64, 6


def _dup_base(n=200, seed=71, n_dups=40):
    """Base table with engineered exact duplicates: every 5th doc is
    mirrored under a 'dup...' key with the identical token array."""
    base = generate_base_table(n, seed=seed)
    rows = base.to_pylist()
    for i, r in enumerate(rows[:n_dups * 5:5]):
        rows.append({**r, "doc_id": f"dup{i:09d}"})
    return pa.Table.from_pylist(rows, schema=base.schema).sort_by("doc_id")


def _python_sweep(state):
    """Independent expected sweep: among live docs with equal token arrays,
    keep the min doc_id; docs with NULL tokens are untouchable."""
    groups = {}
    for doc_id, row in state.items():
        toks = row.get("tokens")
        if toks is None:
            continue
        groups.setdefault(json.dumps(list(toks)), []).append(doc_id)
    out = dict(state)
    for ids in groups.values():
        for victim in sorted(ids)[1:]:
            del out[victim]
    return out


def _setup(spark, tmp_work, spec):
    base = _dup_base(seed=spec.seed)
    log_dir = os.path.join(tmp_work, "log")
    generate_cdc_log(log_dir, spec, base)
    bdf = spark.createDataFrame(base.to_pandas(), TOKSEQ_SCHEMA)
    table = LakeTable.create(spark, os.path.join(tmp_work, "tokseq"),
                             TOKSEQ_SCHEMA, n_buckets=8, df=bdf)
    fp_vt = LakeTable.create(
        spark, os.path.join(tmp_work, "fp_idx"), INDEX_SCHEMA, n_buckets=8,
        df=bdf.select("doc_id", F.md5(F.to_json("tokens")).alias("fp_md5"),
                      "n_tok", "source"))
    pk_vt = LakeTable.create(
        spark, os.path.join(tmp_work, "pack_idx"), PACK_SCHEMA, n_buckets=8,
        df=pack_index_frame(bdf.select("doc_id", "n_tok"), SEQ, shard_chars=K))
    views = [fingerprint_index_view(fp_vt), PackIndexView(pk_vt, SEQ, shard_chars=K)]
    return base, log_dir, table, fp_vt, pk_vt, views


def _main_state(table):
    out = {}
    for r in table.refresh().read().collect():
        d = r.asDict(recursive=True)
        if isinstance(d.get("tokens"), list):
            d["tokens"] = tuple(d["tokens"])
        out[d["doc_id"]] = d
    return out


def test_dedup_sweep_applies_index_decisions(spark, tmp_work):
    spec = CdcLogSpec(n_events=1500, seed=71, events_per_file=500,
                      pk_change_frac=0.02)
    base, log_dir, table, fp_vt, pk_vt, views = _setup(spark, tmp_work, spec)
    replay(spark, log_dir, table, batch_id="b0", views=views)
    expected_pre, cols = oracle_final_state(base, log_dir)
    expected = _python_sweep(expected_pre)
    assert len(expected) < len(expected_pre)  # the dups actually existed

    dedup_sweep(table.refresh(), fp_vt, views=views, batch_id="sweep1")

    got = _main_state(table)
    assert set(got) == set(expected)
    for k, exp in expected.items():
        toks = exp.get("tokens")
        assert got[k]["tokens"] == (tuple(toks) if toks is not None else None)

    # the fingerprint index dropped the victims with the same deletes
    idx_ids = {r["doc_id"] for r in fp_vt.refresh().read().collect()}
    assert idx_ids == set(expected)
    # and every surviving fp group is now unique
    fp_live = [r["fp_md5"] for r in fp_vt.refresh().read()
               .where(F.col("fp_md5").isNotNull()).collect()]
    assert len(fp_live) == len(set(fp_live))

    # the pack index re-packed the victims' shards consistently
    exp_pack = oracle_pack_state(expected, K, SEQ)
    got_pack = {r["doc_id"]: {c: r[c] for c in
                              ["doc_id", "shard", "n_tok", "local_off",
                               "pack_first", "pack_last"]}
                for r in pk_vt.refresh().read().collect()}
    assert got_pack == exp_pack

    # re-sweep is a no-op (victims already tombstoned)
    dedup_sweep(table.refresh(), fp_vt, views=views, batch_id="sweep2")
    assert _main_state(table) == got

    # a LATER real CDC event re-inserting a victim must beat the '~s' fence
    victim = sorted(set(expected_pre) - set(expected))[0]
    from canal_spark.lsn import encode_lsn_py
    fresh_lsn = encode_lsn_py(10**9, "mysql-bin.000099", 4)
    up = spark.createDataFrame(
        [(victim, [1, 2, 3], 3, "web", "U", fresh_lsn)],
        "doc_id string, tokens array<int>, n_tok int, source string, "
        "op string, lsn string")
    table.refresh().merge_apply(up, batch_id="resurrect")
    assert _main_state(table)[victim]["tokens"] == (1, 2, 3)


BAND_INDEX_SCHEMA = T.StructType([
    T.StructField("band_key", T.StringType()),
    T.StructField("doc_id", T.StringType()),
    T.StructField("band", T.IntegerType()),
    T.StructField("bucket", T.LongType()),
])
N_BANDS = 8


def test_near_dedup_sweep(spark, tmp_work):
    """Near-dup sweep: candidates from the maintained band index, verified
    over candidates only, greater key of each verified pair deleted. The
    expected victim set comes from DuckDB running the md5-portable LSH pair
    SQL over the folded corpus — independent of every Spark kernel."""
    import duckdb
    import pyarrow.parquet as pq

    from canal_spark.curate import near_dedup_sweep
    from canal_spark.functions.dedup import banded_signatures, minhash_lsh_pairs_sql
    from canal_spark.views import MinhashBandIndexView

    base = generate_base_table(150, seed=73)
    rows = base.to_pylist()
    # exact dups + near dups (two extra tokens appended — high Jaccard)
    for i, r in enumerate(rows[::6]):
        rows.append({**r, "doc_id": f"dup{i:06d}"})
    for i, r in enumerate(rows[2::6]):
        toks = list(r["tokens"]) + [7, 9]
        rows.append({**r, "doc_id": f"near{i:06d}", "tokens": toks,
                     "n_tok": len(toks)})
    base = pa.Table.from_pylist(rows, schema=base.schema).sort_by("doc_id")
    log_dir = os.path.join(tmp_work, "log")
    generate_cdc_log(log_dir, CdcLogSpec(n_events=1200, seed=73,
                                         events_per_file=400), base)
    bdf = spark.createDataFrame(base.to_pandas(), TOKSEQ_SCHEMA)
    table = LakeTable.create(spark, os.path.join(tmp_work, "tokseq"),
                             TOKSEQ_SCHEMA, n_buckets=8, df=bdf)
    bb = banded_signatures(
        bdf.select("doc_id", F.array_join("tokens", " ").alias("_txt")),
        id_col="doc_id", text_col="_txt", bands=N_BANDS,
    ).select(F.col("id").alias("doc_id"), "band", "bucket")
    seed_idx = (
        bdf.select("doc_id", F.explode(
            F.sequence(F.lit(0), F.lit(N_BANDS - 1))).alias("band"))
        .join(bb, on=["doc_id", "band"], how="left")
        .select(F.concat_ws("#", "doc_id", "band").alias("band_key"),
                "doc_id", F.col("band").cast("int"), F.col("bucket").cast("long"))
    )
    vt = LakeTable.create(spark, os.path.join(tmp_work, "band_idx"),
                          BAND_INDEX_SCHEMA, key_col="band_key", n_buckets=8,
                          df=seed_idx)
    view = MinhashBandIndexView(vt, bands=N_BANDS)
    replay(spark, log_dir, table, batch_id="b0", views=[view])

    near_dedup_sweep(table.refresh(), view, threshold_bp=8000,
                     views=[view], batch_id="ns1")

    # independent expected victims: DuckDB LSH pairs over the folded corpus
    state, _cols = oracle_final_state(base, log_dir)
    p_txt = os.path.join(tmp_work, "corpus.parquet")
    srt = sorted(state.values(), key=lambda r: r["doc_id"])
    pq.write_table(pa.table({
        "doc_id": [r["doc_id"] for r in srt],
        "text": [" ".join(map(str, r["tokens"])) if r.get("tokens") else None
                 for r in srt],
    }), p_txt)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW corpus AS SELECT * FROM read_parquet('{p_txt}') "
                "WHERE text IS NOT NULL")
    pairs_sql = minhash_lsh_pairs_sql(n=3, num_hashes=64, bands=N_BANDS,
                                      threshold_bp=8000, table="corpus")
    victims = {r[0] for r in
               con.execute(f"SELECT DISTINCT id_b FROM ({pairs_sql})").fetchall()}
    assert victims, "fixture produced no near-dup victims"
    expected_ids = set(state) - victims

    got_ids = {r["doc_id"] for r in table.refresh().read().collect()}
    assert got_ids == expected_ids
    # the band index dropped the victims' rows in the same pass
    idx_docs = {r["doc_id"] for r in vt.refresh().read().collect()}
    assert idx_docs == expected_ids
    # no verified pair survives -> re-sweep is a no-op
    near_dedup_sweep(table.refresh(), view, threshold_bp=8000,
                     views=[view], batch_id="ns2")
    assert {r["doc_id"] for r in table.refresh().read().collect()} == got_ids


def test_cluster_dedup_sweep_one_survivor_per_component(spark, tmp_work):
    """Transitive sweep: connected components over the verified pairs —
    exactly one survivor (min key) per cluster, vs an independent DuckDB
    recursive-closure twin. A triple of mutual near-dups (a~b, a~c, b~c)
    must shrink to one row, where pairwise victim-picking could keep two."""
    import duckdb
    import pyarrow.parquet as pq

    from canal_spark.curate import cluster_dedup_sweep
    from canal_spark.functions.dedup import banded_signatures, minhash_lsh_pairs_sql
    from canal_spark.views import MinhashBandIndexView

    base = generate_base_table(120, seed=91)
    rows = base.to_pylist()
    # clusters of size 3: two exact copies of every 8th doc
    for i, r in enumerate(rows[::8]):
        rows.append({**r, "doc_id": f"cpy{i:06d}a"})
        rows.append({**r, "doc_id": f"cpy{i:06d}b"})
    base = pa.Table.from_pylist(rows, schema=base.schema).sort_by("doc_id")
    log_dir = os.path.join(tmp_work, "log")
    generate_cdc_log(log_dir, CdcLogSpec(n_events=900, seed=91,
                                         events_per_file=300), base)
    bdf = spark.createDataFrame(base.to_pandas(), TOKSEQ_SCHEMA)
    table = LakeTable.create(spark, os.path.join(tmp_work, "tokseq"),
                             TOKSEQ_SCHEMA, n_buckets=8, df=bdf)
    bb = banded_signatures(
        bdf.select("doc_id", F.array_join("tokens", " ").alias("_txt")),
        id_col="doc_id", text_col="_txt", bands=N_BANDS,
    ).select(F.col("id").alias("doc_id"), "band", "bucket")
    seed_idx = (
        bdf.select("doc_id", F.explode(
            F.sequence(F.lit(0), F.lit(N_BANDS - 1))).alias("band"))
        .join(bb, on=["doc_id", "band"], how="left")
        .select(F.concat_ws("#", "doc_id", "band").alias("band_key"),
                "doc_id", F.col("band").cast("int"), F.col("bucket").cast("long"))
    )
    vt = LakeTable.create(spark, os.path.join(tmp_work, "band_idx"),
                          BAND_INDEX_SCHEMA, key_col="band_key", n_buckets=8,
                          df=seed_idx)
    view = MinhashBandIndexView(vt, bands=N_BANDS)
    replay(spark, log_dir, table, batch_id="b0", views=[view])

    cluster_dedup_sweep(table.refresh(), view, threshold_bp=8000,
                        views=[view], batch_id="cs1")

    state, _cols = oracle_final_state(base, log_dir)
    p_txt = os.path.join(tmp_work, "corpus.parquet")
    srt = sorted(state.values(), key=lambda r: r["doc_id"])
    pq.write_table(pa.table({
        "doc_id": [r["doc_id"] for r in srt],
        "text": [" ".join(map(str, r["tokens"])) if r.get("tokens") else None
                 for r in srt],
    }), p_txt)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW corpus AS SELECT * FROM read_parquet('{p_txt}') "
                "WHERE text IS NOT NULL")
    pairs_sql = minhash_lsh_pairs_sql(n=3, num_hashes=64, bands=N_BANDS,
                                      threshold_bp=8000, table="corpus")
    victims = {r[0] for r in con.execute(f"""
        WITH RECURSIVE p AS ({pairs_sql}),
        e AS (SELECT id_a AS s, id_b AS d FROM p
              UNION SELECT id_b, id_a FROM p),
        reach(id, r) AS (SELECT s, s FROM e
                         UNION SELECT e.s, reach.r FROM e
                               JOIN reach ON e.d = reach.id)
        SELECT id FROM (SELECT id, MIN(r) AS lbl FROM reach GROUP BY id)
        WHERE id <> lbl""").fetchall()}
    assert victims, "fixture produced no duplicate clusters"
    got_ids = {r["doc_id"] for r in table.refresh().read().collect()}
    assert got_ids == set(state) - victims
    # re-sweep is a ledgered no-op
    v = table.refresh().version
    cluster_dedup_sweep(table.refresh(), view, threshold_bp=8000,
                        views=[view], batch_id="cs1")
    assert table.refresh().version == v
