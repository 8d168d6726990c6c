"""Similarity search over embedding columns (array<float>).

- ``cosine_topk``: brute-force exact top-k — the baseline. Dot products via
  JVM higher-order functions (zip_with + aggregate in double precision);
  a crossJoin bounded by the (small) query side, ranked per query.
- ``lsh_bucketed_topk``: the scale path — random-hyperplane LSH buckets
  (sign bits of n_planes deterministic projections) so candidates join only
  within buckets; exact cosine re-rank inside. At 100 TB the bucket join
  replaces the n² crossJoin; recall is tunable via n_planes/n_tables.
- ``embedding_near_pairs``: near-duplicate pairs by cosine ≥ τ — LSH-bucketed
  by DEFAULT (the exact n² crossJoin survives only behind ``use_lsh=False``
  for small verification runs; round 1 shipped it backwards).

The hyperplanes are INTEGER weight matrices derived driver-side from md5
(hashing.plane_weights) and embedded as literals in both the Spark plan and
the DuckDB oracle; vectors are fixed-pointed to e6 ints first, so the
projection sign is EXACT integer arithmetic — no float-summation-order
hazard between engines, and far cheaper than round 1's per-component
xxhash64 weights. Each operator has a ``*_sql`` DuckDB twin.

No numpy/pandas in the hot path; the folds run in whole-stage codegen.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from canal_spark.functions import hashing

DIM = 64  # embeddings.parquet vector width (TESTDATA.md)


def dot(a, b) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a, b) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(emb: DataFrame, queries: DataFrame, k: int = 5,
                id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    ``queries``: (id_col, vec_col) — usually a handful of rows, so Spark
    broadcasts it and the scan over ``emb`` stays embarrassingly parallel
    (one pass, no shuffle until the tiny per-query top-k)."""
    q = queries.select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec")
    )
    c = emb.select(
        F.col(id_col).alias("n_id"), F.col(vec_col).alias("n_vec")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("n_id") != F.col("q_id"))
        .withColumn("sim", cosine("q_vec", "n_vec"))
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("sim").desc(), F.col("n_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "q_id", "n_id", F.col("rank").cast("long").alias("rank"),
            F.floor(F.col("sim") * 1000).cast("long").alias("sim_e3"),
        )
    )


# ------------------------------------------------------------------ LSH

def hyperplane_buckets_udf(n_planes: int, n_tables: int):
    """Arrow-batched bucket kernel: embedding → array of n_tables bucket
    ids, ONE int64 matrix multiply per batch per table.

    Why a pandas UDF here and nowhere else: the pure-expression version
    (`aggregate(zip_with(e6, weights, *))` per plane) is a NESTED
    higher-order function — Catalyst evaluates it interpreted (PERF.md
    finding 3), ~100 s for 500×40 projections; dense linear algebra
    belongs in BLAS. The arithmetic is EXACT int64 (|proj| < dim·10⁶·5·10⁵
    ≈ 2⁴⁵, and float64·10⁶+floor is deterministic IEEE), so the DuckDB
    oracle twin (hyperplane_bucket_sql) still matches bit-for-bit. The
    weight matrix is derived (md5, deterministic) from the OBSERVED vector
    dimension on the executor, so any dim works without configuration."""
    from pyspark.sql.functions import pandas_udf

    shifts = 1 << np.arange(n_planes, dtype=np.int64)
    w_cache: dict[int, np.ndarray] = {}

    def weights(d: int) -> np.ndarray:
        if d not in w_cache:
            w_cache[d] = np.array(
                [hashing.plane_weights(n_planes, d, t) for t in range(n_tables)],
                dtype=np.int64,
            )  # (T, P, d)
        return w_cache[d]

    @pandas_udf("array<long>")
    def buckets(col: pd.Series) -> pd.Series:
        if col.empty:
            return pd.Series([], dtype=object)
        M = np.stack(col.to_numpy())                       # (n, d)
        e6 = np.floor(M.astype(np.float64) * 1_000_000).astype(np.int64)
        W = weights(M.shape[1])
        out = np.empty((len(col), n_tables), dtype=np.int64)
        for t in range(n_tables):
            proj = e6 @ W[t].T                             # (n, P) exact
            out[:, t] = ((proj > 0) * shifts).sum(axis=1)
        return pd.Series(list(out))

    return buckets


E6_SQL = ("list_transform({vec}, "
          "x -> CAST(FLOOR(x::DOUBLE * 1000000) AS BIGINT))")


def hyperplane_bucket_sql(e6_expr: str, n_planes: int = 10, table: int = 0,
                          dim: int = DIM) -> str:
    """DuckDB twin of ``hyperplane_bucket`` over an ALREADY fixed-pointed
    e6 vector (compute ``E6_SQL`` once in a CTE — inlining it per plane made
    the oracle 15× slower). list_dot_product of BIGINT lists is exact below
    2⁵³ (our bound: 2⁴⁵)."""
    planes = hashing.plane_weights(n_planes, dim, table)
    bits = " + ".join(
        f"(CASE WHEN list_dot_product({e6_expr}, "
        f"{[int(c) for c in w]}::BIGINT[]) > 0 "
        f"THEN {1 << p}::BIGINT ELSE 0 END)"
        for p, w in enumerate(planes)
    )
    return f"({bits})"


def lsh_bucketed_topk(emb: DataFrame, queries: DataFrame, k: int = 5,
                      id_col: str = "vec_id", vec_col: str = "embedding",
                      n_planes: int = 10, n_tables: int = 4) -> DataFrame:
    """Approximate top-k: candidates share an LSH bucket in ≥1 of
    ``n_tables`` hash tables; exact cosine re-rank within candidates.
    Shuffle is linear in |emb| × n_tables (bucket-partitioned join), never
    |emb| × |queries|."""
    bud = hyperplane_buckets_udf(n_planes, n_tables)

    def bucketed(df, side):
        # one UDF pass computes every table's bucket; posexplode replaces
        # round 1's n_tables-way union (n_tables scans of the input)
        return df.select(
            F.col(id_col).alias(f"{side}_id"),
            F.col(vec_col).alias(f"{side}_vec"),
            F.posexplode(bud(F.col(vec_col))).alias("_t", "_b"),
        ).select(
            f"{side}_id", f"{side}_vec",
            F.concat_ws(":", F.col("_t"), F.col("_b")).alias("bucket"),
        )

    qb = bucketed(queries, "q")
    cb = bucketed(emb, "n")
    cand = (
        cb.join(F.broadcast(qb), "bucket")
        .where(F.col("n_id") != F.col("q_id"))
        .select("q_id", "q_vec", "n_id", "n_vec")
        .distinct()
    )
    w = Window.partitionBy("q_id").orderBy(F.col("sim").desc(), F.col("n_id"))
    return (
        cand.withColumn("sim", cosine("q_vec", "n_vec"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "n_id", F.col("rank").cast("long").alias("rank"),
                F.floor(F.col("sim") * 1000).cast("long").alias("sim_e3"))
    )


def lsh_bucketed_topk_sql(k: int = 5, n_planes: int = 10, n_tables: int = 4,
                          query_pred: str = "vec_id < 8",
                          table: str = "embeddings") -> str:
    def bucket_union(src: str) -> str:
        return " UNION ALL ".join(
            f"SELECT vec_id, "
            f"({t} || ':' || {hyperplane_bucket_sql('e6', n_planes, t)})"
            f" AS bucket FROM {src}"
            for t in range(n_tables)
        )

    cos = ("list_dot_product(q.v, c.v) / (sqrt(list_dot_product(q.v, q.v))"
           " * sqrt(list_dot_product(c.v, c.v)))")
    e6 = E6_SQL.format(vec="embedding")
    return f"""
        WITH base AS (SELECT vec_id, {e6} AS e6 FROM {table}),
        qbase AS (SELECT * FROM base WHERE vec_id IN
                  (SELECT vec_id FROM {table} WHERE {query_pred})),
        qb AS ({bucket_union('qbase')}),
        cb AS ({bucket_union('base')}),
        cand AS (
            SELECT DISTINCT q.vec_id AS q_id, c.vec_id AS n_id
            FROM cb c JOIN qb q ON c.bucket = q.bucket
            WHERE c.vec_id <> q.vec_id
        ),
        scored AS (
            SELECT cand.q_id, cand.n_id, {cos} AS sim
            FROM cand
            JOIN (SELECT vec_id, embedding::DOUBLE[] AS v FROM {table}) q
              ON q.vec_id = cand.q_id
            JOIN (SELECT vec_id, embedding::DOUBLE[] AS v FROM {table}) c
              ON c.vec_id = cand.n_id
        )
        SELECT q_id, n_id, CAST(rank AS BIGINT) AS rank,
               CAST(FLOOR(sim * 1000) AS BIGINT) AS sim_e3
        FROM (
            SELECT q_id, n_id, sim,
                   ROW_NUMBER() OVER (PARTITION BY q_id
                                      ORDER BY sim DESC, n_id ASC) AS rank
            FROM scored
        ) WHERE rank <= {k}
    """


def embedding_near_pairs(emb: DataFrame, threshold_e3: int = 990,
                         id_col: str = "vec_id",
                         vec_col: str = "embedding",
                         use_lsh: bool = True,
                         n_planes: int = 8) -> DataFrame:
    """Near-duplicate vector pairs with cosine·1000 ≥ threshold.

    Default (``use_lsh=True``) joins only within hyperplane buckets — the
    shuffle is linear in |emb|, the join quadratic only per bucket (≈n²/2ᵖ).
    ``use_lsh=False`` is the exact n² crossJoin, ONLY for small verification
    runs — at 100 TB it is 10¹⁸ pairs and must never be the default."""
    a = emb.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    if use_lsh:
        bud = hyperplane_buckets_udf(n_planes, n_tables=1)
        a = a.withColumn("bucket", bud(F.col("va")).getItem(0))
        b = b.withColumn("bucket", bud(F.col("vb")).getItem(0))
        pairs = a.join(b, "bucket").where(F.col("id_a") < F.col("id_b"))
    else:
        pairs = a.crossJoin(b).where(F.col("id_a") < F.col("id_b"))
    return (
        pairs.withColumn(
            "sim_e3", F.floor(cosine("va", "vb") * 1000).cast("long")
        )
        .where(F.col("sim_e3") >= threshold_e3)
        .select("id_a", "id_b", "sim_e3")
    )


def embedding_near_pairs_sql(threshold_e3: int = 990, use_lsh: bool = True,
                             n_planes: int = 8,
                             table: str = "embeddings") -> str:
    bucket = hyperplane_bucket_sql("e6", n_planes, 0)
    e6 = E6_SQL.format(vec="embedding")
    src = (f"SELECT vec_id, v, {bucket} AS bucket FROM "
           f"(SELECT vec_id, embedding::DOUBLE[] AS v, {e6} AS e6 FROM {table})")
    join = ("FROM e a JOIN e b ON a.bucket = b.bucket AND a.vec_id < b.vec_id"
            if use_lsh else
            "FROM e a CROSS JOIN e b WHERE a.vec_id < b.vec_id")
    return f"""
        WITH e AS ({src}),
        p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                     list_dot_product(a.v, b.v) /
                     (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) AS sim
              {join})
        SELECT id_a, id_b, CAST(FLOOR(sim * 1000) AS BIGINT) AS sim_e3
        FROM p WHERE FLOOR(sim * 1000) >= {threshold_e3}
    """


# ------------------------------------------------------------------ IVF

def ivf_centroid_seeds(emb: DataFrame, n_centroids: int,
                       id_col: str = "vec_id",
                       vec_col: str = "embedding") -> np.ndarray:
    """Deterministic IVF centroids: the ``n_centroids`` vectors whose
    md5(id) sorts lowest — an order-stable sample both engines can name
    (the DuckDB twin selects the identical rows), fixed-pointed to e6
    int64. A Lloyd refinement would drop into the same assignment kernel
    but float-averaged centroids break cross-engine exactness, so the
    verified operator pins seed centroids; at 100 TB this is the standard
    "IVF with sampled coarse quantizer" shape and the collect is C rows."""
    rows = (emb.select(F.col(id_col).cast("string").alias("sid"),
                       F.col(vec_col).alias("v"))
            .withColumn("h", F.md5(F.col("sid")))
            .orderBy("h", "sid").limit(n_centroids).collect())
    M = np.array([r["v"] for r in rows], dtype=np.float64)
    return np.floor(M * 1_000_000).astype(np.int64)          # (C, d)


def ivf_probe_udf(seeds: np.ndarray, n_probe: int):
    """Arrow-batched coarse quantizer: embedding → the ``n_probe`` nearest
    centroid ids by EXACT int64 inner product (e6 fixed point, products
    bounded ≪ 2^53 so the DuckDB list_dot_product twin agrees bit-for-bit;
    ties break to the lower centroid id via stable argsort). One (n,d)@(d,C)
    matmul per batch — the centroid matrix rides the UDF closure, so at
    1000 executors it ships once per worker like a broadcast."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<int>")
    def probe(col: pd.Series) -> pd.Series:
        if col.empty:
            return pd.Series([], dtype=object)
        M = np.stack(col.to_numpy())
        e6 = np.floor(M.astype(np.float64) * 1_000_000).astype(np.int64)
        dots = e6 @ seeds.T                                  # (n, C) exact
        order = np.argsort(-dots, axis=1, kind="stable")[:, :n_probe]
        return pd.Series(list(order.astype(np.int32)))

    return probe


def ivf_topk(emb: DataFrame, queries: DataFrame, k: int = 5,
             n_centroids: int = 16, n_probe: int = 4,
             id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """IVF approximate top-k — the second scale path beside LSH: every
    vector is assigned to its nearest of ``n_centroids`` coarse centroids
    (one Arrow matmul per batch, shuffle linear in |emb|), each query
    probes its ``n_probe`` nearest cells, and the exact cosine re-rank
    touches only ~n_probe/C of the corpus. ``n_probe == n_centroids``
    degrades to exact brute force (the recall invariant the tests pin)."""
    seeds = ivf_centroid_seeds(emb, n_centroids, id_col, vec_col)
    assign = ivf_probe_udf(seeds, 1)
    probe = ivf_probe_udf(seeds, n_probe)
    c = emb.select(F.col(id_col).alias("n_id"), F.col(vec_col).alias("n_vec"),
                   assign(F.col(vec_col)).getItem(0).alias("cid"))
    qp = queries.select(F.col(id_col).alias("q_id"),
                        F.col(vec_col).alias("q_vec"),
                        F.explode(probe(F.col(vec_col))).alias("cid"))
    cand = (c.join(F.broadcast(qp), "cid")
            .where(F.col("n_id") != F.col("q_id")))
    w = Window.partitionBy("q_id").orderBy(F.col("sim").desc(), F.col("n_id"))
    return (
        cand.withColumn("sim", cosine("q_vec", "n_vec"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "n_id", F.col("rank").cast("long").alias("rank"),
                F.floor(F.col("sim") * 1000).cast("long").alias("sim_e3"))
    )


def ivf_topk_sql(k: int = 5, n_centroids: int = 16, n_probe: int = 4,
                 query_pred: str = "vec_id < 8",
                 table: str = "embeddings") -> str:
    """DuckDB twin of ``ivf_topk``: identical seed selection (md5-ordered),
    identical exact-integer coarse assignment, identical probe + re-rank."""
    e6 = E6_SQL.format(vec="embedding")
    cos = ("list_dot_product(q.v, c.v) / (sqrt(list_dot_product(q.v, q.v))"
           " * sqrt(list_dot_product(c.v, c.v)))")
    return f"""
        WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS v, {e6} AS e6
                      FROM {table}),
        seeds AS (SELECT e6 AS se6, ROW_NUMBER() OVER (
                      ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS cid
                  FROM base
                  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
                  LIMIT {n_centroids}),
        ranked AS (SELECT b.vec_id, s.cid, ROW_NUMBER() OVER (
                       PARTITION BY b.vec_id
                       ORDER BY list_dot_product(b.e6, s.se6) DESC, s.cid ASC
                   ) AS rn
                   FROM base b CROSS JOIN seeds s),
        clus AS (SELECT vec_id, cid FROM ranked WHERE rn = 1),
        qprobe AS (SELECT vec_id AS q_id, cid FROM ranked
                   WHERE rn <= {n_probe} AND vec_id IN
                         (SELECT vec_id FROM {table} WHERE {query_pred})),
        cand AS (SELECT q.q_id, c.vec_id AS n_id
                 FROM qprobe q JOIN clus c ON c.cid = q.cid
                 WHERE c.vec_id <> q.q_id),
        scored AS (SELECT cand.q_id, cand.n_id, {cos} AS sim
                   FROM cand
                   JOIN base q ON q.vec_id = cand.q_id
                   JOIN base c ON c.vec_id = cand.n_id)
        SELECT q_id, n_id, CAST(rank AS BIGINT) AS rank,
               CAST(FLOOR(sim * 1000) AS BIGINT) AS sim_e3
        FROM (SELECT q_id, n_id, sim, ROW_NUMBER() OVER (
                  PARTITION BY q_id ORDER BY sim DESC, n_id ASC) AS rank
              FROM scored)
        WHERE rank <= {k}
    """


def embedding_clusters(emb: DataFrame, threshold_e3: int = 350,
                       id_col: str = "vec_id", vec_col: str = "embedding",
                       use_lsh: bool = True, n_planes: int = 8) -> DataFrame:
    """Embedding near-duplicate CLUSTERS: connected components over the
    cosine near-pairs (same min-label kernel as the text-side
    dedup.duplicate_clusters) — the keep-one-per-cluster shape for
    semantic dedup of an embedding-indexed corpus. Pair discovery stays
    LSH-bucketed (linear shuffle); the component fold runs on the
    pairs-sized edge set only."""
    from canal_spark.functions.dedup import connected_component_labels

    pairs = embedding_near_pairs(emb, threshold_e3, id_col, vec_col,
                                 use_lsh, n_planes)
    labels = connected_component_labels(pairs)
    sizes = labels.groupBy("lbl").agg(F.count("*").alias("cluster_size"))
    return (labels.join(sizes, "lbl")
            .select(F.col("id").alias(id_col),
                    F.col("lbl").alias("cluster_id"),
                    F.col("cluster_size")))


def embedding_clusters_sql(threshold_e3: int = 350, use_lsh: bool = True,
                           n_planes: int = 8,
                           table: str = "embeddings") -> str:
    """DuckDB twin: same cosine pairs, shared recursive-closure emitter."""
    from canal_spark.functions.dedup import connected_components_sql

    pairs = embedding_near_pairs_sql(threshold_e3, use_lsh, n_planes, table)
    return connected_components_sql(pairs, id_alias="vec_id")
