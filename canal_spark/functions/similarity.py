"""Similarity search over embedding columns (array<float>).

- ``cosine_topk``: brute-force exact top-k — the baseline. Dot products via
  JVM higher-order functions (zip_with + aggregate in double precision);
  a crossJoin bounded by the (small) query side, ranked per query.
- ``lsh_bucketed_topk``: the scale path — random-hyperplane LSH buckets
  (sign bits of h deterministic projections) so candidates join only within
  buckets; exact cosine re-rank inside. At 100 TB the bucket join replaces
  the n² crossJoin; recall is tunable via n_planes/n_tables.
- ``embedding_near_pairs``: near-duplicate pairs by cosine ≥ τ.

No numpy/pandas in the hot path; the fold runs in whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


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


def hyperplane_bucket(vec_col, n_planes: int = 12, table: int = 0) -> Column:
    """Random-hyperplane LSH bucket id: sign bits of n deterministic
    pseudo-random projections. Plane p component j = a zero-mean hash of
    (table, p, j) — reproducible on any engine, no stored model."""
    v = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    bucket = F.lit(0).cast("long")
    for p in range(n_planes):
        # projection = sum_j v[j] * w_pj, w_pj in [-0.5, 0.5)
        proj = F.aggregate(
            F.zip_with(
                v,
                F.sequence(F.lit(0), F.size(v) - 1),
                lambda x, j: x.cast("double")
                * (
                    (
                        F.pmod(
                            F.xxhash64(F.concat_ws(":", F.lit(table), F.lit(p), j)),
                            F.lit(1_000_000),
                        ).cast("double")
                        / 1_000_000.0
                    )
                    - 0.5
                ),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket.bitwiseOR(
            F.when(proj > 0, F.shiftleft(F.lit(1).cast("long"), p)).otherwise(F.lit(0).cast("long"))
        )
    return bucket


def lsh_bucketed_topk(emb: DataFrame, queries: DataFrame, k: int = 5,
                      id_col: str = "vec_id", vec_col: str = "embedding",
                      n_planes: int = 10, n_tables: int = 4) -> DataFrame:
    """Approximate top-k: candidates share an LSH bucket in ≥1 of
    ``n_tables`` hash tables; exact cosine re-rank within candidates.
    Shuffle is linear in |emb| × n_tables (bucket-partitioned join), never
    |emb| × |queries|."""
    def bucketed(df, side):
        rows = []
        for t in range(n_tables):
            rows.append(
                df.select(
                    F.col(id_col).alias(f"{side}_id"),
                    F.col(vec_col).alias(f"{side}_vec"),
                    F.concat_ws(
                        ":", F.lit(t), hyperplane_bucket(vec_col, n_planes, t)
                    ).alias("bucket"),
                )
            )
        out = rows[0]
        for r in rows[1:]:
            out = out.unionByName(r)
        return out

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


def embedding_near_pairs(emb: DataFrame, threshold_e3: int = 990,
                         id_col: str = "vec_id",
                         vec_col: str = "embedding",
                         use_lsh: bool = False,
                         n_planes: int = 8) -> DataFrame:
    """Near-duplicate vector pairs with cosine*1000 ≥ threshold.

    use_lsh=True joins only within hyperplane buckets (scale path);
    False is the exact n² baseline for small/verification runs."""
    a = emb.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    if use_lsh:
        a = a.withColumn("bucket", hyperplane_bucket("va", n_planes, 0))
        b = b.withColumn("bucket", hyperplane_bucket("vb", n_planes, 0))
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
