"""Deduplication operators for training-data curation.

Exact (hash-groupBy), word/n-gram Jaccard, MinHash+LSH, and SimHash — all
expressed as DataFrame ops (shuffle-aware), no driver-side loops. Designed
so each stage is a plain hash shuffle Catalyst can plan:

- exact:   one groupBy on the canonical hash (map-side combine).
- jaccard: explode → self-join on shingle → pair-count aggregation. The
  shingle join key is a 64-bit hash, not the string (smaller shuffle).
- minhash: K independent permutations via xxhash64(shingle, seed_k), min per
  doc (one aggregate), LSH banding → candidate pairs join only within
  buckets — the 100 TB-safe path (no n² comparisons).
- simhash: weighted bit-vote over shingle hashes, hamming-distance bucket
  join on band keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from canal_spark.functions.text import words


def canonical_text(text_col) -> F.Column:
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.regexp_replace(F.lower(F.trim(c)), r"\s+", " ")


def spread(df: DataFrame) -> DataFrame:
    """Ensure CPU-dense per-doc stages use every core: small benchmark
    inputs arrive as ONE parquet partition (≤ maxPartitionBytes), which
    would serialize the shingle/hash kernels on a single task. At real
    scale the input already has ≥cores partitions and this is a no-op —
    no shuffle is ever added for big inputs."""
    p = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(p) if df.rdd.getNumPartitions() < p else df


def exact_duplicates(df: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Groups of byte-identical (canonicalized) docs: one row per duplicate
    group with the keeper (min id) and the group size."""
    h = F.md5(canonical_text(text_col))
    return (
        df.select(F.col(id_col), h.alias("fp_md5"))
        .groupBy("fp_md5")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count("*").alias("group_size"),
        )
        .where(F.col("group_size") > 1)
    )


def word_shingles(df: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text", n: int = 3) -> DataFrame:
    """Distinct word n-gram shingles per doc: (id, shingle string).

    Built with JVM higher-order functions (transform over a sequence of
    offsets + slice + array_join) — no UDF.
    """
    w = words(canonical_text(text_col))
    if n == 1:
        sh = F.array_distinct(w)
    else:
        idx = F.sequence(F.lit(1), F.greatest(F.size(w) - (n - 1), F.lit(0)))
        sh = F.array_distinct(
            F.transform(idx, lambda i: F.array_join(F.slice(w, i, n), " "))
        )
    return df.select(F.col(id_col).alias("id"), sh.alias("shingles"))


def jaccard_pairs(df: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text", n: int = 1,
                  threshold_bp: int = 8000) -> DataFrame:
    """All doc pairs with n-gram Jaccard ≥ threshold (basis points).

    |A∩B| via a self-join on the shingle hash; |A∪B| = |A|+|B|−|A∩B|.
    Output: id_a < id_b, inter, size_a, size_b, jaccard_bp (integer).
    """
    sh = word_shingles(spread(df), id_col, text_col, n)
    sizes = sh.select("id", F.size("shingles").cast("long").alias("sz"))
    ex = sh.select(
        "id", F.explode("shingles").alias("shingle")
    ).select("id", F.xxhash64("shingle").alias("sh"))
    a = ex.select(F.col("id").alias("id_a"), "sh")
    b = ex.select(F.col("id").alias("id_b"), "sh")
    inter = (
        a.join(b, "sh")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("inter"))
    )
    out = (
        inter.join(sizes.withColumnsRenamed({"id": "id_a", "sz": "size_a"}), "id_a")
        .join(sizes.withColumnsRenamed({"id": "id_b", "sz": "size_b"}), "id_b")
        .withColumn(
            "jaccard_bp",
            F.floor(
                F.col("inter") * 10000
                / (F.col("size_a") + F.col("size_b") - F.col("inter"))
            ).cast("long"),
        )
        .where(F.col("jaccard_bp") >= threshold_bp)
    )
    return out.select("id_a", "id_b", "inter", "size_a", "size_b", "jaccard_bp")


def minhash_signatures(df: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text", n: int = 3,
                       num_hashes: int = 64) -> DataFrame:
    """K-permutation MinHash signature per doc as array<long>.

    Each shingle is hashed ONCE to 64 bits; permutation k re-hashes that
    fixed-width value with seed k (``xxhash64(h, k)``) — so the per-shingle
    cost is one string hash + K constant-size hashes, all flat codegen'd
    expressions. The K mins are plain `min()` aggregates (map-side combine,
    one shuffle of K longs per doc).

    An earlier version computed K × shingles hashes with nested
    higher-order-function lambdas (`transform(transform(...))`); Catalyst
    cannot codegen nested lambdas and fell back to per-element interpreted
    evaluation — ~150 µs/hash, 80 s for 5 000 docs. This formulation is
    ~40× faster and is what survives a 100 TB corpus."""
    sh = word_shingles(spread(df), id_col, text_col, n)
    ex = sh.select("id", F.explode("shingles").alias("s")).select(
        "id", F.xxhash64("s").alias("h")
    )
    mins = ex.groupBy("id").agg(
        *[F.min(F.xxhash64(F.col("h"), F.lit(k))).alias(f"_m{k}")
          for k in range(num_hashes)]
    )
    return mins.select(
        "id", F.array(*[f"_m{k}" for k in range(num_hashes)]).alias("sig")
    )


def minhash_lsh_pairs(df: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text", n: int = 3,
                      num_hashes: int = 64, bands: int = 8,
                      threshold_bp: int = 7000) -> DataFrame:
    """Near-dup pairs via MinHash LSH banding + exact-signature verify.

    bands × rows (rows = num_hashes/bands); docs sharing any band bucket are
    candidates (joined only within buckets — linear shuffle, not n²); the
    estimated Jaccard = matching signature positions / K, verified against
    the threshold. The scale path for 100 TB dedup.

    Band sizing is the knob that bounds the candidate set: a pair with true
    Jaccard s becomes a candidate with prob 1-(1-s^rows)^bands. rows=8
    (bands=8, K=64) keeps recall ≈99% at s≥0.9 while crushing the candidate
    count on self-similar corpora — rows=4 made ~60% of ALL pairs candidates
    on the synthetic word-soup corpus, i.e. an accidental n² explosion."""
    rows = num_hashes // bands
    sig = minhash_signatures(df, id_col, text_col, n, num_hashes).persist()
    band_idx = F.explode(F.sequence(F.lit(0), F.lit(bands - 1))).alias("band")
    banded = sig.select("id", "sig", band_idx).select(
        "id",
        "band",
        F.xxhash64(
            F.concat_ws(",", F.col("band"),
                        F.array_join(F.slice("sig", F.col("band") * rows + 1, rows), ",")),
        ).alias("bucket"),
    )
    a = banded.select(F.col("id").alias("id_a"), "bucket")
    b = banded.select(F.col("id").alias("id_b"), "bucket")
    cand = (
        a.join(b, "bucket")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    sa = sig.select(F.col("id").alias("id_a"), F.col("sig").alias("sig_a"))
    sb = sig.select(F.col("id").alias("id_b"), F.col("sig").alias("sig_b"))
    est = (
        cand.join(sa, "id_a").join(sb, "id_b")
        .withColumn(
            "match_bp",
            (
                F.size(
                    F.filter(
                        F.zip_with("sig_a", "sig_b", lambda x, y: x == y),
                        lambda eq: eq,
                    )
                ) * 10000 / num_hashes
            ),
        )
        .withColumn(
            "match_bp", F.floor(F.col("match_bp")).cast("long"),
        )
        .where(F.col("match_bp") >= threshold_bp)
    )
    return est.select("id_a", "id_b", "match_bp")


def simhash(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
            n: int = 3, bits: int = 64) -> DataFrame:
    """64-bit SimHash per doc: bit b of the fingerprint = majority vote of
    bit b over all shingle hashes. Pure bitwise JVM expressions."""
    sh = word_shingles(spread(df), id_col, text_col, n)
    ex = sh.select("id", F.explode("shingles").alias("s")).select(
        "id", F.xxhash64("s").alias("h")
    )
    votes = [
        F.sum(
            F.when(F.col("h").bitwiseAND(F.shiftleft(F.lit(1).cast("long"), b)) != 0, 1)
            .otherwise(-1)
        ).alias(f"v{b}")
        for b in range(bits)
    ]
    agg = ex.groupBy("id").agg(*votes)
    fp = None
    for b in range(bits):
        bit = F.when(F.col(f"v{b}") > 0, F.shiftleft(F.lit(1).cast("long"), b)).otherwise(F.lit(0).cast("long"))
        fp = bit if fp is None else fp.bitwiseOR(bit)
    return agg.select("id", fp.alias("simhash"))


def simhash_near_pairs(df: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text", max_hamming: int = 3,
                       band_bits: int = 16) -> DataFrame:
    """Candidate near-dup pairs: docs sharing any of the 4 16-bit simhash
    bands (pigeonhole: hamming ≤ 3 ⇒ ≥1 identical band), verified by exact
    hamming distance via bit_count(xor)."""
    s = simhash(df, id_col, text_col).persist()
    bands = 64 // band_bits
    mask = (1 << band_bits) - 1
    banded = s.select(
        "id", "simhash",
        F.explode(
            F.array(*[
                F.concat_ws(":", F.lit(i),
                            F.shiftright("simhash", i * band_bits)
                            .bitwiseAND(F.lit(mask)).cast("string"))
                for i in range(bands)
            ])
        ).alias("band_key"),
    )
    a = banded.select(F.col("id").alias("id_a"),
                      F.col("simhash").alias("sh_a"), "band_key")
    b = banded.select(F.col("id").alias("id_b"),
                      F.col("simhash").alias("sh_b"), "band_key")
    return (
        a.join(b, "band_key")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sh_a", "sh_b")
        .distinct()
        .withColumn("hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))))
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
