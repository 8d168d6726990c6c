"""Deduplication operators for training-data curation.

Exact (hash-groupBy), word/n-gram Jaccard, MinHash+LSH, and SimHash — all
expressed as DataFrame ops (shuffle-aware), no driver-side loops. Designed
so each stage is a plain hash shuffle Catalyst can plan:

- exact:   one groupBy on the canonical hash (map-side combine).
- jaccard: explode → self-join on shingle → pair-count aggregation, guarded
  by a document-frequency cap (a shingle present in > max_df docs is dropped
  from every doc's set — without this one common unigram in 1M docs makes
  10¹² join pairs; standard MinHashLSH practice).
- minhash: one 60-bit hash per shingle, K arithmetic permutations
  (hashing.perm — fused multiply-add, no chained hash calls), min per doc
  (one aggregate), LSH banding → candidate pairs join only within buckets —
  the 100 TB-safe path (no n² comparisons).
- simhash: bit-vote over shingle hashes, pigeonhole band join + exact
  hamming verify via bit_count(xor).

Every pseudo-random quantity is md5-derived (canal_spark.functions.hashing),
so each operator has a DuckDB twin (`*_sql`) the driver verifies
value-for-value — nothing here is rows-only.

Reference parity: the dedup family is the training-data extension mandated
by the build brief (not a reference operator); the deterministic-hash
partitioning contract mirrors SURVEY.md §2 #22 (pk-hash partitioner,
sink/.../AbstractMQMessageUtils.java messageHashPartition analog).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from canal_spark.functions import hashing


def canonical_text(text_col) -> F.Column:
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.regexp_replace(F.lower(F.trim(c)), r"\s+", " ")


CANON_SQL = r"regexp_replace(trim(lower(text)), '\s+', ' ', 'g')"


def spread(df: DataFrame) -> DataFrame:
    """Ensure CPU-dense per-doc stages use every core: small benchmark
    inputs arrive as ONE parquet partition (≤ maxPartitionBytes), which
    would serialize the shingle/hash kernels on a single task. Decided from
    driver-side file metadata only (`inputFiles`) — no RDD materialization,
    no job. At real scale the scan has ≥cores files and this is a no-op."""
    p = df.sparkSession.sparkContext.defaultParallelism
    try:
        n_files = len(df.inputFiles())
    except Exception:  # non-file plans (tests build in-memory frames)
        n_files = 0
    return df.repartition(p) if n_files < p else df


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
    """Distinct word n-gram shingles per doc: (id, shingles array).

    Built with JVM higher-order functions (transform over a sequence of
    offsets + slice + array_join) — no UDF. Measured pitfalls engineered
    around (the shingle pass dominates every dedup operator at corpus
    scale):

    - the < n-words guard is an index list of provably non-negative length
      (slice of a 1-based sequence), not a when() branch — CaseWhen has no
      common-subexpression elimination and re-evaluated the whole split
      per branch reference (2×);
    - the split runs straight on lower(trim(text)) — collapsing runs of
      whitespace first (canonical_text) is redundant ahead of a ``\\s+``
      split and doubled the regex work. Shingle STRINGS are identical
      either way (words re-join with single spaces), so the DuckDB oracle
      twins, which split the canonical form, still match value-for-value;
    - hot-path consumers must NOT explode the aliased ``shingles`` column
      this returns — use ``_exploded_hashes`` (inline explode), see
      _shingles_expr (4-8×).
    """
    return df.select(F.col(id_col).alias("id"),
                     _shingles_expr(text_col, n).alias("shingles"))


def _shingles_expr(text_col: str, n: int):
    """The shingle list as a single Column EXPRESSION (not a projected
    column). Callers that explode it must do so INLINE in one select:
    exploding an *aliased* complex column lets InferFiltersFromGenerate
    substitute the whole expression into an inferred ``size(...) > 0``
    filter and push it below the spread() Exchange — the entire shingle
    transform then evaluates TWICE, once single-partition (measured 4-8×
    on the sf0.1 corpus: 4.2 s vs 0.6 s for the exploded stage). Inline
    generator children dodge the rule (PERF.md #15)."""
    w = F.filter(F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
                 lambda x: x != "")
    if n == 1:
        return F.array_distinct(w)
    cnt = F.greatest(F.size(w) - (n - 1), F.lit(0))
    idx = F.slice(F.sequence(F.lit(1), F.greatest(cnt, F.lit(1))), F.lit(1), cnt)
    return F.array_distinct(
        F.transform(idx, lambda i: F.array_join(F.slice(w, i, n), " "))
    )


_WORDS_SQL = (r"list_filter(regexp_split_to_array(" + CANON_SQL +
              r", '\s+'), x -> x <> '')")


def word_shingles_sql(n: int = 3) -> str:
    """DuckDB expression for the same distinct shingle list."""
    if n == 1:
        return f"list_distinct({_WORDS_SQL})"
    return f"""list_distinct(CASE WHEN len({_WORDS_SQL}) >= {n}
        THEN list_transform(generate_series(1, len({_WORDS_SQL}) - {n - 1}),
             i -> array_to_string(list_slice({_WORDS_SQL}, i, i + {n - 1}), ' '))
        ELSE []::VARCHAR[] END)"""


def _exploded_hashes(df: DataFrame, id_col: str, text_col: str,
                     n: int) -> DataFrame:
    """(id, h): one 60-bit md5-derived hash per distinct shingle per doc.
    The shingle expression explodes INLINE — see _shingles_expr on why the
    aliased-column form costs 4-8× here."""
    return spread(df).select(
        F.col(id_col).alias("id"),
        F.explode(_shingles_expr(text_col, n)).alias("s"),
    ).select("id", hashing.h60(F.col("s")).alias("h"))


def jaccard_pairs(df: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text", n: int = 1,
                  threshold_bp: int = 8000,
                  max_df: int = 10_000) -> DataFrame:
    """All doc pairs with n-gram Jaccard ≥ threshold (basis points).

    |A∩B| via a self-join on the shingle hash; |A∪B| = |A|+|B|−|A∩B|.
    Shingles with document frequency > ``max_df`` are removed from every
    doc's set (sizes AND intersections — one consistent set definition), so
    a globally-common shingle can never make the self-join quadratic: the
    worst bucket is max_df², not n_docs². Output: id_a < id_b, inter,
    size_a, size_b, jaccard_bp (integer).
    """
    from pyspark.sql.window import Window

    ex = _exploded_hashes(df, id_col, text_col, n)
    # df-cap as ONE window over the h-partitioning — the a⋈b self-join below
    # shuffles on h anyway, so Catalyst reuses this exchange (no extra pass)
    ex = (
        ex.withColumn("df", F.count("*").over(Window.partitionBy("h")))
        .where(F.col("df") <= max_df)
        .drop("df")
    )
    sizes = ex.groupBy("id").agg(F.count("*").alias("sz"))
    a = ex.select(F.col("id").alias("id_a"), "h")
    b = ex.select(F.col("id").alias("id_b"), "h")
    inter = (
        a.join(b, "h")
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


def jaccard_pairs_sql(n: int = 1, threshold_bp: int = 8000,
                      max_df: int = 10_000, table: str = "documents",
                      id_col: str = "doc_id") -> str:
    h = hashing.h60_sql("s")
    return f"""
        WITH sh AS (
            SELECT {id_col} AS id, {word_shingles_sql(n)} AS s
            FROM {table}
        ),
        ex0 AS (SELECT id, {h} AS h FROM (SELECT id, unnest(s) AS s FROM sh)),
        ex AS (SELECT id, h FROM ex0
               QUALIFY COUNT(*) OVER (PARTITION BY h) <= {max_df}),
        sz AS (SELECT id, COUNT(*) AS sz FROM ex GROUP BY id),
        inter AS (
            SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS inter
            FROM ex a JOIN ex b ON a.h = b.h AND a.id < b.id
            GROUP BY 1, 2
        )
        SELECT id_a, id_b, inter, sa.sz AS size_a, sb.sz AS size_b,
               CAST(FLOOR(inter * 10000 / (sa.sz + sb.sz - inter)) AS BIGINT) AS jaccard_bp
        FROM inter JOIN sz sa ON sa.id = id_a JOIN sz sb ON sb.id = id_b
        WHERE FLOOR(inter * 10000 / (sa.sz + sb.sz - inter)) >= {threshold_bp}
    """


def minhash_signatures(df: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text", n: int = 3,
                       num_hashes: int = 64) -> DataFrame:
    """K-permutation MinHash signature per doc as array<long>.

    Each shingle is hashed ONCE to 60 bits; permutation k is a fused
    multiply-add over the hash's 30-bit halves (hashing.perm) — flat
    codegen'd arithmetic, no chained hash calls. The K mins are plain
    `min()` aggregates (map-side combine, one shuffle of K longs per doc).

    An earlier version computed K × shingles hashes with nested
    higher-order-function lambdas (`transform(transform(...))`); Catalyst
    cannot codegen nested lambdas and fell back to per-element interpreted
    evaluation — ~150 µs/hash, 80 s for 5 000 docs. This formulation is
    ~40× faster and is what survives a 100 TB corpus."""
    ex = _exploded_hashes(df, id_col, text_col, n)
    mins = ex.groupBy("id").agg(
        *[F.min(hashing.perm(F.col("h"), k)).alias(f"_m{k}")
          for k in range(num_hashes)]
    )
    return mins.select(
        "id", F.array(*[f"_m{k}" for k in range(num_hashes)]).alias("sig")
    )


def banded_signatures(df: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text", n: int = 3,
                      num_hashes: int = 64, bands: int = 8) -> DataFrame:
    """(id, sig, band, bucket): one row per doc per LSH band.

    The bucket hash folds the band index in (``h60(band || ',' || slice)``)
    so bucket values are globally disjoint across bands — a single-column
    join key downstream. Docs with zero shingles (< n words / NULL text)
    produce no rows; callers that need a static per-doc row set (the
    CDC-maintained band index) left-join against a doc × band grid."""
    rows = num_hashes // bands
    sig = minhash_signatures(df, id_col, text_col, n, num_hashes)
    band_idx = F.explode(F.sequence(F.lit(0), F.lit(bands - 1))).alias("band")
    return sig.select("id", "sig", band_idx).select(
        "id",
        "sig",
        "band",
        hashing.h60(
            F.concat_ws(",", F.col("band"),
                        F.array_join(F.slice("sig", F.col("band") * rows + 1, rows), ",")),
        ).alias("bucket"),
    )


def banded_signatures_sql(n: int = 3, num_hashes: int = 64, bands: int = 8,
                          table: str = "documents", id_col: str = "doc_id",
                          text_col: str = "text") -> str:
    """DuckDB twin of :func:`banded_signatures` (without ``sig``):
    one (id, band, bucket) row per doc per band."""
    rows = num_hashes // bands
    perms = ", ".join(
        f"MIN({hashing.perm_sql('h', k)}) AS m{k}" for k in range(num_hashes)
    )
    sig_list = "[" + ", ".join(f"m{k}" for k in range(num_hashes)) + "]"
    per_band = " UNION ALL ".join(
        f"SELECT id, {b} AS band, " + hashing.h60_sql(
            f"{b} || ',' || array_to_string("
            f"list_slice(sig, {b * rows + 1}, {(b + 1) * rows}), ',')"
        ) + " AS bucket FROM sig"
        for b in range(bands)
    )
    return f"""
        WITH sh AS (
            SELECT {id_col} AS id,
                   {word_shingles_sql(n).replace('lower(text)', f'lower({text_col})')} AS s
            FROM {table}
        ),
        ex AS (SELECT id, {hashing.h60_sql('s')} AS h
               FROM (SELECT id, unnest(s) AS s FROM sh)),
        sig0 AS (SELECT id, {perms} FROM ex GROUP BY id),
        sig AS (SELECT id, {sig_list} AS sig FROM sig0)
        {per_band}
    """


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
    on the synthetic word-soup corpus, i.e. an accidental n² explosion.

    The signature rides THROUGH the band join (id → sig is functional), so
    the signature subtree is computed once and nothing is persisted — round
    1 `.persist()`'d it and leaked executor storage for the session."""
    banded = banded_signatures(df, id_col, text_col, n, num_hashes, bands)
    a = banded.select(F.col("id").alias("id_a"), F.col("sig").alias("sig_a"), "bucket")
    b = banded.select(F.col("id").alias("id_b"), F.col("sig").alias("sig_b"), "bucket")
    cand = (
        a.join(b, "bucket")
        .where(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    est = cand.withColumn(
        "match_bp",
        F.floor(
            F.size(
                F.filter(
                    F.zip_with("sig_a", "sig_b", lambda x, y: x == y),
                    lambda eq: eq,
                )
            ) * 10000 / num_hashes
        ).cast("long"),
    ).where(F.col("match_bp") >= threshold_bp)
    return est.select("id_a", "id_b", "match_bp")


def minhash_lsh_pairs_sql(n: int = 3, num_hashes: int = 64, bands: int = 8,
                          threshold_bp: int = 7000, table: str = "documents",
                          id_col: str = "doc_id") -> str:
    rows = num_hashes // bands
    perms = ", ".join(
        f"MIN({hashing.perm_sql('h', k)}) AS m{k}" for k in range(num_hashes)
    )
    sig_list = "[" + ", ".join(f"m{k}" for k in range(num_hashes)) + "]"
    buckets = ", ".join(
        hashing.h60_sql(
            f"{b} || ',' || array_to_string("
            f"list_slice(sig, {b * rows + 1}, {(b + 1) * rows}), ',')"
        )
        for b in range(bands)
    )
    return f"""
        WITH sh AS (
            SELECT {id_col} AS id, {word_shingles_sql(n)} AS s FROM {table}
        ),
        ex AS (SELECT id, {hashing.h60_sql('s')} AS h
               FROM (SELECT id, unnest(s) AS s FROM sh)),
        sig0 AS (SELECT id, {perms} FROM ex GROUP BY id),
        sig AS (SELECT id, {sig_list} AS sig FROM sig0),
        banded AS (SELECT id, sig, unnest([{buckets}]) AS bucket FROM sig),
        cand AS (
            SELECT DISTINCT a.id AS id_a, a.sig AS sig_a,
                            b.id AS id_b, b.sig AS sig_b
            FROM banded a JOIN banded b
              ON a.bucket = b.bucket AND a.id < b.id
        )
        SELECT * FROM (
            SELECT id_a, id_b,
                   CAST(FLOOR(len(list_filter(generate_series(1, {num_hashes}),
                              i -> sig_a[i] = sig_b[i])) * 10000 / {num_hashes})
                        AS BIGINT) AS match_bp
            FROM cand
        ) WHERE match_bp >= {threshold_bp}
    """


SIMHASH_BITS = 60   # h60 hashes carry 60 random bits
SIMHASH_BAND_BITS = 15  # 4 bands ⇒ pigeonhole covers hamming ≤ 3


def simhash(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
            n: int = 3, bits: int = SIMHASH_BITS) -> DataFrame:
    """60-bit SimHash per doc: bit b of the fingerprint = majority vote of
    bit b over all shingle hashes. Pure bitwise JVM expressions.

    The vote is PACKED: two 32-bit ones-counters per long accumulator
    (bit 2i in the low half, bit 2i+1 shifted to the high half), so the
    groupBy carries 31 aggregates instead of 60 — halving the Catalyst
    expression tree (VERDICT r02 wrong #4) with zero data-path change.
    No field can carry into its neighbour: a counter reaches 2^31 only
    after 2^31 distinct shingles in ONE document (a multi-GB doc).
    Majority of bit b ⇔ 2 * ones_b > n_shingles, identical to the
    previous ±1 vote-sum sign test and to the DuckDB oracle's votes."""
    ex = _exploded_hashes(df, id_col, text_col, n)
    one = F.lit(1).cast("long")
    packed = [
        F.sum(
            F.shiftrightunsigned(F.col("h"), 2 * i).bitwiseAND(one)
            + F.shiftleft(
                F.shiftrightunsigned(F.col("h"), 2 * i + 1).bitwiseAND(one), 32)
        ).alias(f"p{i}")
        for i in range((bits + 1) // 2)
    ]
    agg = ex.groupBy("id").agg(F.count(F.lit(1)).alias("_n"), *packed)
    lo32 = F.lit((1 << 32) - 1).cast("long")
    fp = F.lit(0).cast("long")
    for b in range(bits):
        ones = F.col(f"p{b // 2}").bitwiseAND(lo32) if b % 2 == 0 \
            else F.shiftrightunsigned(F.col(f"p{b // 2}"), 32)
        fp = fp.bitwiseOR(
            F.when(2 * ones > F.col("_n"),
                   F.shiftleft(one, b)).otherwise(F.lit(0).cast("long")))
    return agg.select("id", fp.alias("simhash"))


def simhash_near_pairs(df: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text", max_hamming: int = 3,
                       band_bits: int = SIMHASH_BAND_BITS) -> DataFrame:
    """Candidate near-dup pairs: docs sharing any of the 4 15-bit simhash
    bands (pigeonhole: hamming ≤ 3 ⇒ ≥1 identical band), verified by exact
    hamming distance via bit_count(xor). The fingerprint (one long) rides
    through the band join — nothing persisted."""
    s = simhash(df, id_col, text_col)
    bands = SIMHASH_BITS // band_bits
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


def simhash_near_pairs_sql(n: int = 3, max_hamming: int = 3,
                           band_bits: int = SIMHASH_BAND_BITS,
                           table: str = "documents",
                           id_col: str = "doc_id") -> str:
    bits = SIMHASH_BITS
    bands = bits // band_bits
    mask = (1 << band_bits) - 1
    votes = ", ".join(
        f"SUM(CASE WHEN (h & {1 << b}) <> 0 THEN 1 ELSE -1 END) AS v{b}"
        for b in range(bits)
    )
    fp = " + ".join(
        f"(CASE WHEN v{b} > 0 THEN {1 << b}::BIGINT ELSE 0 END)"
        for b in range(bits)
    )
    band_keys = ", ".join(
        f"({i} || ':' || ((fp >> {i * band_bits}) & {mask}))"
        for i in range(bands)
    )
    return f"""
        WITH sh AS (
            SELECT {id_col} AS id, {word_shingles_sql(n)} AS s FROM {table}
        ),
        ex AS (SELECT id, {hashing.h60_sql('s')} AS h
               FROM (SELECT id, unnest(s) AS s FROM sh)),
        votes AS (SELECT id, {votes} FROM ex GROUP BY id),
        fps AS (SELECT id, ({fp}) AS fp FROM votes),
        banded AS (SELECT id, fp, unnest([{band_keys}]) AS band_key FROM fps),
        cand AS (
            SELECT DISTINCT a.id AS id_a, a.fp AS fp_a,
                            b.id AS id_b, b.fp AS fp_b
            FROM banded a JOIN banded b
              ON a.band_key = b.band_key AND a.id < b.id
        )
        SELECT * FROM (
            SELECT id_a, id_b, bit_count(xor(fp_a, fp_b)) AS hamming
            FROM cand
        ) WHERE hamming <= {max_hamming}
    """


def duplicate_clusters(df: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text", n: int = 3,
                       num_hashes: int = 64, bands: int = 8,
                       threshold_bp: int = 7000,
                       max_iter: int = 20) -> DataFrame:
    """Near-duplicate CLUSTERS: connected components over the MinHash-LSH
    candidate pairs — the keep-one-per-cluster shape production dedup uses
    (pairwise victim-picking deletes both b→a and c→b, clustering keeps
    exactly one representative per transitive group).

    Algorithm: min-label propagation to a fixpoint. Each iteration is one
    join + one aggregate — label(v) ← min(label(v), min label among v's
    neighbours) — and converges in O(component diameter) iterations. LSH
    duplicate components are near-cliques (every member shares band
    buckets with most others), so the diameter is tiny; the synthetic
    corpus and real near-dup graphs converge in 2-4 rounds. Per round the
    driver runs ONE metadata-sized count action for the convergence check;
    everything data-sized stays in joins/aggregates (the MapReduce
    connected-components pattern; for adversarially long chain graphs the
    large-star/small-star variant halves rounds, not needed for the
    near-clique shape LSH emits).

    Returns (doc_id, cluster_id, cluster_size) for every doc in a
    duplicate cluster (size ≥ 2); cluster_id = the cluster's min doc_id.
    """
    pairs = minhash_lsh_pairs(df, id_col, text_col, n, num_hashes, bands,
                              threshold_bp)
    labels = connected_component_labels(pairs, max_iter=max_iter)
    sizes = labels.groupBy("lbl").agg(F.count("*").alias("cluster_size"))
    return (labels.join(sizes, "lbl")
            .select(F.col("id").alias(id_col),
                    F.col("lbl").alias("cluster_id"),
                    F.col("cluster_size")))


def connected_component_labels(pairs: DataFrame, id_a: str = "id_a",
                               id_b: str = "id_b",
                               max_iter: int = 20,
                               algo: str = "minlabel") -> DataFrame:
    """(id, lbl) for every id in ``pairs``; lbl = the component's min id.

    ``algo="minlabel"`` (default): min-label propagation to a fixpoint —
    one join + one aggregate per round, converging in O(component
    diameter) rounds. LSH near-dup components are near-cliques (diameter
    2-4), so this is the right default for the dedup family.

    ``algo="star"``: alternating large-star/small-star contraction
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC'14) — converges in O(log² n) rounds regardless of diameter, the
    scale path for adversarially CHAIN-shaped graphs (crawl mirror chains)
    where min-label would need diameter rounds (VERDICT r03 next #5). Same
    output contract, pinned equal by tests on both shapes.

    Either way the returned frame is localCheckpoint'ed (pairs-sized),
    cutting the loop lineage and releasing the iteration caches; a
    non-converged loop raises loudly rather than returning silently-split
    components."""
    if algo == "star":
        return _cc_star_labels(pairs, id_a, id_b, max_iter)
    edges = pairs.select(F.col(id_a).alias("s"), F.col(id_b).alias("d"))
    # persist the (tiny, pairs-sized) edge set ONCE: every propagation
    # round joins it, and without the cache each round would recompute the
    # caller's whole candidate-pair pipeline
    edges = edges.unionAll(edges.select(F.col("d").alias("s"),
                                        F.col("s").alias("d"))).persist()
    # per-round labels are localCheckpoint'ed (eager), NOT just persisted:
    # each round's plan references the previous labels twice (neighbor join
    # + carry join), so an un-cut lineage DOUBLES per round and OOMs the
    # driver's plan analysis once rounds reach the teens (observed on a
    # deep-path graph); checkpointing truncates the plan to a block scan
    labels = (edges.select(F.col("s").alias("id")).distinct()
              .withColumn("lbl", F.col("id")).localCheckpoint(eager=True))
    changed = -1
    # try/finally: a Spark action failing mid-loop (executor loss, OOM)
    # must not leak the persisted edge blocks for the life of a long
    # stream (ADVICE r03 #4)
    try:
        for _ in range(max_iter):
            nbr = (edges.join(labels, edges["d"] == labels["id"])
                   .groupBy("s").agg(F.min("lbl").alias("nlbl")))
            new = (labels.join(nbr, labels["id"] == nbr["s"], "left")
                   .select(labels["id"],
                           F.least("lbl", F.coalesce("nlbl", "lbl")).alias("lbl"))
                   .localCheckpoint(eager=True))
            changed = (new.alias("n")
                       .join(labels.alias("o"), F.col("n.id") == F.col("o.id"))
                       .where(F.col("n.lbl") != F.col("o.lbl")).count())
            labels = new
            if changed == 0:
                break
        if changed != 0:
            # never return silently-split components (a >max_iter-radius
            # chain would diverge from the exact recursive-closure oracle
            # with no signal) — fail loudly; callers raise max_iter or
            # switch to algo="star" for pathological chain graphs
            raise RuntimeError(
                f"connected_component_labels did not converge in {max_iter} "
                f"rounds ({changed} labels still moving); raise max_iter or "
                f"use algo='star'")
        return labels
    finally:
        edges.unpersist()


def _cc_star_labels(pairs: DataFrame, id_a: str, id_b: str,
                    max_iter: int) -> DataFrame:
    """Alternating large-star/small-star connected components.

    Edge set kept UNDIRECTED-normalized as (l, g) with l < g. Per round:

    - **large-star**: every node u connects its strictly-larger neighbors
      to m(u) = min(Γ(u) ∪ {u}) — emitted from both adjacency directions,
      re-normalized, deduped;
    - **small-star**: over parent pointers (g → l), every node g connects
      its smaller neighbors AND itself to m(g) = min of those neighbors.

    Both steps are a groupBy-min + join — the same shuffle shape as one
    min-label round — but the edge set contracts toward stars in O(log² n)
    rounds on any graph (each round at least halves tree heights), where
    min-label needs O(diameter). Convergence = the normalized edge set is
    a fixpoint (one full-outer-join count per round, metadata-sized
    result); the final set is a union of stars rooted at component minima,
    so labels read directly off the edges."""
    # each round's edge set is localCheckpoint'ed (eager): the loop body
    # references the previous set several times, so plain persist() keeps a
    # lineage that DOUBLES per round and OOMs the driver's plan analysis
    # after ~14 rounds (observed on the 10k-path test); checkpointing cuts
    # the plan to a scan of the materialized blocks
    e = (pairs.select(F.least(id_a, id_b).alias("l"),
                      F.greatest(id_a, id_b).alias("g"))
         .where(F.col("l") != F.col("g")).distinct()
         .localCheckpoint(eager=True))
    converged = False
    for _ in range(max_iter):
        # large-star over both adjacency directions
        both = e.select(F.col("l").alias("u"), F.col("g").alias("v")) \
            .unionAll(e.select(F.col("g").alias("u"),
                               F.col("l").alias("v")))
        mins = (both.groupBy("u").agg(F.min("v").alias("mn"))
                .select("u", F.least("mn", "u").alias("m")))
        large = (both.join(mins, "u")
                 .where(F.col("v") > F.col("u"))
                 .select(F.least("v", "m").alias("l"),
                         F.greatest("v", "m").alias("g"))
                 .where(F.col("l") != F.col("g")).distinct())
        # small-star over parent pointers g -> l (l < g by invariant):
        # m(g) = min smaller-neighbor; connect every smaller neighbor
        # and g itself to it
        mins2 = large.groupBy("g").agg(F.min("l").alias("m"))
        j = large.join(mins2, "g")
        small = (
            j.select(F.least("l", "m").alias("l"),
                     F.greatest("l", "m").alias("g"))
            .unionAll(j.select(F.col("m").alias("l"), "g").distinct())
            .where(F.col("l") != F.col("g")).distinct()
            .localCheckpoint(eager=True))
        # fixpoint check: symmetric difference empty (ONE count action)
        diff = (e.withColumn("_a", F.lit(1))
                .join(small.withColumn("_b", F.lit(1)), ["l", "g"],
                      "full_outer")
                .where(F.col("_a").isNull() | F.col("_b").isNull())
                .count())
        e = small
        if diff == 0:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"star connected components did not converge in {max_iter} "
            f"rounds; raise max_iter")
    # stars rooted at component minima: non-roots are the g side with
    # their unique l partner; roots label themselves. Ids appearing ONLY
    # in self-pairs (x, x) were dropped by the l != g normalization — the
    # contract is "(id, lbl) for EVERY id in pairs" (minlabel keeps them),
    # so they rejoin as their own singleton labels (code-review r04 #4)
    labels = (e.select(F.col("g").alias("id"), F.col("l").alias("lbl"))
              .unionAll(e.select(F.col("l").alias("id"),
                                 F.col("l").alias("lbl")))
              .groupBy("id").agg(F.min("lbl").alias("lbl")))
    all_ids = (pairs.select(F.col(id_a).alias("id"))
               .unionAll(pairs.select(F.col(id_b).alias("id"))).distinct())
    labels = (all_ids.join(labels, "id", "left")
              .select("id", F.coalesce("lbl", "id").alias("lbl")))
    return labels.localCheckpoint(eager=True)


def _cc_closure_cte(pairs_sql: str) -> str:
    """Recursive-CTE transitive closure over an (id_a, id_b) pair query:
    CTE chain ending in cc_lbl(id, cluster_id). UNION (not UNION ALL)
    dedups the reachability set, so the recursion terminates; cc_-prefixed
    names never collide with the pair SQL's own WITH names (DuckDB binds
    nested same-named CTEs to the OUTER one)."""
    return f"""cc_p AS ({pairs_sql}),
        cc_e AS (SELECT id_a AS s, id_b AS d FROM cc_p
                 UNION SELECT id_b, id_a FROM cc_p),
        cc_reach(id, r) AS (
            SELECT s, s FROM cc_e
            UNION
            SELECT cc_e.s, cc_reach.r FROM cc_e
            JOIN cc_reach ON cc_e.d = cc_reach.id
        ),
        cc_lbl AS (SELECT id, MIN(r) AS cluster_id FROM cc_reach GROUP BY id)"""


def connected_components_sql(pairs_sql: str, id_alias: str = "id") -> str:
    """(id AS <id_alias>, cluster_id, cluster_size) for every id in the
    pair query — the DuckDB twin of ``connected_component_labels``."""
    return f"""
        WITH RECURSIVE {_cc_closure_cte(pairs_sql)},
        cc_sz AS (SELECT cluster_id, COUNT(*) AS cluster_size
                  FROM cc_lbl GROUP BY cluster_id)
        SELECT cc_lbl.id AS {id_alias}, cc_lbl.cluster_id, cc_sz.cluster_size
        FROM cc_lbl JOIN cc_sz USING (cluster_id)
    """


def cc_victims_sql(pairs_sql: str) -> str:
    """Every non-min member of a component (the cluster sweep's victims)."""
    return f"""
        WITH RECURSIVE {_cc_closure_cte(pairs_sql)}
        SELECT id FROM cc_lbl WHERE id <> cluster_id
    """


def duplicate_clusters_sql(n: int = 3, num_hashes: int = 64, bands: int = 8,
                           threshold_bp: int = 7000,
                           table: str = "documents",
                           id_col: str = "doc_id") -> str:
    """DuckDB twin: same LSH pairs, shared recursive-closure emitter."""
    pairs = minhash_lsh_pairs_sql(n, num_hashes, bands, threshold_bp,
                                  table=table, id_col=id_col)
    return connected_components_sql(pairs, id_alias=id_col)
