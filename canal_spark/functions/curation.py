"""Corpus-curation operators the training-data mandate owes beyond dedup:
sequence packing, benchmark-contamination checking, deterministic mixture
sampling, and vocabulary statistics.

The reference has no counterpart (Canal stops at the sink); these are the
operations a pretraining pipeline runs over the CDC-maintained tokenized
corpus before a training job reads it. Every quantity is integer-valued and
md5-derived where pseudo-randomness is needed (canal_spark/functions/hashing
— portable across Spark and DuckDB), so each operator has a value-exact
oracle twin.

Scale notes (the designs below are chosen for 10^10-row corpora):

- ``pack_assignments`` is a distributed prefix sum. A single
  ``Window.orderBy(doc_id)`` with no partition key is ONE reducer — the
  whole corpus flows through one task at 100 TB. Instead: shard by a
  key-derived, order-consistent prefix, take per-shard token totals (a
  metadata-sized collect), turn them into per-shard base offsets
  driver-side, and run the cumulative sum as a per-shard window. Output is
  independent of the shard layout.
- ``pack_chunks`` explodes each doc into the ≤ 1 + n_tok/seq_len packs it
  spans and shuffles by pack id — linear in input tokens, no global sort of
  token data (only the narrow (id, n_tok) projection flows through the
  prefix-sum shuffle).
- ``benchmark_contamination`` broadcasts the benchmark n-gram set: eval
  benchmarks are MBs even when the corpus is 100 TB. The document side is
  one scan + one hash aggregate.
- ``mixture_sample_counts`` / ``vocab_top_terms`` are scan → hash-agg with
  map-side partial aggregation; top-k is a bounded TakeOrdered.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from canal_spark.functions import hashing
from canal_spark.functions.dedup import _shingles_expr, word_shingles_sql
from canal_spark.functions.text import TOKEN_REGEX

# ------------------------------------------------------------------ packing


def pack_assignments(df: DataFrame, seq_len: int, id_col: str = "doc_id",
                     ntok_col: str = "n_tok",
                     shards: int | None = None,
                     suffix_chars: int = 2) -> DataFrame:
    """Concat-and-chunk packing plan: docs are concatenated in ``id_col``
    order and chunked into fixed ``seq_len`` training sequences; returns one
    row per doc with its global token offset and the pack range it spans
    (pack_first..pack_last).

    Distributed prefix sum (see module docstring) with shards that are a
    DETERMINISTIC PURE FUNCTION of each row's key: the id prefix of length
    (corpus common-prefix + ``suffix_chars``). Prefix truncation is
    order-consistent (a < b ⇒ prefix(a) ≤ prefix(b)), so per-shard base
    offsets accumulated in shard order + a per-shard cumulative-sum window
    compose to the exact global prefix sum.

    Why not ``repartitionByRange`` + ``spark_partition_id``: the range
    partitioner re-SAMPLES its bounds in every job, and when the upstream
    lineage contains a shuffle (e.g. a lake-table read with a merge-on-read
    fold) intra-partition row order is not stable across jobs — the totals
    pass and the window pass then disagree on shard membership and the
    offsets silently break (observed on a replayed-corpus lineage; the
    key-derived shard cannot disagree with itself). The common prefix comes
    from one min/max aggregate; shard count is bounded by the id alphabet
    to the ``suffix_chars`` power (collect stays metadata-sized) while
    splitting any corpus whose keys diverge right after the shared prefix.

    Integral ids shard by range instead — ``(id - min) div width`` with
    width sized for ~``shards`` shards off the same min/max aggregate
    (decimal-string prefixes of ints are NOT order-consistent: "10" < "2");
    ``shards`` applies ONLY to integral ids — string ids size their shards
    with ``suffix_chars``. Zero-token docs are excluded (they occupy no
    pack).

    The narrow (id, n_tok) projection is persisted across the two driver
    aggregates (min/max, per-shard totals) and released before the output
    plan builds: the upstream lineage (e.g. a full tokenization) executes
    twice — once cached for both metadata passes, once for the output job —
    never three times.
    """
    import os as _os

    from pyspark.sql import types as T

    spark = df.sparkSession
    d = (
        df.where(F.col(ntok_col) > 0)
        .select(F.col(id_col).alias("id"),
                F.col(ntok_col).cast("long").alias("n_tok"))
    )
    id_type = d.schema["id"].dataType
    if not isinstance(id_type, (T.StringType, T.ByteType, T.ShortType,
                                T.IntegerType, T.LongType)):
        raise TypeError(f"pack_assignments: unsupported id type {id_type}")
    d = d.persist()
    mn, mx = d.agg(F.min("id"), F.max("id")).first()
    if isinstance(id_type, T.StringType):
        cp = len(_os.path.commonprefix([mn or "", mx or ""]))
        k = cp + max(1, int(suffix_chars))
        shard_expr = F.substring("id", 1, k)
        shard_sort_key = str
    elif isinstance(id_type, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        n_target = shards or 4 * spark.sparkContext.defaultParallelism
        width = max(1, ((int(mx) - int(mn)) // n_target) + 1) if mn is not None else 1
        shard_expr = F.expr(f"(id - {int(mn) if mn is not None else 0}) div {width}")
        shard_sort_key = int
    totals = {r["_shard"]: r["t"] for r in
              d.select(shard_expr.cast("string").alias("_shard"), "n_tok")
              .groupBy("_shard").agg(F.sum("n_tok").alias("t")).collect()}
    # both metadata passes are done; the output job below recomputes the
    # narrow projection once rather than pinning executor storage for the
    # caller's whole downstream lifetime (round-1 persist-leak lesson)
    d = d.unpersist(blocking=False)
    d = d.withColumn("_shard", shard_expr.cast("string"))
    base_rows, running = [], 0
    for shard in sorted(totals, key=shard_sort_key):
        base_rows.append((shard, running))
        running += int(totals[shard])
    base = spark.createDataFrame(base_rows or [("", 0)],
                                 "_shard string, _base long")
    w = (Window.partitionBy("_shard").orderBy("id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    seq = int(seq_len)
    out = (
        d.join(F.broadcast(base), "_shard")
        .withColumn("_cum", F.sum("n_tok").over(w))
        .select(
            F.col("id").alias(id_col), "n_tok",
            (F.col("_base") + F.col("_cum") - F.col("n_tok")).alias("start_off"),
        )
        # non-negative operands: `div` (truncating) == floor division,
        # identical to DuckDB's `//`
        .withColumn("pack_first", F.expr(f"start_off div {seq}"))
        .withColumn("pack_last", F.expr(f"(start_off + n_tok - 1) div {seq}"))
    )
    return out.withColumn(
        "n_packs", F.col("pack_last") - F.col("pack_first") + F.lit(1).cast("long"))


def pack_assignments_sql(seq_len: int, table: str = "documents",
                         id_col: str = "doc_id") -> str:
    """DuckDB twin over the raw text table: n_tok = BPE-ish regex token
    count (the same TOKEN_REGEX as text.token_count's verified oracle);
    the prefix sum is a plain window — the oracle runs at sf0.01, not 100 TB.
    """
    seq = int(seq_len)
    return rf"""
        WITH t AS (
            SELECT {id_col},
                   CAST(len(regexp_extract_all(text, '{TOKEN_REGEX}')) AS BIGINT) AS n_tok
            FROM {table}
        ),
        c AS (
            -- DuckDB SUM(BIGINT) widens to HUGEINT (which pandas degrades
            -- to float); cast back so every column stays int64 like Spark's
            SELECT {id_col}, n_tok,
                   CAST(SUM(n_tok) OVER (ORDER BY {id_col}
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   - n_tok AS BIGINT) AS start_off
            FROM t WHERE n_tok > 0
        )
        SELECT {id_col}, n_tok, start_off,
               CAST(start_off // {seq} AS BIGINT) AS pack_first,
               CAST((start_off + n_tok - 1) // {seq} AS BIGINT) AS pack_last,
               CAST((start_off + n_tok - 1) // {seq}
                    - start_off // {seq} + 1 AS BIGINT) AS n_packs
        FROM c
    """


def pack_chunks(df: DataFrame, seq_len: int, id_col: str = "doc_id",
                tokens_col: str = "tokens",
                shards: int | None = None) -> DataFrame:
    """Materialized training sequences: concatenate token arrays in id order
    and emit one row per ``seq_len`` chunk (the final pack may be shorter).

    Only (id, n_tok) flows through the prefix-sum shuffle; token arrays join
    back by id and each doc explodes into just the packs it spans, so the
    heavy columns move exactly once, partitioned by pack id.
    """
    src = df.select(F.col(id_col).alias("id"), F.col(tokens_col).alias("toks"))
    a = pack_assignments(
        src.select("id", F.size("toks").alias("n_tok")),
        seq_len, id_col="id", shards=shards)
    seq = F.lit(int(seq_len)).cast("long")
    j = a.join(src, "id")
    lo = F.greatest(F.col("pack_id") * seq, F.col("start_off"))
    hi = F.least((F.col("pack_id") + 1) * seq, F.col("start_off") + F.col("n_tok"))
    pieces = (
        j.withColumn("pack_id", F.explode(F.sequence("pack_first", "pack_last")))
        .select(
            "pack_id", lo.alias("lo"),
            F.slice(
                "toks",
                (lo - F.col("start_off") + 1).cast("int"),
                (hi - lo).cast("int"),
            ).alias("piece"),
        )
    )
    return (
        pieces.groupBy("pack_id")
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("lo", "piece"))),
                    lambda x: x["piece"],
                )
            ).alias("tokens")
        )
        .withColumn("n_tok", F.size("tokens"))
    )


# ------------------------------------------------------- contamination check


def benchmark_contamination(df: DataFrame, id_col: str = "doc_id",
                            text_col: str = "text", n: int = 3,
                            bench_mod: int = 20,
                            bench_col: str | None = None) -> DataFrame:
    """Benchmark-contamination score per eval document: the fraction (basis
    points) of a doc's distinct word n-grams that appear anywhere in the
    benchmark slice. The pretraining decontamination pass: docs overlapping
    the eval set are flagged before training.

    The benchmark slice is a deterministic md5-tagged subsample
    (h60('bench:'||id) % bench_mod == 0 — portable, so the oracle twins
    value-for-value); pass ``bench_col`` (a boolean column) to supply an
    explicit membership flag instead. The benchmark n-gram set is DISTINCT
    and broadcast — real eval benchmarks are MBs regardless of corpus size;
    the doc side stays one scan + one hash aggregate.
    """
    if bench_col is None:
        tag = F.pmod(
            hashing.h60(F.concat(F.lit("bench:"), F.col(id_col))),
            F.lit(bench_mod)) == 0
        tagged = df.withColumn("_bench", tag)
    else:
        tagged = df.withColumn("_bench", F.col(bench_col))
    bench_grams = (
        tagged.where(F.col("_bench"))
        # inline explode — see dedup._shingles_expr on InferFiltersFromGenerate
        .select(F.explode(_shingles_expr(text_col, n)).alias("s"))
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    ev = tagged.where(~F.col("_bench"))
    ex = ev.select(F.col(id_col).alias("id"),
                   F.explode(_shingles_expr(text_col, n)).alias("s"))
    agg = (
        ex.join(F.broadcast(bench_grams), "s", "left")
        .groupBy("id")
        .agg(F.count("*").alias("n_shingles"),
             F.count("_hit").alias("n_hits"))
    )
    return (
        ev.select(F.col(id_col).alias("id"))
        .join(agg, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("n_shingles", F.lit(0)).cast("long").alias("n_shingles"),
            F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
            F.when(
                F.coalesce("n_shingles", F.lit(0)) > 0,
                F.floor(F.coalesce("n_hits", F.lit(0)) * 10000
                        / F.col("n_shingles")),
            ).otherwise(F.lit(0)).cast("long").alias("contam_bp"),
        )
    )


def benchmark_contamination_sql(n: int = 3, bench_mod: int = 20,
                                table: str = "documents",
                                id_col: str = "doc_id") -> str:
    bench_key = f"'bench:' || {id_col}"
    tag = f"({hashing.h60_sql(bench_key)} % {bench_mod} = 0)"
    return f"""
        WITH tagged AS (
            SELECT {id_col}, text, {tag} AS is_bench FROM {table}
        ),
        bg AS (
            SELECT DISTINCT unnest({word_shingles_sql(n)}) AS s
            FROM tagged WHERE is_bench
        ),
        ex AS (
            SELECT {id_col} AS id, unnest({word_shingles_sql(n)}) AS s
            FROM tagged WHERE NOT is_bench
        ),
        agg AS (
            SELECT ex.id, COUNT(*) AS n_shingles, COUNT(bg.s) AS n_hits
            FROM ex LEFT JOIN bg ON ex.s = bg.s
            GROUP BY ex.id
        )
        SELECT t.{id_col},
               COALESCE(n_shingles, 0) AS n_shingles,
               COALESCE(n_hits, 0) AS n_hits,
               CASE WHEN COALESCE(n_shingles, 0) > 0
                    THEN CAST(FLOOR(COALESCE(n_hits, 0) * 10000 / n_shingles)
                              AS BIGINT)
                    ELSE 0 END AS contam_bp
        FROM (SELECT {id_col} FROM tagged WHERE NOT is_bench) t
        LEFT JOIN agg ON agg.id = t.{id_col}
    """


# ---------------------------------------------------------- mixture sampling


def mixture_sample_counts(df: DataFrame, id_col: str = "doc_id",
                          source_col: str = "source",
                          text_col: str = "text") -> DataFrame:
    """Deterministic per-source mixture sampling: each source gets an
    md5-derived keep rate in [500, 9499] bp and each doc an md5-derived
    uniform draw — membership is a pure function of (source, doc_id), so the
    sample is reproducible on any engine and any cluster size (the property
    a training-data pipeline needs for resumable sampling). Returns per-
    source totals: docs seen/kept and kept token mass.

    One scan → one hash aggregate (map-side partial); no shuffle of
    documents, only of the 20ish per-source partials.
    """
    rate = (F.lit(500) + F.pmod(
        hashing.h60(F.concat(F.lit("rate:"), F.col(source_col))),
        F.lit(9000))).cast("long")
    draw = F.pmod(hashing.h60(F.concat(F.lit("samp:"), F.col(id_col))),
                  F.lit(10000))
    ntok = F.size(F.regexp_extract_all(
        F.col(text_col), F.lit(TOKEN_REGEX), 0)).cast("long")
    kept = draw < rate
    return (
        df.select(F.col(source_col).alias("source"), rate.alias("rate_bp"),
                  kept.alias("_k"), ntok.alias("_nt"))
        .groupBy("source", "rate_bp")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.when(F.col("_k"), 1).otherwise(0)).cast("long").alias("n_kept"),
            F.sum(F.when(F.col("_k"), F.col("_nt")).otherwise(0)).cast("long").alias("tok_kept"),
        )
    )


def mixture_sample_sql(table: str = "documents", id_col: str = "doc_id",
                       source_col: str = "source") -> str:
    rate_key = f"'rate:' || {source_col}"
    samp_key = f"'samp:' || {id_col}"
    rate = f"CAST(500 + ({hashing.h60_sql(rate_key)} % 9000) AS BIGINT)"
    draw = f"({hashing.h60_sql(samp_key)} % 10000)"
    return rf"""
        WITH t AS (
            SELECT {source_col} AS source,
                   {rate} AS rate_bp,
                   {draw} AS u,
                   CAST(len(regexp_extract_all(text, '{TOKEN_REGEX}')) AS BIGINT) AS nt
            FROM {table}
        )
        SELECT source, rate_bp,
               COUNT(*) AS n_docs,
               CAST(SUM(CASE WHEN u < rate_bp THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
               CAST(SUM(CASE WHEN u < rate_bp THEN nt ELSE 0 END) AS BIGINT) AS tok_kept
        FROM t GROUP BY source, rate_bp
    """


# ------------------------------------------------------------ vocab statistics


def vocab_top_terms(df: DataFrame, k: int = 100, id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """Top-k vocabulary terms by occurrence (BPE-ish regex tokens), with
    document frequency — the corpus-statistics pass a tokenizer-training or
    quality-debug job runs. Ties break by term ascending, so the k-boundary
    is deterministic across engines.

    groupBy(term) partially aggregates map-side; the rank window runs AFTER
    limit(k) on k rows — never a global single-partition window over data.
    """
    ex = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.regexp_extract_all(
            F.col(text_col), F.lit(TOKEN_REGEX), 0)).alias("term"),
    )
    agg = ex.groupBy("term").agg(
        F.count("*").alias("n_occ"),
        F.countDistinct("id").alias("n_docs"),
    )
    top = agg.orderBy(F.desc("n_occ"), F.asc("term")).limit(int(k))
    w = Window.orderBy(F.desc("n_occ"), F.asc("term"))
    return top.select(
        F.row_number().over(w).cast("long").alias("rank"),
        "term", "n_occ", "n_docs",
    )


def vocab_top_terms_sql(k: int = 100, table: str = "documents",
                        id_col: str = "doc_id") -> str:
    return rf"""
        WITH ex AS (
            SELECT {id_col} AS id,
                   unnest(regexp_extract_all(text, '{TOKEN_REGEX}')) AS term
            FROM {table}
        ),
        a AS (
            SELECT term, COUNT(*) AS n_occ, COUNT(DISTINCT id) AS n_docs
            FROM ex GROUP BY term
        )
        SELECT CAST(ROW_NUMBER() OVER (ORDER BY n_occ DESC, term ASC) AS BIGINT) AS rank,
               term, n_occ, n_docs
        FROM a ORDER BY n_occ DESC, term ASC LIMIT {int(k)}
    """
