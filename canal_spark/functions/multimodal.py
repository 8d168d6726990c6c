"""Multimodal column plumbing: binary payloads + typed metadata.

Image/audio/video payloads are opaque ``binary`` columns with a metadata
struct; decode/feature-extraction runs as Arrow-batched ``mapInPandas``
(the only place Python touches data, in vectorized batches). The actual
codec step is STUBBED (no image/audio libs in this container) behind
``decode_stub`` — a deterministic fake that preserves the real Spark-side
contract: schema, batch iteration, partition-size independence.

At 100 TB the pattern is: binary columns stay in parquet (no JVM copy of
payload bytes into Python until the mapInPandas stage), partitioning by
size (`maxPartitionBytes`) keeps Arrow batches bounded, and feature columns
come back as plain typed columns the rest of the engine treats normally.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType([
    T.StructField("media_type", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("n_frames", T.IntegerType()),
])

FEATURE_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("media_type", T.StringType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("checksum64", T.LongType()),
    T.StructField("feat", T.ArrayType(T.FloatType())),
])


def attach_fake_media(df: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text") -> DataFrame:
    """Deterministic fake media: payload = utf8 bytes of the text, metadata
    derived from lengths. Real pipelines read these columns from parquet."""
    t = F.col(text_col)
    meta = F.struct(
        F.when(F.col(id_col) % 3 == 0, F.lit("image"))
        .when(F.col(id_col) % 3 == 1, F.lit("audio"))
        .otherwise(F.lit("video")).alias("media_type"),
        (F.length(t) % 640 + 16).cast("int").alias("width"),
        (F.length(t) % 480 + 16).cast("int").alias("height"),
        (F.length(t) % 30 + 1).cast("int").alias("n_frames"),
    )
    return df.select(
        F.col(id_col),
        F.encode(t, "utf-8").alias("payload"),
        meta.alias("media_meta"),
    )


def media_meta_plan(df: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """Flat typed-metadata projection for the fake media columns — the
    SQL-checkable face of ``attach_fake_media`` (same derivations, no
    binary/struct columns so any engine computes it identically)."""
    t = F.col(text_col)
    media_type = (
        F.when(F.col(id_col) % 3 == 0, F.lit("image"))
        .when(F.col(id_col) % 3 == 1, F.lit("audio"))
        .otherwise(F.lit("video"))
    )
    return df.select(
        F.col(id_col),
        media_type.alias("media_type"),
        (F.length(t) % 640 + 16).cast("long").alias("width"),
        (F.length(t) % 480 + 16).cast("long").alias("height"),
        (F.length(t) % 30 + 1).cast("long").alias("n_frames"),
        F.octet_length(t).cast("long").alias("n_bytes"),
    )


def media_meta_plan_sql() -> str:
    return """
        SELECT doc_id,
               CASE WHEN doc_id % 3 = 0 THEN 'image'
                    WHEN doc_id % 3 = 1 THEN 'audio'
                    ELSE 'video' END AS media_type,
               CAST(length(text) % 640 + 16 AS BIGINT) AS width,
               CAST(length(text) % 480 + 16 AS BIGINT) AS height,
               CAST(length(text) % 30 + 1 AS BIGINT) AS n_frames,
               CAST(strlen(text) AS BIGINT) AS n_bytes
        FROM documents
    """


def frame_sample_plan(df: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text", every_n: int = 5) -> DataFrame:
    """Frame-sampling plan straight off the documents table (video rows
    only): pure JVM sequence/explode, SQL-checkable."""
    t = F.col(text_col)
    n_frames = (F.length(t) % 30 + 1).cast("int")
    return (
        df.where(F.col(id_col) % 3 == 2)
        .select(
            F.col(id_col),
            F.explode(
                F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)),
                           F.lit(every_n))
            ).alias("frame_idx"),
        )
        .withColumn("frame_idx", F.col("frame_idx").cast("long"))
    )


def extract_features_sql() -> str:
    """DuckDB twin of the driver-facing columns of ``extract_features``:
    the payload is utf8(text), so md5-of-payload == md5(text) and the
    checksum is expressible without the binary column."""
    from canal_spark.functions.hashing import h60_sql

    return f"""
        SELECT doc_id,
               CASE WHEN doc_id % 3 = 0 THEN 'image'
                    WHEN doc_id % 3 = 1 THEN 'audio'
                    ELSE 'video' END AS media_type,
               CAST(strlen(text) AS BIGINT) AS n_bytes,
               {h60_sql('text')} AS checksum64
        FROM documents
    """


def frame_sample_plan_sql(every_n: int = 5) -> str:
    return f"""
        SELECT doc_id,
               CAST(unnest(generate_series(0,
                    GREATEST(length(text) % 30, 0), {every_n})) AS BIGINT)
                   AS frame_idx
        FROM documents WHERE doc_id % 3 = 2
    """


def decode_stub(payload: bytes) -> None:
    """Where a real codec (PIL/ffmpeg/torchaudio) would decode the payload.

    Deliberately unimplemented in this container — raising keeps the
    boundary honest; extract_features uses the deterministic fake below.
    """
    raise NotImplementedError(
        "media codecs unavailable in this environment; "
        "extract_features computes deterministic fake features instead"
    )


def extract_features(df: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """mapInPandas feature extraction over (doc_id, payload, media_meta).

    The stub computes byte-stats + an 8-dim deterministic 'embedding' from
    the payload; a real implementation swaps `_fake_features` for the codec
    while the Spark plumbing (Arrow batches, schema, partitioning) stays
    identical."""

    def _fake_features(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        import hashlib

        for pdf in it:
            payloads = pdf["payload"]
            n_bytes = payloads.map(lambda b: len(b) if b is not None else 0)
            checks, feats = [], []
            for b in payloads:
                arr = np.frombuffer(b or b"", dtype=np.uint8)
                # 60-bit md5 of the payload BYTES == hashing.h60 of the
                # source text (payload = utf8(text)), so the DuckDB oracle
                # can verify the checksum value-for-value
                checks.append(
                    int(hashlib.md5(bytes(b or b"")).hexdigest()[:15], 16))
                # 8 deterministic moments as the fake feature vector
                if len(arr):
                    f = [
                        float(arr.mean()), float(arr.std()),
                        float(arr.min()), float(arr.max()),
                        float(np.median(arr)), float(len(arr) % 251),
                        float(arr[0]), float(arr[-1]),
                    ]
                else:
                    f = [0.0] * 8
                feats.append(f)
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "media_type": pdf["media_meta"].map(
                    lambda m: m["media_type"] if m is not None else None
                ),
                "n_bytes": n_bytes.astype("int64"),
                "checksum64": pd.Series(checks, dtype="int64"),
                "feat": feats,
            })

    return df.mapInPandas(_fake_features, FEATURE_SCHEMA)


def frame_sample(df: DataFrame, every_n: int = 5) -> DataFrame:
    """Frame-sampling plan for video rows: explodes frame indices 0..n_frames
    step every_n as (doc_id, frame_idx) — pure JVM sequence/explode; the
    decode of each sampled frame would run in extract_features."""
    return (
        df.where(F.col("media_meta.media_type") == "video")
        .select(
            "doc_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.col("media_meta.n_frames") - 1, F.lit(0)),
                    F.lit(every_n),
                )
            ).alias("frame_idx"),
        )
    )
