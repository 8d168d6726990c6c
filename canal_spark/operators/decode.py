"""Wire-format codec: the row-decode stage (LogEventConvert analog).

The reference decodes binlog ROW events into typed column values using a
*live* schema registry, because the wire bytes carry only column positions
(parse/.../dbsync/LogEventConvert.parseRowsEvent:523-603 +
RowsLogBuffer.fetchValue:104-276). The Spark-native equivalent keeps the
row images as a dynamic wire payload (JSON strings) in the event log and
decodes them per micro-batch with ``from_json`` against the SchemaTracker's
*current* schema — JVM-side, whole-stage-codegen'd, no per-row Python. This
is what makes streaming schema evolution possible: the stream's source
schema is fixed (strings) while the decoded shape follows the DDL history.

``to_wire``/``decode_images`` are exact inverses for the supported types, so
the typed fixtures and the wire fixtures replay to identical final states
(tested in tests/test_streaming.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

WIRE_IMAGE_COLS = ("before", "after")

# Spark's default JSON timestampFormat truncates to milliseconds; MySQL
# DATETIME(6)/TIMESTAMP(6) carry microseconds and the reference preserves
# them (LogEventConvert time kernel) — force full µs fidelity on the wire
_JSON_OPTS = {"timestampFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"}


def to_wire(df: DataFrame, key: str = "doc_id") -> DataFrame:
    """Typed event log → wire shape: before/after become JSON strings, and
    the row key rides as native ``pk_before``/``pk_after`` envelope columns
    (the FlatMessage pkNames/data split) so downstream never has to probe
    the JSON just to route by key."""
    out = df
    for c in WIRE_IMAGE_COLS:
        dt = df.schema[c].dataType
        if isinstance(dt, T.StructType) and key in dt.fieldNames():
            out = out.withColumn(f"pk_{c}", F.col(f"{c}.{key}"))
        out = out.withColumn(c, F.to_json(F.col(c), _JSON_OPTS))
    return out


def tolerant_wire_schema(image_schema: T.StructType) -> T.StructType:
    """Wire-tolerant decode schema: scalar fields decode as STRING, to be
    cast to the declared type afterwards. Rationale: the FlatMessage model
    quotes EVERY value, and `from_json` NULLs a quoted numeric under a
    numeric field instead of coercing — while it does coerce an unquoted
    JSON number to its text under a STRING field, so both quoting
    conventions land in the same string. Strings stay strings; binary keeps
    BinaryType (from_json base64-decodes it — a post-hoc string cast would
    wrongly take the UTF-8 bytes of the base64 TEXT); containers keep their
    shape (JSON arrays are unambiguous)."""
    keep = (T.StringType, T.BinaryType, T.ArrayType, T.MapType, T.StructType)
    return T.StructType([
        f if isinstance(f.dataType, keep)
        else T.StructField(f.name, T.StringType(), True)
        for f in image_schema.fields
    ])


def decode_images(df: DataFrame, image_schema: T.StructType) -> DataFrame:
    """Wire shape → typed: vectorized JSON decode with the live schema.

    Columns absent from ``image_schema`` are dropped (field projection at
    decode time — LogEventConvert.needField analog); columns present in the
    schema but missing from the payload decode to NULL (post-ADD-COLUMN
    backfill semantics). Exact inverse of ``to_wire`` for every type the
    DDL kernel emits (tests/test_decode_types.py)."""
    out = df
    for c in WIRE_IMAGE_COLS:
        out = out.withColumn(c, F.from_json(F.col(c), image_schema, _JSON_OPTS))
    return out


def wire_schema(envelope: T.StructType) -> T.StructType:
    """The fixed streaming-source schema: image columns as strings."""
    fields = [
        T.StructField(f.name, T.StringType() if f.name in WIRE_IMAGE_COLS else f.dataType, True)
        for f in envelope.fields
    ]
    return T.StructType(fields)


def convert_log_to_wire(spark, typed_dir: str, wire_dir: str) -> list[str]:
    """Rewrite a typed fixture log as wire segments (one file per segment,
    preserving names/order). Used to build streaming fixtures."""
    import glob
    import os

    os.makedirs(wire_dir, exist_ok=True)
    names = sorted(
        os.path.basename(p)
        for p in glob.glob(os.path.join(typed_dir, "mysql-bin.*.parquet"))
    )
    for name in names:
        df = spark.read.parquet(os.path.join(typed_dir, name))
        to_wire(df).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(wire_dir, "_tmp_" + name)
        )
        # collapse the directory-parquet into a single stable file name
        tmp = os.path.join(wire_dir, "_tmp_" + name)
        part = next(
            f for f in os.listdir(tmp) if f.endswith(".parquet")
        )
        os.replace(os.path.join(tmp, part), os.path.join(wire_dir, name))
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)
    return names
