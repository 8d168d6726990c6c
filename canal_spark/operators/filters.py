"""Envelope filters — the cheap gate *ahead of* expensive work.

The reference applies its regex table filter and DML-type flags before the
deep row decode (AviaterRegexFilter.filter applied at
parse/.../LogEventConvert.java:466-473 and sink-side
sink/.../entry/EntryEventSink.doFilter:159-174; DML-type skip flags
parse/.../mysql/MysqlMultiStageCoprocessor.java:276-298). We keep the same
structural ordering: these are plain Catalyst predicates on envelope columns,
pushed into the parquet scan (PushedFilters), so filtered events are never
decoded, shuffled, or merged.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def envelope_filter(
    df: DataFrame,
    table_regex: str | None = r"^train\.tokseq$",
    table_black_regex: str | None = None,
    include_ops: list[str] | None = None,
    exclude_ops: list[str] | None = None,
    drop_ddl: bool = False,
    drop_query: bool = True,
    rowdata_only: bool = False,
) -> DataFrame:
    """Filter the raw event stream by envelope columns only.

    - ``table_regex`` / ``table_black_regex``: white/black regex over
      "schema.table" (AviaterRegexFilter analog).
    - ``include_ops`` / ``exclude_ops``: DML-type gate
      (filterDmlInsert/Update/Delete analog).
    - ``drop_ddl`` / ``drop_query``: QUERY/DDL/DCL flags
      (LogEventConvert.java:98-104 analog).
    """
    cond: Column = F.lit(True)
    full_name = F.concat_ws(".", F.col("schema_name"), F.col("table_name"))
    if table_regex:
        cond = cond & full_name.rlike(table_regex)
    if table_black_regex:
        cond = cond & ~full_name.rlike(table_black_regex)
    if include_ops:
        cond = cond & (
            F.col("event_type").isin(include_ops)
            | (F.col("entry_type") != "ROWDATA")
            | F.col("is_ddl")
        )
    if exclude_ops:
        cond = cond & (
            ~F.col("event_type").isin(exclude_ops)
            | (F.col("entry_type") != "ROWDATA")
            | F.col("is_ddl")
        )
    if drop_ddl:
        cond = cond & ~F.coalesce(F.col("is_ddl"), F.lit(False))
    if drop_query:
        cond = cond & (F.col("event_type") != "QUERY")
    if rowdata_only:
        cond = cond & (F.col("entry_type") == "ROWDATA")
    return df.where(cond)


def field_projection(df: DataFrame, image_col: str,
                     keep_fields: list[str]) -> DataFrame:
    """Per-table field whitelist — drops struct fields from an image column
    (LogEventConvert.needField analog, :1007-1014). Struct rebuild stays
    JVM-side via withField-free reconstruction."""
    struct = F.struct(*[F.col(f"{image_col}.{f}").alias(f) for f in keep_fields])
    return df.withColumn(
        image_col, F.when(F.col(image_col).isNotNull(), struct)
    )
