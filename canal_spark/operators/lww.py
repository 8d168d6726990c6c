"""Net-effect computation: per-key last-writer-wins (LWW) collapse.

The reference guarantees per-key apply order by hashing every single-row DML
into one of N *serial* executors (client-adapter/rdb/.../RdbSyncService.java:
179-196, 489-510) — order comes from serial execution. Spark re-establishes
it declaratively: because every change event carries a *full row image*, the
net effect of any event sequence for a key is exactly its **latest** event:

    I→U→…→U  ⇒ upsert(last after)      U→D ⇒ delete
    D→I      ⇒ upsert(last after)      I→D ⇒ delete (no-op if absent)

so one `groupBy(key).agg(max_by(change, lsn))` — a single shuffle with
map-side partial aggregation — replaces the serial executors. PK-changing
UPDATEs (before.doc_id ≠ after.doc_id) are first split into DELETE(old key) +
UPSERT(new key), the reference's delete+insert treatment
(RdbSyncService.java:446-469).

Skew (hot doc_ids at 10^10 scale): `max_by` is an algebraic aggregate, so
Spark's hash aggregate already combines map-side — each upstream partition
emits at most ONE row per hot key into the shuffle, which is the same
two-phase "salted" collapse one would hand-write. `collapse_lww` therefore
defaults to the plain aggregate; an explicit salt stage is available for the
window-function variant and for demonstration/benchmarks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def changes_from_events(events: DataFrame, key: str = "doc_id",
                        data_cols: list[str] | None = None) -> DataFrame:
    """Explode subscribed ROWDATA DML events into per-key change rows.

    Input: filtered events with ``before``/``after`` structs, ``event_type``
    in (INSERT/UPDATE/DELETE) and an ``lsn`` column.
    Output columns: key, *data_cols, op ('U'|'D'), lsn — one row per affected
    key (an UPDATE that moves the primary key yields two rows).
    """
    data_cols = data_cols or ["doc_id", "tokens", "n_tok", "source"]
    dml = events.where(F.col("entry_type") == "ROWDATA").where(
        F.col("event_type").isin("INSERT", "UPDATE", "DELETE")
        & ~F.coalesce(F.col("is_ddl"), F.lit(False))
    )

    after_cols = [F.col(f"after.{c}").alias(c) for c in data_cols if c != key]
    upserts = dml.where(F.col("event_type").isin("INSERT", "UPDATE")).select(
        F.col(f"after.{key}").alias(key), *after_cols,
        F.lit("U").alias("op"), F.col("lsn"),
    )
    null_cols = [F.lit(None).cast(dml.schema["after"].dataType[c].dataType).alias(c)
                 for c in data_cols if c != key]
    deletes = dml.where(
        (F.col("event_type") == "DELETE")
        | (
            (F.col("event_type") == "UPDATE")
            & (F.col(f"before.{key}") != F.col(f"after.{key}"))
        )
    ).select(
        F.col(f"before.{key}").alias(key), *null_cols,
        F.lit("D").alias("op"), F.col("lsn"),
    )
    return upserts.unionByName(deletes)


def collapse_lww(changes: DataFrame, key: str = "doc_id",
                 salt_partitions: int | None = None) -> DataFrame:
    """One row per key: the change with the greatest LSN.

    `max_by(struct, lsn)` hash-aggregates with map-side combine (partial
    `max_by` before the shuffle), so hot keys cost one row per upstream
    partition — skew-safe by construction. ``salt_partitions`` forces an
    explicit two-phase variant (groupBy(key, salt) then groupBy(key)) for
    benchmarking the equivalence.
    """
    payload = F.struct(*[c for c in changes.columns if c != key])
    if salt_partitions:
        salt = F.pmod(F.xxhash64(F.col("lsn")), F.lit(salt_partitions))
        partial = (
            changes.withColumn("_salt", salt)
            .groupBy(key, "_salt")
            .agg(F.max_by(payload, F.col("lsn")).alias("_c"))
        )
        final = partial.groupBy(key).agg(
            F.max_by(F.col("_c"), F.col("_c.lsn")).alias("_c")
        )
    else:
        final = changes.groupBy(key).agg(
            F.max_by(payload, F.col("lsn")).alias("_c")
        )
    other = [c for c in changes.columns if c != key]
    return final.select(key, *[F.col(f"_c.{c}").alias(c) for c in other])


def collapse_lww_window(changes: DataFrame, key: str = "doc_id") -> DataFrame:
    """Window-function variant (row_number over lsn desc) — kept for parity
    tests; the aggregate variant above is the production path (no full sort,
    map-side combine)."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(key).orderBy(F.col("lsn").desc())
    return (
        changes.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
