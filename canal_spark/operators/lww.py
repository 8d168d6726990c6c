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
from pyspark.sql import types as T

# payload types whose to_json/from_json round trip is bit-exact — the
# packed fast path below is only taken when EVERY payload column qualifies
# (floating point / timestamps may not re-parse identically)
_JSON_EXACT = (T.StringType, T.IntegerType, T.LongType, T.ShortType,
               T.ByteType, T.BooleanType, T.BinaryType)


def _json_exact(dt: T.DataType) -> bool:
    if isinstance(dt, T.ArrayType):
        return _json_exact(dt.elementType)
    return isinstance(dt, _JSON_EXACT)


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

    Both formulations are one shuffle with map-side partial aggregation
    (algebraic max), so hot keys cost one row per upstream partition —
    skew-safe by construction. ``salt_partitions`` forces an explicit
    two-phase variant (groupBy(key, salt) then groupBy(key)).

    Fast path: ``max(lsn ∥ op ∥ to_json(payload))`` over ONE packed string
    — measured 3.6× faster than ``max_by(struct, lsn)`` at 1M events
    (PERF.md #12: an array-bearing struct forces SortAggregate with
    per-update struct copies; a flat string buffer is cheap). The packed
    string orders by lsn because the LSN prefix is fixed-width sortable
    and unique (lsn.py), and \\x01 separators cannot occur in lsn/op, so
    the split(limit=3) re-parse is unambiguous even if payload strings
    contain \\x01. Taken only when every payload column's JSON round trip
    is bit-exact (ints/strings/bools/binary/arrays thereof) — otherwise
    the typed ``max_by`` path runs (floats, timestamps, decimals).
    """
    other = [c for c in changes.columns if c != key]
    data_cols = [c for c in other if c not in ("op", "lsn")]
    types = {f.name: f.dataType for f in changes.schema.fields}

    if data_cols and all(_json_exact(types[c]) for c in data_cols):
        packed = F.concat_ws(
            "\x01", F.col("lsn"), F.col("op"),
            F.to_json(F.struct(*data_cols)),
        )
        if salt_partitions:
            salt = F.pmod(F.xxhash64(F.col("lsn")), F.lit(salt_partitions))
            partial = (
                changes.withColumn("_salt", salt)
                .groupBy(key, "_salt").agg(F.max(packed).alias("_p"))
            )
            final = partial.groupBy(key).agg(F.max("_p").alias("_p"))
        else:
            final = changes.groupBy(key).agg(F.max(packed).alias("_p"))
        parts = F.split(F.col("_p"), "\x01", 3)
        json_schema = T.StructType(
            [T.StructField(c, types[c], True) for c in data_cols])
        parsed = final.select(
            key,
            parts.getItem(0).alias("lsn"),
            parts.getItem(1).alias("op"),
            F.from_json(parts.getItem(2), json_schema).alias("_j"),
        )
        return parsed.select(
            key, *[F.col(f"_j.{c}").alias(c) if c in data_cols else F.col(c)
                   for c in other]
        )

    payload = F.struct(*other)
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
    return final.select(key, *[F.col(f"_c.{c}").alias(c) for c in other])


def _wire_dml(events: "DataFrame"):
    """ROWDATA DML rows of a wire-shaped event frame."""
    return events.where(F.col("entry_type") == "ROWDATA").where(
        F.col("event_type").isin("INSERT", "UPDATE", "DELETE")
        & ~F.coalesce(F.col("is_ddl"), F.lit(False))
    )


def _wire_key_of(dml: "DataFrame", key: str, img: str):
    # each envelope pk column is probed independently: a frame carrying
    # pk_after but not pk_before must not make k_of('before') reference
    # a missing column (AnalysisException) — ADVICE r02
    native = (F.col(f"pk_{img}") if f"pk_{img}" in dml.columns
              else F.lit(None).cast("string"))
    return F.coalesce(native, F.get_json_object(F.col(img), f"$.{key}"))


def screen_wire_events(events: DataFrame, key: str):
    """Event-level poison screen for the wire path: (good_events, bad).

    Runs BEFORE the LWW collapse, so the semantics are the reference's
    skip-and-log per EVENT (RdbSyncService.skipDupException, client-
    adapter/rdb/.../RdbSyncService.java:48,284; fail-the-batch alternative:
    CanalParseException, parse/.../AbstractEventParser.java:151): a poison
    event is diverted with its raw payload — so a poison LATEST event no
    longer shadows earlier good events for the same key (the good winner
    still applies), and a poison NON-winner still leaves DLQ evidence
    instead of silently losing the collapse. An event is poison when its
    routing key cannot be extracted (``no_pk`` — no native pk envelope, no
    JSON probe hit), its upsert payload is malformed JSON
    (``corrupt_payload`` — detected via a corrupt-record-column probe, no
    best-effort prefix salvage), or the upsert payload is missing outright
    (``missing_payload``). DELETEs carry no payload to apply, so only
    their routing key is screened.

    Cost: one ``from_json`` structure-validation per upsert event — paid
    ONLY on the dlq-enabled path; the happy path keeps the O(keys) fused
    winner decode untouched.

    ``bad`` columns: key (nullable), op ('U'/'D'), lsn, reason, raw.
    """
    from pyspark.sql import types as T

    from canal_spark.operators.decode import _JSON_OPTS

    dml = _wire_dml(events)
    is_del = F.col("event_type") == "DELETE"
    rkey = F.when(is_del, _wire_key_of(dml, key, "before")) \
            .otherwise(_wire_key_of(dml, key, "after"))
    probe = F.from_json(
        F.col("after"),
        T.StructType([T.StructField("_corrupt_rec", T.StringType())]),
        {**_JSON_OPTS, "columnNameOfCorruptRecord": "_corrupt_rec"})
    # classification order matters (ADVICE r03 #2): a corrupt upsert
    # payload also fails the key probe, so testing no_pk first would
    # mislabel it — probe the payload shape BEFORE concluding no_pk
    reason = (
        F.when(~is_del & F.col("after").isNull(), F.lit("missing_payload"))
        .when(~is_del & probe.getItem("_corrupt_rec").isNotNull(),
              F.lit("corrupt_payload"))
        .when(rkey.isNull(), F.lit("no_pk")))
    bad = dml.where(reason.isNotNull()).select(
        rkey.alias("key"),
        F.when(is_del, F.lit("D")).otherwise(F.lit("U")).alias("op"),
        F.col("lsn"),
        reason.alias("reason"),
        # a poison DELETE has no after-image; keep the before-image so the
        # evidence still identifies the row (ADVICE r03 #2)
        F.coalesce(F.col("after"), F.col("before")).alias("raw"),
    )
    return dml.where(reason.isNull()), bad


def wire_net_changes(events: DataFrame, key: str,
                     image_schema, salt_partitions: int | None = None) -> DataFrame:
    """Wire-mode fused path: LWW-collapse the RAW JSON payloads, decode
    only the per-key winners.

    Round 1/2 decoded every event (`from_json` of the full image) and the
    packed collapse then re-encoded it (`to_json`) — two full codec passes
    over N events. But the net effect per key is its single latest event,
    so the decode belongs AFTER the collapse: extract just the key (a
    native ``pk_after``/``pk_before`` envelope column when the wire caries
    it — the FlatMessage pkNames analog — else one `get_json_object`
    probe), aggregate ``max(lsn ∥ op ∥ payload-string)``, and `from_json`
    only |keys| winners. Codec work drops from O(events) to O(keys) —
    the dominant term for update-heavy CDC at any scale.

    Poison handling lives OUTSIDE this function (screen_wire_events, the
    dlq path): events reaching the collapse are assumed routable/valid.
    """
    dml = _wire_dml(events)

    def k_of(img: str):
        return _wire_key_of(dml, key, img)

    upserts = dml.where(F.col("event_type").isin("INSERT", "UPDATE")).select(
        k_of("after").alias(key), F.lit("U").alias("op"), F.col("lsn"),
        F.col("after").alias("_payload"),
    )
    deletes = dml.where(
        (F.col("event_type") == "DELETE")
        | ((F.col("event_type") == "UPDATE") & (k_of("before") != k_of("after")))
    ).select(
        k_of("before").alias(key), F.lit("D").alias("op"), F.col("lsn"),
        F.lit(None).cast("string").alias("_payload"),
    )
    ch = upserts.unionByName(deletes)

    packed = F.concat_ws("\x01", F.col("lsn"), F.col("op"), F.col("_payload"))
    if salt_partitions:
        salt = F.pmod(F.xxhash64(F.col("lsn")), F.lit(salt_partitions))
        partial = (
            ch.withColumn("_salt", salt)
            .groupBy(key, "_salt").agg(F.max(packed).alias("_p"))
        )
        final = partial.groupBy(key).agg(F.max("_p").alias("_p"))
    else:
        final = ch.groupBy(key).agg(F.max(packed).alias("_p"))

    from canal_spark.operators.decode import _JSON_OPTS

    parts = F.split(F.col("_p"), "\x01", 3)
    # deletes pack no payload (2 parts) — F.get returns NULL out-of-bounds
    # where getItem would throw under ANSI
    from canal_spark.operators.decode import tolerant_wire_schema

    # decode scalars as STRING then cast to the declared type: the wire may
    # quote any value (FlatMessage quotes ALL of them; DDL-added columns
    # ride as strings in the typed fixture too), and from_json NULLs a
    # quoted numeric under a numeric field instead of coercing — the cast
    # is the sink-type conversion the adapters do anyway (SURVEY §2 row 39)
    img = F.from_json(F.get(parts, 2), tolerant_wire_schema(image_schema),
                      _JSON_OPTS)
    types = {f.name: f.dataType for f in image_schema.fields}
    data_cols = [f.name for f in image_schema.fields if f.name != key]
    # try_cast, not cast: under ANSI (Spark 4 default) a malformed scalar —
    # MySQL's zero-date '0000-00-00' being the canonical case — would THROW
    # and kill the stream; the reference maps unrepresentable values to
    # NULL instead (LogEventConvert.java:819-829 zero-date → null) and so
    # does every adapter's sink-type conversion. Payload-level corruption
    # is still surfaced loudly by the DLQ screen (screen_wire_events);
    # this is only the per-VALUE tolerance.
    return final.select(
        key,
        *[img.getItem(c).try_cast(types[c]).alias(c) for c in data_cols],
        parts.getItem(1).alias("op"),
        parts.getItem(0).alias("lsn"),
    )


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
