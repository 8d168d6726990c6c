"""CDC semantics demonstrated over the driver-provided `events` table.

The real engine replays the synthetic binlog (tests/bench); these queries
re-express its core operators over the driver's generic event stream
(event_id, ts, user_id, event_type, value, props) so the DuckDB oracle can
verify them SQL-for-SQL at sf0.01:

- lww_collapse        = operators/lww.collapse_lww (max_by per key)
- net_effect          = I/U/D classification + final-op resolution
- txn_window_batches  = transaction/byte-budget admission accounting
- ordered_ack_points  = per-source max-position selection (store doGet)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# event_type → CDC op class (signup creates, error removes, rest update)
OP_MAP = {"signup": "I", "click": "U", "view": "U", "purchase": "U", "error": "D"}


def _op_col():
    # total over the domain: unknown/NULL event_type → 'U', matching the
    # oracle's CASE ... ELSE 'U' (ADVICE r01: the bare map lookup returned
    # NULL for out-of-domain inputs where DuckDB said 'U')
    m = F.create_map(*[F.lit(x) for kv in OP_MAP.items() for x in kv])
    return F.coalesce(m[F.col("event_type")], F.lit("U"))


def lww_collapse(events: DataFrame) -> DataFrame:
    """Last event per user by (ts, event_id) — the LWW operator, one
    map-side-combining aggregate (no window sort)."""
    payload = F.struct("ts", "event_id", "event_type", "value")
    order = F.struct(F.col("ts"), F.col("event_id"))
    return (
        events.groupBy("user_id")
        .agg(
            F.max_by(payload, order).alias("last"),
            F.count("*").alias("n_events"),
        )
        .select(
            "user_id",
            F.col("last.event_id").alias("last_event_id"),
            F.col("last.event_type").alias("last_event_type"),
            F.floor(F.col("last.value") * 10000).cast("long").alias("last_value_e4"),
            "n_events",
        )
    )


def lww_collapse_sql() -> str:
    return """
        SELECT user_id,
               event_id AS last_event_id,
               event_type AS last_event_type,
               CAST(FLOOR(value * 10000) AS BIGINT) AS last_value_e4,
               n_events
        FROM (
            SELECT *,
                   ROW_NUMBER() OVER (PARTITION BY user_id
                                      ORDER BY ts DESC, event_id DESC) AS rn,
                   COUNT(*) OVER (PARTITION BY user_id) AS n_events
            FROM events
        ) t WHERE rn = 1
    """


def net_effect(events: DataFrame) -> DataFrame:
    """Classify events into I/U/D ops and resolve the net per-key effect:
    final op + whether the key survives (op != 'D')."""
    ev = events.withColumn("op", _op_col())
    order = F.struct(F.col("ts"), F.col("event_id"))
    return (
        ev.groupBy("user_id")
        .agg(
            F.max_by(F.col("op"), order).alias("final_op"),
            F.sum(F.when(F.col("op") == "I", 1).otherwise(0)).alias("n_insert"),
            F.sum(F.when(F.col("op") == "U", 1).otherwise(0)).alias("n_update"),
            F.sum(F.when(F.col("op") == "D", 1).otherwise(0)).alias("n_delete"),
        )
        .withColumn("alive", (F.col("final_op") != "D").cast("long"))
    )


def net_effect_sql() -> str:
    return """
        WITH ops AS (
            SELECT user_id, ts, event_id,
                   CASE event_type WHEN 'signup' THEN 'I'
                                   WHEN 'error' THEN 'D'
                                   ELSE 'U' END AS op
            FROM events
        )
        SELECT a.user_id, l.final_op,
               a.n_insert, a.n_update, a.n_delete,
               CAST(l.final_op != 'D' AS BIGINT) AS alive
        FROM (
            SELECT user_id,
                   CAST(SUM(CASE WHEN op = 'I' THEN 1 ELSE 0 END) AS BIGINT) AS n_insert,
                   CAST(SUM(CASE WHEN op = 'U' THEN 1 ELSE 0 END) AS BIGINT) AS n_update,
                   CAST(SUM(CASE WHEN op = 'D' THEN 1 ELSE 0 END) AS BIGINT) AS n_delete
            FROM ops GROUP BY user_id
        ) a
        JOIN (
            SELECT user_id, op AS final_op FROM (
                SELECT user_id, op,
                       ROW_NUMBER() OVER (PARTITION BY user_id
                                          ORDER BY ts DESC, event_id DESC) AS rn
                FROM ops
            ) WHERE rn = 1
        ) l ON a.user_id = l.user_id
    """


def txn_window_batches(events: DataFrame) -> DataFrame:
    """Admission accounting: hourly micro-batch buckets with row counts and
    positions (the store's items/bytes batch sizing, MEMSIZE analog)."""
    epoch = F.col("ts").cast("timestamp").cast("long")
    return (
        events.groupBy(
            F.floor(epoch / 3600).cast("long").alias("epoch_hour")
        )
        .agg(
            F.count("*").alias("n_rows"),
            F.min("event_id").alias("first_pos"),
            F.max("event_id").alias("ack_pos"),
            F.countDistinct("user_id").alias("n_keys"),
        )
    )


def txn_window_batches_sql() -> str:
    # epoch-hour integers instead of date_trunc so the value is engine- and
    # timezone-representation independent (session TZ is UTC either way)
    return """
        SELECT CAST(FLOOR(FLOOR(epoch(ts)) / 3600) AS BIGINT) AS epoch_hour,
               COUNT(*) AS n_rows,
               MIN(event_id) AS first_pos,
               MAX(event_id) AS ack_pos,
               COUNT(DISTINCT user_id) AS n_keys
        FROM events GROUP BY 1
    """


def ordered_ack_points(events: DataFrame) -> DataFrame:
    """Per-stream (event_type ≈ source partition) last position + count —
    the ack-position/lineage selection of store doGet + parse positions."""
    return events.groupBy("event_type").agg(
        F.max("event_id").alias("ack_event_id"),
        F.max(F.col("ts").cast("timestamp").cast("long")).alias("ack_epoch"),
        F.count("*").alias("delivered"),
    )


def ordered_ack_points_sql() -> str:
    return """
        SELECT event_type,
               MAX(event_id) AS ack_event_id,
               CAST(MAX(CAST(FLOOR(epoch(ts)) AS BIGINT)) AS BIGINT) AS ack_epoch,
               COUNT(*) AS delivered
        FROM events GROUP BY event_type
    """
