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
    m = F.create_map(*[F.lit(x) for kv in OP_MAP.items() for x in kv])
    return m[F.col("event_type")]


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
            F.round(F.col("last.value"), 4).alias("last_value"),
            "n_events",
        )
    )


def lww_collapse_sql() -> str:
    return """
        SELECT user_id,
               event_id AS last_event_id,
               event_type AS last_event_type,
               ROUND(value, 4) AS last_value,
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
        .withColumn("alive", (F.col("final_op") != "D").cast("int"))
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
        SELECT user_id,
               (SELECT op FROM ops o2 WHERE o2.user_id = o.user_id
                ORDER BY ts DESC, event_id DESC LIMIT 1) AS final_op,
               SUM(CASE WHEN op = 'I' THEN 1 ELSE 0 END) AS n_insert,
               SUM(CASE WHEN op = 'U' THEN 1 ELSE 0 END) AS n_update,
               SUM(CASE WHEN op = 'D' THEN 1 ELSE 0 END) AS n_delete,
               CAST((SELECT op FROM ops o2 WHERE o2.user_id = o.user_id
                     ORDER BY ts DESC, event_id DESC LIMIT 1) != 'D' AS INT)
                   AS alive
        FROM ops o
        GROUP BY user_id
    """


def txn_window_batches(events: DataFrame) -> DataFrame:
    """Admission accounting: hourly micro-batch buckets with row counts and
    positions (the store's items/bytes batch sizing, MEMSIZE analog)."""
    return (
        events.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("batch_hour")
        )
        .agg(
            F.count("*").alias("rows"),
            F.min("event_id").alias("first_pos"),
            F.max("event_id").alias("ack_pos"),
            F.countDistinct("user_id").alias("keys"),
        )
    )


def txn_window_batches_sql() -> str:
    return """
        SELECT date_trunc('hour', ts) AS batch_hour,
               COUNT(*) AS rows,
               MIN(event_id) AS first_pos,
               MAX(event_id) AS ack_pos,
               COUNT(DISTINCT user_id) AS keys
        FROM events GROUP BY 1
    """


def ordered_ack_points(events: DataFrame) -> DataFrame:
    """Per-stream (event_type ≈ source partition) last position + count —
    the ack-position/lineage selection of store doGet + parse positions."""
    return events.groupBy("event_type").agg(
        F.max("event_id").alias("ack_event_id"),
        F.max("ts").alias("ack_ts"),
        F.count("*").alias("delivered"),
    )


def ordered_ack_points_sql() -> str:
    return """
        SELECT event_type,
               MAX(event_id) AS ack_event_id,
               MAX(ts) AS ack_ts,
               COUNT(*) AS delivered
        FROM events GROUP BY event_type
    """
