"""Relational operators the reference's adapter layer implies.

- ``pricing_summary``: the classic scan→aggregate shape (full-load ETL
  analytics over the ingested table; reference full-load operator is
  client-adapter/rdb/.../RdbEtlService.java:30-60).
- ``orders_by_segment``: stream-static dimension join — the ES adapter's
  join-maintained denormalized view (client-adapter/escore/.../
  ESSyncService.java:458-492) re-expressed as `join(broadcast(dim))`.
- ``backfill_snapshot``: the initial full load (`SELECT * FROM t` import,
  RdbEtlService.importData) with projection + predicate pushed to the scan.
- ``source_union``: GroupEventParser sharded-source merge
  (parse/.../group/GroupEventParser.java:23-60) → `unionByName`.

All outputs are integers/strings (floor to e2/e4 fixed-point before any
sum) so results are bit-stable across engines — double sums are NOT
associative and would differ between partitionings, let alone engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _e2(col) -> F.Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.floor(c * 100).cast("long")


def pricing_summary(lineitem: DataFrame) -> DataFrame:
    """TPC-H Q1 shape over fixed-point units (scan → hash aggregate with
    map-side combine; Catalyst prunes to the 7 referenced columns)."""
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        lineitem.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_e2("l_quantity")).alias("sum_qty_e2"),
            F.sum(_e2("l_extendedprice")).alias("sum_price_e2"),
            F.sum(_e2(disc_price)).alias("sum_disc_price_e2"),
            F.sum(_e2(charge)).alias("sum_charge_e2"),
            F.count("*").alias("n_rows"),
        )
    )


def pricing_summary_sql() -> str:
    return """
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(FLOOR(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qty_e2,
               CAST(SUM(CAST(FLOOR(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_e2,
               CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS sum_disc_price_e2,
               CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100) AS BIGINT)) AS BIGINT) AS sum_charge_e2,
               COUNT(*) AS n_rows
        FROM lineitem
        GROUP BY l_returnflag, l_linestatus
    """


def orders_by_segment(orders: DataFrame, customer: DataFrame) -> DataFrame:
    """Denormalized-view maintenance shape: fact × broadcast dim → rollup."""
    dim = customer.select("c_custkey", "c_mktsegment")
    return (
        orders.join(F.broadcast(dim),
                    orders["o_custkey"] == dim["c_custkey"], "inner")
        .groupBy("c_mktsegment", "o_orderstatus")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(_e2("o_totalprice")).alias("revenue_e2"),
            F.countDistinct("o_custkey").alias("n_customers"),
        )
    )


def orders_by_segment_sql() -> str:
    return """
        SELECT c_mktsegment, o_orderstatus,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS revenue_e2,
               COUNT(DISTINCT o_custkey) AS n_customers
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment, o_orderstatus
    """


def backfill_snapshot(orders: DataFrame, min_total: int = 100_000) -> DataFrame:
    """Initial full load with predicate + projection pushed into the scan
    (`PushedFilters`/`ReadSchema` visible in .explain)."""
    return (
        orders.where(F.col("o_totalprice") > float(min_total))
        .select(
            "o_orderkey", "o_custkey", "o_orderpriority",
            _e2("o_totalprice").alias("total_e2"),
        )
    )


def backfill_snapshot_sql(min_total: int = 100_000) -> str:
    return f"""
        SELECT o_orderkey, o_custkey, o_orderpriority,
               CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS total_e2
        FROM orders WHERE o_totalprice > {min_total}
    """


def source_union(events: DataFrame) -> DataFrame:
    """Sharded-source merge: two logical shards of the stream united by
    name, then per-shard delivery accounting (GroupEventParser +
    GroupEventSink ordering analog)."""
    a = events.where(F.col("event_id") % 2 == 0).withColumn(
        "src_shard", F.lit("shard0"))
    b = events.where(F.col("event_id") % 2 == 1).withColumn(
        "src_shard", F.lit("shard1"))
    return (
        a.unionByName(b)
        .groupBy("src_shard", "event_type")
        .agg(
            F.count("*").alias("n"),
            F.max("event_id").alias("ack_event_id"),
        )
    )


def source_union_sql() -> str:
    return """
        SELECT CASE WHEN event_id % 2 = 0 THEN 'shard0' ELSE 'shard1' END AS src_shard,
               event_type,
               COUNT(*) AS n,
               MAX(event_id) AS ack_event_id
        FROM events
        GROUP BY 1, 2
    """
