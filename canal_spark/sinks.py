"""Partitioned, ordered, exactly-once wire-message delivery — the MQ sink
family as a file topic.

The reference's primary delivery path is an MQ producer: the server worker
loop gets a batch, sends it, and acks (server/.../CanalMQStarter.java:
152-216); rows are routed to topic partitions by a pk hash so per-key
order is preserved while partitions consume in parallel
(connector/core/.../MQMessageUtils.java:252-347 ``messagePartition``),
and the payload is the FlatMessage JSON shape (protocol/.../
FlatMessage.java). SURVEY §2 rows 28-30 map the *transports* (Kafka/
RocketMQ/RabbitMQ clients) out of scope; this module reproduces the
delivery SEMANTICS on storage any consumer can read:

- **routing**: ``p = pmod(h60(pk), n_partitions)`` — h60 is the repo's
  md5-derived portable hash (functions/hashing.py), so any consumer (or a
  DuckDB oracle) can reproduce the routing exactly; per-key order is
  preserved because a key's messages land in one partition in LSN order.
- **ordering**: within (epoch, partition) messages carry a dense ``seq``
  assigned by LSN; epochs are published in commit order, so a consumer
  reading epoch directories in ascending order sees every key's messages
  in exactly the apply order (the get→send→ack contract).
- **exactly-once**: one directory per epoch, written to a ``.tmp`` path
  and atomically renamed on success. A redelivered epoch (crash replay,
  duplicate trigger) sees the final directory and no-ops — the file-topic
  analog of the lake ledger. A crash mid-write leaves only ``.tmp``,
  which the rewrite overwrites.

One Spark job per publish: the ``row_number`` window exchanges on ``p``
(the only shuffle — linear in the batch) and its in-partition sort by LSN
doubles as the file order; ``partitionBy("p")`` then splits directories
per partition, one file per partition per epoch. Message payloads are
JSON lines with the FlatMessage fields (images stay the wire JSON
strings ``to_wire`` produced).
"""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from canal_spark.functions.hashing import h60
from canal_spark.operators.decode import to_wire

_MSG_COLS = ["seq", "lsn", "gtid_seq", "binlog_file", "binlog_pos",
             "execute_ts", "event_type", "pk", "before", "after"]


class WireMessageSink:
    """A file topic: ``out_dir/epoch=<key>/p=<k>/part-*.json``."""

    def __init__(self, out_dir: str, n_partitions: int = 8,
                 key: str = "doc_id",
                 table_regex: str | None = r"^train\.tokseq$"):
        self.out_dir = os.path.abspath(out_dir)
        self.n_partitions = n_partitions
        self.key = key
        # the topic's own subscription (one topic = one table, the static
        # canal.mq.topic mapping): the streaming envelope may deliberately
        # carry foreign-table events to the txn barrier, and the merge gates
        # them later — the topic must gate them here, by the same regex
        # contract as the merge subscription
        self.table_regex = table_regex
        os.makedirs(self.out_dir, exist_ok=True)

    # ------------------------------------------------------------ publish
    def _epoch_dir(self, epoch_key: str) -> str:
        return os.path.join(self.out_dir, f"epoch={epoch_key}")

    def publish(self, events: DataFrame, epoch_key: str) -> dict:
        """Route one released batch of envelope events (typed or wire) and
        publish it as epoch ``epoch_key``. Idempotent per epoch key."""
        final = self._epoch_dir(epoch_key)
        if os.path.exists(final):
            return {"skipped": True, "epoch": epoch_key}
        tmp = final + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)

        ev = events.where(
            (F.col("entry_type") == "ROWDATA")
            & ~F.coalesce(F.col("is_ddl"), F.lit(False))
            & F.col("event_type").isin("INSERT", "UPDATE", "DELETE")
        )
        if self.table_regex:
            ev = ev.where(F.concat_ws(
                ".", F.col("schema_name"), F.col("table_name")
            ).rlike(self.table_regex))
        # unify to the wire shape (JSON images + native pk envelope);
        # wire frames pass through to_wire untouched (images already strings)
        if isinstance(ev.schema["after"].dataType, T.StructType):
            ev = to_wire(ev, key=self.key)

        def pk_of(img: str):
            if f"pk_{img}" in ev.columns:
                return F.col(f"pk_{img}")
            return F.get_json_object(F.col(img), f"$.{self.key}")

        pk = F.coalesce(pk_of("after"), pk_of("before"))
        routed = ev.select(
            F.pmod(h60(pk), F.lit(self.n_partitions)).alias("p"),
            pk.alias("pk"), "lsn", "gtid_seq", "binlog_file", "binlog_pos",
            "execute_ts", "event_type", "before", "after",
        )
        w = Window.partitionBy("p").orderBy("lsn")
        (routed.withColumn("seq", F.row_number().over(w))
         .select("p", *_MSG_COLS)
         .write.mode("overwrite").partitionBy("p")
         # µs-exact timestamps, same rendering the wire images use
         .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
         .json(tmp))
        os.replace(tmp, final)
        return {"skipped": False, "epoch": epoch_key}

    # ------------------------------------------------------------ consume
    def epochs(self) -> list[str]:
        return sorted(
            os.path.basename(d).split("=", 1)[1]
            for d in glob.glob(os.path.join(self.out_dir, "epoch=*"))
            if not d.endswith(".tmp")
        )

    def read(self, spark: SparkSession,
             partition: int | None = None) -> DataFrame:
        """All published messages with their (epoch, p) lineage. Consumer
        order for a partition is (epoch asc, seq asc) — total per-key
        order. Empty topic → empty frame with the full schema."""
        schema = T.StructType([
            T.StructField("seq", T.IntegerType()),
            T.StructField("lsn", T.StringType()),
            T.StructField("gtid_seq", T.LongType()),
            T.StructField("binlog_file", T.StringType()),
            T.StructField("binlog_pos", T.LongType()),
            T.StructField("execute_ts", T.TimestampType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("pk", T.StringType()),
            T.StructField("before", T.StringType()),
            T.StructField("after", T.StringType()),
        ])
        eps = self.epochs()
        if not eps:
            empty = spark.createDataFrame([], schema)
            return empty.select(F.lit("").alias("epoch"),
                                F.lit(0).alias("p"), "*")
        df = (spark.read.schema(schema)
              .option("basePath", self.out_dir)
              .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
              .json([self._epoch_dir(e) for e in eps])
              .withColumn("epoch", F.regexp_extract(
                  F.input_file_name(), r"epoch=([^/]+)/", 1))
              .withColumn("p", F.regexp_extract(
                  F.input_file_name(), r"/p=(\d+)/", 1).cast("int")))
        if partition is not None:
            df = df.where(F.col("p") == partition)
        return df.select("epoch", "p", *_MSG_COLS)
