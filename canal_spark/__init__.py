"""canal_spark — a from-scratch PySpark-native CDC / incremental-ingest engine.

Re-expresses the capabilities of the reference CDC middleware (alibaba/canal,
see /root/reference and SURVEY.md) Spark-first: Structured Streaming
micro-batches over a replayable change-event log, vectorized decode, ordered
last-writer-wins collapse, and exactly-once MERGE apply into an Iceberg-style
snapshot table of pre-tokenized training sequences
(doc_id string, tokens array<int>, n_tok int, source string).

Subpackages
-----------
fixtures   deterministic synthetic binlog event-log + base-table generators
table      LakeTable: Iceberg-style bucketed snapshot table w/ atomic commits
operators  dataflow stages: filters, decode, transaction batching, LWW collapse
schema     DDL parsing (DruidDdlParser analog) + versioned SchemaTracker
streaming  Structured Streaming replay: foreachBatch apply, checkpoint, resume
functions  training-data ops: dedup, similarity search, text analysis, multimodal
"""

__version__ = "0.1.0"
