from canal_spark.streaming.replay import StreamingReplay  # noqa: F401
