from canal_spark.streaming.replay import StreamingReplay  # noqa: F401
from canal_spark.streaming.relay import (  # noqa: F401
    acked_version, relay_step, relay_until_idle)
