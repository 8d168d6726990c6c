"""Per-batch metrics + lineage — the Prometheus collectors analog.

The reference exports parser/sink/store gauges (received bytes, put/get/ack
delay, traffic delay, txn counters — prometheus/.../impl/*.java). Here each
micro-batch appends one JSON line with: rows by op, merge result, end-to-end
lag (wall clock − max execute_ts), per-source-partition max LSN (lineage),
and timings. Driver-side file append — metrics are tiny; the data path never
pays for them.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any


class MetricsLog:
    def __init__(self, path: str):
        self.path = os.path.abspath(path)
        os.makedirs(os.path.dirname(self.path), exist_ok=True)

    def append(self, record: dict[str, Any]) -> None:
        record = dict(record)
        record.setdefault("wall_ts", time.time())
        with open(self.path, "a") as f:
            f.write(json.dumps(record, default=str) + "\n")

    def read(self) -> list[dict]:
        if not os.path.exists(self.path):
            return []
        with open(self.path) as f:
            return [json.loads(line) for line in f if line.strip()]


def batch_lineage(events_df) -> list[dict]:
    """Per binlog-file max LSN + row count for the batch (the reference's
    per-destination parse-position persistence,
    parse/.../AbstractEventParser.java:458-485)."""
    from pyspark.sql import functions as F

    rows = (
        events_df.groupBy("binlog_file")
        .agg(F.max("lsn").alias("max_lsn"), F.count("*").alias("rows"))
        .collect()
    )
    return [r.asDict() for r in rows]
