"""Sequential-apply oracle: the ground truth for replay correctness.

Folds the change-event log in strict (gtid_seq, binlog_file, binlog_pos)
order over the base table, exactly like a single-threaded downstream applier
(the reference's RdbSyncService insert/update/delete,
client-adapter/rdb/.../RdbSyncService.java:237-400, incl. pk-change handling
:446-469, and DDL mirroring RdbMirrorDbSyncService.java:50-90).

Used only in tests — the engine's distributed result must equal this
row-for-row with exact token-array equality per doc_id (BASELINE.json
input_hint invariant).
"""

from __future__ import annotations

import glob
import os
import re

import pyarrow as pa
import pyarrow.parquet as pq

SUBSCRIBED = ("train", "tokseq")
BASE_COLS = ["doc_id", "tokens", "n_tok", "source"]

# DDLs the schema registry must ignore — the reference skip-list in
# MemoryTableMeta.apply (parse/.../tsdb/MemoryTableMeta.java:76-84).
_IGNORED_DDL = re.compile(
    r"(?i)^\s*(create\s+(unique\s+)?index|drop\s+index|grant|revoke|flush|"
    r"set\s|analyze|optimize|repair|comment)"
)


def apply_events_py(base_rows: dict[str, dict], events: list[dict],
                    columns: list[str] | None = None) -> tuple[dict[str, dict], list[str]]:
    """Fold events (already in LSN order) over {doc_id: row} state.

    Returns (final_state, final_columns). Rows are plain dicts; tokens are
    tuples for cheap equality.
    """
    state = dict(base_rows)
    cols = list(columns or BASE_COLS)
    for ev in events:
        if ev["entry_type"] != "ROWDATA":
            continue
        if (ev["schema_name"], ev["table_name"]) != SUBSCRIBED:
            continue
        if ev["is_ddl"]:
            sql = (ev["sql"] or "").strip().rstrip(";")
            if _IGNORED_DDL.match(sql):
                continue
            m = re.match(r"(?i)alter\s+table\s+\S+\s+add\s+column\s+(\w+)\s+\w+", sql)
            if m:
                c = m.group(1)
                if c not in cols:
                    cols.append(c)
                    for row in state.values():
                        row.setdefault(c, None)
                continue
            m = re.match(r"(?i)alter\s+table\s+\S+\s+rename\s+column\s+(\w+)\s+to\s+(\w+)", sql)
            if m:
                old, new = m.group(1), m.group(2)
                if old in cols:
                    cols[cols.index(old)] = new
                    for row in state.values():
                        row[new] = row.pop(old, None)
                continue
            m = re.match(r"(?i)alter\s+table\s+\S+\s+drop\s+column\s+(\w+)", sql)
            if m:
                c = m.group(1)
                if c in cols and c not in BASE_COLS:
                    cols.remove(c)
                    for row in state.values():
                        row.pop(c, None)
                continue
            if re.match(r"(?i)truncate\s", sql):
                state.clear()
                continue
            continue  # unknown DDL: no-op on data

        op = ev["event_type"]
        before, after = ev.get("before"), ev.get("after")
        if op == "INSERT":
            state[after["doc_id"]] = _project(after, cols)
        elif op == "UPDATE":
            # pk-change = delete old key + insert new key
            # (RdbSyncService.java:446-469 analog)
            if before and before["doc_id"] != after["doc_id"]:
                state.pop(before["doc_id"], None)
            state[after["doc_id"]] = _project(after, cols)
        elif op == "DELETE":
            state.pop(before["doc_id"], None)
    return state, cols


def _project(img: dict, cols: list[str]) -> dict:
    row = {c: img.get(c) for c in cols}
    if isinstance(row.get("tokens"), list):
        row["tokens"] = tuple(row["tokens"])
    return row


def read_log_events(log_dir: str) -> list[dict]:
    """Read all segments, return python dicts sorted by LSN."""
    events: list[dict] = []
    for path in sorted(glob.glob(os.path.join(log_dir, "mysql-bin.*.parquet"))):
        t = pq.read_table(path)
        fname = os.path.basename(path)
        for row in t.to_pylist():
            row["_file"] = fname
            events.append(row)
    events.sort(key=lambda r: (r["gtid_seq"], r["binlog_file"], r["binlog_pos"]))
    return events


def oracle_final_state(base: pa.Table | None, log_dir: str) -> tuple[dict[str, dict], list[str]]:
    """End-to-end oracle: base parquet table + log dir → final state."""
    base_rows: dict[str, dict] = {}
    if base is not None:
        for row in base.to_pylist():
            row["tokens"] = tuple(row["tokens"])
            base_rows[row["doc_id"]] = row
    return apply_events_py(base_rows, read_log_events(log_dir))
