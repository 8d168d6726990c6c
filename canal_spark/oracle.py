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

import pyarrow as pa
import pyarrow.parquet as pq

SUBSCRIBED = ("train", "tokseq")
BASE_COLS = ["doc_id", "tokens", "n_tok", "source"]


def apply_events_py(base_rows: dict[str, dict], events: list[dict],
                    columns: list[str] | None = None,
                    subscribed: tuple[str, str] = SUBSCRIBED,
                    ) -> tuple[dict[str, dict], list[str]]:
    """Fold events (already in LSN order) over {doc_id: row} state.

    Returns (final_state, final_columns). Rows are plain dicts; tokens are
    tuples for cheap equality. ``subscribed`` selects which source table's
    events apply (multi-table logs: one fold per subscription).
    """
    state = dict(base_rows)
    cols = list(columns or BASE_COLS)
    # sink-side type cast for DDL-added columns (client-adapter rdb
    # target-type cache analog, SURVEY §2 row 39): wire values are strings
    # (FlatMessage model); the engine casts incoming changes to the sink
    # column's declared type at MERGE time (table/lake.py), so the oracle
    # must coerce identically or an INT column would compare '42' vs 42
    coerce: dict[str, type] = {}
    # the subscription follows RENAME TABLE (rename-follow, like the
    # engine's SchemaTracker): DML under the new name keeps applying, DML
    # under the stale old name stops
    sub = tuple(subscribed)
    for ev in events:
        if ev["entry_type"] != "ROWDATA":
            continue
        if ev["is_ddl"]:
            # Route DDL by the PARSED statement's target table, NOT the
            # event envelope: a binlog QUERY event's envelope carries the
            # session's current database/table (the generator stamps the
            # main table's current name), while the SQL may target ANY
            # table — the reference parses the statement to find the
            # affected table (DatabaseTableMeta/DruidDdlParser), and so
            # does the engine (SchemaTracker.relevant on each command).
            # Found by the mirror fuzz: an envelope gate here silently
            # dropped another table's ALTER from its own fold AND would
            # have applied a matching-envelope ALTER of a foreign table.
            # classify with the SHARED grammar/relevance (schema/ddl.py +
            # tracker.relevant/follow — pure, cross-checked by the
            # hand-written goldens in test_ddl.py) — the oracle must track
            # exactly the column set the engine tracks; the *application*
            # semantics below stay independent (a sequential dict fold,
            # nothing like the engine's metadata commits)
            from canal_spark.schema.ddl import parse_ddl_statements
            from canal_spark.schema.tracker import SchemaTracker

            for cmd in parse_ddl_statements(ev["sql"] or ""):
                if cmd.kind == "RENAME_TABLE":
                    sub = SchemaTracker.follow(cmd, sub)
                    continue
                if not SchemaTracker.relevant(cmd, sub):
                    continue
                if cmd.kind == "ADD_COLUMN" and cmd.column not in cols:
                    _insert_at(cols, cmd.column, cmd.position)
                    fn = _coercer_of(cmd.dtype)
                    if fn is not None:
                        coerce[cmd.column] = fn
                    for row in state.values():
                        row.setdefault(cmd.column, None)
                elif cmd.kind == "RENAME_COLUMN" and cmd.column in cols:
                    cols[cols.index(cmd.column)] = cmd.new_name
                    if cmd.column in coerce:
                        coerce[cmd.new_name] = coerce.pop(cmd.column)
                    for row in state.values():
                        row[cmd.new_name] = row.pop(cmd.column, None)
                elif cmd.kind == "CHANGE_COLUMN" and cmd.column in cols:
                    cols[cols.index(cmd.column)] = cmd.new_name
                    if cmd.column in coerce:
                        coerce[cmd.new_name] = coerce.pop(cmd.column)
                    for row in state.values():
                        row[cmd.new_name] = row.pop(cmd.column, None)
                elif (cmd.kind == "DROP_COLUMN" and cmd.column in cols
                      and cmd.column not in BASE_COLS):
                    cols.remove(cmd.column)
                    coerce.pop(cmd.column, None)
                    for row in state.values():
                        row.pop(cmd.column, None)
                elif cmd.kind == "TRUNCATE":
                    state.clear()
                # RENAME_TABLE handled above (follow); MODIFY_COLUMN:
                # values are untyped python objects — no-op
            continue

        if (ev["schema_name"], ev["table_name"]) != sub:
            continue

        op = ev["event_type"]
        before, after = ev.get("before"), ev.get("after")
        if op == "INSERT":
            state[after["doc_id"]] = _project(after, cols, coerce)
        elif op == "UPDATE":
            # pk-change = delete old key + insert new key
            # (RdbSyncService.java:446-469 analog)
            if before and before["doc_id"] != after["doc_id"]:
                state.pop(before["doc_id"], None)
            state[after["doc_id"]] = _project(after, cols, coerce)
        elif op == "DELETE":
            state.pop(before["doc_id"], None)
    return state, cols


def _insert_at(cols: list[str], name: str,
               position: tuple[str, str | None] | None) -> None:
    idx = len(cols)
    if position is not None:
        if position[0] == "FIRST":
            idx = 0
        elif position[0] == "AFTER" and position[1] in cols:
            idx = cols.index(position[1]) + 1
    cols.insert(idx, name)


def _coercer_of(dtype) -> type | None:
    """Python-side twin of the sink's cast-to-declared-type (lake MERGE)."""
    from pyspark.sql import types as T

    if isinstance(dtype, (T.IntegerType, T.LongType, T.ShortType,
                          T.ByteType)):
        return int
    if isinstance(dtype, (T.DoubleType, T.FloatType)):
        return float
    return None


def _project(img: dict, cols: list[str],
             coerce: dict[str, type] | None = None) -> dict:
    row = {c: img.get(c) for c in cols}
    if isinstance(row.get("tokens"), list):
        row["tokens"] = tuple(row["tokens"])
    for c, fn in (coerce or {}).items():
        if row.get(c) is not None:
            row[c] = fn(row[c])
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


def oracle_mirror_final_state(
    bases: dict[str, pa.Table | None], log_dir: str,
) -> dict[str, tuple[dict[str, dict], list[str]]]:
    """Multi-table oracle (RdbMirrorDbSyncService analog): one independent
    sequential fold per subscription over the SAME event log. Keys are
    'schema.table' source names; each fold only applies its own table's
    DML/DDL (incl. per-subscription RENAME follow)."""
    events = read_log_events(log_dir)
    out: dict[str, tuple[dict[str, dict], list[str]]] = {}
    for name, base in bases.items():
        base_rows: dict[str, dict] = {}
        if base is not None:
            for row in base.to_pylist():
                row["tokens"] = tuple(row["tokens"])
                base_rows[row["doc_id"]] = row
        out[name] = apply_events_py(
            base_rows, events, subscribed=tuple(name.split(".", 1)))
    return out


def oracle_group_final_state(
    bases: list[pa.Table | None], log_dirs: list[str],
) -> tuple[dict[str, dict], list[str]]:
    """Sharded-upstream oracle (GroupEventParser timeline semantics): all
    shards' events fold in ONE sequence ordered by
    (execute_ts, shard index, gtid, binlog file, pos) — the exact total
    order of streaming/group.merged_lsn_col. Identical DDL clones from
    every shard are harmless: the fold's apply is shape-idempotent."""
    base_rows: dict[str, dict] = {}
    for base in bases:
        if base is None:
            continue
        for row in base.to_pylist():
            row["tokens"] = tuple(row["tokens"])
            base_rows[row["doc_id"]] = row
    merged: list[tuple] = []
    for src, d in enumerate(log_dirs):
        for ev in read_log_events(d):
            merged.append(
                ((ev["execute_ts"], src, ev["gtid_seq"], ev["binlog_file"],
                  ev["binlog_pos"]), ev))
    merged.sort(key=lambda p: p[0])
    return apply_events_py(base_rows, [ev for _, ev in merged])


def oracle_pack_state(state: dict[str, dict], shard_chars: int,
                      seq_len: int) -> dict[str, dict]:
    """Per-shard concat-and-chunk packing of an oracle final state — the
    expected-state fold for PackIndexView checks (one definition shared by
    the pytest oracles and the driver's expected-state parquet, so the
    packing convention can never drift between them). Pure python; nothing
    shared with the engine's window kernel."""
    from collections import defaultdict

    shards: dict[str, list] = defaultdict(list)
    for doc_id, row in state.items():
        toks = row.get("tokens")
        nt = len(toks) if toks is not None else row.get("n_tok")
        shards[doc_id[:shard_chars]].append((doc_id, nt))
    out: dict[str, dict] = {}
    for sh, docs in shards.items():
        off = 0
        for doc_id, nt in sorted(docs):
            if nt and nt > 0:
                out[doc_id] = {
                    "doc_id": doc_id, "shard": sh, "n_tok": nt,
                    "local_off": off, "pack_first": off // seq_len,
                    "pack_last": (off + nt - 1) // seq_len,
                }
                off += nt
            else:
                out[doc_id] = {
                    "doc_id": doc_id, "shard": sh, "n_tok": nt,
                    "local_off": None, "pack_first": None, "pack_last": None,
                }
    return out
