"""Deterministic synthetic binlog event-log generator (FIXTURES.md §1-§3).

Produces the replayable "binlog": parquet segments named like binlog files
(``mysql-bin.000001.parquet`` …) whose rows mirror the reference's flattened
Entry/FlatMessage shape — entry_type TRANSACTIONBEGIN/ROWDATA/TRANSACTIONEND
(protocol/EntryProtocol.proto:191-199), event_type INSERT/UPDATE/DELETE/
ALTER/TRUNCATE/QUERY (:202-222), ordering columns (gtid_seq, binlog_file,
binlog_pos) per Header (:25-73), full before/after row images per RowData
(:111-121), txn_id shared by all rows of a transaction (parseQueryEvent /
parseXidEvent analog, parse/.../LogEventConvert.java:206-305).

Everything is seeded (numpy Generator) and self-contained: no external data.
Token payloads live in one growing int32 pool; each INSERT/UPDATE appends a
fresh slice, so ``after.tokens`` across a segment is a contiguous ListArray —
generation stays vectorized and cheap even at bench scale (millions of
events).

Validity is guaranteed by construction (like a real binlog): INSERT only for
absent keys, UPDATE/DELETE only for live keys. Hot-key skew is a Zipf share
of UPDATEs over the top-K doc_ids. A fraction of rows targets a
non-subscribed table ("other_tbl") to exercise the regex table filter
(AviaterRegexFilter analog, filter/.../AviaterRegexFilter.java).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from canal_spark.lsn import encode_lsn_py

VOCAB = 50257  # GPT-2-ish vocab size for token ids
SOURCES = ["web", "books", "code", "wiki", "forums"]

# Arrow schema fragments. The before/after struct starts with the base
# tokseq shape (input_hint) and widens when the DDL script adds columns.
BASE_FIELDS = [
    ("doc_id", pa.string()),
    ("tokens", pa.list_(pa.int32())),
    ("n_tok", pa.int32()),
    ("source", pa.string()),
]


@dataclass
class CdcLogSpec:
    n_events: int = 10_000            # ROWDATA events for the subscribed table
    n_base_docs: int = 1_000          # docs pre-existing in the base table
    seed: int = 42
    op_mix: tuple[float, float, float] = (0.6, 0.3, 0.1)  # I/U/D
    txn_max: int = 200                # txn size ~ U[1, txn_max] (cap 1024)
    hot_keys: int = 16                # top-K doc_ids taking the Zipf share
    hot_frac: float = 0.0             # fraction of UPDATEs hitting hot keys
    other_table_frac: float = 0.0     # extra rows for non-subscribed table
    pk_change_frac: float = 0.02      # UPDATEs that change the primary key
    events_per_file: int = 50_000     # segment roll size (txn-aligned)
    min_tok: int = 4
    max_tok: int = 64
    doc_offset: int = 10_000_000  # first INSERTed doc id (disjoint per shard
    #                               for GroupEventParser-style sharded logs)
    ddl_script: list[tuple[int, str]] = field(default_factory=list)
    # [(event_index, sql)] — injected as single-event transactions when the
    # running ROWDATA count crosses event_index.
    gtid_offset: int = 0              # continue an earlier log's LSN
    file_no_offset: int = 0           # timeline (tail-log fixtures)
    table: tuple[str, str] = ("train", "tokseq")  # subscribed source table


def generate_base_table(n_docs: int, seed: int = 42,
                        min_tok: int = 4, max_tok: int = 64,
                        id_offset: int = 0) -> pa.Table:
    """Base tokseq table (doc_id, tokens, n_tok, source) — FIXTURES.md §1.
    ``id_offset`` keys disjoint per-shard bases for sharded-log fixtures."""
    rng = np.random.default_rng(seed)
    lens = rng.integers(min_tok, max_tok + 1, size=n_docs)
    offsets = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])
    pool = rng.integers(0, VOCAB, size=int(offsets[-1]), dtype=np.int32)
    doc_ids = pa.array(
        [f"doc{i + id_offset:09d}" for i in range(n_docs)], pa.string())
    tokens = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), pa.array(pool))
    n_tok = pa.array(lens.astype(np.int32))
    source = pa.array(rng.choice(SOURCES, size=n_docs), pa.string())
    return pa.table(
        {"doc_id": doc_ids, "tokens": tokens, "n_tok": n_tok, "source": source}
    )


class _SegmentBuffer:
    """Accumulates event rows for one binlog segment, flushes to parquet."""

    def __init__(self, extra_cols: list[str]):
        self.extra_cols = list(extra_cols)
        self.rows: dict[str, list] = {
            k: []
            for k in (
                "entry_type", "event_type", "gtid_seq", "binlog_file",
                "binlog_pos", "server_id", "execute_ts", "schema_name",
                "table_name", "txn_id", "is_ddl", "sql",
            )
        }
        # before/after images: doc_id/source/n_tok scalars, tokens as
        # (start, end) slices into the shared pool (-1 = null image)
        self.b_doc: list = []; self.b_src: list = []; self.b_ntok: list = []
        self.b_lo: list = []; self.b_hi: list = []
        self.a_doc: list = []; self.a_src: list = []; self.a_ntok: list = []
        self.a_lo: list = []; self.a_hi: list = []
        self.b_extra: dict[str, list] = {c: [] for c in extra_cols}
        self.a_extra: dict[str, list] = {c: [] for c in extra_cols}

    def __len__(self):
        return len(self.rows["entry_type"])

    def add(self, entry_type, event_type, gtid, file, pos, ts, schema, table,
            txn, is_ddl, sql, before=None, after=None):
        r = self.rows
        r["entry_type"].append(entry_type)
        r["event_type"].append(event_type)
        r["gtid_seq"].append(gtid)
        r["binlog_file"].append(file)
        r["binlog_pos"].append(pos)
        r["server_id"].append(1)
        r["execute_ts"].append(ts)
        r["schema_name"].append(schema)
        r["table_name"].append(table)
        r["txn_id"].append(txn)
        r["is_ddl"].append(is_ddl)
        r["sql"].append(sql)
        for (img, doc, src, ntok, lo, hi, extra) in (
            (before, self.b_doc, self.b_src, self.b_ntok, self.b_lo, self.b_hi, self.b_extra),
            (after, self.a_doc, self.a_src, self.a_ntok, self.a_lo, self.a_hi, self.a_extra),
        ):
            if img is None:
                doc.append(None); src.append(None); ntok.append(None)
                lo.append(-1); hi.append(-1)
                for c in self.extra_cols:
                    extra[c].append(None)
            else:
                doc.append(img["doc_id"]); src.append(img["source"])
                ntok.append(img["n_tok"])
                lo.append(img["tok_lo"]); hi.append(img["tok_hi"])
                for c in self.extra_cols:
                    extra[c].append(img.get(c))

    def _image_struct(self, doc, src, ntok, lo, hi, extra, pool) -> pa.StructArray:
        lo_a = np.asarray(lo, dtype=np.int64)
        hi_a = np.asarray(hi, dtype=np.int64)
        null_mask = lo_a < 0
        # Gather token slices (non-contiguous for before-images) into one
        # values buffer; vectorized via repeat/cumsum index arithmetic.
        lens = np.where(null_mask, 0, hi_a - lo_a)
        offsets = np.zeros(len(lo_a) + 1, dtype=np.int64)
        np.cumsum(lens, out=offsets[1:])
        total = int(offsets[-1])
        if total:
            starts = np.where(null_mask, 0, lo_a)
            idx = np.repeat(starts, lens) + (
                np.arange(total) - np.repeat(offsets[:-1], lens)
            )
            values = pool[idx]
        else:
            values = np.empty(0, dtype=np.int32)
        tokens = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()), pa.array(values),
            mask=pa.array(null_mask),
        )
        arrays = [
            pa.array(doc, pa.string()), tokens,
            pa.array(ntok, pa.int32()), pa.array(src, pa.string()),
        ]
        fields = [pa.field(n, t) for n, t in BASE_FIELDS]
        for c in self.extra_cols:
            arrays.append(pa.array(extra[c], pa.string()))
            fields.append(pa.field(c, pa.string()))
        return pa.StructArray.from_arrays(
            arrays, fields=fields, mask=pa.array(null_mask)
        )

    def flush(self, path: str, pool: np.ndarray) -> None:
        r = self.rows
        cols: dict[str, pa.Array] = {
            "entry_type": pa.array(r["entry_type"], pa.string()),
            "event_type": pa.array(r["event_type"], pa.string()),
            "gtid_seq": pa.array(r["gtid_seq"], pa.int64()),
            "binlog_file": pa.array(r["binlog_file"], pa.string()),
            "binlog_pos": pa.array(r["binlog_pos"], pa.int64()),
            "server_id": pa.array(r["server_id"], pa.int64()),
            "execute_ts": pa.array(r["execute_ts"], pa.timestamp("us")),
            "schema_name": pa.array(r["schema_name"], pa.string()),
            "table_name": pa.array(r["table_name"], pa.string()),
            "txn_id": pa.array(r["txn_id"], pa.string()),
            "is_ddl": pa.array(r["is_ddl"], pa.bool_()),
            "sql": pa.array(r["sql"], pa.string()),
            "before": self._image_struct(
                self.b_doc, self.b_src, self.b_ntok, self.b_lo, self.b_hi,
                self.b_extra, pool),
            "after": self._image_struct(
                self.a_doc, self.a_src, self.a_ntok, self.a_lo, self.a_hi,
                self.a_extra, pool),
        }
        # small row groups keep the segment SPLITTABLE: parquet scans
        # parallelize per row group, and a single-group 100k-row segment
        # would cap scan parallelism at n_files regardless of cores
        pq.write_table(pa.table(cols), path, compression="zstd",
                       row_group_size=16384)


class _TokenPool:
    """Growing int32 token pool; slices identify every row image's tokens."""

    def __init__(self, rng: np.random.Generator, chunk: int = 1 << 20):
        self.rng = rng
        self.chunk = chunk
        self.buf = rng.integers(0, VOCAB, size=chunk, dtype=np.int32)
        self.used = 0

    def alloc(self, n: int) -> tuple[int, int]:
        while self.used + n > len(self.buf):
            # geometric growth — appending fixed chunks was O(total²) once
            # payloads got realistic (hundreds of tokens per sequence)
            grow = max(self.chunk, len(self.buf))
            self.buf = np.concatenate(
                [self.buf,
                 self.rng.integers(0, VOCAB, size=grow, dtype=np.int32)]
            )
        lo = self.used
        self.used += n
        return lo, lo + n


def generate_cdc_log(out_dir: str, spec: CdcLogSpec,
                     base: pa.Table | None = None) -> dict:
    """Write the event log segments; return a manifest dict.

    ``base`` is the pre-existing tokseq table (its docs are live before the
    log starts) — pass the table written to the sink's initial snapshot so
    the oracle and the engine start from the same state.
    """
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(spec.seed)
    pool = _TokenPool(rng)

    # live set: doc_id -> image dict (tok slices point into pool)
    live: dict[str, dict] = {}
    if base is not None:
        n = base.num_rows
        lens = base.column("n_tok").to_numpy(zero_copy_only=False)
        lo, _ = pool.alloc(int(lens.sum()))
        # flatten(), NEVER .values: on a sliced ListArray chunk .values
        # returns the WHOLE underlying buffer (offset ignored), so a base
        # table whose chunk layout includes slices would silently misalign
        # every token slice against `lens` — a chunk-layout-dependent
        # corruption channel (VERDICT r03 next #1b). flatten() honors the
        # chunk's offset/length and skips null slots; determinism across
        # chunk layouts is pinned by tests/test_determinism.py.
        flat = pa.concat_arrays(
            [c.flatten() for c in base.column("tokens").chunks]
        ).to_numpy(zero_copy_only=False).astype(np.int32)
        if len(flat) != int(lens.sum()):
            raise ValueError(
                f"token pool misalignment: flattened {len(flat)} tokens but "
                f"n_tok sums to {int(lens.sum())} — base table n_tok "
                f"disagrees with its token arrays")
        pool.buf[lo : lo + len(flat)] = flat
        offs = np.zeros(n + 1, dtype=np.int64); np.cumsum(lens, out=offs[1:])
        docs = base.column("doc_id").to_pylist()
        srcs = base.column("source").to_pylist()
        for i in range(n):
            live[docs[i]] = {
                "doc_id": docs[i], "source": srcs[i], "n_tok": int(lens[i]),
                "tok_lo": lo + int(offs[i]), "tok_hi": lo + int(offs[i + 1]),
            }
    next_doc = (base.num_rows if base is not None else 0) + spec.doc_offset
    live_keys: list[str] = list(live.keys())   # sampling view (may be stale)
    hot = live_keys[: spec.hot_keys]

    extra_cols: list[str] = []                  # widened by ADD COLUMN DDLs
    # declared type family per added column: values travel as STRINGS (the
    # FlatMessage model — every data value is a string on the wire; the
    # sink casts to its column type, client-adapter rdb row-39 analog) but
    # MySQL could never emit a non-numeric string for an INT column, so the
    # generated value must conform to the declared type
    extra_types: dict[str, str] = {}
    renames: dict[str, str] = {}
    # the emitted table name follows RENAME TABLE (rename-follow end-to-end:
    # post-rename DML arrives under the NEW name, as MySQL would write it)
    cur_name = list(spec.table)
    ddl_iter = iter(sorted(spec.ddl_script))
    next_ddl = next(ddl_iter, None)

    gtid = spec.gtid_offset
    pos = 4
    file_no = 1 + spec.file_no_offset
    ts_us = 1_700_000_000_000_000 + spec.gtid_offset * 1_000  # epoch, +1ms/event
    seg = _SegmentBuffer(extra_cols)
    files: list[str] = []
    stats = {"INSERT": 0, "UPDATE": 0, "DELETE": 0, "pk_change": 0,
             "other_table": 0, "ddl": 0, "txns": 0}

    def segment_name() -> str:
        return f"mysql-bin.{file_no:06d}"

    def roll_segment(force: bool = False):
        nonlocal seg, file_no, pos
        if len(seg) >= spec.events_per_file or force:
            if len(seg):
                p = os.path.join(out_dir, segment_name() + ".parquet")
                seg.flush(p, pool.buf)
                files.append(os.path.basename(p))
                file_no += 1
                pos = 4
            seg = _SegmentBuffer(extra_cols)

    def fresh_image(doc_id: str) -> dict:
        n = int(rng.integers(spec.min_tok, spec.max_tok + 1))
        lo, hi = pool.alloc(n)
        img = {
            "doc_id": doc_id,
            "source": SOURCES[int(rng.integers(0, len(SOURCES)))],
            "n_tok": n, "tok_lo": lo, "tok_hi": hi,
        }
        for c in extra_cols:
            if extra_types.get(c) == "int":
                img[c] = str(int(rng.integers(0, 1000)))
            elif extra_types.get(c) == "float":
                # dot-decimal with 2 digits: exact in float64 compare
                img[c] = f"{int(rng.integers(0, 10000))}.{int(rng.integers(0, 100)):02d}"
            else:
                img[c] = f"{c[:2]}{int(rng.integers(0, 26)):02d}"
        return img

    def pick_live() -> str | None:
        # try hot set first per skew knob, then rejection-sample live_keys
        if hot and spec.hot_frac > 0 and rng.random() < spec.hot_frac:
            k = hot[int(rng.integers(0, len(hot)))]
            if k in live:
                return k
        for _ in range(8):
            if not live_keys:
                return None
            k = live_keys[int(rng.integers(0, len(live_keys)))]
            if k in live:
                return k
        # compact the stale sampling view
        live_keys[:] = list(live.keys())
        return live_keys[int(rng.integers(0, len(live_keys)))] if live_keys else None

    def emit_ddl(sql: str):
        nonlocal gtid, pos, ts_us
        gtid += 1
        stats["ddl"] += 1
        txn = f"xid-{gtid}"
        up = sql.upper()
        if "TRUNCATE" in up:
            etype = "TRUNCATE"
        elif up.startswith("ALTER"):
            etype = "ALTER"
        else:
            etype = "QUERY"
        seg.add("ROWDATA", etype, gtid, segment_name(), pos, ts_us,
                cur_name[0], cur_name[1], txn, True, sql)
        pos += 120
        ts_us += 1000
        _apply_ddl_to_generator(sql)

    def _apply_ddl_to_generator(sql: str):
        """Mutate generator-side schema/live-set the way MySQL would."""
        nonlocal seg
        import re
        up = sql.strip().rstrip(";")
        m = re.match(r"(?i)alter\s+table\s+\S+\s+add\s+column\s+(\w+)\s+(\w+)", up)
        if m:
            col, dtype = m.group(1), m.group(2).lower()
            # segment roll: subsequent files carry the widened struct
            roll_segment(force=True)
            extra_cols.append(col)
            if dtype in ("int", "integer", "bigint", "smallint", "tinyint",
                         "mediumint"):
                extra_types[col] = "int"
            elif dtype in ("float", "double", "real"):
                extra_types[col] = "float"
            seg = _SegmentBuffer(extra_cols)
            return
        m = re.match(r"(?i)alter\s+table\s+\S+\s+rename\s+column\s+(\w+)\s+to\s+(\w+)", up)
        if m:
            old, new = m.group(1), m.group(2)
            renames[old] = new
            if old in extra_cols:
                roll_segment(force=True)
                extra_cols[extra_cols.index(old)] = new
                if old in extra_types:
                    extra_types[new] = extra_types.pop(old)
                for img in live.values():
                    if old in img:
                        img[new] = img.pop(old)
                seg = _SegmentBuffer(extra_cols)
            return
        m = re.match(r"(?i)alter\s+table\s+\S+\s+drop\s+column\s+(\w+)", up)
        if m:
            col = m.group(1)
            if col in extra_cols:
                roll_segment(force=True)
                extra_cols.remove(col)
                extra_types.pop(col, None)
                for img in live.values():
                    img.pop(col, None)
                seg = _SegmentBuffer(extra_cols)
            return
        m = (re.match(r"(?i)rename\s+table\s+([\w.`$]+)\s+to\s+([\w.`$]+)", up)
             or re.match(r"(?i)alter\s+table\s+([\w.`$]+)\s+rename\s+(?:to|as)\s+([\w.`$]+)", up))
        if m:
            new_name = m.group(2).strip("`")
            if "." in new_name:
                cur_name[0], cur_name[1] = new_name.split(".", 1)
            else:
                cur_name[1] = new_name
            return
        if re.match(r"(?i)truncate\s", up):
            live.clear()
            live_keys.clear()
            hot.clear()

    emitted = 0
    op_cdf = np.cumsum(spec.op_mix)
    while emitted < spec.n_events:
        # DDLs are their own single-event "transactions" in binlog order
        while next_ddl is not None and emitted >= next_ddl[0]:
            emit_ddl(next_ddl[1])
            next_ddl = next(ddl_iter, None)
            roll_segment()

        gtid += 1
        stats["txns"] += 1
        txn = f"xid-{gtid}"
        txn_size = min(int(rng.integers(1, spec.txn_max + 1)),
                       spec.n_events - emitted, 1024)
        seg.add("TRANSACTIONBEGIN", "QUERY", gtid, segment_name(), pos, ts_us,
                cur_name[0], cur_name[1], txn, False, "BEGIN")
        pos += 60
        for _ in range(txn_size):
            # non-subscribed table noise
            if spec.other_table_frac > 0 and rng.random() < spec.other_table_frac:
                img = fresh_image(f"other{int(rng.integers(0, 10_000)):06d}")
                seg.add("ROWDATA", "INSERT", gtid, segment_name(), pos, ts_us,
                        "train", "other_tbl", txn, False, None, None, img)
                pos += 80
                ts_us += 1000
                stats["other_table"] += 1

            u = rng.random()
            if u < op_cdf[0] or not live:
                doc_id = f"doc{next_doc:09d}"
                next_doc += 1
                img = fresh_image(doc_id)
                live[doc_id] = img
                live_keys.append(doc_id)
                if len(hot) < spec.hot_keys:
                    hot.append(doc_id)
                seg.add("ROWDATA", "INSERT", gtid, segment_name(), pos, ts_us,
                        cur_name[0], cur_name[1], txn, False, None, None, img)
                stats["INSERT"] += 1
            elif u < op_cdf[1]:
                k = pick_live()
                if k is None:
                    continue
                before = live.pop(k)
                if rng.random() < spec.pk_change_frac:
                    new_key = f"doc{next_doc:09d}"
                    next_doc += 1
                    stats["pk_change"] += 1
                else:
                    new_key = k
                after = fresh_image(new_key)
                live[new_key] = after
                if new_key != k:
                    live_keys.append(new_key)
                seg.add("ROWDATA", "UPDATE", gtid, segment_name(), pos, ts_us,
                        cur_name[0], cur_name[1], txn, False, None, before, after)
                stats["UPDATE"] += 1
            else:
                k = pick_live()
                if k is None:
                    continue
                before = live.pop(k)
                seg.add("ROWDATA", "DELETE", gtid, segment_name(), pos, ts_us,
                        cur_name[0], cur_name[1], txn, False, None, before, None)
                stats["DELETE"] += 1
            pos += 80
            ts_us += 1000
            emitted += 1
        seg.add("TRANSACTIONEND", "QUERY", gtid, segment_name(), pos, ts_us,
                cur_name[0], cur_name[1], txn, False, "COMMIT")
        pos += 40
        roll_segment()
    # trailing DDLs pinned past the end
    while next_ddl is not None:
        emit_ddl(next_ddl[1])
        next_ddl = next(ddl_iter, None)
    roll_segment(force=True)

    manifest = {
        "n_events": spec.n_events,
        "files": files,
        "final_lsn": encode_lsn_py(gtid, f"mysql-bin.{file_no:06d}", pos),
        "stats": stats,
        "final_extra_cols": extra_cols,
        "seed": spec.seed,
    }
    with open(os.path.join(out_dir, "log_manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    return manifest


def duplicate_tail(out_dir: str, n_files: int = 1) -> list[str]:
    """Re-emit the last n segment files under new names — the at-least-once
    duplicate-delivery fixture (FIXTURES.md §2 knob). The engine must apply
    them as no-ops (idempotent MERGE keyed on (doc_id, _source_lsn))."""
    with open(os.path.join(out_dir, "log_manifest.json")) as f:
        manifest = json.load(f)
    dups = []
    last_no = len(manifest["files"])
    for i, name in enumerate(manifest["files"][-n_files:]):
        dup = f"mysql-bin.{last_no + 1 + i:06d}.parquet"
        t = pq.read_table(os.path.join(out_dir, name))
        pq.write_table(t, os.path.join(out_dir, dup), compression="zstd")
        dups.append(dup)
    manifest["files"].extend(dups)
    manifest["duplicated"] = dups
    with open(os.path.join(out_dir, "log_manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    return dups
