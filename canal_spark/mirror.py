"""Multi-table mirror replay: one event log → one LakeTable sink per
source table (whole-database sync).

The reference's instance subscribes to a FILTER, not a table — an rdb /
mirror adapter then fans each (schema, table)'s DML into its own target
and mirrors DDL per table, creating targets on first sight
(client-adapter/rdb/.../RdbMirrorDbSyncService.java:50-140 — mirror mode
routes by ``database`` and materializes MirrorDbConfig per table;
RdbSyncService routes each SingleDml by its dbMapping). Here:

  read segments ONCE → envelope filter (the subscription regex)
    → discover the batch's source tables (one DISTINCT over two pushed
      columns — metadata-sized)
    → create sinks for unseen tables (schema from the typed after-image
      or a caller schema_factory; never for rename targets of an
      existing subscription — those stay with their original sink)
    → per sink: the standard single-table apply (DDL-split ranges, LWW
      collapse, pruned MERGE) gated to ITS subscription.

Per-sink work reuses ``pipeline.apply_events`` unchanged: each LakeTable
persists its own subscription (snapshot ``subscribed``), so the tracker,
rename-follow, per-range DML gates, ledger and LSN fences are all already
per-table. The per-sink gate is two pushed column equalities, so each
sink's jobs scan only its own row groups — table count multiplies small
pruned scans, not full passes.
"""

from __future__ import annotations

import json
import os
import re
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from canal_spark.pipeline import ReplayStats, apply_events, prepare_events, read_event_log
from canal_spark.schema.ddl import parse_ddl_statements
from canal_spark.schema.tracker import SchemaTracker
from canal_spark.table.lake import LakeTable


class LakeDatabase:
    """A directory of LakeTables keyed by source 'schema.table' name.

    The catalog key is the SOURCE name at sink-creation time and stays
    stable across RENAME TABLE (the sink's own snapshot carries the live
    subscription, exactly like DatabaseTableMeta keeps tracking a renamed
    table) — so `current_subscriptions` is derived from snapshots, never
    from the catalog."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = os.path.abspath(root)
        os.makedirs(self.root, exist_ok=True)
        self._catalog_path = os.path.join(self.root, "_catalog.json")
        self._catalog: dict[str, str] = {}
        if os.path.exists(self._catalog_path):
            with open(self._catalog_path) as f:
                self._catalog = json.load(f)

    def _save(self) -> None:
        tmp = self._catalog_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self._catalog, f, indent=1, sort_keys=True)
        os.replace(tmp, self._catalog_path)

    def names(self) -> list[str]:
        return sorted(self._catalog)

    def get(self, name: str) -> LakeTable | None:
        sub = self._catalog.get(name)
        if sub is None:
            return None
        return LakeTable(self.spark, os.path.join(self.root, sub))

    def create(self, name: str, schema: T.StructType, **kw) -> LakeTable:
        if name in self._catalog:
            raise ValueError(f"table {name!r} already exists")
        sub = re.sub(r"[^\w.]", "_", name)
        t = LakeTable.create(
            self.spark, os.path.join(self.root, sub), schema,
            subscribe=tuple(name.split(".", 1)), **kw)
        self._catalog[name] = sub
        self._save()
        return t

    def tables(self) -> dict[str, LakeTable]:
        return {n: self.get(n) for n in self.names()}

    def current_subscriptions(self) -> dict[str, tuple[str, str]]:
        """catalog name -> the (schema, table) its sink tracks NOW."""
        out = {}
        for n, t in self.tables().items():
            snap_sub = t.snap.get("subscribed")
            out[n] = tuple(snap_sub) if snap_sub else tuple(n.split(".", 1))
        return out

    def known_names(self) -> set[tuple[str, str]]:
        """Every (schema, table) any sink subscribes to NOW or EVER DID
        (catalog key + persisted rename history + current subscription).
        Events redelivered under a PAST name belong to that sink's history
        — they are gated/fenced by its per-range subscription, and must
        never read as an unseen table (first-sight fork)."""
        names: set[tuple[str, str]] = set()
        for n, t in self.tables().items():
            names.add(tuple(n.split(".", 1)))
            snap_sub = t.snap.get("subscribed")
            if snap_sub:
                names.add(tuple(snap_sub))
            for h in t.snap.get("subscribed_history", []):
                names.add(tuple(h))
        return names


def _infer_schema(events: DataFrame, sub: tuple[str, str],
                  key_col: str,
                  exclude: set[str] = frozenset()) -> T.StructType:
    """Sink schema from the typed after-image struct of this table's first
    events — the mirror adapter's create-on-first-sight path for logs that
    carry typed images. Wire logs (JSON images) must provide
    ``schema_factory`` instead: JSON carries no types.

    ``exclude``: columns provably introduced by THIS log's DDL. The typed
    image struct is log-global, so one table's ALTER widens every table's
    images; a first-sight sink must not be born with another table's
    column, and its OWN additions re-apply at the correct LSN range during
    the replay (DDL-split ranges), so they must not pre-exist either."""
    dt = events.schema["after"].dataType
    if not isinstance(dt, T.StructType):
        raise ValueError(
            f"cannot infer a schema for {sub[0]}.{sub[1]} from wire-format "
            "images; pass schema_factory=")
    if key_col not in dt.fieldNames():
        raise ValueError(f"inferred schema for {sub[0]}.{sub[1]} lacks "
                         f"key column {key_col!r}")
    return T.StructType([T.StructField(f.name, f.dataType) for f in dt.fields
                         if f.name == key_col or f.name not in exclude])


def mirror_apply(ev: DataFrame, db: LakeDatabase,
                 batch_id: str | None = None,
                 key_col: str = "doc_id",
                 n_buckets: int = 16,
                 schema_factory: Callable[[str], T.StructType] | None = None,
                 wire: bool = False,
                 salt_partitions: int | None = None,
                 merge_mode: str = "cow",
                 max_concurrency: int = 4,
                 dlq: str | None = None,
                 ) -> dict[str, ReplayStats]:
    """Fan one prepared event batch into one LakeTable per source table.
    Returns {catalog name: ReplayStats}. ``ev`` is envelope-filtered
    output of prepare_events/prepare_envelope (txn markers tolerated).

    Sinks are created on first sight of a table (CREATE TABLE DDL decode is
    out of scope — the schema comes from the typed after-image or
    ``schema_factory(name)``), EXCEPT names reachable by RENAME TABLE from
    an existing sink's subscription: those events belong to the renamed
    sink and must not fork into a second table.

    ``max_concurrency``: per-sink applies are submitted from a small driver
    thread pool (the reference applies per-table DML on pooled executors,
    client-adapter/rdb/.../RdbSyncService.java:52-131 executorThreads
    submit/get). Each sink's jobs are small pruned scans over the shared
    batch; serial submission would pay (tables × driver round-trips) of
    idle cluster per micro-batch, which dominates wall time at a 100-table
    mirror. Safe because every per-sink path is self-contained: its own
    LakeTable metadata directory, tracker, ledger and LSN fence; the shared
    input is read-only. 1 restores strictly serial apply."""
    dml = (F.col("entry_type") == "ROWDATA") & ~F.col("is_ddl")

    # tables present in this batch: distinct over two scan-pruned columns
    present = sorted(
        (r["schema_name"], r["table_name"])
        for r in ev.where(dml)
        .select("schema_name", "table_name").distinct().collect())

    # names covered by existing sinks — their CURRENT subscription plus
    # every name it renames into during this batch (fold the batch's DDL
    # list through the tracker's pure follow rule)
    ddls = sorted(
        (r["lsn"], r["sql"])
        for r in ev.where(F.col("is_ddl")).select("lsn", "sql").collect())
    ddl_cmds = [c for _, sql in ddls for c in parse_ddl_statements(sql or "")]
    # seed coverage with every name any sink EVER owned (catalog key +
    # rename history + current) — a redelivered batch can carry events
    # under a PAST subscription, and those must route to the existing
    # sink's (fenced, no-op) apply, never to first-sight creation
    covered: set[tuple[str, str]] = set(db.known_names())
    for sub in db.current_subscriptions().values():
        cur = sub
        for cmd in ddl_cmds:
            cur = SchemaTracker.follow(cmd, cur)
            covered.add(cur)

    def rename_closure(sub: tuple[str, str]) -> set[tuple[str, str]]:
        cur, seen = sub, {sub}
        for cmd in ddl_cmds:
            cur = SchemaTracker.follow(cmd, cur)
            seen.add(cur)
        return seen

    def ddl_born(own: set[tuple[str, str]]) -> set[str]:
        """Columns this log's DDL introduces, to exclude from first-sight
        inference: every ADD (a sink's own ADDs re-apply at their LSN range
        during the replay), plus the post-name of OTHER tables'
        CHANGE/RENAME COLUMN (the sink's own renames must keep the column —
        the merged struct no longer carries the pre-rename name)."""
        out = {c.column for c in ddl_cmds if c.kind == "ADD_COLUMN"}
        out |= {c.new_name for c in ddl_cmds
                if c.kind in ("CHANGE_COLUMN", "RENAME_COLUMN")
                and c.new_name and (c.schema, c.table) not in own}
        return out

    for sub in present:
        if sub in covered:
            continue
        # a first-sight name reachable by RENAME from an EARLIER present
        # name is that root's later identity, not a second table
        if any(p != sub and p not in covered and sub in rename_closure(p)
               for p in present):
            continue
        name = f"{sub[0]}.{sub[1]}"
        schema = (schema_factory(name) if schema_factory is not None
                  else _infer_schema(ev, sub, key_col,
                                     exclude=ddl_born(rename_closure(sub))))
        db.create(name, schema, key_col=key_col, n_buckets=n_buckets,
                  merge_mode=merge_mode)

    items = list(db.tables().items())

    def _one(name: str, table: LakeTable) -> tuple[str, ReplayStats]:
        return name, apply_events(
            ev, table,
            batch_id=None if batch_id is None else f"{batch_id}/{name}",
            salt_partitions=salt_partitions, wire=wire,
            # per-sink DLQ subdirectory: a poison winner quarantines in the
            # sink it was routed to, keeping the evidence attributable
            dlq=None if dlq is None else os.path.join(dlq, name))

    if max_concurrency > 1 and len(items) > 1:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(min(max_concurrency, len(items))) as pool:
            return dict(pool.map(lambda it: _one(*it), items))
    return dict(_one(*it) for it in items)


def mirror_replay(spark: SparkSession, log_dir: str, db: LakeDatabase,
                  table_regex: str = r"^train\.[\w$]+$",
                  batch_id: str | None = None,
                  key_col: str = "doc_id",
                  n_buckets: int = 16,
                  schema_factory: Callable[[str], T.StructType] | None = None,
                  wire: bool = False,
                  salt_partitions: int | None = None,
                  merge_mode: str = "cow",
                  files: list[str] | None = None,
                  max_concurrency: int = 4,
                  dlq: str | None = None,
                  ) -> dict[str, ReplayStats]:
    """Batch mirror: replay one whole log into the LakeDatabase (see
    mirror_apply for the per-batch semantics)."""
    raw = read_event_log(spark, log_dir, files=files)
    ev = prepare_events(raw, table_regex=table_regex)
    return mirror_apply(ev, db, batch_id=batch_id, key_col=key_col,
                        n_buckets=n_buckets, schema_factory=schema_factory,
                        wire=wire, salt_partitions=salt_partitions,
                        merge_mode=merge_mode,
                        max_concurrency=max_concurrency, dlq=dlq)
