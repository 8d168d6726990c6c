"""SchemaTracker — the versioned live schema registry.

Replaces the reference's TableMetaTSDB: Canal replays every DDL into an AST
schema repository (MemoryTableMeta.apply/find,
parse/.../tsdb/MemoryTableMeta.java:68-138) and can roll the registry back to
any binlog position via snapshot+history
(parse/.../tsdb/DatabaseTableMeta.java:161-181, 390-460).

Here the tracker folds DDL events (in LSN order) into the active column list
AND mirrors each one onto the LakeTable sink as a metadata-only commit
(RdbMirrorDbSyncService.executeDdl analog,
client-adapter/rdb/.../RdbMirrorDbSyncService.java:50-90). The LakeTable's
own snapshot history *is* the durable TSDB: every DDL lands as a table
version, and ``last_ddl_lsn`` in the snapshot fences replayed/duplicate DDL
(idempotence under at-least-once delivery).
"""

from __future__ import annotations

from canal_spark.schema.ddl import DdlCommand, parse_ddl_statements
from canal_spark.table.lake import LakeTable


class SchemaTracker:
    def __init__(self, table: LakeTable, subscribed: tuple[str, str] = ("train", "tokseq")):
        self.table = table
        # a RENAME TABLE commits the new subscription into the snapshot;
        # later trackers (one is built per replay range) must resume it
        # rather than reset to the default (DatabaseTableMeta keeps
        # tracking the renamed table across restarts)
        snap_sub = table.snap.get("subscribed")
        self.subscribed = tuple(snap_sub) if snap_sub else subscribed

    def active_columns(self) -> list[str]:
        return self.table.logical_columns()

    def last_ddl_lsn(self) -> str:
        return self.table.snap.get("last_ddl_lsn", "")

    def apply_ddl(self, sql: str, lsn: str) -> list[DdlCommand]:
        """Apply one DDL statement at LSN to the sink — a multi-clause
        ALTER applies each clause in order under ONE LSN fence (idempotent:
        replays are fenced by last_ddl_lsn, no-op statements are skipped)."""
        cmds = parse_ddl_statements(sql)
        if lsn <= self.last_ddl_lsn():
            return []
        applied: list[DdlCommand] = []
        for cmd in cmds:
            if self._apply_one(cmd, lsn):
                applied.append(cmd)
        # fence the LSN in the same snapshot lineage even if every clause
        # was a no-op — a replayed statement must not re-enter the loop
        self.table._commit_meta(last_ddl_lsn=lsn)
        return applied

    @staticmethod
    def relevant(cmd: DdlCommand, subscribed: tuple[str, str]) -> bool:
        """Does ``cmd`` target the subscribed table? (Pure — usable to
        pre-classify a DDL list without mutating any sink state.)"""
        if cmd.kind == "IGNORE":
            return False
        return cmd.table is None or (
            (cmd.schema or subscribed[0]), cmd.table
        ) == subscribed

    @staticmethod
    def follow(cmd: DdlCommand,
               subscribed: tuple[str, str]) -> tuple[str, str]:
        """Subscription after ``cmd``: RENAME TABLE moves it (the
        DatabaseTableMeta keeps tracking the renamed table), everything
        else leaves it unchanged."""
        if cmd.kind != "RENAME_TABLE" or not SchemaTracker.relevant(
                cmd, subscribed):
            return subscribed
        new = cmd.new_name or ""
        if "." in new:
            return tuple(new.split(".", 1))
        return (subscribed[0], new)

    def _apply_one(self, cmd: DdlCommand, lsn: str) -> bool:
        if not self.relevant(cmd, self.subscribed):
            return False

        cols = self.table.logical_columns()
        if cmd.kind == "ADD_COLUMN":
            self.table.alter_add_column(cmd.column, cmd.dtype,
                                        position=cmd.position)
        elif cmd.kind == "RENAME_COLUMN":
            if cmd.column not in cols:
                return False
            self.table.alter_rename_column(cmd.column, cmd.new_name)
        elif cmd.kind == "MODIFY_COLUMN":
            if cmd.column not in cols:
                return False
            self.table.alter_modify_column(cmd.column, cmd.dtype)
        elif cmd.kind == "CHANGE_COLUMN":
            if cmd.column not in cols:
                return False
            self.table.alter_modify_column(cmd.column, cmd.dtype,
                                           new_name=cmd.new_name)
        elif cmd.kind == "DROP_COLUMN":
            if cmd.column not in cols:
                return False
            self.table.alter_drop_column(cmd.column)
        elif cmd.kind == "TRUNCATE":
            self.table.truncate(lsn=lsn)
        elif cmd.kind == "RENAME_TABLE":
            # the subscription follows the rename (DatabaseTableMeta keeps
            # tracking the renamed table); record it in the snapshot, and
            # append the OLD name to the persisted history — the mirror's
            # first-sight routing must recognize redelivered events under
            # ANY name this sink ever subscribed to (found by the mirror
            # fuzz: a redelivered pre-rename batch forked a second sink
            # under the old name)
            old = self.subscribed
            self.subscribed = self.follow(cmd, self.subscribed)
            hist = [list(h) for h in
                    self.table.snap.get("subscribed_history", [])]
            if list(old) not in hist:
                hist.append(list(old))
            self.table._commit_meta(subscribed=list(self.subscribed),
                                    subscribed_history=hist)
        else:
            return False
        return True
