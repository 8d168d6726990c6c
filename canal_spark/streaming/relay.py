"""Continuous table→table sync off a LakeTable changelog feed.

The reference's primary consumption loop is a client that pulls change
batches with positions and acks to advance — CanalServerWithEmbedded
getWithoutAck/ack (server/.../CanalServerWithEmbedded.java:331-446), with
the MQ workers (server/.../CanalMQStarter.java:152-216) running the same
get → deliver → ack cycle. This module rebuilds that loop on the lake:

- the *server* is any LakeTable created with ``changelog=True`` — every
  merge commit lands its net batch under ``changelog/``;
- the *client* is ``relay_step``: pull the feed for versions
  (ack, head], LWW-collapse, MERGE into the downstream table.

The ack position is not stored beside the data — it IS the data commit:
the batch id ``relay/v{head}`` rides the downstream table's exactly-once
ledger, so the ack advances atomically with the rows it acknowledges.
A crash before the commit re-pulls the same range on resume and the
ledger + per-key LSN fence turn the redelivery into a no-op — the same
ack-after-apply contract the reference keeps in its meta manager
(meta/.../FileMixedMetaManager.java cursor persistence).

Scale: each poll reads only the changelog files of the pulled versions
(O(batch), never the table), and the MERGE cost is the downstream
table's normal bucket-pruned apply.
"""

from __future__ import annotations

from canal_spark.operators.lww import collapse_lww
from canal_spark.table.lake import LakeTable

RELAY_PREFIX = "relay"


def acked_version(dst: LakeTable, prefix: str = RELAY_PREFIX) -> int:
    """The relay's resume position: the durable ``relay_acks`` snapshot
    field, max'd with a scan of the exactly-once ledger's ``{prefix}/v{N}``
    batch ids. The ledger alone is NOT durable enough — it keeps the last
    LEDGER_KEEP (256) batch ids, so a relay idle across >256 downstream
    commits would lose its position and re-pull the whole feed from v0
    (correct under the LSN fence, but O(feed) instead of O(batch)); the
    snapshot field survives eviction, and taking the max keeps resume
    correct if a crash lands between the data commit and the ack meta
    commit (the reference persists its cursor after apply the same way,
    meta/.../FileMixedMetaManager.java)."""
    mx = int(dst.snap.get("relay_acks", {}).get(prefix, 0))
    for b in dst.snap.get("applied_batches", []):
        if b.startswith(f"{prefix}/v"):
            try:
                mx = max(mx, int(b.rsplit("v", 1)[1]))
            except ValueError:
                pass
    return mx


def _record_ack(dst: LakeTable, prefix: str, head: int) -> None:
    """Advance the durable ack (monotonic; one metadata-only commit)."""
    acks = dict(dst.snap.get("relay_acks", {}))
    if int(acks.get(prefix, 0)) < head:
        acks[prefix] = head
        dst._commit_meta(relay_acks=acks)


def relay_step(src: LakeTable, dst: LakeTable,
               prefix: str = RELAY_PREFIX,
               expire_acked: bool = False) -> dict:
    """One poll of the client loop: get (ack, head] → apply → ack.

    Mirrors upstream schema evolution before applying — from the SOURCE
    SNAPSHOT, the authority on the live schema (the adapters' DDL
    mirroring, client-adapter/rdb/.../RdbMirrorDbSyncService.java:50-90):
    columns the source has and the mirror lacks become ADD COLUMNs,
    columns the mirror has and the source dropped become DROP COLUMNs
    (both metadata-only). The feed's own columns can't drive this — a
    slice straddling an upstream ADD/DROP carries the UNION of its
    commits' schemas (mergeSchema), so feed-missing columns NULL-fill and
    feed-extra columns (values for a column the source has since dropped)
    fall away with the drop, exactly matching the source's final state.
    Found by probe: inferring ADDs from feed columns and selecting every
    mirror column from the feed crashed the poll loop permanently on the
    first post-DROP slice (AnalysisException on the dropped column, ack
    never advances). Also propagates a metadata TRUNCATE fence the feed
    cannot carry.

    ``expire_acked``: after a successful apply, drop the feed files this
    relay just consumed (single-consumer deployments; the reference frees
    acked events from its ring buffer the same way,
    store/.../MemoryEventStoreWithBuffer.java:463-519). Leave False when
    several consumers share the feed and expire on the slowest ack.
    """
    src.refresh()
    dst.refresh()
    ack = acked_version(dst, prefix)
    head = src.version

    # TRUNCATE is a metadata commit — invisible to the row feed by design;
    # the fence LSN is what keeps late pre-truncate rows dead downstream
    src_trunc = src.snap.get("truncate_lsn", "")
    if src_trunc and src_trunc > dst.snap.get("truncate_lsn", ""):
        dst.truncate(lsn=src_trunc)

    if head <= ack:
        return {"applied": False, "ack": ack, "head": head}

    src_types = {f.name: f.dataType for f in src.schema().fields}
    for name, dtype in src_types.items():
        if name not in dst.logical_columns():
            dst.alter_add_column(name, dtype)
    for name in list(dst.logical_columns()):
        if name not in src_types and name != dst.key_col:
            dst.alter_drop_column(name)

    from pyspark.sql import functions as F

    feed = src.read_changes(since_version=ack, until_version=head)
    net = collapse_lww(feed.drop("_commit_version"), key=dst.key_col)
    cols = dst.logical_columns()
    dtypes = dst.schema()
    net = net.select(
        *[F.col(c) if c in net.columns
          else F.lit(None).cast(dtypes[c].dataType).alias(c) for c in cols],
        "op", "lsn")
    res = dst.merge_apply(net, batch_id=f"{prefix}/v{head:08d}")
    _record_ack(dst, prefix, head)
    if expire_acked and not res.get("skipped"):
        src.expire_changelog(upto_version=head)
    return {"applied": not res.get("skipped", False), "ack": head,
            "head": head, **{k: v for k, v in res.items() if k != "skipped"}}


def relay_until_idle(src: LakeTable, dst: LakeTable,
                     prefix: str = RELAY_PREFIX,
                     expire_acked: bool = False,
                     max_polls: int = 1000) -> list[dict]:
    """Poll until the downstream has acked the upstream head (a drained
    feed), like the MQ worker loop draining its store. Returns the per-poll
    stats; a live deployment would run the same call under any scheduler
    tick instead of a tight loop."""
    out: list[dict] = []
    for _ in range(max_polls):
        r = relay_step(src, dst, prefix=prefix, expire_acked=expire_acked)
        out.append(r)
        if not r["applied"]:
            break
    return out
