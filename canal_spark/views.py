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

from typing import Callable

from pyspark.sql import DataFrame
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
        return self.table.merge_apply(enriched, batch_id=batch_id,
                                      max_lsn=max_lsn)

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
        affected = (
            self.table.read_raw()
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
        return self.table.merge_apply(refreshed, batch_id=batch_id)


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
