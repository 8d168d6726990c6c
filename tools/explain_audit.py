"""Plan audit: assert the physical plans have the shapes PERF.md claims.

Checks (per query): parquet PushedFilters reach the scan, projections prune
ReadSchema, WholeStageCodegen spans cover the hot path, small dims broadcast,
and the LWW collapse is a partial+final hash aggregate (map-side combine).
Prints PASS/FAIL per assertion plus the formatted plans to
.work/explain_audit.txt for inspection.
"""

from __future__ import annotations

import os
import re
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")


def main() -> int:
    from canal_spark.functions import relational
    from canal_spark.operators.filters import envelope_filter
    from canal_spark.operators.lww import changes_from_events, collapse_lww
    from canal_spark.pipeline import read_event_log, with_lsn
    from canal_spark.session import get_spark
    from bench import ensure_fixture
    from pyspark.sql import functions as F

    spark = get_spark("explain_audit", master="local[4]", shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    log_dir, _ = ensure_fixture(sf_dir, 20_000)

    checks: list[tuple[str, bool, str]] = []
    out_lines: list[str] = []

    def check(name: str, df, *patterns: str):
        p = plan_of(df)
        out_lines.append(f"===== {name} =====\n{p}\n")
        for pat in patterns:
            ok = re.search(pat, p) is not None
            checks.append((f"{name}: /{pat}/", ok, p))

    # 1. envelope filter pushes to the parquet scan of the event log
    raw = read_event_log(spark, log_dir)
    ev = envelope_filter(raw).select("table_name", "event_type")
    check("envelope_filter_pushdown", ev,
          r"PushedFilters: \[.*IsNotNull")     # filter reached the scan

    # 2. column pruning: 2-column projection reads 2 leaf columns
    proj = raw.select("gtid_seq", "binlog_pos")
    p = plan_of(proj)
    out_lines.append(f"===== projection_pruning =====\n{p}\n")
    m = re.search(r"ReadSchema: struct<([^>]*)>", p)
    pruned = m is not None and len(m.group(1).split(",")) == 2
    checks.append(("projection_pruning: ReadSchema has exactly 2 cols", pruned, p))

    # 3. LWW collapse = partial + final aggregate (map-side combine before
    # the shuffle — the skew-critical property). max_by over an
    # array-bearing struct cannot use HashAggregate (needs a fixed-size
    # mutable buffer) so Spark plans SortAggregate; the partial_max_by
    # before the Exchange is what bounds hot-key fan-in.
    events = with_lsn(envelope_filter(raw)).where(F.col("entry_type") == "ROWDATA")
    net = collapse_lww(changes_from_events(events.where(~F.col("is_ddl"))))
    # packed-string formulation (PERF.md #12): partial_max of the packed
    # (lsn ∥ op ∥ json) string BEFORE the Exchange = map-side combine,
    # final max after — hot keys still emit one row per upstream partition
    check("lww_collapse_partial_agg", net,
          r"(?s)partial_max\(concat_ws.*Exchange.*Functions \[1\]: \[max\(")

    # 4. dim join broadcasts the small side
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    customer = spark.read.parquet(os.path.join(sf_dir, "customer.parquet"))
    check("dim_join_broadcast", relational.orders_by_segment(orders, customer),
          r"BroadcastHashJoin")

    # 5. backfill predicate pushes down to the orders scan
    check("backfill_pushdown", relational.backfill_snapshot(orders),
          r"PushedFilters: \[IsNotNull\(o_totalprice\), GreaterThan\(o_totalprice")

    # 6. the exploded-shingle stage carries NO inferred size(...)>0 filter
    # duplicating the shingle transform below the Exchange (PERF.md #15 —
    # InferFiltersFromGenerate fires on aliased generator children; the
    # inline form must stay clean: Scan → Exchange → Generate, the one
    # "transform(" in the plan being the Generate's own child)
    from canal_spark.functions.dedup import _exploded_hashes
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    ex_plan = plan_of(_exploded_hashes(docs, "doc_id", "text", 3))
    out_lines.append(f"===== exploded_shingles =====\n{ex_plan}\n")
    checks.append(("exploded_shingles: no duplicated transform in a Filter",
                   len(re.findall(r"transform\(", ex_plan)) <= 2
                   and "Condition : (size(transform" not in ex_plan,
                   ex_plan))

    # 7. sequence packing: the prefix sum must be sharded — ONE hash
    # exchange on the shard key and NO single-partition window (a global
    # Window.orderBy plans `Exchange SinglePartition` = one reducer)
    from canal_spark.functions import curation
    pack = curation.pack_assignments(
        docs.select("doc_id", F.length("text").alias("n_tok")), 2048)
    pack_plan = plan_of(pack)
    out_lines.append(f"===== pack_assignments =====\n{pack_plan}\n")
    checks.append(("pack_assignments: window sharded on _shard",
                   re.search(r"hashpartitioning\(_shard", pack_plan) is not None,
                   pack_plan))
    checks.append(("pack_assignments: no single-partition exchange",
                   "Exchange SinglePartition" not in pack_plan, pack_plan))

    # 8. contamination: the benchmark n-gram set broadcasts; the doc side
    # is one hash aggregate (never a corpus x corpus join)
    check("contamination_broadcast_bench",
          curation.benchmark_contamination(docs, n=3, bench_mod=20),
          r"BroadcastExchange", r"HashAggregate")

    # 9. agg-rollup deltas: the old-image x batch fence join is a shuffled
    # hash join (batch-bounded build — never a sort-merge over the table
    # side), and the per-group delta aggregate has a map-side partial
    # before its Exchange (hot groups emit one row per upstream partition)
    from canal_spark.views import rollup_deltas
    old = docs.select(
        F.col("doc_id"), F.col("source").alias("_o_g"),
        F.length("text").cast("long").alias("_o_n_tok"),
        F.lit("01").alias("_o_lsn"), F.lit(False).alias("_o_del"))
    chg = docs.limit(100).select(
        F.col("doc_id"), F.lit("U").alias("op"), F.lit("02").alias("lsn"),
        F.col("source").alias("_n_g"),
        F.length("text").cast("long").alias("_n_n_tok"))
    roll_plan = plan_of(rollup_deltas(old, chg, "doc_id", ("n_tok",)))
    out_lines.append(f"===== rollup_deltas =====\n{roll_plan}\n")
    checks.append(("rollup_deltas: fence join is ShuffledHashJoin",
                   "ShuffledHashJoin" in roll_plan, roll_plan))
    checks.append(("rollup_deltas: partial+final hash aggregate on _g",
                   re.search(r"(?s)HashAggregate.*partial_sum.*"
                             r"Exchange.*hashpartitioning\(_g", roll_plan)
                   is not None, roll_plan))

    # 10. wire topic publish: exactly ONE exchange (the window's hash
    # partition on p) — routing + sequencing is linear in the batch
    from canal_spark.operators.lww import changes_from_events as _  # noqa: F401
    from canal_spark.operators.decode import to_wire
    from canal_spark.functions.hashing import h60
    from pyspark.sql import Window

    dml = events.where(~F.col("is_ddl") & F.col("event_type").isin(
        "INSERT", "UPDATE", "DELETE"))
    wev = to_wire(dml)
    pkc = F.coalesce(F.col("pk_after"), F.col("pk_before"))
    routed = wev.select(
        F.pmod(h60(pkc), F.lit(8)).alias("p"), pkc.alias("pk"), "lsn")
    topic = routed.withColumn(
        "seq", F.row_number().over(Window.partitionBy("p").orderBy("lsn")))
    topic_plan = plan_of(topic)
    out_lines.append(f"===== wire_topic_publish =====\n{topic_plan}\n")
    checks.append(("wire_topic_publish: single exchange (window on p)",
                   len(re.findall(r"\(\d+\) Exchange", topic_plan)) == 1,
                   topic_plan))

    # 10. the mirror's per-sink gate (two plain column equalities) pushes
    # into the event-log scan — the property that lets a 100-table mirror
    # multiply SMALL pruned scans instead of full passes (mirror.py docs)
    gated = raw.where((F.col("schema_name") == "train")
                      & (F.col("table_name") == "tokseq")) \
               .select("event_type", "lsn" if "lsn" in raw.columns else "gtid_seq")
    check("mirror_sink_gate_pushdown", gated,
          r"PushedFilters: \[.*EqualTo\(schema_name,train\).*"
          r"EqualTo\(table_name,tokseq\)")

    # 11. bucket routing: the steady-state merge path compiles to the PLAIN
    # pmod(xxhash64) expression — zero branching tax from the spec-migration
    # machinery — and flips to the routed CASE WHEN only while a migration
    # is actually in flight (lake._bucket_col)
    import shutil as _sh

    from pyspark.sql import types as T

    from canal_spark.table.lake import LakeTable

    tdir = os.path.join(_REPO, ".work", "audit_route_tbl")
    _sh.rmtree(tdir, ignore_errors=True)
    schema = T.StructType([T.StructField("doc_id", T.StringType()),
                           T.StructField("n_tok", T.IntegerType())])
    tbl = LakeTable.create(spark, tdir, schema, n_buckets=4,
                           df=spark.createDataFrame(
                               [("a", 1), ("b", 2)], schema))
    probe = spark.createDataFrame([("x",)], "doc_id string")
    steady = plan_of(probe.select(tbl._bucket_col("doc_id").alias("_b")))
    out_lines.append(f"===== bucket_route_steady =====\n{steady}\n")
    checks.append(("bucket_route_steady: plain pmod(xxhash64), no CASE",
                   "CASE WHEN" not in steady and "xxhash64" in steady,
                   steady))
    tbl.rebucket_start(8)
    tbl.rebucket_step(1)
    routed_mig = plan_of(probe.select(tbl._bucket_col("doc_id").alias("_b")))
    out_lines.append(f"===== bucket_route_migrating =====\n{routed_mig}\n")
    checks.append(("bucket_route_migrating: routed CASE WHEN present",
                   "CASE WHEN" in routed_mig, routed_mig))
    _sh.rmtree(tdir, ignore_errors=True)

    # 12. DLQ off = the wire winner decode carries NO corrupt-record column
    # (the screen probe is a separate pre-collapse stage, dlq path only)
    from canal_spark.operators.lww import screen_wire_events, wire_net_changes

    img_schema = T.StructType([T.StructField("doc_id", T.StringType()),
                               T.StructField("n_tok", T.IntegerType())])
    net_off = plan_of(wire_net_changes(wev.withColumn(
        "is_ddl", F.lit(False)), key="doc_id", image_schema=img_schema))
    out_lines.append(f"===== wire_decode_no_dlq =====\n{net_off}\n")
    checks.append(("wire_decode_no_dlq: no corrupt-record column",
                   "_corrupt_rec" not in net_off, net_off))
    _good, bad = screen_wire_events(
        wev.withColumn("is_ddl", F.lit(False)), key="doc_id")
    bad_plan = plan_of(bad)
    out_lines.append(f"===== wire_screen_dlq =====\n{bad_plan}\n")
    checks.append(("wire_screen_dlq: corrupt-record probe present",
                   "_corrupt_rec" in bad_plan, bad_plan))

    # 13. multi-dim view enrich (round 4): every dim joins as a broadcast
    # hash join and the enrich path adds ZERO exchanges — N dims cost N
    # broadcast probes, not N shuffles (views.MultiJoinedView.apply shape)
    dim1 = spark.createDataFrame(
        [("web", "crawl"), ("books", "curated")], "source string, kind string")
    dim2 = spark.createDataFrame(
        [(i, "even" if i % 2 == 0 else "odd") for i in range(64)],
        "n_tok int, band string")
    chg_mj = docs.select("doc_id", F.length("text").alias("n_tok"), "source")
    enrich = (chg_mj.join(F.broadcast(dim1), "source", "left")
              .join(F.broadcast(dim2), "n_tok", "left"))
    mj_plan = plan_of(enrich)
    out_lines.append(f"===== multi_join_enrich =====\n{mj_plan}\n")
    # formatted plans list each operator in the tree AND the detail
    # section — count the numbered detail entries
    checks.append(("multi_join_enrich: two BroadcastHashJoins",
                   len(re.findall(r"\(\d+\) BroadcastHashJoin", mj_plan)) == 2,
                   mj_plan))
    checks.append(("multi_join_enrich: zero shuffle exchanges",
                   "Exchange hashpartitioning" not in mj_plan, mj_plan))

    # 14. star-CC round (round 4): the large-star step is hash aggregates +
    # joins partitioned on the node key — never an Exchange SinglePartition
    # (a single-reducer round would serialize the whole graph per round)
    pairs = docs.limit(200).select(
        F.col("doc_id").alias("id_a"),
        F.concat(F.lit("x"), F.col("doc_id")).alias("id_b"))
    both = pairs.select(F.col("id_a").alias("u"), F.col("id_b").alias("v")) \
        .unionAll(pairs.select(F.col("id_b").alias("u"),
                               F.col("id_a").alias("v")))
    mins = (both.groupBy("u").agg(F.min("v").alias("mn"))
            .select("u", F.least("mn", "u").alias("m")))
    large = (both.join(mins, "u").where(F.col("v") > F.col("u"))
             .select(F.least("v", "m").alias("l"),
                     F.greatest("v", "m").alias("g")).distinct())
    star_plan = plan_of(large)
    out_lines.append(f"===== star_cc_round =====\n{star_plan}\n")
    checks.append(("star_cc_round: no single-partition exchange",
                   "Exchange SinglePartition" not in star_plan, star_plan))
    checks.append(("star_cc_round: partial+final min aggregate",
                   re.search(r"(?s)partial_min.*Exchange", star_plan)
                   is not None, star_plan))

    with open(os.path.join(_REPO, ".work", "explain_audit.txt"), "w") as f:
        f.write("\n".join(out_lines))

    failed = 0
    for name, ok, _ in checks:
        print(("PASS " if ok else "FAIL ") + name)
        failed += 0 if ok else 1
    print(f"\n{len(checks) - failed}/{len(checks)} plan assertions hold "
          f"(full plans: .work/explain_audit.txt)")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
