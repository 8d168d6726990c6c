"""Correctness at scale: replay the (default 8M-event) wire fixture end-to-end and
compare the FINAL TABLE STATE row-for-row (token-array md5, n_tok, source)
against an independent sequential python fold of the same 8M events.
Usage: python tools/verify_scale.py [fixture_root]
(fixture_root defaults to .work/wire8m_heavy — build it with
tools/scaling_bench.py). Measured 2026-08-18: 8,000,000 DML over a
100,092-row base -> 4,046,064 final rows, exact."""
import glob, hashlib, json, os, shutil, sys, time  # noqa
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import pyarrow.parquet as pq
from canal_spark.session import get_spark
from canal_spark.pipeline import replay
from canal_spark.table.lake import LakeTable
from pyspark.sql import functions as F
from __spark_entry__ import BASE_SCHEMA

_ROOT = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.work/wire8m_heavy"
LOG = os.path.join(_ROOT, "binlog")
BASE = os.path.join(_ROOT, "base.parquet")
WORK = os.path.join(_ROOT, "verify_tbl")

spark = get_spark("v8m", master="local[32]", shuffle_partitions=64)
shutil.rmtree(WORK, ignore_errors=True)
base_df = spark.read.schema(BASE_SCHEMA).parquet(BASE)
tbl = LakeTable.create(spark, WORK, BASE_SCHEMA, key_col="doc_id",
                       n_buckets=64, df=base_df)
t0 = time.time()
stats = replay(spark, LOG, tbl.refresh(), wire=True)
print(f"replay done {time.time()-t0:.1f}s ranges={stats.ranges}", flush=True)

rows = (tbl.refresh().read()
        .select("doc_id", F.md5(F.to_json("tokens")).alias("md5"),
                "n_tok", "source")
        .toPandas())
got = {r.doc_id: (r.md5, None if r.n_tok is None else int(r.n_tok), r.source)
       for r in rows.itertuples()}
print(f"spark state {len(got)} rows", flush=True)

# independent sequential fold of the wire log (json image decode; LSN order)
def md5_tok(toks):
    return hashlib.md5(json.dumps(toks, separators=(",", ":")).encode()).hexdigest()

state = {}
for row in pq.read_table(BASE).to_pylist():
    state[row["doc_id"]] = (md5_tok(list(row["tokens"])), int(row["n_tok"]), row["source"])

t0 = time.time()
events = []
for path in sorted(glob.glob(os.path.join(LOG, "mysql-bin.*.parquet"))):
    t = pq.read_table(path, columns=["entry_type", "event_type", "gtid_seq",
                                     "binlog_file", "binlog_pos", "schema_name",
                                     "table_name", "is_ddl", "before", "after"])
    events.extend(t.to_pylist())
events.sort(key=lambda r: (r["gtid_seq"], r["binlog_file"], r["binlog_pos"]))
print(f"loaded {len(events)} events {time.time()-t0:.1f}s", flush=True)

t0 = time.time()
n_dml = 0
for ev in events:
    if ev["entry_type"] != "ROWDATA" or ev["is_ddl"]:
        continue
    if (ev["schema_name"], ev["table_name"]) != ("train", "tokseq"):
        continue
    n_dml += 1
    op = ev["event_type"]
    before = json.loads(ev["before"]) if ev["before"] else None
    after = json.loads(ev["after"]) if ev["after"] else None
    if op == "INSERT":
        state[after["doc_id"]] = (md5_tok(after["tokens"]), int(after["n_tok"]), after["source"])
    elif op == "UPDATE":
        if before and before["doc_id"] != after["doc_id"]:
            state.pop(before["doc_id"], None)
        state[after["doc_id"]] = (md5_tok(after["tokens"]), int(after["n_tok"]), after["source"])
    elif op == "DELETE":
        state.pop(before["doc_id"], None)
print(f"oracle fold {n_dml} DML {time.time()-t0:.1f}s -> {len(state)} rows", flush=True)

assert set(got) == set(state), (
    f"key sets differ: spark {len(got)} oracle {len(state)}; "
    f"examples only-spark={list(set(got)-set(state))[:3]} "
    f"only-oracle={list(set(state)-set(got))[:3]}")
bad = [k for k in got if got[k] != state[k]]
assert not bad, f"{len(bad)} rows differ, e.g. {bad[:3]}: {got[bad[0]]} vs {state[bad[0]]}"
print(f"VERIFY 8M PASS: {len(got)} final rows exact (token-md5, n_tok, source) "
      f"after {n_dml} DML events")
