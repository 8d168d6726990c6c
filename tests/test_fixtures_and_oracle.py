"""Generator + oracle sanity: determinism, validity, ordering."""

import glob
import os

import pyarrow.parquet as pq

from canal_spark.fixtures import CdcLogSpec, generate_base_table, generate_cdc_log
from canal_spark.oracle import oracle_final_state, read_log_events


def test_base_table_deterministic():
    a = generate_base_table(100, seed=7)
    b = generate_base_table(100, seed=7)
    assert a.equals(b)
    assert a.column_names == ["doc_id", "tokens", "n_tok", "source"]
    rows = a.to_pylist()
    assert all(r["n_tok"] == len(r["tokens"]) for r in rows)


def test_log_generation_and_validity(tmp_work):
    base = generate_base_table(200, seed=1)
    spec = CdcLogSpec(n_events=2000, seed=1, events_per_file=700,
                      other_table_frac=0.05, pk_change_frac=0.05)
    m = generate_cdc_log(tmp_work, spec, base)
    files = sorted(glob.glob(os.path.join(tmp_work, "mysql-bin.*.parquet")))
    assert [os.path.basename(f) for f in files] == m["files"]
    assert len(files) >= 3

    events = read_log_events(tmp_work)
    # strict LSN monotonicity
    keys = [(e["gtid_seq"], e["binlog_file"], e["binlog_pos"]) for e in events]
    assert keys == sorted(keys)
    # validity: sequential apply never sees impossible ops
    live = {r["doc_id"] for r in base.to_pylist()}
    n_dml = 0
    for e in events:
        if e["entry_type"] != "ROWDATA" or e["is_ddl"]:
            continue
        if (e["schema_name"], e["table_name"]) != ("train", "tokseq"):
            continue
        n_dml += 1
        op = e["event_type"]
        if op == "INSERT":
            assert e["after"]["doc_id"] not in live
            live.add(e["after"]["doc_id"])
        elif op == "UPDATE":
            assert e["before"]["doc_id"] in live
            live.discard(e["before"]["doc_id"])
            live.add(e["after"]["doc_id"])
        elif op == "DELETE":
            assert e["before"]["doc_id"] in live
            live.discard(e["before"]["doc_id"])
        # full images: n_tok invariant
        for img in (e["before"], e["after"]):
            if img is not None:
                assert img["n_tok"] == len(img["tokens"])
    assert n_dml == spec.n_events
    assert m["stats"]["other_table"] > 0
    assert m["stats"]["pk_change"] > 0


def test_generator_deterministic(tmp_work):
    d1, d2 = os.path.join(tmp_work, "a"), os.path.join(tmp_work, "b")
    base = generate_base_table(50, seed=3)
    spec = CdcLogSpec(n_events=500, seed=3, events_per_file=10_000)
    m1 = generate_cdc_log(d1, spec, base)
    m2 = generate_cdc_log(d2, spec, base)
    assert m1["files"] == m2["files"]
    for f in m1["files"]:
        assert pq.read_table(os.path.join(d1, f)).equals(
            pq.read_table(os.path.join(d2, f))
        )


def test_oracle_final_state_counts(tmp_work):
    base = generate_base_table(100, seed=5)
    spec = CdcLogSpec(n_events=1000, seed=5)
    m = generate_cdc_log(tmp_work, spec, base)
    state, cols = oracle_final_state(base, tmp_work)
    s = m["stats"]
    # live count = base + inserts - deletes (pk-change is delete+insert, net 0)
    assert len(state) == 100 + s["INSERT"] - s["DELETE"]
    assert cols == ["doc_id", "tokens", "n_tok", "source"]
    for r in state.values():
        assert r["n_tok"] == len(r["tokens"])
